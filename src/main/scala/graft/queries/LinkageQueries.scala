package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Linkage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution (graft.operators.Linkage): the
  * "match dirty records back to the canonical table" primitive every
  * warehouse runs at ingest boundaries, plus the two steps around it —
  * the incremental (arrivals-batch) shape and survivorship (golden-record
  * selection). The registered queries link deterministically-noised views
  * of `documents` (tail characters truncated, the noise amount a pure
  * function of the id) back to the originals WITHOUT using the id:
  * blocking on a noise-invariant token-boundary key (lang, source,
  * first-two-tokens prefix), then weighted two-field
  * normalized-edit-distance scoring and best-match-per-record selection.
  *
  * The DuckDB oracles replay blocking, scoring (exact integer sim1000
  * arithmetic — see Linkage.sim1000), ranking, and threshold bit-for-bit.
  */
object LinkageQueries {

  /** Integer sim1000 in DuckDB SQL — mirrors [[Linkage.sim1000]]. */
  private def sim1000Sql(a: String, b: String): String =
    s"(1000 - LEAST(1000, (1000 * levenshtein($a, $b)) // GREATEST(length($a), length($b), 1)))"

  /** One dirty-view SELECT body (no WITH): ids doc_id*mul+off, tail
    * truncation of `extraCut + doc_id%7` chars (floor 12). */
  private def dirtySelectSql(mul: Int, off: Int, extraCut: Int,
      pred: String = ""): String =
    s"""SELECT doc_id * $mul + $off AS dirty_id, lang, source,
           substring(text, 1, GREATEST(length(text) - $extraCut - (doc_id % 7), 12)) AS dtext
         FROM documents $pred"""

  /** Shared oracle CTE chain: canonical `c`, caller-supplied dirty rows
    * `d0`, keyed/windowed views `d`, scored candidates `j`, ranked `b`,
    * accepted matches `m`. Append a final SELECT per query. */
  private def linkCtes(d0Body: String): String =
    s"""WITH c AS (SELECT doc_id,
             lang || '|' || source || '|' ||
               substring(array_to_string((string_split(text, ' '))[1:2], ' '), 1, 40) AS blk,
             lower(substring(text, 1, 40)) AS head_c,
             lower(substring(text, GREATEST(length(text) - 39, 1), 40)) AS tail_c
           FROM documents),
      d0 AS ($d0Body),
      d AS (SELECT dirty_id,
             lang || '|' || source || '|' ||
               substring(array_to_string((string_split(dtext, ' '))[1:2], ' '), 1, 40) AS blk,
             lower(substring(dtext, 1, 40)) AS head_d,
             lower(substring(dtext, GREATEST(length(dtext) - 39, 1), 40)) AS tail_d
           FROM d0),
      j AS (SELECT d.dirty_id, c.doc_id,
             500 * ${sim1000Sql("head_c", "head_d")}
           + 500 * ${sim1000Sql("tail_c", "tail_d")} AS score
           FROM d JOIN c ON d.blk = c.blk),
      b AS (SELECT dirty_id, doc_id, score,
             row_number() OVER (PARTITION BY dirty_id
               ORDER BY score DESC, doc_id) AS rn
           FROM j),
      m AS (SELECT dirty_id, doc_id AS matched_id, score
           FROM b WHERE rn = 1 AND score >= 600000)"""

  private val matchTailSql =
    """SELECT CAST(dirty_id AS BIGINT) AS dirty_id,
              CAST(matched_id AS BIGINT) AS matched_id,
              CAST(score AS BIGINT) AS score
       FROM m ORDER BY dirty_id"""

  private def tok2(c: String) =
    expr(s"substring(concat_ws(' ', slice(split($c, ' '), 1, 2)), 1, 40)")

  /** In-plan ASCII contract guard for a scoring window column: Spark's
    * `levenshtein` counts CODEPOINT edits, DuckDB's counts BYTE edits, so
    * the q_er_* oracles are exact only while every scored window is pure
    * ASCII (byte == codepoint — see the invariant note on
    * [[Linkage.sim1000]]). assert_true returns NULL on pass, so the
    * isNull-gated `when` keeps the guard in the plan; a future corpus
    * generator emitting multi-byte text inside a window fails HERE with a
    * named contract error instead of a silent cross-engine score
    * divergence flipping best-match winners. */
  private[graft] def asciiWindow(c: org.apache.spark.sql.Column, name: String) =
    // coalesce(..., true): a NULL text makes the equality NULL, and
    // AssertTrue RAISES on a NULL condition — an unguarded NULL document
    // would fail with a misleading "must be pure ASCII" error instead of
    // propagating NULL through the window like every other string op
    when(assert_true(coalesce(octet_length(c) === length(c), lit(true)),
      lit(s"q_er_* contract: scoring window $name must be pure ASCII " +
        "(DuckDB levenshtein counts bytes, Spark counts codepoints)")).isNull, c)

  /** Canonical side: blocking key + the two scoring windows. */
  def canonicalView(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select("doc_id", "text", "lang", "source")
      .withColumn("blk", concat_ws("|",
        col("lang"), col("source"), tok2("text")))
      .withColumn("head_c",
        asciiWindow(lower(substring(col("text"), 1, 40)), "head_c"))
      .withColumn("tail_c", asciiWindow(
        lower(expr("substring(text, greatest(length(text) - 39, 1), 40)")),
        "tail_c"))

  /** Dirty side (mirror of [[dirtySelectSql]]): deterministic
    * tail-truncation noise, then the same blocking key + scoring windows
    * computed over the noised text. */
  def dirtyView(s: SparkSession, d: String, mul: Int = 1, off: Int = 0,
      extraCut: Int = 1): DataFrame =
    Tables.documents(s, d).select("doc_id", "text", "lang", "source")
      .select((col("doc_id") * mul + off).as("dirty_id"),
        col("lang"), col("source"),
        expr(s"substring(text, 1, greatest(length(text) - $extraCut - pmod(doc_id, 7), 12))")
          .as("dtext"))
      .withColumn("blk", concat_ws("|",
        col("lang"), col("source"), tok2("dtext")))
      .withColumn("head_d",
        asciiWindow(lower(substring(col("dtext"), 1, 40)), "head_d"))
      .withColumn("tail_d", asciiWindow(
        lower(expr("substring(dtext, greatest(length(dtext) - 39, 1), 40)")),
        "tail_d"))

  private val fields = Seq(
    Linkage.Field("head_c", "head_d", 500),
    Linkage.Field("tail_c", "tail_d", 500))

  private def project(df: DataFrame): DataFrame =
    df.select(col("dirty_id"), col("matched_id").cast("long").as("matched_id"),
      col("score"))

  val defs: Seq[QueryDef] = Seq(

    // Entity resolution over a derived dirty view. Scale posture: the only
    // pair generator is the blocking-key equi-join; the key is the
    // TOKEN-BOUNDARY prefix (first two tokens, capped at 40 chars) —
    // discriminative enough that key cardinality grows with the corpus
    // (a fixed-length char prefix would let whole replica families share
    // one block on the scaled corpora and turn candidates quadratic —
    // ScaleUpSpec pins both behaviors), so candidate volume stays linear;
    // the key never sees the tail-side noise. Scoring is codegen
    // levenshtein + exact integer arithmetic; the best-match window
    // partitions by the dirty id (never global).
    QueryDef("q_er_match",
        Some(s"${linkCtes(dirtySelectSql(1, 0, 1))} $matchTailSql")) { (s, d) =>
      project(Linkage.resolve(canonicalView(s, d), dirtyView(s, d),
          canonicalId = "doc_id", dirtyId = "dirty_id", blockCol = "blk",
          fields = fields, minScore = 600000L))
        .orderBy("dirty_id")
    },

    // Incremental linkage — the production shape at warehouse scale: a
    // small arrivals batch (2% of ids here) resolved against the big
    // canonical table via Linkage.resolveIncremental. The broadcast hint
    // on the arrivals side means the canonical corpus is probed MAP-SIDE
    // and never shuffled; the only exchange is the best-match window over
    // the matched rows (arrivals-sized). LinkageSpec pins the plan shape.
    QueryDef("q_er_incremental",
        Some(s"${linkCtes(dirtySelectSql(1, 0, 1, "WHERE doc_id % 50 = 3"))} $matchTailSql")) { (s, d) =>
      project(Linkage.resolveIncremental(
          canonicalView(s, d),
          dirtyView(s, d).filter(pmod(col("dirty_id"), lit(50)) === 3),
          canonicalId = "doc_id", dirtyId = "dirty_id", blockCol = "blk",
          fields = fields, minScore = 600000L))
        .orderBy("dirty_id")
    },

    // Survivorship / golden record — the step AFTER matching: two noised
    // source feeds (mild and harsh truncation, distinct surrogate ids)
    // both resolve to the canonical entity; one winner per entity is kept
    // by deterministic precedence (most-complete = longest surviving text,
    // tie on id), with the beaten-candidate count reported. One join on
    // the dirty id + one entity-partitioned window (Linkage.survivorship);
    // entity groups are block-bounded, never corpus-wide.
    QueryDef("q_er_survivor",
        Some(s"""${linkCtes(dirtySelectSql(2, 0, 1) + " UNION ALL " + dirtySelectSql(2, 1, 8))},
        s AS (SELECT m.matched_id, m.dirty_id, length(d0.dtext) AS len,
               count(*) OVER (PARTITION BY m.matched_id) AS n_cands,
               row_number() OVER (PARTITION BY m.matched_id
                 ORDER BY length(d0.dtext) DESC, m.dirty_id) AS srn
             FROM m JOIN d0 ON d0.dirty_id = m.dirty_id)
        SELECT CAST(matched_id AS BIGINT) AS matched_id,
               CAST(dirty_id AS BIGINT) AS golden_id,
               CAST(n_cands AS BIGINT) AS n_candidates,
               CAST(len AS BIGINT) AS golden_len
        FROM s WHERE srn = 1 ORDER BY matched_id""")) { (s, d) =>
      val dirtyU = dirtyView(s, d, mul = 2, off = 0, extraCut = 1)
        .unionByName(dirtyView(s, d, mul = 2, off = 1, extraCut = 8))
      val matches = Linkage.resolve(canonicalView(s, d), dirtyU,
        canonicalId = "doc_id", dirtyId = "dirty_id", blockCol = "blk",
        fields = fields, minScore = 600000L)
      Linkage.survivorship(matches,
          dirtyU.select(col("dirty_id"), length(col("dtext")).as("len")),
          dirtyId = "dirty_id", entityCol = "matched_id",
          precedence = Seq(col("len").desc, col("dirty_id")))
        .select(col("matched_id").cast("long").as("matched_id"),
          col("dirty_id").as("golden_id"),
          col("n_candidates").cast("long").as("n_candidates"),
          col("len").cast("long").as("golden_len"))
        .orderBy("matched_id")
    }
  )
}
