package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Linkage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution (graft.operators.Linkage): the
  * "match dirty records back to the canonical table" primitive every
  * warehouse runs at ingest boundaries. The registered queries link a
  * deterministically-noised view of `documents` (1–7 tail characters
  * truncated, the noise amount a pure function of the id) back to the
  * originals WITHOUT using the id: blocking on a noise-invariant
  * token-boundary key (lang, source, first-two-tokens prefix), then
  * weighted two-field normalized-edit-distance scoring and
  * best-match-per-record selection.
  *
  * The DuckDB oracle replays blocking, scoring (exact integer sim1000
  * arithmetic — see Linkage.sim1000), ranking, and threshold bit-for-bit.
  */
object LinkageQueries {

  /** Integer sim1000 in DuckDB SQL — mirrors [[Linkage.sim1000]]. */
  private def sim1000Sql(a: String, b: String): String =
    s"(1000 - LEAST(1000, (1000 * levenshtein($a, $b)) // GREATEST(length($a), length($b), 1)))"

  /** Oracle CTEs: canonical view `c`, dirty view `d` (optionally filtered
    * to an arrivals slice), scored candidates `j`, ranked `b`. */
  private def oracleSql(arrivalsPred: String): String =
    s"""WITH c AS (SELECT doc_id,
             lang || '|' || source || '|' ||
               substring(array_to_string((string_split(text, ' '))[1:2], ' '), 1, 40) AS blk,
             lower(substring(text, 1, 40)) AS head_c,
             lower(substring(text, GREATEST(length(text) - 39, 1), 40)) AS tail_c
           FROM documents),
      d0 AS (SELECT doc_id AS dirty_id, lang, source,
             substring(text, 1, GREATEST(length(text) - 1 - (doc_id % 7), 12)) AS dtext
           FROM documents $arrivalsPred),
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
           FROM j)
      SELECT CAST(dirty_id AS BIGINT) AS dirty_id,
             CAST(doc_id AS BIGINT) AS matched_id,
             CAST(score AS BIGINT) AS score
      FROM b WHERE rn = 1 AND score >= 600000
      ORDER BY dirty_id"""

  private def tok2(c: String) =
    expr(s"substring(concat_ws(' ', slice(split($c, ' '), 1, 2)), 1, 40)")

  /** Canonical side: blocking key + the two scoring windows. */
  def canonicalView(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select("doc_id", "text", "lang", "source")
      .withColumn("blk", concat_ws("|",
        col("lang"), col("source"), tok2("text")))
      .withColumn("head_c", lower(substring(col("text"), 1, 40)))
      .withColumn("tail_c",
        lower(expr("substring(text, greatest(length(text) - 39, 1), 40)")))

  /** Dirty side: deterministic tail-truncation noise, then the same
    * blocking key + scoring windows computed over the noised text. */
  def dirtyView(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select("doc_id", "text", "lang", "source")
      .select(col("doc_id").as("dirty_id"), col("lang"), col("source"),
        expr("substring(text, 1, greatest(length(text) - 1 - pmod(doc_id, 7), 12))")
          .as("dtext"))
      .withColumn("blk", concat_ws("|",
        col("lang"), col("source"), tok2("dtext")))
      .withColumn("head_d", lower(substring(col("dtext"), 1, 40)))
      .withColumn("tail_d",
        lower(expr("substring(dtext, greatest(length(dtext) - 39, 1), 40)")))

  private val fields = Seq(
    Linkage.Field("head_c", "head_d", 500),
    Linkage.Field("tail_c", "tail_d", 500))

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
    QueryDef("q_er_match", Some(oracleSql(""))) { (s, d) =>
      Linkage.resolve(canonicalView(s, d), dirtyView(s, d),
          canonicalId = "doc_id", dirtyId = "dirty_id", blockCol = "blk",
          fields = fields, minScore = 600000L)
        .select(col("dirty_id"), col("matched_id").cast("long").as("matched_id"),
          col("score"))
        .orderBy("dirty_id")
    },

    // Incremental linkage — the production shape at warehouse scale: a
    // small arrivals batch (2% of ids here) resolved against the big
    // canonical table via Linkage.resolveIncremental. The broadcast hint
    // on the arrivals side means the canonical corpus is probed MAP-SIDE
    // and never shuffled; the only exchange is the best-match window over
    // the matched rows (arrivals-sized). LinkageSpec pins the plan shape.
    QueryDef("q_er_incremental",
        Some(oracleSql("WHERE doc_id % 50 = 3"))) { (s, d) =>
      Linkage.resolveIncremental(
          canonicalView(s, d),
          dirtyView(s, d).filter(pmod(col("dirty_id"), lit(50)) === 3),
          canonicalId = "doc_id", dirtyId = "dirty_id", blockCol = "blk",
          fields = fields, minScore = 600000L)
        .select(col("dirty_id"), col("matched_id").cast("long").as("matched_id"),
          col("score"))
        .orderBy("dirty_id")
    }
  )
}
