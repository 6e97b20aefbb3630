package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: match each record of a "dirty" table
  * to its canonical counterpart by blocking + weighted multi-field fuzzy
  * scoring + best-match selection — the classic Fellegi–Sunter shape, kept
  * integer-exact so a DuckDB oracle can replay it bit-for-bit.
  *
  * Scale posture (the part that matters at 100 TB):
  *   - the ONLY pair generator is an equi-join on the caller's blocking
  *     key. No similarity is ever computed across blocks, so candidate
  *     volume is Σ |block_c|·|block_d|, and a blocking key whose
  *     cardinality grows with the data (e.g. a normalized-prefix key)
  *     keeps that linear. There is no cartesian fallback.
  *   - scoring is per-pair, codegen'd (levenshtein + integer arithmetic),
  *     no UDF.
  *   - best-match-per-dirty-record is a window partitioned by the dirty
  *     id — never a global window.
  *
  * Why integer scores: a weighted sum of DOUBLE similarities would tie-break
  * differently across engines in the last ULP; `sim1000` is exact integer
  * arithmetic end to end, so score equality — and therefore the
  * deterministic (score DESC, canonical id ASC) winner — is engine-portable.
  */
object Linkage {

  /** Similarity in [0, 1000]: 1000 − ⌊1000·lev(a,b) / max(|a|,|b|,1)⌋ —
    * the normalized edit similarity scaled to exact integers. Integer
    * division is computed as (x − pmod(x,y))/y: the numerator is exactly
    * divisible, both operands stay far below 2^53, so the double division
    * is exact and the result casts back to BIGINT losslessly — the same
    * value DuckDB's `//` produces.
    *
    * ASCII INVARIANT (cross-engine portability caveat): Spark's
    * `levenshtein` counts CODEPOINT edits while DuckDB's counts BYTE
    * edits (levenshtein('한국어','한국에') = 1 in Spark, 2 in DuckDB);
    * `length` is codepoint-based in both. The exact-integer portability
    * claim therefore holds only while the scored strings are pure ASCII
    * (byte == codepoint). The registered q_er_* fixtures enforce this
    * with an in-plan assert_true guard on every scoring window
    * (LinkageQueries.asciiWindow) so a future non-ASCII corpus fails
    * with a named contract error instead of a silent score divergence;
    * non-oracle production use on multilingual text is fine — the Spark
    * side is self-consistent — but any DuckDB replay must apply a
    * codepoint-preserving ASCII transform on both sides first. */
  def sim1000(a: Column, b: Column): Column = {
    val x = lit(1000L) * levenshtein(a, b).cast("long")
    val y = greatest(length(a), length(b), lit(1)).cast("long")
    lit(1000L) - least(lit(1000L), ((x - pmod(x, y)) / y).cast("long"))
  }

  /** One scoring field: canonical-side column, dirty-side column, weight
    * in permille (weights should sum to 1000 so scores land in [0, 1e6]). */
  final case class Field(canonicalCol: String, dirtyCol: String, weight: Int)

  /** Resolve `dirty` against `canonical`.
    *
    * Both inputs must already carry `blockCol` (the caller-computed blocking
    * key — compute it with the same normalization on both sides). Returns
    * one row per dirty record that found a match at or above `minScore`:
    * (dirtyId, canonical id as `matched_id`, `score`), where
    * score = Σ weightᵢ · sim1000(fieldᵢ) ∈ [0, 1000·Σw].
    */
  def resolve(canonical: DataFrame, dirty: DataFrame,
      canonicalId: String, dirtyId: String, blockCol: String,
      fields: Seq[Field], minScore: Long): DataFrame = {
    // Internal surrogate aliasing: callers may legitimately use the SAME
    // column names on both sides (same id name, a field scored against a
    // column of its own name) — col(name) after the join would then be
    // ambiguous and fail with an opaque AnalysisException. Projecting each
    // input onto __cid/__did/__c_i/__d_i surrogates BEFORE the join makes
    // any caller naming work.
    val c = canonical.select(
      (col(canonicalId).as("__cid") +: col(blockCol).as("__blk_c") +:
        fields.zipWithIndex.map { case (f, i) => col(f.canonicalCol).as(s"__c_$i") }): _*)
    val d = dirty.select(
      (col(dirtyId).as("__did") +: col(blockCol).as("__blk_d") +:
        fields.zipWithIndex.map { case (f, i) => col(f.dirtyCol).as(s"__d_$i") }): _*)
    val score = fields.zipWithIndex.map { case (f, i) =>
        lit(f.weight.toLong) * sim1000(col(s"__c_$i"), col(s"__d_$i")) }
      .reduce(_ + _)
    val w = Window.partitionBy(col("__did"))
      .orderBy(col("score").desc, col("__cid"))
    d.join(c, col("__blk_d") === col("__blk_c"))
      .withColumn("score", score)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("score") >= minScore)
      .select(col("__did").as(dirtyId), col("__cid").as("matched_id"), col("score"))
  }

  /** Survivorship / golden-record selection — the step AFTER matching:
    * when several dirty records resolve to one canonical entity, keep one
    * winner per entity by the caller's deterministic precedence (longest /
    * newest / most complete — passed as an explicit column order so the
    * choice is reproducible across engines), and report how many candidates
    * the winner beat. One equi-join on the dirty id plus one window
    * partitioned by the entity — never global; entity groups are
    * block-bounded by construction (they came out of [[resolve]]). */
  def survivorship(matches: DataFrame, dirty: DataFrame, dirtyId: String,
      entityCol: String, precedence: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
    val wOrd = w.orderBy(precedence: _*)
    matches.join(dirty, dirtyId)
      .withColumn("n_candidates", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(wOrd))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Incremental linkage — the production shape: a small arrivals batch
    * matched against the big canonical table. Semantics identical to
    * [[resolve]]; the arrivals side carries a broadcast hint, so the
    * canonical table is probed map-side and NEVER shuffled — the only
    * exchange left is the best-match window over the matched rows
    * (arrivals-sized, not corpus-sized). The hint is the caller's dial:
    * use this entry point while the batch fits executor memory (the usual
    * daily-ingest case); fall back to [[resolve]] — a plain shuffled
    * equi-join on the block key — when it doesn't. */
  def resolveIncremental(canonical: DataFrame, arrivals: DataFrame,
      canonicalId: String, dirtyId: String, blockCol: String,
      fields: Seq[Field], minScore: Long): DataFrame =
    resolve(canonical, broadcast(arrivals),
      canonicalId, dirtyId, blockCol, fields, minScore)
}
