package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators.
  *
  * Complements the PII scrubbing surface (`q_text_pii`): PII redaction
  * removes direct identifiers; k-anonymity bounds re-identification through
  * *quasi-identifier combinations* — a released row must be indistinguishable
  * from at least k-1 others on its QI columns (Sweeney, IJUFKS 2002).
  */
object Privacy {

  /** k-anonymity by suppression: every row whose quasi-identifier group has
    * fewer than `k` members gets its QI columns replaced with `"*"` (the
    * suppressed rows collapse into one indistinguishable group); rows in
    * groups of size >= k pass through unchanged. Adds `anon_suppressed`.
    *
    * QI columns must be strings (generalization — banding, truncation — is
    * the caller's projection; this operator enforces the group-size floor).
    *
    * Scale shape: one `count over (partition by QI)` window — a single
    * hash-shuffle on the QI columns, no driver state, no second pass. The
    * window carries only the grouped count, so partition memory is the QI
    * group's rows (bounded further by AQE skew splitting at cluster scale).
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(qiCols.map(col): _*)
    val sized = df.withColumn("__gsize", count(lit(1)).over(w))
    val suppressed = col("__gsize") < k
    // Lazy localCheckpoint: the star-floor gate below reads this frame
    // TWICE (the scalar count and the release itself) — without the
    // checkpoint both branches would re-run the source scan and the QI
    // window shuffle.
    val starred = qiCols.foldLeft(sized) { (acc, c) =>
        acc.withColumn(c, when(suppressed, lit("*")).otherwise(col(c)))
      }
      .withColumn("anon_suppressed", suppressed)
      .drop("__gsize")
      .localCheckpoint(false)
    // The '*' bucket is itself a QI group: if FEWER than k rows were
    // suppressed in total, releasing them would violate the k floor the
    // operator promises (they are already maximally generalized, so the
    // only sound move is to drop them). The gate is a broadcast scalar —
    // one tiny aggregate over the checkpointed frame, no extra wide
    // shuffle and no second source pass.
    val nSup = starred.filter(col("anon_suppressed"))
      .agg(count(lit(1)).as("__nsup"))
    starred.crossJoin(broadcast(nSup))
      .filter(!col("anon_suppressed") || col("__nsup") >= k)
      .drop("__nsup")
  }

  /** Laplace(scale) noise sample derived deterministically from `seedCol`
    * via the portable 48-bit hash (inverse-CDF transform of a uniform in
    * (0,1)). Determinism is a feature for a RELEASE pipeline: re-running
    * the release never publishes a second, differently-noised copy of the
    * same statistic (which would average away the protection); a new
    * release epoch changes the seed prefix instead. The (0,1) uniform
    * offsets the integer hash by +0.5, so neither tail can hit ln(0).
    *
    * Pure narrow expression (one md5 per row) — composes into any keyed
    * aggregation without extra shuffles.
    */
  def laplaceNoise(seedCol: Column, scale: Double): Column = {
    val u = (graft.functions.Portable.h48(seedCol) + lit(0.5)) /
      lit(281474976710656.0) // 2^48
    val centered = u * 2.0 - 1.0 // (-1, 1)
    -lit(scale) * signum(centered) * log(lit(1.0) - abs(centered))
  }

  /** ε-differentially-private histogram: per-key counts released with
    * Laplace(1/ε) noise (each row changes one count by one → sensitivity
    * 1). One keyed aggregation with map-side partials; the noise is a
    * narrow post-agg map keyed by the released key itself.
    *
    * SECURITY CAVEAT — `releaseTag` is the noise seed. The DP guarantee
    * holds only against an adversary who cannot recompute the noise, so
    * the tag must be a SECRET high-entropy value (a per-release random
    * key held by the releasing party), never a public or guessable label:
    * with a known tag anyone can re-derive md5(tag + key), subtract the
    * noise, and recover exact counts. The registered q_anon_dp query uses
    * a hardcoded public tag ('rel1') deliberately — determinism via a
    * public seed is an oracle-parity/benchmark artifact that lets DuckDB
    * replay the noise bit-exactly; it is NOT a private release.
    */
  def dpCounts(df: DataFrame, keyCol: String, epsilon: Double,
      releaseTag: String): DataFrame =
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("__n"))
      // coalesce: concat(tag, NULL) is NULL and md5(NULL) is NULL — a NULL
      // key group would otherwise be released with NULL noise (neither
      // protected nor published); the sentinel gives it a real seed
      .withColumn("noisy_n",
        col("__n") + laplaceNoise(
          concat(lit(releaseTag + "_"),
            coalesce(col(keyCol).cast("string"), lit("__null__"))),
          1.0 / epsilon))
      .drop("__n")
}
