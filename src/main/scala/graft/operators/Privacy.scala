package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Noise-seed mode for [[Privacy.dpCounts]]. The Laplace noise is derived
  * deterministically from the seed, so WHO can recompute the seed decides
  * whether the release is actually private. */
sealed trait ReleaseSeed

object ReleaseSeed {
  /** Publicly-known seed: the noise is replayable by anyone who knows the
    * tag, so the release carries NO differential-privacy guarantee. Exists
    * for oracle parity and benchmarking (DuckDB replays the identical
    * noise bit-exactly); the output column is flagged `dp_seed_mode =
    * public-tag` so a downstream consumer can refuse to publish it. */
  final case class PublicTag(tag: String) extends ReleaseSeed

  /** Production mode: a per-release random secret held by the releasing
    * party. An adversary who cannot recompute md5(key + group) cannot
    * subtract the noise, so the ε-DP guarantee holds. Re-running the same
    * release with the same key republishes the SAME noised values (never a
    * second, differently-noised copy that would average away protection);
    * a new release epoch gets a fresh key. ≥128 bits of key material
    * required — a guessable key is a [[PublicTag]] with extra steps. */
  final case class SecretKey(key: String) extends ReleaseSeed {
    require(key.getBytes("UTF-8").length >= 16,
      "secret release key must carry >= 128 bits of material; " +
        "use ReleaseSeed.PublicTag for deliberately replayable releases")
  }
}

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
    * The [[ReleaseSeed]] mode decides whether the release is PRIVATE or
    * merely deterministic: [[ReleaseSeed.SecretKey]] is the production
    * path (noise unrecoverable without the key); [[ReleaseSeed.PublicTag]]
    * exists so an oracle/benchmark can replay the noise bit-exactly — with
    * a known tag anyone can re-derive md5(tag + key), subtract the noise,
    * and recover exact counts, so it is NOT a private release. The seed
    * mode is stamped into the `noisy_n` column metadata (`dp_seed_mode`,
    * `dp_guarantee`) so downstream publication steps can gate on it. The
    * registered q_anon_dp query uses PublicTag("rel1") deliberately.
    */
  def dpCounts(df: DataFrame, keyCol: String, epsilon: Double,
      seed: ReleaseSeed): DataFrame = {
    val (prefix, mode, guarantee) = seed match {
      case ReleaseSeed.PublicTag(t) =>
        (t, "public-tag", "NONE (noise replayable from the public tag)")
      case ReleaseSeed.SecretKey(k) =>
        (k, "secret-key", s"epsilon=$epsilon while the key stays secret")
    }
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("dp_seed_mode", mode)
      .putString("dp_guarantee", guarantee)
      .build()
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("__n"))
      // coalesce: concat(tag, NULL) is NULL and md5(NULL) is NULL — a NULL
      // key group would otherwise be released with NULL noise (neither
      // protected nor published); the sentinel gives it a real seed
      .withColumn("noisy_n",
        (col("__n") + laplaceNoise(
          concat(lit(prefix + "_"),
            coalesce(col(keyCol).cast("string"), lit("__null__"))),
          1.0 / epsilon)).as("noisy_n", meta))
      .drop("__n")
  }

  /** Back-compat overload: a bare string tag is by definition public. */
  def dpCounts(df: DataFrame, keyCol: String, epsilon: Double,
      releaseTag: String): DataFrame =
    dpCounts(df, keyCol, epsilon, ReleaseSeed.PublicTag(releaseTag))
}
