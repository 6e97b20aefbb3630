package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling — the corpus-downsampling primitives a
  * training-data pipeline runs constantly (decimate a crawl, balance
  * languages, carve eval splits).
  *
  * Spark's `df.sample` is seed-dependent per partitioning and not
  * reproducible across engines, so these sample by an arithmetic hash of a
  * stable id instead: the SAME rows are selected on every run, on every
  * engine (the DuckDB oracle applies identical arithmetic), and adding or
  * removing other rows never changes a row's own fate — the property that
  * makes incremental re-ingestion consistent. All shapes are narrow maps
  * plus at most one shuffle (the per-stratum window).
  */
object Sample {

  /** Deterministic bucket in [0, buckets) from an id column: multiplicative
    * hashing with all intermediates bounded below 2^63 (the pre-fold by the
    * prime keeps the product ~2.6e15), so the same expression evaluates
    * without overflow — and therefore identically — in Spark and DuckDB. */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(pmod(id, lit(1000003L)) * lit(2654435761L) + lit(40503L),
      lit(1000003L)) % buckets

  /** Keep ~`percent`% of rows, chosen deterministically by id. */
  def byRate(df: DataFrame, idCol: String, percent: Int): DataFrame =
    df.filter(hashBucket(col(idCol), 100) < percent)

  /** At most `k` rows per stratum, chosen deterministically: the k ids with
    * the smallest (hash, id) per stratum — a reproducible reservoir. */
  def fixedPerStratum(df: DataFrame, stratumCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(hashBucket(col(idCol), 1000003), col(idCol))
    df.withColumn("__s_rn", row_number().over(w))
      .filter(col("__s_rn") <= k)
      .drop("__s_rn")
  }

  /** Deterministic WEIGHT-PROPORTIONAL top-k per stratum: sequential-
    * Poisson priority sampling (Ohlsson's u/w order statistic — NOT the
    * Efraimidis–Spirakis u^(1/w) scheme, whose inclusion probabilities
    * differ) as a deterministic integer approximation — priority =
    * ⌊hash(id)·2^20 / w⌋, the k smallest priorities win (a heavier row
    * divides its hash by a larger weight, so it sinks toward the front
    * proportionally). The float-free key makes
    * the sample engine-portable: hash < 2^20 ⇒ hash·2^20 < 2^41, the
    * integer division ((x − pmod)/y) is exact in doubles, and ties break on
    * id. One partitioned window per stratum — never global. The canonical
    * use: carve a token-budget subcorpus where long documents are
    * proportionally more likely to be kept. */
  def weightedPerStratum(df: DataFrame, stratumCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    val x = hashBucket(col(idCol), 1000003) * lit(1048576L)
    val y = greatest(col(weightCol).cast("long"), lit(1L))
    val pr = ((x - pmod(x, y)) / y).cast("long")
    val w = Window.partitionBy(stratumCol).orderBy(pr, col(idCol))
    df.withColumn("__w_rn", row_number().over(w))
      .filter(col("__w_rn") <= k)
      .drop("__w_rn")
  }

  /** k deterministic negatives per row, for contrastive-pair generation:
    * bucket every id (`buckets` must exceed `k`); the j-th negative of a
    * row in bucket b is the representative (min id) of bucket (b+j) mod
    * buckets — a different bucket by construction, so never the row itself.
    * The rep table is `buckets` rows (a broadcast), the probe side is a
    * narrow ×k explode plus one broadcast equi-join: linear, shuffle-free.
    * Rows whose target bucket is empty simply emit no pair at that rank
    * (only possible when rows < buckets). Returns (id, neg_rank, neg_id). */
  def negativePairs(df: DataFrame, idCol: String, k: Int,
      buckets: Int): DataFrame = {
    require(buckets > k, s"buckets ($buckets) must exceed k ($k)")
    val withB = df.select(col(idCol)).withColumn("__nb",
      hashBucket(col(idCol), buckets))
    val reps = withB.groupBy(col("__nb").as("__rb"))
      .agg(min(col(idCol)).as("neg_id"))
    withB
      .select(col(idCol), col("__nb"),
        explode(sequence(lit(1L), lit(k.toLong))).as("neg_rank"))
      .join(broadcast(reps),
        (col("__nb") + col("neg_rank")) % buckets === col("__rb"))
      .select(col(idCol), col("neg_rank"), col("neg_id"))
  }
}
