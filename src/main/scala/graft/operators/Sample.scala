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
}
