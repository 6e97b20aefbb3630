package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — multi-dimensional clustering (Z-order) for
  * scan pruning.
  *
  * At 100 TB a table is sorted/partitioned on at most one key; predicates
  * on a second column scan everything. Z-ordering interleaves the bits of
  * several normalized dimensions into one sort key, so rows close in ANY
  * dimension land in the same files and parquet min/max stats prune scans
  * for predicates on EACH dimension (the Delta/Iceberg OPTIMIZE ZORDER
  * strategy, expressed as plain repartitionByRange + sortWithinPartitions).
  *
  * The z-value is an unrolled tree of codegen'd bitwise built-ins — no
  * UDF, fully pushdown/codegen-friendly, and oracle-expressible (the
  * identical arithmetic runs in DuckDB SQL).
  */
object Layout {

  /** Normalize a numeric column into [0, 2^bits) given literal bounds.
    * Integer-deterministic: (c - min) * 2^bits / (max - min + 1) in LONG
    * arithmetic, so both engines compute identical buckets. */
  def bucketize(c: Column, minV: Long, maxV: Long, bits: Int): Column = {
    val range = maxV - minV + 1
    ((c.cast("long") - minV) * (1L << bits) / range).cast("long")
  }

  /** Interleave the low `bits` bits of two bucketized columns: bit b of x
    * lands at position 2b, bit b of y at 2b+1. Plan-time unrolled —
    * 2*bits shift/mask terms reduced with bitwise OR, all codegen'd. */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms: Seq[Column] = (0 until bits).flatMap { b =>
      Seq(
        shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
    terms.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** Z-order a frame by two numeric dimensions and write it as parquet:
    * bounds via one tiny agg (driver-bounded: 4 longs), bucketize +
    * interleave, range-partition on the z-value (so files hold contiguous
    * z-ranges) and sort within partitions (so row groups within a file
    * are also contiguous). After this, a range predicate on EITHER
    * dimension touches only the few files whose z-range intersects it —
    * parquet min/max stats skip the rest at scan time. */
  def zorderWrite(
      df: DataFrame,
      dimX: String,
      dimY: String,
      path: String,
      nFiles: Int,
      bits: Int = 16): Unit = {
    val b = df.agg(
      min(col(dimX)).cast("long"), max(col(dimX)).cast("long"),
      min(col(dimY)).cast("long"), max(col(dimY)).cast("long")).collect()(0)
    val z = zValue2(
      bucketize(col(dimX), b.getLong(0), b.getLong(1), bits),
      bucketize(col(dimY), b.getLong(2), b.getLong(3), bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
