package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Execute small-file compaction on a Hive-partitioned parquet table:
    * every partition directory holding MORE files than its row count
    * needs (ceil(n_rows / targetRowsPerFile)) is rewritten in place into
    * exactly that many files; partitions already at or under their target
    * are left byte-for-byte untouched (their file set is never rewritten,
    * so concurrent readers and downstream mtime-based caches are safe).
    * This is the EXECUTOR for the q_layout_compact planner — the
    * maintenance pass that keeps a streaming-ingested table scannable.
    *
    * Mechanics: one distributed keyed count sizes each partition; only
    * partitions over target are re-read, hash-repartitioned on the
    * partition column (each partition's rows land in one task — the
    * writer still splits output per directory, so task collisions cannot
    * merge days), and written back via dynamic partition overwrite with
    * `maxRecordsPerFile`, which rolls files at exactly the target row
    * count → ceil(n/target) files per partition. The eager checkpoint
    * (executor blocks by default; [[CheckpointMode.Reliable]] for a
    * fault-tolerant scratch dir) materializes the selected rows BEFORE
    * the overwrite deletes the directories being read — same-path
    * read+write is illegal otherwise. At warehouse scale a very large
    * single partition adds a slot
    * column to the repartition to parallelize its rewrite (costing at most
    * slots-1 underfull files).
    *
    * Returns the per-partition audit (value, n_rows, files_before,
    * files_after) as a DataFrame. The audit is partition-count-sized —
    * table METADATA, like a catalog listing — so building it on the driver
    * is bounded; all row data moves only inside the rewrite job.
    */
  def compactExecute(
      spark: SparkSession,
      path: String,
      partCol: String,
      targetRowsPerFile: Long,
      mode: CheckpointMode = CheckpointMode.Local): DataFrame = {
    // mode = Reliable(dir): the pre-overwrite materialization below is a
    // reliable checkpoint, so executor loss DURING the overwrite (after
    // the source dirs are deleted) re-reads checkpoint files instead of
    // failing with the source gone — the cluster-production setting
    val lin = new Lineage(spark, mode)
    require(targetRowsPerFile > 0, s"target must be positive, got $targetRowsPerFile")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileCounts(): Map[String, Int] =
      fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
        .map { d =>
          val v = d.getPath.getName.stripPrefix(s"$partCol=")
          v -> fs.listStatus(d.getPath)
            .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        }.toMap
    val before = fileCounts()
    def targetFiles(n: Long): Int =
      ((n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val rowCounts = spark.read.parquet(path)
      .groupBy(col(partCol).cast("string").as("__pv"))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val needs = rowCounts.keys
      .filter(v => before.getOrElse(v, 0) > targetFiles(rowCounts(v)))
      .toSeq.sorted
    if (needs.nonEmpty) {
      val selected = lin.tracked(spark.read.parquet(path)
        .filter(col(partCol).cast("string").isin(needs: _*)))._1
      selected
        .repartition(col(partCol))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", targetRowsPerFile)
        .partitionBy(partCol)
        .parquet(path)
    }
    val after = fileCounts()
    import spark.implicits._
    rowCounts.toSeq.sortBy(_._1)
      .map { case (v, n) =>
        (v, n, before.getOrElse(v, 0), after.getOrElse(v, 0))
      }
      .toDF(partCol, "n_rows", "files_before", "files_after")
  }
}
