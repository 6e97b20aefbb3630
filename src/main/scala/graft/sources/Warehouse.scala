package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table storage — the co-located-join strategy from SURVEY.md
  * §4.2's 100 TB rules: write both sides of a recurring large-large join
  * bucketed by the join key, and the join plans with zero exchanges (each
  * bucket pair joins locally). The write cost is paid once; every
  * subsequent join on that key skips its shuffle.
  */
object Warehouse {

  /** Write `df` as a bucketed managed table (parquet).
    *
    * Drops any previous incarnation first, including a stale on-disk
    * location left by an earlier session — a managed-table overwrite fails
    * with LOCATION_ALREADY_EXISTS when the catalog (in-memory per session)
    * has forgotten the table but its directory survived. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit =
    writeBucketedMulti(df, table, Seq(bucketCol), nBuckets, sortCols)

  /** Multi-column bucketing: a join whose keys EQUAL the bucket columns
    * plans the bucketed side with zero exchange (the scan's
    * HashPartitioning over the bucket columns satisfies the join's
    * clustering requirement directly). Used for composite keys like the
    * incremental-dedup band table's (band_idx, band_hash). */
  def writeBucketedMulti(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty)
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * were written with the same bucket count on the join key. */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Date/key-partitioned parquet sink — SURVEY §4.2's "every sink
    * partitioned": readers filtering on the partition column scan only
    * matching directories (partition pruning), and incremental loads append
    * whole partitions idempotently. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
}
