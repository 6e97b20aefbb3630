package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot differencing — change-data-capture without a log.
  *
  * The reference re-ingests whole datasets and tracks only a high-water
  * row offset (`START_IDX`, data_seoul_2_csv_noopenapi.py:74-79,115),
  * which misses updates and deletes entirely. At warehouse scale the
  * standard recovery is snapshot diff: full-outer-join yesterday's and
  * today's extracts on the business key and classify each key as
  * insert / delete / update / unchanged.
  */
object Cdc {

  /** Diff two snapshots sharing a schema. Returns one row per key present
    * in either side, with `change_type` ∈ insert|delete|update|unchanged.
    *
    * Non-key columns are compared as a single struct with null-safe
    * semantics (`<=>`): a value flipping to/from NULL counts as an update,
    * not silently unchanged.
    *
    * Scale shape: ONE full-outer shuffle join on the key — both sides
    * partition by hash(key), no broadcast requirement, AQE handles skew.
    * Downstreams usually aggregate by change_type (map-side partials) or
    * anti-filter `unchanged`, so nothing widens after the join.
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keys: Seq[String]): DataFrame = {
    val nonKeys = oldSnap.columns.filterNot(keys.contains).toSeq
    require(nonKeys.nonEmpty, "snapshotDiff needs at least one non-key column")
    def packed(df: DataFrame, as: String) =
      df.select(keys.map(col) :+ struct(nonKeys.map(col): _*).as(as): _*)
    packed(oldSnap, "__o")
      .join(packed(newSnap, "__n"), keys, "full_outer")
      .select(
        keys.map(col) :+
          when(col("__o").isNull, lit("insert"))
            .when(col("__n").isNull, lit("delete"))
            .when(!(col("__o") <=> col("__n")), lit("update"))
            .otherwise(lit("unchanged"))
            .as("change_type"): _*)
  }

  /** Compact an append-only changelog into SCD2 validity intervals: per
    * key, consecutive rows with identical tracked attributes collapse into
    * one row valid from its first timestamp until the next attribute
    * change (`valid_to` = NULL ⇒ current version).
    *
    * `tieCol` breaks timestamp ties so the changelog order — and therefore
    * the emitted history — is total and replayable.
    *
    * Scale shape: both windows and the change filter share one
    * hash-partition-by-key + sort; the Exchange is planned once. No
    * broadcast, no driver state — the history of each key is computed
    * where the key lives, the layout a 100 TB changelog forces.
    */
  def scd2FromChangelog(
      log: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    log
      .withColumn("__prev", lag(attrs, 1).over(w))
      // first row per key OR any tracked attribute changed (null-safe:
      // NULL -> value and value -> NULL are both changes)
      .filter(col("__prev").isNull || !(col("__prev") <=> attrs))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev")
  }

  /** Time travel over an SCD2 table: the dimension state as of instant
    * `at` — the version whose validity interval covers it (valid_from <=
    * at < valid_to, open current version included). A narrow filter over
    * the history table (partition-prunable when the table is laid out by
    * valid_from date), no window, no join: per key at most one row
    * survives because versions are non-overlapping by construction. */
  def snapshotAt(scd2: DataFrame, at: Column): DataFrame =
    scd2.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
