package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest bookkeeping — SURVEY.md §2.1 (audit sink).
  *
  * The reference records completion by UPDATEing the physical-table row
  * (`DATA_INSERTED_YN='Y'`, `DATA_INSERT_DATE=SYSDATE`,
  * `DATA_INSERT_ROW=count`, data_seoul_2_csv_noopenapi.py:133-140).
  * The append-only Spark equivalent: one audit row per completed write,
  * derived from the written frame itself.
  */
object Audit {

  /** One audit row for a completed ingest of `df` into `tableName`.
    * `quarantined` = malformed-line count from a PERMISSIVE staging read
    * ([[Ingest.csvQuarantine]]) — 0 for sources with no quarantine path,
    * so every audit row carries the column and a downstream monitor can
    * alert on it uniformly (the reference's per-INSERT rejection left this
    * count implicit in the DB logs). */
  def record(
      spark: SparkSession,
      tableName: String,
      df: DataFrame,
      quarantined: Long = 0L): DataFrame = {
    df.agg(
        count(lit(1)).as("data_insert_row"),
        max(col("id")).as("high_water_mark"))
      .select(
        lit(tableName).as("table_name"),
        lit("Y").as("data_inserted_yn"),
        current_timestamp().as("data_insert_date"),
        col("data_insert_row"),
        col("high_water_mark"),
        lit(quarantined).as("data_quarantine_row"))
  }
}
