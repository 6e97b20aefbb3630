package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style enrichment — SURVEY.md §2.1 (update/upsert sink).
  *
  * The reference's category backfill UPDATEs matched rows in place
  * (`UPDATE DATA_BASIC_INFO SET CATEGORY_BIG=? ... WHERE ID=?`,
  * data_seoul_1_category.py:80-83). Plain Spark storage has no in-place
  * UPDATE; the equivalent is a left join of updates onto the target with
  * per-column coalesce, then an overwrite of the table — MERGE semantics
  * without a table-format dependency (SURVEY §7.4).
  */
object Enrich {

  /** Left-join `updates` onto `target` by `key`; for every column of
    * `updateCols` present in both, the update value wins when non-null.
    * Unmatched target rows pass through unchanged (the reference's
    * untouched-rows-keep-NULL behavior). */
  def merge(target: DataFrame, updates: DataFrame, key: String,
      updateCols: Seq[String]): DataFrame = {
    val u = updates.select(
      (key +: updateCols).map(c =>
        if (c == key) col(c) else col(c).as(s"__u_$c")): _*)
    val joined = target.join(u, Seq(key), "left")
    val outCols = target.columns.map { c =>
      if (updateCols.contains(c)) coalesce(col(s"__u_$c"), col(c)).as(c)
      else col(c)
    }
    joined.select(outCols.toIndexedSeq: _*)
  }
}
