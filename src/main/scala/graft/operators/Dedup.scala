package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators — exact family (SURVEY.md §2.7, §2.10; the
  * near-dup family lives in graft.functions.MinHash / SimHash).
  *
  * All shapes are a single hash shuffle on the dedup key — the only scan
  * pattern that survives 100 TB. Nothing collects to the driver.
  */
object Dedup {

  /** One row per distinct key combination: deterministic keeper id
    * (min of `idCol`) plus the duplicate count. Group-by formulation —
    * map-side partial aggregation halves the shuffle vs a window. */
  def exactGroups(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select(col("keep_id"), col("dup_cnt"))

  /** dropDuplicates with a deterministic survivor: keeps the full row with
    * the smallest `idCol` per key (plain dropDuplicates keeps an arbitrary
    * row, which breaks differential testing and reproducibility). */
  def exactKeepFirst(df: DataFrame, keys: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(idCol))
    df.withColumn("__dd_rn", row_number().over(w))
      .filter(col("__dd_rn") === 1)
      .drop("__dd_rn")
  }
}
