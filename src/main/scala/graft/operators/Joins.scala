package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond the stock equi-join surface — SURVEY.md §2.3. */
object Joins {

  /** As-of join: for each left row, the single right row with the greatest
    * `rightTime <= leftTime` among rows sharing the join key.
    *
    * Formulation: equi join on the key (shuffle-partitioned by key — scales
    * to arbitrary data sizes; no global sort), time predicate as a join
    * filter, then a windowed top-1 per left row. `idCols` must uniquely
    * identify a left row; `tieBreak` makes the pick deterministic when
    * several right rows share the as-of time.
    *
    * This generalizes the reference's "latest ingest row" lookup
    * (`ORDER BY ID DESC` + take-first, data_seoul_2_csv_noopenapi.py:74-79)
    * from a per-key driver query to a distributed operator.
    *
    * Scale note: fan-out is bounded by matches-per-key; with heavy key skew
    * AQE skew-join splitting applies because the pre-window shape is a plain
    * shuffled equi join.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      idCols: Seq[String],
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val joined = left.join(right, leftKey === rightKey && rightTime <= leftTime)
    val w = Window
      .partitionBy(idCols.map(col): _*)
      .orderBy(rightTime.desc +: tieBreak: _*)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** Range join of facts against a small band/dimension table with an
    * arbitrary non-equi condition. The small side is broadcast so the plan
    * is a broadcast nested-loop join — the only shape that stays cheap for
    * theta joins at 100 TB (never cartesian two large sides).
    */
  def rangeJoinSmall(facts: DataFrame, smallBands: DataFrame, cond: Column): DataFrame =
    facts.join(broadcast(smallBands), cond)
}
