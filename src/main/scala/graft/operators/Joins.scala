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

  /** Bloom-prefiltered join: build a Bloom filter over the (already
    * filtered) dim side's keys and push `might_contain` into the fact
    * scan BEFORE the join shuffle — the runtime-filter technique
    * (Catalyst's InjectRuntimeFilter applies it when statistics allow;
    * this makes it explicit and deterministic for selective dim
    * predicates the optimizer can't size). Bloom filters have no false
    * negatives, so the result set is EXACTLY the plain join's — only the
    * shuffled fact volume changes. The built filter is bounded driver
    * state (numBits/8 bytes, default ~1 MB), same category as the
    * centroid/schema collects the 100 TB rules allow; at cluster scale
    * the same bytes ride one broadcast instead of a fact-table shuffle
    * of non-matching rows.
    *
    * Uses Spark's own sketch expressions (BloomFilterAggregate /
    * BloomFilterMightContain over xxhash64-ed keys) so behavior matches
    * the engine's runtime filters bit-for-bit.
    *
    * Sizing: when `estimatedDimKeys` is not given, the filter is sized
    * from a `count()` of the already-filtered dim side — one extra pass
    * over the (small, by contract) dim, which at 100 TB is what keeps an
    * oversized bloom from wasting broadcast bytes and an undersized one
    * from losing selectivity. Pass an explicit estimate to skip the count
    * when the caller already knows the cardinality.
    */
  def bloomPrefilteredJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      estimatedDimKeys: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val nKeys = math.max(1L, estimatedDimKeys.getOrElse(dim.count()))
    val bloomAgg = new BloomFilterAggregate(
      new XxHash64(Seq(expression(col(key))), 42L), nKeys)
      .toAggregateExpression()
    val bloom = dim.select(column(bloomAgg).as("bf")).collect()(0).getAs[Array[Byte]](0)
    val pruned = fact.filter(column(BloomFilterMightContain(
      Literal(bloom, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(expression(col(key))), 42L))))
    pruned.join(dim, Seq(key))
  }
}
