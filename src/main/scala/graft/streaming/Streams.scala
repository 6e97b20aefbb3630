package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.jdk.CollectionConverters._

/** Structured Streaming surface — SURVEY.md §2.9.
  *
  * The reference's incremental contract (offset resume + high-water-mark
  * audit, data_seoul_2_csv_noopenapi.py:112-140) generalizes to Structured
  * Streaming: checkpointed source offsets replace START_IDX, watermarks
  * bound state, windowed aggregations replace the driver-side counters.
  *
  * Every transform here is written against Dataset/DataFrame so the SAME
  * code runs batch (DuckDB-oracle-checked via StreamShapeQueries) and
  * streaming (MemoryStream-driven in StreamingSpec). `withWatermark` is a
  * no-op on batch inputs, so the sharing is exact.
  */
object Streams {

  /** Tumbling 1-hour window counts per event type. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Sliding 1-hour windows advancing every 15 minutes. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Session windows with a 30-minute inactivity gap, per user. */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** Streaming dedup by event id; watermark bounds the dedup state. */
  def dedupByEventId(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Per-user running state (count + value sum) — the streaming
    * generalization of the reference's `list_total_count` counter.
    * Output one row per user per micro-batch with the updated totals. */
  case class UserEvent(event_id: Long, user_id: Long, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  def runningTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          // deterministic in-group order (iterator order is not guaranteed)
          val batch = rows.toSeq.sortBy(_.event_id)
          val next = batch.foldLeft(prev)((acc, e) =>
            UserRunning(user, acc.n_events + 1, acc.sum_value + e.value))
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Stream-stream inner join: purchases matched to clicks of the same user
    * within the preceding 20 minutes. Both sides watermarked so join state
    * is bounded; the time-bound condition is what makes unbounded
    * stream-stream joins feasible at all. */
  def purchaseAfterClick(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(
      clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 20 MINUTES"))
  }

  /** Streaming MERGE sink — the streaming generalization of the reference's
    * enrichment write-back (UPDATE ... WHERE ID=?): each micro-batch of
    * updates is merged into the target state via foreachBatch +
    * Enrich.merge. Returns the started query; read the merged state from
    * `stateRef` after processing. */
  def mergeSink(
      updates: DataFrame,
      initial: DataFrame,
      key: String,
      updateCols: Seq[String],
      stateRef: java.util.concurrent.atomic.AtomicReference[DataFrame])
      : org.apache.spark.sql.streaming.StreamingQuery = {
    stateRef.set(initial)
    updates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val merged = graft.operators.Enrich
          .merge(stateRef.get(), batch, key, updateCols)
        // materialize the new state so it survives the source batch's scope
        stateRef.set(batch.sparkSession.createDataFrame(
          merged.collect().toIndexedSeq.asJava, merged.schema))
        ()
      }
      .start()
  }

  /** File-source streaming read of an events directory with an explicit
    * schema — checkpointed offsets give the reference's resume semantics
    * for free. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema).parquet(s"$dir/events.parquet")
  }
}
