package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Num
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Batch-mode executions of the streaming surface — SURVEY.md §2.9.
  *
  * Each query runs the SAME transform as the streaming path (Streams.*) on
  * the static events table, which is what makes a DuckDB oracle possible;
  * StreamingSpec drives the identical code through MemoryStream.
  */
object StreamShapeQueries {

  private val fmt = "yyyy-MM-dd HH:mm:ss"
  private val dfmt = "%Y-%m-%d %H:%M:%S"

  val defs: Seq[QueryDef] = Seq(

    // Tumbling 1-hour window aggregation (window() aligns to the epoch in
    // UTC, i.e. date_trunc('hour') for a 1-hour width).
    QueryDef(
      "q_stream_tumbling",
      Some(s"""SELECT strftime(date_trunc('hour', ts), '$dfmt') AS w_start,
                      event_type, CAST(count(*) AS BIGINT) AS n,
                      CAST(round(CAST(sum(value) AS DECIMAL(28,6)), 2) AS DOUBLE) AS sum_value
               FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""")) { (s, d) =>
      Streams.tumblingCounts(Tables.events(s, d))
        .select(
          date_format(col("w.start"), fmt).as("w_start"),
          col("event_type"), col("n"),
          Num.round2(col("sum_value")).as("sum_value"))
        .orderBy("w_start", "event_type")
    },

    // Sliding 1-hour windows every 15 minutes: each event lands in exactly
    // four windows; the oracle reproduces window()'s epoch-aligned starts
    // with a 0..3 offset unnest.
    QueryDef(
      "q_stream_sliding",
      Some(s"""SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                               - o * INTERVAL '15 minutes', '$dfmt') AS w_start,
                      CAST(count(*) AS BIGINT) AS n,
                      CAST(round(CAST(sum(value) AS DECIMAL(28,6)), 2) AS DOUBLE) AS sum_value
               FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS o)
               GROUP BY 1 ORDER BY w_start""")) { (s, d) =>
      Streams.slidingCounts(Tables.events(s, d))
        .select(
          date_format(col("w.start"), fmt).as("w_start"),
          col("n"), Num.round2(col("sum_value")).as("sum_value"))
        .orderBy("w_start")
    },

    // Session windows (30-minute gap) per user. Spark's session is
    // [first_ts, last_ts + gap); the oracle rebuilds the same islands with
    // a lag()-gap flag + running sum. A gap of exactly 30:00 starts a new
    // session on both sides (>=).
    QueryDef(
      "q_stream_session",
      Some(s"""WITH flagged AS (
                 SELECT user_id, ts,
                        CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                             THEN 1 ELSE 0 END AS new_s
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
               numbered AS (
                 SELECT user_id, ts,
                        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                 FROM flagged)
               SELECT user_id,
                      strftime(min(ts), '$dfmt') AS w_start,
                      strftime(max(ts) + INTERVAL 30 MINUTE, '$dfmt') AS w_end,
                      CAST(count(*) AS BIGINT) AS n
               FROM numbered GROUP BY user_id, sid
               ORDER BY user_id, w_start""")) { (s, d) =>
      Streams.sessionCounts(Tables.events(s, d))
        .select(
          col("user_id"),
          date_format(col("sw.start"), fmt).as("w_start"),
          date_format(col("sw.end"), fmt).as("w_end"),
          col("n"))
        .orderBy("user_id", "w_start")
    },

    // Streaming dedup shape: a doubled stream deduplicated on event_id
    // (batch: union-all + dropDuplicates; rows are bit-identical so the
    // kept row is well-defined).
    QueryDef(
      "q_stream_dedup",
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n
              FROM (SELECT DISTINCT * FROM
                     (SELECT * FROM events UNION ALL SELECT * FROM events))
              GROUP BY event_type ORDER BY event_type""")) { (s, d) =>
      val e = Tables.events(s, d)
      Streams.dedupByEventId(e.unionByName(e))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // Stream-stream time-bounded join (purchases ↔ clicks of the same user
    // within the preceding 20 minutes). Batch mode runs the identical
    // transform; StreamingSpec drives it through MemoryStream. The time
    // bound is what keeps join state finite on unbounded streams; in batch
    // it plans as an equi-join on user_id with a range residual.
    QueryDef(
      "q_stream_join",
      Some(s"""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                      p.user_id,
                      strftime(p.ts, '$dfmt') AS p_ts,
                      strftime(c.ts, '$dfmt') AS c_ts
               FROM events p JOIN events c
                 ON p.user_id = c.user_id
                AND c.ts <= p.ts
                AND c.ts >= p.ts - INTERVAL 20 MINUTE
               WHERE p.event_type = 'purchase' AND c.event_type = 'click'
               ORDER BY purchase_id, click_id""")) { (s, d) =>
      Streams.purchaseAfterClick(Tables.events(s, d))
        .select(
          col("purchase_id"), col("click_id"),
          col("p_user").as("user_id"),
          date_format(col("p_ts"), fmt).as("p_ts"),
          date_format(col("c_ts"), fmt).as("c_ts"))
        .orderBy("purchase_id", "click_id")
    },

    // Stateful per-key running totals (flatMapGroupsWithState) — batch mode
    // processes each key's whole history in one state update, so the final
    // totals are oracle-checkable with a plain aggregate + top-1 window.
    QueryDef(
      "q_stream_state",
      Some("""SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
                     CAST(round(CAST(sum_value AS DECIMAL(28,6)), 2) AS DOUBLE) AS sum_value
              FROM (SELECT user_id, count(*) AS n_events, sum(value) AS sum_value
                    FROM events GROUP BY user_id)
              ORDER BY user_id""")) { (s, d) =>
      import s.implicits._
      val typed = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"))
        .as[Streams.UserEvent]
      Streams.runningTotals(typed)
        .select(
          col("user_id"), col("n_events"),
          Num.round2(col("sum_value")).as("sum_value"))
        .orderBy("user_id")
    }
  )
}
