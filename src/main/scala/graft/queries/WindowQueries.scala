package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Num
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions — SURVEY.md §2.5.
  *
  * Every window here is partitioned (never a global ORDER BY window — the
  * single-partition shape that dies at scale). The reference's two implicit
  * windows: top-1 per key via `ORDER BY ID DESC` + take-first
  * (`data_seoul_2_csv_noopenapi.py:74-79`) and the surrogate-ID row counter
  * (`:116,128`).
  */
object WindowQueries {

  val defs: Seq[QueryDef] = Seq(

    // row_number / rank / dense_rank: top-5 customers per market segment.
    QueryDef(
      "q_win_rank",
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
                     CAST(rn AS BIGINT) AS rn, CAST(rnk AS BIGINT) AS rnk,
                     CAST(drnk AS BIGINT) AS drnk
              FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                           row_number() OVER w AS rn,
                           rank() OVER w AS rnk,
                           dense_rank() OVER w AS drnk
                    FROM customer
                    WINDOW w AS (PARTITION BY c_mktsegment
                                 ORDER BY c_acctbal DESC, c_custkey))
              WHERE rn <= 5
              ORDER BY c_mktsegment, rn""")) { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= 5)
        .select(
          col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          col("rn").cast("long"), col("rnk").cast("long"),
          col("drnk").cast("long"))
        .orderBy("c_mktsegment", "rn")
    },

    // Top-1 per key — the reference's latest-ingest lookup
    // (data_seoul_2_csv_noopenapi.py:74-79) as a distributed window.
    QueryDef(
      "q_win_latest",
      Some("""SELECT o_custkey, o_orderkey AS last_orderkey,
                     strftime(o_orderdate, '%Y-%m-%d') AS last_date
              FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                    FROM orders)
              WHERE rn = 1 ORDER BY o_custkey""")) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("o_custkey"),
          col("o_orderkey").as("last_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("last_date"))
        .orderBy("o_custkey")
    },

    // lag: per-user delta between consecutive event values.
    QueryDef(
      "q_win_lag",
      Some("""SELECT event_id,
                     CAST(round(CAST(value - lag(value, 1) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS DECIMAL(28,6)), 2) AS DOUBLE) AS delta
              FROM events ORDER BY event_id""")) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(
          col("event_id"),
          Num.round2(col("value") - lag(col("value"), 1).over(w)).as("delta"))
        .orderBy("event_id")
    },

    // Moving aggregate with an explicit ROWS frame.
    QueryDef(
      "q_win_moving",
      Some("""SELECT event_id,
                     CAST(round(CAST(avg(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DECIMAL(28,6)), 2) AS DOUBLE) AS mov_avg
              FROM events ORDER BY event_id""")) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), Num.round2(avg("value").over(w)).as("mov_avg"))
        .orderBy("event_id")
    },

    // Relative-rank windows: percent_rank and cume_dist per segment.
    QueryDef(
      "q_win_relrank",
      Some("""SELECT c_custkey,
                     CAST(round(CAST(percent_rank() OVER w AS DECIMAL(28,6)), 2) AS DOUBLE) AS pct_rank,
                     CAST(round(CAST(cume_dist() OVER w AS DECIMAL(28,6)), 2) AS DOUBLE) AS cume
              FROM customer
              WINDOW w AS (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal, c_custkey)
              ORDER BY c_custkey""")) { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          Num.round2(percent_rank().over(w)).as("pct_rank"),
          Num.round2(cume_dist().over(w)).as("cume"))
        .orderBy("c_custkey")
    },

    // RANGE frame over a numeric (epoch-seconds) ordering: per user, the
    // event count and value sum within the trailing 10 minutes — the
    // time-based sliding aggregate (vs the ROWS frame of q_win_moving).
    QueryDef(
      "q_win_range",
      Some("""SELECT event_id,
                     CAST(count(*) OVER w AS BIGINT) AS n_10m,
                     CAST(round(CAST(sum(value) OVER w AS DECIMAL(28,6)), 2) AS DOUBLE) AS sum_10m
              FROM (SELECT event_id, user_id, value,
                           CAST(epoch(ts) AS BIGINT) AS ts_sec FROM events)
              WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                           RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
              ORDER BY event_id""")) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts_sec")
        .rangeBetween(-600, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .select(
          col("event_id"),
          count(lit(1)).over(w).as("n_10m"),
          Num.round2(sum("value").over(w)).as("sum_10m"))
        .orderBy("event_id")
    },

    // ntile bucketing + first/last value over an explicit frame.
    QueryDef(
      "q_win_ntile",
      Some("""SELECT o_custkey, o_orderkey,
                     CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                     first_value(o_orderkey) OVER w AS first_ok,
                     last_value(o_orderkey) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              ORDER BY o_custkey, o_orderkey""")) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(wFull).as("last_ok"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Cumulative sum (integral doubles — exact, no rounding needed).
    // (l_suppkey, l_orderkey, l_linenumber) is NOT unique in the synthetic
    // data, so the window order adds l_quantity (ties beyond that add the
    // same value — order-invariant) and the output order adds cum_qty,
    // which strictly increases within a partition, making it total.
    QueryDef(
      "q_win_cumsum",
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
                     sum(l_quantity) OVER (PARTITION BY l_suppkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_qty
              FROM lineitem
              ORDER BY l_suppkey, l_orderkey, l_linenumber, cum_qty""")) { (s, d) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum("l_quantity").over(w).as("cum_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "cum_qty")
    },

    // Time-series gap fill + forward fill: densify each user's daily event
    // series onto a contiguous day grid (sequence explode per key — narrow,
    // grid bounded by that key's own span) and carry the last observed
    // daily value across the gaps (last IGNORE NULLS over a partitioned
    // window). The missing-sensor-readings shape every telemetry warehouse
    // needs; no global window anywhere. First grid day = the user's first
    // active day, so the carried value is never NULL.
    QueryDef(
      "q_win_gapfill",
      Some("""WITH daily AS (
                SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS n_events,
                       CAST(round(CAST(sum(value) AS DECIMAL(28,6)), 2) AS DOUBLE) AS day_value
                FROM events WHERE user_id < 30 GROUP BY 1, 2),
              grid AS (
                SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                         CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
                FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
                      FROM daily GROUP BY user_id))
              SELECT g.user_id, g.day,
                     CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
                     last_value(d.day_value IGNORE NULLS) OVER (
                       PARTITION BY g.user_id ORDER BY g.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
              FROM grid g LEFT JOIN daily d
                ON g.user_id = d.user_id AND g.day = d.day
              ORDER BY g.user_id, g.day""")) { (s, d) =>
      val daily = Tables.events(s, d)
        .filter(col("user_id") < 30)
        .groupBy(col("user_id"), to_date(date_trunc("DAY", col("ts"))).as("day"))
        .agg(count(lit(1)).as("n_events"), Num.round2(sum("value")).as("day_value"))
      val grid = daily
        .groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(
          col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).cast("long").as("n_events"),
          last(col("day_value"), ignoreNulls = true).over(w).as("carried"))
        .orderBy("user_id", "day")
    },

    // Batch sessionization: split each user's event stream into sessions at
    // inactivity gaps > 4h (lag + cumulative-sum of new-session flags — the
    // standard two-window formulation), then aggregate per session. The
    // batch twin of q_stream_session: same semantics, derived from the
    // event log after the fact instead of incrementally. Both windows and
    // the final agg share the user_id hash partitioning — one shuffle,
    // reused twice. 4h gap chosen from the synthetic corpus's gap
    // distribution (median inter-event gap ~7h; 30min would make nearly
    // every event its own session).
    QueryDef(
      "q_win_sessionize",
      Some("""WITH e AS (
                SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value
                FROM events),
              flagged AS (
                SELECT *, CASE WHEN lag(ts_sec) OVER w IS NULL
                                 OR ts_sec - lag(ts_sec) OVER w > 14400
                               THEN 1 ELSE 0 END AS new_sess
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
              sess AS (
                SELECT *, sum(new_sess) OVER (PARTITION BY user_id
                            ORDER BY ts_sec, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                FROM flagged)
              SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                     CAST(count(*) AS BIGINT) AS n_events,
                     CAST(min(ts_sec) AS BIGINT) AS start_sec,
                     CAST(max(ts_sec) - min(ts_sec) AS BIGINT) AS duration_sec,
                     CAST(round(CAST(sum(value) AS DECIMAL(28,6)), 2) AS DOUBLE) AS sess_value
              FROM sess GROUP BY user_id, session_id
              ORDER BY user_id, session_id""")) { (s, d) =>
      val wOrd = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_sec"), col("value"))
        .withColumn("new_sess",
          when(lag("ts_sec", 1).over(wOrd).isNull ||
            col("ts_sec") - lag("ts_sec", 1).over(wOrd) > 14400, 1)
            .otherwise(0))
        .withColumn("session_id", sum("new_sess").over(wCum))
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          min("ts_sec").as("start_sec"),
          (max("ts_sec") - min("ts_sec")).as("duration_sec"),
          Num.round2(sum("value")).as("sess_value"))
        .select(col("user_id"), col("session_id").cast("long").as("session_id"),
          col("n_events"), col("start_sec"), col("duration_sec"),
          col("sess_value"))
        .orderBy("user_id", "session_id")
    },

    // Period-over-period rank movement ("movers"): customers ranked by
    // 1995 vs 1996 revenue within their market segment, joined on the
    // customer to expose the rank delta for everyone top-100 in both
    // years (deep enough to stay populated as the customer base grows).
    // Rank key is the ROUNDED revenue (decimal sandwich) + custkey
    // tiebreak, so two engines summing doubles in different orders still
    // rank identically; windows partition by segment — never global.
    QueryDef(
      "q_win_rankdelta",
      Some("""WITH rev AS (
                SELECT c_mktsegment AS seg, o_custkey AS ck,
                       CAST(year(o_orderdate) AS BIGINT) AS yr,
                       CAST(round(CAST(sum(o_totalprice) AS DECIMAL(28,6)), 2) AS DOUBLE) AS rev
                FROM orders JOIN customer ON o_custkey = c_custkey
                WHERE year(o_orderdate) IN (1995, 1996)
                GROUP BY seg, ck, yr),
              rk AS (SELECT seg, ck, yr, rev,
                            row_number() OVER (PARTITION BY seg, yr
                              ORDER BY rev DESC, ck) AS rn
                     FROM rev)
              SELECT a.seg, a.ck,
                     CAST(a.rn AS BIGINT) AS rank_1995,
                     CAST(b.rn AS BIGINT) AS rank_1996,
                     CAST(a.rn - b.rn AS BIGINT) AS moved_up
              FROM rk a JOIN rk b ON a.seg = b.seg AND a.ck = b.ck
              WHERE a.yr = 1995 AND b.yr = 1996 AND a.rn <= 100 AND b.rn <= 100
              ORDER BY a.seg, moved_up DESC, a.ck""")) { (s, d) =>
      val rev = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .groupBy(col("c_mktsegment").as("seg"), col("o_custkey").as("ck"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .agg(Num.round2(sum("o_totalprice")).as("rev"))
      val w = Window.partitionBy("seg", "yr")
        .orderBy(col("rev").desc, col("ck"))
      // Both years' ranks re-meet on (seg, ck) via ONE conditional
      // aggregation instead of a self-join: (seg, ck, yr) is unique after
      // the revenue agg, so min(when(yr = Y, rn)) picks the year's single
      // rank exactly. The join spelling planned each side as its own full
      // subtree (the pushed yr filter made the branches non-reusable):
      // two orders scans, two revenue aggs, two window exchanges, plus
      // two join exchanges — 7 Exchanges total. This shape is one scan,
      // one revenue agg, one window, one pair-up agg: 4 Exchanges, and
      // the rank windows run over both years at once (guide §2.4 —
      // remove shuffles outright; same rows out, oracle-checked).
      val rk = rev.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 100)
      rk.groupBy("seg", "ck")
        .agg(
          min(when(col("yr") === 1995, col("rn"))).as("rank_1995"),
          min(when(col("yr") === 1996, col("rn"))).as("rank_1996"))
        .filter(col("rank_1995").isNotNull && col("rank_1996").isNotNull)
        .select(col("seg"), col("ck"),
          col("rank_1995").cast("long").as("rank_1995"),
          col("rank_1996").cast("long").as("rank_1996"),
          (col("rank_1995") - col("rank_1996")).cast("long").as("moved_up"))
        .orderBy(col("seg"), col("moved_up").desc, col("ck"))
    }
  )
}
