package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule, Tables}

/** Event-time windowing over the `events` table (SURVEY.md §2B streaming
  * row + §7.2 step 6).
  *
  * The transforms are written against plain DataFrames so the SAME code
  * runs in batch (oracle-checked here) and under Structured Streaming
  * (exercised with MemoryStream + watermark in StreamingSpec) — that is
  * Spark's unified-API contract, and it is how the reference's
  * "one HTTP request = one event in an unbounded arrival stream"
  * (`/root/reference/main.go:41-55`) maps onto an engine.
  *
  * Window starts are emitted as epoch seconds (BIGINT) rather than raw
  * timestamps: Spark writes parquet timestamps tz-adjusted while DuckDB
  * produces naive ones, and epoch integers sidestep the schema mismatch.
  */
object EventOps extends QueryModule {

  /** Tumbling event-time window aggregation — batch and streaming safe. */
  def tumblingAgg(events: DataFrame, duration: String): DataFrame =
    events
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding event-time window aggregation. */
  def slidingAgg(events: DataFrame, duration: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), duration, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Session windows (5-minute gap) per user — streaming-safe form. */
  def sessionAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        unix_timestamp(col("w.end")).as("session_end"),
        col("n_events"), col("total_value"))

  def queries: Seq[Q] = Seq(
    // SCD2 validity intervals (the lakehouse dimension-building step):
    // each event's state is valid from its timestamp until the user's
    // next event; the last event per user is the current row. One window
    // keyed by user_id (high-cardinality), lead() for the closing edge.
    Q(
      "q_scd2_intervals",
      """SELECT user_id, event_id, event_type,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
        |       CAST(floor(epoch(lead(ts) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
        |         AS valid_to,
        |       lead(ts) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         AS is_current
        |FROM events
        |ORDER BY user_id, event_id"""
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("valid_from"),
        unix_timestamp(lead(col("ts"), 1).over(w)).as("valid_to"),
        lead(col("ts"), 1).over(w).isNull.as("is_current"))
        .orderBy("user_id", "event_id")
    },

    // SQL gap-sessionization: the event-granular sibling of the native
    // session_window aggregation (q_events_session) — lag() marks
    // session breaks (gap > 5 min), a running sum numbers sessions, then
    // one aggregation per (user, session). Integer-exact throughout:
    // gaps compare epoch MICROSECONDS (unix_micros vs DuckDB epoch_us),
    // so no float is involved. Both windows key on user_id.
    Q(
      "q_sessionize_gap",
      """WITH o AS (
        |  SELECT user_id, event_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN prev IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev) > 300000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM o),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM m)
        |SELECT user_id, session_id,
        |       COUNT(*) AS n_events,
        |       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
        |       CAST(floor(epoch(MAX(ts))) AS BIGINT) AS session_end
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id"""
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) > 300000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("brk")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          unix_timestamp(min(col("ts"))).as("session_start"),
          unix_timestamp(max(col("ts"))).as("session_end"))
        .orderBy("user_id", "session_id")
    },

    Q(
      "q_events_tumbling",
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
        |       event_type,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type"""
    ) { (s, d) =>
      tumblingAgg(Tables.events(s, d), "1 hour")
        .orderBy("window_start", "event_type")
    },

    // Sliding 1h/30m: every event lands in exactly two windows; the oracle
    // reproduces Spark's epoch-aligned window-start enumeration.
    Q(
      "q_events_sliding",
      """WITH e AS (
        |  SELECT event_type, value,
        |         CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS grid
        |  FROM events),
        |x AS (
        |  SELECT event_type, value, grid - off AS window_start
        |  FROM e CROSS JOIN (SELECT unnest([0, 1800]) AS off))
        |SELECT window_start, event_type,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
        |FROM x GROUP BY 1, 2
        |ORDER BY window_start, event_type"""
    ) { (s, d) =>
      slidingAgg(Tables.events(s, d), "1 hour", "30 minutes")
        .orderBy("window_start", "event_type")
    },

    // Session windows: oracle emulates via lag + gap-flag + running sum —
    // the classic sessionization rewrite. Spark's session end = last event
    // + gap, session start = first event.
    Q(
      "q_events_session",
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   >= INTERVAL 5 MINUTE OR
        |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                                ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM o)
        |SELECT user_id,
        |       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
        |       CAST(floor(epoch(MAX(ts) + INTERVAL 5 MINUTE)) AS BIGINT) AS session_end,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_start"""
    ) { (s, d) =>
      sessionAgg(Tables.events(s, d), "5 minutes")
        .orderBy("user_id", "session_start")
    },

    // Batch equivalent of streaming dropDuplicates state: keep the
    // earliest event per (user_id, event_type).
    Q(
      "q_events_dedup_state",
      """SELECT user_id, event_type, event_id AS first_event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type"""
    ) { (s, d) =>
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"))
        .orderBy("user_id", "event_type")
    },

    // Funnel analysis: first view → first purchase at-or-after it, per
    // user, with conversion flag and delay. Two per-user MIN aggregates
    // and a left join — every shuffle keyed by user_id (scale-growing);
    // no window, no per-user subquery re-execution.
    Q(
      "q_events_funnel",
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS first_view
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, MIN(ts) AS first_purchase
        |  FROM events e JOIN v USING (user_id)
        |  WHERE event_type = 'purchase' AND ts >= first_view
        |  GROUP BY e.user_id)
        |SELECT v.user_id,
        |       CAST(floor(epoch(first_view)) AS BIGINT) AS first_view_sec,
        |       CAST(floor(epoch(first_purchase)) AS BIGINT) AS first_purchase_sec,
        |       first_purchase IS NOT NULL AS converted,
        |       CAST(floor(epoch(first_purchase)) AS BIGINT)
        |         - CAST(floor(epoch(first_view)) AS BIGINT) AS delay_sec
        |FROM v LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id"""
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("first_view"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id")
        .filter(col("ts") >= col("first_view"))
        .groupBy("user_id").agg(min(col("ts")).as("first_purchase"))
      v.join(p, Seq("user_id"), "left")
        .select(
          col("user_id"),
          unix_timestamp(col("first_view")).as("first_view_sec"),
          unix_timestamp(col("first_purchase")).as("first_purchase_sec"),
          col("first_purchase").isNotNull.as("converted"),
          (unix_timestamp(col("first_purchase")) - unix_timestamp(col("first_view")))
            .as("delay_sec"))
        .orderBy("user_id")
    },

    // Cohort retention: users grouped by first-seen day, counted on each
    // later active day — the (cohort, day-offset) triangle every growth
    // dashboard draws. Distinct-day projection first (one shuffle), then
    // self-join on user_id; all keys scale with users/days.
    Q(
      "q_events_retention",
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events),
        |firstday AS (
        |  SELECT user_id, MIN(active_day) AS cohort_day FROM days GROUP BY user_id)
        |SELECT cohort_day,
        |       CAST(date_diff('day', cohort_day, active_day) AS INT) AS day_offset,
        |       COUNT(*) AS n_users
        |FROM firstday JOIN days USING (user_id)
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset"""
    ) { (s, d) =>
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("active_day"))
        .distinct()
      val first = days.groupBy("user_id").agg(min(col("active_day")).as("cohort_day"))
      first.join(days, "user_id")
        .select(
          col("cohort_day"),
          datediff(col("active_day"), col("cohort_day")).cast("int").as("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // Z-score anomaly detection: per-type mean/stddev from exact decimal
    // sums (the Welford built-ins are partition-order-dependent — see
    // Exact), the tiny stats table broadcast back over the stream of
    // events, top-|z| outliers via TakeOrderedAndProject (never a full
    // sort). The shape a metrics pipeline runs at 100 TB: one aggregation
    // pass, one broadcast, one bounded top-k.
    Q(
      "q_events_anomaly",
      """WITH s AS (
        |  SELECT event_type,
        |         CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS sx2,
        |         COUNT(*) AS n
        |  FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type, value,
        |       floor((value - sx / n) / sqrt((sx2 - sx * sx / n) / (n - 1)) * 1e6 + 0.5) / 1e6 AS z
        |FROM events e JOIN s ON e.event_type = s.event_type
        |ORDER BY abs(floor((value - sx / n) / sqrt((sx2 - sx * sx / n) / (n - 1)) * 1e6 + 0.5) / 1e6) DESC,
        |         event_id
        |LIMIT 50"""
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val stats = ev.groupBy("event_type")
        .agg(
          Exact.dsum(col("value")).as("sx"),
          Exact.dsum(col("value") * col("value")).as("sx2"),
          count(lit(1)).as("n"))
      val z = Exact.round6(
        (col("value") - col("sx") / col("n"))
          / sqrt(Exact.dvarSamp(col("sx"), col("sx2"), col("n"))))
      ev.join(broadcast(stats), "event_type")
        .select(col("event_id"), col("event_type"), col("value"), z.as("z"))
        .orderBy(abs(col("z")).desc, col("event_id"))
        .limit(50)
    },

    Q(
      "q_events_daily",
      """SELECT CAST(ts AS DATE) AS day, event_type,
        |       COUNT(*) AS n_events,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY day, event_type"""
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          Exact.dsum(col("value")).as("total_value"))
        .orderBy("day", "event_type")
    }
  )
}
