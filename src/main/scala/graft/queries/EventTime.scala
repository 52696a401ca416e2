package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time analytics on `events` (SURVEY §2.9 T5), batch form — Spark's
  * `window()`/`session_window()` work identically in batch, which is what
  * makes them DuckDB-oracle-checkable. The streaming twins (same expressions
  * behind `readStream` + watermark) live in graft.streaming and are
  * unit-tested instead.
  *
  * Scale: these are plain hash aggregations after the window expression is
  * materialized as a group key — one shuffle each. Session windows
  * additionally sort within user partitions (same profile as any
  * gaps-and-islands pass).
  */
object EventTime extends QueryModule {

  /** Tumbling 5-minute windows per event type. */
  def evtTumbling(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total"))
      .orderBy("w_start", "event_type")
  }

  /** Sliding 10-minute windows every 5 minutes: each event lands in exactly
    * two windows (bucket and bucket−5min), which is what the oracle unrolls.
    */
  def evtSliding(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("w_start"), col("n"), col("total"))
      .orderBy("w_start")
  }

  /** Session windows per user with a 10-minute inactivity gap. */
  def evtSession(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("user_id"), col("w.start").as("s_start"), col("n"), col("total"))
      .orderBy("user_id", "s_start")
  }

  /** Calendar gap-fill: one row per (day, event_type) over the stream's
    * span, zero-filled where no events occurred — the resample/densify
    * primitive of time-series pipelines. The calendar is generated
    * (`sequence` + explode), never materialized driver-side, and the join
    * against actual counts is a broadcast of the generated side.
    */
  def evtGapfill(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val counts = e
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val calendar = e
      .select(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .crossJoin(e.select(col("event_type")).distinct())
    calendar.join(counts, Seq("day", "event_type"), "left_outer")
      .select(col("day"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("day", "event_type")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_tumbling" -> (evtTumbling _),
    "evt_sliding"  -> (evtSliding _),
    "evt_session"  -> (evtSession _),
    "evt_gapfill"  -> (evtGapfill _),
  )

  override def oracles: Map[String, String] = Map(
    "evt_gapfill" ->
      """WITH bounds AS (
        |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
        |), calendar AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds
        |), cal_type AS (
        |  SELECT day, event_type FROM calendar
        |  CROSS JOIN (SELECT DISTINCT event_type FROM events)
        |), counts AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
        |  FROM events GROUP BY day, event_type
        |)
        |SELECT ct.day, ct.event_type, COALESCE(c.n, 0) AS n
        |FROM cal_type ct LEFT JOIN counts c
        |  ON ct.day = c.day AND ct.event_type = c.event_type
        |ORDER BY ct.day, ct.event_type""".stripMargin,
    "evt_tumbling" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, event_type,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        |FROM events GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,
    "evt_sliding" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) - k * INTERVAL '5 minutes' AS w_start,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        |FROM events CROSS JOIN (VALUES (0), (1)) offs(k)
        |GROUP BY w_start ORDER BY w_start""".stripMargin,
    "evt_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL '10 minutes'
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |), sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked
        |)
        |SELECT user_id, MIN(ts) AS s_start, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,
  )
}
