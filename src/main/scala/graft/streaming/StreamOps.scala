package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event-time operators (SURVEY §2.9 T5-T6) — the streaming twins
  * of graft.queries.EventTime's batch forms. Same expressions; the only
  * additions are the watermark (bounds state: late rows beyond it are
  * dropped and window state older than it is evicted — without one, a
  * 100 TB stream's window state grows forever) and output-mode discipline.
  * Unit-tested with file sources + memory sink; not oracle-checkable (the
  * DuckDB oracle has no notion of triggers/watermarks).
  */
object StreamOps {

  /** Tumbling window counts with a watermark. Append output emits a window
    * only once the watermark passes its end — exactly-once per window.
    */
  def tumblingCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      window_ : String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total"))

  /** Sessionized counts per user (session_window + watermark). */
  def sessionCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      gap: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s_start"), col("n"))

  /** Stream-stream interval join: attribute each click to the view the
    * same user made within the preceding `horizon`. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark can size the join state: a buffered view is dropped once the
    * click-side watermark passes its interval end — state is
    * O(views within horizon), not O(stream). Without the time bound the
    * state would be unbounded and Spark rejects the query outright.
    */
  def attributeClicksToViews(
      views: DataFrame,
      clicks: DataFrame,
      horizon: String = "10 minutes"): DataFrame =
    viewClickJoin(views, clicks, horizon, "inner")

  /** The one definition of the view↔click interval join, shared by the
    * inner and left-outer forms — the projections, watermarks, and time
    * bound must never diverge between them.
    */
  private def viewClickJoin(
      views: DataFrame, clicks: DataFrame,
      horizon: String, joinType: String): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", horizon)
    val c = clicks
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", horizon)
    v.join(c,
      expr(s"""user_id = c_user_id
              |AND click_ts > view_ts
              |AND click_ts <= view_ts + INTERVAL $horizon""".stripMargin),
      joinType)
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** LEFT-OUTER form of [[attributeClicksToViews]]: every view emits
    * exactly once — joined rows as soon as the click arrives, unmatched
    * views with NULL click columns only after the GLOBAL watermark (the
    * MIN across BOTH inputs, `multipleWatermarkPolicy=min`) passes the
    * view's interval end. A click-heavy/view-idle topology therefore
    * stalls null emission even though no matching click can arrive: the
    * engine's proof obligation runs through the lagging view-side
    * watermark too — the spec pins exactly this. Same bounded state as
    * the inner form; the null-emission delay is the correctness price of
    * outer semantics on unbounded inputs — the batch twin
    * (`evt_attribution`'s left join) has no such delay because its input
    * is complete by definition.
    */
  def attributeViewsLeftOuter(
      views: DataFrame,
      clicks: DataFrame,
      horizon: String = "10 minutes"): DataFrame =
    viewClickJoin(views, clicks, horizon, "left_outer")

  /** Streaming OHLC bars — the windowed twin of EventTime.evtOhlc: open and
    * close via min_by/max_by on the packed (ts, event_id) event-time order
    * (declarative aggregates, so they fold into streaming window state —
    * a row_number() formulation would be illegal on a stream), high/low/
    * volume plain aggregates. Watermark bounds bar state exactly like any
    * windowed agg.
    */
  def ohlcBars(
      events: DataFrame,
      watermark: String = "10 minutes",
      window_ : String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(
        expr("min_by(value, struct(ts, event_id))").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        expr("max_by(value, struct(ts, event_id))").as("close"),
        count(lit(1)).as("n"),
        round(sum("value"), 2).as("volume"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"), col("volume"))

  /** Stateful stream dedup bounded by the watermark — the streaming form of
    * exact dedup: state for a key is dropped once the watermark passes, so
    * memory is bounded by the watermark horizon, not stream length.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  // ------------------------------------------------- streaming leaderboard

  /** Per-(window, key) value totals in APPEND mode — each window's rows are
    * emitted exactly once, when the watermark closes it. Front half of
    * [[windowedTopK]]; state is the aggregation's (windows × keys within
    * the watermark horizon).
    */
  def windowedTotals(
      events: DataFrame,
      watermark: String = "10 minutes",
      window_ : String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(round(sum("value"), 2).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("total"))

  /** Rank one micro-batch of CLOSED window rows to top-k per window —
    * plain batch window function, deterministic tie-break.
    */
  def rankTopK(closedRows: DataFrame, k: Int): DataFrame = {
    val byWin = org.apache.spark.sql.expressions.Window
      .partitionBy("w_start").orderBy(col("total").desc, col("event_type"))
    closedRows
      .withColumn("rk", row_number().over(byWin))
      .filter(col("rk") <= k)
      .select("w_start", "rk", "event_type", "total")
  }

  /** Streaming top-k per window (the leaderboard): ranking is not a legal
    * streaming window function, and a stateful top-k AFTER an aggregation
    * is a chained-stateful shape Spark restricts — the production pattern
    * is append-mode windowed aggregation (a window's rows materialize
    * exactly once, on watermark close) + a BATCH rank inside foreachBatch
    * over those finalized rows. Exactly-once per window rides the
    * checkpoint like every append sink; re-drains are no-ops.
    */
  def windowedTopK(
      events: DataFrame,
      checkpointDir: String,
      k: Int = 3,
      watermark: String = "10 minutes",
      window_ : String = "5 minutes")(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    windowedTotals(events, watermark, window_)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) => sink(rankTopK(df, k)) }
      .start()
}
