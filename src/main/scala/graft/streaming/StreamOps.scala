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
}
