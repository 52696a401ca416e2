package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins `EventTime.peakConcurrency` against independently-reasoned
  * expectations — the DuckDB oracle mirrors the implementation, so the
  * midnight-carry semantics need a constructed corpus to prove.
  */
class ConcurrencySpec extends SparkSpec {

  private def events(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_type", "s", "event_id")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"), col("event_id"))
  }

  private def peaks(rows: Seq[(String, String, Long)]): Map[String, Long] =
    EventTime.peakConcurrency(events(rows), sessionMinutes = 30)
      .collect()
      .map(r => r.getDate(1).toString -> r.getLong(2))
      .toMap

  test("a day whose first boundary is an end inherits the midnight level") {
    // 3 sessions open 23:45–00:15; day 2 has NO start before they close.
    // Its true peak is the 3 it inherited at midnight, not 2-after-the-
    // first-decrement (the pre-fix blind spot).
    val p = peaks(Seq(
      ("a", "2024-01-01 23:45:00", 1L),
      ("a", "2024-01-01 23:46:00", 2L),
      ("a", "2024-01-01 23:47:00", 3L)))
    assert(p("2024-01-01") === 3)
    assert(p("2024-01-02") === 3)
  }

  test("a boundary-free gap day resets the carry to zero") {
    // Day 1 activity fully closes same-day; day 3 session is alone. If the
    // carry were a raw lag (not a cumulative sum over ALL prior days), a
    // missing day 2 could mis-carry day 1's intraday peak.
    val p = peaks(Seq(
      ("a", "2024-01-01 10:00:00", 1L),
      ("a", "2024-01-01 10:10:00", 2L),
      ("a", "2024-01-03 09:00:00", 3L)))
    assert(p("2024-01-01") === 2)
    assert(p("2024-01-03") === 1)
  }

  test("back-to-back sessions at the same instant never double-count") {
    // One session ends exactly when the next starts (half-open [start,
    // end)): level stays 1 at the touch point.
    val p = peaks(Seq(
      ("a", "2024-01-01 10:00:00", 1L),
      ("a", "2024-01-01 10:30:00", 2L)))
    assert(p("2024-01-01") === 1)
  }
}
