package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crafted-corpus pins for the trend/seasonality queries whose DuckDB
  * oracles MIRROR the implementation (shared blind spots possible): the
  * expectations here are closed-form, not re-derived from the code.
  */
class TrendSpec extends SparkSpec {

  private def eventsOf(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex
      .map { case ((t, s, v), i) => (t, s, v, i.toLong) }
      .toDF("event_type", "s", "value", "event_id")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"),
        col("value"), col("event_id"))
  }

  test("rolling slope of an exactly linear daily series is the line's slope") {
    // one event per day, value = 100 + 10*dayIndex → slope_7d = 10 exactly
    // once the frame holds 2+ points; the first day has no slope (NULL).
    val ev = eventsOf((0 until 10).map { i =>
      ("a", f"2024-03-${i + 1}%02d 12:00:00", 100.0 + 10.0 * i)
    })
    val rows = Windows.rollingSlopeOf(ev).collect()
    assert(rows.length === 10)
    assert(rows.head.isNullAt(rows.head.fieldIndex("slope_7d")))
    rows.tail.foreach { r =>
      assert(r.getDouble(r.fieldIndex("slope_7d")) === 10.0)
    }
  }

  test("rolling slope of a constant series is exactly zero") {
    val ev = eventsOf((0 until 8).map { i =>
      ("a", f"2024-03-${i + 1}%02d 12:00:00", 55.5)
    })
    Windows.rollingSlopeOf(ev).collect().tail.foreach { r =>
      assert(r.getDouble(r.fieldIndex("slope_7d")) === 0.0)
    }
  }

  test("seasonal screen flags a planted same-weekday spike and nothing else") {
    // Mondays 2024-03-04/11/18/25, one event each except the 18th with 4 →
    // dow_total = 7 over 4 Mondays; ratios 4/7·4 (spike) and 4/7 (others).
    val mondays = Seq("2024-03-04", "2024-03-11", "2024-03-18", "2024-03-25")
    val ev = eventsOf(
      mondays.flatMap { d =>
        val n = if (d == "2024-03-18") 4 else 1
        (0 until n).map(k => ("a", s"$d 0$k:00:00", 1.0))
      })
    val rows = EventTime.seasonalAnomalyOf(ev).collect()
      .map(r => r.getDate(1).toString ->
        (r.getLong(r.fieldIndex("ratio_ppm")), r.getInt(r.fieldIndex("anomaly"))))
      .toMap
    // obs·n_days·1e6 div dow_total: 1·4·1e6 div 7 = 571428; 4·4·1e6 div 7 = 2285714
    assert(rows("2024-03-18") === ((2285714L, 1)))
    mondays.filterNot(_ == "2024-03-18").foreach { d =>
      assert(rows(d) === ((571428L, 1)), s"$d should sit below the -30% band")
    }
  }

  test("seasonal screen stays quiet on a perfectly regular weekday profile") {
    val ev = eventsOf(Seq(
      "2024-03-04", "2024-03-11", "2024-03-18", "2024-03-25").map { d =>
      ("a", s"$d 12:00:00", 1.0)
    })
    EventTime.seasonalAnomalyOf(ev).collect().foreach { r =>
      assert(r.getInt(r.fieldIndex("anomaly")) === 0)
      assert(r.getLong(r.fieldIndex("ratio_ppm")) === 1000000L)
    }
  }
}
