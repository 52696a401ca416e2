package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks nearest-earlier, inclusive, with tie-break on dup times") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:04")), // before any right row -> null
      (2L, 10L, ts("2024-01-01 00:00:05")), // exactly at right t=5 -> inclusive match
      (3L, 10L, ts("2024-01-01 00:00:09")), // between 5 and 10 -> t=5
      (4L, 10L, ts("2024-01-01 00:00:30")), // after all -> latest (t=10, max tieBreak)
      (5L, 99L, ts("2024-01-01 00:00:30")), // key with no right rows -> null
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:05"), 1.0),
      (200L, 10L, ts("2024-01-01 00:00:10"), 2.0),
      (201L, 10L, ts("2024-01-01 00:00:10"), 3.0), // dup time: keep max o_id=201
    ).toDF("o_id", "k", "t", "v")

    val out = AsOf.joinLeftAsOf(left, right,
        key = "k", leftTime = "ts", rightTime = "t",
        leftId = "event_id", tieBreak = "o_id", payload = Seq("o_id", "v"))
      .orderBy("event_id")
      .select("event_id", "o_id", "v")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))

    assert(out.toSeq === Seq(
      (1L, None, None),
      (2L, Some(100L), Some(1.0)),
      (3L, Some(100L), Some(1.0)),
      (4L, Some(201L), Some(3.0)),
      (5L, None, None)))
  }

  test("forward as-of picks nearest-later, inclusive, with tie-break on dup times") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:04")), // before t=5 -> t=5
      (2L, 10L, ts("2024-01-01 00:00:05")), // exactly at right t=5 -> inclusive match
      (3L, 10L, ts("2024-01-01 00:00:09")), // between 5 and 10 -> t=10 (max tieBreak 201)
      (4L, 10L, ts("2024-01-01 00:00:30")), // after all -> null
      (5L, 99L, ts("2024-01-01 00:00:30")), // key with no right rows -> null
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:05"), 1.0),
      (200L, 10L, ts("2024-01-01 00:00:10"), 2.0),
      (201L, 10L, ts("2024-01-01 00:00:10"), 3.0), // dup time: keep max o_id=201
    ).toDF("o_id", "k", "t", "v")

    val out = AsOf.joinLeftAsOfForward(left, right,
        key = "k", leftTime = "ts", rightTime = "t",
        leftId = "event_id", tieBreak = "o_id", payload = Seq("o_id", "v"))
      .orderBy("event_id")
      .select("event_id", "o_id", "v")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))

    assert(out.toSeq === Seq(
      (1L, Some(100L), Some(1.0)),
      (2L, Some(100L), Some(1.0)),
      (3L, Some(201L), Some(3.0)),
      (4L, None, None),
      (5L, None, None)))
  }

  test("plan shuffles once on the key (no row explosion)") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:04"))).toDF("event_id", "k", "ts")
    val right = Seq((100L, 10L, ts("2024-01-01 00:00:05"), 1.0)).toDF("o_id", "k", "t", "v")
    val plan = AsOf.joinLeftAsOf(left, right, "k", "ts", "t", "event_id", "o_id", Seq("o_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
