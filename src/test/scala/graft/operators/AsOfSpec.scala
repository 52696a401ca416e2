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

  test("forward as-of is the time-mirror of backward as-of (randomized)") {
    // mirroring every timestamp t -> 2C - t reverses time order, so
    // nearest-later must become nearest-earlier; dup-time tie-breaks are
    // time-independent (max tieBreak) so they survive the mirror. Small
    // key/time domains force collisions, dup timestamps, and no-match
    // keys.
    val rnd = new scala.util.Random(42)
    val C = 1000L
    def ts(v: Long) = ts0(v)
    def ts0(v: Long) = new java.sql.Timestamp(v * 1000L)
    val leftRows = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(6) + 1).toLong, rnd.nextInt(50).toLong))
    val rightRows = (1 to 100).map(i =>
      (1000L + i, (rnd.nextInt(6) + 1).toLong, rnd.nextInt(50).toLong, rnd.nextInt(100).toDouble))

    val left = leftRows.map { case (id, k, t) => (id, k, ts(t)) }.toDF("event_id", "k", "ts")
    val right = rightRows.map { case (id, k, t, v) => (id, k, ts(t), v) }.toDF("o_id", "k", "t", "v")
    val leftM = leftRows.map { case (id, k, t) => (id, k, ts(2 * C - t)) }.toDF("event_id", "k", "ts")
    val rightM = rightRows.map { case (id, k, t, v) => (id, k, ts(2 * C - t), v) }.toDF("o_id", "k", "t", "v")

    def result(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.select("event_id", "o_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

    val fwd = result(AsOf.joinLeftAsOfForward(left, right,
      "k", "ts", "t", "event_id", "o_id", Seq("o_id", "v")))
    val bwdMirror = result(AsOf.joinLeftAsOf(leftM, rightM,
      "k", "ts", "t", "event_id", "o_id", Seq("o_id", "v")))
    assert(fwd.size == 200 && fwd == bwdMirror)
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
