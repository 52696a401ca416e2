package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeAsOf

/** Contract tests for the custom physical as-of operator
  * (org.apache.spark.sql.graft.AsOfJoinExec): edge-case semantics, plan
  * shape, and row-for-row A/B equality against the builtin-only
  * union+window formulation on real data.
  */
class NativeAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    (1L, 10L, ts("2024-01-01 00:00:04")), // before any right row -> null
    (2L, 10L, ts("2024-01-01 00:00:05")), // exactly at right t=5 -> inclusive
    (3L, 10L, ts("2024-01-01 00:00:09")), // between 5 and 10 -> t=5
    (4L, 10L, ts("2024-01-01 00:00:30")), // after all -> t=10, max tieBreak
    (5L, 99L, ts("2024-01-01 00:00:30")), // key with no right rows -> null
  ).toDF("event_id", "k", "ts")

  private val right = Seq(
    (100L, 10L, ts("2024-01-01 00:00:05"), 1.0),
    (200L, 10L, ts("2024-01-01 00:00:10"), 2.0),
    (201L, 10L, ts("2024-01-01 00:00:10"), 3.0), // dup time: keep max o_id=201
  ).toDF("o_id", "rk", "t", "v")

  private def run(l: org.apache.spark.sql.DataFrame) = NativeAsOf
    .joinLeftAsOf(l, right, "k", "ts", "rk", "t", tieBreak = "o_id")
    .orderBy("event_id")
    .select("event_id", "o_id", "v")
    .collect()
    .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))

  test("native as-of: nearest-earlier inclusive, tie-break, null on no match") {
    assert(run(left).toSeq === Seq(
      (1L, None, None),
      (2L, Some(100L), Some(1.0)),
      (3L, Some(100L), Some(1.0)),
      (4L, Some(201L), Some(3.0)),
      (5L, None, None)))
  }

  test("native as-of: empty right side yields all-null payload") {
    val out = NativeAsOf
      .joinLeftAsOf(left, right.filter(col("o_id") < 0L), "k", "ts", "rk", "t", "o_id")
      .select("event_id", "o_id")
      .collect()
    assert(out.length === 5 && out.forall(_.isNullAt(1)))
  }

  test("native as-of plan: AsOfJoinExec with clustered exchanges, no row explosion") {
    val df = NativeAsOf.joinLeftAsOf(left, right, "k", "ts", "rk", "t", "o_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("native as-of == union+window form on sf0.001 events x orders") {
    val e = spark.read.parquet(s"$sf0001/orders.parquet") // any (key,time) pair works
    val events = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id").as("k"), col("ts"))
    val orders = e.select(col("o_custkey").as("rk"), col("o_orderdate"),
      col("o_orderkey"), col("o_totalprice"))
    val native = NativeAsOf
      .joinLeftAsOf(events, orders, "k", "ts", "rk", "o_orderdate", "o_orderkey")
      .select(col("event_id"), col("o_orderkey"), col("o_totalprice"))
    val window = AsOf.joinLeftAsOf(
        left = graft.Tables.events(spark, sf0001).withColumnRenamed("user_id", "k"),
        right = e.withColumnRenamed("o_custkey", "k"),
        key = "k", leftTime = "ts", rightTime = "o_orderdate",
        leftId = "event_id", tieBreak = "o_orderkey",
        payload = Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("o_orderkey"), col("o_totalprice"))
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }
}
