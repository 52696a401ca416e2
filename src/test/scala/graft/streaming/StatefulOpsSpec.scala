package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files

class StatefulOpsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  test("running-mean anomaly detection fires only after warm-up, per user") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-state").toString
    val lines =
      // user 1: 6 calm events then a 100x spike; user 2: always calm
      (0 until 6).map(i => s"""{"user_id":1,"ts":"2024-01-01T00:0$i:00Z","value":2.0}""") ++
      Seq("""{"user_id":1,"ts":"2024-01-01T00:07:00Z","value":200.0}""") ++
      (0 until 8).map(i => s"""{"user_id":2,"ts":"2024-01-01T00:0$i:30Z","value":5.0}""")
    Files.writeString(java.nio.file.Paths.get(dir, "e.json"), lines.mkString("\n"))

    val stream = spark.readStream.schema(schema).json(dir)
      .as[StatefulOps.Event]
    val q = StatefulOps.anomalyAlerts(stream, k = 3.0, minN = 5)
      .writeStream.format("memory").queryName("alerts_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val alerts = spark.table("alerts_out").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(alerts.toSeq === Seq((1L, 200.0, 2.0)))
  }

  test("state carries across batches (second drain resumes the mean)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-state2").toString
    val ckpt = Files.createTempDirectory("graft-state2-ck").toString
    val out = Files.createTempDirectory("graft-state2-out").toString
    def drain(): Unit = {
      // memory sink can't recover from checkpoints; a file sink can
      val stream = spark.readStream.schema(schema).json(dir).as[StatefulOps.Event]
      val q = StatefulOps.anomalyAlerts(stream, k = 3.0, minN = 5)
        .writeStream.format("json").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def nAlerts: Long = spark.read.schema(
        "user_id LONG, ts TIMESTAMP, value DOUBLE, mean_before DOUBLE")
      .json(out).count()
    // batch 1: warm-up only
    Files.writeString(java.nio.file.Paths.get(dir, "b1.json"),
      (0 until 6).map(i => s"""{"user_id":9,"ts":"2024-01-01T00:0$i:00Z","value":1.0}""").mkString("\n"))
    drain()
    assert(nAlerts === 0)
    // batch 2: spike — only anomalous if warm-up state survived the restart
    Files.writeString(java.nio.file.Paths.get(dir, "b2.json"),
      """{"user_id":9,"ts":"2024-01-01T00:10:00Z","value":50.0}""")
    drain()
    assert(nAlerts === 1)
  }

  test("streaming sessionize closes sessions in-batch on gap and by event-time timeout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sess").toString
    val ckpt = Files.createTempDirectory("graft-sess-ck").toString
    val out = Files.createTempDirectory("graft-sess-out").toString
    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).json(dir)
        .withWatermark("ts", "1 minute")
        .as[StatefulOps.Event]
      val q = StatefulOps.sessionize(stream, gapMinutes = 10)
        .writeStream.format("json").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def sessions: Seq[(Long, Long, Long)] = spark.read.schema(
        "user_id LONG, session_seq LONG, start_ts TIMESTAMP, end_ts TIMESTAMP, n_events LONG")
      .json(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq.sorted

    // batch 1: user 9 has two bursts separated by >10 min — the first
    // burst must close IN-BATCH when the second arrives; the second
    // stays open (no watermark past its end yet).
    Files.writeString(java.nio.file.Paths.get(dir, "s1.json"), Seq(
      """{"user_id":9,"ts":"2024-01-01T00:00:00Z","value":1.0}""",
      """{"user_id":9,"ts":"2024-01-01T00:01:00Z","value":1.0}""",
      """{"user_id":9,"ts":"2024-01-01T01:00:00Z","value":1.0}""",
      """{"user_id":9,"ts":"2024-01-01T01:02:00Z","value":1.0}""",
    ).mkString("\n"))
    drain()
    assert(sessions === Seq((9L, 1L, 2L)))

    // batch 2: an unrelated far-future event advances the watermark past
    // user 9's open session + gap — the EVENT-TIME timeout must close it
    // with the next session_seq.
    Files.writeString(java.nio.file.Paths.get(dir, "s2.json"),
      """{"user_id":8,"ts":"2024-01-01T05:00:00Z","value":1.0}""")
    drain()
    assert(sessions === Seq((9L, 1L, 2L), (9L, 2L, 2L)))
  }

  test("streaming near-dup flags a doc arriving AFTER its twin, across batches") {
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val dir = Files.createTempDirectory("graft-neardup").toString
    val ckpt = Files.createTempDirectory("graft-neardup-ck").toString
    val out = Files.createTempDirectory("graft-neardup-out").toString
    val textA = "spark shuffles partition keys across every executor in the cluster always"
    val textB = "completely unrelated words about zebras quarks velvet osmium gardens rainfall"

    def drain(): Unit = {
      val stream = spark.readStream.schema(docSchema).json(dir)
      val q = StatefulOps.streamingNearDup(stream)
        .writeStream.format("json").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def decisions = spark.read
      .schema("doc_id LONG, band INT, canonical_id LONG, is_dup BOOLEAN")
      .json(out).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))

    // batch 1: two distinct docs — no dups, each canonical of its buckets
    Files.writeString(java.nio.file.Paths.get(dir, "b1.json"),
      s"""{"doc_id":1,"text":"$textA"}\n{"doc_id":2,"text":"$textB"}""")
    drain()
    assert(decisions.forall(!_._3))

    // batch 2: doc 3 = doc 1's text — every band must hit doc 1's buckets,
    // which only happens if the registry survived the restart
    Files.writeString(java.nio.file.Paths.get(dir, "b2.json"),
      s"""{"doc_id":3,"text":"$textA"}""")
    drain()
    val d3 = decisions.filter(_._1 == 3L)
    assert(d3.length === 4)
    assert(d3.forall { case (_, canon, dup) => dup && canon == 1L })
  }
}
