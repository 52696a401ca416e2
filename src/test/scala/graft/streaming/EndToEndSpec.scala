package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.etl.{Enrich, Ndjson}
import graft.sources.LandingSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The reference's ENTIRE data path, end to end, through graft's own
  * connector on both ends: producers put objects with metadata via the
  * DSv2 landing WRITE (ingest Lambda, S4), the pipeline drains them via
  * the landing MICRO-BATCH READ (ObjectCreated trigger, T1), enriches
  * (glue/job.py:27-34, P1-P2), and lands NDJSON under
  * `transformed/{key}` in the per-object-routed output root (T2) — with
  * the exactly-once guarantees the reference lacks, across restarts and
  * new arrivals.
  */
class EndToEndSpec extends SparkSpec {

  private def tmp(pfx: String): String =
    Files.createTempDirectory(pfx).toString

  test("landing write → streaming read → enrich → routed NDJSON, exactly once") {
    import spark.implicits._
    val landing = tmp("e2e-landing")
    val outA = tmp("e2e-outA"); val outB = tmp("e2e-outB")
    val ckpt = tmp("e2e-ckpt")

    // 1. producer side: distributed put-with-metadata through the DSv2
    //    commit protocol (the metadata carries the routing hint)
    Seq(
      ("in/a.ndjson", "{\"name\":\"alice\",\"id\":1}\n{\"name\":null,\"id\":2}",
        Map("pipeline-output-bucket" -> "A")),
      ("in/b.ndjson", "{\"name\":\"bob\",\"id\":3}",
        Map("pipeline-output-bucket" -> "B")))
      .toDF("key", "content", "metadata")
      .withColumn("byte_len", length(col("content")))
      .select("key", "byte_len", "content", "metadata")
      .write.format("graft-landing").mode("append").save(landing)

    // 2. consumer side: drain the zone with the landing stream; route by
    //    the object's OWN metadata hint (handler.ts:46-48), enrich, write
    //    NDJSON under transformed/{key}
    def drain(): Unit = {
      val q = spark.readStream.format("graft-landing").load(landing)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val objs = batch
            .select(col("key"), col("content"),
              col("metadata").getItem("pipeline-output-bucket").as("hint"))
            .collect() // one row per OBJECT in this micro-batch, not per record
          objs.foreach { r =>
            val root = if (r.getString(2) == "B") outB else outA
            val recs = Ndjson.parse(spark,
              spark.createDataset(r.getString(1).split("\n").toSeq))
            Enrich.enrich(recs.drop(Ndjson.CorruptCol))
              .write.mode("overwrite")
              .json(s"$root/${Ndjson.transformedKey(r.getString(0))}")
          }
        }
        .start()
      q.awaitTermination()
    }
    drain()

    val a = spark.read.json(s"$outA/transformed/in/a.ndjson")
    assert(a.count() == 2)
    assert(a.columns.toSet == Set("name", "id", "processed", "uppercase_name"))
    assert(a.filter(col("id") === 1).head().getAs[String]("uppercase_name") == "ALICE")
    assert(a.filter(col("id") === 2).head().getAs[String]("uppercase_name") == "")
    val b = spark.read.json(s"$outB/transformed/in/b.ndjson")
    assert(b.head().getAs[String]("uppercase_name") == "BOB")

    // 3. exactly-once across restart: nothing re-emits on an empty drain
    val mtime = Files.getLastModifiedTime(
      Paths.get(outA, "transformed", "in", "a.ndjson")).toMillis
    Thread.sleep(1100)
    drain()
    assert(Files.getLastModifiedTime(
      Paths.get(outA, "transformed", "in", "a.ndjson")).toMillis == mtime,
      "empty drain must not rewrite an already-processed object")

    // 4. a NEW arrival (written through the same DSv2 write path) is the
    //    only thing the next drain processes
    Seq(("in/c.ndjson", "{\"name\":\"carol\",\"id\":4}",
      Map.empty[String, String]))
      .toDF("key", "content", "metadata")
      .withColumn("byte_len", length(col("content")))
      .select("key", "byte_len", "content", "metadata")
      .write.format("graft-landing").mode("append").save(landing)
    drain()
    assert(spark.read.json(s"$outA/transformed/in/c.ndjson")
      .head().getAs[String]("uppercase_name") == "CAROL")
    assert(Files.getLastModifiedTime(
      Paths.get(outA, "transformed", "in", "a.ndjson")).toMillis == mtime,
      "the new-arrival drain must not reprocess older objects")
    // payload-read accounting stays observable through the whole path
    assert(LandingSource.payloadReads.get() > 0)
  }
}
