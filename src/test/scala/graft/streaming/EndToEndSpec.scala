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

  /** The CURATION day-in-the-life, composed from this round's pieces:
    * objects arrive at the landing zone, an admission-bounded stream
    * drains them (`maxFilesPerTrigger` — the post-outage backlog never
    * becomes one unbounded batch), every micro-batch is quality-gated,
    * fingerprinted into a STANDING index, and its duplicate edges fold
    * into a STANDING component labeling via the managed incremental CC —
    * superseded labelings unpersisted at each fold. The final labeling
    * must EQUAL the batch solve over everything that ever arrived, and a
    * re-drain must change nothing.
    */
  test("curation pipeline: bounded drain → quality gate → standing index → incremental clusters") {
    import spark.implicits._
    import graft.operators.ConnectedComponents
    import org.apache.spark.sql.graft.PlanBridge
    import org.apache.spark.sql.DataFrame

    val landing = tmp("cur-landing")
    val ckpt = tmp("cur-ckpt")
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "colorless green ideas sleep furiously in the deep winter night"
    // Deterministic arrival order: the DSv2 write commits objects from
    // PARALLEL tasks, so raw file mtimes are not ordered by key — and the
    // (mtime, key)-sorted ledger would then split micro-batches at
    // key-dependent places, making the folds/batches asserts flaky.
    // Re-stamp each put's own files with monotonically increasing mtimes
    // in key order (never touching earlier waves' stamps — the
    // exactly-once watermark tracks them).
    var stamp = System.currentTimeMillis() - 3600000L
    def put(objs: (Long, String)*): Unit = {
      objs.toSeq.map { case (id, text) => (f"docs/d$id%03d.ndjson", text) }
        .toDF("key", "content")
        .withColumn("byte_len", length(col("content")))
        .withColumn("metadata", map().cast("map<string,string>"))
        .select("key", "byte_len", "content", "metadata")
        .write.format("graft-landing").mode("append").save(landing)
      objs.toSeq.map(_._1).sorted.foreach { id =>
        stamp += 1000
        java.nio.file.Files.setLastModifiedTime(
          java.nio.file.Paths.get(landing, "docs", f"d$id%03d.ndjson"),
          java.nio.file.attribute.FileTime.fromMillis(stamp))
      }
    }

    // wave 1: a dup pair (1,2), a unique doc (3), a quality reject (4)
    put(1L -> t1, 2L -> t1, 3L -> ("something else entirely " * 3), 4L -> "too short")

    // standing state the folds maintain
    var index: DataFrame = null            // (doc_id, fp) — cut per fold
    var indexRdd: org.apache.spark.rdd.RDD[_] = null
    var labeling: DataFrame = null
    var handle: ConnectedComponents.LabelingHandle = null
    var folds = 0
    var batches = 0

    def drain(): Unit = {
      val q = spark.readStream.format("graft-landing")
        .option("maxFilesPerTrigger", "3").load(landing)
        .select("key", "content")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) batches += 1
          val docs = batch
            .select(
              regexp_extract(col("key"), "d(\\d+)", 1).cast("long").as("doc_id"),
              col("content"))
            .filter(length(col("content")) >= 20) // the quality gate
            .select(col("doc_id"), md5(col("content")).as("fp"))
          if (!docs.isEmpty) {
            // fold the batch into the standing fingerprint index (cut so
            // the plan never deepens fold over fold)
            val unioned = if (index == null) docs else index.union(docs)
            val (newIndex, newIndexRdd, _) = PlanBridge.cutLineage(unioned)
            // duplicate edges incident to THIS batch: new-new and new-old
            // pairs sharing a fingerprint (old-old pairs folded earlier)
            val edges = newIndex.select(col("doc_id").as("a"), col("fp"))
              .join(docs.select(col("doc_id").as("b"), col("fp")), "fp")
              .filter(col("a") =!= col("b"))
              .select("a", "b")
            val (next, nextHandle) =
              if (labeling == null) ConnectedComponents.componentsManaged(edges)
              else ConnectedComponents.incrementalComponentsManaged(labeling, edges)
            if (handle != null) handle.release()
            if (indexRdd != null) indexRdd.unpersist(false)
            index = newIndex; indexRdd = newIndexRdd
            labeling = next; handle = nextHandle
            folds += 1
          }
          ()
        }
        .start()
      q.awaitTermination()
    }

    drain()
    // wave 2: a bridge into {1,2} (5 shares t1), a fresh dup pair (6,7),
    // another quality reject (8)
    put(5L -> t1, 6L -> t2, 7L -> t2, 8L -> "tiny")
    drain()

    def labels: Map[Long, Long] = labeling.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the standing labeling equals the batch truth over ALL arrivals:
    // {1,2,5} share t1, {6,7} share t2; 3 has no duplicate edge; the
    // quality rejects never entered the index at all
    assert(labels === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 6L, 7L -> 6L))
    assert(index.filter(col("doc_id").isin(4L, 8L)).isEmpty,
      "quality-rejected docs must never enter the standing index")
    // admission control bounded the drains: 4 objects per wave at
    // maxFilesPerTrigger=3 → two micro-batches per drain; the
    // quality-reject-only batches (d4 alone, d8 alone) correctly fold
    // NOTHING — gating happens before any state is touched
    assert(batches == 4,
      s"8 objects at maxFilesPerTrigger=3 must drain in 4 micro-batches, got $batches")
    assert(folds == 2,
      s"only the two batches with surviving docs may fold, got $folds")

    // exactly-once: a re-drain folds nothing and the labeling is unchanged
    val before = labels
    val batchesBefore = batches
    drain()
    assert(batches == batchesBefore, "re-drain must process no objects")
    assert(labels === before)
  }
}
