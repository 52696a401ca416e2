package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed hard-delete epoch: tombstone queue → cascade through
  * every standing zone → consolidated queue generation → vacuum retires
  * the superseded pieces. Pinned: each cascaded artifact equals a rebuild
  * from the filtered corpus; the report's rewrite/removal numbers match
  * ground truth; the consolidated tombstones are exactly the distinct
  * queue; and the vacuum then retires the old generations while the live
  * ones stay complete and readable.
  */
class HardDeleteEpochSpec extends SparkSpec {

  test("one epoch cascades every zone, consolidates the queue, then vacuums") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("hard_delete").toFile
    val docs = graft.Tables.documents(spark, sf0001)

    // the takedown queue: the registered delete set split over 2 batches
    val del = graft.llm.Forget.deletedOf(docs)
    val ids = del.as[Long].collect().sorted
    val (b0, b1) = ids.splitAt(ids.length / 2)
    val queue = new java.io.File(root, "tombstones")
    b0.toSeq.toDF("doc_id").write.parquet(s"$queue/batch=0")
    b1.toSeq.toDF("doc_id").write.parquet(s"$queue/batch=1")

    // two standing doc-keyed artifacts: the minhash band index and a
    // per-doc length registry
    val bandZone = new java.io.File(root, "band"); bandZone.mkdirs()
    val band0 = new java.io.File(bandZone, "gen0")
    graft.llm.Dedup.bandRowsOf(graft.llm.Dedup.shingled(docs))
      .repartitionByRange(20, col("doc_id")).write.parquet(band0.toString)
    val lenZone = new java.io.File(root, "len"); lenZone.mkdirs()
    val len0 = new java.io.File(lenZone, "gen0")
    docs.select(col("doc_id"), length(col("text")).as("n"))
      .repartitionByRange(10, col("doc_id")).write.parquet(len0.toString)

    val band1 = new java.io.File(bandZone, "gen1").toPath
    val len1 = new java.io.File(lenZone, "gen1").toPath
    val consolidated = new java.io.File(root, "tombstones_epoch1").toPath
    val report = Maintenance.hardDeleteEpoch(
      spark, queue.toString,
      Seq((band0.toString, "doc_id", band1), (len0.toString, "doc_id", len1)),
      consolidated)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toList

    // report ground truth: removal counts per zone
    val survivors = docs.join(del, Seq("doc_id"), "left_anti")
    val bandRemoved = spark.read.parquet(band0.toString)
      .join(del, Seq("doc_id"), "left_semi").count()
    assert(report.map(_._1) === List(band0.toString, len0.toString))
    assert(report(0)._3 === bandRemoved)
    assert(report(1)._3 === ids.length.toLong)
    assert(report.forall(_._2 > 0), "each zone should have rewritten files")

    // cascaded artifacts ≡ rebuilds from the filtered corpus
    val gotBand = spark.read.parquet(band1.toString)
      .select("doc_id", "band", "band_key").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val wantBand = graft.llm.Dedup.bandRowsOf(graft.llm.Dedup.shingled(survivors))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(gotBand === wantBand)
    assert(spark.read.parquet(len1.toString).count() ===
      docs.count() - ids.length)

    // consolidated queue = the distinct ids, atomically installed
    assert(java.nio.file.Files.exists(consolidated.resolve("_SUCCESS")))
    assert(spark.read.parquet(consolidated.toString)
      .as[Long].collect().sorted.toSeq === ids.toSeq)

    // the vacuum then retires the superseded generations; live ones stay
    // complete and readable
    val vacBand = Maintenance.vacuumArtifacts(bandZone, live = Set("gen1"), keepN = 0)
    assert(vacBand === Seq(band0.getPath) && !band0.exists())
    assert(spark.read.parquet(band1.toString).count() === gotBand.size.toLong)

    graft.Fs.deleteRecursively(root)
  }
}
