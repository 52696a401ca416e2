package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The unigram STANDING MODEL ZONE's lifecycle contract — the properties
  * the oracled queries stand on but cannot show:
  *
  *  1. the zone exists on disk as a manifested epoch (vocab + word→np
  *     generations, each atomic-rename-installed with `_SUCCESS`), and
  *     the manifest resolves both zones;
  *  2. NO encode query's plan contains a driver-side local relation of
  *     word types — the word→np map enters as a parquet scan of the
  *     standing generation (the r12 `weak` finding, pinned structurally
  *     so a regression to `collect + toDF` fails here);
  *  3. the zone participates in the standard retention machinery: its
  *     generations are in the manifest's live set, so a retentionSweep
  *     over the zone root deletes nothing that a reader can resolve.
  */
class UnigramZoneSpec extends SparkSpec {

  test("the trained model is a manifested standing zone, not a driver memo") {
    // force the zone (any encode query builds it)
    Unigram.unigramEncode(spark, sf0001).collect()
    val root = Unigram.modelZoneRoot(spark, sf0001)
    val manifest = new java.io.File(root, "manifest")
    val (epoch, zones) =
      graft.sources.Maintenance.currentEpoch(spark, manifest).get
    assert(epoch >= 1L)
    for (zone <- Seq(Unigram.VocabZone, Unigram.WordNpZone)) {
      val gen = new java.io.File(zones(zone))
      assert(new java.io.File(gen, "_SUCCESS").exists(),
        s"$zone generation must be a complete atomic install")
      assert(graft.sources.Maintenance
        .readZoneThroughManifest(spark, manifest, zone).count() > 0)
    }
    // the word→np artifact matches what the spec-facing trainer computes
    val fromZone = graft.sources.Maintenance
      .readZoneThroughManifest(spark, manifest, Unigram.WordNpZone)
      .collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("np"))).toMap
    val (_, wordNp) = Unigram.trainOver(
      Unigram.wordCountsOf(graft.Tables.documents(spark, sf0001)))
    assert(fromZone === wordNp.map { case (w, _, np) => w -> np }.toMap)
  }

  test("encode plans read the model as a parquet scan — never a collected local relation") {
    for (q <- Seq("text_unigram_encode", "text_unigram_fertility",
        "pack_unigram_sequences")) {
      val plan = graft.SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.sparkPlan
      val leaves = plan.collectLeaves().map(_.getClass.getSimpleName)
      assert(!leaves.contains("LocalTableScanExec"),
        s"$q must not embed a driver-materialized model: $leaves")
      // the model scan is there: at least two file scans (corpus + zone)
      assert(leaves.count(_ == "FileSourceScanExec") >= 2,
        s"$q must scan the standing model generation: $leaves")
    }
  }

  test("retention over the model zone deletes nothing a reader resolves") {
    Unigram.unigramEncode(spark, sf0001).collect()
    val root = Unigram.modelZoneRoot(spark, sf0001)
    val manifest = new java.io.File(root, "manifest")
    val zones = new java.io.File(root, "zones")
    val before = Unigram.unigramTrain(spark, sf0001).collect().toSeq
    // the naive-but-dangerous call — sweeping the root that CONTAINS the
    // commit log — fails fast on the guard instead of eating the log
    assert(intercept[IllegalArgumentException] {
      graft.sources.Maintenance.retentionSweep(
        spark, manifest, Seq(root), keepEpochs = 2)
    }.getMessage.contains("commit log"))
    // the contract layout: generations under zones/, manifest beside it —
    // the sweep keeps every manifested generation (live set) and the
    // model reads still resolve
    val gone = graft.sources.Maintenance.retentionSweep(
      spark, manifest, Seq(zones), keepEpochs = 2, keepUnreferenced = 0)
    val after = Unigram.unigramTrain(spark, sf0001).collect().toSeq
    assert(after === before, s"retention broke the model read (deleted: $gone)")
    assert(!gone.exists(_.contains("gen1")),
      s"live generations must survive the sweep: $gone")
  }
}
