package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-zone epoch atomicity through the manifest: each zone's
  * generation already installs atomically, so the remaining failure
  * mode is a crash BETWEEN zone installs. The manifest (written LAST,
  * atomic rename) is the commit point — this spec injects exactly that
  * crash and pins:
  *
  *  1. readers resolving through the manifest still see epoch E−1
  *     COHERENTLY (the crashed zone's new generation is unreachable);
  *  2. a retry into the crashed generation path fails fast with the
  *     fresh-path diagnostic (no silent late DirectoryNotEmpty);
  *  3. the retried epoch (fresh paths) flips every zone at once;
  *  4. the crashed/superseded generations are plain unreferenced dirs
  *     the vacuum retires while the manifest-live one stays readable.
  */
class EpochManifestSpec extends SparkSpec {

  test("crash between zone installs leaves readers on epoch E-1; retry flips all zones at once") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("epoch_manifest").toFile
    val docs = graft.Tables.documents(spark, sf0001)
    val ids = graft.llm.Forget.deletedOf(docs).as[Long].collect().sorted
    val (d1, d2) = ids.splitAt(ids.length / 2)
    assert(d1.nonEmpty && d2.nonEmpty)
    val q1 = new java.io.File(root, "q1")
    d1.toSeq.toDF("doc_id").write.parquet(q1.toString)
    val q2 = new java.io.File(root, "q2")
    d2.toSeq.toDF("doc_id").write.parquet(q2.toString)

    // two standing doc-keyed zones, multi-file generations
    val zoneA = new java.io.File(root, "lens")
    val a0 = new java.io.File(zoneA, "gen0")
    docs.select(col("doc_id"), length(col("text")).as("n"))
      .repartitionByRange(10, col("doc_id")).write.parquet(a0.toString)
    val zoneB = new java.io.File(root, "sources")
    val s0 = new java.io.File(zoneB, "gen0")
    docs.select(col("doc_id"), col("source"))
      .repartitionByRange(10, col("doc_id")).write.parquet(s0.toString)

    val manifest = new java.io.File(root, "manifest")

    // epoch 1: both zones cascade, the manifest commits last
    val a1 = new java.io.File(zoneA, "gen1")
    val s1 = new java.io.File(zoneB, "gen1")
    Maintenance.hardDeleteEpochManifested(spark, q1.toString,
      Seq(("lens", a0.toString, "doc_id", a1.toPath),
        ("sources", s0.toString, "doc_id", s1.toPath)),
      new java.io.File(root, "tomb1").toPath, manifest.toPath, epoch = 1L)
    val (e1, gens1) = Maintenance.currentEpoch(spark, manifest).get
    assert(e1 === 1L)
    assert(gens1 === Map("lens" -> a1.getPath, "sources" -> s1.getPath))
    val lens1 = Maintenance.readZoneThroughManifest(spark, manifest, "lens")
    assert(lens1.join(d1.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
      .count() === 0L)
    val n1 = lens1.count()

    // epoch 2 CRASH: zone A installs its next generation, then the
    // process dies before zone B and before the manifest — injected by
    // cascading only zone A
    val a2 = new java.io.File(zoneA, "gen2")
    Maintenance.forgetArtifacts(spark, a1.getPath, "doc_id",
      d2.toSeq.toDF("doc_id"), a2.toPath)
    assert(a2.exists(), "the crashed epoch's zone-A generation is on disk")
    val (e1b, gens1b) = Maintenance.currentEpoch(spark, manifest).get
    assert(e1b === 1L && gens1b === gens1,
      "a crashed epoch must not move the commit point")
    assert(Maintenance.readZoneThroughManifest(spark, manifest, "lens")
      .count() === n1,
      "the crashed install must be unreachable through the manifest")

    // fail-fast: retrying INTO the crashed generation path explains itself
    val ex = intercept[IllegalArgumentException] {
      Maintenance.forgetArtifacts(spark, a1.getPath, "doc_id",
        d2.toSeq.toDF("doc_id"), a2.toPath)
    }
    assert(ex.getMessage.contains("fresh generation path"))

    // retry epoch 2 with fresh generation paths: both zones flip at once
    val a2r = new java.io.File(zoneA, "gen2r")
    val s2r = new java.io.File(zoneB, "gen2r")
    Maintenance.hardDeleteEpochManifested(spark, q2.toString,
      Seq(("lens", a1.getPath, "doc_id", a2r.toPath),
        ("sources", s1.getPath, "doc_id", s2r.toPath)),
      new java.io.File(root, "tomb2").toPath, manifest.toPath, epoch = 2L)
    val (e2, gens2) = Maintenance.currentEpoch(spark, manifest).get
    assert(e2 === 2L)
    assert(gens2 === Map("lens" -> a2r.getPath, "sources" -> s2r.getPath))
    for (z <- Seq("lens", "sources")) {
      assert(Maintenance.readZoneThroughManifest(spark, manifest, z)
        .join(ids.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
        .count() === 0L,
        s"zone $z must exclude every tombstoned id at epoch 2")
    }
    assert(Maintenance.readZoneThroughManifest(spark, manifest, "lens")
      .count() === docs.count() - ids.length)

    // crashed + superseded generations are plain unreferenced dirs the
    // vacuum retires; the manifest-live one stays readable through it
    val vac = Maintenance.vacuumArtifacts(zoneA, live = Set("gen2r"), keepN = 0)
    assert(vac.toSet === Set(a0.getPath, a1.getPath, a2.getPath))
    assert(Maintenance.readZoneThroughManifest(spark, manifest, "lens")
      .count() === docs.count() - ids.length)

    graft.Fs.deleteRecursively(root)
  }
}
