package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Epoch TIME TRAVEL and its retention contract — the read path the
  * keep-N rollback window was built to serve (a manifested epoch is
  * useless the week after a bad hard-delete if nothing can read the
  * epoch before it). Pins, in one lifecycle:
  *
  *  1. an as-of-epoch read resolves the MANIFESTED generation of that
  *     epoch and is STABLE while newer epochs land (manifests and
  *     generations are immutable once installed);
  *  2. as-of between discrete epochs resolves the newest epoch ≤ asOf
  *     (the timestamp-travel convention on the epoch axis);
  *  3. a zone vacuum fed [[Maintenance.manifestLiveGenerations]] never
  *     retires a generation any retained manifest references — even one
  *     superseded epochs ago — while truly unreferenced generations
  *     retire normally;
  *  4. [[Maintenance.vacuumEpochs]] keeps the newest keep-N manifests,
  *     after which reads inside the window still resolve and reads past
  *     it fail with the NAMED [[EpochRetiredException]] at resolution
  *     time (never a dangling-path parquet error downstream).
  */
class EpochTravelSpec extends SparkSpec {

  test("as-of reads are stable under new epochs; vacuum honors the retention window") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("epoch_travel").toFile
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val zoneDir = new java.io.File(root, "compliance")
    val manifest = new java.io.File(root, "manifest")

    // three epochs: full zone, then two successive hard-deletes — each
    // generation installed atomically, each epoch committed by its
    // manifest (the commitEpochManifest seam epoch 1 shares with the
    // hardDeleteEpochManifested epochs 2 and 3)
    val gen1 = new java.io.File(zoneDir, "gen1").toPath
    graft.Fs.writeParquetAtomic(docs, gen1)
    Maintenance.commitEpochManifest(spark,
      Seq(("compliance", gen1.toString, "doc_id")), manifest.toPath, 1L)

    def tombs(name: String, pred: org.apache.spark.sql.Column): String = {
      val dir = new java.io.File(root, name)
      graft.Fs.writeParquetAtomic(docs.filter(pred).select("doc_id"),
        new java.io.File(dir, "batch=0").toPath)
      dir.toString
    }
    val gen2 = new java.io.File(zoneDir, "gen2").toPath
    Maintenance.hardDeleteEpochManifested(spark,
      tombs("t2", col("doc_id") % 5 === 0),
      Seq(("compliance", gen1.toString, "doc_id", gen2)),
      new java.io.File(root, "tomb2").toPath, manifest.toPath, 2L)

    // 1+2. the as-of read BEFORE epoch 3 lands, re-read after — and an
    // as-of pointing between epochs resolves the newest <= asOf
    val asOf1Before = Maintenance.readZoneThroughManifest(
      spark, manifest, "compliance", asOfEpoch = 1L).collect().toSet

    val gen3 = new java.io.File(zoneDir, "gen3").toPath
    Maintenance.hardDeleteEpochManifested(spark,
      tombs("t3", col("doc_id") % 7 === 1),
      Seq(("compliance", gen2.toString, "doc_id", gen3)),
      new java.io.File(root, "tomb3").toPath, manifest.toPath, 5L)

    val asOf1After = Maintenance.readZoneThroughManifest(
      spark, manifest, "compliance", asOfEpoch = 1L).collect().toSet
    assert(asOf1After === asOf1Before,
      "the as-of-1 read must be byte-stable while newer epochs land")
    assert(asOf1After === docs.collect().toSet)
    // discrete-axis resolution: epochs are {1, 2, 5}; as-of 4 -> epoch 2
    val (e, gens) = Maintenance.epochAsOf(spark, manifest, asOf = 4L).get
    assert(e === 2L && gens("compliance") === gen2.toString)
    assert(Maintenance.currentEpoch(spark, manifest).get._1 === 5L)

    // 3. zone vacuum with the manifest-live set: gen1/gen2/gen3 are ALL
    // referenced by retained manifests, so keepN = 0 must retire only
    // the unreferenced stray; the epoch-1 read still serves afterwards
    val stray = new java.io.File(zoneDir, "gen0_stray").toPath
    graft.Fs.writeParquetAtomic(docs.limit(3), stray)
    val live = Maintenance.manifestLiveGenerations(spark, manifest)
    assert(live === Set("gen1", "gen2", "gen3"))
    val retired = Maintenance.vacuumArtifacts(zoneDir, live, keepN = 0)
    assert(retired === Seq(stray.toString),
      s"only the unreferenced stray may retire, got: $retired")
    assert(Maintenance.readZoneThroughManifest(
      spark, manifest, "compliance", asOfEpoch = 1L).count() === docs.count())

    // 4. retire the oldest manifest (keep 2): inside-window reads keep
    // resolving; the read past retention fails with the NAMED error
    val gone = Maintenance.vacuumEpochs(manifest, keepN = 2)
    assert(gone.length === 1 && gone.head.endsWith(f"epoch-${1L}%09d"))
    assert(Maintenance.epochAsOf(spark, manifest, asOf = 2L).get._1 === 2L)
    val ex = intercept[EpochRetiredException] {
      Maintenance.readZoneThroughManifest(
        spark, manifest, "compliance", asOfEpoch = 1L)
    }
    assert(ex.getMessage.contains("retention window"))
    assert(ex.getMessage.contains("oldest retained epoch: 2"))
    // ...and after the manifest retires, its generation becomes
    // vacuumable: the live set shrinks to the retained epochs'
    assert(Maintenance.manifestLiveGenerations(spark, manifest) ===
      Set("gen2", "gen3"))
    assert(intercept[IllegalArgumentException] {
      Maintenance.vacuumEpochs(manifest, keepN = 0)
    }.getMessage.contains("keepN"))

    graft.Fs.deleteRecursively(root)
  }

  test("retentionSweep shrinks the rollback window and the zones together") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("retention_sweep").toFile
    val zoneDir = new java.io.File(root, "zone")
    val manifest = new java.io.File(root, "manifest")
    // three manifested generations + one stray never referenced
    for (e <- 1L to 3L) {
      val gen = new java.io.File(zoneDir, s"gen$e").toPath
      graft.Fs.writeParquetAtomic(Seq((e, s"v$e")).toDF("id", "v"), gen)
      Maintenance.commitEpochManifest(spark,
        Seq(("lens", gen.toString, "id")), manifest.toPath, e)
    }
    graft.Fs.writeParquetAtomic(
      Seq((0L, "stray")).toDF("id", "v"),
      new java.io.File(zoneDir, "gen0_stray").toPath)

    // keep the 2 newest epochs, zero unreferenced slack: the epoch-1
    // manifest AND its now-unreferenced generation retire in one pass,
    // along with the stray; everything a reader can still resolve stays
    val gone = Maintenance.retentionSweep(spark, manifest, Seq(zoneDir),
      keepEpochs = 2, keepUnreferenced = 0)
    assert(gone.exists(_.endsWith(f"epoch-${1L}%09d")))
    assert(gone.exists(_.endsWith("gen1")) && gone.exists(_.endsWith("gen0_stray")))
    assert(Maintenance.readZoneThroughManifest(
      spark, manifest, "lens", asOfEpoch = 2L).collect().head.getString(1) === "v2")
    assert(Maintenance.readZoneThroughManifest(
      spark, manifest, "lens").collect().head.getString(1) === "v3")
    intercept[EpochRetiredException] {
      Maintenance.readZoneThroughManifest(spark, manifest, "lens", asOfEpoch = 1L)
    }
    // idempotent: a second pass finds nothing to do
    assert(Maintenance.retentionSweep(spark, manifest, Seq(zoneDir),
      keepEpochs = 2, keepUnreferenced = 0).isEmpty)

    graft.Fs.deleteRecursively(root)
  }
}
