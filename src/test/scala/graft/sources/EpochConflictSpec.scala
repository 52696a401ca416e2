package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-writer epoch-commit safety — the CAS contract of
  * [[Maintenance.commitEpochManifestCas]], exercised the way a real
  * deployment hits it: a scheduled `retentionSweep`-adjacent OPTIMIZE and
  * a takedown's hard-delete epoch racing the same commit log. One
  * committer must fail CLEANLY with the named [[EpochConflictException]],
  * the log must never hold a torn/mixed manifest, and the loser must
  * succeed when it retries onto the next epoch with fresh generation
  * paths. This spec enforces the single-writer-per-epoch rule the epoch
  * machinery previously only assumed (the reference's
  * `maxConcurrentRuns: 1` envelope made explicit).
  */
class EpochConflictSpec extends SparkSpec {

  /** A two-zone manifested table at epoch 1: a fragmented 'docs' zone
    * (optimize bait) and a 'tags' zone, plus a tombstone batch naming
    * some doc ids (hard-delete bait). */
  private def fixture(): (java.io.File, java.io.File, java.io.File,
      java.io.File, java.io.File) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("epoch_conflict").toFile
    val manifest = new java.io.File(root, "manifest")
    val zones = new java.io.File(root, "zones")
    val docsGen1 = new java.io.File(zones, "docs_gen1")
    spark.range(500).select(col("id"), (col("id") % 13).as("v"))
      .repartition(4).write.parquet(docsGen1.toString)
    val tagsGen1 = new java.io.File(zones, "tags_gen1").toPath
    graft.Fs.writeParquetAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), tagsGen1)
    Maintenance.commitEpochManifest(spark,
      Seq(("docs", docsGen1.toString, "id"), ("tags", tagsGen1.toString, "id")),
      manifest.toPath, 1L)
    val tombs = new java.io.File(root, "tombstones")
    graft.Fs.writeParquetAtomic(
      spark.range(500).filter(col("id") % 50 === 7).select(col("id").as("doc_id")),
      new java.io.File(tombs, "batch=0").toPath)
    (root, manifest, zones, docsGen1, tombs)
  }

  private def docRows(manifest: java.io.File, asOf: Long = Long.MaxValue) =
    Maintenance.readZoneThroughManifest(spark, manifest, "docs", asOf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("two committers racing one epoch: one wins, one fails cleanly, the loser retries onto E+2") {
    val (root, manifest, zones, docsGen1, tombs) = fixture()
    val before = docRows(manifest)

    // committer A (takedown): hard-delete epoch 2 — wins
    val gen2a = new java.io.File(zones, "docs_gen2-harddelete").toPath
    Maintenance.hardDeleteEpochManifested(spark, tombs.toString,
      Seq(("docs", docsGen1.toString, "id", gen2a)),
      new java.io.File(root, "tomb_epoch2").toPath, manifest.toPath, epoch = 2L)
    val afterDelete = docRows(manifest)
    assert(afterDelete === before.filterNot(_._1 % 50 == 7))

    // committer B (scheduled optimize) read the table at epoch 1 too and
    // tries to commit the SAME epoch number: must fail with the NAMED
    // conflict at entry — before its rewrite runs — and leave no state
    val gen2b = new java.io.File(zones, "docs_gen2-optimize").toPath
    val e = intercept[EpochConflictException] {
      Maintenance.optimizeZoneEpoch(spark, manifest, "docs", gen2b, epoch = 2L)
    }
    assert(e.getMessage.contains("not newer"))
    assert(!java.nio.file.Files.exists(gen2b),
      "the losing committer must install nothing")

    // zero torn state: epoch 2 is EXACTLY the winner's manifest
    val (cur, zonesNow) = Maintenance.currentEpoch(spark, manifest).get
    assert(cur === 2L && zonesNow("docs") === gen2a.toString)
    assert(docRows(manifest) === afterDelete)

    // the loser re-reads the current epoch and retries onto E+1 with a
    // fresh generation path — succeeds, and the hard-delete's rows stay
    // deleted (the retry rewrote the WINNER's generation, not its stale
    // epoch-1 read)
    val gen3 = new java.io.File(zones, "docs_gen3-optimize").toPath
    val (installed, _, bins) = Maintenance.optimizeZoneEpoch(
      spark, manifest, "docs", gen3, epoch = 3L, targetBytes = 1L << 20)
    assert(bins === 1L)
    val (cur3, zones3) = Maintenance.currentEpoch(spark, manifest).get
    assert(cur3 === 3L && zones3("docs") === installed)
    assert(docRows(manifest) === afterDelete)
    // ...and the loser's abandoned attempt left nothing a reader can see:
    // time travel to epoch 2 still resolves the winner's generation
    assert(docRows(manifest, asOf = 2L) === afterDelete)

    graft.Fs.deleteRecursively(root)
  }

  test("the rename IS the CAS: two racers past the read-check contend atomically") {
    val (root, manifest, zones, docsGen1, _) = fixture()
    // both committers read parent epoch 1 and both passed the read-check;
    // the first rename installs, the second must map target-exists to the
    // named conflict (never silently shadow the winner's manifest)
    val genA = new java.io.File(zones, "docs_gen2-a").toPath
    val genB = new java.io.File(zones, "docs_gen2-b").toPath
    graft.Fs.writeParquetAtomic(spark.read.parquet(docsGen1.toString), genA)
    graft.Fs.writeParquetAtomic(spark.read.parquet(docsGen1.toString), genB)
    Maintenance.commitEpochManifestCas(spark,
      Seq(("docs", genA.toString, "id")), manifest.toPath, 2L, Some(1L))
    // racer B: simulate the check-to-rename window by committing with the
    // same (stale-but-just-checked) parent — the read-check now sees the
    // winner, which is exactly the conflict
    val e1 = intercept[EpochConflictException] {
      Maintenance.commitEpochManifestCas(spark,
        Seq(("docs", genB.toString, "id")), manifest.toPath, 2L, Some(1L))
    }
    assert(e1.getMessage.contains("expected parent 1"))
    // the winner's manifest is untouched
    assert(Maintenance.currentEpoch(spark, manifest).get._2("docs") === genA.toString)

    // a commit onto an EMPTY log requires expectedParent = None
    val fresh = new java.io.File(root, "manifest_fresh")
    intercept[EpochConflictException] {
      Maintenance.commitEpochManifestCas(spark,
        Seq(("docs", genB.toString, "id")), fresh.toPath, 1L, Some(0L))
    }
    Maintenance.commitEpochManifestCas(spark,
      Seq(("docs", genB.toString, "id")), fresh.toPath, 1L, None)
    assert(Maintenance.currentEpoch(spark, fresh).get._1 === 1L)

    graft.Fs.deleteRecursively(root)
  }
}
