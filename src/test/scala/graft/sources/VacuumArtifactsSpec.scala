package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Filesystem contract of the standing-artifact vacuum
  * (`Maintenance.vacuumArtifacts`) — the retention policy over the
  * fingerprint-keyed memo zones (band index, IVF index, components
  * prior): live fingerprints are never touched (a concurrent reader of
  * the live artifact is unaffected — the `writeParquetAtomic` marker
  * stays in place and the parquet stays readable), superseded
  * fingerprints beyond keep-N are removed, and crashed-build residue is
  * removed only past its TTL so an in-flight build's fresh temp
  * survives.
  */
class VacuumArtifactsSpec extends SparkSpec {

  private def mkArtifact(zone: java.io.File, name: String, mtime: Long): java.io.File = {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File(zone, name)
    spark.range(3).select(col("id").as("v"))
      .write.mode("overwrite").parquet(new java.io.File(dir, "index").getPath)
    assert(dir.setLastModified(mtime))
    dir
  }

  test("vacuum keeps live + keepN newest, removes superseded and stale residue only") {
    val zone = Files.createTempDirectory("graft-vacuum").toFile
    val now = 1000000000000L

    val live = mkArtifact(zone, "aaaa_live", now - 500000)  // old but LIVE
    val newest = mkArtifact(zone, "bbbb_new", now - 1000)
    val mid = mkArtifact(zone, "cccc_mid", now - 2000)
    val oldest = mkArtifact(zone, "dddd_old", now - 3000)

    val staleTmp = new java.io.File(zone, "eeee.tmp.deadbeef")
    staleTmp.mkdirs()
    assert(staleTmp.setLastModified(now - 100000))
    val freshTmp = new java.io.File(zone, "ffff.tmp.cafebabe")
    freshTmp.mkdirs()
    assert(freshTmp.setLastModified(now - 10))
    val staleTrash = new java.io.File(zone, "gggg.trash.0123")
    staleTrash.mkdirs()
    assert(staleTrash.setLastModified(now - 100000))

    // residue where writeParquetAtomic ACTUALLY leaves it: as a sibling
    // of the artifact, INSIDE a fingerprint dir (here the live one)
    val nestedStale = new java.io.File(live, "index.tmp.feedface")
    nestedStale.mkdirs()
    assert(nestedStale.setLastModified(now - 100000))
    assert(live.setLastModified(now - 500000)) // mkdirs bumped the parent
    val nestedFresh = new java.io.File(live, "index.tmp.baddcafe")
    nestedFresh.mkdirs()
    assert(nestedFresh.setLastModified(now - 10))
    assert(live.setLastModified(now - 500000))

    val deleted = Maintenance.vacuumArtifacts(
      zone, live = Set("aaaa_live"), keepN = 1, residueTtlMs = 50000, now = now)

    // live untouched and STILL READABLE (the concurrent-reader guarantee:
    // marker present, parquet intact)
    assert(live.exists())
    assert(new java.io.File(live, "index/_SUCCESS").exists())
    assert(spark.read.parquet(new java.io.File(live, "index").getPath).count() === 3L)

    // keepN = 1: the newest non-live survives; mid + oldest removed
    assert(newest.exists())
    assert(!mid.exists())
    assert(!oldest.exists())

    // residue: stale tmp/trash removed, fresh tmp (in-flight build) kept
    // — at zone level AND nested inside the (live) fingerprint dir
    assert(!staleTmp.exists())
    assert(!staleTrash.exists())
    assert(freshTmp.exists())
    assert(!nestedStale.exists())
    assert(nestedFresh.exists())

    assert(deleted.toSet ===
      Set(mid, oldest, staleTmp, staleTrash, nestedStale).map(_.getPath))
  }

  test("vacuum never deletes a live fingerprint even at keepN = 0") {
    val zone = Files.createTempDirectory("graft-vacuum0").toFile
    val now = 1000000000000L
    val live = mkArtifact(zone, "live_fp", now - 9000)
    val stale = mkArtifact(zone, "stale_fp", now - 1000)

    val deleted = Maintenance.vacuumArtifacts(
      zone, live = Set("live_fp"), keepN = 0, residueTtlMs = 50000, now = now)

    assert(live.exists())
    assert(!stale.exists())
    assert(deleted === Seq(stale.getPath))
  }

  test("vacuum of a missing or empty zone is a no-op") {
    val missing = new java.io.File("/tmp/graft-vacuum-does-not-exist")
    assert(Maintenance.vacuumArtifacts(missing, Set.empty).isEmpty)
    val empty = Files.createTempDirectory("graft-vacuum-empty").toFile
    assert(Maintenance.vacuumArtifacts(empty, Set.empty).isEmpty)
  }
}
