package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OPTIMIZE as an epoch commit — the lifecycle verb between hard-delete
  * epochs and retention: compacting a standing zone's fragmented
  * generation must (1) produce exactly one right-sized file per
  * running-total bin with BYTE-IDENTICAL row content, (2) flip readers
  * atomically through the new manifest while every other zone's
  * generation, key column, and schema version carries forward verbatim,
  * (3) leave the fragmented generation time-travel-readable until
  * retention retires it, and (4) refuse a dirty target (retries mint
  * fresh generation paths — the forgetArtifacts contract).
  */
class OptimizeEpochSpec extends SparkSpec {

  test("compaction commits as a new epoch; the fragmented generation stays travelable") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("optimize_epoch").toFile
    val manifest = new java.io.File(root, "manifest")

    // a fragmented generation (8 part files) + an untouched second zone
    val zones = new java.io.File(root, "zones")
    val gen1 = new java.io.File(zones, "docs_gen1")
    spark.range(2000).select(col("id"), (col("id") % 97).as("v"))
      .repartition(8).write.parquet(gen1.toString)
    val other = new java.io.File(zones, "tags_gen1").toPath
    graft.Fs.writeParquetAtomic(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), other)
    Maintenance.commitEpochManifest(spark,
      Seq(("docs", gen1.toString, "id"), ("tags", other.toString, "id")),
      manifest.toPath, 1L, Map("docs" -> 1L, "tags" -> 3L))
    val nFilesBefore = gen1.listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFilesBefore === 8)

    // optimize 'docs' into epoch 2 with a generous byte target
    val gen2 = new java.io.File(zones, "docs_gen2").toPath
    val (installed, filesIn, bins) = Maintenance.optimizeZoneEpoch(
      spark, manifest, "docs", gen2, epoch = 2L, targetBytes = 1L << 20)
    assert(filesIn === 8L && bins === 1L)
    assert(new java.io.File(installed).listFiles()
      .count(_.getName.endsWith(".parquet")) === 1)

    // 1. content identity; 2. atomic flip + untouched-zone carry-forward
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cur = Maintenance.readZoneThroughManifest(spark, manifest, "docs")
    assert(rowsOf(cur) === rowsOf(spark.read.parquet(gen1.toString)))
    val (e2, zones2) = Maintenance.currentEpoch(spark, manifest).get
    assert(e2 === 2L && zones2("docs") === installed
      && zones2("tags") === other.toString)
    val (_, rows2) = Maintenance.manifestRowsAsOf(spark, manifest)
    assert(rows2.find(_._1 == "tags").get === (("tags", other.toString, "id", 3L)),
      "the untouched zone's key column and schema version must carry forward")
    assert(rows2.find(_._1 == "docs").get._4 === 1L,
      "compaction is a layout rewrite, never a schema bump")

    // 3. the fragmented generation stays readable as-of epoch 1
    assert(rowsOf(Maintenance.readZoneThroughManifest(
      spark, manifest, "docs", asOfEpoch = 1L)) === rowsOf(cur))

    // 4. a retry into the same generation path refuses at entry
    assert(intercept[IllegalArgumentException] {
      Maintenance.optimizeZoneEpoch(spark, manifest, "docs", gen2, 3L)
    }.getMessage.contains("fresh generation path"))

    // ...and retention eventually retires the fragmented generation
    // while the optimized one survives
    val gone = Maintenance.retentionSweep(spark, manifest, Seq(zones),
      keepEpochs = 1, keepUnreferenced = 0)
    assert(gone.exists(_.endsWith("docs_gen1")))
    assert(rowsOf(Maintenance.readZoneThroughManifest(spark, manifest, "docs"))
      === rowsOf(cur))

    graft.Fs.deleteRecursively(root)
  }
}
