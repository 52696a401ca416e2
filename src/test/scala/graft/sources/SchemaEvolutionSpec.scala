package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Standing-zone SCHEMA EVOLUTION through the epoch manifest — the
  * upgrade path that keeps pre-upgrade generations readable instead of
  * orphaning them: a fingerprint-keyed zone pins its schema implicitly,
  * so v2 code adding a column must read v1 generations through
  * [[Maintenance.readZoneEvolved]] (defaults filled), with the
  * manifest's `zone_schema_version` recording which shape each epoch
  * installed. Pins:
  *
  *  1. a v1 generation read through v2 code yields the v2 shape with
  *     the default filled; the v2 generation yields real values;
  *  2. frames of DIFFERENT schema versions union by name through the
  *     evolved reader (the cross-generation read a multi-epoch zone
  *     serves every day);
  *  3. `zone_schema_version` resolves per epoch, and a manifest written
  *     BEFORE the column existed (the manifest's own v1!) reads as
  *     version 1 — the evolution discipline applied to its own record;
  *  4. evolution composes with time travel: the as-of-v1-epoch evolved
  *     read is stable after the v2 epoch lands.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("v1 generations stay readable through v2 code; versions resolve per epoch") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("schema_evolve").toFile
    val manifest = new java.io.File(root, "manifest")

    // epoch 1: the zone as v1 code wrote it (no 'score' column)
    val gen1 = new java.io.File(root, "gen1").toPath
    graft.Fs.writeParquetAtomic(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag"), gen1)
    Maintenance.commitEpochManifest(spark,
      Seq(("lens", gen1.toString, "id")), manifest.toPath, 1L,
      Map("lens" -> 1L))

    // v2 code: expects a 'score' column, default 0
    val v2Defaults = Seq("score" -> lit(0L))
    val asV1 = Maintenance.readZoneEvolved(spark, manifest, "lens", v2Defaults)
    assert(asV1.columns.toSeq === Seq("id", "tag", "score"))
    assert(asV1.select("score").distinct().collect().map(_.getLong(0)).toSeq === Seq(0L))

    // epoch 2: v2 code installs a generation WITH the column
    val gen2 = new java.io.File(root, "gen2").toPath
    graft.Fs.writeParquetAtomic(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "tag", "score"), gen2)
    Maintenance.commitEpochManifest(spark,
      Seq(("lens", gen2.toString, "id")), manifest.toPath, 2L,
      Map("lens" -> 2L))

    // 1. current read serves real v2 values; 4. the as-of-1 evolved
    // read is STABLE after the upgrade epoch landed
    val cur = Maintenance.readZoneEvolved(spark, manifest, "lens", v2Defaults)
    assert(cur.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      === Set((1L, "a", 10L), (2L, "b", 20L)))
    val asOf1 = Maintenance.readZoneEvolved(spark, manifest, "lens", v2Defaults,
      asOfEpoch = 1L)
    assert(asOf1.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      === Set((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)))

    // 2. cross-version union by name through the evolved reader
    val union = asOf1.unionByName(cur)
    assert(union.count() === 5L)
    assert(union.filter(col("score") > 0).count() === 2L)

    // 3. per-epoch version resolution
    assert(Maintenance.zoneSchemaVersion(spark, manifest, "lens", asOfEpoch = 1L) === 1L)
    assert(Maintenance.zoneSchemaVersion(spark, manifest, "lens") === 2L)

    // ...and a manifest written BEFORE zone_schema_version existed (the
    // old 4-column shape) resolves as version 1 instead of erroring
    graft.Fs.writeParquetAtomic(
      Seq((3L, "lens", gen2.toString, "id")).toDF("epoch", "zone", "generation", "key_col"),
      manifest.toPath.resolve(f"epoch-${3L}%09d"))
    assert(Maintenance.zoneSchemaVersion(spark, manifest, "lens") === 1L)
    assert(Maintenance.readZoneEvolved(spark, manifest, "lens", v2Defaults)
      .columns.contains("score"))

    graft.Fs.deleteRecursively(root)
  }
}
