package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

class CdcApplySpec extends SparkSpec {

  private val changeSchema = StructType(Seq(
    StructField("op", StringType), StructField("seq", LongType),
    StructField("id", LongType), StructField("val", StringType)))

  private def stream(dir: String) =
    spark.readStream.schema(changeSchema)
      .option("maxFilesPerTrigger", 1)
      .json(dir)

  test("drain applies inserts/updates/deletes into versioned snapshots with time travel") {
    val changes = Files.createTempDirectory("graft-cdc-in").toString
    val table = Files.createTempDirectory("graft-cdc-tbl").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ck").toString

    // batch 0: two inserts, one of them immediately updated (seq decides)
    Files.writeString(Paths.get(changes, "c0.json"),
      """{"op":"I","seq":1,"id":1,"val":"a"}
        |{"op":"I","seq":2,"id":2,"val":"b"}
        |{"op":"U","seq":3,"id":2,"val":"b2"}""".stripMargin)
    CdcApply.run(stream(changes), table, ckpt, keyCol = "id").awaitTermination()

    assert(CdcApply.versions(table) === Seq(0L))
    val v0 = CdcApply.readSnapshot(spark, table).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(v0.toSeq === Seq((1L, "a"), (2L, "b2")))

    // batch 1: delete id=1, update id=2, insert id=3
    Files.writeString(Paths.get(changes, "c1.json"),
      """{"op":"D","seq":4,"id":1,"val":null}
        |{"op":"U","seq":5,"id":2,"val":"b3"}
        |{"op":"I","seq":6,"id":3,"val":"c"}""".stripMargin)
    CdcApply.run(stream(changes), table, ckpt, keyCol = "id").awaitTermination()

    assert(CdcApply.versions(table) === Seq(0L, 1L))
    val v1 = CdcApply.readSnapshot(spark, table).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(v1.toSeq === Seq((2L, "b3"), (3L, "c")))

    // time travel: version 0 still reads as it was
    val v0again = CdcApply.readSnapshot(spark, table, Some(0L)).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(v0again.toSeq === Seq((1L, "a"), (2L, "b2")))

    // idempotent re-drain: no new version without new changes
    CdcApply.run(stream(changes), table, ckpt, keyCol = "id").awaitTermination()
    assert(CdcApply.versions(table) === Seq(0L, 1L))
  }

  test("diff law: applyChanges(prev, diff(prev, next)) reproduces next") {
    import spark.implicits._
    val prev = Seq(
      (1L, Option("a")), (2L, Option("b")),
      (3L, Option.empty[String]), (4L, Option("d"))).toDF("id", "val")
    val next = Seq(
      (1L, Option("a")),                       // unchanged → no change row
      (2L, Option.empty[String]),              // update to null
      (4L, Option("d2")),                      // update
      (5L, Option("e"))).toDF("id", "val")     // insert; 3 deleted

    val changes = CdcApply.diff(prev, next, "id")
    val ops = changes.select("op", "id").collect()
      .map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(ops === Map(2L -> "U", 3L -> "D", 4L -> "U", 5L -> "I"))

    val rebuilt = CdcApply.applyChanges(prev, changes, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), Option(r.getString(1))))
    val expected = next.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(rebuilt.toSeq === expected.toSeq)
  }

  test("applyChanges lets an update null out a column (no coalesce fallback)") {
    import spark.implicits._
    val base = Seq((1L, Option("x"))).toDF("id", "val")
    val changes = Seq(("U", 1L, 1L, Option.empty[String])).toDF("op", "seq", "id", "val")
    val out = CdcApply.applyChanges(base, changes, "id").collect()
    assert(out.length === 1 && out(0).isNullAt(1),
      "update carrying null must overwrite, not fall back to the old value")
  }
}
