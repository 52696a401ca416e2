package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestSpec extends SparkSpec {

  test("upload stamps metadata columns and round-trips the routing hint") {
    val landing = Files.createTempDirectory("graft-ingest").toString
    Ingest.uploadSourceObject(spark, landing, "payload.json",
      "{\"name\":\"Alice\"}\n{\"name\":\"Bob\"}",
      metadata = Map("team" -> "data", Ingest.OutputRootHint -> "/tmp/curated"))

    val meta = Ingest.readMetadata(spark, landing, "payload.json")
    assert(meta === Map("team" -> "data", Ingest.OutputRootHint -> "/tmp/curated"))

    val df = spark.read.json(s"$landing/payload.json")
    assert(df.count() === 2)
    assert(df.columns.contains("name"))
  }

  test("ingest -> enrich -> sink preserves metadata through the transform") {
    val out = Enrich.enrich(Ingest.fromContent(spark, "{\"name\":\"x\"}",
      Map("src" -> "api")))
    val row = out.head()
    assert(row.getAs[String]("_meta_src") === "api")
    assert(row.getAs[String]("uppercase_name") === "X")
  }

  test("CSV source round-trips with explicit schema (SURVEY S8)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val src = Tables.customerish
    src.write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(dir)
    assert(back.orderBy("id").collect().toSeq ===
      src.orderBy("id").collect().toSeq)
  }

  test("unionByName with allowMissingColumns mirrors the open-schema spirit") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "name")
    val b = Seq((2L, true)).toDF("id", "flag")
    val u = a.unionByName(b, allowMissingColumns = true).orderBy("id")
    assert(u.columns.toSet === Set("id", "name", "flag"))
    assert(u.count() === 2)
    assert(u.filter(col("id") === 2).head().isNullAt(u.columns.indexOf("name")))
  }

  private object Tables {
    def customerish = {
      import spark.implicits._
      Seq((1L, "a", 10.5), (2L, "b", -3.25), (3L, "c", 0.0))
        .toDF("id", "name", "bal")
    }
  }
}
