package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Reference-parity golden tests for the enrichment transform.
  *
  * The expected bytes are exactly what the reference produces for the
  * documented sample payload (pedrohw12/etl-pipeline-aws `README.md:69-86`,
  * transform at `glue/job.py:27-34`), including its key order
  * (name, processed, uppercase_name — the dict-spread order).
  */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def enrichJson(lines: String*): Array[String] = {
    val df = spark.read.json(lines.toDS)
    Enrich.enrich(df).toJSON.collect()
  }

  test("golden bytes: documented sample payload") {
    val out = enrichJson("""{"name":"Alice"}""", """{"name":"Bob"}""")
    assert(out.toSeq === Seq(
      """{"name":"Alice","processed":true,"uppercase_name":"ALICE"}""",
      """{"name":"Bob","processed":true,"uppercase_name":"BOB"}"""))
  }

  test("null name defaults to empty string (glue/job.py:31)") {
    val out = enrichJson("""{"id":1,"name":null}""", """{"id":2,"name":"x"}""")
    assert(out.toSeq === Seq(
      """{"id":1,"processed":true,"uppercase_name":""}""",
      """{"id":2,"name":"x","processed":true,"uppercase_name":"X"}"""))
  }

  test("absent name column defaults to empty string") {
    val out = enrichJson("""{"id":7}""")
    assert(out.toSeq === Seq("""{"id":7,"processed":true,"uppercase_name":""}"""))
  }

  test("extra and nested fields pass through untouched ({**record} spread)") {
    val out = enrichJson("""{"name":"a","extra":{"b":[1,2]},"z":3.5}""")
    assert(out.toSeq === Seq(
      """{"extra":{"b":[1,2]},"name":"a","z":3.5,"processed":true,"uppercase_name":"A"}"""))
  }

  test("blank lines are skipped by the NDJSON source (glue/job.py:25)") {
    val df = Ndjson.parse(spark, Seq("""{"name":"a"}""", "", "   ", """{"name":"b"}""").toDS)
    assert(df.count() === 2)
  }

  test("malformed lines surface in _corrupt_record instead of failing the batch") {
    // the reference would throw on json.loads (glue/job.py:25) and kill the
    // whole job run; PERMISSIVE mode quarantines the line instead
    val df = Ndjson.parse(spark,
      Seq("""{"name":"ok"}""", """{"name": BROKEN""", """not json at all""").toDS)
    val rows = df.collect()
    assert(rows.length === 3)
    val corrupt = df.filter(col(Ndjson.CorruptCol).isNotNull)
    assert(corrupt.count() === 2)
    assert(df.filter(col("name") === "ok").count() === 1)
  }
}
