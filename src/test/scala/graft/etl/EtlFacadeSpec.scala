package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** End-to-end through the façade: the reference's documented usage
  * (README.md:66-86 — POST /etl/run with the sample payload, then poll) as
  * library calls, asserting the reference's documented output.
  */
class EtlFacadeSpec extends SparkSpec {

  test("runPipeline: sample payload in, enriched NDJSON out, poll-able run id") {
    val landing = Files.createTempDirectory("graft-etl-l").toString
    val out = Files.createTempDirectory("graft-etl-o").toString
    val ckpt = Files.createTempDirectory("graft-etl-c").toString
    val schema = StructType(Seq(StructField("name", StringType)))

    val run = Etl.runPipeline(spark, landing, "data.json",
      "{\"name\":\"Alice\"}\n{\"name\":\"Bob\"}",
      out, schema, ckpt)

    val st = Etl.jobStatus(run.runId)
    assert(st.exists(_.state == "SUCCEEDED"), st)

    val result = spark.read.json(s"$out/transformed/data.json")
      .orderBy("name").collect()
    assert(result.map(_.getAs[String]("uppercase_name")).toSeq === Seq("ALICE", "BOB"))
    assert(result.forall(_.getAs[Boolean]("processed")))
  }

  test("upload alone lands the object; unknown run id yields None") {
    val landing = Files.createTempDirectory("graft-etl-u").toString
    val r = Etl.upload(spark, landing, "x.json", "{\"name\":\"z\"}")
    assert(spark.read.json(s"${r.landingDir}/${r.key}").count() === 1)
    assert(Etl.jobStatus("no-such-run").isEmpty)
  }
}
