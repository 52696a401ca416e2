package graft.etl

import graft.SparkSpec

/** `observe`-based ingest metrics: values correct, computed in the SAME
  * pass as the action (no second scan), and present only after an action.
  */
class ObservedSpec extends SparkSpec {

  test("metrics ride the enrichment pass and report the miss path") {
    import spark.implicits._
    val in = Seq(Some("Alice"), None, Some("Bo"), None, Some("")).toDF("name")
    val (out, obs) = Observed.enrichObserved(in)
    val rows = out.collect()
    assert(rows.length == 5)
    val m = obs.get
    assert(m("n_rows") == 5L)
    // None, None, and "" all take the .get("name","") default path
    assert(m("n_defaulted_names") == 3L)
    assert(m("total_name_chars") == 7L) // ALICE + BO
  }

  test("same observe node surfaces per-batch metrics in streaming") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[String]
    src.addData("Alice", "Bob")
    val out = Observed.enrichObservedNamed(
      src.toDF().withColumnRenamed("value", "name"), "ingest_metrics")
    val q = out.writeStream.format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val observed = q.recentProgress
      .flatMap(p => Option(p.observedMetrics.get("ingest_metrics")))
    assert(observed.nonEmpty, "no observedMetrics in streaming progress")
    assert(observed.map(_.getAs[Long]("n_rows")).sum == 2L)
    assert(observed.map(_.getAs[Long]("total_name_chars")).sum == 8L) // ALICE + BOB
  }

  test("one extra metric set costs zero extra Spark jobs") {
    import spark.implicits._
    val sc = spark.sparkContext
    // count within a dedicated job group: suites run concurrently in this
    // JVM, so a global job-count delta picks up other suites' jobs
    var probe = 0
    def jobs(f: => Unit): Int = {
      probe += 1
      val group = s"observed-spec-$probe"
      sc.setJobGroup(group, "job-count probe")
      try f finally sc.clearJobGroup()
      sc.statusTracker.getJobIdsForGroup(group).length
    }
    val in = Seq("a", "b", "c").toDF("name")
    val plain = jobs { Enrich.enrich(in).count() }
    val (out, obs) = Observed.enrichObserved(in)
    val observed = jobs { out.count() }
    assert(observed == plain,
      s"observe must not spawn additional jobs (plain=$plain observed=$observed)")
    assert(obs.get("n_rows") == 3L)
  }
}
