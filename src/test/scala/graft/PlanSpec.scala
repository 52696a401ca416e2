package graft

/** Physical-plan assertions — the 100 TB design contract, enforced:
  * filters reach the parquet scan, projections prune the read schema,
  * fixed-size dims broadcast, global top-k avoids a full sort, and the
  * narrow pipelines don't shuffle.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("filter_pred pushes predicates into the parquet scan") {
    val p = plan("filter_pred")
    // (the toString elides the tail of the list; IsNotNull leading it is
    // enough to prove the scan received pushed filters)
    assert(p.contains("PushedFilters: [IsNotNull"), p)
  }

  test("project_prune reads only the referenced columns") {
    val p = plan("project_prune")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_shipdate"), readSchema)
    assert(!readSchema.contains("l_tax"), readSchema)
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan("topk_global")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("enrichment is a pure map stage — zero exchanges before the sink sort") {
    val p = graft.etl.Enrich.enrich(Tables.customer(spark, sf0001), "c_name")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("win_sessionize plans both window frames over a single hash exchange") {
    // lag and the running sum share (user_id | ts, event_id) ordering —
    // one hashpartitioning exchange must serve both Window nodes; the
    // only other exchange is the final presentation orderBy (range).
    val p = plan("win_sessionize")
    val hashExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, p)
  }

  test("interval-bucket join plans as a hash/merge equi-join, not a nested loop") {
    val p = plan("join_interval_bucket")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("interval-interval overlap join stays an equi-join, not a nested loop") {
    val p = plan("join_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("win_ewma's eight lag terms share one window pass and one exchange") {
    // all 8 lag() reads use the identical (user_id | ts, event_id) spec —
    // they must collapse into a single Window node over a single hash
    // exchange (the only other exchange is the presentation orderBy)
    val p = plan("win_ewma")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
    assert(p.linesIterator.count(_.trim.startsWith("Window")) <= 2, p)
  }

  test("compaction planner: hierarchical prefix — no corpus-scale per-source window") {
    // the per-source byte prefix decomposes via blockedPrefix: the only
    // window PARTITIONED BY source alone must be the one over the block
    // SUMMARIES (input = a groupBy aggregate, never the corpus); the
    // data-scale window partitions by (source, block). Pin that no
    // Window node has a single bare-source partition spec taking
    // non-aggregated input: every windowspecdefinition with exactly one
    // partition column must sit above the partials aggregate.
    val p = plan("maint_compaction_bins")
    // the local (source, block) window exists…
    assert(p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("__cb_b")), p)
    // …and bins still come out of the same arithmetic (sanity: plan ran)
    assert(p.contains("hashpartitioning"), p)
  }

  test("no accidental cartesian products anywhere in the query surface") {
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$p")
    }
  }

  test("ORC scans get pushdown and pruning like parquet") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-orcplan").toString
    Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").orc(out)
    val p = spark.read.orc(out)
      .filter(col("l_returnflag") === "A")
      .select("l_orderkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag)"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_quantity"), readSchema)
  }

  test("no unpartitioned Window over unbounded input anywhere in the query surface") {
    // An unpartitioned window funnels its whole input through ONE task —
    // the evt_rfm/evt_pareto class of 100 TB scale hazard. The guard scans
    // every registered query's optimized plan (post-EliminateWindowPartitions,
    // so a foldable partition key does not fool it). There is NO whitelist:
    // a window over a provably bounded summary must carry
    // BlockedRank.boundedPartition (with the bound documented at the call
    // site), which is what keeps intentional single-partition passes green.
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .flatMap { name =>
        val lp = SparkEntry.queries(name)(spark, sf0001).queryExecution.optimizedPlan
        val bad = lp.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"unpartitioned Window in: ${offenders.mkString(", ")} — partition it, " +
        "restructure via BlockedRank, or (for a provably bounded summary) " +
        "mark it with BlockedRank.boundedPartition + a documented bound")
  }

  test("the window guard detects an unpartitioned window (positive control)") {
    import org.apache.spark.sql.functions._
    val probe = Tables.customer(spark, sf0001)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("c_custkey")))
    val bad = probe.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(bad.nonEmpty, "the guard's detector must flag a real unpartitioned window")
  }

  // -- ambiguous self-join guard ---------------------------------------
  // When two frames share a lineage, `a("c") === b("c")` resolves only via
  // Spark's dataset-id disambiguation, and the analyzer warns it is
  // "Constructing trivially true equals predicate" when both sides land on
  // the SAME attribute — the predicate silently degenerates and the join
  // becomes a partial cross-match after an innocuous refactor. The repo
  // rule is: rename one side's join columns BEFORE the join (see
  // Similarity.simAnnPq's lut_s/lut_cid). This probe constructs every
  // registered query (join analysis happens eagerly at Dataset.join) with
  // a log appender attached and fails on any such warning.

  private def captureSparkWarnings(body: => Unit): Seq[String] = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.{Configurator, Property}
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val probe = new AbstractAppender(
      "graft-selfjoin-probe", null, null, false, Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("trivially true")) hits.add(m)
      }
    }
    probe.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    // the warning is logged by the Dataset class; make sure WARN passes its
    // level filter regardless of the environment's log config
    val prior = ctx.getConfiguration.getLoggerConfig("org.apache.spark.sql").getLevel
    Configurator.setLevel("org.apache.spark.sql", Level.WARN)
    val rootCfg = ctx.getConfiguration.getRootLogger
    rootCfg.addAppender(probe, Level.WARN, null)
    ctx.updateLoggers()
    try body
    finally {
      rootCfg.removeAppender("graft-selfjoin-probe")
      Configurator.setLevel("org.apache.spark.sql", prior)
      ctx.updateLoggers()
      probe.stop()
    }
    hits.toArray(Array.empty[String]).toSeq
  }

  test("the self-join guard detects a degenerate predicate (positive control)") {
    import org.apache.spark.sql.functions._
    val base = Tables.nation(spark, sf0001).select("n_nationkey", "n_name")
    val derived = base.filter(col("n_nationkey") >= 0)
    val hits = captureSparkWarnings {
      base.join(derived, base("n_nationkey") === derived("n_nationkey")).queryExecution.analyzed
    }
    assert(hits.nonEmpty, "the probe must capture Spark's trivially-true-predicate warning")
  }

  test("no ambiguous self-join predicates anywhere in the query surface") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val hits = captureSparkWarnings {
        SparkEntry.queries(name)(spark, sf0001).queryExecution.analyzed
      }
      if (hits.nonEmpty) Some(s"$name: ${hits.mkString("; ")}") else None
    }
    assert(offenders.isEmpty,
      s"ambiguous self-join predicates (rename one side's columns before joining):\n" +
        offenders.mkString("\n"))
  }

  test("IVF assignment stays an aggregate argmax, not a per-vector window") {
    // ivfAssignTo ships the map-side-combinable max(struct) form — the
    // per-vec_id window alternative was measured 1.6-3x slower at 1e6
    // vectors (ScaleProbe ivf). sim_ann_ivf's plan must therefore carry
    // EXACTLY ONE window (the probe's per-query top-3); a second window
    // means someone regressed the assignment back to the sort form.
    val df = SparkEntry.queries("sim_ann_ivf")(spark, sf0001)
    val p = df.queryExecution.optimizedPlan.toString
    // node lines render as "+- Window [..." (WindowGroupLimit renders
    // without the space-bracket, so the substring can't over-count it)
    val nWindows = p.linesIterator.count(_.contains("Window ["))
    assert(nWindows == 1, s"expected exactly 1 Window (probe top-3), got $nWindows:\n$p")
  }

  test("IVF-PQ: nothing past the encode carries a vector; LUT joins broadcast") {
    // the deployable property of the composed index: posting lists hold
    // 8 PQ code bytes per vector, so the ADC aggregate's input must be
    // scalar-only (codes + decimal LUT distances) — an ArrayType column
    // reaching it means a fp64 vector survived past the encode. The
    // probe-set and LUT joins must be broadcast hash joins (bounded
    // NQueries-scale sides), never a shuffle of the posting lists.
    val df = SparkEntry.queries("sim_ann_ivfpq")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    val adcAggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.aggregateExpressions.exists(_.name == "adc") => a
    }
    assert(adcAggs.nonEmpty, "expected the ADC aggregate in the optimized plan")
    adcAggs.foreach { a =>
      val arrayCols = a.child.output
        .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      assert(arrayCols.isEmpty,
        s"vector columns past the encode: ${arrayCols.map(_.name).mkString(", ")}")
    }
  }

  test("IVF-PQ re-rank: the fetch is a shortlist-bounded id-equi broadcast join") {
    // the deployable property of the re-rank stage: the fp64 vectors are
    // fetched BY ID — the corpus vector table streams past a BROADCAST of
    // the R-row-per-query shortlist (BuildRight), never a shuffle of the
    // corpus onto the shortlist and never a second distance scan. The
    // arn <= R rank filter must sit in the plan, bounding the broadcast
    // side to R rows per query BEFORE the join.
    val df = SparkEntry.queries("sim_ann_ivfpq_rerank")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    val fetch = """BroadcastHashJoin \[cand_id#\d+L?\], \[cand_id#\d+L?\], Inner, BuildRight""".r
    assert(fetch.findFirstIn(p).isDefined,
      s"expected the by-id fetch as BroadcastHashJoin on cand_id with the shortlist built/broadcast:\n$p")
    val bound = """arn#\d+ <= 10""".r
    assert(bound.findFirstIn(p).isDefined,
      s"expected the arn <= R shortlist bound in the plan:\n$p")
  }

  test("zone-fetched re-rank: the probed-cells filter is PUSHED into the zone scan") {
    // the production fetch's whole point: the standing vector zone is
    // cluster-keyed, and the query's probed cells (a bounded literal
    // list by construction) must reach the parquet reader as a pushed
    // In(cluster, …) so row-group stats skip everything outside the
    // probed cells (~nprobe/k of the zone) — a plan where the filter
    // evaluates only post-scan reads the whole zone at 100 TB
    // the zone is the only cluster-columned parquet in the plan, so a
    // FileScan line carrying In(cluster, …) in its PushedFilters IS the
    // pushed probed-cells fetch (the path itself is elided by toString)
    val df = SparkEntry.queries("sim_ann_ivfpq_rerank_zone")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    val zoneScan = p.linesIterator.find(l =>
      l.contains("FileScan parquet") && l.contains("In(cluster"))
    assert(zoneScan.isDefined,
      s"expected the probed-cells In(cluster, …) pushed into the zone scan:\n$p")
  }

  test("forget cascade: the PPJoin runs behind ONE cut, never inside the plan") {
    // forgetSurvivorsOver materializes the verified pair set behind a
    // single lineage cut and derives BOTH the cluster labeling and the
    // affected edges from it (a measured 7.0 s -> 3.0 s win at sf0.1 on
    // forget_audit). A regression back to dedupClusters + jaccardPairs
    // re-inlines the shingle kernel into the query plan — this guard
    // fires on the kernel's presence, pinning the decision like the IVF
    // argmax guard.
    // the PPJoin's signature is the 3-gram DISTINCT shingle call; the
    // audit's span tier legitimately keeps the 8-gram kernel in-plan
    val shingleCall = """graft_word_ngrams60\([^)]*, 3, true\)""".r
    for (q <- Seq("forget_pack", "forget_audit")) {
      val p = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.optimizedPlan.toString
      assert(shingleCall.findFirstIn(p).isEmpty,
        s"$q: the 3-gram shingle kernel re-entered the query plan — the " +
          "PPJoin is no longer behind the shared cut")
    }
  }

  test("whole-stage codegen covers the hot aggregation path") {
    // codegen'd operators render with a "*(stageId)" prefix — but only in
    // the FINAL adaptive plan, so execute before inspecting.
    val df = SparkEntry.queries("agg_sum_q1")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.linesIterator.exists(l => l.contains("HashAggregate") && l.contains("*(")), p)
  }
}
