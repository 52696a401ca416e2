package graft

/** The executable BNLJ-boundedness guard: every
  * BroadcastNestedLoopJoin in EVERY registered query's physical plan
  * must classify as broadcast-side-bounded under [[BnljAudit]]'s
  * registered taxonomy (aggregate / limit / bounded-dim leaves /
  * registered bounded filter). This replaces the per-round human
  * re-adjudication of the BNLJ population in PLANS.md — a new plan
  * broadcasting an unbounded side fails HERE, with the query name and
  * the offending subtree, before any artifact ships.
  *
  * sparkPlan (pre-exchange) on purpose: BNLJ children are direct, no
  * ReusedExchange indirection, and no execution is needed — iterative
  * trainers still run their eager rounds at construction, which the
  * suite already pays in NonEmptySpec and memoizes across specs.
  */
class BnljAuditSpec extends SparkSpec {

  test("every BNLJ broadcast side classifies as bounded") {
    // also audit STAGED plans — the pre-cut stages of queries that run
    // work behind PlanBridge.cutLineage (their registered plan is a bare
    // Scan ExistingRDD, the judge-caught audit blind spot). Cuts run at
    // construction; fingerprint-keyed memos mean a warmed trainer's cut
    // may have been captured under an earlier suite's build — what
    // appears here is exactly the work this JVM actually staged.
    org.apache.spark.sql.graft.PlanBridge.captureStagedPlans.set(true)
    org.apache.spark.sql.graft.PlanBridge.drainStagedPlans() // clear residue
    var stagedPlans = 0
    val (findings, stagedFindings) =
      SparkEntry.queries.keys.toSeq.sorted.foldLeft(
        (Seq.empty[BnljAudit.Finding], Seq.empty[BnljAudit.Finding])) {
        case ((live, stg), name) =>
          val qp = SparkEntry.queries(name)(spark, sf0001)
            .queryExecution.sparkPlan
          val staged = org.apache.spark.sql.graft.PlanBridge.drainStagedPlans()
          stagedPlans += staged.size
          (live ++ BnljAudit.audit(name, qp),
            stg ++ staged.flatMap { case (site, p) =>
              BnljAudit.audit(s"$name [staged $site]", p) })
      }
    org.apache.spark.sql.graft.PlanBridge.captureStagedPlans.set(false)
    val tally = (findings ++ stagedFindings).flatMap(_.verdict)
      .groupBy(identity).view.mapValues(_.size).toMap
    info(s"BNLJs classified: ${findings.size} live + ${stagedFindings.size} " +
      s"in $stagedPlans staged (pre-cut) plans — $tally")
    assert(stagedPlans > 0,
      "expected staged-plan coverage: lineage-cutting queries (e.g. " +
        "text_unigram_sweep) must surface their pre-cut stages to this audit")
    assert(findings.nonEmpty,
      "expected a nonzero BNLJ population (the scalar-attach pattern)")
    val bad = findings.filter(f =>
      f.verdict.isEmpty && !BnljAudit.CalibrationExempt(f.query))
    assert(bad.isEmpty, bad.map(f => s"${f.query}:\n${f.plan}")
      .mkString("unclassifiable BNLJ broadcast sides:\n", "\n---\n", ""))
    // staged plans obey the same boundedness contract (no staged query
    // is calibration-exempt: the exempt brute-force tiers never cut)
    val badStaged = stagedFindings.filter(_.verdict.isEmpty)
    assert(badStaged.isEmpty, badStaged.map(f => s"${f.query}:\n${f.plan}")
      .mkString("unclassifiable STAGED BNLJ broadcast sides:\n", "\n---\n", ""))
    // the exemption list stays honest both ways: every exempt query
    // still exists AND still NEEDS its exemption (a stale entry would
    // silently sanction a future unbounded broadcast under that name)
    val stillUnbounded = findings.filter(_.verdict.isEmpty).map(_.query).toSet
    assert(BnljAudit.CalibrationExempt.subsetOf(SparkEntry.queries.keySet))
    assert(BnljAudit.CalibrationExempt === stillUnbounded,
      s"exemption list out of date: registered ${BnljAudit.CalibrationExempt}, " +
        s"actually unbounded $stillUnbounded")
  }
}
