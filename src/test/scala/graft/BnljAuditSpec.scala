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
    val findings = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      BnljAudit.audit(name,
        SparkEntry.queries(name)(spark, sf0001).queryExecution.sparkPlan)
    }
    val tally = findings.flatMap(_.verdict)
      .groupBy(identity).view.mapValues(_.size).toMap
    info(s"BNLJs classified: ${findings.size} — $tally")
    assert(findings.nonEmpty,
      "expected a nonzero BNLJ population (the scalar-attach pattern)")
    val bad = findings.filter(f =>
      f.verdict.isEmpty && !BnljAudit.CalibrationExempt(f.query))
    assert(bad.isEmpty, bad.map(f => s"${f.query}:\n${f.plan}")
      .mkString("unclassifiable BNLJ broadcast sides:\n", "\n---\n", ""))
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
