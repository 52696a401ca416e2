package graft.queries

import graft.SparkSpec

/** Pins label propagation against a HAND-DERIVED run on a crafted graph
  * (the mirror-oracle countermeasure: the DuckDB oracle unrolls the same
  * three rounds, so only an independent derivation catches a shared
  * update-rule bug).
  */
class GraphSpec extends SparkSpec {

  test("label propagation matches the hand-derived 3-round run") {
    import spark.implicits._
    // two triangles {1,2,3}, {4,5,6} joined by one bridge 3-4, plus the
    // isolated node 7. Hand derivation (count DESC, label ASC tiebreak):
    //   l1: 1->2, 2->1, 3->1, 4->3, 5->4, 6->4
    //   l2: 1->1, 2->1, 3->1, 4->4, 5->3, 6->3
    //   l3: 1->1, 2->1, 3->1, 4->3, 5->3, 6->3
    // -> communities {1,2,3}=1 and {4,5,6}=3 despite the bridge; 7 stays 7.
    val half = Seq((1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4))
    val und = (half ++ half.map(_.swap)).toDF("src", "dst")
    val nodes = (1 to 7).toDF("node")
    val got = Graph.labelPropOf(und, nodes).collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got === Map(
      1 -> (1, 3L), 2 -> (1, 3L), 3 -> (1, 3L),
      4 -> (3, 3L), 5 -> (3, 3L), 6 -> (3, 3L),
      7 -> (7, 1L)))
  }

  test("converged label propagation matches the hand-derived fixpoint") {
    import spark.implicits._
    // same bridged triangles + isolated node, CLOSED-neighborhood rule:
    //   l1: [1,1,1,3,4,4,7]  (each node votes its own label too)
    //   l2: [1,1,1,4,4,4,7]
    //   l3 = l2 -> stable at round 3
    val half = Seq((1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4))
    val und = (half ++ half.map(_.swap)).toDF("src", "dst")
    val nodes = (1 to 7).toDF("node")
    val (labels, rounds, release) = Graph.labelPropConverged(und, nodes)
    try {
      val got = labels.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(got === Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 4, 5 -> 4, 6 -> 4, 7 -> 7))
      assert(rounds === 3)
    } finally release()
  }

  test("converged label propagation damps the bipartite swap oscillation") {
    import spark.implicits._
    // one edge 1-2: synchronous OPEN-neighborhood LPA swaps the two
    // labels forever (Raghavan et al. §3's oscillation case). The
    // self-vote makes round 1 a tie broken to min(1), round 2 detects
    // the fixpoint.
    val und = Seq((1, 2), (2, 1)).toDF("src", "dst")
    val nodes = Seq(1, 2).toDF("node")
    val (labels, rounds, release) = Graph.labelPropConverged(und, nodes)
    try {
      val got = labels.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(got === Map(1 -> 1, 2 -> 1))
      assert(rounds === 2)
    } finally release()
  }

  test("period-2 attractors are detected and resolved to the elementwise min") {
    import spark.implicits._
    // C4 blinker (the Goles-Olivos period-2 case): from the alternating
    // labeling [1,2,1,2] the synchronous closed-neighborhood update swaps
    // to [2,1,2,1] and back forever. Round 2 must detect labeling ==
    // two-rounds-back and emit the elementwise min = all-1.
    val half = Seq((1, 2), (2, 3), (3, 4), (4, 1))
    val und = (half ++ half.map(_.swap)).toDF("src", "dst")
    val l0 = Seq((1, 1), (2, 2), (3, 1), (4, 2)).toDF("node", "lab")
    val (labels, rounds, release) = Graph.labelPropConvergedFrom(und, l0)
    try {
      val got = labels.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(got === Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 1))
      assert(rounds === 2)
    } finally release()
  }

  test("the converged-LPA oracle's unroll depth has >=2 rounds of margin on the real graph") {
    // the oracle emits LEAST(l_{K-1}, l_K); soundness needs the attractor
    // reached by round K-1 — assert the real corpus converges well inside
    val rounds = Graph.labelPropConvergedRounds(spark, sf0001)
    assert(rounds <= Graph.LpaOracleRounds - 2,
      s"attractor at round $rounds leaves <2 rounds of oracle margin")
  }

  test("k-core peel cascades down a pendant chain and keeps the cycle") {
    import spark.implicits._
    // cycle 1-2-3-4 (all degree 2, survives k=2) with pendant chain
    // 4-5-6-7: each round exposes the next chain node at degree 1, so
    // the cascade takes exactly 3 rounds — the inherently-iterative case
    // a single degree filter gets wrong
    val half = Seq((1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (5, 6), (6, 7))
    val sym = (half ++ half.map(_.swap)).toDF("src", "dst")
    val (core, rounds, release) = Graph.kcoreOf(sym, k = 2)
    try {
      assert(core.collect().map(_.getInt(0)).toSet === Set(1, 2, 3, 4))
      assert(rounds === 3)
    } finally release()
  }

  test("anchored k-core fold equals the from-scratch peel, entering AND cascading") {
    import spark.implicits._
    // standing graph: cycle 1-2-3-4 (its 2-core) + isolated chain 5-6-7
    // (peeled away). Batch: edges 5-7 and 4-5 — the new triangle 5-6-7
    // enters the 2-core, and 4-5 now ties it to the standing cycle.
    // The fold must certify the standing core WITHOUT peeling it and
    // admit the entering cascade region.
    val half0 = Seq((1, 2), (2, 3), (3, 4), (4, 1), (5, 6), (6, 7))
    val batch = Seq((5, 7), (4, 5))
    def symOf(es: Seq[(Int, Int)]) =
      (es ++ es.map(_.swap)).toDF("src", "dst")
    val (core0, _, rel0) = Graph.kcoreOf(symOf(half0), k = 2)
    assert(core0.collect().map(_.getInt(0)).toSet === Set(1, 2, 3, 4))
    val symAll = symOf(half0 ++ batch)
    val (folded, _, relF) = Graph.kcoreFoldOf(symAll, core0, k = 2)
    val (scratch, _, relS) = Graph.kcoreOf(symAll, k = 2)
    try {
      val got = folded.collect().map(_.getInt(0)).toSet
      assert(got === scratch.collect().map(_.getInt(0)).toSet)
      assert(got === Set(1, 2, 3, 4, 5, 6, 7))
    } finally { relF(); relS(); rel0() }
  }

  test("anchored fold never peels a standing-core member (monotonicity anchor)") {
    import spark.implicits._
    // adversarial batch: a long pendant tail hung off the standing
    // cycle — every tail node peels away, but the standing 4 must
    // survive untouched even though the tail transiently inflated
    // their degrees
    val half0 = Seq((1, 2), (2, 3), (3, 4), (4, 1))
    val batch = Seq((4, 10), (10, 11), (11, 12))
    def symOf(es: Seq[(Int, Int)]) =
      (es ++ es.map(_.swap)).toDF("src", "dst")
    val (core0, _, rel0) = Graph.kcoreOf(symOf(half0), k = 2)
    val (folded, _, relF) = Graph.kcoreFoldOf(symOf(half0 ++ batch), core0, k = 2)
    try {
      assert(folded.collect().map(_.getInt(0)).toSet === Set(1, 2, 3, 4))
    } finally { relF(); rel0() }
  }

  test("k-core deletion is NOT blast-radius-boundable: one edge unravels the core (why deletions rebuild)") {
    import spark.implicits._
    // an 8-cycle is its own 2-core; removing ONE edge turns it into a
    // path whose ends peel at degree 1, cascading until NOTHING is left —
    // the blast radius of a single deleted edge is the entire core, so
    // no anchored fold exists for deletions (the exact counterexample the
    // kcoreFoldOf scaladoc documents; insertions fold, deletions rebuild)
    val cycle = (1 to 8).map(i => (i, i % 8 + 1))
    def symOf(es: Seq[(Int, Int)]) =
      (es ++ es.map(_.swap)).toDF("src", "dst")
    val (full, _, relF) = Graph.kcoreOf(symOf(cycle), k = 2)
    val (broken, _, relB) = Graph.kcoreOf(symOf(cycle.tail), k = 2)
    try {
      assert(full.count() === 8L, "the intact cycle is its own 2-core")
      assert(broken.count() === 0L,
        "one deleted edge must unravel the entire 2-core")
    } finally { relF(); relB() }
  }

  test("5-core matches a driver brute-force peel on the real graph") {
    val edges = Graph.copurchaseEdges(spark, sf0001, keyMod = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = (edges ++ edges.map(_.swap)).toSeq
    var cur = sym.map(_._1).toSet
    var changed = true
    while (changed) {
      val deg = sym.filter(e => cur(e._1) && cur(e._2))
        .groupBy(_._1).map { case (n, es) => n -> es.size }
      val nxt = cur.filter(n => deg.getOrElse(n, 0) >= Graph.KcoreK)
      changed = nxt != cur
      cur = nxt
    }
    val expDeg = sym.filter(e => cur(e._1) && cur(e._2))
      .groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val got = Graph.graphKcore(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expDeg)
  }

  test("the k-core oracle's unroll depth has >=2 rounds of margin on the real graph") {
    val rounds = Graph.kcoreRounds(spark, sf0001)
    assert(rounds <= Graph.KcoreOracleRounds - 2,
      s"fixpoint at round $rounds leaves <2 rounds of oracle margin")
  }

  test("k-core throws instead of returning a non-core") {
    import spark.implicits._
    val half = Seq((1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (5, 6), (6, 7))
    val sym = (half ++ half.map(_.swap)).toDF("src", "dst")
    intercept[IllegalStateException] {
      Graph.kcoreOf(sym, k = 2, maxRounds = 1)
    }
  }

  test("converged label propagation throws instead of returning unconverged labels") {
    import spark.implicits._
    val half = Seq((1, 2), (2, 3), (3, 4))
    val und = (half ++ half.map(_.swap)).toDF("src", "dst")
    val nodes = (1 to 4).toDF("node")
    intercept[IllegalStateException] {
      Graph.labelPropConverged(und, nodes, maxRounds = 1)
    }
  }
}
