package graft.queries

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check for the iterative k-core peel against a brute-force
  * driver peel on randomized graphs: the operator's claim is exact
  * set-identity of the surviving nodes at the fixpoint, so any
  * divergence on any seed is a bug. (Raw scalacheck generators from
  * fixed seeds — the scalatest bridge artifact isn't in the offline
  * dependency set.)
  */
class KcorePropSpec extends SparkSpec {
  import spark.implicits._

  // random sparse-ish graphs over ≤26 nodes: dense pockets + fringe so
  // the peel has to cascade, self-loops excluded by construction
  private val edgesGen: Gen[List[(Int, Int)]] =
    Gen.chooseNum(10, 60).flatMap { n =>
      Gen.listOfN(n, for {
        a <- Gen.chooseNum(0, 25)
        d <- Gen.chooseNum(1, 25)
      } yield (a, (a + d) % 26))
    }.map(_.distinct)

  private def sample(i: Long): List[(Int, Int)] =
    edgesGen.apply(Gen.Parameters.default, Seed(i)).get

  private def brutePeel(sym: Seq[(Int, Int)], k: Int): Set[Int] = {
    var cur = sym.map(_._1).toSet
    var changed = true
    while (changed) {
      val deg = sym.filter(e => cur(e._1) && cur(e._2))
        .groupBy(_._1).map { case (n, es) => n -> es.size }
      val nxt = cur.filter(n => deg.getOrElse(n, 0) >= k)
      changed = nxt != cur
      cur = nxt
    }
    cur
  }

  test("kcoreOf ≡ brute-force peel on random graphs for k in {2, 3}") {
    for (seed <- 1L to 6L; k <- Seq(2, 3)) {
      val half = sample(seed)
      val sym = (half ++ half.map(_.swap)).distinct
      val und = sym.toDF("src", "dst")
      val (core, _, release) = Graph.kcoreOf(und, k)
      try {
        val got = core.collect().map(_.getInt(0)).toSet
        assert(got === brutePeel(sym, k), s"seed $seed k $k")
      } finally release()
    }
  }

  test("anchored fold ≡ from-scratch peel on random graphs and random splits") {
    // the incremental claim's property form: for ANY standing/batch
    // split of ANY graph, folding the batch against the standing core
    // must equal peeling the union from scratch — the monotonicity
    // anchor is only sound if this holds on every seed, not just the
    // crafted entering/pendant cases in GraphSpec
    for (seed <- 1L to 5L; k <- Seq(2, 3)) {
      val half = sample(seed)
      // deterministic per-seed split: ~1/3 of edges arrive as the batch
      val (batch, standing) = half.zipWithIndex.partition {
        case (_, i) => (i + seed) % 3 == 0
      } match { case (b, s) => (b.map(_._1), s.map(_._1)) }
      if (standing.nonEmpty) {
        def symOf(es: Seq[(Int, Int)]) =
          (es ++ es.map(_.swap)).distinct.toDF("src", "dst")
        val symAll = (half ++ half.map(_.swap)).distinct
        val (core0, _, rel0) = Graph.kcoreOf(symOf(standing), k)
        val (folded, _, relF) = Graph.kcoreFoldOf(symOf(half), core0, k)
        try {
          val got = folded.collect().map(_.getInt(0)).toSet
          assert(got === brutePeel(symAll, k),
            s"seed $seed k $k standing=${standing.size} batch=${batch.size}")
        } finally { relF(); rel0() }
      }
    }
  }
}
