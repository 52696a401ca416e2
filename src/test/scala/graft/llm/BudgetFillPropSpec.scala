package graft.llm

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check for the token-budget greedy fill on randomized
  * corpora: [[Sampling.budgetFillFlags]]'s keep-set must equal a
  * sequential greedy replay for every seed. This is the DESCENDING-block
  * blockedPrefix path (quality-grid blocks walked high→low), which the
  * ascending-order properties in HierarchicalWindowPropSpec don't
  * exercise — ties on the per-mille grid boundary and single-doc
  * sources included. (Raw scalacheck generators from fixed seeds — the
  * scalatest bridge artifact isn't in the offline dependency set.)
  */
class BudgetFillPropSpec extends SparkSpec {
  import spark.implicits._

  // docs with controlled word counts from a tiny vocabulary: many TTR
  // ties (few distinct ratios), skewed sources, ids sparse
  private val docsGen: Gen[List[(Long, String, String)]] =
    Gen.chooseNum(20, 80).flatMap { n =>
      Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 2000L)
        src <- Gen.frequency(5 -> Gen.const("s0"), 1 -> Gen.oneOf("s1", "s2"))
        nw <- Gen.chooseNum(2, 30)
        ws <- Gen.listOfN(nw, Gen.oneOf("aa", "bb", "cc", "dd"))
      } yield (id, src, ws.mkString(" ")))
    }.map(_.distinctBy(_._1))

  private def sample(i: Long): List[(Long, String, String)] =
    docsGen.apply(Gen.Parameters.default, Seed(i)).get

  test("budgetFillFlags ≡ sequential greedy replay on random corpora") {
    for (seed <- 1L to 8L) {
      val rows = sample(seed)
      val df = rows.toDF("doc_id", "source", "text")
      val got = Sampling.budgetFillFlags(df)
        .select("source", "doc_id", "kept").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(2)).toMap
      val expected = rows.groupBy(_._2).flatMap { case (src, ds) =>
        val scored = ds.map { case (id, _, text) =>
          val ws = text.split(" ")
          val toks = ws.length.toLong
          val q = ws.distinct.length.toLong * 1000000L / toks
          (id, toks, q)
        }
        val tot = scored.map(_._2).sum
        var cum = 0L
        scored.sortBy(d => (-d._3, d._1)).map { case (id, toks, _) =>
          val keep = 2 * cum < tot
          cum += toks
          (src, id) -> keep
        }
      }
      assert(got === expected, s"seed $seed")
    }
  }
}
