package graft.llm

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the BPE trainer on random corpora: invariants of
  * greedy merge that hold for EVERY input, independent of the oracle's
  * shared formulas. (Raw scalacheck generators from fixed seeds — the
  * scalatest bridge artifact isn't in the offline dependency set.)
  */
class BpePropSpec extends SparkSpec {
  import spark.implicits._

  // small alphabet + short docs force heavy merging and pair exhaustion
  private val corpusGen: Gen[List[String]] =
    Gen.nonEmptyListOf(
      Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString).map(_.take(12)))
      .map(_.take(8))

  private def sample(i: Long): List[String] =
    "abab" :: corpusGen.apply(Gen.Parameters.default, Seed(i)).get

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("applying the learned merges is idempotent on the final state") {
    // a merge round replaces EVERY |a||b| occurrence, and later merges can
    // only fuse neighbors (never delete tokens between a and b), so no
    // learned pair's adjacency can reappear — re-applying the whole merge
    // table to the final state must be a no-op
    for (seed <- 1L to 5L) {
      val (merges, fin) = Bpe.train(Bpe.state0Of(docs(sample(seed))), 4)
      val once  = fin.orderBy("doc_id").collect().map(_.getString(1))
      val twice = Bpe.applyMerges(fin, merges)
        .orderBy("doc_id").collect().map(_.getString(1))
      assert(once.toSeq === twice.toSeq, s"seed $seed: merges not idempotent")
    }
  }

  test("token mass is conserved: characters never appear or vanish") {
    for (seed <- 1L to 5L) {
      val texts = sample(seed)
      val (_, fin) = Bpe.train(Bpe.state0Of(docs(texts)), 4)
      val got = fin.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1).replace("|", ""))).toMap
      val expect = texts.zipWithIndex
        .map { case (t, i) =>
          i.toLong -> t.toLowerCase.filter(c => c >= 'a' && c <= 'z').take(120)
        }
        .filter(_._2.length >= 2).toMap
      assert(got === expect, s"seed $seed: character mass changed")
    }
  }

  test("merge counts are honest: each round's count equals the state's pair count") {
    // re-count the winning pair in the PRE-merge state independently
    for (seed <- 2L to 4L) {
      val texts = sample(seed)
      var state = Bpe.state0Of(docs(texts))
      val (merges, _) = Bpe.train(state, 3)
      merges.foreach { case (r, a, b, cnt) =>
        val recount = state.collect().map { row =>
          val toks = row.getString(1).stripPrefix("|").stripSuffix("|").split("\\|\\|")
          // ALL adjacent occurrences (the counting side enumerates every
          // adjacency, including overlapping ones in runs — application
          // is what's non-overlapping)
          (0 until toks.length - 1)
            .count(i => toks(i) == a && toks(i + 1) == b).toLong
        }.sum
        assert(recount === cnt, s"seed $seed round $r: count $cnt vs recount $recount")
        state = Bpe.applyMerges(state, Seq((r, a, b, cnt)))
      }
    }
  }
}
