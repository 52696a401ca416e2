package graft.llm

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check for the suffix-ordered span extractor: random small-
  * vocabulary corpora (heavy repetition by construction) against a
  * BRUTE-FORCE driver mirror that compares every suffix pair directly —
  * fully independent of both the doubling ranks and the oracle's
  * suffix-sort formulation, so a bug shared by the two SQL-ish forms
  * still gets caught. (Raw scalacheck generators from fixed seeds — the
  * scalatest bridge artifact isn't in the offline dependency set.)
  */
class SuffixDedupPropSpec extends SparkSpec {
  import spark.implicits._

  // 3-word vocabulary + 6-14-word docs ⇒ many ≥5-word repeats across and
  // within docs; occasional empty docs exercise the ""-token edge
  private val corpusGen: Gen[List[String]] =
    Gen.nonEmptyListOf(
      Gen.chooseNum(0, 14).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("u", "v", "w")).map(_.mkString(" "))))
      .map(_.take(7))

  private def sample(i: Long): List[String] =
    corpusGen.apply(Gen.Parameters.default, Seed(i)).get

  /** O(n²·len) reference: per position, max common prefix against every
    * OTHER suffix in the corpus; intervals ≥ MinSpan merged per doc.
    */
  private def brute(texts: Seq[String]): Seq[(Long, Long, Long, Long)] = {
    val ws = texts.zipWithIndex.map { case (t, i) => (i.toLong, t.split(" ", -1).toSeq) }
    val sufs = for ((id, w) <- ws; p <- 1 to w.length) yield (id, p, w.drop(p - 1))
    def lcp(a: Seq[String], b: Seq[String]): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val spans = for {
      (id, p, s) <- sufs
      ext = sufs.collect { case (id2, p2, s2) if (id2, p2) != (id, p) => lcp(s, s2) }
        .foldLeft(0)(math.max)
      if ext >= SuffixDedup.MinSpan
    } yield (id, p.toLong, p.toLong + ext - 1)
    spans.groupBy(_._1).toSeq.flatMap { case (id, sp) =>
      val sorted = sp.map(x => (x._2, x._3)).sortBy(_._1)
      val merged = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (acc @ ((cs, ce) :: rest), (s, e)) =>
          if (s <= ce + 1) (cs, math.max(ce, e)) :: rest else (s, e) :: acc
        case (Nil, (s, e)) => List((s, e))
      }.reverse
      merged.map { case (s, e) => (id, s, e, e - s + 1) }
    }.sortBy(x => (x._1, x._2))
  }

  test("random corpora: spans equal the brute-force all-pairs reference") {
    for (seed <- 1L to 8L) {
      val texts = sample(seed)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = SuffixDedup.dupSpansExactOf(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got === brute(texts), s"seed $seed, corpus $texts")
    }
  }
}
