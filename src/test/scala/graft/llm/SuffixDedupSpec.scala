package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the suffix-ordered span extractor against hand-derived extents on
  * crafted corpora (the mirror-oracle countermeasure: the DuckDB oracle
  * independently sorts real suffixes, but only a hand derivation catches a
  * bug shared by both formulations of the interval algebra), plus the
  * native LCP kernel against hand values.
  */
class SuffixDedupSpec extends SparkSpec {

  test("graft_suffix_lcp matches hand-computed values") {
    import spark.implicits._
    val df = Seq(
      // (w1, p1, w2, p2, expected)
      (Seq("x", "a", "b", "c"), 2L, Seq("y", "y", "a", "b", "d"), 3L, 2L),
      (Seq("a", "b"), 1L, Seq("a", "b"), 1L, 2L),       // identical to end
      (Seq("a", "b", "c"), 2L, Seq("b", "c", "z"), 1L, 2L), // prefix-of
      (Seq("a"), 1L, Seq("b"), 1L, 0L),                 // immediate mismatch
      (Seq("a"), 5L, Seq("a"), 1L, 0L),                 // out-of-range start
      (Seq("a"), 4294967297L, Seq("a"), 1L, 0L))        // 2^32+1: long range-check, no int truncation
      .toDF("w1", "p1", "w2", "p2", "want")
    val got = df.select(graft.functions.VectorExpressions
        .suffix_lcp(col("w1"), col("p1"), col("w2"), col("p2")).as("lcp"),
        col("want"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("suffix-grade spans match hand-derived extents; sub-threshold runs excluded") {
    import spark.implicits._
    // docs 1/2 share the 5-word run "a b c d e" at positions 2-6 / 3-7 —
    // INVISIBLE to the width-8 gram tier, exactly the gap this operator
    // closes. docs 3/4 share only a 4-word run (below MinSpan=5): they
    // must be pruned by the candidate pass and produce no spans.
    val docs = Seq(
      (1L, "x1 a b c d e y1 y2"),
      (2L, "x2 x3 a b c d e z1"),
      (3L, "p q r s t1 t2"),
      (4L, "p q r s u1 u2"))
      .toDF("doc_id", "text")
    val got = SuffixDedup.dupSpansExactOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 2L, 6L, 5L), (2L, 3L, 7L, 5L)))
  }

  test("exact-duplicate docs report the full document as one span") {
    import spark.implicits._
    // identical 6-word docs: every suffix pair is identical-to-end — the
    // fixpoint path where rank equality never resolves; extents must
    // still come out exact (full doc) and merge to one span each
    val docs = Seq(
      (1L, "m n o p q r"),
      (2L, "m n o p q r"))
      .toDF("doc_id", "text")
    val got = SuffixDedup.dupSpansExactOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 1L, 6L, 6L), (2L, 1L, 6L, 6L)))
  }

  test("compositeRank: pair-ranking fallback is order-equivalent to arithmetic packing") {
    import spark.implicits._
    // crafted (doc_id, p, r, r2) rounds frame with null r2 (end-of-doc),
    // ties on r, and reversed insert order — everything the composite
    // must order by (r asc, r2 asc nulls-as-0)
    val joined = Seq(
      (1L, 1L, 5L, Some(2L)),
      (1L, 2L, 5L, None),
      (1L, 3L, 2L, Some(7L)),
      (2L, 1L, 2L, Some(1L)),
      (2L, 2L, 7L, Some(7L)),
      (2L, 3L, 2L, None))
      .toDF("doc_id", "p", "r", "r2")
    val k = 7L
    def order(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.orderBy(col("r"), col("doc_id"), col("p"))
        .select("doc_id", "p").as[(Long, Long)].collect().toSeq
    val arith = SuffixDedup.compositeRank(joined, k) // k <= arithMax: packing
    val pair = SuffixDedup.compositeRank(joined, k, arithMax = 0L) // forced fallback
    assert(order(arith) === order(pair))
    // the fallback is additionally DENSE: ranks are 1..#distinct pairs
    val pr = pair.select("r").distinct().as[Long].collect().sorted
    assert(pr.toSeq === (1L to pr.length))
  }
}
