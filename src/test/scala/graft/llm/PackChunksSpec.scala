package graft.llm

import graft.SparkSpec

/** Loader-contract invariants of `pack_chunks` — the per-(doc, window)
  * fragment rows an attention-mask builder consumes. The cross-engine
  * hash pins the values; these pin the CONTRACT a loader relies on:
  * fragments reassemble each doc exactly, straddle continuation starts
  * at window offset 0, and each window is tiled contiguously.
  */
class PackChunksSpec extends SparkSpec {

  private val B = Sampling.PackBudget.toLong

  private lazy val rows = Sampling.packChunks(spark, sf0001)
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))

  test("fragments reassemble each document: contiguous spans summing to toks") {
    val toks = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS LONG) AS toks")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.groupBy(_._3)
    assert(byDoc.keySet === toks.keySet, "every doc must emit fragments")
    byDoc.foreach { case (doc, frs) =>
      val sorted = frs.sortBy(_._4).toSeq
      assert(sorted.map(_._5).sum === toks(doc), s"doc $doc frag_len sum")
      assert(sorted.head._4 === 0L, s"doc $doc first fragment starts at 0")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._4 === a._4 + a._5, s"doc $doc fragments must be contiguous")
        case _ =>
      }
    }
  }

  test("straddle continuations start at window offset 0 in the NEXT bin") {
    rows.groupBy(_._3).foreach { case (doc, frs) =>
      val sorted = frs.sortBy(_._4).toSeq
      sorted.zipWithIndex.foreach { case ((_, bin, _, start, _, off), i) =>
        if (i == 0) assert(start === 0L)
        else {
          assert(off === 0L, s"doc $doc continuation fragment offset")
          assert(bin === sorted(i - 1)._2 + 1, s"doc $doc bins consecutive")
        }
      }
    }
  }

  test("each (lang, bin) window is tiled contiguously; full except the last per lang") {
    val byBin = rows.groupBy(r => (r._1, r._2))
    val lastBin = rows.groupBy(_._1).map { case (l, rs) => l -> rs.map(_._2).max }
    byBin.foreach { case ((lang, bin), frs) =>
      val sorted = frs.sortBy(_._6).toSeq
      assert(sorted.head._6 === 0L, s"($lang,$bin) window must start at 0")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._6 === a._6 + a._5, s"($lang,$bin) window tiles contiguously")
        case _ =>
      }
      val filled = sorted.last._6 + sorted.last._5
      if (bin < lastBin(lang))
        assert(filled === B, s"($lang,$bin) non-final window must be full")
      else assert(filled <= B, s"($lang,$bin) final window within budget")
    }
  }

  test("first fragment agrees with pack_offsets' per-doc offset") {
    val off = Sampling.packOffsets(spark, sf0001)
      .select("doc_id", "bin", "offset_in_bin")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_._3).foreach { case (doc, frs) =>
      val first = frs.minBy(_._4)
      assert((first._2, first._6) === off(doc), s"doc $doc first fragment placement")
    }
  }

  test("epoch serve order: each epoch is a permutation of all windows; epochs reshuffle") {
    val srows = Sampling.packEpochOrder(spark, sf0001).collect()
    val byEpoch = srows.groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet === Set(0, 1, 2))
    val windowSets = byEpoch.map { case (_, rs) =>
      // ranks are exactly 1..n_windows — a permutation, no gap, no dup
      val ranks = rs.map(_.getAs[Long]("serve_rank")).sorted.toSeq
      assert(ranks === (1L to rs.length.toLong))
      assert(rs.forall(_.getAs[Long]("n_windows") == rs.length.toLong))
      rs.map(r => (r.getAs[String]("lang"), r.getAs[Long]("bin"))).toSet
    }.toSeq
    // every epoch serves the SAME window set...
    assert(windowSets.distinct.length === 1)
    // ...in a DIFFERENT order (the per-epoch reshuffle is real)
    def order(e: Int): Seq[(String, Long)] = byEpoch(e)
      .sortBy(_.getAs[Long]("serve_rank"))
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bin"))).toSeq
    assert(order(0) !== order(1))
    assert(order(1) !== order(2))
  }
}
