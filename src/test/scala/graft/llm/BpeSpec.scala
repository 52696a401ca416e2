package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BPE trainer's greedy semantics against HAND-COMPUTED merges on
  * a crafted corpus (the mirror-oracle countermeasure: the DuckDB oracle
  * re-learns with the same algorithm, so only an independent hand
  * derivation can catch a shared semantic bug).
  */
class BpeSpec extends SparkSpec {

  private def docs(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // the REAL tokenization entry point — a re-implementation here would
  // keep passing against stale preprocessing if Bpe's cleaning changed
  private def corpus(rows: (Int, String)*) = Bpe.state0Of(docs(rows: _*))

  test("merge table matches the hand-derived greedy run") {
    // doc1 "ababab": pairs (a,b)x3 (b,a)x2; doc2 "abc": (a,b) (b,c)
    // r1: (a,b,4) -> doc1 [ab,ab,ab], doc2 [ab,c]
    // r2: (ab,ab,2) -> doc1 [abab,ab], doc2 [ab,c]
    // r3: counts (abab,ab)=1 (ab,c)=1 -> tiebreak a ASC: (ab,c,1)
    // r4: (abab,ab,1) -> doc1 [ababab]
    val (merges, fin) = Bpe.train(corpus(1 -> "ab ab ab", 2 -> "abc"), 4)
    assert(merges === Seq(
      (1, "a", "b", 4L),
      (2, "ab", "ab", 2L),
      (3, "ab", "c", 1L),
      (4, "abab", "ab", 1L)))
    val states = fin.orderBy("doc_id").collect().map(_.getString(1))
    assert(states === Array("|ababab|", "|abc|"))
  }

  test("runs merge non-overlapping left-to-right (no delimiter consumption)") {
    // "aaaa" with best pair (a,a): greedy gives [aa, aa], NOT [aa, a, a] —
    // the failure mode of a space-separated state representation.
    // "aaaaa" (odd run) gives [aa, aa, a].
    val (merges, fin) = Bpe.train(corpus(1 -> "aaaa", 2 -> "aaaaa"), 1)
    assert(merges === Seq((1, "a", "a", 7L))) // 3 + 4 adjacent pairs
    val states = fin.orderBy("doc_id").collect().map(_.getString(1))
    assert(states === Array("|aa||aa|", "|aa||aa||a|"))
  }

  test("merged tokens participate in later rounds but not their own") {
    // "abab" r1 -> (a,b,2): state [ab, ab]; the new 'ab' token pairs with
    // itself only in round 2, never retroactively within round 1.
    val (merges, _) = Bpe.train(corpus(1 -> "abab"), 2)
    assert(merges === Seq((1, "a", "b", 2L), (2, "ab", "ab", 1L)))
  }

  test("word-boundary variant glues the marker and learns word-aware units") {
    // "to to to" -> [_t,o]x3 ; "stop" -> [_s,t,o,p]
    // pairs: (_t,o)x3, (o,_t)x2, (_s,t), (t,o), (o,p) -> r1: (_t,o,3)
    // after r1: [_to,_to,_to] and [_s,t,o,p] -> r2 pairs: (_to,_to)x2,
    // (_s,t), (t,o), (o,p) -> r2: (_to,_to,2)
    val (merges, fin) = Bpe.train(
      Bpe.state0WordsOf(docs(1 -> "to to to", 2 -> "stop!")), 2)
    assert(merges === Seq((1, "_t", "o", 3L), (2, "_to", "_to", 2L)))
    val states = fin.orderBy("doc_id").collect().map(_.getString(1))
    assert(states === Array("|_to_to||_to|", "|_s||t||o||p|"))
  }

  test("pair exhaustion skips rounds instead of corrupting state") {
    // "ab" merges once then has no pairs; rounds 2-3 must be no-ops with
    // no merge rows emitted (mirrors the oracle's sentinel no-op rounds).
    val (merges, fin) = Bpe.train(corpus(1 -> "ab"), 3)
    assert(merges === Seq((1, "a", "b", 1L)))
    assert(fin.collect().map(_.getString(1)) === Array("|ab|"))
  }

  test("encode reports token counts consistent with char counts") {
    // After any merges: chars = len(state) - 2*tokens, 1 <= chars/token
    // ratio, and tokens never exceed chars.
    val rows = Bpe.bpeEncode(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, nt, ratio) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nt >= 1 && nt <= nc, s"doc ${r.getLong(0)}: $nt tokens vs $nc chars")
      assert(ratio === nc * 1000000L / nt)
    }
  }

  test("checkpoint cadence leaves the merge table bit-identical") {
    // k=50 merges with a cut every 16 through PlanBridge.cutLineage under
    // a RELIABLE checkpoint dir — the k≈10⁴ production shape, executable.
    // The cadence must be invisible to the learned model.
    val docs = graft.Tables.documents(spark, sf0001)
    val (plain, _) = Bpe.train(Bpe.state0Of(docs), 50)
    assert(plain.size === 50, "corpus must sustain 50 distinct merges")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-bpe-ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    try {
      val (cut, fin, release) =
        Bpe.trainCheckpointed(Bpe.state0Of(docs), 50, checkpointEvery = 16)
      assert(cut === plain)
      // the returned state is readable off the last cut...
      assert(fin.count() > 0)
      val written = java.nio.file.Files.walk(ckptDir).iterator()
      val hasRddData = scala.jdk.CollectionConverters
        .IteratorHasAsScala(written).asScala
        .exists(_.getFileName.toString.startsWith("rdd-"))
      assert(hasRddData, s"no reliable checkpoint data written under $ckptDir")
      // ...and release() drops the final cut's blocks + checkpoint files
      release()
    } finally {
      // a null dir resets SparkContext.checkpointDir to None — the shared
      // session must not keep checkpointing for every later suite
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("cleaning strips non-letters and truncates before training") {
    // "A-B a!b" cleans to "abab"; digits-only doc is dropped by the
    // length>=2 filter.
    val (merges, _) = Bpe.train(corpus(1 -> "A-B a!b", 2 -> "12 3"), 1)
    assert(merges === Seq((1, "a", "b", 2L)))
  }
}
