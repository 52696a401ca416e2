package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crafted-corpus semantics of the unigram-LM trainer — the edges the
  * synthetic corpus (31 word types, max 8 chars at sf0.01) never
  * exercises, plus the structural invariants every trained model must
  * hold. The full-table cross-engine gate is the DuckDB oracle
  * (`text_unigram_train` re-learns the whole schedule from raw text);
  * this spec pins behavior the oracle exercises only implicitly.
  */
class UnigramSpec extends SparkSpec {

  private def wordsOf(texts: String*) = {
    import spark.implicits._
    Unigram.wordCountsOf(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
  }

  test("structural invariants of a trained model") {
    val (vocab, wordNp) = Unigram.trainOver(wordsOf(
      "the cat sat on the mat", "the cats sat", "concatenation matters",
      "a minimal corpus with repeated the the the"))
    // piece lengths bounded; single chars of the corpus all survive
    assert(vocab.forall { case (p, _) => p.nonEmpty && p.length <= Unigram.MaxPieceLen })
    val corpusChars = "thecatsonmatconcatenationmattersaminimalcorpuswithrepeated".toSet
    val vocabChars = vocab.collect { case (p, _) if p.length == 1 => p.head }.toSet
    assert(corpusChars.subsetOf(vocabChars),
      s"missing single chars: ${corpusChars -- vocabChars}")
    // multi-char inventory respects the prune budget
    assert(vocab.count(_._1.length >= 2) <= Unigram.KeepMulti)
    // segmentation totality: every word type got segmented, with np
    // between ceil(len/4) and len
    val np = wordNp.map { case (w, _, n) => w -> n }.toMap
    assert(np.keySet.contains("concatenati")
      || np.keySet.contains("concatenatio")) // truncated to MaxWordLen
    np.foreach { case (w, n) =>
      assert(n >= (w.length + Unigram.MaxPieceLen - 1) / Unigram.MaxPieceLen
        && n <= w.length, s"$w segmented into $n pieces")
    }
    // M-step conservation: total piece occurrences = sum over word
    // types of cw * np
    assert(vocab.map(_._2).sum === wordNp.map { case (_, cw, n) => cw * n }.sum)
  }

  test("a dominant repeated bigram is learned and used") {
    // 'ababab' x 6, 'cd' x 1: the seed's top multi pieces are ab-family;
    // the best segmentation of ababab must use multi-char pieces (np <= 3,
    // never 6 chars), and 'ab' must survive both prunes with count > 0
    val (vocab, wordNp) = Unigram.trainOver(wordsOf(
      "ababab ababab ababab", "ababab ababab ababab cd"))
    val np = wordNp.map { case (w, _, n) => w -> n }.toMap
    assert(np("ababab") <= 3, s"ababab segmented into ${np("ababab")} pieces")
    assert(np("cd") <= 2)
    val ab = vocab.find(_._1 == "ab")
    assert(ab.exists(_._2 > 0L) || vocab.exists(p => p._1 == "abab" && p._2 > 0L),
      s"no ab-family piece carries final count: $vocab")
  }

  test("truncation, 1-char words, and char-fallback segmentation") {
    val (vocab, wordNp) = Unigram.trainOver(wordsOf(
      "q q q supercalifragilistic xyz"))
    val np = wordNp.map { case (w, _, n) => w -> n }.toMap
    // 20-char word trains as its 12-char prefix
    assert(np.contains("supercalifra") && !np.keySet.exists(_.length > 12))
    // a 1-char word segments as itself
    assert(np("q") === 1L)
    // xyz: its substrings are rare; whatever survives, segmentation
    // stays total via single chars
    assert(np("xyz") >= 1L && np("xyz") <= 3L)
    assert(Seq("x", "y", "z").forall(c => vocab.exists(_._1 == c)))
  }

  test("training is deterministic across invocations") {
    val mk = () => Unigram.trainOver(wordsOf(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs"))
    val (v1, n1) = mk()
    val (v2, n2) = mk()
    assert(v1.sortBy(_._1) === v2.sortBy(_._1))
    assert(n1.sortBy(_._1) === n2.sortBy(_._1))
  }
}
