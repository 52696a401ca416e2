package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The script tier's survival contract — what the oracled
  * `text_script_coverage` counts, pinned at the mechanism level: a
  * non-Latin document yields NOTHING through the `[a-z]` normalization
  * every trained tokenizer currently uses (so it silently falls out of
  * fertility/packing/curation), yields real word types through the
  * script-aware path, and the EXISTING unigram trainer runs unchanged on
  * those types (the trainer is alphabet-agnostic past normalization —
  * only the normalization was Latin-bound).
  */
class ScriptSpec extends SparkSpec {

  private def docsOf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  // planted transliterations of "the cat sat on the mat"
  private val cyr = "тхе цат сат он тхе мат"
  private val cjk = "的一是不了人我在有他这中"  // spaceless, per-char tokens
  private val arab = "اثب جاث باث"

  test("the [a-z] pipeline drops non-Latin docs entirely; the aware path keeps them") {
    for (doc <- Seq(cyr, cjk, arab)) {
      assert(Unigram.wordCountsOf(docsOf(doc)).count() === 0L,
        s"the Latin path must (demonstrably) lose: $doc")
      assert(Script.wordCountsAware(docsOf(doc)).count() > 0L,
        s"the aware path must keep: $doc")
    }
    // CJK tokenizes per char: 12 chars -> 12 word occurrences, one type each
    val cjkTypes = Script.wordCountsAware(docsOf(cjk))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(cjkTypes.keys.forall(_.length == 1) && cjkTypes.size === 12)
    // mixed-script doc: both halves tokenize
    val mixed = Script.wordCountsAware(docsOf("hello мир 的一"))
      .collect().map(_.getString(0)).toSet
    assert(mixed === Set("hello", "мир", "的", "一"))
  }

  test("a non-Latin corpus survives the downstream gate it used to fall out of: the trainer itself") {
    // the unigram trainer over AWARE word counts of a Cyrillic corpus:
    // segmentation total (np >= 1 per type), pieces are Cyrillic
    val (vocab, wordNp) = Unigram.trainOver(Script.wordCountsAware(docsOf(
      cyr, "тхе цатс сат", "мат мат мат")))
    assert(wordNp.nonEmpty && wordNp.forall { case (w, _, np) => np >= 1 && np <= w.length })
    // M-step conservation holds on the non-Latin alphabet too: total
    // piece occurrences == sum over word types of cw * np
    assert(vocab.map(_._2).sum === wordNp.map { case (_, cw, np) => cw * np }.sum)
    assert(vocab.forall { case (p, _) => p.forall(c => Script.Cyr.contains(c)) })
  }

  test("latin text is untouched by the aware path (same tokens as the Latin pipeline)") {
    val texts = Seq("The cat sat on the mat", "Pack my box with five dozen jugs")
    val aware = Script.wordCountsAware(docsOf(texts: _*))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val latin = Unigram.wordCountsOf(docsOf(texts: _*))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(aware === latin)
  }
}
