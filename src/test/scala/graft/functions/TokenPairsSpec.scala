package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the native TokenPairs expression against the builtin
  * split/transform/element_at chain it replaced — on crafted edge states
  * and on both BPE tokenizations of the real corpus.
  */
class TokenPairsSpec extends SparkSpec {
  import spark.implicits._

  private def builtinPairs(df: DataFrame): Seq[(String, String, Long)] =
    df.select(expr("split(substring(state, 2, length(state) - 2), '\\\\|\\\\|')").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))")).as("p"))
      .groupBy("p.a", "p.b").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted

  private def nativePairs(df: DataFrame): Seq[(String, String, Long)] =
    df.select(explode(VectorExpressions.token_pairs(col("state"))).as("p"))
      .groupBy("p.a", "p.b").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted

  test("native == builtin on crafted edge states") {
    val states = Seq(
      "|a||b|",          // minimal pair
      "|ab|",            // single token -> no pairs
      "|a||a||a||a|",    // run: overlapping adjacencies all counted
      "|_th||e||_c|",    // marked word-boundary tokens
      "|abab||ab|",      // merged multi-char tokens
      "|a||b||c||a||b|") // repeats across positions
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "state")
    assert(nativePairs(states) === builtinPairs(states))
    assert(nativePairs(states).nonEmpty)
  }

  private def builtinWordPairs(df: DataFrame): Seq[(String, String, Long)] =
    df.select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))")).as("p"))
      .groupBy("p.a", "p.b").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted

  private def nativeWordPairs(df: DataFrame): Seq[(String, String, Long)] =
    df.select(explode(VectorExpressions.word_pairs(col("text"))).as("p"))
      .groupBy("p.a", "p.b").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted

  test("word_pairs native == builtin on crafted edge texts") {
    val texts = Seq(
      "a b",            // minimal pair
      "word",           // single word -> no pairs
      "",               // empty -> split yields [""] -> no pairs
      "a  b",           // doubled space: empty token KEPT (limit=-1)
      " a b ",          // leading/trailing space: empty edge tokens kept
      "a a a a",        // run: overlapping adjacencies all counted
      "héllo wörld déjà", // multi-byte UTF-8 never contains 0x20
      "x y z x y")      // repeats across positions
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    assert(nativeWordPairs(texts) === builtinWordPairs(texts))
    assert(nativeWordPairs(texts).nonEmpty)
  }

  test("word_pairs native == builtin on the real corpus") {
    val docs = graft.Tables.documents(spark, sf0001).select("doc_id", "text")
    assert(nativeWordPairs(docs) === builtinWordPairs(docs))
    assert(nativeWordPairs(docs).nonEmpty)
  }

  test("native == builtin on both corpus tokenizations after merges") {
    val docs = graft.Tables.documents(spark, sf0001)
    for (base <- Seq(
        graft.llm.Bpe.state0Of(docs),
        graft.llm.Bpe.state0WordsOf(docs))) {
      // include a couple of applied merges so multi-char tokens appear
      val (merges, fin) = graft.llm.Bpe.train(base, 2)
      assert(merges.size === 2)
      assert(nativePairs(fin) === builtinPairs(fin))
    }
  }
}
