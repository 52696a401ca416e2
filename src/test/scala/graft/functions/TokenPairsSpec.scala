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
