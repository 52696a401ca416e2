package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the fused native n-gram hasher to the builtin formulation it
  * replaces — value-identical arrays (order included) for every n the
  * pipelines use, plus the short-doc / empty / dup-gram edge cases.
  */
class NgramHashSpec extends SparkSpec {
  import spark.implicits._

  private def builtinExpr(n: Int, distinct: Boolean): String = {
    val inner = s"transform(sequence(1, greatest(size(split(t, ' ')) - ${n - 1}, 1)), " +
      s"i -> cast(conv(substring(md5(concat_ws(' ', slice(split(t, ' '), i, $n))), 1, 15), 16, 10) as bigint))"
    if (distinct) s"array_distinct($inner)" else inner
  }

  private val edgeDocs = Seq(
    "one",
    "one two",
    "a b c d e f g",
    "dup dup dup dup dup", // forces distinct collapsing
    "", // empty text -> one gram over ""
    "x  y", // consecutive spaces -> empty word preserved
  ).toDF("t")

  for (n <- Seq(3, 5, 8); distinct <- Seq(true, false)) {
    test(s"native n=$n distinct=$distinct == builtin pipeline (corpus + edges)") {
      val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("text").as("t"))
      val docs = corpus.unionAll(edgeDocs)
      val diff = docs.select(
          VectorExpressions.word_ngram_hashes(col("t"), n, distinct).as("native"),
          expr(builtinExpr(n, distinct)).as("builtin"))
        .filter(not(col("native") === col("builtin")))
        .count()
      assert(diff === 0)
    }
  }
}
