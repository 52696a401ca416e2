package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the relevance/indexing tier (the oracle pins
  * exact values; these pin the math's meaning).
  */
class RelevanceSpec extends SparkSpec {

  test("tfidf: every doc gets exactly 3 ranked terms with positive idf ordering") {
    val out = Relevance.tfidf(spark, sf0001).cache()
    val perDoc = out.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") =!= 3).count() == 0)
    // rank 1 score >= rank 3 score within every doc
    val flip = out.groupBy("doc_id")
      .agg(min(when(col("rn") === 1, col("score"))).as("s1"),
           max(when(col("rn") === 3, col("score"))).as("s3"))
      .filter(col("s1") < col("s3"))
    assert(flip.count() == 0)
    out.unpersist()
  }

  test("bm25: docs without any query term score 0; scores are non-negative") {
    val docs = graft.Tables.documents(spark, sf0001)
    val noTerm = docs.filter(
      !Relevance.Bm25Terms.map(t =>
        array_contains(split(col("text"), " "), t)).reduce(_ || _))
      .select("doc_id")
    val out = Relevance.bm25(spark, sf0001)
    val nonzeroWithoutTerms = out.join(noTerm, "doc_id")
      .filter(col("bm25") =!= 0.0)
    assert(nonzeroWithoutTerms.count() == 0)
    assert(out.filter(col("bm25") < 0.0).count() == 0)
  }

  test("postings: sum of df equals distinct (doc,word) pairs; span valid") {
    val out = Relevance.postings(spark, sf0001).cache()
    val pairs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .distinct().count()
    val dfSum = out.agg(sum("df")).head().getLong(0)
    assert(dfSum == pairs)
    assert(out.filter(col("doc_min") > col("doc_max")).count() == 0)
    out.unpersist()
  }

  test("drift psi: contributions are 0 iff proportions match, else positive-summed") {
    val out = Relevance.driftPsi(spark, sf0001).cache()
    // PSI per-bin contribution (pa-pb)*ln(pa/pb) is always >= 0
    assert(out.filter(col("psi") < 0.0).count() == 0)
    // proportions are distributions: each side sums to ~1 over surviving bins
    val sums = out.agg(sum("pa").as("sa"), sum("pb").as("sb")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 0.01)
    assert(math.abs(sums.getDouble(1) - 1.0) < 0.01)
    out.unpersist()
  }
}
