package graft.llm

import graft.SparkSpec
import graft.operators.ConnectedComponents
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized property check for the forget cascade: over corpora built
  * from a small shared-block pool (so the near-dup graph is random —
  * chains, stars, dense clumps, singletons) and random delete subsets
  * (including empty and cluster-killing ones), the incremental
  * re-adjudication must equal a from-scratch rebuild EVERY time. This is
  * the ConnectedComponents property-sim discipline applied to the
  * cascade: the sf0.001 fixture exercises one graph; the randomized runs
  * exercise the shapes it happens not to contain (mid-chain splits,
  * whole-cluster deletion, canonical-only survival).
  */
class ForgetPropSpec extends SparkSpec {

  private def block(i: Int): String =
    (1 to 16).map(w => s"b${i}w$w").mkString(" ")

  private def docsOf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def delOf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  private def rowsOf(df: DataFrame): Set[(Long, Long, String, Option[Long], String, Boolean)] =
    df.collect().map(r => (
      r.getAs[Long]("doc_id"), r.getAs[Long]("old_cluster"),
      r.getAs[String]("old_state"),
      Option(r.getAs[java.lang.Long]("new_cluster")).map(_.longValue),
      r.getAs[String]("new_state"), r.getAs[Boolean]("readmitted"))).toSet

  /** The rebuild reference: global components over the FILTERED corpus's
    * pair graph, projected like the cascade's output, restricted to
    * affected old clusters — independent of the incremental path.
    */
  private def rebuildExpected(docs: DataFrame, del: DataFrame): DataFrame = {
    val before = ConnectedComponents.components(Forget.blockPairsOf(docs))
      .select(col("node").as("doc_id"), col("component").as("old_cluster"))
    val survivors = docs.join(del, Seq("doc_id"), "left_anti")
    val rebuilt = ConnectedComponents.components(Forget.blockPairsOf(survivors))
      .select(col("node").as("doc_id"), col("component").as("kept_cluster"))
    val affected = before.join(del, Seq("doc_id"), "left_semi")
      .select("old_cluster").distinct()
    before.join(affected, Seq("old_cluster"))
      .join(del.select(col("doc_id"), lit(true).as("is_del")), Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("old_cluster"),
        when(col("doc_id") === col("old_cluster"), lit("canonical"))
          .otherwise(lit("loser")).as("old_state"),
        when(col("is_del"), lit(null).cast("long"))
          .otherwise(coalesce(col("kept_cluster"), col("doc_id"))).as("new_cluster"),
        when(col("is_del"), lit("deleted"))
          .when(coalesce(col("kept_cluster"), col("doc_id")) === col("doc_id"),
            lit("canonical"))
          .otherwise(lit("loser")).as("new_state"))
      .withColumn("readmitted",
        col("old_state") === "loser" && col("new_state") === "canonical")
  }

  test("requalify: incremental equals rebuild across randomized corpora") {
    val rnd = new scala.util.Random(4242)
    var sawReadmission = false
    var sawSplit = false
    for (_ <- 1 to 12) {
      val nDocs = 6 + rnd.nextInt(20)
      val pool = 3 + rnd.nextInt(8)
      val docs = docsOf((1L to nDocs.toLong).map { id =>
        val nb = 1 + rnd.nextInt(3)
        (id, (1 to nb).map(_ => block(rnd.nextInt(pool))).mkString(" "))
      })
      val del = delOf((1L to nDocs.toLong).filter(_ => rnd.nextDouble() < 0.3))
      val got = rowsOf(Forget.requalifyOver(docs, del))
      val want = rowsOf(rebuildExpected(docs, del))
      assert(got === want, s"cascade != rebuild (nDocs=$nDocs pool=$pool)")
      sawReadmission ||= got.exists(_._6)
      // split: two survivors of one old cluster with different new labels
      sawSplit ||= got.groupBy(_._2).exists { case (_, ms) =>
        ms.flatMap(_._4).toSet.size > 1
      }
    }
    // the randomization must actually exercise the interesting shapes —
    // a seed change that stops producing them should fail loudly, not
    // silently weaken the property
    assert(sawReadmission, "no randomized run produced a readmission")
    assert(sawSplit, "no randomized run produced a cluster split")
  }

  test("spans: incremental equals rebuild across randomized corpora") {
    val rnd = new scala.util.Random(1717)
    var sawRestored = false
    for (_ <- 1 to 8) {
      val nDocs = 5 + rnd.nextInt(12)
      val pool = 2 + rnd.nextInt(5)
      val docs = docsOf((1L to nDocs.toLong).map { id =>
        val nb = 1 + rnd.nextInt(3)
        (id, (1 to nb).map(_ => block(rnd.nextInt(pool))).mkString(" "))
      })
      val del = delOf((1L to nDocs.toLong).filter(_ => rnd.nextDouble() < 0.35))
      val out = Forget.requalifySpansOver(docs, del).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_words_before"),
          r.getAs[Long]("span_words_after"), r.getAs[Long]("words_restored"))).toSet
      val beforeSum = Dedup.dedupSpansOf(docs)
        .groupBy("doc_id").agg(sum("span_words").as("b"))
      val afterSum = Dedup.dedupSpansOf(docs.join(del, Seq("doc_id"), "left_anti"))
        .groupBy("doc_id").agg(sum("span_words").as("a"))
      import spark.implicits._
      val expected = out.map(_._1).toSeq.toDF("doc_id")
        .join(beforeSum, Seq("doc_id"), "left")
        .join(afterSum, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("b"), lit(0L)).as("bb"),
          coalesce(col("a"), lit(0L)).as("aa"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(1) - r.getLong(2))).toSet
      assert(out === expected, s"span cascade != rebuild (nDocs=$nDocs pool=$pool)")
      // completeness independent of the code under test
      val changed = beforeSum.join(afterSum, Seq("doc_id"), "full")
        .join(del, Seq("doc_id"), "left_anti")
        .filter(coalesce(col("b"), lit(0L)) =!= coalesce(col("a"), lit(0L)))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(changed.subsetOf(out.map(_._1)),
        s"affected set missed ${changed -- out.map(_._1)}")
      sawRestored ||= out.exists(_._4 > 0L)
    }
    assert(sawRestored, "no randomized run restored any span words")
  }
}
