package graft.llm

import graft.SparkSpec
import graft.operators.ConnectedComponents
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The right-to-be-forgotten cascade's two load-bearing claims:
  *
  *  1. NON-MONOTONE VERDICTS are handled — deleting a canonical promotes
  *     a surviving loser (readmission), and deleting a bridge doc SPLITS
  *     its cluster into independently re-canonicalized components (the
  *     constructed cases below, which the real corpus doesn't exhibit at
  *     test scale).
  *  2. INCREMENTAL ≡ REBUILD — the affected-clusters-only re-solve equals
  *     a from-scratch recompute over the filtered corpus, on the real
  *     sf0.001 corpus and the registered delete set, for both the
  *     requalify verdicts and the packed manifest. (The DuckDB oracle
  *     proves the same equivalence cross-engine; this pins it in-Spark so
  *     a refactor can't break one side silently.)
  */
class ForgetSpec extends SparkSpec {

  private def block(tag: String): String =
    (1 to 16).map(i => s"$tag$i").mkString(" ")

  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def delOf(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  private def rowsOf(df: DataFrame): Set[(Long, Long, String, Option[Long], String, Boolean)] =
    df.collect().map(r => (
      r.getAs[Long]("doc_id"), r.getAs[Long]("old_cluster"),
      r.getAs[String]("old_state"),
      Option(r.getAs[java.lang.Long]("new_cluster")).map(_.longValue),
      r.getAs[String]("new_state"), r.getAs[Boolean]("readmitted"))).toSet

  test("deleting a bridge doc splits the cluster and readmits the far end") {
    // 1 —[X]— 2 —[Y]— 3: doc 2 carries both shared blocks; no 1–3 edge.
    val docs = docsOf(
      (1L, block("x") + " " + block("p")),
      (2L, block("x") + " " + block("y")),
      (3L, block("y") + " " + block("q")))
    val out = rowsOf(Forget.requalifyOver(docs, delOf(2L)))
    assert(out === Set(
      (1L, 1L, "canonical", Some(1L), "canonical", false),
      (2L, 1L, "loser", None, "deleted", false),
      (3L, 1L, "loser", Some(3L), "canonical", true)))
  }

  test("deleting the canonical promotes the next surviving member") {
    // complete cluster {1,2,3} on one shared block; delete the canonical
    val shared = block("s")
    val docs = docsOf(
      (1L, shared + " " + block("a")),
      (2L, shared + " " + block("b")),
      (3L, shared + " " + block("c")))
    val out = rowsOf(Forget.requalifyOver(docs, delOf(1L)))
    assert(out === Set(
      (1L, 1L, "canonical", None, "deleted", false),
      (2L, 1L, "loser", Some(2L), "canonical", true),
      (3L, 1L, "loser", Some(2L), "loser", false)))
  }

  test("unaffected clusters are not in the output (blast radius only)") {
    val docs = docsOf(
      (1L, block("x") + " " + block("p")),
      (2L, block("x") + " " + block("r")),
      (10L, block("z") + " " + block("m")),
      (11L, block("z") + " " + block("n")))
    val out = rowsOf(Forget.requalifyOver(docs, delOf(1L)))
    assert(out.map(_._1) === Set(1L, 2L))
  }

  test("requalify: incremental equals rebuild on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, sf0001)
    val del = Forget.deletedOf(docs)
    val incremental = Forget.requalifyOver(docs, del)
    // independent rebuild: components over the FILTERED corpus's pair
    // graph (the pairwise rule makes that the full graph minus deleted
    // endpoints), same projection, restricted to affected old clusters
    val before = ConnectedComponents.components(Forget.blockPairsOf(docs))
      .select(col("node").as("doc_id"), col("component").as("old_cluster"))
    val survivors = docs.join(del, Seq("doc_id"), "left_anti")
    val rebuilt = ConnectedComponents.components(Forget.blockPairsOf(survivors))
      .select(col("node").as("doc_id"), col("component").as("kept_cluster"))
    val affected = before.join(del, Seq("doc_id"), "left_semi")
      .select("old_cluster").distinct()
    val expected = before.join(affected, Seq("old_cluster"))
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
    assert(rowsOf(incremental) === rowsOf(expected))
    // the delete set and the blast radius are non-vacuous at this SF
    assert(rowsOf(incremental).exists(_._5 == "deleted"))
    assert(rowsOf(incremental).exists(_._6), "no readmission — vacuous case")
  }

  test("spans: deleting the other copy restores the masked words") {
    // A and B share one 8-gram; C repeats its own 8-gram INTERNALLY and
    // also shares it with the deleted doc D.
    val g1 = (1 to 8).map(i => s"g$i").mkString(" ")
    val g2 = (1 to 8).map(i => s"h$i").mkString(" ")
    val filler = (1 to 8).map(i => s"f$i").mkString(" ")
    val docs = docsOf(
      (1L, g1 + " " + filler),            // shares g1 with deleted 2
      (2L, g1 + " " + (1 to 8).map(i => s"z$i").mkString(" ")),
      (3L, g2 + " " + g2),                // internal dup + shares with 4
      (4L, g2 + " " + (1 to 8).map(i => s"y$i").mkString(" ")))
    val out = Forget.requalifySpansOver(docs, delOf(2L, 4L)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_words_before"),
        r.getAs[Long]("span_words_after"), r.getAs[Long]("words_restored"))).toSet
    // doc 1: its whole 8-word span was upheld only by deleted doc 2 →
    // fully restored. doc 3: the shared support (doc 4) dies but the
    // INTERNAL repetition keeps the gram duplicated → occ2 = 2, the
    // verdict never flips, doc 3 is not even affected.
    assert(out === Set((1L, 8L, 0L, 8L)))
  }

  test("spans: incremental equals rebuild on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, sf0001)
    val del = Forget.deletedOf(docs)
    val out = Forget.forgetSpans(spark, sf0001)
    // independent rebuild through the SHIPPED span query: per-doc span
    // sums on the full corpus vs on the filtered corpus
    val beforeSum = Dedup.dedupSpansOf(docs)
      .groupBy("doc_id").agg(sum("span_words").as("b"))
    val afterSum = Dedup.dedupSpansOf(docs.join(del, Seq("doc_id"), "left_anti"))
      .groupBy("doc_id").agg(sum("span_words").as("a"))
    val expected = out.select("doc_id")
      .join(beforeSum, Seq("doc_id"), "left")
      .join(afterSum, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("b"), lit(0L)).as("span_words_before"),
        coalesce(col("a"), lit(0L)).as("span_words_after"))
      .withColumn("words_restored",
        col("span_words_before") - col("span_words_after"))
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_words_before"),
        r.getAs[Long]("span_words_after"), r.getAs[Long]("words_restored"))).toSet
    val got = rows(out)
    assert(got === rows(expected))
    assert(got.nonEmpty && got.forall(_._4 >= 0L), "monotonicity: spans only shrink")
    assert(got.exists(_._4 > 0L), "no restored words — vacuous case")
    // completeness, derived WITHOUT the code under test (the expected
    // frame above joins onto out's doc list, so an under-inclusive
    // affected set couldn't fail it — review-caught): every surviving doc
    // whose rebuild span sum DIFFERS from its full-corpus span sum must
    // appear in the output
    val changedSums = beforeSum.join(afterSum, Seq("doc_id"), "full")
      .join(del, Seq("doc_id"), "left_anti")
      .filter(coalesce(col("b"), lit(0L)) =!= coalesce(col("a"), lit(0L)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(changedSums.subsetOf(got.map(_._1)),
      s"affected set missed docs with changed span sums: ${changedSums -- got.map(_._1)}")
  }

  test("pack: incremental equals rebuild on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, sf0001)
    val del = Forget.deletedOf(docs)
    val incremental = Forget.forgetPack(spark, sf0001)
    // rebuild: frozen full-corpus gate, cluster losers recomputed from
    // scratch over the filtered corpus, same pack arithmetic
    val survivorsDocs = docs.join(del, Seq("doc_id"), "left_anti")
    val rebuiltLosers = ConnectedComponents.components(
        Dedup.jaccardPairsOf(survivorsDocs, t = 0.8)
          .select(col("doc_a").as("a"), col("doc_b").as("b")))
      .filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    val surv = Refinery.gatedDocs(spark, sf0001)
      .join(del, Seq("doc_id"), "left_anti")
      .join(rebuiltLosers, Seq("doc_id"), "left_anti")
    val rebuilt = Sampling.cumBeforeByLang(
        surv.select(col("doc_id"), col("lang"), col("n_words").as("toks")))
      .withColumn("bin", expr(s"cum_before div ${Sampling.PackBudget}"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"))
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bin"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"))).toSet
    assert(rows(incremental) === rows(rebuilt))
  }
}
