package graft.llm

import graft.{QueryModule, Tables}
import graft.functions.Hashing
import graft.queries.Ml
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** THE REFINERY PASS — the end-to-end composition a training-data
  * pipeline actually ships, as ONE oracled query:
  *
  *   quality gate  ∘  span remediation  ∘  context-window packing
  *
  * 1. Score every document with the REGISTERED quality classifier
  *    (`Ml.curateModel` — the integer logreg trained on the 80% hash
  *    split, thresholded at the training base rate) and keep the docs
  *    above the gate.
  * 2. Charge each kept doc for its corpus-duplicated mass using the
  *    SUFFIX-GRADE span report (`SuffixDedup.dupSpansExact`): the merged
  *    intervals are disjoint and clamped, so the masked-token count is
  *    simply Σ span_words — an aggregate join, no per-word work.
  * 3. Pack the post-mask token counts into `Sampling.PackBudget`-token
  *    context windows per language (the pack_sequences cumsum-÷-budget).
  *
  * Every stage consumes a registry artifact the standalone queries also
  * report on (`curate_classifier`, `text_dedup_spans_exact`,
  * `pack_sequences`), so the composition adds NO new trust surface —
  * and the DuckDB oracle replays the WHOLE chain from scratch (re-train
  * + re-threshold, re-sort the suffixes, re-pack), which makes this
  * single hash the deepest cross-engine statement in the suite: a drift
  * anywhere in gate, spans, masking arithmetic, or packing breaks it.
  *
  * Scale shape: the gate is a literal-weight projection folded into the
  * scan; the span charge is one duplication-bounded aggregate + a left
  * join on the corpus key; packing is the hierarchical
  * (lang, doc_id-block) prefix ([[Sampling.cumBeforeByLang]] — no
  * single-task per-language window). Nothing here shuffles more than
  * the standalone parts already did.
  */
object Refinery extends QueryModule {

  def refineryPack(spark: SparkSession, sfDir: String): DataFrame = {
    val (w1, w2, b, thr) = Ml.curateModel(spark, sfDir)
    val cut = SuffixDedup.dupSpansExact(spark, sfDir)
      .groupBy("doc_id").agg(sum(col("span_words")).as("cut_words"))
    val kept = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "lang",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_words",
        s"${Ml.LogregFeats1} AS x1",
        "(CAST(size(split(text, ' ')) AS BIGINT) * 1000) div greatest(n_chars, 1) AS x2")
      .filter(expr(s"${Ml.logregSig(w1, w2, b)} >= $thr"))
    Sampling.cumBeforeByLang(
        kept.join(cut, Seq("doc_id"), "left")
          .select(col("doc_id"), col("lang"),
            (col("n_words") - coalesce(col("cut_words"), lit(0L))).as("toks")))
      .withColumn("bin", expr(s"cum_before div ${Sampling.PackBudget}"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"))
      .orderBy("lang", "bin")
  }

  /** The refinery's SINK pass: materialize the curated corpus — kept docs
    * with their duplicated spans CUT — to `outPath` as parquet, the
    * artifact a training run actually reads. Columns: doc_id, lang,
    * source, masked text plus original/kept word counts. Returns the kept
    * count. `RefinerySpec` pins the round-trip against the oracled
    * queries: the written set equals the gate's keep decisions and
    * md5(masked text) equals `text_dedup_mask_exact`'s digests row for
    * row — the sink ships exactly what the reports promise.
    */
  def refineryWrite(spark: SparkSession, sfDir: String, outPath: String): Long = {
    val (w1, w2, b, thr) = Ml.curateModel(spark, sfDir)
    val masked = graft.llm.Dedup.maskedTextWithSpans(
      Tables.documents(spark, sfDir),
      SuffixDedup.dupSpansExact(spark, sfDir))
    Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "lang", "source",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_words",
        s"${Ml.LogregFeats1} AS x1",
        "(CAST(size(split(text, ' ')) AS BIGINT) * 1000) div greatest(n_chars, 1) AS x2")
      .filter(expr(s"${Ml.logregSig(w1, w2, b)} >= $thr"))
      .join(masked, "doc_id")
      .select("doc_id", "lang", "source", "n_words", "n_kept_words", "masked_text")
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath).count()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "refinery_pack" -> (refineryPack _),
  )

  override def oracles: Map[String, String] = {
    val trainCtes = Ml.logregTrainCtes(
      s"""f AS (
         |  SELECT x1, x2, y FROM (
         |    SELECT ${Ml.LogregFeats1} AS x1,
         |           (CAST(len(string_split(text, ' ')) AS BIGINT) * 1000) // greatest(n_chars, 1) AS x2,
         |           ${Ml.LogregLabel} AS y,
         |           ${Hashing.duckHash60("CAST(doc_id AS VARCHAR)")} % 100 AS h
         |    FROM documents) WHERE h < ${Ml.CurateTrainPct})""".stripMargin)
    val sql =
      (trainCtes ++ Seq(
          s"""th AS (
             |  SELECT CAST(CAST(sum(y) AS BIGINT) * 1000000 // count(*) AS BIGINT) AS t
             |  FROM f)""".stripMargin,
          SuffixDedup.suffixSpanCtes,
          s"""cutc AS (
             |  SELECT doc_id, CAST(SUM(se - ss + 1) AS BIGINT) AS cut_words
             |  FROM mg GROUP BY doc_id)""".stripMargin,
          s"""keepd AS (
             |  SELECT s.doc_id, s.lang, s.nw
             |  FROM (SELECT doc_id, lang,
             |          CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
             |          ${Ml.LogregFeats1} AS x1,
             |          (CAST(len(string_split(text, ' ')) AS BIGINT) * 1000) // greatest(n_chars, 1) AS x2
             |        FROM documents) s, w${Ml.LogregIters} w, th
             |  WHERE ${Ml.logregSigDuck("w.w1", "w.w2", "w.b")} >= th.t)""".stripMargin,
          s"""tk AS (
             |  SELECT k.doc_id, k.lang,
             |    k.nw - COALESCE(c.cut_words, 0) AS toks
             |  FROM keepd k LEFT JOIN cutc c ON k.doc_id = c.doc_id)""".stripMargin,
          s"""cum AS (
             |  SELECT lang, toks,
             |    CAST(COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
             |  FROM tk)""".stripMargin))
          .mkString("WITH ", ",\n", "") +
          s"""
             |SELECT lang, CAST(cum_before // ${Sampling.PackBudget} AS BIGINT) AS bin,
             |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens
             |FROM cum GROUP BY lang, cum_before // ${Sampling.PackBudget}
             |ORDER BY lang, bin""".stripMargin
    Map("refinery_pack" -> sql)
  }
}
