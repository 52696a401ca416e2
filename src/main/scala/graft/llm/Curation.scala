package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composite pass a training-data pipeline
  * actually ships, built from this library's own operators:
  *
  *   1. quality gate: composite score ≥ 0.5 (TextAnalysis.quality weights);
  *   2. near-dup removal: among 3-gram-shingle Jaccard ≥ 0.8 pairs, drop
  *      the higher doc_id (deterministic survivor rule; candidate
  *      generation is Dedup's prefix-filtered join — at 100 TB, swap in the
  *      MinHash/LSH candidates, same verification);
  *   3. emit survivors with their stats.
  *
  * Everything is one declarative plan: the quality scores and shingle sets
  * come from the same documents scan, and Catalyst shares it. The point of
  * registering the composite (not just its pieces) is that operator
  * composition is itself the product: curation = filter ∘ dedup ∘ score
  * with no materialization barriers between stages.
  */
object Curation extends QueryModule {

  def curateCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.documents(spark, sfDir)
      .withColumn("n_words", size(split(col("text"), " ")))
      .withColumn("score", TextAnalysis.qualityScoreOf(col("text")))
      .filter(col("score") >= 0.5)

    // drop the higher id of every qualifying near-dup pair
    val losers = Dedup.dedupNgramJaccard(spark, sfDir)
      .select(col("doc_b").as("doc_id")).distinct()

    scored.join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "n_words", "score")
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: drop from the training corpus every doc
    * sharing a word 5-gram with the held-out benchmark set (the standard
    * eval-contamination rule, n-gram-overlap form). Here the "benchmark" is
    * the deterministic slice doc_id % 97 == 0 standing in for an external
    * eval suite.
    *
    * Scale shape: the benchmark gram set is tiny relative to the corpus
    * (evals are thousands of docs, corpora billions) — so it broadcasts,
    * making contamination detection a map-side semi-join over the exploded
    * corpus grams: no all-pairs, no big shuffle, one pass.
    */
  def decontaminate(docs: DataFrame): DataFrame = {
    val isBench = col("doc_id") % 97 === 0
    val grams = docs
      // fused native 5-gram hasher (== md5/conv builtin; NgramHashSpec)
      .select(col("doc_id"),
        explode(graft.functions.VectorExpressions
          .word_ngram_hashes(col("text"), 5, distinct = false)).as("g"))
    val benchGrams = grams.filter(isBench).select("g").distinct()
    val contaminated = grams.filter(!isBench)
      .join(broadcast(benchGrams), "g")
      .select("doc_id").distinct()
    docs.filter(!isBench)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  def decontaminateQuery(spark: SparkSession, sfDir: String): DataFrame =
    decontaminate(Tables.documents(spark, sfDir))

  /** The gram-overlap contamination CTEs with PREFIXED names (dc_*) so
    * they compose into other oracles (refinery_decontaminated) without
    * colliding; exposes `dc_cont(doc_id)` — the non-benchmark docs
    * sharing a word 5-gram with the benchmark slice. Same arithmetic as
    * the standalone `decontaminate` oracle below.
    */
  private[llm] val duckDecontCtes: String =
    s"""dc_g AS (
       |  SELECT doc_id,
       |    unnest(list_transform(
       |      range(1, greatest(len(string_split(text, ' ')) - 3, 2)),
       |      i -> ${graft.functions.Hashing.duckHash60(
              "array_to_string(string_split(text, ' ')[i:i+4], ' ')")})) AS g
       |  FROM documents
       |), dc_bench AS (
       |  SELECT DISTINCT g FROM dc_g WHERE doc_id % 97 = 0
       |), dc_cont AS (
       |  SELECT DISTINCT doc_id FROM dc_g
       |  WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM dc_bench)
       |)""".stripMargin

  /** Gopher/MassiveText-style quality-rule battery (Rae et al.,
    * arXiv:2112.11446, A1.1), recalibrated to this corpus's shape
    * (single-line space-separated text — the punctuation/bullet rules are
    * vacuous here, so the battery keeps the five rules with signal):
    *   R1 word count in [30, 90];
    *   R2 mean word length in [4.4, 5.6] — compared as
    *      10·chars ∈ [44·n, 56·n], pure integer, no float division;
    *   R3 ≥ 2 distinct stop words present (the Gopher "stop word" rule);
    *   R4 top-word dominance ≤ 15% (ppm, integer div) — the repetition
    *      screen that catches "batch batch batch" spam;
    *   R5 type-token ratio ≥ 30% (ppm) — template-farm screen.
    * Report: per-source rule-violation counts, survivors, keep rate —
    * the per-rule accounting a curation run publishes so a rule change
    * can be attributed. Scale shape: R1-R3/R5 are per-row expressions on
    * one scan; R4 is one (doc, word) groupBy (map-side combinable) + a
    * doc-keyed max join-back; the report groupBy is source-sized.
    */
  def gopherRules(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val ws = split(col("text"), " ")
    val stopArr = array(TextAnalysis.Stopwords.map(lit): _*)
    val base = docs.select(
      col("doc_id"), col("source"),
      size(ws).cast("long").as("nw"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("chars"),
      size(array_distinct(ws)).cast("long").as("ndw"),
      size(array_intersect(array_distinct(ws), stopArr)).cast("long").as("nstop"))
    val topw = docs.select(col("doc_id"), explode(ws).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("topc"))
    val flags = base.join(topw, "doc_id").select(
      col("source"),
      when(col("nw").between(30, 90), 0L).otherwise(1L).as("v_words"),
      when(col("chars") * 10 >= col("nw") * 44 &&
           col("chars") * 10 <= col("nw") * 56, 0L).otherwise(1L).as("v_wordlen"),
      when(col("nstop") >= 2, 0L).otherwise(1L).as("v_stop"),
      when(expr("topc * 1000000 div nw") <= 150000, 0L).otherwise(1L).as("v_topword"),
      when(expr("ndw * 1000000 div nw") >= 300000, 0L).otherwise(1L).as("v_ttr"))
    flags
      .withColumn("viol",
        col("v_words") + col("v_wordlen") + col("v_stop") +
          col("v_topword") + col("v_ttr"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("v_words")).as("v_words"),
        sum(col("v_wordlen")).as("v_wordlen"),
        sum(col("v_stop")).as("v_stop"),
        sum(col("v_topword")).as("v_topword"),
        sum(col("v_ttr")).as("v_ttr"),
        sum(when(col("viol") === 0, 1L).otherwise(0L)).as("kept"))
      .withColumn("keep_ppm", expr("kept * 1000000 div n_docs"))
      .orderBy("source")
  }

  /** DSIR-style importance resampling (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169): pick
    * raw-pool documents whose hashed-unigram distribution looks like the
    * TARGET domain. Log importance weight of a doc =
    * Σ_tokens [ln p̂_target(bucket) − ln p̂_raw(bucket)] over B = 256 hash
    * buckets (the hashing trick: the bucket LM is O(B) state, never
    * O(vocab)) with add-one smoothing on both sides; the draw is weighted
    * sampling WITHOUT replacement via Gumbel top-k on hash-derived
    * uniforms (key = logw + Gumbel(u) — the A-ES/Gumbel-max
    * correspondence `sample_weighted` already uses, deterministic and
    * rerun-stable). Target here = src0/src1 (the "match this domain"
    * stand-in, e.g. Wikipedia); pool = every other source.
    *
    * Determinism discipline: the per-BUCKET log-ratio is computed once on
    * the 256-row bucket table, rounded onto the 6dp grid as DECIMAL, and
    * joined back — the per-doc sum is exact decimal arithmetic,
    * order-independent at any parallelism; ln runs on identical doubles
    * in both engines (the text_unigram_lm contract). At 100 TB: one
    * map-side-combined bucket groupBy, a 1-row totals broadcast, a
    * 256-row ratio broadcast joined into the token stream, one doc-level
    * groupBy, and a TakeOrderedAndProject top-k — no stage carries more
    * than O(corpus tokens) with O(B) state.
    */
  def dsirSelect(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Hashing
    val B = 256
    val N = 50
    val isTarget = col("source").isin("src0", "src1")
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), isTarget.as("tgt"),
        explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), col("tgt"),
        pmod(Hashing.hash60(col("w")), lit(B)).as("b"))
    val counts = toks.groupBy("b").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("tgt"), 1L).otherwise(0L)).as("cr"))
    // grand totals fold out of the 256-row bucket table — a second
    // corpus-wide explode for two scalars would double the token passes
    val totals = counts.agg(
      sum(col("ct")).as("tt"),
      sum(col("cr")).as("tr"))
    val ratio = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        round(log((col("ct") + 1).cast("double") / (col("tt") + lit(B)))
          - log((col("cr") + 1).cast("double") / (col("tr") + lit(B))), 6)
          .cast("decimal(14,6)").as("lr"))
    val scored = toks.filter(!col("tgt"))
      .join(broadcast(ratio), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("slr"))
    val u = (pmod(Hashing.hash60(col("doc_id").cast("string")), lit(1000000))
      .cast("double") + 0.5) / 1000000.0
    scored
      .withColumn("logw", round(col("slr").cast("double"), 6))
      .withColumn("key", round(col("logw") - log(-log(u)), 6))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(N)
      .select("doc_id", "n_tokens", "logw", "key")
      .orderBy(col("key").desc, col("doc_id"))
  }

  /** Contamination PROVENANCE — the audit table behind [[decontaminate]]'s
    * drop decisions: one row per (contaminated doc, benchmark doc) pair
    * with the evidence — how many distinct word 5-grams they share, the
    * doc's own distinct-gram count, and the overlap as ppm of the doc.
    * `decontaminate` answers "what do we drop"; this answers the question
    * the eval team asks next — WHICH eval item leaked into WHICH training
    * doc, and how badly (a 1-gram brush vs a verbatim copy), the evidence
    * that separates a false-positive common phrase from a real leak.
    *
    * Scale shape: identical to the shipping rule's — the benchmark gram
    * set (now carrying bench_id) is still eval-suite-sized so it
    * broadcasts; the pair table is one map-side-combined groupBy on
    * (doc_id, bench_id) over the semi-join survivors; the per-doc gram
    * totals reuse the same exploded scan. Grams are DISTINCT per doc on
    * both sides so repeated phrases can't inflate the evidence count.
    */
  def decontaminateProvenance(spark: SparkSession, sfDir: String): DataFrame = {
    val isBench = col("doc_id") % 97 === 0
    val grams = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.functions.VectorExpressions
          .word_ngram_hashes(col("text"), 5, distinct = true)).as("g"))
    val bench = grams.filter(isBench)
      .select(col("doc_id").as("bench_id"), col("g"))
    val corpus = grams.filter(!isBench)
    val docTotals = corpus.groupBy("doc_id")
      .agg(count(lit(1)).as("doc_grams")) // distinct=true ⇒ count == n distinct
    corpus.join(broadcast(bench), "g")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .join(docTotals, "doc_id")
      .withColumn("shared_ppm", expr("n_shared * 1000000 div doc_grams"))
      .select("doc_id", "bench_id", "n_shared", "doc_grams", "shared_ppm")
      .orderBy("doc_id", "bench_id")
  }

  /** Contamination-STRICTNESS sweep — the gram-size tuning table behind
    * every decontamination deployment: overlap at n = 3 is aggressive
    * (common phrases fire — false positives discard good data), n = 8
    * catches only verbatim leaks (false negatives let paraphrased eval
    * text through); production picks the knee. One row per gram size:
    * contaminated-doc count, removed token mass, and the removal rate
    * over the non-benchmark corpus — same bench slice, same fused
    * native gram hasher as [[decontaminate]], three gram widths. Scale:
    * each width is the same broadcast bench-gram semi-join as the
    * shipping rule; corpus min doc length (10 words) keeps every width
    * well-defined on both engines.
    */
  def decontaminateSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val isBench = col("doc_id") % 97 === 0
    val nonBench = docs.filter(!isBench)
      .agg(count(lit(1)).as("nonbench_docs"))
    val rows = Seq(3, 5, 8).map { n =>
      val grams = docs.select(col("doc_id"),
        explode(graft.functions.VectorExpressions
          .word_ngram_hashes(col("text"), n, distinct = false)).as("g"))
      val benchGrams = grams.filter(isBench).select("g").distinct()
      val cont = grams.filter(!isBench)
        .join(broadcast(benchGrams), "g")
        .select("doc_id").distinct()
      docs.join(cont, Seq("doc_id"), "left_semi")
        .agg(count(lit(1)).as("contaminated_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("tr"))
        .select(col("contaminated_docs"),
          coalesce(col("tr"), lit(0L)).as("tokens_removed"))
        .crossJoin(broadcast(nonBench))
        .select(lit(n).as("gram_n"), col("contaminated_docs"),
          col("tokens_removed"),
          expr("contaminated_docs * 1000000 div nonbench_docs")
            .as("removed_doc_ppm"))
    }
    rows.reduce(_.unionAll(_)).orderBy("gram_n")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curate_corpus" -> (curateCorpus _),
    "curate_gopher_rules" -> (gopherRules _),
    "decontaminate" -> (decontaminateQuery _),
    "decontaminate_provenance" -> (decontaminateProvenance _),
    "decontaminate_sweep" -> (decontaminateSweep _),
    "dsir_select"   -> (dsirSelect _),
  )

  override def oracles: Map[String, String] = {
    val stop = TextAnalysis.Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    // the same shingle/jaccard fragments Dedup's oracle uses
    val shingles =
      "list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 1, 2)), " +
        "i -> CAST('0x' || substr(md5(array_to_string(string_split(text, ' ')[i:i+2], ' ')), 1, 15) AS BIGINT)))"
    Map(
      "curate_corpus" ->
        s"""WITH scored AS (
           |  SELECT doc_id, lang,
           |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
           |    ROUND(LEAST(strlen(text)::DOUBLE / 400.0, 1.0) * 0.5
           |        + len(list_distinct(string_split(text, ' ')))::DOUBLE / len(string_split(text, ' ')) * 0.3
           |        + len(list_filter(string_split(text, ' '), x -> list_contains($stop, x)))::DOUBLE / len(string_split(text, ' ')) * 0.2, 6) AS score
           |  FROM documents
           |), shing AS (
           |  SELECT doc_id, lang, $shingles AS s FROM documents
           |), losers AS (
           |  SELECT DISTINCT b.doc_id
           |  FROM shing a JOIN shing b ON a.lang = b.lang AND a.doc_id < b.doc_id
           |  WHERE ROUND(len(list_intersect(a.s, b.s))::DOUBLE /
           |              (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8
           |)
           |SELECT doc_id, lang, n_words, score
           |FROM scored
           |WHERE score >= 0.5 AND doc_id NOT IN (SELECT doc_id FROM losers)
           |ORDER BY doc_id""".stripMargin,
      "curate_gopher_rules" ->
        s"""WITH base AS (
           |  SELECT doc_id, source,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
           |    CAST(strlen(replace(text, ' ', '')) AS BIGINT) AS chars,
           |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS ndw,
           |    CAST(len(list_filter(list_distinct(string_split(text, ' ')),
           |      x -> list_contains($stop, x))) AS BIGINT) AS nstop
           |  FROM documents
           |), topw AS (
           |  SELECT doc_id, MAX(c) AS topc FROM (
           |    SELECT doc_id, COUNT(*) AS c
           |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           |          FROM documents)
           |    GROUP BY doc_id, w)
           |  GROUP BY doc_id
           |), flags AS (
           |  SELECT source,
           |    CASE WHEN nw BETWEEN 30 AND 90 THEN 0 ELSE 1 END AS v_words,
           |    CASE WHEN 10 * chars BETWEEN 44 * nw AND 56 * nw
           |         THEN 0 ELSE 1 END AS v_wordlen,
           |    CASE WHEN nstop >= 2 THEN 0 ELSE 1 END AS v_stop,
           |    CASE WHEN topc * 1000000 // nw <= 150000 THEN 0 ELSE 1 END
           |      AS v_topword,
           |    CASE WHEN ndw * 1000000 // nw >= 300000 THEN 0 ELSE 1 END
           |      AS v_ttr
           |  FROM base JOIN topw USING (doc_id)
           |)
           |SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(v_words) AS BIGINT) AS v_words,
           |  CAST(SUM(v_wordlen) AS BIGINT) AS v_wordlen,
           |  CAST(SUM(v_stop) AS BIGINT) AS v_stop,
           |  CAST(SUM(v_topword) AS BIGINT) AS v_topword,
           |  CAST(SUM(v_ttr) AS BIGINT) AS v_ttr,
           |  CAST(SUM(CASE WHEN v_words + v_wordlen + v_stop + v_topword
           |                     + v_ttr = 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS kept,
           |  CAST(SUM(CASE WHEN v_words + v_wordlen + v_stop + v_topword
           |                     + v_ttr = 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    * 1000000 // COUNT(*) AS keep_ppm
           |FROM flags GROUP BY source ORDER BY source""".stripMargin,
      "decontaminate_sweep" -> {
        def block(n: Int): String =
          s"""g$n AS (
             |  SELECT doc_id,
             |    unnest(list_transform(
             |      range(1, greatest(len(string_split(text, ' ')) - ${n - 2}, 2)),
             |      i -> ${graft.functions.Hashing.duckHash60(
                    s"array_to_string(string_split(text, ' ')[i:i+${n - 1}], ' ')")})) AS g
             |  FROM documents
             |), b$n AS (
             |  SELECT DISTINCT g FROM g$n WHERE doc_id % 97 = 0
             |), c$n AS (
             |  SELECT DISTINCT doc_id FROM g$n
             |  WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM b$n)
             |), s$n AS (
             |  SELECT $n AS gram_n,
             |    (SELECT COUNT(*) FROM c$n) AS contaminated_docs,
             |    (SELECT CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
             |     FROM documents WHERE doc_id IN (SELECT doc_id FROM c$n)) AS tokens_removed
             |)""".stripMargin
        s"""WITH ${Seq(3, 5, 8).map(block).mkString(",\n")},
           |nb AS (
           |  SELECT COUNT(*) AS nonbench_docs FROM documents WHERE doc_id % 97 <> 0
           |)
           |SELECT CAST(gram_n AS INTEGER) AS gram_n,
           |  CAST(contaminated_docs AS BIGINT) AS contaminated_docs,
           |  tokens_removed,
           |  CAST(contaminated_docs * 1000000 // nb.nonbench_docs AS BIGINT)
           |    AS removed_doc_ppm
           |FROM (SELECT * FROM s3 UNION ALL SELECT * FROM s5
           |      UNION ALL SELECT * FROM s8) u
           |CROSS JOIN nb ORDER BY gram_n""".stripMargin
      },
      "decontaminate_provenance" ->
        s"""WITH g AS (
           |  SELECT DISTINCT doc_id, ${graft.functions.Hashing.duckHash60("gram")} AS g
           |  FROM (
           |    SELECT doc_id,
           |      unnest(list_transform(
           |        range(1, greatest(len(string_split(text, ' ')) - 3, 2)),
           |        i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))) AS gram
           |    FROM documents
           |  )
           |), bench AS (
           |  SELECT doc_id AS bench_id, g FROM g WHERE doc_id % 97 = 0
           |), corpus AS (
           |  SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0
           |), tot AS (
           |  SELECT doc_id, COUNT(*) AS doc_grams FROM corpus GROUP BY doc_id
           |), pairs AS (
           |  SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
           |  FROM corpus c JOIN bench b USING (g)
           |  GROUP BY c.doc_id, b.bench_id
           |)
           |SELECT p.doc_id, p.bench_id, p.n_shared, t.doc_grams,
           |  CAST(p.n_shared * 1000000 // t.doc_grams AS BIGINT) AS shared_ppm
           |FROM pairs p JOIN tot t USING (doc_id)
           |ORDER BY p.doc_id, p.bench_id""".stripMargin,
      "decontaminate" ->
        s"""WITH g AS (
           |  SELECT doc_id,
           |    unnest(list_transform(
           |      range(1, greatest(len(string_split(text, ' ')) - 3, 2)),
           |      i -> ${graft.functions.Hashing.duckHash60(
                  "array_to_string(string_split(text, ' ')[i:i+4], ' ')")})) AS g
           |  FROM documents
           |), bench AS (
           |  SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0
           |), contaminated AS (
           |  SELECT DISTINCT doc_id FROM g
           |  WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM bench)
           |)
           |SELECT doc_id, lang, source FROM documents
           |WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contaminated)
           |ORDER BY doc_id""".stripMargin,
      "dsir_select" ->
        s"""WITH toks AS (
           |  SELECT doc_id, source IN ('src0', 'src1') AS tgt,
           |    (${graft.functions.Hashing.duckHash60("w")} % 256) AS b
           |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
           |        FROM documents)
           |), counts AS (
           |  SELECT b,
           |    SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
           |    SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS cr
           |  FROM toks GROUP BY b
           |), totals AS (
           |  SELECT SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tt,
           |         SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS tr
           |  FROM toks
           |), ratio AS (
           |  SELECT b, CAST(ROUND(ln((ct + 1)::DOUBLE / (tt + 256))
           |                     - ln((cr + 1)::DOUBLE / (tr + 256)), 6)
           |             AS DECIMAL(14,6)) AS lr
           |  FROM counts CROSS JOIN totals
           |), scored AS (
           |  SELECT doc_id, COUNT(*) AS n_tokens, SUM(lr) AS slr
           |  FROM toks JOIN ratio USING (b)
           |  WHERE NOT tgt
           |  GROUP BY doc_id
           |), keyed AS (
           |  SELECT doc_id, n_tokens, ROUND(CAST(slr AS DOUBLE), 6) AS logw,
           |    ROUND(ROUND(CAST(slr AS DOUBLE), 6)
           |      - ln(-ln(((${graft.functions.Hashing.duckHash60("CAST(doc_id AS VARCHAR)")} % 1000000)::DOUBLE + 0.5) / 1000000.0)), 6) AS key
           |  FROM scored
           |)
           |SELECT doc_id, n_tokens, logw, key FROM keyed
           |ORDER BY key DESC, doc_id LIMIT 50""".stripMargin,
    )
  }
}
