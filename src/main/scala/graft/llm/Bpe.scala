package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (north-star EXT tier): learn a
  * byte-pair-encoding merge table over the document corpus — the
  * vocabulary-construction pass every LLM data pipeline runs before
  * tokenization (Sennrich et al., ACL 2016, public literature; the
  * reference has no tokenizer stage — its text handling stops at JSON
  * field projection, lambda/handler.ts:41-57).
  *
  * Algorithm (classic greedy BPE, exactly):
  *   round r: count adjacent token pairs corpus-wide → pick the most
  *   frequent (deterministic tiebreak: count DESC, pair ASC) → merge every
  *   non-overlapping left-to-right occurrence → repeat.
  *
  * Distributed shape: each round is ONE map-side-combinable groupBy over
  * per-doc adjacent pairs (shuffle carries (pair, partial count) — bounded
  * by active-vocab², never corpus rows) + a TakeOrdered(1). The winning
  * pair returns to the driver (k rounds × 1 row — the same bounded
  * actions-per-round discipline as the connected-components loop) and is
  * embedded as a LITERAL in the next round's merge expression, so the
  * round-r corpus state is a chain of r codegen'd `replace` calls over the
  * scan — no intermediate corpus materialization, no broadcast-plan
  * nesting. At real corpus scale (k in the tens of thousands) checkpoint
  * the state every few hundred merges — wired: `trainCheckpointed`'s
  * cadence cuts the replace chain through PlanBridge.cutLineage — and
  * train on a `sample_hash`-gated corpus slice, exactly like production
  * tokenizer trainers; the per-round plan is unchanged by either.
  *
  * EXACT-GREEDY-BY-REPLACE representation: the corpus state wraps every
  * token in pipes — `|t1||t2||t3|` — so merging pair (a,b) is the plain
  * string replace `|a||b|` → `|ab|`:
  *   - token boundaries are exact (tokens are [a-z]+, never containing
  *     `|`), so `|a||b|` cannot match inside a longer token;
  *   - adjacent matches share NO characters (the closing `|` of one match
  *     and the opening `|` of the next are different characters), so
  *     non-overlapping left-to-right `replace` — identical semantics in
  *     Spark's StringReplace and DuckDB's replace — IS token-level greedy
  *     BPE merge, with no delimiter-consumption artifacts. A
  *     space-separated representation gets this wrong on runs (` a a a `
  *     consumes the middle delimiter), which is why the pipe-wrap is the
  *     canonical state here and in the DuckDB oracle.
  */
object Bpe extends QueryModule {

  /** Merge rounds for the registered queries — enough to learn real
    * English digraphs on the synthetic corpus while keeping the oracle's
    * CTE chain readable.
    */
  val Rounds = 6

  private val MaxChars = 120

  /** `|c1||c2|...` initial state: letters-only, truncated, one token per
    * character.
    */
  private def state0(text: Column): Column = {
    val cleaned = regexp_replace(lower(text), "[^a-z]", "")
    regexp_replace(substring(cleaned, 1, MaxChars), "(.)", "|$1|")
  }

  /** Tokenize any (doc_id, text) frame into the pipe-wrapped state —
    * package-visible so specs exercise the SAME cleaning/truncation the
    * registered queries use (a duplicated pipeline would keep passing
    * against stale preprocessing).
    */
  private[graft] def state0Of(docs: DataFrame): DataFrame =
    docs
      .filter(length(regexp_replace(lower(col("text")), "[^a-z]", "")) >= 2)
      .select(col("doc_id"), state0(col("text")).as("state"))

  private def corpus(spark: SparkSession, sfDir: String): DataFrame =
    state0Of(Tables.documents(spark, sfDir))

  /** Word-boundary initial state (SentencePiece-style): words split on
    * non-letter runs, each word's first character glued to a `_` marker —
    * so learned merges build word-aware units (`_t`+`h` → `_th` ≠
    * mid-word `th`) and a merged token can never span a word boundary
    * (no pair (x, _y) beats intra-word pairs on this corpus, and even if
    * learned it is a legitimate phrase unit, as in real BPE vocabularies).
    * Marker `_` is outside the [a-z] token alphabet but safely inside the
    * pipe-wrap representation (never `|`).
    */
  private def state0Words(text: Column): Column = {
    val words   = trim(regexp_replace(lower(text), "[^a-z]+", " "))
    val marked  = regexp_replace(substring(words, 1, MaxChars), "(^| )([a-z])", " _$2")
    val glued   = regexp_replace(marked, " ", "")
    regexp_replace(glued, "(_?[a-z])", "|$1|")
  }

  private[graft] def state0WordsOf(docs: DataFrame): DataFrame =
    docs
      .filter(length(trim(regexp_replace(lower(col("text")), "[^a-z]+", " "))) >= 2)
      .select(col("doc_id"), state0Words(col("text")).as("state"))

  private def corpusWords(spark: SparkSession, sfDir: String): DataFrame =
    state0WordsOf(Tables.documents(spark, sfDir))

  /** Apply a learned merge table as chained literal replaces — the single
    * definition of merge application shared by the training loop, the
    * vocab report, and the encode pass.
    */
  private[graft] def applyMerges(state: DataFrame, merges: Seq[(Int, String, String, Long)]): DataFrame =
    merges.foldLeft(state) { case (d, (_, a, b, _)) =>
      d.withColumn("state", expr(s"replace(state, '|$a||$b|', '|$a$b|')"))
    }

  private def finalState(spark: SparkSession, sfDir: String): DataFrame =
    applyMerges(corpus(spark, sfDir), trainedMerges(spark, sfDir))

  /** Adjacent-pair counts of the current state. One explode of the native
    * single-scan pair expression (org.apache.spark.sql.graft.TokenPairs —
    * replaces the interpreted split/transform/element_at HOF chain with
    * bit-identical output) + one map-side-combinable agg; the shuffle
    * carries (a, b, partial count).
    */
  private def pairCounts(state: DataFrame): DataFrame =
    state
      .select(explode(
        graft.functions.VectorExpressions.token_pairs(col("state"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Train `k` merges: returns the merge table rows and the final-state
    * frame (documents with all k merges applied as chained literal
    * replaces). Public so crafted-corpus specs can pin the greedy
    * semantics against hand-computed merges (the mirror-oracle
    * countermeasure).
    */
  def train(docs: DataFrame, k: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    val (merges, state, _) = trainCheckpointed(docs, k, checkpointEvery = 0)
    (merges, state)
  }

  /** `train` with an explicit checkpoint cadence — the k≈10⁴-merge shape,
    * executable. Every `checkpointEvery` merges the state's replace chain
    * is cut via PlanBridge.cutLineage (materialized blocks + a RELIABLE
    * checkpoint when the session has a checkpoint dir — executor loss
    * mid-training then recovers the cut instead of killing the job), so
    * the per-round plan stays O(checkpointEvery) chained replaces instead
    * of O(r) — at tens of thousands of merges an uncut chain would drown
    * analysis/codegen long before the data became the cost. Superseded
    * cuts are released as soon as the next cut lands (same discipline as
    * the CC loop's per-round eRdd release); the LAST cut may back the
    * returned state, so its release is handed to the caller as the third
    * element — call it once the state frame is no longer needed.
    * `checkpointEvery = 0` disables cutting (the registered k=6 queries).
    */
  def trainCheckpointed(docs: DataFrame, k: Int, checkpointEvery: Int)
      : (Seq[(Int, String, String, Long)], DataFrame, () => Unit) = {
    // The initial tokenization (two corpus-wide regexes) is computed once
    // and pinned; every round's state is then cheap literal `replace`s
    // over the cached strings, never a regex recompute.
    val base = docs.persist()
    var state = base
    var lastCut: org.apache.spark.rdd.RDD[_] = null
    var sinceCut = 0
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to k) {
      val best = pairCounts(state)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect() // 1 row per round — bounded driver action, see scaladoc
      if (best.nonEmpty) {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, a, b, c))
        state = applyMerges(state, Seq((r, a, b, c)))
        sinceCut += 1
        if (checkpointEvery > 0 && sinceCut >= checkpointEvery && r < k) {
          val (cutDf, cutRdd, _) =
            org.apache.spark.sql.graft.PlanBridge.cutLineage(state)
          if (lastCut != null)
            org.apache.spark.sql.graft.PlanBridge.releaseCut(lastCut)
          state = cutDf; lastCut = cutRdd; sinceCut = 0
        }
      }
    }
    base.unpersist(blocking = false)
    val finalCut = lastCut
    val release: () => Unit = () =>
      if (finalCut != null)
        org.apache.spark.sql.graft.PlanBridge.releaseCut(finalCut)
    (merges.result(), state, release)
  }

  /** Learned merge tables per corpus — the model-registry memo: training
    * is deterministic, so the (sfDir → merges) artifact is pure data and
    * any query needing the model (vocab report, downstream tokenize)
    * reuses it instead of re-running k counting rounds. Merges are O(k)
    * scalars on the driver, exactly what a tokenizer file holds.
    */
  private val mergeMemo =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, String, String, Long)]]

  /** Cheap corpus fingerprint (file count : max mtime : total bytes) so the
    * memo invalidates when the files at a reused path are regenerated
    * in-place within one JVM lifetime — without it, a rewritten corpus
    * would silently serve a model trained on the old data while the
    * oracle reads the new files. Package-visible: every artifact-registry
    * memo in the llm tier (merge tables here, classifier weights in Ml,
    * the span report in SuffixDedup) keys on the same fingerprint.
    */
  private[graft] def corpusFingerprint(
      spark: SparkSession, sfDir: String,
      table: String = "documents.parquet"): String = {
    val p = new org.apache.hadoop.fs.Path(sfDir, table)
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0L; var maxM = 0L; var sz = 0L
      while (it.hasNext) {
        val f = it.next(); n += 1
        maxM = math.max(maxM, f.getModificationTime); sz += f.getLen
      }
      s"$n:$maxM:$sz"
    } catch { case scala.util.control.NonFatal(_) => "unknown" }
  }

  private def trainedMerges(spark: SparkSession, sfDir: String): Seq[(Int, String, String, Long)] =
    mergeMemo.getOrElseUpdate(s"$sfDir@${corpusFingerprint(spark, sfDir)}",
      train(corpus(spark, sfDir), Rounds)._1)

  private def trainedWordMerges(spark: SparkSession, sfDir: String): Seq[(Int, String, String, Long)] =
    mergeMemo.getOrElseUpdate(s"$sfDir#words@${corpusFingerprint(spark, sfDir)}",
      train(corpusWords(spark, sfDir), Rounds)._1)

  /** EXT: the learned merge table — (round, pair, corpus count at merge
    * time). This IS the tokenizer model a 100-TB curation run ships.
    */
  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = trainedMerges(spark, sfDir)
    import spark.implicits._
    merges.toDF("round", "a", "b", "cnt").orderBy("round")
  }

  /** EXT: the post-merge vocabulary head — top tokens by corpus frequency
    * after applying the learned merges (the sanity report a tokenizer
    * train job emits). Single scan: the k merges are literal chained
    * replaces inside one codegen'd projection.
    */
  def bpeVocab(spark: SparkSession, sfDir: String): DataFrame = {
    finalState(spark, sfDir)
      .select(col("doc_id"),
        explode(expr("split(substring(state, 2, length(state) - 2), '\\\\|\\\\|')")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(20)
  }

  /** EXT: the tokenize-and-count pass — apply the learned merges to every
    * document and report its token count and chars-per-token compression
    * (the number a packing/budgeting stage consumes). Single scan over the
    * corpus: the k merges are literal chained replaces from the model
    * registry; no counting rounds re-run.
    */
  def bpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    finalState(spark, sfDir)
      .selectExpr("doc_id",
        "CAST(size(split(substring(state, 2, length(state) - 2), '\\\\|\\\\|')) AS BIGINT) AS n_tokens",
        "CAST(length(state) AS BIGINT) AS len_state")
      .selectExpr("doc_id", "len_state - 2 * n_tokens AS n_chars_clean", "n_tokens")
      .selectExpr("doc_id", "n_chars_clean", "n_tokens",
        "n_chars_clean * 1000000 div n_tokens AS chars_per_token_micro")
      .orderBy("doc_id")
  }

  /** EXT: per-language tokenizer FERTILITY — the multilingual
    * tokenizer-equity report (BLOOM/XLM-style): chars-per-token of the
    * TRAINED encoder per language. A tokenizer trained on a skewed mix
    * compresses the dominant language far better than the tail — tail
    * languages pay more tokens (≈ more compute, shorter effective
    * context) for the same text; this table is the number that decision
    * gets made on. Integer micro-grid ratios (per-lang sums first, one
    * division — order-independent), doc counts beside them. Scale: the
    * encode is the registry-memoized chained-replace scan; the lang
    * attach one equi-join; the report a lang-sized groupBy.
    */
  def bpeFertility(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = finalState(spark, sfDir)
      .selectExpr("doc_id",
        "CAST(size(split(substring(state, 2, length(state) - 2), '\\\\|\\\\|')) AS BIGINT) AS n_tokens",
        "CAST(length(state) AS BIGINT) AS len_state")
      .selectExpr("doc_id", "len_state - 2 * n_tokens AS n_chars_clean", "n_tokens")
    Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
      .join(enc, "doc_id")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars_clean")).as("chars"),
        sum(col("n_tokens")).as("tokens"))
      .withColumn("chars_per_token_micro", expr("chars * 1000000 div tokens"))
      .withColumn("tokens_per_100_chars", expr("tokens * 100 div chars"))
      .orderBy("lang")
  }

  /** EXT: merge-count SWEEP — the tokenizer-SIZING curve: corpus
    * compression (chars per token) at 0, 2, 4, and all `Rounds` learned
    * merges. Every vocab-size decision trades table size against
    * compression along exactly this curve (each merge's marginal gain
    * shrinks — the curve flattens toward the diminishing-returns knee
    * where production vocabularies stop). Zero retraining: merge lists
    * are prefix-stable under greedy BPE, so every sweep point is a
    * `take(k)` of the registry-memoized table; each point is one
    * codegen'd chained-replace scan (k scans total for a diagnostic
    * run on a sampled corpus at 100 TB — this is a design-time report,
    * not a shipping pass). The oracle re-learns the chain once and
    * reads its own intermediate states — the same snapshots the sweep
    * claims.
    */
  def bpeSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = trainedMerges(spark, sfDir)
    val ks = (Seq(0, 2, 4, Rounds).distinct.sorted).filter(_ <= merges.size)
    val rows = ks.map { k =>
      applyMerges(corpus(spark, sfDir), merges.take(k))
        .selectExpr(
          "CAST(size(split(substring(state, 2, length(state) - 2), '\\\\|\\\\|')) AS BIGINT) AS n_tokens",
          "CAST(length(state) AS BIGINT) AS len_state")
        .selectExpr("len_state - 2 * n_tokens AS chars", "n_tokens")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("chars")).as("chars"),
          sum(col("n_tokens")).as("tokens"))
        .withColumn("n_merges", lit(k))
        .withColumn("chars_per_token_micro", expr("chars * 1000000 div tokens"))
        .select("n_merges", "n_docs", "chars", "tokens", "chars_per_token_micro")
    }
    rows.reduce(_.unionAll(_)).orderBy("n_merges")
  }

  /** EXT: context-window packing on REAL tokenizer output — the
    * composition a training run actually executes: the packing stage
    * (Sampling.packAssign's contiguous greedy cumsum-÷-budget, same
    * 2048-token budget) budgeted on the TRAINED BPE encoder's token
    * counts instead of whitespace tokens. Whitespace counts misprice
    * every context window (they ignore the compression the tokenizer
    * delivers — chars_per_token_micro in [[bpeEncode]]); packing on the
    * encoder the pipeline trained is what keeps window fill honest.
    *
    * Scale shape: the encode is the single codegen'd
    * chained-replace scan of [[bpeEncode]] (no counting rounds re-run —
    * the merge table comes from the model-registry memo), the doc→lang
    * attach is one equi-join on the corpus key, and packing is the same
    * hierarchical (lang, doc_id-block) prefix as `pack_sequences`
    * ([[Sampling.cumBeforeByLang]] — no single-task per-language
    * window). The oracle replays the frozen merge chain (the
    * `text_bpe_encode` CTEs) plus the cumsum-div — the full
    * train→encode→pack composition is pinned cross-engine.
    */
  def packBpeSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = Sampling.PackBudget // the whitespace tier's window budget
    val toks = finalState(spark, sfDir)
      .selectExpr("doc_id",
        "CAST(size(split(substring(state, 2, length(state) - 2), '\\\\|\\\\|')) AS BIGINT) AS toks")
    Sampling.cumBeforeByLang(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
          .join(toks, "doc_id"))
      .withColumn("bin", expr(s"cum_before div $budget"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"))
      .orderBy("lang", "bin")
  }

  /** EXT: word-boundary merge table — the same trainer over the
    * SentencePiece-style marked alphabet, so the learned units respect
    * word starts (`_th` vs mid-word `th`). Separate model-registry entry
    * per tokenization variant.
    */
  def bpeTrainWords(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = trainedWordMerges(spark, sfDir)
    import spark.implicits._
    merges.toDF("round", "a", "b", "cnt").orderBy("round")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_train" -> (bpeTrain _),
    "text_bpe_words" -> (bpeTrainWords _),
    "text_bpe_vocab" -> (bpeVocab _),
    "text_bpe_encode" -> (bpeEncode _),
    "pack_bpe_sequences" -> (packBpeSequences _),
    "text_bpe_fertility" -> (bpeFertility _),
    "text_bpe_sweep" -> (bpeSweep _),
  )

  // ------------------------------------------------------------- oracles

  /** The identical greedy-BPE chain in DuckDB: same pipe-wrapped state,
    * same replace-based merge, same tiebreak — the oracle re-LEARNS the
    * merges rather than being handed them, so a Spark-side counting or
    * application bug cannot self-confirm.
    */
  /** The character-level s0 CTE shared by the default oracles. */
  private val charS0: String =
    s"""s0 AS (
       |  SELECT doc_id,
       |    regexp_replace(substr(regexp_replace(lower(text), '[^a-z]', '', 'g'), 1, $MaxChars),
       |                   '(.)', '|\\1|', 'g') AS state
       |  FROM documents
       |  WHERE length(regexp_replace(lower(text), '[^a-z]', '', 'g')) >= 2)""".stripMargin

  /** Word-boundary s0: identical pipeline to [[state0Words]] in DuckDB
    * syntax (RE2 group refs, 'g' flags).
    */
  private val wordS0: String =
    s"""s0 AS (
       |  SELECT doc_id,
       |    regexp_replace(
       |      replace(
       |        regexp_replace(substr(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), 1, $MaxChars),
       |                       '(^| )([a-z])', ' _\\2', 'g'),
       |        ' ', ''),
       |      '(_?[a-z])', '|\\1|', 'g') AS state
       |  FROM documents
       |  WHERE length(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'))) >= 2)""".stripMargin

  /** The re-learned merge-chain CTE list WITHOUT the leading `WITH`, so
    * sibling modules can compose it with their own CTEs (the unigram
    * trainer's BPE-vs-unigram fertility comparison joins both learned
    * tokenizers' encodes in one oracle). */
  private[llm] def oracleCteList(k: Int, s0: String = charS0): Seq[String] = {
    def pairs(src: String): String =
      s"""  SELECT z[1] AS a, z[2] AS b, count(*) AS cnt
         |  FROM (SELECT unnest(list_zip(toks, toks[2:])) AS z
         |        FROM (SELECT string_split(substr(state, 2, length(state)-2), '||') AS toks
         |              FROM $src) i) u
         |  WHERE z[2] IS NOT NULL GROUP BY 1, 2""".stripMargin
    val ctes = Seq.newBuilder[String]
    ctes += s0
    for (r <- 1 to k) {
      ctes += s"p$r AS (\n${pairs(s"s${r - 1}")})"
      // The sentinel ('','',0) keeps b$r at exactly one row when a round
      // has no pairs left (every doc merged to one token): real pairs
      // (cnt >= 1) always beat it, and its replace pattern '||||' can
      // never match a pipe-wrapped state (tokens are nonempty, so at most
      // two pipes ever run consecutively) — so the state CTE's cross join
      // stays total instead of annihilating the corpus, mirroring the
      // trainer's skip-the-round behavior.
      ctes += s"b$r AS (SELECT a, b, cnt FROM (SELECT a, b, cnt FROM p$r" +
        s" UNION ALL SELECT '', '', CAST(0 AS BIGINT)) ORDER BY cnt DESC, a, b LIMIT 1)"
      ctes += s"""s$r AS (
         |  SELECT doc_id,
         |    replace(state, '|' || b$r.a || '||' || b$r.b || '|', '|' || b$r.a || b$r.b || '|') AS state
         |  FROM s${r - 1}, b$r)""".stripMargin
    }
    ctes.result()
  }

  private def oracleCtes(k: Int, s0: String = charS0): String =
    oracleCteList(k, s0).mkString("WITH ", ",\n", "")

  override def oracles: Map[String, String] = {
    val k = Rounds
    val mergeRows = (1 to k)
      .map(r => s"SELECT $r AS round, a, b, cnt FROM b$r WHERE cnt > 0")
      .mkString(" UNION ALL ")
    Map(
      "text_bpe_train" ->
        s"${oracleCtes(k)}\nSELECT * FROM ($mergeRows) ORDER BY round",
      "text_bpe_words" ->
        s"${oracleCtes(k, wordS0)}\nSELECT * FROM ($mergeRows) ORDER BY round",
      "text_bpe_vocab" ->
        s"""${oracleCtes(k)}
           |SELECT tok, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs FROM (
           |  SELECT doc_id, unnest(string_split(substr(state, 2, length(state)-2), '||')) AS tok
           |  FROM s$k) x
           |GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 20""".stripMargin,
      "text_bpe_encode" ->
        s"""${oracleCtes(k)}
           |SELECT doc_id,
           |  CAST(length(state) AS BIGINT)
           |    - 2 * CAST(len(string_split(substr(state, 2, length(state)-2), '||')) AS BIGINT) AS n_chars_clean,
           |  CAST(len(string_split(substr(state, 2, length(state)-2), '||')) AS BIGINT) AS n_tokens,
           |  CAST((CAST(length(state) AS BIGINT)
           |    - 2 * CAST(len(string_split(substr(state, 2, length(state)-2), '||')) AS BIGINT)) * 1000000
           |    // CAST(len(string_split(substr(state, 2, length(state)-2), '||')) AS BIGINT) AS BIGINT) AS chars_per_token_micro
           |FROM s$k ORDER BY doc_id""".stripMargin,
      // pack_bpe_sequences: the SAME re-learned merge chain, then the
      // encode token count feeds the pack_sequences cumsum-÷-budget —
      // the train→encode→pack composition pinned end-to-end.
      // text_bpe_fertility: the same re-learned merge chain, encode token
      // counts joined to lang, per-lang integer micro ratios
      // text_bpe_sweep: ONE re-learned chain; compression read at its
      // own intermediate states s0/s2/s4/sk — the sweep's snapshots.
      "text_bpe_sweep" ->
        s"""${oracleCtes(k)},
           |snap AS (
           |  SELECT 0 AS n_merges, state FROM s0
           |  UNION ALL SELECT 2, state FROM s2
           |  UNION ALL SELECT 4, state FROM s4
           |  UNION ALL SELECT $k, state FROM s$k
           |), m AS (
           |  SELECT n_merges,
           |    CAST(len(string_split(substr(state, 2, length(state)-2), '||')) AS BIGINT) AS n_tokens,
           |    CAST(length(state) AS BIGINT)
           |      - 2 * CAST(len(string_split(substr(state, 2, length(state)-2), '||')) AS BIGINT) AS chars
           |  FROM snap
           |)
           |SELECT CAST(n_merges AS INTEGER) AS n_merges, COUNT(*) AS n_docs,
           |  CAST(SUM(chars) AS BIGINT) AS chars,
           |  CAST(SUM(n_tokens) AS BIGINT) AS tokens,
           |  CAST(CAST(SUM(chars) AS BIGINT) * 1000000
           |    // CAST(SUM(n_tokens) AS BIGINT) AS BIGINT) AS chars_per_token_micro
           |FROM m GROUP BY n_merges ORDER BY n_merges""".stripMargin,
      "text_bpe_fertility" ->
        s"""${oracleCtes(k)},
           |enc AS (
           |  SELECT doc_id,
           |    CAST(length(state) AS BIGINT)
           |      - 2 * CAST(len(string_split(substr(state, 2, length(state)-2), '||')) AS BIGINT) AS n_chars_clean,
           |    CAST(len(string_split(substr(state, 2, length(state)-2), '||')) AS BIGINT) AS n_tokens
           |  FROM s$k
           |)
           |SELECT d.lang, COUNT(*) AS n_docs,
           |  CAST(SUM(e.n_chars_clean) AS BIGINT) AS chars,
           |  CAST(SUM(e.n_tokens) AS BIGINT) AS tokens,
           |  CAST(SUM(e.n_chars_clean) AS BIGINT) * 1000000
           |    // CAST(SUM(e.n_tokens) AS BIGINT) AS chars_per_token_micro,
           |  CAST(SUM(e.n_tokens) AS BIGINT) * 100
           |    // CAST(SUM(e.n_chars_clean) AS BIGINT) AS tokens_per_100_chars
           |FROM enc e JOIN documents d ON e.doc_id = d.doc_id
           |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
      "pack_bpe_sequences" ->
        s"""${oracleCtes(k)},
           |enc AS (
           |  SELECT doc_id,
           |    CAST(len(string_split(substr(state, 2, length(state)-2), '||')) AS BIGINT) AS toks
           |  FROM s$k
           |), j AS (
           |  SELECT d.lang, e.doc_id, e.toks
           |  FROM enc e JOIN documents d ON e.doc_id = d.doc_id
           |), c AS (
           |  SELECT lang, toks,
           |    CAST(COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           |  FROM j
           |)
           |SELECT lang, CAST(cum_before // ${Sampling.PackBudget} AS BIGINT) AS bin,
           |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens
           |FROM c GROUP BY lang, cum_before // ${Sampling.PackBudget}
           |ORDER BY lang, bin""".stripMargin,
    )
  }
}
