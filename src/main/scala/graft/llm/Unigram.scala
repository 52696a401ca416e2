package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer training (Kudo 2018 — the
  * SentencePiece vocabulary family most modern LLM vocabs use), beside
  * the merge-based trainer ([[Bpe]]): seed a candidate piece inventory
  * from corpus substrings, then alternate Viterbi segmentation (E) with
  * piece re-counting (M), pruning the weakest pieces between rounds.
  *
  * The distributed shape is the production one: ALL corpus-scale work is
  * two groupBys (word counts once; nothing else ever touches corpus
  * rows), and the E-step runs over the DISTINCT-WORD frequency table —
  * exactly how SentencePiece trains (its suffix-array seeding and EM
  * both work word-type-weighted, never token-by-token), so E-step cost
  * is ∝ |vocabulary of words|, independent of corpus row count. At
  * 100 TB the word table is millions of rows against billions of docs;
  * training-side joins are against bounded piece tables (≤ 66 rows
  * here) that broadcast, and the trained model ships as a STANDING
  * fingerprint-keyed parquet zone ([[modelZoneRoot]]) — the word→np
  * encode map is joined distributively from that artifact, never
  * collected to the driver (it is per-word-TYPE, i.e. 10⁷–10⁸ rows at
  * 100 TB — the scale at which a driver materialization dies).
  *
  * Candidate segmentations are enumerated EXHAUSTIVELY as cut-point
  * bitmasks: a word of n ≤ [[MaxWordLen]] chars has 2^(n−1) cut masks,
  * filtered to piece length ≤ [[MaxPieceLen]] — ≤ 1490 valid
  * segmentations per word at n = 12 (the tetranacci bound), a constant
  * factor over the Viterbi lattice that buys something the lattice
  * can't give a cross-engine gate: the ARGMAX is a plain windowed
  * row_number with an integer tiebreak (score DESC on the 6dp decimal
  * grid, piece count ASC, mask ASC), bit-identical in Spark and DuckDB
  * with no DP recursion to keep in lock-step. The oracle re-LEARNS the
  * whole schedule from the raw corpus (seed → E → M → prune → E → M),
  * never reading the Spark model, so a counting or scoring bug cannot
  * self-confirm.
  *
  * Honest deviations from Kudo 2018, chosen for exact replayability:
  * hard (Viterbi) EM instead of soft forward-backward expectations, and
  * count-based pruning instead of loss-increase ranking — both standard
  * approximations (Viterbi IS SentencePiece's inference mode; the
  * trainer's loss ranking reduces to count ranking when each word has
  * one dominant segmentation). Probabilities are add-one smoothed so
  * every piece keeps a finite log-prob across prunes, and every ln is
  * rounded onto the 6dp decimal grid BEFORE the decimal-exact
  * segmentation sum — the [[TextAnalysis.bigramLm]] cross-engine
  * discipline (the only float op both engines must agree on is ln on
  * identical doubles).
  */
object Unigram extends QueryModule {

  /** Words truncate to 12 chars → ≤ 2^11 masks each; pieces to 4 chars.
    * Seed keeps the top 40 multi-char substrings; the prune keeps 30.
    * Single chars are never pruned (segmentation totality). */
  val MaxWordLen = 12
  val MaxPieceLen = 4
  val SeedMulti = 40
  val KeepMulti = 30

  /** (w, cw): distinct lowercase a-z words with corpus counts — the ONE
    * corpus-scale aggregate; everything after runs on word types.
    * Package-visible so crafted-corpus specs exercise the SAME cleaning
    * and truncation the registered queries use. */
  private[llm] def wordCountsOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(trim(regexp_replace(lower(col("text")), "[^a-z]+", " ")), " ")).as("w0"))
      .filter(length(col("w0")) >= 1)
      .select(substring(col("w0"), 1, MaxWordLen).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))

  private def wordCounts(spark: SparkSession, sfDir: String): DataFrame =
    wordCountsOf(Tables.documents(spark, sfDir))

  /** Substring seed counts: every length-1..MaxPieceLen substring of
    * every word type, occurrence-weighted by the word's corpus count. */
  private def substringCounts(words: DataFrame): DataFrame =
    words
      .select(col("cw"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), s ->
           |  transform(sequence(1, $MaxPieceLen), l ->
           |    CASE WHEN s + l - 1 <= length(w) THEN substring(w, s, l) END)))""".stripMargin)).as("piece"))
      .filter(col("piece").isNotNull)
      .groupBy("piece").agg(sum(col("cw")).as("cnt"))

  /** Add-one log-probabilities on the 6dp grid over a bounded vocab. */
  private def logpOf(vocab: DataFrame): DataFrame = {
    val norm = vocab.agg(sum(col("cnt")).as("tot"), count(lit(1)).as("v"))
    vocab.crossJoin(broadcast(norm))
      .select(col("piece"),
        round(log((col("cnt") + lit(1.0)) / (col("tot") + col("v"))), 6)
          .cast("decimal(12,6)").as("logp"))
  }

  /** One row per (word, cut-mask, piece occurrence): the exhaustive
    * candidate-segmentation table, filtered to piece length ≤
    * MaxPieceLen. Bounds come from the set bits of the mask — the same
    * integer construction the oracle replays, so the (w, mask) identity
    * of each segmentation is engine-independent (mask is the tiebreak).
    */
  private def explodedSegs(words: DataFrame): DataFrame =
    words
      .select(col("w"), col("cw"), explode(expr(
        "sequence(CAST(0 AS BIGINT), shiftleft(CAST(1 AS BIGINT), length(w) - 1) - 1)")).as("mask"))
      // i >= 0 guards the 1-char word (sequence(0,-1) descends in Spark)
      .withColumn("bounds", expr(
        """concat(array(0),
          |  transform(filter(sequence(0, length(w) - 2),
          |    i -> i >= 0 AND (shiftright(mask, i) & 1) = 1), c -> c + 1),
          |  array(length(w)))""".stripMargin))
      .withColumn("pieces", expr(
        """transform(sequence(1, size(bounds) - 1),
          |  k -> substring(w, element_at(bounds, k) + 1,
          |                 element_at(bounds, k + 1) - element_at(bounds, k)))""".stripMargin))
      .filter(expr(s"aggregate(pieces, 0, (m, p) -> greatest(m, length(p))) <= $MaxPieceLen"))
      .select(col("w"), col("cw"), col("mask"),
        size(col("pieces")).cast("long").as("np"), explode(col("pieces")).as("piece"))

  /** E-step: the Viterbi-best (w, mask, np) per word under `logp` —
    * decimal-exact score sum, (score DESC, np ASC, mask ASC) tiebreak;
    * segmentations using any out-of-vocab piece die on the join-count
    * check. The window partitions by word type — bounded groups. */
  private def bestSegs(exploded: DataFrame, logp: DataFrame): DataFrame = {
    val byScore = Window.partitionBy("w")
      .orderBy(col("score").desc, col("np").asc, col("mask").asc)
    exploded.join(broadcast(logp), "piece")
      .groupBy("w", "cw", "mask", "np")
      .agg(sum(col("logp")).as("score"), count(lit(1)).as("joined"))
      .filter(col("joined") === col("np"))
      .withColumn("rn", row_number().over(byScore))
      .filter(col("rn") === 1)
      .select("w", "cw", "mask", "np")
  }

  /** M-step: piece occurrence counts under the best segmentations. */
  private def mStep(exploded: DataFrame, best: DataFrame): DataFrame =
    exploded.join(best.select("w", "mask"), Seq("w", "mask"), "left_semi")
      .groupBy("piece").agg(sum(col("cw")).as("cnt"))

  /** chars ∪ top-`keep` multi-char pieces of `candidates` by the counts
    * in `counts` (absent → 0), tiebreak (cnt DESC, piece ASC). */
  private def pruned(candidates: DataFrame, counts: DataFrame, keep: Int): DataFrame = {
    val scored = candidates.select("piece")
      .join(counts, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    scored.filter(length(col("piece")) === 1)
      .unionAll(scored.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(keep))
  }

  /** The full seed → E → M → prune → E → M schedule over an arbitrary
    * word-count frame, as FRAMES — no driver materialization anywhere:
    * returns (final piece table (piece, cnt), round-2 best-segmentation
    * table (w, cw, np), release). The piece table is bounded (≤ 66 rows);
    * the word→np table is one row per word TYPE — at 100 TB that is
    * 10⁷–10⁸ rows, which is exactly why it must stay distributed (the
    * r12 `weak` finding this refactor clears: the old form collected it
    * to the driver and re-broadcast it per encode query). Callers
    * materialize both frames (artifact write / spec collect) BEFORE
    * invoking `release`, which drops the pinned intermediates. */
  private[llm] def trainFrames(words0: DataFrame)
      : (DataFrame, DataFrame, () => Unit) =
    trainFramesWith(words0,
      m => m.orderBy(col("cnt").desc, col("piece")).limit(SeedMulti),
      m => m.orderBy(col("cnt").desc, col("piece")).limit(KeepMulti))

  /** [[trainFrames]] with pluggable MULTI-CHAR selection strategies:
    * `seedMulti` picks the seed's multi-char inventory from the
    * substring counts, `pruneMulti` picks the round-1 survivors from
    * the (piece, M1-count) table — both over (piece, cnt) frames,
    * single chars always kept (segmentation totality). The default is
    * the global top-k; [[Script]]'s balanced trainer budgets the slots
    * PER SCRIPT CLASS (the tokenizer-equity fix), reusing this exact
    * schedule. */
  private[llm] def trainFramesWith(
      words0: DataFrame,
      seedMulti: DataFrame => DataFrame,
      pruneMulti: DataFrame => DataFrame)
      : (DataFrame, DataFrame, () => Unit) = {
    val words = words0.persist()
    val exploded = explodedSegs(words).persist()
    val subs = substringCounts(words)
    val vocab0 = subs.filter(length(col("piece")) === 1)
      .unionAll(seedMulti(subs.filter(length(col("piece")) >= 2)))
    val m1 = mStep(exploded, bestSegs(exploded, logpOf(vocab0)))
    val scored1 = vocab0.select("piece")
      .join(m1, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val vocab1 = scored1.filter(length(col("piece")) === 1)
      .unionAll(pruneMulti(scored1.filter(length(col("piece")) >= 2)))
    // best2 feeds BOTH model tables (m2 → final counts; (w, cw, np) →
    // the encode map) — persist it so the E-step window runs once
    val best2 = bestSegs(exploded, logpOf(vocab1)).persist()
    val m2 = mStep(exploded, best2)
    val finalVocab = vocab1.select("piece")
      .join(m2, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val release = () => {
      words.unpersist(blocking = false)
      exploded.unpersist(blocking = false)
      best2.unpersist(blocking = false)
      ()
    }
    (finalVocab, best2.select("w", "cw", "np"), release)
  }

  /** Crafted-corpus convenience for specs ONLY (bounded inputs by
    * construction): the registered queries never collect the model —
    * they read the standing parquet zone ([[modelZoneRoot]]). */
  private[llm] def trainOver(words0: DataFrame)
      : (Seq[(String, Long)], Seq[(String, Long, Long)]) = {
    val (vocab, wordNp, release) = trainFrames(words0)
    try {
      (vocab.collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
        wordNp.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    } finally release()
  }

  /** Manifest zone names of the standing model artifact. The word-count
    * zone is the trainer's SUFFICIENT STATISTIC: folding a new corpus
    * batch never rescans the base corpus — it merges the batch's word
    * counts into this generation and retrains from there. */
  private[llm] val VocabZone = "unigram_vocab"
  private[llm] val WordNpZone = "unigram_wordnp"
  private[llm] val WordCountZone = "unigram_wordcounts"

  /** (JVM, corpus fingerprint) → the STANDING MODEL ZONE — the trained
    * unigram model persisted as a fingerprint-keyed parquet artifact
    * (the `.model` file a SentencePiece train run ships, in this
    * engine's standing-zone discipline): two generations — the bounded
    * piece table and the per-word-TYPE (w, cw, np) encode map — written
    * via [[graft.Fs.writeParquetAtomic]] and committed through the epoch
    * manifest ([[graft.sources.Maintenance.commitEpochManifest]]), so
    * the model zone reads/retires/time-travels exactly like the ANN
    * zones (readable via `readZoneThroughManifest`, retired via
    * `retentionSweep`). This replaces the r12 driver-side collect: NO
    * corpus-vocabulary-sized table ever materializes on the driver —
    * train writes distributed, encode JOINS the artifact distributively
    * (the planner broadcasts while it is small, shuffles when the
    * vocabulary outgrows the threshold; `ScaleProbe unigramzone` prices
    * both regimes at 10⁶–10⁷ word types). */
  private val zoneMemo = scala.collection.concurrent.TrieMap
    .empty[String, java.io.File]

  /** Build-or-reuse one model zone VARIANT (base Latin model, the
    * multi-script model trained on the planted corpus, …): each variant
    * is its own fingerprint-keyed root trained from its own word-count
    * frame — the `words` thunk only runs on a cold zone. */
  private[llm] def modelZoneFor(
      spark: SparkSession, sfDir: String, variant: String,
      words: => DataFrame,
      train: DataFrame => (DataFrame, DataFrame, () => Unit) = trainFrames)
      : java.io.File =
    zoneMemo.getOrElseUpdate(
      s"$sfDir#$variant@${Bpe.corpusFingerprint(spark, sfDir)}", {
        val key = s"$sfDir#$variant@${Bpe.corpusFingerprint(spark, sfDir)}"
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val root = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), "graft_unigram"), digest)
        val manifestDir = new java.io.File(root, "manifest")
        if (!graft.sources.Maintenance.currentEpoch(spark, manifestDir)
            .exists(_._1 >= 1L)) {
          root.mkdirs()
          // generations under zones/, the commit log beside it — the
          // retentionSweep layout contract (the sweep's guard rejects a
          // manifest dir living inside a swept zone dir). The word
          // counts persist FIRST and training reads them back, so the
          // committed statistic is exactly what the model was trained
          // on (and what a later refresh folds into).
          val zones = new java.io.File(root, "zones")
          val genC = new java.io.File(zones, "wordcounts_gen1").toPath
          graft.Fs.writeParquetAtomic(words, genC)
          val (vocab, wordNp, release) = train(spark.read.parquet(genC.toString))
          val genV = new java.io.File(zones, "vocab_gen1").toPath
          val genW = new java.io.File(zones, "wordnp_gen1").toPath
          graft.Fs.writeParquetAtomic(vocab, genV)
          graft.Fs.writeParquetAtomic(wordNp, genW)
          release()
          graft.sources.Maintenance.commitEpochManifest(spark,
            Seq((VocabZone, genV.toString, "piece"),
              (WordNpZone, genW.toString, "w"),
              (WordCountZone, genC.toString, "w")),
            manifestDir.toPath, epoch = 1L)
        }
        root
      })

  /** INCREMENTAL MODEL REFRESH — fold a document batch into a standing
    * model zone and retrain, never rescanning the base corpus: the
    * standing word-count generation is the trainer's sufficient
    * statistic, so the fold is the batch's own word count (O(batch)) +
    * one zone-sized merge groupBy, and the bounded-vocab EM retrains
    * from the merged table. All three generations (word counts, piece
    * table, word→np map) install as fresh UUID paths and commit as ONE
    * epoch through the CAS ([[graft.sources.Maintenance
    * .commitEpochManifestCas]]) — a racing refresh or takedown loses
    * with the named conflict and zero torn state, and as-of reads keep
    * serving the pre-refresh model until retention retires it. Returns
    * the committed epoch. `UnigramRefreshSpec` pins refresh ≡ rebuild
    * exactly; `text_unigram_refresh` oracles the whole fold cross-engine
    * (the oracle re-learns from scratch over the unioned corpus). */
  private[llm] def refreshModelZone(
      spark: SparkSession, root: java.io.File, batchDocs: DataFrame,
      train: DataFrame => (DataFrame, DataFrame, () => Unit) = trainFrames,
      batchWordCounts: DataFrame => DataFrame = wordCountsOf): Long = {
    val manifestDir = new java.io.File(root, "manifest")
    val (parent, _) = graft.sources.Maintenance
      .currentEpoch(spark, manifestDir)
      .getOrElse(sys.error(s"refreshModelZone: no committed epoch in $manifestDir"))
    val merged = graft.sources.Maintenance
      .readZoneThroughManifest(spark, manifestDir, WordCountZone)
      .unionAll(batchWordCounts(batchDocs))
      .groupBy("w").agg(sum(col("cw")).as("cw"))
    val epoch = parent + 1
    val zones = new java.io.File(root, "zones")
    def gen(name: String) = new java.io.File(zones,
      s"${name}_gen$epoch-${java.util.UUID.randomUUID()}").toPath
    val genC = gen("wordcounts")
    graft.Fs.writeParquetAtomic(merged, genC)
    val (vocab, wordNp, release) = train(spark.read.parquet(genC.toString))
    val genV = gen("vocab")
    val genW = gen("wordnp")
    graft.Fs.writeParquetAtomic(vocab, genV)
    graft.Fs.writeParquetAtomic(wordNp, genW)
    release()
    graft.sources.Maintenance.commitEpochManifestCas(spark,
      Seq((VocabZone, genV.toString, "piece"),
        (WordNpZone, genW.toString, "w"),
        (WordCountZone, genC.toString, "w")),
      manifestDir.toPath, epoch, Some(parent))
    epoch
  }

  private[llm] def modelZoneRoot(
      spark: SparkSession, sfDir: String): java.io.File =
    modelZoneFor(spark, sfDir, "base", wordCounts(spark, sfDir))

  /** The refresh demo's deterministic batch predicate/transform — shared
    * verbatim by the builder and the DuckDB oracle: every 13th doc
    * arrives again REVERSED (genuinely new word statistics, replayable
    * by both engines). */
  private[llm] val RefreshBatchMod = 13L
  private[llm] val RefreshBatchRem = 1L

  /** TAKEDOWN CASCADE into the trained model — the right-to-be-forgotten
    * question every trained artifact eventually faces: a model trained
    * on removed documents still CARRIES their statistics. Because the
    * standing word-count generation is additive, the cascade is exact
    * subtraction: count the removed docs' words (O(takedown)), subtract
    * from the standing statistic (one zone-sized merge; words hitting 0
    * drop out entirely), retrain the bounded-vocab EM, and CAS-commit
    * all three generations as one epoch — the base corpus is never
    * rescanned, and the pre-takedown model stays as-of-readable until
    * retention retires it (the audit window). `text_unigram_forget`'s
    * oracle re-trains FROM SCRATCH on the surviving corpus, so one hash
    * pins cascade ≡ rebuild — the [[graft.llm.Forget]] discipline
    * applied to the tokenizer model zone. Returns the committed epoch. */
  private[llm] def forgetModelZone(
      spark: SparkSession, root: java.io.File, removedDocs: DataFrame,
      train: DataFrame => (DataFrame, DataFrame, () => Unit) = trainFrames,
      batchWordCounts: DataFrame => DataFrame = wordCountsOf): Long = {
    val manifestDir = new java.io.File(root, "manifest")
    val (parent, _) = graft.sources.Maintenance
      .currentEpoch(spark, manifestDir)
      .getOrElse(sys.error(s"forgetModelZone: no committed epoch in $manifestDir"))
    val subtracted = graft.sources.Maintenance
      .readZoneThroughManifest(spark, manifestDir, WordCountZone)
      .unionAll(batchWordCounts(removedDocs)
        .select(col("w"), (-col("cw")).as("cw")))
      .groupBy("w").agg(sum(col("cw")).as("cw"))
      .filter(col("cw") > 0)
    val epoch = parent + 1
    val zones = new java.io.File(root, "zones")
    def gen(name: String) = new java.io.File(zones,
      s"${name}_gen$epoch-${java.util.UUID.randomUUID()}").toPath
    val genC = gen("wordcounts")
    graft.Fs.writeParquetAtomic(subtracted, genC)
    val (vocab, wordNp, release) = train(spark.read.parquet(genC.toString))
    val genV = gen("vocab")
    val genW = gen("wordnp")
    graft.Fs.writeParquetAtomic(vocab, genV)
    graft.Fs.writeParquetAtomic(wordNp, genW)
    release()
    graft.sources.Maintenance.commitEpochManifestCas(spark,
      Seq((VocabZone, genV.toString, "piece"),
        (WordNpZone, genW.toString, "w"),
        (WordCountZone, genC.toString, "w")),
      manifestDir.toPath, epoch, Some(parent))
    epoch
  }

  /** The forget demo's deterministic takedown predicate — shared with
    * the oracle. */
  private[llm] val ForgetMod = 17L
  private[llm] val ForgetRem = 5L

  private def forgetDemoRoot(
      spark: SparkSession, sfDir: String): java.io.File = {
    val root = modelZoneFor(spark, sfDir, "forgetdemo", wordCounts(spark, sfDir))
    val manifestDir = new java.io.File(root, "manifest")
    if (!graft.sources.Maintenance.currentEpoch(spark, manifestDir)
        .exists(_._1 >= 2L)) {
      val removed = Tables.documents(spark, sfDir)
        .filter(col("doc_id") % ForgetMod === ForgetRem)
      try forgetModelZone(spark, root, removed)
      catch {
        case e: graft.sources.EpochConflictException =>
          if (!graft.sources.Maintenance.currentEpoch(spark, manifestDir)
              .exists(_._1 >= 2L)) throw e
      }
    }
    root
  }

  /** EXT: the model AFTER a takedown cascade — the .model report served
    * by the zone's newest epoch once every 17th document's statistics
    * were subtracted and the model retrained ([[forgetModelZone]]). The
    * oracle re-learns from scratch on the SURVIVING corpus only, so one
    * hash pins cascade ≡ rebuild: no removed document's counts leak into
    * the served model. */
  def unigramForget(spark: SparkSession, sfDir: String): DataFrame =
    trainReportOf(graft.sources.Maintenance.readZoneThroughManifest(
      spark, new java.io.File(forgetDemoRoot(spark, sfDir), "manifest"),
      VocabZone))

  /** (JVM, corpus fingerprint) → a model zone that LIVED THROUGH a
    * refresh: epoch 1 trains on the base corpus, epoch 2 is a real
    * [[refreshModelZone]] fold of the deterministic batch (never
    * rescanning the base corpus — the fold reads the standing word-count
    * generation). A cross-JVM racer may win the epoch-2 CAS; its state
    * is deterministic and identical, so losing IS completion here. */
  private def refreshDemoRoot(
      spark: SparkSession, sfDir: String): java.io.File = {
    val root = modelZoneFor(spark, sfDir, "refreshdemo", wordCounts(spark, sfDir))
    val manifestDir = new java.io.File(root, "manifest")
    if (!graft.sources.Maintenance.currentEpoch(spark, manifestDir)
        .exists(_._1 >= 2L)) {
      val batch = Tables.documents(spark, sfDir)
        .filter(col("doc_id") % RefreshBatchMod === RefreshBatchRem)
        .select(col("doc_id"), reverse(col("text")).as("text"))
      try refreshModelZone(spark, root, batch)
      catch {
        case e: graft.sources.EpochConflictException =>
          if (!graft.sources.Maintenance.currentEpoch(spark, manifestDir)
              .exists(_._1 >= 2L)) throw e
      }
    }
    root
  }

  /** EXT: the INCREMENTALLY REFRESHED model — the .model report served
    * by the zone's NEWEST epoch after a real batch fold
    * ([[refreshModelZone]]: O(batch) word counting + zone-sized merge +
    * bounded-vocab retrain + one CAS epoch commit; the base corpus is
    * never rescanned). The oracle knows nothing of the fold: it
    * re-learns the full schedule FROM SCRATCH over the unioned corpus —
    * so one hash pins fold ≡ rebuild cross-engine, the append≡rebuild
    * discipline the IVF/band-index families use, applied to the
    * tokenizer model zone. */
  def unigramRefresh(spark: SparkSession, sfDir: String): DataFrame =
    trainReportOf(graft.sources.Maintenance.readZoneThroughManifest(
      spark, new java.io.File(refreshDemoRoot(spark, sfDir), "manifest"),
      VocabZone))

  private def modelZone(
      spark: SparkSession, sfDir: String, zone: String): DataFrame =
    graft.sources.Maintenance.readZoneThroughManifest(spark,
      new java.io.File(modelZoneRoot(spark, sfDir), "manifest"), zone)

  /** The trained piece table (piece, cnt), read through the model zone's
    * epoch manifest. */
  private def vocabFrame(spark: SparkSession, sfDir: String): DataFrame =
    modelZone(spark, sfDir, VocabZone)

  /** The word→np encode map, read through the model zone's epoch
    * manifest. Joined DISTRIBUTIVELY by every encode-side query — no
    * broadcast hint on purpose: the planner broadcasts while the
    * artifact is under the threshold and falls back to a shuffle join
    * when the vocabulary outgrows it, so the plan survives a 100× vocab
    * scale-up without a driver-memory cliff. */
  private def npFrame(spark: SparkSession, sfDir: String): DataFrame =
    modelZone(spark, sfDir, WordNpZone).select("w", "np")

  /** EXT: the learned unigram-LM piece table — final Viterbi counts and
    * add-one log-probs of every surviving piece after seed → EM round →
    * prune → EM round. This IS the .model file a SentencePiece-style
    * train run ships. */
  /** The .model report (piece, piece_len, cnt, logp) off a piece-table
    * frame — shared by the base and multi-script train queries. The
    * normalizer is a 1-row aggregate attach (the scalar-broadcast
    * pattern), never a driver-side sum over a collected model. */
  private[llm] def trainReportOf(vocab: DataFrame): DataFrame = {
    val norm = vocab.agg(sum(col("cnt")).as("tot"), count(lit(1)).as("v"))
    vocab.crossJoin(broadcast(norm))
      .select(col("piece"),
        length(col("piece")).cast("int").as("piece_len"),
        col("cnt"),
        round(log((col("cnt") + lit(1.0)) / (col("tot") + col("v"))), 6).as("logp"))
      .orderBy(col("cnt").desc, col("piece"))
  }

  def unigramTrain(spark: SparkSession, sfDir: String): DataFrame =
    trainReportOf(vocabFrame(spark, sfDir))

  /** EXT: per-language fertility of the trained UNIGRAM encoder beside
    * the trained BPE encoder — the tokenizer-selection table (which
    * vocab family compresses which language better, the call every
    * multilingual train run makes between exactly these two families).
    * The unigram encode is the word-type np map applied back to word
    * occurrences (one corpus-words scan + a distributed join against the
    * standing word→np artifact — planner-broadcast while small);
    * the BPE side is [[Bpe.bpeFertility]]'s registry-memoized encode.
    * Chars differ by each tokenizer's own preprocessing (BPE: cleaned
    * doc prefix; unigram: per-word truncation), so each reports its own
    * chars — the per-language RATIO columns are the comparison. */
  def unigramFertility(spark: SparkSession, sfDir: String): DataFrame = {
    val docWords = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        explode(split(trim(regexp_replace(lower(col("text")), "[^a-z]+", " ")), " ")).as("w0"))
      .filter(length(col("w0")) >= 1)
      .select(col("doc_id"), col("lang"), substring(col("w0"), 1, MaxWordLen).as("w"))
    val uni = docWords.join(npFrame(spark, sfDir), "w")
      .groupBy("lang")
      .agg(sum(length(col("w"))).cast("long").as("uni_chars"),
        sum(col("np")).as("uni_tokens"))
    val bpe = Bpe.bpeFertility(spark, sfDir)
      .select(col("lang"), col("n_docs"),
        col("chars").as("bpe_chars"), col("tokens").as("bpe_tokens"))
    bpe.join(uni, "lang")
      .withColumn("bpe_cpt_micro", expr("bpe_chars * 1000000 div bpe_tokens"))
      .withColumn("uni_cpt_micro", expr("uni_chars * 1000000 div uni_tokens"))
      .orderBy("lang")
  }

  /** EXT: context-window packing on the TRAINED unigram encoder —
    * [[Bpe.packBpeSequences]]'s composition for the second tokenizer
    * family: per-doc token counts come from the word-type np map (one
    * corpus-words scan + a distributed join against the standing
    * word→np artifact — the encode a SentencePiece deployment runs,
    * planner-broadcast while small), then the same hierarchical
    * cumsum-÷-budget assigns context windows. Oracle replays the full
    * unigram schedule, the per-doc encode, and the cumsum — the second
    * train→encode→pack chain pinned cross-engine end to end. */
  def packUnigramSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        explode(split(trim(regexp_replace(lower(col("text")), "[^a-z]+", " ")), " ")).as("w0"))
      .filter(length(col("w0")) >= 1)
      .select(col("doc_id"), col("lang"), substring(col("w0"), 1, MaxWordLen).as("w"))
      .join(npFrame(spark, sfDir), "w")
      .groupBy("doc_id", "lang")
      .agg(sum(col("np")).as("toks"))
    Sampling.cumBeforeByLang(perDoc.select("doc_id", "lang", "toks"))
      .withColumn("bin", expr(s"cum_before div ${Sampling.PackBudget}"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"))
      .orderBy("lang", "bin")
  }

  /** EXT: the per-document encode report — token count, char count, and
    * chars-per-token compression under the TRAINED unigram model (the
    * loader-facing numbers a packing/budgeting stage consumes), the
    * [[Bpe.bpeEncode]] surface for the second tokenizer family. One
    * corpus-words scan + the standing word→np artifact join; integer
    * micro-grid ratio. Docs with no a-z words carry no tokens and are
    * absent, exactly as BPE's encode drops its sub-2-char docs. */
  def unigramEncode(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(split(trim(regexp_replace(lower(col("text")), "[^a-z]+", " ")), " ")).as("w0"))
      .filter(length(col("w0")) >= 1)
      .select(col("doc_id"), substring(col("w0"), 1, MaxWordLen).as("w"))
      .join(npFrame(spark, sfDir), "w")
      .groupBy("doc_id")
      .agg(sum(length(col("w"))).cast("long").as("n_chars_seen"),
        sum(col("np")).as("n_tokens"))
      .withColumn("chars_per_token_micro",
        expr("n_chars_seen * 1000000 div n_tokens"))
      .orderBy("doc_id")
  }

  /** Prune budgets the sizing sweep prices. */
  val SweepKeeps = Seq(10, 20, KeepMulti)

  /** EXT: the unigram VOCAB-SIZING curve — corpus compression at three
    * prune budgets (10/20/30 retained multi-char pieces), the
    * [[Bpe.bpeSweep]] table for the second family: every vocab-size
    * decision trades piece-table size against chars-per-token along
    * exactly this curve. ONE seed → E1 → M1 chain feeds every budget
    * (pruning is a take-k of the round-1 counts, so only the cheap
    * round-2 segmentation re-runs per point — the oracle replays the
    * same sharing); tokens are corpus-weighted (np · word count). */
  def unigramSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val words = wordCounts(spark, sfDir).persist()
    val exploded = explodedSegs(words).persist()
    val subs = substringCounts(words)
    val vocab0 = subs.filter(length(col("piece")) === 1)
      .unionAll(subs.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(SeedMulti))
    val m1 = mStep(exploded, bestSegs(exploded, logpOf(vocab0)))
      .persist()
    val rows = SweepKeeps.map { keep =>
      bestSegs(exploded, logpOf(pruned(vocab0, m1, keep)))
        .agg(count(lit(1)).as("n_word_types"),
          sum(col("cw") * length(col("w"))).cast("long").as("chars"),
          sum(col("cw") * col("np")).as("tokens"))
        .select(lit(keep).as("keep_multi"),
          col("n_word_types"), col("chars"), col("tokens"),
          expr("chars * 1000000 div tokens").as("chars_per_token_micro"))
    }
    val out = rows.reduce(_.unionAll(_)).orderBy("keep_multi")
    // consume through a final cut so the sweep result doesn't re-run
    // three E2 passes per downstream action, then drop the pinned inputs
    val (res, _, _) = org.apache.spark.sql.graft.PlanBridge.cutLineage(out)
    words.unpersist(blocking = false)
    exploded.unpersist(blocking = false)
    m1.unpersist(blocking = false)
    res
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_unigram_train" -> (unigramTrain _),
    "text_unigram_fertility" -> (unigramFertility _),
    "text_unigram_encode" -> (unigramEncode _),
    "text_unigram_sweep" -> (unigramSweep _),
    "pack_unigram_sequences" -> (packUnigramSequences _),
    "text_unigram_refresh" -> (unigramRefresh _),
    "text_unigram_forget" -> (unigramForget _),
  )

  // ------------------------------------------------------------- oracles

  /** The shared first half of the re-learned schedule (seed → E1 → M1) —
    * the prune-budget sweep replays ONLY its second half per budget, so
    * the expensive enumeration + round-1 counts are one chain. */
  private def unigramCtes: Seq[String] = unigramCtesWith(latinWordsCte)

  private def baseCtes: Seq[String] =
    unigramCtes.takeWhile(!_.startsWith("u_vocab1 "))

  /** Round-2 CTEs (prune → logp → E2) for an arbitrary prune budget,
    * name-suffixed so several budgets coexist in one oracle. */
  private def round2Ctes(keep: Int, sfx: String): Seq[String] = Seq(
    s"""u_vocab1$sfx AS (
       |  SELECT v.piece, COALESCE(m.cnt, 0) AS cnt
       |  FROM u_vocab0 v LEFT JOIN u_m1 m ON v.piece = m.piece WHERE length(v.piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT v.piece, COALESCE(m.cnt, 0) AS cnt
       |    FROM u_vocab0 v LEFT JOIN u_m1 m ON v.piece = m.piece WHERE length(v.piece) >= 2
       |    ORDER BY COALESCE(m.cnt, 0) DESC, v.piece LIMIT $keep))""".stripMargin,
    s"""u_logp1$sfx AS (
       |  SELECT piece, CAST(round(ln((cnt + 1.0) / (tot + v)), 6) AS DECIMAL(12,6)) AS logp
       |  FROM u_vocab1$sfx, (SELECT CAST(SUM(cnt) AS BIGINT) AS tot, COUNT(*) AS v FROM u_vocab1$sfx))""".stripMargin,
    s"""u_best2$sfx AS (
       |  SELECT w, cw, mask, np FROM (
       |    SELECT e.w, e.cw, e.mask, e.np, row_number() OVER (PARTITION BY e.w
       |        ORDER BY SUM(l.logp) DESC, e.np ASC, e.mask ASC) AS rn
       |    FROM u_exploded e JOIN u_logp1$sfx l ON e.piece = l.piece
       |    GROUP BY e.w, e.cw, e.mask, e.np HAVING COUNT(*) = e.np) q WHERE rn = 1)""".stripMargin,
  )

  /** The default (Latin-normalized) u_words CTE. */
  private[llm] def latinWordsCte: String =
    s"""u_words AS (
       |  SELECT substr(w0, 1, $MaxWordLen) AS w, count(*) AS cw FROM (
       |    SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS w0
       |    FROM documents) t
       |  WHERE length(w0) >= 1 GROUP BY 1)""".stripMargin

  /** The full re-learned unigram schedule as CTEs (u_-prefixed so they
    * compose beside the BPE chain in the fertility comparison).
    * Parameterized over the u_words CTE: everything downstream of the
    * word-count table is ALPHABET-AGNOSTIC (length/substr/bitmask work on
    * any codepoints; string order is binary = codepoint order in both
    * engines), so the multi-script trainer ([[Script]]) re-learns the
    * identical schedule by swapping in an aware-normalized u_words. */
  private[llm] def unigramCtesWith(wordsCte: String): Seq[String] = Seq(
    wordsCte,
    s"""u_subs AS (
       |  SELECT piece, CAST(SUM(cw) AS BIGINT) AS cnt FROM (
       |    SELECT cw, unnest(flatten(list_transform(range(1, length(w)+1),
       |      s -> list_transform(range(1, ${MaxPieceLen + 1}),
       |        l -> CASE WHEN s + l - 1 <= length(w) THEN substr(w, CAST(s AS INTEGER), CAST(l AS INTEGER)) END)))) AS piece
       |    FROM u_words) x
       |  WHERE piece IS NOT NULL GROUP BY 1)""".stripMargin,
    s"""u_vocab0 AS (
       |  SELECT piece, cnt FROM u_subs WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (SELECT piece, cnt FROM u_subs WHERE length(piece) >= 2
       |                          ORDER BY cnt DESC, piece LIMIT $SeedMulti))""".stripMargin,
    """u_logp0 AS (
      |  SELECT piece, CAST(round(ln((cnt + 1.0) / (tot + v)), 6) AS DECIMAL(12,6)) AS logp
      |  FROM u_vocab0, (SELECT CAST(SUM(cnt) AS BIGINT) AS tot, COUNT(*) AS v FROM u_vocab0))""".stripMargin,
    s"""u_exploded AS (
       |  SELECT w, cw, mask, CAST(len(pieces) AS BIGINT) AS np, unnest(pieces) AS piece FROM (
       |    SELECT w, cw, mask,
       |      list_transform(range(0, CAST(len(bounds) AS BIGINT) - 1),
       |        k -> substr(w, CAST(bounds[CAST(k AS INTEGER)+1] + 1 AS INTEGER),
       |                       CAST(bounds[CAST(k AS INTEGER)+2] - bounds[CAST(k AS INTEGER)+1] AS INTEGER))) AS pieces
       |    FROM (
       |      SELECT w, cw, mask,
       |        [0] || list_transform(list_filter(range(0, length(w)-1), i -> ((mask >> i) & 1) = 1), c -> c + 1)
       |            || [CAST(length(w) AS BIGINT)] AS bounds
       |      FROM (SELECT w, cw, CAST(unnest(range(0, 1 << (length(w) - 1))) AS BIGINT) AS mask FROM u_words) m) b) s
       |  WHERE list_max(list_transform(pieces, p -> length(p))) <= $MaxPieceLen)""".stripMargin,
    """u_best1 AS (
      |  SELECT w, mask FROM (
      |    SELECT e.w, e.mask, row_number() OVER (PARTITION BY e.w
      |        ORDER BY SUM(l.logp) DESC, e.np ASC, e.mask ASC) AS rn
      |    FROM u_exploded e JOIN u_logp0 l ON e.piece = l.piece
      |    GROUP BY e.w, e.mask, e.np HAVING COUNT(*) = e.np) q WHERE rn = 1)""".stripMargin,
    """u_m1 AS (
      |  SELECT e.piece, CAST(SUM(e.cw) AS BIGINT) AS cnt
      |  FROM u_exploded e JOIN u_best1 b ON e.w = b.w AND e.mask = b.mask
      |  GROUP BY 1)""".stripMargin,
    s"""u_vocab1 AS (
       |  SELECT v.piece, COALESCE(m.cnt, 0) AS cnt
       |  FROM u_vocab0 v LEFT JOIN u_m1 m ON v.piece = m.piece WHERE length(v.piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT v.piece, COALESCE(m.cnt, 0) AS cnt
       |    FROM u_vocab0 v LEFT JOIN u_m1 m ON v.piece = m.piece WHERE length(v.piece) >= 2
       |    ORDER BY COALESCE(m.cnt, 0) DESC, v.piece LIMIT $KeepMulti))""".stripMargin,
    """u_logp1 AS (
      |  SELECT piece, CAST(round(ln((cnt + 1.0) / (tot + v)), 6) AS DECIMAL(12,6)) AS logp
      |  FROM u_vocab1, (SELECT CAST(SUM(cnt) AS BIGINT) AS tot, COUNT(*) AS v FROM u_vocab1))""".stripMargin,
    """u_best2 AS (
      |  SELECT w, mask, np FROM (
      |    SELECT e.w, e.mask, e.np, row_number() OVER (PARTITION BY e.w
      |        ORDER BY SUM(l.logp) DESC, e.np ASC, e.mask ASC) AS rn
      |    FROM u_exploded e JOIN u_logp1 l ON e.piece = l.piece
      |    GROUP BY e.w, e.mask, e.np HAVING COUNT(*) = e.np) q WHERE rn = 1)""".stripMargin,
    """u_m2 AS (
      |  SELECT e.piece, CAST(SUM(e.cw) AS BIGINT) AS cnt
      |  FROM u_exploded e JOIN u_best2 b ON e.w = b.w AND e.mask = b.mask
      |  GROUP BY 1)""".stripMargin,
    """u_final AS (
      |  SELECT v.piece, COALESCE(m.cnt, 0) AS cnt
      |  FROM u_vocab1 v LEFT JOIN u_m2 m ON v.piece = m.piece)""".stripMargin,
  )

  // NOTE: the CTE blocks are concatenated OUTSIDE any stripMargin — an
  // outer stripMargin would re-strip the embedded (already-stripped)
  // lines and eat one `|` from a line-leading `||` list concat.
  /** u_words over the base ∪ refreshed-batch corpus — the refresh
    * oracle's from-scratch statistic (counting is additive, so the
    * zone fold must equal this exactly). */
  private def refreshWordsCte: String =
    s"""u_words AS (
       |  SELECT substr(w0, 1, $MaxWordLen) AS w, count(*) AS cw FROM (
       |    SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS w0
       |    FROM (SELECT text FROM documents
       |          UNION ALL
       |          SELECT reverse(text) FROM documents
       |          WHERE doc_id % $RefreshBatchMod = $RefreshBatchRem) u) t
       |  WHERE length(w0) >= 1 GROUP BY 1)""".stripMargin

  /** u_words over the SURVIVING corpus — the forget oracle's
    * from-scratch statistic. */
  private def forgetWordsCte: String =
    s"""u_words AS (
       |  SELECT substr(w0, 1, $MaxWordLen) AS w, count(*) AS cw FROM (
       |    SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS w0
       |    FROM documents WHERE doc_id % $ForgetMod <> $ForgetRem) t
       |  WHERE length(w0) >= 1 GROUP BY 1)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "text_unigram_forget" ->
      (unigramCtesWith(forgetWordsCte).mkString("WITH ", ",\n", "") + "\n" +
      s"""SELECT piece, CAST(length(piece) AS INTEGER) AS piece_len, CAST(cnt AS BIGINT) AS cnt,
         |  round(ln((cnt + 1.0) / (tot + v)), 6) AS logp
         |FROM u_final, (SELECT CAST(SUM(cnt) AS BIGINT) AS tot, COUNT(*) AS v FROM u_final)
         |ORDER BY cnt DESC, piece""".stripMargin),
    "text_unigram_refresh" ->
      (unigramCtesWith(refreshWordsCte).mkString("WITH ", ",\n", "") + "\n" +
      s"""SELECT piece, CAST(length(piece) AS INTEGER) AS piece_len, CAST(cnt AS BIGINT) AS cnt,
         |  round(ln((cnt + 1.0) / (tot + v)), 6) AS logp
         |FROM u_final, (SELECT CAST(SUM(cnt) AS BIGINT) AS tot, COUNT(*) AS v FROM u_final)
         |ORDER BY cnt DESC, piece""".stripMargin),
    "text_unigram_train" ->
      (unigramCtes.mkString("WITH ", ",\n", "") + "\n" +
      s"""SELECT piece, CAST(length(piece) AS INTEGER) AS piece_len, CAST(cnt AS BIGINT) AS cnt,
         |  round(ln((cnt + 1.0) / (tot + v)), 6) AS logp
         |FROM u_final, (SELECT CAST(SUM(cnt) AS BIGINT) AS tot, COUNT(*) AS v FROM u_final)
         |ORDER BY cnt DESC, piece""".stripMargin),
    "text_unigram_fertility" ->
      ((Bpe.oracleCteList(Bpe.Rounds) ++ unigramCtes).mkString("WITH ", ",\n", "") + ",\n" +
      s"""bpe_enc AS (
         |  SELECT doc_id,
         |    CAST(length(state) AS BIGINT)
         |      - 2 * CAST(len(string_split(substr(state, 2, length(state)-2), '||')) AS BIGINT) AS n_chars_clean,
         |    CAST(len(string_split(substr(state, 2, length(state)-2), '||')) AS BIGINT) AS n_tokens
         |  FROM s${Bpe.Rounds}
         |), bpe_lang AS (
         |  SELECT d.lang, COUNT(*) AS n_docs,
         |    CAST(SUM(e.n_chars_clean) AS BIGINT) AS bpe_chars,
         |    CAST(SUM(e.n_tokens) AS BIGINT) AS bpe_tokens
         |  FROM bpe_enc e JOIN documents d ON e.doc_id = d.doc_id
         |  GROUP BY d.lang
         |), u_docw AS (
         |  SELECT doc_id, lang, substr(w0, 1, $MaxWordLen) AS w FROM (
         |    SELECT doc_id, lang,
         |      unnest(string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS w0
         |    FROM documents) t
         |  WHERE length(w0) >= 1
         |), uni_lang AS (
         |  SELECT d.lang,
         |    CAST(SUM(length(d.w)) AS BIGINT) AS uni_chars,
         |    CAST(SUM(b.np) AS BIGINT) AS uni_tokens
         |  FROM u_docw d JOIN u_best2 b ON d.w = b.w
         |  GROUP BY d.lang
         |)
         |SELECT b.lang, b.n_docs, b.bpe_chars, b.bpe_tokens, u.uni_chars, u.uni_tokens,
         |  b.bpe_chars * 1000000 // b.bpe_tokens AS bpe_cpt_micro,
         |  u.uni_chars * 1000000 // u.uni_tokens AS uni_cpt_micro
         |FROM bpe_lang b JOIN uni_lang u ON b.lang = u.lang
         |ORDER BY b.lang""".stripMargin),
    "text_unigram_encode" ->
      (unigramCtes.mkString("WITH ", ",\n", "") + ",\n" +
      s"""u_docw AS (
         |  SELECT doc_id, substr(w0, 1, $MaxWordLen) AS w FROM (
         |    SELECT doc_id,
         |      unnest(string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS w0
         |    FROM documents) t
         |  WHERE length(w0) >= 1
         |)
         |SELECT d.doc_id,
         |  CAST(SUM(length(d.w)) AS BIGINT) AS n_chars_seen,
         |  CAST(SUM(b.np) AS BIGINT) AS n_tokens,
         |  CAST(SUM(length(d.w)) AS BIGINT) * 1000000
         |    // CAST(SUM(b.np) AS BIGINT) AS chars_per_token_micro
         |FROM u_docw d JOIN u_best2 b ON d.w = b.w
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin),
    "text_unigram_sweep" ->
      ((baseCtes ++ SweepKeeps.flatMap(k => round2Ctes(k, s"_k$k")))
        .mkString("WITH ", ",\n", "") + "\n" +
      "SELECT * FROM (\n" +
      SweepKeeps.map { k =>
        s"""  SELECT CAST($k AS INTEGER) AS keep_multi,
           |    COUNT(*) AS n_word_types,
           |    CAST(SUM(cw * length(w)) AS BIGINT) AS chars,
           |    CAST(SUM(cw * np) AS BIGINT) AS tokens,
           |    CAST(SUM(cw * length(w)) AS BIGINT) * 1000000
           |      // CAST(SUM(cw * np) AS BIGINT) AS chars_per_token_micro
           |  FROM u_best2_k$k""".stripMargin
      }.mkString("\n  UNION ALL\n") +
      "\n) ORDER BY keep_multi"),
    "pack_unigram_sequences" ->
      (unigramCtes.mkString("WITH ", ",\n", "") + ",\n" +
      s"""u_docw AS (
         |  SELECT doc_id, lang, substr(w0, 1, $MaxWordLen) AS w FROM (
         |    SELECT doc_id, lang,
         |      unnest(string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ')) AS w0
         |    FROM documents) t
         |  WHERE length(w0) >= 1
         |), enc AS (
         |  SELECT d.doc_id, d.lang, CAST(SUM(b.np) AS BIGINT) AS toks
         |  FROM u_docw d JOIN u_best2 b ON d.w = b.w
         |  GROUP BY d.doc_id, d.lang
         |), c AS (
         |  SELECT lang, toks,
         |    CAST(COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM enc
         |)
         |SELECT lang, CAST(cum_before // ${Sampling.PackBudget} AS BIGINT) AS bin,
         |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens
         |FROM c GROUP BY lang, cum_before // ${Sampling.PackBudget}
         |ORDER BY lang, bin""".stripMargin),
  )
}
