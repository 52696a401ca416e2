package graft.llm

import graft.{QueryModule, Tables}
import graft.functions.Hashing
import graft.queries.Ml
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Two further shipping variants slot an extra stage between gate and
  * mask — exactly where a production chain runs them:
  *  - [[refineryDedupPack]]: NEAR-DUP CLUSTER-REPRESENTATIVE removal
  *    (the `dedup_clusters` connected components; keep the min-doc_id
  *    canonical per cluster, drop the rest) — `refinery_pack` masks
  *    duplicated SPANS but still ships both members of every
  *    whole-document near-dup pair; this variant doesn't.
  *  - [[refineryDecontaminated]]: BENCHMARK DECONTAMINATION (the
  *    `decontaminate` 5-gram-overlap rule) — drop the eval slice and
  *    every doc sharing a 5-gram with it before packing.
  *
  * Every stage consumes a registry artifact the standalone queries also
  * report on (`curate_classifier`, `text_dedup_spans_exact`,
  * `dedup_clusters`, `decontaminate`, `pack_sequences`), so the
  * compositions add NO new trust surface — and each DuckDB oracle
  * replays its WHOLE chain from scratch (re-train + re-threshold,
  * re-sort the suffixes, re-derive the clusters / the contamination
  * set, re-pack), which makes these hashes the deepest cross-engine
  * statements in the suite: a drift anywhere in gate, spans, cluster
  * closure, contamination rule, masking arithmetic, or packing breaks
  * them.
  *
  * Scale shape: the gate is a literal-weight projection folded into the
  * scan; the span charge is one duplication-bounded aggregate + a left
  * join on the corpus key; cluster losers come from the banded-candidate
  * component solve (never corpus×corpus), contamination from a
  * broadcast semi-join of the tiny benchmark gram set; packing is the
  * hierarchical (lang, doc_id-block) prefix
  * ([[Sampling.cumBeforeByLang]] — no single-task per-language window).
  * Nothing here shuffles more than the standalone parts already did.
  */
object Refinery extends QueryModule {

  /** The classifier-gated corpus: (doc_id, lang, n_words) of every doc
    * the registered quality model keeps — stage 1 of every refinery
    * variant.
    */
  private[llm] def gatedDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val (w1, w2, b, thr) = Ml.curateModel(spark, sfDir)
    Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "lang",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_words",
        s"${Ml.LogregFeats1} AS x1",
        s"${Ml.LogregFeats2} AS x2")
      .filter(expr(s"${Ml.logregSig(w1, w2, b)} >= $thr"))
  }

  /** Stages 2+3 shared by every variant: charge each surviving doc for
    * its duplicated-span mass, then pack the post-mask token counts —
    * the hierarchical per-lang prefix ÷ budget, reported per bin.
    */
  private def maskAndPack(
      spark: SparkSession, sfDir: String, survivors: DataFrame): DataFrame = {
    val cut = SuffixDedup.dupSpansExact(spark, sfDir)
      .groupBy("doc_id").agg(sum(col("span_words")).as("cut_words"))
    Sampling.cumBeforeByLang(
        survivors.join(cut, Seq("doc_id"), "left")
          .select(col("doc_id"), col("lang"),
            (col("n_words") - coalesce(col("cut_words"), lit(0L))).as("toks")))
      .withColumn("bin", expr(s"cum_before div ${Sampling.PackBudget}"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"))
      .orderBy("lang", "bin")
  }

  def refineryPack(spark: SparkSession, sfDir: String): DataFrame =
    maskAndPack(spark, sfDir, gatedDocs(spark, sfDir))

  /** gate ∘ cluster-representative dedup ∘ mask ∘ pack: between gate and
    * mask, drop every NON-CANONICAL member of the `dedup_clusters`
    * near-dup components (survivor = min doc_id per cluster — the
    * transitive-consistent representative rule; docs in no cluster pass
    * through). Closes the round-7 gap: `refinery_pack` charged docs for
    * duplicated spans but still shipped BOTH members of every
    * whole-document near-dup pair.
    */
  def refineryDedupPack(spark: SparkSession, sfDir: String): DataFrame = {
    val losers = Dedup.dedupClusters(spark, sfDir)
      .filter(!col("canonical")).select("doc_id")
    maskAndPack(spark, sfDir,
      gatedDocs(spark, sfDir).join(losers, Seq("doc_id"), "left_anti"))
  }

  /** gate ∘ eval decontamination ∘ mask ∘ pack: between gate and mask,
    * drop the benchmark slice itself AND every doc sharing a word
    * 5-gram with it (the `decontaminate` rule — the pass a real
    * pipeline runs before packing so eval answers never enter a
    * context window). The contamination set rides the broadcast
    * bench-gram semi-join; everything else is the shared chain.
    */
  def refineryDecontaminated(spark: SparkSession, sfDir: String): DataFrame = {
    val clean = Curation.decontaminate(Tables.documents(spark, sfDir))
      .select("doc_id")
    maskAndPack(spark, sfDir,
      gatedDocs(spark, sfDir).join(clean, Seq("doc_id"), "left_semi"))
  }

  /** THE FULL CHAIN — every shipping stage in one oracled query:
    *
    *   gate ∘ eval decontamination ∘ cluster-representative dedup ∘
    *   suffix-span mask ∘ pack
    *
    * Survivors = gated ∩ decontaminated \ cluster-losers: the two
    * removals are set filters on the corpus key, so they commute — and
    * clusters are the FULL-corpus registry artifact, deliberately: if
    * decontamination removes a cluster's canonical, the cluster dies
    * entirely rather than promoting a contaminated-adjacent near-dup to
    * representative (the conservative call a real pipeline makes). One
    * hash pins five tiers at once — the DuckDB oracle re-trains the
    * classifier, re-derives the contamination set, re-closes the
    * clusters recursively, re-sorts the suffixes, and re-packs.
    */
  /** Stage-ATTRITION waterfall — the one table every pipeline review
    * reads first: docs and tokens surviving after each refinery stage
    * (raw → classifier gate → decontamination → cluster-representative
    * dedup → span mask), so "where did my corpus go" has a number per
    * stage instead of only the end-to-end residue `refinery_full`
    * reports. Token counts are pre-mask through stage 3 (whole docs
    * drop) and post-mask at stage 4 (tokens drop, docs don't) — the mask
    * stage's doc count EQUALS stage 3's by construction, which the
    * waterfall shows rather than asserts. One oracle replays the whole
    * chain (classifier retrain, contamination set, cluster closure,
    * suffix spans) and counts after each filter — five stage hashes for
    * the price of one.
    */
  def refineryWaterfall(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nw"))
    val gated = gatedDocs(spark, sfDir).select(col("doc_id"), col("n_words").as("nw"))
    val clean = Curation.decontaminate(Tables.documents(spark, sfDir))
      .select("doc_id")
    val losers = Dedup.dedupClusters(spark, sfDir)
      .filter(!col("canonical")).select("doc_id")
    val decon = gated.join(clean, Seq("doc_id"), "left_semi")
    val deduped = decon.join(losers, Seq("doc_id"), "left_anti")
    val cut = SuffixDedup.dupSpansExact(spark, sfDir)
      .groupBy("doc_id").agg(sum(col("span_words")).as("cut_words"))
    val masked = deduped.join(cut, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("nw") - coalesce(col("cut_words"), lit(0L))).as("nw"))
    def stage(i: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("nw")), lit(0L)).as("tokens"))
        .select(lit(i).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("tokens"))
    Seq(stage(0, "raw", raw), stage(1, "gate", gated),
        stage(2, "decontaminate", decon), stage(3, "dedup", deduped),
        stage(4, "mask", masked))
      .reduce(_.unionAll(_)).orderBy("stage")
  }

  /** gate ∘ IMAGE-cluster-representative dedup ∘ mask ∘ pack — the
    * multimodal stage composed into the curation surface: a doc whose
    * image payload is a NON-canonical member of a perceptual (aHash)
    * near-dup cluster ([[Multimodal.mmAhashClusters]]) is dropped before
    * packing — the image-near-dup-propagates-to-doc rule a real
    * multimodal pipeline applies (a re-encoded/cropped copy of an image
    * marks its OWNING document as a duplicate, whatever its text says).
    * Media id = doc_id (the mediaTable contract), so the loser set is a
    * key anti-join; the cluster solve is the banded-chunk candidate
    * pipeline + ConnectedComponents, never corpus×corpus. The DuckDB
    * oracle replays the whole chain — classifier retrain, aHash pair
    * graph, recursive cluster closure, suffix spans, packing — so one
    * hash pins the multimodal tier composed with all four text tiers.
    */
  def refineryMmDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val mmLosers = Multimodal.mmAhashClusters(spark, sfDir)
      .filter(!col("canonical")).select(col("id").as("doc_id"))
    maskAndPack(spark, sfDir,
      gatedDocs(spark, sfDir).join(mmLosers, Seq("doc_id"), "left_anti"))
  }

  /** gate ∘ SEMANTIC (embedding) dedup ∘ mask ∘ pack — the third member
    * of the near-dup-propagates-to-doc family: `refinery_dedup_pack`
    * drops text near-dups, `refinery_mm_dedup` drops image near-dups,
    * this drops docs whose EMBEDDING is a SemDeDup loser (some
    * smaller-id vector in its k-means cell at cosine ≥ τ) — the
    * cluster-bounded semantic pass SemDeDup (arXiv:2303.09540) runs at
    * corpus scale. Docs without a vector pass through (left_anti on the
    * loser ids). The oracle replays classifier retrain + centroid
    * assignment + within-cell pair verdict + suffix spans + packing
    * under one hash.
    */
  def refinerySemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val semLosers = Similarity.dedupSemantic(spark, sfDir)
      .filter(!col("keep")).select(col("vec_id").as("doc_id"))
    maskAndPack(spark, sfDir,
      gatedDocs(spark, sfDir).join(semLosers, Seq("doc_id"), "left_anti"))
  }

  def refineryFull(spark: SparkSession, sfDir: String): DataFrame = {
    val clean = Curation.decontaminate(Tables.documents(spark, sfDir))
      .select("doc_id")
    val losers = Dedup.dedupClusters(spark, sfDir)
      .filter(!col("canonical")).select("doc_id")
    maskAndPack(spark, sfDir,
      gatedDocs(spark, sfDir)
        .join(clean, Seq("doc_id"), "left_semi")
        .join(losers, Seq("doc_id"), "left_anti"))
  }

  /** THE FULL CHAIN ∘ EPOCH SERVE ORDER — the deepest composition in the
    * suite: gate ∘ decontaminate ∘ cluster-representative dedup ∘
    * suffix-span mask ∘ pack ∘ per-epoch deterministic reshuffle
    * ([[Sampling.epochOrderOf]] over [[refineryFull]]'s windows). This IS
    * the artifact a training run walks: for each epoch, the exact order
    * in which the refined corpus's context windows are served. One hash
    * pins SEVEN tiers — the DuckDB oracle re-trains the classifier,
    * re-derives the contamination set, re-closes the clusters, re-sorts
    * the suffixes, re-packs, re-keys, and re-ranks. The rank is the
    * blocked global prefix (≤4096 hash-key blocks per epoch) — no
    * unpartitioned window anywhere in the seven tiers.
    */
  def refineryServeOrder(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.epochOrderOf(refineryFull(spark, sfDir))

  /** Registered checkpoint for [[refineryServeResume]] — mid-epoch-1. */
  val ResumeEpoch = 1
  val ResumeRank = 5L

  /** Loader RESTART from a mid-training checkpoint: the serving manifest
    * strictly after (epoch, step) in schedule order — what a trainer that
    * died at step `ResumeRank` of epoch `ResumeEpoch` asks the data
    * layer for on the way back up. The rank is computed over the FULL
    * epoch and then sliced (never renumbered): windows the trainer
    * already consumed keep their ranks, so a resumed run walks the
    * IDENTICAL remaining sequence — resume ∘ checkpoint ≡ uninterrupted
    * run, which is exactly what the shared-oracle discipline pins (the
    * oracle replays the whole seven-tier serve chain, then slices).
    * Scale: one filter over [[refineryServeOrder]]'s partitioned-rank
    * output, folded beneath the final projection (the rank half cannot
    * sink below the window that defines it); no new shuffle.
    */
  def refineryServeResume(spark: SparkSession, sfDir: String): DataFrame =
    refineryServeOrder(spark, sfDir)
      .filter(col("epoch") > ResumeEpoch ||
        (col("epoch") === ResumeEpoch && col("serve_rank") > ResumeRank))
      .orderBy("epoch", "serve_rank")

  /** THE FULL CHAIN ∘ ANNEAL SCHEDULE — what ships to the trainer after
    * the refinery is not just packed windows but a two-phase schedule:
    *
    *   gate ∘ decontaminate ∘ cluster-rep dedup ∘ suffix-span mask ∘
    *   anneal mix (per-lang top-third TTR, 10% decay-phase budget)
    *
    * The schedule is designed over the REFINED corpus (survivor set and
    * POST-MASK token counts — a doc that is half duplicated spans costs
    * half as many anneal-budget tokens), while the quality signal (TTR
    * ppm) reads the original text — signals are computed pre-masking,
    * like every other registry artifact. One hash pins SIX tiers: the
    * DuckDB oracle re-trains the classifier, re-derives the
    * contamination set, re-closes the clusters, re-sorts the suffixes,
    * re-derives the per-lang histogram cutoffs over the surviving docs,
    * and re-computes the schedule arithmetic. Scale: the survivor
    * filters and span charge are the shared chain; the schedule adds
    * one bounded (lang, ppm-grid) window + two broadcasts
    * ([[Sampling.annealSchedule]]).
    */
  def refineryAnneal(spark: SparkSession, sfDir: String): DataFrame = {
    val clean = Curation.decontaminate(Tables.documents(spark, sfDir))
      .select("doc_id")
    val losers = Dedup.dedupClusters(spark, sfDir)
      .filter(!col("canonical")).select("doc_id")
    val survivors = gatedDocs(spark, sfDir)
      .join(clean, Seq("doc_id"), "left_semi")
      .join(losers, Seq("doc_id"), "left_anti")
    val cut = SuffixDedup.dupSpansExact(spark, sfDir)
      .groupBy("doc_id").agg(sum(col("span_words")).as("cut_words"))
    val meta = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"),
        size(col("w")).cast("long").as("nwq"),
        size(array_distinct(col("w"))).cast("long").as("ndw"))
      .select(col("doc_id"), col("source"),
        expr("ndw * 1000000 div nwq").as("q_ppm"))
    Sampling.annealSchedule(
      survivors.join(cut, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          (col("n_words") - coalesce(col("cut_words"), lit(0L))).as("toks"))
        .join(meta, "doc_id")
        .select("doc_id", "lang", "source", "toks", "q_ppm"))
  }

  /** The refinery deployed ON THE STREAM: drain a landing zone of NDJSON
    * document objects and apply the REGISTERED quality gate + the
    * REGISTERED span report to each micro-batch as it arrives, appending
    * curated rows (masked text + post-mask word count) to `curatedDir`.
    * Gate and mask are per-row decisions given the standing registry
    * artifacts (classifier weights, span report), so they COMMUTE with
    * micro-batching — the property `StreamingRefinerySpec` pins by
    * comparing the drained stream's published manifest against the batch
    * `refinery_pack` on the same corpus. Packing does NOT run per batch:
    * bin boundaries are a corpus-global prefix, so publication derives
    * them over the curated zone ([[manifestFromCurated]]) — the same
    * artifact-then-publish split every registry tier here uses.
    *
    * Exactly-once: each micro-batch OVERWRITES its own `batch=<id>`
    * subdirectory, so a failure-retry of a batch replaces rather than
    * duplicates its rows (plain `append` under foreachBatch would be
    * at-least-once).
    */
  def refineryStream(
      spark: SparkSession,
      sfDir: String,
      landingDir: String,
      curatedDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val (w1, w2, b, thr) = Ml.curateModel(spark, sfDir)
    val spans = SuffixDedup.dupSpansExact(spark, sfDir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val gated = batch
          .selectExpr("doc_id", "lang", "source", "text",
            "CAST(size(split(text, ' ')) AS BIGINT) AS n_words",
            s"${Ml.LogregFeats1} AS x1",
            s"${Ml.LogregFeats2} AS x2")
          .filter(expr(s"${Ml.logregSig(w1, w2, b)} >= $thr"))
        gated
          .join(Dedup.maskedTextWithSpans(
            gated.select("doc_id", "text"), spans), "doc_id")
          .select("doc_id", "lang", "source", "n_words", "n_kept_words",
            "masked_text")
          .write.mode("overwrite").parquet(s"$curatedDir/batch=$batchId")
        ()
      }
      .start()
    graft.streaming.JobRegistry.register(q)
    q
  }

  /** Publication over the curated zone [[refineryStream]] maintains: the
    * pack manifest with toks = the post-mask word count the sink rows
    * already carry (n_kept_words = n_words − Σ span_words because the
    * registered spans are disjoint and clamped) — so a drained stream's
    * manifest equals the batch `refinery_pack` on the same corpus.
    */
  def manifestFromCurated(spark: SparkSession, curatedDir: String): DataFrame =
    packManifest(spark.read.parquet(curatedDir))

  private def packManifest(curated: DataFrame): DataFrame =
    Sampling.cumBeforeByLang(
        curated.select(col("doc_id"), col("lang"),
          col("n_kept_words").cast("long").as("toks")))
      .withColumn("bin", expr(s"cum_before div ${Sampling.PackBudget}"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"))
      .orderBy("lang", "bin")

  /** The refinery stream WITH the standing near-dup index — the actual
    * production ingestion shape: each arriving micro-batch (a) appends
    * its sorted-shingle signatures to the index zone, (b) discovers the
    * verified J ≥ 0.8 pairs it forms against HISTORY and within itself
    * ([[Dedup.incrementalJaccardPairs]] — batch-side broadcast over the
    * index, O(batch) signature work, never an O(corpus) recompute) and
    * appends them to the pairs zone, and (c) gates + masks + appends
    * curated rows exactly like [[refineryStream]]. Near-dup DROPPING is
    * deliberately NOT per-batch: the survivor rule is
    * transitive-consistent min-id-per-CLUSTER, and cluster closure is a
    * corpus-global artifact (an arrival-order local rule would keep a
    * doc whose only matches arrive later) — so, like packing's
    * corpus-global prefix, it runs at publication
    * ([[manifestFromCuratedDedup]]) over the accumulated pairs. Because
    * the per-batch candidate predicate is symmetric and every pair's
    * later endpoint sees the earlier one (in the index, or beside it in
    * its own batch), the accumulated pair set equals the batch PPJoin
    * pair set — which makes the published manifest IDENTICAL to the
    * batch `refinery_dedup_pack` (`StreamingDedupIndexSpec` pins it,
    * plus index idempotence across re-drains).
    *
    * Exactly-once: every zone (sigs, pairs, curated) writes
    * per-micro-batch `batch=<id>` subdirectories with overwrite, so a
    * failure-retry REPLACES its own partial output; the pair step reads
    * the index filtered to `batch < batchId`, so a retry never joins
    * against its own half-written signatures.
    */
  def refineryIndexedStream(
      spark: SparkSession,
      sfDir: String,
      landingDir: String,
      curatedDir: String,
      indexDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    indexedStream(spark, sfDir, landingDir, curatedDir, indexDir,
      checkpointDir, decontaminate = false)

  /** THE FULL CHAIN ON THE STREAM: [[refineryIndexedStream]] plus
    * per-batch benchmark DECONTAMINATION — the eval slice itself and any
    * doc sharing a word 5-gram with the standing benchmark gram set (a
    * registry artifact, broadcast like the classifier weights and span
    * report) drop before the curated write. Both decisions are per-row
    * given the standing artifacts, so they commute with micro-batching;
    * with publication-time cluster dropping this makes the drained
    * stream's manifest IDENTICAL to the batch `refinery_full`
    * (gate ∘ decontaminate ∘ cluster-rep dedup ∘ mask ∘ pack) — pinned
    * in `StreamingDedupIndexSpec`. Note the index still sees EVERY
    * arriving doc's signatures: clusters are deliberately the
    * full-corpus artifact (`refineryFull`'s conservative
    * dead-canonical rule), and only the curated zone is decontaminated.
    */
  def refineryFullStream(
      spark: SparkSession,
      sfDir: String,
      landingDir: String,
      curatedDir: String,
      indexDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    indexedStream(spark, sfDir, landingDir, curatedDir, indexDir,
      checkpointDir, decontaminate = true)

  private def indexedStream(
      spark: SparkSession,
      sfDir: String,
      landingDir: String,
      curatedDir: String,
      indexDir: String,
      checkpointDir: String,
      decontaminate: Boolean): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val (w1, w2, b, thr) = Ml.curateModel(spark, sfDir)
    val spans = SuffixDedup.dupSpansExact(spark, sfDir)
    // the standing benchmark gram set (registry artifact): 5-gram hashes
    // of the eval slice, broadcast into every micro-batch's gram join
    val benchGrams =
      if (!decontaminate) None
      else Some(Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 97 === 0)
        .select(explode(graft.functions.VectorExpressions
          .word_ngram_hashes(col("text"), 5, distinct = false)).as("g"))
        .distinct())
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // (a) this batch's signatures into the standing index
        val sigs = Dedup.shingleSigs(batch.select("doc_id", "lang", "text"))
        sigs.write.mode("overwrite").parquet(s"$indexDir/sigs/batch=$batchId")
        // (b) pairs vs history (index batches STRICTLY before this one)
        //     plus within-batch pairs
        //     (step (a) just wrote batch=<id>, so the zone always exists;
        //     on batch 0 the filter prunes everything — an empty history)
        val olds = spark.read.parquet(s"$indexDir/sigs")
          .filter(col("batch") < batchId)
          .select("doc_id", "lang", "s")
        Dedup.incrementalJaccardPairs(sigs, olds, t = 0.8)
          .select("doc_a", "doc_b")
          .write.mode("overwrite").parquet(s"$indexDir/pairs/batch=$batchId")
        // (c) gate [+ decontaminate] + mask + curated rows
        val gatedAll = batch
          .selectExpr("doc_id", "lang", "source", "text",
            "CAST(size(split(text, ' ')) AS BIGINT) AS n_words",
            s"${Ml.LogregFeats1} AS x1",
            s"${Ml.LogregFeats2} AS x2")
          .filter(expr(s"${Ml.logregSig(w1, w2, b)} >= $thr"))
        val gated = benchGrams match {
          case None => gatedAll
          case Some(bg) =>
            val contaminated = gatedAll
              .select(col("doc_id"),
                explode(graft.functions.VectorExpressions
                  .word_ngram_hashes(col("text"), 5, distinct = false)).as("g"))
              .join(broadcast(bg), "g")
              .select("doc_id").distinct()
            gatedAll.filter(col("doc_id") % 97 =!= 0)
              .join(contaminated, Seq("doc_id"), "left_anti")
        }
        gated
          .join(Dedup.maskedTextWithSpans(
            gated.select("doc_id", "text"), spans), "doc_id")
          .select("doc_id", "lang", "source", "n_words", "n_kept_words",
            "masked_text")
          .write.mode("overwrite").parquet(s"$curatedDir/batch=$batchId")
        ()
      }
      .start()
    graft.streaming.JobRegistry.register(q)
    q
  }

  /** Publication over the zones [[refineryIndexedStream]] maintains:
    * close the accumulated pair set into clusters, drop every
    * non-canonical member (survivor = min doc_id — the `dedup_clusters`
    * rule), pack the remainder. A drained stream's published manifest
    * equals the batch `refinery_dedup_pack` on the same corpus: the
    * curated zone carries the gate ∘ mask survivors with post-mask token
    * counts, and the accumulated pairs equal the batch PPJoin pair set.
    * Scale: the component solve is the same banded-candidate
    * ConnectedComponents the batch path runs — O(pairs), never
    * corpus×corpus — and the loser drop is a key anti-join.
    */
  def manifestFromCuratedDedup(
      spark: SparkSession, curatedDir: String, indexDir: String): DataFrame = {
    val pairs = spark.read.parquet(s"$indexDir/pairs")
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val losers = graft.operators.ConnectedComponents.components(pairs)
      .filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    packManifest(
      spark.read.parquet(curatedDir).join(losers, Seq("doc_id"), "left_anti"))
  }

  /** Publication over [[Similarity.semDedupIndexStream]]'s zones — the
    * SEMANTIC sibling of [[manifestFromCuratedDedup]]: the accumulated
    * within-cell τ-pair set yields the SemDeDup losers (a vector loses
    * iff SOME smaller-id vector shares its cell at cosine ≥ τ — i.e. it
    * is the `hi` endpoint of any pair; no transitive closure, the
    * verdict is per-pair), and the published manifest packs the curated
    * zone minus those losers. Docs without a vector pass through (the
    * anti-join misses them), matching the batch `refinery_semantic`
    * contract. A drained stream's manifest equals the batch
    * `refinery_semantic` on the same corpus (`StreamingSemanticSpec`).
    * Scale: loser extraction is one distinct over the pair zone
    * (O(pairs)); the drop is a key anti-join.
    */
  def manifestFromCuratedSemantic(
      spark: SparkSession, curatedDir: String, semIndexDir: String): DataFrame = {
    val losers = spark.read.parquet(s"$semIndexDir/pairs")
      .select(col("hi").as("doc_id")).distinct()
    packManifest(
      spark.read.parquet(curatedDir).join(losers, Seq("doc_id"), "left_anti"))
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
  /** Materialize [[refineryServeOrder]]'s per-epoch manifest as
    * EPOCH-KEYED SHARD FILES — the refinery → disk → loader loop closed
    * end to end: one directory per epoch, the epoch's windows stored IN
    * SERVE ORDER, so a training run's sequential read of `epoch=<k>` IS
    * the oracled serving order (the [[graft.sources.Layout.shardWrite]]
    * discipline applied to the refined corpus's windows).
    * `repartition(epoch)` co-locates each epoch so the partitionBy
    * write emits ONE file per epoch dir; within it, rows sort by
    * serve_rank. At corpus scale epochs × shard-splits is the
    * parallelism knob — here epochs alone suffice (the manifest is
    * window-grain, O(corpus_tokens / budget) rows, not doc-grain).
    * `ServeOrderShardSpec` pins the round-trip: read-back row sequence
    * per epoch ≡ the oracled `refinery_serve_order` rows for that
    * epoch, in rank order, with nothing extra and nothing missing.
    * Returns the materialized row count.
    */
  def serveOrderWrite(spark: SparkSession, sfDir: String, outDir: String): Long = {
    refineryServeOrder(spark, sfDir)
      .repartition(col("epoch"))
      .sortWithinPartitions("epoch", "serve_rank")
      .write.mode("overwrite").partitionBy("epoch").parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  def refineryWrite(spark: SparkSession, sfDir: String, outPath: String): Long = {
    val masked = graft.llm.Dedup.maskedTextWithSpans(
      Tables.documents(spark, sfDir),
      SuffixDedup.dupSpansExact(spark, sfDir))
    gatedDocs(spark, sfDir)
      .join(masked, "doc_id")
      .join(Tables.documents(spark, sfDir).select("doc_id", "source"), "doc_id")
      .select("doc_id", "lang", "source", "n_words", "n_kept_words", "masked_text")
      .write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath).count()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "refinery_pack" -> (refineryPack _),
    "refinery_dedup_pack" -> (refineryDedupPack _),
    "refinery_mm_dedup" -> (refineryMmDedup _),
    "refinery_semantic" -> (refinerySemantic _),
    "refinery_serve_order" -> (refineryServeOrder _),
    "refinery_serve_resume" -> (refineryServeResume _),
    "refinery_decontaminated" -> (refineryDecontaminated _),
    "refinery_full" -> (refineryFull _),
    "refinery_anneal" -> (refineryAnneal _),
    "refinery_waterfall" -> (refineryWaterfall _),
  )

  /** Oracle CTE stack for the classifier gate alone — trainer iterations,
    * acceptance threshold, and the gated corpus `keepd(doc_id, lang, nw)`.
    * Factored out so [[Forget]]'s rebuild oracles replay the IDENTICAL
    * frozen-gate tier (same strings, one source of truth); the refinery
    * oracles splice the span-mask CTEs between `th` and `keepd`.
    */
  private[llm] def duckGateCtes: (Seq[String], String, String) = {
    val trainCtes = Ml.logregTrainCtes(
      s"""f AS (
         |  SELECT x1, x2, y FROM (
         |    SELECT ${Ml.LogregFeats1} AS x1,
         |           ${Ml.LogregFeats2Duck} AS x2,
         |           ${Ml.LogregLabel} AS y,
         |           ${Hashing.duckHash60("CAST(doc_id AS VARCHAR)")} % 100 AS h
         |    FROM documents) WHERE h < ${Ml.CurateTrainPct})""".stripMargin)
    val th =
      s"""th AS (
         |  SELECT CAST(CAST(sum(y) AS BIGINT) * 1000000 // count(*) AS BIGINT) AS t
         |  FROM f)""".stripMargin
    val keepd =
      s"""keepd AS (
         |  SELECT s.doc_id, s.lang, s.nw
         |  FROM (SELECT doc_id, lang,
         |          CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
         |          ${Ml.LogregFeats1} AS x1,
         |          ${Ml.LogregFeats2Duck} AS x2
         |        FROM documents) s, w${Ml.LogregIters} w, th
         |  WHERE ${Ml.logregSigDuck("w.w1", "w.w2", "w.b")} >= th.t)""".stripMargin
    (trainCtes, th, keepd)
  }

  override def oracles: Map[String, String] = {
    val (trainCtes, thCte, keepdCte) = duckGateCtes
    val sharedHead = trainCtes ++ Seq(
      thCte,
      SuffixDedup.suffixSpanCtes,
      s"""cutc AS (
         |  SELECT doc_id, CAST(SUM(se - ss + 1) AS BIGINT) AS cut_words
         |  FROM mg GROUP BY doc_id)""".stripMargin,
      keepdCte)
    // tk over a caller-chosen survivor CTE + the shared cumsum + report.
    // The cumsum here is the naive per-lang window form — value-identical
    // to the Spark side's hierarchical prefix, and DuckDB runs on one
    // node anyway.
    // the shared masked-token cumsum CTEs every pack-shaped tail builds on
    def packCumCtes(survivorCte: String): String =
      Seq(
        s"""tk AS (
           |  SELECT k.doc_id, k.lang,
           |    k.nw - COALESCE(c.cut_words, 0) AS toks
           |  FROM $survivorCte k LEFT JOIN cutc c ON k.doc_id = c.doc_id)""".stripMargin,
        s"""cum AS (
           |  SELECT lang, toks,
           |    CAST(COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           |  FROM tk)""".stripMargin)
        .mkString(",\n")
    def packTail(survivorCte: String): String =
      packCumCtes(survivorCte) +
        s"""
           |SELECT lang, CAST(cum_before // ${Sampling.PackBudget} AS BIGINT) AS bin,
           |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens
           |FROM cum GROUP BY lang, cum_before // ${Sampling.PackBudget}
           |ORDER BY lang, bin""".stripMargin
    // serve-order tail: the pack tail's bins, then epoch keying + the
    // per-epoch rank (the pack_epoch_order arithmetic over `surv` bins)
    def serveCtes(survivorCte: String): String =
      packCumCtes(survivorCte) + ",\n" + Seq(
        s"""pb AS (
           |  SELECT lang, CAST(cum_before // ${Sampling.PackBudget} AS BIGINT) AS bin,
           |    COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens
           |  FROM cum GROUP BY lang, cum_before // ${Sampling.PackBudget})""".stripMargin,
        s"""sk AS (
           |  SELECT lang, bin, n_docs, bin_tokens,
           |    CAST(unnest(range(0, ${Sampling.ServeEpochs})) AS INTEGER) AS epoch
           |  FROM pb)""".stripMargin,
        s"""skk AS (
           |  SELECT *, ${Hashing.duckHash60(
              "lang || '#' || CAST(bin AS VARCHAR) || '#' || CAST(epoch AS VARCHAR)")} AS serve_key
           |  FROM sk)""".stripMargin)
        .mkString(",\n")
    val serveSelect =
      s"""
         |SELECT epoch,
         |  CAST(row_number() OVER (PARTITION BY epoch
         |    ORDER BY serve_key, lang, bin) AS BIGINT) AS serve_rank,
         |  lang, bin, n_docs, bin_tokens,
         |  CAST(COUNT(*) OVER (PARTITION BY epoch) AS BIGINT) AS n_windows
         |FROM skk""".stripMargin
    def serveTail(survivorCte: String): String =
      serveCtes(survivorCte) + serveSelect + " ORDER BY epoch, serve_rank"
    // resume tail: the identical schedule, sliced strictly after the
    // checkpoint (the rank is computed over the FULL epoch before the
    // slice — a checkpoint never renumbers what the trainer already saw)
    def serveResumeTail(survivorCte: String): String =
      serveCtes(survivorCte) +
        ",\nsv AS (" + serveSelect + ")" +
        s"""
           |SELECT * FROM sv
           |WHERE epoch > $ResumeEpoch
           |   OR (epoch = $ResumeEpoch AND serve_rank > $ResumeRank)
           |ORDER BY epoch, serve_rank""".stripMargin
    val packSql =
      sharedHead.mkString("WITH ", ",\n", ",\n") + packTail("keepd")
    // dedup variant: the cluster-loser closure needs WITH RECURSIVE (the
    // RECURSIVE keyword covers the whole, mostly non-recursive, CTE list)
    val dedupSql =
      (sharedHead ++ Seq(
        Dedup.duckClusterLoserCtes,
        """surv AS (
          |  SELECT * FROM keepd
          |  WHERE doc_id NOT IN (SELECT doc_id FROM cl_losers))""".stripMargin))
        .mkString("WITH RECURSIVE ", ",\n", ",\n") + packTail("surv")
    // image-cluster variant: aHash pair graph + recursive closure over
    // the image rows, losers anti-joined before the shared pack tail
    val mmDedupSql =
      (sharedHead ++ Seq(
        Multimodal.duckAhashLoserCtes,
        """surv AS (
          |  SELECT * FROM keepd
          |  WHERE doc_id NOT IN (SELECT doc_id FROM mm_losers))""".stripMargin))
        .mkString("WITH RECURSIVE ", ",\n", ",\n") + packTail("surv")
    // semantic variant: SemDeDup loser ids (embedding-cell pair verdict)
    // anti-joined before the shared pack tail — no recursion needed
    val semanticSql =
      (sharedHead ++ Seq(
        Similarity.duckSemLoserCtes,
        """surv AS (
          |  SELECT * FROM keepd
          |  WHERE doc_id NOT IN (SELECT doc_id FROM sem_losers))""".stripMargin))
        .mkString("WITH ", ",\n", ",\n") + packTail("surv")
    val decontSql =
      (sharedHead ++ Seq(
        Curation.duckDecontCtes,
        """surv AS (
          |  SELECT * FROM keepd
          |  WHERE doc_id % 97 <> 0
          |    AND doc_id NOT IN (SELECT doc_id FROM dc_cont))""".stripMargin))
        .mkString("WITH ", ",\n", ",\n") + packTail("surv")
    val fullSql =
      (sharedHead ++ Seq(
        Dedup.duckClusterLoserCtes,
        Curation.duckDecontCtes,
        """surv AS (
          |  SELECT * FROM keepd
          |  WHERE doc_id % 97 <> 0
          |    AND doc_id NOT IN (SELECT doc_id FROM dc_cont)
          |    AND doc_id NOT IN (SELECT doc_id FROM cl_losers))""".stripMargin))
        .mkString("WITH RECURSIVE ", ",\n", ",\n") + packTail("surv")
    // serve-order variant: the full chain's survivors, packed, then
    // epoch-keyed and per-epoch ranked — seven tiers under one hash
    val serveSql =
      (sharedHead ++ Seq(
        Dedup.duckClusterLoserCtes,
        Curation.duckDecontCtes,
        """surv AS (
          |  SELECT * FROM keepd
          |  WHERE doc_id % 97 <> 0
          |    AND doc_id NOT IN (SELECT doc_id FROM dc_cont)
          |    AND doc_id NOT IN (SELECT doc_id FROM cl_losers))""".stripMargin))
        .mkString("WITH RECURSIVE ", ",\n", ",\n") + serveTail("surv")
    // resume variant: the identical serve chain, sliced after the
    // registered checkpoint
    val serveResumeSql =
      (sharedHead ++ Seq(
        Dedup.duckClusterLoserCtes,
        Curation.duckDecontCtes,
        """surv AS (
          |  SELECT * FROM keepd
          |  WHERE doc_id % 97 <> 0
          |    AND doc_id NOT IN (SELECT doc_id FROM dc_cont)
          |    AND doc_id NOT IN (SELECT doc_id FROM cl_losers))""".stripMargin))
        .mkString("WITH RECURSIVE ", ",\n", ",\n") + serveResumeTail("surv")
    // anneal variant: the full chain's survivor set, post-mask token
    // counts, then the per-lang TTR-histogram cutoff + schedule over
    // SURVIVORS (an_* CTE names avoid the shared head's f/cum/tk).
    val annealSql =
      (sharedHead ++ Seq(
        Dedup.duckClusterLoserCtes,
        Curation.duckDecontCtes,
        """surv AS (
          |  SELECT * FROM keepd
          |  WHERE doc_id % 97 <> 0
          |    AND doc_id NOT IN (SELECT doc_id FROM dc_cont)
          |    AND doc_id NOT IN (SELECT doc_id FROM cl_losers))""".stripMargin,
        """an_tk AS (
          |  SELECT k.doc_id, k.lang,
          |    k.nw - COALESCE(c.cut_words, 0) AS toks
          |  FROM surv k LEFT JOIN cutc c ON k.doc_id = c.doc_id)""".stripMargin,
        """an_meta AS (
          |  SELECT doc_id, source,
          |    len(list_distinct(string_split(text, ' '))) * 1000000 //
          |      len(string_split(text, ' ')) AS q_ppm
          |  FROM documents)""".stripMargin,
        """an_j AS (
          |  SELECT t.doc_id, t.lang, t.toks, m.source, m.q_ppm
          |  FROM an_tk t JOIN an_meta m ON t.doc_id = m.doc_id)""".stripMargin,
        """an_grid AS (
          |  SELECT lang, q_ppm, COUNT(*) AS c FROM an_j GROUP BY lang, q_ppm)""".stripMargin,
        """an_cum AS (
          |  SELECT lang, q_ppm,
          |    SUM(c) OVER (PARTITION BY lang ORDER BY q_ppm DESC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          |    SUM(c) OVER (PARTITION BY lang) AS n_lang
          |  FROM an_grid)""".stripMargin,
        """an_cut AS (
          |  SELECT lang, MAX(q_ppm) AS cutoff FROM an_cum
          |  WHERE cum * 3 >= n_lang GROUP BY lang)""".stripMargin,
        """an_f AS (
          |  SELECT an_j.*, (an_j.q_ppm >= an_cut.cutoff) AS anneal
          |  FROM an_j JOIN an_cut USING (lang))""".stripMargin,
        """an_tot AS (
          |  SELECT CAST(SUM(toks) AS BIGINT) AS tot_tokens,
          |    CAST(SUM(CASE WHEN anneal THEN toks ELSE 0 END) AS BIGINT) AS tot_anneal
          |  FROM an_f)""".stripMargin))
        .mkString("WITH RECURSIVE ", ",\n", "\n") +
        """SELECT source, COUNT(*) AS n_docs,
          |  CAST(SUM(toks) AS BIGINT) AS tokens,
          |  CAST(SUM(CASE WHEN anneal THEN 1 ELSE 0 END) AS BIGINT) AS anneal_docs,
          |  CAST(SUM(CASE WHEN anneal THEN toks ELSE 0 END) AS BIGINT) AS anneal_tokens,
          |  CASE WHEN CAST(SUM(toks) AS BIGINT) = 0 THEN CAST(0 AS BIGINT)
          |       ELSE CAST(CAST(SUM(CASE WHEN anneal THEN toks ELSE 0 END) AS BIGINT) * 1000000 //
          |            CAST(SUM(toks) AS BIGINT) AS BIGINT) END AS anneal_token_ppm,
          |  CASE WHEN an_tot.tot_anneal = 0 THEN CAST(0 AS BIGINT)
          |       ELSE CAST((an_tot.tot_tokens // 10) * 1000 // an_tot.tot_anneal AS BIGINT)
          |  END AS epochs_milli
          |FROM an_f CROSS JOIN an_tot
          |GROUP BY source, an_tot.tot_tokens, an_tot.tot_anneal
          |ORDER BY source""".stripMargin
    // waterfall: the full chain's CTEs, counted after EACH filter —
    // stage tokens are pre-mask through stage 3, post-mask at stage 4
    val waterfallSql =
      (sharedHead ++ Seq(
        Dedup.duckClusterLoserCtes,
        Curation.duckDecontCtes,
        """wf_raw AS (
          |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
          |  FROM documents)""".stripMargin,
        """wf_decon AS (
          |  SELECT * FROM keepd
          |  WHERE doc_id % 97 <> 0
          |    AND doc_id NOT IN (SELECT doc_id FROM dc_cont))""".stripMargin,
        """wf_dedup AS (
          |  SELECT * FROM wf_decon
          |  WHERE doc_id NOT IN (SELECT doc_id FROM cl_losers))""".stripMargin,
        """wf_mask AS (
          |  SELECT k.doc_id, k.nw - COALESCE(c.cut_words, 0) AS nw
          |  FROM wf_dedup k LEFT JOIN cutc c ON k.doc_id = c.doc_id)""".stripMargin))
        .mkString("WITH RECURSIVE ", ",\n", "\n") +
        """SELECT * FROM (
          |  SELECT 0 AS stage, 'raw' AS stage_name, COUNT(*) AS n_docs,
          |    CAST(COALESCE(SUM(nw), 0) AS BIGINT) AS tokens FROM wf_raw
          |  UNION ALL
          |  SELECT 1, 'gate', COUNT(*), CAST(COALESCE(SUM(nw), 0) AS BIGINT) FROM keepd
          |  UNION ALL
          |  SELECT 2, 'decontaminate', COUNT(*), CAST(COALESCE(SUM(nw), 0) AS BIGINT) FROM wf_decon
          |  UNION ALL
          |  SELECT 3, 'dedup', COUNT(*), CAST(COALESCE(SUM(nw), 0) AS BIGINT) FROM wf_dedup
          |  UNION ALL
          |  SELECT 4, 'mask', COUNT(*), CAST(COALESCE(SUM(nw), 0) AS BIGINT) FROM wf_mask
          |) ORDER BY stage""".stripMargin
    Map(
      "refinery_pack" -> packSql,
      "refinery_dedup_pack" -> dedupSql,
      "refinery_mm_dedup" -> mmDedupSql,
      "refinery_semantic" -> semanticSql,
      "refinery_serve_order" -> serveSql,
      "refinery_serve_resume" -> serveResumeSql,
      "refinery_decontaminated" -> decontSql,
      "refinery_full" -> fullSql,
      "refinery_anneal" -> annealSql,
      "refinery_waterfall" -> waterfallSql)
  }
}
