package graft.llm

import graft.{QueryModule, Tables}
import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling / splitting / packing — the dataset-assembly operators a
  * training-data pipeline runs after curation (north-star EXT tier; the
  * reference's data path has no sampling of any kind, glue/job.py processes
  * every record).
  *
  * All selection here is HASH-deterministic, never `rand()`:
  *  - reproducible: the same doc lands in the same sample/split on every
  *    run, every cluster size, every executor placement — rerunning a 100 TB
  *    job after a partial failure yields byte-identical output;
  *  - shuffle-free: membership is a pure per-row expression (a map-stage
  *    filter Catalyst can push toward the scan), unlike `TABLESAMPLE` or
  *    `df.sample` whose seeds are per-partition and re-split under
  *    repartitioning;
  *  - oracle-checkable: DuckDB computes the identical md5-derived bucket.
  */
object Sampling extends QueryModule {

  /** 0..99 bucket from the row's stable identity. */
  private def bucket100(c: Column): Column = pmod(Hashing.hash60(c), lit(100))

  private def duckBucket100(expr: String): String =
    s"(${Hashing.duckHash60(expr)} % 100)"

  // --------------------------------------------------------- hash sampling

  /** Deterministic ~10% Bernoulli sample of the corpus, keyed on doc_id.
    * The bucket is exposed so downstream stages can take nested subsamples
    * (bucket < 1 is a 1% sample CONTAINED in the 10% one).
    */
  def sampleHash(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .withColumn("bucket", bucket100(col("doc_id").cast("string")).cast("int"))
      .filter(col("bucket") < 10)
      .select("doc_id", "lang", "source", "bucket")
      .orderBy("doc_id")
  }

  /** Neyman-allocation stratified sampling DESIGN + its realized draw: a
    * fixed budget splits across strata ∝ N_h·σ_h — high-variance strata get
    * proportionally MORE than their population share, the optimal allocation
    * for estimating a mean under a sample-size budget (vs the proportional
    * column reported beside it). Determinism discipline: σ_h is the one
    * float step — computed from exact decimal power sums, scaled to an
    * integer micro grid immediately — and EVERYTHING after (weights,
    * allocations, rates, membership) is BIGINT arithmetic, so the design
    * and the hash-gated draw are bit-reproducible across engines, reruns,
    * and cluster sizes. Overflow headroom: the allocation weight uses
    * MILLI-scaled sigma (n_h * sigma_milli * budget must fit BIGINT — at
    * n_h = 10^9 and sigma = 10^3 that is ~1.5·10^17, 60x under the
    * ceiling; micro-scaled sigma would overflow right at that scale). Scale: one power-sum pass, a bounded per-stratum
    * design table broadcast back, membership a pushdown-friendly per-row
    * predicate (the `sample_hash` gate).
    */
  def sampleNeyman(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = 150L
    val bal = col("c_acctbal").cast("decimal(19,6)")
    val c = Tables.customer(spark, sfDir)
    val nhD = col("n_h").cast("double")
    val sigma = sqrt(
      (col("ss").cast("double") - col("s").cast("double") * col("s").cast("double") / nhD) / nhD)
    val design = c.groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n_h"), sum(bal).as("s"), sum(bal * bal).as("ss"))
      .withColumn("sigma_micro", round(sigma * 1e6, 0).cast("long"))
      .withColumn("w", col("n_h") * expr("sigma_micro div 1000"))
      .transform(d => d.crossJoin(broadcast(
        d.agg(sum(col("w")).as("w_tot"), sum(col("n_h")).as("n_tot")))))
      .select(
        col("seg"), col("n_h"), col("sigma_micro"),
        expr(s"$budget * w div w_tot").as("alloc_neyman"),
        expr(s"$budget * n_h div n_tot").as("alloc_prop"))
      .withColumn("rate_ppm", expr("alloc_neyman * 1000000 div n_h"))
    c.join(broadcast(design), col("c_mktsegment") === col("seg"))
      .groupBy(col("c_mktsegment"))
      .agg(
        min(col("n_h")).as("n_h"),
        min(col("sigma_micro")).as("sigma_micro"),
        min(col("alloc_neyman")).as("alloc_neyman"),
        min(col("alloc_prop")).as("alloc_prop"),
        min(col("rate_ppm")).as("rate_ppm"),
        sum(when(pmod(Hashing.hash60(col("c_custkey").cast("string")), lit(1000000L))
          < col("rate_ppm"), 1).otherwise(0)).cast("long").as("realized_n"))
      .orderBy("c_mktsegment")
  }

  /** Exact-size stratified sample: the k docs with the SMALLEST id-hash per
    * language — hash order is a fixed uniform-random permutation, so this is
    * "k uniformly at random per stratum" with full reproducibility.
    *
    * The per-stratum window never sees the stratum: a PROVABLY LOSSLESS
    * hash-value prefilter (the scale path the round-7 audit demanded)
    * cuts each language to its ~8k smallest-hash candidates first.
    * Cutoff T_lang sizes expected survivors n_h·T/2⁶⁰ at 8k; if a
    * language's ACTUAL survivor count falls below min(k, n_h) — a
    * Binomial(n_h, 8k/n_h) tail with astronomically small mass, but not
    * zero — that language takes ALL its docs through instead, which
    * makes the prefilter exactly identity-preserving: whenever ≥ min(k,
    * n_h) docs survive, every non-survivor's hash is ≥ T > every
    * survivor's, so the k smallest are among the survivors. Same
    * output, same oracle; the heavy window input is now O(k·langs)
    * regardless of corpus size. The survivor-count check is one tiny
    * groupBy per trigger — no collect, the flag rides the broadcast
    * plan table.
    */
  def sampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 20L
    val Max = 1152921504606846976L // 2^60, the hash range
    val docs = Tables.documents(spark, sfDir)
      .withColumn("__h", Hashing.hash60(col("doc_id").cast("string")))
    val plan = docs.groupBy("lang").agg(count(lit(1)).as("n_h"))
      .withColumn("cutoff",
        when(col("n_h") <= 8L * k, lit(Max))
          .otherwise(expr(s"($Max div n_h) * ${8L * k}")))
    val surv = docs.join(broadcast(plan.select("lang", "cutoff")), "lang")
      .filter(col("__h") < col("cutoff"))
      .groupBy("lang").agg(count(lit(1)).as("n_surv"))
    val gate = plan.join(surv, Seq("lang"), "left")
      .withColumn("take_all",
        coalesce(col("n_surv"), lit(0L)) < least(lit(k), col("n_h")))
      .select("lang", "cutoff", "take_all")
    val byHash = Window.partitionBy("lang")
      .orderBy(col("__h").asc, col("doc_id").asc)
    docs.join(broadcast(gate), "lang")
      .filter(col("take_all") || col("__h") < col("cutoff"))
      .withColumn("rn", row_number().over(byHash))
      .filter(col("rn") <= k)
      .select("lang", "rn", "doc_id", "source")
      .orderBy("lang", "rn")
  }

  // ----------------------------------------------- leakage-safe train split

  /** Per-doc split assignment, grouped by `source` so every document from
    * one origin lands in the same split — the leakage-safe variant (a
    * near-duplicate of a train doc from the same crawl/domain must not land
    * in test). 80/10/10 by source-hash bucket.
    */
  def assignSplits(docs: DataFrame): DataFrame = {
    val b = bucket100(col("source"))
    docs.withColumn("split",
      when(b < 80, "train").when(b < 90, "val").otherwise("test"))
  }

  /** Split summary: doc and source counts per split. The assignment itself
    * is what ships; the summary is the oracle-checked profile of it.
    */
  def splitLeakproof(spark: SparkSession, sfDir: String): DataFrame = {
    assignSplits(Tables.documents(spark, sfDir))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("source")).as("n_sources"))
      .orderBy("split")
  }

  // ------------------------------------------------------- weighted mixture

  /** Weighted mixture sampling: each source gets a deterministic rate
    * (25/50/75%, derived from the source hash — standing in for the
    * per-source mixture weights a real pipeline configures), then docs are
    * hash-sampled at that rate. Both decisions are per-row expressions; the
    * only shuffle is the profiling groupBy at the end.
    */
  def mixSources(spark: SparkSession, sfDir: String): DataFrame = {
    val rate = (lit(25) + pmod(Hashing.hash60(col("source")), lit(3)) * 25).cast("int")
    val kept = bucket100(col("doc_id").cast("string")) < rate
    Tables.documents(spark, sfDir)
      .withColumn("rate_pct", rate)
      .groupBy("source", "rate_pct")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(kept, lit(1))).as("n_kept"))
      .orderBy("source")
  }

  /** Per-source epoch schedule — the "how many passes over each source"
    * table every pretraining run publishes (LLaMA-style): given frozen
    * per-source mixture weights (integer parts, derived here from the
    * source index — standing in for the hand-tuned weights a data team
    * configures) and a token budget (1× the corpus), each source's
    * target token count is `budget·w ÷ Σw` and its repeat factor is
    * `target·1000 ÷ tokens` in exact milli-epochs — over 1000 means the
    * source is UPSAMPLED (seen more than once per budget), the
    * overfitting-risk flag the schedule exists to surface. All integer
    * arithmetic: at 100 TB (≈2·10¹³ tokens) the worst intermediate
    * `budget·w·1000` is ~10¹⁷, inside BIGINT. Scale shape: one
    * map-side-combinable per-source groupBy + a 1-row totals broadcast —
    * the frame never exceeds the source count.
    */
  def mixEpochSchedule(spark: SparkSession, sfDir: String): DataFrame = {
    val perSrc = Tables.documents(spark, sfDir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nw"))
      .groupBy("source").agg(sum(col("nw")).as("tokens"))
      // try_cast + coalesce: a source name with no trailing digits (or
      // digits past BIGINT) gets the DOCUMENTED default part 1 on BOTH
      // engines — a bare CAST would diverge (Spark ANSI errors on '',
      // DuckDB raises a conversion error) and either way a NULL part
      // would silently corrupt the schedule instead of defaulting
      .withColumn("weight_parts",
        expr("""coalesce(try_cast(regexp_extract(source, '(\\d+)$', 1) AS BIGINT), 0) % 5 + 1"""))
    val tot = perSrc.agg(
      sum(col("tokens")).as("budget"),
      sum(col("weight_parts")).as("total_parts"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("weight_parts"), col("tokens"),
        expr("budget * weight_parts div total_parts").as("target_tokens"))
      .withColumn("epochs_milli", expr("target_tokens * 1000 div tokens"))
      .withColumn("upsampled", col("epochs_milli") > 1000)
      .orderBy("source")
  }

  /** Dedup-AWARE leakage-safe train/val split: near-duplicates of a
    * training doc inside the validation set inflate every eval number
    * (the model has effectively seen them) — `split_leakproof` guards
    * the source axis, this guards the CONTENT axis. The split unit is
    * the near-dup CLUSTER (the `dedup_clusters` components; singletons
    * are their own unit), so both members of every near-dup pair land
    * on the same side by construction. The output carries the leakage
    * AUDIT — clusters straddling sides — which must be 0; pinning it in
    * the oracled result makes "no content leakage" a hash-checked
    * claim, not a comment. Scale: rides the bounded component solve;
    * the side decision is one hash of the unit id; report groupBys are
    * side-sized.
    */
  def splitDedupSafe(spark: SparkSession, sfDir: String): DataFrame = {
    val cl = Dedup.dedupClusters(spark, sfDir).select("doc_id", "cluster")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nw"))
      .join(cl, Seq("doc_id"), "left")
      .withColumn("unit", coalesce(col("cluster"), col("doc_id")))
      .withColumn("side",
        when(pmod(Hashing.hash60(concat(lit("dsplit:"), col("unit").cast("string"))),
          lit(100L)) < 90, "train").otherwise("val"))
    val straddle = docs.filter(col("cluster").isNotNull)
      .groupBy("cluster").agg(countDistinct(col("side")).as("nsides"))
      .agg(coalesce(sum(when(col("nsides") > 1, 1L).otherwise(0L)), lit(0L))
        .as("straddling_clusters"))
    docs.groupBy("side")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nw")).as("tokens"),
        sum(when(col("cluster").isNotNull, 1L).otherwise(0L)).as("clustered_docs"))
      .crossJoin(broadcast(straddle))
      .select("side", "n_docs", "tokens", "clustered_docs", "straddling_clusters")
      .orderBy("side")
  }

  /** Two-phase ANNEAL mix — the "decay-phase high-quality upsampling"
    * schedule modern pretraining runs use (train the bulk of tokens on
    * the full mix, then spend the final learning-rate-decay slice
    * re-sampling the best data; the practice behind MiniCPM's and
    * Llama-3-era "midtraining" mixes). Anneal set = per-LANGUAGE top
    * third by a quality score (per-doc type-token ratio in integer ppm;
    * per-language because lexical richness isn't comparable across
    * languages), selected by the same histogram-CUTOFF shape as
    * `curate_perplexity_scaled`: one (lang, score) groupBy — the frame
    * is the bounded per-lang ppm grid, never the corpus — a per-lang
    * window over THAT grid, a broadcast L-row cutoff table, and a
    * per-row comparison (ties at the cutoff kept). The anneal token
    * budget is fixed at 10% of corpus tokens; `epochs_milli` is the
    * exact repeat factor of the anneal set inside that slice —
    * `budget·1000 div anneal_tokens` — the upsampling knob the schedule
    * exists to surface. Reported per source: raw vs anneal-phase doc
    * and token mass. All integer arithmetic; at 100 TB the worst
    * intermediate `tokens·1000` ≈ 2·10¹⁶, inside BIGINT.
    */
  def mixAnneal(spark: SparkSession, sfDir: String): DataFrame =
    annealSchedule(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("lang"), col("source"),
        size(col("w")).cast("long").as("toks"),
        size(array_distinct(col("w"))).cast("long").as("ndw"))
      .withColumn("q_ppm", expr("ndw * 1000000 div toks"))
      .select("doc_id", "lang", "source", "toks", "q_ppm"))

  /** The anneal-schedule core over any (doc_id, lang, source, toks,
    * q_ppm) frame — shared by [[mixAnneal]] (raw corpus, toks = word
    * count) and `Refinery.refineryAnneal` (refined corpus, toks =
    * post-mask counts): per-lang top-third cutoff from the bounded
    * (lang, q_ppm) grid, ties kept, 10%-of-input anneal budget, exact
    * milli-epoch repeat factor.
    */
  private[llm] def annealSchedule(docs: DataFrame): DataFrame = {
    val byLangDesc = Window.partitionBy("lang").orderBy(col("q_ppm").desc)
    val cutoffs = docs.groupBy("lang", "q_ppm").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        byLangDesc.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_lang", sum(col("c")).over(
        byLangDesc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("cum") * 3 >= col("n_lang"))
      .groupBy("lang").agg(max(col("q_ppm")).as("cutoff"))
    val flagged = docs.join(broadcast(cutoffs), "lang")
      .withColumn("anneal", col("q_ppm") >= col("cutoff"))
    val tot = flagged.agg(
      sum(col("toks")).as("tot_tokens"),
      sum(when(col("anneal"), col("toks")).otherwise(0L)).as("tot_anneal"))
    flagged.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("tokens"),
        sum(when(col("anneal"), 1L).otherwise(0L)).as("anneal_docs"),
        sum(when(col("anneal"), col("toks")).otherwise(0L)).as("anneal_tokens"))
      .crossJoin(broadcast(tot))
      // zero-mass guards (the mix_epoch_schedule discipline: a bare div
      // would NULL here but ERROR in DuckDB — divergent AND silent):
      // a source whose docs carry zero tokens (possible in the refinery
      // variant when every survivor is fully masked) reports 0 share,
      // and an empty-mass anneal set degenerates to 0 repeats
      .withColumn("anneal_token_ppm", expr(
        "CASE WHEN tokens = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE anneal_tokens * 1000000 div tokens END"))
      .withColumn("epochs_milli", expr(
        "CASE WHEN tot_anneal = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (tot_tokens div 10) * 1000 div tot_anneal END"))
      .select("source", "n_docs", "tokens", "anneal_docs", "anneal_tokens",
        "anneal_token_ppm", "epochs_milli")
      .orderBy("source")
  }

  /** Token-BUDGET quality fill — the greedy knapsack every
    * fixed-compute pretraining run solves per source: rank documents by
    * quality (type-token ratio in integer ppm — [[mixAnneal]]'s metric,
    * doc_id tiebreak) and keep the best until half the source's token
    * mass is spent (kept ⇔ 2·tokens-before-this-doc < source total, so
    * the budget-straddling doc is kept — the C4-style "take the best N
    * tokens, not the best N docs" selection that favors MANY short
    * high-quality docs over few long ones). The running token mass
    * comes from [[graft.operators.BlockedRank.blockedPrefix]] (blocks =
    * the per-mille quality grid, descending), so no language or source
    * ever funnels through a single-partition window — the exact
    * round-7 plan demand the pack_* family already satisfies. Reported
    * per source: doc/token mass in and out, fill rate, and the
    * effective quality floor the budget bought.
    */
  def mixBudgetFill(spark: SparkSession, sfDir: String): DataFrame = {
    budgetFillFlags(Tables.documents(spark, sfDir)).groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("toks")).as("tokens_total"),
        sum(when(col("kept"), col("toks")).otherwise(0L)).as("tokens_kept"),
        min(when(col("kept"), col("q_ppm"))).as("q_floor_ppm"))
      .withColumn("kept_token_ppm",
        expr("tokens_kept * 1000000 div tokens_total"))
      .select("source", "n_docs", "n_kept", "tokens_total", "tokens_kept",
        "kept_token_ppm", "q_floor_ppm")
      .orderBy("source")
  }

  /** CURRICULUM mixture schedule — the step-by-step weight table between
    * [[mixAnneal]]'s two phases: training step s ∈ {0..3} interpolates
    * each source's sampling weight from its raw corpus token share
    * (step 0 — see everything, proportionally) to its share of the
    * HIGH-QUALITY (per-lang top-third TTR) token mass (step 3 — the
    * decay-phase mix), linearly in exact integer ppm:
    * w_s = (base·(3−s) + quality·s) div 3. This is the published
    * schedule a data loader consumes — one row per (step, source).
    * Scale: everything past [[mixAnneal]]'s per-source aggregation is
    * sources×4-bounded broadcast arithmetic.
    */
  def mixCurriculum(spark: SparkSession, sfDir: String): DataFrame = {
    val sched = mixAnneal(spark, sfDir).select("source", "tokens", "anneal_tokens")
    val tot = sched.agg(sum(col("tokens")).as("tt"),
      sum(col("anneal_tokens")).as("ta"))
    val steps = spark.range(4).select(col("id").cast("int").as("step"))
    sched.crossJoin(broadcast(tot)).crossJoin(broadcast(steps))
      .withColumn("base_ppm", expr("tokens * 1000000 div tt"))
      // zero-mass guard (the annealSchedule discipline): no anneal mass
      // anywhere degenerates the quality endpoint to 0, not a div error
      .withColumn("quality_ppm", expr(
        "CASE WHEN ta = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE anneal_tokens * 1000000 div ta END"))
      .select(col("step"), col("source"),
        expr("(base_ppm * (3 - step) + quality_ppm * step) div 3").as("w_ppm"))
      .orderBy("step", "source")
  }

  /** [[mixBudgetFill]]'s per-doc core — (doc_id, source, toks, q_ppm,
    * kept) with the greedy keep decision; split out so the spec can
    * check the keep-set against a sequential per-source simulation.
    */
  private[llm] def budgetFillFlags(documents: DataFrame): DataFrame = {
    import graft.operators.BlockedRank
    val docs = documents
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"),
        size(col("w")).cast("long").as("toks"),
        size(array_distinct(col("w"))).cast("long").as("ndw"))
      .withColumn("q_ppm", expr("ndw * 1000000 div toks"))
    BlockedRank.blockedPrefix(
        docs,
        partition = Seq("source"),
        blocks = Seq(("__bf_b", expr("q_ppm div 1000"))),
        blockDesc = Seq(true),
        localOrder = Seq(col("q_ppm").desc, col("doc_id")),
        outRank = "__bf_r", outTotalN = "__bf_n",
        values = Seq(BlockedRank.PrefixValue(col("toks"), "__bf_cum", "__bf_tot")),
        broadcastOffsets = true)
      .withColumn("kept", (col("__bf_cum") - col("toks")) * 2 < col("__bf_tot"))
  }

  /** Weighted reservoir sample (Efraimidis–Spirakis A-ES), derandomized:
    * pick k documents with inclusion probability proportional to weight
    * (here `n_chars` — the "sample long docs more" curation knob) by
    * ranking on key = ln(u)/w with u a deterministic hash-uniform in
    * (0, 1] — the exact A-ES statistic, reproducible across runs,
    * engines, and partitionings. ln(u) lands on the 9dp decimal grid
    * before the division (the ULP-absorbing contract the LM scorers
    * pin), and ties break on doc_id. Scale shape: the key is a per-row
    * expression; selection is global top-k (TakeOrderedAndProject —
    * per-partition heaps, driver merges k·partitions rows); the rank
    * window runs AFTER `limit(k)` on a k-row input, marked
    * [[graft.operators.BlockedRank.boundedPartition]].
    */
  def sampleWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank.boundedPartition
    val k = 100
    val u = (Hashing.hash60(concat(lit("ws:"), col("doc_id").cast("string"))) + 1)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val key = round(log(u), 9).cast("decimal(13,9)").as("lnu")
    val picked = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"), key)
      .withColumn("aes_key", col("lnu").cast("double") / col("n_chars"))
      .orderBy(col("aes_key").desc, col("doc_id"))
      .limit(k)
    val w = Window.partitionBy(boundedPartition(col("doc_id")))
      .orderBy(col("aes_key").desc, col("doc_id"))
    picked
      .withColumn("pick_rank", row_number().over(w))
      .select("doc_id", "source", "n_chars", "pick_rank")
      .orderBy("doc_id")
  }

  /** Temperature-scaled mixture (α = 0.5): per-source keep rate
    * ∝ n_s^α / n_s = 1/√n_s, normalized so the SMALLEST source keeps 100% —
    * the standard flattening that keeps big web crawls from drowning small
    * high-quality sources while still respecting their ordering. The rate
    * is data-derived (one tiny groupBy + a broadcast 1-row min — no
    * driver collect), rounded onto its 6dp grid so both engines gate on
    * the identical double; docs pass a millionth-granularity hash gate
    * (same determinism contract as every sampler here: membership is a
    * per-row expression, reproducible across reruns and cluster sizes).
    */
  def mixTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n_s"))
    val minN = counts.agg(min(col("n_s")).as("min_n"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("rate", round(sqrt(col("min_n") / col("n_s")), 6))
    val gate = pmod(Hashing.hash60(col("doc_id").cast("string")), lit(1000000L))
      .cast("double") / lit(1000000.0)
    Tables.documents(spark, sfDir)
      .join(broadcast(rates.select("source", "rate")), "source")
      .groupBy("source", "rate")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(gate < col("rate"), lit(1))).as("n_kept"))
      .orderBy("source")
  }

  /** UniMax-style language-balanced token budgeting (Chung et al.,
    * "UniMax: Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining", ICLR 2023): spread a token budget as
    * uniformly as possible across languages while capping every language
    * at `UniMaxEpochCap` epochs of its own data — tail languages cap
    * (never over-repeated into memorization), and the head language
    * absorbs the slack. The iterative spec has a WATERFILL closed form:
    * sort languages by capacity ascending; position k is capped iff
    * cap_k · (L − k) ≤ budget − prefix_cap_k (the flag is prefix-monotone,
    * so the cap set is the flagged prefix), and everyone else gets the
    * integer level (budget − prefix at k*) div (L − k*).
    *
    * Every step is integer arithmetic on the L-row language table (one
    * token-count groupBy feeds it), so the allocation is bit-reproducible;
    * windows over the bounded language axis carry `boundedPartition` per
    * the house rule. Budget = 80% of corpus tokens, cap = 1 epoch —
    * chosen so the corpus's head/tail split actually exercises both
    * branches (4 capped languages + an uncapped head at this corpus).
    */
  def mixUnimax(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank.boundedPartition
    val perLang = Tables.documents(spark, sfDir)
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val total = perLang.agg(sum(col("n_tokens")).as("total"))
    val bp = boundedPartition(col("lang"))
    val byCap = Window.partitionBy(bp).orderBy(col("capacity"), col("lang"))
    val all = Window.partitionBy(boundedPartition(col("lang")))
    perLang
      .withColumn("capacity", col("n_tokens") * UniMaxEpochCap)
      .crossJoin(broadcast(total))
      .withColumn("budget", expr("(total * 8) div 10"))
      .withColumn("l_count", count(lit(1)).over(all))
      .withColumn("k", row_number().over(byCap))
      .withColumn("s", sum(col("capacity")).over(byCap))
      .withColumn("flag",
        col("capacity") * (col("l_count") - col("k")) <= col("budget") - col("s"))
      .withColumn("k_star", coalesce(max(when(col("flag"), col("k"))).over(all), lit(0)))
      .withColumn("s_star", coalesce(max(when(col("flag"), col("s"))).over(all), lit(0L)))
      .withColumn("level",
        when(col("l_count") > col("k_star"),
          expr("(budget - s_star) div (l_count - k_star)"))
          .otherwise(lit(0L)))
      .withColumn("capped", col("k") <= col("k_star"))
      .withColumn("alloc_tokens",
        when(col("capped"), col("capacity")).otherwise(col("level")))
      .select(col("lang"), col("n_tokens"), col("capacity"), col("capped"),
        col("alloc_tokens"),
        round(col("alloc_tokens").cast("double") / col("n_tokens"), 6).as("epochs"))
      .orderBy("lang")
  }

  private val UniMaxEpochCap = 1

  /** Micro-batch size and length-bucket width for the padding report,
    * frozen for the oracle.
    */
  private val PackBatch = 8
  private val PackBucketWidth = 16

  /** Padding-efficiency report for length-bucketed batching — the data-
    * loader decision every trainer makes: batching by ARRIVAL order pads
    * every sequence in a micro-batch up to the batch max (mixed lengths →
    * massive padding waste); bucketing by length first makes batch
    * members near-equal and the padding collapses. One output row per
    * strategy with the exact integer padded-token mass and waste ppm —
    * the number that decides the shuffle-vs-padding tradeoff.
    *
    * Scale shape: arrival batches are a pure projection (`doc_id div B` —
    * no shuffle, no global ordering); bucketed batches rank INSIDE each
    * length bucket (a partitioned window — at 100 TB you'd additionally
    * salt wide buckets by a hash prefix, which only renames batches and
    * leaves the padding arithmetic identical). Everything downstream is
    * two map-side-combinable groupBys.
    */
  def packLengthBuckets(spark: SparkSession, sfDir: String): DataFrame =
    packLengthBucketsOf(Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("toks")))

  /** (doc_id, toks)-frame form — package-visible for crafted-length specs. */
  private[graft] def packLengthBucketsOf(docs: DataFrame): DataFrame = {
    val naive = docs
      .withColumn("strategy", lit("arrival"))
      .withColumn("batch", expr(s"CAST(doc_id div $PackBatch AS STRING)"))
    // within-bucket rank via the hierarchical prefix: a length bucket is
    // low-cardinality over an unbounded corpus (the scaladoc's "salt wide
    // buckets" note, now implemented exactly — blocks (toks, doc_id-range)
    // are a monotone coarsening of the in-bucket order, so the ranks are
    // verbatim the naive window's)
    val bucketed = graft.operators.BlockedRank.blockedPrefix(
        docs.withColumn("bucket", expr(s"toks div $PackBucketWidth")),
        partition = Seq("bucket"),
        blocks = Seq(("__plb_t", col("toks")), ("__plb_d", expr("doc_id div 256"))),
        blockDesc = Seq(false, false),
        localOrder = Seq(col("toks"), col("doc_id")),
        outRank = "rk", outTotalN = "__plb_n",
        broadcastOffsets = true)
      .withColumn("strategy", lit("length_bucketed"))
      // collision-free compound batch id (bucket, within-bucket batch) as a
      // string key: an arithmetic encoding (bucket * K + …) silently merges
      // batches from different buckets once a bucket holds > K·PackBatch
      // docs — at 100 TB that is a certainty, and it would corrupt the
      // padding statistics on BOTH engines without tripping the oracle
      .withColumn("batch",
        expr(s"concat(CAST(bucket AS STRING), ':', CAST((rk - 1) div $PackBatch AS STRING))"))
    naive.select("strategy", "batch", "toks")
      .unionByName(bucketed.select("strategy", "batch", "toks"))
      .groupBy("strategy", "batch")
      .agg(count(lit(1)).as("n"), sum(col("toks")).as("st"), max(col("toks")).as("mx"))
      .groupBy("strategy")
      .agg(
        count(lit(1)).as("n_batches"),
        sum(col("st")).as("n_tokens"),
        sum(col("n") * col("mx") - col("st")).as("padded_tokens"))
      .withColumn("waste_ppm",
        expr("padded_tokens * 1000000 div (n_tokens + padded_tokens)"))
      .orderBy("strategy")
  }

  /** DoReMi iterations / learning rate / uniform-smoothing, frozen for the
    * oracle. η = 0.5 enters as `excess_micro div 2`; smoothing mixes 10%
    * uniform back in each round (the paper's c·u term).
    */
  private[graft] val DoremiRounds = 3

  /** DoReMi-style domain reweighting (Xie et al., "DoReMi: Optimizing Data
    * Mixtures Speeds Up Language Model Pretraining", 2305.10429, public
    * literature): up-weight the domains a proxy scorer finds HARD (excess
    * loss over the current mixture's expected loss), iterating
    * multiplicative weights with uniform smoothing. Differences from the
    * paper, chosen for a deterministic data-engine setting and documented
    * as the contract: the proxy loss is the corpus-unigram-LM surprisal
    * (the text_unigram_lm scorer — no neural proxy model re-trained per
    * round), the reference loss is the CURRENT MIXTURE's α-weighted mean
    * (Group-DRO's baseline, recomputed each round so iterations genuinely
    * move), and Hedge's exp(ηλ) is linearized to (1 + ηλ) — the standard
    * multiplicative-weights approximation — so every update is INTEGER
    * arithmetic on micro-nat/ppm grids: bit-reproducible across engines,
    * no cross-engine exp() contract needed.
    *
    * Scale shape: one vocab groupBy + one token→surprisal join + one doc
    * groupBy + one domain groupBy — all map-side-combinable corpus passes
    * — then T rounds of window arithmetic over the DOMAINS-sized frame
    * (tens of rows; `boundedPartition` per the house window rule). The
    * output α column is what a sampler (mix_temperature's gate) consumes.
    */
  def mixDoremi(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).cast("double").as("tot"))
    // per-token surprisal in integer micro-nats: the 6dp-rounded ln is the
    // one float op both engines must agree on (text_unigram_lm contract);
    // decimal×int keeps the micro-grid conversion exact
    val micro = vocab.crossJoin(broadcast(total))
      .select(col("w"),
        (round(log(col("cnt") / col("tot")), 6).cast("decimal(12,6)")
          * lit(-1000000)).cast("long").as("micro"))
    val perDoc = toks.join(micro, "w")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_toks"), sum(col("micro")).as("sm"))
      .select(col("source"), expr("sm div n_toks").as("doc_loss"))
    val perSource = perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_loss")).as("sl"))
      .select(col("source"), col("n_docs"), expr("sl div n_docs").as("loss_micro"))
    doremiIterate(perSource)
      .select(col("source"), col("n_docs"), col("loss_micro"),
        col("excess_micro"), col("alpha").as("alpha_ppm"))
      .orderBy("source")
  }

  /** The MW rounds over a (source, n_docs, loss_micro) domain frame —
    * separated so specs can pin the iteration against a hand-derived run
    * on crafted domain stats (the mirror-oracle countermeasure).
    */
  private[graft] def doremiIterate(perSource: DataFrame): DataFrame = {
    import graft.operators.BlockedRank.boundedPartition
    val all = Window.partitionBy(boundedPartition(col("source")))
    var dom = perSource
      .withColumn("d_count", count(lit(1)).over(all))
      .withColumn("alpha", expr("1000000 div d_count"))
    for (_ <- 1 to DoremiRounds) {
      dom = dom
        .withColumn("refsum", sum(col("alpha") * col("loss_micro")).over(all))
        .withColumn("excess_micro",
          greatest(expr("loss_micro - refsum div 1000000"), lit(0L)))
        .withColumn("wgt",
          expr("(alpha * (1000000 + excess_micro div 2)) div 1000000"))
        .withColumn("wsum", sum(col("wgt")).over(all))
        .withColumn("alpha",
          expr("(900000 * ((wgt * 1000000) div wsum)" +
            " + 100000 * (1000000 div d_count)) div 1000000"))
        .drop("refsum", "wgt", "wsum")
    }
    dom
  }

  /** Class-balanced downsampling: every language keeps exactly the
    * smallest class's count, chosen by hash rank — the deterministic
    * "balance the training mix" op (no rand(), so membership is
    * reproducible across reruns and cluster sizes, and the kept set is
    * stable as new data arrives only at the rank boundary). One per-class
    * window rank + a 1-row broadcast of the min class size. The exact
    * kept-id sum is the audit checksum: engines agreeing on it proves the
    * SELECTION matches, not just the counts.
    */
  def sampleBalanced(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank
    val minSize = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("min_n"))
    // per-lang hash rank WITHOUT a per-lang corpus window (min_n can be
    // any fraction of the class, so no top-k prefilter applies): blocks
    // = the hash's top 12 bits — a monotone coarsening, ≤ 4096 block
    // summaries per language, every heavy stage partitioned (lang, block)
    val ranked = BlockedRank.blockedPrefix(
      Tables.documents(spark, sfDir)
        .withColumn("__h", Hashing.hash60(col("doc_id").cast("string"))),
      partition = Seq("lang"),
      blocks = Seq(("__sb_b", expr("__h div 281474976710656"))), // 2^48
      blockDesc = Seq(false),
      localOrder = Seq(col("__h"), col("doc_id")),
      outRank = "rn", outTotalN = "__sb_n",
      broadcastOffsets = true)
    ranked.crossJoin(broadcast(minSize))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("rn") <= col("min_n"), lit(1))).as("n_kept"),
        sum(when(col("rn") <= col("min_n"), col("doc_id"))).as("kept_id_sum"))
      .orderBy("lang")
  }

  // ------------------------------------------------------- sequence packing

  val PackBudget = 2048

  /** Width of the doc_id-range blocks the hierarchical packing prefix
    * partitions on. The scale knob (BlockedRank's B): per-(lang, block)
    * work is ≤ this many rows, and the per-lang summary window sees
    * max_doc_id ÷ this rows — size it so the summary stays
    * metadata-scale (≈10⁴–10⁷ rows) at the corpus at hand; 256 exercises
    * multiple blocks even at the sf0.01 test corpus.
    */
  private[graft] val PackCumBlock = 256L

  /** Exclusive per-language running token sum over doc_id order — the
    * packing prefix — computed HIERARCHICALLY over a (doc_id, lang,
    * toks)-bearing frame: per-(lang, doc_id-range block) partial sums →
    * per-lang prefix offsets over the BLOCK SUMMARIES (a bounded frame —
    * max_doc_id ÷ [[PackCumBlock]] rows, never the corpus) → per-block
    * local cumsum + offset. The naive `Window.partitionBy("lang")`
    * cumsum puts an entire language on ONE task — on a
    * mono-lingual-dominant 100 TB corpus that is a single-task stage
    * over ~the whole corpus (the round-7 plan-audit finding); the block
    * key `doc_id div W` is a monotone coarsening of the per-lang doc_id
    * order, so the hierarchical prefix is VALUE-IDENTICAL and every
    * heavy stage partitions on (lang, block). Shared by
    * `pack_sequences`, `pack_bpe_sequences`, and `refinery_pack` — all
    * three oracles pin the equivalence cross-engine.
    */
  private[graft] def cumBeforeByLang(docs: DataFrame): DataFrame = {
    import graft.operators.BlockedRank
    BlockedRank.blockedPrefix(
      docs,
      partition = Seq("lang"),
      blocks = Seq(("__pk_b", expr(s"doc_id div $PackCumBlock"))),
      blockDesc = Seq(false),
      localOrder = Seq(col("doc_id")),
      outRank = "__pk_rk", outTotalN = "__pk_nt",
      values = Seq(BlockedRank.PrefixValue(
        col("toks").cast("long"), "__pk_cum", "__pk_tot")),
      broadcastOffsets = true)
      .withColumn("cum_before", col("__pk_cum") - col("toks"))
      .drop("__pk_rk", "__pk_nt", "__pk_tot", "__pk_cum")
  }

  /** Per-doc bin assignment: contiguous greedy packing of documents into
    * ~`budget`-token context windows, partitioned by lang (monolingual
    * windows). bin = cumulative-tokens-before ÷ budget over a per-lang
    * doc_id order; the prefix comes from [[cumBeforeByLang]]'s
    * hierarchical (lang, doc_id-block) plan, so no stage funnels a whole
    * language through one task. Packing is order-local, so the
    * block-decomposed prefix composes exactly.
    */
  def packAssign(docs: DataFrame, budget: Int): DataFrame =
    cumBeforeByLang(docs.withColumn("toks", size(split(col("text"), " "))))
      .withColumn("bin", expr(s"cum_before div $budget"))

  /** Per-doc WINDOW OFFSETS — the loader-facing half of packing: a data
    * loader building attention masks needs each document's start
    * position INSIDE its context window, not just the bin id.
    * offset_in_bin = tokens-before mod budget (exactly `cum_before −
    * bin·budget`, so it composes with [[packAssign]]'s bin for free);
    * a doc whose offset + toks exceeds the budget straddles into the
    * next window — the greedy convention packAssign documents, now
    * visible per row. Same hierarchical prefix as every pack_* query —
    * no single-partition language stage.
    */
  def packOffsets(spark: SparkSession, sfDir: String): DataFrame =
    packAssign(Tables.documents(spark, sfDir), PackBudget)
      .select(col("lang"), col("bin"), col("doc_id"),
        (col("cum_before") - col("bin") * PackBudget).as("offset_in_bin"),
        col("toks"))
      .orderBy("lang", "bin", "offset_in_bin")

  /** Serve epochs emitted by [[packEpochOrder]]. */
  private[graft] val ServeEpochs = 3

  /** PER-EPOCH SERVE ORDER — the last loader artifact between packing
    * and the training loop: every epoch reshuffles the packed windows
    * deterministically (seeded by the window identity AND the epoch, so
    * epoch e+1's order is uncorrelated with epoch e's but identical on
    * every rerun/cluster). serve_rank is an EXACT global 1-based rank
    * per epoch — computed by the blocked prefix, never an unpartitioned
    * window: the hash key's top bits coarsen into ≤4096 contiguous
    * blocks (2⁴⁸ divisor over the 60-bit key), so the only cumulative
    * pass runs over ≤4096 summary rows per epoch while every data-scale
    * stage partitions on the block. At 100 TB (~25 M windows per epoch
    * at a 2048 budget) the manifest is windows × epochs rows and the
    * rank machinery is unchanged — exactly the `agg_rank_select`
    * discipline applied to the loader manifest.
    */
  def packEpochOrder(spark: SparkSession, sfDir: String): DataFrame =
    epochOrderOf(
      packAssign(Tables.documents(spark, sfDir), PackBudget)
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens")))

  /** The serve-order half of [[packEpochOrder]] over a caller-supplied
    * (lang, bin, n_docs, bin_tokens) window manifest — package-visible
    * so the refinery composes it over ITS windows
    * (`refinery_serve_order`).
    */
  private[llm] def epochOrderOf(bins: DataFrame): DataFrame = {
    import graft.operators.BlockedRank
    val keyed = bins
      .withColumn("epoch", explode(sequence(lit(0), lit(ServeEpochs - 1))))
      .withColumn("serve_key", Hashing.hash60(
        concat(col("lang"), lit("#"), col("bin").cast("string"),
          lit("#"), col("epoch").cast("string"))))
    BlockedRank.blockedPrefix(
      keyed,
      partition = Seq("epoch"),
      blocks = Seq("__so_b" -> expr("serve_key div 281474976710656")), // 2^48 → ≤4096 blocks
      blockDesc = Seq(false),
      localOrder = Seq(col("serve_key"), col("lang"), col("bin")),
      outRank = "serve_rank",
      outTotalN = "n_windows")
      .select("epoch", "serve_rank", "lang", "bin", "n_docs", "bin_tokens",
        "n_windows")
      .orderBy("epoch", "serve_rank")
  }

  /** LOADER-GRADE WINDOW FRAGMENTS — the rows an attention-mask-building
    * data loader actually consumes: one row per (document, context
    * window) FRAGMENT, materializing the straddling convention
    * [[packOffsets]] documents (a doc overflowing its window continues
    * into the next). For a doc with global token span
    * [cum_before, cum_before + toks) the fragments are its intersections
    * with the budget-aligned window grid:
    *
    *   bin            = cum_before div B + frag         (window id)
    *   frag_start_tok = max(bin·B − cum_before, 0)      (position IN the doc)
    *   frag_len       = min(cum_before+toks, (bin+1)·B) − max(cum_before, bin·B)
    *   offset_in_bin  = max(cum_before − bin·B, 0)      (position IN the window)
    *
    * so Σ frag_len per doc = toks, a non-first fragment always starts at
    * window offset 0, and fragments within one (lang, bin) tile the
    * window contiguously (`PackChunksSpec` pins all three). The explode
    * is bounded by ⌈toks∕B⌉ + 1 fragments per doc — output is
    * O(corpus_tokens ∕ B + n_docs), the loader's own scale — and the
    * prefix underneath is the same hierarchical (lang, doc_id-block)
    * plan as every pack_* query: no single-task language stage anywhere.
    */
  def packChunks(spark: SparkSession, sfDir: String): DataFrame = {
    val b = PackBudget.toLong
    packAssign(Tables.documents(spark, sfDir), PackBudget)
      .select(col("lang"), col("doc_id"),
        col("toks").cast("long").as("toks"), col("cum_before"))
      // greatest(..., 0) pins the toks >= 1 invariant EXPLICITLY: a
      // degenerate toks = 0 at a bin boundary would otherwise drive the
      // upper bound to -1, where Spark's sequence(0, -1) yields a
      // DESCENDING [0, -1] but DuckDB's generate_series yields nothing —
      // a silent cross-engine divergence class. Clamped the same way in
      // the oracle, both engines emit one zero-length fragment.
      .withColumn("frag", explode(sequence(lit(0L), greatest(
        expr(s"(cum_before + toks - 1) div $b - cum_before div $b"),
        lit(0L)))))
      .withColumn("bin", expr(s"cum_before div $b") + col("frag"))
      .select(
        col("lang"), col("bin"), col("doc_id"),
        greatest(col("bin") * b - col("cum_before"), lit(0L))
          .as("frag_start_tok"),
        (least(col("cum_before") + col("toks"), (col("bin") + 1) * b)
          - greatest(col("cum_before"), col("bin") * b)).as("frag_len"),
        greatest(col("cum_before") - col("bin") * b, lit(0L))
          .as("offset_in_bin"))
      .orderBy("lang", "bin", "offset_in_bin")
  }

  /** Packing profile: windows per language with doc and token counts. */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    packAssign(Tables.documents(spark, sfDir), PackBudget)
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"))
      .orderBy("lang", "bin")
  }

  /** Cumulative Poisson(1) CDF in exact ppm, frozen so both engines apply
    * the identical inverse-CDF table (weights ≥ 8 collapse into 7 — the
    * probability mass there is 1e-6).
    */
  val PoissonCumPpm: Seq[(Long, Int)] = Seq(
    367879L -> 0, 735759L -> 1, 919699L -> 2, 981012L -> 3,
    996340L -> 4, 999406L -> 5, 999917L -> 6)

  /** Deterministic Poisson bootstrap: B=3 bagging replicates where each doc
    * gets weight ~ Poisson(1) drawn by inverse-CDF over a hash uniform on
    * (doc_id, replicate) — the online-bootstrap trick (Oza & Russell): no
    * resampling pass, no rand(), identical replicas on any cluster or rerun,
    * and the weight is a per-row expression a scan can apply. Output is the
    * per-(source, replicate) weight audit: total weight tracks n_docs,
    * dropped ≈ e⁻¹ of docs.
    */
  def samplePoissonBootstrap(spark: SparkSession, sfDir: String): DataFrame = {
    val u = pmod(Hashing.hash60(
      concat(col("doc_id").cast("string"), lit(":"), col("rep").cast("string"))),
      lit(1000000L))
    val w = PoissonCumPpm.foldRight(lit(7): Column) {
      case ((ppm, k), acc) => when(col("u") < ppm, k).otherwise(acc)
    }
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0), lit(2))).as("rep"))
      .withColumn("u", u)
      .withColumn("w", w)
      .groupBy("source", "rep")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("total_weight"),
        count(when(col("w") === 0, lit(1))).as("n_dropped"),
        max(col("w")).as("max_weight"))
      .orderBy("source", "rep")
  }

  /** Deterministic 5-fold cross-validation assignment + balance report:
    * fold = id-hash mod 5, then per (fold, language) counts with the
    * within-fold share in integer ppm — the check a CV run does before
    * trusting its folds. The assignment is a per-row hash expression (the
    * house discipline: no rand(), reproducible at any cluster size, and a
    * fold filter prunes at the scan); the report is one fold×class-sized
    * groupBy plus a folds-sized window.
    */
  def sampleKfold(spark: SparkSession, sfDir: String): DataFrame = {
    val byFold = Window.partitionBy("fold")
    Tables.documents(spark, sfDir)
      .withColumn("fold",
        pmod(Hashing.hash60(col("doc_id").cast("string")), lit(5)).cast("int"))
      .groupBy("fold", "lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("fold_total", sum(col("n_docs")).over(byFold))
      .withColumn("share_ppm", expr("n_docs * 1000000 div fold_total"))
      .select("fold", "lang", "n_docs", "fold_total", "share_ppm")
      .orderBy("fold", "lang")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_kfold" -> (sampleKfold _),
    "sample_poisson_bootstrap" -> (samplePoissonBootstrap _),
    "sample_hash"       -> (sampleHash _),
    "sample_weighted"   -> (sampleWeighted _),
    "sample_stratified" -> (sampleStratified _),
    "sample_neyman"     -> (sampleNeyman _),
    "split_leakproof" -> (splitLeakproof _),
    "split_dedup_safe" -> (splitDedupSafe _),
    "mix_sources"     -> (mixSources _),
    "mix_epoch_schedule" -> (mixEpochSchedule _),
    "mix_anneal"      -> (mixAnneal _),
    "mix_budget_fill" -> (mixBudgetFill _),
    "mix_curriculum"  -> (mixCurriculum _),
    "mix_temperature" -> (mixTemperature _),
    "mix_unimax"      -> (mixUnimax _),
    "mix_doremi"      -> (mixDoremi _),
    "sample_balanced" -> (sampleBalanced _),
    "pack_sequences"  -> (packSequences _),
    "pack_offsets"    -> (packOffsets _),
    "pack_epoch_order" -> (packEpochOrder _),
    "pack_chunks"     -> (packChunks _),
    "pack_length_buckets" -> (packLengthBuckets _),
  )

  override def oracles: Map[String, String] = {
    val docBucket = duckBucket100("CAST(doc_id AS VARCHAR)")
    val srcBucket = duckBucket100("source")
    val bootU = Hashing.duckHash60(
      "CAST(doc_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)")
    val bootCase = PoissonCumPpm.foldRight("7") {
      case ((ppm, k), acc) => s"CASE WHEN u < $ppm THEN $k ELSE $acc END"
    }
    Map(
      "sample_kfold" ->
        s"""WITH t AS (
           |  SELECT CAST(${Hashing.duckHash60("CAST(doc_id AS VARCHAR)")} % 5 AS INTEGER) AS fold,
           |    lang
           |  FROM documents
           |), g AS (
           |  SELECT fold, lang, COUNT(*) AS n_docs FROM t GROUP BY fold, lang
           |)
           |SELECT fold, lang, n_docs,
           |  CAST(SUM(n_docs) OVER (PARTITION BY fold) AS BIGINT) AS fold_total,
           |  n_docs * 1000000 // CAST(SUM(n_docs) OVER (PARTITION BY fold) AS BIGINT) AS share_ppm
           |FROM g ORDER BY fold, lang""".stripMargin,
      "sample_poisson_bootstrap" ->
        s"""WITH d AS (
           |  SELECT doc_id, source, unnest([0, 1, 2]) AS rep FROM documents
           |), h AS (
           |  SELECT doc_id, source, rep, $bootU % 1000000 AS u FROM d
           |), w AS (
           |  SELECT source, rep, CAST($bootCase AS INTEGER) AS w FROM h
           |)
           |SELECT source, rep, COUNT(*) AS n_docs,
           |  CAST(SUM(w) AS BIGINT) AS total_weight,
           |  COUNT(CASE WHEN w = 0 THEN 1 END) AS n_dropped,
           |  MAX(w) AS max_weight
           |FROM w GROUP BY source, rep
           |ORDER BY source, rep""".stripMargin,
      "sample_weighted" ->
        s"""WITH kd AS (
           |  SELECT doc_id, source, n_chars,
           |    CAST(ROUND(ln((${Hashing.duckHash60("'ws:' || CAST(doc_id AS VARCHAR)")} + 1)
           |      / 1152921504606846976.0), 9) AS DECIMAL(13,9)) AS lnu
           |  FROM documents
           |), r AS (
           |  SELECT doc_id, source, n_chars,
           |    CAST(row_number() OVER (
           |      ORDER BY CAST(lnu AS DOUBLE) / n_chars DESC, doc_id)
           |      AS INTEGER) AS pick_rank
           |  FROM kd
           |)
           |SELECT doc_id, source, n_chars, pick_rank
           |FROM r WHERE pick_rank <= 100 ORDER BY doc_id""".stripMargin,
      "sample_neyman" ->
        s"""WITH sums AS (
           |  SELECT c_mktsegment AS seg, COUNT(*) AS n_h,
           |    SUM(CAST(c_acctbal AS DECIMAL(19,6))) AS s,
           |    SUM(CAST(c_acctbal AS DECIMAL(19,6)) * CAST(c_acctbal AS DECIMAL(19,6))) AS ss
           |  FROM customer GROUP BY c_mktsegment
           |), d1 AS (
           |  SELECT seg, n_h,
           |    CAST(ROUND(sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n_h::DOUBLE) / n_h::DOUBLE)
           |      * 1000000, 0) AS BIGINT) AS sigma_micro
           |  FROM sums
           |), d2 AS (
           |  SELECT *, n_h * (sigma_micro // 1000) AS w FROM d1
           |), tot AS (
           |  SELECT CAST(SUM(w) AS BIGINT) AS w_tot, CAST(SUM(n_h) AS BIGINT) AS n_tot FROM d2
           |), design AS (
           |  SELECT seg, n_h, sigma_micro,
           |    150 * w // w_tot AS alloc_neyman,
           |    150 * n_h // n_tot AS alloc_prop,
           |    (150 * w // w_tot) * 1000000 // n_h AS rate_ppm
           |  FROM d2 CROSS JOIN tot
           |)
           |SELECT c.c_mktsegment, MIN(d.n_h) AS n_h, MIN(d.sigma_micro) AS sigma_micro,
           |  MIN(d.alloc_neyman) AS alloc_neyman, MIN(d.alloc_prop) AS alloc_prop,
           |  MIN(d.rate_ppm) AS rate_ppm,
           |  CAST(SUM(CASE WHEN ${Hashing.duckHash60("CAST(c_custkey AS VARCHAR)")} % 1000000
           |       < d.rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS realized_n
           |FROM customer c JOIN design d ON c.c_mktsegment = d.seg
           |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
      "sample_hash" ->
        s"""SELECT doc_id, lang, source, CAST($docBucket AS INTEGER) AS bucket
           |FROM documents
           |WHERE $docBucket < 10
           |ORDER BY doc_id""".stripMargin,
      "sample_stratified" ->
        s"""WITH r AS (
           |  SELECT lang, doc_id, source,
           |    CAST(row_number() OVER (PARTITION BY lang
           |      ORDER BY ${Hashing.duckHash60("CAST(doc_id AS VARCHAR)")}, doc_id) AS INTEGER) AS rn
           |  FROM documents
           |)
           |SELECT lang, rn, doc_id, source FROM r WHERE rn <= 20
           |ORDER BY lang, rn""".stripMargin,
      "split_leakproof" ->
        s"""WITH assigned AS (
           |  SELECT source,
           |    CASE WHEN $srcBucket < 80 THEN 'train'
           |         WHEN $srcBucket < 90 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM documents
           |)
           |SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources
           |FROM assigned GROUP BY split ORDER BY split""".stripMargin,
      // split_dedup_safe: the cluster closure (shared loser CTEs expose
      // cl_reach), membership derived as LEAST(n, MIN(m)), hash-split by
      // UNIT id, straddle audit pinned in the output.
      "split_dedup_safe" ->
        s"""WITH RECURSIVE ${Dedup.duckClusterLoserCtes},
           |cl_members AS (
           |  SELECT n AS doc_id, LEAST(n, MIN(m)) AS cluster
           |  FROM cl_reach GROUP BY n
           |), d AS (
           |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
           |    m.cluster, COALESCE(m.cluster, doc_id) AS unit
           |  FROM documents LEFT JOIN cl_members m USING (doc_id)
           |), s AS (
           |  SELECT *,
           |    CASE WHEN ${Hashing.duckHash60("'dsplit:' || CAST(unit AS VARCHAR)")} % 100 < 90
           |         THEN 'train' ELSE 'val' END AS side
           |  FROM d
           |), st AS (
           |  SELECT CAST(COALESCE(SUM(CASE WHEN nsides > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
           |    AS straddling_clusters
           |  FROM (SELECT cluster, COUNT(DISTINCT side) AS nsides
           |        FROM s WHERE cluster IS NOT NULL GROUP BY cluster)
           |)
           |SELECT side, COUNT(*) AS n_docs, CAST(SUM(nw) AS BIGINT) AS tokens,
           |  CAST(SUM(CASE WHEN cluster IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS clustered_docs,
           |  st.straddling_clusters
           |FROM s CROSS JOIN st
           |GROUP BY side, st.straddling_clusters ORDER BY side""".stripMargin,
      "mix_sources" ->
        s"""WITH d AS (
           |  SELECT source,
           |    CAST(25 + (${Hashing.duckHash60("source")} % 3) * 25 AS INTEGER) AS rate_pct,
           |    ($docBucket < 25 + (${Hashing.duckHash60("source")} % 3) * 25) AS kept
           |  FROM documents
           |)
           |SELECT source, rate_pct, COUNT(*) AS n_total,
           |  COUNT(CASE WHEN kept THEN 1 END) AS n_kept
           |FROM d GROUP BY source, rate_pct ORDER BY source""".stripMargin,
      "mix_epoch_schedule" ->
        """WITH per_src AS (
          |  SELECT source,
          |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
          |    COALESCE(TRY_CAST(regexp_extract(source, '(\d+)$', 1) AS BIGINT), 0) % 5 + 1
          |      AS weight_parts
          |  FROM documents GROUP BY source
          |), tot AS (
          |  SELECT CAST(SUM(tokens) AS BIGINT) AS budget,
          |    CAST(SUM(weight_parts) AS BIGINT) AS total_parts
          |  FROM per_src
          |), sched AS (
          |  SELECT source, weight_parts, tokens,
          |    budget * weight_parts // total_parts AS target_tokens
          |  FROM per_src CROSS JOIN tot
          |)
          |SELECT source, weight_parts, tokens, target_tokens,
          |  target_tokens * 1000 // tokens AS epochs_milli,
          |  (target_tokens * 1000 // tokens) > 1000 AS upsampled
          |FROM sched ORDER BY source""".stripMargin,
      // mix_anneal: same histogram-cutoff derivation as
      // curate_perplexity_scaled, on the per-doc TTR ppm grid, gating
      // DESC (top third kept, ties at the cutoff kept).
      "mix_anneal" ->
        """WITH d AS (
          |  SELECT doc_id, lang, source,
          |    len(string_split(text, ' ')) AS nw,
          |    len(list_distinct(string_split(text, ' '))) AS ndw
          |  FROM documents
          |), q AS (
          |  SELECT *, ndw * 1000000 // nw AS q_ppm FROM d
          |), grid AS (
          |  SELECT lang, q_ppm, COUNT(*) AS c FROM q GROUP BY lang, q_ppm
          |), cum AS (
          |  SELECT lang, q_ppm,
          |    SUM(c) OVER (PARTITION BY lang ORDER BY q_ppm DESC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          |    SUM(c) OVER (PARTITION BY lang) AS n_lang
          |  FROM grid
          |), cut AS (
          |  SELECT lang, MAX(q_ppm) AS cutoff FROM cum
          |  WHERE cum * 3 >= n_lang GROUP BY lang
          |), f AS (
          |  SELECT q.*, (q.q_ppm >= cut.cutoff) AS anneal
          |  FROM q JOIN cut USING (lang)
          |), tot AS (
          |  SELECT CAST(SUM(nw) AS BIGINT) AS tot_tokens,
          |    CAST(SUM(CASE WHEN anneal THEN nw ELSE 0 END) AS BIGINT) AS tot_anneal
          |  FROM f
          |)
          |SELECT source, COUNT(*) AS n_docs,
          |  CAST(SUM(nw) AS BIGINT) AS tokens,
          |  CAST(SUM(CASE WHEN anneal THEN 1 ELSE 0 END) AS BIGINT) AS anneal_docs,
          |  CAST(SUM(CASE WHEN anneal THEN nw ELSE 0 END) AS BIGINT) AS anneal_tokens,
          |  CASE WHEN CAST(SUM(nw) AS BIGINT) = 0 THEN CAST(0 AS BIGINT)
          |       ELSE CAST(CAST(SUM(CASE WHEN anneal THEN nw ELSE 0 END) AS BIGINT) * 1000000 //
          |            CAST(SUM(nw) AS BIGINT) AS BIGINT) END AS anneal_token_ppm,
          |  CASE WHEN tot.tot_anneal = 0 THEN CAST(0 AS BIGINT)
          |       ELSE CAST((tot.tot_tokens // 10) * 1000 // tot.tot_anneal AS BIGINT)
          |  END AS epochs_milli
          |FROM f CROSS JOIN tot
          |GROUP BY source, tot.tot_tokens, tot.tot_anneal
          |ORDER BY source""".stripMargin,
      "mix_curriculum" ->
        """WITH d AS (
          |  SELECT doc_id, lang, source,
          |    len(string_split(text, ' ')) AS nw,
          |    len(list_distinct(string_split(text, ' '))) AS ndw
          |  FROM documents
          |), q AS (
          |  SELECT *, ndw * 1000000 // nw AS q_ppm FROM d
          |), grid AS (
          |  SELECT lang, q_ppm, COUNT(*) AS c FROM q GROUP BY lang, q_ppm
          |), cum AS (
          |  SELECT lang, q_ppm,
          |    SUM(c) OVER (PARTITION BY lang ORDER BY q_ppm DESC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          |    SUM(c) OVER (PARTITION BY lang) AS n_lang
          |  FROM grid
          |), cut AS (
          |  SELECT lang, MAX(q_ppm) AS cutoff FROM cum
          |  WHERE cum * 3 >= n_lang GROUP BY lang
          |), f AS (
          |  SELECT q.*, (q.q_ppm >= cut.cutoff) AS anneal
          |  FROM q JOIN cut USING (lang)
          |), s AS (
          |  SELECT source, CAST(SUM(nw) AS BIGINT) AS tokens,
          |    CAST(SUM(CASE WHEN anneal THEN nw ELSE 0 END) AS BIGINT) AS anneal_tokens
          |  FROM f GROUP BY source
          |), tot AS (
          |  SELECT CAST(SUM(tokens) AS BIGINT) AS tt,
          |    CAST(SUM(anneal_tokens) AS BIGINT) AS ta
          |  FROM s
          |), steps(step) AS (VALUES (0), (1), (2), (3)),
          |w AS (
          |  SELECT CAST(step AS INTEGER) AS step, source,
          |    tokens * 1000000 // tt AS base_ppm,
          |    CASE WHEN ta = 0 THEN CAST(0 AS BIGINT)
          |         ELSE anneal_tokens * 1000000 // ta END AS quality_ppm
          |  FROM s CROSS JOIN tot CROSS JOIN steps
          |)
          |SELECT step, source,
          |  CAST((base_ppm * (3 - step) + quality_ppm * step) // 3 AS BIGINT) AS w_ppm
          |FROM w ORDER BY step, source""".stripMargin,
      "mix_budget_fill" ->
        """WITH d AS (
          |  SELECT doc_id, source,
          |    len(string_split(text, ' ')) AS nw,
          |    len(list_distinct(string_split(text, ' '))) AS ndw
          |  FROM documents
          |), q AS (
          |  SELECT *, ndw * 1000000 // nw AS q_ppm FROM d
          |), c AS (
          |  SELECT *,
          |    COALESCE(SUM(nw) OVER (PARTITION BY source
          |      ORDER BY q_ppm DESC, doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
          |    SUM(nw) OVER (PARTITION BY source) AS tot
          |  FROM q
          |), k AS (
          |  SELECT *, (2 * cb < tot) AS kept FROM c
          |)
          |SELECT source, COUNT(*) AS n_docs,
          |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          |  CAST(SUM(nw) AS BIGINT) AS tokens_total,
          |  CAST(SUM(CASE WHEN kept THEN nw ELSE 0 END) AS BIGINT) AS tokens_kept,
          |  CAST(CAST(SUM(CASE WHEN kept THEN nw ELSE 0 END) AS BIGINT) * 1000000 //
          |       CAST(SUM(nw) AS BIGINT) AS BIGINT) AS kept_token_ppm,
          |  CAST(MIN(CASE WHEN kept THEN q_ppm END) AS BIGINT) AS q_floor_ppm
          |FROM k GROUP BY source ORDER BY source""".stripMargin,
      "sample_balanced" ->
        s"""WITH r AS (
           |  SELECT lang, doc_id,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY ${Hashing.duckHash60("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
           |  FROM documents
           |), m AS (
           |  SELECT MIN(n) AS min_n FROM (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
           |)
           |SELECT lang, COUNT(*) AS n_total,
           |  COUNT(CASE WHEN rn <= m.min_n THEN 1 END) AS n_kept,
           |  CAST(SUM(CASE WHEN rn <= m.min_n THEN doc_id END) AS BIGINT) AS kept_id_sum
           |FROM r CROSS JOIN m
           |GROUP BY lang
           |ORDER BY lang""".stripMargin,
      "mix_temperature" ->
        s"""WITH counts AS (
           |  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
           |), rates AS (
           |  SELECT source, n_s,
           |    ROUND(sqrt((SELECT MIN(n_s) FROM counts) / n_s), 6) AS rate
           |  FROM counts
           |)
           |SELECT d.source, r.rate, COUNT(*) AS n_total,
           |  COUNT(CASE WHEN
           |    CAST(${Hashing.duckHash60("CAST(d.doc_id AS VARCHAR)")} % 1000000 AS DOUBLE)
           |      / 1000000.0 < r.rate THEN 1 END) AS n_kept
           |FROM documents d JOIN rates r ON d.source = r.source
           |GROUP BY d.source, r.rate
           |ORDER BY d.source""".stripMargin,
      // mix_doremi: integer micro-nat/ppm re-derivation of the 3 MW rounds,
      // unrolled (two CTE steps per round: excess needs the α·L window sum,
      // the update needs the w window sum — w is inlined twice rather than
      // staged). SUM(BIGINT) is HUGEINT in DuckDB: exact, positive-operand
      // // matches Spark div, and the final SELECT casts every column back
      // to BIGINT for the type-sensitive driver hash.
      "mix_doremi" -> {
        val rounds = (1 to DoremiRounds).map { t =>
          s"""r${t}a AS (
             |  SELECT source, n_docs, loss_micro, d_count, alpha,
             |    greatest(loss_micro
             |      - (SUM(alpha * loss_micro) OVER ()) // 1000000, 0) AS excess
             |  FROM r${t - 1}
             |), r$t AS (
             |  SELECT source, n_docs, loss_micro, d_count, excess,
             |    (900000 * (((alpha * (1000000 + excess // 2)) // 1000000) * 1000000
             |        // (SUM((alpha * (1000000 + excess // 2)) // 1000000) OVER ()))
             |     + 100000 * (1000000 // d_count)) // 1000000 AS alpha
             |  FROM r${t}a
             |)""".stripMargin
        }.mkString(", ")
        s"""WITH toks AS (
           |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
           |  FROM documents
           |), vocab AS (
           |  SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w
           |), total AS (
           |  SELECT COUNT(*)::DOUBLE AS tot FROM toks
           |), micro AS (
           |  SELECT w, CAST(CAST(ROUND(ln(cnt / tot), 6) AS DECIMAL(12,6))
           |    * -1000000 AS BIGINT) AS micro
           |  FROM vocab CROSS JOIN total
           |), per_doc AS (
           |  SELECT t.doc_id, t.source, SUM(m.micro) // COUNT(*) AS doc_loss
           |  FROM toks t JOIN micro m ON t.w = m.w
           |  GROUP BY t.doc_id, t.source
           |), dom AS (
           |  SELECT source, COUNT(*) AS n_docs,
           |    SUM(doc_loss) // COUNT(*) AS loss_micro
           |  FROM per_doc GROUP BY source
           |), r0 AS (
           |  SELECT source, n_docs, loss_micro,
           |    COUNT(*) OVER () AS d_count,
           |    1000000 // COUNT(*) OVER () AS alpha
           |  FROM dom
           |), $rounds
           |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           |  CAST(loss_micro AS BIGINT) AS loss_micro,
           |  CAST(excess AS BIGINT) AS excess_micro,
           |  CAST(alpha AS BIGINT) AS alpha_ppm
           |FROM r$DoremiRounds ORDER BY source""".stripMargin
      },
      "mix_unimax" ->
        """WITH per_lang AS (
          |  SELECT lang, SUM(len(string_split(text, ' '))) AS n_tokens
          |  FROM documents GROUP BY lang
          |), env AS (
          |  SELECT lang, n_tokens, n_tokens * 1 AS capacity,
          |    (SELECT (SUM(n_tokens) * 8) // 10 FROM per_lang) AS budget,
          |    (SELECT COUNT(*) FROM per_lang) AS l_count,
          |    row_number() OVER (ORDER BY n_tokens * 1, lang) AS k,
          |    SUM(n_tokens * 1) OVER (ORDER BY n_tokens * 1, lang) AS s
          |  FROM per_lang
          |), flagged AS (
          |  SELECT *, capacity * (l_count - k) <= budget - s AS flag FROM env
          |), star AS (
          |  SELECT *,
          |    COALESCE(MAX(CASE WHEN flag THEN k END) OVER (), 0) AS k_star,
          |    COALESCE(MAX(CASE WHEN flag THEN s END) OVER (), 0) AS s_star
          |  FROM flagged
          |)
          |SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
          |  CAST(capacity AS BIGINT) AS capacity, (k <= k_star) AS capped,
          |  CAST(CASE WHEN k <= k_star THEN capacity
          |       ELSE (budget - s_star) // (l_count - k_star) END AS BIGINT) AS alloc_tokens,
          |  ROUND((CASE WHEN k <= k_star THEN capacity
          |              ELSE (budget - s_star) // (l_count - k_star) END)::DOUBLE
          |        / n_tokens, 6) AS epochs
          |FROM star ORDER BY lang""".stripMargin,
      "pack_length_buckets" ->
        s"""WITH t AS (
           |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
           |  FROM documents
           |), naive AS (
           |  SELECT 'arrival' AS strategy,
           |    CAST(doc_id // $PackBatch AS VARCHAR) AS batch, toks
           |  FROM t
           |), bucketed AS (
           |  SELECT 'length_bucketed' AS strategy,
           |    CAST(toks // $PackBucketWidth AS VARCHAR) || ':' ||
           |      CAST((row_number() OVER (PARTITION BY toks // $PackBucketWidth
           |           ORDER BY toks, doc_id) - 1) // $PackBatch AS VARCHAR) AS batch,
           |    toks
           |  FROM t
           |), batches AS (
           |  SELECT strategy, batch, COUNT(*) AS n, SUM(toks) AS st,
           |    MAX(toks) AS mx
           |  FROM (SELECT * FROM naive UNION ALL SELECT * FROM bucketed)
           |  GROUP BY strategy, batch
           |)
           |SELECT strategy, COUNT(*) AS n_batches,
           |  CAST(SUM(st) AS BIGINT) AS n_tokens,
           |  CAST(SUM(n * mx - st) AS BIGINT) AS padded_tokens,
           |  CAST(SUM(n * mx - st) * 1000000
           |    // (SUM(st) + SUM(n * mx - st)) AS BIGINT) AS waste_ppm
           |FROM batches GROUP BY strategy ORDER BY strategy""".stripMargin,
      "pack_sequences" ->
        s"""WITH t AS (
           |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS toks
           |  FROM documents
           |), c AS (
           |  SELECT lang, toks,
           |    COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           |  FROM t
           |)
           |SELECT lang, CAST(cum_before // $PackBudget AS BIGINT) AS bin,
           |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens
           |FROM c GROUP BY lang, cum_before // $PackBudget ORDER BY lang, bin""".stripMargin,
      "pack_epoch_order" ->
        s"""WITH t AS (
           |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS toks
           |  FROM documents
           |), c AS (
           |  SELECT lang, toks,
           |    COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           |  FROM t
           |), bins AS (
           |  SELECT lang, CAST(cum_before // $PackBudget AS BIGINT) AS bin,
           |    COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens
           |  FROM c GROUP BY lang, cum_before // $PackBudget
           |), keyed AS (
           |  SELECT lang, bin, n_docs, bin_tokens,
           |    CAST(unnest(range(0, $ServeEpochs)) AS INTEGER) AS epoch
           |  FROM bins
           |), r AS (
           |  SELECT *, ${Hashing.duckHash60(
                "lang || '#' || CAST(bin AS VARCHAR) || '#' || CAST(epoch AS VARCHAR)")} AS serve_key
           |  FROM keyed
           |)
           |SELECT epoch,
           |  CAST(row_number() OVER (PARTITION BY epoch
           |    ORDER BY serve_key, lang, bin) AS BIGINT) AS serve_rank,
           |  lang, bin, n_docs, bin_tokens,
           |  CAST(COUNT(*) OVER (PARTITION BY epoch) AS BIGINT) AS n_windows
           |FROM r ORDER BY epoch, serve_rank""".stripMargin,
      "pack_offsets" ->
        s"""WITH t AS (
           |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS toks
           |  FROM documents
           |), c AS (
           |  SELECT lang, doc_id, toks,
           |    CAST(COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           |  FROM t
           |)
           |SELECT lang, CAST(cum_before // $PackBudget AS BIGINT) AS bin, doc_id,
           |  CAST(cum_before % $PackBudget AS BIGINT) AS offset_in_bin, toks
           |FROM c ORDER BY lang, bin, offset_in_bin""".stripMargin,
      "pack_chunks" ->
        s"""WITH t AS (
           |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
           |  FROM documents
           |), c AS (
           |  SELECT lang, doc_id, toks,
           |    CAST(COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           |  FROM t
           |), f AS (
           |  SELECT lang, doc_id, toks, cum_before,
           |    cum_before // $PackBudget + unnest(generate_series(0, GREATEST(
           |      (cum_before + toks - 1) // $PackBudget - cum_before // $PackBudget, 0))) AS bin
           |  FROM c
           |)
           |SELECT lang, CAST(bin AS BIGINT) AS bin, doc_id,
           |  CAST(GREATEST(bin * $PackBudget - cum_before, 0) AS BIGINT) AS frag_start_tok,
           |  CAST(LEAST(cum_before + toks, (bin + 1) * $PackBudget)
           |    - GREATEST(cum_before, bin * $PackBudget) AS BIGINT) AS frag_len,
           |  CAST(GREATEST(cum_before - bin * $PackBudget, 0) AS BIGINT) AS offset_in_bin
           |FROM f ORDER BY lang, bin, offset_in_bin""".stripMargin,
    )
  }
}
