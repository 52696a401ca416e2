package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** Embedding-corpus analyses: stats, centroids, k-means step + elbow,
  * silhouette, PCA power iteration, variance screen, separation, kNN
  * graph, OOD screen, and the IVF recall / rank-quality evaluations.
  *
  * Mechanically moved from the former monolithic Similarity.scala (round
  * 11); behavior-identical — proved by the normalized plan-identity diff
  * and the untouched CORRECTNESS hashes.
  */

trait SimilarityEmb extends SimilarityIvf with SimilarityBrute {

  /** Embedding-corpus preprocessing stats per label: count and norm
    * distribution — the sanity pass a pipeline runs before indexing
    * (catches unnormalized or degenerate vectors).
    */
  /** Per-label embedding centroids, one row per (label, dimension) — the
    * k-means/IVF training step (a real index recomputes these per
    * iteration; serving needs them resident). posexplode → groupBy
    * (label, pos): the shuffle carries compact scalar rows with map-side
    * partial averages, never whole vectors — at 100 TB the reduce side is
    * labels × dims rows regardless of corpus size.
    */
  def embCentroid(spark: SparkSession, sfDir: String): DataFrame = {
    embDouble(Tables.embeddings(spark, sfDir))
      .select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), round(avg(col("v")), 6).as("c"))
      .orderBy("label", "pos")
  }

  /** One Lloyd (k-means) refinement iteration — the training loop behind a
    * real IVF index, end to end: assign every vector to its nearest seed
    * centroid (argmax cosine, ties by centroid id), recompute centroids as
    * per-dimension means, reassign against the refined centroids. Output:
    * per-cluster population before/after + refined-centroid norm.
    *
    * Cross-engine determinism: the refined centroids are ROUNDED (6dp)
    * before reassignment, so both engines compare against identical
    * doubles — float-mean merge order can wiggle the last ulp, rounding
    * pins it. Scale: assignments are broadcast-k crossJoins (map-side);
    * the mean recompute shuffles scalar (cluster, dim, value) rows — the
    * emb_centroid shape; nothing materializes per-pair state. Rounds = a
    * driver loop of the same plan — each iteration is this query.
    */
  def embKmeans(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val a1 = ivfAssignTo(ivfCentroidsOf(emb), emb)
    val newCents = lloydRefine(a1)
    val a2 = ivfAssignTo(newCents, emb)

    val n1 = a1.groupBy("cluster").agg(count(lit(1)).as("n_r1"))
    val n2 = a2.groupBy("cluster").agg(count(lit(1)).as("n_r2"))
    val cnorm = newCents.select(
      col("cent_id").as("cluster"),
      round(sqrt(hofDot(col("cente"), col("cente"))), 6).as("cent_norm"))
    n1.join(n2, Seq("cluster"), "left")
      .join(cnorm, "cluster")
      .select(col("cluster"), col("n_r1"),
        coalesce(col("n_r2"), lit(0L)).as("n_r2"), col("cent_norm"))
      .orderBy("cluster")
  }

  /** Simplified (centroid) silhouette — the clustering-quality report for
    * the curation stack built on these cells (emb_kmeans, dedup_semantic,
    * sim_ann_ivf): per point, a = cosine distance to its OWN centroid,
    * b = distance to the nearest OTHER centroid, s = (b − a) / max(a, b).
    * The classic silhouette's pairwise a/b is O(n²) and dies at corpus
    * scale; the centroid form (standard "simplified silhouette") is
    * O(n·k) — one broadcast crossJoin pass, the same topology as the
    * assignment step itself. With nearest-centroid assignment a ≤ b by
    * construction, so s ∈ [0, 1]: it reports the separation margin (0 =
    * on the decision boundary; the degenerate b = 0 case scores 0, the
    * house convention for silhouette's 0/0).
    *
    * Cross-engine exactness: both distances round onto the 6dp decimal
    * grid (monotone, so rounding preserves a ≤ b), then s is one integral
    * division on micro units — per-cluster means are integer arithmetic.
    */
  def embSilhouette(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val cents = emb.filter(col("vec_id") < NCentroids)
      .select(col("vec_id").as("cent_id"), col("e").as("cente"))
    val byCos = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    // rank 1 = own centroid (max cos = min distance), rank 2 = nearest
    // other — the cosine ranking IS the distance ranking reversed
    val ab = emb.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("e"), col("cente")))
      .withColumn("crn", row_number().over(byCos))
      .filter(col("crn") <= 2)
      .groupBy("vec_id")
      .agg(
        max(when(col("crn") === 1, col("cent_id"))).as("cluster"),
        max(when(col("crn") === 1, col("ccos"))).as("cos_own"),
        max(when(col("crn") === 2, col("ccos"))).as("cos_next"))
      .select(col("vec_id"), col("cluster"),
        (round(lit(1) - col("cos_own"), 6).cast("decimal(9,6)")
          * lit(1000000)).cast("long").as("a_micro"),
        (round(lit(1) - col("cos_next"), 6).cast("decimal(9,6)")
          * lit(1000000)).cast("long").as("b_micro"))
    ab
      .withColumn("sil", when(col("b_micro") === 0, lit(0L))
        .otherwise(expr("(b_micro - a_micro) * 1000000 div b_micro")))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(sil) div count(1)").as("mean_sil_ppm"),
        min(col("sil")).as("min_sil_ppm"),
        max(col("sil")).as("max_sil_ppm"))
      .orderBy("cluster")
  }

  /** Elbow-method inertia sweep — the model-selection report next to
    * emb_silhouette: for k ∈ {2, 4, 8} seed centroids, total and mean
    * within-cluster cosine distance (micro grid). Picking k is the first
    * decision every clustering-based curation stage makes; the elbow is
    * where the inertia drop flattens. Only the BEST cosine per (point, k)
    * matters, so assignment ties are irrelevant and the whole sweep is
    * max-aggregates over broadcast crossJoins — one pass per k, O(n·k)
    * total, monotone by construction (more centroids can never increase
    * a point's distance — spec-pinned).
    */
  def embKmeansElbow(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    Seq(2, 4, 8).map { k =>
      val cents = emb.filter(col("vec_id") < k)
        .select(col("vec_id").as("cent_id"), col("e").as("cente"))
      emb.crossJoin(broadcast(cents))
        .withColumn("ccos", cosine(col("e"), col("cente")))
        .groupBy("vec_id").agg(max(col("ccos")).as("best"))
        .select((round(lit(1) - col("best"), 6).cast("decimal(9,6)")
          * lit(1000000)).cast("long").as("a"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("a")).as("inertia_micro"))
        .withColumn("k", lit(k))
    }.reduce(_ unionByName _)
      .select(col("k"), col("n_vecs"), col("inertia_micro"),
        expr("inertia_micro div n_vecs").as("mean_micro"))
      .orderBy("k")
  }

  def embStats(spark: SparkSession, sfDir: String): DataFrame = {
    embDouble(Tables.embeddings(spark, sfDir))
      .withColumn("nrm", normOf(col("e")))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("nrm")), 6).as("avg_norm"),
        round(min(col("nrm")), 6).as("min_norm"),
        round(max(col("nrm")), 6).as("max_norm"))
      .orderBy("label")
  }

  /** Int8 symmetric quantization profile: per vector, scale = 127/max|x|
    * and q_i = ⌊x_i·scale⌋ — the compression pass an ANN index runs before
    * storing vectors (4× memory cut; floor not round because floor is
    * bit-deterministic across engines). Output is the per-vector checksum
    * profile (sum/min/max of the int codes + the scale in exact micro
    * units), not the array itself, so the oracle hash-checks every code
    * without array-typed output columns.
    */
  def embQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
      .withColumn("mx", array_max(transform(col("e"), x => abs(x))))
      .withColumn("scale", lit(127.0) / col("mx"))
      .withColumn("q", transform(col("e"), x => floor(x * col("scale"))))
    emb.select(
      col("vec_id"),
      floor(col("scale") * 1000000).as("scale_micro"),
      aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
      array_min(col("q")).as("q_min"),
      array_max(col("q")).as("q_max"))
      .orderBy("vec_id")
  }

  /** ANN quality evaluation — recall@3 of the IVF index against the exact
    * brute-force ground truth, per query. The report every production ANN
    * deployment runs before trusting an index (and re-runs as the corpus
    * drifts): approximate search is only as good as its measured recall.
    * Pure set-overlap counting on two already-oracle-checked result sets,
    * so the metric itself is integer-exact at any scale. Zero-hit queries
    * survive the left join (recall 0.0 rows are the interesting ones).
    */
  def simAnnRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val exact3 = simCosineTopk(spark, sfDir)
      .filter(col("rn") <= 3).select(col("q_id"), col("cand_id"))
    val ivf3 = simAnnIvf(spark, sfDir)
      .select(col("q_id"), col("cand_id"), lit(1).as("hit"))
    exact3.join(ivf3, Seq("q_id", "cand_id"), "left")
      .groupBy("q_id")
      .agg(
        count(col("hit")).as("n_hits"),
        round(count(col("hit")) / lit(3.0), 4).as("recall"))
      .orderBy("q_id")
  }

  /** Rank-QUALITY evaluation of the ANN index — recall (sim_ann_recall)
    * says how many true neighbors come back; this says WHERE they land.
    * Per query: MRR (reciprocal rank of the first true-top-3 hit) and a
    * graded DCG/nDCG over the IVF ranking, with relevance 3/2/1 for the
    * exact top-1/2/3 and 0 otherwise. Discounts are HARMONIC
    * (1/(position+1)) rather than log2: every term is then an exact
    * integer in micro-units (ppm) that both engines compute identically —
    * the house integer-grid discipline — while preserving what a
    * discount needs (strictly decreasing in position); textbook log2
    * nDCG is one transcendental away and would put a libm ulp under the
    * hash. Scale: rides the already-priced rankings (broadcast-query
    * brute force for truth, cluster-join IVF probe) plus a
    * queries×top-k-sized join and two tiny aggregates — evaluation cost
    * is fixed regardless of corpus size, like every eval op here.
    */
  def simEvalRank(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = simCosineTopk(spark, sfDir)
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("cand_id"),
        (lit(4L) - col("rn")).cast("long").as("rel"))
    val ivf = simAnnIvf(spark, sfDir)
      .select(col("q_id"), col("rn").as("pos"), col("cand_id"))
    val perQ = ivf.join(truth, Seq("q_id", "cand_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      .groupBy("q_id")
      .agg(
        min(when(col("rel") > 0, col("pos"))).as("frp"),
        sum(expr("rel * 1000000 div (pos + 1)")).as("dcg_ppm"),
        count(when(col("rel") > 0, lit(1))).as("hits"))
    val ideal = truth
      .withColumn("ipos", row_number().over(
        Window.partitionBy("q_id").orderBy(col("rel").desc, col("cand_id"))))
      .groupBy("q_id")
      .agg(sum(expr("rel * 1000000 div (ipos + 1)")).as("idcg_ppm"))
    // anchor on the TRUTH side (every query has exactly 3 exact-top-3
    // rows), not on the probe side: a query alone in its IVF cell returns
    // zero candidates and must read 0s here — dropping it would overstate
    // index quality exactly when the index fails worst (the
    // sim_ann_recall convention; review-caught)
    ideal.join(perQ, Seq("q_id"), "left")
      .select(
        col("q_id"),
        coalesce(col("frp"), lit(0)).cast("long").as("first_rel_pos"),
        when(col("frp").isNull, lit(0L))
          .otherwise(expr("CAST(1000000 div frp AS BIGINT)")).as("mrr_ppm"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("dcg_ppm"), lit(0L)).as("dcg_ppm"),
        col("idcg_ppm"),
        expr("coalesce(dcg_ppm, 0) * 1000000 div idcg_ppm").as("ndcg_ppm"))
      .orderBy("q_id")
  }

  /** Threshold-tuning sweep for embedding dedup: pair counts at five
    * cosine cutoffs from ONE all-pairs pass (conditional counts, not five
    * queries) — the report that picks dedup_embedding's threshold before a
    * production run. Bounded probe set (first 2000 vectors) because the
    * sweep is a sampled calibration, not the dedup itself: cost is fixed
    * regardless of corpus size, like every evaluation op here.
    */
  def embThresholdSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
      .filter(col("vec_id") < 2000)
      .withColumn("nrm", normOf(col("e")))
    val a = emb.select(col("vec_id").as("vec_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("vec_b"), col("e").as("eb"), col("nrm").as("nb"))
    val cos = round(cosinePrenorm(col("ea"), col("eb"), col("na"), col("nb")), 6)
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", cos)
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("cos") >= 0.3, 1).otherwise(0)).cast("long").as("n_030"),
        sum(when(col("cos") >= 0.45, 1).otherwise(0)).cast("long").as("n_045"),
        sum(when(col("cos") >= 0.6, 1).otherwise(0)).cast("long").as("n_060"),
        sum(when(col("cos") >= 0.75, 1).otherwise(0)).cast("long").as("n_075"),
        sum(when(col("cos") >= 0.9, 1).otherwise(0)).cast("long").as("n_090"))
  }

  /** Top-variance embedding dimensions — the feature-selection pass before
    * a cheap filtered index (or a PCA sanity check: near-zero-variance dims
    * carry no signal and can be pruned from distance math). Per-dim mean and
    * E[x²] are each ROUNDED (6dp) before the variance subtraction, so the
    * ranking key is identical double arithmetic in both engines regardless
    * of aggregation merge order. Shuffle carries (pos, scalar) rows —
    * dimension-keyed, corpus-size-independent output.
    */
  def embVarDims(spark: SparkSession, sfDir: String): DataFrame = {
    // one row per embedding DIMENSION (64) — bounded by construction,
    // marked with the boundedPartition idiom for the PlanSpec window guard
    val byVar = Window
      .partitionBy(graft.operators.BlockedRank.boundedPartition(col("pos")))
      .orderBy(col("variance").desc, col("pos"))
    embDouble(Tables.embeddings(spark, sfDir))
      .select(posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        round(avg(col("v")), 6).as("mean"),
        round(avg(col("v") * col("v")), 6).as("m2"))
      .withColumn("variance", round(col("m2") - col("mean") * col("mean"), 6))
      .withColumn("rank", row_number().over(byVar))
      .filter(col("rank") <= 8)
      .select(col("rank"), col("pos"), col("n"), col("mean"), col("variance"))
      .orderBy("rank")
  }

  /** One PCA power-iteration step, matrix-free: v₁ ∝ E[x·xᵀ]·v₀ computed as
    * E[x_j · s] with s = ⟨x, v₀⟩ — the Krylov trick that never materializes
    * the d×d second-moment matrix (at 100 TB the data never reshuffles:
    * one scalar s per vector map-side, then a (pos, scalar) groupBy).
    * v₀ = 1/√d uniform. Cross-engine exactness: s is a sequential HOF fold
    * (≡ DuckDB list_sum order), per-dim means round to 6dp, the norm is
    * computed from EXACT DECIMAL squares of those rounded means (sum order
    * free), and v₁ = m/‖m‖ divides identical doubles. Iterating = repeating
    * this plan with v₁ as literals.
    */
  def embPcaPower(spark: SparkSession, sfDir: String): DataFrame = {
    val d = 64
    val v0 = 1.0 / math.sqrt(d.toDouble)
    val m = embDouble(Tables.embeddings(spark, sfDir))
      .withColumn("s",
        aggregate(col("e"), lit(0.0), (acc, x) => acc + x) * lit(v0))
      .select(posexplode(col("e")).as(Seq("pos", "v")), col("s"))
      .groupBy("pos")
      .agg(round(avg(col("v") * col("s")), 6).as("m"))
    val norm = m
      .agg(sum(col("m").cast("decimal(18,6)") * col("m").cast("decimal(18,6)"))
        .as("ss"))
      .select(round(sqrt(col("ss").cast("double")), 6).as("norm"))
    m.crossJoin(broadcast(norm))
      .select(col("pos"), col("m"), col("norm"),
        round(col("m") / col("norm"), 6).as("component"))
      .orderBy("pos")
  }

  /** Label-separation report — the pairwise cosine matrix of label
    * centroids, the diagnostic run before trusting labels for
    * stratification or a classifier head (well-separated centroids ⇒ the
    * embedding space respects the labeling; near-1 off-diagonal cosines ⇒
    * labels are entangled). Exactness chain: per-dim centroid sums are
    * DECIMAL (order-free), the mean is one double division rounded to
    * 6dp, each cross/self product of those PINNED doubles is rounded onto
    * a 12dp grid and decimal-summed across dims, and the final cosine is
    * one double expression on exact operands. Scale: everything after the
    * per-(label, dim) rollup is labels²×dims — index-card sized at any
    * corpus size.
    */
  def embSeparation(spark: SparkSession, sfDir: String): DataFrame = {
    val cent = embDouble(Tables.embeddings(spark, sfDir))
      .select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(sum(col("v").cast("decimal(24,10)")).cast("double")
        / count(lit(1)), 6).as("c"))
    val norms = cent
      .groupBy("label")
      .agg(sum(round(col("c") * col("c"), 12).cast("decimal(24,12)")).as("nn"))
    val cross = cent.as("a")
      .join(cent.as("b"),
        col("a.pos") === col("b.pos") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum(round(col("a.c") * col("b.c"), 12).cast("decimal(24,12)")).as("dot"))
    cross
      .join(norms.select(col("label").as("label_a"), col("nn").as("na")), "label_a")
      .join(norms.select(col("label").as("label_b"), col("nn").as("nb")), "label_b")
      .select(col("label_a"), col("label_b"),
        round(col("dot").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6)
          .as("cos_centroid"))
      .orderBy("label_a", "label_b")
  }

  /** Mutual-kNN graph over the embedding corpus — top-3 cosine neighbors
    * per vector within its label block, with the mutuality flag (a ranks b
    * AND b ranks a): the structure input for density clustering, diversity
    * sampling, and graph-based label propagation; mutual edges are the
    * high-precision subset. Blocking by label is the IVF discipline again —
    * neighbor search runs inside a cell, never corpus×corpus (at 100 TB the
    * label is the trained coarse-quantizer assignment, and per-cell
    * populations are the skew knob exactly as in simAnnIvf). Ranking is on
    * the 6dp-rounded cosine with the neighbor id as tiebreak, so both
    * engines order identically; the mutual flag is a self-join of the kNN
    * edge list on the reversed pair — edge-list-sized, not corpus-sized.
    */
  def embKnnGraph(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
      .withColumn("nrm", normOf(col("e")))
      .select(col("vec_id"), col("label"), col("e"), col("nrm"))
      .repartition(col("label")) // one exchange feeds both join sides (ReuseExchange)
    val a = emb.select(col("vec_id").as("src"), col("label"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("dst"), col("label"),
      col("e").as("eb"), col("nrm").as("nb"))
    val byCos = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    val knn = a.join(b, Seq("label"))
      .filter(col("src") =!= col("dst"))
      .withColumn("cos",
        round(cosinePrenorm(col("ea"), col("eb"), col("na"), col("nb")), 6))
      .withColumn("rk", row_number().over(byCos))
      .filter(col("rk") <= 3)
      .select(col("src"), col("rk"), col("dst"), col("cos"))
      // pinned exchange over the scored edge list: the expensive cosine+rank
      // subtree runs ONCE (ReuseExchange) and only the 3N-row edge list is
      // re-shuffled onto each self-join key
      .repartition(col("src"), col("dst"))
    knn.join(
        knn.select(col("src").as("m_src"), col("dst").as("m_dst")),
        col("src") === col("m_dst") && col("dst") === col("m_src"), "left")
      .select(col("src"), col("rk"), col("dst"), col("cos"),
        col("m_src").isNotNull.as("mutual"))
      .orderBy("src", "rk")
  }

  /** Out-of-distribution / mislabel screen — vectors anomalously far from
    * their OWN label's centroid (squared L2 above the corpus-wide exact
    * p99): the embedding-quality audit run before trusting labels for
    * IVF training or classifier supervision. Shapes: the emb_centroid
    * scalar-explode pass (shuffle carries (label, dim, value) scalars,
    * never vectors), a broadcast of the labels×dims centroid table back
    * onto the exploded rows, per-dim squared residuals rounded onto the
    * 6dp decimal grid BEFORE the per-vector sum (reduction-order-free),
    * and a 1-row percentile broadcast for the threshold. Like
    * evt_rate_outliers, the cut is data-derived, so the flag set stays
    * meaningful at any corpus size.
    */
  def embOod(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = embDouble(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("label"), posexplode(col("e")).as(Seq("pos", "v")))
    val cent = ev.groupBy("label", "pos").agg(round(avg(col("v")), 6).as("c"))
    val d2 = ev.join(broadcast(cent), Seq("label", "pos"))
      .withColumn("t",
        round((col("v") - col("c")) * (col("v") - col("c")), 6).cast("decimal(18,6)"))
      .groupBy("vec_id", "label")
      .agg(sum(col("t")).as("d2"))
    val thr = d2.agg(expr("percentile(CAST(d2 AS DOUBLE), 0.99)").as("thr"))
    d2.crossJoin(broadcast(thr))
      .filter(col("d2").cast("double") > col("thr"))
      .select(col("vec_id"), col("label"),
        col("d2").cast("double").as("dist2"),
        round(col("thr"), 4).as("threshold"))
      .orderBy("vec_id")
  }

  protected def embQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "emb_ood" -> (embOod _),
    "emb_knn_graph" -> (embKnnGraph _),
    "emb_separation"  -> (embSeparation _),
    "emb_pca_power"   -> (embPcaPower _),
    "emb_var_dims"    -> (embVarDims _),
    "emb_threshold_sweep" -> (embThresholdSweep _),
    "sim_ann_recall"  -> (simAnnRecall _),
    "sim_eval_rank"   -> (simEvalRank _),
    "emb_stats"       -> (embStats _),
    "emb_centroid"    -> (embCentroid _),
    "emb_kmeans"      -> (embKmeans _),
    "emb_silhouette"  -> (embSilhouette _),
    "emb_kmeans_elbow" -> (embKmeansElbow _),
    "emb_quantize"    -> (embQuantize _),

  )

  protected def embOracles: Map[String, String] = Map(

    "emb_ood" ->
      """WITH ev AS (
        |  SELECT vec_id, label,
        |    unnest(range(1, 65)) AS pos,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        |  FROM embeddings
        |), cent AS (
        |  SELECT label, pos, ROUND(AVG(v), 6) AS c FROM ev GROUP BY label, pos
        |), d2 AS (
        |  SELECT vec_id, ev.label,
        |    SUM(CAST(ROUND((v - c) * (v - c), 6) AS DECIMAL(18,6))) AS d2
        |  FROM ev JOIN cent ON ev.label = cent.label AND ev.pos = cent.pos
        |  GROUP BY vec_id, ev.label
        |), thr AS (
        |  SELECT quantile_cont(CAST(d2 AS DOUBLE), 0.99) AS thr FROM d2
        |)
        |SELECT vec_id, label, CAST(d2 AS DOUBLE) AS dist2,
        |  ROUND(thr.thr, 4) AS threshold
        |FROM d2, thr WHERE CAST(d2 AS DOUBLE) > thr.thr
        |ORDER BY vec_id""".stripMargin,
    "emb_knn_graph" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), pairs AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    ROUND(${duckCos("a.v", "b.v")}, 6) AS cos
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
         |), ranked AS (
         |  SELECT src, dst, cos,
         |    CAST(row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS INTEGER) AS rk
         |  FROM pairs
         |), knn AS (
         |  SELECT src, rk, dst, cos FROM ranked WHERE rk <= 3
         |)
         |SELECT k.src, k.rk, k.dst, k.cos, (m.src IS NOT NULL) AS mutual
         |FROM knn k LEFT JOIN knn m ON k.src = m.dst AND k.dst = m.src
         |ORDER BY k.src, k.rk""".stripMargin,
    "emb_separation" ->
      """WITH cent AS (
        |  SELECT label, pos,
        |    ROUND(CAST(SUM(CAST(v AS DECIMAL(24,10))) AS DOUBLE) / COUNT(*), 6) AS c
        |  FROM (
        |    SELECT label,
        |      unnest(range(0, len(embedding))) AS pos,
        |      unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        |    FROM embeddings
        |  ) GROUP BY label, pos
        |), norms AS (
        |  SELECT label, SUM(CAST(ROUND(c * c, 12) AS DECIMAL(24,12))) AS nn
        |  FROM cent GROUP BY label
        |), cross_dot AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |    SUM(CAST(ROUND(a.c * b.c, 12) AS DECIMAL(24,12))) AS dot
        |  FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
        |  GROUP BY label_a, label_b
        |)
        |SELECT x.label_a, x.label_b,
        |  ROUND(CAST(x.dot AS DOUBLE)
        |        / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))), 6)
        |    AS cos_centroid
        |FROM cross_dot x
        |JOIN norms na ON x.label_a = na.label
        |JOIN norms nb ON x.label_b = nb.label
        |ORDER BY x.label_a, x.label_b""".stripMargin,
    "emb_quantize" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), m AS (
         |  SELECT vec_id, v,
         |    CAST(127 AS DOUBLE) / list_max(list_transform(v, x -> abs(x))) AS scale
         |  FROM e
         |), q AS (
         |  SELECT vec_id, scale,
         |    list_transform(v, x -> CAST(floor(x * scale) AS BIGINT)) AS qv
         |  FROM m
         |)
         |SELECT vec_id,
         |  CAST(floor(scale * 1000000) AS BIGINT) AS scale_micro,
         |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
         |  list_aggregate(qv, 'min') AS q_min,
         |  list_aggregate(qv, 'max') AS q_max
         |FROM q ORDER BY vec_id""".stripMargin,
    "emb_pca_power" ->
      """WITH e AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), x AS (
        |  SELECT unnest(range(0, len(v))) AS pos, unnest(v) AS val,
        |    list_sum(v) * 0.125 AS s
        |  FROM e
        |), m AS (
        |  SELECT CAST(pos AS INTEGER) AS pos, ROUND(AVG(val * s), 6) AS m
        |  FROM x GROUP BY pos
        |), n AS (
        |  SELECT ROUND(sqrt(CAST(SUM(CAST(m AS DECIMAL(19,6)) * CAST(m AS DECIMAL(19,6)))
        |    AS DOUBLE)), 6) AS norm
        |  FROM m
        |)
        |SELECT pos, m, norm, ROUND(m / norm, 6) AS component
        |FROM m CROSS JOIN n
        |ORDER BY pos""".stripMargin,
    "emb_var_dims" ->
      """WITH x AS (
        |  SELECT unnest(range(0, len(embedding))) AS pos,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        |  FROM embeddings
        |), s AS (
        |  SELECT CAST(pos AS INTEGER) AS pos, COUNT(*) AS n,
        |    ROUND(AVG(v), 6) AS mean, ROUND(AVG(v * v), 6) AS m2
        |  FROM x GROUP BY pos
        |), r AS (
        |  SELECT pos, n, mean, ROUND(m2 - mean * mean, 6) AS variance
        |  FROM s
        |)
        |SELECT CAST(row_number() OVER (ORDER BY variance DESC, pos) AS INTEGER) AS rank,
        |  pos, n, mean, variance
        |FROM r
        |ORDER BY variance DESC, pos
        |LIMIT 8""".stripMargin,
    "emb_centroid" ->
      """SELECT label, CAST(pos AS INTEGER) AS pos, COUNT(*) AS n,
        |  ROUND(AVG(v), 6) AS c
        |FROM (
        |  SELECT label,
        |    unnest(range(0, len(embedding))) AS pos,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        |  FROM embeddings
        |)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    // emb_kmeans_elbow: only MAX cosine per (point, k) matters, so the
    // sweep is one grouped max per k over the first-k seed join; the 6dp
    // grid + micro conversion is the silhouette contract.
    "emb_kmeans_elbow" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), ks AS (SELECT unnest([2, 4, 8]) AS k
         |), best AS (
         |  SELECT ks.k, e.vec_id, MAX(${duckCos("e.v", "c.v")}) AS best
         |  FROM e CROSS JOIN ks JOIN e c ON c.vec_id < ks.k
         |  GROUP BY ks.k, e.vec_id
         |), per AS (
         |  SELECT k, CAST(CAST(ROUND(1 - best, 6) AS DECIMAL(9,6))
         |    * 1000000 AS BIGINT) AS a
         |  FROM best
         |)
         |SELECT CAST(k AS INTEGER) AS k, COUNT(*) AS n_vecs,
         |  CAST(SUM(a) AS BIGINT) AS inertia_micro,
         |  CAST(SUM(a) // COUNT(*) AS BIGINT) AS mean_micro
         |FROM per GROUP BY k ORDER BY k""".stripMargin,
    // emb_silhouette: same assignment algebra as emb_kmeans round 1, then
    // the micro-grid silhouette. MAX(CASE WHEN crn=…) pivots the 2 ranked
    // rows per vector; both distances pass through the 6dp decimal grid
    // before the single integral division (positive operands: // == div).
    "emb_silhouette" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), cents AS (
         |  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < $NCentroids
         |), r AS (
         |  SELECT e.vec_id, cents.cent_id, ${duckCos("e.v", "cents.cv")} AS ccos,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${duckCos("e.v", "cents.cv")} DESC, cents.cent_id) AS crn
         |  FROM e CROSS JOIN cents
         |), ab AS (
         |  SELECT vec_id,
         |    MAX(CASE WHEN crn = 1 THEN cent_id END) AS cluster,
         |    CAST(CAST(ROUND(1 - MAX(CASE WHEN crn = 1 THEN ccos END), 6)
         |      AS DECIMAL(9,6)) * 1000000 AS BIGINT) AS a_micro,
         |    CAST(CAST(ROUND(1 - MAX(CASE WHEN crn = 2 THEN ccos END), 6)
         |      AS DECIMAL(9,6)) * 1000000 AS BIGINT) AS b_micro
         |  FROM r WHERE crn <= 2 GROUP BY vec_id
         |), sil AS (
         |  SELECT vec_id, cluster,
         |    CASE WHEN b_micro = 0 THEN 0
         |         ELSE (b_micro - a_micro) * 1000000 // b_micro END AS sil
         |  FROM ab
         |)
         |SELECT cluster, COUNT(*) AS n_vecs,
         |  CAST(SUM(sil) // COUNT(*) AS BIGINT) AS mean_sil_ppm,
         |  CAST(MIN(sil) AS BIGINT) AS min_sil_ppm,
         |  CAST(MAX(sil) AS BIGINT) AS max_sil_ppm
         |FROM sil GROUP BY cluster ORDER BY cluster""".stripMargin,
    "emb_kmeans" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), cents AS (
         |  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < $NCentroids
         |), a1 AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT e.vec_id, e.v, cents.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckCos("e.v", "cents.cv")} DESC, cents.cent_id) AS crn
         |    FROM e CROSS JOIN cents)
         |  WHERE crn = 1
         |), m AS (
         |  SELECT cluster, unnest(range(0, len(v))) AS pos, unnest(v) AS val FROM a1
         |), means AS (
         |  SELECT cluster, pos, ROUND(AVG(val), 6) AS c FROM m GROUP BY cluster, pos
         |), newc AS (
         |  SELECT cluster AS cent_id, list(c ORDER BY pos) AS cv FROM means GROUP BY cluster
         |), a2 AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, newc.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckCos("e.v", "newc.cv")} DESC, newc.cent_id) AS crn
         |    FROM e CROSS JOIN newc)
         |  WHERE crn = 1
         |), n1 AS (SELECT cluster, COUNT(*) AS n_r1 FROM a1 GROUP BY cluster
         |), n2 AS (SELECT cluster, COUNT(*) AS n_r2 FROM a2 GROUP BY cluster
         |), cn AS (
         |  SELECT cent_id AS cluster,
         |    ROUND(sqrt(list_sum(list_transform(cv, x -> x * x))), 6) AS cent_norm
         |  FROM newc
         |)
         |SELECT n1.cluster, n1.n_r1,
         |  CAST(COALESCE(n2.n_r2, 0) AS BIGINT) AS n_r2, cn.cent_norm
         |FROM n1 LEFT JOIN n2 ON n1.cluster = n2.cluster
         |JOIN cn ON n1.cluster = cn.cluster
         |ORDER BY n1.cluster""".stripMargin,
    "emb_stats" ->
      s"""WITH e AS (
         |  SELECT label,
         |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         |  FROM embeddings
         |)
         |SELECT label, COUNT(*) AS n,
         |  ROUND(AVG(nrm), 6) AS avg_norm,
         |  ROUND(MIN(nrm), 6) AS min_norm,
         |  ROUND(MAX(nrm), 6) AS max_norm
         |FROM e GROUP BY label ORDER BY label""".stripMargin,
    "emb_threshold_sweep" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings WHERE vec_id < 2000
         |), p AS (
         |  SELECT ROUND(${duckCos("a.v", "b.v")}, 6) AS cos
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id
         |)
         |SELECT COUNT(*) AS n_pairs,
         |  CAST(SUM(CASE WHEN cos >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_030,
         |  CAST(SUM(CASE WHEN cos >= 0.45 THEN 1 ELSE 0 END) AS BIGINT) AS n_045,
         |  CAST(SUM(CASE WHEN cos >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_060,
         |  CAST(SUM(CASE WHEN cos >= 0.75 THEN 1 ELSE 0 END) AS BIGINT) AS n_075,
         |  CAST(SUM(CASE WHEN cos >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_090
         |FROM p""".stripMargin,
    "sim_ann_recall" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), exact3 AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(${duckCos("q.v", "c.v")}, 6) DESC, c.vec_id) AS rn
         |    FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id)
         |  WHERE rn <= 3
         |), cents AS (
         |  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < $NCentroids
         |), assigned AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT e.vec_id, e.v, cents.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckCos("e.v", "cents.cv")} DESC, cents.cent_id) AS crn
         |    FROM e CROSS JOIN cents)
         |  WHERE crn = 1
         |), ivf3 AS (
         |  SELECT q_id, cand_id, 1 AS hit FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(${duckCos("q.v", "c.v")}, 6) DESC, c.vec_id) AS rn
         |    FROM assigned q JOIN assigned c
         |      ON q.cluster = c.cluster AND q.vec_id < $NQueries AND q.vec_id <> c.vec_id)
         |  WHERE rn <= 3
         |)
         |SELECT exact3.q_id, COUNT(ivf3.hit) AS n_hits,
         |  ROUND(COUNT(ivf3.hit) / 3.0, 4) AS recall
         |FROM exact3 LEFT JOIN ivf3
         |  ON exact3.q_id = ivf3.q_id AND exact3.cand_id = ivf3.cand_id
         |GROUP BY exact3.q_id
         |ORDER BY exact3.q_id""".stripMargin,
    "sim_eval_rank" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), truth AS (
         |  SELECT q_id, cand_id, CAST(4 - rn AS BIGINT) AS rel FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(${duckCos("q.v", "c.v")}, 6) DESC, c.vec_id) AS rn
         |    FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id)
         |  WHERE rn <= 3
         |), cents AS (
         |  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < $NCentroids
         |), assigned AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT e.vec_id, e.v, cents.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckCos("e.v", "cents.cv")} DESC, cents.cent_id) AS crn
         |    FROM e CROSS JOIN cents)
         |  WHERE crn = 1
         |), ivf AS (
         |  SELECT q_id, cand_id, pos FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(${duckCos("q.v", "c.v")}, 6) DESC, c.vec_id) AS pos
         |    FROM assigned q JOIN assigned c
         |      ON q.cluster = c.cluster AND q.vec_id < $NQueries AND q.vec_id <> c.vec_id)
         |  WHERE pos <= 3
         |), j AS (
         |  SELECT ivf.q_id, ivf.pos, COALESCE(truth.rel, 0) AS rel
         |  FROM ivf LEFT JOIN truth
         |    ON ivf.q_id = truth.q_id AND ivf.cand_id = truth.cand_id
         |), perq AS (
         |  SELECT q_id,
         |    MIN(CASE WHEN rel > 0 THEN pos END) AS frp,
         |    CAST(SUM(rel * 1000000 // (pos + 1)) AS BIGINT) AS dcg_ppm,
         |    CAST(COUNT(CASE WHEN rel > 0 THEN 1 END) AS BIGINT) AS hits
         |  FROM j GROUP BY q_id
         |), ideal AS (
         |  SELECT q_id, CAST(SUM(rel * 1000000 // (ipos + 1)) AS BIGINT) AS idcg_ppm
         |  FROM (SELECT q_id, rel,
         |          row_number() OVER (PARTITION BY q_id
         |            ORDER BY rel DESC, cand_id) AS ipos
         |        FROM truth)
         |  GROUP BY q_id
         |)
         |SELECT i.q_id,
         |  CAST(COALESCE(p.frp, 0) AS BIGINT) AS first_rel_pos,
         |  CAST(CASE WHEN p.frp IS NULL THEN 0
         |            ELSE 1000000 // p.frp END AS BIGINT) AS mrr_ppm,
         |  CAST(COALESCE(p.hits, 0) AS BIGINT) AS hits,
         |  CAST(COALESCE(p.dcg_ppm, 0) AS BIGINT) AS dcg_ppm,
         |  i.idcg_ppm,
         |  CAST(COALESCE(p.dcg_ppm, 0) * 1000000 // i.idcg_ppm AS BIGINT) AS ndcg_ppm
         |FROM ideal i LEFT JOIN perq p ON i.q_id = p.q_id
         |ORDER BY i.q_id""".stripMargin,

  )

}
