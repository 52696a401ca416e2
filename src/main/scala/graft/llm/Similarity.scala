package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY §2.10 U3 +
  * north-star EXT tier): brute-force cosine top-k as the exactness
  * baseline, IVF-style clustered search as the scale path.
  *
  * Vector math is pure higher-order functions (`zip_with` products +
  * `aggregate` fold) over `array<double>` — no UDF, stays in Tungsten.
  * Embeddings are cast float→double before any arithmetic so the fold is
  * double-precision throughout (matches the oracle's math).
  *
  * Scale: brute force is O(Q×N) with the query side broadcast — exact, and
  * the right answer when Q is small. The IVF variant assigns every vector to
  * its nearest centroid (one broadcast join, k centroids) and probes only the
  * query's cluster — O(Q×N/k) with nprobe=1, trading recall for throughput
  * exactly like a real IVF index; centroids here are seed vectors standing in
  * for a k-means pass.
  */
object Similarity extends QueryModule {

  /** dot(a, b) as a higher-order fold — the builtin-only formulation, kept
    * public as the reference implementation the native expression is
    * A/B-tested against (same sequential accumulation order → bit-identical
    * results).
    */
  def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def hofCosine(a: Column, b: Column): Column =
    hofDot(a, b) / (sqrt(hofDot(a, a)) * sqrt(hofDot(b, b)))

  /** Production path: the fused single-traversal native expression
    * (graft.functions.VectorExpressions) — no per-row intermediate array,
    * one loop for dot + both norms, inside whole-stage codegen.
    */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine_sim(a, b)

  /** Pairwise-op variant with precomputed norms: ‖v‖ is computed once per
    * VECTOR (N values) instead of inside every PAIR loop (N² values) —
    * cos = dot(a,b)/(na·nb). Bit-identical to the fused form: the separate
    * sum-of-squares accumulates in the same element order, and
    * sqrt(na²)·sqrt(nb²) is the same op sequence.
    */
  private def normOf(e: Column): Column =
    sqrt(graft.functions.VectorExpressions.dot_product(e, e))

  private def cosinePrenorm(a: Column, b: Column, na: Column, nb: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b) / (na * nb)

  private def embDouble(df: DataFrame): DataFrame =
    df.withColumn("e", transform(col("embedding"), x => x.cast("double")))

  val NQueries = 10
  val NCentroids = 8

  /** U3a: exact brute-force cosine top-5 for the first 10 query vectors. */
  def simCosineTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
      .withColumn("nrm", normOf(col("e")))
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val c = emb.select(col("vec_id").as("cand_id"), col("e").as("ce"), col("nrm").as("cn"))
    val byCos = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("cand_id"))
    c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("cos",
        round(cosinePrenorm(col("qe"), col("ce"), col("qn"), col("cn")), 6))
      .withColumn("rn", row_number().over(byCos))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("rn"), col("cand_id"), col("cos"))
      .orderBy("q_id", "rn")
  }

  /** Hard-negative mining — the batch that contrastive embedding training
    * (triplet / InfoNCE) feeds on: for each query, the top-3 most-similar
    * candidates with a DIFFERENT label (similar-but-wrong is what teaches
    * the margin; random negatives are trivially easy), each row carrying
    * the query's best same-label positive and the pos−neg margin the loss
    * would see. Same broadcast-query topology as sim_cosine_topk — the
    * label filter rides the scored pass, nothing new shuffles — and at
    * 100 TB the candidate side would first shrink through the ANN index
    * (sim_ann_ivf) exactly like any other top-k. Margin is a subtraction
    * of two 6dp decimals — exact, no float fuzz in the report.
    */
  def simHardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
      .withColumn("nrm", normOf(col("e")))
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("e").as("qe"), col("nrm").as("qn"))
    val c = emb.select(col("vec_id").as("cand_id"), col("label").as("c_label"),
      col("e").as("ce"), col("nrm").as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("cos",
        round(cosinePrenorm(col("qe"), col("ce"), col("qn"), col("cn")), 6))
    val byCos = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    val negs = scored.filter(col("c_label") =!= col("q_label"))
      .withColumn("rn", row_number().over(byCos))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("q_label"), col("rn"), col("cand_id"),
        col("c_label").as("neg_label"), col("cos").as("neg_cos"))
    // renamed key (pq): negs and pos share the scored lineage (see
    // simAnnPq's LUT note on dataset-id-disambiguated self-joins)
    val pos = scored.filter(col("c_label") === col("q_label"))
      .withColumn("prn", row_number().over(byCos))
      .filter(col("prn") === 1)
      .select(col("q_id").as("pq"), col("cos").as("pos_cos"))
    negs.join(pos, col("q_id") === col("pq"))
      .select(col("q_id"), col("q_label"), col("rn"), col("cand_id"),
        col("neg_label"), col("neg_cos"), col("pos_cos"),
        (col("pos_cos").cast("decimal(9,6)")
          - col("neg_cos").cast("decimal(9,6)")).as("margin"))
      .orderBy("q_id", "rn")
  }

  /** Matryoshka truncation dims, frozen for the oracle. */
  private val MrlDims = Seq(8, 16, 32)

  /** Matryoshka truncation fidelity (Kusupati et al., "Matryoshka
    * Representation Learning", 2205.13147, public literature) — the
    * storage/recall dial modern embedding stacks expose: search on the
    * FIRST m dims of each vector and report how much of the full-width
    * top-3 survives (overlap@3) and whether rank-1 is preserved, per
    * query per m ∈ {8, 16, 32} of 64. The decision table for "how many
    * dims do we actually ship to the index".
    *
    * Scale shape: the same one broadcast-query scored pass as
    * sim_cosine_topk, evaluated once per truncation width (slice is a
    * per-row projection — no extra shuffle); overlap is a 3-rows-per-
    * group join against the full-width top-3. Ranking on the rounded
    * cosine with cand_id tiebreak (the house top-k contract).
    */
  def simMatryoshka(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val c = emb.select(col("vec_id").as("cand_id"), col("e").as("ce"))
    val scored = c.crossJoin(broadcast(q)).filter(col("q_id") =!= col("cand_id"))
    val byCos = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    def top3(m: Int): DataFrame =
      scored
        .withColumn("cos", round(
          if (m == 64) cosine(col("qe"), col("ce"))
          else cosine(expr(s"slice(qe, 1, $m)"), expr(s"slice(ce, 1, $m)")), 6))
        .withColumn("rn", row_number().over(byCos))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("cand_id"), col("rn"))
    // renamed keys (fq/fcand): all frames share the scored lineage (see
    // simAnnPq's LUT note)
    val full = top3(64)
      .select(col("q_id").as("fq"), col("cand_id").as("fcand"), col("rn").as("frn"))
    val trunc = MrlDims.map(m => top3(m).withColumn("dims", lit(m)))
      .reduce(_ unionByName _)
    val overlap = trunc
      .join(full.filter(col("frn") <= 3),
        col("q_id") === col("fq") && col("cand_id") === col("fcand"), "left")
      .groupBy("q_id", "dims")
      .agg(sum(when(col("fcand").isNotNull, 1L).otherwise(0L)).as("overlap3"),
        max(when(col("rn") === 1, col("cand_id"))).as("r1cand"))
    overlap
      .join(full.filter(col("frn") === 1), col("q_id") === col("fq"))
      .select(col("q_id"), col("dims"), col("overlap3"),
        (col("r1cand") === col("fcand")).as("rank1_match"))
      .orderBy("q_id", "dims")
  }

  /** U3b: IVF-style search — assign all vectors to the nearest of
    * NCentroids seed centroids, then search only the query's own cluster.
    */
  def simAnnIvf(spark: SparkSession, sfDir: String): DataFrame =
    ivfProbe(ivfAssignedOf(embDouble(Tables.embeddings(spark, sfDir))))

  /** The IVF assignment pass: nearest centroid per vector — broadcast
    * the k centroids, argmax cosine (ties broken by centroid id via the
    * orderBy). This (vec_id, e, cluster) frame IS the IVF index a
    * deployment materializes; [[simAnnIvf]] recomputes it in-query,
    * [[simAnnIvfIndexed]] reads it from the standing parquet.
    */
  private def ivfAssignedOf(emb: DataFrame): DataFrame =
    ivfAssignTo(ivfCentroidsOf(emb), emb)

  /** The frozen codebook: the NCentroids seed vectors (registered model
    * metadata — at deployment these come from a training run, here the
    * first k vec_ids stand in).
    */
  private def ivfCentroidsOf(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < NCentroids)
      .select(col("vec_id").as("cent_id"), col("e").as("cente"))

  /** Assign `vecs` to their nearest codebook centroid. Per-vector
    * independent given the frozen codebook — which is exactly why IVF
    * ingestion is O(batch·k): [[simAnnIvfAppend]] runs this on an
    * arriving slice alone and the result is bit-identical to a full
    * rebuild's rows for those ids.
    *
    * Argmax via a map-side-combinable `max(struct(ccos, −cent_id, e))`
    * aggregate, NOT a per-vec_id window: struct ordering compares ccos
    * first (max = highest cosine) then −cent_id (max = LOWEST centroid
    * id — the same tie-break as the window form's `ccos DESC, cent_id`),
    * and e rides along so the winner's vector survives without a
    * join-back. MEASURED on the fixed min-of-2 harness (`ScaleProbe
    * ivf`, 10⁶ synthetic vectors): 1.8 vs 5.7 s at k = 8 and 17.1 vs
    * 27.2 s at k = 256 against the window form — no per-vector sort, no
    * window exchange, and the partial aggregation combines map-side.
    * Every IVF oracle replays its own row_number() argmax, so the hash
    * gate pins the two forms equivalent.
    */
  private def ivfAssignTo(cents: DataFrame, vecs: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("e"), col("cente")))
      .groupBy("vec_id")
      .agg(max(struct(col("ccos"), (-col("cent_id")).as("negc"),
        col("e"))).as("best"))
      .select(col("vec_id"), col("best.e").as("e"),
        (-col("best.negc")).as("cluster"))

  /** The probe half shared by the in-query and indexed IVF forms:
    * queries search only their own cluster's posting list.
    */
  private def ivfProbe(assigned: DataFrame): DataFrame = {
    val q = assigned.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("cluster"))
    val c = assigned
      .select(col("vec_id").as("cand_id"), col("e").as("ce"), col("cluster"))
    val byCos = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(q), Seq("cluster"))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("cos", round(cosine(col("qe"), col("ce")), 6))
      .withColumn("rn", row_number().over(byCos))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("cluster"), col("rn"), col("cand_id"), col("cos"))
      .orderBy("q_id", "rn")
  }

  /** (JVM, corpus-fingerprint) → materialized IVF index parquet — the
    * posting-list artifact an ANN deployment keeps in the curated zone
    * (the `Dedup.materializedBandIndex` discipline: fingerprint-keyed
    * memo, SHA-256 path, atomic rename-into-place).
    */
  private val ivfIndexMemo = scala.collection.mutable.Map[String, String]()

  private def materializedIvfIndex(spark: SparkSession, sfDir: String): String =
    ivfIndexMemo.synchronized {
      val key = s"$sfDir@${Bpe.corpusFingerprint(spark, sfDir, "embeddings.parquet")}"
      ivfIndexMemo.getOrElseUpdate(key, {
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
        graft.Fs.writeParquetAtomic(
          ivfAssignedOf(embDouble(Tables.embeddings(spark, sfDir))),
          java.nio.file.Paths.get(
            sys.props("java.io.tmpdir"), "graft_sim", digest, "ivf_index"))
      })
    }

  /** The PRODUCTION IVF path, priced honestly: read the standing IVF
    * index (per-vector cluster assignments + vectors) from its
    * materialized parquet and run only the probe — the
    * `dedup_incremental_indexed` discipline applied to ANN search.
    * [[simAnnIvf]] keeps recomputing the assignment in-query, so its
    * hash pins indexed ≡ recomputed end-to-end; this entry SHARES that
    * exact oracle (the oracle never sees the parquet round-trip) while
    * its bench number prices what a query actually pays against a
    * standing index: one index scan + the cluster-bucketed top-3.
    * First invocation per JVM pays the index build into the memo;
    * Bench's min-of-two records the warm indexed cost.
    */
  def simAnnIvfIndexed(spark: SparkSession, sfDir: String): DataFrame =
    ivfProbe(spark.read.parquet(materializedIvfIndex(spark, sfDir)))

  /** IVF index APPEND — the ingestion half of the standing-ANN-index
    * story (`dedup_incremental_indexed`'s discipline on vectors): an
    * arriving batch (vec_id ≡ 9 mod 10 stands in for today's vectors;
    * NCentroids = 8 < 9 keeps every codebook seed in history) is
    * assigned against the FROZEN codebook — O(batch·k), no re-clustering,
    * no touch of the existing posting lists — and the probe runs over
    * history ∪ appended. Because assignment is per-vector independent
    * given the codebook, append ≡ full rebuild row-for-row, so this
    * SHARES `sim_ann_ivf`'s oracle verbatim: one hash pins that
    * incremental ingestion loses nothing vs rebuilding the index. At
    * 100 TB this is why the ANN index ingests a daily batch in minutes
    * (batch×k broadcast product) while a rebuild is corpus×k.
    */
  def simAnnIvfAppend(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val cents = ivfCentroidsOf(emb)
    val isNew = col("vec_id") % 10 === 9
    ivfProbe(ivfAssignTo(cents, emb.filter(!isNew))
      .unionAll(ivfAssignTo(cents, emb.filter(isNew))))
  }

  /** The TRUE daily-ingest pricing — [[simAnnIvfAppend]] with the
    * history side read from the STANDING materialized index instead of
    * re-assigned in-query: one pruned parquet scan of
    * [[materializedIvfIndex]] (filtered to history ids — the predicate
    * pushes to the scan) ∪ the frozen-codebook assign of ONLY the
    * arriving batch (vec_id ≡ 9 mod 10), then the probe. This is what a
    * deployment actually pays per ingestion wave: O(batch·k) assignment
    * plus an index scan, never a corpus×k recompute. Because assignment
    * is per-vector independent given the codebook, index-scan ∪
    * batch-assign ≡ full rebuild row-for-row, so this SHARES
    * `sim_ann_ivf`'s oracle verbatim — one hash pins that reading
    * history from the standing artifact loses nothing vs recomputing
    * it. Bench: first invocation per JVM pays the memo build; the
    * min-of-two records the warm standing-index cost (the number to
    * compare against `sim_ann_ivf_append`'s in-query history assign).
    */
  def simAnnIvfIndexedAppend(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val isNew = col("vec_id") % 10 === 9
    val history = spark.read.parquet(materializedIvfIndex(spark, sfDir))
      .filter(!isNew)
    ivfProbe(history.unionByName(
      ivfAssignTo(ivfCentroidsOf(emb), emb.filter(isNew))))
  }

  /** The TRAINED-codebook IVF — [[simAnnIvf]] with the codebook the
    * seed centroids only BOOTSTRAP: one Lloyd refinement (assign → 6dp
    * per-dimension means, `emb_kmeans`'s training step verbatim) and
    * the probe runs over the REFINED assignment. This is what an IVF
    * index actually deploys — seeds are an initialization, the shipped
    * codebook is trained — and it completes the composition story:
    * `emb_kmeans` proves the trainer, this query ships its output. Own
    * oracle (refined clusters differ from seed clusters): DuckDB
    * re-trains the codebook and re-probes, so one hash pins
    * training ∘ assignment ∘ search end-to-end. Scale shape: the
    * refinement is one scalar (cluster, pos, val) shuffle (the
    * `emb_centroid` topology) between two broadcast-k assignment
    * passes; more Lloyd rounds = a driver loop of the same plan.
    */
  def simAnnIvfKmeans(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    ivfProbe(ivfAssignTo(
      lloydRefine(ivfAssignTo(ivfCentroidsOf(emb), emb)), emb))
  }

  /** One Lloyd refinement: assigned vectors → 6dp per-dimension cluster
    * means as the new codebook (rounding pins cross-engine float-mean
    * merge order — the `emb_kmeans` contract). Scalar (cluster, pos, val)
    * shuffle, reduce side = clusters × dims rows at any corpus size.
    */
  private def lloydRefine(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos").agg(round(avg("v"), 6).as("c"))
      .groupBy("cluster")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cente"))
      .select(col("cluster").as("cent_id"), col("cente"))

  /** The IVF nprobe OPERATING TABLE — the recall/cost knob every IVF
    * deployment tunes (FAISS's `nprobe`): for nprobe ∈ {1, 2, 4},
    * queries search their nprobe NEAREST clusters' posting lists
    * instead of only their own, and the row reports candidate volume,
    * exact-top-3 hits, and recall in ppm against the brute-force truth
    * — `sim_ann_probe_sweep`'s discipline applied to the IVF family
    * (there the knob is Hamming radius; here it's probed cells). The
    * candidate generation stays an equi-join on the cluster id; the
    * nprobe fan-out multiplies only the NQueries probe rows, never the
    * corpus. Zero-truth recall guarded on both engines (the
    * dedup_lsh_sweep divergence class).
    */
  def simAnnIvfSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val cents = ivfCentroidsOf(emb)
    val assigned = ivfAssignTo(cents, emb)
    val q = assigned.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val byCent = Window.partitionBy("q_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    val rankedCents = q.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("qe"), col("cente")))
      .withColumn("prn", row_number().over(byCent))
      .select("q_id", "qe", "cent_id", "prn")
    val posting = assigned
      .select(col("vec_id").as("cand_id"), col("e").as("ce"),
        col("cluster").as("cent_id"))
    val exact3 = simCosineTopk(spark, sfDir).filter(col("rn") <= 3)
      .select(col("q_id"), col("cand_id"), lit(1).as("hit"))
    val nExact = exact3.agg(count(lit(1)).as("n_exact"))
    val rows = Seq(1, 2, 4).map { p =>
      val cands = rankedCents.filter(col("prn") <= p)
        .join(posting, Seq("cent_id"))
        .filter(col("q_id") =!= col("cand_id"))
      val byCos = Window.partitionBy("q_id")
        .orderBy(col("cos").desc, col("cand_id"))
      val top3 = cands
        .withColumn("cos", round(cosine(col("qe"), col("ce")), 6))
        .withColumn("rn", row_number().over(byCos))
        .filter(col("rn") <= 3)
      val hits = top3.join(exact3, Seq("q_id", "cand_id"), "left")
        .agg(count(col("hit")).as("n_hits"))
      cands.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(hits).crossJoin(broadcast(nExact))
        .select(lit(p).as("nprobe"), col("n_candidates"), col("n_hits"),
          expr("CASE WHEN n_exact = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE n_hits * 1000000 div n_exact END").as("recall_ppm"))
    }
    rows.reduce(_.unionAll(_)).orderBy("nprobe")
  }

  /** The ANN index ON THE STREAM — [[simAnnIvfAppend]]'s ingestion shape
    * deployed as the production loop (the `Refinery.refineryIndexedStream`
    * discipline applied to vectors): each arriving micro-batch of
    * embeddings is assigned against the FROZEN codebook (a registry
    * artifact, like the classifier weights) and appended to the standing
    * index zone as `assigned/batch=<id>` — O(batch·k) per batch,
    * overwrite-idempotent per batch id so a re-drain over the same
    * checkpoint is a no-op. Because assignment is per-vector independent
    * given the codebook, the drained zone is row-identical to a full
    * rebuild — `StreamingAnnIndexSpec` pins probe-over-streamed-index ≡
    * `sim_ann_ivf` and re-drain idempotence.
    */
  def annIndexStream(
      spark: SparkSession,
      sfDir: String,
      landingDir: String,
      indexDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val cents = ivfCentroidsOf(embDouble(Tables.embeddings(spark, sfDir)))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ivfAssignTo(cents, embDouble(batch.select("vec_id", "embedding")))
          .write.mode("overwrite").parquet(s"$indexDir/assigned/batch=$batchId")
        ()
      }
      .start()
    graft.streaming.JobRegistry.register(q)
    q
  }

  /** Query side of [[annIndexStream]]'s standing index: read the
    * accumulated assignments and run the cluster-bucketed probe — what a
    * search deployment pays per query wave against a streamed-in index.
    */
  def annProbeFromIndex(spark: SparkSession, indexDir: String): DataFrame =
    ivfProbe(spark.read.parquet(s"$indexDir/assigned")
      .select("vec_id", "e", "cluster"))

  /** SemDeDup ON THE STREAM — [[annIndexStream]]'s standing assignment
    * zone wired into a per-batch semantic-dedup verdict (the
    * `Refinery.refineryIndexedStream` discipline applied to embeddings):
    * each arriving micro-batch of vectors is (a) assigned to its frozen
    * k-means cell and appended to `assigned/batch=<id>`, and (b) scored
    * against its cell's HISTORY (index batches strictly before this one)
    * and against itself — every within-cell pair at cosine ≥ τ (on the
    * same rounded 6dp grid as [[dedupSemantic]]) lands in
    * `pairs/batch=<id>` as (lo, hi) by vec_id. Loser DROPPING is
    * deliberately NOT per-batch: SemDeDup's loser rule ("some smaller-id
    * vector in my cell at cosine ≥ τ") is arrival-order-independent only
    * over the ACCUMULATED pair set — a small-id vector arriving late
    * must still defeat an earlier large-id one — so, like cluster
    * closure in the text refinery, the verdict runs at publication
    * ([[Refinery.manifestFromCuratedSemantic]]): losers = distinct hi.
    * Because the τ-pair predicate is symmetric and every pair's later
    * endpoint sees the earlier one (in the index, or beside it in its
    * own batch), the accumulated pairs cover exactly the batch
    * within-cell τ-pairs, making the published manifest IDENTICAL to the
    * batch `refinery_semantic` (`StreamingSemanticSpec` pins it).
    * Exactly-once: both zones overwrite their own `batch=<id>`; the pair
    * step filters history to `batch < batchId`, so a failure-retry never
    * joins against its own half-written assignments. Per-batch cost:
    * O(batch·k) assignment + a cell-bucketed equi-join of the batch
    * against its probed cells — never an O(corpus²) or O(corpus·k)
    * recompute.
    */
  def semDedupIndexStream(
      spark: SparkSession,
      sfDir: String,
      landingDir: String,
      indexDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val cents = ivfCentroidsOf(embDouble(Tables.embeddings(spark, sfDir)))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val assigned =
          ivfAssignTo(cents, embDouble(batch.select("vec_id", "embedding")))
        assigned.write.mode("overwrite")
          .parquet(s"$indexDir/assigned/batch=$batchId")
        val nw = assigned.select(
          col("vec_id").as("vn"), col("e").as("en"), col("cluster"))
        val hist = spark.read.parquet(s"$indexDir/assigned")
          .filter(col("batch") < batchId)
          .select(col("vec_id").as("vh"), col("e").as("eh"),
            col("cluster").as("cluster_h"))
        val crossPairs = nw.join(hist,
            col("cluster") === col("cluster_h") &&
              round(cosine(col("en"), col("eh")), 6) >= SemDedupTau)
          .select(least(col("vn"), col("vh")).as("lo"),
            greatest(col("vn"), col("vh")).as("hi"))
        val nw2 = assigned.select(col("cluster").as("cluster_b"),
          col("vec_id").as("vb"), col("e").as("eb"))
        val newPairs = nw.join(nw2,
            col("cluster") === col("cluster_b") && col("vn") < col("vb") &&
              round(cosine(col("en"), col("eb")), 6) >= SemDedupTau)
          .select(col("vn").as("lo"), col("vb").as("hi"))
        crossPairs.unionByName(newPairs)
          .write.mode("overwrite").parquet(s"$indexDir/pairs/batch=$batchId")
        ()
      }
      .start()
    graft.streaming.JobRegistry.register(q)
    q
  }

  /** IVF-PQ ingestion ON THE STREAM — the COMPRESSED index maintained
    * incrementally, the composition [[annIndexStream]] (coarse assign
    * per batch) × [[simAnnIvfPqTrained]] (codes, not vectors): the
    * trained coarse and PQ codebooks are REGISTRY artifacts (a
    * deployment trains them offline and freezes them — here both train
    * from the reference corpus once, outside the loop), and each
    * arriving micro-batch is coarse-assigned and PQ-encoded against
    * them, appending (cluster, cand_id, s, cid) rows — SCALARS ONLY, 8
    * codes + a cell id per vector, never the fp64 vector — to
    * `codes/batch=<id>`. On disk this is the deployable property made
    * literal: the standing zone grows 8 code bytes per vector while the
    * vectors themselves stay in the landing archive. Per-batch cost:
    * O(batch·k) assign + O(batch·M·K) encode. Because both passes are
    * per-vector independent given the frozen codebooks, the drained
    * zone is row-identical to the batch build's posting lists, so the
    * probe over it ([[ivfPqProbeFromIndex]], which shares the REAL
    * probe tail via [[ivfPqProbeOver]]) equals `sim_ann_ivfpq_trained`
    * row-for-row — `StreamingIvfPqSpec` pins it, plus the 8-rows-per-
    * vector zone invariant and re-drain idempotence.
    */
  def ivfPqIndexStream(
      spark: SparkSession,
      sfDir: String,
      landingDir: String,
      indexDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    // TRAIN ONCE, literally: persist + count materializes both codebooks
    // before the first batch — an unpersisted lazy frame here would
    // re-run the corpus-scale Lloyd and PQ training inside EVERY
    // micro-batch's action, turning the claimed O(batch·k + batch·M·K)
    // per-batch cost into O(corpus·k + corpus·M·K) per batch
    // (review-caught). The tiny materialized frames (k centroids,
    // M×K codes) then broadcast into each batch like any registry
    // artifact.
    val coarse = lloydRefine(ivfAssignTo(ivfCentroidsOf(emb), emb)).persist()
    coarse.count()
    val pqCb = pqCentsTrained(pqSubs(spark, sfDir)).persist()
    pqCb.count()
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val be = embDouble(batch.select("vec_id", "embedding"))
        ivfAssignTo(coarse, be)
          .select(col("vec_id").as("cand_id"), col("cluster"))
          .join(pqCodesAgainst(pqSubsOf(be), pqCb)
            .select(col("vec_id").as("cand_id"), col("s"), col("cid")),
            Seq("cand_id"))
          .write.mode("overwrite").parquet(s"$indexDir/codes/batch=$batchId")
        ()
      }
      .start()
    graft.streaming.JobRegistry.register(q)
    q
  }

  /** Query side of [[ivfPqIndexStream]]'s standing codes zone: rebuild
    * the frozen registry artifacts (codebooks, LUTs, probe set) and run
    * the SHARED probe tail over the accumulated codes — what a search
    * deployment pays per query wave against a streamed-in compressed
    * index. */
  def ivfPqProbeFromIndex(spark: SparkSession, sfDir: String, indexDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val coarse = lloydRefine(ivfAssignTo(ivfCentroidsOf(emb), emb))
    val subs = pqSubs(spark, sfDir)
    ivfPqProbeOver(emb, subs, coarse, pqCentsTrained(subs),
      spark.read.parquet(s"$indexDir/codes")
        .select("cluster", "cand_id", "s", "cid"))
  }

  /** U3c: random-hyperplane LSH search — 8 frozen hyperplanes give an 8-bit
    * sign-pattern bucket per vector (similar vectors land in the same
    * bucket with probability (1 − θ/π)⁸); queries probe only their own
    * bucket. Versus IVF: no centroid pass, bucket count is 2⁸ regardless of
    * data, and the bucket id is a pure per-row expression — the cheapest
    * possible ANN index to maintain incrementally at 100 TB.
    */
  def simAnnRpLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{Hashing, VectorExpressions}
    val planes = Hashing.RpPlanes
    val bucket = planes.zipWithIndex.map { case (p, j) =>
      when(VectorExpressions.dot_product(col("e"), typedlit(p)) > 0.0, lit(1 << j))
        .otherwise(lit(0))
    }.reduce(_ + _)

    val emb = embDouble(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("e"), bucket.as("bucket"))
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("bucket"))
    val c = emb.select(col("vec_id").as("cand_id"), col("e").as("ce"), col("bucket"))
    val byCos = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("cos", round(cosine(col("qe"), col("ce")), 6))
      .withColumn("rn", row_number().over(byCos))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("bucket"), col("rn"), col("cand_id"), col("cos"))
      .orderBy("q_id", "rn")
  }

  /** U3d: multi-probe RP-LSH — each query probes its own bucket PLUS the 8
    * single-bit-flip neighbor buckets (the nearest buckets in Hamming
    * space, hence the likeliest to hold near neighbors that fell across a
    * hyperplane). This is how production LSH recovers recall without
    * adding tables: probe cost grows 9×, index stays identical, and the
    * neighbor-bucket list is a pure per-row expression (no second pass
    * over the data). Candidates are deduped before the exact re-rank.
    */
  def simAnnMultiprobe(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{Hashing, VectorExpressions}
    val planes = Hashing.RpPlanes
    val bucket = planes.zipWithIndex.map { case (p, j) =>
      when(VectorExpressions.dot_product(col("e"), typedlit(p)) > 0.0, lit(1 << j))
        .otherwise(lit(0))
    }.reduce(_ + _)

    val emb = embDouble(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("e"), bucket.as("bucket"))
    val probes = array(col("bucket") +:
      planes.indices.map(j => col("bucket").bitwiseXOR(lit(1 << j))): _*)
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        explode(probes).as("bucket"))
    val c = emb.select(col("vec_id").as("cand_id"), col("e").as("ce"), col("bucket"))
    val byCos = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("cand_id"))
      .select("q_id", "qe", "cand_id", "ce").distinct()
      .withColumn("cos", round(cosine(col("qe"), col("ce")), 6))
      .withColumn("rn", row_number().over(byCos))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("rn"), col("cand_id"), col("cos"))
      .orderBy("q_id", "rn")
  }

  /** Probe-DEPTH tuning sweep — the table an ANN deployment reads before
    * picking its multiprobe radius: recall@3 (vs the exact brute-force
    * top-3) and candidate volume at Hamming probe radius 0 (own bucket
    * only), 1 (+8 one-flip buckets), and 2 (+28 two-flip buckets), in
    * ONE candidate pass. Every candidate's radius is a per-row
    * expression (`bit_count(q_bucket ^ cand_bucket)` — each vector
    * lives in exactly one bucket, so the radius-r candidate set is just
    * a filter), and the three rankings reuse the one scored frame. The
    * denominators come from the already-oracled exact tier, so recall
    * is integer-exact. Scale: candidate generation is the same bucket
    * equi-join as [[dedupEmbeddingLsh]]; the sweep's windows partition
    * on the bounded query set.
    */
  def simAnnProbeSweep(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{Hashing, VectorExpressions}
    val planes = Hashing.RpPlanes
    val bucket = planes.zipWithIndex.map { case (p, j) =>
      when(VectorExpressions.dot_product(col("e"), typedlit(p)) > 0.0, lit(1 << j))
        .otherwise(lit(0))
    }.reduce(_ + _)
    val emb = embDouble(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("e"), bucket.as("bucket"))
    val flips1 = planes.indices.map(j => col("bucket").bitwiseXOR(lit(1 << j)))
    val flips2 = for {
      i <- planes.indices; j <- planes.indices if i < j
    } yield col("bucket").bitwiseXOR(lit((1 << i) | (1 << j)))
    val probes = array(col("bucket") +: (flips1 ++ flips2): _*)
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("bucket").as("qb"), explode(probes).as("bucket"))
    // the 37 probe values are pairwise distinct and a candidate lives in
    // ONE bucket, so each (q, cand) pair matches at most one probe — no
    // dedup stage needed
    val scored = emb
      .select(col("vec_id").as("cand_id"), col("e").as("ce"), col("bucket"))
      .join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("cos", round(cosine(col("qe"), col("ce")), 6))
      .withColumn("ham", expr("bit_count(qb ^ bucket)"))
      .select("q_id", "cand_id", "cos", "ham")
    val exact3 = simCosineTopk(spark, sfDir).filter(col("rn") <= 3)
      .select(col("q_id"), col("cand_id"), lit(1).as("hit"))
    val nExact = exact3.agg(count(lit(1)).as("n_exact"))
    val rows = Seq(0 -> 1, 1 -> 9, 2 -> 37).map { case (r, nb) =>
      val sub = scored.filter(col("ham") <= r)
      val byCos = Window.partitionBy("q_id")
        .orderBy(col("cos").desc, col("cand_id"))
      val top3 = sub.withColumn("rn", row_number().over(byCos))
        .filter(col("rn") <= 3)
      val hits = top3.join(exact3, Seq("q_id", "cand_id"), "left")
        .agg(count(col("hit")).as("n_hits"))
      sub.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(hits).crossJoin(broadcast(nExact))
        .select(lit(r).as("radius"), lit(nb).as("n_probe_buckets"),
          col("n_candidates"), col("n_hits"),
          // zero-truth guard (mirrored in the oracle): an empty exact
          // top-3 would NULL here but ERROR in DuckDB — divergent AND
          // silent, the dedup_lsh_sweep class
          expr("CASE WHEN n_exact = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE n_hits * 1000000 div n_exact END").as("recall_ppm"))
    }
    rows.reduce(_.unionAll(_)).orderBy("radius")
  }

  /** Embedding-cosine near-duplicate pairs (the dedup family's vector
    * member): all pairs with cosine ≥ 0.45. This is the exact verification
    * stage run brute-force — correct at test scale and the ground truth the
    * approximate paths are judged against; at 100 TB the candidate set
    * comes from the RP-LSH buckets above (or banded multi-table LSH) and
    * only candidates reach this exact check, exactly like the
    * minhash→jaccard pipeline.
    */
  def dedupEmbedding(spark: SparkSession, sfDir: String): DataFrame =
    dedupEmbeddingOver(embDouble(Tables.embeddings(spark, sfDir)))

  /** [[dedupEmbedding]]'s calibration tier as a PROBE sample: the
    * deterministic [[Dedup.CalibSamplePct]]% hash sample of vec_ids are
    * the probes, and each probe's exact ≥0.45 neighbors are found
    * against the FULL corpus — one row per (probe, neighbor), the
    * probe-centric view recall calibration actually consumes. Sampling
    * PROBES (not both endpoints) is the load-bearing design choice:
    * both-endpoint sampling thins the true-pair population by
    * (pct∕100)² — on a sparse-dup corpus it goes empty and the
    * "ground truth" calibrates nothing (observed: this corpus's 14
    * true pairs all lose ≥1 endpoint at 40%) — while probe sampling
    * keeps every sampled probe's denominator exact. Cost drops to
    * (pct∕100)·N² from N²; both engines filter on the identical hash
    * predicate before any vector math.
    */
  def dedupEmbeddingSampled(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
      .withColumn("nrm", normOf(col("e")))
    val probes = emb
      .filter(pmod(graft.functions.Hashing.hash60(col("vec_id").cast("string")),
        lit(100)) < Dedup.CalibSamplePct)
      .select(col("vec_id").as("probe_id"), col("e").as("ea"), col("nrm").as("na"))
    val cands = emb
      .select(col("vec_id").as("nbr_id"), col("e").as("eb"), col("nrm").as("nb"))
    probes.join(cands, col("probe_id") =!= col("nbr_id"))
      .withColumn("cos",
        round(cosinePrenorm(col("ea"), col("eb"), col("na"), col("nb")), 6))
      .filter(col("cos") >= 0.45)
      .select("probe_id", "nbr_id", "cos")
      .orderBy("probe_id", "nbr_id")
  }

  private def dedupEmbeddingOver(embeddings: DataFrame): DataFrame = {
    val emb = embeddings.withColumn("nrm", normOf(col("e")))
    val a = emb.select(col("vec_id").as("vec_a"), col("e").as("ea"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("vec_b"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos",
        round(cosinePrenorm(col("ea"), col("eb"), col("na"), col("nb")), 6))
      .filter(col("cos") >= 0.45)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  /** The SCALE path for `dedup_embedding`: identical threshold-pair
    * semantics, but candidates come from RP-LSH buckets with Hamming≤2
    * multiprobe (own bucket + 8 one-flip + 28 two-flip neighbors) instead
    * of the corpus×corpus comparison — candidate generation is an
    * equi-join on the bucket id, and only candidates pay the exact
    * cosine. Found pairs are a SUBSET of the exact form's (same verify
    * threshold), so |lsh| ∕ |exact| IS the recall — measured against
    * `dedupEmbedding` in `EmbeddingDedupLshSpec` and pinned. Honest
    * geometry note: at this corpus's only populated band (cos ≈ 0.45,
    * θ ≈ 63°) per-plane agreement is 1 − θ/π ≈ 0.65, so 8-plane
    * Hamming≤2 recall is only ≈ p⁸+8p⁷q+28p⁶q² ≈ 0.43 — LSH is the
    * wrong tool for LOW-similarity thresholds. At a production near-dup
    * threshold (cos ≥ 0.9, p ≈ 0.86) the same index recalls ≈ 0.9; the
    * synthetic corpus simply has no such pairs, so the query keeps the
    * low threshold to stay non-empty and the spec pins the measured
    * recall at it. Shape discipline: candidate dedup runs on bare id
    * pairs (vectors re-attached after), so the distinct never shuffles
    * 64-dim payloads.
    */
  def dedupEmbeddingLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{Hashing, VectorExpressions}
    val planes = Hashing.RpPlanes
    val bucket = planes.zipWithIndex.map { case (p, j) =>
      when(VectorExpressions.dot_product(col("e"), typedlit(p)) > 0.0, lit(1 << j))
        .otherwise(lit(0))
    }.reduce(_ + _)
    val emb = embDouble(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("e"), bucket.as("bucket"))
    val flips = planes.indices.map(j => col("bucket").bitwiseXOR(lit(1 << j))) ++
      (for { i <- planes.indices; j <- planes.indices if i < j }
        yield col("bucket").bitwiseXOR(lit((1 << i) | (1 << j))))
    val probes = array(col("bucket") +: flips: _*)
    val aIds = emb.select(col("vec_id").as("vec_a"), explode(probes).as("pb"))
    val bIds = emb.select(col("vec_id").as("vec_b"), col("bucket").as("pb"))
    val cand = aIds.join(bIds, Seq("pb"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    val va = emb.select(col("vec_id").as("vec_a"), col("e").as("ea"))
    val vb = emb.select(col("vec_id").as("vec_b"), col("e").as("eb"))
    cand.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
      .withColumn("cos", round(cosine(col("ea"), col("eb")), 6))
      .filter(col("cos") >= 0.45)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al., "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication",
    * arXiv:2303.09540): cluster the embedding space, then compare pairs
    * ONLY within a cluster — the observation that semantic duplicates land
    * in the same k-means cell is what turns corpus×corpus cosine into
    * k × (cell × cell), the same cell-bounded discipline as `simAnnIvf`.
    *
    * Output is a per-vector keep/drop verdict: a vector DROPS iff some
    * SMALLER-id vector in its cluster has cosine ≥ τ with it
    * (`matched_to` = the smallest such id; NULL ⇒ kept). The keep-rule is
    * a deterministic policy knob: the paper keeps the member farthest
    * from the centroid, and a transitive-exact variant would run the
    * within-cluster pair graph through `ConnectedComponents` (that
    * pattern is `dedup_clusters`); min-id is engine-independent and makes
    * the whole verdict ORACLE-EXACT. τ = 0.45 targets the corpus's one
    * populated similarity band (see `dedupEmbeddingLsh`'s geometry note).
    *
    * At 100 TB: assignment is a broadcast-k map pass; the pair join
    * shuffles each cell once (cells are the unit of parallelism, sized by
    * k — more centroids ⇒ smaller cells ⇒ cheaper pairs at some recall
    * cost across cell boundaries, the standard SemDeDup tradeoff); the
    * verdict join shuffles ids + booleans, never vectors.
    */
  /** [[dedupSemantic]]'s loser set as PREFIXED CTEs (`sem_*`) so it
    * composes into the refinery oracle without colliding (the
    * `Curation.duckDecontCtes` discipline); exposes `sem_losers(doc_id)`
    * — the vec_ids the min-id SemDeDup verdict drops, id-joined to their
    * owning documents.
    */
  private[llm] def duckSemLoserCtes: String =
    s"""sem_e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), sem_cents AS (
       |  SELECT vec_id AS cent_id, v AS cv FROM sem_e WHERE vec_id < $NCentroids
       |), sem_assigned AS (
       |  SELECT vec_id, v, cluster FROM (
       |    SELECT sem_e.vec_id, sem_e.v, sem_cents.cent_id AS cluster,
       |      row_number() OVER (PARTITION BY sem_e.vec_id
       |        ORDER BY ${duckCos("sem_e.v", "sem_cents.cv")} DESC, sem_cents.cent_id) AS crn
       |    FROM sem_e CROSS JOIN sem_cents)
       |  WHERE crn = 1
       |), sem_losers AS (
       |  SELECT DISTINCT b.vec_id AS doc_id
       |  FROM sem_assigned a JOIN sem_assigned b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |   AND ROUND(${duckCos("a.v", "b.v")}, 6) >= $SemDedupTau
       |)""".stripMargin

  def dedupSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val cents = emb.filter(col("vec_id") < NCentroids)
      .select(col("vec_id").as("cent_id"), col("e").as("cente"))
    val byCent = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    // pinned exchange on cluster: the assignment pass (broadcast-k argmax)
    // feeds both pair-join sides and the verdict join once (ReuseExchange)
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("e"), col("cente")))
      .withColumn("crn", row_number().over(byCent))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("e"), col("cent_id").as("cluster"))
      .repartition(col("cluster"))
    val lo = assigned.select(
      col("cluster"), col("vec_id").as("va"), col("e").as("ea"))
    val hi = assigned.select(
      col("cluster").as("cluster_h"), col("vec_id").as("vb"), col("e").as("eb"))
    // within-cell pairs, cosine at the SAME rounded grid as the oracle;
    // per higher id keep only its smallest τ-neighbor
    val rep = lo.join(hi,
        col("cluster") === col("cluster_h") && col("va") < col("vb") &&
          round(cosine(col("ea"), col("eb")), 6) >= SemDedupTau)
      .groupBy(col("vb").as("vec_id"))
      .agg(min(col("va")).as("matched_to"))
    assigned.select(col("vec_id"), col("cluster"))
      .join(rep, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster"), col("matched_to"),
        col("matched_to").isNull.as("keep"))
      .orderBy("vec_id")
  }

  private val SemDedupTau = 0.45

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

  /** Int8-quantized brute-force retrieval + its fidelity report in one
    * query — the memory-bound ANN configuration (int8 SDC scan: 4× less
    * bandwidth than fp32, SIMD-friendly integer dots). Both sides use
    * `emb_quantize`'s symmetric per-vector codes, so the score is an exact
    * BIGINT dot product (|q|≤127, d=64 ⇒ |dot| ≤ 127²·64 ≈ 10⁶ — integer
    * arithmetic, zero float drift, zero rounding in the ORDER BY). The
    * `in_exact3` flag joins each int8 hit against the fp32 exact top-3, so
    * the output is simultaneously the retrieval AND the quantization-loss
    * measurement a production index ships with. Scale shape: identical to
    * `sim_cosine_topk` (broadcast fixed query set × candidate scan, per-key
    * WindowGroupLimit) with a 4×-smaller scan payload.
    */
  def simAnnInt8(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
      .withColumn("scale", lit(127.0) / array_max(transform(col("e"), x => abs(x))))
      .withColumn("q8", transform(col("e"), x => floor(x * col("scale")).cast("long")))
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("q8").as("qv"))
    val c = emb.select(col("vec_id").as("cand_id"), col("q8").as("cv"))
    val idot = aggregate(
      zip_with(col("qv"), col("cv"), (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val byDot = Window.partitionBy("q_id").orderBy(col("idot").desc, col("cand_id"))
    val int8Top3 = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("idot", idot)
      .withColumn("rn", row_number().over(byDot))
      .filter(col("rn") <= 3)
    val exact3 = simCosineTopk(spark, sfDir)
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("cand_id"), lit(1).as("hit"))
    int8Top3.join(exact3, Seq("q_id", "cand_id"), "left")
      .select(col("q_id"), col("rn"), col("cand_id"), col("idot"),
        col("hit").isNotNull.as("in_exact3"))
      .orderBy("q_id", "rn")
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

  /** Product quantization (PQ) encode + fidelity report — the other half of
    * the vector-compression toolbox next to emb_quantize's int8: 64 dims
    * split into 8 subvectors of 8, each assigned to its nearest of 16
    * codebook centroids by L2, so a vector compresses to 8 half-byte-scale
    * codes (64× smaller than fp64) and distance evaluation becomes 8 table
    * lookups (the IVF-PQ memory layout every billion-vector index uses).
    * Codebooks here are the first-16 seed subvectors — the same stand-in
    * for a trained k-means as simAnnIvf's centroids; emb_kmeans is the
    * training loop that would refine them. Shape: one posexplode to
    * (vector, subspace) rows, a broadcast of the 128-row codebook, argmin
    * via struct-min (d2, then centroid id — both engines break ties the
    * same way), and one groupBy back to a row per vector. Per-subspace
    * residuals round onto the 6dp decimal grid BEFORE the per-vector sum,
    * so the reported reconstruction error is reduction-order-independent.
    */
  private val PqM = 8 // subspaces
  private val PqD = 8 // dims per subspace
  private val PqK = 16 // centroids per codebook

  /** (vec_id, s, sub): every vector split into its PqM subvectors. */
  private def pqSubs(spark: SparkSession, sfDir: String): DataFrame =
    pqSubsOf(embDouble(Tables.embeddings(spark, sfDir)))

  /** The subvector split over an arbitrary (vec_id, e) frame — the
    * static corpus ([[pqSubs]]) and arriving stream batches
    * ([[ivfPqIndexStream]]) share this one pass. */
  private def pqSubsOf(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${PqM - 1}), s -> slice(e, s*$PqD+1, $PqD))")))
      .select(col("vec_id"), col("pos").as("s"), col("col").as("sub"))

  /** Per-subspace codebooks: the first-PqK seed subvectors (stand-in for a
    * trained k-means — emb_kmeans is the loop that would refine them). */
  private def pqCents(subs: DataFrame): DataFrame =
    subs.filter(col("vec_id") < PqK)
      .select(col("s"), col("vec_id").as("cent_id"), col("sub").as("csub"))

  /** Subvector L2² as a sequential fold — same accumulation order as the
    * oracle's list_sum, so the doubles are bit-identical. */
  private val pqSubD2 = expr(
    "aggregate(zip_with(sub, csub, (x, y) -> (x-y)*(x-y)), 0D, (acc, x) -> acc + x)")

  /** PQ assignment in long form: (vec_id, s, cid, d2r) — nearest centroid
    * per (vector, subspace) via struct-min (d2 first, centroid id as the
    * cross-engine tiebreak), residual rounded onto the 6dp decimal grid. */
  private def pqCodes(subs: DataFrame): DataFrame =
    pqCodesAgainst(subs, pqCents(subs))

  /** The encode against an ARBITRARY per-subspace codebook (cols: s,
    * cent_id, csub) — seed codebooks ([[pqCodes]]) and Lloyd-trained
    * ones ([[pqCentsTrained]]) share this one pass. */
  private def pqCodesAgainst(subs: DataFrame, cents: DataFrame): DataFrame =
    subs.join(broadcast(cents), Seq("s"))
      .withColumn("d2", pqSubD2)
      .groupBy("vec_id", "s")
      .agg(min(struct(col("d2"), col("cent_id"))).as("b"))
      .select(col("vec_id"), col("s"), col("b.cent_id").as("cid"),
        round(col("b.d2"), 6).cast("decimal(18,6)").as("d2r"))

  /** One Lloyd refinement of the per-subspace PQ codebooks — the
    * [[lloydRefine]] discipline applied inside each subspace: assign
    * subvectors to the seed codebooks, recompute each (subspace, code)
    * cell's centroid as 6dp-rounded per-dimension means (rounding pins
    * cross-engine float-mean merge order), drop empty cells (Lloyd's
    * rule; both engines drop identically via group-by). Scalar
    * (s, cid, pos, v) shuffle — reduce side is M×K×D rows at any corpus
    * size; more rounds = a driver loop of the same plan. */
  private def pqCentsTrained(subs: DataFrame): DataFrame =
    pqCentsTrainedFrom(subs, pqCents(subs))

  /** The per-subspace Lloyd round against an ARBITRARY seed codebook —
    * the default PqK = 16 path ([[pqCentsTrained]]) and the
    * codebook-size sweep ([[simAnnIvfPqKsweep]]'s K ∈ {4, 8, 16}
    * branches) share it. */
  private def pqCentsTrainedFrom(subs: DataFrame, seeds: DataFrame): DataFrame = {
    val seedCodes = pqCodesAgainst(subs, seeds)
      .select(col("vec_id"), col("s"), col("cid"))
    subs.join(seedCodes, Seq("vec_id", "s"))
      .select(col("s"), col("cid"), posexplode(col("sub")).as(Seq("pos", "v")))
      .groupBy("s", "cid", "pos").agg(round(avg("v"), 6).as("c"))
      .groupBy("s", "cid")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)")
        .as("csub"))
      .select(col("s"), col("cid").as("cent_id"), col("csub"))
  }

  def embPq(spark: SparkSession, sfDir: String): DataFrame = {
    val best = pqCodes(pqSubs(spark, sfDir))
    val codeCols = (0 until PqM).map(s => max(when(col("s") === s, col("cid"))).as(s"c$s"))
    best.groupBy("vec_id")
      .agg(codeCols.head, (codeCols.tail :+ sum(col("d2r")).cast("double").as("recon_err")): _*)
      .orderBy("vec_id")
  }

  /** Index-artifact FOOTPRINT report — the vector-compression storage
    * claim as a NUMBER instead of a narration: per storage tier, the
    * logical bits/vector, total bits at this corpus size, and the ratio
    * vs the raw fp64 zone. Tiers: `fp64` (d × 64-bit lanes — the raw
    * vector zone the re-rank stage fetches from), `int8_sym`
    * (`emb_quantize`'s symmetric codes: d × 8 bits + one fp64 scale),
    * `ivfpq_codes` (the standing zone `ivfPqIndexStream` materializes:
    * M codes × log₂K bits + the log₂k-bit coarse cell — 35 bits vs
    * 4 096, a 117× compression, which is WHY the posting lists fit an
    * executor cache at 100 TB; SCALING.md §8). Honest accounting:
    * `rows_stored` is COUNTED off the actual encode (the PQ tier's row
    * count comes from replaying the encode, n × M — not from n × a
    * constant), so the oracle re-derives the footprint from the same
    * deterministic chain, and `IndexFootprintSpec` proves the ordering
    * holds PHYSICALLY (on-disk parquet bytes of the three zones, per
    * streamed generation, off the artifact listing). */
  def simIndexFootprint(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val counts = emb.agg(count(lit(1)).as("n_vectors"))
      .crossJoin(pqCodes(pqSubs(spark, sfDir)).agg(count(lit(1)).as("code_rows")))
    val fp64Bits = 64L * 64L
    val int8Bits = 64L * 8L + 64L
    val pqBits = PqM.toLong * 4L + 3L // log2(PqK)=4 bits/code, log2(NCentroids)=3
    def tier(name: String, bits: Long, rows: Column) =
      counts.select(lit(name).as("tier"), col("n_vectors"),
        rows.as("rows_stored"), lit(bits).as("bits_per_vec"),
        (col("n_vectors") * bits).as("total_bits"),
        lit(bits * 1000000L / fp64Bits).as("ratio_ppm"))
    tier("fp64", fp64Bits, col("n_vectors"))
      .unionAll(tier("int8_sym", int8Bits, col("n_vectors")))
      .unionAll(tier("ivfpq_codes", pqBits, col("code_rows")))
      .orderBy(col("bits_per_vec").desc)
  }

  /** PQ asymmetric-distance search (ADC) — the query path of an IVF-PQ
    * index: the query stays full-precision, each of its PqM×PqK subspace-
    * to-centroid distances is precomputed ONCE into a lookup table, and a
    * candidate's distance is 8 table lookups summed — never a 64-dim loop
    * per pair. Here the LUT is a broadcast 128-row-per-query frame joined
    * on (subspace, code); per-cell distances round onto the 6dp decimal
    * grid before the per-candidate sum, so ADC scores are exact decimals —
    * rank order is engine- and reduction-order-independent. `in_exact3`
    * compares against the true fp64 L2 top-3 (the fidelity report that
    * says what the compression costs in recall, like sim_ann_int8's flag).
    * At 100 TB: codes are 8 bytes/vector (vs 512 for fp64), the LUT build
    * is O(queries), and the scan is memory-bandwidth-bound over codes —
    * which is the entire point of PQ.
    */
  def simAnnPq(spark: SparkSession, sfDir: String): DataFrame = {
    val subs = pqSubs(spark, sfDir)
    val codes = pqCodes(subs)
      .select(col("vec_id").as("cand_id"), col("s"), col("cid"))
    // The LUT's join columns are renamed (lut_s/lut_cid) BEFORE the join:
    // both frames descend from the same `subs` lineage, and a dataset-id-
    // disambiguated `codes("s") === luts("s")` is the exact pattern Spark's
    // self-join analyzer warns can silently degenerate to "trivially true
    // 's == s'" after a refactor. Distinct attribute names make the
    // condition unambiguous by construction — no analyzer heuristics.
    val luts = subs.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("s"), col("sub"))
      .join(broadcast(pqCents(subs)), Seq("s"))
      .withColumn("pd2", round(pqSubD2, 6).cast("decimal(18,6)"))
      .select(col("q_id"), col("s").as("lut_s"), col("cent_id").as("lut_cid"), col("pd2"))
    val adc = codes
      .join(broadcast(luts), col("s") === col("lut_s") && col("cid") === col("lut_cid"))
      .groupBy(col("q_id"), col("cand_id"))
      .agg(sum(col("pd2")).as("adc"))
      .filter(col("q_id") =!= col("cand_id"))
    val byAdc = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    val ranked = adc.withColumn("rn", row_number().over(byAdc)).filter(col("rn") <= 3)
    // fp64 ground truth: exact L2 top-3 per query
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val c = emb.select(col("vec_id").as("cand_id"), col("e").as("ce"))
    val l2 = expr(
      "aggregate(zip_with(qe, ce, (x, y) -> (x-y)*(x-y)), 0D, (acc, x) -> acc + x)")
    val byL2 = Window.partitionBy("q_id").orderBy(col("d2").asc, col("cand_id"))
    val exact3 = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("d2", l2)
      .withColumn("xrn", row_number().over(byL2))
      .filter(col("xrn") <= 3)
      .select(col("q_id"), col("cand_id"), lit(true).as("hit"))
    ranked.join(exact3, Seq("q_id", "cand_id"), "left")
      .select(col("q_id"), col("rn"), col("cand_id"),
        col("adc").cast("double").as("adc"),
        coalesce(col("hit"), lit(false)).as("in_exact3"))
      .orderBy("q_id", "rn")
  }

  /** Cells an IVF-PQ query probes per query vector. */
  private val IvfPqNprobe = 2

  /** The fp64 L2 exact top-3 per query — the ONE fidelity truth every
    * compressed form's `in_exact3` flag and hit count compare against.
    * Shared so the instrument can never silently diverge between the
    * IVF-PQ variants. Columns: (q_id, cand_id, hit = true). */
  private def exact3Of(emb: DataFrame): DataFrame = {
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val c = emb.select(col("vec_id").as("cand_id"), col("e").as("ce"))
    val l2 = expr(
      "aggregate(zip_with(qe, ce, (x, y) -> (x-y)*(x-y)), 0D, (acc, x) -> acc + x)")
    val byL2 = Window.partitionBy("q_id").orderBy(col("d2").asc, col("cand_id"))
    c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("d2", l2)
      .withColumn("xrn", row_number().over(byL2))
      .filter(col("xrn") <= 3)
      .select(col("q_id"), col("cand_id"), lit(true).as("hit"))
  }

  /** Every query's coarse cells ranked by cosine — the ONE probe-set
    * builder the IVF-PQ variants share. Columns: (q_id, cluster, prn,
    * rq = the query's residual against that cell's centroid); callers
    * filter prn to their nprobe and prune the columns they don't use
    * (Catalyst drops the residual arithmetic when rq is unreferenced). */
  private def probedCellsOf(emb: DataFrame, coarse: DataFrame): DataFrame = {
    val byCent = Window.partitionBy("q_id")
      .orderBy(col("ccos").desc, col("cent_id"))
    emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
      .crossJoin(broadcast(coarse))
      .withColumn("ccos", cosine(col("qe"), col("cente")))
      .withColumn("prn", row_number().over(byCent))
      .select(col("q_id"), col("cent_id").as("cluster"), col("prn"),
        expr("zip_with(qe, cente, (x, y) -> x - y)").as("rq"))
  }

  /** RESIDUAL IVF-PQ — the textbook composition ([[simAnnIvfPqTrained]]
    * taken to its deployable form): what PQ encodes is not the vector
    * but its RESIDUAL against the owning coarse centroid, r = v − c(v).
    * The theory: residuals within a TIGHT cell have far smaller spread
    * than raw vectors, so the same 16-code budget quantizes them more
    * faithfully. The MEASURED truth at sf0.01: 5/30 fp64-exact vs 7/30
    * for trained raw-vector codes — residual encoding does NOT pay on
    * this corpus, because its synthetic cells are nearly as wide as the
    * global spread (coarse centroids sit near the global mean, so
    * r ≈ v − const and the residual codebooks buy nothing). That honest
    * negative is the point of carrying the `in_exact3` instrument on
    * every compressed form: whether residual encoding pays is a
    * per-corpus geometry question, and THIS query is how a deployment
    * answers it before committing an index format. Mechanics worth the
    * price when it does pay: the LUT becomes PER PROBED CELL (the
    * query's residual differs per cell), NQueries × nprobe × M × K
    * rows — still a bounded broadcast (2 560 rows here) — the ADC join
    * keys on (query, CELL, subspace, code) so a candidate is priced
    * against the LUT of its own cell, and posting lists still hold 8
    * scalar codes per vector. Own oracle: train(coarse) ∘ residual ∘
    * train(residual PQ) ∘ encode ∘ per-cell LUT ∘ probe under one hash.
    */
  def simAnnIvfPqResidual(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val coarse = lloydRefine(ivfAssignTo(ivfCentroidsOf(emb), emb))
    // residuals against the owning trained centroid
    val resid = ivfAssignTo(coarse, emb)
      .join(broadcast(coarse.select(col("cent_id").as("cluster"), col("cente"))),
        Seq("cluster"))
      .select(col("vec_id"), col("cluster"),
        expr("zip_with(e, cente, (x, y) -> x - y)").as("e"))
    val rsubs = pqSubsOf(resid.select("vec_id", "e"))
    val rcb = pqCentsTrained(rsubs)
    val postings = resid.select(col("vec_id").as("cand_id"), col("cluster"))
      .join(pqCodesAgainst(rsubs, rcb)
        .select(col("vec_id").as("cand_id"), col("s"), col("cid")),
        Seq("cand_id"))
    // probed cells WITH the query's per-cell residual
    val probed = probedCellsOf(emb, coarse)
      .filter(col("prn") <= IvfPqNprobe)
      .select(col("q_id"), col("cluster"), col("rq"))
    // per-(query, cell) LUT over the residual codebooks — join columns
    // renamed before the join (the simAnnPq rule)
    val luts = probed
      .select(col("q_id"), col("cluster"), posexplode(expr(
        s"transform(sequence(0, ${PqM - 1}), s -> slice(rq, s*$PqD+1, $PqD))")))
      .select(col("q_id"), col("cluster"), col("pos").as("s"), col("col").as("sub"))
      .join(broadcast(rcb), Seq("s"))
      .withColumn("pd2", round(pqSubD2, 6).cast("decimal(18,6)"))
      .select(col("q_id").as("lut_q"), col("cluster").as("lut_cl"),
        col("s").as("lut_s"), col("cent_id").as("lut_cid"), col("pd2"))
    val adc = postings
      .join(broadcast(probed.select(col("q_id"), col("cluster"))), Seq("cluster"))
      .join(broadcast(luts),
        col("q_id") === col("lut_q") && col("cluster") === col("lut_cl") &&
          col("s") === col("lut_s") && col("cid") === col("lut_cid"))
      .filter(col("q_id") =!= col("cand_id"))
      .groupBy(col("q_id"), col("cand_id"))
      .agg(sum(col("pd2")).as("adc"))
    val byAdc = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    val ranked = adc.withColumn("rn", row_number().over(byAdc)).filter(col("rn") <= 3)
    ranked.join(exact3Of(emb), Seq("q_id", "cand_id"), "left")
      .select(col("q_id"), col("rn"), col("cand_id"),
        col("adc").cast("double").as("adc"),
        coalesce(col("hit"), lit(false)).as("in_exact3"))
      .orderBy("q_id", "rn")
  }

  /** The COMPOSED IVF-PQ pipeline — the index shape a 100 TB ANN
    * deployment actually stores, assembled from the two halves the
    * suite already proves separately: the Lloyd-TRAINED coarse codebook
    * (`sim_ann_ivf_kmeans`'s trainer) partitions the corpus into cells,
    * each cell's posting list holds PQ CODES ONLY (`emb_pq`'s encoder —
    * the fp64 vector column dies at the encode: 8 code bytes per vector
    * survive, not 512 fp64 bytes, which is why the posting lists fit an
    * executor cache at 100 TB; SCALING.md §8), and a query (1) ranks
    * the trained centroids and probes its [[IvfPqNprobe]] nearest
    * cells, (2) broadcasts its 8×16 subspace-distance LUT, (3) scores
    * candidates by asymmetric distance — 8 LUT lookups summed, never a
    * 64-dim loop per pair. Per-cell LUT distances round onto the 6dp
    * decimal grid before the sum (`sim_ann_pq`'s discipline), so ADC
    * scores are exact decimals and the rank order is engine- and
    * reduction-order-independent; `in_exact3` reports fidelity against
    * the fp64 L2 truth. The oracle replays train ∘ assign ∘ encode ∘
    * probe end-to-end under one hash. Scale shape: candidate generation
    * is the (cluster) equi-join against a broadcast NQueries×nprobe
    * probe set, the LUT join is a broadcast hash join on (q, s, code),
    * and nothing downstream of the encode carries a vector.
    */
  def simAnnIvfPq(spark: SparkSession, sfDir: String): DataFrame =
    ivfPqProbe(spark, sfDir, trainedPq = false)

  /** [[simAnnIvfPq]] with ONE Lloyd round on the PQ codebooks
    * ([[pqCentsTrained]]) — the query the sweep's operating lesson asks
    * for: `sim_ann_ivfpq_sweep` showed that at the SEED code budget,
    * quantization error (not probe depth) binds recall. Training the
    * codebooks attacks exactly that binding constraint; the fidelity
    * flag measures the gain at the same nprobe = 2 (MEASURED at sf0.01:
    * 7/30 of the trained ADC top-3 are fp64-exact vs 5/30 seeded — a
    * 40% relative fidelity gain from ONE Lloyd round at identical probe
    * cost; more rounds = a driver loop of the same plan, the
    * `emb_kmeans` escalation path). Both coarse and fine codebooks are
    * now trained — this is the full deployable IVF-PQ. Own oracle:
    * train(coarse) ∘ train(PQ, per subspace) ∘ assign ∘ encode ∘ probe
    * under one hash.
    */
  def simAnnIvfPqTrained(spark: SparkSession, sfDir: String): DataFrame =
    ivfPqProbe(spark, sfDir, trainedPq = true)

  private def ivfPqProbe(
      spark: SparkSession, sfDir: String, trainedPq: Boolean): DataFrame = {
    val (emb, subs, coarse, pqCb, postings) = ivfPqIndexOf(spark, sfDir, trainedPq)
    ivfPqProbeOver(emb, subs, coarse, pqCb, postings)
  }

  /** The assembled IVF-PQ index pieces — (emb, subs, coarse codebook, PQ
    * codebook, posting lists) — shared by the probe queries and the
    * re-rank family so every variant prices the SAME index build.
    * Posting lists are (cluster, cand_id, s, cid): codes only past the
    * encode, the fp64 vector column dies here. */
  private def ivfPqIndexOf(
      spark: SparkSession, sfDir: String, trainedPq: Boolean)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val coarse = lloydRefine(ivfAssignTo(ivfCentroidsOf(emb), emb))
    val subs = pqSubs(spark, sfDir)
    val pqCb = if (trainedPq) pqCentsTrained(subs) else pqCents(subs)
    val postings = ivfAssignTo(coarse, emb)
      .select(col("vec_id").as("cand_id"), col("cluster"))
      .join(pqCodesAgainst(subs, pqCb)
        .select(col("vec_id").as("cand_id"), col("s"), col("cid")),
        Seq("cand_id"))
    (emb, subs, coarse, pqCb, postings)
  }

  /** The IVF-PQ probe tail over an ARBITRARY posting-list frame
    * (cluster, cand_id, s, cid) — in-query builds ([[ivfPqProbe]]) and
    * the streamed standing codes zone ([[ivfPqProbeFromIndex]]) share
    * it, so the spec's streamed ≡ batch statement compares the real
    * query path, not a reimplementation. */
  private def ivfPqProbeOver(
      emb: DataFrame, subs: DataFrame, coarse: DataFrame,
      pqCb: DataFrame, postings: DataFrame): DataFrame = {
    val adc = ivfPqAdcOver(emb, subs, coarse, pqCb, postings)
    val byAdc = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    val ranked = adc.withColumn("rn", row_number().over(byAdc)).filter(col("rn") <= 3)
    // fp64 ground truth: exact L2 top-3 per query (the fidelity flag)
    ranked.join(exact3Of(emb), Seq("q_id", "cand_id"), "left")
      .select(col("q_id"), col("rn"), col("cand_id"),
        col("adc").cast("double").as("adc"),
        coalesce(col("hit"), lit(false)).as("in_exact3"))
      .orderBy("q_id", "rn")
  }

  /** The raw ADC candidate frame (q_id, cand_id, adc) over an arbitrary
    * posting-list frame — the scoring core [[ivfPqProbeOver]]'s top-3
    * read-off and the re-rank shortlist ([[simAnnIvfPqRerank]]) share,
    * so "the shortlist is the ADC ranking the probe emits" holds by
    * construction, not by reimplementation. */
  private def ivfPqAdcOver(
      emb: DataFrame, subs: DataFrame, coarse: DataFrame,
      pqCb: DataFrame, postings: DataFrame): DataFrame = {
    val probed = probedCellsOf(emb, coarse)
      .filter(col("prn") <= IvfPqNprobe)
      .select(col("q_id"), col("cluster"))
    // LUT join columns renamed before the join (the simAnnPq rule: no
    // dataset-id-disambiguated self-join predicates); the LUT prices
    // against the SAME codebook the posting lists encode with
    val luts = subs.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("s"), col("sub"))
      .join(broadcast(pqCb), Seq("s"))
      .withColumn("pd2", round(pqSubD2, 6).cast("decimal(18,6)"))
      .select(col("q_id").as("lut_q"), col("s").as("lut_s"),
        col("cent_id").as("lut_cid"), col("pd2"))
    postings
      .join(broadcast(probed), Seq("cluster"))
      .join(broadcast(luts),
        col("q_id") === col("lut_q") && col("s") === col("lut_s") &&
          col("cid") === col("lut_cid"))
      .filter(col("q_id") =!= col("cand_id"))
      .groupBy(col("q_id"), col("cand_id"))
      .agg(sum(col("pd2")).as("adc"))
  }

  /** The IVF-PQ nprobe OPERATING TABLE — [[simAnnIvfSweep]]'s
    * recall/cost knob applied to the COMPOSED index ([[simAnnIvfPq]]):
    * for nprobe ∈ {1, 2, 4}, the ADC top-3 within the query's nprobe
    * nearest trained cells, scored against the fp64 L2 exact truth.
    * A candidate lives in exactly ONE cell, so its (query, candidate)
    * pair carries a single cell-rank (prn) — the whole sweep is ONE
    * scoring pass over the prn ≤ 4 cells with three filtered read-offs,
    * not three probe passes (the plan the oracle replays). This is the
    * table that says what the compressed index's recall costs at each
    * probe depth — the two knobs a deployment tunes (nprobe, code
    * budget) now both have oracled operating tables. Zero-truth recall
    * guarded on both engines (the dedup_lsh_sweep divergence class).
    *
    * MEASURED at sf0.01: hits FALL 6 → 5 → 3 as nprobe grows 1 → 2 → 4.
    * Unlike the fp64 sweep (hits provably non-decreasing), ADC recall is
    * NOT monotone in probe depth: with the 16-seed PQ codebooks the
    * quantization error exceeds neighbor gaps, so each extra cell's
    * candidates can out-SCORE (not out-rank) true neighbors and evict
    * them from the ADC top-3. That is the table's operating lesson — at
    * this code budget, spend on codebook training before probe depth —
    * and `OperatingPointSpec` pins exactly the invariants that hold by
    * construction (non-decreasing candidate growth — supersets prove no
    * more — and exact recall arithmetic) without pinning away the real
    * effect.
    */
  def simAnnIvfPqSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val coarse = lloydRefine(ivfAssignTo(ivfCentroidsOf(emb), emb))
    val subs = pqSubs(spark, sfDir)
    val postings = ivfAssignTo(coarse, emb)
      .select(col("vec_id").as("cand_id"), col("cluster"))
      .join(pqCodes(subs)
        .select(col("vec_id").as("cand_id"), col("s"), col("cid")),
        Seq("cand_id"))
    val rankedCells = probedCellsOf(emb, coarse)
      .filter(col("prn") <= 4)
      .select(col("q_id"), col("cluster"), col("prn"))
    val luts = subs.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("s"), col("sub"))
      .join(broadcast(pqCents(subs)), Seq("s"))
      .withColumn("pd2", round(pqSubD2, 6).cast("decimal(18,6)"))
      .select(col("q_id").as("lut_q"), col("s").as("lut_s"),
        col("cent_id").as("lut_cid"), col("pd2"))
    val adc = postings
      .join(broadcast(rankedCells), Seq("cluster"))
      .join(broadcast(luts),
        col("q_id") === col("lut_q") && col("s") === col("lut_s") &&
          col("cid") === col("lut_cid"))
      .filter(col("q_id") =!= col("cand_id"))
      .groupBy(col("q_id"), col("cand_id"))
      .agg(sum(col("pd2")).as("adc"), min(col("prn")).as("prn"))
    val exact3 = exact3Of(emb)
    val nExact = exact3.agg(count(lit(1)).as("n_exact"))
    val byAdc = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    val rows = Seq(1, 2, 4).map { p =>
      val cands = adc.filter(col("prn") <= p)
      val top3 = cands
        .withColumn("rn", row_number().over(byAdc))
        .filter(col("rn") <= 3)
      val hits = top3.join(exact3, Seq("q_id", "cand_id"), "left")
        .agg(count(col("hit")).as("n_hits"))
      cands.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(hits).crossJoin(broadcast(nExact))
        .select(lit(p).as("nprobe"), col("n_candidates"), col("n_hits"),
          expr("CASE WHEN n_exact = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE n_hits * 1000000 div n_exact END").as("recall_ppm"))
    }
    rows.reduce(_.unionAll(_)).orderBy("nprobe")
  }

  /** The IVF-PQ CODEBOOK-SIZE operating table — the third and last knob
    * a compressed-index deployment tunes, tabled like the other two
    * (nprobe: [[simAnnIvfPqSweep]]; training: [[simAnnIvfPqTrained]]):
    * for K ∈ {4, 8, 16} codes per subspace, train the per-subspace
    * codebooks (one Lloyd round from the first-K seeds), encode, and
    * report corpus DISTORTION (Σ of the 6dp-exact per-code residuals —
    * the quantity K directly buys down) next to ADC top-3 hits vs the
    * fp64 truth at nprobe = 2. Bytes per vector are constant (8 codes ≤
    * 1 byte each); what K costs is LUT width and training work, what it
    * buys is distortion — this table prices that trade. MEASURED at
    * sf0.01: distortion falls 413 → 361 → 301 and ADC hits RISE
    * 1 → 5 → 7 of 30 as K grows 4 → 8 → 16 — on this corpus the code
    * budget IS the recall lever, the exact complement of the nprobe
    * sweep (where widening the probe set HURT): together the two
    * tables locate the binding constraint a deployment should spend
    * on. Each K is an independent bounded branch (its own broadcast
    * codebook); the oracle replays all three chains via a K-columned
    * CTE pipeline under one hash.
    */
  def simAnnIvfPqKsweep(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val coarse = lloydRefine(ivfAssignTo(ivfCentroidsOf(emb), emb))
    val subs = pqSubs(spark, sfDir)
    val assigned = ivfAssignTo(coarse, emb)
      .select(col("vec_id").as("cand_id"), col("cluster"))
    val probed = probedCellsOf(emb, coarse)
      .filter(col("prn") <= IvfPqNprobe)
      .select(col("q_id"), col("cluster"))
    val exact3 = exact3Of(emb)
    val nExact = exact3.agg(count(lit(1)).as("n_exact"))
    val byAdc = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    val rows = Seq(4, 8, 16).map { k =>
      val cb = pqCentsTrainedFrom(subs, subs.filter(col("vec_id") < k)
        .select(col("s"), col("vec_id").as("cent_id"), col("sub").as("csub")))
      val codes = pqCodesAgainst(subs, cb)
      val distortion = codes.agg(sum(col("d2r")).as("distortion"))
      val luts = subs.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("s"), col("sub"))
        .join(broadcast(cb), Seq("s"))
        .withColumn("pd2", round(pqSubD2, 6).cast("decimal(18,6)"))
        .select(col("q_id").as("lut_q"), col("s").as("lut_s"),
          col("cent_id").as("lut_cid"), col("pd2"))
      val adc = assigned
        .join(codes.select(col("vec_id").as("cand_id"), col("s"), col("cid")),
          Seq("cand_id"))
        .join(broadcast(probed), Seq("cluster"))
        .join(broadcast(luts),
          col("q_id") === col("lut_q") && col("s") === col("lut_s") &&
            col("cid") === col("lut_cid"))
        .filter(col("q_id") =!= col("cand_id"))
        .groupBy(col("q_id"), col("cand_id"))
        .agg(sum(col("pd2")).as("adc"))
      val top3 = adc.withColumn("rn", row_number().over(byAdc)).filter(col("rn") <= 3)
      val hits = top3.join(exact3, Seq("q_id", "cand_id"), "left")
        .agg(count(col("hit")).as("n_hits"))
      distortion.crossJoin(hits).crossJoin(broadcast(nExact))
        .select(lit(k).as("pq_k"),
          col("distortion").cast("double").as("distortion"),
          col("n_hits"),
          expr("CASE WHEN n_exact = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE n_hits * 1000000 div n_exact END").as("recall_ppm"))
    }
    rows.reduce(_.unionAll(_)).orderBy("pq_k")
  }

  /** Shortlist size R for the exact re-rank stage — ~3× the emitted
    * top-3, the standard IVFADC operating point. */
  private val RerankR = 10

  /** Shortlist depths the re-rank operating table prices. */
  private val RerankSweepR = Seq(3, 10, 30)

  /** The exact-scored ADC shortlist — the re-rank family's shared core.
    * Takes the raw ADC frame, keeps each query's top-maxR candidates by
    * ADC rank (arn), and fetches their fp64 vectors BY ID: the corpus
    * vector table streams past a BROADCAST of the NQueries×maxR-row
    * shortlist in an id-equi BroadcastHashJoin — never a rescan, never
    * a second distance pass over unranked candidates — then L2-scores
    * exactly those rows (sequential fold ≡ DuckDB list_sum order, so
    * both engines rank identical doubles). Columns: (q_id, cand_id,
    * arn, d2). At 100 TB the fetch wave reads R×queries vectors through
    * the id-keyed vector zone; `ScaleProbe rerank` prices it at 10⁶. */
  private def rerankScored(emb: DataFrame, adc: DataFrame, maxR: Int): DataFrame = {
    val byAdc = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    val shortlist = adc.withColumn("arn", row_number().over(byAdc))
      .filter(col("arn") <= maxR)
      .select(col("q_id"), col("cand_id"), col("arn"))
    val qv = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val l2 = expr(
      "aggregate(zip_with(qe, ce, (x, y) -> (x-y)*(x-y)), 0D, (acc, x) -> acc + x)")
    emb.select(col("vec_id").as("cand_id"), col("e").as("ce"))
      .join(broadcast(shortlist), Seq("cand_id"))
      .join(broadcast(qv), Seq("q_id"))
      .withColumn("d2", l2)
      .select(col("q_id"), col("cand_id"), col("arn"), col("d2"))
  }

  /** IVF-PQ with the exact RE-RANK stage — the production shape every
    * IVFADC deployment ships, and the direct answer to the suite's own
    * measurement (`sim_ann_ivfpq_trained`: 7/30 fp64-exact at nprobe=2
    * because QUANTIZATION error, not probe depth, binds recall — the
    * nprobe sweep proved widening the probe set hurt). The fix: trust
    * the compressed index only to SHORTLIST — take the ADC top-R
    * (R = [[RerankR]] ≈ 3× k) within the probed cells, fetch those R
    * vectors' fp64 form BY ID (broadcast id-equi join against the
    * vector zone — the only stage that touches uncompressed vectors,
    * and it reads exactly R×queries of them), exact-score only those,
    * and emit the re-ranked top-3. MEASURED at sf0.01: 12/30 fp64-exact
    * vs 7/30 without re-rank — +71% relative fidelity at 10 exact
    * scores per query. The probed-cell ceiling is 26/30 (SCRATCH_r11
    * `rerank_ceiling`): R keeps buying recall toward it (19/30 at
    * R = 30, the sweep's table), while the 4 truths in unprobed cells
    * are unreachable at ANY R — that is nprobe's knob, not R's; the
    * two shortfalls now have separated prices. Output carries both
    * ranks: rn (exact, emitted order) and arn (the ADC rank the
    * shortlist came from) — the distance the compressed index was
    * wrong BY. Own oracle: train(coarse) ∘ train(PQ) ∘ encode ∘ ADC
    * shortlist ∘ by-id fetch ∘ exact re-rank under one hash. */
  def simAnnIvfPqRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val (emb, subs, coarse, pqCb, postings) =
      ivfPqIndexOf(spark, sfDir, trainedPq = true)
    val scored =
      rerankScored(emb, ivfPqAdcOver(emb, subs, coarse, pqCb, postings), RerankR)
    val byD2 = Window.partitionBy("q_id").orderBy(col("d2").asc, col("cand_id"))
    scored.withColumn("rn", row_number().over(byD2))
      .filter(col("rn") <= 3)
      .join(exact3Of(emb), Seq("q_id", "cand_id"), "left")
      .select(col("q_id"), col("rn"), col("cand_id"),
        round(col("d2"), 6).as("d2"), col("arn"),
        coalesce(col("hit"), lit(false)).as("in_exact3"))
      .orderBy("q_id", "rn")
  }

  /** The re-rank R OPERATING TABLE — what each shortlist depth buys and
    * costs, beside the nprobe ([[simAnnIvfPqSweep]]) and code-budget
    * ([[simAnnIvfPqKsweep]]) tables: for R ∈ [[RerankSweepR]], the
    * exact scores paid (n_scored — R×queries, the fetch+score budget)
    * vs fp64-exact hits of the re-ranked top-3. R = 3 re-orders the ADC
    * top-3 without changing the set (hits ≡ the un-re-ranked 7/30 —
    * the no-re-rank baseline priced IN the table); hits then climb
    * toward the probed-cell ceiling as R grows. ONE scoring pass: the
    * shortlist is scored once at max R behind a pinned exchange and
    * each tier is a filtered read-off (ReuseExchange), exactly the
    * nprobe sweep's discipline. MEASURED at sf0.01: 7 → 12 → 19 of 30
    * as R grows 3 → 10 → 30 — recall rises monotonically in R (supersets
    * of scored candidates), the complement of the non-monotone ADC
    * nprobe sweep — toward the probed-cell ceiling of 26/30 at ~125
    * candidates/query (SCRATCH_r11 `rerank_ceiling`): R = 30 recovers
    * 19 of the 26 reachable truths at a quarter of the full-cell scan,
    * and the 4 unreachable are nprobe-bounded, not R-bounded. */
  def simAnnIvfPqRerankSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val (emb, subs, coarse, pqCb, postings) =
      ivfPqIndexOf(spark, sfDir, trainedPq = true)
    val scored =
      rerankScored(emb, ivfPqAdcOver(emb, subs, coarse, pqCb, postings),
        RerankSweepR.max)
        // pinned exchange: ONE encode ∘ ADC ∘ fetch ∘ score pass feeds
        // every tier's read-off (ReuseExchange), and the same exchange
        // serves each tier's q_id window
        .repartition(col("q_id"))
    val exact3 = exact3Of(emb)
    val nExact = exact3.agg(count(lit(1)).as("n_exact"))
    val byD2 = Window.partitionBy("q_id").orderBy(col("d2").asc, col("cand_id"))
    val rows = RerankSweepR.map { r =>
      scored.filter(col("arn") <= r)
        .withColumn("rn", row_number().over(byD2))
        .join(exact3, Seq("q_id", "cand_id"), "left")
        .agg(count(lit(1)).as("n_scored"),
          count(when(col("rn") <= 3, col("hit"))).as("n_hits"))
        .crossJoin(broadcast(nExact))
        .select(lit(r).as("rerank_r"), col("n_scored"), col("n_hits"),
          expr("CASE WHEN n_exact = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE n_hits * 1000000 div n_exact END").as("recall_ppm"))
    }
    rows.reduce(_.unionAll(_)).orderBy("rerank_r")
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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_ood" -> (embOod _),
    "emb_pq" -> (embPq _),
    "sim_ann_pq" -> (simAnnPq _),
    "emb_knn_graph" -> (embKnnGraph _),
    "emb_separation"  -> (embSeparation _),
    "sim_ann_int8"    -> (simAnnInt8 _),
    "emb_pca_power"   -> (embPcaPower _),
    "emb_var_dims"    -> (embVarDims _),
    "emb_threshold_sweep" -> (embThresholdSweep _),
    "sim_ann_recall"  -> (simAnnRecall _),
    "sim_eval_rank"   -> (simEvalRank _),
    "emb_stats"       -> (embStats _),
    "emb_centroid"    -> (embCentroid _),
    "emb_kmeans"      -> (embKmeans _),
    "emb_silhouette"  -> (embSilhouette _),
    "sim_hard_negatives" -> (simHardNegatives _),
    "sim_matryoshka"  -> (simMatryoshka _),
    "emb_kmeans_elbow" -> (embKmeansElbow _),
    "emb_quantize"    -> (embQuantize _),
    "sim_cosine_topk" -> (simCosineTopk _),
    "sim_ann_ivf"     -> (simAnnIvf _),
    "sim_ann_ivf_indexed" -> (simAnnIvfIndexed _),
    "sim_ann_ivf_append" -> (simAnnIvfAppend _),
    "sim_ann_ivf_indexed_append" -> (simAnnIvfIndexedAppend _),
    "sim_ann_ivfpq" -> (simAnnIvfPq _),
    "sim_ann_ivfpq_sweep" -> (simAnnIvfPqSweep _),
    "sim_ann_ivfpq_trained" -> (simAnnIvfPqTrained _),
    "sim_ann_ivfpq_residual" -> (simAnnIvfPqResidual _),
    "sim_ann_ivfpq_ksweep" -> (simAnnIvfPqKsweep _),
    "sim_ann_ivfpq_rerank" -> (simAnnIvfPqRerank _),
    "sim_ann_ivfpq_rerank_sweep" -> (simAnnIvfPqRerankSweep _),
    "sim_index_footprint" -> (simIndexFootprint _),
    "sim_ann_ivf_kmeans" -> (simAnnIvfKmeans _),
    "sim_ann_ivf_sweep" -> (simAnnIvfSweep _),
    "sim_ann_rplsh"   -> (simAnnRpLsh _),
    "sim_ann_multiprobe" -> (simAnnMultiprobe _),
    "sim_ann_probe_sweep" -> (simAnnProbeSweep _),
    "dedup_embedding" -> (dedupEmbedding _),
    "dedup_embedding_sampled" -> (dedupEmbeddingSampled _),
    "dedup_embedding_lsh" -> (dedupEmbeddingLsh _),
    "dedup_semantic"  -> (dedupSemantic _),
  )

  // DuckDB mirrors: same double math as the Spark fold — elementwise
  // multiply then sequential sum (list_sum), no FMA surprises.
  private val duckDot =
    "list_sum(list_transform(range(1, 65), i -> a[i] * b[i]))"

  private def duckCos(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))
       | / (sqrt(list_sum(list_transform(range(1, 65), i -> $a[i] * $a[i])))
       |  * sqrt(list_sum(list_transform(range(1, 65), i -> $b[i] * $b[i])))))""".stripMargin

  private def duckPlaneLit(p: Seq[Double]): String =
    p.map(v => if (v == v.floor) f"${v.toLong}%d.0" else v.toString).mkString("[", ", ", "]")

  private def duckBucket: String =
    graft.functions.Hashing.RpPlanes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> v[i] * (${duckPlaneLit(p)}::DOUBLE[])[i])) > 0.0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  /** The trained IVF-PQ chain through the ADC candidate frame plus the
    * fp64 exact-top-3 truth, as DuckDB CTE text (`WITH e AS … adc AS
    * (…), exact3 AS (…)`) — shared VERBATIM by the `sim_ann_ivfpq_trained`
    * and re-rank oracles, so every member of the family replays the same
    * train(coarse) ∘ train(PQ) ∘ assign ∘ encode ∘ ADC chain; callers
    * append their own read-off CTEs and final SELECT. */
  private def duckIvfPqTrainedCtes: String =
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
       |), subs AS (
       |  SELECT vec_id, s, v[(s*8+1):(s*8+8)] AS sub
       |  FROM e, (SELECT unnest(range(0, 8)) AS s)
       |), pcents AS (
       |  SELECT s, vec_id AS cent_id, sub AS csub FROM subs WHERE vec_id < 16
       |), pcand AS (
       |  SELECT subs.vec_id, subs.s, pcents.cent_id,
       |    list_sum(list_transform(range(1, 9),
       |      i -> (subs.sub[i] - pcents.csub[i]) * (subs.sub[i] - pcents.csub[i]))) AS d2
       |  FROM subs JOIN pcents ON subs.s = pcents.s
       |), codes AS (
       |  SELECT vec_id AS cand_id, s, cid FROM (
       |    SELECT vec_id, s, cent_id AS cid,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cent_id) AS rn
       |    FROM pcand) WHERE rn = 1
       |), pm AS (
       |  SELECT subs.s, c.cid, gs.pos, subs.sub[gs.pos] AS v
       |  FROM subs JOIN codes c ON subs.vec_id = c.cand_id AND subs.s = c.s
       |  CROSS JOIN (SELECT unnest(range(1, 9)) AS pos) gs
       |), pmeans AS (
       |  SELECT s, cid, pos, ROUND(AVG(v), 6) AS c FROM pm GROUP BY s, cid, pos
       |), pnewc AS (
       |  SELECT s, cid AS cent_id, list(c ORDER BY pos) AS csub
       |  FROM pmeans GROUP BY s, cid
       |), tcand AS (
       |  SELECT subs.vec_id, subs.s, pnewc.cent_id,
       |    list_sum(list_transform(range(1, 9),
       |      i -> (subs.sub[i] - pnewc.csub[i]) * (subs.sub[i] - pnewc.csub[i]))) AS d2
       |  FROM subs JOIN pnewc ON subs.s = pnewc.s
       |), codes2 AS (
       |  SELECT vec_id AS cand_id, s, cid FROM (
       |    SELECT vec_id, s, cent_id AS cid,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cent_id) AS rn
       |    FROM tcand) WHERE rn = 1
       |), probed AS (
       |  SELECT q_id, cluster FROM (
       |    SELECT q.vec_id AS q_id, newc.cent_id AS cluster,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${duckCos("q.v", "newc.cv")} DESC, newc.cent_id) AS prn
       |    FROM e q CROSS JOIN newc WHERE q.vec_id < $NQueries)
       |  WHERE prn <= $IvfPqNprobe
       |), luts2 AS (
       |  SELECT subs.vec_id AS q_id, subs.s, pnewc.cent_id,
       |    CAST(ROUND(list_sum(list_transform(range(1, 9),
       |      i -> (subs.sub[i] - pnewc.csub[i]) * (subs.sub[i] - pnewc.csub[i]))), 6)
       |      AS DECIMAL(18,6)) AS pd2
       |  FROM subs JOIN pnewc ON subs.s = pnewc.s
       |  WHERE subs.vec_id < $NQueries
       |), adc AS (
       |  SELECT p.q_id, c.cand_id, SUM(l.pd2) AS adc
       |  FROM probed p
       |  JOIN a2 ON a2.cluster = p.cluster
       |  JOIN codes2 c ON c.cand_id = a2.vec_id
       |  JOIN luts2 l ON l.q_id = p.q_id AND l.s = c.s AND l.cent_id = c.cid
       |  WHERE p.q_id <> c.cand_id
       |  GROUP BY p.q_id, c.cand_id
       |), exact3 AS (
       |  SELECT q_id, cand_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_sum(list_transform(range(1, 65),
       |          i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))), c.vec_id) AS xrn
       |    FROM e q JOIN e c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id < $NQueries) WHERE xrn <= 3
       |)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "emb_pq" -> {
      val codeSel = (0 until 8)
        .map(s => s"MAX(CASE WHEN s = $s THEN cid END) AS c$s").mkString(",\n  ")
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), subs AS (
         |  SELECT vec_id, s, v[(s*8+1):(s*8+8)] AS sub
         |  FROM e, (SELECT unnest(range(0, 8)) AS s)
         |), cents AS (
         |  SELECT s, vec_id AS cent_id, sub AS csub FROM subs WHERE vec_id < 16
         |), cand AS (
         |  SELECT subs.vec_id, subs.s, cents.cent_id,
         |    list_sum(list_transform(range(1, 9),
         |      i -> (subs.sub[i] - cents.csub[i]) * (subs.sub[i] - cents.csub[i]))) AS d2
         |  FROM subs JOIN cents ON subs.s = cents.s
         |), best AS (
         |  SELECT vec_id, s, cent_id AS cid,
         |    CAST(ROUND(d2, 6) AS DECIMAL(18,6)) AS d2r,
         |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cent_id) AS rn
         |  FROM cand
         |)
         |SELECT vec_id,
         |  $codeSel,
         |  CAST(SUM(d2r) AS DOUBLE) AS recon_err
         |FROM best WHERE rn = 1
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin
    },
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
    "sim_ann_pq" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), subs AS (
         |  SELECT vec_id, s, v[(s*8+1):(s*8+8)] AS sub
         |  FROM e, (SELECT unnest(range(0, 8)) AS s)
         |), cents AS (
         |  SELECT s, vec_id AS cent_id, sub AS csub FROM subs WHERE vec_id < 16
         |), cand AS (
         |  SELECT subs.vec_id, subs.s, cents.cent_id,
         |    list_sum(list_transform(range(1, 9),
         |      i -> (subs.sub[i] - cents.csub[i]) * (subs.sub[i] - cents.csub[i]))) AS d2
         |  FROM subs JOIN cents ON subs.s = cents.s
         |), codes AS (
         |  SELECT vec_id AS cand_id, s, cent_id AS cid FROM (
         |    SELECT vec_id, s, cent_id,
         |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cent_id) AS rn
         |    FROM cand) WHERE rn = 1
         |), luts AS (
         |  SELECT subs.vec_id AS q_id, subs.s, cents.cent_id,
         |    CAST(ROUND(list_sum(list_transform(range(1, 9),
         |      i -> (subs.sub[i] - cents.csub[i]) * (subs.sub[i] - cents.csub[i]))), 6)
         |      AS DECIMAL(18,6)) AS pd2
         |  FROM subs JOIN cents ON subs.s = cents.s
         |  WHERE subs.vec_id < $NQueries
         |), adc AS (
         |  SELECT l.q_id, c.cand_id, SUM(l.pd2) AS adc
         |  FROM codes c JOIN luts l ON c.s = l.s AND c.cid = l.cent_id
         |  GROUP BY l.q_id, c.cand_id
         |  HAVING l.q_id <> c.cand_id
         |), ranked AS (
         |  SELECT q_id, cand_id, adc,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, cand_id) AS INTEGER) AS rn
         |  FROM adc
         |), exact3 AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        list_sum(list_transform(range(1, 65),
         |          i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))), c.vec_id) AS xrn
         |    FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < $NQueries) WHERE xrn <= 3
         |)
         |SELECT r.q_id, r.rn, r.cand_id, CAST(r.adc AS DOUBLE) AS adc,
         |  (x.q_id IS NOT NULL) AS in_exact3
         |FROM ranked r LEFT JOIN exact3 x
         |  ON r.q_id = x.q_id AND r.cand_id = x.cand_id
         |WHERE r.rn <= 3
         |ORDER BY r.q_id, r.rn""".stripMargin,
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
    "sim_ann_int8" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), q8 AS (
         |  SELECT vec_id,
         |    list_transform(v, x -> CAST(floor(x * (127.0 / list_max(list_transform(v, y -> abs(y))))) AS BIGINT)) AS qv
         |  FROM e
         |), scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |    CAST(list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.qv[i])) AS BIGINT) AS idot
         |  FROM q8 q JOIN q8 c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id
         |), ranked AS (
         |  SELECT q_id, cand_id, idot,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY idot DESC, cand_id) AS INTEGER) AS rn
         |  FROM scored
         |), exact AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |    ROUND(${duckCos("q.v", "c.v")}, 6) AS cos
         |  FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id
         |), exact3 AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q_id, cand_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS ern
         |    FROM exact) WHERE ern <= 3
         |)
         |SELECT r.q_id, r.rn, r.cand_id, r.idot,
         |  EXISTS (SELECT 1 FROM exact3 x
         |          WHERE x.q_id = r.q_id AND x.cand_id = r.cand_id) AS in_exact3
         |FROM ranked r WHERE r.rn <= 3
         |ORDER BY r.q_id, r.rn""".stripMargin,
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
    // sim_matryoshka: same top-3 contract per truncation width; LEFT JOIN
    // against the full-width top-3 counts survivors (COUNT of non-null
    // match keys -> 0..3 even when nothing survives).
    "sim_matryoshka" -> {
      def top3(mExpr: String, cosA: String, cosB: String): String =
        s"""SELECT q_id, cand_id, rn, $mExpr AS dims FROM (
           |    SELECT q.q_id, e.vec_id AS cand_id,
           |      row_number() OVER (PARTITION BY q.q_id
           |        ORDER BY ROUND(${duckCos(cosA, cosB)}, 6) DESC, e.vec_id) AS rn
           |    FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id)
           |  WHERE rn <= 3""".stripMargin
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), q AS (
         |  SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NQueries
         |), full3 AS (
         |  ${top3("64", "q.qv", "e.v")}
         |), trunc AS (
         |  ${MrlDims.map(m => top3(m.toString, s"q.qv[1:$m]", s"e.v[1:$m]"))
                     .mkString("\n  UNION ALL\n  ")}
         |), ov AS (
         |  SELECT t.q_id, t.dims,
         |    CAST(COUNT(f.cand_id) AS BIGINT) AS overlap3,
         |    MAX(CASE WHEN t.rn = 1 THEN t.cand_id END) AS r1cand
         |  FROM trunc t LEFT JOIN full3 f
         |    ON t.q_id = f.q_id AND t.cand_id = f.cand_id
         |  GROUP BY t.q_id, t.dims
         |)
         |SELECT ov.q_id, CAST(ov.dims AS INTEGER) AS dims, ov.overlap3,
         |  (ov.r1cand = f1.cand_id) AS rank1_match
         |FROM ov JOIN full3 f1 ON ov.q_id = f1.q_id AND f1.rn = 1
         |ORDER BY ov.q_id, ov.dims""".stripMargin
    },
    // sim_hard_negatives: ranking on the ROUNDED cosine with cand_id
    // tiebreak (the sim_cosine_topk contract); margin is exact decimal
    // subtraction, row_number cast back to INTEGER for the type gate.
    "sim_hard_negatives" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), q AS (
         |  SELECT vec_id AS q_id, label AS q_label, v AS qv
         |  FROM e WHERE vec_id < $NQueries
         |), sc AS (
         |  SELECT q.q_id, q.q_label, e.vec_id AS cand_id, e.label AS c_label,
         |    ROUND(${duckCos("q.qv", "e.v")}, 6) AS cos
         |  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id
         |), negs AS (
         |  SELECT q_id, q_label, cand_id, c_label AS neg_label, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
         |  FROM sc WHERE c_label <> q_label
         |), pos AS (
         |  SELECT q_id, cos AS pos_cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS prn
         |  FROM sc WHERE c_label = q_label
         |)
         |SELECT n.q_id, n.q_label, CAST(n.rn AS INTEGER) AS rn, n.cand_id,
         |  n.neg_label, n.cos AS neg_cos, p.pos_cos,
         |  CAST(p.pos_cos AS DECIMAL(9,6)) - CAST(n.cos AS DECIMAL(9,6)) AS margin
         |FROM negs n JOIN pos p ON n.q_id = p.q_id AND p.prn = 1
         |WHERE n.rn <= 3 ORDER BY n.q_id, n.rn""".stripMargin,
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
    "dedup_embedding" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ROUND(${duckCos("a.v", "b.v")}, 6) AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ROUND(${duckCos("a.v", "b.v")}, 6) >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin,
    "dedup_embedding_sampled" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), s AS (
         |  SELECT * FROM e
         |  WHERE ${graft.functions.Hashing.duckHash60("CAST(vec_id AS VARCHAR)")} % 100 < ${Dedup.CalibSamplePct}
         |)
         |SELECT s.vec_id AS probe_id, c.vec_id AS nbr_id,
         |  ROUND(${duckCos("s.v", "c.v")}, 6) AS cos
         |FROM s JOIN e c ON s.vec_id <> c.vec_id
         |WHERE ROUND(${duckCos("s.v", "c.v")}, 6) >= 0.45
         |ORDER BY probe_id, nbr_id""".stripMargin,
    "dedup_embedding_lsh" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), b AS (
         |  SELECT vec_id, v, $duckBucket AS bucket FROM e
         |), probes AS (
         |  SELECT vec_id AS vec_a,
         |    unnest([bucket, ${{
              val idx = graft.functions.Hashing.RpPlanes.indices
              (idx.map(j => s"xor(bucket, ${1 << j})") ++
                (for { i <- idx; j <- idx if i < j }
                  yield s"xor(bucket, ${(1 << i) | (1 << j)})")).mkString(", ")
            }}]) AS pb
         |  FROM b
         |), cand AS (
         |  SELECT DISTINCT p.vec_a, c.vec_id AS vec_b
         |  FROM probes p JOIN b c ON p.pb = c.bucket
         |  WHERE p.vec_a < c.vec_id
         |)
         |SELECT cand.vec_a, cand.vec_b,
         |  ROUND(${duckCos("va.v", "vb.v")}, 6) AS cos
         |FROM cand
         |JOIN b va ON cand.vec_a = va.vec_id
         |JOIN b vb ON cand.vec_b = vb.vec_id
         |WHERE ROUND(${duckCos("va.v", "vb.v")}, 6) >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin,
    "sim_ann_multiprobe" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), bucketed AS (
         |  SELECT vec_id, v, $duckBucket AS bucket FROM e
         |), probes AS (
         |  SELECT vec_id AS q_id, v AS qv,
         |    unnest([bucket, ${(0 until 8).map(j => s"xor(bucket, ${1 << j})").mkString(", ")}]) AS bucket
         |  FROM bucketed WHERE vec_id < $NQueries
         |), cand AS (
         |  SELECT DISTINCT p.q_id, p.qv, c.vec_id AS cand_id, c.v AS cv
         |  FROM probes p JOIN bucketed c ON p.bucket = c.bucket
         |  WHERE p.q_id <> c.vec_id
         |), scored AS (
         |  SELECT q_id, cand_id, ROUND(${duckCos("qv", "cv")}, 6) AS cos FROM cand
         |), ranked AS (
         |  SELECT q_id, cand_id, cos,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS INTEGER) AS rn
         |  FROM scored
         |)
         |SELECT q_id, rn, cand_id, cos FROM ranked WHERE rn <= 3
         |ORDER BY q_id, rn""".stripMargin,
    // sim_ann_probe_sweep: candidate set at radius r equals the probe
    // expansion's, so the oracle generates candidates directly by the
    // Hamming predicate over the cross join and filters per radius.
    "sim_ann_probe_sweep" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), bucketed AS (
         |  SELECT vec_id, v, $duckBucket AS bucket FROM e
         |), cand AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |    ROUND(${duckCos("q.v", "c.v")}, 6) AS cos,
         |    bit_count(xor(q.bucket, c.bucket)) AS ham
         |  FROM bucketed q JOIN bucketed c
         |    ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id
         |  WHERE bit_count(xor(q.bucket, c.bucket)) <= 2
         |), exact AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(${duckCos("q.v", "c.v")}, 6) DESC, c.vec_id) AS rn
         |    FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id)
         |  WHERE rn <= 3
         |), nex AS (SELECT COUNT(*) AS n_exact FROM exact),
         |radii(radius, n_probe_buckets) AS (VALUES (0, 1), (1, 9), (2, 37)),
         |per AS (
         |  SELECT r.radius, r.n_probe_buckets,
         |    (SELECT COUNT(*) FROM cand WHERE ham <= r.radius) AS n_candidates,
         |    (SELECT COUNT(*) FROM (
         |       SELECT q_id, cand_id FROM (
         |         SELECT q_id, cand_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY cos DESC, cand_id) AS rn
         |         FROM cand WHERE ham <= r.radius)
         |       WHERE rn <= 3) t
         |     JOIN exact ON t.q_id = exact.q_id AND t.cand_id = exact.cand_id)
         |      AS n_hits
         |  FROM radii r
         |)
         |SELECT CAST(radius AS INTEGER) AS radius,
         |  CAST(n_probe_buckets AS INTEGER) AS n_probe_buckets,
         |  CAST(n_candidates AS BIGINT) AS n_candidates,
         |  CAST(n_hits AS BIGINT) AS n_hits,
         |  CASE WHEN nex.n_exact = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(n_hits * 1000000 // nex.n_exact AS BIGINT)
         |  END AS recall_ppm
         |FROM per CROSS JOIN nex
         |ORDER BY radius""".stripMargin,
    "sim_ann_rplsh" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), bucketed AS (
         |  SELECT vec_id, v, $duckBucket AS bucket FROM e
         |), scored AS (
         |  SELECT q.vec_id AS q_id, q.bucket, c.vec_id AS cand_id,
         |    ROUND(${duckCos("q.v", "c.v")}, 6) AS cos
         |  FROM bucketed q JOIN bucketed c
         |    ON q.bucket = c.bucket AND q.vec_id < $NQueries AND q.vec_id <> c.vec_id
         |), ranked AS (
         |  SELECT q_id, bucket, cand_id, cos,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS INTEGER) AS rn
         |  FROM scored
         |)
         |SELECT q_id, bucket, rn, cand_id, cos FROM ranked WHERE rn <= 3
         |ORDER BY q_id, rn""".stripMargin,
    "sim_cosine_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |    ROUND(${duckCos("q.v", "c.v")}, 6) AS cos
         |  FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id
         |), ranked AS (
         |  SELECT q_id, cand_id, cos,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS INTEGER) AS rn
         |  FROM scored
         |)
         |SELECT q_id, rn, cand_id, cos FROM ranked WHERE rn <= 5
         |ORDER BY q_id, rn""".stripMargin,
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
    "dedup_semantic" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), cents AS (
         |  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < $NCentroids
         |), assigned AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT e.vec_id, e.v, cents.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckCos("e.v", "cents.cv")} DESC, cents.cent_id) AS crn
         |    FROM e CROSS JOIN cents)
         |  WHERE crn = 1
         |), rep AS (
         |  SELECT b.vec_id, MIN(a.vec_id) AS matched_to
         |  FROM assigned a JOIN assigned b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |   AND ROUND(${duckCos("a.v", "b.v")}, 6) >= $SemDedupTau
         |  GROUP BY b.vec_id
         |)
         |SELECT s.vec_id, s.cluster, r.matched_to,
         |  (r.matched_to IS NULL) AS keep
         |FROM assigned s LEFT JOIN rep r ON s.vec_id = r.vec_id
         |ORDER BY s.vec_id""".stripMargin,
    "sim_ann_ivf" -> simAnnIvfSql,
    // the indexed form SHARES the oracle verbatim: the oracle never sees
    // the parquet round-trip, so one hash pins indexed ≡ recomputed
    "sim_ann_ivf_indexed" -> simAnnIvfSql,
    // the append form shares it too: assignment is per-vector independent
    // given the frozen codebook, so batch-append ≡ full rebuild and the
    // same hash pins it (see simAnnIvfAppend scaladoc)
    "sim_ann_ivf_append" -> simAnnIvfSql,
    // the standing-index append shares it too: the oracle never sees the
    // parquet round-trip, and per-vector independence makes
    // index-scan ∪ batch-assign ≡ rebuild (see simAnnIvfIndexedAppend)
    "sim_ann_ivf_indexed_append" -> simAnnIvfSql,
    // the composed IVF-PQ: train (Lloyd) ∘ coarse-assign ∘ PQ-encode ∘
    // LUT-probe replayed end-to-end — the coarse CTEs are
    // sim_ann_ivf_kmeans's verbatim, the PQ CTEs sim_ann_pq's verbatim
    "sim_ann_ivfpq" ->
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
         |), subs AS (
         |  SELECT vec_id, s, v[(s*8+1):(s*8+8)] AS sub
         |  FROM e, (SELECT unnest(range(0, 8)) AS s)
         |), pcents AS (
         |  SELECT s, vec_id AS cent_id, sub AS csub FROM subs WHERE vec_id < 16
         |), pcand AS (
         |  SELECT subs.vec_id, subs.s, pcents.cent_id,
         |    list_sum(list_transform(range(1, 9),
         |      i -> (subs.sub[i] - pcents.csub[i]) * (subs.sub[i] - pcents.csub[i]))) AS d2
         |  FROM subs JOIN pcents ON subs.s = pcents.s
         |), codes AS (
         |  SELECT vec_id AS cand_id, s, cid FROM (
         |    SELECT vec_id, s, cent_id AS cid,
         |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cent_id) AS rn
         |    FROM pcand) WHERE rn = 1
         |), probed AS (
         |  SELECT q_id, cluster FROM (
         |    SELECT q.vec_id AS q_id, newc.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${duckCos("q.v", "newc.cv")} DESC, newc.cent_id) AS prn
         |    FROM e q CROSS JOIN newc WHERE q.vec_id < $NQueries)
         |  WHERE prn <= $IvfPqNprobe
         |), luts AS (
         |  SELECT subs.vec_id AS q_id, subs.s, pcents.cent_id,
         |    CAST(ROUND(list_sum(list_transform(range(1, 9),
         |      i -> (subs.sub[i] - pcents.csub[i]) * (subs.sub[i] - pcents.csub[i]))), 6)
         |      AS DECIMAL(18,6)) AS pd2
         |  FROM subs JOIN pcents ON subs.s = pcents.s
         |  WHERE subs.vec_id < $NQueries
         |), adc AS (
         |  SELECT p.q_id, c.cand_id, SUM(l.pd2) AS adc
         |  FROM probed p
         |  JOIN a2 ON a2.cluster = p.cluster
         |  JOIN codes c ON c.cand_id = a2.vec_id
         |  JOIN luts l ON l.q_id = p.q_id AND l.s = c.s AND l.cent_id = c.cid
         |  WHERE p.q_id <> c.cand_id
         |  GROUP BY p.q_id, c.cand_id
         |), ranked AS (
         |  SELECT q_id, cand_id, adc,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, cand_id) AS INTEGER) AS rn
         |  FROM adc
         |), exact3 AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        list_sum(list_transform(range(1, 65),
         |          i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))), c.vec_id) AS xrn
         |    FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < $NQueries) WHERE xrn <= 3
         |)
         |SELECT r.q_id, r.rn, r.cand_id, CAST(r.adc AS DOUBLE) AS adc,
         |  (x.q_id IS NOT NULL) AS in_exact3
         |FROM ranked r LEFT JOIN exact3 x
         |  ON r.q_id = x.q_id AND r.cand_id = x.cand_id
         |WHERE r.rn <= 3
         |ORDER BY r.q_id, r.rn""".stripMargin,
    // the codebook-size sweep replays all three K-chains through ONE
    // K-columned CTE pipeline: every training/encode/LUT/probe CTE
    // carries k in its group keys, so one hash pins the whole table
    "sim_ann_ivfpq_ksweep" ->
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
         |), subs AS (
         |  SELECT vec_id, s, v[(s*8+1):(s*8+8)] AS sub
         |  FROM e, (SELECT unnest(range(0, 8)) AS s)
         |), ks(k) AS (VALUES (4), (8), (16)),
         |seeds AS (
         |  SELECT ks.k, subs.s, subs.vec_id AS cent_id, subs.sub AS csub
         |  FROM subs CROSS JOIN ks WHERE subs.vec_id < ks.k
         |), cand1 AS (
         |  SELECT seeds.k, subs.vec_id, subs.s, seeds.cent_id,
         |    list_sum(list_transform(range(1, 9),
         |      i -> (subs.sub[i] - seeds.csub[i]) * (subs.sub[i] - seeds.csub[i]))) AS d2
         |  FROM subs JOIN seeds ON subs.s = seeds.s
         |), codes1 AS (
         |  SELECT k, vec_id, s, cid FROM (
         |    SELECT k, vec_id, s, cent_id AS cid,
         |      row_number() OVER (PARTITION BY k, vec_id, s ORDER BY d2, cent_id) AS rn
         |    FROM cand1) WHERE rn = 1
         |), pm AS (
         |  SELECT c.k, subs.s, c.cid, gs.pos, subs.sub[gs.pos] AS v
         |  FROM subs JOIN codes1 c ON subs.vec_id = c.vec_id AND subs.s = c.s
         |  CROSS JOIN (SELECT unnest(range(1, 9)) AS pos) gs
         |), pmeans AS (
         |  SELECT k, s, cid, pos, ROUND(AVG(v), 6) AS c FROM pm GROUP BY k, s, cid, pos
         |), pnewc AS (
         |  SELECT k, s, cid AS cent_id, list(c ORDER BY pos) AS csub
         |  FROM pmeans GROUP BY k, s, cid
         |), cand2 AS (
         |  SELECT pnewc.k, subs.vec_id, subs.s, pnewc.cent_id,
         |    list_sum(list_transform(range(1, 9),
         |      i -> (subs.sub[i] - pnewc.csub[i]) * (subs.sub[i] - pnewc.csub[i]))) AS d2
         |  FROM subs JOIN pnewc ON subs.s = pnewc.s
         |), codes2 AS (
         |  SELECT k, vec_id AS cand_id, s, cid,
         |    CAST(ROUND(d2, 6) AS DECIMAL(18,6)) AS d2r FROM (
         |    SELECT k, vec_id, s, cent_id AS cid, d2,
         |      row_number() OVER (PARTITION BY k, vec_id, s ORDER BY d2, cent_id) AS rn
         |    FROM cand2) WHERE rn = 1
         |), dist AS (
         |  SELECT k, SUM(d2r) AS distortion FROM codes2 GROUP BY k
         |), probed AS (
         |  SELECT q_id, cluster FROM (
         |    SELECT q.vec_id AS q_id, newc.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${duckCos("q.v", "newc.cv")} DESC, newc.cent_id) AS prn
         |    FROM e q CROSS JOIN newc WHERE q.vec_id < $NQueries)
         |  WHERE prn <= $IvfPqNprobe
         |), luts AS (
         |  SELECT pnewc.k, subs.vec_id AS q_id, subs.s, pnewc.cent_id,
         |    CAST(ROUND(list_sum(list_transform(range(1, 9),
         |      i -> (subs.sub[i] - pnewc.csub[i]) * (subs.sub[i] - pnewc.csub[i]))), 6)
         |      AS DECIMAL(18,6)) AS pd2
         |  FROM subs JOIN pnewc ON subs.s = pnewc.s
         |  WHERE subs.vec_id < $NQueries
         |), adc AS (
         |  SELECT c.k, p.q_id, c.cand_id, SUM(l.pd2) AS adc
         |  FROM probed p
         |  JOIN a2 ON a2.cluster = p.cluster
         |  JOIN codes2 c ON c.cand_id = a2.vec_id
         |  JOIN luts l ON l.k = c.k AND l.q_id = p.q_id
         |    AND l.s = c.s AND l.cent_id = c.cid
         |  WHERE p.q_id <> c.cand_id
         |  GROUP BY c.k, p.q_id, c.cand_id
         |), ranked AS (
         |  SELECT k, q_id, cand_id,
         |    row_number() OVER (PARTITION BY k, q_id ORDER BY adc, cand_id) AS rn
         |  FROM adc
         |), exact3 AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        list_sum(list_transform(range(1, 65),
         |          i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))), c.vec_id) AS xrn
         |    FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < $NQueries) WHERE xrn <= 3
         |), nex AS (SELECT COUNT(*) AS n_exact FROM exact3),
         |hits AS (
         |  SELECT r.k, COUNT(*) AS n_hits
         |  FROM ranked r JOIN exact3 x
         |    ON r.q_id = x.q_id AND r.cand_id = x.cand_id
         |  WHERE r.rn <= 3 GROUP BY r.k
         |)
         |SELECT CAST(ks.k AS INTEGER) AS pq_k,
         |  CAST(dist.distortion AS DOUBLE) AS distortion,
         |  CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
         |  CASE WHEN nex.n_exact = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(COALESCE(hits.n_hits, 0) * 1000000 // nex.n_exact AS BIGINT)
         |  END AS recall_ppm
         |FROM ks JOIN dist ON dist.k = ks.k
         |LEFT JOIN hits ON hits.k = ks.k
         |CROSS JOIN nex
         |ORDER BY pq_k""".stripMargin,
    // the residual form encodes r = v − c(v) and prices queries against
    // a PER-CELL residual LUT — train(coarse) ∘ residual ∘ train(PQ on
    // residuals) ∘ encode ∘ per-cell LUT ∘ probe under one hash
    "sim_ann_ivfpq_residual" ->
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
         |  SELECT vec_id, v, cluster, cv FROM (
         |    SELECT e.vec_id, e.v, newc.cent_id AS cluster, newc.cv,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckCos("e.v", "newc.cv")} DESC, newc.cent_id) AS crn
         |    FROM e CROSS JOIN newc)
         |  WHERE crn = 1
         |), resid AS (
         |  SELECT vec_id, cluster,
         |    list_transform(range(1, 65), i -> v[i] - cv[i]) AS r
         |  FROM a2
         |), rsubs AS (
         |  SELECT vec_id, s, r[(s*8+1):(s*8+8)] AS sub
         |  FROM resid, (SELECT unnest(range(0, 8)) AS s)
         |), rpc AS (
         |  SELECT s, vec_id AS cent_id, sub AS csub FROM rsubs WHERE vec_id < 16
         |), rpcand AS (
         |  SELECT rsubs.vec_id, rsubs.s, rpc.cent_id,
         |    list_sum(list_transform(range(1, 9),
         |      i -> (rsubs.sub[i] - rpc.csub[i]) * (rsubs.sub[i] - rpc.csub[i]))) AS d2
         |  FROM rsubs JOIN rpc ON rsubs.s = rpc.s
         |), rcodes1 AS (
         |  SELECT vec_id, s, cid FROM (
         |    SELECT vec_id, s, cent_id AS cid,
         |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cent_id) AS rn
         |    FROM rpcand) WHERE rn = 1
         |), rpm AS (
         |  SELECT rsubs.s, c.cid, gs.pos, rsubs.sub[gs.pos] AS v
         |  FROM rsubs JOIN rcodes1 c ON rsubs.vec_id = c.vec_id AND rsubs.s = c.s
         |  CROSS JOIN (SELECT unnest(range(1, 9)) AS pos) gs
         |), rpmeans AS (
         |  SELECT s, cid, pos, ROUND(AVG(v), 6) AS c FROM rpm GROUP BY s, cid, pos
         |), rpnewc AS (
         |  SELECT s, cid AS cent_id, list(c ORDER BY pos) AS csub
         |  FROM rpmeans GROUP BY s, cid
         |), rcand2 AS (
         |  SELECT rsubs.vec_id, rsubs.s, rpnewc.cent_id,
         |    list_sum(list_transform(range(1, 9),
         |      i -> (rsubs.sub[i] - rpnewc.csub[i]) * (rsubs.sub[i] - rpnewc.csub[i]))) AS d2
         |  FROM rsubs JOIN rpnewc ON rsubs.s = rpnewc.s
         |), codes2 AS (
         |  SELECT vec_id AS cand_id, s, cid FROM (
         |    SELECT vec_id, s, cent_id AS cid,
         |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cent_id) AS rn
         |    FROM rcand2) WHERE rn = 1
         |), probedr AS (
         |  SELECT q_id, cluster, rq FROM (
         |    SELECT q.vec_id AS q_id, newc.cent_id AS cluster,
         |      list_transform(range(1, 65), i -> q.v[i] - newc.cv[i]) AS rq,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${duckCos("q.v", "newc.cv")} DESC, newc.cent_id) AS prn
         |    FROM e q CROSS JOIN newc WHERE q.vec_id < $NQueries)
         |  WHERE prn <= $IvfPqNprobe
         |), rqsubs AS (
         |  SELECT q_id, cluster, s, rq[(s*8+1):(s*8+8)] AS sub
         |  FROM probedr, (SELECT unnest(range(0, 8)) AS s)
         |), luts AS (
         |  SELECT rqsubs.q_id, rqsubs.cluster, rqsubs.s, rpnewc.cent_id,
         |    CAST(ROUND(list_sum(list_transform(range(1, 9),
         |      i -> (rqsubs.sub[i] - rpnewc.csub[i]) * (rqsubs.sub[i] - rpnewc.csub[i]))), 6)
         |      AS DECIMAL(18,6)) AS pd2
         |  FROM rqsubs JOIN rpnewc ON rqsubs.s = rpnewc.s
         |), adc AS (
         |  SELECT p.q_id, c.cand_id, SUM(l.pd2) AS adc
         |  FROM probedr p
         |  JOIN resid rv ON rv.cluster = p.cluster
         |  JOIN codes2 c ON c.cand_id = rv.vec_id
         |  JOIN luts l ON l.q_id = p.q_id AND l.cluster = p.cluster
         |    AND l.s = c.s AND l.cent_id = c.cid
         |  WHERE p.q_id <> c.cand_id
         |  GROUP BY p.q_id, c.cand_id
         |), ranked AS (
         |  SELECT q_id, cand_id, adc,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, cand_id) AS INTEGER) AS rn
         |  FROM adc
         |), exact3 AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        list_sum(list_transform(range(1, 65),
         |          i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))), c.vec_id) AS xrn
         |    FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < $NQueries) WHERE xrn <= 3
         |)
         |SELECT r.q_id, r.rn, r.cand_id, CAST(r.adc AS DOUBLE) AS adc,
         |  (x.q_id IS NOT NULL) AS in_exact3
         |FROM ranked r LEFT JOIN exact3 x
         |  ON r.q_id = x.q_id AND r.cand_id = x.cand_id
         |WHERE r.rn <= 3
         |ORDER BY r.q_id, r.rn""".stripMargin,
    // the trained form adds the per-subspace Lloyd round: assign
    // subvectors to the SEED codebooks, 6dp per-dimension means per
    // (subspace, code) cell, re-encode + re-LUT against the trained
    // codebooks — train(coarse) ∘ train(PQ) ∘ assign ∘ encode ∘ probe
    // under one hash
    "sim_ann_ivfpq_trained" ->
      s"""$duckIvfPqTrainedCtes
         |, ranked AS (
         |  SELECT q_id, cand_id, adc,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, cand_id) AS INTEGER) AS rn
         |  FROM adc
         |)
         |SELECT r.q_id, r.rn, r.cand_id, CAST(r.adc AS DOUBLE) AS adc,
         |  (x.q_id IS NOT NULL) AS in_exact3
         |FROM ranked r LEFT JOIN exact3 x
         |  ON r.q_id = x.q_id AND r.cand_id = x.cand_id
         |WHERE r.rn <= 3
         |ORDER BY r.q_id, r.rn""".stripMargin,
    // the footprint re-derives rows_stored off the SAME encode chain as
    // emb_pq (count of the argmin code rows), so the storage table is
    // pinned to the deterministic encode, not to constants alone
    "sim_index_footprint" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), subs AS (
         |  SELECT vec_id, s, v[(s*8+1):(s*8+8)] AS sub
         |  FROM e, (SELECT unnest(range(0, 8)) AS s)
         |), cents AS (
         |  SELECT s, vec_id AS cent_id, sub AS csub FROM subs WHERE vec_id < 16
         |), cand AS (
         |  SELECT subs.vec_id, subs.s, cents.cent_id,
         |    list_sum(list_transform(range(1, 9),
         |      i -> (subs.sub[i] - cents.csub[i]) * (subs.sub[i] - cents.csub[i]))) AS d2
         |  FROM subs JOIN cents ON subs.s = cents.s
         |), codes AS (
         |  SELECT vec_id, s, cent_id AS cid FROM (
         |    SELECT vec_id, s, cent_id,
         |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cent_id) AS rn
         |    FROM cand) WHERE rn = 1
         |), n AS (SELECT COUNT(*) AS n_vectors FROM e),
         |cr AS (SELECT COUNT(*) AS code_rows FROM codes)
         |SELECT tier, n_vectors, rows_stored, bits_per_vec, total_bits, ratio_ppm
         |FROM (
         |  SELECT 'fp64' AS tier, n_vectors, n_vectors AS rows_stored,
         |    CAST(4096 AS BIGINT) AS bits_per_vec,
         |    n_vectors * 4096 AS total_bits, CAST(1000000 AS BIGINT) AS ratio_ppm
         |  FROM n
         |  UNION ALL
         |  SELECT 'int8_sym', n_vectors, n_vectors, CAST(576 AS BIGINT),
         |    n_vectors * 576, CAST(140625 AS BIGINT)
         |  FROM n
         |  UNION ALL
         |  SELECT 'ivfpq_codes', n.n_vectors, cr.code_rows, CAST(35 AS BIGINT),
         |    n.n_vectors * 35, CAST(8544 AS BIGINT)
         |  FROM n, cr
         |)
         |ORDER BY bits_per_vec DESC""".stripMargin,
    // the re-rank replays the SAME trained chain (shared CTE text),
    // shortlists the ADC top-R, fetches those R vectors BY ID (the
    // joins back to e), exact-scores only them, and re-ranks
    "sim_ann_ivfpq_rerank" ->
      s"""$duckIvfPqTrainedCtes
         |, short AS (
         |  SELECT q_id, cand_id, arn FROM (
         |    SELECT q_id, cand_id,
         |      CAST(row_number() OVER (PARTITION BY q_id
         |        ORDER BY adc, cand_id) AS INTEGER) AS arn
         |    FROM adc)
         |  WHERE arn <= $RerankR
         |), rr AS (
         |  SELECT s.q_id, s.cand_id, s.arn,
         |    list_sum(list_transform(range(1, 65),
         |      i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS d2
         |  FROM short s
         |  JOIN e q ON q.vec_id = s.q_id
         |  JOIN e c ON c.vec_id = s.cand_id
         |), reranked AS (
         |  SELECT q_id, cand_id, arn, d2,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |      ORDER BY d2, cand_id) AS INTEGER) AS rn
         |  FROM rr
         |)
         |SELECT r.q_id, r.rn, r.cand_id, ROUND(r.d2, 6) AS d2, r.arn,
         |  (x.q_id IS NOT NULL) AS in_exact3
         |FROM reranked r LEFT JOIN exact3 x
         |  ON r.q_id = x.q_id AND r.cand_id = x.cand_id
         |WHERE r.rn <= 3
         |ORDER BY r.q_id, r.rn""".stripMargin,
    // the R sweep scores the shortlist ONCE at max R and reads each
    // tier off the single scored frame — the Spark plan's pinned-
    // exchange shape, replayed
    "sim_ann_ivfpq_rerank_sweep" ->
      s"""$duckIvfPqTrainedCtes
         |, short AS (
         |  SELECT q_id, cand_id, arn FROM (
         |    SELECT q_id, cand_id,
         |      CAST(row_number() OVER (PARTITION BY q_id
         |        ORDER BY adc, cand_id) AS INTEGER) AS arn
         |    FROM adc)
         |  WHERE arn <= ${RerankSweepR.max}
         |), rr AS (
         |  SELECT s.q_id, s.cand_id, s.arn,
         |    list_sum(list_transform(range(1, 65),
         |      i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS d2
         |  FROM short s
         |  JOIN e q ON q.vec_id = s.q_id
         |  JOIN e c ON c.vec_id = s.cand_id
         |), nex AS (SELECT COUNT(*) AS n_exact FROM exact3),
         |rs(rerank_r) AS (VALUES ${RerankSweepR.map(r => s"($r)").mkString(", ")}),
         |per AS (
         |  SELECT t.rerank_r,
         |    (SELECT COUNT(*) FROM rr WHERE arn <= t.rerank_r) AS n_scored,
         |    (SELECT COUNT(*) FROM (
         |       SELECT q_id, cand_id FROM (
         |         SELECT q_id, cand_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY d2, cand_id) AS rn
         |         FROM rr WHERE arn <= t.rerank_r)
         |       WHERE rn <= 3) z
         |     JOIN exact3 x ON z.q_id = x.q_id AND z.cand_id = x.cand_id)
         |      AS n_hits
         |  FROM rs t
         |)
         |SELECT CAST(rerank_r AS INTEGER) AS rerank_r,
         |  CAST(n_scored AS BIGINT) AS n_scored,
         |  CAST(n_hits AS BIGINT) AS n_hits,
         |  CASE WHEN nex.n_exact = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(n_hits * 1000000 // nex.n_exact AS BIGINT)
         |  END AS recall_ppm
         |FROM per CROSS JOIN nex
         |ORDER BY rerank_r""".stripMargin,
    // the sweep replays the same train ∘ assign ∘ encode CTEs, scores
    // once over the prn ≤ 4 cells with the candidate's cell-rank
    // attached (a candidate lives in exactly one cell), and reads the
    // three probe depths off that single ADC frame — the Spark plan's
    // shape, replayed
    "sim_ann_ivfpq_sweep" ->
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
         |), subs AS (
         |  SELECT vec_id, s, v[(s*8+1):(s*8+8)] AS sub
         |  FROM e, (SELECT unnest(range(0, 8)) AS s)
         |), pcents AS (
         |  SELECT s, vec_id AS cent_id, sub AS csub FROM subs WHERE vec_id < 16
         |), pcand AS (
         |  SELECT subs.vec_id, subs.s, pcents.cent_id,
         |    list_sum(list_transform(range(1, 9),
         |      i -> (subs.sub[i] - pcents.csub[i]) * (subs.sub[i] - pcents.csub[i]))) AS d2
         |  FROM subs JOIN pcents ON subs.s = pcents.s
         |), codes AS (
         |  SELECT vec_id AS cand_id, s, cid FROM (
         |    SELECT vec_id, s, cent_id AS cid,
         |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cent_id) AS rn
         |    FROM pcand) WHERE rn = 1
         |), probedAll AS (
         |  SELECT q_id, cluster, prn FROM (
         |    SELECT q.vec_id AS q_id, newc.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${duckCos("q.v", "newc.cv")} DESC, newc.cent_id) AS prn
         |    FROM e q CROSS JOIN newc WHERE q.vec_id < $NQueries)
         |  WHERE prn <= 4
         |), luts AS (
         |  SELECT subs.vec_id AS q_id, subs.s, pcents.cent_id,
         |    CAST(ROUND(list_sum(list_transform(range(1, 9),
         |      i -> (subs.sub[i] - pcents.csub[i]) * (subs.sub[i] - pcents.csub[i]))), 6)
         |      AS DECIMAL(18,6)) AS pd2
         |  FROM subs JOIN pcents ON subs.s = pcents.s
         |  WHERE subs.vec_id < $NQueries
         |), adc AS (
         |  SELECT p.q_id, c.cand_id, SUM(l.pd2) AS adc, MIN(p.prn) AS prn
         |  FROM probedAll p
         |  JOIN a2 ON a2.cluster = p.cluster
         |  JOIN codes c ON c.cand_id = a2.vec_id
         |  JOIN luts l ON l.q_id = p.q_id AND l.s = c.s AND l.cent_id = c.cid
         |  WHERE p.q_id <> c.cand_id
         |  GROUP BY p.q_id, c.cand_id
         |), exact3 AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        list_sum(list_transform(range(1, 65),
         |          i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))), c.vec_id) AS xrn
         |    FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < $NQueries) WHERE xrn <= 3
         |), nex AS (SELECT COUNT(*) AS n_exact FROM exact3),
         |probes(nprobe) AS (VALUES (1), (2), (4)),
         |per AS (
         |  SELECT pr.nprobe,
         |    (SELECT COUNT(*) FROM adc WHERE prn <= pr.nprobe) AS n_candidates,
         |    (SELECT COUNT(*) FROM (
         |       SELECT q_id, cand_id FROM (
         |         SELECT q_id, cand_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY adc, cand_id) AS rn
         |         FROM adc WHERE prn <= pr.nprobe)
         |       WHERE rn <= 3) t
         |     JOIN exact3 x ON t.q_id = x.q_id AND t.cand_id = x.cand_id)
         |      AS n_hits
         |  FROM probes pr
         |)
         |SELECT CAST(nprobe AS INTEGER) AS nprobe,
         |  CAST(n_candidates AS BIGINT) AS n_candidates,
         |  CAST(n_hits AS BIGINT) AS n_hits,
         |  CASE WHEN nex.n_exact = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(n_hits * 1000000 // nex.n_exact AS BIGINT)
         |  END AS recall_ppm
         |FROM per CROSS JOIN nex
         |ORDER BY nprobe""".stripMargin,
    "sim_ann_ivf_sweep" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), cents AS (
         |  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < $NCentroids
         |), assigned AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT e.vec_id, e.v, cents.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckCos("e.v", "cents.cv")} DESC, cents.cent_id) AS crn
         |    FROM e CROSS JOIN cents)
         |  WHERE crn = 1
         |), qc AS (
         |  SELECT q.vec_id AS q_id, q.v AS qv, cents.cent_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${duckCos("q.v", "cents.cv")} DESC, cents.cent_id) AS prn
         |  FROM e q CROSS JOIN cents WHERE q.vec_id < $NQueries
         |), cand AS (
         |  SELECT qc.q_id, c.vec_id AS cand_id,
         |    ROUND(${duckCos("qc.qv", "c.v")}, 6) AS cos, qc.prn
         |  FROM qc JOIN assigned c
         |    ON qc.cent_id = c.cluster AND qc.q_id <> c.vec_id
         |), exact AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(${duckCos("q.v", "c.v")}, 6) DESC, c.vec_id) AS rn
         |    FROM e q JOIN e c ON q.vec_id < $NQueries AND q.vec_id <> c.vec_id)
         |  WHERE rn <= 3
         |), nex AS (SELECT COUNT(*) AS n_exact FROM exact),
         |probes(nprobe) AS (VALUES (1), (2), (4)),
         |per AS (
         |  SELECT p.nprobe,
         |    (SELECT COUNT(*) FROM cand WHERE prn <= p.nprobe) AS n_candidates,
         |    (SELECT COUNT(*) FROM (
         |       SELECT q_id, cand_id FROM (
         |         SELECT q_id, cand_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY cos DESC, cand_id) AS rn
         |         FROM cand WHERE prn <= p.nprobe)
         |       WHERE rn <= 3) t
         |     JOIN exact ON t.q_id = exact.q_id AND t.cand_id = exact.cand_id)
         |      AS n_hits
         |  FROM probes p
         |)
         |SELECT CAST(nprobe AS INTEGER) AS nprobe,
         |  CAST(n_candidates AS BIGINT) AS n_candidates,
         |  CAST(n_hits AS BIGINT) AS n_hits,
         |  CASE WHEN nex.n_exact = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(n_hits * 1000000 // nex.n_exact AS BIGINT)
         |  END AS recall_ppm
         |FROM per CROSS JOIN nex
         |ORDER BY nprobe""".stripMargin,
    // trained codebook -> refined clusters differ from the seed form's,
    // so this replays train ∘ assign ∘ probe under its own hash
    "sim_ann_ivf_kmeans" ->
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
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT e.vec_id, e.v, newc.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckCos("e.v", "newc.cv")} DESC, newc.cent_id) AS crn
         |    FROM e CROSS JOIN newc)
         |  WHERE crn = 1
         |), scored AS (
         |  SELECT q.vec_id AS q_id, q.cluster, c.vec_id AS cand_id,
         |    ROUND(${duckCos("q.v", "c.v")}, 6) AS cos
         |  FROM a2 q JOIN a2 c
         |    ON q.cluster = c.cluster AND q.vec_id < $NQueries AND q.vec_id <> c.vec_id
         |), ranked AS (
         |  SELECT q_id, cluster, cand_id, cos,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS INTEGER) AS rn
         |  FROM scored
         |)
         |SELECT q_id, cluster, rn, cand_id, cos FROM ranked WHERE rn <= 3
         |ORDER BY q_id, rn""".stripMargin,
  )

  private def simAnnIvfSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), cents AS (
       |  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < $NCentroids
       |), assigned AS (
       |  SELECT vec_id, v, cluster FROM (
       |    SELECT e.vec_id, e.v, cents.cent_id AS cluster,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${duckCos("e.v", "cents.cv")} DESC, cents.cent_id) AS crn
       |    FROM e CROSS JOIN cents)
       |  WHERE crn = 1
       |), scored AS (
       |  SELECT q.vec_id AS q_id, q.cluster, c.vec_id AS cand_id,
       |    ROUND(${duckCos("q.v", "c.v")}, 6) AS cos
       |  FROM assigned q JOIN assigned c
       |    ON q.cluster = c.cluster AND q.vec_id < $NQueries AND q.vec_id <> c.vec_id
       |), ranked AS (
       |  SELECT q_id, cluster, cand_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS INTEGER) AS rn
       |  FROM scored
       |)
       |SELECT q_id, cluster, rn, cand_id, cos FROM ranked WHERE rn <= 3
       |ORDER BY q_id, rn""".stripMargin
}
