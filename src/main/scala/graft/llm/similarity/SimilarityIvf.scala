package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** The IVF family: seed and Lloyd-trained coarse codebooks,
  * aggregate-argmax assignment, in-query / standing-index / append probes,
  * and the nprobe operating table.
  *
  * Mechanically moved from the former monolithic Similarity.scala (round
  * 11); behavior-identical — proved by the normalized plan-identity diff
  * and the untouched CORRECTNESS hashes.
  */

trait SimilarityIvf extends SimilarityBrute {

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
  protected def ivfAssignedOf(emb: DataFrame): DataFrame =
    ivfAssignTo(ivfCentroidsOf(emb), emb)

  /** The frozen codebook: the NCentroids seed vectors (registered model
    * metadata — at deployment these come from a training run, here the
    * first k vec_ids stand in).
    */
  protected def ivfCentroidsOf(emb: DataFrame): DataFrame =
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
  protected def ivfAssignTo(cents: DataFrame, vecs: DataFrame): DataFrame =
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
  protected def ivfProbe(assigned: DataFrame): DataFrame = {
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
  protected val ivfIndexMemo = scala.collection.mutable.Map[String, String]()

  protected def materializedIvfIndex(spark: SparkSession, sfDir: String): String =
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
  protected def lloydRefine(assigned: DataFrame): DataFrame =
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

  /** FROZEN vs RETRAIN-ON-FORGET for the ANN coarse codebook —
    * `forget_gate_drift`'s policy question asked of the INDEX: after a
    * takedown (vec_id ≥ 100 ∧ ≡ 7 mod 23 — clear of the query ids and
    * the codebook seeds, so both artifacts stay well-defined), does the
    * deployment have to retrain its Lloyd-trained coarse codebook, or
    * can it keep serving the frozen one over the survivors? Two
    * complete chains, both probing ONLY survivors and both graded
    * against the SURVIVOR-corpus exact truth: `frozen` assigns
    * survivors to the full-corpus-trained codebook (the standing
    * artifact after a file-level cascade — `AnnForgetSpec`'s zones);
    * `retrained` re-runs the Lloyd round on the survivors. `moved_ppm`
    * is the assignment drift (survivors whose cell changed) — the blast
    * radius a retrain would impose on the posting lists, priced next to
    * what it buys in recall. Both chains replay end-to-end in the
    * oracle under one hash. MEASURED at sf0.01: recall IDENTICAL
    * (24/30 both) while a retrain would move 3.5% of survivors' cells
    * (moved_ppm = 35 196) — freezing is free on this corpus and
    * retraining would rewrite 3.5% of the posting lists for nothing;
    * the same honest-instrument pattern as `forget_gate_drift` (where
    * the measured drift was non-trivial and cut the other way).
    */
  def simAnnForgetDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val surv = emb.filter(!(col("vec_id") >= 100 && col("vec_id") % 23 === 7))
    val frozen = lloydRefine(ivfAssignTo(ivfCentroidsOf(emb), emb))
    val retrained = lloydRefine(ivfAssignTo(ivfCentroidsOf(surv), surv))
    val q0 = surv.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val byCos = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    val exact3 = surv.select(col("vec_id").as("cand_id"), col("e").as("ce"))
      .crossJoin(broadcast(q0))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("cos", round(cosine(col("qe"), col("ce")), 6))
      .withColumn("rn", row_number().over(byCos))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("cand_id"), lit(1).as("hit"))
    val nExact = exact3.agg(count(lit(1)).as("n_exact"))
    val asgF = ivfAssignTo(frozen, surv)
    val asgR = ivfAssignTo(retrained, surv)
    val movedPpm = asgF.select(col("vec_id"), col("cluster").as("cf"))
      .join(asgR.select(col("vec_id"), col("cluster").as("cr")), Seq("vec_id"))
      .agg(count(lit(1)).as("n_surv"),
        count(when(col("cf") =!= col("cr"), lit(1))).as("n_moved"))
      .select(expr("CASE WHEN n_surv = 0 THEN CAST(0 AS BIGINT) " +
        "ELSE n_moved * 1000000 div n_surv END").as("moved_ppm"))
    def variantRow(name: String, asg: DataFrame): DataFrame = {
      val qv = asg.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("e").as("qe"), col("cluster"))
      val cv = asg.select(col("vec_id").as("cand_id"), col("e").as("ce"),
        col("cluster"))
      val cands = cv.join(broadcast(qv), Seq("cluster"))
        .filter(col("q_id") =!= col("cand_id"))
      val top3 = cands
        .withColumn("cos", round(cosine(col("qe"), col("ce")), 6))
        .withColumn("rn", row_number().over(byCos))
        .filter(col("rn") <= 3)
      val hits = top3.join(exact3, Seq("q_id", "cand_id"), "left")
        .agg(count(col("hit")).as("n_hits"))
      cands.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(hits).crossJoin(broadcast(nExact))
        .select(lit(name).as("variant"), col("n_candidates"), col("n_hits"),
          expr("CASE WHEN n_exact = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE n_hits * 1000000 div n_exact END").as("recall_ppm"))
    }
    variantRow("frozen", asgF).withColumn("moved_ppm", lit(0L))
      .unionAll(variantRow("retrained", asgR).crossJoin(broadcast(movedPpm)))
      .orderBy("variant")
  }

  protected def simAnnIvfSql: String =
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

  protected def ivfQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim_ann_ivf"     -> (simAnnIvf _),
    "sim_ann_ivf_indexed" -> (simAnnIvfIndexed _),
    "sim_ann_ivf_append" -> (simAnnIvfAppend _),
    "sim_ann_ivf_indexed_append" -> (simAnnIvfIndexedAppend _),
    "sim_ann_ivf_kmeans" -> (simAnnIvfKmeans _),
    "sim_ann_ivf_sweep" -> (simAnnIvfSweep _),
    "sim_ann_forget_drift" -> (simAnnForgetDrift _),

  )

  protected def ivfOracles: Map[String, String] = Map(


    // both chains replayed end-to-end: full-corpus Lloyd (frozen) and
    // survivor Lloyd (retrained) assign the SURVIVORS, probe own-cell,
    // and grade against the survivor-corpus exact truth; moved_ppm
    // compares the two assignments
    "sim_ann_forget_drift" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), surv AS (
         |  SELECT * FROM e WHERE NOT (vec_id >= 100 AND vec_id % 23 = 7)
         |), cents AS (
         |  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < $NCentroids
         |), a1f AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT e.vec_id, e.v, cents.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckCos("e.v", "cents.cv")} DESC, cents.cent_id) AS crn
         |    FROM e CROSS JOIN cents)
         |  WHERE crn = 1
         |), mF AS (
         |  SELECT cluster, unnest(range(0, len(v))) AS pos, unnest(v) AS val FROM a1f
         |), meansF AS (
         |  SELECT cluster, pos, ROUND(AVG(val), 6) AS c FROM mF GROUP BY cluster, pos
         |), newcF AS (
         |  SELECT cluster AS cent_id, list(c ORDER BY pos) AS cv FROM meansF GROUP BY cluster
         |), a1r AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT s.vec_id, s.v, cents.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${duckCos("s.v", "cents.cv")} DESC, cents.cent_id) AS crn
         |    FROM surv s CROSS JOIN cents)
         |  WHERE crn = 1
         |), mR AS (
         |  SELECT cluster, unnest(range(0, len(v))) AS pos, unnest(v) AS val FROM a1r
         |), meansR AS (
         |  SELECT cluster, pos, ROUND(AVG(val), 6) AS c FROM mR GROUP BY cluster, pos
         |), newcR AS (
         |  SELECT cluster AS cent_id, list(c ORDER BY pos) AS cv FROM meansR GROUP BY cluster
         |), asgF AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT s.vec_id, s.v, n.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${duckCos("s.v", "n.cv")} DESC, n.cent_id) AS crn
         |    FROM surv s CROSS JOIN newcF n)
         |  WHERE crn = 1
         |), asgR AS (
         |  SELECT vec_id, v, cluster FROM (
         |    SELECT s.vec_id, s.v, n.cent_id AS cluster,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${duckCos("s.v", "n.cv")} DESC, n.cent_id) AS crn
         |    FROM surv s CROSS JOIN newcR n)
         |  WHERE crn = 1
         |), x3 AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ROUND(${duckCos("q.v", "c.v")}, 6) DESC, c.vec_id) AS rn
         |    FROM surv q JOIN surv c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < $NQueries) WHERE rn <= 3
         |), nex AS (SELECT COUNT(*) AS n_exact FROM x3),
         |nsurv AS (SELECT COUNT(*) AS n_surv FROM surv),
         |moved AS (
         |  SELECT COUNT(*) AS n_moved FROM asgF f JOIN asgR r
         |    ON f.vec_id = r.vec_id AND f.cluster <> r.cluster
         |), candsF AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |    ROUND(${duckCos("q.v", "c.v")}, 6) AS cos
         |  FROM asgF q JOIN asgF c
         |    ON q.cluster = c.cluster AND q.vec_id < $NQueries AND q.vec_id <> c.vec_id
         |), topF AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q_id, cand_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
         |    FROM candsF) WHERE rn <= 3
         |), candsR AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |    ROUND(${duckCos("q.v", "c.v")}, 6) AS cos
         |  FROM asgR q JOIN asgR c
         |    ON q.cluster = c.cluster AND q.vec_id < $NQueries AND q.vec_id <> c.vec_id
         |), topR AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q_id, cand_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rn
         |    FROM candsR) WHERE rn <= 3
         |), perF AS (
         |  SELECT (SELECT COUNT(*) FROM candsF) AS n_candidates,
         |    (SELECT COUNT(*) FROM topF t JOIN x3
         |       ON t.q_id = x3.q_id AND t.cand_id = x3.cand_id) AS n_hits
         |), perR AS (
         |  SELECT (SELECT COUNT(*) FROM candsR) AS n_candidates,
         |    (SELECT COUNT(*) FROM topR t JOIN x3
         |       ON t.q_id = x3.q_id AND t.cand_id = x3.cand_id) AS n_hits
         |)
         |SELECT variant, n_candidates, n_hits, recall_ppm, moved_ppm FROM (
         |  SELECT 'frozen' AS variant,
         |    CAST(n_candidates AS BIGINT) AS n_candidates,
         |    CAST(n_hits AS BIGINT) AS n_hits,
         |    CASE WHEN nex.n_exact = 0 THEN CAST(0 AS BIGINT)
         |         ELSE CAST(n_hits * 1000000 // nex.n_exact AS BIGINT)
         |    END AS recall_ppm,
         |    CAST(0 AS BIGINT) AS moved_ppm
         |  FROM perF CROSS JOIN nex
         |  UNION ALL
         |  SELECT 'retrained',
         |    CAST(n_candidates AS BIGINT), CAST(n_hits AS BIGINT),
         |    CASE WHEN nex.n_exact = 0 THEN CAST(0 AS BIGINT)
         |         ELSE CAST(n_hits * 1000000 // nex.n_exact AS BIGINT)
         |    END,
         |    CASE WHEN nsurv.n_surv = 0 THEN CAST(0 AS BIGINT)
         |         ELSE CAST(moved.n_moved * 1000000 // nsurv.n_surv AS BIGINT)
         |    END
         |  FROM perR CROSS JOIN nex CROSS JOIN nsurv CROSS JOIN moved
         |)
         |ORDER BY variant""".stripMargin,
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

}
