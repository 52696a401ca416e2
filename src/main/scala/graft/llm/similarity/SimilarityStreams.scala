package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** Streaming index maintenance: the ANN assignment zone, the
  * semantic-dedup verdict zone, and the IVF-PQ codes zone — arriving
  * batches encode against frozen registry codebooks; probes share the
  * batch query tails.
  *
  * Mechanically moved from the former monolithic Similarity.scala (round
  * 11); behavior-identical — proved by the normalized plan-identity diff
  * and the untouched CORRECTNESS hashes.
  */

trait SimilarityStreams extends SimilarityIvfPq with SimilarityEmbDedup {

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
          // cluster-clustered layout WITHIN each generation: probes prune
          // the codes scan to the probed cells (`In(cluster, …)` pushed
          // by the readers), and row-group min/max stats only skip when
          // like clusters sit together — `ScaleProbe annwave` measured
          // the unsorted zone forcing a full codes scan per probe wave
          .repartitionByRange(col("cluster"), col("cand_id"))
          .sortWithinPartitions("cluster", "cand_id")
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
      prunedCodes(spark, indexDir, emb, coarse))
  }


}
