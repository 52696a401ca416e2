package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** The compressed-index family: PQ encode, ADC search, composed IVF-PQ
  * (seed / trained / residual), the nprobe / codebook-size / re-rank
  * operating tables, and the index-footprint report.
  *
  * Mechanically moved from the former monolithic Similarity.scala (round
  * 11); behavior-identical — proved by the normalized plan-identity diff
  * and the untouched CORRECTNESS hashes.
  */

trait SimilarityIvfPq extends SimilarityIvf {

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
  protected val PqM = 8 // subspaces

  protected val PqD = 8 // dims per subspace

  protected val PqK = 16 // centroids per codebook

  /** (vec_id, s, sub): every vector split into its PqM subvectors. */
  protected def pqSubs(spark: SparkSession, sfDir: String): DataFrame =
    pqSubsOf(embDouble(Tables.embeddings(spark, sfDir)))

  /** The subvector split over an arbitrary (vec_id, e) frame — the
    * static corpus ([[pqSubs]]) and arriving stream batches
    * ([[ivfPqIndexStream]]) share this one pass. */
  protected def pqSubsOf(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${PqM - 1}), s -> slice(e, s*$PqD+1, $PqD))")))
      .select(col("vec_id"), col("pos").as("s"), col("col").as("sub"))

  /** Per-subspace codebooks: the first-PqK seed subvectors (stand-in for a
    * trained k-means — emb_kmeans is the loop that would refine them). */
  protected def pqCents(subs: DataFrame): DataFrame =
    subs.filter(col("vec_id") < PqK)
      .select(col("s"), col("vec_id").as("cent_id"), col("sub").as("csub"))

  /** Subvector L2² as a sequential fold — same accumulation order as the
    * oracle's list_sum, so the doubles are bit-identical. */
  protected val pqSubD2 =
    graft.functions.VectorExpressions.l2_sq(col("sub"), col("csub"))

  /** PQ assignment in long form: (vec_id, s, cid, d2r) — nearest centroid
    * per (vector, subspace) via struct-min (d2 first, centroid id as the
    * cross-engine tiebreak), residual rounded onto the 6dp decimal grid. */
  protected def pqCodes(subs: DataFrame): DataFrame =
    pqCodesAgainst(subs, pqCents(subs))

  /** The encode against an ARBITRARY per-subspace codebook (cols: s,
    * cent_id, csub) — seed codebooks ([[pqCodes]]) and Lloyd-trained
    * ones ([[pqCentsTrained]]) share this one pass. */
  protected def pqCodesAgainst(subs: DataFrame, cents: DataFrame): DataFrame =
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
  protected def pqCentsTrained(subs: DataFrame): DataFrame =
    pqCentsTrainedFrom(subs, pqCents(subs))

  /** The per-subspace Lloyd round against an ARBITRARY seed codebook —
    * the default PqK = 16 path ([[pqCentsTrained]]) and the
    * codebook-size sweep ([[simAnnIvfPqKsweep]]'s K ∈ {4, 8, 16}
    * branches) share it. */
  protected def pqCentsTrainedFrom(subs: DataFrame, seeds: DataFrame): DataFrame = {
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
    * streamed generation, off the artifact listing). Deployment
    * honesty: when the exact RE-RANK stage is enabled
    * (`sim_ann_ivfpq_rerank_zone`) the fp64 zone is still STORED —
    * the codes zone accelerates search (it is what the scan touches
    * per query), it does not replace the vector zone, whose reads
    * drop to R×queries rows per wave through the cell-keyed layout. */
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
    val l2 = graft.functions.VectorExpressions.l2_sq(col("qe"), col("ce"))
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
  protected val IvfPqNprobe = 2

  /** Every query's coarse cells ranked by cosine — the ONE probe-set
    * builder the IVF-PQ variants share. Columns: (q_id, cluster, prn,
    * rq = the query's residual against that cell's centroid); callers
    * filter prn to their nprobe and prune the columns they don't use
    * (Catalyst drops the residual arithmetic when rq is unreferenced). */
  protected def probedCellsOf(emb: DataFrame, coarse: DataFrame): DataFrame = {
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

  protected def ivfPqProbe(
      spark: SparkSession, sfDir: String, trainedPq: Boolean): DataFrame = {
    val (emb, subs, coarse, pqCb, postings) = ivfPqIndexOf(spark, sfDir, trainedPq)
    ivfPqProbeOver(emb, subs, coarse, pqCb, postings)
  }

  /** The assembled IVF-PQ index pieces — (emb, subs, coarse codebook, PQ
    * codebook, posting lists) — shared by the probe queries and the
    * re-rank family so every variant prices the SAME index build.
    * Posting lists are (cluster, cand_id, s, cid): codes only past the
    * encode, the fp64 vector column dies here. */
  protected def ivfPqIndexOf(
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
  protected def ivfPqProbeOver(
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
  protected def ivfPqAdcOver(
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
  protected val RerankR = 10

  /** Shortlist depths the re-rank operating table prices. */
  protected val RerankSweepR = Seq(3, 10, 30)

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
  protected def rerankScored(emb: DataFrame, adc: DataFrame, maxR: Int): DataFrame = {
    val byAdc = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    val shortlist = adc.withColumn("arn", row_number().over(byAdc))
      .filter(col("arn") <= maxR)
      .select(col("q_id"), col("cand_id"), col("arn"))
    val qv = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val l2 = graft.functions.VectorExpressions.l2_sq(col("qe"), col("ce"))
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

  /** (JVM, corpus-fingerprint) → the CELL-KEYED standing fp64 vector
    * zone — the fetch-side artifact of an IVF-PQ deployment, beside the
    * codes zone `ivfPqIndexStream` maintains. Layout is the probe's
    * measured lesson (`ScaleProbe rerank`, SCRATCH_r11): hash shards
    * and id order both read the WHOLE zone for a random shortlist
    * (uniform ids land in every row group), while cluster order serves
    * the probed-cells filter as a row-group range read — ~nprobe/k of
    * the zone — because shortlists are cell-local BY CONSTRUCTION. So
    * the zone is range-partitioned and sorted by (cluster, vec_id),
    * built once per corpus fingerprint via the atomic-rename
    * discipline (the `materializedIvfIndex` memo pattern). */
  protected val vectorZoneMemo = scala.collection.mutable.Map[String, String]()

  protected def materializedVectorZone(spark: SparkSession, sfDir: String): String =
    vectorZoneMemo.synchronized {
      val key = s"$sfDir@${Bpe.corpusFingerprint(spark, sfDir, "embeddings.parquet")}"
      vectorZoneMemo.getOrElseUpdate(key, {
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val emb = embDouble(Tables.embeddings(spark, sfDir))
        val coarse = lloydRefine(ivfAssignTo(ivfCentroidsOf(emb), emb))
        graft.Fs.writeParquetAtomic(
          ivfAssignTo(coarse, emb)
            .repartitionByRange(col("cluster"), col("vec_id"))
            .sortWithinPartitions("cluster", "vec_id"),
          java.nio.file.Paths.get(
            sys.props("java.io.tmpdir"), "graft_sim", digest, "vector_zone"))
      })
    }

  /** [[simAnnIvfPqRerank]] with the fp64 fetch served by the STANDING
    * cell-keyed vector zone ([[materializedVectorZone]]) instead of an
    * in-query frame — the TRUE production wave: the query's probed
    * cells (nprobe × queries values, bounded BY CONSTRUCTION) become a
    * literal pushed-down filter on the zone's cluster key, so the scan
    * reads only the probed cells' row groups, and the broadcast
    * shortlist join narrows to exactly R rows per query inside them.
    * Shares `sim_ann_ivfpq_rerank`'s oracle VERBATIM (the oracle never
    * sees the zone round-trip) — one hash pins zone-fetched ≡ in-query;
    * `PlanSpec` pins the pushed `In(cluster, …)` on the zone scan.
    * First invocation per JVM pays the zone build into the memo;
    * Bench's min-of-two records the warm zone-fetch cost. */
  def simAnnIvfPqRerankZone(spark: SparkSession, sfDir: String): DataFrame = {
    val (emb, subs, coarse, pqCb, postings) =
      ivfPqIndexOf(spark, sfDir, trainedPq = true)
    rerankFromZoneOver(spark, sfDir, emb, coarse,
      ivfPqAdcOver(emb, subs, coarse, pqCb, postings),
      spark.read.parquet(materializedVectorZone(spark, sfDir)))
  }

  /** The zone-fetch re-rank tail over an ARBITRARY ADC frame — the
    * in-query index build ([[simAnnIvfPqRerankZone]]) and the
    * all-standing-artifacts path ([[rerankFromIndexes]]) share it, so
    * "the production wave is the same query" holds by construction.
    * The fp64 zone frame is INJECTED (`zone`): production callers pass
    * the manifest-resolved generation so hard-delete epochs redirect
    * the fetch; only the in-query benchmark entry defaults to the
    * JVM-lifetime memo (advisor-caught — the memo key is the corpus
    * fingerprint, which a zone-level cascade does not change). */
  private def rerankFromZoneOver(
      spark: SparkSession, sfDir: String,
      emb: DataFrame, coarse: DataFrame, adc: DataFrame,
      zone0: DataFrame): DataFrame = {
    val byAdc = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    val shortlist = adc.withColumn("arn", row_number().over(byAdc))
      .filter(col("arn") <= RerankR)
      .select(col("q_id"), col("cand_id"), col("arn"))
    val cells = probedCellsOf(emb, coarse)
      .filter(col("prn") <= IvfPqNprobe)
      .select("cluster").distinct().collect().map(_.getLong(0))
    val zone = zone0
      .filter(col("cluster").isin(cells: _*))
      .select(col("vec_id").as("cand_id"), col("e").as("ce"))
    val qv = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val l2 = graft.functions.VectorExpressions.l2_sq(col("qe"), col("ce"))
    val byD2 = Window.partitionBy("q_id").orderBy(col("d2").asc, col("cand_id"))
    zone.join(broadcast(shortlist), Seq("cand_id"))
      .join(broadcast(qv), Seq("q_id"))
      .withColumn("d2", l2)
      .withColumn("rn", row_number().over(byD2))
      .filter(col("rn") <= 3)
      .join(exact3Of(emb), Seq("q_id", "cand_id"), "left")
      .select(col("q_id"), col("rn"), col("cand_id"),
        round(col("d2"), 6).as("d2"), col("arn"),
        coalesce(col("hit"), lit(false)).as("in_exact3"))
      .orderBy("q_id", "rn")
  }

  /** The re-rank wave over ONLY standing artifacts — ADC candidates from
    * the STREAMED codes zone ([[ivfPqIndexStream]]'s output, exactly as
    * [[ivfPqProbeFromIndex]] reads it) and the fp64 fetch from the
    * CELL-KEYED vector zone: nothing in the hot path recomputes the
    * index (the codebooks are the frozen registry artifacts both zones
    * were built against, rebuilt here only as the bounded broadcast
    * side). `StreamingIvfPqSpec` pins this ≡ the in-query
    * `sim_ann_ivfpq_rerank_zone` ≡ the batch re-rank — the full
    * deployment loop (streamed codes + standing vectors + re-rank)
    * closed under one equality chain.
    *
    * BOTH standing zones are injectable: the codes via `indexDir`, the
    * fp64 vector zone via `vectorZoneManifest` — resolved through
    * [[graft.sources.Maintenance.readZoneThroughManifest]] under the
    * zone name `"vectors"` (the `AnnForgetSpec` epoch convention), so a
    * manifested hard-delete epoch redirects the re-rank fetch the same
    * commit it redirects the probe. Absent a manifest, the fetch falls
    * back to the JVM-lifetime corpus-fingerprint memo — the benchmark
    * default only, never the post-takedown read path.
    *
    * `asOfEpoch` composes epoch TIME TRAVEL with the fetch: the week
    * after a bad hard-delete, the rollback read is this same wave
    * pointed at the pre-delete epoch — the manifest machinery keeps the
    * superseded vectors generation inside the keep-N window precisely
    * so this call can serve it ([[graft.sources.Maintenance.epochAsOf]]
    * semantics, named failure past retention). */
  def rerankFromIndexes(
      spark: SparkSession, sfDir: String, indexDir: String,
      vectorZoneManifest: Option[java.io.File] = None,
      asOfEpoch: Long = Long.MaxValue): DataFrame = {
    val emb = embDouble(Tables.embeddings(spark, sfDir))
    val coarse = lloydRefine(ivfAssignTo(ivfCentroidsOf(emb), emb))
    val subs = pqSubs(spark, sfDir)
    // codes scan pruned to the probed cells (pushed In(cluster, …)) —
    // the same discipline as the vector-zone fetch below
    val adc = ivfPqAdcOver(emb, subs, coarse, pqCentsTrained(subs),
      prunedCodes(spark, indexDir, emb, coarse))
    val zone = vectorZoneManifest match {
      case Some(m) =>
        graft.sources.Maintenance.readZoneThroughManifest(
          spark, m, "vectors", asOfEpoch)
      case None =>
        spark.read.parquet(materializedVectorZone(spark, sfDir))
    }
    rerankFromZoneOver(spark, sfDir, emb, coarse, adc, zone)
  }

  /** The standing codes zone pruned to the query wave's probed cells —
    * a literal pushed-down `In(cluster, …)` (the cells list is bounded
    * BY CONSTRUCTION: nprobe × queries values), so the parquet reader
    * skips every non-probed cell's row groups in the cluster-clustered
    * generations `ivfPqIndexStream` writes. Before this, pruning
    * happened only in the ADC's broadcast join — correct, but AFTER a
    * full codes scan; `ScaleProbe annwave` at 10⁷ vectors measured
    * that scan dominating the probe-only wave. The ADC's join still
    * attaches q_id per cell; the filter is a strict superset of it. */
  private[llm] def prunedCodes(
      spark: SparkSession, indexDir: String,
      emb: DataFrame, coarse: DataFrame): DataFrame = {
    val cells = probedCellsOf(emb, coarse)
      .filter(col("prn") <= IvfPqNprobe)
      .select("cluster").distinct().collect().map(_.getLong(0))
    spark.read.parquet(s"$indexDir/codes")
      .filter(col("cluster").isin(cells: _*))
      .select("cluster", "cand_id", "s", "cid")
  }

  /** Probe depths the re-rank × nprobe cross table prices. */
  protected val RerankNprobes = Seq(1, 2, 4)

  /** The ADC candidate frame over the prn ≤ maxNprobe cells WITH each
    * candidate's cell-rank attached (a candidate lives in exactly one
    * cell, so MIN(prn) is its rank) — the one-scoring-pass builder the
    * cross table reads its nprobe tiers off. Kept SEPARATE from
    * [[ivfPqAdcOver]] on purpose: the shipped probe/re-rank plans must
    * not change shape (plan identity), and pruning an unused min(prn)
    * out of a shared aggregate is exactly the Catalyst edge this
    * avoids. */
  protected def ivfPqAdcRanked(
      emb: DataFrame, subs: DataFrame, coarse: DataFrame,
      pqCb: DataFrame, postings: DataFrame, maxNprobe: Int): DataFrame = {
    val probed = probedCellsOf(emb, coarse)
      .filter(col("prn") <= maxNprobe)
      .select(col("q_id"), col("cluster"), col("prn"))
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
      .agg(sum(col("pd2")).as("adc"), min(col("prn")).as("prn"))
  }

  /** The re-rank × nprobe CROSS TABLE — the question the two existing
    * sweeps leave open, answered: the ADC nprobe sweep measured that
    * widening the probe set HURT (6 → 5 → 3 hits: quantized scores let
    * far-cell noise evict true neighbors), and the R sweep measured
    * that exact re-rank repairs the shortlist's ORDER. This table asks
    * whether re-rank also repairs the WIDENING: for nprobe ∈
    * [[RerankNprobes]] at fixed R = 30, ADC-shortlist within the probed
    * cells, by-id fetch, exact re-rank, hits vs the fp64 truth. NOT
    * provably monotone in nprobe — a wider candidate pool can evict a
    * true neighbor from the ADC top-R before the exact stage ever sees
    * it (shortlist MEMBERSHIP is still quantized even when order is
    * exact) — so the table is an honest measurement either way: hits
    * rising says re-rank inverts the nprobe lesson (spend nprobe freely
    * once R is paid); hits falling says R must scale with nprobe.
    * MEASURED at sf0.01: 18 → 19 → 19 of 30 as nprobe grows 1 → 2 → 4.
    * Two lessons in one row set: (1) re-rank REPAIRS the ADC collapse —
    * the ADC-only sweep FELL 6 → 5 → 3 over these same cells, the
    * re-ranked curve never falls; (2) at fixed R the curve is nearly
    * FLAT — widening 2 → 4 cells buys nothing because R = 30 covers a
    * shrinking fraction of the candidate pool (~50% of one cell, ~12%
    * of four) and shortlist MEMBERSHIP, not order, becomes the binding
    * constraint. Spend R before nprobe on this corpus: R took 7 → 19
    * at fixed nprobe (the R sweep) while nprobe takes 18 → 19 at fixed
    * R. One scoring pass over the prn ≤ 4 cells
    * ([[ivfPqAdcRanked]], pinned exchange); each tier filters to its
    * cells, shortlists at R, and pays its own bounded fetch. */
  def simAnnIvfPqRerankNprobe(spark: SparkSession, sfDir: String): DataFrame = {
    val (emb, subs, coarse, pqCb, postings) =
      ivfPqIndexOf(spark, sfDir, trainedPq = true)
    val adc = ivfPqAdcRanked(emb, subs, coarse, pqCb, postings,
        RerankNprobes.max)
      // pinned: ONE train ∘ encode ∘ ADC pass feeds every tier
      .repartition(col("q_id"))
    val exact3 = exact3Of(emb)
    val nExact = exact3.agg(count(lit(1)).as("n_exact"))
    val byD2 = Window.partitionBy("q_id").orderBy(col("d2").asc, col("cand_id"))
    val rows = RerankNprobes.map { p =>
      rerankScored(emb, adc.filter(col("prn") <= p).select("q_id", "cand_id", "adc"),
          RerankSweepR.max)
        .withColumn("rn", row_number().over(byD2))
        .join(exact3, Seq("q_id", "cand_id"), "left")
        .agg(count(lit(1)).as("n_scored"),
          count(when(col("rn") <= 3, col("hit"))).as("n_hits"))
        .crossJoin(broadcast(nExact))
        .select(lit(p).as("nprobe"), lit(RerankSweepR.max).as("rerank_r"),
          col("n_scored"), col("n_hits"),
          expr("CASE WHEN n_exact = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE n_hits * 1000000 div n_exact END").as("recall_ppm"))
    }
    rows.reduce(_.unionAll(_)).orderBy("nprobe")
  }

  /** The trained IVF-PQ chain through the ADC candidate frame plus the
    * fp64 exact-top-3 truth, as DuckDB CTE text (`WITH e AS … adc AS
    * (…), exact3 AS (…)`) — shared VERBATIM by the `sim_ann_ivfpq_trained`
    * and re-rank oracles, so every member of the family replays the same
    * train(coarse) ∘ train(PQ) ∘ assign ∘ encode ∘ ADC chain; callers
    * append their own read-off CTEs and final SELECT. At the default
    * arguments the emitted text is byte-identical to the shared form;
    * the cross table widens the probe set and carries each candidate's
    * cell-rank (`prn`, via MIN over its single cell) through the ADC
    * frame. */
  protected def duckIvfPqTrainedCtes: String =
    duckIvfPqTrainedCtesAt(IvfPqNprobe, carryPrn = false)

  protected def duckIvfPqTrainedCtesAt(maxNprobe: Int, carryPrn: Boolean): String =
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
       |  SELECT q_id, cluster${if (carryPrn) ", prn" else ""} FROM (
       |    SELECT q.vec_id AS q_id, newc.cent_id AS cluster,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${duckCos("q.v", "newc.cv")} DESC, newc.cent_id) AS prn
       |    FROM e q CROSS JOIN newc WHERE q.vec_id < $NQueries)
       |  WHERE prn <= $maxNprobe
       |), luts2 AS (
       |  SELECT subs.vec_id AS q_id, subs.s, pnewc.cent_id,
       |    CAST(ROUND(list_sum(list_transform(range(1, 9),
       |      i -> (subs.sub[i] - pnewc.csub[i]) * (subs.sub[i] - pnewc.csub[i]))), 6)
       |      AS DECIMAL(18,6)) AS pd2
       |  FROM subs JOIN pnewc ON subs.s = pnewc.s
       |  WHERE subs.vec_id < $NQueries
       |), adc AS (
       |  SELECT p.q_id, c.cand_id, SUM(l.pd2) AS adc${
            if (carryPrn) ", MIN(p.prn) AS prn" else ""}
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

  protected def ivfPqQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "emb_pq" -> (embPq _),
    "sim_ann_pq" -> (simAnnPq _),
    "sim_ann_ivfpq" -> (simAnnIvfPq _),
    "sim_ann_ivfpq_sweep" -> (simAnnIvfPqSweep _),
    "sim_ann_ivfpq_trained" -> (simAnnIvfPqTrained _),
    "sim_ann_ivfpq_residual" -> (simAnnIvfPqResidual _),
    "sim_ann_ivfpq_ksweep" -> (simAnnIvfPqKsweep _),
    "sim_ann_ivfpq_rerank" -> (simAnnIvfPqRerank _),
    "sim_ann_ivfpq_rerank_sweep" -> (simAnnIvfPqRerankSweep _),
    "sim_ann_ivfpq_rerank_nprobe" -> (simAnnIvfPqRerankNprobe _),
    "sim_ann_ivfpq_rerank_zone" -> (simAnnIvfPqRerankZone _),
    "sim_index_footprint" -> (simIndexFootprint _),

  )

  /** The re-rank oracle — shared VERBATIM by the in-query
    * `sim_ann_ivfpq_rerank` and the zone-fetched
    * `sim_ann_ivfpq_rerank_zone` (the oracle never sees the standing
    * zone round-trip, so one hash pins zone ≡ in-query). */
  protected def duckIvfPqRerankSql: String =
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
         |ORDER BY r.q_id, r.rn""".stripMargin

  protected def ivfPqOracles: Map[String, String] = Map(

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
    "sim_ann_ivfpq_rerank" -> duckIvfPqRerankSql,
    "sim_ann_ivfpq_rerank_zone" -> duckIvfPqRerankSql,
    // the cross table replays the trained chain ONCE over the prn ≤ 4
    // cells with each candidate's cell-rank carried through the ADC
    // frame, then reads each nprobe tier off it — shortlist at R within
    // the tier's cells, exact re-rank, hits vs the fp64 truth
    "sim_ann_ivfpq_rerank_nprobe" ->
      s"""${duckIvfPqTrainedCtesAt(RerankNprobes.max, carryPrn = true)}
         |, nex AS (SELECT COUNT(*) AS n_exact FROM exact3),
         |ps(nprobe) AS (VALUES ${RerankNprobes.map(p => s"($p)").mkString(", ")}),
         |short AS (
         |  SELECT nprobe, q_id, cand_id FROM (
         |    SELECT t.nprobe, a.q_id, a.cand_id,
         |      row_number() OVER (PARTITION BY t.nprobe, a.q_id
         |        ORDER BY a.adc, a.cand_id) AS arn
         |    FROM ps t JOIN adc a ON a.prn <= t.nprobe)
         |  WHERE arn <= ${RerankSweepR.max}
         |), rr AS (
         |  SELECT s.nprobe, s.q_id, s.cand_id,
         |    list_sum(list_transform(range(1, 65),
         |      i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS d2
         |  FROM short s
         |  JOIN e q ON q.vec_id = s.q_id
         |  JOIN e c ON c.vec_id = s.cand_id
         |), rk AS (
         |  SELECT nprobe, q_id, cand_id,
         |    row_number() OVER (PARTITION BY nprobe, q_id
         |      ORDER BY d2, cand_id) AS rn
         |  FROM rr
         |), per AS (
         |  SELECT nprobe, COUNT(*) AS n_scored FROM short GROUP BY nprobe
         |), hits AS (
         |  SELECT rk.nprobe, COUNT(*) AS n_hits
         |  FROM rk JOIN exact3 x
         |    ON rk.q_id = x.q_id AND rk.cand_id = x.cand_id
         |  WHERE rk.rn <= 3 GROUP BY rk.nprobe
         |)
         |SELECT CAST(per.nprobe AS INTEGER) AS nprobe,
         |  CAST(${RerankSweepR.max} AS INTEGER) AS rerank_r,
         |  CAST(per.n_scored AS BIGINT) AS n_scored,
         |  CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
         |  CASE WHEN nex.n_exact = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(COALESCE(hits.n_hits, 0) * 1000000 // nex.n_exact AS BIGINT)
         |  END AS recall_ppm
         |FROM per LEFT JOIN hits ON per.nprobe = hits.nprobe
         |CROSS JOIN nex
         |ORDER BY nprobe""".stripMargin,
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

  )

}
