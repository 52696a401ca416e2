package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** Brute-force and LSH-bucketed retrieval: exact cosine top-k (the
  * exactness baseline), hard negatives, matryoshka truncation, int8
  * symmetric quantization, random-hyperplane LSH with multiprobe, and the
  * probe operating table.
  *
  * Mechanically moved from the former monolithic Similarity.scala (round
  * 11); behavior-identical — proved by the normalized plan-identity diff
  * and the untouched CORRECTNESS hashes.
  */

trait SimilarityBrute extends SimilarityCore {

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
  protected val MrlDims = Seq(8, 16, 32)

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

  protected def bruteQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim_ann_int8"    -> (simAnnInt8 _),
    "sim_hard_negatives" -> (simHardNegatives _),
    "sim_matryoshka"  -> (simMatryoshka _),
    "sim_cosine_topk" -> (simCosineTopk _),
    "sim_ann_rplsh"   -> (simAnnRpLsh _),
    "sim_ann_multiprobe" -> (simAnnMultiprobe _),
    "sim_ann_probe_sweep" -> (simAnnProbeSweep _),

  )

  protected def bruteOracles: Map[String, String] = Map(

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

  )

}
