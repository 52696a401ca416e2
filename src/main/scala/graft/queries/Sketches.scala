package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic streaming sketches with EXACT oracles — normally sketch
  * output is "approximate, rows-only", but with frozen md5-derived hash
  * functions (graft.functions.Hashing — bit-identical in Spark and DuckDB)
  * the sketch state itself is a pure function of the data, so the oracle
  * can rebuild the identical counters/bits and the gate hash-checks both
  * the estimates AND their error behavior.
  *
  * Scale design (the reason sketches exist at 100 TB): both sketches build
  * with one explode(d)/explode(k) + groupBy over FIXED-size state (256
  * counters / 16 words) — map-side combinable, mergeable across
  * partitions, days, or clusters by cell-wise sum / word-wise OR, with
  * estimate error bounds independent of corpus size (CMS overestimate
  * ≤ εN with ε = e/width; Bloom false-positive rate (1−e^(−kn/m))^k).
  */
object Sketches extends QueryModule {

  val CmsDepth = 4
  val CmsWidth = 64
  val BloomBits = 1024
  val BloomHashes = 3
  val BloomWords: Int = BloomBits / 32

  /** Count-Min sketch over the lineitem part-key stream, probed for parts
    * 1..10: estimate = min over the d rows of the hashed-cell counter,
    * reported against the true count (est ≥ true always — CMS never
    * underestimates; the gap rows are the hash-collision evidence).
    */
  /** The d hashed cells of one key — shared by batch build, probes, and
    * the streaming incremental build (cell-wise sums merge: CMS state is
    * additive, `StreamingSketchSpec` proves merged ≡ batch executably).
    */
  def cmsCells(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array((0 until CmsDepth).map { i =>
      struct(lit(i).as("i"),
        pmod(Hashing.hash60(concat_ws(":", lit(i), key)), lit(CmsWidth)).as("cell"))
    }: _*)

  /** CMS counters (i, cell, cnt) of a keyed frame. */
  def cmsOf(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
    df.select(explode(cmsCells(key)).as("h"))
      .groupBy(col("h.i").as("i"), col("h.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))

  def sketchCms(spark: SparkSession, sfDir: String): DataFrame = {
    val cms = cmsOf(Tables.lineitem(spark, sfDir), col("l_partkey"))
    val probes = spark.range(1, 11).select(col("id").as("probe_key"))
      .select(col("probe_key"), explode(cmsCells(col("probe_key"))).as("h"))
      .select(col("probe_key"), col("h.i").as("i"), col("h.cell").as("cell"))
    val truth = Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey").between(1, 10))
      .groupBy(col("l_partkey").as("probe_key"))
      .agg(count(lit(1)).as("true_cnt"))
    probes.join(cms, Seq("i", "cell"), "left")
      .groupBy("probe_key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
      .join(truth, Seq("probe_key"), "left")
      .select(
        col("probe_key"),
        coalesce(col("true_cnt"), lit(0L)).as("true_cnt"),
        col("est_cnt"),
        (col("est_cnt") >= coalesce(col("true_cnt"), lit(0L))).as("never_under"))
      .orderBy("probe_key")
  }

  /** Bloom filter over the customer key set (32×32-bit words via bit_or —
    * 32-bit words because a 1<<63 mask overflows DuckDB's signed shift
    * check; same filter, different packing),
    * probed with 10 present keys and 10 absent ones: claimed membership =
    * all k bits set. No false negatives by construction; any
    * claimed ∧ ¬actual row is a measured false positive.
    */
  def sketchBloom(spark: SparkSession, sfDir: String): DataFrame = {
    def bitCells(key: org.apache.spark.sql.Column) =
      (0 until BloomHashes).map { i =>
        pmod(Hashing.hash60(concat_ws(":", lit(i), key)), lit(BloomBits))
      }
    val custBits = Tables.customer(spark, sfDir)
      .select(explode(array(bitCells(col("c_custkey")): _*)).as("bit"))
      .select((col("bit") / 32).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))").as("mask"))
      .groupBy("word")
      .agg(bit_or(col("mask")).as("bits"))
    // 10 keys present at every SF (custkeys start at 1) + 10 far outside
    val probes = spark.range(1, 11).select(col("id").as("probe_key"))
      .union(spark.range(9000001, 9000011).select(col("id").as("probe_key")))
    val probeBits = probes
      .select(col("probe_key"), explode(array(bitCells(col("probe_key")): _*)).as("bit"))
      .select(col("probe_key"),
        (col("bit") / 32).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))").as("mask"))
    val claimed = probeBits.join(custBits, Seq("word"), "left")
      .withColumn("hit", (coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask"))) =!= 0)
      .groupBy("probe_key")
      .agg(min(col("hit")).as("claimed")) // AND of the k bit tests
    val actual = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("probe_key")).distinct()
      .withColumn("actual", lit(true))
    claimed.join(actual, Seq("probe_key"), "left")
      .select(
        col("probe_key"), col("claimed"),
        coalesce(col("actual"), lit(false)).as("actual"),
        (col("claimed") && !coalesce(col("actual"), lit(false))).as("false_positive"))
      .orderBy("probe_key")
  }

  val KmvK = 32

  /** KMV (k-minimum-values) distinct-count sketch per return flag: keep the
    * k smallest 60-bit hashes of the distinct keys; estimate
    * (k−1)·2⁶⁰ ∕ h₍ₖ₎. Deterministic given the frozen hash family, so the
    * oracle rebuilds the identical estimate — reported beside the true
    * distinct count and their ratio (the measured relative error of a
    * 32-slot sketch). At scale the k-smallest state is a per-partition
    * top-k (map-side combinable, merged by re-taking the k smallest), the
    * same O(k) mergeable-state discipline as TopKAggregator.
    */
  def sketchKmv(spark: SparkSession, sfDir: String): DataFrame = {
    val byHash = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy("h")
    val hashes = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .select(col("l_returnflag"), Hashing.hash60(col("l_partkey").cast("string")).as("h"))
    val kth = hashes
      .withColumn("rn", row_number().over(byHash))
      .filter(col("rn") === KmvK)
      .select(col("l_returnflag"), col("h").as("hk"))
    val truth = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("true_distinct"))
    truth.join(kth, Seq("l_returnflag"))
      .select(
        col("l_returnflag"),
        col("true_distinct"),
        round(lit((KmvK - 1).toDouble) * lit(math.pow(2, 60)) / col("hk"), 4).as("est_distinct"),
        round(lit((KmvK - 1).toDouble) * lit(math.pow(2, 60)) / col("hk") / col("true_distinct"), 4).as("ratio"))
      .orderBy("l_returnflag")
  }

  /** KMV SET-OPERATION estimates — the reason KMV beats HyperLogLog when
    * audiences must be intersected: two signatures merge into the union's
    * signature (k smallest of the combined hash pool), and the fraction of
    * union-signature slots present in BOTH input signatures estimates
    * Jaccard; intersection ≈ Jaccard × union-estimate. Built on the
    * urgent-order vs low-priority-order customer audiences (Jaccard ≈
    * 0.75 — a real test of the estimator), reported beside the exact
    * truths —
    * hash-checked end to end because the frozen md5-derived hash family
    * makes the sketch deterministic. Scale shape: the signature build is a
    * typed bottom-k `Aggregator` (O(k) mergeable state, map-side
    * combined — the per-type global-hash-sort a window would plan never
    * happens); everything after operates on ≤2k rows. The constant-score
    * trick (`score = 0`) degenerates TopKAggregator's (score desc, id asc)
    * order to plain id asc, i.e. the k SMALLEST hashes.
    */
  def sketchKmvIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank
    val bottomK = udaf(new graft.functions.TopKAggregator(KmvK))
    val base = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority").as("pri"), col("o_custkey").as("user_id"))
      .distinct()
    val u = base.select(col("pri"),
      Hashing.hash60(col("user_id").cast("string")).as("h"))
    val sig = u.groupBy("pri")
      .agg(bottomK(lit(0.0), col("h")).as("sig"))
      .select(col("pri"), explode(col("sig")).as("s"))
      .select(col("pri"), col("s.id").as("h"))
    val sigA = sig.filter(col("pri") === "1-URGENT").select(col("h").as("ha"))
    val sigB = sig.filter(col("pri") === "5-LOW").select(col("h").as("hb"))
    // ≤ 2k distinct hashes by construction — bounded single-task pass
    val byH = org.apache.spark.sql.expressions.Window
      .partitionBy(BlockedRank.boundedPartition(col("h"))).orderBy("h")
    val usig = sig.select("h").distinct()
      .withColumn("rn", row_number().over(byH))
      .filter(col("rn") <= KmvK)
    val kth = usig.filter(col("rn") === KmvK).select(col("h").as("hk"))
    val overlap = usig
      .join(sigA, col("h") === col("ha"), "left_semi")
      .join(sigB, col("h") === col("hb"), "left_semi")
      .agg(count(lit(1)).as("overlap"))
    val truth = base.groupBy(col("user_id"))
      .agg(countDistinct(col("pri")).as("nt"))
      .agg(
        count(lit(1)).as("true_union"),
        sum(when(col("nt") === 2, 1).otherwise(0)).cast("long").as("true_intersect"))
    val estU = lit((KmvK - 1).toDouble) * lit(math.pow(2, 60)) / col("hk")
    truth.crossJoin(broadcast(kth)).crossJoin(broadcast(overlap))
      .select(
        lit(KmvK).as("k"),
        col("true_union"), col("true_intersect"), col("overlap"),
        round(estU, 4).as("est_union"),
        round(col("overlap").cast("double") / KmvK, 6).as("est_jaccard"),
        round(col("overlap").cast("double") / KmvK * estU, 4).as("est_intersect"))
  }

  val HistBins = 32
  val HistWidth = 3500.0 // covers l_extendedprice's [~900, ~110k] envelope

  /** Mergeable QUANTILE sketch — the equi-width histogram, the fourth
    * sketch family (CMS=frequency, Bloom=membership, KMV=distinct,
    * histogram=quantiles). State is 32 integer bin counts: map-side
    * combinable, mergeable across months/partitions/clusters by cell-wise
    * ADD — the build here goes data → per-MONTH partials → cell-merged
    * global, and the oracle builds the histogram directly, so hash
    * equality IS the merge≡direct proof (`mv_incremental`'s trick on
    * sketch state). Estimates p50/p90/p99 by linear interpolation inside
    * the covering bin — rank targets are exact integers (ceil(q·N)),
    * cumulative counts exact, one double division per quantile — and
    * reports the EXACT percentile beside the estimate: the output is the
    * sketch AND its measured error, hash-checked.
    */
  def sketchHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").as("p"),
        month(col("l_shipdate")).as("mo"))
      .withColumn("bin", least(floor(col("p") / HistWidth), lit(HistBins - 1)).cast("int"))
    val partials = li.groupBy("mo", "bin").agg(count(lit(1)).as("pc"))
    val merged = partials.groupBy("bin").agg(sum(col("pc")).as("c"))
    // HistBins fixed-width bins only — bounded by construction, marked
    // with the boundedPartition idiom for the PlanSpec window guard
    val byBin = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.operators.BlockedRank.boundedPartition(col("bin")))
      .orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = merged
      .withColumn("cum", sum(col("c")).over(byBin))
      .withColumn("cum_prev", col("cum") - col("c"))
    val qs = Seq(0.5, 0.9, 0.99)
    val quantsCol = explode(array(qs.map(lit): _*)).as("q")
    val n = li.agg(count(lit(1)).as("n_rows"))
    val exact = li.agg(
      expr("percentile(p, 0.5)").as("x50"),
      expr("percentile(p, 0.9)").as("x90"),
      expr("percentile(p, 0.99)").as("x99"))
    cum.crossJoin(broadcast(n)).select(col("*"), quantsCol)
      .withColumn("target", ceil(col("q") * col("n_rows")).cast("long"))
      .filter(col("cum") >= col("target") && col("cum_prev") < col("target"))
      .crossJoin(broadcast(exact))
      .select(
        col("q"), col("n_rows"), col("bin"),
        round(col("bin") * HistWidth
          + lit(HistWidth) * (col("target") - col("cum_prev")) / col("c"), 6).as("est"),
        round(
          when(col("q") === 0.5, col("x50"))
            .when(col("q") === 0.9, col("x90"))
            .otherwise(col("x99")), 6).as("exact"))
      .orderBy("q")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_cms"   -> (sketchCms _),
    "sketch_bloom" -> (sketchBloom _),
    "sketch_kmv"   -> (sketchKmv _),
    "sketch_kmv_intersect" -> (sketchKmvIntersect _),
    "sketch_histogram" -> (sketchHistogram _),
  )

  private val histogramOracle: String =
    s"""WITH li AS (
       |  SELECT l_extendedprice AS p,
       |    CAST(least(floor(l_extendedprice / $HistWidth), ${HistBins - 1}) AS INTEGER) AS bin
       |  FROM lineitem
       |), merged AS (
       |  SELECT bin, COUNT(*) AS c FROM li GROUP BY bin
       |), cum AS (
       |  SELECT bin, c,
       |    SUM(c) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    SUM(c) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS cum_prev
       |  FROM merged
       |), n AS (SELECT COUNT(*) AS n_rows FROM li),
       |ex AS (
       |  SELECT quantile_cont(p, 0.5) AS x50, quantile_cont(p, 0.9) AS x90,
       |         quantile_cont(p, 0.99) AS x99
       |  FROM li
       |), qq AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
       |t AS (
       |  SELECT q, n_rows, bin, c, cum, cum_prev,
       |    CAST(ceil(q * n_rows) AS BIGINT) AS target
       |  FROM cum CROSS JOIN n CROSS JOIN qq
       |)
       |SELECT q, n_rows, bin,
       |  ROUND(bin * $HistWidth + $HistWidth * (target - cum_prev) / c, 6) AS est,
       |  ROUND(CASE WHEN q = 0.5 THEN x50 WHEN q = 0.9 THEN x90 ELSE x99 END, 6) AS exact
       |FROM t CROSS JOIN ex
       |WHERE cum >= target AND cum_prev < target
       |ORDER BY q""".stripMargin

  override def oracles: Map[String, String] = {
    def duckCell(i: Int, keyExpr: String, m: Int): String =
      s"${Hashing.duckHash60(s"CAST($i AS VARCHAR) || ':' || CAST($keyExpr AS VARCHAR)")} % $m"
    val cmsRows = (0 until CmsDepth)
      .map(i => s"SELECT $i AS i, ${duckCell(i, "l_partkey", CmsWidth)} AS cell FROM lineitem")
      .mkString("\n  UNION ALL ")
    val cmsProbeRows = (0 until CmsDepth)
      .map(i => s"SELECT probe_key, $i AS i, ${duckCell(i, "probe_key", CmsWidth)} AS cell FROM pk")
      .mkString("\n  UNION ALL ")
    val bloomRows = (0 until BloomHashes)
      .map(i => s"SELECT ${duckCell(i, "c_custkey", BloomBits)} AS bit FROM customer")
      .mkString("\n  UNION ALL ")
    val bloomProbeRows = (0 until BloomHashes)
      .map(i => s"SELECT probe_key, ${duckCell(i, "probe_key", BloomBits)} AS bit FROM pk")
      .mkString("\n  UNION ALL ")
    Map(
      "sketch_kmv" ->
        s"""WITH dh AS (
           |  SELECT l_returnflag, ${Hashing.duckHash60("CAST(l_partkey AS VARCHAR)")} AS h
           |  FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem)
           |), kth AS (
           |  SELECT l_returnflag, h AS hk FROM (
           |    SELECT l_returnflag, h,
           |      row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
           |    FROM dh)
           |  WHERE rn = $KmvK
           |), truth AS (
           |  SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS true_distinct
           |  FROM lineitem GROUP BY l_returnflag
           |)
           |SELECT t.l_returnflag, t.true_distinct,
           |  ROUND(${(KmvK - 1).toDouble} * 1.152921504606846976E18 / kth.hk, 4) AS est_distinct,
           |  ROUND(${(KmvK - 1).toDouble} * 1.152921504606846976E18 / kth.hk / t.true_distinct, 4) AS ratio
           |FROM truth t JOIN kth ON t.l_returnflag = kth.l_returnflag
           |ORDER BY t.l_returnflag""".stripMargin,
      "sketch_kmv_intersect" ->
        s"""WITH u AS (
           |  SELECT DISTINCT o_orderpriority AS pri, o_custkey AS user_id FROM orders
           |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
           |), hh AS (
           |  SELECT pri, ${Hashing.duckHash60("CAST(user_id AS VARCHAR)")} AS h FROM u
           |), r AS (
           |  SELECT pri, h,
           |    row_number() OVER (PARTITION BY pri ORDER BY h) AS rn
           |  FROM hh
           |), sig AS (SELECT pri, h FROM r WHERE rn <= $KmvK
           |), ur AS (
           |  SELECT h, row_number() OVER (ORDER BY h) AS rn
           |  FROM (SELECT DISTINCT h FROM sig)
           |), usig AS (SELECT h, rn FROM ur WHERE rn <= $KmvK
           |), kth AS (SELECT h AS hk FROM usig WHERE rn = $KmvK
           |), ov AS (
           |  SELECT COUNT(*) AS "overlap" FROM usig
           |  WHERE h IN (SELECT h FROM sig WHERE pri = '1-URGENT')
           |    AND h IN (SELECT h FROM sig WHERE pri = '5-LOW')
           |), truth AS (
           |  SELECT COUNT(*) AS true_union,
           |    CAST(SUM(CASE WHEN nt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS true_intersect
           |  FROM (SELECT user_id, COUNT(DISTINCT pri) AS nt FROM u GROUP BY user_id)
           |)
           |SELECT CAST($KmvK AS INTEGER) AS k, true_union, true_intersect, "overlap",
           |  ROUND(${(KmvK - 1).toDouble} * 1.152921504606846976E18 / hk, 4) AS est_union,
           |  ROUND("overlap"::DOUBLE / $KmvK, 6) AS est_jaccard,
           |  ROUND("overlap"::DOUBLE / $KmvK
           |      * (${(KmvK - 1).toDouble} * 1.152921504606846976E18 / hk), 4) AS est_intersect
           |FROM truth CROSS JOIN kth CROSS JOIN ov""".stripMargin,
      "sketch_histogram" -> histogramOracle,
      "sketch_cms" ->
        s"""WITH h AS (
           |  $cmsRows
           |), cms AS (
           |  SELECT i, cell, COUNT(*) AS cnt FROM h GROUP BY i, cell
           |), pk AS (
           |  SELECT unnest(range(1, 11)) AS probe_key
           |), ph AS (
           |  $cmsProbeRows
           |), est AS (
           |  SELECT ph.probe_key,
           |    CAST(MIN(COALESCE(cms.cnt, 0)) AS BIGINT) AS est_cnt
           |  FROM ph LEFT JOIN cms ON ph.i = cms.i AND ph.cell = cms.cell
           |  GROUP BY ph.probe_key
           |), truth AS (
           |  SELECT l_partkey AS probe_key, COUNT(*) AS true_cnt
           |  FROM lineitem WHERE l_partkey BETWEEN 1 AND 10 GROUP BY l_partkey
           |)
           |SELECT est.probe_key,
           |  CAST(COALESCE(truth.true_cnt, 0) AS BIGINT) AS true_cnt,
           |  est.est_cnt,
           |  (est.est_cnt >= COALESCE(truth.true_cnt, 0)) AS never_under
           |FROM est LEFT JOIN truth ON est.probe_key = truth.probe_key
           |ORDER BY est.probe_key""".stripMargin,
      "sketch_bloom" ->
        s"""WITH cb AS (
           |  $bloomRows
           |), bloom AS (
           |  SELECT CAST(bit // 32 AS INTEGER) AS word,
           |    CAST(bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INTEGER)) AS BIGINT) AS bits
           |  FROM cb GROUP BY bit // 32
           |), pk AS (
           |  SELECT unnest(range(1, 11)) AS probe_key
           |  UNION ALL SELECT unnest(range(9000001, 9000011))
           |), pb AS (
           |  $bloomProbeRows
           |), claimed AS (
           |  SELECT pb.probe_key,
           |    MIN((COALESCE(bloom.bits, 0) & (CAST(1 AS BIGINT) << CAST(pb.bit % 32 AS INTEGER))) <> 0) AS claimed
           |  FROM pb LEFT JOIN bloom ON CAST(pb.bit // 32 AS INTEGER) = bloom.word
           |  GROUP BY pb.probe_key
           |), actual AS (
           |  SELECT DISTINCT c_custkey AS probe_key, TRUE AS actual FROM customer
           |)
           |SELECT claimed.probe_key, claimed.claimed,
           |  COALESCE(actual.actual, FALSE) AS actual,
           |  (claimed.claimed AND NOT COALESCE(actual.actual, FALSE)) AS false_positive
           |FROM claimed LEFT JOIN actual ON claimed.probe_key = actual.probe_key
           |ORDER BY claimed.probe_key""".stripMargin,
    )
  }
}
