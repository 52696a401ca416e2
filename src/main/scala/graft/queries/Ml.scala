package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.Hashing
import graft.operators.BlockedRank
import graft.operators.BlockedRank.{blockedPrefix, PrefixValue}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed model training + evaluation primitives (north-star EXT
  * tier): the quality-classifier feedback loop every curated corpus runs —
  * fit a model on corpus features, then grade classifier scores against
  * labels (AUC, confusion, calibration, lift). The reference pipeline has
  * no model stage at all (its transform is a field projection,
  * lambda/handler.ts:41-57); these are the operators that turn the engine
  * into a training-data refinery.
  *
  * Scale + determinism design:
  *  - training is mini-round BATCH GRADIENT DESCENT: each iteration is one
  *    map-side-combinable aggregate over the corpus producing d+1 scalar
  *    gradient sums (d = feature count). The shuffle carries d+1 decimals
  *    per partition — never rows. That is exactly how distributed GD runs
  *    at 100 TB (MLlib's treeAggregate shape); iterations are bounded
  *    driver actions of O(d) scalars, the CC-loop discipline.
  *  - every per-row quantity is EXACT decimal arithmetic on pinned grids
  *    (features on the 1e-4/1e-2 grid, residuals rounded to the micro
  *    grid), so gradient sums are order-independent and engine-identical;
  *    the one float step per iteration is the scalar weight update, done
  *    in IEEE double on both engines and re-quantized to micro via
  *    floor(x·1e6 + 0.5) — floor of an identical double, never round(),
  *    whose half-way behavior differs across engines (see winEwma's
  *    scaladoc for the measured failure mode).
  *  - evaluation metrics are INTEGER arithmetic end-to-end: rank-sums for
  *    AUC (Mann-Whitney with exact tie mid-ranks, doubled to stay
  *    integral), parts-per-million ratios via positive integer division
  *    (identical truncation in Spark's `div` and DuckDB's `//`). No float
  *    enters any metric.
  *  - global orderings (AUC rank-sum, lift deciles) run through
  *    [[BlockedRank.blockedPrefix]]: block partials + a bounded summary
  *    window — no unpartitioned window over a corpus-sized table.
  */
object Ml extends QueryModule {

  // ------------------------------------------------- linear model training

  /** GD iteration count for the registered query — enough to show real
    * convergence on the quantity→price relation while keeping the
    * oracle's CTE chain readable.
    */
  val GdIters = 5

  /** Feature grids, shared verbatim with the DuckDB oracle. Normalized so
    * every feature and the target sit in [0, ~1.1]: quantity/50, 10×
    * discount, price/100000 — constant scaling (never data-dependent
    * standardization, which would inject a float moment into the grid).
    */
  private val X1 = "CAST(CAST(l_quantity AS DECIMAL(9,2)) * 0.02 AS DECIMAL(6,4))"
  private val X2 = "CAST(CAST(l_discount AS DECIMAL(6,2)) * 10 AS DECIMAL(4,2))"
  private val Y  = "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 0.00001 AS DECIMAL(8,7))"

  private val Lr = 0.5

  /** One scalar weight update, identical expression tree in Scala and SQL:
    * w' = floor((w − lr·g/n)·1e6 + 0.5) back on the micro grid.
    */
  private def updateSql(w: String, g: String, n: String): String =
    s"CAST(CAST(FLOOR((CAST($w AS DOUBLE) - $Lr * (CAST($g AS DOUBLE) / CAST($n AS DOUBLE)))" +
      s" * 1000000.0 + 0.5) AS BIGINT) AS DECIMAL(13,0)) * CAST(0.000001 AS DECIMAL(7,6))"

  /** EXT: 5 iterations of exact-decimal batch gradient descent fitting
    * l_extendedprice from (l_quantity, l_discount) — one row per
    * iteration with the updated weights and the gradient sums that
    * produced them. The learned slope on x1 recovers the quantity×price
    * structure of the data (extendedprice = qty·unitprice); convergence is
    * visible as the gradient norms shrinking round over round.
    */
  def mlLinregGd(spark: SparkSession, sfDir: String): DataFrame = {
    // The projected feature grid is pinned across iterations: every round
    // re-reads 3 narrow decimal columns from executor cache instead of
    // re-scanning + re-casting the parquet (at 100 TB: persist to
    // MEMORY_AND_DISK_SER or a checkpoint — the per-round plan is the same).
    val feats = Tables.lineitem(spark, sfDir)
      .selectExpr(s"$X1 AS x1", s"$X2 AS x2", s"$Y AS y")
      .persist()
    var w1 = java.math.BigDecimal.valueOf(0, 6)
    var w2 = java.math.BigDecimal.valueOf(0, 6)
    var b  = java.math.BigDecimal.valueOf(0, 6)
    val out = Seq.newBuilder[(Int, Double, Double, Double, Double, Double, Double, Long)]
    for (iter <- 1 to GdIters) {
      val err =
        s"CAST(round(CAST($w1 AS DECIMAL(8,6)) * x1 + CAST($w2 AS DECIMAL(8,6)) * x2" +
          s" + CAST($b AS DECIMAL(8,6)) - y, 6) AS DECIMAL(11,6))"
      // d+1 scalars per iteration — the bounded driver action (see scaladoc)
      val r = feats.selectExpr(s"$err AS err", "x1", "x2")
        .selectExpr("count(1) AS n", "round(sum(err * x1), 6) AS g1",
          "round(sum(err * x2), 6) AS g2", "round(sum(err), 6) AS g0")
        .collect()(0)
      val n = r.getLong(0)
      val Seq(g1, g2, g0) = Seq(1, 2, 3).map(r.getDecimal)
      def upd(w: java.math.BigDecimal, g: java.math.BigDecimal): java.math.BigDecimal = {
        val x = w.doubleValue - Lr * (g.doubleValue / n.toDouble)
        java.math.BigDecimal.valueOf(math.floor(x * 1000000.0 + 0.5).toLong, 6)
      }
      w1 = upd(w1, g1); w2 = upd(w2, g2); b = upd(b, g0)
      out += ((iter, w1.doubleValue, w2.doubleValue, b.doubleValue,
        g1.doubleValue, g2.doubleValue, g0.doubleValue, n))
    }
    feats.unpersist(blocking = false)
    import spark.implicits._
    out.result()
      .toDF("iter", "w_qty", "w_disc", "bias", "g_qty", "g_disc", "g_bias", "n")
      .orderBy("iter")
  }

  private def gdOracle: String = {
    val ctes = Seq.newBuilder[String]
    ctes += s"f AS (SELECT $X1 AS x1, $X2 AS x2, $Y AS y FROM lineitem)"
    ctes += "w0 AS (SELECT CAST(0 AS DECIMAL(8,6)) AS w1, " +
      "CAST(0 AS DECIMAL(8,6)) AS w2, CAST(0 AS DECIMAL(8,6)) AS b)"
    for (i <- 1 to GdIters) {
      val p = s"w${i - 1}"
      ctes += s"""a$i AS (
         |  SELECT count(*) AS n, round(sum(err * x1), 6) AS g1,
         |         round(sum(err * x2), 6) AS g2, round(sum(err), 6) AS g0
         |  FROM (SELECT CAST(round(w.w1 * x1 + w.w2 * x2 + w.b - y, 6) AS DECIMAL(11,6)) AS err,
         |               x1, x2
         |        FROM f, $p w) t)""".stripMargin
      ctes += s"""w$i AS (
         |  SELECT CAST(${updateSql(s"$p.w1", s"a$i.g1", s"a$i.n")} AS DECIMAL(8,6)) AS w1,
         |         CAST(${updateSql(s"$p.w2", s"a$i.g2", s"a$i.n")} AS DECIMAL(8,6)) AS w2,
         |         CAST(${updateSql(s"$p.b",  s"a$i.g0", s"a$i.n")} AS DECIMAL(8,6)) AS b
         |  FROM $p, a$i)""".stripMargin
    }
    val rows = (1 to GdIters).map { i =>
      s"SELECT $i AS iter, CAST(w$i.w1 AS DOUBLE) AS w_qty, CAST(w$i.w2 AS DOUBLE) AS w_disc," +
        s" CAST(w$i.b AS DOUBLE) AS bias, CAST(a$i.g1 AS DOUBLE) AS g_qty," +
        s" CAST(a$i.g2 AS DOUBLE) AS g_disc, CAST(a$i.g0 AS DOUBLE) AS g_bias, a$i.n AS n" +
        s" FROM w$i, a$i"
    }.mkString(" UNION ALL ")
    ctes.result().mkString("WITH ", ",\n", "") +
      s"\nSELECT * FROM ($rows) ORDER BY iter"
  }

  // ------------------------------------------------- logistic regression

  /** Iterations for the logistic trainer. */
  val LogregIters = 5

  /** EXT: distributed logistic-regression training in PURE INTEGER
    * arithmetic — batch GD on documents features (length, word rate)
    * against the lang='en' label, with the logistic replaced by the
    * fast-sigmoid rational approximation σ(z) ≈ 1/2 + z/(2(1+|z|))
    * (classic "fast sigmoid"; pure arithmetic, no exp). Every quantity
    * lives on an integer grid: features in milli, weights/activations in
    * micro, so gradient sums are exact BIGINTs — bit-identical across
    * engines, partitionings and reruns, with no decimal machinery at all.
    * Negative-operand integer division never occurs: z uses an offset
    * (constant multiple of the divisor), the update uses explicit
    * sign-decomposition — both make Spark's trunc `div` and DuckDB's
    * floor `//` coincide. Per iteration: one map-side-combinable 3-sum
    * aggregate; the shuffle carries 3 longs per partition.
    */
  def mlLogregGd(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = Tables.documents(spark, sfDir)
      .selectExpr(s"$LogregFeats1 AS x1",
        s"${LogregFeats2} AS x2",
        s"$LogregLabel AS y")
      .persist()
    var w1 = 0L; var w2 = 0L; var b = 0L
    val out = Seq.newBuilder[(Int, Long, Long, Long, Long, Long, Long, Long)]
    for (iter <- 1 to LogregIters) {
      val r = feats
        .selectExpr(s"${logregErr(w1, w2, b)} AS e", "x1", "x2")
        .selectExpr("count(1) AS n", "sum(e * x1) AS g1", "sum(e * x2) AS g2", "sum(e) AS g0")
        .collect()(0)
      val n = r.getLong(0)
      val Seq(g1, g2, g0) = Seq(1, 2, 3).map(r.getLong)
      def upd(w: Long, g: Long): Long = w - LogregLr * g / (1000L * n) // Long / truncates = the SQL CASE
      w1 = upd(w1, g1); w2 = upd(w2, g2); b = upd(b, g0)
      out += ((iter, w1, w2, b, g1, g2, g0, n))
    }
    feats.unpersist(blocking = false)
    import spark.implicits._
    out.result()
      .toDF("iter", "w1_micro", "w2_micro", "b_micro", "g1", "g2", "g0", "n")
      .orderBy("iter")
  }

  private val LogregLr = 5L
  // doc length capped at 1000 chars -> milli units of [0,1]; the second
  // feature is words-per-char in milli (word count includes empty splits,
  // identical split semantics in both engines)
  private[graft] val LogregFeats1 = "least(n_chars, 1000)"
  // x2 single-sourced in BOTH renderings (Spark `div`, DuckDB `//`): a
  // feature-definition change edits exactly these two strings, so the
  // frozen and retrained gates can never silently train on different
  // features (review-caught duplication)
  private[graft] val LogregFeats2 =
    "(CAST(size(split(text, ' ')) AS BIGINT) * 1000) div greatest(n_chars, 1)"
  private[graft] val LogregFeats2Duck =
    "(CAST(len(string_split(text, ' ')) AS BIGINT) * 1000) // greatest(n_chars, 1)"
  private[graft] val LogregLabel = "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)"

  /** sig_micro = fast-sigmoid(z)·1e6, with z in micro from the
    * offset-guarded nano→micro division.
    */
  private[graft] def logregSig(w1: Long, w2: Long, b: Long): String = {
    val z = s"(($w1 * x1 + $w2 * x2 + 1000000000000000) div 1000 - 1000000000000 + $b)"
    s"""(500000 + (CASE WHEN $z < 0 THEN -1 ELSE 1 END)
       |  * ((abs($z) * 500000) div (1000000 + abs($z))))""".stripMargin
  }

  /** err_micro = sig_micro − y·1e6. */
  private def logregErr(w1: Long, w2: Long, b: Long): String =
    s"(${logregSig(w1, w2, b)} - y * 1000000)"

  /** DuckDB twin of [[logregSig]] — the one definition every logistic
    * oracle (plain and sweep) shares.
    */
  private[graft] def logregSigDuck(w1: String, w2: String, b: String): String = {
    val z = s"(($w1 * x1 + $w2 * x2 + 1000000000000000) // 1000 - 1000000000000 + $b)"
    s"""(500000 + (CASE WHEN $z < 0 THEN -1 ELSE 1 END)
       |  * ((abs($z) * 500000) // (1000000 + abs($z))))""".stripMargin
  }

  private def logregErrDuck(w1: String, w2: String, b: String): String =
    s"(${logregSigDuck(w1, w2, b)} - y * 1000000)"

  // ------------------------------------------------ hyperparameter sweep

  /** Sweep learning rates (micro-int update step factors) and iterations
    * for the batched trainer.
    */
  val SweepLrs: Seq[Long] = Seq(2L, 5L, 15L)
  val SweepIters = 3

  /** EXT: batched hyperparameter sweep — train THREE learning-rate
    * variants of the logistic model in the SAME corpus pass: each
    * iteration is still one map-side-combinable aggregate, now producing
    * 3 configs × 3 gradient sums (the shuffle carries 9 longs + a count
    * per partition). This is how a scan-bound sweep actually runs at
    * 100 TB — candidate models share every pass instead of multiplying
    * them; the candidate count, not the corpus, is the multiplier on
    * per-row work. A final shared pass scores training accuracy per
    * config. Output: one row per learning rate with final weights and
    * accuracy — the model-selection table. Same pure-BIGINT grids and
    * division guards as ml_logreg_gd.
    */
  def mlSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = Tables.documents(spark, sfDir)
      .selectExpr(s"$LogregFeats1 AS x1",
        s"${LogregFeats2} AS x2",
        s"$LogregLabel AS y")
      .persist()
    val idx = SweepLrs.indices
    var ws: Seq[(Long, Long, Long)] = SweepLrs.map(_ => (0L, 0L, 0L))
    for (_ <- 1 to SweepIters) {
      val errCols = idx.map(i => s"${logregErr(ws(i)._1, ws(i)._2, ws(i)._3)} AS e$i")
      val sums = idx.flatMap(i =>
        Seq(s"sum(e$i * x1) AS g1_$i", s"sum(e$i * x2) AS g2_$i", s"sum(e$i) AS g0_$i"))
      val r = feats
        .selectExpr((Seq("x1", "x2", "y") ++ errCols): _*)
        .selectExpr(("count(1) AS n" +: sums): _*)
        .collect()(0)
      val n = r.getLong(0)
      ws = idx.map { i =>
        val (w1, w2, b) = ws(i)
        val Seq(g1, g2, g0) = (0 to 2).map(j => r.getLong(1 + i * 3 + j))
        def upd(w: Long, g: Long): Long = w - SweepLrs(i) * g / (1000L * n)
        (upd(w1, g1), upd(w2, g2), upd(b, g0))
      }
    }
    val accCols = idx.map(i =>
      s"sum(CASE WHEN (${logregSig(ws(i)._1, ws(i)._2, ws(i)._3)} >= 500000) = (y = 1)" +
        s" THEN 1 ELSE 0 END) AS c$i")
    val accRow = feats.selectExpr(("count(1) AS n" +: accCols): _*).collect()(0)
    feats.unpersist(blocking = false)
    val n = accRow.getLong(0)
    import spark.implicits._
    idx.map { i =>
      val (w1, w2, b) = ws(i)
      (SweepLrs(i), w1, w2, b, accRow.getLong(1 + i) * 1000000L / n, n)
    }.toDF("lr", "w1_micro", "w2_micro", "b_micro", "train_acc_micro", "n")
      .orderBy("lr")
  }

  private def sweepOracle: String = {
    val ctes = Seq.newBuilder[String]
    ctes += s"""f AS (
       |  SELECT $LogregFeats1 AS x1,
       |         ${LogregFeats2Duck} AS x2,
       |         $LogregLabel AS y
       |  FROM documents)""".stripMargin
    for (i <- SweepLrs.indices) {
      val lr = SweepLrs(i)
      ctes += s"s${i}w0 AS (SELECT CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS b)"
      for (r <- 1 to SweepIters) {
        val p = s"s${i}w${r - 1}"
        ctes += s"""s${i}a$r AS (
           |  SELECT count(*) AS n, CAST(sum(e * x1) AS BIGINT) AS g1,
           |         CAST(sum(e * x2) AS BIGINT) AS g2, CAST(sum(e) AS BIGINT) AS g0
           |  FROM (SELECT (${logregSigDuck("w.w1", "w.w2", "w.b")} - y * 1000000) AS e, x1, x2
           |        FROM f, $p w) t)""".stripMargin
        def upd(w: String, g: String) =
          s"$w - (CASE WHEN $g < 0 THEN -((-($g) * $lr) // (1000 * s${i}a$r.n)) " +
            s"ELSE (($g) * $lr) // (1000 * s${i}a$r.n) END)"
        ctes += s"""s${i}w$r AS (
           |  SELECT CAST(${upd(s"$p.w1", s"s${i}a$r.g1")} AS BIGINT) AS w1,
           |         CAST(${upd(s"$p.w2", s"s${i}a$r.g2")} AS BIGINT) AS w2,
           |         CAST(${upd(s"$p.b", s"s${i}a$r.g0")} AS BIGINT) AS b
           |  FROM $p, s${i}a$r)""".stripMargin
      }
      ctes += s"""s${i}acc AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(CASE WHEN (${logregSigDuck(s"w.w1", s"w.w2", s"w.b")} >= 500000) = (y = 1)
         |             THEN 1 ELSE 0 END) AS BIGINT) AS c
         |  FROM f, s${i}w$SweepIters w)""".stripMargin
    }
    val rows = SweepLrs.indices.map { i =>
      s"SELECT CAST(${SweepLrs(i)} AS BIGINT) AS lr, w.w1 AS w1_micro, w.w2 AS w2_micro, w.b AS b_micro," +
        s" CAST(a.c * 1000000 // a.n AS BIGINT) AS train_acc_micro, a.n AS n" +
        s" FROM s${i}w$SweepIters w, s${i}acc a"
    }.mkString(" UNION ALL ")
    ctes.result().mkString("WITH ", ",\n", "") +
      s"\nSELECT * FROM ($rows) ORDER BY lr"
  }

  /** The logistic GD CTE chain (f, w0, a1..aK, w1..wK) over a caller-
    * supplied training-frame CTE — shared by the plain trainer oracle and
    * the curation-gate oracle (whose f is the hash-split training slice).
    */
  private[graft] def logregTrainCtes(fCte: String): Seq[String] =
    logregTrainCtesNamed("", fCte)

  /** [[logregTrainCtes]] with a caller-chosen CTE-name prefix ("" is the
    * original names), so one statement can hold TWO trainers — the forget
    * cascade's frozen-vs-retrained gate drift. The feature CTE must be
    * named `${prefix}f` by the caller.
    */
  private[graft] def logregTrainCtesNamed(px: String, fCte: String): Seq[String] = {
    val ctes = Seq.newBuilder[String]
    ctes += fCte
    ctes += s"${px}w0 AS (SELECT CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS b)"
    for (i <- 1 to LogregIters) {
      val p = s"${px}w${i - 1}"
      ctes += s"""${px}a$i AS (
         |  SELECT count(*) AS n, CAST(sum(e * x1) AS BIGINT) AS g1,
         |         CAST(sum(e * x2) AS BIGINT) AS g2, CAST(sum(e) AS BIGINT) AS g0
         |  FROM (SELECT ${logregErrDuck(s"w.w1", s"w.w2", s"w.b")} AS e, x1, x2
         |        FROM ${px}f, $p w) t)""".stripMargin
      def upd(w: String, g: String) =
        s"$w - (CASE WHEN $g < 0 THEN -((-($g) * $LogregLr) // (1000 * ${px}a$i.n)) " +
          s"ELSE (($g) * $LogregLr) // (1000 * ${px}a$i.n) END)"
      ctes += s"""${px}w$i AS (
         |  SELECT CAST(${upd(s"$p.w1", s"${px}a$i.g1")} AS BIGINT) AS w1,
         |         CAST(${upd(s"$p.w2", s"${px}a$i.g2")} AS BIGINT) AS w2,
         |         CAST(${upd(s"$p.b", s"${px}a$i.g0")} AS BIGINT) AS b
         |  FROM $p, ${px}a$i)""".stripMargin
    }
    ctes.result()
  }

  private def logregOracle: String = {
    val ctes = logregTrainCtes(
      s"""f AS (
         |  SELECT $LogregFeats1 AS x1,
         |         ${LogregFeats2Duck} AS x2,
         |         $LogregLabel AS y
         |  FROM documents)""".stripMargin)
    val rows = (1 to LogregIters).map { i =>
      s"SELECT $i AS iter, w$i.w1 AS w1_micro, w$i.w2 AS w2_micro, w$i.b AS b_micro," +
        s" a$i.g1 AS g1, a$i.g2 AS g2, a$i.g0 AS g0, a$i.n AS n FROM w$i, a$i"
    }.mkString(" UNION ALL ")
    ctes.mkString("WITH ", ",\n", "") +
      s"\nSELECT * FROM ($rows) ORDER BY iter"
  }

  // ------------------------------------------- classifier-scored curation

  /** Training split: docs whose 100-bucket identity hash falls below 80 —
    * the deterministic 80% train slice (sample_hash's gate family).
    */
  private[graft] val CurateTrainPct = 80L

  /** EXT: the fastText-style quality gate every production corpus runs,
    * composed from already-green parts: TRAIN the integer logistic
    * classifier (ml_logreg_gd's machinery — same features, label, integer
    * grids and division guards) on a deterministic 80% hash split, then
    * SCORE every document with the final weights and emit keep/drop with
    * per-source keep rates — the decision table a curation run acts on.
    *
    * The keep threshold is the TRAINING SPLIT'S BASE RATE (positive
    * fraction in ppm), not a fixed σ ≥ 0.5: five integer-GD iterations
    * from zero weights leave scores uncalibrated (on an imbalanced label
    * every score sits below 0.5 and a fixed threshold keeps nothing —
    * observed, not hypothetical), while "score above the prior" is the
    * standard uncalibrated-classifier gate and is exactly computable on
    * the micro grid from the same training pass.
    *
    * Scale shape: training is LogregIters map-side-combinable 3-sum
    * aggregates over the split (d+1 scalars to the driver per iteration —
    * the treeAggregate discipline; the prior rides along with iteration
    * 1's count at zero extra passes); scoring is ONE full-corpus
    * projection with the weights and threshold embedded as literals,
    * folded into a per-source count — no join, no shuffle beyond the
    * rollup. All-integer weights and fast-sigmoid make the gate
    * oracle-exact: DuckDB re-TRAINS on the same split, re-derives the
    * threshold, and re-scores, so a drift anywhere in the composition
    * breaks the hash.
    */
  /** Trained (w1, w2, b, threshold) per corpus — the model-registry memo
    * (graft.llm.Bpe's merge-table discipline): training is deterministic
    * and the weights are 4 scalars, exactly what a model file holds, so
    * a session trains once per corpus snapshot and every later scoring
    * pass is the deployment shape — apply the registered model. The
    * fingerprint invalidates on in-place corpus regeneration.
    */
  private val curateModelMemo =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long, Long, Long)]

  /** The GD loop over a prepared (x1, x2, y) feature frame — extracted so
    * callers can train on a FILTERED corpus (the forget cascade's
    * retrain-on-forget variant) with the identical arithmetic. The split
    * must be NON-EMPTY — fails fast with a diagnostic instead of a bare
    * divide-by-zero (an all-deleted train split is a caller-level
    * condition the cascade should surface, not mask).
    */
  private[graft] def logregTrain(feats0: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long) = {
    val feats = feats0.persist()
    var tw1 = 0L; var tw2 = 0L; var tb = 0L
    var thr = 0L
    for (iter <- 1 to LogregIters) {
      val r = feats
        .selectExpr(s"${logregErr(tw1, tw2, tb)} AS e", "x1", "x2", "y")
        .selectExpr("count(1) AS n", "sum(e * x1) AS g1", "sum(e * x2) AS g2",
          "sum(e) AS g0", "sum(y) AS p")
        .collect()(0) // d+2 scalars — bounded driver action
      val n = r.getLong(0)
      require(n > 0, "logregTrain: empty training split (all rows filtered away?)")
      def upd(w: Long, g: Long): Long = w - LogregLr * g / (1000L * n)
      tw1 = upd(tw1, r.getLong(1)); tw2 = upd(tw2, r.getLong(2)); tb = upd(tb, r.getLong(3))
      if (iter == 1) thr = r.getLong(4) * 1000000L / n // base rate, micro
    }
    feats.unpersist(blocking = false)
    (tw1, tw2, tb, thr)
  }

  /** The standard train-split feature frame over `docs`. */
  private[graft] def curateFeatsOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .filter(pmod(Hashing.hash60(col("doc_id").cast("string")), lit(100L)) < CurateTrainPct)
      .selectExpr(s"$LogregFeats1 AS x1",
        s"${LogregFeats2} AS x2",
        s"$LogregLabel AS y")

  /** The registered model for a corpus: (w1, w2, b, threshold) in micro —
    * trained on first request per corpus snapshot, then a registry hit.
    * Package-visible so downstream compositions (the refinery pass) score
    * with the SAME model the gate query reports on.
    */
  private[graft] def curateModel(
      spark: SparkSession, sfDir: String): (Long, Long, Long, Long) = {
    val key = s"$sfDir@${graft.llm.Bpe.corpusFingerprint(spark, sfDir)}"
    curateModelMemo.getOrElseUpdate(key,
      logregTrain(curateFeatsOf(Tables.documents(spark, sfDir))))
  }

  def curateClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    val (w1, w2, b, threshold) = curateModel(spark, sfDir)
    curateScoreOf(Tables.documents(spark, sfDir), w1, w2, b, threshold)
  }

  /** The scored full-corpus pass at GIVEN weights and threshold —
    * separated so crafted specs pin the keep decision against
    * hand-derived fast-sigmoid values (the mirror-oracle countermeasure
    * for the scoring half).
    */
  private[graft] def curateScoreOf(
      docs: DataFrame, w1: Long, w2: Long, b: Long, thresholdMicro: Long): DataFrame =
    docs
      .selectExpr("source", s"$LogregFeats1 AS x1",
        s"${LogregFeats2} AS x2",
        s"$LogregLabel AS y")
      .withColumn("keep", expr(s"${logregSig(w1, w2, b)} >= $thresholdMicro"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(when(col("keep") && col("y") === 1L, 1L).otherwise(0L)).as("n_keep_en"))
      .withColumn("keep_ppm", expr("n_keep * 1000000 div n_docs"))
      .orderBy("source")

  private def curateOracle: String = {
    val ctes = logregTrainCtes(
      s"""f AS (
         |  SELECT x1, x2, y FROM (
         |    SELECT $LogregFeats1 AS x1,
         |           ${LogregFeats2Duck} AS x2,
         |           $LogregLabel AS y,
         |           ${Hashing.duckHash60("CAST(doc_id AS VARCHAR)")} % 100 AS h
         |    FROM documents) WHERE h < $CurateTrainPct)""".stripMargin) ++ Seq(
      s"""th AS (
         |  SELECT CAST(CAST(sum(y) AS BIGINT) * 1000000 // count(*) AS BIGINT) AS t
         |  FROM f)""".stripMargin,
      s"""sc AS (
         |  SELECT source, $LogregFeats1 AS x1,
         |         ${LogregFeats2Duck} AS x2,
         |         $LogregLabel AS y
         |  FROM documents)""".stripMargin,
      s"""kp AS (
         |  SELECT sc.source, sc.y,
         |    (${logregSigDuck("w.w1", "w.w2", "w.b")} >= th.t) AS keep
         |  FROM sc, w$LogregIters w, th)""".stripMargin)
    ctes.mkString("WITH ", ",\n", "") +
      s"""
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST(SUM(CASE WHEN keep AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_en,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS keep_ppm
         |FROM kp GROUP BY source ORDER BY source""".stripMargin
  }

  /** Gate-threshold multipliers swept by [[curateThresholdSweep]], in
    * milli of the registered base-rate threshold.
    */
  private[graft] val ThresholdSweepMillis: Seq[Long] =
    Seq(500L, 750L, 1000L, 1250L, 1500L)

  /** EXT: the GATE-TUNING operating-point table — the sweep a curation
    * team reads before committing a quality gate: score the corpus ONCE
    * with the registered weights, then gate at five thresholds (0.5×,
    * 0.75×, 1×, 1.25×, 1.5× of the registered base-rate threshold) and
    * report, per threshold: kept docs, kept TOKEN mass (what the gate
    * actually costs the training run), and precision/recall against the
    * training label in exact ppm. The `ml_sweep` discipline applied to
    * thresholds: candidates share the one corpus scan — the 5× fan-out
    * multiplies only the narrow (nw, y, sig) projection, map-side
    * combined into 5 rows. The oracle re-trains the classifier,
    * re-derives the base rate, re-scores and re-sweeps, so one hash
    * pins the whole tuning table.
    */
  def curateThresholdSweep(spark: SparkSession, sfDir: String): DataFrame =
    thresholdSweepFrame(spark, sfDir)
      .select("thr_milli", "t_micro", "n_docs", "n_keep", "kept_tokens",
        "n_pos", "n_keep_pos", "precision_ppm", "recall_ppm")
      .orderBy("thr_milli")

  /** The sweep's operating-point frame (one row per threshold multiple),
    * shared by the report form and the budget picker.
    */
  private def thresholdSweepFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val (w1, w2, b, thr) = curateModel(spark, sfDir)
    Tables.documents(spark, sfDir)
      .selectExpr(
        "CAST(size(split(text, ' ')) AS BIGINT) AS nw",
        s"$LogregFeats1 AS x1",
        s"${LogregFeats2} AS x2",
        s"$LogregLabel AS y")
      .selectExpr("nw", "y", s"${logregSig(w1, w2, b)} AS sig")
      .withColumn("thr_milli", explode(typedlit(ThresholdSweepMillis)))
      .withColumn("t_micro", expr(s"($thr * thr_milli) div 1000"))
      .withColumn("keep", col("sig") >= col("t_micro"))
      .groupBy("thr_milli", "t_micro")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(when(col("keep"), col("nw")).otherwise(0L)).as("kept_tokens"),
        sum(col("y")).as("n_pos"),
        sum(when(col("keep") && col("y") === 1L, 1L).otherwise(0L)).as("n_keep_pos"))
      .withColumn("precision_ppm", expr(
        "CASE WHEN n_keep = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE n_keep_pos * 1000000 div n_keep END"))
      .withColumn("recall_ppm", expr(
        "CASE WHEN n_pos = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE n_keep_pos * 1000000 div n_pos END"))
  }

  /** EXT: the BUDGET-CONSTRAINED gate pick — what a training run actually
    * asks of [[curateThresholdSweep]]'s table: "we need at least B tokens;
    * give me the TIGHTEST gate that still delivers them." B here is 40%
    * of the corpus token mass (the deterministic stand-in for a training
    * budget). Selection rule, fully deterministic: among thresholds whose
    * kept token mass ≥ B, the highest multiplier wins (most quality per
    * kept token); if none qualifies, the loosest gate (max kept tokens)
    * is the honest fallback — you ship the closest you can get to budget.
    * One row out: the chosen operating point with the budget and a
    * qualifies flag, so a reader sees WHICH regime fired. Cost: the same
    * single corpus scan as the sweep plus one 2-column token-mass
    * aggregate; selection is arithmetic on the 5-row table.
    */
  def curateBudgetThreshold(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = Tables.documents(spark, sfDir)
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS nw")
      .selectExpr("CAST(sum(nw) * 2 div 5 AS BIGINT) AS budget_tokens")
    thresholdSweepFrame(spark, sfDir)
      .crossJoin(broadcast(budget))
      .withColumn("qualifies", col("kept_tokens") >= col("budget_tokens"))
      .orderBy(col("qualifies").desc,
        when(col("qualifies"), col("thr_milli")).otherwise(-col("thr_milli")).desc)
      .limit(1)
      .select("thr_milli", "t_micro", "n_keep", "kept_tokens", "budget_tokens",
        "qualifies", "precision_ppm", "recall_ppm")
  }

  private def thresholdSweepOracle: String = {
    val ctes = logregTrainCtes(
      s"""f AS (
         |  SELECT x1, x2, y FROM (
         |    SELECT $LogregFeats1 AS x1,
         |           ${LogregFeats2Duck} AS x2,
         |           $LogregLabel AS y,
         |           ${Hashing.duckHash60("CAST(doc_id AS VARCHAR)")} % 100 AS h
         |    FROM documents) WHERE h < $CurateTrainPct)""".stripMargin) ++ Seq(
      s"""th AS (
         |  SELECT CAST(CAST(sum(y) AS BIGINT) * 1000000 // count(*) AS BIGINT) AS t
         |  FROM f)""".stripMargin,
      s"""sw_sc AS (
         |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
         |         $LogregFeats1 AS x1,
         |         ${LogregFeats2Duck} AS x2,
         |         $LogregLabel AS y
         |  FROM documents)""".stripMargin,
      s"""sw_sig AS (
         |  SELECT nw, y, ${logregSigDuck("w.w1", "w.w2", "w.b")} AS sig
         |  FROM sw_sc, w$LogregIters w)""".stripMargin,
      s"""sw_ms AS (
         |  SELECT CAST(unnest([${ThresholdSweepMillis.mkString(", ")}]) AS BIGINT) AS thr_milli)""".stripMargin)
    ctes.mkString("WITH ", ",\n", "") +
      s"""
         |SELECT thr_milli,
         |  CAST((th.t * thr_milli) // 1000 AS BIGINT) AS t_micro,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN sig >= (th.t * thr_milli) // 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST(SUM(CASE WHEN sig >= (th.t * thr_milli) // 1000 THEN nw ELSE 0 END) AS BIGINT) AS kept_tokens,
         |  CAST(SUM(y) AS BIGINT) AS n_pos,
         |  CAST(SUM(CASE WHEN sig >= (th.t * thr_milli) // 1000 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_pos,
         |  CASE WHEN SUM(CASE WHEN sig >= (th.t * thr_milli) // 1000 THEN 1 ELSE 0 END) = 0
         |       THEN CAST(0 AS BIGINT)
         |       ELSE CAST(SUM(CASE WHEN sig >= (th.t * thr_milli) // 1000 AND y = 1 THEN 1 ELSE 0 END)
         |            * 1000000 // SUM(CASE WHEN sig >= (th.t * thr_milli) // 1000 THEN 1 ELSE 0 END) AS BIGINT)
         |  END AS precision_ppm,
         |  CASE WHEN SUM(y) = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(SUM(CASE WHEN sig >= (th.t * thr_milli) // 1000 AND y = 1 THEN 1 ELSE 0 END)
         |            * 1000000 // CAST(SUM(y) AS BIGINT) AS BIGINT)
         |  END AS recall_ppm
         |FROM sw_sig CROSS JOIN sw_ms, th
         |GROUP BY thr_milli, th.t
         |ORDER BY thr_milli""".stripMargin
  }

  /** Oracle for [[curateBudgetThreshold]]: the whole sweep oracle nested
    * as a CTE (retrain + rethreshold + rescore + resweep), a token-budget
    * CTE, and the same two-regime selection — one hash pins the pick.
    */
  private def budgetThresholdOracle: String =
    s"""WITH sweep AS (
       |$thresholdSweepOracle
       |), bud AS (
       |  SELECT CAST(CAST(SUM(len(string_split(text, ' '))) AS BIGINT) * 2 // 5 AS BIGINT) AS budget_tokens
       |  FROM documents
       |)
       |SELECT thr_milli, t_micro, n_keep, kept_tokens, bud.budget_tokens,
       |  (kept_tokens >= bud.budget_tokens) AS qualifies,
       |  precision_ppm, recall_ppm
       |FROM sweep, bud
       |ORDER BY (kept_tokens >= bud.budget_tokens) DESC,
       |  CASE WHEN kept_tokens >= bud.budget_tokens THEN thr_milli ELSE -thr_milli END DESC
       |LIMIT 1""".stripMargin

  // ----------------------------------------------------- scored documents

  /** Classifier score + binary label per document: the hashed-linear-model
    * score (same frozen md5 weight family as text_classifier_score) against
    * the lang='en' label — the "does the quality score separate the target
    * slice" readout. Exact integer score; no float anywhere.
    */
  private def scored(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("w", pmod(Hashing.hash60(col("tok")), lit(2001L)) - 1000L)
      .groupBy("doc_id", "lang")
      .agg(sum(col("w")).as("s"), count(lit(1)).as("n_toks"))
      .select(col("doc_id"), col("s"), col("n_toks"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))

  private val scoredCte: String =
    s"""tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
       |sc AS (
       |  SELECT doc_id, CAST(SUM(${Hashing.duckHash60("tok")} % 2001 - 1000) AS BIGINT) AS s,
       |         COUNT(*) AS n_toks,
       |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM tok WHERE length(tok) > 0 GROUP BY doc_id, lang)""".stripMargin

  // ----------------------------------------------------------------- AUC

  /** EXT: exact ROC-AUC of the classifier score against the label, via the
    * Mann-Whitney rank-sum with tie mid-ranks. Doubled mid-ranks keep the
    * numerator integral: for a tie group at score s with c rows starting
    * after cum_before rows, 2·midrank = 2·cum_before + c + 1, so
    * num2 = Σ_pos 2·midrank − n⁺(n⁺+1) and AUC = num2 / (2·n⁺·n⁻) —
    * reported in exact integer millionths. The per-score group table is
    * bounded (|score| ≤ 1000·max tokens per doc, independent of corpus
    * rows), and its cumulative pass runs through blockedPrefix, so no
    * unpartitioned window and no corpus-sized single task. Overflow: the
    * rank-sum and the num2·10⁶ product run in DECIMAL(38,0) (Spark) /
    * HUGEINT (DuckDB) — exact far past any corpus; only the BIGINT num2
    * OUTPUT column caps at ~3·10⁹ docs (num2 ≤ 2·n⁺·n⁻), where it would
    * switch to DECIMAL(38,0). greatest(·,1) guards the single-class
    * corpus identically in both engines (auc_micro 0 instead of a
    * NULL-vs-error divergence).
    */
  def mlAuc(spark: SparkSession, sfDir: String): DataFrame =
    aucOf(scored(spark, sfDir))

  /** The rank-sum pass over any (s: score, y: 0/1 label) frame — public so
    * crafted corpora with closed-form AUC can pin the tie mid-rank
    * arithmetic (the mirror-oracle countermeasure).
    */
  def aucOf(scoredDf: DataFrame): DataFrame = {
    val counts = scoredDf
      .groupBy("s")
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    blockedPrefix(counts, Nil,
      Seq("__b_s" -> floor(col("s") / lit(1024))), Seq(false),
      Seq(col("s")), "__rk", "__n",
      values = Seq(PrefixValue(col("c"), "cum_c", "tot_c")))
    .select(col("c"), col("p"), col("cum_c"))
      .agg(
        sum(col("p")).as("n_pos"),
        sum(col("c") - col("p")).as("n_neg"),
        // 2·cum_inclusive − c + 1 == 2·cum_before + c + 1; 128-bit-safe sum
        sum(expr("CAST(p AS DECIMAL(38,0))") *
          (lit(2) * col("cum_c") - col("c") + lit(1))).as("r2"))
      .selectExpr("n_pos", "n_neg",
        "CAST(r2 - CAST(n_pos AS DECIMAL(19,0)) * (n_pos + 1) AS BIGINT) AS num2",
        "CAST((r2 - CAST(n_pos AS DECIMAL(19,0)) * (n_pos + 1)) * 1000000" +
          " div (CAST(2 AS DECIMAL(38,0)) * greatest(n_pos, 1) * greatest(n_neg, 1)) AS BIGINT) AS auc_micro")
  }

  private val aucOracle: String =
    s"""WITH $scoredCte,
       |g AS (SELECT s, COUNT(*) AS c, CAST(SUM(y) AS BIGINT) AS p FROM sc GROUP BY s),
       |r AS (SELECT c, p,
       |        CAST(SUM(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c
       |      FROM g),
       |t AS (SELECT CAST(SUM(p) AS BIGINT) AS n_pos, CAST(SUM(c - p) AS BIGINT) AS n_neg,
       |        SUM(CAST(p AS HUGEINT) * (2 * cum_c - c + 1)) AS r2 FROM r)
       |SELECT n_pos, n_neg,
       |  CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT) AS num2,
       |  CAST((r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000
       |    // (2 * CAST(greatest(n_pos, 1) AS HUGEINT) * greatest(n_neg, 1)) AS BIGINT) AS auc_micro
       |FROM t""".stripMargin

  // -------------------------------------------------------------- PR curve

  /** EXT: the full precision/recall curve — one row per distinct score
    * threshold, predicting positive at score ≥ threshold. The confusion
    * matrix samples this curve at one operating point; a threshold
    * decision for a quality filter reads the whole thing. Same bounded
    * machinery as the AUC: per-score groups (bounded by score RANGE, not
    * corpus rows) through a DESCENDING blockedPrefix for the inclusive
    * cumulative tp / predicted counts; ratios in exact integer millionths
    * with DECIMAL(38,0)/HUGEINT intermediates.
    */
  def mlPrCurve(spark: SparkSession, sfDir: String): DataFrame =
    prCurveOf(scored(spark, sfDir))

  /** The curve over any (s, y) frame — public for crafted-corpus specs. */
  def prCurveOf(scoredDf: DataFrame): DataFrame = {
    val counts = scoredDf
      .groupBy("s")
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    blockedPrefix(counts, Nil,
      Seq("__b_s" -> floor(col("s") / lit(1024))), Seq(true),
      Seq(col("s").desc), "__rk", "__n",
      values = Seq(
        PrefixValue(col("p"), "cum_p", "tot_p"),
        PrefixValue(col("c"), "cum_c", "tot_c")))
      .selectExpr("s AS threshold", "cum_p AS tp", "cum_c - cum_p AS fp",
        "CAST(CAST(cum_p AS DECIMAL(38,0)) * 1000000 div cum_c AS BIGINT) AS precision_micro",
        "CAST(CAST(cum_p AS DECIMAL(38,0)) * 1000000 div greatest(tot_p, 1) AS BIGINT) AS recall_micro")
      .orderBy(col("threshold").desc)
  }

  private val prCurveOracle: String =
    s"""WITH $scoredCte,
       |g AS (SELECT s, COUNT(*) AS c, CAST(SUM(y) AS BIGINT) AS p FROM sc GROUP BY s),
       |r AS (SELECT s,
       |        CAST(SUM(p) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_p,
       |        CAST(SUM(c) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c,
       |        CAST(SUM(p) OVER () AS BIGINT) AS tot_p
       |      FROM g)
       |SELECT s AS threshold, cum_p AS tp, cum_c - cum_p AS fp,
       |  CAST(CAST(cum_p AS HUGEINT) * 1000000 // cum_c AS BIGINT) AS precision_micro,
       |  CAST(CAST(cum_p AS HUGEINT) * 1000000 // greatest(tot_p, 1) AS BIGINT) AS recall_micro
       |FROM r ORDER BY threshold DESC""".stripMargin

  // ------------------------------------------------------ confusion matrix

  /** EXT: confusion matrix + derived metrics at the model's natural
    * threshold (score ≥ 0 → predict positive). Counts exact; ratios in
    * integer millionths via positive integer division (greatest(·,1)
    * guards the degenerate all-one-class corpus identically in both
    * engines). Single map-side-combinable aggregate.
    */
  def mlConfusion(spark: SparkSession, sfDir: String): DataFrame =
    scored(spark, sfDir)
      .selectExpr(
        "CAST(CASE WHEN s >= 0 AND y = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_tp",
        "CAST(CASE WHEN s >= 0 AND y = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_fp",
        "CAST(CASE WHEN s < 0 AND y = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_fn",
        "CAST(CASE WHEN s < 0 AND y = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_tn")
      .selectExpr("sum(is_tp) AS tp", "sum(is_fp) AS fp",
        "sum(is_fn) AS fn", "sum(is_tn) AS tn")
      .selectExpr("tp", "fp", "fn", "tn",
        "tp * 1000000 div greatest(tp + fp, 1) AS precision_micro",
        "tp * 1000000 div greatest(tp + fn, 1) AS recall_micro",
        "2 * tp * 1000000 div greatest(2 * tp + fp + fn, 1) AS f1_micro",
        "(tp + tn) * 1000000 div (tp + fp + fn + tn) AS accuracy_micro")

  private val confusionOracle: String =
    s"""WITH $scoredCte,
       |m AS (SELECT
       |  CAST(SUM(CASE WHEN s >= 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(SUM(CASE WHEN s >= 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN s < 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(SUM(CASE WHEN s < 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM sc)
       |SELECT tp, fp, fn, tn,
       |  CAST(tp * 1000000 // greatest(tp + fp, 1) AS BIGINT) AS precision_micro,
       |  CAST(tp * 1000000 // greatest(tp + fn, 1) AS BIGINT) AS recall_micro,
       |  CAST(2 * tp * 1000000 // greatest(2 * tp + fp + fn, 1) AS BIGINT) AS f1_micro,
       |  CAST((tp + tn) * 1000000 // (tp + fp + fn + tn) AS BIGINT) AS accuracy_micro
       |FROM m""".stripMargin

  // ---------------------------------------------------------- calibration

  /** EXT: calibration table — fixed-width buckets of the per-doc mean
    * token weight (shifted to [0, 2000] milli so every division is
    * positive-integer, sidestepping the trunc-vs-floor divergence on
    * negatives), each with observed positive rate. Pure groupBy on a
    * 10-key bucket — map-side combined, no window.
    */
  def mlCalibration(spark: SparkSession, sfDir: String): DataFrame =
    scored(spark, sfDir)
      .selectExpr("y", "((s + 1000 * n_toks) * 1000) div n_toks AS rate_shift_milli")
      .selectExpr("y", "rate_shift_milli",
        "least(rate_shift_milli div 200000, 9) AS bucket")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_pos"),
        sum(col("rate_shift_milli")).as("rate_sum"))
      .selectExpr("bucket", "n_docs", "n_pos",
        "n_pos * 1000000 div n_docs AS pos_micro",
        "rate_sum div n_docs AS mean_rate_shift_milli")
      .orderBy("bucket")

  private val calibrationOracle: String =
    s"""WITH $scoredCte,
       |b AS (SELECT y, ((s + 1000 * n_toks) * 1000) // n_toks AS rate_shift_milli FROM sc),
       |g AS (SELECT least(rate_shift_milli // 200000, 9) AS bucket,
       |        COUNT(*) AS n_docs, CAST(SUM(y) AS BIGINT) AS n_pos,
       |        CAST(SUM(rate_shift_milli) AS BIGINT) AS rate_sum
       |      FROM b GROUP BY 1)
       |SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, n_pos,
       |  CAST(n_pos * 1000000 // n_docs AS BIGINT) AS pos_micro,
       |  CAST(rate_sum // n_docs AS BIGINT) AS mean_rate_shift_milli
       |FROM g ORDER BY bucket""".stripMargin

  // ----------------------------------------------------------------- lift

  /** EXT: decile lift / cumulative-gains table — rank every document by
    * score descending, cut into tenths, report how concentrated the
    * positives are in the top deciles (the "how much corpus must I keep to
    * capture X% of the good docs" curve every quality-filter threshold
    * decision reads). The global rank runs through blockedPrefix (blocks =
    * the score itself; the summary is bounded by the score range, not
    * corpus rows); the decile cumulative is a window over exactly 10 rows
    * (boundedPartition, bound = 10).
    */
  def mlLift(spark: SparkSession, sfDir: String): DataFrame =
    liftOf(scored(spark, sfDir))

  /** Decile table over any (doc_id, s, y) frame — public for crafted-corpus
    * specs.
    */
  def liftOf(scoredDf: DataFrame): DataFrame = {
    val ranked = blockedPrefix(scoredDf, Nil,
      Seq("__b_s" -> col("s")), Seq(true),
      Seq(col("doc_id")), "rk", "n_tot", values = Nil)
    val wCum = Window.partitionBy(BlockedRank.boundedPartition(col("decile")))
      .orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy(BlockedRank.boundedPartition(col("decile")))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked
      .selectExpr("y", "(rk - 1) * 10 div n_tot AS decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_pos"))
      .withColumn("cum_docs", sum(col("n_docs")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("tot_docs", sum(col("n_docs")).over(wTot))
      .withColumn("tot_pos", sum(col("n_pos")).over(wTot))
      .selectExpr("decile", "n_docs", "n_pos", "cum_docs", "cum_pos",
        // DECIMAL(38,0) intermediates: the cum_pos·tot_docs·10⁶ product
        // would wrap BIGINT at only ~3M docs
        "CAST(CAST(cum_pos AS DECIMAL(38,0)) * tot_docs * 1000000" +
          " div (CAST(cum_docs AS DECIMAL(38,0)) * greatest(tot_pos, 1)) AS BIGINT) AS lift_micro",
        "CAST(CAST(cum_pos AS DECIMAL(38,0)) * 1000000 div greatest(tot_pos, 1) AS BIGINT) AS capture_micro")
      .orderBy("decile")
  }

  private val liftOracle: String =
    s"""WITH $scoredCte,
       |rk AS (SELECT y, row_number() OVER (ORDER BY s DESC, doc_id) AS rk,
       |         COUNT(*) OVER () AS n_tot FROM sc),
       |d AS (SELECT CAST((rk - 1) * 10 // n_tot AS BIGINT) AS decile,
       |        COUNT(*) AS n_docs, CAST(SUM(y) AS BIGINT) AS n_pos
       |      FROM rk GROUP BY 1),
       |c AS (SELECT decile, n_docs, n_pos,
       |        CAST(SUM(n_docs) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
       |        CAST(SUM(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
       |        CAST(SUM(n_docs) OVER () AS BIGINT) AS tot_docs,
       |        CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
       |      FROM d)
       |SELECT decile, n_docs, n_pos, cum_docs, cum_pos,
       |  CAST(CAST(cum_pos AS HUGEINT) * tot_docs * 1000000
       |    // (CAST(cum_docs AS HUGEINT) * greatest(tot_pos, 1)) AS BIGINT) AS lift_micro,
       |  CAST(CAST(cum_pos AS HUGEINT) * 1000000 // greatest(tot_pos, 1) AS BIGINT) AS capture_micro
       |FROM c ORDER BY decile""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_linreg_gd"   -> (mlLinregGd _),
    "ml_logreg_gd"   -> (mlLogregGd _),
    "curate_classifier" -> (curateClassifier _),
    "curate_threshold_sweep" -> (curateThresholdSweep _),
    "curate_budget_threshold" -> (curateBudgetThreshold _),
    "ml_sweep"       -> (mlSweep _),
    "ml_auc"         -> (mlAuc _),
    "ml_pr_curve"    -> (mlPrCurve _),
    "ml_confusion"   -> (mlConfusion _),
    "ml_calibration" -> (mlCalibration _),
    "ml_lift"        -> (mlLift _),
  )

  override def oracles: Map[String, String] = Map(
    "ml_linreg_gd"   -> gdOracle,
    "ml_logreg_gd"   -> logregOracle,
    "curate_classifier" -> curateOracle,
    "curate_threshold_sweep" -> thresholdSweepOracle,
    "curate_budget_threshold" -> budgetThresholdOracle,
    "ml_sweep"       -> sweepOracle,
    "ml_auc"         -> aucOracle,
    "ml_pr_curve"    -> prCurveOracle,
    "ml_confusion"   -> confusionOracle,
    "ml_calibration" -> calibrationOracle,
    "ml_lift"        -> liftOracle,
  )
}
