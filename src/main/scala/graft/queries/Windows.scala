package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY §2.5) and sorts/limits/top-k (§2.6).
  *
  * Every window partitions by a real key (custkey / mktsegment) — never a
  * global single-partition window, which would serialize at scale. Ordering
  * inside each window always ends in a unique column so ranks and running
  * values are deterministic for the hash-compare.
  */
object Windows extends QueryModule {

  /** Ranking trio over orders per customer. */
  def winRank(spark: SparkSession, sfDir: String): DataFrame = {
    val byPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(byPrice).as("rn"),
        rank().over(Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)).as("rk"),
        dense_rank().over(Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)).as("drk"))
      .orderBy("o_custkey", "rn")
  }

  /** lag/lead along each customer's order history. */
  def winLagLead(spark: SparkSession, sfDir: String): DataFrame = {
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        lag("o_totalprice", 1).over(byDate).as("prev_price"),
        lead("o_totalprice", 1).over(byDate).as("next_price"),
        first("o_totalprice").over(byDate).as("first_price"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Running aggregates over an unbounded-preceding row frame. */
  def winRunning(spark: SparkSession, sfDir: String): DataFrame = {
    val cum = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum("o_totalprice").over(cum), 2).as("run_total"),
        count(lit(1)).over(cum).as("run_n"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Top-3 orders per customer — the partitioned top-k pattern
    * (row_number ≤ k), which pushes the limit inside each partition instead
    * of a global sort.
    */
  def winTopkPerKey(spark: SparkSession, sfDir: String): DataFrame = {
    val byPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(byPrice))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** Top-3 orders per customer AGAIN, via the typed TopKAggregator (U5) —
    * identical output to win_topk_per_key, different physical shape: O(k)
    * per-group state with map-side partial aggregation instead of a full
    * per-partition sort. The heavy-hitter-group-safe form at 100 TB.
    */
  def aggTopkHeap(spark: SparkSession, sfDir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(3))
    Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(
        col("o_custkey"),
        (col("pos") + 1).cast("int").as("rn"),
        col("col.id").as("o_orderkey"),
        col("col.score").as("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** ntile quartiles within each market segment (partitioned, not global). */
  def winNtile(spark: SparkSession, sfDir: String): DataFrame = {
    val bySeg = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, sfDir)
      .select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(bySeg).as("quartile"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** Time-range frame: orders in the trailing 30 days per customer.
    * rangeBetween needs a numeric ordering, so order by epoch seconds.
    */
  def winRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val trailing = Window.partitionBy("o_custkey")
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        count(lit(1)).over(trailing).as("n_30d"),
        round(sum("o_totalprice").over(trailing), 2).as("total_30d"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Batch sessionization by inactivity gap (the window-function form of
    * T5's session_window, assigning STABLE per-user session numbers): an
    * event starts a new session when >10 min passed since the user's
    * previous event; session_seq = running count of session starts. Two
    * window passes over ONE shuffle+sort on user_id (both windows share
    * the (user_id | ts, event_id) ordering, so Catalyst plans a single
    * Exchange+Sort) — the standard scalable gap-sessionize shape.
    */
  def winSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val tus = unix_micros(col("ts"))
    val prev = lag(unix_micros(col("ts")), 1).over(byUser)
    Tables.events(spark, sfDir)
      .withColumn("is_new",
        when(prev.isNull || tus - prev > 600L * 1000000L, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("event_id", "user_id", "is_new", "session_seq")
      .orderBy("user_id", "event_id")
  }

  /** Rolling 7-day OLS slope of daily revenue per event type — the trend
    * detector behind "is this metric accelerating": every frame aggregate
    * is a rolling POWER SUM (n, Σx, Σy, Σxy, Σx² — each an exact
    * integer/decimal over the frame), and the slope is one double division
    * + ROUND on identical scalars in both engines. The window runs on the
    * per-(type, day) summary — calendar-bounded per type — over ONE
    * shuffle+sort; x is the epoch-day index so frames never parse dates.
    * Frames shorter than 2 points emit NULL (no 0/0 in either engine).
    */
  def winRollingSlope(spark: SparkSession, sfDir: String): DataFrame =
    rollingSlopeOf(Tables.events(spark, sfDir))

  /** The rolling-OLS pass over any (event_type, ts, value) frame — public
    * so crafted corpora can pin the slope against closed-form expectations
    * (`TrendSpec`), the mirror-oracle countermeasure.
    */
  def rollingSlopeOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    val n   = count(lit(1)).over(w).cast("double")
    val sx  = sum(col("x")).over(w).cast("double")
    val sy  = sum(col("rev")).over(w).cast("double")
    val sxx = sum(col("x") * col("x")).over(w).cast("double")
    val sxy = sum(col("rev") * col("x")).over(w).cast("double")
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(19,6)")).as("rev"))
      .withColumn("x", datediff(col("day"), lit("1970-01-01")).cast("long"))
      .select(
        col("event_type"), col("day"),
        round(col("rev").cast("double"), 2).as("daily_rev"),
        count(lit(1)).over(w).as("n_win"),
        when(count(lit(1)).over(w) >= 2,
          round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)).as("slope_7d"))
      .orderBy("event_type", "day")
  }

  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps,
    * only k rows reach the driver-side merge, no full sort.
    */
  def topkGlobal(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** Multi-column full sort with an explicit null placement. */
  def sortMulti(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy(col("s_nationkey"), col("s_acctbal").desc_nulls_last, col("s_suppkey"))
  }

  /** Distribution ranks: percent_rank and cume_dist per segment — pure
    * rank arithmetic (no float accumulation), so the doubles are exact in
    * both engines; rounding only guards the division. The tie-broken order
    * (acctbal, custkey) makes every rank engine-independent.
    */
  def winCdf(spark: SparkSession, sfDir: String): DataFrame = {
    val bySeg = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, sfDir)
      .select(
        col("c_mktsegment"), col("c_custkey"),
        round(percent_rank().over(bySeg), 6).as("pct_rank"),
        round(cume_dist().over(bySeg), 6).as("cume"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** Exponentially-decayed engagement score: 8-term truncated EWMA of each
    * user's event values, newest term weight 1, each older event halving —
    * the streaming-profile feature ("recent activity, recency-weighted")
    * computed in batch. A true infinite EWMA is a sequential recurrence
    * Spark can't window; the 8-term truncation (residual weight < 0.4%) is
    * eight lag() reads over ONE shuffle+sort per user. Exactness: values
    * snap onto their 2dp decimal grid, the 2⁻ʲ weights are exact 7dp
    * decimals, so every term — and the sum — is an exact 9dp decimal in
    * both engines, with no float rounding anywhere. (A double formulation
    * fails subtly: the exact sums routinely end in …5 at the 7th decimal,
    * where Spark's shortest-repr ROUND and DuckDB's scale-multiply ROUND
    * disagree by one ulp.)
    */
  def winEwma(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val terms = (0 until 8).map { j =>
      coalesce(lag(col("value"), j).over(byUser), lit(0.0)).cast("decimal(12,2)") *
        expr(s"CAST(${math.pow(0.5, j)} AS DECIMAL(8,7))")
    }
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("ewma", terms.reduceLeft(_ + _).cast("double"))
      .select("event_id", "user_id", "ewma")
      .orderBy("event_id")
  }

  /** Exact rolling median over each user's trailing 7 event values — the
    * robust denoiser a metrics pipeline wants where a rolling MEAN chases
    * outliers. Spark has no median window function; the frame's values are
    * collected, sorted, and indexed per row — O(f log f) per row for frame
    * size f, fine for the small trailing frames this exists for (wide
    * frames want the two-heap mapGroups formulation instead). The median
    * is a SELECTED element, not interpolated arithmetic, so the result is
    * an exact input value in both engines.
    */
  def winRollingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, 0)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("vals", collect_list(col("value")).over(w))
      .select(
        col("event_id"), col("user_id"),
        size(col("vals")).as("n_frame"),
        expr("element_at(array_sort(vals), CAST((size(vals) + 1) div 2 AS INT))").as("med"))
      .orderBy("event_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_ewma"        -> (winEwma _),
    "win_rolling_median" -> (winRollingMedian _),
    "win_cdf"          -> (winCdf _),
    "win_rank"        -> (winRank _),
    "win_lag_lead"    -> (winLagLead _),
    "win_running"     -> (winRunning _),
    "win_topk_per_key" -> (winTopkPerKey _),
    "agg_topk_heap"   -> (aggTopkHeap _),
    "win_ntile"       -> (winNtile _),
    "win_range_frame" -> (winRangeFrame _),
    "win_sessionize"  -> (winSessionize _),
    "win_rolling_slope" -> (winRollingSlope _),
    "topk_global"     -> (topkGlobal _),
    "sort_multi"      -> (sortMulti _),
  )

  private val duckEwmaTerms = (0 until 8).map { j =>
    val w = math.pow(0.5, j) // exact binary fraction, exact 7dp decimal literal
    s"""CAST(COALESCE(lag("value", $j) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS DECIMAL(12,2)) * CAST($w AS DECIMAL(8,7))"""
  }.mkString(" + ")

  override def oracles: Map[String, String] = Map(
    "win_rolling_median" ->
      """WITH t AS (
        |  SELECT event_id, user_id,
        |    list("value") OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS vals
        |  FROM events
        |)
        |SELECT event_id, user_id,
        |  CAST(len(vals) AS INTEGER) AS n_frame,
        |  list_sort(vals)[(len(vals) + 1) // 2] AS med
        |FROM t ORDER BY event_id""".stripMargin,
    "win_ewma" ->
      s"""SELECT event_id, user_id,
         |  CAST($duckEwmaTerms AS DOUBLE) AS ewma
         |FROM events
         |ORDER BY event_id""".stripMargin,
    "win_rolling_slope" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    SUM(CAST("value" AS DECIMAL(19,6))) AS rev,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)
        |), s AS (
        |  SELECT event_type, day, rev,
        |    COUNT(*) OVER w AS n_win,
        |    CAST(SUM(x) OVER w AS DOUBLE) AS sx,
        |    CAST(SUM(rev) OVER w AS DOUBLE) AS sy,
        |    CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx,
        |    CAST(SUM(rev * x) OVER w AS DOUBLE) AS sxy
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |  ROUND(CAST(rev AS DOUBLE), 2) AS daily_rev, n_win,
        |  CASE WHEN n_win >= 2 THEN
        |    ROUND((n_win::DOUBLE * sxy - sx * sy) / (n_win::DOUBLE * sxx - sx * sx), 6)
        |  END AS slope_7d
        |FROM s ORDER BY event_type, day""".stripMargin,
    "win_sessionize" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        |), s AS (
        |  SELECT event_id, user_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w > 600 * 1000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        |)
        |SELECT event_id, user_id, is_new,
        |  CAST(SUM(is_new) OVER (
        |    PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |FROM s ORDER BY user_id, event_id""".stripMargin,
    "win_cdf" ->
      """SELECT c_mktsegment, c_custkey,
        |  ROUND(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6) AS pct_rank,
        |  ROUND(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6) AS cume
        |FROM customer
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INTEGER) AS rk,
        |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS INTEGER) AS drk
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,
    "win_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER w AS first_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "win_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  ROUND(SUM(o_totalprice) OVER w, 2) AS run_total,
        |  COUNT(*) OVER w AS run_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "win_topk_per_key" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "agg_topk_heap" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_ntile" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
        |FROM customer ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "win_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  COUNT(*) OVER w AS n_30d,
        |  ROUND(SUM(o_totalprice) OVER w, 2) AS total_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "sort_multi" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier
        |ORDER BY s_nationkey, s_acctbal DESC NULLS LAST, s_suppkey""".stripMargin,
  )
}
