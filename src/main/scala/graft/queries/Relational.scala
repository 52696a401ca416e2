package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: filters/projections (SURVEY §2.2 P6-P7), joins (§2.3
  * J1-J7), aggregations (§2.4 A1-A7). All declarative DataFrame ops so
  * Catalyst handles pushdown/pruning/join selection; `broadcast()` hints mark
  * the genuinely small dimensions (region 5 rows, nation 25 — safe at any
  * scale factor since they're fixed-size).
  *
  * Scale notes per operator are inline; the common rules: one shuffle per
  * groupBy/join on the natural key, partial aggregation is automatic, and
  * nothing collects to the driver.
  */
object Relational extends QueryModule {

  // ---------------------------------------------------------------- filters

  /** P6: conjunctive predicates — comparison, BETWEEN, IN, LIKE, null test.
    * All land in the parquet scan as PushedFilters.
    */
  def filterPred(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .filter(
        col("l_quantity").between(5, 24) &&
        col("l_shipdate") <= to_timestamp(lit("1997-06-30")) &&
        col("l_returnflag").isin("A", "R") &&
        col("l_linestatus") === "F" &&
        col("l_extendedprice").isNotNull &&
        col("l_returnflag").like("%A%"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_shipdate")
      // (l_orderkey, l_linenumber) is NOT unique in this corpus; adding
      // quantity+price makes the sort total (verified unique), so row order
      // is engine-independent.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
  }

  /** P7: narrow projection + row-level arithmetic; ReadSchema should carry
    * only the four referenced columns.
    */
  def projectPrune(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .filter(col("l_discount") > 0.05)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      // sort by every output column: remaining ties are identical rows,
      // so any inter-engine order difference is hash-invisible
      .orderBy("l_orderkey", "l_linenumber", "revenue")
  }

  // ------------------------------------------------------------------ joins

  /** J1: inner equi-join fact⋈dim on the natural key. At scale: sort-merge or
    * shuffled-hash chosen by Catalyst/AQE; both sides shuffle on the key once.
    */
  def joinInner(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select("o_orderkey", "c_custkey", "c_name", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  /** J2: broadcast chain through two fixed-size dims — zero shuffle on the
    * probe side; customer streams through two broadcast hash joins.
    */
  def joinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select("c_custkey", "c_name", "n_name", "r_name")
      .orderBy("c_custkey")
  }

  /** J3: left outer — customers keep a row even with no orders; null order
    * columns sort explicitly NULLS FIRST to pin cross-engine row order.
    */
  def joinLeft(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
  }

  /** J3b: full outer — union of match, left-only, right-only; null keys on
    * both sides sort explicitly to pin row order.
    */
  def joinFull(spark: SparkSession, sfDir: String): DataFrame = {
    val bigCust = Tables.customer(spark, sfDir).filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey"), col("c_name"))
    val bigOrd = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    bigCust.join(bigOrd, bigCust("c_custkey") === bigOrd("o_custkey"), "full_outer")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
  }

  /** J4a: left semi = EXISTS. */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** J4b: left anti = NOT EXISTS (customers with no big order — the plain
    * no-orders anti-join is empty on this corpus, which would be a vacuous
    * check).
    */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 450000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** J5: theta/range join against a tiny inline band table — only sane as a
    * broadcast nested-loop; the band side is constant-size so this stays
    * broadcastable at any data scale.
    */
  def joinRangeBand(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 1000.0),
      ("mid", 1000.0, 1500.0),
      ("high", 1500.0, 1000000.0),
    ).toDF("band", "lo", "hi")
    Tables.part(spark, sfDir)
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .select("p_partkey", "p_name", "p_retailprice", "band")
      .orderBy("p_partkey", "band")
  }

  /** J6: cross join of the two fixed-size dims (5×25 rows). */
  def joinCross(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.region(spark, sfDir).select("r_name")
      .crossJoin(Tables.nation(spark, sfDir).select("n_name"))
      .orderBy("r_name", "n_name")
  }

  /** J7: as-of join — for each event, the latest order of the same customer
    * with o_orderdate <= ts. Spark lacks a native as-of join; the scalable
    * shape is union-the-two-streams + per-key window ("last non-null order
    * seen so far"), which costs exactly one shuffle on the key and a per-key
    * sort — the same cost profile as a sort-merge join, with no row
    * explosion. (A naive inequality join would be O(events × orders) per
    * key.) Orders are first deduped to one per (custkey, date) — max
    * orderkey — because "the" as-of match is otherwise ambiguous.
    */
  def joinAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .withColumnRenamed("user_id", "k")
    val o = Tables.orders(spark, sfDir)
      .withColumnRenamed("o_custkey", "k")
    graft.operators.AsOf.joinLeftAsOf(
        left = e, right = o,
        key = "k", leftTime = "ts", rightTime = "o_orderdate",
        leftId = "event_id", tieBreak = "o_orderkey",
        payload = Seq("o_orderkey", "o_totalprice"))
      .select(
        col("event_id"),
        col("k").as("user_id"),
        col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("event_id")
  }

  /** J7 nearest variant: for each event, the temporally CLOSEST order of
    * the same customer in either direction (sensor-fusion / record-linkage
    * semantics — "which order does this event belong to"). Composed from
    * the backward and forward as-of passes (each one shuffle), then a 1:1
    * join on the event id picks the smaller gap; ties and one-sided misses
    * resolve backward. Gaps compare in exact integer microseconds.
    */
  def joinAsofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .withColumnRenamed("user_id", "k")
    val o = Tables.orders(spark, sfDir)
      .withColumnRenamed("o_custkey", "k")
    val payload = Seq("o_orderkey", "o_orderdate")
    val bwd = graft.operators.AsOf.joinLeftAsOf(
        e, o, "k", "ts", "o_orderdate", "event_id", "o_orderkey", payload)
      .select(col("event_id"), col("k"), col("ts"),
        col("o_orderkey").as("b_key"), col("o_orderdate").as("b_t"))
    val fwd = graft.operators.AsOf.joinLeftAsOfForward(
        e, o, "k", "ts", "o_orderdate", "event_id", "o_orderkey", payload)
      .select(col("event_id"),
        col("o_orderkey").as("f_key"), col("o_orderdate").as("f_t"))
    // payload timestamps arrive as TIMESTAMP_NTZ from the parquet schema;
    // unix_micros needs TIMESTAMP (identical wall-clock under the UTC
    // session the engine pins)
    val bGap = unix_micros(col("ts")) - unix_micros(col("b_t").cast("timestamp"))
    val fGap = unix_micros(col("f_t").cast("timestamp")) - unix_micros(col("ts"))
    bwd.join(fwd, "event_id")
      .select(
        col("event_id"),
        col("k").as("user_id"),
        when(col("b_key").isNull, col("f_key"))
          .when(col("f_key").isNull, col("b_key"))
          .when(fGap < bGap, col("f_key"))
          .otherwise(col("b_key")).as("o_orderkey"),
        when(col("b_key").isNull, fGap)
          .when(col("f_key").isNull, bGap)
          .when(fGap < bGap, fGap)
          .otherwise(bGap).as("gap_us"))
      .orderBy("event_id")
  }

  /** J7 forward variant: for each event, the EARLIEST order of the same
    * customer with o_orderdate >= ts (the "next purchase after activity"
    * attribution lookup). Same single-shuffle union+window shape as
    * `joinAsof`, carry-backward instead of carry-forward.
    */
  def joinAsofFwd(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .withColumnRenamed("user_id", "k")
    val o = Tables.orders(spark, sfDir)
      .withColumnRenamed("o_custkey", "k")
    graft.operators.AsOf.joinLeftAsOfForward(
        left = e, right = o,
        key = "k", leftTime = "ts", rightTime = "o_orderdate",
        leftId = "event_id", tieBreak = "o_orderkey",
        payload = Seq("o_orderkey", "o_totalprice"))
      .select(
        col("event_id"),
        col("k").as("user_id"),
        col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("event_id")
  }

  /** Point-in-interval join via interval BUCKETING — the scalable form of
    * "which 30-day order-validity windows cover this event". Overlapping
    * intervals make this inexpressible as an as-of join, and the naive
    * formulation (equi-key + range predicate) degenerates to a per-key
    * nested loop. The bucketing trick: a window of width W covers at most
    * 2 grid cells of size W, so exploding each interval to its covering
    * cells turns the range join into an equi-join on (key, cell) + an
    * exact residual filter. An event sits in exactly ONE cell, so no
    * dedup is needed. Shuffle = 2× intervals + 1× events, all on
    * (key, cell) — a plain hash join at any scale, no row explosion.
    */
  def joinIntervalBucket(spark: SparkSession, sfDir: String): DataFrame = {
    val W = 30 // window and grid width, days
    val epoch = to_date(lit("1970-01-01"))
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        datediff(to_date(col("ts")), epoch).as("eday"))
      .withColumn("cell", floor(col("eday") / W))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("user_id"), col("o_orderkey"), col("o_totalprice"),
        datediff(to_date(col("o_orderdate")), epoch).as("sday"))
      .withColumn("cell",
        explode(array_distinct(array(
          floor(col("sday") / W),
          floor((col("sday") + W - 1) / W)))))
    val hits = e.join(o, Seq("user_id", "cell"))
      .filter(col("eday") >= col("sday") && col("eday") < col("sday") + W)
      .groupBy("event_id")
      .agg(
        count(lit(1)).as("n_cover"),
        sum(col("o_totalprice").cast("decimal(30,6)")).as("tot"))
    e.select("event_id", "user_id")
      .join(hits, Seq("event_id"), "left")
      .select(
        col("event_id"), col("user_id"),
        coalesce(col("n_cover"), lit(0L)).as("n_cover"),
        coalesce(col("tot"), lit(0).cast("decimal(30,6)")).cast("double").as("total"))
      .orderBy("event_id")
  }

  /** Interval-INTERVAL overlap join (the two-sided generalization of the
    * point-in-interval bucketing above): order-validity windows [start,
    * start+30d) × per-(user, week) activity spans [first event, last
    * event]. Both sides explode to their ≤2 covering 30-day grid cells —
    * any overlap point's cell is covered by BOTH intervals, so the
    * (key, cell) equi-join loses no pairs — then the exact overlap
    * predicate filters and a distinct collapses pairs that met in two
    * cells. Same scale profile as a hash join: shuffles carry ≤2× each
    * side, never a per-key nested loop.
    */
  def joinIntervalOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val W = 30 // order-window and grid width, days
    val epoch = to_date(lit("1970-01-01"))
    val act = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .agg(
        datediff(min(to_date(col("ts"))), epoch).as("bs"),
        datediff(max(to_date(col("ts"))), epoch).as("be"))
      .withColumn("cell",
        explode(array_distinct(array(floor(col("bs") / W), floor(col("be") / W)))))
    val oBase = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey").as("user_id"),
        datediff(to_date(col("o_orderdate")), epoch).as("sday"))
    val o = oBase.withColumn("cell",
      explode(array_distinct(array(
        floor(col("sday") / W),
        floor((col("sday") + W - 1) / W)))))
    val pairs = o.join(act, Seq("user_id", "cell"))
      .filter(col("sday") <= col("be") && col("bs") < col("sday") + W)
      .select("o_orderkey", "week")
      .distinct()
    val cnt = pairs.groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_overlap_weeks"))
    oBase.select("o_orderkey", "user_id")
      .join(cnt, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"), col("user_id"),
        coalesce(col("n_overlap_weeks"), lit(0L)).as("n_overlap_weeks"))
      .orderBy("o_orderkey")
  }

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    * each other instead of vanishing — the semantics dimension tables with
    * an "unknown" bucket need. Keys here are derived with a deterministic
    * NULL hole (bucket 7 → NULL) on both sides. Catalyst plans `<=>` as a
    * normal hash join (null-safe equality is still an equi-key), so the
    * scale profile is identical to J1.
    */
  def joinNullsafe(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .groupBy(nullif(pmod(col("o_orderkey"), lit(1000)), lit(7)).as("k"))
      .agg(count(lit(1)).as("n_orders"))
    val l = Tables.lineitem(spark, sfDir)
      .groupBy(nullif(pmod(col("l_orderkey"), lit(1000)), lit(7)).as("k"))
      .agg(count(lit(1)).as("n_items"))
    o.join(l, o("k") <=> l("k"), "inner")
      .select(o("k").as("k"), col("n_orders"), col("n_items"))
      .orderBy(col("k").asc_nulls_first)
  }

  // ----------------------------------------------------------- aggregations

  /** A1: grouped hash agg, TPC-H Q1 shape. The big money sums go through
    * DECIMAL(30,6): the per-row double product is deterministic (identical
    * IEEE ops in both engines), the double→decimal cast of an identical
    * double is identical, and decimal summation is exact — so the sums are
    * order-independent at ANY scale. (Pure double sums rounded post-hoc
    * drift across summation orders once groups reach ~10⁵ rows × 10⁹
    * magnitudes — observed at sf0.1.) Smaller-magnitude aggregates (qty,
    * avgs) stay double + grid rounding. Partial (map-side) aggregation is
    * automatic either way.
    */
  def aggSumQ1(spark: SparkSession, sfDir: String): DataFrame = {
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(30,6)")).cast("double")
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A2: distinct + count-distinct (exact). Two-phase shuffle under the hood;
    * at scale prefer approx_count_distinct (see agg_approx) when exactness
    * isn't required.
    */
  def aggDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** A3: HLL approximate distinct — implementation-specific estimates, so no
    * DuckDB oracle (rows-only check + unit test vs exact count).
    */
  def aggApprox(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
      .orderBy("l_returnflag")
  }

  /** Argmax aggregation (`max_by`/`min_by`): the row-attribute-at-the-
    * extreme pattern (biggest order per priority, first touch per user)
    * without a window or self-join — one map-side-combinable aggregate.
    * `max_by` breaks ties arbitrarily, so the ordering key is made UNIQUE
    * by packing (cents, orderkey) into one long — deterministic in both
    * engines. (Cents ≈ 5×10⁷ max here; the packed key stays far below
    * 2⁶³ even at 1000× the keyspace.)
    */
  def aggArgmax(spark: SparkSession, sfDir: String): DataFrame = {
    // round, THEN cast: price×100 is within 1e-9 of integer cents, but a
    // raw double→long cast truncates in Spark and rounds in DuckDB —
    // 1.01×100 = 100.999… would pack differently per engine.
    val packed = round(col("o_totalprice") * 100, 0).cast("long") * lit(1000000000L) +
      col("o_orderkey")
    Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(
        max_by(col("o_orderkey"), packed).as("biggest_order"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        min_by(col("o_orderkey"), packed).as("smallest_order"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** Deterministic MODE (most frequent value) per group. Native `mode()`
    * breaks ties arbitrarily in BOTH engines, so this is the explicit
    * two-level form: count per (group, value), then rank by
    * (count desc, value asc) — fully deterministic, and the same shape a
    * 100 TB run wants anyway (two map-side-combined shuffles, no
    * whole-group state).
    */
  def aggMode(spark: SparkSession, sfDir: String): DataFrame = {
    val byCnt = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus")
      .orderBy(col("cnt").desc, col("o_orderpriority").asc)
    Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(byCnt))
      .filter(col("rn") === 1)
      .select(
        col("o_orderstatus"),
        col("o_orderpriority").as("mode_priority"),
        col("cnt"))
      .orderBy("o_orderstatus")
  }

  /** Sketch re-aggregation (Apache DataSketches HLL via Spark builtins):
    * build one sketch per month, union the sketches, estimate — the
    * pattern that makes "distinct users, any date range" an O(ranges)
    * query over pre-aggregated daily sketches instead of an O(history)
    * rescan. The HLL state is order-independent, so merged-estimate ≡
    * direct-estimate EXACTLY (spec-pinned, with the ε-bound vs the true
    * count); rows-only at the oracle gate since DuckDB's HLL is a
    * different implementation.
    */
  def aggSketchMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val monthly = Tables.orders(spark, sfDir)
      .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
        countDistinct(col("o_custkey")).as("exact_month"))
    monthly
      .agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_total"),
        sum(col("exact_month")).as("sum_monthly_exact"),
        count(lit(1)).as("n_months"))
  }

  /** A4: rollup with grouping_id; subtotal rows pinned by sorting on the
    * grouping id and NULLS FIRST keys.
    */
  def aggRollup(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        // decimal-exact: the grand-total row sums every order; double sums
        // drift past the rounding grid at large scale factors
        sum(col("o_totalprice").cast("decimal(30,6)")).cast("double").as("total"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** A4b: cube — all four grouping combinations. */
  def aggCube(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("o_totalprice")), 4).as("avg_price"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** A5: filtered/conditional aggregation. */
  def aggFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_all"),
        sum(when(col("o_orderstatus") === "F", lit(1)).otherwise(lit(0))).as("n_finished"),
        sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0))
          .cast("decimal(30,6)")).cast("double").as("total_finished"))
      .orderBy("o_orderpriority")
  }

  /** A6: collect_set — rendered as a sorted joined string so the comparison
    * is order-insensitive and list-type-free. Bounded input only (distinct
    * linestatus values), which is the 100 TB-safe way to use collect_*.
    */
  def aggCollect(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        concat_ws(",", sort_array(collect_set(col("l_linestatus")))).as("statuses"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** A7: exact percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`,
    * both linear-interpolation). percentile_approx is the at-scale variant
    * (unit-tested, not oracle-checked).
    */
  def aggPercentile(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Statistical aggregates (Welford-style merges in both engines; rounded
    * to absorb merge-order float noise).
    */
  def aggStats(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy("l_linestatus")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"))
      .orderBy("l_linestatus")
  }

  /** Pivot: one column per return flag (explicit value list keeps the
    * output schema static — mandatory for a deterministic contract; an
    * inferred pivot would scan once just to discover columns).
    */
  def aggPivot(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(count(lit(1)))
      .withColumnsRenamed(Map("A" -> "n_a", "N" -> "n_n", "R" -> "n_r"))
      .orderBy("l_linestatus")
  }

  /** Unpivot/melt: wide → long on the part price/size attributes. */
  def fnUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        col("p_retailprice").cast("double").as("retailprice"),
        col("p_size").cast("double").as("size"))
      .unpivot(
        ids = Array(col("p_partkey")),
        values = Array(col("retailprice"), col("size")),
        variableColumnName = "attr",
        valueColumnName = "val")
      .orderBy("p_partkey", "attr")
  }

  /** Column-profile operator — the data-quality pass a pipeline runs before
    * trusting a new drop: per column, row/null/distinct counts and a
    * min/max rendered as strings (type-erased so one schema fits every
    * column). One aggregation computes every column's stats in a single
    * scan; the wide→long reshape happens on the 1-row aggregate, not the
    * data.
    */
  def profileOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val df = Tables.orders(spark, sfDir)
    val aggs = df.columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val arms = df.columns.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__n").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"), col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_s"), col(s"${c}__max").as("max_s"))
    }
    one.select(explode(array(arms: _*)).as("p"))
      .select("p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct", "p.min_s", "p.max_s")
      .orderBy("col_name")
  }

  /** Correlation/covariance/stddev from exact decimal power sums. The
    * native `corr`/`stddev` (aggStats) need post-hoc rounding to absorb
    * merge-order float noise — fine at sf0.1, but the noise grows with
    * group size. This form is order-independent at ANY scale: the five
    * power sums are exact DECIMAL (summation commutes), and the closed-form
    * moments are computed once per group from identical exact inputs, so
    * both engines run the identical IEEE double expression. This is the
    * shape to use on a 1000-executor cluster where a group may span 10⁹
    * rows.
    */
  def aggCorrExact(spark: SparkSession, sfDir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,6)")
    val y = col("l_extendedprice").cast("decimal(18,6)")
    val n   = col("n").cast("double")
    val sx  = col("sx").cast("double")
    val sy  = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      .select(
        col("l_returnflag"),
        col("n"),
        round((n * sxy - sx * sy)
          / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("corr_qp"),
        round((n * sxy - sx * sy) / (n * n), 6).as("covar_pop"),
        round(sqrt((n * sxx - sx * sx) / (n * n)), 6).as("stddev_pop_q"),
        round(sx / n, 6).as("mean_q"))
      .orderBy("l_returnflag")
  }

  // ----------------------------------------------------------------- merge

  /** CDC-style MERGE (upsert + delete), the lakehouse table-maintenance
    * primitive, expressed as one full-outer join on the key: updates
    * override matched rows (COALESCE picks the change side first), inserts
    * arrive as unmatched change rows, and delete-flagged keys drop out.
    * Here the change set is derived deterministically from the base table
    * (open orders get a 10% price bump; every 97th finished order is
    * deleted; every 101st open order is re-inserted beyond the max key).
    * At scale: a single shuffle on the join key — and zero extra
    * exchange when the base is bucketed on it (sources.CuratedZone); the
    * output is the new table version, never driver-materialized.
    */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
    val updates = base.filter(col("o_orderstatus") === "O")
      .select(
        col("o_orderkey").as("u_orderkey"),
        // 2dp price × 1.1 lies on the 3dp grid — round there (a 2dp round
        // would sit exactly on the half-way boundary: cross-engine hazard).
        round(col("o_totalprice") * 1.1, 3).as("u_totalprice"),
        lit("U").as("u_orderstatus"))
    val deletes = base.filter(col("o_orderstatus") === "F" && pmod(col("o_orderkey"), lit(97)) === 0)
      .select(col("o_orderkey").as("u_orderkey"), lit(null).cast("double").as("u_totalprice"),
        lit("D").as("u_orderstatus"))
    val inserts = base.filter(col("o_orderstatus") === "O" && pmod(col("o_orderkey"), lit(101)) === 0)
      .select((col("o_orderkey") + 10000000L).as("u_orderkey"),
        round(col("o_totalprice"), 2).as("u_totalprice"),
        lit("I").as("u_orderstatus"))
    val changes = updates.unionByName(deletes).unionByName(inserts)
    base.join(changes, base("o_orderkey") === changes("u_orderkey"), "full_outer")
      .filter(coalesce(col("u_orderstatus"), lit("")) =!= "D")
      .select(
        coalesce(col("o_orderkey"), col("u_orderkey")).as("m_orderkey"),
        coalesce(col("u_totalprice"), col("o_totalprice")).as("m_totalprice"),
        coalesce(col("u_orderstatus"), col("o_orderstatus")).as("m_orderstatus"),
        col("o_custkey").as("m_custkey"))
      .orderBy("m_orderkey")
  }

  /** Referential-integrity audit — the data-quality gate a pipeline runs
    * on every new drop before publishing: for each FK relationship, how
    * many child rows have no parent (orphans) and how many parents have no
    * children (childless). Each check is a single pass: left join on the
    * key, count all + count unmatched in one aggregation — at 100 TB
    * that's a shuffle on the key and a scalar out; the dims stay
    * broadcast. A healthy drop reports zero orphans, and the oracle proves
    * the zeros are computed, not assumed.
    */
  def dqOrphans(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o  = Tables.orders(spark, sfDir)
    val c  = Tables.customer(spark, sfDir)
    val s  = Tables.supplier(spark, sfDir)
    def check(rel: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
      child.join(
          parent.select(col(parentKey).as("__pk")).distinct(),
          child(childKey) === col("__pk"), "left")
        .agg(
          count(lit(1)).as("n_child"),
          sum(when(col("__pk").isNull, 1).otherwise(0)).cast("long").as("n_orphans"))
        .select(lit(rel).as("rel"), col("n_child"), col("n_orphans"))
    check("lineitem_to_orders", li, "l_orderkey", o, "o_orderkey")
      .unionByName(check("lineitem_to_supplier", li, "l_suppkey", s, "s_suppkey"))
      .unionByName(check("orders_to_customer", o, "o_custkey", c, "c_custkey"))
      .unionByName(check("orders_childless", o, "o_orderkey", li.select(col("l_orderkey").as("k")), "k"))
      .orderBy("rel")
  }

  /** Blocked fuzzy entity resolution: match DIRTY records (here: customer
    * names with the last character corrupted — the planted-typo technique,
    * deterministic like the PII planting in TextAnalysis) back to the
    * canonical registry by edit distance, within nation blocks. Blocking
    * is what makes fuzzy matching scale: Levenshtein runs only inside a
    * block (equi-join on the blocking key = one shuffle), never all-pairs.
    * Threshold 2 admits the planted typo plus one digit of drift.
    *
    * Two exact DP-cost cuts (together ~6× on the bench): the constant
    * "Customer#" prefix is stripped before comparing — edit distance is
    * invariant under a shared prefix, so only the 9-char id parts enter
    * the DP — and Spark's 3-arg `levenshtein(a, b, k)` runs the BANDED
    * DP (O(k·n) not O(n²)), returning -1 above the threshold.
    */
  def fuzzyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val dirty = c.filter(pmod(col("c_custkey"), lit(10)) === 0)
      .select(
        col("c_custkey").as("d_key"),
        concat(substring(col("c_name"), 10, 8), lit("X")).as("d_sfx"),
        col("c_nationkey").as("d_nat"))
    val canon = c.select(
      col("c_custkey"),
      substring(col("c_name"), 10, 9).as("c_sfx"),
      col("c_nationkey"))
    // the dirty drop is the small side (a day's suspect records vs the
    // full registry): broadcast it so the registry never shuffles
    canon.join(broadcast(dirty), col("d_nat") === col("c_nationkey"))
      .withColumn("dist", levenshtein(col("d_sfx"), col("c_sfx"), 2))
      .filter(col("dist") =!= -1)
      .select(col("d_key"), col("c_custkey").as("matched_key"), col("dist"))
      .orderBy("d_key", "matched_key")
  }

  /** Surrogate-key sequence-gap audit — given a supposedly-contiguous key
    * extract (here: the `o_orderstatus = 'O'` export of a dense orderkey
    * sequence), report the missing ranges: the reconciliation check run
    * after any partial export/backfill. The naive form is lag() over ALL
    * keys in one global window — a single-partition sort that dies at
    * scale. This is the two-level decomposition instead: bucket keys into
    * fixed-width blocks (key div 8192), find within-block gaps from each
    * block's sorted key array (collect_list is bounded by the block width
    * — never a whole-partition collect), and stitch block boundaries with
    * a window over BLOCK SUMMARIES only (n/8192 rows — at 10⁹ keys that
    * window sees ~10⁵ rows, and can be re-blocked recursively if ever
    * needed). Top-100 widest gaps, integer-exact. The decomposition lives
    * in graft.operators.SequenceGaps; SequenceGapsPropSpec pins its
    * equivalence to the global-lag form on random key sets.
    */
  def dqSequenceGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey").as("k")).distinct()
    graft.operators.SequenceGaps.gaps(keys, "k", block = 8192)
      .orderBy(col("missing").desc, col("gap_start"))
      .limit(100)
  }

  /** Declarative rule-engine audit — N cross-field consistency rules
    * evaluated in ONE pass over the fact⋈orders join, emitted long-form
    * (rule, checked, violations, ppm, first offending key). Rules with
    * zero hits are negative controls proving the check ran; the
    * ship-before-order rule fires on this corpus (the generator ships
    * some lines before the order date). Adding a rule adds two
    * conditional aggregates to the same scan — cost stays one join + one
    * single-row aggregate regardless of rule count, then a constant-size
    * stack() to long form; this is how a DQ rulebook stays O(scan) at
    * 100 TB instead of one pass per rule.
    */
  def dqRuleViolations(spark: SparkSession, sfDir: String): DataFrame = {
    val j = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
    val rules: Seq[(String, Column)] = Seq(
      "discount_in_0_01"   -> (col("l_discount") < 0 || col("l_discount") > 0.1),
      "price_positive"     -> (col("l_extendedprice") <= 0),
      "quantity_positive"  -> (col("l_quantity") <= 0),
      "ship_before_order"  -> (col("l_shipdate") < col("o_orderdate")),
      "tax_in_0_008"       -> (col("l_tax") < 0 || col("l_tax") > 0.08))
    val aggs = count(lit(1)).as("n_checked") +: rules.flatMap { case (name, cond) =>
      Seq(count(when(cond, lit(1))).as(s"v_$name"),
        min(when(cond, col("l_orderkey"))).as(s"k_$name"))
    }
    val stacked = rules.map { case (name, _) =>
      s"'$name', v_$name, k_$name"
    }.mkString(s"stack(${rules.size}, ", ", ", ")")
    j.agg(aggs.head, aggs.tail: _*)
      .select(col("n_checked"), expr(s"$stacked AS (rule, n_violations, first_bad_key)"))
      .withColumn("violation_ppm", expr("n_violations * 1000000 div n_checked"))
      .select("rule", "n_checked", "n_violations", "violation_ppm", "first_bad_key")
      .orderBy("rule")
  }

  /** IQR outlier audit (Tukey fences): per group, exact quartiles → count
    * rows outside [q1 − 1.5·IQR, q3 + 1.5·IQR] — the distributional DQ
    * check next to dq_orphans' relational one. Two passes: a tiny
    * per-group quartile aggregate (broadcast back), then one scan
    * counting against the fences. Fences stay UNROUNDED in the
    * comparison (both engines evaluate the identical double expression);
    * rounding only formats the output.
    */
  def dqOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val quartiles = li.groupBy(col("l_returnflag").as("rf"))
      .agg(
        expr("percentile(l_extendedprice, 0.25)").as("q1"),
        expr("percentile(l_extendedprice, 0.75)").as("q3"))
    val lo = col("q1") - lit(1.5) * (col("q3") - col("q1"))
    val hi = col("q3") + lit(1.5) * (col("q3") - col("q1"))
    li.join(broadcast(quartiles), col("l_returnflag") === col("rf"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < lo, 1).otherwise(0)).cast("long").as("n_low"),
        sum(when(col("l_extendedprice") > hi, 1).otherwise(0)).cast("long").as("n_high"),
        // lo/hi are group-constant; min is just the deterministic picker
        round(min(lo), 4).as("fence_lo"),
        round(min(hi), 4).as("fence_hi"))
      .orderBy("l_returnflag")
  }

  /** Robust (MAD) outlier audit — the quartile fences above break when a
    * quarter of the data is already bad; median absolute deviation has a
    * 50% breakdown point. Two broadcast-back passes: per-type median, then
    * the median of absolute deviations, then one counting scan against
    * |x − med| > 3·MAD. Exact `percentile` ≡ DuckDB `quantile_cont`
    * (interpolation is the identical (a+b)/2 on identical doubles), and
    * the comparison runs on the unrounded doubles — rounding only formats
    * output.
    */
  def dqMadOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val med = ev.groupBy(col("event_type").as("et"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withDev = ev.join(broadcast(med), col("event_type") === col("et"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = withDev.groupBy(col("event_type").as("et2"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    withDev.join(broadcast(mad), col("event_type") === col("et2"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("dev") > lit(3.0) * col("mad"), 1).otherwise(0)).cast("long").as("n_outliers"),
        round(min(col("med")), 6).as("med"),
        round(min(col("mad")), 6).as("mad"))
      .orderBy("event_type")
  }

  /** Per-group OLS (y = extendedprice on x = quantity) with residual
    * score-back — the "fit then score" shape every model-assisted curation
    * pass follows. Coefficients come from one pass of exact decimal power
    * sums (the agg_corr_exact idiom: sums are order-free, divisions happen
    * once on the aggregated scalars); the per-row residual classification
    * broadcast-joins the 3-row coefficient table back and compares in
    * IEEE double — both engines evaluate the identical rounded-coefficient
    * expression, so the comparison resolves identically. At scale: one
    * shuffle for the sums, zero for the scoring pass (broadcast).
    */
  def aggLinregr(spark: SparkSession, sfDir: String): DataFrame =
    linregrOf(Tables.lineitem(spark, sfDir), "l_returnflag",
      col("l_quantity"), col("l_extendedprice"))

  /** The fit-then-score pass over any frame — public so crafted exact-line
    * corpora can pin slope/intercept/r² against closed forms (`StatSpec`),
    * the mirror-oracle countermeasure.
    */
  def linregrOf(df: DataFrame, groupCol: String, xc: Column, yc: Column): DataFrame = {
    val n   = col("n").cast("double")
    val sx  = col("sx").cast("double")
    val sy  = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    val li = df.withColumn("__x", xc).withColumn("__y", yc)
    val x = col("__x").cast("decimal(18,6)")
    val y = col("__y").cast("decimal(18,6)")
    val coef = li
      .groupBy(col(groupCol).as("rf"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      .select(
        col("rf"), col("n").as("n_fit"),
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).as("slope"),
        round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 6).as("intercept"),
        round(pow(n * sxy - sx * sy, 2)
          / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("r2"))
    li.join(broadcast(coef), col(groupCol) === col("rf"))
      .groupBy(col(groupCol))
      .agg(
        // coefficients are group-constant; min is the deterministic picker
        min(col("n_fit")).as("n_fit"),
        min(col("slope")).as("slope"),
        min(col("intercept")).as("intercept"),
        min(col("r2")).as("r2"),
        sum(when(col("__y") > col("slope") * col("__x") + col("intercept"), 1)
          .otherwise(0)).cast("long").as("n_above_fit"))
      .orderBy(groupCol)
  }

  /** Welch two-sample test (A/B experiment readout): each event type's
    * `value` distribution against the 'view' control. To keep every number
    * on the deterministic grid we report t² (not t — no sqrt) and the
    * Welch–Satterthwaite df, both rational functions of the exact decimal
    * power sums; the single double division + ROUND(…,6) per output is the
    * one float step, evaluated on identical aggregated scalars in both
    * engines. At scale: one shuffle for the 5-row sums table, the control
    * row re-attached via the broadcast scalar-attach idiom.
    */
  def dqAbTtest(spark: SparkSession, sfDir: String): DataFrame =
    welchOf(Tables.events(spark, sfDir), "view")

  /** The Welch readout over any (event_type, value) frame — public so
    * crafted equal-variance corpora can pin t² and df against the
    * closed-form df = 2n−2 case (`StatSpec`).
    */
  def welchOf(events: DataFrame, controlType: String): DataFrame = {
    val v = col("value").cast("decimal(24,8)")
    val sums = events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(v).as("s"), sum(v * v).as("ss"))
    def mean(p: String) = col(p + "s").cast("double") / col(p + "n").cast("double")
    def varOf(p: String) = {
      val n = col(p + "n").cast("double")
      (col(p + "ss").cast("double") - col(p + "s").cast("double") * col(p + "s").cast("double") / n) / (n - 1)
    }
    val control = sums.filter(col("event_type") === controlType)
      .select(col("n").as("c_n"), col("s").as("c_s"), col("ss").as("c_ss"))
    val se2 = varOf("") / col("n").cast("double") + varOf("c_") / col("c_n").cast("double")
    sums.filter(col("event_type") =!= controlType)
      .crossJoin(broadcast(control))
      .select(
        col("event_type"),
        col("n").as("n_treat"),
        col("c_n").as("n_control"),
        round(mean("") - mean("c_"), 6).as("mean_diff"),
        round(pow(mean("") - mean("c_"), 2) / se2, 6).as("t2_welch"),
        round(pow(se2, 2)
          / (pow(varOf("") / col("n").cast("double"), 2) / (col("n").cast("double") - 1)
            + pow(varOf("c_") / col("c_n").cast("double"), 2) / (col("c_n").cast("double") - 1)),
          6).as("df_welch"))
      .orderBy("event_type")
  }

  /** K-anonymity audit over the (nationkey, mktsegment) quasi-identifier:
    * for each disclosure threshold k, how many equivalence classes — and
    * how many ROWS — are re-identifiable (class size < k). The PII
    * counterpart to text_pii_scrub: scrubbing direct identifiers is not
    * enough when the joint distribution of the remaining columns is
    * peaked. One shuffle builds the class histogram (bounded by QI
    * cardinality, here ≤ 25×5); the threshold sweep is conditional
    * aggregation over that summary, stacked to long form.
    */
  def dqKAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    val classes = Tables.customer(spark, sfDir)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
    val ks = Seq(2, 5, 10, 20)
    val aggs = Seq(
      count(lit(1)).as("n_classes"),
      sum(col("cnt")).as("n_rows"),
      min(col("cnt")).cast("long").as("min_class")) ++ ks.flatMap { k =>
      Seq(
        count(when(col("cnt") < k, lit(1))).as(s"c_$k"),
        coalesce(sum(when(col("cnt") < k, col("cnt"))), lit(0L)).as(s"r_$k"))
    }
    val stacked = ks.map(k => s"$k, c_$k, r_$k").mkString(
      s"stack(${ks.size}, ", ", ", ")")
    classes.agg(aggs.head, aggs.tail: _*)
      .select(col("n_classes"), col("n_rows"), col("min_class"),
        expr(s"$stacked AS (k, classes_at_risk, rows_at_risk)"))
      .withColumn("risk_ppm", expr("rows_at_risk * 1000000 div n_rows"))
      .select("k", "n_classes", "n_rows", "min_class",
        "classes_at_risk", "rows_at_risk", "risk_ppm")
      .orderBy("k")
  }

  /** Incremental materialized-view maintenance: the monthly rollup is kept
    * as MERGEABLE PARTIALS (count + exact decimal sum — both commutative
    * monoids), so refreshing with a new data drop re-aggregates only the
    * increment and merges, never rescanning history. Here the "stored" MV
    * and the increment are split at a cutoff date and merged; the oracle
    * recomputes the rollup from the full table directly — hash equality IS
    * the proof that merge(partials) ≡ full recompute. Derived metrics
    * (avg) are computed from merged partials at read time, never stored
    * (avg is not mergeable). At 100 TB this is the difference between an
    * O(day) nightly refresh and an O(history) one.
    */
  def mvIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val cutoff = to_timestamp(lit("1999-01-01"))
    def partials(df: DataFrame): DataFrame =
      df.groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(
          count(lit(1)).as("pn"),
          sum(col("o_totalprice").cast("decimal(30,6)")).as("pt"))
    val stored = partials(o.filter(col("o_orderdate") < cutoff))
    val increment = partials(o.filter(col("o_orderdate") >= cutoff))
    stored.unionByName(increment)
      .groupBy("month")
      .agg(sum(col("pn")).as("n_orders"), sum(col("pt")).as("total_d"))
      .select(
        col("month"),
        col("n_orders"),
        col("total_d").cast("double").as("total"),
        round(col("total_d").cast("double") / col("n_orders"), 6).as("avg_price"))
      .orderBy("month")
  }

  /** Supplier revenue rollup routed through the SALTED join path
    * (`operators.SkewJoin`): lineitem's l_suppkey is the canonical hot-key
    * distribution (10 suppliers absorb the whole fact table at sf0.001), so
    * the plain hash join sends each supplier's entire slice to one reducer.
    * Salting spreads every supplier over 8 (key, salt) sub-keys for the
    * join, then the rollup re-aggregates. The oracle is the UNsalted join —
    * hash equality proves salting is result-invariant, the property that
    * lets a planner apply it blindly to any skewed equi-join. Revenue rides
    * DECIMAL(30,6) (order-independent), quantities are exact small integers
    * in double.
    */
  def joinSkewSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice").cast("decimal(30,6)").as("price"))
    val supp = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    graft.operators.SkewJoin.saltedInnerJoin(li, supp, "l_suppkey", saltFactor = 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("total_qty"),
        sum(col("price")).cast("double").as("revenue"))
      .orderBy("s_name")
  }

  /** Semi-join through a hand-built Bloom runtime filter — the DIY version
    * of Spark's injected bloom join pruning (RuntimeFilterSpec pins the
    * built-in one): the high-balance customers' order keys compress into a
    * 1024-bit / 3-hash filter (32×32-bit words, one 1-row array built by 32
    * bit_or aggs), broadcast to the fact scan as a PURE ROW-LOCAL predicate
    * that drops ~all non-matching lineitems before the shuffle; the exact
    * semi-join then removes Bloom false positives. The oracle is the plain
    * semi-join — hash equality proves the prefilter is result-invariant,
    * which is what lets a planner inject it blindly. At 100 TB this is THE
    * shuffle-volume lever when the build side is selective but too big to
    * broadcast as an exact set.
    */
  def joinBloomPrune(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Hashing
    val BloomBits = 1024
    val Hashes = 3
    def cells(key: org.apache.spark.sql.Column) = (0 until Hashes).map { i =>
      pmod(Hashing.hash60(concat_ws(":", lit(i), key)), lit(BloomBits))
    }
    val keys = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir).filter(col("c_acctbal") > 9000.0),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"))
    val bloom = keys
      .select(explode(array(cells(col("o_orderkey")): _*)).as("bit"))
      .select((col("bit") / 32).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))").as("mask"))
      .groupBy()
      .agg(bit_or(when(col("word") === 0, col("mask")).otherwise(lit(0L))).as("w0"),
        (1 until 32).map(w =>
          bit_or(when(col("word") === w, col("mask")).otherwise(lit(0L))).as(s"w$w")): _*)
      .select(array((0 until 32).map(w => col(s"w$w")): _*).as("bloom"))
    val prefiltered = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
        col("l_extendedprice").cast("decimal(30,6)").as("price"))
      .crossJoin(broadcast(bloom))
    val withHits = (0 until Hashes).foldLeft(prefiltered) { (df, i) =>
      df.withColumn(s"c$i",
          pmod(Hashing.hash60(concat_ws(":", lit(i), col("l_orderkey"))), lit(BloomBits)))
        .withColumn(s"hit$i",
          element_at(col("bloom"), (col(s"c$i") / 32).cast("int") + 1)
            .bitwiseAND(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(c$i % 32 AS INT))")) =!= 0)
    }
    withHits
      .filter((0 until Hashes).map(i => col(s"hit$i")).reduce(_ && _))
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("total_qty"),
        sum(col("price")).cast("double").as("revenue"))
      .orderBy("l_returnflag")
  }

  /** Quantity-weighted average price (VWAP shape) per return flag: both
    * sides of the ratio are EXACT decimal/integer sums (order-independent
    * at any scale), and the displayed ratio divides those identical exact
    * values as doubles — never an engine's decimal-division scale rules
    * (Spark and DuckDB disagree on quotient scale, so the division happens
    * after the exact sums are fixed). One map-side-combined groupBy.
    */
  def aggVwap(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("q"),
        col("l_extendedprice").cast("decimal(18,6)").as("p"))
      .groupBy("l_returnflag")
      .agg(sum(col("p") * col("q")).as("pq"), sum(col("q")).as("qty"))
      .select(col("l_returnflag"),
        col("pq").cast("double").as("price_qty"),
        col("qty"),
        round(col("pq").cast("double") / col("qty").cast("double"), 6).as("vwap"))
      .orderBy("l_returnflag")
  }

  /** Star-schema rollup — revenue by (region, brand): the canonical OLAP
    * star join. Every dimension chain (part; supplier→nation→region) is
    * broadcast-sized by construction at ANY fact-table scale, so the plan
    * is a straight line of BroadcastHashJoins over one fact scan, then one
    * map-side-combined groupBy on the tiny (region × brand) key space.
    */
  def joinStarRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice").cast("decimal(30,6)").as("price"))
    val part = Tables.part(spark, sfDir).select("p_partkey", "p_brand")
    val geo = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, sfDir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "r_name")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(geo), col("l_suppkey") === col("s_suppkey"))
      .groupBy("r_name", "p_brand")
      .agg(count(lit(1)).as("n"), sum(col("price")).cast("double").as("revenue"))
      .orderBy("r_name", "p_brand")
  }

  /** 2-D histogram (quantity band × discount cell) with per-cell revenue —
    * the heatmap/profile grid behind pricing dashboards. Both bucket ids
    * are exact integer arithmetic (quantity is a small integer in double;
    * discount lives on a 2dp grid, so ×100 + round is exact); one groupBy
    * over a ≤10×11 key space — the histogram of 100 TB is a few dozen rows.
    */
  def aggHistogram2d(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .select(
        expr("CAST((CAST(l_quantity AS INT) - 1) div 5 AS INT)").as("qty_band"),
        round(col("l_discount") * 100).cast("int").as("disc_pct"),
        col("l_extendedprice").cast("decimal(30,6)").as("price"))
      .groupBy("qty_band", "disc_pct")
      .agg(count(lit(1)).as("n"), sum(col("price")).cast("double").as("revenue"))
      .orderBy("qty_band", "disc_pct")
  }

  /** Market-basket brand affinity — association mining's support/lift over
    * orders: distinct (order, brand) first (bounds the self-join at any
    * scale: pairs-per-order is quadratic in the BRAND-cardinality cap, not
    * order size), canonical a<b pair join on the order key, lift in exact
    * integer ppm via cross-multiplication (support·N·10⁶ div (nₐ·n_b) —
    * no float probabilities). Support floor keeps the report to real
    * signals.
    */
  def mbaBrandPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val ob = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      .join(broadcast(Tables.part(spark, sfDir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    val nOrders = ob.agg(countDistinct(col("okey")).as("n_orders"))
    val brandN = ob.groupBy("brand").agg(count(lit(1)).as("bn"))
    // (measured dead end: generating pairs in-row from per-order
    // collect_set + nested transform/flatten removes one shuffle but runs
    // ~20% SLOWER locally — the struct-array explode and aggregation
    // buffers cost more than the hash self-join they replace.)
    val pairs = ob.as("a")
      .join(ob.as("b"), col("a.okey") === col("b.okey") && col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 5)
    pairs
      .join(broadcast(brandN.withColumnRenamed("brand", "brand_a")
        .withColumnRenamed("bn", "na")), "brand_a")
      .join(broadcast(brandN.withColumnRenamed("brand", "brand_b")
        .withColumnRenamed("bn", "nb")), "brand_b")
      .crossJoin(broadcast(nOrders))
      .withColumn("lift_ppm",
        expr("support * n_orders * 1000000 div (na * nb)"))
      .select(col("brand_a"), col("brand_b"), col("support"),
        col("na"), col("nb"), col("lift_ppm"))
      .orderBy("brand_a", "brand_b")
  }

  /** The as-of join again, through the NATIVE sorted-merge physical
    * operator (org.apache.spark.sql.graft.AsOfJoinExec — custom
    * LogicalPlan + SparkStrategy + SparkPlan): one forward pass per
    * co-partition, primitive long comparisons, O(1) state — versus the
    * union+window form's per-key sort buffer carrying every payload
    * column. Same oracle as `join_asof` (DuckDB ASOF LEFT JOIN):
    * hash-equality across three independent implementations (window form,
    * native exec, DuckDB) pins the semantics; `NativeAsOfSpec` A/Bs the
    * two Spark forms row-for-row on edge cases.
    */
  def joinAsofNative(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id").as("k"), col("ts"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("rk"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    org.apache.spark.sql.graft.NativeAsOf.joinLeftAsOf(
        left = e, right = o,
        leftKey = "k", leftTime = "ts",
        rightKey = "rk", rightTime = "o_orderdate",
        tieBreak = "o_orderkey")
      .select(
        col("event_id"),
        col("k").as("user_id"),
        col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("event_id")
  }

  /** As-of join with a STALENESS TOLERANCE — the feature-store variant: a
    * reference older than 30 days is no feature at all (concept drift), so
    * the match is kept only within the window, else null. Same single
    * merge pass as `join_asof_native`; the tolerance is a post-join
    * null-out (exact integer microsecond compare), NOT a different join —
    * which is why the oracle is the plain ASOF LEFT JOIN wrapped in the
    * same CASE.
    */
  def joinAsofTolerance(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id").as("k"), col("ts"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("rk"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    val tolMicros = 30L * 86400L * 1000000L
    val fresh = unix_micros(col("ts")) -
      unix_micros(col("o_orderdate").cast("timestamp")) <= tolMicros
    org.apache.spark.sql.graft.NativeAsOf.joinLeftAsOf(
        left = e, right = o,
        leftKey = "k", leftTime = "ts",
        rightKey = "rk", rightTime = "o_orderdate",
        tieBreak = "o_orderkey")
      .select(
        col("event_id"),
        col("k").as("user_id"),
        when(fresh, col("o_orderkey")).as("o_orderkey"),
        when(fresh, col("o_totalprice")).as("o_totalprice"))
      .orderBy("event_id")
  }

  /** Point-in-time-correct TWO-SOURCE feature join — the feature-store
    * backfill shape: for every purchase, the state of two independent
    * reference streams AS OF that instant (latest prior click; latest
    * prior order), with zero future leakage. Two native as-of merges
    * compose left-to-right — each is one key-clustered exchange + merge
    * pass, and the second reuses the first's output partitioning (both
    * cluster on the same user key), so the plan stays
    * exchange-exchange-merge-merge with no row explosion anywhere.
    */
  def joinAsofMulti(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("k"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("ck"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("ok"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    val withClick = org.apache.spark.sql.graft.NativeAsOf.joinLeftAsOf(
      left = purchases, right = clicks,
      leftKey = "k", leftTime = "ts",
      rightKey = "ck", rightTime = "c_ts", tieBreak = "click_id")
    org.apache.spark.sql.graft.NativeAsOf.joinLeftAsOf(
        left = withClick, right = orders,
        leftKey = "k", leftTime = "ts",
        rightKey = "ok", rightTime = "o_orderdate", tieBreak = "o_orderkey")
      .select(
        col("p_id"),
        col("k").as("user_id"),
        col("click_id").as("last_click_id"),
        col("o_orderkey").as("last_order_key"),
        col("o_totalprice").as("last_order_price"))
      .orderBy("p_id")
  }

  /** 2-D SKYLINE (Pareto frontier) — the classic OLAP "best tradeoffs"
    * operator (Börzsönyi et al., ICDE'01): lineitems not dominated on
    * (price higher-better, shipdate later-better). Naive skyline is an
    * O(n²) NOT EXISTS self-join; this is the distributed two-phase form
    * collapsed into relational algebra: (1) per-DATE local prune — only
    * the max price at each date can survive (a same-date higher price
    * dominates strictly), one map-side-combined groupBy; (2) the global
    * pass runs over DISTINCT DATES ONLY — a date's champion survives iff
    * its price beats every later date's champion, i.e. a running-max ROWS
    * window over the date-descending sequence. Dominance is transitive,
    * so pruned rows can never re-enter: the result is exactly the
    * skyline. The window input is calendar-bounded (dates, not rows) at
    * any corpus size; everything row-scale is a plain aggregation. Pure
    * comparisons/selections — no float arithmetic anywhere.
    */
  def aggSkyline(spark: SparkSession, sfDir: String): DataFrame = {
    val pts = Tables.lineitem(spark, sfDir)
      .select(col("l_shipdate").as("d"), col("l_extendedprice").as("p"))
    val perDate = pts.groupBy("d", "p").agg(count(lit(1)).as("n"))
    val byPrice = Window.partitionBy("d").orderBy(col("p").desc)
    val champs = perDate
      .withColumn("rn", row_number().over(byPrice))
      .filter(col("rn") === 1)
      .select(col("d"), col("p"), col("n"))
    // distinct ship DATES only — calendar-bounded (~2.5k rows for 7 years),
    // marked with the boundedPartition idiom for the PlanSpec window guard
    val laterMax = Window
      .partitionBy(graft.operators.BlockedRank.boundedPartition(col("d")))
      .orderBy(col("d").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    champs
      .withColumn("later_max", max(col("p")).over(laterMax))
      .filter(col("later_max").isNull || col("p") > col("later_max"))
      .select(col("d").as("sky_date"), col("p").as("sky_price"), col("n").as("n_dup"))
      .orderBy("sky_date")
  }

  /** Winsorized mean — outlier-robust central tendency: clip at the exact
    * per-group [p05, p95] percentiles, then average. Clipping is pure
    * selection (least/greatest on identical doubles), percentile
    * interpolation runs on identically-sorted identical doubles
    * (`agg_percentile` pins cross-engine equality), and the mean follows
    * the house decimal discipline: clipped values land on the 6dp grid
    * via DECIMAL(30,6), summed exactly, one final division. Two passes
    * over the group (percentiles, then clip+sum) sharing one shuffle key
    * — the standard shape when an aggregate depends on a group statistic.
    */
  def aggWinsorized(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice").as("p"))
    val fences = li.groupBy("l_returnflag").agg(
      expr("percentile(p, 0.05)").as("p05"),
      expr("percentile(p, 0.95)").as("p95"))
    li.join(broadcast(fences), "l_returnflag")
      .withColumn("clipped",
        least(greatest(col("p"), col("p05")), col("p95")).cast("decimal(30,6)"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(first(col("p05")), 6).as("p05"),
        round(first(col("p95")), 6).as("p95"),
        round(sum(col("clipped")).cast("double") / count(lit(1)), 6).as("win_mean"),
        round(sum(col("p").cast("decimal(30,6)")).cast("double") / count(lit(1)), 6)
          .as("raw_mean"))
      .orderBy("l_returnflag")
  }

  /** Two-phase SALTED aggregation — the skew-safe groupBy. A low-cardinality
    * group key (3 return flags over the whole fact table) concentrates each
    * group's rows onto one reducer; salting splits every group across 16
    * sub-keys first, so phase 1 produces 16 bounded partials per group and
    * phase 2 merges 48 tiny rows. Correct only because the aggregate state
    * is MERGEABLE — counts add, and DECIMAL(30,6) sums add exactly in any
    * order (a float sum would drift between the salted and unsalted plans).
    * The oracle is the plain one-phase GROUP BY: hash equality proves
    * salting is result-invariant, the same guarantee `join_skew_salted`
    * pins for joins.
    */
  def aggSaltedTwophase(spark: SparkSession, sfDir: String): DataFrame = {
    val partial = Tables.lineitem(spark, sfDir)
      .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("l_quantity").cast("decimal(30,6)")).as("pq"))
    partial
      .groupBy("l_returnflag")
      .agg(
        sum(col("pn")).as("n"),
        sum(col("pq")).cast("double").as("sum_qty"),
        round(sum(col("pq")).cast("double") / sum(col("pn")), 6).as("avg_qty"))
      .orderBy("l_returnflag")
  }

  /** Weighted median (lower) of price weighted by quantity, per group —
    * "the price at which half the shipped VOLUME clears", robust where the
    * row-median isn't. One keyed shuffle + per-key sort: cumulative weight
    * along ascending price, first row whose cumweight doubles past the
    * total is the answer. The qualifying set is a suffix of the sort, so
    * `min(price)` over it IS that first row — no second window needed.
    * Weights stay exact BIGINTs (quantities are integers), so `2·cum ≥ tot`
    * is an integer compare in both engines; no float accumulation anywhere.
    */
  def aggWeightedMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(
      col("l_returnflag"),
      col("l_extendedprice").as("price"),
      col("l_quantity").cast("bigint").as("w"),
      col("l_orderkey"), col("l_linenumber"))
    // hierarchical per-flag running weight (l_returnflag has THREE values
    // — the naive per-flag window is a single-task pass over a third of
    // lineitem at any scale): blocks = price rounded to hundreds (a
    // monotone coarsening of the (price, orderkey, linenumber) order;
    // ~10^3 blocks over the TPC-H price range — integer price made the
    // summary 100x bigger and benched 2.5 s), partials per (flag,
    // block), offsets over the bounded price-grid summary.
    // PrefixValue emits exactly the inclusive running sum + grand total
    // the two windows computed.
    import graft.operators.BlockedRank
    BlockedRank.blockedPrefix(
        li,
        partition = Seq("l_returnflag"),
        blocks = Seq(("__wm_b", round(col("price"), -2))),
        blockDesc = Seq(false),
        localOrder = Seq(col("price"), col("l_orderkey"), col("l_linenumber")),
        outRank = "__wm_r", outTotalN = "__wm_n",
        values = Seq(BlockedRank.PrefixValue(col("w"), "cum", "tot")),
        broadcastOffsets = true)
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("l_returnflag")
      .agg(min(col("price")).as("wmedian"), max(col("tot")).as("total_w"))
      .orderBy("l_returnflag")
  }

  /** Exact order statistics by rank — the rows at the exact quartile ranks
    * (N·k div 4, k = 1..3) of the (o_totalprice, o_orderkey) total order,
    * WITHOUT a global sort: [[graft.operators.BlockedRank.selectByRank]]
    * pins each requested rank to its owning price-block from a bounded
    * block summary and sorts ONLY those blocks (3 of them), so the
    * distributed k-th-element cost is one groupBy shuffle + three
    * block-local sorts at any corpus size. The rank list itself derives
    * from the count aggregate inside the plan — no collect. (This is the
    * exact-selection complement to `agg_percentile`'s interpolating form.)
    */
  def aggRankSelect(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank._
    val o = Tables.orders(spark, sfDir)
      .select(col("o_totalprice"), col("o_orderkey"))
    val ranks = o.agg(count(lit(1)).as("__N"))
      .select(explode(sequence(lit(1L), lit(3L))).as("__k"), col("__N"))
      .select(greatest(lit(1L), idiv(col("__N") * col("__k"), lit(4L))).as("__r"))
      .distinct()
    selectByRank(o,
      Seq("__b" -> floor(col("o_totalprice"))), Seq(false),
      Seq(col("o_totalprice"), col("o_orderkey")), ranks, "rank_at")
      .select(col("rank_at"), col("o_totalprice"), col("o_orderkey"))
      .orderBy("rank_at")
  }

  /** Gini concentration of order value per priority class — the standard
    * inequality index ("how concentrated is revenue across orders"), in
    * EXACT integer arithmetic: G = Σ(2·rankᵢ − n − 1)·xᵢ / (n·Σxᵢ) over
    * the (cents, orderkey) total order, reported in integer ppm. Ranks
    * come from [[graft.operators.BlockedRank.blockedPrefix]] partitioned
    * by priority (block = the million-cent value band) — no per-class
    * global sort; numerator/denominator accumulate as DECIMAL(38,0)
    * (rank·cents products reach ~10²⁶ at 10⁹ rows), and the single
    * division at the end is integral — bit-stable at any scale.
    */
  def aggGini(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank._
    val o = Tables.orders(spark, sfDir).select(
      col("o_orderpriority").as("pri"),
      round(col("o_totalprice") * 100).cast("bigint").as("cents"),
      col("o_orderkey"))
    blockedPrefix(o, Seq("pri"),
      Seq("__b" -> idiv(col("cents"), lit(1000000L))), Seq(false),
      Seq(col("cents"), col("o_orderkey")), "rk", "n")
      .groupBy("pri")
      .agg(
        max(col("n")).as("n_orders"),
        sum((col("rk") * 2 - col("n") - 1).cast("decimal(38,0)")
          * col("cents")).as("num"),
        sum(col("cents").cast("decimal(38,0)")).as("den"))
      .select(col("pri"), col("n_orders"),
        expr("CAST((num * 1000000) div (n_orders * den) AS BIGINT)")
          .as("gini_ppm"))
      .orderBy("pri")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_asof_native" -> (joinAsofNative _),
    "join_asof_tolerance" -> (joinAsofTolerance _),
    "join_asof_multi"  -> (joinAsofMulti _),
    "agg_rank_select"  -> (aggRankSelect _),
    "agg_gini"         -> (aggGini _),
    "agg_skyline"      -> (aggSkyline _),
    "agg_winsorized"   -> (aggWinsorized _),
    "agg_salted_twophase" -> (aggSaltedTwophase _),
    "agg_weighted_median" -> (aggWeightedMedian _),
    "mba_brand_pairs"  -> (mbaBrandPairs _),
    "agg_histogram2d"  -> (aggHistogram2d _),
    "agg_vwap"         -> (aggVwap _),
    "join_star_rollup" -> (joinStarRollup _),
    "join_bloom_prune" -> (joinBloomPrune _),
    "join_skew_salted" -> (joinSkewSalted _),
    "profile_orders" -> (profileOrders _),
    "mv_incremental" -> (mvIncremental _),
    "agg_pivot"      -> (aggPivot _),
    "fn_unpivot"     -> (fnUnpivot _),
    "filter_pred"    -> (filterPred _),
    "project_prune"  -> (projectPrune _),
    "join_inner"     -> (joinInner _),
    "join_broadcast" -> (joinBroadcast _),
    "join_left"      -> (joinLeft _),
    "join_full"      -> (joinFull _),
    "join_semi"      -> (joinSemi _),
    "join_anti"      -> (joinAnti _),
    "join_range_band" -> (joinRangeBand _),
    "join_cross"     -> (joinCross _),
    "join_asof"      -> (joinAsof _),
    "join_asof_nearest" -> (joinAsofNearest _),
    "join_interval_overlap" -> (joinIntervalOverlap _),
    "join_asof_fwd"  -> (joinAsofFwd _),
    "join_interval_bucket" -> (joinIntervalBucket _),
    "agg_sum_q1"     -> (aggSumQ1 _),
    "agg_distinct"   -> (aggDistinct _),
    "agg_approx"     -> (aggApprox _),
    "agg_sketch_merge" -> (aggSketchMerge _), // rows-only: sketch estimates are impl-specific
    "agg_argmax"     -> (aggArgmax _),
    "agg_mode"       -> (aggMode _),
    "agg_rollup"     -> (aggRollup _),
    "agg_cube"       -> (aggCube _),
    "agg_filtered"   -> (aggFiltered _),
    "agg_collect"    -> (aggCollect _),
    "agg_percentile" -> (aggPercentile _),
    "agg_stats"      -> (aggStats _),
    "agg_corr_exact" -> (aggCorrExact _),
    "merge_upsert"   -> (mergeUpsert _),
    "dq_orphans"     -> (dqOrphans _),
    "dq_sequence_gaps" -> (dqSequenceGaps _),
    "dq_rule_violations" -> (dqRuleViolations _),
    "dq_outliers"    -> (dqOutliers _),
    "dq_mad_outliers" -> (dqMadOutliers _),
    "agg_linregr"    -> (aggLinregr _),
    "dq_ab_ttest"    -> (dqAbTtest _),
    "dq_k_anonymity" -> (dqKAnonymity _),
    "fuzzy_join"     -> (fuzzyJoin _),
    "join_nullsafe"  -> (joinNullsafe _),
  )

  private val profileOracle: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    cols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_s, CAST(MAX($c) AS VARCHAR) AS max_s
         |FROM orders""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
  }

  override def oracles: Map[String, String] = Map(
    "join_asof_native" ->
      """WITH o1 AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |), o2 AS (
        |  SELECT o1.o_custkey, o1.o_orderdate, o1.o_orderkey, o.o_totalprice
        |  FROM o1 JOIN orders o ON o1.o_orderkey = o.o_orderkey
        |)
        |SELECT e.event_id, e.user_id, o2.o_orderkey, o2.o_totalprice
        |FROM events e
        |ASOF LEFT JOIN o2 ON e.user_id = o2.o_custkey AND e.ts >= o2.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "join_asof_tolerance" ->
      """WITH o1 AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |), o2 AS (
        |  SELECT o1.o_custkey, o1.o_orderdate, o1.o_orderkey, o.o_totalprice
        |  FROM o1 JOIN orders o ON o1.o_orderkey = o.o_orderkey
        |)
        |SELECT e.event_id, e.user_id,
        |  CASE WHEN epoch_us(e.ts) - epoch_us(o2.o_orderdate) <= 2592000000000
        |       THEN o2.o_orderkey END AS o_orderkey,
        |  CASE WHEN epoch_us(e.ts) - epoch_us(o2.o_orderdate) <= 2592000000000
        |       THEN o2.o_totalprice END AS o_totalprice
        |FROM events e
        |ASOF LEFT JOIN o2 ON e.user_id = o2.o_custkey AND e.ts >= o2.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "join_asof_multi" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |), c1 AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        |), o1 AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |), o2 AS (
        |  SELECT o1.o_custkey, o1.o_orderdate, o1.o_orderkey, o.o_totalprice
        |  FROM o1 JOIN orders o ON o1.o_orderkey = o.o_orderkey
        |), pc AS (
        |  SELECT p.p_id, p.user_id, p.ts, c1.click_id
        |  FROM p ASOF LEFT JOIN c1
        |    ON p.user_id = c1.user_id AND p.ts >= c1.ts
        |)
        |SELECT pc.p_id, pc.user_id, pc.click_id AS last_click_id,
        |  o2.o_orderkey AS last_order_key, o2.o_totalprice AS last_order_price
        |FROM pc ASOF LEFT JOIN o2
        |  ON pc.user_id = o2.o_custkey AND pc.ts >= o2.o_orderdate
        |ORDER BY pc.p_id""".stripMargin,
    "agg_skyline" ->
      """WITH perdate AS (
        |  SELECT l_shipdate AS d, l_extendedprice AS p, COUNT(*) AS n
        |  FROM lineitem GROUP BY d, p
        |), champs AS (
        |  SELECT d, p, n FROM (
        |    SELECT d, p, n, row_number() OVER (PARTITION BY d ORDER BY p DESC) AS rn
        |    FROM perdate) WHERE rn = 1
        |), marked AS (
        |  SELECT d, p, n,
        |    MAX(p) OVER (ORDER BY d DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS later_max
        |  FROM champs
        |)
        |SELECT d AS sky_date, p AS sky_price, n AS n_dup
        |FROM marked WHERE later_max IS NULL OR p > later_max
        |ORDER BY sky_date""".stripMargin,
    "agg_gini" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey) AS rk,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders
        |)
        |SELECT pri, MAX(n) AS n_orders,
        |  CAST(SUM((2 * rk - n - 1) * cents) * 1000000
        |       // (MAX(n) * SUM(cents)) AS BIGINT) AS gini_ppm
        |FROM r GROUP BY pri ORDER BY pri""".stripMargin,
    "agg_rank_select" ->
      """WITH ranked AS (
        |  SELECT o_totalprice, o_orderkey,
        |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM orders
        |)
        |SELECT rn AS rank_at, o_totalprice, o_orderkey
        |FROM ranked
        |WHERE rn IN (GREATEST(1, n * 1 // 4), GREATEST(1, n * 2 // 4),
        |             GREATEST(1, n * 3 // 4))
        |ORDER BY rank_at""".stripMargin,
    "agg_winsorized" ->
      """WITH fences AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS p05,
        |    quantile_cont(l_extendedprice, 0.95) AS p95
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l.l_returnflag, COUNT(*) AS n,
        |  ROUND(ANY_VALUE(f.p05), 6) AS p05,
        |  ROUND(ANY_VALUE(f.p95), 6) AS p95,
        |  ROUND(CAST(SUM(CAST(least(greatest(l.l_extendedprice, f.p05), f.p95)
        |                      AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS win_mean,
        |  ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6)
        |    AS raw_mean
        |FROM lineitem l JOIN fences f ON l.l_returnflag = f.l_returnflag
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "agg_salted_twophase" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_weighted_median" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_extendedprice AS price,
        |    SUM(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM lineitem
        |)
        |SELECT l_returnflag, MIN(price) AS wmedian,
        |  CAST(MAX(tot) AS BIGINT) AS total_w
        |FROM t WHERE cum * 2 >= tot
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "mba_brand_pairs" ->
      """WITH ob AS (
        |  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |), tot AS (
        |  SELECT COUNT(DISTINCT okey) AS n_orders FROM ob
        |), bn AS (
        |  SELECT brand, COUNT(*) AS bn FROM ob GROUP BY brand
        |), pairs AS (
        |  SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS support
        |  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
        |  GROUP BY a.brand, b.brand
        |  HAVING COUNT(*) >= 5
        |)
        |SELECT brand_a, brand_b, support,
        |  na.bn AS na, nb.bn AS nb,
        |  CAST(support * n_orders * 1000000 // (na.bn * nb.bn) AS BIGINT) AS lift_ppm
        |FROM pairs
        |JOIN bn na ON pairs.brand_a = na.brand
        |JOIN bn nb ON pairs.brand_b = nb.brand
        |CROSS JOIN tot
        |ORDER BY brand_a, brand_b""".stripMargin,
    "agg_histogram2d" ->
      """SELECT CAST((CAST(l_quantity AS INTEGER) - 1) // 5 AS INTEGER) AS qty_band,
        |  CAST(round(l_discount * 100) AS INTEGER) AS disc_pct,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY qty_band, disc_pct
        |ORDER BY qty_band, disc_pct""".stripMargin,
    "agg_vwap" ->
      """WITH t AS (
        |  SELECT l_returnflag,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_quantity AS BIGINT)) AS pq,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, CAST(pq AS DOUBLE) AS price_qty, qty,
        |  ROUND(CAST(pq AS DOUBLE) / CAST(qty AS DOUBLE), 6) AS vwap
        |FROM t ORDER BY l_returnflag""".stripMargin,
    "join_star_rollup" ->
      """SELECT r_name, p_brand, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, p_brand
        |ORDER BY r_name, p_brand""".stripMargin,
    "join_bloom_prune" ->
      """SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS total_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_acctbal > 9000.0)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "join_skew_salted" ->
      """SELECT s_name, COUNT(*) AS n, SUM(l_quantity) AS total_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY s_name""".stripMargin,
    "profile_orders" -> profileOracle,
    "agg_pivot" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "fn_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part)
        |ORDER BY p_partkey, attr""".stripMargin,
    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, l_shipdate
        |FROM lineitem
        |WHERE l_quantity BETWEEN 5 AND 24
        |  AND l_shipdate <= TIMESTAMP '1997-06-30'
        |  AND l_returnflag IN ('A', 'R')
        |  AND l_linestatus = 'F'
        |  AND l_extendedprice IS NOT NULL
        |  AND l_returnflag LIKE '%A%'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,
    "project_prune" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem WHERE l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin,
    "join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice, o_orderstatus
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_broadcast" ->
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        |  ON c_custkey = o.o_custkey
        |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin,
    "join_full" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000.0) c
        |FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |                 WHERE o_totalprice > 400000.0) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "join_range_band" ->
      """SELECT p_partkey, p_name, p_retailprice, band
        |FROM part
        |JOIN (VALUES ('low', 0.0, 1000.0), ('mid', 1000.0, 1500.0),
        |             ('high', 1500.0, 1000000.0)) bands(band, lo, hi)
        |  ON p_retailprice >= lo AND p_retailprice < hi
        |ORDER BY p_partkey, band""".stripMargin,
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "join_asof" ->
      """WITH o1 AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |), o2 AS (
        |  SELECT o1.o_custkey, o1.o_orderdate, o1.o_orderkey, o.o_totalprice
        |  FROM o1 JOIN orders o ON o1.o_orderkey = o.o_orderkey
        |)
        |SELECT e.event_id, e.user_id, o2.o_orderkey, o2.o_totalprice
        |FROM events e
        |ASOF LEFT JOIN o2 ON e.user_id = o2.o_custkey AND e.ts >= o2.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "join_asof_nearest" ->
      """WITH o1 AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |), b AS (
        |  SELECT e.event_id, e.user_id, e.ts,
        |    o1.o_orderkey AS b_key, o1.o_orderdate AS b_t
        |  FROM events e
        |  ASOF LEFT JOIN o1 ON e.user_id = o1.o_custkey AND e.ts >= o1.o_orderdate
        |), f AS (
        |  SELECT e.event_id, o1.o_orderkey AS f_key, o1.o_orderdate AS f_t
        |  FROM events e
        |  ASOF LEFT JOIN o1 ON e.user_id = o1.o_custkey AND e.ts <= o1.o_orderdate
        |)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN b_key IS NULL THEN f_key
        |       WHEN f_key IS NULL THEN b_key
        |       WHEN (epoch_us(f_t) - epoch_us(ts)) < (epoch_us(ts) - epoch_us(b_t)) THEN f_key
        |       ELSE b_key END AS o_orderkey,
        |  CASE WHEN b_key IS NULL THEN epoch_us(f_t) - epoch_us(ts)
        |       WHEN f_key IS NULL THEN epoch_us(ts) - epoch_us(b_t)
        |       WHEN (epoch_us(f_t) - epoch_us(ts)) < (epoch_us(ts) - epoch_us(b_t))
        |         THEN epoch_us(f_t) - epoch_us(ts)
        |       ELSE epoch_us(ts) - epoch_us(b_t) END AS gap_us
        |FROM b JOIN f ON b.event_id = f.event_id
        |ORDER BY b.event_id""".stripMargin,
    "join_asof_fwd" ->
      """WITH o1 AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate
        |), o2 AS (
        |  SELECT o1.o_custkey, o1.o_orderdate, o1.o_orderkey, o.o_totalprice
        |  FROM o1 JOIN orders o ON o1.o_orderkey = o.o_orderkey
        |)
        |SELECT e.event_id, e.user_id, o2.o_orderkey, o2.o_totalprice
        |FROM events e
        |ASOF LEFT JOIN o2 ON e.user_id = o2.o_custkey AND e.ts <= o2.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "join_interval_overlap" ->
      """WITH act AS (
        |  SELECT user_id, date_trunc('week', ts) AS week,
        |    date_diff('day', DATE '1970-01-01', CAST(min(ts) AS DATE)) AS bs,
        |    date_diff('day', DATE '1970-01-01', CAST(max(ts) AS DATE)) AS be
        |  FROM events GROUP BY user_id, date_trunc('week', ts)
        |), o AS (
        |  SELECT o_orderkey, o_custkey AS user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS sday
        |  FROM orders
        |)
        |SELECT o.o_orderkey, o.user_id, COUNT(act.week) AS n_overlap_weeks
        |FROM o LEFT JOIN act
        |  ON o.user_id = act.user_id AND o.sday <= act.be AND act.bs < o.sday + 30
        |GROUP BY o.o_orderkey, o.user_id
        |ORDER BY o.o_orderkey""".stripMargin,
    "join_interval_bucket" ->
      """SELECT e.event_id, e.user_id,
        |  CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_cover,
        |  CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(19,6))), 0) AS DOUBLE) AS total
        |FROM events e LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey
        |  AND CAST(e.ts AS DATE) >= CAST(o.o_orderdate AS DATE)
        |  AND CAST(e.ts AS DATE) < CAST(o.o_orderdate AS DATE) + 30
        |GROUP BY e.event_id, e.user_id ORDER BY e.event_id""".stripMargin,
    "agg_sum_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |  ROUND(AVG(l_discount), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n, ROUND(AVG(o_totalprice), 4) AS avg_price,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_filtered" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_all,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE) AS total_finished
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_collect" ->
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        |  ROUND(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS p50_qty,
        |  ROUND(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 4) AS p90_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_stats" ->
      """SELECT l_linestatus,
        |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        |  ROUND(var_samp(l_quantity), 4) AS var_qty,
        |  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  ROUND(MIN(l_extendedprice), 2) AS min_price,
        |  ROUND(MAX(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "agg_corr_exact" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(19,6))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |  ROUND((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |    / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |         * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6) AS corr_qp,
        |  ROUND((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) / (n::DOUBLE * n::DOUBLE), 6) AS covar_pop,
        |  ROUND(sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) / (n::DOUBLE * n::DOUBLE)), 6) AS stddev_pop_q,
        |  ROUND(sx::DOUBLE / n::DOUBLE, 6) AS mean_q
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "agg_linregr" ->
      """WITH s AS (
        |  SELECT l_returnflag AS rf,
        |    COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(19,6))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |), c AS (
        |  SELECT rf, n AS n_fit,
        |    ROUND((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |        / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS slope,
        |    ROUND((sy::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sxy::DOUBLE)
        |        / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS intercept,
        |    ROUND(pow(n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE, 2)
        |        / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |         * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6) AS r2
        |  FROM s
        |)
        |SELECT l.l_returnflag, MIN(c.n_fit) AS n_fit,
        |  MIN(c.slope) AS slope, MIN(c.intercept) AS intercept, MIN(c.r2) AS r2,
        |  CAST(SUM(CASE WHEN l.l_extendedprice > c.slope * l.l_quantity + c.intercept
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_above_fit
        |FROM lineitem l JOIN c ON l.l_returnflag = c.rf
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "dq_ab_ttest" ->
      """WITH s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST("value" AS DECIMAL(24,8))) AS sv,
        |    SUM(CAST("value" AS DECIMAL(24,8)) * CAST("value" AS DECIMAL(24,8))) AS ss
        |  FROM events GROUP BY event_type
        |), m AS (
        |  SELECT event_type, n,
        |    sv::DOUBLE / n::DOUBLE AS mean,
        |    (ss::DOUBLE - sv::DOUBLE * sv::DOUBLE / n::DOUBLE) / (n::DOUBLE - 1) AS var
        |  FROM s
        |), ctl AS (SELECT n AS c_n, mean AS c_mean, var AS c_var FROM m WHERE event_type = 'view')
        |SELECT m.event_type, m.n AS n_treat, ctl.c_n AS n_control,
        |  ROUND(m.mean - ctl.c_mean, 6) AS mean_diff,
        |  ROUND(pow(m.mean - ctl.c_mean, 2)
        |      / (m.var / m.n::DOUBLE + ctl.c_var / ctl.c_n::DOUBLE), 6) AS t2_welch,
        |  ROUND(pow(m.var / m.n::DOUBLE + ctl.c_var / ctl.c_n::DOUBLE, 2)
        |      / (pow(m.var / m.n::DOUBLE, 2) / (m.n::DOUBLE - 1)
        |       + pow(ctl.c_var / ctl.c_n::DOUBLE, 2) / (ctl.c_n::DOUBLE - 1)), 6) AS df_welch
        |FROM m CROSS JOIN ctl
        |WHERE m.event_type <> 'view'
        |ORDER BY m.event_type""".stripMargin,
    "dq_k_anonymity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
        |  FROM customer GROUP BY c_nationkey, c_mktsegment
        |), agg AS (
        |  SELECT COUNT(*) AS n_classes, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    CAST(MIN(cnt) AS BIGINT) AS min_class,
        |    COUNT(CASE WHEN cnt < 2 THEN 1 END) AS c_2,
        |    CAST(COALESCE(SUM(CASE WHEN cnt < 2 THEN cnt END), 0) AS BIGINT) AS r_2,
        |    COUNT(CASE WHEN cnt < 5 THEN 1 END) AS c_5,
        |    CAST(COALESCE(SUM(CASE WHEN cnt < 5 THEN cnt END), 0) AS BIGINT) AS r_5,
        |    COUNT(CASE WHEN cnt < 10 THEN 1 END) AS c_10,
        |    CAST(COALESCE(SUM(CASE WHEN cnt < 10 THEN cnt END), 0) AS BIGINT) AS r_10,
        |    COUNT(CASE WHEN cnt < 20 THEN 1 END) AS c_20,
        |    CAST(COALESCE(SUM(CASE WHEN cnt < 20 THEN cnt END), 0) AS BIGINT) AS r_20
        |  FROM cls
        |), long AS (
        |  SELECT n_classes, n_rows, min_class, 2 AS k, c_2 AS classes_at_risk, r_2 AS rows_at_risk FROM agg
        |  UNION ALL SELECT n_classes, n_rows, min_class, 5, c_5, r_5 FROM agg
        |  UNION ALL SELECT n_classes, n_rows, min_class, 10, c_10, r_10 FROM agg
        |  UNION ALL SELECT n_classes, n_rows, min_class, 20, c_20, r_20 FROM agg
        |)
        |SELECT k, n_classes, n_rows, min_class, classes_at_risk, rows_at_risk,
        |  rows_at_risk * 1000000 // n_rows AS risk_ppm
        |FROM long ORDER BY k""".stripMargin,
    "agg_argmax" ->
      """SELECT o_orderpriority,
        |  arg_max(o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) * 1000000000 + o_orderkey) AS biggest_order,
        |  ROUND(MAX(o_totalprice), 2) AS max_price,
        |  arg_min(o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) * 1000000000 + o_orderkey) AS smallest_order,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority
        |), r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_orderstatus ORDER BY cnt DESC, o_orderpriority) AS rn
        |  FROM c
        |)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
        |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,
    "dq_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont("value", 0.5) AS med
        |  FROM events GROUP BY event_type
        |), dev AS (
        |  SELECT e.event_type, abs(e."value" - med.med) AS dev, med.med
        |  FROM events e JOIN med ON e.event_type = med.event_type
        |), mad AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM dev GROUP BY event_type
        |)
        |SELECT dev.event_type, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN dev.dev > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  ROUND(MIN(dev.med), 6) AS med,
        |  ROUND(MIN(mad.mad), 6) AS mad
        |FROM dev JOIN mad ON dev.event_type = mad.event_type
        |GROUP BY dev.event_type
        |ORDER BY dev.event_type""".stripMargin,
    "dq_outliers" ->
      """WITH q AS (
        |  SELECT l_returnflag AS rf,
        |    quantile_cont(l_extendedprice, 0.25) AS q1,
        |    quantile_cont(l_extendedprice, 0.75) AS q3
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN l_extendedprice < q1 - 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN l_extendedprice > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  ROUND(MIN(q1 - 1.5 * (q3 - q1)), 4) AS fence_lo,
        |  ROUND(MIN(q3 + 1.5 * (q3 - q1)), 4) AS fence_hi
        |FROM lineitem JOIN q ON l_returnflag = rf
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "join_nullsafe" ->
      """WITH o AS (
        |  SELECT nullif(o_orderkey % 1000, 7) AS k, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1
        |), l AS (
        |  SELECT nullif(l_orderkey % 1000, 7) AS k, COUNT(*) AS n_items
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT o.k, n_orders, n_items
        |FROM o JOIN l ON o.k IS NOT DISTINCT FROM l.k
        |ORDER BY o.k NULLS FIRST""".stripMargin,
    "dq_rule_violations" -> {
      val rules = Seq(
        "discount_in_0_01"  -> "(l_discount < 0 OR l_discount > 0.1)",
        "price_positive"    -> "(l_extendedprice <= 0)",
        "quantity_positive" -> "(l_quantity <= 0)",
        "ship_before_order" -> "(l_shipdate < o_orderdate)",
        "tax_in_0_008"      -> "(l_tax < 0 OR l_tax > 0.08)")
      rules.map { case (name, cond) =>
        s"""SELECT '$name' AS rule, COUNT(*) AS n_checked,
           |  COUNT(CASE WHEN $cond THEN 1 END) AS n_violations,
           |  COUNT(CASE WHEN $cond THEN 1 END) * 1000000 // COUNT(*) AS violation_ppm,
           |  MIN(CASE WHEN $cond THEN l_orderkey END) AS first_bad_key
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY rule")
    },
    "dq_sequence_gaps" ->
      """WITH k AS (
        |  SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'O'
        |), g AS (
        |  SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM k
        |)
        |SELECT k + 1 AS gap_start, nk - 1 AS gap_end, nk - k - 1 AS missing
        |FROM g WHERE nk > k + 1
        |ORDER BY missing DESC, gap_start
        |LIMIT 100""".stripMargin,
    "dq_orphans" ->
      """WITH checks AS (
        |  SELECT 'lineitem_to_orders' AS rel, COUNT(*) AS n_child,
        |    CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        |  FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p ON c.l_orderkey = p.k
        |  UNION ALL
        |  SELECT 'lineitem_to_supplier', COUNT(*),
        |    CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem c LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) p ON c.l_suppkey = p.k
        |  UNION ALL
        |  SELECT 'orders_to_customer', COUNT(*),
        |    CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p ON c.o_custkey = p.k
        |  UNION ALL
        |  SELECT 'orders_childless', COUNT(*),
        |    CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders c LEFT JOIN (SELECT DISTINCT l_orderkey AS k FROM lineitem) p ON c.o_orderkey = p.k
        |)
        |SELECT rel, n_child, n_orphans FROM checks ORDER BY rel""".stripMargin,
    "fuzzy_join" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS d_key,
        |    substr(c_name, 10, 8) || 'X' AS d_sfx,
        |    c_nationkey AS d_nat
        |  FROM customer WHERE c_custkey % 10 = 0
        |)
        |SELECT d_key, c.c_custkey AS matched_key,
        |  CAST(levenshtein(d_sfx, substr(c.c_name, 10, 9)) AS INTEGER) AS dist
        |FROM dirty JOIN customer c ON d_nat = c.c_nationkey
        |WHERE levenshtein(d_sfx, substr(c.c_name, 10, 9)) <= 2
        |ORDER BY d_key, matched_key""".stripMargin,
    "mv_incremental" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price
        |FROM orders
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "merge_upsert" ->
      """WITH updates AS (
        |  SELECT o_orderkey AS u_orderkey,
        |    ROUND(o_totalprice * 1.1, 3) AS u_totalprice,
        |    'U' AS u_orderstatus
        |  FROM orders WHERE o_orderstatus = 'O'
        |), deletes AS (
        |  SELECT o_orderkey AS u_orderkey, CAST(NULL AS DOUBLE) AS u_totalprice,
        |    'D' AS u_orderstatus
        |  FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 97 = 0
        |), inserts AS (
        |  SELECT o_orderkey + 10000000 AS u_orderkey,
        |    ROUND(o_totalprice, 2) AS u_totalprice, 'I' AS u_orderstatus
        |  FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 101 = 0
        |), changes AS (
        |  SELECT * FROM updates UNION ALL SELECT * FROM deletes
        |  UNION ALL SELECT * FROM inserts
        |)
        |SELECT
        |  COALESCE(o.o_orderkey, c.u_orderkey) AS m_orderkey,
        |  COALESCE(c.u_totalprice, o.o_totalprice) AS m_totalprice,
        |  COALESCE(c.u_orderstatus, o.o_orderstatus) AS m_orderstatus,
        |  o.o_custkey AS m_custkey
        |FROM orders o FULL OUTER JOIN changes c ON o.o_orderkey = c.u_orderkey
        |WHERE COALESCE(c.u_orderstatus, '') <> 'D'
        |ORDER BY m_orderkey""".stripMargin,
  )
}
