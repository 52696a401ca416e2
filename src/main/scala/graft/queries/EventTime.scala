package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics on `events` (SURVEY §2.9 T5), batch form — Spark's
  * `window()`/`session_window()` work identically in batch, which is what
  * makes them DuckDB-oracle-checkable. The streaming twins (same expressions
  * behind `readStream` + watermark) live in graft.streaming and are
  * unit-tested instead.
  *
  * Scale: these are plain hash aggregations after the window expression is
  * materialized as a group key — one shuffle each. Session windows
  * additionally sort within user partitions (same profile as any
  * gaps-and-islands pass).
  */
object EventTime extends QueryModule {

  /** Tumbling 5-minute windows per event type. */
  def evtTumbling(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total"))
      .orderBy("w_start", "event_type")
  }

  /** Sliding 10-minute windows every 5 minutes: each event lands in exactly
    * two windows (bucket and bucket−5min), which is what the oracle unrolls.
    */
  def evtSliding(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("w_start"), col("n"), col("total"))
      .orderBy("w_start")
  }

  /** Session windows per user with a 10-minute inactivity gap. */
  def evtSession(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("user_id"), col("w.start").as("s_start"), col("n"), col("total"))
      .orderBy("user_id", "s_start")
  }

  /** Calendar gap-fill: one row per (day, event_type) over the stream's
    * span, zero-filled where no events occurred — the resample/densify
    * primitive of time-series pipelines. The calendar is generated
    * (`sequence` + explode), never materialized driver-side, and the join
    * against actual counts is a broadcast of the generated side.
    */
  def evtGapfill(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val counts = e
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val calendar = e
      .select(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .crossJoin(e.select(col("event_type")).distinct())
    calendar.join(counts, Seq("day", "event_type"), "left_outer")
      .select(col("day"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("day", "event_type")
  }

  /** Ordered conversion funnel view → click → purchase: each stage's
    * timestamp is the earliest qualifying event STRICTLY AFTER the previous
    * stage (min-per-user aggregations chained by join — each link is one
    * shuffle on user_id, and AQE collapses the later ones to broadcasts as
    * the surviving user set shrinks down-funnel).
    */
  def evtFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    val stage = (lit(1)
      + when(col("t_click").isNotNull, 1).otherwise(0)
      + when(col("t_purchase").isNotNull, 1).otherwise(0)).cast("int")
    v.join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .select(col("user_id"), stage.as("stage"),
        col("t_view"), col("t_click"), col("t_purchase"))
      .orderBy("user_id")
  }

  /** Weekly retention cohorts: users grouped by first-seen week, distinct
    * active users per (cohort, weeks-since-first). The heavy input collapses
    * to distinct (user, day) before any join — at 100 TB that distinct is
    * the only full-data shuffle, and it partitions on user_id.
    */
  def evtRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val firstDay = e.groupBy("user_id").agg(to_date(min("ts")).as("d0"))
    val activity = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    activity.join(firstDay, "user_id")
      .select(
        to_date(date_trunc("week", col("d0"))).as("cohort_week"),
        expr("datediff(day, d0) div 7").as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Week-over-week change per event type — the trend-monitoring query
    * behind "is this behavior growing". The lag window runs on the
    * AGGREGATED weekly series (types × weeks rows, tiny at any corpus
    * size); the corpus itself sees one map-side-combined groupBy.
    */
  def evtWowChange(spark: SparkSession, sfDir: String): DataFrame = {
    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("week")
    Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(date_trunc("week", col("ts"))).as("week"))
      .groupBy("event_type", "week")
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag("n", 1).over(byType))
      .withColumn("wow_pct",
        when(col("prev_n").isNotNull,
          round((col("n") - col("prev_n")).cast("double") / col("prev_n") * 100, 4)))
      .orderBy("event_type", "week")
  }

  /** Event-type transition matrix (first-order Markov counts): per user,
    * order events by time and count (previous → current) type pairs — the
    * session-flow fingerprint behind "what do users do after a view".
    * One window (lag) + one groupBy; the shuffle keys are (user) then
    * (prev, cur) — both natural partitionings at any scale. The window
    * order is (ts, event_id): event_id breaks same-timestamp ties so `lag`
    * is engine-independent.
    */
  def evtTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val byUserTime = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, sfDir)
      .withColumn("prev_type", lag("event_type", 1).over(byUserTime))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("cur_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "cur_type")
  }

  /** STATIONARY distribution of the event-type Markov chain — where the
    * session flow settles if users keep clicking: the [[evtTransitions]]
    * counts row-normalized to transition probabilities in exact integer
    * ppm, then three unrolled power-iteration steps from uniform,
    * reported beside the EMPIRICAL type share (the two agree when
    * sessions are long enough to mix — the gap IS the insight). All
    * arithmetic is exact-integer with per-term floor division
    * (Σ πᵢ·pᵢⱼ div 10⁶ — order-free, engine-identical; mass bleeds a
    * few ppm per step by construction, same bleed both engines). Scale:
    * the corpus-sized work is one (user) window + one (prev, cur)
    * groupBy; everything after is |types|²-bounded broadcast algebra —
    * the iteration cost never grows with the corpus.
    */
  def evtMarkovStationary(spark: SparkSession, sfDir: String): DataFrame = {
    val trans = evtTransitions(spark, sfDir)
    val outTot = trans.groupBy("prev_type").agg(sum("n").as("n_out"))
    val p = trans.join(outTot, "prev_type")
      .select(col("prev_type"), col("cur_type"),
        expr("n * 1000000 div n_out").as("p_ppm"))
    val types = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n_evt"))
    val tot = types.agg(sum("n_evt").as("n_all"), count(lit(1)).as("n_types"))
    val pi0 = types.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_evt"), col("n_all"),
        expr("1000000 div n_types").as("pi_ppm"))
    val step = (pi: DataFrame) => pi
      .join(broadcast(p), pi("event_type") === p("prev_type"))
      .groupBy(col("cur_type").as("event_type"))
      .agg(sum(expr("pi_ppm * p_ppm div 1000000")).as("pi_ppm"))
      .select(col("event_type"), col("pi_ppm"))
    val pi3 = step(step(step(pi0.select("event_type", "pi_ppm"))))
    pi0.select(col("event_type"),
        expr("n_evt * 1000000 div n_all").as("empirical_ppm"))
      .join(pi3.withColumnRenamed("pi_ppm", "stationary_ppm"), "event_type")
      .orderBy("event_type")
  }

  /** Fixed-width histogram of the value column per event type — the
    * profiling primitive behind distribution dashboards. The bucket id is
    * pure row-local double math (identical IEEE ops in both engines);
    * 16 buckets of width 25 cover the generator's [0, 400) range, with the
    * top bucket clamping any outlier. One groupBy — the histogram of 100 TB
    * is 16×|types| rows.
    */
  def evtHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .withColumn("bucket",
        least(floor(col("value") / 25.0), lit(15.0)).cast("int"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("event_type", "bucket")
  }

  /** Dwell time: microseconds until each user's NEXT event, aggregated per
    * event type — the engagement metric behind "how long does a view
    * hold". Same single-window shape as evtTransitions (lead instead of
    * lag); the sums are exact integer microseconds, so the derived average
    * is deterministic at any scale.
    */
  def evtDwell(spark: SparkSession, sfDir: String): DataFrame = {
    val byUserTime = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, sfDir)
      .withColumn("next_ts", lead("ts", 1).over(byUserTime))
      .filter(col("next_ts").isNotNull)
      .withColumn("dwell_us", unix_micros(col("next_ts")) - unix_micros(col("ts")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("dwell_us")).as("total_us"),
        round(sum(col("dwell_us")).cast("double") / count(lit(1)), 3).as("avg_us"))
      .orderBy("event_type")
  }

  /** Equi-DEPTH histogram (deciles per event type) — evtHistogram's
    * fixed-width complement: every bucket holds ~n/10 rows, so the bucket
    * BOUNDS carry the distribution (what a query optimizer's histogram or
    * a calibration pass wants). ntile per type keeps the sort partitioned
    * — no global single-partition ordering at any scale.
    */
  def evtHistogramEqdepth(spark: SparkSession, sfDir: String): DataFrame = {
    val byVal = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("value", "event_id")
    Tables.events(spark, sfDir)
      .withColumn("decile", ntile(10).over(byVal))
      .groupBy("event_type", "decile")
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("lo"),
        max(col("value")).as("hi"))
      .orderBy("event_type", "decile")
  }

  /** Daily-count anomaly days per event type — the monitoring query behind
    * every ingest-volume alert. A day is anomalous when |count − μ| > 2σ
    * over that type's daily history, evaluated in EXACT integer arithmetic:
    * (n·x − S)² > 4·(n·Q − S²) with S = Σcounts, Q = Σcounts² — the
    * cross-multiplied z-score needs no float mean/stddev, so the flag set
    * is bit-stable across engines, partitionings, and merge orders (a
    * float σ computed in different reduction orders can flip a borderline
    * day). Counts are BIGINT-safe far past this corpus; at true 100 TB
    * cast the power sums to DECIMAL(38,0). Two narrow shuffles: one
    * groupBy (type, day), one per-type window over the tiny daily series.
    */
  def evtZscoreAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val byType = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    daily
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("s", sum(col("cnt")).over(byType))
      .withColumn("q", sum(col("cnt") * col("cnt")).over(byType))
      .withColumn("dev", col("n") * col("cnt") - col("s"))
      .filter(col("dev") * col("dev") > lit(4) * (col("n") * col("q") - col("s") * col("s")))
      .select(
        col("event_type"), col("day"), col("cnt"),
        when(col("dev") > 0, lit("high")).otherwise(lit("low")).as("side"))
      .orderBy("event_type", "day")
  }

  /** SCD type-2 dimension build from a change stream: each event opens a
    * validity interval [ts, next-event ts) per user, the open row flagged
    * current — the standard warehouse pattern for "attribute history with
    * time travel". One lead() window per user (single shuffle + sort);
    * interval end is exclusive so snapshots join with
    * `valid_from <= t < valid_to`.
    */
  def scd2Intervals(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"), col("ts").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("valid_from"), col("event_id"))))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("user_id", "valid_from", "event_id")
  }

  /** Cohort LTV triangle — the revenue companion to the count-based
    * retention matrix: per signup-week cohort, weekly value and CUMULATIVE
    * lifetime value by week offset. Value sums ride DECIMAL(19,6) (the
    * generator's values sit on a 6dp grid), so both the cells and the
    * running cumulative are order-independent exact; two keyed groupBys +
    * one per-cohort window cumsum, all narrow shuffles.
    */
  def evtCohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val firstWeek = e.groupBy("user_id")
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort_week"))
    val weekly = e.select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week"),
        col("value").cast("decimal(19,6)").as("v"))
      .groupBy("user_id", "week")
      .agg(sum(col("v")).as("wv"))
    val cells = weekly.join(firstWeek, "user_id")
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"), sum(col("wv")).as("wval"))
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cells
      .withColumn("cum_ltv", sum(col("wval")).over(cum))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("wval").cast("double").as("week_value"),
        col("cum_ltv").cast("double").as("cum_ltv"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Last-touch attribution: each purchase is credited to the user's most
    * recent click at-or-before it, flagged `attributed` when the gap is
    * within a 1-hour window — the marketing-credit query behind every spend
    * dashboard. Rides `AsOf.joinLeftAsOf` (single-shuffle union+window), so
    * the cost profile is one keyed shuffle regardless of click volume — the
    * naive time-range join explodes per-user click×purchase pairs.
    */
  def evtAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    graft.operators.AsOf.joinLeftAsOf(
        purchases, clicks,
        key = "user_id", leftTime = "ts", rightTime = "click_ts",
        leftId = "event_id", tieBreak = "click_id",
        payload = Seq("click_id", "click_ts"))
      .withColumn("gap_us",
        when(col("click_ts").isNotNull,
          unix_micros(col("ts")) - unix_micros(col("click_ts"))))
      .withColumn("attributed",
        coalesce(col("gap_us") <= lit(3600000000L), lit(false)))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("click_id"), col("click_ts"), col("gap_us"), col("attributed"))
      .orderBy("event_id")
  }

  /** Duration-capped sessionization: 30-minute inactivity gap AND a 2-hour
    * hard cap per session — long-lived sessions split at cap boundaries
    * measured from the session's first event (the bot-resistant variant;
    * pure gap sessions never close under continuous pings). Two window
    * passes over ONE shuffle+sort on user_id (gap marker → running session
    * id → offset-from-start bucket), then a keyed groupBy.
    */
  def winSessionCap(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val bySession = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "sid")
    Tables.events(spark, sfDir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >= lit(1800000000L), 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("s0", min(col("ts")).over(bySession))
      .withColumn("sub",
        expr("(unix_micros(ts) - unix_micros(s0)) div 7200000000"))
      .groupBy(col("user_id"), col("sid"), col("sub"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("s_start"), col("s_end"), col("n"))
      .orderBy("user_id", "s_start")
  }

  /** Peak-to-trough drawdown of the daily volume series per event type —
    * "how far below its best day has this stream fallen, and when": running
    * max over the ordered daily counts, drawdown = peak − current, worst
    * day picked by (deepest, earliest). All integer counts — exact — and
    * both windows run over the tiny per-type DAILY series, not the corpus.
    */
  def evtDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    val byTypeDay = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val worst = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("dd").desc, col("day"))
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("run_max", max(col("cnt")).over(byTypeDay))
      .withColumn("dd", col("run_max") - col("cnt"))
      .withColumn("rn", row_number().over(worst))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("run_max").as("peak_daily"),
        col("dd").as("max_drawdown"), col("day").as("worst_day"))
      .orderBy("event_type")
  }

  /** RFM segmentation — the classic customer-value cube: per user, recency
    * (days since last purchase vs corpus max day), frequency (purchase
    * count), monetary (exact-decimal purchase value); each scored into
    * quintiles over a TOTAL order (metric, user_id — ties can't straddle
    * engines), then rolled up to segment populations.
    *
    * Scale shape: NO unpartitioned ntile windows (at 100 TB the per-user
    * summary is 10^8-10^9 rows — a global sort through one task, three
    * times). Instead each metric's exact global rank comes from
    * [[graft.operators.BlockedRank.blockedPrefix]] (block partials + one
    * bounded summary window), and the quintile is pure integer arithmetic
    * on (rank, N) via `ntileFromRank` — bit-identical to ntile(5), zero
    * global sorts.
    */
  def evtRfm(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank._
    val B = 65536L // tiebreak sub-block width: ranks stay exact for any B
    val uidBlk = idiv(col("user_id"), lit(B))
    val perUser = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(col("value").cast("decimal(19,6)")).as("monetary"))
      .transform(d => d.crossJoin(broadcast(d.agg(max(col("last_day")).as("max_day")))))
      .withColumn("recency_days", datediff(col("max_day"), col("last_day")))
    // ONE unpivoted rank pass instead of three: each metric becomes an
    // ASCENDING decimal sort value (recency as-is; freq and monetary
    // negated), so a single blockedPrefix partitioned by metric ranks all
    // three with one shuffle pipeline. Block keys: floor(sortval) always;
    // the user-id sub-block ONLY where sortval is integral (r/f — there
    // the block pins the full value, so uid sub-blocking stays a monotone
    // refinement; for monetary it would split rows of equal floor out of
    // value order). Orders are identical to the former three passes, so
    // ranks — and the emitted segment grid — are bit-identical.
    val unpivoted = perUser.select(
      col("user_id"), col("monetary"),
      expr("""stack(3,
        'r', CAST(recency_days AS DECIMAL(29,6)),
        'f', CAST(-freq AS DECIMAL(29,6)),
        'm', CAST(-monetary AS DECIMAL(29,6))) AS (metric, sortval)"""))
    val ranked = blockedPrefix(unpivoted, Seq("metric"),
      Seq(
        "__b_v" -> floor(col("sortval")),
        "__b_uid" -> when(col("metric") === "m", lit(0L)).otherwise(uidBlk)),
      Seq(false, false), Seq(col("sortval"), col("user_id")), "__rank", "__n")
    ranked
      .withColumn("score", ntileFromRank(col("__rank"), col("__n"), 5))
      .groupBy("user_id")
      .agg(
        max(when(col("metric") === "r", col("score"))).as("r_score"),
        max(when(col("metric") === "f", col("score"))).as("f_score"),
        max(when(col("metric") === "m", col("score"))).as("m_score"),
        min(col("monetary")).as("monetary")) // constant per user; min = picker
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"),
        sum(col("monetary")).cast("double").as("segment_value"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Exact pairwise audience-overlap matrix across event types — the
    * ground-truth counterpart of `sketch_kmv_intersect`'s estimates, and
    * the audience-planning primitive itself (which behaviors share
    * users?). Shape: ONE distinct-collapse to (type, user), ONE
    * self-equi-join on user_id (types meet only through shared users —
    * never a type×type×user blowup), per-type cardinalities broadcast
    * back; Jaccard lands in integer ppm via cross-multiplied counts. At
    * 100 TB the user-keyed join shuffles each distinct (type, user) row
    * once; the output is the bounded types² matrix.
    */
  def evtAudienceOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val u = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct()
    val perType = u.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val inter = u.select(col("event_type").as("type_a"), col("user_id"))
      .join(u.select(col("event_type").as("type_b"), col("user_id")), "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_both"))
    inter
      .join(broadcast(perType.select(col("event_type").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"), col("n").as("n_b"))), "type_b")
      .withColumn("jaccard_ppm",
        expr("n_both * 1000000 div (n_a + n_b - n_both)"))
      .select("type_a", "type_b", "n_a", "n_b", "n_both", "jaccard_ppm")
      .orderBy("type_a", "type_b")
  }

  /** Day-of-week-DESEASONALIZED anomaly screen: a Sunday that is merely
    * "low like every Sunday" is not an anomaly — `evt_zscore_anomaly`'s
    * raw daily z-score can't tell. Expected volume for a day = that
    * weekday's average for the type (dow_total ∕ n_days); the deviation
    * ratio obs·n_days·10⁶ div dow_total is EXACT integer arithmetic (no
    * float expectation), flagged beyond ±30%. The weekday profile is a
    * bounded types×7 summary broadcast back onto the daily rollup; the
    * weekday convention never leaves either engine (dow only joins rows,
    * it is not emitted). Scale: events collapse to (type, day) first —
    * map-side combinable — and everything after runs on the calendar axis.
    */
  def evtSeasonalAnomaly(spark: SparkSession, sfDir: String): DataFrame =
    seasonalAnomalyOf(Tables.events(spark, sfDir))

  /** The deseasonalized screen over any (event_type, ts) frame — public so
    * planted-spike corpora can pin the flag against hand-computed
    * expectations (`TrendSpec`).
    */
  def seasonalAnomalyOf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("obs"))
      .withColumn("dow", dayofweek(col("day")))
    val byDow = daily.groupBy(col("event_type").as("et"), col("dow").as("d"))
      .agg(sum(col("obs")).as("dow_total"), count(lit(1)).as("n_days"))
    daily
      .join(broadcast(byDow),
        col("event_type") === col("et") && col("dow") === col("d"))
      .select(
        col("event_type"), col("day"), col("obs"), col("n_days"),
        expr("dow_total * 1000000 div n_days").as("expected_micro"),
        expr("obs * n_days * 1000000 div dow_total").as("ratio_ppm"),
        when(abs(expr("obs * n_days * 1000000 div dow_total") - 1000000) > 300000, 1)
          .otherwise(0).as("anomaly"))
      .orderBy("event_type", "day")
  }

  /** Kaplan-Meier survival curve over user lifetimes — the retention
    * analyst's "what fraction of users survive past day t", with proper
    * right-censoring: a user whose last event lands on the corpus
    * watermark day is CENSORED (still alive at observation end), not a
    * churn event — the estimator's whole point vs naive retention. At
    * each distinct lifetime t: d_t churns, the at-risk set n_t = users
    * with lifetime ≥ t, factor 1 − d_t/n_t. The curve is emitted as
    * LOG-survival — each step's ln(factor) computed on identical doubles
    * (the ln-on-identical-inputs contract text_entropy pins), rounded to
    * the 9dp decimal grid BEFORE the cumulative sum, so the accumulation
    * is order-free; NULL marks exact extinction (d_t = n_t, where
    * ln diverges). Scale shape: one per-user groupBy, then everything
    * runs on the DISTINCT-LIFETIME axis — calendar-bounded, so the
    * cumulative windows use the boundedPartition idiom.
    */
  def evtSurvival(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank.boundedPartition
    val days = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase") // churn = purchasing stops
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("first_day"),
        max(to_date(col("ts"))).as("last_day"))
    val lifetimes = days
      .transform(d => d.crossJoin(broadcast(d.agg(max(col("last_day")).as("cmax")))))
      .select(datediff(col("last_day"), col("first_day")).as("t"),
        (col("last_day") === col("cmax")).cast("int").as("censored"))
    val byT = lifetimes.groupBy("t").agg(
      count(lit(1)).as("leaving"),
      sum(lit(1) - col("censored")).as("n_deaths"),
      sum(col("censored")).as("n_censored"))
    val total = byT.agg(sum(col("leaving")).as("n_total"))
    val wPrev = Window.partitionBy(boundedPartition(col("t"))).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(boundedPartition(col("t"))).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    byT.crossJoin(broadcast(total))
      .withColumn("n_at_risk",
        col("n_total") - coalesce(sum(col("leaving")).over(wPrev), lit(0L)))
      .withColumn("lnf", when(col("n_deaths") < col("n_at_risk"),
        round(log(lit(1.0) - col("n_deaths").cast("double") / col("n_at_risk")), 9)
          .cast("decimal(16,9)")))
      .withColumn("log_survival",
        when(max(when(col("n_deaths") === col("n_at_risk"), 1).otherwise(0))
          .over(wCum) === 1, lit(null).cast("double"))
          .otherwise(sum(col("lnf")).over(wCum).cast("double")))
      .select(col("t").as("t_days"), col("n_at_risk"), col("n_deaths"),
        col("n_censored"), col("log_survival"))
      .orderBy("t_days")
  }

  /** CUSUM change-point detection over the per-type daily event series —
    * the monitoring primitive that catches a sustained rate shift long
    * before any single day trips a z-score: S⁺_t = max(0, S⁺_{t−1} +
    * (x_t − μ)), alarm when S⁺ exceeds 3σ. The recursion with its
    * reflecting floor is NOT a plain window aggregate, but it has a
    * closed form the engines can both window: S⁺_t = C_t − min(0,
    * min_{j≤t} C_j) for prefix sums C of the deviations — one cumulative
    * sum plus one cumulative min, no recursion. Numerics: μ and σ come
    * from exact integer/decimal power sums (count, Σx, Σx² as
    * DECIMAL(38,0) — Σx² at 10⁹-events-per-day scale overflows BIGINT)
    * with ONE double division/sqrt rounded to the 6dp grid, and the
    * deviation prefix sums accumulate as exact decimals — bit-stable
    * under any partitioning. Scale shape: events collapse to per-(type,
    * day) counts map-side; every window partitions by event_type over
    * the calendar-bounded daily series.
    */
  def evtCusum(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type")
      .agg(
        count(lit(1)).as("nd"),
        sum(col("n")).as("sx"),
        // cast BEFORE squaring: a day count near 10^9 (and Σx near 10^13)
        // squared as long*long overflows BIGINT; decimal first keeps the
        // whole power-sum pipeline exact, matching DuckDB's HUGEINT path.
        sum(col("n").cast("decimal(19,0)") * col("n").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("sxx"))
      .select(col("event_type"),
        round(col("sx").cast("double") / col("nd"), 6)
          .cast("decimal(18,6)").as("mu"),
        round(
          sqrt((col("nd") * col("sxx")
            - col("sx").cast("decimal(19,0)") * col("sx").cast("decimal(19,0)"))
            .cast("double")) / col("nd"), 6)
          .cast("decimal(18,6)").as("sigma"))
    val wCum = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.join(stats, "event_type")
      .withColumn("c", sum(col("n") - col("mu")).over(wCum))
      .withColumn("floor", min(least(col("c"), lit(0))).over(wCum))
      // micro-units, not double: the decimal→double cast differs by 1 ULP
      // between engines (exact decimal scale-down vs ·1e-6 float multiply)
      .withColumn("cusum_micro", ((col("c") - col("floor")) * 1000000).cast("bigint"))
      .withColumn("alarm", col("c") - col("floor") > col("sigma") * 3)
      .select(col("event_type"), col("day"), col("n").as("n_events"),
        col("cusum_micro"), col("alarm"))
      .orderBy("event_type", "day")
  }

  /** Pareto concentration per event type — "how few users produce 80% of
    * the value": users ranked by exact-decimal value (desc, user_id
    * tiebreak), the 80% crossing found by CROSS-MULTIPLIED decimal compare
    * (5·cum ≥ 4·total — no float share), reported beside the user count and
    * the crossing user's share of the population in integer ppm. The corpus
    * sees one (type, user) groupBy; ranking windows run on the per-user
    * summary.
    */
  def evtPareto(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank.{blockedPrefix, PrefixValue}
    val perUser = Tables.events(spark, sfDir)
      .groupBy("event_type", "user_id")
      .agg(sum(col("value").cast("decimal(19,6)")).as("v"))
    // Rank + running value sum per event_type WITHOUT a per-type global
    // sort (a handful of types each holding ALL users would funnel the
    // whole summary through a few tasks at 100 TB): block by the integer
    // value floor, rank exactly inside blocks, offsets from the bounded
    // per-type block summary.
    blockedPrefix(perUser, Seq("event_type"),
      Seq("__b_v" -> floor(col("v"))), Seq(true),
      Seq(col("v").desc, col("user_id")),
      "rnk", "n_users",
      values = Seq(PrefixValue(col("v"), "cum", "total")))
      .filter(col("cum") * 5 >= col("total") * 4)
      .groupBy(col("event_type"), col("n_users"), col("total"))
      .agg(min(col("rnk")).cast("int").as("users_to_80")) // int like row_number emitted
      .select(col("event_type"), col("n_users"), col("users_to_80"),
        expr("CAST(users_to_80 AS BIGINT) * 1000000 div n_users").as("pct_users_ppm"),
        col("total").cast("double").as("total_value"))
      .orderBy("event_type")
  }

  /** Peak concurrency per (event_type, day) — the interval-stacking sweep
    * behind occupancy/load reporting: each event opens a 30-minute session,
    * sessions become +1/−1 boundary deltas, and the running delta sum AT
    * each boundary is the live-session count. Half-open [start, end)
    * semantics: at an equal instant the −1 sorts first (delta ascends), so
    * back-to-back sessions never double-count. The running sum is
    * block-decomposed by calendar day ([[BlockedRank.blockedPrefix]]) —
    * never a per-type global sort, which at 100 TB would funnel every
    * boundary of a type through one task. Per-day peaks are order-stable:
    * within a run of equal (t, delta) rows the prefix-sum multiset is
    * permutation-invariant, so MAX is engine-independent. Midnight
    * carryover: a day whose first boundary is an END would otherwise
    * never see the level it INHERITED at 00:00 (sessions open across the
    * boundary) — the carry is the cumulative day-delta of all preceding
    * days (order-free sum over the calendar-bounded day summary; days
    * with no boundaries contribute 0 by construction), and the day's
    * peak is greatest(carry, max within-day cum).
    */
  def evtConcurrency(spark: SparkSession, sfDir: String): DataFrame =
    peakConcurrency(Tables.events(spark, sfDir), sessionMinutes = 30)

  /** The sweep itself over any (event_type, ts, event_id) frame — public so
    * the midnight-carry semantics can be pinned on crafted corpora (the
    * DuckDB oracle mirrors the implementation, so only a constructed case
    * can prove the carry against an INDEPENDENT expectation).
    */
  def peakConcurrency(ev: DataFrame, sessionMinutes: Int): DataFrame = {
    import graft.operators.BlockedRank.{blockedPrefix, PrefixValue}
    val deltas = ev.select(
        col("event_type"), col("ts").as("t"), lit(1).as("delta"), col("event_id"))
      .unionByName(ev.select(
        col("event_type"),
        (col("ts") + expr(s"INTERVAL $sessionMinutes MINUTES")).as("t"),
        lit(-1).as("delta"), col("event_id")))
    blockedPrefix(deltas, Seq("event_type"),
      Seq("__b_day" -> to_date(col("t"))), Seq(false),
      Seq(col("t"), col("delta"), col("event_id")),
      "rnk", "n_deltas",
      values = Seq(PrefixValue(col("delta").cast("long"), "cum", "tot")))
      .groupBy(col("event_type"), to_date(col("t")).as("day"))
      .agg(
        max(col("cum")).cast("long").as("max_cum"),
        sum(col("delta")).cast("long").as("day_delta"),
        sum(when(col("delta") === 1, 1).otherwise(0)).cast("long").as("n_starts"))
      .withColumn("carry", coalesce(
        sum(col("day_delta")).over(Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(
        col("event_type"), col("day"),
        greatest(col("max_cum"), col("carry")).as("peak_concurrency"),
        col("n_starts"))
      .orderBy("event_type", "day")
  }

  /** OHLC resample bars per (event_type, day) — the time-series downsample
    * behind every candlestick/metric-rollup view: open/close are the first/
    * last value in (ts, event_id) order (total order — engine-independent),
    * high/low/total plain aggregates. ONE window (rank + partition count
    * share a sort) feeding one groupBy; raw values pass through row-local,
    * only the volume sum is rounded onto its 2dp grid.
    */
  def evtOhlc(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBar = Window.partitionBy("event_type", "day")
      .orderBy(col("ts"), col("event_id"))
    val all = Window.partitionBy("event_type", "day")
    Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("rn", row_number().over(byBar))
      .withColumn("cnt", count(lit(1)).over(all))
      .groupBy("event_type", "day")
      .agg(
        max(when(col("rn") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn") === col("cnt"), col("value"))).as("close"),
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("volume"))
      .orderBy("event_type", "day")
  }

  /** Weekly stickiness (DAU/WAU): Σ daily-active ∕ (days-present × weekly-
    * active) in integer ppm — the engagement-intensity ratio product teams
    * track. Both actives collapse to distinct (user, period) BEFORE any
    * join (the only corpus-wide shuffles, user-keyed); the ppm division is
    * exact integer math.
    */
  def evtStickiness(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        to_date(date_trunc("week", col("ts"))).as("week"))
    // ONE event-scale distinct; both aggregates branch off it (identical
    // subtree → ReuseExchange runs the big shuffle once). WAU from the
    // user-day frame is exact: distinct (user, week) is implied.
    val uds = e.select("user_id", "day", "week").distinct()
    val dau = uds
      .groupBy("week", "day").agg(count(lit(1)).as("dau"))
      .groupBy("week").agg(sum(col("dau")).as("sum_dau"),
        count(lit(1)).as("n_days"))
    val wau = uds.select("user_id", "week").distinct()
      .groupBy("week").agg(count(lit(1)).as("wau"))
    dau.join(wau, "week")
      .withColumn("stickiness_ppm",
        expr("sum_dau * 1000000 div (n_days * wau)"))
      .select(col("week"), col("n_days"), col("sum_dau"), col("wau"),
        col("stickiness_ppm"))
      .orderBy("week")
  }

  /** Longest consecutive-day activity streak per user — calendar
    * gaps-and-islands (distinct active days; island key = day − rank, which
    * is constant exactly while days are consecutive). The corpus collapses
    * to distinct (user, day) first; the window sorts only those. Streak
    * arithmetic is all dates/integers — exact anywhere.
    */
  def evtStreaks(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("day")
    Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("island", date_sub(col("day"), row_number().over(byUser)))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("streak"))
      .groupBy("user_id")
      .agg(sum(col("streak")).as("n_active_days"),
        max(col("streak")).as("longest_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }

  /** Conversion-lag distribution: for users whose first purchase follows
    * their first view, the view→purchase gap in exact µs, summarized as
    * count/min/median/p90/max (exact percentiles ≡ DuckDB quantile_cont).
    * Two min-aggregations on user_id then one tiny global summary — the
    * funnel-latency SLA query.
    */
  def evtTimeToConvert(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val p = e.filter(col("event_type") === "purchase")
      .join(v, "user_id").filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    v.join(p, "user_id")
      .select((unix_micros(col("t_purchase")) - unix_micros(col("t_view"))).as("gap_us"))
      .agg(
        count(lit(1)).as("n_converted"),
        min(col("gap_us")).as("min_us"),
        expr("percentile(gap_us, 0.5)").as("median_us"),
        expr("percentile(gap_us, 0.9)").as("p90_us"),
        max(col("gap_us")).as("max_us"))
  }

  /** Per-user ML feature assembly — the feature-store export: behavioral
    * counts by type (conditional aggs, not a pivot shuffle), recency, span,
    * distinct active days, and exact-decimal monetary value, one row per
    * user in ONE groupBy pass over the corpus (count-distinct adds the only
    * expansion). This is the table a training job joins against labels.
    */
  def evtFeatureVector(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(
        count(when(col("event_type") === "view", lit(1))).as("n_view"),
        count(when(col("event_type") === "click", lit(1))).as("n_click"),
        count(when(col("event_type") === "purchase", lit(1))).as("n_purchase"),
        countDistinct(to_date(col("ts"))).as("active_days"),
        to_date(min(col("ts"))).as("first_day"),
        to_date(max(col("ts"))).as("last_day"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(19,6)"))).as("mv"))
      .select(col("user_id"), col("n_view"), col("n_click"), col("n_purchase"),
        col("active_days"), col("first_day"), col("last_day"),
        datediff(col("last_day"), col("first_day")).as("span_days"),
        coalesce(col("mv").cast("double"), lit(0.0)).as("monetary"))
      .orderBy("user_id")
  }

  /** Point-in-time join against the SCD2 dimension (the warehouse "fact ⋈
    * dimension-as-of-event-time" shape): each click attaches the purchase-
    * state version in effect at its timestamp — the row of scd2Intervals
    * whose [valid_from, valid_to) contains ts. Because SCD2 intervals TILE
    * the time axis per key (valid_to = next valid_from), interval
    * containment is equivalent to "latest valid_from ≤ ts", so the plan is
    * the single-shuffle union+window as-of join (operators.AsOf) — never
    * the BETWEEN-join nested loop Spark would otherwise plan; clicks
    * before the first version report null. The oracle states the semantics
    * the long way (LEFT JOIN ... BETWEEN) to pin the equivalence.
    */
  def joinScd2Pit(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val scd = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("valid_from"),
        col("event_id").as("ver_id"), col("value").as("state_value"))
    graft.operators.AsOf.joinLeftAsOf(
      left = clicks, right = scd, key = "user_id",
      leftTime = "ts", rightTime = "valid_from", leftId = "event_id",
      tieBreak = "ver_id", payload = Seq("ver_id", "state_value"))
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
        col("ver_id"), col("state_value"))
      .orderBy("click_id")
  }

  /** Abandonment funnel — per day, how many views converted to a purchase
    * by the same user within 1 hour vs were abandoned: evtAttribution's
    * forward mirror (there: purchase → which click caused it; here: view →
    * did a purchase follow). The "next purchase after each view" is the
    * single-shuffle forward as-of (operators.AsOf.joinLeftAsOfForward) —
    * never a per-view subquery or a time-range join explosion; the horizon
    * test is then a plain column predicate on the attached timestamp, and
    * the daily rollup is a days-sized groupBy. Abandon rate is integer-ppm
    * via cross-multiplication. The oracle states the semantics the long
    * way (MIN(p.ts ≥ v.ts) per view) to pin the as-of equivalence.
    */
  def evtAbandoned(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    graft.operators.AsOf.joinLeftAsOfForward(
      left = views, right = purchases, key = "user_id",
      leftTime = "ts", rightTime = "p_ts", leftId = "event_id",
      tieBreak = "p_id", payload = Seq("p_ts"))
      .withColumn("converted",
        col("p_ts").isNotNull && col("p_ts") < col("ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_views"),
        count(when(col("converted"), lit(1))).as("n_converted"))
      .withColumn("abandon_ppm",
        expr("(n_views - n_converted) * 1000000 div n_views"))
      .select("day", "n_views", "n_converted", "abandon_ppm")
      .orderBy("day")
  }

  /** Per-user rate-outlier flag — the bot/abuse screen a training-data
    * curation run applies to behavioral logs: each user's PEAK daily event
    * count against the corpus-wide exact p99 of daily counts; users whose
    * peak exceeds it are flagged with the offending day. Shapes: one
    * (user, day) groupBy; a 1-row exact percentile broadcast; a per-user
    * window for the peak day (count desc, day asc — deterministic on
    * ties). Spark's exact percentile() interpolates identically to
    * quantile_cont, and the > comparison runs on those identical doubles.
    * Complements evt_zscore_anomaly: that flags corpus-level volume
    * anomalies, this flags individual actors.
    */
  def evtRateOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val thr = daily.agg(expr("percentile(c, 0.99)").as("thr"))
    val byPeak = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("c").desc, col("day"))
    daily
      .withColumn("rn", row_number().over(byPeak))
      .filter(col("rn") === 1)
      .crossJoin(broadcast(thr))
      .filter(col("c") > col("thr"))
      .select(col("user_id"), col("day").as("peak_day"),
        col("c").as("peak_events"), round(col("thr"), 4).as("threshold"))
      .orderBy("user_id")
  }

  /** Inter-arrival BURSTINESS screen — the bot/automation signal
    * [[evtRateOutliers]]' peak-day count misses: a scripted client fires
    * METRONOMICALLY (squared CV of its inter-event gaps ≈ 0 — rate can
    * look normal) while organic traffic is bursty (CV² ≈ 1 at Poisson,
    * ≫ 1 with sessions). Gaps in whole seconds (integer floor of the µs
    * difference — identical on both engines); CV² is the exact rational
    * n·Σg²∕(Σg)² − 1 carried in DECIMAL(38,0) power sums with ONE
    * integral division onto the micro grid (the agg_gini discipline —
    * no engine float variance). Labels: metronomic CV² < 0.1, bursty
    * CV² > 4. Scale: one user-keyed window (high-cardinality key) +
    * one map-side-combinable groupBy.
    *
    * 38-digit bound (DuckDB carries the sums in 128-bit HUGEINT, so the
    * Spark DECIMAL(38,0) side is the binding one): the intermediate is
    * n·Σg²·10⁶ with Σg² ≤ gap_max·Σg ≤ span² where span = the user's
    * activity extent in seconds. A century-long log has span ≤ 3.2·10⁹,
    * so n·Σg²·10⁶ ≤ n·10²⁵·1.1 — inside 10³⁸ for any per-user gap count
    * n ≤ 10¹³, i.e. for any corpus physically storable (10¹³ events for
    * ONE user). Both engines therefore stay exact over the whole
    * realizable input range; no clamp needed.
    */
  def evtBurstiness(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .filter(col("prev").isNotNull)
      .select(col("user_id"),
        expr("(unix_micros(ts) - unix_micros(prev)) div 1000000").as("gap_s"))
    gaps.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).as("sg"),
        sum(col("gap_s").cast("decimal(38,0)") * col("gap_s")).as("sg2"))
      .filter(col("n_gaps") >= 10)
      .withColumn("mean_gap_s", expr("sg div n_gaps"))
      // sg = 0 (every gap under a second) is the EXTREME metronomic
      // case — all-zero gaps have zero variance, so CV² is 0 by
      // definition; excluding it would drop exactly the sub-second
      // scripted client this screen exists to catch
      .withColumn("cv2_micro", expr(
        "CASE WHEN sg = 0 THEN CAST(0 AS BIGINT) ELSE " +
          "CAST((CAST(n_gaps AS DECIMAL(38,0)) * sg2 * 1000000) div " +
          "(CAST(sg AS DECIMAL(38,0)) * CAST(sg AS DECIMAL(38,0))) " +
          "- 1000000 AS BIGINT) END"))
      .withColumn("label",
        when(col("cv2_micro") < 100000L, "metronomic")
          .when(col("cv2_micro") > 4000000L, "bursty")
          .otherwise("normal"))
      .select("user_id", "n_gaps", "mean_gap_s", "cv2_micro", "label")
      .orderBy("user_id")
  }

  /** Time-bounded multi-step funnel — view → click within 1 h → purchase
    * within 2 h OF THE CLICK (the product-metrics funnel where each step's
    * clock starts at the previous step, unlike evtFunnel's simple ordered
    * containment). Two CHAINED single-shuffle forward as-ofs: step 2's
    * probe time is step 1's attached click timestamp — the composition
    * pattern join_asof_multi uses for joins, applied to funnel analytics.
    * Views that missed step 1 are excluded from the second as-of (a null
    * probe time has no "next purchase") and rejoin as non-converted.
    */
  def evtFunnelSteps(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val s1 = graft.operators.AsOf.joinLeftAsOfForward(
      left = views, right = clicks, key = "user_id",
      leftTime = "ts", rightTime = "c_ts", leftId = "event_id",
      tieBreak = "c_id", payload = Seq("c_ts"))
    val s2 = graft.operators.AsOf.joinLeftAsOfForward(
      left = s1.filter(col("c_ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("c_ts")),
      right = purchases, key = "user_id",
      leftTime = "c_ts", rightTime = "p_ts", leftId = "event_id",
      tieBreak = "p_id", payload = Seq("p_ts"))
    s1.join(s2.select(col("event_id"), col("p_ts")), Seq("event_id"), "left")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_views"),
        count(when(col("c_ts") < col("ts") + expr("INTERVAL 1 HOUR"), lit(1)))
          .as("n_clicked"),
        count(when(col("c_ts") < col("ts") + expr("INTERVAL 1 HOUR") &&
          col("p_ts") < col("c_ts") + expr("INTERVAL 2 HOUR"), lit(1)))
          .as("n_purchased"))
      .withColumn("funnel_ppm", expr("n_purchased * 1000000 div n_views"))
      .select("day", "n_views", "n_clicked", "n_purchased", "funnel_ppm")
      .orderBy("day")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_scd2_pit" -> (joinScd2Pit _),
    "evt_abandoned" -> (evtAbandoned _),
    "evt_rate_outliers" -> (evtRateOutliers _),
    "evt_burstiness" -> (evtBurstiness _),
    "evt_funnel_steps" -> (evtFunnelSteps _),
    "evt_feature_vector" -> (evtFeatureVector _),
    "evt_streaks"     -> (evtStreaks _),
    "evt_time_to_convert" -> (evtTimeToConvert _),
    "evt_ohlc"        -> (evtOhlc _),
    "evt_stickiness"  -> (evtStickiness _),
    "evt_pareto"      -> (evtPareto _),
    "evt_concurrency" -> (evtConcurrency _),
    "evt_seasonal_anomaly" -> (evtSeasonalAnomaly _),
    "evt_audience_overlap" -> (evtAudienceOverlap _),
    "evt_drawdown"    -> (evtDrawdown _),
    "evt_rfm"         -> (evtRfm _),
    "evt_survival"    -> (evtSurvival _),
    "evt_cusum"       -> (evtCusum _),
    "evt_attribution" -> (evtAttribution _),
    "win_session_cap" -> (winSessionCap _),
    "evt_cohort_ltv" -> (evtCohortLtv _),
    "evt_zscore_anomaly" -> (evtZscoreAnomaly _),
    "scd2_intervals" -> (scd2Intervals _),
    "evt_histogram_eqdepth" -> (evtHistogramEqdepth _),
    "evt_dwell"     -> (evtDwell _),
    "evt_transitions" -> (evtTransitions _),
    "evt_markov_stationary" -> (evtMarkovStationary _),
    "evt_wow_change" -> (evtWowChange _),
    "evt_histogram" -> (evtHistogram _),
    "evt_tumbling"  -> (evtTumbling _),
    "evt_sliding"   -> (evtSliding _),
    "evt_session"   -> (evtSession _),
    "evt_gapfill"   -> (evtGapfill _),
    "evt_locf"      -> (evtLocf _),
    "evt_autocorr7" -> (evtAutocorr7 _),
    "evt_hod_dow"   -> (evtHodDow _),
    "evt_rolling_dau" -> (evtRollingDau _),
    "evt_forecast_baseline" -> (evtForecastBaseline _),
    "evt_attribution_linear" -> (evtAttributionLinear _),
    "evt_paths3"    -> (evtPaths3 _),
    "evt_funnel"    -> (evtFunnel _),
    "evt_retention" -> (evtRetention _),
  )

  /** Seasonal-naive forecast backtest — predict each day's event count
    * with the same weekday last week (the baseline every real forecast
    * must beat) and score MAE + MAPE over the evaluable days. The eval
    * pairing is the `evt_autocorr7` equi-join; errors are exact integer
    * differences, MAE is one double division of exact sums, MAPE is
    * integer ppm via cross-multiplication — the whole backtest is
    * reduction-order-free. Shape: daily rollup (map-side combined) then
    * days-scale arithmetic; nothing event-scale past the first groupBy.
    */
  def evtForecastBaseline(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val pairs = daily
      .join(daily.select(col("event_type"), date_add(col("day"), 7).as("day"),
          col("x").as("forecast")),
        Seq("event_type", "day"))
    pairs
      .withColumn("abs_err", abs(col("x") - col("forecast")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("abs_err")).as("sum_abs_err"),
        round(sum(col("abs_err")).cast("double") / count(lit(1)), 6).as("mae"),
        expr("sum(abs_err) * 1000000 div sum(x)").as("mape_ppm"))
      .orderBy("event_type")
  }

  /** Trailing-7-day rolling distinct users (rolling DAU) — exact sliding
    * distinct, the metric window functions CANNOT express (COUNT(DISTINCT)
    * over a moving frame isn't decomposable). The scalable identity: a
    * user active on day d belongs to exactly the 7 windows ending
    * d..d+6, so explode each distinct (user, day) into its 7 window-end
    * days and countDistinct per window — corpus-linear ×7, all equi-keyed,
    * no per-window rescan. Window ends past the observed series are
    * dropped; early windows are legitimately partial history. dau1 rides
    * along for the day-over-window engagement ratio (integer ppm).
    */
  def evtRollingDau(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val ud = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val bounds = e.agg(max(to_date(col("ts"))).as("max_day"))
    val rolling = ud
      .select(col("user_id"), explode(expr("sequence(0, 6)")).as("k"), col("day"))
      .select(col("user_id"), expr("date_add(day, k)").as("w_end"))
      .crossJoin(broadcast(bounds))
      .filter(col("w_end") <= col("max_day"))
      .groupBy("w_end")
      .agg(countDistinct(col("user_id")).as("dau7"))
    val daily = ud.groupBy(col("day").as("w_end"))
      .agg(count(lit(1)).as("dau1"))
    rolling.join(daily, Seq("w_end"), "left")
      .select(col("w_end"), coalesce(col("dau1"), lit(0L)).as("dau1"), col("dau7"),
        expr("coalesce(dau1, 0) * 1000000 div dau7").as("ratio_ppm"))
      .orderBy("w_end")
  }

  /** Hour-of-day × day-of-week seasonality grid per event type — the ops
    * heatmap behind alert thresholds and capacity planning (a Tuesday-3am
    * spike means something different than a Friday-noon one). One
    * map-side-combined groupBy to a bounded grid (types × 7 × 24); the
    * per-type share is integer ppm over a window total — no float
    * division. Spark's dayofweek is 1=Sunday; DuckDB's is 0=Sunday, so
    * the oracle adds 1.
    */
  def evtHodDow(spark: SparkSession, sfDir: String): DataFrame = {
    val grid = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"),
        hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"))
    grid
      .withColumn("share_ppm", expr("n * 1000000 div sum(n) over (partition by event_type)"))
      .select("event_type", "dow", "hod", "n", "share_ppm")
      .orderBy("event_type", "dow", "hod")
  }

  /** Weekly-seasonality check: lag-7 autocorrelation of the daily count
    * series per event type (Pearson r between day t and day t−7 over all
    * days where both exist). A strong r confirms day-of-week structure
    * before anyone fits a forecast. Exactness: daily counts are integers,
    * the lag pairing is an equi-join on (type, day−7), power sums stay in
    * BIGINT (counts are small relative to 2⁶³), and only the closed-form
    * correlation at the end touches doubles — identical operands → one
    * rounded double in both engines (`agg_corr_exact`'s discipline on a
    * self-joined series). Scale: daily-rollup first (map-side combine),
    * so the join and sums run on days×types rows, not events.
    */
  def evtAutocorr7(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val pairs = daily.select(col("event_type"), col("day"), col("x"))
      .join(daily.select(col("event_type"), date_add(col("day"), 7).as("day"),
          col("x").as("y")),
        Seq("event_type", "day"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    pairs.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(
        col("event_type"), col("n").as("n_pairs"),
        round((n * sxy - sx * sy)
          / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("autocorr7"))
      .orderBy("event_type")
  }

  /** Multi-touch LINEAR attribution — every click within the hour before a
    * purchase shares the purchase value equally (vs `evt_attribution`'s
    * last-touch winner-takes-all). Shape: one user-keyed equi-join with a
    * time-band residual filter (bounded per-user fan-out, same discipline
    * as the as-of family), a per-purchase window count, then a per-user
    * rollup. Float discipline: each touch's credit is ONE double division
    * (value/n_touches, identical operands both engines) rounded onto the
    * 6dp grid, and per-user totals sum those rounded values as DECIMAL —
    * order-independent at any parallelism.
    */
  def evtAttributionLinear(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("value").as("p_val"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    val touches = p.join(c, Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("interval 1 hour"))
    val perPurchase = Window.partitionBy("p_id")
    touches
      .withColumn("n_touches", count(lit(1)).over(perPurchase))
      .withColumn("credit",
        round(col("p_val") / col("n_touches"), 6).cast("decimal(20,6)"))
      .groupBy("user_id")
      .agg(
        countDistinct(col("p_id")).as("n_purchases"),
        count(lit(1)).as("n_touches"),
        sum(col("credit")).cast("double").as("attributed_value"))
      .orderBy("user_id")
  }

  /** Top 3-step behavioral paths — the `evt_transitions` Markov pairs
    * extended to path mining: consecutive event-type triples per user
    * (total order pinned by (ts, event_id)), counted corpus-wide, top-10.
    * One user-keyed shuffle+sort serves both lead() calls; the count is a
    * map-side-combined groupBy on a tiny path vocabulary (≤ |types|³).
    * count-desc + path-asc makes the limit deterministic.
    */
  def evtPaths3(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
  }

  /** Calendar densify + last-observation-carried-forward — the standard
    * time-series repair for sparse daily metrics (a day with no purchases
    * still reports the last known mean ticket, flagged unobserved). The
    * observed series is one groupBy; the fill is a per-type window carry
    * (`last(..., ignoreNulls)` over rows-unbounded-preceding), so the whole
    * operator is one small shuffle on (event_type) after a map-side daily
    * rollup — calendar × types is days-scale, never event-scale. Daily
    * value = exact DECIMAL sum / BIGINT count in one double division,
    * rounded: identical in both engines regardless of partial-agg order.
    * Oracle formulation avoids engine-specific IGNORE NULLS syntax by
    * expressing the carry as a left ASOF join of the calendar onto the
    * observed days — semantically the same "latest earlier observation".
    */
  def evtLocf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val daily = e
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(round(sum(col("value").cast("decimal(30,6)")).cast("double")
        / count(lit(1)), 6).as("obs_val"))
    val calendar = e
      .select(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .crossJoin(e.select(col("event_type")).distinct())
    val carry = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar.join(daily, Seq("day", "event_type"), "left_outer")
      .withColumn("filled_val", last(col("obs_val"), ignoreNulls = true).over(carry))
      .withColumn("observed", col("obs_val").isNotNull)
      .select("day", "event_type", "filled_val", "observed")
      .orderBy("event_type", "day")
  }

  override def oracles: Map[String, String] = Map(
    "evt_forecast_baseline" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM events GROUP BY event_type, day
        |), pairs AS (
        |  SELECT a.event_type, a.x, b.x AS forecast
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day = b.day + INTERVAL 7 DAY
        |)
        |SELECT event_type, COUNT(*) AS n_days,
        |  CAST(SUM(abs(x - forecast)) AS BIGINT) AS sum_abs_err,
        |  ROUND(CAST(SUM(abs(x - forecast)) AS DOUBLE) / COUNT(*), 6) AS mae,
        |  CAST(SUM(abs(x - forecast)) * 1000000 // SUM(x) AS BIGINT) AS mape_ppm
        |FROM pairs GROUP BY event_type ORDER BY event_type""".stripMargin,
    "evt_rolling_dau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), bounds AS (
        |  SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events
        |), rolling AS (
        |  SELECT CAST(day + k * INTERVAL 1 DAY AS DATE) AS w_end,
        |    COUNT(DISTINCT user_id) AS dau7
        |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS k)
        |  CROSS JOIN bounds
        |  WHERE day + k * INTERVAL 1 DAY <= max_day
        |  GROUP BY w_end
        |), daily AS (
        |  SELECT day AS w_end, COUNT(*) AS dau1 FROM ud GROUP BY day
        |)
        |SELECT r.w_end, COALESCE(d.dau1, 0) AS dau1, r.dau7,
        |  CAST(COALESCE(d.dau1, 0) * 1000000 // r.dau7 AS BIGINT) AS ratio_ppm
        |FROM rolling r LEFT JOIN daily d ON r.w_end = d.w_end
        |ORDER BY r.w_end""".stripMargin,
    "evt_hod_dow" ->
      """WITH grid AS (
        |  SELECT event_type, CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |    CAST(hour(ts) AS INTEGER) AS hod, COUNT(*) AS n
        |  FROM events GROUP BY event_type, dow, hod
        |)
        |SELECT event_type, dow, hod, n,
        |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS share_ppm
        |FROM grid ORDER BY event_type, dow, hod""".stripMargin,
    "evt_autocorr7" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM events GROUP BY event_type, day
        |), pairs AS (
        |  SELECT a.event_type, a.x AS x, b.x AS y
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day = b.day + INTERVAL 7 DAY
        |), sums AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        |  FROM pairs GROUP BY event_type
        |)
        |SELECT event_type, n AS n_pairs,
        |  ROUND((n * sxy - sx * sy) /
        |        sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |           * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS autocorr7
        |FROM sums ORDER BY event_type""".stripMargin,
    "evt_attribution_linear" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS p_id, ts AS p_ts, value AS p_val
        |  FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, event_id AS c_id, ts AS c_ts
        |  FROM events WHERE event_type = 'click'
        |), touches AS (
        |  SELECT p.user_id, p.p_id, p.p_val
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
        |), credited AS (
        |  SELECT user_id, p_id,
        |    CAST(ROUND(p_val / COUNT(*) OVER (PARTITION BY p_id), 6) AS DECIMAL(20,6)) AS credit
        |  FROM touches
        |)
        |SELECT user_id, COUNT(DISTINCT p_id) AS n_purchases, COUNT(*) AS n_touches,
        |  CAST(SUM(credit) AS DOUBLE) AS attributed_value
        |FROM credited GROUP BY user_id ORDER BY user_id""".stripMargin,
    "evt_paths3" ->
      """WITH seq AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events
        |)
        |SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
        |FROM seq WHERE e3 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin,
    "evt_locf" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |    ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*), 6) AS obs_val
        |  FROM events GROUP BY day, event_type
        |), bounds AS (
        |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
        |), cal AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day,
        |    event_type
        |  FROM bounds CROSS JOIN (SELECT DISTINCT event_type FROM events)
        |)
        |SELECT cal.day, cal.event_type, d.obs_val AS filled_val,
        |  EXISTS (SELECT 1 FROM daily x
        |          WHERE x.day = cal.day AND x.event_type = cal.event_type) AS observed
        |FROM cal ASOF LEFT JOIN daily d
        |  ON cal.event_type = d.event_type AND cal.day >= d.day
        |ORDER BY cal.event_type, cal.day""".stripMargin,
    "evt_feature_vector" ->
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
        |  CAST(MIN(ts) AS DATE) AS first_day,
        |  CAST(MAX(ts) AS DATE) AS last_day,
        |  CAST(date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS INTEGER)
        |    AS span_days,
        |  COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
        |    THEN CAST("value" AS DECIMAL(19,6)) END) AS DOUBLE), 0.0) AS monetary
        |FROM events GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "evt_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), i AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
        |      AS island
        |  FROM d
        |), s AS (
        |  SELECT user_id, island, COUNT(*) AS streak FROM i GROUP BY user_id, island
        |)
        |SELECT user_id, CAST(SUM(streak) AS BIGINT) AS n_active_days,
        |  MAX(streak) AS longest_streak, COUNT(*) AS n_streaks
        |FROM s GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "evt_time_to_convert" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), p AS (
        |  SELECT e.user_id, MIN(ts) AS t_purchase
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE event_type = 'purchase' AND ts > t_view GROUP BY e.user_id
        |), g AS (
        |  SELECT epoch_us(t_purchase) - epoch_us(t_view) AS gap_us
        |  FROM v JOIN p ON v.user_id = p.user_id
        |)
        |SELECT COUNT(*) AS n_converted, MIN(gap_us) AS min_us,
        |  quantile_cont(gap_us, 0.5) AS median_us,
        |  quantile_cont(gap_us, 0.9) AS p90_us,
        |  MAX(gap_us) AS max_us
        |FROM g""".stripMargin,
    "evt_ohlc" ->
      """WITH t AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, "value",
        |    row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
        |      ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS cnt
        |  FROM events
        |)
        |SELECT event_type, day,
        |  MAX(CASE WHEN rn = 1 THEN "value" END) AS open,
        |  MAX("value") AS high,
        |  MIN("value") AS low,
        |  MAX(CASE WHEN rn = cnt THEN "value" END) AS close,
        |  COUNT(*) AS n,
        |  ROUND(SUM("value"), 2) AS volume
        |FROM t GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,
    "evt_stickiness" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events
        |), dau AS (
        |  SELECT week, day, COUNT(*) AS dau
        |  FROM (SELECT DISTINCT user_id, day, week FROM e)
        |  GROUP BY week, day
        |), dd AS (
        |  SELECT week, CAST(SUM(dau) AS BIGINT) AS sum_dau, COUNT(*) AS n_days
        |  FROM dau GROUP BY week
        |), wau AS (
        |  SELECT week, COUNT(*) AS wau
        |  FROM (SELECT DISTINCT user_id, week FROM e)
        |  GROUP BY week
        |)
        |SELECT dd.week, n_days, sum_dau, wau,
        |  CAST(sum_dau * 1000000 // (n_days * wau) AS BIGINT) AS stickiness_ppm
        |FROM dd JOIN wau ON dd.week = wau.week
        |ORDER BY dd.week""".stripMargin,
    "evt_pareto" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, SUM(CAST("value" AS DECIMAL(19,6))) AS v
        |  FROM events GROUP BY event_type, user_id
        |), r AS (
        |  SELECT event_type, user_id, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v DESC, user_id) AS rnk,
        |    SUM(v) OVER (PARTITION BY event_type ORDER BY v DESC, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(v) OVER (PARTITION BY event_type) AS total,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n_users
        |  FROM pu
        |), f AS (
        |  SELECT event_type, n_users, total, MIN(rnk) AS users_to_80
        |  FROM r WHERE cum * 5 >= total * 4
        |  GROUP BY event_type, n_users, total
        |)
        |SELECT event_type, n_users, CAST(users_to_80 AS INTEGER) AS users_to_80,
        |  CAST(users_to_80 * 1000000 // n_users AS BIGINT) AS pct_users_ppm,
        |  CAST(total AS DOUBLE) AS total_value
        |FROM f ORDER BY event_type""".stripMargin,
    "evt_audience_overlap" ->
      """WITH u AS (
        |  SELECT DISTINCT event_type, user_id FROM events
        |), pt AS (
        |  SELECT event_type, COUNT(*) AS n FROM u GROUP BY event_type
        |), inter AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
        |  FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY type_a, type_b
        |)
        |SELECT i.type_a, i.type_b, pa.n AS n_a, pb.n AS n_b, i.n_both,
        |  i.n_both * 1000000 // (pa.n + pb.n - i.n_both) AS jaccard_ppm
        |FROM inter i
        |JOIN pt pa ON i.type_a = pa.event_type
        |JOIN pt pb ON i.type_b = pb.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "evt_seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS obs
        |  FROM events GROUP BY event_type, day
        |), d2 AS (
        |  SELECT *, dayofweek(day) AS dow FROM daily
        |), bydow AS (
        |  SELECT event_type AS et, dow AS d,
        |    CAST(SUM(obs) AS BIGINT) AS dow_total, COUNT(*) AS n_days
        |  FROM d2 GROUP BY et, d
        |)
        |SELECT d2.event_type, d2.day, d2.obs, bydow.n_days,
        |  dow_total * 1000000 // n_days AS expected_micro,
        |  d2.obs * n_days * 1000000 // dow_total AS ratio_ppm,
        |  CASE WHEN abs(d2.obs * n_days * 1000000 // dow_total - 1000000) > 300000
        |       THEN 1 ELSE 0 END AS anomaly
        |FROM d2 JOIN bydow ON d2.event_type = bydow.et AND d2.dow = bydow.d
        |ORDER BY event_type, day""".stripMargin,
    "evt_concurrency" ->
      """WITH d AS (
        |  SELECT event_type, ts AS t, 1 AS delta, event_id FROM events
        |  UNION ALL
        |  SELECT event_type, ts + INTERVAL 30 MINUTE, -1, event_id FROM events
        |), c AS (
        |  SELECT event_type, CAST(t AS DATE) AS day, delta,
        |    SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d
        |), byday AS (
        |  SELECT event_type, day,
        |    CAST(MAX(cum) AS BIGINT) AS max_cum,
        |    CAST(SUM(delta) AS BIGINT) AS day_delta,
        |    CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
        |  FROM c GROUP BY event_type, day
        |)
        |SELECT event_type, day,
        |  GREATEST(max_cum, CAST(COALESCE(SUM(day_delta) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
        |    AS peak_concurrency,
        |  n_starts
        |FROM byday
        |ORDER BY event_type, day""".stripMargin,
    "evt_drawdown" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)
        |), r AS (
        |  SELECT event_type, day, cnt,
        |    MAX(cnt) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
        |  FROM daily
        |), d AS (
        |  SELECT *, run_max - cnt AS dd FROM r
        |), w AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY dd DESC, day) AS rn FROM d
        |)
        |SELECT event_type, run_max AS peak_daily, dd AS max_drawdown,
        |  day AS worst_day
        |FROM w WHERE rn = 1
        |ORDER BY event_type""".stripMargin,
    "evt_rfm" ->
      """WITH pu AS (
        |  SELECT user_id, CAST(MAX(ts) AS DATE) AS last_day, COUNT(*) AS freq,
        |    SUM(CAST("value" AS DECIMAL(19,6))) AS monetary
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
        |), mx AS (
        |  SELECT MAX(last_day) AS max_day FROM pu
        |), sc AS (
        |  SELECT user_id, freq, monetary,
        |    date_diff('day', last_day, max_day) AS recency_days
        |  FROM pu CROSS JOIN mx
        |), q AS (
        |  SELECT *,
        |    CAST(ntile(5) OVER (ORDER BY recency_days, user_id) AS INTEGER) AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY freq DESC, user_id) AS INTEGER) AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS INTEGER) AS m_score
        |  FROM sc
        |)
        |SELECT r_score, f_score, m_score, COUNT(*) AS n_users,
        |  CAST(SUM(monetary) AS DOUBLE) AS segment_value
        |FROM q GROUP BY r_score, f_score, m_score
        |ORDER BY r_score, f_score, m_score""".stripMargin,
    "evt_survival" ->
      """WITH pu AS (
        |  SELECT user_id, CAST(MIN(ts) AS DATE) AS first_day,
        |    CAST(MAX(ts) AS DATE) AS last_day
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
        |), lt AS (
        |  SELECT date_diff('day', first_day, last_day) AS t,
        |    CASE WHEN last_day = (SELECT MAX(last_day) FROM pu)
        |         THEN 1 ELSE 0 END AS censored
        |  FROM pu
        |), byt AS (
        |  SELECT t, COUNT(*) AS leaving,
        |    SUM(1 - censored) AS n_deaths, SUM(censored) AS n_censored
        |  FROM lt GROUP BY t
        |), w AS (
        |  SELECT *, (SELECT SUM(leaving) FROM byt)
        |    - COALESCE(SUM(leaving) OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
        |  FROM byt
        |), f AS (
        |  SELECT *,
        |    CASE WHEN n_deaths < n_at_risk
        |      THEN CAST(ROUND(ln(1 - n_deaths::DOUBLE / n_at_risk), 9)
        |                AS DECIMAL(16,9)) END AS lnf,
        |    MAX(CASE WHEN n_deaths = n_at_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND CURRENT ROW) AS dead
        |  FROM w
        |)
        |SELECT CAST(t AS INTEGER) AS t_days, CAST(n_at_risk AS BIGINT) AS n_at_risk,
        |  CAST(n_deaths AS BIGINT) AS n_deaths,
        |  CAST(n_censored AS BIGINT) AS n_censored,
        |  CASE WHEN dead = 1 THEN NULL
        |       ELSE CAST(SUM(lnf) OVER (ORDER BY t ROWS BETWEEN
        |              UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  END AS log_survival
        |FROM f ORDER BY t_days""".stripMargin,
    "evt_cusum" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), st AS (
        |  SELECT event_type,
        |    CAST(ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6)
        |         AS DECIMAL(18,6)) AS mu,
        |    CAST(ROUND(sqrt(CAST(COUNT(*) * SUM(CAST(n AS DECIMAL(38,0)) * n)
        |               - SUM(n) * SUM(n) AS DOUBLE)) / COUNT(*), 6)
        |         AS DECIMAL(18,6)) AS sigma
        |  FROM daily GROUP BY 1
        |), c AS (
        |  SELECT d.event_type, day, n, sigma,
        |    SUM(n - mu) OVER (PARTITION BY d.event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        |  FROM daily d JOIN st USING (event_type)
        |), f AS (
        |  SELECT *, MIN(LEAST(cs, 0)) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS fl
        |  FROM c
        |)
        |SELECT event_type, day, n AS n_events,
        |  CAST((cs - fl) * 1000000 AS BIGINT) AS cusum_micro,
        |  (cs - fl) > sigma * 3 AS alarm
        |FROM f ORDER BY event_type, day""".stripMargin,
    "evt_attribution" ->
      """WITH c1 AS (
        |  SELECT user_id, ts AS click_ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        |)
        |SELECT p.event_id, p.user_id, p.ts, c1.click_id, c1.click_ts,
        |  epoch_us(p.ts) - epoch_us(c1.click_ts) AS gap_us,
        |  COALESCE(epoch_us(p.ts) - epoch_us(c1.click_ts) <= 3600000000, FALSE)
        |    AS attributed
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN c1 ON p.user_id = c1.user_id AND p.ts >= c1.click_ts
        |ORDER BY p.event_id""".stripMargin,
    "win_session_cap" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |              >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |), sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked
        |), capped AS (
        |  SELECT user_id, ts, sid,
        |    (epoch_us(ts) - epoch_us(MIN(ts) OVER (PARTITION BY user_id, sid)))
        |      // 7200000000 AS sub
        |  FROM sessions
        |)
        |SELECT user_id, MIN(ts) AS s_start, MAX(ts) AS s_end, COUNT(*) AS n
        |FROM capped GROUP BY user_id, sid, sub
        |ORDER BY user_id, s_start""".stripMargin,
    "evt_cohort_ltv" ->
      """WITH fw AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY user_id
        |), weekly AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week,
        |    SUM(CAST("value" AS DECIMAL(19,6))) AS wv
        |  FROM events GROUP BY user_id, CAST(date_trunc('week', ts) AS DATE)
        |), cells AS (
        |  SELECT fw.cohort_week,
        |    CAST(date_diff('day', fw.cohort_week, weekly.week) // 7 AS INTEGER) AS week_offset,
        |    COUNT(DISTINCT weekly.user_id) AS n_active,
        |    SUM(weekly.wv) AS wval
        |  FROM weekly JOIN fw ON weekly.user_id = fw.user_id
        |  GROUP BY fw.cohort_week, date_diff('day', fw.cohort_week, weekly.week) // 7
        |)
        |SELECT cohort_week, week_offset, n_active,
        |  CAST(wval AS DOUBLE) AS week_value,
        |  CAST(SUM(wval) OVER (PARTITION BY cohort_week ORDER BY week_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_ltv
        |FROM cells
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "evt_zscore_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)
        |), stats AS (
        |  SELECT event_type, day, cnt,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n,
        |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS s,
        |    CAST(SUM(cnt * cnt) OVER (PARTITION BY event_type) AS BIGINT) AS q
        |  FROM daily
        |)
        |SELECT event_type, day, cnt,
        |  CASE WHEN n * cnt - s > 0 THEN 'high' ELSE 'low' END AS side
        |FROM stats
        |WHERE (n * cnt - s) * (n * cnt - s) > 4 * (n * q - s * s)
        |ORDER BY event_type, day""".stripMargin,
    "evt_funnel_steps" ->
      """WITH v AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
        |), c AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        |), s1 AS (
        |  SELECT v.event_id, v.user_id, v.ts, MIN(c.ts) AS c_ts
        |  FROM v LEFT JOIN c ON v.user_id = c.user_id AND c.ts >= v.ts
        |  GROUP BY v.event_id, v.user_id, v.ts
        |), s2 AS (
        |  SELECT s1.event_id, s1.user_id, s1.ts, s1.c_ts, MIN(p.ts) AS p_ts
        |  FROM s1 LEFT JOIN p ON s1.user_id = p.user_id AND p.ts >= s1.c_ts
        |  GROUP BY s1.event_id, s1.user_id, s1.ts, s1.c_ts
        |)
        |SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_views,
        |  COUNT(CASE WHEN c_ts < ts + INTERVAL 1 HOUR THEN 1 END) AS n_clicked,
        |  COUNT(CASE WHEN c_ts < ts + INTERVAL 1 HOUR
        |             AND p_ts < c_ts + INTERVAL 2 HOUR THEN 1 END) AS n_purchased,
        |  COUNT(CASE WHEN c_ts < ts + INTERVAL 1 HOUR
        |             AND p_ts < c_ts + INTERVAL 2 HOUR THEN 1 END) * 1000000
        |    // COUNT(*) AS funnel_ppm
        |FROM s2 GROUP BY day ORDER BY day""".stripMargin,
    "evt_rate_outliers" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS c
        |  FROM events GROUP BY user_id, day
        |), thr AS (
        |  SELECT quantile_cont(c, 0.99) AS thr FROM daily
        |), peak AS (
        |  SELECT user_id, day AS peak_day, c AS peak_events,
        |    row_number() OVER (PARTITION BY user_id ORDER BY c DESC, day) AS rn
        |  FROM daily
        |)
        |SELECT user_id, peak_day, peak_events, ROUND(thr.thr, 4) AS threshold
        |FROM peak, thr
        |WHERE rn = 1 AND peak_events > thr.thr
        |ORDER BY user_id""".stripMargin,
    "evt_burstiness" ->
      """WITH g AS (
        |  SELECT user_id,
        |    (epoch_us(ts) - epoch_us(lag(ts) OVER (
        |       PARTITION BY user_id ORDER BY ts, event_id))) // 1000000 AS gap_s
        |  FROM events
        |), s AS (
        |  SELECT user_id, COUNT(*) AS n_gaps,
        |    CAST(SUM(gap_s) AS BIGINT) AS sg,
        |    SUM(CAST(gap_s AS HUGEINT) * gap_s) AS sg2
        |  FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
        |  HAVING COUNT(*) >= 10
        |), cv AS (
        |  SELECT user_id, n_gaps, sg // n_gaps AS mean_gap_s,
        |    CASE WHEN sg = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST((CAST(n_gaps AS HUGEINT) * sg2 * 1000000) //
        |              (CAST(sg AS HUGEINT) * CAST(sg AS HUGEINT)) - 1000000 AS BIGINT)
        |    END AS cv2_micro
        |  FROM s
        |)
        |SELECT user_id, n_gaps, mean_gap_s, cv2_micro,
        |  CASE WHEN cv2_micro < 100000 THEN 'metronomic'
        |       WHEN cv2_micro > 4000000 THEN 'bursty'
        |       ELSE 'normal' END AS label
        |FROM cv ORDER BY user_id""".stripMargin,
    "evt_abandoned" ->
      """WITH v AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
        |), p AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        |), nxt AS (
        |  SELECT v.event_id, v.user_id, v.ts, MIN(p.ts) AS p_ts
        |  FROM v LEFT JOIN p ON v.user_id = p.user_id AND p.ts >= v.ts
        |  GROUP BY v.event_id, v.user_id, v.ts
        |)
        |SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_views,
        |  COUNT(CASE WHEN p_ts IS NOT NULL
        |             AND p_ts < ts + INTERVAL 1 HOUR THEN 1 END) AS n_converted,
        |  (COUNT(*) - COUNT(CASE WHEN p_ts IS NOT NULL
        |             AND p_ts < ts + INTERVAL 1 HOUR THEN 1 END)) * 1000000
        |    // COUNT(*) AS abandon_ppm
        |FROM nxt GROUP BY day ORDER BY day""".stripMargin,
    "join_scd2_pit" ->
      """WITH scd AS (
        |  SELECT user_id, event_id AS ver_id, "value" AS state_value,
        |    ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.event_id AS click_id, c.user_id, c.ts, s.ver_id, s.state_value
        |FROM events c
        |LEFT JOIN scd s ON c.user_id = s.user_id AND c.ts >= s.valid_from
        |  AND (s.valid_to IS NULL OR c.ts < s.valid_to)
        |WHERE c.event_type = 'click'
        |ORDER BY click_id""".stripMargin,
    "scd2_intervals" ->
      """SELECT user_id, event_id, "value", ts AS valid_from,
        |  lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  (lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
        |FROM events
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, valid_from, event_id""".stripMargin,
    "evt_histogram_eqdepth" ->
      """WITH t AS (
        |  SELECT event_type, "value",
        |    CAST(ntile(10) OVER (PARTITION BY event_type ORDER BY "value", event_id) AS INTEGER) AS decile
        |  FROM events
        |)
        |SELECT event_type, decile, COUNT(*) AS n,
        |  MIN("value") AS lo, MAX("value") AS hi
        |FROM t GROUP BY event_type, decile
        |ORDER BY event_type, decile""".stripMargin,
    "evt_dwell" ->
      """WITH t AS (
        |  SELECT event_type, ts,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        |  FROM events
        |)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(epoch_us(next_ts) - epoch_us(ts)) AS BIGINT) AS total_us,
        |  ROUND(CAST(SUM(epoch_us(next_ts) - epoch_us(ts)) AS DOUBLE) / COUNT(*), 3) AS avg_us
        |FROM t WHERE next_ts IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "evt_transitions" ->
      """WITH t AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |)
        |SELECT prev_type, event_type AS cur_type, COUNT(*) AS n
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, cur_type
        |ORDER BY prev_type, cur_type""".stripMargin,
    "evt_markov_stationary" ->
      """WITH t AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), trans AS (
        |  SELECT prev_type, event_type AS cur_type, COUNT(*) AS n
        |  FROM t WHERE prev_type IS NOT NULL GROUP BY prev_type, cur_type
        |), p AS (
        |  SELECT prev_type, cur_type,
        |    n * 1000000 // SUM(n) OVER (PARTITION BY prev_type) AS p_ppm
        |  FROM trans
        |), ty AS (
        |  SELECT event_type, COUNT(*) AS n_evt FROM events GROUP BY event_type
        |), tot AS (
        |  SELECT CAST(SUM(n_evt) AS BIGINT) AS n_all, COUNT(*) AS n_types FROM ty
        |), pi0 AS (
        |  SELECT event_type, 1000000 // n_types AS pi_ppm FROM ty CROSS JOIN tot
        |), pi1 AS (
        |  SELECT cur_type AS event_type,
        |    CAST(SUM(pi_ppm * p_ppm // 1000000) AS BIGINT) AS pi_ppm
        |  FROM pi0 JOIN p ON pi0.event_type = p.prev_type GROUP BY cur_type
        |), pi2 AS (
        |  SELECT cur_type AS event_type,
        |    CAST(SUM(pi_ppm * p_ppm // 1000000) AS BIGINT) AS pi_ppm
        |  FROM pi1 JOIN p ON pi1.event_type = p.prev_type GROUP BY cur_type
        |), pi3 AS (
        |  SELECT cur_type AS event_type,
        |    CAST(SUM(pi_ppm * p_ppm // 1000000) AS BIGINT) AS pi_ppm
        |  FROM pi2 JOIN p ON pi2.event_type = p.prev_type GROUP BY cur_type
        |)
        |SELECT ty.event_type,
        |  CAST(n_evt * 1000000 // n_all AS BIGINT) AS empirical_ppm,
        |  pi3.pi_ppm AS stationary_ppm
        |FROM ty CROSS JOIN tot JOIN pi3 ON ty.event_type = pi3.event_type
        |ORDER BY ty.event_type""".stripMargin,
    "evt_wow_change" ->
      """WITH w AS (
        |  SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
        |    COUNT(*) AS n
        |  FROM events GROUP BY event_type, week
        |), l AS (
        |  SELECT *, lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
        |  FROM w
        |)
        |SELECT event_type, week, n, prev_n,
        |  CASE WHEN prev_n IS NOT NULL
        |       THEN ROUND((n - prev_n)::DOUBLE / prev_n * 100, 4) END AS wow_pct
        |FROM l ORDER BY event_type, week""".stripMargin,
    "evt_histogram" ->
      """SELECT event_type,
        |  CAST(least(floor("value" / 25.0), 15.0) AS INTEGER) AS bucket,
        |  COUNT(*) AS n,
        |  ROUND(SUM("value"), 2) AS total
        |FROM events
        |GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,
    "evt_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, MIN(ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE event_type = 'click' AND ts > t_view GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, MIN(ts) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE event_type = 'purchase' AND ts > t_click GROUP BY e.user_id
        |)
        |SELECT v.user_id,
        |  CAST(1 + CAST(t_click IS NOT NULL AS INT)
        |         + CAST(t_purchase IS NOT NULL AS INT) AS INTEGER) AS stage,
        |  t_view, t_click, t_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    "evt_retention" ->
      """WITH f AS (
        |  SELECT user_id, CAST(MIN(ts) AS DATE) AS d0 FROM events GROUP BY user_id
        |), a AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |)
        |SELECT date_trunc('week', d0) AS cohort_week,
        |  CAST(date_diff('day', d0, day) // 7 AS BIGINT) AS week_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "evt_gapfill" ->
      """WITH bounds AS (
        |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
        |), calendar AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds
        |), cal_type AS (
        |  SELECT day, event_type FROM calendar
        |  CROSS JOIN (SELECT DISTINCT event_type FROM events)
        |), counts AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
        |  FROM events GROUP BY day, event_type
        |)
        |SELECT ct.day, ct.event_type, COALESCE(c.n, 0) AS n
        |FROM cal_type ct LEFT JOIN counts c
        |  ON ct.day = c.day AND ct.event_type = c.event_type
        |ORDER BY ct.day, ct.event_type""".stripMargin,
    "evt_tumbling" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, event_type,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        |FROM events GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,
    "evt_sliding" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) - k * INTERVAL '5 minutes' AS w_start,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        |FROM events CROSS JOIN (VALUES (0), (1)) offs(k)
        |GROUP BY w_start ORDER BY w_start""".stripMargin,
    "evt_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL '10 minutes'
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |), sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked
        |)
        |SELECT user_id, MIN(ts) AS s_start, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,
  )
}
