package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relevance scoring + corpus indexing for a training-data pipeline (EXT
  * tier, same family as TextAnalysis/Curation): TF-IDF term extraction,
  * BM25 query scoring, an inverted-index posting summary, and a
  * distribution-drift (PSI) monitor for dataset snapshots.
  *
  * All four are the canonical scalable shapes: explode → map-side-combined
  * groupBy for term stats, broadcast of the (tiny) corpus-level scalar
  * aggregates, vocabulary-keyed shuffles that carry compact (word, count)
  * rows — never raw text. Nothing here collects to the driver; corpus-level
  * scalars (N, avgdl, period totals) are 1-row DataFrames crossJoin'd in
  * (Catalyst broadcasts them), so every plan is a straight-line distributed
  * dataflow at any scale.
  */
object Relevance extends QueryModule {

  private def words(c: Column): Column = split(c, " ")

  /** Tokens (doc_id, word), one row per occurrence. */
  private def tokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))

  // ----------------------------------------------------------------- tf-idf

  /** Top-3 TF-IDF terms per document (the classic keyword-extraction /
    * relevance primitive). tf = in-doc count, idf = ln(N/df); ranking uses
    * the ROUNDED score so both engines rank identical values (raw float
    * ordering could flip on last-ulp differences), tie-break lexicographic.
    * Scale shape: two groupBys on (doc_id, word)/(word) with map-side
    * combine, then a per-doc WindowGroupLimit top-k — the vocabulary table
    * is the only corpus-wide intermediate and it is vocabulary-sized, not
    * corpus-sized.
    */
  def tfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = tokens(spark, sfDir)
    val tf = tok.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dlen = tok.groupBy("doc_id").agg(count(lit(1)).as("dlen"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dlen, "doc_id").join(dfreq, "word")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf").cast("double") / col("dlen")
          * log(col("n_docs").cast("double") / col("df")), 6))
    val byScore = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("word").asc)
    scored
      .withColumn("rn", row_number().over(byScore))
      .filter(col("rn") <= 3)
      .select("doc_id", "rn", "word", "tf", "df", "score")
      .orderBy("doc_id", "rn")
  }

  // ------------------------------------------------------------------- bm25

  /** BM25 terms + parameters, frozen so the oracle embeds identical
    * literals. Per-term contributions are summed in FIXED term order
    * (conditional aggregates, not a float `sum` over rows) so the addition
    * order — and therefore the last-ulp of the double — is identical in
    * both engines before rounding.
    */
  val Bm25Terms: Seq[String] = Seq("spark", "join", "vector")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** BM25 score of every document against the fixed query `Bm25Terms` (the
    * search-relevance op a retrieval pipeline runs at serve time). One
    * corpus scan builds tf for the query terms only (the isin filter prunes
    * before the shuffle), doc lengths ride the same token scan, and the
    * corpus scalars (N, avgdl) broadcast.
    */
  def bm25(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = tokens(spark, sfDir)
    val dlen = tok.groupBy("doc_id").agg(count(lit(1)).as("dlen"))
    val tfq = tok.filter(col("word").isin(Bm25Terms.map(s => s: Any): _*))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfq = tfq.groupBy("word").agg(count(lit(1)).as("df"))
    val stats = dlen.agg(
      avg(col("dlen")).as("avgdl"), count(lit(1)).as("n_docs"))
    val contrib = tfq.join(broadcast(dfq), "word")
      .join(dlen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("c",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(Bm25K1 + 1.0))
          / (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dlen") / col("avgdl"))))
    // One column per term, fixed addition order — cross-engine exact.
    val termCols = Bm25Terms.map(t =>
      sum(when(col("word") === t, col("c"))).as(s"c_$t"))
    val perTerm = contrib.groupBy("doc_id")
      .agg(termCols.head, termCols.tail: _*)
    val total = Bm25Terms.map(t => coalesce(col(s"c_$t"), lit(0.0)))
      .reduceLeft(_ + _)
    dlen.join(perTerm, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("dlen"),
        round(coalesce(total, lit(0.0)), 6).as("bm25"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- postings

  /** Inverted-index posting summary: per term, document frequency, total
    * occurrences, and the posting-list doc_id span. This is the index-build
    * aggregation (the posting lists themselves stay distributed — the
    * summary is what a planner/BM25 scorer needs resident). Integer-only
    * output: exact at any scale.
    */
  def postings(spark: SparkSession, sfDir: String): DataFrame = {
    tokens(spark, sfDir)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .groupBy("word")
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("tf_total"),
        min(col("doc_id")).as("doc_min"),
        max(col("doc_id")).as("doc_max"))
      .orderBy("word")
  }

  // -------------------------------------------------------------- PSI drift

  /** Drift split/bin constants, frozen for the oracle: orders before vs
    * from `DriftPivot`, `o_totalprice` in `DriftBins` fixed-width buckets.
    */
  val DriftPivot = "1998-01-01"
  val DriftBinWidth = 50000.0

  /** Population-stability-index monitor between two dataset snapshots (the
    * standard train/serve drift check): bucket `o_totalprice` into fixed
    * bins, compare the bin distribution of orders before vs after the
    * pivot date. Per-bin PSI contribution = (pa − pb)·ln(pa/pb). One scan,
    * one 10-row groupBy, broadcast totals — the monitoring query you run
    * per ingest batch at any scale.
    */
  def driftPsi(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(
        floor(col("o_totalprice") / DriftBinWidth).cast("int").as("bin"),
        (col("o_orderdate") < lit(DriftPivot).cast("timestamp")).as("is_a"))
    val byBin = o.groupBy("bin").agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("cnt_b"))
    val totals = o.agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("tot_a"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("tot_b"))
    byBin.crossJoin(broadcast(totals))
      .filter(col("cnt_a") > 0 && col("cnt_b") > 0)
      .withColumn("pa", col("cnt_a").cast("double") / col("tot_a"))
      .withColumn("pb", col("cnt_b").cast("double") / col("tot_b"))
      .select(
        col("bin"),
        col("cnt_a"),
        col("cnt_b"),
        round(col("pa"), 6).as("pa"),
        round(col("pb"), 6).as("pb"),
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 6).as("psi"))
      .orderBy("bin")
  }

  // ----------------------------------------------------------- collocations

  /** Minimum bigram support for the PMI ranking, frozen for the oracle. */
  val PmiMinCount = 5

  /** Top-20 collocations by pointwise mutual information — the lexical
    * statistic behind phrase detection (\"New York\" scores high, \"of the\"
    * low). PMI = ln(p(ab) / (p(a)·p(b))), support-filtered; ranked on the
    * ROUNDED score (ties lexicographic) so both engines order identically.
    * Scale shape: unigram and bigram counts are map-side-combined word
    * counts; corpus totals broadcast as 1-row frames; the final top-20 is
    * a global TakeOrderedAndProject — per-partition heaps, k rows to the
    * driver.
    */
  def collocations(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val tok = tokens(spark, sfDir)
    val uni = tok.groupBy("word").agg(count(lit(1)).as("uc"))
    val totU = uni.agg(sum(col("uc")).cast("long").as("tu"))
    // Bigrams via the native adjacent-pairs byte scan (one fused pass;
    // bit-identical to the split/transform/element_at chain it replaced —
    // TokenPairsSpec pins the equality; fewer than two words yields an
    // empty array, absorbing the old size(w) >= 2 filter).
    val bi = docs
      .select(explode(graft.functions.VectorExpressions.word_pairs(col("text"))).as("p"))
      .select(col("p.a").as("wa"), col("p.b").as("wb"))
    val totB = bi.agg(count(lit(1)).as("tb"))
    val bc = bi.groupBy("wa", "wb").agg(count(lit(1)).as("bc"))
      .filter(col("bc") >= PmiMinCount)
    bc
      .join(uni.select(col("word").as("wa"), col("uc").as("ua")), "wa")
      .join(uni.select(col("word").as("wb"), col("uc").as("ub")), "wb")
      .crossJoin(broadcast(totU)).crossJoin(broadcast(totB))
      .withColumn("pmi",
        round(log((col("bc").cast("double") / col("tb"))
          / ((col("ua").cast("double") / col("tu")) * (col("ub").cast("double") / col("tu")))), 6))
      .select("wa", "wb", "bc", "ua", "ub", "pmi")
      .orderBy(col("pmi").desc, col("wa"), col("wb"))
      .limit(20)
  }

  // --------------------------------------------------------------- key skew

  /** Shuffle-bucket count for the skew diagnostic, frozen for the oracle. */
  val SkewBuckets = 32

  /** Join-key skew diagnostic: how evenly `o_custkey` hashes across
    * `SkewBuckets` shuffle buckets (the pre-flight check before a large
    * repartition/join — a bucket far above mean share predicts a straggler
    * task; the fix is salting or AQE skew-split). Uses the cross-engine
    * md5-derived hash so the oracle buckets identically. One scan + a
    * 32-row groupBy: runs in O(scan) at any scale.
    */
  def keySkew(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select((graft.functions.Hashing.hash60(col("o_custkey").cast("string"))
        % SkewBuckets).cast("int").as("bucket"))
    val byBucket = o.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val total = o.agg(count(lit(1)).as("total"))
    byBucket.crossJoin(broadcast(total))
      .select(
        col("bucket"),
        col("cnt"),
        round(col("cnt").cast("double") / col("total"), 6).as("share"),
        round(col("cnt").cast("double") * SkewBuckets / col("total"), 6).as("ratio_to_mean"))
      .orderBy("bucket")
  }

  /** Two-sample Kolmogorov-Smirnov drift test between the train-era and
    * serve-era order-price distributions — the distribution-free
    * complement to the binned PSI monitor (PSI needs bin choices; KS reads
    * the whole ECDF). Computed in EXACT integers: at every distinct value,
    * D's numerator is |i·n₂ − j·n₁| over the cumulative counts, maxed —
    * no float ECDF, so the statistic is bit-stable. The global-order
    * cumsum runs through [[graft.operators.BlockedRank.blockedPrefix]]
    * (blocks = the integer price floor): per-block partials shuffle on the
    * block key, only the bounded block SUMMARY crosses one task — no
    * unpartitioned window over the distinct-value table, which is
    * corpus-sized at 100 TB; products stay in BIGINT to ~3·10⁹ rows/side.
    */
  def dqKsTest(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank.{blockedPrefix, PrefixValue}
    val cut = "1998-01-01"
    val counts = Tables.orders(spark, sfDir)
      .select(col("o_totalprice").as("v"),
        (col("o_orderdate") < lit(cut).cast("timestamp")).as("is_train"))
      .groupBy("v")
      .agg(
        count(when(col("is_train"), lit(1))).as("c1"),
        count(when(!col("is_train"), lit(1))).as("c2"))
    blockedPrefix(counts, Nil,
      Seq("__b_v" -> floor(col("v"))), Seq(false),
      Seq(col("v")), "__rk", "__n",
      values = Seq(
        PrefixValue(col("c1"), "i", "n1"),
        PrefixValue(col("c2"), "j", "n2")))
      .agg(
        first(col("n1")).as("n1"),
        first(col("n2")).as("n2"),
        max(abs(col("i") * col("n2") - col("j") * col("n1"))).as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
        round(col("d_num").cast("double") / (col("n1") * col("n2")), 6).as("d"))
  }

  /** Benford first-digit audit on order totals — the classic fabricated-data
    * / ingest-corruption screen: observed leading-digit shares (in exact
    * integer parts-per-million) against Benford's log10(1+1/d) expectation.
    * The leading digit comes from the DECIMAL STRING of exact integer cents
    * (never float log10, whose libm rounding could flip a boundary value);
    * shares are integer-division ppm, so every cell is bit-stable at any
    * scale. One map-side-combined groupBy on 9 keys; the expectation is a
    * 9-row CASE, constant-folded.
    */
  def dqBenford(spark: SparkSession, sfDir: String): DataFrame = {
    val benford = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
    val digit = substring(
      round(col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
      .cast("int")
    val exp = benford.foldLeft(lit(null).cast("long")) {
      case (acc, (d, v)) => when(col("digit") === d, v).otherwise(acc)
    }
    Tables.orders(spark, sfDir)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .transform(c => c.crossJoin(broadcast(c.agg(sum(col("n")).as("total")))))
      .withColumn("share_ppm", expr("n * 1000000 div total"))
      .withColumn("expected_ppm", exp)
      .withColumn("excess_ppm", col("share_ppm") - col("expected_ppm"))
      .select(col("digit"), col("n"), col("share_ppm"),
        col("expected_ppm"), col("excess_ppm"))
      .orderBy("digit")
  }

  /** Freshness SLA audit: per event type, the last-seen timestamp, its lag
    * behind the corpus watermark in exact integer microseconds, and the
    * stale flag at a 24-hour SLA — the ingest-monitoring query every
    * pipeline pages on. Per-type maxes are one map-side-combined groupBy;
    * the corpus watermark is a 1-row broadcast, never a global sort.
    */
  def dqFreshness(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n"))
      .transform(d => d.crossJoin(broadcast(d.agg(max(col("last_ts")).as("watermark")))))
      .withColumn("lag_us", unix_micros(col("watermark")) - unix_micros(col("last_ts")))
      .withColumn("stale", col("lag_us") > lit(86400000000L))
      .select(col("event_type"), col("last_ts"), col("n"), col("lag_us"), col("stale"))
      .orderBy("event_type")
  }

  /** Key-uniqueness audit across candidate keys — the constraint check
    * every warehouse runs before declaring a primary key or choosing a
    * merge key: per candidate, total rows, distinct keys, violated keys
    * (multiplicity > 1) and the worst multiplicity. Each candidate is one
    * map-side-combined groupBy on its own key; the four tiny summaries
    * union. (lineitem's (l_orderkey, l_linenumber) is a KNOWN non-key in
    * this corpus — the audit exists to surface exactly that.)
    */
  def dqUniqueness(spark: SparkSession, sfDir: String): DataFrame = {
    def audit(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("m"))
        .agg(
          sum(col("m")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          count(when(col("m") > 1, lit(1))).as("dup_keys"),
          max(col("m")).as("max_multiplicity"))
        .select(lit(name).as("candidate"), col("n_rows"), col("n_keys"),
          (col("dup_keys") === 0).as("is_unique"), col("dup_keys"),
          col("max_multiplicity"))
    audit("customer.c_custkey", Tables.customer(spark, sfDir), Seq("c_custkey"))
      .unionByName(audit("events.event_id", Tables.events(spark, sfDir), Seq("event_id")))
      .unionByName(audit("lineitem.l_orderkey+l_linenumber",
        Tables.lineitem(spark, sfDir), Seq("l_orderkey", "l_linenumber")))
      .unionByName(audit("orders.o_orderkey", Tables.orders(spark, sfDir), Seq("o_orderkey")))
      .orderBy("candidate")
  }

  /** Order-independent TABLE CHECKSUM — the anti-entropy / replication
    * integrity primitive: same canonical per-row string → same 60-bit row
    * hash → same exact DECIMAL sum, on any engine, any partitioning, any
    * row order. Two replicas (or a pre/post-migration pair) agree iff
    * (n_rows, checksum) agree, compared with two scalars instead of a
    * row-by-row diff. Canonicalization avoids every cross-engine
    * formatting trap: timestamps as epoch micros, money as integer cents
    * (`dq_benford`'s trick), never float→string. One map pass + a scalar
    * agg per table; at 100 TB this is the cheapest possible full-content
    * comparison (and it map-side combines).
    */
  def dqTableChecksum(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Hashing
    def cents(c: Column): Column = round(c * 100).cast("bigint")
    // `concat` (not `concat_ws`) so a NULL field nulls the whole row hash,
    // matching DuckDB `||` — both engines' SUM then skip it identically.
    def canon(cols: Column*): Column =
      concat(cols.flatMap(c => Seq(c.cast("string"), lit("|"))).dropRight(1): _*)
    // checksum is emitted as VARCHAR: DuckDB computes the sum through a
    // HUGEINT intermediate and its DECIMAL(38,0) physical layout hashes
    // differently driver-side even when values match; strings can't diverge.
    def sumHash(name: String, df: DataFrame, c: Column): DataFrame =
      df.select(Hashing.hash60(c).cast("decimal(38,0)").as("h"))
        .agg(count(lit(1)).as("n_rows"), sum(col("h")).cast("string").as("checksum"))
        .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))
    val orders = sumHash("orders", Tables.orders(spark, sfDir),
      canon(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        cents(col("o_totalprice")),
        unix_micros(col("o_orderdate").cast("timestamp")), col("o_orderpriority")))
    val customer = sumHash("customer", Tables.customer(spark, sfDir),
      canon(col("c_custkey"), col("c_name"), col("c_nationkey"),
        cents(col("c_acctbal")), col("c_mktsegment")))
    val nation = sumHash("nation", Tables.nation(spark, sfDir),
      canon(col("n_nationkey"), col("n_name"), col("n_regionkey")))
    orders.unionByName(customer).unionByName(nation).orderBy("table_name")
  }

  /** Cross-table reconciliation audit — does the order header's total
    * equal the recomputed lineitem total (Σ price·(1−disc)·(1+tax))?
    * The classic financial-close check; in THIS corpus the invariant
    * deliberately fails everywhere, which is exactly what the report
    * surfaces (n_mismatch = n_orders, headers without lines counted
    * separately). Float discipline: the per-row product is one double
    * expression on identical operands, rounded onto the 6dp grid, summed
    * as DECIMAL per order (order-free); the header-vs-recomputed gap is
    * then a double subtraction of pinned values, rounded before the
    * per-status decimal rollup. One fact-side groupBy + one header join —
    * both on the order key, bucketable at scale.
    */
  def dqReconcile(spark: SparkSession, sfDir: String): DataFrame = {
    val recomputed = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")), 6).cast("decimal(30,6)").as("line_total"))
      .groupBy("l_orderkey")
      .agg(sum(col("line_total")).as("recomputed"))
    // the gap stays DECIMAL end-to-end: subtracting two big doubles and
    // re-rounding would amplify representation noise past the 4dp grid
    val gap = col("o_totalprice").cast("decimal(30,6)") - col("recomputed")
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .join(recomputed, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderstatus"),
        col("recomputed").isNull.as("no_lines"),
        when(col("recomputed").isNotNull, abs(gap)).as("abs_gap"))
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        count(when(col("no_lines"), lit(1))).as("n_no_lineitems"),
        count(when(col("abs_gap") > 0.01, lit(1))).as("n_mismatch"),
        sum(col("abs_gap")).cast("double").as("total_abs_gap"))
      .orderBy("o_orderstatus")
  }

  /** Zipf rank-frequency fit per language — the corpus-health diagnostic
    * (natural text follows freq ∝ rank^s with s ≈ −1; machine-generated or
    * template-heavy corpora bend the curve). Least-squares slope/intercept
    * of ln(freq) on ln(rank) over the top-100 terms. Float discipline:
    * ln() runs on identical integer counts/ranks in both engines, each
    * coordinate is pinned to an integer MICRO grid (round(ln·10⁶) as
    * BIGINT), every regression power sum is then exact BIGINT arithmetic
    * (|Σxy| ≤ 100·(1.5·10⁷)² ≪ 2⁶³), and only the closed-form
    * slope/intercept divisions touch doubles (the micro scale cancels in
    * the slope ratio; the intercept rescales by 10⁶ once). Scale: one
    * vocabulary groupBy + a per-language top-k — the regression runs on
    * 100 rows per language.
    */
  def textZipf(spark: SparkSession, sfDir: String): DataFrame = {
    val freq = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(words(col("text"))).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("c"))
    // lossless two-phase per-lang top-100 — the naive per-lang window
    // would sort a whole language's vocabulary on one task
    val top = graft.operators.BlockedRank.saltedTopK(
        freq,
        groups = Seq("lang"),
        order = Seq(col("c").desc, col("word")),
        salt = graft.functions.Hashing.hash60(col("word")),
        k = 100, outRank = "rank")
      .select(col("lang"),
        round(log(col("rank")) * 1000000).cast("bigint").as("xi"),
        round(log(col("c")) * 1000000).cast("bigint").as("yi"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    top.groupBy("lang")
      .agg(
        count(lit(1)).as("n"),
        sum(col("xi")).as("sx"), sum(col("yi")).as("sy"),
        sum(col("xi") * col("xi")).as("sxx"), sum(col("xi") * col("yi")).as("sxy"))
      .select(
        col("lang"), col("n").as("n_terms"),
        round(slope, 6).as("zipf_slope"),
        round((sy - round(slope, 6) * sx) / (n * 1000000d), 6).as("zipf_intercept"))
      .orderBy("lang")
  }

  /** Chi-square independence audit over a full contingency grid (priority ×
    * status) — "did the status mix shift by priority?", the categorical
    * drift check PSI can't express. The grid is built dense (row-totals ×
    * col-totals, zero-filled observed) because zero cells still carry
    * expected mass. Exactness discipline: counts stay BIGINT, each cell's
    * statistic is ONE double division of exact integers
    * ((O·N − rt·ct)² / (N·rt·ct)) rounded to 6dp, and the corpus-wide χ²
    * sums those ROUNDED values as decimals — order-independent, so the
    * window total matches across engines. Scale shape: two tiny dimension
    * aggregates broadcast onto a one-shuffle cell count; the grid is
    * |priorities|×|statuses|, never row-scale.
    */
  def dqChiSquare(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
    val cells = o.groupBy("pri", "st").agg(count(lit(1)).as("obs"))
    val rowT = o.groupBy("pri").agg(count(lit(1)).as("rt"))
    val colT = o.groupBy("st").agg(count(lit(1)).as("ct"))
    val n = o.agg(count(lit(1)).as("n_tot"))
    val num = col("obs") * col("n_tot") - col("rt") * col("ct")
    val grid = rowT.crossJoin(colT)
      .join(cells, Seq("pri", "st"), "left_outer")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("expected",
        round((col("rt") * col("ct")).cast("double") / col("n_tot"), 6))
      .withColumn("contrib",
        round((num * num).cast("double")
          / (col("n_tot") * col("rt") * col("ct")).cast("double"), 6))
    grid
      // the grid is |priorities|×|statuses| — bounded by construction, so
      // the scalar-total window uses the single-partition idiom explicitly
      .withColumn("chi2_total",
        sum(col("contrib").cast("decimal(20,6)"))
          .over(Window.partitionBy(
            graft.operators.BlockedRank.boundedPartition(col("pri")))).cast("double"))
      .select("pri", "st", "obs", "expected", "contrib", "chi2_total")
      .orderBy("pri", "st")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_chi_square" -> (dqChiSquare _),
    "dq_reconcile"  -> (dqReconcile _),
    "dq_table_checksum" -> (dqTableChecksum _),
    "text_zipf"     -> (textZipf _),
    "dq_uniqueness" -> (dqUniqueness _),
    "dq_freshness"  -> (dqFreshness _),
    "dq_benford"    -> (dqBenford _),
    "dq_ks_test"    -> (dqKsTest _),
    "text_tfidf"    -> (tfidf _),
    "text_bm25"     -> (bm25 _),
    "text_postings" -> (postings _),
    "dq_drift_psi"  -> (driftPsi _),
    "dq_key_skew"   -> (keySkew _),
    "text_collocations" -> (collocations _),
  )

  override def oracles: Map[String, String] = {
    val termList = Bm25Terms.map(t => s"'$t'").mkString("[", ", ", "]")
    val caseSum = Bm25Terms
      .map(t => s"COALESCE(SUM(CASE WHEN word = '$t' THEN c END), 0.0)")
      .mkString(" + ")
    Map(
      "dq_table_checksum" -> {
        def one(name: String, table: String, canon: String) =
          s"""SELECT '$name' AS table_name, COUNT(*) AS n_rows,
             |  CAST(CAST(SUM(${graft.functions.Hashing.duckHash60(canon)}) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
             |FROM $table""".stripMargin
        Seq(
          one("customer", "customer",
            "c_custkey || '|' || c_name || '|' || c_nationkey || '|' || " +
              "CAST(round(c_acctbal * 100) AS BIGINT) || '|' || c_mktsegment"),
          one("nation", "nation",
            "n_nationkey || '|' || n_name || '|' || n_regionkey"),
          one("orders", "orders",
            "o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' || " +
              "CAST(round(o_totalprice * 100) AS BIGINT) || '|' || " +
              "epoch_us(o_orderdate) || '|' || o_orderpriority"),
        ).mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
      },
      "dq_reconcile" ->
        """WITH rec AS (
          |  SELECT l_orderkey,
          |    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
          |             AS DECIMAL(30,6))) AS recomputed
          |  FROM lineitem GROUP BY l_orderkey
          |), j AS (
          |  SELECT o.o_orderstatus,
          |    rec.recomputed IS NULL AS no_lines,
          |    CASE WHEN rec.recomputed IS NOT NULL
          |         THEN abs(CAST(o.o_totalprice AS DECIMAL(30,6)) - rec.recomputed) END
          |      AS abs_gap
          |  FROM orders o LEFT JOIN rec ON o.o_orderkey = rec.l_orderkey
          |)
          |SELECT o_orderstatus, COUNT(*) AS n_orders,
          |  COUNT(CASE WHEN no_lines THEN 1 END) AS n_no_lineitems,
          |  COUNT(CASE WHEN abs_gap > 0.01 THEN 1 END) AS n_mismatch,
          |  CAST(SUM(abs_gap) AS DOUBLE) AS total_abs_gap
          |FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      "text_zipf" ->
        """WITH freq AS (
          |  SELECT lang, word, COUNT(*) AS c
          |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
          |  GROUP BY lang, word
          |), top AS (
          |  SELECT lang,
          |    CAST(round(ln(rank) * 1000000) AS BIGINT) AS xi,
          |    CAST(round(ln(c) * 1000000) AS BIGINT) AS yi
          |  FROM (SELECT lang, c,
          |          row_number() OVER (PARTITION BY lang ORDER BY c DESC, word) AS rank
          |        FROM freq)
          |  WHERE rank <= 100
          |), sums AS (
          |  SELECT lang, COUNT(*) AS n, SUM(xi) AS sx, SUM(yi) AS sy,
          |    SUM(xi * xi) AS sxx, SUM(xi * yi) AS sxy
          |  FROM top GROUP BY lang
          |), fit AS (
          |  SELECT lang, n, sx, sy,
          |    ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          |        / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS zipf_slope
          |  FROM sums
          |)
          |SELECT lang, n AS n_terms, zipf_slope,
          |  ROUND((CAST(sy AS DOUBLE) - zipf_slope * sx) / (CAST(n AS DOUBLE) * 1000000), 6)
          |    AS zipf_intercept
          |FROM fit ORDER BY lang""".stripMargin,
      "dq_chi_square" ->
        """WITH o AS (
          |  SELECT o_orderpriority AS pri, o_orderstatus AS st FROM orders
          |), cells AS (
          |  SELECT pri, st, COUNT(*) AS obs FROM o GROUP BY pri, st
          |), rt AS (SELECT pri, COUNT(*) AS rt FROM o GROUP BY pri),
          |ct AS (SELECT st, COUNT(*) AS ct FROM o GROUP BY st),
          |tot AS (SELECT COUNT(*) AS n_tot FROM o),
          |grid AS (
          |  SELECT rt.pri, ct.st, COALESCE(cells.obs, 0) AS obs, rt.rt, ct.ct, n_tot,
          |    ROUND(CAST(rt.rt * ct.ct AS DOUBLE) / n_tot, 6) AS expected,
          |    ROUND(CAST((COALESCE(cells.obs, 0) * n_tot - rt.rt * ct.ct)
          |               * (COALESCE(cells.obs, 0) * n_tot - rt.rt * ct.ct) AS DOUBLE)
          |          / CAST(n_tot * rt.rt * ct.ct AS DOUBLE), 6) AS contrib
          |  FROM rt CROSS JOIN ct
          |  LEFT JOIN cells ON rt.pri = cells.pri AND ct.st = cells.st
          |  CROSS JOIN tot
          |)
          |SELECT pri, st, obs, expected, contrib,
          |  CAST(SUM(CAST(contrib AS DECIMAL(20,6))) OVER () AS DOUBLE) AS chi2_total
          |FROM grid ORDER BY pri, st""".stripMargin,
      "dq_uniqueness" -> {
        def one(name: String, table: String, key: String) =
          s"""SELECT '$name' AS candidate,
             |  CAST(SUM(m) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
             |  COUNT(CASE WHEN m > 1 THEN 1 END) = 0 AS is_unique,
             |  COUNT(CASE WHEN m > 1 THEN 1 END) AS dup_keys,
             |  MAX(m) AS max_multiplicity
             |FROM (SELECT $key, COUNT(*) AS m FROM $table GROUP BY $key)""".stripMargin
        Seq(
          one("customer.c_custkey", "customer", "c_custkey"),
          one("events.event_id", "events", "event_id"),
          one("lineitem.l_orderkey+l_linenumber", "lineitem", "l_orderkey, l_linenumber"),
          one("orders.o_orderkey", "orders", "o_orderkey"),
        ).mkString("", "\nUNION ALL\n", "\nORDER BY candidate")
      },
      "dq_freshness" ->
        """WITH t AS (
          |  SELECT event_type, MAX(ts) AS last_ts, COUNT(*) AS n
          |  FROM events GROUP BY event_type
          |), w AS (
          |  SELECT MAX(last_ts) AS watermark FROM t
          |)
          |SELECT event_type, last_ts, n,
          |  epoch_us(watermark) - epoch_us(last_ts) AS lag_us,
          |  (epoch_us(watermark) - epoch_us(last_ts)) > 86400000000 AS stale
          |FROM t CROSS JOIN w
          |ORDER BY event_type""".stripMargin,
      "dq_benford" ->
        """WITH d AS (
          |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
          |              AS INTEGER) AS digit
          |  FROM orders
          |), c AS (
          |  SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
          |)
          |SELECT digit, n,
          |  CAST(n * 1000000 // SUM(n) OVER () AS BIGINT) AS share_ppm,
          |  CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
          |       WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
          |       WHEN 7 THEN 57992 WHEN 8 THEN 51153 WHEN 9 THEN 45757 END AS BIGINT)
          |    AS expected_ppm,
          |  CAST(n * 1000000 // SUM(n) OVER () AS BIGINT)
          |    - CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
          |           WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
          |           WHEN 7 THEN 57992 WHEN 8 THEN 51153 WHEN 9 THEN 45757 END AS BIGINT)
          |    AS excess_ppm
          |FROM c
          |ORDER BY digit""".stripMargin,
      "text_tfidf" ->
        """WITH tok AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
          |), tf AS (
          |  SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word
          |), dlen AS (
          |  SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY doc_id
          |), dfreq AS (
          |  SELECT word, COUNT(*) AS df FROM tf GROUP BY word
          |), n AS (
          |  SELECT COUNT(*) AS n_docs FROM documents
          |), scored AS (
          |  SELECT tf.doc_id, tf.word, tf.tf, dfreq.df,
          |    ROUND(tf.tf::DOUBLE / dlen.dlen * ln(n.n_docs::DOUBLE / dfreq.df), 6) AS score
          |  FROM tf JOIN dlen USING (doc_id) JOIN dfreq USING (word) CROSS JOIN n
          |), ranked AS (
          |  SELECT *, CAST(row_number() OVER (
          |    PARTITION BY doc_id ORDER BY score DESC, word) AS INTEGER) AS rn
          |  FROM scored
          |)
          |SELECT doc_id, rn, word, tf, df, score
          |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
      "text_bm25" ->
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
           |), dlen AS (
           |  SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY doc_id
           |), tfq AS (
           |  SELECT doc_id, word, COUNT(*) AS tf FROM tok
           |  WHERE list_contains($termList, word) GROUP BY doc_id, word
           |), dfq AS (
           |  SELECT word, COUNT(*) AS df FROM tfq GROUP BY word
           |), stats AS (
           |  SELECT AVG(dlen) AS avgdl, COUNT(*) AS n_docs FROM dlen
           |), contrib AS (
           |  SELECT tfq.doc_id, tfq.word,
           |    ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
           |      * (tfq.tf * ${Bm25K1 + 1.0})
           |      / (tfq.tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dlen.dlen / stats.avgdl)) AS c
           |  FROM tfq JOIN dfq USING (word) JOIN dlen USING (doc_id) CROSS JOIN stats
           |), per_doc AS (
           |  SELECT doc_id, $caseSum AS total FROM contrib GROUP BY doc_id
           |)
           |SELECT dlen.doc_id, dlen.dlen, ROUND(COALESCE(per_doc.total, 0.0), 6) AS bm25
           |FROM dlen LEFT JOIN per_doc USING (doc_id) ORDER BY doc_id""".stripMargin,
      "text_postings" ->
        """WITH tf AS (
          |  SELECT doc_id, word, COUNT(*) AS tf
          |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
          |  GROUP BY doc_id, word
          |)
          |SELECT word, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS tf_total,
          |  MIN(doc_id) AS doc_min, MAX(doc_id) AS doc_max
          |FROM tf GROUP BY word ORDER BY word""".stripMargin,
      "text_collocations" ->
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
           |), uni AS (
           |  SELECT word, COUNT(*) AS uc FROM tok GROUP BY word
           |), tu AS (
           |  SELECT CAST(SUM(uc) AS BIGINT) AS tu FROM uni
           |), bi AS (
           |  SELECT ws[i] AS wa, ws[i + 1] AS wb FROM (
           |    SELECT string_split(text, ' ') AS ws,
           |      unnest(range(1, len(string_split(text, ' ')))) AS i
           |    FROM documents WHERE len(string_split(text, ' ')) >= 2
           |  )
           |), tb AS (
           |  SELECT COUNT(*) AS tb FROM bi
           |), bc AS (
           |  SELECT wa, wb, COUNT(*) AS bc FROM bi GROUP BY wa, wb
           |  HAVING COUNT(*) >= $PmiMinCount
           |)
           |SELECT bc.wa, bc.wb, bc.bc, ua.uc AS ua, ub.uc AS ub,
           |  ROUND(ln((bc.bc::DOUBLE / tb.tb)
           |    / ((ua.uc::DOUBLE / tu.tu) * (ub.uc::DOUBLE / tu.tu))), 6) AS pmi
           |FROM bc
           |JOIN uni ua ON bc.wa = ua.word
           |JOIN uni ub ON bc.wb = ub.word
           |CROSS JOIN tu CROSS JOIN tb
           |ORDER BY pmi DESC, bc.wa, bc.wb
           |LIMIT 20""".stripMargin,
      "dq_key_skew" ->
        s"""WITH o AS (
           |  SELECT CAST(CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT)
           |    % $SkewBuckets AS INTEGER) AS bucket
           |  FROM orders
           |), by_bucket AS (
           |  SELECT bucket, COUNT(*) AS cnt FROM o GROUP BY bucket
           |), t AS (
           |  SELECT COUNT(*) AS total FROM o
           |)
           |SELECT bucket, cnt,
           |  ROUND(cnt::DOUBLE / total, 6) AS share,
           |  ROUND(cnt::DOUBLE * $SkewBuckets / total, 6) AS ratio_to_mean
           |FROM by_bucket CROSS JOIN t ORDER BY bucket""".stripMargin,
      "dq_ks_test" ->
        """WITH counts AS (
          |  SELECT o_totalprice AS v,
          |    COUNT(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 END) AS c1,
          |    COUNT(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 END) AS c2
          |  FROM orders GROUP BY o_totalprice
          |), cum AS (
          |  SELECT v, c1, c2,
          |    CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS i,
          |    CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS j
          |  FROM counts
          |), t AS (
          |  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM counts
          |)
          |SELECT t.n1, t.n2,
          |  MAX(abs(cum.i * t.n2 - cum.j * t.n1)) AS d_num,
          |  ROUND(MAX(abs(cum.i * t.n2 - cum.j * t.n1))::DOUBLE / (t.n1 * t.n2), 6) AS d
          |FROM cum CROSS JOIN t
          |GROUP BY t.n1, t.n2""".stripMargin,
      "dq_drift_psi" ->
        s"""WITH o AS (
           |  SELECT CAST(FLOOR(o_totalprice / $DriftBinWidth) AS INTEGER) AS bin,
           |    (o_orderdate < TIMESTAMP '$DriftPivot') AS is_a
           |  FROM orders
           |), by_bin AS (
           |  SELECT bin,
           |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
           |    CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
           |  FROM o GROUP BY bin
           |), totals AS (
           |  SELECT CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS tot_a,
           |    CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS tot_b
           |  FROM o
           |)
           |SELECT bin, cnt_a, cnt_b,
           |  ROUND(cnt_a::DOUBLE / tot_a, 6) AS pa,
           |  ROUND(cnt_b::DOUBLE / tot_b, 6) AS pb,
           |  ROUND((cnt_a::DOUBLE / tot_a - cnt_b::DOUBLE / tot_b)
           |    * ln((cnt_a::DOUBLE / tot_a) / (cnt_b::DOUBLE / tot_b)), 6) AS psi
           |FROM by_bin CROSS JOIN totals
           |WHERE cnt_a > 0 AND cnt_b > 0
           |ORDER BY bin""".stripMargin,
    )
  }
}
