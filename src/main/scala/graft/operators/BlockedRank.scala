package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank / running sum over a total order WITHOUT an
  * unpartitioned window — the scale-safe replacement for
  * `row_number().over(Window.orderBy(...))`, which funnels every row of an
  * unbounded input through ONE task ("WindowExec: No Partition Defined").
  *
  * Two-phase block decomposition:
  *   1. Rows are assigned to BLOCKS by a caller-supplied monotone coarsening
  *      of the sort order (every block is a contiguous run of the total
  *      order — e.g. the integer metric value plus `user_id div B` for the
  *      tiebreak column). One groupBy produces per-block partials
  *      (count, optional value sum).
  *   2. Block partials — |blocks| ≈ |rows| / B, a bounded summary in the
  *      same sense as a histogram — go through ONE tiny cumulative window
  *      to yield each block's global offset; a final equi-join + a window
  *      PARTITIONED BY block computes exact per-row rank (offset + local
  *      row_number) and, optionally, the exact running value sum.
  *
  * The only unpartitioned window left runs over the block summaries: B-fold
  * smaller than the data (B is the scale knob; with B = 2^20 a 10^9-user
  * table yields ~10^3 summary rows). All heavy stages — the block groupBy,
  * the join back, the per-block window — partition on the block key and
  * scale horizontally.
  *
  * Correctness requires `blocks` to be monotone w.r.t. the total order
  * `localOrder` establishes within each (partition, block): ordering blocks
  * by `blockOrder` then rows by `localOrder` inside each block must equal
  * the intended global order. The helper cannot check this; callers pin it
  * with an oracle-matched query (evt_rfm / evt_pareto).
  */
object BlockedRank {

  /** A value column to accumulate exactly alongside the rank: `outCum`
    * receives the running sum up to and including each row, `outTotal` the
    * (partition-wide) grand total attached to every row.
    */
  case class PrefixValue(value: Column, outCum: String, outTotal: String)

  /** The single-partition idiom for windows over PROVABLY BOUNDED
    * summaries: constant-valued (always 0, never null) but non-foldable, so
    * `EliminateWindowPartitions` cannot strip it back to an unpartitioned
    * spec. Execution is identical to no partitioning — every row hashes to
    * one task, which is what a bounded cumulative pass intends — but the
    * "WindowExec: No Partition Defined" warning and the PlanSpec guard that
    * promotes it to a failure stay reserved for genuinely UNBOUNDED inputs.
    * Only use where the input's bound is documented at the call site.
    */
  def boundedPartition(c: Column): Column = pmod(hash(c), lit(1))

  /** Per-row outputs appended to `df`:
    *   - `outRank`: exact 1-based global rank under the total order
    *     (per `partition` group if non-empty);
    *   - per [[PrefixValue]]: the exact running sum and grand total;
    *   - `outTotalN`: the (partition-wide) row count on every row.
    *
    * @param partition  outer grouping columns (empty = whole-table order)
    * @param blocks     (name, expr) monotone block-key columns
    * @param blockDesc  per block column: true = descending in the total order
    * @param localOrder tie-break sort within a block (must complete the
    *                   total order)
    * @param values     columns to accumulate exactly alongside rank
    */
  def blockedPrefix(
      df: DataFrame,
      partition: Seq[String],
      blocks: Seq[(String, Column)],
      blockDesc: Seq[Boolean],
      localOrder: Seq[Column],
      outRank: String,
      outTotalN: String,
      values: Seq[PrefixValue] = Nil,
      broadcastOffsets: Boolean = false): DataFrame = {
    require(blocks.nonEmpty && blocks.size == blockDesc.size)
    val blkNames = blocks.map(_._1)
    // Block keys AND outer partition columns are STRUCT-wrapped: a NULL
    // key expression becomes a non-null struct with a null field, so the
    // groupBy, the summary window (struct ordering puts the null field
    // first ascending — the window form's nulls-first placement), and the
    // plain equi-join back all treat it as one legitimate group. Without
    // this, null-keyed rows would survive the partials but silently DROP
    // at the join while still counting in offsets and totals (for
    // partition columns: the whole null-partition group would vanish from
    // the output while its partials still existed). The wrapper keeps the
    // join a vanilla usingColumns equi-join — same exprIds both branches,
    // so Catalyst still reuses the partials' exchange (a
    // null-safe-condition join through renamed columns was measured 2-3x
    // slower here: new exprIds defeat ReuseExchange). Partition wrappers
    // use internal names and drop at the end, leaving the caller's
    // original partition columns untouched in the output.
    val pNames = partition.indices.map(i => s"__brk_p$i")
    val keyCols = (pNames ++ blkNames).map(col)
    val withBlk0 = blocks.foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, struct(c.as("k")))
    }
    val withBlk = partition.zip(pNames).foldLeft(withBlk0) {
      case (d, (p, n)) => d.withColumn(n, struct(col(p).as("k")))
    }
    val vNames = values.indices.map(i => s"__brk_v$i")
    // The input feeds TWO branches (block partials, and the join back).
    // The branches' own exchanges differ (partial-agg vs plain hash), but
    // every branch recomputation bottoms out in the input's OWN deepest
    // exchange (e.g. evt_rfm's events groupBy), which IS identical across
    // branches — AQE's stage reuse materializes that shuffle once and the
    // branches re-read it, so the expensive scan never duplicates. Only
    // the post-shuffle summary-sized map work runs per branch; an explicit
    // localCheckpoint here was measured STRICTLY worse (materialization
    // cost with no scan recompute to save).
    val base = values.zip(vNames).foldLeft(withBlk) {
      case (d, (pv, n)) => d.withColumn(n, pv.value)
    }

    val aggs = count(lit(1)).as("__brk_n") +:
      vNames.map(n => sum(col(n)).as(s"${n}_s"))
    val partials = base.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val blkSort = blkNames.zip(blockDesc).map { case (n, d) =>
      if (d) col(n).desc else col(n).asc
    }
    // Window over BLOCK SUMMARIES only (bounded; see scaladoc) — the
    // whole-table case uses the boundedPartition idiom for exactly that
    // reason.
    val wBase =
      if (partition.isEmpty) Window.partitionBy(boundedPartition(col(blkNames.head)))
      else Window.partitionBy(pNames.map(col): _*)
    val wOff = wBase.orderBy(blkSort: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = wBase
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets0 = partials
      .withColumn("__brk_off", coalesce(sum(col("__brk_n")).over(wOff), lit(0L)))
      .withColumn(outTotalN, sum(col("__brk_n")).over(wTot))
    val offsets = values.zip(vNames).foldLeft(offsets0) {
      case (d, (pv, n)) =>
        d.withColumn(s"${n}_off", sum(col(s"${n}_s")).over(wOff))
          .withColumn(pv.outTotal, sum(col(s"${n}_s")).over(wTot))
    }.drop("__brk_n").drop(vNames.map(_ + "_s"): _*)

    val wLocal = Window.partitionBy(keyCols: _*).orderBy(localOrder: _*)
    // broadcastOffsets: past the auto-broadcast threshold's size ESTIMATE
    // (struct keys over a shuffle boundary estimate fat), Catalyst falls
    // back to a sort-merge join here — re-sorting the DATA side on the
    // block key, the single most expensive avoidable stage (measured 3x
    // on a 3e7-row prefix probe). The offsets frame is the bounded block
    // summary — |rows|/blockWidth — so callers whose width knob keeps it
    // ≤ ~10^7 rows can force the hint and keep the join a map-side BHJ.
    val offsetsSide = if (broadcastOffsets) broadcast(offsets) else offsets
    val ranked = base
      .join(offsetsSide, pNames ++ blkNames)
      .withColumn(outRank, col("__brk_off") + row_number().over(wLocal))
    val out = values.zip(vNames).foldLeft(ranked) {
      case (d, (pv, n)) =>
        val localSum = sum(col(n)).over(
          wLocal.rowsBetween(Window.unboundedPreceding, 0))
        val off = col(s"${n}_off")
        // window-sum semantics exactly: NULL only when NOTHING non-null
        // has been seen yet — the offset is NULL before the first block
        // (or when all prior blocks' values were NULL), and the local sum
        // is NULL while the current block has seen only NULLs; either
        // alone must still surface, so coalesce over (sum, off, local)
        d.withColumn(pv.outCum, coalesce(off + localSum, off, localSum))
          .drop(s"${n}_off", n)
    }
    out.drop("__brk_off").drop(blkNames: _*).drop(pNames: _*)
  }

  /** Exact distributed order statistics — the rows of `df` sitting at the
    * requested 1-based ranks of the total order, found WITHOUT a global
    * sort (the k-th-element primitive behind boundary-based quantile
    * scoring): block partials → bounded summary window for offsets → a
    * broadcast range-join pins each requested rank to its ONE owning block
    * → only the owning blocks' rows survive the broadcast equi-join and
    * get a local sort. Cost: one groupBy shuffle of `df` + a local sort of
    * |ranks| blocks — rank extraction never touches the rest of the data.
    *
    * `ranks` must be a 1-column BIGINT frame named `__r` with DISTINCT
    * values (duplicate requested ranks would duplicate the owning block's
    * rows under one window partition); it stays a PLAN, so data-dependent
    * ranks (N·k/5 from a count aggregate) never hit the driver.
    *
    * Unlike [[blockedPrefix]] (null-safe join back), the final equi-join
    * here REQUIRES non-null block keys — a NULL block could never match
    * its target row. Callers pass non-null value derivations today; make
    * the key `coalesce(...)`-total before calling with nullable input.
    */
  def selectByRank(
      df: DataFrame,
      blocks: Seq[(String, Column)],
      blockDesc: Seq[Boolean],
      localOrder: Seq[Column],
      ranks: DataFrame,
      outRank: String): DataFrame = {
    require(blocks.nonEmpty && blocks.size == blockDesc.size)
    val blkNames = blocks.map(_._1)
    val withBlk = blocks.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    val partials = withBlk.groupBy(blkNames.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val blkSort = blkNames.zip(blockDesc).map { case (n, d) =>
      if (d) col(n).desc else col(n).asc
    }
    val wOff = Window.partitionBy(boundedPartition(col(blkNames.head)))
      .orderBy(blkSort: _*).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partials
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
    // bounded summary × tiny rank list: which block owns each rank
    val targets = offsets.join(broadcast(ranks),
        col("__r") > col("__off") && col("__r") <= col("__off") + col("__n"))
      .select(blkNames.map(col) :+ col("__off") :+ col("__r"): _*)
    // partition by (block, __r): two ranks in one block must each see the
    // whole block once, not interleave each other's duplicated rows
    val wLocal = Window.partitionBy((blkNames :+ "__r").map(col): _*)
      .orderBy(localOrder: _*)
    withBlk.join(broadcast(targets), blkNames)
      .withColumn("__rn", row_number().over(wLocal))
      .filter(col("__rn") === col("__r") - col("__off"))
      .withColumn(outRank, col("__r"))
      .drop("__rn", "__off", "__r").drop(blkNames: _*)
  }

  /** Lossless two-phase per-group top-k — the scale-safe replacement for
    * `row_number().over(Window.partitionBy(group).orderBy(...))  ≤ k`
    * when the GROUP key is low-cardinality over an unbounded frame (one
    * language / one source = one task otherwise): rank inside
    * (group, salt-bucket) first — a high-cardinality window — keep each
    * bucket's top k, then rank the ≤ k·buckets survivors per group.
    * EXACT: the global per-group top-k is contained in the union of the
    * per-bucket top-k's (any row outside its bucket's top k has ≥ k rows
    * of its own group ahead of it), so phase 2 reproduces the naive
    * window's ranks verbatim. No task sees more than one salt-bucket of
    * one group (phase 1) or k·buckets rows of one group (phase 2).
    *
    * `salt` must be a deterministic function of the row (hash of the
    * tie-break column — NOT rand()), so reruns and retries agree.
    */
  def saltedTopK(
      df: DataFrame,
      groups: Seq[String],
      order: Seq[Column],
      salt: Column,
      k: Int,
      outRank: String,
      buckets: Int = 32): DataFrame = {
    val wSalt = Window
      .partitionBy(groups.map(col) :+ pmod(salt, lit(buckets)): _*)
      .orderBy(order: _*)
    val wGroup = Window.partitionBy(groups.map(col): _*).orderBy(order: _*)
    df.withColumn("__stk", row_number().over(wSalt))
      .filter(col("__stk") <= k)
      .drop("__stk")
      .withColumn(outRank, row_number().over(wGroup))
      .filter(col(outRank) <= k)
  }

  /** `ntile(n)` bucket from an exact rank — Spark's distribution: with N
    * rows, the first `N mod n` buckets get `N div n + 1` rows, the rest
    * `N div n` (matches `NTile` in catalyst and DuckDB/ANSI NTILE). Pure
    * integer arithmetic on the (rank, total) columns `blockedPrefix`
    * emits, so scoring is an exact map-side expression — no window at all.
    */
  def ntileFromRank(rank: Column, total: Column, n: Int): Column = {
    val q = idiv(total.cast("long"), lit(n).cast("long"))
    val rem = total.cast("long") % n
    val fat = rem * (q + 1) // rows covered by the (q+1)-sized buckets
    when(rank <= fat, idiv(rank - 1, q + 1) + 1)
      .otherwise(rem + idiv(rank - fat - 1, greatest(q, lit(1L))) + 1)
      .cast("int")
  }

  /** Integral division (SQL `div`) — exact on longs, unlike `/` which
    * routes through double. Bridged through the sql-package helper because
    * catalyst's `IntegralDivide` has no Column wrapper.
    */
  def idiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.idiv(a, b)
}
