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

  /** Per-row outputs appended to `df`:
    *   - `outRank`: exact 1-based global rank under the total order
    *     (per `partition` group if non-empty);
    *   - `outCum` (when `value` is set): exact running sum of `value` up to
    *     and including this row;
    *   - `outTotalN` / `outTotalV`: the (partition-wide) row count and value
    *     sum, attached to every row (handy for "share of total" math).
    *
    * @param partition  outer grouping columns (empty = whole-table order)
    * @param blocks     (name, expr) monotone block-key columns
    * @param blockDesc  per block column: true = descending in the total order
    * @param localOrder tie-break sort within a block (must complete the
    *                   total order)
    * @param value      optional column to accumulate exactly alongside rank
    */
  def blockedPrefix(
      df: DataFrame,
      partition: Seq[String],
      blocks: Seq[(String, Column)],
      blockDesc: Seq[Boolean],
      localOrder: Seq[Column],
      outRank: String,
      outTotalN: String,
      value: Option[Column] = None,
      outCum: String = "__cum",
      outTotalV: String = "__total_v"): DataFrame = {
    require(blocks.nonEmpty && blocks.size == blockDesc.size)
    val blkNames = blocks.map(_._1)
    val keyCols = (partition ++ blkNames).map(col)
    val withBlk = blocks.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    val base = value match {
      case Some(v) => withBlk.withColumn("__brk_v", v)
      case None    => withBlk
    }

    val partials = value match {
      case Some(_) =>
        base.groupBy(keyCols: _*)
          .agg(count(lit(1)).as("__brk_n"), sum(col("__brk_v")).as("__brk_sv"))
      case None =>
        base.groupBy(keyCols: _*).agg(count(lit(1)).as("__brk_n"))
    }
    val blkSort = blkNames.zip(blockDesc).map { case (n, d) =>
      if (d) col(n).desc else col(n).asc
    }
    // Window over BLOCK SUMMARIES only (bounded; see scaladoc). The
    // whole-table case partitions by a constant: same single-task execution
    // the bounded summary calls for, but explicitly annotated — it keeps
    // "WindowExec: No Partition Defined" warnings (and the PlanSpec guard
    // that promotes them to failures) reserved for UNBOUNDED inputs. A bare
    // lit(0) is stripped by EliminateWindowPartitions (foldable), so the
    // constant is expressed as pmod(hash(blk), 1): always 0, never null,
    // non-foldable — survives optimization, hashes every summary row to the
    // one partition the bounded cumulative pass intends.
    val wBase =
      if (partition.isEmpty)
        Window.partitionBy(pmod(hash(col(blkNames.head)), lit(1)))
      else Window.partitionBy(partition.map(col): _*)
    val wOff = wBase.orderBy(blkSort: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = wBase
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets0 = partials
      .withColumn("__brk_off", coalesce(sum(col("__brk_n")).over(wOff), lit(0L)))
      .withColumn(outTotalN, sum(col("__brk_n")).over(wTot))
    val offsets = value match {
      case Some(_) =>
        offsets0
          .withColumn("__brk_voff",
            sum(col("__brk_sv")).over(wOff))
          .withColumn(outTotalV, sum(col("__brk_sv")).over(wTot))
          .drop("__brk_n", "__brk_sv")
      case None => offsets0.drop("__brk_n")
    }

    val wLocal = Window.partitionBy(keyCols: _*).orderBy(localOrder: _*)
    val ranked = base
      .join(offsets, partition ++ blkNames)
      .withColumn(outRank, col("__brk_off") + row_number().over(wLocal))
    val out = value match {
      case Some(_) =>
        val localSum = sum(col("__brk_v")).over(
          wLocal.rowsBetween(Window.unboundedPreceding, 0))
        ranked.withColumn(outCum,
          when(col("__brk_voff").isNull, localSum) // first block: no offset
            .otherwise(col("__brk_voff") + localSum))
          .drop("__brk_voff", "__brk_v")
      case None => ranked
    }
    out.drop("__brk_off").drop(blkNames: _*)
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
