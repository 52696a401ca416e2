package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-range detection over a supposedly-contiguous integer key
  * sequence — the reconciliation primitive behind `dq_sequence_gaps`.
  *
  * The naive formulation is `lag()` over ALL keys in one global window: a
  * single-partition sort that cannot scale. This is the two-level
  * decomposition instead:
  *
  *  1. bucket keys into fixed-width blocks (`key div block`);
  *  2. within-block gaps from each block's sorted key array
  *     (`collect_list` is bounded by the block width — never a
  *     whole-partition collect);
  *  3. block-boundary gaps from a window over BLOCK SUMMARIES only
  *     (keys/block rows; a 10⁹-key sequence yields ~10⁵ summary rows,
  *     and the same decomposition applies recursively if that ever
  *     mattered).
  *
  * Exactly the gaps the global-lag form finds, at any block width ≥ 1 —
  * `SequenceGapsPropSpec` pins the equivalence on random key sets, the
  * `dq_sequence_gaps` DuckDB oracle pins it on the corpus.
  */
object SequenceGaps {

  /** @param keys  single-column frame of DISTINCT integer keys
    * @param keyCol name of the key column
    * @param block  block width (keys per block; the collect bound)
    * @return (gap_start, gap_end, missing) — one row per maximal missing
    *         range strictly between the min and max key
    */
  def gaps(keys: DataFrame, keyCol: String, block: Int): DataFrame = {
    require(block >= 1, s"block width must be >= 1, got $block")
    val blocks = keys
      .groupBy(expr(s"$keyCol div $block").as("blk"))
      .agg(sort_array(collect_list(col(keyCol))).as("ks"),
        min(col(keyCol)).as("kmin"), max(col(keyCol)).as("kmax"))
    // adjacent-pair gaps via zip_with over the two shifted slices — unlike
    // a transform over sequence(0, size-2), this degrades to an EMPTY array
    // for singleton blocks (sequence(0, -1) is a decreasing sequence and
    // the element_at goes out of bounds under ANSI; caught by
    // SequenceGapsPropSpec before any singleton block existed in the corpus)
    val within = blocks.select(explode(expr(
        "filter(zip_with(slice(ks, 1, size(ks) - 1), slice(ks, 2, size(ks) - 1), " +
          "(a, b) -> struct(a + 1 AS gap_start, b - 1 AS gap_end)), " +
          "s -> s.gap_end >= s.gap_start)")).as("g"))
      .select(col("g.gap_start"), col("g.gap_end"))
    // block summaries only (see scaladoc) — the boundedPartition idiom
    // marks the bound for the PlanSpec unpartitioned-window guard
    val byBlk = Window
      .partitionBy(BlockedRank.boundedPartition(col("blk")))
      .orderBy("blk")
    val across = blocks
      .withColumn("next_min", lead(col("kmin"), 1).over(byBlk))
      .filter(col("next_min") > col("kmax") + 1)
      .select((col("kmax") + 1).as("gap_start"), (col("next_min") - 1).as("gap_end"))
    within.union(across)
      .withColumn("missing", col("gap_end") - col("gap_start") + 1)
  }
}
