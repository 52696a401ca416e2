package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the missing
  * step between "near-duplicate PAIRS" and an actionable dedup decision:
  * pairs form clusters (A~B, B~C ⇒ {A,B,C}), and the pipeline keeps one
  * canonical doc per cluster, not one per pair.
  *
  * Algorithm: every node starts labeled with its own id; each round, a node
  * takes the min of its label and its neighbors' labels (edge propagation),
  * then labels compress by POINTER JUMPING — label := label(label) — so
  * label chains halve every round and convergence needs O(log diameter)
  * rounds, not O(diameter). Converged when the edge step changes nothing
  * (at that fixpoint labels are constant per component, so the jump is the
  * identity). The log bound is what made the chain-shaped perceptual-hash
  * graph (mm_ahash_clusters) converge in 4 rounds instead of hitting the
  * 15-round cap.
  *
  * Scale notes (the reason this is join-based, not graph-library-based):
  *  - each round is one equi-join + one groupBy on (node, label) longs —
  *    plain shuffles that partition like any other key at 100 TB;
  *  - `localCheckpoint` after every round truncates lineage, otherwise the
  *    iterative plan nests one join-stage deeper per round and both the
  *    optimizer and the scheduler choke; on a real cluster with a
  *    checkpoint dir, `checkpoint()` adds failure-tolerance across rounds;
  *  - the driver sees only the per-round change COUNT (a scalar), never
  *    node data.
  */
object ConnectedComponents {

  /** `edges`: two long columns (`a`, `b`), undirected, self-loops/dups ok.
    * Returns (node, component) with component = min node id in the
    * component; only nodes appearing in `edges` are labeled.
    *
    * Per-round cost: ONE edge join + groupBy produces the new labels (the
    * node's own label rides along as a self-edge, so no second join-back),
    * one exact decimal-sum detects convergence (labels only ever decrease,
    * so the label sum strictly decreases until the fixpoint — no
    * compare-join), and the pointer jump runs only on rounds that actually
    * changed something (a converged round's jump is the identity).
    */
  def components(edges: DataFrame, maxIter: Int = 15): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)

    // exact sum as decimal(38,0): node ids may be full-range hashes, so a
    // long sum could overflow and alias two distinct label states
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)

    var iter = 0
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged && iter < maxIter) {
      // new label = min over own label (self-edge) and neighbors' labels
      val withSelf = sym
        .union(labels.select(col("node").as("a"), col("node").as("b")))
      val next = withSelf
        .join(labels.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a").as("node"))
        .agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      if (nextSum.compareTo(prevSum) == 0) {
        // fixpoint: next == labels; keep the already-materialized labels
        next.unpersist()
        converged = true
      } else {
        prevSum = nextSum
        // pointer jump: label := label(label) — a label is itself a node of
        // the same component, so composing the mapping halves chain depth
        val jumped = next.select("node", "label").as("x")
          .join(next.select(col("node").as("label"), col("label").as("jlabel")).as("y"),
            Seq("label"), "left")
          .select(col("node"),
            coalesce(col("jlabel"), col("label")).as("label"))
          .localCheckpoint(true)
        // superseded rounds' checkpoint blocks are dead once `jumped` has
        // materialized (eager) — unpersist NOW instead of waiting for the
        // ContextCleaner, so a long-lived session running many cluster
        // queries doesn't accumulate pinned block-manager entries
        next.unpersist()
        labels.unpersist()
        labels = jumped
        // the jump can itself reach the fixpoint; the next round's sum
        // check sees it (sum is invariant under the jump only at fixpoint)
        prevSum = labelSum(labels)
      }
      iter += 1
    }
    sym.unpersist() // final labels' blocks are materialized; edges are dead
    labels.withColumnRenamed("label", "component")
  }
}
