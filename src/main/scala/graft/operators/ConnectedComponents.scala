package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanBridge

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
  *  - a lineage cut after every round (PlanBridge.cutLineage — see the
  *    method scaladoc for why NOT `localCheckpoint`) truncates the plan,
  *    otherwise it nests one join-stage deeper per round and both the
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
    *
    * Lineage cuts go through [[org.apache.spark.sql.graft.PlanBridge]]
    * rather than `localCheckpoint`: the checkpoint form INHERITS the
    * origin plan's size estimate onto the new leaf, and because each
    * round references the previous labels twice (union + join) and the
    * jump self-joins, that inherited estimate squares twice per round —
    * by round ~15 the driver burns minutes multiplying megabit BigInts
    * inside the stats visitor (measured: 510 s/run on the 10⁴-node
    * co-purchase graph, ~all of it driver-side). The bridge's fresh leaf
    * restarts every round's estimate from the session default.
    *
    * `maxIter` is a runaway bound, not a tuning knob: pointer jumping
    * converges in O(log diameter) rounds, so 30 covers any graph whose
    * diameter fits in a long. The loop exits at the detected fixpoint.
    */
  def components(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val (sym, symRdd) = PlanBridge.cutLineage(
      edges.select(col("a"), col("b"))
        .union(edges.select(col("b").as("a"), col("a").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct())

    var (labels, labelsRdd) = PlanBridge.cutLineage(
      sym.select(col("a").as("node")).distinct()
        .withColumn("label", col("node")))

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
      val (next, nextRdd) = PlanBridge.cutLineage(withSelf
        .join(labels.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a").as("node"))
        .agg(min(col("label")).as("label")))
      val nextSum = labelSum(next)
      if (nextSum.compareTo(prevSum) == 0) {
        // fixpoint: next == labels; keep the already-materialized labels
        nextRdd.unpersist()
        converged = true
      } else {
        // pointer jump: label := label(label) — a label is itself a node of
        // the same component, so composing the mapping halves chain depth
        val (jumped, jumpedRdd) = PlanBridge.cutLineage(
          next.select("node", "label").as("x")
            .join(next.select(col("node").as("label"), col("label").as("jlabel")).as("y"),
              Seq("label"), "left")
            .select(col("node"),
              coalesce(col("jlabel"), col("label")).as("label")))
        // superseded rounds' blocks are dead once `jumped` has
        // materialized (eager) — unpersist NOW instead of waiting for the
        // ContextCleaner, so a long-lived session running many cluster
        // queries doesn't accumulate pinned block-manager entries
        nextRdd.unpersist()
        labelsRdd.unpersist()
        labels = jumped
        labelsRdd = jumpedRdd
        // the jump can itself reach the fixpoint; the next round's sum
        // check sees it (sum is invariant under the jump only at fixpoint)
        prevSum = labelSum(labels)
      }
      iter += 1
    }
    symRdd.unpersist() // final labels' blocks stay; edges are dead
    labels.withColumnRenamed("label", "component")
  }
}
