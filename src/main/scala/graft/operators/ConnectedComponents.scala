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

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // min label among each node's neighbors
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a").as("node"))
        .agg(min(col("label")).as("nbr_min"))
      val next = labels
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          (col("nbr_min") < col("label")).as("chg"))
        .localCheckpoint(true)
      changed = next.filter(col("chg")).count()
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
      iter += 1
    }
    sym.unpersist() // final labels' blocks are materialized; edges are dead
    labels.withColumnRenamed("label", "component")
  }
}
