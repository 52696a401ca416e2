package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC apply: drain a change stream (op ∈ I/U/D + key + payload +
  * sequence number) into a keyed table maintained as VERSIONED PARQUET
  * SNAPSHOTS — the streaming twin of the batch `merge_upsert` query, and a
  * poor-man's lakehouse table format from Spark primitives only:
  *
  *  - each micro-batch applies its changes to the previous snapshot with
  *    the same full-outer-join merge as the batch form, then writes a NEW
  *    version dir `v=<batchId>` — readers never see a half-written table;
  *  - version = micro-batch id, so a retried batch REWRITES its own version
  *    instead of double-applying: exactly-once without a transaction log.
  *    The merge reads the newest version strictly OLDER than the current
  *    batch — a partially-written `v=<batchId>` from a crashed attempt is
  *    never read back;
  *  - old versions remain readable (`readSnapshot(dir, version)`) — time
  *    travel for audits/rollbacks; vacuuming old versions is a policy
  *    decision left to the caller.
  *
  * At scale each merge is one shuffle on the key over snapshot ∪ changes;
  * with snapshots bucketed on the key the exchange disappears entirely.
  * Within a batch, the LATEST change per key wins (window by sequence) —
  * upstream CDC feeds (Debezium-style) deliver exactly this shape.
  */
object CdcApply {

  /** Latest change per key merged onto `base`: D drops the row, I/U replace
    * it (no coalesce-per-column: a change row wins wholesale, so updates
    * may legitimately set a column to null). Pure function — unit-testable
    * without a stream.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val payload = base.columns
    val latest = changes
      .withColumn("__rn",
        row_number().over(
          Window.partitionBy(keyCol).orderBy(col(seqCol).desc)))
      .filter(col("__rn") === 1)
      .select(col(opCol).as("__op") +: payload.toSeq.map {
        case c if c == keyCol => col(c)
        case c                => col(c).as(s"__c_$c")
      }: _*)
    base.join(latest, Seq(keyCol), "full_outer")
      .filter(coalesce(col("__op"), lit("")) =!= "D")
      .select(payload.map {
        case c if c == keyCol => col(c)
        case c => when(col("__op").isNotNull, col(s"__c_$c")).otherwise(col(c)).as(c)
      }: _*)
  }

  /** Inverse of applyChanges: the change set turning `prev` into `next`
    * (the "change data feed" read off two snapshots). Emits I for keys
    * only in `next`, D for keys only in `prev`, U for keys whose payload
    * differs (null-safe struct compare); unchanged rows emit nothing.
    * Law (spec-pinned): applyChanges(prev, diff(prev, next)) ≡ next.
    * One full-outer join on the key — same scale shape as the apply.
    */
  def diff(
      prev: DataFrame,
      next: DataFrame,
      keyCol: String,
      seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val payload = prev.columns.filterNot(_ == keyCol).toSeq
    val p = prev.select(col(keyCol) +: payload.map(c => col(c).as(s"__p_$c")) :+
      lit(true).as("__in_p"): _*)
    val n = next.select(col(keyCol) +: payload.map(c => col(c).as(s"__n_$c")) :+
      lit(true).as("__in_n"): _*)
    val changed = payload
      .map(c => !(col(s"__p_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    p.join(n, Seq(keyCol), "full_outer")
      .withColumn(opCol,
        when(col("__in_p").isNull, "I")
          .when(col("__in_n").isNull, "D")
          .when(changed, "U"))
      .filter(col(opCol).isNotNull)
      .select(col(opCol) +: lit(0L).as(seqCol) +: col(keyCol) +:
        // I/U carry the NEXT value even when it is legitimately null
        // (coalesce would resurrect the old value); D carries prev.
        payload.map(c =>
          when(col("__in_n").isNull, col(s"__p_$c"))
            .otherwise(col(s"__n_$c")).as(c)): _*)
  }

  /** Version dirs present under `tableDir` (complete ones carry _SUCCESS). */
  def versions(tableDir: String): Seq[Long] = {
    val root = new java.io.File(tableDir)
    if (!root.isDirectory) Seq.empty
    else root.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v=") &&
        new java.io.File(f, "_SUCCESS").exists())
      .map(_.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** Read a snapshot — the newest by default, a specific version for time
    * travel.
    */
  def readSnapshot(spark: SparkSession, tableDir: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(versions(tableDir).lastOption)
      .getOrElse(sys.error(s"no snapshot under $tableDir"))
    spark.read.parquet(s"$tableDir/v=$v")
  }

  /** Start the drain: one snapshot version per micro-batch of changes.
    * `targetSchema` (key + payload, no op/seq) seeds version 0.
    */
  def run(
      changes: DataFrame,
      tableDir: String,
      checkpointDir: String,
      keyCol: String,
      seqCol: String = "seq",
      opCol: String = "op"): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val prior = versions(tableDir).filter(_ < batchId).lastOption
        val base = prior match {
          case Some(v) => readSnapshot(spark, tableDir, Some(v))
          case None    => batch.drop(opCol, seqCol).limit(0)
        }
        applyChanges(base, batch, keyCol, seqCol, opCol)
          .write.mode("overwrite").parquet(s"$tableDir/v=$batchId")
        ()
      }
      .start()
}
