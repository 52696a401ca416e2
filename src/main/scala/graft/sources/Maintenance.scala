package graft.sources

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lakehouse table-maintenance planning: the small-file compaction planner
  * behind OPTIMIZE/rewriteDataFiles in every table format — given a file
  * listing (path, size), assign files to target-sized output groups so one
  * rewrite task per group turns N small files into one right-sized file.
  *
  * The documents table stands in for the file listing (doc_id → file,
  * n_chars → size, source → table partition, matching the reference's
  * per-prefix object layout). Assignment is running-total division: files
  * ordered by id within a partition, bin = bytes-before-this-file div
  * target. Deterministic, exact integers, one window cumsum per partition
  * (single shuffle + sort) — and unlike first-fit-decreasing, it needs no
  * sequential bin state, so it parallelizes at any scale. Skew note: at
  * 100 TB a single giant partition serializes its cumsum; pre-split such
  * partitions on a hash of the file id (coarse subranges keep bins local).
  */
object Maintenance extends QueryModule {

  val TargetBytes = 65536L

  def compactionBins(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank
    // hierarchical per-source byte prefix (the scaladoc's pre-split,
    // implemented): partial sums per (source, doc_id-range block) →
    // per-source offsets over block summaries → per-block local cumsum.
    // Identical bins; no single-task per-source stage on a giant source.
    BlockedRank.blockedPrefix(
        Tables.documents(spark, sfDir)
          .select(col("source"), col("doc_id"), col("n_chars")),
        partition = Seq("source"),
        blocks = Seq(("__cb_b", expr("doc_id div 256"))),
        blockDesc = Seq(false),
        localOrder = Seq(col("doc_id")),
        outRank = "__cb_r", outTotalN = "__cb_n",
        values = Seq(BlockedRank.PrefixValue(
          col("n_chars").cast("long"), "__cb_cum", "__cb_tot")),
        broadcastOffsets = true)
      .withColumn("cum_before", col("__cb_cum") - col("n_chars"))
      .withColumn("bin", expr(s"cum_before div $TargetBytes"))
      .groupBy("source", "bin")
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("n_chars")).as("bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("source", "bin")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "maint_compaction_bins" -> (compactionBins _),
  )

  override def oracles: Map[String, String] = Map(
    "maint_compaction_bins" ->
      s"""WITH f AS (
         |  SELECT source, doc_id, n_chars,
         |    COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM documents
         |)
         |SELECT source, CAST(cum_before // $TargetBytes AS BIGINT) AS bin,
         |  COUNT(*) AS n_files,
         |  CAST(SUM(n_chars) AS BIGINT) AS bytes,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM f GROUP BY source, cum_before // $TargetBytes
         |ORDER BY source, bin""".stripMargin,
  )
}
