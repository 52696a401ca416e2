package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Filesystem contract of the EXECUTED compaction (`compactExecute`):
  * the rewrite must actually shrink the layout to one file per plan
  * bin, move bytes losslessly, and leave `key=value` partition pruning
  * intact — the three assertions VERDICT r8 item 5 names.
  */
class CompactionExecuteSpec extends SparkSpec {

  private val Target = 64L * 1024

  test("compaction rewrites each partition to exactly one file per bin, losslessly, pruning intact") {
    val root = Files.createTempDirectory("graft-compact").toString
    val in = s"$root/in"
    val out = s"$root/out"

    // a small-file table: 8-way repartition before partitionBy fans each
    // source directory out into up to 8 fragment files
    graft.Tables.documents(spark, sf0001)
      .repartition(8)
      .write.partitionBy("source").parquet(in)

    val report = Maintenance.compactExecute(spark, in, out, Target)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(report.nonEmpty)

    // 1. file count = bin count, and the bin count matches an
    // independent replay of the running-total division over the REAL
    // pre-compaction listing (name order)
    report.foreach { case (part, nIn, nBins) =>
      val inFiles = new java.io.File(s"$in/$part").listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .sortBy(_.getName)
      assert(inFiles.length.toLong === nIn)
      var cum = 0L
      var lastBin = -1L
      inFiles.foreach { f => lastBin = cum / Target; cum += f.length() }
      assert(nBins === lastBin + 1, s"$part plan replay")
      val outFiles = new java.io.File(s"$out/$part").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(outFiles.length.toLong === nBins, s"$part output file count")
      assert(outFiles.forall(_.getName.startsWith("compact-")))
      assert(nBins < nIn || nIn == 1L, s"$part should actually compact")
    }

    // 2. data identical pre/post (order-independent full-row digest)
    def digest(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
      val r = df.agg(count(lit(1)),
        expr(s"bit_xor(xxhash64(${df.columns.sorted.mkString(", ")}))"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    assert(digest(out) === digest(in))

    // 3. partition pruning still effective: a source filter becomes a
    // PartitionFilter on the compacted scan (the PlanSpec discipline —
    // inputFiles reports the unpruned listing, the plan shows the truth)
    val oneSource = spark.read.parquet(out)
      .select("source").distinct().head().getString(0)
    val pruned = spark.read.parquet(out).filter(col("source") === oneSource)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains(s"PartitionFilters: [isnotnull(source"),
      s"source filter must prune partitions:\n$plan")
    assert(pruned.count() === spark.read.parquet(in)
      .filter(col("source") === oneSource).count())
  }
}
