package graft.llm

import graft.SparkSpec
import graft.queries.Ml
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the refinery SINK against the oracled reports: the curated
  * parquet it writes must contain exactly the docs the gate keeps, and
  * each doc's masked text must hash to `text_dedup_mask_exact`'s digest —
  * the artifact a training run reads is precisely what the reports
  * promised, not a parallel reimplementation.
  */
class RefinerySpec extends SparkSpec {

  test("refineryWrite ships the gate's keep set with the exact-mask digests") {
    val out = Files.createTempDirectory("graft-refinery").toString
    val n = Refinery.refineryWrite(spark, sf0001, out)
    val written = spark.read.parquet(out)

    // 1. the written SET is the gate's keep decision, per source
    val gate = Ml.curateClassifier(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val got = written.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === gate.filter(_._2 > 0), "per-source keep counts must match the gate report")
    assert(n === gate.values.sum)
    assert(n > 0 && n < spark.read.parquet(s"$sf0001/documents.parquet").count(),
      "the gate must actually drop something at sf0.001")

    // 2. every written doc's masked text hashes to the exact-mask digest
    val digests = SuffixDedup.dupMaskExact(spark, sf0001)
      .select(col("doc_id"), col("masked_md5"), col("n_kept"))
    val mismatches = written
      .select(col("doc_id"), md5(col("masked_text")).as("got_md5"),
        col("n_kept_words"))
      .join(digests, "doc_id")
      .filter(col("got_md5") =!= col("masked_md5") ||
        col("n_kept_words") =!= col("n_kept"))
      .count()
    assert(mismatches === 0L, "masked text must hash to text_dedup_mask_exact's digests")
  }
}
