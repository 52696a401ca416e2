package graft.streaming

import graft.SparkSpec
import graft.llm.Refinery
import java.nio.file.Files

/** The refinery deployed on the landing stream: gate + span-mask applied
  * per micro-batch (exactly-once via per-batch overwrite), packing at
  * publication over the curated zone. The pinned statement: a DRAINED
  * stream's published manifest is IDENTICAL to the batch `refinery_pack`
  * on the same corpus — gate and mask are per-row given the standing
  * registry artifacts, so they commute with micro-batching, and the
  * publication prefix is batch-order-independent because it re-sorts on
  * (lang, doc_id).
  */
class StreamingRefinerySpec extends SparkSpec {

  test("drained stream's published manifest equals the batch refinery_pack") {
    val sfDir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-refinery-stream").toString
    val landing = s"$root/landing"
    val curated = s"$root/curated"

    // stage the corpus as a multi-object landing zone (3 NDJSON objects
    // → 3 micro-batches under maxFilesPerTrigger=1)
    graft.Tables.documents(spark, sfDir)
      .repartition(3)
      .write.json(landing)

    val q = Refinery.refineryStream(
      spark, sfDir, landing, curated, s"$root/ckpt")
    q.awaitTermination()

    val streamed = Refinery.manifestFromCurated(spark, curated)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = Refinery.refineryPack(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty, "the drained stream must publish a non-empty manifest")
    assert(streamed.toSeq === batch.toSeq)
  }
}
