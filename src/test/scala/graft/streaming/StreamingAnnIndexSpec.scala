package graft.streaming

import graft.SparkSpec
import graft.llm.Similarity
import java.nio.file.Files

/** The standing ANN index deployed on a vector stream — the ingestion
  * half of the IVF story run as the production loop: arriving embedding
  * batches assign against the frozen codebook and append to the index
  * zone; queries probe the accumulated zone. Pinned statements:
  *
  *  1. probe over the drained streamed index ≡ the in-query rebuild
  *     (`sim_ann_ivf`) row-for-row — streaming ingestion loses nothing;
  *  2. the index zone holds exactly one assignment per arriving vector;
  *  3. re-draining the finished stream over the same checkpoint is a
  *     no-op (exactly-once growth, the batch=<id> overwrite discipline).
  */
class StreamingAnnIndexSpec extends SparkSpec {

  test("streamed IVF index reproduces the batch probe; re-drain is a no-op") {
    val sfDir = sf0001
    val root = Files.createTempDirectory("graft-ann-index-stream").toString
    val landing = s"$root/landing"
    val index = s"$root/index"

    // 3 parquet objects → 3 micro-batches under maxFilesPerTrigger=1
    graft.Tables.embeddings(spark, sfDir)
      .repartition(3)
      .write.parquet(landing)

    val q = Similarity.annIndexStream(spark, sfDir, landing, index, s"$root/ckpt")
    q.awaitTermination()

    // 1. probe over the streamed index ≡ the in-query rebuild
    def probe(): Seq[Seq[Any]] =
      Similarity.annProbeFromIndex(spark, index).collect().toSeq.map(_.toSeq)
    val streamed = probe()
    val batch = Similarity.simAnnIvf(spark, sfDir).collect().toSeq.map(_.toSeq)
    assert(streamed.nonEmpty, "the drained index must serve a non-empty probe")
    assert(streamed === batch)

    // 2. one assignment per arriving vector
    val nVecs = graft.Tables.embeddings(spark, sfDir).count()
    def assignedCount(): Long = spark.read.parquet(s"$index/assigned").count()
    assert(assignedCount() === nVecs)

    // 3. re-drain idempotence
    val q2 = Similarity.annIndexStream(spark, sfDir, landing, index, s"$root/ckpt")
    q2.awaitTermination()
    assert(assignedCount() === nVecs, "re-drain must not grow the index")
    assert(probe() === streamed, "re-drain must not change the probe")
  }
}
