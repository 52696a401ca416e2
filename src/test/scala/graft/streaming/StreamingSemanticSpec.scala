package graft.streaming

import graft.SparkSpec
import graft.llm.{Refinery, Similarity}
import java.nio.file.Files

/** The semantic (embedding) dedup tier deployed on the stream — the
  * round-9 verdict's item 4: the streaming refinery dedups text but not
  * embeddings. `semDedupIndexStream` assigns each arriving vector batch
  * to its frozen k-means cell, scores it against the cell's HISTORY via
  * the standing assignment zone, and accumulates within-cell τ-pairs;
  * publication drops the losers (`manifestFromCuratedSemantic`, the
  * `manifestFromCuratedDedup` pattern). Pinned statements:
  *
  *  1. drained manifest ≡ batch `refinery_semantic`
  *     (gate ∘ SemDeDup ∘ mask ∘ pack);
  *  2. the accumulated loser set ≡ the batch `dedupSemantic` !keep set
  *     (the discovery-completeness claim behind 1);
  *  3. re-draining the finished stream is a no-op (exactly-once growth).
  */
class StreamingSemanticSpec extends SparkSpec {

  test("streamed SemDeDup index reproduces the batch refinery_semantic; re-drain is a no-op") {
    val sfDir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-semantic-stream").toString
    val docLanding = s"$root/doc_landing"
    val curated = s"$root/curated"
    val textIndex = s"$root/text_index"
    val embLanding = s"$root/emb_landing"
    val semIndex = s"$root/sem_index"

    // curated zone: the text refinery stream's gate ∘ mask survivors
    graft.Tables.documents(spark, sfDir)
      .repartition(3)
      .write.json(docLanding)
    Refinery.refineryIndexedStream(
      spark, sfDir, docLanding, curated, textIndex, s"$root/doc_ckpt")
      .awaitTermination()

    // semantic index: 3 embedding micro-batches through the stream
    graft.Tables.embeddings(spark, sfDir)
      .repartition(3)
      .write.parquet(embLanding)
    Similarity.semDedupIndexStream(
      spark, sfDir, embLanding, semIndex, s"$root/emb_ckpt")
      .awaitTermination()

    // 1. published manifest ≡ batch refinery_semantic
    def manifest(): Seq[(String, Long, Long, Long)] =
      Refinery.manifestFromCuratedSemantic(spark, curated, semIndex)
        .collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val streamed = manifest()
    val batch = Refinery.refinerySemantic(spark, sfDir)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty, "the drained stream must publish a non-empty manifest")
    assert(streamed === batch)

    // 2. accumulated losers ≡ batch SemDeDup losers (and some exist, so
    // statement 1 is not vacuously gated on an empty loser set)
    val streamedLosers = spark.read.parquet(s"$semIndex/pairs")
      .select("hi").distinct().collect().map(_.getLong(0)).toSet
    val batchLosers = Similarity.dedupSemantic(spark, sfDir)
      .filter(!org.apache.spark.sql.functions.col("keep"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(batchLosers.nonEmpty, "the corpus must contain SemDeDup losers")
    assert(streamedLosers === batchLosers)

    // 3. re-drain idempotence over the same checkpoint
    def zoneCounts(): (Long, Long) = (
      spark.read.parquet(s"$semIndex/assigned").count(),
      spark.read.parquet(s"$semIndex/pairs").count())
    val before = zoneCounts()
    Similarity.semDedupIndexStream(
      spark, sfDir, embLanding, semIndex, s"$root/emb_ckpt")
      .awaitTermination()
    assert(zoneCounts() === before, "re-drain must not grow any zone")
    assert(manifest() === streamed, "re-drain must not change the manifest")
  }
}
