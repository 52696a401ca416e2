package graft.streaming

import graft.SparkSpec
import graft.llm.Refinery
import java.nio.file.Files

/** The standing near-dup index deployed on the landing stream — the
  * production ingestion shape VERDICT r8 item 1 asked for: each
  * micro-batch appends its shingle signatures, discovers its verified
  * pairs against history via the index (O(batch) signature work + an
  * index equi-join, never an O(corpus) recompute), and publication
  * closes clusters over the accumulated pairs. Pinned statements:
  *
  *  1. drained stream's published manifest ≡ batch `refinery_dedup_pack`
  *     (gate ∘ cluster-representative dedup ∘ mask ∘ pack);
  *  2. the accumulated incremental pair set ≡ the batch PPJoin pair set
  *     (the discovery-completeness claim behind 1);
  *  3. re-draining the finished stream is a no-op: index zones and the
  *     published manifest are byte-identical (exactly-once growth).
  */
class StreamingDedupIndexSpec extends SparkSpec {

  test("streamed standing index reproduces the batch refinery_dedup_pack; re-drain is a no-op") {
    val sfDir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-dedup-index-stream").toString
    val landing = s"$root/landing"
    val curated = s"$root/curated"
    val index = s"$root/index"

    // 3 NDJSON objects → 3 micro-batches under maxFilesPerTrigger=1
    graft.Tables.documents(spark, sfDir)
      .repartition(3)
      .write.json(landing)

    val q = Refinery.refineryIndexedStream(
      spark, sfDir, landing, curated, index, s"$root/ckpt")
    q.awaitTermination()

    // 1. published manifest ≡ batch refinery_dedup_pack
    def manifest(): Seq[(String, Long, Long, Long)] =
      Refinery.manifestFromCuratedDedup(spark, curated, index)
        .collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val streamed = manifest()
    val batch = Refinery.refineryDedupPack(spark, sfDir)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty, "the drained stream must publish a non-empty manifest")
    assert(streamed === batch)

    // 2. accumulated pairs ≡ batch PPJoin pairs
    val streamedPairs = spark.read.parquet(s"$index/pairs")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchPairs = graft.llm.Dedup.dedupNgramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamedPairs === batchPairs)

    // 3. re-drain idempotence: a fresh AvailableNow run over the same
    // checkpoint sees no new files, so zones and manifest are unchanged
    def zoneCounts(): (Long, Long, Long) = (
      spark.read.parquet(s"$index/sigs").count(),
      spark.read.parquet(s"$index/pairs").count(),
      spark.read.parquet(curated).count())
    val before = zoneCounts()
    val q2 = Refinery.refineryIndexedStream(
      spark, sfDir, landing, curated, index, s"$root/ckpt")
    q2.awaitTermination()
    assert(zoneCounts() === before, "re-drain must not grow any zone")
    assert(manifest() === streamed, "re-drain must not change the manifest")
  }

  test("full-chain stream (gate + decontaminate per batch) reproduces the batch refinery_full") {
    val sfDir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-full-stream").toString
    val landing = s"$root/landing"
    val curated = s"$root/curated"
    val index = s"$root/index"

    graft.Tables.documents(spark, sfDir)
      .repartition(3)
      .write.json(landing)

    val q = Refinery.refineryFullStream(
      spark, sfDir, landing, curated, index, s"$root/ckpt")
    q.awaitTermination()

    val streamed = Refinery.manifestFromCuratedDedup(spark, curated, index)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = Refinery.refineryFull(spark, sfDir)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }
}
