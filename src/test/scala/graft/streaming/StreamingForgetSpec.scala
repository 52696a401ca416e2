package graft.streaming

import graft.SparkSpec
import graft.llm.Forget
import java.nio.file.Files

/** The takedown queue on a stream. Pinned statements:
  *
  *  1. drained queue's published manifest ≡ batch `forget_pack` under the
  *     same cumulative delete set (accumulate-then-cascade correctness);
  *  2. arrival ORDER does not matter — the same ids split differently
  *     across batches publish the identical manifest;
  *  3. re-draining the finished queue is a no-op (exactly-once growth of
  *     the tombstone zone).
  */
class StreamingForgetSpec extends SparkSpec {

  test("streamed takedowns reproduce batch forget_pack; re-drain is a no-op") {
    import spark.implicits._
    val sfDir = sf0001
    val root = Files.createTempDirectory("graft-forget-stream").toString
    val landing = s"$root/landing"
    val zone = s"$root/tombstones"

    // the registered delete set, split across 3 arrival files
    val del = Forget.deletedOf(graft.Tables.documents(spark, sfDir))
    del.repartition(3).write.json(landing)

    Forget.forgetStream(spark, sfDir, landing, zone, s"$root/ckpt")
      .awaitTermination()

    def manifest(): Seq[(String, Long, Long, Long)] =
      Forget.manifestFromTombstones(spark, sfDir, zone).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val streamed = manifest()
    val batch = Forget.forgetPack(spark, sfDir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty)
    assert(streamed === batch)

    // tombstone ids ≡ the delete set, exactly
    val zoneIds = spark.read.parquet(zone).select("doc_id")
      .as[Long].collect().toSet
    assert(zoneIds === del.as[Long].collect().toSet)

    // re-drain: same landing, fresh checkpoint — batch dirs overwrite
    // with identical content, manifest unchanged
    Forget.forgetStream(spark, sfDir, landing, zone, s"$root/ckpt2")
      .awaitTermination()
    assert(manifest() === streamed)

    // order independence: the same ids split across DIFFERENT batch
    // boundaries publish the identical manifest
    val landing2 = s"$root/landing2"
    val zone2 = s"$root/tombstones2"
    del.repartition(2).write.json(landing2)
    Forget.forgetStream(spark, sfDir, landing2, zone2, s"$root/ckpt3")
      .awaitTermination()
    assert(manifest() === Forget.manifestFromTombstones(spark, sfDir, zone2)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))))

    graft.Fs.deleteRecursively(new java.io.File(root))
  }
}
