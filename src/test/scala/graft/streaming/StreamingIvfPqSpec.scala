package graft.streaming

import graft.SparkSpec
import graft.llm.Similarity
import java.nio.file.Files

/** The COMPRESSED ANN index maintained incrementally — IVF-PQ ingestion
  * on the vector stream: arriving batches coarse-assign and PQ-encode
  * against the frozen trained codebooks, appending codes (never
  * vectors) to the standing zone. Pinned statements:
  *
  *  1. probe over the drained codes zone ≡ the batch
  *     `sim_ann_ivfpq_trained` row-for-row (both passes are per-vector
  *     independent given the frozen codebooks, and the probe tail is
  *     SHARED code, not a reimplementation);
  *  2. the zone holds exactly PqM = 8 code rows per arriving vector,
  *     and only scalar columns — the 8-bytes-per-vector property on
  *     disk;
  *  3. re-draining the finished stream is a no-op (exactly-once
  *     growth).
  */
class StreamingIvfPqSpec extends SparkSpec {

  test("streamed IVF-PQ codes zone reproduces the batch probe; re-drain is a no-op") {
    val sfDir = sf0001
    val root = Files.createTempDirectory("graft-ivfpq-stream").toString
    val landing = s"$root/landing"
    val index = s"$root/index"

    graft.Tables.embeddings(spark, sfDir)
      .repartition(3)
      .write.parquet(landing)

    Similarity.ivfPqIndexStream(spark, sfDir, landing, index, s"$root/ckpt")
      .awaitTermination()

    // 1. probe over the streamed codes ≡ the batch composed query
    def probe(): Seq[Seq[Any]] =
      Similarity.ivfPqProbeFromIndex(spark, sfDir, index)
        .collect().toSeq.map(_.toSeq)
    val streamed = probe()
    val batch = Similarity.queries("sim_ann_ivfpq_trained")(spark, sfDir)
      .collect().toSeq.map(_.toSeq)
    assert(streamed.nonEmpty, "the drained codes zone must serve a non-empty probe")
    assert(streamed === batch)

    // 2. 8 code rows per vector, scalar columns only
    val nVecs = graft.Tables.embeddings(spark, sfDir).count()
    def codes() = spark.read.parquet(s"$index/codes")
    assert(codes().count() === 8L * nVecs)
    val arrayCols = codes().schema.fields
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    assert(arrayCols.isEmpty,
      s"the codes zone must hold scalars only: ${arrayCols.map(_.name).mkString(", ")}")

    // 3. re-drain idempotence
    Similarity.ivfPqIndexStream(spark, sfDir, landing, index, s"$root/ckpt")
      .awaitTermination()
    assert(codes().count() === 8L * nVecs, "re-drain must not grow the zone")
    assert(probe() === streamed, "re-drain must not change the probe")

    // 4. the full deployment loop closes: re-rank over ONLY standing
    // artifacts (streamed codes zone + cell-keyed vector zone) ≡ the
    // in-query zone re-rank ≡ the batch re-rank
    val fromIndexes = Similarity.rerankFromIndexes(spark, sfDir, index)
      .collect().toSeq.map(_.toSeq)
    val zoneQuery = Similarity.queries("sim_ann_ivfpq_rerank_zone")(spark, sfDir)
      .collect().toSeq.map(_.toSeq)
    val batchRerank = Similarity.queries("sim_ann_ivfpq_rerank")(spark, sfDir)
      .collect().toSeq.map(_.toSeq)
    assert(fromIndexes.nonEmpty)
    assert(fromIndexes === zoneQuery, "standing-artifact re-rank must equal the zone query")
    assert(fromIndexes === batchRerank, "standing-artifact re-rank must equal the batch re-rank")
  }
}
