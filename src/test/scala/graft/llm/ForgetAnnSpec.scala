package graft.llm

import graft.SparkSpec
import graft.sources.Maintenance
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The takedown cascade on the EMBEDDING modality: vec_id tombstones
  * propagated file-incrementally through the streamed IVF-PQ codes zone
  * (per batch-generation directory — each `batch=<id>` dir is a flat
  * artifact, exactly the granularity `forgetArtifacts`' flat-only
  * contract prescribes). Pinned statements:
  *
  *  1. the cascaded zone's rows ≡ a zone rebuilt by streaming only the
  *     surviving vectors (assign+encode are per-vector given the frozen
  *     codebooks, so filter ≡ rebuild);
  *  2. the PROBE over the cascaded zone ≡ the probe over the rebuilt
  *     zone — deleted vectors leave the candidate lists and previously
  *     shadowed neighbors surface, identically on both paths (the
  *     user-visible cascade ≡ rebuild statement);
  *  3. the cascade rewrote only the batch files containing deleted ids.
  */
class ForgetAnnSpec extends SparkSpec {

  test("vec tombstones cascade through the IVF-PQ codes zone; probe equals rebuild") {
    import spark.implicits._
    val sfDir = sf0001
    val root = Files.createTempDirectory("graft-forget-ann").toString

    val emb = graft.Tables.embeddings(spark, sfDir)

    def drain(landing: String, index: String, ckpt: String): Unit =
      Similarity.ivfPqIndexStream(spark, sfDir, landing, index, ckpt)
        .awaitTermination()

    // full stream → standing zone
    val landingAll = s"$root/landing_all"
    emb.repartition(3).write.parquet(landingAll)
    val indexAll = s"$root/index_all"
    drain(landingAll, indexAll, s"$root/ckpt_all")

    // delete NON-query, NON-codebook-seed vectors (the frozen registry
    // artifacts train on the CORPUS — a standing input both paths
    // share — and the probe set must be identical across paths), all
    // drawn from ONE batch generation so the cascade must carry the
    // other generations' files untouched
    val delIds = spark.read.parquet(s"$indexAll/codes/batch=0")
      .select("cand_id").distinct().as[Long].collect()
      .filter(id => id >= 100 && id % 3 == 1).toSet
    assert(delIds.nonEmpty)
    val del = delIds.toSeq.toDF("vec_id")

    // cascade: per batch-generation dir, file-incremental rewrite
    val codesDir = new java.io.File(s"$indexAll/codes")
    val cascaded = s"$root/index_cascaded"
    var rewrote = 0
    var totalParts = 0
    Option(codesDir.listFiles()).get
      .filter(d => d.isDirectory && d.getName.startsWith("batch=")).foreach { bd =>
        totalParts += Option(bd.listFiles()).get
          .count(f => f.isFile && f.getName.endsWith(".parquet"))
        val (_, rw) = Maintenance.forgetArtifacts(
          spark, bd.toString, "cand_id", del.withColumnRenamed("vec_id", "cand_id"),
          java.nio.file.Paths.get(s"$cascaded/codes/${bd.getName}"))
        rewrote += rw.length
      }
    assert(rewrote > 0, "the delete set must touch the zone")
    // 3. file-incrementality, the "only" half: some part files carried
    assert(rewrote < totalParts,
      s"every part file was rewritten ($rewrote of $totalParts) — the cascade lost its incrementality")

    // rebuild: stream only the survivors
    val landingSurv = s"$root/landing_surv"
    emb.join(del, Seq("vec_id"), "left_anti")
      .repartition(3).write.parquet(landingSurv)
    val indexSurv = s"$root/index_surv"
    drain(landingSurv, indexSurv, s"$root/ckpt_surv")

    // 1. zone rows ≡ rebuilt zone rows
    def zoneRows(index: String) = spark.read.parquet(s"$index/codes")
      .select("cand_id", "cluster", "s", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(zoneRows(cascaded) === zoneRows(indexSurv))

    // 2. probe ≡ probe; deleted ids gone from the candidates
    def probeRows(index: String) = Similarity
      .ivfPqProbeFromIndex(spark, sfDir, index).collect().toSeq.map(_.toSeq)
    val pc = probeRows(cascaded)
    assert(pc.nonEmpty && pc === probeRows(indexSurv))
    val candIdx = Similarity.ivfPqProbeFromIndex(spark, sfDir, cascaded)
      .schema.fieldIndex("cand_id")
    assert(pc.forall(r => !delIds.contains(r(candIdx).asInstanceOf[Long])))

    graft.Fs.deleteRecursively(new java.io.File(root))
  }
}
