package graft.llm

import graft.SparkSpec
import graft.sources.Maintenance
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten for the ANN standing zones: a takedown of
  * vector ids must cascade into BOTH halves of the IVF-PQ deployment —
  * the streamed codes zone (per-generation, file-incremental) and the
  * cell-keyed vector zone — through one manifested epoch, after which
  * probes resolve the post-delete generations and never see a deleted
  * vector. Because the encode is per-vector independent given the
  * FROZEN codebooks, the cascaded zones must equal a re-encode of the
  * survivors against the same codebooks EXACTLY (set identity, not
  * statistics) — the `sim_ann_ivf_append` closure argument, run in
  * reverse.
  */
class AnnForgetSpec extends SparkSpec {

  test("a takedown cascades into codes + vector zones; the epoch flips atomically") {
    import spark.implicits._
    val sfDir = sf0001
    val root = java.nio.file.Files.createTempDirectory("ann_forget").toFile
    val landing = s"$root/landing"
    val index = s"$root/index"
    val emb = graft.Tables.embeddings(spark, sfDir)

    // the two standing zones: streamed codes (3 generations) + a
    // cell-keyed vector zone built beside them for this corpus
    emb.repartition(3).write.parquet(landing)
    Similarity.ivfPqIndexStream(spark, sfDir, landing, index, s"$root/ckpt")
      .awaitTermination()
    val vzonePath = Similarity.materializedVectorZoneForSpec(spark, sfDir)

    // the pre-takedown production re-rank (memo-resolved zone): its
    // served cand_ids seed the delete set below, so the manifest-read
    // assertion at the bottom is guaranteed to bite
    val baseRerank = Similarity.rerankFromIndexes(spark, sfDir, index).collect()
    val servedIds = baseRerank.map(_.getAs[Long]("cand_id"))
      .filter(_ >= 100).toSet
    assert(servedIds.nonEmpty,
      "need at least one served candidate id >= 100 to seed the delete set")

    // delete set: clear of the query ids (< NQueries) and the codebook
    // seeds (< 16), so frozen artifacts and probes stay well-defined;
    // seeded with ids the re-rank SERVES so a fetch that ignores the
    // epoch is observable in the output
    val del = emb.select(col("vec_id"))
      .filter(col("vec_id") >= 100 &&
        (col("vec_id") % 23 === 7 || col("vec_id").isin(servedIds.toSeq: _*)))
    val delIds = del.as[Long].collect().toSet
    assert(delIds.nonEmpty)
    val queue = s"$root/tombstones"
    // the tombstone queue's column is doc_id by the epoch contract;
    // each zone renames it onto its own key
    delIds.toSeq.toDF("doc_id").write.parquet(s"$queue/batch=0")

    // cascade: each codes generation is a flat artifact (the zone is
    // partitioned by batch, so it cascades per generation directory —
    // the forgetArtifacts contract), plus the vector zone
    val gens = Option(new java.io.File(s"$index/codes").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .sortBy(_.getName)
    assert(gens.length === 3)
    val vzone = new java.io.File(vzonePath)
    val artifacts =
      gens.zipWithIndex.map { case (g, i) =>
        (s"codes/${g.getName}", g.getPath, "cand_id",
          new java.io.File(root, s"codes_gen1_$i").toPath)
      }.toSeq :+
        (("vectors", vzone.getPath, "vec_id",
          new java.io.File(root, "vectors_gen1").toPath))
    val manifest = new java.io.File(root, "manifest")
    Maintenance.hardDeleteEpochManifested(spark, queue, artifacts,
      new java.io.File(root, "tomb_epoch1").toPath, manifest.toPath, epoch = 1L)

    val (e1, zones) = Maintenance.currentEpoch(spark, manifest).get
    assert(e1 === 1L && zones.keySet ===
      (gens.indices.map(i => s"codes/batch=$i").toSet + "vectors"))

    // the cascaded codes zone == re-encode of the SURVIVORS against the
    // same frozen codebooks (set identity) — and no deleted id anywhere
    def codeRows(df: org.apache.spark.sql.DataFrame) =
      df.select("cluster", "cand_id", "s", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    val cascaded = zones.filter(_._1.startsWith("codes/")).values
      .map(p => spark.read.parquet(p)).reduce(_ unionByName _)
    val cascadedRows = codeRows(cascaded)
    val originalRows = codeRows(spark.read.parquet(s"$index/codes"))
    assert(cascadedRows ===
      originalRows.filterNot { case (_, id, _, _) => delIds(id) },
      "cascaded codes must be exactly the survivors' original rows")
    assert(cascadedRows.forall { case (_, id, _, _) => !delIds(id) })

    // vector zone: survivors only, still cell-keyed and probe-servable
    val vz = Maintenance.readZoneThroughManifest(spark, manifest, "vectors")
    assert(vz.filter(col("vec_id").isin(delIds.toSeq: _*)).count() === 0L)
    assert(vz.count() === emb.count() - delIds.size)

    // the probe over the cascaded codes serves results from survivors
    // only (same shared probe tail as production)
    val probed = Similarity.ivfPqProbeFromIndex(spark, sfDir,
        // point the reader at a codes dir assembled from the manifest
        { val post = new java.io.File(root, "post_index/codes")
          post.mkdirs()
          zones.filter(_._1.startsWith("codes/")).foreach { case (name, gen) =>
            java.nio.file.Files.createSymbolicLink(
              new java.io.File(post, name.stripPrefix("codes/")).toPath,
              java.nio.file.Paths.get(gen))
          }
          s"$root/post_index" })
      .collect()
    assert(probed.nonEmpty)
    assert(probed.forall(r => !delIds(r.getAs[Long]("cand_id"))),
      "the probe must never return a deleted vector")

    // the RE-RANK fetch through the manifest (advisor-caught gap: the
    // memo-resolved fetch ignores epochs, so deleted vectors stayed
    // fetchable). Worst case on purpose: STALE codes (the pre-delete
    // index) still shortlist the deleted ids — every one was seeded
    // from baseRerank's served rows — so only the manifest-resolved
    // fp64 zone stands between a takedown and serving deleted content.
    val rerankManifested = Similarity.rerankFromIndexes(
      spark, sfDir, index, Some(manifest)).collect()
    assert(rerankManifested.nonEmpty)
    assert(rerankManifested.forall(r => !delIds(r.getAs[Long]("cand_id"))),
      "the manifest-resolved re-rank fetch must never serve a deleted vector")
    // ...and the memo path WOULD have served them (the seeded rows), so
    // the assertion above is load-bearing, not vacuous
    assert(baseRerank.exists(r => delIds(r.getAs[Long]("cand_id"))))

    // EPOCH TIME TRAVEL on the ANN zones: a SECOND takedown epoch deletes
    // ids the epoch-1 re-rank still serves; the current read must drop
    // them, and the as-of-epoch-1 read must reproduce the epoch-1 wave
    // EXACTLY — the rollback the keep-N retention window exists for
    val del2 = rerankManifested.map(_.getAs[Long]("cand_id"))
      .filter(_ >= 100).toSet
    assert(del2.nonEmpty, "epoch-1 re-rank must serve some id >= 100")
    val queue2 = s"$root/tombstones2"
    del2.toSeq.toDF("doc_id").write.parquet(s"$queue2/batch=0")
    val artifacts2 = zones.toSeq.sortBy(_._1).map { case (name, gen) =>
      val key = if (name == "vectors") "vec_id" else "cand_id"
      (name, gen, key,
        new java.io.File(root, s"${name.replace('/', '_')}_gen2").toPath)
    }
    Maintenance.hardDeleteEpochManifested(spark, queue2, artifacts2,
      new java.io.File(root, "tomb_epoch2").toPath, manifest.toPath, epoch = 2L)
    val cur = Similarity.rerankFromIndexes(
      spark, sfDir, index, Some(manifest)).collect()
    assert(cur.forall { r =>
      val id = r.getAs[Long]("cand_id"); !del2(id) && !delIds(id) })
    val rollback = Similarity.rerankFromIndexes(
      spark, sfDir, index, Some(manifest), asOfEpoch = 1L).collect()
    assert(rollback.map(_.toSeq).toSet ===
        rerankManifested.map(_.toSeq).toSet,
      "the as-of-epoch-1 re-rank must reproduce the epoch-1 wave exactly")
    assert(rollback.exists(r => del2(r.getAs[Long]("cand_id"))),
      "the rollback read must still serve the epoch-2-deleted ids")

    graft.Fs.deleteRecursively(root)
  }
}
