package graft.llm

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** `sim_index_footprint` states the compression LOGICALLY (bits/vector
  * off the deterministic encode); this spec proves the ordering holds
  * PHYSICALLY — on-disk parquet bytes of the three zones, with the
  * codes zone built by the real streamed ingestion
  * (`Similarity.ivfPqIndexStream`) and accounted per generation off the
  * artifact listing. Consolidated single-file copies carry the
  * physical comparison so parquet footer overhead at test scale can't
  * invert the statement the way 32 small files per generation could.
  */
class IndexFootprintSpec extends SparkSpec {

  private def bytesUnder(dir: java.io.File): Long =
    if (!dir.exists) 0L
    else dir.listFiles.map { f =>
      if (f.isDirectory) bytesUnder(f)
      else if (f.getName.endsWith(".parquet")) f.length
      else 0L
    }.sum

  test("footprint ordering holds physically: codes < int8 < fp64 on disk, per generation") {
    val sfDir = sf0001
    val root = Files.createTempDirectory("graft-footprint").toString
    val landing = s"$root/landing"
    val index = s"$root/index"
    val emb = graft.Tables.embeddings(spark, sfDir)
    val nVec = emb.count()
    emb.repartition(3).write.parquet(landing)
    Similarity.ivfPqIndexStream(spark, sfDir, landing, index, s"$root/ckpt")
      .awaitTermination()

    // per-generation accounting off the artifact listing: one batch=N
    // generation per landed file, each non-empty
    val gens = new java.io.File(s"$index/codes").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(gens.length === 3, gens.map(_.getName).toSeq.toString)
    gens.foreach(g => assert(bytesUnder(g) > 0L, s"empty generation ${g.getName}"))

    // consolidated single-file zones for the physical comparison
    val e = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    e.coalesce(1).write.parquet(s"$root/fp64")
    e.withColumn("scale",
        (lit(127.0) / array_max(expr("transform(e, x -> abs(x))"))).cast("float"))
      .select(col("vec_id"), col("scale"),
        expr("transform(e, x -> CAST(floor(x * scale) AS TINYINT))").as("q8"))
      .coalesce(1).write.parquet(s"$root/int8")
    spark.read.parquet(s"$index/codes")
      .coalesce(1).write.parquet(s"$root/codes1")
    val fp = bytesUnder(new java.io.File(s"$root/fp64"))
    val i8 = bytesUnder(new java.io.File(s"$root/int8"))
    val cd = bytesUnder(new java.io.File(s"$root/codes1"))
    assert(cd < i8 && i8 < fp,
      s"physical ordering violated: codes=$cd int8=$i8 fp64=$fp")

    // the logical table agrees: same tiers, counted rows, ratio order
    val rows = Similarity.queries("sim_index_footprint")(spark, sfDir)
      .collect().map(r => r.getAs[String]("tier") -> r).toMap
    assert(rows.keySet === Set("fp64", "int8_sym", "ivfpq_codes"))
    rows.values.foreach(r => assert(r.getAs[Long]("n_vectors") === nVec))
    assert(rows("fp64").getAs[Long]("rows_stored") === nVec)
    assert(rows("ivfpq_codes").getAs[Long]("rows_stored") === 8L * nVec,
      "the PQ tier's stored rows must be counted off the actual encode")
    val ratios = Seq("fp64", "int8_sym", "ivfpq_codes")
      .map(t => rows(t).getAs[Long]("ratio_ppm"))
    assert(ratios === ratios.sorted.reverse && ratios.distinct.length === 3,
      s"logical ratios must strictly fall across tiers: $ratios")
  }
}
