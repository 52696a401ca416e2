package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The physical takedown cascade's contract, asserted at the filesystem:
  * only files containing deleted keys are rewritten; everything else is
  * carried BYTE-IDENTICAL (the "a takedown must not reprocess the other
  * 99.99%" claim made checkable); the result equals a filtered rebuild;
  * the install is marker-complete.
  */
class ForgetArtifactsSpec extends SparkSpec {

  private def sha(p: java.nio.file.Path): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString
  }

  private def mkArtifact(dir: java.io.File): Unit = {
    import spark.implicits._
    (0L until 1000L).toDF("k")
      .withColumn("payload", md5(col("k").cast("string")))
      .repartition(8, col("k"))
      .write.mode("overwrite").parquet(dir.toString)
  }

  test("rewrites only touched files; carries the rest byte-identical") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("forget_art").toFile
    val src = new java.io.File(root, "gen0"); mkArtifact(src)
    val delKeys = Seq(3L, 17L, 400L)
    val del = delKeys.toDF("k")
    // ground truth: which files hold those keys
    val expectedTouched = spark.read.parquet(src.toString)
      .select(col("k"), regexp_extract(input_file_name(), "[^/]+$", 0).as("f"))
      .filter(col("k").isin(delKeys: _*))
      .select("f").distinct().as[String].collect().toSet
    assert(expectedTouched.nonEmpty)
    val target = new java.io.File(root, "gen1").toPath
    val (installed, rewritten) =
      Maintenance.forgetArtifacts(spark, src.toString, "k", del, target)
    assert(installed == target.toString)
    assert(rewritten.toSet === expectedTouched)
    assert(java.nio.file.Files.exists(target.resolve("_SUCCESS")))
    // result ≡ filtered rebuild
    val got = spark.read.parquet(target.toString)
      .select("k", "payload").as[(Long, String)].collect().toSet
    val want = spark.read.parquet(src.toString)
      .filter(!col("k").isin(delKeys: _*))
      .select("k", "payload").as[(Long, String)].collect().toSet
    assert(got === want)
    // untouched originals present under the SAME name with the SAME bytes
    val untouched = Option(src.listFiles()).get
      .filter(f => f.getName.endsWith(".parquet") && !expectedTouched(f.getName))
    assert(untouched.nonEmpty)
    untouched.foreach { f =>
      val copied = target.resolve(f.getName)
      assert(java.nio.file.Files.exists(copied), s"missing carry: ${f.getName}")
      assert(sha(f.toPath) === sha(copied), s"carried file rewritten: ${f.getName}")
    }
    graft.Fs.deleteRecursively(root)
  }

  test("cascades the REAL band-signature index; equals one rebuilt from the filtered corpus") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("forget_band").toFile
    val docs = graft.Tables.documents(spark, sf0001)
    val del = graft.llm.Forget.deletedOf(docs)
    val gen0 = new java.io.File(root, "band_gen0")
    // the production artifact's rows (minhash band keys), range-split so
    // the delete set leaves some files untouched
    graft.llm.Dedup.bandRowsOf(graft.llm.Dedup.shingled(docs))
      .repartitionByRange(50, col("doc_id"))
      .write.parquet(gen0.toString)
    val target = new java.io.File(root, "band_gen1").toPath
    val (_, rewritten) =
      Maintenance.forgetArtifacts(spark, gen0.toString, "doc_id", del, target)
    assert(rewritten.nonEmpty && rewritten.size < 50,
      s"expected a partial rewrite, got ${rewritten.size} of 50 files")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "band", "band_key").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // minhash signatures are per-doc, so cascading rows out of the
    // standing index must equal rebuilding the index from the filtered
    // corpus — the artifact-level cascade ≡ rebuild statement
    val got = rows(spark.read.parquet(target.toString))
    val want = rows(graft.llm.Dedup.bandRowsOf(
      graft.llm.Dedup.shingled(docs.join(del, Seq("doc_id"), "left_anti"))))
    assert(got === want)
    graft.Fs.deleteRecursively(root)
  }

  test("a partitioned (non-flat) artifact is refused, not silently truncated") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("forget_art").toFile
    val src = new java.io.File(root, "gen0")
    (0L until 100L).toDF("k").withColumn("p", col("k") % 4)
      .write.partitionBy("p").parquet(src.toString)
    val target = new java.io.File(root, "gen1").toPath
    val e = intercept[IllegalArgumentException] {
      Maintenance.forgetArtifacts(spark, src.toString, "k", Seq(3L).toDF("k"), target)
    }
    assert(e.getMessage.contains("not a flat artifact"))
    assert(!java.nio.file.Files.exists(target), "no partial generation installed")
    graft.Fs.deleteRecursively(root)
  }

  test("the cascaded generation composes with the vacuum: old retired, new untouched") {
    import spark.implicits._
    val zone = java.nio.file.Files.createTempDirectory("forget_art").toFile
    val gen0 = new java.io.File(zone, "gen0"); mkArtifact(gen0)
    val gen1 = new java.io.File(zone, "gen1").toPath
    Maintenance.forgetArtifacts(spark, gen0.toString, "k", Seq(3L).toDF("k"), gen1)
    assert(gen0.setLastModified(gen1.toFile.lastModified() - 60000))
    val deleted = Maintenance.vacuumArtifacts(
      zone, live = Set("gen1"), keepN = 0)
    assert(deleted === Seq(gen0.getPath))
    assert(!gen0.exists())
    // the live cascaded generation stays complete and readable
    assert(java.nio.file.Files.exists(gen1.resolve("_SUCCESS")))
    assert(spark.read.parquet(gen1.toString).count() === 999L)
    graft.Fs.deleteRecursively(zone)
  }

  test("a delete set absent from the artifact rewrites nothing") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("forget_art").toFile
    val src = new java.io.File(root, "gen0"); mkArtifact(src)
    val target = new java.io.File(root, "gen1").toPath
    val (_, rewritten) = Maintenance.forgetArtifacts(
      spark, src.toString, "k", Seq(100000L).toDF("k"), target)
    assert(rewritten.isEmpty)
    val srcParts = Option(src.listFiles()).get
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    srcParts.foreach { f =>
      assert(sha(f.toPath) === sha(target.resolve(f.getName)))
    }
    assert(spark.read.parquet(target.toString).count() === 1000L)
    graft.Fs.deleteRecursively(root)
  }
}
