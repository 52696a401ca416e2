package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental model-refresh contract ([[Unigram.refreshModelZone]])
  * on crafted corpora — what the oracled `text_unigram_refresh` (fold ≡
  * from-scratch rebuild at correctness SF) can't show:
  *
  *  1. exact fold ≡ rebuild on adversarial small corpora (batch words
  *     that are new, that collide with base words, and that shift the
  *     seed's top-k ranking);
  *  2. the epoch advances and the PRE-refresh model stays as-of-readable
  *     (serving reads are undisturbed while retraining lands);
  *  3. the fold's input is the standing word-count generation + the
  *     batch — by construction (the function never receives the base
  *     corpus), and the committed word-count generation equals the
  *     union's counts exactly (the sufficient-statistic claim).
  */
class UnigramRefreshSpec extends SparkSpec {

  private def docsOf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def freshRoot(): java.io.File = {
    val root = java.nio.file.Files.createTempDirectory("unigram_refresh").toFile
    root
  }

  /** Build an epoch-1 zone from `base` under `root` (the modelZoneFor
    * install, inlined so the test controls the root). */
  private def install(root: java.io.File, base: org.apache.spark.sql.DataFrame): Unit = {
    val zones = new java.io.File(root, "zones")
    val genC = new java.io.File(zones, "wordcounts_gen1").toPath
    graft.Fs.writeParquetAtomic(Unigram.wordCountsOf(base), genC)
    val (vocab, wordNp, release) =
      Unigram.trainFrames(spark.read.parquet(genC.toString))
    val genV = new java.io.File(zones, "vocab_gen1").toPath
    val genW = new java.io.File(zones, "wordnp_gen1").toPath
    graft.Fs.writeParquetAtomic(vocab, genV)
    graft.Fs.writeParquetAtomic(wordNp, genW)
    release()
    graft.sources.Maintenance.commitEpochManifest(spark,
      Seq((Unigram.VocabZone, genV.toString, "piece"),
        (Unigram.WordNpZone, genW.toString, "w"),
        (Unigram.WordCountZone, genC.toString, "w")),
      new java.io.File(root, "manifest").toPath, epoch = 1L)
  }

  private def zoneModel(root: java.io.File, asOf: Long = Long.MaxValue) = {
    val m = new java.io.File(root, "manifest")
    val vocab = graft.sources.Maintenance
      .readZoneThroughManifest(spark, m, Unigram.VocabZone, asOf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    val np = graft.sources.Maintenance
      .readZoneThroughManifest(spark, m, Unigram.WordNpZone, asOf)
      .collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("np"))).toSeq.sortBy(_._1)
    (vocab, np)
  }

  test("fold == rebuild exactly; old epoch stays readable; counts are the union's") {
    val base = docsOf("the cat sat on the mat", "the cats sat", "a minimal corpus")
    val batch = docsOf("concatenation matters here", "the the the mat mat",
      "zzz entirely new words zzz")
    val root = freshRoot()
    install(root, base)
    val before = zoneModel(root)

    val epoch = Unigram.refreshModelZone(spark, root, batch)
    assert(epoch === 2L)

    // 1. fold == from-scratch rebuild on base ∪ batch, exactly
    val (vRebuild, npRebuild) = Unigram.trainOver(Unigram.wordCountsOf(
      base.unionAll(batch)))
    val after = zoneModel(root)
    assert(after._1 === vRebuild.sortBy(_._1))
    assert(after._2 === npRebuild.map { case (w, _, np) => (w, np) }.sortBy(_._1))

    // 2. the pre-refresh model is untouched at as-of epoch 1
    assert(zoneModel(root, asOf = 1L) === before)

    // 3. the committed word-count generation IS the union's counts
    val zoneCounts = graft.sources.Maintenance.readZoneThroughManifest(
        spark, new java.io.File(root, "manifest"), Unigram.WordCountZone)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val unionCounts = Unigram.wordCountsOf(base.unionAll(batch))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(zoneCounts === unionCounts)

    // a second fold on top composes (epoch 3), still == rebuild of all three
    val batch2 = docsOf("the final wave")
    assert(Unigram.refreshModelZone(spark, root, batch2) === 3L)
    val (v3, _) = Unigram.trainOver(Unigram.wordCountsOf(
      base.unionAll(batch).unionAll(batch2)))
    assert(zoneModel(root)._1 === v3.sortBy(_._1))

    graft.Fs.deleteRecursively(root)
  }

  test("takedown cascade: subtract == rebuild on survivors; zeroed words vanish") {
    // doc 1 is the only carrier of 'unique' and one of two carriers of
    // 'shared' — removing it must drop 'unique' from the statistic
    // entirely and decrement 'shared', exactly as a from-scratch train
    // on the survivors would see
    val base = docsOf("common words common here", "unique shared text",
      "shared common tail")
    val removed = docsOf("unique shared text").withColumn("doc_id", lit(1L))
    val root = freshRoot()
    install(root, base)

    val epoch = Unigram.forgetModelZone(spark, root, removed)
    assert(epoch === 2L)

    val survivors = docsOf("common words common here", "shared common tail")
    val (vRebuild, npRebuild) = Unigram.trainOver(Unigram.wordCountsOf(survivors))
    val after = zoneModel(root)
    assert(after._1 === vRebuild.sortBy(_._1))
    assert(after._2 === npRebuild.map { case (w, _, np) => (w, np) }.sortBy(_._1))

    // the statistic carries no trace of the removed doc
    val zoneCounts = graft.sources.Maintenance.readZoneThroughManifest(
        spark, new java.io.File(root, "manifest"), Unigram.WordCountZone)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!zoneCounts.contains("unique") && !zoneCounts.contains("text"))
    assert(zoneCounts("shared") === 1L)
    // ...while the pre-takedown model stays as-of-readable (audit window)
    assert(zoneModel(root, asOf = 1L)._2.exists(_._1 == "unique"))

    graft.Fs.deleteRecursively(root)
  }
}
