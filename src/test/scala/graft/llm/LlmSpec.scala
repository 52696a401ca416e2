package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("minhash candidates achieve full recall vs exact jaccard >= 0.8 pairs") {
    val exact = Dedup.dedupNgramJaccard(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.dedupMinhash(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-duplicates")
    assert(exact.subsetOf(mh),
      s"LSH missed ${exact -- mh} (recall ${(exact & mh).size}/${exact.size})")
  }

  test("minhash verified pairs all meet the jaccard threshold") {
    val jaccs = Dedup.dedupMinhash(spark, sf0001).select("jacc").collect().map(_.getDouble(0))
    assert(jaccs.forall(_ >= 0.5))
  }

  test("indexed incremental dedup equals the recompute-everything form") {
    val rec = Dedup.dedupIncremental(spark, sf0001).collect().map(_.toString).toSeq
    val idx = Dedup.dedupIncrementalIndexed(spark, sf0001).collect().map(_.toString).toSeq
    assert(idx === rec)
    assert(rec.nonEmpty, "corpus should contain cross-wave near-duplicates")
  }

  test("LSH sweep's 4x4 row agrees with the recall report's totals") {
    // the sweep counts truth ∩ candidates; the recall report counts truth
    // pairs among VERIFIED pairs — identical sets, because a truth pair
    // (J ≥ 0.5 by definition) that becomes a candidate always survives
    // the J ≥ 0.5 verification
    val sweep = Dedup.dedupLshSweep(spark, sf0001)
      .filter(col("bands") === 4).collect()
    assert(sweep.length === 1)
    val (nTrue, nHit) = (sweep(0).getAs[Long]("n_true"), sweep(0).getAs[Long]("n_hit"))
    val recall = Dedup.dedupLshRecall(spark, sf0001)
      .agg(sum("n_true"), sum("n_found")).collect()(0)
    assert(nTrue === recall.getLong(0))
    assert(nHit === recall.getLong(1))
    // candidate volume must be monotone as bands narrow: 16 one-row bands
    // can only add candidate pairs relative to wider rows ORed less often
    val byBands = Dedup.dedupLshSweep(spark, sf0001).collect()
      .map(r => r.getAs[Int]("bands") -> r.getAs[Long]("n_cand")).toMap
    assert(byBands(1) <= byBands(16),
      "strictest config exceeded the loosest in candidates")
  }

  test("identical texts get identical simhash; disjoint vocab differs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark window join filter", "en"),
      (2L, "spark window join filter", "en"),
      (3L, "zebra quark velvet osmium", "en"),
    ).toDF("doc_id", "text", "lang")
    val byId = Dedup.simhashOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) === byId(2L))
    assert(byId(1L) !== byId(3L))
  }

  test("dedup spans: hand-derived merged intervals on a crafted corpus") {
    import spark.implicits._
    // doc 1 repeats an 8-gram INSIDE itself at positions 1 and 12
    //   -> two non-adjacent spans [1,8] and [12,19]
    // docs 2 and 3 share a 9-word prefix -> their sliding grams at
    //   positions 1 AND 2 are both duplicated -> overlap-merged [1,9]
    // doc 4 shares nothing -> no rows
    val docs = Seq(
      (1L, "a b c d e f g h x y z a b c d e f g h q"),
      (2L, "m n o p q r s t u alpha beta gamma delta eps zeta"),
      (3L, "m n o p q r s t u one two three four five six"),
      (4L, "totally unrelated words that repeat nothing eightfold anywhere at all"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupSpansOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, 1L, 8L, 8L), (1L, 12L, 19L, 8L),
      (2L, 1L, 9L, 9L), (3L, 1L, 9L, 9L)))
  }

  test("dedup mask applies the spans: hand-derived kept words and digests") {
    import spark.implicits._
    val d4 = "totally unrelated words that repeat nothing eightfold anywhere at all"
    val docs = Seq(
      (1L, "a b c d e f g h x y z a b c d e f g h q"),
      (2L, "m n o p q r s t u alpha beta gamma delta eps zeta"),
      (3L, "m n o p q r s t u one two three four five six"),
      (4L, d4)).toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val got = Dedup.dedupMaskOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
    assert(got === Seq(
      (1L, 20L, 4L, 16L, md5hex("x y z q")),
      (2L, 15L, 6L, 9L, md5hex("alpha beta gamma delta eps zeta")),
      (3L, 15L, 6L, 9L, md5hex("one two three four five six")),
      (4L, 10L, 10L, 0L, md5hex(d4))))
  }

  test("dedup spans on the corpus: spans are disjoint, merged, and in-bounds") {
    val rows = Dedup.dedupSpans(spark, sf0001).collect()
    assert(rows.nonEmpty, "corpus should contain duplicated 8-grams")
    rows.groupBy(_.getLong(0)).foreach { case (id, spans) =>
      val sorted = spans.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      sorted.foreach { case (s, e) => assert(s >= 1 && e >= s + 7) }
      // merged means consecutive spans have a gap of at least 2 words
      sorted.zip(sorted.tail).foreach { case ((_, e1), (s2, _)) =>
        assert(s2 > e1 + 1, s"doc $id: spans [$e1] and [$s2] should have merged")
      }
    }
  }

  test("CDC chunking realigns after an insertion where fixed blocks cannot") {
    import spark.implicits._
    // deterministic 64-word doc; doc 2 = same text with ONE word prepended
    val base = (1 to 64).map(i => s"w${i * 7 % 97}").mkString(" ")
    val docs = Seq((1L, base), (2L, s"inserted $base")).toDF("doc_id", "text")
    val got = Dedup.dedupCdcChunksOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(5))).toMap
    // content-defined boundaries re-anchor after the first post-edit
    // boundary: a majority of each doc's words dedup against the other
    got.foreach { case (id, (nChunks, dupChunks, dupPpm)) =>
      assert(nChunks >= 2, s"doc $id: expected multiple chunks")
      assert(dupChunks >= 1, s"doc $id: expected shared chunks after realign")
      assert(dupPpm > 500000L, s"doc $id: expected majority dup mass, got $dupPpm ppm")
    }
    // the fixed-offset strategy on the same pair shares NOTHING: every
    // 16-word block of doc 2 is shifted by one
    val blocks = docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"),
        (col("pos").cast("long") / 16).cast("long").as("b"), col("col").as("w"))
      .groupBy("doc_id", "b")
      .agg(md5(concat_ws(" ",
        expr("transform(array_sort(collect_list(struct(pos, w))), s -> s.w)"))).as("h"))
    val byDoc = blocks.collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getString(2)).toSet }
    assert((byDoc(1L) & byDoc(2L)).isEmpty, "fixed blocks must all shift and miss")
  }

  test("CDC chunks partition every document exactly") {
    val rows = Dedup.dedupCdcChunks(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val wordCounts = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) === wordCounts(r.getLong(0)),
        s"doc ${r.getLong(0)}: chunks must cover every word exactly once")
      assert(r.getLong(1) >= 1L)
    }
  }

  test("exact dedup keeps min doc_id per content hash") {
    import spark.implicits._
    val out = Seq((5L, "xx"), (2L, "xx"), (9L, "yy"))
      .toDF("doc_id", "text")
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
      .orderBy("keep").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 9L))
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 1L))
  }
}

class SimilaritySpec extends SparkSpec {

  test("top-1 neighbor of a vector's duplicate is that duplicate (cos=1)") {
    val top = Similarity.simCosineTopk(spark, sf0001).collect()
    // every query's neighbors are sorted by cosine desc
    val byQ = top.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      val coss = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(coss.sorted.reverse.toSeq === coss.toSeq)
    }
    assert(byQ.size === Similarity.NQueries)
  }

  test("IVF results are a subset of brute-force candidates per query cluster") {
    val ivf = Similarity.simAnnIvf(spark, sf0001).collect()
    assert(ivf.nonEmpty)
    // rn dense from 1 within each query
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to rows.length).toSeq)
    }
  }

  test("hard negatives: driver brute-force mirror agrees on picks and margins") {
    val embs = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "transform(embedding, x -> cast(x as double)) AS e")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expect = embs.filter(_._1 < Similarity.NQueries).sortBy(_._1).flatMap {
      case (qid, qlab, qe) =>
        val scored = embs.filter(_._1 != qid)
          .map { case (cid, clab, ce) => (cid, clab, r6(cos(qe, ce))) }
        val posCos = scored.filter(_._2 == qlab)
          .sortBy { case (cid, _, c) => (-c, cid) }.head._3
        scored.filter(_._2 != qlab)
          .sortBy { case (cid, _, c) => (-c, cid) }.take(3).zipWithIndex
          .map { case ((cid, clab, c), i) =>
            (qid, qlab, i + 1, cid, clab, c, posCos, posCos - c) }
    }.toSeq
    val got = Similarity.simHardNegatives(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4),
        BigDecimal(r.getDouble(5)).setScale(6),
        BigDecimal(r.getDouble(6)).setScale(6),
        BigDecimal(r.getDecimal(7)).setScale(6))
    }.toSeq
    assert(got === expect)
    // every mined negative really is cross-label and ranked correctly
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).toSeq)
      val cs = rows.sortBy(_._3).map(_._6)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("matryoshka fidelity matches a driver brute-force mirror exactly") {
    val embs = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double], m: Int): BigDecimal = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < m) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    def top3(qid: Long, qe: Array[Double], m: Int): Seq[Long] =
      embs.filter(_._1 != qid)
        .map { case (cid, ce) => (cid, cos(qe, ce, m)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(3).map(_._1).toSeq
    val expect = embs.filter(_._1 < Similarity.NQueries).sortBy(_._1).flatMap {
      case (qid, qe) =>
        val full = top3(qid, qe, 64)
        Seq(8, 16, 32).map { m =>
          val t = top3(qid, qe, m)
          (qid, m, t.count(full.contains).toLong, t.head == full.head)
        }
    }.toSeq
    val got = Similarity.simMatryoshka(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got === expect)
    // fidelity must be monotone-ish: 32 dims can't do worse than 8 on avg
    val byDim = got.groupBy(_._2).map { case (m, rs) => m -> rs.map(_._3).sum }
    assert(byDim(32) >= byDim(8))
  }

  test("kmeans elbow inertia is monotone non-increasing in k and mirrors brute force") {
    val embs = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def micro(c: Double): Long =
      (BigDecimal(1 - c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * 1000000).toLongExact
    val expect = Seq(2, 4, 8).map { k =>
      val cents = embs.filter(_._1 < k).map(_._2)
      val as = embs.map { case (_, e) => micro(cents.map(c => cos(e, c)).max) }
      (k, embs.length.toLong, as.sum, as.sum / embs.length)
    }
    val got = Similarity.embKmeansElbow(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
    val inertias = got.map(_._3)
    assert(inertias.zip(inertias.tail).forall { case (a, b) => a >= b },
      "more centroids can never increase inertia")
  }

  test("centroid silhouette matches a driver-side brute-force mirror exactly") {
    // independent recomputation with plain Scala doubles — same sequential
    // fold order as the native cosine expression, so values (not just
    // properties) must agree bit-for-bit after the shared 6dp grid
    val embs = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS e")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def micro(c: Double): Long =
      (BigDecimal(1 - c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * 1000000).toLongExact
    val cents = embs.filter(_._1 < Similarity.NCentroids)
    val per = embs.map { case (_, e) =>
      val ranked = cents.map { case (cid, cv) => (cos(e, cv), cid) }
        .sortBy { case (c, cid) => (-c, cid) }
      val (a, b) = (micro(ranked(0)._1), micro(ranked(1)._1))
      val sil = if (b == 0) 0L else (b - a) * 1000000L / b
      (ranked(0)._2, sil)
    }
    val expect = per.groupBy(_._1).map { case (cl, ss) =>
      val sils = ss.map(_._2)
      (cl, ss.length.toLong, sils.sum / sils.length, sils.min, sils.max)
    }.toSeq.sortBy(_._1)
    val got = Similarity.embSilhouette(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === expect)
    got.foreach { case (_, _, mean, mn, mx) =>
      assert(mn >= 0 && mx <= 1000000L && mn <= mean && mean <= mx)
    }
  }
}

/** The LSH dedup variant against its own brute-force truth: subset +
  * measured recall. The recall floor encodes the 63°-threshold geometry
  * documented on `dedupEmbeddingLsh` (≈0.43 expected; the corpus draws
  * 0.5-0.6 at sf0.001) — NOT a production near-dup number, where the same
  * index recalls ≈0.9 at cos ≥ 0.9.
  */
class EmbeddingDedupLshSpec extends SparkSpec {

  test("LSH pairs are a subset of exact pairs with the documented recall") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.dedupEmbedding(spark, sf0001))
    val lsh = pairs(Similarity.dedupEmbeddingLsh(spark, sf0001))
    assert(lsh.subsetOf(exact), s"LSH found non-pairs: ${lsh.diff(exact)}")
    assert(exact.nonEmpty && lsh.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall below the Hamming<=2 floor at cos 0.45")
  }
}

class TextAnalysisSpec extends SparkSpec {

  test("token counts on a crafted document") {
    import spark.implicits._
    val df = Seq((1L, "the cat, sat!", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = df.select(
      size(split(col("text"), " ")).as("ws"),
      regexp_count(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]")).as("tok"))
      .head()
    assert(r.getInt(0) === 3)      // the | cat, | sat!
    assert(r.getInt(1) === 5)      // the, cat, ',', sat, '!'
  }

  test("fingerprint is order-sensitive") {
    val fp = TextAnalysis.fingerprint(spark, sf0001)
      .select("doc_id", "fp_min", "n_grams").collect()
    assert(fp.length === 500)
    assert(fp.forall(!_.isNullAt(1)))
  }

  test("lang-id is deterministic and covers every doc") {
    val out = TextAnalysis.langId(spark, sf0001).collect()
    assert(out.length === 500)
    val preds = out.map(_.getString(2)).distinct
    assert(preds.forall(p => Set("en", "de", "fr", "es", "zh", "und").contains(p)))
  }
}

class MultimodalSpec extends SparkSpec {

  test("stub decode is deterministic and batched per partition") {
    val d1 = Multimodal.decodeAll(spark, sf0001).collect().sortBy(_.id)
    val d2 = Multimodal.decodeAll(spark, sf0001).collect().sortBy(_.id)
    assert(d1.toSeq === d2.toSeq)
    assert(d1.forall(m => m.width >= 16 && m.width <= 1920))
    assert(d1.forall(m => m.byte_len > 0))
  }

  test("resize fits within bounds, preserves aspect, never upscales") {
    import spark.implicits._
    val decoded = Multimodal.decodeAll(spark, sf0001).toDF()
    val resized = Multimodal.resizePlan(decoded, maxW = 640, maxH = 480).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val (w, h, ow, oh, s) = (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getDouble(6))
      assert(ow <= 640 && oh <= 480, s"out of bounds: ${ow}x$oh")
      assert(s <= 1.0, "must never upscale")
      // aspect preserved within floor-rounding: each ratio is within 1/dim
      // of the true scale, so their gap is bounded by 1/min(w,h)
      assert(math.abs(ow.toDouble / w - oh.toDouble / h) <= 1.0 / math.min(w, h) + 1e-9)
      if (w <= 640 && h <= 480) assert(ow === w && oh === h)
    }
  }

  test("PNG decode is REAL: javax.imageio round-trip returns the generating raster exactly") {
    val rows = Multimodal.mmPngDecode(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val (ew, eh) = Multimodal.rasterDims(id)
      assert((w, h) === ((ew, eh)), s"decoded dims for id=$id")
      // decoded gray sum equals the generator's arithmetic — PNG lossless
      val expectSum = (0 until ew * eh).map(i =>
        Multimodal.rasterPixel(id, i % ew, i / ew).toLong).sum
      assert(r.getLong(4) === expectSum, s"sum_gray for id=$id")
    }
  }

  test("WAV decode is REAL: javax.sound round-trip returns the generating PCM exactly") {
    val rows = Multimodal.mmWavDecode(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val samples = Multimodal.wavSamples(id)
      assert(r.getInt(1) === 8000)
      assert(r.getInt(2) === samples.length, s"n_samples for id=$id")
      assert(r.getLong(3) === samples.map(s => math.abs(s.toInt).toLong).sum)
      assert(r.getInt(4) === samples.map(s => math.abs(s.toInt)).max)
    }
  }

  test("AVI container round-trip is exact, incl. stride padding and bottom-up rows") {
    // Direct writer/parser round-trip on crafted frames — every byte
    // position distinct, so a padding or row-order mistake can't cancel.
    val (w, h) = (6, 4) // stride 20 != 18 raw bytes: padding exercised
    val frames = Array.tabulate(3)(f =>
      Array.tabulate(w * h * 3)(i => ((f * 89 + i * 7) % 256).toByte))
    val bytes = AviContainer.encode(w, h, 40000L, frames)
    // genuinely a RIFF/AVI file, not a private blob
    assert(new String(bytes, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") === "AVI ")
    val v = AviContainer.decode(bytes)
    assert(v.width === w && v.height === h)
    assert(v.nFrames === 3 && v.fps === 25 && v.durationMs === 120L)
    (0 until 3).foreach(f => assert(v.frames(f).toSeq === frames(f).toSeq))
  }

  test("AVI parser fails loudly on malformed payloads") {
    val good = AviContainer.encode(6, 4, 40000L,
      Array(Array.fill(6 * 4 * 3)(1.toByte)))
    // truncation mid-movi
    intercept[Exception] {
      AviContainer.decode(java.util.Arrays.copyOf(good, good.length - 10))
    }
    // frame-count lie: avih.dwTotalFrames is at offset 12(RIFF)+12(LIST)+8+16
    val lied = good.clone()
    lied(12 + 12 + 8 + 16) = 7
    intercept[Exception] { AviContainer.decode(lied) }
    // not RIFF at all
    intercept[Exception] {
      AviContainer.decode("not an avi at all, sorry".getBytes)
    }
  }

  test("AVI decode is REAL: container parse returns the generating frames exactly") {
    val rows = Multimodal.mmAviDecode(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val nf = Multimodal.aviFrameCount(id)
      assert(r.getLong(1) === nf.toLong, s"n_frames for id=$id")
      assert(r.getInt(2) === 6 && r.getInt(3) === 4 && r.getInt(4) === 25)
      assert(r.getLong(5) === nf * 40L, s"duration_ms for id=$id")
      // independent recomputation of both checksums from the generator
      var sum = 0L; var check = 0L; var idx = 0L
      for (f <- 0 until nf; y <- 0 until 4; x <- 0 until 6; c <- 0 until 3) {
        val v = Multimodal.aviPixel(id, f, x, y, c)
        sum += v; idx += 1; check += v * idx
      }
      assert(r.getLong(6) === sum, s"px_sum for id=$id")
      assert(r.getLong(7) === check, s"px_check for id=$id")
    }
  }

  test("frame sampling emits ceil(duration/step) frames per video row") {
    import spark.implicits._
    val decoded = Multimodal.decodeAll(spark, sf0001).toDF()
    val frames = Multimodal.frameSample(decoded, everyMs = 5000L)
    val nVideos = decoded.filter(col("modality") === "video").count()
    assert(frames.select("id").distinct().count() === nVideos)
    // frame numbers start at 0 and are dense
    val one = frames.filter(col("id") === frames.select(min("id")).head().getLong(0))
      .select("frame_no").collect().map(_.getLong(0)).sorted
    assert(one.headOption.contains(0L))
    assert(one.toSeq === (0L until one.length).toSeq)
  }
}
