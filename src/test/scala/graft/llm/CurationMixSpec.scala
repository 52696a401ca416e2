package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Invariants of the round-8 curation/mix additions that the DuckDB
  * oracles (which re-derive every value) do not state as PROPERTIES:
  * soft-dedup's unit-cluster-mass normalization, RRF's fused-score
  * arithmetic, and the anneal schedule's budget identity.
  */
class CurationMixSpec extends SparkSpec {

  test("dedup_soft_weight: every near-dup cluster is normalized to unit sampling mass (integer-div loss < csize)") {
    import org.apache.spark.sql.expressions.Window
    val cl = Dedup.dedupClusters(spark, sf0001)
      .withColumn("csize", count(lit(1)).over(Window.partitionBy("cluster")))
      .withColumn("w_ppm", expr("1000000 div csize"))
    val rows = cl.groupBy("cluster")
      .agg(first(col("csize")).as("csize"), sum(col("w_ppm")).as("mass"))
      .collect()
    assert(rows.nonEmpty, "sf0.001 corpus should contain near-dup clusters")
    rows.foreach { r =>
      val (csize, mass) = (r.getAs[Long]("csize"), r.getAs[Long]("mass"))
      assert(mass <= 1000000L && mass > 1000000L - csize,
        s"cluster ${r.get(0)}: csize=$csize mass=$mass")
    }
  }

  test("dedup_soft_weight: effective token mass never exceeds raw, and equals raw exactly when a source has no dup members") {
    val out = Dedup.dedupSoftWeight(spark, sf0001).collect()
    out.foreach { r =>
      val (dup, total, eff) = (r.getAs[Long]("dup_docs"),
        r.getAs[Long]("words_total"), r.getAs[Long]("eff_words_micro"))
      assert(eff <= total * 1000000L, s"source ${r.get(0)}")
      if (dup == 0L) assert(eff === total * 1000000L, s"source ${r.get(0)}")
    }
  }

  test("curate_rrf_ensemble: contiguous per-lang top-10, fused score consistent with the reported ranks and non-increasing") {
    val out = TextAnalysis.rrfEnsemble(spark, sf0001).collect()
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("sel_rank"))
      assert(sorted.map(_.getAs[Long]("sel_rank")).toSeq ===
        (1L to sorted.length).toSeq, s"lang $lang ranks not contiguous")
      assert(sorted.length <= 10)
      val scores = sorted.map(_.getAs[Long]("rrf_nano")).toSeq
      assert(scores === scores.sorted.reverse, s"lang $lang not score-ordered")
      sorted.foreach { r =>
        val expect = Seq("r_nll", "r_ttr", "r_dom")
          .map(c => 1000000000L / (60L + r.getAs[Long](c))).sum
        assert(r.getAs[Long]("rrf_nano") === expect,
          s"lang $lang doc ${r.getAs[Long]("doc_id")}")
      }
    }
  }

  test("refinery_anneal: schedules strictly less mass than the raw-corpus mix_anneal (the chain removed docs and masked spans), same identities") {
    val raw = Sampling.mixAnneal(spark, sf0001).collect()
    val refined = Refinery.refineryAnneal(spark, sf0001).collect()
    val rawTokens = raw.map(_.getAs[Long]("tokens")).sum
    val refTokens = refined.map(_.getAs[Long]("tokens")).sum
    assert(refTokens > 0L && refTokens < rawTokens,
      s"refined=$refTokens raw=$rawTokens")
    val totAnneal = refined.map(_.getAs[Long]("anneal_tokens")).sum
    val expectedEpochs = (refTokens / 10L) * 1000L / totAnneal
    refined.foreach { r =>
      assert(r.getAs[Long]("anneal_tokens") <= r.getAs[Long]("tokens"))
      assert(r.getAs[Long]("epochs_milli") === expectedEpochs)
    }
  }

  test("annealSchedule ≡ brute-force cutoff semantics on random skewed frames (ties kept, top third minimal)") {
    import spark.implicits._
    // heavy q_ppm ties (values 0..15) so the ties-at-the-cutoff rule is
    // exercised; lang skew so one language dominates
    val gen: Gen[List[(Long, String, String, Long, Long)]] =
      Gen.chooseNum(30, 150).flatMap { n =>
        Gen.listOfN(n, for {
          id <- Gen.chooseNum(0L, 5000L)
          lang <- Gen.frequency(5 -> Gen.const("l0"), 1 -> Gen.oneOf("l1", "l2"))
          src <- Gen.oneOf("s0", "s1", "s2")
          toks <- Gen.chooseNum(1L, 50L)
          q <- Gen.chooseNum(0L, 15L)
        } yield (id, lang, src, toks, q))
      }.map(_.distinctBy(_._1))
    for (seed <- 1L to 8L) {
      val rows = gen.apply(Gen.Parameters.default, Seed(seed)).get
      // brute force: per lang, cutoff = LARGEST q with count(q' >= q)*3 >= n
      val cut = rows.groupBy(_._2).map { case (lang, rs) =>
        val n = rs.size
        val c = rs.map(_._5).distinct.sorted.reverse
          .filter(q => rs.count(_._5 >= q) * 3 >= n).max
        lang -> c
      }
      val flagged = rows.map(r => (r._3, r._4, r._5 >= cut(r._2)))
      val totT = flagged.map(_._2).sum
      val totA = flagged.filter(_._3).map(_._2).sum
      val expect = flagged.groupBy(_._1).map { case (src, fs) =>
        (src, fs.size.toLong, fs.map(_._2).sum,
          fs.count(_._3).toLong, fs.filter(_._3).map(_._2).sum,
          (totT / 10L) * 1000L / totA)
      }.toSet
      val got = Sampling.annealSchedule(
          rows.toDF("doc_id", "lang", "source", "toks", "q_ppm"))
        .collect().map(r => (r.getString(0), r.getAs[Long]("n_docs"),
          r.getAs[Long]("tokens"), r.getAs[Long]("anneal_docs"),
          r.getAs[Long]("anneal_tokens"), r.getAs[Long]("epochs_milli"))).toSet
      assert(got === expect, s"seed $seed")
      // the kept set is the MINIMAL >= 1/3 tie-closed prefix per lang:
      // dropping the cutoff value must fall under 1/3
      rows.groupBy(_._2).foreach { case (lang, rs) =>
        val kept = rs.count(_._5 >= cut(lang))
        assert(kept * 3 >= rs.size, s"seed $seed lang $lang under a third")
        val strictly = rs.count(_._5 > cut(lang))
        assert(strictly * 3 < rs.size, s"seed $seed lang $lang not minimal")
      }
    }
  }

  test("mix_anneal: anneal mass bounded by raw mass, budget identity holds, and the anneal set is non-trivial") {
    val out = Sampling.mixAnneal(spark, sf0001).collect()
    assert(out.nonEmpty)
    val totTokens = out.map(_.getAs[Long]("tokens")).sum
    val totAnneal = out.map(_.getAs[Long]("anneal_tokens")).sum
    assert(totAnneal > 0L && totAnneal < totTokens)
    val expectedEpochs = (totTokens / 10L) * 1000L / totAnneal
    out.foreach { r =>
      assert(r.getAs[Long]("anneal_tokens") <= r.getAs[Long]("tokens"))
      assert(r.getAs[Long]("anneal_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("epochs_milli") === expectedEpochs,
        s"source ${r.get(0)}")
    }
  }
}
