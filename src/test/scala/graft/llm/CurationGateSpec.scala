package graft.llm

import graft.SparkSpec

/** Invariants of the round-7 second-wave curation/schedule queries —
  * the cross-engine hashes pin exact values; these pin the properties
  * that make the reports meaningful (each rule fires, the gate keeps
  * exactly the head+middle terciles, the schedule conserves the budget).
  */
class CurationGateSpec extends SparkSpec {

  test("gopher battery: every rule fires somewhere and the keep accounting is consistent") {
    val rows = Curation.gopherRules(spark, sf0001).collect()
    assert(rows.length > 1)
    val cols = Seq("v_words", "v_wordlen", "v_stop", "v_topword", "v_ttr")
    val idx = cols.map(rows.head.fieldIndex)
    // a rule that never fires is a vacuous battery entry — the thresholds
    // are calibrated to this corpus's shape, so each must catch someone
    idx.zip(cols).foreach { case (i, c) =>
      assert(rows.map(_.getLong(i)).sum > 0, s"rule $c never fires")
    }
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_docs"))
      val kept = r.getLong(r.fieldIndex("kept"))
      assert(kept >= 0 && kept <= n)
      assert(r.getLong(r.fieldIndex("keep_ppm")) === kept * 1000000L / n)
      // survivors pass every rule, so no rule may flag more docs than
      // the battery rejects in total
      idx.foreach(i => assert(r.getLong(i) <= n - kept))
    }
  }

  test("perplexity gate keeps exactly the head+middle terciles of each language") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.curatePerplexity(spark, sf0001).collect()
    val totalKept = rows.map(_.getLong(rows.head.fieldIndex("kept"))).sum
    // ntile(3) puts ceil(n/3)-or-floor rows per bucket; buckets 1-2 hold
    // n - floor(n/3) rows per language — derive from the real lang sizes
    val langSizes = graft.Tables.documents(spark, sf0001)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val expected = langSizes.map(n => n - n / 3).sum
    assert(totalKept === expected,
      s"gate must keep exactly the head+middle terciles ($expected), got $totalKept")
  }

  test("epoch schedule conserves the budget and flags exactly the over-unity sources") {
    val rows = Sampling.mixEpochSchedule(spark, sf0001).collect()
    val fi = rows.head.fieldIndex _
    val budget = rows.map(_.getLong(fi("tokens"))).sum
    val targets = rows.map(_.getLong(fi("target_tokens"))).sum
    // integer division floors per source, so the schedule never exceeds
    // the budget and undershoots by less than one part per source
    assert(targets <= budget && budget - targets < rows.length * 5)
    rows.foreach { r =>
      val em = r.getLong(fi("epochs_milli"))
      assert(r.getBoolean(fi("upsampled")) === (em > 1000))
      val srcIdx = r.getString(fi("source")).stripPrefix("src").toLong
      assert(r.getLong(fi("weight_parts")) === srcIdx % 5 + 1)
    }
    assert(rows.exists(_.getBoolean(fi("upsampled"))),
      "weights 1..5 over a ~uniform corpus must upsample the heavy sources")
  }
}
