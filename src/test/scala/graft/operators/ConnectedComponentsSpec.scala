package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** The pure distributed contraction loop — localFinishMaxEdges = 0
    * disables the single-task shortcut so the star rounds themselves
    * stay exercised now that every small graph takes the local path by
    * default.
    */
  private def ccDistributed(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"),
        localFinishMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive chain collapses to one component rooted at the min id") {
    // 7→2→5→9 as a path; min label must flow the full diameter
    val got = cc(Seq((7L, 2L), (5L, 2L), (5L, 9L)))
    assert(got === Map(7L -> 2L, 2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("disjoint components keep separate roots; non-edge nodes absent") {
    val got = cc(Seq((1L, 2L), (10L, 11L), (11L, 12L)))
    assert(got(1L) === 1L && got(2L) === 1L)
    assert(got(10L) === 10L && got(11L) === 10L && got(12L) === 10L)
    assert(!got.contains(99L))
  }

  test("long path converges within the iteration cap") {
    val path = (0L until 12L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.values.toSet === Set(0L))
    assert(got.size === 13)
  }

  test("star contraction ≡ union-find on randomized graphs (paths, stars, dense, shuffled ids)") {
    // Local union-find reference: component = min member id.
    def truth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val es = edges.filter { case (a, b) => a != b }
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      val cmin = scala.collection.mutable.Map.empty[Long, Long]
      parent.keys.foreach { n =>
        val r = find(n); cmin(r) = math.min(cmin.getOrElse(r, n), n)
      }
      parent.keys.map(n => n -> cmin(find(n))).toMap
    }
    val rnd = new scala.util.Random(7) // deterministic corpus
    for (trial <- 0 until 8) {
      val n = 20 + rnd.nextInt(60)
      val ids = rnd.shuffle((0L until 10L * n).toVector)
      val raw: Seq[(Long, Long)] = trial % 4 match {
        case 0 => (0 until n - 1).map(i => (ids(i), ids(i + 1)))        // path
        case 1 => (1 until n).map(i => (ids(0), ids(i)))                // star
        case 2 => Seq.fill(3 * n)((ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))) // dense + self-loops
        case _ => Seq.fill(n / 2)((ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))) // sparse fragments
      }
      val expected = truth(raw)
      if (expected.nonEmpty) {
        // default path (these graphs are all under the local-finish
        // threshold, so this exercises the single-task union-find)
        assert(cc(raw) === expected, s"trial $trial (local finish)")
        assert(ConnectedComponents.lastLocalFinish.get(),
          s"trial $trial expected the local-finish path")
        // pure distributed star contraction — the 100 TB bulk path
        assert(ccDistributed(raw) === expected, s"trial $trial (distributed)")
        assert(!ConnectedComponents.lastLocalFinish.get(),
          s"trial $trial expected the distributed path")
      }
    }
  }

  test("incremental update ≡ batch components on randomized edge splits") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 6) {
      val n = 15 + rnd.nextInt(40)
      val ids = rnd.shuffle((0L until 5L * n).toVector)
      val all = Seq.fill(2 * n)((ids(rnd.nextInt(n)), ids(rnd.nextInt(n))))
        .filter { case (a, b) => a != b }
      if (all.nonEmpty) {
        // split so wave 2 contains bridge edges, brand-new nodes, and
        // edges internal to frozen-candidate components alike
        val (w1, w2) = all.partition { case (a, b) => (a + b) % 3 != 0 }
        val batch = cc(all)
        if (w1.nonEmpty && w2.nonEmpty) {
          val prior = ConnectedComponents.components(w1.toDF("a", "b"))
          val got = ConnectedComponents
            .incrementalComponents(prior, w2.toDF("a", "b"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got === batch, s"trial $trial")
        }
      }
    }
  }

  test("incremental folds CHAIN: two successive batches ≡ one batch solve") {
    import spark.implicits._
    // wave1 forms {1,2} {10,11}; wave2 bridges 2-10 and adds {20,21};
    // wave3 bridges 21-1 — the final fold must see THROUGH the wave-2
    // relabeling (its output is a valid prior: components ≥ 2 members)
    val w1 = Seq((1L, 2L), (10L, 11L)).toDF("a", "b")
    val w2 = Seq((2L, 10L), (20L, 21L)).toDF("a", "b")
    val w3 = Seq((21L, 1L)).toDF("a", "b")
    val p1 = ConnectedComponents.components(w1)
    val p2 = ConnectedComponents.incrementalComponents(p1, w2)
    val got = ConnectedComponents.incrementalComponents(p2, w3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 1L, 21L -> 1L))
  }

  test("incremental fold tolerates an empty prior and an all-new batch") {
    import spark.implicits._
    val empty = ConnectedComponents.components(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    val got = ConnectedComponents
      .incrementalComponents(empty, Seq((5L, 6L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(5L -> 5L, 6L -> 5L))
  }

  test("a reliable checkpoint dir changes fault tolerance, not results") {
    // On a real cluster the per-round cut is the ONLY copy of the
    // contracted edge set (no lineage to recompute — that's the point of
    // the cut), so executor loss mid-loop kills the job unless each round
    // is also written to reliable storage. PlanBridge wires that in
    // whenever the session has a checkpoint dir; this pins (a) identical
    // labels and (b) checkpoint files actually written.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
    val plain = cc(edges)
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    try {
      assert(cc(edges) === plain)
      val written = java.nio.file.Files.walk(ckptDir).iterator()
      val hasRddData = scala.jdk.CollectionConverters
        .IteratorHasAsScala(written).asScala
        .exists(_.getFileName.toString.startsWith("rdd-"))
      assert(hasRddData, s"no reliable checkpoint data written under $ckptDir")
    } finally {
      // a null dir resets SparkContext.checkpointDir to None — the shared
      // session must not keep checkpointing for every later suite
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("a hopeless iteration cap fails loudly instead of returning wrong labels") {
    import spark.implicits._
    // maxIter = 0 can never reach the fixpoint check — the call must
    // throw, not silently read labels off an uncontracted edge set
    val e = intercept[IllegalStateException] {
      ConnectedComponents.components(
        Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), maxIter = 0).collect()
    }
    assert(e.getMessage.contains("fixpoint"))
  }

  test("one contraction round plans hash joins, not cartesians or unpartitioned windows") {
    // The loop's inner plans execute behind cutLineage's RDD leaves, so
    // the repo-wide PlanSpec guards cannot see them — pin one round's
    // physical shape here instead.
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val p = ConnectedComponents.smallStar(ConnectedComponents.largeStar(e))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p) // contraction is joins + aggs only
  }

  test("cluster canonical rule is transitive-consistent on the corpus") {
    val rows = graft.llm.Dedup.dedupClusters(spark, sf0001).collect()
    assert(rows.nonEmpty, "corpus has planted near-dups, clusters expected")
    val byCluster = rows.groupBy(_.getLong(0))
    byCluster.foreach { case (cid, members) =>
      val ids = members.map(_.getLong(1))
      assert(ids.min === cid, "cluster id must be its min member")
      assert(members.count(_.getBoolean(2)) === 1, "exactly one canonical")
    }
  }
}
