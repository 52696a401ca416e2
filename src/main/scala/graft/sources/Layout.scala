package graft.sources

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Partition pruning only skips on the partition column; queries that
  * filter on TWO dimensions (customer AND date) still scan every file of a
  * date partition. Sorting files along a space-filling curve interleaving
  * both dimensions gives each file a small bounding box in (cust, day)
  * space, so min/max footer stats skip files for either predicate — the
  * standard lakehouse answer (Delta/Iceberg `OPTIMIZE ZORDER BY`) rebuilt
  * here from plain bit arithmetic.
  *
  * Everything is codegen-friendly integer expression work: interleave the
  * low 16 bits of two cell coordinates, bit j of x → bit 2j, bit j of y →
  * bit 2j+1. `zorderWrite` is the write path: range-partition by z-value
  * (range, not hash — neighboring z-cells must land in the same file),
  * sort within partitions, write. At 100 TB the identical plan holds; the
  * only knob is the target file count.
  */
object Layout extends QueryModule {

  val Bits = 16

  /** Morton-interleave the low 16 bits of x (even positions) and y (odd). */
  def interleave(x: Column, y: Column): Column =
    (0 until Bits).map { j =>
      shiftleft(shiftright(x, j).bitwiseAND(1L), 2 * j) +
        shiftleft(shiftright(y, j).bitwiseAND(1L), 2 * j + 1)
    }.reduce(_ + _)

  /** Inverse of interleave — the even-position bits (x side). */
  def evenBits(z: Column): Column =
    (0 until Bits).map(j => shiftleft(shiftright(z, 2 * j).bitwiseAND(1L), j)).reduce(_ + _)

  /** Inverse of interleave — the odd-position bits (y side). */
  def oddBits(z: Column): Column =
    (0 until Bits).map(j => shiftleft(shiftright(z, 2 * j + 1).bitwiseAND(1L), j)).reduce(_ + _)

  /** Write `df` clustered along the z-curve of (xCol, yCol) into ~nFiles
    * range-partitioned, internally-sorted parquet files.
    */
  def zorderWrite(df: DataFrame, xCol: Column, yCol: Column, nFiles: Int, outDir: String): Unit =
    df.withColumn("__z", interleave(xCol, yCol))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /** Oracle-checked z-value computation over orders: cells are
    * (custkey mod 2^16, days since epoch start). `zbucket` (the top bits)
    * is the file-assignment a range partitioner would produce.
    */
  def layoutZorder(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .withColumn("cell_cust", pmod(col("o_custkey"), lit(65536L)))
      .withColumn("cell_day",
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("long"))
      .withColumn("zval", interleave(col("cell_cust"), col("cell_day")))
      .select(
        col("o_orderkey"),
        col("cell_cust"),
        col("cell_day"),
        col("zval"),
        shiftright(col("zval"), 20).as("zbucket"))
      .orderBy("o_orderkey")
  }

  /** Co-bucketed join, oracle-checked end to end: both tables are written
    * `bucketBy(8, custkey)` + sorted, then joined THROUGH the bucketed
    * catalog read — the zero-exchange fact-⋈-fact layout (the plan proof,
    * with broadcast disabled so bucketing must carry it, is pinned in
    * `ScaleLayoutSpec`; this query pins the VALUES the bucketed path
    * produces against a plain-join oracle each round). At 100 TB bucketing
    * on the join key is the difference between an idempotent layout cost
    * paid once at write time and a full shuffle of both sides on every
    * join; bucket count scales to ≈ cluster cores (SCALING.md §9).
    */
  private val bucketJoinRun = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Best-effort sweep of bucketed-join generations that are provably
    * dead: the generation name embeds its creator's pid (`_p<pid>_`), so a
    * generation is deletable only when that process is GONE — age alone is
    * not proof of death (a Bench sweep running longer than the age cutoff
    * still reads its own early generations). The age cutoff remains as a
    * second condition so a just-exited process's tables linger briefly
    * rather than vanishing under a reader that raced the exit. A failed
    * delete or an unparseable name is ignored — the next sweep retries.
    */
  private val GenPid = ".*_p(\\d+)_\\d+$".r

  private def sweepStaleGenerations(spark: SparkSession): Unit = {
    val warehouse = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    val cutoff = System.currentTimeMillis() - 3600L * 1000
    def creatorDead(name: String): Boolean = name match {
      case GenPid(pid) =>
        // our own generations are never dead; other pids: alive iff the
        // OS still knows the handle. A digit run beyond Long range can
        // never be a live OS pid, so it is PROVABLY dead — returning
        // false there would leak the corrupted directory forever.
        // ProcessHandle failures stay conservative (not provably dead).
        // Known residual: a recycled pid owned by an unrelated live
        // process blocks that one generation until the squatter exits.
        pid.toLongOption match {
          case None => true // > Long.MaxValue digits: no such pid exists
          case Some(p) =>
            scala.util.Try {
              val h = ProcessHandle.of(p)
              p != ProcessHandle.current().pid() &&
                (!h.isPresent || !h.get().isAlive)
            }.getOrElse(false)
        }
      case _ => false
    }
    val stale = warehouse.listFiles()
    if (stale != null) stale
      .filter(f => f.getName.startsWith("graft_bj_") &&
        f.lastModified() < cutoff && creatorDead(f.getName))
      .foreach(graft.Fs.deleteRecursively)
  }

  def layoutBucketJoin(spark: SparkSession, sfDir: String): DataFrame = {
    // Per-invocation, per-PROCESS table names: concurrent builders
    // (parallel test suites in one JVM, an overlapping Verify in another
    // sharing the same warehouse directory) must never drop a table a
    // live invocation is still reading — a JVM-local counter alone leaves
    // two processes agreeing on the same name. Generations are tiny
    // (test-SF data under the gitignored warehouse); stale ones are swept
    // once they're provably dead (an hour old).
    sweepStaleGenerations(spark)
    val tag = s"${math.abs(sfDir.hashCode)}_p${ProcessHandle.current().pid()}" +
      s"_${bucketJoinRun.incrementAndGet()}"
    val ot = s"graft_bj_orders_$tag"
    val ct = s"graft_bj_cust_$tag"
    CuratedZone.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice"),
      ot, "o_custkey", 8)
    CuratedZone.writeBucketed(
      Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
      ct, "o_custkey", 8)
    spark.table(ot).join(spark.table(ct), "o_custkey")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(30,6)")).cast("double").as("sum_price"),
        countDistinct(col("o_custkey")).as("n_cust"))
      .orderBy("c_mktsegment")
  }

  /** Shard count for the training-shard publish op. 64 here; on a real
    * corpus this is the artifact-count knob (WebDataset-style shards of
    * ~a few hundred MB each — the schedule is identical at any count).
    */
  val NShards = 64

  /** Modulus keeping the manifest's order/content checksums inside
    * BIGINT at any corpus size: each term is < 10⁶, so even 10¹² docs
    * per shard cannot overflow the sum.
    */
  private val FpMod = 1000003L

  /** Training-shard publish manifest — the op that turns a curated
    * corpus into the artifact a training run actually reads: every doc
    * gets a deterministic shard (hash, not round-robin — stable under
    * reruns and corpus growth) and a deterministic EPOCH-0 READ ORDER
    * within its shard (the global-shuffle-without-a-shuffle trick:
    * ordering by a per-doc hash IS a reproducible random permutation,
    * no rand(), no driver-side state). The manifest row per shard pins
    * doc count, token count, an order-independent content checksum, the
    * head doc, and an order-SENSITIVE permutation checksum
    * Σ (rk·(doc_id mod m)) mod m — so the cross-engine hash proves the
    * exact permutation, not just membership. Scale shape: one scan, one
    * shard-partitioned window (shard count scales with the corpus), one
    * shard-sized groupBy.
    */
  def layoutShards(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Hashing
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("okey"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        pmod(Hashing.hash60(concat(lit("shard:"), col("doc_id").cast("string"))),
          lit(NShards.toLong)).cast("int").as("shard"),
        Hashing.hash60(concat(lit("ep0:"), col("doc_id").cast("string"))).as("okey"),
        size(split(col("text"), " ")).cast("long").as("nw"),
        (Hashing.hash60(col("text")) % FpMod).as("cfp"))
      .withColumn("rk", row_number().over(w))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nw")).as("tokens"),
        sum(col("cfp")).as("content_fp"),
        max(when(col("rk") === 1, col("doc_id"))).as("head_doc"),
        sum(((col("rk") % FpMod) * (col("doc_id") % FpMod)) % FpMod)
          .as("order_fp"))
      .orderBy("shard")
  }

  /** Multi-EPOCH read orders over the standing shards — the training
    * loop needs a DIFFERENT permutation every epoch but must not move a
    * byte between epochs: the shard assignment (hash of doc_id) is
    * epoch-invariant, while the within-shard order key re-derives per
    * epoch (hash of "ep<e>:" + doc_id) — reshuffling is a new sort ORDER
    * over the same files, not a re-shard. The manifest pins, per
    * (shard, epoch): the epoch-invariant doc count and content checksum
    * (must be identical across epochs — membership never changes) and
    * the order-SENSITIVE permutation checksum + head doc (must differ —
    * that IS the reshuffle). Scale: one scan, a 3-row broadcast epoch
    * explode, one (shard, epoch)-partitioned window — 3× the rows of
    * [[layoutShards]], same shape.
    */
  def layoutShardEpochs(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Hashing
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "epoch").orderBy(col("okey"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        pmod(Hashing.hash60(concat(lit("shard:"), col("doc_id").cast("string"))),
          lit(NShards.toLong)).cast("int").as("shard"),
        (Hashing.hash60(col("text")) % FpMod).as("cfp"),
        explode(array(lit(0), lit(1), lit(2))).as("epoch"))
      .withColumn("okey",
        Hashing.hash60(concat(lit("ep"), col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(w))
      .groupBy("shard", "epoch")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("cfp")).as("content_fp"),
        max(when(col("rk") === 1, col("doc_id"))).as("head_doc"),
        sum(((col("rk") % FpMod) * (col("doc_id") % FpMod)) % FpMod)
          .as("order_fp"))
      .orderBy("shard", "epoch")
  }

  /** Materialize the shards [[layoutShards]] manifests: one directory
    * per shard, rows stored in epoch-0 read order (a single-file shard
    * read back in one task IS the training read order — no shuffle at
    * load time). `repartition(shard)` co-locates whole shards so the
    * partitionBy write emits one file per shard dir; at corpus scale the
    * shard count is the parallelism and file-size knob in one.
    */
  def shardWrite(docs: DataFrame, nShards: Int, outDir: String): Unit = {
    import graft.functions.Hashing
    docs
      .withColumn("shard",
        pmod(Hashing.hash60(concat(lit("shard:"), col("doc_id").cast("string"))),
          lit(nShards.toLong)).cast("int"))
      .withColumn("__okey",
        Hashing.hash60(concat(lit("ep0:"), col("doc_id").cast("string"))))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__okey"), col("doc_id"))
      .drop("__okey")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> (layoutZorder _),
    "layout_bucket_join" -> (layoutBucketJoin _),
    "layout_shards" -> (layoutShards _),
    "layout_shard_epochs" -> (layoutShardEpochs _),
  )

  override def oracles: Map[String, String] = {
    val zExpr = (0 until Bits).map { j =>
      s"((cell_cust >> $j) & 1) * ${1L << (2 * j)} + ((cell_day >> $j) & 1) * ${1L << (2 * j + 1)}"
    }.mkString(" + ")
    Map(
      "layout_bucket_join" ->
        """SELECT c.c_mktsegment, COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
          |  COUNT(DISTINCT o.o_custkey) AS n_cust
          |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,
      "layout_shards" -> {
        import graft.functions.Hashing.duckHash60
        s"""WITH d AS (
           |  SELECT doc_id,
           |    CAST(${duckHash60("'shard:' || CAST(doc_id AS VARCHAR)")} % $NShards
           |      AS INTEGER) AS shard,
           |    ${duckHash60("'ep0:' || CAST(doc_id AS VARCHAR)")} AS okey,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
           |    ${duckHash60("text")} % $FpMod AS cfp
           |  FROM documents
           |), r AS (
           |  SELECT *, row_number() OVER (PARTITION BY shard
           |    ORDER BY okey, doc_id) AS rk
           |  FROM d
           |)
           |SELECT shard, COUNT(*) AS n_docs,
           |  CAST(SUM(nw) AS BIGINT) AS tokens,
           |  CAST(SUM(cfp) AS BIGINT) AS content_fp,
           |  MAX(CASE WHEN rk = 1 THEN doc_id END) AS head_doc,
           |  CAST(SUM(((rk % $FpMod) * (doc_id % $FpMod)) % $FpMod) AS BIGINT)
           |    AS order_fp
           |FROM r GROUP BY shard ORDER BY shard""".stripMargin
      },
      "layout_zorder" ->
        s"""WITH c AS (
           |  SELECT o_orderkey,
           |    o_custkey % 65536 AS cell_cust,
           |    datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS cell_day
           |  FROM orders
           |), z AS (
           |  SELECT o_orderkey, cell_cust, cell_day, $zExpr AS zval FROM c
           |)
           |SELECT o_orderkey, cell_cust, cell_day, zval, zval >> 20 AS zbucket
           |FROM z ORDER BY o_orderkey""".stripMargin,
      "layout_shard_epochs" -> {
        import graft.functions.Hashing.duckHash60
        s"""WITH d AS (
           |  SELECT doc_id,
           |    CAST(${duckHash60("'shard:' || CAST(doc_id AS VARCHAR)")} % $NShards
           |      AS INTEGER) AS shard,
           |    ${duckHash60("text")} % $FpMod AS cfp,
           |    CAST(unnest([0, 1, 2]) AS INTEGER) AS epoch
           |  FROM documents
           |), k AS (
           |  SELECT *,
           |    ${duckHash60("'ep' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")}
           |      AS okey
           |  FROM d
           |), r AS (
           |  SELECT *, row_number() OVER (PARTITION BY shard, epoch
           |    ORDER BY okey, doc_id) AS rk
           |  FROM k
           |)
           |SELECT shard, epoch, COUNT(*) AS n_docs,
           |  CAST(SUM(cfp) AS BIGINT) AS content_fp,
           |  MAX(CASE WHEN rk = 1 THEN doc_id END) AS head_doc,
           |  CAST(SUM(((rk % $FpMod) * (doc_id % $FpMod)) % $FpMod) AS BIGINT)
           |    AS order_fp
           |FROM r GROUP BY shard, epoch ORDER BY shard, epoch""".stripMargin
      },
    )
  }
}
