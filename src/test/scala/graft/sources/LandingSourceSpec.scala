package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the graft-landing DSv2 connector (SURVEY §2.1 S1/S4/S6):
  * whole-object rows with metadata sidecars, planning-time key pruning,
  * and zero payload I/O for metadata-only scans.
  */
class LandingSourceSpec extends SparkSpec {

  private def mkZone(): String = {
    val dir = Files.createTempDirectory("landing").toString
    def put(key: String, body: String, meta: Map[String, String] = Map.empty): Unit = {
      val p = Paths.get(dir, key)
      Files.createDirectories(p.getParent)
      Files.write(p, body.getBytes(StandardCharsets.UTF_8))
      if (meta.nonEmpty)
        Files.write(Paths.get(dir, key + ".meta"),
          meta.map { case (k, v) => s"$k=$v" }.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    put("a/one.ndjson", "{\"name\":\"Alice\"}\n{\"name\":\"Bob\"}",
      Map("pipeline-output-bucket" -> "curated", "owner" -> "etl"))
    put("a/two.ndjson", "{\"name\":\"Carol\"}")
    put("b/three.ndjson", "{}", Map("owner" -> "ops"))
    dir
  }

  private def zone = spark.read.format("graft-landing")

  test("round-trip: keys, payloads, byte lengths, metadata (absent → empty map)") {
    val dir = mkZone()
    val rows = zone.load(dir).orderBy("key").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("a/one.ndjson", "a/two.ndjson", "b/three.ndjson"))
    val one = rows(0)
    assert(one.getInt(1) == "{\"name\":\"Alice\"}\n{\"name\":\"Bob\"}".length)
    assert(one.getString(2).contains("Alice"))
    assert(one.getMap[String, String](3).toMap ==
      Map("pipeline-output-bucket" -> "curated", "owner" -> "etl"))
    assert(rows(1).getMap[String, String](3).isEmpty)
  }

  test("one partition per object — the whole-object parallelism unit") {
    val dir = mkZone()
    assert(zone.load(dir).rdd.getNumPartitions == 3)
  }

  test("key-prefix pushdown prunes objects at planning time") {
    val dir = mkZone()
    val pruned = zone.load(dir).where(col("key").startsWith("a/"))
    // partitions, not post-filter rows, prove LIST-level pruning
    assert(pruned.rdd.getNumPartitions == 2)
    assert(pruned.count() == 2)
    val eq = zone.load(dir).where(col("key") === "b/three.ndjson")
    assert(eq.rdd.getNumPartitions == 1)
    assert(eq.select("metadata").collect()(0)
      .getMap[String, String](0).toMap == Map("owner" -> "ops"))
  }

  test("metadata-only scan does ZERO payload reads (the HeadObject pass)") {
    val dir = mkZone()
    LandingSource.payloadReads.set(0)
    val metaOnly = zone.load(dir).select("key", "metadata").collect()
    assert(metaOnly.length == 3)
    assert(LandingSource.payloadReads.get() == 0)
    // and a payload column flips it back on
    zone.load(dir).select("byte_len").collect()
    assert(LandingSource.payloadReads.get() == 3)
  }

  test("non-key filters stay residual and still evaluate correctly") {
    val dir = mkZone()
    val r = zone.load(dir)
      .where(col("key").startsWith("a/") && length(col("content")) > 20)
      .select("key").collect().map(_.getString(0))
    assert(r.toSeq == Seq("a/one.ndjson"))
  }

  test("write path: distributed put-with-metadata round-trips through the reader") {
    import spark.implicits._
    val dir = Files.createTempDirectory("landing-w").toString
    Seq(
      ("in/x.ndjson", "{\"name\":\"Alice\"}", Map("pipeline-output-bucket" -> "curated")),
      ("in/y.ndjson", "{\"name\":\"Bob\"}", Map.empty[String, String]))
      .toDF("key", "content", "metadata")
      // byte_len is derived on read; the table schema requires it on write,
      // the writer ignores it (reader recomputes from the real bytes)
      .withColumn("byte_len", length(col("content")))
      .select("key", "byte_len", "content", "metadata")
      .repartition(2)
      .write.format("graft-landing").mode("append").save(dir)
    val back = zone.load(dir).orderBy("key").collect()
    assert(back.map(_.getString(0)).toSeq == Seq("in/x.ndjson", "in/y.ndjson"))
    assert(back(0).getString(2) == "{\"name\":\"Alice\"}")
    assert(back(0).getMap[String, String](3).toMap ==
      Map("pipeline-output-bucket" -> "curated"))
    assert(back(1).getMap[String, String](3).isEmpty)
    // staging fully cleaned after commit
    assert(!Files.list(Paths.get(dir)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("._staging_")))
  }

  test("streaming read: new objects only, exactly-once across drains") {
    val dir = mkZone() // 3 objects
    val ckpt = Files.createTempDirectory("landing-s-ck").toString
    val out = Files.createTempDirectory("landing-s-out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-landing").load(dir)
        .select("key", "byte_len", "metadata")
        .writeStream.format("json").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def keysOut: Seq[String] = spark.read
      .schema("key STRING, byte_len INT, metadata MAP<STRING,STRING>")
      .json(out).collect().map(_.getString(0)).sorted.toSeq
    drain()
    assert(keysOut == Seq("a/one.ndjson", "a/two.ndjson", "b/three.ndjson"))
    // nothing new → re-drain emits nothing (exactly-once per object)
    drain()
    assert(keysOut.length == 3)
    // one new arrival → only it is processed
    Files.write(Paths.get(dir, "b", "four.ndjson"),
      "{\"name\":\"Dave\"}".getBytes(StandardCharsets.UTF_8))
    drain()
    assert(keysOut == Seq("a/one.ndjson", "a/two.ndjson", "b/three.ndjson", "b/four.ndjson").sorted)
  }

  test("streaming read honors key-prefix pushdown: non-matching arrivals never process") {
    val dir = mkZone()
    val ckpt = Files.createTempDirectory("landing-sp-ck").toString
    val out = Files.createTempDirectory("landing-sp-out").toString
    val q = spark.readStream.format("graft-landing").load(dir)
      .where(col("key").startsWith("a/"))
      .select("key")
      .writeStream.format("json").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val keys = spark.read.schema("key STRING").json(out)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(keys == Seq("a/one.ndjson", "a/two.ndjson"))
  }

  test("conjunctive key filters ALL apply — two pushed prefixes narrow, not widen") {
    val dir = mkZone()
    // both StringStartsWith conjuncts are accepted; dropping either would
    // return a/two.ndjson (resp. b/…) that the other predicate excludes
    val both = zone.load(dir)
      .where(col("key").startsWith("a/") && col("key").startsWith("a/one"))
    assert(both.rdd.getNumPartitions == 1)
    assert(both.select("key").collect().map(_.getString(0)).toSeq ==
      Seq("a/one.ndjson"))
    // prefix + equality conjunction, equality outside the prefix → empty
    val none = zone.load(dir)
      .where(col("key").startsWith("a/") && col("key") === "b/three.ndjson")
    assert(none.count() == 0)
  }

  test("streaming offsets survive deletions and same-millisecond arrivals") {
    val dir = mkZone() // 3 objects
    val ckpt = Files.createTempDirectory("landing-del-ck").toString
    val out = Files.createTempDirectory("landing-del-out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-landing").load(dir)
        .select("key")
        .writeStream.format("json").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def keysOut: Seq[String] = spark.read.schema("key STRING").json(out)
      .collect().map(_.getString(0)).sorted.toSeq
    drain()
    assert(keysOut.length == 3)
    // a deletion used to shift every row-count offset; the watermark
    // offset is position-independent, so the next arrival — even one
    // whose mtime EQUALS the committed watermark (same-millisecond
    // arrival, the race a count offset silently loses) — still processes
    // exactly once, and nothing re-emits
    Files.delete(Paths.get(dir, "a", "one.ndjson"))
    val maxM = Seq("a/two.ndjson", "b/three.ndjson")
      .map(k => Files.getLastModifiedTime(Paths.get(dir, k)).toMillis).max
    val late = Paths.get(dir, "b", "late.ndjson")
    Files.write(late, "{\"name\":\"Eve\"}".getBytes(StandardCharsets.UTF_8))
    Files.setLastModifiedTime(late,
      java.nio.file.attribute.FileTime.fromMillis(maxM))
    drain()
    assert(keysOut ==
      Seq("a/one.ndjson", "a/two.ndjson", "b/late.ndjson", "b/three.ndjson"))
    drain() // and a further drain with no arrivals emits nothing
    assert(keysOut.length == 4)
  }

  test("incremental micro-batch listing visits O(changed), not O(zone)") {
    // a zone big enough that a full re-list is unmistakable in the counter
    val dir = Files.createTempDirectory("landing-inc").toString
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 3600_000L)
    for (d <- 0 until 40; f <- 0 until 5) {
      val p = Paths.get(dir, f"d$d%02d", s"obj$f.ndjson")
      Files.createDirectories(p.getParent)
      Files.write(p, s"""{"d":$d,"f":$f}""".getBytes(StandardCharsets.UTF_8))
      Files.setLastModifiedTime(p, old)
    }
    // age the directory mtimes so the zone is quiescent (past the FS
    // timestamp granule) — the steady state of a real landing zone
    for (d <- 0 until 40) Files.setLastModifiedTime(Paths.get(dir, f"d$d%02d"), old)
    Files.setLastModifiedTime(Paths.get(dir), old)
    val ckpt = Files.createTempDirectory("landing-inc-ck").toString
    val out = Files.createTempDirectory("landing-inc-out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-landing").load(dir)
        .select("key")
        .writeStream.format("json").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def keysOut: Seq[String] = spark.read.schema("key STRING").json(out)
      .collect().map(_.getString(0)).sorted.toSeq
    drain() // first drain pays the full list once (cold cache)
    assert(keysOut.length == 200)
    // one new arrival in one directory → the next drain re-enumerates that
    // directory alone; the other 40 cost a stat each, zero entries
    Files.write(Paths.get(dir, "d07", "new.ndjson"),
      "{\"d\":7}".getBytes(StandardCharsets.UTF_8))
    LandingSource.entriesListed.set(0)
    drain()
    assert(keysOut.length == 201)
    assert(keysOut.contains("d07/new.ndjson"))
    val visited = LandingSource.entriesListed.get()
    // d07 holds 6 objects + sidecar-free so ≤ ~7 entries per enumeration;
    // ledger() runs a handful of times per drain (offset + planning) — the
    // bound below fails loudly if anything re-walks the whole zone (200+)
    assert(visited > 0, "arrival must re-enumerate its directory")
    assert(visited < 100, s"incremental drain visited $visited entries — full re-list?")
    // quiescent re-drain: nothing new emitted, still no full re-list
    LandingSource.entriesListed.set(0)
    drain()
    assert(keysOut.length == 201)
    val quiescent = LandingSource.entriesListed.get()
    // d07's mtime is within the granule (just modified) so it may re-list;
    // everything else must stay cached
    assert(quiescent < 100, s"quiescent drain visited $quiescent entries")
  }

  test("admission control: a backlog drains in ⌈N/k⌉ bounded micro-batches, exactly once") {
    // 9 pre-existing objects (the post-outage backlog shape), k = 4
    val dir = Files.createTempDirectory("landing-adm").toString
    for (i <- 0 until 9) {
      val p = Paths.get(dir, "in", f"obj$i%02d.ndjson")
      Files.createDirectories(p.getParent)
      Files.write(p, s"""{"i":$i}""".getBytes(StandardCharsets.UTF_8))
    }
    val ckpt = Files.createTempDirectory("landing-adm-ck").toString
    val out = Files.createTempDirectory("landing-adm-out").toString
    def drain(): Seq[Long] = {
      val q = spark.readStream.format("graft-landing")
        .option("maxFilesPerTrigger", "4").load(dir)
        .select("key")
        .writeStream.format("json").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    }
    val batches = drain()
    // the backlog must arrive in bounded batches — each one a durable
    // checkpoint — not one unbounded recovery batch
    assert(batches == Seq(4L, 4L, 1L), s"expected 4/4/1 micro-batches, got $batches")
    val keys = spark.read.schema("key STRING").json(out)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(keys == (0 until 9).map(i => f"in/obj$i%02d.ndjson"))
    // exactly-once across the bounded drain: a re-drain emits nothing
    assert(drain().isEmpty)
    assert(spark.read.schema("key STRING").json(out).count() == 9)
  }

  test("admission control: maxBytesPerTrigger bounds batches by payload size") {
    val dir = Files.createTempDirectory("landing-admb").toString
    // 6 objects of 100 bytes each; budget 250 → 2 per batch → 3 batches
    for (i <- 0 until 6) {
      val p = Paths.get(dir, f"obj$i.bin")
      Files.write(p, Array.fill[Byte](100)('x'))
    }
    val ckpt = Files.createTempDirectory("landing-admb-ck").toString
    val out = Files.createTempDirectory("landing-admb-out").toString
    val q = spark.readStream.format("graft-landing")
      .option("maxBytesPerTrigger", "250").load(dir)
      .select("key", "byte_len")
      .writeStream.format("json").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(batches == Seq(2L, 2L, 2L), s"expected 2/2/2 micro-batches, got $batches")
    assert(spark.read.schema("key STRING, byte_len INT").json(out).count() == 6)
    // an object larger than the whole budget still admits alone (no stall)
    val dir2 = Files.createTempDirectory("landing-admb2").toString
    Files.write(Paths.get(dir2, "big.bin"), Array.fill[Byte](1000)('y'))
    Files.write(Paths.get(dir2, "big2.bin"), Array.fill[Byte](1000)('z'))
    val ckpt2 = Files.createTempDirectory("landing-admb2-ck").toString
    val out2 = Files.createTempDirectory("landing-admb2-out").toString
    val q2 = spark.readStream.format("graft-landing")
      .option("maxBytesPerTrigger", "50").load(dir2)
      .select("key")
      .writeStream.format("json").option("path", out2)
      .option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val b2 = q2.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(b2 == Seq(1L, 1L), s"oversized objects must drain one per batch, got $b2")
    assert(spark.read.schema("key STRING").json(out2).count() == 2)
  }

  test("deleting a directory prunes its cached subtree from the incremental ledger") {
    val root = Files.createTempDirectory("landing-prune")
    for (d <- 0 until 3; f <- 0 until 2) {
      val p = root.resolve(f"d$d").resolve(s"obj$f.ndjson")
      Files.createDirectories(p.getParent)
      Files.write(p, s"""{"d":$d}""".getBytes(StandardCharsets.UTF_8))
    }
    assert(LandingLedger.incrementalLedger(root).length == 6)
    val before = LandingLedger.cachedDirCount(root)
    assert(before >= 4, s"root + 3 subdirs expected, got $before")
    // delete one subtree; the parent mtime bump makes the walk drop it,
    // and the prune must evict its cache entry rather than leak it
    graft.Fs.deleteRecursively(root.resolve("d1").toFile)
    assert(LandingLedger.incrementalLedger(root).length == 4)
    val after = LandingLedger.cachedDirCount(root)
    assert(after == before - 1, s"deleted dir's entry must evict: $before -> $after")
  }

  test("deleting the ROOT itself drops its whole cached subtree") {
    val root = Files.createTempDirectory("landing-rootdel")
    for (d <- 0 until 3) {
      val p = root.resolve(f"d$d").resolve("obj.ndjson")
      Files.createDirectories(p.getParent)
      Files.write(p, s"""{"d":$d}""".getBytes(StandardCharsets.UTF_8))
    }
    assert(LandingLedger.incrementalLedger(root).length == 3)
    assert(LandingLedger.cachedDirCount(root) >= 4)
    // the root vanishing entirely (zone decommissioned) never enters the
    // walk, so the in-walk prune can't fire — the ledger call itself must
    // evict, or the dead zone's directory index leaks forever
    graft.Fs.deleteRecursively(root.toFile)
    assert(LandingLedger.incrementalLedger(root).isEmpty)
    assert(LandingLedger.cachedDirCount(root) == 0,
      "deleted root must not keep a cached subtree")
  }

  test("transient roots evict: the ledger cache stays bounded across many zones") {
    // simulate a process that drains many short-lived zones (per-tenant
    // dirs, test fixtures): each gets cached once, then is never listed
    // again — the cache must not grow one dead index per zone forever
    // each transient root's OWN streams configure its short horizon (the
    // horizon is recorded per root at scan time — another root's scan
    // never governs it); the production 30 min default would out-wait
    // the suite, so pass it. Nothing to restore: no process-global state.
    val transients = (0 until 20).map { i =>
      val r = Files.createTempDirectory(f"landing-tr$i")
      Files.write(r.resolve("obj.ndjson"), s"""{"i":$i}""".getBytes(StandardCharsets.UTF_8))
      assert(LandingLedger.incrementalLedger(r, evictAfterMs = 50L).length == 1)
      r
    }
    val live = Files.createTempDirectory("landing-live")
    Files.write(live.resolve("obj.ndjson"), "{}".getBytes(StandardCharsets.UTF_8))
    // Eviction must NOT depend on how many OTHER streams called in
    // between (the old call-counter design starved slow streams sharing
    // the process) — any later scan's sweep applies each root's own
    // recorded horizon.
    Thread.sleep(120)
    assert(LandingLedger.incrementalLedger(live).length == 1)
    assert(transients.forall(LandingLedger.cachedDirCount(_) == 0),
      "roots unseen past their own eviction horizon must drop their cache")
    assert(LandingLedger.cachedDirCount(live) == 1)
  }

  test("eviction horizon is per root: a hot small-horizon stream cannot evict a slow stream's root") {
    // the review-caught cross-stream starvation: stream A triggers every
    // second with a small horizon, stream B every 10 minutes with the
    // default — A's sweep must judge B's root by B's OWN horizon, or B
    // pays a cold O(objects) re-list on every one of its triggers
    val slow = Files.createTempDirectory("landing-slow")
    Files.write(slow.resolve("obj.ndjson"), "{}".getBytes(StandardCharsets.UTF_8))
    assert(LandingLedger.incrementalLedger(slow).length == 1) // default horizon
    val hot = Files.createTempDirectory("landing-hot")
    Files.write(hot.resolve("obj.ndjson"), "{}".getBytes(StandardCharsets.UTF_8))
    Thread.sleep(120)
    // hot stream scans with a 50 ms horizon, well past slow's lastSeen —
    // slow's cache must survive because slow's OWN horizon is 30 min
    assert(LandingLedger.incrementalLedger(hot, evictAfterMs = 50L).length == 1)
    assert(LandingLedger.cachedDirCount(slow) == 1,
      "a slow stream's root must not be evicted by another stream's small horizon")
  }

  test("evictAfterMs reader option parses strictly") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val table = new LandingTable(Files.createTempDirectory("landing-opt").toString)
    // valid horizon builds a scan
    table.newScanBuilder(new CaseInsensitiveStringMap(
      java.util.Map.of("evictAfterMs", "1234"))).build()
    // a non-positive horizon would evict every root on every call —
    // reject loudly at option-parse time
    intercept[IllegalArgumentException] {
      table.newScanBuilder(new CaseInsensitiveStringMap(
        java.util.Map.of("evictAfterMs", "0")))
    }
  }

  test("sidecar round-trip is strict on write, tolerant on read") {
    import spark.implicits._
    // write: metadata that cannot round-trip through k=v lines fails
    // loudly instead of corrupting the map
    val dir = Files.createTempDirectory("landing-m").toString
    val bad = Seq(("k.txt", "x", Map("owner" -> "a\nb")))
      .toDF("key", "content", "metadata")
      .withColumn("byte_len", length(col("content")))
      .select("key", "byte_len", "content", "metadata")
    intercept[Exception] {
      bad.write.format("graft-landing").mode("append").save(dir)
    }
    // read: a malformed sidecar line (no '=') is skipped, not a crash
    val dir2 = Files.createTempDirectory("landing-m2").toString
    Files.write(Paths.get(dir2, "obj.txt"), "body".getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(dir2, "obj.txt.meta"),
      "owner=ops\ngarbage line without equals\nstage=raw"
        .getBytes(StandardCharsets.UTF_8))
    val m = zone.load(dir2).select("metadata").collect()(0)
      .getMap[String, String](0).toMap
    assert(m == Map("owner" -> "ops", "stage" -> "raw"))
  }

  test("write rejects keys that escape the landing zone") {
    import spark.implicits._
    val dir = Files.createTempDirectory("landing-t").toString
    val escapee = Paths.get(dir).resolveSibling("escaped.txt")
    val bad = Seq(("../" + escapee.getFileName.toString, "x"))
      .toDF("key", "content")
      .withColumn("byte_len", length(col("content")))
      .withColumn("metadata", map().cast("map<string,string>"))
      .select("key", "byte_len", "content", "metadata")
    intercept[Exception] {
      bad.write.format("graft-landing").mode("append").save(dir)
    }
    assert(!Files.exists(escapee), "path-traversal key must not write outside the zone")
    assert(Files.list(Paths.get(dir)).iterator().asScala.toSeq.isEmpty)
  }

  test("write accepts an interior '..' that stays in-zone, normalized consistently") {
    import spark.implicits._
    val dir = Files.createTempDirectory("landing-n").toString
    // "a/../b.txt" normalizes to "b.txt" INSIDE the zone: it must publish
    // (with its sidecar) under the normalized key, not crash on the raw
    // form's nonexistent 'a' directory
    Seq(("a/../b.txt", "body", Map("owner" -> "ops")))
      .toDF("key", "content", "metadata")
      .withColumn("byte_len", length(col("content")))
      .select("key", "byte_len", "content", "metadata")
      .write.format("graft-landing").mode("append").save(dir)
    val back = zone.load(dir).collect()
    assert(back.map(_.getString(0)).toSeq == Seq("b.txt"))
    assert(back(0).getMap[String, String](3).toMap == Map("owner" -> "ops"))
  }

  test("write path: a failed job aborts — zone untouched, staging removed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("landing-a").toString
    val bad = Seq(("ok.ndjson", "fine"), ("boom.ndjson", "x"))
      .toDF("key", "content")
      .withColumn("content",
        when(col("key") === "boom.ndjson",
          expr("raise_error('injected task failure')")).otherwise(col("content")))
      .withColumn("byte_len", length(col("content")))
      .withColumn("metadata", map().cast("map<string,string>"))
      .select("key", "byte_len", "content", "metadata")
    intercept[Exception] {
      bad.write.format("graft-landing").mode("append").save(dir)
    }
    val leftover = Files.list(Paths.get(dir)).iterator().asScala.toSeq
    assert(leftover.isEmpty, s"zone should be untouched, found: $leftover")
  }
}
