package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's landing-zone object model —
  * the S3 "object + user metadata" abstraction (SURVEY §1.2, §2.1 S1/S4/S6:
  * `GetObject` body read at glue/job.py:22-23, metadata put at
  * lambda/ingest-handler.ts:41-46, `HeadObject` metadata scan at
  * lambda/handler.ts:39-46) exposed as a Spark TABLE instead of a
  * driver-side SDK loop:
  *
  *   spark.read.format("graft-landing").load(dir)
  *     → key STRING, byte_len INT, content STRING, metadata MAP<STR,STR>
  *
  * Layout: every regular file under the directory is one object (key =
  * relative path); an optional sidecar `<name>.meta` carries the user
  * metadata as `k=v` lines (the Record<string,string> shape the reference
  * enforces at src/etl/dto/upload-request.dto.ts:19-21).
  *
  * The two scale behaviors a real object-store connector must have, both
  * spec-pinned (LandingSourceSpec):
  *
  *  - **Key-prefix pushdown prunes at PLANNING time**: `key LIKE 'a/%'`
  *    (StringStartsWith / EqualTo) drops non-matching objects before any
  *    partition is created — the LIST-level pruning that makes a
  *    prefix-organized 100 TB landing zone queryable.
  *  - **Column pruning skips payload I/O entirely**: a `SELECT key,
  *    metadata` scan never opens the object body (the HeadObject-only
  *    metadata pass, S6) — `payloadReads` counts actual body reads so the
  *    spec can assert ZERO for metadata-only queries.
  *
  * One InputPartition per object: parallelism = object count, the natural
  * unit for whole-object semantics (the reference processes per-object;
  * at scale, small objects would be coalesced into multi-object
  * partitions — the grouping hook is planInputPartitions).
  */
class LandingSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-landing"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LandingSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LandingTable(properties.get("path"))
}

object LandingSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("content", StringType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = false)))

  /** Count of object BODIES actually opened — the spec's evidence that
    * metadata-only scans do no payload I/O. (Test-observability hook; a
    * production connector would surface this as a custom metric.)
    */
  val payloadReads = new AtomicLong(0)

  /** Count of directory entries enumerated from the filesystem during
    * listing — the spec's evidence that an incremental micro-batch drain
    * visits O(changed) entries, not O(zone). At a 100-TB landing zone
    * (millions of objects) a full driver-side re-list per trigger is the
    * classic file-source bottleneck; this counter keeps the incremental
    * guarantee regression-tested.
    */
  val entriesListed = new AtomicLong(0)

  /** Column indices of (key, content, metadata) in the write input schema;
    * content/metadata are optional (-1 = absent), key is required. */
  def writerIndices(schema: StructType): (Int, Int, Int) = {
    val names = schema.fieldNames
    val ki = names.indexOf("key")
    require(ki >= 0, s"graft-landing write needs a 'key' column, got: ${names.mkString(",")}")
    (ki, names.indexOf("content"), names.indexOf("metadata"))
  }
}

class LandingTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-landing($path)"
  override def schema(): StructType = LandingSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // directory-cache eviction horizon, per stream (reader option; the
    // ledger default applies when unset)
    val evictAfter = Option(options.get("evictAfterMs")).map { v =>
      val n = v.trim.toLong
      require(n > 0, s"evictAfterMs must be positive, got $v"); n
    }.getOrElse(LandingLedger.DefaultEvictAfterMs)
    new LandingScanBuilder(path, AdmissionLimits(options), evictAfter)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LandingWriteBuilder(path, info)
}

/** Write path — the reference's put-with-metadata (S4: ingest Lambda
  * `PutObject` + user metadata, lambda/ingest-handler.ts:36-56) as a
  * DISTRIBUTED write with the DSv2 commit protocol:
  *
  *   df.select(key, content, metadata).write
  *     .format("graft-landing").mode("append").save(dir)
  *
  * Exactly-once discipline an object-store ingest needs: every task
  * writes to a private staging dir (`._staging_<queryId>/<taskId>/`);
  * only the driver's commit() publishes staged objects (rename into
  * place) and writes the `.meta` sidecars; abort() — any task failure —
  * deletes staging so a failed job leaves the zone untouched. Task
  * retries are naturally idempotent: each attempt stages under its own
  * id, only the committed attempt publishes.
  */
class LandingWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new LandingBatchWrite(path, info)
  }
}

class LandingBatchWrite(path: String, info: LogicalWriteInfo) extends BatchWrite {
  private val staging = Paths.get(path, s"._staging_${info.queryId}")

  override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory = {
    val idx = LandingSource.writerIndices(info.schema())
    new LandingWriterFactory(staging.toString, idx)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = Paths.get(path).toAbsolutePath.normalize()
    messages.foreach { case LandingCommit(files) =>
      files.foreach { rel =>
        val src = staging.resolve(rel)
        // strip the taskId segment: staged as <taskId>/<key>[.meta]
        val dst = root.resolve(rel.substring(rel.indexOf('/') + 1)).normalize()
        // defense-in-depth re-check of the writer-side validation: never
        // publish outside the zone root, whatever a commit message claims
        require(dst.startsWith(root) && dst != root,
          s"refusing to publish outside the landing zone: '$rel'")
        Files.createDirectories(dst.getParent)
        Files.move(src, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    deleteRecursively(staging)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteRecursively(staging)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p)) { s =>
        s.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      }
}

case class LandingCommit(files: Seq[String]) extends WriterCommitMessage

class LandingWriterFactory(staging: String, idx: (Int, Int, Int))
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LandingWriter(staging, s"p${partitionId}t$taskId", idx)
}

class LandingWriter(staging: String, taskDir: String, idx: (Int, Int, Int))
    extends DataWriter[InternalRow] {
  private val (ki, ci, mi) = idx
  private val written = scala.collection.mutable.ArrayBuffer.empty[String]
  private val taskRoot = Paths.get(staging, taskDir).toAbsolutePath.normalize()

  override def write(row: InternalRow): Unit = {
    val key = row.getUTF8String(ki).toString
    // An object key is data, not a path: reject absolute keys and keys
    // whose normalized form escapes the zone ('../x' would otherwise
    // stage — and later publish — outside the landing directory).
    val p = taskRoot.resolve(key).normalize()
    require(!Paths.get(key).isAbsolute && p.startsWith(taskRoot) && p != taskRoot,
      s"object key escapes the landing zone: '$key'")
    // Stage, record, and sidecar under the NORMALIZED relative key: a key
    // with an interior '..' ("a/../b") is in-zone but its raw form names a
    // directory that is never created — staging one form and recording the
    // other would crash the sidecar write or the commit move mid-publish.
    val rel = taskRoot.relativize(p).toString
    val body =
      if (ci >= 0 && !row.isNullAt(ci)) row.getUTF8String(ci).getBytes
      else Array.empty[Byte]
    Files.createDirectories(p.getParent)
    Files.write(p, body)
    written += s"$taskDir/$rel"
    if (mi >= 0 && !row.isNullAt(mi)) {
      val m = row.getMap(mi)
      if (m.numElements() > 0) {
        val lines = (0 until m.numElements()).map { i =>
          val mk = m.keyArray().getUTF8String(i).toString
          val mv = m.valueArray().getUTF8String(i).toString
          // the sidecar is line-oriented k=v: a '=' or newline in a key,
          // or a newline in a value, cannot round-trip — fail loudly
          // instead of silently corrupting the map on re-read
          require(!mk.exists(c => c == '=' || c == '\n' || c == '\r'),
            s"metadata key not representable in k=v sidecar: '$mk' (object '$key')")
          require(!mv.exists(c => c == '\n' || c == '\r'),
            s"metadata value for '$mk' contains a newline (object '$key')")
          s"$mk=$mv"
        }.mkString("\n")
        Files.write(taskRoot.resolve(rel + ".meta"),
          lines.getBytes(StandardCharsets.UTF_8))
        written += s"$taskDir/$rel.meta"
      }
    }
  }

  override def commit(): WriterCommitMessage = LandingCommit(written.toSeq)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

/** Stream-side admission-control knobs (`maxFilesPerTrigger` /
  * `maxBytesPerTrigger` reader options — the same spellings Spark's file
  * source uses). Bounding each micro-batch is what makes recovery sane at
  * a 100-TB landing zone: after an outage the backlog is millions of
  * objects, and an unbounded "process everything since the last commit"
  * batch is the classic recovery storm (one giant batch, no progress
  * checkpoints, restart ⇒ start over). With a limit the backlog drains in
  * ⌈N/k⌉ committed micro-batches, each a durable checkpoint.
  */
case class AdmissionLimits(maxFiles: Option[Int], maxBytes: Option[Long])

object AdmissionLimits {
  def apply(options: CaseInsensitiveStringMap): AdmissionLimits = AdmissionLimits(
    Option(options.get("maxFilesPerTrigger")).map { v =>
      val n = v.trim.toInt
      require(n > 0, s"maxFilesPerTrigger must be positive, got $v"); n
    },
    Option(options.get("maxBytesPerTrigger")).map { v =>
      val n = parseBytes(v.trim)
      require(n > 0, s"maxBytesPerTrigger must be positive, got $v"); n
    })

  /** "1048576", "512k", "100m", "1g" — the byte-string shapes Spark's own
    * size options accept (case-insensitive suffix, binary powers). */
  private def parseBytes(s: String): Long = {
    val lower = s.toLowerCase
    val (num, mult) = lower.last match {
      case 'k' => (lower.dropRight(1), 1L << 10)
      case 'm' => (lower.dropRight(1), 1L << 20)
      case 'g' => (lower.dropRight(1), 1L << 30)
      case _   => (lower, 1L)
    }
    math.multiplyExact(num.trim.toLong, mult)
  }
}

class LandingScanBuilder(
    path: String,
    limits: AdmissionLimits,
    evictAfterMs: Long = LandingLedger.DefaultEvictAfterMs) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = LandingSource.Schema
  private var pruning = KeyPruning(Nil, Nil)
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // ALL accepted filters are kept and applied conjunctively (two
    // prefixes, a prefix + an equality, …) — accepting a filter while
    // applying only the last of its kind would silently widen the scan.
    val (accepted, rejected) = filters.partition {
      case StringStartsWith("key", _) => true
      case EqualTo("key", _: String)  => true
      case _                          => false
    }
    pruning = KeyPruning(
      accepted.collect { case StringStartsWith("key", p) => p }.toSeq,
      accepted.collect { case EqualTo("key", v: String) => v }.toSeq)
    pushed = accepted
    // accepted filters are EXACT on the key (no false positives), so Spark
    // need not re-evaluate them — return only the rejected residual
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new LandingScan(path, required, pruning, limits, evictAfterMs)
}

/** Conjunction of every pushed key predicate: all prefixes AND all
  * equalities must hold for an object to be listed.
  */
case class KeyPruning(prefixes: Seq[String], equals: Seq[String]) {
  def matches(k: String): Boolean =
    prefixes.forall(k.startsWith) && equals.forall(k == _)
  override def toString: String =
    s"prefixes=[${prefixes.mkString(",")}] eq=[${equals.mkString(",")}]"
}

class LandingScan(
    path: String,
    required: StructType,
    pruning: KeyPruning,
    limits: AdmissionLimits,
    evictAfterMs: Long = LandingLedger.DefaultEvictAfterMs) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-landing $path pushed=[$pruning] cols=${required.fieldNames.mkString(",")}"

  /** Planning-time LIST + prune: non-matching keys never become
    * partitions. Driver-side listing is O(objects) names — the same cost
    * profile as Spark's file index; at real scale this is the object
    * store's prefix-filtered LIST call.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val root = Paths.get(path)
    val files = LandingLedger.walkFiles(root)
      .map(p => root.relativize(p).toString)
      .filter(pruning.matches)
      .sorted
    files.map(k => LandingPartition(path, k): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LandingReaderFactory(required)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LandingMicroBatchStream(path, required, pruning, limits, evictAfterMs)
}

object LandingLedger {
  /** List every object file under `root`, closing the directory stream
    * (Files.walk leaks a handle per call if never closed). In-flight
    * staging directories are invisible: a concurrent DSv2 write must not
    * expose half-written objects to a reader before its commit publishes
    * them.
    */
  def walkFiles(root: Path): Array[Path] =
    if (!Files.exists(root)) Array.empty
    else scala.util.Using.resource(Files.walk(root)) { s =>
      s.iterator().asScala
        .filter(Files.isRegularFile(_))
        .filterNot(_.getFileName.toString.endsWith(".meta"))
        .filterNot(p => (0 until p.getNameCount).exists(
          i => p.getName(i).toString.startsWith("._staging_")))
        .toArray
    }

  /** One object in the streaming ledger: arrival mtime, payload size, and
    * zone-relative key. Size rides along from the directory enumeration
    * (one extra `stat` per CHANGED file only) so byte-bounded admission
    * control never re-stats the backlog at planning time.
    */
  final case class LedgerEntry(mtime: Long, bytes: Long, key: String)

  /** A directory's listing, validated by the directory's own mtime.
    * `unstable` marks a directory listed within one FS-timestamp granule
    * of its mtime: a same-granule arrival after our enumeration would not
    * bump the mtime again, so such entries are never trusted on reuse.
    */
  private case class DirEntry(
      mtime: Long,
      unstable: Boolean,
      files: Array[(Long, Long, String)], // (file mtime, file bytes, file name)
      subdirs: Array[Path])

  /** Per-root directory cache plus the last drain tick that touched it —
    * the eviction unit. Keying the cache BY ROOT (instead of one flat
    * map) keeps the deletion prune's key scan O(this root's directories)
    * rather than O(every root the process ever drained), and makes
    * whole-root eviction one map removal.
    */
  private final class RootCache {
    val dirs = scala.collection.concurrent.TrieMap.empty[Path, DirEntry]
    // Born "seen": a freshly inserted root must not look ancient to a
    // concurrent eviction scan in the window between getOrElseUpdate and
    // the caller's lastSeen refresh (check-then-act race — the scan would
    // remove the instance the caller is about to populate, losing its
    // directory-cache updates and forcing a cold re-list next trigger).
    @volatile var lastSeen = System.currentTimeMillis()
    // The horizon that governs THIS root's eviction — written by the root's
    // own scans (last caller wins; a root's streams share its configuration
    // in practice), never read from another root's scan. Born at the
    // default so a root is never judged by an uninitialized horizon in the
    // window before its first scan sets it.
    @volatile var evictAfterMs = DefaultEvictAfterMs
  }

  private val roots = scala.collection.concurrent.TrieMap.empty[Path, RootCache]

  /** Roots not listed for this long lose their cache: a process that
    * drains many TRANSIENT zones (tests, per-tenant ephemeral landing
    * dirs) must not accumulate a dead directory index per zone forever.
    * The horizon is WALL-CLOCK, not a call counter: a shared global tick
    * would let a hot 1-second stream burn a co-located 10-minute stream's
    * budget between its own triggers, evicting the slow stream's index
    * before every trigger and forcing the cold O(objects) re-list the
    * cache exists to avoid (review-caught starvation). 30 min is far
    * past any trigger interval a landing stream runs at, while an
    * evicted root only pays one cold full list. The horizon is a CALL
    * PARAMETER with this default (streams thread the `evictAfterMs`
    * reader option through), not mutable process state — no global var
    * for specs to mutate and forget to restore. Scope is PER ROOT: a
    * scan's horizon is recorded on the root it scans and governs only
    * that root's eviction; the sweep judges every other root by the
    * horizon its own streams configured.
    */
  val DefaultEvictAfterMs: Long = 30L * 60 * 1000

  /** Coarsest directory-mtime resolution we defend against (ext4 is ns,
    * but FAT-ish filesystems and coarse NFS servers round to seconds). */
  private val MtimeGranuleMs = 2000L

  /** Incremental ledger: every object under `root` as (mtime, relative
    * key), re-enumerating ONLY directories whose mtime changed since the
    * previous call (plus recently-modified ones inside the mtime granule).
    * Unchanged directories cost one `stat` each and zero entry
    * enumeration — per-trigger listing work is O(directories + changed
    * entries) instead of O(objects), the difference between a usable and
    * an unusable file stream over a multi-million-object zone.
    *
    * Correctness rests on object-store semantics the connector already
    * assumes (see LandingOffset): objects are immutable — an arrival is a
    * CREATE (which bumps its parent directory's mtime), never an in-place
    * overwrite. Deletions also bump the parent, so removals invalidate
    * exactly the affected directory. The cache is self-validating, so it
    * is safely shared across stream instances and queries.
    */
  def incrementalLedger(
      root: Path,
      evictAfterMs: Long = DefaultEvictAfterMs): Array[LedgerEntry] = {
    val now = System.currentTimeMillis()
    // Evict roots nobody listed inside the wall-clock horizon. The scan
    // is over the ROOT map (zones, not directories) — a handful of
    // entries for any realistic process — so paying it per call keeps
    // eviction prompt without a timer thread. Each root is judged by ITS
    // OWN configured horizon (set by that root's scans, below), never by
    // the calling scan's: one stream configured with a small horizon must
    // not evict roots owned by other, less-frequently-triggered streams —
    // that cross-stream starvation would force the slow streams into cold
    // O(objects) re-lists on every trigger (review-caught).
    roots.foreach { case (r, rc) =>
      val staleAtScan = now - rc.lastSeen > rc.evictAfterMs
      // Re-read lastSeen (volatile) at remove time — a concurrent drain
      // that just touched this root refreshes it between the scan's read
      // and the remove — and remove only the exact instance we judged:
      // remove(k, v) never deletes a replacement another thread inserted.
      if (staleAtScan && now - rc.lastSeen > rc.evictAfterMs) roots.remove(r, rc)
    }
    if (!Files.exists(root)) {
      // A DELETED root never enters visit() (nothing to walk), so the
      // relisted-gated prune below can't fire — drop the whole cached
      // subtree here or it leaks until the root path happens to reappear.
      roots.remove(root)
      return Array.empty
    }
    val rc = roots.getOrElseUpdate(root, new RootCache)
    rc.lastSeen = now
    rc.evictAfterMs = evictAfterMs
    val dirCache = rc.dirs
    val acc = Array.newBuilder[LedgerEntry]
    val visited = scala.collection.mutable.Set.empty[Path]
    var relisted = false
    def visit(dir: Path): Unit = {
      visited += dir
      val m =
        try Files.getLastModifiedTime(dir).toMillis
        catch { case _: java.io.IOException => dirCache.remove(dir); return }
      val entry = dirCache.get(dir) match {
        case Some(e) if e.mtime == m && !e.unstable => e
        case _ => relisted = true; listDir(dirCache, dir, m)
      }
      entry.files.foreach { case (fm, sz, name) =>
        acc += LedgerEntry(fm, sz, root.relativize(dir.resolve(name)).toString)
      }
      entry.subdirs.foreach(visit)
    }
    visit(root)
    // Prune entries the walk no longer reaches: when a directory is
    // DELETED, its parent re-lists (the deletion bumped the parent's
    // mtime) and drops it from `subdirs` — so the deleted directory and
    // its whole cached subtree would otherwise sit in the cache forever.
    // A zone with daily partitions that compaction removes would leak an
    // entry (holding its full file-name array) per dead directory,
    // unboundedly, on the driver. Gated on `relisted`: a fully-quiescent
    // walk cannot have unreached entries (subdir sets are unchanged), so
    // the common steady-state trigger skips the sweep entirely; only
    // change rounds pay the key scan, and the per-root index bounds it
    // to THIS zone's directories.
    if (relisted) dirCache.keys.foreach { k =>
      if (!visited.contains(k)) dirCache.remove(k)
    }
    acc.result()
  }

  /** Cached-directory count under `root` — spec hook for the prune. */
  private[sources] def cachedDirCount(root: Path): Int =
    roots.get(root).map(_.dirs.size).getOrElse(0)

  /** Cached-root count — spec hook for transient-root eviction. */
  private[sources] def cachedRootCount: Int = roots.size

  private def listDir(
      dirCache: scala.collection.concurrent.TrieMap[Path, DirEntry],
      dir: Path, mtime: Long): DirEntry = {
    val files = Array.newBuilder[(Long, Long, String)]
    val dirs = Array.newBuilder[Path]
    try {
      scala.util.Using.resource(Files.list(dir)) { s =>
        s.iterator().asScala.foreach { p =>
          LandingSource.entriesListed.incrementAndGet()
          val name = p.getFileName.toString
          if (Files.isDirectory(p)) {
            if (!name.startsWith("._staging_")) dirs += p
          } else if (Files.isRegularFile(p) && !name.endsWith(".meta"))
            files += ((Files.getLastModifiedTime(p).toMillis, Files.size(p), name))
        }
      }
    } catch { case _: java.io.IOException => /* dir vanished mid-list */ }
    val entry = DirEntry(
      mtime,
      unstable = System.currentTimeMillis() - mtime < MtimeGranuleMs,
      files.result(), dirs.result())
    dirCache.put(dir, entry)
    entry
  }
}

/** Streaming read — the reference's S3 `ObjectCreated` trigger
  * (infra/index.ts:275-286 → lambda/handler.ts) as a DSv2
  * MicroBatchStream: each micro-batch processes the objects that arrived
  * since the last committed offset, and the checkpoint makes redelivery
  * impossible (exactly-once per object, the property the reference's
  * at-least-once Lambda + no-retry Glue combination lacks).
  *
  * The offset is NOT a row count into the re-listed ledger — indices
  * shift when objects are deleted or when a same-millisecond arrival
  * sorts before committed entries, silently skipping or re-emitting. It
  * is the arrival-order WATERMARK itself: the newest processed mtime plus
  * the exact key set carrying that mtime. An object is new iff its mtime
  * is later, or equal with an unseen key — deletions shift nothing, and
  * same-millisecond arrivals are caught by the key set. The one
  * assumption left (shared with Spark's file source) is that arrivals
  * never carry an mtime EARLIER than the committed watermark (a copy
  * preserving an old mtime, extreme clock skew).
  *
  * Unlike the reference — which processes only `Records[0]` of a
  * multi-object event (lambda/handler.ts:35, a known bug documented in
  * SURVEY §2.9) — every listed object is processed.
  */
case class LandingOffset(mtime: Long, keysAtMtime: Seq[String]) extends Offset {
  override def json(): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("mtime" -> mtime) ~ ("keys" -> keysAtMtime)))
  }
  /** O(1) membership for admits: a bulk load landing thousands of objects
    * in one mtime granule (same-millisecond writes, coarse filesystems)
    * would otherwise cost O(ledger × keys) per micro-batch plan.
    */
  @transient private lazy val keySet: Set[String] = keysAtMtime.toSet

  /** Is the ledger entry (m, k) strictly after this watermark? */
  def admits(m: Long, k: String): Boolean =
    m > mtime || (m == mtime && !keySet.contains(k))
}

object LandingOffset {
  val Start: LandingOffset = LandingOffset(Long.MinValue, Nil)

  def parse(json: String): LandingOffset = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val v = org.json4s.jackson.JsonMethods.parse(json)
    LandingOffset(
      (v \ "mtime").extract[Long],
      (v \ "keys").extract[Seq[String]])
  }
}

class LandingMicroBatchStream(
    path: String,
    required: StructType,
    pruning: KeyPruning,
    limits: AdmissionLimits,
    evictAfterMs: Long = LandingLedger.DefaultEvictAfterMs) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  import LandingLedger.LedgerEntry

  /** Per-trigger listing goes through the incremental per-directory cache:
    * a quiescent zone costs one stat per directory, an arrival re-lists
    * only its own directory. (A full `Files.walk` per trigger — O(objects)
    * — is the classic file-source scaling wall at millions of objects.)
    * Sorted by (mtime, key) — the arrival order every offset computation
    * below assumes.
    */
  private def ledger(): Array[LedgerEntry] =
    LandingLedger.incrementalLedger(Paths.get(path), evictAfterMs)
      .filter(e => pruning.matches(e.key))
      .sortBy(e => (e.mtime, e.key))

  /** Watermark covering ALL of `l` (the unbounded "everything listed"
    * offset). */
  private def unboundedLatest(l: Array[LedgerEntry]): LandingOffset =
    if (l.isEmpty) LandingOffset.Start
    else {
      val maxM = l.iterator.map(_.mtime).max
      LandingOffset(maxM, l.iterator.filter(_.mtime == maxM).map(_.key).toSeq)
    }

  /** Trigger.AvailableNow contract: snapshot the zone ONCE at query start
    * and drain (in admission-bounded micro-batches) exactly up to it, so
    * the query terminates even while new objects keep arriving.
    */
  @volatile private var availableNowCap: Option[LandingOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(unboundedLatest(ledger()))

  override def initialOffset(): Offset = LandingOffset.Start

  /** With SupportsAdmissionControl the engine always calls the two-arg
    * `latestOffset(start, limit)`; reaching this overload means a harness
    * bug, not a backlog — fail loudly rather than silently drain
    * unbounded. */
  override def latestOffset(): Offset =
    throw new IllegalStateException(
      "latestOffset(Offset, ReadLimit) should be called for an admission-controlled stream")

  override def getDefaultReadLimit: ReadLimit = {
    val ls = limits.maxFiles.map(ReadLimit.maxFiles).toSeq ++
      limits.maxBytes.map(ReadLimit.maxBytes).toSeq
    ls match {
      case Seq()    => ReadLimit.allAvailable()
      case Seq(one) => one
      case many     => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** The bounded-batch endpoint: everything past `start` (capped at the
    * AvailableNow snapshot if one is active), admitted in (mtime, key)
    * order up to the read limit. Returning `start` unchanged signals "no
    * new data" to the engine.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LandingOffset]
    val all = ledger()
    val capped = availableNowCap match {
      case Some(cap) => all.filter(e => !cap.admits(e.mtime, e.key))
      case None      => all
    }
    val pending = capped.filter(e => s.admits(e.mtime, e.key))
    val taken = admit(pending, limit)
    if (taken.isEmpty) start
    else {
      val m = taken.last.mtime
      // An admitted prefix may split an mtime granule: keys at the boundary
      // mtime that were ALREADY committed (carried in `start`) must stay in
      // the new watermark's key set, or the next batch would re-admit them
      // (duplicate emission) the moment the watermark mtime stops moving.
      val carried = if (s.mtime == m) s.keysAtMtime else Nil
      LandingOffset(m,
        carried ++ taken.iterator.filter(_.mtime == m).map(_.key).toSeq)
    }
  }

  /** Longest prefix of `pending` (already (mtime, key)-sorted) within the
    * limit. Prefix-taking is what keeps the watermark offset sound — an
    * arbitrary subset would admit out of arrival order. One object = one
    * row here, so ReadMaxRows and ReadMaxFiles coincide.
    */
  private def admit(pending: Array[LedgerEntry], limit: ReadLimit): Array[LedgerEntry] =
    limit match {
      case _: ReadAllAvailable  => pending
      case f: ReadMaxFiles      => pending.take(f.maxFiles)
      case r: ReadMaxRows       =>
        pending.take(math.min(r.maxRows, Int.MaxValue.toLong).toInt)
      case b: ReadMaxBytes      =>
        // Always admit the first object even if it alone exceeds the
        // budget: a sub-budget limit must degrade to one-object batches,
        // never stall the stream forever.
        var total = 0L
        val n = pending.indexWhere { e => total += e.bytes; total > b.maxBytes }
        if (n <= 0) pending.take(if (n == 0) 1 else pending.length)
        else pending.take(n)
      case c: CompositeReadLimit =>
        // conjunction of limits = min prefix; each pass returns a prefix,
        // so folding preserves the prefix property
        c.getReadLimits.foldLeft(pending)((acc, l) => admit(acc, l))
      case _ => pending // ReadMinRows etc.: advisory — never hold data back
    }

  override def reportLatestOffset(): Offset = unboundedLatest(ledger())

  override def deserializeOffset(json: String): Offset =
    if (json.forall(_.isDigit)) {
      // legacy row-count offset (pre-watermark checkpoints stored "N" =
      // first N ledger entries processed): migrate by re-listing and
      // taking the N-th entry's (mtime, key) as the watermark — valid
      // under the old format's own monotone-arrival assumption
      val n = json.toInt
      val l = ledger()
      if (n <= 0 || l.isEmpty) LandingOffset.Start
      else {
        val e = l(math.min(n, l.length) - 1)
        LandingOffset(e.mtime,
          l.collect { case x if x.mtime == e.mtime && x.key <= e.key => x.key }.toSeq)
      }
    } else LandingOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LandingOffset]
    val e = end.asInstanceOf[LandingOffset]
    ledger()
      .filter(x => s.admits(x.mtime, x.key) && !e.admits(x.mtime, x.key))
      .map(x => LandingPartition(path, x.key): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LandingReaderFactory(required)

  override def commit(end: Offset): Unit = () // the checkpoint IS the watermark
  override def stop(): Unit = ()
}

case class LandingPartition(root: String, key: String) extends InputPartition

class LandingReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LandingReader(partition.asInstanceOf[LandingPartition], required)
}

/** Reads ONE object; opens the body only if a payload column survived
  * pruning. Metadata sidecars are k=v lines (string→string only, matching
  * the reference's DTO constraint).
  */
class LandingReader(p: LandingPartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private var done = false

  private def needsPayload: Boolean =
    required.fieldNames.contains("content") || required.fieldNames.contains("byte_len")

  override def next(): Boolean = !done

  override def get(): InternalRow = {
    done = true
    val file = Paths.get(p.root, p.key)
    val bytes: Array[Byte] =
      if (needsPayload) {
        LandingSource.payloadReads.incrementAndGet()
        Files.readAllBytes(file)
      } else null
    val metaPath: Path = Paths.get(p.root, p.key + ".meta")
    val meta: Map[String, String] =
      if (Files.exists(metaPath))
        new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8)
          .split("\n").iterator
          .map(_.trim).filter(_.nonEmpty)
          // tolerate hand-written sidecars: a line with no '=' is skipped,
          // not a StringIndexOutOfBounds crash of the whole partition
          .flatMap { line =>
            val i = line.indexOf('=')
            if (i < 0) None else Some(line.substring(0, i) -> line.substring(i + 1))
          }.toMap
      else Map.empty
    val values = required.fieldNames.map {
      case "key"      => UTF8String.fromString(p.key)
      case "byte_len" => bytes.length
      case "content"  => UTF8String.fromBytes(bytes)
      case "metadata" =>
        ArrayBasedMapData(
          meta.keys.map(UTF8String.fromString).toArray,
          meta.values.map(UTF8String.fromString).toArray)
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = ()
}
