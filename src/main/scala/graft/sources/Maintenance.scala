package graft.sources

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Named failure for as-of-epoch reads that point past the manifest
  * retention window — the contract [[Maintenance.vacuumEpochs]] and
  * [[Maintenance.epochAsOf]] share: a read inside keep-N is stable, a
  * read past it fails HERE (at resolution), never as a dangling-path
  * parquet error far from the cause. */
final class EpochRetiredException(msg: String) extends RuntimeException(msg)

/** Named failure for epoch commits that lost a multi-writer race — the
  * CAS contract of [[Maintenance.commitEpochManifestCas]]: a committer
  * whose expected parent epoch is no longer the newest one (another
  * committer advanced the log between its read and its commit), or whose
  * manifest rename found the epoch dir already installed, fails HERE
  * with zero torn state — its generations dangle unreferenced (retired
  * later by [[Maintenance.vacuumArtifacts]]) and the winner's manifest
  * is untouched. The loser re-reads the current epoch and retries onto
  * the next epoch number with fresh generation paths. */
final class EpochConflictException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Lakehouse table-maintenance planning: the small-file compaction planner
  * behind OPTIMIZE/rewriteDataFiles in every table format — given a file
  * listing (path, size), assign files to target-sized output groups so one
  * rewrite task per group turns N small files into one right-sized file.
  *
  * The documents table stands in for the file listing (doc_id → file,
  * n_chars → size, source → table partition, matching the reference's
  * per-prefix object layout). Assignment is running-total division: files
  * ordered by id within a partition, bin = bytes-before-this-file div
  * target. Deterministic, exact integers, one window cumsum per partition
  * (single shuffle + sort) — and unlike first-fit-decreasing, it needs no
  * sequential bin state, so it parallelizes at any scale. Skew note: at
  * 100 TB a single giant partition serializes its cumsum; pre-split such
  * partitions on a hash of the file id (coarse subranges keep bins local).
  */
object Maintenance extends QueryModule {

  val TargetBytes = 65536L

  def compactionBins(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.BlockedRank
    // hierarchical per-source byte prefix (the scaladoc's pre-split,
    // implemented): partial sums per (source, doc_id-range block) →
    // per-source offsets over block summaries → per-block local cumsum.
    // Identical bins; no single-task per-source stage on a giant source.
    BlockedRank.blockedPrefix(
        Tables.documents(spark, sfDir)
          .select(col("source"), col("doc_id"), col("n_chars")),
        partition = Seq("source"),
        blocks = Seq(("__cb_b", expr("doc_id div 256"))),
        blockDesc = Seq(false),
        localOrder = Seq(col("doc_id")),
        outRank = "__cb_r", outTotalN = "__cb_n",
        values = Seq(BlockedRank.PrefixValue(
          col("n_chars").cast("long"), "__cb_cum", "__cb_tot")),
        broadcastOffsets = true)
      .withColumn("cum_before", col("__cb_cum") - col("n_chars"))
      .withColumn("bin", expr(s"cum_before div $TargetBytes"))
      .groupBy("source", "bin")
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("n_chars")).as("bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("source", "bin")
  }

  /** EXECUTE a compaction over a real partitioned-parquet directory —
    * the rewrite [[compactionBins]] only plans: per partition
    * directory, list the actual data files (driver-side, metadata
    * scale — the same listing every OPTIMIZE/rewriteDataFiles planner
    * does; java.io listing deliberately pins this harness to the local
    * filesystem, the sandbox's object-store stand-in — a deployment
    * swaps in the Hadoop FileSystem listing behind the same map),
    * assign them to bins by the identical running-total
    * division (name order, bin = bytes-before div target), then
    * rewrite so each bin becomes EXACTLY ONE output file.
    *
    * The rewrite is fully distributed: one scan of the partition tags
    * each row with its source file's bin (a broadcast basename→bin
    * literal map over `input_file_name`), a hash repartition on the
    * bin key lands every bin wholly inside one task, and a
    * `partitionBy(__bin)` write therefore emits exactly one file per
    * bin; the driver then only RENAMES those files into the final
    * `partition/compact-<bin>.parquet` layout (a metadata-scale commit,
    * like a table format's rewrite commit) — no data moves through the
    * driver. Output keeps the input's `key=value` partition directories,
    * so partition pruning is untouched, and the row payload is
    * byte-identical (`CompactionExecuteSpec` pins file-count = bin
    * count, content equality, and post-compaction pruning).
    *
    * Returns the executed report: (partition, n_files_in, n_bins).
    */
  def compactExecute(
      spark: SparkSession, tableDir: String, outDir: String,
      targetBytes: Long = TargetBytes): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val partDirs = Option(new java.io.File(tableDir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.contains("=")).sortBy(_.getName)
    val report = partDirs.toSeq.flatMap { pd =>
      val files = Option(pd.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".") && !f.getName.startsWith("_"))
        .sortBy(_.getName)
      if (files.isEmpty) None else Some {
      var cum = 0L
      val fileToBin: Map[String, Long] = files.map { f =>
        val b = cum / targetBytes; cum += f.length(); f.getName -> b
      }.toMap
      val nBins = fileToBin.values.max + 1
      val staging = s"$outDir/.staging/${pd.getName}"
      // input_file_name() returns a URI, so a name needing
      // percent-encoding (spaces etc.) differs from the raw java.io
      // listing key — match on the raw basename first, then its
      // URI-decoded form (try_url_decode: null on malformed, never
      // throws), and FAIL FAST on an unmapped file instead of letting a
      // null __bin land rows in __HIVE_DEFAULT_PARTITION__ and blow up
      // the rename loop's toLong far from the cause.
      val base = regexp_extract(input_file_name(), "[^/]+$", 0)
      spark.read.parquet(pd.toString)
        .withColumn("__bin", coalesce(
          element_at(typedlit(fileToBin), base),
          element_at(typedlit(fileToBin), try_url_decode(base)),
          raise_error(concat(
            lit(s"compactExecute: input file of ${pd.getName} missing "
              + "from the bin map: "), input_file_name()))))
        .repartition(col("__bin"))
        .write.mode("overwrite").partitionBy("__bin").parquet(staging)
      val outPart = new java.io.File(s"$outDir/${pd.getName}")
      outPart.mkdirs()
      Option(new java.io.File(staging).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("__bin=")).foreach { bd =>
          val bin = bd.getName.stripPrefix("__bin=").toLong
          val parts = bd.listFiles().filter(_.getName.endsWith(".parquet"))
          require(parts.length == 1,
            s"bin $bin of ${pd.getName} must compact to exactly one file, got ${parts.length}")
          java.nio.file.Files.move(parts.head.toPath,
            new java.io.File(outPart, f"compact-$bin%05d.parquet").toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      graft.Fs.deleteRecursively(new java.io.File(s"$outDir/.staging"))
      Row(pd.getName, files.length.toLong, nBins)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(report, 1),
      StructType(Seq(
        StructField("partition", StringType),
        StructField("n_files_in", LongType),
        StructField("n_bins", LongType))))
  }

  /** Standing-artifact retention — the missing lifecycle half of the
    * fingerprint-keyed memo zones (band index `graft_dedup/<sha256>/`,
    * IVF index `graft_sim/<sha256>/`, components prior
    * `graft_graph/<sha256>/`): every corpus regeneration mints a new
    * fingerprint directory and nothing ever removed the superseded
    * ones, so at a real deployment the zones grow monotonically.
    * This is `CdcApply`'s keep-N vacuum discipline applied to the
    * memos. Policy, stated precisely:
    *
    *  - a child whose name is in `live` (the fingerprints current memo
    *    entries point at) is NEVER touched — a concurrent reader of the
    *    live artifact sees a complete, unmodified directory throughout;
    *  - of the remaining artifact dirs, the `keepN` most recently
    *    modified survive (rollback/debug window, like CdcApply's old
    *    versions), the rest are deleted;
    *  - `writeParquetAtomic` residue (`.tmp.<uuid>` / `.trash.<uuid>`
    *    siblings) is deleted only past `residueTtlMs` — a FRESH temp may
    *    be another process's in-flight build, so age, not name, decides.
    *    Residue is swept at BOTH levels: zone children and inside each
    *    surviving fingerprint dir — the atomic writer leaves its temps
    *    as siblings of the artifact (`<zone>/<sha256>/ivf_index.tmp.*`),
    *    one level below the fingerprint dirs the retention pass ranks.
    *
    * Driver-side java.io listing by design: the zones live on the local
    * filesystem (the sandbox's object-store stand-in), and a vacuum is a
    * metadata-scale pass — children are fingerprints, not data files.
    * Returns the deleted paths (sorted) for the audit log.
    */
  def vacuumArtifacts(
      zoneDir: java.io.File,
      live: Set[String],
      keepN: Int = 2,
      residueTtlMs: Long = 24L * 3600 * 1000,
      now: Long = System.currentTimeMillis()): Seq[String] = {
    def isResidue(f: java.io.File): Boolean =
      f.getName.contains(".tmp.") || f.getName.contains(".trash.")
    val children = Option(zoneDir.listFiles()).getOrElse(Array.empty).toSeq
    val (zoneResidue, artifacts) = children.partition(isResidue)
    val superseded = artifacts.filterNot(f => live.contains(f.getName))
      .sortBy(f => (-f.lastModified(), f.getName)).drop(keepN)
    // writeParquetAtomic residue lives as a SIBLING of the artifact —
    // one level BELOW the fingerprint dirs this zone scan sees
    // (<zone>/<sha256>/ivf_index.tmp.<uuid>), so sweep the surviving
    // fingerprint dirs' children too; residue directly at zone level is
    // covered for layouts that key artifacts flat.
    val survivors = artifacts.filterNot(superseded.contains)
    val residue = zoneResidue ++ survivors.flatMap(d =>
      Option(d.listFiles()).getOrElse(Array.empty).filter(isResidue))
    val staleResidue = residue.filter(f => now - f.lastModified() > residueTtlMs)
    val victims = staleResidue ++ superseded
    victims.foreach(graft.Fs.deleteRecursively)
    victims.map(_.getPath).sorted
  }

  /** Physically propagate a takedown into a standing parquet artifact —
    * the filesystem half of the [[graft.llm.Forget]] cascade: rewrite
    * ONLY the part files that contain deleted keys and carry every other
    * file over BYTE-IDENTICAL into a new atomically-installed generation.
    *
    * Why file-incremental instead of `read → anti-join → overwrite`: at
    * 100 TB the standing zones (band index, IVF postings, cluster
    * registry) are the corpus-scale artifacts themselves, and a takedown
    * of 0.01% of keys must not rewrite the other 99.99% — object-store
    * PUTs are the cost, not the anti-join. The probe that finds touched
    * files is a key-column-only scan (ReadSchema prunes to `keyCol` +
    * filename), which parquet serves from the key's column chunks alone;
    * a min/max-clustered layout (layout_zorder's discipline) turns it
    * into footer-stats pruning. The local `Files.copy` of untouched
    * files is the sandbox stand-in for an object-store metadata retain
    * (manifest re-point / server-side copy) — the spec pins
    * byte-identity so the claim "untouched files are NOT reprocessed" is
    * checkable, not aspirational.
    *
    * Install discipline: assemble into a process-unique `.tmp.<uuid>`
    * sibling of `target`, stamp `_SUCCESS`, then one atomic rename —
    * readers of the new generation see absent-then-complete, never
    * partial (the [[graft.Fs.writeParquetAtomic]] contract; generations
    * are retired by [[vacuumArtifacts]]). `input_file_name()` basenames
    * are URI-encoded, so matching against the raw java.io listing goes
    * raw-first-then-decoded and FAILS FAST on an unmapped file (the
    * compactExecute lesson).
    *
    * Returns (installed path, rewritten basenames sorted).
    */
  def forgetArtifacts(
      spark: SparkSession,
      artifactDir: String,
      keyCol: String,
      deleted: DataFrame,
      target: java.nio.file.Path): (String, Seq[String]) = {
    import java.nio.file.{Files, StandardCopyOption}
    // fail fast on a pre-existing target: generations are immutable once
    // installed, and without this check a retried epoch pays the whole
    // copy/rewrite assembly before ATOMIC_MOVE throws an unexplained
    // DirectoryNotEmptyException at the very end (review-caught). A
    // retry must install into a FRESH generation path; superseded
    // generations retire via [[vacuumArtifacts]].
    require(!Files.exists(target),
      s"forgetArtifacts: target generation $target already exists — " +
        "install each (retried) epoch into a fresh generation path")
    val del = deleted.select(col(keyCol)).distinct()
    // FLAT artifacts only: the memo zones this targets (band index, IVF
    // index) are single-level parquet dirs. A partitioned layout would
    // nest data files the listing below never sees — they'd be neither
    // carried nor rewritten, and the marker-complete install would
    // silently ship a data-losing generation (review-caught). Fail fast
    // instead; a partitioned zone cascades per partition directory.
    val children = Option(new java.io.File(artifactDir).listFiles())
      .getOrElse(Array.empty)
    val nestedData = children.filter(f => f.isDirectory &&
      !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    require(nestedData.isEmpty,
      s"forgetArtifacts: $artifactDir is not a flat artifact (found " +
        s"subdirectories ${nestedData.map(_.getName).mkString(", ")}); " +
        "cascade each partition directory separately")
    val srcFiles = children
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    require(srcFiles.nonEmpty,
      s"forgetArtifacts: no parquet part files in $artifactDir")
    val touchedRaw = spark.read.parquet(artifactDir)
      .select(col(keyCol),
        regexp_extract(input_file_name(), "[^/]+$", 0).as("__base"))
      .join(broadcast(del), Seq(keyCol), "left_semi")
      .select("__base").distinct()
      .collect().map(_.getString(0)).toSet
    val rawNames = srcFiles.map(_.getName).toSet
    val touched = touchedRaw.map { b =>
      if (rawNames.contains(b)) b
      else {
        val dec = scala.util.Try(
          java.net.URLDecoder.decode(b, "UTF-8")).toOption
        dec.filter(rawNames.contains).getOrElse(sys.error(
          s"forgetArtifacts: scanned file '$b' missing from $artifactDir listing"))
      }
    }
    val (rewrite, carry) = srcFiles.partition(f => touched.contains(f.getName))
    val tmp = target.resolveSibling(
      s"${target.getFileName}.tmp.${java.util.UUID.randomUUID().toString}")
    val staging = target.resolveSibling(
      s"${target.getFileName}.tmp.staging.${java.util.UUID.randomUUID().toString}")
    // failure cleanup: a throw mid-assembly must not leak half-built
    // directories beside the target (a leaked dir that doesn't match the
    // vacuum's residue patterns would squat a keep-N retention slot —
    // review-caught; both names carry ".tmp." so the TTL sweep covers
    // whatever a hard kill still leaves)
    try {
      Files.createDirectories(tmp)
      carry.foreach(f => Files.copy(f.toPath, tmp.resolve(f.getName)))
      if (rewrite.nonEmpty) {
        spark.read.parquet(rewrite.map(_.getPath).toIndexedSeq: _*)
          .join(broadcast(del), Seq(keyCol), "left_anti")
          .write.mode("overwrite").parquet(staging.toString)
        Option(staging.toFile.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet")).foreach { p =>
            require(!Files.exists(tmp.resolve(p.getName)),
              s"forgetArtifacts: rewrite part ${p.getName} collides with a carried file")
            Files.move(p.toPath, tmp.resolve(p.getName))
          }
      }
      Files.createFile(tmp.resolve("_SUCCESS"))
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case e: Throwable =>
        graft.Fs.deleteRecursively(tmp.toFile)
        throw e
    } finally {
      graft.Fs.deleteRecursively(staging.toFile)
    }
    (target.toString, rewrite.map(_.getName).toSeq)
  }

  /** One HARD-DELETE EPOCH — the composed lifecycle step the forget
    * scaladocs describe, as executable code: read the accumulated
    * tombstone queue, cascade it through EVERY standing artifact zone
    * ([[forgetArtifacts]] per zone — file-incremental, atomic
    * generations), consolidate the consumed batch dirs into one compact
    * tombstone generation, and return the epoch report (one row per
    * artifact + one for the queue). After this, the superseded artifact
    * generations and the old batch-dir zone retire through
    * [[vacuumArtifacts]] like anything else — the spec composes all
    * three. Counts are parquet-metadata reads (row-group stats), not
    * data scans, so the report stays cheap at any zone size.
    */
  def hardDeleteEpoch(
      spark: SparkSession,
      tombstoneDir: String,
      artifacts: Seq[(String, String, java.nio.file.Path)],
      consolidatedTarget: java.nio.file.Path): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // persist: the queue frame is re-referenced ~2x per zone (touched-file
    // probe + rewrite anti-join) and once at consolidation — unpersisted,
    // each reference re-reads every batch dir and re-runs distinct
    // (review-caught)
    val del = spark.read.parquet(tombstoneDir).select("doc_id")
      .distinct().persist()
    val rows = artifacts.map { case (dir, keyCol, target) =>
      val before = spark.read.parquet(dir).count()
      val (installed, rewritten) = forgetArtifacts(
        spark, dir, keyCol, del.withColumnRenamed("doc_id", keyCol), target)
      val after = spark.read.parquet(installed).count()
      Row(dir, keyCol, rewritten.length.toLong, before - after)
    }
    graft.Fs.writeParquetAtomic(del, consolidatedTarget)
    del.unpersist(blocking = false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("zone", StringType),
        StructField("key_col", StringType),
        StructField("files_rewritten", LongType),
        StructField("rows_removed", LongType))))
  }

  /** CROSS-ZONE epoch atomicity — the gap [[hardDeleteEpoch]] leaves:
    * each zone's generation installs atomically, but a crash BETWEEN
    * zone installs leaves a mixed-generation view if readers resolve
    * zones by their standing paths. The fix every table format uses
    * (Iceberg/Delta's commit pointer, applied across zones): a single
    * EPOCH MANIFEST — one row per zone mapping it to the generation
    * path this epoch installed — written via [[graft.Fs
    * .writeParquetAtomic]]'s rename discipline and written LAST, so the
    * manifest IS the commit point. Readers resolve every standing zone
    * through [[currentEpoch]]/[[readZoneThroughManifest]]; generation
    * dirs a crashed epoch left behind are unreachable garbage (retired
    * by [[vacuumArtifacts]] — they are plain unreferenced generations),
    * never a torn view. `EpochManifestSpec` injects the crash between
    * zone N and N+1 and pins that readers still see epoch E−1
    * coherently, then that a RETRIED epoch (fresh generation paths — the
    * [[forgetArtifacts]] fail-fast enforces freshness) flips both zones
    * at once.
    */
  def hardDeleteEpochManifested(
      spark: SparkSession,
      tombstoneDir: String,
      artifacts: Seq[(String, String, String, java.nio.file.Path)],
      consolidatedTarget: java.nio.file.Path,
      manifestDir: java.nio.file.Path,
      epoch: Long,
      schemaVersions: Map[String, Long] = Map.empty): DataFrame = {
    // duplicate zone names would put two rows in the manifest and
    // currentEpoch's .toMap silently keeps the last — the exact silent-
    // shadowing class the query registries guard with disjoint()
    // (advisor-caught); fail before any generation installs
    requireDistinctZones(artifacts.map(_._1), "hardDeleteEpochManifested")
    // multi-writer safety: remember the epoch this committer READ the
    // table at, fail fast on a stale/duplicate epoch number before the
    // cascade runs, and make the final commit conditional on that parent
    // (commitEpochManifestCas) — a racing committer that advanced the
    // log in between makes THIS one fail cleanly instead of silently
    // overwriting the log (lost update)
    val parent = completeEpochDirs(manifestDir.toFile).headOption.map(_._1)
    parent.foreach(p => if (p >= epoch) throw new EpochConflictException(
      s"hardDeleteEpochManifested: epoch $epoch is not newer than the " +
        s"committed epoch $p in $manifestDir — re-read the current epoch " +
        "and retry onto a fresh epoch number"))
    val report = hardDeleteEpoch(spark, tombstoneDir,
      artifacts.map { case (_, dir, keyCol, target) => (dir, keyCol, target) },
      consolidatedTarget)
    commitEpochManifestCas(spark,
      artifacts.map { case (zone, _, keyCol, target) =>
        (zone, target.toString, keyCol) },
      manifestDir, epoch, parent, schemaVersions)
    report
  }

  private def requireDistinctZones(zones: Seq[String], who: String): Unit = {
    val dup = zones.groupBy(identity).collect {
      case (z, hits) if hits.size > 1 => z }
    require(dup.isEmpty,
      s"$who: duplicate zone name(s) in artifacts: ${dup.toSeq.sorted.mkString(", ")}")
  }

  /** Write the epoch manifest — the COMMIT POINT of any multi-zone
    * install, extracted so initial installs ([[epochTravel]]'s epoch 1)
    * and hard-delete epochs share one discipline: zones = (zone name,
    * installed generation path, key column), written LAST via the
    * atomic-rename contract; until the rename lands every generation the
    * epoch installed is unreachable through the manifest. */
  def commitEpochManifest(
      spark: SparkSession,
      zones: Seq[(String, String, String)],
      manifestDir: java.nio.file.Path,
      epoch: Long,
      schemaVersions: Map[String, Long] = Map.empty): Unit = {
    requireDistinctZones(zones.map(_._1), "commitEpochManifest")
    graft.Fs.writeParquetAtomic(
      manifestFrame(spark, zones, epoch, schemaVersions),
      manifestDir.resolve(f"epoch-$epoch%09d"))
  }

  private def manifestFrame(
      spark: SparkSession,
      zones: Seq[(String, String, String)],
      epoch: Long,
      schemaVersions: Map[String, Long]): DataFrame =
    spark.createDataFrame(
      zones.map { case (zone, gen, keyCol) =>
        (epoch, zone, gen, keyCol, schemaVersions.getOrElse(zone, 1L)) })
      .toDF("epoch", "zone", "generation", "key_col", "zone_schema_version")

  /** MULTI-WRITER-SAFE epoch commit — the conditional (CAS) variant of
    * [[commitEpochManifest]] for committers that read table state before
    * rewriting it ([[hardDeleteEpochManifested]], [[optimizeZoneEpoch]]):
    * two such committers racing the same log could otherwise both read
    * epoch E, both build E+1-shaped manifests, and the last rename would
    * silently win — a lost update on the commit log itself.
    *
    * The commit is conditional on `expectedParent`, the epoch the
    * committer READ its inputs at (None ⇒ the log must be empty):
    *  1. read-check — if the newest complete epoch ≠ expectedParent, a
    *     concurrent committer advanced the log since the read → throw
    *     [[EpochConflictException]] before installing anything;
    *  2. rename-CAS — the manifest is assembled in a `.tmp.<uuid>`
    *     sibling and installed by ONE atomic rename onto the epoch dir.
    *     Two racers that both passed the read-check contend on that
    *     rename: the filesystem lets exactly one `ATOMIC_MOVE` create
    *     the directory, so the loser's rename fails and maps to
    *     [[EpochConflictException]] — the rename IS the missing CAS
    *     (this is why the idempotent [[graft.Fs.writeParquetAtomic]],
    *     which treats an existing complete target as its own success,
    *     cannot be the committer here: a loser would "succeed" while
    *     pointing at the winner's DIFFERENT manifest).
    *
    * Either failure leaves zero torn state: the winner's manifest is
    * untouched, the loser's generations are unreachable garbage for
    * [[vacuumArtifacts]], and the loser retries by re-reading the
    * current epoch and committing onto the NEXT number with fresh
    * generation paths (`EpochConflictSpec` interleaves a hard-delete
    * and an optimize to pin exactly this). This makes the reference's
    * implicit `maxConcurrentRuns: 1` envelope an enforced invariant
    * instead of an assumption (reference `infra/index.ts:178-180`). */
  def commitEpochManifestCas(
      spark: SparkSession,
      zones: Seq[(String, String, String)],
      manifestDir: java.nio.file.Path,
      epoch: Long,
      expectedParent: Option[Long],
      schemaVersions: Map[String, Long] = Map.empty): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    requireDistinctZones(zones.map(_._1), "commitEpochManifestCas")
    require(expectedParent.forall(_ < epoch),
      s"commitEpochManifestCas: epoch $epoch must exceed its expected " +
        s"parent ${expectedParent.get}")
    val newest = completeEpochDirs(manifestDir.toFile).headOption.map(_._1)
    if (newest != expectedParent) throw new EpochConflictException(
      s"commit of epoch $epoch expected parent ${expectedParent.getOrElse("<empty log>")} " +
        s"but the newest committed epoch is ${newest.getOrElse("<empty log>")} in " +
        s"$manifestDir — a concurrent committer advanced the log; re-read " +
        "the current epoch and retry onto a fresh epoch number")
    val target = manifestDir.resolve(f"epoch-$epoch%09d")
    val tmp = target.resolveSibling(
      s"${target.getFileName}.tmp.${java.util.UUID.randomUUID().toString}")
    manifestFrame(spark, zones, epoch, schemaVersions)
      .write.mode("overwrite").parquet(tmp.toString)
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileSystemException =>
        graft.Fs.deleteRecursively(tmp.toFile)
        throw new EpochConflictException(
          s"epoch dir $target already exists — a concurrent committer won " +
            "the rename; re-read the current epoch and retry onto a fresh " +
            "epoch number", e)
    }
  }

  /** The manifested schema version of `zone` as of `asOfEpoch` — 1 for
    * manifests written before the column existed (the manifest's own
    * schema evolution, handled by exactly the discipline it records). */
  def zoneSchemaVersion(
      spark: SparkSession, manifestDir: java.io.File, zone: String,
      asOfEpoch: Long = Long.MaxValue): Long = {
    val (epoch, zones) = epochAsOf(spark, manifestDir, asOfEpoch).getOrElse(
      sys.error(s"zoneSchemaVersion: no complete epoch in $manifestDir"))
    require(zones.contains(zone),
      s"zoneSchemaVersion: zone '$zone' absent from epoch $epoch")
    val d = completeEpochDirs(manifestDir).find(_._1 == epoch).get._2
    val m = spark.read.parquet(d.toString)
    if (!m.columns.contains("zone_schema_version")) 1L
    else m.filter(col("zone") === zone)
      .select("zone_schema_version").collect().head.getLong(0)
  }

  /** SCHEMA-EVOLVED zone read: resolve the generation through the epoch
    * manifest ([[readZoneThroughManifest]]) and align it to the CURRENT
    * code's schema — every column in `defaults` that the stored
    * generation lacks is filled with its default literal. This is the
    * versioned read path that keeps old generations readable after a
    * code upgrade adds columns to a standing zone: a v1 generation read
    * through v2 code yields the v2 shape (defaults filled), a v2
    * generation yields its real values, and frames from generations of
    * DIFFERENT versions union by name without error — so epoch time
    * travel keeps working across upgrades instead of orphaning every
    * pre-upgrade generation. Columns the generation has but `defaults`
    * doesn't are passed through untouched (upgrades only ADD here;
    * a column REMOVAL is a breaking change that mints a new zone name).
    */
  def readZoneEvolved(
      spark: SparkSession, manifestDir: java.io.File, zone: String,
      defaults: Seq[(String, org.apache.spark.sql.Column)],
      asOfEpoch: Long = Long.MaxValue): DataFrame = {
    val raw = readZoneThroughManifest(spark, manifestDir, zone, asOfEpoch)
    defaults.foldLeft(raw) { case (df, (name, dflt)) =>
      if (df.columns.contains(name)) df else df.withColumn(name, dflt)
    }
  }

  /** All COMPLETE epoch manifest dirs in `manifestDir`, newest first.
    * Manifest dirs install via the atomic-rename discipline, so presence
    * of `_SUCCESS` ⇒ complete; in-flight `.tmp.*` / `.trash.*` residue is
    * skipped by name, exactly as [[vacuumArtifacts]] classifies it. */
  private def completeEpochDirs(
      manifestDir: java.io.File): Seq[(Long, java.io.File)] =
    Option(manifestDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("epoch-") &&
        !d.getName.contains(".tmp.") && !d.getName.contains(".trash.") &&
        new java.io.File(d, "_SUCCESS").exists())
      .flatMap(d => scala.util.Try(
        d.getName.stripPrefix("epoch-").toLong).toOption.map(_ -> d))
      .sortBy { case (e, _) => -e }.toSeq

  private def readManifest(
      spark: SparkSession, d: java.io.File): Map[String, String] =
    spark.read.parquet(d.toString).collect()
      .map(r => r.getAs[String]("zone") -> r.getAs[String]("generation"))
      .toMap

  /** The newest COMPLETE epoch in `manifestDir`: (epoch, zone →
    * generation path). */
  def currentEpoch(
      spark: SparkSession,
      manifestDir: java.io.File): Option[(Long, Map[String, String])] =
    epochAsOf(spark, manifestDir, Long.MaxValue)

  /** TIME TRAVEL resolution: the newest complete epoch ≤ `asOf` — the
    * as-of-timestamp read of every table format, on the discrete epoch
    * axis. Distinguishes the three outcomes precisely:
    *  - no manifest at all → None (the zone was never manifested);
    *  - a complete epoch ≤ asOf exists → Some(it) — stable under newer
    *    epochs landing, because manifests are immutable once installed;
    *  - manifests exist but ALL are newer than asOf → the requested
    *    epoch predates the retention window ([[vacuumEpochs]] retired
    *    its manifest) → [[EpochRetiredException]], named and thrown at
    *    resolution, not as a dangling-path read later. */
  def epochAsOf(
      spark: SparkSession, manifestDir: java.io.File,
      asOf: Long): Option[(Long, Map[String, String])] = {
    val all = completeEpochDirs(manifestDir)
    if (all.isEmpty) None
    else all.find { case (e, _) => e <= asOf } match {
      case Some((e, d)) => Some((e, readManifest(spark, d)))
      case None =>
        // two causes land here and the message must not blame the wrong
        // one (advisor-caught): when the oldest retained epoch is the
        // first epoch a log can have (1), nothing below it ever existed —
        // the asOf simply predates the table; otherwise older manifests
        // may have been retired by vacuumEpochs (or the log genuinely
        // started above 1 — indistinguishable once retired, so say both).
        val oldest = all.last._1
        throw new EpochRetiredException(
          if (oldest <= 1L)
            s"epoch as-of $asOf predates epoch $oldest, the FIRST epoch " +
              s"ever committed to $manifestDir — nothing was retired; no " +
              "manifest can exist at or below that asOf"
          else
            s"epoch as-of $asOf predates the retention window of " +
              s"$manifestDir (oldest retained epoch: $oldest) — either " +
              "vacuumEpochs retired the older manifests (raise keepN to " +
              "widen the rollback window) or the log never had an epoch " +
              "that old")
    }
  }

  /** Reader-side resolution: a standing zone's generation AS OF
    * `asOfEpoch` (default: current), via the epoch manifests — the one
    * seam every reader of the standing zones goes through once epochs
    * are manifested. An as-of read is stable while newer epochs land
    * (manifests and generations are immutable once installed) for as
    * long as [[vacuumEpochs]]/[[vacuumArtifacts]] retain them. */
  def readZoneThroughManifest(
      spark: SparkSession, manifestDir: java.io.File, zone: String,
      asOfEpoch: Long = Long.MaxValue): DataFrame = {
    val (epoch, zones) = epochAsOf(spark, manifestDir, asOfEpoch).getOrElse(
      sys.error(s"readZoneThroughManifest: no complete epoch in $manifestDir"))
    val gen = zones.getOrElse(zone, sys.error(
      s"readZoneThroughManifest: zone '$zone' absent from epoch $epoch " +
        s"(zones: ${zones.keys.toSeq.sorted.mkString(", ")})"))
    spark.read.parquet(gen)
  }

  /** Full manifest rows (zone, generation, key_col, schema_version) of
    * the newest complete epoch ≤ `asOf` — what epoch-rewriting
    * operations ([[optimizeZoneEpoch]]) need beyond [[epochAsOf]]'s
    * zone→generation map: the untouched zones' key columns and schema
    * versions must carry forward verbatim into the new manifest. */
  def manifestRowsAsOf(
      spark: SparkSession, manifestDir: java.io.File,
      asOf: Long = Long.MaxValue): (Long, Seq[(String, String, String, Long)]) = {
    val (epoch, _) = epochAsOf(spark, manifestDir, asOf).getOrElse(
      sys.error(s"manifestRowsAsOf: no complete epoch in $manifestDir"))
    val d = completeEpochDirs(manifestDir).find(_._1 == epoch).get._2
    val m = spark.read.parquet(d.toString)
    val hasV = m.columns.contains("zone_schema_version")
    (epoch, m.collect().toSeq.map { r =>
      (r.getAs[String]("zone"), r.getAs[String]("generation"),
        r.getAs[String]("key_col"),
        if (hasV) r.getAs[Long]("zone_schema_version") else 1L)
    })
  }

  /** OPTIMIZE as an EPOCH COMMIT — the missing lifecycle verb between
    * hard-delete epochs and retention: small-file compaction of ONE
    * standing zone's current generation, installed as a NEW generation
    * and committed through the manifest, so readers flip atomically,
    * the superseded (fragmented) generation stays time-travel-readable
    * until retention retires it, and every OTHER zone's generation +
    * key column + schema version carries forward verbatim. This is
    * exactly what a table format's OPTIMIZE/rewriteDataFiles commit
    * does; here it reuses [[compactionBins]]'s running-total division
    * (bin = bytes-before div target, name order), the
    * `input_file_name`→bin literal-map tagging of [[compactExecute]]
    * (raw-then-decoded basename match, fail fast on an unmapped file),
    * and the assemble → `_SUCCESS` → one-atomic-rename install of
    * [[forgetArtifacts]]. One file per bin by construction (hash
    * repartition on the bin key lands each bin wholly in one task).
    * Returns (installed path, files in, bins out). */
  def optimizeZoneEpoch(
      spark: SparkSession,
      manifestDir: java.io.File,
      zone: String,
      target: java.nio.file.Path,
      epoch: Long,
      targetBytes: Long = TargetBytes): (String, Long, Long) = {
    import java.nio.file.{Files, StandardCopyOption}
    require(!Files.exists(target),
      s"optimizeZoneEpoch: target generation $target already exists — " +
        "install each (retried) epoch into a fresh generation path")
    val (parent, rows) = manifestRowsAsOf(spark, manifestDir)
    // fail fast at entry on a stale/duplicate epoch number (advisor-
    // caught): committing with epoch <= current would either collide
    // with an existing epoch dir or silently install a manifest that
    // newest-wins readers never see — AFTER the generation rewrite
    // already ran. The commit below is additionally CAS-conditional on
    // `parent`, so a committer that raced past this check still fails
    // cleanly instead of lost-updating the log.
    if (parent >= epoch) throw new EpochConflictException(
      s"optimizeZoneEpoch: epoch $epoch is not newer than the committed " +
        s"epoch $parent in $manifestDir — re-read the current epoch and " +
        "retry onto a fresh epoch number")
    val cur = rows.find(_._1 == zone).getOrElse(sys.error(
      s"optimizeZoneEpoch: zone '$zone' absent from the current epoch " +
        s"(zones: ${rows.map(_._1).sorted.mkString(", ")})"))
    val srcFiles = Option(new java.io.File(cur._2).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    require(srcFiles.nonEmpty,
      s"optimizeZoneEpoch: no parquet part files in ${cur._2}")
    var cum = 0L
    val fileToBin: Map[String, Long] = srcFiles.map { f =>
      val b = cum / targetBytes; cum += f.length(); f.getName -> b
    }.toMap
    val nBins = fileToBin.values.max + 1
    val base = regexp_extract(input_file_name(), "[^/]+$", 0)
    val tmp = target.resolveSibling(
      s"${target.getFileName}.tmp.${java.util.UUID.randomUUID().toString}")
    val staging = target.resolveSibling(
      s"${target.getFileName}.tmp.staging.${java.util.UUID.randomUUID().toString}")
    try {
      spark.read.parquet(cur._2)
        .withColumn("__bin", coalesce(
          element_at(typedlit(fileToBin), base),
          element_at(typedlit(fileToBin), try_url_decode(base)),
          raise_error(concat(
            lit(s"optimizeZoneEpoch: input file of $zone missing from the "
              + "bin map: "), input_file_name()))))
        .repartition(col("__bin"))
        .write.mode("overwrite").partitionBy("__bin").parquet(staging.toString)
      Files.createDirectories(tmp)
      Option(staging.toFile.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("__bin=")).foreach { bd =>
          val bin = bd.getName.stripPrefix("__bin=").toLong
          val parts = bd.listFiles().filter(_.getName.endsWith(".parquet"))
          require(parts.length == 1,
            s"bin $bin must compact to exactly one file, got ${parts.length}")
          Files.move(parts.head.toPath,
            tmp.resolve(f"compact-$bin%05d.parquet"))
        }
      Files.createFile(tmp.resolve("_SUCCESS"))
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case e: Throwable =>
        graft.Fs.deleteRecursively(tmp.toFile)
        throw e
    } finally {
      graft.Fs.deleteRecursively(staging.toFile)
    }
    commitEpochManifestCas(spark,
      rows.map { case (z, gen, keyCol, _) =>
        (z, if (z == zone) target.toString else gen, keyCol) },
      manifestDir.toPath, epoch, Some(parent),
      rows.map { case (z, _, _, v) => z -> v }.toMap)
    (target.toString, srcFiles.length.toLong, nBins)
  }

  /** Retire epoch manifests past the newest `keepN` — the retention half
    * of epoch time travel, [[vacuumArtifacts]]'s keep-N discipline on the
    * manifest axis. After this, [[epochAsOf]] reads inside the window
    * keep resolving (manifests are immutable), and reads past it fail
    * with the named [[EpochRetiredException]]. The GENERATIONS a retired
    * manifest referenced become plain unreferenced artifacts — pass
    * [[manifestLiveGenerations]] as the zone vacuum's `live` set so
    * retained epochs' generations are never swept out from under an
    * as-of reader. Returns the deleted manifest paths (sorted). */
  def vacuumEpochs(manifestDir: java.io.File, keepN: Int = 2): Seq[String] = {
    require(keepN >= 1, s"vacuumEpochs: keepN must be >= 1, got $keepN " +
      "(retiring every manifest would leave the zones unreadable)")
    val victims = completeEpochDirs(manifestDir).drop(keepN).map(_._2)
    victims.foreach(graft.Fs.deleteRecursively)
    victims.map(_.getPath).sorted
  }

  /** ONE operational retention pass over an epoch-manifested deployment —
    * the composition a real operator runs on a schedule, sequenced so
    * nothing an as-of reader can still resolve is ever swept: (1) retire
    * epoch manifests past the newest `keepEpochs` ([[vacuumEpochs]]);
    * (2) recompute the live set from the manifests that SURVIVED
    * ([[manifestLiveGenerations]] — live shrinks exactly when the
    * rollback window does); (3) vacuum each generation zone with that
    * live set, keeping `keepUnreferenced` newest unreferenced
    * generations as debris slack ([[vacuumArtifacts]] — also sweeps
    * aged atomic-writer residue). The rollback window and the disk
    * footprint shrink together under one knob. Returns every deleted
    * path (manifests + generations + residue), sorted. */
  def retentionSweep(
      spark: SparkSession,
      manifestDir: java.io.File,
      zoneDirs: Seq[java.io.File],
      keepEpochs: Int = 2,
      keepUnreferenced: Int = 0,
      residueTtlMs: Long = 24L * 3600 * 1000,
      now: Long = System.currentTimeMillis()): Seq[String] = {
    // the commit log must not live inside — or BE — a swept zone:
    // vacuumArtifacts retires any unreferenced child, and the retained
    // epoch-* manifest dirs are never in the live set, so sweeping the
    // manifest dir itself would destroy the commit log just as surely as
    // sweeping a zone that nests it (advisor-caught: the original guard
    // only rejected strict nesting)
    zoneDirs.foreach { z =>
      require(manifestDir.getCanonicalPath != z.getCanonicalPath &&
          !manifestDir.getCanonicalPath.startsWith(
            z.getCanonicalPath + java.io.File.separator),
        s"retentionSweep: manifest dir $manifestDir is (or lives inside) " +
          s"zone dir $z — the sweep would retire the commit log itself; " +
          "keep manifests outside the generation zones")
    }
    val goneManifests = vacuumEpochs(manifestDir, keepEpochs)
    val live = manifestLiveGenerations(spark, manifestDir)
    val goneGens = zoneDirs.flatMap(z =>
      vacuumArtifacts(z, live, keepUnreferenced, residueTtlMs, now))
    (goneManifests ++ goneGens).sorted
  }

  /** The generation-dir BASENAMES referenced by any retained manifest —
    * the `live` set for [[vacuumArtifacts]] over a generation zone:
    * every generation inside the epoch retention window must survive
    * artifact vacuums, or an as-of read resolves to a deleted path. */
  def manifestLiveGenerations(
      spark: SparkSession, manifestDir: java.io.File): Set[String] =
    completeEpochDirs(manifestDir).flatMap { case (_, d) =>
      readManifest(spark, d).values.map(p => new java.io.File(p).getName)
    }.toSet

  /** The epoch-travel demo's delete predicate (doc_id % Mod == Rem) —
    * shared verbatim by the builder and the DuckDB oracle. */
  private[graft] val EpochDelMod = 17L
  private[graft] val EpochDelRem = 3L

  /** (JVM, corpus fingerprint) → a standing two-epoch compliance zone:
    * epoch 1 = the full documents projection installed and manifested,
    * epoch 2 = a REAL hard-delete epoch over it ([[forgetArtifacts]]'s
    * file-incremental cascade through [[hardDeleteEpochManifested]],
    * tombstones = doc_id % [[EpochDelMod]] == [[EpochDelRem]]). Built
    * once per corpus fingerprint; every build step is the idempotent
    * atomic-rename writer, the epoch-2 generation gets a fresh
    * process-unique path per attempt (the [[forgetArtifacts]] retry
    * contract — a loser's generation dangles unreferenced, the epoch-2
    * manifest write resolves the race), and the epoch-2 manifest is the
    * completion marker. */
  private val epochDemoMemo = scala.collection.mutable.Map[String, java.io.File]()

  private[graft] def epochDemoRoot(
      spark: SparkSession, sfDir: String): java.io.File =
    epochDemoMemo.synchronized {
      val key = s"$sfDir@${graft.llm.Bpe.corpusFingerprint(spark, sfDir)}"
      epochDemoMemo.getOrElseUpdate(key, {
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val root = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), "graft_epoch"), digest)
        val manifestDir = new java.io.File(root, "manifest")
        if (!currentEpoch(spark, manifestDir).exists(_._1 >= 2L)) {
          root.mkdirs()
          val zone = Tables.documents(spark, sfDir)
            .select("doc_id", "lang", "n_chars")
          val gen1 = new java.io.File(root, "compliance_gen1").toPath
          graft.Fs.writeParquetAtomic(zone, gen1)
          commitEpochManifest(spark,
            Seq(("compliance", gen1.toString, "doc_id")),
            manifestDir.toPath, epoch = 1L)
          val tombs = new java.io.File(root, "tombstones")
          graft.Fs.writeParquetAtomic(
            zone.filter(col("doc_id") % EpochDelMod === EpochDelRem)
              .select("doc_id"),
            new java.io.File(tombs, "batch=0").toPath)
          // a cross-JVM racer building the same fingerprint-keyed demo may
          // win the epoch-2 CAS commit; its state is deterministic and
          // identical, so losing the race IS completion here — verify and
          // proceed (real multi-writer cascades must NOT swallow this:
          // their inputs differ, which is the whole point of the CAS)
          try hardDeleteEpochManifested(spark, tombs.toString,
            Seq(("compliance", gen1.toString, "doc_id",
              new java.io.File(root,
                s"compliance_gen2-${java.util.UUID.randomUUID()}").toPath)),
            new java.io.File(root,
              s"tomb_epoch2-${java.util.UUID.randomUUID()}").toPath,
            manifestDir.toPath, epoch = 2L)
          catch {
            case e: EpochConflictException =>
              if (!currentEpoch(spark, manifestDir).exists(_._1 >= 2L)) throw e
          }
        }
        root
      })
    }

  /** EPOCH TIME TRAVEL as an oracled query — the compliance read every
    * real deployment runs the week after a bad hard-delete: the SAME
    * standing zone read at two epochs in one result, epoch 1 (before the
    * takedown) through the retained manifest, epoch 2 (after) through
    * the current one. Both reads resolve via [[epochAsOf]] — immutable
    * manifests make the as-of read stable while newer epochs land
    * (`EpochTravelSpec` pins stability, the vacuum retention contract,
    * and the named failure past retention). The oracle never sees the
    * zone machinery: epoch 1 ≡ the documents projection, epoch 2 ≡ it
    * minus the tombstone predicate — so one hash pins the entire
    * install → cascade → manifest → as-of-read loop. */
  def epochTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val manifestDir = new java.io.File(epochDemoRoot(spark, sfDir), "manifest")
    def countsAt(e: Long): DataFrame =
      readZoneThroughManifest(spark, manifestDir, "compliance", asOfEpoch = e)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .select(lit(e).as("epoch"), col("lang"),
          col("n_docs"), col("total_chars"))
    countsAt(1L).unionAll(countsAt(2L)).orderBy("epoch", "lang")
  }

  /** The v2 upgrade's added column: a coarse size tier, derivable from
    * the stored columns — shared verbatim by the builder and oracle. */
  private[graft] val TierDivisor = 100L
  private[graft] val TierDefault = -1L

  /** (JVM, corpus fingerprint) → a standing zone that lived through a
    * SCHEMA UPGRADE: epoch 1 installs the v1 generation (doc_id, lang,
    * n_chars), epoch 2 — after "the code shipped v2" — installs a
    * generation carrying the new `tier` column, each manifested with its
    * `zone_schema_version`. Nothing rewrites the v1 generation: the
    * whole point is that it stays readable as-is. */
  private val schemaDemoMemo = scala.collection.mutable.Map[String, java.io.File]()

  private[graft] def schemaDemoRoot(
      spark: SparkSession, sfDir: String): java.io.File =
    schemaDemoMemo.synchronized {
      val key = s"$sfDir#schema@${graft.llm.Bpe.corpusFingerprint(spark, sfDir)}"
      schemaDemoMemo.getOrElseUpdate(key, {
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val root = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir"), "graft_epoch_schema"), digest)
        val manifestDir = new java.io.File(root, "manifest")
        if (!currentEpoch(spark, manifestDir).exists(_._1 >= 2L)) {
          root.mkdirs()
          val v1 = Tables.documents(spark, sfDir)
            .select("doc_id", "lang", "n_chars")
          val gen1 = new java.io.File(root, "quality_gen1").toPath
          graft.Fs.writeParquetAtomic(v1, gen1)
          commitEpochManifest(spark,
            Seq(("quality", gen1.toString, "doc_id")),
            manifestDir.toPath, epoch = 1L, Map("quality" -> 1L))
          val v2 = v1.withColumn("tier", expr(s"n_chars div $TierDivisor"))
          val gen2 = new java.io.File(root, "quality_gen2").toPath
          graft.Fs.writeParquetAtomic(v2, gen2)
          commitEpochManifest(spark,
            Seq(("quality", gen2.toString, "doc_id")),
            manifestDir.toPath, epoch = 2L, Map("quality" -> 2L))
        }
        root
      })
    }

  /** SCHEMA EVOLUTION as an oracled query: the same standing zone read
    * at its v1 epoch and its v2 epoch through ONE (v2) code path —
    * [[readZoneEvolved]] fills the upgrade's `tier` column with the
    * default on the pre-upgrade generation and serves real values on
    * the post-upgrade one, and the two epochs' frames union by name
    * into one result. The oracle derives both shapes from the documents
    * table (default literal vs the tier expression), so one hash pins
    * install(v1) → manifest(v1) → upgrade → install(v2) → manifest(v2)
    * → evolved reads at both epochs. */
  def epochSchemaEvolve(spark: SparkSession, sfDir: String): DataFrame = {
    val manifestDir = new java.io.File(schemaDemoRoot(spark, sfDir), "manifest")
    def tiersAt(e: Long): DataFrame =
      readZoneEvolved(spark, manifestDir, "quality",
          defaults = Seq("tier" -> lit(TierDefault)), asOfEpoch = e)
        .groupBy("tier")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .select(lit(e).as("epoch"),
          lit(zoneSchemaVersion(spark, manifestDir, "quality", e)).as("schema_version"),
          col("tier"), col("n_docs"), col("total_chars"))
    tiersAt(1L).unionAll(tiersAt(2L)).orderBy("epoch", "tier")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "maint_compaction_bins" -> (compactionBins _),
    "maint_epoch_travel" -> (epochTravel _),
    "maint_epoch_schema_evolve" -> (epochSchemaEvolve _),
  )

  override def oracles: Map[String, String] = Map(
    "maint_compaction_bins" ->
      s"""WITH f AS (
         |  SELECT source, doc_id, n_chars,
         |    COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM documents
         |)
         |SELECT source, CAST(cum_before // $TargetBytes AS BIGINT) AS bin,
         |  COUNT(*) AS n_files,
         |  CAST(SUM(n_chars) AS BIGINT) AS bytes,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM f GROUP BY source, cum_before // $TargetBytes
         |ORDER BY source, bin""".stripMargin,
    "maint_epoch_travel" ->
      s"""SELECT CAST(1 AS BIGINT) AS epoch, lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY lang
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), lang, COUNT(*),
         |  CAST(SUM(n_chars) AS BIGINT)
         |FROM documents WHERE doc_id % $EpochDelMod <> $EpochDelRem
         |GROUP BY lang
         |ORDER BY epoch, lang""".stripMargin,
    "maint_epoch_schema_evolve" ->
      s"""SELECT CAST(1 AS BIGINT) AS epoch, CAST(1 AS BIGINT) AS schema_version,
         |  CAST($TierDefault AS BIGINT) AS tier,
         |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), CAST(2 AS BIGINT),
         |  CAST(n_chars // $TierDivisor AS BIGINT),
         |  COUNT(*), CAST(SUM(n_chars) AS BIGINT)
         |FROM documents GROUP BY n_chars // $TierDivisor
         |ORDER BY epoch, tier""".stripMargin,
  )
}
