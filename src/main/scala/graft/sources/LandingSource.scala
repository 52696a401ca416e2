package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
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
}

class LandingTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-landing($path)"
  override def schema(): StructType = LandingSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LandingScanBuilder(path)
}

class LandingScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = LandingSource.Schema
  private var keyPrefix: Option[String] = None
  private var keyEquals: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case StringStartsWith("key", _) => true
      case EqualTo("key", _: String)  => true
      case _                          => false
    }
    accepted.foreach {
      case StringStartsWith("key", p) => keyPrefix = Some(p)
      case EqualTo("key", v: String)  => keyEquals = Some(v)
      case _                          =>
    }
    pushed = accepted
    // accepted filters are EXACT on the key (no false positives), so Spark
    // need not re-evaluate them — return only the rejected residual
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new LandingScan(path, required, keyPrefix, keyEquals)
}

class LandingScan(
    path: String,
    required: StructType,
    keyPrefix: Option[String],
    keyEquals: Option[String]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-landing $path pushed=[prefix=$keyPrefix eq=$keyEquals] cols=${required.fieldNames.mkString(",")}"

  /** Planning-time LIST + prune: non-matching keys never become
    * partitions. Driver-side listing is O(objects) names — the same cost
    * profile as Spark's file index; at real scale this is the object
    * store's prefix-filtered LIST call.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val root = Paths.get(path)
    val files = Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .filterNot(_.getFileName.toString.endsWith(".meta"))
      .map(p => root.relativize(p).toString)
      .filter(k => keyPrefix.forall(k.startsWith) && keyEquals.forall(k == _))
      .toArray
      .sorted
    files.map(k => LandingPartition(path, k): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LandingReaderFactory(required)
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
          .map { line =>
            val i = line.indexOf('=')
            line.substring(0, i) -> line.substring(i + 1)
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
