package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest path — the reference's upload entry point (SURVEY §2.1 S4-S6,
  * §3.2), Spark-shaped.
  *
  * The reference's ingest Lambda takes `{key, content, metadata?}`, coerces
  * content to bytes, merges user metadata with the routing hint, and puts
  * one S3 object (`lambda/ingest-handler.ts:36-56`); the processor later
  * re-reads that metadata with HeadObject (`lambda/handler.ts:39-46`).
  * Spark has no object-metadata side channel, so the durable form of the
  * same contract is metadata stamped as literal columns at ingest — they
  * travel with the data, survive any downstream transform, and cost nothing
  * (constant columns compress to near-zero in any columnar sink).
  */
object Ingest {

  val MetadataPrefix = "_meta_"
  /** The reference's routing-hint metadata key (`lambda/ingest-handler.ts:22`). */
  val OutputRootHint = "pipeline-output-bucket"

  /** Parse an NDJSON payload string and stamp metadata columns. Returns the
    * frame ready to land (or to hand straight to a transform).
    */
  def fromContent(
      spark: SparkSession,
      content: String,
      metadata: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val parsed = Ndjson.parse(spark, content.linesIterator.toSeq.toDS())
    metadata.foldLeft(parsed) { case (df, (k, v)) =>
      df.withColumn(s"$MetadataPrefix$k", lit(v))
    }
  }

  /** Land a payload under `landingDir/key` as ONE NDJSON file — the upload
    * Lambda's PutObject (one S3 object per upload). The payload is a single
    * bounded HTTP body, which the reference also buffers whole
    * (`lambda/ingest-handler.ts:36-40`), so serializing it driver-side is
    * faithful and keeps the landing zone a flat set of real files — what the
    * streaming file source consumes, with the key as the routing basename.
    * (Bulk data takes the distributed writers; this is the control-plane
    * ingest path.)
    */
  def uploadSourceObject(
      spark: SparkSession,
      landingDir: String,
      key: String,
      content: String,
      metadata: Map[String, String] = Map.empty): Unit = {
    val lines = fromContent(spark, content, metadata).toJSON.collect()
    val path = java.nio.file.Paths.get(landingDir, key)
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, lines.mkString("\n") + "\n")
  }

  /** Read back the metadata of a landed object — the HeadObject twin. */
  def readMetadata(spark: SparkSession, landingDir: String, key: String): Map[String, String] = {
    val df = spark.read.json(s"$landingDir/$key")
    val metaCols = df.columns.filter(_.startsWith(MetadataPrefix))
    if (metaCols.isEmpty) Map.empty
    else {
      val row = df.select(metaCols.map(col): _*).head()
      metaCols.zipWithIndex.map { case (c, i) =>
        c.stripPrefix(MetadataPrefix) -> row.getString(i)
      }.toMap
    }
  }
}
