package graft.llm

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY §2.10 U3 +
  * north-star EXT tier): brute-force cosine top-k as the exactness
  * baseline, IVF-style clustered search as the scale path.
  *
  * Vector math is pure higher-order functions (`zip_with` products +
  * `aggregate` fold) over `array<double>` — no UDF, stays in Tungsten.
  * Embeddings are cast float→double before any arithmetic so the fold is
  * double-precision throughout (matches the oracle's math).
  *
  * Scale: brute force is O(Q×N) with the query side broadcast — exact, and
  * the right answer when Q is small. The IVF variant assigns every vector to
  * its nearest centroid (one broadcast join, k centroids) and probes only the
  * query's cluster — O(Q×N/k) with nprobe=1, trading recall for throughput
  * exactly like a real IVF index; centroids here are seed vectors standing in
  * for a k-means pass.
  */
object Similarity
    extends QueryModule
    with SimilarityStreams
    with SimilarityBrute
    with SimilarityEmb {

  /** Concat with a collision guard: `++` silently overwrites on a
    * duplicated key, which would deregister a query without any test
    * failing — RegistrySpec can only see the merged result, so the
    * guard lives at the merge. */
  private def disjoint[V](parts: Map[String, V]*): Map[String, V] = {
    val merged = parts.reduce(_ ++ _)
    require(merged.size == parts.map(_.size).sum,
      "duplicated name across similarity traits: " +
        parts.flatMap(_.keys).groupBy(identity)
          .collect { case (k, vs) if vs.size > 1 => k }.mkString(", "))
    merged
  }

  /** Test seam: the memoized cell-keyed vector zone's path (the member
    * itself is protected inside the trait stack). */
  private[llm] def materializedVectorZoneForSpec(
      spark: SparkSession, sfDir: String): String =
    materializedVectorZone(spark, sfDir)

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    disjoint(bruteQueries, embDedupQueries, embQueries, ivfQueries, ivfPqQueries)

  override def oracles: Map[String, String] =
    disjoint(bruteOracles, embDedupOracles, embOracles, ivfOracles, ivfPqOracles)
}
