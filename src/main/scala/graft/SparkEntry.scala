package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryModule's oracle-checked entries. Each module keeps
  * its queries and DuckDB oracles side by side; this object is just the
  * registry the driver harness (Verify/Bench/smoke) reads.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    etl.EtlQueries,
    _root_.graft.queries.Relational,
    _root_.graft.queries.Windows,
    _root_.graft.queries.SetOps,
    _root_.graft.queries.Functions,
    _root_.graft.queries.EventTime,
    _root_.graft.queries.SqlSurface,
    _root_.graft.queries.TpchSql,
    _root_.graft.queries.Sketches,
    _root_.graft.queries.Graph,
    _root_.graft.queries.Ml,
    llm.TextAnalysis,
    llm.Dedup,
    llm.Forget,
    llm.SuffixDedup,
    llm.Refinery,
    llm.Similarity,
    llm.Multimodal,
    llm.Bpe,
    llm.Unigram,
    llm.Script,
    llm.Curation,
    llm.Sampling,
    llm.Relevance,
    _root_.graft.sources.Formats,
    _root_.graft.sources.Layout,
    _root_.graft.sources.Maintenance,
  )

  /** The module list, for RegistrySpec's uniqueness guards. */
  private[graft] def modulesForSpec: Seq[QueryModule] = modules

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole pipeline is scan → enrich → sink
    * (glue/job.py:22-44); this is that shape on the parquet corpus.
    */
  def entry(spark: SparkSession): DataFrame =
    etl.EtlQueries.enrichCustomer(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
