package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession configured the way every operator in
  * this engine assumes — one call replaces the config folklore.
  *
  * `Graft.sessionBuilder(cores)` encodes the local→cluster delta documented
  * in SCALING.md §8: UTC semantics (the oracle contract and the only sane
  * default for event-time data), shuffle parallelism sized to the target
  * (cores locally; ≈ bytes/200 MB on a cluster — pass it in), AQE left on
  * (runtime coalesce + skew-split are assumed by the join designs), and the
  * Catalyst extensions registered (`BandLevenshteinRule`). For an existing
  * session, `Graft.install(spark)` retrofits the optimizer rules alone.
  */
object Graft {

  def sessionBuilder(shufflePartitions: Int, master: Option[String] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        classOf[org.apache.spark.sql.graft.GraftExtensions].getName)
    master.fold(b)(b.master)
  }

  /** Local session for tests/tools: parallelism = given cores. */
  def localSession(cores: Int): SparkSession = {
    val s = sessionBuilder(cores, Some(s"local[$cores]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    install(s) // getOrCreate may have returned a pre-existing session
    s
  }

  /** Retrofit the engine's optimizer rules and `graft_*` SQL functions onto
    * a live session (idempotent — re-registration replaces like-for-like).
    */
  def install(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.GraftOptimizations.install(spark)
    org.apache.spark.sql.graft.VectorBridge.register(spark)
  }
}
