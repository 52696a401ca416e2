package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import scala.collection.concurrent.TrieMap

/** Run-id → status registry — the control-plane twin of the reference's
  * Glue job-run polling (`GET /etl/jobs/:id` →
  * `GetJobRunCommand`, `src/etl/etl.controller.ts:20-23`,
  * `src/aws/glue.service.ts:53-62`). The reference returns the raw Glue
  * `JobRun` struct; [[RunStatus]] carries the equivalent fields off
  * `StreamingQuery.status`/`exception`.
  */
object JobRegistry {

  /** Mirrors the Glue JobRun states the reference surfaces. */
  case class RunStatus(
      runId: String,
      state: String,            // RUNNING | SUCCEEDED | FAILED
      isDataAvailable: Boolean,
      message: String)

  private val runs = TrieMap.empty[String, StreamingQuery]

  /** Register a started query; its UUID is the run id (the reference's
    * `JobRunId`).
    */
  def register(q: StreamingQuery): String = {
    val id = q.id.toString
    runs.put(id, q)
    id
  }

  def status(runId: String): Option[RunStatus] =
    runs.get(runId).map { q =>
      val state =
        if (q.isActive) "RUNNING"
        else if (q.exception.isDefined) "FAILED"
        else "SUCCEEDED"
      RunStatus(
        runId = runId,
        state = state,
        isDataAvailable = q.isActive && q.status.isDataAvailable,
        message = q.exception.map(_.getMessage).getOrElse(q.status.message))
    }

  def activeRuns: Seq[String] = runs.collect {
    case (id, q) if q.isActive => id
  }.toSeq

  /** Await a drain-style (AvailableNow) run; returns final status. */
  def await(runId: String): Option[RunStatus] = {
    runs.get(runId).foreach(_.awaitTermination())
    status(runId)
  }
}
