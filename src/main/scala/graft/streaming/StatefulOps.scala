package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom arbitrary-state streaming (SURVEY §2.9 / brief:
  * `flatMapGroupsWithState` for state the built-in windows can't express).
  *
  * The operator here is per-user running anomaly detection: emit an alert
  * row whenever a user's event value exceeds `k`× their own running mean —
  * state is (count, mean) per user, O(1) per key, which is the shape that
  * scales: state size is bounded by the key cardinality, not stream length,
  * and event-time timeout evicts idle keys.
  */
object StatefulOps {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserStats(n: Long, mean: Double)
  case class Alert(user_id: Long, ts: java.sql.Timestamp, value: Double, mean_before: Double)

  /** Flag events at value > k × running mean (after a warm-up of `minN`). */
  def anomalyAlerts(
      events: Dataset[Event],
      k: Double = 3.0,
      minN: Int = 5): Dataset[Alert] = {
    implicit val alertEnc = Encoders.product[Alert]
    implicit val statsEnc = Encoders.product[UserStats]

    def update(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[UserStats]): Iterator[Alert] = {
      var st = state.getOption.getOrElse(UserStats(0L, 0.0))
      val alerts = Seq.newBuilder[Alert]
      // events within a batch arrive unordered; sort by time for a
      // deterministic running mean (bounded: one group's batch slice)
      rows.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
        if (st.n >= minN && e.value > k * st.mean) {
          alerts += Alert(userId, e.ts, e.value, st.mean)
        }
        st = UserStats(st.n + 1, st.mean + (e.value - st.mean) / (st.n + 1))
      }
      state.update(st)
      alerts.result().iterator
    }

    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update _)
  }

  // --------------------------------------------- streaming sessionization

  case class Session(
      user_id: Long, session_seq: Long,
      start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp, n_events: Long)
  case class SessState(seq: Long, startMs: Long, lastMs: Long, n: Long)

  /** Streaming gap sessionization — the stream twin of the batch
    * `win_sessionize` window query: group a user's events into sessions
    * separated by >`gapMinutes` of inactivity, emitting one summary row
    * per CLOSED session. A session closes either (a) in-batch, when a
    * later event of the same user arrives past the gap, or (b) via
    * EVENT-TIME timeout once the watermark passes last-event + gap — so
    * results depend on event time only, never wall clock, and a re-drain
    * from the checkpoint is deterministic.
    *
    * Scale: state is one fixed-size record per user with an OPEN session
    * — bounded by active-user cardinality, and the event-time timeout is
    * what keeps "active" from meaning "ever seen". Requires a watermark
    * on the input (the timeout is defined against it).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 10): Dataset[Session] = {
    implicit val outEnc = Encoders.product[Session]
    implicit val stEnc = Encoders.product[SessState]
    val gapMs = gapMinutes * 60L * 1000L
    def tsOf(ms: Long) = new java.sql.Timestamp(ms)

    def update(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[SessState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        Iterator.single(
          Session(userId, st.seq, tsOf(st.startMs), tsOf(st.lastMs), st.n))
      } else {
        val out = Seq.newBuilder[Session]
        var st = state.getOption.orNull
        rows.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
          val t = e.ts.getTime
          if (st == null) {
            st = SessState(1L, t, t, 1L)
          } else if (t - st.lastMs > gapMs) {
            out += Session(userId, st.seq, tsOf(st.startMs), tsOf(st.lastMs), st.n)
            st = SessState(st.seq + 1L, t, t, 1L)
          } else {
            st = st.copy(lastMs = math.max(st.lastMs, t), n = st.n + 1L)
          }
        }
        if (st != null) {
          state.update(st)
          state.setTimeoutTimestamp(st.lastMs + gapMs)
        }
        out.result().iterator
      }
    }

    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update _)
  }

  // ------------------------------------------------- streaming near-dedup

  case class DocBand(doc_id: Long, band: Int, band_key: String)
  case class BandDecision(doc_id: Long, band: Int, canonical_id: Long, is_dup: Boolean)

  /** Incremental near-duplicate detection over a document STREAM: the
    * streaming twin of batch MinHash/LSH dedup. Each arriving doc's 4 LSH
    * band rows (from Dedup.bandRowsOf — identical signatures to the batch
    * path) probe a keyed state registry; the first doc to claim a bucket
    * becomes its canonical, later hits are flagged dups of it. A doc is a
    * near-dup iff ANY of its band decisions is_dup — that rollup is a
    * stateless per-micro-batch aggregation left to the consumer
    * (`foreachBatch`), keeping this operator single-purpose.
    *
    * Scale: state is one long per OCCUPIED bucket, partitioned by band_key
    * — the same key the batch self-join shuffles on. NoTimeout because
    * corpus dedup is against all history; on a real cluster back this with
    * the RocksDB state store (spark.sql.streaming.stateStore.providerClass)
    * so the registry spills to disk instead of capping at executor heap.
    */
  def nearDupBandDecisions(bands: Dataset[DocBand]): Dataset[BandDecision] = {
    implicit val decEnc = Encoders.product[BandDecision]

    def update(
        key: String,
        rows: Iterator[DocBand],
        state: GroupState[Long]): Iterator[BandDecision] = {
      // within one batch the lowest doc_id claims the bucket — same
      // survivor rule as the batch path's min-per-cluster
      val sorted = rows.toSeq.sortBy(_.doc_id)
      val out = Seq.newBuilder[BandDecision]
      var canon = state.getOption.getOrElse(-1L)
      sorted.foreach { r =>
        if (canon < 0) canon = r.doc_id
        out += BandDecision(r.doc_id, r.band, canon, r.doc_id != canon)
      }
      if (canon >= 0) state.update(canon)
      out.result().iterator
    }

    bands
      .groupByKey(b => s"${b.band}|${b.band_key}")(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update _)(
        Encoders.scalaLong, decEnc)
  }

  /** Full streaming pipeline: (doc_id, text) stream → band rows → keyed
    * registry decisions.
    */
  def streamingNearDup(docs: org.apache.spark.sql.DataFrame): Dataset[BandDecision] = {
    implicit val bandEnc = Encoders.product[DocBand]
    nearDupBandDecisions(
      graft.llm.Dedup.bandRowsOf(graft.llm.Dedup.shingled(docs)).as[DocBand])
  }
}
