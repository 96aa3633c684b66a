package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over the event stream via
  * `flatMapGroupsWithState` — the stateful primitive the reference never
  * reaches for but its decision loop implies: "3+ consecutive failures →
  * escalate" (agent/decision_agent.py:66) is evaluated per *run* there;
  * per *customer* across micro-batches it needs keyed state.
  *
  * Scale: state lives in the state store partitioned by customer id —
  * adding executors shards it linearly; the emitted escalations are a
  * trickle. NoTimeout keeps the example deterministic; production would
  * use event-time timeout keyed to the watermark to expire idle
  * customers.
  */
object StatefulOps {

  final case class DqObservation(id: String, dqPassed: Boolean,
    eventTsMs: Long)

  final case class FailureState(consecutive: Int, lastEventTsMs: Long)

  final case class Escalation(id: String, consecutive: Int,
    atEventTsMs: Long)

  /** Escalation threshold — consecutive per-customer DQ failures
    * (reference threshold semantics, applied per key).
    */
  val ConsecutiveThreshold = 3

  /** Track consecutive DQ failures per customer across batches; emit an
    * [[Escalation]] each time the streak *reaches* the threshold (once
    * per streak — further failures extend silently until a pass resets).
    * Works identically over a batch or streaming Dataset.
    */
  def escalations(curated: DataFrame): Dataset[Escalation] = {
    val spark = curated.sparkSession
    import spark.implicits._
    val obs = curated
      .select(col("id"), col("dq_passed"),
        unix_millis(col("event_timestamp")).as("event_ts_ms"))
      .where(col("id").isNotNull)
      .as[(String, Boolean, Long)]
      .map { case (id, ok, ts) => DqObservation(id, ok, ts) }

    obs.groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (id: String, rows: Iterator[DqObservation],
         state: GroupState[FailureState]) =>
          // within a batch, apply rows in event-time order for determinism
          val sorted = rows.toSeq.sortBy(o => (o.eventTsMs, o.dqPassed))
          var st = state.getOption.getOrElse(FailureState(0, 0L))
          val out = Seq.newBuilder[Escalation]
          sorted.foreach { o =>
            st =
              if (o.dqPassed) FailureState(0, o.eventTsMs)
              else {
                val c = st.consecutive + 1
                if (c == ConsecutiveThreshold)
                  out += Escalation(id, c, o.eventTsMs)
                FailureState(c, o.eventTsMs)
              }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
