package graft.stream

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** T1/T6 on Spark 4's `transformWithState` API — the successor to
  * `flatMapGroupsWithState` (which RetryStateMachine demonstrates):
  * typed per-key state handles, per-state TTL, and the RocksDB state
  * store. Semantics mirror the reference's per-stream capture
  * accounting (bytes + attempt counts accumulated across a session,
  * manager.py:281-441): one running (events, bytes) total per stream,
  * emitted after every input batch for that key.
  *
  * At scale: state is keyed by streamId in the executor-local RocksDB
  * store — per-key reads never touch other keys, and per-state TTL
  * (the `ttl` parameter; default NONE) lets the store expire idle
  * streams without a full scan: a key whose state outlives its TTL
  * reads as absent on the next input and the totals re-initialize —
  * the same staleness semantics T7's legacy-API timeout implements
  * by hand (RetryStateMachine), but enforced by the state store
  * itself. TTL requires processing-time mode; [[totals]] picks the
  * TimeMode accordingly.
  */
object RunningTotals {

  case class Event(streamId: String, bytes: Long)
  case class Total(streamId: String, events: Long, bytes: Long)

  class Processor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, Event, Total] {
    @transient private var totals: ValueState[Total] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[Total](
        "totals", Encoders.product[Total], ttl)

    override def handleInputRows(key: String, rows: Iterator[Event],
                                 timer: TimerValues): Iterator[Total] = {
      val prev = if (totals.exists()) totals.get() else Total(key, 0L, 0L)
      val next = rows.foldLeft(prev) { (t, e) =>
        Total(key, t.events + 1, t.bytes + e.bytes)
      }
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** The streaming pipeline: requires the RocksDB state store
    * provider (`spark.sql.streaming.stateStore.providerClass`).
    * A non-NONE `ttl` switches to processing-time mode (state TTL is
    * defined against the batch's processing timestamp). */
  def totals(events: Dataset[Event],
             ttl: TTLConfig = TTLConfig.NONE): Dataset[Total] = {
    import events.sparkSession.implicits._
    val mode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.streamId)
      .transformWithState(new Processor(ttl),
        mode, OutputMode.Update(), Encoders.product[Total])
  }
}
