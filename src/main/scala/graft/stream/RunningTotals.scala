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
  * store — per-key reads never touch other keys, and TTL (here NONE;
  * production would pass the staleness bound) lets the store expire
  * idle streams without a full scan.
  */
object RunningTotals {

  case class Event(streamId: String, bytes: Long)
  case class Total(streamId: String, events: Long, bytes: Long)

  class Processor extends StatefulProcessor[String, Event, Total] {
    @transient private var totals: ValueState[Total] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[Total](
        "totals", Encoders.product[Total], TTLConfig.NONE)

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
    * provider (`spark.sql.streaming.stateStore.providerClass`). */
  def totals(events: Dataset[Event]): Dataset[Total] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.streamId)
      .transformWithState(new Processor,
        TimeMode.None(), OutputMode.Update(), Encoders.product[Total])
  }
}
