package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-stream capture state machine (SURVEY.md §2.9 T1-T7), the
  * Structured-Streaming re-expression of the reference's
  * `try_stream` loop (manager.py:281-441).
  *
  * Reference semantics carried over:
  *  - per-key serialized processing: the manager holds one
  *    `asyncio.Lock` per stream (manager.py:44,119); Spark's
  *    `flatMapGroupsWithState` serializes per key per trigger, giving
  *    the same guarantee with zero custom locking (T1);
  *  - bounded retries: `retry_id` advances 0..retries, terminal when
  *    it would exceed `retries` (manager.py:311-320,378-386) (T2);
  *  - asymmetric empty-result policy: a speculative poll attempt
  *    gives up immediately on empty output, a definitive online
  *    signal burns through the whole retry budget
  *    (manager.py:275-280,378-384);
  *  - session identity: (stream, session start ts) — all attempts of
  *    one capture share the session's start (manager.py:295-309, T6);
  *  - staleness timeout: the reference's stubbed healthcheck
  *    (manager.py:250-266, T7) is Spark's built-in
  *    `GroupStateTimeout.ProcessingTimeTimeout`.
  *
  * State is checkpointed per micro-batch by the engine (coarser than
  * the reference's write-per-transition (T3) but the same recovery
  * contract: replay from last checkpoint, T4).
  *
  * At scale: state lives in the executor state store partitioned by
  * streamId — thousands of concurrent capture sessions are just more
  * state-store partitions; no driver-side bookkeeping.
  */
object RetryStateMachine {

  /** One download-attempt outcome for a stream (the subprocess exit +
    * output-file check of manager.py:350,367-376). */
  case class Attempt(streamId: String, ts: Long, pollAttempt: Boolean,
                     gotData: Boolean)

  /** Per-stream session state (common.py:20-35's stream_state,
    * minus process-supervision fields that have no engine analog). */
  case class CaptureState(retryId: Int, sessionStart: Long, attempts: Int)

  /** Emitted transition log (the reference logs each, manager.py
    * throughout). action ∈ start|data|retry|abandon_poll|exhausted|stalled. */
  case class Transition(streamId: String, ts: Long, retryId: Int,
                        attempts: Int, action: String)

  /** Max retry budget (reference default 50, sample 30 — kept small
    * for tests; the invariant is attempts ≤ retries+1, manager.py:398). */
  val DefaultRetries = 3

  /** The transition function: pure, so it is unit-testable without a
    * streaming query and reusable for a batch backfill via
    * `Dataset.groupByKey(...).flatMapGroups`. */
  def step(retries: Int)(state: Option[CaptureState], a: Attempt)
      : (Option[CaptureState], Transition) = state match {
    case None =>
      // New capture session (manager.py:295-309): state created at
      // first attempt; session identity = (stream, first ts).
      val s = CaptureState(retryId = 0, sessionStart = a.ts, attempts = 1)
      if (a.gotData) (Some(s), Transition(a.streamId, a.ts, 0, 1, "start"))
      else if (a.pollAttempt)
        // Speculative poll found nothing: give up at once (manager.py:275-280).
        (None, Transition(a.streamId, a.ts, 0, 1, "abandon_poll"))
      else if (retries == 0)
        (None, Transition(a.streamId, a.ts, 0, 1, "exhausted"))
      else (Some(s.copy(retryId = 1)), Transition(a.streamId, a.ts, 1, 1, "retry"))
    case Some(s0) =>
      val s = s0.copy(attempts = s0.attempts + 1)
      if (a.gotData) (Some(s), Transition(a.streamId, a.ts, s.retryId, s.attempts, "data"))
      else if (a.pollAttempt)
        (None, Transition(a.streamId, a.ts, s.retryId, s.attempts, "abandon_poll"))
      else if (s.retryId >= retries)
        // Retry budget exhausted: finalize + delete state (manager.py:393-432).
        (None, Transition(a.streamId, a.ts, s.retryId, s.attempts, "exhausted"))
      else
        (Some(s.copy(retryId = s.retryId + 1)),
          Transition(a.streamId, a.ts, s.retryId + 1, s.attempts, "retry"))
  }

  /** The per-group handler, factored out so it is unit-testable with
    * the public `TestGroupState` harness (timeout paths can't be
    * driven deterministically through a live query: a timeout-armed
    * stream busy-loops empty micro-batches). */
  private[graft] def handleGroup(retries: Int, stalenessMs: Long)(
      key: String, it: Iterator[Attempt], gs: GroupState[CaptureState])
      : Iterator[Transition] =
    if (gs.hasTimedOut) {
      // T7: idle session killed (the reference's stubbed healthcheck,
      // manager.py:250-266).
      val s = gs.get
      gs.remove()
      Iterator(Transition(key, -1L, s.retryId, s.attempts, "stalled"))
    } else {
      // Per-trigger events replayed in event order: the iterator
      // order is not guaranteed by the engine, the sort makes the
      // fold deterministic (the manager processes serially per key).
      var st: Option[CaptureState] = gs.getOption
      val out = it.toSeq.sortBy(_.ts).map { a =>
        val (ns, t) = step(retries)(st, a)
        st = ns
        t
      }
      st match {
        case Some(s) =>
          gs.update(s)
          if (stalenessMs > 0) gs.setTimeoutDuration(stalenessMs)
        case None => if (gs.exists) gs.remove()
      }
      out.iterator
    }

  /** Streaming form. staleness > 0 arms ProcessingTimeTimeout (T7):
    * a key with no attempts for `staleness` ms emits "stalled" and
    * drops its state — the reference's TODO'd healthcheck killer. */
  def apply(attempts: Dataset[Attempt], retries: Int = DefaultRetries,
            stalenessMs: Long = 0L): Dataset[Transition] = {
    val spark = attempts.sparkSession
    import spark.implicits._
    attempts
      .groupByKey(_.streamId)
      .flatMapGroupsWithState[CaptureState, Transition](
        OutputMode.Append,
        if (stalenessMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(handleGroup(retries, stalenessMs))
  }

  /** Batch analog over a static Dataset — identical fold, used for
    * backfills and for differential-testing the streaming path. */
  def batch(attempts: Dataset[Attempt], retries: Int = DefaultRetries)
      : Dataset[Transition] = {
    val spark = attempts.sparkSession
    import spark.implicits._
    attempts.groupByKey(_.streamId).flatMapGroups {
      (_: String, it: Iterator[Attempt]) =>
        var st: Option[CaptureState] = None
        it.toSeq.sortBy(_.ts).map { a =>
          val (ns, t) = step(retries)(st, a)
          st = ns
          t
        }.iterator
    }
  }
}
