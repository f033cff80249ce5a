package graft

import graft.stream.RetryStateMachine
import graft.stream.RetryStateMachine.{Attempt, CaptureState, Transition}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.matchers.should.Matchers

/** T1/T2/T5-ish coverage for the capture state machine: pure-fold
  * unit semantics, the batch analog, the streaming path over
  * MemoryStream, and the reference's attempts-bound invariant
  * (manager.py:398: retry_id can never exceed retries+1). */
class RetryStateMachineSpec extends SparkSuite with Matchers {

  private def fold(attempts: Seq[Attempt], retries: Int = 3): Seq[Transition] = {
    var st: Option[CaptureState] = None
    attempts.map { a =>
      val (ns, t) = RetryStateMachine.step(retries)(st, a)
      st = ns
      t
    }
  }

  test("successful first attempt starts a session") {
    val out = fold(Seq(Attempt("s1", 10L, pollAttempt = false, gotData = true)))
    out.map(_.action) shouldBe Seq("start")
    out.head.retryId shouldBe 0
  }

  test("empty poll attempt abandons immediately (manager.py:275-280)") {
    val out = fold(Seq(Attempt("s1", 10L, pollAttempt = true, gotData = false)))
    out.map(_.action) shouldBe Seq("abandon_poll")
  }

  test("definitive signal retries until the budget is exhausted") {
    val attempts = (1 to 6).map(i =>
      Attempt("s1", i.toLong, pollAttempt = false, gotData = false))
    val out = fold(attempts, retries = 3)
    out.map(_.action) shouldBe
      Seq("retry", "retry", "retry", "exhausted", "retry", "retry")
    // after exhaustion state is gone; attempt 5 starts a fresh session
    out(4).attempts shouldBe 1
  }

  test("invariant: retry_id never exceeds the budget (manager.py:398)") {
    // Sweep over random outcome sequences: retryId is capped at
    // `retries` ("exhausted" fires instead of overshooting), and an
    // unbroken failure streak never exceeds retries+1 attempts.
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val retries = rnd.nextInt(4)
      val attempts = (1 to 20).map(i =>
        Attempt("s", i.toLong, rnd.nextBoolean(), rnd.nextBoolean()))
      val out = fold(attempts, retries)
      out.foreach(t => t.retryId should be <= retries)
      var streak = 0
      out.foreach { t =>
        if (t.action == "retry" || t.action == "exhausted") streak += 1
        else streak = 0
        streak should be <= (retries + 1)
        if (t.action == "exhausted") streak = 0 // session over, budget resets
      }
    }
  }

  test("batch analog folds per key in event order") {
    import spark.implicits._
    val ds = Seq(
      Attempt("a", 2L, pollAttempt = false, gotData = false),
      Attempt("a", 1L, pollAttempt = false, gotData = true), // out of order
      Attempt("b", 1L, pollAttempt = true, gotData = false),
    ).toDS()
    val out = RetryStateMachine.batch(ds, retries = 3).collect()
      .groupBy(_.streamId)
    out("a").sortBy(_.ts).map(_.action).toSeq shouldBe Seq("start", "retry")
    out("b").map(_.action).toSeq shouldBe Seq("abandon_poll")
  }

  test("staleness timeout kills an idle session (T7, manager.py:250-266)") {
    // Deterministic via the public TestGroupState harness — a live
    // timeout-armed query busy-loops empty micro-batches, so timeouts
    // are unit-tested at the handler boundary instead.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val timedOut = TestGroupState.create[CaptureState](
      Optional.of(CaptureState(retryId = 2, sessionStart = 1L, attempts = 3)),
      GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = true)
    val out = RetryStateMachine.handleGroup(5, 1500L)(
      "idle", Iterator.empty, timedOut).toList
    out.map(_.action) shouldBe List("stalled")
    out.head.retryId shouldBe 2
    timedOut.exists shouldBe false // state dropped with the session

    // and a live (non-timed-out) group arms the timeout on update
    val live = TestGroupState.create[CaptureState](
      Optional.empty[CaptureState](),
      GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long](), hasTimedOut = false)
    RetryStateMachine.handleGroup(5, 1500L)(
      "s", Iterator(Attempt("s", 1L, pollAttempt = false, gotData = true)),
      live).toList.map(_.action) shouldBe List("start")
    live.getTimeoutTimestampMs.isPresent shouldBe true
  }

  test("streaming path over MemoryStream matches the batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Attempt]
    val q = RetryStateMachine(mem.toDS(), retries = 2)
      .writeStream.format("memory").queryName("rsm_out")
      .outputMode("append").start()
    try {
      mem.addData(
        Attempt("s1", 1L, pollAttempt = false, gotData = false),
        Attempt("s2", 1L, pollAttempt = false, gotData = true))
      q.processAllAvailable()
      mem.addData(Attempt("s1", 2L, pollAttempt = false, gotData = false))
      q.processAllAvailable()
      mem.addData(Attempt("s1", 3L, pollAttempt = false, gotData = false))
      q.processAllAvailable()
      val rows = spark.table("rsm_out").as[Transition].collect()
      rows.filter(_.streamId == "s1").sortBy(_.ts).map(_.action).toSeq shouldBe
        Seq("retry", "retry", "exhausted")
      rows.filter(_.streamId == "s2").map(_.action).toSeq shouldBe Seq("start")
      // state survives across triggers: attempt counter accumulated
      rows.filter(_.streamId == "s1").map(_.attempts).max shouldBe 3
    } finally q.stop()
  }
}
