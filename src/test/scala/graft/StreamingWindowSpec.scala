package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** T8 streaming surface: watermarked tumbling windows and
  * session_window over MemoryStream — the streaming twins of
  * q_tumbling_window / q_sessionize. */
class StreamingWindowSpec extends SparkSuite with Matchers {

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("watermark + tumbling window aggregates and finalizes closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
    val q = agg.writeStream.format("memory").queryName("tumble_out")
      .outputMode("append").start()
    try {
      mem.addData((ts(5), 1.0), (ts(20), 2.0), (ts(65), 4.0))
      q.processAllAvailable()
      // advance watermark far enough to close hour 0 AND hour 1
      mem.addData((ts(200), 8.0))
      q.processAllAvailable()
      val rows = spark.table("tumble_out")
        .select($"window.start".cast("long").as("w"), $"n", $"s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      rows should contain((0L, 2L, 3.0))
      rows should contain((3600L, 1L, 4.0))
    } finally q.stop()
  }

  test("streaming dedup: watermarked dropDuplicates keeps first arrival (U2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val dedup = mem.toDF().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("id")
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
      q.processAllAvailable()
      mem.addData((ts(4), "a"), (ts(5), "c")) // 'a' is a late duplicate
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select($"id").as[String]
        .collect().sorted
      ids shouldBe Array("a", "b", "c")
    } finally q.stop()
  }

  test("foreachBatch sink: per-batch idempotent write keyed by batchId (S9)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_feb").toString
    val mem = MemoryStream[(Timestamp, Double)]
    // The reference checkpoints state on every transition
    // (state.py:25-38); the engine's analog is a foreachBatch sink
    // whose write is keyed by batchId — replays overwrite, not double.
    val q = mem.toDF().toDF("ts", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/batch=$batchId")
      }
      .outputMode("append").start()
    try {
      mem.addData((ts(1), 1.0), (ts(2), 2.0))
      q.processAllAvailable()
      mem.addData((ts(3), 3.0))
      q.processAllAvailable()
      spark.read.parquet(s"$out/batch=*").count() shouldBe 3L
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks to prior impressions (J8 streaming twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imp = MemoryStream[(Timestamp, String)]
    val clk = MemoryStream[(Timestamp, String)]
    // Both sides watermarked; the interval bound lets Spark expire
    // impression state once clk watermark passes imp_ts + 30 min —
    // bounded state at any scale, the requirement for a 100 TB/day
    // stream-stream join.
    val joined = imp.toDF().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "10 minutes")
      .join(
        clk.toDF().toDF("clk_ts", "clk_ad").withWatermark("clk_ts", "10 minutes"),
        expr("ad = clk_ad AND clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 30 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    // day-1 base: epoch-0 events sit exactly AT the initial watermark,
    // whose state-cleanup threshold clamps at 0 and evicts them
    def tsd(min: Int): Timestamp = new Timestamp(86400000L + min * 60000L)
    try {
      imp.addData((tsd(0), "a"), (tsd(0), "b"))
      clk.addData((tsd(10), "a")) // inside a's 30-min attribution window
      q.processAllAvailable()
      clk.addData((tsd(50), "b")) // outside the window: must NOT match
      q.processAllAvailable()
      val matched = spark.table("ssjoin_out").select($"ad").as[String].collect().sorted
      matched shouldBe Array("a")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits unmatched rows only after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imp = MemoryStream[(Timestamp, String)]
    val clk = MemoryStream[(Timestamp, String)]
    def tsd(min: Int): Timestamp = new Timestamp(86400000L + min * 60000L)
    val joined = imp.toDF().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "10 minutes")
      .join(
        clk.toDF().toDF("clk_ts", "clk_ad").withWatermark("clk_ts", "10 minutes"),
        expr("ad = clk_ad AND clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 30 minutes"),
        "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssloj_out")
      .outputMode("append").start()
    try {
      imp.addData((tsd(0), "a"), (tsd(0), "b"))
      clk.addData((tsd(10), "a"))
      q.processAllAvailable()
      // 'b' unmatched but NOT yet emitted: its join window is still open
      val early = spark.table("ssloj_out")
        .select($"ad", $"clk_ad").as[(String, Option[String])].collect()
      early.map(_._1).toSet shouldBe Set("a")
      // advance both watermarks far past b's window → null-padded emit
      imp.addData((tsd(300), "z"))
      clk.addData((tsd(300), "z"))
      q.processAllAvailable()
      q.processAllAvailable()
      val late = spark.table("ssloj_out")
        .select($"ad", $"clk_ad").as[(String, Option[String])].collect()
      late should contain(("b", None))
      late.filter(_._1 == "a").map(_._2) shouldBe Array(Some("a"))
    } finally q.stop()
  }

  test("transformWithState running totals accumulate per key (T1, Spark 4 API)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.stream.RunningTotals
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[RunningTotals.Event]
    val q = RunningTotals.totals(mem.toDS()).writeStream
      .format("memory").queryName("tws_out").outputMode("update").start()
    try {
      mem.addData(RunningTotals.Event("s1", 100), RunningTotals.Event("s1", 50),
        RunningTotals.Event("s2", 7))
      q.processAllAvailable()
      mem.addData(RunningTotals.Event("s1", 25)) // state survives batches
      q.processAllAvailable()
      val last = spark.table("tws_out").as[RunningTotals.Total].collect()
        .groupBy(_.streamId).view.mapValues(_.maxBy(_.events)).toMap
      last("s1") shouldBe RunningTotals.Total("s1", 3, 175)
      last("s2") shouldBe RunningTotals.Total("s2", 1, 7)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState TTL evicts idle state and totals re-initialize (T7 on the Spark 4 API)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.stream.RunningTotals
    import org.apache.spark.sql.streaming.TTLConfig
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[RunningTotals.Event]
    // In processing-time mode the engine SELF-schedules no-data
    // batches to evaluate TTL, so the query never quiesces: both
    // processAllAvailable and Trigger.AvailableNow block forever
    // (measured here — each waits on a stream that always has
    // another TTL batch to run). Assertions therefore POLL the sink
    // until the expected update lands (bounded, generous timeout);
    // data batches flow continuously without any manual nudge.
    def awaitRow(expect: RunningTotals.Total): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!spark.table("tws_ttl_out").as[RunningTotals.Total]
               .collect().contains(expect)) {
        if (System.nanoTime() > deadline)
          fail(s"sink never received $expect; got: " +
            spark.table("tws_ttl_out").collect().mkString(", "))
        Thread.sleep(100)
      }
    }
    val q = RunningTotals.totals(mem.toDS(),
        TTLConfig(java.time.Duration.ofMillis(500)))
      .writeStream.format("memory").queryName("tws_ttl_out")
      .outputMode("update").start()
    try {
      mem.addData(RunningTotals.Event("s1", 100))
      awaitRow(RunningTotals.Total("s1", 1, 100))
      // outlive the TTL: the next data batch's timestamp is > 500ms
      // past the insert (sleeping longer only makes it MORE expired —
      // no flake window)
      Thread.sleep(2000)
      mem.addData(RunningTotals.Event("s1", 5))
      // the state the store hands back must be EXPIRED: totals
      // RE-initialize to (1, 5) instead of accumulating to (2, 105) —
      // eviction happened inside the state store, not in our code
      // (the processor has no timeout logic of its own)
      awaitRow(RunningTotals.Total("s1", 1, 5))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("session_window groups by activity gaps per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // u1: two events 5 min apart (one session), then one 90 min later
      mem.addData((ts(0), "u1"), (ts(5), "u1"), (ts(95), "u1"))
      q.processAllAvailable()
      mem.addData((ts(300), "u1")) // advance watermark, close sessions
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select($"user", $"n").as[(String, Long)].collect().sorted
      rows should contain(("u1", 2L))
      rows should contain(("u1", 1L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: bounded state, re-emits after expiry (U2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The 100 TB-safe streaming dedup: plain dropDuplicates keeps every
    // key forever (unbounded state); the WithinWatermark variant
    // guarantees dedup only within the watermark delay and EVICTS the
    // key after, so state is bounded by the delay window. An id
    // re-arriving long after its first appearance is a NEW row by
    // contract — asserted below, the semantic difference from the
    // plain-dedup test above.
    val mem = MemoryStream[(Timestamp, String)]
    val dedup = mem.toDF().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode("append").start()
    try {
      mem.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
      q.processAllAvailable()           // duplicate 'a' within the window: dropped
      mem.addData((ts(60), "flush"))    // watermark → 50 min, 'a' state expires
      q.processAllAvailable()
      mem.addData((ts(61), "a"))        // 'a' again, far past the delay: re-emitted
      q.processAllAvailable()
      val ids = spark.table("dedup_wm_out").select($"id").as[String]
        .collect().sorted
      ids shouldBe Array("a", "a", "b", "flush")
    } finally q.stop()
  }
}
