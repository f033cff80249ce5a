package graft

import java.nio.file.Files

import graft.stream.RetryStateMachine
import graft.stream.RetryStateMachine.Attempt
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

/** The reference's WHOLE lifecycle as one continuous dataflow (r10
  * verdict #4): capture attempts (E1, manager.py's try_stream loop) →
  * RetryStateMachine keyed state → completed sessions become media
  * files that feed EtlPipeline.convertAndArchive (E3, convert.sh +
  * s3-sync.sh) inside the SAME streaming query via foreachBatch —
  * killed between phases and resumed from the engine checkpoint,
  * with exactly-once outputs across the restart.
  *
  * Composition notes:
  *  - the file source + AvailableNow + restart is the in-repo
  *    kill/resume mechanism (CheckpointResumeSpec precedent): each
  *    run drains what's available and terminates, the next run is a
  *    fresh query object on the same checkpoint — the "process died,
  *    supervisor relaunched" shape of manager.py:351-360 without
  *    PID files;
  *  - foreachBatch is the declared batch-sink boundary: the archive
  *    write lands under a PER-BATCH directory keyed by batchId, so a
  *    replayed batch overwrites its own output instead of
  *    double-appending — the standard idempotent-sink contract that
  *    turns checkpoint replay into exactly-once output.
  */
class LifecycleE2ESpec extends SparkSuite with Matchers {

  private def writeJson(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(java.nio.file.Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))

  test("capture -> retry state -> convert -> archive survives a mid-stream restart exactly once") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_e2e_in").toString
    val tlog = Files.createTempDirectory("graft_e2e_tlog").toString
    val arch = Files.createTempDirectory("graft_e2e_arch").toString
    val ckpt = Files.createTempDirectory("graft_e2e_ckpt").toString
    val schema = StructType(Seq(
      StructField("streamId", StringType), StructField("ts", LongType),
      StructField("pollAttempt", BooleanType), StructField("gotData", BooleanType)))

    def runOnce(): Unit = {
      val attempts = spark.readStream.schema(schema).json(in).as[Attempt]
      val q = RetryStateMachine(attempts, retries = 3)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[RetryStateMachine.Transition], id: Long) =>
          batch.persist()
          try {
            // transition log (the reference logs every transition)
            batch.toDF().write.mode("overwrite").parquet(s"$tlog/batch=$id")
            // completed capture attempts became files on disk in the
            // reference; here they become (name, media) rows feeding
            // the SAME convert→archive pipeline PipelineSpec drives
            val captures = batch.toDF()
              .filter($"action".isin("start", "data"))
              .select(
                concat($"streamId", lit("_720p_2024-01-02T03:04:0"),
                  $"ts".cast("string"), lit("_"),
                  $"retryId".cast("string"), lit(".mkv")).as("name"),
                expr("cast(repeat('x', 64) as binary)").as("media"))
            if (!captures.isEmpty) {
              EtlPipeline.convertAndArchive(spark, captures, s"$arch/batch=$id")
              ()
            }
          } finally { batch.unpersist(); () }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // ---- phase 1: one retry then data for s1; instant data for s2;
    // a speculative poll that finds nothing for s3
    writeJson(in, "a1.json", Seq(
      """{"streamId":"s1","ts":1,"pollAttempt":false,"gotData":false}""",
      """{"streamId":"s1","ts":2,"pollAttempt":false,"gotData":true}""",
      """{"streamId":"s2","ts":1,"pollAttempt":false,"gotData":true}""",
      """{"streamId":"s3","ts":1,"pollAttempt":true,"gotData":false}"""))
    runOnce()

    def transitions() = spark.read.parquet(tlog)
      .select($"streamId", $"ts", $"retryId", $"attempts", $"action")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getString(4))).toSet
    def archivedNames() = spark.read.parquet(arch)
      .select($"name").as[String].collect().sorted

    transitions() shouldBe Set(
      ("s1", 1L, 1, 1, "retry"), ("s1", 2L, 1, 2, "data"),
      ("s2", 1L, 0, 1, "start"), ("s3", 1L, 0, 1, "abandon_poll"))
    archivedNames() shouldBe Array(
      "s1_720p_2024-01-02T03:04:02_1.mkv",
      "s2_720p_2024-01-02T03:04:01_0.mkv")

    // ---- phase 2: the query was killed (AvailableNow drained and
    // stopped); new attempts arrive; a fresh query on the same
    // checkpoint must CONTINUE s1's session (attempts=3 proves the
    // state was restored, a reinit would log "start"/attempts=1) and
    // walk s4 through the full retry budget to exhaustion
    writeJson(in, "a2.json", Seq(
      """{"streamId":"s1","ts":3,"pollAttempt":false,"gotData":true}""",
      """{"streamId":"s4","ts":1,"pollAttempt":false,"gotData":false}""",
      """{"streamId":"s4","ts":2,"pollAttempt":false,"gotData":false}""",
      """{"streamId":"s4","ts":3,"pollAttempt":false,"gotData":false}""",
      """{"streamId":"s4","ts":4,"pollAttempt":false,"gotData":false}"""))
    runOnce()

    val after2 = transitions()
    after2 should contain(("s1", 3L, 1, 3, "data"))
    after2 should contain(("s4", 4L, 3, 4, "exhausted"))
    after2 should have size 9
    val archAfter2 = archivedNames()
    archAfter2 shouldBe Array(
      "s1_720p_2024-01-02T03:04:02_1.mkv",
      "s1_720p_2024-01-02T03:04:03_1.mkv",
      "s2_720p_2024-01-02T03:04:01_0.mkv")

    // ---- phase 3: restart with NO new input — checkpoint replay
    // must not duplicate a single transition or archive row
    runOnce()
    transitions() shouldBe after2
    archivedNames() shouldBe archAfter2

    // the archive is tier-routed and internally consistent: every
    // capture is an mkv → DEEP_ARCHIVE, with the digest key prefix
    val archDf = spark.read.parquet(arch)
    archDf.select($"tier").distinct().as[String].collect().toSet shouldBe
      Set("DEEP_ARCHIVE")
    archDf.filter($"key".startsWith("tw/")).count() shouldBe 3L
  }
}
