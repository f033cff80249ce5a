package graft

import java.nio.file.Files
import graft.sources.StateStore
import graft.stream.RetryStateMachine
import graft.stream.RetryStateMachine.{Attempt, Transition}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

/** T3/T4 — the resume contract: state survives a stop/restart via
  * the engine's checkpoint (the reference's write-per-transition +
  * load-on-start, state.py:25-38,59-81), and input is processed
  * exactly once across restarts. Also covers S7's fail-closed state
  * load. */
class CheckpointResumeSpec extends SparkSuite with Matchers {

  private def writeJson(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(java.nio.file.Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))

  test("file-source streaming resumes from checkpoint exactly once") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_in").toString
    val out = Files.createTempDirectory("graft_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeJson(in, "b1.json", Seq("""{"id":1,"v":1.0}""", """{"id":2,"v":2.0}"""))
    runOnce()
    // restart with new data: batch 1 must NOT be reprocessed
    writeJson(in, "b2.json", Seq("""{"id":3,"v":3.0}"""))
    runOnce()

    val got = spark.read.parquet(out).select($"id").as[Long].collect().sorted
    got shouldBe Array(1L, 2L, 3L) // each id exactly once
  }

  test("stateful retry machine carries state across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_sin").toString
    val out = Files.createTempDirectory("graft_sout").toString
    val ckpt = Files.createTempDirectory("graft_sckpt").toString
    val schema = StructType(Seq(
      StructField("streamId", StringType), StructField("ts", LongType),
      StructField("pollAttempt", BooleanType), StructField("gotData", BooleanType)))

    def runOnce(): Unit = {
      val attempts = spark.readStream.schema(schema).json(in).as[Attempt]
      val q = RetryStateMachine(attempts, retries = 3)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // run 1: two failed attempts → retryId reaches 2, state persisted
    writeJson(in, "a1.json", Seq(
      """{"streamId":"s1","ts":1,"pollAttempt":false,"gotData":false}""",
      """{"streamId":"s1","ts":2,"pollAttempt":false,"gotData":false}"""))
    runOnce()
    // run 2 (fresh query object, same checkpoint): next failure must
    // CONTINUE from retryId=2, proving state was restored, not reinit
    writeJson(in, "a2.json", Seq(
      """{"streamId":"s1","ts":3,"pollAttempt":false,"gotData":false}"""))
    runOnce()

    val ts = spark.read.parquet(out)
      .orderBy("ts").collect()
      .map(r => (r.getAs[Long]("ts"), r.getAs[Int]("retryId"), r.getAs[String]("action")))
    ts shouldBe Array((1L, 1, "retry"), (2L, 2, "retry"), (3L, 3, "retry"))
  }

  test("state store fails closed: missing path yields empty frame (S7)") {
    val schema = StructType(Seq(
      StructField("stream_id", StringType), StructField("retry_id", IntegerType)))
    val path = Files.createTempDirectory("graft_state").toString + "/state"
    val empty = StateStore.loadOrInit(spark, path, schema)
    empty.count() shouldBe 0L
    empty.schema shouldBe schema
    // round-trip
    import spark.implicits._
    StateStore.save(Seq(("s1", 2)).toDF("stream_id", "retry_id"), path)
    val loaded = StateStore.loadOrInit(spark, path, schema)
    loaded.count() shouldBe 1L
    loaded.collect().head.getAs[Int]("retry_id") shouldBe 2
  }
}
