package graft

import graft.functions.SizeWeightedRatio
import graft.sources.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** E3 end-to-end (convert→archive as one Spark job), the tiered sink
  * contract (S9-S11), the Aggregator UDAF (X5), and the external-exec
  * boundary (X1). */
class PipelineSpec extends SparkSuite with Matchers {

  private def inventory = {
    import spark.implicits._
    Seq(
      ("streamA_720p_2024-01-02T03:04:05_0.mkv", ("x" * 64).getBytes("UTF-8")),
      ("streamA_720p_2024-01-02T03:04:05_1.mkv", ("y" * 32).getBytes("UTF-8")),
      ("streamB_audio_only_2024-01-02T03:04:05_0.mkv", ("z" * 33).getBytes("UTF-8")),
      ("garbage-name.bin", "junk".getBytes("UTF-8")), // dropped by the parse guard
    ).toDF("name", "media")
  }

  test("convert→archive pipeline: parse, stub-transcode, metrics, verified write") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_etl").toString
    val metrics = EtlPipeline.convertAndArchive(spark, inventory, out)
    val rows = metrics.collect()
    rows should have size 3 // garbage filtered out
    val a0 = rows.find(_.getAs[String]("mediaId").endsWith("_0.mkv")).get
    a0.getAs[String]("stream") should (be("streamA") or be("streamB"))
    metrics.filter($"stream" === "streamA").count() shouldBe 2
    // stub transcode: stride 4 for video → 75% reduction, scale-3 exact
    metrics.filter($"quality" === "720p")
      .select($"pct_reduction").as[Double].collect().foreach(_ shouldBe 75.0)
    // the archive landed tier-partitioned and reconciles per tier
    val archived = spark.read.parquet(out)
    archived.count() shouldBe 3
    archived.select($"tier").distinct().as[String].collect().toSet shouldBe
      Set("DEEP_ARCHIVE")
    archived.filter($"key".startsWith("tw/")).count() shouldBe 3
  }

  test("tier routing follows the suffix rules and verifies counts") {
    import spark.implicits._
    val files = Seq(
      ("a.mkv", "mkv"), ("a.json", "json"), ("a_packets.json.gz", "json.gz"),
      ("other.txt", "txt"),
    ).toDF("name", "suffix")
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    Sinks.archiveWrite(files, out) shouldBe 4L
    val rec = Sinks.verifyTiers(files, out).collect()
    rec.foreach(r => r.getAs[Boolean]("ok") shouldBe true)
    rec.map(r => r.getAs[String]("tier")).toSet shouldBe
      Set("DEEP_ARCHIVE", "STANDARD_IA", "STANDARD")
    spark.read.parquet(out)
      .filter($"tier" === "DEEP_ARCHIVE").count() shouldBe 2L
  }

  /** r16 (r15 verdict #3): the reference's archive keys are
    * REVERSIBLE (openssl enc + hex with an inverse decoder,
    * s3-sync.sh:27-37) — pin the engine's opt-in equivalent:
    * name → encrypted key → name is an identity, the key is hex (as
    * the reference's are), deterministic across evaluations, and not
    * the plaintext. The default digest path stays one-way. */
  test("encrypted archive keys round-trip back to the original name") {
    import spark.implicits._
    val secret = "0123456789abcdef" // 16 bytes = AES-128
    val files = Seq(
      ("streamA_2024-01-02_03-04-05.mkv", "mkv"),
      ("streamB_2024-06-07_08-09-10.json", "json"),
      ("streamC_packets.json.gz", "json.gz"),
    ).toDF("name", "suffix")
    val keyed = files.withColumn("key", Sinks.encryptedKey($"name", secret))
    // hex-shaped, prefixed, never the plaintext
    keyed.collect().foreach { r =>
      val (name, key) = (r.getAs[String]("name"), r.getAs[String]("key"))
      key should startWith("tw/")
      key.stripPrefix("tw/") should fullyMatch regex "[0-9a-f]+"
      key should not include name
    }
    // deterministic: same name -> same key on a fresh evaluation
    // (idempotent re-archive — the reason for ECB over GCM)
    keyed.select($"key").as[String].collect() shouldBe
      files.withColumn("key", Sinks.encryptedKey($"name", secret))
        .select($"key").as[String].collect()
    // the decoder inverts it exactly
    keyed.withColumn("back", Sinks.decryptedName($"key", secret))
      .filter($"back" =!= $"name").count() shouldBe 0L
    // and archiveWrite(keySecret=...) lands recoverable keys
    val out = java.nio.file.Files.createTempDirectory("graft_aes").toString
    Sinks.archiveWrite(files, out, keySecret = Some(secret)) shouldBe 3L
    spark.read.parquet(out)
      .withColumn("back", Sinks.decryptedName($"key", secret))
      .filter($"back" =!= $"name").count() shouldBe 0L
  }

  /** r11 (r10 verdict #3): the sink's row-count verification must be
    * METADATA-ONLY — parquet footers, not a second pass over data
    * pages. Zero Spark jobs is the strongest form of "no full-data
    * second scan": nothing was scheduled at all, so nothing can have
    * re-read the data. */
  test("archive verification reads footers only - zero Spark jobs") {
    import spark.implicits._
    val files = Seq(("a.mkv", "mkv"), ("b.json", "json"), ("c.txt", "txt"))
      .toDF("name", "suffix")
    val out = java.nio.file.Files.createTempDirectory("graft_meta").toString
    Sinks.archiveWrite(files, out) shouldBe 3L
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Sinks.footerRowCount(spark, out) shouldBe 3L
      // listener events post asynchronously; give a would-be job
      // start time to surface before asserting none did
      Thread.sleep(500)
      jobs.get() shouldBe 0
    } finally spark.sparkContext.removeSparkListener(listener)
    // the distributed path (threshold forced to 0) is value-identical
    Sinks.footerRowCount(spark, out, distributedThreshold = 0) shouldBe 3L
  }

  test("SizeWeightedRatio aggregator matches the SQL ratio-of-sums") {
    import spark.implicits._
    val data = Seq((25L, 100L), (75L, 300L), (10L, 100L)).toDS()
    val udafResult = data.select(SizeWeightedRatio.toColumn).head()
    // Σnew=110 Σold=500 → 100*(1-0.22) = 78.0
    udafResult shouldBe 78.0
    val sqlResult = data.toDF("n", "o")
      .agg(round(lit(100.0) * (lit(1.0) - sum($"n") / sum($"o")), 3))
      .head().getDouble(0)
    udafResult shouldBe sqlResult
  }

  test("external-exec boundary: rdd.pipe round-trips rows (X1)") {
    import spark.implicits._
    val ids = Seq("s1", "s2", "s3").toDS()
    val piped = ids.rdd.pipe("cat").collect().sorted
    piped shouldBe Array("s1", "s2", "s3")
  }
}
