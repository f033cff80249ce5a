package graft

import graft.media.Multimodal
import graft.sources.MediaInventory
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Real file sources, end-to-end: the binaryFile directory scan (S1,
  * convert.sh:30), gzipped ffprobe-JSON packet ingest (S4, convert.sh:63-65),
  * and the date-partitioned layout's pruning contract (§4.3) — the
  * pieces the parquet analogs q_scan_order / q_packet_timeline stand
  * in for at oracle time.
  */
class SourcesSpec extends SparkSuite with Matchers {

  private def write(dir: String, name: String, bytes: Array[Byte]): Unit =
    Files.write(Paths.get(dir, name), bytes)

  test("S1: binaryFile scan lists *.mkv smallest-first and feeds the pipeline") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_mkv").toString
    // Hadoop Path rejects ':' in filenames (URI scheme ambiguity), so
    // on-disk datetimes use '-'; FilenamePattern accepts both forms.
    write(dir, "streamA_720p_2024-01-02T03-04-05_0.mkv", ("x" * 64).getBytes("UTF-8"))
    write(dir, "streamA_720p_2024-01-02T03-04-05_1.mkv", ("y" * 32).getBytes("UTF-8"))
    write(dir, "streamB_audio_only_2024-01-02T03-04-05_0.mkv", ("z" * 33).getBytes("UTF-8"))
    write(dir, "notes.txt", "not media".getBytes("UTF-8")) // glob-excluded

    val inv = MediaInventory.scanBinaries(spark, dir)
    // `ls -Sr`: ascending size, payload intact, non-mkv never listed
    inv.select($"name", $"length").as[(String, Long)].collect().toSeq shouldBe Seq(
      ("streamA_720p_2024-01-02T03-04-05_1.mkv", 32L),
      ("streamB_audio_only_2024-01-02T03-04-05_0.mkv", 33L),
      ("streamA_720p_2024-01-02T03-04-05_0.mkv", 64L))

    // the same inventory drives the convert→archive job end-to-end
    val out = Files.createTempDirectory("graft_mkv_out").toString
    val metrics = EtlPipeline.convertAndArchive(spark, inv, out)
    metrics.count() shouldBe 3
    metrics.filter($"quality" === "720p")
      .select($"pct_reduction").as[Double].collect().foreach(_ shouldBe 75.0)
  }

  test("S4: gzipped ffprobe-JSON packet dump matches the in-memory packet analytics") {
    import spark.implicits._
    val media = Seq(
      ("m1", "0123456789abcdef0123456789abcdef".getBytes("UTF-8")),
      ("m3", ("x" * 96).getBytes("UTF-8")))
    val dir = Files.createTempDirectory("graft_pkt").toString
    def gzWrite(name: String, text: String): Unit = {
      val gz = new GZIPOutputStream(Files.newOutputStream(Paths.get(dir, name)))
      gz.write(text.getBytes("UTF-8")); gz.close()
    }
    // Real ffprobe `-of json` shape (convert.sh:63-65): ONE
    // pretty-printed document per sidecar with a top-level "packets"
    // array, every numeric a JSON string, gzip -c9. NOT NDJSON.
    media.foreach { case (id, bytes) =>
      val objs = Multimodal.packetsStub(bytes).map(p =>
        s"""        {
           |            "pts_time": "${p.ptsTime}",
           |            "dts_time": "${p.dtsTime}",
           |            "size": "${p.size}",
           |            "pos": "${p.pos}",
           |            "duration_time": "${p.durationTime}"
           |        }""".stripMargin)
      gzWrite(s"${id}_packets.json.gz",
        "{\n    \"packets\": [\n" + objs.mkString(",\n") + "\n    ]\n}\n")
    }
    // a truncated sidecar (ffprobe killed mid-dump) must quarantine,
    // not silently contribute zero packets
    gzWrite("m9_packets.json.gz", "{\n    \"packets\": [\n        {\"pts_time\": ")

    val fromGz = Multimodal.packetGapsOf(MediaInventory.packetsNested(
      MediaInventory.readPacketDump(spark, s"$dir/*.json.gz")))
      .select($"mediaId", $"n_packets", $"max_gap", $"n_discontinuities")
      .as[(String, Int, Double, Int)].collect().sortBy(_._1).toSeq

    val direct = Multimodal.packetGaps(Multimodal.probe(media.toDF("mediaId", "media")))
      .select($"mediaId", $"n_packets", $"max_gap", $"n_discontinuities")
      .as[(String, Int, Double, Int)].collect().sortBy(_._1).toSeq

    fromGz shouldBe direct
    // and the injected ad gaps actually survive the round trip
    fromGz.find(_._1 == "m3").get._4 shouldBe 2
    // the corrupt sidecar is visible in quarantine with its raw text
    val bad = MediaInventory.corruptPacketDumps(spark, s"$dir/*.json.gz")
      .as[(String, String)].collect()
    bad.map(_._1).toSeq shouldBe Seq("m9")
    bad.head._2 should include("packets")
  }

  test("quarantine rate is an observable metric, not a grep (S4 + §4.1)") {
    import graft.sources.IngestMetrics
    // 2 parsable sidecars + 1 truncated: the observe node on the parse
    // boundary must report 3 rows read / 1 quarantined through the
    // QueryExecutionListener, with no second scan and no user wiring
    val dir = Files.createTempDirectory("graft_qrate").toString
    def gzWrite(name: String, text: String): Unit = {
      val gz = new GZIPOutputStream(Files.newOutputStream(Paths.get(dir, name)))
      gz.write(text.getBytes("UTF-8")); gz.close()
    }
    val good = """{"packets": [{"pts_time": "0.0", "dts_time": "0.0",
                 |  "size": "16", "pos": "0", "duration_time": "0.02"}]}""".stripMargin
    gzWrite("g1_packets.json.gz", good)
    gzWrite("g2_packets.json.gz", good)
    gzWrite("bad_packets.json.gz", "{\n  \"packets\": [\n    {\"pts_time\": ")

    IngestMetrics.reset()
    MediaInventory.readPacketDump(spark, s"$dir/*.json.gz").count()
    // listener delivery rides the async listener bus — poll, don't race
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var c = IngestMetrics.snapshot()
    while (c.rowsRead < 3 && System.nanoTime() < deadline) {
      Thread.sleep(100); c = IngestMetrics.snapshot()
    }
    c.rowsRead shouldBe 3
    c.rowsQuarantined shouldBe 1
    c.rejectRate shouldBe (1.0 / 3) +- 1e-9
    // a second read accumulates into the session gauge
    MediaInventory.corruptPacketDumps(spark, s"$dir/*.json.gz").count()
    val d2 = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var c2 = IngestMetrics.snapshot()
    while (c2.rowsRead < 6 && System.nanoTime() < d2) {
      Thread.sleep(100); c2 = IngestMetrics.snapshot()
    }
    c2 shouldBe IngestMetrics.Counts(6, 2)
  }

  test("quarantine observe node reports per-batch metrics under streaming too") {
    // the IngestMetrics doc claims the SAME observe node works
    // unchanged under Structured Streaming — prove it: per-batch
    // observed metrics surface in StreamingQueryProgress
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val parsed = graft.sources.IngestMetrics.observed(
      mem.toDF().select($"value",
        when($"value".startsWith("bad"), $"value")
          .otherwise(lit(null).cast("string")).as("_corrupt_record")))
    val q = parsed.writeStream.format("memory").queryName("qrate_stream")
      .outputMode("append").start()
    try {
      mem.addData("ok1", "bad1", "ok2")
      q.processAllAvailable()
      mem.addData("bad2")
      q.processAllAvailable()
      val per = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get(
          graft.sources.IngestMetrics.MetricName)))
        .map(r => (r.getAs[Long]("rows_read"), r.getAs[Long]("rows_quarantined")))
      per.map(_._1).sum shouldBe 4
      per.map(_._2).sum shouldBe 2
    } finally q.stop()
  }

  test("PERMISSIVE JSON ingest quarantines corrupt lines instead of failing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_corrupt").toString
    Files.write(Paths.get(dir, "feed.json"),
      ("""{"id": 1, "v": "ok"}""" + "\n" +
        """{"id": 2, "v": """ + "\n" + // truncated mid-record
        """not json at all""" + "\n" +
        """{"id": 4, "v": "also ok"}""").getBytes("UTF-8"))
    // cache: Spark refuses corrupt-column-only queries on raw files
    val df = spark.read
      .schema("id BIGINT, v STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache()
    val good = df.filter($"_corrupt_record".isNull)
      .select($"id", $"v").as[(Long, String)].collect().sortBy(_._1)
    good shouldBe Array((1L, "ok"), (4L, "also ok"))
    // the quarantine keeps the raw line for replay/debugging
    df.filter($"_corrupt_record".isNotNull).count() shouldBe 2
    // FAILFAST is the strict contract: same input must throw
    intercept[org.apache.spark.SparkException] {
      spark.read.schema("id BIGINT, v STRING")
        .option("mode", "FAILFAST").json(dir).collect()
    }
  }

  test("date-partitioned events prune to one partition on a date-bounded scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_prune").toString
    Tables.events(spark, sf)
      .withColumn("dt", to_date($"ts"))
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val total = new java.io.File(dir).listFiles().count(_.getName.startsWith("dt="))
    total should be > 1

    val events = spark.read.parquet(dir)
    val d = events.select($"dt").agg(min($"dt")).head().getDate(0)
    val q = events.filter($"dt" === lit(d))
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // the predicate must land in PartitionFilters (listing-time pruning,
    // no data read), not PushedFilters (row-group skipping after listing)
    scan.toString should include("PartitionFilters")
    scan.selectedPartitions.partitionCount shouldBe 1
    scan.selectedPartitions.partitionCount should be < total
    q.count() should be > 0L
  }
}
