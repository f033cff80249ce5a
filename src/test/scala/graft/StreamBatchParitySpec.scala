package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

/** Batch-stream unification (T8 doctrine): the SAME declarative
  * transformation runs as a batch query and as an incremental
  * Structured Streaming job over the identical parquet input, and
  * must produce identical results. This is the property that lets a
  * 100 TB backfill and the live stream share one code path —
  * `readStream` + Trigger.AvailableNow processes the existing files
  * in bounded batches and terminates, exactly like a batch run but
  * through the streaming engine (checkpointed, resumable).
  */
class StreamBatchParitySpec extends SparkSuite with Matchers {

  test("tumbling-window agg: AvailableNow streaming run == batch run") {
    import spark.implicits._
    // the shared transformation, verbatim from q_tumbling_window's core
    def tumble(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
        .select(unix_micros($"w.start").as("bucket_us"), $"event_type", $"n", $"sum_value")

    val batch = tumble(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSet

    // stream the same parquet through the streaming engine
    val out = java.nio.file.Files.createTempDirectory("graft_par_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_par_ck").toString
    // declare the RAW parquet schema and apply Tables.events'
    // conversion on the stream (int64 nanos under nanosAsLong in the
    // old testdata generation, TIMESTAMP_NTZ µs in the new one); the
    // file source wants a DIRECTORY, so stage the file into one
    val srcDir = java.nio.file.Files.createTempDirectory("graft_par_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      srcDir.resolve("events.parquet"))
    val raw = Tables.load(spark, sf, "events").schema
    val src0 = spark.readStream
      .schema(raw)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
    val src = raw("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        src0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => src0.withColumn("ts", col("ts").cast("timestamp"))
    }
    val q = tumble(src.withWatermark("ts", "0 seconds"))
      .writeStream
      .outputMode("complete") // bounded input: full result at the end
      .format("memory").queryName("parity_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) shouldBe true
    finally q.stop()

    val streamed = spark.table("parity_out").collect().map(_.toSeq).toSet
    streamed shouldBe batch
    streamed.size should be > 0
  }

  test("minhash20 signature + band assignment: AvailableNow streaming run == batch run") {
    // graft_minhash20 is a pure per-row projection, so the signature
    // build needs no watermark or state — THE incremental-ingestion
    // story for the dedup family at 100 TB: signatures + band keys are
    // computed as documents arrive and appended to the persisted
    // signature table; the banded candidate join downstream reads that
    // table, batch or stream alike. Runs the PRODUCTION projection
    // (graft.ops.Text.mh20Project — the memoized mh20 table's exact
    // formulation) on both sides, so the parity claim cannot drift
    // from the code it covers.
    def sigs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.ops.Text.mh20Project(df)

    val batch = sigs(Tables.documents(spark, sf)).collect().map(_.toSeq).toSet

    val ckpt = java.nio.file.Files.createTempDirectory("graft_sig_ck").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sig_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      srcDir.resolve("documents.parquet"))
    val q = sigs(spark.readStream
        .schema(Tables.documents(spark, sf).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString))
      .writeStream
      .outputMode("append") // stateless projection: plain append
      .format("memory").queryName("parity_sigs")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) shouldBe true
    finally q.stop()

    val streamed = spark.table("parity_sigs").collect().map(_.toSeq).toSet
    streamed shouldBe batch
    streamed.size should be > 0
  }

  test("encoding quality gate: AvailableNow streaming run == batch run") {
    import spark.implicits._
    // the quality-gate side of the incremental-ingestion story: the
    // encoding gate (q_encoding_gate's core) is a pure per-row
    // projection, so damage counters + keep flags are computed as
    // documents ARRIVE and appended next to them — a live feed and
    // the 100 TB backfill share the one declarative gate
    // (graft.ops.Text.encodingGate), no state, no watermark.
    val batch = graft.ops.Text.encodingGate(Tables.documents(spark, sf))
      .collect().map(_.toSeq).toSet

    val ckpt = java.nio.file.Files.createTempDirectory("graft_gate_ck").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_gate_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      srcDir.resolve("documents.parquet"))
    val q = graft.ops.Text.encodingGate(spark.readStream
        .schema(Tables.documents(spark, sf).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString))
      .writeStream
      .outputMode("append") // stateless projection: plain append
      .format("memory").queryName("parity_gate")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) shouldBe true
    finally q.stop()

    val streamed = spark.table("parity_gate").collect().map(_.toSeq).toSet
    streamed shouldBe batch
    streamed.size should be > 0
  }

  test("pq code assignment: foreachBatch streaming run == batch run") {
    import spark.implicits._
    // the PQ side of the incremental ANN story (companion to
    // q_ann_upsert's IVF-cell assignment): an arriving batch of
    // embeddings gets its codes from the STANDING codebook — the
    // persisted m·k index metadata — via the SAME production
    // pqSubs/pqAssign pair the batch queries use, so the parity
    // claim cannot drift from the code it covers. Assignment is
    // per-vector (no cross-batch state), so per-micro-batch
    // evaluation is exact, not approximate.
    val all = Tables.embeddings(spark, sf)
    val subsAll = graft.ops.Similarity.pqSubs(all)
    val cb = subsAll.filter($"vec_id" < 16)
      .select($"vec_id".as("code"), $"sub".as("c_sub"), $"sv".as("cv"))
      .cache() // the standing index side, reused every micro-batch
    val batch = graft.ops.Similarity.pqAssign(subsAll, cb)
      .select($"vec_id", $"sub", $"code")
      .collect().map(_.toSeq).toSet

    val srcDir = java.nio.file.Files.createTempDirectory("graft_pq_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/embeddings.parquet"),
      srcDir.resolve("embeddings.parquet"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pq_ck").toString
    val coded = scala.collection.mutable.Set.empty[Seq[Any]]
    val q = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = graft.ops.Similarity
          .pqAssign(graft.ops.Similarity.pqSubs(mb), cb)
          .select("vec_id", "sub", "code")
          .collect().map(_.toSeq)
        coded.synchronized { coded ++= out }
        ()
      }
      .start()
    try q.awaitTermination(120000) shouldBe true
    finally { q.stop(); cb.unpersist() }

    coded.toSet shouldBe batch
    coded.size should be > 0
  }

  test("exact-dedup agg: AvailableNow streaming run == batch run") {
    import spark.implicits._
    // q_exact_dedup's core: one aggregation → streamable as-is. THE
    // pipeline claim: dedup over a live document feed is the same
    // declarative code as the 100 TB batch backfill.
    def dedup(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.groupBy(sha2(lower(trim($"text")), 256).as("content_hash"))
        .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))

    val batch = dedup(Tables.documents(spark, sf))
      .collect().map(_.toSeq).toSet

    val ckpt = java.nio.file.Files.createTempDirectory("graft_par2_ck").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_par2_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      srcDir.resolve("documents.parquet"))
    val q = dedup(spark.readStream
        .schema(Tables.documents(spark, sf).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString))
      .writeStream
      .outputMode("complete")
      .format("memory").queryName("parity_dedup")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) shouldBe true
    finally q.stop()

    val streamed = spark.table("parity_dedup").collect().map(_.toSeq).toSet
    streamed shouldBe batch
    streamed.size should be > 0
  }

  test("incremental dedup vet: stream-static probe == batch run") {
    import spark.implicits._
    // THE CDC story end-to-end: today's ingest arrives on a stream,
    // each doc's digest + LSH band are computed on arrival
    // (Text.bandProject — pure projection, no shuffle, no state) and
    // vetted against the STANDING corpus indexes via stream-static
    // left joins (stateless — no watermark, append mode). The batch
    // query q_incremental_dedup and this stream run the SAME
    // bandProject + vetBatch code, so parity cannot drift from the
    // oracle-gated surface.
    val batch = graft.ops.Text.queries("q_incremental_dedup")(spark, sf)
      .collect().map(_.toSeq).toSet

    val (hashIdx, bandIdx) = graft.ops.Text.corpusIndexes(spark, sf)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_incr_ck").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_incr_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      srcDir.resolve("documents.parquet"))
    val arriving = spark.readStream
      .schema(Tables.documents(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .filter(pmod($"doc_id", lit(10L)) === 9)
    val q = graft.ops.Text.vetBatch(
        graft.ops.Text.bandProject(arriving), hashIdx, bandIdx)
      .writeStream
      .outputMode("append") // stateless stream-static joins
      .format("memory").queryName("parity_incr")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) shouldBe true
    finally q.stop()

    val streamed = spark.table("parity_incr").collect().map(_.toSeq).toSet
    streamed shouldBe batch
    streamed.size should be > 0
    // at sf0.001 the batch slice carries 43 drop_near + 7 keep
    // (measured, both engines) — assert both verdicts actually occur
    streamed.map(_(1)) should contain allOf ("drop_near", "keep")
  }

  test("bm25 query scoring: stream-static probe == batch run") {
    import spark.implicits._
    // the retrieval-serving mirror of the dedup vet above: QUERIES
    // arrive on a stream, each is tokenized on arrival
    // (Corpus.queryToks — pure projection, no shuffle, no state) and
    // scored against the STANDING postings index via a stream-static
    // equi-join on the term key. The batch q_bm25/q_rrf_fusion/q_ndcg
    // family reads the SAME bm25Score(queryToks(...), postings) code,
    // so parity cannot drift from the oracle-gated surface.
    val postings = graft.ops.Corpus.bm25Postings(spark, sf)
    val batch = graft.ops.Corpus.bm25Score(
        graft.ops.Corpus.queryToks(
          Tables.documents(spark, sf).filter($"doc_id" < 3)),
        postings)
      .collect().map(_.toSeq).toSet

    val ckpt = java.nio.file.Files.createTempDirectory("graft_bm25_ck").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_bm25_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      srcDir.resolve("documents.parquet"))
    val arriving = spark.readStream
      .schema(Tables.documents(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .filter($"doc_id" < 3)
    val q = graft.ops.Corpus.bm25Score(
        graft.ops.Corpus.queryToks(arriving), postings)
      .writeStream
      .outputMode("complete") // bounded input: the agg's full result
      .format("memory").queryName("parity_bm25")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) shouldBe true
    finally q.stop()

    val streamed = spark.table("parity_bm25").collect().map(_.toSeq).toSet
    streamed shouldBe batch
    streamed.size should be > 0
  }

  /** r16 (r15 verdict #7, shipped as a spec instead of an oracle
    * query — the measured suite cost, 0.90 s standalone-min, exceeded
    * the verdict's ≤0.5 s shipping cap; PLANS.md r16 ledger): the
    * NATIVE session_window batch aggregate equals the lag+cumsum
    * derivation q_sessionize uses, under session_window's OWN
    * boundary rules — end is the exclusive window end (last event +
    * gap), and a gap of EXACTLY 30 min still MERGES (sessions merge
    * when the new event's start ≤ the current window end — the same
    * inclusive rule as qSessionize's `> gap` split; pinned on a
    * crafted frame because the shipped corpora have no exact-gap
    * pair to expose it). */
  test("session_window batch == lag/cumsum derivation; exact-gap boundary merges") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    // parity on the real events table
    val native = graft.ops.Windows.qSessionWindow(spark, sf)
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc)
    val derived = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("ts_us"))
      .withColumn("prev", lag($"ts_us", 1).over(w))
      .withColumn("new_sess",
        when($"prev".isNull || $"ts_us" - $"prev" > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sid",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts_us").as("start_us"),
        (max($"ts_us") + 1800L * 1000000L).as("end_us"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"start_us", $"end_us", $"n_events")
      .collect().map(_.toSeq).toSet
    native shouldBe derived
    native.size should be > 0

    // crafted boundary pin: EXACTLY 30:00 merges too (inclusive rule)
    val base = 1700000000000000L
    val dir = java.nio.file.Files.createTempDirectory("graft_sw").toString
    Seq((1L, base), (1L, base + 1799999999L),
        (1L, base + 1799999999L + 1800000000L),
        (2L, base), (2L, base + 1L))
      .toDF("user_id", "us")
      .select(lit(0L).as("event_id"), timestamp_micros($"us").as("ts"),
        $"user_id")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.ops.Windows.qSessionWindow(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    got shouldBe Set(
      (1L, base, base + 3599999999L + 1800000000L, 3L),
      (2L, base, base + 1L + 1800000000L, 2L))
  }
}
