package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

/** The WRITE-BACK half of the CDC dedup loop (companion to the
  * stream-static parity test, which proves the read half): each
  * micro-batch is vetted against the signature index AS OF that
  * batch, and the batch's admitted (kept) documents' signatures are
  * appended to the index before the next batch runs — so a later
  * ingest that near-duplicates an EARLIER INGEST (not just the
  * original corpus) is caught. This is the loop a standing dedup
  * service runs at 100 TB: the index is a persisted parquet table,
  * each ingest reads it fresh (`foreachBatch` + `spark.read` — the
  * documented pattern for an evolving static side), vets, and
  * appends. Exactly the reference's do-not-redo-finished-work gate
  * (convert.sh:20, s3-sync.sh:17) with content identity instead of
  * path identity.
  */
class IncrementalIndexSpec extends SparkSuite with Matchers {

  test("CDC loop: batch N's keeps are visible to batch N+1's vet") {
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_cdc")
    val idxDir = root.resolve("sig_index").toString
    val srcDir = root.resolve("arrivals")
    java.nio.file.Files.createDirectory(srcDir)

    // standing corpus: two docs; index = their on-arrival signatures
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    graft.ops.Text.bandProject(corpus)
      .write.mode("overwrite").parquet(idxDir)

    // two ingest files, arriving in mtime order: doc 9 is NEW content
    // (vs the corpus), doc 19 is a near-dup OF DOC 9 — same token
    // stream, different bytes — so only an index that grew with
    // batch 1's admission can drop it; against the corpus alone it
    // would read "keep". doc 29 exercises drop_near vs the ORIGINAL
    // corpus inside a later batch (regression guard: appending must
    // not lose the seed rows).
    def stage(name: String, mtime: Long, rows: Seq[(Long, String)]): Unit = {
      val tmp = root.resolve(s"stage_$name")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      val dst = srcDir.resolve(s"$name.parquet")
      java.nio.file.Files.move(java.nio.file.Paths.get(part), dst)
      java.nio.file.Files.setLastModifiedTime(
        dst, java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = 1600000000000L
    stage("f1", t0, Seq((9L, "foo bar baz quux")))
    stage("f2", t0 + 60000,
      Seq((19L, "foo  bar baz quux"), (29L, "alpha beta  gamma delta")))

    val verdicts = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Option[Long])]
    val q = spark.readStream
      .schema(corpus.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .writeStream
      .option("checkpointLocation", root.resolve("ck").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // the production tick: fresh index read per batch, full vet,
        // idempotent batchId-keyed write-back
        val out = graft.ops.Text.ingestTick(spark, idxDir, batch, id)
          .as[(Long, String, Option[Long])].collect().sortBy(_._1)
        verdicts.synchronized { verdicts ++= out }
        ()
      }
      .start()
    try q.awaitTermination(120000) shouldBe true
    finally q.stop()

    verdicts.sortBy(_._1).toSeq shouldBe Seq(
      (9L, "keep", None),              // batch 1: new vs corpus → admitted
      (19L, "drop_near", Some(9L)),    // batch 2: near-dup of batch 1's keep
      (29L, "drop_near", Some(1L)))    // batch 2: near-dup of the seed corpus
    // the admitted doc's signature row is durably in the index
    graft.ops.Text.readIndex(spark, idxDir).filter($"doc_id" === 9L).count() shouldBe 1L
  }

  test("bm25 postings CDC: sequential ingest ticks converge to the from-scratch rebuild") {
    import spark.implicits._
    // the LEXICAL-index write-back loop (L95): the standing tf table
    // is a persisted parquet index; each arriving batch reads it
    // fresh, merges (df is corpus-global — the full-outer count add),
    // publishes the post-ingest index, and appends its tf rows for
    // the next tick. Two ticks later the published index must equal a
    // from-scratch rebuild over everything — the incremental ==
    // rebuild contract q_bm25_upsert's oracle audits in one step.
    val root = java.nio.file.Files.createTempDirectory("graft_bm25cdc")
    val tfDir = root.resolve("tf_index").toString
    val srcDir = root.resolve("arrivals")
    java.nio.file.Files.createDirectory(srcDir)

    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    graft.ops.Corpus.tfRows(docs.filter(pmod($"doc_id", lit(10L)) < 8))
      .write.mode("overwrite").parquet(tfDir)

    def stage(name: String, mtime: Long,
              rows: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = root.resolve(s"stage_$name")
      rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      val dst = srcDir.resolve(s"$name.parquet")
      java.nio.file.Files.move(java.nio.file.Paths.get(part), dst)
      java.nio.file.Files.setLastModifiedTime(
        dst, java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = 1600000000000L
    stage("f1", t0, docs.filter(pmod($"doc_id", lit(10L)) === 8))
    stage("f2", t0 + 60000, docs.filter(pmod($"doc_id", lit(10L)) === 9))

    def emit(idx: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = idx
      .select($"doc_id", $"term", $"tf",
        round($"idf" * lit(1.0e6)).cast("long").as("idf_u6"),
        round($"dln" * lit(1.0e6)).cast("long").as("dln_u6"))
      .collect().map(_.toSeq).toSet

    @volatile var published: Set[Seq[Any]] = Set.empty
    val q = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .writeStream
      .option("checkpointLocation", root.resolve("ck").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val standing = spark.read.parquet(tfDir)
        val batchTf = graft.ops.Corpus.tfRows(batch)
          .localCheckpoint() // pin: the batch df dies with the tick
        published = emit(graft.ops.Corpus.mergePostings(standing, batchTf))
        batchTf.write.mode("append").parquet(tfDir) // next tick's standing
        ()
      }
      .start()
    try q.awaitTermination(120000) shouldBe true
    finally q.stop()

    val rebuild = emit(graft.ops.Corpus.mergePostings(
      graft.ops.Corpus.tfRows(docs), // the whole corpus from scratch
      graft.ops.Corpus.tfRows(docs.filter(lit(false)))))
    published shouldBe rebuild
    published.size should be > 0
  }

  test("mergePostings debug guard: overlapping doc sets rejected, disjoint pass") {
    import spark.implicits._
    val a = graft.ops.Corpus.tfRows(
      Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text"))
    val b = graft.ops.Corpus.tfRows(
      Seq((2L, "gamma delta"), (3L, "epsilon")).toDF("doc_id", "text"))
    val disjoint = graft.ops.Corpus.tfRows(
      Seq((3L, "epsilon"), (4L, "zeta")).toDF("doc_id", "text"))

    // off by default: the overlap contract is documented, not probed
    // (zero extra jobs in production) — the merge runs, double-counts
    // and all, because both real call sites are structurally disjoint
    graft.ops.Corpus.mergePostings(a, b).count() should be > 0L

    spark.conf.set(graft.ops.Corpus.DebugChecksFlag, "true")
    try {
      the[IllegalArgumentException] thrownBy
        graft.ops.Corpus.mergePostings(a, b).count() should have message
        "requirement failed: mergePostings: standing and arriving doc " +
          "sets overlap — tf/df/dl would double-count; drop the standing " +
          "rows for arriving doc_ids (upsert) before merging"
      // disjoint sets pass with the probe on, and the probe changes
      // nothing about the merged output — both sides collected into
      // named vals with the flag set explicitly before each, so the
      // comparison never depends on argument evaluation order (r14
      // ADVICE)
      val probed = graft.ops.Corpus.mergePostings(a, disjoint).collect().toSet
      spark.conf.set(graft.ops.Corpus.DebugChecksFlag, "false")
      val base = graft.ops.Corpus.mergePostings(a, disjoint).collect().toSet
      spark.conf.set(graft.ops.Corpus.DebugChecksFlag, "true")
      probed shouldBe base
    } finally spark.conf.set(graft.ops.Corpus.DebugChecksFlag, "false")
  }

  test("full service vet: intra-batch lattice + write-back in one loop") {
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_cdc2")
    val idxDir = root.resolve("sig_index").toString
    val srcDir = root.resolve("arrivals")
    java.nio.file.Files.createDirectory(srcDir)

    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    graft.ops.Text.bandProject(corpus)
      .write.mode("overwrite").parquet(idxDir)

    // ONE file → ONE micro-batch holding an internal near-dup pair
    // (9, 19) plus a corpus near-dup (29): the corpus-only vet would
    // admit BOTH 9 and 19. A second file then probes that only 9 —
    // the batch's first occurrence — entered the index.
    def stage(name: String, mtime: Long, rows: Seq[(Long, String)]): Unit = {
      val tmp = root.resolve(s"stage_$name")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      val dst = srcDir.resolve(s"$name.parquet")
      java.nio.file.Files.move(java.nio.file.Paths.get(part), dst)
      java.nio.file.Files.setLastModifiedTime(
        dst, java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = 1600000000000L
    stage("f1", t0, Seq(
      (9L, "foo bar baz quux"),
      (19L, "foo  bar baz quux"),        // intra-batch near-dup of 9
      (29L, "alpha  beta gamma delta"))) // corpus near-dup
    stage("f2", t0 + 60000, Seq((39L, "foo bar  baz  quux")))

    val verdicts = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Option[Long])]
    val q = spark.readStream
      .schema(corpus.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .writeStream
      .option("checkpointLocation", root.resolve("ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val out = graft.ops.Text.ingestTick(spark, idxDir, batch, id)
          .as[(Long, String, Option[Long])].collect().sortBy(_._1)
        verdicts.synchronized { verdicts ++= out }
        ()
      }
      .start()
    try q.awaitTermination(120000) shouldBe true
    finally q.stop()

    verdicts.sortBy(_._1).toSeq shouldBe Seq(
      (9L, "keep", None),
      (19L, "drop_batch_near", Some(9L)), // caught INSIDE its own batch
      (29L, "drop_near", Some(1L)),
      (39L, "drop_near", Some(9L)))       // vs batch 1's single admission
    // exactly one row of the near-dup pair entered the index
    graft.ops.Text.readIndex(spark, idxDir)
      .filter($"doc_id".isin(9L, 19L)).count() shouldBe 1L
  }

  test("replayed micro-batch is idempotent: same verdicts, index unchanged") {
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_cdc3")
    val idxDir = root.resolve("sig_index").toString
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    graft.ops.Text.bandProject(corpus)
      .write.mode("overwrite").parquet(idxDir)

    val batch = Seq(
      (9L, "foo bar baz quux"),           // new → keep
      (29L, "alpha  beta gamma delta"))   // corpus near-dup → drop
      .toDF("doc_id", "text")

    def tick() = graft.ops.Text.ingestTick(spark, idxDir, batch, 7L)
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    def indexRows() = graft.ops.Text.readIndex(spark, idxDir)
      .as[(Long, String, String)].collect().sorted.toSeq

    val first = tick()
    first shouldBe Seq((9L, "keep", None), (29L, "drop_near", Some(1L)))
    val idxAfterFirst = indexRows()
    idxAfterFirst.map(_._1) should contain(9L)

    // the crash-replay: foreachBatch re-delivers batch 7 AFTER its
    // write-back already committed. The vet must NOT see its own
    // keeps (else 9 would verdict drop_exact and the overwrite would
    // silently lose it) and the index must end byte-identical.
    val replay = tick()
    replay shouldBe first
    indexRows() shouldBe idxAfterFirst

    // a LATER batch then sees batch 7's admission as a standing row
    val next = Seq((19L, "foo  bar baz quux")).toDF("doc_id", "text")
    graft.ops.Text.ingestTick(spark, idxDir, next, 8L)
      .as[(Long, String, Option[Long])].collect().toSeq shouldBe
      Seq((19L, "drop_near", Some(9L)))
  }

  test("compaction folds generations; a crashed sweep's leftovers change no verdict") {
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_cdc4")
    val idxDir = root.resolve("sig_index").toString
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    graft.ops.Text.bandProject(corpus)
      .write.mode("overwrite").parquet(idxDir)

    // two ingests accumulate two committed directories
    graft.ops.Text.ingestTick(spark, idxDir,
      Seq((9L, "foo bar baz quux")).toDF("doc_id", "text"), 1L).count()
    graft.ops.Text.ingestTick(spark, idxDir,
      Seq((15L, "unique new content")).toDF("doc_id", "text"), 2L).count()

    def probe() = graft.ops.Text.ingestTick(spark, idxDir,
        Seq((90L, "foo  bar baz quux"),      // near-dup of ingest 1's keep
            (91L, "alpha  beta gamma delta") // near-dup of the seed
        ).toDF("doc_id", "text"), 99L)
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    def rootEntries() = {
      val fs = new org.apache.hadoop.fs.Path(idxDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(new org.apache.hadoop.fs.Path(idxDir))
        .map(_.getPath.getName).filterNot(_.startsWith("_")).sorted.toSeq
    }

    val before = probe()
    before.map(_._2) shouldBe Seq("drop_near", "drop_near")

    graft.ops.Text.compactIndex(spark, idxDir, 1L)
    // one generation directory left (plus the probe tick's own dir)
    rootEntries().filterNot(_ == "ingest_99") shouldBe Seq("gen_1")
    probe() shouldBe before

    // crashed-sweep simulation: a leftover duplicate of the seed rows
    // survives next to the generation — min-keeper lookups are
    // idempotent under duplication, so verdicts must not move, and
    // the NEXT compaction removes the leftover
    graft.ops.Text.bandProject(corpus).write.mode("append").parquet(idxDir)
    probe() shouldBe before
    graft.ops.Text.compactIndex(spark, idxDir, 2L)
    rootEntries().filterNot(_ == "ingest_99") shouldBe Seq("gen_2")
    probe() shouldBe before
  }
}
