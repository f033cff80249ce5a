package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The null-key sweep (r13 verdict "Next round" #5): internal
  * equi-joins on key columns silently drop null-keyed rows — the
  * class SkewSpec's `<=>` fix retired for the two-phase helpers.
  * This suite pins the DEFINED null behavior of every remaining
  * helper that accepts arbitrary caller input (the memoized internal
  * tables inherit the Tables.scala non-null key contract instead —
  * their keys all derive from table PKs):
  *
  *  - connectedComponents: edges with a null endpoint are IGNORED
  *    (a null id carries no identity) — not half-propagated.
  *  - mergePostings: null doc_id/term REJECTED under debugChecks
  *    (they would otherwise vanish from the idf/norm equi-joins).
  *  - Tables.load: a null id in a table's key column(s) REJECTED
  *    under debugChecks (r15) — the chokepoint enforcement of the
  *    Tables.scala key contract every internal equi-join relies on.
  *  - bandProject: a null text yields null digest/band — the row
  *    survives the projection (grouping semantics downstream match
  *    SQL GROUP BY, which keeps a null group on both engines).
  */
class NullKeySpec extends SparkSuite with Matchers {

  test("connectedComponents ignores edges with null endpoints") {
    import spark.implicits._
    val clean = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
    val withNulls = Seq(
      (Some(1L), Some(2L)), (Some(2L), Some(3L)), (Some(10L), Some(11L)),
      (None, Some(7L)), (Some(8L), None), (None: Option[Long], None: Option[Long]))
      .toDF("da", "db")
    def run(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      graft.ops.Text.connectedComponents(spark, df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = run(clean)
    base shouldBe Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
    // null-endpoint edges contribute nothing: no phantom null node,
    // no half-propagated label for 7 or 8 (they are not in the graph)
    run(withNulls) shouldBe base
  }

  test("connectedComponents on only-null edges is the empty fixpoint") {
    import spark.implicits._
    val onlyNulls = Seq((None: Option[Long], Some(7L)),
      (Some(8L), None: Option[Long])).toDF("da", "db")
    graft.ops.Text.connectedComponents(spark, onlyNulls)
      .count() shouldBe 0L
  }

  test("mergePostings rejects null doc_id/term under debugChecks") {
    import spark.implicits._
    val ok = Seq((1L, "alpha", 2L), (2L, "beta", 1L))
      .toDF("doc_id", "term", "tf")
    val nullTerm = Seq((Some(3L), Option.empty[String], Some(1L)))
      .toDF("doc_id", "term", "tf")
    val nullDoc = Seq((Option.empty[Long], Some("gamma"), Some(1L)))
      .toDF("doc_id", "term", "tf")

    // default: documented contract, no probe jobs — and the drop the
    // guard exists to catch is REAL: the null-term posting row is
    // absent from the merged index (not an error)
    val merged = graft.ops.Corpus.mergePostings(ok, nullTerm)
    merged.filter(col("doc_id") === 3L).count() shouldBe 0L

    spark.conf.set(graft.ops.Corpus.DebugChecksFlag, "true")
    try {
      an[IllegalArgumentException] should be thrownBy
        graft.ops.Corpus.mergePostings(ok, nullTerm)
      an[IllegalArgumentException] should be thrownBy
        graft.ops.Corpus.mergePostings(nullDoc, ok.filter(lit(false)))
      // clean inputs still pass with the probes on
      graft.ops.Corpus.mergePostings(ok, Seq((9L, "delta", 1L))
        .toDF("doc_id", "term", "tf")).count() should be > 0L
    } finally spark.conf.set(graft.ops.Corpus.DebugChecksFlag, "false")
  }

  test("Tables.load rejects a null-id catalog under debugChecks") {
    import spark.implicits._
    // a catalog violating the NOT-NULL key contract (Tables.scala):
    // doc 2's id is null — every doc-grain equi-join would silently
    // drop it from derived results rather than error
    val dir = java.nio.file.Files.createTempDirectory("graft_nullid").toString
    Seq((Some(1L), "s0", "alpha beta"), (None: Option[Long], "s0", "gamma"))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$dir/documents.parquet")

    // default: documented contract, zero probe jobs — the doc-grain
    // query runs, and the null-id row is in the silent-drop class
    graft.ops.Text.qExactDedup(spark, dir).count() should be >= 0L

    spark.conf.set(Tables.DebugChecksFlag, "true")
    try {
      val ex = the[IllegalArgumentException] thrownBy
        graft.ops.Text.qExactDedup(spark, dir).count()
      ex.getMessage should include("Tables.documents: null id")
      // a clean catalog passes with the probe armed
      val clean = java.nio.file.Files.createTempDirectory("graft_cleanid").toString
      Seq((1L, "s0", "alpha beta"), (2L, "s0", "gamma"))
        .toDF("doc_id", "source", "text")
        .write.parquet(s"$clean/documents.parquet")
      graft.ops.Text.qExactDedup(spark, clean).count() should be >= 0L
    } finally spark.conf.set(Tables.DebugChecksFlag, "false")
  }

  test("gopherGate drops null-text docs; qGateFunnel excludes them") {
    import spark.implicits._
    // Pin (r16, advice): the oracle's per-word max-multiplicity CTE
    // inner-joins back to the doc, and unnest of a null token list
    // emits no rows — so DuckDB drops null-text docs from
    // q_gopher_rules and from every q_gate_funnel count (n_docs
    // included, via the inner join on the gopher leg). gopherGate's
    // explicit isNotNull filter makes the Spark side match; without
    // it the r15 pure projection keeps the doc with wc = -1
    // (flag bit 1 set), drifting the funnel.
    val gate = graft.ops.Text.gopherGate(
      Seq((1L, Some("alpha beta gamma")), (2L, Option.empty[String]))
        .toDF("doc_id", "text"))
    gate.select($"doc_id").as[Long].collect().toSet shouldBe Set(1L)

    val dir = java.nio.file.Files.createTempDirectory("graft_nulltext").toString
    Seq((1L, Some("alpha beta alpha beta gamma"), "en", "s0", 27L),
        (2L, Option.empty[String], "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val funnel = graft.ops.Text.qGateFunnel(spark, dir).collect()
    funnel.length shouldBe 1
    funnel(0).getAs[String]("source") shouldBe "s0"
    funnel(0).getAs[Long]("n_docs") shouldBe 1L
  }

  test("bandProject keeps a null-text row with null digest and band") {
    import spark.implicits._
    val rows = graft.ops.Text.bandProject(
      Seq((1L, Some("alpha beta")), (2L, Option.empty[String]))
        .toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2))).toSet
    rows shouldBe Set((1L, false, false), (2L, true, true))
  }
}
