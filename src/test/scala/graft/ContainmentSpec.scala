package graft

import org.scalatest.matchers.should.Matchers

/** Behavioral pins for qContainment ahead of the r17 group-grain
  * factorization (PLANS.md r16 addendum 2): the rewrite must
  * preserve (1) the equal-token-size containee direction (greatest
  * doc_id, decided PER MEMBER PAIR — the one case the design sketch
  * shows is NOT liftable to content-group grain), (2) the exclusion
  * of identical-content pairs (exact Jaccard 1.0 fails the < 0.9
  * gate, so clones never contain each other), and (3) the argmax
  * tie-break (i desc, c_tok desc, container asc). The shipped
  * oracle SFs exercise none of these edges directly, hence the
  * crafted corpus.
  */
class ContainmentSpec extends SparkSuite with Matchers {

  test("containment pins: equal-size direction, clone exclusion, argmax tie") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cont").toString
    Seq(
      (1L, "ta tb tc td te tf tg th ti tj", "en", "s0", 29L),
      (2L, "ta tb tc td te tf tg th ti tk", "en", "s0", 29L),
      (3L, "ta tb tc td te tf tg th ti tj", "en", "s0", 29L), // clone of 1
      (5L, "ta tb tc td te", "en", "s0", 14L),
      (10L, "pa pb pc pd pe pf pg ph pi pj", "en", "s0", 29L),
      (11L, "pa pb pc pd pe pf pg ph pi pz", "en", "s0", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.ops.Text.qContainment(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("container"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("c_tok"),
        r.getAs[Long]("i"), r.getAs[Long]("cont_pm")))
    rows shouldBe Array(
      // equal sizes (docs 1 and 2, 9/10 shared): containee = the
      // HIGHER doc_id of the member pair
      (2L, 1L, 10L, 10L, 9L, 900L),
      // clone of 1: the (1,3) pair is excluded (Jaccard exactly
      // 1.0), but (2,3) flows with containee 3 — identical CONTENT
      // does not merge doc identity
      (3L, 2L, 10L, 10L, 9L, 900L),
      // true subset: containers 1, 2, 3 tie on (i, c_tok);
      // container asc picks 1
      (5L, 1L, 5L, 10L, 5L, 1000L),
      (11L, 10L, 10L, 10L, 9L, 900L))
  }
}
