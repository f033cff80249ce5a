package graft

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.scalatest.matchers.should.Matchers

/** The injected optimizer rule (graft.plans.LevenshteinThreshold):
  * bounded edit-distance comparisons must rewrite to the banded
  * thresholded DP, with identical results in every direction/bound
  * shape. Known distances: kitten↔sitting = 3, flaw↔lawn = 2,
  * abc↔abc = 0, abcdefgh↔zzzzzzzz = 8. */
class PlanRuleSpec extends SparkSuite with Matchers {

  private def pairs() = {
    import spark.implicits._
    // parquet-backed, not a LocalRelation: ConvertToLocalRelation
    // would otherwise evaluate the filter at optimize time and leave
    // no expression to assert on
    val dir = java.nio.file.Files.createTempDirectory("graft_lev").toString
    Seq(("kitten", "sitting"), ("flaw", "lawn"),
      ("abc", "abc"), ("abcdefgh", "zzzzzzzz"))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("lev_pairs")
  }

  test("levenshtein(a,b) <= k rewrites to the thresholded form, same rows") {
    pairs()
    val q = spark.sql("SELECT a FROM lev_pairs WHERE levenshtein(a, b) <= 2")
    val levs = q.queryExecution.optimizedPlan // whole tree, not just the root
      .flatMap(_.expressions).flatMap(_.collect { case l: Levenshtein => l })
    levs should not be empty
    levs.foreach(_.threshold shouldBe defined) // the rewrite fired
    import spark.implicits._
    q.as[String].collect().toSet shouldBe Set("flaw", "abc")
  }

  test("strict and flipped bounds rewrite with the same semantics") {
    pairs()
    def n(sql: String): Long = spark.sql(sql).head().getLong(0)
    n("SELECT count(*) FROM lev_pairs WHERE levenshtein(a, b) < 3") shouldBe 2
    n("SELECT count(*) FROM lev_pairs WHERE 3 >= levenshtein(a, b)") shouldBe 3
    n("SELECT count(*) FROM lev_pairs WHERE 3 > levenshtein(a, b)") shouldBe 2
    n("SELECT count(*) FROM lev_pairs WHERE levenshtein(a, b) <= 0") shouldBe 1
    // unbounded comparisons are untouched and still correct
    n("SELECT count(*) FROM lev_pairs WHERE levenshtein(a, b) >= 3") shouldBe 2
  }

  test("projected boolean flags rewrite too (any boolean context)") {
    pairs()
    import spark.implicits._
    val q = spark.sql(
      "SELECT a, levenshtein(a, b) <= 2 AS close FROM lev_pairs ORDER BY a")
    val levs = q.queryExecution.optimizedPlan
      .flatMap(_.expressions).flatMap(_.collect { case l: Levenshtein => l })
    levs should not be empty
    levs.foreach(_.threshold shouldBe defined)
    q.as[(String, Boolean)].collect().toSeq shouldBe Seq(
      ("abc", true), ("abcdefgh", false), ("flaw", true), ("kitten", false))
  }
}
