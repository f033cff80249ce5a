package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** §4.3 co-located joins via bucketing: two tables bucketed by the
  * join key with matching bucket counts join WITHOUT any shuffle —
  * the physical plan has zero Exchange operators on the join path.
  * At 100 TB this converts the one unavoidable fact-fact shuffle
  * (lineitem⋈orders) into a bucket-local merge: each task reads one
  * bucket pair, nothing crosses the network. */
class BucketingSpec extends SparkSuite with Matchers {

  test("matching bucketed tables join with zero exchanges") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
    // a previously failed run can leave an orphan location behind
    val wh = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft-warehouse")
    Seq("li_bkt", "ord_bkt").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete())
        d.delete()
      }
    }
    Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bkt")
    Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bkt")

    // merge hint: at sf0.001 the planner would broadcast instead
    // (correct for tiny dims); at fact-fact scale SMJ is what fires,
    // and that is the path bucketing de-shuffles.
    val joined = spark.table("li_bkt").hint("merge")
      .join(spark.table("ord_bkt"), $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    plan should include("SortMergeJoin")
    plan should not include "Exchange"

    // and it computes the same result as the plain (shuffling) join
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .count()
    joined.count() shouldBe expected
  }
}
