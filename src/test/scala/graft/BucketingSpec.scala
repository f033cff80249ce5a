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

  /** §4.3 runtime row-level filtering: when a shuffle join's build
    * side carries a selective predicate, Catalyst injects a bloom
    * filter built from the dim keys INTO THE FACT SCAN — at 100 TB
    * the fact side drops non-joining rows at the scan instead of
    * shuffling them. Local thresholds are tuned so the rule fires at
    * toy SF (the application side must normally scan ≥ 10 GB). */
  test("runtime bloom filter: selective dim predicate prefilters the fact side") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
      val dim = Tables.orders(spark, sf)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")
      val opt = joined.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt.contains("might_contain"),
        s"expected an injected bloom filter probe in:\n$opt")
      // the probe must sit on the FACT side, fed by an agg over dim keys
      assert(opt.contains("bloom_filter_agg"), "expected the builder agg")
      // and rows are exactly the unfiltered-join rows (bloom is a
      // may-contain prefilter; the join still decides membership)
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf)
          .filter($"o_orderpriority" === "1-URGENT"), $"l_orderkey" === $"o_orderkey")
      joined.count() shouldBe expected.count()
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
