package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** §4.3 skew mitigation: the salted two-phase aggregation must be
  * value-equivalent to the direct groupBy at any salt fanout. */
class SkewSpec extends SparkSuite with Matchers {
  test("salted two-phase agg equals the direct groupBy (any salt fanout)") {
    import spark.implicits._
    val df = Tables.events(spark, sf)
    val direct = df.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .orderBy($"event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    for (salts <- Seq(1, 4, 32)) {
      val salted = Skew.saltedAgg(df, "event_type", "value", "event_id", salts)
        .orderBy($"event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      salted.map(t => (t._1, t._2)) shouldBe direct.map(t => (t._1, t._2))
      // double sums reassociate across salts: compare to relative 1e-9
      salted.zip(direct).foreach { case (a, b) =>
        a._3 shouldBe b._3 +- math.abs(b._3) * 1e-9
      }
    }
  }

  /** The runtime half of the §4.3 doctrine: AQE detects a shuffle
    * partition dominated by one hot key AFTER the map stage runs and
    * splits it across tasks (skew=true on the join node) — no salting
    * code, no plan change, same rows. Thresholds are lowered so the
    * toy dataset trips the same detector a 100 TB hot key would. */
  test("AQE splits a skewed shuffle-join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying 50k wide rows, 100 cold keys with one row
      val fact = spark.range(0, 50000)
        .select(lit(0L).as("k"), concat(lit("x" * 64), $"id").as("payload"))
        .union(spark.range(1, 101).select($"id".as("k"), lit("cold").as("payload")))
      val dim = spark.range(0, 101).select($"id".as("k"), ($"id" * 7).as("attr"))
      val joined = fact.join(dim, "k")
      // collect() drives THIS QueryExecution, so its adaptive plan is
      // final afterwards (count() would execute a different plan tree)
      val n = joined.collect().length
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan:\n$plan")
      n shouldBe 50100
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
