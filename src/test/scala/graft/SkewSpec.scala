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
}
