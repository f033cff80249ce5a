package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only: list every registry query whose physical plan still
  * contains a BroadcastExchange when auto-broadcast is disabled —
  * i.e. the queries carrying an explicit broadcast() hint. Input for
  * the OpsSpec registry-wide hint whitelist. */
object HintSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val hinted = SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      plan.contains("BroadcastExchange")
    }
    println("HINTED_BROADCAST_QUERIES:")
    hinted.foreach(n => println(s"  $n"))
    spark.stop()
  }
}
