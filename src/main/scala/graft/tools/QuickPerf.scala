package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: separate cold-start overhead from steady-state query time.
  * runMain graft.tools.QuickPerf [sfDir] */
object QuickPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val t00 = System.nanoTime()
    val spark = graft.GraftSession.local()
    println(f"session up: ${(System.nanoTime() - t00) / 1e9}%.2f s")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = graft.ops.Relational.qPricingSummary(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
