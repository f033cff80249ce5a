package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dev-only: dump the formatted physical plan of named queries (or a
  * default headline set) to a directory — the raw material for the
  * PLANS.md explain audit. */
object PlanDump {
  private val headline = Seq(
    "q_pricing_summary", "q_multiway_join", "q_broadcast_join", "q_topk",
    "q_asof_join", "q_minhash_dedup", "q_lsh_neardup", "q_cosine_topk",
    "q_ann_ivf", "q_tfidf", "q_edit_distance", "q_sessionize",
    "q_cust_distribution", "q_exact_dedup")

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/plans")
    val names = if (args.length > 1) args.drop(1).toSeq else headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.local()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"$n.txt"), txt.getBytes("UTF-8"))
      println(s"[plandump] $n -> $outDir/$n.txt")
    }
    spark.stop()
  }
}
