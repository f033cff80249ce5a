package graft.tools

/** Dev-only pass-level timer: runs the named queries IN ORDER inside
  * shared memo passes (clear once per pass, like [[graft.Bench]]),
  * so family-level shared-work effects are visible — Profile clears
  * per RUN and therefore times each query as if it paid all shared
  * work itself. Used for the r10 A/Bs that accepted the shared
  * gram table (+2.3 s family win) and rejected the full mh20
  * pair-surface memo (checkpointing 2.6M pair rows cost more than
  * the saved join).
  *
  * runMain graft.tools.PassSim <query...>   (SPARK_GRAFT_SF_DIR picks the SF)
  */
object PassSim {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_est_error", "q_lsh_precision", "q_minhash_est", "q_topk")
    val spark = graft.GraftSession.local()
    graft.SparkEntry.queries("q_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    for (pass <- 1 to 2) {
      graft.ops.Text.clearMemoCaches()
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[pass$pass] $n%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f")
      }
    }
    spark.stop()
  }
}
