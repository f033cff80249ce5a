package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only: one timed noop-write per named query on an arbitrary
  * data dir — the cross-scale scaling probe (r16: sf0.1 → synth sf1
  * → synth sf10, i.e. up to 100× the bench SF). One run per query,
  * not Profile's 3: at 10× data a heavy query is minutes, and the
  * probe's question is the SCALING RATIO between decades (≈ linear
  * vs quadratic), which host noise cannot fake an order of magnitude
  * of. Memo caches are cleared per query so each line carries its
  * own shared-family build, same as Profile.
  *
  * Usage: runMain graft.tools.ScaleProbe <dataDir> <q...>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleProbe <dataDir> <q...>")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.local()
    // untimed warmup (codegen/classloading)
    SparkEntry.queries("q_group_count")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      graft.ops.Text.clearMemoCaches()
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"[scaleprobe] $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      } catch {
        case e: Throwable =>
          println(f"[scaleprobe] $n%-24s FAILED after ${(System.nanoTime() - t0) / 1e9}%.2f s: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
