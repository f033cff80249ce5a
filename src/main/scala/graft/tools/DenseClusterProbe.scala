package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.{GraftSession, Tables}
import graft.ops.Text
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dense-cluster dedup stress probe (dev tool, off-bench): grows the
  * corpus's densest LSH band by `growth`× and measures the dedup
  * family's wall time AND single-task peaks on it — the r10 verdict's
  * ask that the "linear at 100×" claim become a measured curve, not
  * prose.
  *
  * The probe runs each surface in BOTH formulations:
  *  - `raw`  — the retired band self-join (`a.band = b.band AND
  *    a.doc_id < b.doc_id`): per-bucket QUADRATIC, and the whole
  *    bucket's fan-out lands on ONE task (AQE cannot split inside a
  *    join key's output);
  *  - `star` — the shipped (keeper, member) reduction
  *    ([[Text.qMinhashDedup]] / [[Text.qMinhashEst]]): per-bucket
  *    linear.
  *
  * Per variant it reports wall seconds, output rows, the longest
  * single task, and the largest per-task shuffle read/write record
  * counts (a straggler detector: the raw plan's dense bucket shows up
  * as one task holding the entire cluster's pair surface).
  *
  * Usage: `runMain graft.tools.DenseClusterProbe [growth]` (default
  * 10; SPARK_GRAFT_SF_DIR picks the base corpus, default sf0.1).
  * Writes the grown corpus under /tmp/graft-stress; never touches
  * testdata. Results recorded in PLANS.md ("Dense-cluster stress
  * probe").
  */
object DenseClusterProbe {

  /** Max-tracking task listener; `reset()` between variants. */
  private final class Peaks extends SparkListener {
    val maxDurMs = new AtomicLong(0)
    val maxShufRead = new AtomicLong(0)
    val maxShufWrite = new AtomicLong(0)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        maxDurMs.getAndAccumulate(m.executorRunTime, math.max)
        maxShufRead.getAndAccumulate(m.shuffleReadMetrics.recordsRead, math.max)
        maxShufWrite.getAndAccumulate(
          m.shuffleWriteMetrics.recordsWritten, math.max)
      }
    }
    def reset(): Unit = { maxDurMs.set(0); maxShufRead.set(0); maxShufWrite.set(0) }
  }

  /** The RETIRED raw band self-join over the 4-salt signature table —
    * kept here (probe-only) as the quadratic baseline. */
  private def rawDedup(spark: SparkSession, dir: String): DataFrame = {
    val sig = Text.qMinhashSig(spark, dir).select(col("doc_id"), col("band"))
    sig.alias("a")
      .join(sig.alias("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.band").as("band"))
  }

  /** The retired raw mh20 estimator self-join — quadratic baseline. */
  private def rawEst(spark: SparkSession, dir: String): DataFrame = {
    val sig = Text.mh20Sigs(spark, dir)
    val matches = (0 until 16)
      .map(i => (col(s"a.m$i") === col(s"b.m$i")).cast("int"))
      .reduce(_ + _)
    sig.alias("a")
      .join(sig.alias("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        round(matches.cast("double") / 16, 4).as("est_jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val growth = args.headOption.map(_.toInt).getOrElse(10)
    val out = "/tmp/graft-stress"
    val spark = GraftSession.local()
    import spark.implicits._

    // densest band of the base corpus, via the production signature path
    val sig = Text.qMinhashSig(spark, sfDir).select($"doc_id", $"band")
    val top = sig.groupBy($"band").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc).head()
    val denseBand = top.getString(0)
    val m0 = top.getLong(1)
    println(f"[stress] base corpus $sfDir: densest band $denseBand has $m0 docs")

    // grow that cluster growth× with fresh doc_ids (same text → same band)
    val denseIds = sig.filter($"band" === denseBand).select($"doc_id")
    val docs = Tables.documents(spark, sfDir)
    val cols = docs.columns.map(col)
    val clones = docs.join(denseIds, Seq("doc_id"), "left_semi")
      .withColumn("__i", explode(sequence(lit(1), lit(growth - 1))))
      .withColumn("doc_id", $"doc_id" + $"__i" * 1000000000L)
      .select(cols: _*)
    docs.union(clones).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    println(s"[stress] grown corpus at $out: dense cluster ${m0 * growth} docs")

    val peaks = new Peaks
    spark.sparkContext.addSparkListener(peaks)
    def run(name: String, df: => DataFrame): Unit = {
      Text.clearMemoCaches()
      peaks.reset()
      val t0 = System.nanoTime()
      val frame = df
      frame.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = frame.count()
      println(f"[stress] $name%-11s wall=$wall%7.2fs rows=$rows%11d " +
        f"maxTaskDur=${peaks.maxDurMs.get / 1000.0}%7.2fs " +
        f"maxShufRead=${peaks.maxShufRead.get}%10d " +
        f"maxShufWrite=${peaks.maxShufWrite.get}%10d")
    }

    run("star_dedup", Text.qMinhashDedup(spark, out))
    run("star_est", Text.qMinhashEst(spark, out))
    // `star-only` skips the quadratic baselines: at growth 100 the raw
    // surface is ~2.6e10 pairs on one task (~45 min) — the point of
    // the probe is that the star path no longer pays it
    if (!args.contains("star-only")) {
      run("raw_dedup", rawDedup(spark, out))
      run("raw_est", rawEst(spark, out))
    }
    spark.stop()
  }
}
