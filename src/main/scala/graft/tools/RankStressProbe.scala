package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.GraftSession
import graft.ops.Skew
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-cardinality window stress probe (dev tool, off-bench):
  * the r11 verdict's single-source worst case, measured. A corpus
  * where EVERY row belongs to one source is the degenerate input for
  * any source-partitioned window — the whole table funnels through
  * one task's sort — and the exact shape [[Skew.scalableRank]] /
  * [[Skew.scalableCumsum]] exist to retire.
  *
  * The probe builds an n-row single-source table (n_chars =
  * hash-scrambled, doc_id unique) and runs global rank and running
  * sum in BOTH formulations:
  *  - `single` — the retired `row_number()/sum() OVER (PARTITION BY
  *    source ORDER BY …)`: one WindowExec partition = one task holds
  *    all n rows;
  *  - `two-phase` — the shipped helpers: range-split local windows +
  *    broadcast prefix offsets, max task input ≈ n / ranges.
  *
  * Per variant it reports wall seconds, the longest single task, and
  * the largest per-task shuffle read/write record counts, plus a
  * Σrank/Σcumsum checksum that must MATCH across formulations (the
  * same value-equality SkewSpec pins at test scale).
  *
  * Usage: `runMain graft.tools.RankStressProbe [rows]` (default
  * 2 000 000). Writes under /tmp/graft-stress-rank; never touches
  * testdata. Results recorded in PLANS.md ("Single-source rank
  * stress probe").
  */
object RankStressProbe {

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

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val out = "/tmp/graft-stress-rank"
    val spark = GraftSession.local()
    import spark.implicits._

    spark.range(n)
      .select($"id".as("doc_id"), lit("src0").as("source"),
        pmod(hash($"id"), lit(100000)).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$out/docs.parquet")
    val docs = spark.read.parquet(s"$out/docs.parquet")
    val order = Seq($"n_chars".desc, $"doc_id".asc)
    println(s"[rank-stress] single-source table: $n rows at $out")

    val peaks = new Peaks
    spark.sparkContext.addSparkListener(peaks)
    def run(name: String, df: => DataFrame): Unit = {
      peaks.reset()
      val t0 = System.nanoTime()
      val row = df.head()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[rank-stress] $name%-16s wall=$wall%7.2fs " +
        f"checksum=${row.getLong(0)}%20d " +
        f"maxTaskDur=${peaks.maxDurMs.get / 1000.0}%7.2fs " +
        f"maxShufRead=${peaks.maxShufRead.get}%10d " +
        f"maxShufWrite=${peaks.maxShufWrite.get}%10d")
    }

    val w = Window.partitionBy($"source").orderBy(order: _*)
    run("single_rank", docs
      .withColumn("rn", row_number().over(w).cast("long"))
      .agg(sum($"rn" * $"n_chars").as("chk")))
    run("two_phase_rank", Skew.scalableRank(docs, Seq("source"), order, "rn")
      .agg(sum($"rn" * $"n_chars").as("chk")))
    run("single_cumsum", docs
      .withColumn("cum", sum($"n_chars").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .agg(sum($"cum" % 1000000007L).as("chk")))
    run("two_phase_cumsum", Skew.scalableCumsum(docs, Seq("source"), order,
        $"n_chars", "cum")
      .agg(sum($"cum" % 1000000007L).as("chk")))
    spark.stop()
  }
}
