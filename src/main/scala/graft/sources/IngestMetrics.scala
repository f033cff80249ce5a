package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Ingest observability (SURVEY.md §4.1 size-accounting row — the
  * metric analog of the reference's byte accounting at
  * convert.sh:101-106): corrupt-sidecar quarantine is proven by test,
  * but at 100 TB the reject RATE must be an observable metric, not a
  * grep — a parser regression that quarantines 30% of a day's
  * sidecars should trip a gauge, not be discovered downstream.
  *
  * Mechanism: every [[MediaInventory.parsePacketDump]] read carries a
  * `Dataset.observe` node counting rows read and rows quarantined.
  * Observable metrics are computed INSIDE the read job (accumulator-
  * backed — no second scan, no extra action) and are delivered to
  * every registered [[QueryExecutionListener]] on completion; the same
  * node works unchanged under Structured Streaming (per-batch via
  * StreamingQueryListener). This object is the engine's built-in
  * consumer: a session-level running total + reject rate.
  *
  * One observe name may appear at most once per query, so a plan that
  * UNIONS two observed reads must alias one of them — the engine's
  * own readers never do. */
object IngestMetrics {
  val MetricName = "graft.ingest"

  final case class Counts(rowsRead: Long, rowsQuarantined: Long) {
    def rejectRate: Double =
      if (rowsRead == 0L) 0.0 else rowsQuarantined.toDouble / rowsRead
  }

  private val totals = new AtomicReference(Counts(0L, 0L))
  private val registered = ConcurrentHashMap.newKeySet[SparkSession]()

  /** Attach the quarantine-counting observe node at a parse boundary
    * whose rows carry a `_corrupt_record` column. count(when) — never
    * sum — so an empty read reports 0, not null. */
  private[graft] def observed(df: DataFrame): DataFrame =
    df.observe(MetricName,
      count(lit(1)).as("rows_read"),
      count(when(col("_corrupt_record").isNotNull, lit(1)))
        .as("rows_quarantined"))

  private object Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.get(MetricName).foreach { row =>
        val r = row.getAs[Long]("rows_read")
        val q = row.getAs[Long]("rows_quarantined")
        totals.updateAndGet(c => Counts(c.rowsRead + r, c.rowsQuarantined + q))
      }
    override def onFailure(funcName: String, qe: QueryExecution,
                           ex: Exception): Unit = ()
  }

  /** Idempotent per session; reader entry points call this so the
    * gauge works without any user wiring. */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) spark.listenerManager.register(Listener)

  def snapshot(): Counts = totals.get()
  def reset(): Unit = totals.set(Counts(0L, 0L))
}
