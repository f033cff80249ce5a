package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata (TESTDATA.md).
  *
  * Every q_* query reads only through these. At 100 TB these would be
  * date-partitioned catalogs; locally they are single parquet files —
  * the point is that all access goes through one chokepoint so a real
  * catalog (partitioned layout, bucketing metadata) slots in here.
  *
  * KEY CONTRACT (r14 null-key sweep): each table's id column
  * (doc_id, vec_id, the TPC-H *key columns) is a NON-NULL primary
  * key. The engine's internal doc-grain equi-joins — the gate-funnel
  * flag lattices, every memoized signature/score/token table, the
  * postings index — rely on it: an equi-join never matches a null
  * key, so a null id would silently drop its row from derived
  * results rather than error. A catalog slotting in here must
  * preserve that (enforce NOT NULL at ingest); helpers that accept
  * ARBITRARY caller input instead define their own null behavior
  * explicitly (connectedComponents ignores null-endpoint edges,
  * mergePostings rejects null keys under spark.graft.debugChecks —
  * both pinned in NullKeySpec). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** events.ts has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) — which with
    * spark.sql.legacy.parquet.nanosAsLong (set in GraftSession)
    * arrives as epoch-nanos LongType — and plain TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which arrives as TimestampNTZType.
    * Normalize both to the µs TimestampType every query expects:
    * nanos go through `ts div 1000` (integer division — lossless for
    * the full int64 range, unlike `/` which goes through double);
    * NTZ casts straight across (the host and oracle both run UTC).
    * Oracle side uses CAST(ts AS TIMESTAMP) either way.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
