package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata (TESTDATA.md).
  *
  * Every q_* query reads only through these. At 100 TB these would be
  * date-partitioned catalogs; locally they are single parquet files —
  * the point is that all access goes through one chokepoint so a real
  * catalog (partitioned layout, bucketing metadata) slots in here.
  */
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
