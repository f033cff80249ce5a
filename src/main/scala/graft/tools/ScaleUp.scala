package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: synthesize a larger scale factor by DETERMINISTIC
  * re-keyed replication of an existing testdata directory (r15
  * verdict #1 — the shipped corpora stop at sf0.1, and the only
  * correctness escapes this engine ever had were SF-crossing ties,
  * so the cross-scale battery needs a bigger corpus to cross into).
  *
  * Each table is replicated `copies`× with every id column in a
  * keyspace shifted by `i * offset(keyspace)` for copy i, where
  * offset is the smallest power of 10 above the keyspace's max id —
  * ids stay readable (copy 3 of doc 42 at offset 10⁴ is 30042),
  * referential integrity is preserved exactly (orders→customer,
  * lineitem→orders/part/supplier move in lockstep), and the output
  * is bit-deterministic given the input (no RNG, no timestamps).
  * Dimension tables (region, nation) are NOT replicated — at every
  * real TPC-H SF they are fixed-size, and fact rows keep pointing at
  * them. Non-key columns are copied verbatim: replicated docs are
  * EXACT duplicates under new ids, which is the adversarial case for
  * the dedup/LSH/CC families (every doc becomes a `copies`-clique),
  * and replicated value columns push every SUM 10× closer to any
  * rounding-tie or overflow boundary — the classes this corpus
  * exists to flush out.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> [copies=10]
  */
object ScaleUp {

  /** id columns per table mapped to their keyspace; every column in
    * a keyspace shifts by the same offset so equi-joins stay valid. */
  private case class Plan(table: String, keys: Map[String, String])
  // keyspace -> (table, column) sites; offset computed once per
  // keyspace from the table that OWNS the id (the primary side)
  private val plans = Seq(
    Plan("customer", Map("c_custkey" -> "customer")),
    Plan("supplier", Map("s_suppkey" -> "supplier")),
    Plan("part", Map("p_partkey" -> "part")),
    Plan("orders", Map("o_orderkey" -> "orders", "o_custkey" -> "customer")),
    Plan("lineitem", Map(
      "l_orderkey" -> "orders", "l_partkey" -> "part",
      "l_suppkey" -> "supplier")),
    Plan("events", Map("event_id" -> "events", "user_id" -> "events_user")),
    Plan("documents", Map("doc_id" -> "documents")),
    Plan("embeddings", Map("vec_id" -> "embeddings")),
  )
  private val dims = Seq("region", "nation")

  private def pow10Above(max: Long): Long = {
    var p = 1L
    while (p <= max) p *= 10
    p
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <outDir> [copies]")
    val (src, out) = (args(0), args(1))
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local()
    try run(spark, src, out, copies) finally spark.stop()
  }

  def run(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    // offsets per keyspace from the owning table's max id
    def maxOf(table: String, col0: String): Long =
      spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(col0))).head().getLong(0)
    val offset: Map[String, Long] = Map(
      "customer" -> pow10Above(maxOf("customer", "c_custkey")),
      "supplier" -> pow10Above(maxOf("supplier", "s_suppkey")),
      "part" -> pow10Above(maxOf("part", "p_partkey")),
      "orders" -> pow10Above(maxOf("orders", "o_orderkey")),
      "events" -> pow10Above(maxOf("events", "event_id")),
      "events_user" -> pow10Above(maxOf("events", "user_id")),
      "documents" -> pow10Above(maxOf("documents", "doc_id")),
      "embeddings" -> pow10Above(maxOf("embeddings", "vec_id")),
    )
    offset.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(s"[scaleup] keyspace $k offset $v")
    }

    dims.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t: dimension, copied as-is")
    }

    plans.foreach { p =>
      val df = spark.read.parquet(s"$src/${p.table}.parquet")
      val rep = df
        .withColumn("__copy", explode(sequence(lit(0L), lit(copies - 1L))))
      val rekeyed = p.keys.foldLeft(rep) { case (acc, (c, ks)) =>
        acc.withColumn(c, col(c) + col("__copy") * lit(offset(ks)))
      }.drop("__copy")
      rekeyed
        .select(df.columns.map(col).toSeq: _*) // original column order
        .write.mode(SaveMode.Overwrite).parquet(s"$out/${p.table}.parquet")
      println(s"[scaleup] ${p.table}: x$copies -> $out/${p.table}.parquet")
    }
  }
}
