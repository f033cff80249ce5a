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
  * both pinned in NullKeySpec).
  *
  * Under `spark.graft.debugChecks=true` the contract is ENFORCED at
  * this chokepoint (r14 verdict): each load probes its table's id
  * columns for nulls (one bounded extra job — debug only) and fails
  * loudly instead of letting a violating catalog silently drop rows
  * from every downstream equi-join. Off by default: zero extra jobs
  * in production, where the catalog's ingest owns the NOT-NULL
  * guarantee. */
object Tables {
  /** Same flag as Corpus.DebugChecksFlag (aliased there): one knob
    * arms every debug-grade contract probe in the engine. */
  private[graft] val DebugChecksFlag = "spark.graft.debugChecks"

  /** The id columns the key contract covers, per table. lineitem's
    * join keys are its order/part/supp foreign keys (it has no
    * single-column PK); events is fact-grain with no id the engine
    * joins on. Probes skip columns absent from a crafted fixture —
    * the contract binds the columns a table actually ships. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"), "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "documents" -> Seq("doc_id"), "embeddings" -> Seq("vec_id"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (spark.conf.get(DebugChecksFlag, "false").toBoolean) {
      import org.apache.spark.sql.functions.col
      val ks = keyCols.getOrElse(name, Nil).filter(df.columns.contains)
      if (ks.nonEmpty) {
        val nulls = df
          .filter(ks.map(col(_).isNull).reduce(_ || _))
          .limit(1).count()
        require(nulls == 0L,
          s"Tables.$name: null id in key column(s) ${ks.mkString(", ")} — " +
            "the engine's doc-grain equi-joins would silently drop such " +
            "rows from derived results; enforce NOT NULL at ingest " +
            "(Tables key contract)")
      }
    }
    df
  }

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
