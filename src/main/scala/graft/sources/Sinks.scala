package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Routed, verified batch sinks (SURVEY.md §2.1 S9-S11).
  *
  * The reference's archive step (s3-sync.sh) routes each file to a
  * storage tier BY SUFFIX (.mkv→DEEP_ARCHIVE, .json→STANDARD_IA,
  * .json.gz→DEEP_ARCHIVE; s3-sync.sh:57-67), names keys by an
  * encrypted digest (s3-sync.sh:27-30,42-43), and verifies every
  * upload with head-object (s3-sync.sh:51). Its convert step commits
  * atomically by staging to CONVERT_PENDING then renaming
  * (convert.sh:53-54,108-117).
  *
  * Spark-first re-expression:
  *  - tier routing      → `partitionBy(tier)` — one writer pass, the
  *    directory layout IS the routing (lifecycle rules attach per
  *    prefix at the object store);
  *  - commit-by-rename  → Spark's own FileOutputCommitter: tasks write
  *    to _temporary, the job commit renames — the reference's
  *    pending→out protocol, already distributed and fault-tolerant;
  *  - digest keys       → sha2 column, no custom crypto in the engine;
  *  - head-object check → read-back count + per-tier reconciliation.
  *
  * At 100 TB: a single partitioned write with `maxRecordsPerFile` /
  * AQE-coalesced output beats per-file puts by orders of magnitude,
  * and verification is a metadata-only scan of the written footers.
  */
object Sinks {

  /** Tier assignment mirroring s3-sync.sh:57-67's suffix rules. */
  def tierOf(suffixCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(suffixCol === "mkv", "DEEP_ARCHIVE")
      .when(suffixCol === "json", "STANDARD_IA")
      .when(suffixCol === "json.gz", "DEEP_ARCHIVE")
      .otherwise("STANDARD")

  /** Write `df` tier-partitioned under `outDir` with digest key
    * columns; returns the written row count from a read-back (the
    * head-object verification, s3-sync.sh:51). df must have a
    * `suffix` column and a `name` column. */
  def archiveWrite(df: DataFrame, outDir: String): Long = {
    val routed = df
      .withColumn("tier", tierOf(col("suffix")))
      // key = digest of the logical name (the encrypted-key pattern,
      // s3-sync.sh:42-43, minus live key management)
      .withColumn("key", concat(lit("tw/"), sha2(col("name"), 256)))
    routed.write.mode(SaveMode.Overwrite)
      .partitionBy("tier")
      .parquet(outDir)
    df.sparkSession.read.parquet(outDir).count()
  }

  /** Per-tier reconciliation: expected vs written counts — the batch
    * analog of verifying every upload before deleting the source. */
  def verifyTiers(df: DataFrame, outDir: String): DataFrame = {
    val expected = df.withColumn("tier", tierOf(col("suffix")))
      .groupBy("tier").agg(count(lit(1)).as("expected"))
    val written = df.sparkSession.read.parquet(outDir)
      .groupBy("tier").agg(count(lit(1)).as("written"))
    expected.join(written, Seq("tier"), "full_outer")
      .withColumn("ok", coalesce(col("expected"), lit(0L)) === coalesce(col("written"), lit(0L)))
  }
}
