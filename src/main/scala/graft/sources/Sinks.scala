package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  *  - head-object check → footer-level row count (metadata-only) +
  *    per-tier reconciliation.
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

  /** Reversible archive-key naming (r16, S11/F7 nit): the reference
    * encrypts key names reversibly and hex-encodes them
    * (s3-sync.sh:27-30), with the inverse decoder (s3-sync.sh:32-37),
    * so an operator can recover the original name from the stored
    * key. The engine's DEFAULT stays the one-way sha2 digest — no
    * key material in the engine, per SURVEY §2.8 F7 — but when a
    * recoverable name is required these two columns round-trip
    * name → hex(AES-ECB(name)) → name with Spark's built-in
    * `aes_encrypt`/`aes_decrypt` (codegen'd, distributed). ECB
    * because key naming must be DETERMINISTIC — the same name must
    * map to the same key on every idempotent re-archive; GCM's
    * random IV would mint a fresh key per run. The secrecy bar is
    * the reference's own: obfuscating non-repeating path names, not
    * message privacy. `secret` must be 16/24/32 bytes (AES-128/192/
    * 256). Kept out of the DuckDB oracle exactly as SURVEY F7
    * argues; the identity `decryptedName(encryptedKey(n)) = n` is
    * pinned in PipelineSpec. */
  def encryptedKey(name: org.apache.spark.sql.Column,
                   secret: String): org.apache.spark.sql.Column =
    concat(lit("tw/"), lower(hex(aes_encrypt(
      name.cast("binary"), lit(secret), lit("ECB"), lit("PKCS")))))

  /** Inverse of [[encryptedKey]] — s3-sync.sh:32-37's decoder. */
  def decryptedName(key: org.apache.spark.sql.Column,
                    secret: String): org.apache.spark.sql.Column =
    aes_decrypt(unhex(regexp_replace(key, "^tw/", "")),
      lit(secret), lit("ECB"), lit("PKCS")).cast("string")

  /** Write `df` tier-partitioned under `outDir` with digest key
    * columns; returns the written row count from the parquet FOOTERS
    * (the head-object verification, s3-sync.sh:51 — a metadata
    * check, never a second pass over the data). df must have a
    * `suffix` column and a `name` column. Pass `keySecret` to name
    * keys with the REVERSIBLE [[encryptedKey]] scheme instead of the
    * default one-way digest. */
  def archiveWrite(df: DataFrame, outDir: String,
                   keySecret: Option[String] = None): Long = {
    val routed = df
      .withColumn("tier", tierOf(col("suffix")))
      // key = digest of the logical name (the encrypted-key pattern,
      // s3-sync.sh:42-43, minus live key management) — or the
      // recoverable AES naming when a secret is supplied
      .withColumn("key", keySecret
        .map(s => encryptedKey(col("name"), s))
        .getOrElse(concat(lit("tw/"), sha2(col("name"), 256))))
    routed.write.mode(SaveMode.Overwrite)
      .partitionBy("tier")
      .parquet(outDir)
    footerRowCount(df.sparkSession, outDir)
  }

  /** Sum of the parquet footer row counts under `dir` — the verified
    * sink's row-count claim WITHOUT re-scanning data pages (r10
    * verdict: a read-back count() at 100 TB is a second full pass;
    * the footer already states the truth the committer wrote). Small
    * file sets (the common per-job commit) read footers on the
    * driver — ZERO Spark jobs, asserted in PipelineSpec ⚓; above
    * `distributedThreshold` files the footer reads fan out as one
    * metadata-weight Spark job (each task opens footers, bytes read
    * per file ≈ KBs regardless of data size). */
  def footerRowCount(spark: SparkSession, dir: String,
                     distributedThreshold: Int = 64): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer[String]()
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) files += f.getPath.toString
    }
    def countOne(c: Configuration)(p: String): Long = {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(p), c))
      try r.getRecordCount finally r.close()
    }
    if (files.length <= distributedThreshold) files.map(countOne(conf)).sum
    else {
      // ship the Hadoop conf so object-store credentials/endpoints
      // reach the executor-side footer reads
      val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
      val width = math.min(files.length, spark.sparkContext.defaultParallelism)
      spark.sparkContext.parallelize(files.toSeq, width)
        .map(p => countOne(serConf.value)(p))
        .sum().toLong
    }
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
