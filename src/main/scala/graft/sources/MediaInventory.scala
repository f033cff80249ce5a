package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Directory-scan ingest (SURVEY.md §2.1 S1/S4) — the real file
  * sources behind the parquet analogs q_scan_order / q_packet_timeline.
  *
  * S1 — the reference's work queue IS a size-ordered directory listing
  * (`ls -Sr` over the `.mkv` glob, convert.sh:30): smallest first, so
  * short jobs finish early. Spark-first: the `binaryFile` source
  * lists (path, modificationTime, length, content); `pathGlobFilter`
  * reproduces the `*.mkv` glob at the LISTING stage, and ordering on
  * the `length` metadata column reproduces shortest-job-first. At
  * 100 TB, drop `content` from the projection and the scan is
  * metadata-only — no payload is read until the probe stage asks.
  *
  * S4 — packet dumps are gzip-compressed JSON sidecars
  * (`*_packets.json.gz`, convert.sh:63-65). `spark.read.json`
  * decompresses by file extension automatically; ffprobe emits every
  * numeric field as a JSON string ("pts_time": "0.023220"), so the
  * schema reads strings and casts — quoted and bare numbers both
  * parse. One gzip member is a single-task read (gzip is not
  * splittable); at scale the parallelism unit is the FILE, and a
  * directory of per-media dumps fans out naturally.
  */
object MediaInventory {

  /** S1: size-ascending (name, media, length) inventory of `dir`. */
  def scanBinaries(spark: SparkSession, dir: String,
                   glob: String = "*.mkv"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        col("content").as("media"),
        col("length"))
      .orderBy(col("length").asc, col("name").asc)

  /** S4: gzipped-NDJSON packet dump(s) → typed packet rows tagged with
    * the owning media id (derived from the sidecar filename,
    * `<mediaId>_packets.json.gz`). */
  def readPacketDump(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("pts_time STRING, dts_time STRING, size STRING, " +
        "pos STRING, duration_time STRING")
      .json(path)
      .select(
        regexp_replace(element_at(split(input_file_name(), "/"), -1),
          "_packets\\.json\\.gz$", "").as("mediaId"),
        col("pts_time").cast("double").as("ptsTime"),
        col("dts_time").cast("double").as("dtsTime"),
        col("size").cast("long").as("size"),
        col("pos").cast("long").as("pos"),
        col("duration_time").cast("double").as("durationTime"))

  /** Packet rows → one (mediaId, packets) row per media, packets in
    * pts order — the nested shape Multimodal.packetGaps consumes.
    * struct puts ptsTime first, so array_sort orders the timeline. */
  def packetsNested(flat: DataFrame): DataFrame =
    flat.groupBy(col("mediaId"))
      .agg(array_sort(collect_list(struct(
        col("ptsTime"), col("dtsTime"), col("size"),
        col("pos"), col("durationTime")))).as("packets"))
}
