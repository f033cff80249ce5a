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
  * S4 — packet dumps are gzip-compressed ffprobe `-of json` sidecars
  * (`*_packets.json.gz`, convert.sh:63-65): each file is ONE
  * pretty-printed JSON document with a top-level "packets" array —
  * not NDJSON. `multiLine=true` makes the file the record unit (the
  * only correct mode for document JSON; line-mode PERMISSIVE parsing
  * would silently yield all-null packet fields). `spark.read.json`
  * decompresses by extension automatically; ffprobe emits every
  * numeric field as a JSON string ("pts_time": "0.023220"), so the
  * schema reads strings and casts. A `_corrupt_record` column
  * quarantines unparsable sidecars instead of dropping them
  * silently. One gzip member is a single-task read (gzip is not
  * splittable); at scale the parallelism unit is the FILE, and a
  * directory of per-media dumps fans out naturally — exactly the
  * multiLine read's unit too.
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

  /** S4 raw layer: one row per sidecar FILE — (mediaId, packets,
    * _corrupt_record). Good files carry the parsed packets array;
    * unparsable ones carry the raw text in `_corrupt_record` for
    * quarantine/replay (mediaId still derived from the filename,
    * `<mediaId>_packets.json.gz`). */
  def parsePacketDump(spark: SparkSession, path: String): DataFrame = {
    IngestMetrics.register(spark)
    IngestMetrics.observed(spark.read
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema("packets ARRAY<STRUCT<pts_time: STRING, dts_time: STRING, " +
        "size: STRING, pos: STRING, duration_time: STRING>>, " +
        "_corrupt_record STRING")
      .json(path)
      .select(
        regexp_replace(element_at(split(input_file_name(), "/"), -1),
          "_packets\\.json\\.gz$", "").as("mediaId"),
        col("packets"), col("_corrupt_record")))
  }

  /** S4: ffprobe-JSON packet dump(s) → typed packet rows tagged with
    * the owning media id. Parsed files only — corrupt sidecars are
    * visible via [[corruptPacketDumps]], never silently nulled. */
  def readPacketDump(spark: SparkSession, path: String): DataFrame =
    parsePacketDump(spark, path)
      .filter(col("_corrupt_record").isNull && col("packets").isNotNull)
      .select(col("mediaId"), explode(col("packets")).as("p"))
      .select(
        col("mediaId"),
        col("p.pts_time").cast("double").as("ptsTime"),
        col("p.dts_time").cast("double").as("dtsTime"),
        col("p.size").cast("long").as("size"),
        col("p.pos").cast("long").as("pos"),
        col("p.duration_time").cast("double").as("durationTime"))

  /** S4 quarantine: sidecars that failed to parse, with the raw text
    * kept for replay/debugging. The filter also references `packets`
    * (always null on corrupt rows) so the pruned scan schema is not
    * corrupt-column-only — Spark refuses such scans on raw JSON
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN). */
  def corruptPacketDumps(spark: SparkSession, path: String): DataFrame =
    parsePacketDump(spark, path)
      .filter(col("_corrupt_record").isNotNull && col("packets").isNull)
      .select(col("mediaId"), col("_corrupt_record").as("raw"))

  /** Packet rows → one (mediaId, packets) row per media, packets in
    * pts order — the nested shape Multimodal.packetGaps consumes.
    * struct puts ptsTime first, so array_sort orders the timeline. */
  def packetsNested(flat: DataFrame): DataFrame =
    flat.groupBy(col("mediaId"))
      .agg(array_sort(collect_list(struct(
        col("ptsTime"), col("dtsTime"), col("size"),
        col("pos"), col("durationTime")))).as("packets"))
}
