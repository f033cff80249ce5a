package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch relational operators (SURVEY.md §2.1–2.2, §2.4, §2.6).
  *
  * Conventions (SURVEY.md §5.2 determinism rules):
  *  - every query ends in a total ORDER BY with explicit null ordering;
  *  - double aggregates that reassociate across partitions are rounded
  *    (3–6 digits, chosen so engine-order ulp drift can't flip a digit);
  *  - no rand()/current_timestamp.
  *
  * Scale notes are per-function; general rules in SURVEY.md §4.3.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** M0 flagship: TPC-H Q1-shaped pricing summary.
    * lineitem → filter shipdate → hash-agg (partial+final, map-side
    * combine free) → tiny sorted result. At 100 TB: filter + 4-column
    * projection push into the parquet scan; agg output is
    * |flags|×|status| rows, so the final shuffle is negligible.
    */
  def qPricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // sum_disc_price in EXACT integer 10⁻⁴-dollar units (2dp price ×
    // 2dp discount factor = exact 4dp term), half-up to cents, ONE
    // double division to emit: the r16 sf1 battery showed the
    // double-fold form of this exact shape landing on dead .005 ties
    // at 2dp in sibling queries (q_multiway_join, q_local_revenue).
    // sum_base_price keeps the double sum: price is 2dp-exact, so the
    // sum has no .005 component and round(…,2) has no halfway case.
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .withColumn("t_pico",
        round($"l_extendedprice" * 100).cast("decimal(38,0)") *
          (lit(100L) - round($"l_discount" * 100).cast("long")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        sum($"t_pico").as("s_pico"),
        round(avg($"l_quantity"), 6).as("avg_qty"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .select($"l_returnflag", $"l_linestatus", $"sum_qty",
        $"sum_base_price",
        (expr("(s_pico + 50) div 100").cast("double") / 100.0)
          .as("sum_disc_price"),
        $"avg_qty", $"avg_disc", $"count_order")
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** S1/O1 — size-ordered scan (reference: `ls -Sr`, convert.sh:30,
    * shortest-job-first). Global range-partitioned sort; at 100 TB you
    * sort only the (path,size) listing, never the payload bytes.
    */
  def qScanOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_extendedprice".asc_nulls_first, $"l_orderkey".asc_nulls_first,
        $"l_linenumber".asc_nulls_first)
      .limit(1000)
  }

  /** P1/P2 — regex extraction of quality/stream tokens out of the
    * `${STREAM}_${QUALITY}_${ID}.mkv` filename schema (convert.sh:38-42).
    * Filenames are synthesized from events so the op is self-contained
    * on driver testdata; regexp_extract is codegen'd, no UDF.
    */
  def qRegexExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pat = "^([^_]+)_([0-9]+p)_([0-9]+)\\.mkv$"
    Tables.events(spark, dir)
      .withColumn("filename",
        concat($"event_type", lit("_"), ($"user_id" % 1080).cast("string"),
          lit("p_"), $"event_id".cast("string"), lit(".mkv")))
      .select(
        $"event_id",
        $"filename",
        regexp_extract($"filename", pat, 1).as("stream"),
        regexp_extract($"filename", pat, 2).as("quality"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** P3/P4/P5 — id scrubbing: strip '#', lowercase, drop blanks
    * (manager.py:141,146-147,282). Pure narrow projection+filter:
    * pushes to the scan, stays in one codegen stage.
    */
  def qStringScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .filter(length(trim($"c_name")) > 0)
      .select($"c_custkey",
        lower(regexp_replace($"c_name", "#", "")).as("clean_name"))
      .orderBy($"c_custkey".asc_nulls_first)
  }

  /** P6 — existence/non-empty predicate (manager.py:367-376,
    * convert.sh:32-36): null-safe filters on size-like columns. */
  def qNonemptyFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"n_chars" > 0 && length(trim($"text")) > 0 && $"lang".isNotNull)
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** P8 — computed projection: `"${w}x${h}"` concat + f-string naming
    * (convert.sh:50, manager.py:270-273). concat_ws/format_string are
    * builtin codegen'd expressions. */
  def qConcatProj(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select(
        $"p_partkey",
        concat_ws("x", $"p_size".cast("string"), $"p_brand").as("scale_spec"),
        format_string("%s_%04d", $"p_type", $"p_partkey").as("file_tag"))
      .orderBy($"p_partkey".asc_nulls_first)
  }

  /** P9/A7 — branch projection (audio vs video codec args,
    * convert.sh:73-97) as CASE WHEN + conditional aggregation. */
  def qCaseWhen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        sum(when($"o_totalprice" > 100000.0, 1).otherwise(0)).as("n_big"),
        sum(when($"o_orderstatus" === "F", 1).otherwise(0)).as("n_final"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority".asc_nulls_first)
  }

  /** A1/A2 — per-key count + max (retry-loop fold: the manager's
    * per-stream retry_id advance, manager.py:311-320). Partial+final
    * hash agg: one shuffle of |users| rows. */
  def qGroupCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), max($"value").as("max_value"))
      .orderBy($"user_id".asc_nulls_first)
  }

  /** P6+ — deterministic hash sampling: keep rows whose key's SHA-256
    * hex starts with '0' — an exact, REPRODUCIBLE 1/16 sample (the
    * corpus-subset primitive a training pipeline needs: same subset
    * on every engine, every run, every scale; widen the prefix set to
    * change the rate). Pure projection filter — pipelined into the
    * scan, no shuffle, no RNG state; contrast with sample()/rand(),
    * whose output is engine- and partitioning-dependent. */
  def qHashSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter(substring(sha2($"o_orderkey".cast("string"), 256), 1, 1) === "0")
      .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("total"))
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  /** A2+skew — the SAME per-key aggregate as q_group_count's family,
    * but computed through Skew.saltedAgg's two-phase salted plan:
    * spray each key across 16 deterministic sub-keys, partially
    * aggregate, merge the partials. Result is identical to a direct
    * groupBy (the oracle IS the direct GROUP BY); what changes is the
    * plan — the hot event_type key fans out over 16 reducers instead
    * of funneling into one straggler. event_type has ~5 distinct
    * values, the canonical low-cardinality skew shape at 100 TB.
    * The sum is rounded at 4: two-phase summation reassociates. */
  def qSaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Skew.saltedAgg(Tables.events(spark, dir),
        key = "event_type", valueCol = "value", spreadCol = "event_id")
      .select($"event_type", $"n", round($"s", 4).as("total"))
      .orderBy($"event_type".asc_nulls_first)
  }

  /** A3 — size-reduction ratio metric, scale 3 (convert.sh:101-106:
    * `100*(1-new/old)`). Ratio-of-sums, rounded to the reference's
    * 3-digit precision — which also absorbs double reassociation. */
  def qRatioAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(round(
        lit(100.0) * (lit(1.0) -
          sum($"l_extendedprice" * (lit(1.0) - $"l_discount")) / sum($"l_extendedprice")),
        3).as("pct_reduction"))
      .orderBy($"l_returnflag".asc_nulls_first)
  }

  /** A4 — list accumulation (failed-moves list, manager.py:416-421)
    * with array_sort for determinism (collect order is partition-
    * dependent; sorting makes it canonical). Emitted as a joined
    * scalar string: the driver's compare harness can't hash raw array
    * cells (ADVICE.md r1), and the string pins the exact ordering. */
  def qCollectList(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderpriority", $"o_orderstatus").distinct()
      .groupBy($"o_orderpriority")
      .agg(concat_ws(",", array_sort(collect_list($"o_orderstatus"))).as("statuses"))
      .orderBy($"o_orderpriority".asc_nulls_first)
  }

  /** A5 — exact distinct counts (per-group + the approx variant is
    * exercised in scalatest; the oracle pins the exact one). At 100 TB
    * prefer approx_count_distinct (HLL++) for exploration — exact
    * countDistinct expands to a two-phase agg with a per-key dedup
    * shuffle, which is the right plan when exactness is required. */
  def qDistinctCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag".asc_nulls_first)
  }

  /** A8 — statistical aggregates: avg/min/max/stddev/median.
    * percentile() is the exact interpolated one (matches DuckDB
    * quantile_cont); percentile_approx is the 100 TB path. */
  def qStatsAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .groupBy($"c_mktsegment")
      .agg(
        // + 0.0: a one-cent negative balance sum over a large group
        // divides below round-6 resolution -> -0.0 in DuckDB
        (round(avg($"c_acctbal"), 6) + lit(0.0)).as("avg_bal"),
        min($"c_acctbal").as("min_bal"),
        max($"c_acctbal").as("max_bal"),
        round(stddev_samp($"c_acctbal"), 6).as("sd_bal"),
        round(percentile($"c_acctbal", lit(0.5)), 6).as("med_bal"))
      .orderBy($"c_mktsegment".asc_nulls_first)
  }

  /** O2 — top-k: Catalyst rewrites orderBy+limit to
    * TakeOrderedAndProject (per-partition heap + driver merge — no
    * global sort, no full shuffle; exactly what you want at 100 TB). */
  def qTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc_nulls_last, $"o_orderkey".asc_nulls_first)
      .limit(100)
  }

  /** F3+ — ANSI-safe arithmetic/casting: under ANSI mode a division
    * by zero or a bad cast THROWS; the try_ family returns NULL
    * instead — the contract a 100 TB pipeline wants (quarantine bad
    * rows, don't kill the job). Mixed success/failure in both
    * columns so neither is degenerate-all-null. */
  def qTryFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Sort FIRST, project AFTER: a global sort's range-partitioner
    // samples its child to pick bounds, so a projection BELOW the
    // sort is evaluated twice (sampling pass + real pass) — and
    // try_cast on the ~50% non-numeric strings takes the per-row
    // exception path, the dominant cost here. Catalyst keeps a
    // Project above a Sort (only pruning is pushed below), so the
    // try expressions run exactly once, after the narrow raw-column
    // sort (measured 1.9 → 0.93 s warm at sf0.1).
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"o_orderpriority")
      .orderBy($"o_orderkey".asc_nulls_first)
      .select($"o_orderkey",
        round(try_divide($"o_totalprice", $"o_custkey" % 3), 4).as("safe_ratio"),
        expr("try_cast(CASE WHEN o_orderkey % 2 = 0 " +
          "THEN substring(o_orderpriority, 1, 1) " +
          "ELSE o_orderpriority END AS INT)").as("prio_num"))
  }

  val queries: Map[String, Q] = Map(
    "q_pricing_summary" -> (qPricingSummary _),
    "q_try_funcs" -> (qTryFuncs _),
    "q_scan_order" -> (qScanOrder _),
    "q_regex_extract" -> (qRegexExtract _),
    "q_string_scrub" -> (qStringScrub _),
    "q_nonempty_filter" -> (qNonemptyFilter _),
    "q_concat_proj" -> (qConcatProj _),
    "q_case_when" -> (qCaseWhen _),
    "q_group_count" -> (qGroupCount _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_hash_sample" -> (qHashSample _),
    "q_ratio_agg" -> (qRatioAgg _),
    "q_collect_list" -> (qCollectList _),
    "q_distinct_count" -> (qDistinctCount _),
    "q_stats_agg" -> (qStatsAgg _),
    "q_topk" -> (qTopk _),
  )

  val oracles: Map[String, String] = Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  CAST((sum(CAST(round(l_extendedprice * 100) AS HUGEINT) *
        |            (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |        + 50) // 100 AS DOUBLE) / 100.0 AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_try_funcs" ->
      """SELECT o_orderkey,
        |  round(o_totalprice / NULLIF(o_custkey % 3, 0), 4) AS safe_ratio,
        |  TRY_CAST(CASE WHEN o_orderkey % 2 = 0
        |    THEN substr(o_orderpriority, 1, 1)
        |    ELSE o_orderpriority END AS INT) AS prio_num
        |FROM orders
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_scan_order" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice ASC NULLS FIRST, l_orderkey ASC NULLS FIRST,
        |  l_linenumber ASC NULLS FIRST
        |LIMIT 1000""".stripMargin,
    "q_regex_extract" ->
      """WITH named AS (
        |  SELECT event_id,
        |    event_type || '_' || CAST(user_id % 1080 AS VARCHAR) || 'p_'
        |      || CAST(event_id AS VARCHAR) || '.mkv' AS filename
        |  FROM events)
        |SELECT event_id, filename,
        |  coalesce(regexp_extract(filename, '^([^_]+)_([0-9]+p)_([0-9]+)\.mkv$', 1), '') AS stream,
        |  coalesce(regexp_extract(filename, '^([^_]+)_([0-9]+p)_([0-9]+)\.mkv$', 2), '') AS quality
        |FROM named
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_string_scrub" ->
      """SELECT c_custkey, lower(regexp_replace(c_name, '#', '', 'g')) AS clean_name
        |FROM customer
        |WHERE length(trim(c_name)) > 0
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "q_nonempty_filter" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE n_chars > 0 AND length(trim(text)) > 0 AND lang IS NOT NULL
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_concat_proj" ->
      """SELECT p_partkey,
        |  concat_ws('x', CAST(p_size AS VARCHAR), p_brand) AS scale_spec,
        |  printf('%s_%04d', p_type, p_partkey) AS file_tag
        |FROM part
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,
    "q_case_when" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_group_count" ->
      """SELECT user_id, count(*) AS n_events, max(value) AS max_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "q_salted_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "q_hash_sample" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        |FROM orders
        |WHERE substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_ratio_agg" ->
      """SELECT l_returnflag,
        |  round(100.0 * (1.0 - sum(l_extendedprice * (1.0 - l_discount)) / sum(l_extendedprice)), 3)
        |    AS pct_reduction
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_collect_list" ->
      """SELECT o_orderpriority,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        |FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_distinct_count" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_stats_agg" ->
      """SELECT c_mktsegment,
        |  round(avg(c_acctbal), 6) + 0.0 AS avg_bal,
        |  min(c_acctbal) AS min_bal,
        |  max(c_acctbal) AS max_bal,
        |  round(stddev_samp(c_acctbal), 6) AS sd_bal,
        |  round(quantile_cont(c_acctbal, 0.5), 6) AS med_bal
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
        |LIMIT 100""".stripMargin,
  )
}
