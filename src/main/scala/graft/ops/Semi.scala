package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Semi-structured operators (SURVEY.md §2.1 S2/S3/S6, §2.8 F4-F7,
  * A6) — JSON path access, JSON array ingest, map/array functions,
  * hash/hex encoding, defaults overlay, rollup, pivot.
  *
  * Scale doctrine: all of these are narrow per-row projections or
  * standard hash aggregations — they stay inside whole-stage codegen
  * and shuffle at most once on the grouping key. from_json with an
  * explicit schema (never inference) so the parse is a single codegen
  * expression at 100 TB.
  */
object Semi {
  type Q = (SparkSession, String) => DataFrame

  /** S3/F4 — JSON document path access (the reference's
    * `jq '.streams[1].height'`, convert.sh:44-48) on events.props. */
  def qJsonPath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k_val"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** S3 via the Spark 4 VARIANT type — parse once into the binary
    * variant encoding, then typed path access (`variant_get`). At
    * 100 TB this is the semi-structured column you'd PERSIST:
    * shredded parquet storage + pushdown-able typed access, vs
    * re-parsing JSON text per query (q_json_path's older path).
    * Same oracle as q_json_path — the two access paths must agree. */
  def qVariantPath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id",
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k_val"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** S2/F5/X6 — JSON array ingest + explode (ext-streamlist files:
    * each a JSON array of ids, manager.py:134-149). Round-trips
    * to_json ∘ from_json with an explicit ArrayType schema. */
  def qJsonArrayExplode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("j", to_json(array($"lang", $"source")))
      .select($"doc_id",
        explode(from_json($"j", ArrayType(StringType))).as("tag"))
      .orderBy($"doc_id".asc_nulls_first, $"tag".asc_nulls_first)
  }

  /** F6 — map-typed columns (the reference's YAML maps keyed by
    * stream id, manager.py:124,331-332): parse props into
    * map<string,bigint>, then element_at / map_keys. */
  def qMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("m",
        from_json($"props", org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
      .select($"event_id",
        element_at($"m", "k").as("k_val"),
        size(map_keys($"m")).as("n_keys"),
        concat_ws(",", array_sort(map_keys($"m"))).as("keys"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** F5 — array function family (streamlist iteration/arg-array
    * handling, manager.py:140,333): split, size, contains,
    * distinct+sort+slice. */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("toks", split(trim(lower($"text")), " +"))
      .select($"doc_id",
        size($"toks").as("n_tokens"),
        array_contains($"toks", "spark").as("has_spark"),
        concat_ws(",", slice(array_sort(array_distinct($"toks")), 1, 3))
          .as("first3"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** F7 — crypto/encoding (the archive's encrypted key naming,
    * s3-sync.sh:27-30: name → cipher → hex): deterministic analog via
    * sha2/md5 hex digests; key16 mirrors the truncated-key pattern. */
  def qHashHex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        sha2($"text", 256).as("sha_hex"),
        md5($"text").as("md5_hex"),
        substring(sha2($"text", 256), 1, 16).as("key16"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** S6 — config defaults overlay (`actual_defaultdict` overlaid by
    * user YAML, manager.py:29-33,95-99): inline dimension of per-lang
    * minimums, left join + coalesce to the global default. */
  def qDefaultOverlay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val defaults = Seq(("en", 100), ("fr", 80), ("de", 60))
      .toDF("d_lang", "d_min_chars")
    Tables.documents(spark, dir)
      .join(broadcast(defaults), $"lang" === $"d_lang", "left_outer")
      .select($"doc_id", $"lang",
        coalesce($"d_min_chars", lit(50)).as("min_chars_eff"),
        ($"n_chars" >= coalesce($"d_min_chars", lit(50))).as("passes"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** A6 — rollup with grouping flags: subtotals + grand total in one
    * pass (Spark expands grouping sets before the hash agg — still a
    * single shuffle). */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .rollup($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice"), 2).as("total"),
        grouping($"o_orderpriority").cast("int").as("g_prio"),
        grouping($"o_orderstatus").cast("int").as("g_status"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  /** A6 — cube: all grouping-set combinations in one pass (rollup's
    * superset; same single-shuffle expansion). */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .cube($"event_type", date_trunc("day", $"ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"),
        grouping($"event_type").cast("int").as("g_type"))
      .orderBy($"event_type".asc_nulls_first, $"day".asc_nulls_first,
        $"g_type".asc_nulls_first)
  }

  /** A6 — explicit GROUPING SETS (the primitive rollup/cube expand
    * to), via the SQL surface: chosen subtotal combinations only,
    * still one shuffle. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("gs_orders")
    spark.sql(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status
        |FROM gs_orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |  (o_orderstatus), ())
        |ORDER BY o_orderpriority ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST, g_prio ASC NULLS FIRST,
        |  g_status ASC NULLS FIRST""".stripMargin)
  }

  /** Correlated scalar subquery (SQL surface): customers whose order
    * count beats 1.5× their market segment's average. Catalyst
    * decorrelates the subquery into an aggregate + equi join — no
    * per-row re-execution, scale-safe. Integer counts keep the
    * average bit-identical across engines. */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("sq_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("sq_orders")
    spark.sql(
      """WITH cnt AS (
        |  SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n
        |  FROM sq_customer JOIN sq_orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey, c_mktsegment)
        |SELECT c_custkey, n FROM cnt c
        |WHERE n > 1.5 * (SELECT avg(n) FROM cnt c2
        |                 WHERE c2.c_mktsegment = c.c_mktsegment)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin)
  }

  /** LATERAL correlated table subquery (SQL surface): a per-row
    * derived table referencing the outer row — the generalization of
    * the scalar subquery to multiple columns. Catalyst decorrelates
    * it into an aggregate + equi join (DecorrelateInnerQuery), so
    * there is no per-row re-execution at any scale. */
  def qLateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("lat_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lat_lineitem")
    spark.sql(
      """SELECT o_orderkey, l.n_lines, l.max_qty
        |FROM lat_orders,
        |LATERAL (SELECT count(*) AS n_lines,
        |           round(max(l_quantity), 2) AS max_qty
        |         FROM lat_lineitem WHERE l_orderkey = o_orderkey) l
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)
  }

  /** Pivot — events.event_type fanned out to per-type count columns
    * (explicit value list so the plan is static: no extra collect
    * pass to discover values, which matters at 100 TB). */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy($"user_id".asc_nulls_first)
  }

  /** Unpivot (melt) — the inverse reshape: lineitem's four per-line
    * amounts become (metric, val) rows via Spark's native unpivot.
    * Pure narrow projection (4 output rows per input inside the
    * operator, no shuffle, no UDF) — linear at any scale. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_orderkey" <= 1000) // bounded output for the oracle dump
      .select($"l_orderkey", $"l_linenumber",
        $"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax")
      .unpivot(
        ids = Array($"l_orderkey", $"l_linenumber"),
        values = Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        variableColumnName = "metric",
        valueColumnName = "val")
      .orderBy($"l_orderkey".asc_nulls_first, $"l_linenumber".asc_nulls_first,
        $"metric".asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "q_json_path" -> (qJsonPath _),
    "q_variant_path" -> (qVariantPath _),
    "q_json_array_explode" -> (qJsonArrayExplode _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_hash_hex" -> (qHashHex _),
    "q_default_overlay" -> (qDefaultOverlay _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_lateral" -> (qLateral _),
  )

  val oracles: Map[String, String] = Map(
    "q_json_path" ->
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_val
        |FROM events
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_variant_path" ->
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_val
        |FROM events
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_json_array_explode" ->
      """WITH j AS (SELECT doc_id,
        |    CAST(('["' || lang || '","' || source || '"]')::JSON AS VARCHAR[]) AS arr
        |  FROM documents)
        |SELECT doc_id, unnest(arr) AS tag FROM j
        |ORDER BY doc_id ASC NULLS FIRST, tag ASC NULLS FIRST""".stripMargin,
    "q_map_funcs" ->
      """SELECT event_id,
        |  CAST(props->>'k' AS BIGINT) AS k_val,
        |  len(json_keys(props)) AS n_keys,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys
        |FROM events
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_array_funcs" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), ' +') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  list_contains(toks, 'spark') AS has_spark,
        |  array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3
        |FROM t
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_hash_hex" ->
      """SELECT doc_id,
        |  sha256(text) AS sha_hex,
        |  md5(text) AS md5_hex,
        |  substr(sha256(text), 1, 16) AS key16
        |FROM documents
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_default_overlay" ->
      """SELECT doc_id, lang,
        |  coalesce(d_min_chars, 50) AS min_chars_eff,
        |  n_chars >= coalesce(d_min_chars, 50) AS passes
        |FROM documents
        |LEFT JOIN (VALUES ('en', 100), ('fr', 80), ('de', 60)) d(d_lang, d_min_chars)
        |  ON lang = d_lang
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status
        |FROM orders
        |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT event_type,
        |  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |  count(*) AS n,
        |  CAST(grouping(event_type) AS INT) AS g_type
        |FROM events
        |GROUP BY CUBE(event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
        |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST,
        |  g_type ASC NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "q_unpivot" ->
      """WITH src AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_extendedprice, l_discount, l_tax
        |  FROM lineitem WHERE l_orderkey <= 1000)
        |SELECT l_orderkey, l_linenumber, metric, val
        |FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src)
        |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        |  metric ASC NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |  (o_orderstatus), ())
        |ORDER BY o_orderpriority ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST, g_prio ASC NULLS FIRST,
        |  g_status ASC NULLS FIRST""".stripMargin,
    "q_lateral" ->
      """SELECT o_orderkey, l.n_lines, l.max_qty
        |FROM orders,
        |LATERAL (SELECT count(*) AS n_lines,
        |           round(max(l_quantity), 2) AS max_qty
        |         FROM lineitem WHERE l_orderkey = o_orderkey) l
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_scalar_subquery" ->
      """WITH cnt AS (
        |  SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n
        |  FROM customer JOIN orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey, c_mktsegment)
        |SELECT c_custkey, n FROM cnt c
        |WHERE n > 1.5 * (SELECT avg(n) FROM cnt c2
        |                 WHERE c2.c_mktsegment = c.c_mktsegment)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
  )
}
