package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Joins and set operations (SURVEY.md §2.3, §2.7).
  *
  * Scale doctrine: only TRUE dimensions (region 5 rows, nation 25 rows
  * — fixed cardinality at every SF) carry an explicit `broadcast()`
  * hint. SF-proportional tables (customer, supplier, part) are left
  * UNHINTED: at test SF Catalyst's size statistics still pick a
  * broadcast-hash join (pinned by OpsSpec), and at 100 TB the same
  * plan degrades gracefully to a shuffle join instead of attempting to
  * broadcast billions of rows. Fact-fact joins (lineitem⋈orders)
  * shuffle on the join key; at 100 TB that is the one unavoidable
  * shuffle, and AQE handles skew splitting.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  /** J1 — dimension lookup (the manager's `stream_config[stream]` dict
    * hit, manager.py:117-132) as a broadcast hash join. */
  def qBroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_name", $"c_mktsegment")
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  /** J2/J3 — left join + default: per-stream fps override falling back
    * to DEFAULT_FPS (convert.sh:78-84) = left_outer + coalesce. */
  def qLeftJoinCoalesce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val overrides = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_mktsegment")
    Tables.orders(spark, dir)
      .join(overrides, $"o_custkey" === $"c_custkey", "left_outer")
      .select($"o_orderkey", coalesce($"c_mktsegment", lit("DEFAULT")).as("segment"))
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  /** J4 — group denormalization (quality-group → member streams,
    * manager.py:124-132): collect members per group, explode back,
    * join group attrs. Round-trips collect_list∘explode. */
  def qExplodeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val groups = Tables.nation(spark, dir)
      .groupBy($"n_regionkey")
      .agg(array_sort(collect_list($"n_name")).as("members"))
    groups
      .select($"n_regionkey", explode($"members").as("member"))
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .select($"r_name", $"member")
      .orderBy($"r_name".asc_nulls_first, $"member".asc_nulls_first)
  }

  /** J5/U3 — semi join: resume persisted state only for
    * still-configured streams (manager.py:70-76). left_semi never
    * duplicates or widens rows — cheaper than inner+distinct. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rich = Tables.customer(spark, dir).filter($"c_acctbal" > 5000.0)
    Tables.orders(spark, dir)
      .join(rich, $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey", $"o_custkey")
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  /** J6/P7/U4 — anti join: blocklist filter (manager.py:449-452) as
    * left_anti (NOT EXISTS semantics; avoids NOT IN null traps). */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blocklist = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "AUTOMOBILE")
    Tables.orders(spark, dir)
      .join(blocklist, $"o_custkey" === $"c_custkey", "left_anti")
      .select($"o_orderkey", $"o_custkey")
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  /** J7 — multi-way equi join (TPC-H Q5 shape): the one fact-fact
    * shuffle join (lineitem⋈orders); customer/supplier are UNHINTED
    * (Catalyst auto-broadcasts them at test SF, degrades to shuffle at
    * 100 TB); only fixed-cardinality nation/region carry hints. */
  def qMultiwayJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(spark, dir),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      // exact pico-dollar accumulation + half-up cents emission — the
      // double-fold form hit a dead .005 tie at 2dp on the r16 sf1
      // battery (NATION_0: …803.605 exactly); see qDisjunctiveJoin
      .withColumn("t_pico",
        round($"l_extendedprice" * 100).cast("decimal(38,0)") *
          (lit(100L) - round($"l_discount" * 100).cast("long")))
      .groupBy($"r_name", $"n_name")
      .agg(sum($"t_pico").as("s_pico"), count(lit(1)).as("n_lines"))
      .select($"r_name", $"n_name",
        (expr("(s_pico + 50) div 100").cast("double") / 100.0)
          .as("revenue"),
        $"n_lines")
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  /** J7/O2 headline — shipping-priority (TPC-H Q3 shape): segment-
    * filtered customer (unhinted — auto-BHJ at test SF) joined into
    * date-filtered orders, one fact-fact shuffle to date-filtered
    * lineitem, revenue agg, top-10.
    * The two date predicates and the segment filter all push to the
    * parquet scans (PushedFilters), and orderBy+limit collapses to
    * TakeOrderedAndProject — no global sort. */
  def qShipPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit("1998-06-01").cast("timestamp")
    val cust = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    Tables.orders(spark, dir)
      .filter($"o_orderdate" < cutoff)
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(Tables.lineitem(spark, dir).filter($"l_shipdate" > cutoff),
        $"o_orderkey" === $"l_orderkey")
      // exact pico-dollar accumulation (see qMultiwayJoin): a revenue
      // tie here would also flip the top-10 SELECTION, not just a cell
      .withColumn("t_pico",
        round($"l_extendedprice" * 100).cast("decimal(38,0)") *
          (lit(100L) - round($"l_discount" * 100).cast("long")))
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum($"t_pico").as("s_pico"))
      .select($"l_orderkey", $"o_orderdate", $"o_orderpriority",
        (expr("(s_pico + 50) div 100").cast("double") / 100.0)
          .as("revenue"))
      .orderBy($"revenue".desc_nulls_last, $"o_orderdate".asc_nulls_first,
        $"l_orderkey".asc_nulls_first)
      .limit(10)
  }

  /** J8 — range join: equi key + date-range residual. Spark plans the
    * equi part as the join key and evaluates the residual as a post-
    * filter inside the join — no cross product. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"))
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_late"))
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  /** U1/U2 — union with first-wins dedup (configured streams ∪
    * ext-streamlist, guard at manager.py:150): precedence via a
    * priority column + row_number()=1, the distributed version of the
    * reference's "add only if not already present". */
  def qUnionDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cfg = Tables.customer(spark, dir)
      .select($"c_custkey".as("custkey"), lit("cfg").as("src"), lit(1).as("priority"))
    val ext = Tables.orders(spark, dir)
      .select($"o_custkey".as("custkey"), lit("ext").as("src"), lit(2).as("priority"))
      .distinct()
    val w = Window.partitionBy($"custkey").orderBy($"priority".asc, $"src".asc)
    cfg.unionByName(ext)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"custkey", $"src")
      .orderBy($"custkey".asc_nulls_first)
  }

  /** U3/U4 bag semantics — INTERSECT ALL / EXCEPT ALL keep
    * multiplicity (a user with 5 clicks and 2 errors retains 3 rows
    * under except-all), unlike the DISTINCT-semantics semi/anti
    * joins. Spark plans both via a count-aggregate + generate
    * (replicate rows min/diff of counts) — one shuffle on the value,
    * no join. The trailing group-count makes the oracle dump
    * deterministic (a multiset has no row order). */
  def qExceptAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    ev.filter($"event_type" === "click").select($"user_id")
      .exceptAll(ev.filter($"event_type" === "error").select($"user_id"))
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .orderBy($"user_id".asc_nulls_first)
  }

  def qIntersectAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    ev.filter($"event_type" === "click").select($"user_id")
      .intersectAll(ev.filter($"event_type" === "error").select($"user_id"))
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .orderBy($"user_id".asc_nulls_first)
  }

  /** J2+ — FULL OUTER reconciliation: per-key counts from two
    * independent aggregates stitched so every key survives, with the
    * match class named (both / left-only / right-only) — the audit
    * query behind "did every order-holder emit events, and whose
    * events have no account?". Both inputs aggregate BEFORE the join,
    * so the full-outer shuffles key-cardinality row sets, never the
    * fact tables; counts coalesce to 0 so downstream arithmetic never
    * meets a null. */
  def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.orders(spark, dir)
      .filter($"o_custkey" >= 100)
      .groupBy($"o_custkey".as("key")).agg(count(lit(1)).as("n_orders"))
    val b = Tables.events(spark, dir)
      .groupBy($"user_id".as("key")).agg(count(lit(1)).as("n_events"))
    a.join(b, Seq("key"), "full_outer")
      .select($"key",
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"n_events", lit(0L)).as("n_events"),
        when($"n_orders".isNotNull && $"n_events".isNotNull, "both")
          .when($"n_events".isNull, "orders_only")
          .otherwise("events_only").as("side"))
      .orderBy($"key".asc_nulls_first)
  }

  /** J14 — referential-integrity audit: orphan counts across the
    * star schema's three hottest edges (orders→customer,
    * lineitem→part, lineitem→orders), plus the totals that make the
    * rates readable. Three LEFT ANTI joins — each an unhinted shuffle
    * hash join on its key at 100 TB — reduced to 1-row counts and
    * cross-joined into a single report row; all-integer output. The
    * check an ingest pipeline runs before promoting a snapshot. */
  def qJoinCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val a = orders
      .join(Tables.customer(spark, dir),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("orphan_order_cust"))
    val b = lineitem
      .join(Tables.part(spark, dir),
        $"l_partkey" === $"p_partkey", "left_anti")
      .agg(count(lit(1)).as("orphan_line_part"))
    val c = lineitem
      .join(orders.select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).as("orphan_line_order"))
    val tot = orders.agg(count(lit(1)).as("n_orders"))
      .crossJoin(lineitem.agg(count(lit(1)).as("n_lineitem")))
    a.crossJoin(b).crossJoin(c).crossJoin(tot)
      .select($"n_orders", $"n_lineitem", $"orphan_order_cust",
        $"orphan_line_part", $"orphan_line_order")
  }

  val queries: Map[String, Q] = Map(
    "q_join_coverage" -> (qJoinCoverage _),
    "q_full_outer" -> (qFullOuter _),
    "q_broadcast_join" -> (qBroadcastJoin _),
    "q_left_join_coalesce" -> (qLeftJoinCoalesce _),
    "q_explode_join" -> (qExplodeJoin _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_multiway_join" -> (qMultiwayJoin _),
    "q_ship_priority" -> (qShipPriority _),
    "q_range_join" -> (qRangeJoin _),
    "q_union_dedup" -> (qUnionDedup _),
    "q_except_all" -> (qExceptAll _),
    "q_intersect_all" -> (qIntersectAll _),
  )

  val oracles: Map[String, String] = Map(
    "q_join_coverage" ->
      """SELECT
        |  (SELECT count(*) FROM orders) AS n_orders,
        |  (SELECT count(*) FROM lineitem) AS n_lineitem,
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |    AS orphan_order_cust,
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |    AS orphan_line_part,
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |    AS orphan_line_order""".stripMargin,
    "q_full_outer" ->
      """WITH a AS (SELECT o_custkey AS key, count(*) AS n_orders
        |  FROM orders WHERE o_custkey >= 100 GROUP BY o_custkey),
        |b AS (SELECT user_id AS key, count(*) AS n_events
        |  FROM events GROUP BY user_id)
        |SELECT key,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(n_events, 0) AS n_events,
        |  CASE WHEN n_orders IS NOT NULL AND n_events IS NOT NULL THEN 'both'
        |       WHEN n_events IS NULL THEN 'orders_only'
        |       ELSE 'events_only' END AS side
        |FROM a FULL JOIN b USING (key)
        |ORDER BY key ASC NULLS FIRST""".stripMargin,
    "q_broadcast_join" ->
      """SELECT o_orderkey, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_left_join_coalesce" ->
      """SELECT o_orderkey, coalesce(c_mktsegment, 'DEFAULT') AS segment
        |FROM orders LEFT JOIN
        |  (SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING') d
        |  ON o_custkey = c_custkey
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_explode_join" ->
      """WITH groups AS (
        |  SELECT n_regionkey, list(n_name ORDER BY n_name) AS members
        |  FROM nation GROUP BY n_regionkey),
        |ex AS (SELECT n_regionkey, unnest(members) AS member FROM groups)
        |SELECT r_name, member
        |FROM ex JOIN region ON n_regionkey = r_regionkey
        |ORDER BY r_name ASC NULLS FIRST, member ASC NULLS FIRST""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM customer
        |  WHERE c_custkey = o_custkey AND c_acctbal > 5000.0)
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_anti_join" ->
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer
        |  WHERE c_custkey = o_custkey AND c_mktsegment = 'AUTOMOBILE')
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_multiway_join" ->
      """SELECT r_name, n_name,
        |  CAST((sum(CAST(round(l_extendedprice * 100) AS HUGEINT) *
        |            (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |        + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_ship_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST((sum(CAST(round(l_extendedprice * 100) AS HUGEINT) *
        |            (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |        + 50) // 100 AS DOUBLE) / 100.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC NULLS LAST, o_orderdate ASC NULLS FIRST,
        |  l_orderkey ASC NULLS FIRST
        |LIMIT 10""".stripMargin,
    "q_range_join" ->
      """SELECT o_orderkey, count(*) AS n_late
        |FROM orders JOIN lineitem
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_union_dedup" ->
      """SELECT custkey, src FROM (
        |  SELECT custkey, src,
        |    row_number() OVER (PARTITION BY custkey ORDER BY priority ASC, src ASC) AS rn
        |  FROM (
        |    SELECT c_custkey AS custkey, 'cfg' AS src, 1 AS priority FROM customer
        |    UNION ALL
        |    SELECT DISTINCT o_custkey, 'ext', 2 FROM orders))
        |WHERE rn = 1
        |ORDER BY custkey ASC NULLS FIRST""".stripMargin,
    "q_except_all" ->
      """SELECT user_id, count(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "q_intersect_all" ->
      """SELECT user_id, count(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT ALL
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
  )
}
