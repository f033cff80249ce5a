package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic depth beyond the core operator set (SURVEY.md §2.5/§2.4
  * extensions): distribution window functions, value-picking window
  * functions, lookahead, exact median + deterministic mode, classic
  * distribution-histogram and EXISTS-aggregate join shapes (TPC-H
  * Q13/Q4 analogs on the driver tables), bitwise aggregates, and a
  * row generator.
  *
  * Scale doctrine: every window is key-partitioned (one shuffle, sort
  * within partition); both TPC-H shapes are UNHINTED equi-joins —
  * Catalyst broadcasts the orders side at toy SF and falls back to a
  * shuffle join on o_custkey once stats exceed the broadcast
  * threshold (hinting broadcast on a fact table would be the 100 TB
  * bug); the generator is a narrow explode (rows multiply inside the
  * stage, no shuffle).
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  /** W3+ — distribution ranks: percent_rank / cume_dist per market
    * segment. Both are exact rationals of ints ((rank-1)/(n-1),
    * n_le/n) — identical IEEE division on any engine; rounded anyway
    * for defense. */
  def qRankDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment",
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cum_dist"))
      .orderBy($"c_custkey".asc_nulls_first)
  }

  /** W4+ — value-picking window functions: first / last / 2nd value
    * of the full per-key frame. Values are PICKED, not computed, so
    * parity is exact with no rounding. The frame must be explicit
    * ROWS UNBOUNDED..UNBOUNDED: the default window frame stops at
    * CURRENT ROW, which would make last_value trivially self. */
  def qFirstLast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select($"event_id",
        first($"value").over(w).as("first_v"),
        last($"value").over(w).as("last_v"),
        nth_value($"value", 2).over(w).as("second_v"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** W2+ — lookahead: time-to-next-event and the next event's type
    * per key (lag's mirror; the packet timeline uses lag). Exact µs
    * longs and strings. */
  def qLead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros($"ts"))
      .select($"event_id",
        (lead($"ts_us", 1).over(w) - $"ts_us").as("next_gap_us"),
        lead($"event_type", 1).over(w).as("next_type"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** A8+ — exact median + DETERMINISTIC mode per group. The built-in
    * mode() breaks frequency ties arbitrarily on both engines, so the
    * mode here is an explicit argmax with a pinned (count DESC, value
    * ASC) tie-break — same two-shuffle plan at any scale (group-count,
    * then per-key top-1 window). Median interpolates the middle pair
    * identically (a+b)/2 on both engines; rounded for defense. */
  def qMedianMode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val med = li.groupBy($"l_returnflag")
      .agg(round(median($"l_quantity"), 4).as("med_qty"))
    val wm = Window.partitionBy($"l_returnflag")
      .orderBy($"cnt".desc, $"l_quantity".asc)
    val mode = li.groupBy($"l_returnflag", $"l_quantity")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(wm))
      .filter($"rk" === 1)
      .select($"l_returnflag", $"l_quantity".as("mode_qty"), $"cnt".as("mode_n"))
    med.join(mode, "l_returnflag")
      .select($"l_returnflag", $"med_qty", $"mode_qty", $"mode_n")
      .orderBy($"l_returnflag".asc_nulls_first)
  }

  /** J2+A1 — customer order-count distribution (TPC-H Q13 shape):
    * LEFT join so zero-order customers land in the c_count=0 bucket,
    * then a histogram of the counts. Two shuffles (o_custkey equi
    * join, then the tiny c_count group) — the canonical distributed
    * histogram. All-integer → exact. */
  def qCustDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"o_custkey" === $"c_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count")) // count skips NULLs: 0 for orderless
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc_nulls_last, $"c_count".desc_nulls_last)
  }

  /** J5+A1 — EXISTS-then-aggregate (TPC-H Q4 shape): orders with at
    * least one late-shipping line, counted per priority. The semi
    * join keeps the probe side small before the aggregate; no
    * multiplicity bugs possible (semi, not inner). */
  def qOrderPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_shipdate")
    Tables.orders(spark, dir)
      .join(li, $"l_orderkey" === $"o_orderkey" && $"l_shipdate" > $"o_orderdate",
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority".asc_nulls_first)
  }

  /** A2+ — bitwise aggregates per key: AND / OR / XOR of the event
    * ids. Pure integer lattice ops — order-insensitive, exact on any
    * engine, and map-side combinable (each is associative+commutative,
    * so the shuffle carries one partial per key per mapper). */
  def qBitAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(bit_and($"event_id").as("id_and"),
        bit_or($"event_id").as("id_or"),
        bit_xor($"event_id").as("id_xor"),
        count(lit(1)).as("n"))
      .orderBy($"user_id".asc_nulls_first)
  }

  /** J7+A2 — large-volume orders (TPC-H Q18 shape): HAVING-filtered
    * aggregate as a join input — lineitem pre-aggregated per order,
    * thresholded, then joined back to orders+customer. The aggregate
    * runs BEFORE the joins, so the join probe is only the qualifying
    * orders (the classic "reduce before join" doctrine). */
  def qBigSpenders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bulky = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(round(sum($"l_quantity"), 2).as("sum_qty"))
      .filter($"sum_qty" > 150)
    Tables.orders(spark, dir)
      .join(bulky, $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"o_orderkey",
        round($"o_totalprice", 2).as("total"), $"sum_qty")
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  /** A7+J1 — promo revenue share (TPC-H Q14 shape): conditional
    * aggregate ratio over a broadcast dimension join, per ship
    * month. The CASE keys off the joined dim attribute; numerator
    * and denominator come from ONE aggregate pass. */
  def qPromoShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
      .groupBy(date_trunc("month", $"l_shipdate").cast("date").as("month"))
      .agg(round(
        lit(100.0) * sum(when($"p_type" === "PROMO", rev).otherwise(lit(0.0)))
          / sum(rev), 4).as("promo_share"))
      .orderBy($"month".asc_nulls_first)
  }

  /** J8+ — disjunctive-predicate join (TPC-H Q19 shape): OR'd
    * condition groups that share the partkey equi key. Catalyst must
    * extract the equi key for the hash join and evaluate the OR as a
    * residual — the plan-shape trap is degrading to a nested loop
    * over the disjunction (the registry sweep would catch it). */
  def qDisjunctiveJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        $"l_partkey" === $"p_partkey" && (
          ($"p_brand" === "Brand#4" && $"p_size" <= 10 &&
            $"l_quantity".between(5, 20)) ||
          ($"p_brand" === "Brand#2" && $"p_size" <= 25 &&
            $"l_quantity".between(20, 35))))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
      .orderBy($"p_brand".asc_nulls_first)
  }

  /** A8+ — regression/correlation aggregates: OLS slope + intercept,
    * Pearson r, sample covariance per group. One hash-agg pass (each
    * is sum-based → map-side combinable); rounded because sum
    * reassociation differs across engines (the residual error is
    * ~1e-9 relative, far inside the rounding). */
  def qRegr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(regr_slope($"l_extendedprice", $"l_quantity"), 4).as("slope"),
        round(regr_intercept($"l_extendedprice", $"l_quantity"), 4).as("icept"),
        round(corr($"l_extendedprice", $"l_quantity"), 6).as("r"),
        round(covar_samp($"l_extendedprice", $"l_quantity"), 4).as("cov"))
      .orderBy($"l_returnflag".asc_nulls_first)
  }

  /** X6+ — row generator: explode(sequence(1, k)) emits k rows per
    * input row inside the projection — no shuffle, no driver loop;
    * the 100 TB analog of "generate retry slots / date spines".
    * Bounded input keeps the oracle dump small. */
  def qSequence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" <= 200)
      .select($"o_orderkey",
        explode(sequence(lit(1L), ($"o_orderkey" % 5) + 1L)).as("i"))
      .orderBy($"o_orderkey".asc_nulls_first, $"i".asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "q_rank_dist" -> (qRankDist _),
    "q_first_last" -> (qFirstLast _),
    "q_lead" -> (qLead _),
    "q_median_mode" -> (qMedianMode _),
    "q_cust_distribution" -> (qCustDistribution _),
    "q_order_priority" -> (qOrderPriority _),
    "q_bit_agg" -> (qBitAgg _),
    "q_regr" -> (qRegr _),
    "q_sequence" -> (qSequence _),
    "q_big_spenders" -> (qBigSpenders _),
    "q_promo_share" -> (qPromoShare _),
    "q_disjunctive_join" -> (qDisjunctiveJoin _),
  )

  val oracles: Map[String, String] = Map(
    "q_rank_dist" ->
      """SELECT c_custkey, c_mktsegment,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cum_dist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "q_first_last" ->
      """SELECT event_id,
        |  first_value(value) OVER w AS first_v,
        |  last_value(value) OVER w AS last_v,
        |  nth_value(value, 2) OVER w AS second_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_lead" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT event_id,
        |  lead(ts_us, 1) OVER w - ts_us AS next_gap_us,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_median_mode" ->
      """WITH med AS (
        |  SELECT l_returnflag, round(median(l_quantity), 4) AS med_qty
        |  FROM lineitem GROUP BY l_returnflag),
        |cnts AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |m AS (
        |  SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY cnt DESC, l_quantity ASC) AS rk
        |  FROM cnts)
        |SELECT med.l_returnflag, med_qty, mode_qty, mode_n
        |FROM med JOIN m ON med.l_returnflag = m.l_returnflag AND rk = 1
        |ORDER BY med.l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin,
    "q_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_bit_agg" ->
      """SELECT user_id,
        |  bit_and(event_id) AS id_and,
        |  bit_or(event_id) AS id_or,
        |  bit_xor(event_id) AS id_xor,
        |  count(*) AS n
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "q_big_spenders" ->
      """WITH bulky AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING round(sum(l_quantity), 2) > 150)
        |SELECT c_name, o_orderkey, round(o_totalprice, 2) AS total, sum_qty
        |FROM orders
        |JOIN bulky ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_promo_share" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |  round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
        |    / sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY month
        |ORDER BY month ASC NULLS FIRST""".stripMargin,
    "q_disjunctive_join" ->
      """SELECT p_brand, count(*) AS n_lines,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#4' AND p_size <= 10
        |         AND l_quantity BETWEEN 5 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size <= 25
        |         AND l_quantity BETWEEN 20 AND 35)
        |GROUP BY p_brand
        |ORDER BY p_brand ASC NULLS FIRST""".stripMargin,
    "q_regr" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |  round(corr(l_extendedprice, l_quantity), 6) AS r,
        |  round(covar_samp(l_extendedprice, l_quantity), 4) AS cov
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_sequence" ->
      """SELECT o_orderkey,
        |  unnest(generate_series(1, o_orderkey % 5 + 1)) AS i
        |FROM orders
        |WHERE o_orderkey <= 200
        |ORDER BY o_orderkey ASC NULLS FIRST, i ASC NULLS FIRST""".stripMargin,
  )
}
