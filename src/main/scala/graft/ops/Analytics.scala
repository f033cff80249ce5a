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

  /** A8+J1 — z-score outlier detection per event type: events whose
    * value sits more than 3 sample standard deviations from their
    * type's mean. The per-type (mean, stddev) table is a TRUE
    * dimension (one row per event type) — aggregate first, broadcast
    * back, filter; never a corpus-wide window. z is rounded at 4dp
    * AFTER the identical (value−μ)/σ expression on both engines, and
    * the outlier gate compares the ROUNDED z so engine-ulp drift in
    * μ/σ cannot flip a boundary row; ORDER BY is integer keys only. */
  def qAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables.events(spark, dir)
      .groupBy($"event_type".as("s_type"))
      .agg(avg($"value").as("mu"), stddev_samp($"value").as("sigma"))
    Tables.events(spark, dir)
      .join(broadcast(stats), $"event_type" === $"s_type")
      .withColumn("z", round(($"value" - $"mu") / $"sigma", 4))
      .filter(abs($"z") > 3)
      .select($"event_id", $"event_type", $"value", $"z")
      .orderBy($"event_type".asc_nulls_first, $"event_id".asc_nulls_first)
  }

  /** A1+J1 — equi-width histogram of `value` per event type (the
    * data-profiling pass a 100 TB ingest runs before choosing
    * partitioning/clustering keys): min/max first as a per-type
    * dimension (one row per type — broadcast), then bin =
    * floor((v−min)/width) clamped to 10 bins, count per bin. Two
    * aggregate passes, no window, no sort of the fact table; bin ids
    * are integers from DOUBLE math identical on both engines (width
    * division, floor) so the histogram is exact, not approximate. */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables.events(spark, dir)
      .groupBy($"event_type".as("s_type"))
      .agg(min($"value").as("lo"), max($"value").as("hi"))
    Tables.events(spark, dir)
      .join(broadcast(stats), $"event_type" === $"s_type")
      .withColumn("bin",
        // hi==lo (constant-value type) makes the width 0 and the ratio
        // 0/0 = NaN — guard explicitly instead of leaning on both
        // engines agreeing that least(NaN, 9) keeps the 9
        when($"hi" === $"lo", lit(0L))
          .otherwise(least(floor(($"value" - $"lo") / (($"hi" - $"lo") / 10.0)),
            lit(9L)).cast("long")))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type".asc_nulls_first, $"bin".asc_nulls_first)
  }

  /** J10+A1 — market-basket co-occurrence: part pairs bought in the
    * same order with support ≥ 3 (the association-mining support
    * count). The pair space is per-ORDER quadratic — bounded by
    * basket size, never corpus size — via a self-join co-partitioned
    * on the order key (the key both sides already hash on); pa < pb
    * emits each pair once. Skew-hardened through [[basketPairs]]:
    * a single pathological mega-basket cannot serialize one task. */
  def qBasketPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    basketPairs(items)
      .filter($"support" >= 3)
      .orderBy($"support".desc_nulls_last, $"pa".asc_nulls_first,
        $"pb".asc_nulls_first)
  }

  /** Size-adaptive per-basket pair build: [[Skew.saltedSelfPairs]]
    * (the factored mechanism — plain co-partitioned self-join for
    * baskets ≤ `cap`, deterministic-salt spread for mega-baskets so
    * one basket's M² pair generation never serializes a task) plus
    * the support count. SkewSpec proves both the spread bound and
    * parity with the unsalted formulation on a crafted mega-basket. */
  private[graft] def basketPairs(items: DataFrame, cap: Int = 64,
                                 salts: Int = 16): DataFrame =
    Skew.saltedSelfPairs(items, "l_orderkey", "l_partkey", cap, salts)
      .select(col("a_l_partkey").as("pa"), col("b_l_partkey").as("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("support"))

  /** W3+A2 — RFM segmentation: per-customer recency / frequency /
    * monetary quartiles WITHIN the customer's market segment (the
    * window stays key-partitioned — a global ntile would serialize
    * on one task, which the plan sweep forbids), concatenated into
    * the classic 3-digit segment code. Ties break on c_custkey so
    * quartile assignment is total-order deterministic. */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(max($"o_orderdate").as("last_order"),
        count(lit(1)).as("freq"),
        round(sum($"o_totalprice"), 2).as("monetary"))
      .join(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_mktsegment"), $"o_custkey" === $"c_custkey")
    def q(col_ : org.apache.spark.sql.Column, asc: Boolean) =
      ntile(4).over(Window.partitionBy($"c_mktsegment")
        .orderBy(if (asc) col_.asc else col_.desc, $"c_custkey".asc))
    per.select($"c_custkey", $"c_mktsegment",
        q($"last_order", asc = false).as("r"),
        q($"freq", asc = false).as("f"),
        q($"monetary", asc = false).as("m"))
      .withColumn("segment", concat($"r", $"f", $"m"))
      .orderBy($"c_custkey".asc_nulls_first)
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
    * aggregate ratio over a dimension join (part UNHINTED — auto-BHJ
    * at test SF, shuffle at 100 TB), per ship month. The CASE keys
    * off the joined dim attribute; numerator and denominator come
    * from ONE aggregate pass. */
  def qPromoShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
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
    // Revenue in EXACT integer 10⁻⁴-dollar units (price is 2dp money,
    // discount 2dp → each term is exact at 4dp; round-to-int of an
    // identical double is engine-exact), then ONE half-up integer
    // division to cents and ONE double division for emission — the
    // r16 sf1 battery caught the double-fold form landing on a dead
    // .005 tie at 2dp (sum = 695682026.805 exactly; Spark .81,
    // DuckDB .80). Same class as q_est_error/q_quantize_int8.
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir),
        $"l_partkey" === $"p_partkey" && (
          ($"p_brand" === "Brand#4" && $"p_size" <= 10 &&
            $"l_quantity".between(5, 20)) ||
          ($"p_brand" === "Brand#2" && $"p_size" <= 25 &&
            $"l_quantity".between(20, 35))))
      .select($"p_brand",
        (round($"l_extendedprice" * 100).cast("decimal(38,0)") *
          (lit(100L) - round($"l_discount" * 100).cast("long")))
          .as("t_pico"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"), sum($"t_pico").as("s_pico"))
      .select($"p_brand", $"n_lines",
        (expr("(s_pico + 50) div 100").cast("double") / 100.0)
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
        // + 0.0 on each: signed statistics — a near-zero slope/corr
        // rounds to IEEE -0.0 in DuckDB, +0.0 through Spark's Round
        (round(regr_slope($"l_extendedprice", $"l_quantity"), 4) + lit(0.0)).as("slope"),
        (round(regr_intercept($"l_extendedprice", $"l_quantity"), 4) + lit(0.0)).as("icept"),
        (round(corr($"l_extendedprice", $"l_quantity"), 6) + lit(0.0)).as("r"),
        (round(covar_samp($"l_extendedprice", $"l_quantity"), 4) + lit(0.0)).as("cov"))
      .orderBy($"l_returnflag".asc_nulls_first)
  }

  /** J7+A8 — correlated-average threshold (TPC-H Q17 shape): lines
    * whose quantity is below 1/5 of their part's average quantity.
    * Catalyst's decorrelation target: the per-part average becomes a
    * shuffle-side aggregate joined back on l_partkey — the aggregate
    * is corpus-scale, so it is UNHINTED (broadcasting it would be the
    * 100 TB bug). Parity is EXACT: quantities are integer-valued, so
    * `5*qty*cnt < sum_qty` is pure integer math in doubles — no
    * avg-rounding tie can flip a row across engines. */
  def qSmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val perPart = li.groupBy($"l_partkey".as("pk"))
      .agg(count(lit(1)).as("cnt"), sum($"l_quantity").as("sum_qty"))
    li.join(Tables.part(spark, dir).filter($"p_brand" === "Brand#3"),
        $"l_partkey" === $"p_partkey")
      .join(perPart, $"l_partkey" === $"pk")
      .filter(lit(5.0) * $"l_quantity" * $"cnt" < $"sum_qty")
      .agg(round(sum($"l_extendedprice") / 7.0, 2).as("avg_yearly"))
  }

  /** J5+J6 — EXISTS and NOT-EXISTS over the same derived table (TPC-H
    * Q21 shape): the only-late-supplier-on-a-shared-order query. The
    * `late` set is derived once and used three ways — probe, semi
    * (some other supplier on the order), anti (no other LATE supplier
    * on the order). All three joins hash on l_orderkey, so AQE can
    * reuse the exchange; nothing is broadcast (late lines scale with
    * the fact table). Date arithmetic is integral → exact parity. */
  def qLateSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val anyLine = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey")
    val late = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .select($"l_orderkey", $"l_suppkey")
    late.as("l1")
      .join(anyLine.as("l2"),
        col("l2.l_orderkey") === col("l1.l_orderkey") &&
          col("l2.l_suppkey") =!= col("l1.l_suppkey"), "left_semi")
      .join(late.as("l3"),
        col("l3.l_orderkey") === col("l1.l_orderkey") &&
          col("l3.l_suppkey") =!= col("l1.l_suppkey"), "left_anti")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc_nulls_last, $"s_name".asc_nulls_first)
      .limit(20)
  }

  /** J6+scalar — anti join gated by a global scalar aggregate (TPC-H
    * Q22 shape): rich-but-dormant customers (no order since
    * 2000-01-01) per segment. The scalar
    * threshold is a ONE-ROW aggregate broadcast into a cross join —
    * the only broadcast that is safe at every scale. Parity is EXACT:
    * the comparison runs in integer cents (`bal_cents * cnt >
    * sum_cents`), so summation-order drift in a double avg can never
    * flip a boundary customer. */
  def qIdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pool = Tables.customer(spark, dir)
      .filter($"c_mktsegment".isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
      .withColumn("bal_cents", round($"c_acctbal" * 100).cast("long"))
    val thresh = pool.filter($"bal_cents" > 0)
      .agg(sum($"bal_cents").as("sum_cents"), count(lit(1)).as("cnt"))
    pool.crossJoin(broadcast(thresh))
      .filter($"bal_cents" * $"cnt" > $"sum_cents")
      .join(Tables.orders(spark, dir)
          .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
          .select($"o_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        round(sum($"c_acctbal"), 2).as("totacctbal"))
      .orderBy($"c_mktsegment".asc_nulls_first)
  }

  /** A2+scalar — group share of a global aggregate (TPC-H Q11 shape):
    * parts whose revenue exceeds 1.25× the mean per-part revenue (a
    * scale-invariant threshold — a fixed fraction of the grand total
    * selects nothing once the part count grows). The mean is
    * an aggregate OF the per-key aggregate — computed once from the
    * grouped frame (one pass over the fact, then a one-row reduce),
    * broadcast back as a cross join. Never a self-join of two full
    * scans.
    *
    * Float discipline (tiecheck catch, r7; membership r8): the
    * emitted revenue sums exact integer ten-thousandths (each
    * term·10⁴ is within 1e-7 of its integer — round-to-int is
    * engine-identical) and re-rounds to cents in integer space. Row
    * MEMBERSHIP is integer-exact too: r > 1.25·avg(r) is evaluated
    * as 4·r4·n > 5·Σr4 in widened exact arithmetic (decimal here,
    * HUGEINT in the oracle — representation differs, the boolean
    * cannot), so cross-engine fold noise near the threshold can no
    * longer flip which parts appear — the residual tie class the
    * r7 fix left open for row selection. */
  def qPartShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val term = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    val rev = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey")
      .agg(sum(round(term * 10000).cast("long")).as("r4"))
    // the grand total widens BEFORE summing: a long sum of revenue
    // ten-thousandths overflows int64 around sf4000 (ANSI would
    // throw; the DuckDB mirror sums in HUGEINT and would silently
    // diverge) — decimal(38,0) keeps the sum exact at any SF
    val total = rev.agg(sum($"r4".cast("decimal(38,0)")).as("t4"),
      count(lit(1)).as("n"))
    rev.crossJoin(broadcast(total))
      .filter($"r4".cast("decimal(38,0)") * $"n" * 4 > $"t4" * 5)
      .select($"l_partkey",
        (round($"r4" / lit(100.0)) / lit(100.0)).as("revenue"))
      .orderBy($"revenue".desc_nulls_last, $"l_partkey".asc_nulls_first)
  }

  /** A2+scalar — argmax of an aggregate (TPC-H Q15 shape): the
    * supplier(s) with maximum revenue in a quarter. max() reduces the
    * per-supplier aggregate to one row, broadcast back for the
    * equality filter — the scale-correct alternative to a global
    * (unpartitioned) rank window, which would sort everything on one
    * task. Both the argmax and the emitted revenue run on the exact
    * integer ten-thousandths aggregate (r4): a money sum rounded at
    * 2dp can land exactly on a .005 lattice boundary (tiecheck
    * class), and a double-sum argmax near a revenue tie could pick
    * different winners per engine — max(r4) with r4 = max(r4) makes
    * the winning row set integer-deterministic too (r8). */
  def qTopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val term = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    val srev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(round(term * 10000).cast("long")).as("r4"))
    val mx = srev.agg(max($"r4").as("mx4"))
    srev.crossJoin(broadcast(mx))
      .filter($"r4" === $"mx4")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        (round($"r4" / lit(100.0)) / lit(100.0)).as("total_rev"))
      .orderBy($"s_suppkey".asc_nulls_first)
  }

  /** J7+ — the star-schema revenue rollup (TPC-H Q5 shape): a 6-way
    * join where the nation/region dims are BROADCAST (genuinely
    * bounded — ~200 nations on Earth) and the fact-side joins
    * (orders, lineitem, supplier, customer) stay unhinted shuffles.
    * The "local supplier" predicate (c_nationkey = s_nationkey) rides
    * the customer join as an extra condition, not a separate pass;
    * the date filter lands on the orders SCAN before any join. */
  def qLocalRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dims = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir),
        $"n_regionkey" === $"r_regionkey" && $"r_name" === "ASIA")
      .select($"n_nationkey", $"n_name")
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    Tables.lineitem(spark, dir)
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(Tables.customer(spark, dir),
        $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(dims), $"s_nationkey" === $"n_nationkey")
      // exact pico-dollar accumulation + half-up cents emission — the
      // double-fold form hit a dead .005 tie at 2dp on the r16 sf1
      // battery (NATION_12: …750.045 exactly); see qDisjunctiveJoin
      .withColumn("t_pico",
        round($"l_extendedprice" * 100).cast("decimal(38,0)") *
          (lit(100L) - round($"l_discount" * 100).cast("long")))
      .groupBy($"n_name")
      .agg(sum($"t_pico").as("s_pico"))
      .select($"n_name",
        (expr("(s_pico + 50) div 100").cast("double") / 100.0)
          .as("revenue"))
      .orderBy($"revenue".desc_nulls_last, $"n_name".asc_nulls_first)
  }

  /** J7+O2 — returned-item report (TPC-H Q10 shape): fact joins
    * reduced by scan-level filters (return flag, date window), then a
    * per-customer aggregate, then top-20 — the aggregate runs BEFORE
    * the limit so the sort sees |customers| rows, not |lineitem|;
    * nation lookup is broadcast. */
  def qReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
        .as("revenue"))
      .select($"c_custkey", $"c_name", $"revenue",
        round($"c_acctbal", 2).as("acctbal"), $"n_name")
      .orderBy($"revenue".desc_nulls_last, $"c_custkey".asc_nulls_first)
      .limit(20)
  }

  /** J7+ — cross-nation trade volume (TPC-H Q7 shape): the SAME
    * nation dim broadcast-joined TWICE under different keys (supplier
    * side and customer side), an order-insensitive nation-PAIR
    * disjunction as the residual, and a year extraction as a grouping
    * key. Revenue rounded at 4 (exact 4-decimal rationals — see
    * qReturnedItems). */
  def qTradeVolume(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n1 = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select($"n_nationkey".as("ck"), $"n_name".as("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"s_nationkey" === $"sk")
      .join(broadcast(n2), $"c_nationkey" === $"ck")
      .filter(($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_7") ||
        ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_2"))
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("yr"))
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
        .as("volume"))
      .orderBy($"supp_nation".asc_nulls_first, $"cust_nation".asc_nulls_first,
        $"yr".asc_nulls_first)
  }

  /** J7+A2 — product profit by nation and year (TPC-H Q9 shape; the
    * reference testdata has no partsupp, so unit cost is proxied by
    * p_retailprice — same plan shape, different constant). Profit is
    * computed per LINE inside the projection, aggregated once per
    * (nation, year) — the join tree reduces before the group-by, and
    * only the red parts survive the part-dim filter. */
  def qProductProfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter($"p_name".like("%red%")),
        $"l_partkey" === $"p_partkey")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name", year($"o_orderdate").as("yr"))
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") -
        $"p_retailprice" * $"l_quantity"), 4).as("profit"))
      .orderBy($"n_name".asc_nulls_first, $"yr".desc_nulls_last)
  }

  /** X6+ — row generator: explode(sequence(1, k)) emits k rows per
    * input row inside the projection — no shuffle, no driver loop;
    * the 100 TB analog of "generate retry slots / date spines".
    * Bounded input keeps the oracle dump small. */
  /** A2+ — ordered funnel conversion (view → click → purchase):
    * a user converts at stage k iff the FIRST occurrences of the
    * stages are in order (min-ts comparison — strictly ordered,
    * null-safe: a missing stage compares null and drops out). Two
    * hash-aggs, no self-join, no window: the per-user conditional
    * mins reduce 100 TB of events to one row per user map-side, the
    * global fold is 3 counters. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "view", $"ts")).as("t_view"),
        min(when($"event_type" === "click", $"ts")).as("t_click"),
        min(when($"event_type" === "purchase", $"ts")).as("t_buy"))
      .agg(
        sum($"t_view".isNotNull.cast("long")).as("n_view"),
        sum(($"t_view" < $"t_click").cast("long")).as("n_view_click"),
        sum(($"t_view" < $"t_click" && $"t_click" < $"t_buy").cast("long"))
          .as("n_view_click_buy"))
  }

  /** A2+J7+ — weekly cohort retention: users active in week w who
    * are also active in week w+1. distinct (user, week) first — the
    * self-join and both aggs run on user-week cardinality, never raw
    * events; the join key is (user_id, week) so one shuffle
    * co-locates a user's adjacent weeks. Week truncation is ISO
    * Monday on both engines; date_add is integer day math. */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Tables.events(spark, dir)
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
      .distinct()
    val act = w.groupBy($"wk").agg(count(lit(1)).as("active"))
    val ret = w.alias("a")
      .join(w.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.wk") === date_add(col("a.wk"), 7))
      .groupBy(col("a.wk").as("wk")).agg(count(lit(1)).as("retained"))
    act.join(ret, Seq("wk"), "left")
      .select($"wk", $"active", coalesce($"retained", lit(0L)).as("retained"))
      .orderBy($"wk".asc_nulls_first)
  }

  /** A20 — TIME-BOUND conversion: clicks followed by a purchase by
    * the same user within one hour, counted per user — the funnel
    * variant where ordering alone is not enough (q_funnel) and the
    * step must land inside a window. Shape: left_semi join with the
    * user equi key and the interval as a residual — hashes on
    * user_id, evaluates the time bound inside the join, never a
    * cross product (the q_range_join contract on the events table);
    * semi means a click converts at most once however many purchases
    * follow. Exact µs integer arithmetic end to end. */
  def qTimedConversion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).withColumn("ts_us", unix_micros($"ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts_us")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts_us".as("p_ts"))
    clicks
      .join(purchases,
        $"user_id" === $"p_user" && $"p_ts" > $"ts_us" &&
          $"p_ts" <= $"ts_us" + lit(3600L * 1000000L), "left_semi")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_converted"))
      .orderBy($"user_id".asc_nulls_first)
  }

  /** W5+ — deterministic per-group sample ("reservoir" without RNG):
    * the k=5 events whose md5(event_id) sorts lowest per event_type —
    * a uniform, reproducible, engine-independent without-replacement
    * sample (same contract as q_hash_sample, but per group with an
    * exact k). The window sorts within each group's partition; at
    * 100 TB the two-phase form (per-partition top-k heap, then global
    * top-k — q_topk's TakeOrderedAndProject shape per key) replaces
    * the full sort. */
  def qGroupSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type")
      .orderBy(md5($"event_id".cast("string")).asc, $"event_id".asc)
    Tables.events(spark, dir)
      .select($"event_id", $"event_type")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .orderBy($"event_type".asc_nulls_first, $"rk".asc_nulls_first)
  }

  def qSequence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" <= 200)
      .select($"o_orderkey",
        explode(sequence(lit(1L), ($"o_orderkey" % 5) + 1L)).as("i"))
      .orderBy($"o_orderkey".asc_nulls_first, $"i".asc_nulls_first)
  }

  /** J2+W5 — min-cost supplier per part (TPC-H Q2 shape; the testdata
    * has no partsupp, so the offer book is derived from observed
    * lineitem prices: min(l_extendedprice / l_quantity) per
    * (part, supplier) is that supplier's unit-cost offer). The
    * correlated MIN-subquery becomes a per-part argmin window
    * (row_number over cost) — and the part-dim FILTER JOIN runs
    * BEFORE the window, so at 100 TB the window sorts only the
    * surviving parts' offers, not the whole offer book. min() and /
    * are order-insensitive IEEE ops, bit-identical on any engine —
    * but round(x, 4) is NOT (sf0.1 hit a .xxxx5 tie that Spark's
    * BigDecimal HALF_UP and DuckDB's scaled rounding resolve
    * differently), so the output gates through integer space:
    * floor(x·10⁴) is one deterministic IEEE multiply + an exact
    * floor, identical on both engines for identical doubles. */
  def qMinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val offers = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min($"l_extendedprice" / $"l_quantity").as("unit_cost"))
    val w = Window.partitionBy($"p_partkey")
      .orderBy($"unit_cost".asc, $"l_suppkey".asc)
    offers
      .join(Tables.part(spark, dir)
        .filter($"p_size" <= 15 && $"p_type" === "LARGE"),
        $"l_partkey" === $"p_partkey")
      .select($"p_partkey", $"l_suppkey", $"unit_cost")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"s_nationkey" === $"n_nationkey")
      .select($"p_partkey", $"s_name", $"n_name",
        floor($"unit_cost" * 10000).cast("long").as("unit_cost_e4"))
      .orderBy($"p_partkey".asc_nulls_first)
  }

  /** A3+ — forecast-revenue-change scalar (TPC-H Q6 shape): a pure
    * filter + single global sum, the cheapest possible full-scan
    * query — at 100 TB the predicate and the 2-column projection both
    * reach the parquet scan (PushedFilters + ReadSchema), and the agg
    * is map-side partial → one 1-row exchange. */
  def qForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter(year($"l_shipdate") === 1996 &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 4).as("revenue"))
  }

  /** J7+A7 — national market share inside a region (TPC-H Q8 shape):
    * the widest join tree in the suite — lineitem × part × orders ×
    * customer × nation × region × supplier × nation — with the share
    * computed as a conditional-sum ratio per order-year. Dims
    * (nation ×2, region) broadcast; part is a FILTERED dim Catalyst
    * sizes itself; the two fact joins hash on their natural keys.
    * Ratio rounded at 6 (sum-order drift ~1e-12 relative). */
  def qMarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val custNation = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("cnk"))
    val suppNation = Tables.nation(spark, dir)
      .select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter($"p_type" === "STANDARD"),
        $"l_partkey" === $"p_partkey")
      .join(Tables.orders(spark, dir)
        .filter($"o_orderdate".between(
          lit("1996-01-01").cast("timestamp"),
          lit("1997-12-31").cast("timestamp"))),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(custNation), $"c_nationkey" === $"cnk")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(suppNation), $"s_nationkey" === $"snk")
      .withColumn("vol", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
      .groupBy(year($"o_orderdate").as("yr"))
      .agg(round(
        sum(when($"supp_nation" === "NATION_9", $"vol").otherwise(0.0)) /
          sum($"vol"), 6).as("mkt_share"))
      .orderBy($"yr".asc_nulls_first)
  }

  /** A7+J1 — late-shipment priority split (TPC-H Q12 shape; the
    * testdata has no shipmode/commitdate, so the mode dimension is
    * l_linestatus and "late" is shipped >60 days after order date).
    * Conditional integer counts — exact on any engine; the date
    * arithmetic stays inside the scan's filter. */
  def qShipmodePriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS") &&
        year($"l_shipdate") === 1997)
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy($"l_linestatus".asc_nulls_first)
  }

  /** A5+J6 — supplier diversity per part profile (TPC-H Q16 shape):
    * distinct-supplier count per (brand, type, size) over the
    * observed lineitem offer pairs, EXCLUDING blocklisted suppliers
    * (negative balance = the complaints analog) via anti-join.
    * countDistinct shuffles (profile, suppkey) pairs once, then
    * counts — no row explosion; the anti side is a tiny filtered dim. */
  def qSupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir).select($"l_partkey", $"l_suppkey")
      .join(Tables.part(spark, dir)
        .filter($"p_brand" =!= "Brand#5" &&
          $"p_size".isin(1, 9, 15, 19, 23, 36, 45, 49)),
        $"l_partkey" === $"p_partkey")
      .join(Tables.supplier(spark, dir).filter($"s_acctbal" < 0)
        .select($"s_suppkey"),
        $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc_nulls_last, $"p_brand".asc_nulls_first,
        $"p_type".asc_nulls_first, $"p_size".asc_nulls_first)
  }

  /** J5+A2 — dominant suppliers of red parts (TPC-H Q20 shape; no
    * partsupp, so "excess stock" becomes "shipped more than half of
    * the part's 1997 volume"). Two aggregation GRAINS of the same
    * reduced join — per (part,supp) then per part — compared with
    * integer-exact math (2·q > total on integer-valued quantities),
    * then DISTINCT suppliers. The per-part total REUSES the
    * per-(part,supp) aggregate as its input — no second fact scan. */
  def qExcessQuantity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perSupp = Tables.lineitem(spark, dir)
      .filter(year($"l_shipdate") === 1997)
      .join(Tables.part(spark, dir).filter($"p_name".like("red%"))
        .select($"p_partkey"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity").as("q"))
    val perPart = perSupp.groupBy($"l_partkey".as("pk"))
      .agg(sum($"q").as("qt"))
    perSupp.join(perPart, $"l_partkey" === $"pk")
      .filter($"q" * 2.0 > $"qt")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .select($"s_name").distinct()
      .orderBy($"s_name".asc_nulls_first)
  }

  /** A20 — Markov transition counts over the event stream: for every
    * user the ts-ordered successor event type (lead over the SAME
    * (ts_us, event_id) ordering contract as qLead), then the global
    * (from_type, to_type) transition matrix with its row-normalized
    * probability. The user-partitioned window is the only fact-grain
    * shuffle; the probability normalizer runs on the aggregated
    * matrix (≤ |types|² rows), so the second window is free. ln-free
    * integer counts; the probability is the one float, rounded at 6
    * AFTER the division of two exact longs — identical on both
    * engines. */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
    val trans = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros($"ts"))
      .select($"user_id", $"event_type".as("from_type"),
        lead($"event_type", 1).over(w).as("to_type"))
      .filter($"to_type".isNotNull)
      .groupBy($"from_type", $"to_type")
      .agg(count(lit(1)).as("cnt"))
    val wf = Window.partitionBy($"from_type")
    trans
      .withColumn("prob",
        round($"cnt".cast("double") / sum($"cnt").over(wf), 6))
      .orderBy($"from_type".asc_nulls_first, $"to_type".asc_nulls_first)
  }

  /** A20+W4 — inter-event dwell-gap quantiles per event type: the gap
    * to each event's per-user predecessor (lag over the (ts_us,
    * event_id) ordering contract), quantiles picked by INTEGER rank —
    * rank ceil(p·n) computed as (p·n + 99) div 100 in pure integer
    * math, so no interpolation float can straddle an engine ulp. The
    * grouping key is the LATER event's type (the dwell that event
    * terminated). Two shuffles total: the user window, then the
    * type-partitioned rank window on (gap, event_id) — deterministic
    * under ties. */
  def qGapPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wu = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
    val gaps = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros($"ts"))
      .select($"event_id", $"event_type",
        ($"ts_us" - lag($"ts_us", 1).over(wu)).as("gap_us"))
      .filter($"gap_us".isNotNull)
    // two-phase rank (r12): event_type is bounded-cardinality over
    // fact-grain gaps — scalableRank keeps any task's sort at
    // |gaps|/ranges instead of a whole type
    Skew.scalableRank(gaps, Seq("event_type"),
        Seq($"gap_us".asc, $"event_id".asc), "rn", Some("n"))
      .filter($"rn" === expr("(50 * n + 99) div 100") ||
        $"rn" === expr("(90 * n + 99) div 100") ||
        $"rn" === expr("(99 * n + 99) div 100"))
      .groupBy($"event_type")
      .agg(max($"n").as("n_gaps"),
        min(when($"rn" === expr("(50 * n + 99) div 100"), $"gap_us"))
          .as("p50_us"),
        min(when($"rn" === expr("(90 * n + 99) div 100"), $"gap_us"))
          .as("p90_us"),
        min(when($"rn" === expr("(99 * n + 99) div 100"), $"gap_us"))
          .as("p99_us"))
      .orderBy($"event_type".asc_nulls_first)
  }

  /** A23 — winsorized per-type value statistics: clamp each value to
    * the rank-picked [p05, p95] of its event type before averaging —
    * the robust-mean profile a metrics pipeline publishes when a few
    * runaway values would otherwise dominate. The bounds are ACTUAL
    * data values (integer-rank pick, (value, event_id) tie-break —
    * no interpolation float), the clamp is least/greatest of existing
    * doubles, and only the final avg is rounded (6). Bounds table is
    * |types| rows — auto-broadcast, unhinted. */
  def qWinsorizedStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"event_type", $"value")
    // two-phase rank (r12): same bounded-key/fact-grain shape as
    // q_gap_percentiles — no whole-type single-task sort
    val ranked = Skew.scalableRank(ev, Seq("event_type"),
      Seq($"value".asc, $"event_id".asc), "rn", Some("n"))
    val bounds = ranked
      .filter($"rn" === expr("(5 * n + 99) div 100") ||
        $"rn" === expr("(95 * n + 99) div 100"))
      .groupBy($"event_type")
      .agg(min(when($"rn" === expr("(5 * n + 99) div 100"), $"value"))
          .as("lo"),
        min(when($"rn" === expr("(95 * n + 99) div 100"), $"value"))
          .as("hi"))
    ev.join(bounds, "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(avg(least(greatest($"value", $"lo"), $"hi")), 6)
          .as("winsorized_mean"),
        sum(($"value" < $"lo" || $"value" > $"hi").cast("long"))
          .as("n_clamped"))
      .orderBy($"event_type".asc_nulls_first)
  }

  /** A24 — recency-decayed engagement score: Σ value · 2^(−weeks_ago)
    * per user, weeks_ago in pure integer µs arithmetic against the
    * stream's max timestamp (a broadcast 1-row scalar). The decay
    * weight is a power of two with an INTEGER exponent — exactly
    * representable in IEEE double on both engines, so the only
    * rounding surface is the final 6-decimal round of the sum. One
    * fact pass + one user-keyed agg; the "which users are still warm"
    * feature every engagement pipeline derives. */
  def qRecencyScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"value", unix_micros($"ts").as("ts_us"))
    val maxTs = ev.agg(max($"ts_us").as("max_us"))
    ev.crossJoin(broadcast(maxTs))
      .withColumn("wk",
        expr("(max_us - ts_us) div 604800000000")) // 7*86400*1e6 µs
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value" * pow(lit(0.5), $"wk".cast("int"))), 6)
          .as("recency_score"))
      .orderBy($"user_id".asc_nulls_first)
  }

  /** L86 — Z-order layout key + clustering-quality audit: the
    * multi-dimensional data-layout lever (Delta/Iceberg's OPTIMIZE
    * ZORDER, Spark's repartitionByRange on an interleaved key) made
    * a measurable decision. Each event quantizes its two query
    * dimensions (time, value) to 8-bit codes on an INTEGER grid —
    * (v − min)·256 div (span+1), exact at any scale, no float
    * division — the z key interleaves the bits, and the audit
    * compares 16 equal z-range "files" against 16 time-range files:
    * per file, rows plus the PER-DIM code spans and bounding-box
    * area — exactly what parquet min/max row-group pruning reads.
    * The trade it measures (this corpus, sf0.01: linear = time-span
    * 16 / value-span ~180; z-order = 64 / 64): a time-linear layout
    * is perfect for time predicates and nearly unprunable for value
    * predicates; z-order bounds BOTH spans at 64, so a value-range
    * scan skips ~4× more files at the cost of 4× wider time boxes —
    * the audit emits both spans so the layout decision reads
    * directly off the result. Plan: one scalar
    * min/max broadcast, one projection (the z key is 16 shifts and
    * adds — codegen, no UDF), one explode×2 for the two layouts,
    * one hash-agg; ALL-INTEGER output — zero rounding-tie surface.
    * At 100 TB the z key is what you pass to repartitionByRange
    * before the write; this audit is how you justify the shuffle. */
  /** The (ts_us, v_u, xc, yc, z) code table [[qZorder]] audits —
    * factored so LayoutSpec can WRITE the two layouts through
    * repartitionByRange and assert real parquet-footer min/max
    * pruning, not just the simulated bucket boxes. */
  /** The 8+8-bit interleave as a SQL expression over columns
    * `xc`/`yc` — exposed so OpsSpec can prove it bijective and
    * box-bounded over the FULL 65536-pair domain. */
  private[graft] val zInterleaveExpr: String = (0 until 8).map(i =>
    s"shiftleft(shiftright(xc, $i) & 1, ${2 * i}) + " +
      s"shiftleft(shiftright(yc, $i) & 1, ${2 * i + 1})")
    .mkString(" + ")

  private[graft] def zorderCodes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(unix_micros($"ts").as("ts_us"),
        round($"value" * 100).cast("long").as("v_u"))
    val mm = ev.agg(min($"ts_us").as("t0"), max($"ts_us").as("t1"),
      min($"v_u").as("v0"), max($"v_u").as("v1"))
    val zExpr = zInterleaveExpr
    ev.crossJoin(broadcast(mm))
      .withColumn("xc", expr("((ts_us - t0) * 256) div (t1 - t0 + 1)"))
      .withColumn("yc", expr("((v_u - v0) * 256) div (v1 - v0 + 1)"))
      .withColumn("z", expr(zExpr))
      .select($"ts_us", $"v_u", $"xc", $"yc", $"z")
  }

  def qZorder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    zorderCodes(spark, dir)
      .select($"xc", $"yc", explode(array(
        struct(lit("linear").as("layout"), expr("xc div 16").as("bucket")),
        struct(lit("zorder").as("layout"), expr("z div 4096").as("bucket"))))
        .as("e"))
      .select($"xc", $"yc", $"e.layout".as("layout"), $"e.bucket".as("bucket"))
      .groupBy($"layout", $"bucket")
      .agg(count(lit(1)).as("n_rows"),
        (max($"xc") - min($"xc") + 1).as("t_span"),
        (max($"yc") - min($"yc") + 1).as("v_span"),
        ((max($"xc") - min($"xc") + 1) *
          (max($"yc") - min($"yc") + 1)).as("bbox_area"))
      .orderBy($"layout".asc_nulls_first, $"bucket".asc_nulls_first)
  }

  /** L87 — join-key skew audit: the measurement that justifies a
    * salting/AQE-skew intervention BEFORE a 100 TB join, run over
    * the three join keys this engine's own queries shuffle on. Per
    * key: distinct-key count, total rows, the p50/p99/max per-key
    * frequencies (exact ceiling-rank picks on the integer count
    * table — q_gap_percentiles' mechanism, (c, k) tie-break), and
    * skew_x100 = 100·max/floor-avg in PURE int64 arithmetic
    * ((max·100) div (rows div keys) — max·100 is rows-per-hottest-
    * key-scaled, safe at any scale, unlike max·keys·100 which
    * overflows int64 on a billion-key table with a giant hot key).
    * Plan: three map-side-combinable count aggs; the rank over the
    * per-key COUNT table (index-sized, never the fact rows) is the
    * two-phase [[graft.ops.Skew.scalableRank]], so a billion-key
    * count table ranks across the cluster's ranges instead of one
    * task per key_name. All-integer output, zero tie surface. */
  def qSkewStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def keyCounts(df: DataFrame, keyCol: String, nm: String): DataFrame =
      df.groupBy(col(keyCol).cast("long").as("k"))
        .agg(count(lit(1)).as("c"))
        .select(lit(nm).as("key_name"), $"k", $"c")
    val all = keyCounts(Tables.lineitem(spark, dir), "l_suppkey", "lineitem.l_suppkey")
      .unionByName(keyCounts(Tables.orders(spark, dir), "o_custkey", "orders.o_custkey"))
      .unionByName(keyCounts(Tables.events(spark, dir), "user_id", "events.user_id"))
    // two-phase rank (r12): key_name has exactly 3 values, so a
    // key_name-partitioned window would sort one join key's ENTIRE
    // per-key count table (1B rows at 1B distinct custkeys) on one
    // task — the skew audit must not itself be the skewed plan. The
    // (n, tot) stats are one map-side-combinable 3-row agg that
    // Catalyst auto-broadcasts back (corpus-derived — never hinted).
    val stats = all.groupBy($"key_name")
      .agg(count(lit(1)).as("n"), sum($"c").as("tot"))
    Skew.scalableRank(all, Seq("key_name"), Seq($"c".asc, $"k".asc), "rn")
      .join(stats, "key_name")
      .filter($"rn" === expr("(50 * n + 99) div 100") ||
        $"rn" === expr("(99 * n + 99) div 100") || $"rn" === $"n")
      .groupBy($"key_name")
      .agg(max($"n").as("n_keys"), max($"tot").as("n_rows"),
        min(when($"rn" === expr("(50 * n + 99) div 100"), $"c")).as("p50_c"),
        min(when($"rn" === expr("(99 * n + 99) div 100"), $"c")).as("p99_c"),
        max(when($"rn" === $"n", $"c")).as("max_c"))
      .withColumn("skew_x100",
        expr("(max_c * 100) div (n_rows div n_keys)"))
      .orderBy($"key_name".asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "q_skew_stats" -> (qSkewStats _),
    "q_zorder" -> (qZorder _),
    "q_funnel" -> (qFunnel _),
    "q_event_transitions" -> (qEventTransitions _),
    "q_gap_percentiles" -> (qGapPercentiles _),
    "q_winsorized_stats" -> (qWinsorizedStats _),
    "q_recency_score" -> (qRecencyScore _),
    "q_timed_conversion" -> (qTimedConversion _),
    "q_retention" -> (qRetention _),
    "q_group_sample" -> (qGroupSample _),
    "q_rank_dist" -> (qRankDist _),
    "q_min_cost_supplier" -> (qMinCostSupplier _),
    "q_forecast_revenue" -> (qForecastRevenue _),
    "q_market_share" -> (qMarketShare _),
    "q_shipmode_priority" -> (qShipmodePriority _),
    "q_supplier_cnt" -> (qSupplierCnt _),
    "q_excess_quantity" -> (qExcessQuantity _),
    "q_first_last" -> (qFirstLast _),
    "q_lead" -> (qLead _),
    "q_median_mode" -> (qMedianMode _),
    "q_cust_distribution" -> (qCustDistribution _),
    "q_order_priority" -> (qOrderPriority _),
    "q_bit_agg" -> (qBitAgg _),
    "q_anomaly" -> (qAnomaly _),
    "q_histogram" -> (qHistogram _),
    "q_basket_pairs" -> (qBasketPairs _),
    "q_rfm" -> (qRfm _),
    "q_regr" -> (qRegr _),
    "q_sequence" -> (qSequence _),
    "q_big_spenders" -> (qBigSpenders _),
    "q_promo_share" -> (qPromoShare _),
    "q_disjunctive_join" -> (qDisjunctiveJoin _),
    "q_small_qty_revenue" -> (qSmallQtyRevenue _),
    "q_late_suppliers" -> (qLateSuppliers _),
    "q_idle_customers" -> (qIdleCustomers _),
    "q_part_share" -> (qPartShare _),
    "q_top_supplier" -> (qTopSupplier _),
    "q_local_revenue" -> (qLocalRevenue _),
    "q_returned_items" -> (qReturnedItems _),
    "q_trade_volume" -> (qTradeVolume _),
    "q_product_profit" -> (qProductProfit _),
  )

  val oracles: Map[String, String] = Map(
    "q_skew_stats" ->
      """WITH ks AS (
        |  SELECT 'lineitem.l_suppkey' AS key_name,
        |      CAST(l_suppkey AS BIGINT) AS k, count(*) AS c
        |    FROM lineitem GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'orders.o_custkey', CAST(o_custkey AS BIGINT), count(*)
        |    FROM orders GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'events.user_id', CAST(user_id AS BIGINT), count(*)
        |    FROM events GROUP BY 1, 2),
        |r AS (SELECT key_name, k, c,
        |    row_number() OVER (PARTITION BY key_name
        |      ORDER BY c ASC, k ASC) AS rn,
        |    count(*) OVER (PARTITION BY key_name) AS n,
        |    sum(c) OVER (PARTITION BY key_name) AS tot
        |  FROM ks),
        |a AS (SELECT key_name,
        |    CAST(max(n) AS BIGINT) AS n_keys,
        |    CAST(max(tot) AS BIGINT) AS n_rows,
        |    min(CASE WHEN rn = (50 * n + 99) // 100 THEN c END) AS p50_c,
        |    min(CASE WHEN rn = (99 * n + 99) // 100 THEN c END) AS p99_c,
        |    max(CASE WHEN rn = n THEN c END) AS max_c
        |  FROM r
        |  WHERE rn = (50 * n + 99) // 100 OR rn = (99 * n + 99) // 100
        |    OR rn = n
        |  GROUP BY key_name)
        |SELECT key_name, n_keys, n_rows, p50_c, p99_c, max_c,
        |  CAST((max_c * 100) // (n_rows // n_keys) AS BIGINT) AS skew_x100
        |FROM a
        |ORDER BY key_name ASC NULLS FIRST""".stripMargin,
    "q_zorder" -> {
      val zExpr = (0 until 8).map(i =>
        s"(((xc >> $i) & 1) << ${2 * i}) + (((yc >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         |    CAST(round(value * 100) AS BIGINT) AS v_u FROM events),
         |mm AS (SELECT min(ts_us) AS t0, max(ts_us) AS t1,
         |    min(v_u) AS v0, max(v_u) AS v1 FROM ev),
         |c AS (SELECT ((ts_us - t0) * 256) // (t1 - t0 + 1) AS xc,
         |    ((v_u - v0) * 256) // (v1 - v0 + 1) AS yc
         |  FROM ev CROSS JOIN mm),
         |zt AS (SELECT xc, yc, $zExpr AS z FROM c),
         |b AS (
         |  SELECT 'linear' AS layout, xc // 16 AS bucket, xc, yc FROM zt
         |  UNION ALL
         |  SELECT 'zorder' AS layout, z // 4096 AS bucket, xc, yc FROM zt)
         |SELECT layout, bucket, count(*) AS n_rows,
         |  max(xc) - min(xc) + 1 AS t_span,
         |  max(yc) - min(yc) + 1 AS v_span,
         |  (max(xc) - min(xc) + 1) * (max(yc) - min(yc) + 1) AS bbox_area
         |FROM b GROUP BY layout, bucket
         |ORDER BY layout ASC NULLS FIRST, bucket ASC NULLS FIRST""".stripMargin
    },
    "q_winsorized_stats" ->
      """WITH r AS (SELECT event_id, event_type, value,
        |    row_number() OVER
        |      (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |b AS (SELECT event_type,
        |    min(CASE WHEN rn = (5 * n + 99) // 100 THEN value END) AS lo,
        |    min(CASE WHEN rn = (95 * n + 99) // 100 THEN value END) AS hi
        |  FROM r
        |  WHERE rn = (5 * n + 99) // 100 OR rn = (95 * n + 99) // 100
        |  GROUP BY event_type)
        |SELECT event_type, count(*) AS n,
        |  round(avg(least(greatest(value, lo), hi)), 6) AS winsorized_mean,
        |  CAST(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clamped
        |FROM events JOIN b USING (event_type)
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "q_recency_score" ->
      """WITH e AS (SELECT user_id, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |m AS (SELECT max(ts_us) AS max_us FROM e)
        |SELECT user_id, count(*) AS n_events,
        |  round(sum(value *
        |    pow(0.5, CAST((max_us - ts_us) // 604800000000 AS INTEGER))),
        |    6) AS recency_score
        |FROM e CROSS JOIN m
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "q_event_transitions" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |s AS (SELECT user_id, event_type AS from_type,
        |    lead(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
        |      AS to_type
        |  FROM e),
        |m AS (SELECT from_type, to_type, count(*) AS cnt FROM s
        |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
        |SELECT from_type, to_type, cnt,
        |  round(CAST(cnt AS DOUBLE) /
        |    sum(cnt) OVER (PARTITION BY from_type), 6) AS prob
        |FROM m
        |ORDER BY from_type ASC NULLS FIRST, to_type ASC NULLS FIRST""".stripMargin,
    "q_gap_percentiles" ->
      """WITH e AS (SELECT event_id, event_type, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |g AS (SELECT event_id, event_type,
        |    ts_us - lag(ts_us, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
        |      AS gap_us
        |  FROM e),
        |r AS (SELECT event_type, gap_us, event_id,
        |    row_number() OVER
        |      (PARTITION BY event_type ORDER BY gap_us ASC, event_id ASC)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM g WHERE gap_us IS NOT NULL)
        |SELECT event_type, max(n) AS n_gaps,
        |  min(CASE WHEN rn = (50 * n + 99) // 100 THEN gap_us END) AS p50_us,
        |  min(CASE WHEN rn = (90 * n + 99) // 100 THEN gap_us END) AS p90_us,
        |  min(CASE WHEN rn = (99 * n + 99) // 100 THEN gap_us END) AS p99_us
        |FROM r
        |WHERE rn = (50 * n + 99) // 100 OR rn = (90 * n + 99) // 100
        |   OR rn = (99 * n + 99) // 100
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "q_timed_conversion" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)
        |SELECT user_id, count(*) AS n_converted
        |FROM e c
        |WHERE c.event_type = 'click'
        |  AND EXISTS (SELECT 1 FROM e p
        |    WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        |      AND p.ts_us > c.ts_us AND p.ts_us <= c.ts_us + 3600000000)
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "q_funnel" ->
      """WITH f AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view'
        |      THEN CAST(ts AS TIMESTAMP) END) AS t_view,
        |    min(CASE WHEN event_type = 'click'
        |      THEN CAST(ts AS TIMESTAMP) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ts AS TIMESTAMP) END) AS t_buy
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_view,
        |  CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_view_click,
        |  CAST(sum(CASE WHEN t_view < t_click AND t_click < t_buy
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click_buy
        |FROM f""".stripMargin,
    "q_retention" ->
      """WITH w AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        |  FROM events),
        |act AS (SELECT wk, count(*) AS active FROM w GROUP BY wk),
        |ret AS (SELECT a.wk, count(*) AS retained
        |  FROM w a JOIN w b
        |    ON a.user_id = b.user_id AND b.wk = a.wk + 7
        |  GROUP BY a.wk)
        |SELECT act.wk, act.active,
        |  coalesce(ret.retained, 0) AS retained
        |FROM act LEFT JOIN ret ON act.wk = ret.wk
        |ORDER BY act.wk ASC NULLS FIRST""".stripMargin,
    "q_group_sample" ->
      """SELECT event_id, event_type, rk FROM (
        |  SELECT event_id, event_type,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY md5(CAST(event_id AS VARCHAR)) ASC, event_id ASC) AS rk
        |  FROM events)
        |WHERE rk <= 5
        |ORDER BY event_type ASC NULLS FIRST, rk ASC NULLS FIRST""".stripMargin,
    "q_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |best AS (
        |  SELECT p_partkey, l_suppkey, unit_cost,
        |    row_number() OVER (PARTITION BY p_partkey
        |      ORDER BY unit_cost ASC, l_suppkey ASC) AS rn
        |  FROM offers JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 15 AND p_type = 'LARGE')
        |SELECT p_partkey, s_name, n_name,
        |  CAST(floor(unit_cost * 10000) AS BIGINT) AS unit_cost_e4
        |FROM best
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE rn = 1
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,
    "q_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        |FROM lineitem
        |WHERE year(l_shipdate) = 1996
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_market_share" ->
      """SELECT year(o_orderdate) AS yr,
        |  round(sum(CASE WHEN sn.n_name = 'NATION_9'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
        |    / sum(l_extendedprice * (1.0 - l_discount)), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
        |    AND TIMESTAMP '1997-12-31'
        |GROUP BY yr
        |ORDER BY yr ASC NULLS FIRST""".stripMargin,
    "q_shipmode_priority" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND year(l_shipdate) = 1997
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_size IN (1, 9, 15, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC NULLS LAST, p_brand ASC NULLS FIRST,
        |  p_type ASC NULLS FIRST, p_size ASC NULLS FIRST""".stripMargin,
    "q_excess_quantity" ->
      """WITH per_supp AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE year(l_shipdate) = 1997 AND p_name LIKE 'red%'
        |  GROUP BY l_partkey, l_suppkey),
        |per_part AS (
        |  SELECT l_partkey AS pk, sum(q) AS qt FROM per_supp GROUP BY 1)
        |SELECT DISTINCT s_name
        |FROM per_supp
        |JOIN per_part ON l_partkey = pk
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE q * 2.0 > qt
        |ORDER BY s_name ASC NULLS FIRST""".stripMargin,
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
    "q_basket_pairs" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS support
        |FROM items a JOIN items b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY pa, pb
        |HAVING count(*) >= 3
        |ORDER BY support DESC NULLS LAST, pa ASC NULLS FIRST,
        |  pb ASC NULLS FIRST""".stripMargin,
    "q_rfm" ->
      """WITH per AS (SELECT o_custkey,
        |    max(o_orderdate) AS last_order, count(*) AS freq,
        |    round(sum(o_totalprice), 2) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |j AS (SELECT c_custkey, c_mktsegment, last_order, freq, monetary
        |  FROM per JOIN customer ON o_custkey = c_custkey),
        |t AS (SELECT c_custkey, c_mktsegment,
        |    ntile(4) OVER (PARTITION BY c_mktsegment
        |      ORDER BY last_order DESC, c_custkey ASC) AS r,
        |    ntile(4) OVER (PARTITION BY c_mktsegment
        |      ORDER BY freq DESC, c_custkey ASC) AS f,
        |    ntile(4) OVER (PARTITION BY c_mktsegment
        |      ORDER BY monetary DESC, c_custkey ASC) AS m
        |  FROM j)
        |SELECT c_custkey, c_mktsegment, r, f, m,
        |  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
        |    AS segment
        |FROM t
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "q_histogram" ->
      """WITH stats AS (SELECT event_type AS s_type,
        |    min(value) AS lo, max(value) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT event_type,
        |  CASE WHEN hi = lo THEN 0
        |       ELSE CAST(least(floor((value - lo) / ((hi - lo) / 10.0)), 9)
        |         AS BIGINT) END AS bin,
        |  count(*) AS n
        |FROM events JOIN stats ON event_type = s_type
        |GROUP BY event_type, bin
        |ORDER BY event_type ASC NULLS FIRST, bin ASC NULLS FIRST""".stripMargin,
    "q_anomaly" ->
      """WITH stats AS (SELECT event_type AS s_type,
        |    avg(value) AS mu, stddev_samp(value) AS sigma
        |  FROM events GROUP BY event_type)
        |SELECT event_id, event_type, value,
        |  round((value - mu) / sigma, 4) AS z
        |FROM events JOIN stats ON event_type = s_type
        |WHERE abs(round((value - mu) / sigma, 4)) > 3
        |ORDER BY event_type ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,
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
        |  CAST((sum(CAST(round(l_extendedprice * 100) AS HUGEINT) *
        |            (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |        + 50) // 100 AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#4' AND p_size <= 10
        |         AND l_quantity BETWEEN 5 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size <= 25
        |         AND l_quantity BETWEEN 20 AND 35)
        |GROUP BY p_brand
        |ORDER BY p_brand ASC NULLS FIRST""".stripMargin,
    "q_regr" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) + 0.0 AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) + 0.0
        |    AS icept,
        |  round(corr(l_extendedprice, l_quantity), 6) + 0.0 AS r,
        |  round(covar_samp(l_extendedprice, l_quantity), 4) + 0.0 AS cov
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "q_sequence" ->
      """SELECT o_orderkey,
        |  unnest(generate_series(1, o_orderkey % 5 + 1)) AS i
        |FROM orders
        |WHERE o_orderkey <= 200
        |ORDER BY o_orderkey ASC NULLS FIRST, i ASC NULLS FIRST""".stripMargin,
    "q_small_qty_revenue" ->
      """WITH pp AS (
        |  SELECT l_partkey AS pk, count(*) AS cnt, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN pp ON l_partkey = pk
        |WHERE p_brand = 'Brand#3' AND 5.0 * l_quantity * cnt < sum_qty""".stripMargin,
    "q_late_suppliers" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC NULLS LAST, s_name ASC NULLS FIRST
        |LIMIT 20""".stripMargin,
    "q_idle_customers" ->
      """WITH pool AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer
        |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')),
        |thr AS (
        |  SELECT sum(bal_cents) AS sum_cents, count(*) AS cnt
        |  FROM pool WHERE bal_cents > 0)
        |SELECT c_mktsegment, count(*) AS numcust,
        |  round(sum(c_acctbal), 2) AS totacctbal
        |FROM pool, thr
        |WHERE bal_cents * cnt > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin,
    "q_part_share" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
        |      * 10000) AS BIGINT)) AS BIGINT) AS r4
        |  FROM lineitem GROUP BY l_partkey),
        |tot AS (SELECT CAST(sum(r4) AS HUGEINT) AS t4, count(*) AS n
        |  FROM rev)
        |SELECT l_partkey, round(r4 / 100.0) / 100.0 AS revenue
        |FROM rev CROSS JOIN tot
        |WHERE CAST(r4 AS HUGEINT) * n * 4 > t4 * 5
        |ORDER BY revenue DESC NULLS LAST, l_partkey ASC NULLS FIRST""".stripMargin,
    "q_top_supplier" ->
      """WITH srev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
        |      * 10000) AS BIGINT)) AS BIGINT) AS r4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, round(r4 / 100.0) / 100.0 AS total_rev
        |FROM supplier JOIN srev ON s_suppkey = l_suppkey
        |WHERE r4 = (SELECT max(r4) FROM srev)
        |ORDER BY s_suppkey ASC NULLS FIRST""".stripMargin,
    "q_local_revenue" ->
      """SELECT n_name,
        |  CAST((sum(CAST(round(l_extendedprice * 100) AS HUGEINT) *
        |            (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |        + 50) // 100 AS DOUBLE) / 100.0 AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS FIRST""".stripMargin,
    "q_returned_items" ->
      """SELECT c_custkey, c_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  round(c_acctbal, 2) AS acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC NULLS LAST, c_custkey ASC NULLS FIRST
        |LIMIT 20""".stripMargin,
    "q_trade_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS yr,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS volume
        |FROM lineitem, orders, supplier, customer, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND o_custkey = c_custkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
        |GROUP BY supp_nation, cust_nation, yr
        |ORDER BY supp_nation ASC NULLS FIRST, cust_nation ASC NULLS FIRST,
        |  yr ASC NULLS FIRST""".stripMargin,
    "q_product_profit" ->
      """SELECT n_name, year(o_orderdate) AS yr,
        |  round(sum(l_extendedprice * (1.0 - l_discount)
        |    - p_retailprice * l_quantity), 4) AS profit
        |FROM lineitem, part, supplier, orders, nation
        |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE '%red%'
        |GROUP BY n_name, yr
        |ORDER BY n_name ASC NULLS FIRST, yr DESC NULLS LAST""".stripMargin,
  )
}
