package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, time-series reconstruction, sessionization
  * (SURVEY.md §2.5, T6/T8/W2) and the as-of join (J9).
  *
  * All timestamp outputs are epoch-microsecond longs (`unix_micros`) —
  * exact integers on both engines, immune to the ns/µs parquet
  * mismatch documented in SURVEY.md §7.4.
  *
  * Scale doctrine: every window here is partitioned by a key
  * (user_id) — Spark shuffles once on the key and sorts within
  * partitions; there are no global (unpartitioned) windows, which
  * would serialize on a single task at 100 TB.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  /** W1 — ordered sequence numbering per key (retry files indexed
    * 0..retry_id and replayed in order, manager.py:413-415). */
  def qRowNumber(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .select($"event_id", $"user_id", $"rn")
      .orderBy($"event_id".asc_nulls_first)
  }

  /** W3 — ranking family: rank / dense_rank / ntile with a total
    * order inside each partition (ties broken on key) so every rank
    * is deterministic. */
  def qRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment",
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy($"c_custkey".asc_nulls_first)
  }

  /** W4 — frame-spec aggregates: rolling 4-row sum + running total
    * per key. Rounded: windowed double sums reassociate differently
    * across engines (DuckDB uses segment trees). */
  def qRollingSum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, dir)
      .select($"event_id",
        round(sum($"value").over(w.rowsBetween(-3, 0)), 4).as("roll4"),
        round(sum($"value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4)
          .as("running"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** W5 — generic top-k per group: row_number over a
    * (key-partitioned) window then rank ≤ k. One shuffle on the group
    * key; ties broken by the unique order key so the cut is
    * deterministic on any engine. */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(spark, dir)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice",
        row_number().over(w).as("rk"))
      .filter($"rk" <= 3)
      .orderBy($"o_orderpriority".asc_nulls_first, $"rk".asc_nulls_first)
  }

  /** W4 — time-RANGE frame: events in the trailing hour per user
    * (RANGE, not ROWS: the frame is bounded by the µs ORDER BY value,
    * so ties and irregular spacing are handled by time, not row
    * position). count() keeps it integer-exact on both engines. */
  def qRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-3600000000L, 0L) // trailing 1 h in µs
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros($"ts"))
      .select($"event_id", count(lit(1)).over(w).as("n_last_hour"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** W2 — packet-timeline reconstruction (convert.sh:60-65: recover
    * wallclock for any moment, robust to gaps): lag + gap detection
    * on the event stream. Gaps are exact µs-long arithmetic. */
  def qPacketTimeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("gap_us", $"ts_us" - lag($"ts_us", 1).over(w))
      .select($"event_id", $"user_id", $"ts_us", $"gap_us",
        when($"gap_us" > 3600L * 1000000L, lit(1)).otherwise(lit(0)).as("is_gap"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** T6+T8 — gap sessionization through the NATIVE `session_window`
    * aggregate in batch mode (r16, closing the last daylight between
    * the batch analog and the streaming primitive): the same
    * 30-minute-gap semantics qSessionize derives with lag + running
    * sum, expressed via the primitive a streaming job would use, so
    * both paths share one definition. Boundary semantics (pinned on
    * a crafted frame in StreamBatchParitySpec): end is the EXCLUSIVE
    * window end (last event + gap, Spark's [start, end) contract)
    * rather than qSessionize's last event, and a gap of EXACTLY
    * 30 min still MERGES — sessions merge when the new event's start
    * ≤ the current window end, the same inclusive rule as
    * qSessionize's `> gap` split.
    * Integer-only output (ids, micros, counts — zero tie surface).
    * Plan: ONE shuffle on user_id, sessions merged within partitions
    * (UpdatingSessions + merging agg) — the same single-shuffle
    * contract as qSessionize's window pair. NOT in the oracle
    * registry: the r15 verdict's shipping condition was a measured
    * ≤0.5 s suite cost, and it measured 0.90 s standalone-min
    * (PLANS.md r16 ledger) — the oracle at sf0.01 passed before the
    * withdrawal, and StreamBatchParitySpec pins the semantics
    * (including the exactly-gap boundary) at zero bench cost. */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        unix_micros($"sw.start").as("start_us"),
        unix_micros($"sw.end").as("end_us"),
        $"n_events")
      .orderBy($"user_id".asc_nulls_first, $"start_us".asc_nulls_first)
  }

  /** T6 — sessionization: session identity = (key, start) with a new
    * session after a >30 min silence (the manager's per-(stream,
    * datestr) capture-session naming, manager.py:295-309). Batch
    * formulation: flag-new + running sum = session index. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("prev_us", lag($"ts_us", 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull || ($"ts_us" - $"prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_idx")
      .agg(count(lit(1)).as("n_events"),
        min($"ts_us").as("start_us"), max($"ts_us").as("end_us"))
      .orderBy($"user_id".asc_nulls_first, $"session_idx".asc_nulls_first)
  }

  /** T8 — tumbling window aggregation (batch analog of streaming
    * window(); the oracle uses date_trunc, identical for 1-hour
    * tumbling with zero offset). */
  def qTumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
      .select(unix_micros($"w.start").as("bucket_us"), $"event_type", $"n", $"sum_value")
      .orderBy($"bucket_us".asc_nulls_first, $"event_type".asc_nulls_first)
  }

  /** T8 — sliding window aggregation: 1-hour windows every 15 min,
    * so each event contributes to exactly 4 overlapping buckets.
    * Spark's window() generates the 4 rows per event inside the
    * project (no self-join); the shuffle is the window-start group
    * key, 4× input rows — linear, scale-safe. */
  def qSlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
      .select(unix_micros($"w.start").as("bucket_us"), $"n", $"sum_value")
      .orderBy($"bucket_us".asc_nulls_first)
  }

  /** F2 — date_trunc calendar bucketing (ISO datestr handling in the
    * reference, manager.py:296 / convert.sh:41). */
  def qDateTrunc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"))
      .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"month".asc_nulls_first)
  }

  /** J9 — as-of join: each probe event matched to the latest anchor
    * event at-or-before it per key (the packet-dump's "wallclock for
    * any moment" lookup, convert.sh:60-62). Spark has no native ASOF:
    * the scalable formulation is union both sides, one window pass,
    * `last(_, ignoreNulls)` carries the most recent anchor forward —
    * one shuffle on the key, no correlated per-row scans.
    * Anchors are pre-deduped to one per (key, ts) so ties are
    * well-defined; on probe==anchor timestamp the anchor sorts first
    * (kind 0 < kind 1), making "at-or-before" inclusive. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).withColumn("ts_us", unix_micros($"ts"))
    val probes = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts_us",
        lit(1).as("kind"), lit(null).cast("long").as("a_ts"),
        lit(null).cast("double").as("a_value"))
    val anchors = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts_us")
      .agg(max($"value").as("a_value"))
      .select(lit(null).cast("long").as("event_id"), $"user_id", $"ts_us",
        lit(0).as("kind"), $"ts_us".as("a_ts"), $"a_value")
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts_us".asc, $"kind".asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // ts and value ride ONE struct so they always come from the same
    // anchor row — independent last() passes would desynchronize when
    // the nearest anchor carries a NULL value (ignoreNulls would skip
    // to an older anchor's value while keeping the newer timestamp)
    val anchor = when($"a_ts".isNotNull, struct($"a_ts".as("ts"), $"a_value".as("value")))
    probes.unionByName(anchors)
      .withColumn("m", last(anchor, ignoreNulls = true).over(w))
      .filter($"kind" === 1)
      .select($"event_id", $"user_id", $"ts_us",
        $"m.ts".as("m_ts"), round($"m.value", 6).as("m_value"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** J9+ — NEAREST-direction as-of (pandas merge_asof
    * direction='nearest'): each probe matched to the closest anchor
    * in EITHER direction per key, ties to the earlier anchor. Same
    * union-both-sides shape as q_asof_join with two window passes
    * over one shuffle — `last(ignoreNulls)` carries the
    * at-or-before anchor forward, `first(ignoreNulls)` over the
    * mirrored frame carries the at-or-after anchor backward — then a
    * branchless min-gap pick. Still no correlated scans, still one
    * exchange on the key. */
  def qAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).withColumn("ts_us", unix_micros($"ts"))
    val probes = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts_us",
        lit(1).as("kind"), lit(null).cast("long").as("a_ts"),
        lit(null).cast("double").as("a_value"))
    val anchors = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts_us")
      .agg(max($"value").as("a_value"))
      .select(lit(null).cast("long").as("event_id"), $"user_id", $"ts_us",
        lit(0).as("kind"), $"ts_us".as("a_ts"), $"a_value")
    // backward pass: anchors sort BEFORE a same-ts probe → inclusive
    val wb = Window.partitionBy($"user_id")
      .orderBy($"ts_us".asc, $"kind".asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // forward pass: probe first at equal ts (kind desc) → inclusive
    val wf = Window.partitionBy($"user_id")
      .orderBy($"ts_us".asc, $"kind".desc)
      .rowsBetween(0, Window.unboundedFollowing)
    // as in qAsofJoin: each direction carries ONE struct so timestamp
    // and value can never come from different anchor rows
    val anchor = when($"a_ts".isNotNull, struct($"a_ts".as("ts"), $"a_value".as("value")))
    val both = probes.unionByName(anchors)
      .withColumn("b", last(anchor, ignoreNulls = true).over(wb))
      .withColumn("f", first(anchor, ignoreNulls = true).over(wf))
      .filter($"kind" === 1)
    val pickB = $"f".isNull ||
      ($"b".isNotNull && ($"ts_us" - $"b.ts") <= ($"f.ts" - $"ts_us"))
    both
      .select($"event_id", $"user_id", $"ts_us",
        when(pickB, $"b.ts").otherwise($"f.ts").as("m_ts"),
        round(when(pickB, $"b.value").otherwise($"f.value"), 6).as("m_value"))
      .orderBy($"event_id".asc_nulls_first)
  }

  /** W4+F2 — month-over-month growth: aggregate to the month grain
    * FIRST, then lag over the month series per segment — the window
    * input is months×segments rows, never orders; growth is a ratio
    * of exact decimal sums rounded at 4. The classic reporting shape
    * (aggregate → lag → delta) that naive implementations write as a
    * self-join on month−1. */
  def qMomGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority".as("prio"),
        date_trunc("month", $"o_orderdate").cast("date").as("month"))
      .agg(sum($"o_totalprice").as("total"))
    val w = Window.partitionBy($"prio").orderBy($"month".asc)
    monthly
      .withColumn("prev", lag($"total", 1).over(w))
      .select($"prio", $"month", round($"total", 2).as("total"),
        // + 0.0: a one-cent month-over-month dip divides below the
        // 4dp resolution and rounds to -0.0 in DuckDB
        (round($"total" / $"prev" - 1, 4) + lit(0.0)).as("mom_growth"))
      .orderBy($"prio".asc_nulls_first, $"month".asc_nulls_first)
  }

  /** F2+U4 — time-series gap detection: generate the full date spine
    * from the observed min..max and anti-join the days that actually
    * occur — the data-quality check behind "which days are missing
    * from the feed?". The spine is one row per DAY (tiny at any
    * corpus scale — a century is ~37k rows), built with
    * explode(sequence); the anti join hashes on the date. */
  def qMissingDays(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.orders(spark, dir).select($"o_orderdate".as("d"))
    val spine = days.agg(min($"d").as("mn"), max($"d").as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
    spine.join(days.distinct(), $"day" === $"d", "left_anti")
      .orderBy($"day".asc_nulls_first)
  }

  /** W1+F2 — islands: group each user's event DAYS into runs of
    * consecutive days (start, end, length) via the classic
    * day − row_number trick — the grouping key is constant within a
    * run and needs no self-join or lag-chain; one window + one agg,
    * both keyed by user. */
  def qIslands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, dir)
      .select($"user_id", date_trunc("day", $"ts").cast("date").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day".asc)
    days
      .withColumn("grp", date_sub($"day", row_number().over(w)))
      .groupBy($"user_id", $"grp")
      .agg(min($"day").as("run_start"), max($"day").as("run_end"),
        count(lit(1)).as("run_len"))
      .select($"user_id", $"run_start", $"run_end", $"run_len")
      .orderBy($"user_id".asc_nulls_first, $"run_start".asc_nulls_first)
  }

  /** A25 — session bounce rate: per user, the share of sessions with
    * exactly ONE event — the engagement-quality metric read off the
    * T6 sessionization. Same derivation as q_sessionize (user-keyed
    * lag window + running session index — one shuffle on user_id),
    * rolled up twice: session grain, then user grain. All integers
    * until the final rounded ratio. */
  def qBounceRate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("prev_us", lag($"ts_us", 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull || ($"ts_us" - $"prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_idx")
      .agg(count(lit(1)).as("n_events"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(($"n_events" === 1).cast("long")).as("n_bounces"))
      .withColumn("bounce_rate", round($"n_bounces" / $"n_sessions", 4))
      .orderBy($"user_id".asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "q_bounce_rate" -> (qBounceRate _),
    "q_missing_days" -> (qMissingDays _),
    "q_islands" -> (qIslands _),
    "q_mom_growth" -> (qMomGrowth _),
    "q_row_number" -> (qRowNumber _),
    "q_rank" -> (qRank _),
    "q_rolling_sum" -> (qRollingSum _),
    "q_range_frame" -> (qRangeFrame _),
    "q_topk_per_group" -> (qTopkPerGroup _),
    "q_packet_timeline" -> (qPacketTimeline _),
    "q_sessionize" -> (qSessionize _),
    "q_tumbling_window" -> (qTumblingWindow _),
    "q_sliding_window" -> (qSlidingWindow _),
    "q_date_trunc" -> (qDateTrunc _),
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_nearest" -> (qAsofNearest _),
  )

  /** DuckDB note: events.ts is TIMESTAMP_NS there; CAST(ts AS
    * TIMESTAMP) truncates to µs = Spark's read. epoch_us() gives the
    * same integers as unix_micros(). */
  val oracles: Map[String, String] = Map(
    "q_bounce_rate" ->
      """WITH e AS (SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |f AS (SELECT *,
        |  CASE WHEN lag(ts_us, 1) OVER w IS NULL
        |         OR ts_us - lag(ts_us, 1) OVER w > 1800000000 THEN 1 ELSE 0 END
        |    AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)),
        |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |  ORDER BY ts_us ASC, event_id ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM f),
        |g AS (SELECT user_id, session_idx, count(*) AS n_events
        |  FROM s GROUP BY user_id, session_idx)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounces,
        |  round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) / count(*), 4)
        |    AS bounce_rate
        |FROM g GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "q_row_number" ->
      """SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS rn
        |FROM events
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_rank" ->
      """SELECT c_custkey, c_mktsegment,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_orderpriority ASC NULLS FIRST, rk ASC NULLS FIRST""".stripMargin,
    "q_range_frame" ->
      """SELECT event_id,
        |  count(*) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_rolling_sum" ->
      """SELECT event_id,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS roll4,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running
        |FROM events
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_packet_timeline" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events)
        |SELECT event_id, user_id, ts_us,
        |  ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
        |    AS gap_us,
        |  CASE WHEN ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts_us ASC, event_id ASC) > 3600000000 THEN 1 ELSE 0 END AS is_gap
        |FROM e
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |f AS (SELECT *,
        |  CASE WHEN lag(ts_us, 1) OVER w IS NULL
        |         OR ts_us - lag(ts_us, 1) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)),
        |s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |  ORDER BY ts_us ASC, event_id ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM f)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id ASC NULLS FIRST, session_idx ASC NULLS FIRST""".stripMargin,
    "q_tumbling_window" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS bucket_us,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY bucket_us, event_type
        |ORDER BY bucket_us ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,
    "q_sliding_window" ->
      """WITH e AS (SELECT
        |    epoch_us(time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))) AS b_us,
        |    value
        |  FROM events),
        |w AS (SELECT b_us - k * 900000000 AS bucket_us, value
        |  FROM e, generate_series(0, 3) s(k))
        |SELECT bucket_us, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM w GROUP BY bucket_us
        |ORDER BY bucket_us ASC NULLS FIRST""".stripMargin,
    "q_date_trunc" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY month
        |ORDER BY month ASC NULLS FIRST""".stripMargin,
    "q_missing_days" ->
      """WITH b AS (SELECT min(o_orderdate) AS mn, max(o_orderdate) AS mx
        |  FROM orders),
        |spine AS (SELECT CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |seen AS (SELECT DISTINCT o_orderdate AS d FROM orders)
        |SELECT day FROM spine
        |WHERE NOT EXISTS (SELECT 1 FROM seen WHERE d = day)
        |ORDER BY day ASC NULLS FIRST""".stripMargin,
    "q_islands" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |  FROM events),
        |g AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day ASC)
        |      * INTERVAL 1 DAY AS grp
        |  FROM days)
        |SELECT user_id, min(day) AS run_start, max(day) AS run_end,
        |  count(*) AS run_len
        |FROM g GROUP BY user_id, grp
        |ORDER BY user_id ASC NULLS FIRST, run_start ASC NULLS FIRST""".stripMargin,
    "q_mom_growth" ->
      """WITH m AS (SELECT o_orderpriority AS prio,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    sum(o_totalprice) AS total
        |  FROM orders GROUP BY prio, month)
        |SELECT prio, month, round(total, 2) AS total,
        |  round(total / lag(total, 1) OVER
        |    (PARTITION BY prio ORDER BY month ASC) - 1, 4) + 0.0
        |    AS mom_growth
        |FROM m
        |ORDER BY prio ASC NULLS FIRST, month ASC NULLS FIRST""".stripMargin,
    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |probes AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'error'),
        |anchors AS (SELECT user_id, ts_us, max(value) AS a_value
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts_us)
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  (SELECT max(a.ts_us) FROM anchors a
        |    WHERE a.user_id = p.user_id AND a.ts_us <= p.ts_us) AS m_ts,
        |  round((SELECT a.a_value FROM anchors a
        |    WHERE a.user_id = p.user_id AND a.ts_us =
        |      (SELECT max(a2.ts_us) FROM anchors a2
        |        WHERE a2.user_id = p.user_id AND a2.ts_us <= p.ts_us)), 6) AS m_value
        |FROM probes p
        |ORDER BY p.event_id ASC NULLS FIRST""".stripMargin,
    "q_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |probes AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'error'),
        |anchors AS (SELECT user_id, ts_us, max(value) AS a_value
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts_us)
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  (SELECT a.ts_us FROM anchors a WHERE a.user_id = p.user_id
        |    ORDER BY abs(a.ts_us - p.ts_us) ASC, a.ts_us ASC LIMIT 1) AS m_ts,
        |  round((SELECT a.a_value FROM anchors a WHERE a.user_id = p.user_id
        |    ORDER BY abs(a.ts_us - p.ts_us) ASC, a.ts_us ASC LIMIT 1), 6)
        |    AS m_value
        |FROM probes p
        |ORDER BY p.event_id ASC NULLS FIRST""".stripMargin,
  )
}
