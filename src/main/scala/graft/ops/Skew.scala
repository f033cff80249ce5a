package graft.ops

import graft.Ckpt
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §4.3: "skewed keys → salting
  * or AQE skew-join").
  *
  * AQE's skew-join splitting (on by default in Spark 4) handles
  * skewed SHUFFLE JOINS at runtime; what it cannot fix is a skewed
  * AGGREGATION where one hot key funnels into one reducer. The
  * classic fix is two-phase salting: spray the hot key across
  * `salts` sub-keys, partially aggregate, then merge the partials —
  * turning one straggler task into `salts` parallel ones at the cost
  * of a second (tiny) shuffle over |keys|×salts rows.
  *
  * Deterministic salt (hash-based, not rand()) so replays/retries
  * produce identical partials — required for exactly-once sinks.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts). Derived from a
    * secondary column so rows of the same hot key spread. */
  def saltOf(c: Column, salts: Int): Column = pmod(hash(c), lit(salts))

  /** Two-phase salted count+sum per key: equivalent to
    * `df.groupBy(key).agg(count, sum)` but with the hot-key reduce
    * fanned out `salts` ways. */
  def saltedAgg(df: DataFrame, key: String, valueCol: String, spreadCol: String,
                salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", saltOf(col(spreadCol), salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("s"))
  }

  /** Salted equi join for a skewed FACT key against a dimension too
    * big to broadcast but small enough to replicate `salts`×: the
    * fact side gets a deterministic salt, the dim side is exploded
    * across all salt values, and the join key becomes (key, salt) —
    * one hot key's rows land on `salts` reducers instead of one.
    * Equivalent to `fact.join(dim, key)` for any fanout. (AQE's
    * skew-join split covers most cases at runtime; this is the
    * explicit form for when a single key exceeds what one task can
    * hold, or when AQE is off — e.g. inside streaming queries, where
    * Spark disables it.) */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 spreadCol: String, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltOf(col(spreadCol), salts))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Size-adaptive ORDERED SELF-PAIR enumeration within a group key:
    * every (a, b) row pair sharing `key` with a.`id` < b.`id`, each
    * emitted exactly once. This is the quadratic surface of every
    * blocked/banded dedup (Σ|group|² pairs) — and its skew hazard:
    * a plain self-join puts one dense group's M² fan-out on ONE task
    * (AQE's skew-join split cannot help — the blowup is inside one
    * join key's OUTPUT, not across keys; the sf0.1 corpus has a
    * 2 272-doc LSH band whose 2.58M pairs are 91% of the surface).
    *
    * Groups ≤ `cap` take the plain co-partitioned self-join; bigger
    * groups take the salted path — the left side replicated across
    * all `salts` sub-keys, the right side salted deterministically by
    * id hash, join key (key, salt) — so each pair is still emitted
    * exactly once (at the right row's salt) but a dense group's M²
    * generation spreads over `salts` tasks at ~M²/salts each, for a
    * `salts`× replication cost paid ONLY by oversize groups. Exact
    * at any skew — no truncation; deterministic salt so task retries
    * replay identically. (The basketPairs mechanism — SkewSpec proves
    * exactness + spread on a crafted mega-group.)
    *
    * WHEN TO USE (measured, r9): reach for this when per-pair work is
    * heavy (token intersections, score joins) or a group's pair
    * fan-out outgrows one task. When per-pair work is trivial — the
    * LSH eval family's 16 integer compares, ~0.3 s for 2.6M pairs in
    * one task at sf0.1 — the two-path plan costs MORE than it saves
    * at bench scale (~2-3 s of extra driver planning/codegen per
    * query, A/B-profiled), so those queries keep the plain self-join
    * and this stays the escape hatch for when a band outgrows a task.
    *
    * Output: the `key` column once, plus every other column of `df`
    * twice, prefixed `a_` / `b_` (caller columns must not already
    * carry those prefixes). Project `df` down to key + id + the
    * payloads you need BEFORE calling: the internal checkpoint is a
    * column-pruning barrier that materializes full row width, and
    * the salted path replicates the full left payload `salts`×. */
  def saltedSelfPairs(df: DataFrame, key: String, id: String,
                      cap: Int = 64, salts: Int = 16): DataFrame = {
    val payload = df.columns.filterNot(_ == key)
    // fail fast instead of silently emitting duplicate/ambiguous
    // output columns when a caller's payload already carries the
    // reserved pair prefixes (ADVICE r9)
    require(payload.forall(c => !c.startsWith("a_") && !c.startsWith("b_")),
      s"saltedSelfPairs: payload columns must not start with a_/b_ " +
        s"(reserved pair prefixes); got ${payload.mkString(", ")}")
    def side(p: String, d: DataFrame): DataFrame =
      payload.foldLeft(d)((acc, c) => acc.withColumnRenamed(c, p + c))
    // ONE key-partitioned count window tags every row with its group
    // size (the qDupBias one-scan shape — r15; replaces a size agg +
    // co-partitioned join, one shuffle instead of two). Safe at any
    // skew: the window computes a COUNT (linear per group), never the
    // quadratic pair surface — a mega-group counts on one task in
    // O(M), and the M² work below still takes the salted path.
    // Materialized once so the four branch scans below do not
    // recompute the window.
    val w = Window.partitionBy(col(key))
    val tagged = df.withColumn("__gsz", count(lit(1)).over(w))
      .transform(Ckpt.mat)
    val small = tagged.filter(col("__gsz") <= cap).drop("__gsz")
    val big = tagged.filter(col("__gsz") > cap).drop("__gsz")
    val out = col(key) +: payload.flatMap(c => Seq(col("a_" + c), col("b_" + c)))
    val smallPairs = side("a_", small)
      .join(side("b_", small), Seq(key))
      .filter(col("a_" + id) < col("b_" + id))
      .select(out: _*)
    val bigA = side("a_", big).withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val bigB = side("b_", big).withColumn("__salt", saltOf(col("b_" + id), salts))
    val bigPairs = bigA
      .join(bigB, Seq(key, "__salt"))
      .filter(col("a_" + id) < col("b_" + id))
      .select(out: _*)
    smallPairs.union(bigPairs)
  }

  /** Two-phase global ranking machinery for the OTHER window skew:
    * a partition key with BOUNDED cardinality (source ≈ 20, lang ≈ 5,
    * a literal) over UNBOUNDED fact/doc-grain rows. A plain
    * `row_number().over(Window.partitionBy(key))` funnels every row
    * of a key into ONE task's sort — fine at sf0.1, a single task
    * sorting billions of rows at the 100 TB design point (the same
    * single-task failure class the r11 star reduction retired from
    * the dedup family, resurfacing in WindowExec).
    *
    * Mechanism (classic distributed rank):
    *  1. `repartitionByRange(key, orderCols…)` splits each key's rows
    *     across the session's shuffle width while RESPECTING the
    *     total order — every range partition holds a contiguous slice
    *     of the (key, order) sequence, so
    *  2. a local window per (key, range-id) ranks/sums each slice —
    *     max task input = |rows| / ranges, never |rows| per key — and
    *  3. the per-(key, range) row counts (a ≤ |keys|·ranges-row
    *     table) turn into prefix offsets via a window ORDERED BY
    *     range-id (bounded by the range count, never the data), and
    *     global = local + broadcast-joined offset.
    *
    * Correctness does not depend on WHERE the sampled range
    * boundaries land (AQE may coalesce adjacent ranges freely): any
    * split that respects the total order yields the same
    * local+offset sum, and every call site orders by a TOTAL order
    * (unique tie-break column), so equal-key straddling cannot
    * reorder rows. The ranged scan is localCheckpointed so the
    * local-rank branch and the offset branch read the SAME partition
    * assignment.
    *
    * The offsets broadcast is bounded by |key values| · |ranges| —
    * deployment parameters (key cardinality is the helper's
    * contract; ranges = shuffle width), never SF — the same
    * whitelist class as centroid metadata.
    *
    * COST CONTRACT (ADVICE r12): every scalableRank/scalableCumsum
    * call materializes its ranged input ONCE via a lazy checkpoint
    * (full fact-grain row width in block-manager storage — see
    * [[graft.Ckpt]] for the local-vs-reliable trade at cluster
    * scale). That single materialization is what lets the local-rank
    * branch and the offset branch read the SAME partition assignment;
    * it is also the helper's dominant cost at the 100 TB design
    * point, so callers should PROJECT DOWN to the columns they need
    * before calling, and a chain of helper calls pays one
    * materialization per phase by design (each phase's input is the
    * previous phase's derived output — a shared ranged table cannot
    * be reused across different inputs; no production call site
    * chains today, the chains live in SkewSpec/PropertySpec).
    *
    * `__rpid` is the helper's marker column: the plan-shape sweep
    * (OpsSpec window-cardinality test) recognizes phase-2 windows by
    * it and exempts them. Caller columns must not use the helper's
    * reserved `__`-prefixed namespace — enforced here, because a
    * silent withColumn overwrite (or a query exposing a column
    * literally named __rpid, which would self-exempt from the
    * window sweep) is the ADVICE r12 collision class. */
  private def checkReserved(df: DataFrame): Unit =
    require(!df.columns.exists(_.startsWith("__")),
      s"Skew helpers reserve the __-prefixed column namespace " +
        s"(__rpid, __lrn, __off, …); got ${df.columns.mkString(", ")}")

  private def rangedByKey(df: DataFrame, keys: Seq[String],
                          order: Seq[Column]): DataFrame = {
    val ranges = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    df.repartitionByRange(ranges, keys.map(col) ++ order: _*)
      .withColumn("__rpid", spark_partition_id())
      .transform(Ckpt.mat)
  }

  /** Null-safe broadcast attach of the per-(key, range) offset table
    * back onto the ranged rows. A plain using-columns equi-join drops
    * rows whose key is NULL, whereas the single-window form (and SQL
    * PARTITION BY) keeps a NULL partition group — the ADVICE r12
    * latent-divergence class. `<=>` on the key columns keeps the
    * NULL group; `__rpid` is never null (spark_partition_id). */
  private def joinOffsets(ranged: DataFrame, offsets: DataFrame,
                          keys: Seq[String]): DataFrame = {
    val renamed = keys.zipWithIndex.foldLeft(
      offsets.withColumnRenamed("__rpid", "__orp")) {
      case (d, (k, i)) => d.withColumnRenamed(k, s"__ok$i")
    }
    val cond = keys.zipWithIndex
      .map { case (k, i) => col(k) <=> col(s"__ok$i") }
      .reduce(_ && _) && col("__rpid") === col("__orp")
    ranged.join(broadcast(renamed), cond)
      .drop("__orp" +: keys.indices.map(i => s"__ok$i"): _*)
  }

  /** Global `row_number()` per `keys` in `order` (LONG column
    * `rnCol`), computed in two phases so no task ever sorts more
    * than ~|rows|/ranges rows. `totCol`, when set, also attaches the
    * per-key total row count (the `count(*) over (partition by key)`
    * a rank-percentile pick needs — same broadcast, no extra pass).
    * `order` must be a total order (unique tie-break) for the result
    * to equal the single-window form. */
  def scalableRank(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   rnCol: String, totCol: Option[String] = None): DataFrame = {
    checkReserved(df)
    val ranged = rangedByKey(df, keys, order)
    val kc = keys.map(col)
    val counts = ranged.groupBy(kc :+ col("__rpid"): _*)
      .agg(count(lit(1)).as("__c"))
    val wKey = Window.partitionBy(kc: _*)
    val offsets0 = counts.withColumn("__off",
      coalesce(sum(col("__c")).over(wKey.orderBy(col("__rpid").asc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offsets = totCol.fold(offsets0)(t =>
      offsets0.withColumn(t, sum(col("__c")).over(wKey)))
    val localW = Window.partitionBy(kc :+ col("__rpid"): _*).orderBy(order: _*)
    joinOffsets(
      ranged.withColumn("__lrn", row_number().over(localW)),
      offsets.drop("__c"), keys)
      .withColumn(rnCol, col("__off") + col("__lrn"))
      .drop("__rpid", "__lrn", "__off")
  }

  /** Global running sum of `value` per `keys` in `order` (frame
    * = unbounded preceding → current row, inclusive), two-phase:
    * local running sums per (key, range) + broadcast per-range value
    * totals as prefix offsets. Same total-order requirement and
    * scale shape as [[scalableRank]]. */
  def scalableCumsum(df: DataFrame, keys: Seq[String], order: Seq[Column],
                     value: Column, outCol: String): DataFrame = {
    checkReserved(df)
    val ranged = rangedByKey(df.withColumn("__v", value), keys, order)
    val kc = keys.map(col)
    val sums = ranged.groupBy(kc :+ col("__rpid"): _*)
      .agg(sum(col("__v")).as("__s"))
    val offsets = sums.withColumn("__off",
      coalesce(sum(col("__s")).over(Window.partitionBy(kc: _*)
        .orderBy(col("__rpid").asc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val localW = Window.partitionBy(kc :+ col("__rpid"): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    joinOffsets(
      ranged.withColumn("__lcs", sum(col("__v")).over(localW)),
      offsets.drop("__s"), keys)
      .withColumn(outCol, col("__off") + col("__lcs"))
      .drop("__rpid", "__lcs", "__off", "__v")
  }

  /** Global `ntile(n)` per `keys` in `order` (INT column `outCol`),
    * derived arithmetically from the two-phase rank + per-key total:
    * with q = tot div n and r = tot % n, SQL ntile fills the first r
    * buckets with q+1 rows and the rest with q — so
    * bucket = ceil(rn / (q+1)) while rn ≤ r·(q+1), else
    * r + ceil((rn − r·(q+1)) / q). Pure integer math on (rn, tot);
    * exactly Spark's (and DuckDB's) NTile for any n, including
    * n > tot (every row its own bucket; the q = 0 case never reaches
    * the else branch because r·(q+1) = tot bounds rn). */
  def scalableNtile(df: DataFrame, keys: Seq[String], order: Seq[Column],
                    n: Int, outCol: String): DataFrame = {
    scalableRank(df, keys, order, "__grn", Some("__gtot"))
      .withColumn(outCol, expr(
        s"""CASE WHEN __grn <= (__gtot % $n) * ((__gtot div $n) + 1)
           |THEN (__grn + (__gtot div $n)) div ((__gtot div $n) + 1)
           |ELSE (__gtot % $n) +
           |  (__grn - (__gtot % $n) * ((__gtot div $n) + 1)
           |    + (__gtot div $n) - 1) div (__gtot div $n)
           |END""".stripMargin).cast("int"))
      .drop("__grn", "__gtot")
  }
}
