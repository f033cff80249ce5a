package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    val sizes = df.groupBy(col(key)).agg(count(lit(1)).as("__gsz"))
    // one co-partitioned shuffle join tags every row with its group
    // size; materialized once so the four branch scans below do not
    // recompute the size aggregate
    val tagged = df.join(sizes, key).localCheckpoint(eager = false)
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
}
