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
}
