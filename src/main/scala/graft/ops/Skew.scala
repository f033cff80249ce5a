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
}
