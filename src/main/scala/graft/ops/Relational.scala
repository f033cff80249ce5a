package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch relational operators (SURVEY.md §2.1–2.7).
  *
  * Conventions (SURVEY.md §5.2 determinism rules):
  *  - every query ends in a total ORDER BY with explicit null ordering;
  *  - double aggregates that reassociate across partitions are rounded;
  *  - no rand()/current_timestamp.
  *
  * Scale notes are per-function; the general rules live in SURVEY.md
  * §4.3 (partition facts by date, broadcast dims, AQE on).
  */
object Relational {

  /** M0 flagship: TPC-H Q1-shaped pricing summary.
    * lineitem → filter shipdate → hash-agg (partial+final, map-side
    * combine is free) → tiny sorted result. At 100 TB: the filter and
    * the 4-column projection push into the parquet scan; the agg output
    * is ~|flags|×|status| rows, so the final shuffle is negligible.
    */
  def qPricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 6).as("avg_qty"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }
}
