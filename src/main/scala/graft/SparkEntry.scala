package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Joins.qMultiwayJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * Each ops module owns its queries + oracle SQL; this aggregates. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Joins.queries ++ Windows.queries ++
      Semi.queries ++ Text.queries ++ Similarity.queries ++
      Analytics.queries ++ Corpus.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Joins.oracles ++ Windows.oracles ++
      Semi.oracles ++ Text.oracles ++ Similarity.oracles ++
      Analytics.oracles ++ Corpus.oracles
}
