package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: dissect q_edit_distance's cost — pair join without the
  * DP vs with it, warm runs. runMain graft.tools.EditDistProbe [sfDir] */
object EditDistProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local()
    import spark.implicits._
    def docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"source",
        substring($"text", 1, 40).as("pfx"))
    def a = docs.select($"doc_id".as("da"), $"lang".as("la"),
      $"source".as("sa"), $"pfx".as("pa"))
    def b = docs.select($"doc_id".as("db"), $"lang".as("lb"),
      $"source".as("sb"), $"pfx".as("pb"))
    def time(tag: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }
    time("pairs-only") {
      a.join(b, $"sa" === $"sb" && $"la" === $"lb" && $"da" < $"db")
        .count()
    }
    time("pairs+lev") {
      a.join(b, $"sa" === $"sb" && $"la" === $"lb" && $"da" < $"db")
        .withColumn("dist", levenshtein($"pa", $"pb", 10))
        .filter($"dist" >= 0).count()
    }
    time("pairs+lev+rr") {
      a.repartition(spark.sparkContext.defaultParallelism)
        .join(b, $"sa" === $"sb" && $"la" === $"lb" && $"da" < $"db")
        .withColumn("dist", levenshtein($"pa", $"pb", 10))
        .filter($"dist" >= 0).count()
    }
    time("pairs+lev+repart") {
      a.repartition($"sa", $"la")
        .join(b, $"sa" === $"sb" && $"la" === $"lb" && $"da" < $"db")
        .withColumn("dist", levenshtein($"pa", $"pb", 10))
        .filter($"dist" >= 0).count()
    }
    time("full-query") {
      graft.ops.Corpus.queries("q_edit_distance")(spark, sfDir).count()
    }
    spark.stop()
  }
}
