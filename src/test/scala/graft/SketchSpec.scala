package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The 100 TB approximation path (SURVEY §2.4 A5/A8: sketches for
  * exploration, exact reserved for oracles), the per-key UDF
  * parameterization boundary (X2), and the trivial line IO (S5/S12).
  */
class SketchSpec extends SparkSuite with Matchers {

  test("encoding gate flags replacement chars, control chars, and mojibake runs (L66)") {
    import spark.implicits._
    // the shipped corpus is clean ASCII, so the oracle rows all pass;
    // the detection arithmetic is pinned here on crafted damage
    val docs = Seq(
      (1L, "clean ascii text with nothing wrong at all"),
      (2L, "bad transcode �� here"), // U+FFFD tombstones
      (3L, "ctl\u0001\u0002\u0003x"), // 3 C0 chars in 7 → ratio rule
      (4L, "prose with " + ("é" * 25) + " run"), // mojibake run
      (5L, "tabs\tand\nnewlines are fine"), // excluded control chars
      (6L, "café naïve résumé ok")) // short runs pass
      .toDF("doc_id", "text")
    val out = graft.ops.Text.encodingGate(docs)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Int, Int)].collect()
    out(0) shouldBe ((1L, 0L, 0L, 0L, 0, 1))
    out(1) shouldBe ((2L, 2L, 0L, 2L, 1, 0)) // U+FFFD is also non-ASCII
    out(2) shouldBe ((3L, 0L, 3L, 0L, 2, 0))
    out(3) shouldBe ((4L, 0L, 0L, 25L, 4, 0))
    out(4) shouldBe ((5L, 0L, 0L, 0L, 0, 1))
    out(5) shouldBe ((6L, 0L, 0L, 1L, 0, 1))
  }

  test("approx_count_distinct (HLL++) lands within 5% of exact (A5)") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val (exact, approx) = li.agg(
      countDistinct($"l_partkey"), approx_count_distinct($"l_partkey", 0.05))
      .as[(Long, Long)].head()
    math.abs(approx - exact).toDouble / exact should be <= 0.05
  }

  test("percentile_approx tracks the exact percentile (A8)") {
    import spark.implicits._
    val c = Tables.customer(spark, sf)
    val (exact, approx) = c.agg(
      percentile($"c_acctbal", lit(0.5)),
      percentile_approx($"c_acctbal", lit(0.5), lit(10000)))
      .as[(Double, Double)].head()
    // percentile_approx returns an observed value; must be within the
    // local neighborhood of the interpolated exact median
    val spread = c.agg(max($"c_acctbal") - min($"c_acctbal")).as[Double].head()
    math.abs(approx - exact) should be <= spread * 0.02
  }

  test("stratified sampleBy hits per-stratum fractions and is seed-deterministic") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val fractions = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 1.0)
    val s1 = docs.stat.sampleBy("lang", fractions, seed = 42L)
    val s2 = docs.stat.sampleBy("lang", fractions, seed = 42L)
    // same seed + same input layout → identical sample (replayable mix)
    s1.select($"doc_id").as[Long].collect().sorted shouldBe
      s2.select($"doc_id").as[Long].collect().sorted
    val total = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val got = s1.groupBy($"lang").count().as[(String, Long)].collect().toMap
    // Bernoulli sampling: observed rate within a loose band per stratum
    fractions.foreach { case (lang, f) =>
      val n = total.getOrElse(lang, 0L)
      if (n > 20)
        got.getOrElse(lang, 0L).toDouble / n shouldBe f +- 0.25
    }
    // languages not in the fraction map are dropped entirely
    got.keySet.diff(fractions.keySet) shouldBe empty
  }

  test("count-min sketch over-estimates but never under-estimates a hot key") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val cms = ev.stat.countMinSketch($"event_type", eps = 0.001, confidence = 0.99, seed = 7)
    val exact = ev.groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      est should be >= c // CMS guarantee: never undercounts
      est should be <= c + (0.001 * n).toLong // and within eps*n over
    }
  }

  test("bloom filter has no false negatives on the keys it saw") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
    val bf = orders.stat.bloomFilter($"o_custkey", expectedNumItems = 2000, fpp = 0.01)
    val present = orders.select($"o_custkey").distinct()
      .as[Long].collect()
    present.foreach(k => bf.mightContain(k) shouldBe true)
    // and the fpp bound holds loosely on keys that were never inserted
    val absent = (1000000L to 1002000L).filterNot(present.toSet)
    val fp = absent.count(bf.mightContain)
    fp.toDouble / absent.size should be <= 0.05
  }

  test("per-key UDF parameterization via broadcast map (X2, manager.py:331-336)") {
    import spark.implicits._
    // streamlink_args: per-stream extra argv consulted inside the UDF
    val perKeyArgs = spark.sparkContext.broadcast(
      Map("clicks" -> "--fast", "errors" -> "--retry"))
    val argvOf = udf((key: String) =>
      Seq("download", key) ++ perKeyArgs.value.get(key).toSeq)
    val out = Seq("clicks", "errors", "views").toDF("key")
      .select($"key", argvOf($"key").as("argv"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    out("clicks") shouldBe Seq("download", "clicks", "--fast")
    out("views") shouldBe Seq("download", "views") // no override → defaults
  }

  test("line-oriented text source and timestamped log sink (S5/S12)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_txt").toString
    Files.write(java.nio.file.Paths.get(dir, "readydir-list.txt"),
      "a.mkv\nb.mkv\n\nc.mkv".getBytes("UTF-8"))
    val lines = spark.read.text(s"$dir/readydir-list.txt")
      // functions.length is shadowed by Matchers.length in test scope
      .filter(org.apache.spark.sql.functions.length(trim($"value")) > 0)
    lines.count() shouldBe 3L
    // log sink: ISO-timestamped lines (convert.sh:12-15's log())
    val logDir = s"$dir/log"
    lines.select(concat(
      date_format(lit("2024-01-02T03:04:05").cast("timestamp"),
        "yyyy-MM-dd'T'HH:mm:ss"),
      lit(" converting "), $"value").as("value"))
      .coalesce(1).write.text(logDir)
    val logged = spark.read.text(logDir).as[String].collect()
    logged should have size 3
    logged.foreach(_ should startWith("2024-01-02T03:04:05 converting "))
  }

  test("native graft_simhash63 is bit-identical to the SQL explode formulation") {
    import spark.implicits._
    val fast = graft.ops.Text.simhashSigs63(spark, sf)
      .as[(Long, Long)].collect().toMap
    val ref = graft.ops.Text.simhashSigs63Sql(spark, sf)
      .as[(Long, Long)].collect().toMap
    fast.keySet shouldBe ref.keySet
    fast.foreach { case (id, sig) => sig shouldBe ref(id) }
    fast.values.foreach(_ should be >= 0L) // 63-bit: never negative
  }

  test("native graft_minhash20 is bit-identical to the SQL explode+agg formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // SQL reference: the explode + 20×min() hash-agg form (still the
    // DuckDB oracle of q_minhash_est)
    def bh(i: Int) = min((lit(2000003L + 104729L * i) * $"x"
      + lit(15485863L * i + 17L)) % lit(1000000007L)).as(s"v$i")
    def mh(i: Int) = min((lit(1000003L + 7919L * i) * $"x"
      + lit(7907L * i + 13L)) % lit(1000000007L)).as(s"v${i + 4}")
    val ref = graft.Tables.documents(spark, sf)
      .select($"doc_id", explode(split(trim(lower($"text")), " +")).as("tok"))
      .withColumn("x",
        conv(substring(sha2($"tok", 256), 1, 7), 16, 10).cast("long"))
      .groupBy($"doc_id")
      .agg(bh(0), (Seq(1, 2, 3).map(bh) ++ (0 until 16).map(mh)): _*)
      .select($"doc_id", array((0 until 20).map(i => col(s"v$i")): _*).as("mh"))
      .as[(Long, Seq[Long])].collect().toMap
    val fast = graft.Tables.documents(spark, sf)
      .select($"doc_id",
        expr("graft_minhash20(split(trim(lower(text)), ' +'))").as("mh"))
      .as[(Long, Seq[Long])].collect().toMap
    fast.keySet shouldBe ref.keySet
    fast.foreach { case (id, sig) => sig shouldBe ref(id) }
  }

  test("graft_minhash20 of an empty/all-null array is NULL, not an NPE") {
    // ADVICE r6: defineCodeGen never set ev.isNull, so under
    // whole-stage codegen the null signature reached downstream
    // consumers as a non-null ArrayData. The projection + element_at
    // below exercises exactly that generated path.
    val out = spark.sql(
      """SELECT element_at(graft_minhash20(a), 1) AS h FROM VALUES
        |  (array('tok')), (array()), (array(CAST(NULL AS STRING)))
        |  AS t(a)""".stripMargin).collect()
    assert(out.length == 3)
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }
}
