package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** §4.3 skew mitigation: the salted two-phase aggregation must be
  * value-equivalent to the direct groupBy at any salt fanout. */
class SkewSpec extends SparkSuite with Matchers {
  test("salted two-phase agg equals the direct groupBy (any salt fanout)") {
    import spark.implicits._
    val df = Tables.events(spark, sf)
    val direct = df.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .orderBy($"event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    for (salts <- Seq(1, 4, 32)) {
      val salted = Skew.saltedAgg(df, "event_type", "value", "event_id", salts)
        .orderBy($"event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      salted.map(t => (t._1, t._2)) shouldBe direct.map(t => (t._1, t._2))
      // double sums reassociate across salts: compare to relative 1e-9
      salted.zip(direct).foreach { case (a, b) =>
        a._3 shouldBe b._3 +- math.abs(b._3) * 1e-9
      }
    }
  }

  /** The aggregation-explosion half of the doctrine: AQE's skew-join
    * split cannot save a basket whose PAIR GENERATION is quadratic
    * inside one join key — q_basket_pairs' salted path must (a) keep
    * exact pair counts and (b) actually spread the mega-basket across
    * the salt space so per-task work is M²/salts, not M². */
  test("mega-basket pair build: salted path is exact and spreads the hot basket") {
    import spark.implicits._
    val m = 300 // basket of 300 items = 44 850 pairs if built on one task
    val salts = 8
    val mega = (1 to m).map(i => (1L, i.toLong))
    val smalls = Seq((2L, 1L), (2L, 2L), (2L, 3L), (3L, 1L), (3L, 2L),
      (4L, 1L), (4L, 2L), (4L, 3L))
    val items = (mega ++ smalls).toDF("l_orderkey", "l_partkey")
    val plain = items.alias("a")
      .join(items.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("support"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = graft.ops.Analytics.basketPairs(items, cap = 32, salts = salts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    salted shouldBe plain
    // spread bound: the deterministic item-hash salt puts the mega-
    // basket's right side into `salts` non-empty buckets none larger
    // than 2× the even split, so no (basket, salt) task builds more
    // than M·(2M/salts) pairs — the M² single-task blowup is gone
    val bucketSizes = items.filter($"l_orderkey" === 1L)
      .select(Skew.saltOf($"l_partkey", salts).as("s"))
      .groupBy($"s").count()
      .collect().map(_.getLong(1))
    bucketSizes.length shouldBe salts
    bucketSizes.foreach(_ should be <= (2L * m / salts))
  }

  /** The factored mechanism under basketPairs: generic ordered
    * self-pairs must carry the group key once plus a_/b_-prefixed
    * payload columns, and match the plain formulation exactly —
    * including rows in groups that straddle the small/big cap. */
  test("saltedSelfPairs: key + prefixed payloads, exact at any cap") {
    import spark.implicits._
    val rows = (1 to 40).map(i => ("g1", i.toLong, s"p$i")) ++
      Seq(("g2", 1L, "x"), ("g2", 2L, "y"), ("g3", 9L, "z"))
    val df = rows.toDF("grp", "id", "payload")
    val plain = df.alias("a")
      .join(df.alias("b"),
        col("a.grp") === col("b.grp") && col("a.id") < col("b.id"))
      .select(col("a.grp"), col("a.id"), col("b.id"),
        col("a.payload"), col("b.payload"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet
    for (cap <- Seq(2, 39, 64)) { // g1 (40 rows) big, straddling, small
      val got = Skew.saltedSelfPairs(df, "grp", "id", cap = cap, salts = 4)
      got.columns.sorted shouldBe
        Array("a_id", "a_payload", "b_id", "b_payload", "grp")
      val set = got.select(col("grp"), col("a_id"), col("b_id"),
          col("a_payload"), col("b_payload"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getString(4))).toSet
      set shouldBe plain
    }
  }

  /** The runtime half of the §4.3 doctrine: AQE detects a shuffle
    * partition dominated by one hot key AFTER the map stage runs and
    * splits it across tasks (skew=true on the join node) — no salting
    * code, no plan change, same rows. Thresholds are lowered so the
    * toy dataset trips the same detector a 100 TB hot key would. */
  /** r11 star-reduction contract (the r10 verdict's last pair-grain
    * plans): the MinHash dedup surfaces must stay LINEAR in bucket
    * size — a dense near-identical band of M docs yields exactly M−1
    * (keeper, member) edges, never the self-join's M(M−1)/2 pairs,
    * and the plan must carry no ordered-pair predicate at all (the
    * `a.doc_id < b.doc_id` raw enumeration is gone, so no single
    * task can quadratic-expand whatever the cluster density). */
  test("dense-band dedup surface is linear in cluster size (star-reduced)") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.LessThan
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def corpus(m: Int): String = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_dense$m").toString
      val dense = (1 to m).map(i => (i.toLong, "the same near dup text body"))
      val lone = Seq((9001L, "a lone document"), (9002L, "another loner"))
      (dense ++ lone).toDF("doc_id", "text")
        .write.parquet(s"$d/documents.parquet")
      d
    }
    for (m <- Seq(100, 200)) {
      val dir = corpus(m)
      val dedup = ops.Text.qMinhashDedup(spark, dir)
      val est = ops.Text.qMinhashEst(spark, dir)
      // linear surface: doubling the dense cluster doubles the edge
      // count (M−1), where the raw pair surface would quadruple it
      dedup.count() shouldBe (m - 1).toLong
      val estRows = est.collect()
      estRows.length shouldBe (m - 1)
      // identical docs agree on all 16 estimator hashes
      estRows.foreach(_.getDouble(2) shouldBe 1.0)
      // no ordered-pair join predicate anywhere in either plan
      for (df <- Seq(dedup, est)) {
        val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
        joins should not be empty
        joins.foreach { j =>
          j.condition.foreach(c =>
            assert(!c.exists(_.isInstanceOf[LessThan]),
              s"pair-enumeration predicate resurfaced: $c"))
        }
      }
    }
  }

  /** The r11 verdict's LAST systemic scale gap: bounded-cardinality
    * window partitions at unbounded row grain. The two-phase helpers
    * must be VALUE-identical to the single-window forms (row_number /
    * running sum / ntile) at any shuffle width — including widths
    * that force a key's rows across many range partitions, the case
    * the mechanism exists for. */
  test("scalableRank/Cumsum/Ntile equal the single-window forms at any shuffle width") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"lang", $"n_chars")
    val order = Seq($"n_chars".desc, $"doc_id".asc)
    val w = Window.partitionBy($"source").orderBy(order: _*)
    val direct = docs
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum($"n_chars".cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("nt7", ntile(7).over(w))
      .withColumn("nt10", ntile(10).over(w))
      // n > rows-per-source: every row its own bucket
      .withColumn("nt9999", ntile(9999).over(w))
      .withColumn("tot", count(lit(1)).over(Window.partitionBy($"source")))
      .select($"doc_id", $"rn", $"cum", $"nt7", $"nt10", $"nt9999", $"tot")
      .orderBy($"doc_id").collect().map(_.toSeq)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (parts <- Seq("3", before)) {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        val ranked = Skew.scalableRank(docs, Seq("source"), order,
          "rn", Some("tot"))
        val two = Skew.scalableNtile(
          Skew.scalableNtile(
            Skew.scalableNtile(
              Skew.scalableCumsum(ranked, Seq("source"), order,
                $"n_chars".cast("long"), "cum"),
              Seq("source"), order, 7, "nt7"),
            Seq("source"), order, 10, "nt10"),
          Seq("source"), order, 9999, "nt9999")
          .select($"doc_id", $"rn", $"cum",
            $"nt7", $"nt10", $"nt9999", $"tot")
          .orderBy($"doc_id").collect().map(_.toSeq)
        withClue(s"shuffle.partitions=$parts: ") { two shouldBe direct }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  /** NULLs in the ORDER column: repartitionByRange and WindowExec
    * must place them identically (Spark's asc = nulls first,
    * desc = nulls last — both derive from the same SortOrder), or
    * the range split would disagree with the local sort and offsets
    * would land on the wrong rows. Crafted nulls, both directions,
    * narrow width so nulls straddle range boundaries. */
  test("scalableRank/Cumsum match single windows when the order column has nulls") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (1 to 200).map { i =>
      (if (i % 3 == 0) "a" else "b",
        if (i % 5 == 0) None else Some(i % 17), i.toLong)
    }
    val df = rows.toDF("k", "v", "id")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      for (order <- Seq(Seq($"v".asc_nulls_first, $"id".asc),
                        Seq($"v".desc_nulls_last, $"id".asc))) {
        val w = Window.partitionBy($"k").orderBy(order: _*)
        val direct = df
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("cum", sum(coalesce($"v", lit(0)).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .select($"k", $"id", $"rn", $"cum")
          .orderBy($"k", $"id").collect().map(_.toSeq)
        val two = Skew.scalableCumsum(
            Skew.scalableRank(df, Seq("k"), order, "rn"),
            Seq("k"), order, coalesce($"v", lit(0)).cast("long"), "cum")
          .select($"k", $"id", $"rn", $"cum")
          .orderBy($"k", $"id").collect().map(_.toSeq)
        withClue(s"order=$order: ") { two shouldBe direct }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  /** NULLs in the KEY column (ADVICE r12): SQL PARTITION BY keeps a
    * NULL partition group, so the helpers' offset attach must be
    * null-safe — a plain equi-join would silently DROP every
    * null-key row, diverging from the single-window form (and from
    * the DuckDB oracles). Crafted null keys straddling range
    * boundaries at narrow width. */
  test("scalableRank/Cumsum keep the NULL key group like PARTITION BY does") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (1 to 200).map { i =>
      (if (i % 4 == 0) None else Some(if (i % 3 == 0) "a" else "b"),
        i % 13, i.toLong)
    }
    val df = rows.toDF("k", "v", "id")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      val order = Seq($"v".asc, $"id".asc)
      val w = Window.partitionBy($"k").orderBy(order: _*)
      val direct = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cum", sum($"v".cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("nt3", ntile(3).over(w))
        .select($"k", $"id", $"rn", $"cum", $"nt3")
        .orderBy($"k".asc_nulls_first, $"id").collect().map(_.toSeq)
      val two = Skew.scalableNtile(
          Skew.scalableCumsum(
            Skew.scalableRank(df, Seq("k"), order, "rn"),
            Seq("k"), order, $"v".cast("long"), "cum"),
          Seq("k"), order, 3, "nt3")
        .select($"k", $"id", $"rn", $"cum", $"nt3")
        .orderBy($"k".asc_nulls_first, $"id").collect().map(_.toSeq)
      two shouldBe direct
      two.size shouldBe 200 // null-key rows must not be dropped
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  /** The reserved-namespace guard (ADVICE r12): a caller column in
    * the helpers' __-prefixed marker namespace would be silently
    * overwritten (or auto-exempt the query from the window sweep),
    * so the helpers must fail fast instead. */
  test("Skew helpers reject caller columns in the reserved __ namespace") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2L)).toDF("k", "id", "__rpid")
    val e = intercept[IllegalArgumentException] {
      Skew.scalableRank(df, Seq("k"), Seq($"id".asc), "rn")
    }
    e.getMessage should include("__rpid")
    intercept[IllegalArgumentException] {
      Skew.scalableCumsum(df, Seq("k"), Seq($"id".asc), $"id", "cum")
    }
  }

  /** The mechanism's point: no task ever SORTS a whole key. The
    * phase-1 window must be partitioned by (key, __rpid), never by
    * the key alone — asserted on the physical plan so a refactor
    * cannot quietly fall back to the single-task shape. */
  test("scalableRank phase-1 window partitions by (key, range-id)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other => other
    }
    val docs = Tables.documents(spark, sf).select($"doc_id", $"source")
    val df = Skew.scalableRank(docs, Seq("source"), Seq($"doc_id".asc), "rn")
    val windows = unwrap(df.queryExecution.executedPlan).collect {
      case we: WindowExec =>
        (we.partitionSpec.map(_.toString), we.orderSpec.map(_.toString))
    }
    windows should not be empty
    windows.foreach { case (parts, order) =>
      if (parts.exists(_.contains("__rpid"))) {
        // phase-1: the doc-grain rank window — key AND range marker,
        // so max task input is |rows|/ranges, never a whole key
        parts.size should be >= 2
      } else {
        // the only key-only window allowed is the offsets prefix sum,
        // which runs over the per-range COUNT table (≤ ranges rows
        // per key) and is recognizable by its ORDER BY range-id
        withClue(s"unexpected key-only window over ($parts, $order): ") {
          order.exists(_.contains("__rpid")) shouldBe true
        }
      }
    }
    windows.count(_._1.exists(_.contains("__rpid"))) should be >= 1
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying 50k wide rows, 100 cold keys with one row
      val fact = spark.range(0, 50000)
        .select(lit(0L).as("k"), concat(lit("x" * 64), $"id").as("payload"))
        .union(spark.range(1, 101).select($"id".as("k"), lit("cold").as("payload")))
      val dim = spark.range(0, 101).select($"id".as("k"), ($"id" * 7).as("attr"))
      val joined = fact.join(dim, "k")
      // collect() drives THIS QueryExecution, so its adaptive plan is
      // final afterwards (count() would execute a different plan tree)
      val n = joined.collect().length
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan:\n$plan")
      n shouldBe 50100
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
