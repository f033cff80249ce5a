package graft

import org.scalatest.matchers.should.Matchers

/** Distributed-determinism contract: a query's RESULT (values and
  * row order) must not depend on how the data happens to be
  * partitioned — the property that makes a result reproducible on a
  * 4-thread laptop, a 32-thread box, and a 1000-executor cluster.
  * Runs the riskiest shapes (list accumulation, per-group sampling,
  * iterative clustering, signature joins, salted aggregation,
  * window picks) under shuffle.partitions=7 vs the suite default and
  * demands identical ordered results. Catches the classic bugs:
  * collect_list without an ordering, ties broken by partition
  * arrival, floats summed then ORDER BY'd, min-hash ties.
  */
class PartitionInvarianceSpec extends SparkSuite with Matchers {

  private val risky = Seq(
    "q_collect_list",    // list accumulation needs an explicit sort
    "q_group_sample",    // per-group hash sampling tie-breaks
    "q_union_dedup",     // first-wins precedence across partitions
    "q_salted_agg",      // two-phase salted aggregation
    "q_minhash_est",     // signature join + 1/16 estimates
    "q_boilerplate",     // corpus frequency + ordered reassembly
    "q_dedup_clusters",  // iterative min-label propagation
    "q_asof_nearest",    // two-window min-gap pick
    "q_ann_multiprobe",  // centroid ranking + top-k ties
    "q_mom_growth",      // aggregate-then-lag series
    "q_pack_sequences",  // running-sum chunk boundaries
    "q_topk_per_group",  // rank ties
    "q_islands",         // row_number-derived grouping key
    "q_semantic_dedup",  // min_by argmin keeper ties + centroid sums
    "q_basket_pairs",    // size-adaptive salted pair build
    "q_oov_rate",        // top-K vocab via orderBy+limit ties
    "q_gopher_rules",    // per-doc top-token argmax
    "q_gap_percentiles", // integer-rank quantile picks under gap ties
    "q_length_trim",     // per-lang rank-based percentile bounds
    "q_cluster_sizes",   // histogram over the iterative CC fixpoint
    "q_moore_lewis",     // two-LM join + scalar-broadcast normalizers
    "q_winsorized_stats", // rank-picked clamp bounds under value ties
    "q_lang_confusion",  // per-doc argmax feeding a cross-tab
    "q_zipf_slope",      // top-100 rank cut under count ties
    "q_kl_divergence",   // ln-sum accumulation across partitions
    "q_ann_recall",      // two rank windows over rounded sims
    "q_dup_matrix",      // banded pair counts rolled to source pairs
    "q_multiband_dedup", // per-band min-rep claim + distinct edges
    "q_ppl_bucket",      // ntile over per-source LM scores
    "q_cos_hist",        // float dot + floor bin edges
    "q_assign_purity",   // argmin assignment ties + centroid sums
    "q_knn_classify",    // rank ties + vote-majority ties
    "q_domain_mix",      // sqrt-sum normalizer + floor allocation
    "q_bigram_entropy",  // per-doc ln fold across partitions
    "q_lsh_precision",   // rounded-jaccard threshold counts
    "q_len_quality",     // corr float sums per source
    "q_est_error",       // estimator-error means over sampled pairs
    "q_split_leakage",   // hash split × train-gram join counts
    "q_part_share",      // integer-derived 1.25×-mean membership
    "q_top_supplier",    // integer-derived argmax winner set
    "q_unigram_lm",      // integer-term pico-nat sums (r8 rewrite)
    "q_token_entropy",   // integer-term c·ln c sums (r8 rewrite)
    "q_budget_sample",   // remainder-rank seats + sha-rank selection
    "q_dup_spans",       // islands over gram-match windows + run-rank pick
    "q_dedup_modality",  // flag lattice over digest/band/pair memberships
    "q_pq_codes",        // per-subspace argmin codeword ties
    "q_pq_recall",       // ADC vs exact rank ties under rounded dists
    "q_batch_drift",     // smoothed ln-sum accumulation across partitions
    "q_ivfpq",           // ADC shortlist cut + exact re-rank ties
    "q_adc_err",         // raw-double error sums across partitions
    "q_bm25",            // per-term pico-round sums + integer rank cut
    "q_mrl_recall",      // two rank windows over rounded sims
    "q_ndcg",            // rank-gated gain sums over two windows
    "q_skew_stats",      // ceiling-rank picks on per-key count ties
    "q_rrf_fusion",      // two rank legs + full-outer fuse
    "q_curriculum",      // two-phase per-source rank → position
    "q_shard_manifest",  // shard cuts over the two-phase rank
    "q_dedup_yield",     // threshold counts over star-pair jaccards
    "q_token_budget",    // two-phase running sum → budget cut
    "q_vocab_growth",    // two-phase running vocab accumulation
    "q_vocab_coverage",  // top-16384 heap cut + coverage cumsum ties
    "q_pack_fragmentation", // boundary-crossing flags off the two-phase cumsum
    "q_fuzzy_leakage",   // band-distinct probe counts across splits
    // r13: enrollment derived from the physical plans (the test
    // below) — every rank-class window in the registry is either
    // here or adjudicated there
    "q_row_number",      // row_number over the events total order
    "q_rank",            // rank/dense_rank/ntile value ties
    "q_rank_dist",       // percent_rank/cume_dist tie plateaus
    "q_cosine_topk",     // rank over rounded sims
    "q_ann_ivf",         // in-cell rank over rounded sims
    "q_ann_lsh",         // in-bucket rank over rounded sims
    "q_ann_filtered",    // pre-filtered rank over rounded sims
    "q_ann_upsert",      // argmin cell rank under rounded-dist ties
    "q_keep_canonical",  // per-cluster canonical-doc rank pick
    "q_lang_id",         // per-doc argmax rank over lexicon hits
    "q_median_mode",     // deterministic-mode rank tie-break
    "q_min_cost_supplier", // per-part min-cost rank pick (Q2 shape)
    "q_rfm",             // ntile bucket cuts on metric ties
    // r14: these four were the r13 hand-enrolled blind spot; the
    // derivation below now sees through checkpointed lineage (memo
    // clears + the Ckpt.planProbe pre-truncation recorder), so any
    // rank window they carry is DERIVED. They stay enrolled either
    // way — enrollment is a superset of the derived set, and their
    // driver-loop tie surfaces (per-round winner picks) warrant the
    // sweep even where the pick is orderBy+limit, not a window.
    "q_kmeans",          // argmin assignment ties + centroid sums
    "q_bpe_train",       // per-round winner pick under freq ties
    "q_bpe_apply",       // tokenizes with the q_bpe_train winners
    "q_containment")     // per-containee best-container rank pick

  test("the risky list covers every rank-window query (derived from the physical plans)") {
    // r12 verdict #3: the enrollment above was hand-curated, so a NEW
    // rank-bearing query could be forgotten. Derive the candidates
    // from the executed plans instead (the window-cardinality-sweep
    // pattern): any query whose plan contains a WindowExec evaluating
    // a rank-class function (row_number / rank / dense_rank / ntile /
    // percent_rank / cume_dist — the functions whose output depends
    // on sort-tie resolution) or a WindowGroupLimitExec (a pushed
    // rank cut) must be enrolled in `risky` or adjudicated in
    // `exempt` with its justification.
    //
    // r14 — the r13 blind spot is closed: the derivation now ALSO
    // inspects every plan recorded by Ckpt.planProbe (the
    // pre-truncation plan each materialization site receives) with
    // the memo caches cleared per query, so windows hidden behind
    // memoized/checkpointed lineage (q_bm25's postings build,
    // q_containment's pair memo, per-round Lloyd state) are seen by
    // the sweep instead of planning as LogicalRDD. What remains
    // structurally invisible: a rank pick executed as
    // orderBy+limit+take inside a driver loop (TakeOrderedAndProject,
    // not a window — q_bpe_train's winner) — that class is not a
    // WindowExec anywhere and is covered by direct enrollment.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.catalyst.expressions.{Expression, RowNumber,
      Rank, DenseRank, NTile, PercentRank, CumeDist}
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other => other
    }
    def rankClass(e: Expression): Boolean = e.collectFirst {
      case _: RowNumber => (); case _: Rank => (); case _: DenseRank => ()
      case _: NTile => (); case _: PercentRank => (); case _: CumeDist => ()
    }.isDefined
    def hasRankWindow(p: SparkPlan): Boolean = unwrap(p).collectFirst {
      case w: WindowExec if w.windowExpression.exists(rankClass) => w
      case g: WindowGroupLimitExec => g
    }.isDefined
    // r14 second class: a TakeOrderedAndProject (orderBy+limit top-k
    // heap cut) is ALSO a rank cut — rows tied at the limit boundary
    // under a NON-total ordering survive or drop by partition merge
    // order, the same hazard as a rank window — so its bearers must
    // be enrolled or adjudicated as totally ordered.
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    def hasTopKCut(p: SparkPlan): Boolean = unwrap(p).collectFirst {
      case t: TakeOrderedAndProjectExec => t
    }.isDefined
    val exempt: Set[String] = Set() // name -> enroll instead, or justify here
    var derivedTopK = Set.empty[String]
    val derived = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      // clear per query so shared memoized tables re-plan THROUGH
      // their Ckpt sites (a warm memo would hide its build plans —
      // and attribute them to whichever query ran first)
      graft.ops.Text.clearMemoCaches()
      val recorded = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
      Ckpt.planProbe = Some(recorded)
      try {
        val own = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan
        val all = own +: recorded.toSeq
        if (all.exists(hasTopKCut)) derivedTopK += name
        all.exists(hasRankWindow)
      } finally Ckpt.planProbe = None
    }.toSet
    graft.ops.Text.clearMemoCaches() // leave no per-query residue
    // every top-k-cut bearer is enrolled or adjudicated totally
    // ordered (the ordering key set contains a unique key for the
    // output grain, so no tie can straddle the cut); adjudications
    // verified against the code r14:
    val topKTotallyOrdered: Set[String] = Set(
      "q_topk",           // + o_orderkey (orders PK)
      "q_scan_order",     // + (l_orderkey, l_linenumber) (lineitem PK)
      "q_token_freq",     // + token (the group key)
      "q_bigram_freq",    // + bigram (the group key)
      "q_pmi",            // + (ta, tb) (the group key)
      "q_late_suppliers", // + s_name (unique in supplier — asserted
                          //   by the data probe r14; TPC-H generates
                          //   names 1:1 with s_suppkey)
      "q_returned_items", // + c_custkey (the group key)
      "q_ship_priority",  // + l_orderkey (the Q3 group key)
      "q_bpe_merges")     // + pair (the group key)
    withClue(s"top-k-cut queries neither enrolled nor adjudicated: " +
      s"${(derivedTopK -- risky.toSet -- topKTotallyOrdered).toSeq.sorted}; " +
      s"stale adjudications: ${(topKTotallyOrdered -- derivedTopK).toSeq.sorted}: ") {
      (derivedTopK -- risky.toSet -- topKTotallyOrdered) shouldBe empty
      (topKTotallyOrdered -- derivedTopK) shouldBe empty
    }
    withClue(s"rank-window queries not enrolled in the invariance sweep: " +
      s"${(derived -- risky.toSet -- exempt).toSeq.sorted}; " +
      s"stale exemptions: ${(exempt -- derived).toSeq.sorted}: ") {
      (derived -- risky.toSet -- exempt) shouldBe empty
      (exempt -- derived) shouldBe empty
    }
    // positive probe that the blind spot stays closed: these carried
    // rank windows only inside memoized/checkpointed lineage in r13
    // (hand-enrolled then); if the probe machinery regresses they
    // silently fall out of `derived` and this catches it
    Seq("q_containment", "q_bm25", "q_curriculum", "q_kmeans").foreach { n =>
      withClue(s"$n must be DERIVED via recorded pre-truncation plans: ") {
        derived should contain(n)
      }
    }
  }

  test("risky queries return identical ordered results under 7 vs default shuffle partitions") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(): Map[String, Seq[Seq[Any]]] =
      risky.map { name =>
        name -> SparkEntry.queries(name)(spark, sf)
          .collect().toSeq.map(_.toSeq)
      }.toMap
    val base = runAll()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt = runAll()
      risky.foreach { name =>
        withClue(name) {
          alt(name) shouldBe base(name)
          alt(name).size should be > 0
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
