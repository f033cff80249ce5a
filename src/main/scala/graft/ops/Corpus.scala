package graft.ops

import graft.{Ckpt, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics operators for the LLM-data pipeline (SURVEY.md
  * §2.11 L4 extensions): TF-IDF term weighting, exact heavy hitters,
  * bigram frequency, and edit-distance near-dup — all on the driver's
  * `documents` table, sharing q_token_freq's tokenizer so every
  * oracle uses the same split contract.
  *
  * Scale doctrine (100 TB of documents):
  *  - TF-IDF is two hash-aggs (doc-term, then term) plus ONE broadcast
  *    of a single-row corpus count — the df table shuffles on term,
  *    never the document bodies;
  *  - heavy hitters compares integer counts (cnt*1000 > total) against
  *    a broadcast 1-row total — no floats, no collect;
  *  - bigrams are built positionally inside the projection (explode of
  *    a transform over the token array) — rows multiply in-stage, the
  *    only shuffle is the count;
  *  - edit-distance pairs are BLOCKED by (source, lang) like
  *    q_near_dup, and the O(|s|·|t|) levenshtein runs on fixed 40-char
  *    prefixes so per-pair cost is bounded regardless of document
  *    length.
  */
object Corpus {
  type Q = (SparkSession, String) => DataFrame

  /** Same tokenizer as Text.toks — the oracle parity contract. */
  private def toks(c: Column): Column = split(trim(lower(c)), " +")

  /** The reproducible-sampling hash: first 16 bits of sha-256 of the
    * id as an integer in [0, 65536) — engine-, run-, and
    * partitioning-independent. ONE definition shared by the sampler
    * (L24), the split (L27), and the split audit (L64), so the audit
    * can never desynchronize from the split it audits. */
  private def u16(id: Column): Column =
    conv(substring(sha2(id.cast("string"), 256), 1, 4), 16, 10).cast("long")

  /** The 80/10/10 train/val/test assignment over [[u16]] — the L27
    * contract, shared verbatim by the L64 leakage audit. */
  private def splitOf(u: Column): Column =
    when(u < 0.8 * 65536, "train")
      .when(u < 0.9 * 65536, "val")
      .otherwise("test")

  /** The corpus's DISTINCT positional-8-gram table — (doc_id, split,
    * gram), grams distinct'd per doc in-stage (array_distinct before
    * the explode) and the L27 hash split attached at DOC grain (one
    * sha-256 per document, never per gram). Memoized per (session,
    * dir) via Text's cache registry: three registry queries
    * (q_contamination, q_ngram_coverage, q_split_leakage) consume
    * the SAME deterministic table, so the tokenize + gram explode
    * runs once per session/input — the "gram table is a persisted
    * intermediate" shape a production decontamination pipeline runs
    * (at 100 TB this is a parquet write the family reads, keyed by
    * xxhash64(gram) — 8 bytes instead of ~50; the string form here
    * is the oracle parity contract). localCheckpoint keeps it
    * distributed; Bench/Profile clear per pass via
    * Text.clearMemoCaches so timings stay honest. Deterministic (pure
    * string ops + sha2), so reuse can never change a result.
    * q_contamination consumed NON-distinct grams before r10 — its
    * outputs only ever touched grams through DISTINCT aggregations
    * (a distinct'd benchmark side, a count_distinct per doc), so the
    * per-doc distinct grain is value-identical there. */
  private val gramCache = Text.newMemoCache()

  private[graft] def docGrams8(spark: SparkSession, dir: String): DataFrame =
    Text.memoized(gramCache, spark, dir) {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"doc_id", toks($"text").as("t"))
        .filter(size($"t") >= 8)
        .withColumn("split", splitOf(u16($"doc_id")))
        .select($"doc_id", $"split", explode(array_distinct(transform(
          sequence(lit(1), size($"t") - 7),
          i => array_join(slice($"t", i, lit(8)), " ")))).as("gram"))
        .transform(Ckpt.mat)
    }

  /** Exact integer-term quantization for the log-sum family: each
    * per-term double (single-expression arithmetic on identical
    * inputs, hence bit-identical under IEEE 754 on both engines) is
    * quantized ONCE to integer pico-nats — round(term·1e12) cast to
    * decimal(38,0); round-to-int of the same double agrees across
    * engines (half away from zero on both — the mechanism r7 proved
    * for q_ppl_bucket's score_e6), and the integral double converts
    * exactly to the wide integer on both — then aggregated with a
    * plain integer `sum`: exact, commutative, order-free, map-side
    * combinable. This is the standing fix for the round-half
    * hash-tie class (three real failures r5–r6): a parallel DOUBLE
    * sum is partition-order-dependent and its ±1e-13 noise straddles
    * decimal-rounding boundaries; an integer sum cannot. It replaces
    * r7's sorted-fold (collect_list + sort_array + sequential
    * aggregate), which was tie-safe but paid a per-doc array
    * build/sort (+51% on q_ppl_bucket, +25% on q_unigram_lm).
    * Mirrored in DuckDB as sum(CAST(round((term) * 1e12) AS
    * HUGEINT)). decimal(38,0)/HUGEINT per TERM — not BIGINT — so an
    * oversized term saturates neither engine: a long-first cast
    * silently clamps at 2^63 in non-ANSI Spark (c·ln c·1e12 passes
    * it at c ≈ 6.9e5 repeats of one context) while DuckDB's BIGINT
    * cast errors — divergence either way. The wide bound is ~1e38,
    * i.e. c·ln c ≤ 1e26 per term: unreachable by construction.
    * Quantization error is ≤ 5e-13 per term — a 10⁶-token doc
    * accumulates ≤ 5e-7 absolute, invisible at round-6 of a per-token
    * MEAN (error /n again). */
  private def e12(term: Column): Column =
    round(term * lit(1.0e12)).cast("decimal(38,0)")

  /** Exact wide accumulation for [[e12]] terms: decimal(38,0)-sum,
    * the q_part_share precedent — mirrors DuckDB's HUGEINT sum, so
    * neither the terms nor the sum ever transit int64 (exact to
    * 1e38, ~1e25 terms). Both engines then cast the identical
    * integer to double, and a NONNEGATIVE integer sum's cast is +0.0
    * when zero — no sign-of-zero surface. */
  private def sumE12(term: Column): Column =
    sum(e12(term))

  /** Unscale an e12 integer sum to a rounded per-term mean:
    * round(sum/n/1e12, 6), the exact division-order mirror of the
    * DuckDB `round(CAST(s AS DOUBLE) / n / 1e12, 6) + 0.0`. The
    * trailing `+ 0.0` (both engines) normalizes sign-of-zero for
    * SIGNED term families (q_moore_lewis's LLR, q_unigram_lm's
    * log-probs): a tiny-negative integer sum — |mean| < 5e-7 —
    * rounds to IEEE −0.0 in DuckDB while Spark's BigDecimal Round
    * normalizes, the L60 failure class on a different path. Exact
    * identity for every other value. */
  private def meanOfE12(sumE12: Column, n: Column): Column =
    round(sumE12.cast("double") / n / lit(1.0e12), 6) + lit(0.0)

  /** The corpus TERM-FREQUENCY table — (doc_id, source, tok, tf) at
    * per-document distinct-term grain — the ONE shared build for
    * every order-insensitive token statistic in this module
    * (q_tfidf, q_unigram_lm, q_heavy_hitters, q_moore_lewis,
    * q_token_entropy, q_vocab_coverage, q_zipf_slope,
    * q_kl_divergence, q_ppl_bucket, q_batch_drift, q_src_overlap,
    * and the BM25 postings build). Before r15 each of those queries
    * re-ran the documents scan + tokenize + explode + first hash-agg
    * independently; tf-grain is sufficient for all of them because
    * none is order-sensitive: occurrence counts are sums of tf,
    * per-doc token totals are sum(tf), distinct vocabularies are the
    * rows themselves, and exact e12 integer-term sums commute with
    * multiplicity ([[sumE12W]]). Positional consumers (bigrams,
    * packing, chunking) keep their own builds — adjacency does not
    * survive the count agg.
    *
    * Scale shape: one documents scan + explode + (doc_id, tok)
    * hash-agg — map-side combine shrinks the shuffle to per-doc
    * distinct terms (the same cardinality Text.docTokens already
    * ships), then Ckpt.mat materializes it once per (session, dir)
    * as the "term-frequency table is a persisted intermediate" a
    * production corpus pipeline keeps next to its postings index.
    * Deterministic (pure string ops + counts), so memo reuse can
    * never change a result; Bench/Profile clear per pass. */
  private val termFreqCache = Text.newMemoCache()

  private[graft] def docTermFreq(spark: SparkSession, dir: String): DataFrame =
    Text.memoized(termFreqCache, spark, dir) {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"doc_id", $"source", explode(toks($"text")).as("tok"))
        .groupBy($"doc_id", $"source", $"tok")
        .agg(count(lit(1)).as("tf"))
        .transform(Ckpt.mat)
    }

  /** [[sumE12]] over tf-grain rows: sum(tf · e12(term)) — EXACTLY the
    * exploded-grain sumE12, because e12(term) is an exact
    * decimal(38,0) integer and an integer multiple equals tf added
    * copies (the float term is quantized BEFORE the multiply, so no
    * new float operation enters). Queries rewritten over
    * [[docTermFreq]] therefore emit bit-identical sums to their
    * pre-r15 exploded forms. */
  private def sumE12W(term: Column, tf: Column): Column =
    sum(tf.cast("decimal(38,0)") * e12(term))

  /** L4+ — TF-IDF: tf(doc, term) × ln(N / df(term)), terms with
    * tf ≥ 2. ln of the same double ratio on both engines, rounded at
    * 6; ORDER BY is (doc_id, term) — never the float score — so a
    * last-ulp ln difference cannot reorder rows. */
  def qTfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // Single-row corpus count attached via broadcast cross join — the
    // scalar-broadcast pattern. Plans a BroadcastNestedLoopJoin whose
    // build side is a groupless aggregate (≤1 row by construction);
    // OpsSpec's plan sweep admits exactly that shape.
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // (doc_id, term, tf) off the shared memoized term-frequency table
    // (r15) — identical rows to the explode + hash-agg it replaces
    val tf = docTermFreq(spark, dir)
      .select($"doc_id", $"tok".as("term"), $"tf")
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    tf.filter($"tf" >= 2)
      .join(df, "term")
      .crossJoin(broadcast(nDocs))
      .select($"doc_id", $"term", $"tf",
        round($"tf" * log($"n_docs".cast("double") / $"df"), 6).as("tfidf"))
      .orderBy($"doc_id".asc_nulls_first, $"term".asc_nulls_first)
  }

  /** BM25 (Robertson/Lucene variant, k1=1.2 b=0.75) of every corpus
    * document against each of three query documents (doc_id < 3 —
    * the query docs' distinct terms ARE the queries, the
    * more-like-this retrieval shape), memoized per (session, dir)
    * because three queries consume it (q_bm25's lexical ranking,
    * q_rrf_fusion's lexical leg, q_ndcg's graded eval). idf = ln(1 + (N−df+0.5)/(df+0.5))
    * — nonnegative by construction, so low-df terms dominate exactly
    * as a retrieval stack expects. Plan: the tf table is the shared
    * memoized [[docTermFreq]] — its THREE
    * consumers (query-term slice, corpus side, doc-length agg) and
    * the df agg read the materialized blocks instead of re-running
    * the scan+explode (the docTokens precedent); corpus stats attach
    * as a 1-row broadcast scalar; the scoring join is a plain equi
    * join on the term key (the tf/df tables are corpus-derived —
    * never hint-broadcast; AQE sizes the strategy). Determinism: w
    * is a per-(q,doc,term) double built from integer stats with ONE
    * textually-mirrored operation order, quantized to integer
    * pico-units per TERM (round-to-int of an identical double —
    * engine-exact), summed in exact decimal(38,0), and EMITTED as
    * integer micro-units (score_u6) — no float ever feeds a sum or
    * a rank, the q_est_error integer-sum pattern. */
  private val bm25Cache = Text.newMemoCache()
  private val bm25PostCache = Text.newMemoCache()

  /** The STANDING BM25 scoring index — one static table at (term,
    * doc_id) grain carrying tf, the term's idf and the doc's length
    * norm pre-attached: exactly what a search tier persists between
    * ingests (posting lists + scoring statistics). idf and the
    * length norm are computed at their NATURAL grain (|vocab| and
    * |docs| rows) before attaching, so the ln and the corpus-scalar
    * arithmetic never run once per scored (q, doc, term) row.
    * Memoized + lazily checkpointed: the scorer probes it as a
    * STATIC side, which is what lets [[bm25Score]] run unchanged
    * under Structured Streaming (stream-static equi-join — the
    * parity spec proves it). */
  private[graft] def bm25Postings(spark: SparkSession, dir: String): DataFrame =
    Text.memoized(bm25PostCache, spark, dir) {
      import spark.implicits._
      // the shared memoized term-frequency table (r15) replaces the
      // build's own Ckpt.mat'd explode + hash-agg — same rows, one
      // materialization shared with the whole corpus-stats family
      val tf = docTermFreq(spark, dir)
        .select($"doc_id", $"tok".as("term"), $"tf")
      val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("tot_len"))
      val idfTbl = tf.groupBy($"term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))))
        .select($"term", $"idf")
      val dn = dl.crossJoin(broadcast(stats))
        .select($"doc_id", (lit(0.25) +
          lit(0.75) * ($"dl" * $"n_docs").cast("double") / $"tot_len").as("dln"))
      tf.join(idfTbl, "term").join(dn, "doc_id")
        .transform(Ckpt.mat)
    }

  /** (doc_id, term, tf) rows for a document set — the postings
    * build's corpus-scale step (explode + one map-side-combinable
    * hash-agg), shared by the standing index and L95's arriving
    * batch. */
  private[graft] def tfRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** The postings MERGE at the heart of L95's CDC write-back: given
    * the STANDING index's tf rows and an ARRIVING batch's tf rows
    * (disjoint doc sets), produce the post-ingest postings index —
    * (doc_id, term, tf, idf, dln) — equal to a from-scratch rebuild
    * over the union corpus, without re-pairing or re-tokenizing the
    * corpus. The real work is the df merge: df is CORPUS-GLOBAL, so
    * the write-back is a full-outer count ADD at term grain (tf is
    * additive over disjoint doc sets — never a union-then-recount of
    * posting rows); doc lengths re-derive at doc grain (dl is itself
    * a standing table the index persists), corpus stats attach as a
    * 1-row broadcast scalar, and idf / the length norm recompute at
    * their NATURAL grains exactly like [[bm25Postings]] — every doc's
    * norm legitimately changes when n_docs/tot_len move, which is why
    * dln lives at doc grain, not inside the posting rows. Runs as-is
    * inside foreachBatch (IncrementalIndexSpec's live-loop shape).
    *
    * CONTRACT: the standing and arriving doc sets must be DISJOINT —
    * tf/df/dl are additive only over disjoint docs, so an overlap
    * (a re-ingested/updated doc in a real CDC loop) silently
    * double-counts. Both call sites satisfy it structurally (pmod
    * partition / MemoryStream batches), and under
    * `spark.graft.debugChecks=true` the contract is ASSERTED with a
    * semi-join probe (one bounded extra job — debug only; an update
    * path should drop standing rows for arriving doc_ids first,
    * turning the upsert into this disjoint merge). */
  private[graft] val DebugChecksFlag = Tables.DebugChecksFlag

  private[graft] def mergePostings(corpusTf: DataFrame,
                                   batchTf: DataFrame): DataFrame = {
    if (corpusTf.sparkSession.conf.get(DebugChecksFlag, "false").toBoolean) {
      val overlap = corpusTf.select(col("doc_id"))
        .join(batchTf.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .limit(1).count()
      require(overlap == 0L,
        "mergePostings: standing and arriving doc sets overlap — " +
          "tf/df/dl would double-count; drop the standing rows for " +
          "arriving doc_ids (upsert) before merging")
      // null keys are the silent-drop class: a null term never matches
      // the idf equi-join, a null doc_id never matches the norm join —
      // the posting row would vanish from the merged index instead of
      // erroring. tfRows can't produce them (split tokens are non-null,
      // doc_id is the documents PK) — reject rather than drop if a
      // direct caller hands them in.
      val nullKeys = corpusTf.unionByName(batchTf)
        .filter(col("doc_id").isNull || col("term").isNull)
        .limit(1).count()
      require(nullKeys == 0L,
        "mergePostings: null doc_id/term in the tf rows — such rows " +
          "silently drop from the idf/norm equi-joins; clean them " +
          "upstream (the tfRows path never produces them)")
    }
    val dfC = corpusTf.groupBy(col("term")).agg(count(lit(1)).as("df_c"))
    val dfB = batchTf.groupBy(col("term")).agg(count(lit(1)).as("df_b"))
    val dfNew = dfC.join(dfB, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df_c"), lit(0L)) + coalesce(col("df_b"), lit(0L)))
          .as("df"))
    val dl = corpusTf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .union(batchTf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
      .transform(Ckpt.mat) // stats + norm re-derive read once
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_len"))
    val idfNew = dfNew.crossJoin(broadcast(stats))
      .select(col("term"),
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf"))
    val dn = dl.crossJoin(broadcast(stats))
      .select(col("doc_id"), (lit(0.25) +
        lit(0.75) * (col("dl") * col("n_docs")).cast("double") /
          col("tot_len")).as("dln"))
    corpusTf.union(batchTf)
      .join(idfNew, "term")
      .join(dn, "doc_id")
      .select(col("doc_id"), col("term"), col("tf"), col("idf"), col("dln"))
  }

  /** L95 — BM25 postings-index CDC write-back: the lexical-index
    * mirror of L72 (dedup band index) and L74 (ANN cell index), the
    * one asymmetry the r12 verdict found in the CDC story. An
    * arriving batch (doc_id % 10 = 9, the standard "today's ingest"
    * slice) updates the STANDING tf/df/dl postings statistics via
    * [[mergePostings]]; output = the post-ingest index at posting
    * grain with idf and the length norm emitted as integer
    * micro-units (round-to-int of doubles built from identical
    * integer stats on both engines — the family's score_u6 gate).
    * The oracle rebuilds the same index from scratch over the full
    * corpus: incremental == rebuild is the correctness contract a
    * production ingest loop audits (reference analog: s3-sync.sh:17's
    * skip-what-exists incrementalism — merge only what arrived).
    * Scale: the merge is one term-grain full-outer count add + one
    * doc-grain union + two equi-joins; per-ingest cost ∝ |batch| +
    * |index statistics|, never corpus re-tokenization — at 100 TB
    * the tf/df/dl inputs are the persisted tables the search tier
    * already maintains (BucketingSpec proves the bucketed
    * read-in-place layout; q_bm25 serves unchanged from the merged
    * shape). */
  def qBm25Upsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // both legs slice the shared memoized [[docTermFreq]] (r15):
    // the doc_id filter commutes with the tf agg (doc_id is a group
    // key), so each slice equals tfRows over the filtered documents
    // — and the memo is already materialized, so the df agg + dl agg
    // + union read one checkpoint instead of two
    val tf = docTermFreq(spark, dir)
      .select($"doc_id", $"tok".as("term"), $"tf")
    val corpusTf = tf.filter(pmod($"doc_id", lit(10L)) =!= 9)
    val batchTf = tf.filter(pmod($"doc_id", lit(10L)) === 9)
    mergePostings(corpusTf, batchTf)
      .select($"doc_id", $"term", $"tf",
        round($"idf" * lit(1.0e6)).cast("long").as("idf_u6"),
        round($"dln" * lit(1.0e6)).cast("long").as("dln_u6"))
      .orderBy($"doc_id".asc_nulls_first, $"term".asc_nulls_first)
  }

  /** ARRIVAL-path query tokenization: (q_id, distinct term) as a
    * PURE per-row projection — no shuffle, no state — so an arriving
    * query scores under Structured Streaming exactly like a batch
    * one (the bandProject precedent). */
  private[graft] def queryToks(df: DataFrame): DataFrame =
    df.select(col("doc_id").as("q_id"),
      explode(array_distinct(toks(col("text")))).as("term"))

  /** Score arriving query term sets against the standing postings:
    * one equi-join on the term key + one (q, doc)-keyed exact
    * decimal sum of pico-unit terms, emitted as integer micro-units.
    * Works identically on a batch or a streaming `qtoks` (the join
    * is stream-static, the agg runs in complete mode on bounded
    * input). */
  private[graft] def bm25Score(qtoks: DataFrame, postings: DataFrame): DataFrame =
    qtoks.join(postings, "term")
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("w", col("idf") * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * col("dln")))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(round(col("w") * lit(1.0e12)).cast("decimal(38,0)")).as("s"))
      .select(col("q_id"), col("doc_id"),
        round(col("s").cast("double") / lit(1.0e6)).cast("long").as("score_u6"))

  private def bm25Scores(spark: SparkSession, dir: String): DataFrame =
    Text.memoized(bm25Cache, spark, dir) {
      import spark.implicits._
      bm25Score(
        queryToks(Tables.documents(spark, dir).filter($"doc_id" < 3)),
        bm25Postings(spark, dir))
        .transform(Ckpt.mat)
    }

  /** L83 — BM25 lexical retrieval: top-10 documents per query doc by
    * the shared [[bm25Scores]] table — the lexical half of every
    * hybrid retrieval stack (and the strongest zero-training
    * relevance baseline there is). Ranking and emission are both the
    * INTEGER micro-unit score, tie-broken on doc_id — nothing float
    * touches the order. At 100 TB the tf/df tables are the standing
    * inverted-index statistics a search tier maintains; per-query
    * cost is the posting-list equi-join, never a corpus scan. */
  def qBm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"q_id").orderBy($"score_u6".desc, $"doc_id".asc)
    bm25Scores(spark, dir)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 10)
      .select($"q_id", $"doc_id", $"rnk", $"score_u6")
      .orderBy($"q_id".asc_nulls_first, $"rnk".asc_nulls_first)
  }

  /** L84 — hybrid retrieval via reciprocal-rank fusion: the lexical
    * (BM25 top-20) and semantic (same-cell cosine top-20, the IVF
    * serving path — not brute force) rankings fuse per query doc as
    * RRF(d) = Σ_legs 1/(60 + rank_leg(d)), the standard
    * score-scale-free fusion every hybrid search stack ships. A doc
    * on one list only keeps its single term (full outer join,
    * missing leg contributes 0 — rank 0 emitted as the "absent"
    * sentinel). Scale shape: each leg is already bounded (top-20 per
    * query), so the fusion join and final rank touch queries×40 rows
    * at any corpus size; the legs themselves are the standing-index
    * paths (posting-list equi-join; cell equi-join probing the
    * query's IVF cell). Determinism: both leg ranks are integers;
    * each RRF term is round-to-int of 1e12/(60+rank) — identical
    * doubles, engine-exact, and 60+rank ≤ 80 can never land 1e12/x
    * on a .5 tie (that needs a 2^13 factor) — summed as exact longs
    * (rrf_u12); ranking and emission are integer-only. */
  def qRrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wLex = Window.partitionBy($"q_id").orderBy($"score_u6".desc, $"doc_id".asc)
    val lex = bm25Scores(spark, dir)
      .withColumn("r_lex", row_number().over(wLex))
      .filter($"r_lex" <= 20)
      .select($"q_id", $"doc_id", $"r_lex")
    // the ANN family's shared embedding→(vec, nrm) projection — one
    // code path, not an inline copy (r11 advice)
    val emb = Similarity.withVec(Tables.embeddings(spark, dir))
    val q = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"label".as("q_label"),
        $"vec".as("qv"), $"nrm".as("qn"))
    val wSem = Window.partitionBy($"q_id").orderBy($"sim".desc, $"doc_id".asc)
    val sem = emb
      .select($"vec_id".as("doc_id"), $"label", $"vec".as("cv"), $"nrm".as("cn"))
      .join(broadcast(q), $"label" === $"q_label" && $"doc_id" =!= $"q_id")
      .withColumn("sim",
        round(expr("graft_dot(qv, cv)") / ($"qn" * $"cn"), 4) + lit(0.0))
      .withColumn("r_sem", row_number().over(wSem))
      .filter($"r_sem" <= 20)
      .select($"q_id", $"doc_id", $"r_sem")
    val wFuse = Window.partitionBy($"q_id").orderBy($"rrf_u12".desc, $"doc_id".asc)
    lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf_u12",
        coalesce(round(lit(1.0e12) / (lit(60) + $"r_lex")).cast("long"), lit(0L)) +
          coalesce(round(lit(1.0e12) / (lit(60) + $"r_sem")).cast("long"), lit(0L)))
      .withColumn("rnk", row_number().over(wFuse))
      .filter($"rnk" <= 5)
      .select($"q_id", $"doc_id", $"rnk", $"rrf_u12",
        coalesce($"r_lex", lit(0)).as("r_lex"),
        coalesce($"r_sem", lit(0)).as("r_sem"))
      .orderBy($"q_id".asc_nulls_first, $"rnk".asc_nulls_first)
  }

  /** L85 — ranking-quality eval (nDCG@10): graded relevance of the
    * BM25 ranking, the eval a retrieval stack runs before shipping a
    * scorer change (recall@k treats all hits alike; nDCG pays more
    * for putting the MOST relevant docs first). Relevance grades
    * derive from document metadata — 2 = same source as the query
    * doc, 1 = same language, 0 = neither — the provenance-based
    * relevance a synthetic corpus supports honestly. DCG@10 =
    * Σ_{r≤10} rel/log2(1+r) over the BM25 rank; IDCG@10 re-ranks the
    * SAME candidate set by relevance. Third consumer of the memoized
    * [[bm25Scores]] table, so the eval costs two windows and two
    * metadata equi-joins, never a new corpus pass. Determinism: each
    * DCG term is round-to-int of rel/log2(1+rank)·1e12 — integer
    * rank in, identical double out, engine-exact — summed as exact
    * longs; both emitted gains are integers and the final ratio is
    * one rounded division of two identical longs. */
  def qNdcg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val meta = Tables.documents(spark, dir).select($"doc_id", $"lang", $"source")
    val wLex = Window.partitionBy($"q_id").orderBy($"score_u6".desc, $"doc_id".asc)
    val rels = bm25Scores(spark, dir)
      .withColumn("r_lex", row_number().over(wLex))
      .join(meta.select($"doc_id".as("q_id"), $"lang".as("q_lang"),
        $"source".as("q_source")), "q_id")
      .join(meta, "doc_id")
      .withColumn("rel",
        when($"source" === $"q_source", 2)
          .when($"lang" === $"q_lang", 1)
          .otherwise(0))
    val wIdeal = Window.partitionBy($"q_id").orderBy($"rel".desc, $"doc_id".asc)
    def gain(rank: Column): Column =
      round($"rel" / log2(lit(1.0) + rank) * lit(1.0e12)).cast("long")
    rels
      .withColumn("r_ideal", row_number().over(wIdeal))
      .groupBy($"q_id")
      .agg(sum(when($"r_lex" <= 10, gain($"r_lex")).otherwise(0L)).as("dcg_u12"),
        sum(when($"r_ideal" <= 10, gain($"r_ideal")).otherwise(0L)).as("idcg_u12"))
      // idcg = 0 (a query whose whole candidate set grades rel = 0)
      // would divide 0/0: Spark (non-ANSI) yields NULL, DuckDB IEEE
      // NaN — emit NULL on both engines instead (CASE mirrored in
      // the oracle). Cannot occur on the synthetic corpus (every
      // query doc has same-source neighbors) but nothing enforces it.
      .withColumn("ndcg_at_10",
        when($"idcg_u12" > 0,
          round($"dcg_u12".cast("double") / $"idcg_u12", 4)))
      .orderBy($"q_id".asc_nulls_first)
  }

  /** L33 — unigram-LM scoring (the perplexity quality filter with
    * the LM trained BY the corpus itself): p(tok) from corpus
    * occurrence counts, doc score = mean log p over its tokens —
    * low-scoring docs are the OOV-heavy/garbled tail a perplexity
    * filter drops. Plan: one vocabulary-keyed count agg (shuffle
    * carries (token, count) — vocabulary cardinality), the corpus
    * total as a scalar-broadcast, tokens re-joined to the vocab by
    * plain shuffle hash join (a vocabulary table is corpus-derived —
    * never hint-broadcast), one doc-keyed avg. ln of the identical
    * double ratio on both engines; each log-prob is quantized to
    * integer pico-nats and summed exactly (see e12 — order-free,
    * map-side combinable), rounded at 6 AFTER the unscaled mean;
    * ORDER BY integer doc_id only. */
  def qUnigramLm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // tf-grain rewrite over the shared memoized [[docTermFreq]]
    // (r15): occurrence counts = sum(tf), per-doc totals = sum(tf),
    // and the exact pico-nat sum commutes with multiplicity
    // ([[sumE12W]]) — bit-identical to the exploded form
    val t = docTermFreq(spark, dir)
    val vocab = t.groupBy($"tok").agg(sum($"tf").as("cnt"))
    val total = vocab.agg(sum($"cnt").as("total"))
    t.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .withColumn("logp", log($"cnt".cast("double") / $"total"))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_toks"),
        sumE12W($"logp", $"tf").as("s_e12"))
      .select($"doc_id", $"n_toks",
        meanOfE12($"s_e12", $"n_toks").as("avg_logp"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** L4+ — exact heavy hitters: tokens above 0.1% of all tokens.
    * Pure integer comparison (cnt * 1000 > total) against a broadcast
    * single-row total — deterministic at any scale; the approximate
    * companion (count-min sketch, same threshold semantics) is
    * SketchSpec's CMS test. */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // token counts off the shared memoized [[docTermFreq]] (r15):
    // occurrence counts are sums of tf
    val counts = docTermFreq(spark, dir)
      .groupBy($"tok").agg(sum($"tf").as("cnt"))
      .select($"tok".as("token"), $"cnt")
    // scalar-broadcast pattern (1-row aggregate build side); see qTfidf
    val total = counts.agg(sum($"cnt").as("total"))
    counts
      .crossJoin(broadcast(total))
      .filter($"cnt" * 1000 > $"total")
      .select($"token", $"cnt")
      .orderBy($"cnt".desc_nulls_last, $"token".asc_nulls_first)
  }

  /** L4+ — bigram frequency: adjacent token pairs built positionally
    * (1-based element_at == DuckDB list indexing), top-40 by count.
    * The size≥2 guard is the parity contract: Spark's sequence(1,0)
    * would emit a DESCENDING [1,0] while DuckDB's generate_series
    * yields empty. */
  /** The NON-distinct per-document bigram table — (doc_id, c, n) for
    * every adjacent token pair — memoized per (session, dir) like
    * [[docGrams8]]: two consumers build it independently otherwise
    * (q_bigram_freq's corpus counts and q_bigram_entropy's per-doc
    * conditional-entropy terms — both shuffle their aggregation
    * keys anyway, so the memo saves exactly the tokenize + position
    * explode). q_ngram_jaccard deliberately does NOT ride it: its
    * array-level array_distinct is a zero-shuffle per-doc dedup that
    * a memo read would replace with a full distinct shuffle + join
    * (A/B'd slower, PLANS.md). One build per pass; the table is
    * token-count-sized (narrow strings), the same class as the gram
    * and token-set memos. */
  private val bigramCache = Text.newMemoCache()

  private[graft] def docBigrams(spark: SparkSession, dir: String): DataFrame =
    Text.memoized(bigramCache, spark, dir) {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"doc_id", toks($"text").as("t"))
        .filter(size($"t") >= 2)
        .select($"doc_id", explode(transform(
          sequence(lit(1), size($"t") - 1),
          i => struct(element_at($"t", i).as("c"),
            element_at($"t", i + 1).as("n")))).as("p"))
        .select($"doc_id", $"p.c", $"p.n")
        .transform(Ckpt.mat)
    }

  def qBigramFreq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docBigrams(spark, dir)
      .select(concat($"c", lit(" "), $"n").as("bigram"))
      .groupBy($"bigram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc_nulls_last, $"bigram".asc_nulls_first)
      .limit(40)
  }

  /** L2+ — edit-distance near-dup: (source, lang)-blocked pair join,
    * levenshtein on fixed 40-char prefixes, distance ≤ 10. Integer
    * distance → exact parity; da < db halves the pair space and pins
    * pair identity. The THRESHOLDED levenshtein (Spark 3.5+) runs the
    * banded O(k·n) DP and returns −1 past the bound — 4× cheaper per
    * pair than the full O(n²) table and identical after the ≤ k
    * filter (the oracle computes the full distance, filters the same). */
  def qEditDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", substring($"text", 1, 40).as("pfx"))
    val a = d.select($"doc_id".as("da"), $"lang".as("la"),
      $"source".as("sa"), $"pfx".as("pa"))
    val b = d.select($"doc_id".as("db"), $"lang".as("lb"),
      $"source".as("sb"), $"pfx".as("pb"))
    // ROUND-ROBIN repartition of the probe side: the DP work per
    // probe row is |its block| band evaluations, so leaving the
    // layout to the scan (one task per small parquet split) or
    // hashing on the block key (a whole dense block lands on one
    // task) both serialize the CPU-bound probe. Broadcast joins need
    // no co-location, so an even row spread is free to choose — and
    // the shuffle carries only (id, lang, source, 40-char prefix)
    // rows, ~3 orders cheaper than the O(pairs·band) DP it balances
    // (measured at sf0.1: 1.66 s unpartitioned / 1.34 s block-keyed
    // / 0.4-0.7 s round-robin for the warm join).
    a.repartition(spark.sparkContext.defaultParallelism)
      .join(b, $"sa" === $"sb" && $"la" === $"lb" && $"da" < $"db")
      .withColumn("dist", levenshtein($"pa", $"pb", 10))
      // banded levenshtein returns −1 past the bound, so dist >= 0
      // ALREADY IS dist <= 10. One conjunct matters: the filter
      // pushes into the join condition with the DP substituted, so a
      // second conjunct would run the whole band DP twice per
      // surviving ordered pair — and the pushed conjunct lands AFTER
      // the original da < db, which now short-circuits the mirrored
      // half of each block before any DP runs (measured 2.91 → 1.95 s
      // at sf0.1; the old form also DP'd da >= db pairs first).
      .filter($"dist" >= 0)
      .select($"da", $"db", $"dist")
      .orderBy($"da".asc_nulls_first, $"db".asc_nulls_first)
  }

  /** L4+ — pointwise mutual information of token pairs co-occurring
    * in a document: ln(c_ab · N / (df_a · df_b)) for pairs seen in
    * ≥ 5 docs — the classic phrase/collocation miner. Pair
    * generation is a per-document self-join on distinct tokens —
    * quadratic in per-doc DISTINCT vocabulary, which is what a
    * production pipeline bounds (top-k tokens per doc or a sliding
    * co-occurrence window) — the join itself shuffles on doc_id
    * only. df and N are token- and corpus-level aggregates: df joins
    * are vocabulary-sized, N is a broadcast single row. The ratio is
    * integer-exact before the ln; ORDER BY leads with integer cab,
    * never the float, so a last-ulp ln difference cannot reorder. */
  def qPmi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables.documents(spark, dir)
      .select($"doc_id", explode(array_distinct(toks($"text"))).as("tok"))
    val uni = t.groupBy($"tok").agg(count(lit(1)).as("df"))
    val nd = t.agg(count_distinct($"doc_id").as("nd"))
    t.as("a").join(t.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("ta"), col("b.tok").as("tb"))
      .agg(count(lit(1)).as("cab"))
      .filter($"cab" >= 5)
      .join(uni.select($"tok".as("ta"), $"df".as("dfa")), "ta")
      .join(uni.select($"tok".as("tb"), $"df".as("dfb")), "tb")
      .crossJoin(broadcast(nd))
      .select($"ta", $"tb", $"cab",
        round(log($"cab" * $"nd" / ($"dfa" * $"dfb")), 6).as("pmi"))
      .orderBy($"cab".desc_nulls_last, $"ta".asc_nulls_first,
        $"tb".asc_nulls_first)
      .limit(50)
  }

  /** L22 — sequence packing (concat-and-chunk): lay documents end to
    * end per source stream and chunk at a fixed token budget — the
    * batch-construction step of an LLM training pipeline. Each doc's
    * start offset is an exclusive running sum of token counts
    * (window, ROWS UNBOUNDED PRECEDING), from which its sequence id
    * and offset are pure integer arithmetic — exact on any engine.
    * At 100 TB the offsets come from [[Skew.scalableCumsum]] (r12):
    * each source's stream splits across the cluster's ranges with
    * broadcast prefix offsets, no whole-source single-task sort, no
    * global coordination — and seq ids stay globally unique because
    * the budget arithmetic is per source. */
  def qPackSequences(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 512L
    val base = Tables.documents(spark, dir)
      .select($"doc_id", $"source", size(toks($"text")).cast("long").as("n_tok"))
    // two-phase running sum (r12): a source's whole stream no longer
    // sorts on one task; the exclusive offset is cum − own
    Skew.scalableCumsum(base, Seq("source"), Seq($"doc_id".asc),
        $"n_tok", "cum")
      .withColumn("start_off", $"cum" - $"n_tok")
      .select($"doc_id", $"source", $"n_tok",
        floor($"start_off" / budget).as("seq_id"),
        ($"start_off" % budget).as("seq_off"))
      .orderBy($"source".asc_nulls_first, $"doc_id".asc_nulls_first)
  }

  /** L92 — packing-fragmentation audit: the writer-side quality
    * metric of L22's concat-and-chunk packing — how many documents
    * get SPLIT across a sequence boundary (their attention span
    * broken mid-document), per source: doc count, sequence count,
    * boundary-crossing docs, and the crossing rate in integer
    * per-mille. A training team reads this curve before picking the
    * sequence budget (512 here — the L22 contract); a high crossing
    * rate argues for document-aware packing. Same two-phase running
    * sum as q_pack_sequences (one scalableCumsum per source — no
    * whole-source single-task sort), then pure integer arithmetic:
    * a doc crosses iff its first and last token land in different
    * budget-sized chunks ((cum−n_tok) div B < (cum−1) div B;
    * zero-token docs span nothing and never cross). All-integer
    * output, zero tie surface. */
  /** The pow-2 padding buckets L99 audits — shared between the
    * engine's when-chain and the oracle's CASE chain so the two can
    * never drift; pure integer comparisons, no log2 float surface
    * (ceil(log2(2^k)) is a 1-ulp coin flip across engines). */
  private[graft] val lengthBuckets: Seq[Long] =
    Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L, 8192L)

  /** L99 — padding-waste audit for batch construction: if sequences
    * batch by pow-2 length bucket (the pad-to-bucket alternative to
    * L22's concat-and-pack), how many pad tokens does each bucket
    * burn? Per bucket: docs, real tokens, padded tokens at the
    * bucket ceiling, and the integer per-mille waste — the table a
    * batch builder reads before choosing bucket boundaries or
    * switching to packing (L92 prices packing's fragmentation; this
    * prices bucketing's padding — the two sides of the same
    * trade). Scale shape: one codegen projection (token count +
    * integer when-chain bucket) over the documents scan + a
    * ≤\|buckets\|-row hash agg — partial aggregation makes the
    * shuffle \|buckets\|×\|tasks\| rows at any corpus size.
    * All-integer output; waste_pm is one exact floor division. */
  def qLengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = size(toks($"text")).cast("long")
    val bucket = lengthBuckets.tail.foldLeft(
      when(n <= lengthBuckets.head, lengthBuckets.head)) {
      (acc, b) => acc.when(n <= b, b)
    }.otherwise(lit(16384L))
    Tables.documents(spark, dir)
      .select(bucket.as("bucket"), n.as("n_tok"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      .select($"bucket", $"n_docs", $"n_tokens",
        ($"n_docs" * $"bucket").as("n_padded"),
        ($"n_docs" * $"bucket" - $"n_tokens").as("n_waste"),
        expr("(n_docs * bucket - n_tokens) * 1000 div (n_docs * bucket)")
          .as("waste_pm"))
      .orderBy($"bucket".asc_nulls_first)
  }

  def qPackFragmentation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 512L
    val base = Tables.documents(spark, dir)
      .select($"doc_id", $"source", size(toks($"text")).cast("long").as("n_tok"))
    Skew.scalableCumsum(base, Seq("source"), Seq($"doc_id".asc),
        $"n_tok", "cum")
      .select($"source", $"n_tok", $"cum",
        expr(s"(cum - n_tok) div $budget").as("sa"),
        expr(s"(cum - 1) div $budget").as("sb"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        expr(s"(max(cum) + ${budget - 1}) div $budget").as("n_seqs"),
        sum(($"n_tok" > 0 && $"sb" > $"sa").cast("long")).as("n_split_docs"))
      .withColumn("split_x1000", expr("(n_split_docs * 1000) div n_docs"))
      .orderBy($"source".asc_nulls_first)
  }

  /** L23 — benchmark decontamination: training docs sharing any
    * 8-gram with the benchmark set (stand-in: doc_id % 10 == 0 — a
    * deterministic eval split both engines agree on). Reads the
    * shared memoized gram table ([[docGrams8]]); the benchmark gram
    * set is DISTINCT'd then joined — at 100 TB that side is
    * benchmark-sized (thousands of docs), a true broadcast dim,
    * while the training grams stream through the semi-join without
    * ever materializing. Output is (doc, distinct matched grams) —
    * integer-exact. */
  def qContamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the shared memoized gram table ([[docGrams8]] — per-doc
    // DISTINCT grain; both aggregations below are distinct-safe)
    val grams = docGrams8(spark, dir).select($"doc_id", $"gram")
    val bench = grams.filter($"doc_id" % 10 === 0)
      .select($"gram").distinct()
    grams.filter($"doc_id" % 10 =!= 0)
      .join(broadcast(bench), "gram")
      .groupBy($"doc_id")
      .agg(count_distinct($"gram").as("hits"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** L24 — domain mixture resampling: downsample each source to its
    * configured mixture weight, deterministically. Per-source keep
    * fraction = min(1, w·8/N_s) where w is the domain's weight (a
    * config-dim stand-in derived from the source id) and N_s its doc
    * count; a doc survives iff its SHA-256-derived u16 falls below
    * frac·65536 — the same reproducible-sampling contract as
    * q_hash_sample (any engine, any run, any partitioning). The
    * per-source (count, weight) table is domain-cardinality — a true
    * broadcast dim at 100 TB — while the docs stream through one
    * pipelined filter; no RNG, no shuffle of the corpus. */
  def qMixtureSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val dims = docs.groupBy($"source").agg(count(lit(1)).as("n_s"))
      .withColumn("w", substring($"source", 4, 10).cast("long") % 4 + 1)
      .withColumn("frac", least(lit(1.0), $"w" * 8.0 / $"n_s"))
    docs.select($"doc_id", $"source")
      .join(broadcast(dims), "source")
      .filter(u16($"doc_id") < $"frac" * 65536.0)
      .select($"doc_id", $"source")
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** L25 — intra-document repetition (the repeated-n-gram quality
    * rule): share of a doc's 3-grams that are duplicates of an
    * earlier 3-gram in the SAME doc — boilerplate and looping text
    * score high and get filtered before training. Grams are built
    * positionally in the projection; total and distinct counts are
    * one hash-agg keyed by doc_id (the explode multiplies rows
    * in-stage; the only shuffle carries (doc_id, gram) pairs). The
    * ratio is integer-exact before one rounded division; the flag
    * threshold is integer math (5·dup > total ⇔ ratio > 0.2). */
  def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    repetitionCounts(Tables.documents(spark, dir))
      .select($"doc_id", $"n3", $"d3",
        round(($"n3" - $"d3").cast("double") / $"n3", 6).as("rep_ratio"),
        (($"n3" - $"d3") * 5 > $"n3").cast("int").as("flagged"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** The per-doc 3-gram total/distinct counts qRepetition scores —
    * split out (r10) so Text.qGateFunnel reuses the EXACT gram
    * arithmetic (docs under 3 tokens are absent; funnel consumers
    * left-join and coalesce the flag to 0). */
  private[graft] def repetitionCounts(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // PURE projection (r15): both counts are per-doc array facts —
    // n3 = gram count, d3 = |distinct grams| via array_distinct —
    // so the pre-r15 explode + doc-keyed hash-agg (this family's
    // only shuffle) disappears; identical integers by definition.
    docs
      .select($"doc_id", toks($"text").as("t"))
      .filter(size($"t") >= 3)
      .select($"doc_id", transform(
        sequence(lit(1), size($"t") - 2),
        i => array_join(slice($"t", i, lit(3)), " ")).as("g"))
      .select($"doc_id",
        size($"g").cast("long").as("n3"),
        size(array_distinct($"g")).cast("long").as("d3"))
  }

  /** L26 — cross-doc duplicate n-gram coverage (the corpus-level dedup
    * *metric*, complementing the pair-producing dedup ops): per doc,
    * the share of its DISTINCT 8-grams that occur in at least one
    * OTHER document. Reads the shared memoized gram table
    * ([[docGrams8]] — per-doc distinct grain, so df counts
    * documents, not occurrences); one vocabulary-keyed hash-agg
    * builds df and one doc-keyed agg folds the share — the only
    * shuffles carry (doc_id, gram) pairs, never document bodies.
    * Flag threshold is integer (5·dup > total). */
  def qNgramCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = docGrams8(spark, dir).select($"doc_id", $"gram")
    val df = g.groupBy($"gram").agg(count(lit(1)).as("df"))
    g.join(df, "gram")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n8"),
        sum(($"df" > 1).cast("long")).as("dup8"))
      .select($"doc_id", $"n8", $"dup8",
        round($"dup8".cast("double") / $"n8", 6).as("dup_share"),
        ($"dup8" * 5 > $"n8").cast("int").as("flagged"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** L27 — deterministic train/val/test split assignment: the 3-way
    * sibling of q_hash_sample's keep-filter. A doc's split is a pure
    * function of its id (SHA-256 u16 against 80/10/10 thresholds) —
    * stable across engines, runs, partitionings, and corpus growth
    * (adding docs never moves an existing one between splits, which
    * a modulo-on-row-number scheme cannot promise). Zero shuffles:
    * the assignment is a projection; the trailing sort is only the
    * oracle's determinism contract. */
  def qSplitAssign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", splitOf(u16($"doc_id")).as("split"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** L64 — cross-split contamination audit (the composition a real
    * pre-training pipeline always runs after splitting): does any
    * val/test doc share a positional 8-gram with a TRAIN doc? A
    * val/test doc whose text leaks into train overstates every eval
    * run on it; this emits, per held-out doc, its distinct-8-gram
    * count, how many of those grams occur in ≥1 train doc, and a
    * leak flag. Composes L27's hash-threshold split (sha-256 u16 vs
    * 80/10/10 — growth-stable, engine-independent) with L23's
    * positional 8-grams.
    *
    * Scale shape: reads the shared memoized gram table
    * ([[docGrams8]] — ONE sha-256 per doc with the split attached
    * before the gram explode, grams distinct'd in-stage, so the
    * shuffle carries (doc, gram) pairs at distinct-gram grain). The
    * train gram set is corpus-sized — unlike L23's benchmark side it
    * is NEVER broadcast: held-out grams meet it in a plain shuffle
    * hash join on the gram key. Output is all-integer (no round
    * site, nothing for the tie sweep to flag); ORDER BY integer
    * doc_id. */
  def qSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = docGrams8(spark, dir)
    val train = g.filter($"split" === "train")
      .select($"gram").distinct()
      .withColumn("in_train", lit(1))
    g.filter($"split" =!= "train")
      .join(train, Seq("gram"), "left")
      .groupBy($"doc_id", $"split")
      .agg(count(lit(1)).as("n8"),
        sum(coalesce($"in_train", lit(0))).cast("long").as("leak8"))
      .select($"doc_id", $"split", $"n8", $"leak8",
        ($"leak8" > 0).cast("int").as("leaked"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** L65 — fixed-budget stratified selection (largest-remainder /
    * Hamilton allocation): build an exactly-B-document eval set whose
    * per-source composition mirrors the corpus, the step after L58
    * designs weights and L24 resamples by fraction — an eval set
    * needs an EXACT total, and per-source floors + remainder top-ups
    * are the standard exact apportionment. quota_s =
    * floor(B·n_s/N) + 1 for the (B − Σfloor) sources with the
    * largest remainders (rank by (B·n_s mod N) desc, source asc —
    * a total order, so the allocation is unique). Each source then
    * contributes its quota of docs by sha-256 rank — the same
    * reproducible-selection contract as q_hash_sample (any engine,
    * any partitioning, stable under corpus growth of OTHER sources).
    *
    * Scale shape: counts, remainders, and the remainder RANK all
    * live at source grain (≤ |sources| rows — the rank is computed
    * by a bounded self-join count rather than an unpartitioned
    * window, keeping the no-global-window contract); the quota table
    * is a true broadcast dim. Doc-grain work (r12): candidates are
    * PREFILTERED by a u16 sha-prefix threshold at 4× each source's
    * quota fraction — u16 is the integer value of the first 4 hex
    * chars, so `u16 ≤ T` keeps a PREFIX of the (sha asc, doc_id asc)
    * selection order and cannot change which docs rank first — and
    * the bound is VERIFIED by count per source: a source whose
    * survivor count falls short of its quota (binomial tail,
    * p < 10⁻⁶ at 4×) falls back to ranking all its rows, so the
    * output is exact, never probabilistic. The rank itself is
    * [[Skew.scalableRank]]'s two-phase form, so even the fallback
    * never sorts a whole source on one task. Output is
    * the selected docs, all-integer: exactly B rows whenever every
    * source can fill its quota, which Hamilton guarantees for
    * B ≤ N/2 (quota ≤ ⌊B·n_s/N⌋+1 ≤ n_s then) — true by orders of
    * magnitude at every driver SF (N ≥ 500, B = 100). A smaller
    * corpus under-fills rather than erroring (rk ≤ quota caps at
    * capacity); a production run would assert the output count. */
  def qBudgetSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 100L
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source")
    val per = docs.groupBy($"source").agg(count(lit(1)).as("n_s"))
    val tot = per.agg(sum($"n_s").as("n"))
    val alloc = per.crossJoin(broadcast(tot))
      .select($"source", $"n_s",
        expr(s"(n_s * $budget) div n").as("base"),
        expr(s"(n_s * $budget) % n").as("rem"))
    // remainder rank via bounded self-join count (|sources|² pairs):
    // rr = 1 + #sources strictly ahead in (rem desc, source asc)
    val rr = alloc.as("a")
      .join(alloc.select($"source".as("bs"), $"rem".as("brem")),
        $"brem" > $"rem" || ($"brem" === $"rem" && $"bs" < $"source"),
        "left")
      .groupBy($"source", $"n_s", $"base", $"rem")
      .agg((count($"bs") + 1).as("rr"))
    val leftover = alloc.agg((lit(budget) - sum($"base")).as("extra"))
    val quota = rr.crossJoin(broadcast(leftover))
      .select($"source", $"n_s",
        ($"base" + when($"rr" <= $"extra", 1L).otherwise(0L)).as("quota"))
      // T = 65536·4·quota/n_s, capped: the u16 threshold that keeps
      // ~4× the quota fraction of each source's docs as candidates
      .withColumn("t_u16",
        least(lit(65535L), expr("(262144 * quota) div n_s")))
    val sha = docs
      .withColumn("sha", sha2($"doc_id".cast("string"), 256))
      .withColumn("u16", expr("CAST(conv(substring(sha, 1, 4), 16, 10) AS BIGINT)"))
      .join(quota, "source")
      // two consumers (survivor count + candidate filter) — one
      // materialization of the doc-grain digest table
      .transform(Ckpt.mat)
    // count-verified prefilter: a source keeps only its u16-prefix
    // candidates when enough survive to fill the quota; otherwise it
    // ranks all rows (exactness never depends on the tail bound)
    val surv = sha.filter($"u16" <= $"t_u16")
      .groupBy($"source").agg(count(lit(1)).as("n_surv"))
    val cand = sha.join(surv, Seq("source"), "left")
      .filter(coalesce($"n_surv", lit(0L)) < $"quota" || $"u16" <= $"t_u16")
    Skew.scalableRank(
        cand.select($"doc_id", $"source", $"sha", $"quota"),
        Seq("source"), Seq($"sha".asc, $"doc_id".asc), "rk")
      .filter($"rk" <= $"quota")
      .select($"doc_id", $"source", $"rk")
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** L28 — vocabulary growth (Heaps-law curve) per source: how many
    * NEW tokens each document introduces to its source's stream, and
    * the running vocabulary size. Two hash-aggs (token→first doc,
    * then doc→new-token count) shrink the data to vocabulary
    * cardinality BEFORE the accumulation; the running sum is the
    * two-phase [[Skew.scalableCumsum]] (r12) keyed by source, so no
    * single task ever holds a whole source's curve — exactly how a
    * per-domain ingest monitor would run it. All integers. */
  def qVocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the shared memoized [[docTermFreq]] (r15) IS the per-doc
    // distinct (source, doc_id, tok) table this first agg consumed
    val perDoc = docTermFreq(spark, dir)
      .groupBy($"source", $"tok").agg(min($"doc_id").as("first_doc"))
      .groupBy($"source", $"first_doc").agg(count(lit(1)).as("new_toks"))
    // two-phase running sum (r12): the curve table is doc grain (one
    // row per vocabulary-introducing doc), so the per-source
    // accumulation rides scalableCumsum, not a whole-source sort
    Skew.scalableCumsum(perDoc, Seq("source"), Seq($"first_doc".asc),
        $"new_toks", "vocab_size")
      .select($"source", $"first_doc".as("doc_id"), $"new_toks", $"vocab_size")
      .orderBy($"source".asc_nulls_first, $"doc_id".asc_nulls_first)
  }

  /** L29 — corpus-level boilerplate removal (the C4/RefinedWeb "line
    * seen elsewhere in the corpus" dedup rule; this corpus has no
    * line/sentence structure, so the removal unit is a stride-8 token
    * SEGMENT): a segment whose exact text occurs in ≥ 2 DISTINCT
    * documents is boilerplate; drop it everywhere and reassemble each
    * document from its surviving segments in original order. Scale
    * shape: the cross-doc frequency table is keyed on
    * sha256(segment) — the shuffle carries 32-byte hashes + doc ids,
    * never bodies — and it joins back by plain shuffle hash join (a
    * per-segment aggregate is corpus-sized: NEVER broadcast, the L2
    * lesson). Bodies are shuffled exactly once, on doc_id, for the
    * ordered reassembly. */
  def qBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val segs = Tables.documents(spark, dir)
      .select($"doc_id", toks($"text").as("t"))
      .select($"doc_id", posexplode(transform(
        sequence(lit(0), ((size($"t") + 7) / 8).cast("int") - 1),
        i => array_join(slice($"t", i * 8 + 1, lit(8)), " "))).as(Seq("idx", "seg")))
      .withColumn("h", sha2($"seg", 256))
    val freq = segs.groupBy($"h").agg(countDistinct($"doc_id").as("ndocs"))
    segs.join(freq, "h")
      .withColumn("keep", $"ndocs" < 2)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum($"keep".cast("long")).as("n_kept"),
        concat_ws(" ", expr("transform(array_sort(collect_list(" +
          "CASE WHEN keep THEN struct(idx, seg) END)), e -> e.seg)"))
          .as("clean"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** L38 — Moore-Lewis / DSIR-style contrastive data selection: score
    * each doc by its average token log-likelihood RATIO between an
    * in-domain unigram LM (here: docs from source 'src0' — the
    * curated-slice stand-in) and the general corpus LM, both add-one
    * smoothed over the corpus vocabulary. Positive score = reads like
    * the target domain; the classic cheap selector for "find more
    * data that looks like my good data" at corpus scale.
    *
    * Plan: one token explode feeds BOTH LMs (general counts, then the
    * in-domain counts off a filtered second scan of the small slice);
    * the three normalizers (general total, in-domain total, vocab
    * size) collapse into ONE broadcast scalar row; tokens re-join the
    * two count tables by UNHINTED shuffle joins — vocabulary tables
    * are corpus-derived and never hint-broadcast. Per-token LLRs are
    * quantized to integer pico-nats and summed exactly (see e12),
    * rounded at 6 after the unscaled mean; ORDER BY integer doc_id
    * only. */
  def qMooreLewis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // tf-grain rewrite over the shared memoized [[docTermFreq]]
    // (r15) — see qUnigramLm; the in-domain slice filters the memo's
    // source column instead of re-scanning documents
    val t = docTermFreq(spark, dir)
    val gen = t.groupBy($"tok").agg(sum($"tf").as("cg"))
    val ind = t.filter($"source" === "src0")
      .groupBy($"tok").agg(sum($"tf").as("ci"))
    val scalars = gen.agg(sum($"cg").as("tg"), count(lit(1)).as("v"))
      .crossJoin(ind.agg(coalesce(sum($"ci"), lit(0L)).as("ti")))
    t.join(gen, "tok")
      .join(ind, Seq("tok"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("llr",
        log((coalesce($"ci", lit(0L)) + lit(1L)).cast("double") /
          ($"ti" + $"v")) -
        log(($"cg" + lit(1L)).cast("double") / ($"tg" + $"v")))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_toks"), sumE12W($"llr", $"tf").as("s_e12"))
      .select($"doc_id", $"n_toks",
        meanOfE12($"s_e12", $"n_toks").as("ml_score"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** L39 — per-doc token Shannon entropy + type-token ratio: the
    * lexical-diversity quality signal (spam and keyword-stuffed docs
    * sit at the low-entropy tail; boilerplate-heavy docs at low TTR).
    * entropy = ln(n) − Σ c·ln(c) / n over per-doc token counts — one
    * (doc, tok) hash-agg then one doc-keyed exact integer-term sum
    * (c·ln c quantized to pico-nats, see e12); no window, no join.
    * Floats rounded at 6 after the unscaled subtraction; ORDER BY
    * integer doc_id. */
  def qTokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the shared memoized [[docTermFreq]] IS this query's first-level
    // (doc, tok) count agg (r15) — the whole build stage disappears
    docTermFreq(spark, dir)
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_toks"), count(lit(1)).as("n_types"),
        sumE12($"tf".cast("double") * log($"tf")).as("s_e12"))
      .select($"doc_id", $"n_toks", $"n_types",
        // + 0.0: a single-type doc's entropy is ln(n) − quantized
        // mean, which can land a hair BELOW zero when the e12
        // quantize rounds the term up — DuckDB would keep −0.0
        (round(log($"n_toks") -
          $"s_e12".cast("double") / $"n_toks" / lit(1.0e12), 6)
          + lit(0.0)).as("entropy"),
        round($"n_types".cast("double") / $"n_toks", 6).as("ttr"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** L41 — per-language robust length band (the "drop the truncated
    * and the concatenated junk" curation filter): keep docs whose
    * n_chars lies inside the per-lang [p05, p95] band, with the
    * percentile picked by INTEGER rank — rank ceil(p·n) computed as
    * (p·n + 99) div 100 in pure integer math, deterministic under
    * ties via (n_chars, doc_id) ordering — so no interpolation float
    * can straddle an engine ulp. The rank + per-lang count are
    * [[Skew.scalableRank]]'s two-phase form (r12): ~5 langs over all
    * docs is the bounded-key window shape that would sort a whole
    * language on one task at 100 TB. The per-lang bounds re-join the
    * metadata — a #langs-row table Catalyst auto-broadcasts without
    * a hint. Bodies never move. */
  def qLengthTrim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val meta = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"n_chars")
    val ranked = Skew.scalableRank(meta, Seq("lang"),
      Seq($"n_chars".asc, $"doc_id".asc), "rn", Some("n"))
    val bounds = ranked
      .filter($"rn" === expr("(5 * n + 99) div 100") ||
        $"rn" === expr("(95 * n + 99) div 100"))
      .groupBy($"lang")
      .agg(min(when($"rn" === expr("(5 * n + 99) div 100"), $"n_chars"))
          .as("lo"),
        min(when($"rn" === expr("(95 * n + 99) div 100"), $"n_chars"))
          .as("hi"))
    meta.join(bounds, "lang")
      .groupBy($"lang")
      .agg(min($"lo").as("lo"), min($"hi").as("hi"),
        sum(($"n_chars" >= $"lo" && $"n_chars" <= $"hi").cast("long"))
          .as("n_kept"),
        sum(($"n_chars" < $"lo" || $"n_chars" > $"hi").cast("long"))
          .as("n_dropped"))
      .orderBy($"lang".asc_nulls_first)
  }

  /** L44 — Zipf's-law fit per source: regr_slope/regr_r2 of
    * ln(freq) on ln(rank) over each source's top-100 tokens — the
    * "does this source look like natural language" corpus-health
    * gauge (machine-generated or template spam flattens the curve).
    * Ranks are integer row_numbers with a (count desc, token asc)
    * tie-break, the regression inputs are ln of exact longs, and the
    * sums span ≤100 terms per source, so round(6) absorbs
    * accumulation-order ulp. One token shuffle + one source-keyed
    * window over the (source, token, count) grain — bodies never
    * move, and per-source term tables stay small at any corpus size
    * because the rank cap is structural. */
  /** L91 — vocabulary-coverage curve (tokenizer vocab sizing): what
    * fraction of ALL token occurrences the top-V most frequent types
    * cover, for V ∈ {1k, 2k, 4k, 8k, 16k} — the elbow curve a
    * tokenizer design reads before fixing its vocabulary size
    * (complement of L75's merge induction: this prices the OOV mass
    * each candidate size leaves behind). Scale shape: one vocab-keyed
    * count agg (map-side combinable), then the top-16384 cut is
    * orderBy+limit → TakeOrderedAndProject (per-partition heaps —
    * NEVER a global sort or an unbounded window over the
    * vocabulary, which is corpus-unbounded); rank + running coverage
    * then run inside one window over the 16 384-row
    * PARAMETER-BOUNDED cut — deliberately unpartitioned, safe
    * because the input is ≤ the vocab-size parameter at any corpus
    * size (plan-pinned: the registry sweep requires the limit below
    * any unpartitioned window). All-integer
    * accumulation; coverage is one round(6) of an identical
    * exact-long division. The corpus total is a 1-row scalar
    * broadcast (whitelist class). */
  def qVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // vocabulary counts off the shared memoized [[docTermFreq]] (r15)
    val tf = docTermFreq(spark, dir)
      .groupBy($"tok").agg(sum($"tf").as("c"))
    val tot = tf.agg(sum($"c").as("total"))
    val top = tf.orderBy($"c".desc, $"tok".asc).limit(16384)
    // deliberately unpartitioned: the input is the ≤16 384-row heap
    // cut above, bounded by the vocab-size parameter at any corpus
    // size (the registry sweep admits unpartitioned windows exactly
    // when a limit bounds their subtree)
    val w = Window.orderBy($"c".desc, $"tok".asc)
    top
      .withColumn("rnk", row_number().over(w))
      .withColumn("cum",
        sum($"c").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select($"rnk", $"cum",
        explode(array(Seq(1024, 2048, 4096, 8192, 16384).map(lit): _*))
          .as("vocab_size"))
      .filter($"rnk" <= $"vocab_size")
      .groupBy($"vocab_size")
      .agg(count(lit(1)).as("n_types"), max($"cum").as("covered_tokens"))
      .crossJoin(broadcast(tot))
      .select($"vocab_size", $"n_types", $"covered_tokens",
        round($"covered_tokens" / $"total", 6).as("coverage"))
      .orderBy($"vocab_size".asc_nulls_first)
  }

  def qZipfSlope(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // (source, tok) counts off the shared memoized [[docTermFreq]]
    // (r15): each doc carries one source, so summing tf over docs is
    // the per-source occurrence count
    val tf = docTermFreq(spark, dir)
      .groupBy($"source", $"tok").agg(sum($"tf").as("c"))
    val w = Window.partitionBy($"source")
      .orderBy($"c".desc, $"tok".asc)
    tf.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 100)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_terms"),
        round(regr_slope(log($"c"), log($"rnk")), 6).as("zipf_slope"),
        round(regr_r2(log($"c"), log($"rnk")), 6).as("zipf_r2"))
      .orderBy($"source".asc_nulls_first)
  }

  /** L45 — per-source KL divergence from the corpus token
    * distribution: Σ_t p_s(t)·ln(p_s(t)/p_c(t)) — the drift monitor a
    * curation pipeline watches to catch a source whose content shifted
    * under it. Every probability is a ratio of exact longs; the only
    * float surface is ln and the final sum, rounded at 6. The
    * (source, token) counts join the corpus-token counts UNHINTED on
    * the token key (corpus-derived — never broadcast by doctrine);
    * the 1-row corpus total is the admitted broadcast-scalar shape.
    * Per-source totals are a #sources-row aggregate joined on source.
    * All shuffles carry (token, count) pairs — never bodies. */
  def qKlDivergence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // both count tables off the shared memoized [[docTermFreq]] (r15)
    val t = docTermFreq(spark, dir)
    val st = t.groupBy($"source", $"tok").agg(sum($"tf").as("cs"))
    val stot = st.groupBy($"source").agg(sum($"cs").as("ns"))
    val c = t.groupBy($"tok").agg(sum($"tf").as("cc"))
    val tot = c.agg(sum($"cc").as("n"))
    st.join(c, "tok")
      .join(stot, "source")
      .crossJoin(broadcast(tot))
      .groupBy($"source")
      .agg(min($"ns").as("n_tokens"),
        // + 0.0: KL ≥ 0 mathematically but the float sum can dip a
        // hair below zero for a near-corpus-identical source; DuckDB
        // would keep the −0.0 after round
        (round(sum(($"cs" / $"ns") *
          log(($"cs" / $"ns") / ($"cc" / $"n"))), 6) + lit(0.0))
          .as("kl_nats"))
      .orderBy($"source".asc_nulls_first)
  }

  /** L51 — perplexity-decile bucketing: the curation view a
    * perplexity filter needs BEFORE choosing its cutoff. Each doc is
    * scored by the corpus-trained unigram LM (q_unigram_lm's exact
    * score: mean log p over its tokens), then ranked into deciles
    * WITHIN its source — per-source because LM scores are not
    * comparable across domains (code scores differ from prose
    * scores; a global cutoff would empty one source before touching
    * another, the CCNet lesson). Output is the (source, decile)
    * profile: doc count and summed score per bucket.
    *
    * Plan shape: one vocabulary-keyed count agg + scalar-broadcast
    * total + UNHINTED vocab re-join (corpus-derived — never hinted)
    * + one doc-keyed exact integer-term sum — q_unigram_lm's plan —
    * then the two-phase [[Skew.scalableNtile]] (r12: each source's
    * docs decile across the cluster's ranges, never one task's
    * sort). Ordering is (integer score, doc_id) — a TOTAL order, so
    * the derived ntile is partition-count-invariant.
    *
    * Float discipline: per-token log-probs are quantized to integer
    * pico-nats and summed exactly (see e12), then the per-doc score
    * is re-quantized ONCE to integer micro-nats
    * (round(s_e12/n/1e6) as BIGINT — round-to-int of the same
    * double agrees across engines, unlike round(x, d) whose 10^d
    * scaling re-rounds differently per engine), and the decile
    * profile SUMS those integers — an avg of 6dp-rounded doubles
    * lands on an exact .5·10⁻⁶ boundary about one row in ten
    * (sum·10⁶/n_docs hits halves whenever the integer sum ≡ n/2
    * mod n), the r6 MAE failure class, so the mean is not emitted
    * as a float at all. */
  def qPplBucket(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // tf-grain rewrite over the shared memoized [[docTermFreq]]
    // (r15) — see qUnigramLm (this query reuses its exact score)
    val t = docTermFreq(spark, dir)
    val vocab = t.groupBy($"tok").agg(sum($"tf").as("cnt"))
    val total = vocab.agg(sum($"cnt").as("total"))
    val scored = t.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .withColumn("logp", log($"cnt".cast("double") / $"total"))
      .groupBy($"doc_id", $"source")
      .agg(sum($"tf").as("n_toks"),
        sumE12W($"logp", $"tf").as("s_e12"))
      .select($"doc_id", $"source",
        round($"s_e12".cast("double") / $"n_toks" / lit(1000000.0d))
          .cast("long").as("score_e6"))
    // two-phase ntile (r12): a source-partitioned ntile sorts each
    // source's whole doc set on one task at 100 TB; scalableNtile
    // derives the identical bucket from the two-phase rank
    Skew.scalableNtile(scored, Seq("source"),
        Seq($"score_e6".asc_nulls_first, $"doc_id".asc_nulls_first),
        10, "decile")
      .groupBy($"source", $"decile")
      .agg(count(lit(1)).as("n_docs"),
        sum($"score_e6").as("sum_logp_e6"))
      .orderBy($"source".asc_nulls_first, $"decile".asc_nulls_first)
  }

  /** L52 — cross-source vocabulary overlap: Jaccard of the token
    * VOCABULARIES of every source pair — the corpus-level lexical-
    * similarity matrix (q_dup_matrix answers "who copies whose
    * documents"; this answers "who writes in whose vocabulary" — the
    * signal for merging near-identical crawl sources before dedup).
    *
    * Plan shape: one distinct projection to (source, token) pairs —
    * vocabulary cardinality × #sources, never corpus size — then a
    * self-equi-join ON TOKEN (each token joins to at most #sources
    * rows, so the pair surface is Σ_tok |sources(tok)|² ≤ k²·|vocab|,
    * linear in vocabulary). Per-source sizes attach by an UNHINTED
    * join on source (corpus-derived); integer counts throughout,
    * division only at the final rounded projection. */
  def qSrcOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // distinct (source, tok) pairs off the shared memoized
    // [[docTermFreq]] (r15) — the memo's rows are per-doc distinct
    // already, so this distinct only collapses across docs
    val v = docTermFreq(spark, dir)
      .select($"source", $"tok")
      .distinct()
    val sizes = v.groupBy($"source").agg(count(lit(1)).as("n"))
    val inter = v.alias("a")
      .join(v.alias("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select($"source".as("src_a"), $"n".as("na")), "src_a")
      .join(sizes.select($"source".as("src_b"), $"n".as("nb")), "src_b")
      .select($"src_a", $"src_b", $"na", $"nb", $"inter",
        round($"inter" / ($"na" + $"nb" - $"inter"), 4).as("jaccard"))
      .orderBy($"src_a".asc_nulls_first, $"src_b".asc_nulls_first)
  }

  /** L58 — mixture-weight allocation (sqrt-scaling): the DESIGN step
    * that precedes L24's execution — given per-source token counts,
    * assign each source a training-mixture weight ∝ √tokens (the
    * standard compromise between proportional sampling, which lets
    * one giant crawl drown everything, and uniform sampling, which
    * over-trains tiny sources), plus the integer docs-per-10k-epoch
    * that weight buys. One source-keyed agg (≤ #sources rows), the
    * √-sum normalizer as the admitted 1-row broadcast scalar; the
    * only float surface is √ of exact longs summed over ≤ #sources
    * terms, round-6 after the division — mirrored verbatim. */
  def qDomainMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.documents(spark, dir)
      .select($"source", size(toks($"text")).as("n_toks"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
    val z = per.agg(sum(sqrt($"n_tokens".cast("double"))).as("z"))
    per.crossJoin(broadcast(z))
      .select($"source", $"n_docs", $"n_tokens",
        round(sqrt($"n_tokens".cast("double")) / $"z", 6).as("weight"),
        floor(lit(10000) * sqrt($"n_tokens".cast("double")) / $"z")
          .cast("long").as("docs_per_10k"))
      .orderBy($"source".asc_nulls_first)
  }

  /** L60 — bigram CONDITIONAL entropy H(next|cur) per doc: how
    * predictable each next token is given the current one — the
    * templated-text detector that unigram entropy (L39) misses: a
    * doc cycling a fixed phrase has healthy unigram entropy but
    * near-zero conditional entropy. The log-ratio fold decomposes:
    * −Σ cnt·ln(cnt/ctot) = Σ ctot·ln ctot − Σ cnt·ln cnt (since
    * Σ_n cnt = ctot per (doc, c)), so the whole query is a pure
    * THREE-LEVEL aggregation cascade — (doc,c,n) grain → (doc,c)
    * grain → doc grain — with NO join: each level is a partial-
    * aggregatable shuffle of strictly declining cardinality, and the
    * (doc,c)-keyed self-join of the bigram table that the ratio form
    * required (its dominant cost) disappears. Bigrams are built
    * positionally in-stage (L17's transform); shuffles carry gram
    * counts, never text.
    *
    * Determinism — the integer-term e12 mechanism (see [[e12]]):
    * both term families (cnt·ln cnt at (doc,c,n) grain, ctot·ln ctot
    * at (doc,c) grain) are NONNEGATIVE, each quantized once to
    * integer pico-nats and summed exactly via [[sumE12]] (order-free,
    * map-side combinable). H = (B − A)/N unscales the exact integer
    * difference; an all-unique-bigram doc (the r6–r8 red-row class:
    * every cnt = ctot = 1) has A = B = 0 and emits integer-zero →
    * +0.0 on both engines. B − A ≥ 0 mathematically but the two
    * quantization grids can dip the difference one pico below zero,
    * so the final round carries the standing `+ 0.0` normalization
    * (DuckDB would keep the rounded −0.0, Spark's BigDecimal Round
    * normalizes — tools/tiecheck.py's emission sweep guards it). */
  def qBigramEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // reads the shared memoized [[docBigrams]] table (r12)
    val bg = docBigrams(spark, dir)
    val cn = bg.groupBy($"doc_id", $"c", $"n").agg(count(lit(1)).as("cnt"))
    val cc = cn.groupBy($"doc_id", $"c")
      .agg(sum($"cnt").as("ctot"),
        sumE12($"cnt".cast("double") * log($"cnt".cast("double")))
          .as("a_e12"))
    cc.groupBy($"doc_id")
      .agg(sum($"ctot").as("n_bigrams"),
        sumE12($"ctot".cast("double") * log($"ctot".cast("double")))
          .as("b_e12"),
        sum($"a_e12").as("a_sum"))
      .select($"doc_id", $"n_bigrams",
        (round(($"b_e12" - $"a_sum").cast("double") / $"n_bigrams"
          / lit(1.0e12), 6) + lit(0.0)).as("h_cond"))
      .orderBy($"doc_id".asc_nulls_first)
  }

  /** L78 — CDC batch drift monitor: per source, how far the ARRIVING
    * batch's token distribution has drifted from the STANDING corpus
    * — the alarm an incremental
    * ingest loop (Text.ingestTick) watches so a source whose content
    * shifted under it is caught at arrival time, not at the next full
    * retrain. Unlike q_kl_divergence (source vs the corpus that
    * CONTAINS it — denominators never zero), batch and standing are
    * disjoint, so an unseen batch token would hit ln(p/0); the
    * standing distribution is Laplace-smoothed over the per-source
    * union vocabulary: q(t) = (c_std+1)/(n_std+V). Also reports the
    * count and probability mass of batch tokens never seen in the
    * standing corpus — the "new vocabulary" drift signal smoothing
    * alone would bury.
    *
    * Batch slice = doc_id % 7 = 3, NOT the dedup family's % 10 = 9:
    * the synthetic corpus assigns source = doc_id % 20, so any
    * mod-10 slice aliases onto exactly two sources and leaves them
    * with ZERO standing mass — a degenerate monitor. 7 is coprime to
    * 20, so every source keeps both a batch and a standing slice
    * (drift is per-source by nature; dedup keys on content and never
    * cared).
    *
    * Plan shape: one token shuffle into a (source, tok) full-outer
    * merge of the two count tables, a #sources-row total agg joined
    * back UNHINTED on source (corpus-derived — never hint-broadcast
    * by doctrine), one final per-source sum. Shuffles carry (source,
    * token, count) — never bodies; every probability is a ratio of
    * exact longs; the only float is ln and the final sum, rounded at
    * 6 (q_kl_divergence's accepted surface). */
  def qBatchDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // tf-grain rewrite over the shared memoized [[docTermFreq]]
    // (r15): the batch/standing split derives from the memo's doc_id
    val t = docTermFreq(spark, dir)
      .withColumn("is_batch", pmod($"doc_id", lit(7L)) === 3)
    val bt = t.filter($"is_batch")
      .groupBy($"source", $"tok").agg(sum($"tf").as("cbn"))
    val st = t.filter(!$"is_batch")
      .groupBy($"source", $"tok").agg(sum($"tf").as("csn"))
    val u = bt.join(st, Seq("source", "tok"), "full_outer")
      .select($"source", $"tok",
        coalesce($"cbn", lit(0L)).as("cbn"),
        coalesce($"csn", lit(0L)).as("csn"))
    val tot = u.groupBy($"source")
      .agg(sum($"cbn").as("nb"), sum($"csn").as("ns"),
        count(lit(1)).as("v"))
    u.join(tot, "source")
      .filter($"cbn" > 0)
      .groupBy($"source")
      .agg(min($"nb").as("n_batch_tokens"),
        sum(($"csn" === 0).cast("long")).as("n_new_types"),
        round(sum(when($"csn" === 0, $"cbn").otherwise(0L)) / min($"nb"), 6)
          .as("new_mass"),
        (round(sum(($"cbn" / $"nb") *
          log(($"cbn" / $"nb") / (($"csn" + 1) / ($"ns" + $"v")))), 6)
          + lit(0.0)).as("kl_nats"))
      .orderBy($"source".asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "q_batch_drift" -> (qBatchDrift _),
    "q_bigram_entropy" -> (qBigramEntropy _),
    "q_domain_mix" -> (qDomainMix _),
    "q_ppl_bucket" -> (qPplBucket _),
    "q_src_overlap" -> (qSrcOverlap _),
    "q_zipf_slope" -> (qZipfSlope _),
    "q_vocab_coverage" -> (qVocabCoverage _),
    "q_kl_divergence" -> (qKlDivergence _),
    "q_boilerplate" -> (qBoilerplate _),
    "q_unigram_lm" -> (qUnigramLm _),
    "q_ngram_coverage" -> (qNgramCoverage _),
    "q_split_assign" -> (qSplitAssign _),
    "q_split_leakage" -> (qSplitLeakage _),
    "q_budget_sample" -> (qBudgetSample _),
    "q_vocab_growth" -> (qVocabGrowth _),
    "q_repetition" -> (qRepetition _),
    "q_mixture_sample" -> (qMixtureSample _),
    "q_pack_sequences" -> (qPackSequences _),
    "q_pack_fragmentation" -> (qPackFragmentation _),
    "q_contamination" -> (qContamination _),
    "q_tfidf" -> (qTfidf _),
    "q_bm25" -> (qBm25 _),
    "q_bm25_upsert" -> (qBm25Upsert _),
    "q_length_buckets" -> (qLengthBuckets _),
    "q_rrf_fusion" -> (qRrfFusion _),
    "q_ndcg" -> (qNdcg _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_bigram_freq" -> (qBigramFreq _),
    "q_edit_distance" -> (qEditDistance _),
    "q_pmi" -> (qPmi _),
    "q_moore_lewis" -> (qMooreLewis _),
    "q_token_entropy" -> (qTokenEntropy _),
    "q_length_trim" -> (qLengthTrim _),
  )

  /** Shared oracle CTE prefix for the BM25 family (q_bm25,
    * q_rrf_fusion's lexical leg): tokenize → tf → doc lengths →
    * corpus stats → df → query terms → per-term w (textually
    * mirroring the Spark operation order) → exact pico-unit HUGEINT
    * sums → integer micro-unit scores. Ends at the `scored` CTE so
    * each consumer appends its own ranking tail. */
  private val bm25OracleCtes: String =
    """WITH tf AS (
      |  SELECT doc_id, tok AS term, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
      |    FROM documents)
      |  GROUP BY doc_id, tok),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) AS tot_len FROM dl),
      |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |qt AS (SELECT doc_id AS q_id, term FROM tf WHERE doc_id < 3),
      |qi AS (SELECT qt.q_id, qt.term,
      |    ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5)) AS idf
      |  FROM qt JOIN dft USING (term) CROSS JOIN stats s),
      |dn AS (SELECT doc_id, 0.25 +
      |    0.75 * CAST(dl.dl * s.n_docs AS DOUBLE) / s.tot_len AS dln
      |  FROM dl CROSS JOIN stats s),
      |wt AS (SELECT qi.q_id, tf.doc_id,
      |    qi.idf * (tf.tf * 2.2) / (tf.tf + 1.2 * dn.dln) AS w
      |  FROM qi JOIN tf USING (term)
      |  JOIN dn ON tf.doc_id = dn.doc_id
      |  WHERE tf.doc_id <> qi.q_id),
      |sc AS (SELECT q_id, doc_id,
      |    sum(CAST(round(w * 1e12) AS HUGEINT)) AS s
      |  FROM wt GROUP BY q_id, doc_id),
      |scored AS (SELECT q_id, doc_id,
      |    CAST(round(CAST(s AS DOUBLE) / 1e6) AS BIGINT) AS score_u6
      |  FROM sc)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_bigram_entropy" ->
      """WITH l AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), ' +') AS t
        |  FROM documents),
        |b AS (SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(t) - 1),
        |    i -> struct_pack(c := t[i], n := t[i + 1]))) AS p
        |  FROM l WHERE len(t) >= 2),
        |cn AS (SELECT doc_id, p.c AS c, p.n AS n, count(*) AS cnt
        |  FROM b GROUP BY doc_id, p.c, p.n),
        |cc AS (SELECT doc_id, c, CAST(sum(cnt) AS BIGINT) AS ctot,
        |    sum(CAST(round(CAST(cnt AS DOUBLE) *
        |      ln(CAST(cnt AS DOUBLE)) * 1e12) AS HUGEINT)) AS a_e12
        |  FROM cn GROUP BY doc_id, c)
        |SELECT doc_id, CAST(sum(ctot) AS BIGINT) AS n_bigrams,
        |  round(CAST(sum(CAST(round(CAST(ctot AS DOUBLE) *
        |      ln(CAST(ctot AS DOUBLE)) * 1e12) AS HUGEINT)) - sum(a_e12)
        |      AS DOUBLE) / CAST(sum(ctot) AS BIGINT) / 1e12, 6) + 0.0
        |    AS h_cond
        |FROM cc
        |GROUP BY doc_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_domain_mix" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(lower(text)), ' +')))
        |      AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(sqrt(n_tokens)) AS z FROM per)
        |SELECT source, n_docs, n_tokens,
        |  round(sqrt(n_tokens) / z, 6) AS weight,
        |  CAST(floor(10000 * sqrt(n_tokens) / z) AS BIGINT)
        |    AS docs_per_10k
        |FROM per CROSS JOIN tot
        |ORDER BY source ASC NULLS FIRST""".stripMargin,
    "q_ppl_bucket" ->
      """WITH t AS (SELECT doc_id, source,
        |    unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v),
        |s AS (SELECT doc_id, source,
        |    CAST(round(CAST(sum(CAST(round(ln(cnt / total) * 1e12)
        |        AS HUGEINT)) AS DOUBLE) / count(*) / 1e6) AS BIGINT)
        |      AS score_e6
        |  FROM t JOIN v USING (tok) CROSS JOIN tot
        |  GROUP BY doc_id, source),
        |d AS (SELECT source, score_e6, ntile(10) OVER (
        |    PARTITION BY source
        |    ORDER BY score_e6 ASC NULLS FIRST, doc_id ASC) AS decile
        |  FROM s)
        |SELECT source, decile, count(*) AS n_docs,
        |  CAST(sum(score_e6) AS BIGINT) AS sum_logp_e6
        |FROM d GROUP BY source, decile
        |ORDER BY source ASC NULLS FIRST, decile ASC NULLS FIRST""".stripMargin,
    "q_src_overlap" ->
      """WITH v AS (SELECT DISTINCT source, tok FROM (
        |    SELECT source,
        |      unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |    FROM documents)),
        |sz AS (SELECT source, count(*) AS n FROM v GROUP BY source),
        |i AS (SELECT a.source AS src_a, b.source AS src_b,
        |    count(*) AS inter
        |  FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT src_a, src_b, sa.n AS na, sb.n AS nb, inter,
        |  round(inter / (sa.n + sb.n - inter), 4) AS jaccard
        |FROM i
        |JOIN sz sa ON src_a = sa.source
        |JOIN sz sb ON src_b = sb.source
        |ORDER BY src_a ASC NULLS FIRST, src_b ASC NULLS FIRST""".stripMargin,
    "q_vocab_coverage" ->
      """WITH t AS (SELECT
        |    unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |  FROM documents),
        |tf AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM tf),
        |top AS (SELECT tok, c FROM tf ORDER BY c DESC, tok ASC
        |  LIMIT 16384),
        |r AS (SELECT c,
        |    row_number() OVER (ORDER BY c DESC, tok ASC) AS rnk,
        |    CAST(sum(c) OVER (ORDER BY c DESC, tok ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM top),
        |e AS (SELECT v.vocab_size, r.rnk, r.cum
        |  FROM r, (VALUES (1024), (2048), (4096), (8192), (16384))
        |    v(vocab_size)
        |  WHERE r.rnk <= v.vocab_size)
        |SELECT vocab_size, count(*) AS n_types,
        |  CAST(max(cum) AS BIGINT) AS covered_tokens,
        |  round(CAST(max(cum) AS DOUBLE) / total, 6) AS coverage
        |FROM e CROSS JOIN tot
        |GROUP BY vocab_size, total
        |ORDER BY vocab_size ASC NULLS FIRST""".stripMargin,
    "q_zipf_slope" ->
      """WITH t AS (SELECT source,
        |    unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |  FROM documents),
        |tf AS (SELECT source, tok, count(*) AS c FROM t GROUP BY source, tok),
        |r AS (SELECT source, c,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY c DESC, tok ASC) AS rnk
        |  FROM tf)
        |SELECT source, count(*) AS n_terms,
        |  round(regr_slope(ln(c), ln(rnk)), 6) AS zipf_slope,
        |  round(regr_r2(ln(c), ln(rnk)), 6) AS zipf_r2
        |FROM r WHERE rnk <= 100
        |GROUP BY source
        |ORDER BY source ASC NULLS FIRST""".stripMargin,
    "q_batch_drift" ->
      """WITH t AS (SELECT source, doc_id % 7 = 3 AS is_batch,
        |    unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |  FROM documents),
        |bt AS (SELECT source, tok, count(*) AS cbn
        |  FROM t WHERE is_batch GROUP BY source, tok),
        |st AS (SELECT source, tok, count(*) AS csn
        |  FROM t WHERE NOT is_batch GROUP BY source, tok),
        |u AS (SELECT coalesce(bt.source, st.source) AS source,
        |    coalesce(bt.tok, st.tok) AS tok,
        |    coalesce(cbn, 0) AS cbn, coalesce(csn, 0) AS csn
        |  FROM bt FULL OUTER JOIN st
        |    ON bt.source = st.source AND bt.tok = st.tok),
        |tot AS (SELECT source, CAST(sum(cbn) AS BIGINT) AS nb,
        |    CAST(sum(csn) AS BIGINT) AS ns, count(*) AS v
        |  FROM u GROUP BY source)
        |SELECT u.source, min(nb) AS n_batch_tokens,
        |  CAST(sum(CASE WHEN csn = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new_types,
        |  round(CAST(sum(CASE WHEN csn = 0 THEN cbn ELSE 0 END) AS BIGINT)
        |    / min(nb), 6) AS new_mass,
        |  round(sum((cbn / nb) * ln((cbn / nb)
        |    / ((csn + 1) / (ns + v)))), 6) + 0.0 AS kl_nats
        |FROM u JOIN tot ON u.source = tot.source
        |WHERE cbn > 0
        |GROUP BY u.source
        |ORDER BY u.source ASC NULLS FIRST""".stripMargin,
    "q_kl_divergence" ->
      """WITH t AS (SELECT source,
        |    unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |  FROM documents),
        |st AS (SELECT source, tok, count(*) AS cs FROM t GROUP BY source, tok),
        |stot AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns
        |  FROM st GROUP BY source),
        |c AS (SELECT tok, count(*) AS cc FROM t GROUP BY tok),
        |tot AS (SELECT CAST(sum(cc) AS BIGINT) AS n FROM c)
        |SELECT st.source, min(ns) AS n_tokens,
        |  round(sum((cs / ns) * ln((cs / ns) / (cc / n))), 6) + 0.0
        |    AS kl_nats
        |FROM st
        |JOIN c ON st.tok = c.tok
        |JOIN stot ON st.source = stot.source
        |CROSS JOIN tot
        |GROUP BY st.source
        |ORDER BY st.source ASC NULLS FIRST""".stripMargin,
    "q_moore_lewis" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |  FROM documents),
        |gen AS (SELECT tok, count(*) AS cg FROM t GROUP BY tok),
        |ind AS (SELECT tok, count(*) AS ci
        |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), ' +'))
        |          AS tok
        |        FROM documents WHERE source = 'src0')
        |  GROUP BY tok),
        |s AS (SELECT
        |    (SELECT CAST(sum(cg) AS BIGINT) FROM gen) AS tg,
        |    (SELECT count(*) FROM gen) AS v,
        |    (SELECT CAST(coalesce(sum(ci), 0) AS BIGINT) FROM ind) AS ti)
        |SELECT doc_id, count(*) AS n_toks,
        |  round(CAST(sum(CAST(round((
        |        ln(CAST(coalesce(ci, 0) + 1 AS DOUBLE) / (ti + v))
        |        - ln(CAST(cg + 1 AS DOUBLE) / (tg + v))) * 1e12)
        |      AS HUGEINT)) AS DOUBLE) / count(*) / 1e12, 6) + 0.0
        |    AS ml_score
        |FROM t JOIN gen USING (tok) LEFT JOIN ind USING (tok) CROSS JOIN s
        |GROUP BY doc_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_token_entropy" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    sum(CAST(round(CAST(c AS DOUBLE) * ln(c) * 1e12) AS HUGEINT))
        |      AS s_e12
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n_toks, n_types,
        |  round(ln(n_toks) - CAST(s_e12 AS DOUBLE) / n_toks / 1e12, 6)
        |    + 0.0 AS entropy,
        |  round(CAST(n_types AS DOUBLE) / n_toks, 6) AS ttr
        |FROM a
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_length_trim" ->
      """WITH r AS (SELECT doc_id, lang, n_chars,
        |    row_number() OVER
        |      (PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents),
        |b AS (SELECT lang,
        |    min(CASE WHEN rn = (5 * n + 99) // 100 THEN n_chars END) AS lo,
        |    min(CASE WHEN rn = (95 * n + 99) // 100 THEN n_chars END) AS hi
        |  FROM r
        |  WHERE rn = (5 * n + 99) // 100 OR rn = (95 * n + 99) // 100
        |  GROUP BY lang)
        |SELECT lang, min(lo) AS lo, min(hi) AS hi,
        |  CAST(sum(CASE WHEN n_chars >= lo AND n_chars <= hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN n_chars < lo OR n_chars > hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM documents JOIN b USING (lang)
        |GROUP BY lang
        |ORDER BY lang ASC NULLS FIRST""".stripMargin,
    "q_unigram_lm" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v)
        |SELECT doc_id, count(*) AS n_toks,
        |  round(CAST(sum(CAST(round(ln(cnt / total) * 1e12) AS HUGEINT))
        |      AS DOUBLE) / count(*) / 1e12, 6) + 0.0 AS avg_logp
        |FROM t JOIN v USING (tok) CROSS JOIN tot
        |GROUP BY doc_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_boilerplate" ->
      """WITH a AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), ' +') AS arr
        |  FROM documents),
        |e AS (SELECT doc_id, i,
        |    array_to_string(list_slice(arr, 8 * i + 1, 8 * i + 8), ' ') AS seg
        |  FROM a, UNNEST(generate_series(0,
        |    CAST(ceil(len(arr) / 8.0) AS BIGINT) - 1)) AS t(i)),
        |df AS (SELECT seg, count(DISTINCT doc_id) AS ndocs FROM e GROUP BY seg),
        |k AS (SELECT e.doc_id, e.i, e.seg, (df.ndocs < 2) AS keep
        |  FROM e JOIN df USING (seg))
        |SELECT doc_id, count(*) AS n_segs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY i),
        |    '') AS clean
        |FROM k GROUP BY doc_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_ngram_coverage" ->
      """WITH tok AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), ' +') AS t FROM documents),
        |g AS (SELECT DISTINCT doc_id, gram FROM (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(t) - 7),
        |      i -> array_to_string(t[i:i+7], ' '))) AS gram
        |    FROM tok WHERE len(t) >= 8)),
        |df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)
        |SELECT g.doc_id, count(*) AS n8,
        |  CAST(sum(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup8,
        |  round(CAST(sum(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS dup_share,
        |  CAST(sum(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) * 5 > count(*)
        |    AS INT) AS flagged
        |FROM g JOIN df ON g.gram = df.gram
        |GROUP BY g.doc_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_split_assign" ->
      """SELECT doc_id, lang,
        |  CASE WHEN u16 < 0.8 * 65536 THEN 'train'
        |       WHEN u16 < 0.9 * 65536 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang,
        |  CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 4))
        |    AS BIGINT) AS u16 FROM documents)
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_split_leakage" ->
      """WITH tok AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), ' +') AS t FROM documents),
        |s AS (SELECT doc_id,
        |    CASE WHEN u16 < 0.8 * 65536 THEN 'train'
        |         WHEN u16 < 0.9 * 65536 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |    CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 4))
        |      AS BIGINT) AS u16 FROM documents)),
        |g AS (SELECT DISTINCT doc_id, gram FROM (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(t) - 7),
        |      i -> array_to_string(t[i:i+7], ' '))) AS gram
        |    FROM tok WHERE len(t) >= 8)),
        |gs AS (SELECT g.doc_id, s.split, g.gram
        |  FROM g JOIN s USING (doc_id)),
        |tr AS (SELECT DISTINCT gram FROM gs WHERE split = 'train')
        |SELECT gs.doc_id, gs.split, count(*) AS n8,
        |  CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS leak8,
        |  CAST(sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
        |    AS INT) AS leaked
        |FROM gs LEFT JOIN tr ON gs.gram = tr.gram
        |WHERE gs.split <> 'train'
        |GROUP BY gs.doc_id, gs.split
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_budget_sample" ->
      """WITH per AS (SELECT source, count(*) AS n_s
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM per),
        |alloc AS (SELECT source, n_s,
        |    CAST((n_s * 100) // n AS BIGINT) AS base,
        |    CAST((n_s * 100) % n AS BIGINT) AS rem
        |  FROM per CROSS JOIN tot),
        |rr AS (SELECT a.source, a.base,
        |    CAST(1 + count(b.source) AS BIGINT) AS rr
        |  FROM alloc a LEFT JOIN alloc b
        |    ON b.rem > a.rem OR (b.rem = a.rem AND b.source < a.source)
        |  GROUP BY a.source, a.base),
        |lo AS (SELECT 100 - CAST(sum(base) AS BIGINT) AS extra FROM alloc),
        |quota AS (SELECT source,
        |    base + (CASE WHEN rr <= extra THEN 1 ELSE 0 END) AS quota
        |  FROM rr CROSS JOIN lo),
        |r AS (SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY sha256(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
        |    AS rk
        |  FROM documents)
        |SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk
        |FROM r JOIN quota USING (source)
        |WHERE r.rk <= quota.quota
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_vocab_growth" ->
      """WITH t AS (SELECT DISTINCT source, doc_id, tok FROM (
        |  SELECT source, doc_id,
        |    unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |  FROM documents)),
        |fst AS (SELECT source, tok, min(doc_id) AS first_doc
        |  FROM t GROUP BY source, tok),
        |per AS (SELECT source, first_doc, count(*) AS new_toks
        |  FROM fst GROUP BY source, first_doc)
        |SELECT source, first_doc AS doc_id, new_toks,
        |  CAST(sum(new_toks) OVER (PARTITION BY source
        |    ORDER BY first_doc ASC ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS vocab_size
        |FROM per
        |ORDER BY source ASC NULLS FIRST, doc_id ASC NULLS FIRST""".stripMargin,
    "q_repetition" ->
      """WITH tok AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), ' +') AS t FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(t) - 2),
        |    i -> array_to_string(t[i:i+2], ' '))) AS gram
        |  FROM tok WHERE len(t) >= 3),
        |agg AS (SELECT doc_id, count(*) AS n3,
        |    count(DISTINCT gram) AS d3 FROM g GROUP BY doc_id)
        |SELECT doc_id, CAST(n3 AS BIGINT) AS n3, CAST(d3 AS BIGINT) AS d3,
        |  round(CAST(n3 - d3 AS DOUBLE) / n3, 6) AS rep_ratio,
        |  CAST((n3 - d3) * 5 > n3 AS INT) AS flagged
        |FROM agg
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_mixture_sample" ->
      """WITH dims AS (
        |  SELECT source, count(*) AS n_s,
        |    CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS w
        |  FROM documents GROUP BY source),
        |fr AS (SELECT source, least(1.0, w * 8.0 / n_s) AS frac FROM dims)
        |SELECT doc_id, d.source
        |FROM documents d JOIN fr ON d.source = fr.source
        |WHERE CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 4))
        |    AS BIGINT) < frac * 65536.0
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_pack_fragmentation" ->
      """WITH tok AS (SELECT doc_id, source,
        |    len(string_split_regex(trim(lower(text)), ' +')) AS n_tok
        |  FROM documents),
        |packed AS (SELECT source, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM tok)
        |SELECT source, count(*) AS n_docs,
        |  CAST((max(cum) + 511) // 512 AS BIGINT) AS n_seqs,
        |  CAST(sum(CASE WHEN n_tok > 0
        |      AND (cum - 1) // 512 > (cum - n_tok) // 512
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
        |  CAST(sum(CASE WHEN n_tok > 0
        |      AND (cum - 1) // 512 > (cum - n_tok) // 512
        |    THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
        |    AS split_x1000
        |FROM packed
        |GROUP BY source
        |ORDER BY source ASC NULLS FIRST""".stripMargin,
    "q_pack_sequences" ->
      """WITH tok AS (SELECT doc_id, source,
        |    len(string_split_regex(trim(lower(text)), ' +')) AS n_tok
        |  FROM documents),
        |packed AS (SELECT doc_id, source, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
        |  FROM tok)
        |SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(start_off // 512 AS BIGINT) AS seq_id,
        |  CAST(start_off % 512 AS BIGINT) AS seq_off
        |FROM packed
        |ORDER BY source ASC NULLS FIRST, doc_id ASC NULLS FIRST""".stripMargin,
    "q_contamination" ->
      """WITH tok AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), ' +') AS t FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(t) - 7),
        |    i -> array_to_string(t[i:i+7], ' '))) AS gram
        |  FROM tok WHERE len(t) >= 8),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0)
        |SELECT g.doc_id, count(DISTINCT g.gram) AS hits
        |FROM g JOIN bench ON g.gram = bench.gram
        |WHERE g.doc_id % 10 <> 0
        |GROUP BY g.doc_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "q_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id, tok),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, tf.term, tf,
        |  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        |WHERE tf >= 2
        |ORDER BY doc_id ASC NULLS FIRST, tf.term ASC NULLS FIRST""".stripMargin,
    "q_bm25" ->
      (bm25OracleCtes +
        """,
          |r AS (SELECT q_id, doc_id, score_u6,
          |    row_number() OVER (PARTITION BY q_id
          |      ORDER BY score_u6 DESC, doc_id ASC) AS rnk
          |  FROM scored)
          |SELECT q_id, doc_id, rnk, score_u6 FROM r WHERE rnk <= 10
          |ORDER BY q_id ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin),
    "q_length_buckets" -> {
      // CASE chain generated from the SAME bucket list as the engine
      val chain = lengthBuckets.map(b => s"WHEN n <= $b THEN $b").mkString(" ")
      s"""WITH d AS (SELECT len(string_split_regex(trim(lower(text)), ' +')) AS n
         |  FROM documents),
         |b AS (SELECT CASE $chain ELSE 16384 END AS bucket, n FROM d),
         |g AS (SELECT bucket, count(*) AS n_docs, sum(n) AS n_tokens
         |  FROM b GROUP BY bucket)
         |SELECT CAST(bucket AS BIGINT) AS bucket, n_docs,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(n_docs * bucket AS BIGINT) AS n_padded,
         |  CAST(n_docs * bucket - n_tokens AS BIGINT) AS n_waste,
         |  CAST((n_docs * bucket - n_tokens) * 1000 // (n_docs * bucket)
         |    AS BIGINT) AS waste_pm
         |FROM g ORDER BY bucket ASC NULLS FIRST""".stripMargin
    },
    // the engine merges standing + batch incrementally; the oracle
    // rebuilds from scratch over the full corpus — incremental ==
    // rebuild IS the CDC contract under audit
    "q_bm25_upsert" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS tot_len FROM dl),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |idf AS (SELECT term,
        |    ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5)) AS idf
        |  FROM dft CROSS JOIN stats s),
        |dn AS (SELECT doc_id, 0.25 +
        |    0.75 * CAST(dl.dl * s.n_docs AS DOUBLE) / s.tot_len AS dln
        |  FROM dl CROSS JOIN stats s)
        |SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
        |  CAST(round(idf.idf * 1e6) AS BIGINT) AS idf_u6,
        |  CAST(round(dn.dln * 1e6) AS BIGINT) AS dln_u6
        |FROM tf JOIN idf USING (term) JOIN dn USING (doc_id)
        |ORDER BY doc_id ASC NULLS FIRST, term ASC NULLS FIRST""".stripMargin,
    "q_rrf_fusion" ->
      (bm25OracleCtes +
        """,
          |lex AS (SELECT q_id, doc_id, r_lex FROM (
          |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
          |      ORDER BY score_u6 DESC, doc_id ASC) AS r_lex
          |    FROM scored)
          |  WHERE r_lex <= 20),
          |pe AS (SELECT vec_id, label,
          |    generate_subscripts(embedding, 1) AS i,
          |    CAST(unnest(embedding) AS DOUBLE) AS x
          |  FROM embeddings),
          |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm
          |  FROM pe GROUP BY vec_id),
          |sd AS (SELECT q.vec_id AS q_id, c.vec_id AS doc_id,
          |    sum(q.x * c.x) AS dot
          |  FROM pe q JOIN pe c ON q.i = c.i
          |  WHERE q.vec_id < 3 AND q.vec_id <> c.vec_id
          |    AND q.label = c.label
          |  GROUP BY q.vec_id, c.vec_id),
          |ss AS (SELECT q_id, doc_id,
          |    round(dot / (nq.nrm * nc.nrm), 4) + 0.0 AS sim
          |  FROM sd JOIN norms nq ON q_id = nq.vec_id
          |  JOIN norms nc ON doc_id = nc.vec_id),
          |sem AS (SELECT q_id, doc_id, r_sem FROM (
          |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
          |      ORDER BY sim DESC, doc_id ASC) AS r_sem
          |    FROM ss)
          |  WHERE r_sem <= 20),
          |f AS (SELECT q_id, doc_id,
          |    COALESCE(CAST(round(1e12 / (60 + r_lex)) AS BIGINT), 0) +
          |      COALESCE(CAST(round(1e12 / (60 + r_sem)) AS BIGINT), 0)
          |      AS rrf_u12,
          |    COALESCE(r_lex, 0) AS r_lex, COALESCE(r_sem, 0) AS r_sem
          |  FROM lex FULL JOIN sem USING (q_id, doc_id)),
          |r AS (SELECT q_id, doc_id, rrf_u12, r_lex, r_sem,
          |    row_number() OVER (PARTITION BY q_id
          |      ORDER BY rrf_u12 DESC, doc_id ASC) AS rnk
          |  FROM f)
          |SELECT q_id, doc_id, rnk, rrf_u12, r_lex, r_sem
          |FROM r WHERE rnk <= 5
          |ORDER BY q_id ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin),
    "q_ndcg" ->
      (bm25OracleCtes +
        """,
          |lex AS (SELECT q_id, doc_id, score_u6,
          |    row_number() OVER (PARTITION BY q_id
          |      ORDER BY score_u6 DESC, doc_id ASC) AS r_lex
          |  FROM scored),
          |rels AS (SELECT l.q_id, l.doc_id, l.r_lex,
          |    CASE WHEN cm.source = qm.source THEN 2
          |      WHEN cm.lang = qm.lang THEN 1 ELSE 0 END AS rel
          |  FROM lex l
          |  JOIN documents qm ON l.q_id = qm.doc_id
          |  JOIN documents cm ON l.doc_id = cm.doc_id),
          |ideal AS (SELECT q_id, rel,
          |    row_number() OVER (PARTITION BY q_id
          |      ORDER BY rel DESC, doc_id ASC) AS r_ideal
          |  FROM rels),
          |d AS (SELECT q_id, CAST(sum(CASE WHEN r_lex <= 10
          |      THEN CAST(round(rel / log2(1.0 + r_lex) * 1e12) AS BIGINT)
          |      ELSE 0 END) AS BIGINT) AS dcg_u12
          |  FROM rels GROUP BY q_id),
          |i AS (SELECT q_id, CAST(sum(CASE WHEN r_ideal <= 10
          |      THEN CAST(round(rel / log2(1.0 + r_ideal) * 1e12) AS BIGINT)
          |      ELSE 0 END) AS BIGINT) AS idcg_u12
          |  FROM ideal GROUP BY q_id)
          |SELECT d.q_id, d.dcg_u12, i.idcg_u12,
          |  CASE WHEN i.idcg_u12 > 0
          |    THEN round(CAST(d.dcg_u12 AS DOUBLE) / i.idcg_u12, 4)
          |    END AS ndcg_at_10
          |FROM d JOIN i ON d.q_id = i.q_id
          |ORDER BY d.q_id ASC NULLS FIRST""".stripMargin),
    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS token
        |  FROM documents),
        |tot AS (SELECT count(*) AS total FROM t)
        |SELECT token, count(*) AS cnt
        |FROM t CROSS JOIN tot
        |GROUP BY token, total
        |HAVING count(*) * 1000 > total
        |ORDER BY cnt DESC NULLS LAST, token ASC NULLS FIRST""".stripMargin,
    "q_bigram_freq" ->
      """WITH l AS (SELECT string_split_regex(trim(lower(text)), ' +') AS t
        |  FROM documents),
        |b AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i + 1])) AS bigram
        |  FROM l WHERE len(t) >= 2)
        |SELECT bigram, count(*) AS cnt
        |FROM b
        |GROUP BY bigram
        |ORDER BY cnt DESC NULLS LAST, bigram ASC NULLS FIRST
        |LIMIT 40""".stripMargin,
    "q_edit_distance" ->
      """SELECT a.doc_id AS da, b.doc_id AS db,
        |  levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS dist
        |FROM documents a JOIN documents b
        |  ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 10
        |ORDER BY da ASC NULLS FIRST, db ASC NULLS FIRST""".stripMargin,
    "q_pmi" ->
      """WITH t AS (SELECT DISTINCT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        |  FROM documents),
        |uni AS (SELECT tok, count(*) AS df FROM t GROUP BY tok),
        |nd AS (SELECT count(DISTINCT doc_id) AS nd FROM t),
        |pairs AS (SELECT a.tok AS ta, b.tok AS tb, count(*) AS cab
        |  FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT ta, tb, cab,
        |  round(ln(cab * nd / (ua.df * ub.df)), 6) AS pmi
        |FROM pairs
        |JOIN uni ua ON ua.tok = ta
        |JOIN uni ub ON ub.tok = tb
        |CROSS JOIN nd
        |ORDER BY cab DESC NULLS LAST, ta ASC NULLS FIRST, tb ASC NULLS FIRST
        |LIMIT 50""".stripMargin,
  )
}
