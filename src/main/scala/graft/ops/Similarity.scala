package graft.ops

import graft.{Ckpt, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2.11 L3): brute-force
  * cosine top-k as the exact baseline, and an IVF-style bucketed
  * variant as the scale path — on the driver's `embeddings` table
  * (embedding: array<float>, 64-dim; label: int = cluster id).
  *
  * Scale doctrine: the query set is broadcast (queries are always the
  * small side); the corpus is scanned once, similarity is a per-row
  * zip_with/aggregate fold (whole-stage codegen, no explode, no
  * shuffle), and per-query top-k is a windowed row_number that AQE
  * executes as partial top-k. Brute force is O(|corpus|·|queries|·d):
  * fine for thousands of queries; for millions, q_ann_ivf's bucket
  * pruning (here: the label column standing in for a k-means cell
  * assignment) cuts the scanned corpus by the bucket fanout, the
  * standard IVF trade.
  *
  * Determinism: elementwise float→double casts, sequential fold, then
  * round(sim, 4) BEFORE ranking so rank and value agree across
  * engines; ties broken on vec_id ASC.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** embedding array<float> → vec array<double> + its L2 norm.
    * graft_dot is the engine's native codegen'd dot product
    * (graft.functions.DotProduct) — same sequential summation order
    * as an aggregate∘zip_with fold, ~3× faster (no per-element
    * lambda dispatch, no intermediate array). */
  private[ops] def withVec(df: DataFrame): DataFrame = df
    .withColumn("vec", transform(col("embedding"), x => x.cast("double")))
    .withColumn("nrm", sqrt(expr("graft_dot(vec, vec)")))

  private def cosine(spark: SparkSession, dir: String,
                     sameBucketOnly: Boolean): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
    val q = base.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"label".as("q_label"),
        $"vec".as("qv"), $"nrm".as("qn"))
    val c = base.select($"vec_id".as("c_id"), $"label",
      $"vec".as("cv"), $"nrm".as("cn"))
    val cond =
      if (sameBucketOnly) $"c_id" =!= $"q_id" && $"label" === $"q_label"
      else $"c_id" =!= $"q_id"
    val w = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id".asc)
    c.join(broadcast(q), cond)
      .withColumn("dot", expr("graft_dot(qv, cv)"))
      .withColumn("sim", round($"dot" / ($"qn" * $"cn"), 4) + lit(0.0))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"q_id", $"c_id", $"rnk", $"sim")
      .orderBy($"q_id".asc_nulls_first, $"rnk".asc_nulls_first)
  }

  /** L3 — exact brute-force cosine top-3 for each query vector. */
  def qCosineTopk(spark: SparkSession, dir: String): DataFrame =
    cosine(spark, dir, sameBucketOnly = false)

  /** L3 scale path — IVF-bucketed ANN: probe only the query's own
    * cell (label = precomputed cluster assignment), then exact
    * re-rank within it. */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame =
    cosine(spark, dir, sameBucketOnly = true)

  /** Embedding-cosine near-dup (the dedup family's dense sibling):
    * all same-cell pairs with cosine ≥ 0.35 (the anomalous-similarity tail of this corpus). Cell (label) blocking
    * keeps the pair space per-cell quadratic — at 100 TB the cells
    * come from a k-means/LSH pass, exactly like q_minhash_sig's
    * bands for text. */
  def qEmbedNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
      .select($"vec_id", $"label", $"vec", $"nrm")
    val a = base.select($"vec_id".as("va"), $"label".as("la"),
      $"vec".as("ea"), $"nrm".as("na"))
    val b = base.select($"vec_id".as("vb"), $"label".as("lb"),
      $"vec".as("eb"), $"nrm".as("nb"))
    a.join(b, $"la" === $"lb" && $"va" < $"vb")
      .withColumn("sim",
        round(expr("graft_dot(ea, eb)") / ($"na" * $"nb"), 4))
      .filter($"sim" >= 0.35)
      .select($"va", $"vb", $"sim")
      .orderBy($"va".asc_nulls_first, $"vb".asc_nulls_first)
  }

  /** L12 search path, multiprobe — IVF with nprobe=2: rank the index
    * cells by (squared) centroid distance per query and probe the two
    * nearest, then exact re-rank inside the probed cells. Single-probe
    * IVF (q_ann_ivf) misses true neighbors that sit just across a cell
    * boundary; multiprobe is the standard recall knob — cost grows
    * linearly in nprobe while the scanned corpus stays
    * nprobe/k of the whole. Plan shape: the centroid table is k rows
    * (broadcast — tiny at any corpus scale), the probe list is
    * queries×nprobe rows (broadcast), and the corpus-side join is a
    * hash join on the cell label — never a nested-loop scan of
    * every (query, vector) pair. Determinism: centroids and distances
    * round to 4dp before the argmin (ties → lower label), matching
    * the oracle's formulation exactly. */
  def qAnnMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
    // index build: per-cell centroid as a rounded double vector
    val cents = base
      .select($"label", posexplode($"vec").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg(round(avg($"x"), 4).as("c"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
      .select($"label".as("p_label"),
        expr("transform(pc, e -> e.c)").as("cvec"))
    val q = base.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"vec".as("qv"), $"nrm".as("qn"))
    // probe list: the 2 nearest cells per query by squared distance
    // |q−c|² = q·q − 2 q·c + c·c (codegen'd graft_dot, no explode)
    val wp = Window.partitionBy($"q_id").orderBy($"pdist".asc, $"p_label".asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("pdist", round(
        expr("graft_dot(qv, qv)") - lit(2.0) * expr("graft_dot(qv, cvec)")
          + expr("graft_dot(cvec, cvec)"), 4) + lit(0.0))
      .withColumn("prk", row_number().over(wp))
      .filter($"prk" <= 2)
      .select($"q_id", $"qv", $"qn", $"p_label")
    val c = base.select($"vec_id".as("c_id"), $"label",
      $"vec".as("cv"), $"nrm".as("cn"))
    val w = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id".asc)
    c.join(broadcast(probes), $"label" === $"p_label" && $"c_id" =!= $"q_id")
      .withColumn("sim",
        round(expr("graft_dot(qv, cv)") / ($"qn" * $"cn"), 4) + lit(0.0))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"q_id", $"c_id", $"rnk", $"sim")
      .orderBy($"q_id".asc_nulls_first, $"rnk".asc_nulls_first)
  }

  /** L32 — hyperplane-LSH ANN: the OTHER canonical dense-vector
    * bucketing (IVF partitions by learned cells; sign-LSH partitions
    * by fixed hyperplanes — no training pass, natural for streaming
    * ingest). 8 deterministic sparse ternary hyperplanes
    * w_j[i] = ((2j+3)·(i+1)) mod 3 − 1 ∈ {−1,0,1} (Achlioptas-style
    * sparse random projection, seeded by arithmetic so both engines
    * share the planes); bucket = the 8 projection sign bits packed
    * into an int. Candidates = same-bucket pairs via ONE equi-join on
    * the bucket key; exact cosine re-rank inside. Projections are
    * rounded at 4dp BEFORE the sign so summation-order ulps cannot
    * flip a bit. One agg pass computes all 8 projections (posexplode
    * + hash-agg: map-side combine ships 8 partials per vector). */
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
    def pj(j: Int): org.apache.spark.sql.Column =
      sum($"x" * (((lit(2 * j + 3) * ($"i" + 1)) % 3) - 1).cast("double"))
        .as(s"p$j")
    val proj = base
      .select($"vec_id", posexplode($"vec").as(Seq("i", "x")))
      .groupBy($"vec_id")
      .agg(pj(0), (1 until 8).map(pj): _*)
    val bucketed = proj.select($"vec_id".as("b_id"),
      (0 until 8).map(j => (round(col(s"p$j"), 4) >= 0).cast("int") * (1 << j))
        .reduce(_ + _).as("bucket"))
    val sigs = base.join(bucketed, $"vec_id" === $"b_id")
      .select($"vec_id", $"bucket", $"vec", $"nrm")
      .transform(Ckpt.mat) // both join sides share one pass
    val q = sigs.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"bucket".as("q_bucket"),
        $"vec".as("qv"), $"nrm".as("qn"))
    val w = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id".asc)
    sigs.select($"vec_id".as("c_id"), $"bucket", $"vec".as("cv"), $"nrm".as("cn"))
      .join(broadcast(q), $"bucket" === $"q_bucket" && $"c_id" =!= $"q_id")
      .withColumn("sim",
        round(expr("graft_dot(qv, cv)") / ($"qn" * $"cn"), 4) + lit(0.0))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"q_id", $"c_id", $"rnk", $"sim")
      .orderBy($"q_id".asc_nulls_first, $"rnk".asc_nulls_first)
  }

  /** L34 — SemDeDup-style semantic dedup: within each embedding cell
    * (label = the IVF cell a 100 TB pipeline gets from k-means), pick
    * ONE keeper — the vector closest to the cell centroid — and flag
    * every other member whose cosine to the keeper clears the
    * threshold as a semantic duplicate. Cosine cost is cell-LOCAL:
    * each vector is compared against exactly one keeper, never
    * pairwise, so the whole pass is O(corpus), unlike q_embed_neardup's
    * per-cell-quadratic pair listing.
    *
    * Plan shape: centroids via posexplode + hash-agg (map-side combine
    * ships ≤ cells×dims partials); keeper per cell via min_by over a
    * (dist, vec_id) struct — ONE hash-agg, no window, deterministic
    * tie-break; members then equi-join the k-row keeper table on the
    * cell label (broadcast — bounded by the index parameter k, the
    * same class as q_ann_multiprobe's centroid table). Distances and
    * sims round at 4dp before any comparison, mirroring the oracle.
    *
    * Sign-of-zero: a genuinely tiny-negative real (a duplicate of the
    * keeper gives dist ≈ −1e-17; an orthogonal member gives sim ≈
    * −1e-17) rounds to IEEE −0.0 in DuckDB while Spark's
    * BigDecimal-based Round normalizes — numerically equal,
    * hash-distinct (the L60 failure class, second mechanism; caught by
    * tools/tiecheck.py's −0.0 emission sweep at sf0.001). `+ 0.0`
    * after the round normalizes on both engines (−0.0 + 0.0 = +0.0;
    * exact identity for every other value). On dist it is also
    * load-bearing for the keeper choice: DuckDB's radix sort orders
    * −0.0 before +0.0, so an unnormalized zero could flip the
    * (dist, vec_id) tie-break across engines. */
  def qSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
    val cents = base
      .select($"label", posexplode($"vec").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg(round(avg($"x"), 4).as("c"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
      .select($"label".as("p_label"),
        expr("transform(pc, e -> e.c)").as("cvec"))
    val withDist = base
      .join(broadcast(cents), $"label" === $"p_label")
      .withColumn("dist", round(
        expr("graft_dot(vec, vec)") - lit(2.0) * expr("graft_dot(vec, cvec)")
          + expr("graft_dot(cvec, cvec)"), 4) + lit(0.0))
      .select($"vec_id", $"label", $"vec", $"nrm", $"dist")
    val keepers = withDist
      .groupBy($"label".as("k_label"))
      .agg(min_by(struct($"vec_id", $"vec", $"nrm"),
        struct($"dist", $"vec_id")).as("k"))
      .select($"k_label", $"k.vec_id".as("keep_id"),
        $"k.vec".as("kv"), $"k.nrm".as("kn"))
    withDist
      .join(broadcast(keepers), $"label" === $"k_label" && $"vec_id" =!= $"keep_id")
      .withColumn("sim",
        round(expr("graft_dot(vec, kv)") / ($"nrm" * $"kn"), 4) + lit(0.0))
      .select($"label", $"keep_id", $"vec_id", $"sim",
        ($"sim" >= 0.2).cast("int").as("dropped"))
      .orderBy($"label".asc_nulls_first, $"vec_id".asc_nulls_first)
  }

  /** L12's index-BUILD step — per-cell centroids: element-wise mean
    * of every cell's vectors, one (label, pos, mean) row per
    * dimension. posexplode(64-dim) then hash-agg on (label, pos):
    * map-side combine makes the shuffle carry ≤ cells×dims partials
    * per mapper, never the vectors — the single k-means Lloyd
    * iteration a 100 TB IVF build repeats to convergence. 1-based pos
    * matches DuckDB's generate_subscripts. */
  def qCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"label", posexplode($"embedding").as(Seq("pos0", "x")))
      .groupBy($"label", ($"pos0" + 1).as("pos"))
      // + 0.0 normalizes a −0.0 from rounding a tiny-negative mean
      // (qSemanticDedup's sign-of-zero note; DuckDB keeps the sign)
      .agg((round(avg($"x".cast("double")), 4) + lit(0.0)).as("centroid"),
        count(lit(1)).as("n_vecs"))
      .orderBy($"label".asc_nulls_first, $"pos".asc_nulls_first)
  }

  /** L74 — incremental ANN index maintenance, the similarity-side
    * mirror of the text family's CDC dedup (L71-L73): assign an
    * ARRIVING batch of embeddings (vec_id % 10 = 9, the same
    * deterministic "today's ingest" slice) to the STANDING index's
    * cells without touching corpus vectors. The standing index is the
    * per-cell centroid table computed over the corpus slice only —
    * the k-row metadata an IVF index persists between ingests; each
    * batch vector takes argmin squared centroid distance (4dp-rounded,
    * ties → lower cell), and `agrees` audits the assignment against
    * the vector's stored label — the drift signal that tells an index
    * operator when accumulated upserts warrant a re-train (Lloyd
    * iterations, q_kmeans). Scale shape: centroids = posexplode +
    * two hash-aggs over the corpus (map-side combinable, k×dim rows,
    * one-time per ingest), then |batch|×k distance evals with the
    * k-row table BROADCAST (bounded by the index's cell-count
    * parameter at any corpus size — whitelisted like
    * q_ann_multiprobe's centroid table); corpus vectors are never
    * rescanned per batch row. */
  def qAnnUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
    val cents = base.filter(pmod($"vec_id", lit(10L)) =!= 9)
      .select($"label", posexplode($"vec").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg(round(avg($"x"), 4).as("c"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
      .select($"label".as("cell"),
        expr("transform(pc, e -> e.c)").as("cvec"))
    val batch = base.filter(pmod($"vec_id", lit(10L)) === 9)
      .select($"vec_id".as("new_vec"), $"label".as("stored_cell"),
        $"vec".as("qv"))
    val wa = Window.partitionBy($"new_vec")
      .orderBy($"dist".asc, $"cell".asc)
    batch.crossJoin(broadcast(cents))
      .withColumn("dist", round(
        expr("graft_dot(qv, qv)") - lit(2.0) * expr("graft_dot(qv, cvec)")
          + expr("graft_dot(cvec, cvec)"), 4) + lit(0.0))
      .withColumn("rnk", row_number().over(wa))
      .filter($"rnk" === 1)
      .select($"new_vec", $"cell", $"dist",
        ($"cell" === $"stored_cell").cast("int").as("agrees"))
      .orderBy($"new_vec".asc_nulls_first)
  }

  /** The full IVF index build: Lloyd's k-means composed from engine
    * primitives — q_centroids is ONE iteration, this loops it to
    * convergence. Per iteration: (1) broadcast the k centroids (a
    * k-row dimension — tiny at any corpus scale) against the
    * distributed vectors, squared-distance via the codegen'd
    * graft_dot identity |v−c|² = v·v − 2v·c + c·c, argmin per vector
    * with a deterministic (dist, cid) tie-break; (2) recompute
    * centroids by posexplode + hash-agg exactly like q_centroids.
    * Only the k×dim centroid table ever reaches the driver; vectors
    * stay distributed. Returns per-iteration SSE — Lloyd guarantees
    * it non-increasing, which KMeansSpec asserts. */
  def kmeansSse(spark: SparkSession, dir: String, k: Int, iters: Int): Seq[Double] = {
    import spark.implicits._
    val vecs = withVec(Tables.embeddings(spark, dir))
      .select($"vec_id", $"vec",
        expr("graft_dot(vec, vec)").as("vv"))
      .cache()
    // deterministic seed: the k lowest vec_ids
    var centroids = vecs.orderBy($"vec_id".asc).limit(k)
      .select($"vec_id".cast("int").as("cid"), $"vec".as("cvec"))
    val sse = (1 to iters).map { _ =>
      val cents = centroids
        .withColumn("cc", expr("graft_dot(cvec, cvec)"))
      val w = Window.partitionBy($"vec_id").orderBy($"dist".asc, $"cid".asc)
      val assigned = vecs.crossJoin(broadcast(cents))
        .withColumn("dist", $"vv" - lit(2.0) * expr("graft_dot(vec, cvec)") + $"cc")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"vec_id", $"cid", $"vec", $"dist")
      // sanctioned 1-row driver read: per-round SSE is Lloyd's
      // iteration state (same class as the CC fixpoint's label-sum,
      // Text.scala) — one double per round, never vector data
      val iterSse = assigned.agg(sum($"dist")).head().getDouble(0)
      centroids = assigned
        .select($"cid", posexplode($"vec").as(Seq("pos", "x")))
        .groupBy($"cid", $"pos")
        .agg(avg($"x").as("c"))
        .groupBy($"cid")
        .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
        .select($"cid", expr("transform(pc, e -> e.c)").as("cvec"))
      iterSse
    }
    vecs.unpersist()
    sse
  }

  /** L74's re-train step as an oracle-gated query (the one operator
    * the survey named by q-id without registering it — r12 verdict
    * #1): k=4 Lloyd iterations over the embedding corpus with the
    * deterministic lowest-id seeding [[kmeansSse]] established,
    * emitting per-iteration cluster facts at (iter, cid, pos) grain —
    * the updated centroid coordinate (integer 1e4 units), the
    * cluster's member count, and its SSE under the assignment that
    * produced it (integer 1e4 units, summed as exact longs). The
    * final iteration's rows ARE the trained index's centroid table.
    *
    * Determinism gate: distances round to 4dp before the argmin
    * (ties → lower cid, the q_ann_upsert contract) and centroids
    * round to 4dp between iterations, so both engines iterate on
    * IDENTICAL doubles — the ulp the two engines' summation orders
    * produce is absorbed at every round boundary, never compounds.
    *
    * Scale shape: per iteration, the k-row centroid table BROADCASTS
    * against the distributed vectors (bounded by the index parameter
    * k at any corpus size — the q_ann_multiprobe whitelist class),
    * the argmin is a vec_id-keyed window (unbounded key), and the
    * recompute is posexplode + two map-side-combinable hash-aggs
    * (the q_centroids shape). Vectors never reach the driver; the
    * lazy checkpoint per round lets the stats agg and the recompute
    * read one materialization and truncates the iteration lineage
    * (the CC-fixpoint precedent). Oracle: the same three rounds
    * unrolled as a CTE chain (the q_dedup_clusters
    * iteration-vs-recursion precedent). */
  def qKmeans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 4
    val iters = 3
    val vecs = withVec(Tables.embeddings(spark, dir))
      .select($"vec_id", $"vec", expr("graft_dot(vec, vec)").as("vv"))
      .transform(Ckpt.mat)
    def toArray(perPos: DataFrame): DataFrame = perPos
      .groupBy($"cid")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
      .select($"cid", expr("transform(pc, e -> e.c)").as("cvec"))
    // deterministic seed: the k lowest vec_ids, rebuilt through the
    // same cid-grouped collect shape as the per-iteration recompute
    // so every round's broadcast build side is the k-row centroid
    // aggregate (the plan class OpsSpec's BNLJ guard admits)
    val seed = toArray(vecs.filter($"vec_id" < k)
      .select($"vec_id".cast("int").as("cid"),
        posexplode($"vec").as(Seq("pos0", "c")))
      .select($"cid", ($"pos0" + 1).as("pos"), $"c"))
    val (_, rounds) = (1 to iters).foldLeft((seed, Seq.empty[DataFrame])) {
      case ((cent, acc), t) =>
        val cents = cent.withColumn("cc", expr("graft_dot(cvec, cvec)"))
        val wa = Window.partitionBy($"vec_id").orderBy($"dist".asc, $"cid".asc)
        val assigned = vecs.crossJoin(broadcast(cents))
          .withColumn("dist", round(
            $"vv" - lit(2.0) * expr("graft_dot(vec, cvec)") + $"cc", 4)
            + lit(0.0))
          .withColumn("rk", row_number().over(wa))
          .filter($"rk" === 1)
          .select($"vec_id", $"cid", $"vec", $"dist")
          .transform(Ckpt.mat) // stats + recompute read once
        val stats = assigned.groupBy($"cid")
          .agg(count(lit(1)).as("n_vecs"),
            sum(round($"dist" * lit(1.0e4)).cast("long")).as("sse_u4"))
        val newC = assigned
          .select($"cid", posexplode($"vec").as(Seq("pos0", "x")))
          .groupBy($"cid", ($"pos0" + 1).as("pos"))
          .agg((round(avg($"x"), 4) + lit(0.0)).as("c"))
        val row = newC.join(stats, "cid")
          .select(lit(t).as("iter"), $"cid", $"pos",
            round($"c" * lit(1.0e4)).cast("long").as("c_u4"),
            $"n_vecs", $"sse_u4")
        (toArray(newC), acc :+ row)
    }
    rounds.reduce(_.union(_))
      .orderBy($"iter".asc_nulls_first, $"cid".asc_nulls_first,
        $"pos".asc_nulls_first)
  }

  /** L46 — per-label embedding norm profile: the sanity dashboard an
    * embedding pipeline publishes before anyone trusts cosine math on
    * the collection (un-normalized or collapsed vectors show up here
    * first). Per-vector ||v|| from one posexplode + keyed agg, then a
    * per-label rollup — no joins, no windows, two map-side-combinable
    * hash-aggs; round(4) after the min/avg/max absorbs
    * accumulation-order ulp exactly as the cosine family does. */
  def qVectorNorms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", explode($"embedding").as("x"))
      .select($"vec_id", $"label", $"x".cast("double").as("x"))
      .groupBy($"vec_id", $"label")
      .agg(sqrt(sum($"x" * $"x")).as("nrm"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        round(min($"nrm"), 4).as("min_norm"),
        round(avg($"nrm"), 4).as("avg_norm"),
        round(max($"nrm"), 4).as("max_norm"))
      .orderBy($"label".asc_nulls_first)
  }

  /** L47 — int8 scalar quantization accounting: per-vector [min, max]
    * range quantization to 256 levels (the storage-shrink every
    * large ANN deployment applies), reported as all-INTEGER per-vector
    * facts — dim, Σcode, saturated/zero bucket counts — so the oracle
    * comparison has zero float surface beyond the IEEE-exact
    * (x−mn)/((mx−mn)/255) double chain, identical on both engines
    * (float32 widens to double exactly; floor is exact). The min/max
    * table is per-vector (vec_id-keyed agg joined back UNHINTED on
    * vec_id — co-partitioned, no broadcast); degenerate constant
    * vectors quantize to all-zero codes explicitly. */
  def qQuantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pe = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", explode($"embedding").as("xf"))
      .select($"vec_id", $"label", $"xf".cast("double").as("x"))
    val mm = pe.groupBy($"vec_id".as("m_id"))
      .agg(min($"x").as("mn"), max($"x").as("mx"))
    pe.join(mm, $"vec_id" === $"m_id")
      .withColumn("code",
        when($"mx" === $"mn", lit(0L))
          .otherwise(least(
            floor(($"x" - $"mn") / (($"mx" - $"mn") / lit(255.0d)))
              .cast("long"),
            lit(255L))))
      .groupBy($"vec_id", $"label")
      .agg(count(lit(1)).as("dim"),
        sum($"code").as("code_sum"),
        sum(($"code" === 255L).cast("long")).as("n_saturated"),
        sum(($"code" === 0L).cast("long")).as("n_zero"))
      .orderBy($"vec_id".asc_nulls_first)
  }

  /** L48 — ANN recall eval: recall@3 of the IVF single-probe path
    * (q_ann_ivf) against the exact brute-force ground truth
    * (q_cosine_topk), per query vector — the metric that decides
    * whether an index's probe budget is safe to ship. ONE scoring
    * pass (the admitted broadcast-query-set BNLJ, same shape as
    * q_cosine_topk) feeds BOTH rankings via two q_id-keyed windows
    * (overall rank; rank within the query's own cell) — no self-join,
    * no second corpus pass. At 100 TB the eval runs over a sampled
    * query set exactly like this one; ground truth is inherently a
    * full scan per query, which is why it is an EVAL, not the serving
    * path. Integer hit counts; the only float is the final ratio of
    * two exact longs. */
  def qAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
    val q = base.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"label".as("q_label"),
        $"vec".as("qv"), $"nrm".as("qn"))
    val c = base.select($"vec_id".as("c_id"), $"label",
      $"vec".as("cv"), $"nrm".as("cn"))
    val scored = c.join(broadcast(q), $"c_id" =!= $"q_id")
      .withColumn("dot", expr("graft_dot(qv, cv)"))
      .withColumn("sim", round($"dot" / ($"qn" * $"cn"), 4) + lit(0.0))
      .withColumn("same", $"label" === $"q_label")
    val wAll = Window.partitionBy($"q_id")
      .orderBy($"sim".desc, $"c_id".asc)
    val wSame = Window.partitionBy($"q_id", $"same")
      .orderBy($"sim".desc, $"c_id".asc)
    scored
      .withColumn("rall", row_number().over(wAll))
      .withColumn("rsame", row_number().over(wSame))
      .groupBy($"q_id")
      .agg(sum(($"rall" <= 3).cast("long")).as("n_exact"),
        sum(($"same" && $"rsame" <= 3).cast("long")).as("n_probe"),
        sum(($"rall" <= 3 && $"same" && $"rsame" <= 3).cast("long"))
          .as("n_hits"))
      .withColumn("recall_at_3", round($"n_hits" / $"n_exact", 4))
      .orderBy($"q_id".asc_nulls_first)
  }

  /** L81 — metadata-FILTERED ANN: top-3 by cosine among candidates
    * that pass a document-metadata predicate (here lang = 'en',
    * joined on the shared id), probing the query's IVF cell — the
    * "filtered vector search" serving shape every RAG stack needs
    * (search only docs the caller may see / in the caller's
    * language). PRE-filter, not post-filter: the predicate prunes
    * the candidate set BEFORE ranking, so top-k is exact over the
    * eligible set — post-filtering an unfiltered top-k under-fills
    * k whenever the filter is selective, the classic filtered-ANN
    * bug. Plan shape: the lang predicate pushes down to the
    * documents scan (PushedFilters), eligibility attaches to the
    * corpus by ONE equi-join on the id, and the probe is the same
    * broadcast-query cell equi-join as q_ann_ivf — no BNLJ, no
    * corpus-sized broadcast; at 100 TB the filter cuts the scanned
    * cell before any distance math. */
  def qAnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
    val elig = Tables.documents(spark, dir)
      .filter($"lang" === "en")
      .select($"doc_id".as("c_id"))
    val q = base.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"label".as("q_label"),
        $"vec".as("qv"), $"nrm".as("qn"))
    val c = base.select($"vec_id".as("c_id"), $"label",
      $"vec".as("cv"), $"nrm".as("cn"))
      .join(elig, "c_id")
    val w = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id".asc)
    c.join(broadcast(q), $"label" === $"q_label" && $"c_id" =!= $"q_id")
      .withColumn("sim",
        round(expr("graft_dot(qv, cv)") / ($"qn" * $"cn"), 4) + lit(0.0))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"q_id", $"c_id", $"rnk", $"sim")
      .orderBy($"q_id".asc_nulls_first, $"rnk".asc_nulls_first)
  }

  /** L82 — truncated-dimension (Matryoshka-style) recall eval:
    * recall@3 of cosine over the FIRST 16 of 64 dimensions against
    * full-dimension ground truth, per query — the eval that decides
    * whether an embedding column can be served at d/4 residency
    * (a 4× scan-bytes cut for the coarse stage of a two-stage
    * retriever, the same residency lever as PQ but with zero
    * codebook). ONE scoring pass (the admitted broadcast-query-set
    * BNLJ, q_ann_recall's shape) computes both dots per pair —
    * graft_dot over the full vector and over its 16-dim prefix
    * slice — and two q_id-keyed windows rank them; no second corpus
    * pass. Zero-norm guards on BOTH sides mirror the oracle (a
    * zero prefix would divide by zero). Integer hit counts; the
    * only float emissions are 4dp-rounded sims consumed by the
    * rank (decision, not sum) and the final ratio of two longs. */
  def qMrlRecall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
      .withColumn("pvec", slice($"vec", 1, 16))
      .withColumn("pnrm", sqrt(expr("graft_dot(pvec, pvec)")))
      .filter($"nrm" > 0 && $"pnrm" > 0)
    val q = base.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"vec".as("qv"), $"nrm".as("qn"),
        $"pvec".as("qpv"), $"pnrm".as("qpn"))
    val c = base.select($"vec_id".as("c_id"), $"vec".as("cv"),
      $"nrm".as("cn"), $"pvec".as("cpv"), $"pnrm".as("cpn"))
    val scored = c.join(broadcast(q), $"c_id" =!= $"q_id")
      .withColumn("sim",
        round(expr("graft_dot(qv, cv)") / ($"qn" * $"cn"), 4) + lit(0.0))
      .withColumn("psim",
        round(expr("graft_dot(qpv, cpv)") / ($"qpn" * $"cpn"), 4) + lit(0.0))
    val wAll = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id".asc)
    val wPre = Window.partitionBy($"q_id").orderBy($"psim".desc, $"c_id".asc)
    scored
      .withColumn("rall", row_number().over(wAll))
      .withColumn("rpre", row_number().over(wPre))
      .groupBy($"q_id")
      .agg(sum(($"rall" <= 3).cast("long")).as("n_exact"),
        sum(($"rall" <= 3 && $"rpre" <= 3).cast("long")).as("n_hits"),
        // graded signal alongside the (often zero) recall: where the
        // prefix's top-3 picks actually sit in the true ranking — the
        // number a truncation decision reads when recall@k saturates
        // at 0 (this corpus: isotropic synthetic dims, so the prefix
        // is honestly unservable and the true ranks are large)
        sum(when($"rpre" <= 3, $"rall".cast("long")).otherwise(0L))
          .as("truerank_sum"))
      .withColumn("recall_at_3", round($"n_hits" / $"n_exact", 4))
      .orderBy($"q_id".asc_nulls_first)
  }

  /** L53 — cosine calibration histogram: the distribution of cosine
    * similarity over a deterministic linear sample of vector pairs
    * (each id paired with its successor), binned into 20 equal-width
    * bins over [−1, 1]. This is the eval a similarity-threshold
    * consumer (dedup, ANN, semantic filter) runs FIRST: where the
    * background similarity mass sits decides every threshold above
    * (q_embed_neardup's 0.35, q_semantic_dedup's 0.2 were read off
    * exactly this curve). Successor pairing is an EQUI-join on the id
    * (shift one side by 1) — co-partitionable, O(N) pairs at any
    * scale, no sampling RNG to disagree across engines. Zero-norm
    * vectors are excluded before pairing (cosine undefined); sim is
    * rounded at 4dp and BOTH engines bin the same rounded double with
    * the same floor/least arithmetic, so bin edges cannot diverge. */
  def qCosHist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
      .filter($"nrm" > 0)
      .select($"vec_id", $"vec", $"nrm")
    val a = base.select($"vec_id".as("pid"), $"vec".as("va"), $"nrm".as("na"))
    val b = base.select(($"vec_id" - 1).as("pid"),
      $"vec".as("vb"), $"nrm".as("nb"))
    a.join(b, "pid")
      .withColumn("sim",
        round(expr("graft_dot(va, vb)") / ($"na" * $"nb"), 4) + lit(0.0))
      .withColumn("bin",
        least(floor(($"sim" + 1.0) * 10), lit(19)).cast("long"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        (round(min($"sim"), 4) + lit(0.0)).as("lo"),
        (round(max($"sim"), 4) + lit(0.0)).as("hi"))
      .orderBy($"bin".asc_nulls_first)
  }

  /** L54 — k-means assignment purity: how well the learned IVF cells
    * reproduce the ground-truth labels — THE index-quality eval run
    * after every centroid build (q_centroids) and before trusting
    * cell-probing ANN (q_ann_ivf). Every vector is assigned to its
    * nearest centroid (argmin over rounded squared distance, label
    * tie-break — q_ann_multiprobe's exact cell-ranking contract),
    * then each cell reports its size, majority true label, and
    * purity = majority fraction.
    *
    * Plan shape: centroid build = posexplode + two hash-aggs (≤
    * cells×dims partials); assignment = corpus × k-row BROADCAST
    * centroid table (the admitted centroid-build BNLJ shape, bounded
    * by the index parameter k, never corpus size) folded by ONE
    * min_by hash-agg — no window over the corpus; purity = two more
    * hash-aggs on (cell, label) pairs, ≤ k² rows. Majority tie-break
    * is deterministic: max over struct(n, −label) picks the larger
    * count, then the smaller label. */
  def qAssignPurity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
    val cents = base
      .select($"label", posexplode($"vec").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg(round(avg($"x"), 4).as("c"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
      .select($"label".as("cl"), expr("transform(pc, e -> e.c)").as("cvec"))
    val assigned = base.crossJoin(broadcast(cents))
      .withColumn("dist", round(
        expr("graft_dot(vec, vec)") - lit(2.0) * expr("graft_dot(vec, cvec)")
          + expr("graft_dot(cvec, cvec)"), 4) + lit(0.0))
      .groupBy($"vec_id", $"label")
      .agg(min_by($"cl", struct($"dist", $"cl")).as("cell"))
    assigned
      .groupBy($"cell", $"label")
      .agg(count(lit(1)).as("n"))
      .groupBy($"cell")
      .agg(sum($"n").as("n_vecs"),
        max(struct($"n", (-$"label").cast("long").as("negl"),
          $"label".as("lab"))).as("m"))
      .select($"cell", $"n_vecs", $"m.lab".as("majority_label"),
        $"m.n".as("n_majority"),
        round($"m.n" / $"n_vecs", 4).as("purity"))
      .orderBy($"cell".asc_nulls_first)
  }

  /** L59 — kNN label classification eval: predict each query
    * vector's label by majority vote of its 3 exact nearest
    * neighbors and compare to ground truth — the embedding-quality
    * probe (if kNN can't recover labels, neither will any downstream
    * semantic filter). Same admitted broadcast-query-set shape as
    * q_cosine_topk/q_ann_recall (an EVAL over a sampled query set,
    * never a serving path — the serving path is the IVF/LSH family);
    * vote rollup is two tiny aggs on (query, label) grain. Majority
    * tie-break = max struct(votes, −label): deterministic. */
  def qKnnClassify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = withVec(Tables.embeddings(spark, dir))
    val q = base.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"label".as("true_label"),
        $"vec".as("qv"), $"nrm".as("qn"))
    val c = base.select($"vec_id".as("c_id"), $"label".as("c_label"),
      $"vec".as("cv"), $"nrm".as("cn"))
    val w = Window.partitionBy($"q_id").orderBy($"sim".desc, $"c_id".asc)
    c.join(broadcast(q), $"c_id" =!= $"q_id")
      .withColumn("sim",
        round(expr("graft_dot(qv, cv)") / ($"qn" * $"cn"), 4) + lit(0.0))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .groupBy($"q_id", $"true_label", $"c_label")
      .agg(count(lit(1)).as("votes"))
      .groupBy($"q_id", $"true_label")
      .agg(max(struct($"votes", (-$"c_label").cast("long").as("negl"),
        $"c_label".as("lab"))).as("m"))
      .select($"q_id", $"true_label", $"m.lab".as("pred_label"),
        $"m.votes".as("n_votes"),
        ($"m.lab" === $"true_label").cast("int").as("correct"))
      .orderBy($"q_id".asc_nulls_first)
  }

  /** Shared PQ geometry: 64-dim vectors split into 4 subspaces of 16
    * dims; the codebook is training-free — the 16 lowest-vec_id
    * vectors donate their subvectors as codewords (the same
    * deterministic-seed doctrine as kmeansSse; a production build
    * would run per-subspace Lloyd's, which kmeansSse already
    * demonstrates, but a deterministic exemplar codebook keeps the
    * oracle engine-exact). Returns (vec_id, sub, sv) subvector rows
    * and the 64-row (code, sub, cv) codebook. */
  /** Subvector explode alone, factored out so the ARRIVAL path can
    * run it on a micro-batch: PQ coding of an arriving batch is
    * pqSubs(batch) ⋈ the STANDING codebook (the persisted index
    * metadata) — the same stream-static shape as the CDC dedup vet;
    * StreamBatchParitySpec drives it via foreachBatch. */
  private[graft] def pqSubs(df: DataFrame): DataFrame =
    withVec(df)
      .select(col("vec_id"), explode(expr(
        "transform(sequence(0, 3), s -> " +
          "struct(CAST(s AS BIGINT) AS sub, slice(vec, s*16+1, 16) AS sv))"))
        .as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.sv").as("sv"))

  private def pqParts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val subs = pqSubs(Tables.embeddings(spark, dir))
    val cb = subs.filter($"vec_id" < 16)
      .select($"vec_id".as("code"), $"sub".as("c_sub"), $"sv".as("cv"))
    (subs, cb)
  }

  /** Per-subspace nearest-codeword assignment: corpus subvectors ×
    * BROADCAST 64-row codebook (bounded by the index parameters m×k,
    * never corpus size), squared distance via the graft_dot identity,
    * argmin with (dist, code) tie-break — one hash-agg, no window
    * over the corpus. */
  private[graft] def pqAssign(subs: DataFrame, cb: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    def d(a: String, b: String): Column = expr(s"graft_dot($a, $b)")
    subs.join(broadcast(cb), col("sub") === col("c_sub"))
      .withColumn("rawd",
        d("sv", "sv") - lit(2.0) * d("sv", "cv") + d("cv", "cv"))
      .withColumn("dist", round(col("rawd"), 4) + lit(0.0))
      .groupBy(col("vec_id"), col("sub"))
      // (dist, code) is already unique per group (one row per codeword),
      // so rawd rides along without ever deciding the argmin
      .agg(min(struct(col("dist"), col("code"), col("rawd"))).as("m"))
      .select(col("vec_id"), col("sub"),
        col("m.code").as("code"), col("m.dist").as("dist"),
        col("m.rawd").as("rawd"))
  }

  /** Memoized per (session, dir) like Text.minhashSigs: four PQ
    * queries (occupancy audit, ADC recall, IVF-PQ serving, ADC
    * calibration) consume the SAME deterministic assignment table,
    * so it materializes once per session/input — the "codes are a
    * persisted intermediate" shape a production PQ index runs (at
    * 100 TB this is the parquet code table every probe reads).
    * Deterministic (argmin over rounded dists with a total
    * tie-break), so reuse can never change a result; Bench/Profile
    * clear the registry per pass so timings stay honest. */
  private val pqCache = Text.newMemoCache()
  private def pqCodesTable(spark: SparkSession, dir: String): DataFrame =
    Text.memoized(pqCache, spark, dir) {
      val (subs, cb) = pqParts(spark, dir)
      pqAssign(subs, cb).transform(Ckpt.mat)
    }

  /** L76 — product-quantization code build + occupancy audit: THE
    * 100 TB ANN compression path (IVF prunes the scan; PQ shrinks
    * the residency — 64 float dims become m=4 one-byte codes, 64×
    * smaller, and ADC serving never touches raw vectors). Output is
    * the (sub, code) occupancy histogram with summed quantization
    * error — the "is my codebook balanced / is any codeword dead"
    * audit run after every codebook build. The error statistic sums
    * the RAW (unrounded) winner distances and quantizes ONCE at the
    * aggregate to integer 1e-2 units via the bare-round BIGINT gate
    * (the blessed floor-scaled pattern): summing per-row 4dp-rounded
    * values instead puts every row on a half-grid boundary — tiecheck
    * flagged exactly one such row at sf0.1 — while a raw-sum lands on
    * an arbitrary real, never systematically on the grid. Plan: one
    * broadcast hash join ×16 fan-out + two hash-aggs; no shuffle
    * carries vectors wider than 16 doubles; output ≤ m·k = 64 rows at
    * any corpus size. */
  def qPqCodes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pqCodesTable(spark, dir)
      .groupBy($"sub", $"code")
      .agg(count(lit(1)).as("n_assigned"),
        round(sum($"rawd") * 100).cast("long").as("err_u2"))
      .orderBy($"sub".asc_nulls_first, $"code".asc_nulls_first)
  }

  /** L77 — PQ ADC recall eval: recall@3 of asymmetric-distance
    * serving (query stays exact; corpus is m one-byte codes; distance
    * = Σ_sub LUT[sub, code] from a per-query 64-entry lookup table)
    * against exact L2 ground truth — the eval that decides whether a
    * codebook's distortion is safe to ship, run over a sampled query
    * set exactly like q_ann_recall. The ADC side is the REAL serving
    * shape: the m·k LUT (320 rows here) broadcasts and the corpus
    * code table joins it on the EQUI key (sub, code) — a full scan
    * of 4-byte codes, never of vectors. The exact side is the
    * admitted eval-only broadcast-query BNLJ. ADC sums are 4
    * already-4dp-quantized terms — re-rounded once so both engines
    * rank identical doubles; ranks tie-break on c_id. */
  def qPqRecall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (subs, cb) = pqParts(spark, dir)
    val codes = pqCodesTable(spark, dir).select($"vec_id", $"sub", $"code")
    def d(a: String, b: String) = expr(s"graft_dot($a, $b)")
    val lut = subs.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"sub".as("q_sub"), $"sv".as("qsv"))
      .join(broadcast(cb), $"q_sub" === $"c_sub")
      .withColumn("ld", round(
        d("qsv", "qsv") - lit(2.0) * d("qsv", "cv") + d("cv", "cv"), 4)
        + lit(0.0))
      .select($"q_id", $"q_sub".as("sub"), $"code", $"ld")
    val adc = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id".as("c_id"))
      .agg((round(sum($"ld"), 4) + lit(0.0)).as("adc"))
    val base = withVec(Tables.embeddings(spark, dir))
    val q = base.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"vec".as("qv"))
    val exact = base.select($"vec_id".as("c_id"), $"vec".as("cvec"))
      .join(broadcast(q), $"c_id" =!= $"q_id")
      .withColumn("ed", round(
        d("cvec", "cvec") - lit(2.0) * d("qv", "cvec") + d("qv", "qv"), 4)
        + lit(0.0))
    val wE = Window.partitionBy($"q_id").orderBy($"ed".asc, $"c_id".asc)
    val wA = Window.partitionBy($"q_id").orderBy($"adc".asc, $"c_id".asc)
    val topE = exact.withColumn("r", row_number().over(wE))
      .filter($"r" <= 3).select($"q_id", $"c_id")
    val topA = adc.withColumn("r", row_number().over(wA))
      .filter($"r" <= 3).select($"q_id", $"c_id", lit(1L).as("hit"))
    topE.join(topA, Seq("q_id", "c_id"), "left")
      .groupBy($"q_id")
      .agg(sum(coalesce($"hit", lit(0L))).as("n_hits"))
      .withColumn("recall_at_3", round($"n_hits" / lit(3.0), 4))
      .orderBy($"q_id".asc_nulls_first)
  }

  /** L79 — IVF-PQ two-stage serving: the composed index every
    * billion-vector deployment actually runs (cell probe prunes the
    * scan — q_ann_ivf; PQ codes shrink what the probe touches —
    * q_pq_codes; a bounded exact re-rank repairs ADC distortion at
    * the top). Stage 1: within the query's own cell, rank candidates
    * by ADC distance from the per-query LUT and keep a 10-deep
    * shortlist. Stage 2: fetch ONLY the shortlist's raw vectors
    * (≤ 10·|queries| rows — the bounded "refine" read a PQ index
    * serves from cold storage) and re-rank exactly; emit top-3.
    *
    * Plan shape — the whole serving path is equi-joins: candidates =
    * corpus code table ⋈ BROADCAST (cell, sub, code)-keyed LUT (the
    * m·k·|queries| rows an index holds per probe), shortlist fetch =
    * BROADCAST shortlist ⋈ corpus on vec_id. No BNLJ anywhere —
    * unlike the eval queries, this is the shape that scales: the
    * only per-candidate state is 4 one-byte codes and the window is
    * cell-bounded. */
  def qIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (subs, cb) = pqParts(spark, dir)
    val base = withVec(Tables.embeddings(spark, dir))
    val cells = base.select($"vec_id", $"label".as("cell"))
    val codes = pqCodesTable(spark, dir).select($"vec_id", $"sub", $"code")
      .join(cells, "vec_id")
    def d(a: String, b: String) = expr(s"graft_dot($a, $b)")
    val lut = subs.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"sub".as("q_sub"), $"sv".as("qsv"))
      .join(cells.select($"vec_id".as("q_id"), $"cell"), "q_id")
      .join(broadcast(cb), $"q_sub" === $"c_sub")
      .withColumn("ld", round(
        d("qsv", "qsv") - lit(2.0) * d("qsv", "cv") + d("cv", "cv"), 4)
        + lit(0.0))
      .select($"q_id", $"cell", $"q_sub".as("sub"), $"code", $"ld")
    val wS = Window.partitionBy($"q_id").orderBy($"adc".asc, $"c_id".asc)
    val short = codes.join(broadcast(lut), Seq("cell", "sub", "code"))
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id".as("c_id"))
      .agg((round(sum($"ld"), 4) + lit(0.0)).as("adc"))
      .withColumn("r", row_number().over(wS))
      .filter($"r" <= 10)
      .select($"q_id", $"c_id")
    val q = base.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"vec".as("qv"))
    val wF = Window.partitionBy($"q_id").orderBy($"dist".asc, $"c_id".asc)
    base.select($"vec_id".as("c_id"), $"vec".as("cvec"))
      .join(broadcast(short), "c_id")
      .join(broadcast(q), "q_id")
      .withColumn("dist", round(
        d("cvec", "cvec") - lit(2.0) * d("qv", "cvec") + d("qv", "qv"), 4)
        + lit(0.0))
      .withColumn("rnk", row_number().over(wF))
      .filter($"rnk" <= 3)
      .select($"q_id", $"c_id", $"rnk", $"dist")
      .orderBy($"q_id".asc_nulls_first, $"rnk".asc_nulls_first)
  }

  /** L80 — ADC distortion calibration: per query, the bias and MAE of
    * the asymmetric PQ distance against exact L2 over the full
    * candidate set — the calibration an index operator reads BEFORE
    * trusting q_ivfpq's shortlist depth (a biased-but-tight ADC needs
    * a shallow refine; a noisy one needs a deeper shortlist). The PQ
    * mirror of q_est_error's MinHash-estimator calibration. Both
    * distances stay RAW doubles per pair (engine-identical to ~1e-12
    * by IEEE); the statistics quantize ONCE at the aggregate to
    * integer 1e-4 units via the bare-round BIGINT gate — the PLANS.md
    * r11 rule: per-row rounding is for decisions, never for values an
    * aggregate sums. Exact side = the admitted eval-only
    * broadcast-query BNLJ, like the other ground-truth evals. */
  def qAdcErr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (subs, cb) = pqParts(spark, dir)
    val codes = pqCodesTable(spark, dir).select($"vec_id", $"sub", $"code")
    def d(a: String, b: String) = expr(s"graft_dot($a, $b)")
    val lut = subs.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"sub".as("q_sub"), $"sv".as("qsv"))
      .join(broadcast(cb), $"q_sub" === $"c_sub")
      .withColumn("ld",
        d("qsv", "qsv") - lit(2.0) * d("qsv", "cv") + d("cv", "cv"))
      .select($"q_id", $"q_sub".as("sub"), $"code", $"ld")
    val adc = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter($"vec_id" =!= $"q_id")
      .groupBy($"q_id", $"vec_id".as("c_id"))
      .agg(sum($"ld").as("adc"))
    val base = withVec(Tables.embeddings(spark, dir))
    val q = base.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"vec".as("qv"))
    val exact = base.select($"vec_id".as("c_id"), $"vec".as("cvec"))
      .join(broadcast(q), $"c_id" =!= $"q_id")
      .withColumn("ed",
        d("cvec", "cvec") - lit(2.0) * d("qv", "cvec") + d("qv", "qv"))
      .select($"q_id", $"c_id", $"ed")
    adc.join(exact, Seq("q_id", "c_id"))
      .withColumn("err", $"adc" - $"ed")
      .groupBy($"q_id")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum($"err") / count(lit(1)) * 10000).cast("long")
          .as("bias_u4"),
        round(sum(abs($"err")) / count(lit(1)) * 10000).cast("long")
          .as("mae_u4"))
      .orderBy($"q_id".asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "q_adc_err" -> (qAdcErr _),
    "q_ivfpq" -> (qIvfPq _),
    "q_pq_codes" -> (qPqCodes _),
    "q_pq_recall" -> (qPqRecall _),
    "q_knn_classify" -> (qKnnClassify _),
    "q_cos_hist" -> (qCosHist _),
    "q_assign_purity" -> (qAssignPurity _),
    "q_ann_recall" -> (qAnnRecall _),
    "q_ann_filtered" -> (qAnnFiltered _),
    "q_mrl_recall" -> (qMrlRecall _),
    "q_vector_norms" -> (qVectorNorms _),
    "q_quantize_int8" -> (qQuantizeInt8 _),
    "q_cosine_topk" -> (qCosineTopk _),
    "q_ann_ivf" -> (qAnnIvf _),
    "q_ann_multiprobe" -> (qAnnMultiprobe _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_embed_neardup" -> (qEmbedNeardup _),
    "q_semantic_dedup" -> (qSemanticDedup _),
    "q_centroids" -> (qCentroids _),
    "q_ann_upsert" -> (qAnnUpsert _),
    "q_kmeans" -> (qKmeans _),
  )

  /** Oracle formulation: per-element lateral expansion
    * (generate_subscripts) + grouped double sums; same rounding and
    * tie-break as the Spark side. */
  private def oracleCosine(bucketPred: String): String =
    s"""WITH pe AS (SELECT vec_id, label,
       |    generate_subscripts(embedding, 1) AS i,
       |    CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pe GROUP BY vec_id),
       |labels AS (SELECT DISTINCT vec_id, label FROM embeddings),
       |d AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id, sum(q.x * c.x) AS dot
       |  FROM pe q JOIN pe c ON q.i = c.i
       |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id $bucketPred
       |  GROUP BY q.vec_id, c.vec_id),
       |s AS (SELECT q_id, c_id,
       |    round(dot / (nq.nrm * nc.nrm), 4) + 0.0 AS sim
       |  FROM d
       |  JOIN norms nq ON q_id = nq.vec_id
       |  JOIN norms nc ON c_id = nc.vec_id),
       |r AS (SELECT q_id, c_id, sim,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rnk
       |  FROM s)
       |SELECT q_id, c_id, rnk, sim FROM r WHERE rnk <= 3
       |ORDER BY q_id ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_kmeans" -> {
      // the engine's driver-side Lloyd loop, unrolled to an
      // iteration-per-CTE chain (the q_dedup_clusters precedent:
      // iteration in the engine, unrolling in the oracle); every
      // round re-derives distances from the PREVIOUS round's
      // 4dp-rounded centroids so both engines iterate on identical
      // doubles
      def iter(t: Int, prev: String): String =
        s"""cc$t AS (SELECT cid, sum(c * c) AS cc FROM $prev GROUP BY cid),
           |vc$t AS (SELECT p.vec_id, c.cid, sum(p.x * c.c) AS vc
           |  FROM pe p JOIN $prev c ON p.i = c.i GROUP BY p.vec_id, c.cid),
           |d$t AS (SELECT vc$t.vec_id, vc$t.cid,
           |    round(vv.vv - 2 * vc$t.vc + cc$t.cc, 4) + 0.0 AS dist
           |  FROM vc$t JOIN vv ON vc$t.vec_id = vv.vec_id
           |  JOIN cc$t ON vc$t.cid = cc$t.cid),
           |a$t AS (SELECT vec_id, cid, dist, row_number() OVER
           |    (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rk
           |  FROM d$t),
           |s$t AS (SELECT cid, count(*) AS n_vecs,
           |    CAST(sum(CAST(round(dist * 1e4) AS BIGINT)) AS BIGINT) AS sse_u4
           |  FROM a$t WHERE rk = 1 GROUP BY cid),
           |c$t AS (SELECT a.cid, p.i, round(avg(p.x), 4) + 0.0 AS c
           |  FROM a$t a JOIN pe p ON a.vec_id = p.vec_id
           |  WHERE a.rk = 1 GROUP BY a.cid, p.i),
           |o$t AS (SELECT $t AS iter, c$t.cid, c$t.i AS pos,
           |    CAST(round(c$t.c * 1e4) AS BIGINT) AS c_u4,
           |    s$t.n_vecs, s$t.sse_u4
           |  FROM c$t JOIN s$t ON c$t.cid = s$t.cid)""".stripMargin
      s"""WITH pe AS (SELECT vec_id,
         |    generate_subscripts(embedding, 1) AS i,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |vv AS (SELECT vec_id, sum(x * x) AS vv FROM pe GROUP BY vec_id),
         |c0 AS (SELECT CAST(vec_id AS INT) AS cid, i, x AS c
         |  FROM pe WHERE vec_id < 4),
         |${iter(1, "c0")},
         |${iter(2, "c1")},
         |${iter(3, "c2")}
         |SELECT iter, cid, pos, c_u4, n_vecs, sse_u4 FROM o1
         |UNION ALL SELECT iter, cid, pos, c_u4, n_vecs, sse_u4 FROM o2
         |UNION ALL SELECT iter, cid, pos, c_u4, n_vecs, sse_u4 FROM o3
         |ORDER BY iter ASC NULLS FIRST, cid ASC NULLS FIRST,
         |  pos ASC NULLS FIRST""".stripMargin
    },
    "q_knn_classify" ->
      """WITH pe AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm
        |  FROM pe GROUP BY vec_id),
        |labels AS (SELECT DISTINCT vec_id, label FROM embeddings),
        |d AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    sum(q.x * c.x) AS dot
        |  FROM pe q JOIN pe c ON q.i = c.i
        |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
        |  GROUP BY q.vec_id, c.vec_id),
        |s AS (SELECT q_id, c_id,
        |    round(dot / (nq.nrm * nc.nrm), 4) + 0.0 AS sim
        |  FROM d JOIN norms nq ON q_id = nq.vec_id
        |  JOIN norms nc ON c_id = nc.vec_id),
        |r AS (SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
        |    ORDER BY sim DESC, c_id ASC) AS rnk FROM s),
        |v AS (SELECT r.q_id, lq.label AS true_label,
        |    lc.label AS c_label, count(*) AS votes
        |  FROM r JOIN labels lq ON r.q_id = lq.vec_id
        |  JOIN labels lc ON r.c_id = lc.vec_id
        |  WHERE r.rnk <= 3
        |  GROUP BY r.q_id, lq.label, lc.label),
        |m AS (SELECT q_id, true_label, c_label, votes,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY votes DESC, c_label ASC) AS rn FROM v)
        |SELECT q_id, true_label, c_label AS pred_label,
        |  votes AS n_votes,
        |  CASE WHEN c_label = true_label THEN 1 ELSE 0 END AS correct
        |FROM m WHERE rn = 1
        |ORDER BY q_id ASC NULLS FIRST""".stripMargin,
    "q_cos_hist" ->
      """WITH pe AS (SELECT vec_id,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm
        |  FROM pe GROUP BY vec_id),
        |d AS (SELECT a.vec_id AS pid, sum(a.x * b.x) AS dot
        |  FROM pe a JOIN pe b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
        |  GROUP BY a.vec_id),
        |s AS (SELECT round(dot / (na.nrm * nb.nrm), 4) + 0.0 AS sim
        |  FROM d
        |  JOIN norms na ON pid = na.vec_id
        |  JOIN norms nb ON nb.vec_id = pid + 1
        |  WHERE na.nrm > 0 AND nb.nrm > 0)
        |SELECT CAST(least(floor((sim + 1.0) * 10), 19) AS BIGINT) AS bin,
        |  count(*) AS n, round(min(sim), 4) + 0.0 AS lo,
        |  round(max(sim), 4) + 0.0 AS hi
        |FROM s GROUP BY 1
        |ORDER BY bin ASC NULLS FIRST""".stripMargin,
    "q_assign_purity" ->
      """WITH pe AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |cent AS (SELECT label AS cl, i, round(avg(x), 4) AS c
        |  FROM pe GROUP BY label, i),
        |vv AS (SELECT vec_id, label, sum(x * x) AS vv
        |  FROM pe GROUP BY vec_id, label),
        |cc AS (SELECT cl, sum(c * c) AS cc FROM cent GROUP BY cl),
        |vc AS (SELECT p.vec_id, c.cl, sum(p.x * c.c) AS vc
        |  FROM pe p JOIN cent c ON p.i = c.i GROUP BY p.vec_id, c.cl),
        |d AS (SELECT vc.vec_id, vc.cl,
        |    round(vv.vv - 2 * vc.vc + cc.cc, 4) + 0.0 AS dist
        |  FROM vc JOIN vv ON vc.vec_id = vv.vec_id JOIN cc ON vc.cl = cc.cl),
        |asg AS (SELECT vec_id, cl AS cell FROM (
        |    SELECT vec_id, cl, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist ASC, cl ASC) AS rn FROM d)
        |  WHERE rn = 1),
        |j AS (SELECT asg.cell, vv.label, count(*) AS n
        |  FROM asg JOIN vv ON asg.vec_id = vv.vec_id
        |  GROUP BY asg.cell, vv.label),
        |m AS (SELECT cell, label, n, row_number() OVER (PARTITION BY cell
        |    ORDER BY n DESC, label ASC) AS rn FROM j),
        |t AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_vecs
        |  FROM j GROUP BY cell)
        |SELECT t.cell, t.n_vecs, m.label AS majority_label,
        |  CAST(m.n AS BIGINT) AS n_majority,
        |  round(m.n / t.n_vecs, 4) AS purity
        |FROM t JOIN m ON t.cell = m.cell AND m.rn = 1
        |ORDER BY t.cell ASC NULLS FIRST""".stripMargin,
    "q_ann_recall" ->
      """WITH pe AS (SELECT vec_id,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm
        |  FROM pe GROUP BY vec_id),
        |labels AS (SELECT DISTINCT vec_id, label FROM embeddings),
        |d AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    sum(q.x * c.x) AS dot
        |  FROM pe q JOIN pe c ON q.i = c.i
        |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
        |  GROUP BY q.vec_id, c.vec_id),
        |s AS (SELECT q_id, c_id,
        |    round(dot / (nq.nrm * nc.nrm), 4) + 0.0 AS sim,
        |    lq.label = lc.label AS same
        |  FROM d
        |  JOIN norms nq ON q_id = nq.vec_id
        |  JOIN norms nc ON c_id = nc.vec_id
        |  JOIN labels lq ON q_id = lq.vec_id
        |  JOIN labels lc ON c_id = lc.vec_id),
        |r AS (SELECT q_id, same,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, c_id ASC) AS rall,
        |    row_number() OVER (PARTITION BY q_id, same
        |      ORDER BY sim DESC, c_id ASC) AS rsame
        |  FROM s)
        |SELECT q_id,
        |  CAST(sum(CASE WHEN rall <= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_exact,
        |  CAST(sum(CASE WHEN same AND rsame <= 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_probe,
        |  CAST(sum(CASE WHEN rall <= 3 AND same AND rsame <= 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  round(CAST(sum(CASE WHEN rall <= 3 AND same AND rsame <= 3
        |      THEN 1 ELSE 0 END) AS BIGINT) /
        |    CAST(sum(CASE WHEN rall <= 3 THEN 1 ELSE 0 END) AS BIGINT),
        |    4) AS recall_at_3
        |FROM r GROUP BY q_id
        |ORDER BY q_id ASC NULLS FIRST""".stripMargin,
    "q_vector_norms" ->
      """WITH pe AS (SELECT vec_id, label,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, label, sqrt(sum(x * x)) AS nrm
        |  FROM pe GROUP BY vec_id, label)
        |SELECT label, count(*) AS n_vecs,
        |  round(min(nrm), 4) AS min_norm,
        |  round(avg(nrm), 4) AS avg_norm,
        |  round(max(nrm), 4) AS max_norm
        |FROM norms
        |GROUP BY label
        |ORDER BY label ASC NULLS FIRST""".stripMargin,
    "q_quantize_int8" ->
      """WITH pe AS (SELECT vec_id, label,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |mm AS (SELECT vec_id AS m_id, min(x) AS mn, max(x) AS mx
        |  FROM pe GROUP BY vec_id),
        |codes AS (SELECT vec_id, label,
        |    CASE WHEN mx = mn THEN 0
        |      ELSE least(CAST(floor((x - mn) / ((mx - mn) / 255.0))
        |        AS BIGINT), 255) END AS code
        |  FROM pe JOIN mm ON vec_id = m_id)
        |SELECT vec_id, label, count(*) AS dim,
        |  CAST(sum(code) AS BIGINT) AS code_sum,
        |  CAST(sum(CASE WHEN code = 255 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_saturated,
        |  CAST(sum(CASE WHEN code = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero
        |FROM codes
        |GROUP BY vec_id, label
        |ORDER BY vec_id ASC NULLS FIRST""".stripMargin,
    "q_cosine_topk" -> oracleCosine(""),
    "q_ann_ivf" -> oracleCosine("AND q.label = c.label"),
    "q_ann_filtered" -> oracleCosine(
      "AND q.label = c.label AND c.vec_id IN " +
        "(SELECT doc_id FROM documents WHERE lang = 'en')"),
    "q_mrl_recall" ->
      """WITH pe AS (SELECT vec_id,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm
        |  FROM pe GROUP BY vec_id),
        |pnorms AS (SELECT vec_id, sqrt(sum(x * x)) AS pnrm
        |  FROM pe WHERE i <= 16 GROUP BY vec_id),
        |d AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    sum(q.x * c.x) AS dot
        |  FROM pe q JOIN pe c ON q.i = c.i
        |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
        |  GROUP BY q.vec_id, c.vec_id),
        |pd AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    sum(q.x * c.x) AS pdot
        |  FROM pe q JOIN pe c ON q.i = c.i
        |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id AND q.i <= 16
        |  GROUP BY q.vec_id, c.vec_id),
        |s AS (SELECT d.q_id, d.c_id,
        |    round(d.dot / (nq.nrm * nc.nrm), 4) + 0.0 AS sim,
        |    round(pd.pdot / (pq.pnrm * pc.pnrm), 4) + 0.0 AS psim
        |  FROM d JOIN pd ON d.q_id = pd.q_id AND d.c_id = pd.c_id
        |  JOIN norms nq ON d.q_id = nq.vec_id
        |  JOIN norms nc ON d.c_id = nc.vec_id
        |  JOIN pnorms pq ON d.q_id = pq.vec_id
        |  JOIN pnorms pc ON d.c_id = pc.vec_id
        |  WHERE nq.nrm > 0 AND nc.nrm > 0
        |    AND pq.pnrm > 0 AND pc.pnrm > 0),
        |r AS (SELECT q_id,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, c_id ASC) AS rall,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY psim DESC, c_id ASC) AS rpre
        |  FROM s)
        |SELECT q_id,
        |  CAST(sum(CASE WHEN rall <= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_exact,
        |  CAST(sum(CASE WHEN rall <= 3 AND rpre <= 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN rpre <= 3 THEN rall ELSE 0 END) AS BIGINT)
        |    AS truerank_sum,
        |  round(CAST(sum(CASE WHEN rall <= 3 AND rpre <= 3
        |      THEN 1 ELSE 0 END) AS BIGINT) /
        |    CAST(sum(CASE WHEN rall <= 3 THEN 1 ELSE 0 END) AS BIGINT),
        |    4) AS recall_at_3
        |FROM r GROUP BY q_id
        |ORDER BY q_id ASC NULLS FIRST""".stripMargin,
    "q_ann_lsh" -> {
      val projs = (0 until 8)
        .map(j => s"sum(x * (((${2 * j + 3} * i) % 3) - 1)) AS p$j")
        .mkString(", ")
      val bucket = (0 until 8)
        .map(j => s"(CASE WHEN round(p$j, 4) >= 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH pe AS (SELECT vec_id,
         |    generate_subscripts(embedding, 1) AS i,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pe GROUP BY vec_id),
         |pr AS (SELECT vec_id, $projs FROM pe GROUP BY vec_id),
         |bk AS (SELECT vec_id, $bucket AS bucket FROM pr),
         |d AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id, sum(q.x * c.x) AS dot
         |  FROM pe q JOIN pe c ON q.i = c.i
         |  JOIN bk bq ON bq.vec_id = q.vec_id
         |  JOIN bk bc ON bc.vec_id = c.vec_id AND bc.bucket = bq.bucket
         |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
         |  GROUP BY q.vec_id, c.vec_id),
         |s AS (SELECT q_id, c_id,
        |    round(dot / (nq.nrm * nc.nrm), 4) + 0.0 AS sim
         |  FROM d JOIN norms nq ON q_id = nq.vec_id
         |  JOIN norms nc ON c_id = nc.vec_id),
         |r AS (SELECT q_id, c_id, sim, row_number() OVER
         |    (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rnk
         |  FROM s)
         |SELECT q_id, c_id, rnk, sim FROM r WHERE rnk <= 3
         |ORDER BY q_id ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin
    },
    "q_ann_multiprobe" ->
      """WITH pe AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pe GROUP BY vec_id),
        |cent AS (SELECT label AS p_label, i, round(avg(x), 4) AS c
        |  FROM pe GROUP BY label, i),
        |qv AS (SELECT vec_id AS q_id, i, x FROM pe WHERE vec_id < 5),
        |qq AS (SELECT q_id, sum(x * x) AS vv FROM qv GROUP BY q_id),
        |ccs AS (SELECT p_label, sum(c * c) AS cc FROM cent GROUP BY p_label),
        |qc AS (SELECT q.q_id, c.p_label, sum(q.x * c.c) AS qc
        |  FROM qv q JOIN cent c ON q.i = c.i GROUP BY q.q_id, c.p_label),
        |pd AS (SELECT qc.q_id, qc.p_label,
        |    round(qq.vv - 2 * qc.qc + ccs.cc, 4) + 0.0 AS pdist
        |  FROM qc JOIN qq USING (q_id) JOIN ccs USING (p_label)),
        |pr AS (SELECT q_id, p_label, row_number() OVER
        |    (PARTITION BY q_id ORDER BY pdist ASC, p_label ASC) AS prk
        |  FROM pd),
        |probes AS (SELECT q_id, p_label FROM pr WHERE prk <= 2),
        |d AS (SELECT p.q_id, c.vec_id AS c_id, sum(q.x * c.x) AS dot
        |  FROM probes p
        |  JOIN pe c ON c.label = p.p_label
        |  JOIN pe q ON q.vec_id = p.q_id AND q.i = c.i
        |  WHERE c.vec_id <> p.q_id
        |  GROUP BY p.q_id, c.vec_id),
        |s AS (SELECT q_id, c_id,
        |    round(dot / (nq.nrm * nc.nrm), 4) + 0.0 AS sim
        |  FROM d JOIN norms nq ON q_id = nq.vec_id
        |  JOIN norms nc ON c_id = nc.vec_id),
        |r AS (SELECT q_id, c_id, sim, row_number() OVER
        |    (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rnk
        |  FROM s)
        |SELECT q_id, c_id, rnk, sim FROM r WHERE rnk <= 3
        |ORDER BY q_id ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin,
    "q_semantic_dedup" ->
      """WITH pe AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pe GROUP BY vec_id),
        |cent AS (SELECT label, i, round(avg(x), 4) AS c
        |  FROM pe GROUP BY label, i),
        |vv AS (SELECT vec_id, sum(x * x) AS vv FROM pe GROUP BY vec_id),
        |vc AS (SELECT p.vec_id, sum(p.x * c.c) AS vc
        |  FROM pe p JOIN cent c ON p.label = c.label AND p.i = c.i
        |  GROUP BY p.vec_id),
        |cc AS (SELECT label, sum(c * c) AS cc FROM cent GROUP BY label),
        |mem AS (SELECT DISTINCT vec_id, label FROM embeddings),
        |d AS (SELECT mem.vec_id, mem.label,
        |    round(vv.vv - 2 * vc.vc + cc.cc, 4) + 0.0 AS dist
        |  FROM mem JOIN vv USING (vec_id) JOIN vc USING (vec_id)
        |  JOIN cc ON mem.label = cc.label),
        |rk AS (SELECT label, vec_id, row_number() OVER
        |    (PARTITION BY label ORDER BY dist ASC, vec_id ASC) AS rk
        |  FROM d),
        |keep AS (SELECT label, vec_id AS keep_id FROM rk WHERE rk = 1),
        |dt AS (SELECT m.vec_id, m.label, keep.keep_id, sum(m.x * kp.x) AS dot
        |  FROM pe m
        |  JOIN keep ON m.label = keep.label
        |  JOIN pe kp ON kp.vec_id = keep.keep_id AND kp.i = m.i
        |  WHERE m.vec_id <> keep.keep_id
        |  GROUP BY m.vec_id, m.label, keep.keep_id),
        |s AS (SELECT dt.label, dt.keep_id, dt.vec_id,
        |    round(dt.dot / (nm.nrm * nk.nrm), 4) + 0.0 AS sim
        |  FROM dt JOIN norms nm ON dt.vec_id = nm.vec_id
        |  JOIN norms nk ON dt.keep_id = nk.vec_id)
        |SELECT label, keep_id, vec_id, sim,
        |  CAST(sim >= 0.2 AS INT) AS dropped
        |FROM s
        |ORDER BY label ASC NULLS FIRST, vec_id ASC NULLS FIRST""".stripMargin,
    "q_embed_neardup" ->
      """WITH pe AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pe GROUP BY vec_id),
        |d AS (SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.x * b.x) AS dot
        |  FROM pe a JOIN pe b ON a.i = b.i AND a.label = b.label
        |    AND a.vec_id < b.vec_id
        |  GROUP BY a.vec_id, b.vec_id),
        |s AS (SELECT va, vb, round(dot / (na.nrm * nb.nrm), 4) AS sim
        |  FROM d JOIN norms na ON va = na.vec_id JOIN norms nb ON vb = nb.vec_id)
        |SELECT va, vb, sim FROM s WHERE sim >= 0.35
        |ORDER BY va ASC NULLS FIRST, vb ASC NULLS FIRST""".stripMargin,
    "q_centroids" ->
      """WITH pe AS (SELECT label,
        |    generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings)
        |SELECT label, pos, round(avg(x), 4) + 0.0 AS centroid,
        |  count(*) AS n_vecs
        |FROM pe
        |GROUP BY label, pos
        |ORDER BY label ASC NULLS FIRST, pos ASC NULLS FIRST""".stripMargin,
    "q_pq_codes" ->
      """WITH pe AS (SELECT vec_id,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |sv AS (SELECT vec_id, CAST(floor((i - 1) / 16) AS BIGINT) AS sub,
        |    i, x FROM pe),
        |cb AS (SELECT vec_id AS code, sub, i, x AS c
        |  FROM sv WHERE vec_id < 16),
        |d AS (SELECT s.vec_id, s.sub, c.code,
        |    sum(s.x * s.x) - 2 * sum(s.x * c.c) + sum(c.c * c.c) AS rawd,
        |    round(sum(s.x * s.x) - 2 * sum(s.x * c.c) + sum(c.c * c.c), 4)
        |      + 0.0 AS dist
        |  FROM sv s JOIN cb c ON s.i = c.i AND s.sub = c.sub
        |  GROUP BY s.vec_id, s.sub, c.code),
        |a AS (SELECT vec_id, sub, code, rawd FROM (
        |    SELECT vec_id, sub, code, rawd, row_number() OVER (
        |      PARTITION BY vec_id, sub ORDER BY dist ASC, code ASC) AS rnk
        |    FROM d) WHERE rnk = 1)
        |SELECT sub, code, count(*) AS n_assigned,
        |  CAST(round(sum(rawd) * 100) AS BIGINT) AS err_u2
        |FROM a GROUP BY sub, code
        |ORDER BY sub ASC NULLS FIRST, code ASC NULLS FIRST""".stripMargin,
    "q_pq_recall" ->
      """WITH pe AS (SELECT vec_id,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |sv AS (SELECT vec_id, CAST(floor((i - 1) / 16) AS BIGINT) AS sub,
        |    i, x FROM pe),
        |cb AS (SELECT vec_id AS code, sub, i, x AS c
        |  FROM sv WHERE vec_id < 16),
        |d AS (SELECT s.vec_id, s.sub, c.code,
        |    round(sum(s.x * s.x) - 2 * sum(s.x * c.c) + sum(c.c * c.c), 4)
        |      + 0.0 AS dist
        |  FROM sv s JOIN cb c ON s.i = c.i AND s.sub = c.sub
        |  GROUP BY s.vec_id, s.sub, c.code),
        |a AS (SELECT vec_id, sub, code FROM (
        |    SELECT vec_id, sub, code, row_number() OVER (
        |      PARTITION BY vec_id, sub ORDER BY dist ASC, code ASC) AS rnk
        |    FROM d) WHERE rnk = 1),
        |lut AS (SELECT s.vec_id AS q_id, s.sub, c.code,
        |    round(sum(s.x * s.x) - 2 * sum(s.x * c.c) + sum(c.c * c.c), 4)
        |      + 0.0 AS ld
        |  FROM sv s JOIN cb c ON s.i = c.i AND s.sub = c.sub
        |  WHERE s.vec_id < 5 GROUP BY s.vec_id, s.sub, c.code),
        |adc AS (SELECT l.q_id, a.vec_id AS c_id,
        |    round(sum(l.ld), 4) + 0.0 AS adc
        |  FROM a JOIN lut l ON a.sub = l.sub AND a.code = l.code
        |  WHERE a.vec_id <> l.q_id GROUP BY l.q_id, a.vec_id),
        |ta AS (SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id, row_number() OVER (
        |      PARTITION BY q_id ORDER BY adc ASC, c_id ASC) AS r
        |    FROM adc) WHERE r <= 3),
        |ex AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    round(sum(c.x * c.x) - 2 * sum(q.x * c.x) + sum(q.x * q.x), 4)
        |      + 0.0 AS ed
        |  FROM pe q JOIN pe c ON q.i = c.i
        |    AND q.vec_id < 5 AND c.vec_id <> q.vec_id
        |  GROUP BY q.vec_id, c.vec_id),
        |te AS (SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id, row_number() OVER (
        |      PARTITION BY q_id ORDER BY ed ASC, c_id ASC) AS r
        |    FROM ex) WHERE r <= 3)
        |SELECT te.q_id,
        |  CAST(sum(CASE WHEN ta.c_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  round(sum(CASE WHEN ta.c_id IS NOT NULL THEN 1 ELSE 0 END)
        |    / 3.0, 4) AS recall_at_3
        |FROM te LEFT JOIN ta ON te.q_id = ta.q_id AND te.c_id = ta.c_id
        |GROUP BY te.q_id
        |ORDER BY te.q_id ASC NULLS FIRST""".stripMargin,
    "q_adc_err" ->
      """WITH pe AS (SELECT vec_id,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |sv AS (SELECT vec_id, CAST(floor((i - 1) / 16) AS BIGINT) AS sub,
        |    i, x FROM pe),
        |cb AS (SELECT vec_id AS code, sub, i, x AS c
        |  FROM sv WHERE vec_id < 16),
        |d AS (SELECT s.vec_id, s.sub, c.code,
        |    sum(s.x * s.x) - 2 * sum(s.x * c.c) + sum(c.c * c.c) AS rawd,
        |    round(sum(s.x * s.x) - 2 * sum(s.x * c.c) + sum(c.c * c.c), 4)
        |      + 0.0 AS dist
        |  FROM sv s JOIN cb c ON s.i = c.i AND s.sub = c.sub
        |  GROUP BY s.vec_id, s.sub, c.code),
        |a AS (SELECT vec_id, sub, code FROM (
        |    SELECT vec_id, sub, code, row_number() OVER (
        |      PARTITION BY vec_id, sub ORDER BY dist ASC, code ASC) AS rnk
        |    FROM d) WHERE rnk = 1),
        |lut AS (SELECT s.vec_id AS q_id, s.sub, c.code,
        |    sum(s.x * s.x) - 2 * sum(s.x * c.c) + sum(c.c * c.c) AS ld
        |  FROM sv s JOIN cb c ON s.i = c.i AND s.sub = c.sub
        |  WHERE s.vec_id < 5 GROUP BY s.vec_id, s.sub, c.code),
        |adc AS (SELECT l.q_id, a.vec_id AS c_id, sum(l.ld) AS adc
        |  FROM a JOIN lut l ON a.sub = l.sub AND a.code = l.code
        |  WHERE a.vec_id <> l.q_id GROUP BY l.q_id, a.vec_id),
        |ex AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    sum(c.x * c.x) - 2 * sum(q.x * c.x) + sum(q.x * q.x) AS ed
        |  FROM pe q JOIN pe c ON q.i = c.i
        |    AND q.vec_id < 5 AND c.vec_id <> q.vec_id
        |  GROUP BY q.vec_id, c.vec_id)
        |SELECT adc.q_id, count(*) AS n_pairs,
        |  CAST(round(sum(adc.adc - ex.ed) / count(*) * 10000) AS BIGINT)
        |    AS bias_u4,
        |  CAST(round(sum(abs(adc.adc - ex.ed)) / count(*) * 10000)
        |    AS BIGINT) AS mae_u4
        |FROM adc JOIN ex ON adc.q_id = ex.q_id AND adc.c_id = ex.c_id
        |GROUP BY adc.q_id
        |ORDER BY adc.q_id ASC NULLS FIRST""".stripMargin,
    "q_ivfpq" ->
      """WITH pe AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |sv AS (SELECT vec_id, label,
        |    CAST(floor((i - 1) / 16) AS BIGINT) AS sub, i, x FROM pe),
        |cb AS (SELECT vec_id AS code, sub, i, x AS c
        |  FROM sv WHERE vec_id < 16),
        |d AS (SELECT s.vec_id, s.label, s.sub, c.code,
        |    round(sum(s.x * s.x) - 2 * sum(s.x * c.c) + sum(c.c * c.c), 4)
        |      + 0.0 AS dist
        |  FROM sv s JOIN cb c ON s.i = c.i AND s.sub = c.sub
        |  GROUP BY s.vec_id, s.label, s.sub, c.code),
        |a AS (SELECT vec_id, label AS cell, sub, code FROM (
        |    SELECT vec_id, label, sub, code, row_number() OVER (
        |      PARTITION BY vec_id, sub ORDER BY dist ASC, code ASC) AS rnk
        |    FROM d) WHERE rnk = 1),
        |lut AS (SELECT s.vec_id AS q_id, s.label AS cell, s.sub, c.code,
        |    round(sum(s.x * s.x) - 2 * sum(s.x * c.c) + sum(c.c * c.c), 4)
        |      + 0.0 AS ld
        |  FROM sv s JOIN cb c ON s.i = c.i AND s.sub = c.sub
        |  WHERE s.vec_id < 5 GROUP BY s.vec_id, s.label, s.sub, c.code),
        |adc AS (SELECT l.q_id, a.vec_id AS c_id,
        |    round(sum(l.ld), 4) + 0.0 AS adc
        |  FROM a JOIN lut l ON a.cell = l.cell AND a.sub = l.sub
        |    AND a.code = l.code
        |  WHERE a.vec_id <> l.q_id GROUP BY l.q_id, a.vec_id),
        |short AS (SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id, row_number() OVER (
        |      PARTITION BY q_id ORDER BY adc ASC, c_id ASC) AS r
        |    FROM adc) WHERE r <= 10),
        |ex AS (SELECT sh.q_id, sh.c_id,
        |    round(sum(c.x * c.x) - 2 * sum(q.x * c.x) + sum(q.x * q.x), 4)
        |      + 0.0 AS dist
        |  FROM short sh
        |  JOIN pe c ON c.vec_id = sh.c_id
        |  JOIN pe q ON q.vec_id = sh.q_id AND q.i = c.i
        |  GROUP BY sh.q_id, sh.c_id)
        |SELECT q_id, c_id, rnk, dist FROM (
        |  SELECT q_id, c_id, dist, row_number() OVER (
        |    PARTITION BY q_id ORDER BY dist ASC, c_id ASC) AS rnk
        |  FROM ex) WHERE rnk <= 3
        |ORDER BY q_id ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin,
    "q_ann_upsert" ->
      """WITH pe AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |cent AS (SELECT label AS cell, i, round(avg(x), 4) AS c
        |  FROM pe WHERE vec_id % 10 <> 9 GROUP BY label, i),
        |qv AS (SELECT vec_id AS new_vec, i, x
        |  FROM pe WHERE vec_id % 10 = 9),
        |qq AS (SELECT new_vec, sum(x * x) AS vv FROM qv GROUP BY new_vec),
        |ccs AS (SELECT cell, sum(c * c) AS cc FROM cent GROUP BY cell),
        |qc AS (SELECT q.new_vec, c.cell, sum(q.x * c.c) AS qc
        |  FROM qv q JOIN cent c ON q.i = c.i GROUP BY q.new_vec, c.cell),
        |sl AS (SELECT DISTINCT vec_id AS new_vec, label AS stored_cell
        |  FROM embeddings WHERE vec_id % 10 = 9),
        |d AS (SELECT qc.new_vec, qc.cell,
        |    round(qq.vv - 2.0 * qc.qc + ccs.cc, 4) + 0.0 AS dist
        |  FROM qc JOIN qq ON qc.new_vec = qq.new_vec
        |  JOIN ccs ON qc.cell = ccs.cell),
        |r AS (SELECT new_vec, cell, dist,
        |    row_number() OVER (PARTITION BY new_vec
        |      ORDER BY dist ASC, cell ASC) AS rnk
        |  FROM d)
        |SELECT r.new_vec, r.cell, r.dist,
        |  CAST(r.cell = sl.stored_cell AS INT) AS agrees
        |FROM r JOIN sl ON r.new_vec = sl.new_vec
        |WHERE rnk = 1
        |ORDER BY r.new_vec ASC NULLS FIRST""".stripMargin,
  )
}
