package graft

import graft.ops.Similarity
import org.scalatest.matchers.should.Matchers

/** The IVF index build end-to-end: Lloyd iterations composed from
  * engine primitives (broadcast k-row centroid dim × distributed
  * vectors, codegen'd graft_dot distances, posexplode centroid
  * recompute). Lloyd's algorithm guarantees the total
  * within-cluster squared error never increases between iterations —
  * the property asserted here, plus actual improvement from the
  * arbitrary seed. */
class KMeansSpec extends SparkSuite with Matchers {

  test("Lloyd iterations: SSE is monotonically non-increasing and improves") {
    val sse = Similarity.kmeansSse(spark, sf, k = 4, iters = 4)
    sse should have size 4
    sse.foreach(_ should be >= 0.0)
    sse.sliding(2).foreach { case Seq(a, b) => b should be <= a + 1e-6 }
    // from an arbitrary (first-k) seed, one reassignment must actually help
    sse.last should be < sse.head
  }

  test("q_kmeans (oracle-gated Lloyd) keeps the non-increasing-SSE property") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Similarity.qKmeans(spark, sf)
    // per-iteration totals off the (iter, cid, pos) grain: counts and
    // SSE repeat across the 64 pos rows of a cluster, so sum distinct
    // (iter, cid) facts
    val byIter = out.select($"iter", $"cid", $"n_vecs", $"sse_u4").distinct()
      .groupBy($"iter")
      .agg(sum($"n_vecs").as("n"), sum($"sse_u4").as("sse"))
      .orderBy($"iter")
      .as[(Int, Long, Long)].collect()
    byIter.map(_._1).toSeq shouldBe Seq(1, 2, 3)
    // every vector stays assigned every round
    byIter.map(_._2).distinct should have size 1
    // the 4dp distance/centroid gates bound the rounding drift per
    // round at |N|·1e-4 in u4 units = |N| — far below a real increase
    val slack = byIter.head._2
    byIter.map(_._3).sliding(2).foreach {
      case Array(a, b) => b should be <= (a + slack)
      case _ =>
    }
    // and the final round's centroid table is the k×dim index
    out.filter($"iter" === 3).select($"cid", $"pos").distinct().count() shouldBe
      out.filter($"iter" === 3).count()
  }
}
