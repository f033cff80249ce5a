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
}
