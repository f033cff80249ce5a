package graft

import java.nio.file.Files
import graft.ops.Similarity
import org.scalatest.matchers.should.Matchers

/** Crafted-input contract for L76/L77 product quantization: an exact
  * copy of an exemplar must take that exemplar's code in EVERY
  * subspace with zero quantization error, exemplars must self-assign
  * (occupancy 1 apiece), and on a codebook that represents the corpus
  * exactly the ADC ranking must reproduce the exact ranking — recall@3
  * of 1.0 for every query, including the equidistant-neighbor ties
  * that the (dist, c_id) tie-break must resolve identically on both
  * ranking sides. */
class PQSpec extends SparkSuite with Matchers {

  test("exemplar copy takes its code with zero error; ADC recall is 1.0 on an exact codebook") {
    val dir = Files.createTempDirectory("graft_pq").toString
    import spark.implicits._
    // exemplar j (vec_id j < 16) = the constant-j vector: subvectors
    // are distinct per subspace, pairwise dist per sub = 16(a-b)^2.
    // vec 16 duplicates exemplar 3 exactly.
    val rows = (0 to 15).map(j => (j.toLong, Seq.fill(64)(j.toFloat), j)) :+
      (16L, Seq.fill(64)(3.0f), 3)
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val codes = Similarity.qPqCodes(spark, dir).collect()
    codes.length shouldBe 4 * 16 // every codeword occupied, none dead
    codes.foreach { r =>
      val (sub, code, n, err) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      withClue(s"sub=$sub code=$code: ") {
        n shouldBe (if (code == 3L) 2L else 1L) // the copy joins code 3
        err shouldBe 0L // self-assignments and the exact copy: zero error
      }
    }

    // IVF-PQ: cells are singletons except cell 3 = {vec 3, vec 16},
    // so of the five queries only q3 has a cellmate — the cell probe
    // must confine candidates to the query's own cell, and the exact
    // re-rank must score the duplicate at distance zero
    val ivfpq = Similarity.qIvfPq(spark, dir).collect()
    ivfpq.length shouldBe 1
    ivfpq(0).getLong(0) shouldBe 3L   // q_id
    ivfpq(0).getLong(1) shouldBe 16L  // c_id: the exact copy
    ivfpq(0).getInt(2) shouldBe 1     // rnk
    ivfpq(0).getDouble(3) shouldBe 0.0
    // the serving path is equi-joins end to end — no nested loop
    Similarity.qIvfPq(spark, dir).queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin") shouldBe false

    val rec = Similarity.qPqRecall(spark, dir).collect()
    rec.map(_.getLong(0)) shouldBe Array(0L, 1L, 2L, 3L, 4L)
    rec.foreach { r =>
      withClue(s"q=${r.getLong(0)}: ") {
        r.getLong(1) shouldBe 3L          // n_hits
        r.getDouble(2) shouldBe 1.0 // recall_at_3 (exact: 3/3 rounds to 1.0)
      }
    }
  }
}
