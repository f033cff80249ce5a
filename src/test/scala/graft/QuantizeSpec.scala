package graft

import java.nio.file.Files
import graft.ops.Similarity
import org.scalatest.matchers.should.Matchers

/** Crafted-input contract for L47 int8 quantization: the degenerate
  * constant vector must quantize to all-zero codes (not NaN/overflow
  * from the zero range), and a linear ramp must hit the exact
  * endpoint codes (0 and 255) with the IEEE-exact middle codes —
  * the invariants the oracle parity rests on. */
class QuantizeSpec extends SparkSuite with Matchers {

  test("constant vector -> all-zero codes; ramp hits exact endpoints") {
    val dir = Files.createTempDirectory("graft_quant").toString
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 1.0f, 1.0f, 1.0f), 0),
      (1L, Seq(0.0f, 1.0f, 2.0f, 3.0f), 1),
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = Similarity.qQuantizeInt8(spark, dir).collect()
    rows should have size 2

    val const = rows.find(_.getLong(0) == 0L).get
    const.getLong(2) shouldBe 4L   // dim
    const.getLong(3) shouldBe 0L   // code_sum: all-zero codes
    const.getLong(4) shouldBe 0L   // n_saturated
    const.getLong(5) shouldBe 4L   // n_zero

    // ramp 0..3 over range 3: codes floor(x / (3/255)) = 0, 85, 170, 255
    val ramp = rows.find(_.getLong(0) == 1L).get
    ramp.getLong(2) shouldBe 4L
    ramp.getLong(3) shouldBe (0L + 85L + 170L + 255L)
    ramp.getLong(4) shouldBe 1L
    ramp.getLong(5) shouldBe 1L
  }
}
