package graft

import graft.media.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** X3/X4/L5: multimodal plumbing — probe/transcode stubs are
  * deterministic, schemas are typed, metadata access never touches
  * the binary column. */
class MultimodalSpec extends SparkSuite with Matchers {

  private def mediaDf = {
    import spark.implicits._
    Seq(
      ("m1", "0123456789abcdef0123456789abcdef".getBytes("UTF-8")),
      ("m2", "tiny".getBytes("UTF-8")),
      ("m3", ("x" * 96).getBytes("UTF-8")),
    ).toDF("mediaId", "media")
  }

  test("probe emits typed meta + packet timeline per record") {
    val ds = Multimodal.probe(mediaDf)
    val rows = ds.collect().sortBy(_.mediaId)
    rows.map(_.mediaId).toSeq shouldBe Seq("m1", "m2", "m3")
    val m1 = rows.head
    m1.meta.durationS shouldBe 2.0
    m1.packets should have size 4
    // deterministic: same bytes → same meta
    Multimodal.probe(mediaDf).collect().sortBy(_.mediaId).head.meta shouldBe m1.meta
    // audio-only stub rule: length divisible by 3
    rows.find(_.mediaId == "m3").get.meta.audioOnly shouldBe true
  }

  test("transcode shrinks and accounts the reference's scale-3 ratio") {
    val out = Multimodal.transcode(Multimodal.probe(mediaDf))
    val r = out.filter(col("mediaId") === "m1").collect().head
    r.getAs[Long]("origBytes") shouldBe 32L
    r.getAs[Long]("newBytes") shouldBe 8L // video stride 4
    r.getAs[Double]("pct_reduction") shouldBe 75.0
    // metadata-only projection prunes the binary columns from the plan
    val plan = out.select("mediaId", "pct_reduction").queryExecution
      .executedPlan.toString
    plan should not include "converted"
  }

  test("packet gap detection finds the injected ad gaps") {
    val gaps = Multimodal.packetGaps(Multimodal.probe(mediaDf))
    val m3 = gaps.filter(col("mediaId") === "m3").collect().head
    m3.getAs[Int]("n_packets") shouldBe 12
    // stub injects a 2 s jump every 4 packets
    m3.getAs[Int]("n_discontinuities") shouldBe 2
    m3.getAs[Double]("max_gap") shouldBe 2.02
  }

  test("frame sampling keeps every nth packet without explode") {
    val s = Multimodal.sampleFrames(Multimodal.probe(mediaDf), every = 2)
    val m1 = s.filter(col("mediaId") === "m1").collect().head
    m1.getAs[scala.collection.Seq[Any]]("sampled") should have size 2
  }
}
