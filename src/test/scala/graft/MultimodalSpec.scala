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

  test("resize-to-fit: aspect preserved, never upscaled, audio untouched") {
    val ds = Multimodal.probe(mediaDf)
    val before = ds.collect().map(r => r.mediaId -> r).toMap
    val after = Multimodal.resizeToFit(ds, maxW = 640, maxH = 640)
      .collect().map(r => r.mediaId -> r).toMap

    // m1: 32 bytes → video 1280x720; box 640 → scale 0.5 → 640x360
    val (b1, a1) = (before("m1"), after("m1"))
    b1.meta.audioOnly shouldBe false
    (b1.meta.width, b1.meta.height) shouldBe (1280, 720)
    (a1.meta.width, a1.meta.height) shouldBe (640, 360)
    // aspect ratio preserved to integer floor
    a1.meta.width.toDouble / a1.meta.height shouldBe
      (b1.meta.width.toDouble / b1.meta.height) +- 0.01
    // payload shrinks ~with area (ratio 0.25 → stride 4)
    a1.media.length shouldBe (b1.media.length + 3) / 4
    // geometry-independent fields carried through
    a1.meta.durationS shouldBe b1.meta.durationS
    a1.meta.codec shouldBe b1.meta.codec
    a1.packets shouldBe b1.packets

    // audio-only record passes through byte-identical
    val (b3, a3) = (before("m3"), after("m3"))
    b3.meta.audioOnly shouldBe true
    a3.media shouldBe b3.media
    a3.meta shouldBe b3.meta

    // a box larger than the media never upscales
    val same = Multimodal.resizeToFit(ds, maxW = 4096, maxH = 4096)
      .collect().map(r => r.mediaId -> r).toMap
    same("m1").meta shouldBe b1.meta
    same("m1").media shouldBe b1.media

    // deterministic: same input, same output
    Multimodal.resizeToFit(ds, 640, 640).collect().map(_.media.length).sorted shouldBe
      after.values.map(_.media.length).toArray.sorted
  }
}
