package graft

import graft.stream.RetryStateMachine
import graft.stream.RetryStateMachine.{Attempt, CaptureState}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Scalacheck properties (SURVEY.md §5.2(3)): pure invariants checked
  * over generated inputs. Native scalacheck Properties (sbt runs the
  * ScalaCheck framework directly; the scalatest bridge artifact is
  * not in the offline cache). */
object PropertySpec extends Properties("graft") {

  private val streamGen = Gen.nonEmptyListOf(Gen.alphaLowerChar)
    .map(_.take(12).mkString)
  private val qualGen: Gen[String] = Gen.oneOf(Gen.const("audio_only"),
    Gen.choose(144, 2160).map(_ + "p"))

  property("filename format∘parse = id (P1/P2/P8, convert.sh:38-42)") =
    forAll(streamGen, qualGen,
      Gen.choose(0, 99)) { (stream: String, qual: String, retry: Int) =>
      val name = s"${stream}_${qual}_2024-01-02T03:04:05_$retry.mkv"
      EtlPipeline.FilenamePattern.r.findFirstMatchIn(name) match {
        case Some(m) =>
          (m.group(1) == stream) :| "stream" &&
            (m.group(2) == qual) :| "quality" &&
            (m.group(4).toInt == retry) :| "retry"
        case None => Prop.falsified :| s"no match for $name"
      }
    }

  property("state machine: retryId ≤ budget; abandon implies poll") =
    forAll(Gen.listOf(Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false))),
      Gen.choose(0, 5)) { (outcomes: List[(Boolean, Boolean)], retries: Int) =>
      var st: Option[CaptureState] = None
      outcomes.zipWithIndex.forall { case ((poll, data), i) =>
        val (ns, t) = RetryStateMachine.step(retries)(
          st, Attempt("s", i.toLong, poll, data))
        st = ns
        t.retryId <= retries &&
          (t.action != "abandon_poll" || poll) &&
          (t.action != "exhausted" || ns.isEmpty)
      }
    }

  property("transcode stub: |out| = ceil(n/stride), deterministic") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 255).map(_.toByte)),
      Gen.oneOf(true, false)) { (bytes: List[Byte], audio: Boolean) =>
      val arr = bytes.toArray
      val out = graft.media.Multimodal.transcodeStub(arr, audio)
      val stride = if (audio) 8 else 4
      out.length == (arr.length + stride - 1) / stride &&
        java.util.Arrays.equals(out,
          graft.media.Multimodal.transcodeStub(arr, audio))
    }

  property("minhash is order- and duplication-invariant") =
    forAll(Gen.nonEmptyListOf(Gen.alphaLowerStr.map(_.take(6)))) { toks =>
      def sig(ts: Seq[String]): String = ts.map(t =>
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(("0:" + t).getBytes("UTF-8")).map("%02x".format(_)).mkString).min
      val shuffled = scala.util.Random.shuffle(toks)
      sig(toks) == sig(shuffled ++ toks.take(1)) // dup + reorder → same min
    }
}
