package graft.multimodal

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property layer over the GVC1 container: for ANY frame
  * list and stride, the container round-trips every sampled frame
  * bit-exactly, sampling keeps exactly the indices ≡ 0 (mod stride),
  * and the m08 query's length arithmetic (frame count, sampled count)
  * matches the codec's own accounting. Seeded, so failures reproduce.
  */
class VideoCodecPropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(100)
    .withInitialSeed(Seed(20260813L))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val frameGen: Gen[Array[Byte]] = for {
    seed <- Gen.choose(0, Int.MaxValue)
  } yield Array.tabulate(64)(i => ((seed * 31 + i * 7) & 0xff).toByte)

  private val framesGen: Gen[List[Array[Byte]]] =
    Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, frameGen))

  test("property: every sampled frame round-trips bit-exactly at any " +
      "stride") {
    check(Prop.forAll(framesGen, Gen.choose(1, 7)) { (frames, stride) =>
      val gvc = VideoCodec.encodeGvc(frames.map(px =>
        ImageCodec.encodePng(8, 8, px)))
      val dec = VideoCodec.sampleDecoded(gvc, stride)
      val wantIdx = frames.indices.filter(_ % stride == 0)
      VideoCodec.frameCount(gvc) == frames.length &&
        dec.size == wantIdx.size &&
        wantIdx.zip(dec).forall { case (fi, d) =>
          d.width == 8 && d.height == 8 &&
            java.util.Arrays.equals(d.pixels, frames(fi))
        }
    })
  }

  test("property: sampled count matches the m08 ceil arithmetic") {
    // the oracle computes n_sampled = (n_frames + stride - 1) / stride
    // from lengths alone; the codec must agree for every (n, stride)
    check(Prop.forAll(Gen.choose(0, 40), Gen.choose(1, 9)) { (n, stride) =>
      val frames = List.fill(n)(Array.fill[Byte](64)(3))
      val gvc = VideoCodec.encodeGvc(frames.map(px =>
        ImageCodec.encodePng(8, 8, px)))
      VideoCodec.sampleDecoded(gvc, stride).size ==
        (n + stride - 1) / stride
    })
  }
}
