package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The GVC1 container codec: real PNG frames in, real decoded frames
  * out, stride sampling decoding only what it keeps, loud failures on
  * malformed containers.
  */
class VideoCodecSpec extends AnyFunSuite {

  private def frame(seed: Int): Array[Byte] =
    Array.tabulate(64)(i => ((seed * 31 + i * 7) & 0xff).toByte)

  private def png(px: Array[Byte]): Array[Byte] =
    ImageCodec.encodePng(8, 8, px)

  test("round trip: every frame decodes to its source pixels") {
    val frames = (0 until 10).map(frame)
    val gvc = VideoCodec.encodeGvc(frames.map(png))
    assert(VideoCodec.frameCount(gvc) == 10)
    val dec = VideoCodec.sampleDecoded(gvc, stride = 1)
    assert(dec.size == 10)
    dec.zip(frames).foreach { case (d, src) =>
      assert(d.width == 8 && d.height == 8)
      assert(java.util.Arrays.equals(d.pixels, src))
    }
  }

  test("stride sampling keeps frames 0, s, 2s, ... and only those") {
    val frames = (0 until 11).map(frame)
    val gvc = VideoCodec.encodeGvc(frames.map(png))
    val dec = VideoCodec.sampleDecoded(gvc, stride = 4)
    assert(dec.size == 3) // frames 0, 4, 8
    Seq(0, 4, 8).zip(dec).foreach { case (fi, d) =>
      assert(java.util.Arrays.equals(d.pixels, frames(fi)),
        s"sampled frame $fi wrong")
    }
  }

  test("skipped frames are never PNG-decoded (seek via length prefix)") {
    // corrupt every NON-sampled frame's payload: stride sampling must
    // still succeed, because it seeks over them without decoding
    val frames = (0 until 8).map(frame)
    val blobs = frames.map(png).zipWithIndex.map { case (p, i) =>
      if (i % 4 == 0) p
      else Array.fill[Byte](p.length)(0x5a) // same length, garbage bytes
    }
    val gvc = VideoCodec.encodeGvc(blobs)
    val dec = VideoCodec.sampleDecoded(gvc, stride = 4)
    assert(dec.size == 2)
    assert(java.util.Arrays.equals(dec(0).pixels, frames(0)))
    assert(java.util.Arrays.equals(dec(1).pixels, frames(4)))
    // but a SAMPLED garbage frame fails loudly, never silently skips
    intercept[RuntimeException](VideoCodec.sampleDecoded(gvc, stride = 1))
  }

  test("empty container: zero frames, zero samples") {
    val gvc = VideoCodec.encodeGvc(Seq.empty)
    assert(VideoCodec.frameCount(gvc) == 0)
    assert(VideoCodec.sampleDecoded(gvc, stride = 4).isEmpty)
  }

  test("malformed containers fail loudly") {
    intercept[IllegalArgumentException](
      VideoCodec.frameCount(Array[Byte](1, 2, 3))) // short + bad magic
    intercept[IllegalArgumentException](
      VideoCodec.frameCount("XXXX0000".getBytes)) // bad magic
    val ok = VideoCodec.encodeGvc(Seq(png(frame(1))))
    // truncate mid-payload
    intercept[IllegalArgumentException](
      VideoCodec.sampleDecoded(ok.take(ok.length - 3), stride = 1))
    // trailing junk
    intercept[IllegalArgumentException](
      VideoCodec.sampleDecoded(ok ++ Array[Byte](0), stride = 1))
  }
}
