package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The bytes⇒frames SPI contract: builtins claim their formats, the
  * stub is the total fallback, and — the point of the registry — a
  * third-party decoder (the ffmpeg-JNI shape) plugs in by `register`
  * alone, with no query-code change.
  */
class FrameDecodersSpec extends AnyFunSuite {

  private def png(w: Int, h: Int): Array[Byte] =
    ImageCodec.encodePng(w, h, Array.fill(w * h)(7.toByte))

  test("routing: GVC1 to the video builtin, still image to the image " +
      "builtin, anything else to the stub") {
    val gvc = VideoCodec.encodeGvc(Seq(png(4, 4), png(4, 4)))
    assert(FrameDecoders.forContent(gvc).name == "gvc1")
    assert(FrameDecoders.forContent(png(4, 4)).name == "still-image")
    assert(FrameDecoders.forContent("mp4-ish garbage".getBytes).name ==
      "stub")
    assert(FrameDecoders.forContent(Array.emptyByteArray).name == "stub")
  }

  test("builtin decode through the registry equals the direct codec " +
      "calls (m08's hash-stability guarantee)") {
    val frames = Seq(png(8, 8), png(8, 8), png(8, 8))
    val gvc = VideoCodec.encodeGvc(frames)
    val d = FrameDecoders.forContent(gvc)
    assert(d.frameCount(gvc) == VideoCodec.frameCount(gvc))
    val viaReg = d.sampleDecoded(gvc, 2)
    val direct = VideoCodec.sampleDecoded(gvc, 2)
    assert(viaReg.size == direct.size)
    viaReg.zip(direct).foreach { case (a, b) =>
      assert(a.width == b.width && a.height == b.height)
      assert(java.util.Arrays.equals(a.pixels, b.pixels))
    }
  }

  test("a fake third-party decoder registers, claims its magic, and " +
      "unregisters cleanly") {
    // the ffmpeg-bridge shape: custom container magic, custom decode
    object FakeH264 extends FrameDecoder {
      val name = "fake-h264"
      def accepts(c: Array[Byte]): Boolean =
        c.length >= 4 && c(0) == 'F' && c(1) == 'A' && c(2) == 'K' &&
          c(3) == 'E'
      def frameCount(c: Array[Byte]): Int = c.length - 4
      def sampleDecoded(c: Array[Byte], stride: Int): Seq[DecodedImage] =
        (4 until c.length by stride).map(i =>
          DecodedImage(1, 1, Array(c(i))))
    }
    val payload = "FAKE".getBytes("ISO-8859-1")
    // before registration: nothing claims it but the stub
    assert(FrameDecoders.forContent(payload).name == "stub")
    FrameDecoders.register(FakeH264)
    try {
      val d = FrameDecoders.forContent(payload)
      assert(d.name == "fake-h264")
      assert(d.frameCount(payload) == 3)
      val fr = d.sampleDecoded(payload, 1)
      assert(fr.map(_.pixels(0).toInt) == Seq(1, 2, 3))
      // builtins still win their own formats (registration is additive)
      val gvc = VideoCodec.encodeGvc(Seq(png(2, 2)))
      assert(FrameDecoders.forContent(gvc).name == "gvc1")
    } finally FrameDecoders.unregister("fake-h264")
    assert(FrameDecoders.forContent(payload).name == "stub")
  }

  test("a registered decoder may OVERRIDE a builtin format") {
    val gvc = VideoCodec.encodeGvc(Seq(png(2, 2)))
    object Override extends FrameDecoder {
      val name = "gvc-override"
      def accepts(c: Array[Byte]): Boolean =
        FrameDecoders.Gvc.accepts(c)
      def frameCount(c: Array[Byte]): Int = 99
      def sampleDecoded(c: Array[Byte], stride: Int): Seq[DecodedImage] =
        Nil
    }
    FrameDecoders.register(Override)
    try assert(FrameDecoders.forContent(gvc).frameCount(gvc) == 99)
    finally FrameDecoders.unregister("gvc-override")
    assert(FrameDecoders.forContent(gvc).frameCount(gvc) == 1)
  }

  test("a ServiceLoader-shipped decoder is discovered without any " +
      "register() call (the cluster-wide registration path)") {
    // declared in src/test/resources/META-INF/services — the exact
    // mechanism a third-party jar uses, visible in every JVM that has
    // the jar on its classpath (driver AND executors)
    val payload = "SVCDab".getBytes("ISO-8859-1")
    val d = FrameDecoders.forContent(payload)
    assert(d.name == "service-loaded")
    assert(d.frameCount(payload) == 2)
    assert(d.sampleDecoded(payload, 1).size == 2)
  }

  test("a claimed still image that fails to decode errors loudly " +
      "(frameCount/sampleDecoded consistency)") {
    // PNG magic, truncated body: Still claims it (sniff passes), so a
    // silent empty Seq would contradict frameCount = 1
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)
    val d = FrameDecoders.forContent(corrupt)
    assert(d.name == "still-image")
    assert(d.frameCount(corrupt) == 1)
    val e = intercept[RuntimeException](d.sampleDecoded(corrupt, 1))
    assert(e.getMessage.contains("failed to decode"))
  }

  test("stub frames are deterministic, stride-sampled, and match the " +
      "declared header fake") {
    val c = "not any container".getBytes
    val n = MediaPipeline.decodeStub("video", c)._3
    assert(FrameDecoders.Stub.frameCount(c) == n)
    val s3 = FrameDecoders.Stub.sampleDecoded(c, 3)
    assert(s3.size == (n + 2) / 3)
    s3.foreach { f =>
      assert(f.width == 8 && f.height == 8 && f.pixels.length == 64)
    }
    // deterministic: same payload, same frames
    val again = FrameDecoders.Stub.sampleDecoded(c, 3)
    s3.zip(again).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.pixels, b.pixels))
    }
  }
}
