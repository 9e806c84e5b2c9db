package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The REAL image codec (javax.imageio): lossless gray PNG round trip,
  * honest rejection of non-image bytes, deterministic pooled resize,
  * and the decodeMeta real-first/stub-fallback contract.
  */
class ImageCodecSpec extends AnyFunSuite {

  private def seededPixels(n: Int, seed: Int): Array[Byte] = {
    // xorshift — deterministic across JVMs, full byte range
    var x = seed | 1
    Array.fill(n) {
      x ^= x << 13; x ^= x >>> 17; x ^= x << 5
      x.toByte
    }
  }

  test("gray PNG encode -> decode is bit-exact at odd sizes") {
    for ((w, h, seed) <- Seq((16, 31, 1), (1, 1, 2), (7, 3, 3), (64, 64, 4))) {
      val px = seededPixels(w * h, seed)
      val png = ImageCodec.encodePng(w, h, px)
      // a real PNG, not a stub: magic bytes present
      assert(MediaPipeline.looksLikeImage(png))
      val dec = ImageCodec.decode(png).get
      assert(dec.width == w && dec.height == h)
      assert(java.util.Arrays.equals(dec.pixels, px),
        s"lossy roundtrip at ${w}x$h")
    }
  }

  test("decode returns None on non-image bytes (no silent garbage)") {
    assert(ImageCodec.decode("the fast key order sort".getBytes).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
    // truncated PNG: magic sniff passes, reader must still fail cleanly
    val png = ImageCodec.encodePng(8, 8, seededPixels(64, 9))
    assert(ImageCodec.decode(png.take(12)).isEmpty)
  }

  test("resizePooled: exact block means, clamped edges") {
    // 4x4 ramp 0..15, factor 2 -> 2x2 of rounded 2x2-block means
    val img = DecodedImage(4, 4, Array.tabulate(16)(_.toByte))
    val out = ImageCodec.resizePooled(img, 2)
    assert(out.width == 2 && out.height == 2)
    // block {0,1,4,5} mean 2.5 -> 3 (round half up), {2,3,6,7} -> 5,
    // {8,9,12,13} -> 11, {10,11,14,15} -> 13
    assert(out.pixels.map(_ & 0xff).toSeq == Seq(3, 5, 11, 13))
    // 5x3 with factor 2: edge blocks clamp, dims ceil
    val odd = ImageCodec.resizePooled(DecodedImage(5, 3, seededPixels(15, 7)), 2)
    assert(odd.width == 3 && odd.height == 2)
  }

  test("resizePooled: randomized sweep vs a naive reference (seeded)") {
    val rnd = new scala.util.Random(20260814L)
    def naive(img: DecodedImage, f: Int): Seq[Int] = {
      val ow = math.max(1, (img.width + f - 1) / f)
      val oh = math.max(1, (img.height + f - 1) / f)
      for (oy <- 0 until oh; ox <- 0 until ow) yield {
        val block = for {
          y <- oy * f until math.min((oy + 1) * f, img.height)
          x <- ox * f until math.min((ox + 1) * f, img.width)
        } yield img.pixels(y * img.width + x) & 0xff
        (block.sum + block.size / 2) / block.size
      }
    }
    for (_ <- 1 to 25) {
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(12)
      val f = 1 + rnd.nextInt(4)
      val img = DecodedImage(w, h,
        Array.fill(w * h)(rnd.nextInt(256).toByte))
      val out = ImageCodec.resizePooled(img, f)
      assert(out.pixels.map(_ & 0xff).toSeq == naive(img, f),
        s"drift at ${w}x$h factor $f")
    }
  }

  test("decodeMeta: real dimensions for real images, stub otherwise") {
    val px = seededPixels(20 * 11, 5)
    val png = ImageCodec.encodePng(20, 11, px)
    assert(MediaPipeline.decodeMeta("image", png) == ((20, 11, 1)))
    // text payload: not an image -> the declared stub's arithmetic
    val text = "spark group query row".getBytes
    assert(MediaPipeline.decodeMeta("image", text) ==
      MediaPipeline.decodeStub("image", text))
    // non-image media types never touch the image codec
    assert(MediaPipeline.decodeMeta("audio", png) ==
      MediaPipeline.decodeStub("audio", png))
  }
}
