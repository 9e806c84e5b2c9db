package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** A decoded 8-bit grayscale image: row-major pixels, length w*h. */
final case class DecodedImage(width: Int, height: Int, pixels: Array[Byte])

/** REAL image codec over the JDK's `javax.imageio` (PNG/BMP/JPEG readers
  * and writers ship with every JVM — zero new dependencies). This is the
  * non-stub half of the multimodal codec layer: payloads that actually
  * ARE images decode here; anything unreadable falls back to the
  * declared [[MediaPipeline.decodeStub]] so the synthesized text-byte
  * corpora keep their oracle-checked behavior.
  *
  * Determinism contract: grayscale PNG is lossless, and both encode and
  * decode move samples through the raster directly (no Graphics2D color
  * conversion on the gray path), so encodePng -> decode is bit-exact —
  * the m06 query and ImageCodecSpec pin that. Color inputs are reduced
  * to gray via the standard ITU-R 601 integer luma (the same rounding on
  * every JVM), not via drawImage (whose color-management path is
  * implementation-dependent).
  */
object ImageCodec {

  // One PNG ImageWriter per thread, reused across calls: ImageIO.write
  // re-runs the writer-SPI registry scan and allocates a fresh
  // MemoryCacheImageOutputStream on EVERY call — pure overhead when a
  // kernel encodes tens of thousands of tiny frames per partition
  // (m08's container path). Writers are stateful but reusable via
  // setOutput; each thread owns its instance, so no synchronization.
  private val pngWriter =
    ThreadLocal.withInitial[javax.imageio.ImageWriter] { () =>
      val it = ImageIO.getImageWritersByFormatName("png")
      require(it.hasNext, "imageio: no PNG writer")
      it.next()
    }

  /** Encode row-major 8-bit grayscale pixels as PNG. */
  def encodePng(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"encodePng: ${gray.length} pixels for ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, gray)
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val w = pngWriter.get()
    w.setOutput(ios)
    // finally: close the stream and detach it from the cached writer
    // even on a throw — otherwise the thread-local writer pins the last
    // image's buffer until the next encode and is left mid-write
    try w.write(img)
    finally {
      try ios.close() finally w.setOutput(null)
    }
    bos.toByteArray
  }

  // The decode-side twin of pngWriter: ImageIO.read runs the
  // reader-SPI registry scan per call; PNG payloads (the m06/m08 hot
  // path) go through a per-thread reused reader instead. Non-PNG
  // payloads still take the general ImageIO.read probe.
  // Retention is INTENTIONAL and bounded: one reader (and one writer,
  // above) per executor thread for the JVM lifetime — exactly what the
  // reuse buys; the JDK PNG reader holds no native resources beyond
  // its decode buffers, and setInput(null) drops those after each
  // image. A task-exit dispose() would re-pay the SPI scan per task.
  private val pngReader =
    ThreadLocal.withInitial[javax.imageio.ImageReader] { () =>
      val it = ImageIO.getImageReadersByFormatName("png")
      require(it.hasNext, "imageio: no PNG reader")
      it.next()
    }

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G'

  private def readImage(content: Array[Byte]): BufferedImage =
    if (isPng(content)) {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(content))
      val r = pngReader.get()
      r.setInput(iis)
      try r.read(0)
      finally {
        try iis.close() finally r.setInput(null)
      }
    } else ImageIO.read(new ByteArrayInputStream(content))

  /** Decode any imageio-readable payload (PNG/BMP/JPEG/GIF) to 8-bit
    * grayscale; None when no installed reader accepts the bytes (the
    * honest signal that the payload is not an image — callers fall back
    * to the stub).
    */
  def decode(content: Array[Byte]): Option[DecodedImage] = {
    val img =
      try readImage(content)
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val px = new Array[Byte](w * h)
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY) {
        // gray source: raw raster samples, bit-exact round trip
        img.getRaster.getDataElements(0, 0, w, h, px)
      } else {
        // color source: ITU-R 601 integer luma, deterministic on any JVM
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >>> 16) & 0xff
            val g = (rgb >>> 8) & 0xff
            val b = rgb & 0xff
            px(y * w + x) = ((r * 299 + g * 587 + b * 114 + 500) / 1000).toByte
            x += 1
          }
          y += 1
        }
      }
      Some(DecodedImage(w, h, px))
    }
  }

  /** Real average-pool downscale by an integer factor: each output pixel
    * is the rounded mean of its (up to) factor x factor source block
    * (edge blocks clamp). Exact integer arithmetic — deterministic on
    * any JVM, unlike Graphics2D's implementation-dependent resamplers.
    */
  def resizePooled(img: DecodedImage, factor: Int): DecodedImage = {
    require(factor >= 1, s"resizePooled: factor must be >= 1, got $factor")
    val ow = math.max(1, (img.width + factor - 1) / factor)
    val oh = math.max(1, (img.height + factor - 1) / factor)
    val out = new Array[Byte](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var sum = 0L
        var n = 0
        var y = oy * factor
        val yMax = math.min((oy + 1) * factor, img.height)
        while (y < yMax) {
          var x = ox * factor
          val xMax = math.min((ox + 1) * factor, img.width)
          while (x < xMax) {
            sum += img.pixels(y * img.width + x) & 0xff
            n += 1
            x += 1
          }
          y += 1
        }
        out(oy * ow + ox) = ((sum + n / 2) / n).toByte
        ox += 1
      }
      oy += 1
    }
    DecodedImage(ow, oh, out)
  }
}
