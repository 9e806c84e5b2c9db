package graft.multimodal

/** A ServiceLoader-discovered test decoder (declared in
  * `src/test/resources/META-INF/services/graft.multimodal.FrameDecoder`)
  * — proves the jar-shipped registration path a cluster deployment
  * uses, where programmatic register() on the driver would be invisible
  * to executor JVMs. Claims the magic "SVCD".
  */
final class ServiceLoadedDecoder extends FrameDecoder {
  val name = "service-loaded"
  def accepts(c: Array[Byte]): Boolean =
    c.length >= 4 && c(0) == 'S' && c(1) == 'V' && c(2) == 'C' &&
      c(3) == 'D'
  def frameCount(c: Array[Byte]): Int = math.max(0, c.length - 4)
  def sampleDecoded(c: Array[Byte], stride: Int): Seq[DecodedImage] =
    (4 until c.length by stride).map(i => DecodedImage(1, 1, Array(c(i))))
}
