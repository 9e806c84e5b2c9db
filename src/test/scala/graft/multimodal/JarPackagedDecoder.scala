package graft.multimodal

/** The decoder class JarPackagingSpec ships inside a built-at-test-time
  * jar. Deliberately NOT listed in
  * `src/test/resources/META-INF/services/...` — the ONLY services
  * declaration naming it is the one inside the jar the spec assembles,
  * so its discovery proves the jar's own descriptor was read. Claims
  * the magic "JARD".
  */
final class JarPackagedDecoder extends FrameDecoder {
  val name = "jar-packaged"
  def accepts(c: Array[Byte]): Boolean =
    c.length >= 4 && c(0) == 'J' && c(1) == 'A' && c(2) == 'R' &&
      c(3) == 'D'
  def frameCount(c: Array[Byte]): Int = math.max(0, c.length - 4)
  def sampleDecoded(c: Array[Byte], stride: Int): Seq[DecodedImage] =
    (4 until c.length by stride).map(i => DecodedImage(1, 1, Array(c(i))))
}
