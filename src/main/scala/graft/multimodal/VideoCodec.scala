package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL video-container codec with zero new dependencies — the round-7
  * resolution of the "video boundary" decision: instead of a permanent
  * stub, graft defines an MJPEG-style frame container ("GVC1":
  * magic + frame count + length-prefixed PNG frames) and decodes its
  * frames with the JDK's real PNG codec ([[ImageCodec]]). This is the
  * same shape as MJPEG (a video stream that is just concatenated
  * still-image frames); what stays out of scope — explicitly — is
  * inter-frame-compressed formats (H.264/VP9/AV1): the JDK ships no
  * such codec, so foreign containers still route to
  * [[MediaPipeline.decodeStub]], which remains clearly marked.
  *
  * Frame SAMPLING is the real IO pattern of a keyframe pass at 100 TB:
  * the length prefixes let the reader SEEK over skipped frames —
  * payload bytes of non-sampled frames are never PNG-decoded, so
  * sampling every Nth frame costs ~1/N of the decode work, exactly like
  * keyframe extraction against a frame-indexed container in a real
  * pipeline (decode cost scales with frames KEPT, IO with container
  * bytes scanned).
  *
  * Container layout (all integers little-endian):
  *   bytes 0-3   magic 'G','V','C','1'
  *   bytes 4-7   frame count n (int32 >= 0)
  *   then n times: int32 payload length, payload (one PNG blob)
  */
object VideoCodec {
  private val Magic = Array[Byte]('G', 'V', 'C', '1')

  /** Assemble PNG frame blobs into a GVC1 container. */
  def encodeGvc(frames: Seq[Array[Byte]]): Array[Byte] = {
    val totalL = 8L + frames.map(f => 4L + f.length).sum
    require(totalL <= Int.MaxValue,
      s"gvc: container would be $totalL bytes (2 GiB array limit)")
    val total = totalL.toInt
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic)
    buf.putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Frame count from the header alone — no frame bytes touched. */
  def frameCount(gvc: Array[Byte]): Int = {
    val buf = header(gvc)
    val n = buf.getInt(4)
    require(n >= 0, s"gvc: negative frame count $n")
    n
  }

  /** Decode every `stride`-th frame (0, stride, 2*stride, ...).
    * Skipped frames are SEEKED over via their length prefix — their
    * payload bytes are never handed to the PNG decoder. Fails loudly on
    * a truncated container or an undecodable sampled frame (a silent
    * skip would fake coverage).
    */
  def sampleDecoded(gvc: Array[Byte], stride: Int): Seq[DecodedImage] = {
    require(stride >= 1, s"gvc: stride must be >= 1, got $stride")
    val buf = header(gvc)
    val n = buf.getInt(4)
    require(n >= 0, s"gvc: negative frame count $n")
    var off = 8
    val out = Seq.newBuilder[DecodedImage]
    var i = 0
    while (i < n) {
      require(off + 4 <= gvc.length, s"gvc: truncated at frame $i header")
      val len = buf.getInt(off)
      // overflow-free: `off + 4 + len` wraps negative for an adversarial
      // len near Int.MaxValue and would pass the naive comparison
      require(len >= 0 && len <= gvc.length - off - 4,
        s"gvc: truncated at frame $i payload (len=$len)")
      if (i % stride == 0) {
        val png = java.util.Arrays.copyOfRange(gvc, off + 4, off + 4 + len)
        out += ImageCodec.decode(png).getOrElse(
          sys.error(s"gvc: frame $i is not a decodable image"))
      }
      off += 4 + len
      i += 1
    }
    require(off == gvc.length,
      s"gvc: ${gvc.length - off} trailing bytes after frame $n")
    out.result()
  }

  private def header(gvc: Array[Byte]): ByteBuffer = {
    require(gvc.length >= 8 &&
      gvc(0) == Magic(0) && gvc(1) == Magic(1) &&
      gvc(2) == Magic(2) && gvc(3) == Magic(3),
      "gvc: bad magic (not a GVC1 container)")
    ByteBuffer.wrap(gvc).order(ByteOrder.LITTLE_ENDIAN)
  }
}
