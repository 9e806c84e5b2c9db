package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** A decoded PCM audio clip: per-frame 8-bit unsigned samples. */
final case class DecodedAudio(
    sampleRate: Float, channels: Int, frames: Long, samples: Array[Byte])

/** REAL audio codec over the JDK's `javax.sound.sampled` (WAV/AIFF/AU
  * PCM readers and writers ship with every JVM — zero new
  * dependencies). The audio sibling of [[ImageCodec]]: payloads that
  * actually ARE riff/wave files decode here; anything unreadable falls
  * back to the declared [[MediaPipeline.decodeStub]].
  *
  * Determinism contract: PCM WAV is lossless — encodeWavPcm8 -> decode
  * returns the exact sample bytes (pinned by the oracle-checked m07
  * round trip and AudioCodecSpec).
  */
object AudioCodec {

  /** Encode 8-bit unsigned mono PCM samples as a WAV file.
    *
    * Emits the canonical 44-byte-header RIFF/WAVE layout directly —
    * byte-identical to `AudioSystem.write`'s output for this format
    * (pinned by AudioCodecSpec's golden compare), without the
    * synchronized writer-provider probe the JDK runs per call (the
    * encode-side twin of the [[decode]] contention fix).
    */
  def encodeWavPcm8(samples: Array[Byte], sampleRate: Float): Array[Byte] = {
    require(samples.nonEmpty, "encodeWavPcm8: empty clip")
    val n = samples.length
    val out = new Array[Byte](44 + n)
    def w32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, o)
    // the JDK writer (int)-casts the float rate — TRUNCATION, not
    // rounding; match it exactly or the byte-identity contract breaks
    // on fractional rates
    val rate = sampleRate.toLong
    tag(0, "RIFF"); w32(4, 36L + n); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16L)
    w16(20, 1) // integer PCM
    w16(22, 1) // mono
    w32(24, rate)
    w32(28, rate) // byte rate = rate * blockAlign(1)
    w16(32, 1) // block align
    w16(34, 8) // bits per sample
    tag(36, "data"); w32(40, n.toLong)
    System.arraycopy(samples, 0, out, 44, n)
    out
  }

  /** The javax.sound spelling of [[encodeWavPcm8]] — kept as the golden
    * reference the spec compares against byte-for-byte. */
  private[multimodal] def encodeWavPcm8ViaAudioSystem(
      samples: Array[Byte], sampleRate: Float): Array[Byte] = {
    // 8-bit PCM is unsigned in WAV; mono; frame = 1 byte
    val fmt = new AudioFormat(
      AudioFormat.Encoding.PCM_UNSIGNED, sampleRate, 8, 1, 1, sampleRate,
      false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode any javax.sound-readable payload (WAV/AIFF/AU) to its raw
    * sample bytes; None when no installed reader accepts the bytes —
    * the honest non-audio signal, callers fall back to the stub.
    *
    * Plain PCM RIFF/WAVE (the overwhelmingly common case, and
    * everything [[encodeWavPcm8]] emits) decodes through a direct
    * header parse: `AudioSystem.getAudioInputStream` runs a
    * synchronized provider probe per call, which collapses under 32
    * concurrent decode tasks — the m07/m09 sf1 probe measured ~17x for
    * 10x docs before this fast path. Non-PCM or non-RIFF payloads
    * still take the general javax.sound route.
    */
  def decode(content: Array[Byte]): Option[DecodedAudio] = {
    val riff = decodeRiffPcm(content)
    if (riff.isDefined) riff else decodeViaAudioSystem(content)
  }

  /** Direct RIFF/WAVE parse for format 1 (integer PCM): fmt + data
    * chunks, little-endian, word-aligned chunk walk. Returns None for
    * anything that isn't a self-contained PCM WAV — the caller then
    * probes the installed readers.
    */
  private def decodeRiffPcm(b: Array[Byte]): Option[DecodedAudio] = {
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (b.length < 44 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return None
    var off = 12
    var haveFmt = false
    var rate = 0f; var ch = 0; var blockAlign = 1
    var dataOff = -1; var dataLen = -1L
    while (off + 8 <= b.length && (!haveFmt || dataOff < 0)) {
      val sz = u32(off + 4)
      // a size field beyond the buffer is corrupt; rejecting it here
      // also guarantees the chunk walk ALWAYS advances (a 0xFFFFFFF8
      // size would truncate to a step of 0 and spin this loop forever)
      if (sz > b.length) return None
      val isFmt = b(off) == 'f' && b(off + 1) == 'm' &&
        b(off + 2) == 't' && b(off + 3) == ' '
      val isData = b(off) == 'd' && b(off + 1) == 'a' &&
        b(off + 2) == 't' && b(off + 3) == 'a'
      if (isFmt) {
        if (sz < 16 || off + 8 + 16 > b.length) return None
        if (u16(off + 8) != 1) return None // non-PCM: general path
        ch = u16(off + 10)
        rate = u32(off + 12).toFloat
        val bits = u16(off + 22)
        blockAlign = u16(off + 20)
        // reject headers javax.sound would reject, so the fast path
        // never WIDENS decode()'s readable-audio contract: a malformed
        // PCM header must still fall through to the stub, not emit
        // metadata the general path would have refused
        if (ch < 1 || rate <= 0f ||
          (bits != 8 && bits != 16 && bits != 24 && bits != 32) ||
          blockAlign != ch * (bits / 8)) return None
        haveFmt = true
      } else if (isData) {
        dataOff = off + 8
        dataLen = sz
      }
      off += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (!haveFmt || dataOff < 0 || dataLen < 0 ||
      dataOff + dataLen > b.length) None
    else {
      val bytes =
        java.util.Arrays.copyOfRange(b, dataOff, (dataOff + dataLen).toInt)
      Some(DecodedAudio(rate, ch, bytes.length.toLong / blockAlign, bytes))
    }
  }

  private def decodeViaAudioSystem(
      content: Array[Byte]): Option[DecodedAudio] =
    try {
      val ais = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(content))
      try {
        val fmt = ais.getFormat
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = ais.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = ais.read(buf) }
        val bytes = out.toByteArray
        // streaming containers (e.g. AU with the 0xFFFFFFFF length
        // marker) report frameLength = NOT_SPECIFIED (-1): derive the
        // true count from the bytes actually read instead of passing a
        // negative through as metadata
        val frames =
          if (ais.getFrameLength >= 0) ais.getFrameLength
          else bytes.length.toLong / math.max(1, fmt.getFrameSize)
        Some(DecodedAudio(fmt.getSampleRate, fmt.getChannels, frames,
          bytes))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Real sample-rate reduction: decimate unsigned 8-bit PCM by 2 with
    * a 2-tap mean (the boxcar anti-alias filter) — out(i) = rounded
    * mean of samples 2i and 2i+1; an odd trailing sample passes
    * through. Exact integer arithmetic, deterministic on any JVM;
    * halves the rate (8 kHz -> 4 kHz). Semantics pinned by the
    * oracle-checked m11 query.
    */
  def downsample2(samples: Array[Byte]): Array[Byte] = {
    val n = samples.length
    val out = new Array[Byte]((n + 1) / 2)
    var i = 0
    while (2 * i + 1 < n) {
      out(i) = (((samples(2 * i) & 0xff) + (samples(2 * i + 1) & 0xff)
        + 1) / 2).toByte
      i += 1
    }
    if (n % 2 == 1) out(out.length - 1) = samples(n - 1)
    out
  }

  /** Magic-byte sniff (RIFF/WAVE, AIFF FORM, AU .snd) — same role as
    * [[MediaPipeline.looksLikeImage]]: skip the reader probe on
    * payloads that obviously aren't audio containers.
    */
  def looksLikeAudio(c: Array[Byte]): Boolean =
    c.length >= 4 && (
      (c(0) == 'R' && c(1) == 'I' && c(2) == 'F' && c(3) == 'F') ||
      (c(0) == 'F' && c(1) == 'O' && c(2) == 'R' && c(3) == 'M') ||
      (c(0) == '.' && c(1) == 's' && c(2) == 'n' && c(3) == 'd'))
}
