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

  /** Encode 8-bit unsigned mono PCM samples as a WAV file. */
  def encodeWavPcm8(samples: Array[Byte], sampleRate: Float): Array[Byte] = {
    require(samples.nonEmpty, "encodeWavPcm8: empty clip")
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
    */
  def decode(content: Array[Byte]): Option[DecodedAudio] =
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
