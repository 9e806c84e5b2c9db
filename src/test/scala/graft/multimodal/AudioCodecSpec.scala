package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The REAL audio codec (javax.sound.sampled): lossless PCM-WAV round
  * trip, honest rejection of non-audio bytes, and the decodeMeta
  * real-first/stub-fallback contract for the audio media type.
  */
class AudioCodecSpec extends AnyFunSuite {

  private def seededSamples(n: Int, seed: Int): Array[Byte] = {
    var x = seed | 1
    Array.fill(n) {
      x ^= x << 13; x ^= x >>> 17; x ^= x << 5
      x.toByte
    }
  }

  test("PCM8 WAV encode -> decode is bit-exact") {
    for ((n, seed) <- Seq((1, 1), (7, 2), (8192, 3), (10001, 4))) {
      val px = seededSamples(n, seed)
      val wav = AudioCodec.encodeWavPcm8(px, 8000f)
      assert(AudioCodec.looksLikeAudio(wav), "real RIFF container")
      val dec = AudioCodec.decode(wav).get
      assert(dec.frames == n.toLong && dec.channels == 1)
      assert(dec.sampleRate == 8000f)
      assert(java.util.Arrays.equals(dec.samples, px),
        s"lossy roundtrip at $n samples")
    }
  }

  test("direct RIFF writer is byte-identical to AudioSystem.write") {
    for ((n, seed) <- Seq((1, 11), (160, 12), (8192, 13), (10001, 14))) {
      val px = seededSamples(n, seed)
      assert(java.util.Arrays.equals(
        AudioCodec.encodeWavPcm8(px, 8000f),
        AudioCodec.encodeWavPcm8ViaAudioSystem(px, 8000f)),
        s"header/payload drift at $n samples")
    }
    // genuinely fractional rate: the JDK writer TRUNCATES to 11025 —
    // the direct writer must match byte-for-byte, not round to 11026
    val px = seededSamples(64, 15)
    assert(java.util.Arrays.equals(
      AudioCodec.encodeWavPcm8(px, 11025.5f),
      AudioCodec.encodeWavPcm8ViaAudioSystem(px, 11025.5f)))
  }

  test("decode returns None on non-audio bytes") {
    assert(AudioCodec.decode("spark group query row".getBytes).isEmpty)
    assert(AudioCodec.decode(Array.empty[Byte]).isEmpty)
    // truncated WAV: sniff passes, reader must still fail cleanly
    val wav = AudioCodec.encodeWavPcm8(seededSamples(64, 9), 8000f)
    assert(AudioCodec.decode(wav.take(10)).isEmpty)
  }

  test("corrupt RIFF never hangs or widens the decode contract") {
    val wav = AudioCodec.encodeWavPcm8(seededSamples(64, 7), 8000f)
    // a chunk size of 0xFFFFFFF8 truncates to a step of 0 in a naive
    // walk — the fast path must hand it off (size beyond buffer), not
    // spin. javax.sound's lenient reader happens to still decode this
    // payload, so the pinned property is termination + the general
    // path's answer, not rejection.
    val spin = wav.clone()
    spin(16) = 0xF8.toByte; spin(17) = 0xFF.toByte
    spin(18) = 0xFF.toByte; spin(19) = 0xFF.toByte
    val spun = AudioCodec.decode(spin) // returning at all = no spin
    assert(spun.forall(_.samples.length == 64))
    // malformed PCM header (0 channels): javax.sound refuses it, so the
    // fast path must too — same input, same stub fallback as before
    val zeroCh = wav.clone()
    zeroCh(22) = 0; zeroCh(23) = 0
    assert(AudioCodec.decode(zeroCh).isEmpty)
    // odd bits-per-sample: the fast path refuses (not a layout it can
    // interpret) and hands off — javax.sound leniently reads 13-bit
    // PCM at a 2-byte frame size, and that general-path answer must be
    // what decode() returns (fast path = subset, never a new behavior)
    val badBits = wav.clone()
    badBits(34) = 13
    assert(AudioCodec.decode(badBits).exists(_.frames == 32L))
  }

  test("decodeMeta: real (channels, rate, frames) for real audio") {
    val wav = AudioCodec.encodeWavPcm8(seededSamples(123, 5), 8000f)
    assert(MediaPipeline.decodeMeta("audio", wav) == ((1, 8000, 123)))
    // text payload: not audio -> the declared stub's arithmetic
    val text = "the fast key order sort".getBytes
    assert(MediaPipeline.decodeMeta("audio", text) ==
      MediaPipeline.decodeStub("audio", text))
    // image payloads never route through the audio codec
    assert(MediaPipeline.decodeMeta("image", wav) ==
      MediaPipeline.decodeStub("image", wav))
  }

  test("downsample2: rounded pair means, odd tail passes through") {
    def u(a: Array[Byte]) = a.map(_ & 0xff).toSeq
    // even length: exact rounded means, including the 255 ceiling
    assert(u(AudioCodec.downsample2(
      Array[Byte](0, 1, 10, 20, -1 /*255*/, -2 /*254*/))) ==
      Seq(1, 15, 255)) // (0+1+1)/2=1, (10+20+1)/2=15, (255+254+1)/2=255
    // odd length: last sample unchanged
    assert(u(AudioCodec.downsample2(Array[Byte](4, 6, 9))) == Seq(5, 9))
    // singleton and empty
    assert(u(AudioCodec.downsample2(Array[Byte](7))) == Seq(7))
    assert(AudioCodec.downsample2(Array.emptyByteArray).isEmpty)
    // randomized sweep vs a naive reference (seeded)
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 50) {
      val n = rnd.nextInt(40)
      val s = Array.fill(n)(rnd.nextInt(256).toByte)
      val naive = s.map(_ & 0xff).grouped(2).map { g =>
        if (g.length == 2) (g(0) + g(1) + 1) / 2 else g(0)
      }.toSeq
      assert(u(AudioCodec.downsample2(s)) == naive, s"drift at n=$n")
    }
  }
}
