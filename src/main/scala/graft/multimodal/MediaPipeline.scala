package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal sample: an opaque binary payload + typed metadata.
  *
  * This mirrors how a 100 TB multimodal corpus is actually laid out:
  * media bytes ride along as a `binary` column inside parquet (or as
  * pointers into an object store), and ALL Spark-side logic — schemas,
  * partitioning, batch iteration — treats them as opaque until a
  * worker-local codec decodes them.
  */
final case class MediaSample(
    doc_id: Long,
    media_type: String, // image | audio | video
    content: Array[Byte])

/** Decoded per-sample features (the output of the extract pass). */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    size_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    // 16-bin byte histogram of the payload — stands in for an embedding
    histogram: Array[Long])

/** Multimodal column plumbing with a two-tier codec layer: REAL image
  * decode via the JDK's `javax.imageio` ([[ImageCodec]] — PNG/BMP/JPEG,
  * no new dependencies; exercised end-to-end by the oracle-checked m06
  * round trip and ImageCodecSpec) and REAL audio decode via the JDK's
  * `javax.sound.sampled` ([[AudioCodec]] — PCM WAV/AIFF/AU; m07 round
  * trip and AudioCodecSpec), and REAL video-frame decode for the GVC1
  * container ([[VideoCodec]] — MJPEG-style length-prefixed PNG frames,
  * decoded with the same JDK PNG codec; oracle-checked m08 round trip
  * and VideoCodecSpec). bytes⇒frames is PLUGGABLE: consumers route
  * through the [[FrameDecoders]] registry (GVC1 → [[VideoCodec]],
  * still images → [[ImageCodec]], else the stub entry), so a real
  * deployment drops in an ffmpeg JNI bridge for inter-frame formats
  * (H.264/VP9/AV1 — the JDK ships no such codec) with
  * `FrameDecoders.register`, touching no query code. `decodeStub`
  * remains the clearly-marked deterministic fallback for payloads no
  * installed reader accepts (it backs the registry's stub entry and
  * the synthesized text-byte corpora).
  * Everything around the codec — the binary column
  * synthesis, the `mapPartitions` batch iteration (the Scala analog of
  * `mapInPandas`: one iterator pass per partition, no per-row UDF
  * dispatch), the schema and partitioning — is real.
  *
  * Scale notes: media rows are wide (payload-dominated), so the extract
  * pass repartitions by byte budget, not row count; decode is per-row
  * CPU-bound work that pipelines inside a single partition iterator with
  * zero shuffle.
  */
object MediaPipeline {

  /** Fake "header decode": reads dimensions from the leading bytes.
    * STUB — replace with a real codec (javax.imageio / ffmpeg JNI); the
    * signature (bytes => metadata) is the real contract.
    */
  def decodeStub(mediaType: String, content: Array[Byte]): (Int, Int, Int) = {
    def b(i: Int): Int = if (content.length > i) content(i) & 0xff else 0
    val width = 64 + (b(0) * 7 + b(1)) % 1024
    val height = 64 + (b(2) * 5 + b(3)) % 768
    val frames = mediaType match {
      case "video" => 1 + b(4) % 120
      case "audio" => 1 + b(4) % 16
      case _       => 1
    }
    (width, height, frames)
  }

  /** Header decode with the REAL codec first: image payloads that
    * `javax.imageio` can read (PNG/BMP/JPEG — in every JDK, no new
    * dependency) report their true dimensions via [[ImageCodec.decode]];
    * anything unreadable (including this sandbox's synthesized text-byte
    * payloads) falls back to [[decodeStub]], preserving the
    * oracle-checked stub behavior. Real corpora with real image bytes
    * hit the real path.
    */
  def decodeMeta(mediaType: String, content: Array[Byte]): (Int, Int, Int) =
    if (mediaType == "image" && looksLikeImage(content))
      ImageCodec.decode(content)
        .map(d => (d.width, d.height, 1))
        .getOrElse(decodeStub(mediaType, content))
    else if (mediaType == "audio" && AudioCodec.looksLikeAudio(content))
      // audio metadata in the (width, height, frames) triple:
      // channels, sample rate, frame count
      AudioCodec.decode(content)
        .map(d => (d.channels, d.sampleRate.toInt,
          math.min(d.frames, Int.MaxValue.toLong).toInt))
        .getOrElse(decodeStub(mediaType, content))
    else decodeStub(mediaType, content)

  /** Magic-byte sniff (PNG/JPEG/BMP/GIF) so the batch iterator never
    * pays an ImageIO reader probe on payloads that obviously aren't
    * images — at 100 TB the non-image rows are the common case in a
    * mixed corpus and the probe is per-row overhead.
    */
  def looksLikeImage(c: Array[Byte]): Boolean =
    c.length >= 4 && (
      (c(0) == 0x89.toByte && c(1) == 'P' && c(2) == 'N' && c(3) == 'G') ||
      (c(0) == 0xff.toByte && c(1) == 0xd8.toByte) || // JPEG SOI
      (c(0) == 'B' && c(1) == 'M') ||
      (c(0) == 'G' && c(1) == 'I' && c(2) == 'F'))

  /** Fake "resize": 2x2-pooling stand-in keeping every `factor`-th byte
    * (dims halve, payload drops `factor`x). STUB — a real codec resamples
    * pixels; the contract (bytes, factor) => smaller bytes is real.
    */
  def resizeStub(content: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((content.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = content(i * factor); i += 1 }
    out
  }

  /** Deterministic frame sampling: every `stride`-th 64-byte block. */
  def frameSample(content: Array[Byte], stride: Int): Seq[Array[Byte]] =
    content.grouped(64).zipWithIndex
      .collect { case (blk, i) if i % stride == 0 => blk }
      .toSeq

  /** Synthesize a media table from `documents` (the testdata has no real
    * binaries): payload = utf8 bytes of the text, media_type from doc_id.
    * In production this is simply `spark.read.parquet(mediaDir)`.
    */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /** The extract pass: batch-iterate each partition, decode, emit
    * features. No shuffle; scales with input partitions.
    */
  def extract(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaSample].mapPartitions { it =>
      it.map { s =>
        val (w, h, f) = decodeMeta(s.media_type, s.content)
        val hist = new Array[Long](16)
        var i = 0
        while (i < s.content.length) {
          hist((s.content(i) & 0xff) / 16) += 1
          i += 1
        }
        MediaFeatures(s.doc_id, s.media_type, s.content.length.toLong,
          w, h, f, hist)
      }
    }
  }
}
