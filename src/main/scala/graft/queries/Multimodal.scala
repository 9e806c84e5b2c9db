package graft.queries

import graft.Tables
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary payloads + typed metadata, decode /
  * frame-sample plumbing (see [[graft.multimodal.MediaPipeline]]).
  */
object Multimodal {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "m01_media_meta",
      (s, dir) => {
        import s.implicits._
        // metadata + content addressing over opaque binary columns:
        // size, content hash, and a deterministic "frame 0" slice hash.
        // Pure column expressions — whole-stage codegen, no UDFs.
        val media = MediaPipeline.synthesize(Tables.load(s, dir, "documents"))
        media.select(
          $"doc_id", $"media_type",
          length($"content").cast("long").as("size_bytes"),
          md5($"content").as("content_md5"),
          md5(substring($"content", 1, 64)).as("frame0_md5"))
      },
      Some("""
        SELECT doc_id,
          ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
          CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
          -- corpus is pure ASCII: md5 over chars == md5 over utf8 bytes
          md5(text) AS content_md5,
          md5(substring(text, 1, 64)) AS frame0_md5
        FROM documents""")),

    GraftQuery(
      "m02_media_features",
      (s, dir) => {
        import s.implicits._
        // the stubbed decode + feature-extract pass (mapPartitions batch
        // iteration). The codec stub is deterministic byte arithmetic over
        // the payload, so the oracle reproduces every feature from the
        // source text (payload == utf8 bytes; corpus is ASCII, so
        // char position == byte position and ascii() == byte value):
        // width/height/frames from the "header" bytes, histogram bin 6
        // (bytes 0x60-0x6f) by character-class count, histogram total ==
        // payload length.
        val media = MediaPipeline.synthesize(Tables.load(s, dir, "documents"))
        MediaPipeline.extract(s, media).toDF()
          .select($"doc_id", $"media_type", $"size_bytes",
            $"width", $"height", $"n_frames",
            element_at($"histogram", 7).as("hist_bin6"),
            aggregate($"histogram", lit(0L), (a, x) => a + x).as("hist_total"))
      },
      Some("""
        SELECT doc_id,
          ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
          CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
          CAST(64 + (ascii(substr(text,1,1))*7 + ascii(substr(text,2,1))) % 1024
            AS INT) AS width,
          CAST(64 + (ascii(substr(text,3,1))*5 + ascii(substr(text,4,1))) % 768
            AS INT) AS height,
          CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + ascii(substr(text,5,1)) % 120
                    WHEN doc_id % 3 = 1 THEN 1 + ascii(substr(text,5,1)) % 16
                    ELSE 1 END AS INT) AS n_frames,
          CAST(length(regexp_replace(text, '[^\x60-\x6f]', '', 'g')) AS BIGINT)
            AS hist_bin6,
          CAST(octet_length(encode(text)) AS BIGINT) AS hist_total
        FROM documents""")),

    GraftQuery(
      "m03_media_agg",
      (s, dir) => {
        import s.implicits._
        // corpus stats per modality over the binary column — the "how much
        // of each media type do we have" pass every pipeline runs first.
        val media = MediaPipeline.synthesize(Tables.load(s, dir, "documents"))
        media.groupBy($"media_type")
          .agg(
            count(lit(1)).as("n_samples"),
            sum(length($"content")).cast("long").as("total_bytes"),
            max(length($"content")).cast("long").as("max_bytes"),
            min(length($"content")).cast("long").as("min_bytes"))
      },
      Some("""
        SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
          COUNT(*) AS n_samples,
          CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
          CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
          CAST(MIN(octet_length(encode(text))) AS BIGINT) AS min_bytes
        FROM documents GROUP BY 1""")),

    GraftQuery(
      "m04_frame_sample",
      (s, dir) => {
        import s.implicits._
        // deterministic frame sampling over the binary payload (every
        // 4th 64-byte block) via the partition batch iterator — the
        // video-keyframe / audio-chunk subsampling pass. The oracle
        // reproduces the sampled-frame count from pure length
        // arithmetic and the first frame's hash from substring (ASCII
        // corpus: byte slices == char slices).
        val media = MediaPipeline.synthesize(Tables.load(s, dir, "documents"))
        media.as[graft.multimodal.MediaSample].mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { m =>
            val frames = MediaPipeline.frameSample(m.content, 4)
            md.reset()
            val fp = md.digest(frames.head).map("%02x".format(_)).mkString
            (m.doc_id, m.media_type, frames.size.toLong, fp)
          }
        }.toDF("doc_id", "media_type", "n_sampled_frames", "first_frame_md5")
      },
      Some("""
        SELECT doc_id,
          ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
          CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT)
            AS n_sampled_frames,
          md5(substring(text, 1, 64)) AS first_frame_md5
        FROM documents""")),

    GraftQuery(
      "m05_media_resize",
      (s, dir) => {
        import s.implicits._
        // the resize pass: stubbed 2x2-pooling (every 4th byte; dims
        // halve) in the partition batch iterator — swap resizeStub for a
        // real resampler and nothing else changes. The oracle recomputes
        // output dims from the header bytes and the resized payload's
        // md5 by strided character sampling (ASCII corpus: byte stride
        // == char stride).
        val media = MediaPipeline.synthesize(Tables.load(s, dir, "documents"))
        media.as[graft.multimodal.MediaSample].mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { m =>
            val (w, h, _) = MediaPipeline.decodeStub(m.media_type, m.content)
            val resized = MediaPipeline.resizeStub(m.content, 4)
            md.reset()
            val fp = md.digest(resized).map("%02x".format(_)).mkString
            (m.doc_id, w / 2, h / 2, resized.length.toLong, fp)
          }
        }.toDF("doc_id", "out_width", "out_height", "resized_bytes",
          "resized_md5")
      },
      Some("""
        SELECT doc_id,
          CAST((64 + (ascii(substr(text,1,1))*7 + ascii(substr(text,2,1))) % 1024) // 2
            AS INT) AS out_width,
          CAST((64 + (ascii(substr(text,3,1))*5 + ascii(substr(text,4,1))) % 768) // 2
            AS INT) AS out_height,
          CAST((octet_length(encode(text)) + 3) // 4 AS BIGINT) AS resized_bytes,
          md5(array_to_string(
            [substr(text, i+1, 1) for i in range(0, len(text), 4)], ''))
            AS resized_md5
        FROM documents""")),

    GraftQuery(
      "m06_image_roundtrip",
      (s, dir) => {
        import s.implicits._
        // REAL image codec end-to-end (javax.imageio — in the JDK, no new
        // dependency): each document's utf8 bytes become a 16-wide
        // grayscale image (zero-padded to fill the last row), PNG-encode
        // via ImageCodec, then DECODE the png back and report stats of
        // the DECODED pixels. PNG grayscale is lossless, so the oracle
        // reproduces width/height/pixel-sum from the text alone and
        // roundtrip_exact must be true for every row — if the codec path
        // (raster handling, color model, sample layout) were wrong in
        // any way, the decoded stats would diverge and the hash gate
        // would catch it. Pure map-side batch iteration, no shuffle.
        // Null texts are dropped (the TextKernels null contract); an
        // empty text still encodes as one zero row (height clamps to 1
        // in BOTH engines). sum_gray is a sum of UTF-8 BYTES — the
        // oracle's per-character ascii() spelling coincides because the
        // corpus is pure ASCII (the same documented assumption as
        // m01/m02's md5/byte oracles).
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text").filter($"text".isNotNull)
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              val bytes = text.getBytes("UTF-8")
              val w = 16
              val h = math.max(1, (bytes.length + w - 1) / w)
              val px = java.util.Arrays.copyOf(bytes, w * h)
              val png = graft.multimodal.ImageCodec.encodePng(w, h, px)
              val dec = graft.multimodal.ImageCodec.decode(png)
                .getOrElse(sys.error(s"m06: png decode failed for doc $id"))
              var sum = 0L
              dec.pixels.foreach(b => sum += (b & 0xff))
              (id, dec.width, dec.height, dec.pixels.length.toLong, sum,
                dec.width == w && dec.height == h &&
                  java.util.Arrays.equals(dec.pixels, px))
            }
          }
          .toDF("doc_id", "width", "height", "n_px", "sum_gray",
            "roundtrip_exact")
      },
      Some("""
        SELECT doc_id, 16 AS width,
          CAST(GREATEST((octet_length(encode(text)) + 15) // 16, 1) AS INT)
            AS height,
          CAST(16 * GREATEST((octet_length(encode(text)) + 15) // 16, 1)
            AS BIGINT) AS n_px,
          CAST(COALESCE(list_sum([ascii(substr(text, CAST(i+1 AS INT), 1))
                         for i in range(len(text))]), 0) AS BIGINT)
            AS sum_gray,
          true AS roundtrip_exact
        FROM documents WHERE text IS NOT NULL""")),

    GraftQuery(
      "m07_audio_roundtrip",
      (s, dir) => {
        import s.implicits._
        // REAL audio codec end-to-end (javax.sound.sampled — in the
        // JDK, no new dependency): each document's utf8 bytes become
        // 8-bit unsigned mono PCM samples at 8 kHz, WAV-encode via
        // AudioCodec, then DECODE the wav back and report stats of the
        // DECODED samples. PCM WAV is lossless, so the oracle
        // reproduces frame count and sample sum from the text alone
        // (pure-ASCII corpus: byte == char code) and roundtrip_exact
        // must be true for every row — a wrong header, sample layout,
        // or signedness in the codec path diverges the stats and the
        // hash gate catches it. Pure map-side batch iteration.
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text").filter($"text".isNotNull)
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              val bytes = text.getBytes("UTF-8")
              val samples = if (bytes.isEmpty) Array[Byte](0) else bytes
              val wav = graft.multimodal.AudioCodec
                .encodeWavPcm8(samples, 8000f)
              val dec = graft.multimodal.AudioCodec.decode(wav)
                .getOrElse(sys.error(s"m07: wav decode failed for doc $id"))
              var sum = 0L
              dec.samples.foreach(b => sum += (b & 0xff))
              (id, dec.frames, dec.channels, dec.sampleRate.toInt, sum,
                dec.frames == samples.length.toLong &&
                  java.util.Arrays.equals(dec.samples, samples))
            }
          }
          .toDF("doc_id", "n_frames", "channels", "sample_rate",
            "sum_samples", "roundtrip_exact")
      },
      Some("""
        SELECT doc_id,
          CAST(GREATEST(octet_length(encode(text)), 1) AS BIGINT)
            AS n_frames,
          1 AS channels, 8000 AS sample_rate,
          CAST(COALESCE(list_sum([ascii(substr(text, CAST(i+1 AS INT), 1))
                         for i in range(len(text))]), 0) AS BIGINT)
            AS sum_samples,
          true AS roundtrip_exact
        FROM documents WHERE text IS NOT NULL""")),

    GraftQuery(
      "m08_video_roundtrip",
      (s, dir) => {
        import s.implicits._
        // REAL video path — the round-7 resolution of the video
        // boundary: each document becomes a GVC1 container (the
        // MJPEG-style format VideoCodec defines: length-prefixed REAL
        // PNG frames, 8x8 grayscale, 64 source bytes per frame,
        // zero-padded tail), then every 4th frame is SAMPLED — skipped
        // frames are seeked over by their length prefix and never hit
        // the PNG decoder, the honest keyframe-extraction IO pattern.
        // Grayscale PNG is lossless, so the oracle reproduces the frame
        // counts and the sampled frames' decoded pixel sum from the
        // text alone (pure-ASCII corpus: byte == char code), and
        // roundtrip_exact must hold for every sampled frame. Pure
        // map-side batch iteration, no shuffle.
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text").filter($"text".isNotNull)
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              val bytes = text.getBytes("UTF-8")
              val fw = 8
              val perFrame = fw * fw
              val nf = math.max(1, (bytes.length + perFrame - 1) / perFrame)
              val pngs = (0 until nf).map { f =>
                val px = new Array[Byte](perFrame)
                val start = f * perFrame
                val n = math.min(perFrame, math.max(0, bytes.length - start))
                if (n > 0) System.arraycopy(bytes, start, px, 0, n)
                graft.multimodal.ImageCodec.encodePng(fw, fw, px)
              }
              val gvc = graft.multimodal.VideoCodec.encodeGvc(pngs)
              // bytes => frames via the pluggable registry: the GVC1
              // builtin claims this payload; an ffmpeg bridge would
              // claim foreign containers with NO change to this query
              val dec = graft.multimodal.FrameDecoders.forContent(gvc)
              val sampled = dec.sampleDecoded(gvc, stride = 4)
              var sum = 0L
              var exact = true
              sampled.zipWithIndex.foreach { case (fr, si) =>
                fr.pixels.foreach(b => sum += (b & 0xff))
                val start = si * 4 * perFrame
                val n = math.min(perFrame,
                  math.max(0, bytes.length - start))
                val src = new Array[Byte](perFrame)
                if (n > 0) System.arraycopy(bytes, start, src, 0, n)
                exact &&= fr.width == fw && fr.height == fw &&
                  java.util.Arrays.equals(fr.pixels, src)
              }
              (id, dec.frameCount(gvc).toLong,
                sampled.size.toLong, sum, exact)
            }
          }
          .toDF("doc_id", "n_frames", "n_sampled", "sum_sampled_gray",
            "roundtrip_exact")
      },
      Some("""
        SELECT doc_id,
          CAST(GREATEST((octet_length(encode(text)) + 63) // 64, 1)
            AS BIGINT) AS n_frames,
          CAST((GREATEST((octet_length(encode(text)) + 63) // 64, 1) + 3)
            // 4 AS BIGINT) AS n_sampled,
          CAST(COALESCE(list_sum(
            [ascii(substr(text, CAST(i+1 AS INT), 1))
             for i in range(len(text)) if (i // 64) % 4 = 0]), 0)
            AS BIGINT) AS sum_sampled_gray,
          true AS roundtrip_exact
        FROM documents WHERE text IS NOT NULL""")),

    GraftQuery(
      "m09_audio_frames",
      (s, dir) => {
        import s.implicits._
        // The decode -> frame -> feature pipeline over REAL WAV decode:
        // each doc's PCM (the m07 construction) is split into
        // 160-sample windows (20 ms at 8 kHz, the standard speech
        // frame) and reduced to integer window features — window count,
        // loudest-window sample sum, total energy (sum of squares).
        // All-integer features, so the byte-arithmetic oracle
        // reproduces them exactly from the text; a framing bug (off by
        // one at a window boundary, dropped tail window) diverges
        // max_window_sum. Pure map-side.
        val frame = 160
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text").filter($"text".isNotNull)
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              val bytes = text.getBytes("UTF-8")
              val samples = if (bytes.isEmpty) Array[Byte](0) else bytes
              val wav = graft.multimodal.AudioCodec
                .encodeWavPcm8(samples, 8000f)
              val dec = graft.multimodal.AudioCodec.decode(wav)
                .getOrElse(sys.error(s"m09: wav decode failed for doc $id"))
              var i = 0; var cur = 0L; var maxw = 0L; var sq = 0L
              var nw = 0
              while (i < dec.samples.length) {
                val v = (dec.samples(i) & 0xff).toLong
                cur += v; sq += v * v
                i += 1
                if (i % frame == 0 || i == dec.samples.length) {
                  if (cur > maxw) maxw = cur
                  cur = 0L; nw += 1
                }
              }
              (id, dec.samples.length.toLong, nw.toLong, maxw, sq)
            }
          }
          .toDF("doc_id", "n_samples", "n_windows", "max_window_sum",
            "sum_sq")
      },
      // like m07, the oracle assumes the pure-ASCII corpus (byte ==
      // char code), and spells EVERY measure over the same char-indexed
      // codes list — mixing octet_length with char indexing would make
      // the oracle internally inconsistent on non-ASCII text
      Some("""
        SELECT doc_id,
          CAST(GREATEST(len(text), 1) AS BIGINT) AS n_samples,
          CAST((GREATEST(len(text), 1) + 159) // 160
            AS BIGINT) AS n_windows,
          CAST(COALESCE(list_max(
            [list_sum(codes[w*160+1 : (w+1)*160])
             for w in range((GREATEST(len(text), 1) + 159) // 160)]), 0)
            AS BIGINT) AS max_window_sum,
          CAST(COALESCE(list_sum([c * c for c in codes]), 0) AS BIGINT)
            AS sum_sq
        FROM (
          SELECT doc_id, text,
            [ascii(substr(text, CAST(i+1 AS INT), 1))
             for i in range(len(text))] AS codes
          FROM documents WHERE text IS NOT NULL)""")),

    // -------------------------------- REAL pixel-space resize (m10)
    GraftQuery(
      "m10_image_resize_real",
      (s, dir) => {
        import s.implicits._
        // The REAL resize path (m05's resizeStub keeps raw bytes; this
        // resamples PIXELS): each document becomes the m08-style 8x8
        // gray PNG (first 64 text bytes, zero-padded), decodes through
        // the JDK codec, average-pools 2x2 -> 4x4 with exact integer
        // rounded means (ImageCodec.resizePooled — deterministic on any
        // JVM, unlike Graphics2D resamplers), re-encodes, and re-decodes
        // to prove the resized raster survives a codec round trip.
        // Gray PNG is lossless and the corpus is pure ASCII, so the
        // oracle reproduces every pooled pixel from the text bytes:
        // out(r,c) = (p[16r+2c] + p[16r+2c+1] + p[16r+8+2c] +
        // p[16r+8+2c+1] + 2) // 4. Pure map-side batch iteration.
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text").filter($"text".isNotNull)
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              val bytes = text.getBytes("UTF-8")
              val px = new Array[Byte](64)
              System.arraycopy(bytes, 0, px, 0, math.min(64, bytes.length))
              val png = graft.multimodal.ImageCodec.encodePng(8, 8, px)
              val dec = graft.multimodal.ImageCodec.decode(png).get
              val small = graft.multimodal.ImageCodec.resizePooled(dec, 2)
              val png2 = graft.multimodal.ImageCodec
                .encodePng(small.width, small.height, small.pixels)
              val dec2 = graft.multimodal.ImageCodec.decode(png2).get
              var sum = 0L
              dec2.pixels.foreach(b => sum += (b & 0xff))
              val exact = dec2.width == 4 && dec2.height == 4 &&
                java.util.Arrays.equals(dec2.pixels, small.pixels)
              (id, dec2.width, dec2.height, sum, exact)
            }
          }
          .toDF("doc_id", "out_w", "out_h", "sum_resized", "roundtrip_exact")
      },
      Some("""
        WITH px AS (
          SELECT doc_id,
            [CASE WHEN i < octet_length(encode(text))
               THEN ascii(substr(text, CAST(i+1 AS INT), 1)) ELSE 0 END
             for i in range(64)] AS p
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, 4 AS out_w, 4 AS out_h,
          CAST(list_sum(
            [(p[16*(i//4)+2*(i%4)+1] + p[16*(i//4)+2*(i%4)+2] +
              p[16*(i//4)+2*(i%4)+9] + p[16*(i//4)+2*(i%4)+10] + 2) // 4
             for i in range(16)]) AS BIGINT) AS sum_resized,
          true AS roundtrip_exact
        FROM px""")),

    // ------------------------------ REAL audio downsample (m11)
    GraftQuery(
      "m11_audio_downsample",
      (s, dir) => {
        import s.implicits._
        // Real sample-rate reduction through the real codec: each doc's
        // 8 kHz PCM (the m07 construction) decimates by 2 with a 2-tap
        // mean (AudioCodec.downsample2 — exact integer rounding, an odd
        // trailing sample passes through), re-encodes as a 4 kHz WAV,
        // and decodes back; PCM WAV is lossless, so the oracle
        // reproduces the decimated sample sum from the text bytes and
        // roundtrip_exact must hold everywhere. Pure map-side.
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text").filter($"text".isNotNull)
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, text) =>
              val bytes = text.getBytes("UTF-8")
              val samples = if (bytes.isEmpty) Array[Byte](0) else bytes
              val down = graft.multimodal.AudioCodec.downsample2(samples)
              val wav = graft.multimodal.AudioCodec
                .encodeWavPcm8(down, 4000f)
              val dec = graft.multimodal.AudioCodec.decode(wav)
                .getOrElse(sys.error(s"m11: wav decode failed for doc $id"))
              var sum = 0L
              dec.samples.foreach(b => sum += (b & 0xff))
              (id, samples.length.toLong, dec.frames,
                dec.sampleRate.toInt, sum,
                dec.frames == ((samples.length + 1) / 2).toLong &&
                  java.util.Arrays.equals(dec.samples, down))
            }
          }
          .toDF("doc_id", "in_frames", "out_frames", "out_rate",
            "sum_down", "roundtrip_exact")
      },
      Some("""
        WITH c AS (
          SELECT doc_id,
            CASE WHEN len(text) = 0 THEN [0]
              ELSE [ascii(substr(text, CAST(i+1 AS INT), 1))
                    for i in range(len(text))] END AS codes
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id,
          CAST(len(codes) AS BIGINT) AS in_frames,
          CAST((len(codes) + 1) // 2 AS BIGINT) AS out_frames,
          4000 AS out_rate,
          CAST(COALESCE(list_sum(
              [(codes[2*i+1] + codes[2*i+2] + 1) // 2
               for i in range(len(codes) // 2)]), 0)
            + CASE WHEN len(codes) % 2 = 1
                THEN codes[len(codes)] ELSE 0 END AS BIGINT) AS sum_down,
          true AS roundtrip_exact
        FROM c"""))
  )
}
