package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-2 ingest-layer additions: the staleness EOF
  * finalizer (I8), compression metadata detection (C1), metadata parity
  * fields (M4), and the HTTP façade (H1).
  */
class IngestFeaturesSpec extends AnyFunSuite {

  private def newStore() =
    new StreamStore(Files.createTempDirectory("graft-ingest-spec-"))

  private val schema = RiverSchema(Seq(RiverField("v", RiverType.Double64)))

  test("forceEof completes a stream whose writer never stopped (I8)") {
    val store = newStore()
    val w = store.createStream("s", schema)
    w.write(Seq(Seq(1.0), Seq(2.0)))
    // writer dies without stop(): no EOF yet
    assert(store.forceEof("s"))
    val r = store.openReader("s")
    val rows = r.read(10, 0).get
    assert(rows.map(_._2) == Seq(0L, 1L))
    assert(r.read(10, 0).isEmpty) // EOF consumed
    assert(!store.forceEof("s")) // idempotent: already has EOF
  }

  test("ZFP_LOSSLESS streams write compressed and read back exactly (C1)") {
    val store = newStore()
    val w = store.createStream("c", schema,
      compressionParamsJson = Some(
        """{"name":"ZFP_LOSSLESS","params":{"num_cols":"1","data_type":"double"}}"""))
    // integer-valued doubles (sensor-style quantized data, like the
    // reference's int16-scaled sine fixture): block-floating-point
    // conversion is exact and trailing-zero elision bites
    val values = (0 until 257).map(i => math.rint(math.sin(i / 10.0) * 1000.0))
    w.write(values.map(v => Seq[Any](v)))   // one compressed batch entry
    w.write(Seq(Seq[Any](42.0)))            // and a second batch
    w.stop()
    val r = store.openReader("c")
    val rows = r.read(1000, 0).get
    assert(rows.size == 258)
    assert(rows.map(_._2) == (0L until 258L)) // gapless sample_index
    assert(rows.map(_._3(0).asInstanceOf[Double]) == values :+ 42.0)
    // the segment really does hold compressed blobs, not per-row frames
    val segBytes = store.segmentFile("c", 0).length()
    assert(segBytes < 258 * 8, s"segment $segBytes bytes for 258 doubles")
  }

  test("ZFP_LOSSY streams round-trip within tolerance (C1 lossy)") {
    // fixed-accuracy transport: tolerance 0.5 on a double stream; the
    // read-back values must sit within this codec's documented bound
    // (4 * tolerance; see Zfp scaladoc) and the segment must be smaller
    // than raw. Missing tolerance and unknown codecs still reject loudly.
    val store = newStore()
    val lossy =
      """{"name":"ZFP_LOSSY","params":{"num_cols":"1","data_type":"double","tolerance":"0.5"}}"""
    val w = store.createStream("c", schema,
      compressionParamsJson = Some(lossy))
    val values = (0 until 257).map(i => math.sin(i / 10.0) * 1000.0)
    w.write(values.map(v => Seq[Any](v)))
    w.stop()
    val r = store.openReader("c")
    val rows = r.read(1000, 0).get
    assert(rows.size == 257)
    assert(rows.map(_._2) == (0L until 257L))
    val back = rows.map(_._3(0).asInstanceOf[Double])
    val maxErr = values.indices.map(i => math.abs(back(i) - values(i))).max
    assert(maxErr <= 2.0, s"max err $maxErr > 4 * tolerance")
    assert(store.segmentFile("c", 0).length() < 257 * 8)

    intercept[IllegalArgumentException] {
      store.createStream("c3", schema, compressionParamsJson = Some(
        """{"name":"ZFP_LOSSY","params":{"num_cols":"1","data_type":"double"}}"""))
    }
    val e = intercept[IllegalArgumentException] {
      store.createStream("c4", schema, compressionParamsJson = Some(
        """{"name":"DUMMY","params":{}}"""))
    }
    assert(e.getMessage.contains("DUMMY"))
  }

  test("""ZFP_LOSSY "layout": "std" writes the standard libzfp accuracy """ +
      "bit layout end-to-end") {
    // the opt-in standard layout: segments carry unmarked accuracy
    // blobs (what a genuine libzfp writer produces), read back through
    // the auto-detecting decode within zfp's |err| <= tolerance bound
    val store = newStore()
    val params =
      """{"name":"ZFP_LOSSY","params":{"num_cols":"1",""" +
        """"data_type":"double","tolerance":"0.5","layout":"std"}}"""
    val w = store.createStream("cs", schema,
      compressionParamsJson = Some(params))
    val values = (0 until 257).map(i => math.cos(i / 7.0) * 1000.0)
    w.write(values.map(v => Seq[Any](v)))
    w.stop()
    val r = store.openReader("cs")
    val rows = r.read(1000, 0).get
    assert(rows.size == 257)
    val back = rows.map(_._3(0).asInstanceOf[Double])
    val maxErr = values.indices.map(i => math.abs(back(i) - values(i))).max
    assert(maxErr <= 0.5, s"std layout max err $maxErr > tolerance")
    assert(store.segmentFile("cs", 0).length() < 257 * 8)
  }

  test("variable-width streams refuse compression (writer.cpp:131-134)") {
    val store = newStore()
    val vw = RiverSchema(Seq(
      RiverField("b", RiverType.VariableWidthBytes(16))))
    intercept[IllegalArgumentException] {
      store.createStream("vw", vw,
        compressionParamsJson = Some("""{"type":"ZFP_LOSSLESS"}"""))
    }
  }

  test("metadata round-trips clock delta and compression params (M4)") {
    val m = StreamMetadata(schema.toJson, 123456789L, Map("a" -> "b"),
      localMinusServerClockUs = Some(-42L),
      compressionParamsJson = Some("""{"tolerance":0.5}"""))
    val back = StreamMetadata.fromJson(m.toJson)
    assert(back.localMinusServerClockUs.contains(-42L))
    assert(back.compressionParamsJson.contains("""{"tolerance":0.5}"""))
    assert(back.userMetadata == Map("a" -> "b"))
    assert(back.initializedAtUs == 123456789L)
  }

  test("reader recovers every complete frame from a torn segment tail") {
    // simulate a writer crash mid-frame: truncate the segment to a
    // point inside the last frame; readers must return all complete
    // frames and stop cleanly at the torn tail (no misparse, no hang).
    val store = newStore()
    val w = store.createStream("torn", schema)
    w.write((0 until 100).map(i => Seq[Any](i.toDouble)))
    // no stop(): simulate crash, then tear the tail
    val seg = store.segmentFile("torn", store.segments("torn").head)
    val raf = new java.io.RandomAccessFile(seg, "rw")
    try raf.setLength(raf.length() - 5) finally raf.close()
    store.forceEof("torn") // staleness finalizer path appends EOF after
    val r = store.openReader("torn")
    val rows = r.read(1000, 0).get
    assert(rows.size == 99) // last frame torn away, rest intact
    assert(rows.map(_._2) == (0L until 99L))
    assert(r.read(1000, 0).isEmpty) // EOF consumed
  }

  test("http facade serves stream list, metadata, and parquet (H1)") {
    val out = Files.createTempDirectory("graft-http-spec-")
    val sdir = out.resolve("ev")
    Files.createDirectories(sdir)
    Files.writeString(sdir.resolve("metadata.json"),
      """{"stream_name":"ev","ingestion_status":"COMPLETED"}""")
    val payload = Array.tabulate[Byte](100000)(i => (i % 251).toByte)
    Files.write(sdir.resolve("data.parquet"), payload)

    val srv = new IngesterHttpServer(out, port = 0)
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}/api/streams"
      val client = HttpClient.newHttpClient()
      def get(u: String) = client.send(
        HttpRequest.newBuilder(URI.create(u)).build(),
        HttpResponse.BodyHandlers.ofByteArray())

      val list = get(base)
      assert(list.statusCode() == 200)
      assert(new String(list.body()).contains("\"ev\""))

      val one = get(s"$base/ev")
      assert(new String(one.body()).contains("COMPLETED"))

      val data = get(s"$base/ev/data.parquet")
      assert(data.statusCode() == 200)
      assert(data.body().toSeq == payload.toSeq)

      assert(get(s"$base/nope").statusCode() == 404)

      // traversal attempts must 404, never read outside the root: plant
      // a decoy next to the out dir that a naive resolve would serve
      val decoyDir = out.getParent.resolve(
        out.getFileName.toString + "-decoy")
      Files.createDirectories(decoyDir)
      Files.writeString(decoyDir.resolve("metadata.json"),
        """{"secret":"leak"}""")
      Files.write(decoyDir.resolve("data.parquet"), Array[Byte](9, 9))
      val decoy = decoyDir.getFileName.toString
      for (evil <- Seq(
          s"$base/..%2F$decoy",
          s"$base/%2e%2e%2F$decoy",
          s"$base/..%2F$decoy/data.parquet",
          s"$base/%2e%2e/$decoy/data.parquet")) {
        val r = get(evil)
        assert(r.statusCode() == 404 || r.statusCode() == 400,
          s"$evil -> ${r.statusCode()}")
        assert(!new String(r.body()).contains("leak"),
          s"$evil leaked outside the root")
      }
    } finally srv.stop()
  }
}
