package graft.bridge

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.core.{RiverField, RiverSchema, RiverType, StreamStore}
import org.scalatest.funsuite.AnyFunSuite

/** MAT-file v5 codec + river bridge (B2). The writer's byte layout is
  * pinned against the published MathWorks format doc (header fields,
  * element tags, class codes, column-major order); the reader is also
  * exercised on MATLAB-style variants the writer never produces (small
  * data elements, zlib-compressed outer elements, narrowed storage)
  * built by hand to the same spec.
  */
class MatBridgeSpec extends AnyFunSuite {

  private def tmp(suffix: String) =
    Files.createTempFile("graft-mat-", suffix)

  test("writer round-trips every supported dtype with dims intact") {
    val vars = Seq(
      MatFile.MatVar("d", 3, 1, MatFile.Doubles(Array(1.5, -2.25, 3.0))),
      MatFile.MatVar("s", 2, 2,
        MatFile.Singles(Array(1f, 2f, 3f, 4f))),
      MatFile.MatVar("i16", 4, 1,
        MatFile.Int16s(Array[Short](-5, 0, 5, 32767))),
      MatFile.MatVar("i32", 1, 3, MatFile.Int32s(Array(7, -8, 9))),
      MatFile.MatVar("i64", 2, 1,
        MatFile.Int64s(Array(Long.MaxValue, Long.MinValue))))
    val p = tmp(".mat")
    MatFile.write(p, vars)
    val back = MatFile.read(p)
    assert(back.map(_.name) == Seq("d", "s", "i16", "i32", "i64"))
    back.zip(vars).foreach { case (b, v) =>
      assert(b.rows == v.rows && b.cols == v.cols, v.name)
      assert(b.data == v.data || ((b.data, v.data) match {
        case (MatFile.Doubles(x), MatFile.Doubles(y)) => x.sameElements(y)
        case (MatFile.Singles(x), MatFile.Singles(y)) => x.sameElements(y)
        case (MatFile.Int16s(x), MatFile.Int16s(y)) => x.sameElements(y)
        case (MatFile.Int32s(x), MatFile.Int32s(y)) => x.sameElements(y)
        case (MatFile.Int64s(x), MatFile.Int64s(y)) => x.sameElements(y)
        case _ => false
      }), v.name)
    }
  }

  test("byte layout matches the published Level 5 format") {
    // a 2 x 3 double named "ab": golden positions from the spec —
    // 128-byte header, then tag(miMATRIX=14, size), flags(miUINT32=6,
    // 8, class=6), dims(miINT32=5, 8, 2, 3), name(miINT8=1, 2,
    // 'a''b' + 6 pad), data(miDOUBLE=9, 48, column-major values)
    val v = MatFile.MatVar("ab", 2, 3,
      MatFile.Doubles(Array(11, 21, 12, 22, 13, 23))) // col-major
    val p = tmp(".mat")
    MatFile.write(p, Seq(v))
    val bytes = Files.readAllBytes(p)
    assert(new String(bytes, 0, 19, "US-ASCII") == "MATLAB 5.0 MAT-file")
    assert(bytes(124) == 0x00 && bytes(125) == 0x01, "version 0x0100 LE")
    assert(bytes(126) == 'I'.toByte && bytes(127) == 'M'.toByte)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(128)
    assert(bb.getInt() == 14, "miMATRIX tag")
    assert(bb.getInt() == bytes.length - 136, "element size spans the rest")
    assert(bb.getInt() == 6 && bb.getInt() == 8, "flags subelement tag")
    assert((bb.getInt() & 0xff) == 6, "mxDOUBLE class"); bb.getInt()
    assert(bb.getInt() == 5 && bb.getInt() == 8, "dims subelement tag")
    assert(bb.getInt() == 2 && bb.getInt() == 3, "dims 2 x 3")
    assert(bb.getInt() == 1 && bb.getInt() == 2, "name subelement tag")
    assert(bb.get() == 'a'.toByte && bb.get() == 'b'.toByte)
    bb.position(bb.position() + 6) // name pad to 8
    assert(bb.getInt() == 9 && bb.getInt() == 48, "miDOUBLE data tag")
    // column-major: first stored value is (row 1, col 1), second is
    // (row 2, col 1)
    assert(bb.getDouble() == 11.0 && bb.getDouble() == 21.0)
  }

  test("reader handles MATLAB-style small elements, compressed outer " +
      "elements, and narrowed storage") {
    // Hand-build what MATLAB's save() typically emits for
    // x = [1 2 3] (double): SMALL name element, miUINT8-narrowed
    // payload, wrapped in a zlib miCOMPRESSED element.
    val inner = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    inner.putInt(6).putInt(8).putInt(6).putInt(0) // flags: mxDOUBLE
    inner.putInt(5).putInt(8).putInt(1).putInt(3) // dims 1 x 3
    inner.putInt((1 << 16) | 1) // small name: type miINT8, 1 byte
    inner.put('x'.toByte).put(new Array[Byte](3))
    inner.putInt((3 << 16) | 2) // small data: type miUINT8, 3 bytes
    inner.put(1.toByte).put(2.toByte).put(3.toByte).put(0.toByte)
    val innerBytes = java.util.Arrays.copyOf(inner.array(), inner.position())
    val matrix = ByteBuffer.allocate(innerBytes.length + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    matrix.putInt(14).putInt(innerBytes.length).put(innerBytes)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(matrix.array()); deflater.finish()
    val packed = new Array[Byte](256)
    val packedLen = deflater.deflate(packed)
    deflater.end()
    // real writers do NOT pad compressed elements to 8 bytes; follow an
    // odd-length compressed element immediately with a plain matrix to
    // prove the cursor lands exactly past it
    val out = ByteBuffer.allocate(128 + 8 + packedLen + 96)
      .order(ByteOrder.LITTLE_ENDIAN)
    val head = new Array[Byte](116)
    java.util.Arrays.fill(head, ' '.toByte)
    "MATLAB 5.0 MAT-file".getBytes("US-ASCII").copyToArray(head)
    out.put(head).put(new Array[Byte](8))
    out.put(0x00.toByte).put(0x01.toByte)
    out.put('I'.toByte).put('M'.toByte)
    out.putInt(15).putInt(packedLen).put(packed, 0, packedLen)
    out.putInt(14).putInt(48) // uncompressed int32 "y" = [7], unpadded gap
    out.putInt(6).putInt(8).putInt(12).putInt(0) // flags: mxINT32
    out.putInt(5).putInt(8).putInt(1).putInt(1) // dims 1 x 1
    out.putInt((1 << 16) | 1) // small name 'y'
    out.put('y'.toByte).put(new Array[Byte](3))
    out.putInt((4 << 16) | 5) // small data: miINT32, 4 bytes
    out.putInt(7)
    val p = tmp(".mat")
    Files.write(p, java.util.Arrays.copyOf(out.array(), out.position()))
    val Seq(v, y) = MatFile.read(p)
    assert(v.name == "x" && v.rows == 1 && v.cols == 3)
    // miUINT8 storage under an mxDOUBLE class widens back to doubles
    val MatFile.Doubles(a) = v.data: @unchecked
    assert(a.sameElements(Array(1.0, 2.0, 3.0)))
    assert(y.name == "y")
    val MatFile.Int32s(yv) = y.data: @unchecked
    assert(yv.sameElements(Array(7)))
  }

  test("unsupported classes and big-endian files are rejected by name") {
    val p = tmp(".mat")
    // a cell-class matrix element
    val out = ByteBuffer.allocate(160).order(ByteOrder.LITTLE_ENDIAN)
    val head = new Array[Byte](116)
    java.util.Arrays.fill(head, ' '.toByte)
    out.put(head).put(new Array[Byte](8))
    out.put(0x00.toByte).put(0x01.toByte)
    out.put('I'.toByte).put('M'.toByte)
    out.putInt(14).putInt(16)
    out.putInt(6).putInt(8).putInt(1).putInt(0) // flags: cell class
    Files.write(p, java.util.Arrays.copyOf(out.array(), out.position()))
    val e = intercept[IllegalArgumentException](MatFile.read(p))
    assert(e.getMessage.contains("cell"))
    // big-endian indicator
    val be = Files.readAllBytes(p)
    be(126) = 'M'.toByte; be(127) = 'I'.toByte
    Files.write(p, be)
    val e2 = intercept[IllegalArgumentException](MatFile.read(p))
    assert(e2.getMessage.contains("big-endian"))
  }

  test("corrupt size fields fail loudly before any large allocation") {
    // a valid single-variable file, then corrupt the element size field
    // to claim far more bytes than the file holds
    val p = tmp(".mat")
    MatFile.write(p, Seq(MatFile.MatVar("v", 2, 1,
      MatFile.Doubles(Array(1.0, 2.0)))))
    val good = Files.readAllBytes(p)
    val bad = good.clone()
    val bb = ByteBuffer.wrap(bad).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(132, Int.MaxValue - 7) // miMATRIX size field
    Files.write(p, bad)
    val e = intercept[IllegalArgumentException](MatFile.read(p))
    assert(e.getMessage.contains("left"), e.getMessage)
    // corrupt DIMENSIONS: huge rows x cols must be rejected before the
    // value-array allocation
    val bad2 = good.clone()
    val b2 = ByteBuffer.wrap(bad2).order(ByteOrder.LITTLE_ENDIAN)
    // dims payload sits after: 128 header + 8 matrix tag + 16 flags + 8 dims tag
    b2.putInt(160, Int.MaxValue); b2.putInt(164, Int.MaxValue)
    Files.write(p, bad2)
    val e2 = intercept[IllegalArgumentException](MatFile.read(p))
    assert(e2.getMessage.contains("dimensions") ||
      e2.getMessage.contains("payload"), e2.getMessage)
  }

  test("a zlib bomb in a compressed element is refused, not inflated") {
    // ~4 GiB of zeros deflates to ~4 MB; the reader must stop at its
    // 1 GiB inflation cap instead of materializing the bomb
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_SPEED)
    val chunk = new Array[Byte](1 << 20)
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(out, deflater, 1 << 16)
    var written = 0L
    while (written < (4L << 30)) { dos.write(chunk); written += chunk.length }
    dos.finish()
    val packed = out.toByteArray
    val f = ByteBuffer.allocate(128 + 8 + packed.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    val head = new Array[Byte](116)
    java.util.Arrays.fill(head, ' '.toByte)
    f.put(head).put(new Array[Byte](8))
    f.put(0x00.toByte).put(0x01.toByte)
    f.put('I'.toByte).put('M'.toByte)
    f.putInt(15).putInt(packed.length).put(packed)
    val p = tmp(".mat")
    Files.write(p, f.array())
    val e = intercept[IllegalArgumentException](MatFile.read(p))
    assert(e.getMessage.contains("zip-bomb"), e.getMessage)
  }

  test("sanitizeName yields valid, deduped MATLAB identifiers") {
    assert(MatBridge.sanitizeName("col") == "col")
    assert(MatBridge.sanitizeName("2col") == "x2col")
    assert(MatBridge.sanitizeName("a-b c") == "a_b_c")
    assert(MatBridge.sanitizeName("") == "x")
    assert(MatBridge.sanitizeName("col", Set("col")) == "col_2")
    assert(MatBridge.sanitizeName("col", Set("col", "col_2")) == "col_3")
    assert(MatBridge.sanitizeName("a" * 100).length == 63)
  }

  test("stream -> .mat -> stream round trip preserves values and types") {
    val store = new StreamStore(Files.createTempDirectory("graft-matb-"))
    val schema = RiverSchema(Seq(
      RiverField("volts", RiverType.Double64),
      RiverField("ch", RiverType.Int32),
      RiverField("gain", RiverType.Float32)))
    val w = store.createStream("sensor", schema)
    val rows = (0 until 300).map(i =>
      Seq[Any](i * 0.5, i % 7, (i * 0.25).toFloat))
    w.write(rows)
    w.stop()
    val p = tmp(".mat")
    assert(MatBridge.exportStream(store, "sensor", p) == 300L)
    val vars = MatFile.read(p)
    assert(vars.map(_.name) == Seq("sample_idx", "volts", "ch", "gain"))
    val MatFile.Int64s(idx) = vars(0).data: @unchecked
    assert(idx.sameElements(Array.tabulate(300)(_.toLong)))
    val MatFile.Doubles(volts) = vars(1).data: @unchecked
    assert(volts(7) == 3.5)
    // back into a fresh stream: sample_idx is skipped, fields rebuild
    assert(MatBridge.importStream(store, "sensor2", p) == 300L)
    assert(store.metadata("sensor2").schema == schema)
    val back = store.openReader("sensor2").read(1000, 0).get
    assert(back.size == 300)
    assert(back.map(_._3) == rows)
  }

  test("an N x C .mat matrix imports as C suffixed fields") {
    val p = tmp(".mat")
    MatFile.write(p, Seq(MatFile.MatVar("emg", 4, 2,
      MatFile.Doubles(Array(1, 2, 3, 4, 10, 20, 30, 40))))) // col-major
    val store = new StreamStore(Files.createTempDirectory("graft-matc-"))
    assert(MatBridge.importStream(store, "emg", p) == 4L)
    assert(store.metadata("emg").schema.fields.map(_.name) ==
      Seq("emg_1", "emg_2"))
    val rows = store.openReader("emg").read(10, 0).get
    assert(rows.map(_._3) == Seq(Seq(1.0, 10.0), Seq(2.0, 20.0),
      Seq(3.0, 30.0), Seq(4.0, 40.0)))
  }

  test("DataFrame export writes numeric columns and reports skips") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("mat-bridge")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      import spark.implicits._
      val df = Seq((1L, 0.5, "skipme", 2.5f), (2L, 1.5, "x", 3.5f))
        .toDF("id", "score", "label", "gain")
      val p = tmp(".mat")
      val (exported, skipped) = MatBridge.exportDataFrame(df, p, 100)
      assert(exported == Seq("id", "score", "gain"))
      assert(skipped == Seq("label"))
      val vars = MatFile.read(p)
      val MatFile.Int64s(ids) = vars(0).data: @unchecked
      assert(ids.sameElements(Array(1L, 2L)))
      val MatFile.Doubles(scores) = vars(1).data: @unchecked
      assert(scores.sameElements(Array(0.5, 1.5)))
    } finally spark.stop()
  }
}
