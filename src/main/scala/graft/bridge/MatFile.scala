package graft.bridge

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}

/** MATLAB Level 5 MAT-file codec, pure JVM, from the published MathWorks
  * "MAT-File Format" document (the reference's MATLAB surface, B2:
  * `matlab/StreamReader.m` / `StreamWriter.m` / `StreamSchema.m`, is a
  * MEX wrapper that needs a MATLAB install and a live server; this
  * bridge re-expresses the same user story — river data in and out of
  * MATLAB — as the interchange FILE format `load`/`save` handle
  * natively, which is the Spark-friendly boundary: export runs on the
  * driver or any executor with plain file IO, no MEX, no process).
  *
  * Supported subset:
  *  - WRITE: little-endian, uncompressed, 2-D real numeric matrices of
  *    double / single / int16 / int32 / int64, column-major, normal
  *    (never "small") data elements. MATLAB >= 5 and scipy.io.loadmat
  *    both read this layout.
  *  - READ: everything the writer produces, PLUS what MATLAB's `save`
  *    typically emits around it: small data elements (the 4-byte packed
  *    form MATLAB uses for flags/names) and zlib-`miCOMPRESSED` outer
  *    elements (MATLAB's default since R14; inflated with
  *    java.util.zip). uint16/uint8/int8/uint32 payloads widen to the
  *    nearest supported signed type on read. Unsupported classes (cell,
  *    struct, char, sparse, complex) are rejected loudly by name.
  */
object MatFile {

  sealed trait MatData { def length: Int }
  final case class Doubles(a: Array[Double]) extends MatData { def length: Int = a.length }
  final case class Singles(a: Array[Float]) extends MatData { def length: Int = a.length }
  final case class Int16s(a: Array[Short]) extends MatData { def length: Int = a.length }
  final case class Int32s(a: Array[Int]) extends MatData { def length: Int = a.length }
  final case class Int64s(a: Array[Long]) extends MatData { def length: Int = a.length }

  /** One named 2-D matrix; `data` is column-major, rows*cols long. */
  final case class MatVar(name: String, rows: Int, cols: Int, data: MatData) {
    require(rows.toLong * cols == data.length,
      s"mat var $name: $rows x $cols != ${data.length} values")
  }

  // MAT-file data type tags (spec table 1-1)
  private val MiInt8 = 1
  private val MiUInt8 = 2
  private val MiInt16 = 3
  private val MiUInt16 = 4
  private val MiInt32 = 5
  private val MiUInt32 = 6
  private val MiSingle = 7
  private val MiDouble = 9
  private val MiInt64 = 12
  private val MiUInt64 = 13
  private val MiMatrix = 14
  private val MiCompressed = 15

  // mxArray class tags (spec table 1-3)
  private val MxDouble = 6
  private val MxSingle = 7
  private val MxInt8 = 8
  private val MxUInt8 = 9
  private val MxInt16 = 10
  private val MxUInt16 = 11
  private val MxInt32 = 12
  private val MxUInt32 = 13
  private val MxInt64 = 14
  private val MxUInt64 = 15

  private def classOf2(d: MatData): Int = d match {
    case _: Doubles => MxDouble
    case _: Singles => MxSingle
    case _: Int16s => MxInt16
    case _: Int32s => MxInt32
    case _: Int64s => MxInt64
  }

  private def miTypeOf(d: MatData): Int = d match {
    case _: Doubles => MiDouble
    case _: Singles => MiSingle
    case _: Int16s => MiInt16
    case _: Int32s => MiInt32
    case _: Int64s => MiInt64
  }

  private def widthOf(d: MatData): Int = d match {
    case _: Doubles => 8
    case _: Singles => 4
    case _: Int16s => 2
    case _: Int32s => 4
    case _: Int64s => 8
  }

  private def pad8(n: Int): Int = (8 - (n & 7)) & 7

  // ------------------------------------------------------------ writer

  /** Write `vars` to `path` as an uncompressed little-endian Level 5
    * MAT-file. Variable names must already be valid MATLAB identifiers
    * (see [[MatBridge.sanitizeName]]). */
  def write(path: Path, vars: Seq[MatVar]): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(path.toFile)))
    try {
      // 128-byte header: 116 text bytes, 8 subsys bytes (zeros = none),
      // version 0x0100, endian indicator "IM" (little-endian layout)
      val text = ("MATLAB 5.0 MAT-file, Platform: JVM, " +
        "Created by: graft river bridge").getBytes("US-ASCII")
      val head = new Array[Byte](116)
      java.util.Arrays.fill(head, ' '.toByte)
      System.arraycopy(text, 0, head, 0, math.min(text.length, 116))
      out.write(head)
      out.write(new Array[Byte](8)) // no subsystem-specific data
      out.write(Array[Byte](0x00, 0x01)) // version 0x0100, LE
      out.write(Array[Byte]('I'.toByte, 'M'.toByte))
      vars.foreach(v => writeMatrix(out, v))
    } finally out.close()
  }

  private def le4(v: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(v); b.array()
  }

  private def writeMatrix(out: DataOutputStream, v: MatVar): Unit = {
    val nameBytes = v.name.getBytes("US-ASCII")
    val dataBytesL = v.data.length.toLong * widthOf(v.data)
    // the miMATRIX element size field is uint32; fail loudly rather
    // than wrap into a silently corrupt file near the 2 GiB boundary
    val totalL = (8L + 8) + (8 + 8) +
      (8 + nameBytes.length + pad8(nameBytes.length)) +
      (8 + dataBytesL + pad8((dataBytesL & 7).toInt))
    require(totalL <= Int.MaxValue,
      s"mat: variable '${v.name}' needs $dataBytesL payload bytes; the " +
        "Level 5 element size field caps a variable near 2 GiB — export " +
        "fewer rows (maxRows) or split columns across files")
    val dataBytes = dataBytesL.toInt
    val total = totalL.toInt
    out.write(le4(MiMatrix)); out.write(le4(total))
    // array flags: u32 (class | flags byte << 8), u32 reserved
    out.write(le4(MiUInt32)); out.write(le4(8))
    out.write(le4(classOf2(v.data))); out.write(le4(0))
    // dimensions
    out.write(le4(MiInt32)); out.write(le4(8))
    out.write(le4(v.rows)); out.write(le4(v.cols))
    // name
    out.write(le4(MiInt8)); out.write(le4(nameBytes.length))
    out.write(nameBytes); out.write(new Array[Byte](pad8(nameBytes.length)))
    // real part, column-major as handed in
    out.write(le4(miTypeOf(v.data))); out.write(le4(dataBytes))
    val bb = ByteBuffer.allocate(dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    v.data match {
      case Doubles(a) => bb.asDoubleBuffer().put(a)
      case Singles(a) => bb.asFloatBuffer().put(a)
      case Int16s(a) => bb.asShortBuffer().put(a)
      case Int32s(a) => bb.asIntBuffer().put(a)
      case Int64s(a) => bb.asLongBuffer().put(a)
    }
    out.write(bb.array())
    out.write(new Array[Byte](pad8(dataBytes)))
  }

  // ------------------------------------------------------------ reader

  /** Read all numeric matrix variables from a Level 5 MAT-file. */
  def read(path: Path): Seq[MatVar] = {
    val bytes = Files.readAllBytes(path)
    require(bytes.length >= 128, "mat: truncated header")
    val e0 = bytes(126).toChar; val e1 = bytes(127).toChar
    require((e0 == 'I' && e1 == 'M') || (e0 == 'M' && e1 == 'I'),
      s"mat: bad endian indicator '$e0$e1'")
    require(e0 == 'I',
      "mat: big-endian files are not supported (write with a " +
        "little-endian MATLAB/scipy, the common case)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(128)
    val vars = Vector.newBuilder[MatVar]
    while (bb.remaining() >= 8) {
      val tpe = bb.getInt(); val n = bb.getInt()
      // every allocation below is sized by n — a corrupt/hostile size
      // field must fail loudly here, not as an OOM attempt
      require(n >= 0 && n <= bb.remaining(),
        s"mat: element claims $n bytes with ${bb.remaining()} left")
      tpe match {
        case MiMatrix =>
          val slice = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
          slice.limit(n)
          vars += parseMatrix(slice)
          bb.position(bb.position() + n + math.min(pad8(n), bb.remaining() - n))
        case MiCompressed =>
          val packed = new Array[Byte](n)
          bb.get(packed)
          // real writers (MATLAB, scipy) do NOT pad compressed elements
          // to the 8-byte boundary other elements get — advance exactly n
          val inflated = inflate(packed)
          val ib = ByteBuffer.wrap(inflated).order(ByteOrder.LITTLE_ENDIAN)
          val itpe = ib.getInt(); val in = ib.getInt()
          require(itpe == MiMatrix,
            s"mat: compressed element holds type $itpe, expected matrix")
          val slice = ib.slice().order(ByteOrder.LITTLE_ENDIAN)
          slice.limit(in)
          vars += parseMatrix(slice)
        case other =>
          throw new IllegalArgumentException(
            s"mat: unsupported top-level element type $other")
      }
    }
    vars.result()
  }

  /** Inflated-size ceiling: 1 GiB. A hand-crafted deflate stream can
    * expand thousands of times; without a cap a small hostile file
    * could OOM the JVM during parse. Real MATLAB variables this large
    * should be saved uncompressed (or split). */
  private val MaxInflatedBytes = 1L << 30

  private def inflate(packed: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(packed)
    val out = new java.io.ByteArrayOutputStream(packed.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val k = inf.inflate(buf)
      // stall states: truncated stream (needsInput) or a preset-
      // dictionary stream (needsDictionary — no dictionary can exist in
      // a .mat, and looping on it would spin forever). k == 0 with the
      // stream finished is the normal final-block exit.
      if (k == 0 && !inf.finished()) {
        inf.end()
        throw new IllegalArgumentException(
          "mat: zlib element stalled (truncated stream or " +
            "preset-dictionary header) — refusing")
      }
      out.write(buf, 0, k)
      if (out.size() > MaxInflatedBytes) {
        inf.end()
        throw new IllegalArgumentException(
          s"mat: compressed element inflates past $MaxInflatedBytes " +
            "bytes — refusing (zip-bomb guard)")
      }
    }
    inf.end()
    out.toByteArray
  }

  /** Read one subelement tag, handling MATLAB's packed "small data
    * element" form (payload <= 4 bytes: high 16 bits of the first word
    * carry the byte count, data lives in the second word). Returns
    * (dataType, numBytes, smallPayloadOrNull); for the small form the
    * buffer is positioned past the whole 8-byte element. */
  private def readTag(bb: ByteBuffer): (Int, Int, Array[Byte]) = {
    val w = bb.getInt()
    val small = (w >>> 16) != 0
    if (small) {
      val nb = w >>> 16
      require(nb <= 4, s"mat: corrupt small element size $nb")
      val payload = new Array[Byte](4)
      bb.get(payload)
      ((w & 0xffff), nb, java.util.Arrays.copyOf(payload, nb))
    } else (w, bb.getInt(), null)
  }

  private def parseMatrix(bb: ByteBuffer): MatVar = {
    // array flags
    val (ft, fn, fSmall) = readTag(bb)
    require(ft == MiUInt32 && fn == 8 && fSmall == null,
      s"mat: bad array-flags subelement (type $ft size $fn)")
    val flagsWord = bb.getInt(); bb.getInt() // reserved
    val clazz = flagsWord & 0xff
    val flags = (flagsWord >>> 8) & 0xff
    require((flags & 0x08) == 0, "mat: complex matrices are not supported")
    val className = clazz match {
      case MxDouble | MxSingle | MxInt8 | MxUInt8 | MxInt16 | MxUInt16 |
          MxInt32 | MxUInt32 | MxInt64 | MxUInt64 => null
      case 1 => "cell"; case 2 => "struct"; case 3 => "object"
      case 4 => "char"; case 5 => "sparse"; case other => s"class $other"
    }
    if (className != null) throw new IllegalArgumentException(
      s"mat: unsupported array class '$className' (numeric 2-D only)")
    // dimensions
    val (dt, dn, dSmall) = readTag(bb)
    require(dt == MiInt32 && dSmall == null, "mat: bad dimensions subelement")
    require(dn == 8, s"mat: only 2-D matrices supported, got ${dn / 4} dims")
    val rows = bb.getInt(); val cols = bb.getInt()
    require(rows >= 0 && cols >= 0 &&
      rows.toLong * cols <= Int.MaxValue.toLong,
      s"mat: corrupt dimensions $rows x $cols")
    // name (size fields are file-controlled: bound before allocating)
    val (nt, nn, nSmall) = readTag(bb)
    require(nt == MiInt8, s"mat: bad name subelement type $nt")
    val name = if (nSmall != null) new String(nSmall, "US-ASCII")
    else {
      require(nn >= 0 && nn <= bb.remaining(),
        s"mat: name claims $nn bytes with ${bb.remaining()} left")
      val b = new Array[Byte](nn)
      bb.get(b)
      bb.position(bb.position() + math.min(pad8(nn), bb.remaining()))
      new String(b, "US-ASCII")
    }
    // real part: honor the PAYLOAD type (MATLAB may narrow storage,
    // e.g. doubles whose values fit int8 stored as miINT8/miUINT8)
    val (pt, pn, pSmall) = readTag(bb)
    val payload = if (pSmall != null) pSmall
    else {
      require(pn >= 0 && pn <= bb.remaining(),
        s"mat: payload claims $pn bytes with ${bb.remaining()} left")
      val b = new Array[Byte](pn)
      bb.get(b)
      b
    }
    val pb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val n = rows * cols
    val ptWidth = pt match {
      case MiInt8 | MiUInt8 => 1
      case MiInt16 | MiUInt16 => 2
      case MiInt32 | MiUInt32 | MiSingle => 4
      case _ => 8
    }
    require(payload.length.toLong >= n.toLong * ptWidth,
      s"mat: $rows x $cols needs ${n.toLong * ptWidth} payload bytes, " +
        s"element holds ${payload.length}")
    val raw: MatData = pt match {
      case MiDouble =>
        val a = new Array[Double](n); pb.asDoubleBuffer().get(a); Doubles(a)
      case MiSingle =>
        val a = new Array[Float](n); pb.asFloatBuffer().get(a); Singles(a)
      case MiInt16 =>
        val a = new Array[Short](n); pb.asShortBuffer().get(a); Int16s(a)
      case MiUInt16 =>
        val a = new Array[Int](n)
        var i = 0
        while (i < n) { a(i) = pb.getShort() & 0xffff; i += 1 }
        Int32s(a)
      case MiInt32 =>
        val a = new Array[Int](n); pb.asIntBuffer().get(a); Int32s(a)
      case MiUInt32 =>
        val a = new Array[Long](n)
        var i = 0
        while (i < n) { a(i) = pb.getInt() & 0xffffffffL; i += 1 }
        Int64s(a)
      case MiInt64 | MiUInt64 =>
        val a = new Array[Long](n); pb.asLongBuffer().get(a); Int64s(a)
      case MiInt8 =>
        val a = new Array[Short](n)
        var i = 0
        while (i < n) { a(i) = pb.get().toShort; i += 1 }
        Int16s(a)
      case MiUInt8 =>
        val a = new Array[Short](n)
        var i = 0
        while (i < n) { a(i) = (pb.get() & 0xff).toShort; i += 1 }
        Int16s(a)
      case other => throw new IllegalArgumentException(
        s"mat: unsupported payload type $other for variable '$name'")
    }
    // when MATLAB narrowed the storage, widen values back to the class
    // the variable declares (double/single classes expect fractional
    // reads to work downstream)
    val data: MatData = (clazz, raw) match {
      case (MxDouble, Doubles(_)) => raw
      case (MxDouble, _) => Doubles(toDoubles(raw))
      case (MxSingle, Singles(_)) => raw
      case (MxSingle, _) => Singles(toDoubles(raw).map(_.toFloat))
      case _ => raw
    }
    MatVar(name, rows, cols, data)
  }

  private def toDoubles(d: MatData): Array[Double] = d match {
    case Doubles(a) => a
    case Singles(a) => a.map(_.toDouble)
    case Int16s(a) => a.map(_.toDouble)
    case Int32s(a) => a.map(_.toDouble)
    case Int64s(a) => a.map(_.toDouble)
  }
}
