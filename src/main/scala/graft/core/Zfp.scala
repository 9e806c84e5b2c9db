package graft.core

/** ZFP reversible-mode (lossless) codec for 2D fields, JVM implementation.
  *
  * Implements the published zfp stream format (codec version 5) for the
  * subset the reference engine writes (`cpp/src/compression/
  * zfp_compressor.cpp:48-134`): a FULL header (magic + field metadata +
  * mode) followed by 4x4-block reversible-mode payload, for 2D fields of
  * int32, float and double — plus the reference's int16 path, which
  * promotes to int32 via `<<15` before compression and demotes with
  * clamping after decompression (`zfp_compressor.cpp:107-123,155-167`).
  *
  * Format notes (all from the public zfp format/source, v1.x):
  *  - bitstream of 64-bit words, bits packed LSB-first, words serialized
  *    little-endian; streams padded with zeros to a word boundary;
  *  - header: 32-bit magic 'z','f','p',codec=5; 52-bit field metadata
  *    ((nx-1):24 | (ny-1):24 | dims-1:2 | type-int32:2, written MSB part
  *    first via a single 52-bit LSB-first write); 12-bit mode, where
  *    reversible mode is the short-mode value 4094;
  *  - per block: reversible ("high-order Lorenzo") decorrelating
  *    transform, total-sequency coefficient reorder, two's-complement ->
  *    negabinary mapping, and the adaptive group-tested bit-plane coder
  *    over all `intprec` planes (reversible mode never truncates planes);
  *  - float/double blocks carry a 1-bit flag: 1 = the block was
  *    losslessly converted to integers by the block-floating-point
  *    transform (the flag is the LSB of the (2*(emax+EBIAS)+1, EBITS+1)
  *    header write), 0 = values were reinterpreted as sign-magnitude
  *    integer bits (NaN/Inf/extreme-range fallback);
  *  - each block's plane data is preceded by a common trailing-zero-
  *    plane count (6 bits for 32-bit, 7 for 64-bit coefficients) and
  *    only the significant planes are coded — the elision that makes
  *    promoted int16 (`<<15`) and block-floating-point-converted float
  *    coefficients compress instead of expand. This is the one spot
  *    where the exact bit layout is this implementation's documented
  *    reconstruction of the reversible codec rather than a verbatim
  *    transliteration; round-trip losslessness is test-guaranteed
  *    either way (no reference-written blobs exist in this sandbox to
  *    cross-validate bit layouts against).
  *
  * Decompression accepts trailing bytes after the payload: the reference
  * appends `zfp_write_header`'s BIT count to the byte size when slicing
  * its buffer (`zfp_compressor.cpp:129-133`), so reference blobs carry
  * ~96 junk tail bytes; like libzfp, we simply never read past the last
  * needed bit.
  *
  * Fixed-accuracy (lossy) mode — reference `zfp_compressor.cpp:93-134`,
  * tolerance >= 0 via `zfp_stream_set_accuracy` — is implemented as
  * zfp's accuracy semantics reconstructed on top of the same reversible
  * machinery:
  *  - tolerance -> minexp = floor(log2(tolerance)) (frexp - 1, exactly
  *    zfp_stream_set_accuracy), minexp = ZFP_MIN_EXP (-1074) for
  *    tolerance 0; the 12-bit short mode codes minexp - ZFP_MIN_EXP
  *    (reversible stays 4094, 4095 = expert mode, rejected);
  *  - float/double blocks ALWAYS block-floating-point convert (no
  *    raw-IEEE fallback bit): iblock = trunc(x * 2^(intprec-2 - emax)),
  *    a single 0 bit for an all-zero (or all-below-tolerance) block;
  *  - per-block precision = min(intprec, max(0, emax - minexp +
  *    2*(dims+1))) — zfp's `precision()`, whose 2*(dims+1) slack absorbs
  *    transform gain — and the bit-plane coder stops at
  *    kmin = intprec - precision instead of coding every plane;
  *  - integer fields ignore minexp (zfp codes them at full maxprec;
  *    tolerance applies to floating-point fields only), so "lossy"
  *    int16/int32 streams round-trip exactly here.
  *
  * TWO accuracy-mode payload layouts coexist, distinguished by the
  * version-byte [[LossyMarker]]:
  *  - GRAFT layout (marked): reuses the reversible Lorenzo lift and the
  *    trailing-zero elision for the accuracy mode. Strictly tighter
  *    reconstruction than libzfp (no transform rounding; integer fields
  *    exact); graft's own transport writes this.
  *  - STANDARD layout (unmarked): libzfp's actual accuracy-mode coding —
  *    the non-orthogonal lifting transform, the (2*(emax+EBIAS)+1,
  *    EBITS+1)-bit block-float header, and the plain embedded plane
  *    coder with no prefix field. [[decompress]] reads any unmarked
  *    accuracy stream through this path, so genuine libzfp-written
  *    fixed-accuracy blobs (what the reference engine's
  *    zfp_stream_set_accuracy path produces) decode directly; the
  *    `*LossyStd` compressors write it for interop. Spec-derived: no
  *    libzfp binary exists in this sandbox to cross-validate bytes
  *    against, so the layout is pinned by round-trip + error-bound
  *    specs AND by hand-derived golden bitstreams (ZfpGoldenSpec
  *    re-assembles expected bytes from the published format with an
  *    independent bit packer and asserts byte-exact encode + decode).
  *
  * [[ZfpHeader]] exposes the parsed mode; unknown/expert modes are
  * rejected loudly by [[decompress]].
  */
object Zfp {

  // ----------------------------------------------------------- bitstream

  /** zfp bitstream writer: 64-bit words, LSB-first. */
  final class BitWriter {
    private var words = new Array[Long](64)
    private var n = 0
    private var acc = 0L
    private var accBits = 0

    private def emit(w: Long): Unit = {
      if (n == words.length) words = java.util.Arrays.copyOf(words, n * 2)
      words(n) = w
      n += 1
    }

    def writeBit(b: Int): Int = {
      acc |= (b.toLong & 1L) << accBits
      accBits += 1
      if (accBits == 64) { emit(acc); acc = 0L; accBits = 0 }
      b & 1
    }

    /** Write the low `m` bits of `value`, LSB first; returns value >>> m
      * (the unwritten bits), matching zfp's stream_write_bits. */
    def writeBits(value: Long, m: Int): Long = {
      var v = value
      var left = m
      while (left > 0) {
        val take = math.min(left, 64 - accBits)
        acc |= (v & (if (take == 64) -1L else (1L << take) - 1)) << accBits
        accBits += take
        if (accBits == 64) { emit(acc); acc = 0L; accBits = 0 }
        v = if (take == 64) 0L else v >>> take
        left -= take
      }
      v
    }

    /** Pad with zero bits to the next word boundary and serialize
      * little-endian (zfp stream_flush + memory layout). */
    def toBytes: Array[Byte] = {
      val wordCount = n + (if (accBits > 0) 1 else 0)
      val out = new Array[Byte](wordCount * 8)
      val bb = java.nio.ByteBuffer.wrap(out)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < n) { bb.putLong(words(i)); i += 1 }
      if (accBits > 0) bb.putLong(acc)
      out
    }
  }

  /** zfp bitstream reader: 64-bit little-endian words, LSB-first. */
  final class BitReader(bytes: Array[Byte]) {
    private val nWords = (bytes.length + 7) / 8
    private var idx = 0
    private var acc = 0L
    private var accBits = 0

    private def word(i: Int): Long = {
      var w = 0L
      var b = 0
      while (b < 8) {
        val off = i * 8 + b
        val v = if (off < bytes.length) bytes(off) & 0xffL else 0L
        w |= v << (8 * b)
        b += 1
      }
      w
    }

    def readBit(): Int = {
      if (accBits == 0) {
        require(idx < nWords, "zfp: bitstream exhausted")
        acc = word(idx); idx += 1; accBits = 64
      }
      val b = (acc & 1L).toInt
      acc >>>= 1
      accBits -= 1
      b
    }

    def readBits(m: Int): Long = {
      var v = 0L
      var got = 0
      while (got < m) {
        if (accBits == 0) {
          require(idx < nWords, "zfp: bitstream exhausted")
          acc = word(idx); idx += 1; accBits = 64
        }
        val take = math.min(m - got, accBits)
        v |= (acc & (if (take == 64) -1L else (1L << take) - 1)) << got
        acc = if (take == 64) 0L else acc >>> take
        accBits -= take
        got += take
      }
      v
    }
  }

  // ------------------------------------------------------------- header

  /** zfp_type - zfp_type_int32 codes as stored in field metadata. */
  val TypeInt32 = 0
  val TypeInt64 = 1
  val TypeFloat = 2
  val TypeDouble = 3

  private val CodecVersion = 5
  private val ModeReversible = 4094L // ZFP_MODE_SHORT_MAX; 12-bit write
  private val ModeExpert = 4095L     // 0xfff: 64-bit expert mode follows
  /** Version-byte marker for the GRAFT-layout fixed-accuracy payload
    * (reversible Lorenzo lift + trailing-zero-count field). Graft lossy
    * streams set the high bit of the version byte — libzfp codec
    * versions are small integers and never do — so [[readHeader]] can
    * route marked streams to the graft decode and unmarked accuracy
    * streams to the standard libzfp-layout decode. */
  private val LossyMarker = 0x80
  val ZfpMinExp: Int = -1074         // ZFP_MIN_EXP

  /** Decode output ceiling in values (2^28 = 2 GiB of doubles): bounds
    * the legal ~1000x compression amplification of all-zero fields so a
    * hostile or absurd header fails with a diagnosis instead of an
    * executor-killing OutOfMemoryError. */
  val MaxDecodedValues: Long = 1L << 28

  final case class ZfpHeader(tpe: Int, nx: Int, ny: Int, mode: Long,
      graftLossy: Boolean = false) {
    def reversible: Boolean = mode == ModeReversible
    /** Fixed-accuracy short mode: codes minexp - ZFP_MIN_EXP. */
    def accuracy: Boolean = mode < ModeReversible
    def minexp: Int = (mode + ZfpMinExp).toInt
  }

  /** zfp_stream_set_accuracy's tolerance -> minexp map: the exponent e
    * with 2^e <= tolerance < 2^(e+1) (frexp minus one), ZFP_MIN_EXP for
    * tolerance <= 0. */
  def minexpForTolerance(tolerance: Double): Int =
    if (tolerance >= java.lang.Double.MIN_NORMAL) Math.getExponent(tolerance)
    else if (tolerance > 0)
      // Subnormal tolerance: getExponent pins at -1023 instead of the
      // true frexp exponent down to -1074 that zfp_stream_set_accuracy
      // computes, under-provisioning precision. Rescale by 2^53 (exact:
      // the value becomes normal) and subtract 53.
      Math.getExponent(tolerance * 9007199254740992.0) - 53
    else ZfpMinExp

  private def modeForMinexp(minexp: Int): Long = {
    val m = (minexp - ZfpMinExp).toLong
    require(m >= 0 && m < ModeReversible,
      s"zfp: accuracy minexp $minexp outside short-mode range")
    m
  }

  private def writeHeader(w: BitWriter, tpe: Int, nx: Int, ny: Int,
      mode: Long = ModeReversible, graftMarked: Boolean = true): Unit = {
    w.writeBits('z'.toLong, 8)
    w.writeBits('f'.toLong, 8)
    w.writeBits('p'.toLong, 8)
    w.writeBits(
      if (mode < ModeReversible && graftMarked)
        (CodecVersion | LossyMarker).toLong
      else CodecVersion.toLong, 8)
    // meta, 52 bits: (((nx-1) << 24 | (ny-1)) << 2 | dims-1) << 2 | type
    var meta = (nx - 1).toLong
    meta = (meta << 24) | (ny - 1).toLong
    meta = (meta << 2) | 1L // dims - 1 = 1 (2D)
    meta = (meta << 2) | tpe.toLong
    w.writeBits(meta, 52)
    w.writeBits(mode, 12)
  }

  /** Parse a FULL header. Throws on bad magic/version/dims; lossy or
    * expert modes parse fine (callers inspect `reversible`).
    *
    * Accuracy-mode provenance: an UNMARKED accuracy stream (plain
    * version byte) is presumed to carry the standard libzfp payload
    * layout — the shape a genuine libzfp writer, and this object's
    * `*LossyStd` compressors, produce — and `graftLossy` comes back
    * false. A [[LossyMarker]]-marked stream carries the graft-enhanced
    * payload (reversible transform + trailing-zero elision) and sets
    * `graftLossy`. The one ambiguity: graft versions before the marker
    * wrote the graft payload under a plain version byte,
    * header-indistinguishable from libzfp; a caller who KNOWS a stream's
    * provenance is that era opts in via `acceptUnmarkedLossy` and gets
    * the graft decode ([[decompressLegacyLossy]]).
    */
  def readHeader(r: BitReader,
      acceptUnmarkedLossy: Boolean = false): ZfpHeader = {
    val m0 = r.readBits(8); val m1 = r.readBits(8)
    val m2 = r.readBits(8); val ver = r.readBits(8)
    require(m0 == 'z'.toLong && m1 == 'f'.toLong && m2 == 'p'.toLong,
      "zfp: bad magic")
    val lossyMarked = ver == (CodecVersion | LossyMarker).toLong
    require(ver == CodecVersion.toLong || lossyMarked,
      s"zfp: unsupported codec version $ver")
    val meta = r.readBits(52)
    val tpe = (meta & 3L).toInt
    val dims = ((meta >>> 2) & 3L).toInt + 1
    require(dims == 2, s"zfp: only 2D fields supported, got ${dims}D")
    val ny = ((meta >>> 4) & 0xffffffL).toInt + 1
    val nx = ((meta >>> 28) & 0xffffffL).toInt + 1
    var mode = r.readBits(12)
    if (mode == 0xfffL) mode = 0xfffL | (r.readBits(52) << 12) // expert
    if (lossyMarked) require(mode < ModeReversible,
      s"zfp: lossy-marked stream carries non-accuracy mode $mode")
    ZfpHeader(tpe, nx, ny, mode,
      graftLossy = mode < ModeReversible &&
        (lossyMarked || acceptUnmarkedLossy))
  }

  // ----------------------------------------- block machinery (2D, 4x4)

  /** Coefficient reorder by total sequency, zfp's perm_2 table. */
  private val Perm2: Array[Int] = {
    def index(i: Int, j: Int) = i + 4 * j
    Array(
      index(0, 0),
      index(1, 0), index(0, 1),
      index(1, 1), index(2, 0), index(0, 2),
      index(2, 1), index(1, 2), index(3, 0), index(0, 3),
      index(2, 2), index(3, 1), index(1, 3),
      index(3, 2), index(2, 3),
      index(3, 3))
  }

  /** Reversible forward lift (high-order Lorenzo transform) of a
    * 4-vector, matching zfp's fwd_rev_lift: w-=z; z-=y; y-=x; w-=z;
    * z-=y; w-=z (wrapping arithmetic). */
  private def fwdRevLift32(p: Array[Int], o: Int, s: Int): Unit = {
    var x = p(o); var y = p(o + s); var z = p(o + 2 * s); var w = p(o + 3 * s)
    w -= z; z -= y; y -= x
    w -= z; z -= y
    w -= z
    p(o) = x; p(o + s) = y; p(o + 2 * s) = z; p(o + 3 * s) = w
  }

  private def invRevLift32(p: Array[Int], o: Int, s: Int): Unit = {
    var x = p(o); var y = p(o + s); var z = p(o + 2 * s); var w = p(o + 3 * s)
    w += z
    z += y; w += z
    y += x; z += y; w += z
    p(o) = x; p(o + s) = y; p(o + 2 * s) = z; p(o + 3 * s) = w
  }

  private def fwdRevLift64(p: Array[Long], o: Int, s: Int): Unit = {
    var x = p(o); var y = p(o + s); var z = p(o + 2 * s); var w = p(o + 3 * s)
    w -= z; z -= y; y -= x
    w -= z; z -= y
    w -= z
    p(o) = x; p(o + s) = y; p(o + 2 * s) = z; p(o + 3 * s) = w
  }

  private def invRevLift64(p: Array[Long], o: Int, s: Int): Unit = {
    var x = p(o); var y = p(o + s); var z = p(o + 2 * s); var w = p(o + 3 * s)
    w += z
    z += y; w += z
    y += x; z += y; w += z
    p(o) = x; p(o + s) = y; p(o + 2 * s) = z; p(o + 3 * s) = w
  }

  /** 2D forward transform: rows (x) then columns (y). */
  private def fwdRevXform32(b: Array[Int]): Unit = {
    var y = 0
    while (y < 4) { fwdRevLift32(b, 4 * y, 1); y += 1 }
    var x = 0
    while (x < 4) { fwdRevLift32(b, x, 4); x += 1 }
  }

  private def invRevXform32(b: Array[Int]): Unit = {
    var x = 0
    while (x < 4) { invRevLift32(b, x, 4); x += 1 }
    var y = 0
    while (y < 4) { invRevLift32(b, 4 * y, 1); y += 1 }
  }

  private def fwdRevXform64(b: Array[Long]): Unit = {
    var y = 0
    while (y < 4) { fwdRevLift64(b, 4 * y, 1); y += 1 }
    var x = 0
    while (x < 4) { fwdRevLift64(b, x, 4); x += 1 }
  }

  private def invRevXform64(b: Array[Long]): Unit = {
    var x = 0
    while (x < 4) { invRevLift64(b, x, 4); x += 1 }
    var y = 0
    while (y < 4) { invRevLift64(b, 4 * y, 1); y += 1 }
  }

  /** Standard (libzfp) forward lift of a 4-vector — the non-orthogonal
    * decorrelating transform 1/16 * [4 4 4 4; 5 1 -1 -5; -4 4 4 -4;
    * -2 6 -6 2] factored into lifting steps, from the published zfp
    * algorithm (Lindstrom, "Fixed-Rate Compressed Floating-Point
    * Arrays", TVCG 2014, and the zfp docs' algorithm section). Unlike
    * the reversible Lorenzo lift above, the `>>1` steps round: forward
    * followed by inverse reproduces inputs only to within a few units
    * of the block's fixed-point scale, which is why libzfp (and this
    * file) use it for the ACCURACY modes only. */
  private def fwdStdLift32(p: Array[Int], o: Int, s: Int): Unit = {
    var x = p(o); var y = p(o + s); var z = p(o + 2 * s); var w = p(o + 3 * s)
    x += w; x >>= 1; w -= x
    z += y; z >>= 1; y -= z
    x += z; x >>= 1; z -= x
    w += y; w >>= 1; y -= w
    w += y >> 1; y -= w >> 1
    p(o) = x; p(o + s) = y; p(o + 2 * s) = z; p(o + 3 * s) = w
  }

  /** Standard inverse lift: each lifting step of [[fwdStdLift32]]
    * reversed (exact inverse modulo the forward pass's shift rounding). */
  private def invStdLift32(p: Array[Int], o: Int, s: Int): Unit = {
    var x = p(o); var y = p(o + s); var z = p(o + 2 * s); var w = p(o + 3 * s)
    y += w >> 1; w -= y >> 1
    y += w; w <<= 1; w -= y
    z += x; x <<= 1; x -= z
    y += z; z <<= 1; z -= y
    w += x; x <<= 1; x -= w
    p(o) = x; p(o + s) = y; p(o + 2 * s) = z; p(o + 3 * s) = w
  }

  private def fwdStdLift64(p: Array[Long], o: Int, s: Int): Unit = {
    var x = p(o); var y = p(o + s); var z = p(o + 2 * s); var w = p(o + 3 * s)
    x += w; x >>= 1; w -= x
    z += y; z >>= 1; y -= z
    x += z; x >>= 1; z -= x
    w += y; w >>= 1; y -= w
    w += y >> 1; y -= w >> 1
    p(o) = x; p(o + s) = y; p(o + 2 * s) = z; p(o + 3 * s) = w
  }

  private def invStdLift64(p: Array[Long], o: Int, s: Int): Unit = {
    var x = p(o); var y = p(o + s); var z = p(o + 2 * s); var w = p(o + 3 * s)
    y += w >> 1; w -= y >> 1
    y += w; w <<= 1; w -= y
    z += x; x <<= 1; x -= z
    y += z; z <<= 1; z -= y
    w += x; x <<= 1; x -= w
    p(o) = x; p(o + s) = y; p(o + 2 * s) = z; p(o + 3 * s) = w
  }

  /** 2D standard transforms: same row/column traversal as the
    * reversible ones (zfp fwd_xform_2 / inv_xform_2). */
  private def fwdStdXform32(b: Array[Int]): Unit = {
    var y = 0
    while (y < 4) { fwdStdLift32(b, 4 * y, 1); y += 1 }
    var x = 0
    while (x < 4) { fwdStdLift32(b, x, 4); x += 1 }
  }

  private def invStdXform32(b: Array[Int]): Unit = {
    var x = 0
    while (x < 4) { invStdLift32(b, x, 4); x += 1 }
    var y = 0
    while (y < 4) { invStdLift32(b, 4 * y, 1); y += 1 }
  }

  private def fwdStdXform64(b: Array[Long]): Unit = {
    var y = 0
    while (y < 4) { fwdStdLift64(b, 4 * y, 1); y += 1 }
    var x = 0
    while (x < 4) { fwdStdLift64(b, x, 4); x += 1 }
  }

  private def invStdXform64(b: Array[Long]): Unit = {
    var x = 0
    while (x < 4) { invStdLift64(b, x, 4); x += 1 }
    var y = 0
    while (y < 4) { invStdLift64(b, 4 * y, 1); y += 1 }
  }

  /** Two's complement -> negabinary (int32). */
  private def int2uint32(x: Int): Long =
    (((x + 0xaaaaaaaa) ^ 0xaaaaaaaa) & 0xffffffffL)

  private def uint2int32(u: Long): Int =
    ((u ^ 0xaaaaaaaaL) - 0xaaaaaaaaL).toInt

  private def int2uint64(x: Long): Long =
    (x + 0xaaaaaaaaaaaaaaaaL) ^ 0xaaaaaaaaaaaaaaaaL

  private def uint2int64(u: Long): Long =
    (u ^ 0xaaaaaaaaaaaaaaaaL) - 0xaaaaaaaaaaaaaaaaL

  /** Reversible-mode integer coder: a trailing-zero-plane count followed
    * by zfp's adaptive group-tested bit-plane coder (encode_ints) over
    * the remaining planes, MSB->LSB.
    *
    * The trailing-zero elision is what makes reversible mode viable on
    * scaled integers: the reference's int16 `<<15` promotion and the
    * block-floating-point float conversion both produce coefficients
    * whose low planes are uniformly zero (negabinary and the Lorenzo
    * transform both preserve common trailing zeros), and coding those
    * planes verbatim would EXPAND the data (measured: 26 bits/value on
    * the int16 sine fixture without elision, 11 with). The count is
    * written in ceil(log2(intprec+1)) bits; an all-zero block is just
    * the count == intprec. Reversible mode never exhausts its bit budget
    * on a 2D block, so no truncation/padding paths are needed.
    *
    * `kmin` (fixed-accuracy mode) stops the coder above the lowest
    * `kmin` planes — zfp's `intprec - precision()` cutoff; the truncated
    * planes decode as zeros. Reversible callers pass 0 (code every
    * plane), keeping the lossless bit layout unchanged. */
  private def encodeInts(w: BitWriter, ublock: Array[Long],
      intprec: Int, kmin: Int = 0): Unit = {
    var tz = intprec
    var i0 = 0
    while (i0 < 16 && tz > 0) {
      if (ublock(i0) != 0L)
        tz = math.min(tz, java.lang.Long.numberOfTrailingZeros(ublock(i0)))
      i0 += 1
    }
    w.writeBits(tz.toLong, if (intprec > 32) 7 else 6)
    if (tz == intprec) return // all-zero block
    if (tz > 0) {
      var j = 0
      while (j < 16) { ublock(j) = ublock(j) >>> tz; j += 1 }
    }
    // plane k of the shifted coefficients is plane k+tz of the original
    codePlanes(w, ublock, intprec - tz, math.max(0, kmin - tz))
  }

  /** zfp's embedded group-tested bit-plane coder (the encode_ints plane
    * loop), planes `kmax-1` down to `kmin`, MSB->LSB. Shared verbatim by
    * the reversible coder (after its trailing-zero elision) and the
    * standard-layout accuracy coder, which codes planes directly with no
    * prefix field — libzfp's actual fixed-accuracy layout. */
  private def codePlanes(w: BitWriter, ublock: Array[Long],
      kmax: Int, kmin: Int): Unit = {
    var k = kmax
    var n = 0
    while (k > kmin) {
      k -= 1
      // extract bit plane k
      var x = 0L
      var i = 0
      while (i < 16) {
        x |= ((ublock(i) >>> k) & 1L) << i
        i += 1
      }
      // verbatim-code the first n bits (known-significant coefficients)
      x = w.writeBits(x, n)
      // group-test the remainder
      var continue = true
      while (continue && n < 16 && w.writeBit(if (x != 0L) 1 else 0) == 1) {
        var stop = false
        while (!stop && n < 16 - 1) {
          val bit = w.writeBit((x & 1L).toInt)
          x >>>= 1
          n += 1
          if (bit == 1) stop = true
        }
        if (!stop) { // n reached 16 - 1: the last coefficient's bit
          x >>>= 1
          n += 1
          continue = false
        }
      }
    }
  }

  /** Mirror of [[encodeInts]]. */
  private def decodeInts(r: BitReader, ublock: Array[Long],
      intprec: Int, kmin: Int = 0): Unit = {
    java.util.Arrays.fill(ublock, 0L)
    val tz = r.readBits(if (intprec > 32) 7 else 6).toInt
    require(tz <= intprec, s"zfp: corrupt trailing-zero count $tz")
    if (tz == intprec) return // all-zero block
    decodePlanes(r, ublock, intprec - tz, math.max(0, kmin - tz))
    if (tz > 0) {
      var j = 0
      while (j < 16) { ublock(j) = ublock(j) << tz; j += 1 }
    }
  }

  /** Mirror of [[codePlanes]]; `ublock` must be zero-filled on entry. */
  private def decodePlanes(r: BitReader, ublock: Array[Long],
      kmax: Int, kmin: Int): Unit = {
    var k = kmax
    var n = 0
    while (k > kmin) {
      k -= 1
      var x = r.readBits(n)
      // group-test decode of the remainder of the plane
      var continue = true
      while (continue && n < 16 && r.readBit() == 1) {
        var stop = false
        while (!stop && n < 16 - 1) {
          val bit = r.readBit()
          if (bit == 1) {
            x |= 1L << n
            n += 1
            stop = true
          } else n += 1
        }
        if (!stop) { // the last coefficient
          x |= 1L << n
          n += 1
          continue = false
        }
      }
      // deposit plane
      var i = 0
      var xx = x
      while (xx != 0L) {
        ublock(i) += (xx & 1L) << k
        i += 1
        xx >>>= 1
      }
    }
  }

  // -------------------------------------------- gather/scatter + pad

  /** zfp pad_block: replicate pattern for partial extents. */
  private def padBlock32(b: Array[Int], o: Int, filled: Int, s: Int): Unit =
    filled match {
      case 0 => b(o) = 0; b(o + s) = b(o); b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 1 => b(o + s) = b(o); b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 2 => b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 3 => b(o + 3 * s) = b(o)
      case _ =>
    }

  private def padBlock64(b: Array[Long], o: Int, filled: Int, s: Int): Unit =
    filled match {
      case 0 => b(o) = 0; b(o + s) = b(o); b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 1 => b(o + s) = b(o); b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 2 => b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 3 => b(o + 3 * s) = b(o)
      case _ =>
    }

  // --------------------------------------------------- int32 payloads

  private def encodeBlockInt32(w: BitWriter, block: Array[Int]): Unit = {
    fwdRevXform32(block)
    val ublock = new Array[Long](16)
    var i = 0
    while (i < 16) { ublock(i) = int2uint32(block(Perm2(i))); i += 1 }
    encodeInts(w, ublock, 32)
  }

  private def decodeBlockInt32(r: BitReader, block: Array[Int]): Unit = {
    val ublock = new Array[Long](16)
    decodeInts(r, ublock, 32)
    var i = 0
    while (i < 16) { block(Perm2(i)) = uint2int32(ublock(i)); i += 1 }
    invRevXform32(block)
  }

  /** Compress an int32 2D field (nx fastest-varying, row-major). */
  def compressInt32(data: Array[Int], nx: Int, ny: Int): Array[Byte] = {
    require(data.length == nx * ny, "zfp: data length != nx*ny")
    val w = new BitWriter
    writeHeader(w, TypeInt32, nx, ny)
    val block = new Array[Int](16)
    var by = 0
    while (by < ny) {
      var bx = 0
      while (bx < nx) {
        val mx = math.min(4, nx - bx)
        val my = math.min(4, ny - by)
        var j = 0
        while (j < my) {
          var i = 0
          while (i < mx) {
            block(4 * j + i) = data((by + j) * nx + (bx + i))
            i += 1
          }
          padBlock32(block, 4 * j, mx, 1)
          j += 1
        }
        var i = 0
        while (i < 4) { padBlock32(block, i, my, 4); i += 1 }
        encodeBlockInt32(w, block)
        bx += 4
      }
      by += 4
    }
    w.toBytes
  }

  private def decodeInt32Payload(r: BitReader, nx: Int, ny: Int,
      std: Boolean = false): Array[Int] = {
    val out = new Array[Int](nx * ny)
    val block = new Array[Int](16)
    var by = 0
    while (by < ny) {
      var bx = 0
      while (bx < nx) {
        if (std) decodeBlockInt32Std(r, block) else decodeBlockInt32(r, block)
        val mx = math.min(4, nx - bx)
        val my = math.min(4, ny - by)
        var j = 0
        while (j < my) {
          var i = 0
          while (i < mx) {
            out((by + j) * nx + (bx + i)) = block(4 * j + i)
            i += 1
          }
          j += 1
        }
        bx += 4
      }
      by += 4
    }
    out
  }

  // ------------------------------------------- float/double payloads

  private def exponentF(x: Float): Int = {
    // frexp exponent of |x| (x = m * 2^e, m in [0.5, 1)), clamped for
    // subnormals like zfp's exponent()
    if (x > 0) {
      var e = Math.getExponent(x)
      if (e == java.lang.Float.MIN_EXPONENT - 1) // subnormal
        e = Math.getExponent(x * 9007199254740992f) - 53 // x * 2^53
      math.max(e + 1, 1 - 127)
    } else -127
  }

  private def exponentD(x: Double): Int = {
    if (x > 0) {
      var e = Math.getExponent(x)
      if (e == java.lang.Double.MIN_EXPONENT - 1)
        e = Math.getExponent(x * 9007199254740992.0) - 53
      math.max(e + 1, 1 - 1023)
    } else -1023
  }

  private def encodeBlockFloat(w: BitWriter, fblock: Array[Float]): Unit = {
    // block-floating-point: emax of |values|, scale by 2^(30 - emax)
    var fmax = 0f
    var i = 0
    while (i < 16) { val a = math.abs(fblock(i)); if (a > fmax) fmax = a; i += 1 }
    val emax = exponentF(fmax)
    val s = java.lang.Math.scalb(1f, 30 - emax)
    val inv = java.lang.Math.scalb(1f, emax - 30)
    val iblock = new Array[Int](16)
    var exact = true
    i = 0
    while (i < 16 && exact) {
      val v = (s * fblock(i)).toInt
      iblock(i) = v
      // compare BITS, not values: +0.0f == -0.0f under IEEE !=, which
      // would silently drop the sign of negative zero on decode — such
      // blocks must take the bit-preserving reinterpret fallback
      if (java.lang.Float.floatToRawIntBits(inv * v) !=
          java.lang.Float.floatToRawIntBits(fblock(i))) exact = false
      i += 1
    }
    if (exact) {
      val e = (emax + 127).toLong
      w.writeBits(2 * e + 1, 10) // flag bit (LSB) + 9-bit biased exponent
    } else {
      // reinterpret IEEE bits as sign-magnitude -> two's complement
      w.writeBit(0)
      i = 0
      while (i < 16) {
        var bits = java.lang.Float.floatToRawIntBits(fblock(i))
        if (bits < 0) bits ^= 0x7fffffff
        iblock(i) = bits
        i += 1
      }
    }
    fwdRevXform32(iblock)
    val ublock = new Array[Long](16)
    i = 0
    while (i < 16) { ublock(i) = int2uint32(iblock(Perm2(i))); i += 1 }
    encodeInts(w, ublock, 32)
  }

  private def decodeBlockFloat(r: BitReader, fblock: Array[Float]): Unit = {
    val converted = r.readBit() == 1
    val emax = if (converted) (r.readBits(9) - 127).toInt else 0
    val ublock = new Array[Long](16)
    decodeInts(r, ublock, 32)
    val iblock = new Array[Int](16)
    var i = 0
    while (i < 16) { iblock(Perm2(i)) = uint2int32(ublock(i)); i += 1 }
    invRevXform32(iblock)
    if (converted) {
      val inv = java.lang.Math.scalb(1f, emax - 30)
      i = 0
      while (i < 16) { fblock(i) = inv * iblock(i); i += 1 }
    } else {
      i = 0
      while (i < 16) {
        var bits = iblock(i)
        if (bits < 0) bits ^= 0x7fffffff
        fblock(i) = java.lang.Float.intBitsToFloat(bits)
        i += 1
      }
    }
  }

  private def encodeBlockDouble(w: BitWriter, fblock: Array[Double]): Unit = {
    var fmax = 0.0
    var i = 0
    while (i < 16) { val a = math.abs(fblock(i)); if (a > fmax) fmax = a; i += 1 }
    val emax = exponentD(fmax)
    val s = java.lang.Math.scalb(1.0, 62 - emax)
    val inv = java.lang.Math.scalb(1.0, emax - 62)
    val iblock = new Array[Long](16)
    var exact = true
    i = 0
    while (i < 16 && exact) {
      val v = (s * fblock(i)).toLong
      iblock(i) = v
      // bit compare, not !=: IEEE equality hides -0.0 (see float path)
      if (java.lang.Double.doubleToRawLongBits(inv * v) !=
          java.lang.Double.doubleToRawLongBits(fblock(i))) exact = false
      i += 1
    }
    if (exact) {
      val e = (emax + 1023).toLong
      w.writeBits(2 * e + 1, 13) // flag bit + 12-bit biased exponent
    } else {
      w.writeBit(0)
      i = 0
      while (i < 16) {
        var bits = java.lang.Double.doubleToRawLongBits(fblock(i))
        if (bits < 0) bits ^= 0x7fffffffffffffffL
        iblock(i) = bits
        i += 1
      }
    }
    fwdRevXform64(iblock)
    val ublock = new Array[Long](16)
    i = 0
    while (i < 16) { ublock(i) = int2uint64(iblock(Perm2(i))); i += 1 }
    encodeInts(w, ublock, 64)
  }

  private def decodeBlockDouble(r: BitReader, fblock: Array[Double]): Unit = {
    val converted = r.readBit() == 1
    val emax = if (converted) (r.readBits(12) - 1023).toInt else 0
    val ublock = new Array[Long](16)
    decodeInts(r, ublock, 64)
    val iblock = new Array[Long](16)
    var i = 0
    while (i < 16) { iblock(Perm2(i)) = uint2int64(ublock(i)); i += 1 }
    invRevXform64(iblock)
    if (converted) {
      val inv = java.lang.Math.scalb(1.0, emax - 62)
      i = 0
      while (i < 16) { fblock(i) = inv * iblock(i); i += 1 }
    } else {
      i = 0
      while (i < 16) {
        var bits = iblock(i)
        if (bits < 0) bits ^= 0x7fffffffffffffffL
        fblock(i) = java.lang.Double.longBitsToDouble(bits)
        i += 1
      }
    }
  }

  def compressFloat(data: Array[Float], nx: Int, ny: Int): Array[Byte] = {
    require(data.length == nx * ny, "zfp: data length != nx*ny")
    val w = new BitWriter
    writeHeader(w, TypeFloat, nx, ny)
    val block = new Array[Float](16)
    var by = 0
    while (by < ny) {
      var bx = 0
      while (bx < nx) {
        val mx = math.min(4, nx - bx)
        val my = math.min(4, ny - by)
        var j = 0
        while (j < my) {
          var i = 0
          while (i < mx) {
            block(4 * j + i) = data((by + j) * nx + (bx + i))
            i += 1
          }
          padBlockF(block, 4 * j, mx, 1)
          j += 1
        }
        var i = 0
        while (i < 4) { padBlockF(block, i, my, 4); i += 1 }
        encodeBlockFloat(w, block)
        bx += 4
      }
      by += 4
    }
    w.toBytes
  }

  def compressDouble(data: Array[Double], nx: Int, ny: Int): Array[Byte] = {
    require(data.length == nx * ny, "zfp: data length != nx*ny")
    val w = new BitWriter
    writeHeader(w, TypeDouble, nx, ny)
    val block = new Array[Double](16)
    var by = 0
    while (by < ny) {
      var bx = 0
      while (bx < nx) {
        val mx = math.min(4, nx - bx)
        val my = math.min(4, ny - by)
        var j = 0
        while (j < my) {
          var i = 0
          while (i < mx) {
            block(4 * j + i) = data((by + j) * nx + (bx + i))
            i += 1
          }
          padBlockD(block, 4 * j, mx, 1)
          j += 1
        }
        var i = 0
        while (i < 4) { padBlockD(block, i, my, 4); i += 1 }
        encodeBlockDouble(w, block)
        bx += 4
      }
      by += 4
    }
    w.toBytes
  }

  private def padBlockF(b: Array[Float], o: Int, filled: Int, s: Int): Unit =
    filled match {
      case 0 => b(o) = 0; b(o + s) = b(o); b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 1 => b(o + s) = b(o); b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 2 => b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 3 => b(o + 3 * s) = b(o)
      case _ =>
    }

  private def padBlockD(b: Array[Double], o: Int, filled: Int, s: Int): Unit =
    filled match {
      case 0 => b(o) = 0; b(o + s) = b(o); b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 1 => b(o + s) = b(o); b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 2 => b(o + 2 * s) = b(o + s); b(o + 3 * s) = b(o)
      case 3 => b(o + 3 * s) = b(o)
      case _ =>
    }

  // ----------------------------------------------- int16 (promotion)

  /** Reference int16 path: promote `<<15` to int32, compress as int32
    * (`zfp_compressor.cpp:107-123`). */
  def compressInt16(data: Array[Short], nx: Int, ny: Int): Array[Byte] = {
    val promoted = new Array[Int](data.length)
    var i = 0
    while (i < data.length) { promoted(i) = data(i).toInt << 15; i += 1 }
    compressInt32(promoted, nx, ny)
  }

  // ------------------------------------- fixed-accuracy (lossy) mode

  /** zfp's `precision()`: per-block bit planes kept in accuracy mode.
    * The 2*(dims+1) slack (6 for 2D) absorbs transform gain so the
    * truncation error stays ~2^minexp <= tolerance. */
  private def precisionFor(emax: Int, intprec: Int, minexp: Int): Int =
    math.min(intprec, math.max(0, emax - minexp + 6))

  private def encodeBlockFloatLossy(w: BitWriter, fblock: Array[Float],
      minexp: Int): Unit = {
    var fmax = 0f
    var i = 0
    while (i < 16) { val a = math.abs(fblock(i)); if (a > fmax) fmax = a; i += 1 }
    val emax = exponentF(fmax)
    val maxprec = precisionFor(emax, 32, minexp)
    if (fmax == 0f || maxprec == 0) { w.writeBit(0); return } // zero block
    val e = (emax + 127).toLong
    w.writeBits(2 * e + 1, 10) // nonzero flag (LSB) + 9-bit biased exponent
    val s = java.lang.Math.scalb(1f, 30 - emax)
    val iblock = new Array[Int](16)
    i = 0
    while (i < 16) { iblock(i) = (s * fblock(i)).toInt; i += 1 }
    fwdRevXform32(iblock)
    val ublock = new Array[Long](16)
    i = 0
    while (i < 16) { ublock(i) = int2uint32(iblock(Perm2(i))); i += 1 }
    encodeInts(w, ublock, 32, 32 - maxprec)
  }

  private def decodeBlockFloatLossy(r: BitReader, fblock: Array[Float],
      minexp: Int): Unit = {
    if (r.readBit() == 0) { java.util.Arrays.fill(fblock, 0f); return }
    val emax = (r.readBits(9) - 127).toInt
    val maxprec = precisionFor(emax, 32, minexp)
    val ublock = new Array[Long](16)
    decodeInts(r, ublock, 32, 32 - maxprec)
    val iblock = new Array[Int](16)
    var i = 0
    while (i < 16) { iblock(Perm2(i)) = uint2int32(ublock(i)); i += 1 }
    invRevXform32(iblock)
    val inv = java.lang.Math.scalb(1f, emax - 30)
    i = 0
    while (i < 16) { fblock(i) = inv * iblock(i); i += 1 }
  }

  private def encodeBlockDoubleLossy(w: BitWriter, fblock: Array[Double],
      minexp: Int): Unit = {
    var fmax = 0.0
    var i = 0
    while (i < 16) { val a = math.abs(fblock(i)); if (a > fmax) fmax = a; i += 1 }
    val emax = exponentD(fmax)
    val maxprec = precisionFor(emax, 64, minexp)
    if (fmax == 0.0 || maxprec == 0) { w.writeBit(0); return } // zero block
    val e = (emax + 1023).toLong
    w.writeBits(2 * e + 1, 13) // nonzero flag (LSB) + 12-bit biased exponent
    val s = java.lang.Math.scalb(1.0, 62 - emax)
    val iblock = new Array[Long](16)
    i = 0
    while (i < 16) { iblock(i) = (s * fblock(i)).toLong; i += 1 }
    fwdRevXform64(iblock)
    val ublock = new Array[Long](16)
    i = 0
    while (i < 16) { ublock(i) = int2uint64(iblock(Perm2(i))); i += 1 }
    encodeInts(w, ublock, 64, 64 - maxprec)
  }

  private def decodeBlockDoubleLossy(r: BitReader, fblock: Array[Double],
      minexp: Int): Unit = {
    if (r.readBit() == 0) { java.util.Arrays.fill(fblock, 0.0); return }
    val emax = (r.readBits(12) - 1023).toInt
    val maxprec = precisionFor(emax, 64, minexp)
    val ublock = new Array[Long](16)
    decodeInts(r, ublock, 64, 64 - maxprec)
    val iblock = new Array[Long](16)
    var i = 0
    while (i < 16) { iblock(Perm2(i)) = uint2int64(ublock(i)); i += 1 }
    invRevXform64(iblock)
    val inv = java.lang.Math.scalb(1.0, emax - 62)
    i = 0
    while (i < 16) { fblock(i) = inv * iblock(i); i += 1 }
  }

  // ------------------- standard-layout (libzfp) fixed-accuracy coders
  //
  // The graft lossy coders above keep the reversible transform and the
  // trailing-zero elision (strictly tighter reconstruction; integer
  // fields round-trip exactly). The *Std coders below implement the
  // STANDARD zfp accuracy layout instead — non-orthogonal lifting
  // transform, block-floating-point header of (2*(emax+EBIAS)+1) in
  // EBITS+1 bits (9 for float, 12 for double), and the plain embedded
  // plane coder with no prefix field — the bit layout a genuine libzfp
  // writer produces, reconstructed from the published format. No libzfp
  // binary exists in this sandbox to cross-validate bytes against; the
  // layout is spec-derived, pinned by round-trip + error-bound specs
  // and by the hand-derived golden bitstreams in ZfpGoldenSpec.

  private def encodeBlockFloatStd(w: BitWriter, fblock: Array[Float],
      minexp: Int): Unit = {
    var fmax = 0f
    var i = 0
    while (i < 16) { val a = math.abs(fblock(i)); if (a > fmax) fmax = a; i += 1 }
    val emax = exponentF(fmax)
    val maxprec = precisionFor(emax, 32, minexp)
    val e = if (maxprec > 0) (emax + 127).toLong else 0L
    if (e == 0L) { w.writeBit(0); return } // zero block (fmax == 0)
    w.writeBits(2 * e + 1, 9) // flag LSB + 8-bit biased exponent (EBITS+1)
    val s = java.lang.Math.scalb(1f, 30 - emax)
    val iblock = new Array[Int](16)
    i = 0
    while (i < 16) { iblock(i) = (s * fblock(i)).toInt; i += 1 }
    fwdStdXform32(iblock)
    val ublock = new Array[Long](16)
    i = 0
    while (i < 16) { ublock(i) = int2uint32(iblock(Perm2(i))); i += 1 }
    codePlanes(w, ublock, 32, 32 - maxprec)
  }

  private def decodeBlockFloatStd(r: BitReader, fblock: Array[Float],
      minexp: Int): Unit = {
    if (r.readBit() == 0) { java.util.Arrays.fill(fblock, 0f); return }
    val emax = (r.readBits(8) - 127).toInt
    val maxprec = precisionFor(emax, 32, minexp)
    val ublock = new Array[Long](16)
    decodePlanes(r, ublock, 32, math.max(0, 32 - maxprec))
    val iblock = new Array[Int](16)
    var i = 0
    while (i < 16) { iblock(Perm2(i)) = uint2int32(ublock(i)); i += 1 }
    invStdXform32(iblock)
    val inv = java.lang.Math.scalb(1f, emax - 30)
    i = 0
    while (i < 16) { fblock(i) = inv * iblock(i); i += 1 }
  }

  private def encodeBlockDoubleStd(w: BitWriter, fblock: Array[Double],
      minexp: Int): Unit = {
    var fmax = 0.0
    var i = 0
    while (i < 16) { val a = math.abs(fblock(i)); if (a > fmax) fmax = a; i += 1 }
    val emax = exponentD(fmax)
    val maxprec = precisionFor(emax, 64, minexp)
    val e = if (maxprec > 0) (emax + 1023).toLong else 0L
    if (e == 0L) { w.writeBit(0); return } // zero block (fmax == 0)
    w.writeBits(2 * e + 1, 12) // flag LSB + 11-bit biased exponent
    val s = java.lang.Math.scalb(1.0, 62 - emax)
    val iblock = new Array[Long](16)
    i = 0
    while (i < 16) { iblock(i) = (s * fblock(i)).toLong; i += 1 }
    fwdStdXform64(iblock)
    val ublock = new Array[Long](16)
    i = 0
    while (i < 16) { ublock(i) = int2uint64(iblock(Perm2(i))); i += 1 }
    codePlanes(w, ublock, 64, 64 - maxprec)
  }

  private def decodeBlockDoubleStd(r: BitReader, fblock: Array[Double],
      minexp: Int): Unit = {
    if (r.readBit() == 0) { java.util.Arrays.fill(fblock, 0.0); return }
    val emax = (r.readBits(11) - 1023).toInt
    val maxprec = precisionFor(emax, 64, minexp)
    val ublock = new Array[Long](16)
    decodePlanes(r, ublock, 64, math.max(0, 64 - maxprec))
    val iblock = new Array[Long](16)
    var i = 0
    while (i < 16) { iblock(Perm2(i)) = uint2int64(ublock(i)); i += 1 }
    invStdXform64(iblock)
    val inv = java.lang.Math.scalb(1.0, emax - 62)
    i = 0
    while (i < 16) { fblock(i) = inv * iblock(i); i += 1 }
  }

  /** Standard accuracy-mode integer block: full-precision planes (zfp's
    * tolerance knob applies to floating point only), but through the
    * rounding non-orthogonal transform — so unlike the graft coder,
    * integers reconstruct only to within the transform's few-unit
    * rounding, exactly as libzfp behaves. */
  private def encodeBlockInt32Std(w: BitWriter, block: Array[Int]): Unit = {
    fwdStdXform32(block)
    val ublock = new Array[Long](16)
    var i = 0
    while (i < 16) { ublock(i) = int2uint32(block(Perm2(i))); i += 1 }
    codePlanes(w, ublock, 32, 0)
  }

  private def decodeBlockInt32Std(r: BitReader, block: Array[Int]): Unit = {
    val ublock = new Array[Long](16)
    decodePlanes(r, ublock, 32, 0)
    var i = 0
    while (i < 16) { block(Perm2(i)) = uint2int32(ublock(i)); i += 1 }
    invStdXform32(block)
  }

  /** Fixed-accuracy float compression: |error| <~ tolerance per value. */
  def compressFloatLossy(data: Array[Float], nx: Int, ny: Int,
      tolerance: Double): Array[Byte] = {
    require(data.length == nx * ny, "zfp: data length != nx*ny")
    val minexp = minexpForTolerance(tolerance)
    val w = new BitWriter
    writeHeader(w, TypeFloat, nx, ny, modeForMinexp(minexp))
    val block = new Array[Float](16)
    forEachBlock(nx, ny) { (bx, by, mx, my) =>
      var j = 0
      while (j < my) {
        var i = 0
        while (i < mx) {
          block(4 * j + i) = data((by + j) * nx + (bx + i))
          i += 1
        }
        padBlockF(block, 4 * j, mx, 1)
        j += 1
      }
      var i = 0
      while (i < 4) { padBlockF(block, i, my, 4); i += 1 }
      encodeBlockFloatLossy(w, block, minexp)
    }
    w.toBytes
  }

  /** Fixed-accuracy double compression: |error| <~ tolerance per value. */
  def compressDoubleLossy(data: Array[Double], nx: Int, ny: Int,
      tolerance: Double): Array[Byte] = {
    require(data.length == nx * ny, "zfp: data length != nx*ny")
    val minexp = minexpForTolerance(tolerance)
    val w = new BitWriter
    writeHeader(w, TypeDouble, nx, ny, modeForMinexp(minexp))
    val block = new Array[Double](16)
    forEachBlock(nx, ny) { (bx, by, mx, my) =>
      var j = 0
      while (j < my) {
        var i = 0
        while (i < mx) {
          block(4 * j + i) = data((by + j) * nx + (bx + i))
          i += 1
        }
        padBlockD(block, 4 * j, mx, 1)
        j += 1
      }
      var i = 0
      while (i < 4) { padBlockD(block, i, my, 4); i += 1 }
      encodeBlockDoubleLossy(w, block, minexp)
    }
    w.toBytes
  }

  /** Fixed-accuracy int32: zfp ignores minexp for integer fields (the
    * tolerance knob applies to floating point only), so the payload
    * codes every plane and round-trips exactly — only the header mode
    * differs from reversible. */
  def compressInt32Lossy(data: Array[Int], nx: Int, ny: Int,
      tolerance: Double): Array[Byte] = {
    require(data.length == nx * ny, "zfp: data length != nx*ny")
    val w = new BitWriter
    writeHeader(w, TypeInt32, nx, ny,
      modeForMinexp(minexpForTolerance(tolerance)))
    val block = new Array[Int](16)
    forEachBlock(nx, ny) { (bx, by, mx, my) =>
      var j = 0
      while (j < my) {
        var i = 0
        while (i < mx) {
          block(4 * j + i) = data((by + j) * nx + (bx + i))
          i += 1
        }
        padBlock32(block, 4 * j, mx, 1)
        j += 1
      }
      var i = 0
      while (i < 4) { padBlock32(block, i, my, 4); i += 1 }
      encodeBlockInt32(w, block)
    }
    w.toBytes
  }

  /** Fixed-accuracy int16: promote `<<15`, compress as int32
    * (`zfp_compressor.cpp:107-123` — same promotion as lossless). */
  def compressInt16Lossy(data: Array[Short], nx: Int, ny: Int,
      tolerance: Double): Array[Byte] = {
    val promoted = new Array[Int](data.length)
    var i = 0
    while (i < data.length) { promoted(i) = data(i).toInt << 15; i += 1 }
    compressInt32Lossy(promoted, nx, ny, tolerance)
  }

  /** Fixed-accuracy compression in the STANDARD libzfp bit layout (plain
    * version byte, non-orthogonal transform, plain plane coder). Use
    * when the stream must be readable by other zfp implementations;
    * [[decompress]] reads it back through the same standard path any
    * unmarked accuracy stream takes. |error| <= tolerance per value for
    * finite inputs (zfp's accuracy guarantee); NaN/Inf are unsupported
    * in this mode, as in libzfp. */
  def compressFloatLossyStd(data: Array[Float], nx: Int, ny: Int,
      tolerance: Double): Array[Byte] = {
    require(data.length == nx * ny, "zfp: data length != nx*ny")
    val minexp = minexpForTolerance(tolerance)
    val w = new BitWriter
    writeHeader(w, TypeFloat, nx, ny, modeForMinexp(minexp),
      graftMarked = false)
    val block = new Array[Float](16)
    forEachBlock(nx, ny) { (bx, by, mx, my) =>
      var j = 0
      while (j < my) {
        var i = 0
        while (i < mx) {
          block(4 * j + i) = data((by + j) * nx + (bx + i))
          i += 1
        }
        padBlockF(block, 4 * j, mx, 1)
        j += 1
      }
      var i = 0
      while (i < 4) { padBlockF(block, i, my, 4); i += 1 }
      encodeBlockFloatStd(w, block, minexp)
    }
    w.toBytes
  }

  /** [[compressFloatLossyStd]] for doubles. */
  def compressDoubleLossyStd(data: Array[Double], nx: Int, ny: Int,
      tolerance: Double): Array[Byte] = {
    require(data.length == nx * ny, "zfp: data length != nx*ny")
    val minexp = minexpForTolerance(tolerance)
    val w = new BitWriter
    writeHeader(w, TypeDouble, nx, ny, modeForMinexp(minexp),
      graftMarked = false)
    val block = new Array[Double](16)
    forEachBlock(nx, ny) { (bx, by, mx, my) =>
      var j = 0
      while (j < my) {
        var i = 0
        while (i < mx) {
          block(4 * j + i) = data((by + j) * nx + (bx + i))
          i += 1
        }
        padBlockD(block, 4 * j, mx, 1)
        j += 1
      }
      var i = 0
      while (i < 4) { padBlockD(block, i, my, 4); i += 1 }
      encodeBlockDoubleStd(w, block, minexp)
    }
    w.toBytes
  }

  /** Standard-layout fixed-accuracy int32: all planes coded (tolerance
    * applies to floats only in zfp), values reconstruct to within the
    * non-orthogonal transform's rounding — NOT exactly, matching libzfp.
    * zfp's 2D int32 codec requires |value| < 2^30 to avoid transform
    * overflow (zfp docs, "limitations"); enforced loudly here. */
  def compressInt32LossyStd(data: Array[Int], nx: Int, ny: Int,
      tolerance: Double): Array[Byte] = {
    require(data.length == nx * ny, "zfp: data length != nx*ny")
    var i = 0
    while (i < data.length) {
      require(data(i) >= -(1 << 30) && data(i) < (1 << 30),
        s"zfp std accuracy int32: value must be in [-2^30, 2^30), got " +
          s"${data(i)}") // -2^30 inclusive: Short.MinValue << 15
      i += 1
    }
    val w = new BitWriter
    writeHeader(w, TypeInt32, nx, ny,
      modeForMinexp(minexpForTolerance(tolerance)), graftMarked = false)
    val block = new Array[Int](16)
    forEachBlock(nx, ny) { (bx, by, mx, my) =>
      var j = 0
      while (j < my) {
        var k = 0
        while (k < mx) {
          block(4 * j + k) = data((by + j) * nx + (bx + k))
          k += 1
        }
        padBlock32(block, 4 * j, mx, 1)
        j += 1
      }
      var k = 0
      while (k < 4) { padBlock32(block, k, my, 4); k += 1 }
      encodeBlockInt32Std(w, block)
    }
    w.toBytes
  }

  /** Standard-layout fixed-accuracy int16: the reference's `<<15`
    * promotion, then [[compressInt32LossyStd]] — magnitudes stay below
    * 2^30 by construction. Reconstruction is within ±1 int16 unit (the
    * transform's few-unit rounding at the promoted scale, >> 15). */
  def compressInt16LossyStd(data: Array[Short], nx: Int, ny: Int,
      tolerance: Double): Array[Byte] = {
    val promoted = new Array[Int](data.length)
    var i = 0
    while (i < data.length) { promoted(i) = data(i).toInt << 15; i += 1 }
    compressInt32LossyStd(promoted, nx, ny, tolerance)
  }

  // ------------------------------------------------------ decompress

  sealed trait Decoded { def nx: Int; def ny: Int }
  final case class DecodedInt32(nx: Int, ny: Int, data: Array[Int]) extends Decoded
  final case class DecodedFloat(nx: Int, ny: Int, data: Array[Float]) extends Decoded
  final case class DecodedDouble(nx: Int, ny: Int, data: Array[Double]) extends Decoded

  /** Decompress a full-header 2D blob — reversible (lossless) or
    * fixed-accuracy (lossy) mode; expert/long modes are rejected.
    * Trailing bytes beyond the payload are ignored.
    *
    * Accuracy streams dispatch on provenance: the graft [[LossyMarker]]
    * selects the graft-enhanced payload decode; an unmarked accuracy
    * stream decodes through the STANDARD libzfp layout — so a genuine
    * libzfp-written fixed-accuracy blob (the reference engine's
    * `zfp_stream_set_accuracy` output, `zfp_compressor.cpp:93-134`)
    * is read directly. */
  def decompress(blob: Array[Byte]): Decoded =
    decompress(blob, acceptUnmarkedLossy = false)

  /** [[decompress]] for LEGACY graft fixed-accuracy streams written
    * before the version-byte lossy marker. Such streams carry the graft
    * payload under a plain version byte — header-indistinguishable from
    * libzfp, so the default decode would read them as standard-layout
    * garbage. Only call this when the stream's provenance is known to
    * be a pre-marker graft writer (see [[readHeader]]).
    */
  def decompressLegacyLossy(blob: Array[Byte]): Decoded =
    decompress(blob, acceptUnmarkedLossy = true)

  private def decompress(blob: Array[Byte],
      acceptUnmarkedLossy: Boolean): Decoded = {
    val r = new BitReader(blob)
    val h = readHeader(r, acceptUnmarkedLossy)
    require(h.reversible || h.accuracy,
      s"zfp: unsupported mode ${h.mode} (reversible and fixed-accuracy " +
        "short modes only; expert mode is not supported)")
    // dims are file-controlled 24-bit fields: nx*ny can overflow Int
    // (hostile allocation size), and a tiny blob claiming millions of
    // blocks would decode garbage from the zero-padded tail — reject
    // both before allocating. Every genuine block costs >= 1 payload
    // bit (the zero-block flag), so blocks <= payload bits. The
    // MaxDecodedValues ceiling bounds the remaining ~1000x legal
    // amplification (all-zero blocks: 1 bit -> 16 doubles): without it
    // a ~17 MB blob could demand a 17 GB output array and kill the
    // process with OutOfMemoryError instead of a catchable diagnosis.
    // 2^28 values (2 GiB of doubles) is far above any transport batch
    // (the reference writes numCols x batchRows fields).
    require(h.nx.toLong * h.ny <= MaxDecodedValues,
      s"zfp: field dimensions ${h.nx} x ${h.ny} exceed the " +
        s"$MaxDecodedValues-value decode ceiling")
    val blocksL = ((h.nx + 3L) / 4) * ((h.ny + 3L) / 4)
    require(blocksL <= blob.length.toLong * 8,
      s"zfp: header claims $blocksL blocks, stream holds only " +
        s"${blob.length} bytes")
    val std = h.accuracy && !h.graftLossy // standard libzfp payload layout
    h.tpe match {
      case TypeInt32 =>
        DecodedInt32(h.nx, h.ny, decodeInt32Payload(r, h.nx, h.ny, std))
      case TypeFloat =>
        val out = new Array[Float](h.nx * h.ny)
        val block = new Array[Float](16)
        forEachBlock(h.nx, h.ny) { (bx, by, mx, my) =>
          if (h.reversible) decodeBlockFloat(r, block)
          else if (std) decodeBlockFloatStd(r, block, h.minexp)
          else decodeBlockFloatLossy(r, block, h.minexp)
          var j = 0
          while (j < my) {
            var i = 0
            while (i < mx) {
              out((by + j) * h.nx + (bx + i)) = block(4 * j + i)
              i += 1
            }
            j += 1
          }
        }
        DecodedFloat(h.nx, h.ny, out)
      case TypeDouble =>
        val out = new Array[Double](h.nx * h.ny)
        val block = new Array[Double](16)
        forEachBlock(h.nx, h.ny) { (bx, by, mx, my) =>
          if (h.reversible) decodeBlockDouble(r, block)
          else if (std) decodeBlockDoubleStd(r, block, h.minexp)
          else decodeBlockDoubleLossy(r, block, h.minexp)
          var j = 0
          while (j < my) {
            var i = 0
            while (i < mx) {
              out((by + j) * h.nx + (bx + i)) = block(4 * j + i)
              i += 1
            }
            j += 1
          }
        }
        DecodedDouble(h.nx, h.ny, out)
      case t => throw new IllegalArgumentException(
        s"zfp: unsupported field type code $t (int64 fields are not " +
          "written by the reference engine)")
    }
  }

  /** Reference int16 path: decompress as int32, demote `>>15` with
    * clamping (`zfp_compressor.cpp:155-167`). */
  def decompressInt16(blob: Array[Byte]): (Int, Int, Array[Short]) = {
    val d = decompress(blob) match {
      case i: DecodedInt32 => i
      case other => throw new IllegalArgumentException(
        s"zfp: int16 stream must decode as int32, got $other")
    }
    val out = new Array[Short](d.data.length)
    var i = 0
    while (i < out.length) {
      val v = d.data(i) >> 15
      out(i) = math.max(-0x8000, math.min(v, 0x7fff)).toShort
      i += 1
    }
    (d.nx, d.ny, out)
  }

  private def forEachBlock(nx: Int, ny: Int)(
      f: (Int, Int, Int, Int) => Unit): Unit = {
    var by = 0
    while (by < ny) {
      var bx = 0
      while (bx < nx) {
        f(bx, by, math.min(4, nx - bx), math.min(4, ny - by))
        bx += 4
      }
      by += 4
    }
  }
}
