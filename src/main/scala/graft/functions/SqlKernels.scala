package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static, codegen-callable wrappers over the pure [[TextKernels]] —
  * the bodies `StaticInvoke` binds into generated code when the
  * `graft_*` SQL functions registered by [[graft.GraftExtensions]] are
  * used from SQL text. Each method is a pure function of its arguments
  * (thread-local MessageDigest — MD5 instances are stateful and
  * codegen'd call sites run concurrently per task thread).
  *
  * These exist so a SQL-only consumer can reproduce the engine's
  * dedup-pipeline signatures (shingles, MinHash, SimHash) byte-for-byte
  * without the DataFrame facades — the same values
  * `queries.Dedup`'s oracles pin against DuckDB.
  */
object SqlKernels {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** 32-bit SimHash of whitespace tokens (TextKernels.simhashOf — the
    * d03 signature). */
  def simhash32(text: UTF8String): Long =
    TextKernels.simhashOf(md5.get(), text.toString)

  /** Distinct word k-shingles in first-occurrence order
    * (TextKernels.shingleSet — the d02/d04/p07 shingle universe). */
  def shingles(text: UTF8String, k: Int): ArrayData = {
    require(k >= 1, s"graft_shingles: k must be >= 1, got $k")
    new GenericArrayData(TextKernels.shingleSet(text.toString, k)
      .map(s => UTF8String.fromString(s): AnyRef))
  }

  /** `nh` MinHash values (md5-hex minima, TextKernels.minhashSig) over
    * the text's k-shingles — the d02 signature columns. */
  def minhash(text: UTF8String, k: Int, nh: Int): ArrayData = {
    require(k >= 1, s"graft_minhash: k must be >= 1, got $k")
    require(nh >= 1 && nh <= 1024,
      s"graft_minhash: nh out of range [1, 1024]: $nh")
    val shs = TextKernels.shingleSet(text.toString, k)
    new GenericArrayData(TextKernels.minhashSig(md5.get(), shs, nh)
      .map(s => UTF8String.fromString(s): AnyRef))
  }
}
