package graft.functions

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function checks of the compiled text kernels against their
  * declared semantics (the SQL-oracle expressions in queries.Dedup):
  * distinct word k-grams with a short-text fallback, min-md5 MinHash,
  * nibble-bit SimHash voting.
  */
class TextKernelsSpec extends AnyFunSuite {

  private def md = MessageDigest.getInstance("MD5")

  test("shingleSet produces ordered distinct k-grams") {
    val shs = TextKernels.shingleSet("a b c a b c", 3)
    assert(shs.toSeq == Seq("a b c", "b c a", "c a b"))
  }

  test("shingleSet falls back to whole text when shorter than k") {
    assert(TextKernels.shingleSet("x y", 5).toSeq == Seq("x y"))
    assert(TextKernels.shingleSet("", 5).toSeq == Seq(""))
  }

  test("md5Hex matches RFC 1321 vectors and resets between calls") {
    val m = md
    assert(TextKernels.md5Hex(m, "abc") ==
      "900150983cd24fb0d6963f7d28e17f72")
    assert(TextKernels.md5Hex(m, "") ==
      "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("minhashSig takes the lexicographic min per hash function") {
    val shs = TextKernels.shingleSet("w1 w2 w3 w4 w5 w6", 5)
    assert(shs.length == 2)
    val sig = TextKernels.minhashSig(md, shs, 3)
    val m = md
    for (i <- 0 until 3) {
      val expected = shs.map(sh => TextKernels.md5Hex(m, s"$i:" + sh)).min
      assert(sig(i) == expected, s"hash fn $i")
    }
  }

  test("minhash identical docs collide, disjoint docs don't") {
    val a = TextKernels.minhashSig(md, TextKernels.shingleSet("p q r s t u v", 5), 8)
    val b = TextKernels.minhashSig(md, TextKernels.shingleSet("p q r s t u v", 5), 8)
    val c = TextKernels.minhashSig(md, TextKernels.shingleSet("z y x w v u t", 5), 8)
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
  }

  test("simhashOf matches the nibble-bit SQL spelling for one token") {
    // md5("abc") = 900150983cd2... -> nibbles 9,0,0,1,5,0,9,8; with a
    // single token, simhash bit b = (nib(b/4) >> (b%4)) & 1.
    val h = "90015098"
    var expected = 0L
    for (b <- 0 until 32) {
      val nib = Character.digit(h.charAt(b / 4), 16)
      if (((nib >> (b % 4)) & 1) == 1) expected |= (1L << b)
    }
    assert(TextKernels.simhashOf(md, "abc") == expected)
  }

  test("simhash of similar texts is closer than of disjoint texts") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = base.replace("dog", "cat")
    val far = "completely different words in every single position here now"
    val m = md
    val hBase = TextKernels.simhashOf(m, base)
    assert(hamming(hBase, TextKernels.simhashOf(m, near)) <
      hamming(hBase, TextKernels.simhashOf(m, far)))
  }
}
