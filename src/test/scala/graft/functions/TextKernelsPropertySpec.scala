package graft.functions

import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property layer over the compiled text kernels: the
  * hand-rolled while-loop implementations must agree with the obvious
  * declarative spellings on arbitrary inputs, and the MinHash signature
  * must be a pure function of the shingle SET (order-invariant) — the
  * algebraic fact the LSH band join relies on. Seeded, so failures
  * reproduce.
  */
class TextKernelsPropertySpec extends AnyFunSuite {

  private def md = MessageDigest.getInstance("MD5")

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(Seed(20260813L))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  // small alphabet so duplicate shingles actually occur
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 30)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "ee"))
  } yield ws.mkString(" ")

  /** The declarative spelling shingleSet's loops must agree with
    * (sliding k-window, first-occurrence order distinct). */
  private def naiveShingles(text: String, k: Int): Seq[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < k) Seq(ws.mkString(" "))
    else ws.sliding(k).map(_.mkString(" ")).toSeq.distinct
  }

  test("property: shingleSet equals the sliding-window distinct spelling") {
    check(Prop.forAll(for {
      t <- textGen
      k <- Gen.choose(1, 6)
    } yield (t, k)) { case (t, k) =>
      TextKernels.shingleSet(t, k).toSeq == naiveShingles(t, k)
    })
  }

  test("property: minhashSig is invariant under shingle order") {
    check(Prop.forAll(for {
      t <- textGen
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (t, seed)) { case (t, seed) =>
      val shs = TextKernels.shingleSet(t, 3)
      val shuffled = new scala.util.Random(seed).shuffle(shs.toSeq).toArray
      TextKernels.minhashSig(md, shs, 8).toSeq ==
        TextKernels.minhashSig(md, shuffled, 8).toSeq
    })
  }

  test("property: simhashOf is deterministic and 32-bit bounded") {
    check(Prop.forAll(textGen) { t =>
      val h1 = TextKernels.simhashOf(md, t)
      val h2 = TextKernels.simhashOf(md, t)
      h1 == h2 && h1 >= 0L && h1 <= 0xffffffffL
    })
  }

  test("property: positionalGramsOf equals the sliding-window spelling") {
    check(Prop.forAll(for {
      t <- textGen
      k <- Gen.choose(1, 6)
    } yield (t, k)) { case (t, k) =>
      val ws = t.split(" ", -1)
      val naive =
        if (ws.length < k) Seq.empty[String]
        else ws.sliding(k).map(_.mkString(" ")).toSeq
      TextKernels.positionalGramsOf(t, k).toSeq == naive
    })
  }

  test("property: distinct positional grams == shingleSet above k words") {
    // the two kernels must agree on what a k-gram IS — d09's positional
    // pass and the minhash shingle pass share one definition
    check(Prop.forAll(for {
      t <- textGen
      k <- Gen.choose(1, 6)
    } yield (t, k)) { case (t, k) =>
      val ws = t.split(" ", -1)
      if (ws.length < k) true // shingleSet falls back to whole text
      else TextKernels.positionalGramsOf(t, k).toSeq.distinct ==
        TextKernels.shingleSet(t, k).toSeq
    })
  }

  test("property: gram count and reconstruction invariants") {
    check(Prop.forAll(for {
      t <- textGen
      k <- Gen.choose(1, 6)
    } yield (t, k)) { case (t, k) =>
      val ws = t.split(" ", -1)
      val gs = TextKernels.positionalGramsOf(t, k).toVector
      val countOk =
        gs.length == (if (ws.length < k) 0 else ws.length - k + 1)
      // gram i starts with word i — joining first words + last gram's
      // tail reconstructs the document
      val reconOk = gs.isEmpty ||
        (gs.dropRight(1).map(_.takeWhile(_ != ' ').mkString)
          :+ gs.last).mkString(" ") == t
      countOk && reconOk
    })
  }
}
