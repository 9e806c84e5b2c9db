package graft.operators

import java.util.regex.{Matcher, Pattern}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck layer over the BPE merge-application trick in
  * [[TextOps.bpeLearn]]: symbols wrapped in their OWN spaces make a
  * literal non-overlapping left-to-right replace (what `regexp_replace`
  * with a quoted pattern executes per row) EXACTLY greedy BPE. The
  * reference implementation is the one-pass fold over the symbol list:
  * merge when the accumulator ends with the unconsumed left symbol and
  * the next symbol is the right one. Seeded, so failures reproduce.
  */
class BpePropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(500)
    .withInitialSeed(Seed(20260814L))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  // multi-char symbols included: after round 1 every real sequence has
  // them, and they are where naive separator schemes break (a symbol
  // ending with another symbol's spelling, e.g. "xx" vs "x")
  private val symGen: Gen[String] = Gen.oneOf("a", "b", "c", "x", "xx", "ab")
  private val seqGen: Gen[List[String]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, symGen))

  /** The production representation: every symbol wrapped in its own
    * spaces, exactly what bpeLearn's regexp_replace row expression sees. */
  private def wrapped(syms: List[String]): String =
    syms.map(s => s" $s ").mkString

  /** The production merge: literal, non-overlapping, left-to-right —
    * regexp_replace(sp, quote(" a  b "), " ab ") semantics. */
  private def mergeByReplace(syms: List[String], a: String, b: String)
      : List[String] = {
    val out = wrapped(syms).replaceAll(
      Pattern.quote(s" $a  $b "), Matcher.quoteReplacement(s" ${a + b} "))
    if (out.trim.isEmpty) Nil else out.trim.split("  ").toList
  }

  /** Reference greedy BPE: one left-to-right pass over the ORIGINAL
    * sequence; a merged token never re-merges in the same round (merged
    * = a+b can't equal a, so the accumulator's tail is `a` only when it
    * is an unconsumed original symbol). */
  private def mergeGreedy(syms: List[String], a: String, b: String)
      : List[String] =
    syms.foldLeft(List.empty[String]) { (acc, cur) =>
      if (acc.nonEmpty && acc.last == a && cur == b)
        acc.init :+ (a + b)
      else acc :+ cur
    }

  test("property: wrapped-symbol replace == greedy one-pass merge") {
    check(Prop.forAll(for {
      syms <- seqGen
      a <- symGen
      b <- symGen
    } yield (syms, a, b)) { case (syms, a, b) =>
      mergeByReplace(syms, a, b) == mergeGreedy(syms, a, b)
    })
  }

  test("property: merging never changes the concatenated word") {
    check(Prop.forAll(for {
      syms <- seqGen
      a <- symGen
      b <- symGen
    } yield (syms, a, b)) { case (syms, a, b) =>
      mergeByReplace(syms, a, b).mkString == syms.mkString
    })
  }

  test("property: merge count equals greedy non-overlapping occurrences") {
    // each merge shrinks the token count by exactly 1, so token-count
    // delta == number of sites the greedy scan chose
    check(Prop.forAll(for {
      syms <- seqGen
      a <- symGen
      b <- symGen
    } yield (syms, a, b)) { case (syms, a, b) =>
      val merged = mergeByReplace(syms, a, b)
      val sites = mergeGreedy(syms, a, b).count(_ == a + b) -
        syms.count(_ == a + b)
      syms.length - merged.length == sites
    })
  }
}
