package graft.bridge

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property layer over the fixture-based [[MatBridgeSpec]]:
  * the fixtures pin the published byte layout; these pin the ALGEBRA —
  * any dims × dtype × values (including NaN/Inf/extremes) survive a
  * write/read round trip bit-exactly, in any variable order. Seeded,
  * so failures reproduce.
  */
class MatFilePropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(60)
    .withInitialSeed(Seed(20260814L))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val dimsGen: Gen[(Int, Int)] = for {
    rows <- Gen.choose(0, 25)
    cols <- Gen.choose(if (rows == 0) 0 else 1, 7)
  } yield if (cols == 0) (0, 0) else (rows, cols)

  private def varGen(name: String): Gen[MatFile.MatVar] =
    dimsGen.flatMap { case (r, c) =>
      val n = r * c
      Gen.oneOf(
        Gen.containerOfN[Array, Double](n, Gen.oneOf(
          Gen.chooseNum(-1e300, 1e300), Gen.oneOf(
            Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
            -0.0, Double.MinPositiveValue)))
          .map(a => MatFile.MatVar(name, r, c, MatFile.Doubles(a))),
        Gen.containerOfN[Array, Float](n, Gen.chooseNum(-1e30f, 1e30f))
          .map(a => MatFile.MatVar(name, r, c, MatFile.Singles(a))),
        Gen.containerOfN[Array, Short](n,
            Gen.chooseNum(Short.MinValue, Short.MaxValue))
          .map(a => MatFile.MatVar(name, r, c, MatFile.Int16s(a))),
        Gen.containerOfN[Array, Int](n,
            Gen.chooseNum(Int.MinValue, Int.MaxValue))
          .map(a => MatFile.MatVar(name, r, c, MatFile.Int32s(a))),
        Gen.containerOfN[Array, Long](n,
            Gen.chooseNum(Long.MinValue, Long.MaxValue))
          .map(a => MatFile.MatVar(name, r, c, MatFile.Int64s(a))))
    }

  private def sameBits(a: MatFile.MatData, b: MatFile.MatData): Boolean =
    (a, b) match {
      case (MatFile.Doubles(x), MatFile.Doubles(y)) =>
        x.length == y.length && x.indices.forall(i =>
          java.lang.Double.doubleToRawLongBits(x(i)) ==
            java.lang.Double.doubleToRawLongBits(y(i)))
      case (MatFile.Singles(x), MatFile.Singles(y)) =>
        x.length == y.length && x.indices.forall(i =>
          java.lang.Float.floatToRawIntBits(x(i)) ==
            java.lang.Float.floatToRawIntBits(y(i)))
      case (MatFile.Int16s(x), MatFile.Int16s(y)) => x.sameElements(y)
      case (MatFile.Int32s(x), MatFile.Int32s(y)) => x.sameElements(y)
      case (MatFile.Int64s(x), MatFile.Int64s(y)) => x.sameElements(y)
      case _ => false
    }

  test("property: any variable set round-trips bit-exactly, in order") {
    val varsGen = Gen.choose(1, 5).flatMap { k =>
      Gen.sequence[Seq[MatFile.MatVar], MatFile.MatVar](
        (0 until k).map(i => varGen(s"v$i")))
    }
    check(Prop.forAll(varsGen) { vars =>
      val p = Files.createTempFile("graft-matp-", ".mat")
      try {
        MatFile.write(p, vars)
        val back = MatFile.read(p)
        back.size == vars.size && back.zip(vars).forall { case (b, v) =>
          b.name == v.name && b.rows == v.rows && b.cols == v.cols &&
            sameBits(b.data, v.data)
        }
      } finally Files.deleteIfExists(p)
    })
  }

  test("property: truncating a valid file anywhere fails loudly, " +
      "never hangs or misparses") {
    val fileGen = for {
      v <- varGen("x")
      cut <- Gen.choose(0.0, 1.0)
    } yield (v, cut)
    check(Prop.forAll(fileGen) { case (v, cutFrac) =>
      val p = Files.createTempFile("graft-matt-", ".mat")
      try {
        MatFile.write(p, Seq(v))
        val bytes = Files.readAllBytes(p)
        val cut = (bytes.length * cutFrac).toInt
        Files.write(p, java.util.Arrays.copyOf(bytes, cut))
        try {
          // a cut landing exactly on an element boundary parses the
          // prefix (legal file); any other cut must throw a diagnosis
          MatFile.read(p)
          true
        } catch {
          case _: IllegalArgumentException => true
          case _: java.nio.BufferUnderflowException => true
          case _: Throwable => false // OOM/NegativeArraySize/hang = bug
        }
      } finally Files.deleteIfExists(p)
    })
  }
}
