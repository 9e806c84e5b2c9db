package graft.core

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property layer over the transport core: ANY schema (all
  * seven reference types), ANY row count, ANY write batching, and ANY
  * segment-rollover cadence must round-trip bit-exactly with gapless
  * indices through write → tombstone chain → read, and the schema JSON
  * wire format must survive adversarial field names. The fixture suite
  * (StreamStoreSpec) pins the reference shapes; this pins the algebra.
  * Seeded, so failures reproduce.
  */
class StreamStorePropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(40) // each case builds an on-disk store
    .withInitialSeed(Seed(20260813L))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  // ---------------------------------------------------------- generators

  private val scalarTypeGen: Gen[RiverType] = Gen.oneOf(
    Gen.const(RiverType.Double64), Gen.const(RiverType.Float32),
    Gen.const(RiverType.Int16), Gen.const(RiverType.Int32),
    Gen.const(RiverType.Int64),
    Gen.choose(1, 9).map(RiverType.FixedWidthBytes))

  private val schemaGen: Gen[RiverSchema] = for {
    n <- Gen.choose(1, 5)
    ts <- Gen.listOfN(n, scalarTypeGen)
  } yield RiverSchema(ts.zipWithIndex.map { case (t, i) =>
    RiverField(s"f$i", t)
  })

  private def valueGen(t: RiverType): Gen[Any] = t match {
    case RiverType.Double64 =>
      Gen.chooseNum(Long.MinValue, Long.MaxValue)
        .map(java.lang.Double.longBitsToDouble)
    case RiverType.Float32 =>
      Gen.chooseNum(Int.MinValue, Int.MaxValue)
        .map(java.lang.Float.intBitsToFloat)
    case RiverType.Int16 => Gen.chooseNum(Short.MinValue, Short.MaxValue)
    case RiverType.Int32 => Gen.chooseNum(Int.MinValue, Int.MaxValue)
    case RiverType.Int64 => Gen.chooseNum(Long.MinValue, Long.MaxValue)
    case RiverType.FixedWidthBytes(sz) =>
      Gen.containerOfN[Array, Byte](sz,
        Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    case RiverType.VariableWidthBytes(max) =>
      Gen.choose(0, max).flatMap(len =>
        Gen.containerOfN[Array, Byte](len,
          Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
  }

  private def rowGen(schema: RiverSchema): Gen[Seq[Any]] =
    Gen.sequence[Seq[Any], Any](schema.fields.map(f => valueGen(f.tpe)))

  /** Bit-exact value comparison (NaN payloads, -0.0, byte arrays). */
  private def sameValue(t: RiverType, a: Any, b: Any): Boolean = t match {
    case RiverType.Double64 =>
      java.lang.Double.doubleToRawLongBits(a.asInstanceOf[Double]) ==
        java.lang.Double.doubleToRawLongBits(b.asInstanceOf[Double])
    case RiverType.Float32 =>
      java.lang.Float.floatToRawIntBits(a.asInstanceOf[Float]) ==
        java.lang.Float.floatToRawIntBits(b.asInstanceOf[Float])
    case RiverType.FixedWidthBytes(_) | RiverType.VariableWidthBytes(_) =>
      java.util.Arrays.equals(
        a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case _ => a == b
  }

  // ---------------------------------------------------------- properties

  test("property: any schema/rows/batching/rollover round-trips exactly") {
    check(Prop.forAll(for {
      schema <- schemaGen
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, rowGen(schema))
      keysPerSeg <- Gen.choose(1L, 40L)
      batch <- Gen.choose(1, 17)
    } yield (schema, rows, keysPerSeg, batch)) {
      case (schema, rows, keysPerSeg, batch) =>
        val store = new StreamStore(
          Files.createTempDirectory("graft-prop-store-"))
        val w = store.createStream("s", schema,
          keysPerSegment = keysPerSeg)
        rows.grouped(batch).foreach(g => w.write(g))
        w.stop()
        val r = store.openReader("s")
        val got = r.read(rows.length + 1, 0)
        val back = got.map(_.toVector).getOrElse(Vector.empty)
        val indicesOk = back.map(_._2) == (0L until rows.length.toLong)
        val valuesOk = back.zip(rows).forall { case ((_, _, vs), expect) =>
          schema.fields.indices.forall(i =>
            sameValue(schema.fields(i).tpe, vs(i), expect(i)))
        }
        val eofOk = !r.good() || r.read(1, 0).isEmpty
        // with keysPerSegment < n the tombstone chain MUST have hopped
        val chained = rows.length <= keysPerSeg ||
          store.segments("s").length > 1
        indicesOk && valuesOk && eofOk && chained
    })
  }

  test("property: variable-width payloads keep exact lengths and bytes") {
    check(Prop.forAll(for {
      max <- Gen.choose(1, 64)
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n,
        valueGen(RiverType.VariableWidthBytes(max)).map(Seq(_)))
      keysPerSeg <- Gen.choose(1L, 25L)
    } yield (max, rows, keysPerSeg)) { case (max, rows, keysPerSeg) =>
      val schema = RiverSchema(Seq(
        RiverField("v", RiverType.VariableWidthBytes(max))))
      val store = new StreamStore(
        Files.createTempDirectory("graft-prop-var-"))
      val w = store.createStream("s", schema, keysPerSegment = keysPerSeg)
      rows.foreach(row => w.write(Seq(row)))
      w.stop()
      val back = store.openReader("s").read(rows.length + 1, 0)
        .map(_.toVector).getOrElse(Vector.empty)
      back.length == rows.length &&
      back.zip(rows).forall { case ((_, _, vs), expect) =>
        java.util.Arrays.equals(vs.head.asInstanceOf[Array[Byte]],
          expect.head.asInstanceOf[Array[Byte]])
      }
    })
  }

  test("property: schema JSON round-trips adversarial field names") {
    // quotes, backslashes, control chars, unicode — everything toJson's
    // escaper emits must parse back identically (braces excluded: the
    // minimal scanner documents that limit)
    val nameGen = for {
      n <- Gen.choose(1, 12)
      cs <- Gen.listOfN(n, Gen.frequency(
        6 -> Gen.alphaNumChar,
        2 -> Gen.oneOf('"', '\\', ' ', '/', '\'', ':', ','),
        1 -> Gen.choose(0.toChar, 31.toChar),
        1 -> Gen.oneOf('é', 'λ', '漢', '☃')))
    } yield cs.mkString
    check(Prop.forAll(for {
      n <- Gen.choose(1, 5)
      names <- Gen.listOfN(n, nameGen)
      ts <- Gen.listOfN(n, scalarTypeGen)
    } yield RiverSchema(names.zip(ts).map { case (nm, t) =>
      RiverField(nm, t)
    })) { schema =>
      RiverSchema.fromJson(schema.toJson) == schema
    })
  }
}
