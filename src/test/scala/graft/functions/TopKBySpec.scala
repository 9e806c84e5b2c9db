package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The top-k Aggregator's algebra: order-insensitivity (any reduce/
  * merge tree gives the same buffer), tie-breaking, and the k bound —
  * the properties that make it safe under partial aggregation, where
  * Spark picks the tree shape.
  */
class TopKBySpec extends AnyFunSuite {

  private val agg = new TopKByAggregator(3)

  private def reduceAll(xs: Seq[(Double, Long)]) =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("reduce keeps the top k by (key desc, payload asc)") {
    val xs = Seq((1.0, 10L), (5.0, 20L), (3.0, 30L), (4.0, 40L), (2.0, 50L))
    assert(agg.finish(reduceAll(xs)) == Seq(20L, 40L, 30L))
  }

  test("ties break payload-ascending, deterministically") {
    val xs = Seq((1.0, 7L), (1.0, 3L), (1.0, 9L), (1.0, 5L))
    assert(agg.finish(reduceAll(xs)) == Seq(3L, 5L, 7L))
  }

  test("merge of any split equals the unsplit reduce") {
    var seed = 42
    def next(): Int = { seed = seed * 1103515245 + 12345; seed >>> 16 }
    val xs = Seq.fill(40)(((next() % 7).toDouble, (next() % 100).toLong))
    val whole = agg.finish(reduceAll(xs))
    for (cut <- Seq(0, 1, 13, 39, 40)) {
      val (a, b) = xs.splitAt(cut)
      assert(agg.finish(agg.merge(reduceAll(a), reduceAll(b))) == whole,
        s"split at $cut diverged")
      assert(agg.finish(agg.merge(reduceAll(b), reduceAll(a))) == whole,
        s"swapped merge at $cut diverged")
    }
  }

  test("NaN ranks largest and -0.0 ties 0.0 — the window-spelling order") {
    // Spark/DuckDB ORDER BY value DESC put NaN first and compare the
    // two zeros equal; a negated-key ordering gets both wrong
    val withNaN = Seq((1.0, 2L), (Double.NaN, 1L), (2.0, 3L))
    assert(agg.finish(reduceAll(withNaN)) == Seq(1L, 3L, 2L))
    val zeros = Seq((-0.0, 9L), (0.0, 4L), (-0.0, 6L))
    assert(agg.finish(reduceAll(zeros)) == Seq(4L, 6L, 9L),
      "zero ties must break payload-ascending, not by zero sign")
  }

  test("buffers never exceed k, short groups emit what they have") {
    assert(reduceAll(Seq.tabulate(100)(i => (i.toDouble, i.toLong)))
      .length == 3)
    assert(agg.finish(reduceAll(Seq((2.0, 1L)))) == Seq(1L))
    assert(agg.finish(agg.zero) == Nil)
  }

  test("property: any merge tree equals the window-rank reference") {
    // the partial-aggregation safety argument, property-strength: for
    // random inputs (with ties, NaN, signed zeros) and random splits,
    // every reduce/merge tree must equal the row_number-window
    // reference ordering (NaN largest, zeros equal, payload-asc ties)
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    val keyGen = Gen.frequency(
      (8, Gen.choose(-5, 5).map(_.toDouble / 2)),
      (1, Gen.const(Double.NaN)),
      (1, Gen.oneOf(0.0, -0.0)))
    val rowsGen = for {
      n <- Gen.choose(0, 25)
      rows <- Gen.listOfN(n, for {
        k <- keyGen; p <- Gen.choose(0L, 9L)
      } yield (k, p))
      cut <- Gen.choose(0, n)
    } yield (rows, cut)
    def refTop3(xs: Seq[(Double, Long)]): Seq[Long] = {
      // window reference: ORDER BY key DESC (NaN largest, zero signs
      // equal) then payload ASC; take 3
      val norm = xs.map { case (k, p) => (k + 0.0, p) }
      norm.sortWith { case ((k1, p1), (k2, p2)) =>
        val c = java.lang.Double.compare(k2, k1) // TotalOrder desc
        if (c != 0) c < 0 else p1 < p2
      }.take(3).map(_._2)
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(Seed(20260813L))
    val r = SCTest.check(params, Prop.forAll(rowsGen) { case (rows, cut) =>
      val (a, b) = rows.splitAt(cut)
      agg.finish(agg.merge(reduceAll(a), reduceAll(b))) == refTop3(rows)
    })
    assert(r.passed, r.status.toString)
  }
}
