package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ScaleData.tagWords]]' decorrelation contract — the property
  * the round-14 decade probe found broken in the previous spelling
  * (word-order rotation preserves all but ~k-1 of a document's
  * k-shingles, so N-fold replication left every copy a near-dup of
  * every other and "verified pairs" grew ~N² instead of ~N: a data
  * pathology that would have been read as an engine quadratic).
  *
  * Contract: for k >= 3, the k-shingle sets of two different copies
  * of the SAME text are disjoint; word count and internal duplicate
  * structure are preserved.
  */
class ScaleDataSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("scaledata-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val sample =
    "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"

  private def tagged(i: Int): String = {
    val s = spark
    import s.implicits._
    Seq(sample).toDF("text")
      .select(ScaleData.tagWords(col("text"), i).as("t"))
      .head().getString(0)
  }

  private def shingles(text: String, k: Int): Set[String] =
    text.split(" ").sliding(k).map(_.mkString(" ")).toSet

  test("copy 0 is the identity") {
    assert(tagged(0) == sample)
  }

  test("k-shingle sets of different copies are pairwise disjoint " +
      "(k = 3 and 5), including vs the original") {
    val texts = Seq(sample, tagged(1), tagged(2), tagged(9))
    for (k <- Seq(3, 5); Seq(a, b) <- texts.combinations(2)) {
      assert(shingles(a, k).intersect(shingles(b, k)).isEmpty,
        s"k=$k shingles shared between copies:\n$a\n$b")
    }
  }

  test("word count and positions are preserved; exactly every 3rd " +
      "word is tagged") {
    val ws = sample.split(" ")
    val ts = tagged(4).split(" ")
    assert(ts.length == ws.length)
    ts.zip(ws).zipWithIndex.foreach { case ((t, w), p) =>
      if (p % 3 == 0) assert(t == s"${w}_c4", s"pos $p")
      else assert(t == w, s"pos $p")
    }
  }

  test("internal duplicate structure survives: identical texts map " +
      "to identical outputs, distinct texts stay distinct") {
    val s = spark
    import s.implicits._
    val out = Seq(sample, sample, sample + " extra").toDF("text")
      .select(ScaleData.tagWords(col("text"), 3).as("t"))
      .collect().map(_.getString(0))
    assert(out(0) == out(1))
    assert(out(0) != out(2))
  }

  test("rotation counter-example: the old spelling is NOT " +
      "shingle-breaking (documents why tagWords replaced it)") {
    // rotate by 4 words — the previous decorrelation
    val ws = sample.split(" ")
    val rotated = (ws.drop(4) ++ ws.take(4)).mkString(" ")
    val j = {
      val a = shingles(sample, 5)
      val b = shingles(rotated, 5)
      a.intersect(b).size.toDouble / a.union(b).size
    }
    assert(j > 0.5, s"rotation kept Jaccard $j — the pathology " +
      "tagWords exists to prevent")
  }
}
