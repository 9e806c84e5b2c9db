package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions entry point: `dot_i64` must resolve from
  * SQL text exactly like the Column API, including inside expressions,
  * and reject wrong arity at analysis time.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("dot_i64 resolves from SQL and matches the Column API") {
    val r = spark.sql(
      "SELECT dot_i64(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(r == 4L + 10L + 18L)
  }

  test("dot_i64 composes inside SQL expressions over a table") {
    val s = spark
    import s.implicits._
    Seq((Array(1L, 1L), Array(2L, 3L)), (Array(2L, 2L), Array(1L, 1L)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val sums = spark.sql(
      "SELECT sum(dot_i64(a, b)) AS s FROM vecs").head().getLong(0)
    assert(sums == (2L + 3L) + (2L + 2L))
  }

  test("dot_i64 rejects wrong arity at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT dot_i64(array(1L))").collect()
    }
    assert(e.getMessage.contains("dot_i64"))
  }
}
