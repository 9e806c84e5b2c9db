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

  test("graft_planes TVF yields the deterministic hyperplane table") {
    val rows = spark.sql(
      "SELECT k, i, hp FROM graft_planes(3) ORDER BY k, i").collect()
    assert(rows.length == 3 * 64)
    // spot-check against the kernel construction: md5("k:i") first 4
    // bytes as unsigned int, minus 2^31
    val md = java.security.MessageDigest.getInstance("MD5")
    def expect(k: Int, i: Int): Long = {
      val hex = md.digest(s"$k:$i".getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) - 2147483648L
    }
    for ((k, i) <- Seq((0, 0), (1, 17), (2, 63))) {
      val r = rows(k * 64 + i)
      assert(r.getInt(0) == k && r.getInt(1) == i)
      assert(r.getLong(2) == expect(k, i), s"hp($k,$i)")
    }
    // all components inside [-2^31, 2^31)
    assert(rows.forall(r =>
      r.getLong(2) >= -2147483648L && r.getLong(2) < 2147483648L))
    // and it composes relationally: the s03 spelling of a plane dot
    val dot = spark.sql("""
      SELECT sum(hp) AS s FROM graft_planes(2) WHERE k = 0""")
      .head().getLong(0)
    assert(dot == (0 until 64).map(expect(0, _)).sum)
  }

  test("graft_simhash32/graft_shingles/graft_minhash match the kernels " +
      "from SQL text") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "pack my box with five dozen jugs"),
      (3L, "a b a b a b")).toDF("id", "body")
    docs.createOrReplaceTempView("docs_sqlk")
    val got = spark.sql(
      """SELECT id, graft_simhash32(body) AS sh,
        |  graft_shingles(body, 2) AS sg,
        |  graft_minhash(body, 2, 4) AS mh
        |FROM docs_sqlk ORDER BY id""".stripMargin).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.orderBy("id").collect().zip(got).foreach { case (in, out) =>
      val body = in.getString(1)
      assert(out.getLong(1) ==
        graft.functions.TextKernels.simhashOf(md, body))
      val shs = graft.functions.TextKernels.shingleSet(body, 2)
      assert(out.getSeq[String](2) == shs.toSeq)
      assert(out.getSeq[String](3) ==
        graft.functions.TextKernels.minhashSig(md, shs, 4).toSeq)
    }
  }

  test("graft SQL kernels propagate nulls and reject bad arguments") {
    val r = spark.sql(
      "SELECT graft_simhash32(CAST(NULL AS STRING)) AS a, " +
        "graft_minhash(CAST(NULL AS STRING), 2, 4) AS b").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    intercept[Exception] {
      spark.sql("SELECT graft_simhash32('a', 'b')").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_minhash('a', 0, 4)").collect() // k < 1
    }
    intercept[Exception] {
      spark.sql("SELECT graft_minhash('a', 2, 99999)").collect() // nh cap
    }
  }

  test("graft SQL kernels stay inside whole-stage codegen") {
    val df = spark.sql(
      "SELECT graft_simhash32(CAST(id AS STRING)) AS s FROM range(10)")
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, "StaticInvoke kernel fell out of codegen:\n" +
      df.queryExecution.executedPlan.toString())
    // the projection itself (not just the range) must sit inside the
    // codegen stage
    assert(wsc.exists(_.toString().contains("static_invoke")),
      "projection with the kernel is outside the codegen stage")
    assert(df.collect().length == 10)
  }

  test("graft_planes rejects non-literal or out-of-range arguments") {
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_planes(0)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_planes(100000)").collect()
    }
    // a Long that would wrap to a small positive Int must fail the
    // range check, never silently truncate to a wrong-sized table
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_planes(4294967297)").collect()
    }
    // non-foldable argument: the foldable guard, not an eval surprise
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_planes(rand())").collect()
    }
  }
}
