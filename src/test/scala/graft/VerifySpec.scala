package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the verify gate's loud-failure contract (round-6 regression: 12
  * queries threw, Verify swallowed the exceptions, and the driver's
  * correctness JSON silently omitted them — a dead query read as
  * "absent therefore fine"). A declared query that throws must surface
  * in the returned failure map AND in outDir/errors.json, while healthy
  * queries still produce their outputs.
  */
class VerifySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("verify-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a planted throwing query turns the gate red, loudly") {
    val out = Files.createTempDirectory("verify-spec-").toString
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("n")
    val dead: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("planted failure")
    val failed = Verify.runAll(spark,
      Seq("ok_query" -> good, "dead_query" -> dead), "unused-sf", out)

    assert(failed.keySet == Set("dead_query"),
      s"failure map wrong: $failed")
    assert(failed("dead_query").contains("planted failure"))
    assert(new java.io.File(s"$out/ok_query").isDirectory,
      "healthy query lost its output")
    assert(!new java.io.File(s"$out/dead_query").isDirectory)
    val errJson = Files.readString(java.nio.file.Paths.get(s"$out/errors.json"))
    assert(errJson.contains("\"dead_query\"") &&
      errJson.contains("planted failure"),
      s"errors.json does not record the dead query: $errJson")
  }

  test("SparkEntry declares unique query names, each with an oracle") {
    // Map.toMap silently shadows duplicates — a copy-pasted name would
    // drop a query from the driver gate without a trace. The guard in
    // SparkEntry.queries must refuse; this pins both the guard and the
    // current oracle coverage (every declared query is oracle-checked).
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).mkString(", ")}")
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      "every declared query must carry an oracle (rows-only checks are " +
        "a weaker gate; this engine oracles everything)")
    assert(SparkEntry.queries.size == names.size)
  }

  test("an all-green run writes an empty errors.json") {
    val out = Files.createTempDirectory("verify-spec-").toString
    val good: (SparkSession, String) => DataFrame =
      (s, _) => s.range(2).toDF("n")
    val failed = Verify.runAll(spark, Seq("ok" -> good), "unused-sf", out)
    assert(failed.isEmpty)
    assert(Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json")) == "{}")
  }
}
