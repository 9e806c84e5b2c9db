package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `ts: BIGINT` epoch-nanos contract across every physical
  * type the testdata generator has shipped (round 6's 12-query outage:
  * `ts` drifted from parquet TIMESTAMP(NANOS) to timestamp[us] /
  * TIMESTAMP_NTZ and every `ts div N` expression died in analysis).
  * Whatever arrives, Tables.load must hand queries the same nanos
  * longs.
  */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("tables-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // 2024-01-02T03:04:05.123456 UTC as epoch micros / nanos
  private val micros = 1704164645123456L
  private val nanos = micros * 1000L

  test("TIMESTAMP_NTZ ts normalizes to epoch nanos long") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("tables-ntz-").toString
    Seq((1L, micros)).toDF("event_id", "us")
      .select($"event_id",
        expr("timestamp_micros(us)").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(got.select($"ts").head.getLong(0) == nanos)
  }

  test("TIMESTAMP (with zone) ts normalizes to epoch nanos long") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("tables-tz-").toString
    Seq((1L, micros)).toDF("event_id", "us")
      .select($"event_id", expr("timestamp_micros(us)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(got.select($"ts").head.getLong(0) == nanos)
  }

  test("long ts (nanosAsLong TIMESTAMP(NANOS) read, or plain int64) " +
      "passes through untouched") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("tables-long-").toString
    Seq((1L, nanos)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(got.select($"ts").head.getLong(0) == nanos)
  }

  test("tables without a ts column are untouched") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("tables-none-").toString
    Seq((1L, "x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Tables.load(spark, dir, "documents")
    assert(got.columns.toSeq == Seq("doc_id", "text"))
    assert(got.head.getString(1) == "x")
  }
}
