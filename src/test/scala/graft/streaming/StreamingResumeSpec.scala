package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Checkpointed RESUME of the analytic streaming layer — the claim the
  * README makes ("Structured Streaming ... with checkpointed resume"),
  * exercised directly: two separate drains against ONE checkpoint
  * location must (a) never re-process already-committed files and
  * (b) restore aggregation state, so the post-resume result equals the
  * all-data result even though the second drain only read the new file.
  * This is the streaming-side sibling of the ingest resume tests (I6).
  */
class StreamingResumeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-resume")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def writeSlice(dir: String, ids: Range): Unit = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "kind").coalesce(1)
      .write.mode("append").parquet(dir)
  }

  private def stream(dir: String) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
  }

  private def drain(df: org.apache.spark.sql.DataFrame, cp: String,
      mode: String)(f: org.apache.spark.sql.DataFrame => Unit): Unit = {
    val q = df.writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => f(b))
      .outputMode(mode)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("offset resume: a second drain never re-reads committed files") {
    val dir = Files.createTempDirectory("resume-src-").toString
    val cp = Files.createTempDirectory("resume-cp-").toString
    writeSlice(dir, 0 until 100)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    drain(stream(dir), cp, "append") { b =>
      seen ++= b.select("id").collect().map(_.getLong(0))
    }
    assert(seen.sorted == (0L until 100L).toSeq, "first drain reads file 1")
    // new data lands; SAME checkpoint: only the new file may be read
    writeSlice(dir, 100 until 250)
    val seen2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    drain(stream(dir), cp, "append") { b =>
      seen2 ++= b.select("id").collect().map(_.getLong(0))
    }
    assert(seen2.sorted == (100L until 250L).toSeq,
      s"resume re-processed committed data: ${seen2.size} rows")
  }

  test("state resume: post-restart aggregate covers pre-restart rows") {
    val dir = Files.createTempDirectory("resume2-src-").toString
    val cp = Files.createTempDirectory("resume2-cp-").toString
    writeSlice(dir, 0 until 100) // 50 a, 50 b
    def agg = stream(dir).groupBy(col("kind")).count()
    var last: Map[String, Long] = Map.empty
    drain(agg, cp, "complete") { b =>
      if (!b.isEmpty)
        last = b.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(last == Map("a" -> 50L, "b" -> 50L))
    // restart on the same checkpoint with one new file: the complete
    // result must include the FIRST file's rows via restored state,
    // though this drain only read the second file
    writeSlice(dir, 100 until 160) // 30 a, 30 b
    drain(agg, cp, "complete") { b =>
      if (!b.isEmpty)
        last = b.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(last == Map("a" -> 80L, "b" -> 80L),
      s"state not restored across restart: $last")
  }
}
