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

  test("durable incremental dedup index survives a kill between batches") {
    // st10's scale-soft spot until round 7: the accumulated signature
    // index lived in localCheckpoint unions, so a restart silently
    // re-admitted every duplicate of the pre-crash increments. The
    // durable path (DedupOps.incrementalMinhashDedupDurable) commits one
    // parquet subdir per batch; this test kills the "process" between
    // microbatches (new drain, fresh in-memory state, same checkpoint +
    // index dir) and demands the same pair set as an uninterrupted run.
    val s = spark
    import s.implicits._
    val tA = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima"
    val tB = "one two three four five six seven eight nine ten eleven " +
      "twelve"
    val tC = "red orange yellow green blue indigo violet crimson amber " +
      "teal navy gold"

    val idxDir = Files.createTempDirectory("dedup-idx-").toString
    val srcDir = Files.createTempDirectory("dedup-src-").toString
    val cp = Files.createTempDirectory("dedup-cp-").toString

    // old corpus committed as batch -1
    val oldDocs = Seq((0L, tA), (1L, tB)).toDF("doc_id", "text")
    graft.operators.DedupOps.minhashIndex(oldDocs, "doc_id", "text",
        5, 2, 8, partitions = 2)
      .select(col("doc_id"), col("shs"), col("bkeys"))
      .write.mode("overwrite").parquet(s"$idxDir/batch=-1")

    def writeDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(srcDir)
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def docStream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)

    val pairs = scala.collection.mutable.Set.empty[(Long, Long)]
    def drainDedup(): Unit = drainWithId(docStream, cp) { (b, bid) =>
      if (!b.isEmpty)
        pairs ++= graft.operators.DedupOps.incrementalMinhashDedupDurable(
          b.localCheckpoint(), "doc_id", "text", idxDir, bid,
          5, 2, 8, 0.8, partitions = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
    }

    // session 1: two microbatches — 10 dups old 0; 11 is novel
    writeDocs(Seq((10L, tA)))
    writeDocs(Seq((11L, tC)))
    drainDedup()
    assert(pairs.toSet == Set((0L, 10L)), s"pre-kill pairs: $pairs")

    // KILL between batches: all in-memory state is gone. A third file
    // lands: 12 dups 11 (a PRE-crash increment — only a durable index
    // can see it) and 13 dups both 0 (old corpus) and 10 (increment 1).
    writeDocs(Seq((12L, tC), (13L, tA)))
    drainDedup()
    assert(pairs.toSet ==
      Set((0L, 10L), (11L, 12L), (0L, 13L), (10L, 13L)),
      s"post-restart pairs wrong (lost index batches?): $pairs")

    // and the union equals the uninterrupted in-memory run on the same
    // data — restart changed nothing
    val allNew = Seq((10L, tA), (11L, tC), (12L, tC), (13L, tA))
      .toDF("doc_id", "text")
    val oneShot = graft.operators.DedupOps.minhashNearDupsAgainstIndex(
        allNew, "doc_id", "text",
        graft.operators.DedupOps.minhashIndex(oldDocs, "doc_id", "text",
          5, 2, 8, partitions = 2),
        5, 2, 8, 0.8, partitions = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.toSet == oneShot,
      s"restart run diverged from one-shot: $pairs vs $oneShot")

    // replay idempotence: re-running a committed batch id with the same
    // data yields the same pairs and does not double the index
    val before = graft.operators.DedupOps
      .loadMinhashIndex(spark, idxDir).get.count()
    val replay = graft.operators.DedupOps.incrementalMinhashDedupDurable(
        Seq((12L, tC), (13L, tA)).toDF("doc_id", "text"),
        "doc_id", "text", idxDir, batchId = 2,
        5, 2, 8, 0.8, partitions = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == Set((11L, 12L), (0L, 13L), (10L, 13L)),
      s"replay pairs: $replay")
    val after = graft.operators.DedupOps
      .loadMinhashIndex(spark, idxDir).get.count()
    assert(before == after, s"replay grew the index: $before -> $after")
  }

  private def drainWithId(df: org.apache.spark.sql.DataFrame, cp: String)(
      f: (org.apache.spark.sql.DataFrame, Long) => Unit): Unit = {
    val q = df.writeStream
      .foreachBatch(f)
      .outputMode("append")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
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
