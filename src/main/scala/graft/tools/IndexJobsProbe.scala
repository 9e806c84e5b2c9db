package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Pins.PinnedDataset

/** Round-15 fixed-overhead probe (round-14 "Next round #3"): the 10
  * slowest bench queries are durable-lifecycle compositions whose cost
  * is MANY SMALL JOBS, not data. This probe counts Spark jobs (and
  * wall) per durable-index operator call — build, append, serve,
  * delete, maintain — so overhead cuts are measured, not asserted:
  * SCALE_r15 records the before/after.
  *
  * Usage: IndexJobsProbe <sfDir>
  * Prints one JSON line: {"op":{"jobs":n,"sec":s}, ...}
  */
object IndexJobsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    import s.implicits._

    // Attribution is by JOB TAG, not wall-clock settling: each timed
    // body runs under a unique sc.addJobTag, and the listener counts
    // only job starts carrying that tag (tags are inherited by threads
    // the op spawns — e.g. buildIvfPqIndex's codebook pool — and are
    // additive, so they compose with any job group/tag the op itself
    // sets). A backlogged listener bus can therefore DELAY a count but
    // can never credit a job to the wrong op; the post-body sleep only
    // lets the bus drain before the tally is read.
    val tagJobs = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicInteger]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.tags")))
          .toSeq.flatMap(_.split(","))
          .filter(_.startsWith("probe-op-"))
          .foreach { t =>
            tagJobs.computeIfAbsent(t,
              _ => new java.util.concurrent.atomic.AtomicInteger)
              .incrementAndGet()
          }
        ()
      }
    })
    val opSeq = new java.util.concurrent.atomic.AtomicInteger
    def counted(body: => Unit): (Int, Double) = {
      val tag = s"probe-op-${opSeq.incrementAndGet()}"
      spark.sparkContext.addJobTag(tag)
      val t0 = System.nanoTime()
      try body finally spark.sparkContext.removeJobTag(tag)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener-bus drain only; see header comment
      (Option(tagJobs.get(tag)).map(_.get).getOrElse(0), sec)
    }
    def r3(x: Double): Double = math.rint(x * 1000) / 1000

    val src = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source")
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .join(src, $"vec_id" === $"doc_id")
      .select($"vec_id", $"embedding", $"source")
      .pin()
    emb.count()
    val bucket = conv(
      substring(md5($"vec_id".cast("string")), 1, 4), 16, 10)
      .cast("long") % 100

    // one full untimed warmup lifecycle (JIT/codegen/planner), then the
    // counted one — job counts are deterministic, but wall isn't
    def lifecycle(record: Boolean): Seq[(String, (Int, Double))] = {
      val idx = java.nio.file.Files
        .createTempDirectory("graft-jobs-idx-").toString
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, (Int, Double))]
      def op(name: String)(body: => Unit): Unit = {
        val r = counted(body)
        if (record) out += name -> r
      }
      op("build") {
        // -Dgraft.probe.pqm widens the PQ subspace count (default 4;
        // 8 prices the capped-pool build against the r15 8-thread one)
        graft.operators.AnnOps.buildIvfPqIndex(
          emb.filter(bucket < 70), "vec_id", "embedding", "source",
          idx, cells = 8, iters = 2,
          pqM = Integer.getInteger("graft.probe.pqm", 4),
          pqKs = 4, pqIters = 2)
      }
      op("append") {
        graft.operators.AnnOps.appendIvfPqIndex(
          emb.filter(bucket >= 70 && bucket < 85),
          "vec_id", "embedding", "source", idx, 1L)
      }
      val queries = emb.filter($"vec_id" < 8).pin()
      queries.count()
      op("serve") {
        val r = graft.operators.AnnOps.queryIvfPqIndex(queries,
          "vec_id", "embedding", "source", idx, k = 3, nprobe = 4,
          rerankDepth = 12)
        require(r.count() > 0)
        graft.operators.DedupOps.releaseLocalCheckpoint(r)
      }
      op("delete") {
        graft.operators.AnnOps.deleteFromIndex(
          emb.filter($"vec_id" >= 8 && $"vec_id" < 16)
            .select($"vec_id"), "vec_id", idx, 1L)
      }
      op("serve_post_delete") {
        val r = graft.operators.AnnOps.queryIvfPqIndex(queries,
          "vec_id", "embedding", "source", idx, k = 3, nprobe = 4,
          rerankDepth = 12)
        require(r.count() > 0)
        graft.operators.DedupOps.releaseLocalCheckpoint(r)
      }
      op("maintain") {
        graft.operators.AnnOps.maintainIndex(spark, idx,
          graft.operators.AnnOps.IndexMaintenancePolicy(vacuum = true))
      }
      op("serve_post_maintain") {
        val r = graft.operators.AnnOps.queryIvfPqIndex(queries,
          "vec_id", "embedding", "source", idx, k = 3, nprobe = 4,
          rerankDepth = 12)
        require(r.count() > 0)
        graft.operators.DedupOps.releaseLocalCheckpoint(r)
      }
      graft.operators.DedupOps.releaseLocalCheckpoint(queries)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(idx))
      out.toSeq
    }

    lifecycle(record = false)
    val rec = lifecycle(record = true)
    val body = rec.map { case (k, (j, sec)) =>
      s""""$k":{"jobs":$j,"sec":${r3(sec)}}"""
    }.mkString(",")
    val total = rec.map(_._2._1).sum
    println(s"""{"total_jobs":$total,$body}""")
    spark.stop()
  }
}
