package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the fixed costs the optimization round targets
  * (guide §1): per-job launch overhead as a function of task count,
  * AQE coalescing behavior on tiny shuffles, pin (localCheckpoint)
  * cost, and a small partitioned parquet write to disk vs tmpfs.
  *
  * Usage: runMain graft.tools.OverheadProbe [sfDir]
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir =
      if (new java.io.File("/dev/shm").canWrite) "/dev/shm/graft-spark-local"
      else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.Pins.PinnedDataset

    println(s"PROBE adaptive.enabled=" +
      spark.conf.get("spark.sql.adaptive.enabled"))
    println(s"PROBE coalescePartitions.enabled=" +
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled"))
    println(s"PROBE parallelismFirst=" + spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst"))

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count() // warm
    def time[A](tag: String, n: Int = 5)(f: => A): Unit = {
      val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      println(f"PROBE $tag%-46s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op")
    }

    // 1. per-job overhead vs task count: same tiny agg, repartitioned
    for (p <- Seq(1, 2, 4, 8, 16, 32)) {
      val df = emb.repartition(p, col("vec_id")).pin()
      time(s"agg-after-repart($p)") {
        df.groupBy(col("vec_id") % 7).count()
          .write.format("noop").mode("overwrite").save()
      }
      graft.operators.DedupOps.releaseLocalCheckpoint(df)
    }
    // 2. AQE on a default groupBy straight off the parquet scan
    time("agg-no-repart (scan->groupBy)") {
      emb.groupBy(col("vec_id") % 7).count()
        .write.format("noop").mode("overwrite").save()
    }
    // 3. pin cost vs partitions
    for (p <- Seq(1, 4, 32)) {
      time(s"pin($p)") {
        val d = emb.repartition(p, col("vec_id")).pin()
        graft.operators.DedupOps.releaseLocalCheckpoint(d)
      }
    }
    // 4. repartition WITHOUT explicit count (AQE-coalescible?)
    time("repart(no-count).pin") {
      val d = emb.repartition(col("vec_id")).pin()
      println("PROBE   partitions=" + d.rdd.getNumPartitions)
      graft.operators.DedupOps.releaseLocalCheckpoint(d)
    }
    // 5. small partitioned parquet write: /tmp vs /dev/shm
    val staged16 = emb.limit(5000)
      .select(col("vec_id"), (col("vec_id") % 16).as("cell"))
      .repartition(4, col("vec_id")).pin()
    for (base <- Seq("/tmp", "/dev/shm")) {
      time(s"write-partitionBy-cell -> $base", n = 3) {
        val d = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(base), "graft-probe-")
        staged16.write.mode("overwrite").partitionBy("cell")
          .parquet(d.toString + "/t")
        // read it back like a serve would
        spark.read.parquet(d.toString + "/t").count()
      }
    }
    // 6. collect-scalar job cost (the head()/collect() chains)
    val pinned = emb.repartition(32, col("vec_id")).pin()
    time("head-agg-32parts") {
      pinned.agg(min(size(col("embedding")))).head()
    }
    val pinned1 = emb.repartition(1, col("vec_id")).pin()
    time("head-agg-1part") {
      pinned1.agg(min(size(col("embedding")))).head()
    }
    spark.stop()
  }
}
