package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 scale probe for the sharded centroid-broadcast kernel
  * (AnnOps.assignCellsSharded): past the maxCentroidBytes gate the
  * Lloyd assignment must stay FLAT in k (the map passes do the same
  * N×k×dim multiplies as the single broadcast; only S×N skinny
  * (id, cell, score) rows move through the reduce) and bit-identical
  * to the unsharded kernel. Times kmeansCells end-to-end (iters=2,
  * min of three) at several k on both sides of a deliberately tiny
  * budget, and counts assignment drift rows at the smallest k.
  *
  * Usage: ShardedKmeansProbe <sfDir>
  */
object ShardedKmeansProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite)
          "/dev/shm/graft-spark-local"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    // dim 64 -> dimBytes 576; 64 KiB budget shards k=500 into ~5,
    // k=2000 into ~18, k=8000 into ~71 shards
    val budget = 64L << 10

    def timeIt(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def cellsAt(k: Int, maxBytes: Long): Double =
      (1 to 3).map { _ =>
        timeIt {
          graft.operators.AnnOps
            .kmeansCells(emb, "vec_id", "embedding", k = k, iters = 2,
              maxCentroidBytes = maxBytes)
            .write.format("noop").mode("overwrite").save()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(false))
        }
      }.min

    cellsAt(500, Long.MaxValue) // warm, untimed
    val u500 = cellsAt(500, Long.MaxValue)
    val u2000 = cellsAt(2000, Long.MaxValue)
    val u8000 = cellsAt(8000, Long.MaxValue)
    val s500 = cellsAt(500, budget)
    val s2000 = cellsAt(2000, budget)
    val s8000 = cellsAt(8000, budget)

    // parity: sharded assignments must be bit-identical to unsharded
    val a = graft.operators.AnnOps.kmeansCells(
      emb, "vec_id", "embedding", k = 500, iters = 2,
      maxCentroidBytes = Long.MaxValue)
    val b = graft.operators.AnnOps.kmeansCells(
      emb, "vec_id", "embedding", k = 500, iters = 2,
      maxCentroidBytes = budget)
    val drift = a.withColumnRenamed("cell", "ca")
      .join(b.withColumnRenamed("cell", "cb"), Seq("id"), "full")
      .filter(not(col("ca") <=> col("cb"))).count()

    println(
      s"""{"probe":"sharded_kmeans","sf_dir":"$sfDir","n_vectors":$n,""" +
      s""""budget_bytes":$budget,""" +
      s""""unsharded_k500_sec":$u500,"unsharded_k2000_sec":$u2000,""" +
      s""""unsharded_k8000_sec":$u8000,""" +
      s""""sharded_k500_sec":$s500,"sharded_k2000_sec":$s2000,""" +
      s""""sharded_k8000_sec":$s8000,"parity_drift_rows":$drift}""")
    spark.stop()
  }
}
