package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Realistic-K probe for the round-7 k-means kernels: the s07 oracle
  * fixture pins K=3, but SemDeDup's operating point is K ~ N/1000 and
  * the round-6 scale fix (assignCells map-pass, cellPartialSums) only
  * pays off when K is large — the N×K explode it replaced was 10^13
  * rows at deployment K. This probe times kmeansCells end-to-end at
  * several K on the given embeddings table and the auto-K facade at its
  * default target, printing one JSON line. The informative number is
  * the GROWTH: the map-pass assignment does N×K×dim multiplies but
  * shuffles only N (id, cell) rows, so time should grow far slower
  * than K (the exploded spelling grew linearly in K from shuffle volume
  * alone, on top of the same dots).
  *
  * Usage: AnnProbe <sfDir>
  */
object AnnProbe {
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

    def timeIt(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def cellsAt(k: Int): Double = {
      // min of three, matching Bench's convention
      (1 to 3).map { _ =>
        timeIt {
          graft.operators.AnnOps
            .kmeansCells(emb, "vec_id", "embedding", k = k, iters = 2)
            .write.format("noop").mode("overwrite").save()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(false))
        }
      }.min
    }
    cellsAt(3) // warm, untimed
    val t3 = cellsAt(3)
    val t50 = cellsAt(50)
    val t500 = cellsAt(500)
    val tAuto = (1 to 3).map { _ =>
      timeIt {
        graft.operators.AnnOps
          .semanticNearDupsAuto(emb, "vec_id", "embedding",
            threshold = 0.45)
          .write.format("noop").mode("overwrite").save()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
      }
    }.min

    println(
      s"""{"probe":"kmeans_realistic_k","sf_dir":"$sfDir","n_vectors":$n,""" +
      s""""kmeans_k3_sec":$t3,"kmeans_k50_sec":$t50,""" +
      s""""kmeans_k500_sec":$t500,""" +
      s""""semantic_auto_target1000_sec":$tAuto}""")
    spark.stop()
  }
}
