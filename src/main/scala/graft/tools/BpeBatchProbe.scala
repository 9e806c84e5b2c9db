package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 scale probe for batched BPE learning (TextOps.bpeRounds):
  * one-at-a-time learning is one aggregation job + one driver round
  * trip PER MERGE (~0.2 s measured), so a real 30k-50k-merge
  * vocabulary is hours of pure job-launch overhead; the exact batch
  * rule (rank-prefix of symbol-disjoint pairs, strict count dominance,
  * self-pair/collision truncation — equivalence proven in
  * BpePropertySpec) must cut the JOB COUNT far below the merge count
  * while producing the identical learned table.
  *
  * Measures: jobs and wall seconds for sequential (maxBatch=1) at a
  * small merge count, batched (maxBatch=64) at `merges`, plus a
  * learned-prefix equality check between the two spellings.
  *
  * Usage: BpeBatchProbe <sfDir> [merges]
  */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val merges = if (args.length > 1) args(1).toInt else 1000
    val seqMerges = math.min(200, merges)
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

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("text"))

    def learn(m: Int, maxBatch: Int, driverFinishBytes: Long)
        : (Double, Int, Array[(Int, String, String, Long)]) = {
      val j0 = jobs.get
      val t0 = System.nanoTime()
      val learned = graft.operators.TextOps
        .bpeLearn(docs, "text", m, maxBatch, driverFinishBytes)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3)))
        .sortBy(_._1)
      ((System.nanoTime() - t0) / 1e9, jobs.get - j0, learned)
    }

    learn(5, 64, 0L) // warm, untimed
    val (tSeq, jSeq, lSeq) = learn(seqMerges, 1, 0L)
    val (tBat, jBat, lBat) = learn(merges, 64, 0L)
    // the DEFAULT budget, not a literal: round 10 made the gate price
    // the trainer working set (estimate x4), so a hard-coded 64 MiB
    // would now be a 16 MiB collect ceiling and this probe would
    // silently measure the distributed path instead of the driver
    // finisher it exists to measure (REVIEW)
    val (tDrv, jDrv, lDrv) =
      learn(merges, 64, graft.operators.TextOps.DefaultDriverFinishBytes)
    val prefixEqual = lBat.take(lSeq.length).sameElements(lSeq) &&
      lDrv.sameElements(lBat)

    // large-vocabulary stress for the driver trainer: the synthetic
    // documents corpus has a tiny CLOSED vocabulary (the pair table
    // exhausts at ~89 merges at every SF), so the real-vocabulary
    // claim needs its own fixture — 200k xorshift word draws over an
    // 8-letter alphabet (short lengths collide, so the DISTINCT
    // vocabulary is smaller; the probe reports the measured count,
    // not the draw count), merges in the tokenizer-training range
    val bigVocab = {
      var x = 88172645463325252L
      def nxt(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
      (0 until 200000).map { _ =>
        val len = 3 + (math.abs(nxt()) % 10).toInt
        (0 until len).map(_ => ('a' + (math.abs(nxt()) % 8)).toChar)
          .mkString
      }
    }
    val sqlc = spark
    import sqlc.implicits._
    val bigDf = bigVocab.toDF("text")
    val bigDistinct = bigVocab.distinct.size
    val bigMerges = 10000
    val jBig0 = jobs.get
    val tBig0 = System.nanoTime()
    val bigLearned = graft.operators.TextOps
      .bpeLearn(bigDf, "text", bigMerges, 64,
        graft.operators.TextOps.DefaultDriverFinishBytes).count()
    val tBig = (System.nanoTime() - tBig0) / 1e9
    val jBig = jobs.get - jBig0

    println(
      s"""{"probe":"bpe_batch","sf_dir":"$sfDir",""" +
      s""""seq_merges":$seqMerges,"seq_jobs":$jSeq,"seq_sec":$tSeq,""" +
      s""""batched_merges":${lBat.length},"batched_jobs":$jBat,""" +
      s""""batched_sec":$tBat,""" +
      s""""driver_merges":${lDrv.length},"driver_jobs":$jDrv,""" +
      s""""driver_sec":$tDrv,""" +
      s""""jobs_per_merge_seq":${jSeq.toDouble / math.max(1, lSeq.length)},""" +
      s""""jobs_per_merge_batched":${jBat.toDouble / math.max(1, lBat.length)},""" +
      s""""jobs_per_merge_driver":${jDrv.toDouble / math.max(1, lDrv.length)},""" +
      s""""learned_equal_across_paths":$prefixEqual,""" +
      s""""big_vocab_word_draws":200000,""" +
      s""""big_vocab_distinct_words":$bigDistinct,""" +
      s""""big_vocab_merges":$bigLearned,""" +
      s""""big_vocab_sec":$tBig,"big_vocab_jobs":$jBig}""")
    spark.stop()
  }
}
