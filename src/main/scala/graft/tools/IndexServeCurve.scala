package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.plans.PlanWalk
import graft.core.Pins.PinnedDataset

/** OPERATING CURVE for the durable IVF-PQ serve (round-12 ask #5):
  * correctness pins recall at the construction ceiling and bit-parity
  * points, but a deployment tunes `(nprobe, rerankDepth)` — this probe
  * prices the whole dial against the three costs that matter at 100 TB:
  * recall@k vs the CEILING ORACLE (nprobe = cells + unbounded depth ==
  * the exact filtered brute force, the s21/s22 construction argument,
  * so the truth set comes from the index itself and stays exact no
  * matter what the frozen artifacts look like), files read per serve
  * (from the executed plans' own FileSourceScan metrics — the d10/d13
  * pricing discipline), and wall seconds. The same grid re-measures
  * AFTER a year-of-appends + tombstone wave + compaction, so the curve
  * shows what maintenance buys at every dial, not just at the ceiling.
  *
  * Usage: IndexServeCurve <sfDir>
  */
object IndexServeCurve {
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
    import spark.implicits._

    val cells = 16
    val k = 5
    val src = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"source")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .join(src, $"vec_id" === $"doc_id")
      .select($"vec_id", $"embedding", $"source")
      .pin()
    val n = emb.count()
    val idx = java.nio.file.Files
      .createTempDirectory("graft-serve-curve-").toString
    graft.operators.AnnOps.buildIvfPqIndex(emb, "vec_id", "embedding",
      "source", idx, cells = cells, iters = 2, pqM = 4, pqKs = 4,
      pqIters = 2)
    // a REALISTIC query batch (not the prune probe's 4): 64 corpus
    // members — wide enough that per-dial recall is a distribution,
    // small enough that the probed-cell union still prunes
    val queries = emb.filter($"vec_id" < 64).pin()

    def indexScans(plans: Seq[SparkPlan]): Seq[FileSourceScanExec] =
      PlanWalk.indexScans(plans, idx)

    /** One serve: (result rows as (qid, Set[neighbor]), files, sec). */
    def serveAt(nprobe: Int, depth: Int)
        : (Map[Long, Seq[Long]], Long, Double) = {
      var sec = 0.0
      var rows: Array[(Long, Long)] = Array.empty
      val plans = PlanWalk.capturePlans(spark,
          p => indexScans(p).size >= 3) {
        val t0 = System.nanoTime()
        val out = graft.operators.AnnOps.queryIvfPqIndex(queries,
          "vec_id", "embedding", "source", idx, k = k, nprobe = nprobe,
          rerankDepth = depth)
        rows = out.select($"qid", $"neighbor_id")
          .as[(Long, Long)].collect()
        sec = (System.nanoTime() - t0) / 1e9
        graft.operators.DedupOps.releaseLocalCheckpoint(out)
      }
      val scans = indexScans(plans)
      require(scans.size >= 3, s"captured only ${scans.size} scans")
      // neighbor lists sorted: collect() encounter order tracks file
      // layout, so the sprawl-vs-compacted truth equality below would
      // spuriously fail on identical result SETS returned in a
      // different per-query order after compaction rewrites the files
      (rows.groupBy(_._1).map { case (q, ns) =>
        (q, ns.map(_._2).sorted.toSeq) },
        scans.map(_.metrics("numFiles").value).sum, sec)
    }

    /** Mean recall@k of `got` against the ceiling truth. */
    def recall(truth: Map[Long, Seq[Long]],
        got: Map[Long, Seq[Long]]): Double = {
      val per = truth.toSeq.map { case (q, t) =>
        if (t.isEmpty) 1.0
        else got.getOrElse(q, Seq.empty).toSet.intersect(t.toSet).size
          .toDouble / t.size
      }
      per.sum / per.size
    }

    val grid = Seq((1, k), (1, 4 * k), (2, 4 * k), (4, 4 * k),
      (4, 16 * k), (8, 16 * k), (cells, Int.MaxValue))

    // BATCH-WIDTH sweep at one production dial: serve I/O is bounded
    // by the probed-cell UNION, so it scales with how many cells the
    // query batch collectively probes — narrow batches get the
    // per-query partition pruning (the IndexPruneProbe regime), wide
    // batches saturate the cell space and their I/O lever is
    // compaction. This measures the crossover on real data.
    def widthSweep(): Seq[String] = Seq(1, 4, 16, 64).map { w =>
      val qs = emb.filter($"vec_id" < w).pin()
      var sec = 0.0
      val plans = PlanWalk.capturePlans(spark,
          p => indexScans(p).size >= 3) {
        val t0 = System.nanoTime()
        val out = graft.operators.AnnOps.queryIvfPqIndex(qs, "vec_id",
          "embedding", "source", idx, k = k, nprobe = 2,
          rerankDepth = 4 * k)
        out.count()
        sec = (System.nanoTime() - t0) / 1e9
        graft.operators.DedupOps.releaseLocalCheckpoint(out)
      }
      val files = indexScans(plans).map(_.metrics("numFiles").value).sum
      graft.operators.DedupOps.releaseLocalCheckpoint(qs)
      s"""{"batch_queries":$w,"nprobe":2,"files_read":$files,""" +
        s""""sec":${math.rint(sec * 1000) / 1000}}"""
    }

    def sweep(): (Map[Long, Seq[Long]], Seq[String]) = {
      val (truth, _, _) = serveAt(cells, Int.MaxValue)
      val rows = grid.map { case (p, d) =>
        val (got, files, sec) = serveAt(p, d)
        val r = recall(truth, got)
        val dTxt = if (d == Int.MaxValue) "\"inf\"" else d.toString
        s"""{"nprobe":$p,"depth":$dTxt,""" +
          s""""recall_at_$k":${math.rint(r * 10000) / 10000},""" +
          s""""files_read":$files,""" +
          s""""sec":${math.rint(sec * 1000) / 1000}}"""
      }
      (truth, rows)
    }

    val (truthFresh, fresh) = sweep()
    val widths = widthSweep() // fresh 32-file index, nprobe=2

    // a year of monthly appends under the production write fan-out
    // (coalescing off — the IndexPruneProbe rationale), a tombstone
    // wave, then compaction; the SAME grid re-prices the dial
    val nBatches = 12
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "false")
    (1 to nBatches).foreach { b =>
      graft.operators.AnnOps.appendIvfPqIndex(
        emb.filter($"vec_id" % nBatches === lit((b - 1).toLong))
          .select(($"vec_id" + lit(1000000000L) * b).as("vec_id"),
            $"embedding", $"source"),
        "vec_id", "embedding", "source", idx, b.toLong)
    }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "true")
    graft.operators.AnnOps.deleteFromIndex(
      spark.read.parquet(
          s"${graft.operators.AnnOps.liveIndexRoot(spark, idx)}/batches")
        .select($"id").filter($"id" >= 64 && $"id" % 7 === 0),
      "id", idx, batchId = 99L)
    val (truthSprawl, sprawl) = sweep()
    val t0 = System.nanoTime()
    graft.operators.AnnOps.compactIndex(spark, idx)
    val compactSec = (System.nanoTime() - t0) / 1e9
    val (truthC, compacted) = sweep()
    // REAL sanity (REVIEW: a non-empty check is vacuous): compaction
    // must not move the ceiling truth — tombstones were anti-joined
    // pre-compaction and physically dropped post, so the two maps must
    // be row-identical or the probe is pricing a corrupted index
    require(truthC == truthSprawl,
      "compaction changed the ceiling truth: " +
        s"${truthC.size} vs ${truthSprawl.size} queries, diff keys " +
        (truthC.keySet union truthSprawl.keySet)
          .filter(k => truthC.get(k) != truthSprawl.get(k)).take(5))

    println(s"""{"metric":"serve_curve","sf_dir":"$sfDir","n":$n,""" +
      s""""cells":$cells,"k":$k,"queries":64,""" +
      s""""batch_width_fresh":[${widths.mkString(",")}],""" +
      s""""fresh":[${fresh.mkString(",")}],""" +
      s""""after_appends":[${sprawl.mkString(",")}],""" +
      s""""after_compaction":[${compacted.mkString(",")}],""" +
      s""""compact_sec":${math.rint(compactSec * 1000) / 1000},""" +
      s""""truth_queries":${truthFresh.size}}""")
    spark.stop()
  }
}
