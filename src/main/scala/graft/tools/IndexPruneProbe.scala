package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.plans.PlanWalk
import graft.core.Pins.PinnedDataset

/** Scale probe for the cell-partitioned durable-index layout (round-11
  * ask #1): build an IVF-PQ index over the testdata embeddings, then
  * serve the SAME query batch at increasing `nprobe` and MEASURE — via
  * the executed plans' own scan metrics, not directory arithmetic —
  * how many stored-index files (and bytes) each serve actually reads.
  * With the `batch=<b>/cell=<c>` nesting the candidate, ADC-code, and
  * re-rank scans all carry a partition filter on the probed cell set,
  * so files-read must grow ∝ |probed cells| / cells and reach the full
  * index only at nprobe = cells; the pre-round-12 layout read 100% of
  * the rows twice and all codes once at EVERY nprobe. Prints one JSON
  * line: total files in the trees, then per-nprobe
  * (probed_cells, files_read, bytes_read, serve seconds).
  *
  * Usage: IndexPruneProbe <sfDir>
  */
object IndexPruneProbe {
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
    val src = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"source")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .join(src, $"vec_id" === $"doc_id")
      .select($"vec_id", $"embedding", $"source")
      .pin()
    val n = emb.count()
    val idx = java.nio.file.Files
      .createTempDirectory("graft-prune-probe-").toString
    graft.operators.AnnOps.buildIvfPqIndex(emb, "vec_id", "embedding",
      "source", idx, cells = cells, iters = 2, pqM = 4, pqKs = 4,
      pqIters = 2)
    // FEW queries so the UNION of probed cells stays well below
    // `cells` at low nprobe (files-read tracks the union, not nprobe
    // per query — the honest denominator, reported alongside)
    val queries = emb.filter($"vec_id" < 4).pin()

    // the live generation's root (the pointer resolution every reader
    // does); re-resolved after maintenance, which installs a new one
    def liveRoot() = graft.operators.AnnOps.liveIndexRoot(spark, idx)
    def treeFiles() =
      PlanWalk.parquetFiles(s"${liveRoot()}/batches").size +
        PlanWalk.parquetFiles(s"${liveRoot()}/codes").size
    val totalFiles = treeFiles()

    def indexScans(plans: Seq[SparkPlan]): Seq[FileSourceScanExec] =
      PlanWalk.indexScans(plans, idx)

    def serveAt(nprobe: Int): (Long, Long, Double) = {
      var sec = 0.0
      // the serve executes 3 pruned index scans (candidate rows,
      // codes, re-rank rows); capture until all three have landed
      val plans = PlanWalk.capturePlans(spark,
          p => indexScans(p).size >= 3) {
        val t0 = System.nanoTime()
        val out = graft.operators.AnnOps.queryIvfPqIndex(queries,
          "vec_id", "embedding", "source", idx, k = 3, nprobe = nprobe,
          rerankDepth = 12)
        val rows = out.count()
        sec = (System.nanoTime() - t0) / 1e9
        require(rows > 0, "serve returned no rows")
        graft.operators.DedupOps.releaseLocalCheckpoint(out)
      }
      val scans = indexScans(plans)
      require(scans.size >= 3, s"captured only ${scans.size} scans")
      (scans.map(_.metrics("numFiles").value).sum,
        scans.map(_.metrics("filesSize").value).sum, sec)
    }

    // probed-cell COUNT measured directly (the same arithmetic the
    // serve collects): distinct union of the queries' top-P cells
    def probedCellCount(nprobe: Int): Long = {
      val cent = spark.read.parquet(s"$idx/centroids")
      val v = graft.operators.AnnOps.scaled(queries, "vec_id",
        "embedding")
      val qv = v.select($"id".as("qid"),
        $"c".as("qc"), sqrt(expr(
          "aggregate(transform(c, x -> x * x), " +
            "CAST(0 AS DECIMAL(38,0)), (a, x) -> a + x)").cast("double"))
          .as("qnrmr"))
      val scored = cent.crossJoin(qv)
        .select($"qid", $"cell",
          when($"qnrmr" > 0 && $"cnrmr" > 0,
            org.apache.spark.sql.graftnative.functions
              .dot_i64($"qc", $"cc").cast("double") /
              ($"qnrmr" * $"cnrmr")).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"score".desc, $"cell".asc)
      val out = scored.withColumn("pr", row_number().over(w))
        .filter($"pr" <= nprobe).select($"cell").distinct().count()
      graft.operators.DedupOps.releaseLocalCheckpoint(v)
      out
    }

    val sweep = Seq(1, 2, 4, cells).map { p =>
      val pc = probedCellCount(p)
      val (files, bytes, sec) = serveAt(p)
      s"""{"nprobe":$p,"probed_cells":$pc,"files_read":$files,""" +
        s""""bytes_read":$bytes,"sec":${math.rint(sec * 1000) / 1000}}"""
    }

    // ---- compaction: a year of "monthly" appends plus a tombstone
    // wave, then compact. At probe scale AQE coalesces each tiny
    // append to ~one file per leaf, hiding the sprawl a busy cluster
    // produces (full shuffle partitions fan one file per task per
    // touched cell) — so the appends run with partition coalescing
    // OFF, the honest simulation of the production write shape. The
    // tombstones make the pre-compaction serve pay the anti-join
    // every reader pays until compaction applies them physically.
    val nBatches = 12
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "false")
    (1 to nBatches).foreach { b =>
      // fresh ids per append (offset well past the corpus range) so
      // the grown index holds distinct rows, like real nightly data
      graft.operators.AnnOps.appendIvfPqIndex(
        emb.filter($"vec_id" % nBatches === lit((b - 1).toLong))
          .select(($"vec_id" + lit(1000000000L) * b).as("vec_id"),
            $"embedding", $"source"),
        "vec_id", "embedding", "source", idx, b.toLong)
    }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "true")
    // takedown wave: every 7th stored doc outside the query range
    graft.operators.AnnOps.deleteFromIndex(
      spark.read.parquet(s"${liveRoot()}/batches")
        .select($"id").filter($"id" >= 4 && $"id" % 7 === 0),
      "id", idx, batchId = 99L)
    val filesSprawl = treeFiles()
    val (readSprawl, _, secSprawl) = serveAt(2)
    val t0 = System.nanoTime()
    graft.operators.AnnOps.compactIndex(spark, idx)
    val compactSec = (System.nanoTime() - t0) / 1e9
    val filesCompact = treeFiles()
    val (readCompact, _, secCompact) = serveAt(2)

    println(s"""{"metric":"index_prune","sf_dir":"$sfDir","n":$n,""" +
      s""""cells":$cells,"total_index_files":$totalFiles,""" +
      s""""sweep":[${sweep.mkString(",")}],""" +
      s""""compaction":{"append_batches":$nBatches,""" +
      s""""files_before":$filesSprawl,"files_after":$filesCompact,""" +
      s""""serve_files_read_before":$readSprawl,""" +
      s""""serve_files_read_after":$readCompact,""" +
      s""""serve_sec_before":${math.rint(secSprawl * 1000) / 1000},""" +
      s""""serve_sec_after":${math.rint(secCompact * 1000) / 1000},""" +
      s""""compact_sec":${math.rint(compactSec * 1000) / 1000}}}""")
    spark.stop()
  }
}
