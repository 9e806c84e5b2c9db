package graft.ingest

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet datasets — the housekeeping pass
  * every long-running ingest pipeline needs: micro-batch sinks and
  * per-sweep ingesters accumulate many small files, and at scale the
  * file count (driver listing, task scheduling, footer reads) becomes
  * the bottleneck before data size does.
  *
  * Bin-packs the dataset into `ceil(totalBytes / targetBytes)` files
  * via `repartition(n)` (even-sized output; `coalesce` would skew to
  * input locality), writes to a sibling temp dir, then atomically
  * swaps. Partitioned datasets (`col=value` subdirs) are compacted
  * per-partition to preserve pruning.
  */
object Compaction {

  /** Returns (filesBefore, filesAfter). */
  def compactDir(
      spark: SparkSession,
      dir: Path,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val files = listParquet(dir)
    val totalBytes = files.map(f => Files.size(f)).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = dir.resolveSibling(dir.getFileName.toString + ".compact-tmp")
    val bak = dir.resolveSibling(dir.getFileName.toString + ".compact-old")

    val df = spark.read.parquet(dir.toString)
    val partCols = df.schema.fields.map(_.name).toSeq
      .filter(c => Files.list(dir).anyMatch(p =>
        p.getFileName.toString.startsWith(s"$c=")))
    val writer = df.repartition(n).write.mode("overwrite")
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(tmp.toString)

    // swap: dir -> .old, tmp -> dir, drop .old (atomic at the rename
    // level; a crash between renames leaves .old recoverable)
    Files.move(dir, bak, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(bak.toFile)
    (files.size, listParquet(dir).size)
  }

  private def listParquet(dir: Path): Seq[Path] = {
    val out = Seq.newBuilder[Path]
    Files.walk(dir).forEach { p =>
      if (p.toString.endsWith(".parquet") && Files.isRegularFile(p)) out += p
    }
    out.result()
  }
}
