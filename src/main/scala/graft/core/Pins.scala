package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** The one pin primitive.
  *
  * Every operator in this engine that materializes an intermediate —
  * dedup staging, k-means members, ANN batch signatures, pack cumsums —
  * pins it eagerly so (a) downstream jobs re-read blocks instead of
  * re-running lineage and (b) Catalyst can't re-inline the subtree into
  * every consumer. Through round 14 that pin was a bare
  * `Dataset.localCheckpoint()`: correct and free on local[32], but the
  * blocks live unreplicated on executors with lineage truncated — on a
  * preemptible/decommissioning cluster, one lost executor mid-way
  * through an hours-long corpus build makes the block unrecoverable and
  * fails the job.
  *
  * `Pins.pin` keeps the call-site discipline (pin eagerly, release when
  * consumed) and makes the storage backend a deployment decision,
  * selected by `spark.graft.pin.backend`:
  *
  *  - `local` (default) — `localCheckpoint()`. Single-node / non-preempt
  *    clusters: fastest, blocks on executors, lineage truncated.
  *  - `reliable` — `Dataset.checkpoint()` into the context checkpoint
  *    dir (set it to HDFS/S3 via `SparkContext.setCheckpointDir` or
  *    `spark.graft.pin.checkpointDir`). Survives any executor loss;
  *    costs one write+read of the pinned data through the DFS.
  *  - `replicated` — eager `localCheckpoint` at `MEMORY_AND_DISK_2`:
  *    lineage truncated (the pin discipline requires it — several
  *    operators destroy their centroid/sketch broadcasts once the pin
  *    is materialized, so any backend that kept lineage would fail
  *    task serialization later) with TWO executor copies of every
  *    block. One lost executor recovers from the replica; only a
  *    double loss fails. Middle ground when a checkpoint DFS
  *    round-trip is too slow.
  *
  * All three are plan-pinning (downstream plans read a materialized
  * scan, never the original lineage), so query results and plan-shape
  * gates are backend-invariant; PinsBackendSpec proves hash equality
  * across backends on representative operator chains.
  */
object Pins {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.Pins")

  /** Conf key selecting the backend: local | reliable | replicated. */
  final val BackendConf = "spark.graft.pin.backend"
  /** Checkpoint dir used by the `reliable` backend when the context has
    * none set. On a real cluster point this at durable shared storage.
    */
  final val DirConf = "spark.graft.pin.checkpointDir"

  def backend(spark: SparkSession): String =
    spark.conf.get(BackendConf, "local")

  /** Cumulative bytes written to the checkpoint dir by `reliable`
    * pins in this JVM — the durability bill a deployer pays over
    * `local`. Summed at pin time (one FS content walk of the pin's
    * own rdd-N dir, trivial next to the checkpoint write itself);
    * reclamation on release does NOT subtract, so this is write
    * traffic, not residency. Bench surfaces it per recording.
    */
  val checkpointedBytes = new java.util.concurrent.atomic.AtomicLong

  /** Last reliable-pin FS failure (byte accounting or reclamation),
    * `"<op> <path>: <exception>"` — set in the same statement that
    * WARN-logs it, so specs can assert the warning fired without
    * scraping log output. Null until the first failure.
    */
  private[graft] val lastFsFailure =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** FS seams so a spec can inject an IOException at the exact
    * boundary a flaky DFS would throw from. Production defaults are
    * the plain Hadoop calls; only PinsBackendSpec swaps them.
    */
  private[graft] var fsLength:
      (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) => Long =
    (fs, p) => fs.getContentSummary(p).getLength
  private[graft] var fsDelete:
      (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) => Boolean =
    (fs, p) => fs.delete(p, true)

  /** A deployer must SEE reclamation/accounting failing — a silently
    * swallowed IOException here restores the unbounded-scratch growth
    * reclamation exists to stop (round-16 "What's wrong #1"). The pin
    * itself still succeeds/releases its blocks; only the FS side
    * effect is lost, which is exactly what the WARN says.
    */
  private def warnFs(op: String, p: org.apache.hadoop.fs.Path,
      e: java.io.IOException): Unit = {
    lastFsFailure.set(s"$op $p: $e")
    log.warn(s"reliable-pin $op failed for $p — checkpoint scratch " +
      "may be leaking on the DFS; inspect and reclaim manually", e)
  }

  /** Materialize `ds` eagerly under the configured backend and return a
    * Dataset whose plan reads the materialized blocks.
    */
  def pin[T](ds: Dataset[T]): Dataset[T] = backend(ds.sparkSession) match {
    case "local" => ds.localCheckpoint()
    case "reliable" =>
      val sc = ds.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = ds.sparkSession.conf.getOption(DirConf).getOrElse(
          throw new IllegalStateException(
            s"$BackendConf=reliable needs a checkpoint dir: call " +
              s"SparkContext.setCheckpointDir or set $DirConf"))
        sc.setCheckpointDir(dir)
      }
      val out = ds.checkpoint()
      out.queryExecution.analyzed match {
        case lr: LogicalRDD => lr.rdd.getCheckpointFile.foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          try checkpointedBytes.addAndGet(
            fsLength(p.getFileSystem(sc.hadoopConfiguration), p))
          catch { case e: java.io.IOException => warnFs("byte-meter", p, e) }
        }
        case _ => ()
      }
      out
    case "replicated" =>
      ds.localCheckpoint(eager = true, StorageLevel.MEMORY_AND_DISK_2)
    case other => throw new IllegalArgumentException(
      s"$BackendConf=$other: expected local | reliable | replicated")
  }

  /** Free the storage behind a pinned Dataset once fully consumed.
    * All three backends produce checkpoint-shaped plans (LogicalRDD):
    * release drops the wrapped RDD's blocks, and for `reliable` pins
    * ALSO deletes the pin's checkpoint directory — the files are
    * per-pin scratch whose recovery value ends the moment the pin is
    * fully consumed; without reclamation an hours-long corpus build
    * under `reliable` writes one DFS copy per pin across every
    * iterative loop and frees none of it (round-15 "What's wrong #1").
    * The release contract ("fully consumed, never re-read") is the
    * same one the `local` backend already enforces the hard way:
    * lineage is truncated and the blocks are the only copy, so any
    * release-then-re-read site would have failed the local gate first.
    * No-op on an unpinned Dataset — never unpersists a caller's plain
    * cache through this path.
    */
  def release[T](ds: Dataset[T]): Unit = {
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val rdd = lr.rdd
        // getCheckpointFile is Some only for reliable checkpoints
        rdd.getCheckpointFile.foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          try fsDelete(p.getFileSystem(
            ds.sparkSession.sparkContext.hadoopConfiguration), p)
          catch { case e: java.io.IOException => warnFs("reclamation", p, e) }
        }
        rdd.unpersist(false)
      case _ => ()
    }
    ()
  }

  /** `df.pin()` call-site spelling; the whole engine pins through this. */
  implicit class PinnedDataset[T](private val ds: Dataset[T]) extends AnyVal {
    def pin(): Dataset[T] = Pins.pin(ds)
    def releasePin(): Unit = Pins.release(ds)
  }
}
