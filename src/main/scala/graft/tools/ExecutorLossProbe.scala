package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Pins
import graft.core.Pins.PinnedDataset

/** The executor-loss demonstration the pin backends exist for — run
  * against REAL separate executor JVMs, not an in-JVM block drop.
  *
  * PinsBackendSpec proves recovery from total block loss inside one
  * JVM (`rdd.unpersist(true)` stands in for the lost executor). This
  * probe does the real thing: a `local-cluster[2,c,mem]` session, a
  * pinned dataset whose blocks live on two executor processes, then
  * `kill -9` one executor JVM and re-read the pin.
  *
  *  - `local`     — blocks on executors are the ONLY copy and lineage
  *                  is truncated: the re-read must FAIL (loudly; this
  *                  is the documented non-preemptible-cluster trade).
  *  - `reliable`  — the pin's checkpoint FILES are the recovery story:
  *                  the re-read recomputes from the DFS and succeeds.
  *  - `replicated`— every block has a second copy on the surviving
  *                  executor: the re-read succeeds from the replica.
  *
  * Run with SPARK_HOME + SPARK_SCALA_VERSION=2.13 +
  * -Dspark.executor.extraClassPath=<classes> (the local-cluster
  * recipe). One backend per invocation — a failed job can leave
  * scheduler state worth isolating:
  *   ExecutorLossProbe <backend> [ckDir]
  * Prints one JSON line:
  *   {"backend":"...","survived":bool,"correct":bool,"detail":"..."}
  */
object ExecutorLossProbe {
  /** This app's executor JVMs, identified by the `--app-id <id>` on
    * the CoarseGrainedExecutorBackend command line — never another
    * application's.
    */
  def victimsOf(spark: SparkSession): Seq[ProcessHandle] = {
    val appId = spark.sparkContext.applicationId
    ProcessHandle.allProcesses().iterator().asScala
      .filter { p =>
        val cmd = p.info().commandLine().orElse("")
        cmd.contains("CoarseGrainedExecutorBackend") &&
          cmd.contains(appId)
      }
      .toSeq
  }

  def main(args: Array[String]): Unit = {
    val backend = args.headOption.getOrElse("reliable")
    val ckDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-loss-ck-").toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER",
        "local-cluster[2,2,2048]"))
      .appName(s"executor-loss-$backend")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config(Pins.BackendConf, backend)
      .config(Pins.DirConf, ckDir)
      // one task retry round is enough to show recovery; without a cap
      // the local backend's doomed re-read grinds through 4 stage
      // retries before failing
      .config("spark.task.maxFailures", "2")
      .config("spark.stage.maxConsecutiveAttempts", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // wait until BOTH executors registered (their block managers are
    // where the pin's blocks will live)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (spark.sparkContext.getExecutorMemoryStatus.size < 3 &&
        System.nanoTime() < deadline) Thread.sleep(200)

    val n = 2000000L
    val want = n * (n - 1) / 2
    // 8 partitions spread across both executors; the pin materializes
    // every block before the kill
    val df = spark.range(0L, n, 1L, 8).toDF("id").pin()
    val before = df.agg(sum(col("id"))).head().getLong(0)
    require(before == want, s"pre-kill read wrong: $before != $want")

    // the executor JVMs are separate OS processes
    // (CoarseGrainedExecutorBackend) launched with THIS app's id on
    // their command line; kill -9 one of OURS. Matching the app id is
    // what keeps a concurrently running unrelated Spark application's
    // executors safe from this probe (round-16 ADVICE).
    victimsOf(spark) match {
      case v +: _ +: _ => v.destroyForcibly()
      case v => sys.error(
        s"expected >=2 executor processes for app " +
          s"${spark.sparkContext.applicationId}, saw ${v.size} — " +
          "is this really local-cluster?")
    }
    // let the master/driver notice the loss (heartbeat + RPC teardown)
    Thread.sleep(4000)

    val got =
      try Right(df.agg(sum(col("id"))).head().getLong(0))
      catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.next().take(160))
      }
    val (survived, correct, detail) = got match {
      case Right(v) => (true, v == want, s"re-read sum=$v want=$want")
      case Left(msg) => (false, false, msg)
    }
    spark.stop()
    println(s"""{"backend":"$backend","survived":$survived,""" +
      s""""correct":$correct,"detail":"${detail.replace("\"", "'")}"}""")
    System.out.flush()
  }
}
