package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.core.Pins

/** The preemption-survival gate: kill an executor JVM MID-QUERY inside
  * a real operator and require the result to still hash-match.
  *
  * [[ExecutorLossProbe]] proves one isolated pin re-read survives
  * executor loss; this gate proves the claim the pin backends actually
  * exist for — a durable-lifecycle OPERATOR (IVF-PQ build/serve/
  * compact/expire, incremental dedup, streaming appends) running under
  * `local-cluster` keeps producing the byte-identical answer when one
  * of its executor processes dies at full speed mid-stage and Spark
  * retries on the survivor + the relaunched executor.
  *
  * One invocation = one query + one phase, its own Spark cluster, its
  * own JVM — a kill can poison scheduler state, so nothing is shared
  * across measurements (same isolation discipline as
  * ExecutorLossProbe). A driving loop compares phases:
  *
  *   ChaosGate clean <backend> <sfDir> <query>
  *     → {"query":..,"phase":"clean","wall_ms":..,"hash":..}
  *   ChaosGate chaos <backend> <sfDir> <query> <killDelayMs>
  *     → {"query":..,"phase":"chaos","survived":..,"hash":..,
  *        "killed_during":..,"victim_pid":..,"wall_ms":..}
  *
  * `hash` is a canonical result fingerprint (columns sorted by name,
  * every cell cast to string, rows sorted, sha256) — identical clean
  * and chaos hashes mean the loss was invisible to the result; the
  * CORRECTNESS gate separately proves clean == DuckDB oracle, so the
  * chain is oracle == clean == chaos.
  *
  * Expected: `reliable` and `replicated` survive with matching hashes;
  * `local` (lineage truncated, single block copy) fails loudly — the
  * documented non-preemptible-cluster trade.
  */
object ChaosGate {

  /** The durable-lifecycle family — every operator whose intermediate
    * state rides the pin backends through an iterative or streaming
    * lifecycle (VERDICT r16 #1).
    */
  val Family: Seq[String] = Seq(
    "s21_ivfpq_index_serve", "s22_ivfpq_index_lifecycle",
    "s23_filtered_knn_capped", "s24_ivfpq_index_compact",
    "s25_ivfpq_index_delete", "s26_dedup_feedback_delete",
    "s27_ivfpq_index_expire", "s28_ivfpq_index_maintain",
    "st16_incremental_semantic_stream", "st17_ivfpq_append_stream",
    "st18_ivfpq_compact_stream", "st19_ivfpq_expire_stream",
    "d16_semantic_index_compact", "d17_minhash_index_delete",
    "d18_minhash_index_expire")

  private def session(backend: String): SparkSession = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER",
      "local-cluster[2,4,4096]")
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-chaos-ck-").toString
    val spark = SparkSession.builder()
      .master(master)
      .appName(s"chaos-gate-$backend")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config(Pins.BackendConf, backend)
      .config(Pins.DirConf, ckDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // both executors registered before any work (driver entry + 2)
    val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
    while (spark.sparkContext.getExecutorMemoryStatus.size < 3 &&
        System.nanoTime() < deadline) Thread.sleep(200)
    spark
  }

  /** Canonical result fingerprint: column names sorted, every cell cast
    * to string, rows rendered + sorted, sha256 over the lot.
    */
  private def fingerprint(df: DataFrame): String = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    val rows = df.select(array(cols.toIndexedSeq: _*).as("r")).collect()
      .map(_.getSeq[String](0)
        .map(v => if (v == null) "\u0000" else v).mkString("\u0001"))
      .sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.foreach(r => md.update((r + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    if (args(0) == "cleanall") {
      // all clean hashes from ONE session (no kills → nothing to
      // isolate; a fresh cluster per clean pass would cost hours).
      // PinsBackendSpec proves hashes are backend-invariant, so one
      // clean pass references BOTH chaos backends.
      val (backend, sfDir) = (args(1), args(2))
      val spark = session(backend)
      Family.foreach { q =>
        val t0 = System.nanoTime()
        val out =
          try Right(fingerprint(SparkEntry.queries(q)(spark, sfDir)))
          catch { case e: Throwable =>
            Left(Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.next().take(200)) }
        val wallMs = (System.nanoTime() - t0) / 1000000
        out match {
          case Right(h) => println(
            s"""{"query":"$q","backend":"$backend","phase":"clean",""" +
              s""""survived":true,"hash":"$h","wall_ms":$wallMs}""")
          case Left(m) => println(
            s"""{"query":"$q","backend":"$backend","phase":"clean",""" +
              s""""survived":false,"error":"${m.replace("\"", "'")}",""" +
              s""""wall_ms":$wallMs}""")
        }
        System.out.flush()
      }
      try spark.stop() catch { case _: Throwable => () }
      sys.exit(0)
    }
    val (phase, backend, sfDir, query) = (args(0), args(1), args(2), args(3))
    val fn = SparkEntry.queries.getOrElse(query,
      sys.error(s"unknown query: $query"))
    val spark = session(backend)

    val killedDuring = new java.util.concurrent.atomic.AtomicBoolean(false)
    val victimPid = new java.util.concurrent.atomic.AtomicLong(-1L)
    val jobsAtKill = new java.util.concurrent.atomic.AtomicInteger(-1)
    val queryDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    // progress-triggered kill: a fresh JVM front-loads codegen/session
    // warm-up inside the first job, so a pure time delay could fire
    // before the operator has built any of the pinned state the gate
    // is about to destroy. Count job starts and kill only once the
    // operator is demonstrably mid-lifecycle (>= minJobs jobs launched)
    // AND the time delay has passed.
    val jobsStarted = new java.util.concurrent.atomic.AtomicInteger(0)
    val killer = if (phase == "chaos") {
      val delayMs = args(4).toLong
      val minJobs = args.lift(5).map(_.toInt).getOrElse(8)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobsStarted.incrementAndGet(); ()
          }
        })
      val t = new Thread(() => {
        val t0 = System.nanoTime()
        def elapsedMs = (System.nanoTime() - t0) / 1000000
        while (!queryDone.get &&
            (elapsedMs < delayMs || jobsStarted.get < minJobs))
          Thread.sleep(25)
        // only kill MID-QUERY — a post-completion kill proves nothing;
        // killed_during=false in the output means "re-run with a
        // smaller delay/minJobs", never "passed"
        if (!queryDone.get) ExecutorLossProbe.victimsOf(spark) match {
          case v +: _ =>
            jobsAtKill.set(jobsStarted.get)
            victimPid.set(v.pid())
            v.destroyForcibly()
            killedDuring.set(!queryDone.get)
          case _ => () // cluster already lost its executors; nothing to do
        }
      }, "graft-chaos-killer")
      t.setDaemon(true); t.start(); Some(t)
    } else None

    val t0 = System.nanoTime()
    val outcome =
      try {
        val h = fingerprint(fn(spark, sfDir))
        queryDone.set(true)
        Right(h)
      } catch { case e: Throwable =>
        queryDone.set(true)
        Left(Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.next().take(200))
      }
    val wallMs = (System.nanoTime() - t0) / 1000000
    killer.foreach(_.join(15000))

    val json = outcome match {
      case Right(h) =>
        s"""{"query":"$query","backend":"$backend","phase":"$phase",""" +
          s""""survived":true,"hash":"$h","wall_ms":$wallMs,""" +
          s""""killed_during":${killedDuring.get},""" +
          s""""jobs_at_kill":${jobsAtKill.get},""" +
          s""""victim_pid":${victimPid.get}}"""
      case Left(msg) =>
        s"""{"query":"$query","backend":"$backend","phase":"$phase",""" +
          s""""survived":false,"error":"${msg.replace("\\", "/")
            .replace("\"", "'")}","wall_ms":$wallMs,""" +
          s""""killed_during":${killedDuring.get},""" +
          s""""jobs_at_kill":${jobsAtKill.get},""" +
          s""""victim_pid":${victimPid.get}}"""
    }
    try spark.stop() catch { case _: Throwable => () }
    println(json)
    System.out.flush()
    // a kill -9'd executor can leave non-daemon cleanup threads behind
    sys.exit(0)
  }
}
