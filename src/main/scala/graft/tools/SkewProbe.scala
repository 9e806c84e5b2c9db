package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q41 planted-burst skew probe: the binned interval join's shuffle key
  * is the hour bin, so an event BURST (incident traffic, a hot tenant)
  * lands every burst row in one bin — the canonical skew that kills a
  * naive shuffle join. This probe plants a configurable burst into a
  * copy of the given events table (every burst row inside ONE hour,
  * with 'error' probes in the hour AFTER it so the burst bin is on the
  * build side of real intervals), runs the exact q41 spelling on both
  * the original and burst copies, and reports wall times plus whether
  * AQE's skew-join split engaged (OptimizeSkewedJoin leaves a
  * "skew=true" marker on the SMJ in the final adaptive plan).
  *
  * Usage: SkewProbe <sfDir> <burstRows>
  * Prints one JSON line.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val burstRows = args(1).toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").canWrite)
          "/dev/shm/graft-spark-local"
        else System.getProperty("java.io.tmpdir"))
      // make the skew visible to AQE at probe scale (defaults target
      // 256 MB partitions; the probe's burst is tens of MB)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ev = graft.Tables.load(spark, sfDir, "events")
    // plant the burst in the hour after the corpus max ts, probes after
    val maxTs = ev.agg(max($"ts")).head().getLong(0)
    val hourNs = 3600L * 1000 * 1000 * 1000
    val burstStart = (maxTs / hourNs + 1) * hourNs
    val burst = spark.range(burstRows).select(
      ($"id" + 900000000L).as("event_id"),
      (lit(burstStart) + ($"id" % 3600) * 1000000000L).as("ts"),
      ($"id" % 1000).as("user_id"),
      lit("click").as("event_type"),
      lit(0.5).as("value"),
      lit("{}").as("props"))
    // errors in the NEXT hour: each one's [t-1h, t) interval covers the
    // burst bin, so the hot bin sits on the probe join's big side
    val probes = spark.range(200).select(
      ($"id" + 990000000L).as("event_id"),
      (lit(burstStart + hourNs) + ($"id" % 3600) * 1000000000L).as("ts"),
      $"id".as("user_id"),
      lit("error").as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"))

    val burstDir = java.nio.file.Files
      .createTempDirectory("graft-skew-").toString
    ev.unionByName(burst).unionByName(probes)
      .write.mode("overwrite").parquet(s"$burstDir/events.parquet")

    def q41(dir: String): (Double, Boolean, Boolean) = {
      val df = graft.SparkEntry.queries("q41_interval_join")(spark, dir)
      val t0 = System.nanoTime()
      // execute THIS df (collect result is |errors| rows) so its own
      // adaptive plan finalizes — a count() would plan a separate query
      // and the skew-split decision would never appear on df's plan
      df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = (df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString()
      (sec, plan.contains("skew=true"), plan.contains("BroadcastHashJoin"))
    }
    // warm (untimed), then min of three, matching Bench's convention
    q41(sfDir); q41(burstDir)
    val base = (1 to 3).map(_ => q41(sfDir)).minBy(_._1)
    val hot = (1 to 3).map(_ => q41(burstDir)).minBy(_._1)

    // At probe scale the error-probe side broadcasts, so the hot bin
    // never shuffles at all — robustness for free. At 100 TB the probe
    // side outgrows broadcast too; force the shuffle-join path to show
    // AQE's skew split carries the burst there.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    q41(burstDir)
    val hotSmj = (1 to 3).map(_ => q41(burstDir)).minBy(_._1)
    val baseSmj = (1 to 3).map(_ => q41(sfDir)).minBy(_._1)

    println(
      s"""{"probe":"q41_burst_skew","sf_dir":"$sfDir",""" +
      s""""burst_rows":$burstRows,""" +
      s""""base_sec":${base._1},"burst_sec":${hot._1},""" +
      s""""burst_plan_broadcast":${hot._3},""" +
      s""""forced_smj_base_sec":${baseSmj._1},""" +
      s""""forced_smj_burst_sec":${hotSmj._1},""" +
      s""""forced_smj_skew_split_engaged":${hotSmj._2}}""")
    spark.stop()
  }
}
