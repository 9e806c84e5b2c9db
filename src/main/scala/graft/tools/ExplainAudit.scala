package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan auditor: prints key physical-plan properties for every declared
  * query and flags scale hazards — missing parquet filter pushdown,
  * unexpected cartesian products, missing broadcasts, full-read scans.
  *
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [namePrefix...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val prefixes = if (args.length > 1) args.drop(1).toSeq else Seq("")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // the registered graft_* SQL functions (q43) resolve only with
      // the extensions installed — without this the audit would report
      // a build failure instead of the plan
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.allQueries.filter(q => prefixes.exists(q.name.startsWith))
      .foreach { q =>
        try {
          val df = q.build(spark, sfDir)
          val plan = df.queryExecution.executedPlan.toString()
          val flags = Seq(
            "PushedFilters: [" -> plan.contains("PushedFilters: ["),
            "pushed-nonempty" ->
              "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
            "broadcast" -> plan.contains("BroadcastHashJoin"),
            "CARTESIAN!" -> plan.contains("CartesianProduct"),
            "NESTEDLOOP!" -> plan.contains("BroadcastNestedLoopJoin"),
            "codegen" -> plan.contains("WholeStageCodegen"),
            "partition-pruned" ->
              "PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
            // bucketed/co-located plans should show none of these
            "shuffle" -> plan.contains("Exchange"),
            "SMJ" -> plan.contains("SortMergeJoin"))
          val on = flags.filter(_._2).map(_._1).mkString(", ")
          println(f"AUDIT ${q.name}%-28s $on")
          // ReadSchema width per scan: catch unpruned reads
          "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).foreach { m =>
            val cols = m.group(1).split(",").length
            println(s"AUDIT   readschema cols=$cols: ${m.group(1).take(100)}")
          }
        } catch {
          case e: Throwable =>
            println(s"AUDIT ${q.name} ERROR ${e.getMessage.linesIterator.next()}")
        }
      }
    spark.stop()
  }
}
