package graft

import graft.queries.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[GraftQuery]] group into the `queries` / `oracleSql`
  * maps the driver's correctness (DuckDB oracle) and bench harnesses run.
  */
object SparkEntry {

  /** Every declared query of the engine, grouped by module. */
  def allQueries: Seq[GraftQuery] =
    graft.queries.Relational.all ++
      graft.queries.Dedup.all ++
      graft.queries.Similarity.all ++
      graft.queries.TextAnalysis.all ++
      graft.queries.Multimodal.all ++
      graft.queries.PipelineExtra.all ++
      graft.queries.River.all ++
      graft.queries.Streaming.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // toMap SILENTLY drops earlier entries on a duplicate name — a
    // copy-pasted query name would vanish from the driver's correctness
    // gate without a trace (the round-6 silent-death mode through
    // another door). Refuse loudly instead.
    val dup = allQueries.groupBy(_.name).collect {
      case (n, qs) if qs.size > 1 => n
    }
    require(dup.isEmpty,
      s"duplicate query names would shadow in the gate: ${dup.mkString(", ")}")
    allQueries.map(q => q.name -> q.build).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
