package graft

import graft.queries.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[GraftQuery]] group into the `queries` / `oracleSql`
  * maps the driver's correctness (DuckDB oracle) and bench harnesses run.
  */
object SparkEntry {

  /** Every declared query of the engine, grouped by module.
    *
    * Uniqueness is validated HERE so every derived map (`queries`,
    * `oracleSql`, any future consumer) is protected: Map.toMap silently
    * shadows duplicates, and a copy-pasted query name would otherwise
    * vanish from the driver's correctness gate without a trace (the
    * round-6 silent-death mode through another door). */
  def allQueries: Seq[GraftQuery] = {
    val qs = graft.queries.Relational.all ++
      graft.queries.Dedup.all ++
      graft.queries.Similarity.all ++
      graft.queries.TextAnalysis.all ++
      graft.queries.Multimodal.all ++
      graft.queries.PipelineExtra.all ++
      graft.queries.River.all ++
      graft.queries.Streaming.all
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate query names would shadow in the gate: ${dup.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (name
    * uniqueness enforced in [[allQueries]]). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The driver contract allows omitting an
    * oracle (it then records a weaker rows-only check), but this
    * engine's POLICY is full coverage: every declared query ships one,
    * pinned by VerifySpec — a new operator must come with its DuckDB
    * spelling, however contorted (see d03's SimHash CTE for how far
    * that can go). */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
