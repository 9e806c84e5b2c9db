package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Tables are read straight from parquet so Catalyst keeps full pushdown:
  * filters and column pruning reach the parquet scan (`PushedFilters` /
  * `ReadSchema` in `.explain`), and partition-level parallelism follows
  * `spark.sql.files.maxPartitionBytes`. At 100 TB these would be the same
  * calls against a partitioned table root; nothing here assumes local mode.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    // rejects at schema inference (PARQUET_TYPE_ILLEGAL) — read it as a
    // raw nanos long instead; convert at use sites if event-time is needed.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register all tables as temp views so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
