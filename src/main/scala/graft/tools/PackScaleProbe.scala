package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Pins.PinnedDataset

/** Scale probe for the distributed two-pass packing cumsum (round-12
  * ask #3): the old spelling computed the per-group cumulative token
  * sum with `Window.partitionBy(group)` — ONE task per group, so a
  * low-group-cardinality corpus (one "web" domain is the common case)
  * serialized entirely through one window task. The rewrite shards
  * each group's ord domain ([[graft.operators.PrepOps.groupedCumSum]]),
  * so pack time must stay FLAT as group cardinality drops to 1 — this
  * probe measures exactly that at the given SF: packSequences wall
  * time (min of three passes) over the documents table grouped by (a)
  * the natural `source` cardinality and (b) ONE constant group, plus
  * the shard-occupancy skew of the single-group run (max/mean rows per
  * shard — the equal-width-vs-sampled-range trade, measured).
  *
  * Usage: PackScaleProbe <sfDir>
  */
object PackScaleProbe {
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

    // whitespace token counts — the cheap pricing column, so the probe
    // times the PACKING shape, not a tokenizer
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"source",
        size(split($"text", "\\s+")).cast("long").as("toks"))
      .pin()
    val n = docs.count()
    val nGroups = docs.select($"source").distinct().count()

    def time3(groupCol: org.apache.spark.sql.Column): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.PrepOps.packSequences(
          docs.withColumn("grp", groupCol), "grp", "doc_id", "toks",
          4096L).agg(count(lit(1)), sum($"n_tokens")).collect()
        (System.nanoTime() - t0) / 1e9
      }.min

    val multi = time3($"source")
    val single = time3(lit("web"))

    // shard balance of the adversarial single-group run: the
    // groupedCumSum shard arithmetic verbatim over the doc_id domain —
    // max/mean occupancy says how far from the sampled-range ideal the
    // deterministic equal-width split lands (near 1.0 for near-dense
    // ids, the documented trade)
    val bal = docs
      .agg(min($"doc_id").as("lo"), max($"doc_id").as("hi")).head()
    val (lo, hi) = (bal.getLong(0), bal.getLong(1))
    val occ = docs
      .select(expr(s"(doc_id - ${lo}L) div " +
        s"((${hi}L - ${lo}L) div 64L + 1L)").as("shard"))
      .groupBy($"shard").agg(count(lit(1)).as("c"))
      .agg(max($"c").as("mx"), avg($"c").as("mean")).head()
    val skew = occ.getLong(0).toDouble / occ.getDouble(1)
    println(s"""{"metric":"pack_scale","sf_dir":"$sfDir","n":$n,""" +
      s""""groups_natural":$nGroups,""" +
      s""""sec_natural_groups":${math.rint(multi * 1000) / 1000},""" +
      s""""sec_single_group":${math.rint(single * 1000) / 1000},""" +
      s""""single_group_shards":64,""" +
      s""""shard_max_over_mean":${math.rint(skew * 1000) / 1000}}""")
    spark.stop()
  }
}
