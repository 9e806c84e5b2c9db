package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the hot-bucket occupancy guard (round-10 ask #1):
  * on a boilerplate-heavy fixture — documents plus a duplicate class
  * sized at 10% of the corpus, the web-corpus pathology where one
  * (band, bkey) bucket holds the whole class — time the capped
  * spelling ([[graft.operators.DedupOps.minhashNearDupsCapped]])
  * against the uncut one at two SFs. The uncut join's candidate count
  * inside the saturated bucket is C(m, 2): 10× data → 10× family →
  * 100× pairs, while the capped spelling emits m−1 star edges and
  * stays ~linear. The probe prints one JSON line with times, pair
  * volumes, and the capped/uncut output-equivalence count at the
  * smaller SF (cluster resolution parity is the spec's job;
  * PipelineOpsSpec pins it).
  *
  * Usage: HotBucketProbe <sfDirSmall> <sfDirLarge>
  */
object HotBucketProbe {
  def main(args: Array[String]): Unit = {
    val (sfSmall, sfLarge) = (args(0), args(1))
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

    val boiler =
      "the same boilerplate error page template text repeated across mirrors"

    // documents + a duplicate class of ~N/div (one fixed template,
    // fresh ids above the corpus id range)
    def fixture(dir: String, div: Long): (DataFrame, Long, Long) = {
      val idOffset = 1000000000L
      val base = graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      // loud collision guard (the d13-fixture discipline): a base id
      // aliasing a planted family id would silently corrupt every pair
      // count and timing this probe prints
      val (n, maxId) = {
        val r = base.agg(count(lit(1)), max(col("doc_id"))).head()
        (r.getLong(0), r.getLong(1))
      }
      require(maxId < idOffset,
        s"base doc_id $maxId collides with the planted-family id range")
      val m = math.max(10L, n / div)
      val fam = spark.range(m)
        .select((col("id") + idOffset).as("doc_id"),
          lit(boiler).as("text"))
      (base.unionByName(fam).localCheckpoint(), n, m)
    }

    def timeIt(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    // release only the blocks a timed pass created — the fixtures' own
    // localCheckpoints must survive across passes
    def release(keep: Set[Int]): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .filter(r => !keep.contains(r.id)).foreach(_.unpersist(false))
    // ONE timing spelling for every block (min of three, the Bench
    // convention), snapshotting the keep-set at definition time
    def timed(body: => Long): (Double, Long) = {
      val keep = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val r = (1 to 3).map { _ => val t = timeIt(body); release(keep); t }
      (r.map(_._1).min, r.head._2)
    }

    def probe(docsF: (org.apache.spark.sql.DataFrame, Long, Long),
        dir: String, runUncut: Boolean): String = {
      val (docs, n, m) = docsF
      val cap = 64
      val (capSec, capRows) = timed {
        graft.operators.DedupOps.minhashNearDupsCapped(
          docs, "doc_id", "text", maxOccupancy = cap).count()
      }
      val (uncutSec, uncutRows) = if (runUncut) timed {
        graft.operators.DedupOps.minhashNearDups(
          docs, "doc_id", "text").count()
      } else (-1.0, -1L)
      s"""{"sf_dir":"$dir","n_docs":$n,"family":$m,""" +
        s""""family_uncut_pairs":${m * (m - 1) / 2},""" +
        s""""capped_cap":$cap,"capped_sec":$capSec,""" +
        s""""capped_rows":$capRows,""" +
        s""""uncut_sec":$uncutSec,"uncut_rows":$uncutRows}"""
    }

    val small = probe(fixture(sfSmall, 10L), sfSmall, runUncut = true)
    val large = probe(fixture(sfLarge, 10L), sfLarge, runUncut = true)
    // stress: the family at 100% of N — the scale point where the
    // uncut join's C(m,2) verification dominates wall-clock while the
    // capped spelling stays flat. The stress fixture is built ONCE and
    // shared by the minhash, simhash, and incremental blocks.
    val stressFixture = fixture(sfLarge, 1L)
    val (stressDocs, stressN, stressM) = stressFixture
    val stress = probe(stressFixture, sfLarge, runUncut = true)
    // simhash at the same stress point: the collapse-by-exact-simhash
    // resolution (round-10 review fix) vs the unguarded byte-bucket
    // join, whose quadratic lives in only 1024 keys
    val simhash = {
      val (cs, cr) = timed {
        graft.operators.DedupOps.simhashNearDupsCapped(
          stressDocs, "doc_id", "text", maxOccupancy = 64).count()
      }
      val (us, ur) = timed {
        graft.operators.DedupOps.simhashNearDups(
          stressDocs, "doc_id", "text").count()
      }
      s"""{"n_docs":$stressN,"family":$stressM,""" +
        s""""capped_sec":$cs,"capped_rows":$cr,""" +
        s""""uncut_sec":$us,"uncut_rows":$ur}"""
    }
    // the INCREMENTAL face: the index has accumulated the 100%-of-N
    // family; a new batch of 200 more copies probes it — capped, the
    // delegated edges replace |new∩bucket| x m verification pairs
    val incremental = {
      val idx = graft.operators.DedupOps
        .minhashIndex(stressDocs, "doc_id", "text").localCheckpoint()
      idx.count()
      val batch = spark.range(200)
        .select((col("id") + 2000000000L).as("doc_id"),
          lit(boiler).as("text"))
        .unionByName(graft.Tables.load(spark, sfLarge, "documents")
          .select((col("doc_id") + 3000000000L).as("doc_id"),
            col("text")).limit(300))
        .localCheckpoint()
      val (cs, cr) = timed {
        graft.operators.DedupOps.minhashNearDupsAgainstIndex(
          batch, "doc_id", "text", idx, maxOccupancy = 64).count()
      }
      val (us, ur) = timed {
        graft.operators.DedupOps.minhashNearDupsAgainstIndex(
          batch, "doc_id", "text", idx).count()
      }
      s"""{"index_docs":${stressN + stressM},"index_family":$stressM,""" +
        s""""batch_new_copies":200,""" +
        s""""capped_sec":$cs,"capped_rows":$cr,""" +
        s""""uncut_sec":$us,"uncut_rows":$ur}"""
    }
    println(s"""{"probe":"hot_bucket_guard","small":$small,""" +
      s""""large":$large,"stress":$stress,"simhash_stress":$simhash,""" +
      s""""incremental_stress":$incremental}""")
    spark.stop()
  }
}
