package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Pins.PinnedDataset

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
      (base.unionByName(fam).pin(), n, m)
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
        .minhashIndex(stressDocs, "doc_id", "text").pin()
      idx.count()
      val batch = spark.range(200)
        .select((col("id") + 2000000000L).as("doc_id"),
          lit(boiler).as("text"))
        .unionByName(graft.Tables.load(spark, sfLarge, "documents")
          .select((col("doc_id") + 3000000000L).as("doc_id"),
            col("text")).limit(300))
        .pin()
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
    // the CELL axis (round-11 ask #1): an identical-embedding family at
    // 100% of the corpus — the SemDeDup boilerplate mass. Uncut, the
    // family is C(m,2) exact-cosine verifications inside ONE argmax
    // cell at ANY cell count (identical vectors share the argmax);
    // capped, it collapses to m−1 exact-signature edges plus the
    // distinct-representative residual.
    // planted ids live at fixed offsets above the corpus range; the
    // same loud collision guard as the doc fixture (REVIEW): an
    // embeddings table grown past the offset would alias planted ids
    // onto real rows and silently corrupt every count/timing printed
    val semIdOffset = 1000000L
    def semFixture(mult: Long): (DataFrame, Long, Long) = {
      val emb = graft.Tables.load(spark, sfLarge, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val (n, maxId) = {
        val r = emb.agg(count(lit(1)), max(col("vec_id"))).head()
        (r.getLong(0), r.getLong(1))
      }
      require(maxId < semIdOffset,
        s"base vec_id $maxId collides with the planted-family id range")
      val m = n * mult
      require(m < semIdOffset,
        s"family size $m would cross into the next planted id range")
      val fam = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("fe"))
        .crossJoin(spark.range(m)
          .select((col("id") + semIdOffset).as("vec_id")))
        .select(col("vec_id"), col("fe").as("embedding"))
      (emb.unionByName(fam).pin(), n, m)
    }
    // two family sizes: the capped spelling's fixed machinery (Lloyd +
    // signature collapse) dominates at the small point; the uncut
    // C(m,2) verify dominates as the family grows — the crossover IS
    // the guard's value, measured
    def semanticAt(mult: Long): String = {
      val (docs, n, m) = semFixture(mult)
      val (cs, cr) = timed {
        graft.operators.AnnOps.semanticNearDupsCapped(docs, "vec_id",
          "embedding", threshold = 0.9, cells = 16,
          maxCellOccupancy = 256).count()
      }
      val (us, ur) = timed {
        graft.operators.AnnOps.semanticNearDups(docs, "vec_id",
          "embedding", threshold = 0.9, cells = 16).count()
      }
      graft.operators.DedupOps.releaseLocalCheckpoint(docs)
      s"""{"n_vecs":$n,"family":$m,""" +
        s""""family_uncut_pairs":${m * (m + 1) / 2},""" +
        s""""capped_cap":256,"capped_sec":$cs,"capped_rows":$cr,""" +
        s""""uncut_sec":$us,"uncut_rows":$ur}"""
    }
    val semantic = semanticAt(1L)
    val semantic4x = semanticAt(4L)
    // the INCREMENTAL cell face: the frozen index has accumulated the
    // family; a new batch of 200 more copies (plus 300 normal vectors)
    // probes it. Both passes replay batchId = 1, so each probes exactly
    // the seed-committed state (own-batch exclusion) — symmetric.
    val semanticIncremental = {
      val (docs, n, _) = semFixture(1L)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-semidx-").toString
      graft.operators.AnnOps.incrementalSemanticDedupDurable(
        docs, "vec_id", "embedding", idxDir, 0L, threshold = 0.9,
        cells = 16, probe = false)
      val emb = graft.Tables.load(spark, sfLarge, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val batch = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("fe"))
        .crossJoin(spark.range(200)
          .select((col("id") + 2000000L).as("vec_id")))
        .select(col("vec_id"), col("fe").as("embedding"))
        .unionByName(emb.limit(300)
          .select((col("vec_id") + 3000000L).as("vec_id"),
            col("embedding")))
        .pin()
      def probeOnce(cap: Int): Long =
        graft.operators.AnnOps.incrementalSemanticDedupDurable(
          batch, "vec_id", "embedding", idxDir, 1L, threshold = 0.9,
          cells = 16, maxCellOccupancy = cap).count()
      val (cs, cr) = timed { probeOnce(256) }
      val (us, ur) = timed { probeOnce(Int.MaxValue) }
      s"""{"index_vecs":${2 * n},"index_family":$n,""" +
        s""""batch_new_copies":200,""" +
        s""""capped_sec":$cs,"capped_rows":$cr,""" +
        s""""uncut_sec":$us,"uncut_rows":$ur}"""
    }
    // the SEARCH face of the cell guard (round-11): filtered top-k
    // where query 0's (cell, key) holds the whole planted family —
    // every probe pays m uncut; capped, representatives + the k+1
    // expansion. BIT-parity means capped_rows must EQUAL uncut_rows.
    val filteredSearch = {
      val (docs, n, m) = semFixture(1L)
      val keyed = docs.withColumn("grp", lit("x")).pin()
      graft.operators.DedupOps.releaseLocalCheckpoint(docs)
      def searchDf(cap: Int) = graft.operators.AnnOps.filteredTopKIvf(
        keyed, "vec_id", "embedding", "grp",
        _ < 5, k = 3, cells = 16, maxCellOccupancy = cap)
      def searchOnce(cap: Int): Long = searchDf(cap).count()
      val (cs, cr) = timed { searchOnce(256) }
      val (us, ur) = timed { searchOnce(Int.MaxValue) }
      // parity claim = ROW-SET equality (count equality alone could
      // hide a swap of which tied member surfaces); k x 5 rows, cheap.
      // Wrapped in the keep-set release so the two extra executions'
      // internally-pinned outputs don't outlive the probe (REVIEW)
      def rowsOf(cap: Int) = searchDf(cap).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -999.0 else r.getDouble(2),
          r.getInt(3))).toSet
      val keepP = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val parity = rowsOf(256) == rowsOf(Int.MaxValue)
      release(keepP)
      graft.operators.DedupOps.releaseLocalCheckpoint(keyed)
      s"""{"n_vecs":$n,"family":$m,"capped_cap":256,""" +
        s""""capped_sec":$cs,"capped_rows":$cr,""" +
        s""""uncut_sec":$us,"uncut_rows":$ur,""" +
        s""""bit_parity_rowsets":$parity}"""
    }
    println(s"""{"probe":"hot_bucket_guard","small":$small,""" +
      s""""large":$large,"stress":$stress,"simhash_stress":$simhash,""" +
      s""""incremental_stress":$incremental,""" +
      s""""semantic_stress":$semantic,""" +
      s""""semantic_stress_4x":$semantic4x,""" +
      s""""semantic_incremental_stress":$semanticIncremental,""" +
      s""""filtered_search_stress":$filteredSearch}""")
    spark.stop()
  }
}
