package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.core.Pins.PinnedDataset

/** The cluster-durability gate for the pin primitive.
  *
  * Round 14's one design flag: 163 bare `localCheckpoint()` sites are
  * correct on local[32] but not fault-tolerant on a preemptible
  * cluster. Round 15 routes every pin through [[Pins.pin]] with a
  * conf-selected backend. This spec proves the two claims that make
  * that safe to ship:
  *
  *  1. BACKEND INVARIANCE — representative operator chains (d02 banded
  *     MinHash dedup, s21 durable IVF-PQ build+serve, p01 distributed
  *     sequence packing: between them they exercise staging pins,
  *     iterative re-pin loops, release sites, and the durable-index
  *     lifecycle) produce hash-identical results under `local`,
  *     `reliable`, and `replicated`.
  *  2. NO BYPASS — no `.localCheckpoint(` call survives anywhere in
  *     src/main outside Pins.scala itself, so a future operator cannot
  *     silently reintroduce a cluster-fragile pin.
  */
class PinsBackendSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _
  private var ckDir: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    ckDir = Files.createTempDirectory("graft-pins-ck-")
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pins-backend")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config(Pins.DirConf, ckDir.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (ckDir != null)
      Files.walk(ckDir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
  }

  /** Canonical result fingerprint: column names sorted, rows rendered
    * and sorted — the same shape the driver's oracle compare hashes. */
  private def fingerprint(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val cols = df.columns.sorted
    val rows = df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map {
        case a: Array[_] => a.mkString("[", ",", "]")
        case s: Seq[_] => s.mkString("[", ",", "]")
        case v => String.valueOf(v)
      }.mkString("|")).sorted
    s"cols=${cols.mkString(",")};n=${rows.length};" + rows.mkString("\n")
  }

  private val chains =
    Seq("d02_dedup_minhash_lsh", "s21_ivfpq_index_serve",
      "p01_sequence_packing")

  test("d02 / s21 / p01 are hash-identical across all three backends") {
    val byBackend = Seq("local", "reliable", "replicated").map { b =>
      spark.conf.set(Pins.BackendConf, b)
      try b -> chains.map(n => n -> fingerprint(n)).toMap
      finally spark.conf.set(Pins.BackendConf, "local")
    }
    val (refName, ref) = (byBackend.head._1, byBackend.head._2)
    byBackend.tail.foreach { case (b, got) =>
      chains.foreach { n =>
        assert(got(n) == ref(n),
          s"$n differs between backend=$refName and backend=$b")
      }
    }
  }

  test("reliable backend actually wrote checkpoint files") {
    spark.conf.set(Pins.BackendConf, "reliable")
    try {
      val s2 = spark; import s2.implicits._
      val pinned = (1 to 100).toDF("x").pin()
      assert(pinned.count() == 100)
      val files = Files.walk(ckDir).iterator().asScala
        .count(p => Files.isRegularFile(p))
      assert(files > 0, "no checkpoint files under the reliable dir")
    } finally spark.conf.set(Pins.BackendConf, "local")
  }

  test("reliable pin release RECLAIMS its checkpoint files (round-15 " +
      "unbounded-scratch flag): file count returns to baseline while " +
      "the result stays correct") {
    spark.conf.set(Pins.BackendConf, "reliable")
    try {
      val s2 = spark; import s2.implicits._
      def files: Long = Files.walk(ckDir).iterator().asScala
        .count(p => Files.isRegularFile(p))
      val base = files
      val pinned = (1 to 500).toDF("x").pin()
      assert(files > base, "the pin must have written checkpoint files")
      assert(pinned.agg(org.apache.spark.sql.functions.sum($"x"))
        .head().getLong(0) == 125250L)
      pinned.releasePin()
      assert(files == base,
        s"release left checkpoint files behind ($base baseline, " +
          s"$files after release)")
      // double release stays a safe no-op
      pinned.releasePin()
      assert(files == base)
    } finally spark.conf.set(Pins.BackendConf, "local")
  }

  test("a reliable-pin FS failure is OBSERVABLE, not swallowed: an " +
      "injected IOException at the delete/length boundary WARN-logs " +
      "and records the failing path, while the pin itself still " +
      "reads correctly and releases its blocks (round-16 flag)") {
    spark.conf.set(Pins.BackendConf, "reliable")
    val realDelete = Pins.fsDelete
    val realLength = Pins.fsLength
    try {
      val s2 = spark; import s2.implicits._
      // byte-meter path: length probe throws at pin time
      Pins.fsLength = (_, p) =>
        throw new java.io.IOException(s"injected length failure: $p")
      Pins.lastFsFailure.set(null)
      val metered = Pins.checkpointedBytes.get
      val pinned = (1 to 200).toDF("x").pin()
      assert(pinned.count() == 200, "pin must still work under the failure")
      val accFail = Pins.lastFsFailure.get
      assert(accFail != null && accFail.startsWith("byte-meter "),
        s"byte-meter failure not recorded: $accFail")
      assert(Pins.checkpointedBytes.get == metered,
        "a failed length probe must not invent bytes")
      // reclamation path: delete throws at release time
      Pins.fsDelete = (_, p) =>
        throw new java.io.IOException(s"injected delete failure: $p")
      Pins.lastFsFailure.set(null)
      pinned.releasePin()
      val recFail = Pins.lastFsFailure.get
      assert(recFail != null && recFail.startsWith("reclamation ") &&
        recFail.contains("injected delete failure"),
        s"reclamation failure not recorded: $recFail")
      // the failing delete left the files behind — a re-release with
      // the real FS reclaims them (release is idempotent)
      Pins.fsDelete = realDelete
      Pins.fsLength = realLength
      pinned.releasePin()
    } finally {
      Pins.fsDelete = realDelete
      Pins.fsLength = realLength
      Pins.lastFsFailure.set(null)
      spark.conf.set(Pins.BackendConf, "local")
    }
  }

  test("release is a no-op on a plain cached DataFrame — it must NOT " +
      "drop a caller's cache through the CacheManager") {
    val s2 = spark; import s2.implicits._
    val cached = (1 to 100).toDF("x").cache()
    assert(cached.count() == 100)
    Pins.release(cached)
    assert(cached.storageLevel != StorageLevel.NONE,
      "release unpersisted a non-pin cached DataFrame")
    cached.unpersist(true)
  }

  test("replicated backend pins blocks at MEMORY_AND_DISK_2, released on release()") {
    spark.conf.set(Pins.BackendConf, "replicated")
    try {
      val s2 = spark; import s2.implicits._
      val pinned = (1 to 100).toDF("x").pin()
      val rdd = pinned.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
      assert(rdd.getStorageLevel == StorageLevel.MEMORY_AND_DISK_2)
      Pins.release(pinned)
      assert(rdd.getStorageLevel == StorageLevel.NONE)
    } finally spark.conf.set(Pins.BackendConf, "local")
  }

  test("reliable pin SURVIVES losing every executor block; a local pin " +
      "by design does not") {
    // the cluster-durability claim, demonstrated rather than asserted:
    // drop the pinned RDD's blocks (what losing the executor does) and
    // try to read again. The reliable backend re-reads its checkpoint
    // FILES; the local backend's blocks were the only copy.
    val s2 = spark; import s2.implicits._
    spark.conf.set(Pins.BackendConf, "reliable")
    val durable = try (1 to 1000).toDF("x").pin()
      finally spark.conf.set(Pins.BackendConf, "local")
    val local = (1 to 1000).toDF("x").pin()
    def dropBlocks(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(true)
        case other => fail(s"expected a pinned plan, got $other")
      }
    dropBlocks(durable)
    dropBlocks(local)
    assert(durable.agg(org.apache.spark.sql.functions.sum($"x"))
      .head().getLong(0) == 500500L,
      "reliable pin did not recover from block loss")
    intercept[Exception] {
      // lineage truncated + blocks gone = unrecoverable, loudly
      local.agg(org.apache.spark.sql.functions.sum($"x")).head()
    }
  }

  test("unknown backend fails fast") {
    spark.conf.set(Pins.BackendConf, "bogus")
    try {
      val s2 = spark; import s2.implicits._
      intercept[IllegalArgumentException]((1 to 3).toDF("x").pin())
    } finally spark.conf.set(Pins.BackendConf, "local")
  }

  test("no bare localCheckpoint call site outside Pins") {
    val root = Paths.get("src/main/scala")
    assume(Files.isDirectory(root), "run from the repo root")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(p => p.endsWith("graft/core/Pins.scala"))
      .flatMap { p =>
        new String(Files.readAllBytes(p)).linesIterator.zipWithIndex
          .filter(_._1.contains(".localCheckpoint("))
          .map { case (_, i) => s"$p:${i + 1}" }
      }.toList
    assert(offenders.isEmpty,
      s"bare .localCheckpoint( outside Pins: ${offenders.mkString(", ")}")
  }
}
