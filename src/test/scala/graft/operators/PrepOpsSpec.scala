package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Pins.PinnedDataset

/** Facade-level checks for [[PrepOps]] on constructed corpora (the
  * oracle-checked p01–p04 queries pin the same semantics on the test
  * tables).
  */
class PrepOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("prep-ops")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("packSequences: rows land in the pack where they start") {
    val s = spark
    import s.implicits._
    // budget 10: tokens 4,4,4 -> cum 4,8,12; starts 0,4,8 -> all pack 0;
    // next rows start at 12, 17 -> pack 1; one giant row spans packs but
    // belongs where it starts
    val df = Seq(
      ("g1", 1L, 4L), ("g1", 2L, 4L), ("g1", 3L, 4L),
      ("g1", 4L, 5L), ("g1", 5L, 25L),
      ("g2", 1L, 9L), ("g2", 2L, 2L))
      .toDF("src", "ord", "toks")
    val out = PrepOps.packSequences(df, "src", "ord", "toks", 10L)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(out(("g1", 0L)) == (3L, 12L))   // 3 docs, 12 tokens
    assert(out(("g1", 1L)) == (2L, 30L))   // starts 12 and 17
    assert(out(("g2", 0L)) == (2L, 11L))   // 9 starts at 0, 2 starts at 9
  }

  test("packSequences: NULL groups and NULL ords survive the " +
      "distributed two-pass exactly as the single-window spelling " +
      "kept them (null group = its own partition, null ords first " +
      "and mutual peers)") {
    val s = spark
    import s.implicits._
    // NULL group rows AND a null-ord row inside a real group: the
    // null-unsafe inner-join spelling silently dropped all of them
    // (REVIEW) — documents vanishing from training packs with no error
    val df = Seq(
      (Some("g1"), Some(1L), 4L), (Some("g1"), Some(2L), 4L),
      (Some("g1"), None, 7L),     // null ord: packs FIRST in g1
      (None, Some(1L), 9L), (None, Some(2L), 2L), // null group
      (None, None, 3L))           // null group AND null ord
      .toDF("src", "ord", "toks")
    val out = PrepOps.packSequences(df, "src", "ord", "toks", 10L)
      .collect()
      .map(r => ((Option(r.getString(0)), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // g1: null-ord(7) starts at 0, then 1L(4) starts at 7 -> pack 0;
    // 2L(4) starts at 11 -> pack 1
    assert(out((Some("g1"), 0L)) == (2L, 11L), s"g1 pack 0: $out")
    assert(out((Some("g1"), 1L)) == (1L, 4L), s"g1 pack 1: $out")
    // null group: null-ord(3) first, 1L(9) starts at 3 -> pack 0;
    // 2L(2) starts at 12 -> pack 1
    assert(out((None, 0L)) == (2L, 12L), s"null-group pack 0: $out")
    assert(out((None, 1L)) == (1L, 2L), s"null-group pack 1: $out")
    // nothing dropped: total docs and tokens conserved
    assert(out.values.map(_._1).sum == 6L &&
      out.values.map(_._2).sum == 29L, s"rows lost: $out")
  }

  test("packSequences: date/timestamp order columns pack exactly like " +
      "their epoch ords (ADVICE r13 — the window spelling accepted " +
      "them; the sharded spelling maps them to unix_date/unix_micros)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq(
      ("g1", 1L, 4L), ("g1", 2L, 4L), ("g1", 3L, 4L),
      ("g1", 4L, 5L), ("g1", 5L, 25L),
      ("g2", 1L, 9L), ("g2", 2L, 2L))
      .toDF("src", "ord", "toks")
    def result(df: org.apache.spark.sql.DataFrame, ordCol: String) =
      PrepOps.packSequences(df, "src", ordCol, "toks", 10L)
        .collect().map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3)))).toMap
    val expected = result(base, "ord")
    // timestamp: epoch-microsecond map is monotone in ord
    val ts = base.withColumn("t",
      timestamp_micros(col("ord") * 1000000L))
    assert(result(ts, "t") == expected, "timestamp ord drifted")
    // date: epoch-day map is monotone in ord
    val dt = base.withColumn("d", date_add(lit("2024-01-01"),
      col("ord").cast("int")))
    assert(result(dt, "d") == expected, "date ord drifted")
    // a NULL timestamp still packs first in its group (the null-ord
    // contract survives the epoch map)
    val tsNull = ts.withColumn("t",
      when(col("ord") === 1L && col("src") === "g2",
        lit(null).cast("timestamp")).otherwise(col("t")))
    assert(result(tsNull, "t") == expected,
      "NULL timestamp ord lost the nulls-first contract")
    // non-orderable types still fail loudly at the groupedCumSum door
    val bad = base.withColumn("sord", col("ord").cast("string"))
    val ex = intercept[IllegalArgumentException] {
      PrepOps.packSequences(bad, "src", "sord", "toks", 10L)
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("epochShuffle: empty input returns the empty shuffle (no NPE " +
      "from the null aggregate row)") {
    val s = spark
    import s.implicits._
    val out = PrepOps.epochShuffle(
      Seq.empty[(Long, String)].toDF("id", "v"), Seq("id"), epochs = 3)
    assert(out.count() == 0L)
    assert(out.columns.toSeq ==
      Seq("id", "v", "epoch", "bucket", "pos"))
    // and NULL keys get their own message, not a misleading
    // "not unique"
    val e = intercept[IllegalArgumentException] {
      PrepOps.epochShuffle(
        Seq((Some(1L), "a"), (None, "b")).toDF("id", "v"),
        Seq("id"), epochs = 2).count()
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
  }

  test("stratifiedSampleByHash is deterministic and per-stratum") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    val a = PrepOps.stratifiedSampleByHash(df, "id", "lang",
      Map("en" -> 1), defaultTenths = 5)
    val b = PrepOps.stratifiedSampleByHash(df, "id", "lang",
      Map("en" -> 1), defaultTenths = 5)
    val ca = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.collect().map(_.getLong(0)).sorted
      .sameElements(b.collect().map(_.getLong(0)).sorted))
    // ~10% of 500 en, ~50% of 500 de (md5 buckets are near-uniform)
    assert(ca("en") > 20 && ca("en") < 90, s"en=${ca("en")}")
    assert(ca("de") > 180 && ca("de") < 320, s"de=${ca("de")}")
  }

  test("classBalanceWeights equalizes to the largest class") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c"))
      .toDF("cls")
    val w = PrepOps.classBalanceWeights(df, "cls").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(w("a") == ((60L, 60L, 1.0)))
    assert(w("b") == ((30L, 60L, 2.0)))
    assert(w("c") == ((10L, 60L, 6.0)))
  }

  test("domainMixture: waterfill caps, redistributes, never overspends") {
    val s = spark
    import s.implicits._
    // avail: a=100, b=5, c=20; weights a=3, b=1, c=default(1); budget 60
    // round 1 (W=5): targets 36/12/12 -> alloc 36 / 5 (capped) / 12
    // round 2: leftover 7 over surplus domains a,c (w 3+1=4):
    //   a += min(64, 7*3 div 4 = 5) = 5; c += min(8, 7 div 4 = 1) = 1
    val df = Seq(("a", 40L), ("a", 60L), ("b", 5L), ("c", 20L))
      .toDF("dom", "toks")
    val out = PrepOps.domainMixture(df, "dom", "toks",
        Map("a" -> 3L, "b" -> 1L), budget = 60L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((3L, 100L, 36L, 41L)))
    assert(out("b") == ((1L, 5L, 12L, 5L)))
    assert(out("c") == ((1L, 20L, 12L, 13L)))
    assert(out.values.map(_._4).sum <= 60L)
  }

  test("domainMixture: weights from a table match the Map spelling") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 40L), ("a", 60L), ("b", 5L), ("c", 20L))
      .toDF("dom", "toks")
    val viaMap = PrepOps.domainMixture(df, "dom", "toks",
        Map("a" -> 3L, "b" -> 1L), budget = 60L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // weight table covers a and b; c (absent) gets defaultWeight = 1
    val wtab = Seq(("a", 3L), ("b", 1L)).toDF("d", "w")
    val viaTable = PrepOps.domainMixture(df, "dom", "toks",
        wtab, "d", "w", budget = 60L, defaultWeight = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(viaTable == viaMap)
    // and the sample materialization agrees across the two spellings
    val rows = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b", 10L))
      .toDF("id", "dom", "toks")
    val m = PrepOps.mixtureSample(rows, "id", "dom", "toks",
      Map("a" -> 3L), budget = 300L).collect().map(_.getLong(0)).toSet
    val t = PrepOps.mixtureSample(rows, "id", "dom", "toks",
      Seq(("a", 3L)).toDF("d", "w"), "d", "w", budget = 300L,
      defaultWeight = 1L).collect().map(_.getLong(0)).toSet
    assert(t == m)
  }

  test("domainMixture: zero-target domains get null fill_ratio, not NaN") {
    val s = spark
    import s.implicits._
    // 5 domains, budget 3: every target floors to 0 except none — each
    // target = 3*1 div 5 = 0 -> fill_ratio must be null (0/0), never NaN
    val df = (0 until 5).map(i => (s"d$i", 10L)).toDF("dom", "toks")
    val out = PrepOps.domainMixture(df, "dom", "toks", Map.empty,
      budget = 3L).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      if (r.getLong(3) == 0L) assert(r.isNullAt(5),
        s"fill_ratio for zero-target ${r.getString(0)} should be null")
      else assert(!r.getDouble(5).isNaN)
    }
  }

  test("exactQuantileBounds matches Spark's exact percentile") {
    val s = spark
    import s.implicits._
    // seeded values WITH duplicates and an uneven distribution
    var x = 12345
    val vals = Array.fill(501) {
      x ^= x << 13; x ^= x >>> 17; x ^= x << 5
      ((x & 0xff) / 16).toDouble / 3.0
    }
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("id", "score")
    val probs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = PrepOps.exactQuantileBounds(df, "score", probs, partitions = 4)
      .collect().head.getSeq[Double](0)
    val exp = df.selectExpr(
        s"percentile(score, array(${probs.mkString(",")})) bs")
      .collect().head.getSeq[Double](0)
    assert(got == exp, s"got $got, percentile says $exp")
    // single-value edge: every prob returns that value
    val one = PrepOps.exactQuantileBounds(
      Seq((1L, 42.5)).toDF("id", "score"), "score", Seq(0.25, 0.75))
      .collect().head.getSeq[Double](0)
    assert(one == Seq(42.5, 42.5))
    // bit-identity across varied shapes: heavy ties, all-equal, sizes
    // that don't divide the partition count, extreme probs
    var y = 777
    def nxt(): Int = { y ^= y << 13; y ^= y >>> 17; y ^= y << 5; y }
    for ((n, mod) <- Seq((3, 2), (17, 3), (64, 1), (97, 50), (200, 7))) {
      val vs = Seq.tabulate(n)(i =>
        (i.toLong, ((nxt() & 0xffff) % mod).toDouble / 7.0))
      val dfv = vs.toDF("id", "score")
      val ps = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
      val g = PrepOps.exactQuantileBounds(dfv, "score", ps, partitions = 4)
        .collect().head.getSeq[Double](0)
      val e = dfv.selectExpr(
          s"percentile(score, array(${ps.mkString(",")})) bs")
        .collect().head.getSeq[Double](0)
      assert(g == e, s"n=$n mod=$mod: $g vs $e")
    }
  }

  test("exactQuantileBounds: frac-0 next to an infinity returns the " +
      "lower value, not NaN") {
    val s = spark
    import s.implicits._
    // p=0.5 over 3 values lands EXACTLY on rank 2 (frac 0); the
    // bracketing-higher value is +Inf, so the weighted form would
    // compute 2.0 + 0.0 * Inf = NaN. Spark's percentile returns the
    // lower value exactly — so must we.
    val df = Seq((1L, 1.0), (2L, 2.0),
      (3L, Double.PositiveInfinity)).toDF("id", "score")
    val got = PrepOps.exactQuantileBounds(df, "score",
        Seq(0.0, 0.5, 1.0), partitions = 2)
      .collect().head.getSeq[Double](0)
    val exp = df.selectExpr(
        "percentile(score, array(0.0, 0.5, 1.0)) bs")
      .collect().head.getSeq[Double](0)
    assert(got == exp, s"got $got, percentile says $exp")
    assert(got(1) == 2.0 && !got(1).isNaN)
  }

  test("chunkDocuments: overlap, tail coverage, short docs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"), // 9 words -> starts 0,3,6
      (2L, "a b c"))                      // short doc -> one chunk
      .toDF("my_id", "body")
    val out = PrepOps.chunkDocuments(df, "my_id", "body",
        window = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(out((1L, 0L)) == ((4L, "w1 w2 w3 w4")))
    assert(out((1L, 1L)) == ((4L, "w4 w5 w6 w7")))
    assert(out((1L, 2L)) == ((3L, "w7 w8 w9")))
    assert(out((2L, 0L)) == ((3L, "a b c")))
    assert(out.size == 4)
  }

  test("mixtureSample: rate-1 keeps all, deterministic, subset") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b", 10L))
      .toDF("id", "dom", "toks")
    // budget >= corpus total: every domain fills to avail, rate 1
    val all = PrepOps.mixtureSample(df, "id", "dom", "toks",
      Map.empty, budget = 5000L)
    assert(all.count() == 200L)
    assert(all.columns.toSeq == Seq("id", "dom", "toks"))
    // tight budget: a strict deterministic subset
    val some1 = PrepOps.mixtureSample(df, "id", "dom", "toks",
      Map("a" -> 3L), budget = 400L).collect().map(_.getLong(0)).toSet
    val some2 = PrepOps.mixtureSample(df, "id", "dom", "toks",
      Map("a" -> 3L), budget = 400L).collect().map(_.getLong(0)).toSet
    assert(some1 == some2)
    assert(some1.nonEmpty && some1.size < 200)
    assert(some1.subsetOf((1L to 200L).toSet))
    // caller columns named like the internals must survive untouched
    val clash = df.withColumnRenamed("dom", "domain")
    val kept = PrepOps.mixtureSample(clash, "id", "domain", "toks",
      Map.empty, budget = 5000L)
    assert(kept.columns.toSeq == Seq("id", "domain", "toks"))
    assert(kept.count() == 200L)
  }

  test("chunkDocuments: chunk-count/width invariants over 1..40 words") {
    val s = spark
    import s.implicits._
    val W = 7; val stride = 5
    val df = (1 to 40)
      .map(n => (n.toLong, (1 to n).map(i => s"w$i").mkString(" ")))
      .toDF("id", "body")
    val byDoc = PrepOps.chunkDocuments(df, "id", "body", W, stride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    (1 to 40).foreach { n =>
      val chunks = byDoc(n.toLong).sortBy(_._2)
      val expected = if (n <= W) 1 else (n - W + stride - 1) / stride + 1
      assert(chunks.length == expected, s"n=$n chunk count")
      // every chunk but the last is full-width; the last covers the tail
      chunks.init.foreach(c => assert(c._3 == W, s"n=$n mid chunk width"))
      val last = chunks.last
      assert(last._3 == n - (expected - 1) * stride, s"n=$n tail width")
      assert(last._4.endsWith(s"w$n"), s"n=$n last word covered")
      // overlap contract: chunk i starts at word i*stride + 1
      chunks.foreach(c =>
        assert(c._4.split(" ").head == s"w${c._2 * stride + 1}",
          s"n=$n chunk ${c._2} start"))
    }
  }

  test("splitAssign: disjoint, covering, deterministic, ~80/10/10") {
    val s = spark
    import s.implicits._
    val df = (0L until 2000L).toDF("id")
    val a = PrepOps.splitAssign(df, "id")
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L, "every row gets exactly one split")
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 buckets are near-uniform: generous bands around 1600/200/200
    assert(counts("train") > 1450 && counts("train") < 1750)
    assert(counts("val") > 120 && counts("val") < 290)
    assert(counts("test") > 120 && counts("test") < 290)
    // deterministic: same ids land in the same split on re-run
    val b = PrepOps.splitAssign(df, "id")
    assert(a.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      .sameElements(b.collect().map(r => (r.getLong(0), r.getString(1))).sorted))
  }

  test("curriculumBuckets: monotone in score, quartile-balanced") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val out = PrepOps.curriculumBuckets(df, "score").collect()
      .map(r => r.getDouble(1) -> r.getInt(2))
    // monotone: a higher score never gets a lower bucket
    val sorted = out.sortBy(_._1)
    assert(sorted.sliding(2).forall {
      case Array((_, b1), (_, b2)) => b1 <= b2; case _ => true })
    // exact quartiles of 1..100: 25 rows per bucket (boundary rows at
    // 25.75/50.5/75.25 interpolate strictly between data values)
    val byBucket = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byBucket == Map(0 -> 25, 1 -> 25, 2 -> 25, 3 -> 25), s"$byBucket")
  }

  test("decontamScan: counts shared-shingle train docs, prunes hot shingles") {
    val s = spark
    import s.implicits._
    // "a b c" lives in 3 train docs > dfCut=2 -> pruned from the index
    val train = Seq(
      (1L, "a b c d e"), (2L, "a b c x y"), (3L, "a b c z w"),
      (4L, "p q r s t")).toDF("id", "txt")
    val test = Seq(
      (10L, "p q r m n"),   // shares "p q r" with train 4
      (11L, "a b c m n"),   // only the pruned shingle -> absent
      (12L, "q r s t u")    // shares "q r s" and "r s t" with train 4
    ).toDF("id", "txt")
    val out = PrepOps.decontamScan(train, test, "id", "txt",
        k = 3, dfCut = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map(10L -> ((1L, 1L)), 12L -> ((1L, 2L))), s"$out")
  }

  test("decontamScanBloom == decontamScan exactly, even at terrible fpp") {
    val s = spark
    import s.implicits._
    // 7-word shingles; doc 10 shares one with train doc 1, doc 11 is
    // clean, doc 12 shares with docs 1 AND 2
    val mk = (w: String) => s"$w b c d e f g h i j"
    val train = Seq((1L, mk("alpha")), (2L, mk("beta")))
      .toDF("doc_id", "text")
    val test = Seq(
      (10L, mk("alpha")), // shares every shingle with train doc 1
      (11L, "gamma delta epsilon zeta eta theta iota kappa"), // clean
      (12L, "b c d e f g h i j k")) // shares the tail shingles of both
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val exact = rows(PrepOps.decontamScan(train, test, "doc_id", "text",
      k = 7, dfCut = 16))
    val bloom = rows(PrepOps.decontamScanBloom(train, test, "doc_id",
      "text", k = 7, dfCut = 16))
    assert(bloom == exact, s"bloom path diverged: $bloom vs $exact")
    assert(exact.map(_._1) == Set(10L, 12L), s"fixture broken: $exact")
    // a near-useless bloom (fpp ~ 1) lets everything through — false
    // positives MUST die in the exact join, leaving rows identical
    val sloppy = rows(PrepOps.decontamScanBloom(train, test, "doc_id",
      "text", k = 7, dfCut = 16, fpp = 0.9))
    assert(sloppy == exact, "high-fpp bloom changed the rows")
  }

  test("weightedSample: heavy weights dominate inclusion, draws are " +
      "deterministic, non-positive weights are excluded") {
    val s = spark
    import s.implicits._
    // one overwhelming weight among near-zero ones: key = u^(1/w) with
    // w=1000 is ~1 while w=0.01 keys are u^100 ~ 0 — the heavy doc must
    // always be drawn, at any k
    val df = ((0L until 20L).map(i => (i, 0.01)) :+ (50L, 1000.0) :+
      (99L, 0.0) :+ (98L, -5.0)).toDF("k", "wt")
    val top3 = PrepOps.weightedSample(df, "k", "wt", k = 3)
      .collect().map(r => r.getLong(0))
    assert(top3.contains(50L), s"heavy doc missing from $top3")
    // zero/negative weights never sampled (A-ES undefined there)
    assert(!top3.contains(99L) && !top3.contains(98L))
    // deterministic: same call, same draw, same order
    val again = PrepOps.weightedSample(df, "k", "wt", k = 3)
      .collect().map(r => r.getLong(0))
    assert(top3.toSeq == again.toSeq)
    // k >= population: everything with positive weight comes back
    val all = PrepOps.weightedSample(df, "k", "wt", k = 100)
      .collect().map(r => r.getLong(0)).toSet
    assert(all == (0L until 20L).toSet + 50L,
      s"sample universe wrong: $all")
  }

  test("temperatureMixture: alpha=0 is uniform, alpha=1 proportional, " +
      "alpha=0.5 between — all through the exact waterfill") {
    val s = spark
    import s.implicits._
    // three domains with 1:4:16 token availability and a budget small
    // enough that targets bind (nothing caps at avail)
    val df = Seq.tabulate(21) { i =>
      val d = if (i < 1) "small" else if (i < 5) "mid" else "big"
      (i.toLong, d, 100L)
    }.toDF("id", "dom", "toks")
    def targets(alpha: Double): Map[String, Long] =
      PrepOps.temperatureMixture(df, "dom", "toks", alpha, budget = 420L)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val uni = targets(0.0)
    assert(uni("small") == uni("mid") && uni("mid") == uni("big"),
      s"alpha=0 must weight uniformly: $uni")
    val prop = targets(1.0)
    assert(prop("big") == 16 * prop("small") &&
      prop("mid") == 4 * prop("small"),
      s"alpha=1 must weight proportionally: $prop")
    val sq = targets(0.5) // sqrt(1):sqrt(4):sqrt(16) = 1:2:4
    assert(sq("big") == 4 * sq("small") && sq("mid") == 2 * sq("small"),
      s"alpha=0.5 must weight by sqrt(avail): $sq")
    // the tail's share strictly grows as alpha falls
    assert(uni("small") > sq("small") && sq("small") > prop("small"),
      "lower alpha must upsample the tail")
  }

  test("lengthBucketBatches: exact pad bill, bucket width respected, " +
      "bucketed padding beats id-order batching") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(8844)
    // bimodal lengths (short ~10, long ~100) shuffled across ids —
    // the case bucketing exists for
    val rows = (0 until 64).map { i =>
      val len = if (rnd.nextBoolean()) 8 + rnd.nextInt(5)
        else 95 + rnd.nextInt(10)
      (i.toLong, len.toLong)
    }
    val df = rows.toDF("id", "len")
    val out = PrepOps.lengthBucketBatches(df, "id", "len",
      bucketWidth = 16, batchSize = 8).collect()
    // invariants: every batch's members fit its bucket's length range,
    // counts conserve, pad bill is the exact identity
    assert(out.map(_.getLong(2)).sum == 64L, "doc count must conserve")
    out.foreach { r =>
      val (bucket, n, mx, sm, pad) = (r.getLong(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n <= 8L)
      assert(mx <= (bucket + 1) * 16 && mx > bucket * 16,
        s"max_len $mx outside bucket $bucket's range")
      assert(pad == n * mx - sm, "pad identity broken")
    }
    val bucketedPad = out.map(_.getLong(5)).sum
    // id-order batching of the same corpus: batch i = ids 8i..8i+7
    val naivePad = rows.sortBy(_._1).grouped(8).map { g =>
      val mx = g.map(_._2).max
      g.size * mx - g.map(_._2).sum
    }.sum
    assert(bucketedPad < naivePad / 4,
      s"bucketing must slash the pad bill: $bucketedPad vs $naivePad")
  }

  // --- corpusBuild × the hot-bucket guard (the round-10 verdict's
  // capstone composition ask): the capstone must be runnable with the
  // capped dedup and produce the SAME corpus the unguarded build does,
  // because saturated-bucket delegation on a boilerplate family is
  // exact (identical texts ⇒ jaccard 1.0 ⇒ sat_precision 1.0, the d14
  // premise) — while the funnel gains the delegation-count row.

  private def capstoneCorpus = {
    val s = spark
    import s.implicits._
    // 18 diverse docs (distinct 12-word vocabularies — every minhash
    // bucket occupancy 1) + a 12-member identical boilerplate family
    // (identical signatures ⇒ both band buckets at occupancy 12)
    val diverse = (0 until 18).map { i =>
      (i.toLong,
        (0 until 12).map(w => s"w${i}_$w").mkString(" "),
        "web")
    }
    val boiler = (0 until 12).map { i =>
      (100L + i,
        (0 until 12).map(w => s"boilerplate_token_$w").mkString(" "),
        "web")
    }
    (diverse ++ boiler).toDF("doc_id", "text", "source")
  }

  private def capstoneWeights = {
    val s = spark
    import s.implicits._
    Seq(("web", 1L)).toDF("source", "w")
  }

  private def buildPacked(cap: Int) =
    PrepOps.corpusBuild(capstoneCorpus, "doc_id", "text", "source",
        capstoneWeights, "source", "w", tokenBudget = 100000L,
        packBudget = 50L, partitions = 4, maxOccupancy = cap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("corpusBuild maxOccupancy: capped == uncapped when nothing " +
      "saturates, AND on a planted boilerplate family (exact delegation)") {
    val uncapped = buildPacked(Int.MaxValue)
    // cap above the family's bucket occupancy: the guard short-circuits
    assert(buildPacked(1000) == uncapped,
      "no-saturation capped build must equal the unguarded build")
    // cap below it: the family's buckets delegate through star edges;
    // identical texts make the delegation exact (jaccard 1.0), so the
    // d14-proven component resolution yields the SAME survivors and the
    // packed corpus is identical end to end
    assert(buildPacked(4) == uncapped,
      "capped build on the boilerplate family must equal the unguarded " +
        "build (the d14 equivalence, composed through the capstone)")
  }

  test("corpusBuildFunnel maxOccupancy: the 2b_delegated row prices the " +
      "guard's delegation; uncapped funnels never show it") {
    import org.apache.spark.sql.functions.col
    def funnel(cap: Int) =
      PrepOps.corpusBuildFunnel(capstoneCorpus, "doc_id", "text",
          "source", capstoneWeights, "source", "w",
          tokenBudget = 100000L, packBudget = 50L, partitions = 4,
          maxOccupancy = cap)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val capped = funnel(4)
    // 12 identical members, min-id root stays exact-side: 11 delegated
    assert(capped("2b_delegated")._1 == 11L,
      s"wanted 11 delegated docs: ${capped.get("2b_delegated")}")
    assert(capped("2b_delegated")._2 == 11L * 12L,
      "delegated docs must be priced in tokens like any stage")
    assert(!funnel(Int.MaxValue).contains("2b_delegated"),
      "the uncapped funnel must be byte-identical to before the guard")
    // the delegation row is observability, not a leak: survivors at the
    // deduped stage match the uncapped funnel's count exactly
    assert(capped("2_deduped") == funnel(Int.MaxValue)("2_deduped"))
  }

  test("corpusBuild bpeMergeTable: stages 1-4 are unit-independent; " +
      "the BPE funnel reports one unit everywhere, consistent with " +
      "bpeTokenCounter") {
    val s = spark
    import s.implicits._
    val corpus = capstoneCorpus
    val mt = TextOps.bpeLearn(corpus.select($"text"), "text",
      merges = 3).pin()
    def funnel(bpe: Option[org.apache.spark.sql.DataFrame]) =
      PrepOps.corpusBuildFunnel(corpus, "doc_id", "text", "source",
          capstoneWeights, "source", "w", tokenBudget = 100000L,
          packBudget = 500L, partitions = 4, bpeMergeTable = bpe)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val words = funnel(None)
    val bpe = funnel(Some(mt))
    // gate/dedup/split/decontam decide on text CONTENT, not the token
    // unit: identical doc counts at stages 0-4
    Seq("0_input", "1_gated", "2_deduped", "3_train",
        "4_decontaminated").foreach { st =>
      assert(bpe(st)._1 == words(st)._1,
        s"stage $st doc count moved with the unit: " +
          s"${bpe(st)._1} vs ${words(st)._1}")
    }
    // one unit across the BPE funnel: 0_input tokens == the counter
    // column summed over the corpus (row-complete), and 3 merges leave
    // multi-char words costing > 1 token, so the BPE total strictly
    // exceeds the word total
    val counterTotal = corpus.select(org.apache.spark.sql.functions
        .sum(TextOps.bpeTokenCounter(mt)($"text")))
      .collect().head.getLong(0)
    assert(bpe("0_input")._2 == counterTotal,
      s"funnel 0_input ${bpe("0_input")._2} != counter $counterTotal")
    assert(bpe("0_input")._2 > words("0_input")._2,
      "BPE tokens at 3 merges must exceed whitespace words")
    // budget far above avail: every clean doc samples in both units, so
    // 5_sampled doc counts also agree (the unit moves TOKENS, and the
    // packed stage's token total equals the sampled stage's — packing
    // conserves tokens in whichever unit it budgets)
    assert(bpe("5_sampled")._1 == words("5_sampled")._1,
      "unsaturated budget must sample identically in both units")
    assert(bpe("6_packed")._2 == bpe("5_sampled")._2,
      "packing must conserve the BPE token total")
  }

  test("quantizeInt8: q in [-127,127], error bounded by scale/2") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -0.25f, 0.125f, 0.0f)),
      (2L, Seq(0.001f, 0.002f, -0.003f, 0.004f)))
      .toDF("vec_id", "embedding")
    PrepOps.quantizeInt8(df, "vec_id", "embedding").collect().foreach { r =>
      val (qMax, qMin, err) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(qMax <= 127 && qMin >= -127)
      assert(qMax == 127 || qMin == -127) // scale anchors the max component
      // err <= scale/2 in original units; scale = max|c|/127/1e6 <= 0.5/127e-6
      assert(err <= 0.5 / 127.0 / 2.0 + 1e-12, s"err=$err")
    }
  }

  test("packTokenSequences: positions are dense 0..n-1 per pack, " +
      "per-pack token totals equal the packSequences bill, and the " +
      "within-pack order is (doc_id, word_idx, tok_idx)") {
    val s = spark
    import s.implicits._
    // a corpus with repeated words (so BPE merges fire), an empty doc
    // (packs at zero cost, emits nothing), and two sources (packing
    // must stay per-group). merges=2 learns real multi-char symbols.
    val docs = Seq(
      (1L, "aa ab aa ab aa", "s1"),
      (2L, "", "s1"),
      (3L, "ab ab cd", "s1"),
      (4L, "aa aa aa aa aa aa", "s1"),
      (5L, "cd cd aa", "s2"),
      (6L, "ab", "s2"))
      .toDF("doc_id", "text", "src")
    val mt = TextOps.bpeLearn(docs.select($"text"), "text", merges = 2)
      .pin()
    val ids = TextOps.bpeTokenIdTable(docs, "text", mt).pin()
    val budget = 6L
    val out = PrepOps.packTokenSequences(docs, "doc_id", "text", "src",
      mt, ids, budget).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // no NULL ids (in-vocab corpus) — getLong above would have thrown
    // dense positions per (group, pack)
    out.groupBy(t => (t._1, t._2)).foreach { case (pk, rows) =>
      val pos = rows.map(_._4).sorted.toSeq
      assert(pos == (0L until rows.length.toLong),
        s"pack $pk positions not dense: $pos")
    }
    // per-pack totals equal the packSequences bill over the SAME
    // counts (zero-token docs included there, costlessly)
    val counter = TextOps.bpeTokenCounter(mt)
    val billed = PrepOps.packSequences(
        docs.select($"src", $"doc_id", counter($"text").as("toks")),
        "src", "doc_id", "toks", budget)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(3))).toMap
    val totals = out.groupBy(t => (t._1, t._2))
      .map { case (pk, rows) => pk -> rows.length.toLong }
    // every pack with >= 1 token matches its bill; zero-token packs
    // (possible only from all-empty docs) emit no rows by contract
    totals.foreach { case (pk, n) =>
      assert(billed.get(pk).contains(n),
        s"pack $pk total $n != bill ${billed.get(pk)}")
    }
    assert(billed.filter(_._2 > 0L).keySet == totals.keySet,
      "a non-empty billed pack emitted no rows")
    // within a pack, positions follow (doc_id, word_idx, tok_idx):
    // doc order is id-ascending, and each doc's slice is its t20
    // stream order — spot-check via the stream itself
    val stream = TextOps.bpeTokenIds(docs, "doc_id", "text", mt, ids)
      .orderBy($"id", $"word_idx", $"tok_idx")
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    val byDoc = stream.groupBy(_._1).view.mapValues(_.map(_._2).toSeq)
    out.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      val inPackOrder = rows.sortBy(_._4)
      val docsInPack = inPackOrder.map(_._3).distinct
      assert(docsInPack.sorted.toSeq == docsInPack.toSeq,
        s"docs not id-ascending within the pack: $docsInPack")
      val expected = docsInPack.flatMap(d => byDoc(d))
      assert(inPackOrder.map(_._5).toSeq == expected.toSeq,
        "pack token order != concatenated t20 streams")
    }
  }

  test("epochShuffle: every epoch is a complete permutation, positions " +
      "dense per (epoch, bucket), orders differ across epochs, and the " +
      "whole derivation is deterministic across calls/partitionings") {
    val s = spark
    import s.implicits._
    val packs = (0L until 40L).map(i => (s"src${i % 3}", i))
      .toDF("source", "pack_id")
    def run(parts: Int) = PrepOps.epochShuffle(
        packs.repartition(parts), Seq("source", "pack_id"),
        epochs = 3, buckets = 4)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(0), r.getLong(1)))
      .toSet // (epoch, bucket, pos, source, pack_id)
    val out = run(4)
    assert(out.size == 3 * 40, s"expected 120 rows, got ${out.size}")
    // complete permutation per epoch: every key exactly once
    (0L until 3L).foreach { e =>
      val keys = out.filter(_._1 == e).map(t => (t._4, t._5))
      assert(keys.size == 40, s"epoch $e lost/duplicated keys")
    }
    // dense positions per (epoch, bucket)
    out.groupBy(t => (t._1, t._2)).foreach { case (eb, rows) =>
      val pos = rows.map(_._3).toSeq.sorted
      assert(pos == (0L until rows.size.toLong),
        s"$eb positions not dense: $pos")
    }
    // epochs genuinely reorder: the (bucket, pos) address of at least
    // one key differs between epoch 0 and epoch 1 (md5 keys are fixed,
    // so this is a deterministic property of the fixture, not flake)
    val addr = (e: Long) => out.filter(_._1 == e)
      .map(t => (t._4, t._5) -> (t._2, t._3)).toMap
    assert(addr(0L) != addr(1L), "epochs 0 and 1 gave the same order")
    // determinism: identical output under a different partitioning
    assert(run(11) == out, "epochShuffle depends on partitioning")
    // duplicate keys would tie on every ordering column and take
    // positions nondeterministically — rejected loudly
    val dup = intercept[IllegalArgumentException] {
      PrepOps.epochShuffle(packs.unionAll(packs.limit(1)),
        Seq("source", "pack_id"), epochs = 1, buckets = 4)
    }
    assert(dup.getMessage.contains("not"), dup.getMessage)
    // reserved output names collide loudly instead of silently
    // overwriting the caller's column
    val clash = intercept[IllegalArgumentException] {
      PrepOps.epochShuffle(
        packs.withColumn("bucket",
          org.apache.spark.sql.functions.lit(1)),
        Seq("source", "pack_id"), epochs = 1)
    }
    assert(clash.getMessage.contains("bucket"), clash.getMessage)
  }
}
