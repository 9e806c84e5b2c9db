package graft.operators

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Pins.PinnedDataset

/** ScalaCheck layer over the BPE merge-application trick in
  * [[TextOps.bpeLearn]]: symbols wrapped in their OWN spaces make a
  * literal non-overlapping left-to-right replace (what `regexp_replace`
  * with a quoted pattern executes per row) EXACTLY greedy BPE. The
  * reference implementation is the one-pass fold over the symbol list:
  * merge when the accumulator ends with the unconsumed left symbol and
  * the next symbol is the right one. Seeded, so failures reproduce.
  */
class BpePropertySpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(500)
    .withInitialSeed(Seed(20260814L))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  // multi-char symbols included: after round 1 every real sequence has
  // them, and they are where naive separator schemes break (a symbol
  // ending with another symbol's spelling, e.g. "xx" vs "x")
  private val symGen: Gen[String] = Gen.oneOf("a", "b", "c", "x", "xx", "ab")
  private val seqGen: Gen[List[String]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, symGen))

  /** The production representation: every symbol wrapped in its own
    * spaces, exactly what bpeLearn's regexp_replace row expression sees. */
  private def wrapped(syms: List[String]): String =
    syms.map(s => s" $s ").mkString

  /** The production merge: literal, non-overlapping, left-to-right —
    * regexp_replace(sp, quote(" a  b "), " ab ") semantics. */
  private def mergeByReplace(syms: List[String], a: String, b: String)
      : List[String] = {
    val out = wrapped(syms).replaceAll(
      Pattern.quote(s" $a  $b "), Matcher.quoteReplacement(s" ${a + b} "))
    if (out.trim.isEmpty) Nil else out.trim.split("  ").toList
  }

  /** Reference greedy BPE: one left-to-right pass over the ORIGINAL
    * sequence; a merged token never re-merges in the same round (merged
    * = a+b can't equal a, so the accumulator's tail is `a` only when it
    * is an unconsumed original symbol). */
  private def mergeGreedy(syms: List[String], a: String, b: String)
      : List[String] =
    syms.foldLeft(List.empty[String]) { (acc, cur) =>
      if (acc.nonEmpty && acc.last == a && cur == b)
        acc.init :+ (a + b)
      else acc :+ cur
    }

  test("property: wrapped-symbol replace == greedy one-pass merge") {
    check(Prop.forAll(for {
      syms <- seqGen
      a <- symGen
      b <- symGen
    } yield (syms, a, b)) { case (syms, a, b) =>
      mergeByReplace(syms, a, b) == mergeGreedy(syms, a, b)
    })
  }

  test("property: merging never changes the concatenated word") {
    check(Prop.forAll(for {
      syms <- seqGen
      a <- symGen
      b <- symGen
    } yield (syms, a, b)) { case (syms, a, b) =>
      mergeByReplace(syms, a, b).mkString == syms.mkString
    })
  }

  test("property: merge count equals greedy non-overlapping occurrences") {
    // each merge shrinks the token count by exactly 1, so token-count
    // delta == number of sites the greedy scan chose
    check(Prop.forAll(for {
      syms <- seqGen
      a <- symGen
      b <- symGen
    } yield (syms, a, b)) { case (syms, a, b) =>
      val merged = mergeByReplace(syms, a, b)
      val sites = mergeGreedy(syms, a, b).count(_ == a + b) -
        syms.count(_ == a + b)
      syms.length - merged.length == sites
    })
  }

  // ------------------------------------------------------------------
  // batched learning == one-at-a-time learning (the TextOps.bpeRounds
  // batch rule: rank-prefix of symbol-disjoint pairs, strict count
  // dominance over the stop pair, collision truncation)

  /** Pure one-at-a-time reference: argmax (cnt desc, pair asc), greedy
    * merge, recount — the definitional sequential process. */
  private def refLearn(corpus: Seq[String], merges: Int)
      : Seq[(Int, String, String, Long)] = {
    var words: Seq[(List[String], Long)] = corpus
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).toSeq
      .map { case (w, g) => (w.map(_.toString).toList, g.size.toLong) }
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= merges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long].withDefaultValue(0L)
      words.foreach { case (syms, f) =>
        syms.lazyZip(syms.drop(1)).foreach((a, b) => counts((a, b)) += f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) =>
          (-c, s"$x $y")
        }
        learned += ((step, s"$a $b", a + b, cnt))
        words = words.map { case (syms, f) => (mergeGreedy(syms, a, b), f) }
        step += 1
      }
    }
    learned.toSeq
  }

  private var spark: org.apache.spark.sql.SparkSession = _
  private def sparkUp(): org.apache.spark.sql.SparkSession = {
    if (spark == null) {
      spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .appName("bpe-batch-equivalence")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
    }
    spark
  }
  private def sparkLearn(corpus: Seq[String], merges: Int, maxBatch: Int,
      driverFinishBytes: Long = 0L): Seq[(Int, String, String, Long)] = {
    val s = sparkUp()
    import s.implicits._
    TextOps.bpeLearn(corpus.toDF("t"), "t", merges, maxBatch,
        driverFinishBytes)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
  }

  test("batched == one-at-a-time on adversarial run-heavy corpora " +
      "(runs, ties, symbol collisions)") {
    val corpora = Seq(
      // pure runs: every pair interacts with itself and its neighbors
      Seq("aaaaaaaa aaaa aa a"),
      // alternations: merges create self-adjacent new pairs (ab,ab)
      Seq("abababab abab ab ba bab"),
      // collision course: "ab"+"c" and "a"+"bc" both spell "abc"
      Seq("abc abc abc ab ab bc bc zbc zab c a"),
      // flat tie plateau: all counts equal, strictness must clamp
      Seq("ab ab cd cd ef ef gh gh"),
      // tie between interacting pairs
      Seq("ab ab ac ac", "ab ac"),
      // mixed natural-ish text with runs
      Seq("the theme thethe there", "aaa aaab baaa", "oooo oo o"))
    corpora.foreach { corpus =>
      val ref = refLearn(corpus, 12)
      // all three production paths must equal the definitional process:
      // distributed one-at-a-time, distributed exact-batched, and the
      // collected driver-side indexed trainer
      val seqL = sparkLearn(corpus, 12, maxBatch = 1)
      val batched = sparkLearn(corpus, 12, maxBatch = 8)
      val driver = sparkLearn(corpus, 12, maxBatch = 8,
        driverFinishBytes = 64L << 20)
      assert(seqL == ref, s"one-at-a-time drifted from reference on " +
        s"$corpus:\n$seqL\nvs\n$ref")
      assert(batched == ref, s"batched drifted from reference on " +
        s"$corpus:\n$batched\nvs\n$ref")
      assert(driver == ref, s"driver trainer drifted from reference on " +
        s"$corpus:\n$driver\nvs\n$ref")
    }
  }

  test("batched == one-at-a-time on seeded random run-heavy corpora") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 10).foreach { _ =>
      // tiny alphabet + geometric run lengths: maximal pair interaction
      val words = (1 to rnd.between(3, 9)).map { _ =>
        (1 to rnd.between(1, 7)).map { _ =>
          val ch = "ab" (rnd.nextInt(2)).toString
          ch * rnd.between(1, 4)
        }.mkString
      }
      val corpus = Seq(words.mkString(" "))
      val ref = refLearn(corpus, 10)
      val batched = sparkLearn(corpus, 10, maxBatch = 8)
      val driver = sparkLearn(corpus, 10, maxBatch = 8,
        driverFinishBytes = 64L << 20)
      assert(batched == ref,
        s"batched drifted on $corpus:\n$batched\nvs\n$ref")
      assert(driver == ref,
        s"driver trainer drifted on $corpus:\n$driver\nvs\n$ref")
    }
  }

  test("driver trainer == full-recount reference over a deep merge " +
      "sequence (incremental index stress)") {
    // the indexed trainer's risk surface is its INCREMENTAL updates
    // (pair-count deltas, occurrence-set add/remove, heap staleness)
    // compounding over many merges — a medium corpus driven deep pins
    // it against the naive full-recount reference: 600 words over a
    // 6-letter alphabet, 80 merges (several vocabulary regimes: hot
    // char pairs, then multi-char symbol pairs, then long-tail)
    val rnd = new scala.util.Random(91L)
    val words = (1 to 600).map { _ =>
      (1 to rnd.between(2, 10)).map(_ => "abcdef"(rnd.nextInt(6)))
        .mkString
    }
    val corpus = Seq(words.mkString(" "))
    val ref = refLearn(corpus, 80)
    val driver = sparkLearn(corpus, 80, maxBatch = 8,
      driverFinishBytes = 64L << 20)
    assert(driver.length == ref.length,
      s"merge count drifted: ${driver.length} vs ${ref.length}")
    driver.zip(ref).foreach { case (d, r) =>
      assert(d == r, s"first divergence at step ${r._1}: $d vs $r")
    }
  }

  /** Ranks map from a learned merge list, as bpeEncode builds it. */
  private def ranksOf(learned: Seq[(Int, String, String, Long)])
      : Map[(String, String), Int] =
    learned.map { case (step, pr, _, _) =>
      val Array(a, b) = pr.split(" ", 2)
      (a, b) -> step
    }.toMap

  /** The definitional encode: replay the FULL merge list in rank order
    * with the greedy fold — the reference bpeEncode's
    * lowest-rank-present loop must equal. */
  private def replayEncode(w: String,
      learned: Seq[(Int, String, String, Long)]): List[String] =
    learned.sortBy(_._1).foldLeft(w.map(_.toString).toList) {
      case (syms, (_, pr, _, _)) =>
        val Array(a, b) = pr.split(" ", 2)
        mergeGreedy(syms, a, b)
    }

  test("bpeEncode kernel == full-merge-list replay == trained " +
      "segmentation, on train AND unseen words (OOV never drops)") {
    // seeded sweep: random corpora, deep merges; every TRAIN word's
    // encode length must equal both the definitional full-list replay
    // and the trained word table's segmentation (what the t15 vocab
    // join serves); every UNSEEN word must equal the replay and never
    // lose a token (>= 1, <= its code points)
    val rnd = new scala.util.Random(4243L)
    (1 to 8).foreach { trial =>
      val words = (1 to 120).map { _ =>
        (1 to rnd.between(1, 9)).map(_ => "abcde"(rnd.nextInt(5)))
          .mkString
      }
      val corpus = Seq(words.mkString(" "))
      val merges = rnd.between(3, 30)
      val learned = refLearn(corpus, merges)
      val ranks = ranksOf(learned)
      // trained segmentation per word: the reference trainer's final
      // state, recomputed by replay (refLearn mutates nothing)
      words.distinct.foreach { w =>
        val replayed = replayEncode(w, learned)
        val got = TextOps.bpeEncodeLen(w, ranks)
        assert(got == replayed.length,
          s"trial $trial: train word '$w': encode $got != " +
            s"replay ${replayed.length} (merges=$merges)")
        assert(replayed.mkString == w, "replay must preserve the word")
      }
      val unseen = (1 to 40).map { _ =>
        (1 to rnd.between(1, 12)).map(_ => "abcdef"(rnd.nextInt(6)))
          .mkString
      }.filterNot(words.toSet)
      unseen.foreach { w =>
        val replayed = replayEncode(w, learned)
        val got = TextOps.bpeEncodeLen(w, ranks)
        assert(got == replayed.length,
          s"trial $trial: unseen word '$w': encode $got != " +
            s"replay ${replayed.length}")
        assert(got >= 1 && got <= w.length,
          s"unseen word '$w' lost tokens: $got")
      }
    }
  }

  test("bpeEncodeSyms sequences == full-merge-list replay (not just " +
      "lengths), train and unseen") {
    // t19's operator-level claim: the lowest-rank-present loop emits
    // the SAME token sequence as the definitional rank-ordered replay —
    // sequence equality is strictly stronger than the length equality
    // the earlier sweep pins (two different segmentations can tie on
    // length)
    val rnd = new scala.util.Random(7321L)
    (1 to 8).foreach { trial =>
      val words = (1 to 120).map { _ =>
        (1 to rnd.between(1, 9)).map(_ => "abcde"(rnd.nextInt(5)))
          .mkString
      }
      val corpus = Seq(words.mkString(" "))
      val merges = rnd.between(3, 30)
      val learned = refLearn(corpus, merges)
      val ranks = ranksOf(learned)
      val unseen = (1 to 40).map { _ =>
        (1 to rnd.between(1, 12)).map(_ => "abcdef"(rnd.nextInt(6)))
          .mkString
      }
      (words.distinct ++ unseen).foreach { w =>
        val replayed = replayEncode(w, learned)
        val got = TextOps.bpeEncodeSyms(w, ranks).toList
        assert(got == replayed,
          s"trial $trial: word '$w': syms $got != replay $replayed " +
            s"(merges=$merges)")
      }
    }
  }

  test("bpeTokenize stream: ordered sequences match the replay; " +
      "grouped counts match bpeEncode; bpeTokenIds joins the dense " +
      "vocab with NULL on unseen symbols") {
    val s = sparkUp()
    import s.implicits._
    val train = Seq(
      (1L, "abab abab cdcd"), (2L, "abab cdcd cdcd dada"),
      (3L, "dada abab"))
    val trainDf = train.toDF("id", "t")
    val mergeTable = TextOps.bpeLearn(trainDf.select($"t"), "t",
      merges = 4).pin()
    val learned = mergeTable.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // doc 9: one train word + unseen words with a NEVER-SEEN char 'z'
    val probe = Seq((9L, "abab zzda qq")).toDF("id", "t")
    val stream = TextOps.bpeTokenize(probe, "id", "t", mergeTable)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._2, t._3))
    val expect = Seq("abab", "zzda", "qq").zipWithIndex.flatMap {
      case (w, wi) => replayEncode(w, learned).zipWithIndex.map {
        case (tok, ti) => (9L, wi, ti, tok)
      }
    }
    assert(stream.toSeq == expect,
      s"token stream drifted:\n${stream.toSeq}\nvs\n$expect")
    // counting face: GROUP BY id COUNT(*) == bpeEncode's n_bpe_tokens
    val nFromStream = stream.length.toLong
    val nFromEncode = TextOps.bpeEncode(probe, "id", "t", mergeTable)
      .collect().head.getLong(2)
    assert(nFromStream == nFromEncode,
      s"stream count $nFromStream != encode count $nFromEncode")
    // id resolution: train-corpus symbols resolve; 'z'/'q' (never in
    // training) surface with token_id NULL, never dropped
    val idTable = TextOps.bpeTokenIdTable(trainDf, "t", mergeTable)
      .pin()
    val ids = idTable.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(ids.values.toSeq.sorted == (0L until ids.size).toSeq,
      s"ids not dense: $ids")
    assert(ids.keys.toSeq.sorted == ids.toSeq.sortBy(_._2).map(_._1),
      "ids not ordered by token string")
    val resolved = TextOps.bpeTokenIds(probe, "id", "t", mergeTable,
        idTable)
      .collect()
      .map(r => (r.getString(3), if (r.isNullAt(4)) None
        else Some(r.getLong(4))))
    assert(resolved.length == stream.length, "id join dropped tokens")
    resolved.foreach { case (tok, id) =>
      assert(id == ids.get(tok),
        s"token '$tok' resolved to $id, vocab says ${ids.get(tok)}")
    }
    assert(resolved.exists(_._2.isEmpty),
      "probe contains never-trained chars; some token_id must be NULL")
    // the counter column (the capstone's budget unit) equals bpeEncode
    val counted = probe.withColumn("n",
        TextOps.bpeTokenCounter(mergeTable)(col("t")))
      .collect().head.getLong(2)
    assert(counted == nFromEncode,
      s"bpeTokenCounter $counted != bpeEncode $nFromEncode")
  }

  test("bpeEncode end-to-end: equals bpeSegment on the train corpus, " +
      "and counts unseen words the vocab join silently drops") {
    val s = sparkUp()
    import s.implicits._
    val train = Seq(
      (1L, "abab abab cdcd"), (2L, "abab cdcd cdcd dada"),
      (3L, "dada abab"))
    val trainDf = train.toDF("id", "t")
    val mergeTable = TextOps.bpeLearn(trainDf.select($"t"), "t",
      merges = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    // in-vocab: the merge-apply spelling IS the cached-segmentation
    // lookup (the t18 oracle's claim, pinned here without DuckDB)
    val seg = rows(TextOps.bpeSegment(trainDf, "id", "t",
      TextOps.bpeVocab(trainDf.select($"t"), "t", merges = 4),
      maxBroadcastBytes = 256L << 20))
    val enc = rows(TextOps.bpeEncode(trainDf, "id", "t", mergeTable))
    assert(enc == seg, s"in-vocab drift: $enc vs $seg")
    // OOV: doc 9 mixes one train word with two unseen words — the
    // vocab join sees 1 word; the merge-apply spelling counts all 3,
    // costing the unseen words their replayed segmentations
    val mixed = Seq((9L, "abab zzyy qqq")).toDF("id", "t")
    val segM = rows(TextOps.bpeSegment(mixed, "id", "t",
      TextOps.bpeVocab(trainDf.select($"t"), "t", merges = 4),
      maxBroadcastBytes = 256L << 20))
    assert(segM.forall(_._2 == 1L),
      s"vocab join should only see the train word: $segM")
    val encM = rows(TextOps.bpeEncode(mixed, "id", "t", mergeTable))
    assert(encM.size == 1 && encM.head._2 == 3L,
      s"merge-apply must count all 3 words: $encM")
    val learned = mergeTable.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val expected = Seq("abab", "zzyy", "qqq")
      .map(w => replayEncode(w, learned).length.toLong).sum
    assert(encM.head._3 == expected,
      s"OOV token counts drifted: ${encM.head._3} vs $expected")
    // row-completeness (the operator's headline contract): a zero-word
    // document must still appear, with counts 0 — the vocab join drops
    // it, bpeEncode never drops anything
    val withEmpty = Seq((7L, ""), (8L, "abab")).toDF("id", "t")
    val encE = rows(TextOps.bpeEncode(withEmpty, "id", "t", mergeTable))
    assert(encE.exists(_ == ((7L, 0L, 0L))),
      s"empty doc dropped or miscounted: $encE")
    assert(encE.size == 2)
  }
}
