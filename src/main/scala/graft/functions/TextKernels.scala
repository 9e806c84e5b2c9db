package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Compiled per-document text kernels (shingling, MinHash, SimHash).
  *
  * These exist for the same reason as `DotI64`: Spark's higher-order
  * functions (`transform`/`slice`/`aggregate`) are INTERPRETED inside
  * whole-stage codegen, and Catalyst's project-collapse freely duplicates
  * such expressions into every subtree that references them. For the
  * CPU-bound dedup kernels (1M+ shingles x 16 md5s each at sf0.1) that
  * meant minutes of single-threaded interpreted evaluation. Each kernel
  * here is one `mapPartitions` pass of plain JVM code — compiled,
  * allocation-light, partition-parallel, and immune to optimizer
  * placement — producing small *data* columns that downstream joins and
  * aggregations consume relationally.
  *
  * Cross-engine determinism: hashes are md5 over the same strings the
  * DuckDB oracle hashes (`md5('$i:' || shingle)`), hex-encoded lowercase,
  * and the MinHash min is the lexicographic min of fixed-length hex —
  * identical in both engines, so oracle SQL needs no kernel analog.
  *
  * Null contract: rows with a null text column are dropped before the
  * kernel runs — the same observable behavior as the oracle spellings,
  * where `string_split(NULL)` is NULL and `unnest(NULL)` emits nothing.
  * (The facades accept arbitrary caller DataFrames, so this is a real
  * input class, not a testdata hypothetical.)
  */
object TextKernels {

  /** Distinct word k-gram shingles of a clean single-spaced text; falls
    * back to the whole text when it has fewer than k words (mirrors the
    * `sqlShingles` CASE in queries.Dedup).
    */
  def shingleSet(text: String, k: Int): Array[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < k) Array(ws.mkString(" "))
    else {
      val seen = new java.util.LinkedHashSet[String]
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + k <= ws.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      seen.toArray(new Array[String](seen.size))
    }
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HEX(b >>> 4)
      out(i * 2 + 1) = HEX(b & 0xf)
      i += 1
    }
    new String(out)
  }

  def md5Hex(md: MessageDigest, s: String): String = {
    md.reset()
    hex(md.digest(s.getBytes(StandardCharsets.UTF_8)))
  }

  /** (doc_id, shs: array&lt;string&gt;) — per-doc distinct shingle arrays. */
  def shingleArrays(s: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    docs.select("doc_id", "text").filter(col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, shingleSet(text, k)) })
      .toDF("doc_id", "shs")
  }

  /** MinHash signature: h_i = min over shingles of md5("$i:" + shingle)
    * (lexicographic min of fixed-length hex == numeric min of the
    * 128-bit value). Pure; one entry per hash function.
    */
  def minhashSig(md: MessageDigest, shs: Array[String], nh: Int): Array[String] = {
    val mins = new Array[String](nh)
    var si = 0
    while (si < shs.length) {
      var i = 0
      while (i < nh) {
        val h = md5Hex(md, i.toString + ":" + shs(si))
        if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
        i += 1
      }
      si += 1
    }
    mins
  }

  /** (doc_id, mins array<string>) — the raw `nh` minhashes per document,
    * ONE kernel pass. Banding is then a pure projection, so several LSH
    * parameterizations (band/row splits of the same hashes) can be
    * derived from a single signature computation — the operating-curve
    * measurement path.
    */
  def minhashSignatures(
      s: SparkSession, docs: DataFrame, k: Int, nh: Int): DataFrame = {
    import s.implicits._
    docs.select("doc_id", "text").filter(col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          (id, minhashSig(md, shingleSet(text, k), nh))
        }
      }
      .toDF("doc_id", "mins")
  }

  /** (doc_id, band, bkey) LSH band buckets: band key = concat of the
    * band's ROWS minhashes. One output row per (doc, band).
    */
  def minhashBands(
      s: SparkSession, docs: DataFrame, k: Int,
      bands: Int, rows: Int): DataFrame = {
    import s.implicits._
    val nh = bands * rows
    docs.select("doc_id", "text").filter(col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val mins = minhashSig(md, shingleSet(text, k), nh)
          (0 until bands).map { b =>
            val sb = new java.lang.StringBuilder(rows * 32)
            var r = 0
            while (r < rows) { sb.append(mins(b * rows + r)); r += 1 }
            (id, b, sb.toString)
          }
        }
      }
      .toDF("doc_id", "band", "bkey")
  }

  /** (doc_id, fp_winnow) — winnowing-style fingerprint: the minimum md5
    * over the distinct word k-gram shingles (the coarsest winnowing
    * setting — one min per document). Matches the oracle expression
    * `list_min(list_transform(shingles, g -> md5(g)))`.
    */
  def winnowFingerprints(s: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    docs.select("doc_id", "text").filter(col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val shs = shingleSet(text, k)
          var minH: String = null
          var i = 0
          while (i < shs.length) {
            val h = md5Hex(md, shs(i))
            if (minH == null || h.compareTo(minH) < 0) minH = h
            i += 1
          }
          (id, minH)
        }
      }
      .toDF("doc_id", "fp_winnow")
  }

  /** (doc_id, bigram) — one row per ADJACENT word pair, non-distinct
    * (t07 counts raw occurrences). Documents with fewer than two words
    * emit nothing. Exists because the declarative spelling
    * (`transform(sequence(...), i -> concat(element_at(split(text)...)))`)
    * is an interpreted higher-order function that re-evaluates the split
    * per element — the exact pattern this object replaces.
    */
  def bigramPairs(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select("doc_id", "text").filter(col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        positionalGramsOf(text, 2).map(g => (id, g))
      })
      .toDF("doc_id", "bigram")
  }

  /** Positional (non-distinct) word k-grams of one document, LAZILY:
    * element i is the gram starting at word i; empty for documents
    * shorter than k words. An Iterator, not an Array, so the partition
    * iterator pulls grams on demand and per-row peak memory stays
    * O(words), not O(all gram strings) (~k x the text bytes). Pure —
    * the per-row core of [[positionalGrams]] and [[bigramPairs]],
    * property-checked against the sliding-window spelling.
    */
  def positionalGramsOf(text: String, k: Int): Iterator[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < k) Iterator.empty
    else {
      val sb = new java.lang.StringBuilder
      Iterator.tabulate(ws.length - k + 1) { i =>
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        sb.toString
      }
    }
  }

  /** (doc_id, pos, g) — one row per word POSITION's k-gram,
    * non-distinct, 0-based positions; documents with fewer than k words
    * emit nothing. The positional sibling of [[shingleArrays]] (which
    * dedups) — span-level dedup needs every occurrence with its
    * location. Compiled for the same reason as [[bigramPairs]].
    */
  def positionalGrams(s: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    docs.select("doc_id", "text").filter(col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        positionalGramsOf(text, k).zipWithIndex
          .map { case (g, i) => (id, i, g) }
      })
      .toDF("doc_id", "pos", "g")
  }

  /** 32-bit SimHash of one document: each token votes +/-1 per bit from
    * the first 8 md5 nibbles (bit b lives at nibble b/4, position b%4),
    * matching the SQL oracle expression in queries.Dedup d03 exactly.
    * Pure.
    */
  def simhashOf(md: MessageDigest, text: String): Long = {
    val votes = new Array[Int](32)
    val toks = text.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val h = md5Hex(md, toks(t))
      var b = 0
      while (b < 32) {
        val nib = Character.digit(h.charAt(b / 4), 16)
        val bit = (nib >>> (b % 4)) & 1
        votes(b) += (bit * 2 - 1)
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** (doc_id, simhash) over a documents DataFrame. */
  def simhash32(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select("doc_id", "text").filter(col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, text) => (id, simhashOf(md, text)) }
      }
      .toDF("doc_id", "simhash")
  }
}
