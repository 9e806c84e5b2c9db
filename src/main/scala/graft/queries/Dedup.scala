package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import GraftQuery._

/** Deduplication operators over the `documents` and `embeddings` tables —
  * the core of a training-data pipeline (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup).
  *
  * Engine-portability design (every query here is DuckDB-oracle-checked):
  *  - All hashing is md5 over deterministic strings; the lexicographic min
  *    of fixed-length lowercase hex equals the numeric min of the 128-bit
  *    value, so MinHash works on the hex strings directly in both engines.
  *  - Jaccard / cosine are emitted from EXACT integer or decimal
  *    arithmetic, with exactly one final double division, so both engines
  *    round identically.
  *  - Floats are cast to double FIRST (exact), then quantized to
  *    decimal(12,6): the only lossy step is one double->decimal rounding,
  *    which both engines perform identically (see GraftQuery.dec notes).
  *
  * Scale design (100 TB): everything is shingle/band-bucketed joins —
  * no cross join anywhere except the final verification of *candidate*
  * pairs, whose cardinality is output-sized, not input-sized. Candidate
  * generation shuffles on (band, bandKey) / shingle hash, which
  * distributes; hot buckets (ubiquitous shingles) are bounded by using
  * long (5/7-gram) shingles.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Distinct word k-gram shingles of `text` (clean single-spaced corpus). */
  private def shingles(text: Column, k: Int): Column = {
    val ws = split(text, " ")
    when(size(ws) >= k,
      array_distinct(transform(
        sequence(lit(0), size(ws) - lit(k)),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(k))))))
      .otherwise(array(concat_ws(" ", ws)))
  }

  /** SQL spelling of [[shingles]] (DuckDB list comprehension). */
  private def sqlShingles(k: Int): String =
    s"""CASE WHEN len(ws) >= $k
       | THEN list_distinct([array_to_string(ws[i+1:i+$k], ' ') for i in range(len(ws)-${k - 1})])
       | ELSE [array_to_string(ws, ' ')] END""".stripMargin

  /** doc_id -> exploded distinct shingle rows, shared by several queries. */
  private def shingleRows(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    docs(s, dir).select($"doc_id", explode(shingles($"text", k)).as("sh"))
  }

  // MinHash parameters: BANDS bands x ROWS rows = 16 hash functions.
  // LSH threshold ~ (1/BANDS)^(1/ROWS) = 0.25^0.25 ~ 0.71; final verify
  // keeps jaccard >= 0.8.
  private val BANDS = 4
  private val ROWS = 4
  private val JACCARD_T = 0.8

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------ exact
    GraftQuery(
      "d01_dedup_exact",
      (s, dir) => {
        import s.implicits._
        // Exact dedup: hash-groupBy on a content fingerprint; keep the
        // lowest doc_id of each group. One shuffle on the (uniform) md5
        // key — scales linearly; no skew possible.
        docs(s, dir)
          .groupBy(md5(col("text")).as("fingerprint"))
          .agg(min($"doc_id").as("keep_doc_id"),
            count(lit(1)).as("n_copies"))
      },
      Some("""
        SELECT md5(text) AS fingerprint, MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY 1""")),

    // ----------------------------------------------------- MinHash + LSH
    GraftQuery(
      "d02_dedup_minhash_lsh",
      (s, dir) => {
        import s.implicits._
        // shingle -> 16 minhashes -> band buckets -> candidate pairs ->
        // exact-jaccard verification of candidates only.
        val sh = shingleRows(s, dir, 5)
        val hashes = (0 until BANDS * ROWS).map(i =>
          min(md5(concat(lit(s"$i:"), $"sh"))).as(s"h$i"))
        val sig = sh.groupBy($"doc_id").agg(hashes.head, hashes.tail: _*)
        val bands = sig.select($"doc_id", explode(array(
          (0 until BANDS).map(b => struct(
            lit(b).as("band"),
            concat((0 until ROWS).map(r => col(s"h${b * ROWS + r}")): _*)
              .as("bkey"))): _*)).as("bb"))
          .select($"doc_id", $"bb.band", $"bb.bkey")
        val cand = bands.as("x").join(bands.as("y"),
            $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey"
              && $"x.doc_id" < $"y.doc_id")
          .select($"x.doc_id".as("a"), $"y.doc_id".as("b")).distinct()
        val nsh = sh.groupBy($"doc_id").agg(count(lit(1)).as("nsh"))
        val inter = cand
          .join(sh.as("sa"), $"a" === $"sa.doc_id")
          .join(sh.as("sb"), $"b" === $"sb.doc_id" && $"sa.sh" === $"sb.sh")
          .groupBy($"a", $"b").agg(count(lit(1)).as("inter"))
        inter
          .join(nsh.as("na"), $"a" === $"na.doc_id")
          .join(nsh.as("nb"), $"b" === $"nb.doc_id")
          .select($"a", $"b",
            ($"inter".cast("double") /
              ($"na.nsh" + $"nb.nsh" - $"inter")).as("jaccard"))
          .filter($"jaccard" >= JACCARD_T)
      },
      Some {
        val hs = (0 until BANDS * ROWS)
          .map(i => s"min(md5('$i:' || sh)) AS h$i").mkString(",\n            ")
        val bandRows = (0 until BANDS).map(b =>
          s"SELECT doc_id, $b AS band, " +
            (0 until ROWS).map(r => s"h${b * ROWS + r}").mkString(" || ") +
            " AS bkey FROM sig").mkString("\n          UNION ALL ")
        s"""
        WITH sh AS (
          SELECT doc_id, unnest(${sqlShingles(5)}) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') ws FROM documents)
        ),
        sig AS (
          SELECT doc_id,
            $hs
          FROM sh GROUP BY doc_id
        ),
        bands AS (
          $bandRows
        ),
        cand AS (
          SELECT DISTINCT x.doc_id a, y.doc_id b
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
        ),
        nsh AS (SELECT doc_id, COUNT(*) nsh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.a, c.b, COUNT(*) inter
          FROM cand c
            JOIN sh sa ON sa.doc_id = c.a
            JOIN sh sb ON sb.doc_id = c.b AND sb.sh = sa.sh
          GROUP BY c.a, c.b
        )
        SELECT i.a, i.b,
          CAST(i.inter AS DOUBLE) / (na.nsh + nb.nsh - i.inter) AS jaccard
        FROM inter i
          JOIN nsh na ON na.doc_id = i.a
          JOIN nsh nb ON nb.doc_id = i.b
        WHERE CAST(i.inter AS DOUBLE) / (na.nsh + nb.nsh - i.inter) >= $JACCARD_T"""
      }),

    // ------------------------------------------------------------ SimHash
    GraftQuery(
      "d03_dedup_simhash",
      (s, dir) => {
        import s.implicits._
        // 32-bit SimHash over word unigrams (md5 nibble bits, +/-1 votes).
        // Near-dup pairs found by byte-banding (hamming<=3 => at least one
        // of the 4 bytes equal, by pigeonhole), then exact hamming filter.
        val tok = docs(s, dir)
          .select($"doc_id", explode(split($"text", " ")).as("w"))
          .withColumn("h", md5($"w"))
        val nibs = (0 until 8).map(j =>
          (expr(s"instr('0123456789abcdef', substring(h, ${j + 1}, 1))") -
            lit(1)).as(s"n$j"))
        val withNibs = tok.select(($"doc_id" +: nibs): _*)
        val bitSums = (0 until 32).map { b =>
          val j = b / 4; val k = b % 4
          sum(shiftright(col(s"n$j"), k).bitwiseAND(lit(1)) * lit(2) - lit(1))
            .as(s"s$b")
        }
        val sums = withNibs.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
        val simhash = (0 until 32).map { b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _)
        val sig = sums.select($"doc_id", simhash.as("simhash"))
        val bytes = sig.select($"doc_id", $"simhash", explode(array(
          (0 until 4).map(c => struct(
            lit(c).as("pos"),
            shiftright($"simhash", c * 8).bitwiseAND(lit(255)).as("byte"))): _*))
          .as("bb"))
          .select($"doc_id", $"simhash", $"bb.pos", $"bb.byte")
        bytes.as("x").join(bytes.as("y"),
            $"x.pos" === $"y.pos" && $"x.byte" === $"y.byte"
              && $"x.doc_id" < $"y.doc_id")
          .select($"x.doc_id".as("a"), $"y.doc_id".as("b"),
            $"x.simhash".as("sim_a"), $"y.simhash".as("sim_b")).distinct()
          .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)").cast("int"))
          .filter($"hamming" <= 3)
          .select($"a", $"b", $"hamming")
      },
      Some {
        val nibs = (0 until 8).map(j =>
          s"strpos('0123456789abcdef', substr(h, ${j + 1}, 1)) - 1 AS n$j")
          .mkString(",\n            ")
        val bitSums = (0 until 32).map { b =>
          val j = b / 4; val k = b % 4
          s"SUM(((n$j >> $k) & 1) * 2 - 1) AS s$b"
        }.mkString(",\n            ")
        val simhash = (0 until 32)
          .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
          .mkString(" + ")
        val byteRows = (0 until 4).map(c =>
          s"SELECT doc_id, simhash, $c AS pos, (simhash >> ${c * 8}) & 255 AS byte FROM sig")
          .mkString("\n          UNION ALL ")
        s"""
        WITH tok AS (
          SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
          FROM documents
        ),
        nib AS (
          SELECT doc_id,
            $nibs
          FROM tok
        ),
        sums AS (
          SELECT doc_id,
            $bitSums
          FROM nib GROUP BY doc_id
        ),
        sig AS (SELECT doc_id, CAST($simhash AS BIGINT) AS simhash FROM sums),
        bytes AS (
          $byteRows
        ),
        pairs AS (
          SELECT DISTINCT x.doc_id a, y.doc_id b,
                 x.simhash sim_a, y.simhash sim_b
          FROM bytes x JOIN bytes y
            ON x.pos = y.pos AND x.byte = y.byte AND x.doc_id < y.doc_id
        )
        SELECT a, b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
        FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= 3"""
      }),

    // ----------------------------------------------- n-gram Jaccard (7-gram)
    GraftQuery(
      "d04_dedup_ngram_jaccard",
      (s, dir) => {
        import s.implicits._
        // Direct inverted-index dedup: candidate pairs share >= 1 common
        // 7-gram (long shingles keep the posting lists near-unique, so the
        // shingle-equality self-join stays linear-ish at scale), verified
        // with exact Jaccard >= 0.8.
        val sh = shingleRows(s, dir, 7)
        val nsh = sh.groupBy($"doc_id").agg(count(lit(1)).as("nsh"))
        val inter = sh.as("x").join(sh.as("y"),
            $"x.sh" === $"y.sh" && $"x.doc_id" < $"y.doc_id")
          .groupBy($"x.doc_id".as("a"), $"y.doc_id".as("b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(nsh.as("na"), $"a" === $"na.doc_id")
          .join(nsh.as("nb"), $"b" === $"nb.doc_id")
          .select($"a", $"b",
            ($"inter".cast("double") /
              ($"na.nsh" + $"nb.nsh" - $"inter")).as("jaccard"))
          .filter($"jaccard" >= JACCARD_T)
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id, unnest(${sqlShingles(7)}) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') ws FROM documents)
        ),
        nsh AS (SELECT doc_id, COUNT(*) nsh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT x.doc_id a, y.doc_id b, COUNT(*) inter
          FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        )
        SELECT i.a, i.b,
          CAST(i.inter AS DOUBLE) / (na.nsh + nb.nsh - i.inter) AS jaccard
        FROM inter i
          JOIN nsh na ON na.doc_id = i.a
          JOIN nsh nb ON nb.doc_id = i.b
        WHERE CAST(i.inter AS DOUBLE) / (na.nsh + nb.nsh - i.inter) >= $JACCARD_T""")),

    // ------------------------------------------- embedding cosine near-dup
    GraftQuery(
      "d05_dedup_embedding_cosine",
      (s, dir) => {
        import s.implicits._
        // Cosine near-dup via exact decimal dot products. Components are
        // float -> double (exact) -> decimal(12,6) (the single rounding,
        // identical in both engines); dot/norm sums are then exact, and
        // cosine is one double expression at the end.
        //
        // Candidate generation here is the exploded component self-join
        // keyed on position; at 100 TB this becomes sign-LSH bucketing
        // (see Similarity.s03) — the verification math stays identical.
        val comp = Tables.load(s, dir, "embeddings")
          .select($"vec_id", posexplode($"embedding").as(Seq("i", "x")))
          .select($"vec_id", $"i",
            $"x".cast("double").cast(DecimalType(12, 6)).as("c"))
        val norm = comp.groupBy($"vec_id")
          .agg(sum($"c" * $"c").as("nrm2"))
          .select($"vec_id", sqrt($"nrm2".cast("double")).as("nrm"))
        val dot = comp.as("x").join(comp.as("y"),
            $"x.i" === $"y.i" && $"x.vec_id" < $"y.vec_id")
          .groupBy($"x.vec_id".as("a"), $"y.vec_id".as("b"))
          .agg(sum($"x.c" * $"y.c").as("dot"))
        dot
          .join(norm.as("na"), $"a" === $"na.vec_id")
          .join(norm.as("nb"), $"b" === $"nb.vec_id")
          .select($"a", $"b",
            ($"dot".cast("double") / ($"na.nrm" * $"nb.nrm")).as("cosine"))
          .filter($"cosine" >= 0.45)
      },
      Some("""
        WITH comp AS (
          SELECT vec_id,
            unnest(range(len(embedding))) i,
            CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,6)) c
          FROM embeddings
        ),
        nrm AS (
          SELECT vec_id, sqrt(CAST(SUM(c * c) AS DOUBLE)) nrm
          FROM comp GROUP BY vec_id
        ),
        dot AS (
          SELECT x.vec_id a, y.vec_id b, SUM(x.c * y.c) dot
          FROM comp x JOIN comp y ON x.i = y.i AND x.vec_id < y.vec_id
          GROUP BY 1, 2
        )
        SELECT d.a, d.b,
          CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm) AS cosine
        FROM dot d
          JOIN nrm na ON na.vec_id = d.a
          JOIN nrm nb ON nb.vec_id = d.b
        WHERE CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm) >= 0.45"""))
  )
}
