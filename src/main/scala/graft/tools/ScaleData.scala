package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator: replicates the driver's sf0.1 tables N× with
  * consistent key shifts so every foreign-key relationship survives
  * (orders.o_custkey still hits customer.c_custkey, lineitem hits
  * orders/part/supplier). Used for the sf1 scale-proof run — NOT a
  * replacement for driver testdata; correctness always runs on the
  * driver's own sf0.01.
  *
  * Near-dup columns are decorrelated per copy deterministically:
  *  - documents.text: every 3rd word gets a copy-specific suffix
  *    (`_c<i>`), so every k-shingle (k >= 3) of copy i differs from
  *    copy j's — cross-copy shingle/minhash similarity is ZERO by
  *    construction. (The earlier word-order ROTATION failed this
  *    intent: a rotation preserves all but ~k-1 of a document's
  *    k-shingles, so copies stayed mutual near-dups and verified
  *    pairs grew ~N² — the round-14 decade probe caught it as a
  *    549× pair blow-up at 10×.) Tagging is positional, so each
  *    copy's INTERNAL duplicate structure survives (exact dups stay
  *    exact, near-dups keep their overlap) and dedup output scales
  *    ~N; word COUNT is unchanged, but char/length stats shift
  *    slightly (each tagged word grows by the `_c<i>` suffix) and a
  *    tagged stopword no longer matches the stopword list — scale
  *    probes of the quality/length families should expect that drift.
  *  - embeddings.embedding: coordinates rotated by copy index (norm-
  *    preserving, kills cross-copy cosine similarity).
  * Without this, N× replication makes every duplicate group N× larger
  * and candidate PAIRS grow N² — a data pathology, not an engine test.
  *
  * Usage: ScaleData <inDir> <outDir> <copies>
  */
object ScaleData {
  private val Stride = 100000000L // > any sf0.1 key

  /** Copy-`i` text decorrelation: every 3rd word gets a `_c<i>`
    * suffix, so any k-shingle with k >= 3 contains at least one
    * tagged word and the shingle sets of two copies are DISJOINT —
    * the property [[ScaleDataSpec]] pins (a word-order rotation,
    * the previous spelling, preserves all but ~k-1 shingles and
    * left copies as mutual near-dups). Position-based, so identical
    * texts stay identical within a copy. i=0 is the identity. */
  def tagWords(text: org.apache.spark.sql.Column, i: Int)
      : org.apache.spark.sql.Column =
    if (i == 0) text
    else array_join(zip_with(split(text, " "),
      sequence(lit(0), size(split(text, " ")) - 1),
      (w, p) => when(p % 3 === 0, concat(w, lit(s"_c$i")))
        .otherwise(w)), " ")

  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val copies = args(2).toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Tables.load sets nanosAsLong for events' TIMESTAMP(NANOS) ts; the
    // scaled copy therefore stores ts as a plain int64 of nanos, which is
    // exactly the shape every query consumes at sf0.1 too.
    def read(t: String): DataFrame = graft.Tables.load(spark, in, t)
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")

    // replicate df `copies` times, shifting every column in `keys` by
    // copy*Stride; `extra` post-processes each copy (copyIdx available
    // as lit)
    def rep(df: DataFrame, keys: Seq[String])(
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { i =>
        val shifted = keys.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i * Stride)))
        extra(shifted, i)
      }.reduce(_ unionAll _)

    // dimensions stay fixed — broadcast sides must remain broadcast-able
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(rep(read("customer"), Seq("c_custkey"))(), "customer", 8)
    write(rep(read("supplier"), Seq("s_suppkey"))(), "supplier", 2)
    write(rep(read("part"), Seq("p_partkey"))(), "part", 8)
    write(rep(read("orders"), Seq("o_orderkey", "o_custkey"))(), "orders", 16)
    write(rep(read("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"))(), "lineitem", 32)
    write(rep(read("events"), Seq("event_id", "user_id"))(), "events", 16)

    // documents: tag every 3rd word with the copy index (deterministic,
    // shingle-breaking for every k >= 3 — see tagWords on why a
    // rotation is NOT shingle-breaking)
    write(rep(read("documents"), Seq("doc_id")) { (d, i) =>
      d.withColumn("text", tagWords(col("text"), i))
    }, "documents", 8)

    // embeddings: rotate coordinates per copy (norm-preserving)
    write(rep(read("embeddings"), Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else {
        // offset in [1, 31], never 0: `i % 32` collapses to an identity
        // rotation at copies 32, 64, ... which would make those copies
        // exact embedding duplicates of copy 0 and reintroduce the
        // N^2 cross-copy candidate pathology the rotation prevents.
        val off = i % 31 + 1
        val dim = size(col("embedding"))
        d.withColumn("embedding",
          concat(slice(col("embedding"), lit(off + 1), dim),
            slice(col("embedding"), lit(1), lit(off))))
      }
    }, "embeddings", 4)

    val n = spark.read.parquet(s"$out/lineitem.parquet").count()
    println(s"""{"scaled":"$out","copies":$copies,"lineitem_rows":$n}""")
    spark.stop()
  }
}
