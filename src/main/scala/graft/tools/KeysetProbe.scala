package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 probe for PrepOps.keysetPage: page cost must be FLAT in
  * page number (pushed cursor filter + TakeOrdered of pageSize rows),
  * while OFFSET paging scans and discards the skipped prefix, growing
  * with depth. Times both spellings at a shallow and a deep position
  * over the orders ranking (o_totalprice desc, o_orderkey asc), min of
  * three passes; cursor boundaries are fetched untimed (a real cursor
  * carries them from the previous response).
  *
  * Usage: KeysetProbe <sfDir> [deepPos]
  */
object KeysetProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val deep = if (args.length > 1) args(1).toInt else 20000
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

    val orders = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val n = orders.count()
    if (n < 40) {
      println(s"""{"probe":"keyset_page","sf_dir":"$sfDir",""" +
        s""""n_orders":$n,"error":"table too small to probe"}""")
      spark.stop()
      return
    }
    val deepPos = math.max(1L, math.min(deep.toLong, n - 20)).toInt

    def boundaryAt(pos: Int): (Double, Long) = {
      val r = orders.filter(col("o_totalprice").isNotNull)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(pos - 1).limit(1).collect()(0)
      (r.getDouble(1), r.getLong(0))
    }
    def timeIt(body: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body
        (System.nanoTime() - t0) / 1e9
      }.min
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def offsetPage(pos: Int): Double = timeIt(drain(
      orders.filter(col("o_totalprice").isNotNull)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(pos).limit(10)))
    def keysetAt(pos: Int): Double = {
      val (bs, bk) = boundaryAt(pos)
      timeIt(drain(graft.operators.PrepOps.keysetPage(
        orders, "o_totalprice", "o_orderkey", lit(bs), lit(bk), 10)))
    }

    offsetPage(10) // warm, untimed
    val o10 = offsetPage(10)
    val oDeep = offsetPage(deepPos)
    val k10 = keysetAt(10)
    val kDeep = keysetAt(deepPos)

    println(
      s"""{"probe":"keyset_page","sf_dir":"$sfDir","n_orders":$n,""" +
      s""""deep_pos":$deepPos,""" +
      s""""offset_page10_sec":$o10,"offset_deep_sec":$oDeep,""" +
      s""""keyset_page10_sec":$k10,"keyset_deep_sec":$kDeep}""")
    spark.stop()
  }
}
