package graft.tools

import java.nio.file.Paths

import graft.core._

/** CLI tools mirroring the reference's (T1, cpp/src/tools/): stdin→stream
  * writer, stream→stdout reader, and a write-then-read throughput
  * benchmark with the reference tool's defaults and output shape
  * (river_benchmark.cpp:22-30,94-132: 1M samples x 8 B, batch 10240,
  * prints items/s and MB/s for write then read).
  */
object RiverWriterCli {
  /** args: <storeRoot> <streamName>; reads one double per stdin line. */
  def main(args: Array[String]): Unit = {
    val store = new StreamStore(Paths.get(args(0)))
    val schema = RiverSchema(Seq(RiverField("value", RiverType.Double64)))
    val w = store.createStream(args(1), schema)
    val batch = collection.mutable.ArrayBuffer.empty[Seq[Any]]
    scala.io.Source.stdin.getLines().foreach { line =>
      batch += Seq(line.trim.toDouble)
      if (batch.size >= 1536) { w.write(batch.toSeq); batch.clear() }
    }
    if (batch.nonEmpty) w.write(batch.toSeq)
    w.stop()
    System.err.println(s"wrote ${w.totalWritten} samples to ${args(1)}")
  }
}

object RiverReaderCli {
  /** args: <storeRoot> <streamName>; prints `index\tkey\tvalues` lines. */
  def main(args: Array[String]): Unit = {
    val store = new StreamStore(Paths.get(args(0)))
    val r = store.openReader(args(1), timeoutMs = 10000)
    var done = false
    while (!done) {
      r.read(10000, 1000) match {
        case None => done = true // EOF consumed
        case Some(rows) =>
          if (rows.isEmpty && !r.good()) done = true
          rows.foreach { case (key, idx, vals) =>
            println(s"$idx\t${key.render}\t${vals.mkString(",")}")
          }
          if (rows.isEmpty) done = true // timeout with nothing new
      }
    }
  }
}

object RiverBenchmark {
  /** args (all optional): numSamples sampleSize batchSize.
    * Defaults = the reference tool's (1M x 8 B, batch 10240).
    */
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1000000)
    val sampleSize = args.lift(1).map(_.toInt).getOrElse(8)
    val batch = args.lift(2).map(_.toInt).getOrElse(10240)
    require(sampleSize % 8 == 0, "sampleSize must be a multiple of 8")

    val root = StreamStore.scratchRoot("graft-bench-")
    val store = new StreamStore(root)
    val nCols = sampleSize / 8
    val schema = RiverSchema(
      (0 until nCols).map(i => RiverField(s"c$i", RiverType.Int64)))
    val codec = new RowCodec(schema)

    // untimed JIT warm-up (the reference is AOT C++; timing the first
    // 100k JVM iterations measures the interpreter, not the engine)
    locally {
      val wm = store.createStream("warmup", schema)
      val p = codec.pack(Seq.tabulate(nCols)(_.toLong))
      var i = 0
      while (i < 20) { wm.writeBytes(Array.fill(10000)(p).toSeq); i += 1 }
      wm.stop()
      val wr = store.openReader("warmup")
      while (wr.readBytes(10000, 0).exists(_.nonEmpty)) ()
      store.deleteStream("warmup")
    }

    // pre-pack payloads once (the reference writes one fixed buffer)
    val payload = codec.pack(Seq.tabulate(nCols)(_.toLong))
    val batchPayloads = Array.fill(batch)(payload)

    val w = store.createStream("bench", schema)
    val t0 = System.nanoTime()
    var written = 0
    while (written < n) {
      val m = math.min(batch, n - written)
      w.writeBytes(
        (if (m == batch) batchPayloads else batchPayloads.take(m)).toSeq)
      written += m
    }
    w.stop()
    val writeSec = (System.nanoTime() - t0) / 1e9

    // read via the raw-bytes plane — the reference benchmark reads into a
    // byte buffer with no decode (river_benchmark.cpp:109-126 ReadBytes)
    val r = store.openReader("bench")
    val t1 = System.nanoTime()
    var read = 0L
    var done = false
    while (!done) r.readBytes(batch, 0) match {
      case Some(rows) if rows.nonEmpty => read += rows.size
      case _ => done = true
    }
    val readSec = (System.nanoTime() - t1) / 1e9

    val mb = n.toLong * sampleSize / 1e6
    println(f"Write: ${n / writeSec}%.0f items/sec, ${mb / writeSec}%.1f MB/sec")
    println(f"Read [$read samples]: ${n / readSec}%.0f items/sec, ${mb / readSec}%.1f MB/sec")
    // one JSON line for machine comparison against BASELINE.md (>30 MB/s)
    println(s"""{"metric":"river_transport","write_mb_s":${mb / writeSec},""" +
      s""""read_mb_s":${mb / readSec},"n":$n,"sample_bytes":$sampleSize}""")

    // cleanup
    store.deleteStream("bench")
    java.nio.file.Files.deleteIfExists(root)
  }
}
