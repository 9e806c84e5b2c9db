package graft.core

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.scalatest.funsuite.AnyFunSuite

/** Concurrency / fuzz fixture (FIXTURES.md §5, reference
  * integration_test.cpp:100-175): one jittery writer, a concurrent batch
  * reader and a tailer; totals must reconcile exactly.
  */
class ConcurrencySpec extends AnyFunSuite {

  test("writer + concurrent reader + tailer reconcile") {
    val store = new StreamStore(Files.createTempDirectory("graft-conc-"))
    val schema = RiverSchema(Seq(RiverField("v", RiverType.Double64)))
    val Rounds = 50
    val PerRound = 256
    val total = Rounds * PerRound

    val rnd = new java.util.Random(42)
    val writer = new Thread(() => {
      val w = store.createStream("fuzz", schema)
      (0 until Rounds).foreach { r =>
        w.write((0 until PerRound).map(i =>
          Seq[Any]((r * PerRound + i).toDouble)))
        Thread.sleep(rnd.nextInt(3).toLong)
      }
      w.stop()
    })

    val readCount = new AtomicLong
    val readSum = new AtomicLong // sum of values (exact in long)
    val reader = new Thread(() => {
      val r = store.openReader("fuzz", timeoutMs = 5000)
      var done = false
      while (!done) r.read(4000, 2000) match {
        case None => done = true // EOF
        case Some(rows) =>
          readCount.addAndGet(rows.size.toLong)
          readSum.addAndGet(rows.map(_._3.head.asInstanceOf[Double].toLong).sum)
          if (rows.isEmpty && !r.good()) done = true
      }
    })

    val tailSkipped = new AtomicLong
    val tailLastIdx = new AtomicLong(-1)
    val tailer = new Thread(() => {
      val t = store.openReader("fuzz", timeoutMs = 5000)
      var done = false
      while (!done) t.tail(500) match {
        case None => done = true // EOF with nothing new
        case Some((skipped, last)) =>
          tailSkipped.addAndGet(skipped)
          last.foreach(x => tailLastIdx.set(x._2))
          if (skipped == 0 && last.isEmpty && !t.good()) done = true
          else if (skipped == 0 && last.isEmpty) Thread.sleep(1)
      }
    })

    writer.start(); Thread.sleep(5); reader.start(); tailer.start()
    writer.join(60000); reader.join(60000); tailer.join(60000)
    assert(!writer.isAlive && !reader.isAlive && !tailer.isAlive)

    // batch reader saw every sample exactly once, in order
    assert(readCount.get() == total)
    assert(readSum.get() == total.toLong * (total - 1) / 2)
    // tailer skipped every sample it passed exactly once and ended on
    // the final index
    assert(tailSkipped.get() <= total)
    assert(tailLastIdx.get() == total - 1)
  }
}
