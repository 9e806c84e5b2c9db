package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.jdk.CollectionConverters._

import graft.core.{RiverField, RiverSchema, RiverType, StreamStore}

/** Daemon soak: the reference ingester's production mode is a 24/7
  * multi-stream recorder (`cpp/ingester/src/ingester.cpp:58-94` sweeps
  * forever); short spec lifecycles never see heap creep, store growth
  * under trim, or sweep-latency drift. This harness drives the REAL
  * deployable process — `graft.ingest.IngesterMain` in its own JVM,
  * exactly as the systemd unit launches it — for a sustained window
  * under concurrent load:
  *
  *  - N live writers appending through [[StreamStore]] from THIS
  *    process (the store directory is the transport, so cross-process
  *    write/sweep is the deployment shape): mixed schemas — one
  *    ZFP_LOSSLESS-compressed double stream, one VARIABLE_WIDTH_BYTES
  *    stream, the rest plain double+int64;
  *  - generation churn: each writer EOFs its stream every few seconds
  *    and starts the next one, so finalize + compaction + delete-behind
  *    run continuously; one writer goes SILENT instead of EOF-ing, so
  *    the staleness finalizer path fires too;
  *  - concurrent HTTP readers hammering the daemon's Range endpoint
  *    (list → metadata → ranged data.parquet reads);
  *  - a sampler recording the daemon's RSS high-water
  *    (/proc/pid/status VmHWM), live store size (is trim keeping it
  *    bounded?), and output size.
  *
  * Ends by draining writers, waiting for every stream to reach
  * COMPLETED, SIGTERM-ing the daemon (graceful-stop path), and writing
  * `expected.json` — per-stream row counts and exact integer-valued
  * sums — which `tools/soak_check.py` then cross-checks against the
  * output parquet in DuckDB.
  *
  * Usage: DaemonSoak <workDir> [durationSec=300] [writers=6]
  * Prints one JSON summary line; all artifacts land under workDir.
  */
object DaemonSoak {

  private final case class Expected(
      stream: String, rows: Long, sumV: Long, kind: String)

  def main(args: Array[String]): Unit = {
    val work = Paths.get(args(0))
    val durationSec = args.lift(1).map(_.toInt).getOrElse(300)
    val nWriters = args.lift(2).map(_.toInt).getOrElse(6)
    val storeDir = work.resolve("store")
    val outDir = work.resolve("out")
    Files.createDirectories(storeDir)
    Files.createDirectories(outDir)

    // trim at 5 s, staleness at 10 s: both delete-behind and the
    // forced-EOF finalizer must fire many times inside the window
    val settings = work.resolve("settings.json")
    Files.writeString(settings,
      """{ "global_settings": {},
        |  "minimum_age_seconds_before_deletion": 5,
        |  "stale_period_seconds": 10,
        |  "stream_settings": [
        |    { "stream_name_regex": "soak_.*" } ] }""".stripMargin)

    // ---- the daemon: the real deployable process, own JVM ----------
    // --http-port 0 means DISABLED (reference semantics), so probe a
    // free port here and hand it to the daemon explicitly
    val httpPort = {
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close()
    }
    val cp = System.getProperty("java.class.path")
    val daemonCmd = Seq(
      "java", "-Xmx3g", "-cp", cp, "graft.ingest.IngesterMain",
      "--store", storeDir.toString, "--out", outDir.toString,
      "--settings", settings.toString, "--http-port", httpPort.toString,
      "--sweep-ms", "250", "--parallelism", "4",
      "--master", "local[8]", "--stats-ms", "5000")
    val daemonErr = work.resolve("daemon.stderr").toFile
    val daemon = new ProcessBuilder(daemonCmd: _*)
      .redirectErrorStream(false)
      .redirectError(daemonErr)
      .redirectOutput(work.resolve("daemon.stdout").toFile)
      .start()

    // wait for the HTTP port line in the daemon's stderr
    def scrapePort(): Option[Int] = {
      val re = """HTTP server on port (\d+)""".r
      if (!Files.exists(daemonErr.toPath)) None
      else re.findFirstMatchIn(
        new String(Files.readAllBytes(daemonErr.toPath), "UTF-8"))
        .map(_.group(1).toInt)
    }
    var port = Option.empty[Int]
    val pDeadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (port.isEmpty && System.nanoTime() < pDeadline) {
      Thread.sleep(250); port = scrapePort()
    }
    require(port.nonEmpty, "daemon never announced its HTTP port")

    val store = new StreamStore(storeDir)
    val stopWriters = new AtomicBoolean(false)
    val expected = new java.util.concurrent.ConcurrentLinkedQueue[Expected]()

    def plainSchema = RiverSchema(Seq(
      RiverField("v", RiverType.Double64),
      RiverField("tag", RiverType.Int64)))
    def zfpSchema = RiverSchema(Seq(RiverField("v", RiverType.Double64)))
    def vwSchema = RiverSchema(Seq(
      RiverField("blob", RiverType.VariableWidthBytes(256))))

    // ---- N live writers with generation churn ----------------------
    // writer 0: ZFP_LOSSLESS; writer 1: var-width; writer nWriters-1:
    // goes SILENT mid-generation (staleness path); rest: plain.
    val writers = (0 until nWriters).map { w =>
      new Thread(() => {
        var gen = 0
        val silent = w == nWriters - 1
        while (!stopWriters.get) {
          val name = s"soak_w${w}_g$gen"
          val kind = if (w == 0) "zfp" else if (w == 1) "vw" else "plain"
          val sw = kind match {
            case "zfp" => store.createStream(name, zfpSchema,
              compressionParamsJson = Some("""{"name":"ZFP_LOSSLESS",""" +
                """"params":{"num_cols":"1","data_type":"double"}}"""))
            case "vw" => store.createStream(name, vwSchema)
            case _ => store.createStream(name, plainSchema)
          }
          var rows = 0L
          var sumV = 0L
          var batches = 0
          val genBatches = 20 + (w * 3) % 15
          while (batches < genBatches && !stopWriters.get) {
            val base = rows
            val batch: Seq[Seq[Any]] = (0 until 400).map { j =>
              val i = base + j
              kind match {
                case "zfp" => Seq[Any]((i % 100000).toDouble)
                case "vw" =>
                  Seq[Any](Array.fill[Byte]((i % 200 + 1).toInt)(
                    (i % 127).toByte))
                case _ => Seq[Any]((i % 100000).toDouble, i)
              }
            }
            sw.write(batch)
            rows += 400
            sumV += batch.map {
              case Seq(d: Double) => d.toLong
              case Seq(b: Array[Byte]) => b.length.toLong
              case Seq(d: Double, _) => d.toLong
            }.sum
            batches += 1
            Thread.sleep(40)
          }
          if (silent && gen == 1) {
            // abandon WITHOUT stop(): the staleness finalizer must EOF
            // this one. Record it, then idle out the soak.
            expected.add(Expected(name, rows, sumV, kind + "+stale"))
            while (!stopWriters.get) Thread.sleep(200)
          } else {
            sw.stop()
            expected.add(Expected(name, rows, sumV, kind))
            gen += 1
          }
        }
      }, s"soak-writer-$w")
    }

    // ---- HTTP readers over the Range endpoint -----------------------
    val http = HttpClient.newHttpClient()
    val httpOk = new AtomicLong
    val httpRanged = new AtomicLong
    val httpErr = new AtomicLong
    val readers = (0 until 2).map { r =>
      new Thread(() => {
        val rnd = new java.util.Random(42 + r)
        while (!stopWriters.get) {
          try {
            val base = s"http://127.0.0.1:${port.get}/api/streams"
            val list = http.send(
              HttpRequest.newBuilder(URI.create(base)).build(),
              HttpResponse.BodyHandlers.ofString())
            if (list.statusCode() == 200) httpOk.incrementAndGet()
            // pick completed outputs and read a random range
            val done = Option(outDir.toFile.listFiles()).getOrElse(Array())
              .filter(d => Files.exists(d.toPath.resolve("data.parquet")))
            if (done.nonEmpty) {
              val s = done(rnd.nextInt(done.length)).getName
              val from = rnd.nextInt(1000)
              val req = HttpRequest.newBuilder(
                URI.create(s"$base/$s/data.parquet"))
                .header("Range", s"bytes=$from-${from + 4095}").build()
              val resp = http.send(req,
                HttpResponse.BodyHandlers.ofByteArray())
              if (resp.statusCode() == 206) httpRanged.incrementAndGet()
              else if (resp.statusCode() >= 500) httpErr.incrementAndGet()
            }
          } catch { case _: Throwable => httpErr.incrementAndGet() }
          Thread.sleep(100)
        }
      }, s"soak-reader-$r")
    }

    // ---- sampler: daemon RSS, store/out size ------------------------
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val storeMax = new AtomicLong
    val sampler = new Thread(() => {
      def dirBytes(p: Path): Long = {
        val s = Files.walk(p)
        try s.iterator().asScala
          .filter(Files.isRegularFile(_)).map(Files.size).sum
        catch { case _: Throwable => -1L }
        finally s.close()
      }
      def proc(field: String): Long = {
        val st = Paths.get(s"/proc/${daemon.pid()}/status")
        if (!Files.exists(st)) -1L
        else new String(Files.readAllBytes(st), "UTF-8").linesIterator
          .find(_.startsWith(field + ":"))
          .map(_.split("\\s+")(1).toLong / 1024).getOrElse(-1L) // MB
      }
      while (!stopWriters.get) {
        val sb = dirBytes(storeDir)
        storeMax.updateAndGet(m => math.max(m, sb))
        samples.add(
          s"""{"t":${System.currentTimeMillis()},""" +
            s""""rss_mb":${proc("VmRSS")},"hwm_mb":${proc("VmHWM")},""" +
            s""""store_bytes":$sb,"out_bytes":${dirBytes(outDir)}}""")
        Thread.sleep(2000)
      }
    }, "soak-sampler")

    writers.foreach(_.start()); readers.foreach(_.start()); sampler.start()
    Thread.sleep(durationSec * 1000L)
    stopWriters.set(true)
    writers.foreach(_.join(60000)); readers.foreach(_.join(10000))
    sampler.join(10000)

    // ---- drain: every recorded stream reaches COMPLETED -------------
    val exp = expected.asScala.toSeq
    def completed(s: String): Boolean = {
      val m = outDir.resolve(s).resolve("metadata.json")
      Files.exists(m) && new String(Files.readAllBytes(m), "UTF-8")
        .contains("\"ingestion_status\":\"COMPLETED\"")
    }
    val drainDeadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
    while (exp.exists(e => !completed(e.stream)) &&
        System.nanoTime() < drainDeadline) Thread.sleep(500)
    val incomplete = exp.filterNot(e => completed(e.stream)).map(_.stream)
    // trim bound: with min-age 5 s every consumed+EOF'd stream must
    // leave the store shortly after; measure what's left
    val leftoverStreams = store.listStreams()

    // graceful stop: SIGTERM, like systemctl stop
    daemon.destroy()
    val exited = daemon.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
    val hwmMb = samples.asScala.toSeq.lastOption
      .flatMap("\"hwm_mb\":(\\d+)".r.findFirstMatchIn(_))
      .map(_.group(1).toLong).getOrElse(-1L)

    Files.writeString(work.resolve("expected.json"),
      exp.map(e => s"""{"stream":"${e.stream}","rows":${e.rows},""" +
          s""""sum_v":${e.sumV},"kind":"${e.kind}"}""")
        .mkString("[", ",\n", "]"))
    Files.writeString(work.resolve("samples.jsonl"),
      samples.asScala.mkString("\n"))

    val summary =
      s"""{"duration_sec":$durationSec,"writers":$nWriters,""" +
        s""""streams_written":${exp.size},""" +
        s""""rows_written":${exp.map(_.rows).sum},""" +
        s""""incomplete":${incomplete.size},""" +
        s""""incomplete_names":"${incomplete.take(5).mkString(",")}",""" +
        s""""store_leftover_streams":${leftoverStreams.size},""" +
        s""""store_max_bytes":${storeMax.get},""" +
        s""""daemon_rss_hwm_mb":$hwmMb,""" +
        s""""http_ok":${httpOk.get},"http_ranged":${httpRanged.get},""" +
        s""""http_err":${httpErr.get},""" +
        s""""daemon_exited_gracefully":$exited}"""
    Files.writeString(work.resolve("summary.json"), summary)
    println(summary)
    System.out.flush()
    if (!exited) daemon.destroyForcibly()
    sys.exit(if (incomplete.isEmpty && exited) 0 else 1)
  }
}
