package graft.ingest

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Read-only HTTP façade over the ingester output directory (H1,
  * reference IngesterHttpServer, cpp/ingester/src/ingester_http_server
  * .cpp:38-51):
  *
  *  - `GET /api/streams`                    — list + per-stream metadata
  *  - `GET /api/streams/{s}`                — one stream's metadata
  *  - `GET /api/streams/{s}/data.parquet`   — the compacted parquet,
  *    streamed in 16 MB chunks (reference chunk size, :89-147)
  *
  * JDK-built-in HttpServer: the façade is deliberately outside Spark's
  * scope (SURVEY §2 H1) — it serves whatever the ingester wrote.
  */
final class IngesterHttpServer(outRoot: Path, port: Int = 7487) {

  private val ChunkBytes = 16 * 1024 * 1024

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/api/streams", (ex: HttpExchange) => handle(ex))

  /** Bound port (use port=0 for ephemeral in tests). */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)

  private def streams: Seq[String] =
    Option(outRoot.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        Files.exists(f.toPath.resolve("metadata.json")))
      .map(_.getName).toSeq.sorted

  // absolute+normalized so safeStreamDir's parent check works for
  // relative roots too (a "." root's resolved children have a null
  // parent after normalize)
  private val servedRoot = outRoot.toAbsolutePath.normalize()

  /** URL stream segment -> directory under the served root, or None for
    * anything that could escape it. Stream names never contain path
    * separators (StreamStore.createStream forbids both '/' and '\\'),
    * so any separator or dot-segment in the request is a traversal
    * attempt, not a name — e.g. `/api/streams/../../etc/x/data.parquet`
    * must 404, never read outside the root. */
  private def safeStreamDir(s: String): Option[Path] =
    if (s.isEmpty || s.contains('/') || s.contains('\\') ||
      s == "." || s == "..") None
    else {
      val p = servedRoot.resolve(s).normalize()
      if (p.getParent == servedRoot) Some(p) else None
    }

  private def metadataJson(s: String): Option[String] =
    safeStreamDir(s).map(_.resolve("metadata.json"))
      .filter(Files.exists(_))
      .map(p => new String(Files.readAllBytes(p), StandardCharsets.UTF_8))

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/api/streams")
        .stripPrefix("/").stripSuffix("/")
      path match {
        case "" =>
          val body = streams
            .map(s => s""""$s":${metadataJson(s).getOrElse("{}")}""")
            .mkString("{", ",", "}")
          respond(ex, 200, "application/json", body)
        case p if p.endsWith("/data.parquet") =>
          val stream = p.stripSuffix("/data.parquet")
          val safe = safeStreamDir(stream).map(_.resolve("data.parquet"))
            .filter(Files.exists(_))
          if (safe.isEmpty) respond(ex, 404, "text/plain", "not found")
          else {
            val f = safe.get
            // parquet "file" may be a directory (spark part layout): serve
            // the single part file inside it. Close the listing stream —
            // an unclosed DirectoryStream leaks one fd per request.
            val target =
              if (Files.isDirectory(f)) {
                val ls = Files.list(f)
                try ls.filter(_.getFileName.toString.endsWith(".parquet"))
                  .findFirst().orElseThrow()
                finally ls.close()
              } else f
            ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
            ex.sendResponseHeaders(200, Files.size(target))
            val out = ex.getResponseBody
            streamFile(target, out)
            out.close()
          }
        case stream =>
          metadataJson(stream) match {
            case Some(j) => respond(ex, 200, "application/json", j)
            case None    => respond(ex, 404, "text/plain", "not found")
          }
      }
    } catch {
      case e: Exception =>
        try respond(ex, 500, "text/plain", String.valueOf(e.getMessage))
        catch { case _: Exception => }
    } finally ex.close()

  private def streamFile(f: Path, out: OutputStream): Unit = {
    val in = Files.newInputStream(f)
    try {
      val buf = new Array[Byte](ChunkBytes)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
  }

  private def respond(ex: HttpExchange, code: Int, ctype: String, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, bytes.length)
    val out = ex.getResponseBody
    out.write(bytes)
    out.close()
  }
}

/** `main`: serve an ingester output dir (reference ingester_main
  * default port 7487).
  */
object IngesterHttpMain {
  def main(args: Array[String]): Unit = {
    val root = java.nio.file.Paths.get(args(0))
    val port = args.lift(1).map(_.toInt).getOrElse(7487)
    val srv = new IngesterHttpServer(root, port)
    srv.start()
    System.err.println(s"serving $root on :${srv.boundPort}")
    Thread.currentThread().join()
  }
}
