package graft.multimodal

/** The bytes⇒frames SPI: one decoder per container format. A third-party
  * bridge (the production case is an ffmpeg JNI wrapper for
  * inter-frame-compressed H.264/VP9/AV1, which the JDK ships no codec
  * for) implements these four methods and calls
  * [[FrameDecoders.register]] — NO query or pipeline code changes; every
  * frame consumer routes through [[FrameDecoders.forContent]].
  *
  * `accepts` must be a cheap header sniff (magic bytes): at 100 TB it
  * runs once per payload row on the hot decode path.
  */
trait FrameDecoder {
  def name: String

  /** Cheap magic-byte claim check — never decodes. */
  def accepts(content: Array[Byte]): Boolean

  /** Frame count from container headers alone when the format indexes
    * frames (GVC1 does); decoders for unindexed formats may scan.
    */
  def frameCount(content: Array[Byte]): Int

  /** Decode every `stride`-th frame (0, stride, 2*stride, ...). Cost
    * must scale with frames KEPT where the container allows seeking.
    */
  def sampleDecoded(content: Array[Byte], stride: Int): Seq[DecodedImage]
}

/** The registry: registered third-party decoders are consulted first
  * (so an ffmpeg bridge can claim formats the builtins reject), then the
  * builtins in order — GVC1 video, still images — and finally the
  * always-accepting [[FrameDecoders.Stub]], so `forContent` is total:
  * query code never branches on format.
  */
object FrameDecoders {

  /** GVC1 container (length-prefixed PNG frames): the REAL video path,
    * seek-over-skipped sampling. Delegates to [[VideoCodec]].
    */
  object Gvc extends FrameDecoder {
    val name = "gvc1"
    def accepts(c: Array[Byte]): Boolean =
      c.length >= 8 && c(0) == 'G' && c(1) == 'V' && c(2) == 'C' &&
        c(3) == '1'
    def frameCount(c: Array[Byte]): Int = VideoCodec.frameCount(c)
    def sampleDecoded(c: Array[Byte], stride: Int): Seq[DecodedImage] =
      VideoCodec.sampleDecoded(c, stride)
  }

  /** A still image is a 1-frame video: PNG/BMP/JPEG/GIF payloads decode
    * through the JDK codec ([[ImageCodec]]). A payload whose magic
    * passes the sniff but whose body fails to decode errors LOUDLY
    * (the [[VideoCodec]] convention) so frameCount (always 1 for a
    * claimed still) and sampleDecoded stay consistent — a silent empty
    * Seq would fake coverage for truncated files.
    */
  object Still extends FrameDecoder {
    val name = "still-image"
    def accepts(c: Array[Byte]): Boolean = MediaPipeline.looksLikeImage(c)
    def frameCount(c: Array[Byte]): Int = 1
    def sampleDecoded(c: Array[Byte], stride: Int): Seq[DecodedImage] = {
      require(stride >= 1, s"still: stride must be >= 1, got $stride")
      // frame 0 is always sampled
      Seq(ImageCodec.decode(c).getOrElse(sys.error(
        "still: payload has an image magic but failed to decode " +
          "(truncated or corrupt)")))
    }
  }

  /** STUB — the declared fallback for containers no installed decoder
    * claims (foreign inter-frame formats in this no-ffmpeg sandbox).
    * Frame count comes from the deterministic
    * [[MediaPipeline.decodeStub]] header fake; sampled "frames" are
    * deterministic 8x8 gray tiles derived from the payload bytes, so
    * downstream plumbing (schemas, batch shapes, per-frame feature
    * passes) exercises end-to-end. A real deployment REPLACES this row
    * of the registry by registering an ffmpeg bridge.
    */
  object Stub extends FrameDecoder {
    val name = "stub"
    def accepts(c: Array[Byte]): Boolean = true
    def frameCount(c: Array[Byte]): Int =
      MediaPipeline.decodeStub("video", c)._3
    def sampleDecoded(c: Array[Byte], stride: Int): Seq[DecodedImage] = {
      require(stride >= 1, s"stub: stride must be >= 1, got $stride")
      val n = frameCount(c)
      (0 until n by stride).map { i =>
        val px = new Array[Byte](64)
        var j = 0
        while (j < 64) {
          val src = if (c.isEmpty) 0 else c((i * 64 + j) % c.length) & 0xff
          px(j) = ((src + i) & 0xff).toByte
          j += 1
        }
        DecodedImage(8, 8, px)
      }
    }
  }

  private val builtins: Seq[FrameDecoder] = Seq(Gvc, Still)

  /** `java.util.ServiceLoader` providers — THE production registration
    * path on a cluster: a third-party bridge ships a
    * `META-INF/services/graft.multimodal.FrameDecoder` entry in its
    * jar, and because the jar is on every executor's classpath, the
    * provider is discovered in EVERY JVM. (`register()` below mutates
    * this JVM's registry only — fine for driver-local tooling and
    * tests, but a decoder registered programmatically on the driver is
    * invisible to executors, where `forContent` actually runs inside
    * mapPartitions closures.) Loaded lazily once per JVM.
    */
  private lazy val serviceProviders: Vector[FrameDecoder] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[FrameDecoder])
      .iterator().asScala.toVector
  }

  // programmatic registration is rare (tests, driver-local tools);
  // reads are the hot path — a volatile immutable Vector makes lookup
  // allocation- and lock-free
  @volatile private var registered: Vector[FrameDecoder] = Vector.empty

  /** Install a third-party decoder IN THIS JVM. Registered decoders are
    * consulted before ServiceLoader providers and builtins, so a bridge
    * may also override a builtin format. Idempotent per name
    * (re-registering replaces). Per-JVM only — for cluster-wide
    * registration ship a ServiceLoader entry (see [[serviceProviders]]).
    */
  def register(d: FrameDecoder): Unit = synchronized {
    registered = registered.filterNot(_.name == d.name) :+ d
  }

  /** Remove a registered decoder by name (test teardown). */
  def unregister(name: String): Unit = synchronized {
    registered = registered.filterNot(_.name == name)
  }

  /** The decoder claiming this payload — total, never throws: the stub
    * accepts everything. Precedence: programmatic registrations, then
    * ServiceLoader providers (jar-shipped, present on every executor),
    * then builtins, then the stub.
    */
  def forContent(content: Array[Byte]): FrameDecoder =
    (registered.iterator ++ serviceProviders.iterator ++
      builtins.iterator)
      .find(_.accepts(content)).getOrElse(Stub)
}
