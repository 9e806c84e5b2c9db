package graft.multimodal

import java.io.{File, FileOutputStream}
import java.util.jar.{JarEntry, JarOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** PACKAGING proof for the FrameDecoders SPI: assembles, at test time,
  * a jar with exactly the two artifacts a third-party bridge (the
  * production case: an ffmpeg JNI wrapper for H.264/VP9/AV1) must ship
  * —
  *
  *   1. the implementation class file
  *      (`graft/multimodal/JarPackagedDecoder.class` here), and
  *   2. the service descriptor
  *      `META-INF/services/graft.multimodal.FrameDecoder` containing
  *      the implementation's fully-qualified name —
  *
  * then proves `java.util.ServiceLoader` discovers the provider
  * THROUGH THE JAR. [[JarPackagedDecoder]] is deliberately absent from
  * the test-resources descriptor, so the jar's own descriptor is the
  * only possible discovery path. On a cluster the same jar goes in
  * `spark.jars` / `--jars`: every executor JVM has it on the
  * classpath, so `FrameDecoders.forContent` (which consults
  * ServiceLoader providers before builtins) resolves it inside
  * mapPartitions closures with zero query-code changes — the README's
  * "shipping an ffmpeg bridge" recipe is this spec, spelled as prose.
  */
class JarPackagingSpec extends AnyFunSuite {

  test("a jar with only a class file and a META-INF/services entry is " +
      "a complete third-party decoder package") {
    // locate the compiled class bytes on the test classpath
    val rel = "graft/multimodal/JarPackagedDecoder.class"
    val classBytes = {
      val in = getClass.getClassLoader.getResourceAsStream(rel)
      assert(in != null, s"$rel missing from test classpath")
      try in.readAllBytes() finally in.close()
    }

    val jar = File.createTempFile("graft-bridge-", ".jar")
    jar.deleteOnExit()
    val out = new JarOutputStream(new FileOutputStream(jar))
    try {
      out.putNextEntry(new JarEntry(rel))
      out.write(classBytes)
      out.closeEntry()
      out.putNextEntry(new JarEntry(
        "META-INF/services/graft.multimodal.FrameDecoder"))
      out.write("graft.multimodal.JarPackagedDecoder\n".getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()

    // the jar-backed loader is what an executor classpath looks like
    // with --jars: the SPI interface resolves from the parent, the
    // provider from the jar's descriptor
    val loader = new java.net.URLClassLoader(
      Array(jar.toURI.toURL), getClass.getClassLoader)
    import scala.jdk.CollectionConverters._
    val provided = java.util.ServiceLoader
      .load(classOf[FrameDecoder], loader)
      .iterator().asScala.toVector

    val fromJar = provided.find(_.name == "jar-packaged")
    assert(fromJar.isDefined,
      s"jar-shipped provider not discovered; saw ${provided.map(_.name)}")
    // the discovered instance honors the full SPI contract
    val payload = "JARDxyz".getBytes("ISO-8859-1")
    assert(fromJar.get.accepts(payload))
    assert(fromJar.get.frameCount(payload) == 3)
    assert(fromJar.get.sampleDecoded(payload, 2).size == 2)
    // sanity: without the jar on the classpath, nothing declares it
    val without = java.util.ServiceLoader
      .load(classOf[FrameDecoder], getClass.getClassLoader)
      .iterator().asScala.toVector
    assert(!without.exists(_.name == "jar-packaged"),
      "JarPackagedDecoder leaked into a non-jar services descriptor")
  }
}
