ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "riverspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench/verify driver parses machine-readable JSON lines out of the
// run's stdout tail; sbt's default logger prefixes forked-process output
// with "[info] ", which breaks any parser expecting the line to start at
// '{'. Pipe forked run output straight through.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Extra per-invocation JVM flags (read at sbt startup): the latency
// benchmark wants -XX:+AlwaysPreTouch and a small heap so GC and
// first-touch page faults stay out of the measured tail, but those
// flags would cost every OTHER run 10s+ of 48 GiB pre-touch.
javaOptions ++= sys.env.get("GRAFT_JAVA_OPTS")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 54 queries x whole-stage codegen in one JVM overflow the default
  // 240 MB code cache; once full the JIT degrades and later queries go
  // erratically 5-10x slower (observed run-to-run).
  "-XX:ReservedCodeCacheSize=1g",
  // local[32] + broadcasts + sf0.1 shuffles GC-thrash at 8g; the box has
  // 128 GiB, so default high. SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
