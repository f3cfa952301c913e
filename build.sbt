ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "makinagespark"
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
// Forked `run` output normally rides sbt's logger, which prefixes every
// line with "[info] " — that prefix broke the driver's JSON parse of the
// bench headline line three rounds running ("parsed": null). StdoutOutput
// pipes the forked JVM's stdout/stderr straight through, prefix-free.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Forked-run JVM sizing (r15 optimization round, measured on the
// 128 GiB / 32-core sandbox): the local-mode JVM is driver AND all 32
// executor threads in one heap. At the old 8g default the heavy
// kernel stages ran 10-20% GC (StageProfile jvmGCTime: 4.3s GC in a
// 22s-taskSum shingle/posting stage); 24g + the throughput collector
// measured ~15% faster on the 12 hottest rows (interleaved TimeOne
// A/B, two rounds, per-arm min). Both stay env-overridable — boxes
// with less RAM set SPARK_DRIVER_MEM, latency-sensitive embedders set
// SPARK_DRIVER_GC=G1 (any -XX:+Use<X>GC name works).
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-XX:+Use${sys.env.getOrElse("SPARK_DRIVER_GC", "Parallel")}GC",
)
