ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "icebergrestserverspark"
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
// The bench/verify drivers parse the forked JVM's LAST stdout line as
// bare JSON. Without these, sbt routes forked stdout through its logger
// ("[info] {...}") and appends a "[success] Total time ..." line — both
// break "parse the last line". StdoutOutput passes the child's stdout
// through verbatim; showSuccess drops the trailing success banner.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
showSuccess := false
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default (was 8g): local[32] runs 32 executor threads in THIS
  // heap — 8g forced continuous old-gen GC across the 118-query × 6
  // pass bench, inflating later passes uniformly (the other half of
  // the r14→r16 drift). The box has 128 GiB; one forked JVM at a time.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The bench suite generates ~118 queries × whole-stage codegen — far
  // past the JVM's default 240 MB reserved code cache. A full code
  // cache silently stops the JIT ("CodeCache is full" once, then
  // nothing), after which later queries run de-optimized — measured as
  // a UNIFORM suite-wide inflation that grew round over round as
  // queries were added (the r14→r16 bench drift).
  "-XX:ReservedCodeCacheSize=512m",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
