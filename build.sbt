ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataflowspark"
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
// Forked `run` output must pass through UNPREFIXED: the default
// LoggedOutput strategy prepends "[info] " to every child stdout line,
// which breaks any consumer that parses Bench's one-line JSON metric.
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
val baseJvmOpts = jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Pin the bench JVM's heap (-Xms == -Xmx) so timings don't absorb heap
// growth; tests get the same ceiling but no upfront reservation, so they
// still start on hosts with less free memory. The enlarged code cache
// keeps 200+ queries x 2 passes of whole-stage-codegen classes from
// thrashing the JIT (default reserve is 240m).
// ParallelGC (default): measured 55-57s bench totals vs 64-69s on G1 and
// 92s on ZGC at sf0.1 — a throughput collector fits a 32-thread batch
// workload; concurrent collectors steal cores from compute. Overridable
// per-invocation (SPARK_GRAFT_GC=G1GC sbt "runMain graft.Bench") so the
// collector can be AB-tested on identical code without editing the build.
javaOptions ++= baseJvmOpts ++ Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:ReservedCodeCacheSize=512m",
  s"-XX:+Use${sys.env.getOrElse("SPARK_GRAFT_GC", "ParallelGC")}")
Test / javaOptions := baseJvmOpts
