ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "recsyssparkspark"
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
// Forked run output goes STRAIGHT to stdout, not through sbt's logger:
// the driver's bench capture parses the tail of stdout for the final
// JSON line, and the logger's "[info] " prefix breaks any
// line-starts-with-'{' heuristic (BENCH_r05 "parsed": null).
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] on a 128 GiB host: the single JVM is both driver and all
  // executors, and the bench session pins ~20 shared caches — an 8g
  // heap evicts them mid-run and the heavy kNN queries rebuild their
  // sims from scratch (measured 71s vs 29s for q17). 48g leaves
  // headroom for the OS page cache over the parquet inputs.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 178 queries × dozens of Janino-generated classes per repeat blow
  // through the JVM's default 240 MB code cache; once full the JIT
  // stops compiling (or flushes hot methods) and compute-heavy queries
  // run interpreted at ~3× own-CPU (r14 measured: q17 205 s warm vs
  // 589 s in the full suite). Scale-neutral: any long-lived driver
  // running a large query corpus needs a code cache sized to it.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
)
