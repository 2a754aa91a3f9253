ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "filmdatawarehousespark"
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
// Pass forked-run output through unprefixed: sbt's default LoggedOutput
// prepends "[info] " to every stdout line, which breaks the driver's
// parse of Bench's one-line JSON summary (BENCH_r03/r04 "parsed": null
// with the line otherwise whole in the tail).
run / outputStrategy := Some(StdoutOutput)
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
  // 8g was badly undersized for local[32]: unified memory (0.6*heap =
  // 4.6g) is shared by 32 execution threads AND every persisted
  // intermediate, so cache-heavy iterative queries (k-core, BFS, LPA)
  // intermittently collapsed into spill/GC thrash — BENCH_r04 samples
  // show q_kcore [17.6, 9.1, 249.2] s and q_bfs_hops [120.6, 9.6, 46.0] s
  // for identical work. The host has 128 GiB; give the single local JVM
  // a real slice of it.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
  // 171 queries × 3 runs of whole-stage-codegen classes overflow the
  // 240 MB default JIT code cache mid-bench, silently disabling
  // compilation — another source of the 10-25× sample outliers.
  "-XX:ReservedCodeCacheSize=1g",
)
