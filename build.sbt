ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datastreamprocessingdemospark"
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
// The bench driver tail-captures stdout and parses the FINAL line as bare
// JSON. Round 9 printed the right total line but sbt wrapped it: the forked
// JVM's stdout was routed through the logger (an "[info] " prefix) and sbt
// appended "[success] Total time: ..." after it, so the driver's parse
// stayed null. Forward forked output verbatim and drop the success line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] = 32 executor threads in one JVM; 8g thrashes GC under
  // shuffle+cache load, and an unpinned heap full-GCs while growing
  // (profiled: erratic 5-30x query-time swings). Pin Xms=Xmx.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // dozens of whole-stage-codegen classes exhaust the default 240m code
  // cache mid-benchmark; the JIT then silently stops compiling and random
  // queries run interpreted at 10-50x (profiled via watchdog stack dumps)
  "-XX:ReservedCodeCacheSize=1g",
  // 32 task threads generate janino classes faster than the default 2-4
  // JIT compiler threads can compile them; the backlog leaves whole
  // queries running interpreted (profiled: random 10-50x stalls)
  "-XX:CICompilerCount=12",
)
