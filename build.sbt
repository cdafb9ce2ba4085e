ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bioframespark"
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
// Pass the forked JVM's stdout through verbatim: sbt's default logger
// prefixes every line with "[info] ", which breaks the driver's strict
// JSON parse of Bench's final artifact line (BENCH parsed:null in r7).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Xms pinned to Xmx: G1's periodic heap uncommit/recommit emits
  // munmap/mmap storms, and this VM has host-level phases where munmap
  // parks threads in uninterruptible D-state for seconds (observed via
  // /proc/<pid>/task/*/stack during a stalled bench: __vm_munmap while
  // the whole JVM crawled at 2 busy cores). A static heap never uncommits,
  // removing that exposure; commitment stays lazy (no AlwaysPreTouch).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The JVM default 240m code cache overflows under a long suite of
  // whole-stage-codegen'd queries; once full, JIT compilation stops and
  // Catalyst planning runs interpreted — measured 10-30x nondeterministic
  // slowdowns (iv_closest 7s -> 10-157s) that vanish at 1g. Flushing is
  // the backstop if even 1g fills.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
