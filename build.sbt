ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "neo4j_to_clickhousespark"
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
// Pass forked `run` output through raw instead of via the sbt logger:
// Bench/Verify emit machine-parsed lines (the one-line bench JSON) and
// the "[info] " prefix broke the driver's bench parser in r2/r3.
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
// Default driver heap degrades with the machine: min(24g, half of
// physical RAM), floor 4g — a laptop gets a heap its RAM can hold
// instead of a failed JVM start; the bench box still gets 24g.
// SPARK_DRIVER_MEM overrides either way.
val defaultHeapGb: Int =
  try {
    val kb = scala.io.Source.fromFile("/proc/meminfo").getLines()
      .find(_.startsWith("MemTotal")).map(_.replaceAll("[^0-9]", "").toLong)
      .getOrElse(16L * 1024 * 1024)
    math.max(4, math.min(24, (kb / (2L * 1024 * 1024)).toInt))
  } catch { case _: Throwable => 8 }
// -Xms pinned to -Xmx: the r12 instrumented probe adjudicated the
// historical 2-7x bench swings on scan/intersect-heavy entries to GC
// STORMS in the default-Xms JVM (one 100x graph_triangles run: 492 s
// wall / 1155 s summed GC / 28x executor CPU with bit-identical input
// and shuffle bytes); pre-sizing the heap eliminated the storm class
// outright (same 6-run probe: max GC 11 s, min wall faster than every
// prior record). See BASELINE.md "r12 swing adjudication".
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
) ++ (sys.env.get("SPARK_DRIVER_XMS") match {
  // A/B switch for heap-ergonomics probes (r13 BFS-family
  // adjudication): "default" omits -Xms entirely (the pre-r12 JVM
  // default-initial-heap config); any other value overrides the pin.
  case Some("default") => Seq.empty
  case Some(x)         => Seq(s"-Xms$x")
  case None => Seq(s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}")
})
