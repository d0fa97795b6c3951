ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "paimonpythonspark"
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
// The bench driver parses a JSON line from a bounded log tail; sbt's
// "[success] Total time" banner would eat tail budget after it, and the
// "[info] " prefix sbt's logger adds to forked-process output breaks a
// parser that json-loads whole lines (r2/r3 both recorded parsed:null
// with the full JSON visible in the tail). StdoutOutput passes the
// forked JVM's stdout through verbatim — the JSON line lands raw.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 32g default: local[32] shuffles + stateful-stream state maps +
  // driver-side memory sinks all share one JVM; 16g was enough when
  // the machine was idle but left the heavy dedup/IVF rows GC-bound
  // whenever the host ran contended (r10's bench tripled on untouched
  // plans — classic allocation-stall amplification). Headroom is lazy:
  // -Xmx reserves address space, not RSS (the machine has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++
  // local diagnostics hook (e.g. GRAFT_EXTRA_JVM="-Xlog:gc:file=/tmp/gc.log"
  // to attribute bench-row stalls to collector pauses); empty in driver runs
  sys.env.get("GRAFT_EXTRA_JVM")
    .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
