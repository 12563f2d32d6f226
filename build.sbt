ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fiwarecosmosorionflinkconnectorexamplesspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"` as
// the bench JSON. With the default LoggedOutput strategy sbt pipes the
// forked JVM's fd 1 AND fd 2 through its logger ("[info] "-framed) and then
// appends its own "[success] Total time" line — so the compact JSON line was
// never the last bare stdout line and no BENCH_r*.json ever parsed
// (PERF per_query empty since r01). StdoutOutput hands the forked process
// sbt's raw stdout/stderr (no framing, measured r17); showSuccess=false
// drops the trailing "[success]" banner (task exit codes and test reporting
// are unaffected — failures still print "[error]" and fail the command).
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command loop, not by another setting —
// lintUnused cannot see that; exclude it from the false-positive warning
Global / excludeLintKeys += showSuccess
// LocalClusterSpec: the in-JVM standalone workers must not scribble a
// work/ dir into the read-only-by-convention /opt/spark distribution,
// and their executor command builder needs the Scala version that
// bin/load-spark-env.sh would normally derive (we bypass the scripts)
Test / envVars ++= Map(
  "SPARK_WORKER_DIR" -> "target/spark-worker",
  "SPARK_SCALA_VERSION" -> "2.13")
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
  // 10g measured fastest for the bench on this box: a larger heap (24g)
  // slowed the same run ~3x (fresh-page touch + GC geometry), 8g risks
  // pressure with 32 executor threads of array-heavy work.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "10g")}",
)
