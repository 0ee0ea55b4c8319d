ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "seisdbspark"
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
// The driver parses the bench JSON out of the run's stdout tail. With the
// default LoggedOutput strategy sbt prefixes every forked-process line with
// "[info] ", which breaks a per-line json.loads — every BENCH_r*.json through
// r14 recorded parsed:null despite the compact line being present in the
// tail. StdoutOutput passes the forked process's stdout through verbatim.
run / outputStrategy := Some(StdoutOutput)
// ... and drop sbt's trailing "[success] Total time ..." banner so the
// bench's compact JSON is the LAST stdout line — a driver that parses
// only the final line gets JSON, not the banner.
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
  // 32 concurrent local tasks in one JVM: a small heap turns GC into the
  // dominant noise source (multi-second spikes on arbitrary queries); the
  // box has 128 GiB, so default generously
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
