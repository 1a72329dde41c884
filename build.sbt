ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "opengeminispark"
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
// Forked run output goes straight to stdout/stderr UNDECORATED — the
// default LoggedOutput prefixes every forked stdout line with "[info] ",
// which broke the bench driver's JSON-line parser three rounds running
// (BENCH_r09.json: tail contains the complete line, parsed: null).
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
// Ad-hoc JVM flags for forked runs (experiments: code-cache sizing, GC
// logging) without editing the build: SPARK_GRAFT_JVM_EXTRA="-Xflag ..."
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_EXTRA")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
javaOptions ++= jdk17AddOpens ++ Seq(
  // arrow-memory-netty (Arrow IPC ingest) wants direct-buffer access,
  // same flag spark-submit's JavaModuleOptions injects
  "-Dio.netty.tryReflectionSetAccessible=true",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// The full test suite shares one forked JVM across every suite's Spark
// work; at 8g its execution-memory pool transiently empties under the
// concurrency-stress case (observed: hashAgg denied 256 KB, task lost,
// stage failure). The sandbox has 128 GiB — give tests real headroom.
// Appended AFTER the base -Xmx so it wins (last -Xmx takes effect);
// run/Bench keeps the 8g driver contract above.
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "16g")}"
