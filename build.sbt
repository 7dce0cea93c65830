ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "currencyetlpipelinespark"
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
) ++ sys.env.get("SPARK_GC_LOG").map(f => s"-Xlog:gc*:$f").toSeq ++
  sys.env.get("SPARK_GC_OPTS").toSeq.flatMap(_.split(" ").toSeq)
// 32 GiB heap for `run` (Bench/Verify/tools — box has 128 GiB): at
// -Xmx8g a local[32] sf0.1 session gives ~150 MiB of execution memory
// per task slot, so the heavy dedup/graph entries spill and the first
// large run grinds through heap growth + full-GC churn (observed: one
// entry's first run 104 s vs 7 s warm). -Xms pinned to -Xmx so the
// benchmark never pays growth pauses. Tests get a modest UNPINNED heap
// (sf0.001 fixtures) so `sbt test` still starts on hosts without
// 32 GiB free.
// CICompilerCount=16: a ~190-entry catalog generates thousands of
// codegen classes; the default C2 thread count leaves a compilation
// backlog during which fresh classes run INTERPRETED — whole stages at
// 10-50x. ReservedCodeCacheSize=512m headroom for the same reason.
run / javaOptions ++= {
  val m = sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")
  Seq(s"-Xmx$m", s"-Xms$m",
    "-XX:CICompilerCount=16", "-XX:ReservedCodeCacheSize=512m")
}
Test / javaOptions +=
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
