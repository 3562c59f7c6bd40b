ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkaconnectspark"
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
// Pass the forked JVM's stdout straight through (no sbt [info] prefix) so
// the driver can parse graft.Bench's single JSON output line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// No "[success] Total time: ..." trailer either: the harness keeps only
// the last ~2000 chars of output and the metric line must fit inside.
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // 24g default (was 16g): the r15 sf1 full-suite run hit generated-code
  // eviction — full GCs unloaded weakly-reachable codegen classes and
  // j1/k7/k10/e9c recompiled mid-suite, reading 4-14x their isolated
  // times. More heap keeps natural GC (and that eviction) rare as the
  // suite grows.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Whole-stage codegen emits one class per plan; a long query suite
  // fills the JVM's default 240 MB code cache, after which the JIT
  // disables itself and every later compute-heavy query runs
  // interpreted (measured 2-3x slowdowns on late-suite queries).
  "-XX:ReservedCodeCacheSize=1g",
)
