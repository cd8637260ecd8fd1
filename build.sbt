ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ocdbserverspark"
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
  // 12g default: Verify now runs 8 queries concurrently (see
  // Verify.scala — the sequential dump crossed the driver's round cap
  // at ~1000 registry rows); sf0.01 plans are small but eight of them
  // share the unified memory pool at once.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // ~480 distinct whole-stage-codegen queries in one bench JVM generate
  // enough JIT'd classes to pressure the default 240 MB code cache; when
  // it fills, C2 falls back to interpretation and EVERY query slows
  // uniformly (r6's 1.47x late-run inflation). Headroom is cheap.
  "-XX:ReservedCodeCacheSize=512m",
)
