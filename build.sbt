ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projetbigdataspark"
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
// Pass the forked process's stdout/stderr through UNWRAPPED: sbt's
// default logger prefixes every line with "[info] "/"[error] ", which
// is exactly what kept the driver's bench-JSON regex from matching a
// line that must begin with '{' (BENCH_r07–r09 "parsed": null).
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
  // the JPEG codec (javax.imageio) must never try to touch a display
  "-Djava.awt.headless=true",
  "-Dspark.sql.session.timeZone=UTC",
  // pin the JVM zone too: tests assert with Timestamp.valueOf, which
  // reads the default zone — must agree with the session zone
  "-Duser.timezone=UTC",
  // 20g default: the 65-query bench sweep GC-thrashes an 8g heap once
  // the accumulated broadcast/codegen debris exceeds it (measured 728 s
  // total vs 178 s at 24g; the box has 128 GiB). Tests fork the same
  // options and are unaffected by the larger ceiling.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
)
