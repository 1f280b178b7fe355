ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "apacheicebergspark"
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
// The round driver parses the LAST stdout line of `sbt "runMain
// graft.Bench"` as the bench contract JSON; sbt's own trailing
// "[success] Total time ..." line was displacing it (BENCH_r13..r15
// all have parsed:null). Suppress it so the JSON line stays last,
// and pass the forked JVM's stdout through verbatim — the default
// LoggedOutput strategy prefixes every line with "[info] ", which is
// just as fatal to a strict JSON parse as the success banner.
ThisBuild / showSuccess := false
run / connectInput := false
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
  // Keep Derby (dragged in if anything touches the Hive metastore path)
  // from littering the source tree with metastore_db/ + derby.log.
  "-Dderby.system.home=target/derby",
  "-Dderby.stream.error.file=target/derby/derby.log",
  // 32 local executor threads want ~0.5-1 GiB each before spilling;
  // 8g measurably throttled the 10x scale check (an14 9->37 s from
  // shuffle spill). The image has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
