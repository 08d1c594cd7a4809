ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sqlenginespark"
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
// Stale-report guard (VERDICT r8 "What's wrong" #4): sbt's JUnit XML
// reporter never removes the report of a DELETED spec, so a scratch
// spec's failure XML can outlive its source and make the report dir
// disagree with the live run (609/1 summed vs 606/0 real in r8). A
// full `test` starts from a clean report dir; `testOnly` (a partial
// run whose dir is expected to be partial) is left alone.
Test / test := (Test / test)
  .dependsOn(Def.task { IO.delete(target.value / "test-reports") })
  .value
// Pass the forked JVM's stdout through RAW (no "[info] " logger prefix)
// and drop the trailing "[success] Total time ..." line, so Bench's
// final machine-readable JSON line reaches the driver's parser verbatim
// as the LAST line of stdout (BENCH_r03 parsed:null root cause).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude
// it from the unused-key lint so batch output stays warning-free.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
