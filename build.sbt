ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datalinkageanddeduplicationusingsplinkspark"
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
// The bench/verify mains print a machine-parsed JSON result line. sbt's
// default LoggedOutput decorates every forked-stdout line with "[info] ",
// which breaks a line-oriented JSON parser — StdoutOutput inherits the
// parent stdout verbatim instead. showSuccess drops the trailing
// "[success] Total time ..." line so the JSON stays the last line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // Default sized for the 32-thread bench on this 125 GB box; scaling runs
  // override per level (memory scales with cores in the N→4N executor
  // model: a 4-core leg gets 8g, a 16-core leg 32g).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++ sys.env.get("SPARK_DRIVER_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
