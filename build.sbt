ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pathwaydataframeworkspark"
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
// Executed-Kafka escape hatch: this zero-egress env ships no kafka jars
// (resolution attempted r13: offline cache miss). Point
// SPARK_GRAFT_KAFKA_JARS at a directory holding spark-sql-kafka-0-10 +
// kafka-clients (+ deps) and KafkaIntegrationSpec's round-trip runs
// unmodified; unset, that spec self-cancels and everything else is
// unaffected.
Test / unmanagedJars ++= sys.env.get("SPARK_GRAFT_KAFKA_JARS")
  .map(d => (file(d) * "*.jar").classpath.toSeq).getOrElse(Nil)
// The bench/verify driver parses a JSON line from the tail of `sbt run`
// output. StdoutOutput passes the forked JVM's stdout through verbatim
// (no "[info] " logger prefix) and showSuccess drops the trailing
// "[success] Total time ..." line, so our JSON line is clean and last.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:ReservedCodeCacheSize=1g",
)
