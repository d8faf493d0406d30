ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "coviddatapipelinespark"
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
// Forked `run` output goes to sbt's logger by default, which prefixes every
// stdout line with "[info] " (and stderr with "[error] "). The driver parses
// the bench/verify JSON contract line from raw process output — round 4's
// BENCH artifact captured the complete JSON but "parsed": null because of
// that prefix. StdoutOutput inherits sbt's own stdio, so program lines pass
// through bare.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and drop sbt's "[success] Total time: ..." trailer, so the contract
// line a main prints last is the actual final line of process output no
// matter how the driver's tail parser picks its candidate line.
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
// Heap: the bench/verify JVM runs local[32] with broadcast-heavy plans over
// all 81 queries in one process. At 8g, G1 sits in constant young-GC +
// concurrent-mark churn and randomly inflates individual query timings
// 3–6× (measured round 3: total 55.3 s at 8g → 32.5 s at 48g, one 284 ms
// pause total); 48g on this 128 GiB machine leaves GC out of the picture.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:ReservedCodeCacheSize=512m",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+").toSeq).filter(_.nonEmpty)
