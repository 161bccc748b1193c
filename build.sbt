ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduceappspark"
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
// Pass forked-run stdout through verbatim: the driver parses Bench's one
// JSON line from stdout, and sbt's default LoggedOutput prefixes every
// line with "[info] " which broke that parse in round 1 (BENCH_r01.json
// "parsed": null).
Compile / run / outputStrategy := Some(StdoutOutput)
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
  // Keep the heap SMALL on purpose: an A/B on the bench subset measured
  // 8g = 18 s vs 32g = 92 s for the identical queries — on this
  // lazily-faulted VM a large young gen keeps touching cold guest pages
  // and every stage slows several-fold. 8g recycles warm pages.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // Probe hook: lets the validation battery flip Spark confs in the forked
  // JVM (e.g. -Dspark.sql.adaptive.enabled=false for the AQE-invariance
  // probe) without touching source.
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
