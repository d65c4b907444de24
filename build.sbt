ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "twitterkafkaetlspark"
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
// `compile` alone must yield a RUNNABLE classes dir: the graftsink
// DataSourceV2 short name resolves via the ServiceLoader file in
// src/main/resources/META-INF/services, and tools/run.sh points a bare
// java at target/scala-2.13/classes — so resource copying can't wait
// for `products`/`package`.
Compile / compile := (Compile / compile).dependsOn(Compile / copyResources).value
// Forked `run` output must reach stdout RAW — the driver parses
// graft.Bench's one-line JSON, and sbt's default LoggedOutput would
// prefix every line with "[info] " and break that parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and nothing may print AFTER that JSON line: the driver keeps only a
// short tail of the output and parses its trailing line, so sbt's
// "[success] Total time: …" epilogue broke the BENCH_r01/r02 parse.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
