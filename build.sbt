ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "weaviatetxtaispark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
scalacOptions ++= Seq("-deprecation", "-unchecked")
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// JUnit XMLs from suites deleted since the last run otherwise survive
// in target/test-reports and inflate external suite counts (this bit
// three rounds running: ZstdDbgSpec r9, Mp3Dbg/Mp3QuickSpec r11).
// Wipe the report dir before tests execute so reports match HEAD.
Test / testOptions += {
  val reports = target.value / "test-reports"
  Tests.Setup(() => if (reports.exists) IO.delete(IO.listFiles(reports)))
}
// The driver parses ONE raw JSON line from `sbt "runMain graft.Bench"`
// stdout. By default sbt routes forked-run output through its logger,
// prefixing every line with "[info] " — which made BENCH_r01/r02
// unparseable ("parsed": null). StdoutOutput passes the program's
// stdout through verbatim.
run / outputStrategy := Some(StdoutOutput)
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
