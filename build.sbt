ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "buzzrustspark"
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
// One forked JVM PER SUITE, several in flight: the suites are independent
// (each builds its own fixtures in per-test tmpdirs; ports are ephemeral)
// but a single shared fork serializes them behind one local[4]
// SparkContext, leaving most of the host idle — measured 9m36s for the
// full suite on a quiet 32-core host. Per-suite JVMs give hard isolation
// (no shared-session conf races, no PipelineCache cross-talk) and let the
// scheduler overlap suites; the fork budget bounds memory and CPU
// oversubscription. SPARK_GRAFT_TEST_FORKS=1 restores serial runs.
Test / testGrouping := {
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withWorkingDirectory((Test / baseDirectory).value)
  (Test / definedTests).value.map(t => Tests.Group(t.name, Seq(t), Tests.SubProcess(opts)))
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup,
    sys.env.getOrElse("SPARK_GRAFT_TEST_FORKS", "8").toInt))
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
