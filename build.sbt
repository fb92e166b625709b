ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "planetdumpngspark"
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
  // local[N] runs driver+executor in ONE JVM: at 8g the 270-query bench
  // session accumulated heap pressure (persisted blocks, broadcasts,
  // codegen classes) that inflated mid-run queries 3-22x vs their
  // isolates (measured r15: q47 11.9s in-suite vs 0.6s isolated; 24g
  // cut the suite total 767.5->707.7s with 15.6s total GC pause).
  // The box is 128 GiB; 24g is still conservative. Overridable via
  // SPARK_DRIVER_MEM. On a real cluster executor/driver sizing is a
  // deploy-time conf — this only sizes the local harness JVM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++
  // Extra JVM flags for ad-hoc measurement (GC logs, code-cache probes);
  // empty by default so the driver contract is unchanged.
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
