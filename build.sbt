ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "steeldatafusionspark"
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
  // Arrow's memory core asks for java.nio opened to its NAMED module as
  // well as ALL-UNNAMED (classpath jars are unnamed, but the message —
  // and any future module-path use — names both)
  "--add-opens", "java.base/java.nio=org.apache.arrow.memory.core,ALL-UNNAMED",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // default sized for the full 280-query bench/verify sweep in one JVM
  // (max, not committed memory — small runs are unaffected); override
  // with SPARK_DRIVER_MEM
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Interactive entry point — the reference is a REPL (its rustyline loop
// feeds the Steel VM); the Spark-native equivalent is a Scala REPL with a
// live SparkSession and the graft surface pre-imported: `sbt console`.
// Forked so the REPL JVM gets the JDK-17 add-opens above.
console / fork := true
Compile / console / initialCommands :=
  """import org.apache.spark.sql._
    |import org.apache.spark.sql.functions._
    |import _root_.graft._
    |import _root_.graft.operators._
    |import _root_.graft.operators.Relational.GraftOps
    |import _root_.graft.functions.{ColFns, TextFns, Udfs}
    |val spark = Engine.create()
    |import spark.implicits._
    |println("graft ready: `spark` session; df.selectCols/filterCol/... (GraftOps); Dedup, Similarity, Multimodal, EventStreams")
    |""".stripMargin
