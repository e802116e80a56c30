ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scalablevectorsearchspark"
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
// The SIMD distance kernels (src/main/java/graft/simd) use the JDK Vector
// API, an incubator module on JDK 17: javac needs it to compile, forked
// JVMs need it to load the class. Java compiles first so scalac reads the
// classfile (whose signatures are plain primitives/arrays) instead of
// parsing the incubator imports. Runtime absence of the module is handled
// gracefully (graft.core.SimdSupport probes and falls back to scalar).
compileOrder := CompileOrder.JavaThenScala
javacOptions ++= Seq("--add-modules", "jdk.incubator.vector", "-encoding", "UTF-8")
// sbt's in-process javac loads jdk.incubator.vector classes into the
// unnamed module and dies with IllegalAccessError (java.base does not
// export jdk.internal.vm.vector to it). Setting javaHome makes sbt fork
// a real `javac` process, which resolves --add-modules correctly.
javaHome := Some(file(sys.props("java.home")))
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
  "--add-modules", "jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Pass the forked run's stdout straight through (no "[info] " prefix):
// the bench driver line-parses JSON out of the process output, and the
// logger prefix breaks `json.loads` on the line.
run / outputStrategy := Some(StdoutOutput)
