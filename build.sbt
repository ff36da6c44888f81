ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tmdbmoviedatapipelinespark"
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
  "-Duser.timezone=UTC",
  // local[N] heartbeats ride the same JVM as the work: a full-GC pause
  // during a multi-GB expansion join can exceed the 10 s default and
  // kill the run with RpcTimeoutException — generous bounds cost
  // nothing in local mode (no real executor liveness to detect)
  "-Dspark.executor.heartbeatInterval=60s",
  "-Dspark.network.timeout=600s",
  // G1 + 32 task threads running lz4/parquet JNI (GetPrimitiveArrayCritical
  // pins the heap via the GCLocker) starve allocation retries at the
  // JDK-17 default of 2 — multi-GB spill jobs then throw OOM with
  // gigabytes reclaimable ("Retried waiting for GCLocker too often",
  // observed round 18 on the SRP expansion join at the 8g default heap).
  // A generous retry count lets the allocation wait out the critical
  // sections instead of dying; it costs nothing when the locker is idle.
  // (Diagnostic flag on JDK 17, hence the unlock.)
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
