package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark sessions are
  * expensive; ScalaTest suites run sequentially in one JVM here).
  */
object SparkSessions {
  lazy val spark: SparkSession = {
    val s = Tables
      .configure(SparkSession.builder().appName("graft-test"), cpus = "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
