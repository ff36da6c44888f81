package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (not part of the library surface): print the formatted
  * physical plan of named registry queries — the `.explain("formatted")`
  * audit loop, runnable as `runMain graft.tools.ExplainQ <sfDir> <q>...`.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = graft.Tables.configure(SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"==== $name ====")
      val df = graft.Queries.byName(name).fn(s, d)
      df.explain("formatted")
      // EXPLAIN_RUN=1: also execute and print the final adaptive plan —
      // the only place AQE's runtime stage reuse / join re-plans show.
      // collect() (not a noop write, which builds its OWN QueryExecution
      // and would leave this one unexecuted) drives df's QueryExecution
      // so executedPlan is the finalized one; dev probe, results are
      // query-output-sized
      if (sys.env.get("EXPLAIN_RUN").contains("1")) {
        df.collect()
        println(s"==== $name (executed) ====")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    s.stop()
  }
}
