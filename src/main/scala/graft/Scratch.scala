package graft

import org.apache.spark.sql.SparkSession

/** Dev-only inspector (not part of the library surface): prints the
  * formatted physical plan and three timed noop-sink runs for each named
  * query — `runMain graft.Scratch <sfDir> <q1,q2,…> [plan|time|both]`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq("q01_pricing_summary")
    val mode = args.lift(2).getOrElse("both")
    val spark = Tables.configure(SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    names.foreach { n =>
      val fn = Queries.byName(n).fn
      if (mode != "time") {
        println(s"\n===================== $n =====================")
        println(fn(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      if (mode != "plan") (1 to args.lift(3).map(_.toInt).getOrElse(3)).foreach { i =>
        t(s"$n run$i")(fn(spark, d).write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
