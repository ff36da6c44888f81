package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Queries, Tables}

/** Dev-only A/B harness: interleaved timed runs of one query with the
  * BinnedIntervalJoin rule enabled vs disabled in the SAME JVM —
  * `runMain graft.tools.RuleAb <sfDir> <query> [reps]`. Isolates the
  * rule's plan-compile overhead from host noise and JIT state.
  */
object RuleAb {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val q = Queries.byName(args.lift(1).getOrElse("q49_tfidf_keywords"))
    val reps = args.lift(2).map(_.toInt).getOrElse(7)
    val spark = Tables.configure(SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Double = {
      System.gc()
      val t0 = System.nanoTime()
      q.fn(spark, d).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(); run() // warm-up both JIT and memoized caches
    val on = collection.mutable.ArrayBuffer[Double]()
    val off = collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { _ =>
      spark.conf.set(graft.plans.BinnedIntervalJoin.ConfKey, "true");  on += run()
      spark.conf.set(graft.plans.BinnedIntervalJoin.ConfKey, "false"); off += run()
    }
    def stats(xs: Seq[Double]) = f"median ${xs.sorted.apply(xs.size / 2)}%.3f  runs ${xs.map(x => f"$x%.2f").mkString(",")}"
    println(s"[ab] ON  : ${stats(on.toSeq)}")
    println(s"[ab] OFF : ${stats(off.toSeq)}")
    spark.stop()
  }
}
