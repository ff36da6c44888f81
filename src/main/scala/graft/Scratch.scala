package graft

import org.apache.spark.sql.SparkSession

/** Dev-only stage timer (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder(), "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (q <- Seq("q01_pricing_summary", "q04_priority_revenue", "q36_minhash_lsh")) {
      val fn = Queries.byName(q).fn
      t(s"$q run1")(fn(spark, d).write.format("noop").mode("overwrite").save())
      t(s"$q run2")(fn(spark, d).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
