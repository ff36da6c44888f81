package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan/stage inspector (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q16_filter_scan", "q03_region_acctbal", "q36_minhash_lsh", "q41_cosine_topk")
    val spark = Tables.configure(SparkSession.builder(), "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      println(Queries.byName(n).fn(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
