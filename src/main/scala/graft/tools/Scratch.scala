package graft.tools

import graft.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad main (not part of the library surface) — rebuilt per
  * investigation; currently: drift-robust alternating-session A/B of
  * cached-plan AQE coalescing + tmpfs shuffle scratch. Variant order
  * rotates per alternation so session position does not bias a variant. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val qs = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
      "q94_scd2_history", "q105_gap_fill", "q99_rolling_1h",
      "q97_mad_outliers", "q114_prefix_filter_join", "q137_pipeline_select",
      "q83_incremental_dedup", "q151_incr_assembly", "q01_pricing_summary",
      "q38_ngram_jaccard", "q17_dedup_window", "q57_span_dedup"))
    val alternations = args.lift(3).map(_.toInt).getOrElse(3)

    final case class Variant(name: String, confs: Map[String, String])
    // base = the committed session defaults (incl. cached-plan AQE);
    // oc  = scan splits no longer floored at the 4 MB per-file open cost
    //       (small-file scans parallelize; large files stay
    //       maxPartitionBytes-bounded)
    // mps = AQE partition coalescing may keep partitions down to 256 KB
    //       (CPU-dense post-shuffle stages keep parallelism)
    val variants = Seq(
      Variant("base", Map.empty),
      Variant("oc", Map("spark.sql.files.openCostInBytes" -> "131072")),
      Variant("mps", Map(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "262144")),
      Variant("ocmps", Map(
        "spark.sql.files.openCostInBytes" -> "131072",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "262144")))

    val results = scala.collection.mutable.Map[(String, String),
      scala.collection.mutable.ArrayBuffer[Double]]()

    (0 until alternations).foreach { alt =>
      val order = variants.drop(alt % variants.size) ++ variants.take(alt % variants.size)
      order.foreach { v =>
        var b = Tables.configure(SparkSession.builder(), cpus)
        v.confs.foreach { case (k, x) => b = b.config(k, x) }
        val s = b.getOrCreate()
        s.sparkContext.setLogLevel("ERROR")
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        qs.foreach { q =>
          s.sharedState.cacheManager.clearCache()
          noop(graft.Queries.byName(q).fn(s, d))
          (1 to 3).foreach { _ =>
            System.gc()
            val t0 = System.nanoTime()
            noop(graft.Queries.byName(q).fn(s, d))
            results.getOrElseUpdate((q, v.name),
              scala.collection.mutable.ArrayBuffer()) += (System.nanoTime() - t0) / 1e9
          }
        }
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        println(s"-- alternation $alt variant ${v.name} done")
      }
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    qs.foreach { q =>
      val line = variants.map { v =>
        f"${v.name}=${med(results((q, v.name)).toSeq)}%.3f"
      }.mkString("  ")
      println(s"== $q: $line")
      variants.foreach { v =>
        val xs = results((q, v.name)).toSeq
        println(f"     ${v.name}: ${xs.map(x => f"$x%.2f").mkString(",")}")
      }
    }
  }
}
