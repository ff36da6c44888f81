package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the ANN recall-vs-probe-cost curve (SURVEY
  * §2.0.2): at each scale tier (1× = the given sfDir, plus replicated
  * tiers built with [[ScaleEvidence.generateEmbeddings]]'s signed-
  * permutation corpus), sweep the probe budget and report recall@5
  * against exact brute force plus the median query time, for the
  * Lloyd-trained q42 index, the untrained %50-seed index (what the
  * training pass buys), and the q66 IVF-PQ path at the default budget.
  *
  * `runMain graft.tools.RecallCurve [sfDir] [workDir] [factors]` —
  * factors is a comma list (default "10,100"); replicated corpora are
  * (re)generated under `workDir/x{factor}`.
  *
  * Ground truth is exact brute-force top-5 of the fixed `vec_id < 5`
  * probe set against the FULL tier corpus — one linear scan per tier,
  * feasible at every measured size, so recall is never asserted from a
  * proxy.
  */
object RecallCurve {
  private def recallAt5(spark: SparkSession, dir: String,
      fn: (SparkSession, String) => DataFrame): Double = {
    val e = Tables.read(spark, dir, "embeddings")
    val exact = graft.ops.VectorOps.bruteForceTopK(
        e.select(col("vec_id").as("id"), col("embedding").as("vec")),
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        k = 5)
      .select(col("qid"), col("id").as("vec_id"))
    val got = fn(spark, dir).filter(col("rn") <= 5).select("qid", "vec_id")
    got.join(exact, Seq("qid", "vec_id"), "left_semi").count().toDouble / exact.count()
  }

  private def medianTime(spark: SparkSession, dir: String, runs: Int,
      fn: (SparkSession, String) => DataFrame): Double = {
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm-up
    val ts = (1 to runs).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    ts.sorted.apply(runs / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft-recall")
    val factors = args.lift(2).getOrElse("10,100").split(",").map(_.toInt).toSeq
    val spark = Tables.configure(SparkSession.builder().appName("recall-curve"), "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tiers: Seq[(String, String)] =
      ("1x" -> sfDir) +: factors.map { f =>
        val d = s"$workDir/x$f"
        ScaleEvidence.generateEmbeddings(spark, sfDir, d, f)
        s"${f}x" -> d
      }
    val probeSweep = Seq(3, 8, 16, 24, 32, 40)
    val cap = ScaleEvidence.CopyShift

    println("| tier | index | probes | recall@5 | median s |")
    println("|---|---|---|---|---|")
    tiers.foreach { case (tag, dir) =>
      Seq("trained" -> true, "seeds" -> false).foreach { case (idx, trained) =>
        probeSweep.foreach { p =>
          spark.conf.set("spark.graft.ivf.probes", p.toString)
          val fn = (s: SparkSession, d: String) =>
            graft.queries.VectorQs.ivfQuery(s, d, idCap = cap, trainedIndex = trained)
          spark.sharedState.cacheManager.clearCache()
          val r = recallAt5(spark, dir, fn)
          val t = medianTime(spark, dir, runs = 3, fn)
          println(f"| $tag | q42 $idx | $p | $r%.2f | $t%.2f |")
        }
      }
      // q66 at the default budget: the PQ/ADC + scaled-shortlist path
      // must not trail the plain-IVF recall it re-ranks from
      spark.conf.unset("spark.graft.ivf.probes")
      spark.sharedState.cacheManager.clearCache()
      val fnPq = (s: SparkSession, d: String) =>
        graft.queries.VectorQs.ivfpqQuery(s, d, idCap = cap, memoSuffix = "_rc")
      val rPq = recallAt5(spark, dir, fnPq)
      val tPq = medianTime(spark, dir, runs = 3, fnPq)
      println(f"| $tag | q66 ivf-pq | default | $rPq%.2f | $tPq%.2f |")
    }
    spark.stop()
  }
}
