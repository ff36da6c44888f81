package graft.tools

import graft.Tables
import graft.ops.{DedupOps, VectorOps}
import graft.queries.VectorQs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall-vs-L measurement for the multi-table SRP construction (q139's
  * evidence tool, the vector-family sibling of [[SimhashProbe]]): for
  * each (band width, table-set count L) configuration, count the distinct
  * candidate pairs the banded self-join generates and how many of the
  * EXACT cos ≥ 0.45 pairs survive the verify — against the brute-force
  * ground truth (feasible at probe scales: one corpus² cosine pass).
  *
  * The table this prints is SURVEY §2.0.2's recall-vs-L curve: the width
  * ladder showed widening bands starves weak-cosine recall (16-bit L=1
  * finds none of this corpus's cos ≥ 0.45 pairs); the L axis is the
  * standard amplifier — miss probability (1 − p^bits)^(L·64/bits) decays
  * in L at FIXED per-table selectivity, so candidates grow linearly in L
  * while recall approaches 1. The interesting row is the L where the
  * 16-bit union's candidate count crosses the 8-bit single-set budget.
  *
  * Usage: `runMain graft.tools.SrpMultiProbe [dir]`.
  */
object SrpMultiProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = Tables.configure(org.apache.spark.sql.SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(s, d).select("vec_id", "embedding").cache()

    // exact ground truth: all cos >= 0.45 pairs (corpus² — probe scale only)
    val ea = emb.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"))
    val eb = emb.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"))
    val exact = ea.join(eb, col("vec_a") < col("vec_b"))
      .withColumn("cos", VectorOps.cosine(col("e_a"), col("e_b")))
      .filter(col("cos") >= 0.45)
      .select("vec_a", "vec_b").cache()
    val nExact = exact.count()
    println(s"\ncorpus: ${emb.count()} vectors, exact cos>=0.45 pairs: $nExact")

    println("| width | L (sets) | tables | candidates | found | recall |")
    println("|---|---|---|---|---|---|")
    for ((bits, l) <- Seq((8, 1), (8, 2), (8, 4), (16, 1), (16, 2), (16, 4),
        (16, 8), (16, 16), (32, 16))) {
      val planesL = (0 until l).map(VectorQs.srpPlanesL)
      val bands = VectorOps.srpBandsMulti(emb, "vec_id", "embedding", planesL, bits)
      val capped = DedupOps.capBuckets(bands, Seq("table_idx", "bits"), 1000)
      def side(n: String): DataFrame =
        capped.select(col("vec_id").as(s"vec_$n"), col("table_idx"), col("bits"))
      val cands = side("a").join(side("b"), Seq("table_idx", "bits"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct().cache()
      val nCand = cands.count()
      val nFound = cands.join(exact, Seq("vec_a", "vec_b"), "left_semi").count()
      cands.unpersist()
      val recall = if (nExact == 0) 1.0 else nFound.toDouble / nExact
      println(f"| $bits-bit | $l | ${l * 64 / bits} | $nCand | $nFound | $recall%.3f |")
    }
    s.stop()
  }
}
