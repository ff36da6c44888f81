package graft.tools

import graft.Tables
import graft.streaming.{DocStream, IndexLayout}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured scale evidence for the streaming admission path (SURVEY
  * §2.0.2): per-batch admission cost against a resident index seeded
  * from a 1× vs 10× corpus, at the default and a corpus-scaled bucket
  * count, and before/after compaction once many small batches have
  * accrued.
  *
  * What the numbers are expected to show (and the honest framing):
  * bucket pruning buys a constant ≈ probed-buckets/nb factor on the
  * index read — a trickle batch touching b of nb buckets reads b/nb of
  * the index. nb is the LAYOUT scale knob: at a fixed nb a uniformly
  * grown corpus grows every bucket, so probe cost still tracks
  * corpus/nb; scaling nb with the corpus (like any bucketed table)
  * holds per-probe work flat. `capBuckets` separately bounds any single
  * hot bucket's join contribution. Compaction removes the
  * files-per-bucket growth that accrues one batch_id dir per admitting
  * batch.
  */
object StreamScaleEvidence {

  private def probeDocs(spark: SparkSession, sfDir: String, idBase: Long) = {
    import spark.implicits._
    // 5 exact copies of corpus docs + 5 CONSTANT synthetic texts under
    // fresh ids — the first (warm) batch admits the synthetics, every
    // later probe classifies all 10 dup_corpus, so probes measure a
    // steady-state index they do not grow
    val corpus = Tables.documents(spark, sfDir)
      .orderBy("doc_id").limit(5)
      .select(col("doc_id"), col("text")).collect()
      .zipWithIndex.map { case (r, i) => (idBase + i, r.getString(1)) }
    val rnd = new scala.util.Random(4321)
    val fresh = (0 until 5).map(i =>
      (idBase + 100 + i, Seq.fill(40)(s"f${rnd.nextInt(50000)}").mkString(" ")))
    (corpus.toSeq ++ fresh).toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(
      SparkSession.builder().appName("stream-scale"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val configs = Seq(
      ("/root/testdata/sf0.01", 64), ("/root/testdata/sf0.1", 64),
      ("/root/testdata/sf0.1", 512))
    println("| seed corpus | nb | index band rows | probe batch median (s) | after 20 trickle batches (s) | after compact (s) |")
    println("|---|---|---|---|---|---|")
    configs.foreach { case (sfDir, nb) =>
      val root = java.nio.file.Files.createTempDirectory(s"stream-scale-$nb")
      val (indexDir, outDir) = (s"$root/index", s"$root/out")
      spark.conf.set(IndexLayout.BucketsConfKey, nb.toString)
      try {
        DocStream.seedIndex(
          Tables.documents(spark, sfDir).select("doc_id", "text"), indexDir)
        val bandRows = spark.read
          .parquet(s"$indexDir/bands/gen=${IndexLayout.gen(spark, indexDir)}").count()

        var batchId = 0L
        def admit(docs: org.apache.spark.sql.DataFrame): Double = {
          val t0 = System.nanoTime()
          DocStream.admitBatch(docs, indexDir, outDir, batchId)
          batchId += 1
          (System.nanoTime() - t0) / 1e9
        }
        def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

        // steady-state probe: batch 0 admits the 5 fresh docs; later
        // batches (same texts, new ids) classify without growing the index
        admit(probeDocs(spark, sfDir, 900000L)) // warm + admit fresh
        val probe1 = median((1 to 3).map(i =>
          admit(probeDocs(spark, sfDir, 900000L + i * 1000L))))

        // 20 single-doc trickle batches accrue batch_id dirs per bucket
        val rnd = new scala.util.Random(7)
        import spark.implicits._
        (0 until 20).foreach { i =>
          admit(Seq((950000L + i,
            Seq.fill(40)(s"t${rnd.nextInt(50000)}").mkString(" ")))
            .toDF("doc_id", "text"))
        }
        val probe2 = median((1 to 3).map(i =>
          admit(probeDocs(spark, sfDir, 960000L + i * 1000L))))

        DocStream.compactIndex(spark, indexDir)
        val probe3 = median((1 to 3).map(i =>
          admit(probeDocs(spark, sfDir, 970000L + i * 1000L))))

        println(f"| $sfDir | $nb | $bandRows%,d | $probe1%.2f | $probe2%.2f | $probe3%.2f |")
      } finally spark.conf.unset(IndexLayout.BucketsConfKey)
    }
    spark.stop()
  }
}
