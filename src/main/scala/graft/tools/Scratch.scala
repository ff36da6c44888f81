package graft.tools

import graft.Tables
import graft.streaming.IndexLayout

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad main (not part of the library surface) — rebuilt per
  * investigation; currently: steady-state timing + phase decomposition
  * of the IncrAttrTable 100-doc shard append (the [append-100]
  * constant, round 16). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.configure(SparkSession.builder(), "32").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val root = graft.pipeline.IncrAttrTable.ensureBuilt(s, d)
    val idx = s"$root/index"
    println(s"nb = ${IndexLayout.numBuckets(s, idx)}, gen = ${IndexLayout.gen(s, idx)}")
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    var seq = 0
    def batch() = {
      seq += 1
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + lit(30000000000L + seq * 1000000L))
    }
    // settle: absorb async-cleanup debt from the build
    (1 to 3).foreach { _ =>
      graft.pipeline.IncrAttrTable.appendBatch(s, root, batch())
      System.gc()
    }
    // steady-state full appends
    (1 to 5).foreach { i =>
      t(s"appendBatch[$i]") {
        graft.pipeline.IncrAttrTable.appendBatch(s, root, batch())
      }
    }
    // decomposition: plans (incl. the two bounded collects) vs writes.
    // The probe writes land under an UNCOMMITTED batch id (7777, no
    // manifest) and are deleted below — left behind they'd pollute the
    // shared ensureBuilt artifact for any later run against this corpus
    // (whole-table attrs readers don't filter by manifest, and the sweep
    // never removes them because no _inflight marker names 7777).
    println("--- decomposition ---")
    val b = batch()
    t("span agg") { b.agg(min(col("doc_id")), max(col("doc_id"))).head() }
    val (attrs, newSh, newBands, _, done) = t("batchPlans") {
      graft.pipeline.IncrAttrTable.batchPlans(s, root, b)
    }
    val hc = s.sparkContext.hadoopConfiguration
    val scratchAttrs =
      s"${graft.pipeline.IncrAttrTable.liveRelDir(s, root, "attrs")}/batch_id=7777"
    try {
      t("attrs action (count)") { attrs.count() }
      t("attrs leaf write") {
        attrs.write.mode("overwrite").parquet(scratchAttrs)
      }
      t("bands tail write") {
        IndexLayout.appendTailSlice(newBands, idx, "bands", 7777L)
      }
      t("shingles tail write") {
        IndexLayout.appendTailSlice(
          newSh.filter(size(col("shingles")) > 0), idx, "shingles", 7777L)
      }
    } finally {
      done()
      graft.ops.Fs.delete(scratchAttrs, hc)
      Seq("bands", "shingles").foreach { rel =>
        graft.ops.Fs.delete(s"${IndexLayout.dataDir(s, idx, rel)}" +
          s"/bucket=${IndexLayout.TailBucket}/batch_id=7777", hc)
      }
    }
    s.stop()
  }
}
