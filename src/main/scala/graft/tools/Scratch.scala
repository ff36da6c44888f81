package graft.tools

import graft.Tables
import graft.streaming.IndexLayout

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad main (not part of the library surface) — rebuilt per
  * investigation; currently: write-side timing of one IncrAttrTable
  * 100-doc shard append (the [append-100] constant, round 15). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.configure(SparkSession.builder(), "32").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val root = graft.pipeline.IncrAttrTable.ensureBuilt(s, d)
    val idx = s"$root/index"
    val nb = IndexLayout.numBuckets(s, idx)
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { i =>
      val base = 30000000000L + i * 1000000L
      val batch = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + lit(base))
      println(s"--- append $i ---")
      val (attrs, newSh, newBands, done) = t("batchPlans") {
        graft.pipeline.IncrAttrTable.batchPlans(s, root, batch)
      }
      try {
        val eff = 9000L + i
        t("attrs parquet write (dynamic)") {
          attrs.withColumn("batch_id", lit(eff))
            .write.partitionBy("batch_id").mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(s"$root/attrs")
        }
        t("bands writeSlice") {
          IndexLayout.writeSlice(
            newBands.withColumn("bucket", pmod(col("band_hash"), lit(nb)))
              .withColumn("batch_id", lit(eff)).repartition(col("bucket")),
            idx, "bands", dynamic = true)
        }
        t("shingles writeSlice") {
          IndexLayout.writeSlice(
            newSh.filter(size(col("shingles")) > 0)
              .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(nb.toLong)).cast("int"))
              .withColumn("batch_id", lit(eff)).repartition(col("bucket")),
            idx, "shingles", dynamic = true)
        }
      } finally done()
    }
    s.stop()
  }
}
