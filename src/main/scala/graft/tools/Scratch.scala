package graft.tools

import graft.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad main (not part of the library surface) — rebuilt per
  * investigation; currently: the q142 append-batch zip-partitions repro
  * (semi-through-union band self-join at a 100x resident). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-scale-x100")
    val s = Tables.configure(SparkSession.builder(), "32").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val root = graft.pipeline.IncrAttrTable.dir(d)
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    val batch = Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .withColumn("doc_id", col("doc_id") + lit(900000000000L))
    time("batch-scan")(batch)
    val newSh = graft.queries.DedupQs.shinglesOf(batch)
    time("shingles")(newSh)
    time("bands")(graft.queries.DedupQs.minhashBandsOf(newSh))
    time("model")(graft.ops.TextOps.modelScoresOf(batch))
    time("cascade")(graft.queries.TextQs.cascadeMaskOf(batch))
    val lm = graft.Memo.cached(s, root, "incr_lm") {
      s.read.parquet(s"$root/lm").repartition(col("gram"))
    }
    time("ppl-frozen-lm")(graft.queries.TextQs.pplAgainstLm(lm, batch))
    val (attrs, _, _, done) = graft.pipeline.IncrAttrTable.batchPlans(s, root, batch)
    time("attrs-full")(attrs)
    done()
    s.stop()
  }
}
