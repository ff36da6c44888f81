package graft.tools

import graft.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad main (not part of the library surface) — rebuilt per
  * investigation; currently: phase decomposition of the CC-family
  * queries (round 21): how much of q39/q122/q144 is pair generation vs
  * the connected-components loop vs output assembly. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.configure(SparkSession.builder(), "32").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(tag: String)(body: => Unit): Unit = {
      val runs = (1 to 5).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: median ${runs.sorted.apply(2)}%.2f  runs ${runs.map(r => f"$r%.2f").mkString(", ")}")
    }
    // warm-up: build memoized relations once
    noop(graft.Queries.byName("q39_dup_clusters").fn(s, d))
    t("q36 pairs only") {
      noop(graft.Queries.byName("q36_minhash_lsh").fn(s, d))
    }
    t("q39 pairs + CC") {
      noop(graft.Queries.byName("q39_dup_clusters").fn(s, d))
    }
    // CC over a tiny literal edge list — isolates the loop machinery
    import s.implicits._
    val edges = (0L until 50L).map(i => (i, i + 1)).toDF("a", "b")
    noop(graft.ops.DedupOps.connectedComponents(edges))
    t("CC loop on 50 literal edges") {
      noop(graft.ops.DedupOps.connectedComponents(edges))
    }
    s.stop()
  }
}
