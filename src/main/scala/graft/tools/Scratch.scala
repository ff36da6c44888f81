package graft.tools

import graft.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad main (not part of the library surface) — rebuilt per
  * investigation; currently: INTERLEAVED A/B of the round-21 driver
  * fast paths vs the distributed loops (host speed drifts on a
  * minutes scale, so alternating forms within one session is the only
  * robust comparison). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Tables.configure(SparkSession.builder(), "32").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def one(q: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      noop(graft.Queries.byName(q).fn(s, d))
      (System.nanoTime() - t0) / 1e9
    }
    def ab(q: String): Unit = {
      // warm both forms
      one(q)
      s.conf.set("spark.graft.graph.maxDriverEdges", "0")
      s.conf.set("spark.graft.cc.maxDriverEdges", "0")
      one(q)
      s.conf.unset("spark.graft.graph.maxDriverEdges")
      s.conf.unset("spark.graft.cc.maxDriverEdges")
      val fast = scala.collection.mutable.ArrayBuffer[Double]()
      val dist = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to 5).foreach { _ =>
        fast += one(q)
        s.conf.set("spark.graft.graph.maxDriverEdges", "0")
        s.conf.set("spark.graft.cc.maxDriverEdges", "0")
        dist += one(q)
        s.conf.unset("spark.graft.graph.maxDriverEdges")
        s.conf.unset("spark.graft.cc.maxDriverEdges")
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(2)
      println(f"$q: fast ${med(fast.toSeq)}%.2f (${fast.map(x => f"$x%.2f").mkString(",")})  " +
        f"dist ${med(dist.toSeq)}%.2f (${dist.map(x => f"$x%.2f").mkString(",")})")
    }
    Seq("q95_bfs_hops", "q117_weighted_sssp", "q39_dup_clusters",
      "q153_media_dup_clusters").foreach(ab)
    s.stop()
  }
}
