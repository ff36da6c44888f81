package graft.tools

import graft.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad main (not part of the library surface) — rebuilt per
  * investigation; currently: q94 10x-tier stage profile. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-scale-x10")
    val s = Tables.configure(SparkSession.builder(), "32").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      s.sharedState.cacheManager.clearCache()
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }

    val assigns = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_us").as("us"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))

    time("assigns only")(assigns)
    time("scd2 no orderBy")(
      graft.ops.ScdOps.history(assigns, "user_id", "us", "event_id", "item"))
    time("scd2 + orderBy")(
      graft.ops.ScdOps.history(assigns, "user_id", "us", "event_id", "item")
        .orderBy("user_id", "version"))
    time("full q94")(graft.Queries.byName("q94_scd2_history").fn(s, d))
    s.stop()
  }
}
