package graft

import graft.ops.SkewOps
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew (salted join) and co-location (bucketed join) at the plan level:
  * results must equal the plain forms, and the bucketed join must plan
  * without a shuffle exchange.
  */
class SkewBucketSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sf)
    val dim = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedJoin(li, dim, "l_orderkey", "o_orderkey", saltFactor = 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join rejects small-side-preserving join types") {
    val li = Tables.lineitem(spark, sf)
    val dim = Tables.orders(spark, sf).select(col("o_orderkey"))
    // right/full outer would emit each unmatched small-side row saltFactor times
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(li, dim, "l_orderkey", "o_orderkey", 8, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(li, dim, "l_orderkey", "o_orderkey", 8, joinType = "full")
    }
  }

  test("heavy hitters finds the hot keys") {
    val hh = SkewOps.heavyHitters(
      Tables.lineitem(spark, sf), col("l_returnflag"), topN = 3).collect()
    assert(hh.length == 3)
    assert(hh.map(_.getLong(1)).toSeq == hh.map(_.getLong(1)).toSeq.sorted.reverse)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog is fresh each JVM but the warehouse DIRECTORY
    // survives — clear the locations or saveAsTable refuses
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // pin the plan shape for the assertion: AQE wraps the plan (hiding it
    // from collect) and a broadcast join would dodge the shuffle trivially
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty) // bucket layout co-locates both sides
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }
}
