package graft

import graft.ops.PrefixOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale contract of [[graft.ops.PrefixOps]]: the distributed prefix
  * sum equals the naive single-partition window cumsum, AND the bucket
  * relation it builds is bounded by a fixed COUNT independent of how many
  * rows go in (the round-3 verdict's named scale-killer was the previous
  * constant-WIDTH form, whose totals relation grew linearly with the
  * corpus).
  */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  private val rnd = new scala.util.Random(4646)

  private def naive(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("expect",
      coalesce(sum("v").over(Window.orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

  test("bucketWidth: ceil(range/width) <= buckets for any range (1000 samples)") {
    for (_ <- 1 to 1000) {
      val a = rnd.nextLong() % 1000000000L
      val b = rnd.nextLong() % 1000000000L
      val lo = math.min(a, b)
      val hi = math.max(a, b)
      val buckets = 1 + rnd.nextInt(512)
      val w = PrefixOps.bucketWidth(lo, hi, buckets)
      val used = (BigInt(hi) - BigInt(lo)) / w + 1 // buckets actually reachable
      assert(used <= BigInt(buckets),
        s"lo=$lo hi=$hi buckets=$buckets width=$w used=$used")
    }
  }

  test("bucketWidth survives ranges wider than Long.MaxValue (full-range hash keys)") {
    for (_ <- 1 to 1000) {
      val a = rnd.nextLong()
      val b = rnd.nextLong()
      val lo = math.min(a, b)
      val hi = math.max(a, b)
      val buckets = 1 + rnd.nextInt(512)
      val w = PrefixOps.bucketWidth(lo, hi, buckets)
      assert(w >= 1, s"lo=$lo hi=$hi buckets=$buckets width=$w wrapped")
      val used = (BigInt(hi) - BigInt(lo)) / w + 1
      assert(used <= BigInt(buckets),
        s"lo=$lo hi=$hi buckets=$buckets width=$w used=$used")
    }
    // the exact wrap case the all-Long form got wrong: width must cover
    // the whole 2^64-ish range, not collapse to 1
    assert(PrefixOps.bucketWidth(Long.MinValue, Long.MaxValue, 128) >
      BigInt(Long.MaxValue) / 128)
  }

  test("prefix sum is exact on keys spanning the full signed-long range") {
    import spark.implicits._
    val ids = Seq(Long.MinValue, Long.MinValue + 7, -1000000007L, -1L, 0L, 1L,
      999999937L, Long.MaxValue - 5, Long.MaxValue)
    val df = ids.zipWithIndex.map { case (id, i) => (id, i + 1L) }.toDF("id", "v")
    val got = PrefixOps.withExclusivePrefixSum(df, "id", "v", "got", targetBuckets = 8)
      .select("id", "got").as[(Long, Long)].collect().toMap
    val vals = ids.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val sorted = ids.sorted
    val expect = sorted.zip(sorted.map(vals).scanLeft(0L)(_ + _)).toMap
    ids.foreach { id => assert(got(id) === expect(id), s"id=$id") }
  }

  test("prefix sum matches the naive window cumsum (sparse, non-zero-based ids)") {
    val df = spark.range(0, 2000).toDF("i")
      .select((col("i") * 7 + 13).as("id"), (col("i") % 97 + 1).as("v"))
    val got = PrefixOps.withExclusivePrefixSum(df, "id", "v", "got", targetBuckets = 16)
    val joined = got.join(naive(df), "id")
    assert(joined.filter(col("got") =!= col("expect")).count() === 0)
    assert(got.count() === 2000)
  }

  test("bucket relation stays bounded while the corpus grows 100x") {
    val buckets = 4 * spark.sessionState.conf.numShufflePartitions
    for (n <- Seq(1000L, 100000L)) {
      val df = spark.range(0, n).toDF("id").withColumn("v", col("id") % 5 + 1)
      val Array(lo, hi) = Array(0L, n - 1)
      val w = PrefixOps.bucketWidth(lo, hi, buckets)
      // the bucket ids the totals relation will actually materialize
      val used = df.select(expr(s"(id - ${lo}L) div ${w}L").as("b")).distinct().count()
      assert(used <= buckets.toLong, s"n=$n produced $used buckets > $buckets")
      // and the result is still exact at both sizes
      val got = PrefixOps.withExclusivePrefixSum(df, "id", "v", "got")
      assert(got.join(naive(df), "id").filter(col("got") =!= col("expect")).count() === 0)
    }
  }

  test("empty input yields an empty result with the out column present") {
    val df = spark.range(0, 0).toDF("id").withColumn("v", lit(1L))
    val got = PrefixOps.withExclusivePrefixSum(df, "id", "v", "got")
    assert(got.columns.contains("got") && got.count() === 0)
  }

  test("composite key: repeated primary + tie-break column, ids past 2^32") {
    // the ADVICE-r17 case the packed single-long key got wrong: a
    // quality-desc-then-id greedy order where ids exceed 2^32 (the
    // replication-scaled regime). The primary (-score) REPEATS heavily,
    // so bucketing degrades to per-score groups and all tie-breaking
    // happens inside intra-bucket windows — the result must still equal
    // the naive two-column window cumsum exactly.
    val df = spark.range(0, 3000).toDF("i")
      .select((col("i") * 104729L + lit(4294967296L) * (col("i") % 50)).as("id"),
        (-(col("i") % 7)).as("neg_score"),
        (col("i") % 13 + 1).as("v"))
    val got = PrefixOps.withExclusivePrefixSumMulti(
      df, Seq("neg_score", "id"), "v", "got", targetBuckets = 16)
    val expect = df.withColumn("expect",
      coalesce(sum("v").over(Window.orderBy("neg_score", "id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val joined = got.join(expect, Seq("neg_score", "id"))
    assert(joined.filter(col("got") =!= col("expect")).count() === 0)
    assert(got.count() === 3000)
  }

  test("weighted systematic sample: boundary crossings, certainty inclusion, invariance") {
    import graft.ops.SampleOps
    // weights 3,4,5,… over ids 0..: crossings of step 10 at cum 10,20,…
    def ws(rows: Seq[(Long, Long)], step: Long, parts: Int = 3) = {
      import spark.implicits._
      SampleOps.weightedSystematic(
          rows.toDF("id", "w").repartition(parts), "id", "w", step)
        .select("id", "cum_before").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // cums before: 0,3,7,12,18,25 — rows crossing a multiple of 10:
    // id2 (7→12 crosses 10), id4 (18→25 crosses 20); id0 crosses 0? no:
    // 0 div 10 == 0 and (0+3) div 10 == 0 — the first boundary is at 10
    val got = ws(Seq((0L, 3L), (1L, 4L), (2L, 5L), (3L, 6L), (4L, 7L)), 10L)
    assert(got == Map(2L -> 7L, 4L -> 18L), s"got $got")
    // a row heavier than the step ALWAYS crosses (certainty inclusion)
    val heavy = ws(Seq((0L, 1L), (1L, 25L), (2L, 1L)), 10L)
    assert(heavy.contains(1L), s"heavy row dropped: $heavy")
    // membership is partitioning-invariant (the walk is keyed, not physical)
    val rows = (0L until 500L).map(i => (i, i % 9 + 1))
    assert(ws(rows, 50L, parts = 1) == ws(rows, 50L, parts = 13))
    // expected sample size ~ totalWeight/step (systematic guarantee ±1 per bucket)
    val total = rows.map(_._2).sum
    assert(math.abs(ws(rows, 50L).size - total / 50L) <= 1)
  }
}
