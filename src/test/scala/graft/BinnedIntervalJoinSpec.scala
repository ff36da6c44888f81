package graft

import graft.plans.BinnedIntervalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The automatic binned-interval-join rewrite (`plans/BinnedIntervalJoin`,
  * injected via `GraftExtensions`): naive key+band joins get the bucketed
  * plan, results are bit-identical to Spark's native plan, and the guards
  * (type gate, no-band shapes, manual-form tag, conf kill switch) hold.
  */
class BinnedIntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  import spark.implicits._

  private def generates(df: DataFrame): Int =
    "\\(\\d+\\) Generate".r.findAllIn(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)).length

  /** Left: (user, vid, vts); right: (user2, cid, cts) — timestamps built
    * from explicit µs so boundary rows are exact. */
  private def frames(): (DataFrame, DataFrame) = {
    val mins = 60L * 1000000L
    val views = Seq(
      (1L, 10L, 0L * mins), (1L, 11L, 100L * mins),
      (2L, 12L, 50L * mins), (3L, 13L, 7L * mins))
      .toDF("user", "vid", "us")
      .select(col("user"), col("vid"), timestamp_micros(col("us")).as("vts"))
    val clicks = Seq(
      (1L, 20L, 0L * mins),            // == lower boundary of vid 10
      (1L, 21L, 30L * mins),           // == upper boundary of vid 10
      (1L, 22L, 31L * mins),           // just past vid 10's band
      (1L, 23L, 129L * mins),          // inside vid 11's band
      (2L, 24L, 79L * mins),           // inside vid 12's band
      (2L, 25L, 49L * mins),           // 1 min before vid 12
      (4L, 26L, 0L * mins))            // no such user in views
      .toDF("user2", "cid", "us")
      .select(col("user2"), col("cid"), timestamp_micros(col("us")).as("cts"))
    (views, clicks)
  }

  private def collectPairs(df: DataFrame): Seq[(Long, Long)] =
    df.select("vid", "cid").as[(Long, Long)].collect().sorted.toSeq

  private def withRuleOff[A](f: => A): A = {
    spark.conf.set(BinnedIntervalJoin.ConfKey, "false")
    try f finally spark.conf.unset(BinnedIntervalJoin.ConfKey)
  }

  test("timestamp + INTERVAL band: rule fires and matches the native plan's rows") {
    val (v, c) = frames()
    val joined = v.join(c, col("user") === col("user2") &&
      col("cts") >= col("vts") &&
      col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
    assert(generates(joined) == 1, "rewrite did not fire on the interval form")
    val got = collectPairs(joined)
    val want = withRuleOff {
      val (v2, c2) = frames()
      collectPairs(v2.join(c2, col("user") === col("user2") &&
        col("cts") >= col("vts") &&
        col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES")))
    }
    assert(got == want)
    // boundary semantics: both band edges inclusive, just-past excluded
    assert(got.contains((10L, 20L)) && got.contains((10L, 21L)))
    assert(!got.contains((10L, 22L)))
  }

  test("strict bounds: < and > shift by exactly one microsecond") {
    val (v, c) = frames()
    val joined = v.join(c, col("user") === col("user2") &&
      col("cts") > col("vts") &&
      col("cts") < col("vts") + expr("INTERVAL 30 MINUTES"))
    assert(generates(joined) == 1, "rewrite did not fire on strict bounds")
    val got = collectPairs(joined)
    // both boundary clicks now excluded, interior ones kept
    assert(!got.contains((10L, 20L)) && !got.contains((10L, 21L)))
    assert(got.contains((11L, 23L)) && got.contains((12L, 24L)))
  }

  test("long µs cores with literal offsets (incl. negative lower bound) fire too") {
    val l = Seq((1L, 10L, 1000L), (2L, 11L, 5000L)).toDF("k", "lid", "lus")
    val r = Seq((1L, 20L, 900L), (1L, 21L, 1600L), (1L, 22L, 1601L),
      (2L, 23L, 4399L), (2L, 24L, 4400L)).toDF("k2", "rid", "rus")
    val joined = l.join(r, col("k") === col("k2") &&
      col("rus") >= col("lus") - lit(600L) && col("rus") <= col("lus") + lit(600L))
    assert(generates(joined) == 1, "rewrite did not fire on long cores")
    val got = joined.select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((10L, 20L), (10L, 21L), (11L, 24L)))
  }

  test("randomized: rewritten rows == native rows on 2k x 2k skewed-key data") {
    val rnd = new scala.util.Random(7)
    def mk(n: Int, id0: Long) = (1 to n).map { i =>
      // skewed: half the rows share key 1 — exactly the hot-key shape
      val k = if (rnd.nextBoolean()) 1L else 1L + rnd.nextInt(20)
      (k, id0 + i, rnd.nextLong(3600L * 1000000L))
    }
    val l = mk(2000, 0).toDF("k", "lid", "lus")
    val r = mk(2000, 100000).toDF("k2", "rid", "rus")
    def join(lf: DataFrame, rf: DataFrame) = lf.join(rf,
      col("k") === col("k2") &&
        col("rus") >= col("lus") && col("rus") <= col("lus") + lit(300L * 1000000L))
      .select("lid", "rid")
    val got = join(l, r).as[(Long, Long)].collect().sorted.toSeq
    val want = withRuleOff(join(l, r).as[(Long, Long)].collect().sorted.toSeq)
    assert(got.nonEmpty && got == want)
  }

  test("guards: double-typed ranges, band-less joins, and the kill switch stay native") {
    val l = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "lv")
    val r = Seq((1L, 1.5), (2L, 0.5)).toDF("k2", "lo")
    // double band cores (q07's shape) — the µs-integral type gate skips
    val dbl = l.join(r, col("k") === col("k2") &&
      col("lv") >= col("lo") && col("lv") < col("lo") + lit(1.0))
    assert(generates(dbl) == 0, "rule fired on double-typed cores")
    // equality-only join
    val eq = l.join(r, col("k") === col("k2"))
    assert(generates(eq) == 0)
    // conf off: the interval form stays native
    val (v, c) = frames()
    withRuleOff {
      val j = v.join(c, col("user") === col("user2") &&
        col("cts") >= col("vts") &&
        col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
      assert(generates(j) == 0, "kill switch ignored")
    }
  }

  test("q55's manual RangeOps form is tagged: exactly one Generate, never re-binned") {
    val df = Queries.byName("q55_interval_join").fn(spark, "/root/testdata/sf0.001")
    assert(generates(df) == 1,
      "q55 must carry exactly its own binning Generate — tag lost or rule double-binned")
  }

  test("q56 plans through the rewrite: one Generate, bucket equi-key present") {
    val df = Queries.byName("q56_auto_interval_join").fn(spark, "/root/testdata/sf0.001")
    assert(generates(df) == 1, "q56's naive join was not auto-binned")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("__lb") && p.contains("__rb"),
      "bucket columns missing from the rewritten join")
  }

  test("mayHaveBand pre-check: band-free shapes rejected before any canonicalization") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val ts1 = AttributeReference("vts", TimestampType)()
    val ts2 = AttributeReference("cts", TimestampType)()
    val tok = AttributeReference("tok", StringType)()
    val rk  = AttributeReference("rank", IntegerType)()
    val dbl = AttributeReference("lv", DoubleType)()
    // q49's join shape: a string equi-key (+ an int filter conjunct)
    assert(!BinnedIntervalJoin.mayHaveBand(EqualTo(tok, tok)))
    assert(!BinnedIntervalJoin.mayHaveBand(
      And(EqualTo(tok, tok), LessThanOrEqual(rk, Literal(3)))))
    // a single inequality is not a band
    assert(!BinnedIntervalJoin.mayHaveBand(
      And(EqualTo(tok, tok), GreaterThanOrEqual(ts2, ts1))))
    // two inequalities over non-µs-integral types are not a band
    assert(!BinnedIntervalJoin.mayHaveBand(
      And(GreaterThanOrEqual(dbl, Literal(0.0)), LessThan(dbl, Literal(1.0)))))
    // the real band shape passes through to the full analysis
    assert(BinnedIntervalJoin.mayHaveBand(
      And(EqualTo(tok, tok),
        And(GreaterThanOrEqual(ts2, ts1), LessThanOrEqual(ts2, ts1)))))
  }

  test("rule overhead is bounded on band-free plans (q49-shaped)") {
    // q49's regression was ~50 ms per rule invocation before the
    // pre-check; pin the fixed cost well under that with a generous
    // absolute bound that stays stable on a loaded CI host.
    val tf = Seq((1L, "a", 2L), (2L, "b", 1L)).toDF("doc_id", "tok", "tf")
    val df = tf.groupBy("tok").agg(org.apache.spark.sql.functions.count("*").as("df"))
    val shaped = tf.join(df, "tok").filter(col("tf") <= lit(3L))
    val analyzed = shaped.queryExecution.analyzed
    val out = BinnedIntervalJoin(analyzed)
    assert(out eq analyzed, "band-free plan must come back untouched (same instance)")
    val t0 = System.nanoTime()
    (1 to 500).foreach(_ => BinnedIntervalJoin(analyzed))
    val perCall = (System.nanoTime() - t0) / 1e6 / 500
    assert(perCall < 10.0, f"rule costs $perCall%.2f ms per invocation on a band-free join")
  }

  test("naive events join under the rule == RangeOps manual form (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("event_id").as("vid"), col("event_ts").as("vts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("cid"), col("event_ts").as("cts"))
    val naive = v.join(c, col("vu") === col("cu") &&
        col("cts") >= col("vts") &&
        col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
      .select(col("vid"), col("cid"))
    assert(generates(naive) == 1, "rewrite did not fire on the events join")
    val got = naive.as[(Long, Long)].collect().sorted.toSeq
    val want = Queries.byName("q55_interval_join").fn(spark, d)
      .select(col("view_id"), col("click_id")).as[(Long, Long)].collect().sorted.toSeq
    assert(got.nonEmpty && got == want)
  }
}
