package graft

import graft.ops.FunnelOps
import org.scalatest.funsuite.AnyFunSuite

/** Strict-sequence funnel semantics on constructed data — every
  * out-of-order shape the corpus-graded q88 can't isolate:
  * pre-view clicks, skipped steps, conversions before the prior step.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  private def run(rows: Seq[(Long, String, Long)]): Map[Int, (Long, Option[Long])] = {
    import spark.implicits._
    FunnelOps.funnel(rows.toDF("user_id", "event_type", "ts_us"),
      Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getInt(0) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
  }

  test("full conversion counts each step once, at the earliest valid event") {
    // u1: view@10, click@20 (and a later one@25 that must not count),
    // purchase@30 → lags 10 and 20 from the first view
    val out = run(Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "click", 25L),
      (1L, "purchase", 30L)))
    assert(out(1) == (1L, Some(0L)))
    assert(out(2) == (1L, Some(10L)))
    assert(out(3) == (1L, Some(20L)))
  }

  test("events before the prior step's satisfying event do not count") {
    // u2: clicks only BEFORE its first view → step 2 unreached;
    // u3: purchase after view but with no click at all → steps 2,3 unreached;
    // u4: purchase BETWEEN view and click → steps 1,2 only
    val out = run(Seq(
      (2L, "click", 5L), (2L, "click", 8L), (2L, "view", 10L),
      (3L, "view", 10L), (3L, "purchase", 15L),
      (4L, "view", 10L), (4L, "purchase", 15L), (4L, "click", 20L)))
    assert(out(1)._1 == 3L)
    assert(out(2) == (1L, Some(10L))) // only u4's click@20
    assert(out(3) == (0L, None))      // sum over no converters is SQL-null
  }

  test("simultaneous timestamps are strictly ordered out, per the > contract") {
    val out = run(Seq((5L, "view", 10L), (5L, "click", 10L)))
    assert(out(2)._1 == 0L)
  }

  test("a user with no step-1 event contributes to no step") {
    val out = run(Seq((6L, "click", 1L), (6L, "purchase", 2L)))
    assert(out(1)._1 == 0L && out(2)._1 == 0L && out(3)._1 == 0L)
  }
}
