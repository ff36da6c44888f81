package graft

import graft.ops.ScdOps
import org.scalatest.funsuite.AnyFunSuite

/** [[ScdOps.history]] on constructed change streams — the constructed-data
  * twin of q94's oracle grade: run collapsing, half-open interval tiling,
  * NULL-gap semantics, tiebreak order, and per-key independence.
  */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  private def hist(rows: Seq[(Long, Long, Long, java.lang.Long)]) = {
    import spark.implicits._
    ScdOps.history(rows.toDF("k", "ord", "tie", "v"), "k", "ord", "tie", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3), r.getLong(4)))
      .toSet
  }

  private def L(x: Long): java.lang.Long = Long.box(x)

  test("runs collapse to one interval each; intervals tile; last is open") {
    // key 1 observes A A B B A: three runs
    val got = hist(Seq(
      (1L, 10L, 0L, L(7)), (1L, 20L, 0L, L(7)), (1L, 30L, 0L, L(8)),
      (1L, 40L, 0L, L(8)), (1L, 50L, 0L, L(7))))
    assert(got == Set(
      (1L, 7L, 10L, L(30L), 1L),
      (1L, 8L, 30L, L(50L), 2L),
      (1L, 7L, 50L, null, 3L)))
  }

  test("NULL observations are gaps, not run splits") {
    // A NULL A is ONE run: missed polls don't fabricate a version
    val got = hist(Seq(
      (1L, 10L, 0L, L(7)), (1L, 20L, 0L, null), (1L, 30L, 0L, L(7)),
      (1L, 40L, 0L, L(9))))
    assert(got == Set((1L, 7L, 10L, L(40L), 1L), (1L, 9L, 40L, null, 2L)))
  }

  test("tiebreak column orders equal-ord observations") {
    // same ord, tie decides: v goes 5 then 6 -> two versions from ord 10
    val got = hist(Seq((1L, 10L, 1L, L(5)), (1L, 10L, 2L, L(6))))
    assert(got == Set((1L, 5L, 10L, L(10L), 1L), (1L, 6L, 10L, null, 2L)))
  }

  test("keys are independent and single-observation keys get one open version") {
    val got = hist(Seq(
      (1L, 10L, 0L, L(7)), (1L, 20L, 0L, L(8)),
      (2L, 15L, 0L, L(7))))
    assert(got == Set(
      (1L, 7L, 10L, L(20L), 1L), (1L, 8L, 20L, null, 2L),
      (2L, 7L, 15L, null, 1L)))
  }

  test("result is input-partitioning invariant") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i % 5, i, 0L, L(i % 3)))
    val df1 = ScdOps.history(rows.toDF("k", "ord", "tie", "v").repartition(1),
      "k", "ord", "tie", "v")
    val df7 = ScdOps.history(rows.toDF("k", "ord", "tie", "v").repartition(7),
      "k", "ord", "tie", "v")
    assert(df1.collect().toSet == df7.collect().toSet)
  }
}
