package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q92 ordered-recurrence shape on constructed data: the in-group
  * sorted fold must match a hand-computed sequential EWMA regardless of
  * input partitioning or arrival order — the property that makes a
  * non-associative recurrence safely distributable (sorting inside the
  * group, not relying on any delivery order).
  */
class RecurrenceSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  /** q92's fold over constructed (user, event_id, us, qx) rows. */
  private def ewma(rows: Seq[(Long, Long, Long, Long)], parts: Int): Map[Long, Long] = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "us", "qx").repartition(parts)
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("us"), col("event_id"), col("qx"))))
        .as("__evs"))
      .select(col("user_id"), expr(
        "aggregate(slice(__evs, 2, size(__evs)), __evs[0].qx," +
          " (acc, e) -> (30 * e.qx + 70 * acc) div 100)").as("ewma_q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def reference(xs: Seq[Long]): Long =
    xs.tail.foldLeft(xs.head)((acc, x) => (30 * x + 70 * acc) / 100)

  test("sorted fold matches the sequential reference; order and partitioning invariant") {
    val rnd = new scala.util.Random(31)
    val byUser = (1L to 5L).map { u =>
      u -> (1 to 40).map(i => (u * 1000 + i, i * 10L, rnd.nextInt(1 << 21).toLong))
    }.toMap
    val rows = rnd.shuffle(byUser.toSeq.flatMap { case (u, es) =>
      es.map { case (id, us, qx) => (u, id, us, qx) }
    })
    val expected = byUser.map { case (u, es) => u -> reference(es.map(_._3)) }
    assert(ewma(rows, 1) == expected)
    assert(ewma(rows, 7) == expected, "fold depended on partitioning")
  }

  test("single event returns its own value; equal timestamps break ties on event_id") {
    // u1: one event. u2: two events at the SAME us — event_id order decides
    // which is the init and which folds in (2001 first, 2002 second)
    val out = ewma(Seq(
      (1L, 1001L, 5L, 42L),
      (2L, 2002L, 9L, 100L), (2L, 2001L, 9L, 200L)), 3)
    assert(out(1L) == 42L)
    assert(out(2L) == (30 * 100 + 70 * 200) / 100)
  }
}
