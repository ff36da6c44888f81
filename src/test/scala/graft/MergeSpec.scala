package graft

import graft.ops.MergeOps
import org.scalatest.funsuite.AnyFunSuite

/** [[MergeOps.applyChanges]] arm semantics on constructed snapshots —
  * the constructed-data twin of q101's oracle grade. */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  private def snap(rows: (Long, String, java.lang.Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "name", "bal")
  }
  private def ch(rows: (Long, String, java.lang.Double, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "name", "bal", "__op")
  }
  private def run(s: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame): Set[(Long, String, Option[Double])] =
    MergeOps.applyChanges(s, c, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

  test("update replaces, insert adds, delete removes, untouched passes through") {
    val got = run(
      snap((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)),
      ch((1L, "a2", 11.0, "U"), (3L, null, null, "D"), (9L, "new", 90.0, "U")))
    assert(got == Set(
      (1L, "a2", Some(11.0)), (2L, "b", Some(20.0)), (9L, "new", Some(90.0))))
  }

  test("a NULL payload in an upsert WINS (nulls the field, no stale fallback)") {
    val got = run(snap((1L, "a", 10.0)), ch((1L, "a", null, "U")))
    assert(got == Set((1L, "a", None)))
  }

  test("delete of an absent key is a no-op (idempotent replay)") {
    val got = run(snap((1L, "a", 10.0)), ch((7L, null, null, "D")))
    assert(got == Set((1L, "a", Some(10.0))))
  }

  test("column contract is enforced") {
    import spark.implicits._
    val bad = Seq((1L, "x", "U")).toDF("k", "name", "__op") // missing bal
    val e = intercept[IllegalArgumentException] {
      MergeOps.applyChanges(snap((1L, "a", 1.0)), bad, Seq("k"))
    }
    assert(e.getMessage.contains("changes columns"))
  }

  test("an unrecognized op code fails loudly instead of silently deleting") {
    val e = intercept[Exception] {
      run(snap((1L, "a", 10.0)), ch((1L, "a2", 11.0, "I")))
    }
    assert(e.getMessage != null && e.toString.contains("unknown op") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown op")),
      s"expected the op-validation error, got: $e")
  }

  test("empty changeset is the identity; result is partitioning-invariant") {
    val s = snap((1L, "a", 1.0), (2L, "b", 2.0))
    assert(run(s, ch()) == Set((1L, "a", Some(1.0)), (2L, "b", Some(2.0))))
    val c = ch((1L, "z", 9.0, "U"), (2L, null, null, "D"))
    assert(run(s.repartition(7), c.repartition(3)) == run(s, c))
  }
}
