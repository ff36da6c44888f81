package graft

import graft.ops.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning (TextOps.bpeMerges): the replace-semantics merge
  * contract against the literal string-replace reference (the thing the
  * DuckDB oracle executes), the full learner against an in-memory
  * reference fold, and the classic Sennrich example.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(124)

  /** The contract's ground truth: one `String.replace` pass over the
    * space-joined form (Java replace = non-overlapping left-to-right,
    * same as DuckDB's). */
  private def replaceRef(syms: Seq[String], l: String, r: String): Seq[String] =
    (" " + syms.mkString(" ") + " ")
      .replace(s" $l $r ", s" ${l + r} ")
      .trim.split(" ").toSeq.filter(_.nonEmpty)

  test("mergePair equals the string-replace reference, incl. run-parity corners") {
    val cases = Seq(
      (Seq("a", "a", "a", "a"), "a", "a"),            // textbook greedy would differ
      (Seq("a", "a", "a", "a", "a"), "a", "a"),
      (Seq("a", "b", "a", "b", "a", "b"), "a", "b"),
      (Seq("a", "ab"), "a", "a"),                     // false-prefix must NOT match
      (Seq("x", "a", "b"), "a", "b"),                 // match at end
      (Seq("a", "b"), "a", "b"),                      // whole word
      (Seq("a", "b", "x", "a", "b"), "a", "b"))       // disjoint matches
    cases.foreach { case (syms, l, r) =>
      assert(TextOps.mergePair(syms, l, r) == replaceRef(syms, l, r),
        s"mergePair($syms, $l, $r)")
    }
    (1 to 200).foreach { _ =>
      val syms = Seq.fill(rnd.nextInt(8) + 1)(("a" + ('a' + rnd.nextInt(2)).toChar).substring(rnd.nextInt(2)))
      val l = syms(rnd.nextInt(syms.length)); val r = syms(rnd.nextInt(syms.length))
      assert(TextOps.mergePair(syms, l, r) == replaceRef(syms, l, r),
        s"mergePair($syms, $l, $r)")
    }
  }

  /** In-memory reference learner using the same contract. */
  private def bpeRef(words: Map[String, Long], rounds: Int): Seq[(Int, String, String, Long)] = {
    var seg: Map[Seq[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toSeq: Seq[String] }(_._2)(_ + _)
    (1 to rounds).flatMap { r =>
      val pairs = seg.toSeq.flatMap { case (syms, cnt) =>
        syms.zip(syms.drop(1)).map(p => (p, cnt))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (pairs.isEmpty) None
      else {
        val ((l, ri), w) = pairs.minBy { case ((a, b), wt) => (-wt, a, b) }
        seg = seg.toSeq.map { case (syms, cnt) => (replaceRef(syms, l, ri), cnt) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        Some((r, l, ri, w))
      }
    }
  }

  private def learned(words: Map[String, Long], rounds: Int): Seq[(Int, String, String, Long)] =
    TextOps.bpeMerges(words.toSeq.toDF("w", "cnt"), "w", "cnt", rounds)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq

  test("the Sennrich example learns ('e','s') first; full table matches the reference") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = learned(words, 4)
    assert(got.head == ((1, "e", "s", 9L)), s"first merge: $got")
    assert(got == bpeRef(words, 4), s"got $got vs ${bpeRef(words, 4)}")
  }

  test("random vocabularies match the reference at every round count") {
    (1 to 3).foreach { _ =>
      val words = (1 to 12).map { _ =>
        val len = rnd.nextInt(5) + 1
        (Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString, rnd.nextLong(9) + 1)
      }.toMap
      (1 to 5).foreach { k =>
        assert(learned(words, k) == bpeRef(words, k), s"words=$words k=$k")
      }
    }
  }

  test("early exit when the vocabulary runs out of pairs") {
    val got = learned(Map("ab" -> 3L), 5)
    assert(got == Seq((1, "a", "b", 3L)), s"$got")
  }
}
