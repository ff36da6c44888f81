package graft

import java.time.LocalDate

import graft.ops.MovieOps
import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants (SURVEY.md §5), sampled with a seeded
  * generator (the scalatest-scalacheck bridge artifact isn't in the
  * offline dependency set, so sampling is hand-rolled): month ranges
  * tile the interval with no gaps or overlaps; checkpoint save/load is
  * an identity.
  */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("month ranges tile [month-start(from), to] with no gaps or overlaps (500 samples)") {
    val lo = LocalDate.of(1990, 1, 1).toEpochDay
    val hi = LocalDate.of(2030, 12, 31).toEpochDay
    (1 to 500).foreach { _ =>
      val from = LocalDate.ofEpochDay(lo + rnd.nextLong(hi - lo))
      val to = from.plusDays(rnd.nextLong(1000))
      val ranges = MovieOps.monthRanges(from.toString, to.toString)
      assert(ranges.nonEmpty)
      // first snaps to the 1st of from's month; last ends exactly at `to`
      assert(ranges.head._1 == from.withDayOfMonth(1).toString)
      assert(ranges.last._2 == to.toString)
      // each range stays within one month and starts on the 1st
      ranges.foreach { case (s, e) =>
        val sd = LocalDate.parse(s); val ed = LocalDate.parse(e)
        assert(!sd.isAfter(ed))
        assert(sd.getDayOfMonth == 1)
        assert(sd.getMonth == ed.getMonth && sd.getYear == ed.getYear)
      }
      // consecutive ranges are adjacent days (no gap, no overlap)
      ranges.sliding(2).foreach {
        case Seq((_, e), (s2, _)) =>
          assert(LocalDate.parse(e).plusDays(1) == LocalDate.parse(s2))
        case _ =>
      }
    }
  }

  test("checkpoint save/load roundtrips arbitrary month keys (100 samples)") {
    (1 to 100).foreach { _ =>
      val keys = Seq.fill(rnd.nextInt(10))(rnd.alphanumeric.take(rnd.nextInt(30)).mkString)
      val cp = java.nio.file.Files.createTempDirectory("pcp").resolve("cp.json").toString
      MovieOps.saveCheckpoint(cp, keys)
      assert(MovieOps.loadCheckpoint(cp) == keys)
    }
  }
}
