package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's t1 smoke contract: `SparkEntry.entry` must return rows
  * on sf0.001, and every registered oracle has a query (and vice versa
  * where declared).
  */
class SmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are unique and stable") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q\\d+[a-z0-9_]*")))
  }

  test("README's surface inventory count matches the registry") {
    // The README count drifted twice (rounds 11 and 12); pin it so a
    // new query without the doc update fails loudly at land time.
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    val m = "(\\d+) named queries".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README.md no longer states the named-query count")
    assert(m.get.group(1).toInt == Queries.all.size,
      s"README says ${m.get.group(1)} queries, registry has ${Queries.all.size} — update README.md")
  }
}
