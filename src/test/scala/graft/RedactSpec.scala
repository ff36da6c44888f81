package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII redaction on realistic free-form text — the coverage the graded
  * q64 (synthetic planted PII, engine parity) deliberately leaves here.
  */
class RedactSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  private def redactAll(ss: String*): Seq[String] = {
    import spark.implicits._
    ss.toDF("text").select(TextOps.redact(col("text")).as("r"))
      .collect().map(_.getString(0)).toSeq
  }

  test("emails mask, including plus-tags, dots, and mid-sentence position") {
    assert(redactAll(
      "write to alice.smith+spam@corp.example.org today",
      "two: a@b.io and long.name_99%x@sub.domain.co, done") == Seq(
      "write to <EMAIL> today",
      "two: <EMAIL> and <EMAIL>, done"))
  }

  test("urls mask greedily to whitespace; an address inside a url is url") {
    assert(redactAll(
      "see https://a.b/c?d=e&f=g#h and http://plain then text",
      "profile https://x.example/u/someone@else.com trailing") == Seq(
      "see <URL> and <URL> then text",
      "profile <URL> trailing"))
  }

  test("strict international phones mask; bare national numbers do not") {
    assert(redactAll(
      "call +1-555-0199 or +44-207-9460000 now",
      "short 555-1234 stays, ext +1-555-12 stays (too short)") == Seq(
      "call <PHONE> or <PHONE> now",
      "short 555-1234 stays, ext +1-555-12 stays (too short)"))
  }

  test("text without PII passes through byte-identical") {
    val s = "key agg row scan slow fast table value part hash"
    assert(redactAll(s) == Seq(s))
  }

  test("stage-ordered counts match the masks they precede") {
    import spark.implicits._
    val row = Seq("x https://h.io/a@b.cd mail c@d.ee tel +1-555-0000 y")
      .toDF("text")
      .withColumn("n_url", TextOps.matchCount(col("text"), TextOps.UrlRe))
      .withColumn("s1", TextOps.redactOne(col("text"), TextOps.UrlRe, "<URL>"))
      .withColumn("n_email", TextOps.matchCount(col("s1"), TextOps.EmailRe))
      .withColumn("s2", TextOps.redactOne(col("s1"), TextOps.EmailRe, "<EMAIL>"))
      .withColumn("n_phone", TextOps.matchCount(col("s2"), TextOps.PhoneRe))
      .withColumn("clean", TextOps.redact(col("text")))
      .select("n_url", "n_email", "n_phone", "clean").head()
    assert(row.getLong(0) == 1L) // the a@b.cd rides inside the url
    assert(row.getLong(1) == 1L)
    assert(row.getLong(2) == 1L)
    assert(row.getString(3) == "x <URL> mail <EMAIL> tel <PHONE> y")
  }
}
