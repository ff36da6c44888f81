package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.IncrAttrTable

/** Incremental attribute tagging ([[graft.pipeline.IncrAttrTable]], graded
  * end-to-end as q142): batches tag against frozen artifacts only, so the
  * spec pins exactly the properties the incremental path could get wrong —
  * the LM really is frozen at seed (not re-derived per batch), unseen
  * grams take the add-1 backoff, cross-batch near-dups are caught through
  * the resident index, earlier batches never retro-flip, and the
  * selection plan over the artifact touches no `documents` relation.
  */
class IncrAttrSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  import spark.implicits._

  /** The fixed-point integer log2 both engines share (TextQs.lqSparkSql's
    * value semantics): lq(x) = e·2^16 + (x − 2^e)·2^16 div 2^e. */
  private def lq(x: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    e.toLong * 65536L + ((x - (1L << e)) * 65536L) / (1L << e)
  }

  private def doc(id: Long, text: String, lang: String = "en",
      source: String = "web"): (Long, String, String, String, Long) =
    (id, text, lang, source, text.length.toLong)

  private def df(rows: Seq[(Long, String, String, String, Long)]): DataFrame =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  // a 40-token base text (passes the cascade's token-count gate) with
  // distinct-enough vocabulary; suffix words perturb near-dup variants
  private def baseText(seed: String): String =
    (1 to 40).map(i => s"$seed$i the a").mkString(" ")
      .split(" ").take(40).mkString(" ")

  private def freshRoot(): String = {
    val r = java.nio.file.Files.createTempDirectory("incr-attrs").toString
    java.nio.file.Files.delete(java.nio.file.Paths.get(r))
    r
  }

  test("frozen LM: identical later text scores the seed ppl; unseen vocabulary scores lq(V)") {
    val root = freshRoot()
    val seedTxt = "alpha beta gamma delta epsilon zeta eta theta"
    val seed = df(Seq(doc(1L, seedTxt), doc(2L, "alpha beta gamma iota kappa")))
    IncrAttrTable.appendBatch(spark, root, seed)
    // batch 2: doc 10 repeats seed text verbatim; doc 11 is fully unseen
    val unseen = (1 to 6).map(i => s"zulu$i").mkString(" ")
    IncrAttrTable.appendBatch(spark, root,
      df(Seq(doc(10L, seedTxt), doc(11L, unseen))))
    val attrs = spark.read.parquet(s"$root/attrs")
      .select("doc_id", "ppl_q").as[(Long, java.lang.Long)].collect().toMap
    // frozen LM: the identical text must score exactly the seed doc's ppl
    assert(attrs(10L) == attrs(1L),
      s"frozen-LM ppl drifted for identical text: ${attrs(10L)} vs ${attrs(1L)}")
    // fully-unseen grams: every trigram has c3 = 0, c2 = 0, so
    // nlp = lq(0 + V) - lq(0 + 1) = lq(V) and ppl_q = lq(V) exactly.
    val v = spark.read.parquet(s"$root/lm")
      .filter(col("gram_order") === 1).count()
    assert(attrs(11L) == lq(v),
      s"backoff ppl for unseen vocab: got ${attrs(11L)}, want lq($v) = ${lq(v)}")
    // and the LM artifact itself must not have grown past its seed counts
    val lmGrams = spark.read.parquet(s"$root/lm")
      .filter(col("gram_order") === 1).select("gram").as[String].collect().toSet
    assert(!lmGrams.exists(_.startsWith("zulu")), "LM absorbed a later batch")
  }

  test("cross-batch near-dup flags the later doc through the resident index; earlier rows never flip") {
    val root = freshRoot()
    val a = baseText("w")
    val seed = df(Seq(doc(1L, a), doc(2L, baseText("q"))))
    IncrAttrTable.appendBatch(spark, root, seed)
    val afterSeed = spark.read.parquet(s"$root/attrs")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    // doc 10 near-dups doc 1 (one token changed of 40 → J well above 0.8);
    // docs 20/21 are within-batch duplicates of each other
    val nearA = (a.split(" ").dropRight(1) :+ "changed").mkString(" ")
    val b = baseText("x")
    IncrAttrTable.appendBatch(spark, root,
      df(Seq(doc(10L, nearA), doc(20L, b), doc(21L, b))))
    val attrs = spark.read.parquet(s"$root/attrs")
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(attrs(10L), "cross-batch near-dup not flagged")
    assert(!attrs(20L) && attrs(21L),
      s"within-batch keep-first expected (20 keeps, 21 dups): $attrs")
    assert(!attrs(1L) && !attrs(2L), "an earlier doc retro-flipped")
    // byte-stability of the already-written rows
    val seedRowsNow = spark.read.parquet(s"$root/attrs")
      .filter(col("doc_id") <= 2).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(seedRowsNow == afterSeed, "appending mutated earlier rows")
  }

  test("q142 on a planted dir: selection over the incremental artifact, no documents scan") {
    val dir = java.nio.file.Files.createTempDirectory("incr-corpus")
    // ids 1..9 → mid = 5: docs 1-5 seed, 6-9 increment; doc 8 near-dups
    // doc 3 across the split
    val t3 = baseText("m")
    val near3 = (t3.split(" ").dropRight(1) :+ "tail").mkString(" ")
    df(Seq(
      doc(1L, baseText("a")), doc(2L, baseText("b")), doc(3L, t3),
      doc(4L, baseText("d")), doc(5L, baseText("e")), doc(6L, baseText("f")),
      doc(7L, baseText("g")), doc(8L, near3), doc(9L, baseText("i"))))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sel = Queries.byName("q142_incremental_attrs").fn(spark, dir.toString)
    val rows = sel.select("doc_id", "drop_reason")
      .as[(Long, Option[String])].collect().toMap
    assert(rows(8L).contains("duplicate"), s"cross-split dup not attributed: $rows")
    assert(rows(3L).isEmpty || !rows(3L).contains("duplicate"),
      "keep-first inverted: the LOWER-id partner was dropped")
    // the selection's plan reads the artifact only — no documents relation
    val plan = IncrAttrTable.materialized(spark, dir.toString)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents"),
      s"selection plan still scans documents:\n$plan")
  }
}
