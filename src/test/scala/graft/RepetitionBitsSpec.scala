package graft

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 128-bit fingerprint option for the multiset repetition counts
  * (q48): the two-lane struct must reproduce the 64-bit path's counts
  * exactly wherever the 64-bit path is collision-free, h1 must stay
  * byte-identical to `ngram_hash64` (so the wide form is a strict
  * widening, not a different hash), and the conf switch must flip the
  * graded query without changing its answer on the corpus.
  */
class RepetitionBitsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  import spark.implicits._

  /** q48's per-doc metric shape over an arbitrary gram column. */
  private def metrics(docs: DataFrame, gram: Int => org.apache.spark.sql.Column): DataFrame = {
    def gramCounts(n: Int) = docs
      .select(col("doc_id"), explode(gram(n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val a2 = gramCounts(2).groupBy("doc_id")
      .agg(max(col("c")).as("mx"), sum(col("c")).as("tot2"))
    val a3 = gramCounts(3).groupBy("doc_id")
      .agg(sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dupc"),
        sum(col("c")).as("tot3"))
    docs.select(col("doc_id")).join(a2, Seq("doc_id"), "left")
      .join(a3, Seq("doc_id"), "left")
  }

  private def collected(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select("doc_id", "mx", "tot2", "dupc", "tot3")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("64- and 128-bit multiset counts agree on a birthday-scale synthetic corpus") {
    // ~1000 docs x 200 tokens from a 50k-word vocabulary with planted
    // repetition (every 7th token repeats its predecessor) — ~200k
    // 2-/3-gram instances, far past where a weak second lane would show
    val rnd = new scala.util.Random(48)
    val docs = (1L to 1000L).map { id =>
      // a per-doc 5-token phrase repeated 3 times among random filler —
      // its interior 2-/3-grams are genuine in-doc multiset duplicates
      val phrase = (0 until 5).map(j => s"p${id}x$j")
      val toks = new scala.collection.mutable.ArrayBuffer[String](215)
      (0 until 3).foreach { _ =>
        (0 until 60).foreach(_ => toks += s"w${rnd.nextInt(50000)}")
        toks ++= phrase
      }
      (id, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val narrow = collected(metrics(docs, TextOps.ngramHashes(col("text"), _)))
    val wide = collected(metrics(docs, TextOps.ngramHashes128(col("text"), _)))
    assert(narrow == wide)
    // the planted repetition made the metrics non-trivial
    assert(narrow.exists(_._4 > 0), "no duplicate 3-grams — corpus not exercising the multiset")
  }

  test("h1 lane is byte-identical to ngram_hash64; short docs yield empty arrays") {
    val docs = Seq((1L, "a b c a b c"), (2L, "one"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val both = docs.select(col("doc_id"),
        TextOps.ngramHashes(col("text"), 2).as("n64"),
        TextOps.ngramHashes128(col("text"), 2).as("n128"))
      .select(col("doc_id"), col("n64"), col("n128.h1").as("h1"), col("n128.h2").as("h2"))
      .as[(Long, Seq[Long], Seq[Long], Seq[Long])].collect()
    both.foreach { case (id, n64, h1, h2) =>
      assert(n64 == h1, s"doc $id: h1 lane diverged from ngram_hash64")
      assert(n64.size == h2.size)
      // the second lane is a different hash wherever there is content
      if (n64.nonEmpty) assert(n64 != h2, s"doc $id: h2 lane degenerate")
    }
    assert(both.find(_._1 == 2L).get._2.isEmpty) // 1 token < n=2
    assert(both.find(_._1 == 3L).get._2.isEmpty) // null text
  }

  test("q84 composed cascade: every rule fires ALONE on a constructed doc, combos attribute") {
    import spark.implicits._
    val fill = (i: Int) => f"tok$i%02d" // 5-char filler tokens
    val docs = Seq(
      // all five gates pass
      1L -> ((1 to 49).map(fill) :+ "the").mkString(" "),
      // r1 alone: 30 tokens (under the band), everything else clean
      2L -> ((1 to 29).map(fill) :+ "the").mkString(" "),
      // r2 alone: 24 types over 48 tokens, forward+reverse order so no
      // bigram/trigram repeats (top2 = 1/47)
      3L -> { val ts = (1 to 23).map(fill) :+ "the"; (ts ++ ts.reverse).mkString(" ") },
      // r3 alone: no stopword
      4L -> (1 to 50).map(fill).mkString(" "),
      // r4 alone: 2-char tokens, mean length ~2 < 3
      5L -> ((10 to 58).map(_.toString) :+ "the").mkString(" "),
      // r5 alone: clean surface but one bigram dominates (13/55 > 0.2)
      6L -> (((1 to 29).map(fill) :+ "the") ++ Seq.fill(13)(Seq("xx", "yy")).flatten).mkString(" "),
      // r1+r2+r5 combined
      7L -> Seq.fill(15)("the cat").mkString(" "),
      // 1 token: r1+r2+r3+r4; NO n-grams, so the repetition rule must
      // NOT fire on the NULL fractions
      8L -> "hi")
    val dir = java.nio.file.Files.createTempDirectory("cascade-docs")
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextQs.q84.fn(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 4, 5L -> 8,
      6L -> 16, 7L -> 19, 8L -> 15), s"mask attribution diverged: $got")
  }

  test("q48 under fingerprintBits=128 answers identically on the corpus") {
    val d = "/root/testdata/sf0.001"
    def run(): Set[String] =
      Queries.byName("q48_repetition").fn(spark, d)
        .select(concat_ws("|", col("doc_id"), col("top_2gram_frac"),
          col("dup_3gram_frac"), col("keep")))
        .as[String].collect().toSet
    val narrow = run()
    spark.conf.set("spark.graft.repetition.fingerprintBits", "128")
    try assert(run() == narrow)
    finally spark.conf.unset("spark.graft.repetition.fingerprintBits")
  }

  test("q131 perplexity: exact quantized-log values on a hand-computed corpus") {
    import spark.implicits._
    // 3 copies of "a b c" + 1 "x y z": V = 6 distinct unigrams.
    //  - "a b c": c3 = 3, prefix "a b" c2 = 3 → num = 4, den = 9
    //    lq(9) = 3·65536 + 65536//8 = 204800; lq(4) = 131072 → nlp 73728
    //  - "x y z": c3 = 1, c2 = 1 → num = 2, den = 7
    //    lq(7) = 2·65536 + 3·65536//4 = 180224; lq(2) = 65536 → nlp 114688
    // The repeated doc scores LOWER perplexity — the CCNet keep-head.
    val docs = Seq(1L -> "a b c", 2L -> "a b c", 3L -> "a b c", 4L -> "x y z")
    val dir = java.nio.file.Files.createTempDirectory("ppl-docs")
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextQs.q131.fn(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> ((1L, 73728L, 73728L)), 2L -> ((1L, 73728L, 73728L)),
      3L -> ((1L, 73728L, 73728L)), 4L -> ((1L, 114688L, 114688L))),
      s"quantized perplexity diverged: $got")
  }

  test("q131 on the corpus: every doc scored, perplexity strictly positive") {
    val out = graft.queries.TextQs.q131.fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    assert(out.forall(r => r.getLong(3) > 0L))
  }

  test("q133 DSIR: target-aligned docs outrank off-target docs; ranks well-formed") {
    import spark.implicits._
    // Planted separation: en docs use one closed vocabulary, the other
    // lang another — a doc made of target-only features must outweigh a
    // doc made of raw-only features under any add-1 estimate.
    val en = (1L to 6L).map(i => (i, "alpha beta gamma delta alpha beta", "en", "s0", 30L))
    val zh = (7L to 12L).map(i => (i, "omega sigma kappa theta omega sigma", "zh", "s0", 30L))
    val dir = java.nio.file.Files.createTempDirectory("dsir-docs")
    (en ++ zh).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextQs.q133.fn(spark, dir.toString)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    // weights non-increasing down the ranking
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 >= b._3; case _ => true })
    val rankOf = rows.map(r => r._2 -> r._1).toMap
    // every en doc above every zh doc
    assert((1L to 6L).forall(e => (7L to 12L).forall(z => rankOf(e) < rankOf(z))),
      s"target docs not ranked first: $rows")
  }

  test("q135 source quota: exactly K per source, ranked by the shared q129 score") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.TextQs.q135.fn(spark, d)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.size == 20)
    bySrc.values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length) && g.length <= 10)
      // within a source, scores non-increasing down the ranking
      val ordered = g.sortBy(_._2).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    }
    // every kept row's score matches q129's for the same doc
    val q129Scores = graft.queries.TextQs.q129.fn(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.forall { case (_, _, doc, score) => q129Scores(doc) == score })
  }

  test("q136 attribute table: one row per doc, null ppl only below the trigram floor") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j", "en", "s0", 19L),
      (2L, "x y", "zh", "s1", 3L)) // < 3 tokens: no trigram stream
    val dir = java.nio.file.Files.createTempDirectory("attr-docs")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextQs.q136.fn(spark, dir.toString).collect()
    assert(rows.length == 2)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(!byId(1L).isNullAt(7), "doc with trigrams lost its perplexity")
    assert(byId(2L).isNullAt(7), "sub-trigram doc must carry NULL ppl_q")
    // attribute values match their source queries
    val score = graft.ops.TextOps.modelScoresOf(docs.toDF("doc_id", "text", "l", "s", "n")
      .select(col("doc_id"), col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.forall(r => r.getLong(6) == score(r.getLong(0))))
  }

  test("q137 pipeline selection: first-failing-stage attribution, consistent with its stages") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.TextQs.q137.fn(spark, d).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2)))
    assert(rows.length == 500)
    rows.foreach { case (_, reason, keep) => assert(keep == reason.isEmpty) }
    val byReason = rows.groupBy(_._2).map { case (k, v) => k -> v.size }
    info(s"attribution: $byReason")
    assert(byReason.getOrElse(None, 0) > 0, "pipeline kept nothing")
    assert(byReason.contains(Some("duplicate")) && byReason.contains(Some("cascade")))
    // precedence: every q36 doc_b is attributed duplicate regardless of
    // what later stages would have said
    val dups = graft.queries.DedupQs.q36.fn(spark, d)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    val attributed = rows.filter(r => dups.contains(r._1)).map(_._2).toSet
    assert(attributed == Set(Some("duplicate")), s"dedup lost precedence: $attributed")
  }

  test("q133 on the corpus: 100 selected, deterministic") {
    def run() = graft.queries.TextQs.q133.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val first = run()
    assert(first.length == 100)
    assert(run() == first)
  }
}
