package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.IncrAttrTable
import graft.streaming.DocStream

/** The FUSED admission+tagging loop ([[IncrAttrTable.ingestBatch]] /
  * [[graft.streaming.IngestStream]]): one transaction classifies, tags
  * the survivors, and appends — where composing [[DocStream]] then the
  * tagging loop pays two band probes and two index writes per batch.
  * Pins: (1) the fused loop's admitted attribute table equals
  * DocStream-admission followed by batch tagging of the admitted docs,
  * statuses included; (2) one micro-batch runs exactly ONE resident
  * band probe; (3) replay converges; (4) a zero-survivor batch commits
  * verdicts and nothing else.
  */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  import spark.implicits._

  private def doc(id: Long, text: String, lang: String = "en",
      source: String = "web"): (Long, String, String, String, Long) =
    (id, text, lang, source, text.length.toLong)

  private def df(rows: Seq[(Long, String, String, String, Long)]): DataFrame =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private def baseText(seed: String): String =
    (1 to 40).map(i => s"$seed$i the a").mkString(" ")
      .split(" ").take(40).mkString(" ")

  private def freshRoot(): String = {
    val r = java.nio.file.Files.createTempDirectory("ingest").toString
    java.nio.file.Files.delete(java.nio.file.Paths.get(r))
    r
  }

  // two batches with every admission class represented: 4/5 are
  // within-batch near-dups (5 drops), 7 near-dups 1 across batches
  // (drops), the rest are new
  private val t1 = baseText("a")
  private val t4 = baseText("d")
  private val batch0 = Seq(
    doc(1L, t1), doc(2L, baseText("b")), doc(3L, baseText("c")),
    doc(4L, t4), doc(5L, (t4.split(" ").dropRight(1) :+ "x").mkString(" ")))
  private val batch1 = Seq(
    doc(6L, baseText("f")),
    doc(7L, (t1.split(" ").dropRight(1) :+ "y").mkString(" ")),
    doc(8L, baseText("h")), doc(9L, baseText("i")))

  test("fused admitted-attrs equal DocStream admission followed by batch tagging") {
    val fusedRoot = freshRoot()
    IncrAttrTable.ingestBatch(spark, fusedRoot, df(batch0), batchId = 0L)
    IncrAttrTable.ingestBatch(spark, fusedRoot, df(batch1), batchId = 1L)

    // the composed pipeline: DocStream admission over its own index...
    val base = java.nio.file.Files.createTempDirectory("ingest-composed")
    val (indexDir, outDir) = (s"$base/index", s"$base/out")
    DocStream.seedIndex(
      spark.emptyDataFrame.select(lit(0L).as("doc_id"), lit("").as("text"))
        .filter(lit(false)), indexDir)
    DocStream.admitBatch(df(batch0).select("doc_id", "text"), indexDir, outDir, 0L)
    DocStream.admitBatch(df(batch1).select("doc_id", "text"), indexDir, outDir, 1L)
    val verdicts = spark.read.parquet(s"$outDir/admissions")
      .select("doc_id", "status", "batch_id")
      .as[(Long, String, Long)].collect().toSet

    // statuses match DocStream's exactly
    val fusedVerdicts = spark.read.parquet(s"$fusedRoot/admissions")
      .select("doc_id", "status", "batch_id")
      .as[(Long, String, Long)].collect().toSet
    assert(fusedVerdicts == verdicts,
      s"fused statuses diverged:\nfused   : $fusedVerdicts\ncomposed: $verdicts")
    assert(verdicts.exists(_._2 == "dup_batch") &&
      verdicts.exists(_._2 == "dup_corpus"), s"fixture too weak: $verdicts")

    // ...then the tagging loop over ONLY the admitted docs
    val taggedRoot = freshRoot()
    val admitted = verdicts.collect { case (id, "new", b) => (id, b) }
    Seq(batch0, batch1).zipWithIndex.foreach { case (b, k) =>
      IncrAttrTable.appendBatch(spark, taggedRoot,
        df(b.filter(r => admitted.contains((r._1, k.toLong)))), batchId = k.toLong)
    }
    def table(root: String): Seq[String] =
      spark.read.parquet(s"$root/attrs")
        .select("doc_id", "lang", "source", "n_chars", "n_tokens", "n_feats",
          "score", "ppl_q", "fail_mask", "is_dup", "batch_id")
        .orderBy("doc_id").collect().map(_.toString).toSeq
    val (f, c) = (table(fusedRoot), table(taggedRoot))
    assert(f == c, s"fused attrs diverged:\nfused   : $f\ncomposed: $c")
    // and only the admitted docs were tagged
    assert(f.size == admitted.size)
  }

  test("fused loop with the quality gate matches DocStream's low_quality precedence") {
    // threshold at the batch's median score so the gate actually drops
    val scores = graft.ops.TextOps.modelScoresOf(df(batch0))
      .select("score").as[Long].collect().sorted
    val m = scores(scores.length / 2)
    spark.conf.set(DocStream.MinScoreConfKey, m.toString)
    try {
      val fusedRoot = freshRoot()
      IncrAttrTable.ingestBatch(spark, fusedRoot, df(batch0), batchId = 0L)
      val base = java.nio.file.Files.createTempDirectory("ingest-gate")
      val (indexDir, outDir) = (s"$base/index", s"$base/out")
      DocStream.seedIndex(
        spark.emptyDataFrame.select(lit(0L).as("doc_id"), lit("").as("text"))
          .filter(lit(false)), indexDir)
      DocStream.admitBatch(df(batch0).select("doc_id", "text"), indexDir, outDir, 0L)
      val want = spark.read.parquet(s"$outDir/admissions")
        .select("doc_id", "status").as[(Long, String)].collect().toSet
      val got = spark.read.parquet(s"$fusedRoot/admissions")
        .select("doc_id", "status").as[(Long, String)].collect().toSet
      assert(got == want, s"gated statuses diverged: $got vs $want")
      assert(want.exists(_._2 == "low_quality"), s"gate inert: $want")
      // gated docs are not tagged
      val taggedIds = spark.read.parquet(s"$fusedRoot/attrs")
        .select("doc_id").as[Long].collect().toSet
      assert(taggedIds == want.collect { case (id, "new") => id })
    } finally spark.conf.unset(DocStream.MinScoreConfKey)
  }

  test("one micro-batch runs exactly ONE resident band probe") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        fileScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        fileScans(m.relation.cachedPlan)
      case other => other.children.flatMap(fileScans)
    }
    val root = freshRoot()
    IncrAttrTable.ingestBatch(spark, root, df(batch0), batchId = 0L)
    // "one shared probe" = every consumer of the resident band relation
    // references the SAME physical scan instance (materialized once into
    // the persisted candidate relation) — so the pin counts DISTINCT
    // scan-node identities across the batch's actions, which is immune
    // to cache-recipe re-appearances in later plans
    val scans = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        try fileScans(qe.executedPlan).foreach { sc =>
          val roots = sc.relation.location.rootPaths.map(_.toString)
          if (roots.exists(_.contains(s"$root/index/bands/")))
            scans.add((s"[$fn]", System.identityHashCode(sc)))
        } catch { case _: Throwable => () }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      IncrAttrTable.ingestBatch(spark, root, df(batch1), batchId = 1L)
      val deadline = System.currentTimeMillis() + 60000
      var (lastSize, lastChange) = (scans.size, System.currentTimeMillis())
      while (System.currentTimeMillis() - lastChange < 1200) {
        if (System.currentTimeMillis() > deadline)
          throw new RuntimeException("listener bus never quiesced")
        Thread.sleep(50)
        if (scans.size != lastSize) {
          lastSize = scans.size; lastChange = System.currentTimeMillis()
        }
      }
      import scala.jdk.CollectionConverters._
      val bandScans = scans.asScala.toSeq
      assert(bandScans.nonEmpty, "probe never touched the resident bands")
      val distinctScans = bandScans.map(_._2).toSet
      assert(distinctScans.size == 1,
        s"expected ONE shared resident band probe, saw ${distinctScans.size} " +
          s"distinct scan instances across: $bandScans")
    } finally spark.listenerManager.unregister(listener)
  }

  test("IngestStream drives ingestBatch: streamed build equals the direct-call build") {
    val base = java.nio.file.Files.createTempDirectory("ingest-stream")
    val streamDir = s"$base/stream"
    def writeShard(rows: Seq[(Long, String, String, String, Long)],
        name: String, mtime: Long): Unit = {
      val tmp = s"$base/tmp-$name"
      df(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(streamDir))
      val dst = java.nio.file.Paths.get(s"$streamDir/$name.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeShard(batch0, "shard-0", now - 60000)
    writeShard(batch1, "shard-1", now - 30000)
    val streamRoot = s"$base/stream-artifact"
    graft.streaming.IngestStream.start(spark, streamDir, streamRoot)
      .awaitTermination()

    val directRoot = freshRoot()
    IncrAttrTable.ingestBatch(spark, directRoot, df(batch0), batchId = 0L)
    IncrAttrTable.ingestBatch(spark, directRoot, df(batch1), batchId = 1L)
    def dump(root: String, rel: String, cols: Seq[String]): Seq[String] =
      spark.read.parquet(s"$root/$rel").select(cols.map(col): _*)
        .orderBy(cols.map(col): _*).collect().map(_.toString).toSeq
    assert(dump(streamRoot, "admissions", Seq("doc_id", "status", "batch_id")) ==
      dump(directRoot, "admissions", Seq("doc_id", "status", "batch_id")))
    assert(dump(streamRoot, "attrs", Seq("doc_id")).nonEmpty)
    assert(
      spark.read.parquet(s"$streamRoot/attrs").orderBy("doc_id")
        .collect().map(_.toString).toSeq ==
      spark.read.parquet(s"$directRoot/attrs").orderBy("doc_id")
        .collect().map(_.toString).toSeq)
  }

  test("replaying a batch converges; a zero-survivor batch commits verdicts only") {
    val root = freshRoot()
    IncrAttrTable.ingestBatch(spark, root, df(batch0), batchId = 0L)
    val before = spark.read.parquet(s"$root/attrs")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    // replay of batch 0 (at-least-once delivery): byte-identical state
    IncrAttrTable.ingestBatch(spark, root, df(batch0), batchId = 0L)
    val after = spark.read.parquet(s"$root/attrs")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(after == before, "replay did not converge")
    // a batch of pure dups: every doc near-dups an admitted resident
    val dupBatch = Seq(
      doc(50L, (t1.split(" ").dropRight(1) :+ "z").mkString(" ")),
      doc(51L, (t4.split(" ").dropRight(1) :+ "w").mkString(" ")))
    IncrAttrTable.ingestBatch(spark, root, df(dupBatch), batchId = 1L)
    val verdicts = spark.read.parquet(s"$root/admissions")
      .filter(col("batch_id") === 1L)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(verdicts == Map(50L -> "dup_corpus", 51L -> "dup_corpus"), verdicts.toString)
    // no attrs partition, no index slices for batch 1 — but the batch IS
    // committed: a later batch appends normally (no sweep, no re-seed)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"${IncrAttrTable.liveRelDir(spark, root, "attrs")}/batch_id=1")))
    val lmBefore = spark.read.parquet(s"$root/lm")
      .orderBy("gram_order", "gram").collect().map(_.toString).toSeq
    IncrAttrTable.ingestBatch(spark, root, df(Seq(doc(60L, baseText("q")))),
      batchId = 2L)
    val attrs = spark.read.parquet(s"$root/attrs")
      .select("doc_id", "batch_id").as[(Long, Long)].collect().toSet
    assert(attrs.map(_._1).contains(60L))
    assert(!attrs.exists(_._2 == 1L))
    val lmAfter = spark.read.parquet(s"$root/lm")
      .orderBy("gram_order", "gram").collect().map(_.toString).toSeq
    assert(lmAfter == lmBefore, "a later batch re-seeded the frozen LM")
  }

  test("language gate: wrong_lang precedence, fused equals composed, nothing indexed") {
    // the CCNet order at the admission boundary: lang-id (q150's graded
    // classifier, one definition) gates FIRST; rejected docs are never
    // scored, classified, or indexed. The allow-list is derived from the
    // classifier itself so the fixture cannot drift: allow the majority
    // prediction, expect the minority to read wrong_lang in BOTH loops.
    val all = df(batch0 ++ batch1)
    val preds = graft.ops.TextOps.langIdScoresOf(all)
      .select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    val majority = preds.values.groupBy(identity).maxBy(_._2.size)._1
    val expectWrong = preds.filter(_._2 != majority).keySet
    assert(expectWrong.nonEmpty && expectWrong.size < preds.size,
      s"fixture too weak: preds $preds")

    spark.conf.set(DocStream.LangAllowConfKey, majority)
    try {
      val fusedRoot = freshRoot()
      IncrAttrTable.ingestBatch(spark, fusedRoot, df(batch0), batchId = 0L)
      IncrAttrTable.ingestBatch(spark, fusedRoot, df(batch1), batchId = 1L)
      val fused = spark.read.parquet(s"$fusedRoot/admissions")
        .select("doc_id", "status").as[(Long, String)].collect().toMap

      val base = java.nio.file.Files.createTempDirectory("ingest-lang")
      val (indexDir, outDir) = (s"$base/index", s"$base/out")
      DocStream.seedIndex(
        spark.emptyDataFrame.select(lit(0L).as("doc_id"), lit("").as("text"))
          .filter(lit(false)), indexDir)
      DocStream.admitBatch(df(batch0).select("doc_id", "text"), indexDir, outDir, 0L)
      DocStream.admitBatch(df(batch1).select("doc_id", "text"), indexDir, outDir, 1L)
      val composed = spark.read.parquet(s"$outDir/admissions")
        .select("doc_id", "status").as[(Long, String)].collect().toMap

      assert(fused == composed,
        s"lang-gated fused/composed diverged:\n$fused\n$composed")
      expectWrong.foreach { id =>
        assert(fused(id) == "wrong_lang", s"doc $id: ${fused(id)}")
      }
      // wrong_lang docs are tagged as nothing (the eligibility anti-join
      // excludes them from shingling, so they also never enter the
      // index — the same mechanism the low_quality tests already pin)
      val attrs = spark.read.parquet(s"$fusedRoot/attrs")
        .select("doc_id").as[Long].collect().toSet
      assert(attrs.intersect(expectWrong).isEmpty,
        "a wrong_lang doc got an attribute row")
      assert(attrs.nonEmpty, "fixture too weak: nothing admitted at all")
    } finally spark.conf.unset(DocStream.LangAllowConfKey)
  }

  test("streamed context windows equal q146's batch answer over the admitted docs") {
    // the round-17 verdict's ask #7: q146 gets an incremental expression
    // — each ingest transaction emits the admitted docs' windows (ONE
    // shared definition, TextOps.contextWindowsOf), and because windows
    // are per-doc local, the union of per-batch shards must equal the
    // batch chunking of the admitted corpus, byte for byte
    val root = freshRoot()
    spark.conf.set(IncrAttrTable.EmitWindowsKey, "true")
    try {
      IncrAttrTable.ingestBatch(spark, root, df(batch0), batchId = 0L)
      IncrAttrTable.ingestBatch(spark, root, df(batch1), batchId = 1L)
    } finally spark.conf.unset(IncrAttrTable.EmitWindowsKey)
    val cols = Seq("doc_id", "win_id", "start_pos", "win_tokens", "window_text")
    val streamed = spark.read.parquet(
        s"${IncrAttrTable.liveRelDir(spark, root, "windows")}")
      .select(cols.map(col): _*)
      .as[(Long, Int, Int, Int, String)].collect().toSet
    val admitted = spark.read.parquet(s"$root/admissions")
      .filter(col("status") === "new").select("doc_id")
    val batchAnswer = graft.ops.TextOps.contextWindowsOf(
        df(batch0).unionByName(df(batch1)).join(admitted, "doc_id"))
      .select(cols.map(col): _*)
      .as[(Long, Int, Int, Int, String)].collect().toSet
    assert(streamed.nonEmpty && streamed == batchAnswer,
      s"streamed windows diverged from the batch chunking " +
        s"(streamed ${streamed.size}, batch ${batchAnswer.size})")
    // a doc long enough to chunk produced MULTIPLE overlapping windows
    assert(streamed.groupBy(_._1).exists(_._2.size > 1), "fixture too weak")
    // default-off: a fresh root ingested without the flag writes none
    val quiet = freshRoot()
    IncrAttrTable.ingestBatch(spark, quiet, df(batch0), batchId = 0L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$quiet/windows")),
      "window emission ran without the conf flag")
  }
}
