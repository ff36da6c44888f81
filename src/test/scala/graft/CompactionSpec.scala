package graft

import scala.jdk.CollectionConverters._

import graft.streaming.{DocStream, IndexLayout, VecStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Index compaction ([[IndexLayout.compact]]): fold the per-batch
  * partitions the admission loop accrues into one file per bucket of the
  * next generation, swap the `_gen` pointer atomically, GC the old
  * generation — without changing a single row the readers see or
  * breaking the admission loop's idempotence afterwards.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  private def withBuckets[A](nb: Int)(body: => A): A = {
    val prev = spark.conf.getOption(DocStream.BucketsConfKey)
    spark.conf.set(DocStream.BucketsConfKey, nb.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(DocStream.BucketsConfKey, v)
      case None => spark.conf.unset(DocStream.BucketsConfKey)
    }
  }

  private def parquetFiles(dir: String): Seq[java.nio.file.Path] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else {
      val s = java.nio.file.Files.walk(p)
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq
      finally s.close()
    }
  }

  private def text(rnd: scala.util.Random, n: Int = 12): String =
    Seq.fill(n)(s"w${rnd.nextInt(100000)}").mkString(" ")

  test("compaction preserves every index row, folds buckets to one file, GCs the old gen") {
    import spark.implicits._
    withBuckets(8) {
      val root = java.nio.file.Files.createTempDirectory("compact-doc")
      val (indexDir, outDir) = (s"$root/index", s"$root/out")
      val rnd = new scala.util.Random(23)
      DocStream.seedIndex(
        (1L to 20L).map(i => (i, text(rnd))).toDF("doc_id", "text"), indexDir)
      // two admitting batches -> bucket dirs accumulate batch_id={-1,0,1}
      val batch0 = (101L to 110L).map(i => (i, text(rnd)))
      DocStream.admitBatch(batch0.toDF("doc_id", "text"),
        indexDir, outDir, batchId = 0L)
      DocStream.admitBatch(
        (201L to 210L).map(i => (i, text(rnd))).toDF("doc_id", "text"),
        indexDir, outDir, batchId = 1L)

      def slice(rel: String) =
        IndexLayout.residentSlice(spark, indexDir, rel, Long.MaxValue, 0 until 8)
      def rows(rel: String): Set[Seq[Any]] =
        slice(rel).select("doc_id", "band_idx", "band_hash")
          .collect().map(_.toSeq).toSet
      val bandsBefore = rows("bands")
      val shinglesBefore = slice("shingles").count()
      val filesBefore = parquetFiles(s"$indexDir/bands").size
      assert(filesBefore > 8,
        s"admissions should have accrued >1 file per bucket, got $filesBefore")

      DocStream.compactIndex(spark, indexDir)

      assert(IndexLayout.gen(spark, indexDir) == 1L)
      // reader-visible rows byte-identical
      assert(rows("bands") == bandsBefore)
      assert(slice("shingles").count() == shinglesBefore)
      // one file per populated bucket dir, old generation gone
      val files = parquetFiles(s"$indexDir/bands")
      assert(files.forall(_.toString.contains("gen=1")), "old generation not GCed")
      val perBucket = files.groupBy(_.getParent.getParent) // bucket=B/batch_id=-1/file
      assert(perBucket.values.forall(_.size == 1),
        s"expected one file per bucket, got ${perBucket.view.mapValues(_.size).toMap}")
      assert(files.size <= 8 && files.size < filesBefore)

      // the admission loop keeps working against the compacted index:
      // a dup of a batch-0 admission is still dup_corpus, and replay of
      // the new batch stays idempotent
      val dupOfAdmitted = spark.read.parquet(s"$outDir/admissions")
        .filter(col("status") === "new" && col("batch_id") === 0).select("doc_id")
        .collect().map(_.getLong(0)).head
      val probe = Seq(
        (900L, batch0.toMap.apply(dupOfAdmitted)), // dup of an admitted doc
        (901L, text(new scala.util.Random(777)))) // fresh
        .toDF("doc_id", "text")
      DocStream.admitBatch(probe, indexDir, outDir, batchId = 2L)
      DocStream.admitBatch(probe, indexDir, outDir, batchId = 2L) // replay
      val verdicts = spark.read.parquet(s"$outDir/admissions")
        .filter(col("batch_id") === 2)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
      assert(verdicts == Map(900L -> "dup_corpus", 901L -> "new"),
        s"post-compaction classification broke: $verdicts")
    }
  }

  test("vector index compaction preserves rows and admission keeps classifying") {
    import spark.implicits._
    withBuckets(16) {
      val root = java.nio.file.Files.createTempDirectory("compact-vec")
      val (indexDir, outDir) = (s"$root/index", s"$root/out")
      val rnd = new scala.util.Random(29)
      def vec(): Array[Float] = Array.fill(8)(rnd.nextFloat())
      val seedVecs = (0L until 200L).map(i => (i, vec()))
      VecStream.seedIndex(seedVecs.toDF("vec_id", "embedding"), indexDir)
      val fresh = (300L until 320L).map(i => (i, vec()))
      VecStream.admitBatch(fresh.toDF("vec_id", "embedding"), indexDir, outDir, 0L)

      def allRows() =
        IndexLayout.residentSlice(spark, indexDir, "vectors", Long.MaxValue, 0 until 16)
          .select("id", "cell").collect().map(_.toSeq).toSet
      val before = allRows()
      VecStream.compactIndex(spark, indexDir)
      assert(IndexLayout.gen(spark, indexDir) == 1L)
      assert(allRows() == before)

      // an exact copy of a seed vector must classify dup_corpus against
      // the compacted index
      val probe = Seq((900L, seedVecs(7)._2), (901L, Array.fill(8)(-1f)))
        .toDF("vec_id", "embedding")
      VecStream.admitBatch(probe, indexDir, outDir, 1L)
      val verdicts = spark.read.parquet(s"$outDir/admissions")
        .filter(col("batch_id") === 1)
        .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("status")).toMap
      assert(verdicts(900L) == "dup_corpus", s"got $verdicts")
    }
  }

  test("maybeCompactIndex fires only past the dirs-per-bucket pressure threshold") {
    import spark.implicits._
    withBuckets(4) { // small nb: every batch lands in every bucket fast
      val root = java.nio.file.Files.createTempDirectory("compact-trigger")
      val (indexDir, outDir) = (s"$root/index", s"$root/out")
      val rnd = new scala.util.Random(31)
      DocStream.seedIndex(
        (1L to 10L).map(i => (i, text(rnd))).toDF("doc_id", "text"), indexDir)
      def admit(id: Long, batchId: Long): Unit =
        DocStream.admitBatch(Seq((id, text(rnd))).toDF("doc_id", "text"),
          indexDir, outDir, batchId)
      // after 2 admits a bucket holds at most 3 batch dirs (-1, 0, 1):
      // not past a threshold of 3
      admit(101L, 0L); admit(102L, 1L)
      assert(!DocStream.maybeCompactIndex(spark, indexDir, maxDirsPerBucket = 3))
      assert(IndexLayout.gen(spark, indexDir) == 0L)
      // a third admit pushes some bucket to 4 dirs -> trigger fires once
      admit(103L, 2L)
      assert(DocStream.maybeCompactIndex(spark, indexDir, maxDirsPerBucket = 3))
      assert(IndexLayout.gen(spark, indexDir) == 1L)
      // freshly compacted: single batch_id=-1 dir per bucket, quiet again
      assert(!DocStream.maybeCompactIndex(spark, indexDir, maxDirsPerBucket = 3))
      assert(IndexLayout.gen(spark, indexDir) == 1L)
    }
  }

  test("streamed invocations resume correctly across a compaction") {
    // the maintenance-window contract end to end: AvailableNow run ->
    // compact between invocations -> second run on the SAME checkpoint
    // classifies against the compacted index and reprocesses nothing
    import spark.implicits._
    withBuckets(8) {
      val root = java.nio.file.Files.createTempDirectory("compact-stream")
      val (streamDir, indexDir, outDir) =
        (s"$root/stream", s"$root/index", s"$root/out")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(streamDir))
      val corpusText = "the quick brown fox jumps over the lazy dog again and again"
      val freshA = "purple monkeys deliver seventeen umbrellas to the northern lighthouse keeper"
      val freshB = "quantum turbines hum beneath the ancient observatory during winter storms"
      DocStream.seedIndex(Seq((1L, corpusText)).toDF("doc_id", "text"), indexDir)

      def runBatch(file: String, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$root/$file")
        val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/$file"))
          .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
        java.nio.file.Files.move(part,
          java.nio.file.Paths.get(s"$streamDir/$file.parquet"))
        val q = DocStream.start(spark, streamDir, indexDir, outDir,
          maxFilesPerTrigger = 10)
        q.awaitTermination(120000)
      }

      runBatch("b0", Seq((9001L, corpusText), (9002L, freshA)))
      DocStream.compactIndex(spark, indexDir) // between invocations
      runBatch("b1", Seq((9103L, freshA), (9104L, freshB)))

      val rows = spark.read.parquet(s"$outDir/admissions")
        .select(col("doc_id"), col("status"), col("batch_id").cast("long"))
        .collect()
      assert(rows.length == 4, s"expected 4 admission rows, got ${rows.length}")
      val got = rows.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(got == Map(
        9001L -> ("dup_corpus", 0L), // vs the seed
        9002L -> ("new", 0L),        // admitted, then compacted into gen 1
        9103L -> ("dup_corpus", 1L), // vs the COMPACTED 9002 row
        9104L -> ("new", 1L)))
    }
  }
}
