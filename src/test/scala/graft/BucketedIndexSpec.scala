package graft

import scala.jdk.CollectionConverters._

import graft.ops.{DedupOps, TextOps}
import graft.streaming.{DocStream, VecStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** The resident streaming index is hash-bucketed into partition dirs so a
  * micro-batch reads ONLY the bucket directories its probe keys land in
  * — these specs pin that the pruning is real at the FILE level (the
  * scan's `numFiles` metric equals the on-disk file count of the
  * selected buckets, not the index total) and that per-batch cost stays
  * FLAT when the index grows outside the probed buckets.
  */
class BucketedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  // ---- plan/file accounting helpers -------------------------------------

  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: QueryStageExec => fileScans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    // a cached relation's file scan lives in cachedPlan, not children
    case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      fileScans(m.relation.cachedPlan)
    case other => other.children.flatMap(fileScans)
  }

  /** Files the scans of `df`'s executed plan actually read (driver-side
    * `numFiles` metric, set at file listing — i.e. AFTER partition
    * pruning). Call only after an action has run. */
  private def filesRead(df: DataFrame): Long =
    fileScans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum

  /** Parquet data files on disk under `dir`, recursively. */
  private def diskFiles(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.iterator().asScala.count(f => f.toString.endsWith(".parquet")).toLong
      finally s.close()
    }
  }

  private def withBuckets[A](nb: Int)(body: => A): A = {
    val prev = spark.conf.getOption(DocStream.BucketsConfKey)
    spark.conf.set(DocStream.BucketsConfKey, nb.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(DocStream.BucketsConfKey, v)
      case None => spark.conf.unset(DocStream.BucketsConfKey)
    }
  }

  /** Deterministic filler text: `n` "words" drawn from a seeded stream —
    * enough distinct 5-grams to shingle. */
  private def text(rnd: scala.util.Random, n: Int = 12): String =
    Seq.fill(n)(s"w${rnd.nextInt(100000)}").mkString(" ")

  // ---- mechanism pin: residentSlice reads only its buckets' files -------

  test("one-bucket index read lists only that bucket's files") {
    import spark.implicits._
    withBuckets(8) {
      val root = java.nio.file.Files.createTempDirectory("bucketed-bands")
      val indexDir = s"$root/index"
      val rnd = new scala.util.Random(11)
      DocStream.seedIndex(
        (1L to 30L).map(i => (i, text(rnd))).toDF("doc_id", "text"), indexDir)

      val total = diskFiles(s"$indexDir/bands")
      assert(total >= 8, s"seed produced only $total band files")
      // a bucket that exists on disk (8 buckets, 480 band rows: all do)
      val b = 3
      val one = diskFiles(s"$indexDir/bands/gen=0/bucket=$b")
      assert(one > 0 && one < total)

      val slice = graft.streaming.IndexLayout.residentSlice(spark, indexDir, "bands", 0L, Seq(b))
      val rows = slice.collect()
      assert(rows.nonEmpty, "bucket slice read no rows")
      assert(filesRead(slice) == one,
        s"scan read ${filesRead(slice)} files, bucket=$b holds $one")

      // two buckets → exactly the union of the two dirs
      val two = graft.streaming.IndexLayout.residentSlice(spark, indexDir, "bands", 0L, Seq(1, 3))
      two.collect()
      val expect = diskFiles(s"$indexDir/bands/gen=0/bucket=1") + one
      assert(filesRead(two) == expect)

      // empty bucket list → nothing listed, nothing read
      val none = graft.streaming.IndexLayout.residentSlice(spark, indexDir, "bands", 0L, Seq.empty)
      assert(none.count() == 0)
    }
  }

  test("vector index one-bucket read lists only that bucket's files") {
    import spark.implicits._
    withBuckets(16) {
      val root = java.nio.file.Files.createTempDirectory("bucketed-vecs")
      val indexDir = s"$root/index"
      val rnd = new scala.util.Random(13)
      val corpus = (0L until 200L)
        .map(i => (i, Array.fill(8)(rnd.nextFloat())))
        .toDF("vec_id", "embedding")
      VecStream.seedIndex(corpus, indexDir)

      val total = diskFiles(s"$indexDir/vectors")
      // centroids are ids {0,50,100,150} → cells bucket to {0,2,4,6}
      val one = diskFiles(s"$indexDir/vectors/gen=0/bucket=2")
      assert(one > 0 && one < total)
      val slice = graft.streaming.IndexLayout.residentSlice(spark, indexDir, "vectors", 0L, Seq(2))
      assert(slice.collect().nonEmpty)
      assert(filesRead(slice) == one,
        s"scan read ${filesRead(slice)} files, bucket=2 holds $one")
    }
  }

  test("a stream cold-starts from an EMPTY seed corpus and dedups as it grows") {
    import spark.implicits._
    withBuckets(8) {
      val root = java.nio.file.Files.createTempDirectory("bucketed-cold")
      val (indexDir, outDir) = (s"$root/index", s"$root/out")
      DocStream.seedIndex(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), indexDir)
      val textA = "the quick brown fox jumps over the lazy dog again and again"
      // batch 0 against the EMPTY index: everything is new
      DocStream.admitBatch(
        Seq((1L, textA)).toDF("doc_id", "text"), indexDir, outDir, 0L)
      // batch 1: the admitted doc is now resident
      DocStream.admitBatch(
        Seq((2L, textA)).toDF("doc_id", "text"), indexDir, outDir, 1L)
      val got = spark.read.parquet(s"$outDir/admissions")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
      assert(got == Map(1L -> "new", 2L -> "dup_corpus"), s"got $got")
    }
  }

  test("VecStream refuses an empty seed — frozen centroids are the cell geometry") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vec-cold")
    val ex = intercept[IllegalArgumentException] {
      VecStream.seedIndex(
        Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
        s"$root/index")
    }
    assert(ex.getMessage.contains("centroid"))
  }

  // ---- end-to-end flat cost: probe batches against a growing index ------

  test("probe batches read a CONSTANT file set while the index grows elsewhere") {
    import spark.implicits._
    withBuckets(256) {
      val nb = 256
      val root = java.nio.file.Files.createTempDirectory("bucketed-flat")
      val (indexDir, outDir) = (s"$root/index", s"$root/out")
      val rnd = new scala.util.Random(17)
      DocStream.seedIndex(
        (1L to 20L).map(i => (i, text(rnd))).toDF("doc_id", "text"), indexDir)

      // the probe doc: same id+text every probe batch — admitted once,
      // dup_corpus ever after, so the probed buckets never grow again
      val probeId = 9001L
      val probeText = text(new scala.util.Random(99))
      def bandBuckets(docs: DataFrame): Map[Long, Set[Int]] =
        DedupOps.minhashBands(
            docs.select(col("doc_id"), TextOps.shingleHashes(col("text")).as("shingles")),
            "doc_id", numPerm = 64, bands = 16)
          .groupBy("doc_id")
          .agg(collect_set(pmod(col("band_hash"), lit(nb)).cast("int")).as("bs"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
      def idBucket(ids: Seq[Long]): Map[Long, Int] =
        ids.toDF("doc_id")
          .select(col("doc_id"), pmod(xxhash64(col("doc_id")), lit(nb.toLong)).cast("int").as("b"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

      val probeDf = Seq((probeId, probeText)).toDF("doc_id", "text")
      val pBuckets = bandBuckets(probeDf)(probeId)
      val pIdBucket = idBucket(Seq(probeId))(probeId)
      assert(pBuckets.size <= 16 && pBuckets.nonEmpty)

      // filler docs whose band buckets AND id bucket are disjoint from the
      // probe's — growth that provably lands outside every probed dir
      val candIds = (20000L until 20400L).toSeq
      val candPairs = candIds.map(i => (i, text(rnd)))
      val fillerText = candPairs.toMap
      val candBand = bandBuckets(candPairs.toDF("doc_id", "text"))
      val candId = idBucket(candIds)
      val fillers = candIds.filter(i =>
        candBand.get(i).exists(bs => bs.intersect(pBuckets).isEmpty) &&
        candId(i) != pIdBucket)
      assert(fillers.size >= 50, s"only ${fillers.size} disjoint fillers harvested")

      // capture every file scan of the index dirs, per admitBatch call
      val scanLog = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
      val listener = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          try fileScans(qe.executedPlan).foreach { s =>
            val roots = s.relation.location.rootPaths.map(_.toString).mkString(",")
            if (roots.contains(root.toString))
              scanLog.add(roots -> s.metrics("numFiles").value)
          } catch { case _: Throwable => () }
        override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
      }
      // the listener bus is async: wait until no new scan event has
      // arrived for 1.2s before attributing events to a batch
      def quiesce(): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        var lastSize = scanLog.size
        var lastChange = System.currentTimeMillis()
        while (System.currentTimeMillis() - lastChange < 1200) {
          if (System.currentTimeMillis() > deadline)
            throw new RuntimeException("listener bus never quiesced")
          Thread.sleep(50)
          val n = scanLog.size
          if (n != lastSize) { lastSize = n; lastChange = System.currentTimeMillis() }
        }
      }
      case class Measure(bands: Long, shingles: Long, secs: Double)
      spark.listenerManager.register(listener)
      try {
        def run(batchId: Long, rows: Seq[(Long, String)]): Measure = {
          quiesce()
          val before = scanLog.size
          val t0 = System.nanoTime()
          DocStream.admitBatch(rows.toDF("doc_id", "text"), indexDir, outDir, batchId)
          val secs = (System.nanoTime() - t0) / 1e9
          quiesce()
          val events = scanLog.asScala.toSeq.drop(before)
          Measure(
            events.filter(_._1.contains("/bands")).map(_._2).sum,
            events.filter(_._1.contains("/shingles")).map(_._2).sum,
            secs)
        }
        run(0L, Seq(probeId -> probeText)) // admit the probe
        val growthA = fillers.take(25).map(i => i -> fillerText(i))
        val growthB = fillers.slice(25, 50).map(i => i -> fillerText(i))
        run(1L, growthA)
        val p2 = run(2L, Seq(probeId -> probeText))
        run(3L, growthB)
        val p4 = run(4L, Seq(probeId -> probeText))

        // verdicts sane: the probe is dup_corpus on every later batch
        val verdicts = spark.read.parquet(s"$outDir/admissions")
          .filter(col("doc_id") === probeId)
          .select(col("batch_id").cast("long"), col("status"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(verdicts(0L) == "new" && verdicts(2L) == "dup_corpus" &&
          verdicts(4L) == "dup_corpus")

        // FLAT COST: the index grew by 50 admitted docs between probe 2
        // and probe 4, all of it outside the probed buckets — the probe's
        // index reads must be file-for-file identical
        assert(p2.bands > 0, "probe read no band files — pruning pin is vacuous")
        assert(p4.bands == p2.bands,
          s"band files read grew ${p2.bands} -> ${p4.bands} though growth was outside the probed buckets")
        assert(p4.shingles == p2.shingles,
          s"shingle files read grew ${p2.shingles} -> ${p4.shingles}")

        // and the reads are a strict minority of the (grown) index
        val totalBands = diskFiles(s"$indexDir/bands")
        assert(p4.bands < totalBands / 2,
          s"probe read ${p4.bands} of $totalBands band files — pruning not material")

        // wall-clock stays flat too (generous bound: later batches are
        // post-JIT, so growth is the only way this trips)
        assert(p4.secs <= 3.0 * math.max(p2.secs, 1.0),
          f"probe wall time grew ${p2.secs}%.2fs -> ${p4.secs}%.2fs")
      } finally spark.listenerManager.unregister(listener)
    }
  }
}
