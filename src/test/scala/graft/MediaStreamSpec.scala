package graft

import graft.ops.MultimodalOps
import graft.streaming.MediaStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming media-admission loop ([[graft.streaming.MediaStream]]):
  * (1) the real AvailableNow stream reproduces the direct two-batch
  * admission statuses (q154's graded semantics); (2) replay of a batch
  * id is idempotent (foreachBatch is at-least-once); (3) the resident
  * rule is SURVIVOR-only — a doc near only a DROPPED earlier doc is
  * `new`; (4) compaction preserves classification; (5) identical
  * content never accretes in the index (one surviving fingerprint).
  */
class MediaStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  /** Planted 9×8 BMPs on the controlled-bit-flip grid (the
    * MultimodalSpec dHash convention): a dip to 45 at (3, y) flips
    * exactly bit y·8+2 of the all-ones gradient hash. */
  private def grad(x: Int, y: Int) = 10 + 20 * x
  private def dips(ys: Int*): Array[Byte] =
    graft.queries.MultimodalQs.bmpOf(9, 8,
      (x, y) => if (x == 3 && ys.contains(y)) 45 else grad(x, y))

  private def mediaDf(rows: Seq[(Long, Array[Byte])]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, b) => (id, "image", s"mem://$id.bmp", b) }
      .toDF("media_id", "kind", "uri", "bytes")
  }

  private def statuses(outDir: String): Map[Long, (String, Long)] =
    spark.read.parquet(s"$outDir/admissions")
      .select(col("media_id"), col("status"), col("batch_id").cast("long"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap

  test("survivor-resident rule: near only a DROPPED earlier doc => new; replay is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("media-admit").toString
    val indexDir = s"$root/index"
    val outDir = s"$root/out"
    // a = gradient (hash H), a' = one flip (Hamming 1 from a),
    // b = four flips INCLUDING a''s (Hamming 4 from a, 3 from a')
    val a = dips() // no dips
    val aPrime = dips(2)
    val bDoc = dips(2, 3, 4, 5)
    assert(java.lang.Long.bitCount(
      MultimodalOps.perceptualHash64(a) ^ MultimodalOps.perceptualHash64(bDoc)) == 4)
    assert(java.lang.Long.bitCount(
      MultimodalOps.perceptualHash64(aPrime) ^ MultimodalOps.perceptualHash64(bDoc)) == 3)

    MediaStream.seedIndex(mediaDf(Nil), indexDir) // empty cold start
    MediaStream.admitBatch(mediaDf(Seq(1L -> a, 2L -> aPrime)), indexDir, outDir, 0L)
    MediaStream.admitBatch(mediaDf(Seq(11L -> bDoc)), indexDir, outDir, 1L)
    val got = statuses(outDir)
    assert(got(1L) == ("new", 0L))
    assert(got(2L) == ("dup_batch", 0L), "lower-id near neighbor in-batch")
    // b is within radius of a' ONLY — but a' was dropped, never indexed:
    // you cannot duplicate a payload the corpus rejected
    assert(got(11L) == ("new", 1L),
      s"survivor-resident rule violated: ${got(11L)}")

    // replay batch 1 with the same batch_id: byte-identical state
    def state(): (Map[Long, (String, Long)], Long) = {
      val idxRows = spark.read.parquet(
        graft.streaming.IndexLayout.dataDir(spark, indexDir, "fingerprints")).count()
      (statuses(outDir), idxRows)
    }
    val before = state()
    MediaStream.admitBatch(mediaDf(Seq(11L -> bDoc)), indexDir, outDir, 1L)
    assert(state() == before, "replay changed on-disk state")
    // ...and b did not classify against its own replayed index rows
    assert(statuses(outDir)(11L) == ("new", 1L), "replay self-dup")
  }

  test("the AvailableNow stream reproduces direct admission; compaction preserves classification") {
    val root = java.nio.file.Files.createTempDirectory("media-stream").toString
    val streamDir = s"$root/in"
    // three single-file triggers: a texture corpus with designed dups
    def tex(x: Int, y: Int) = (x * 3 + y * 2) % 200 + 20
    def texBmp = graft.queries.MultimodalQs.bmpOf(64, 48, tex)
    val f1 = Seq(1L -> dips(), 2L -> dips(2))            // new, dup_batch
    val f2 = Seq(3L -> texBmp, 4L -> dips())             // new, dup_corpus (copy of 1)
    val f3 = Seq(5L -> texBmp.clone(), 6L -> dips(2, 5)) // dup_corpus (copy of 3), dup_corpus (Hamming 2 from survivor 1)
    def writeShard(rows: Seq[(Long, Array[Byte])], name: String, mtime: Long): Unit = {
      val tmp = s"$root/tmp-$name"
      mediaDf(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(streamDir))
      val dst = java.nio.file.Paths.get(s"$streamDir/$name.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val now = System.currentTimeMillis()
    writeShard(f1, "f1", now - 60000)
    writeShard(f2, "f2", now - 40000)
    writeShard(f3, "f3", now - 20000)

    def runLoop(tag: String, compactBetween: Boolean): Map[Long, String] = {
      val indexDir = s"$root/$tag/index"
      val outDir = s"$root/$tag/out"
      MediaStream.seedIndex(mediaDf(Nil), indexDir)
      MediaStream.start(spark, streamDir, indexDir, outDir).awaitTermination()
      if (compactBetween) MediaStream.compactIndex(spark, indexDir)
      // a later invocation resumes the checkpoint: nothing new => no-op
      MediaStream.start(spark, streamDir, indexDir, outDir).awaitTermination()
      statuses(outDir).map { case (id, (st, _)) => id -> st }
    }
    val plain = runLoop("plain", compactBetween = false)
    assert(plain(1L) == "new" && plain(3L) == "new")
    assert(plain(2L) == "dup_batch")
    assert(plain(4L) == "dup_corpus", s"id 4 (byte copy of survivor 1): ${plain(4L)}")
    assert(plain(5L) == "dup_corpus", s"id 5 (byte copy of survivor 3): ${plain(5L)}")
    assert(plain(6L) == "dup_corpus", s"id 6 (Hamming 2 from survivor 1): ${plain(6L)}")
    // compaction between invocations changes layout, never answers
    assert(runLoop("compacted", compactBetween = true) == plain)
  }

  test("identical content never accretes: one surviving fingerprint per hash") {
    val root = java.nio.file.Files.createTempDirectory("media-blanks").toString
    val indexDir = s"$root/index"
    val outDir = s"$root/out"
    val blank = graft.queries.MultimodalQs.bmpOf(9, 8, (_, _) => 0)
    MediaStream.seedIndex(mediaDf(Nil), indexDir)
    // 50 byte-identical blanks across two batches: exactly ONE is
    // admitted, the index holds its 4 band rows and nothing else —
    // the q153 degeneracy structurally cannot build up
    MediaStream.admitBatch(
      mediaDf((1L to 25L).map(_ -> blank.clone())), indexDir, outDir, 0L)
    MediaStream.admitBatch(
      mediaDf((26L to 50L).map(_ -> blank.clone())), indexDir, outDir, 1L)
    val got = statuses(outDir)
    assert(got(1L)._1 == "new")
    assert((2L to 25L).forall(got(_)._1 == "dup_batch"))
    assert((26L to 50L).forall(got(_)._1 == "dup_corpus"))
    val idxRows = spark.read.parquet(
      graft.streaming.IndexLayout.dataDir(spark, indexDir, "fingerprints"))
    assert(idxRows.count() == 4L, "index accreted identical fingerprints")
    assert(idxRows.select("media_id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }
}
