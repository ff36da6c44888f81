package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.ops.MovieOps
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the reference's paged discover feed
  * (movie.py:145-182, S1): one `InputPartition` per page file, so pages
  * read in parallel across executors instead of the reference's serial
  * loop. The reliability operators ride along as source options:
  *
  *  - `pageDelayMs`  — polite per-page rate limit (C2, movie.py:147,180)
  *  - `maxRetries` / `backoffBaseMs` — exponential-backoff retry around
  *    each page read (C1, movie.py:98-129)
  *  - `flakyEveryN`  — deterministic fault injection for tests: every
  *    Nth page read fails once before succeeding
  *
  * Pages are JSON-lines files of raw movie payloads (`page-*.json`) —
  * the live-HTTP transport is an I/O concern outside query semantics;
  * swapping the file read for an HTTP GET changes only [[readPageLines]].
  *
  * Usage: `spark.read.format("graft.sources.PagedJsonSource")
  *   .option("dir", …).load()` — schema is the fixed raw discover schema.
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedTable.schemaFor(options.getBoolean("withOrdinals", false))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

final class PagedTable(options: Map[String, String]) extends Table with SupportsRead {
  private val withOrdinals = options.get("withOrdinals").exists(_.toBoolean)
  override def name(): String = s"paged_json(${options.getOrElse("dir", "?")})"
  override def schema(): StructType = PagedTable.schemaFor(withOrdinals)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PagedTable.schemaFor(withOrdinals)
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val dir = options.getOrElse("dir",
          throw new IllegalArgumentException("option 'dir' is required"))
        // Hadoop FileSystem listing (driver-side), so the page window can
        // live on any scheme — file:, hdfs:, s3a: — like Spark's own scans
        val pages = graft.ops.Fs.list(dir, graft.ops.Fs.defaultConf)
          .filter(s => s.isFile && s.getPath.getName.startsWith("page-") &&
            s.getPath.getName.endsWith(".json"))
          .sortBy(_.getPath.getName)
          .toArray
        // the reference's 500-page window cap LOGS its data loss
        // (movie.py:161-171) — a silently truncated window is
        // indistinguishable from a complete one downstream
        val maxPages = options.getOrElse("maxPages", Int.MaxValue.toString).toInt
        val kept =
          if (pages.length > maxPages) {
            PagedTable.logOverflow(dir, pages.length, maxPages)
            pages.take(maxPages)
          } else pages
        kept.zipWithIndex.map { case (f, i) =>
          PagePartition(f.getPath.toString, i): InputPartition
        }
      }
      override def createReaderFactory(): PartitionReaderFactory = {
        val delay = options.getOrElse("pageDelayMs", "0").toLong
        val retries = options.getOrElse("maxRetries", "3").toInt
        val backoff = options.getOrElse("backoffBaseMs", "1").toLong
        val flaky = options.getOrElse("flakyEveryN", "0").toInt
        val maxHint = options.getOrElse("maxRetryAfterMs", "60000").toLong
        PagedReaderFactory(delay, retries, backoff, flaky, maxHint, withOrdinals)
      }
    }
}

object PagedTable {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[PagedTable])

  /** With `withOrdinals=true` the schema gains `_page`/`_row` — the
    * fetch/page ordinals a keep-first dedup needs to reproduce the
    * reference's `drop_duplicates(keep='first')` (movie.py:276) when
    * duplicate payloads differ across pages.
    */
  def schemaFor(withOrdinals: Boolean): StructType =
    if (!withOrdinals) MovieOps.RawSchema
    else MovieOps.RawSchema
      .add("_page", org.apache.spark.sql.types.IntegerType)
      .add("_row", org.apache.spark.sql.types.IntegerType)

  /** Overflow events, keyed by dir — test-visible mirror of the log line
    * (same spirit as [[PagedReader.failedOnce]]). */
  val overflows: java.util.concurrent.ConcurrentHashMap[String, Int] =
    new java.util.concurrent.ConcurrentHashMap()

  private[sources] def logOverflow(dir: String, found: Int, cap: Int): Unit = {
    overflows.put(dir, found - cap)
    log.warn(s"window '$dir' hit the $cap-page cap: ${found - cap} of $found " +
      s"pages DROPPED — results beyond the cap are lost (reference movie.py:161-171)")
  }
}

final case class PagePartition(path: String, index: Int) extends InputPartition

/** The transport's 429 analog (movie.py:113-121): the page is
  * rate-limited and the server may have said how long to wait.
  */
final class RateLimitedException(msg: String, val retryAfterMs: Option[Long])
  extends java.io.IOException(msg)

final case class PagedReaderFactory(
    pageDelayMs: Long, maxRetries: Int, backoffBaseMs: Long, flakyEveryN: Int,
    maxRetryAfterMs: Long = 60000L, withOrdinals: Boolean = false)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[PagePartition]
    new PagedReader(part, pageDelayMs, maxRetries, backoffBaseMs, flakyEveryN,
      maxRetryAfterMs, withOrdinals)
  }
}

object PagedReader {
  /** Fault-injection bookkeeping for `flakyEveryN` (local/test use). */
  val failedOnce: java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean] =
    new java.util.concurrent.ConcurrentHashMap()

  /** Waits actually taken for rate-limited pages (page path → ms), the
    * test-visible mirror of the reference's "Rate limited. Waiting %.1fs"
    * log line — specs assert hint use and capping without timing sleeps.
    */
  val rateLimitWaits: java.util.concurrent.ConcurrentHashMap[String, Long] =
    new java.util.concurrent.ConcurrentHashMap()
}

final class PagedReader(part: PagePartition, pageDelayMs: Long, maxRetries: Int,
    backoffBaseMs: Long, flakyEveryN: Int, maxRetryAfterMs: Long = 60000L,
    withOrdinals: Boolean = false)
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private var rows: Iterator[InternalRow] = _
  private var current: InternalRow = _

  /** C1: retry with exponential backoff around the page fetch — but only
    * for RETRYABLE failures. The reference distinguishes the two classes
    * (movie.py:124-127): 429/5xx/network errors retry with backoff, any
    * other 4xx client error fails fast. The file-transport analog of a
    * 404 is a missing page file: retrying can never succeed, so it
    * surfaces immediately instead of burning the full backoff schedule.
    *
    * A rate-limited page may carry the server's wait hint
    * (`Retry-After`, movie.py:113-121): the hint replaces the
    * exponential wait for that attempt — capped at `maxRetryAfterMs`
    * so a hostile/buggy hint can't park the task for an hour — and an
    * unparseable/absent hint falls back to the backoff schedule,
    * exactly like the reference's int() try/except.
    */
  private def safeReadPage(): Seq[String] = {
    var attempt = 0
    while (true) {
      try return readPageLines()
      catch {
        case e: java.io.FileNotFoundException =>
          throw new RuntimeException(
            s"page ${part.path} is gone (fatal, not retried — the 404 analog)", e)
        case e: RateLimitedException if attempt < maxRetries =>
          val wait = e.retryAfterMs match {
            case Some(hint) => math.min(hint, maxRetryAfterMs)
            case None => backoffBaseMs * (1L << attempt)
          }
          PagedReader.rateLimitWaits.put(part.path, wait)
          Thread.sleep(wait)
          attempt += 1
        case e: Exception if attempt < maxRetries =>
          Thread.sleep(backoffBaseMs * (1L << attempt))
          attempt += 1
        case e: Exception =>
          throw new RuntimeException(s"page ${part.path} failed after $maxRetries retries", e)
      }
    }
    Nil // unreachable
  }

  /** The transport: a Hadoop-FileSystem read here (any scheme); an HTTP
    * GET in production. `open` on a vanished page throws
    * FileNotFoundException — the 404 analog [[safeReadPage]] fails fast on.
    */
  private def readPageLines(): Seq[String] = {
    if (flakyEveryN > 0 && part.index % flakyEveryN == 0 &&
        PagedReader.failedOnce.putIfAbsent(part.path, true) == null) {
      throw new java.io.IOException(s"injected transient failure on ${part.path}")
    }
    // 429 analog: a `<page>.retry-after` sidecar marks the page
    // rate-limited ONCE, its content the server's wait hint in ms. The
    // read consumes the marker (so the retry succeeds, like a 429 that
    // clears) and surfaces the hint to the backoff loop.
    val limiter = new org.apache.hadoop.fs.Path(part.path + ".retry-after")
    val lfs = limiter.getFileSystem(graft.ops.Fs.defaultConf)
    if (lfs.exists(limiter)) {
      val hint = graft.ops.Fs.readBytes(part.path + ".retry-after", graft.ops.Fs.defaultConf)
        .map(new String(_, java.nio.charset.StandardCharsets.UTF_8).trim)
        .flatMap(_.toLongOption)
      lfs.delete(limiter, false)
      throw new RateLimitedException(s"page ${part.path} rate-limited", hint)
    }
    val p = new org.apache.hadoop.fs.Path(part.path)
    val in = p.getFileSystem(graft.ops.Fs.defaultConf).open(p)
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
    try Iterator.continually(reader.readLine()).takeWhile(_ != null)
      .filter(_.nonEmpty).toList
    finally reader.close()
  }

  private def toRow(node: JsonNode, rowIdx: Int): InternalRow = {
    def str(f: String): UTF8String =
      if (node.hasNonNull(f)) UTF8String.fromString(node.get(f).asText) else null
    def dbl(f: String): Any = if (node.hasNonNull(f)) node.get(f).asDouble else null
    def lng(f: String): Any = if (node.hasNonNull(f)) node.get(f).asLong else null
    val genreIds: ArrayData =
      if (node.hasNonNull("genre_ids"))
        ArrayData.toArrayData(node.get("genre_ids").elements().asScala.map(_.asInt).toArray)
      else null
    val base = Seq[Any](
      lng("id"), str("title"), str("original_title"), str("release_date"),
      genreIds, dbl("vote_average"), lng("vote_count"), dbl("popularity"),
      str("original_language"), str("overview"), str("poster_path"))
    InternalRow.fromSeq(
      if (withOrdinals) base :+ part.index :+ rowIdx else base)
  }

  override def next(): Boolean = {
    if (rows == null) {
      if (pageDelayMs > 0) Thread.sleep(pageDelayMs) // C2: rate limit
      rows = safeReadPage().iterator.zipWithIndex
        .map { case (l, i) => toRow(mapper.readTree(l), i) }
    }
    if (rows.hasNext) { current = rows.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
