package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import graft.ops.MovieOps
import graft.sources.{PagedReader, PagedTable}
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 paged source (S1) with its reliability options:
  * parallel page partitions, retry-with-backoff (C1), fault injection.
  */
class PagedJsonSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  private def writePages(nPages: Int, rowsPerPage: Int): Path = {
    val dir = Files.createTempDirectory("paged")
    (1 to nPages).foreach { p =>
      val lines = (1 to rowsPerPage).map { r =>
        val id = (p - 1) * rowsPerPage + r
        s"""{"id": $id, "title": "Movie $id", "original_title": "M$id",
           |"release_date": "2023-01-0$r", "genre_ids": [28, 35],
           |"vote_average": 7.5, "vote_count": ${id * 10}, "popularity": $id.5,
           |"original_language": "en", "overview": "o", "poster_path": "/p$id.jpg"}"""
          .stripMargin.replaceAll("\n", " ")
      }
      Files.write(dir.resolve(f"page-$p%05d.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    dir
  }

  test("reads all pages in parallel partitions with the raw schema") {
    val dir = writePages(nPages = 5, rowsPerPage = 4)
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("dir", dir.toString).load()
    assert(df.schema == MovieOps.RawSchema)
    assert(df.count() == 20)
    assert(df.rdd.getNumPartitions == 5) // one partition per page
    val first = df.orderBy("id").head()
    assert(first.getLong(0) == 1L)
    assert(first.getString(1) == "Movie 1")
    assert(first.getSeq[Int](4) == Seq(28, 35))
  }

  test("retry with backoff recovers from injected transient failures") {
    PagedReader.failedOnce.clear()
    val dir = writePages(nPages = 4, rowsPerPage = 2)
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("dir", dir.toString)
      .option("flakyEveryN", "2") // pages 0 and 2 fail once each
      .option("maxRetries", "3")
      .load()
    assert(df.count() == 8) // all rows despite the injected failures
    assert(PagedReader.failedOnce.size() == 2) // both flaky pages did fail
  }

  test("zero retries surfaces the failure") {
    PagedReader.failedOnce.clear()
    val dir = writePages(nPages = 2, rowsPerPage = 1)
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("dir", dir.toString)
      .option("flakyEveryN", "1")
      .option("maxRetries", "0")
      .load()
    val e = intercept[org.apache.spark.SparkException] { df.count() }
    assert(e.getMessage.contains("failed after 0 retries")
      || Option(e.getCause).exists(_.getMessage.contains("failed after 0 retries")))
  }

  test("page cap truncates the window and records the overflow") {
    PagedTable.overflows.clear()
    val dir = writePages(nPages = 5, rowsPerPage = 2)
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("dir", dir.toString)
      .option("maxPages", "3")
      .load()
    assert(df.count() == 6) // 3 pages x 2 rows; pages 4-5 dropped
    assert(PagedTable.overflows.get(dir.toString) == 2) // loss is recorded/logged

    PagedTable.overflows.clear()
    val all = spark.read.format("graft.sources.PagedJsonSource")
      .option("dir", dir.toString)
      .option("maxPages", "5")
      .load()
    assert(all.count() == 10)
    assert(PagedTable.overflows.isEmpty) // at-cap is not overflow
  }

  test("missing page file fails fast without burning retries") {
    // a page that vanishes between planning and read is the 404 analog;
    // drive the partition reader directly (a full query would re-plan and
    // simply not list the file). backoffBaseMs is set so that even ONE
    // retry sleep would trip the elapsed-time assertion.
    val reader = new graft.sources.PagedReader(
      graft.sources.PagePartition("/tmp/graft-definitely-missing-page.json", 0),
      new graft.sources.FilePageTransport(
        new org.apache.spark.util.SerializableConfiguration(
          new org.apache.hadoop.conf.Configuration())),
      pageDelayMs = 0, maxRetries = 3, backoffBaseMs = 60000, flakyEveryN = 0)
    val t0 = System.nanoTime()
    val e = intercept[RuntimeException] { reader.next() }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(e.getMessage.contains("fatal, not retried"))
    assert(elapsedMs < 30000, s"fail-fast took ${elapsedMs}ms — it retried")
  }

  test("options are case-insensitive on both the schema and table paths") {
    val dir = writePages(nPages = 1, rowsPerPage = 1)
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("dir", dir.toString)
      .option("withordinals", "true") // lowercase on purpose
      .load()
    assert(df.columns.contains("_page") && df.columns.contains("_row"))
    assert(df.count() == 1)
  }

  test("file transport carries the session's hadoop configuration") {
    spark.sparkContext.hadoopConfiguration.set("graft.test.marker", "rode-along")
    try {
      val t = new graft.sources.PagedTable(Map("dir" -> "/tmp")).transport
      val conf = t.asInstanceOf[graft.sources.FilePageTransport].conf.value
      assert(conf.get("graft.test.marker") == "rode-along",
        "paged source ignores the session hadoop conf (spark.hadoop.* overrides lost)")
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.test.marker")
  }

  // ---- Retry-After analog (C1 extension, movie.py:113-121) ----

  /** Wait recorded for `page`, keyed by suffix (partition paths are
    * FileSystem-qualified, e.g. `file:/...`). */
  private def recordedWait(page: String): Option[Long] = {
    import scala.jdk.CollectionConverters._
    PagedReader.rateLimitWaits.asScala.collectFirst {
      case (k, v) if k.endsWith(page) => v
    }
  }

  test("rate-limit hint is honored instead of the exponential schedule") {
    PagedReader.rateLimitWaits.clear()
    val dir = writePages(nPages = 2, rowsPerPage = 1)
    Files.write(dir.resolve("page-00001.json.retry-after"), "25".getBytes("UTF-8"))
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("dir", dir.toString)
      .option("backoffBaseMs", "1")
      .option("maxRetries", "2")
      .load()
    assert(df.count() == 2) // marker consumed, retry succeeded
    assert(recordedWait("page-00001.json").contains(25L),
      s"waited ${recordedWait("page-00001.json")} — hint not used")
    assert(!Files.exists(dir.resolve("page-00001.json.retry-after"))) // consumed
  }

  test("rate-limit hint is capped at maxRetryAfterMs") {
    PagedReader.rateLimitWaits.clear()
    val dir = writePages(nPages = 1, rowsPerPage = 1)
    Files.write(dir.resolve("page-00001.json.retry-after"), "999999".getBytes("UTF-8"))
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("dir", dir.toString)
      .option("maxRetryAfterMs", "40")
      .load()
    assert(df.count() == 1)
    assert(recordedWait("page-00001.json").contains(40L),
      s"waited ${recordedWait("page-00001.json")} — hostile hint not capped")
  }

  test("unparseable rate-limit hint falls back to exponential backoff") {
    PagedReader.rateLimitWaits.clear()
    val dir = writePages(nPages = 1, rowsPerPage = 1)
    Files.write(dir.resolve("page-00001.json.retry-after"), "soon".getBytes("UTF-8"))
    val df = spark.read.format("graft.sources.PagedJsonSource")
      .option("dir", dir.toString)
      .option("backoffBaseMs", "7")
      .load()
    assert(df.count() == 1)
    // attempt 0 of the schedule: backoffBase * 2^0 (movie.py's int() except-path)
    assert(recordedWait("page-00001.json").contains(7L))
  }

  test("feeds the normalize pipeline end-to-end") {
    PagedReader.failedOnce.clear()
    val dir = writePages(nPages = 3, rowsPerPage = 2)
    val raw = spark.read.format("graft.sources.PagedJsonSource")
      .option("dir", dir.toString).load()
    val movies = MovieOps.normalize(raw, "https://cdn/", "w500", Map(28 -> "Action"))
    val row = movies.orderBy("tmdb_id").head()
    assert(row.getAs[String]("genres") == "Action|35")
    assert(row.getAs[String]("poster_url") == "https://cdn/w500/p1.jpg")
  }

  // ---- live HTTP transport (movie.py:98-129) against an in-process stub ----

  import com.sun.net.httpserver.{HttpExchange, HttpServer}

  private def respond(ex: HttpExchange, code: Int, body: String,
      headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1L else bytes.length.toLong)
    if (bytes.nonEmpty) {
      val os = ex.getResponseBody
      os.write(bytes)
      os.close()
    } else ex.close()
  }

  private def pageOf(ex: HttpExchange): Int =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&")).collectFirst {
        case q if q.startsWith("page=") => q.drop(5).toInt
      }.getOrElse(1)

  /** Discover-shaped body: page N carries `rowsPerPage` movies. */
  private def discoverBody(page: Int, totalPages: Int, rowsPerPage: Int): String = {
    val results = (1 to rowsPerPage).map { r =>
      val id = (page - 1) * rowsPerPage + r
      s"""{"id": $id, "title": "Movie $id", "vote_average": 7.5,
         |"vote_count": ${id * 10}, "genre_ids": [28],
         |"release_date": "2023-01-01"}""".stripMargin.replaceAll("\n", " ")
    }
    s"""{"page": $page, "total_pages": $totalPages, "results": [${results.mkString(",")}]}"""
  }

  private def withServer(handler: HttpExchange => Unit)(f: String => Unit): Unit = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handler(ex))
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/discover")
    finally server.stop(0)
  }

  test("HTTP: reads the whole window from total_pages, bearer header sent") {
    val auths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    withServer { ex =>
      Option(ex.getRequestHeaders.getFirst("Authorization")).foreach(auths.add)
      respond(ex, 200, discoverBody(pageOf(ex), totalPages = 4, rowsPerPage = 3))
    } { base =>
      val df = spark.read.format("graft.sources.PagedJsonSource")
        .option("dir", base)
        .option("bearerToken", "test-token-123")
        .load()
      assert(df.rdd.getNumPartitions == 4) // one partition per page
      assert(df.count() == 12)
      assert(df.orderBy("id").head().getLong(0) == 1L)
      assert(auths.asScala == Set("Bearer test-token-123"))
    }
  }

  test("HTTP: 404 is fatal — fails fast without burning the backoff schedule") {
    withServer { ex =>
      if (pageOf(ex) >= 3) respond(ex, 404, "")
      else respond(ex, 200, discoverBody(pageOf(ex), totalPages = 3, rowsPerPage = 1))
    } { base =>
      val df = spark.read.format("graft.sources.PagedJsonSource")
        .option("dir", base)
        .option("maxRetries", "3")
        .option("backoffBaseMs", "60000") // one retry sleep would trip the timer
        .load()
      val t0 = System.nanoTime()
      val e = intercept[org.apache.spark.SparkException] { df.count() }
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs.contains("fatal"), s"404 not treated as fatal: $msgs")
      assert(elapsedMs < 30000, s"fail-fast took ${elapsedMs}ms — it retried")
    }
  }

  test("HTTP: 429 honors the Retry-After header (seconds), capped at maxRetryAfterMs") {
    PagedReader.rateLimitWaits.clear()
    val limited = new java.util.concurrent.atomic.AtomicBoolean(true)
    withServer { ex =>
      if (pageOf(ex) == 2 && limited.getAndSet(false))
        respond(ex, 429, "", "Retry-After" -> "1")
      else respond(ex, 200, discoverBody(pageOf(ex), totalPages = 2, rowsPerPage = 1))
    } { base =>
      val df = spark.read.format("graft.sources.PagedJsonSource")
        .option("dir", base)
        .option("backoffBaseMs", "1")
        .load()
      assert(df.count() == 2)
      val wait = PagedReader.rateLimitWaits.asScala.collectFirst {
        case (k, v) if k.contains("page=2") => v
      }
      assert(wait.contains(1000L), s"waited $wait — Retry-After: 1 (s) not honored as 1000 ms")
    }

    PagedReader.rateLimitWaits.clear()
    // only page 2+ is exclusively executor-fetched (the plan-time listing
    // GETs page 1), so the hostile 429 targets page 2
    val hostile = new java.util.concurrent.atomic.AtomicBoolean(true)
    withServer { ex =>
      if (pageOf(ex) == 2 && hostile.getAndSet(false))
        respond(ex, 429, "", "Retry-After" -> "999")
      else respond(ex, 200, discoverBody(pageOf(ex), totalPages = 2, rowsPerPage = 1))
    } { base =>
      val df = spark.read.format("graft.sources.PagedJsonSource")
        .option("dir", base)
        .option("maxRetryAfterMs", "40")
        .load()
      assert(df.count() == 2)
      val wait = PagedReader.rateLimitWaits.asScala.collectFirst {
        case (k, v) if k.contains("page=2") => v
      }
      assert(wait.contains(40L), s"waited $wait — hostile hint not capped")
    }
  }

  test("HTTP: 5xx retries with backoff and recovers") {
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val broke = new java.util.concurrent.atomic.AtomicBoolean(true)
    withServer { ex =>
      if (pageOf(ex) == 2 && broke.getAndSet(false)) {
        failures.incrementAndGet()
        respond(ex, 503, "")
      } else respond(ex, 200, discoverBody(pageOf(ex), totalPages = 2, rowsPerPage = 2))
    } { base =>
      val df = spark.read.format("graft.sources.PagedJsonSource")
        .option("dir", base)
        .option("backoffBaseMs", "1")
        .load()
      assert(df.count() == 4) // all rows despite the injected 503
      assert(failures.get() == 1)
    }
  }

  test("HTTP: a JSON-lines body yields one row per line") {
    // Jackson's readTree keeps only the FIRST document of a JSON-lines
    // body (trailing tokens don't fail) — the transport must split lines
    withServer { ex =>
      respond(ex, 200, (1 to 3).map(i =>
        s"""{"id": $i, "title": "M$i", "vote_count": 1}""").mkString("\n"))
    } { base =>
      val df = spark.read.format("graft.sources.PagedJsonSource")
        .option("dir", base).load()
      assert(df.count() == 3, "JSON-lines body silently truncated to one row")
    }
  }

  test("HTTP: redirects are followed like the reference client") {
    withServer { ex =>
      if (ex.getRequestURI.getPath.startsWith("/discover")) {
        val q = Option(ex.getRequestURI.getRawQuery).map("?" + _).getOrElse("")
        respond(ex, 301, "", "Location" -> s"/real$q")
      } else respond(ex, 200, discoverBody(pageOf(ex), totalPages = 2, rowsPerPage = 1))
    } { base =>
      val df = spark.read.format("graft.sources.PagedJsonSource")
        .option("dir", base)
        .option("backoffBaseMs", "1")
        .load()
      assert(df.count() == 2, "301 redirect not followed")
    }
  }

  test("HTTP: the window-discovery GET retries like any other request") {
    // the reference routes page 1 through the same retry wrapper; a 429
    // then a 500 on the LISTING request must not fail the query
    val listHits = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { ex =>
      listHits.incrementAndGet() match {
        case 1 => respond(ex, 429, "", "Retry-After" -> "0")
        case 2 => respond(ex, 503, "")
        case _ => respond(ex, 200, discoverBody(pageOf(ex), totalPages = 2, rowsPerPage = 1))
      }
    } { base =>
      val df = spark.read.format("graft.sources.PagedJsonSource")
        .option("dir", base)
        .option("backoffBaseMs", "1")
        .load()
      assert(df.count() == 2)
      assert(listHits.get() >= 3) // 429, 503, then success
    }
  }

  test("HTTP: page 1 fetched once per window; repeat actions reuse the listing") {
    // the discovery GET reads page 1 whole — its body must ride into
    // partition 0 instead of being fetched twice (movie.py:173), and a
    // second action on the same DataFrame must not re-list the window
    val hitsByPage = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    withServer { ex =>
      hitsByPage.merge(pageOf(ex), 1, (a, b) => a + b)
      respond(ex, 200, discoverBody(pageOf(ex), totalPages = 3, rowsPerPage = 2))
    } { base =>
      val df = spark.read.format("graft.sources.PagedJsonSource")
        .option("dir", base).load()
      assert(df.count() == 6)
      assert(hitsByPage.get(1) == 1,
        s"page 1 fetched ${hitsByPage.get(1)} times — discovery body not reused")
      assert(df.count() == 6) // second action
      assert(hitsByPage.get(1) == 1, "second action re-listed the window")
      assert(hitsByPage.get(2) == 2 && hitsByPage.get(3) == 2,
        "per-action executor fetches for pages 2+ expected (no result cache claimed)")
    }
  }

  test("HTTP: oversized page-1 body is not memoized — partition 0 refetches") {
    // the window memo lives for the table's lifetime and its prefetched
    // body serializes into partition 0 on EVERY action — a large first
    // page must fall back to a normal executor fetch instead
    PagedTable.prefetchDrops.clear()
    val hitsByPage = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    withServer { ex =>
      hitsByPage.merge(pageOf(ex), 1, (a, b) => a + b)
      respond(ex, 200, discoverBody(pageOf(ex), totalPages = 2, rowsPerPage = 3))
    } { base =>
      val df = spark.read.format("graft.sources.PagedJsonSource")
        .option("dir", base)
        .option("maxPrefetchBytes", "16") // any real body exceeds this
        .load()
      assert(df.count() == 6)
      assert(PagedTable.prefetchDrops.containsKey(base), "drop not recorded/logged")
      // discovery GET + partition-0 executor fetch = 2 hits on page 1,
      // and the result is still complete and correct
      assert(hitsByPage.get(1) == 2,
        s"page 1 fetched ${hitsByPage.get(1)} times — expected discovery + fallback fetch")
      assert(df.count() == 6) // second action: still one listing (no 3rd discovery)
      assert(hitsByPage.get(1) == 3, "second action should refetch page 1, not re-list")
    }
  }

  test("HTTP: request timeout is retryable, not fatal") {
    // the slow response hits page 2 — exclusively executor-fetched — which
    // times out once, retries with backoff, then succeeds
    val slow = new java.util.concurrent.atomic.AtomicBoolean(true)
    withServer { ex =>
      if (pageOf(ex) == 2 && slow.getAndSet(false)) {
        Thread.sleep(2000) // > requestTimeoutMs
        respond(ex, 200, discoverBody(2, 2, 1))
      } else respond(ex, 200, discoverBody(pageOf(ex), totalPages = 2, rowsPerPage = 1))
    } { base =>
      val df = spark.read.format("graft.sources.PagedJsonSource")
        .option("dir", base)
        .option("requestTimeoutMs", "300")
        .option("backoffBaseMs", "1")
        .load()
      assert(df.count() == 2)
    }
  }
}
