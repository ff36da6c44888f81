package graft.tools

import java.nio.file.Files

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Ingest-throughput measurement against the reference's derived ceiling
  * (SURVEY §6: 20 rows/page ÷ 0.08 s inter-page sleep ≈ 250 rows/s,
  * single-threaded and network-bound by construction).
  *
  * Builds one reference-shaped month window — 500 pages × 20 rows, the
  * documented `TMDB_MAX_PAGES` maximum (`/root/reference/src/movie.py:25`,
  * `README.md:46`) — then times `PagedJsonSource` reading it end to end
  * (full normalize-ready raw schema, count materializes every row).
  * The file transport measures the ENGINE's page fan-out (one
  * `InputPartition` per page, 32 concurrent tasks) without network
  * noise; the reference's 0.08 s/page politeness sleep alone would take
  * 40 s for the same window serially. Run with a positive `pageDelayMs`
  * to simulate a rate-limited API and watch the parallel floor: 500
  * pages × delay ÷ 32 tasks.
  *
  * Usage: `runMain graft.tools.IngestBench [pages] [rowsPerPage] [runs]`
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val pages = args.lift(0).map(_.toInt).getOrElse(500)
    val rowsPerPage = args.lift(1).map(_.toInt).getOrElse(20)
    val runs = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = Tables.configure(SparkSession.builder().appName("ingest-bench"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("ingest-bench")
    (1 to pages).foreach { p =>
      val lines = (1 to rowsPerPage).map { r =>
        val id = (p - 1) * rowsPerPage + r
        s"""{"id": $id, "title": "Movie $id", "original_title": "M$id", """ +
          s""""release_date": "2023-01-15", "genre_ids": [28, 35], """ +
          s""""vote_average": 7.5, "vote_count": ${id * 10}, "popularity": $id.5, """ +
          s""""original_language": "en", "overview": "o", "poster_path": "/p$id.jpg"}"""
      }
      Files.write(dir.resolve(f"page-$p%05d.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }

    def read(): Long = spark.read.format("graft.sources.PagedJsonSource")
      .option("dir", dir.toString).load().count()

    require(read() == pages.toLong * rowsPerPage, "short read") // warm-up
    val times = (1 to runs).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      val n = read()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[ingest] $n rows in $dt%.2f s = ${n / dt}%.0f rows/s")
      dt
    }
    val med = times.sorted.apply(runs / 2)
    val rows = pages.toLong * rowsPerPage
    println(f"""{"metric":"ingest_rows_per_sec","value":${rows / med}%.0f,""" +
      f""""pages":$pages,"rows":$rows,"median_sec":$med%.3f,""" +
      s""""reference_ceiling_rows_per_sec":250}""")
    spark.stop()
  }
}
