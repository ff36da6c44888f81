package graft.pipeline

import graft.Tables
import graft.ops.Conf
import org.apache.spark.sql.SparkSession

/** The reference program's `__main__` (movie.py:300-319), end to end:
  * layered config ([[graft.ops.Conf]]: CLI flag → env → `.env` → default,
  * same keys and defaults as the reference's argparse) drives the paged
  * source → normalize → checkpointed monthly backfill → consolidation
  * pipeline ([[Backfill]]).
  *
  * The transport root replaces the HTTPS endpoint: `--pages-dir` points
  * at per-month page directories (`<pagesDir>/<monthStart>_<monthEnd>/
  * page-*.json`), read through [[graft.sources.PagedJsonSource]] with
  * the reference's 500-page window cap (overridable via `--max-pages`,
  * loss logged). Image URL config comes from keys instead of the
  * config endpoint (S2 — plan-time scalars either way).
  */
object BackfillCli {

  def run(spark: SparkSession, conf: Conf.Layered,
      onProgress: (String, Int, Int) => Unit = (_, _, _) => ()): Backfill.Result = {
    val pagesDir = conf.required("pages-dir", "PAGES_DIR")
    val outDir = conf.required("out-dir", "OUT_DIR")
    val from = conf.getOrElse("from", "DATE_FROM", "2021-01-01")
    val to = conf.getOrElse("to", "DATE_TO", "2023-12-31")
    val maxPages = conf.getOrElse("max-pages", "TMDB_MAX_PAGES", "500")
    val imageBase = conf.getOrElse("image-base", "IMAGE_BASE", "https://image.tmdb.org/t/p/")
    val posterSize = conf.getOrElse("poster-size", "POSTER_SIZE", "w500")
    // genre dimension as CSV config ("28:Action,35:Comedy"); the
    // reference fetches the same map from its genre endpoint (S3)
    val genres: Map[Int, String] = conf.get("genres", "GENRES")
      .map(_.split(",").iterator.filter(_.contains(":")).map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.toInt -> v.trim
      }.toMap)
      .getOrElse(Map.empty)
    Backfill.run(
      spark, outDir, s"$outDir/checkpoint_months.json", from, to,
      imageBase, posterSize, genres,
      fetchMonth = (ms, me) =>
        spark.read.format("graft.sources.PagedJsonSource")
          .option("dir", s"$pagesDir/${ms}_$me")
          .option("maxPages", maxPages)
          .load(),
      onProgress = onProgress)
  }

  def main(args: Array[String]): Unit = {
    val conf = Conf.load(args.toSeq, Conf.defaultCandidates(
      java.nio.file.Paths.get("."), java.nio.file.Paths.get(".")))
    val spark = Tables.configure(SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    try {
      val res = run(spark, conf)
      println(s"backfill complete: ${res.processedMonths.size} months, ${res.masterRows} master rows")
    } finally spark.stop()
  }
}
