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
  * `--pages-dir` is the transport root, either form:
  *  - per-month page directories (`<pagesDir>/<monthStart>_<monthEnd>/
  *    page-*.json`), read through the Hadoop FS; or
  *  - an http(s) discover endpoint — each month is fetched live as
  *    `<pagesDir>?primary_release_date.gte=<ms>&primary_release_date
  *    .lte=<me>&page=N` (the reference's own query params,
  *    movie.py:148-151), with `--bearer-token`/`BEARER_TOKEN` standing
  *    in for `TMDB_API_KEY`.
  * Both go through [[graft.sources.PagedJsonSource]] with the
  * reference's 500-page window cap (overridable via `--max-pages`, loss
  * logged). Image URL config comes from keys instead of the config
  * endpoint (S2 — plan-time scalars either way).
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
    // keep='first' parity (movie.py:276): ingest ordinals from the source
    // feed the dedup window so the first fetched duplicate survives
    val keepFirst = conf.getOrElse("keep-first", "KEEP_FIRST", "false").toBoolean
    val bearer = conf.get("bearer-token", "BEARER_TOKEN")
    val isHttp = pagesDir.startsWith("http://") || pagesDir.startsWith("https://")
    def monthDir(ms: String, me: String): String =
      if (isHttp) {
        val sep = if (pagesDir.contains("?")) "&" else "?"
        s"$pagesDir${sep}primary_release_date.gte=$ms&primary_release_date.lte=$me"
      } else s"$pagesDir/${ms}_$me"
    Backfill.run(
      spark, outDir, s"$outDir/checkpoint_months.json", from, to,
      imageBase, posterSize, genres,
      fetchMonth = (ms, me) => {
        val reader = spark.read.format("graft.sources.PagedJsonSource")
          .option("dir", monthDir(ms, me))
          .option("maxPages", maxPages)
          .option("withOrdinals", keepFirst.toString)
        bearer.foreach(reader.option("bearerToken", _))
        reader.load()
      },
      onProgress = onProgress,
      keepFirst = keepFirst)
  }

  /** The program's install location — the reference anchors its first
    * `.env` candidate to the SCRIPT's directory (movie.py:36-38), so the
    * analog here is the jar/classes directory, falling back to cwd when
    * the code source is unknowable (then [[Conf.defaultCandidates]]
    * drops the parent candidate, so nothing above cwd is consulted).
    */
  private[pipeline] def installDir: java.nio.file.Path =
    try {
      val uri = getClass.getProtectionDomain.getCodeSource.getLocation.toURI
      val p = java.nio.file.Paths.get(uri)
      Option(p.getParent).getOrElse(java.nio.file.Paths.get("."))
    } catch { case _: Exception => java.nio.file.Paths.get(".") }

  def main(args: Array[String]): Unit = {
    val conf = Conf.load(args.toSeq, Conf.defaultCandidates(
      installDir, java.nio.file.Paths.get(".")))
    graft.ops.Logging.setupFromConf(conf) // movie.py:314-315
    val spark = Tables.configure(SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    try {
      val res = run(spark, conf)
      println(s"backfill complete: ${res.processedMonths.size} months, ${res.masterRows} master rows")
    } finally spark.stop()
  }
}
