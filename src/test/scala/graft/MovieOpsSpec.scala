package graft

import java.nio.file.{Files, Path}

import graft.ops.MovieOps
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** 1:1 port of the reference's 20 unit tests
  * (`/root/reference/tests/test_movie.py:19-165`) against the Spark
  * implementations: 7 normalize, 6 month_ranges, 5 checkpoint,
  * 2 master_paths.
  */
class MovieOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  import spark.implicits._

  private val genres = Map(28 -> "Action", 35 -> "Comedy")

  /** The reference's raw-payload fixture (test_movie.py:20-35). */
  private def rawDf(overrides: Map[String, Any]*): DataFrame = {
    val base = Map[String, Any](
      "id" -> 1L, "title" -> "Test Movie", "original_title" -> "Test Movie OT",
      "release_date" -> "2023-06-15", "genre_ids" -> Seq(28, 35),
      "vote_average" -> 7.5, "vote_count" -> 1000L, "popularity" -> 120.5,
      "original_language" -> "en", "overview" -> "A test movie.",
      "poster_path" -> "/abc123.jpg")
    val rowsMaps = if (overrides.isEmpty) Seq(base) else overrides.map(base ++ _)
    val rows = rowsMaps.map { m =>
      Row(m("id"), m("title"), m("original_title"), m("release_date"),
        m("genre_ids"), m("vote_average"), m("vote_count"), m("popularity"),
        m("original_language"), m("overview"), m("poster_path"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), MovieOps.RawSchema)
  }

  private def normalize(df: DataFrame): DataFrame =
    MovieOps.normalize(df, "https://cdn/", "w500", genres)

  // ---- TestNormalizeToDf (7) ----

  test("output columns match schema") {
    assert(normalize(rawDf()).columns.toSeq == MovieOps.Cols)
  }

  test("field values") {
    val row = normalize(rawDf()).head()
    assert(row.getAs[Long]("tmdb_id") == 1L)
    assert(row.getAs[String]("title") == "Test Movie")
    assert(row.getAs[String]("genres") == "Action|Comedy")
    assert(row.getAs[String]("poster_url") == "https://cdn/w500/abc123.jpg")
    assert(row.getAs[Double]("vote_average") == 7.5)
  }

  test("missing poster returns null") {
    val row = normalize(rawDf(Map("poster_path" -> null))).head()
    assert(row.getAs[String]("poster_url") == null)
  }

  test("unknown genre id falls back to string") {
    val df = MovieOps.normalize(rawDf(Map("genre_ids" -> Seq(9999))), "https://cdn/", "w500", Map.empty)
    assert(df.head().getAs[String]("genres") == "9999")
  }

  test("empty genre list") {
    val row = normalize(rawDf(Map("genre_ids" -> Seq.empty[Int]))).head()
    assert(row.getAs[String]("genres") == "")
  }

  test("empty input returns empty df with schema") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], MovieOps.RawSchema)
    val df = MovieOps.normalize(empty, "https://cdn/", "w500", Map.empty)
    assert(df.count() == 0)
    assert(df.columns.toSeq == MovieOps.Cols)
  }

  test("multiple rows") {
    val df = normalize(rawDf((1 to 3).map(i =>
      Map[String, Any]("id" -> i.toLong, "title" -> s"Movie $i")): _*))
    assert(df.count() == 3)
    assert(df.select("tmdb_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  // ---- TestMonthRanges (6) ----

  test("single full month") {
    assert(MovieOps.monthRanges("2023-01-01", "2023-01-31") ==
      Seq(("2023-01-01", "2023-01-31")))
  }

  test("two full months") {
    assert(MovieOps.monthRanges("2023-01-01", "2023-02-28") ==
      Seq(("2023-01-01", "2023-01-31"), ("2023-02-01", "2023-02-28")))
  }

  test("end clipped mid-month") {
    assert(MovieOps.monthRanges("2023-01-01", "2023-01-15") ==
      Seq(("2023-01-01", "2023-01-15")))
  }

  test("start day ignored, always first of month") {
    assert(MovieOps.monthRanges("2023-03-15", "2023-04-30").head._1 == "2023-03-01")
  }

  test("year boundary") {
    assert(MovieOps.monthRanges("2022-12-01", "2023-01-31") ==
      Seq(("2022-12-01", "2022-12-31"), ("2023-01-01", "2023-01-31")))
  }

  test("same start and end") {
    assert(MovieOps.monthRanges("2023-06-10", "2023-06-10") ==
      Seq(("2023-06-01", "2023-06-10")))
  }

  // ---- TestCheckpoint (5, + file:// URI routing) ----

  private def tmpCp(): String = {
    val dir = Files.createTempDirectory("graft-cp")
    dir.resolve("cp.json").toString
  }

  test("load returns empty when file missing") {
    assert(MovieOps.loadCheckpoint(tmpCp()) == Seq.empty)
  }

  test("load returns empty when file corrupted") {
    val cp = tmpCp()
    Files.write(Path.of(cp), "not valid json {{ }".getBytes("UTF-8"))
    assert(MovieOps.loadCheckpoint(cp) == Seq.empty)
  }

  test("save and load roundtrip") {
    val cp = tmpCp()
    val months = Seq("2023-01-01_2023-01-31", "2023-02-01_2023-02-28")
    MovieOps.saveCheckpoint(cp, months)
    assert(MovieOps.loadCheckpoint(cp) == months)
  }

  test("save and load roundtrip through an explicit file:// URI") {
    val cp = "file://" + tmpCp()
    val months = Seq("2023-01-01_2023-01-31")
    MovieOps.saveCheckpoint(cp, months)
    assert(MovieOps.loadCheckpoint(cp) == months)
  }

  test("save leaves no tmp file") {
    val cp = tmpCp()
    MovieOps.saveCheckpoint(cp, Seq.empty)
    assert(!Files.exists(Path.of(cp + ".tmp")))
  }

  test("save overwrites previous") {
    val cp = tmpCp()
    MovieOps.saveCheckpoint(cp, Seq("2023-01-01_2023-01-31"))
    MovieOps.saveCheckpoint(cp, Seq("2023-01-01_2023-01-31", "2023-02-01_2023-02-28"))
    assert(MovieOps.loadCheckpoint(cp).length == 2)
  }

  // ---- TestMasterPaths (2) ----

  test("master paths, different years") {
    assert(MovieOps.masterPaths("2021-01-01", "2023-12-31") ==
      ("tmdb_movies_2021-2023.csv", "tmdb_movies_2021-2023.parquet"))
  }

  test("master paths, same year") {
    assert(MovieOps.masterPaths("2024-01-01", "2024-12-31") ==
      ("tmdb_movies_2024.csv", "tmdb_movies_2024.parquet"))
  }
}
