package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, n-gram shingling, quality metrics, language-ID scoring,
  * and document fingerprinting. Everything is a pure `Column` expression —
  * whole-stage-codegen'd, no UDFs, no shuffles of their own — so each
  * composes freely with any scan/filter/agg and scales with the row count.
  */
object TextOps {

  /** Whitespace tokens. Mirrors `string_split(text, ' ')` in DuckDB. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token n-gram shingles (order-preserving join with spaces).
    * For n=3: "a b c d" -> ["a b c", "b c d"]. Documents shorter than n
    * shingle to an empty array.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    // guard: Spark's sequence(1, 0) DESCENDS ([1,0]) rather than returning
    // empty, so short documents need the explicit empty-array branch
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - lit(n - 1)), i =>
          concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Number of non-overlapping occurrences of literal `pat` in `text`,
    * expressed with length/replace so any SQL engine reproduces it exactly.
    */
  def occurrences(text: Column, pat: String): Column =
    (length(text) - length(replace(text, lit(pat)))) / lit(pat.length)

  /** Tiny built-in character-trigram marker profiles for language ID.
    * Public-knowledge heuristic (frequent function-word fragments); the
    * profiles are data, not learned state, so scoring is a pure projection.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "sch", "ein", "ich"),
    "en" -> Seq("the", " a ", "ing", " of"),
    "es" -> Seq(" el ", " de ", "los", "que"),
    "fr" -> Seq(" le ", " la ", "eau", "que"),
    "zh" -> Seq("zh_", "shi", "de ", "le "))

  /** Marker-occurrence score for one language profile. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => occurrences(text, m)).reduce(_ + _).cast("int")

  /** Exact-duplicate fingerprint: md5 of the lower-cased text. Identical
    * in every engine; the cheap first pass of any dedup cascade.
    */
  def fingerprint(text: Column): Column = md5(lower(text))
}
