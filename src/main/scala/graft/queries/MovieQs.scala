package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** The reference pipeline's transform semantics (SURVEY.md §2.2/§2.3)
  * exercised over the driver corpus. The movie-shaped normalize itself
  * (raw TMDB JSON → 11 COLS) lives in `graft.ops.MovieOps` and is
  * unit-tested against the reference's own fixtures; these queries prove
  * the same column semantics — lookup-map with fallback, pipe-join,
  * null-propagating concat, month bucketing, empty-schema conformance,
  * union + global dedup — under the DuckDB oracle on real tables.
  */
object MovieQs {

  /** P3+P4: array lookup-map with fallback, then pipe-join. Words of
    * `p_name` map through a small dimension (unknown word → itself, the
    * reference's `str(id)` fallback, `src/movie.py:189`), then join with
    * '|' (`src/movie.py:197`). The lookup is a `typedlit` map — plan-time
    * literal, the degenerate broadcast. */
  val q70 = Q(
    "q70_lookup_pipe_join",
    (s, d) => {
      val dim = typedlit(Map(
        "red" -> "Red", "blue" -> "Blue", "green" -> "Green",
        "small" -> "Small", "large" -> "Large"))
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          array_join(
            transform(split(col("p_name"), " "), w => coalesce(element_at(dim, w), w)),
            "|").as("name_tags"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey,
        array_to_string([CASE w
            WHEN 'red' THEN 'Red' WHEN 'blue' THEN 'Blue' WHEN 'green' THEN 'Green'
            WHEN 'small' THEN 'Small' WHEN 'large' THEN 'Large' ELSE w END
          for w in string_split(p_name, ' ')], '|') AS name_tags
      FROM part ORDER BY p_partkey"""))

  /** P5: null-propagating URL concat (`src/movie.py:190-191`): the whole
    * URL must be NULL when the path component is missing. `nullif`
    * manufactures the missing case from corpus data. */
  val q71 = Q(
    "q71_null_concat",
    (s, d) => {
      val path = nullif(col("p_brand"), lit("Brand#2"))
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          when(path.isNotNull,
            concat(lit("https://img.graft.dev/"), path, lit("/"), col("p_name")))
            .as("image_url"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey,
        CASE WHEN nullif(p_brand, 'Brand#2') IS NOT NULL
          THEN 'https://img.graft.dev/' || nullif(p_brand, 'Brand#2') || '/' || p_name
        END AS image_url
      FROM part ORDER BY p_partkey"""))

  /** P9: month bucketing (`src/movie.py:228-238`) — the distinct month
    * work-list of the order span, each as (month_start, month_end). */
  val q72 = Q(
    "q72_month_ranges",
    (s, d) => {
      Tables.orders(s, d)
        .select(trunc(col("o_orderdate").cast("date"), "month").as("month_start"))
        .distinct()
        .withColumn("month_end", last_day(col("month_start")))
        .orderBy("month_start")
    },
    Some("""
      SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        last_day(CAST(o_orderdate AS DATE)) AS month_end
      FROM orders ORDER BY month_start"""))

  /** P1+P2+P6-P8+D3+D4: the reference's full per-month pipeline shape —
    * project/rename to a fixed schema, date-range + threshold filters,
    * popularity-sort, top-K (`src/movie.py:148-171,185-205`).
    * Plans as scan-with-PushedFilters → TakeOrderedAndProject. */
  val q73 = Q(
    "q73_normalize_filter_topk",
    (s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") <= lit("1997-12-31") &&
          col("o_totalprice") >= 100000.0)
        .select(
          col("o_orderkey").as("id"),
          col("o_orderpriority").as("priority"),
          col("o_orderdate").cast("date").as("order_date"),
          col("o_totalprice").as("popularity"))
        .orderBy(col("popularity").desc, col("id"))
        .limit(50)
    },
    Some("""
      SELECT o_orderkey AS id, o_orderpriority AS priority,
        CAST(o_orderdate AS DATE) AS order_date, o_totalprice AS popularity
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate <= TIMESTAMP '1997-12-31'
        AND o_totalprice >= 100000.0
      ORDER BY popularity DESC, id LIMIT 50"""))

  /** P10: empty-frame schema conformance (`src/movie.py:271-272`) — a
    * month with zero results still carries the full output schema. */
  val q74 = Q(
    "q74_empty_schema",
    (s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2099-01-01"))
        .select(
          col("o_orderkey").as("id"),
          col("o_orderpriority").as("priority"),
          col("o_totalprice").as("popularity"))
        .orderBy("id")
    },
    Some("""
      SELECT o_orderkey AS id, o_orderpriority AS priority, o_totalprice AS popularity
      FROM orders WHERE o_orderdate >= TIMESTAMP '2099-01-01' ORDER BY id"""))

  /** S6+D2: multi-part union then global dedup (`src/movie.py:289-295`) —
    * two overlapping yearly slices unioned, deduped by key with the
    * deterministic window form, counted per year-month. */
  val q75 = Q(
    "q75_union_dedup",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d)
      def slice(from: String, to: String) =
        o.filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(to))
          .select(col("o_orderkey"), col("o_custkey"),
            trunc(col("o_orderdate").cast("date"), "month").as("om"))
      // overlapping ranges => real duplicates for the global dedup to kill
      val parts = slice("1996-01-01", "1997-01-01")
        .unionByName(slice("1996-07-01", "1997-07-01"))
      val w = Window.partitionBy("o_orderkey").orderBy("om")
      parts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("om")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("om")
    },
    Some("""
      WITH parts AS (
        SELECT o_orderkey, o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS om
        FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT o_orderkey, o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS om
        FROM orders WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1997-07-01')
      SELECT om, count(*) AS n_orders FROM (
        SELECT om, row_number() OVER (PARTITION BY o_orderkey ORDER BY om) AS rn FROM parts) t
      WHERE rn = 1 GROUP BY om ORDER BY om"""))

  val defs: Seq[Q] = Seq(q70, q71, q72, q73, q74, q75)
}
