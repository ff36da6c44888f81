package graft.queries

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** String / date / JSON / array function families (SURVEY.md §2.5) —
  * all whole-stage-codegen built-ins, no UDFs in the hot path.
  */
object FunctionQs {

  /** String functions over `documents`. */
  val q20 = Q(
    "q20_string_fns",
    (s, d) => {
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          lower(substring(col("text"), 1, 20)).as("head20"),
          length(col("text")).as("n_chars_fn"),
          regexp_extract(col("text"), "^[a-z]+", 0).as("first_word"),
          size(split(col("text"), " ")).as("n_tok"),
          concat_ws("|", col("lang"), col("source")).as("lang_src"),
          levenshtein(col("lang"), col("source")).cast("int").as("lev"),
          reverse(col("lang")).as("rlang"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        lower(substr(text, 1, 20)) AS head20,
        CAST(length(text) AS INT) AS n_chars_fn,
        regexp_extract(text, '^[a-z]+') AS first_word,
        CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
        concat_ws('|', lang, source) AS lang_src,
        CAST(levenshtein(lang, source) AS INT) AS lev,
        reverse(lang) AS rlang
      FROM documents ORDER BY doc_id"""))

  /** Date functions over `orders` (P9 month semantics + date arithmetic). */
  val q21 = Q(
    "q21_date_fns",
    (s, d) => {
      val od = col("o_orderdate").cast("date")
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          trunc(od, "month").as("month_start"),
          year(od).as("yr"),
          month(od).as("mo"),
          quarter(od).as("qtr"),
          last_day(od).as("month_end"),
          datediff(lit("2002-01-01").cast("date"), od).cast("int").as("days_to_2002"),
          add_months(od, 3).as("plus3m"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        CAST(year(o_orderdate) AS INT) AS yr,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(quarter(o_orderdate) AS INT) AS qtr,
        last_day(CAST(o_orderdate AS DATE)) AS month_end,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
      FROM orders ORDER BY o_orderkey"""))

  /** JSON path extraction + conditional aggregation over `events.props`. */
  val q22 = Q(
    "q22_json_agg",
    (s, d) => {
      val k = get_json_object(col("props"), "$.k").cast("long")
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(k).cast("long").as("k_sum"),
          count(when(k > 50, 1)).as("n_k_hi"),
          Det.dsum(col("value")).as("value_sum"))
        .orderBy("event_type")
    },
    Some(s"""
      SELECT event_type,
        count(*) AS n_events,
        CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        count(*) FILTER (WHERE CAST(json_extract_string(props, '$$.k') AS BIGINT) > 50) AS n_k_hi,
        ${Det.dsumSql("value")} AS value_sum
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Schema-ful JSON parse (`from_json` rather than path strings). */
  val q23 = Q(
    "q23_from_json",
    (s, d) => {
      Tables.events(s, d)
        .filter(col("event_id") < 1000)
        .select(
          col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events WHERE event_id < 1000 ORDER BY event_id"""))

  /** Array functions over `embeddings`: size / element access / max, plus
    * an order-independent exact squared norm (decimal-summed, so any
    * partial-aggregation plan gives bit-identical doubles). */
  val q24 = Q(
    "q24_array_fns",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val x = col("x").cast("double")
      val norms = e.select(col("vec_id"), explode(col("embedding")).as("x"))
        .groupBy("vec_id")
        .agg(Det.dsum(x * x, 12).as("sq_norm"))
      e.join(norms, "vec_id")
        .select(
          col("vec_id"),
          size(col("embedding")).as("dims"),
          element_at(col("embedding"), 1).as("first_el"),
          array_max(col("embedding")).as("max_el"),
          col("sq_norm"))
        .orderBy("vec_id")
    },
    Some(s"""
      SELECT e.vec_id, CAST(len(e.embedding) AS INT) AS dims,
        e.embedding[1] AS first_el,
        list_aggregate(e.embedding, 'max') AS max_el,
        n.sq_norm
      FROM embeddings e
      JOIN (SELECT vec_id,
              ${Det.dsumSql("CAST(x AS DOUBLE) * CAST(x AS DOUBLE)", 12)} AS sq_norm
            FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
            GROUP BY vec_id) n USING (vec_id)
      ORDER BY vec_id"""))

  /** posexplode / UNNEST-with-position parity (1-based positions). */
  val q25 = Q(
    "q25_explode_tokens",
    (s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("token"))
        .orderBy("doc_id", "pos")
    },
    Some("""
      SELECT doc_id, CAST(i AS INT) AS pos, string_split(text, ' ')[i] AS token
      FROM documents,
        LATERAL (SELECT unnest(generate_series(1, len(string_split(text, ' ')))) AS i)
      WHERE doc_id < 50
      ORDER BY doc_id, pos"""))

  val defs: Seq[Q] = Seq(q20, q21, q22, q23, q24, q25)
}
