package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture → slowly-changing-dimension operators: run-length
  * encoding of an ordered per-key attribute stream into type-2 validity
  * intervals. The write-side twin of the as-of join (reading the raw log
  * as-of t ≡ equi-probing the interval table at t), and the 100-TB
  * representation of slowly-changing state — output is change-bounded,
  * not observation-bounded.
  */
object ScdOps {

  /** SCD2 history build. For each `key`, order observations by
    * (`ord`, `tie`) and collapse each RUN of equal `value`s into one row:
    *
    *   (key, value, valid_from = run's first `ord`,
    *    valid_to = next run's first `ord` (NULL on the current run),
    *    version = 1-based run ordinal per key)
    *
    * Intervals are half-open `[valid_from, valid_to)` and tile each key's
    * observed range exactly. NULL `value`s are observation gaps and are
    * dropped before run detection (a NULL between two equal values does
    * NOT split the run — mirror of how a CDC feed treats missed polls).
    *
    * Both window passes ride ONE keyed exchange and ONE per-key sort:
    * `lag` marks run starts, and the run-start filter preserves
    * partitioning and order, so Catalyst plans the `lead`/`row_number`
    * pass on the same sort (q94's plan pin holds this).
    *
    * @param df    observations
    * @param key   partition column (the dimension's natural key)
    * @param ord   bigint ordering column (e.g. epoch-µs)
    * @param tie   bigint tiebreak column making (ord, tie) a total order
    * @param value the tracked attribute
    */
  def history(df: DataFrame, key: String, ord: String, tie: String,
      value: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ord), col(tie))
    df.select(col(key), col(ord), col(tie), col(value))
      .filter(col(value).isNotNull)
      .withColumn("__prev", lag(col(value), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(value))
      .withColumn("valid_from", col(ord))
      .withColumn("valid_to", lead(col(ord), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col(key), col(value), col("valid_from"), col("valid_to"),
        col("version"))
  }
}
