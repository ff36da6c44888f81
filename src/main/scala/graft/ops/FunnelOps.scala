package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnels over an event stream — the strict-sequence
  * semantics product funnels mean: a user reaches step i only via an
  * event of step i's type STRICTLY AFTER the timestamp that satisfied
  * step i-1, and the earliest such event is the one that counts. An
  * out-of-order event (a click with no prior view) contributes nothing —
  * the thing a naive per-type min gets wrong.
  *
  * Scale shape: each step is a pushed type-filter + a min-agg keyed on
  * the user column; step i joins step i-1's USER-KEYED relation on that
  * same key, so after the first exchange every join and agg reuses one
  * hash partitioning (no per-user window sort, nothing corpus × corpus)
  * and the step relations only SHRINK. The per-step rollup at the end
  * moves |steps| rows.
  */
object FunnelOps {

  /** Per-step funnel rollup: `(step, step_name, n_users, sum_lag_us)` —
    * users reaching each step and their total lag from the step-1 event
    * (integer µs; exact in any engine).
    *
    * @param ev      events with `userCol`, `typeCol`, `tsCol` columns
    * @param steps   ordered event-type sequence, length >= 1
    * @param tsCol   integer-comparable event time (µs convention here)
    */
  def funnel(
      ev: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts_us"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = ev.select(col(userCol), col(typeCol), col(tsCol))
    val s1 = base.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("t1"))
    // fold: each step's frame is (user, t_i, t1); min("t1") just carries
    // the per-user constant through the agg
    val frames = steps.zipWithIndex.drop(1).scanLeft(s1 -> "t1") {
      case ((prev, pt), (typ, i)) =>
        val t = s"t${i + 1}"
        base.filter(col(typeCol) === typ).join(prev, userCol)
          .filter(col(tsCol) > col(pt))
          .groupBy(userCol).agg(min(tsCol).as(t), min("t1").as("t1")) -> t
    }
    frames.zip(steps).zipWithIndex.map { case (((df, t), name), i) =>
      df.agg(count(lit(1)).as("n_users"),
          sum(col(t) - col("t1")).as("sum_lag_us"))
        .select(lit(i + 1).as("step"), lit(name).as("step_name"),
          col("n_users"), col("sum_lag_us"))
    }.reduce(_ unionAll _).orderBy("step")
  }
}
