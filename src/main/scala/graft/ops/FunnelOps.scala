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
  * the user column, joined back LEFT onto the accumulated per-user frame
  * so one relation carries (t1..tn) and every level rolls up from a
  * single subtree (a per-level union would re-derive each step's plan
  * once per level — 2× the scans at 3 steps, worse as the funnel
  * deepens). After each step side's one exchange, every join and agg
  * reuses the same user-keyed hash partitioning (no per-user window
  * sort, nothing corpus × corpus), the step relations only SHRINK, and
  * the map-side partial min collapses each user's events before any
  * shuffle. The final rollup is ONE single-row aggregate exploded to
  * |steps| rows.
  */
object FunnelOps {

  /** Per-step funnel rollup: `(step, step_name, n_users, sum_lag_us)` —
    * users reaching each step and their total lag from the step-1 event
    * (integer µs; exact in any engine; SQL-null when no user converts).
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
    // fold: acc = (user, t1, ..., ti) with nulls past the user's depth.
    // Each iteration references acc TWICE (probe side of the next step's
    // min-agg + the left extension), and Catalyst does not dedupe common
    // subtrees — unpersisted, the step-1 plan re-derives 2^(k-1) times
    // (measured: 4 view scans in a 3-step funnel's executed plan).
    // Persisting each intermediate acc makes both references read ONE
    // cached user-keyed relation, so the whole funnel is k pushed scans
    // + k tiny exchanges. The cached frames are user-dimension-sized and
    // SHRINK with depth; per-user partial mins collapse map-side before
    // every exchange, so a hot user never concentrates on one task.
    val full = steps.zipWithIndex.drop(1).foldLeft(s1) {
      case (accRaw, (typ, i)) =>
        val acc = graft.Memo.ensurePersisted(accRaw)
        val tPrev = s"t$i"
        val t = s"t${i + 1}"
        val nxt = base.filter(col(typeCol) === typ)
          .join(acc.select(userCol, tPrev), userCol) // inner: reached i, and
          .filter(col(tsCol) > col(tPrev))           // null tPrev drops here
          .groupBy(userCol).agg(min(tsCol).as(t))
        acc.join(nxt, Seq(userCol), "left")
    }
    val aggs = steps.indices.flatMap { i =>
      val t = s"t${i + 1}"
      Seq(count(col(t)).as(s"__n$i"),
        sum(col(t) - col("t1")).as(s"__lag$i"))
    }
    val levels = steps.indices.map { i =>
      struct(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
        col(s"__n$i").as("n_users"), col(s"__lag$i").as("sum_lag_us"))
    }
    full.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(levels: _*)).as("r"))
      .select("r.*")
      .orderBy("step")
  }
}
