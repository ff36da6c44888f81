package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one compile-time door into Spark's `private[sql]` surface.
  *
  * Building a [[DataFrame]] around a CUSTOM logical operator (the
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan` rung of the extension
  * ladder — `graft.plans.AsOfJoinPlan`) requires `Dataset.ofRows`, which
  * Spark scopes `private[sql]`. Extension libraries conventionally host a
  * minimal shim in a subpackage of `org.apache.spark.sql` for exactly this
  * (the same pattern Spark-native projects use for their custom-plan
  * constructors); everything else in this repo stays on the public API.
  *
  * Keep this object MINIMAL: one constructor call, no logic — it is the
  * only file that would need review on a Spark upgrade for private-API
  * drift, and `AsOfJoinSpec` exercises it end to end so drift fails loudly.
  */
object Bridge {
  /** Wrap an already-analyzed logical plan as a DataFrame (runs the full
    * analyze/check/optimize pipeline on execution, like any Dataset). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
