package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-merge operators: apply a keyed changeset (upserts + deletes) to a
  * snapshot — the MERGE INTO / Delta-merge semantics expressed as one
  * keyed join, the batch primitive every incremental table maintenance
  * pipeline runs. [[ScdOps]] is its historian sibling (SCD2 keeps every
  * version; this keeps the latest).
  */
object MergeOps {

  /** Apply `changes` to `snapshot` by `keyCols`:
    *
    *   - op = "D": the key's snapshot row is DELETED (a D for an absent
    *     key is a no-op — idempotent replay tolerance);
    *   - op = "U": the key's payload is REPLACED if present, INSERTED if
    *     not (upsert — CDC feeds rarely distinguish reliably);
    *   - keys without a change row pass through untouched.
    *
    * `changes` must carry `opCol` plus exactly the snapshot's columns
    * (checked), and at most one change row per key (checked at plan
    * build only by contract — a feed with intra-batch churn should be
    * pre-collapsed to its LAST change per key, e.g. via
    * [[DedupOps]]/max_by, because "which row wins" would otherwise be
    * nondeterministic).
    *
    * Shape: ONE full-outer join on the key columns — both sides shuffle
    * on the key (or the changeset broadcasts when small, the common CDC
    * case; left to the planner/AQE since changeset size is a runtime
    * fact). Payload resolution is a codegen'd per-column coalesce. At
    * 100 TB the snapshot side would be bucketed on the key so only the
    * (small) changeset moves.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String = "__op"): DataFrame = {
    val payload = snapshot.columns.filterNot(keyCols.contains)
    val expected = (keyCols ++ payload :+ opCol).sorted
    require(changes.columns.sorted.sameElements(expected),
      s"changes columns ${changes.columns.sorted.mkString(",")} != expected ${expected.mkString(",")}")
    // op codes are VALIDATED in-plan: an unrecognized code (e.g. 'I' —
    // some CDC feeds spell inserts that way — or a case typo) must fail
    // loudly at execution, not silently fall through the 'U'-only keep
    // filter below and DELETE the key
    val opChecked = when(col(opCol).isin("U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit("MergeOps.applyChanges: unknown op '"), col(opCol),
        lit("' (expected 'U' or 'D'; collapse/translate the feed first)"))))
    val ch = changes.select(
      (keyCols.map(col) :+ opChecked.as("__op") :+ lit(true).as("__changed")) ++
        payload.map(c => col(c).as(s"__ch_$c")): _*)
    snapshot.join(ch, keyCols, "full_outer")
      // drop deleted keys AND delete-rows for absent keys (an all-null
      // ghost row would otherwise appear for the latter)
      .filter(col("__op").isNull || (col("__op") === "U"))
      // when/otherwise, NOT coalesce: an upsert whose payload column is
      // legitimately NULL must WIN (null out the field), not fall back
      // to the stale snapshot value; unmatched rows have __changed null,
      // which routes to the otherwise (snapshot) branch
      .select((keyCols.map(col) ++ payload.map(c =>
        when(col("__changed"), col(s"__ch_$c")).otherwise(col(c)).as(c))): _*)
  }
}
