package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native AS-OF join — the `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * rung of the extension ladder (SURVEY §2.5; the `Expression` and
  * `Rule[LogicalPlan]` rungs are `expressions/VecDot` and
  * `plans/BinnedIntervalJoin`).
  *
  * Semantics: every LEFT row is matched to the single most recent RIGHT
  * row with equal keys and `rightTs <= leftTs` (inclusive — DuckDB /
  * pandas `merge_asof` backward semantics). Inner form drops unmatched
  * left rows; `leftOuter = true` keeps them null-padded. Rows with a null
  * key or null timestamp never match (SQL comparison semantics).
  *
  * Why a whole physical operator when q54 already composes the same
  * answer from union + window (`queries/EventQs.q54`)? The composed form
  * is what you build from stock operators; the native form is what an
  * engine does: shuffle each side ONCE by key, sort each side by
  * (key, ts) — both planned by Spark's own `EnsureRequirements`, so AQE
  * coalescing, reuse, and the sort-elimination rules all still apply —
  * then a single O(n+m) forward merge per partition with ONE buffered
  * right row of state. No union doubling, no null-tagged side columns
  * riding through a window frame, no window-function state machinery.
  * The same shape Spark's own SortMergeJoinExec uses, specialized to the
  * as-of predicate Spark cannot express as a join type.
  *
  * Scale posture: two keyed exchanges (the minimum for co-locating both
  * sides), map-side nothing to combine (row-level lookup), per-task
  * memory O(1) beyond the sorter — the merge never buffers a key group,
  * unlike SMJ's inner-equal-key buffer, because as-of needs only the
  * LAST right row seen. Skewed hot keys cost the sort, not a quadratic
  * pair expansion.
  *
  * Determinism: if several right rows share (key, ts), "the most recent"
  * is whichever the sort placed last — dedup the right side first (q58
  * does, exactly like q54 and its DuckDB ASOF oracle) when a total answer
  * is required.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    leftOuter: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Column pruning for [[AsOfJoinPlan]] — Catalyst's own `ColumnPruning`
  * only understands stock operators, so without this rule whatever the
  * caller's inputs carry is what shuffles (both sides exchange on their
  * keys). [[AsOfJoin.apply]] always leaves a name-restoring `Project`
  * directly above the node, and any narrower user selection collapses
  * into it (`CollapseProject`), so matching `Project(_, AsOfJoinPlan)`
  * here sees the full set of columns actually consumed downstream; both
  * children are cut to those plus the join's own keys/timestamps, and the
  * stock rules then push the inserted projections all the way into the
  * scans (`ReadSchema` shrinks — pinned by `AsOfJoinSpec`). Fires only
  * when a child actually narrows, so the fixpoint batch converges. */
object AsOfJoinPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(_, j: AsOfJoinPlan) =>
      val required = AttributeSet(p.projectList.flatMap(_.references)) ++ j.references
      def prune(side: LogicalPlan): Option[LogicalPlan] = {
        val keep = side.output.filter(required.contains)
        if (keep.size < side.output.size) Some(Project(keep, side)) else None
      }
      val (nl, nr) = (prune(j.left), prune(j.right))
      if (nl.isEmpty && nr.isEmpty) p
      else p.copy(child =
        j.copy(left = nl.getOrElse(j.left), right = nr.getOrElse(j.right)))
  }
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; registered through
  * `SparkSessionExtensions.injectPlannerStrategy` in `GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, outer) =>
      AsOfJoinExec(lk, rk, lt, rt, outer, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned (ClusteredDistribution on the full
  * key set, both sides) and co-sorted ((keys, ts) ascending, both sides),
  * then a per-partition forward merge.
  *
  * The merge keeps exactly one candidate: the last right row consumed
  * with a non-null timestamp. Both inputs arrive sorted by (keys, ts), so
  * for successive left rows the qualifying right prefix only ever grows —
  * each right row is consumed once, O(n + m) per partition, O(1) state.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    leftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** Full-key hash clustering on BOTH sides: `requireAllClusterKeys`
    * forbids Spark from accepting a subset-key partitioning that would
    * break left/right co-location; EnsureRequirements then guarantees the
    * two children land on compatible HashPartitionings with equal
    * partition counts (the zipPartitions precondition). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  /** Left rows pass through in order, so partitioning and ordering are the
    * left child's — downstream per-key aggregations reuse the exchange. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val outAttrs = output
    val outer = leftOuter

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lKeyExprs, lOut)
      val rKey = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsP = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsP = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val joined = new JoinedRow
      // output attrs bind by exprId; the INPUT schema must also carry the
      // outer nullability, or codegen elides the null check on right
      // columns and reads zeros out of the all-null pad row
      val bindInput = if (outer) lOut ++ rOut.map(_.withNullability(true))
        else lOut ++ rOut
      val outProj = UnsafeProjection.create(outAttrs, bindInput)
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // current left row state
        private var lRow: InternalRow = _
        private var lKeyRow: UnsafeRow = _
        private var lHasTs = false
        private var lTs = 0L

        // right cursor (one-row lookahead; projection buffers are reused,
        // valid only until the next advance)
        private var rRow: InternalRow = _
        private var rKeyRow: UnsafeRow = _
        private var rHasTs = false
        private var rTs = 0L
        private var rDone = false

        // the candidate: last consumed right row with a non-null ts (its
        // key/row are COPIES — the cursor buffers move on without them)
        private var candRow: InternalRow = _
        private var candKey: UnsafeRow = _

        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKeyRow = rKey(rRow)
            val t = rTsP(rRow)
            rHasTs = !t.isNullAt(0)
            rTs = if (rHasTs) t.getLong(0) else 0L
          } else {
            rDone = true
            rRow = null
          }

        /** Consume right rows into the candidate while they can still be
          * "at or before" the current left row: strictly smaller keys, or
          * the same key with ts <= left ts (null right ts sorts first and
          * is consumed but never recorded). Monotone in the left sort
          * order, so consumed rows never need revisiting. */
        private def consumeRight(): Unit = {
          var continue = !rDone
          while (continue) {
            val c = keyOrd.compare(rKeyRow, lKeyRow)
            if (c < 0 || (c == 0 && lHasTs && (!rHasTs || rTs <= lTs))) {
              if (rHasTs) {
                candRow = rRow.copy()
                candKey = rKeyRow.copy()
              }
              advanceRight()
              continue = !rDone
            } else {
              continue = false
            }
          }
        }

        private var outRow: InternalRow = _
        private var ready = false

        private def computeNext(): Boolean = {
          while (lIter.hasNext) {
            lRow = lIter.next()
            lKeyRow = lKey(lRow)
            val t = lTsP(lRow)
            lHasTs = !t.isNullAt(0)
            lTs = if (lHasTs) t.getLong(0) else 0L
            consumeRight()
            // null keys compare EQUAL in the natural ordering but must not
            // match (SQL equality) — hence the explicit anyNull guard
            val matched = lHasTs && !lKeyRow.anyNull && candRow != null &&
              keyOrd.compare(candKey, lKeyRow) == 0
            if (matched) {
              outRow = outProj(joined(lRow, candRow))
              numOutputRows += 1
              return true
            } else if (outer) {
              outRow = outProj(joined(lRow, nullRight))
              numOutputRows += 1
              return true
            }
          }
          false
        }

        override def hasNext: Boolean = {
          if (!ready) ready = computeNext()
          ready
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          ready = false
          outRow
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public constructor for the native as-of join. */
object AsOfJoin {

  /** `left` rows matched to the most recent `right` row with equal keys
    * and `rightTs <= leftTs`. Key columns must pair up by type; the two
    * timestamp columns must share a µs-integral type (TIMESTAMP or LONG —
    * the domains where the merge's long comparison is exact).
    *
    * The right side's attributes are re-aliased through fresh ids before
    * the node and restored after it, so self-joins (both sides derived
    * from the same relation — attribute ids collide) are always safe; the
    * deliberately non-redundant intermediate names also survive
    * `RemoveRedundantAliases`. Column pruning works through the node:
    * [[AsOfJoinPruning]] cuts both inputs to the columns the query
    * actually consumes (plus keys/timestamps) before the keyed
    * exchanges, so callers may pass wide relations and select after.
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      leftOuter: Boolean = false): DataFrame = {
    require(leftKeys.nonEmpty, "as-of join requires at least one key column")
    require(leftKeys.size == rightKeys.size,
      s"key count mismatch: $leftKeys vs $rightKeys")

    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed

    def res(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: column `$n` not found on the $side side " +
            s"(${out.map(_.name).mkString(", ")})"))

    // fresh exprIds + fresh NAMES for the right side: fresh ids alone
    // could be undone by RemoveRedundantAliases (same-name aliases are
    // "redundant"), silently re-colliding self-join attribute ids
    val prefix = "__graft_asof_"
    val rAliases = rp0.output.map(a => Alias(a, prefix + a.name)())
    val rp = Project(rAliases, rp0)

    val lks = leftKeys.map(res(lp.output, _, "left"))
    val rks = rightKeys.map(k => res(rp.output, prefix + k, "right"))
    lks.zip(rks).zipWithIndex.foreach { case ((a, b), i) =>
      require(a.dataType == b.dataType,
        s"as-of key ${leftKeys(i)}/${rightKeys(i)} type mismatch: " +
          s"${a.dataType} vs ${b.dataType}")
    }
    val lt = res(lp.output, leftTs, "left")
    val rt = res(rp.output, prefix + rightTs, "right")
    require(lt.dataType == TimestampType || lt.dataType == LongType,
      s"as-of timestamp must be TIMESTAMP or LONG (µs-integral), got ${lt.dataType}")
    require(rt.dataType == lt.dataType,
      s"as-of timestamp type mismatch: ${lt.dataType} vs ${rt.dataType}")

    val node = AsOfJoinPlan(lp, rp, lks, rks, lt, rt, leftOuter)
    // restore the right side's user-visible names
    val restored = node.output.take(lp.output.size) ++
      node.output.drop(lp.output.size).zip(rp0.output).map {
        case (a, orig) => Alias(a, orig.name)()
      }
    org.apache.spark.sql.graft.Bridge.ofRows(
      left.sparkSession, Project(restored, node))
  }
}
