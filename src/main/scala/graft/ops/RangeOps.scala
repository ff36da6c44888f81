package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range joins at scale.
  *
  * Spark plans `l.key == r.key AND r.ts BETWEEN l.ts + lower AND l.ts +
  * upper` as an equi-join on the key with the band as a post-join filter:
  * every same-key pair is materialized before the band prunes it, so one
  * hot key (a bot user with 10^7 events) costs 10^14 candidate pairs
  * inside a single task. The binned form bounds that: bucket the time
  * axis by the band width, replicate each LEFT row into the (at most two)
  * buckets its band can reach, and equi-join on (key, bucket) before the
  * exact band filter — per-task work becomes O(rows-per-bucket²) with
  * the bucket width matched to the band, not O(rows-per-key²).
  */
object RangeOps {

  /** All pairs (left, right) with `leftKey == rightKey` and
    * `rightTs ∈ [leftTs + lowerUs, leftTs + upperUs]` (bounds inclusive,
    * offsets in microseconds, `lowerUs <= upperUs`).
    *
    * Each right row lands in ONE bucket (`floor(ts / width)`); each left
    * row is replicated over the `<= 2` buckets its band overlaps (band
    * length == width by construction), so a matching pair meets in
    * exactly one bucket — no post-join distinct needed. The explode is a
    * narrow ≤2× expansion; the join is a plain equi-join on
    * (key, bucket) that shuffles both sides once and co-partitions.
    *
    * Column-name contract: the caller pre-renames so the two frames
    * share no column names (same as the LSH `side()` helpers).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      lowerUs: Long, upperUs: Long): DataFrame = {
    require(lowerUs <= upperUs, s"empty band: [$lowerUs, $upperUs]")
    val width = math.max(1L, upperUs - lowerUs)
    val lUs = unix_micros(col(leftTs))
    val rUs = unix_micros(col(rightTs))
    // EXACT floor division at any magnitude: subtract the remainder
    // (pmod is always non-negative, so a - pmod(a, w) is the floor
    // multiple even for negative a), then INTEGRAL division — `div`
    // stays in longs end to end. A double division would round across
    // bucket boundaries once |ts| clears 2^53.
    def bucket(a: org.apache.spark.sql.Column) =
      call_function("div", a - pmod(a, lit(width)), lit(width))
    val r = right.withColumn("__rb", bucket(rUs))
    val l = left.withColumn("__lb",
      explode(sequence(bucket(lUs + lit(lowerUs)), bucket(lUs + lit(upperUs)))))
    val joined = l.join(r,
      col(leftKey) === col(rightKey) && col("__lb") === col("__rb") &&
        rUs >= lUs + lit(lowerUs) && rUs <= lUs + lit(upperUs))
    // this join still CONTAINS equi + band conjuncts, so the automatic
    // rewrite (plans/BinnedIntervalJoin) would bin it a second time —
    // mark it as already binned (tags survive plan rewrites; the
    // PlanSpec one-Generate pin fails loudly if that ever stops holding)
    joined.queryExecution.analyzed.foreach {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.setTagValue(graft.plans.BinnedIntervalJoin.BinnedTag, true)
      case _ => ()
    }
    joined.drop("__lb", "__rb")
  }

  /** INTERVAL × INTERVAL overlap join — all pairs with
    * `[ls, le] ∩ [rs, re] ≠ ∅` (closed intervals in a shared integer
    * domain, e.g. epoch-µs; touching endpoints count): the concurrency
    * primitive [[intervalJoin]]'s point-in-band form can't express,
    * since BOTH sides have extent.
    *
    * Both sides replicate over the `widthUs` buckets their interval
    * covers and equi-join on the bucket, so per-task work is bounded by
    * bucket occupancy — never |left|×|right|. A candidate pair meets in
    * EVERY shared bucket; the join keeps it only in the one bucket
    * containing `greatest(ls, rs)` (the overlap's left edge — a bucket
    * both sides by construction cover), so each pair survives exactly
    * once with NO post-join distinct. Extra predicates (e.g. an
    * anti-reflexivity key guard) belong in `extraCond`, INSIDE the join
    * so they prune before the shuffle output materializes.
    *
    * Replication factor is `len/width + 1` per row — pick `widthUs`
    * near the typical interval length (the [[intervalJoin]] sizing
    * rule applied to two extended sides). Column-name contract: caller
    * pre-renames so the frames share no names.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      widthUs: Long,
      extraCond: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    require(widthUs > 0, s"bucket width must be positive, got $widthUs")
    def bucket(a: org.apache.spark.sql.Column) =
      call_function("div", a - pmod(a, lit(widthUs)), lit(widthUs))
    // INVERTED intervals (end < start) are DROPPED, not matched: an empty
    // interval overlaps nothing. Without the guard, `sequence` would
    // generate a DESCENDING bucket list for a malformed row (Spark flips
    // the step to -1) and the band conjuncts can still hold — garbage
    // matches shipping silently. The data-dependent analog of
    // [[intervalJoin]]'s static lowerUs <= upperUs precondition,
    // spec-pinned in RangeOpsSpec.
    val l = left.filter(col(lEnd) >= col(lStart)).withColumn("__lb",
      explode(sequence(bucket(col(lStart)), bucket(col(lEnd)))))
    val r = right.filter(col(rEnd) >= col(rStart)).withColumn("__rb",
      explode(sequence(bucket(col(rStart)), bucket(col(rEnd)))))
    val joined = l.join(r,
      col("__lb") === col("__rb") &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        bucket(greatest(col(lStart), col(rStart))) === col("__lb") &&
        extraCond)
    // like intervalJoin: mark the join as already binned so an extraCond
    // that happens to carry a two-sided band on one column pair (e.g.
    // "AND the starts are within an hour") can't make the injected
    // BinnedIntervalJoin rule wrap a SECOND Generate around the
    // already-exploded side
    joined.queryExecution.analyzed.foreach {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.setTagValue(graft.plans.BinnedIntervalJoin.BinnedTag, true)
      case _ => ()
    }
    joined.drop("__lb", "__rb")
  }
}
