package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact GLOBAL order statistics without a global sort.
  *
  * The per-group quantile path (q65) rides one keyed exchange because
  * groups are small next to the corpus. A global quantile has no key: the
  * naive exact form is a corpus-wide sort into one ordered relation — the
  * single-partition bottleneck this library never ships. This operator is
  * the classic two-pass fix (the same fixed-relation-size discipline as
  * [[PrefixOps]]):
  *
  *   pass 1: integer bucket histogram — FIXED bucket count over the
  *     value range, map-side-combined `groupBy(bucket).count()`, so the
  *     shuffled relation is ≤`buckets` rows regardless of corpus size;
  *     the driver folds it into cumulative counts and locates, for each
  *     requested percentile, the bucket holding the target 1-based index
  *     `((n-1)*p) div 100 + 1` (q65's pure-integer "lower" quantile —
  *     both passes and any mirroring engine compute the identical index);
  *   pass 2: rows of the (few) hit buckets are filtered — a pushed-down
  *     range predicate, ~n/buckets rows each — and only those sort,
  *     partitioned per bucket, to pick the intra-bucket offset.
  *
  * Values must be integral (LongType); map decimals exactly first (e.g.
  * price → cents via `(price * 100).cast("long")` — exact for
  * DECIMAL(12,2)). Integer bucket math (`((v - lo) * buckets) div width`)
  * is floor-exact and engine-portable: no IEEE product whose last ulp
  * could move a boundary row across buckets.
  *
  * At 100 TB: two linear scans (the second prunable to the hit buckets by
  * min/max statistics), one ≤`buckets`-row exchange, one ~(hits ×
  * n/buckets)-row exchange. Driver state is one histogram — bounded,
  * like [[PrefixOps]]' bucket totals. Skew caveat: a single value
  * dominating the corpus concentrates its bucket; the refine sort is
  * still bounded by that bucket's population, and `buckets` is the knob.
  */
object QuantileOps {

  /** @param df        input relation
    * @param valueCol  integral (long) value column name
    * @param percentiles integer percentiles in [0, 100], e.g. Seq(50, 90, 99)
    * @param buckets   histogram resolution (fixed, corpus-independent)
    * @return one row per percentile: (p: int, value: long) — the exact
    *         "lower" discrete quantile, same convention as q65
    */
  def exactQuantiles(spark: SparkSession, df: DataFrame, valueCol: String,
      percentiles: Seq[Int], buckets: Int = 4096): DataFrame = {
    import spark.implicits._
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 100),
      s"percentiles must be in [0,100]: $percentiles")

    val v = col(valueCol)
    val stats = df.agg(min(v).as("lo"), max(v).as("hi"), count(v).as("n")).head()
    require(!stats.isNullAt(0), s"$valueCol has no non-null values")
    val (lo, hi, n) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val width = hi - lo + 1
    require(width > 0, "value range overflows Long — shift values first")
    // fail fast here rather than as an opaque ANSI arithmetic error
    // mid-job: the bucket product below needs (width - 1) * buckets to
    // fit a Long
    require(width <= Long.MaxValue / buckets,
      s"value range $width too wide for $buckets-bucket math — pre-scale values")

    // integer bucket id in [0, buckets): ((v - lo) * buckets) div width.
    // (v - lo) <= width - 1, so the product stays < width * buckets —
    // callers with full-range 64-bit values should pre-scale; corpus
    // values (cents, chars, ids) sit far below the overflow line.
    def bucketExpr = expr(s"(($valueCol - $lo) * $buckets) div $width")

    val hist = df.filter(v.isNotNull)
      .groupBy(bucketExpr.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)

    // driver fold: locate each percentile's bucket + intra-bucket rank
    val targets = percentiles.map { p =>
      val idx = (n - 1) * p / 100 + 1 // 1-based global rank, q65's index
      var cum = 0L
      var found: Option[(Long, Long)] = None
      val it = hist.iterator
      while (found.isEmpty && it.hasNext) {
        val (b, c) = it.next()
        if (cum + c >= idx) found = Some((b, cum)) else cum += c
      }
      val (b, before) =
        found.getOrElse(sys.error(s"histogram lost rank $idx — non-integral input?"))
      (p, b, idx - before) // rank within bucket b, 1-based
    }

    val hit = targets.map(_._2).distinct
    // pass 2: per-bucket ascending rank over ONLY the hit buckets, then
    // one broadcast join against the tiny (p, bucket, rank) target list
    val w = org.apache.spark.sql.expressions.Window.partitionBy("b").orderBy(v)
    val ranked = df.filter(v.isNotNull)
      .withColumn("b", bucketExpr)
      .filter(col("b").isin(hit: _*))
      .withColumn("rn", row_number().over(w))
    val tdf = targets.toDF("p", "b0", "rank")
    ranked.join(broadcast(tdf),
        col("b") === col("b0") && col("rn") === col("rank"))
      .select(col("p"), v.as("value"))
      .orderBy("p")
  }
}
