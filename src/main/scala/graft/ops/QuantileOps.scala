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

  /** Exact global quantiles via the KLL sketch — the sketch-then-exact-
    * verify pattern q67 uses for heavy hitters, applied to rank queries:
    * one [[SketchOps.QuantileSketch]] pass proposes a narrow VALUE BAND
    * per percentile, an exact pass VERIFIES the band brackets the true
    * rank (count below / count inside — if the error-bearing sketch
    * missed, the band widens and re-verifies, terminating at the full
    * range), and the answer is ranked exactly inside the verified band.
    * The graded output is therefore EXACT and independent of the
    * sketch's merge-tree-dependent content — only the PRUNE comes from
    * the sketch — which is what makes an oracle row possible for the
    * approximate tier at all (the summary itself can never hash-match).
    *
    * vs [[exactQuantiles]]: same contract, different pass-1 summary —
    * the fixed histogram needs the (lo, hi) range up front and spends
    * resolution uniformly; the sketch adapts to the distribution (tight
    * bands where mass concentrates) and needs no range. Driver state is
    * the k·log(n/k) summary + 3 scalars per percentile — bounded.
    * At 100 TB: pass 1 is one mergeable aggregate (≤k·⌈log₂(n/k)⌉
    * values per task partial); each verify round is one conditional-sum
    * scan (map-side combined to |percentiles| rows); the final ranking
    * aggregates per-(p, value) counts map-side before one keyed
    * exchange, and the per-p cumulative window runs over distinct
    * in-band values only (band ≈ 2δ% of ranks; a recursion — re-running
    * the same prune inside the band — would bound it further if a value
    * domain were ever dense enough to need it).
    *
    * @param percentiles integer percentiles in [0, 100]
    * @param k     sketch resolution (level capacity)
    * @param delta initial band half-width in percentile points; must
    *              comfortably exceed the sketch's empirical rank error
    *              (`SketchSpec` pins ≤5% at k=200) — the verify loop
    *              makes this a performance knob, never a correctness one
    * @return one row per percentile: (p: int, value: long), identical
    *         contract and convention to [[exactQuantiles]]
    */
  def sketchedQuantiles(spark: SparkSession, df: DataFrame, valueCol: String,
      percentiles: Seq[Int], k: Int = 400, delta: Int = 8): DataFrame = {
    import spark.implicits._
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 100),
      s"percentiles must be in [0,100]: $percentiles")
    require(percentiles.distinct.size == percentiles.size,
      s"percentiles must be distinct: $percentiles") // verified is keyed by
      // p, so a duplicate could never satisfy `verified.size == size`
    require(delta >= 1, s"band half-width must be >= 1, got $delta")

    val v = col(valueCol)
    val vals = df.filter(v.isNotNull).select(v.as("v"))
    // one pass for stats AND the sketch (both mergeable aggregates)
    val sketch = udaf(new SketchOps.QuantileSketch(k))
    val stats = vals.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      count(lit(1)).as("n"), sketch(col("v").cast("double")).as("s")).head()
    require(!stats.isNullAt(0), s"$valueCol has no non-null values")
    val (lo, hi, n) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    val targets = percentiles.map(p => p -> ((n - 1) * p / 100 + 1)) // 1-based rank
    val summary = stats.getSeq[org.apache.spark.sql.Row](3)
      .map(r => (r.getDouble(0), r.getLong(1)))

    // propose → verify → widen: each round is ONE conditional-sum scan
    // for all percentiles together; ≤ ⌈log₂(100/delta)⌉ + 1 rounds by
    // construction (the full-range band always brackets)
    def propose(p: Int, d: Int): (Long, Long) =
      if (d >= 100) (lo, hi)
      else {
        val lb = SketchOps.QuantileSketch.estimate(summary, math.max(p - d, 0))
        val ub = SketchOps.QuantileSketch.estimate(summary, math.min(p + d, 100))
        (math.max(math.floor(lb).toLong - 1, lo), math.min(math.ceil(ub).toLong + 1, hi))
      }
    var d = delta
    var bands = targets.map { case (p, _) =>
      val (lob, hib) = propose(p, d); (p, lob, hib)
    }
    var verified: Map[Int, (Long, Long, Long)] = Map.empty // p -> (lob, hib, below)
    while (verified.size < percentiles.size) {
      val counts = vals.crossJoin(broadcast(bands.toDF("p", "lob", "hib")))
        .groupBy("p").agg(
          sum(when(col("v") < col("lob"), 1L).otherwise(0L)).as("below"),
          sum(when(col("v") >= col("lob") && col("v") <= col("hib"), 1L)
            .otherwise(0L)).as("inband"))
        .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val bandByP = bands.map(b => b._1 -> (b._2, b._3)).toMap
      verified = verified ++ targets.collect {
        case (p, t) if !verified.contains(p) && {
          val (below, inband) = counts(p)
          below < t && t <= below + inband
        } => p -> (bandByP(p)._1, bandByP(p)._2, counts(p)._1)
      }
      d = d * 2
      bands = targets.collect { case (p, _) if !verified.contains(p) =>
        val (lob, hib) = propose(p, d); (p, lob, hib)
      }
    }

    // exact rank inside the verified bands: per-(p, value) counts
    // (map-side combined), per-p cumulative over distinct band values,
    // first value reaching the in-band target rank
    val vdf = verified.toSeq.map { case (p, (lob, hib, below)) =>
      (p, lob, hib, targets.toMap.apply(p) - below)
    }.toDF("p", "lob", "hib", "r")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("p").orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    vals.join(broadcast(vdf), col("v") >= col("lob") && col("v") <= col("hib"))
      .groupBy("p", "r", "v").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .filter(col("cum") >= col("r") && col("cum") - col("c") < col("r"))
      .select(col("p"), col("v").as("value"))
      .orderBy("p")
  }
}
