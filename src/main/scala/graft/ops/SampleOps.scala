package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting.
  *
  * Training-data pipelines need splits and samples that are STABLE: the
  * same row lands in the same split on every run, on every engine, at
  * any scale, regardless of partitioning — which rules out `rand()` and
  * Spark's `sample`/`sampleBy` (seeded per-partition, so repartitioning
  * reshuffles membership). The portable form is hash-mod bucketing on a
  * business key: `md5` is bit-identical everywhere, so a DuckDB oracle
  * (or any other engine) reproduces membership exactly. Per-row
  * projection, codegen'd, no shuffle of its own.
  */
object SampleOps {

  /** Stable bucket in [0, buckets) from the md5 of the key's string form.
    * Mirror SQL: `CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)),1,4))
    * AS INTEGER) % buckets` (16 hex bits, so `buckets` must divide the
    * space finely enough — fine for percent-style splits).
    *
    * Accepted bias: 65536 % buckets leaves the first `65536 mod buckets`
    * buckets one 1/65536-slice heavier (~0.15% relative at buckets=100) —
    * irrelevant at split granularity, and NOT silently fixable: widening
    * the hash re-keys every existing split membership, so it stays as
    * recorded unless a deliberate membership migration re-keys oracle
    * and engine in lock-step.
    */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0 && buckets <= 65536, "buckets must be in (0, 65536]")
    // native digest-prefix form of conv(substring(md5(k),1,4),16,10) —
    // same integer, no hex string or base-16 parse (round-21 opt;
    // Md5FeaturesSpec pins equality with the conv spelling)
    call_function("md5_bucket16", key.cast("string")) % buckets
  }

  /** Named split assignment from cumulative percent bounds, e.g.
    * `Seq("train" -> 80, "val" -> 90, "test" -> 100)`: bucket < 80 →
    * train, < 90 → val, else test. Bounds must be increasing and end at
    * exactly 100 so every row gets a split.
    */
  def splitAssign(key: Column, bounds: Seq[(String, Int)]): Column = {
    require(bounds.nonEmpty && bounds.last._2 == 100 &&
      bounds.map(_._2) == bounds.map(_._2).sorted && bounds.map(_._2).distinct == bounds.map(_._2),
      "bounds must be increasing cumulative percents ending at 100")
    val b = hashBucket(key, 100)
    bounds.init.foldRight(lit(bounds.last._1): Column) { case ((name, hi), rest) =>
      when(b < hi, name).otherwise(rest)
    }
  }

  /** Keep a stable `percent`% of rows by key hash — deterministic
    * downsampling (same subset every run/engine). */
  def sampleByHash(df: DataFrame, key: Column, percent: Int): DataFrame =
    df.filter(hashBucket(key, 100) < percent)

  /** Mixture sampling: per-source keep rates — the training-data mixing
    * step (Pile/LLaMA-style source weights) expressed as deterministic
    * membership. Each row keeps iff its key's [[hashBucket]] falls under
    * its source's percent (sources absent from `rates` take
    * `defaultPct`), so membership is stable across runs, engines, and
    * partitionings, and a rate CHANGE only adds or removes the marginal
    * hash slice — rows kept at 25% remain kept at 50% (nested samples,
    * the property that makes mixture re-weighting reproducible without
    * re-materializing every source). Pure codegen'd projection+filter,
    * no shuffle; up-weighting (>100%) is epoch repetition, a `explode`
    * of `sequence` upstream, deliberately out of scope here.
    */
  def mixtureSample(df: DataFrame, source: Column, key: Column,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    (rates.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"rate out of [0,100]: $p"))
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct): Column) {
      case (acc, (s, p)) => when(source === s, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(key, 100) < rate)
  }

  /** Rebalancing cap: keep at most `cap` rows per stratum, chosen in
    * md5-of-key order — a deterministic pseudo-random pick (downsampling
    * a dominant language never selects "the first N in file order").
    * One keyed shuffle (window per stratum); at production scale a
    * pathologically hot stratum is one window partition, so pair with a
    * coarse [[sampleByHash]] pre-filter when a stratum exceeds memory.
    */
  def stratifiedCap(df: DataFrame, strata: Column, key: Column, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata).orderBy(md5(key.cast("string")), key)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** WEIGHTED systematic sample: walk the corpus in `orderCol` order and
    * keep every row whose weight span crosses a multiple of `step` —
    * i.e. one representative per `step` units of cumulative weight
    * (inclusion probability ∝ weight, the PPS-sampling shape, with zero
    * randomness: same rows on every engine and run). Rows heavier than
    * `step` are always kept (they cross at least one boundary) — the
    * certainty-inclusion property exact PPS designs want.
    *
    * The cumulative weight rides [[PrefixOps.withExclusivePrefixSum]]'s
    * two-level scan, so NOTHING here single-partitions or grows with the
    * corpus: the naive `sum() OVER (ORDER BY ..)` form this replaces is
    * the oracle's job. Selected rows keep their exclusive prefix as
    * `cumBeforeCol` (the grade pins the whole walk, not just membership).
    *
    * @param orderCol  unique long walk order (ties would make the walk
    *                  ambiguous — enforced by PrefixOps)
    * @param weightCol nonnegative integer weights (bigint)
    * @param step      sampling interval in weight units, > 0
    */
  def weightedSystematic(df: DataFrame, orderCol: String, weightCol: String,
      step: Long, cumBeforeCol: String = "cum_before"): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    PrefixOps.withExclusivePrefixSum(df, orderCol, weightCol, cumBeforeCol)
      .filter(expr(
        s"$cumBeforeCol div ${step}L < ($cumBeforeCol + $weightCol) div ${step}L"))
  }
}
