package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the 100-TB posture.
  *
  * Exact dedup is a single hash-partitioned exchange on the key (window
  * form, deterministic survivor — never `dropDuplicates`' arbitrary one).
  * Near-dup is candidate generation (MinHash-LSH or SimHash banding — a
  * shuffle on *bucket* keys, never an all-pairs cross join) followed by an
  * exact verification join, so output quality is exact while the candidate
  * step stays linear-ish in corpus size.
  */
object DedupOps {

  /** Keep exactly one row per key: the first under `order`. One shuffle. */
  def exactDedup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** 2^31-1, Mersenne prime — modulus for the minhash permutation family.
    * 31-bit coefficients keep a*x + b well under 2^63, so the arithmetic
    * never overflows (Spark 4 runs ANSI mode, where wrap-around throws).
    */
  private val MinhashPrime = 2147483647L

  /** Deterministic (a, b) coefficients for `numPerm` Carter-Wegman
    * permutations h_i(x) = (a_i*x + b_i) mod p, a in [1, p), b in [0, p).
    * Seeded, so signatures are stable across runs/executors — required
    * for resumable pipelines.
    */
  private def perms(numPerm: Int, seed: Long): Seq[(Long, Long)] = {
    val r = new java.util.Random(seed)
    Seq.fill(numPerm)(
      (1L + r.nextInt((MinhashPrime - 1).toInt).toLong,
        r.nextInt(MinhashPrime.toInt).toLong))
  }

  /** MinHash signature (array<long> of length `numPerm`) of a distinct
    * shingle array: each shingle is folded to [0, p) first, then run
    * through the permutation family.
    */
  def minhashSignature(shingleArr: Column, numPerm: Int = 64, seed: Long = 42L): Column = {
    val hashed = transform(shingleArr, sh => pmod(xxhash64(sh), lit(MinhashPrime)))
    val sig = perms(numPerm, seed).map { case (a, b) =>
      array_min(transform(hashed, x => pmod(x * lit(a) + lit(b), lit(MinhashPrime))))
    }
    array(sig: _*)
  }

  /** (band_idx, band_hash) rows for LSH bucketing: `bands` slices of
    * `rowsPerBand` signature entries, each hashed to one bucket key.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), j =>
      struct(j.as("band_idx"),
        hash(slice(sig, j * lit(rowsPerBand) + lit(1), lit(rowsPerBand))).as("band_hash")))

  /** 64-bit SimHash of a token array as an array<int> of 64 sign bits
    * (unpacked — band slicing then needs no bit arithmetic). Token
    * repetition weights bits naturally. Single pass per row: no explode,
    * no shuffle of its own.
    */
  def simhashBits(tokenArr: Column): Column = {
    val sums = aggregate(
      tokenArr,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc, bitsOf(xxhash64(t)), (a, b) => a + b))
    transform(sums, s => when(s >= 0, lit(1)).otherwise(lit(0)))
  }

  /** ±1 contribution vector (length 64) from the bits of a 64-bit hash.
    * The Scala DSL's shiftrightunsigned only takes an Int shift, so the
    * SQL function (which accepts a Column) is called directly.
    */
  private def bitsOf(h: Column): Column =
    transform(sequence(lit(0), lit(63)), k =>
      when(call_function("shiftrightunsigned", h, k).bitwiseAND(lit(1L)) === lit(1L), lit(1))
        .otherwise(lit(-1)))

  /** Exact Jaccard between two distinct-element arrays, as an IEEE double
    * (identical in any engine given identical integer cardinalities).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }
}
