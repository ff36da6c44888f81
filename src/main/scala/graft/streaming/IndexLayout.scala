package graft.streaming

import graft.ops.Fs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** On-disk layout shared by the resident streaming indexes ([[DocStream]]
  * bands+shingles, [[VecStream]] vectors): hash-bucketed partition dirs
  * under a GENERATION root with an atomic-pointer swap — a minimal form
  * of the metadata transaction a table format (Delta/Iceberg) provides,
  * which is exactly what these dirs become at 100 TB.
  *
  * {{{
  * indexDir/_buckets                              bucket count nb (seed-time)
  * indexDir/_gen                                  live generation G (absent = 0)
  * indexDir/<rel>/gen=G/bucket=B/batch_id=N/  (parquet data files)
  * }}}
  *
  * Readers resolve `_gen` per query and list only the live generation;
  * [[compact]] writes generation G+1 COMPLETELY, swaps the pointer with
  * an atomic rename ([[Fs.writeAtomic]]), and only then deletes old
  * generations — a crash at any point leaves either the old or the new
  * generation fully live, never a mix (a half-written G+1 is simply
  * unreachable and truncated by the next compaction's overwrite).
  */
private[graft] object IndexLayout {

  /** Conf key for the index bucket count — consulted ONCE, at seed
    * time; thereafter the value persisted in `indexDir/_buckets` is
    * authoritative for that index. */
  val BucketsConfKey = "spark.graft.stream.indexBuckets"
  val DefaultBuckets = 64

  private def hconf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration

  /** Seed-time metadata: fix nb from the conf (layout property, not a
    * query knob) and reset the generation pointer. Returns nb. */
  def initMeta(spark: SparkSession, indexDir: String): Int = {
    val nb = spark.conf.getOption(BucketsConfKey).map(_.toInt)
      .getOrElse(DefaultBuckets)
    require(nb > 0, s"$BucketsConfKey must be > 0: $nb")
    Fs.writeAtomic(s"$indexDir/_buckets", nb.toString.getBytes("UTF-8"), hconf(spark))
    Fs.writeAtomic(s"$indexDir/_gen", "0".getBytes("UTF-8"), hconf(spark))
    nb
  }

  /** The bucket count this index was seeded with. */
  def numBuckets(spark: SparkSession, indexDir: String): Int =
    Fs.readBytes(s"$indexDir/_buckets", hconf(spark))
      .map(b => new String(b, "UTF-8").trim.toInt)
      .getOrElse(throw new IllegalStateException(
        s"$indexDir/_buckets missing — index not seeded"))

  /** Live generation (absent marker = 0). */
  def gen(spark: SparkSession, indexDir: String): Long =
    Fs.readBytes(s"$indexDir/_gen", hconf(spark))
      .map(b => new String(b, "UTF-8").trim.toLong).getOrElse(0L)

  /** Root of `rel`'s live generation. */
  def dataDir(spark: SparkSession, indexDir: String, rel: String): String =
    s"$indexDir/$rel/gen=${gen(spark, indexDir)}"

  /** Write rows (carrying `bucket` and `batch_id` columns) into `rel`'s
    * live generation. `dynamic = true` overwrites exactly the partitions
    * present in the data (the per-batch idempotent form); `false`
    * truncates the whole generation first (the seed/bulk form) and
    * clusters by bucket so the load lands as ONE file per bucket dir —
    * the same layout [[compact]] maintains, instead of
    * tasks × buckets small files. */
  def writeSlice(rows: DataFrame, indexDir: String, rel: String,
      dynamic: Boolean): Unit = {
    val spark = rows.sparkSession
    val data = if (dynamic) rows else rows.repartition(col("bucket"))
    data.write.partitionBy("bucket", "batch_id").mode("overwrite")
      // explicit either way: the batch form must replace only its own
      // partitions, the seed form must truncate — neither may inherit a
      // session-level partitionOverwriteMode
      .option("partitionOverwriteMode", if (dynamic) "dynamic" else "static")
      .parquet(dataDir(spark, indexDir, rel))
  }

  /** Pre-batch index rows from ONLY the named bucket directories of the
    * live generation. The read is rooted at the selected `bucket=B`
    * dirs themselves (one SHALLOW listing of the generation root picks
    * the survivors — O(nb) directory entries, not O(files)), so neither
    * the file LISTING nor the scan ever touches another bucket's tree;
    * `batch_id < batchId` then prunes batch dirs inside them. A
    * filter-only form (`bucket isin ...` over the root) would scan the
    * right files but still eagerly list the whole index — O(total
    * files) driver work per trigger, which is the cost this layout
    * exists to avoid. */
  def residentSlice(spark: SparkSession, indexDir: String, rel: String,
      batchId: Long, buckets: Seq[Int],
      schema: org.apache.spark.sql.types.StructType = null): DataFrame = {
    val root = dataDir(spark, indexDir, rel)
    val present = Fs.list(root, hconf(spark))
      .map(_.getPath.getName).filter(_.startsWith("bucket=")).toSet
    val dirs = buckets.distinct.map(b => s"bucket=$b")
      .filter(present).map(n => s"$root/$n")
    if (dirs.nonEmpty)
      spark.read.option("basePath", root).parquet(dirs: _*)
        .filter(col("batch_id") < batchId)
        .drop("bucket", "batch_id")
    else if (present.nonEmpty)
      // no overlap (or an empty batch): schema from one bucket dir,
      // rows from none
      spark.read.option("basePath", root)
        .parquet(s"$root/${present.head}")
        .filter(lit(false)).drop("bucket", "batch_id")
    else {
      // a completely empty index (seeded from an empty corpus — a
      // legitimate cold start): there are no files to infer a schema
      // from, so the caller's declared row shape is the contract
      require(schema != null,
        s"empty index at $root and no fallback schema declared")
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Fold every batch partition of `rels` into ONE file per bucket dir
    * of generation G+1, then atomically swap the `_gen` pointer and GC
    * the old generations. Fixes the small-files growth the per-batch
    * layout accrues (a bucket gains one `batch_id=N` dir per admitting
    * batch; a year of triggers = thousands of tiny files per bucket).
    *
    * SINGLE-WRITER contract: run only between SUCCESSFUL stream
    * invocations (`Trigger.AvailableNow` run-to-completion — every
    * delivered batch is committed and will never be re-delivered).
    * Compacting while a batch is in flight — or after a crashed
    * invocation whose last batch will replay — would fold that batch's
    * half-written rows into `batch_id=-1`, where the replay's
    * `batch_id < batchId` read could see them. This is the same
    * maintenance-window discipline as a table format's OPTIMIZE job.
    *
    * Compacted rows land in `batch_id=-1`, which every future batch
    * reads; the bucket assignment is untouched, so reader pruning is
    * unchanged. */
  def compact(spark: SparkSession, indexDir: String, rels: Seq[String]): Unit = {
    val g = gen(spark, indexDir)
    rels.foreach { rel =>
      spark.read.parquet(s"$indexDir/$rel/gen=$g")
        .withColumn("batch_id", lit(-1L))
        // every row of a bucket into one task → one file per bucket dir
        .repartition(col("bucket"))
        .write.partitionBy("bucket", "batch_id").mode("overwrite")
        // explicit STATIC overwrite: the truncate-first semantics the
        // crash-recovery story relies on must not depend on a session
        // default of spark.sql.sources.partitionOverwriteMode=dynamic
        .option("partitionOverwriteMode", "static")
        .parquet(s"$indexDir/$rel/gen=${g + 1}")
    }
    Fs.writeAtomic(s"$indexDir/_gen", (g + 1).toString.getBytes("UTF-8"),
      hconf(spark))
    // old generations are unreachable after the swap — best-effort GC
    rels.foreach { rel =>
      Fs.list(s"$indexDir/$rel", hconf(spark))
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith("gen=") && n.stripPrefix("gen=").toLong <= g
        }
        .foreach(st => Fs.delete(st.getPath.toString, hconf(spark)))
    }
  }

  /** The operational trigger for [[compact]]: fold only when some bucket
    * of some rel has accrued more than `maxDirsPerBucket` batch
    * partitions (the small-files pressure signal — read amplification
    * grows with dirs-per-bucket, not index size). Shallow listings only;
    * same single-writer contract as [[compact]]. Returns whether a
    * compaction ran. */
  def maybeCompact(spark: SparkSession, indexDir: String, rels: Seq[String],
      maxDirsPerBucket: Int = 32): Boolean = {
    val g = gen(spark, indexDir)
    val pressured = rels.exists { rel =>
      Fs.list(s"$indexDir/$rel/gen=$g", hconf(spark)).exists { b =>
        b.getPath.getName.startsWith("bucket=") &&
          Fs.list(b.getPath.toString, hconf(spark))
            .count(_.getPath.getName.startsWith("batch_id=")) > maxDirsPerBucket
      }
    }
    if (pressured) compact(spark, indexDir, rels)
    pressured
  }
}
