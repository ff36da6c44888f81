package graft.streaming

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest admission — q83's incremental dedup as a Structured
  * Streaming loop. Each micro-batch of incoming documents is classified
  * against a RESIDENT band+shingle index (`dup_corpus` / `dup_batch` /
  * `new`, q83's precedence and keep-first policy), and the admitted
  * (`new`) documents' bands and shingles are APPENDED to the index
  * before the next trigger — so every batch deduplicates against the
  * corpus PLUS everything admitted before it: the grow-as-you-ingest
  * loop a production corpus runs.
  *
  * `foreachBatch` is the engine's sanctioned form for exactly this
  * read-classify-append transaction (the classification needs per-batch
  * joins and aggregations that streaming-native operators would hold as
  * unbounded state). foreachBatch delivery is AT-LEAST-once — a crash
  * after any write but before the checkpoint commit re-runs the same
  * batchId on restart — so every write here is made idempotent per
  * batchId: all three outputs (admissions, index shingles, index bands)
  * are PARTITIONED by batch_id and written with dynamic partition
  * overwrite, so a replay replaces its own partition instead of
  * appending beside a partial first attempt; and classification reads
  * the index at `batch_id < batchId`, so a replayed batch never sees
  * its own half-written index rows (a doc cannot classify itself
  * `dup_corpus`). At-least-once delivery + per-batch idempotent writes
  * = effectively-exactly-once, the same discipline as `Backfill`'s
  * idempotent per-month overwrite. At 100 TB the partition overwrites
  * become table-format transactions (Delta/Iceberg replaceWhere) and
  * the index relation takes the same `capBuckets` straggler guard the
  * batch paths apply — here they are plain parquet dirs at test scale.
  *
  * Layout: `indexDir/bands`, `indexDir/shingles` (seeded by
  * [[seedIndex]] into the `batch_id=-1` partition); admissions written
  * to `outDir/admissions` as (doc_id, status) under `batch_id=N`
  * partitions.
  */
object DocStream {

  /** Seed the resident index from an existing corpus (doc_id, text).
    * Seed rows land in the `batch_id=-1` partition so every streamed
    * batch (batchId >= 0) sees them through the `< batchId` read. */
  def seedIndex(corpus: DataFrame, indexDir: String): Unit = {
    val sh = corpus
      .select(col("doc_id"), TextOps.shingleHashes(col("text")).as("shingles"))
      .filter(size(col("shingles")) > 0)
    sh.withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").mode("overwrite")
      .parquet(s"$indexDir/shingles")
    DedupOps.minhashBands(sh, "doc_id", numPerm = 64, bands = 16)
      .withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").mode("overwrite")
      .parquet(s"$indexDir/bands")
  }

  /** Start the admission stream over parquet files of (doc_id, text).
    * AvailableNow + checkpoint: run-to-completion per invocation,
    * resume-exactly-once across invocations. */
  def start(spark: SparkSession, streamDir: String, indexDir: String,
      outDir: String, maxFilesPerTrigger: Int = 1): StreamingQuery = {
    spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(streamDir)
      .writeStream
      .foreachBatch((batch: DataFrame, batchId: java.lang.Long) =>
        admitBatch(batch, indexDir, outDir, batchId))
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One admission transaction: classify the micro-batch against the
    * resident index, write the verdicts, write the admitted docs'
    * bands+shingles — every write an idempotent overwrite of this
    * batch's own `batch_id` partition, so foreachBatch replaying the
    * same batchId (at-least-once delivery) converges to the same state.
    * Package-visible so specs can drive it directly. */
  private[graft] def admitBatch(docs: DataFrame, indexDir: String,
      outDir: String, batchId: Long): Unit = {
    val spark = docs.sparkSession
    val sh = docs
      .select(col("doc_id"), TextOps.shingleHashes(col("text")).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .persist()
    val bands = DedupOps.minhashBands(sh, "doc_id", numPerm = 64, bands = 16)
      .persist()
    try {
      // the index is the relation that grows without bound as admissions
      // accumulate — the same oversized-bucket straggler guard the batch
      // paths apply (inert below the cap, bounds per-trigger pair
      // generation when a band bucket goes hot). Partition pruning on
      // batch_id < batchId excludes any half-written rows a crashed
      // first attempt of THIS batch left behind — replay classifies
      // against exactly the pre-batch index.
      val idxBands = DedupOps.capBuckets(
        spark.read.parquet(s"$indexDir/bands")
          .filter(col("batch_id") < batchId).drop("batch_id"),
        Seq("band_idx", "band_hash"), 1000)
      val idxSh = spark.read.parquet(s"$indexDir/shingles")
        .filter(col("batch_id") < batchId).drop("batch_id")

      // integer-exact J >= 4/5 with array_intersect appearing ONCE (the
      // division form expands the intersect into both numerator and
      // denominator of the join-time condition — see DedupQs.verified)
      def verify(cands: DataFrame, aSh: DataFrame): DataFrame =
        cands
          .join(aSh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
          .filter(lit(9L) * size(array_intersect(col("sh_a"), col("sh_b"))) >=
            lit(4L) * (size(col("sh_a")) + size(col("sh_b"))))
          .select(col("doc_b").as("doc_id")).distinct()

      val streamSide = bands.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_hash"))
      val candsCorpus = streamSide
        .join(idxBands.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_hash")),
          Seq("band_idx", "band_hash"))
        .select("doc_a", "doc_b").distinct()
      val candsBatch = bands
        .select(col("doc_id").as("doc_a"), col("band_idx"), col("band_hash"))
        .join(streamSide, Seq("band_idx", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()

      val dupCorpus = verify(candsCorpus, idxSh).withColumn("__dc", lit(true))
      val dupBatch = verify(candsBatch, sh).withColumn("__db", lit(true))

      docs.select("doc_id")
        .join(dupCorpus, Seq("doc_id"), "left")
        .join(dupBatch, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("__dc"), "dup_corpus")
            .when(col("__db"), "dup_batch")
            .otherwise("new").as("status"),
          lit(batchId).as("batch_id"))
        .write.partitionBy("batch_id").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$outDir/admissions")

      // re-read the just-committed verdicts: breaks the plan lineage to
      // indexDir (Spark refuses to overwrite a path its plan reads) and
      // makes the index writes a pure function of on-disk state
      val admitted = spark.read.parquet(s"$outDir/admissions")
        .filter(col("batch_id") === batchId && col("status") === "new")
        .select("doc_id")
      sh.join(admitted, "doc_id")
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$indexDir/shingles")
      bands.join(admitted, "doc_id")
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$indexDir/bands")
    } finally {
      sh.unpersist()
      bands.unpersist()
    }
  }
}
