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
  * unbounded state); the checkpoint makes batch delivery exactly-once,
  * so a crash between runs resumes at the unprocessed file, mirroring
  * `Backfill`'s write-then-mark batch loop. At 100 TB the index appends
  * become table-format transactions (Delta/Iceberg append) and the
  * index relation takes the same `capBuckets` straggler guard the batch
  * paths apply — here they are plain parquet dirs at test scale.
  *
  * Layout: `indexDir/bands`, `indexDir/shingles` (seeded by
  * [[seedIndex]]); admissions appended to `outDir/admissions` as
  * (doc_id, status, batch_id).
  */
object DocStream {

  private val Threshold = 0.8

  /** Seed the resident index from an existing corpus (doc_id, text). */
  def seedIndex(corpus: DataFrame, indexDir: String): Unit = {
    val sh = corpus
      .select(col("doc_id"), TextOps.shingleHashes(col("text")).as("shingles"))
      .filter(size(col("shingles")) > 0)
    sh.write.mode("overwrite").parquet(s"$indexDir/shingles")
    DedupOps.minhashBands(sh, "doc_id", numPerm = 64, bands = 16)
      .write.mode("overwrite").parquet(s"$indexDir/bands")
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
    * resident index, append the verdicts, append the admitted docs'
    * bands+shingles. Package-visible so specs can drive it directly. */
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
      // generation when a band bucket goes hot)
      val idxBands = DedupOps.capBuckets(
        spark.read.parquet(s"$indexDir/bands"),
        Seq("band_idx", "band_hash"), 1000)
      val idxSh = spark.read.parquet(s"$indexDir/shingles")

      def verify(cands: DataFrame, aSh: DataFrame): DataFrame =
        cands
          .join(aSh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
          .filter(DedupOps.jaccardFromSizes(
            size(array_intersect(col("sh_a"), col("sh_b"))),
            size(col("sh_a")), size(col("sh_b"))) >= Threshold)
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

      val admissions = docs.select("doc_id")
        .join(dupCorpus, Seq("doc_id"), "left")
        .join(dupBatch, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("__dc"), "dup_corpus")
            .when(col("__db"), "dup_batch")
            .otherwise("new").as("status"),
          lit(batchId).as("batch_id"))
        .persist()
      admissions.write.mode("append").parquet(s"$outDir/admissions")

      val admitted = admissions.filter(col("status") === "new").select("doc_id")
      sh.join(admitted, "doc_id").write.mode("append").parquet(s"$indexDir/shingles")
      bands.join(admitted, "doc_id").write.mode("append").parquet(s"$indexDir/bands")
      admissions.unpersist()
    } finally {
      sh.unpersist()
      bands.unpersist()
    }
  }
}
