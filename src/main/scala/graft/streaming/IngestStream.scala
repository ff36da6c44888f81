package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** FUSED streaming ingest — admission AND tagging in one foreachBatch
  * transaction ([[graft.pipeline.IncrAttrTable.ingestBatch]]). Where
  * [[DocStream]] only classifies (keep `new` docs in the index) and
  * [[AttrStream]] only tags (every arriving doc gets an attribute row),
  * a production ingest does both — and tags ONLY what it admits.
  * Composing the two loops costs two band probes and two index writes
  * per batch for the same dedup decision; this loop makes the decision
  * once: classify against the resident index (quality gate →
  * dup_corpus → dup_batch → new, DocStream's exact precedence), write
  * the verdicts to `root/admissions`, tag the `new` survivors with the
  * full attribute row (model score, cascade mask, frozen-LM perplexity;
  * `is_dup` false by construction — admission already removed every
  * J ≥ 0.8 partner), and append the survivors' bands+shingles once.
  *
  * IngestSpec pins both properties: the fused loop's admitted attribute
  * table equals DocStream-admission followed by batch tagging of the
  * admitted docs, and one micro-batch runs exactly ONE resident band
  * probe.
  *
  * Delivery semantics are [[AttrStream]]'s: every write is idempotent
  * per engine batchId (leaf-directory overwrites + atomic manifest
  * rename), resident reads filter `batch_id <` own, so foreachBatch's
  * at-least-once composes to effectively-exactly-once, and
  * `Trigger.AvailableNow` + checkpoint give run-to-completion per
  * invocation with resume-exactly-once across invocations. The
  * monotone-id contract carries over unchanged and fails loudly.
  */
object IngestStream {

  /** Start the fused admit+tag stream over parquet files of documents
    * (doc_id, text, lang, source, n_chars) from `streamDir` into the
    * artifact at `root`. Schema handling is [[AttrStream.start]]'s:
    * inferred from present files, [[AttrStream.DocumentsSchema]] on an
    * empty/absent cold start, explicit override wins. */
  def start(spark: SparkSession, streamDir: String, root: String,
      maxFilesPerTrigger: Int = 1,
      schema: org.apache.spark.sql.types.StructType = null): StreamingQuery = {
    val eff = Option(schema).getOrElse(AttrStream.inferOrDefault(spark, streamDir))
    val p = new org.apache.hadoop.fs.Path(streamDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    spark.readStream
      .schema(eff)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(streamDir)
      .writeStream
      .foreachBatch((batch: DataFrame, batchId: java.lang.Long) =>
        graft.pipeline.IncrAttrTable.ingestBatch(
          spark, root, batch, broadcastProbe = true, batchId = batchId))
      .option("checkpointLocation", s"$root/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
