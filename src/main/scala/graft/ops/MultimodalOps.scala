package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal columns for a training-data pipeline: media payloads are
  * opaque `binary` columns with typed metadata, and feature extraction is
  * a per-partition batch transform (`mapPartitions` over a typed Dataset
  * — the Scala analog of `mapInPandas`: one decoder instantiation per
  * partition, streamed row batches, never a driver collect).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[FakeDecoder]] is a deterministic stand-in that
  * fabricates plausible features from the bytes. The Spark-side plumbing
  * — schema, encoders, partition-wise batching, output shape — is real
  * and tested; swapping in a real decoder changes only `decode()`.
  */
object MultimodalOps {

  /** A media row: opaque payload + metadata. */
  final case class MediaRow(media_id: Long, kind: String, uri: String, bytes: Array[Byte])

  /** Extracted features (what a real image/audio decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      embedding: Array[Float])

  /** STUB decoder: deterministic pseudo-features from the payload bytes.
    * A real implementation would decode the codec here — per-partition
    * instantiation means codec state (decoder contexts, model weights)
    * is created once per task, not per row.
    */
  final class FakeDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val h = java.util.Arrays.hashCode(row.bytes)
      val dims = 8
      val emb = Array.tabulate(dims)(i => ((h * (i + 1)).toFloat / Int.MaxValue))
      MediaFeatures(
        media_id = row.media_id,
        kind = row.kind,
        n_bytes = row.bytes.length.toLong,
        width = if (row.kind == "image") 16 + math.abs(h % 4096) else 0,
        height = if (row.kind == "image") 16 + math.abs((h / 7) % 4096) else 0,
        duration_ms = if (row.kind == "audio" || row.kind == "video") math.abs(h % 600000L) else 0L,
        embedding = emb)
    }
  }

  /** Partition-wise feature extraction: the real operator shape. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new FakeDecoder // once per partition, not per row
      rows.map(decoder.decode)
    }
  }

  /** Frame/chunk sampling: every `stride`-th fixed-size slice of the
    * payload (the shape of video frame-sampling), as exploded rows —
    * a generator op, still fully distributed.
    */
  def sampleChunks(media: Dataset[MediaRow], chunkSize: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.bytes.grouped(chunkSize).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => (r.media_id, i, chunk.length, java.util.Arrays.hashCode(chunk)) }
    }.toDF("media_id", "chunk_idx", "chunk_len", "chunk_hash")
  }

  /** Attach a decoded-feature column set to a metadata DataFrame by key
    * (the join-back step after extraction). */
  def joinFeatures(meta: DataFrame, feats: Dataset[MediaFeatures]): DataFrame =
    meta.join(feats.toDF(), Seq("media_id"), "left")
}
