package graft

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRow
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing is real even though the codec is stubbed:
  * schema, typed encoders, per-partition batching, generator explode.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  private def media() = {
    import spark.implicits._
    Seq(
      MediaRow(1L, "image", "s3://m/1.jpg", Array.tabulate(256)(_.toByte)),
      MediaRow(2L, "audio", "s3://m/2.wav", Array.tabulate(1024)(i => (i * 7).toByte)),
      MediaRow(3L, "video", "s3://m/3.mp4", Array.tabulate(4096)(i => (i * 13).toByte)))
      .toDS().repartition(2)
  }

  test("feature extraction: schema, determinism, per-kind fields") {
    val feats = MultimodalOps.extractFeatures(media())
    assert(feats.columns.toSeq == Seq(
      "media_id", "kind", "n_bytes", "width", "height", "duration_ms", "embedding"))
    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.map(_.n_bytes).toSeq == Seq(256L, 1024L, 4096L))
    val img = rows.find(_.kind == "image").get
    assert(img.width > 0 && img.height > 0 && img.duration_ms == 0L)
    val aud = rows.find(_.kind == "audio").get
    assert(aud.width == 0 && aud.duration_ms >= 0L)
    assert(rows.forall(_.embedding.length == 8))
    // deterministic: a second run produces identical features
    val again = MultimodalOps.extractFeatures(media()).collect().sortBy(_.media_id)
    assert(again.map(_.embedding.toSeq).toSeq == rows.map(_.embedding.toSeq).toSeq)
  }

  test("chunk sampling explodes every stride-th fixed-size slice") {
    val chunks = MultimodalOps.sampleChunks(media(), chunkSize = 512, stride = 2)
    val byId = chunks.collect().groupBy(_.getLong(0))
    // 4096 bytes -> 8 chunks -> every 2nd -> 4
    assert(byId(3L).length == 4)
    // 256 bytes -> 1 chunk -> 1
    assert(byId(1L).length == 1)
    assert(byId(3L).forall(_.getInt(2) == 512))
  }

  test("join-back attaches features by key") {
    import spark.implicits._
    val meta = Seq((1L, "a"), (2L, "b"), (99L, "missing")).toDF("media_id", "tag")
    val joined = MultimodalOps.joinFeatures(meta, MultimodalOps.extractFeatures(media()))
    assert(joined.count() == 3)
    assert(joined.filter($"media_id" === 99L).select("n_bytes").head().isNullAt(0))
  }
}
