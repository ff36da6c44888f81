package graft.queries

import java.nio.{ByteBuffer, ByteOrder}

import graft.Q
import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRow
import org.apache.spark.sql.functions._

/** Oracle-graded multimodal header decode (q86). The corpus has no binary
  * column, so the payloads are PLANTED IN-PLAN: deterministic fixture
  * bytes (the same public byte layouts `MultimodalSpec` pins — BMP
  * BITMAPINFOHEADER, PNG IHDR, GIF89a screen descriptor, JPEG FF-marker
  * walk to SOF0, RIFF/WAVE chunk walk) hex-encoded once at object init
  * and fed to BOTH engines as literals. The Spark side `unhex`es them
  * into the real `mapPartitions` decoder path ([[MultimodalOps
  * .extractFeatures]]); the DuckDB oracle RE-PARSES the same hex with
  * byte-extraction SQL (`'0x' || substr(hex, 2*off+1, 2)` casts) — LE/BE
  * int fields, the PNG color-type channel table, the signed/top-down BMP
  * height, a 2-hop JPEG segment walk that reads the real length fields,
  * and the WAV fmt-size-derived data-chunk offset. Hash-exact equality
  * therefore grades the DECODERS, not a hand-typed expected table.
  *
  * The `embedding` column (JVM `Arrays.hashCode` pseudo-features) is
  * dropped from the graded projection — mirroring Java's 31x+b overflow
  * fold in SQL would grade the mirror, not the operator.
  */
object MultimodalQs {

  /** Minimal BITMAPINFOHEADER BMP (14-byte file header + 40-byte DIB). */
  private def bmpBytes(width: Int, height: Int, bpp: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54).putInt(0).putInt(54)
    buf.putInt(40)
    buf.putInt(width).putInt(height)
    buf.putShort(1).putShort(bpp.toShort)
    buf.array()
  }

  /** 8-byte PNG signature + the mandatory 13-byte IHDR chunk. */
  private def pngBytes(width: Int, height: Int, depth: Int, colorType: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(33)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    buf.putInt(13)
    buf.put("IHDR".getBytes("US-ASCII"))
    buf.putInt(width).putInt(height)
    buf.put(depth.toByte).put(colorType.toByte)
    buf.put(0.toByte).put(0.toByte).put(0.toByte)
    buf.array()
  }

  /** GIF89a header + logical screen descriptor. */
  private def gifBytes(width: Int, height: Int, depthMinus1: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes("US-ASCII"))
    buf.putShort(width.toShort).putShort(height.toShort)
    buf.put((0x80 | depthMinus1).toByte)
    buf.put(0.toByte).put(0.toByte)
    buf.array()
  }

  /** SOI + APP0(JFIF) + DQT + SOF0 — two skippable segments before the
    * frame header, so both walks (JVM and SQL) must actually read the
    * length fields to find it. */
  private def jpegBytes(width: Int, height: Int, precision: Int, comps: Int): Array[Byte] = {
    val app0Payload = 14 // JFIF\0 + version + units + densities + thumb
    val dqtPayload = 3
    val sofLen = 8 + 3 * comps
    val buf = ByteBuffer.allocate(2 + (2 + 2 + app0Payload) + (2 + 2 + dqtPayload) + 2 + sofLen)
    buf.putShort(0xFFD8.toShort) // SOI
    buf.putShort(0xFFE0.toShort).putShort((2 + app0Payload).toShort)
    buf.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    buf.put(Array.fill[Byte](app0Payload - 5)(0))
    buf.putShort(0xFFDB.toShort).putShort((2 + dqtPayload).toShort)
    buf.put(Array.fill[Byte](dqtPayload)(0))
    buf.putShort(0xFFC0.toShort).putShort(sofLen.toShort)
    buf.put(precision.toByte)
    buf.putShort(height.toShort).putShort(width.toShort)
    buf.put(comps.toByte)
    buf.put(Array.fill[Byte](3 * comps)(0))
    buf.array()
  }

  /** Canonical 44-byte PCM WAV header + `dataLen` silence bytes. */
  private def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      dataLen: Int): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(channels.toShort)
    buf.putInt(sampleRate).putInt(byteRate)
    buf.putShort((channels * bitsPerSample / 8).toShort)
    buf.putShort(bitsPerSample.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    buf.array()
  }

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  /** The planted payloads: (media_id, declared kind, format tag, hex). */
  private val fixtures: Seq[(Long, String, String, String)] = Seq(
    (1L, "image", "bmp", hex(bmpBytes(640, 480, bpp = 24))),
    (2L, "image", "bmp", hex(bmpBytes(13, -7, bpp = 32))), // top-down height
    (3L, "image", "png", hex(pngBytes(1920, 1080, depth = 8, colorType = 6))),
    (4L, "image", "png", hex(pngBytes(31, 17, depth = 16, colorType = 0))),
    (5L, "image", "gif", hex(gifBytes(320, 200, depthMinus1 = 7))),
    (6L, "image", "jpeg", hex(jpegBytes(800, 600, precision = 8, comps = 3))),
    (7L, "image", "jpeg", hex(jpegBytes(4096, 2160, precision = 12, comps = 1))),
    (8L, "audio", "wav", hex(wavBytes(44100, channels = 2, bitsPerSample = 16, dataLen = 200))),
    (9L, "audio", "wav", hex(wavBytes(8000, channels = 1, bitsPerSample = 8, dataLen = 4000))))

  // ---- DuckDB-side byte extraction over the hex literal (0-based offs) --
  private def byteAt(off: String): String =
    s"CAST('0x' || substr(hx, 2*($off)+1, 2) AS BIGINT)"
  private def le16(off: String): String =
    s"(${byteAt(off)} + 256*${byteAt(s"($off)+1")})"
  private def be16(off: String): String =
    s"(256*${byteAt(off)} + ${byteAt(s"($off)+1")})"
  private def le32(off: String): String =
    s"(${le16(off)} + 65536*${le16(s"($off)+2")})"
  private def be32(off: String): String =
    s"(65536*${be16(off)} + ${be16(s"($off)+2")})"
  /** Signed little-endian int32 (for the BMP top-down height). */
  private def le32s(off: String): String =
    s"(CASE WHEN ${le32(off)} >= 2147483648 THEN ${le32(off)} - 4294967296 ELSE ${le32(off)} END)"

  /** One oracle SELECT per fixture, parsing its format from the hex. */
  private def oracleRow(id: Long, kind: String, fmt: String, hx: String): String = {
    val base = s"SELECT CAST($id AS BIGINT) AS media_id, '$kind' AS kind, " +
      s"CAST(length(hx)/2 AS BIGINT) AS n_bytes"
    val fields = fmt match {
      case "bmp" =>
        s"""CAST(${le32("18")} AS INTEGER) AS width,
            CAST(abs(${le32s("22")}) AS INTEGER) AS height,
            CAST(${le16("28")} AS INTEGER) AS bit_depth,
            CAST(0 AS BIGINT) AS duration_ms, 0 AS sample_rate, 0 AS channels"""
      case "png" =>
        s"""CAST(${be32("16")} AS INTEGER) AS width,
            CAST(${be32("20")} AS INTEGER) AS height,
            CAST(${byteAt("24")} * (CASE ${byteAt("25")}
              WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 1
              WHEN 4 THEN 2 WHEN 6 THEN 4 END) AS INTEGER) AS bit_depth,
            CAST(0 AS BIGINT) AS duration_ms, 0 AS sample_rate, 0 AS channels"""
      case "gif" =>
        s"""CAST(${le16("6")} AS INTEGER) AS width,
            CAST(${le16("8")} AS INTEGER) AS height,
            CAST((${byteAt("10")} & 7) + 1 AS INTEGER) AS bit_depth,
            CAST(0 AS BIGINT) AS duration_ms, 0 AS sample_rate, 0 AS channels"""
      case "jpeg" =>
        // 2-hop marker walk: o2/o3 computed from the length fields the
        // payload actually carries (marker at o, length at o+2..3,
        // next segment at o + 2 + len); SOF payload starts at o3+4
        s"""CAST(${be16("o3+7")} AS INTEGER) AS width,
            CAST(${be16("o3+5")} AS INTEGER) AS height,
            CAST(${byteAt("o3+4")} * ${byteAt("o3+9")} AS INTEGER) AS bit_depth,
            CAST(0 AS BIGINT) AS duration_ms, 0 AS sample_rate, 0 AS channels"""
      case "wav" =>
        // data chunk offset derived from the fmt chunk size at 16..19
        s"""0 AS width, 0 AS height, 0 AS bit_depth,
            CAST(${le32("dpos+4")} * 1000 // ${le32("28")} AS BIGINT) AS duration_ms,
            CAST(${le32("24")} AS INTEGER) AS sample_rate,
            CAST(${le16("22")} AS INTEGER) AS channels"""
    }
    val lets = fmt match {
      case "jpeg" =>
        s", (2 + 2 + ${be16("4")}) AS o2, (o2 + 2 + ${be16("o2+2")}) AS o3"
      case "wav" => s", (20 + ${le32("16")}) AS dpos"
      case _ => ""
    }
    s"$base, $fields FROM (SELECT '$hx' AS hx$lets)"
  }

  val q86 = Q(
    "q86_multimodal_decode",
    (s, d) => {
      import s.implicits._
      val media = fixtures
        .map { case (id, kind, fmt, hx) => (id, kind, s"mem://$id.$fmt", hx) }
        .toDF("media_id", "kind", "uri", "hex")
        .select(col("media_id"), col("kind"), col("uri"),
          unhex(col("hex")).as("bytes"))
        .as[MediaRow]
      MultimodalOps.extractFeatures(media)
        .toDF()
        .drop("embedding")
        .orderBy("media_id")
    },
    Some(fixtures.map { case (id, kind, fmt, hx) => oracleRow(id, kind, fmt, hx) }
      .mkString("", " UNION ALL ", " ORDER BY media_id")))

  /** Planted ASCII captions for the cross-modal pairing (q132) —
    * hex-encoded once like the media payloads so the oracle runs the
    * same byte walk over both modalities. */
  private val captions: Seq[(Long, String)] = Seq(
    (1L, "a large landscape bitmap of a sunset over the bay"),
    (2L, "a tiny top down bitmap icon with an alpha channel"),
    (3L, "a full hd truecolor png screenshot with transparency"),
    (4L, "a small grayscale png depth chart at sixteen bits"),
    (5L, "a retro gif title screen at three twenty by two hundred"),
    (6L, "a baseline jpeg photo of a mountain trail in summer"),
    (7L, "a high precision monochrome jpeg scan of a manuscript"),
    (8L, "a short stereo cd quality wav clip of applause"),
    (9L, "a long mono telephone quality wav voicemail recording"))

  private def asciiHex(s2: String): String =
    hex(s2.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** DuckDB mirror of [[MultimodalOps.FakeDecoder.pseudoEmbedding]] over
    * a hex column `hx`: Java `Arrays.hashCode`'s 31·h+b int32-overflow
    * fold (HUGEINT arithmetic recentred into [−2^31, 2^31) each step),
    * then component i = float32(wrap32(h·(i+1))) / float32(2^31−1) —
    * REAL casts reproduce the JVM's exact float rounding (verified
    * bit-identical). Emitted as a SELECT producing ($idCol, emb). */
  private def pseudoEmbSql(src: String, idCol: String): String = s"""
        SELECT $idCol,
          [CAST(CAST(((h*(i+1) + 2147483648) % 4294967296 + 4294967296) % 4294967296
                     - 2147483648 AS BIGINT) AS REAL)
             / CAST(2147483647 AS REAL) for i in range(0, 8)] AS emb
        FROM (
          SELECT $idCol, list_reduce(list_prepend(CAST(1 AS HUGEINT),
              [CASE WHEN u > 127 THEN u - 256 ELSE u END
               for u in [CAST(CAST('0x' || substr(hx, 2*i+1, 2) AS BIGINT) AS HUGEINT)
                         for i in range(0, CAST(length(hx)//2 AS INT))]]),
            (h, x) -> ((31*h + x + 2147483648) % 4294967296 + 4294967296) % 4294967296
                      - 2147483648) AS h
          FROM $src)"""

  private def dot8(a: String, b: String): String =
    s"list_sum([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, 9)])"
  private def cos8(a: String, b: String): String =
    s"(${dot8(a, b)} / (sqrt(${dot8(a, a)}) * sqrt(${dot8(b, b)})))"

  /** CROSS-MODAL pairing — the retrieval step after feature extraction:
    * media payloads and text captions both reduce to embeddings, then
    * every medium ranks the caption set by exact cosine (q41's verified
    * double-fold convention) and keeps its top 3. The media side runs
    * the REAL `mapPartitions` decoder path (`extractFeatures` →
    * pseudo-embedding of the payload bytes); the caption side runs the
    * same path over caption bytes (the stand-in for a text encoder —
    * swapping a real CLIP-style model in is one more [[MultimodalOps
    * .MediaDecoder]] branch, the plumbing under grade here is schema,
    * batching, join direction and ranking). Oracle = the q86 hex-mirror
    * convention extended to the embedding fold: q86 drops the embedding
    * because ITS graded object is the header decoders; here the PAIRING
    * is the graded object, so the oracle must (and does) reproduce the
    * fold bit-exactly — see [[pseudoEmbSql]].
    *
    * Scale shape: caption/query side broadcast (q41's posture), media
    * corpus scans once, the ranking window sees only (media_id, cap_id,
    * cos) — vectors never enter the sort (the round-12 q42 lesson).
    */
  val q132 = Q(
    "q132_crossmodal_match",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val media = fixtures
        .map { case (id, kind, fmt, hx) => (id, kind, s"mem://$id.$fmt", hx) }
        .toDF("media_id", "kind", "uri", "hex")
        .select(col("media_id"), col("kind"), col("uri"),
          unhex(col("hex")).as("bytes"))
        .as[MediaRow]
      val mediaEmb = MultimodalOps.extractFeatures(media).toDF()
        .select(col("media_id"), col("embedding"))
      val caps = captions
        .map { case (id, text) => (id, "text", s"mem://cap/$id",
          text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)) }
        .toDF("media_id", "kind", "uri", "bytes")
        .as[MediaRow]
      val capEmb = MultimodalOps.extractFeatures(caps).toDF()
        .select(col("media_id").as("cap_id"), col("embedding").as("cap_emb"))
      val w = Window.partitionBy("media_id").orderBy(col("cos").desc, col("cap_id"))
      mediaEmb.crossJoin(broadcast(capEmb))
        .select(col("media_id"), col("cap_id"),
          graft.ops.VectorOps.cosine(col("embedding"), col("cap_emb")).as("cos"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 3)
        .select("media_id", "rank", "cap_id", "cos")
        .orderBy("media_id", "rank")
    },
    Some {
      val mediaVals = fixtures
        .map { case (id, _, _, hx) => s"($id, '$hx')" }.mkString(", ")
      val capVals = captions
        .map { case (id, text) => s"($id, '${asciiHex(text)}')" }.mkString(", ")
      s"""
      WITH mraw(media_id, hx) AS (VALUES $mediaVals),
      craw(cap_id, hx) AS (VALUES $capVals),
      me AS (${pseudoEmbSql("mraw", "media_id")}),
      ce AS (${pseudoEmbSql("craw", "cap_id")})
      SELECT CAST(media_id AS BIGINT) AS media_id, rank,
        CAST(cap_id AS BIGINT) AS cap_id, cos
      FROM (
        SELECT m.media_id, c.cap_id, ${cos8("m.emb", "c.emb")} AS cos,
          CAST(row_number() OVER (PARTITION BY m.media_id
            ORDER BY ${cos8("m.emb", "c.emb")} DESC, c.cap_id) AS INT) AS rank
        FROM me m CROSS JOIN ce c) t
      WHERE rank <= 3 ORDER BY media_id, rank"""
    })

  val defs: Seq[Q] = Seq(q86, q132)
}
