package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine pins for the three most intricate oracle-mirror
  * conventions — the determinism arguments that, before this spec, were
  * guarded end-to-end only by the driver's DuckDB gate. Each test
  * compares the SPARK-side implementation against vectors computed by
  * actually running the corresponding DuckDB SQL fragment (DuckDB 1.0.0,
  * 2026-08-14 — regenerate the constants if the oracle engine ever
  * bumps), over planted edge cases plus fixed-seed random inputs. A
  * future Spark upgrade that shifts any of these folds now fails HERE,
  * in a file named after the convention, instead of as an opaque hash
  * mismatch deep inside a banding oracle.
  *
  * The three conventions under pin:
  *  1. FNV-1a 64-bit over token bytes — `ngram_hash64`'s per-token hash,
  *     mirrored in SQL as a `list_reduce` over HUGEINT mod-2^64
  *     arithmetic (q130/q141's `th` CTE). ASCII precondition applies
  *     (CorpusContractSpec pins the corpora; the vectors here are ASCII
  *     by construction).
  *  2. Java `Arrays.hashCode` — the multimodal pseudo-feature seed,
  *     mirrored as the 31·h+b fold recentred into [−2^31, 2^31) each
  *     step (q86/q132's `pseudoEmbSql`).
  *  3. Fixed-point integer log2 — `lq(x) = e·2^16 + (x−2^e)·2^16 div
  *     2^e` with e from the binary-string length (q131/q133's
  *     `lqSparkSql`/`lqDuckSql` pair). Domain: 1 ≤ x < 2^47 (the
  *     ·65536 step must not overflow a signed 64-bit value; graded
  *     inputs are corpus-bounded counts, far below).
  */
class MirrorConventionSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  /** The JVM reference of the FNV-1a fold both engines implement. */
  private def fnv1a64(s: String): Long =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      .foldLeft(-3750763034362895579L /* 0xcbf29ce484222325 */) {
        (h, b) => (h ^ (b & 0xffL)) * 1099511628211L
      }

  // DuckDB: CAST(list_reduce(list_prepend(14695981039346656037,
  //   [unicode(c) for c in chars]), (h,b) -> (xor(h,b)*1099511628211)
  //   % 2^64) AS UBIGINT), printed as signed 64-bit
  private val fnvPinned: Seq[(String, Long)] = Seq(
    "a" -> -5808556873153909620L,
    "The" -> 7853971097557590492L,
    "hello" -> -6615550055289275125L,
    "zz9~" -> -6679051133881837810L,
    "movie" -> 2811366101605532431L,
    "q130" -> 1529417403807129364L,
    "0" -> -5808608550200435537L,
    "~!@#$%^&*()" -> 864895049237107747L,
    "abcdefghijklmnopqrstuvwxyz" -> -8912378807323491678L,
    "cfz/7Q=F$=/i\"-" -> 6254048833125418778L,
    "byGyrQ" -> 7445969435617799509L,
    "TyvJN*LEp5/b)l-CI.q" -> -7074862467996269596L,
    "%MR-^]991B" -> -6286867499412903258L,
    "'&wxX{%|" -> -8765795759090463189L,
    "P]q[lf4>^[x" -> 1318021886597999071L,
    "o&D5\"=\"knshf" -> -855469794345867928L,
    "Ni:T/OL/=n" -> -7391988536152887670L,
    "X'" -> 674819797106115520L,
    "]037s!ptFs)C*!XD7ydq" -> -5208537481185128053L)

  test("FNV-1a token hash: Spark ngram_hash64 == DuckDB HUGEINT fold == JVM reference") {
    import spark.implicits._
    val df = fnvPinned.map(_._1).toDF("text")
      .select(col("text"),
        graft.ops.TextOps.ngramHashes(col("text"), 1).as("hs"))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    fnvPinned.foreach { case (tok, want) =>
      assert(got(tok) === Seq(want),
        s"ngram_hash64('$tok') diverged from the pinned DuckDB fold")
      assert(fnv1a64(tok) === want,
        s"JVM reference fold diverged on '$tok' — the convention itself moved")
    }
  }

  // DuckDB: list_reduce(list_prepend(1, signed bytes),
  //   (h,x) -> ((31*h + x + 2^31) % 2^32 + 2^32) % 2^32 - 2^31)
  private val ahcPinned: Seq[(Seq[Int], Int)] = Seq(
    Seq(0) -> 31,
    Seq(1, 2, 3) -> 30817,
    Seq(127) -> 158,
    Seq(-128) -> -97,
    Seq(-1) -> 30,
    Seq(10, -5, 77, 0, -1) -> 37789402,
    Seq(-128, -111, -94, -77, -60, -43, -26, -9, 8, 25, 42, 59, 76, 93,
      110, 127) -> -1016541559,
    Seq(77, 9, -95, -20, 33, -20, 127, 74, 106, -55, 7) -> -87999638,
    Seq(-2, 6, 91, 76, 57) -> 27050719,
    Seq(-58, 124, -82, -104, -72, -50, -47, 88) -> 419204318,
    Seq(-96, 69, 67, 111, 0, -123, -70, 8, 46, -71, 22, 94, -48, 104,
      -127, 6, -37, -74, 24, -27) -> 1081792861,
    Seq(63, -46, -128, 37, 122) -> 85318849,
    Seq(-71) -> -40,
    Seq(29, -6, -99, -5, -88, -85, 120, -93, -64, -63, 115, -44) -> 1949931692,
    Seq(88, -20, -26, 31, 76, 63, 96, 103, -67) -> -1475780363)

  test("Arrays.hashCode: JVM fold == DuckDB recentred 31h+b HUGEINT fold") {
    ahcPinned.foreach { case (bytes, want) =>
      val got = java.util.Arrays.hashCode(bytes.map(_.toByte).toArray)
      assert(got === want,
        s"Arrays.hashCode(${bytes.mkString(",")}) diverged from the pinned DuckDB fold")
    }
    // and the full pseudo-feature derivation stays a pure function of it
    val emb = new graft.ops.MultimodalOps.FakeDecoder()
      .decode(graft.ops.MultimodalOps.MediaRow(1L, "image", "mem://pin",
        Seq(10, -5, 77, 0, -1).map(_.toByte).toArray)).embedding
    assert(emb(0) === 37789402.toFloat / Int.MaxValue)
  }

  // DuckDB: (length(bin(x))-1)*65536 + ((x - (1<<e))*65536)//(1<<e)
  private val lqPinned: Seq[(Long, Long)] = Seq(
    1L -> 0L, 2L -> 65536L, 3L -> 98304L, 4L -> 131072L, 5L -> 147456L,
    7L -> 180224L, 8L -> 196608L, 9L -> 204800L, 15L -> 253952L,
    16L -> 262144L, 17L -> 266240L, 1023L -> 655232L, 1024L -> 655360L,
    1025L -> 655424L, 65535L -> 1048574L, 65536L -> 1048576L,
    2147483647L -> 2031615L, 1099511640121L -> 2621440L,
    40261189011606L -> 2958576L, 52056990188424L -> 2980547L,
    13554027518672L -> 2853497L, 55441302165234L -> 2986851L,
    8122539878891L -> 2808011L, 15104759494126L -> 2865051L,
    17531284353019L -> 2883130L, 21596709863329L -> 2898502L)

  test("fixed-point log2: Spark lq expression == pinned DuckDB values, monotone") {
    import spark.implicits._
    val df = lqPinned.map(_._1).toDF("x")
      .select(col("x"), expr(graft.queries.TextQs.lqSparkSql("x")).as("lq"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lqPinned.foreach { case (x, want) =>
      assert(got(x) === want, s"lq($x) diverged from the pinned DuckDB value")
    }
    // monotonicity on the pinned grid (the property q131's ranking uses)
    val sorted = lqPinned.sortBy(_._1)
    sorted.zip(sorted.tail).foreach { case ((x1, v1), (x2, v2)) =>
      assert(v1 < v2 || (v1 == v2 && x1 == x2), s"lq not monotone at $x1 -> $x2")
    }
  }
}
