package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `vec_dot` expression: bit-equality with the higher-order
  * fold it replaces, SQL-front-end resolution, null propagation.
  */
class VecDotSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  private val sf = "/root/testdata/sf0.001"

  test("vec_dot is bit-identical to the aggregate/zip_with fold") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val fold = aggregate(
      zip_with(col("ea"), col("eb"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = pairs
      .select(call_function("vec_dot", col("ea"), col("eb")).as("native"), fold.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("resolves in the SQL front end via GraftExtensions") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("vd_emb")
    val r = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS sq FROM vd_emb WHERE vec_id = 0").head()
    assert(r.getDouble(0) > 0.0)
  }

  test("null array propagates to null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    val r = df.select(call_function("vec_dot", col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("vec_srp_bits packs exactly the per-plane vec_dot sign bits") {
    val planes: Seq[Seq[Float]] = {
      val r = new java.util.Random(7)
      Seq.fill(64)(Seq.fill(64)(r.nextGaussian().toFloat))
    }
    val e = Tables.embeddings(spark, sf)
    val packed = call_function("vec_srp_bits",
      col("embedding"), typedlit(planes), lit(8))
    // band t's slice of the packed long vs the 8 independent vec_dot signs
    val checks = (0 until 8).map { t =>
      val slice = shiftrightunsigned(packed, t * 8).bitwiseAND(lit(255L)).cast("int")
      val perPlane = (0 until 8).map { p =>
        when(call_function("vec_dot",
          col("embedding"), typedlit(planes(t * 8 + p))) > 0, lit(1 << p))
          .otherwise(lit(0))
      }.reduce(_ + _)
      (slice =!= perPlane).as(s"m$t")
    }
    val bad = e.select(checks: _*)
      .filter((0 until 8).map(t => col(s"m$t")).reduce(_ || _)).count()
    assert(bad == 0, "packed SRP bits diverge from per-plane vec_dot signs")
  }

  test("shingle_hash64 equals the UDF reference row-for-row on the corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val bad = docs.select(
        graft.ops.TextOps.shingleHashes(col("text")).as("a"),
        graft.ops.TextOps.shingleHashReference(col("text"), lit(3)).as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(bad == 0, "native shingle fingerprints diverge from the UDF reference")
    // edge shapes: short docs, empty tokens from double spaces, 1 token
    val edges = Seq("", "a", "a b", "a b c", "a  b c", " a b", "a b c d e")
      .toDF("text")
    val mism = edges.select(
        graft.ops.TextOps.shingleHashes(col("text")).as("a"),
        graft.ops.TextOps.shingleHashReference(col("text"), lit(3)).as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(mism == 0)
    // null text: EMPTY array, same as the UDF reference (a null document
    // has no shingles; size() downstream counts 0, never null)
    val n = Seq(Option.empty[String]).toDF("text")
      .select(graft.ops.TextOps.shingleHashes(col("text")).as("a"),
        graft.ops.TextOps.shingleHashReference(col("text"), lit(3)).as("b"))
      .head()
    assert(!n.isNullAt(0) && n.getSeq[Long](0).isEmpty, "null text must shingle to []")
    assert(n.getSeq[Long](0) == n.getSeq[Long](1), "null-text result diverges from the UDF")
  }

  test("chunk_hash64 equals FNV of the re-joined chunk strings, count == ceil(toks/k)") {
    import spark.implicits._
    // reference: build the chunk STRINGS the spanDedup window form used,
    // hash each with the plain-JVM FNV-1a fold the shingle reference uses
    val fnvRef = udf((text: String, k: Int) =>
      if (text == null) Array.empty[Long]
      else text.split(" ", -1).grouped(k).map { chunk =>
        chunk.mkString(" ").getBytes("UTF-8")
          .foldLeft(0xcbf29ce484222325L)((h, b) => (h ^ (b & 0xffL)) * 0x100000001b3L)
      }.toArray)
    val docs = Tables.documents(spark, sf).select(col("text"))
      .union(Seq("", "a", "a  b c", " a b", "один два три", null).toDF("text"))
    for (k <- Seq(1, 3, 8)) {
      val bad = docs.select(
          graft.ops.TextOps.chunkHashes(col("text"), k).as("a"),
          fnvRef(col("text"), lit(k)).as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(bad == 0, s"chunk_hash64 diverges from the string reference at k=$k")
    }
  }

  test("ngram_hash64 is the multiset form: distinct == shingle set, counts == windows") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select(col("text"))
      .union(Seq("a b a b a b", "x x x", "one two", null).toDF("text"))
    val bad = docs.select(
        array_distinct(graft.ops.TextOps.ngramHashes(col("text"), 3)).as("nd"),
        graft.ops.TextOps.shingleHashes(col("text")).as("sh"),
        size(graft.ops.TextOps.ngramHashes(col("text"), 3)).as("n"),
        greatest(size(split(col("text"), " ")) - lit(2), lit(0)).as("wins"),
        col("text").isNull.as("isnull"))
      .filter(not(col("nd") === col("sh")) ||
        (not(col("isnull")) && col("n") =!= col("wins")) ||
        (col("isnull") && col("n") =!= 0))
      .count()
    assert(bad == 0, "multiset n-gram fingerprints disagree with the shingle set / window count")
  }

  test("native expressions COMPILE under codegen — no interpreted fallback") {
    // a codegen bug in doGenCode is invisible by default: Spark logs the
    // janino error and silently falls back to interpreted eval, so every
    // equality test still passes while the hot path quietly loses codegen
    // (exactly what happened when generated Java referenced a Scala object
    // val as a field instead of its static-forwarder method). CODEGEN_ONLY
    // + fallback=false turn that into a hard failure here.
    import spark.implicits._
    val confs = Seq("spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
      "spark.sql.codegen.fallback" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val docs = Seq("a b c d", null.asInstanceOf[String], "x y").toDF("text")
      val shingled = docs.select(
        graft.ops.TextOps.shingleHashes(col("text")).as("sh"),
        graft.ops.TextOps.ngramHashes(col("text"), 2).as("ng"),
        graft.ops.TextOps.chunkHashes(col("text"), 2).as("ch")).collect()
      assert(shingled.forall(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)))
      val vecs = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      assert(vecs.select(call_function("vec_dot", col("a"), col("b")))
        .head().getDouble(0) == 11.0)
      assert(!vecs.select(call_function("vec_srp_bits", col("a"),
          typedlit(Seq(Seq(1.0f, 1.0f))), lit(1))).head().isNullAt(0))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("shingle_hash64 == reference on random MULTI-BYTE unicode docs (300 samples)") {
    import spark.implicits._
    // the native form hashes contiguous UTF8String byte slices — sound
    // only because 0x20 never occurs inside a multi-byte UTF-8 sequence;
    // this samples exactly that claim (accents, CJK, emoji, empty tokens)
    val words = Seq("the", "café", "naïve", "日本語のテキスト", "🙂🚀", "a", "",
      "Straße", "кот и пёс", "ₓ₁", "é") // includes a combining mark
    val rnd = new scala.util.Random(4242)
    val docs = (1 to 300).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    }.toDF("text")
    val bad = docs.select(
        graft.ops.TextOps.shingleHashes(col("text")).as("a"),
        graft.ops.TextOps.shingleHashReference(col("text"), lit(3)).as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(bad == 0, "byte-slice fingerprints diverge from the String reference on unicode")
  }

  test("vec_srp_bits: null vec is null; non-literal planes are rejected") {
    import spark.implicits._
    val nul = Seq((1L, Option.empty[Seq[Float]])).toDF("id", "v")
    val r = nul.select(call_function("vec_srp_bits",
      col("v"), typedlit(Seq(Seq(1.0f))), lit(1))).head()
    assert(r.isNullAt(0))
    // planes built from a column: right type, not foldable
    val live = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      live.select(call_function("vec_srp_bits", col("v"), array(col("v")), lit(1))).head()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
