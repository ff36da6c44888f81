package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the md5-bucket feature-hash family (round-21
  * optimization). The engine's model-quality scorer (q129/q135/q136/
  * q137/q140 + DocStream's quality gate), DSIR featurizer (q133), and
  * lang-id classifier (q150 + the streaming language gate) all bucket
  * features by the SAME engine-portable convention:
  *
  *   bucket = conv(substring(md5(f), 1, 4), 16, 10) % B
  *
  * i.e. the first 16 bits of the feature's MD5 digest, mod the bucket
  * count. The relational spelling pays, PER FEATURE OCCURRENCE: a
  * 32-char hex-string materialization (`md5`), a substring, a base-16
  * string parse (`conv`) — plus, in the scorer/classifier, an
  * exploded row through a corpus×features hash aggregate. At sf0.1
  * that is ~5M md5+hex+parse chains for the quality scorer and ~15M
  * for the char-trigram lang-id pass, and they dominated the four
  * most expensive bench rows (q137 5.3 s / q136 5.0 s / q129 4.1 s /
  * q150 1.9 s — guide §1 measurement, round 21).
  *
  * These expressions compute the identical integers straight off the
  * digest bytes ([[Md5Feat.bucket16]]: big-endian first two bytes),
  * with a thread-local reused `MessageDigest` and zero-copy feature
  * slices of the document's UTF-8 bytes. [[QualityScore]] and
  * [[LangIdScores]] additionally FUSE the whole per-document
  * feature loop (tokenize/gram-walk → md5 → planted-weight lookup →
  * sum) into one scalar projection, so the corpus-sized explode and
  * the features-sized aggregate disappear from the plan — the
  * (doc, sums) row is produced where the document is scanned. Both
  * carry their planted weight FORMULA (the q129/q150 contract) and
  * are spec-pinned row-for-row against the relational spellings they
  * replace ([[graft.ops.TextOps.modelScoresReferenceOf]] /
  * `langIdScoresReferenceOf`, kept as the oracle forms).
  */
object Md5Feat {
  private val tlMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val tlBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** First 16 bits of MD5(bytes[off, off+len)), big-endian — exactly
    * `conv(substring(md5(x), 1, 4), 16, 10)` of the same bytes. */
  def bucket16(bytes: Array[Byte], off: Int, len: Int): Int = {
    val md = tlMd5.get()
    md.reset()
    md.update(bytes, off, len)
    val buf = tlBuf.get()
    md.digest(buf, 0, 16)
    ((buf(0) & 0xff) << 8) | (buf(1) & 0xff)
  }

  def bucket16(text: UTF8String): Int = {
    val b = text.getBytes
    bucket16(b, 0, b.length)
  }

  /** Token start offsets for the single-space split convention
    * (`split(text, " ")`, limit -1: trailing empties kept — "a b " is
    * ["a","b",""]). Returns starts ++ (nb+1) sentinel: token i is
    * bytes [starts(i), starts(i+1) - 1), its separator excluded; the
    * final pseudo-start nb+1 makes that formula uniform. */
  def tokenStarts(bytes: Array[Byte]): Array[Int] = {
    var spaces = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val starts = new Array[Int](spaces + 2)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(t) = bytes.length + 1
    starts
  }

  // ---- quality scorer (q129's planted linear model) ----

  val QualityBuckets = 4096
  def qualityWeight(b: Long): Long = (b * 2654435761L) % 1000003L - 501001L

  private lazy val qualityTab: Array[Long] =
    Array.tabulate(QualityBuckets)(b => qualityWeight(b.toLong))

  val QualityType: StructType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("score", LongType, nullable = false)))

  /** Per-document fused quality score: unigram + adjacent-bigram
    * features (the bigram "tokA tokB" is the contiguous byte range of
    * the two tokens — the corpus joins tokens by exactly one space, so
    * no separator re-materialization is needed), each md5-bucketed into
    * [[QualityBuckets]] and summed through the planted weight table.
    * Row-for-row equal to: explode(toks ++ bigrams) → element_at(w,
    * bucket+1) → groupBy(doc).agg(count, sum). */
  def qualityScore(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val starts = tokenStarts(bytes)
    val nUni = starts.length - 1
    var score = 0L
    var i = 0
    while (i < nUni) {
      val off = starts(i)
      val len = starts(i + 1) - 1 - off
      score += qualityTab(bucket16(bytes, off, len) % QualityBuckets)
      i += 1
    }
    i = 0
    while (i < nUni - 1) {
      val off = starts(i)
      val len = starts(i + 2) - 1 - off
      score += qualityTab(bucket16(bytes, off, len) % QualityBuckets)
      i += 1
    }
    val nFeats = nUni.toLong + math.max(nUni - 1, 0).toLong
    new GenericInternalRow(Array[Any](nFeats, score))
  }

  // ---- lang-id scorer (q150's planted per-language linear models) ----

  val LangIdBuckets = 1024
  def langIdWeight(b: Long, li: Int): Long =
    ((b + 7919L * (li + 1)) * 2654435761L) % 1000003L - 501001L

  /** Per-language weight tables, built once per language count. */
  private val langTabs =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Long]]]()
  private def langTab(numLangs: Int): Array[Array[Long]] =
    langTabs.computeIfAbsent(numLangs, { _ =>
      Array.tabulate(numLangs, LangIdBuckets)((li, b) => langIdWeight(b.toLong, li))
    })

  val LangIdType: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("scores", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Per-document fused lang-id scores over stride-1 CODE-POINT char
    * trigrams ([[CharGrams]]' walk): one md5 bucket per gram feeds all
    * `numLangs` weight lookups. Returns null when the document has no
    * trigram (numChars < 3) — the explode-based form emits no rows for
    * such a doc, and callers filter the null the same way. */
  def langIdScores(text: UTF8String, numLangs: Int): InternalRow = {
    val nb = text.numBytes()
    val numChars = text.numChars()
    if (numChars < 3) return null
    val offs = new Array[Int](numChars + 1)
    var i = 0
    var c = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(text.getByte(i))
      c += 1
    }
    offs(numChars) = nb
    val bytes = text.getBytes
    val tabs = langTab(numLangs)
    val sums = new Array[Long](numLangs)
    val nGrams = numChars - 2
    var g = 0
    while (g < nGrams) {
      val b = bucket16(bytes, offs(g), offs(g + 3) - offs(g)) % LangIdBuckets
      var li = 0
      while (li < numLangs) { sums(li) += tabs(li)(b); li += 1 }
      g += 1
    }
    new GenericInternalRow(Array[Any](nGrams.toLong,
      new GenericArrayData(sums)))
  }

  // ---- token n-grams (q131's trigram stream) ----

  val EmptyStrings: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Token n-grams WITH multiplicity as zero-copy byte slices — the
    * gram "tokᵢ … tokᵢ₊ₙ₋₁" is the contiguous byte range of those
    * tokens (single-space join convention), so each gram aliases the
    * document's byte array. Row-for-row the order-n slice of
    * [[graft.ops.TextOps.lmGrams]] (null → empty, like the UDF). */
  def tokenNgrams(text: UTF8String, n: Int): ArrayData = {
    require(n > 0, s"token_ngrams: n must be positive, got $n")
    val bytes = text.getBytes
    val starts = tokenStarts(bytes)
    val nTok = starts.length - 1
    if (nTok < n) return EmptyStrings
    val out = new Array[Any](nTok - n + 1)
    var i = 0
    while (i < out.length) {
      val off = starts(i)
      val len = starts(i + n) - 1 - off
      out(i) = UTF8String.fromBytes(bytes, off, len)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `md5_bucket16(s)`: the integer value of the first 4 hex chars of
  * md5(s) — `conv(substring(md5(s), 1, 4), 16, 10)` without the hex
  * string, the substring, or the string parse. Null-propagating. */
case class Md5Bucket16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_bucket16 requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "md5_bucket16"

  override protected def nullSafeEval(t: Any): Any =
    Md5Feat.bucket16(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Feat.bucket16($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `quality_score(text)`: q129's fused per-document hashed-n-gram
  * model score, `struct<n_feats: long, score: long>`. Null text →
  * null (the relational form's explode emits no rows for it). */
case class QualityScore(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quality_score requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = Md5Feat.QualityType
  override def prettyName: String = "quality_score"

  override protected def nullSafeEval(t: Any): Any =
    Md5Feat.qualityScore(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Feat.qualityScore($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `lang_id_scores(text, numLangs)`: q150's fused per-document
  * char-trigram lang-id pass, `struct<n_grams: long, scores:
  * array<long>>` (scores[i] = language i's planted-model sum). Null
  * when text is null OR has no trigram — callers filter, mirroring
  * the explode form's emits-no-rows contract. */
case class LangIdScores(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("lang_id_scores requires a literal numLangs")
        else if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure("lang_id_scores requires a non-null numLangs")
        else if (right.eval().asInstanceOf[Int] <= 0)
          TypeCheckResult.TypeCheckFailure("lang_id_scores requires a positive numLangs")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"lang_id_scores requires (string, int), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = Md5Feat.LangIdType
  override def nullable: Boolean = true
  override def prettyName: String = "lang_id_scores"

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null
    else Md5Feat.langIdScores(t.asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = ${l.isNull};
        $javaType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.expressions.Md5Feat.langIdScores(${l.value}, ${r.value});
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `token_ngrams(text, n)`: every overlapping token n-gram as a
  * zero-copy string slice, multiplicity kept — the order-n slice of
  * the LM gram stream without the all-orders UDF's tuple rows. Null
  * text → empty array (the UDF contract). */
case class TokenNgrams(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("token_ngrams requires a literal n")
        else if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure("token_ngrams requires a non-null n")
        else if (right.eval().asInstanceOf[Int] <= 0)
          TypeCheckResult.TypeCheckFailure("token_ngrams requires a positive n")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"token_ngrams requires (string, int), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "token_ngrams"

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) Md5Feat.EmptyStrings
    else Md5Feat.tokenNgrams(t.asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        $javaType ${ev.value} = ${l.isNull}
          ? graft.expressions.Md5Feat.EmptyStrings()
          : graft.expressions.Md5Feat.tokenNgrams(${l.value}, ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
