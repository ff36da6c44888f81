package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** [[ShingleHash64]] WITHOUT the distinct: every overlapping token
  * n-gram's fingerprint, repeats included, in window order. Repetition
  * metrics (duplicate-n-gram fraction, top-n-gram fraction — the
  * Gopher/C4 quality signals) need the multiset; shingling for
  * MinHash/Jaccard needs the set. Same byte-slice FNV-1a core, same
  * null→empty and literal-n contract as [[ShingleHash64]].
  */
case class NgramHash64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("ngram_hash64 requires a literal n")
        else if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure("ngram_hash64 requires a non-null n")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"ngram_hash64 requires (string, int), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "ngram_hash64"

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) ShingleHash64.EMPTY
    else ShingleHash64.computeAll(t.asInstanceOf[UTF8String],
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
          ? graft.expressions.ShingleHash64.EMPTY()
          : graft.expressions.ShingleHash64.computeAll(${l.value}, ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[NgramHash64]] widened to 128 bits: every overlapping token n-gram
  * as a `struct<h1: long, h2: long>` — `h1` is byte-identical to
  * `ngram_hash64`'s FNV-1a lane, `h2` a second FNV-1a pass from an
  * independent offset basis, both lanes computed in the SAME byte walk.
  * This is the adversarial-corpus variant of the multiset fingerprints
  * q48's repetition counts group on (a single 64-bit in-doc collision
  * would shift a multiset count, where q38's set semantics only perturb
  * membership): grouping on the struct requires a simultaneous collision
  * in both lanes, pushing the per-doc birthday probability from ~1e-10
  * territory to negligible at any real document size. Same null→empty,
  * literal-n contract as the 64-bit form.
  */
case class NgramHash128(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("ngram_hash128 requires a literal n")
        else if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure("ngram_hash128 requires a non-null n")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"ngram_hash128 requires (string, int), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = NgramHash128.Type
  override def nullable: Boolean = false
  override def prettyName: String = "ngram_hash128"

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) NgramHash128.EMPTY
    else ShingleHash64.computeAll128(t.asInstanceOf[UTF8String],
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
          ? graft.expressions.NgramHash128.EMPTY()
          : graft.expressions.ShingleHash64.computeAll128(${l.value}, ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NgramHash128 {
  import org.apache.spark.sql.types.{StructField, StructType}
  val Type: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))), containsNull = false)
  val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])
}

/** Distinct token n-gram shingles of a string as 64-bit FNV-1a
  * fingerprints, computed natively over the UTF8String's bytes.
  *
  * Semantics are IDENTICAL to [[graft.ops.TextOps.shingleHashes]]'s UDF
  * (split on single spaces keeping empty tokens, FNV-1a over the
  * space-joined shingle's UTF-8 bytes, first-seen order distinct) —
  * `VecDotSpec` pins row-for-row equality on the corpus. The win over
  * the UDF is mechanical, not semantic: no UTF8String→java.lang.String
  * decode, no per-token String allocation, no boxed-array→Catalyst
  * re-conversion. Because tokens are split on the single byte 0x20 (a
  * byte that never occurs inside a multi-byte UTF-8 sequence), the
  * space-joined shingle of tokens i..i+n-1 is exactly the source byte
  * range from token i's start to token i+n-1's end, so each fingerprint
  * is one FNV pass over a byte slice — no joining at all.
  *
  * Null text yields an EMPTY array — the same as the UDF it replaces
  * (a null document has no shingles; `size(...)` downstream counts 0,
  * never null) — so the expression itself is never null. n must be a
  * positive non-null plan-time literal.
  */
case class ShingleHash64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("shingle_hash64 requires a literal n")
        else if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure("shingle_hash64 requires a non-null n")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"shingle_hash64 requires (string, int), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_hash64"

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) ShingleHash64.EMPTY
    else ShingleHash64.compute(t.asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one static JIT-able method call per row — the loop body lives in
    // compute(), not in the generated source, so whole-stage codegen
    // stays small no matter how often the expression appears (the
    // vec_srp_bits lesson: inlining big loops N times breaks the JIT).
    // Null text short-circuits to the shared EMPTY array, so the result
    // slot is never null and downstream null checks vanish.
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        $javaType ${ev.value} = ${l.isNull}
          ? graft.expressions.ShingleHash64.EMPTY()
          : graft.expressions.ShingleHash64.compute(${l.value}, ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One FNV-1a fingerprint per NON-OVERLAPPING `k`-token chunk (stride
  * k, short tail chunk included) — the span-dedup chunking of
  * `DedupOps.spanDedup`, fingerprinted without ever materializing the
  * chunk strings. Because tokens split on single spaces re-join to the
  * original byte span, each hash is byte-identical to FNV-1a over
  * `array_join(slice(tokens, c*k+1, k), " ")` — so keying a dedup on
  * these equals keying on the chunk text, modulo 64-bit collisions
  * (the accepted shingle-convention risk class). Same null→empty,
  * literal-k contract as the sibling expressions.
  */
case class ChunkHash64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure("chunk_hash64 requires a literal k")
        else if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure("chunk_hash64 requires a non-null k")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"chunk_hash64 requires (string, int), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "chunk_hash64"

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) ShingleHash64.EMPTY
    else ShingleHash64.computeChunks(t.asInstanceOf[UTF8String],
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
          ? graft.expressions.ShingleHash64.EMPTY()
          : graft.expressions.ShingleHash64.computeChunks(${l.value}, ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleHash64 {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L
  /** Second-lane offset basis for the 128-bit form (the 64-bit golden
    * ratio, the standard "arbitrary odd constant" choice): two FNV-1a
    * accumulators from different bases diverge through every multiply,
    * so a byte sequence colliding in one lane has no structural reason
    * to collide in the other. */
  private val Fnv2Offset = 0x9e3779b97f4a7c15L

  /** Shared null-text result (referenced from generated code). */
  val EMPTY: ArrayData = new GenericArrayData(Array.empty[Long])

  /** Shared by interpreted eval and generated code: first-seen-order
    * DISTINCT window fingerprints (the shingle-set form). */
  def compute(text: UTF8String, n: Int): ArrayData = hashWindows(text, n, distinct = true)

  /** ALL window fingerprints, repeats included (the multiset form). */
  def computeAll(text: UTF8String, n: Int): ArrayData = hashWindows(text, n, distinct = false)

  /** Stride-k non-overlapping chunk fingerprints (see [[ChunkHash64]]):
    * chunk c covers tokens [c·k, min((c+1)·k, numToks)), hashed over the
    * contiguous byte span — identical to FNV-1a of the re-joined chunk
    * string, including the `split("") = [""]` single-empty-chunk edge. */
  def computeChunks(text: UTF8String, k: Int): ArrayData = {
    require(k > 0, s"chunk hash: k must be positive, got $k")
    val nb = text.numBytes()
    var spaces = 0
    var i = 0
    while (i < nb) {
      if (text.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    val numToks = spaces + 1
    val starts = new Array[Int](numToks + 1)
    var t = 1
    i = 0
    while (i < nb) {
      if (text.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(numToks) = nb + 1
    val nChunks = (numToks + k - 1) / k
    val out = new Array[Long](nChunks)
    var c = 0
    while (c < nChunks) {
      var h = FnvOffset
      var j = starts(c * k)
      val end = starts(math.min((c + 1) * k, numToks)) - 1
      while (j < end) {
        h ^= text.getByte(j) & 0xffL
        h *= FnvPrime
        j += 1
      }
      out(c) = h
      c += 1
    }
    new GenericArrayData(out)
  }

  /** ALL window fingerprints as (h1, h2) structs — h1 identical to
    * [[computeAll]]'s lane, h2 from [[Fnv2Offset]], one byte walk for
    * both (see [[NgramHash128]]). */
  def computeAll128(text: UTF8String, n: Int): ArrayData = {
    require(n > 0, s"ngram hash: n must be positive, got $n")
    val nb = text.numBytes()
    var spaces = 0
    var i = 0
    while (i < nb) {
      if (text.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    val numToks = spaces + 1
    if (numToks < n) return NgramHash128.EMPTY
    val starts = new Array[Int](numToks + 1)
    var t = 1
    i = 0
    while (i < nb) {
      if (text.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(numToks) = nb + 1
    val out = new Array[Any](numToks - n + 1)
    var w = 0
    while (w <= numToks - n) {
      var h1 = FnvOffset
      var h2 = Fnv2Offset
      var j = starts(w)
      val end = starts(w + n) - 1
      while (j < end) {
        val b = text.getByte(j) & 0xffL
        h1 ^= b; h1 *= FnvPrime
        h2 ^= b; h2 *= FnvPrime
        j += 1
      }
      out(w) = InternalRow(h1, h2)
      w += 1
    }
    new GenericArrayData(out)
  }

  private def hashWindows(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    require(n > 0, s"shingle/ngram hash: n must be positive, got $n")
    val nb = text.numBytes()
    // pass 1: token count (split on ' ' keeping empties: tokens = spaces+1)
    var spaces = 0
    var i = 0
    while (i < nb) {
      if (text.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    val numToks = spaces + 1
    if (numToks < n) return new GenericArrayData(Array.empty[Long])
    // pass 2: token start offsets, plus a sentinel one past the last
    // byte + 1 so every token's end is starts(t + 1) - 1
    val starts = new Array[Int](numToks + 1)
    var t = 1
    i = 0
    while (i < nb) {
      if (text.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(numToks) = nb + 1
    // pass 3: FNV-1a per window over the contiguous byte slice
    val out = new Array[Long](numToks - n + 1)
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
    var k = 0
    var w = 0
    while (w <= numToks - n) {
      var h = FnvOffset
      var j = starts(w)
      val end = starts(w + n) - 1
      while (j < end) {
        h ^= text.getByte(j) & 0xffL
        h *= FnvPrime
        j += 1
      }
      if (seen == null || seen.add(h)) { out(k) = h; k += 1 }
      w += 1
    }
    new GenericArrayData(if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }
}
