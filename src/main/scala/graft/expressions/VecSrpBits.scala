package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** All random-hyperplane (SRP) LSH sign bits of a vector in ONE fused
  * loop, packed into a single long: bit `t*bitsPerBand + p` is set when
  * `dot(vec, planes[t*bitsPerBand + p]) > 0`. Band t's bucket key is
  * `(result >>> t*bitsPerBand) & ((1 << bitsPerBand) - 1)`.
  *
  * Why one expression instead of one [[VecDot]] per plane: 64 separate
  * `vec_dot` calls each inline their own loop into the whole-stage-codegen
  * method, which blows past the JVM's 8 KB JIT limit — the generated
  * method then runs in the bytecode interpreter, measured ~6x SLOWER than
  * even the CodegenFallback higher-order-function chain it replaced. Here
  * the plane matrix is one flat `float[]` reference object and the 64
  * projections are one small nested loop: JIT-compiled, cache-friendly,
  * zero per-row allocation (the result is a primitive long).
  *
  * Per-plane dot semantics are identical to [[VecDot]] (sequential fold,
  * elements widened to double), so sign bits match the per-plane form
  * bit-for-bit.
  *
  * Arguments: (vec array<float>, planes array<array<float>> FOLDABLE,
  * bitsPerBand int FOLDABLE); planes.size must be a multiple of
  * bitsPerBand and at most 64 total bits. Null vec yields null.
  */
case class VecSrpBits(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _), IntegerType) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            "vec_srp_bits requires plan-time literal planes and bitsPerBand")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        TypeCheckResult.TypeCheckFailure(
          "vec_srp_bits requires (array<float>, array<array<float>>, int), " +
            s"got ${a.sql}, ${b.sql}, ${c.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_srp_bits"

  private lazy val bitsPerBand: Int = third.eval().asInstanceOf[Int]
  /** Planes flattened row-major; all rows must share the first plane's
    * length (ragged matrices are rejected at plan time) so the codegen
    * loop bound is a compile-time constant.
    */
  private lazy val (flatPlanes: Array[Float], planeLen: Int, numPlanes: Int) = {
    val ad = second.eval().asInstanceOf[ArrayData]
    val n = ad.numElements()
    require(n > 0 && bitsPerBand > 0 && n % bitsPerBand == 0 && n <= 64,
      s"vec_srp_bits: need 0 < planes ($n) <= 64, a multiple of bitsPerBand ($bitsPerBand)")
    val rows = Array.tabulate(n)(i => ad.getArray(i).toFloatArray())
    val len = rows.head.length
    require(rows.forall(_.length == len), "vec_srp_bits: ragged plane matrix")
    (rows.flatten.toArray, len, n)
  }

  private def packedBits(x: ArrayData): Long = {
    val dims = math.min(x.numElements(), planeLen)
    var packed = 0L
    var p = 0
    while (p < numPlanes) {
      val off = p * planeLen
      var acc = 0.0
      var i = 0
      while (i < dims) {
        acc += x.getFloat(i).toDouble * flatPlanes(off + i).toDouble
        i += 1
      }
      if (acc > 0) packed |= 1L << p
      p += 1
    }
    packed
  }

  override def nullSafeEval(vec: Any, planes: Any, bits: Any): Any =
    packedBits(vec.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val flat = ctx.addReferenceObj("srpPlanes", flatPlanes, "float[]")
      val packed = ctx.freshName("packed")
      val dims = ctx.freshName("dims")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      s"""
         |long $packed = 0L;
         |final int $dims = java.lang.Math.min($v.numElements(), $planeLen);
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  final int $off = $p * $planeLen;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    $acc += (double) $v.getFloat($i) * (double) $flat[$off + $i];
         |  }
         |  if ($acc > 0) $packed |= 1L << $p;
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
