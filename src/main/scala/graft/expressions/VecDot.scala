package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns.
  *
  * Why a custom Catalyst `Expression` (SURVEY.md §4 "optional custom
  * pieces"): the composable form — `aggregate(zip_with(a, b, …), …)` —
  * is a higher-order function chain, which is CodegenFallback
  * (interpreted per element) and allocates an intermediate array per
  * row. This expression generates a single fused loop inside whole-stage
  * codegen. Semantics are IDENTICAL to the sequential left fold (same
  * element order, same IEEE double adds), so results are bit-equal to
  * the previous form and to DuckDB's `list_sum` mirror.
  *
  * Precondition: no null elements inside the arrays (embedding columns);
  * a null ARRAY on either side yields null (standard binary-expression
  * null propagation). Arrays of different lengths dot over the common
  * prefix.
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires two array<float> arguments, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the graft function family. Enabled via
  * `spark.sql.extensions=graft.expressions.GraftExtensions` (wired in
  * `Tables.configure`), after which `vec_dot(a, b)` resolves in both the
  * SQL front end and `call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_srp_bits"),
      new ExpressionInfo(classOf[VecSrpBits].getName, "vec_srp_bits"),
      (children: Seq[Expression]) => VecSrpBits(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("vec_srp_probe_masks"),
      new ExpressionInfo(classOf[VecSrpProbeMasks].getName, "vec_srp_probe_masks"),
      (children: Seq[Expression]) =>
        VecSrpProbeMasks(children(0), children(1), children(2), children(3))))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hash64"),
      new ExpressionInfo(classOf[ShingleHash64].getName, "shingle_hash64"),
      (children: Seq[Expression]) => ShingleHash64(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("ngram_hash64"),
      new ExpressionInfo(classOf[NgramHash64].getName, "ngram_hash64"),
      (children: Seq[Expression]) => NgramHash64(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("ngram_hash128"),
      new ExpressionInfo(classOf[NgramHash128].getName, "ngram_hash128"),
      (children: Seq[Expression]) => NgramHash128(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("char_grams"),
      new ExpressionInfo(classOf[CharGrams].getName, "char_grams"),
      (children: Seq[Expression]) => CharGrams(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("chunk_hash64"),
      new ExpressionInfo(classOf[ChunkHash64].getName, "chunk_hash64"),
      (children: Seq[Expression]) => ChunkHash64(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("md5_bucket16"),
      new ExpressionInfo(classOf[Md5Bucket16].getName, "md5_bucket16"),
      (children: Seq[Expression]) => Md5Bucket16(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("quality_score"),
      new ExpressionInfo(classOf[QualityScore].getName, "quality_score"),
      (children: Seq[Expression]) => QualityScore(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("lang_id_scores"),
      new ExpressionInfo(classOf[LangIdScores].getName, "lang_id_scores"),
      (children: Seq[Expression]) => LangIdScores(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("token_ngrams"),
      new ExpressionInfo(classOf[TokenNgrams].getName, "token_ngrams"),
      (children: Seq[Expression]) => TokenNgrams(children(0), children(1))))
    // the Rule[LogicalPlan] rung: naive key+band interval joins rewrite
    // to the binned form automatically (see plans/BinnedIntervalJoin)
    ext.injectOptimizerRule(_ => graft.plans.BinnedIntervalJoin)
    // column pruning through the custom as-of node (stock ColumnPruning
    // cannot see inside an unknown logical operator)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinPruning)
    // the SparkStrategy rung: plans the native as-of join operator
    // (see plans/AsOfJoin — custom LogicalPlan + physical merge exec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
