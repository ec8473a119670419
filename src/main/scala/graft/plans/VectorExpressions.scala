package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns — the one hot
  * scalar kernel in the engine worth a custom Catalyst `Expression`.
  *
  * The composed form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * correct but runs on the higher-order-function interpreter: per row it
  * allocates the zipped array and evaluates two lambda closures per
  * element, and it blocks whole-stage codegen for the surrounding
  * operators. For ANN queries the dot product runs |corpus|·|probes|
  * times — measurably the dominant cost. This expression generates a
  * tight primitive loop inside whole-stage codegen instead.
  *
  * Semantics are EXACTLY the composed form's (drop-in, oracle-stable):
  *  - result is null if either array is null, the lengths differ
  *    (zip_with pads with null, nulling the fold), or any element is
  *    null;
  *  - the fold is sequential in ascending index order — bit-identical
  *    IEEE sums, so oracle-checked cosines (q30/q42/q44) are unchanged.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "array_dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Column-API entry point for [[ArrayDotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
