package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the declarative higher-order-function dot
  * product
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v) }}}
  * and rewrite it to the codegen'd [[ArrayDotProduct]]. Users (and our
  * own query catalog) can keep writing the idiomatic composed form —
  * the engine supplies the fast kernel, the way Catalyst's own
  * ConstantFolding supplies arithmetic. The rewrite is semantics- and
  * bit-exact ([[ArrayDotProduct]] reproduces the fold's IEEE sum and
  * null behavior), so it is safe to apply unconditionally.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (x: NamedLambdaVariable, y: NamedLambdaVariable) => x.exprId == y.exprId
    case _ => false
  }

  /** The two lambda args used exactly as the two operands (either order —
    * IEEE multiply/add are commutative bit-for-bit). */
  private def usesBoth(l: Expression, r: Expression,
                       a: NamedExpression, b: NamedExpression): Boolean =
    (sameVar(l, a) && sameVar(r, b)) || (sameVar(l, b) && sameVar(r, a))

  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(f, Seq(v), _) => sameVar(f, v)
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(x, y, _), Seq(xv, yv), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(acc, v, _), Seq(accv, vv), _),
            finish)
          // bit-check the zero literal: -0.0 == 0.0 numerically, but the
          // kernel's accumulator starts at +0.0, and a -0.0 seed can
          // surface (e.g. all-empty arrays fold to the seed itself)
          if zero == 0.0 &&
            java.lang.Double.doubleToRawLongBits(zero.asInstanceOf[Double]) == 0L &&
            isDoubleArray(a) && isDoubleArray(b) &&
            usesBoth(x, y, xv, yv) && usesBoth(acc, v, accv, vv) &&
            isIdentity(finish) =>
        ArrayDotProduct(a, b)
    }
}

/** Session extensions for the graft engine — enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions`:
  *  - the [[RewriteHofDotProduct]] optimizer rule;
  *  - `array_dot_product(a, b)` as a SQL-callable function, so
  *    `spark.sql` users reach the native kernel directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectFunction((
      new FunctionIdentifier("array_dot_product"),
      new ExpressionInfo(classOf[ArrayDotProduct].getCanonicalName, "array_dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"array_dot_product expects 2 arguments, got ${children.length}")
        ArrayDotProduct(children.head, children(1))
      }))
  }
}
