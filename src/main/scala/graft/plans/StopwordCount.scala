package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of a token array's elements that ARE (`matchStopwords=true`)
  * or are NOT (`false`) members of a fixed stopword set — the
  * codegen'd kernel behind `size(filter(tokens, t => [!]isStopword(t)))`
  * (TextFunctions.removeStopwords / stopwordRatio).
  *
  * Why (r19, guide §4): higher-order functions run on the expression
  * INTERPRETER (ArrayFilter is CodegenFallback), so the composed form
  * paid a per-token interpreted lambda — lower() + InSet — plus the
  * materialization of the filtered array that only ever feeds size().
  * This expression is one compiled pass over the array, no intermediate
  * array, same per-element semantics:
  *
  *   - membership = binary equality of lower(t) against the set, i.e.
  *     `lower(t).isInCollection(sw)` (InSet over UTF8String, default
  *     UTF8_BINARY collation);
  *   - NULL elements count as NEITHER (the lambda's `isStopword(null)`
  *     is null, and filter() drops elements whose predicate is not
  *     TRUE — so a null token is excluded from both counts, exactly as
  *     the composed forms behaved);
  *   - null array → null (standard unary null propagation; size(null)
  *     was null in the composed forms too under non-legacy config).
  */
case class StopwordCountExpr(child: Expression, stopwords: Seq[String],
    matchStopwords: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String =
    if (matchStopwords) "stopword_count" else "non_stopword_count"

  @transient private lazy val set = StopwordCountExpr.buildSet(stopwords)

  override protected def nullSafeEval(arr: Any): Any =
    StopwordCountExpr.compute(
      arr.asInstanceOf[ArrayData], set, matchStopwords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwordSet", set,
      "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.StopwordCountExpr$$.MODULE$$.compute(" +
        s"$a, $setRef, $matchStopwords);")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCountExpr =
    copy(child = newChild)
}

object StopwordCountExpr {

  private[plans] def buildSet(stopwords: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w).toLowerCase))
    s
  }

  /** Shared interpreted/codegen body: one pass, no allocation. */
  def compute(arr: ArrayData, set: java.util.HashSet[UTF8String],
      matchStopwords: Boolean): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val in = set.contains(arr.getUTF8String(i).toLowerCase)
        if (in == matchStopwords) c += 1
      }
      i += 1
    }
    c
  }

  def column(tokens: Column, stopwords: Seq[String],
      matchStopwords: Boolean): Column =
    GraftSqlBridge.column(StopwordCountExpr(
      GraftSqlBridge.expression(tokens), stopwords, matchStopwords))
}
