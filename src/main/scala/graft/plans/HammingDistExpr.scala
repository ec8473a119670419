package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd string Hamming distance — the fuzzy-join verification
  * kernel (operators.FuzzyJoin).
  *
  * The composed form
  * `aggregate(zip_with(split(a, ""), split(b, "")), 0, +mismatch)` is
  * semantically right but allocates two per-codepoint string ARRAYS and
  * runs three higher-order lambdas per evaluation — and q77 evaluates
  * it once per join CANDIDATE (inside the broadcast-join condition,
  * where the dist filter is pushed) plus once per result row. This
  * expression walks the two UTF-8 byte strings directly: advance both
  * cursors by their codepoint byte-lengths, count codepoint mismatches,
  * zero allocation.
  *
  * Exact semantics of the replaced form, reproduced bit-for-bit
  * (pinned against the composed form in FuzzyJoinSpec over randomized
  * multi-byte corpora): Spark's `split(str, "")` yields one codepoint
  * per element with NO trailing empty (unlike raw Java split("", -1))
  * — except the EMPTY string, which yields [""] — and `zip_with` pads
  * the shorter array with nulls whose comparisons contribute 0. So the
  * distance is the codepoint mismatches over the common prefix, plus
  * the one [""]-vs-codepoint slot when exactly one side is empty.
  * Null if either input is null (standard binary null propagation —
  * same as the composed form, whose split(null) propagates). Behavior
  * on invalid UTF-8 is unspecified (the composed form routes through
  * String replacement chars); every engine corpus is valid UTF-8.
  */
case class HammingDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // Intentionally STRICT typing (r19, ADVICE note): the composed form
  // would implicitly cast non-string inputs to string; this expression
  // hard-fails analysis for anything but (StringType, StringType) —
  // including non-default-collation strings, whose comparison semantics
  // the byte-walk kernel does not implement. Every catalog caller
  // passes plain string key columns; a future non-string caller should
  // cast explicitly rather than inherit a silent stringification.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got $other")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "hamming_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HammingDistExpr.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.HammingDistExpr$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistExpr =
    copy(left = newLeft, right = newRight)
}

object HammingDistExpr {
  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(HammingDistExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Shared by the interpreted path and the generated code (called via
    * MODULE$ from janino). Codepoint-wise walk over the raw UTF-8
    * bytes: differing lead-byte lengths mean differing codepoints;
    * equal lengths compare the byte slices (valid UTF-8 encodes each
    * codepoint uniquely). Tail codepoints past the shorter side
    * contribute 0 (zip_with's null padding); the empty-vs-nonempty 1
    * is split's [""] element meeting a real codepoint. */
  def compute(a: UTF8String, b: UTF8String): Int = {
    val na = a.numBytes
    val nb = b.numBytes
    if (na == 0 || nb == 0) {
      if (na == nb) 0 else 1
    } else {
      var i = 0
      var j = 0
      var d = 0
      while (i < na && j < nb) {
        val la = math.min(UTF8String.numBytesForFirstByte(a.getByte(i)), na - i)
        val lb = math.min(UTF8String.numBytesForFirstByte(b.getByte(j)), nb - j)
        if (la != lb) d += 1
        else {
          var k = 0
          while (k < la && a.getByte(i + k) == b.getByte(j + k)) k += 1
          if (k < la) d += 1
        }
        i += la
        j += lb
      }
      d
    }
  }
}
