package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character-class counts for the two classes the quality rules
  * evaluate on every document (q24/q37/q109): ASCII letters, and
  * "neither ASCII alphanumeric nor ASCII whitespace". The composed form
  * `length(text) - length(regexp_replace(text, clazz, ''))` materializes
  * a stripped COPY of each text per class per row; this kernel counts in
  * one byte scan, no allocation.
  *
  * Regex parity (spec-pinned on corpus + unicode edges): the classes
  * involved are ASCII-only, and in UTF-8 every non-ASCII code point
  * starts with a lead byte ≥ 0xC0 — so a byte scan classifies exactly
  * like the code-point regex: lead bytes are non-alpha/non-alnum/
  * non-whitespace characters (symbols), continuation bytes (0x80–0xBF)
  * are not characters at all. `\\s` here is Java regex ASCII semantics:
  * space, tab, \n, \x0B, \f, \r. */
case class CharClassCountExpr(child: Expression, alpha: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def prettyName: String =
    if (alpha) "alpha_char_count" else "symbol_char_count"

  override protected def nullSafeEval(s: Any): Any =
    if (alpha) CharClassCountExpr.alphaCount(s.asInstanceOf[UTF8String])
    else CharClassCountExpr.symbolCount(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      if (alpha) s"graft.plans.CharClassCountExpr.alphaCount($c)"
      else s"graft.plans.CharClassCountExpr.symbolCount($c)")

  override protected def withNewChildInternal(
      newChild: Expression): CharClassCountExpr =
    copy(child = newChild)
}

object CharClassCountExpr {

  /** # characters matching `[A-Za-z]`. */
  def alphaCount(s: UTF8String): Long = {
    val n = s.numBytes()
    var c = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) c += 1L
      i += 1
    }
    c
  }

  /** # characters matching TextFunctions.SymbolClass, i.e.
    * `[^A-Za-z0-9 \t\n\f\r]` (the Ws literal — NOTE: no \x0B, vertical
    * tab is a symbol there): every ASCII byte that is neither alnum nor
    * one of those five whitespace characters, plus every multi-byte
    * character (counted once, at its lead byte). */
  def symbolCount(s: UTF8String): Long = {
    val n = s.numBytes()
    var c = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (b < 0x80) {
        val alnum = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
          (b >= '0' && b <= '9')
        val ws = b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r'
        if (!alnum && !ws) c += 1L
      } else if (b >= 0xC0) {
        c += 1L // lead byte of a non-ASCII code point — always a symbol
      } // 0x80–0xBF: continuation byte, not a character
      i += 1
    }
    c
  }

  def alphaColumn(c: Column): Column =
    GraftSqlBridge.column(CharClassCountExpr(GraftSqlBridge.expression(c), alpha = true))

  def symbolColumn(c: Column): Column =
    GraftSqlBridge.column(CharClassCountExpr(GraftSqlBridge.expression(c), alpha = false))
}
