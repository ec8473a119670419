package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash — the determinism workhorse behind HLL,
  * MinHash, fingerprints, stratified sampling, and A-Res sampling
  * (TextFunctions.md5Hash60), as a single codegen'd kernel.
  *
  * The composed form `conv(substring(md5(c), 1, 15), 16, 10)` is
  * correct but per row materializes the 32-char hex string, slices it,
  * and re-parses 15 hex characters back into a long through `conv`'s
  * general base-conversion loop. This expression computes the IDENTICAL
  * value straight from the digest bytes: the first 15 hex characters of
  * an md5 are the first 8 bytes read as an unsigned big-endian long
  * shifted right by 4 bits (16 hex chars = 8 bytes; dropping the 16th
  * char is a 4-bit shift). Bit-parity with the composed form is pinned
  * in VectorExpressionSpec, so every oracle that re-states the hash as
  * SQL (`('0x' || substr(md5(…), 1, 15))::BIGINT`) is untouched.
  *
  * Null behavior matches the composed form: null in → null out
  * (UnaryExpression's default null-intolerant contract, same as
  * `md5(NULL)`). */
case class Md5Hash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "md5_hash60"

  override protected def nullSafeEval(s: Any): Any =
    Md5Hash60Expr.hash60(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.Md5Hash60Expr.hash60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60Expr =
    copy(child = newChild)
}

object Md5Hash60Expr {

  /** Per-thread digest instance — MessageDigest is stateful and not
    * thread-safe; `digest(bytes)` resets it after each computation. */
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Value of the first 15 hex characters of md5(bytes), base 16 —
    * i.e. the first 8 digest bytes as an unsigned big-endian long,
    * logically shifted right 4 bits (60 bits, always non-negative). */
  def hash60(bytes: Array[Byte]): Long = {
    val d = digests.get().digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    v >>> 4
  }

  /** Column-API entry point. */
  def column(c: Column): Column =
    GraftSqlBridge.column(Md5Hash60Expr(GraftSqlBridge.expression(c)))
}
