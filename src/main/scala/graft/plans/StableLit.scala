package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** A non-null literal whose value reaches generated code through the
  * references array instead of being inlined into the source text.
  *
  * Why it exists (r19): a plain primitive `Literal` inlines its raw
  * value into the generated Java source, so an expression built from
  * RUN-VARYING constants — GlobalRank's sampled range-split boundaries,
  * whose exact values depend on nondeterministic hash-aggregate row
  * order — produces a DIFFERENT source string on every execution. Each
  * run then misses the codegen cache, re-compiles with janino, and
  * re-pays the whole JIT warm-up of the stage (measured on q82: the
  * same data-path work at 5-10× task CPU whenever the sweep's variance
  * re-runs embedded fresh boundary values). Routing the value through
  * `references` keeps the source text identical across runs — one
  * compiled class, warm JIT — while the semantics stay exactly
  * `Literal`'s. `foldable = false` is the point, not an oversight:
  * ConstantFolding would collapse any foldable wrapper straight back
  * into an inlined primitive literal.
  *
  * Interpreted eval returns the stored internal value, bit-identical
  * to the literal form; only codegen plumbing differs.
  */
case class StableLit(value: Any, dataType: DataType) extends LeafExpression {
  require(value != null, "StableLit requires a non-null value (wrap " +
    "nullable constants as plain literals; boundaries are non-null by " +
    "GlobalRank's key contract)")

  override def foldable: Boolean = false
  override def nullable: Boolean = false
  override def prettyName: String = "stable_lit"
  override def toString: String = s"stable_lit($value)"

  override def eval(input: InternalRow): Any = value

  /** (boxed/java class for the reference cast, unbox call or ""). */
  private def javaInfo: (String, String) = dataType match {
    case LongType | TimestampType | TimestampNTZType => ("java.lang.Long", "longValue")
    case IntegerType | DateType => ("java.lang.Integer", "intValue")
    case DoubleType => ("java.lang.Double", "doubleValue")
    case FloatType => ("java.lang.Float", "floatValue")
    case ShortType => ("java.lang.Short", "shortValue")
    case ByteType => ("java.lang.Byte", "byteValue")
    case BooleanType => ("java.lang.Boolean", "booleanValue")
    case _: StringType => ("org.apache.spark.unsafe.types.UTF8String", "")
    case _: DecimalType => ("org.apache.spark.sql.types.Decimal", "")
    case other => throw new IllegalArgumentException(
      s"stable_lit: unsupported type $other (atomic orderable types only)")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (boxed, unbox) = javaInfo
    val ref = ctx.addReferenceObj("stableLit", value, boxed)
    val v = if (unbox.isEmpty) ref else s"$ref.$unbox()"
    ExprCode(code"", FalseLiteral, JavaCode.expression(v, dataType))
  }
}

object StableLit {
  /** Column over an EXTERNAL (Scala/Java) constant: converted to the
    * Catalyst internal form and type exactly as `lit(v)` would. */
  def column(v: Any): Column = {
    val l = Literal(v)
    GraftSqlBridge.column(StableLit(l.value, l.dataType))
  }
}
