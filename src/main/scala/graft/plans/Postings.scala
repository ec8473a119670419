package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document posting construction for the inverted-index build
  * (q88): `array<string>` of tokens → `array<struct<token, tf,
  * positions>>` with tf = occurrences in THIS document and positions =
  * the 0-based occurrence indices as a comma string, ascending by
  * construction (one left-to-right walk — no sort, no collect_list).
  *
  * Why an expression and not a groupBy: tf and the position list are
  * functions of a single document row, so aggregating them with
  * `groupBy(token, doc_id).agg(collect_list(pos))` pays a corpus-wide
  * exchange of one row PER TOKEN OCCURRENCE plus an ObjectHashAggregate
  * (collect_list leaves whole-stage codegen) to compute something that
  * never crosses a row boundary. This kernel folds each document in one
  * hash-map pass inside the projection; the only corpus-wide exchange
  * left in q88 is the output's own ORDER BY, which ships one compact
  * row per (doc, distinct token). At 100 TB the same property holds:
  * per-row work is bounded by document length, hot tokens are split
  * across range partitions by doc_id, and no task ever buffers a
  * token's full posting list.
  *
  * Determinism: token equality is UTF8 binary equality (groupBy's own
  * semantics); struct order is first occurrence in the document, and
  * every caller re-orders globally anyway. Null contract: null array →
  * null (UnaryExpression default); null ELEMENTS raise a descriptive
  * IllegalArgumentException (inputs are `split` outputs, which never
  * contain nulls — a null element means the caller fed something
  * else, and a silent skip or a raw NPE inside codegen would both be
  * undiagnosable). Same contract as frequent_pairs. */
case class PostingsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $t")
  }

  override def dataType: DataType = PostingsExpr.OutType

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "doc_postings"

  override protected def nullSafeEval(a: Any): Any =
    PostingsExpr.postings(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PostingsExpr.postings($c)")

  override protected def withNewChildInternal(
      newChild: Expression): PostingsExpr =
    copy(child = newChild)
}

object PostingsExpr {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("positions", StringType, nullable = false))),
    containsNull = false)

  private final class Entry {
    var tf: Long = 0L
    val sb = new java.lang.StringBuilder(8)
  }

  def postings(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // insertion-ordered so the output is deterministic row-to-row;
    // keys are CLONED once per distinct token — the input UTF8Strings
    // point into the current row's buffer and the output outlives it
    val m = new java.util.LinkedHashMap[UTF8String, Entry](16)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null) throw new IllegalArgumentException(
        s"doc_postings: null array element at index $i — null tokens " +
          "are unsupported (inputs are expected to be split outputs)")
      var e = m.get(t)
      if (e == null) { e = new Entry; m.put(t.clone(), e) }
      e.tf += 1L
      if (e.sb.length > 0) e.sb.append(',')
      e.sb.append(i)
      i += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val kv = it.next()
      out(j) = new GenericInternalRow(Array[Any](
        kv.getKey, kv.getValue.tf,
        UTF8String.fromString(kv.getValue.sb.toString)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def column(c: Column): Column =
    GraftSqlBridge.column(PostingsExpr(GraftSqlBridge.expression(c)))
}
