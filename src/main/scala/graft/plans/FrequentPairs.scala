package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document frequent-pair emission for A-priori level 2 (q107):
  * `array<string>` of tokens → `array<struct<tok_a, tok_b>>` — every
  * unordered pair (binary order tok_a < tok_b) of DISTINCT document
  * tokens that are both members of a driver-collected frequent-item
  * set. One hash-set pass per document; the pair fanout is quadratic
  * only in frequent tokens per doc, which is A-priori's own
  * feasibility bound.
  *
  * Why an expression: the equivalent relational form (explode →
  * broadcast semi-join → self-join on doc_id) pays a doc_id exchange
  * and two evaluations of the exploded stream to compute something
  * that never leaves the row, and the pure-HOF form
  * (`array_intersect` + nested `transform`) allocates intermediate
  * arrays per element — measured at sf0.1: join plan 0.81 s, HOF plan
  * 1.10 s, this kernel's pass ≈ the corpus scan. Callers must tier on
  * the frequent-set size (the set rides into codegen as one reference
  * object): small set → this kernel; above the cap → keep the
  * broadcast self-join plan, which scales without a driver set.
  *
  * Determinism: membership is UTF8 binary equality, pair order is
  * UTF8String binary compare — the same `<` Spark and DuckDB apply to
  * strings under UTF8_BINARY collation. Output pairs are emitted in
  * sorted-token order per doc; every caller re-aggregates anyway.
  * Null contract: null array → null; null ELEMENTS raise a
  * descriptive IllegalArgumentException (inputs are `split` outputs,
  * which never contain nulls — same contract as doc_postings).
  *
  * Worst-case row size: a document containing k of the set's tokens
  * emits k·(k−1)/2 structs — quadratic in MATCHED tokens per row by
  * A-priori's own design. [[FrequentPairsExpr.MaxTokens]] bounds the
  * set at construction (a `require`, not a silent truncation), so one
  * output row is at most MaxTokens·(MaxTokens−1)/2 structs; q107's
  * caller tier caps far lower (FreqLiteralCap = 2048 → ≤ ~2M structs
  * ≈ tens of MB for one pathological row, which the census aggregate
  * consumes streaming, never buffering the array). */
case class FrequentPairsExpr(child: Expression, tokens: Seq[String])
  extends UnaryExpression {

  require(tokens.size <= FrequentPairsExpr.MaxTokens,
    s"frequent_pairs: set size ${tokens.size} exceeds MaxTokens " +
      s"${FrequentPairsExpr.MaxTokens} — a driver-collected set this " +
      "large should not ride into the scan as a literal; use the " +
      "broadcast self-join tier instead (see q107FrequentPairs)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $t")
  }

  override def dataType: DataType = FrequentPairsExpr.OutType

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "frequent_pairs"

  @transient private lazy val kernel = new FrequentPairsKernel(tokens.toArray)

  override protected def nullSafeEval(a: Any): Any =
    kernel.eval(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("freqPairsKernel", kernel,
      classOf[FrequentPairsKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.eval($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): FrequentPairsExpr =
    copy(child = newChild)
}

object FrequentPairsExpr {

  /** Hard cap on the literal set size, enforced at construction.
    * 65536 is far above any sane kernel-tier cap (q107 uses 2048) but
    * still bounds the worst-case per-row output at ~2^31 structs and
    * keeps the codegen reference object's footprint sane. */
  val MaxTokens: Int = 1 << 16

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("tok_a", StringType, nullable = false),
    StructField("tok_b", StringType, nullable = false))),
    containsNull = false)

  /** Column-API entry point; `tokens` is the driver-collected
    * frequent-item set (callers bound its size — see the tier note in
    * the class scaladoc). */
  def column(c: Column, tokens: Seq[String]): Column =
    GraftSqlBridge.column(
      FrequentPairsExpr(GraftSqlBridge.expression(c), tokens))
}

/** The per-partition state: a hash set of the frequent tokens, built
  * once lazily (executor-side after deserialization, never per row).
  * Serializable so codegen can carry it as a reference object. */
final class FrequentPairsKernel(tokens: Array[String])
  extends Serializable {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](tokens.length * 2)
    tokens.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  def eval(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // distinct matched tokens, cloned (input strings point into the
    // current row's buffer; the emitted pairs outlive it)
    val matched = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null) throw new IllegalArgumentException(
        s"frequent_pairs: null array element at index $i — null tokens " +
          "are unsupported (inputs are expected to be split outputs)")
      if (set.contains(t) && !matched.contains(t)) matched.add(t.clone())
      i += 1
    }
    val k = matched.size()
    if (k < 2) return new GenericArrayData(Array.empty[Any])
    val ms = matched.toArray(new Array[UTF8String](k)) // ascending (binary)
    val out = new Array[Any](k * (k - 1) / 2)
    var p = 0
    var a = 0
    while (a < k - 1) {
      var b = a + 1
      while (b < k) {
        out(p) = new GenericInternalRow(Array[Any](ms(a), ms(b)))
        p += 1
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }
}
