package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document frequent-pair emission for A-priori level 2 (q107):
  * `array<string>` of tokens → `array<int>` of PACKED PAIR CODES —
  * every unordered pair (binary order tok_a < tok_b) of DISTINCT
  * document tokens that are both members of a driver-collected
  * frequent-item set, encoded as ONE int `a * K + b` over the indices
  * of the (sorted) set. One hash-map pass per document; the pair
  * fanout is quadratic only in frequent tokens per doc, which is
  * A-priori's own feasibility bound.
  *
  * Why an expression: the equivalent relational form (explode →
  * broadcast semi-join → self-join on doc_id) pays a doc_id exchange
  * and two evaluations of the exploded stream to compute something
  * that never leaves the row, and the pure-HOF form
  * (`array_intersect` + nested `transform`) allocates intermediate
  * arrays per element — measured at sf0.1 (r9): join plan 0.81 s, HOF
  * plan 1.10 s, kernel pass ≈ the corpus scan. Callers must tier on
  * the frequent-set size (the set rides into codegen as one reference
  * object): small set → this kernel; above the cap → keep the
  * broadcast self-join plan, which scales without a driver set.
  *
  * Why CODES, not `struct<string,string>` (the r9–r17 form — r18
  * duel): the caller aggregates the exploded pair stream, and an int
  * key makes every partial/final census agg hash and compare 4 dense
  * bytes instead of two strings, and makes the exchange rows fixed
  * width. Since the set is sorted ascending by UTF8 BINARY order,
  * code order == (tok_a, tok_b) binary order — `ORDER BY support
  * DESC, code` reproduces the pair ordering contract and only the
  * top-k survivors decode back to strings (`element_at` on one array
  * literal). Interleaved duel vs the struct form, bit-identical
  * output at four corpora: sf0.1 0.638/0.671 → 0.461/0.505 min/med,
  * ×100-replicated 2.153/2.203 → 1.456/1.502.
  *
  * Determinism: membership is UTF8 binary equality; the sorted-set
  * index order IS UTF8String binary order — the same `<` Spark and
  * DuckDB apply to strings under UTF8_BINARY collation. The
  * sortedness is a constructor `require`, not caller trust. Null
  * contract: null array → null; null ELEMENTS raise a descriptive
  * IllegalArgumentException (inputs are `split` outputs, which never
  * contain nulls — same contract as doc_postings).
  *
  * Worst-case row size: a document containing k of the set's tokens
  * emits k·(k−1)/2 ints — quadratic in MATCHED tokens per row by
  * A-priori's own design. [[FrequentPairCodesExpr.MaxCodeTokens]]
  * bounds the set at construction (a `require`, not a silent
  * truncation); q107's caller tier caps far lower (FreqLiteralCap =
  * 2048 → ≤ ~2M ints ≈ 8 MB for one pathological row, which the
  * census aggregate consumes streaming, never buffering the array). */
case class FrequentPairCodesExpr(child: Expression, tokens: Seq[String])
  extends UnaryExpression {

  require(tokens.size <= FrequentPairCodesExpr.MaxCodeTokens,
    s"frequent_pair_codes: set size ${tokens.size} exceeds MaxCodeTokens " +
      s"${FrequentPairCodesExpr.MaxCodeTokens} (a*K+b must stay inside an " +
      "int, and a driver-collected set this large should not ride into " +
      "the scan as a literal) — use the broadcast self-join tier instead " +
      "(see q107FrequentPairs)")
  require(tokens.view.zip(tokens.view.drop(1)).forall { case (a, b) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0 },
    "frequent_pair_codes: token set must be strictly ascending in UTF8 " +
      "binary order (code order == pair order is the decode contract; " +
      "sort with FrequentPairsExpr.Utf8BinaryOrdering)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "frequent_pair_codes"

  @transient private lazy val kernel =
    new FrequentPairCodesKernel(tokens.toArray)

  override protected def nullSafeEval(a: Any): Any =
    kernel.eval(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("freqPairCodesKernel", kernel,
      classOf[FrequentPairCodesKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.eval($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): FrequentPairCodesExpr =
    copy(child = newChild)
}

object FrequentPairCodesExpr {

  /** Packed-code cap, enforced at construction: `a * K + b` with
    * a, b < K must stay inside a non-negative int, so K ≤
    * floor(sqrt(2^31)) = 46340 — far above any sane kernel-tier cap
    * (q107 uses 2048), and it keeps the codegen reference object's
    * footprint and the worst-case per-row output bounded. */
  val MaxCodeTokens: Int = 46340

  /** Column-API entry point; `tokens` must be strictly ascending by
    * UTF8 binary order (see the class contract —
    * [[FrequentPairsExpr.Utf8BinaryOrdering]] is the right sort). */
  def column(c: Column, tokens: Seq[String]): Column =
    GraftSqlBridge.column(
      FrequentPairCodesExpr(GraftSqlBridge.expression(c), tokens))
}

/** Shared helpers for frequent-pair callers. (Named for the operator
  * family, kept after the struct-emitting expression it once housed
  * was replaced by [[FrequentPairCodesExpr]] in r18.) */
object FrequentPairsExpr {

  /** `String` ordering matching UTF8String's binary comparison (byte-
    * wise unsigned over UTF-8). This is NOT `String`'s natural
    * UTF-16 order — they disagree for supplementary-plane code points
    * — and the codes kernel's decode contract is pinned to the binary
    * order both engines' `<` applies under UTF8_BINARY collation. */
  val Utf8BinaryOrdering: Ordering[String] =
    Ordering.comparatorToOrdering(
      java.util.Comparator.comparing[String, Array[Byte]](
        (s: String) => s.getBytes("UTF-8"),
        java.util.Arrays.compareUnsigned(_, _)))
}

/** The per-partition state: a token → index hash map over the sorted
  * set, built once lazily (executor-side after deserialization, never
  * per row). Serializable so codegen can carry it as a reference
  * object. Per-CALL scratch only — the kernel object is shared across
  * concurrently running tasks in local mode. */
final class FrequentPairCodesKernel(tokens: Array[String])
  extends Serializable {

  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](tokens.length * 2)
    var i = 0
    while (i < tokens.length) {
      m.put(UTF8String.fromString(tokens(i)), Integer.valueOf(i))
      i += 1
    }
    m
  }

  def eval(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // matched indices, possibly with repeats — sort + adjacent-dedup
    // collapses them (the set is sorted, so index order IS UTF8-binary
    // token order). No UTF8String clones anywhere: only ints survive
    // the row.
    var buf = new Array[Int](math.min(math.max(n, 1), 16))
    var len = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null) throw new IllegalArgumentException(
        s"frequent_pair_codes: null array element at index $i — null " +
          "tokens are unsupported (inputs are expected to be split outputs)")
      val idx = index.get(t)
      if (idx != null) {
        if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
        buf(len) = idx.intValue()
        len += 1
      }
      i += 1
    }
    if (len < 2) return new GenericArrayData(Array.empty[Int])
    java.util.Arrays.sort(buf, 0, len)
    var k = 1 // adjacent dedup in place
    var j = 1
    while (j < len) {
      if (buf(j) != buf(k - 1)) { buf(k) = buf(j); k += 1 }
      j += 1
    }
    if (k < 2) return new GenericArrayData(Array.empty[Int])
    val kk = tokens.length
    val out = new Array[Int](k * (k - 1) / 2)
    var p = 0
    var a = 0
    while (a < k - 1) {
      val base = buf(a) * kk
      var b = a + 1
      while (b < k) {
        out(p) = base + buf(b)
        p += 1
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }
}
