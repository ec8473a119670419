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
  private[plans] val digests: ThreadLocal[MessageDigest] =
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

/** All `depth` sketch hash positions of one key from ONE md5 digest —
  * the native form of the CMS/bloom slice recipe: position r is hex
  * characters [8r+1, 8r+8] of the digest base-16, i.e. digest bytes
  * [4r, 4r+4) as an unsigned big-endian int, mod `width` (bit-parity
  * with `conv(substring(md5(c), 8r+1, 8), 16, 10) % width` pinned in
  * VectorExpressionSpec). The composed form materialized the 32-char
  * hex string and ran `conv`'s base-conversion parse depth× per row;
  * this kernel hashes once and slices bytes, inside whole-stage
  * codegen, returning `array<long>` for posexplode (build side) or
  * element_at (probe side). */
case class Md5SlicesExpr(child: Expression, depth: Int, width: Int)
  extends UnaryExpression {

  require(depth >= 1 && depth * 4 <= 16,
    s"md5_slices depth $depth exceeds the 16 bytes of md5")
  require(width > 0, "md5_slices width must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "md5_slices"

  override protected def nullSafeEval(s: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Md5SlicesExpr.slices(s.asInstanceOf[UTF8String].getBytes, depth, width))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.Md5SlicesExpr.slices($c.getBytes(), $depth, $width))")

  override protected def withNewChildInternal(newChild: Expression): Md5SlicesExpr =
    copy(child = newChild)
}

object Md5SlicesExpr {

  def slices(bytes: Array[Byte], depth: Int, width: Int): Array[Long] = {
    val d = Md5Hash60Expr.digests.get().digest(bytes)
    val out = new Array[Long](depth)
    var r = 0
    while (r < depth) {
      val v = ((d(4 * r) & 0xffL) << 24) | ((d(4 * r + 1) & 0xffL) << 16) |
        ((d(4 * r + 2) & 0xffL) << 8) | (d(4 * r + 3) & 0xffL)
      out(r) = v % width
      r += 1
    }
    out
  }

  /** Column-API entry point. */
  def column(c: Column, depth: Int, width: Int): Column =
    GraftSqlBridge.column(
      Md5SlicesExpr(GraftSqlBridge.expression(c), depth, width))
}

/** All k-token shingle hashes of one token array in ONE kernel —
  * `array<long>` of md5_hash60 over each window's space-joined text,
  * bit-identical to `transform(windows, w -> md5_hash60(concat_ws(' ',
  * w)))` over the composed shingle render (parity pinned in
  * VectorExpressionSpec against the exact `shingleArrayExpr` +
  * `md5Hash60` chain the substring-dup queries used).
  *
  * Why native: the composed form materializes every shingle as a
  * ~50-byte string (k element_at calls + concat per window, 2.3M
  * allocations at sf0.1) only for the hash to consume and discard it —
  * measured at ~0.45 s of the 0.58 s explode+hash stage, more than
  * DuckDB's whole q95. Here the digest streams each window's token
  * bytes directly (`MessageDigest.update` per token + separator), so
  * no shingle string ever exists; the explode downstream carries longs.
  * Per-row cost is O(tokens × k) digest updates — the same bytes the
  * composed form hashed, without the alloc/copy/GC tax.
  *
  * Null contract: a null ARRAY yields null (UnaryExpression default);
  * null ELEMENTS are not supported (inputs are `split` outputs, which
  * never contain them) — matching the composed form, whose concat
  * would turn such a window into a null shingle, is therefore moot. */
case class ShingleHash60Expr(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1, s"shingle_hash60 k must be >= 1 (got $k)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(_: StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $t")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "shingle_hash60"

  override protected def nullSafeEval(s: Any): Any =
    ShingleHash60Expr.hashes(
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShingleHash60Expr.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60Expr =
    copy(child = newChild)
}

object ShingleHash60Expr {

  private val Space = ' '.toByte

  def hashes(arr: org.apache.spark.sql.catalyst.util.ArrayData,
             k: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = arr.numElements()
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = Md5Hash60Expr.digests.get()
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(Space)
        md.update(toks(i + j))
        j += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) {
        v = (v << 8) | (d(b) & 0xffL)
        b += 1
      }
      out(i) = v >>> 4
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column-API entry point. */
  def column(c: Column, k: Int): Column =
    GraftSqlBridge.column(ShingleHash60Expr(GraftSqlBridge.expression(c), k))
}

/** Distinct k-token-window count — the per-doc repetition signal
  * (Gopher dup-bigram/trigram rules, q37/q109) as ONE primitive pass:
  * 64-bit FNV-1a per token (read straight off the UTF8String bytes, no
  * concatenated n-gram strings, no array materialization), an
  * order-sensitive polynomial combine per window, and an open-addressed
  * long set for the distinct count. Replaces
  * `size(array_distinct(ngrams(toks, k)))`, which allocated one
  * concatenated string per window plus a string hash set per row.
  *
  * Exactness: equals the string-distinct count unless two DIFFERENT
  * windows of one document collide in 64 bits — ~m²/2⁶⁵ per doc
  * (m = windows/doc), i.e. never in practice, and the oracle
  * hash-check would surface it deterministically if it occurred (the
  * count enters hash-checked output columns). Same trade the 60-bit
  * shingle kernels (q95/q97) make, documented there.
  *
  * Null contract: null array → null (UnaryExpression default); null
  * elements unsupported (inputs are `split` outputs). n < k → 0, like
  * `size` of the empty n-gram array. */
case class DistinctNgramCountExpr(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1, s"distinct_ngram_count k must be >= 1 (got $k)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(_: StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $t")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "distinct_ngram_count"

  override protected def nullSafeEval(s: Any): Any =
    DistinctNgramCountExpr.count(
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.DistinctNgramCountExpr.count($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): DistinctNgramCountExpr =
    copy(child = newChild)
}

object DistinctNgramCountExpr {

  def count(arr: org.apache.spark.sql.catalyst.util.ArrayData,
            k: Int): Long = {
    val n = arr.numElements()
    if (n < k) return 0L
    val m = n - k + 1
    // per-token 64-bit FNV-1a over the raw UTF8 bytes; a separator term
    // in the window combine keeps ("ab","c") and ("a","bc") apart even
    // though FNV itself is byte-stream-based
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val nb = s.numBytes()
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < nb) {
        h ^= (s.getByte(j) & 0xffL)
        h *= 0x100000001b3L
        j += 1
      }
      th(i) = h
      i += 1
    }
    // open-addressed set sized to the window count (load factor <= 0.5);
    // 0 marks an empty slot, so 0-valued hashes are nudged. Long
    // arithmetic + an explicit ceiling: the former Int formula
    // overflowed at m >= 2^29 windows, clamping cap to 8 and spinning
    // the probe loop forever — fail fast instead (a single document
    // with 2^28 token windows is already pathological input).
    require(m < (1 << 28),
      s"distinct_ngram_count: $m windows in one document exceeds 2^28")
    var cap = (java.lang.Long.highestOneBit(m.toLong * 4 - 1) << 1).toInt
    if (cap < 8) cap = 8
    val set = new Array[Long](cap)
    val mask = cap - 1
    var distinct = 0L
    i = 0
    while (i < m) {
      var w = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < k) {
        w = w * 0xff51afd7ed558ccdL + th(i + j)
        j += 1
      }
      if (w == 0L) w = 1L
      var pos = (w ^ (w >>> 33)).toInt & mask
      var seen = false
      while (!seen && set(pos) != 0L) {
        if (set(pos) == w) seen = true
        else pos = (pos + 1) & mask
      }
      if (!seen) { set(pos) = w; distinct += 1L }
      i += 1
    }
    distinct
  }

  /** Column-API entry point. */
  def column(c: Column, k: Int): Column =
    GraftSqlBridge.column(DistinctNgramCountExpr(GraftSqlBridge.expression(c), k))
}
