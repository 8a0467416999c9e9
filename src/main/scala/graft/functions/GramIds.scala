package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass word-n-gram id list — the gram representation
  * shared by the decontamination family and span dedup
  * (DocQueries.gramsCol) and the hashed-bigram LM features
  * (DocQueries.lmSurprise), fused into one byte loop:
  *
  * `transform(split(trim(text), '\\s+'), x ->
  *    cast(conv(substr(md5(x), 1, 13), 16, 10) AS bigint))`
  * → sliding window of n, polynomial fold
  *   `acc = (acc * 1031 + h) % 2^52`.
  *
  * The composed spelling pays, per TOKEN: a regex `split` (one
  * UTF8String allocation per token), an `md5` hex STRING (32-char
  * UTF8String), a `substr` (another string), and a `conv` base-16
  * parse (string → string → cast) — and the window fold runs inside
  * nested `transform`/`sequence` higher-order functions, which are
  * CodegenFallback in Spark: the whole gram subtree evaluates
  * interpreted, boxing every lambda variable. This expression does the
  * tokenize, the per-token MD5 (digest bytes straight to a long — no
  * hex string exists at any point), and the window fold in one pass
  * with two primitive arrays. Same (b)-tier rationale as
  * [[NormalizeText]]: reached only because the built-in formulation
  * measurably can't keep up, gated by a fused≡composed property suite
  * (GramIdsSpec) and the unchanged `docs_contamination*` /
  * `docs_span_dedup` / `docs_lm_surprise` oracle rows.
  *
  * Semantics are EXACTLY the composed form's, for ALL inputs (no
  * ASCII-only fast path is needed — every step below is byte-exact):
  *  - `trim` strips 0x20 bytes only (Spark's `StringTrim`), never
  *    other whitespace;
  *  - tokenization reproduces Java `Pattern.split("\\s+", -1)` on the
  *    trimmed string: `\s` = `[ \t\n\x0B\f\r]` (ASCII-only in Java's
  *    default mode, and UTF-8 guarantees no multi-byte code point
  *    contains an ASCII byte), a separator run at the start yields a
  *    leading EMPTY token, one at the end a trailing empty token, and
  *    the empty string yields the single-empty-token list [""];
  *  - each token hashes to the first 13 hex nibbles of its MD5 = the
  *    digest's first 52 bits, big-endian — `conv(substr(md5 …))`
  *    parses exactly those nibbles;
  *  - the window fold is computed mod 2^52, a POWER OF TWO, so 64-bit
  *    wraparound multiply/add followed by a 52-bit mask is exact and
  *    the rolling-window update
  *    `g' = (g - h_out·1031^(n-1)) · 1031 + h_in (mod 2^52)`
  *    is congruence-preserving (constant multiples and sums of values
  *    congruent mod 2^52 stay congruent; 2^52 | 2^64). The composed
  *    form's `%` on non-negative sub-2^62 intermediates computes the
  *    same canonical representative.
  *  - fewer than n tokens → empty list (the composed CASE arm).
  */
case class GramIds(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"graft_gram_ids window must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_gram_ids"

  override protected def nullSafeEval(input: Any): Any =
    GramIds.gramIds(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramIds.gramIds($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramIds =
    copy(child = newChild)
}

object GramIds {

  private val Mask = (1L << 52) - 1

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Token hash list of `split(trim(text), '\\s+')` — each token's
    * first 52 MD5 bits. Exposed for the property spec. */
  private[functions] def tokenHashes(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    val md = digest.get()
    val out16 = new Array[Byte](16)
    val hs = scala.collection.mutable.ArrayBuilder.make[Long]
    hs.sizeHint(8)

    def emit(from: Int, until: Int): Unit = {
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(out16, 0, 16)
      hs += ((out16(0) & 0xffL) << 44) | ((out16(1) & 0xffL) << 36) |
        ((out16(2) & 0xffL) << 28) | ((out16(3) & 0xffL) << 20) |
        ((out16(4) & 0xffL) << 12) | ((out16(5) & 0xffL) << 4) |
        ((out16(6) & 0xffL) >>> 4)
    }

    var pos = lo
    var start = lo
    while (pos < hi) {
      if (isWs(bytes(pos))) {
        emit(start, pos)
        pos += 1
        while (pos < hi && isWs(bytes(pos))) pos += 1
        start = pos
      } else pos += 1
    }
    emit(start, hi) // final token; empty when the trimmed text ends in \s
    hs.result()
  }

  def gramIds(s: UTF8String, n: Int): ArrayData = {
    val hs = tokenHashes(s)
    val m = hs.length - n + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    var pow = 1L // 1031^(n-1) mod 2^52
    var j = 1
    while (j < n) { pow = (pow * 1031) & Mask; j += 1 }
    val out = new Array[Long](m)
    var acc = hs(0)
    j = 1
    while (j < n) { acc = (acc * 1031 + hs(j)) & Mask; j += 1 }
    out(0) = acc
    var i = 1
    while (i < m) {
      acc = ((acc - hs(i - 1) * pow) * 1031 + hs(i + n - 1)) & Mask
      out(i) = acc
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
