package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass 32-bit SimHash signature — the per-document
  * signature build of `docs_simhash` / `docs_simhash_hamming` /
  * `docs_dedup_then_simhash`, fused: tokenize (`split(trim(text),
  * '\\s+')`, the engine's one tokenizer), per token take the first 32
  * MD5 bits, vote ±1 per bit position weighted by occurrence, emit the
  * 32-char '1'/'0' signature (bit i of the signature string is bit
  * (31−i) of the token hash word; sum > 0 → '1', ties → '0').
  *
  * Vote sums are ADDITIVE per token instance, so this is exactly the
  * distributed spelling's arithmetic (distinct-(doc, tok) × count was
  * only ever an optimization to hash each distinct term once): for
  * every token instance t, vote[pos] += bit(31−pos, h32(t)) ? 1 : −1.
  *
  * What the fused form removes at scale: the EXPLODED token stream and
  * its (doc_id, tok) exchange — the signature becomes pure map-side
  * work inside whole-stage codegen, one MessageDigest call per token
  * instance with no hex-string/`conv` round trip and no 32-wide
  * interpreted lambda. The r10-era A/B that rejected a map-side
  * signature measured 32 INTERPRETED `aggregate` passes over a
  * token-hash array (+20% at sf0.1, documented at
  * DocQueries.simhashFramesOf); this is the (b)-tier native spelling
  * of the same idea, gated by SimhashSigSpec's fused≡composed sweep
  * and the three unchanged oracle rows.
  */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimhashSig.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimhashSig.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashSig {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def simhash(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    val md = digest.get()
    val out16 = new Array[Byte](16)
    val votes = new Array[Int](32)

    def emit(from: Int, until: Int): Unit = {
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(out16, 0, 16)
      val h32 = ((out16(0) & 0xffL) << 24) | ((out16(1) & 0xffL) << 16) |
        ((out16(2) & 0xffL) << 8) | (out16(3) & 0xffL)
      var pos = 0
      while (pos < 32) {
        if (((h32 >>> (31 - pos)) & 1L) == 1L) votes(pos) += 1
        else votes(pos) -= 1
        pos += 1
      }
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
    emit(start, hi)
    val sig = new Array[Byte](32)
    var i = 0
    while (i < 32) {
      sig(i) = if (votes(i) > 0) '1' else '0'
      i += 1
    }
    UTF8String.fromBytes(sig)
  }
}
