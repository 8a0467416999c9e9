package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass text normalization — the canonical cleaning
  * transform before exact dedup:
  * `trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ''), ' +', ' '))`.
  *
  * The composed spelling runs TWO full regex scans per row (each a
  * backtracking-machine pass with per-match buffer copies) plus a
  * lowercase pass — three O(n) traversals of every document, pure
  * map-side CPU that dominated the dedup line's wall at scale
  * (21.9 s warm at the 100× corpus). This expression fuses all four
  * steps into ONE byte loop with no intermediate strings, inside
  * whole-stage codegen. Same (b)-tier extension rationale as
  * [[CosineSimilarity]]: reached only because the built-in formulation
  * measurably can't keep up.
  *
  * Semantics are EXACTLY the composed form's, by construction of the
  * loop (and pinned case-by-case in NormalizeSpec):
  *  - chars are lowercased first (`lower`),
  *  - chars outside `[a-z0-9 ]` then VANISH — adjacent survivors join
  *    with no space (`'a.,b' → 'ab'`), because the strip runs before the
  *    space-collapse,
  *  - runs of spaces (including runs created by stripping, e.g.
  *    `'a . b' → 'a  b' → 'a b'`) collapse to one space,
  *  - leading/trailing spaces are trimmed.
  * The fused loop tracks that with one `pendingSpace` flag: a surviving
  * space between emitted chars flushes as a single ' ' before the next
  * alphanumeric; spaces before the first survivor or after the last are
  * never flushed (= trim).
  *
  * Non-ASCII input takes a slow path that literally evaluates the
  * composed form (same `UTF8String.toLowerCase`, same
  * `java.util.regex` replaceAll) — correctness never depends on the
  * fast path's ASCII-only lowercasing. The corpora here are pure ASCII,
  * so the slow path is a safety net, not a hot path.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizeText.normalizeUtf8($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeText = copy(child = newChild)
}

object NormalizeText {

  /** Single fused pass for ASCII bytes; falls back to the literal
    * composed evaluation when any non-ASCII byte appears. */
  def normalizeUtf8(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) return slowNormalize(s)
      i += 1
    }
    val out = new Array[Byte](bytes.length)
    var n = 0
    var pendingSpace = false
    i = 0
    while (i < bytes.length) {
      var c = bytes(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace) { out(n) = ' '; n += 1; pendingSpace = false }
        out(n) = c
        n += 1
      } else if (c == ' ' && n > 0) {
        pendingSpace = true
      }
      // any other char: stripped — vanishes without flushing a space
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  private val strip = java.util.regex.Pattern.compile("[^a-z0-9 ]+")
  private val runs = java.util.regex.Pattern.compile(" +")

  /** The composed form, evaluated literally: Spark's own
    * `UTF8String.toLowerCase` (what `lower()` runs), then the two
    * regex replaceAlls, then trim. */
  private[functions] def slowNormalize(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val stripped = strip.matcher(lowered).replaceAll("")
    UTF8String.fromString(
      runs.matcher(stripped).replaceAll(" ")).trim()
  }
}
