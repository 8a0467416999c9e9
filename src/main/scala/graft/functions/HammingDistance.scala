package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Hamming distance between two equal-length strings — the
  * ranking kernel for simhash near-dup detection (count of differing
  * positions between two '0'/'1' signature strings; works for any
  * same-length ASCII keys).
  *
  * The built-in spelling
  * (`aggregate(zip_with(split(a,''), split(b,''), ...))` or a
  * `transform(sequence(...))` over `substr`) allocates two arrays and
  * runs interpreted per-character lambdas per row; per-PAIR work in a
  * bucket self-join multiplies that by the candidate count. This
  * expression is one fused byte loop inside whole-stage codegen.
  *
  * NULL on length mismatch (there is no meaningful Hamming distance
  * between different-length signatures — surfacing null instead of a
  * truncated count makes an upstream bug visible in the result). Bytes
  * are compared directly: for the ASCII signature alphabet this equals
  * per-character comparison in both engines.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = IntegerType

  // non-null inputs of mismatched length yield null
  override def nullable: Boolean = true

  override def prettyName: String = "graft_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    if (x.length != y.length) null
    else {
      var d = 0
      var i = 0
      while (i < x.length) {
        if (x(i) != y(i)) d += 1
        i += 1
      }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xb = ctx.freshName("xb")
      val yb = ctx.freshName("yb")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |byte[] $xb = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |if ($xb.length != $yb.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $d = 0;
         |  for (int $i = 0; $i < $xb.length; $i++) {
         |    if ($xb[$i] != $yb[$i]) $d++;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
