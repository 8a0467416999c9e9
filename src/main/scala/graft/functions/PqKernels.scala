package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd product-quantization kernels — the (b)-tier
  * extension path (scalar `Expression` with `doGenCode`), reached like
  * [[CosineSimilarity]] because the composed higher-order-function
  * spelling measurably can't keep up: PQ encoding is ~640 arithmetic
  * steps per row (cells × subspaces × dims), which as interpreted
  * lambdas means ~640 virtual calls and boxed doubles per row; here it
  * is one fused primitive loop inside whole-stage codegen.
  *
  * Shared semantics (bit-identical to the `emb_pq_topk` DuckDB oracle):
  * the vector splits into `m` subspaces of `len/m` dims; `cents` is the
  * label-sorted codebook flattened to one `array<double>` (C × len);
  * per subspace the code is the argmin-by-L2² cell with FIRST-wins tie
  * break (== smallest label, the oracle's `(d2, clabel)` ordering);
  * every fold — subspace distances, per-subspace dot/norm, the final
  * sum over subspaces — accumulates sequentially in index order with
  * the per-subspace subtotal kept separate before the outer add (the
  * oracle's `list_sum(list(qd ORDER BY m))` shape; fusing the two
  * accumulators would round differently).
  *
  * Same degenerate-input caveat as [[CosineSimilarity]]: null slots
  * read as 0, lengths are trusted — validate embeddings upstream. */
private[functions] object PqKernel {

  /** codes[s] for each of the `m` subspaces — shared by eval paths. */
  def encode(v: ArrayData, cents: ArrayData, m: Int): Array[Int] = {
    val len = v.numElements()
    val sub = len / m
    val cells = cents.numElements() / len
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < cells) {
        var d2 = 0.0
        var j = 0
        while (j < sub) {
          val d = v.getFloat(s * sub + j).toDouble -
            cents.getDouble(c * len + s * sub + j)
          d2 += d * d
          j += 1
        }
        if (d2 < best) { best = d2; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    codes
  }
}

/** `graft_pq_score(embedding, cents, qv, m)` → the PQ-approximate dot
  * product Σ_s dot(q_s, codeword_s). */
case class PqScore(first: Expression, second: Expression, third: Expression,
                   m: Int) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _),
          ArrayType(DoubleType, _)) if m > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<double>, array<double>)" +
          s" with m > 0, got (${first.dataType.simpleString}, " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString})")
    }
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_score"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val qv = c.asInstanceOf[ArrayData]
    val len = v.numElements()
    val sub = len / m
    val codes = PqKernel.encode(v, cents, m)
    var ad = 0.0
    var s = 0
    while (s < m) {
      var qd = 0.0
      var j = 0
      while (j < sub) {
        qd += qv.getDouble(s * sub + j) *
          cents.getDouble(codes(s) * len + s * sub + j)
        j += 1
      }
      ad += qd
      s += 1
    }
    ad
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val len = ctx.freshName("len"); val sub = ctx.freshName("sub")
      val cells = ctx.freshName("cells"); val s = ctx.freshName("s")
      val cc = ctx.freshName("cc"); val j = ctx.freshName("j")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val d2 = ctx.freshName("d2"); val d = ctx.freshName("d")
      val qd = ctx.freshName("qd"); val ad = ctx.freshName("ad")
      s"""
         |int $len = $a.numElements();
         |int $sub = $len / $m;
         |int $cells = $b.numElements() / $len;
         |double $ad = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $cc = 0; $cc < $cells; $cc++) {
         |    double $d2 = 0.0;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      double $d = (double) $a.getFloat($s * $sub + $j)
         |        - $b.getDouble($cc * $len + $s * $sub + $j);
         |      $d2 += $d * $d;
         |    }
         |    if ($d2 < $best) { $best = $d2; $bestC = $cc; }
         |  }
         |  double $qd = 0.0;
         |  for (int $j = 0; $j < $sub; $j++) {
         |    $qd += $c.getDouble($s * $sub + $j)
         |      * $b.getDouble($bestC * $len + $s * $sub + $j);
         |  }
         |  $ad += $qd;
         |}
         |${ev.value} = $ad;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqScore =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_pq_norm(embedding, cents, m)` → the PQ-approximate squared
  * norm Σ_s ‖codeword_s‖². */
case class PqNorm(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) if m > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<double>) with m > 0, " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_norm"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val len = v.numElements()
    val sub = len / m
    val codes = PqKernel.encode(v, cents, m)
    var an = 0.0
    var s = 0
    while (s < m) {
      var cn = 0.0
      var j = 0
      while (j < sub) {
        val x = cents.getDouble(codes(s) * len + s * sub + j)
        cn += x * x
        j += 1
      }
      an += cn
      s += 1
    }
    an
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val len = ctx.freshName("len"); val sub = ctx.freshName("sub")
      val cells = ctx.freshName("cells"); val s = ctx.freshName("s")
      val cc = ctx.freshName("cc"); val j = ctx.freshName("j")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val d2 = ctx.freshName("d2"); val d = ctx.freshName("d")
      val cn = ctx.freshName("cn"); val an = ctx.freshName("an")
      val x = ctx.freshName("x")
      s"""
         |int $len = $a.numElements();
         |int $sub = $len / $m;
         |int $cells = $b.numElements() / $len;
         |double $an = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $cc = 0; $cc < $cells; $cc++) {
         |    double $d2 = 0.0;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      double $d = (double) $a.getFloat($s * $sub + $j)
         |        - $b.getDouble($cc * $len + $s * $sub + $j);
         |      $d2 += $d * $d;
         |    }
         |    if ($d2 < $best) { $best = $d2; $bestC = $cc; }
         |  }
         |  double $cn = 0.0;
         |  for (int $j = 0; $j < $sub; $j++) {
         |    double $x = $b.getDouble($bestC * $len + $s * $sub + $j);
         |    $cn += $x * $x;
         |  }
         |  $an += $cn;
         |}
         |${ev.value} = $an;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqNorm =
    copy(left = newLeft, right = newRight)
}
