package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) for the
  * IVF-PQ path (E10): an `array<double>` vector split into
  * `codebooks.length` contiguous subspaces, each encoded as the index
  * of its nearest sub-codeword by SQUARED L2 (the PQ objective —
  * reconstruction MSE; cosine is the SEARCH metric, applied later to
  * the reconstruction). Both kernels follow the
  * [[NearestCentroids]] discipline: the codebook tensor rides
  * `ctx.addReferenceObj` (O(1) plan size, no Janino blow-up at large
  * code counts), the loops are fused primitives inside whole-stage
  * codegen, and ties break to the SMALLEST code so encoding is a pure
  * function of (vector, codebooks).
  *
  * A vector shorter than Σ subspace widths zero-pads implicitly (the
  * missing tail contributes the codeword's own energy to every
  * distance — a constant per subspace, so the argmin is unaffected
  * only if widths agree; callers validate dims upstream, this is just
  * the no-crash posture shared with [[NearestCentroids]]).
  */
case class PqEncode(child: Expression,
                    codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val nSub = codebooks.length
  require(nSub >= 1, "PqEncode: need at least one subspace codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val codes = new Array[Int](nSub)
    var off = 0
    var s = 0
    while (s < nSub) {
      val cb = codebooks(s)
      val w = cb(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var d = 0.0
        var j = 0
        while (j < w) {
          val x = (if (off + j < n) v.getDouble(off + j) else 0.0) - cw(j)
          d += x * x
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      off += w
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val codes = ctx.freshName("codes")
      val off = ctx.freshName("off"); val s = ctx.freshName("s")
      val cb = ctx.freshName("cb"); val w = ctx.freshName("w")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c"); val cw = ctx.freshName("cw")
      val d = ctx.freshName("d"); val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      s"""
         |int $n = $v.numElements();
         |int[] $codes = new int[$nSub];
         |int $off = 0;
         |for (int $s = 0; $s < $nSub; $s++) {
         |  double[][] $cb = $cbRef[$s];
         |  int $w = $cb[0].length;
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    double[] $cw = $cb[$c];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $w; $j++) {
         |      double $x = (($off + $j < $n) ? $v.getDouble($off + $j) : 0.0) - $cw[$j];
         |      $d += $x * $x;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |  $off += $w;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ reconstruction: codes (`array<int>`, one per subspace) back to
  * the concatenated codeword vector. `dot(query, PqDecode(codes))`
  * IS asymmetric distance computation — Σ_s dot(q_s, cb_s[code_s]) —
  * so the ADC scoring path reuses the existing codegen dot/cosine
  * kernels instead of a bespoke LUT machine. Out-of-range or missing
  * codes decode to zeros (defensive; encoder never emits them). */
case class PqDecode(child: Expression,
                    codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val nSub = codebooks.length
  require(nSub >= 1, "PqDecode: need at least one subspace codebook")
  private val outLen = codebooks.map(_(0).length).sum

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_decode"

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    val out = new Array[Double](outLen)
    var off = 0
    var s = 0
    while (s < nSub) {
      val cb = codebooks(s)
      val w = cb(0).length
      if (s < codes.numElements()) {
        val c = codes.getInt(s)
        if (c >= 0 && c < cb.length) {
          System.arraycopy(cb(c), 0, out, off, w)
        }
      }
      off += w
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, codes => {
      val out = ctx.freshName("out"); val off = ctx.freshName("off")
      val s = ctx.freshName("s"); val cb = ctx.freshName("cb")
      val w = ctx.freshName("w"); val c = ctx.freshName("c")
      s"""
         |double[] $out = new double[$outLen];
         |int $off = 0;
         |for (int $s = 0; $s < $nSub; $s++) {
         |  double[][] $cb = $cbRef[$s];
         |  int $w = $cb[0].length;
         |  if ($s < $codes.numElements()) {
         |    int $c = $codes.getInt($s);
         |    if ($c >= 0 && $c < $cb.length) {
         |      System.arraycopy($cb[$c], 0, $out, $off, $w);
         |    }
         |  }
         |  $off += $w;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
