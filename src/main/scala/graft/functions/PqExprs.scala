package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

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
  * CODE LAYOUT (r13 — VERDICT r12 #5): `packed = true` (the default
  * and the E10 production path) emits BinaryType — ONE byte per
  * subspace code, requiring ≤ 256 codewords per sub-codebook (the
  * published PQ configuration; enforced at construction). This is
  * what realizes the claimed ~8 B candidate payload: the previous
  * `array<int>` rode Tungsten rows at 8 B header + 4 B/element
  * (~40 B at nSub=8) — a 5× candidate-shuffle shrink from the pack
  * alone, 32× vs the raw 64-double vectors. `packed = false` keeps
  * the `array<int>` layout for the bit-for-bit differential spec and
  * for codebooks wider than 256.
  *
  * A vector shorter than Σ subspace widths zero-pads implicitly (the
  * missing tail contributes the codeword's own energy to every
  * distance — a constant per subspace, so the argmin is unaffected
  * only if widths agree; callers validate dims upstream, this is just
  * the no-crash posture shared with [[NearestCentroids]]).
  */
case class PqEncode(child: Expression,
                    codebooks: Array[Array[Array[Double]]],
                    packed: Boolean = true)
    extends UnaryExpression {

  private val nSub = codebooks.length
  require(nSub >= 1, "PqEncode: need at least one subspace codebook")
  require(!packed || codebooks.forall(_.length <= 256),
    "PqEncode: packed (binary) codes need <= 256 codewords per " +
      s"sub-codebook, got ${codebooks.map(_.length).max}")

  override def dataType: DataType =
    if (packed) BinaryType else ArrayType(IntegerType, containsNull = false)
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
    if (packed) {
      val b = new Array[Byte](nSub)
      var i = 0
      while (i < nSub) { b(i) = (codes(i) & 0xFF).toByte; i += 1 }
      b
    } else new GenericArrayData(codes)
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
      // packed: write the byte directly; unpacked: collect ints
      val (decl, store, emit) =
        if (packed) (
          s"byte[] $codes = new byte[$nSub];",
          s"$codes[$s] = (byte) ($best & 0xFF);",
          s"${ev.value} = $codes;")
        else (
          s"int[] $codes = new int[$nSub];",
          s"$codes[$s] = $best;",
          s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);")
      s"""
         |int $n = $v.numElements();
         |$decl
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
         |  $store
         |  $off += $w;
         |}
         |$emit
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** FUSED ADC dot (r13 — the probe found the decode-then-dot path
  * CPU-bound at ~600 exec-CPU-s @100×: one 64-double
  * GenericArrayData ALLOCATION per candidate, then a 64-mult dot
  * plus a 64-mult re-norm, all to consume 8 codes): the asymmetric
  * distance Σ_s dot(q_s, cb_s[code_s]) accumulated DIRECTLY from the
  * packed codes — zero allocation, one fused loop, arithmetic
  * IDENTICAL to dot(q, PqDecode(codes)) including summation order
  * (subspaces left to right, dims inner), so scores are bit-equal to
  * the decode path (differential spec). Codes are the [[PqEncode]]
  * packed BinaryType; a missing/short query side contributes 0 (the
  * zero-pad posture). Pair with [[PqReconNorm]] for the cosine. */
case class PqAdcDot(left: Expression, right: Expression,
                    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  private val nSub = codebooks.length
  require(nSub >= 1, "PqAdcDot: need at least one subspace codebook")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"

  override def nullSafeEval(q: Any, c: Any): Any = {
    val v = q.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[Array[Byte]]
    val n = v.numElements()
    var acc = 0.0
    var off = 0
    var s = 0
    while (s < nSub) {
      val cb = codebooks(s)
      val w = cb(0).length
      if (s < codes.length) {
        val code = codes(s) & 0xFF
        if (code < cb.length) {
          val cw = cb(code)
          // single flat accumulator — NOT a per-subspace partial sum:
          // bit-equality with dot(q, PqDecode(codes)) needs the exact
          // left-to-right association of the flat pass
          var j = 0
          while (j < w) {
            if (off + j < n) acc += v.getDouble(off + j) * cw(j)
            j += 1
          }
        }
      }
      off += w
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, codes) => {
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val off = ctx.freshName("off"); val s = ctx.freshName("s")
      val cb = ctx.freshName("cb"); val w = ctx.freshName("w")
      val code = ctx.freshName("code"); val cw = ctx.freshName("cw")
      val j = ctx.freshName("j")
      s"""
         |int $n = $q.numElements();
         |double $acc = 0.0;
         |int $off = 0;
         |for (int $s = 0; $s < $nSub; $s++) {
         |  double[][] $cb = $cbRef[$s];
         |  int $w = $cb[0].length;
         |  if ($s < $codes.length) {
         |    int $code = $codes[$s] & 0xFF;
         |    if ($code < $cb.length) {
         |      double[] $cw = $cb[$code];
         |      // flat accumulator: bit-equal to dot(q, PqDecode(codes))
         |      for (int $j = 0; $j < $w; $j++) {
         |        if ($off + $j < $n) $acc += $q.getDouble($off + $j) * $cw[$j];
         |      }
         |    }
         |  }
         |  $off += $w;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Reconstruction L2 norm straight from packed codes: subspaces are
  * disjoint coordinate blocks, so ‖recon‖² = Σ_s ‖cb_s[code_s]‖² —
  * the per-codeword squared norms are precomputed ONCE at expression
  * construction (8×256 doubles, plan-side constant), making the
  * per-candidate cost 8 lookups + one sqrt instead of a 64-double
  * decode + 64-mult self-dot. NOTE the summation order differs from
  * l2(PqDecode(codes)) (per-subspace partial sums vs one flat pass):
  * equal to ≤ a few ulps, NOT bit-equal — fine for the approx
  * SHORTLIST score it exists for (returned hits are exactly
  * re-scored; the contract checks bind recall, not approx bits). */
case class PqReconNorm(child: Expression,
                       codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val nSub = codebooks.length
  require(nSub >= 1, "PqReconNorm: need at least one subspace codebook")
  private val sqNorms: Array[Array[Double]] =
    codebooks.map(_.map(cw => { var s = 0.0; var j = 0
      while (j < cw.length) { s += cw(j) * cw(j); j += 1 }; s }))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_recon_norm"

  override def nullSafeEval(c: Any): Any = {
    val codes = c.asInstanceOf[Array[Byte]]
    var acc = 0.0
    var s = 0
    while (s < nSub) {
      if (s < codes.length) {
        val code = codes(s) & 0xFF
        if (code < sqNorms(s).length) acc += sqNorms(s)(code)
      }
      s += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sqRef = ctx.addReferenceObj("pqSqNorms", sqNorms, "double[][]")
    nullSafeCodeGen(ctx, ev, codes => {
      val acc = ctx.freshName("acc"); val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      s"""
         |double $acc = 0.0;
         |for (int $s = 0; $s < $nSub; $s++) {
         |  if ($s < $codes.length) {
         |    int $code = $codes[$s] & 0xFF;
         |    if ($code < $sqRef[$s].length) $acc += $sqRef[$s][$code];
         |  }
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ reconstruction: codes (BinaryType — one UNSIGNED byte per
  * subspace, the [[PqEncode]] packed layout — or the legacy
  * `array<int>`, dispatched STATICALLY on the child's type) back to
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

  private def binaryIn: Boolean = child.dataType == BinaryType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_decode"

  override def nullSafeEval(input: Any): Any = {
    val out = new Array[Double](outLen)
    var off = 0
    var s = 0
    if (binaryIn) {
      val codes = input.asInstanceOf[Array[Byte]]
      while (s < nSub) {
        val cb = codebooks(s)
        val w = cb(0).length
        if (s < codes.length) {
          val c = codes(s) & 0xFF // unsigned byte
          if (c < cb.length) System.arraycopy(cb(c), 0, out, off, w)
        }
        off += w
        s += 1
      }
    } else {
      val codes = input.asInstanceOf[ArrayData]
      while (s < nSub) {
        val cb = codebooks(s)
        val w = cb(0).length
        if (s < codes.numElements()) {
          val c = codes.getInt(s)
          if (c >= 0 && c < cb.length) System.arraycopy(cb(c), 0, out, off, w)
        }
        off += w
        s += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, codes => {
      val out = ctx.freshName("out"); val off = ctx.freshName("off")
      val s = ctx.freshName("s"); val cb = ctx.freshName("cb")
      val w = ctx.freshName("w"); val c = ctx.freshName("c")
      val (lenExpr, codeExpr, guard) =
        if (binaryIn)
          (s"$codes.length", s"$codes[$s] & 0xFF", s"$c < $cb.length")
        else
          (s"$codes.numElements()", s"$codes.getInt($s)",
            s"$c >= 0 && $c < $cb.length")
      s"""
         |double[] $out = new double[$outLen];
         |int $off = 0;
         |for (int $s = 0; $s < $nSub; $s++) {
         |  double[][] $cb = $cbRef[$s];
         |  int $w = $cb[0].length;
         |  if ($s < $lenExpr) {
         |    int $c = $codeExpr;
         |    if ($guard) {
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
