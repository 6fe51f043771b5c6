package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The `nprobe` nearest centroid ids (by cosine, descending; ties →
  * higher id first) for an `array<double>` vector, against a centroid
  * matrix held as a codegen REFERENCE OBJECT — not as plan literals.
  *
  * The literal formulation (an `array(struct(cosine(v, typedlit(c)),
  * lit(i)))` per centroid, sorted and sliced) builds k separate cosine
  * expression trees: fine at k=16, but with the √n centroid scaling k
  * reaches thousands — the generated method blows Janino's 64 KB
  * limit into interpreted fallback, and the serialized plan carries
  * k·dim literal doubles to every task. Here the matrix (and its
  * precomputed norms) ride `ctx.addReferenceObj`, the scoring is one
  * fused primitive loop with an O(k·nprobe) insertion top-k, and the
  * plan size is O(1) in k — the same pattern MLlib uses for model
  * prediction, expressed as a codegen Catalyst expression (the
  * preferred extension point, like [[DotProduct]]).
  *
  * Zero-norm vector or centroid → that score is −∞ (ranked last),
  * matching the literal form's null-cosine ordering.
  */
case class NearestCentroids(child: Expression,
                            centroids: Array[Array[Double]],
                            nprobe: Int) extends UnaryExpression {

  private val k = centroids.length
  private val np = math.min(math.max(nprobe, 0), k)

  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var vn = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); vn += x * x; i += 1 }
    vn = math.sqrt(vn)
    val bestS = Array.fill(np)(Double.NegativeInfinity)
    val bestC = Array.fill(np)(-1L)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      val m = math.min(n, cent.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += v.getDouble(j) * cent(j); j += 1 }
      val denom = vn * norms(c)
      val s = if (denom == 0.0) Double.NegativeInfinity else dot / denom
      var pos = -1
      j = 0
      while (pos < 0 && j < np) {
        if (s > bestS(j) || (s == bestS(j) && c > bestC(j))) pos = j
        j += 1
      }
      if (pos >= 0) {
        j = np - 1
        while (j > pos) { bestS(j) = bestS(j - 1); bestC(j) = bestC(j - 1); j -= 1 }
        bestS(pos) = s
        bestC(pos) = c.toLong
      }
      c += 1
    }
    new GenericArrayData(bestC)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("centroidMatrix", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val vn = ctx.freshName("vn")
      val bestS = ctx.freshName("bestS")
      val bestC = ctx.freshName("bestC")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      val cent = ctx.freshName("cent")
      val denom = ctx.freshName("den")
      val s = ctx.freshName("s")
      val pos = ctx.freshName("pos")
      s"""
         |int $n = $v.numElements();
         |double $vn = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $v.getDouble($i); $vn += x * x;
         |}
         |$vn = java.lang.Math.sqrt($vn);
         |double[] $bestS = new double[$np];
         |long[] $bestC = new long[$np];
         |java.util.Arrays.fill($bestS, Double.NEGATIVE_INFINITY);
         |java.util.Arrays.fill($bestC, -1L);
         |for (int $c = 0; $c < $k; $c++) {
         |  double[] $cent = $mRef[$c];
         |  int $m = java.lang.Math.min($n, $cent.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $dot += $v.getDouble($i) * $cent[$i];
         |  }
         |  double $denom = $vn * $nRef[$c];
         |  double $s = ($denom == 0.0) ? Double.NEGATIVE_INFINITY : $dot / $denom;
         |  int $pos = -1;
         |  for (int $j = 0; $pos < 0 && $j < $np; $j++) {
         |    if ($s > $bestS[$j] || ($s == $bestS[$j] && $c > $bestC[$j])) $pos = $j;
         |  }
         |  if ($pos >= 0) {
         |    for (int $j = $np - 1; $j > $pos; $j--) {
         |      $bestS[$j] = $bestS[$j - 1]; $bestC[$j] = $bestC[$j - 1];
         |    }
         |    $bestS[$pos] = $s;
         |    $bestC[$pos] = (long) $c;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bestC);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
