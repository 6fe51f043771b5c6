package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** The 64-token-hash sign-sum loop behind [[SimHash64]], shared by
  * interpreted eval and generated code (a Scala object gets static
  * forwarders, so generated Java calls it directly). Per-token hashes
  * are Spark's own XXH64 over the UTF8String bytes with the xxhash64
  * default seed (42), so the sketch is bit-identical to the
  * explode + `xxhash64(tok)` + 64-sum-agg formulation it replaces
  * (null elements hash to the untouched seed, also matching).
  */
object SimHashKernel {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val ones = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L
        else {
          val t = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        }
      var b = 0
      while (b < 64) { ones(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    // bit b = sign of Σ±1 = (ones > n - ones); 2L: Int 2*ones would
    // overflow at ones ≥ 2^30, inside ArrayData's element limit
    var sk = 0L
    var b = 0
    while (b < 64) { if (2L * ones(b) > n) sk |= 1L << b; b += 1 }
    sk
  }
}

/** Native 64-bit SimHash of an `array<string>` token column.
  *
  * The sketch is a pure per-document function of the token multiset,
  * so expressing it as ONE codegen'd expression turns the former
  * explode → 64-sum hash-aggregation into a projection: no token-row
  * blow-up, no 64-column aggregation buffer, and — the scale win — NO
  * shuffle at all (the agg formulation exchanged every token row on
  * doc_id). Same extension-point preference order as [[DotProduct]]:
  * native Expression over UDF.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SimHashKernel.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
