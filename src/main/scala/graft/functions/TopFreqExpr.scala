package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row frequency-profile kernel behind [[TopFreq]] ([[
  * WordChunksKernel]] static-forwarder pattern). One hash pass over
  * the element array computes the three Gopher-repetition statistics:
  *
  *   n  = total elements, d = distinct elements,
  *   tp = highest single-element multiplicity
  *
  * exactly as `explode → groupBy(doc,g).count → groupBy(doc).agg(
  * sum, count, max)` would (the TextDedupSpec differential pins it),
  * with null elements forming one ordinary key — except the stats
  * never LEAVE the row: repetition signals are per-document facts,
  * and the exploded form shuffles every distinct (doc, gram) pair of
  * the corpus through two hash-agg exchanges just to fold each
  * document's rows straight back together. */
object TopFreqKernel {
  private val Empty = new GenericInternalRow(Array[Any](0L, 0L, 0L))

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return Empty
    val m = new java.util.HashMap[UTF8String, Int](n * 2)
    var nulls = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) nulls += 1
      else m.merge(arr.getUTF8String(i), 1, (a, b) => a + b)
      i += 1
    }
    var tp = nulls
    val it = m.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > tp) tp = c }
    val d = m.size() + (if (nulls > 0) 1 else 0)
    new GenericInternalRow(Array[Any](n.toLong, d.toLong, tp.toLong))
  }
}

/** Native per-row frequency profile of an `array<string>` column:
  * struct(n, d, tp) — total / distinct / top-multiplicity — as ONE
  * codegen'd expression. This is the type-token-ratio and
  * most-common-token/-n-gram machinery of the repetition filters
  * (Gopher §A1.3) turned from a corpus-wide double shuffle into a
  * zero-exchange projection: at 100× the exploded form moved every
  * distinct (doc, gram) pair (~40M rows) through two exchanges to
  * compute facts each row already held. Empty array → (0, 0, 0)
  * (call sites coalesce the 0/0 ratio to 0, mirroring the exploded
  * form's absent-row left join). */
case class TopFreq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("d", LongType, nullable = false),
    StructField("tp", LongType, nullable = false)))
  override def prettyName: String = "top_freq"

  override def nullSafeEval(input: Any): Any =
    TopFreqKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TopFreqKernel.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
