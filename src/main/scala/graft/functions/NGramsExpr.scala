package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Contiguous word n-gram kernel behind [[NGrams]], shared by
  * interpreted eval and generated code (Scala object → static
  * forwarders, the [[SimHashKernel]] pattern).
  *
  * Mirrors the HOF formulation it replaces EXACTLY (differential
  * spec): gram i = tokens [i, i+n) joined by a single space with null
  * tokens SKIPPED (`concat_ws` semantics — `concatWs` matches),
  * duplicates kept (the repetition signals need the multiset), input
  * shorter than n → empty array.
  */
object NGramsKernel {
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    var g = 0
    while (g <= len - n) {
      val parts = new Array[UTF8String](n)
      System.arraycopy(toks, g, parts, 0, n)
      out(g) = UTF8String.concatWs(sep, parts: _*)
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** Native contiguous n-grams of an `array<string>` token column: the
  * `transform(sequence(…), i -> concat_ws(element_at…))` chain as ONE
  * codegen'd expression. Same rationale as [[WordChunks]]: the HOF
  * chain evaluates interpreted (lambdas never enter whole-stage
  * codegen) and is re-evaluated by every inferred filter of a
  * downstream explode — this kernel feeds the shingle/dedup family,
  * the repetition signals, and the corpus n-gram rollup. Same
  * extension-point preference order as [[SimHash64]].
  */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n-gram size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    NGramsKernel.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NGramsKernel.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
