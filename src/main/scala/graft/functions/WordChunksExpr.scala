package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-k chunking kernel behind [[WordChunks]], shared by
  * interpreted eval and generated code (Scala object → static
  * forwarders, the [[SimHashKernel]] pattern).
  *
  * Mirrors the HOF formulation it replaces EXACTLY (the TextDedupSpec
  * differential pins it): chunk i = tokens [i·k, i·k+k) joined by a
  * single space with null tokens SKIPPED (array_join's no-replacement
  * semantics — `concatWs` matches), ragged tail kept, empty/zero-size
  * input → empty array.
  */
object WordChunksKernel {
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val nChunks = (n + k - 1) / k
    val out = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val from = c * k
      val until = math.min(from + k, n)
      val parts = new Array[UTF8String](until - from)
      var i = from
      while (i < until) {
        // null elements stay null here; concatWs skips them, matching
        // array_join with no null-replacement argument
        parts(i - from) =
          if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        i += 1
      }
      out(c) = UTF8String.concatWs(sep, parts: _*)
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** Native fixed-k word chunking of an `array<string>` token column:
  * `transform(sequence(…), i -> array_join(slice(toks, i·k+1, k)))`
  * as ONE codegen'd expression. The HOF chain is evaluated
  * INTERPRETED (higher-order lambdas never enter whole-stage
  * codegen) at ~27 µs/doc, and the spanDedup explode branch pays it
  * up to three times per row (the Generate's inferred non-empty /
  * non-null filters each recompute the producing expression) — this
  * kernel is the difference between the chunking dominating
  * `dedup_spans` at the 100× pack and it being noise. Same
  * extension-point preference order as [[SimHash64]].
  */
case class WordChunks(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "chunk size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_chunks"

  override def nullSafeEval(input: Any): Any =
    WordChunksKernel.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WordChunksKernel.compute($v, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
