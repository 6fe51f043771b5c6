package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Membership-count kernel behind [[CountIn]], shared by interpreted
  * eval and generated code (the [[WordChunksKernel]] static-forwarder
  * pattern).
  *
  * Mirrors `size(filter(toks, t -> t IN (words)))` EXACTLY (the
  * TextDedupSpec differential pins it): null elements never match —
  * `isInCollection` evaluates null on them, and `filter` drops rows
  * whose predicate is not true — and the word list is scanned
  * linearly, which beats hashing for the 2–5-word marker/stopword
  * sets this serves. */
object CountInKernel {
  def compute(arr: ArrayData, words: Array[UTF8String]): Int = {
    val n = arr.numElements()
    val w = words.length
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var j = 0
        while (j < w) {
          if (words(j).equals(t)) { c += 1; j = w }
          else j += 1
        }
      }
      i += 1
    }
    c
  }
}

/** Native occurrence count of a fixed word set in an `array<string>`
  * column: `size(filter(toks, t -> t isin words))` as ONE codegen'd
  * expression. The HOF form evaluates INTERPRETED (lambdas never
  * enter whole-stage codegen) with a per-element predicate dispatch —
  * the tax that left `text_quality` at 13.9 s/500k docs for a pure
  * projection while the heavier 8-pattern PII scan ran 7.8 s
  * (VERDICT r10). The quality/langid/funnel entries evaluate this 1–5
  * times per document, so the kernel multiplies. Same
  * extension-point preference order as [[SimHash64]]. */
case class CountIn(child: Expression, words: Seq[String])
    extends UnaryExpression {
  require(words.nonEmpty, "count_in: word set must be non-empty")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in"

  @transient private lazy val set: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    CountInKernel.compute(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countInWords", set,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CountInKernel.compute($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
