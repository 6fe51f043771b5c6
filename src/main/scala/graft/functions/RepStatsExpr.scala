package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused unigram + bigram frequency-profile kernel behind
  * [[RepStats]]: ONE pass over the token array computes what
  * `(TopFreq(t), TopFreq(NGrams(t, 2)))` computes — the
  * RepetitionKernelSpec differential pins the equivalence — without
  * ever materializing the bigram strings: tokens are interned to
  * dense int ids during the unigram count, and each bigram is counted
  * under the packed long `(id_i << 32) | id_{i+1}`. Tokens from a
  * single-space split can't contain the separator, so distinct id
  * pairs ↔ distinct "a b" gram strings exactly.
  *
  * Null-element parity (corpus tokens are never null, but the kernel
  * must not silently diverge if a caller's are): the unigram side
  * counts nulls as one ordinary key ([[TopFreqKernel]] semantics);
  * on the bigram side `concat_ws` SKIPS null members, so (null,"x")
  * and ("x",null) both degrade to the gram "x" and must merge —
  * degraded grams are counted in a side string-keyed map (they can
  * never collide with a real pair gram, which always contains a
  * space) and folded into the bigram stats.
  */
object RepStatsKernel {
  private val Empty =
    new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L, 0L, 0L))

  /** distinct-count and top-multiplicity of a SORTED array prefix —
    * one linear run-length scan, no hashing. */
  private def runScan(a: Array[Long], len: Int): (Long, Long) = {
    if (len == 0) return (0L, 0L)
    var d = 1L; var top = 0L; var run = 1L
    var i = 1
    while (i < len) {
      if (a(i) == a(i - 1)) run += 1
      else { d += 1; if (run > top) top = run; run = 1 }
      i += 1
    }
    if (run > top) top = run
    (d, top)
  }

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return Empty
    // intern pass: token → dense id (the one unavoidable string-hash
    // pass); null elements get id -1 and thereby form one ordinary
    // key in the sort-scan below, exactly TopFreq's null semantics
    val ids = new Array[Int](n)
    val uniq = new java.util.HashMap[UTF8String, Integer](n * 2)
    var hasNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { hasNull = true; ids(i) = -1 }
      else {
        val t = arr.getUTF8String(i)
        var id = uniq.get(t)
        if (id == null) { id = Integer.valueOf(uniq.size()); uniq.put(t, id) }
        ids(i) = id.intValue()
      }
      i += 1
    }
    // per-document cardinalities are small: sort-and-scan beats any
    // hash map for the counting (a packed-pair HashMap key hashes as
    // id1^id2 — degenerate — and boxes; measured slower than the
    // separate TopFreq pair it was meant to replace)
    val us = new Array[Long](n)
    i = 0
    while (i < n) { us(i) = ids(i).toLong; i += 1 }
    java.util.Arrays.sort(us)
    val (ud, utp) = runScan(us, n)
    // bigram pass over the id stream: pack adjacent id pairs
    var bd = 0L; var btp = 0L
    if (n >= 2) {
      val bs = new Array[Long](n - 1)
      var blen = 0
      var degraded: java.util.HashMap[UTF8String, Array[Int]] = null
      var g = 0
      while (g < n - 1) {
        if (ids(g) >= 0 && ids(g + 1) >= 0) {
          bs(blen) = (ids(g).toLong << 32) | (ids(g + 1).toLong & 0xffffffffL)
          blen += 1
        } else {
          // concat_ws skips null members: the gram collapses to the
          // surviving token (or "") and merges across positions
          if (degraded == null)
            degraded = new java.util.HashMap[UTF8String, Array[Int]](8)
          val key =
            if (ids(g) >= 0) arr.getUTF8String(g)
            else if (ids(g + 1) >= 0) arr.getUTF8String(g + 1)
            else UTF8String.EMPTY_UTF8
          var slot = degraded.get(key)
          if (slot == null) { slot = Array(0); degraded.put(key, slot) }
          slot(0) += 1
        }
        g += 1
      }
      java.util.Arrays.sort(bs, 0, blen)
      val (d0, t0) = runScan(bs, blen)
      bd = d0; btp = t0
      if (degraded != null) {
        bd += degraded.size()
        val dit = degraded.values().iterator()
        while (dit.hasNext) { val c = dit.next()(0); if (c > btp) btp = c }
      }
    }
    new GenericInternalRow(Array[Any](
      n.toLong, ud, utp,
      if (n >= 2) (n - 1).toLong else 0L, bd, btp))
  }
}

/** Native fused repetition statistics of an `array<string>` token
  * column: struct(n, d, tp, bn, bd, btp) — unigram total / distinct /
  * top-multiplicity plus the same three for contiguous 2-grams — as
  * ONE codegen'd single-pass expression. Halves the remaining cost of
  * the [[TopFreq]] pair by never allocating the 2-gram string array
  * (interned-id pair counting instead); `text_repetition` reads every
  * output ratio from this one struct, zero exchanges. Empty array →
  * all zeros; single-token array → bigram half zeros (callers
  * coalesce the 0/0 ratio, mirroring the exploded form's absent-row
  * left join). */
case class RepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("d", LongType, nullable = false),
    StructField("tp", LongType, nullable = false),
    StructField("bn", LongType, nullable = false),
    StructField("bd", LongType, nullable = false),
    StructField("btp", LongType, nullable = false)))
  override def prettyName: String = "rep_stats"

  override def nullSafeEval(input: Any): Any =
    RepStatsKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RepStatsKernel.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
