package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the mergeable
  * frequency-estimation state the sketch suite lacked: HLL answers
  * "how many distinct", theta answers set algebra, KLL quantiles,
  * approx_top_k the heavy-hitter LIST — count-min answers "how often
  * does THIS item occur" for any item, from a fixed-size state, with
  * the overestimate-only guarantee (est ≥ true count ALWAYS — a
  * deterministic invariant, not a probabilistic one; only the
  * overshoot is probabilistic: P[est > true + e·N/width] ≤ exp(−depth)
  * per query).
  *
  * State = depth × width long counters. Update adds 1 at one column
  * per row (row hashes = murmur fmix64 of the pre-hashed item XOR a
  * per-row odd constant); MERGE IS ELEMENT-WISE ADDITION — the merged
  * sketch is bit-identical to the sketch of the concatenated input,
  * under any partitioning or merge tree (spec-pinned), which is the
  * property that makes per-day states land-able and re-aggregable
  * exactly like the HLL/theta states ([[graft.operators.Sketches]]).
  *
  * Wire format (cms_merge validates and [[CountMinEstimate]] parses):
  * Int depth, Int width, then depth·width big-endian longs.
  *
  * Engine shape: TypedImperativeAggregate → ObjectHashAggregate with
  * map-side partial merge; only the fixed-size state crosses the
  * shuffle (width·depth·8 bytes per group per partition — size width
  * for the key cardinality, not the stream: the point of the sketch).
  */
object CountMin {
  /** murmur3 fmix64 — full-avalanche 64-bit finalizer. */
  @inline def mix(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33; z
  }

  /** Column of `hashed` in counter row `row`: independent-enough row
    * hashes from one 64-bit item hash (golden-ratio odd multiples as
    * row salts, fmix64 for avalanche). Non-negative via >>> 1. */
  @inline def idx(hashed: Long, row: Int, width: Int): Int =
    ((mix(hashed ^ (0x9e3779b97f4a7c15L * (2 * row + 1))) >>> 1)
      % width).toInt

  def serialize(depth: Int, width: Int, counters: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 8 * counters.length)
    val out = new DataOutputStream(bos)
    out.writeInt(depth); out.writeInt(width)
    var i = 0
    while (i < counters.length) { out.writeLong(counters(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  /** (depth, width, counters) from the wire format. */
  def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt(); val w = in.readInt()
    val c = new Array[Long](d * w)
    var i = 0
    while (i < c.length) { c(i) = in.readLong(); i += 1 }
    (d, w, c)
  }
}

/** `cms_agg(value, depth, width)` — build a count-min state from a
  * pre-hashed long column (nulls are not items). Returns the wire
  * bytes. */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"cms_agg: depth 1..16, got $depth")
  require(width >= 16 && (width & (width - 1)) == 0,
    s"cms_agg: width must be a power of two >= 16, got $width")

  override def prettyName: String = "cms_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.idx(h, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    CountMin.serialize(depth, width, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CountMin.serialize(depth, width, buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountMin.deserialize(bytes)._3

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** `cms_merge(state)` — union previously-built states by element-wise
  * addition (the re-aggregation leg: merging N day-states shuffles
  * N·|keys| state rows, never the underlying values). Dimensions are
  * read from the first state and any mismatch raises — silently
  * zipping different geometries would corrupt every estimate. */
case class CountMinMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "cms_merge"
  override def dataType: DataType = BinaryType
  // NULL when a group contributed no states (all-NULL inputs or an
  // empty global aggregate) — the SQL-aggregate convention; raising
  // there would fail the whole query for a normal empty group
  // (ADVICE r11). Geometry mismatch stays a hard failure.
  override def nullable: Boolean = true

  // empty = "no state seen yet": geometry adopted from the first input
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def addInto(acc: Array[Long], d: Int, w: Int,
                      c: Array[Long]): Array[Long] =
    if (acc.isEmpty) {
      val fresh = new Array[Long](2 + c.length)
      fresh(0) = d; fresh(1) = w
      System.arraycopy(c, 0, fresh, 2, c.length)
      fresh
    } else {
      require(acc(0) == d && acc(1) == w,
        s"cms_merge: geometry mismatch ${acc(0)}x${acc(1)} vs ${d}x$w")
      var i = 0
      while (i < c.length) { acc(2 + i) += c(i); i += 1 }
      acc
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val (d, w, c) = CountMin.deserialize(v.asInstanceOf[Array[Byte]])
      addInto(buf, d, w, c)
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b2.isEmpty) b1
    else addInto(b1, b2(0).toInt, b2(1).toInt, b2.drop(2))

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null // no states seen in this group
    else CountMin.serialize(buf(0).toInt, buf(1).toInt, buf.drop(2))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Array[Long](n)
    var i = 0
    while (i < n) { b(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinMerge =
    copy(child = newChild)
}

/** `cms_query(state, value)` — point frequency estimate: min over the
  * depth rows of the counter the (pre-hashed) value maps to. NULL if
  * either side is NULL. Interpreted (CodegenFallback): queries run
  * against |keys|-scale state relations — a handful of rows in any
  * monitoring shape — never against the event stream, so codegen
  * would buy nothing here (the estimate path is O(depth) per row on
  * a bounded relation; the STREAM-side work is all in the codegen'd
  * hash + the imperative aggregate). */
case class CountMinEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_query"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val v = right.eval(input)
    if (s == null || v == null) null
    else {
      val (d, w, c) = CountMin.deserialize(s.asInstanceOf[Array[Byte]])
      val h = v.asInstanceOf[Long]
      var best = Long.MaxValue
      var r = 0
      while (r < d) {
        val x = c(r * w + CountMin.idx(h, r, w))
        if (x < best) best = x
        r += 1
      }
      best
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}
