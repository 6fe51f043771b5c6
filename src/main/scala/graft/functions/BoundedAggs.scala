package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-state aggregate pair — the ClickHouse combinators whose
  * whole point is a HARD cap on per-group aggregation state:
  *
  *  - [[UniqUpTo]] — `uniqUpTo(N)(x)`: exact distinct count while it
  *    is ≤ N, the single saturated value N+1 beyond. State is at most
  *    N+1 hashes per group per partition — a `count(DISTINCT x)` plans
  *    a full (group, value) de-dup exchange, unbounded in the value
  *    cardinality; this caps it by CONTRACT, which is what "how many
  *    distinct buyers, capped at 100" questions actually need at
  *    100 TB.
  *  - [[TopKWeighted]] — `topKWeighted(k)(item, weight)`: SpaceSaving-
  *    style weighted heavy hitters over a capacity-capped map. Weights
  *    are EXACT while a group's distinct items fit the capacity (no
  *    eviction ever fires — the regime the oracle checks); beyond it,
  *    evicted mass is folded into newcomers (min+w inheritance), the
  *    standard bounded-overestimate. Same posture as the Sketches
  *    suite's approx_top_k but with a WEIGHT column, which Spark's
  *    built-in lacks.
  *
  * Both are `TypedImperativeAggregate`s (ObjectHashAggregate with
  * map-side partial merge — no UDF, only the bounded state crosses
  * the shuffle), the same engine shape as Spark's own
  * hll_sketch_agg / approx_top_k_accumulate. Registered in SQL as
  * `uniq_upto(x, n)` / `topk_weighted(item, w, cap)`
  * ([[graft.GraftExtensions]]); DataFrame forms in
  * [[graft.operators.Sketches.uniqUpTo]] / `.topkWeighted`.
  */
object BoundedAggs // scaladoc anchor

/** Exact-until-saturation distinct count. `child` must be a
  * nullable-long column of PRE-HASHED values (the registration wraps
  * the user's column in `xxhash64`, nulls passed through — a 64-bit
  * collision undercounts with p ≈ n²/2⁶⁴, negligible at any
  * saturation bound this operator is for). Result: min(distinct, n+1),
  * never null (empty group → 0). */
case class UniqUpTo(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(n >= 1, s"uniq_upto: n must be >= 1, got $n")

  override def prettyName: String = "uniq_upto"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashSet[java.lang.Long] =
    new java.util.HashSet[java.lang.Long]()

  override def update(buf: java.util.HashSet[java.lang.Long],
                      input: InternalRow): java.util.HashSet[java.lang.Long] = {
    // saturated at n+1: the answer is pinned, stop accumulating
    if (buf.size() <= n) {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: java.util.HashSet[java.lang.Long],
                     b2: java.util.HashSet[java.lang.Long]): java.util.HashSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext && b1.size() <= n) b1.add(it.next())
    b1
  }

  override def eval(buf: java.util.HashSet[java.lang.Long]): Any =
    math.min(buf.size(), n + 1).toLong

  override def serialize(buf: java.util.HashSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.size())
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sz = in.readInt()
    val s = new java.util.HashSet[java.lang.Long](sz * 2)
    var i = 0
    while (i < sz) { s.add(in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpTo =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqUpTo =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): UniqUpTo =
    copy(child = newChild)
}

/** Weighted heavy hitters over a capacity-capped map (SpaceSaving
  * eviction). `item` string, `weight` long; rows with a null item or
  * null weight are not items (the suite's null posture). Returns the
  * FULL tracked array sorted (weight desc, item asc) — callers
  * `slice` their k; determinism of the k-prefix is guaranteed in the
  * exact regime (distinct items ≤ capacity).
  *
  * Merge semantics (mergeable-summaries SpaceSaving, Agarwal et al.):
  * each buffer carries a `floor` — an upper bound on the mass of any
  * item it has ever evicted or trimmed away. Merging credits items
  * present on only one side with the OTHER side's floor, sums both
  * sides for common items, trims to capacity keeping the largest, and
  * raises the floor to cover the trimmed mass. An item dropped at a
  * merge that re-enters later therefore re-enters at or above its
  * true mass — the overestimate-only guarantee holds across arbitrary
  * update/merge interleavings, not just the update path. In the exact
  * regime (union fits capacity) every floor stays 0 and all weights
  * are exact sums. */
case class TopKWeighted(
    left: Expression,  // item
    right: Expression, // weight
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKWeighted.Buffer]
  with BinaryLike[Expression] {
  import TopKWeighted.Buffer

  require(capacity >= 1, s"topk_weighted: capacity must be >= 1, got $capacity")

  override def prettyName: String = "topk_weighted"
  override def dataType: DataType = ArrayType(
    new StructType().add("item", StringType, nullable = false)
      .add("weight", LongType, nullable = false),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buffer = new Buffer()

  private def add(buf: Buffer, item: String, w: Long): Unit = {
    val m = buf.map
    val cur = m.get(item)
    if (cur != null) { m.put(item, cur + w); return }
    if (m.size() < capacity) {
      // a brand-new item could be one trimmed away at an earlier
      // merge — credit the floor so it re-enters at/above true mass
      m.put(item, buf.floor + w); return
    }
    // SpaceSaving eviction: newcomer inherits the minimum's mass
    var minK: String = null
    var minV = Long.MaxValue
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue < minV) { minV = e.getValue; minK = e.getKey }
    }
    m.remove(minK)
    val inherited = math.max(minV, buf.floor)
    m.put(item, inherited + w)
    if (minV > buf.floor) buf.floor = minV
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val i = left.eval(input)
    val w = right.eval(input)
    if (i != null && w != null)
      add(buf, i.asInstanceOf[UTF8String].toString, w.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    val m = b1.map
    // one-sided items get the other side's floor as overestimate credit
    if (b2.floor > 0) {
      val it1 = m.entrySet().iterator()
      while (it1.hasNext) {
        val e = it1.next()
        if (!b2.map.containsKey(e.getKey))
          e.setValue(java.lang.Long.valueOf(e.getValue + b2.floor))
      }
    }
    val it = b2.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = m.get(e.getKey)
      m.put(e.getKey, if (cur == null) java.lang.Long.valueOf(e.getValue + b1.floor)
                      else java.lang.Long.valueOf(cur + e.getValue))
    }
    b1.floor = math.max(b1.floor, b2.floor)
    if (m.size() > capacity) {
      // trim to capacity keeping the largest (weight desc, item asc)
      val entries = new java.util.ArrayList(m.entrySet())
      entries.sort { (a: java.util.Map.Entry[String, java.lang.Long],
                      b: java.util.Map.Entry[String, java.lang.Long]) =>
        val c = java.lang.Long.compare(b.getValue, a.getValue)
        if (c != 0) c else a.getKey.compareTo(b.getKey)
      }
      val keep = new java.util.HashMap[String, java.lang.Long](capacity * 2)
      var i = 0
      while (i < capacity) {
        val e = entries.get(i); keep.put(e.getKey, e.getValue); i += 1
      }
      // the trimmed maximum is the largest mass we just dropped
      b1.floor = math.max(b1.floor, entries.get(capacity).getValue.longValue())
      b1.map = keep
    }
    b1
  }

  override def eval(buf: Buffer): Any = {
    val entries = new java.util.ArrayList(buf.map.entrySet())
    entries.sort { (a: java.util.Map.Entry[String, java.lang.Long],
                    b: java.util.Map.Entry[String, java.lang.Long]) =>
      val c = java.lang.Long.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val rows = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) {
      val e = entries.get(i)
      rows(i) = InternalRow(UTF8String.fromString(e.getKey),
        e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.floor)
    out.writeInt(buf.map.size())
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Buffer()
    buf.floor = in.readLong()
    val sz = in.readInt()
    val m = new java.util.HashMap[String, java.lang.Long](sz * 2)
    var i = 0
    while (i < sz) {
      val kl = in.readInt()
      val kb = new Array[Byte](kl); in.readFully(kb)
      m.put(new String(kb, StandardCharsets.UTF_8),
        java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    buf.map = m
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKWeighted =
    copy(left = newLeft, right = newRight)
}

object TopKWeighted {
  /** Mutable aggregation state: the tracked item→weight map plus the
    * `floor` — max mass ever evicted/trimmed from this buffer, the
    * overestimate credit owed to any item re-entering it. */
  final class Buffer {
    var map: java.util.HashMap[String, java.lang.Long] =
      new java.util.HashMap[String, java.lang.Long]()
    var floor: Long = 0L
  }
}

/** Bounded per-group top-k of (score, id) pairs — the EXACT
  * replacement for `row_number().over(partitionBy(g).orderBy(score
  * desc, id asc)) <= k`: same rows, same order, but state is a
  * capacity-capped heap that dies in the map-side partial instead of
  * a full per-group sort (VERDICT r12 #3 — sim_ivfpq's shortlist
  * window sorted every query's ~19k-row candidate pool @100× to keep
  * 40 rows; this keeps 40 doubles+longs per group per partition,
  * period — the bound a 100-TB candidate stream needs).
  *
  * Ranking contract (identical to the window it replaces): score
  * DESC, id ASC tiebreak; a NULL score ranks below every non-null
  * score (Spark's `desc` default NULLS LAST) and is carried as
  * -Infinity in the emitted struct — callers consuming only the ids
  * (the shortlist pattern) see the window's exact row set; callers
  * needing the score must re-derive it (the refine stage does).
  * Result: array<struct<score double, id long>> sorted best-first —
  * `posexplode` recovers the rank. */
case class TopKPairs(
    left: Expression,  // score (double)
    right: Expression, // id (long)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKPairs.Entry]]
  with BinaryLike[Expression] {
  import TopKPairs.{Entry, worstFirst}

  require(k >= 1, s"topk_pairs: k must be >= 1, got $k")

  override def prettyName: String = "topk_pairs"
  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType, nullable = false)
      .add("id", LongType, nullable = false),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.PriorityQueue[Entry] =
    new java.util.PriorityQueue[Entry](math.min(k + 1, 64), worstFirst)

  private def add(buf: java.util.PriorityQueue[Entry], e: Entry): Unit = {
    if (buf.size() < k) { buf.add(e); return }
    // full: admit only if strictly better than the current worst
    val w = buf.peek()
    if (worstFirst.compare(e, w) > 0) { buf.poll(); buf.add(e) }
  }

  override def update(buf: java.util.PriorityQueue[Entry],
                      input: InternalRow): java.util.PriorityQueue[Entry] = {
    val id = right.eval(input)
    if (id != null) {
      val s = left.eval(input)
      // NULL score → -Inf: ranks after every real score, id-asc among
      // themselves — the window's NULLS LAST posture
      val sc = if (s == null) Double.NegativeInfinity
               else s.asInstanceOf[Double]
      add(buf, new Entry(sc, id.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(b1: java.util.PriorityQueue[Entry],
                     b2: java.util.PriorityQueue[Entry]): java.util.PriorityQueue[Entry] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[Entry]): Any = {
    val arr = buf.toArray(Array.empty[Entry])
    // best-first: score desc, id asc (reverse of the heap order)
    java.util.Arrays.sort(arr, worstFirst.reversed())
    val rows = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) {
      rows(i) = InternalRow(arr(i).score, arr(i).id); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.PriorityQueue[Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 16 * buf.size())
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next(); out.writeDouble(e.score); out.writeLong(e.id)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Entry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sz = in.readInt()
    val q = new java.util.PriorityQueue[Entry](math.max(sz, 1), worstFirst)
    var i = 0
    while (i < sz) { q.add(new Entry(in.readDouble(), in.readLong())); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(left = newLeft, right = newRight)
}

object TopKPairs {
  final class Entry(val score: Double, val id: Long)
  /** Heap order: WORST first — lower score first; among equal scores
    * the HIGHER id first (id asc is better). `compare(a, b) > 0` ⇔
    * a ranks strictly better than b. */
  val worstFirst: java.util.Comparator[Entry] =
    new java.util.Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else java.lang.Long.compare(b.id, a.id)
      }
    }
}
