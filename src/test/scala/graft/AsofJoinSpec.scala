package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** AsofJoin invariants: brute-force agreement on random streams, the
  * equal-ts tie rule in both inclusive and strict modes, the forward
  * direction, and the scale contract (no Join node in the plan — the
  * operator exists to avoid the range-join BNLJ).
  */
class AsofJoinSpec extends SparkSpec {

  private def leftDf(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "lts", "lid")
  }
  private def rightDf(rows: Seq[(Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "rts", "rv")
  }

  test("asof backward/forward agree with brute force on random streams") {
    val rnd = new scala.util.Random(41)
    val lrows = (1L to 300L).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i))
    // unique (k, ts) on the right — the determinism precondition
    val rrows = (for (k <- 0L to 7L; _ <- 0 until 25)
        yield (k, rnd.nextInt(1000).toLong)).distinct
      .map { case (k, t) => (k, t, k * 10000.0 + t) }
    val got = AsofJoin.backward(leftDf(lrows), rightDf(rrows),
        Seq("k"), "lts", "rts")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val gotFwd = AsofJoin.forward(leftDf(lrows), rightDf(rrows),
        Seq("k"), "lts", "rts")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val byKey = rrows.groupBy(_._1)
    lrows.foreach { case (k, lts, lid) =>
      val cand = byKey.getOrElse(k, Nil)
      val back = cand.filter(_._2 <= lts).sortBy(_._2).lastOption.map(_._3)
      val fwd = cand.filter(_._2 >= lts).sortBy(_._2).headOption.map(_._3)
      assert(got(lid) == back, s"backward lid=$lid k=$k lts=$lts")
      assert(gotFwd(lid) == fwd, s"forward lid=$lid k=$k lts=$lts")
    }
  }

  test("asof tie rule: equal-ts right row matches inclusive, not strict") {
    val l = leftDf(Seq((1L, 100L, 1L), (1L, 99L, 2L)))
    val r = rightDf(Seq((1L, 100L, 5.0), (1L, 50L, 3.0)))
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    val inc = hits(AsofJoin.backward(l, r, Seq("k"), "lts", "rts"))
    assert(inc == Map(1L -> Some(5.0), 2L -> Some(3.0)))
    val strict = hits(AsofJoin.backward(l, r, Seq("k"), "lts", "rts",
      inclusive = false))
    assert(strict == Map(1L -> Some(3.0), 2L -> Some(3.0)))
    val fwdInc = hits(AsofJoin.forward(l, r, Seq("k"), "lts", "rts"))
    assert(fwdInc == Map(1L -> Some(5.0), 2L -> Some(5.0)))
    val fwdStrict = hits(AsofJoin.forward(l, r, Seq("k"), "lts", "rts",
      inclusive = false))
    assert(fwdStrict == Map(1L -> None, 2L -> Some(5.0)))
  }

  test("asof null right ts never matches; unmatched lefts survive as null") {
    val l = leftDf(Seq((1L, 100L, 1L), (2L, 100L, 2L)))
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, null, 9.0),
        org.apache.spark.sql.Row(1L, 10L, 4.0))),
      rightDf(Seq((1L, 1L, 1.0))).schema.copy(fields =
        rightDf(Seq((1L, 1L, 1.0))).schema.fields.map(f =>
          if (f.name == "rts") f.copy(nullable = true) else f)))
    val got = AsofJoin.backward(l, r, Seq("k"), "lts", "rts")
      .collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    assert(got == Map(1L -> Some(4.0), 2L -> None))
  }

  test("asof plan contains no join operator — union + one running window") {
    val l = leftDf(Seq((1L, 100L, 1L)))
    val r = rightDf(Seq((1L, 50L, 1.0)))
    val plan = AsofJoin.backward(l, r, Seq("k"), "lts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), "expected the running-last window")
  }
}
