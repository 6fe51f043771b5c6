package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

/** windowFunnel / retention invariants: the single-sweep DP must agree
  * with brute-force chain enumeration (the exists-any-chain semantics
  * the DuckDB oracle recomputes by join), including the cases that
  * break naive implementations — later-start domination, equal-ts
  * tie-breaking on the tie column, and one event never serving two
  * steps of the same chain.
  */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def funnelOf(rows: Seq[(Long, Long, Long, String)],
                       window: Long): Map[Long, Int] = {
    // rows: (user, ts_us, event_id, type); ts column built from µs
    val df = rows.toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    Funnel.windowFunnel(df, "user_id", "ts", "event_id",
        Seq(col("event_type") === "a", col("event_type") === "b",
          col("event_type") === "c"), window)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("later chain start dominates: a min-anchored funnel would undercount") {
    // start@0 reaches only level 2 in window 60; start@50 reaches 3
    val lv = funnelOf(Seq(
      (1L, 0L, 1L, "a"), (1L, 50L, 2L, "a"),
      (1L, 60L, 3L, "b"), (1L, 100L, 4L, "c")), window = 60L)
    assert(lv(1L) == 3)
  }

  test("window binds on the chain START, not step-to-step gaps") {
    // a@0 b@50 c@70: all gaps < 60 but c is 70 from the start
    val lv = funnelOf(Seq(
      (1L, 0L, 1L, "a"), (1L, 50L, 2L, "b"), (1L, 70L, 3L, "c")),
      window = 60L)
    assert(lv(1L) == 2)
  }

  test("equal timestamps chain only in tie-column order") {
    // b shares a's ts: chains iff event_id greater
    val lv = funnelOf(Seq(
      (1L, 10L, 5L, "a"), (1L, 10L, 6L, "b"),
      (2L, 10L, 5L, "b"), (2L, 10L, 6L, "a")), window = 100L)
    assert(lv(1L) == 2 && lv(2L) == 1)
  }

  test("one event never serves two consecutive steps of the same chain") {
    // steps 2 and 3 both match type b — a single b after the a must
    // only reach level 2; a second b completes the chain
    val df = Seq((1L, 0L, 1L, "a"), (1L, 10L, 2L, "b"),
        (2L, 0L, 3L, "a"), (2L, 10L, 4L, "b"), (2L, 20L, 5L, "b"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val lv = Funnel.windowFunnel(df, "user_id", "ts", "event_id",
        Seq(col("event_type") === "a", col("event_type") === "b",
          col("event_type") === "b"), windowMicros = 100L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lv(1L) == 2 && lv(2L) == 3)
  }

  test("DP agrees with brute-force chain enumeration on random streams") {
    val rnd = new scala.util.Random(42)
    val types = Array("a", "b", "c", "x")
    val rows = (1L to 40L).flatMap { u =>
      (1 to 12).map { i =>
        (u, rnd.nextInt(1000).toLong, u * 100 + i,
          types(rnd.nextInt(types.length)))
      }
    }
    val window = 300L
    val got = funnelOf(rows, window)
    // brute force: enumerate every (ts, event_id)-increasing chain of
    // length ≤ 3 — O(n³) per user, fine at 12 events
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      def matches(e: (Long, Long, Long, String), step: Int) =
        e._4 == Seq("a", "b", "c")(step)
      val l1 = sorted.exists(matches(_, 0))
      val l2 = sorted.combinations(2).exists { case Seq(e1, e2) =>
        matches(e1, 0) && matches(e2, 1) && e2._2 - e1._2 <= window }
      val l3 = sorted.combinations(3).exists { case Seq(e1, e2, e3) =>
        matches(e1, 0) && matches(e2, 1) && matches(e3, 2) &&
          e3._2 - e1._2 <= window }
      val want = if (l3) 3 else if (l2) 2 else if (l1) 1 else 0
      assert(got(u) == want, s"user $u: got ${got(u)} want $want")
    }
  }

  private def strictFunnelOf(rows: Seq[(Long, Long, Long, String)],
                             window: Long): Map[Long, Int] = {
    val df = rows.toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    Funnel.windowFunnelStrictIncrease(df, "user_id", "ts", "event_id",
        Seq(col("event_type") === "a", col("event_type") === "b",
          col("event_type") === "c"), window)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("strict_increase: equal-ts events never chain (default chains them in tie order)") {
    val rows = Seq(
      // user 1: a and b share a timestamp — default chains via the
      // tie column, strict does not (no later b exists)
      (1L, 100L, 1L, "a"), (1L, 100L, 2L, "b"), (1L, 200L, 3L, "c"),
      // user 2: strictly increasing — both modes agree
      (2L, 100L, 1L, "a"), (2L, 150L, 2L, "b"), (2L, 200L, 3L, "c"))
    assert(funnelOf(rows, 1000L) == Map(1L -> 3, 2L -> 3))
    assert(strictFunnelOf(rows, 1000L) == Map(1L -> 1, 2L -> 3))
  }

  test("strict_increase window still binds on the chain start") {
    val rows = Seq(
      (1L, 0L, 1L, "a"), (1L, 100L, 2L, "b"), (1L, 301L, 3L, "c"))
    // c at 301 puts the full chain past the 300 window; a->b holds
    assert(strictFunnelOf(rows, 300L) == Map(1L -> 2))
  }

  test("strict_increase: an equal-ts chain register rolls forward correctly") {
    // a at 100 and b at 100 cannot chain, but a LATER b at 150 can
    // extend the a(100) chain, and c at 150 cannot extend THAT chain
    // (equal ts with the b that formed it) while c at 200 can
    val rows = Seq(
      (1L, 100L, 1L, "a"), (1L, 100L, 2L, "b"),
      (1L, 150L, 3L, "b"), (1L, 150L, 4L, "c"),
      (2L, 100L, 1L, "a"), (2L, 100L, 2L, "b"),
      (2L, 150L, 3L, "b"), (2L, 200L, 4L, "c"))
    assert(strictFunnelOf(rows, 1000L) == Map(1L -> 2, 2L -> 3))
  }

  test("strict_increase DP agrees with strict brute force on random streams") {
    val rnd = new scala.util.Random(7)
    val types = Array("a", "b", "c", "x")
    // ts drawn from 20 buckets so equal-ts collisions are common —
    // exactly the regime where strict and default diverge
    val rows = (1L to 40L).flatMap { u =>
      (1 to 12).map { i =>
        (u, rnd.nextInt(20).toLong * 50, u * 100 + i,
          types(rnd.nextInt(types.length)))
      }
    }
    val window = 300L
    val got = strictFunnelOf(rows, window)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      def matches(e: (Long, Long, Long, String), step: Int) =
        e._4 == Seq("a", "b", "c")(step)
      val l1 = sorted.exists(matches(_, 0))
      val l2 = sorted.combinations(2).exists { case Seq(e1, e2) =>
        matches(e1, 0) && matches(e2, 1) && e2._2 > e1._2 &&
          e2._2 - e1._2 <= window }
      val l3 = sorted.combinations(3).exists { case Seq(e1, e2, e3) =>
        matches(e1, 0) && matches(e2, 1) && matches(e3, 2) &&
          e2._2 > e1._2 && e3._2 > e2._2 && e3._2 - e1._2 <= window }
      val want = if (l3) 3 else if (l2) 2 else if (l1) 1 else 0
      assert(got(u) == want, s"user $u: got ${got(u)} want $want")
    }
  }

  private def strictOrderFunnelOf(rows: Seq[(Long, Long, Long, String)],
                                  window: Long): Map[Long, Int] = {
    val df = rows.toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    Funnel.windowFunnelStrictOrder(df, "user_id", "ts", "event_id",
        Seq(col("event_type") === "a", col("event_type") === "b",
          col("event_type") === "c"), window)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("strict_order: an intervening event interrupts (A->B->D->C scores 2)") {
    val rows = Seq(
      // the ClickHouse doc example: a,b,x,c — x interrupts, a->b held
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (1L, 30L, 3L, "x"), (1L, 40L, 4L, "c"),
      // consecutive a,b,c — full level 3
      (2L, 10L, 1L, "a"), (2L, 20L, 2L, "b"), (2L, 30L, 3L, "c"),
      // a then immediately c: c needs a CONSECUTIVE b — level 1
      (3L, 10L, 1L, "a"), (3L, 20L, 2L, "c"))
    assert(strictOrderFunnelOf(rows, 1000L) ==
      Map(1L -> 2, 2L -> 3, 3L -> 1))
  }

  test("strict_order: reached levels survive later interruptions; restart works") {
    val rows = Seq(
      // a,b interrupted by x, then a fresh consecutive a,b,c completes
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "x"),
      (1L, 40L, 4L, "a"), (1L, 50L, 5L, "b"), (1L, 60L, 6L, "c"))
    assert(strictOrderFunnelOf(rows, 1000L) == Map(1L -> 3))
  }

  test("strict_order window still binds on the chain start") {
    val rows = Seq(
      (1L, 0L, 1L, "a"), (1L, 100L, 2L, "b"), (1L, 301L, 3L, "c"))
    // consecutive, but c at 301 exceeds the 300 window from the start
    assert(strictOrderFunnelOf(rows, 300L) == Map(1L -> 2))
  }

  test("strict_order DP agrees with adjacency brute force on random streams") {
    val rnd = new scala.util.Random(23)
    val types = Array("a", "b", "c", "x")
    val rows = (1L to 40L).flatMap { u =>
      (1 to 12).map { i =>
        (u, rnd.nextInt(1000).toLong, u * 100 + i,
          types(rnd.nextInt(types.length)))
      }
    }
    val window = 300L
    val got = strictOrderFunnelOf(rows, window)
    rows.groupBy(_._1).foreach { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3)).toIndexedSeq
      def m(i: Int, step: Int) = sorted(i)._4 == Seq("a", "b", "c")(step)
      val n = sorted.length
      val l1 = (0 until n).exists(m(_, 0))
      val l2 = (0 until n - 1).exists(i => m(i, 0) && m(i + 1, 1) &&
        sorted(i + 1)._2 - sorted(i)._2 <= window)
      val l3 = (0 until n - 2).exists(i => m(i, 0) && m(i + 1, 1) &&
        m(i + 2, 2) && sorted(i + 2)._2 - sorted(i)._2 <= window)
      val want = if (l3) 3 else if (l2) 2 else if (l1) 1 else 0
      assert(got(u) == want, s"user $u: got ${got(u)} want $want")
    }
  }

  test("sequenceMatch is the window-free funnel: order matters, gaps don't") {
    val df = Seq(
      (1L, 0L, 1L, "a"), (1L, 1000000L, 2L, "b"), (1L, 9999999L, 3L, "c"),
      (2L, 0L, 4L, "c"), (2L, 10L, 5L, "b"), (2L, 20L, 6L, "a"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val m = Funnel.sequenceMatch(df, "user_id", "ts", "event_id",
        Seq(col("event_type") === "a", col("event_type") === "b",
          col("event_type") === "c"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // user 1: a..b..c in order over a huge gap — matched; user 2:
    // reverse order — not
    assert(m(1L) && !m(2L))
  }

  private def countOf(rows: Seq[(Long, Long, Long, String)],
                      steps: Seq[String]): Map[Long, Long] = {
    val df = rows.toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    Funnel.sequenceCount(df, "user_id", "ts", "event_id",
        steps.map(t => col("event_type") === t))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("sequenceCount counts disjoint chains; a completing event is consumed") {
    // a b c a b c → 2 disjoint chains
    assert(countOf(Seq(
      (1L, 0L, 1L, "a"), (1L, 1L, 2L, "b"), (1L, 2L, 3L, "c"),
      (1L, 3L, 4L, "a"), (1L, 4L, 5L, "b"), (1L, 5L, 6L, "c")),
      Seq("a", "b", "c"))(1L) == 2L)
    // steps a,b,a over a b a b a: the middle a completes chain 1 and
    // is CONSUMED — it cannot also start chain 2, so only 1 match
    // (a reusable completer would find 2)
    assert(countOf(Seq(
      (2L, 0L, 1L, "a"), (2L, 1L, 2L, "b"), (2L, 2L, 3L, "a"),
      (2L, 3L, 4L, "b"), (2L, 4L, 5L, "a")),
      Seq("a", "b", "a"))(2L) == 1L)
  }

  test("sequenceCount agrees with a scan-greedy reference on random streams") {
    val rnd = new scala.util.Random(7)
    val types = Array("a", "b", "c", "x")
    val rows = (1L to 40L).flatMap { u =>
      (1 to 15).map { i =>
        (u, rnd.nextInt(1000).toLong, u * 100 + i,
          types(rnd.nextInt(types.length)))
      }
    }
    val got = countOf(rows, Seq("a", "b", "c"))
    rows.groupBy(_._1).foreach { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      var (lvl, cnt) = (0, 0L)
      sorted.foreach { e =>
        if (e._4 == Seq("a", "b", "c")(lvl)) {
          lvl += 1
          if (lvl == 3) { cnt += 1; lvl = 0 }
        }
      }
      assert(got(u) == cnt, s"user $u: got ${got(u)} want $cnt")
    }
  }

  test("retention flags are cond1-gated and unordered") {
    val df = Seq(
      (1L, "a"), (1L, "c"),          // r1, r3 (no b)
      (2L, "b"), (2L, "c"),          // nothing (no a ⇒ all false)
      (3L, "c"), (3L, "a"))          // r1, r3 — order irrelevant
      .toDF("user_id", "event_type")
    val r = Funnel.retention(df, "user_id",
        Seq(col("event_type") === "a", col("event_type") === "b",
          col("event_type") === "c"))
      .collect().map(x => x.getLong(0) ->
        (x.getBoolean(1), x.getBoolean(2), x.getBoolean(3))).toMap
    assert(r(1L) == ((true, false, true)))
    assert(r(2L) == ((false, false, false)))
    assert(r(3L) == ((true, false, true)))
  }

  test("streaming funnel carries chain state across micro-batches, emits on increase only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.CdcStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CdcStream.Ev]
    val q = CdcStream.funnelLevels(mem.toDS(),
        Seq(_.event_type == "a", _.event_type == "b", _.event_type == "c"),
        windowMicros = 1000L)
      .toDF("user_id", "level")
      .writeStream.format("memory").queryName("funnelspec_stream")
      .outputMode(OutputMode.Update()).start()
    // batch 1: user 7 starts a chain; user 8 only step 2 (no start)
    mem.addData(CdcStream.Ev(1, 100, 7, "a", 0),
                CdcStream.Ev(2, 100, 8, "b", 0))
    q.processAllAvailable()
    // batch 2: user 7 completes b then c USING the carried start@100;
    // user 8 stays unmatched (b again — no emission at all)
    mem.addData(CdcStream.Ev(3, 200, 7, "b", 0),
                CdcStream.Ev(4, 300, 7, "c", 0),
                CdcStream.Ev(5, 400, 8, "b", 0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("funnelspec_stream")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // user 7: level 1 from batch 1, level 3 from batch 2 (cross-batch
    // chain); user 8: never — b without a start is level 0
    assert(out.toSet == Set((7L, 1), (7L, 3)))
    // stream result == batch operator on the concatenated input
    import spark.implicits._
    val all = Seq(
      CdcStream.Ev(1, 100, 7, "a", 0), CdcStream.Ev(2, 100, 8, "b", 0),
      CdcStream.Ev(3, 200, 7, "b", 0), CdcStream.Ev(4, 300, 7, "c", 0),
      CdcStream.Ev(5, 400, 8, "b", 0))
      .toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val batch = Funnel.windowFunnel(all, "user_id", "ts", "event_id",
        Seq(col("event_type") === "a", col("event_type") === "b",
          col("event_type") === "c"), 1000L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val streamFinal = out.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).max }
    assert(batch(7L) == 3 && batch(8L) == 0)
    assert(streamFinal(7L) == 3 && !streamFinal.contains(8L))
  }

  test("funnel on real events matches a spot-checked user") {
    // end-to-end type plumbing on the sf0.001 events table: levels in
    // range, all users accounted for
    val events = Tables.load(spark, sfDir, "events")
    val lv = Funnel.windowFunnel(events, "user_id", "ts", "event_id",
      Seq(col("event_type") === "signup", col("event_type") === "click",
        col("event_type") === "purchase"), 4L * 3600 * 1000000)
    val n = events.select("user_id").distinct().count()
    assert(lv.count() == n)
    assert(lv.agg(min("level"), max("level")).head match {
      case r => r.getInt(0) >= 0 && r.getInt(1) <= 3
    })
  }
}
