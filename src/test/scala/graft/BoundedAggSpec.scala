package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Bounded-state aggregates (functions/BoundedAggs.scala): uniqUpTo /
  * topKWeighted. The contract under test: EXACT below the cap,
  * saturated / bounded-overestimate above it, nulls are not items,
  * state survives shuffle (partial merge) and partitioning does not
  * change answers.
  */
class BoundedAggSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sfDir, "events")

  test("uniq_upto is exact below the cap (vs count_distinct)") {
    val got = Sketches.uniqUpTo(events, Seq("event_type"), "user_id",
      n = 100000, as = "u")
    val want = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("w"))
    val bad = got.join(want, "event_type").filter(col("u") =!= col("w"))
    assert(bad.count() == 0)
  }

  test("uniq_upto saturates at n+1 above the cap") {
    val perType = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perType.values.exists(_ > 3), "fixture too small to saturate")
    val got = Sketches.uniqUpTo(events, Seq("event_type"), "user_id",
      n = 3, as = "u").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perType.foreach { case (k, d) =>
      assert(got(k) == math.min(d, 4L), s"$k: d=$d got=${got(k)}")
    }
  }

  test("uniq_upto skips nulls and answers 0 on all-null groups") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)),
      ("b", None)).toDF("k", "v")
    val got = Sketches.uniqUpTo(df, Seq("k"), "v", n = 10, as = "u")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 0L))
  }

  test("uniq_upto is partitioning-invariant (partial merge correct)") {
    val a = Sketches.uniqUpTo(events.repartition(13), Seq("event_type"),
      "user_id", n = 7, as = "u").orderBy("event_type").collect().toSeq
    val b = Sketches.uniqUpTo(events.coalesce(1), Seq("event_type"),
      "user_id", n = 7, as = "u").orderBy("event_type").collect().toSeq
    assert(a == b)
  }

  test("topk_pairs reproduces the row_number window exactly (ties + nulls)") {
    // the contract sim_ivfpq's shortlist rests on: identical row set
    // and order to the per-group sort it replaced — exercised with
    // manufactured score TIES (coarse rounding) and NULL scores
    // (window desc = NULLS LAST; heap carries them as -Inf)
    val df = events.select(col("event_type").as("g"),
      when(col("event_id") % 7 === 0, lit(null))
        .otherwise(round(col("value"), 1)).as("score"),
      col("event_id").as("id"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= 5)
      .select(col("g"), col("id"), col("rk").cast("long").as("rk"))
      .orderBy("g", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = df.groupBy("g")
      .agg(Sketches.topkPairsCol(col("score"), col("id"), 5).as("p"))
      .select(col("g"), posexplode(col("p")).as(Seq("i", "e")))
      .select(col("g"), col("e.id").as("id"),
        (col("i") + 1).cast("long").as("rk"))
      .orderBy("g", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("topk_pairs is partitioning-invariant (partial merge correct)") {
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("event_type")
      .agg(Sketches.topkPairsCol(col("value"), col("event_id"), 7).as("p"))
      .orderBy("event_type").collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getDouble(0), e.getLong(1))).toSeq).toSeq
    assert(run(events.repartition(13)) == run(events.coalesce(1)))
  }

  test("uniq_upto registered in SQL and matches the DataFrame form") {
    GraftExtensions.register(spark)
    events.createOrReplaceTempView("ev_bounded")
    val sqlRes = spark.sql(
      """SELECT event_type, uniq_upto(user_id, 5) AS u
         FROM ev_bounded GROUP BY event_type ORDER BY event_type""")
      .collect().toSeq
    val dfRes = Sketches.uniqUpTo(events, Seq("event_type"), "user_id",
      n = 5, as = "u").orderBy("event_type").collect().toSeq
    assert(sqlRes == dfRes)
  }

  test("topk_weighted is exact below capacity (vs groupBy sum + rank)") {
    val weighted = events.select(col("event_type"),
      col("user_id").cast("string").as("item"),
      floor(col("value") * 10000).cast("long").as("w"))
    val got = Sketches.topkWeighted(weighted, Seq("event_type"), "item",
      "w", capacity = 1000)
      .select(col("event_type"), explode(col("topk_w")).as("e"))
      .select(col("event_type"), col("e.item"), col("e.weight"))
    val want = weighted.groupBy("event_type", "item")
      .agg(sum(col("w")).as("weight"))
    val bad = got.alias("g").join(want.alias("x"),
        Seq("event_type", "item"), "full_outer")
      .filter(col("g.weight").isNull || col("x.weight").isNull ||
        col("g.weight") =!= col("x.weight"))
    assert(bad.count() == 0)
  }

  test("topk_weighted array order is (weight desc, item asc)") {
    val weighted = events.select(col("event_type"),
      col("user_id").cast("string").as("item"),
      floor(col("value") * 10000).cast("long").as("w"))
    val rows = Sketches.topkWeighted(weighted, Seq("event_type"), "item",
      "w", capacity = 1000).select(col("topk_w")).collect()
    rows.foreach { r =>
      val arr = r.getSeq[org.apache.spark.sql.Row](0)
      arr.sliding(2).foreach {
        case Seq(a, b) =>
          val (wa, wb) = (a.getLong(1), b.getLong(1))
          assert(wa > wb || (wa == wb &&
            a.getString(0) < b.getString(0)), s"order violated: $a $b")
        case _ =>
      }
    }
  }

  test("topk_weighted caps state and keeps the dominant item under eviction") {
    val s = spark
    import s.implicits._
    // one heavy item (weight 10x the combined tail), many light ones
    val rows = ("heavy", 5000L) +: (1 to 200).map(i => (f"light$i%03d", 2L))
    val df = rows.toDF("item", "w").repartition(7)
    val arr = Sketches.topkWeighted(df.withColumn("k", lit(1)), Seq("k"),
      "item", "w", capacity = 16).select(col("topk_w")).head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(arr.size <= 16, s"state exceeded capacity: ${arr.size}")
    assert(arr.head.getString(0) == "heavy",
      s"dominant item lost under eviction: ${arr.take(3)}")
    // SpaceSaving overestimates, never underestimates the survivor
    assert(arr.head.getLong(1) >= 5000L)
  }

  test("topk_weighted merge keeps the overestimate-only guarantee " +
       "for items trimmed at a merge that later re-enter (ADVICE r7)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types.{LongType, StringType}
    val agg = graft.functions.TopKWeighted(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, LongType, nullable = true), capacity = 2)
    def feed(buf: graft.functions.TopKWeighted.Buffer,
             items: (String, Long)*): graft.functions.TopKWeighted.Buffer = {
      items.foldLeft(buf) { case (b, (i, w)) =>
        agg.update(b, InternalRow(UTF8String.fromString(i), w))
      }
    }
    // b1 tracks {a:10, b:8}; merging {c:9, d:7} trims b and d away
    val b1 = feed(agg.createAggregationBuffer(), "a" -> 10L, "b" -> 8L)
    val b2 = feed(agg.createAggregationBuffer(), "c" -> 9L, "d" -> 7L)
    val merged = agg.merge(b1, b2)
    assert(merged.map.size() == 2)
    assert(merged.floor >= 8L, s"trimmed mass not floored: ${merged.floor}")
    // b re-enters from a third partial with weight 1 (true total 9);
    // pre-fix it would report 1 — an underestimate
    val b3 = feed(agg.createAggregationBuffer(), "b" -> 1L)
    val again = agg.merge(merged, b3)
    val reported = again.map.get("b")
    assert(reported != null && reported >= 9L,
      s"re-entering item underestimated: $reported < 9")
    // serialize round-trip preserves the floor
    val rt = agg.deserialize(agg.serialize(again))
    assert(rt.floor == again.floor && rt.map.equals(again.map))
  }

  test("topk_weighted is partitioning-invariant in the exact regime") {
    val weighted = events.select(col("event_type"),
      col("user_id").cast("string").as("item"),
      floor(col("value") * 10000).cast("long").as("w"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.topkWeighted(df, Seq("event_type"), "item", "w",
        capacity = 1000).orderBy("event_type").collect().toSeq
    assert(run(weighted.repartition(17)) == run(weighted.coalesce(1)))
  }
}
