package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Count-min sketch (functions/CountMin.scala): the overestimate-only
  * invariant, exact-merge bit-identity, null posture, and the SQL
  * registrations — the contracts cdc_cms_check banks on at scale.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("cms estimates are exact on a small fixture, null is not an item") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c") ++
      Seq(null.asInstanceOf[String]))
      .map(Tuple1(_)).toDF("item")
    val state = df.agg(Sketches.cmsStateCol(col("item")).as("s"))
    val got = state.select(
        Sketches.cmsEstimate(col("s"), lit("a")).as("a"),
        Sketches.cmsEstimate(col("s"), lit("b")).as("b"),
        Sketches.cmsEstimate(col("s"), lit("c")).as("c"),
        Sketches.cmsEstimate(col("s"), lit(null.asInstanceOf[String])).as("n"))
      .collect()(0)
    assert(got.getLong(0) == 5L && got.getLong(1) == 3L && got.getLong(2) == 1L)
    assert(got.isNullAt(3), "null item must estimate to NULL, not a count")
  }

  test("cms is overestimate-only under forced collisions") {
    // 500 distinct items into width 64: collisions guaranteed. The
    // deterministic invariant est >= exact must hold for EVERY item,
    // and at this load at least one estimate must strictly overshoot
    // (otherwise the test is vacuous).
    val df = (1 to 2000).map(i => (i % 500).toLong).toDF("item")
    val state = df.agg(Sketches.cmsStateCol(col("item"),
      depth = 4, width = 64).as("s"))
    val ests = df.distinct()
      .crossJoin(broadcast(state))
      .select(col("item"), Sketches.cmsEstimate(col("s"), col("item")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("item").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (item, cnt) =>
      assert(ests(item) >= cnt, s"underestimate at $item: ${ests(item)} < $cnt")
    }
    assert(exact.exists { case (item, cnt) => ests(item) > cnt },
      "width 64 with 500 items must produce at least one overshoot")
  }

  test("cms merge of partitioned states is bit-identical to one pass") {
    val df = (1 to 1000).map(i => ((i % 97).toLong, i % 3)).toDF("item", "part")
    val whole = df.agg(Sketches.cmsStateCol(col("item")).as("cms_state"))
      .collect()(0).getAs[Array[Byte]](0)
    val parts = (0 until 3).map(p =>
      df.filter(col("part") === p)
        .agg(Sketches.cmsStateCol(col("item")).as("cms_state")))
    val merged = Sketches.mergeCmsStates(
        parts.reduce(_ unionAll _).withColumn("k", lit(1)), Seq("k"))
      .collect()(0).getAs[Array[Byte]]("cms_state")
    assert(java.util.Arrays.equals(whole, merged),
      "merge(parts) must equal state(union) byte-for-byte")
  }

  test("cms_merge raises on geometry mismatch instead of zipping") {
    val a = Seq(1L).toDF("item")
      .agg(Sketches.cmsStateCol(col("item"), 4, 64).as("cms_state"))
    val b = Seq(1L).toDF("item")
      .agg(Sketches.cmsStateCol(col("item"), 4, 128).as("cms_state"))
    val ex = intercept[Exception] {
      Sketches.mergeCmsStates(
        a.unionAll(b).withColumn("k", lit(1)), Seq("k")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("SQL registration: cms_agg / cms_merge / cms_query round-trip") {
    GraftExtensions.register(spark)
    (1 to 10).map(i => (i % 4).toLong).toDF("v").createOrReplaceTempView("cms_in")
    val est = spark.sql(
      """SELECT cms_query(cms_merge(s), 1L) AS est FROM (
           SELECT cms_agg(v, 4, 1024) AS s FROM cms_in GROUP BY v % 2
         )""").collect()(0).getLong(0)
    // item 1 appears for i in {1,5,9}: 3 times
    assert(est == 3L, s"est=$est")
  }
}
