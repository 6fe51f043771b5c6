package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Invariants for the persisted HLL distinct-count state (the
  * uniqState/uniqMerge analog): merge losslessness w.r.t. the sketch,
  * error bound vs exact, loud mismatched-lgK refusal, and parquet
  * round-trip of the binary state column.
  */
class HllStateSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sfDir, "events")

  test("merged day-states == from-scratch state, estimate-identical per key") {
    // three "days" by event_id residue; union-of-sketches must equal
    // sketch-of-union EXACTLY (not within tolerance) — HLL union at
    // equal lgK is deterministic on the same value set
    val days = (0 until 3).map(d =>
      Sketches.distinctState(
        events.filter(col("event_id") % 3 === d), Seq("event_type"), "user_id"))
    val merged = Sketches.estimateDistinct(
      Sketches.mergeDistinctStates(days.reduce(_ unionAll _), Seq("event_type")))
    val full = Sketches.estimateDistinct(
      Sketches.distinctState(events, Seq("event_type"), "user_id"))
    assert(merged.count() == full.count())
    assert(merged.except(full).isEmpty && full.except(merged).isEmpty)
  }

  test("estimate within 5% of exact countDistinct per key") {
    val est = Sketches.estimateDistinct(
      Sketches.distinctState(events, Seq("event_type"), "user_id"))
    val exact = events.groupBy("event_type")
      .agg(count(lit(1)).as("total_x"),
        count_distinct(col("user_id")).as("exact_uniq"))
    val rows = est.join(exact, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, x) = (r.getAs[Long]("uniq_est"), r.getAs[Long]("exact_uniq"))
      assert(r.getAs[Long]("total") == r.getAs[Long]("total_x"))
      assert(math.abs(e - x) <= math.max(2L, (0.05 * x).toLong),
        s"${r.getAs[String]("event_type")}: est $e vs exact $x")
    }
  }

  test("mismatched-lgK merge fails loud") {
    val a = Sketches.distinctState(events, Seq("event_type"), "user_id", lgK = 12)
    val b = Sketches.distinctState(events, Seq("event_type"), "user_id", lgK = 13)
    assertThrows[Exception] {
      Sketches.mergeDistinctStates(a.unionAll(b), Seq("event_type")).collect()
    }
  }

  test("state round-trips through parquet unchanged") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hll_state").toString
    try {
      val state = Sketches.distinctState(events, Seq("event_type"), "user_id")
      state.write.mode("overwrite").parquet(dir)
      val back = Sketches.estimateDistinct(spark.read.parquet(dir))
      val direct = Sketches.estimateDistinct(state)
      assert(back.except(direct).isEmpty && direct.except(back).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
