package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Invariants for the persisted sketch-state suite — HLL distinct
  * count (uniqState/uniqMerge analog), theta set-overlap, KLL
  * quantiles: merge losslessness w.r.t. the sketch, error bounds vs
  * exact, loud mismatched-lgK refusal, and parquet round-trip of the
  * binary state columns.
  */
class HllStateSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sfDir, "events")
  private lazy val docs = Tables.load(spark, sfDir, "documents")

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

  test("theta overlap is exact below capacity, merged or direct") {
    // sf0.001 corpora sit far under 2^14 retained hashes, so the
    // sketches are in exact mode: |A|, |B|, |A ∩ B| must EQUAL the
    // distinct-join ground truth — and building the history side from
    // two merged day-states must not change a digit
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val histState = Sketches.mergeThetaStates(
      Seq(0, 2).map(d => Sketches.thetaState(
        hist.filter(col("doc_id") % 4 === d), Nil, "text", lgK = 14))
        .reduce(_ unionAll _), Nil)
    val got = Sketches.thetaOverlap(histState,
      Sketches.thetaState(batch, Nil, "text", lgK = 14), Nil).head()
    val hx = hist.select("text").distinct()
    val bx = batch.select("text").distinct()
    assert(got.getAs[Long]("uniq_a") == hx.count())
    assert(got.getAs[Long]("uniq_b") == bx.count())
    assert(got.getAs[Long]("overlap_est") == hx.intersect(bx).count())
  }

  test("kll quantile estimates honor the rank guarantee; n exact; merge == day union") {
    val days = Seq(0, 1).map(d => Sketches.quantileState(
      docs.filter(col("doc_id") % 2 === d), Seq("lang"), "n_chars"))
    val qs = Sketches.quantiles(
      Sketches.mergeQuantileStates(days.reduce(_ unionAll _), Seq("lang")),
      Seq(0.5, 0.9, 0.99))
    val exact = docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(col("n_chars").cast("long"))).as("xs"))
    val rows = qs.join(exact, "lang").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = r.getAs[scala.collection.Seq[Long]]("xs")
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n") == n, s"${r.getAs[String]("lang")} n")
      Seq(0.5 -> "q50", 0.9 -> "q90", 0.99 -> "q99").foreach { case (p, c) =>
        val est = r.getAs[Long](c)
        val lo = xs(math.max(0, math.ceil((p - 0.03) * n).toInt - 1))
        val hi = xs(math.min(n - 1, math.ceil((p + 0.03) * n).toLong - 1).toInt)
        assert(est >= lo && est <= hi,
          s"${r.getAs[String]("lang")} $c: $est outside [$lo, $hi]")
      }
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

  // helper: estimate rows as (key, item -> count) maps, which is the
  // tie-order-insensitive view (equal-count items order arbitrarily)
  private def topkCounts(est: org.apache.spark.sql.DataFrame)
    : Map[String, Map[Long, Long]] =
    est.select(col("event_type"), explode(col("topk")).as("e"))
      .select("event_type", "e.item", "e.count").collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }

  test("topk merged day-states carry exact counts; any tie-broken top-k is valid") {
    val days = Seq(0, 1, 2).map(d => Sketches.topkState(
      events.filter(col("event_id") % 3 === d), Seq("event_type"), "user_id"))
    val merged = topkCounts(Sketches.topk(
      Sketches.mergeTopkStates(days.reduce(_ unionAll _), Seq("event_type")),
      k = 10))
    val exact = events.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cnt")).collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    assert(merged.keySet == exact.keySet)
    merged.foreach { case (et, items) =>
      val ex = exact(et)
      assert(items.size == math.min(10, ex.size), s"$et size")
      // exact mode (distinct users per type << capacity): every
      // returned count equals the true count
      items.foreach { case (item, c) =>
        assert(ex.get(item).contains(c), s"$et item $item: $c vs ${ex.get(item)}")
      }
      // validity under ties: every returned item's true count clears
      // the k-th largest true count
      val kth = ex.values.toSeq.sorted(Ordering[Long].reverse)
        .apply(math.min(10, ex.size) - 1)
      items.foreach { case (item, _) =>
        assert(ex(item) >= kth, s"$et item $item below kth count $kth")
      }
    }
  }

  test("topk merge refuses a state built at a different capacity, loudly") {
    val a = Sketches.topkState(events, Seq("event_type"), "user_id",
      maxItemsTracked = 10000)
    val b = Sketches.topkState(events, Seq("event_type"), "user_id",
      maxItemsTracked = 1024)
    val e = intercept[Exception] {
      Sketches.mergeTopkStates(a.unionAll(b), Seq("event_type")).collect()
    }
    assert(e.getMessage.contains("refusing") ||
      Option(e.getCause).exists(_.getMessage.contains("refusing")))
  }

  test("topk ignores null values (they are not items)") {
    val withNulls = events.withColumn("user_id",
      when(col("event_id") % 2 === 0, null).otherwise(col("user_id")))
    val est = topkCounts(Sketches.topk(
      Sketches.topkState(withNulls, Seq("event_type"), "user_id"), k = 5))
    val exact = withNulls.filter(col("user_id").isNotNull)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt")).collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    est.foreach { case (et, items) =>
      items.foreach { case (item, c) =>
        assert(exact(et).get(item).contains(c), s"$et item $item")
      }
    }
  }

  test("topk state round-trips through parquet unchanged") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_topk_state").toString
    try {
      val state = Sketches.topkState(events, Seq("event_type"), "user_id")
      state.write.mode("overwrite").parquet(dir)
      val back = topkCounts(Sketches.topk(
        Sketches.mergeTopkStates(spark.read.parquet(dir), Seq("event_type")),
        k = 10))
      val direct = topkCounts(Sketches.topk(state, k = 10))
      // counts must agree item-for-item; tie order at the k boundary
      // may differ, so compare the item->count maps' common structure
      assert(back.keySet == direct.keySet)
      back.foreach { case (et, items) =>
        val d = direct(et)
        assert(items.size == d.size)
        // every round-tripped item that the direct estimate also
        // returned must carry the identical count
        items.foreach { case (item, c) =>
          d.get(item).foreach(dc => assert(dc == c, s"$et item $item"))
        }
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("streaming uniqState landing == batch state, batch-count independent") {
    // stream the same events as 1 file and as 3 files (1 per batch):
    // the landed state's finalized estimates must be identical to each
    // other AND to the direct batch build (HLL union associativity)
    val root = java.nio.file.Files
      .createTempDirectory("graft_uniq_land").toString
    try {
      def land(nChunks: Int): Map[String, (Long, Long)] = {
        val stage = s"$root/c$nChunks"
        (0 until nChunks).foreach { c =>
          events.filter(col("event_id") % nChunks === c).coalesce(1)
            .write.mode("append").parquet(s"$stage/in")
        }
        val stream = spark.readStream
          .schema(spark.read.parquet(s"$stage/in").schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$stage/in")
        streaming.CdcStream.uniqStateLand(stream, Seq("event_type"),
          "user_id", s"$stage/state", s"$stage/ckpt")
        Sketches.estimateDistinct(
            spark.read.parquet(s"$stage/state/state"))
          .collect()
          .map(r => r.getAs[String]("event_type") ->
            (r.getAs[Long]("total"), r.getAs[Long]("uniq_est"))).toMap
      }
      val one = land(1)
      val three = land(3)
      assert(one == three, s"batching changed the landed state: $one vs $three")
      val direct = Sketches.estimateDistinct(
          Sketches.distinctState(events, Seq("event_type"), "user_id"))
        .collect()
        .map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("total"), r.getAs[Long]("uniq_est"))).toMap
      assert(one == direct, s"landed state != batch build: $one vs $direct")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("uniqState landing recovers an interrupted publish") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_uniq_recover").toString
    try {
      val stage = s"$root/s"
      events.coalesce(1).write.mode("overwrite").parquet(s"$stage/in")
      val stream1 = spark.readStream
        .schema(spark.read.parquet(s"$stage/in").schema).parquet(s"$stage/in")
      streaming.CdcStream.uniqStateLand(stream1, Seq("event_type"),
        "user_id", s"$stage/state", s"$stage/ckpt1")
      val live = new java.io.File(s"$stage/state/state")
      val backup = new java.io.File(s"$stage/state/_graft_prev_state")
      // simulate a crash between the two publish renames: live moved
      // to backup, new state never arrived
      assert(live.renameTo(backup))
      assert(!live.exists())
      // next landing run must restore the backup before merging
      events.filter(col("event_id") % 7 === 0).coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/in2")
      val stream2 = spark.readStream
        .schema(spark.read.parquet(s"$stage/in2").schema).parquet(s"$stage/in2")
      streaming.CdcStream.uniqStateLand(stream2, Seq("event_type"),
        "user_id", s"$stage/state", s"$stage/ckpt2")
      assert(live.exists() && !backup.exists())
      // the restored-then-merged estimate still covers ALL users (the
      // second run's values are a subset of the first's)
      val est = Sketches.estimateDistinct(
          spark.read.parquet(s"$stage/state/state"))
        .collect().map(r => r.getAs[String]("event_type") ->
          r.getAs[Long]("uniq_est")).toMap
      val direct = Sketches.estimateDistinct(
          Sketches.distinctState(events, Seq("event_type"), "user_id"))
        .collect().map(r => r.getAs[String]("event_type") ->
          r.getAs[Long]("uniq_est")).toMap
      assert(est == direct, s"recovered state lost values: $est vs $direct")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
