package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sinks.ParquetSink

/** Retention over the monthly-partitioned layout: partition drops are
  * directory deletes (no data read), time-range deletes touch only the
  * overlapped partitions, and untouched months stay bit-for-bit
  * identical (asserted on file paths + lengths + mtimes).
  */
class RetentionSpec extends SparkSpec {

  private def threeMonths(out: String): Unit = {
    import spark.implicits._
    val rows = Seq(
      (1L, "2026-01-05 01:00:00"), (2L, "2026-01-20 01:00:00"),
      (3L, "2026-02-10 01:00:00"), (4L, "2026-02-25 01:00:00"),
      (5L, "2026-03-03 01:00:00"), (6L, "2026-03-28 01:00:00"))
    val df = rows.toDF("id", "ts_s")
      .select(col("id"), to_timestamp(col("ts_s")).as("ts"))
    ParquetSink.writeMonthly(df, "ts", out, mode = "overwrite")
  }

  private def fileState(dir: String): Set[(String, Long, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(s =>
      (s.getPath.getName, s.getLen, s.getModificationTime)).toSet
  }

  test("dropMonths: retention is a directory delete, reads stay pruned") {
    val out = Files.createTempDirectory("graft_retain").toString
    threeMonths(out)
    assert(ParquetSink.listMonths(spark, out) == Seq("202601", "202602", "202603"))
    val dropped = ParquetSink.dropMonths(spark, out, beforeMonth = "202602")
    assert(dropped == Seq("202601"))
    assert(ParquetSink.listMonths(spark, out) == Seq("202602", "202603"))
    val back = ParquetSink.readMonthly(spark, out)
    assert(back.count() == 4)
    assert(back.select(min(col("ts"))).head().getTimestamp(0).toString
      .startsWith("2026-02"))
  }

  test("deleteTimeRange: full months dropped, boundaries rewritten, rest untouched") {
    val out = Files.createTempDirectory("graft_trdel").toString
    threeMonths(out)
    val marchBefore = fileState(s"$out/month=202603")
    // delete [Jan 15, Mar 1): Jan is a boundary rewrite (one row
    // survives), Feb is fully covered (directory drop), Mar untouched
    val (droppedM, rewrittenM) = ParquetSink.deleteTimeRange(
      spark, out, "ts", "2026-01-15 00:00:00", "2026-03-01 00:00:00")
    assert(droppedM == Seq("202602"))
    assert(rewrittenM == Seq("202601"))
    val back = ParquetSink.readMonthly(spark, out)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 5L, 6L), "only the out-of-range rows survive")
    // the untouched month's files are bit-for-bit the same
    assert(fileState(s"$out/month=202603") == marchBefore)
  }

  test("deleteTimeRange == plain anti-filter on randomized ranges") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1L to 200L).map { id =>
      val month = 1 + rnd.nextInt(6)
      val day = 1 + rnd.nextInt(28)
      val hour = rnd.nextInt(24)
      (id, f"2026-$month%02d-$day%02d $hour%02d:00:00")
    }
    val df = rows.toDF("id", "ts_s")
      .select(col("id"), to_timestamp(col("ts_s")).as("ts"))
    (1 to 5).foreach { _ =>
      val m1 = 1 + rnd.nextInt(6); val d1 = 1 + rnd.nextInt(28)
      val m2 = m1 + rnd.nextInt(7 - m1); val d2 = 1 + rnd.nextInt(28)
      val (from, until) = {
        val a = f"2026-$m1%02d-$d1%02d 00:00:00"
        val b = f"2026-$m2%02d-$d2%02d 12:00:00"
        if (a <= b) (a, b) else (b, a)
      }
      val out = Files.createTempDirectory("graft_trdel_rand").toString
      ParquetSink.writeMonthly(df, "ts", out, mode = "overwrite")
      ParquetSink.deleteTimeRange(spark, out, "ts", from, until)
      val got = ParquetSink.readMonthly(spark, out)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = df.filter(!(col("ts") >= lit(from).cast("timestamp") &&
          col("ts") < lit(until).cast("timestamp")))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == want, s"range [$from, $until): " +
        s"missing=${want -- got} extra=${got -- want}")
    }
  }

  test("streaming landMonthly writes the retention-ready layout") {
    val out = Files.createTempDirectory("graft_land").toString
    val ckpt = Files.createTempDirectory("graft_land_ckpt").toString
    val stream = graft.streaming.CdcStream.readEvents(spark, sfDir)
    graft.streaming.CdcStream.landMonthly(stream, "ts", out, ckpt)
    val events = Tables.load(spark, sfDir, "events")
    val back = ParquetSink.readMonthly(spark, out)
    assert(back.count() == events.count(), "every streamed row landed")
    val wantMonths = events
      .select(ParquetSink.monthKey(col("ts"))).distinct().count()
    assert(ParquetSink.listMonths(spark, out).size == wantMonths,
      "landing zone carries the month partition layout")
  }

  test("deleteTimeRange: PARTIAL boundary month emptied becomes a drop too") {
    val out = Files.createTempDirectory("graft_trdel3").toString
    threeMonths(out)
    // [Jan 2, Feb 1): Jan is a true boundary month (range starts
    // mid-month) but BOTH its rows fall in range — the rewrite finds
    // zero survivors and must drop the directory, not publish an
    // empty partition (footer-only part files must not count as data)
    val (droppedM, rewrittenM) = ParquetSink.deleteTimeRange(
      spark, out, "ts", "2026-01-02 00:00:00", "2026-02-01 00:00:00")
    assert(droppedM == Seq("202601"), s"dropped=$droppedM")
    assert(rewrittenM.isEmpty, s"rewritten=$rewrittenM")
    assert(ParquetSink.listMonths(spark, out) == Seq("202602", "202603"))
    assert(ParquetSink.readMonthly(spark, out).count() == 4)
  }

  test("deleteTimeRange recovers an interrupted swap before processing") {
    val out = Files.createTempDirectory("graft_trdel_rec").toString
    threeMonths(out)
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between the two swap renames: the live month
    // was moved to its visible backup and the rewrite never published
    assert(fs.rename(new Path(out, "month=202601"),
      new Path(out, "_graft_replaced_month=202601")))
    assert(ParquetSink.listMonths(spark, out) == Seq("202602", "202603"))
    // ANY later retention run must first restore the stranded month
    val (dropped, rewritten) = ParquetSink.deleteTimeRange(
      spark, out, "ts", "2027-01-01 00:00:00", "2027-02-01 00:00:00")
    assert(dropped.isEmpty && rewritten.isEmpty)
    assert(ParquetSink.listMonths(spark, out) ==
      Seq("202601", "202602", "202603"), "interrupted month restored")
    assert(ParquetSink.readMonthly(spark, out).count() == 6)
  }

  test("retention never touches the null partition") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_nullpart").toString
    val df = Seq((1L, Some("2026-01-05 01:00:00")), (2L, None))
      .toDF("id", "ts_s")
      .select(col("id"), to_timestamp(col("ts_s")).as("ts"))
    ParquetSink.writeMonthly(df, "ts", out, mode = "overwrite")
    // the null-ts row lands under month=__HIVE_DEFAULT_PARTITION__;
    // it is not a month and must be invisible to retention date math
    assert(ParquetSink.listMonths(spark, out) == Seq("202601"))
    assert(ParquetSink.dropMonths(spark, out, "999999") == Seq("202601"))
    // deleteTimeRange must not throw on the remaining null partition
    val (d, r) = ParquetSink.deleteTimeRange(
      spark, out, "ts", "2026-01-01 00:00:00", "2026-02-01 00:00:00")
    assert(d.isEmpty && r.isEmpty)
    assert(ParquetSink.readMonthly(spark, out).count() == 1,
      "null-timestamp row survives retention untouched")
  }

  test("deleteTimeRange: boundary month emptied entirely becomes a drop") {
    val out = Files.createTempDirectory("graft_trdel2").toString
    threeMonths(out)
    // [Jan 1, Feb 15): all of Jan's rows are in range -> Jan must
    // disappear (empty rewrite = drop), Feb rewritten to one row
    val (droppedM, rewrittenM) = ParquetSink.deleteTimeRange(
      spark, out, "ts", "2026-01-01 00:00:00", "2026-02-15 00:00:00")
    assert(droppedM.contains("202601") && !rewrittenM.contains("202601"))
    assert(rewrittenM == Seq("202602"))
    assert(ParquetSink.listMonths(spark, out) == Seq("202602", "202603"))
    assert(ParquetSink.readMonthly(spark, out)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L, 6L))
  }

  test("statsMonthly reports files/bytes/rows per month from metadata") {
    val out = Files.createTempDirectory("graft_stats").toString
    threeMonths(out) // 2 rows in each of 202601..202603
    val stats = ParquetSink.statsMonthly(spark, out).collect()
      .map(r => r.getAs[String]("month") ->
        (r.getAs[Long]("files"), r.getAs[Long]("bytes"), r.getAs[Long]("rows")))
    assert(stats.map(_._1).toSeq == Seq("202601", "202602", "202603"))
    stats.foreach { case (m, (files, bytes, rows)) =>
      assert(rows == 2L, s"month $m rows")
      assert(files >= 1L, s"month $m files")
      // bytes must equal the actual data-file footprint on disk
      assert(bytes == fileState(s"$out/month=$m").toSeq
        .filterNot(f => f._1.startsWith("_") || f._1.startsWith("."))
        .map(_._2).sum, s"month $m bytes")
    }
    // empty tree: no months, no rows, no job failures
    val empty = Files.createTempDirectory("graft_stats_empty").toString
    assert(ParquetSink.statsMonthly(spark, empty).count() == 0)
  }
}
