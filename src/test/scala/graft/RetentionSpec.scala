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
}
