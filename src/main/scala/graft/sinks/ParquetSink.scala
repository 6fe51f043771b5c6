package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY §2.I2 — month-partitioned parquet sink: the storage layout
  * of the reference's MergeTree tables (`PARTITION BY
  * toYYYYMM(event_timestamp)`, 01-init-tables.sql:19) as a parquet
  * directory tree. Time-range queries then prune whole month
  * directories before row-group stats even apply, and retention
  * (month drops) is a directory delete rather than a delete-by-query.
  */
object ParquetSink {

  /** The toYYYYMM partition key. */
  def monthKey(ts: Column): Column = date_format(ts, "yyyyMM")

  /** Write `df` partitioned by month of `tsCol`. `maxRecordsPerFile`
    * bounds file size under skewed months (one hot month must not
    * become one giant file). */
  def writeMonthly(df: DataFrame, tsCol: String, path: String,
                   mode: String = "append",
                   maxRecordsPerFile: Long = 5000000L): Unit =
    df.withColumn("month", monthKey(col(tsCol)))
      .write
      .partitionBy("month")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(mode)
      .parquet(path)

  /** Read back a monthly-partitioned tree; `month` is a partition
    * column, so month-range filters prune directories at planning
    * time. */
  def readMonthly(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The reference's `OPTIMIZE TABLE ... FINAL` as a job
    * (04-optimize-tables.sql:24-48): collapse an event log to its
    * latest state per entity and rewrite it month-partitioned. In
    * ClickHouse this is a scheduled merge over the whole table; here
    * it is one `max_by` hash-agg (shuffle payload ~|entities|) plus a
    * partitioned write — run it periodically to keep the "current
    * state" table cheap to scan, while the raw event log remains the
    * source of truth.
    */
  def compactToLatest(events: DataFrame, entityCol: String,
                      orderCols: Seq[String], tsCol: String, path: String,
                      mode: String = "overwrite"): Unit =
    writeMonthly(
      graft.operators.CurrentState.latest(events, entityCol, orderCols),
      tsCol, path, mode)

  /** Bucketed layout for co-located joins: tables bucketed AND sorted
    * on the same join key join with zero shuffle and zero sort (the
    * exchange is eliminated at planning time — see ParquetSinkSpec).
    * This is the layout to land CDC streams in when the dominant
    * downstream pattern is repeated joins/aggregations on
    * `entity_id`: the shuffle is paid once at write, not per query.
    * Bucket count is a capacity decision (files ≈ buckets ×
    * writer-partitions) — at 100 TB pick buckets so a bucket fits an
    * executor's scan budget. */
  def writeBucketed(df: DataFrame, keyCol: String, buckets: Int,
                    tableName: String): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .saveAsTable(tableName)
}
