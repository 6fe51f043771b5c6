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
}
