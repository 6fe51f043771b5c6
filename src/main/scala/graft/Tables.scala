package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated testdata layout
  * (`<dir>/<name>.parquet`). All queries go through here so scans stay
  * declarative and Catalyst can push filters/prunes into the file scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session conf required to scan TIMESTAMP(NANOS) parquet (the
    * `events` table): Spark has no nanos timestamp type, so nanos come
    * in as long and [[load]] converts to a microsecond timestamp.
    */
  val requiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) on disk → LongType under
    // nanosAsLong; floor-divide to micros (same floor DuckDB's
    // epoch_us applies) so downstream code sees a real timestamp.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
