package graft.sinks

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}

/** SURVEY §2.I1 — batched JDBC sink, the Spark-native form of the
  * reference's bulk landing path (initial-load/scripts/
  * 03-bulk-import.py:200-260 batched inserts into ClickHouse).
  *
  * The writer is configured for OLAP-store append throughput:
  * large insert batches, no transaction isolation (ClickHouse has no
  * transactions — the reference relies on downstream dedup for
  * at-least-once delivery, same as our CurrentState operator), and a
  * bounded number of concurrent connections via numPartitions (every
  * partition opens one connection; 10k executor tasks hammering one
  * endpoint is an outage, not a write).
  */
object JdbcSink {

  /** ClickHouse-flavored defaults; pure and unit-testable. */
  def options(url: String, table: String, user: String, password: String,
              batchSize: Int = 100000, numPartitions: Int = 16,
              truncate: Boolean = false): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "user" -> user,
    "password" -> password,
    "batchsize" -> batchSize.toString,
    "numPartitions" -> numPartitions.toString,
    "truncate" -> truncate.toString,
    "isolationLevel" -> "NONE",
    "rewriteBatchedStatements" -> "true",
    "driver" -> "com.clickhouse.jdbc.ClickHouseDriver")

  /** A configured writer; caller invokes `.save()` (kept separate so
    * construction is testable without a live database). */
  def writer(df: DataFrame, opts: Map[String, String],
             repartitionTo: Option[Int] = None): DataFrameWriter[Row] = {
    val base = repartitionTo
      .orElse(opts.get("numPartitions").map(_.toInt))
      .map(n => if (df.rdd.getNumPartitions > n) df.coalesce(n) else df)
      .getOrElse(df)
    base.write.format("jdbc").options(opts).mode("append")
  }
}
