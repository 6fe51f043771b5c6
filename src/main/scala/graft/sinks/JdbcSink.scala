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

  /** ClickHouse-flavored defaults; pure and unit-testable. The driver
    * class is a parameter so the same sink lands in any JDBC endpoint
    * (the round-trip spec runs it against embedded Derby). */
  def options(url: String, table: String, user: String, password: String,
              batchSize: Int = 100000, numPartitions: Int = 16,
              truncate: Boolean = false,
              driver: String = "com.clickhouse.jdbc.ClickHouseDriver")
      : Map[String, String] = {
    // engage the ClickHouse type/DDL dialect for clickhouse URLs —
    // without it Spark's generic dialect emits ANSI DDL (TEXT,
    // NOT NULL suffixes) that ClickHouse rejects (VERDICT r4 #2)
    if (ClickHouseDialect.canHandle(url)) ClickHouseDialect.register()
    Map(
    "url" -> url,
    "dbtable" -> table,
    "user" -> user,
    "password" -> password,
    "batchsize" -> batchSize.toString,
    "numPartitions" -> numPartitions.toString,
    "truncate" -> truncate.toString,
    "isolationLevel" -> "NONE",
    "rewriteBatchedStatements" -> "true",
    "driver" -> driver)
  }

  /** A configured writer; caller invokes `.save()` (kept separate so
    * construction is testable without a live database). `coalesce`
    * never *increases* a partition count, so applying it
    * unconditionally caps connections at the bound while leaving
    * narrower inputs untouched — no partition-count probe needed. */
  def writer(df: DataFrame, opts: Map[String, String],
             repartitionTo: Option[Int] = None): DataFrameWriter[Row] = {
    val base = repartitionTo
      .orElse(opts.get("numPartitions").map(_.toInt))
      .map(df.coalesce)
      .getOrElse(df)
    base.write.format("jdbc").options(opts).mode("append")
  }

  /** Read a table back through the same option set (the verification
    * side of a round trip; also the migration path's reverse
    * direction — reference 03-bulk-import.py reads Neo4j, writes
    * ClickHouse; a Spark pipeline can do either direction). */
  def read(spark: org.apache.spark.sql.SparkSession,
           opts: Map[String, String]): DataFrame =
    spark.read.format("jdbc").options(opts).load()
}
