package graft

import org.apache.spark.sql.functions._
import graft.sinks.JdbcSink
import graft.streaming.CdcStream

/** SURVEY §2.I1/H4 executed against a REAL database: the Spark jars
  * ship embedded Derby (/opt/spark/jars/derby*.jar — the Hive
  * metastore's store), so `writer(...).save()` and the streaming
  * foreachBatch sink can land rows in an actual JDBC endpoint and read
  * them back, closing the one seam the reference's whole purpose runs
  * through (03-bulk-import.py:200-260 — batched inserts into an OLAP
  * store). ClickHouse itself isn't in the sandbox; the JDBC surface
  * (driver class, batched appends, connection bound, append-mode table
  * creation) is identical — only the url/driver options differ.
  */
class JdbcRoundTripSpec extends SparkSpec {

  // keep derby.log out of the repo; memory: databases live per-JVM
  System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))

  private val derbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def derbyOpts(table: String): Map[String, String] =
    JdbcSink.options("jdbc:derby:memory:graftdb;create=true", table,
      "app", "app", batchSize = 500, numPartitions = 2, driver = derbyDriver)

  test("jdbc sink executes a real write and reads it back (Derby)") {
    val opts = derbyOpts("events_landed")
    val src = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    JdbcSink.writer(src, opts).save()
    val back = JdbcSink.read(spark, opts)
    assert(back.count() == src.count(), "row count survives the round trip")
    // content: every (event_id, user_id, event_type) row matches;
    // value compared rounded (DOUBLE round-trips bit-exact through
    // Derby, but keep the check tolerant of JDBC type mapping)
    val key = Seq("event_id", "user_id", "event_type")
    assert(back.select(key.map(col): _*)
      .exceptAll(src.select(key.map(col): _*)).count() == 0)
    assert(src.select(key.map(col): _*)
      .exceptAll(back.select(key.map(col): _*)).count() == 0)
    val drift = back.select(col("event_id"), round(col("value"), 6).as("v"))
      .join(src.select(col("event_id"), round(col("value"), 6).as("v0")), "event_id")
      .filter(col("v") =!= col("v0"))
    assert(drift.count() == 0, "payload values survive the round trip")
  }

  test("append mode accumulates batches like the reference's bulk loader") {
    val opts = derbyOpts("append_acc")
    val batch = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("event_type")).limit(100)
    JdbcSink.writer(batch, opts).save()
    JdbcSink.writer(batch, opts).save()
    assert(JdbcSink.read(spark, opts).count() == 200)
  }

  test("streaming foreachBatch lands in a real JDBC table end-to-end") {
    val opts = derbyOpts("stream_landed")
    val stream = CdcStream.readEvents(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft_jdbc_ckpt_${System.nanoTime()}"
    // DEFAULT save — the real JdbcSink.writer(...).save() path, not an
    // injected fake: stream → micro-batches → batched JDBC appends
    CdcStream.sinkEachBatch(stream, opts, ckpt)
    val back = JdbcSink.read(spark, opts)
    val src = Tables.load(spark, sfDir, "events")
    assert(back.count() == src.count(),
      "every streamed row landed exactly once in the database")
    assert(back.select("event_id").exceptAll(src.select("event_id")).count() == 0)
  }
}
