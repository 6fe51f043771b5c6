package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Initial-load snapshot ingestion — the Spark-native form of the
  * reference's bulk import (initial-load/scripts/03-bulk-import.py):
  * every source row becomes a SNAPSHOT event record with entity id,
  * label array, and the full property map serialized as JSON in
  * `properties_after` (`properties_before` stays '{}', exactly like
  * 03-bulk-import.py:110-123).
  *
  * Unlike the reference's pandas chunk loop (driver-side, single
  * process), this is a pure column-level transform: it runs wherever
  * the scan runs, so a 100 TB snapshot bulk-load is just a distributed
  * read + write with no driver bottleneck.
  */
object Snapshot {

  /** Turn a source table into SNAPSHOT node-event records.
    *
    * @param asOf the snapshot time stamped on every record. Defaults to
    *             `current_timestamp()` for production loads; pass a
    *             fixed literal for reproducible/testable output (a
    *             non-deterministic column would break hash-compares the
    *             moment a query projects `event_timestamp`).
    */
  def fromTable(src: DataFrame, entityCol: String, labelCols: Seq[String],
                asOf: org.apache.spark.sql.Column = current_timestamp()): DataFrame = {
    val propCols = src.columns.toIndexedSeq
      .filterNot(c => c == entityCol || labelCols.contains(c))
    // NULL-safe content hash: concat_ws silently drops NULL args, which
    // would collide (a,NULL,b) with (a,b,NULL); coalesce every column
    // to a sentinel that can't appear in cast-to-string data, and
    // include the label columns so label changes produce new event ids.
    val hashed = (entityCol +: (labelCols ++ propCols)).map(c =>
      coalesce(col(c).cast("string"), lit("\u0000NULL")))
    src.select(
      // deterministic surrogate event id (reference uses uuid4; a
      // content hash keeps reruns idempotent, which uuid4 is not)
      sha2(concat_ws("|", hashed: _*), 256).as("event_id"),
      lit(graft.CdcOp.Snapshot).as("event_type"),
      asOf.as("event_timestamp"),
      col(entityCol).cast("string").as("entity_id"),
      array(labelCols.map(col): _*).as("labels"),
      lit("{}").as("properties_before"),
      to_json(struct(propCols.map(col): _*)).as("properties_after"),
      to_json(struct(lit("initial_load").as("source"))).as("metadata"))
  }

  /** CSV snapshot reader (the reference's staging/nodes CSV path):
    * explicit-schema read — no `inferSchema` (which costs a second full
    * pass over the data and can type-drift between chunks; the
    * reference's bulk import likewise validates against a known schema,
    * 03-bulk-import.py) — then the same SNAPSHOT transform.
    */
  def fromCsv(spark: org.apache.spark.sql.SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType,
              entityCol: String, labelCols: Seq[String],
              asOf: org.apache.spark.sql.Column = current_timestamp()): DataFrame =
    fromTable(
      spark.read.option("header", "true").schema(schema).csv(path),
      entityCol, labelCols, asOf)

  /** ORC snapshot reader — the other columnar format Spark reads
    * natively (an export from a Hive-era warehouse arrives as ORC as
    * often as parquet). ORC embeds its schema, so no explicit schema
    * argument is needed; the SNAPSHOT transform is identical. */
  def fromOrc(spark: org.apache.spark.sql.SparkSession, path: String,
              entityCol: String, labelCols: Seq[String],
              asOf: org.apache.spark.sql.Column = current_timestamp()): DataFrame =
    fromTable(spark.read.orc(path), entityCol, labelCols, asOf)
}
