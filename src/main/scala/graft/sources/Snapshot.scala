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

  /** Turn a source table into SNAPSHOT node-event records. */
  def fromTable(src: DataFrame, entityCol: String,
                labelCols: Seq[String]): DataFrame = {
    val propCols = src.columns.filterNot(c => c == entityCol || labelCols.contains(c))
    src.select(
      // deterministic surrogate event id (reference uses uuid4; a
      // content hash keeps reruns idempotent, which uuid4 is not)
      sha2(concat_ws("|", (entityCol +: propCols).map(c => col(c).cast("string")): _*), 256)
        .as("event_id"),
      lit(graft.CdcOp.Snapshot).as("event_type"),
      current_timestamp().as("event_timestamp"),
      col(entityCol).cast("string").as("entity_id"),
      array(labelCols.map(col): _*).as("labels"),
      lit("{}").as("properties_before"),
      to_json(struct(propCols.map(col): _*)).as("properties_after"),
      to_json(struct(lit("initial_load").as("source"))).as("metadata"))
  }

  /** CSV snapshot reader (the reference's staging/nodes CSV path):
    * schema'd read, then the same SNAPSHOT transform.
    */
  def fromCsv(spark: org.apache.spark.sql.SparkSession, path: String,
              entityCol: String, labelCols: Seq[String]): DataFrame =
    fromTable(
      spark.read.option("header", "true").option("inferSchema", "true").csv(path),
      entityCol, labelCols)
}
