package graft

import java.sql.Timestamp

/** Core data model, mirroring the reference's ClickHouse schemas
  * (reference: clickhouse/init/01-init-tables.sql:8-37) re-expressed as
  * Spark case classes with Encoders.
  *
  * The reference stores graph CDC events in two MergeTree tables:
  * `nodes_cdc` and `relationships_cdc`, each carrying an event id, an
  * INSERT/UPDATE/DELETE enum, a millisecond timestamp, the entity id,
  * and JSON property blobs (before/after). We keep the same logical
  * shape; Spark's columnar parquet + Tungsten takes the role of
  * MergeTree's column store.
  */
object CdcOp {
  val Insert = "INSERT"
  val Update = "UPDATE"
  val Delete = "DELETE"
  val Snapshot = "SNAPSHOT" // initial-load rows (03-bulk-import.py:112)
}

/** A node CDC event (reference: 01-init-tables.sql:8-20). */
final case class NodeEvent(
    event_id: String,
    event_type: String, // CdcOp value
    event_timestamp: Timestamp,
    entity_id: String,
    labels: Seq[String],
    properties_before: String, // JSON
    properties_after: String,  // JSON
    metadata: String)          // JSON

/** A relationship CDC event (reference: 01-init-tables.sql:23-37). */
final case class RelationshipEvent(
    event_id: String,
    event_type: String,
    event_timestamp: Timestamp,
    entity_id: String,
    relationship_type: String,
    source_id: String,
    target_id: String,
    properties_before: String,
    properties_after: String,
    metadata: String)
