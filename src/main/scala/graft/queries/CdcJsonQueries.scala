package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.CdcJson

/** SURVEY §2.A (raw payload path) — the reference's core ingest
  * operator: raw CDC JSON envelope → typed event rows, exercised
  * end-to-end by synthesizing the connector wire format from the base
  * tables and parsing it back. The oracle computes the expected typed
  * output directly from the base table, so the check validates the
  * whole serialize→parse→type pipeline semantically.
  */
object CdcJsonQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // node events: the nodes_kafka_mv logic (op multiIf, timestamp
    // parse, label array, property blob extraction).
    // all three entries widen the base table BEFORE synthesize: the
    // wire round-trip is 2-3 full JSON passes per row, and the small-
    // file parquet input plans as one partition — the widen exchange
    // moves the cheap base rows once so every JSON pass runs at full
    // parallelism (the real ingest gets this for free from Kafka's
    // partitioning).
    "cdc_json_parse" -> ((s, dir) => {
      val parsed = CdcJson.parseNodes(
        CdcJson.synthesizeNodeJson(
          graft.operators.Par.widen(Tables.load(s, dir, "events"))), "raw")
      parsed.select(
        col("event_id"),
        col("event_type").as("op"),
        col("entity_id"),
        col("labels")(1).as("label1"),
        unix_micros(col("event_timestamp")).as("ts_us"),
        get_json_object(col("properties_after"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id").cast("long"))
    }),

    // dead-letter path: corrupt a deterministic subset of the wire
    // payloads (truncation — the classic partial-message failure),
    // parse PERMISSIVEly, and classify. The valid/invalid split is
    // what a production ingest routes to the typed table vs the
    // replay queue; counts are oracle-checked against the corruption
    // rule applied to the base table.
    "cdc_json_dead_letter" -> ((s, dir) => {
      // the corruption rule keys on the passed-through base column,
      // not get_json_object($.id) — selecting via the wire payload
      // re-parsed every row's JSON right after serializing it
      val raw = CdcJson.synthesizeNodeJson(
          graft.operators.Par.widen(Tables.load(s, dir, "events")),
          keep = Seq("event_id"))
        .withColumn("raw",
          when(col("event_id") % 10 === 0,
               substring(col("raw"), 1, 25)).otherwise(col("raw")))
        .drop("event_id")
      val classified = CdcJson.withValidity(CdcJson.parseNodes(raw, "raw"))
      classified.groupBy("is_valid", "error_reason")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("is_valid")
    }),

    // relationship events: relationships_kafka_mv (type + start/end
    // elementId extraction), rolled up per source node — the
    // "edges per device" consistency check shape. Runs the HOT-PATH
    // projection (per-field get_json_object), not the typed
    // parseRels: the rollup consumes 3 envelope paths, and the typed
    // parse's per-row safe-parse machinery costs ~7x the extraction
    // (measured at 100x — see CdcJson.hotFields). parseRels'
    // full-envelope cost stays benched via cdc_json_parse (nodes) and
    // the streaming ingest entries; CdcJsonSpec pins hot-path ==
    // parseRels field equivalence so the fast plan cannot drift.
    "cdc_json_rel_parse" -> ((s, dir) => {
      val hot = CdcJson.relEdgeHotFields(
        CdcJson.synthesizeRelJson(
          graft.operators.Par.widen(Tables.load(s, dir, "orders"))), "raw")
      // group by (source, type), not source with max(type): a string
      // max can't hash-aggregate (immutable agg buffer -> the whole
      // rollup degrades to sort-based partials), while the composite
      // key keeps the one heavy pass a pure HashAggregate; per
      // (source, type) is also the honest grain for an edge
      // consistency check (a multi-type source gets one row per type)
      hot
        .groupBy(col("source_id"), col("relationship_type"))
        .agg(
          count(lit(1)).as("n_edges"),
          round(sum(col("totalprice").cast("double")), 4).as("total"))
        .select(col("source_id"), col("n_edges"),
          col("relationship_type").as("rel_type"), col("total"))
        .orderBy("source_id", "rel_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "cdc_json_parse" ->
      """SELECT CAST(event_id AS VARCHAR) AS event_id,
                CASE WHEN event_type = 'signup' THEN 'INSERT'
                     WHEN event_type IN ('click','view','purchase') THEN 'UPDATE'
                     ELSE 'DELETE' END AS op,
                CAST(user_id AS VARCHAR) AS entity_id,
                event_type AS label1,
                epoch_us(ts) AS ts_us,
                TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
         FROM events ORDER BY CAST(event_id AS BIGINT)""",
    "cdc_json_dead_letter" ->
      """SELECT event_id % 10 <> 0 AS is_valid,
                CASE WHEN event_id % 10 = 0 THEN 'unparseable' END AS error_reason,
                count(*) AS cnt
         FROM events GROUP BY 1, 2 ORDER BY is_valid""",
    "cdc_json_rel_parse" ->
      """SELECT CAST(o_custkey AS VARCHAR) AS source_id,
                count(*) AS n_edges,
                'ORDERED' AS rel_type,
                round(sum(o_totalprice), 4) AS total
         FROM orders GROUP BY o_custkey ORDER BY source_id, rel_type"""
  )
}
