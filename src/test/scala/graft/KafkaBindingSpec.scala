package graft

import org.apache.spark.sql.functions._
import graft.streaming.CdcStream

/** SURVEY §2.I4 — the Kafka production binding for the CDC stream.
  * No broker (or connector jar) exists in the sandbox, so the binding
  * is proven in two halves that meet at the wire format: (1) the
  * option builder mirrors the reference's Kafka-engine settings
  * (01-init-tables.sql:40-61) and constructs a format("kafka") reader;
  * (2) the binary `value` → raw string → CdcJson parse decode path —
  * the part that actually touches bytes — runs against synthesized
  * wire payloads and must equal parsing the original strings.
  */
class KafkaBindingSpec extends SparkSpec {

  test("kafka source options mirror the reference's consumer settings") {
    val o = CdcStream.kafkaSourceOptions("kafka:9092", "neo4j-cdc-nodes",
      "clickhouse_nodes_consumer")
    assert(o("kafka.bootstrap.servers") == "kafka:9092")
    assert(o("subscribe") == "neo4j-cdc-nodes")
    assert(o("kafka.group.id") == "clickhouse_nodes_consumer")
    assert(o("startingOffsets") == "earliest")
    // kafka_max_block_size analog: bounded catch-up batches
    assert(o("maxOffsetsPerTrigger") == "1048576")
    // errors.tolerance=all analog: aged-out offsets don't kill the job
    assert(o("failOnDataLoss") == "false")
  }

  test("readKafka constructs a format(kafka) reader without the jar") {
    val r = CdcStream.readKafka(spark, "kafka:9092", "neo4j-cdc-relationships",
      "clickhouse_relationships_consumer", startingOffsets = "latest")
    assert(r != null) // .load() needs the connector jar (cluster-only)
  }

  test("kafka wire decode: binary value -> raw -> parse == direct parse") {
    val raw = graft.sources.CdcJson
      .synthesizeNodeJson(Tables.load(spark, sfDir, "events"))
    // what the Kafka source would deliver: value as UTF-8 bytes
    val wire = raw.select(encode(col("raw"), "UTF-8").as("value"))
    val viaKafka = graft.sources.CdcJson.parseNodes(
      CdcStream.fromKafkaValue(wire), "raw")
    val direct = graft.sources.CdcJson.parseNodes(raw, "raw")
    assert(viaKafka.count() == direct.count())
    assert(viaKafka.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaKafka).count() == 0)
  }
}
