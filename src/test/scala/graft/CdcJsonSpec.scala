package graft

import org.apache.spark.sql.functions._
import graft.sources.CdcJson

/** Round-trip invariants for the raw CDC JSON envelope parse —
  * synthesize the connector wire format, parse it back, and the typed
  * rows must recover the source facts (the oracle does the same check
  * hash-exactly; these specs document the semantics unit-by-unit).
  */
class CdcJsonSpec extends SparkSpec {
  import spark.implicits._

  test("node parse recovers op mapping, entity, labels, properties") {
    val events = Tables.load(spark, sfDir, "events")
    val parsed = CdcJson.parseNodes(CdcJson.synthesizeNodeJson(events), "raw")
    val byOp = parsed.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = events.withColumn("op",
      when(col("event_type") === "signup", "INSERT")
        .when(col("event_type").isin("click", "view", "purchase"), "UPDATE")
        .otherwise("DELETE"))
      .groupBy("op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp == want)
    assert(parsed.filter(col("labels")(0) =!= "User").count() == 0)
    assert(parsed.filter(col("properties_before") =!= "{}").count() == 0)
  }

  test("malformed and unknown-op payloads degrade like the reference MV") {
    val raw = Seq(
      """{"id":"1","metadata":{"txStartTime":{"TZDT":"2026-01-02T03:04:05.000000Z"}},"event":{"operation":"NONSENSE","elementId":"e1"}}""",
      """not json at all""").toDF("raw")
    val parsed = CdcJson.parseNodes(raw, "raw").collect()
    // unknown op -> INSERT default (the multiIf else-branch)
    assert(parsed(0).getAs[String]("event_type") == CdcOp.Insert)
    assert(parsed(0).getAs[String]("entity_id") == "e1")
    // unparseable json -> null fields, default op, empty blobs (row is
    // preserved for dead-lettering, not dropped)
    assert(parsed(1).getAs[String]("event_id") == null)
    assert(parsed(1).getAs[String]("properties_after") == "{}")
  }

  test("relationship parse recovers source/target/type as typed events") {
    val orders = Tables.load(spark, sfDir, "orders").limit(100)
    val rels = CdcJson.parseRelsTyped(CdcJson.synthesizeRelJson(orders), "raw")
    val sample = rels.head(5)
    assert(sample.forall(_.relationship_type == "ORDERED"))
    assert(sample.forall(r => r.source_id.nonEmpty && r.target_id.nonEmpty))
    assert(rels.count() == 100)
    // every (source,target) edge matches an orders row
    val back = rels.toDF().select(
      col("source_id").cast("long").as("c"), col("target_id").cast("long").as("o"))
    val src = orders.select(col("o_custkey").as("c"), col("o_orderkey").as("o"))
    assert(back.exceptAll(src).count() == 0)
  }

  test("hot-path field extraction is equivalent to the typed parse") {
    // the fast plan cdc_json_rel_parse runs must agree field-for-field
    // with parseRels on every row, or the rollup silently drifts from
    // the typed contract
    val raw = CdcJson.synthesizeRelJson(Tables.load(spark, sfDir, "orders"))
    val hot = CdcJson.relEdgeHotFields(raw, "raw")
    val typed = CdcJson.parseRels(raw, "raw").select(
      col("source_id"), col("relationship_type"),
      get_json_object(col("properties_after"), "$.totalprice").as("totalprice"))
    assert(hot.exceptAll(typed).count() == 0)
    assert(typed.exceptAll(hot).count() == 0)
    assert(hot.filter(col("source_id").isNull || col("totalprice").isNull)
      .count() == 0)
  }

  test("node parse produces typed NodeEvent datasets") {
    val events = Tables.load(spark, sfDir, "events").limit(10)
    val typed = CdcJson.parseNodesTyped(CdcJson.synthesizeNodeJson(events), "raw")
    val e = typed.head()
    assert(e.labels.head == "User")
    assert(e.event_timestamp != null)
  }
}
