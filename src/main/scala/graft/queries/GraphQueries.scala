package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY §2.B — graph-shaped analytics: the reference's node ⋈
  * relationship queries (04-optimize-tables.sql:205-218 "complex
  * join", README.md device→interface example), on customer/orders/
  * lineitem as node/edge tables (edges carry FK source ids, exactly
  * like relationships_cdc.source_id/target_id).
  */
object GraphQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // B1: out-degree per node — edge list grouped by source id. One
    // hash-agg shuffle on the edge key; no node-table scan needed.
    "graph_degree" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey").as("node_id"))
        .agg(count(lit(1)).as("out_degree"),
             round(sum(col("o_totalprice")), 4).as("weight"))
        .orderBy("node_id")),

    // B2: node ⋈ edges with property projection — the reference's
    // "device name + interface count" join. The node table scales with
    // the graph, so no broadcast hint: AQE broadcasts while it fits
    // and shuffle-joins on the key beyond that.
    "graph_node_join" -> ((s, dir) => {
      val nodes = Tables.load(s, dir, "customer")
      val edges = Tables.load(s, dir, "orders")
      edges.join(nodes, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey").as("node_id"))
        .agg(max(col("c_name")).as("node_name"),
             count(col("o_orderkey")).as("edge_count"))
        .orderBy("node_id")
    }),

    // B3: two-hop traversal — node → edge → edge (device → interface →
    // port analog). Aggregate the inner hop FIRST (lineitem count per
    // order), then join: the big table is reduced before it meets the
    // second join, so the heavy shuffle is one agg, not a 3-way row
    // explosion.
    "graph_two_hop" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val hop2 = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n2"))
      orders.join(hop2, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("node_id"))
        .agg(sum(col("n2")).as("two_hop_edges"))
        .orderBy("node_id")
    }),

    // B4: arrayJoin(labels) analog — explode a label array and count
    // (04-optimize-tables.sql:152-160 "nodes by label").
    "graph_label_counts" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(explode(array(
          col("event_type"),
          concat(lit("u"), (col("user_id") % 10).cast("string")))).as("label"))
        .groupBy("label").agg(count(lit(1)).as("cnt"))
        .orderBy("label")),

    // B5: per-label storage footprint — the reference's "nodes by
    // label" statistics with sum(length(properties_after))
    // (04-optimize-tables.sql:146-165). BYTE length (octet_length),
    // not character length: the reference's ClickHouse length() counts
    // bytes, and a storage-footprint stat that counted characters
    // would under-report non-ASCII payloads (ADVICE r3; the oracle
    // measures octets too). Top-20 by count with a deterministic
    // tie-break; the top-k is a TakeOrderedAndProject over the tiny
    // label rollup, not a global sort of events.
    "graph_label_storage" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(explode(array(
          col("event_type"),
          concat(lit("u"), (col("user_id") % 10).cast("string")))).as("label"),
          col("props"))
        .groupBy("label")
        .agg(count(lit(1)).as("cnt"),
             sum(octet_length(col("props"))).cast("long").as("props_bytes"))
        .orderBy(col("cnt").desc, col("label"))
        .limit(20)),

    // B6: referential-integrity check — edges whose endpoint node is
    // missing (the reference's source-vs-sink consistency validation
    // theme, README.md:318-331, applied to the graph: a CDC pipeline
    // that drops node events produces exactly these orphans). One left
    // join per relation against the distinct node-key set + a count
    // aggregate: at 100 TB the node side is the distinct key column
    // only (AQE broadcasts it while it fits, shuffle-joins beyond),
    // and the verdict is two rows, never a row-level materialization.
    "graph_integrity" -> ((s, dir) => {
      def integ(rel: String, edges: org.apache.spark.sql.DataFrame,
                key: String, nodes: org.apache.spark.sql.DataFrame,
                nodeKey: String) =
        edges.select(col(key).as("k"))
          .join(nodes.select(col(nodeKey).as("nk")).distinct(),
            col("k") === col("nk"), "left")
          .agg(count(lit(1)).as("n_edges"),
               count(when(col("nk").isNull, lit(1))).as("n_orphans"))
          .select(lit(rel).as("relation"), col("n_edges"), col("n_orphans"))
      integ("lineitem_orders", Tables.load(s, dir, "lineitem"),
          "l_orderkey", Tables.load(s, dir, "orders"), "o_orderkey")
        .unionByName(
          integ("orders_customer", Tables.load(s, dir, "orders"),
            "o_custkey", Tables.load(s, dir, "customer"), "c_custkey"))
        .orderBy("relation")
    })
  )

  val oracles: Map[String, String] = Map(
    "graph_degree" ->
      """SELECT o_custkey AS node_id, count(*) AS out_degree, round(sum(o_totalprice), 4) AS weight
         FROM orders GROUP BY o_custkey ORDER BY node_id""",
    "graph_node_join" ->
      """SELECT c_custkey AS node_id, max(c_name) AS node_name, count(o_orderkey) AS edge_count
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY node_id""",
    "graph_two_hop" ->
      """SELECT o_custkey AS node_id, count(*) AS two_hop_edges
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY o_custkey ORDER BY node_id""",
    "graph_label_counts" ->
      """SELECT label, count(*) AS cnt FROM (
           SELECT unnest([event_type, 'u' || CAST(user_id % 10 AS VARCHAR)]) AS label FROM events)
         GROUP BY label ORDER BY label""",
    "graph_label_storage" ->
      """SELECT label, count(*) AS cnt,
                CAST(sum(octet_length(encode(props))) AS BIGINT) AS props_bytes
         FROM (SELECT unnest([event_type, 'u' || CAST(user_id % 10 AS VARCHAR)]) AS label, props
               FROM events)
         GROUP BY label ORDER BY cnt DESC, label LIMIT 20""",
    "graph_integrity" ->
      """SELECT * FROM (
           SELECT 'lineitem_orders' AS relation, count(*) AS n_edges,
                  count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS n_orphans
           FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l.l_orderkey = o.o_orderkey
           UNION ALL
           SELECT 'orders_customer' AS relation, count(*) AS n_edges,
                  count(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS n_orphans
           FROM orders r LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON r.o_custkey = c.c_custkey)
         ORDER BY relation"""
  )
}
