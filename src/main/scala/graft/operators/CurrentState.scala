package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Latest-state reconstruction — the Spark-native equivalent of
  * ClickHouse ReplacingMergeTree + `OPTIMIZE TABLE ... FINAL`
  * (reference: initial-load/scripts/04-optimize-tables.sql:24-48).
  *
  * The reference keeps every CDC event and collapses to one row per
  * entity (newest version wins) at merge time. In Spark the idiomatic
  * equivalent is a hash aggregation with `max_by(struct(orderCols...),
  * struct(orderCols...))`: a single shuffle keyed on the entity id with
  * map-side partial aggregation. This deliberately avoids the
  * `row_number() over (partition by ... order by ... desc)` shape — a
  * window forces a full sort of every partition, while max_by reduces
  * each map partition to one candidate row per key before the shuffle.
  * At 100 TB the shuffle payload is ~|entities|, not ~|events|.
  */
object CurrentState {

  /** One row per `entityCol`, the row with the greatest
    * (orderCols...) tuple winning. `orderCols` must be a total order
    * (include a unique tiebreaker such as event_id).
    */
  def latest(events: DataFrame, entityCol: String, orderCols: Seq[String]): DataFrame = {
    val dataCols = events.columns.filter(_ != entityCol).toIndexedSeq
    val ord = struct(orderCols.map(col): _*)
    val payload = struct(dataCols.map(col): _*)
    events
      .groupBy(col(entityCol))
      .agg(max_by(payload, ord).as("__latest"))
      .select(col(entityCol) +: dataCols.map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** ClickHouse `LIMIT n BY key`: the newest `n` rows per entity —
    * [[latest]] generalized from 1 to n. For n = 1 prefer [[latest]]
    * (hash-agg, no sort); for small n > 1 this window shape is the
    * idiomatic scale form: one hash exchange on the entity key and a
    * LOCAL per-key sort, never a global sort, and the rank filter
    * prunes to ≤ n rows per key before anything downstream runs. The
    * collect_list-and-slice alternative buffers EVERY row of a hot key
    * in one aggregation buffer — the shape to avoid at 100 TB.
    * `orderCols` must again be a total order (unique tiebreaker) for a
    * deterministic result; rank rides along as `rankCol` (1 = newest).
    */
  def topN(events: DataFrame, entityCol: String, orderCols: Seq[String],
           n: Int, rankCol: String = "rk"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol))
      .orderBy(orderCols.map(c => col(c).desc): _*)
    events
      .withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= n)
  }

  /** latest-state minus tombstones: entities whose newest event matches
    * `isTombstone` are dropped (DELETE semantics in the reference's
    * ReplacingMergeTree + `event_type != 'DELETE'` reads).
    */
  def current(events: DataFrame, entityCol: String, orderCols: Seq[String],
              isTombstone: Column): DataFrame =
    latest(events, entityCol, orderCols).filter(!isTombstone)
}
