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

  /** latest-state minus tombstones: entities whose newest event matches
    * `isTombstone` are dropped (DELETE semantics in the reference's
    * ReplacingMergeTree + `event_type != 'DELETE'` reads).
    */
  def current(events: DataFrame, entityCol: String, orderCols: Seq[String],
              isTombstone: Column): DataFrame =
    latest(events, entityCol, orderCols).filter(!isTombstone)
}
