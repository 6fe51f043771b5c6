package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse `ASOF JOIN` as a Spark operator: for every left row,
  * attach the temporally nearest right row with the same key —
  * backward = newest right at-or-before the left timestamp (the
  * ClickHouse/DuckDB default `l.ts >= r.ts`), forward = earliest
  * at-or-after. The reference's CDC store answers "state of entity X
  * when event Y happened" with exactly this shape; `cdc_state_asof`
  * is the scalar-T special case, this is the per-row general form
  * (point-in-time feature joins, attribution, slowly-changing-
  * dimension lookups).
  *
  * Scale stance (100 TB): NO range join. Spark plans a `l.ts >= r.ts`
  * join condition as BroadcastNestedLoop/cartesian-per-key — O(n·m)
  * per key, the classic as-of scale killer. Instead the two sides are
  * UNIONed with a side tag, hash-partitioned by key, sorted once
  * locally by (ts, side), and the right payload rides to each left
  * row via a running `last(ignoreNulls)` over the growing frame —
  * one exchange per side, one local sort, O(n + m) per key, and the
  * running frame is evaluated incrementally (no per-row rescan).
  * Skewed keys sort locally but never multiply. The plan contains no
  * Join node at all — PlanSpec pins that.
  *
  * Tie semantics: a right row AT the left timestamp matches when
  * `inclusive` (side ordering places right rows before left rows at
  * equal ts; `strict` reverses the tag order instead of re-sorting).
  * Right rows must be unique per (key, ts) for a deterministic
  * result — pre-aggregate the right side (as the driver entry does);
  * among equal (key, ts, side) rows the running-last winner is
  * tie-broken only by sort order.
  */
object AsofJoin {

  /** Backward as-of join (newest right row at-or-before each left
    * row; `inclusive = false` makes it strictly-before).
    *
    * Output = every left column plus the right side's payload columns
    * (right minus key/ts), null where no right row qualifies — LEFT
    * OUTER as-of, like ClickHouse `ASOF LEFT JOIN`. Payload names
    * must not collide with left columns (rename before joining).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               inclusive: Boolean = true): DataFrame =
    join(left, right, keys, leftTs, rightTs, inclusive, forward = false)

  /** Forward as-of join (earliest right row at-or-after each left
    * row) — the "next event" direction. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              inclusive: Boolean = true): DataFrame =
    join(left, right, keys, leftTs, rightTs, inclusive, forward = true)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   inclusive: Boolean, forward: Boolean): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    require(payloadCols.nonEmpty, "right side carries no payload columns")
    val collide = payloadCols.toSet intersect left.columns.toSet
    require(collide.isEmpty, s"right payload collides with left columns: $collide")

    // side tag ordering encodes the tie rule: the qualifying side must
    // sort BEFORE the left row at equal ts so the running last() sees
    // it (inclusive), or AFTER so it doesn't (strict)
    val (rightTag, leftTag) = if (inclusive) (0, 1) else (2, 1)
    val pay = struct(payloadCols.map(col): _*)
    // a null right ts can never satisfy a ts inequality (ASOF-join
    // semantics) — drop it here, or nulls-first ordering would hand
    // its payload to every earlier left row
    val rightU = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTs).as("__asof_ts"),
        lit(rightTag).as("__asof_side"), pay.as("__asof_pay")): _*)
    val payType = rightU.schema("__asof_pay").dataType
    val leftU = left.select(
      col("*"), col(leftTs).as("__asof_ts"), lit(leftTag).as("__asof_side"),
      lit(null).cast(payType).as("__asof_pay"))
    // align schemas: right rows carry null for every left-only column
    val unioned = leftU.unionByName(
      rightU.select(leftU.columns.map(c =>
        if (rightU.columns.contains(c)) col(c)
        else lit(null).cast(leftU.schema(c).dataType).as(c)): _*))

    // ts order flips with direction; the side tag always sorts
    // ascending — the tag VALUES encode the tie rule (qualifying side
    // first when inclusive, left first when strict)
    val ord =
      if (forward) Seq(col("__asof_ts").desc, col("__asof_side").asc)
      else Seq(col("__asof_ts").asc, col("__asof_side").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__asof_hit", last(col("__asof_pay"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === leftTag)
    val outCols = left.columns.map(col) ++
      payloadCols.map(c => col("__asof_hit").getField(c).as(c))
    matched.select(outCols: _*)
  }
}
