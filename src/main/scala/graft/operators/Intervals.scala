package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse `intervalLengthSum` analog: per key, the total length of
  * the UNION of [start, end) intervals — overlaps counted once. The
  * "active time per entity" monitoring question (sessions, locks,
  * incident windows) that a plain sum(end − start) double-counts.
  *
  * Classic sweep, expressed relationally so Catalyst plans it as ONE
  * shuffle on the key + a per-key window sort (no UDF, no iteration):
  * order intervals by start; an interval's NEW contribution is the
  * part past the running max of all previous ends
  * (`greatest(end, runMax) − greatest(start, runMax)`, floored at 0 —
  * fully-swallowed intervals contribute nothing); sum per key. At
  * 100 TB the window sorts each entity's intervals only (same
  * per-entity contract as sessionize/funnel), and the time-range
  * predicate on the scan bounds the history a partition-pruned layout
  * reads.
  */
object Intervals {

  /** Per-key union length of [startCol, endCol) (both numeric, same
    * unit — the result is in that unit). Zero/negative-length
    * intervals contribute nothing. Output: keyCols :+ `covered`. */
  def coverage(df: DataFrame, keyCols: Seq[String], startCol: String,
               endCol: String, as: String = "covered"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__run_end", max(col(endCol)).over(w))
      .withColumn("__contrib",
        greatest(
          col(endCol) - greatest(col(startCol),
            coalesce(col("__run_end"), col(startCol))),
          lit(0L)))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__contrib")).cast("long").as(as))
  }
}
