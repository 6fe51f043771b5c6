package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one two-pass hot-key cap shared by every posting-list/bucket
  * operator (Jaccard df cap, MinHash/SimHash band buckets, LSH vector
  * buckets): count rows per key FIRST (pure long hash-agg, map-side
  * partials, constant per-key state), drop keys over the cap, then
  * semi-join the stream against survivors — so no downstream
  * aggregation buffer or in-bucket self-join ever sees an uncapped hot
  * key. Collect-then-filter bounds only fan-out, not the aggregation
  * BUFFER: one stop-shingle/degenerate bucket at 10⁸ rows is an ~GB
  * single-key buffer → executor OOM (VERDICT r3 finding #1). Both
  * branches shuffle the input on the same keys, so the exchange is
  * computed once and reused where the planner can prove it.
  */
object Skew {

  def capHotKeys(rows: DataFrame, maxPerKey: Long,
                 keyCols: Seq[String]): DataFrame = {
    val kept = rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("graft_key_n"))
      .filter(col("graft_key_n") <= maxPerKey)
      .select(keyCols.map(col): _*)
    rows.join(kept, keyCols, "left_semi")
  }
}
