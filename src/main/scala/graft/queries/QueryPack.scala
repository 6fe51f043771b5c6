package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One family of operators from SURVEY.md §2: named queries plus their
  * DuckDB oracle SQL (same column names/ordering — the driver hash-
  * compares after sorting columns by name). Queries without an oracle
  * entry get the driver's weaker rows-only check.
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]

  /** Entries that embed their own exact baseline — verification cost,
    * not operator cost, for the bench's op/check split. `_check`-
    * suffixed names are classified implicitly; declare here only the
    * suffix-less ones, NEXT TO their definitions, so a new embedded-
    * baseline entry can't silently pollute the operator trendline. */
  def checks: Set[String] = Set.empty

  /** Entries whose timed path runs the Structured Streaming engine
    * (readStream → AvailableNow → sink) — their per-run cost is
    * dominated by ~1 s of engine startup, not plan execution, so the
    * bench reports them as `stream_secs` apart from operator time.
    * Declared next to the definitions, like [[checks]]. */
  def streams: Set[String] = Set.empty
}
