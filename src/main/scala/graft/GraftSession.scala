package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session builder: the configuration graft's operators
  * are designed against, in one place. Callers may override anything
  * afterwards; an existing session can be upgraded with
  * [[GraftExtensions.register]].
  */
object GraftSession {

  /** Conf every graft deployment wants, cluster or local. */
  val recommendedConf: Map[String, String] = Map(
    // AQE owns runtime join strategy + skew splitting; graft never
    // force-broadcasts dataset-scaled tables (see docs/SCALE.md)
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    // some testdata generations (and Neo4j-exported parquet) carry
    // TIMESTAMP(NANOS); Spark has no nanos type, so those columns read
    // as long and Tables.normalizeEventTime converts (harmless when
    // the data is plain micros timestamp)
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // CDC timestamps are wall-clock UTC end to end
    "spark.sql.session.timeZone" -> "UTC")

  /** Build a session: recommended conf + native SQL functions
    * registered. `shufflePartitions` should track cluster cores (it
    * is a starting point — AQE coalesces down at runtime). */
  def create(master: String, shufflePartitions: Int,
             appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .withExtensions(new GraftExtensions)
    recommendedConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    // getOrCreate may have returned a pre-existing session (where
    // withExtensions does not apply) — registration is idempotent
    GraftExtensions.register(spark)
    spark
  }
}
