package graft
import org.apache.spark.sql.SparkSession
/** Per-round benchmark main: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Failures are recorded
  * per-query in an "errors" object and make the process exit non-zero
  * so a regression is visible in BENCH_r*.json rather than masked by a
  * plausible wall time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: run the cheapest scan-agg once so the first timed query
    // doesn't absorb JVM/codegen/session warmup (round-over-round
    // comparability).
    try SparkEntry.queries("cdc_event_type_counts")(spark, sfDir).count()
    catch { case _: Throwable => () }
    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors ::= (name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def jq(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
