package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=a,b,c — dump only the named queries (local
    // iteration aid, mirroring Bench; the driver never sets it, so
    // round verifies still cover the full pack). oracle_sql.json is
    // filtered to match so the local checker only compares what ran.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // End-of-pass cache hygiene (VERDICT r9 #7): operators pin
    // loop-invariant relations with caller-owned cleanup, and across
    // a full pack the plan-keyed entries are deliberately REUSED
    // between entries sharing a graph (scoping the release per entry
    // would forfeit that). The pass is the owner, so it releases
    // everything once, here — zero residual cached relations.
    spark.catalog.clearCache()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Declared rows-only entries (VERDICT r7 #8): queries with no
    // oracle SQL are BY-DESIGN rows-only — each is a raw sketch/sample
    // operator whose hash-based output is not SQL-expressible, and
    // each has a paired oracle-checked `*_check` twin that verifies
    // its contract. Emit the declaration next to oracle_sql.json so a
    // correctness report can distinguish "no oracle by design, see
    // twin" from a genuinely unverified entry.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val twins = Map(
      "dedup_minhash_lsh" -> "dedup_minhash_lsh_check",
      "dedup_simhash" -> "dedup_simhash_check",
      "dedup_embedding_lsh" -> "dedup_embedding_lsh_check",
      "dedup_semantic" -> "dedup_semantic_check",
      "dedup_incremental" -> "dedup_incremental_check",
      "sim_lsh_ann" -> "sim_lsh_ann_check",
      "sim_ivf_ann" -> "sim_ivf_ann_check",
      "sim_quantized_topk" -> "sim_quantized_check",
      "sim_filtered_ann" -> "sim_filtered_ann_check",
      "sim_ivfpq" -> "sim_ivfpq_check",
      "sample_rand" -> "sample_rand_check")
    val roJson = rowsOnly.toSeq.sorted.map { k =>
      s"${q(k)}: {${q("rows_only")}: true, ${q("oracle_twin")}: ${q(twins.getOrElse(k, ""))}}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/rows_only.json"), roJson)
    spark.stop()
  }
}
