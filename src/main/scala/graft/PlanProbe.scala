package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val pairs = graft.operators.Sketches.minhashLsh(docs, "doc_id", "text")
    val plan = pairs.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    val exch = "Exchange".r.findAllIn(plan).length
    val reused = "ReusedExchange".r.findAllIn(plan).length
    println(s"[probe] scans=$scans exchanges=$exch reused=$reused")
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan parquet") || l.contains("HashAggregate")).mkString("\n"))
    spark.stop()
  }
}
