package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism widening for CPU-bound per-row operators (shingling,
  * signature computation, vector math). A small parquet file scans as
  * a single partition, which would serialize the expensive map work on
  * one core; at cluster scale inputs already carry many partitions and
  * this is a no-op (we never *reduce* partitioning). The round-robin
  * exchange this inserts is cheap relative to the per-row work it
  * parallelizes — it shuffles input rows once, before any fan-out.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
