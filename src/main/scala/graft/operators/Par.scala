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
    // df.rdd here is a deliberate partition-count probe: it plans the
    // input physically (no job runs — RDDs are lazy) so already-wide
    // inputs skip the exchange entirely. The planning cost is paid
    // once per query build and only on the operators that opt in.
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
