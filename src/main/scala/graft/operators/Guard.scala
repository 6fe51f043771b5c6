package graft.operators

import org.apache.spark.sql.DataFrame

/** Opt-in guard for the exact all-pairs baselines (D5 / E1): an
  * O(n²) nested-loop join is the *correctness reference* for the
  * LSH/IVF approximate paths, not a production operator — at 100 TB it
  * is a cluster-killer. The guard makes that explicit: inputs above
  * `maxRows` are refused with a pointer to the scalable alternative
  * unless the caller opts in with `allowAllPairs = true`.
  *
  * The size probe is `take(maxRows + 1)` over a zero-column
  * projection: `take` scans partitions incrementally (one partition,
  * then a scaled-up batch, per `spark.sql.limit.scaleUpFactor`), so
  * on an oversized input it stops after a bounded prefix rather than
  * scheduling a task on every partition. The probe is one extra small
  * job at query-construction time — apply the guard to the RAW table,
  * before expensive projections, so the probe's rows are free to
  * produce (see SimilarityQueries.guardCorpus).
  */
object Guard {

  def allPairsBaseline(df: DataFrame, maxRows: Long, allow: Boolean,
                       op: String, alternative: String): DataFrame = {
    if (!allow) {
      val cap = math.min(maxRows, Int.MaxValue - 1L).toInt
      // zero-column projection: column pruning strips every upstream
      // expression, so the probe counts rows without per-row work
      val probed = df.select().take(cap + 1).length
      require(probed <= cap,
        s"$op is an exact all-pairs (O(n^2)) baseline and its input exceeds " +
          s"$maxRows rows. Use $alternative at scale, or pass " +
          "allowAllPairs = true to run the exact baseline anyway.")
    }
    df
  }
}
