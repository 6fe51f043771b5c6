package graft.operators

import org.apache.spark.sql.DataFrame

/** Opt-in guard for the exact all-pairs baselines (D5 / E1): an
  * O(n²) nested-loop join is the *correctness reference* for the
  * LSH/IVF approximate paths, not a production operator — at 100 TB it
  * is a cluster-killer. The guard makes that explicit: inputs above
  * `maxRows` are refused with a pointer to the scalable alternative
  * unless the caller opts in with `allowAllPairs = true`.
  *
  * The size probe is `limit(maxRows + 1).count()` — an early-stopping
  * scan that reads at most one partition past the threshold, never the
  * full input, so the guard itself costs O(maxRows) even on a
  * petabyte table.
  */
object Guard {

  def allPairsBaseline(df: DataFrame, maxRows: Long, allow: Boolean,
                       op: String, alternative: String): DataFrame = {
    if (!allow) {
      val cap = math.min(maxRows, Int.MaxValue - 1L).toInt
      // probe a zero-column projection: column pruning strips every
      // upstream expression (e.g. E4's quantize/dequantize chain), so
      // the probe counts rows without paying the input's per-row work
      val probed = df.select().limit(cap + 1).count()
      require(probed <= cap,
        s"$op is an exact all-pairs (O(n^2)) baseline and its input exceeds " +
          s"$maxRows rows. Use $alternative at scale, or pass " +
          "allowAllPairs = true to run the exact baseline anyway.")
    }
    df
  }
}
