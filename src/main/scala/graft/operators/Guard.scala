package graft.operators

import org.apache.spark.sql.DataFrame

/** Opt-in guard for the exact all-pairs baselines (D5 / E1): an
  * O(n²) nested-loop join is the *correctness reference* for the
  * LSH/IVF approximate paths, not a production operator — at 100 TB it
  * is a cluster-killer. The guard makes that explicit: inputs above
  * `maxRows` are refused with a pointer to the scalable alternative
  * unless the caller opts in with `allowAllPairs = true`.
  *
  * The size probe is a distributed `limit(maxRows + 1).count()` over
  * a zero-column projection: the per-partition LocalLimit caps each
  * task at maxRows+1 rows, so the probe's work is bounded per
  * partition and NOTHING is collected to the driver (a `take` of
  * maxRows+1 rows would materialize that many Row objects driver-side
  * — an OOM for a caller passing a large threshold). One extra small
  * job at query-construction time — apply the guard to the RAW
  * table, before expensive projections, so the probe's rows are free
  * to produce (see SimilarityQueries.guardCorpus).
  */
object Guard {

  /** Environment opt-in for the exact baselines: a benchmark run on a
    * corpus past the default cap sets `SPARK_GRAFT_ALLOW_ALLPAIRS=true`
    * (or raises `SPARK_GRAFT_ALLPAIRS_MAXROWS`) instead of editing
    * query-pack code — the operator-level `allowAllPairs` flag wasn't
    * reachable from driver entries (ADVICE r3). */
  def envAllow: Boolean =
    sys.env.get("SPARK_GRAFT_ALLOW_ALLPAIRS").exists(_.equalsIgnoreCase("true"))

  def envMaxRows(default: Long = 100000L): Long =
    sys.env.get("SPARK_GRAFT_ALLPAIRS_MAXROWS").map { raw =>
      // name the setting in the failure: a bare NumberFormatException
      // ("for input string: \"100k\"") tells the operator nothing
      // about WHICH knob is malformed and kills the whole run
      try raw.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_ALLPAIRS_MAXROWS must be a plain long, got '$raw'")
      }
    }.getOrElse(default)

  def allPairsBaseline(df: DataFrame, maxRows: Long, allow: Boolean,
                       op: String, alternative: String): DataFrame = {
    if (!allow) {
      // limit() takes an Int, so thresholds above ~2.1B clamp to the
      // Int ceiling — the refusal message reports the EFFECTIVE bound
      // so a caller with a larger maxRows is not told their own limit
      // was exceeded when it wasn't probed that far.
      val cap = math.min(maxRows, Int.MaxValue - 1L).toInt
      // zero-column projection: column pruning strips every upstream
      // expression, so the probe counts rows without per-row work
      val probed = df.select().limit(cap + 1).count()
      require(probed <= cap,
        s"$op is an exact all-pairs (O(n^2)) baseline and its input exceeds " +
          s"$cap rows" +
          (if (cap < maxRows) s" (maxRows=$maxRows clamped to the Int limit)"
           else "") +
          s". Use $alternative at scale, or pass " +
          "allowAllPairs = true to run the exact baseline anyway.")
    }
    df
  }
}
