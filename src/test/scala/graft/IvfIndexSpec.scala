package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Similarity}

/** The persisted IVF index must be a faithful, prunable re-expression
  * of the in-memory IVF search: identical results for identical
  * centroids, model round-trip exactness, and a cid layout the scan
  * actually prunes on.
  */
class IvfIndexSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_ivf_index").toString

  test("search from a loaded index == in-memory ivfTopK at the same operating point") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val path = tmp()
    // pinned fit (16 centroids, 10% sample) — the deterministic sample
    // + ordered init makes the fit reproducible, so both paths hold
    // the SAME model and must return the SAME rows
    IvfIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = Some(16), fitSamplePct = Some(10))
    val loaded = IvfIndex.load(spark, path)
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    val fromDisk = IvfIndex.search(spark, loaded, queries,
      "vec_id", "embedding", k = 10, nprobe = 6)
    val inMemory = Similarity.ivfTopK(vecs, "vec_id", "embedding",
      k = 10, queryMod = 100, nCentroids = Some(16), fitSamplePct = Some(10))
    assert(fromDisk.count() > 0)
    assert(fromDisk.exceptAll(inMemory).count() == 0 &&
           inMemory.exceptAll(fromDisk).count() == 0,
      "disk-backed search diverged from the in-memory IVF result")
  }

  test("model round-trips exactly; a cid predicate prunes the assignment scan") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val path = tmp()
    val built = IvfIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = Some(8), fitSamplePct = Some(100))
    val loaded = IvfIndex.load(spark, path)
    assert(built.centroids.length == loaded.centroids.length)
    assert(built.centroids.zip(loaded.centroids)
      .forall { case (a, b) => a.sameElements(b) },
      "centroid model changed across the parquet round trip")
    // the layout claim: a probe filter must reach the scan as a
    // PARTITION filter (directory pruning), not a post-scan predicate
    val plan = spark.read.parquet(s"$path/assignments")
      .filter(col("cid") === 3)
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"cid filter did not prune partitions:\n$plan")
  }
}
