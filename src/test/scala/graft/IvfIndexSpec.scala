package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Similarity}

/** The persisted IVF index must be a faithful, prunable re-expression
  * of the in-memory IVF search: identical results for the SAME model
  * (a refit's avg() is not bitwise-reproducible, so both sides share
  * the loaded centroids), model round-trip exactness, and a cid
  * layout the scan actually prunes on.
  */
class IvfIndexSpec extends SparkSpec {

  // test-built indexes are full corpus copies: track and delete them
  // in afterAll (they sit outside the graft_staging_ prefix the
  // crash-recovery sweep prunes, so leaking them accumulates a corpus
  // per run — ADVICE r4)
  private val builtDirs = scala.collection.mutable.ArrayBuffer.empty[String]

  private def tmp(): String = {
    val p = Files.createTempDirectory("graft_ivf_index").toString
    builtDirs.synchronized { builtDirs += p }
    p
  }

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    builtDirs.foreach(p => rm(new java.io.File(p)))
    super.afterAll()
  }

  test("search from a loaded index == in-memory search on the same model") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val path = tmp()
    IvfIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = Some(16), fitSamplePct = Some(10))
    val loaded = IvfIndex.load(spark, path)
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    val fromDisk = IvfIndex.search(spark, loaded, queries,
      "vec_id", "embedding", k = 10, nprobe = Some(6))
    val inMemory = IvfIndex.searchInMemory(loaded, vecs, queries,
      "vec_id", "embedding", k = 10, nprobe = Some(6))
    assert(fromDisk.count() > 0)
    assert(fromDisk.exceptAll(inMemory).count() == 0 &&
           inMemory.exceptAll(fromDisk).count() == 0,
      "disk-backed search diverged from the in-memory result on the same model")
    // and the persisted path tracks the refit path closely: same
    // protocol, independently fitted model — identical here because
    // the fit inputs are deterministic, but asserted as recall ≥ 0.9
    // so an ulp-level centroid drift can't flake the suite
    val refit = Similarity.ivfTopK(vecs, "vec_id", "embedding",
      k = 10, queryMod = 100, nCentroids = Some(16), fitSamplePct = Some(10))
    val hits = fromDisk.select("q_id", "vec_id")
      .join(refit.select("q_id", "vec_id"), Seq("q_id", "vec_id"), "left_semi")
      .count()
    assert(hits >= (refit.count() * 0.9).toLong,
      "disk-backed search recall vs an independent refit fell below 0.9")
  }

  test("append extends the index under the frozen model; search covers the union") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val first = vecs.filter(col("vec_id") % 2 === 0)
    val second = vecs.filter(col("vec_id") % 2 =!= 0)
    val path = tmp()
    // model fitted from the FIRST half only — the append must reuse it
    val idx = IvfIndex.build(first, "vec_id", "embedding", path,
      nCentroids = Some(16), fitSamplePct = Some(100))
    IvfIndex.append(idx, second, "vec_id", "embedding")
    val loaded = IvfIndex.load(spark, path)
    assert(idx.centroids.zip(loaded.centroids)
      .forall { case (a, b) => a.sameElements(b) },
      "append must not touch the centroid model")
    // every row is on disk exactly once, in its model-assigned cid
    val disk = spark.read.parquet(s"$path/assignments")
    assert(disk.count() == vecs.count())
    assert(disk.select("id").distinct().count() == vecs.count(),
      "append duplicated or dropped ids")
    // the zero-diff search contract holds over the UNION: disk search
    // == in-memory search over the full corpus with the same model
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    val fromDisk = IvfIndex.search(spark, loaded, queries,
      "vec_id", "embedding", k = 10, nprobe = Some(6))
    val inMemory = IvfIndex.searchInMemory(loaded, vecs, queries,
      "vec_id", "embedding", k = 10, nprobe = Some(6))
    assert(fromDisk.count() > 0)
    assert(fromDisk.exceptAll(inMemory).count() == 0 &&
           inMemory.exceptAll(fromDisk).count() == 0,
      "appended index diverged from in-memory search over the union")
  }

  test("searchThreshold with full probing equals the exact threshold cross-search") {
    import graft.functions.VectorFunctions
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val path = tmp()
    val idx = IvfIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = Some(8), fitSamplePct = Some(100))
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    // probing every centroid removes the IVF approximation entirely —
    // the result must be EXACTLY the brute-force threshold pairs
    val got = IvfIndex.searchThreshold(spark, idx, queries,
      "vec_id", "embedding", tau = 0.3, nprobe = Some(8))
    val v = vecs.select(col("vec_id"),
        VectorFunctions.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorFunctions.l2(col("v")))
    val q = v.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cos = VectorFunctions.cosinePre(
      VectorFunctions.dot(col("qv"), col("v")), col("qn"), col("nrm"))
    val exact = v.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("cosine", round(cos, 4))
      .filter(col("cosine") >= 0.3)
      .select("q_id", "vec_id", "cosine")
    assert(got.count() > 0)
    assert(got.exceptAll(exact).count() == 0 &&
           exact.exceptAll(got).count() == 0,
      "full-probe threshold search diverged from the exact cross-search")
    // partial probing returns a strict SUBSET (the documented trade) —
    // never an extra or rescored pair
    val sub = IvfIndex.searchThreshold(spark, idx, queries,
      "vec_id", "embedding", tau = 0.3, nprobe = Some(2))
    assert(sub.exceptAll(got).count() == 0,
      "partial probing produced pairs full probing lacks")
  }

  test("compact merges fragmented partitions without changing any search result") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val path = tmp()
    val idx = IvfIndex.build(vecs.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", path, nCentroids = Some(8), fitSamplePct = Some(100))
    // two appends fragment the partitions (each adds a file per cid)
    IvfIndex.append(idx, vecs.filter(col("vec_id") % 3 === 1),
      "vec_id", "embedding")
    IvfIndex.append(idx, vecs.filter(col("vec_id") % 3 === 2),
      "vec_id", "embedding")
    val before = spark.read.parquet(s"$path/assignments")
      .select("id").orderBy("id").collect().toSeq
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    val preSearch = IvfIndex.search(spark, idx, queries,
      "vec_id", "embedding", k = 10, nprobe = Some(4)).collect().toSet

    val compacted = IvfIndex.compact(spark, idx, maxFiles = 1)
    assert(compacted.nonEmpty, "three writes per cid must exceed maxFiles=1")
    // rows bit-identical, every partition now within the file bound
    val after = spark.read.parquet(s"$path/assignments")
      .select("id").orderBy("id").collect().toSeq
    assert(after == before, "compaction changed the row set")
    val fs = new org.apache.hadoop.fs.Path(s"$path/assignments")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.globStatus(new org.apache.hadoop.fs.Path(s"$path/assignments/cid=*"))
      .filter(_.isDirectory).foreach { p =>
        val files = fs.listStatus(p.getPath).count { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        assert(files <= 1, s"${p.getPath.getName} still holds $files files")
      }
    // idempotent: a second pass finds nothing to do
    assert(IvfIndex.compact(spark, idx, maxFiles = 1).isEmpty)
    val postSearch = IvfIndex.search(spark, idx, queries,
      "vec_id", "embedding", k = 10, nprobe = Some(4)).collect().toSet
    assert(postSearch == preSearch, "compaction changed search results")
  }

  test("compact rewrites >=3 fragmented partitions from one batched job") {
    // VERDICT r5 #3: the per-partition coalesce(1) loop launched one
    // Spark job per fragmented cid (k jobs at k centroids); the
    // batched rewrite must keep the job count CONSTANT in the number
    // of fragmented partitions.
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val path = tmp()
    val idx = IvfIndex.build(vecs.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", path, nCentroids = Some(8), fitSamplePct = Some(100))
    IvfIndex.append(idx, vecs.filter(col("vec_id") % 3 === 1),
      "vec_id", "embedding")
    IvfIndex.append(idx, vecs.filter(col("vec_id") % 3 === 2),
      "vec_id", "embedding")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val compacted =
      try {
        val c = IvfIndex.compact(spark, idx, maxFiles = 1)
        // listener delivery is async — settle before reading the count
        Thread.sleep(1000)
        c
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(compacted.size >= 3,
      s"expected >=3 fragmented partitions, got ${compacted.size}")
    // one staged write (AQE may split it into a couple of jobs) — but
    // NEVER one job per partition, which is what the loop shape cost
    assert(jobs.get() <= 4,
      s"compact launched ${jobs.get()} jobs for ${compacted.size} " +
        "fragmented partitions — the rewrite is not batched")
  }

  test("stats reports per-cid layout and flags exactly what compact rewrites") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val path = tmp()
    val idx = IvfIndex.build(vecs.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", path, nCentroids = Some(8), fitSamplePct = Some(100))
    IvfIndex.append(idx, vecs.filter(col("vec_id") % 3 === 1),
      "vec_id", "embedding")
    IvfIndex.append(idx, vecs.filter(col("vec_id") % 3 === 2),
      "vec_id", "embedding")
    val before = IvfIndex.stats(spark, idx, maxFiles = 1).collect()
    assert(before.map(_.getAs[Long]("rows")).sum == vecs.count(),
      "stats row accounting lost rows across build+append")
    val flagged = before.filter(_.getAs[Boolean]("fragmented"))
      .map(_.getAs[Int]("cid")).toSet
    assert(flagged.nonEmpty, "three writes per cid must fragment at maxFiles=1")
    // the flag IS compact's work list
    val compacted = IvfIndex.compact(spark, idx, maxFiles = 1).toSet
    assert(compacted == flagged,
      s"compact rewrote $compacted but stats flagged $flagged")
    val after = IvfIndex.stats(spark, idx, maxFiles = 1).collect()
    assert(after.forall(!_.getAs[Boolean]("fragmented")),
      "fragmentation remains after compact")
    assert(after.map(_.getAs[Long]("rows")).sum == vecs.count(),
      "compaction changed the row accounting")
  }

  test("compact's recovery sweep restores an interrupted swap") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val path = tmp()
    val idx = IvfIndex.build(vecs, "vec_id", "embedding", path,
      nCentroids = Some(8), fitSamplePct = Some(100))
    val root = new org.apache.hadoop.fs.Path(s"$path/assignments")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = spark.read.parquet(root.toString).count()
    // simulate a crash between the two renames: live dir staged to the
    // backup name, replacement never published
    val live = fs.globStatus(new org.apache.hadoop.fs.Path(root, "cid=*"))
      .filter(_.isDirectory).head.getPath
    val c = live.getName.stripPrefix("cid=")
    val backup = new org.apache.hadoop.fs.Path(root, s"_graft_replaced_cid=$c")
    assert(fs.rename(live, backup))
    // next compact call must restore the partition before doing anything
    IvfIndex.compact(spark, idx, maxFiles = 100)
    assert(fs.exists(live), "interrupted swap was not restored")
    assert(!fs.exists(backup), "backup left behind after restore")
    assert(spark.read.parquet(root.toString).count() == before,
      "rows lost across the interrupted-swap recovery")
  }

  test("driftStats separates a drifted batch from an in-distribution one") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
    val path = tmp()
    val idx = IvfIndex.build(vecs.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", path, nCentroids = Some(8), fitSamplePct = Some(100))
    // held-out slice of the SAME distribution vs a TRANSLATED batch
    // (every component shifted by +0.5 — several noise sigmas for this
    // ~unit-norm corpus). On a near-isotropic corpus a translation
    // keeps the distance-to-centroid distribution unchanged (any fixed
    // direction scores the same best-of-k cosine as data — measured:
    // the antipodal batch's mean_dist matched in-dist to 3 decimals),
    // which is exactly why driftStats carries the occupancy signal:
    // the shifted batch collapses onto the one centroid nearest the
    // shift direction and the histogram skew reads immediately.
    val inDist = vecs.filter(col("vec_id") % 2 === 1)
    val drifted = inDist.withColumn("embedding",
      transform(col("embedding"), x => x + lit(0.5f)))
    def row(df: org.apache.spark.sql.DataFrame) = df.collect()(0)
    val a = row(IvfIndex.driftStats(spark, idx, inDist, "vec_id", "embedding"))
    val b = row(IvfIndex.driftStats(spark, idx, drifted, "vec_id", "embedding"))
    info(s"in-dist: mean=${a.getAs[Double]("mean_dist")} ratio=${a.getAs[Double]("drift_ratio")} " +
      s"top=${a.getAs[Double]("top_cid_frac")} occ=${a.getAs[Double]("occupancy_ratio")}")
    info(s"drifted: mean=${b.getAs[Double]("mean_dist")} ratio=${b.getAs[Double]("drift_ratio")} " +
      s"top=${b.getAs[Double]("top_cid_frac")} occ=${b.getAs[Double]("occupancy_ratio")}")
    assert(a.getAs[Long]("n") > 0 && b.getAs[Long]("n") > 0)
    assert(a.getAs[Double]("base_mean") > 0, "baseline missing or degenerate")
    // the separation contract: in-distribution reads ~1 on both
    // signals (the fit baseline is measured in-sample, so a held-out
    // slice sits a little above 1 on distance — bounded, not ~2);
    // the drifted batch reads clearly high on occupancy
    assert(a.getAs[Double]("drift_ratio") < 1.3,
      s"held-out same-distribution batch flagged as drifted: $a")
    assert(a.getAs[Double]("occupancy_ratio") < 2.0,
      s"held-out batch occupancy flagged: $a")
    assert(b.getAs[Double]("top_cid_frac") > 0.5,
      s"translated batch did not concentrate: $b")
    assert(b.getAs[Double]("occupancy_ratio") >
        a.getAs[Double]("occupancy_ratio") * 2.0,
      s"translated batch not separated from in-distribution: $a vs $b")
    // a pre-baseline index refuses with the upgrade instruction
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/fit_baseline"), true)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.driftStats(spark, idx, inDist, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("writeFitBaseline"))
    // and the documented upgrade path restores it
    IvfIndex.writeFitBaseline(spark, idx)
    assert(row(IvfIndex.driftStats(spark, idx, inDist, "vec_id", "embedding"))
      .getAs[Double]("drift_ratio") < 1.3)
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
    // the layout claim, asserted on the physical scan node (the
    // formatted-plan string always PRINTS a PartitionFilters line, so
    // a substring check would pass vacuously — review finding): the
    // cid predicate must land in partitionFilters (directory pruning),
    // leaving no post-scan data filter on cid
    val scans = spark.read.parquet(s"$path/assignments")
      .filter(col("cid") === 3)
      .queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
    assert(scans.nonEmpty, "expected a parquet scan")
    assert(scans.forall(_.partitionFilters.exists(_.references.exists(
        _.name == "cid"))),
      s"cid filter is not a partition filter: ${scans.map(_.partitionFilters)}")
    assert(scans.forall(_.dataFilters.forall(!_.references.exists(
        _.name == "cid"))),
      "cid predicate leaked into post-scan data filters")

    // the SEARCH join must prune dynamically too: the probed cids are
    // only known at runtime (they come from the query batch), so the
    // assignments scan needs a DPP subquery filter — without it every
    // search reads the whole corpus and the nprobe/k I/O claim is
    // fiction (ADVICE r4: the long/int cid asymmetry used to wrap the
    // disk-side key in a cast, which is exactly the kind of wrinkle
    // that silently disables DPP)
    val searched = IvfIndex.search(spark, loaded,
      Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") % 100 === 0),
      "vec_id", "embedding", k = 10, nprobe = Some(3))
    searched.collect() // AQE finalizes subplans on execution
    val searchPlan = searched.queryExecution.executedPlan.toString
    assert(searchPlan.contains("dynamicpruning"),
      s"assignments scan is not dynamically partition-pruned:\n$searchPlan")
  }
}
