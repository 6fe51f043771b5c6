package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PipelineOps, Sketches}

/** Scale-hardening guards for the posting-list family (VERDICT r3 #1):
  * the df/bucket caps must filter BEFORE any list is collected, so no
  * aggregation buffer ever exceeds the cap — the difference between a
  * skew guard and an executor OOM at stop-shingle frequencies.
  *
  * Three angles: (a) differential vs a pure-JVM reference on a
  * randomized corpus with a planted universal stop-shingle (semantics
  * unchanged by the rewrite); (b) mechanical plan assertions that the
  * collect sits ABOVE the semi-join on surviving keys (or is gone
  * entirely); (c) degenerate mass-identical corpora behave per the
  * documented bucket-cap contract instead of exploding.
  */
class ScaleGuardSpec extends SparkSpec {
  import spark.implicits._

  /** JVM twin of TextOps.tokens + shingles (distinct contiguous
    * n-grams of single-space-normalized lowercase tokens). */
  private def jvmShingles(text: String, n: Int): Set[String] = {
    val toks = text.toLowerCase.trim.split("\\s+").toSeq
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Randomized corpus over a tiny vocabulary (dense shingle overlap)
    * with a universal "aa bb cc" prefix — one stop-shingle in EVERY
    * doc, the exact profile the two-pass cap exists for. */
  private def corpus(nDocs: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    (1L to nDocs.toLong).map { i =>
      val body = Seq.fill(6 + rnd.nextInt(6))(s"w${rnd.nextInt(8)}").mkString(" ")
      (i, s"aa bb cc $body")
    }
  }

  test("jaccardPairs matches pure-JVM reference under a stop-shingle df cap") {
    val n = 3; val tau = 0.3; val dfCap = 10L
    val docs = corpus(30, seed = 7L)
    val sh = docs.map { case (id, t) => id -> jvmShingles(t, n) }.toMap
    val df = sh.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val capped = sh.map { case (id, s) => id -> s.filter(df(_) <= dfCap) }
    val want = (for {
      (i, si) <- capped; (j, sj) <- capped if i < j
      inter = (si & sj).size if inter > 0
      jac = inter.toDouble / (si.size + sj.size - inter) if jac >= tau
    } yield (i, j, jac)).toSeq.sortBy(p => (p._1, p._2))
    assert(df.values.max > dfCap, "corpus must actually contain a capped stop-shingle")

    val got = Dedup.jaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        n, tau, dfCap)
      .orderBy("i", "j").collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j"), r.getAs[Double]("jaccard")))
    assert(got.map(p => (p._1, p._2)).toSeq == want.map(p => (p._1, p._2)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._3 - w._3) < 1e-4) }
  }

  test("decontaminate matches pure-JVM reference under the df cap") {
    val n = 3; val minShared = 2L; val dfCap = 12L
    val docs = corpus(30, seed = 11L)
    val isEval: Long => Boolean = _ % 5 == 0
    val sh = docs.map { case (id, t) => id -> jvmShingles(t, n) }.toMap
    val byTok = sh.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val keptToks = byTok.filter { case (_, ids) =>
      ids.exists(isEval) && ids.exists(!isEval(_)) && ids.size <= dfCap
    }.keySet
    val want = sh.collect { case (id, s) if !isEval(id) =>
      id -> s.count(keptToks).toLong
    }.filter(_._2 >= minShared).toSeq.sorted

    val got = PipelineOps.decontaminate(docs.toDF("doc_id", "text"),
        "doc_id", "text", col("doc_id") % 5 === 0, n, minShared, dfCap)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared"))).toSeq
    assert(want.nonEmpty, "test corpus must actually contaminate something")
    assert(got == want)
  }

  test("posting-list collects sit above the df-cap semi-join (plan shape)") {
    val docs = corpus(10, seed = 3L).toDF("doc_id", "text")
    val jp = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3, 10L)
      .queryExecution.optimizedPlan.toString
    // every collect_list has the LeftSemi (cap) join BELOW it (deeper
    // in the printed tree = upstream): every list the aggregate
    // buffers is over an already-capped token. Exactly ONE collect —
    // the posting lists for the intersection counts; the size
    // denominators count the capped stream directly instead of
    // re-exploding the collected lists (so the cap's semi-join prints
    // once per consumer: postings + both size join sides).
    val jpCollects = "collect_list".r.findAllMatchIn(jp).map(_.start).toSeq
    val jpSemis = "LeftSemi".r.findAllMatchIn(jp).map(_.start).toSeq
    assert(jpCollects.size == 1, jp)
    assert(jpSemis.nonEmpty, jp)
    assert(jpCollects.forall(c => jpSemis.exists(_ > c)), jp)

    // decontaminate needs no posting list at all after the rewrite:
    // both passes are pure count aggregates.
    val dc = PipelineOps.decontaminate(docs, "doc_id", "text",
        col("doc_id") % 5 === 0)
      .queryExecution.optimizedPlan.toString
    assert(!dc.contains("collect_set") && !dc.contains("collect_list"), dc)
    assert(dc.contains("LeftSemi"), dc)

    val mh = Sketches.minhashLsh(docs, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert("collect_list".r.findAllIn(mh).size == 1, mh)
    assert(mh.indexOf("collect_list") < mh.indexOf("LeftSemi"), mh)
  }

  test("autoBits keeps per-table LSH candidate volume ~n·targetBucket at any n") {
    import graft.operators.Similarity.autoBits
    val target = 64L
    // the contract: 2^bits is the smallest power of two >= n/target,
    // so expected per-table pair volume n²/2^(bits+1) lands in
    // [n·target/4, n·target/2] — linear in n — across 9 orders of
    // magnitude (clamp regions excluded: it saturates at 24 bits)
    for (n <- Seq(1000L, 10000L, 100000L, 10000000L, 1000000000L)) {
      val b = autoBits(n, target)
      val vol = n.toDouble * n.toDouble / math.pow(2, b + 1)
      assert(vol <= n * target / 2.0, s"n=$n bits=$b")
      assert(vol >= n * target / 4.0, s"n=$n bits=$b")
    }
    assert(autoBits(10L, target) == 2)        // floor clamp
    assert(autoBits(Long.MaxValue, 1L) == 24) // ceiling clamp
    // tables must grow with bits or the recall contract dies: at the
    // design similarity, P(pair survives) = 1-(1-p^bits)^tables must
    // stay >= targetRecall for every width autoBits can choose
    import graft.operators.Similarity.{autoTables, bitAgreeProb}
    for (b <- 2 to 24; sim <- Seq(0.4, 0.5, 0.7)) {
      val t = autoTables(b, sim, targetRecall = 0.9)
      val pb = math.pow(bitAgreeProb(sim), b)
      val recallAtSim = 1.0 - math.pow(1.0 - pb, t)
      assert(t == 256 || recallAtSim >= 0.9, s"bits=$b sim=$sim t=$t")
      assert(t <= 256, s"tables unbounded at bits=$b sim=$sim")
    }
    // monotone: wider hashes never need fewer tables
    assert((3 to 24).forall(b =>
      autoTables(b, 0.5) >= autoTables(b - 1, 0.5)))
    // underflow regression: when p^bits < 1e-16, log(1-pb) rounds to
    // log(1.0)=0 and the formula must still saturate at the CAP, not
    // collapse to the floor (log1p keeps precision)
    assert(autoTables(19, -0.9) == 256)
    assert(autoTables(24, 0.1) == 256)
    import graft.operators.Similarity.{autoCentroids, autoFitPct}
    assert(autoCentroids(1000000L) == 1000)   // √n
    assert(autoCentroids(0L) == 4)
    assert(autoFitPct(1000L, 32) == 100)      // small corpus: fit on all
    assert(autoFitPct(1000000000L, 31623) == 1) // huge corpus: 1% sample
  }

  test("the recall clamp is loud: expectedRecall names the shortfall, strict refuses") {
    import graft.operators.Similarity.{autoBits, autoTables, expectedRecall,
      minDesignSimAtCap}
    // the VERDICT r4 scenario: n=10⁹, designSim 0.5 ⇒ 24-bit hashes,
    // required tables ≈ 38k ≫ 256 — the clamped layout delivers ~1.5%
    // recall, and expectedRecall must SAY so
    val b9 = autoBits(1000000000L)
    assert(b9 == 24)
    assert(expectedRecall(b9, 256, 0.5) < 0.05,
      s"expected recall at the clamp should expose the collapse, " +
        s"got ${expectedRecall(b9, 256, 0.5)}")
    intercept[IllegalArgumentException] { autoTables(b9, 0.5, strict = true) }
    // non-strict still returns the cap (ad-hoc analytics keeps running;
    // the shortfall goes to the log) — the VALUE is unchanged
    assert(autoTables(b9, 0.5, strict = false) == 256)

    // the contract property: every auto-derived (bits, tables) pair
    // either meets targetRecall or strict mode raises — no silent gap
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L, 100000000000L);
         sim <- Seq(0.3, 0.5, 0.7, 0.85, 0.95)) {
      val bits = autoBits(n)
      val ok =
        try expectedRecall(bits, autoTables(bits, sim, strict = true), sim) >=
          0.9 - 1e-9
        catch { case _: IllegalArgumentException => true }
      assert(ok, s"silent recall shortfall at n=$n sim=$sim")
    }
    // the remedy the diagnostic names is real: at the advertised
    // minimum design similarity, 256 tables DO meet the target
    for (bits <- Seq(12, 18, 24)) {
      val s = minDesignSimAtCap(bits, 0.9)
      assert(expectedRecall(bits, 256, s) >= 0.9 - 1e-9, s"bits=$bits sim=$s")
      assert(autoTables(bits, s + 0.01, strict = true) <= 256)
    }
  }

  test("autoNprobe co-scales probes with the centroid count") {
    import graft.operators.Similarity.{autoCentroids, autoNprobe}
    assert(autoNprobe(16) == 6)    // the pinned-check operating point keeps nprobe 6
    assert(autoNprobe(4096) == 64) // √k at the centroid clamp
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L, 100000000000L)) {
      val k = autoCentroids(n)
      val np = autoNprobe(k)
      // probed fraction decays as 1/√k, never the 1/k collapse a fixed
      // nprobe gives against growing k (VERDICT r4 #2)...
      assert(np.toDouble / k >= 1.0 / math.sqrt(k.toDouble) - 1e-9,
        s"n=$n k=$k np=$np probes less than √k")
      // ...while staying a genuine pruning index: at clamp scale the
      // probed fraction still shrinks well below the old fixed-k 37%
      assert(np < k || k <= 36, s"n=$n k=$k np=$np probes everything")
      assert(np <= 64)
    }
  }

  test("LSH candidate count grows ~linearly on a 10x corpus under autoBits") {
    // dim must comfortably exceed the hash width: b hyperplanes in d
    // dimensions only carve ~b^d/d! sign cells, so low-dim vectors
    // make the extra bits redundant and collisions stay near-flat —
    // real embedding corpora are dim 100+; 32 suffices for ≤10 bits
    val rnd = new Random(123)
    def vecs(n: Int) = (1L to n.toLong)
      .map(i => (i, Array.fill(32)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    def cands(df: org.apache.spark.sql.DataFrame) =
      Dedup.lshCandidatePairs(df, "vec_id", "embedding", tables = Some(4),
        bits = None, seed = 42L, dim = 32, targetBucket = 64L,
        maxBucket = 10000L, designSim = 0.5).count()
    val c1 = cands(vecs(2000))   // the sf0.1 default-tuning scale
    val c2 = cands(vecs(20000))  // 10x
    // linear scaling: ~10x the candidates for 10x the rows. A fixed
    // bits=4 (the r3 default) saturates toward all-pairs here (~100x).
    assert(c2 <= 25L * c1, s"c1=$c1 c2=$c2")
    assert(c2 <= 4L * 20000L * 64L, s"c2=$c2 exceeds tables*n*targetBucket")
  }

  test("cost-based selection: auto mode equals the exact plan where LSH saturates") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, sfDir, "embeddings")
    // at this corpus size the saturation + query-batch conditions hold,
    // so auto mode must return the EXACT plan's rows — same contract,
    // recall 1.0 (the selection changes the physical plan, never the
    // answer's meaning). Assert the preconditions FIRST: if the test
    // data grows past the fallback thresholds, fail here with a
    // diagnosable message instead of flaking on recall < 1.
    val n = emb.count()
    val b = Similarity.autoBits(n)
    val t = Similarity.autoTables(b, 0.4)
    assert(n <= 32768L && n / 2 <= 16L * t * 64L,
      s"test data (n=$n, bits=$b, tables=$t) outgrew the pair-dedup " +
        "cost-crossover — regenerate the expectations or shrink the corpus")
    assert(emb.filter(col("vec_id") % 100 === 0).count() <= t * b,
      "query batch outgrew the brute-force fallback condition")
    val autoPairs = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", 0.4)
    val exactPairs = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.4)
    assert(autoPairs.exceptAll(exactPairs).count() == 0 &&
           exactPairs.exceptAll(autoPairs).count() == 0)
    val autoTop = Similarity.lshTopK(emb, "vec_id", "embedding")
    val bruteTop = Similarity.bruteForceTopK(emb, "vec_id", "embedding")
    assert(autoTop.exceptAll(bruteTop).count() == 0 &&
           bruteTop.exceptAll(autoTop).count() == 0)
  }

  test("empty and all-null vector inputs short-circuit to empty results") {
    import graft.operators.Similarity
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]]),
      (2L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    for (df <- Seq(empty, allNull)) {
      assert(Dedup.embeddingPairsLsh(df, "vec_id", "embedding", 0.4).count() == 0)
      assert(Similarity.lshTopK(df, "vec_id", "embedding").count() == 0)
      assert(Similarity.ivfTopK(df, "vec_id", "embedding").count() == 0)
    }
    // schema is preserved for downstream unions
    assert(Similarity.lshTopK(empty, "vec_id", "embedding").columns.toSeq
      == Seq("q_id", "vec_id", "cosine", "rk"))
    assert(Dedup.embeddingPairsLsh(empty, "vec_id", "embedding", 0.4)
      .columns.toSeq == Seq("i", "j", "cosine"))
  }

  test("sketch band buckets over maxBucket are dropped, under it kept") {
    // mass-identical corpus: every doc hashes to the same band buckets
    val docs = (1L to 12L).map(i => (i, "same exact text every time"))
      .toDF("doc_id", "text")
    // cap below the corpus size: the degenerate bucket is refused and
    // the (genuinely quadratic) pair output is suppressed, per the
    // documented contract (exact dedup owns the identical-doc spike)
    assert(Sketches.minhashLsh(docs, "doc_id", "text", maxBucket = 11L).count() == 0)
    assert(Sketches.simhashPairs(docs, "doc_id", "text", maxBucket = 11L).count() == 0)
    // at-or-above the corpus size the full pair set survives
    assert(Sketches.minhashLsh(docs, "doc_id", "text", maxBucket = 12L).count() == 66)
    assert(Sketches.simhashPairs(docs, "doc_id", "text", maxBucket = 12L).count() == 66)
  }

  test("AQE splits a skewed shuffle-join partition (skew=true, oracle green)") {
    // SCALE.md §OLAP claims "AQE skew join splits oversized partitions"
    // for the fact⋈fact shuffles — this pins it (VERDICT r7 #5): a
    // zipf-keyed join where one key carries 90% of the left side must
    // (a) produce the exact oracle result and (b) show the skew split
    // in the FINAL adaptive plan, at thresholds scaled to test data.
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // production defaults are 256 MB / factor 5 — scale the byte
      // thresholds to the test corpus, keep the structural factor
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      // force the shuffle join: a broadcast join has no skew to split
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // left: 200k rows, key 0 holds 180,001 of them (every id with
      // id % 10 != 0, plus id = 0); right: 2k distinct keys
      val left = spark.range(0, 200000).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("chk"))
      val row = joined.collect().head
      // oracle, derived by hand: key 0 matches 180,001 left rows; keys
      // 10,20,...,1990 (the surviving id%10==0 keys inside the right
      // range) match 1 left row each → 199 more
      assert(row.getLong(0) == 180001L + 199L)
      // chk = Σ(v + w): v sums all non-multiples of 10 below 200k plus
      // 0, plus each matched multiple k∈{10..1990}; w adds 0 for the
      // hot key and 2k per matched k
      val vSum = (0L until 200000L).filter(i => i % 10 != 0).sum +
        (10L to 1990L by 10).sum
      val wSum = (10L to 1990L by 10).map(_ * 2).sum
      assert(row.getLong(1) == vSum + wSum)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split SortMergeJoin in the final adaptive plan:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
