package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PipelineOps}

/** Invariants for the corpus-composition operators (split /
  * decontaminate / clusters). */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment is content-keyed: identical text, same split") {
    val df = Seq((1L, "same payload"), (2L, "same payload"), (3L, "zzz"))
      .toDF("doc_id", "text")
      .withColumn("split", PipelineOps.splitAssign("text"))
    val splits = df.filter(col("text") === "same payload")
      .select("split").distinct().count()
    assert(splits == 1, "duplicate payloads must land in the same split")
  }

  test("split proportions roughly match 80/10/10 on sf0.001") {
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("split", PipelineOps.splitAssign("text"))
    val n = docs.count().toDouble
    val frac = docs.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train=${frac("train")}")
    assert(frac.getOrElse("val", 0.0) > 0.03)
    assert(frac.getOrElse("test", 0.0) > 0.03)
  }

  test("dedup clusters: every member maps to the min id of its component") {
    // two components: {1,2,3} chained (1-2, 2-3) and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val got = PipelineOps.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dedup clusters converge on a long chain (diameter > 1 iteration)") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("i", "j")
    val got = PipelineOps.dedupClusters(chain)
    assert(got.filter(col("cluster_id") =!= 1L).count() == 0)
    assert(got.count() == 12)
  }

  test("dedup clusters: reliable-checkpoint mode yields identical labels") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val reliable = PipelineOps.dedupClusters(pairs, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // the reliable mode actually wrote checkpoint data
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir)).nonEmpty,
      "checkpoint dir should contain written state")
  }

  test("sampleRand: seeded, fixed size, subset of the source") {
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id")
    def run(seed: Long): Seq[Long] =
      PipelineOps.sampleRand(docs, 20, seed)
        .collect().map(_.getLong(0)).sorted.toSeq
    val a = run(7L)
    assert(a.size == 20 && a.distinct.size == 20)
    assert(a == run(7L), "same seed, same layout -> same sample")
    assert(a != run(8L), "different seed -> different sample")
    val ids = docs.collect().map(_.getLong(0)).toSet
    assert(a.forall(ids), "sample rows come from the source")
  }

  test("decontaminate flags only cross-set overlap") {
    // doc 1 (train) copies eval doc 100's text -> flagged;
    // doc 2 (train) is unique -> clean
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, evalText, false),
      (2L, "one two three four five six seven eight", false),
      (100L, evalText, true)
    ).toDF("doc_id", "text", "ev")
    val got = PipelineOps.decontaminate(docs, "doc_id", "text",
      isEval = col("ev"), n = 5, minShared = 3L)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("packSequences matches a pure-Scala greedy packer; window stays sharded") {
    // random shards + token counts, differential against the obvious
    // sequential packer
    val rnd = new scala.util.Random(11L)
    val rows = (0L until 200L).map(i =>
      (i, s"shard${rnd.nextInt(5)}", 1L + rnd.nextInt(100)))
    val df = rows.toDF("doc_id", "part", "n_tok")
    val budget = 64L
    val got = PipelineOps.packSequences(df, "doc_id", "part", "n_tok", budget)
      .select("doc_id", "seq_id", "seq_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = rows.groupBy(_._2).values.flatMap { shard =>
      var offset = 0L
      shard.sortBy(_._1).map { case (id, _, n) =>
        val r = id -> (offset / budget, offset % budget)
        offset += n
        r
      }
    }.toMap
    assert(got == expected)
    // first doc of every shard starts sequence 0 at offset 0 (implied
    // by the differential, but the property worth reading)
    val firsts = rows.groupBy(_._2).values.map(_.minBy(_._1)._1).toSet
    firsts.foreach(id => assert(got(id) == (0L, 0L)))

    // the running offset must be a PARTITIONED window — a plan that
    // funnels the corpus through a single-partition sort is the
    // classic packing-at-scale bug
    val plan = PipelineOps.packSequences(df, "doc_id", "part", "n_tok", budget)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("hashKeep: deterministic, rate-monotone, 0/100 boundaries") {
    val docs = Tables.load(spark, sfDir, "documents")
    def kept(pct: Int): Set[Long] =
      docs.filter(PipelineOps.hashKeep(col("doc_id"), lit(pct)))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val n = docs.count()
    assert(kept(0).isEmpty)
    assert(kept(100).size == n)
    val k25 = kept(25); val k60 = kept(60)
    // raising the rate only ADDS rows — a mixture re-weighting never
    // swaps which documents survive at a given tier
    assert(k25.subsetOf(k60))
    assert(k25 == kept(25), "same rate twice -> identical subset")
    // rate is roughly honored on real data
    assert(k60.size.toDouble / n > 0.4 && k60.size.toDouble / n < 0.8)
  }

  test("survivors partition the corpus: roots kept, members dropped, nothing lost") {
    val docs = Tables.load(spark, sfDir, "documents")
    val clusters = PipelineOps.dedupClusters(
      Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, tau = 0.5, dfCap = 1000L)).cache()
    val survivors = graft.queries.CorpusQueries
      .queries("dedup_survivors")(spark, sfDir).cache()
    val dropped = clusters.filter(col("doc_id") =!= col("cluster_id"))
    // every cluster's canonical root survives
    val roots = clusters.select(col("cluster_id").as("doc_id")).distinct()
    assert(roots.join(survivors, Seq("doc_id"), "left_anti").count() == 0,
      "a cluster root was dropped")
    // survivors and dropped members partition the corpus exactly
    assert(survivors.count() + dropped.count() == docs.count())
    assert(survivors.join(dropped.select("doc_id"), Seq("doc_id"), "left_semi")
      .count() == 0, "a dropped member leaked into the survivors")
  }

  test("temperature resampling flattens the language distribution") {
    val docs = Tables.load(spark, sfDir, "documents")
    val orig = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("sample_temperature")(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nOrig = orig.values.sum.toDouble
    val nKept = kept.values.sum.toDouble
    // α = 0.5 must pull every language's share toward uniform: head
    // languages shrink, tail languages grow (within hash-draw noise)
    val uniform = 1.0 / orig.size
    orig.keys.foreach { l =>
      val so = orig(l) / nOrig
      val sk = kept.getOrElse(l, 0L) / nKept
      if (so > uniform * 1.3)
        assert(sk < so, s"head lang $l share did not shrink: $so -> $sk")
      if (so < uniform * 0.77)
        assert(sk > so * 0.95, s"tail lang $l share collapsed: $so -> $sk")
    }
    // the draw is a pure function of doc_id (no rand()): re-running
    // returns the identical row set
    val again = SparkEntry.queries("sample_temperature")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val keptIds = SparkEntry.queries("sample_temperature")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(again == keptIds)
    // a tail language at/above uniform target keeps everything:
    // rate_ppm saturates at 1000000
    val ppm = SparkEntry.queries("sample_temperature")(spark, sfDir)
      .select("lang", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ppm.values.forall(p => p > 0 && p <= 1000000))
  }

  test("stratifiedSplit allocation is exact-floor per stratum") {
    // stratum A: 7 docs → train ⌊5.6⌋=5, val ⌊6.3⌋−5=1, test 1;
    // stratum B: 3 docs → train ⌊2.4⌋=2, val ⌊2.7⌋−2=0, test 1.
    // splitAssign (hash buckets) cannot promise these counts; this
    // operator must hit them exactly, whatever the hash order.
    val df = ((1L to 7L).map(i => (i, "A")) ++ (8L to 10L).map(i => (i, "B")))
      .toDF("doc_id", "source")
    val got = PipelineOps.stratifiedSplit(df, "source", "doc_id")
      .groupBy("source", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      ("A", "train") -> 5L, ("A", "val") -> 1L, ("A", "test") -> 1L,
      ("B", "train") -> 2L, ("B", "test") -> 1L), s"got $got")
  }

  test("stratifiedSplit is layout-independent and rank-deterministic") {
    val df = (1L to 50L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val base = PipelineOps.stratifiedSplit(df, "source", "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val shuffled = PipelineOps.stratifiedSplit(
        df.repartition(13, col("doc_id")), "source", "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(base == shuffled, "assignment must not depend on layout")
    // every doc assigned exactly once, all three splits present
    assert(base.size == 50 && base.values.toSet == Set("train", "val", "test"))
  }
}
