package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Plan-shape regressions — the 100 TB design assertions from
  * SURVEY §5 / VERDICT r1, checked mechanically:
  * filters reach the parquet scan, unused columns are pruned, and no
  * operator force-broadcasts a dataset-scaled (customer-derived) side.
  */
class PlanSpec extends SparkSpec {

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(FormattedMode)

  test("q1_agg: shipdate filter pushed to scan, unused columns pruned") {
    val plan = formatted("q1_agg")
    assert(plan.contains("PushedFilters"), "no pushdown section")
    assert(plan.contains("LessThanOrEqual(l_shipdate"), "filter not pushed")
    assert(!plan.contains("l_comment"), "scan reads columns the query never uses")
  }

  test("asof attribution plans no join — union + running window only") {
    val plan = formatted("cdc_asof_attribution")
    assert(!plan.contains("Join"),
      "the as-of operator exists to avoid a range join; a Join node means the rewrite regressed")
    assert(plan.contains("Window"), "expected the running-last window")
  }

  test("time_range_prune: both range bounds pushed to the scan") {
    val plan = formatted("time_range_prune")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"))
    assert(plan.contains("LessThan(o_orderdate"))
  }

  /** Static (non-adaptive) plan with auto-broadcast off: the ONLY
    * broadcasts left are explicit hints — exactly what we audit. AQE
    * stays off here so the plan tree is inspectable pre-execution. */
  private def staticPlan(name: String) =
    staticPlanOf(SparkEntry.queries(name)(spark, sfDir))

  /** One shared static-plan environment (the conventions above) for
    * both driver entries and directly-built frames. */
  private def staticPlanOf(df: => org.apache.spark.sql.DataFrame) = {
    val oldThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      df.queryExecution.executedPlan
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }

  private def buildSides(name: String): Seq[String] =
    staticPlan(name).collect {
      case b: BroadcastHashJoinExec =>
        val build = b.buildSide match {
          case BuildLeft => b.left
          case BuildRight => b.right
        }
        build.collectLeaves().map(_.toString).mkString
    }

  test("no query force-broadcasts a customer-derived join side") {
    Seq("q3_topk", "q5_multijoin", "graph_node_join").foreach { name =>
      buildSides(name).foreach { leaves =>
        assert(!leaves.contains("customer"),
          s"$name broadcasts a customer-derived side: $leaves")
      }
    }
  }

  test("q5_multijoin still hints scale-free dims (nation/region)") {
    val bx = buildSides("q5_multijoin")
    assert(bx.nonEmpty, "nation/region broadcast hints were lost")
    assert(bx.forall(l => l.contains("nation") || l.contains("region")))
  }

  test("graph_two_hop aggregates the inner hop before the join") {
    // the pre-aggregation must sit below the join: plan shows an
    // aggregate on l_orderkey feeding the join, not a join feeding
    // one big aggregate
    val plan = SparkEntry.queries("graph_two_hop")(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    val aggIdx = plan.indexOf("l_orderkey")
    assert(aggIdx >= 0)
    assert(plan.indexOf("Aggregate") < plan.indexOf("Join"),
      "lineitem must be reduced before joining orders")
  }

  test("dedup/text scans read only the columns they need") {
    val plan = formatted("dedup_exact")
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("lang"), "dedup_exact must not read lang/source")
  }

  test("dedup_embedding_lsh generates candidates via equi-join, never a loop join") {
    // without the bucket keys this degenerates to the D5 nested-loop
    // shape — the whole point of the operator is that it does not.
    // Pinned tables/bits force the LSH plan: the AUTO entry correctly
    // cost-falls-back to the exact (loop-join) plan at this tiny SF,
    // which is a selection decision, not the LSH shape under test.
    val plan = staticPlanOf(graft.operators.Dedup.embeddingPairsLsh(
      Tables.load(spark, sfDir, "embeddings"), "vec_id", "embedding",
      tau = 0.4, tables = Some(16), bits = Some(4)))
    val loops = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(loops.isEmpty,
      s"LSH dedup must join on bucket keys, found ${loops.size} loop joins")
  }

  test("sim_lsh_ann (pinned) finds candidates via bucket equi-join, never a loop join") {
    // same pinning rationale as above: the auto entry's cost-based
    // fallback is the exact plan at this SF; the shape under audit is
    // the bucketed join a large corpus executes (VERDICT r4 #3)
    val plan = staticPlanOf(graft.operators.Similarity.lshTopK(
      Tables.load(spark, sfDir, "embeddings"), "vec_id", "embedding",
      tables = Some(16), bits = Some(4)))
    val loops = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(loops.isEmpty,
      s"LSH ANN must join on bucket keys, found ${loops.size} loop joins")
  }

  test("incremental dedup finds candidates via the cross band join, never a loop join") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = staticPlanOf(graft.operators.Sketches.minhashLshAgainst(
      docs.filter(col("doc_id") % 10 === 0),
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"))
    val loops = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(loops.isEmpty,
      s"batch×history candidates must equi-join on band keys, found ${loops.size} loop joins")
  }

  test("bloom screen rides the scan: no exchange, no join, filter as literal") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft_planbloom")
      .resolve("bf.bin").toString
    val docs = Tables.load(spark, sfDir, "documents")
    graft.operators.Sketches.buildExactBloom(
      docs.limit(50), "text", path, expectedItems = Some(1000L))
    val screened = graft.operators.Sketches
      .screenExactBloom(docs.select("doc_id", "text"), "text", path)
      .filter(!col("maybe_dup"))
    val plan = staticPlanOf(screened)
    val s = plan.toString
    // the screen is a scalar predicate over the scan — the whole point
    // vs an anti-join is that the history never joins or shuffles
    assert(!s.contains("Exchange"), s"bloom screen must not shuffle:\n$s")
    assert(!s.contains("Join"), s"bloom screen must not join:\n$s")
    new java.io.File(path).delete()
  }

  test("span dedup elects winners with a partial HASH aggregate") {
    val plan = formatted("dedup_spans")
    // the winner min must partial-aggregate before its exchange — the
    // hot-span safety argument (a 10^8-occurrence boilerplate span
    // combines map-side instead of landing on one reducer) — and
    // since r10 over the PACKED long, so it plans as a HashAggregate:
    // the struct formulation fell back to a SortAggregate pair (two
    // full sorts of every span occurrence)
    assert(plan.contains("partial_min(packed"),
      s"no partial min over the packed winner in:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"winner election regressed to sort aggregation in:\n$plan")
  }

  test("hll distinct state partially aggregates map-side; sketch crosses the shuffle") {
    // the uniqState story: one sketch row per (map task, key) reaches
    // the exchange — without partial_hll_sketch_agg the shuffle would
    // carry every raw value and the state build degrades to the
    // countDistinct re-shuffle it exists to replace
    val plan = staticPlanOf(graft.operators.Sketches.distinctState(
      Tables.load(spark, sfDir, "events"), Seq("event_type"), "user_id"))
      .toString
    assert(plan.contains("partial_hll_sketch_agg"),
      s"state build must combine sketches map-side:\n$plan")
  }

  test("bounded aggregates run as ObjectHashAggregate with map-side partial merge") {
    // uniqUpTo/topKWeighted carry bounded java state through
    // TypedImperativeAggregate: the plan must be ObjectHashAggregate
    // (not SortAggregate — no per-group sort) with a partial pass
    // before the exchange, so only capped state crosses the shuffle
    val uniq = staticPlanOf(graft.operators.Sketches.uniqUpTo(
      Tables.load(spark, sfDir, "events"), Seq("event_type"), "user_id",
      n = 100)).toString
    assert(uniq.contains("ObjectHashAggregate"),
      s"uniq_upto must plan as ObjectHashAggregate:\n$uniq")
    assert(uniq.contains("partial_uniq_upto"),
      s"uniq_upto must combine map-side:\n$uniq")
    import org.apache.spark.sql.functions.{col, floor}
    val topk = staticPlanOf(graft.operators.Sketches.topkWeighted(
      Tables.load(spark, sfDir, "events").select(col("event_type"),
        col("user_id").cast("string").as("item"),
        floor(col("value") * 10000).cast("long").as("w")),
      Seq("event_type"), "item", "w", capacity = 1000)).toString
    assert(topk.contains("ObjectHashAggregate"),
      s"topk_weighted must plan as ObjectHashAggregate:\n$topk")
    assert(topk.contains("partial_topk_weighted"),
      s"topk_weighted must combine map-side:\n$topk")
  }

  test("theta and kll state builds partially aggregate map-side too") {
    val theta = staticPlanOf(graft.operators.Sketches.thetaState(
      Tables.load(spark, sfDir, "documents"), Seq("lang"), "text")).toString
    assert(theta.contains("partial_theta_sketch_agg"),
      s"theta state must combine sketches map-side:\n$theta")
    val kll = staticPlanOf(graft.operators.Sketches.quantileState(
      Tables.load(spark, sfDir, "documents"), Seq("lang"), "n_chars")).toString
    assert(kll.contains("partial_kll_sketch_agg"),
      s"kll state must combine sketches map-side:\n$kll")
  }

  test("text_pii is a pure projection: no exchange before the output sort") {
    val plan = formatted("text_pii")
    // one scan, regex projections, and the oracle-determinism sort —
    // any other exchange means the scrub stopped being per-row
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"pii scrub should only shuffle for the sort:\n$plan")
    assert(!plan.contains("Join"), "pii scrub must not join")
  }

  test("sample_rand is a bounded top-n, not a global sort") {
    val plan = formatted("sample_rand")
    assert(plan.contains("TakeOrderedAndProject"),
      "orderBy(rand).limit must plan as per-partition top-n + merge")
  }

  test("corpus_ngrams is a bounded top-n with map-side combine") {
    val plan = formatted("corpus_ngrams")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k grams must never globally sort the gram universe")
    assert(plan.contains("partial_"),
      "gram counts must partially aggregate before the exchange")
  }

  test("embed_centroids partially aggregates the exploded dims map-side") {
    // the 64x posexplode row blow-up must collapse to (label, dim)
    // sums per partition BEFORE the shuffle — without partial agg the
    // exchange carries one row per vector element
    val plan = formatted("embed_centroids")
    assert(plan.contains("partial_avg"),
      "centroid means must combine map-side")
  }

  test("graph_integrity reads only the key columns it checks") {
    val plan = formatted("graph_integrity")
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("c_name") && !plan.contains("o_totalprice"),
      "integrity check must scan join keys only")
  }

  test("ngram explodes bind tokens as an attribute, never the split chain") {
    // inside an ngram transform-lambda, a non-attribute `toks`
    // reference re-runs split(regexp_replace(text)) per element_at —
    // n·positions regex evaluations per document (measured 25× on the
    // sf0.1 3-gram explode). The tokenize chain must be materialized
    // by a projection BELOW the Generate; a plain explode(tokens(_))
    // (no lambda — one evaluation per row) stays legal.
    Seq("corpus_ngrams", "text_repetition", "dedup_ngram_jaccard",
        "decontaminate", "dedup_minhash_lsh", "dedup_clusters").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.optimizedPlan
      plan.foreach {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
          val lambdaRetokenizes = g.generator.exists {
            case h: org.apache.spark.sql.catalyst.expressions.HigherOrderFunction =>
              h.exists {
                case _: org.apache.spark.sql.catalyst.expressions.RegExpReplace => true
                case _ => false
              }
            case _ => false
          }
          assert(!lambdaRetokenizes,
            s"$name: generator lambda re-evaluates the tokenize chain")
        case _ => ()
      }
    }
  }

  test("quantized search computes the scale aggregate exactly once per side") {
    // two regressions collapse into this count: (1) the inlined
    // quantize form substitutes the max|x| aggregate into per-element
    // lambdas (the split int8Scale API prevents it); (2) a NULLABLE
    // norm column lets InferFiltersFromConstraints add isnotnull(nrm),
    // whose pushdown re-expands the whole dequantize chain into a
    // per-row filter (non-nullable l2 prevents it). Either failure
    // multiplies the occurrence count well past 2 (corpus + query side).
    val plan = SparkEntry.queries("sim_quantized_topk")(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    val occurrences = "aggregate\\(".r.findAllIn(plan).size
    assert(occurrences <= 2,
      s"max-abs aggregate appears $occurrences times - scale duplicated")
  }

  test("node similarity pairs come from an equi-join; top-k is bounded") {
    // the pair generation must ride the shared-feature key (hot keys
    // capped upstream), never a loop/cartesian join; the top-20 must
    // plan as per-partition top-n, never a global sort of the pairs
    val plan = formatted("graph_node_similarity")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      "pair generation regressed to a loop join")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k pairs must never globally sort the pair set")
  }

  test("pageRank reuses the persisted edge relation across rounds") {
    // without the persist, each of the 3 rounds re-runs the edge
    // derivation (scan + join + distinct) — the InMemoryRelation must
    // appear in the plan and the only joins must be equi-joins plus
    // the single scalar broadcast cross for N
    val plan = formatted("graph_pagerank")
    assert(plan.contains("InMemoryRelation") ||
           plan.contains("InMemoryTableScan"),
      "edge list is not persisted — every round re-derives it")
    assert(!plan.contains("CartesianProduct"),
      "unexpected cartesian join in the iteration body")
  }

  test("scd2 history is one per-entity window over the scan") {
    // a second shuffle would mean the versioning re-partitions what
    // the window already partitioned (lead + row_number must share
    // one sort); allowed: the window exchange + the presentation
    // orderBy's range exchange — anything more is a regression
    val plan = staticPlan("cdc_history_scd2")
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
    assert(exchanges <= 2, s"scd2 plans $exchanges shuffle exchanges")
    // lead (sliding frame) and row_number (growing frame) legally
    // split into two WindowExec nodes — but they must STACK on one
    // shared partitioning: no exchange or sort between them
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size <= 2, s"unexpected window count ${windows.size}")
    if (windows.size == 2) {
      // an exchange sitting between the two windows = re-shuffle
      val lower = windows.last
      val reshuffled = windows.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.find(_.eq(lower)).isDefined => e
      }.nonEmpty
      assert(!reshuffled, "the two window passes re-shuffle between them")
    }
  }

  test("lttb selection carries no floating point") {
    // the per-bucket argmax must order on the integer area column —
    // a double anywhere in the scoring expression reintroduces the
    // cross-engine ulp hazard the integer form exists to kill
    val df = SparkEntry.queries("cdc_lttb")(spark, sfDir)
    val score = df.queryExecution.analyzed.collect {
      case p if p.expressions.exists(_.toString.contains("abs(")) =>
        p.expressions.filter(_.toString.contains("abs(")).map(_.dataType)
    }.flatten
    assert(score.nonEmpty, "no area expression found")
    score.foreach(t => assert(t == org.apache.spark.sql.types.LongType,
      s"area expression is $t, not LongType"))
  }
}
