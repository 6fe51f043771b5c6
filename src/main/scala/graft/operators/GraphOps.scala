package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph algorithms over an edge-list DataFrame — the Neo4j GDS
  * workload class the reference's source system serves (the reference
  * exports a Neo4j graph into ClickHouse; its users run degree / WCC /
  * PageRank / similarity over exactly this node⋈relationship shape,
  * reference 04-optimize-tables.sql:205-218, README.md device→
  * interface traversals).
  *
  * All algorithms here are ITERATIVE JOIN PIPELINES over a
  * symmetrized edge list: per iteration one join shuffle keyed on the
  * source node + one hash-agg shuffle keyed on the target — the same
  * 2-shuffles-per-round shape as [[PipelineOps.dedupClusters]], which
  * is the proven-at-scale loop in this repo (checkpoint-truncated
  * lineage there; here iteration counts are small constants so plain
  * lineage is fine — callers running >10 rounds should checkpoint).
  * The edge list is persisted ONCE (it joins in every round; without
  * pinning, each round re-runs the upstream edge derivation — the
  * repo-wide caching stance, docs/SCALE.md).
  *
  * CACHE LIFETIME (ADVICE r8): the persisted relations (edge lists,
  * degrees, capped feature lists) stay referenced by the RETURNED
  * lazy plan, so the operator cannot unpersist them itself without
  * forcing execution — cleanup is CALLER-OWNED, same contract as the
  * sketch operators (docs/SCALE.md "caching stance"): they are
  * plan-keyed in the CacheManager (repeat builds share one copy) and
  * a long-lived session reclaims them with
  * `spark.catalog.clearCache()` once results are materialized.
  * Loop-scoped `localCheckpoint` rounds are NOT in that cache — the
  * ContextCleaner reclaims each round's checkpoint as soon as the
  * next round drops the reference, so live checkpoint state is
  * bounded by one round regardless of iteration count.
  */
object GraphOps {

  /** Symmetrize a directed edge list (cols `a`, `b`) into the
    * undirected adjacency relation, self-loops dropped, duplicates
    * collapsed: one distinct (hash-agg) shuffle. */
  def undirected(edges: DataFrame): DataFrame =
    edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** PageRank with a FIXED iteration count on the undirected graph of
    * `edges` (cols `a`, `b`; symmetrized internally, so every node has
    * degree ≥ 1 and the damping leak term needs no dangling-mass
    * redistribution — the undirected-graph simplification Neo4j GDS
    * also offers via UNDIRECTED orientation).
    *
    * rank₀ = 1/N;  rankₜ₊₁(v) = (1−d)/N + d·Σ_{u∼v} rankₜ(u)/deg(u).
    *
    * Fixed `iters` (vs convergence polling) keeps the operator a pure
    * deterministic function of the edge list — the oracle recomputes
    * the identical recurrence — and each iteration is exactly one
    * join + one partial-agg'd hash-agg, so cost is iters × 2 shuffles
    * of (node, double) pairs regardless of data scale. N and nothing
    * else is collected (one scalar — model-fit class).
    *
    * Output: (node, rank) — ranks unrounded; callers round for
    * cross-engine comparison.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame =
    pageRankWithN(edges, iters, damping)._1

  /** [[pageRank]] plus the node count N it already collects — callers
    * that scale or normalize ranks by N (e.g. the rank·N driver entry)
    * take it from here instead of re-counting the iterated result,
    * which would re-execute the whole join/agg loop a second time
    * (ADVICE r8). */
  def pageRankWithN(edges: DataFrame, iters: Int,
                    damping: Double = 0.85): (DataFrame, Long) = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val und = undirected(edges).persist(StorageLevel.MEMORY_AND_DISK)
    // the degree table doubles as the node table (every node has
    // degree ≥ 1 after symmetrization), so N and the initial ranks
    // both come from it — no separate distinct pass over the edges
    val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // (a, b, deg(a)) — the join payload each round; deg is scale-free
    // per node so this adds one long to each cached edge row
    val withDeg = und.join(deg, "a")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.count() // scalar collect
    var ranks = deg.select(col("a").as("node"))
      .withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      // every node has ≥1 undirected neighbor, so the inner join
      // covers all nodes — no outer-join patch-up row needed
      ranks = withDeg.join(ranks, col("a") === col("node"))
        .select(col("b"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("b").as("node"))
        .agg((lit((1.0 - damping) / n) + lit(damping) * sum(col("c")))
          .as("rank"))
    }
    (ranks, n)
  }

  /** Hop-bounded BFS: exact shortest-path distance (≤ `maxHops`) from
    * the seed set over the undirected graph of `edges`. The Neo4j
    * `shortestPath` / GDS BFS analog, expressed as frontier expansion:
    * each level is one join (frontier ⋈ edges — cost ∝ frontier, not
    * graph) + one distinct + one anti-join against the settled set, so
    * a level never revisits settled nodes and total cost is the
    * reached subgraph, not |V|·hops. Frontiers are persisted (each is
    * consumed twice: next level's join + the settled union).
    *
    * Seeds are rows whether or not they appear in the edge list
    * (an isolated seed reports dist 0 — same contract as the oracle).
    * Output: (node, dist), one row per reached node, minimal dist.
    */
  def bfsDistances(edges: DataFrame, seeds: Seq[Long], maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"bfsDistances: maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    val und = undirected(edges).persist(StorageLevel.MEMORY_AND_DISK)
    var settled = seeds.toDF("node").withColumn("dist", lit(0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = settled
    for (h <- 1 to maxHops) {
      val next = und.join(frontier.select(col("node").as("a")), "a")
        .select(col("b").as("node")).distinct()
        .join(settled.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(h))
        .persist(StorageLevel.MEMORY_AND_DISK)
      settled = settled.unionByName(next)
      frontier = next
    }
    settled
  }

  /** k-core decomposition (Neo4j GDS coreDecomposition, membership
    * form): the maximal subgraph in which every node has degree ≥ k,
    * computed by iterative peeling — drop nodes below degree k,
    * recount, repeat to the fixpoint. Each round is two equi-joins
    * (edge endpoints against the surviving set) + one hash-agg; the
    * surviving set shrinks monotonically, so rounds cost less as they
    * go and the loop converges in peel-depth rounds (≤ 4 on every
    * scale point measured — hub-dominated graphs peel shallowly).
    * localCheckpoint per round (the iterative-lineage discipline);
    * one scalar count per round drives convergence; LOUD error past
    * `maxIters` — a silently-unpeeled result would overstate the core.
    *
    * Output: (node, core_degree) — members with their degree INSIDE
    * the core (the stronger invariant: every core_degree ≥ k).
    */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 30): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    val und = undirected(edges).persist(StorageLevel.MEMORY_AND_DISK)
    var s = und.select(col("a").as("n")).distinct().localCheckpoint()
    var prev = -1L
    var n = s.count()
    var iter = 0
    while (n != prev && iter < maxIters) {
      prev = n
      s = und
        .join(s.select(col("n").as("a")), "a")
        .join(s.select(col("n").as("b")), "b")
        .groupBy(col("a").as("n")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("n")
        .localCheckpoint()
      n = s.count()
      iter += 1
    }
    if (n != prev)
      org.slf4j.LoggerFactory.getLogger(getClass).error(
        s"kCore stopped at maxIters=$maxIters before the peel fixpoint — " +
          "the returned set is a SUPERSET of the true k-core. Raise " +
          "maxIters (rounds needed = peel depth).")
    // final in-core degrees — every one ≥ k by construction
    und.join(s.select(col("n").as("a")), "a")
      .join(s.select(col("n").as("b")), "b")
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("core_degree"))
  }

  /** Node similarity (Neo4j GDS `nodeSimilarity` analog): top-k entity
    * pairs by Jaccard similarity of their feature/neighbor sets, from
    * a bipartite (entity, feature) edge list. The co-occurrence join
    * runs through the feature key — the inverted-index shape of
    * [[Dedup.jaccardPairs]] — with the same two-pass degree cap: a
    * feature shared by more than `featCap` entities is dropped BEFORE
    * the self-join (its pair fan-out is degree², the classic hot-key
    * explosion; capping changes reported set sizes, which is why
    * sizes are computed on the CAPPED relation so the Jaccard stays
    * internally consistent — documented, and the oracle applies the
    * identical cap). Output is bounded top-k via TakeOrderedAndProject
    * (never a global sort), ordered by a scaled-INTEGER similarity
    * key — `floor(inter·10⁹ / union)` — so cross-engine ordering can't
    * diverge on a float ulp.
    *
    * Output: (e1, e2, inter, union_sz, jaccard, sim_key) with e1 < e2.
    */
  def nodeSimilarity(edges: DataFrame, entity: String, feature: String,
                     featCap: Long, topK: Int): DataFrame = {
    val ef = edges.select(col(entity).as("e"), col(feature).as("f")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val okFeat = ef.groupBy("f").agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") <= featCap)
      .select("f")
    val capped = ef.join(okFeat, "f").persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = capped.groupBy("e").agg(count(lit(1)).as("sz"))
    val pairs = capped.as("x")
      .join(capped.as("y"),
        col("x.f") === col("y.f") && col("x.e") < col("y.e"))
      .groupBy(col("x.e").as("e1"), col("y.e").as("e2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("e").as("e1"), col("sz").as("sz1")), "e1")
      .join(sizes.select(col("e").as("e2"), col("sz").as("sz2")), "e2")
      .withColumn("union_sz", col("sz1") + col("sz2") - col("inter"))
      .withColumn("sim_key",
        floor(col("inter") * lit(1000000000L) / col("union_sz")).cast("long"))
      .select(col("e1"), col("e2"), col("inter"), col("union_sz"),
        round(col("inter").cast("double") / col("union_sz"), 6).as("jaccard"),
        col("sim_key"))
      .orderBy(col("sim_key").desc, col("e1"), col("e2"))
      .limit(topK)
  }
}
