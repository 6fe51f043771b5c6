package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.Dedup

/** SURVEY §2.E — similarity search over `embeddings`. E1 is the exact
  * brute-force baseline with a DuckDB oracle; the approximate LSH/IVF
  * paths (E2/E3) live in [[SketchQueries]] as rows-only entries with
  * recall invariants in ScalaTest.
  */
object SimilarityQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // E1: exact cosine similarity of every query vector (vec_id ≡ 0
    // mod 100) against the corpus, threshold output (≥ 0.3) rather
    // than top-k so the oracle compare is tie-stable. The query side
    // is tiny and broadcast; the corpus side streams through one
    // nested-loop pass — the exact-search plan you'd also run at
    // scale for a small query batch.
    "sim_bruteforce_topk" -> ((s, dir) =>
      thresholdSearch(
        Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
          .withColumn("nrm", VectorFunctions.l2(col("v"))))),

    // Quantized search path: corpus stored int8-quantized (4× smaller
    // than float32 — the storage play for a 100 TB embedding corpus),
    // scored against dequantized vectors with the same protocol as
    // E1 (shared thresholdSearch — the spec's recall comparison is
    // protocol-identical by construction). Quantization isn't cleanly
    // SQL-expressible → rows-only driver check; SketchSpec pins
    // reconstruction error and recall vs the exact result.
    "sim_quantized_topk" -> ((s, dir) => {
      // Par.widen's exchange sits AFTER the dequantize projection on
      // purpose: it materializes the reconstructed vectors + norms
      // once per row, stopping CollapseProject from substituting the
      // (interpreted, higher-order) quantize/dequantize expressions
      // into the per-pair join arithmetic
      thresholdSearch(graft.operators.Par.widen(
        Tables.load(s, dir, "embeddings")
          .select(col("vec_id"),
            VectorFunctions.quantizeInt8(
              VectorFunctions.asDouble(col("embedding"))).as("qv"))
          .select(col("vec_id"),
            VectorFunctions.dequantizeInt8(col("qv")).as("v"))
          .withColumn("nrm", VectorFunctions.l2(col("v")))))
    })
  )

  /** Shared E1/E4 search protocol over a (vec_id, v, nrm) frame:
    * queries = vec_id ≡ 0 mod 100 (broadcast), threshold cosine ≥ 0.3,
    * deterministic ordering. One definition so exact and quantized
    * runs are always comparing the same protocol. Like the D5
    * baseline, the corpus-side nested-loop scan is guarded: above
    * `maxRows` the exact scan is opt-in (the scale path is
    * Similarity.lshTopK / ivfTopK). */
  private def thresholdSearch(v0: org.apache.spark.sql.DataFrame,
                              maxRows: Long = 100000L,
                              allowAllPairs: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val v = graft.operators.Guard.allPairsBaseline(v0, maxRows, allowAllPairs,
      "SimilarityQueries.thresholdSearch", "Similarity.lshTopK/ivfTopK")
    val q = v.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cos = VectorFunctions.cosinePre(
      VectorFunctions.dot(col("qv"), col("v")), col("qn"), col("nrm"))
    v.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("cosine", cos)
      .filter(col("cosine") >= 0.3)
      .select(col("q_id"), col("vec_id"), round(col("cosine"), 4).as("cosine"))
      .orderBy("q_id", "vec_id")
  }

  val oracles: Map[String, String] = Map(
    "sim_bruteforce_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
         q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0)
         SELECT q_id, vec_id,
                round(list_dot_product(qv, v) / (qn * nrm), 4) AS cosine
         FROM q JOIN n ON q_id <> vec_id
         WHERE list_dot_product(qv, v) / (qn * nrm) >= 0.3
         ORDER BY q_id, vec_id"""
  )
}
