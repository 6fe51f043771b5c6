package graft.queries

import graft.Tables
import graft.operators.{Dedup, Sketches, Similarity}
import org.apache.spark.sql.functions._

/** SURVEY §2.D3/D4/E2/E3 — hash-sketch dedup and approximate
  * similarity search. The signatures (xxhash64-based) are not
  * expressible in DuckDB SQL, so these are rows-only driver entries;
  * their quality invariants (lossless hamming bands, recall vs the
  * exact baselines) are asserted in SketchSpec on sf0.001.
  */
object SketchQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // D3: MinHash (k=16) + 4-band LSH candidates, verified on the
    // full signature (estimated Jaccard ≥ 0.5).
    "dedup_minhash_lsh" -> ((s, dir) =>
      Sketches.minhashLsh(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("i", "j")),

    // D4: 64-bit SimHash, 16-bit hamming bands (lossless ≤ 3),
    // exact popcount verification.
    "dedup_simhash" -> ((s, dir) =>
      Sketches.simhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("i", "j")),

    // E2: random-hyperplane LSH ANN, 16 tables × 4 bits, top-10.
    "sim_lsh_ann" -> ((s, dir) =>
      Similarity.lshTopK(Tables.load(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("q_id", "rk")),

    // E3: IVF ANN, 16 centroids × 2 Lloyd iterations, nprobe=4, top-10.
    "sim_ivf_ann" -> ((s, dir) =>
      Similarity.ivfTopK(Tables.load(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("q_id", "rk")),

    // D5-at-scale: embedding near-dup pairs via LSH candidates + exact
    // cosine verify — the scalable twin of dedup_embedding (every
    // returned pair is exactly-scored; SketchSpec pins precision 1.0
    // and recall vs the all-pairs baseline).
    "dedup_embedding_lsh" -> ((s, dir) =>
      Dedup.embeddingPairsLsh(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", tau = 0.4)
        .orderBy("i", "j"))
  )

  // Not SQL-expressible (hash sketches) → rows-only checks.
  val oracles: Map[String, String] = Map.empty
}
