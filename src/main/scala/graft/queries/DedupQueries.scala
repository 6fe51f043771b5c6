package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** SURVEY §2.D — dedup family entries with DuckDB oracles (D1/D2/D5;
  * the hash-based D3 MinHash and D4 SimHash variants are not
  * SQL-expressible in DuckDB and ship as rows-only entries in
  * [[SketchQueries]] plus recall invariants in ScalaTest).
  */
object DedupQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // D1: exact content-hash dedup, keep-first.
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("keep_id")),

    // D2: 3-gram shingle Jaccard ≥ 0.5 via inverted-index equi-join
    // with document-frequency cap 1000 (stop-shingle skew bound).
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", n = 3, tau = 0.5, dfCap = 1000L)
        .orderBy("i", "j")),

    // D19 (r15): blocked edit-distance near-dup pairs on the leading
    // 24-char key — the record-linkage fuzzy-match class (typo'd
    // titles/names) the shingle family doesn't cover at string grain.
    // Two-pass prefix/suffix blocking with PROVEN full recall on the
    // len ≥ 2p domain (a single edit cannot break both blocks — see
    // the operator scaladoc); blocked == brute-force spec-pinned.
    "dedup_edit_pairs" -> ((s, dir) =>
      Dedup.editDistancePairs(Tables.load(s, dir, "documents"),
          "doc_id", "text")
        .orderBy("i", "j")),

    // D18 (r14): asymmetric n-gram CONTAINMENT ≥ 0.8 — the
    // subset/superset near-dup class (short doc embedded in a long
    // one) that Jaccard's symmetric denominator structurally misses.
    // Same inverted-index + dfCap plan as D2; only the metric differs.
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", n = 3, tau = 0.8, dfCap = 1000L)
        .orderBy("i", "j")),

    // D5: exact embedding-cosine near-dup pairs ≥ 0.4 (all-pairs
    // correctness baseline; LSH/IVF are the scale path — see E2/E3).
    "dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingPairs(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", tau = 0.4)
        .orderBy("i", "j")),

    // D2 contract at 100×-scale packs (r11, VERDICT r10 #1 — the
    // planted-pair methodology of dedup_embedding_lsh_planted_check
    // brought to the TEXT pair family): recall of the inverted-index
    // Jaccard operator over PLANTED near-dup pairs
    // (scale_up.py --plant-text-dups, id-mapped j = i + 5e8), whose
    // exact capped Jaccard both engines recompute LINEARLY — the flat
    // pack's exact pair oracle is a quadratic explode at 500k docs.
    // The operator is EXACT, so the floor is recall 1.0 (every
    // planted pair at τ, not a sketch fraction). Unplanted corpora →
    // empty truth, trivial regime shown honestly.
    "dedup_ngram_planted_check" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Planted.recallRow(
        Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 3, tau = 0.5, dfCap = 1000L),
        Planted.ngramTruth(docs, n = 3, tau = 0.5, dfCap = 1000L),
        minRecall = 1.0)
    }),

    // D18 contract at 100×-scale packs: containmentPairs is exact, so
    // the floor is recall 1.0 over the linearly-recomputed planted
    // pairs whose exact capped containment clears τ.
    "dedup_containment_planted_check" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Planted.recallRow(
        Dedup.containmentPairs(docs, "doc_id", "text",
          n = 3, tau = 0.8, dfCap = 1000L),
        Planted.ngramContainTruth(docs, n = 3, tau = 0.8, dfCap = 1000L),
        minRecall = 1.0)
    })
  )

  private val normSql =
    """regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"""

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY md5(text) ORDER BY keep_id""",
    "dedup_edit_pairs" ->
      """WITH k AS (SELECT doc_id AS id, lower(substr(text, 1, 24)) AS k
                    FROM documents WHERE text IS NOT NULL),
           kd AS (SELECT * FROM k WHERE len(k) >= 20),
           bl AS (SELECT id, k, substr(k, 1, 10) AS blk FROM kd
                  UNION ALL
                  SELECT id, k, substr(k, -10) AS blk FROM kd),
           keep AS (SELECT blk FROM bl GROUP BY blk
                    HAVING count(*) <= 10000),
           bb AS (SELECT bl.* FROM bl JOIN keep USING (blk)),
           cand AS (SELECT DISTINCT a.id AS i, b.id AS j,
                           a.k AS ki, b.k AS kj
                    FROM bb a JOIN bb b ON a.blk = b.blk AND a.id < b.id
                    WHERE abs(len(a.k) - len(b.k)) <= 1)
         SELECT i, j, CAST(levenshtein(ki, kj) AS BIGINT) AS dist
         FROM cand WHERE levenshtein(ki, kj) <= 1 ORDER BY i, j""",
    "dedup_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS arr FROM documents),
          sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS tok
                 FROM t, unnest(range(1, len(arr) - 1)) AS r(i)
                 WHERE len(arr) >= 3),
          idx AS (SELECT doc_id, tok FROM sh
                  QUALIFY count(*) OVER (PARTITION BY tok) <= 1000),
          sizes AS (SELECT doc_id, count(*) AS sz FROM idx GROUP BY doc_id),
          pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
                    FROM idx a JOIN idx b USING (tok)
                    WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
          SELECT i, j,
                 round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
          FROM pairs
          JOIN sizes sa ON pairs.i = sa.doc_id
          JOIN sizes sb ON pairs.j = sb.doc_id
          WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5
          ORDER BY i, j""",
    "dedup_containment" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS arr FROM documents),
          sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS tok
                 FROM t, unnest(range(1, len(arr) - 1)) AS r(i)
                 WHERE len(arr) >= 3),
          idx AS (SELECT doc_id, tok FROM sh
                  QUALIFY count(*) OVER (PARTITION BY tok) <= 1000),
          sizes AS (SELECT doc_id, count(*) AS sz FROM idx GROUP BY doc_id),
          pairs AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
                    FROM idx a JOIN idx b USING (tok)
                    WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
          SELECT i, j,
                 round(inter * 1.0 / least(sa.sz, sb.sz), 4) AS containment
          FROM pairs
          JOIN sizes sa ON pairs.i = sa.doc_id
          JOIN sizes sb ON pairs.j = sb.doc_id
          WHERE inter * 1.0 / least(sa.sz, sb.sz) >= 0.8
          ORDER BY i, j""",
    // LINEAR planted-pair recompute (id-mapped join at +5e8 replaces
    // the quadratic idx-self-join of the dedup_ngram_jaccard oracle);
    // recall_ok is the literal expectation — it only hash-matches
    // when the Spark verdict is true
    "dedup_ngram_planted_check" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS arr FROM documents),
          sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS tok
                 FROM t, unnest(range(1, len(arr) - 1)) AS r(i)
                 WHERE len(arr) >= 3),
          idx AS (SELECT doc_id, tok FROM sh
                  QUALIFY count(*) OVER (PARTITION BY tok) <= 1000),
          sizes AS (SELECT doc_id, count(*) AS sz FROM idx GROUP BY doc_id),
          inter AS (SELECT a.doc_id AS i, count(*) AS inter
                    FROM idx a JOIN idx b
                      ON b.doc_id = a.doc_id + 500000000 AND a.tok = b.tok
                    GROUP BY 1),
          p AS (SELECT i FROM inter
                JOIN sizes sa ON sa.doc_id = i
                JOIN sizes sb ON sb.doc_id = i + 500000000
                WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5e0)
          SELECT count(*) AS exact_pairs, true AS recall_ok FROM p""",
    "dedup_containment_planted_check" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS arr FROM documents),
          sh AS (SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS tok
                 FROM t, unnest(range(1, len(arr) - 1)) AS r(i)
                 WHERE len(arr) >= 3),
          idx AS (SELECT doc_id, tok FROM sh
                  QUALIFY count(*) OVER (PARTITION BY tok) <= 1000),
          sizes AS (SELECT doc_id, count(*) AS sz FROM idx GROUP BY doc_id),
          inter AS (SELECT a.doc_id AS i, count(*) AS inter
                    FROM idx a JOIN idx b
                      ON b.doc_id = a.doc_id + 500000000 AND a.tok = b.tok
                    GROUP BY 1),
          p AS (SELECT i FROM inter
                JOIN sizes sa ON sa.doc_id = i
                JOIN sizes sb ON sb.doc_id = i + 500000000
                WHERE inter * 1.0 / least(sa.sz, sb.sz) >= 0.8e0)
          SELECT count(*) AS exact_pairs, true AS recall_ok FROM p""",
    "dedup_embedding" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v)
         SELECT a.vec_id AS i, b.vec_id AS j,
                round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
         FROM n a JOIN n b ON a.vec_id < b.vec_id
         WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
         ORDER BY i, j"""
  )
}
