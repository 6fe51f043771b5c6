package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text normalization / tokenization / shingling shared by the text
  * (F1–F4) and dedup (D1–D4) families. All pure column expressions —
  * codegen'd by Tungsten, no UDFs — and each has an exact DuckDB
  * mirror (SURVEY §6: single-space split on space-normalized text) so
  * the oracle can replicate token-level semantics bit-for-bit.
  */
object TextOps {

  /** Canonical normal form: lowercase, trimmed, whitespace collapsed
    * to single spaces. DuckDB mirror:
    * `regexp_replace(trim(lower(text)), '\s+', ' ', 'g')`.
    */
  def norm(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Single-space tokenization of [[norm]] output.
    * DuckDB mirror: `string_split(norm, ' ')`. */
  def tokens(text: Column): Column = split(norm(text), " ")

  /** Stopword set used by quality scoring / langid (drawn from the
    * corpus vocabulary; the reference pipeline has no text ops — this
    * family is the LLM-pipeline extension the brief asks for). */
  val Stopwords: Seq[String] = Seq("the", "a")

  /** Occurrence count of any of `words` in the token array.
    *
    * CALLER CONTRACT (the [[ngrams]] stance): pass a MATERIALIZED
    * array column — a non-attribute child is re-evaluated per
    * reference site by Catalyst, and quality/langid reference token
    * counts in up to five output columns. */
  def occurrences(toks: Column, words: Seq[String]): Column = {
    // r11: routed through the native codegen'd CountIn kernel — the
    // filter() lambda below evaluates interpreted per element, the
    // measured tax behind text_quality's 13.9 s/500k-doc projection
    // (VERDICT r10). [[occurrencesHof]] retains the original as the
    // differential-spec reference / DuckDB-mirror shape.
    import org.apache.spark.sql.{GraftExpressionBridge => B}
    B.column(graft.functions.CountIn(B.expression(toks), words))
  }

  /** The original higher-order-function formulation of
    * [[occurrences]] — differential-spec reference. */
  def occurrencesHof(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Per-row frequency profile struct(n, d, tp) — total / distinct /
    * top-multiplicity of the array's elements (native [[
    * graft.functions.TopFreq]] kernel). The repetition-filter
    * statistics as a ZERO-shuffle projection: the exploded
    * `groupBy(doc, gram)` form moves every distinct (doc, gram) pair
    * of the corpus through two exchanges to compute per-document
    * facts. Empty array → (0, 0, 0); callers coalesce 0/0 to 0. */
  def tokenStats(toks: Column): Column = {
    import org.apache.spark.sql.{GraftExpressionBridge => B}
    B.column(graft.functions.TopFreq(B.expression(toks)))
  }

  /** Fused unigram + 2-gram repetition profile struct(n, d, tp, bn,
    * bd, btp) in ONE pass (native [[graft.functions.RepStats]]
    * kernel) — ≡ `(tokenStats(toks), tokenStats(ngrams(toks, 2)))`
    * (differential-spec pinned) without materializing the 2-gram
    * strings: interned-id pair counting. The text_repetition hot
    * path. */
  def repStats(toks: Column): Column = {
    import org.apache.spark.sql.{GraftExpressionBridge => B}
    B.column(graft.functions.RepStats(B.expression(toks)))
  }

  /** BPE-style subword-ish tokenization: alphabetic runs, digit runs,
    * and single non-alphanumeric marks as separate tokens (the
    * word/number/punctuation split every BPE pre-tokenizer performs
    * before merges — the right unit for token-count accounting when
    * the real tokenizer isn't available engine-side).
    * DuckDB mirror: `regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')`.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Widen `df` and materialize [[tokens]] of `textCol` into an array
    * column named `as` — THE shape every ngram/shingle explosion must
    * consume (the [[ngrams]] caller contract): the widen parallelizes
    * past few-partition parquet inputs, and binding the token array
    * as an attribute below the Generate makes the lambda's
    * element_at references O(1) array reads instead of per-element
    * re-runs of the split chain (measured 25× on the sf0.1 3-gram
    * explode). One definition so no future call site can forget the
    * dance. `keep` columns ride along unchanged.
    */
  def withTokens(df: DataFrame, textCol: String, keep: Seq[Column],
                 as: String = "graft_toks"): DataFrame =
    Par.widen(df).select(keep :+ tokens(col(textCol)).as(as): _*)

  /** Fixed-size k-word chunks of a token array — the span unit for
    * [[Dedup.spanDedup]] on corpora without natural line/sentence
    * boundaries (chunk i = tokens [i·k, i·k+k), last chunk ragged).
    * DuckDB mirror: `array_to_string(toks[(i*k+1):(i*k+k)], ' ')`
    * over `unnest(generate_series(0, ceil(len(toks)/k) - 1))`.
    */
  def wordChunks(toks: Column, k: Int): Column = {
    require(k > 0, "chunk size must be positive")
    // r10: routed through the native codegen'd WordChunks kernel —
    // the HOF chain below is interpreted (lambdas never enter
    // whole-stage codegen) and dominated dedup_spans at the 100×
    // pack; [[wordChunksHof]] retains it as the differential-spec
    // reference and the 1:1 shape of the DuckDB oracle mirror.
    import org.apache.spark.sql.{GraftExpressionBridge => B}
    B.column(graft.functions.WordChunks(B.expression(toks), k))
  }

  /** The original higher-order-function formulation of
    * [[wordChunks]] — differential-spec reference. */
  def wordChunksHof(toks: Column, k: Int): Column = {
    require(k > 0, "chunk size must be positive")
    when(size(toks) <= 0, array().cast("array<string>"))
      // sequence() with start > stop counts DOWN — the empty-array
      // case above keeps it from fabricating chunk [0, -1]
      .otherwise(transform(
        sequence(lit(0), ceil(size(toks) / lit(k.toDouble)).cast("int") - 1),
        i => array_join(slice(toks, i * k + 1, lit(k)), " ")))
  }

  /** F12 (r10): BM25 relevance of every document against the corpus's
    * own top-`nTerms` tokens (count desc, token asc — deterministic).
    * Okapi BM25 with k1 = 1.2, b = 0.75:
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·len/avglen)),
    *   idf = ln((N − df + 0.5)/(df + 0.5) + 1).
    * Dataflow: one token hash-agg for term stats, tf restricted to
    * the term broadcast BEFORE its per-(doc,term) agg, doc lengths
    * one hash-agg, corpus scalars a 1-row crossJoin; avglen is an
    * EXPLICIT exact-long-sum / count division (engine avg()
    * implementations differ). Output (doc_id, n_terms, bm25) for
    * docs holding ≥ 1 query term, bm25 rounded 4dp (the ln/sum-order
    * ulp stance). */
  def bm25(docs: org.apache.spark.sql.DataFrame, idCol: String,
           textCol: String, nTerms: Int = 5): org.apache.spark.sql.DataFrame = {
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val terms = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(nTerms).select("tok")
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val stats = dl.agg(count(lit(1)).as("nd"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avglen"))
    val tf = toks.join(broadcast(terms), "tok")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("nd") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))
      .withColumn("sc",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("len") / col("avglen"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("sc")), 4).as("bm25"))
  }

  /** Per-document top-`k` keywords by smoothed TF-IDF — the keyword-
    * extraction complement of [[bm25]] (bm25 scores DOCUMENTS against
    * one corpus-derived query; this ranks TERMS within each document,
    * the classic tagging / feature-selection signal in corpus
    * curation):
    *   score(d, t) = tf(d,t) · (ln((N+1)/(df(t)+1)) + 1)
    * (sklearn's smooth_idf form — the +1s keep corpus-universal terms
    * at a positive score instead of exactly 0, so ranking stays total).
    * Rounded 4dp BEFORE ranking: the rank key must be the same value
    * both engines compare, and 4dp is the repo-wide stance for
    * absorbing ln ulp differences; ties break by term ascending, so
    * the per-doc top-k is a deterministic cross-engine contract.
    *
    * Dataflow: one (doc, term) hash-agg (map-side combined), one
    * vocab hash-agg for df, N from the doc-length rollup as a 1-row
    * broadcast (the bm25 corpus-scalar pattern), tf ⋈ df on term
    * (AQE broadcasts while the vocab fits), then ONE per-doc
    * row_number window bounded by the per-doc distinct-term count.
    * Output: (doc_id, term, tf, df, score), k rows per doc.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val nd = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
      .agg(count(lit(1)).as("nd"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    tf.join(dfreq, "tok").crossJoin(broadcast(nd))
      .withColumn("score",
        round(col("tf") * (log((col("nd") + lit(1.0)) /
          (col("df") + lit(1.0))) + lit(1.0)), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("tok").as("term"),
        col("tf"), col("df"), col("score"))
  }

  /** Distinct word n-gram shingles of the token array. Shingling (vs
    * unigram word sets) is what makes Jaccard discriminative on a
    * small vocabulary: contiguous n-grams capture ordering, so only
    * genuinely near-duplicate documents overlap.
    * DuckDB mirror: `arr[i] || ' ' || arr[i+1] || ... ` over
    * `unnest(range(1, len(arr) - n + 2))`.
    */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(ngrams(toks, n))

  /** ALL contiguous word n-grams (duplicates kept — the repetition
    * signals need the multiset; [[shingles]] wraps this with
    * array_distinct for the set-semantics dedup family).
    *
    * CALLER CONTRACT: pass `toks` as a MATERIALIZED array column (a
    * projection the caller lays down before the explode), never the
    * raw [[tokens]] expression. The lambda below references `toks`
    * n times per gram position, and Catalyst evaluates a non-attribute
    * reference per element — n·positions re-runs of the whole
    * split(regexp_replace(text)) chain per document (measured 25× on
    * the sf0.1 3-gram explode). Bound as an attribute each reference
    * is an O(1) array read. */
  def ngrams(toks: Column, n: Int): Column = {
    // r10: routed through the native codegen'd NGrams kernel — like
    // wordChunks, the HOF chain below evaluates interpreted and gets
    // re-evaluated by a downstream explode's inferred filters;
    // [[ngramsHof]] retains it as the differential-spec reference.
    // The materialized-toks caller contract above still applies: the
    // kernel reads its child once per evaluation, but a non-attribute
    // child is still re-evaluated per reference SITE by Catalyst.
    import org.apache.spark.sql.{GraftExpressionBridge => B}
    B.column(graft.functions.NGrams(B.expression(toks), n))
  }

  /** The original higher-order-function formulation of [[ngrams]] —
    * differential-spec reference. */
  def ngramsHof(toks: Column, n: Int): Column = {
    // statically unrolled element_at chain (n is a plan-time constant):
    // no per-shingle array slicing, just n O(1) element reads + concat.
    val sh = transform(
      sequence(lit(1), size(toks) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*))
    // sequence(1, k) counts DOWN when k < 1 — guard short docs.
    when(size(toks) >= n, sh).otherwise(array())
  }
}
