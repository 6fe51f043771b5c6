package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** SURVEY §2.F — text analysis over `documents`: quality scoring,
  * token accounting, marker-based language ID, and content
  * fingerprinting. All pure built-in column expressions (whole-stage
  * codegen, no UDFs); every query is a narrow scan → per-row transform
  * (or one hash-agg), so the plans are embarrassingly parallel at any
  * scale — no shuffles except the final rollups.
  */
object TextQueries extends QueryPack {

  // Marker tokens per language for the n-gram langid heuristic.
  // Disjoint sets drawn from the corpus vocabulary; prediction =
  // argmax of marker occurrences with a fixed deterministic
  // tie-break (higher lang code wins), mirrored in the oracle CASE.
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("table", "row"),
    "en" -> Seq("the", "a"),
    "es" -> Seq("data", "value"),
    "fr" -> Seq("column", "line"),
    "zh" -> Seq("hash", "scan"))

  val queries: Map[String, Q] = Map(
    // F8: document-store ingest gate — null/blank payloads, control
    // characters, and length extremes in one aggregate pass; the text
    // member of the integrity-gate trio (graph_integrity /
    // embed_integrity). Runs BEFORE tokenization-dependent ops, which
    // is the point: size(null)=-1 class hazards start here.
    "text_integrity" -> ((s, dir) =>
      Tables.load(s, dir, "documents").agg(
        count(lit(1)).as("n_docs"),
        count(when(col("text").isNull, 1)).as("null_docs"),
        count(when(col("text").isNotNull &&
          trim(col("text")) === "", 1)).as("blank_docs"),
        count(when(col("text").rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), 1))
          .as("ctl_char_docs"),
        max(length(col("text"))).cast("long").as("max_chars"),
        min(length(col("text"))).cast("long").as("min_chars"))),

    // F1: per-document quality metrics — length, token count, stopword
    // ratio, composite score. One narrow projection, zero shuffles
    // (the ORDER BY is the oracle-determinism tail only).
    // r11 (VERDICT r10 #2): the token array is MATERIALIZED once in a
    // lower projection — the raw tokens(text) expression was
    // re-evaluated per reference site (five output columns → five
    // split(regexp_replace(...)) runs per row) — and the stopword
    // count runs the native CountIn kernel instead of the
    // interpreted filter() lambda. 13.9 s → kernel-class at the 100×
    // pack for byte-identical output.
    "text_quality" -> ((s, dir) => {
      val nToks = size(col("t"))
      val stopRatio =
        TextOps.occurrences(col("t"), TextOps.Stopwords).cast("double") / nToks
      TextOps.withTokens(
          Tables.load(s, dir, "documents"), "text",
          Seq(col("doc_id"),
            length(col("text")).cast("long").as("n_chars_calc"),
            // chars-sans-spaces rides the same lower projection so the
            // norm chain runs once, next to the tokenization
            length(regexp_replace(TextOps.norm(col("text")), " ", ""))
              .as("nsp")),
          as = "t")
        .select(
          col("doc_id"),
          col("n_chars_calc"),
          nToks.cast("long").as("n_tokens"),
          round(stopRatio, 4).as("stop_ratio"),
          round(col("nsp").cast("double") / nToks, 4).as("avg_tok_len"),
          round(least(nToks.cast("double") / lit(100.0), lit(1.0)) *
            (lit(1.0) - stopRatio), 4).as("quality"))
        .orderBy("doc_id")
    }),

    // F2: corpus token rollup per language — docs, tokens, vocabulary
    // size. Explode → single hash-agg; partial aggregation collapses
    // the count map-side.
    "text_tokens" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
                explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("lang")
        .agg(
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("vocab"),
          round(count(lit(1)).cast("double") / countDistinct(col("doc_id")), 4)
            .as("avg_tokens"))
        .orderBy("lang")),

    // F2b: BPE-style token accounting — the unit LLM data budgets are
    // written in. Whitespace counting (text_tokens) undercounts
    // punctuation-heavy text; the BPE-ish pre-tokenizer split
    // (word/number/punct runs) tracks real tokenizer counts far more
    // closely. Pure per-row regexp + one tiny rollup.
    "text_tokens_bpe" -> ((s, dir) => {
      val ws = size(TextOps.tokens(col("text")))
      val bpe = size(TextOps.bpeishTokens(col("text")))
      Tables.load(s, dir, "documents")
        .select(col("lang"), ws.as("ws"), bpe.as("bpe"))
        .groupBy("lang")
        .agg(sum(col("ws")).cast("long").as("ws_tokens"),
             sum(col("bpe")).cast("long").as("bpe_tokens"),
             round(avg(col("bpe").cast("double") / col("ws")), 4).as("bpe_per_word"))
        .orderBy("lang")
    }),

    // F3: marker-token language ID → confusion rollup vs the labeled
    // lang column. Scores are per-row expressions; the only shuffle is
    // the tiny (lang × pred) aggregation.
    "text_langid" -> ((s, dir) => {
      // r11: tokens materialized once (five marker sets each re-ran
      // the split chain on the raw expression), scores via the native
      // CountIn kernel — the text_quality treatment
      val scored = markers.foldLeft(
        TextOps.withTokens(Tables.load(s, dir, "documents"),
          "text", Seq(col("lang")), as = "t")) {
        case (df, (lang, words)) =>
          df.withColumn(s"s_$lang", TextOps.occurrences(col("t"), words))
      }
      val best = greatest(markers.map { case (l, _) => col(s"s_$l") }: _*)
      // ties break toward the alphabetically greatest language —
      // mirrored by the oracle's CASE order (zh checked first).
      val pred = markers.reverse.tail.foldLeft(
        when(col(s"s_${markers.reverse.head._1}") === best,
             markers.reverse.head._1)) {
        case (acc, (l, _)) => acc.when(col(s"s_$l") === best, l)
      }
      scored
        .withColumn("pred_lang", coalesce(pred, lit(markers.head._1)))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "pred_lang")
    }),

    // F5: repetition quality signals (the Gopher-style "repetitious
    // document" filters): type-token ratio, most-common-token
    // fraction, most-common-2-gram fraction.
    // r11 (VERDICT r10 #2): per-row native RepStats kernel — the stats
    // are per-document facts, and the previous explode → two stacked
    // hash-aggs per n-gram order shuffled every distinct (doc, gram)
    // pair of the corpus (~40M rows at 100×) through two exchanges
    // just to fold each document back together. Now a ZERO-shuffle
    // projection: ONE fused pass per row computes unigram AND bigram
    // profiles (interned-id pair counting — the 2-gram strings are
    // never even built); the exploded form remains the differential-
    // spec reference chain and the oracle shape.
    "text_repetition" -> ((s, dir) =>
      tokenized(s, dir)
        // explode-drop parity: a null token array emitted no rows in
        // the exploded form (and no rows in the oracle's unnest)
        .filter(col("t").isNotNull)
        .select(col("doc_id"), TextOps.repStats(col("t")).as("r"))
        .select(col("doc_id"),
          col("r.n").as("n_tokens"),
          round(col("r.d").cast("double") / col("r.n"), 4).as("ttr"),
          round(col("r.tp").cast("double") / col("r.n"), 4).as("top_tok_frac"),
          // one-token docs have zero 2-grams: 0/0 → null → 0.0, the
          // exploded form's absent-row left join
          coalesce(round(col("r.btp").cast("double") / col("r.bn"), 4),
            lit(0.0)).as("top_2gram_frac"))
        .orderBy("doc_id")),

    // F6: corpus-wide top-k n-grams — the boilerplate detector a
    // curation run uses to find template headers/footers worth
    // stripping. Two STACKED hash-aggs, not count+countDistinct in
    // one: the fused form plans an Expand that doubles every exploded
    // gram row before the partial agg (measured 8× slower at sf0.1),
    // while stacking aggregates (gram, doc) counts first — map-side
    // partials collapse within-doc repeats — and rolls the already-
    // distinct pairs up per gram with a plain sum/count. The top-k is
    // TakeOrderedAndProject: the gram universe is never globally
    // sorted.
    "corpus_ngrams" -> ((s, dir) =>
      tokenized(s, dir)
        .select(col("doc_id"), explode(TextOps.ngrams(col("t"), 3)).as("gram"))
        .groupBy("gram", "doc_id").agg(count(lit(1)).as("c"))
        .groupBy("gram")
        .agg(sum(col("c")).cast("long").as("cnt"),
             count(lit(1)).as("n_docs"))
        .orderBy(col("cnt").desc, col("gram"))
        .limit(20)),

    // F15 (r14): PMI-style collocation mining — the top bigrams by
    // LIFT p(xy)/(p(x)·p(y)) with min-support 5, the phrase-detection
    // pass (word2vec-phrases / Gensim Phrases) a corpus pipeline runs
    // before tokenizer training. Lift ranks identically to PMI (log is
    // monotone) while staying log-free: every term is a count ratio,
    // and both engines evaluate the SAME IEEE division tree, so the
    // doubles agree bit-for-bit at any magnitude. Scale shape: bigram
    // and unigram counts are map-side-combinable hash-aggs; the
    // min-support filter shrinks the bigram side BEFORE the two
    // word-keyed joins; the corpus totals ride in as broadcast
    // scalars; the final top-k is TakeOrderedAndProject.
    "text_pmi_bigrams" -> ((s, dir) => {
      val toks = tokenized(s, dir).select(col("doc_id"), col("t"))
      val bStream = toks.select(explode(TextOps.ngrams(col("t"), 2)).as("g"))
      val uStream = toks.select(explode(col("t")).as("w"))
      val bc = bStream.groupBy("g").agg(count(lit(1)).as("nxy"))
        .filter(col("nxy") >= 5)
        .select(split(col("g"), " ").getItem(0).as("x"),
          split(col("g"), " ").getItem(1).as("y"), col("nxy"))
      val uc = uStream.groupBy("w").agg(count(lit(1)).as("c"))
      val nt = uStream.agg(count(lit(1)).as("n_total"))
      val bt = bStream.agg(count(lit(1)).as("b_total"))
      val lift = (col("nxy") * lit(1.0) / col("b_total")) /
        ((col("cx") * lit(1.0) / col("n_total")) *
         (col("cy") * lit(1.0) / col("n_total")))
      bc.join(uc.select(col("w").as("x"), col("c").as("cx")), "x")
        .join(uc.select(col("w").as("y"), col("c").as("cy")), "y")
        .crossJoin(broadcast(nt)).crossJoin(broadcast(bt))
        .select(col("x"), col("y"), col("nxy"),
          round(lift, 4).as("lift"), lift.as("_raw"))
        .orderBy(col("_raw").desc, col("x"), col("y"))
        .limit(30)
        .select("x", "y", "nxy", "lift")
    }),

    // F7: the curation filter funnel — per-rule drop accounting, the
    // first report a corpus-quality run produces (how much each Gopher-
    // style rule removes, and what survives them all). One pass over
    // the materialized token column computes every rule flag; the
    // per-rule rows come from exploding a constant-width rule array —
    // a 5× row blow-up into a 5-group hash-agg, not 5 corpus scans.
    "text_quality_funnel" -> ((s, dir) => {
      val t = col("t")
      val nToks = size(t)
      val ttr = size(array_distinct(t)).cast("double") / nToks
      val stopRatio = TextOps.occurrences(t, TextOps.Stopwords)
        .cast("double") / nToks
      // kept is DERIVED from the drop rules, not a second copy of the
      // thresholds — tuning one rule cannot desynchronize the funnel
      val drops = Seq(
        "1_short_doc" -> (nToks < 30),
        "2_long_doc" -> (nToks > 90),
        "3_repetitious" -> (ttr < 0.45),
        "4_low_stopword" -> (stopRatio < 0.01))
      val rules = drops :+ ("5_kept" -> !drops.map(_._2).reduce(_ || _))
      // null text is excluded EXPLICITLY on both sides (oracle: WHERE
      // text IS NOT NULL): Spark's size(null) = -1 would classify a
      // null-text row as 1_short_doc while DuckDB's NULL comparisons
      // fall through every rule to 5_kept — a latent hash mismatch the
      // moment the corpus grows a null (ADVICE r4; same stance as
      // Sketches.simhashSketch's raw-text filter)
      TextOps.withTokens(
          Tables.load(s, dir, "documents").select("doc_id", "text")
            .filter(col("text").isNotNull),
          "text", Seq(col("doc_id")), as = "t")
        .select(explode(array(rules.map { case (name, flag) =>
          struct(lit(name).as("rule"), flag.cast("int").as("hit"))
        }: _*)).as("r"))
        .groupBy(col("r.rule").as("rule"))
        .agg(sum(col("r.hit")).cast("long").as("n_docs"))
        .orderBy("rule")
    }),

    // F9 (new r6): PII detection/redaction — per-pattern counts on the
    // original text plus md5 of the scrubbed form (replacement parity
    // proven without hauling payloads through the compare). Patterns
    // live in the Java∩RE2-identical subset so the DuckDB oracle runs
    // the LITERAL same regexes. Null texts excluded on both sides.
    "text_pii" -> ((s, dir) =>
      graft.operators.Pii.redact(
          Tables.load(s, dir, "documents")
            .filter(col("text").isNotNull).select("doc_id", "text"),
          "text")
        .select(col("doc_id"),
          col("n_emails").cast("long").as("n_emails"),
          col("n_ips").cast("long").as("n_ips"),
          col("n_ids").cast("long").as("n_ids"),
          col("n_phones").cast("long").as("n_phones"),
          md5(col("scrubbed")).as("scrub_md5"))
        .orderBy("doc_id")),

    // F4: content fingerprints — md5 of the normal form plus a prefix
    // fingerprint (rolling-hash analog: near-dups created by
    // truncation share the prefix fingerprint). Pure projection.
    "text_fingerprint" -> ((s, dir) => {
      val n = TextOps.norm(col("text"))
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          md5(n).as("fp"),
          md5(substring(n, 1, 100)).as("fp_prefix"))
        .orderBy("doc_id")
    }),

    // F14 (r13): model-based quality filtering — the fastText/linear
    // classifier filter stage (the FineWeb/CCNet "quality model"
    // pass) with a DETERMINISTIC hashed linear model so the WHOLE
    // dataflow is FULL-oracle-checkable: tokens hash into V=4096
    // buckets (the hashing trick — collisions share a weight), the
    // bucket→weight table is derived from md5 (integer weights in
    // [-500, 500]; in production this table is the trained model's
    // weights, loaded not derived — the swap point), and the doc
    // score is the EXACT integer weight sum normalized to [-1, 1].
    // Dataflow shape at scale: the weight table is V rows and
    // broadcast; the per-doc reduce is one hash-agg with map-side
    // partials — one shuffle of (doc_id, partial sum), never token
    // volume.
    "text_classifier_score" -> ((s, dir) => {
      val V = 4096
      val weights = s.range(V).select(col("id").as("bucket"),
        (conv(substring(md5(concat(lit("w"), col("id").cast("string"))),
            1, 8), 16, 10).cast("long") % 1001 - 500).as("w"))
      val toks = TextOps.withTokens(
          Tables.load(s, dir, "documents").filter(col("text").isNotNull),
          "text", Seq(col("doc_id")))
        .select(col("doc_id"), explode(col("graft_toks")).as("tok"))
      // score at 6dp via the exact-scaled-integer discipline (the
      // cdc_activity_heatmap finding: round(double) at a tie is not
      // cross-engine-stable): micro = floor(raw·10⁶ / (n·500)) =
      // floor(raw·2000 / n) in pure integer arithmetic (the numerator
      // minus its pmod is exactly divisible, so the division is exact
      // under any rounding mode), then ONE division by 10⁶ — both
      // engines produce the identical double
      val num = col("raw") * 2000L
      val micro = ((num - pmod(num, col("n_toks"))) / col("n_toks"))
        .cast("long")
      toks
        .select(col("doc_id"),
          (conv(substring(md5(col("tok")), 1, 8), 16, 10)
            .cast("long") % V).as("bucket"))
        .join(broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("raw"))
        .select(col("doc_id"), col("n_toks"), col("raw"),
          (micro.cast("double") / 1000000.0d).as("score"),
          (col("raw") >= 0L).as("keep"))
        .orderBy("doc_id")
    }),

    // F11 (r8): perplexity-style LM quality scoring — the CCNet/KenLM
    // filter class with a corpus-fit unigram model as the
    // fully-relational proxy: p(tok) = (count+1)/(N+V) (add-one
    // smoothing), per-doc score = mean −ln p — high scores flag
    // out-of-distribution/garbled documents exactly as the real LM
    // filter does, and the DATAFLOW (fit corpus model → broadcast-ish
    // join → per-doc reduce) is the swap point for a real LM. Two
    // passes: one hash-agg builds the model (vocab-sized), one
    // token→model equi-join + per-doc avg scores (AQE broadcasts the
    // model while it fits, shuffle-joins beyond — vocab grows
    // sublinearly in corpus size). 4-dp rounding absorbs ln/avg
    // ulp-order differences (the repo-wide float-oracle stance).
    // F12 (r10): BM25 relevance scoring — the retrieval scorer that
    // complements the ANN tier (lexical search next to vector
    // search) and the standard quality-weighting signal in corpus
    // curation. Query = the corpus's own top-5 tokens (count desc,
    // token asc — deterministic, no hardcoded vocabulary), scored
    // over every document containing at least one:
    //   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·len/avglen)),
    //   idf = ln((N − df + 0.5)/(df + 0.5) + 1), k1 = 1.2, b = 0.75.
    // Dataflow: one token hash-agg for the term stats, tf restricted
    // to the 5-term broadcast BEFORE its per-(doc,term) agg (the
    // token stream never shuffles unfiltered), doc lengths one more
    // hash-agg, corpus scalars a 1-row crossJoin. avglen is an
    // EXPLICIT exact-long-sum / count division (engine avg()
    // implementations differ); every literal is double on both
    // sides; 4dp rounding absorbs ln/sum-order ulps (the
    // unigram-ppl stance).
    "text_bm25" -> ((s, dir) =>
      TextOps.bm25(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    // F13 (r11): per-doc top-3 keywords by smoothed TF-IDF — keyword
    // extraction / document tagging, the term-side complement of
    // BM25's doc-side relevance. Score rounded 4dp BEFORE the per-doc
    // rank so the top-3 selection is the same deterministic contract
    // on both engines (ties by term asc).
    "text_tfidf" -> ((s, dir) =>
      TextOps.tfidfTopTerms(Tables.load(s, dir, "documents"),
          "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("score").desc, col("term"))),

    // F17 (r15): vocabulary COVERAGE CURVE — the tokenizer-prep
    // question "what fraction of corpus tokens does a top-k
    // vocabulary cover?" at standard rank checkpoints (how vocab
    // sizes get picked before BPE training). Scale-first design: the
    // naive form is a GLOBAL row_number + cumulative sum over the
    // |V|-row count table — a single-partition sort that dies at
    // web vocab sizes. Instead: a count-of-counts histogram (second
    // hash-agg, |distinct count values| rows) folds on the driver —
    // and that state is PROVABLY bounded: k distinct positive counts
    // sum to ≥ k²/2, so |classes| ≤ √(2N) (~1.4M rows at 10¹²
    // tokens; the documented bounded model-fit collect class).
    // Rank-boundary ties need no token-level data: every token in
    // the boundary class has the SAME count c, so the partial
    // contribution is (k − n_above)·c regardless of which tokens the
    // (cnt desc, tok asc) order admits. The DuckDB oracle replays
    // the NAIVE window-cumsum form — a different formulation proving
    // the histogram fold. All-integer until one final 4dp ratio.
    "text_vocab_coverage" -> ((s, dir) => {
      val hist = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(explode(filter(split(lower(col("text")), " "),
          x => length(x) > 0)).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .groupBy("cnt").agg(count(lit(1)).as("ntok"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(-_._1)
      val total = hist.map { case (c, n) => c * n }.sum
      val checkpoints = Seq(100L, 1000L, 10000L, 100000L)
      val rows = checkpoints.map { k =>
        var nAbove = 0L; var covered = 0L
        hist.foreach { case (c, n) =>
          if (nAbove + n <= k) { nAbove += n; covered += c * n }
          else if (nAbove < k) { covered += (k - nAbove) * c; nAbove = k }
        }
        (k, nAbove, covered)
      }
      import s.implicits._
      rows.toDF("rank_k", "vocab_used", "tokens_covered")
        .withColumn("coverage",
          round(col("tokens_covered") * 1.0 / lit(total.toDouble), 4))
        .orderBy("rank_k")
    }),

    // F16 (r15): bigram LM perplexity with STUPID BACKOFF (Brants et
    // al. 2007) — the CCNet-class quality scorer: train an n-gram LM
    // on a reference corpus, score every document by average negative
    // log-likelihood, filter the tail. The reference LM trains on the
    // EVEN-doc_id half (the decontaminate/incremental two-relation
    // house pattern) so unseen bigrams genuinely exist on the scored
    // side and the backoff path is exercised, not dead code:
    // P(cur|prev) = cnt(prev,cur)/cnt(prev) when the model has the
    // bigram, else 0.4 · (cnt_uni(cur)+1)/(N+V) (add-one unigram, the
    // text_unigram_ppl smoothing). Scale shape: bigram formation is a
    // ZERO-shuffle array zip over the tokenized column (adjacency
    // never crosses rows); the model ships as TWO precomputed-NLL
    // tables — s1 keys the SEEN path by (prev,cur) (every model
    // bigram's prev is in the train unigrams by construction, so s1
    // alone decides seen-vs-backoff), s2 keys the backoff value by
    // cur — and BOTH carry broadcast hints: after min-count pruning
    // the model is vocabulary-bounded (93k bigrams + 3.1k unigrams at
    // flat100), and shipping the pruned LM to every worker is the
    // published CCNet posture (per-shard KenLM). The token stream
    // therefore never shuffles at all: measured flat100 9.8-10.8 s
    // (shuffle-joined, task-skew 17-44 on the zipf-hot token key) →
    // broadcast path removes the stream exchanges entirely. At
    // beyond-broadcast vocabularies drop the hints and AQE falls
    // back to shuffle joins. Counts are exact longs; the NLL op tree
    // is the identical IEEE expression both engines; 4dp absorbs ln
    // ulps (the unigram-ppl stance).
    "text_bigram_ppl" -> ((s, dir) => {
      // Local-layout note: the flat100 documents file ships 5 row
      // groups for 500k rows, so size-based splits hand the scan
      // stage single-digit tasks and the probe shows task-skew 60+
      // (everything downstream is map-side once the model
      // broadcasts). Probed the fix — an explicit doc_id repartition
      // levels the skew (143 → 7.6) but the ~raw-text exchange costs
      // exactly what the straggler cost (wall ~10 s either way), so
      // it is NOT worth an always-on exchange: at corpus scale
      // documents arrive as many files and size-based splits give
      // full width without one. Adjudicated local file-layout
      // artifact, not a plan defect.
      def toks(train: Boolean) = {
        val d = Tables.load(s, dir, "documents")
          .filter(col("text").isNotNull)
        (if (train) d.filter(col("doc_id") % 2 === 0) else d)
          .select(col("doc_id"),
            filter(split(lower(col("text")), " "),
              x => length(x) > 0).as("t"))
      }
      val uni = toks(train = true)
        .select(explode(col("t")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("ucnt"))
      val tot = uni.agg(sum(col("ucnt")).as("n"), count(lit(1)).as("v"))
      def bigrams(df: org.apache.spark.sql.DataFrame) = df
        .filter(size(col("t")) >= 2)
        .withColumn("i", explode(sequence(lit(1), size(col("t")) - 1)))
        .select(col("doc_id"),
          element_at(col("t"), col("i")).as("prev"),
          element_at(col("t"), col("i") + 1).as("cur"))
      // min-count model pruning (the standard LM table shrink):
      // singleton train bigrams are dropped, so their score-side
      // occurrences take the backoff path — the model table scales
      // with REPEATED bigrams, not corpus size
      val bcnt = bigrams(toks(train = true))
        .groupBy(col("prev").as("bp"), col("cur").as("bc"))
        .agg(count(lit(1)).as("bcnt"))
        .filter(col("bcnt") >= 2)
      val s1 = bcnt
        .join(uni.select(col("tok").as("pk"), col("ucnt").as("pcnt")),
          col("bp") === col("pk"))
        .select(col("bp"), col("bc"),
          log(col("pcnt").cast("double") / col("bcnt")).as("nll_seen"))
      val s2 = uni.crossJoin(broadcast(tot))
        .select(col("tok").as("ck"),
          log((col("n") + col("v")).cast("double") /
            (lit(0.4) * (col("ucnt") + 1))).as("nll_cur"))
      bigrams(toks(train = false))
        .join(broadcast(s1),
          col("prev") === col("bp") && col("cur") === col("bc"),
          "left_outer")
        .join(broadcast(s2), col("cur") === col("ck"), "left_outer")
        .crossJoin(broadcast(tot))
        .withColumn("nll",
          coalesce(col("nll_seen"), col("nll_cur"),
            // fully-unseen cur: add-one mass over the train totals
            log((col("n") + col("v")).cast("double") / lit(0.4))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_big"),
          sum(when(col("nll_seen").isNull, 1L).otherwise(0L))
            .as("n_backoff"),
          round(avg(col("nll")), 4).as("avg_nll"))
        .orderBy("doc_id")
    }),

    "text_unigram_ppl" -> ((s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(sum(col("cnt")).as("n"),
        count(lit(1)).as("v"))
      toks.join(counts, "tok").crossJoin(broadcast(tot))
        .withColumn("nll",
          log((col("n") + col("v")).cast("double") / (col("cnt") + 1)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          round(avg(col("nll")), 4).as("avg_nll"))
        .orderBy("doc_id")
    }),

    // F10 (r8): RAG/embedding-prep chunking — every document split
    // into overlapping token windows (50 tokens, stride 40): the
    // standard retrieval-corpus and context-window-packing precursor.
    // Pure projection + generate (ZERO shuffles): chunk count and
    // boundaries are integer arithmetic on the token count (`div`, so
    // both engines compute the identical grid), the chunk id rides an
    // exploded sequence, and the chunk text is a codegen'd
    // slice + array_join. Payload inflation is the overlap ratio
    // (W/S = 1.25×) — the known, bounded cost of overlapping chunks;
    // chunks hash-compare via md5 so the oracle never hauls text.
    "text_chunks" -> ((s, dir) => {
      val W = 50; val S = 40
      Tables.load(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("nchunks", when(col("n") <= W, lit(1L))
          .otherwise(expr(s"((n - $W + ${S - 1}) div $S) + 1")))
        .withColumn("cid", explode(sequence(lit(0L), col("nchunks") - 1)))
        .withColumn("n_tok",
          least(col("cid") * S + W, col("n")) - col("cid") * S)
        .select(col("doc_id"), col("cid"), col("n_tok"),
          md5(array_join(
            slice(col("toks"), (col("cid") * S + 1).cast("int"),
              col("n_tok").cast("int")), " ")).as("chunk_md5"))
        .orderBy("doc_id", "cid")
    })
  )

  /** documents widened and tokenized into a MATERIALIZED array column
    * `t` ([[TextOps.withTokens]] — the mandatory shape for n-gram
    * explosion; 25× at sf0.1, see the helper's scaladoc). */
  private def tokenized(s: org.apache.spark.sql.SparkSession, dir: String) =
    TextOps.withTokens(
      Tables.load(s, dir, "documents").select("doc_id", "text"),
      "text", Seq(col("doc_id")), as = "t")

  private val normSql =
    """regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"""

  // the SAME pattern strings the operator uses (SQL splices them into
  // the oracle; the spec asserts they equal Pii's constants so the two
  // sides cannot drift)
  private[graft] val piiEmail = graft.operators.Pii.Email
  private[graft] val piiIp = graft.operators.Pii.Ipv4
  private[graft] val piiId = graft.operators.Pii.IdNum
  private[graft] val piiPhone = graft.operators.Pii.Phone

  val oracles: Map[String, String] = Map(
    "text_bm25" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                       FROM documents WHERE text IS NOT NULL),
           tk AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0),
           terms AS (SELECT tok FROM (
               SELECT tok, count(*) AS c FROM tk GROUP BY tok
               ORDER BY c DESC, tok LIMIT 5)),
           dl AS (SELECT doc_id, count(*) AS len FROM tk GROUP BY doc_id),
           stats AS (SELECT count(*) AS nd,
                            CAST(sum(len) AS DOUBLE) / count(*) AS avglen
                     FROM dl),
           tf AS (SELECT doc_id, tok, count(*) AS tf
                  FROM tk JOIN terms USING (tok) GROUP BY doc_id, tok),
           dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)
         SELECT tf.doc_id, count(*) AS n_terms,
                round(sum(
                  ln((nd - df + 0.5e0) / (df + 0.5e0) + 1.0e0)
                  * (tf * 2.2e0) /
                  (tf + 1.2e0 * (0.25e0 + 0.75e0 * len / avglen))), 4)
                  AS bm25
         FROM tf JOIN dfreq USING (tok) JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN stats
         GROUP BY tf.doc_id ORDER BY tf.doc_id""",
    "text_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                       FROM documents WHERE text IS NOT NULL),
           tk AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0),
           tf AS (SELECT doc_id, tok, count(*) AS tf
                  FROM tk GROUP BY doc_id, tok),
           nd AS (SELECT count(DISTINCT doc_id) AS nd FROM tk),
           dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
           scored AS (SELECT f.doc_id, f.tok AS term, f.tf, d.df,
                  round(f.tf * (ln((nd.nd + 1.0e0) / (d.df + 1.0e0))
                    + 1.0e0), 4) AS score
                  FROM tf f JOIN dfreq d ON d.tok = f.tok CROSS JOIN nd),
           ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, term) AS rn FROM scored)
         SELECT doc_id, term, tf, df, score FROM ranked WHERE rn <= 3
         ORDER BY doc_id, score DESC, term""",
    // the NAIVE global window-cumsum form — a different formulation
    // than the engine's count-of-counts histogram fold, so the hash
    // match proves the fold (boundary-tie arithmetic included)
    "text_vocab_coverage" ->
      """WITH tk AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                  x -> len(x) > 0)) AS tok
                     FROM documents WHERE text IS NOT NULL),
           m AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
           t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                        count(*) AS v FROM m),
           r AS (SELECT cnt,
                        row_number() OVER (ORDER BY cnt DESC, tok) AS rn,
                        sum(cnt) OVER (ORDER BY cnt DESC, tok
                                       ROWS UNBOUNDED PRECEDING) AS csum
                 FROM m),
           k AS (SELECT * FROM (VALUES (100), (1000), (10000), (100000))
                 AS kk(rank_k))
         SELECT CAST(rank_k AS BIGINT) AS rank_k,
                CAST(least(rank_k, (SELECT v FROM t)) AS BIGINT)
                  AS vocab_used,
                CAST(coalesce((SELECT max(csum) FROM r
                               WHERE rn <= rank_k), 0) AS BIGINT)
                  AS tokens_covered,
                round(CAST(coalesce((SELECT max(csum) FROM r
                                     WHERE rn <= rank_k), 0) AS BIGINT)
                      * 1.0 / (SELECT total FROM t), 4) AS coverage
         FROM k ORDER BY rank_k""",
    "text_bigram_ppl" ->
      """WITH d AS (SELECT doc_id,
                           list_filter(string_split(lower(text), ' '),
                                       x -> len(x) > 0) AS t
                    FROM documents WHERE text IS NOT NULL),
           tr AS (SELECT * FROM d WHERE doc_id % 2 = 0),
           uni AS (SELECT tok, count(*) AS ucnt
                   FROM (SELECT unnest(t) AS tok FROM tr) GROUP BY 1),
           tot AS (SELECT sum(ucnt) AS n, count(*) AS v FROM uni),
           trbig AS (SELECT t[i] AS bp, t[i + 1] AS bc, count(*) AS bcnt
                     FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
                           FROM tr WHERE len(t) >= 2)
                     GROUP BY 1, 2 HAVING count(*) >= 2),
           sc AS (SELECT doc_id, t[i] AS prev, t[i + 1] AS cur
                  FROM (SELECT doc_id, t,
                               unnest(generate_series(1, len(t) - 1)) AS i
                        FROM d WHERE len(t) >= 2)),
           j AS (SELECT doc_id,
                        CASE WHEN bcnt IS NOT NULL AND p.ucnt IS NOT NULL
                             THEN ln(CAST(p.ucnt AS DOUBLE) / bcnt)
                             ELSE ln(CAST(tot.n + tot.v AS DOUBLE) /
                                     (0.4 * (coalesce(c.ucnt, 0) + 1)))
                        END AS nll,
                        CASE WHEN bcnt IS NULL OR p.ucnt IS NULL
                             THEN 1 ELSE 0 END AS backoff
                 FROM sc
                 LEFT JOIN trbig ON prev = bp AND cur = bc
                 LEFT JOIN uni p ON prev = p.tok
                 LEFT JOIN uni c ON cur = c.tok
                 CROSS JOIN tot)
         SELECT doc_id, count(*) AS n_big,
                CAST(sum(backoff) AS BIGINT) AS n_backoff,
                round(avg(nll), 4) AS avg_nll
         FROM j GROUP BY doc_id ORDER BY doc_id""",
    "text_unigram_ppl" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                       FROM documents WHERE text IS NOT NULL),
           tk AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0),
           m AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok),
           t AS (SELECT sum(cnt) AS n, count(*) AS v FROM m)
         SELECT doc_id, count(*) AS n_tok,
                round(avg(ln(CAST(t.n + t.v AS DOUBLE) / (m.cnt + 1))), 4) AS avg_nll
         FROM tk JOIN m USING (tok) CROSS JOIN t
         GROUP BY doc_id ORDER BY doc_id""",
    "text_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents WHERE text IS NOT NULL),
           k AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
                        CASE WHEN len(toks) <= 50 THEN 1
                             ELSE (len(toks) - 50 + 39) // 40 + 1 END AS nchunks
                 FROM d),
           c AS (SELECT doc_id, toks, n,
                        unnest(generate_series(0, nchunks - 1)) AS cid
                 FROM k)
         SELECT doc_id, CAST(cid AS BIGINT) AS cid,
                least(cid * 40 + 50, n) - cid * 40 AS n_tok,
                md5(array_to_string(
                  list_slice(toks, cid * 40 + 1, least(cid * 40 + 50, n)),
                  ' ')) AS chunk_md5
         FROM c ORDER BY doc_id, cid""",
    "text_pii" ->
      s"""SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '$piiEmail')) AS BIGINT) AS n_emails,
                 CAST(len(regexp_extract_all(text, '$piiIp')) AS BIGINT) AS n_ips,
                 CAST(len(regexp_extract_all(text, '$piiId')) AS BIGINT) AS n_ids,
                 CAST(len(regexp_extract_all(text, '$piiPhone')) AS BIGINT) AS n_phones,
                 md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                   '$piiEmail', '<EMAIL>', 'g'),
                   '$piiIp', '<IP>', 'g'),
                   '$piiId', '<ID>', 'g'),
                   '$piiPhone', '<PHONE>', 'g')) AS scrub_md5
          FROM documents WHERE text IS NOT NULL ORDER BY doc_id""",
    "text_integrity" ->
      """SELECT count(*) AS n_docs,
                count(CASE WHEN text IS NULL THEN 1 END) AS null_docs,
                count(CASE WHEN text IS NOT NULL AND trim(text) = ''
                           THEN 1 END) AS blank_docs,
                count(CASE WHEN regexp_matches(text,
                  '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 END) AS ctl_char_docs,
                CAST(max(length(text)) AS BIGINT) AS max_chars,
                CAST(min(length(text)) AS BIGINT) AS min_chars
         FROM documents""",
    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, string_split($normSql, ' ') AS toks, $normSql AS norm FROM documents)
          SELECT doc_id,
                 length(text) AS n_chars_calc,
                 len(toks) AS n_tokens,
                 round(len(list_filter(toks, x -> x IN ('the','a'))) * 1.0 / len(toks), 4) AS stop_ratio,
                 round(length(replace(norm, ' ', '')) * 1.0 / len(toks), 4) AS avg_tok_len,
                 round(least(len(toks) / 100.0, 1.0) *
                       (1.0 - len(list_filter(toks, x -> x IN ('the','a'))) * 1.0 / len(toks)), 4) AS quality
          FROM t ORDER BY doc_id""",
    "text_tokens" ->
      s"""WITH t AS (SELECT lang, doc_id, unnest(string_split($normSql, ' ')) AS tok FROM documents)
          SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_tokens,
                 count(DISTINCT tok) AS vocab,
                 round(count(*) * 1.0 / count(DISTINCT doc_id), 4) AS avg_tokens
          FROM t GROUP BY lang ORDER BY lang""",
    "text_tokens_bpe" ->
      s"""WITH t AS (SELECT lang,
                            len(string_split($normSql, ' ')) AS ws,
                            len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe
                     FROM documents)
          SELECT lang, CAST(sum(ws) AS BIGINT) AS ws_tokens,
                 CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
                 round(avg(bpe * 1.0 / ws), 4) AS bpe_per_word
          FROM t GROUP BY lang ORDER BY lang""",
    "text_langid" ->
      s"""WITH t AS (SELECT lang, string_split($normSql, ' ') AS toks FROM documents),
          sc AS (SELECT lang,
                 len(list_filter(toks, x -> x IN ('table','row')))  AS s_de,
                 len(list_filter(toks, x -> x IN ('the','a')))      AS s_en,
                 len(list_filter(toks, x -> x IN ('data','value'))) AS s_es,
                 len(list_filter(toks, x -> x IN ('column','line'))) AS s_fr,
                 len(list_filter(toks, x -> x IN ('hash','scan')))  AS s_zh
                 FROM t),
          p AS (SELECT lang, CASE
                 WHEN s_zh = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'zh'
                 WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                 WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                 WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                 ELSE 'de' END AS pred_lang FROM sc)
          SELECT lang, pred_lang, count(*) AS cnt FROM p
          GROUP BY lang, pred_lang ORDER BY lang, pred_lang""",
    "text_fingerprint" ->
      s"""SELECT doc_id, md5($normSql) AS fp, md5(substr($normSql, 1, 100)) AS fp_prefix
          FROM documents ORDER BY doc_id""",
    "text_classifier_score" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
                     FROM documents WHERE text IS NOT NULL),
          b AS (SELECT doc_id,
                       ('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096 AS bucket
                FROM t),
          w AS (SELECT r.range AS bucket,
                       ('0x' || substr(md5('w' || CAST(r.range AS VARCHAR)), 1, 8))::BIGINT
                         % 1001 - 500 AS w
                FROM range(4096) r),
          g AS (SELECT doc_id, count(*) AS n_toks,
                       CAST(sum(w.w) AS BIGINT) AS raw
                FROM b JOIN w USING (bucket) GROUP BY doc_id)
          SELECT doc_id, n_toks, raw,
                 ((raw * 2000 - ((raw * 2000 % n_toks) + n_toks) % n_toks)
                  // n_toks) / 1000000.0 AS score,
                 raw >= 0 AS keep
          FROM g ORDER BY doc_id""",
    "text_quality_funnel" ->
      s"""WITH t AS (SELECT string_split($normSql, ' ') AS toks FROM documents
                     WHERE text IS NOT NULL),
          f AS (SELECT len(toks) AS n,
                       len(list_distinct(toks)) * 1.0 / len(toks) AS ttr,
                       len(list_filter(toks, x -> x IN ('the','a'))) * 1.0 / len(toks) AS sr
                FROM t),
          h AS (SELECT CASE WHEN n < 30 THEN 1 ELSE 0 END AS h1,
                       CASE WHEN n > 90 THEN 1 ELSE 0 END AS h2,
                       CASE WHEN ttr < 0.45 THEN 1 ELSE 0 END AS h3,
                       CASE WHEN sr < 0.01 THEN 1 ELSE 0 END AS h4
                FROM f),
          r AS (SELECT unnest([
                  struct_pack(rule := '1_short_doc',    hit := h1),
                  struct_pack(rule := '2_long_doc',     hit := h2),
                  struct_pack(rule := '3_repetitious',  hit := h3),
                  struct_pack(rule := '4_low_stopword', hit := h4),
                  struct_pack(rule := '5_kept',
                              hit := CASE WHEN h1 + h2 + h3 + h4 = 0 THEN 1 ELSE 0 END)
                ], recursive := true) FROM h)
          SELECT rule, CAST(sum(hit) AS BIGINT) AS n_docs
          FROM r GROUP BY rule ORDER BY rule""",
    "corpus_ngrams" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS arr FROM documents),
          g AS (SELECT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS gram
                FROM t, unnest(range(1, len(arr) - 1)) AS r(i)
                WHERE len(arr) >= 3)
          SELECT gram, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
          FROM g GROUP BY gram ORDER BY cnt DESC, gram LIMIT 20""",
    "text_pmi_bigrams" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS arr FROM documents),
          b AS (SELECT arr[i] AS x, arr[i+1] AS y
                FROM t, unnest(range(1, len(arr))) AS r(i)
                WHERE len(arr) >= 2),
          bc AS (SELECT x, y, count(*) AS nxy FROM b GROUP BY 1, 2
                 HAVING count(*) >= 5),
          u AS (SELECT unnest(arr) AS w FROM t),
          uc AS (SELECT w, count(*) AS c FROM u GROUP BY 1),
          nt AS (SELECT count(*) AS n_total FROM u),
          bt AS (SELECT count(*) AS b_total FROM b)
          SELECT x, y, nxy,
                 round((nxy * 1.0 / b_total) /
                       ((ux.c * 1.0 / n_total) * (uy.c * 1.0 / n_total)), 4)
                   AS lift
          FROM bc JOIN uc ux ON bc.x = ux.w
                  JOIN uc uy ON bc.y = uy.w, nt, bt
          ORDER BY (nxy * 1.0 / b_total) /
                   ((ux.c * 1.0 / n_total) * (uy.c * 1.0 / n_total)) DESC,
                   x, y
          LIMIT 30""",
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
          u AS (SELECT doc_id, unnest(toks) AS g FROM t),
          uc AS (SELECT doc_id, g, count(*) AS c FROM u GROUP BY 1, 2),
          us AS (SELECT doc_id, sum(c) AS n, count(*) AS d, max(c) AS tp FROM uc GROUP BY 1),
          b AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
                FROM t, unnest(range(1, len(toks))) AS r(i)),
          bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
          bs AS (SELECT doc_id, sum(c) AS bn, max(c) AS btp FROM bc GROUP BY 1)
          SELECT us.doc_id,
                 CAST(us.n AS BIGINT) AS n_tokens,
                 round(us.d * 1.0 / us.n, 4) AS ttr,
                 round(us.tp * 1.0 / us.n, 4) AS top_tok_frac,
                 coalesce(round(bs.btp * 1.0 / bs.bn, 4), 0.0) AS top_2gram_frac
          FROM us LEFT JOIN bs ON us.doc_id = bs.doc_id
          ORDER BY us.doc_id"""
  )
}
