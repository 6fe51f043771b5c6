package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}
import graft.functions.VectorFunctions

/** Invariants for the text (F) and dedup (D) families, on synthetic
  * micro-corpora where ground truth is known by construction, plus
  * sf0.001 sanity.
  */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: contiguous distinct n-grams, short docs empty") {
    val df = Seq("a b c d", "a b", "x x x x").toDF("text")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq("x x x")) // distinct collapses repeats
  }

  test("pii: detection counts and order-stable redaction") {
    import graft.operators.Pii
    val docs = Seq(
      (1L, "contact john.doe+x@exam-ple.org today"),
      (2L, "server at 192.168.10.1 port 80"),
      (3L, "ssn 123-45-6789 leaked"),
      (4L, "call +1(415)555-0199 now"),
      (5L, "clean text, no pii at all")
    ).toDF("doc_id", "text")
    val got = Pii.redact(docs, "text").orderBy("doc_id").collect()
    def row(i: Int) = got(i)
    assert(row(0).getAs[Int]("n_emails") == 1)
    assert(row(0).getAs[String]("scrubbed") == "contact <EMAIL> today")
    // the IP is ALSO phone-shaped on the raw text (digits + dots):
    // both counters see it — counts are independent diagnostics —
    // but scrub order (ip before phone) redacts it exactly once
    assert(row(1).getAs[Int]("n_ips") == 1)
    assert(row(1).getAs[Int]("n_phones") == 1)
    assert(row(1).getAs[String]("scrubbed") == "server at <IP> port 80")
    assert(row(2).getAs[Int]("n_ids") == 1)
    assert(row(2).getAs[String]("scrubbed") == "ssn <ID> leaked")
    assert(row(3).getAs[Int]("n_phones") == 1)
    assert(row(3).getAs[String]("scrubbed") == "call <PHONE> now")
    assert(Seq("n_emails", "n_ips", "n_ids", "n_phones")
      .forall(c => row(4).getAs[Int](c) == 0))
    assert(row(4).getAs[String]("scrubbed") == "clean text, no pii at all")
  }

  test("pii: fused native expression == the 8-regex chain, corner-for-corner") {
    import graft.operators.Pii
    val corners = Seq(
      // boundary CREATION: scrubbing the email makes '<EMAIL>4.5.6.7'
      // where the ip pattern gains the word boundary 'co4' denied it —
      // the case that forces the replace leg onto the CHAINED text
      (1L, "reach 1.2.3.a@b.co4.5.6.7 now"),
      // overlap precedence: phone starts before the email; sequential
      // scrub (email globally first) must win in the fused path too
      (2L, "(123)4567890user@x.com"),
      // every class at once, adjacent
      (3L, "a@b.co 1.2.3.4 123-45-6789 +14155550199"),
      // screens: no '@', no digit -> zero regex passes
      (4L, "plain words only"),
      // digits but nothing pii-shaped
      (5L, "room 12 floor 34"),
      (6L, "")
    ).toDF("doc_id", "text")
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .union(corners.withColumn("doc_id", col("doc_id") + 1000000L))
    val cols = Seq("doc_id", "n_emails", "n_ips", "n_ids", "n_phones", "scrubbed")
      .map(col)
    val fused = Pii.redact(docs, "text").select(cols: _*)
    val chained = Pii.redactChained(docs, "text").select(cols: _*)
    assert(fused.exceptAll(chained).isEmpty && chained.exceptAll(fused).isEmpty,
      "fused PII expression diverges from the chained reference")
  }

  test("span dedup: first occurrence survives, docs reassembled in order") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "a b c d"),       // chunks (k=2): "a b", "c d"
      (2L, "c d e f"),       // "c d" loses to doc1; "e f" survives
      (3L, "a b"),           // entire doc claimed by doc1 → empty
      (4L, "x y a b z")      // "x y" new, "a b" loses, ragged "z" new
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.wordChunks(split(col("text"), " "), 2).as("spans"))
    val got = Dedup.spanDedup(docs, "doc_id", "spans")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_kept"), r.getAs[String]("clean_text")))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "e f"),
      (3L, 1L, 0L, ""),
      (4L, 3L, 2L, "x y z")))
  }

  test("span dedup: IntegerType id column packs in 64-bit (no 32-bit wrap)") {
    import graft.operators.TextOps
    // With an int id >= 2^11 the pre-r11 packing (shiftleft preserves
    // the input's integral type) wrapped in 32-bit arithmetic while
    // the long-compared range guard still passed — electing a WRONG
    // winner. 4096 << 20 overflows Int; the cast-to-long fix keeps
    // first-occurrence order regardless of the caller's id type.
    val docs = Seq((4096, "a b c d"), (9000000, "c d e f"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.wordChunks(split(col("text"), " "), 2).as("spans"))
    val got = Dedup.spanDedup(docs, "doc_id", "spans")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Number]("doc_id").longValue(),
        r.getAs[Long]("n_kept"), r.getAs[String]("clean_text")))
    assert(got.toSeq == Seq((4096L, 2L, "a b c d"), (9000000L, 1L, "e f")))
  }

  test("spanDedupAgainst: history spans cut, batch first-occurrence kept") {
    import graft.operators.{Sketches, TextOps}
    val path = java.nio.file.Files.createTempDirectory("graft_spanbloom")
      .resolve("bloom.bin").toString
    def spansOf(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text").select(col("doc_id"),
        TextOps.wordChunks(split(col("text"), " "), 2).as("spans"))
    val history = spansOf(Seq((1L, "a b c d")))  // spans "a b", "c d"
    Sketches.buildExactBloom(
      history.select(posexplode(col("spans")).as(Seq("idx", "span"))),
      "span", path)
    val batch = spansOf(Seq((10L, "c d x y"), (11L, "x y z w")))
    val got = Dedup.spanDedupAgainst(batch, "doc_id", "spans", path)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_kept"),
        r.getAs[String]("clean_text")))
    // "c d" cut by history; "x y" kept once at doc 10 (batch-internal
    // first occurrence), cut at doc 11; "z w" novel
    assert(got.toSeq == Seq((10L, 1L, "x y"), (11L, 1L, "z w")))
  }

  test("wordChunks: native kernel == HOF formulation over corpus + corners") {
    val corners = Seq((1000001L, ""), (1000002L, "one"),
      (1000003L, "a b"), (1000004L, "a b c d e")).toDF("doc_id", "text")
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull).select("doc_id", "text")
      .union(corners)
    for (k <- Seq(1, 2, 3, 7)) {
      val toks = split(col("text"), " ")
      val diff = docs.select(col("doc_id"),
          TextOps.wordChunks(toks, k).as("native"),
          TextOps.wordChunksHof(toks, k).as("hof"))
        .filter(not(col("native") <=> col("hof")))
      assert(diff.isEmpty, s"wordChunks k=$k diverges from the HOF chain")
    }
  }

  test("occurrences: native CountIn kernel == filter-HOF over corpus + corners") {
    val corners = Seq((1000001L, ""), (1000002L, "the"),
      (1000003L, "the the a the"), (1000004L, "b the a c a a"),
      (1000005L, "thea athe THE")).toDF("doc_id", "text")
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull).select("doc_id", "text")
      .union(corners)
    for (words <- Seq(Seq("the", "a"), Seq("zzz"), Seq("table", "row"))) {
      val diff = docs
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
        .select(col("doc_id"),
          TextOps.occurrences(col("t"), words).as("native"),
          TextOps.occurrencesHof(col("t"), words).as("hof"))
        .filter(not(col("native") <=> col("hof")))
      assert(diff.isEmpty, s"occurrences($words) diverges from the HOF form")
    }
    // null array → null count on both sides (size(filter(null)) = null)
    val nulls = Seq(Tuple1[String](null)).toDF("text")
      .select(TextOps.tokens(col("text")).as("t"))
      .select(TextOps.occurrences(col("t"), Seq("x")).as("n"),
        TextOps.occurrencesHof(col("t"), Seq("x")).as("h"))
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("tokenStats: native TopFreq kernel == exploded groupBy over corpus") {
    // the exploded double hash-agg IS the differential reference (and
    // the oracle shape) for the zero-shuffle kernel projection
    val corners = Seq((1000001L, ""), (1000002L, "x"),
      (1000003L, "x x x"), (1000004L, "a b a b a")).toDF("doc_id", "text")
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull).select("doc_id", "text")
      .union(corners)
    for (order <- Seq(1, 2)) {
      val tokd = docs.select(col("doc_id"),
        TextOps.tokens(col("text")).as("t"))
      val grams = if (order == 1) col("t") else TextOps.ngrams(col("t"), order)
      val native = tokd
        .select(col("doc_id"), TextOps.tokenStats(grams).as("s"))
        .select(col("doc_id"), col("s.n"), col("s.d"), col("s.tp"))
        .filter(col("n") > 0) // exploded form has no row for empty arrays
      val exploded = tokd
        .select(col("doc_id"), explode(grams).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n"), count(lit(1)).as("d"), max("c").as("tp"))
      val diff = native.exceptAll(exploded).union(exploded.exceptAll(native))
      assert(diff.isEmpty, s"tokenStats(order=$order) diverges from explode form")
    }
    // empty array → (0, 0, 0), the coalesce-to-zero contract
    val e = Seq(Tuple1(Seq.empty[String])).toDF("t")
      .select(TextOps.tokenStats(col("t")).as("s")).select("s.n", "s.d", "s.tp")
      .collect().head
    assert((e.getLong(0), e.getLong(1), e.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("repStats: fused kernel == TopFreq pair over corpus + null corners") {
    // the chain TopFreq(t) / TopFreq(ngrams(t,2)) is itself pinned to
    // the exploded groupBy form above, so this transitively pins the
    // fused kernel to the oracle shape
    val corners = Seq((1000001L, ""), (1000002L, "x"),
      (1000003L, "x x x"), (1000004L, "a b a b a"),
      (1000005L, "q w q w q w e")).toDF("doc_id", "text")
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull).select("doc_id", "text")
      .union(corners)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      // null-member arrays: concat_ws degradation must merge
      // (null,"x") with ("x",null); (null,null) → "" key
      .union(Seq(
        (2000001L, Seq[String](null, "x", null, "x")),
        (2000002L, Seq[String](null, null)),
        (2000003L, Seq[String]("x", null, "x"))).toDF("doc_id", "t"))
    val diff = docs
      .select(col("doc_id"), TextOps.repStats(col("t")).as("r"),
        TextOps.tokenStats(col("t")).as("u"),
        TextOps.tokenStats(TextOps.ngrams(col("t"), 2)).as("b"))
      .filter(not(col("r.n") <=> col("u.n") && col("r.d") <=> col("u.d") &&
        col("r.tp") <=> col("u.tp") && col("r.bn") <=> col("b.n") &&
        col("r.bd") <=> col("b.d") && col("r.btp") <=> col("b.tp")))
    assert(diff.isEmpty, "fused repStats diverges from the TopFreq pair")
  }

  test("pii: fused == chain on 2000 seeded adversarial random strings") {
    import graft.operators.Pii
    // strings drawn from a PII-PRONE alphabet (digits, '@', dots,
    // dashes, parens, '+') with a fixed seed: short fragments
    // concatenate into accidental half-emails, wrapped ips, nested
    // phone runs — the overlap/boundary space no hand fixture
    // enumerates. Deterministic, so a failure is replayable.
    val rnd = new scala.util.Random(42)
    val alphabet = "ab1 23.9@-()+x.7 @5."
    val rows = (1 to 2000).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val docs = rows.toDF("doc_id", "text")
    val cols = Seq("doc_id", "n_emails", "n_ips", "n_ids", "n_phones", "scrubbed")
      .map(col)
    val fused = Pii.redact(docs, "text").select(cols: _*)
    val chained = Pii.redactChained(docs, "text").select(cols: _*)
    val diff = fused.exceptAll(chained).union(chained.exceptAll(fused))
    assert(diff.isEmpty,
      s"fused PII diverges on random input: ${diff.take(3).toSeq}")
  }

  test("bm25: hand arithmetic, term selection, doc coverage") {
    // corpus: d1 "a a b", d2 "a c", d3 "b b b c" — term counts
    // b=4, a=3, c=2 (all inside top-5); N=3, lens (3,2,4), avglen=3,
    // df(a)=df(b)=df(c)=2 ⇒ idf = ln((3−2+0.5)/2.5 + 1) = ln(1.6).
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b b c"))
      .toDF("doc_id", "text")
    val got = TextOps.bm25(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val idf = math.log(1.6)
    def term(tf: Long, len: Long): Double =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / 3.0))
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    // d1: a(tf2) + b(tf1), len 3 → 1.2*(0.25+0.75)=1.2 denominator add
    assert(got(1L)._1 == 2L)
    assert(got(1L)._2 == r4(term(2, 3) + term(1, 3)), s"d1=${got(1L)}")
    // d2: a(1) + c(1), len 2
    assert(got(2L)._2 == r4(term(1, 2) + term(1, 2)), s"d2=${got(2L)}")
    // d3: b(3) + c(1), len 4
    assert(got(3L)._1 == 2L)
    assert(got(3L)._2 == r4(term(3, 4) + term(1, 4)), s"d3=${got(3L)}")
    // a doc with NO query term drops out; rarer term outscores common
    // at equal tf (idf monotone in 1/df)
    val docs2 = docs.union(Seq((4L, "zz")).toDF("doc_id", "text"))
    val g2 = TextOps.bm25(docs2, "doc_id", "text", nTerms = 3).collect()
      .map(_.getLong(0)).toSet
    assert(!g2.contains(4L), "termless doc must not be scored")
  }

  test("tfidf: hand arithmetic, per-doc top-k cut, tie order") {
    // corpus: d1 "a a b", d2 "a c", d3 "b b b c" — N=3,
    // df(a)=df(b)=df(c)=2, so idf is ONE shared value ln(4/3)+1 and
    // ranking within a doc is by tf desc then term asc.
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b b c"))
      .toDF("doc_id", "text")
    val idf = math.log(4.0 / 3) + 1
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val got = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy(col("doc_id"), col("score").desc, col("term"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, "a", 2L, 2L, r4(2 * idf)),  // tf 2 beats tf 1
      (1L, "b", 1L, 2L, r4(idf)),
      (2L, "a", 1L, 2L, r4(idf)),      // equal scores: term asc
      (2L, "c", 1L, 2L, r4(idf)),
      (3L, "b", 3L, 2L, r4(3 * idf)),
      (3L, "c", 1L, 2L, r4(idf))))
    // k cuts strictly: d3 has 2 distinct terms, k=1 keeps only b
    val top1 = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 1)
      .filter(col("doc_id") === 3L).collect()
    assert(top1.length == 1 && top1(0).getString(1) == "b")
    // a rarer term outranks a common one at equal tf: add a doc so
    // df(c)=3 > df(a): in d2 (tf 1 each) a must now rank above c
    val docs2 = docs.union(Seq((4L, "c")).toDF("doc_id", "text"))
    val d2 = TextOps.tfidfTopTerms(docs2, "doc_id", "text", k = 1)
      .filter(col("doc_id") === 2L).collect()
    assert(d2(0).getString(1) == "a", s"smooth idf must favor rare: ${d2.toSeq}")
  }

  test("ngrams: native kernel == HOF formulation over corpus + corners") {
    val corners = Seq((1000001L, ""), (1000002L, "one"),
      (1000003L, "a b"), (1000004L, "a b c d e")).toDF("doc_id", "text")
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull).select("doc_id", "text")
      .union(corners)
    for (n <- Seq(1, 2, 3, 5)) {
      val toks = split(col("text"), " ")
      val diff = docs.select(col("doc_id"),
          TextOps.ngrams(toks, n).as("native"),
          TextOps.ngramsHof(toks, n).as("hof"))
        .filter(not(col("native") <=> col("hof")))
      assert(diff.isEmpty, s"ngrams n=$n diverges from the HOF chain")
    }
  }

  test("wordChunks: ragged tail, empty input, chunk arithmetic") {
    import graft.operators.TextOps
    val got = Seq("a b c d e", "a", "")
      .toDF("text")
      .select(TextOps.wordChunks(split(col("text"), " "), 2).as("c"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b", "c d", "e"))
    assert(got(1) == Seq("a"))
    assert(got(2) == Seq("")) // split("") is [""] — one empty token
  }

  test("exact dedup keeps lowest id per identical text") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "other text")
    ).toDF("doc_id", "text")
    val got = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(got.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_dups"))).toSeq
      == Seq((1L, 2L), (3L, 1L)))
  }

  test("jaccard pairs finds planted near-dup, skips dissimilar") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " zz yy"
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, 1000L).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("i") == 1L && got(0).getAs[Long]("j") == 2L)
    assert(got(0).getAs[Double]("jaccard") > 0.8)
  }

  test("containment pairs flag a short doc embedded in a long one") {
    // doc 2 is a verbatim 10-token slice of doc 1's 60 tokens:
    // containment = 1.0 (all 8 of the small side's 3-shingles are in
    // the big side) while Jaccard = 8/58 ≈ 0.14 — the asymmetric
    // class the symmetric metric misses.
    val long = (1 to 60).map(i => s"tok$i").mkString(" ")
    val short = (21 to 30).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short), (3L, other))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8, 1000L)
      .collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("i") == 1L && got(0).getAs[Long]("j") == 2L)
    assert(got(0).getAs[Double]("containment") == 1.0)
    // the same pair is invisible to Jaccard at the same threshold
    assert(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, 1000L)
      .count() == 0)
  }

  test("jaccard dfCap drops stop-shingles from index and sizes") {
    // 4 docs share the same one shingle -> df=4 > cap=3 -> no pairs
    val docs = (1L to 4L).map(i => (i, "common shingle here")).toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.1, 3L).count() == 0)
    assert(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.1, 4L).count() == 6)
  }

  test("embedding pairs: identical vectors cosine 1, orthogonal excluded") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f)), // same direction, scaled
      (3L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.embeddingPairs(vecs, "vec_id", "embedding", 0.9).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("i") == 1L && got(0).getAs[Long]("j") == 2L)
    assert(math.abs(got(0).getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("cosine matches hand-computed value") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(
      VectorFunctions.asDouble(col("a")), VectorFunctions.asDouble(col("b")))).first().getDouble(0)
    val want = 11.0 / (math.sqrt(5.0) * math.sqrt(25.0))
    assert(math.abs(got - want) < 1e-12)
  }

  test("text quality bounds on sf0.001") {
    val q = SparkEntry.queries("text_quality")(spark, sfDir)
    val bad = q.filter(
      col("stop_ratio") < 0 || col("stop_ratio") > 1 ||
      col("quality") < 0 || col("quality") > 1 ||
      col("n_tokens") <= 0).count()
    assert(bad == 0)
  }

  test("langid predictions cover every document exactly once") {
    val docs = Tables.load(spark, sfDir, "documents").count()
    val cm = SparkEntry.queries("text_langid")(spark, sfDir)
    assert(cm.agg(sum("cnt")).first().getLong(0) == docs)
  }

  test("unigram perplexity ranks rare-token documents above common-token ones") {
    val scores = SparkEntry.queries("text_unigram_ppl")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(scores.values.forall { case (n, s) => n > 0 && s > 0 })
    // independent signal: the mean corpus frequency of a doc's tokens.
    // The doc scored MOST surprising must use rarer tokens on average
    // than the doc scored least surprising — the property the filter
    // exists to detect.
    val toks = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val meanFreq = toks.join(freq, "tok").groupBy("doc_id")
      .agg(avg(col("cnt")).as("mf")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val worst = scores.maxBy(_._2._2)._1
    val best = scores.minBy(_._2._2)._1
    assert(meanFreq(worst) < meanFreq(best),
      s"most-surprising doc $worst uses commoner tokens than $best")
  }

  test("text_chunks tile every document: full coverage, exact overlap, no gaps") {
    val chunks = SparkEntry.queries("text_chunks")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nToks = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nToks(doc)
      val sorted = cs.sortBy(_._2)
      // dense chunk ids from 0
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq, s"doc $doc ids")
      // every chunk but the last is full-width; stride-40 windows
      // cover [cid*40, cid*40 + n_tok) and the last window must reach n
      sorted.init.foreach { case (_, _, w) => assert(w == 50, s"doc $doc width $w") }
      val (_, lastCid, lastW) = sorted.last
      assert(lastCid * 40 + lastW == n, s"doc $doc: tail not flush with $n tokens")
      // no gap: next window starts 10 tokens before the previous ends
      assert(sorted.length == 1 || n > 50, s"doc $doc over-chunked")
    }
    assert(chunks.nonEmpty)
  }

  test("classifier score: exact integer reduction, bounds, independent replay") {
    val got = SparkEntry.queries("text_classifier_score")(spark, sfDir)
    val rows = got.collect()
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull).count()
    assert(rows.length == docs)
    // raw is the exact weight sum → |raw| ≤ 500·n and score ∈ [-1, 1]
    assert(rows.forall { r =>
      val n = r.getAs[Long]("n_toks"); val raw = r.getAs[Long]("raw")
      val s = r.getAs[Double]("score")
      n > 0 && math.abs(raw) <= 500L * n && s >= -1.0 && s <= 1.0 &&
        (r.getAs[Boolean]("keep") == (raw >= 0))
    })
    // independent replay of one doc's raw score straight from the
    // token stream (no weight-table join): same md5 bucket/weight
    // derivation composed per occurrence
    val target = rows.head.getAs[Long]("doc_id")
    val wOf = (conv(substring(md5(concat(lit("w"),
      (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % 4096)
        .cast("string"))), 1, 8), 16, 10).cast("long") % 1001) - 500
    val replay = graft.operators.TextOps.withTokens(
        Tables.load(spark, sfDir, "documents")
          .filter(col("doc_id") === target), "text", Seq(col("doc_id")))
      .select(explode(col("graft_toks")).as("tok"))
      .agg(sum(wOf)).first().getLong(0)
    assert(replay == rows.head.getAs[Long]("raw"))
  }
}
