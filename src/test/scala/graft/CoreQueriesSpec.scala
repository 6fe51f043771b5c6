package graft

import org.apache.spark.sql.functions._

/** Operator invariants on sf0.001 (fast); exact value checks where the
  * expected result is derivable independently of the implementation.
  */
class CoreQueriesSpec extends SparkSpec {

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has matching column names with its oracle declared") {
    // oracle keys must be a subset of query keys
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("cdc_latest_state: one row per entity, newest event wins") {
    val events = Tables.load(spark, sfDir, "events")
    val latest = operators.CurrentState.latest(events, "user_id", Seq("ts", "event_id"))
    assert(latest.count() == events.select("user_id").distinct().count())
    // cross-check one entity against a sort-based reference
    val uid = events.select("user_id").first().getLong(0)
    val want = events.filter(col("user_id") === uid)
      .orderBy(col("ts").desc, col("event_id").desc).first()
    val got = latest.filter(col("user_id") === uid).first()
    assert(got.getAs[Long]("event_id") == want.getAs[Long]("event_id"))
  }

  test("topN (LIMIT n BY): rank 1 equals latest, ranks ordered, capped at n") {
    val events = Tables.load(spark, sfDir, "events")
    val top = operators.CurrentState.topN(
      events, "user_id", Seq("ts", "event_id"), n = 3)
    // never more than n per key
    assert(top.groupBy("user_id").count().filter(col("count") > 3).count() == 0)
    // rank 1 is exactly CurrentState.latest
    val r1 = top.filter(col("rk") === 1).select("user_id", "event_id")
    val latest = operators.CurrentState.latest(
      events, "user_id", Seq("ts", "event_id")).select("user_id", "event_id")
    assert(r1.exceptAll(latest).count() == 0 && latest.exceptAll(r1).count() == 0)
    // ranks strictly follow the (ts, event_id) descending order
    val bad = top.alias("a").join(top.alias("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.rk") === col("b.rk") - 1)
      .filter(!(col("a.ts") > col("b.ts") ||
        (col("a.ts") === col("b.ts") && col("a.event_id") > col("b.event_id"))))
    assert(bad.count() == 0)
  }

  test("cdc_monthly_totals: subtotals and grand total reconcile with leaves") {
    val rows = SparkEntry.queries("cdc_monthly_totals")(spark, sfDir).collect()
    val leaves = rows.filter(_.getAs[Int]("gid") == 0)
    val typeTotals = rows.filter(_.getAs[Int]("gid") == 1) // month rolled up
    val grand = rows.filter(_.getAs[Int]("gid") == 3)
    assert(grand.length == 1, s"want one grand-total row, got ${grand.length}")
    assert(grand.head.getAs[String]("event_type") == "ALL" &&
      grand.head.getAs[String]("month") == "ALL")
    // counts are exact longs: each rollup level must sum to the same total
    val leafCnt = leaves.map(_.getAs[Long]("cnt")).sum
    assert(typeTotals.map(_.getAs[Long]("cnt")).sum == leafCnt)
    assert(grand.head.getAs[Long]("cnt") == leafCnt)
    // each per-type subtotal equals the sum of its leaf months
    typeTotals.foreach { t =>
      val et = t.getAs[String]("event_type")
      val want = leaves.filter(_.getAs[String]("event_type") == et)
        .map(_.getAs[Long]("cnt")).sum
      assert(t.getAs[Long]("cnt") == want, s"subtotal mismatch for $et")
    }
  }

  test("cdc_current_state drops tombstoned entities") {
    val events = Tables.load(spark, sfDir, "events")
    val cur = operators.CurrentState.current(
      events, "user_id", Seq("ts", "event_id"),
      isTombstone = col("event_type") === "error")
    assert(cur.filter(col("event_type") === "error").count() == 0)
  }

  test("snapshot source emits valid SNAPSHOT events with JSON props") {
    val snap = sources.Snapshot.fromTable(
      Tables.load(spark, sfDir, "customer"), "c_custkey", Seq("c_mktsegment"))
    val row = snap.select(
      col("event_type"),
      get_json_object(col("properties_after"), "$.c_name").as("name"),
      col("properties_before")).first()
    assert(row.getString(0) == CdcOp.Snapshot)
    assert(row.getString(1) != null)
    assert(row.getString(2) == "{}")
  }

  test("interval coverage: overlaps once, disjoint summed, swallowed free") {
    val s = spark
    import s.implicits._
    val iv = Seq(
      // key a: [0,10) ∪ [5,20) ∪ [30,40) = 20 + 10 = 30; [6,8) swallowed
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 6L, 8L), ("a", 30L, 40L),
      // key b: zero-length and inverted intervals contribute nothing
      ("b", 5L, 5L), ("b", 9L, 3L), ("b", 10L, 12L))
      .toDF("k", "s_us", "e_us")
    val got = operators.Intervals.coverage(iv, Seq("k"), "s_us", "e_us")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 30L, "b" -> 2L))
  }

  test("interval coverage agrees with brute-force union on random intervals") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 30).flatMap { k =>
      (1 to 15).map { _ =>
        val st = rnd.nextInt(500).toLong
        (k.toLong, st, st + rnd.nextInt(60).toLong)
      }
    }
    val got = operators.Intervals.coverage(
        rows.toDF("k", "s_us", "e_us"), Seq("k"), "s_us", "e_us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (k, ivs) =>
      val want = ivs.flatMap { case (_, st, en) => st until en }
        .distinct.size.toLong
      assert(got(k) == want, s"key $k: got ${got(k)} want $want")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("scd2 history: versions chain gaplessly, one open version per entity") {
    val h = SparkEntry.queries("cdc_history_scd2")(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exactly one is_current row per entity
    val perUser = h.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("open"),
        count(lit(1)).as("n"), max(col("version")).as("maxv"))
    assert(perUser.filter(col("open") =!= 1L).count() == 0)
    // versions are 1..n dense
    assert(perUser.filter(col("maxv") =!= col("n")).count() == 0)
    // each closed version's valid_to equals the NEXT version's
    // valid_from — the chain property that makes as-of lookups exact
    val nxt = h.select(col("user_id"), (col("version") - 1).as("version"),
      col("valid_from_us").as("next_from"))
    val broken = h.join(nxt, Seq("user_id", "version"))
      .filter(col("valid_to_us") =!= col("next_from"))
    assert(broken.count() == 0)
    h.unpersist()
  }

  test("value EMA: factorized form equals the naive per-row recompute") {
    // recompute a type's series with the O(n²) definition — weight
    // 0.5^((dcur−d)/7) over the trailing 30-day frame — and compare
    val rows = SparkEntry.queries("cdc_value_ema")(spark, sfDir)
      .filter(col("event_type") === "click")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length > 5)
    rows.foreach { case (d, _, ema) =>
      val frame = rows.filter(r => r._1 >= d - 30 && r._1 <= d)
      val num = frame.map(r => r._2 * math.pow(0.5, (d - r._1) / 7.0)).sum
      val den = frame.map(r => math.pow(0.5, (d - r._1) / 7.0)).sum
      // the collected v is rounded 4dp, so compare loosely
      assert(math.abs(ema - num / den) < 0.01, s"day $d: $ema vs ${num / den}")
    }
  }

  test("path counts: paths are time-ordered regardless of input partitioning") {
    val base = SparkEntry.queries("cdc_path_counts")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // scrambled partitioning must not change any path string (the
    // array_sort on (rn, type) structs is what guarantees this)
    val ev = Tables.load(spark, sfDir, "events").repartition(13)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val scrambled = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("user_id")
      .agg(concat_ws(">",
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(base == scrambled)
  }

  test("lttb downsample: first/last kept, point budget held, spikes survive") {
    val ev = Tables.load(spark, sfDir, "events")
    val daily = ev.groupBy(col("event_type"),
        floor(unix_micros(col("ts")) / 86400000000L).cast("long").as("d"))
      .agg(count(lit(1)).as("cnt"))
    val got = SparkEntry.queries("cdc_lttb")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = got.groupBy(_._1)
    byType.foreach { case (t, pts) =>
      assert(pts.length <= 10, s"$t: ${pts.length} points > budget")
      val series = daily.filter(col("event_type") === t)
        .withColumn("x", col("d") -
          min(col("d")).over(org.apache.spark.sql.expressions.Window
            .partitionBy("event_type")))
        .select("x", "cnt").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      // endpoints always survive; every kept point is a series member
      assert(pts.map(_._2).contains(series.head._1), s"$t lost first point")
      assert(pts.map(_._2).contains(series.last._1), s"$t lost last point")
      val lookup = series.toMap
      pts.foreach { case (_, x, y) =>
        assert(lookup.get(x).contains(y), s"$t: ($x,$y) not in the series")
      }
      // the series' global max (a visual spike) must survive in types
      // where it is unique — the property LTTB exists to preserve
      val maxY = series.map(_._2).max
      if (series.count(_._2 == maxY) == 1 && pts.length < series.length)
        assert(pts.exists(_._3 == maxY), s"$t: dropped its unique peak $maxY")
    }
  }

  test("bottom-k sample is mergeable: bottom-k(union) == bottom-k of per-shard bottom-ks") {
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("h", md5(col("doc_id").cast("string")))
      .select("lang", "doc_id", "h")
    def bottomK(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("h", "doc_id")
      df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select("lang", "doc_id", "h")
    }
    val direct = bottomK(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val shardA = bottomK(docs.filter(col("doc_id") % 2 === 0))
    val shardB = bottomK(docs.filter(col("doc_id") % 2 =!= 0))
    val merged = bottomK(shardA.unionByName(shardB)).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(direct == merged)
  }

  test("domain cap is mergeable: cap(union) == cap of per-shard caps, " +
    "and accounting ties out") {
    // J14 (r10): the per-domain cap is a per-source bottom-k draw, so
    // shard-then-merge must equal the direct cap — the property that
    // lets daily shards compose into a capped corpus.
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("h", md5(col("doc_id").cast("string")))
      .select("source", "doc_id", "h")
    def cap(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("h", "doc_id")
      df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
        .select("source", "doc_id", "h")
    }
    val direct = cap(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val merged = cap(cap(docs.filter(col("doc_id") % 3 === 0))
        .unionByName(cap(docs.filter(col("doc_id") % 3 === 1)))
        .unionByName(cap(docs.filter(col("doc_id") % 3 === 2))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(direct == merged)
    // the stats entry's accounting matches the kept rows per source
    val kept = SparkEntry.queries("corpus_domain_cap")(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("corpus_domain_cap_stats")(spark, sfDir).collect()
      .foreach { r =>
        val (src, n, k, d) =
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
        assert(k == kept.getOrElse(src, 0L), s"$src kept $k != ${kept.get(src)}")
        assert(n - k == d && k <= 10L, s"$src: n=$n k=$k d=$d")
      }
  }

  test("next_event counts partition the signup count") {
    val ev = Tables.load(spark, sfDir, "events")
    val signups = ev.filter(col("event_type") === "signup").count()
    val got = SparkEntry.queries("cdc_next_event")(spark, sfDir)
      .agg(sum(col("cnt"))).head().getLong(0)
    assert(got == signups, s"next-event rows $got != signups $signups")
  }

  test("q21 decorrelation == the literal EXISTS/NOT EXISTS form") {
    // the operator replaces Q21's two correlated subqueries with one
    // per-order aggregation (nsupp >= 2, nlate == 1); replay the
    // LITERAL correlated form through Spark SQL itself and demand
    // identical results — an in-engine twin of the DuckDB oracle
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView("q21_l")
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("q21_o")
    Tables.load(spark, sfDir, "supplier").createOrReplaceTempView("q21_s")
    val literal = spark.sql(
      """WITH lo AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
                     FROM q21_l JOIN q21_o ON l_orderkey = o_orderkey
                     WHERE o_orderstatus = 'F'),
           cand AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lo
                    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAYS)
         SELECT s_suppkey, s_name, count(*) AS numwait
         FROM cand c JOIN q21_s ON s_suppkey = c.l_suppkey
         WHERE EXISTS (SELECT 1 FROM lo
                       WHERE lo.l_orderkey = c.l_orderkey
                         AND lo.l_suppkey <> c.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lo
                           WHERE lo.l_orderkey = c.l_orderkey
                             AND lo.l_suppkey <> c.l_suppkey
                             AND lo.l_shipdate >
                                 lo.o_orderdate + INTERVAL 60 DAYS)
         GROUP BY s_suppkey, s_name""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val got = SparkEntry.queries("q21_waiting_supplier")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == literal,
      s"decorrelated ${got.size} rows != literal ${literal.size}")
    assert(got.nonEmpty, "q21 fixture selected nothing — predicate dead")
  }

  test("q16 anti-join == the literal NOT IN form; groups bounded") {
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView("q16_l")
    Tables.load(spark, sfDir, "part").createOrReplaceTempView("q16_p")
    Tables.load(spark, sfDir, "supplier").createOrReplaceTempView("q16_s")
    val literal = spark.sql(
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM q16_l JOIN q16_p ON l_partkey = p_partkey
         WHERE l_suppkey NOT IN (SELECT s_suppkey FROM q16_s
                                 WHERE s_acctbal < 0)
         GROUP BY p_brand, p_size""")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSet
    val df = SparkEntry.queries("q16_supplier_cnt")(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == literal,
      s"anti-join ${got.size} groups != NOT IN ${literal.size}")
    // output is attribute-bounded: |brand| x |size| at any corpus size
    val bound = Tables.load(spark, sfDir, "part")
      .select("p_brand", "p_size").distinct().count()
    assert(got.size <= bound, s"${got.size} groups > $bound attributes")
  }

  test("q19 manual implied-predicate hoisting == the literal OR form") {
    // the operator hoists the conjuncts implied by the cross-relation
    // OR (brand ∈ {1,2,3}, size ≤ 15, qty ≤ 30) above the join so both
    // scans prune; replay the UNHOISTED literal form through Spark SQL
    // and demand the identical aggregate — proving the hoist is
    // semantics-preserving, not just plan-flattering
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView("q19_l")
    Tables.load(spark, sfDir, "part").createOrReplaceTempView("q19_p")
    val literal = spark.sql(
      """SELECT count(*) AS n_lines,
                sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  / CAST(10000.0 AS DOUBLE) AS revenue
         FROM q19_l JOIN q19_p ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30)""").head()
    val got = SparkEntry.queries("q19_disjunctive")(spark, sfDir).head()
    assert(got.getLong(0) == literal.getLong(0) &&
           got.getDouble(1) == literal.getDouble(1),
      s"hoisted (${got.getLong(0)}, ${got.getDouble(1)}) != " +
        s"literal (${literal.getLong(0)}, ${literal.getDouble(1)})")
    assert(got.getLong(0) > 0, "q19 fixture selected nothing — predicate dead")
  }

  test("q2 argmin join-back == the literal correlated-min form; ties kept") {
    // replay Q2's correlated scalar-min subquery through Spark SQL and
    // demand the identical result set (pre-LIMIT, so the comparison is
    // order-free) — proving the min-agg join-back decorrelation
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView("q2_l")
    Tables.load(spark, sfDir, "part").createOrReplaceTempView("q2_p")
    Tables.load(spark, sfDir, "supplier").createOrReplaceTempView("q2_s")
    Tables.load(spark, sfDir, "nation").createOrReplaceTempView("q2_n")
    val literal = spark.sql(
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM q2_l),
           w AS (SELECT p_partkey, s_name, s_nationkey,
                        CAST(round(s_acctbal * 100) AS BIGINT) AS bal
                 FROM ps
                 JOIN q2_p ON l_partkey = p_partkey
                 JOIN q2_s ON l_suppkey = s_suppkey
                 WHERE p_size = 15)
         SELECT bal, s_name, n_name, p_partkey
         FROM w JOIN q2_n ON s_nationkey = n_nationkey
         WHERE bal = (SELECT min(bal) FROM w w2
                      WHERE w2.p_partkey = w.p_partkey)""")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    // sf0.001 result is < the 100 limit, so the operator output IS the
    // full qualifying set
    val got = SparkEntry.queries("q2_min_cost_supp")(spark, sfDir)
      .collect()
      .map(r => (math.round(r.getDouble(0) * 100), r.getString(1),
        r.getString(2), r.getLong(3)))
      .toSet
    assert(got.size < 100, "fixture outgrew the LIMIT — compare invalid")
    assert(got == literal,
      s"decorrelated ${got.size} rows != literal ${literal.size}")
    assert(got.nonEmpty, "q2 fixture selected nothing — predicate dead")
    // the argmin keeps ALL tied suppliers: every (part, min-bal) group
    // in the literal set appears fully
    val perPart = literal.groupBy(_._4).view.mapValues(_.size).toMap
    val gotPerPart = got.groupBy(_._4).view.mapValues(_.size).toMap
    assert(perPart == gotPerPart, "tie multiplicity differs per part")
  }

  test("q20 nested-semi decorrelation == the literal correlated form") {
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView("q20_l")
    Tables.load(spark, sfDir, "part").createOrReplaceTempView("q20_p")
    Tables.load(spark, sfDir, "supplier").createOrReplaceTempView("q20_s")
    val literal = spark.sql(
      """WITH pq AS (SELECT l_partkey, l_suppkey,
                           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qv
                    FROM q20_l
                    WHERE l_partkey IN (SELECT p_partkey FROM q20_p
                                        WHERE p_name LIKE '%widget%')
                    GROUP BY 1, 2)
         SELECT s_suppkey, s_name FROM q20_s
         WHERE s_suppkey IN (
           SELECT l_suppkey FROM pq
           WHERE pq.qv * (SELECT count(*) FROM pq q2
                          WHERE q2.l_partkey = pq.l_partkey)
                 > 2 * (SELECT sum(q2.qv) FROM pq q2
                        WHERE q2.l_partkey = pq.l_partkey))""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = SparkEntry.queries("q20_promotion_parts")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == literal,
      s"decorrelated ${got.size} suppliers != literal ${literal.size}")
    assert(got.nonEmpty, "q20 fixture selected nothing — predicate dead")
  }

  test("weighted pagerank: equal weights == unweighted; mass conserved") {
    val s2 = spark
    import s2.implicits._
    // a-b-c chain + dangling d, distinct weights elsewhere unused
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("a", "b")
    val unw = operators.GraphOps.pageRankDirectedWithN(edges, iters = 3)._1
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w1 = operators.GraphOps.pageRankWeightedWithN(
        edges.withColumn("w", lit(7L)), iters = 3)._1
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // identical CONSTANT weight cancels in w/W — exact same doubles
    assert(unw.keySet == w1.keySet)
    unw.foreach { case (n, r) =>
      assert(math.abs(w1(n) - r) < 1e-12, s"node $n: $r vs ${w1(n)}") }
    // unequal weights shift rank toward the heavy edge but conserve mass
    val w2 = operators.GraphOps.pageRankWeightedWithN(
        Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
          .toDF("a", "b", "w"), iters = 3)._1
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w2(2L) > w1(2L), "heavy 1->2 lane must raise node 2's rank")
    assert(math.abs(w2.values.sum - 1.0) < 1e-9, s"mass ${w2.values.sum}")
  }

  test("vocab coverage: boundary-tie arithmetic at the checkpoint") {
    // 5 hot tokens (10x each) + 200 singleton tokens: rank 100 cuts
    // MID-CLASS through the singletons, so coverage(100) must count
    // exactly 95 of them — the (k − n_above)·c partial term
    val s2 = spark
    import s2.implicits._
    val text = ((1 to 5).flatMap(i => Seq.fill(10)(s"hot$i")) ++
      (1 to 200).map(i => s"rare$i")).mkString(" ")
    // drive the fold through the public entry by staging the fixture
    // as a one-table dir
    val dir = java.nio.file.Files.createTempDirectory("vc").toString
    Seq((1L, text, "en", "fixture"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_vocab_coverage")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val total = 5 * 10 + 200
    // rank 100: all 5 hot classes (50 tokens) + 95 singletons
    assert(got(100L) == ((100L, 145L,
      math.rint(145.0 / total * 1e4) / 1e4)), s"got ${got(100L)}")
    // rank 1000 > vocab (205): full coverage, vocab_used capped
    assert(got(1000L) == ((205L, total.toLong, 1.0)), s"got ${got(1000L)}")
  }

  test("edit-distance pairs: blocked == brute force; corner fixture") {
    // the recall proof says two-pass prefix/suffix blocking loses
    // NOTHING on keys of length >= 2p at maxDist 1 — verify by
    // quadratic brute force over the real corpus
    val keyed = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id").as("id"),
        lower(substring(col("text"), 1, 24)).as("k"))
      .filter(length(col("k")) >= 20)
    val brute = keyed.as("a").join(keyed.as("b"), col("a.id") < col("b.id"))
      .filter(abs(length(col("a.k")) - length(col("b.k"))) <= 1 &&
        levenshtein(col("a.k"), col("b.k")) <= 1)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("dedup_edit_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"blocked ${got.size} != brute ${brute.size}")
    // directed corners: an edit at the FRONT survives via the suffix
    // pass, at the END via the prefix pass, in the MIDDLE via both;
    // distance-2 pairs and short keys are excluded by contract
    val s2 = spark
    import s2.implicits._
    val base = "abcdefghij0123456789xyzw"          // 24 chars
    val fx = Seq(
      1L -> base,
      2L -> ("Z" + base.tail),                      // front substitution
      3L -> (base.init + "Z"),                      // end substitution
      4L -> (base.take(12) + "Z" + base.drop(13)),  // middle substitution
      5L -> (base.take(12) + base.drop(13)),        // middle deletion
      6L -> ("ZZ" + base.drop(2)),                  // distance 2 — out
      7L -> "shortkey")                             // < 2p — out of domain
      .toDF("doc_id", "text")
    val gotFx = operators.Dedup.editDistancePairs(fx, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotFx == Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L),
      (1L, 5L, 1L), (4L, 5L, 1L), (2L, 6L, 1L)),
      s"fixture got $gotFx")
    // over-cap blocks drop entirely (the documented recall stance)
    val capped = operators.Dedup.editDistancePairs(
      fx, "doc_id", "text", blockCap = 1L)
    assert(capped.count() == 0, "cap 1 must drop every shared block")
  }

  test("bigram ppl: independent in-memory replay on sf0.001") {
    // recompute every document's (n_big, n_backoff, avg_nll) from the
    // raw text in plain Scala — train on even doc_ids, min-count-2
    // bigram table, stupid backoff to add-one unigrams — and demand
    // exact agreement with the distributed plan (4dp on the NLL)
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split(" ").filter(_.nonEmpty).toSeq)
    val train = docs.filter(_._1 % 2 == 0)
    val uni = train.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = uni.values.sum; val v = uni.size.toLong
    val big = train.flatMap(_._2.sliding(2).filter(_.size == 2))
      .map(p => (p(0), p(1))).groupBy(identity)
      .collect { case (k, o) if o.size >= 2 => k -> o.size.toLong }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = docs.collect { case (id, t) if t.size >= 2 =>
      val nlls = t.sliding(2).filter(_.size == 2).map { p =>
        (big.get((p(0), p(1))), uni.get(p(0))) match {
          case (Some(bc), Some(pc)) => (math.log(pc.toDouble / bc), 0L)
          case (_, _) =>
            (math.log((n + v).toDouble /
              (0.4 * (uni.getOrElse(p(1), 0L) + 1))), 1L)
        }
      }.toSeq
      id -> ((nlls.size.toLong, nlls.map(_._2).sum,
        r4(nlls.map(_._1).sum / nlls.size)))
    }.toMap
    val got = SparkEntry.queries("text_bigram_ppl")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == want.keySet,
      s"doc coverage differs: ${got.size} vs ${want.size}")
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"doc $id: got ${got(id)} want $w")
    }
    assert(want.nonEmpty)
  }

  test("q12 high+low partition the late-line count; q8 share in [0,1]") {
    // q12's two conditional counts are a partition of the late-join
    // row count — recompute the total independently
    val lateTotal = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
              col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .join(Tables.load(spark, sfDir, "orders")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .count()
    val q12 = SparkEntry.queries("q12_late_lines")(spark, sfDir)
      .agg(sum(col("high_line_count") + col("low_line_count"))).head().getLong(0)
    assert(q12 == lateTotal, s"q12 partition sum $q12 != late rows $lateTotal")
    // q8's conditional share is a fraction of the same aggregate by
    // construction — every year must sit in [0,1]
    SparkEntry.queries("q8_market_share")(spark, sfDir).collect().foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"share $share outside [0,1]")
    }
  }
}
