package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.Tables
import graft.operators.Multimodal
import graft.streaming.CdcStream

/** SURVEY §2.G (multimodal) + §2.H (streaming) driver entries.
  *
  * The multimodal binary payloads are synthesized deterministically
  * from `documents.text` (no binary test table exists); the Spark-side
  * plumbing — binary columns, metadata extraction, batched
  * partition-parallel decode — is the real thing.
  *
  * The streaming entries run the actual Structured Streaming engine
  * (file source → AvailableNow → memory sink) inside the query
  * builder, then hand the materialized result to the driver; H1/H2
  * equal their batch twins on a static file set, which the DuckDB
  * oracles check end-to-end.
  */
object PipelineQueries extends QueryPack {

  // source dir -> fully-written staging path (see stream_json_parse).
  // Keyed on the md5 of the FULL source path (32-bit String.hashCode
  // could collide two dataset dirs and silently stream the wrong
  // staged payloads) PLUS the process id (a concurrent second driver
  // process must not overwrite the dir this process is mid-stream
  // over — Staging registers it for exit-time cleanup), and populated
  // inside computeIfAbsent so the path is published only after the
  // write completes — a concurrent second caller in THIS process
  // blocks until the first finishes (happens-before via the map's
  // internal lock) instead of reading a half-written dir.
  private val stagedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // source dir -> doubled-events staging path (stream_dedup_exact);
  // same once-per-JVM publish-after-write discipline as stagedDirs
  private val dupStagedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // source dir -> landed HLL state path (stream_uniq_state_check)
  private val uniqLanded =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // source dir -> landed closed-version history path (stream_scd2)
  private val scd2Landed =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // source dir -> landed finalized-session / dedup-survivor paths
  // (stream_sessionize / stream_dedup_exact, r10 parquet landings)
  private val sessLanded =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val dedupLanded =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // source dir -> landed topK state path (stream_topk_state_check)
  private val topkLanded =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // unique memory-sink names for stream_progress across warmup/timed
  // runs in one JVM (a reused name would re-register the same table)
  private val progressId = new java.util.concurrent.atomic.AtomicLong(0)

  // dir -> landed Derby table / monthly landing path: the stream runs
  // once per JVM and the timed entry reads the landed store back (the
  // cdc_compacted staging pattern — the sink round trip is verified,
  // re-runs measure the scan + rollup, and AvailableNow checkpoints
  // make a re-run a no-op anyway)
  private val jdbcLanded =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // dir -> staged relationship-event wire payloads (stream_latest_rel)
  private val relStagedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // dir -> landed output of the Bloom-dedup stream (streams once per
  // JVM, timed re-runs read the landed store — the jdbcLanded pattern)
  private val bloomLanded =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val monthlyLanded =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The month-partitioned landing tree for `dir`, streamed once per
    * JVM (shared by stream_land_monthly + storage_stats — one landing,
    * two verification angles). */
  private def monthlyLandingFor(s: org.apache.spark.sql.SparkSession,
                                dir: String): String =
    monthlyLanded.computeIfAbsent(dir, d => {
      val p = Staging.path("stream_land", d)
      val ckpt = Staging.path("stream_land_ckpt", d)
      CdcStream.landMonthly(CdcStream.readEvents(s, d), "ts", p, ckpt)
      p
    })

  val queries: Map[String, Q] = Map(
    // G1: binary metadata extraction (byte length, header, digest).
    "mm_binary_meta" -> ((s, dir) =>
      Multimodal.binaryMeta(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin")),
        "doc_id", "bin")
        .orderBy("doc_id")),

    // G2: batched feature-extraction pipeline (stubbed decode; typed
    // Dataset in/out). The stub's outputs are byte arithmetic, so the
    // WHOLE pipeline is oracle-checked (closing r4's last bare
    // rows-only entry): width/height are mod-arithmetic in the byte
    // length; the histogram's bin 0 counts bytes with low nibble 0,
    // which DuckDB recomputes from hex(payload) — surfaced as the
    // integer count (f0_cnt = f0·n, exact in float for any real
    // payload) rather than the float ratio, whose 4-dp rounding could
    // hash-differ from the oracle's double at a tie. hist_ok pins the
    // normalization leg (bins sum to 1) with a literal expectation.
    "mm_feature_stub" -> ((s, dir) => {
      import s.implicits._
      // null-payload parity with the oracle: decodeStub coerces a null
      // payload to empty (n_bytes=0, hist_ok=true) while DuckDB derives
      // NULLs — filter null text on BOTH sides so a corpus that grows a
      // null row can't hash-diverge (ADVICE r5; none exist today)
      val media = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
        .as[Multimodal.Media]
      Multimodal.extractFeatures(media)
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(element_at(col("features"), 1) *
            greatest(col("n_bytes"), lit(1))).cast("long").as("f0_cnt"),
          (abs(aggregate(col("features"), lit(0.0d), (a, x) => a + x) -
            when(col("n_bytes") > 0, lit(1.0d)).otherwise(lit(0.0d))) < 0.001)
            .as("hist_ok"))
        .orderBy("doc_id")
    }),

    // G3: frame sampling — every 2nd 4KiB chunk as a frame row; the
    // per-doc frame count and first-frame size are pure arithmetic in
    // payload length, so this typed-flatMap pipeline is ORACLE-checked
    // end to end (empty payloads emit no frames; none exist in the
    // corpus, and the oracle filters the same way).
    "mm_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
        .as[Multimodal.Media]
      Multimodal.sampleFrames(media, frameBytes = 4096, everyNth = 2)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          min(when(col("frame_idx") === 0, length(col("bytes"))))
            .cast("long").as("f0_bytes"))
        .orderBy("doc_id")
    }),

    // G4 (was spec-only): byte-budget resize. The stub's stride
    // subsampling is arithmetic in the payload length — output size
    // and the preserved first byte are DuckDB-recomputable, so the
    // batch-shaped resize pipeline is oracle-checked end to end
    // (payloads ≤ budget pass through at full length; longer ones
    // shrink to ceil(n/stride) with stride = ceil(n/budget)).
    "mm_resize" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
        .as[Multimodal.Media]
      Multimodal.resize(media, targetBytes = 1024)
        .select(col("doc_id"),
          length(col("bytes")).cast("long").as("n_out"),
          lower(hex(substring(col("bytes"), 1, 1))).as("head_hex"))
        .orderBy("doc_id")
    }),

    // H1: streaming windowed counts == batch aggregation (AvailableNow
    // over the static file set).
    "stream_event_counts" -> ((s, dir) => {
      val agg = CdcStream.eventCounts(CdcStream.readEvents(s, dir))
      CdcStream.runToMemory(agg, OutputMode.Complete())
        .select(
          unix_micros(col("window.start")).as("day_us"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("day_us", "event_type")
    }),

    // H1b: the reference's ACTUAL stream topology — raw CDC JSON
    // arriving on a stream, parsed in-flight by the same CdcJson
    // columns the batch path uses (Kafka queue -> MV parse -> typed
    // table, 01-init-tables.sql:40-89), then aggregated. File-source
    // stand-in for the Kafka source; the parse/agg dataflow is
    // identical.
    "stream_json_parse" -> ((s, dir) => {
      // staging written once per JVM per source dir (in-memory guard,
      // NOT an on-disk marker: /tmp outlives the process, and stale
      // staged payloads would silently diverge from the live oracle):
      // the synthesized wire-format file set is test INPUT, not part
      // of the streamed work being exercised/measured
      val staging = stagedDirs.computeIfAbsent(dir, d => {
        val p = Staging.register(
          s"${System.getProperty("java.io.tmpdir")}/graft_stream_json_" +
            s"${Staging.md5Hex(d)}_${ProcessHandle.current().pid()}")
        graft.sources.CdcJson
          .synthesizeNodeJson(Tables.load(s, d, "events"))
          .write.mode("overwrite").text(p)
        p
      })
      val raw = s.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("value", org.apache.spark.sql.types.StringType))
        .text(staging)
      val typed = graft.sources.CdcJson.parseNodes(raw, "value")
      // distinct aggs aren't streamable: aggregate per (op, entity)
      // in-stream (bounded state: one row per entity-op), roll up the
      // distinct count on the materialized result
      val agg = typed.groupBy(col("event_type").as("op"), col("entity_id"))
        .agg(count(lit(1)).as("cnt"))
      CdcStream.runToMemory(agg, OutputMode.Complete())
        .groupBy("op")
        .agg(sum(col("cnt")).as("cnt"), count(lit(1)).as("n_entities"))
        .orderBy("op")
    }),

    // H9 in the driver gate: run the H1 stream with a ProgressCollector
    // attached and hand the MONITOR's accounting to the oracle — the
    // per-batch numInputRows reported on the listener bus must sum to
    // exactly the source row count (AvailableNow reads the file set
    // once). This is the `system.kafka_consumers` analog proving the
    // ops surface measures the pipeline, not an approximation of it.
    "stream_progress" -> ((s, dir) => {
      import s.implicits._
      val expected = Tables.load(s, dir, "events").count()
      val c = graft.streaming.Progress.attach(s)
      try {
        val name = s"graft_progress_${progressId.incrementAndGet()}"
        val q = CdcStream.eventCounts(CdcStream.readEvents(s, dir))
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Complete())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // listener delivery is async: poll until the monitor's rows
        // account for the full source (or a generous deadline)
        val deadline = System.currentTimeMillis() + 30000
        while (c.forQuery(name).map(_.numInputRows).sum < expected &&
               System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        val rows = c.forQuery(name)
        Seq((rows.map(_.numInputRows).sum, rows.nonEmpty))
          .toDF("rows_total", "saw_batches")
      } finally graft.streaming.Progress.detach(s, c)
    }),

    // H3 (was spec-only): watermarked Append-mode windowed counts —
    // the always-on production shape of H1 (state evicted as windows
    // close). Deterministic on a static file set: the single-file
    // source processes in one batch, the trailing no-data batch lifts
    // the watermark to max(ts) − delay, and Append emits exactly the
    // windows whose END the final watermark passed — which the oracle
    // recomputes relationally (windows with end ≤ max(ts) − 1 day).
    "stream_counts_watermarked" -> ((s, dir) => {
      // the determinism argument above leans on the trailing no-data
      // batch advancing the watermark after the last data batch — pin
      // the conf (its default) rather than inherit whatever the host
      // session was configured with
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      val agg = CdcStream.eventCountsWatermarked(
        CdcStream.readEvents(s, dir), delay = "1 day")
      CdcStream.runToMemory(agg, OutputMode.Append())
        .select(
          unix_micros(col("window.start")).as("day_us"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("day_us", "event_type")
    }),

    // H20 (r14): SLIDING windows (6 h every 3 h) — each event lands in
    // exactly 2 epoch-aligned windows; Append emits a window once the
    // watermark passes its end. The oracle regenerates both window
    // starts per event with integer epoch arithmetic and applies the
    // same finalization cut (the stream_counts_watermarked
    // determinism argument, overlap factor 2).
    "stream_sliding_counts" -> ((s, dir) => {
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      val agg = CdcStream.eventCountsSliding(
        CdcStream.readEvents(s, dir), size = "6 hours",
        slide = "3 hours", delay = "1 day")
      CdcStream.runToMemory(agg, OutputMode.Append())
        .select(
          unix_micros(col("window.start")).as("win_us"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("win_us", "event_type")
    }),

    // H12 (new r6): session_window sessionization — the always-on
    // twin of the batch lag/gap cdc_sessionize. Same determinism
    // argument as stream_counts_watermarked: the final watermark
    // settles at max(ts) − delay and Append emits exactly the
    // sessions whose end (last event + gap) it passed. The oracle
    // recomputes that finalized subset relationally; its new-session
    // predicate is strictly `> gap` because an exactly-gap follower
    // MERGES (sessions merge while nextStart ≤ prevEnd — pinned by
    // the PipelineSpec boundary test).
    // r10: lands to a parquet file sink (once per JVM, the scd2/jdbc
    // landed-store pattern) instead of the memory sink — session
    // output is ROW-SCALED (one row per session), and the memory
    // sink's driver-side materialization blew
    // spark.driver.maxResultSize at the 100× pack. The landed table
    // is the identical finalized-session set.
    "stream_sessionize" -> ((s, dir) => {
      val landed = sessLanded.computeIfAbsent(dir, d => {
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
        val agg = CdcStream.sessionize(CdcStream.readEvents(s, d),
          gap = "30 minutes", delay = "1 day")
        val stage = Staging.path("sess_stream", d)
        CdcStream.runToParquet(agg, stage)
        stage
      })
      s.read.parquet(s"$landed/out")
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("sess_start_us"),
          unix_micros(col("session_window.end")).as("sess_end_us"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "sess_start_us")
    }),

    // H4 (was spec-only): the reference's END-TO-END topology — a CDC
    // stream landed into a real JDBC store via foreachBatch (Kafka →
    // ClickHouse insert; embedded Derby here, same writer surface) and
    // read BACK through JDBC for the rollup, so the oracle checks the
    // full stream → batched-insert → scan loop, not the in-memory agg.
    "stream_jdbc_land" -> ((s, dir) => {
      System.setProperty("derby.system.home",
        System.getProperty("java.io.tmpdir"))
      def opts(table: String) = graft.sinks.JdbcSink.options(
        "jdbc:derby:memory:graftstream;create=true", table, "app", "app",
        numPartitions = 4, driver = "org.apache.derby.jdbc.EmbeddedDriver")
      val table = jdbcLanded.computeIfAbsent(dir, d => {
        val t = s"stream_land_${Staging.md5Hex(d).take(8)}"
        val ckpt = Staging.path("stream_jdbc_ckpt", d)
        val stream = CdcStream.readEvents(s, d)
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
            col("user_id"), col("event_type"), col("value"))
        CdcStream.sinkEachBatch(stream, opts(t), ckpt,
          queryName = Some(s"graft_jdbc_land_$t"))
        t
      })
      // min_day/max_day make this oracle time-SIGHTED: a corrupted
      // event-time path (e.g. all timestamps collapsed to 1970 by a
      // representation mismatch) previously sailed through because the
      // compared rollup dropped every ts-derived column
      graft.sinks.JdbcSink.read(s, opts(table))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          count_distinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 4).as("value_sum"),
          floor(min(col("ts_us")) / 86400000000L).cast("long").as("min_day"),
          floor(max(col("ts_us")) / 86400000000L).cast("long").as("max_day"))
        .orderBy("event_type")
    }),

    // H7 (was spec-only): landMonthly — the stream landed straight
    // into the reference's month-partitioned layout (PARTITION BY
    // toYYYYMM) and read back through the partition tree; per-month
    // rollup must reconcile with the base table, proving no row
    // missed/duplicated a month directory.
    "stream_land_monthly" -> ((s, dir) => {
      graft.sinks.ParquetSink.readMonthly(s, monthlyLandingFor(s, dir))
        .groupBy(col("month").cast("long").as("month"))
        .agg(count(lit(1)).as("cnt"),
          count_distinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 4).as("value_sum"))
        .orderBy("month")
    }),

    // I6 (was spec-only): storage stats over the same landed tree —
    // the reference's system.parts monitoring surface. The row-
    // accounting leg is oracle-checked (per-month rows == base table);
    // files/bytes are layout-dependent, so the oracle pins only their
    // invariant (≥1 data file per month, bytes exceed row count) and
    // the exact file accounting stays in the ParquetSink spec.
    "storage_stats" -> ((s, dir) =>
      graft.sinks.ParquetSink.statsMonthly(s, monthlyLandingFor(s, dir))
        .select(col("month").cast("long").as("month"),
          col("rows").as("n_rows"),
          (col("files") >= 1 && col("bytes") > col("rows")).as("layout_ok"))
        .orderBy("month")),

    // H6 (was spec-only): streaming exact dedup with bounded state.
    // The source is staged DOUBLED (every event file written twice —
    // real duplicate delivery, the at-least-once replay the operator
    // exists to absorb); dropDuplicatesWithinWatermark must recover
    // EXACTLY the original event set however AvailableNow batches the
    // files. The watermark delay deliberately EXCEEDS the dataset's
    // event-time span (ADVICE r5): with a short delay, a batching that
    // lands BOTH copies of an old event behind an already-advanced
    // watermark would drop the event entirely — late-row loss, not
    // dedup. A span-exceeding delay keeps every row inside the
    // horizon, so duplicates always hit live dedup state and the
    // result is batching-independent. (Bounded-state behavior under a
    // SHORT horizon stays covered by the CdcStream spec.)
    "stream_dedup_exact" -> ((s, dir) => {
      val staging = dupStagedDirs.computeIfAbsent(dir, d => {
        val p = Staging.path("dup_events", d)
        val raw = s.read.parquet(s"$d/events.parquet")
        raw.union(raw).write.mode("overwrite").parquet(p)
        p
      })
      val raw = CdcStream.streamEventParquet(s, staging, schemaFrom = staging)
        // content fingerprint (the D1 dedup key, streaming form)
        .withColumn("fp", md5(concat_ws("|",
          col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))))
      val deduped = CdcStream.dedupExactStream(raw, "fp", "ts", "3650 days")
      // r10: parquet landing (not the memory sink) — survivor output
      // is row-scaled and broke spark.driver.maxResultSize at 100×;
      // see stream_sessionize.
      val landed = dedupLanded.computeIfAbsent(dir, d => {
        val stage = Staging.path("dedup_stream", d)
        CdcStream.runToParquet(deduped, stage)
        stage
      })
      // ts_us in the compared rows makes the oracle time-SIGHTED: a
      // representation mismatch that shifts or collapses event time
      // now hash-mismatches instead of hiding behind ts-free columns
      s.read.parquet(s"$landed/out")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy("event_id")
    }),

    // H14 (r8): streaming SCD Type-2 history — the incremental twin of
    // cdc_history_scd2. Closed versions are emitted exactly once (when
    // the next event for the entity arrives) and land append-only;
    // state carries ONE (version, open event) pair per entity, never
    // history. The input is split at the GLOBAL time midpoint into two
    // files streamed one-per-batch with explicitly forced mtime order
    // (FileStreamSource processes oldest-first), so every entity whose
    // events straddle the cut proves the cross-batch chain: batch 2's
    // first event closes the open version carried in state from batch
    // 1. Oracle = the batch SCD2 build's closed rows — stream equals
    // batch exactly because the chain build is a pure left fold and a
    // global time cut preserves per-entity order across batches.
    "stream_scd2" -> ((s, dir) => {
      val landed = scd2Landed.computeIfAbsent(dir, d => {
        val stage = Staging.path("scd2_stream", d)
        val in = s"$stage/in"
        val ev = Tables.load(s, d, "events")
        val Array(loUs, hiUs) = ev
          .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val midUs = loUs + (hiUs - loUs) / 2
        ev.filter(unix_micros(col("ts")) < midUs)
          .coalesce(1).write.mode("overwrite").parquet(in)
        val inDir = new java.io.File(in)
        val chunk1 = inDir.listFiles().map(_.getAbsolutePath).toSet
        ev.filter(unix_micros(col("ts")) >= midUs)
          .coalesce(1).write.mode("append").parquet(in)
        // force deterministic batch order: the file source sorts by
        // modification time, and back-to-back writes can land in the
        // same clock tick
        val base = System.currentTimeMillis() - 120000
        inDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          f.setLastModified(
            if (chunk1.contains(f.getAbsolutePath)) base else base + 60000)
        }
        val stream = graft.Tables.normalizeEventTime(
          s.readStream.schema(s.read.parquet(in).schema)
            .option("maxFilesPerTrigger", 1).parquet(in), in, "ts")
        import s.implicits._
        val evs = stream.select(col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("user_id"),
          col("event_type"), col("value")).as[CdcStream.Ev]
        val q = CdcStream.scd2Closed(evs).toDF().writeStream
          .format("parquet").option("path", s"$stage/closed")
          .option("checkpointLocation", s"$stage/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s"$stage/closed"
      })
      s.read.parquet(landed)
        .select(col("user_id"), col("version"), col("event_type"),
          round(col("value"), 4).as("value"),
          col("valid_from_us"), col("valid_to_us"))
        .orderBy("user_id", "version")
    }),

    // H10 (new r6): streaming exact dedup against ALL history with
    // BOUNDED carried state — the Bloom-filter complement to H6
    // (whose exact state is horizon-limited by the watermark). Two
    // overlapping "daily" chunks (doc_id%2==0, then %3==0; overlap =
    // %6==0) stream ONE FILE PER MICRO-BATCH, so chunk 2's overlap is
    // suppressed by the PERSISTED filter carried over from batch 1 —
    // cross-batch state, not in-batch dedup. Flagged maybes ε-verify
    // against the landed store, so a Bloom false positive cannot drop
    // a clean doc: the landed set is EXACTLY chunk1 ∪ chunk2, and
    // batching-independent (both chunks in one batch ⇒ the in-batch
    // dropDuplicates leg yields the same set).
    "stream_bloom_dedup" -> ((s, dir) => {
      val landed = bloomLanded.computeIfAbsent(dir, d => {
        val stage = Staging.path("bloom_stream", d)
        val docs = s.read.parquet(s"$d/documents.parquet")
        // full-row fingerprint (doc_id leads and is unique, so fp is
        // unique per row — the dedup winner is deterministic)
        val fp = md5(concat_ws("|", col("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
        val in = s"$stage/in"
        docs.filter(col("doc_id") % 2 === 0).withColumn("fp", fp)
          .coalesce(1).write.mode("overwrite").parquet(in)
        docs.filter(col("doc_id") % 3 === 0).withColumn("fp", fp)
          .coalesce(1).write.mode("append").parquet(in)
        val bloomPath = s"$stage/state/bf.bin"
        val capacity = docs.count()
        val emptyFp = docs.limit(0).withColumn("fp", fp)
        graft.operators.Sketches.buildExactBloom(
          emptyFp, "fp", bloomPath, expectedItems = Some(capacity))
        val out = s"$stage/out"
        val stream = s.readStream.schema(emptyFp.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        CdcStream.dedupExactBloomLand(stream, "fp", bloomPath, capacity,
          s"$stage/ckpt",
          save = b => b.write.mode("append").parquet(out),
          verifyAgainst = Some(() =>
            if (new java.io.File(out).exists()) s.read.parquet(out)
            else emptyFp),
          queryName = Some("stream_bloom_dedup"))
        out
      })
      s.read.parquet(landed)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // H13 (new r7): streaming uniqState MV — the reference's
    // AggregatingMergeTree uniq MV fed from a stream, landed as a
    // persisted per-key HLL state table by read-merge-replace per
    // micro-batch (CdcStream.uniqStateLand). Two staged event files
    // stream one-per-batch, so batch 2 proves the merge against the
    // LANDED state (cross-batch accumulation, not one-shot agg).
    // Verdict columns: rows_state must equal the exact count (clean
    // AvailableNow run, no replay), estimate within the HLL bound.
    "stream_uniq_state_check" -> ((s, dir) => {
      val statePath = uniqLanded.computeIfAbsent(dir, d => {
        val stage = Staging.path("uniq_state_stream", d)
        val ev = s.read.parquet(s"$d/events.parquet")
        val in = s"$stage/in"
        ev.filter(col("event_id") % 2 === 0)
          .coalesce(1).write.mode("overwrite").parquet(in)
        ev.filter(col("event_id") % 2 === 1)
          .coalesce(1).write.mode("append").parquet(in)
        val stream = s.readStream.schema(s.read.parquet(in).schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        CdcStream.uniqStateLand(stream, Seq("event_type"), "user_id",
          s"$stage/state", s"$stage/ckpt",
          queryName = Some("graft_uniq_state_land"))
        s"$stage/state/state"
      })
      val est = graft.operators.Sketches.estimateDistinct(
        s.read.parquet(statePath))
      val exact = Tables.load(s, dir, "events").groupBy("event_type")
        .agg(count(lit(1)).as("total_exact"),
          count_distinct(col("user_id")).as("uniq_exact"))
      // `total` is the STATE's row accounting (summed across the two
      // landed batches) — the oracle recomputes count(*), so the hash
      // compare itself proves the landing lost/duplicated nothing
      est.join(exact, "event_type")
        .select(col("event_type"), col("total"), col("uniq_exact"),
          (abs(col("uniq_est") - col("uniq_exact")) <=
            greatest(lit(2L), (col("uniq_exact") * 0.05).cast("long")))
            .as("est_ok"))
        .orderBy("event_type")
    }),

    // H13b (new r7): the same landing topology for the FREQUENT-ITEMS
    // family — topKState in a stream-fed MV, through the generic
    // CdcStream.landStateEachBatch combinator (proving the landing is
    // family-agnostic: any -State/-Merge pair of the Sketches suite
    // rides it). Verdict mirrors cdc_topk_state_check: returned counts
    // must equal the exact per-user counts (capacity keeps the sketch
    // in exact mode at the validated SFs) and every returned item must
    // clear the k-th largest exact count (tie-robust validity).
    "stream_topk_state_check" -> ((s, dir) => {
      val cap = 32768
      val statePath = topkLanded.computeIfAbsent(dir, d => {
        val stage = Staging.path("topk_state_stream", d)
        val ev = s.read.parquet(s"$d/events.parquet")
        val in = s"$stage/in"
        ev.filter(col("event_id") % 2 === 0)
          .coalesce(1).write.mode("overwrite").parquet(in)
        ev.filter(col("event_id") % 2 === 1)
          .coalesce(1).write.mode("append").parquet(in)
        val stream = s.readStream.schema(s.read.parquet(in).schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        CdcStream.topkStateLand(stream, Seq("event_type"), "user_id",
          s"$stage/state", s"$stage/ckpt", maxItemsTracked = cap,
          queryName = Some("graft_topk_state_land"))
        s"$stage/state/state"
      })
      val est = graft.operators.Sketches.topk(
          graft.operators.Sketches.mergeTopkStates(
            s.read.parquet(statePath), Seq("event_type"),
            maxItemsTracked = cap), k = 10)
        .select(col("event_type"), explode(col("topk")).as("e"))
        .select(col("event_type"), col("e.item").as("item"),
          col("e.count").as("est"))
      val events = Tables.load(s, dir, "events")
      val exact = events.groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("cnt"))
      val kth = exact.groupBy("event_type")
        .agg(sort_array(collect_list(col("cnt")), asc = false).as("cs"),
          count(lit(1)).as("n_users"))
        .select(col("event_type"),
          element_at(col("cs"),
            least(lit(10L), col("n_users")).cast("int")).as("kth_cnt"))
      est.join(exact.withColumnRenamed("user_id", "item"),
          Seq("event_type", "item"), "left")
        .join(kth, "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_returned"),
          sum(when(col("cnt").isNull || col("est") =!= col("cnt"), 1)
            .otherwise(0)).as("bad"),
          sum(when(col("cnt") < col("kth_cnt"), 1).otherwise(0)).as("below"))
        .select(col("event_type"), col("n_returned"),
          (col("bad") === 0).as("counts_exact_ok"),
          (col("below") === 0).as("topk_valid"))
        .orderBy("event_type")
    }),

    // H8 (was spec-only): latestByExpiring — the state-TTL deployment
    // shape of H2. Eviction is GC, not a data change (an evicted key's
    // later event re-creates and re-emits it), so the rollup of every
    // emitted update still equals the batch ReplacingMergeTree FINAL —
    // the same oracle as stream_latest_state, now also pinning that
    // TTL eviction never loses a newest-per-key row.
    "stream_latest_expiring" -> ((s, dir) => {
      import s.implicits._
      val evs = CdcStream.readEvents(s, dir)
        // EventTimeTimeout requires the watermark, and the watermarked
        // ts column must SURVIVE into the stateful operator (EvT keeps
        // it); 1 day keeps every same-day replay inside the horizon
        .withWatermark("ts", "1 day")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("ts"))
        .as[CdcStream.EvT]
      val updates = CdcStream.latestByExpiring[Long, CdcStream.EvT](
        evs, _.user_id,
        newer = (a, b) =>
          a.ts_us > b.ts_us || (a.ts_us == b.ts_us && a.event_id > b.event_id),
        eventTimeUs = _.ts_us, ttlMs = 7L * 24 * 3600 * 1000).toDF()
      CdcStream.runToMemory(updates, OutputMode.Update())
        .groupBy("user_id")
        .agg(max_by(
          struct(col("ts_us"), col("event_id"), col("event_type"), col("value")),
          struct(col("ts_us"), col("event_id"))).as("st"))
        .select(col("user_id"), col("st.event_type").as("last_type"),
          col("st.ts_us").as("last_ts_us"),
          round(col("st.value"), 4).as("last_value"))
        .orderBy("user_id")
    }),

    // H5 driver proof of latestBy's one-combinator-both-streams claim:
    // the RELATIONSHIP stream (raw rel JSON → parseRels → typed RelEv)
    // through the SAME generic combinator H2 uses for node events,
    // with its own record type and key (newest order per customer).
    // Oracle = the batch FINAL over orders.
    "stream_latest_rel" -> ((s, dir) => {
      import s.implicits._
      val staging = relStagedDirs.computeIfAbsent(dir, d => {
        val p = Staging.path("stream_rel_json", d)
        graft.sources.CdcJson
          .synthesizeRelJson(Tables.load(s, d, "orders"))
          .write.mode("overwrite").text(p)
        p
      })
      val raw = s.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("value", org.apache.spark.sql.types.StringType))
        .text(staging)
      val evs = graft.sources.CdcJson.parseRels(raw, "value")
        .select(col("event_id"),
          unix_micros(col("event_timestamp")).as("ts_us"),
          col("source_id"), col("target_id"),
          col("relationship_type").as("rel_type"))
        .as[CdcStream.RelEv]
      // event_id is the connector's STRING id — tiebreak numerically
      // ("100" < "99" lexically would pick the wrong order)
      val updates = CdcStream.latestBy[String, CdcStream.RelEv](
        evs, _.source_id,
        newer = (a, b) => a.ts_us > b.ts_us ||
          (a.ts_us == b.ts_us && a.event_id.toLong > b.event_id.toLong)).toDF()
      CdcStream.runToMemory(updates, OutputMode.Update())
        .groupBy("source_id")
        .agg(max_by(
          struct(col("ts_us"), col("event_id"), col("target_id"), col("rel_type")),
          struct(col("ts_us"), col("event_id").cast("long"))).as("st"))
        .select(col("source_id"), col("st.event_id").as("last_order"),
          col("st.ts_us").as("last_ts_us"),
          col("st.target_id").as("last_target"),
          col("st.rel_type").as("rel_type"))
        .orderBy("source_id")
    }),

    // H2: incremental flatMapGroupsWithState latest-state == the batch
    // ReplacingMergeTree FINAL (cdc_latest_state twin). The final
    // max_by collapse dedupes re-emissions if AvailableNow split the
    // file set into multiple micro-batches.
    "stream_latest_state" -> ((s, dir) => {
      import s.implicits._
      val evs = CdcStream.readEvents(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .as[CdcStream.Ev]
      val updates = CdcStream.latestState(evs).toDF()
      CdcStream.runToMemory(updates, OutputMode.Update())
        .groupBy("user_id")
        .agg(max_by(
          struct(col("ts_us"), col("event_id"), col("event_type"), col("value")),
          struct(col("ts_us"), col("event_id"))).as("st"))
        .select(col("user_id"), col("st.event_type").as("last_type"),
          col("st.ts_us").as("last_ts_us"),
          round(col("st.value"), 4).as("last_value"))
        .orderBy("user_id")
    }),

    // H11: the incremental funnel — same steps/window as cdc_funnel,
    // levels streamed per entity through flatMapGroupsWithState, then
    // folded to the SAME histogram the batch operator produces (and
    // the same DuckDB exists-any-chain oracle checks). Max-per-user
    // collapses re-emissions if AvailableNow splits the file set;
    // users that never emit (level 0) are restored from the batch
    // side so the histogram covers every entity.
    "stream_funnel" -> ((s, dir) => {
      import s.implicits._
      val evs = CdcStream.readEvents(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
        .as[CdcStream.Ev]
      val levels = CdcStream.funnelLevels(evs,
        Seq(_.event_type == "signup", _.event_type == "click",
          _.event_type == "purchase"),
        windowMicros = 4L * 3600 * 1000000)
        .toDF("user_id", "level")
      val lv = CdcStream.runToMemory(levels, OutputMode.Update())
        .groupBy("user_id").agg(max(col("level")).as("level"))
      Tables.load(s, dir, "events").select(col("user_id")).distinct()
        .join(lv, Seq("user_id"), "left")
        .na.fill(0, Seq("level"))
        .groupBy("level").agg(count(lit(1)).as("n_users"))
        .orderBy("level")
    }),

    // H17 (r10): stream-static enrichment — the event stream joined
    // per micro-batch against the STATIC customer dimension (key
    // projection c_custkey → user_id, c_mktsegment → segment), rolled
    // up per (segment, event_type). Complete mode: the aggregate is
    // global (no watermark — the join itself is stateless), and the
    // output is (segment × event_type)-scaled, so the memory sink is
    // the right landing. The final Complete table over a finite
    // source equals the batch left-join aggregate — the relational
    // oracle below, coalesce('unknown') keeping dimensionless facts.
    "stream_enrich_counts" -> ((s, dir) => {
      val dim = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("user_id"),
          col("c_mktsegment").as("segment"))
      val agg = CdcStream.enrichCounts(
        CdcStream.readEvents(s, dir), dim, "user_id", "segment")
      CdcStream.runToMemory(agg, OutputMode.Complete())
        .orderBy("segment", "event_type")
    }),

    // H18 (r10): stream-stream interval join — click→purchase
    // attribution pairs within a 30-minute window, per user. The
    // verification run pins delay at the full data span (3650 days)
    // so NO buffered row is evicted mid-run: the emitted pair set is
    // then exactly the batch interval join regardless of how
    // AvailableNow batches the files (an inner join emits on match,
    // never on watermark). Production uses the operator's bounded
    // delay — state O(horizon), the scaladoc contract — at the cost
    // of dropping pairs later than the delay; the eviction behavior
    // itself is pinned by the PipelineSpec state-rows test.
    "stream_interval_join" -> ((s, dir) => {
      val evs = CdcStream.readEvents(s, dir)
      val clicks = evs.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts"), col("user_id"))
      val purchases = evs.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts"), col("user_id"))
      val joined = CdcStream.intervalJoin(clicks, purchases, "user_id",
        within = "30 minutes", delay = "3650 days")
        .select(col("click_id"), col("purchase_id"),
          col("l.user_id").as("user_id"),
          unix_micros(col("l.ts")).as("click_us"),
          unix_micros(col("r.ts")).as("purchase_us"))
      // r11 (VERDICT r10 #7): the profiled cost was state-store
      // bookkeeping, not join work — a stream-stream join commits 4
      // state stores per shuffle partition per trigger, so 32
      // partitions meant 128 store commits per batch (an EMPTY
      // watermark-advance batch alone cost 2.9 s), for a stream
      // carrying ~40k rows/side. Scoped to this run: right-size the
      // stateful-shuffle width (fixed at query start) and skip the
      // no-data batch — an INNER interval join emits on match, and
      // the full-span delay means no eviction depends on the final
      // watermark advance, so the emitted set is identical (the
      // oracle pins it). Production keeps session defaults; the
      // bounded-delay eviction behavior stays spec'd in PipelineSpec.
      withSqlConf(s,
          "spark.sql.shuffle.partitions" -> "8",
          "spark.sql.streaming.noDataMicroBatches.enabled" -> "false") {
        CdcStream.runToMemory(joined, OutputMode.Append())
      }.orderBy("click_id", "purchase_id")
    }),

    // H19 (r12): stream-stream LEFT OUTER interval join — "which
    // clicks got NO purchase within 30 minutes" (VERDICT r11 #7).
    // Inner pairs emit on match exactly as H18; NULL-padded rows for
    // unmatched clicks emit only when the global watermark passes
    // click.ts + 30min (CdcStream.intervalJoinLeft scaladoc), so the
    // verification pins delay = 0 and KEEPS the no-data final batch
    // (it IS the watermark advance that flushes the NULL rows — the
    // opposite trade from H18's inner-only run). The oracle replays
    // the batch left join CUT AT THE SAME HORIZON: unmatched clicks
    // survive iff click_ms + 30min < final watermark (min over both
    // sides of max event-time, at Spark's millisecond watermark
    // granularity) — the honest terminating-run semantics, pinned
    // boundary-exact by PipelineSpec's eviction fixture.
    "stream_interval_left" -> ((s, dir) => {
      val evs = CdcStream.readEvents(s, dir)
      val clicks = evs.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts"), col("user_id"))
      val purchases = evs.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts"), col("user_id"))
      val joined = CdcStream.intervalJoinLeft(clicks, purchases, "user_id",
        within = "30 minutes", delay = "0 seconds")
        .select(col("click_id"), col("purchase_id"),
          col("l.user_id").as("user_id"),
          unix_micros(col("l.ts")).as("click_us"),
          unix_micros(col("r.ts")).as("purchase_us"))
      withSqlConf(s, "spark.sql.shuffle.partitions" -> "8") {
        CdcStream.runToMemory(joined, OutputMode.Append())
      }.orderBy("click_id", "purchase_id")
    })
  )

  /** Set session SQL confs for the duration of `f` (restore-on-exit) —
    * for stream runs whose correct configuration differs from the
    * session default (stateful-shuffle width is captured at query
    * start and cannot be hinted per-plan). Drivers here run entries
    * sequentially; this is not safe under concurrent entry execution
    * on one session. */
  private def withSqlConf[T](s: org.apache.spark.sql.SparkSession,
                             kv: (String, String)*)(f: => T): T = {
    val old = kv.map { case (k, _) => k -> s.conf.getOption(k) }
    kv.foreach { case (k, v) => s.conf.set(k, v) }
    try f
    finally old.foreach { case (k, ov) =>
      ov.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  /** Entries whose timed path starts the streaming engine each run
    * (runToMemory / a fresh query). The landed-store entries
    * (stream_jdbc_land, stream_land_monthly, storage_stats, stream_scd2,
    * and since r10 stream_sessionize / stream_dedup_exact — their
    * row-scaled output moved from the memory sink to parquet landings)
    * stream once per JVM and then time a batch scan, so they stay
    * operator-bucketed. */
  override val streams: Set[String] = Set(
    "stream_event_counts", "stream_json_parse", "stream_progress",
    "stream_counts_watermarked", "stream_sliding_counts",
    "stream_latest_expiring", "stream_latest_rel", "stream_latest_state",
    "stream_funnel", "stream_enrich_counts", "stream_interval_join",
    "stream_interval_left")

  val oracles: Map[String, String] = Map(
    // the stream folds to the batch funnel's histogram — same oracle
    "stream_funnel" -> CdcQueries.oracles("cdc_funnel"),
    // final Complete table == the batch left-join rollup
    "stream_enrich_counts" ->
      """SELECT coalesce(c_mktsegment, 'unknown') AS segment, event_type,
                count(*) AS cnt, round(sum(value), 4) AS sum_value
         FROM events LEFT JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // full-span delay ⇒ the emitted pairs == the batch interval join
    "stream_interval_join" ->
      """SELECT l.event_id AS click_id, r.event_id AS purchase_id,
                l.user_id AS user_id,
                epoch_us(l.ts) AS click_us, epoch_us(r.ts) AS purchase_us
         FROM events l JOIN events r ON l.user_id = r.user_id
          AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE
         WHERE l.event_type = 'click' AND r.event_type = 'purchase'
         ORDER BY 1, 2""",
    // batch left interval join cut at the final-watermark horizon:
    // matched pairs always; NULL rows iff the watermark (min over
    // both sides of max event time, ms-truncated — Spark tracks
    // event-time stats in milliseconds) passed click.ts + 30min
    "stream_interval_left" ->
      """WITH c AS (SELECT event_id AS click_id, ts, user_id
               FROM events WHERE event_type = 'click'),
           p AS (SELECT event_id AS purchase_id, ts, user_id
               FROM events WHERE event_type = 'purchase'),
           wm AS (SELECT least((SELECT max(epoch_us(ts)) // 1000 FROM c),
                               (SELECT max(epoch_us(ts)) // 1000 FROM p))
                    AS w_ms),
           j AS (SELECT c.click_id, p.purchase_id, c.user_id,
                        epoch_us(c.ts) AS click_us,
                        epoch_us(p.ts) AS purchase_us
                 FROM c LEFT JOIN p ON c.user_id = p.user_id
                  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
         SELECT click_id, purchase_id, user_id, click_us, purchase_us
         FROM j, wm
         WHERE purchase_id IS NOT NULL
            OR click_us + 1800000000 < wm.w_ms * 1000
         ORDER BY 1, 2""",
    // the streamed history == the batch SCD2 build's closed rows
    "stream_scd2" ->
      """WITH v AS (SELECT user_id, event_type, value, epoch_us(ts) AS f,
                           row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS version,
                           lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS t
                    FROM events)
         SELECT user_id, version, event_type, round(value, 4) AS value,
                f AS valid_from_us, t AS valid_to_us
         FROM v WHERE t IS NOT NULL ORDER BY user_id, version""",
    "mm_feature_stub" ->
      """WITH t AS (SELECT doc_id, octet_length(encode(text)) AS n,
                           hex(encode(text)) AS h
                    FROM documents WHERE text IS NOT NULL),
         f AS (SELECT doc_id, n,
                      len(list_filter(range(1, n + 1),
                                      i -> substring(h, i * 2, 1) = '0')) AS z
               FROM t)
         SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
                CAST(64 + n % 1024 AS BIGINT) AS width,
                CAST(64 + (n // 7) % 1024 AS BIGINT) AS height,
                CAST(z AS BIGINT) AS f0_cnt,
                true AS hist_ok
         FROM f ORDER BY doc_id""",
    "mm_binary_meta" ->
      """SELECT doc_id,
                octet_length(encode(text)) AS n_bytes,
                lower(hex(encode(substring(text, 1, 8)))) AS header_hex,
                md5(text) AS payload_md5
         FROM documents ORDER BY doc_id""",
    "mm_frame_sample" ->
      """SELECT doc_id,
                CAST(ceil(ceil(octet_length(encode(text)) / 4096.0) / 2.0) AS BIGINT) AS n_frames,
                CAST(least(octet_length(encode(text)), 4096) AS BIGINT) AS f0_bytes
         FROM documents
         WHERE octet_length(encode(text)) > 0
         ORDER BY doc_id""",
    "stream_json_parse" ->
      """SELECT CASE WHEN event_type = 'signup' THEN 'INSERT'
                     WHEN event_type IN ('click','view','purchase') THEN 'UPDATE'
                     ELSE 'DELETE' END AS op,
                count(*) AS cnt, count(DISTINCT user_id) AS n_entities
         FROM events GROUP BY 1 ORDER BY 1""",
    "stream_event_counts" ->
      """SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type,
                count(*) AS cnt, round(sum(value), 4) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_progress" ->
      """SELECT CAST(count(*) AS BIGINT) AS rows_total,
                count(*) > 0 AS saw_batches
         FROM events""",
    "stream_latest_state" ->
      """SELECT user_id, event_type AS last_type, epoch_us(ts) AS last_ts_us,
                round(value, 4) AS last_value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    "stream_dedup_exact" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
                round(value, 4) AS value
         FROM events ORDER BY event_id""",
    "stream_bloom_dedup" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
         WHERE doc_id % 2 = 0 OR doc_id % 3 = 0 ORDER BY doc_id""",
    "stream_sessionize" ->
      """WITH g AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
                           lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
                    FROM events),
           s AS (SELECT user_id, ts_us, event_id, value,
                        CASE WHEN prev_us IS NULL OR ts_us - prev_us > 30*60*1000000
                             THEN 1 ELSE 0 END AS new_sess
                 FROM g),
           r AS (SELECT user_id, ts_us, value,
                        sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                            ROWS UNBOUNDED PRECEDING) AS sess_id
                 FROM s),
           a AS (SELECT user_id,
                        min(ts_us) AS sess_start_us,
                        max(ts_us) + 30*60*1000000 AS sess_end_us,
                        count(*) AS n_events,
                        round(sum(value), 4) AS sum_value
                 FROM r GROUP BY user_id, sess_id)
         SELECT user_id, sess_start_us, sess_end_us, n_events, sum_value
         FROM a
         WHERE sess_end_us <= (SELECT max(epoch_us(ts)) - 86400000000 FROM events)
         ORDER BY user_id, sess_start_us""",
    "stream_counts_watermarked" ->
      """WITH m AS (SELECT max(ts) - INTERVAL 1 DAY AS wm FROM events)
         SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type,
                count(*) AS cnt, round(sum(value), 4) AS sum_value
         FROM events, m
         WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= wm
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_sliding_counts" ->
      """WITH m AS (SELECT max(ts) - INTERVAL 1 DAY AS wm FROM events),
         w AS (SELECT event_type, value,
                      to_timestamp((CAST(floor(epoch(ts) / 10800) AS BIGINT)
                                    - k.k) * 10800) AS ws
               FROM events, unnest([0, 1]) AS k(k))
         SELECT epoch_us(ws) AS win_us, event_type,
                count(*) AS cnt, round(sum(value), 4) AS sum_value
         FROM w, m
         WHERE ws + INTERVAL 6 HOUR <= wm
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_uniq_state_check" ->
      """SELECT event_type, count(*) AS total,
                count(DISTINCT user_id) AS uniq_exact, true AS est_ok
         FROM events GROUP BY event_type ORDER BY event_type""",
    "stream_topk_state_check" ->
      """SELECT event_type,
                LEAST(10, count(DISTINCT user_id)) AS n_returned,
                true AS counts_exact_ok, true AS topk_valid
         FROM events WHERE user_id IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",
    "stream_jdbc_land" ->
      """SELECT event_type, count(*) AS cnt,
                count(DISTINCT user_id) AS n_users,
                round(sum(value), 4) AS value_sum,
                CAST(floor(min(epoch_us(ts)) / 86400000000) AS BIGINT) AS min_day,
                CAST(floor(max(epoch_us(ts)) / 86400000000) AS BIGINT) AS max_day
         FROM events GROUP BY 1 ORDER BY 1""",
    "stream_latest_rel" ->
      """SELECT CAST(o_custkey AS VARCHAR) AS source_id,
                CAST(o_orderkey AS VARCHAR) AS last_order,
                epoch_us(o_orderdate) AS last_ts_us,
                CAST(o_orderkey AS VARCHAR) AS last_target,
                'ORDERED' AS rel_type
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
         WHERE rn = 1 ORDER BY source_id""",
    "stream_land_monthly" ->
      """SELECT CAST(strftime(ts, '%Y%m') AS BIGINT) AS month,
                count(*) AS cnt, count(DISTINCT user_id) AS n_users,
                round(sum(value), 4) AS value_sum
         FROM events GROUP BY 1 ORDER BY 1""",
    "storage_stats" ->
      """SELECT CAST(strftime(ts, '%Y%m') AS BIGINT) AS month,
                count(*) AS n_rows, true AS layout_ok
         FROM events GROUP BY 1 ORDER BY 1""",
    "mm_resize" ->
      """WITH t AS (SELECT doc_id, octet_length(encode(text)) AS n,
                           lower(substring(hex(encode(text)), 1, 2)) AS h1
                    FROM documents)
         SELECT doc_id,
                CAST(CASE WHEN n <= 1024 THEN n
                          ELSE (n + ((n + 1023) // 1024) - 1)
                               // ((n + 1023) // 1024) END AS BIGINT) AS n_out,
                h1 AS head_hex
         FROM t ORDER BY doc_id""",
    "stream_latest_expiring" ->
      """SELECT user_id, event_type AS last_type, epoch_us(ts) AS last_ts_us,
                round(value, 4) AS last_value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY user_id"""
  )
}
