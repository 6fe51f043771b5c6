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

  // unique memory-sink names for stream_progress across warmup/timed
  // runs in one JVM (a reused name would re-register the same table)
  private val progressId = new java.util.concurrent.atomic.AtomicLong(0)

  val queries: Map[String, Q] = Map(
    // G1: binary metadata extraction (byte length, header, digest).
    "mm_binary_meta" -> ((s, dir) =>
      Multimodal.binaryMeta(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin")),
        "doc_id", "bin")
        .orderBy("doc_id")),

    // G2: batched feature-extraction pipeline (stubbed decode; typed
    // Dataset in/out). Deterministic features -> rows-only entry plus
    // MultimodalSpec invariants.
    "mm_feature_stub" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
        .as[Multimodal.Media]
      Multimodal.extractFeatures(media)
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
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
    })
  )

  val oracles: Map[String, String] = Map(
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
         WHERE rn = 1 ORDER BY user_id"""
  )
}
