package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming under the differential gate: each query drives a
  * real `readStream` -> stateful transform -> `writeStream` run with
  * `Trigger.AvailableNow()` (process-everything-then-stop), lands the sink
  * in a memory table, and returns it as a DataFrame whose contents a batch
  * DuckDB oracle must reproduce. This gates the streaming *semantics* —
  * watermarked windowed aggregation, `flatMapGroupsWithState`
  * sessionization, keyed dedup — not just the batch twins (an11/an12/dd01).
  *
  * Scale: the same pipelines run unbounded by swapping the file source for
  * kafka and the memory sink for a real one; state is keyed (window /
  * user_id / event_id), so it shards across executors, and the watermark
  * bounds state size. The AvailableNow harness is also exactly the
  * production backfill path (replay a day of files through the streaming
  * topology with identical semantics).
  */
object StreamQueries {

  /** Streaming twin of [[graft.Tables.events]]: same raw-nanos handling and
    * micro precision, but as an unbounded file-source stream. `ts` lands as
    * TIMESTAMP (watermarks reject NTZ); the session is pinned UTC, so wall
    * values equal the batch NTZ reads and outputs cast back to NTZ. The
    * glob (not the bare file path) keeps the source's inferred basePath a
    * directory. */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.readStream
      .schema(s.read.parquet(s"$d/events.parquet").schema)
      .parquet(s"$d/events*.parquet")
    val tsTyped = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
    tsTyped.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Run `df` to completion into a fresh memory table, return its contents. */
  private def runToTable(s: SparkSession, df: DataFrame, name: String, mode: String): DataFrame = {
    // repeated runs in one session (bench runs each query twice): drop the
    // previous sink table before rebinding the name
    s.catalog.dropTempView(name)
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    s.table(name)
  }

  // ------------------------------------------ watermarked windowed counts

  /** Hourly tumbling-window aggregation through the streaming engine
    * (EventStreams.hourlyCounts). Values go through DECIMAL so the
    * stateful partial sums are order-independent — the same exactness rule
    * the batch queries follow. */
  private def streamHourly(s: SparkSession, d: String): DataFrame = {
    val in = eventsStream(s, d).withColumn("value", col("value").cast("decimal(12,2)"))
    runToTable(s, EventStreams.hourlyCounts(in), "st01_sink", "complete")
      .select(
        col("hour_start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"),
        col("n"),
        round(col("sum_value"), 2).cast("double").as("sum_value"))
      .orderBy("hour_start", "event_type")
  }

  private val streamHourlyOracle =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type, COUNT(*) AS n,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  // --------------------------------------- stateful sessionization stream

  /** `flatMapGroupsWithState` sessionization (EventStreams.sessionize,
    * 30-min gap). With AvailableNow the whole file lands in one batch and
    * the query stops before any timeout fires, so exactly the *closed*
    * sessions are emitted — every session except each user's open last
    * one. The oracle replays an12's gaps-and-islands and drops each user's
    * final session. Session bounds are ms-precision (the state folds epoch
    * millis), so the oracle truncates its timestamps to ms. */
  private def streamSessions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = eventsStream(s, d)
      .withColumn("ts", col("ts").cast("timestamp"))
      .as[EventStreams.Event]
    val sessions = EventStreams.sessionize(ev, withTimeout = false).toDF()
    runToTable(s, sessions, "st02_sink", "append")
      .select(
        col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  private val streamSessionsOracle =
    """WITH x AS (
        SELECT user_id, ts, event_id, epoch_ms(ts) AS ms,
               lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
        FROM events),
      y AS (
        SELECT user_id, ts,
               CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS nw,
               event_id
        FROM x),
      z AS (
        SELECT user_id, ts,
               SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM y),
      sess AS (
        SELECT user_id, session_id,
               make_timestamp(epoch_ms(MIN(ts)) * 1000) AS session_start,
               make_timestamp(epoch_ms(MAX(ts)) * 1000) AS session_end,
               COUNT(*) AS n_events
        FROM z GROUP BY 1, 2)
      SELECT user_id, session_start, session_end, n_events
      FROM sess
      QUALIFY session_id < MAX(session_id) OVER (PARTITION BY user_id)
      ORDER BY user_id, session_start"""

  // ------------------------------------------------- streaming exact dedup

  /** Keyed streaming dedup (EventStreams.dedupe) over a deliberately
    * duplicated input: two file-source streams of the same data unioned,
    * so every event arrives twice in the batch. Downstream counts must
    * equal the batch DISTINCT — at-least-once delivery becomes
    * effectively-once. */
  private def streamDedup(s: SparkSession, d: String): DataFrame = {
    val doubled = eventsStream(s, d).unionByName(eventsStream(s, d))
    runToTable(s, EventStreams.dedupe(doubled), "st03_sink", "append")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  private val streamDedupOracle =
    """SELECT event_type, COUNT(DISTINCT event_id) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------- stream-stream interval join

  /** Watermarked stream-stream inner join: each purchase joined to the
    * same user's clicks in the preceding 10 minutes. Both sides carry
    * watermarks and the join condition bounds event-time distance, so the
    * engine can size its join state (clicks older than the watermark minus
    * the interval are evicted) — the canonical unbounded-join recipe. At
    * 100 TB/day the state held is only the interval window per user, not
    * the stream history. */
  private def streamJoin(s: SparkSession, d: String): DataFrame = {
    val ev = eventsStream(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = purchases.join(clicks,
      expr("c_user = p_user AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 10 MINUTES"))
    runToTable(s, joined.select("p_id", "c_id"), "st04_sink", "append")
      .orderBy("p_id", "c_id")
  }

  private val streamJoinOracle =
    """SELECT p.event_id AS p_id, c.event_id AS c_id
      FROM events p JOIN events c
        ON p.event_type = 'purchase' AND c.event_type = 'click'
       AND c.user_id = p.user_id
       AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
      ORDER BY 1, 2"""

  // --------------------------------------- streaming ingest into IceLite

  /** The streaming lakehouse path: `readStream` -> `foreachBatch` ->
    * idempotent IceLite append (`appendOnce` keyed on the batch id), then
    * query the committed table through the engine. A replayed batch is
    * re-appended with the same token and absorbed as a no-op — the
    * exactly-once sink contract over at-least-once delivery. The query
    * replays batch 0 explicitly and requires the row count unchanged
    * before returning the per-type table stats. */
  /** Reset a scratch warehouse and create an empty IceLite sink table in
    * it — the shared preamble of every streaming-to-IceLite query. */
  private def freshSinkTable(
      s: SparkSession,
      dirName: String,
      table: String,
      schema: org.apache.spark.sql.types.StructType): (graft.icelite.FsCatalog, graft.icelite.IceTable) = {
    import org.apache.hadoop.fs.Path
    val whPath = new Path(s"/root/repo/target/scratch/$dirName")
    val fs     = whPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(whPath)) fs.delete(whPath, true)
    fs.mkdirs(whPath)
    val cat = new graft.icelite.FsCatalog(s, whPath.toString)
    val t = cat.createOrReplaceTable("graft", table,
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    (cat, t)
  }

  private def streamIngest(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.Engine
    // events schema with ts as NTZ, like the batch reads
    val (cat, t) = freshSinkTable(s, "st05_wh", "events_st",
      graft.Tables.events(s, d).schema)
    eventsStream(s, d)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        t.appendOnce(batch, s"st05-$batchId"); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    // replay batch 0: the token makes the duplicate delivery a no-op
    val before = t.scan().count()
    t.appendOnce(graft.Tables.events(s, d), "st05-0")
    require(t.scan().count() == before, "replayed batch was double-committed")
    new Engine(s, cat).table("graft.events_st")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("ts").as("min_ts"), max("ts").as("max_ts"))
      .orderBy("event_type")
  }

  private val streamIngestOracle =
    """SELECT event_type, COUNT(*) AS n, MIN(ts) AS min_ts, MAX(ts) AS max_ts
      FROM events GROUP BY event_type ORDER BY event_type"""

  // --------------------------- streaming aggregation -> serving upsert

  /** The streaming-to-serving pattern: an update-mode streaming
    * aggregation whose changed keys are merged into an IceLite table by
    * key each micro-batch (`foreachBatch` + copy-on-write `upsert`). A
    * batch replay merges identical rows for identical keys, so the sink
    * converges regardless of redelivery — the other standard exactly-once
    * recipe next to st05's append tokens. Update mode keeps the *stream*
    * side proportional to the update rate (only changed keys flow per
    * batch); the copy-on-write upsert still rewrites the sink table, so
    * at scale the sink is partitioned/stats-pruned (deleteRange-style
    * file-granular rewrites) or merge-on-read — the standard lakehouse
    * upsert trade-off. */
  private def streamUpsert(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.Engine
    import org.apache.spark.sql.types._
    val (cat, t) = freshSinkTable(s, "st06_wh", "purchase_totals",
      StructType(Seq(
        StructField("user_id", LongType),
        StructField("n_purchases", LongType),
        StructField("total", DoubleType))))
    eventsStream(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_purchases"),
        round(sum(col("value").cast("decimal(12,2)")), 2).cast("double").as("total"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        t.upsert(batch, Seq("user_id")); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    new Engine(s, cat).table("graft.purchase_totals").orderBy("user_id")
  }

  private val streamUpsertOracle =
    """SELECT user_id, COUNT(*) AS n_purchases,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id ORDER BY user_id"""

  // --------------------- streaming CDC into standard Iceberg v2 (MoR)

  /** Streaming CDC into a STANDARD Iceberg v2 table with merge-on-read
    * equality deletes — the commit shape Flink's and Spark's Iceberg CDC
    * writers use: each micro-batch commits ONE snapshot holding an
    * equality-delete file on the key column (retiring the keys' prior
    * rows; deletes apply strictly-older, so the same commit's data
    * survives its own delete) plus a data file with the new per-key
    * aggregates. No data file is ever rewritten — commits are O(batch),
    * and the spec's scan-planning rules make any Iceberg reader merge the
    * chain at read time. The source is staged as several files with
    * `maxFilesPerTrigger=1`, so the gate exercises a multi-commit delete
    * chain across sequence numbers, not one upsert. Final state must equal
    * the batch aggregate — convergence of the whole CDC pipeline. */
  private def streamIcebergCdc(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.IcebergFormat
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.types._
    val root = "/root/repo/target/scratch/st07"
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(rootPath)) fs.delete(rootPath, true)
    fs.mkdirs(rootPath)
    // several source files -> several micro-batches under AvailableNow
    val src = s"$root/src"
    graft.Tables.events(s, d).repartition(3).write.parquet(src)
    val aggSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("n_purchases", LongType),
      StructField("total", DoubleType)))
    val loc = s"$root/purchase_totals_ice"
    val w   = new IcebergFormat.Writer(s, loc, aggSchema)
    s.readStream
      .schema(s.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*.parquet")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_purchases"),
        round(sum(col("value").cast("decimal(12,2)")), 2).cast("double").as("total"))
      .writeStream
      .outputMode("update") // only keys changed by the batch flow
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // a foreachBatch frame recomputes the stateful aggregate on every
        // action — persist once, then the stage/count/write actions are
        // cache reads, not state replays
        batch.persist()
        try {
          if (batch.count() > 0) {
            val del = IcebergFormat.writeSingleFile(s, root, loc, s"del-$batchId",
              batch.select("user_id"), content = 2, equalityIds = Seq(1))
            val data = IcebergFormat.writeSingleFile(s, root, loc, s"data-$batchId",
              batch.select("user_id", "n_purchases", "total"))
            w.commit(Seq(del, data)) // one snapshot: retire old rows, add new
          }
        } finally { batch.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    IcebergFormat.scan(s, w.currentMetadataPath).orderBy("user_id")
  }

  private val streamIcebergCdcOracle = streamUpsertOracle // same converged state

  /** Continuous ingest WITH inline metadata maintenance — the production
    * loop a long-lived streaming table needs: every micro-batch appends a
    * data file + snapshot to a standard Iceberg v2 table, and whenever
    * the manifest list exceeds a threshold the SAME foreachBatch runs
    * rewrite_manifests + expire_snapshots (ic34 + ic35 composed under
    * st05's ingest shape). The gate asserts what matters at 100 TB with
    * per-minute commits: metadata stays BOUNDED — O(1) manifests and
    * O(keepLast) snapshots no matter how many batches ran — while the
    * table's contents stay byte-identical to the batch oracle. */
  private def streamCompaction(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.IcebergFormat
    import org.apache.hadoop.fs.Path
    val root     = "/root/repo/target/scratch/st08"
    val rootPath = new Path(root)
    val fs       = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(rootPath)) fs.delete(rootPath, true)
    fs.mkdirs(rootPath)
    val src = s"$root/src"
    graft.Tables.events(s, d).repartition(4).write.parquet(src)
    val loc = s"$root/purchases_ice"
    val out = graft.Tables.events(s, d).selectExpr("event_id", "user_id", "value").limit(0)
    val w   = new IcebergFormat.Writer(s, loc, out.schema)
    s.readStream
      .schema(s.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*.parquet")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (batch.count() > 0) {
            w.commit(Seq(IcebergFormat.writeSingleFile(
              s, root, loc, s"data-$batchId", batch.orderBy("event_id"))))
            // inline maintenance: compact + expire once metadata sprawls
            val dataManifests = IcebergFormat
              .manifestListPaths(s, w.currentMetadataPath).count(_._2 == 0)
            if (dataManifests > 2) {
              w.rewriteManifests()
              w.expireSnapshots(keepLast = 2)
            }
          }
        } finally { batch.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    // bounded metadata: at most 2 data manifests (1 merged + at most 1
    // since the last rewrite) and exactly keepLast manifest lists
    val listed = IcebergFormat.manifestListPaths(s, w.currentMetadataPath)
    require(listed.count(_._2 == 0) <= 2,
      s"manifest list not bounded under streaming ingest: $listed")
    val mdDir = new Path(loc, "metadata")
    require(fs.listStatus(mdDir).count(_.getPath.getName.startsWith("snap-")) <= 3,
      "expired manifest lists not reclaimed")
    IcebergFormat.scan(s, w.currentMetadataPath).orderBy("event_id")
  }

  private val streamCompactionOracle =
    """SELECT event_id, user_id, value FROM events
       WHERE event_type = 'purchase' ORDER BY event_id"""

  // ------------------------------------ streaming corpus curation gate

  /** In-flight curation: tx02's quality score computed ON THE STREAM
    * (stateless map — the Kafka → quality-gate → sink shape of a
    * production ingest pipe) with a 0.6 keep threshold, then per-language
    * kept/total accounting. The formula is `Text.qualityScore` itself, so
    * batch and streaming curation cannot diverge. A stateless filter plus
    * one complete-mode aggregation is deterministic under AvailableNow
    * regardless of how the source splits into batches; the quality sum
    * aggregates in exact DECIMAL so partial-merge order can't move it. */
  private def streamCuration(s: SparkSession, d: String): DataFrame = {
    import graft.ops.Text
    val raw = s.readStream
      .schema(s.read.parquet(s"$d/documents.parquet").schema)
      .parquet(s"$d/documents*.parquet")
    val ws = split(col("text"), " ")
    val scored = raw.select(
      col("lang"),
      size(ws).cast("long").as("n_words"),
      size(filter(ws, w => array_contains(typedLit(Text.stopwords), w)))
        .cast("long").as("stop_cnt"))
      .withColumn("q", Text.qualityScore(col("n_words"), col("stop_cnt")))
    val agg = scored.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("q") >= 0.6, 1L).otherwise(0L)).as("n_kept"),
      round(sum(col("q").cast("decimal(8,4)")), 4).cast("double").as("sum_q"))
    runToTable(s, agg, "st09_sink", "complete").orderBy("lang")
  }

  private val streamCurationOracle: String = {
    val stops = graft.ops.Text.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH x AS (
        SELECT lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stops))) AS BIGINT) AS stop_cnt
        FROM documents),
      q AS (
        SELECT lang,
               ROUND(LEAST(CAST(n_words AS DOUBLE) / 50.0, 1.0) * 0.5
                     + (CAST(stop_cnt AS DOUBLE) / n_words) * 0.5, 4) AS q
        FROM x)
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN q >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(ROUND(SUM(CAST(q AS DECIMAL(8,4))), 4) AS DOUBLE) AS sum_q
      FROM q GROUP BY lang ORDER BY lang"""
  }

  // --------------------------------------- built-in session_window stream

  /** Native `session_window` sessionization — the engine-managed twin of
    * st02's hand-rolled `flatMapGroupsWithState` state machine. Complete
    * output mode emits EVERY session (closed and open), so the oracle is
    * an12's full gaps-and-islands with no last-session drop — the
    * differential between st02 and st10 is exactly the open-session
    * boundary semantics. Session merging is the state store's job here:
    * at scale this is the path to prefer (no user state code, RocksDB
    *-backed merge), keyed by user_id so it shards. */
  private def sessionWindow(s: SparkSession, d: String): DataFrame = {
    val sessions = eventsStream(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    runToTable(s, sessions, "st10_sink", "complete")
      .select(
        col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** `session_window` closes at last-event + gap; the oracle only needs
    * the start bound + count, replayed via gaps-and-islands. */
  private val sessionWindowOracle =
    """WITH x AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      y AS (
        SELECT user_id, ts, event_id,
               -- session_window end = last event + gap, EXCLUSIVE: an event
               -- at exactly gap distance starts a new session, hence >=
               CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS nw
        FROM x),
      z AS (
        SELECT user_id, ts,
               SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM y)
      SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
      FROM z GROUP BY user_id, sid ORDER BY user_id, session_start"""

  // ------------------------------------------ stream-static enrichment

  /** Stream-static dimension enrichment: the unbounded event stream joins
    * a STATIC customer dimension (no watermark, no state — the dim is
    * re-planned per micro-batch and broadcast, Spark's stream-static join
    * path), then aggregates per market segment. This is the standard
    * "enrich events with reference data" topology; at scale the static
    * side stays broadcast-sized or becomes a bucketed table (an58's
    * layout) and the stream side never shuffles before the keyed agg. */
  private def streamEnrich(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = eventsStream(s, d)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).as("sum_value"))
    runToTable(s, joined, "st11_sink", "complete")
      .select(col("c_mktsegment"), col("event_type"), col("n"),
        round(col("sum_value"), 2).cast("double").as("sum_value"))
      .orderBy("c_mktsegment", "event_type")
  }

  private val streamEnrichOracle =
    """SELECT c_mktsegment, event_type, COUNT(*) AS n,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1, 2 ORDER BY 1, 2"""

  /** st14: `spark.readStream.format("icelite")` — the TABLE ITSELF as the
    * streaming source (the V2 MicroBatchStream tailing the snapshot log,
    * Iceberg's streaming read). Three appended snapshots stream through a
    * grouped aggregation; then a FOURTH snapshot lands and the query
    * RESUMES from its checkpoint — the resumed batch must open only the
    * delta's files (offsets are snapshot ids; planning is the manifest
    * diff), proven by the files-opened counter, while the sink converges
    * to the full-corpus aggregate the oracle recomputes. */
  private def streamTableSource(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.FsCatalog
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(s.sparkContext.hadoopConfiguration)
    val wh = "/root/repo/target/scratch/st14_wh"
    val ckpt = "/root/repo/target/scratch/st14_ckpt"
    Seq(wh, ckpt).foreach { p0 =>
      val p = new org.apache.hadoop.fs.Path(p0)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val ev = Tables.events(s, d).select("event_id", "user_id", "event_type", "value")
    val cat = new FsCatalog(s, wh)
    val t = cat.createOrReplaceTable("graft", "events_src",
      ev.filter(col("event_id") % 4 === 0).coalesce(1))
    t.append(ev.filter(col("event_id") % 4 === 1).coalesce(1))
    t.append(ev.filter(col("event_id") % 4 === 2).coalesce(1))
    def run(): Unit = {
      s.catalog.dropTempView("st14_sink")
      s.readStream.format("icelite").option("location", t.location.toString).load()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(12,2)")).as("sv"))
        .writeStream.format("memory").queryName("st14_sink").outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    graft.sources.IceLiteSource.filesOpened.reset()
    run()
    val firstOpened = graft.sources.IceLiteSource.filesOpened.sum()
    t.append(ev.filter(col("event_id") % 4 === 3).coalesce(1)) // snapshot 4
    graft.sources.IceLiteSource.filesOpened.reset()
    run() // resume: same checkpoint, only the delta may be read
    val resumedOpened = graft.sources.IceLiteSource.filesOpened.sum()
    require(firstOpened >= 3,
      s"first pass read $firstOpened files, expected the 3 committed snapshots")
    require(resumedOpened < firstOpened,
      s"resumed pass re-read history: opened $resumedOpened vs first $firstOpened")
    s.table("st14_sink")
      .select(col("event_type"), col("n"),
        round(col("sv"), 2).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  private val streamTableSourceOracle =
    """SELECT event_type, COUNT(*) AS n,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1 ORDER BY 1"""

  /** st15: `writeStream.format("icelite")` — the V2-NATIVE exactly-once
    * streaming sink (st05 hand-rolls the same guarantee with foreachBatch
    * + appendOnce; this is the connector doing it: every epoch commits
    * one CAS snapshot carrying `v2-<queryId>-epoch-N` as its token —
    * query-scoped, because a SECOND query into the same table restarts
    * epochs at 0 and an epoch-only token would silently swallow its first
    * commits as replays; queryId is the stable checkpoint-persisted id,
    * so a RESTART of the same query still dedupes. The gate streams
    * events into the table, REPLAYS epoch 0's commit by hand with the
    * real token, asserts the table ignored it, asserts a DIFFERENT
    * query's epoch-0 token is NOT absorbed, and returns the per-type
    * aggregate the oracle recomputes. */
  private def streamTableSink(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.FsCatalog
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(s.sparkContext.hadoopConfiguration)
    val wh   = "/root/repo/target/scratch/st15_wh"
    val ckpt = "/root/repo/target/scratch/st15_ckpt"
    Seq(wh, ckpt).foreach { p0 =>
      val p = new org.apache.hadoop.fs.Path(p0)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val ev  = Tables.events(s, d).select("event_id", "user_id", "event_type", "value")
    val cat = new FsCatalog(s, wh)
    val t   = cat.createOrReplaceTable("graft", "events_sink", ev.limit(0))
    val q = eventsStream(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("double").as("value"))
      .writeStream.format("icelite")
      .option("location", t.location.toString)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val token0 = s"v2-${q.id}-epoch-0"
    // exactly-once: replaying THIS query's epoch 0 must be a no-op
    val before = t.scan().count()
    t.appendOnce(ev.limit(1), token0)
    require(t.scan().count() == before, "replayed epoch was double-committed")
    require(t.snapshots().exists(_.commit_token.contains(token0)),
      "epoch token missing from the snapshot log")
    // query-scoping: a DIFFERENT query's epoch 0 is a genuinely new commit
    // (the silent-data-loss mode an unscoped token would reintroduce).
    // Probe with a sentinel row, assert it landed, then delete it so the
    // aggregate below still matches the oracle.
    val sentinel = ev.limit(1).select(
      lit(-1L).as("event_id"), col("user_id"), col("event_type"),
      col("value").cast("double").as("value"))
    t.appendOnce(sentinel, s"v2-${java.util.UUID.randomUUID()}-epoch-0")
    require(t.scan().count() == before + 1,
      "a second query's epoch-0 commit was wrongly absorbed as a replay")
    t.deleteWhere(col("event_id") === -1L)
    require(t.scan().count() == before, "sentinel cleanup failed")
    s.read.format("icelite").option("location", t.location.toString).load()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).as("sv"))
      .select(col("event_type"), col("n"),
        round(col("sv"), 2).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** st17: `readStream.format("icelite").option("iceberg", "true")` — the
    * st14 snapshot-tailing source over REAL Iceberg v2 metadata: offsets
    * are snapshot-log positions, each micro-batch reads exactly the
    * manifest file-diff of its window, and a RESUMED run (same
    * checkpoint, one new snapshot committed in between) must open ONLY
    * the delta file — counter-gated, the O(new commits) planning contract
    * a CDC consumer needs on a 100 TB table. */
  private def streamIcebergSource(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.IcebergFormat
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(s.sparkContext.hadoopConfiguration)
    val root = "/root/repo/target/scratch/st17"
    val ckpt = "/root/repo/target/scratch/st17_ckpt"
    Seq(root, ckpt).foreach { p0 =>
      val p = new org.apache.hadoop.fs.Path(p0)
      if (fs.exists(p)) fs.delete(p, true)
    }
    fs.mkdirs(new org.apache.hadoop.fs.Path(root))
    val ev  = Tables.events(s, d).select("event_id", "user_id", "event_type", "value")
    val loc = s"$root/events_ice"
    val w   = new IcebergFormat.Writer(s, loc, ev.schema)
    def snap(n: Int): Unit = w.commit(Seq(IcebergFormat.writeSingleFile(
      s, root, loc, s"b$n", ev.filter(col("event_id") % 4 === n))))
    snap(0); snap(1); snap(2) // three committed snapshots
    def run(): Unit = {
      s.catalog.dropTempView("st17_sink")
      s.readStream.format("icelite").option("iceberg", "true")
        .option("location", loc).load()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(12,2)")).as("sv"))
        .writeStream.format("memory").queryName("st17_sink").outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    graft.sources.IceLiteSource.filesOpened.reset()
    run()
    val firstOpened = graft.sources.IceLiteSource.filesOpened.sum()
    snap(3) // snapshot 4, committed between runs
    graft.sources.IceLiteSource.filesOpened.reset()
    run() // resume: same checkpoint — only the delta file may be read
    val resumedOpened = graft.sources.IceLiteSource.filesOpened.sum()
    require(firstOpened >= 3,
      s"first pass read $firstOpened files, expected the 3 committed snapshots")
    require(resumedOpened == 1,
      s"resumed pass must open exactly the delta file, opened $resumedOpened")
    s.table("st17_sink")
      .select(col("event_type"), col("n"),
        round(col("sv"), 2).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  private val streamTableSinkOracle =
    """SELECT event_type, COUNT(*) AS n,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1 ORDER BY 1"""

  /** st16: TABLE-TO-TABLE streaming pipeline through the connector at
    * BOTH ends — readStream tails the source table's snapshot log, a
    * stateless quality-gate transform runs per micro-batch, and
    * writeStream lands exactly-once epoch snapshots in the sink table
    * (st14's source + st15's sink composed: the lakehouse "bronze →
    * silver" hop with no foreachBatch glue anywhere). After the first
    * drain, a second source append + resume must flow ONLY the delta
    * into a new sink snapshot. */
  private def streamTableToTable(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.FsCatalog
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(s.sparkContext.hadoopConfiguration)
    val wh   = "/root/repo/target/scratch/st16_wh"
    val ckpt = "/root/repo/target/scratch/st16_ckpt"
    Seq(wh, ckpt).foreach { p0 =>
      val p = new org.apache.hadoop.fs.Path(p0)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val ev  = Tables.events(s, d).select("event_id", "user_id", "event_type", "value")
    val cat = new FsCatalog(s, wh)
    val src = cat.createOrReplaceTable("graft", "ev_bronze",
      ev.filter(col("event_id") % 2 === 0).coalesce(1))
    val dst = cat.createOrReplaceTable("graft", "ev_silver", ev.limit(0))
    def drain(): Unit =
      s.readStream.format("icelite").option("location", src.location.toString).load()
        .filter(col("value") >= 0) // the quality gate: non-negative amounts pass
        .writeStream.format("icelite")
        .option("location", dst.location.toString)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    drain()
    val afterFirst = dst.scan().count()
    src.append(ev.filter(col("event_id") % 2 === 1).coalesce(1))
    drain() // resume: only the delta snapshot flows
    require(dst.scan().count() > afterFirst, "resumed drain moved no delta rows")
    s.read.format("icelite").option("location", dst.location.toString).load()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).as("sv"))
      .select(col("event_type"), col("n"),
        round(col("sv"), 2).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  private val streamTableToTableOracle =
    """SELECT event_type, COUNT(*) AS n,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      FROM events WHERE value >= 0 GROUP BY 1 ORDER BY 1"""

  /** st18: streaming CDC-APPLY — each micro-batch is folded into a keyed
    * aggregate table with plain-SQL `MERGE INTO` through the catalog
    * plugin (the foreachBatch+MERGE recipe every lakehouse runs for
    * incremental materialized views), made EXACTLY-ONCE by a batch-id
    * high-watermark table: a batch at-or-below the recorded watermark is
    * skipped wholesale, so foreachBatch's at-least-once replays cannot
    * double-count (proven here by replaying batch 0 by hand and requiring
    * the state unchanged). Increments are integer cents, so the folded
    * state is bit-identical to a single-pass aggregate regardless of how
    * the stream was batched. At 100 TB each batch's MERGE rewrites only
    * the files its keys touch (group-based copy-on-write, ic59), and the
    * watermark read is O(1) — a singleton table. */
  private def streamCdcApply(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.FsCatalog
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(s.sparkContext.hadoopConfiguration)
    val wh   = "/root/repo/target/scratch/st18_wh"
    val ckpt = "/root/repo/target/scratch/st18_ckpt"
    Seq(wh, ckpt).foreach { p0 =>
      val p = new org.apache.hadoop.fs.Path(p0)
      if (fs.exists(p)) fs.delete(p, true)
    }
    s.conf.set("spark.sql.catalog.ice_cdc", "graft.sources.IceLiteCatalog")
    s.conf.set("spark.sql.catalog.ice_cdc.warehouse", wh)
    try {
      val ev  = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      val cat = new FsCatalog(s, wh)
      val src = cat.createOrReplaceTable("graft", "cdc_changes",
        ev.filter(col("event_id") % 2 === 0).coalesce(1))
      s.sql("""CREATE TABLE ice_cdc.graft.user_agg
               (user_id BIGINT, n_events BIGINT, cents BIGINT)""")
      s.sql("CREATE TABLE ice_cdc.graft.applied (batch_id BIGINT)")
      def applyBatch(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val ss = batch.sparkSession
        val hw = ss.sql("SELECT COALESCE(MAX(batch_id), -1) FROM ice_cdc.graft.applied")
          .collect()(0).getLong(0)
        if (batchId > hw) {
          batch.groupBy("user_id")
            .agg(count(lit(1)).as("n"), sum("cents").as("sv"))
            .createOrReplaceTempView("st18_batch")
          ss.sql("""MERGE INTO ice_cdc.graft.user_agg t
                    USING st18_batch s ON t.user_id = s.user_id
                    WHEN MATCHED THEN UPDATE SET
                      n_events = t.n_events + s.n, cents = t.cents + s.sv
                    WHEN NOT MATCHED THEN INSERT (user_id, n_events, cents)
                      VALUES (s.user_id, s.n, s.sv)""")
          ss.sql(s"INSERT INTO ice_cdc.graft.applied VALUES (${batchId}L)")
        }
      }
      def drain(): Unit =
        s.readStream.format("icelite").option("location", src.location.toString).load()
          .writeStream
          .foreachBatch(applyBatch _)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      drain()
      val afterFirst = s.sql("SELECT COALESCE(SUM(n_events), 0) FROM ice_cdc.graft.user_agg")
        .collect()(0).getLong(0)
      src.append(ev.filter(col("event_id") % 2 === 1).coalesce(1))
      drain() // resume from the checkpoint: only the delta snapshot flows
      val afterSecond = s.sql("SELECT SUM(n_events) FROM ice_cdc.graft.user_agg")
        .collect()(0).getLong(0)
      require(afterSecond > afterFirst, "resumed drain folded no delta rows")
      // replay batch 0 by hand: the high-watermark must reject it wholesale
      applyBatch(ev.filter(col("event_id") % 2 === 0), 0L)
      val afterReplay = s.sql("SELECT SUM(n_events) FROM ice_cdc.graft.user_agg")
        .collect()(0).getLong(0)
      require(afterReplay == afterSecond,
        s"replayed batch was double-applied: $afterSecond -> $afterReplay")
      val out = s.sql("""SELECT user_id, n_events, cents
                         FROM ice_cdc.graft.user_agg ORDER BY user_id""")
      out.queryExecution.assertAnalyzed()
      out
    } finally {
      s.conf.unset("spark.sql.catalog.ice_cdc")
      s.conf.unset("spark.sql.catalog.ice_cdc.warehouse")
    }
  }

  /** st19: RATE-LIMITED BACKFILL — `option("maxSnapshotsPerTrigger", 1)`
    * + native `Trigger.AvailableNow` (SupportsAdmissionControl /
    * SupportsTriggerAvailableNow on the micro-batch stream). A 3-commit
    * table catches up in exactly 3 batches, one snapshot window each (no
    * single giant batch over the whole history — the knob that keeps a
    * months-behind consumer from planning one monster batch), the target
    * is pinned at query start, and the query STOPS at the pin. The
    * batch_id -> row-count map IS the query output: each batch must
    * carry exactly its snapshot's rows, which the oracle replays as the
    * event_id % 3 thirds the commits were built from. */
  private def streamRateLimitedBackfill(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.FsCatalog
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(s.sparkContext.hadoopConfiguration)
    val wh   = "/root/repo/target/scratch/st19_wh"
    val ckpt = "/root/repo/target/scratch/st19_ckpt"
    Seq(wh, ckpt).foreach { p0 =>
      val p = new org.apache.hadoop.fs.Path(p0)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val ev  = Tables.events(s, d).select("event_id", "user_id", "event_type", "value")
    val cat = new FsCatalog(s, wh)
    val src = cat.createOrReplaceTable("graft", "ev_backfill",
      ev.filter(col("event_id") % 3 === 0).coalesce(1)) // snapshot 1
    src.append(ev.filter(col("event_id") % 3 === 1).coalesce(1)) // snapshot 2
    src.append(ev.filter(col("event_id") % 3 === 2).coalesce(1)) // snapshot 3
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    s.readStream.format("icelite")
      .option("location", src.location.toString)
      .option("maxSnapshotsPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) => batches += ((id, b.count())); () }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    require(batches.size == 3,
      s"expected 3 one-snapshot batches from the rate limit, got ${batches.size}: $batches")
    import s.implicits._
    batches.toSeq.toDF("batch_id", "n_rows").orderBy("batch_id")
  }

  private val streamRateLimitedBackfillOracle =
    """SELECT CAST(event_id % 3 AS BIGINT) AS batch_id, COUNT(*) AS n_rows
       FROM events GROUP BY 1 ORDER BY 1"""

  /** st20: streaming FROM A PARTITIONED (hive-layout) table — the
    * snapshot-tailing source now restores partition-column values from
    * the delta files' paths (the data files omit them), grouped one
    * input partition per partition value exactly like the batch scan.
    * The resumed drain flows only the post-checkpoint snapshot. The
    * oracle's o_orderpriority grouping proves value restoration incl.
    * the escaped '4-NOT SPECIFIED'. */
  private def streamPartitionedSource(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.FsCatalog
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(s.sparkContext.hadoopConfiguration)
    val wh   = "/root/repo/target/scratch/st20_wh"
    val ckpt = "/root/repo/target/scratch/st20_ckpt"
    Seq(wh, ckpt).foreach { p0 =>
      val p = new org.apache.hadoop.fs.Path(p0)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val ord = Tables.orders(s, d).select("o_orderkey", "o_orderpriority", "o_totalprice")
    val cat = new FsCatalog(s, wh)
    val src = cat.createOrReplaceTable("graft", "orders_pstream",
      ord.filter(col("o_orderkey") % 2 === 0).coalesce(1), Seq("o_orderpriority"))
    val sink = cat.createOrReplaceTable("graft", "orders_pstream_out", ord.limit(0))
    def drain(): Unit =
      s.readStream.format("icelite").option("location", src.location.toString).load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          sink.append(b.select("o_orderkey", "o_orderpriority", "o_totalprice").coalesce(1))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    drain()
    val afterFirst = sink.scan().count()
    src.append(ord.filter(col("o_orderkey") % 2 === 1).coalesce(1))
    drain() // resume: only the delta snapshot's files flow
    require(sink.scan().count() > afterFirst, "resumed drain moved no delta rows")
    sink.scan()
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")).as("cents"))
      .orderBy("o_orderpriority")
  }

  private val streamPartitionedSourceOracle =
    """SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
       FROM orders GROUP BY 1 ORDER BY 1"""

  /** st21: streaming a MERGE-ON-READ table FROM SCRATCH — the initial
    * micro-batch is a snapshot read, so the source applies the pinned
    * snapshot's position deletes reader-side (per-file range-pruned
    * bitmaps, the batch scan's machinery) instead of `require`-failing
    * (the round-9 hole: CDC-heavy tables couldn't bootstrap a stream).
    * The gate proves live delete debt exists at stream start, that batch
    * 0 excluded exactly the deleted rows, and that a later append still
    * resumes as a plain manifest-delta window. */
  private def streamMorSource(s: SparkSession, d: String): DataFrame = {
    import graft.icelite.FsCatalog
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(s.sparkContext.hadoopConfiguration)
    val wh   = "/root/repo/target/scratch/st21_wh"
    val ckpt = "/root/repo/target/scratch/st21_ckpt"
    Seq(wh, ckpt).foreach { p0 =>
      val p = new org.apache.hadoop.fs.Path(p0)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val ev  = Tables.events(s, d).select("event_id", "user_id", "event_type", "value")
    val cat = new FsCatalog(s, wh)
    val t = cat.createOrReplaceTable("graft", "events_mor_stream",
      ev.filter(col("event_id") % 4 =!= 3).coalesce(1))
    s.conf.set("spark.sql.catalog.ice_st21", "graft.sources.IceLiteCatalog")
    s.conf.set("spark.sql.catalog.ice_st21.warehouse", wh)
    s.conf.set("graft.delete.mode", "merge-on-read")
    try {
      s.sql("DELETE FROM ice_st21.graft.events_mor_stream WHERE event_id % 3 = 0")
      val t1   = cat.loadTable("graft", "events_mor_stream")
      val snap = t1.metadata.currentSnapshot.get
      require(t1.deleteEntriesOf(snap).nonEmpty,
        "setup failed: no live position deletes at stream start")
      def drain(): Unit = {
        s.catalog.dropTempView("st21_sink")
        s.readStream.format("icelite").option("location", t1.location.toString).load()
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum((col("value").cast("decimal(12,2)") * 100).cast("long")).as("cents"))
          .writeStream.format("memory").queryName("st21_sink").outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start().awaitTermination()
      }
      drain() // batch 0: snapshot read WITH delete application
      val batch0 = s.table("st21_sink").agg(sum("n")).head().getLong(0)
      val expect0 = t1.scan().count()
      require(batch0 == expect0,
        s"MoR initial batch streamed $batch0 rows, snapshot scan has $expect0")
      t1.append(ev.filter(col("event_id") % 4 === 3).coalesce(1))
      drain() // resume: plain append window on top of the MoR bootstrap
      s.table("st21_sink")
        .select(col("event_type"), col("n"), col("cents"))
        .orderBy("event_type")
    } finally {
      s.conf.unset("graft.delete.mode")
      s.conf.unset("spark.sql.catalog.ice_st21")
      s.conf.unset("spark.sql.catalog.ice_st21.warehouse")
    }
  }

  private val streamMorSourceOracle =
    """WITH live AS (
         SELECT event_type, value FROM events
         WHERE event_id % 4 <> 3 AND NOT (event_id % 3 = 0)
         UNION ALL
         SELECT event_type, value FROM events WHERE event_id % 4 = 3)
       SELECT event_type, COUNT(*) AS n,
              CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
       FROM live GROUP BY 1 ORDER BY 1"""

  private val streamCdcApplyOracle =
    """SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
       FROM events WHERE event_type = 'purchase' GROUP BY 1 ORDER BY user_id"""

  // ----------------------------- streaming dedup serve (st22, dd23 live)

  /** st22: the dedup index SERVED under Structured Streaming — the shape a
    * daily-ingest pipeline actually runs: the corpus index is committed
    * ONCE at ingest time (dd23's one-file-per-cell band index), and the
    * incoming shard arrives as a STREAM whose every micro-batch is banded,
    * probed against ONLY its own cells (require-gated inside
    * [[graft.ops.Dedup.probeServedIndexBatch]] — per-batch IO ∝ the
    * micro-batch, never the corpus), verified by signature agreement, and
    * appended to the verdict sink. The incoming shard is split into four
    * files with `maxFilesPerTrigger = 1`, so AvailableNow delivers four
    * separate micro-batches — the oracle equality proves the BATCHING IS
    * INVISIBLE: the unioned per-batch verdicts equal dd23's single-shot
    * result row-for-row. At 100 TB this is the serve topology verbatim
    * (kafka source instead of files, object-store sink instead of
    * parquet-append); state is zero — the index table is the state. */
  private def streamDedupProbe(s: SparkSession, d: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root  = "/root/repo/target/scratch/st22"
    val rootP = new Path(root)
    val fs    = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(rootP)) fs.delete(rootP, true)
    // ingest-time: commit the index (every non-src19 doc)
    val meta = graft.ops.Dedup.buildServedIndex(s, d, s"$root/index")
    // the incoming shard (the family's shared batch source, so index and
    // probe sides can never drift apart), staged as 4 files -> 4
    // micro-batches
    val incoming = Tables.documents(s, d)
      .filter(col("source") === graft.ops.Dedup.servedBatchSrc)
      .select("doc_id", "text")
    incoming.repartition(4).write.mode("overwrite").parquet(s"$root/incoming")
    val outDir  = s"$root/verdicts"
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    s.readStream
      .schema(incoming.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/incoming")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches.incrementAndGet()
        graft.ops.Dedup.probeServedIndexBatch(s, meta, batch)
          .write.mode("append").parquet(outDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    require(batches.get() >= 2,
      s"expected multiple micro-batches, got ${batches.get()} — split invariance untested")
    s.read.parquet(outDir).orderBy("doc_id")
  }

  /** Scoped checkpoint-IO choice for the streaming lifecycles. Spark
    * 4.1's default checkpoint stack on a FileContext-capable filesystem
    * (local `file:` included) layers a per-file checksum manager over the
    * FileContext manager; thread dumps of the stateful stages show task
    * threads parked in `ChecksumCheckpointFileManager.awaitResult` and
    * the stage spending 94 s of task time at 1.7 s CPU (st04, 32
    * partitions × 4 join state stores). On the local scratch checkpoints
    * these fixtures use, Spark's own `FileSystemBasedCheckpointFileManager`
    * (the manager Spark itself falls back to when FileContext is
    * unavailable; same-directory rename is atomic on POSIX) halves the
    * lifecycle: a minimal stream-stream join repro goes 4.96 s → 2.01 s.
    * Parameterised: `graft.streaming.checkpointFileManager` overrides the
    * class, and `default` keeps Spark's stack — which is the right choice
    * when checkpoints live on HDFS/object storage, where the FileContext
    * manager's atomic overwrite-rename and the checksum layer's
    * corruption detection earn their cost. Conf is saved/restored around
    * each lifecycle; results are unaffected (checkpoint IO only). */
  private[graft] def withLocalCkptManager[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.checkpointFileManagerClass"
    val chosen = s.conf.get("graft.streaming.checkpointFileManager",
      "org.apache.spark.sql.execution.streaming.checkpointing." +
        "FileSystemBasedCheckpointFileManager")
    if (chosen == "default") body
    else {
      val saved = s.conf.getOption(key)
      s.conf.set(key, chosen)
      try body
      finally saved match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }
  }

  def all: Seq[Q] =
    baseAll.map(q => q.copy(run = (s, d) => withLocalCkptManager(s)(q.run(s, d))))

  private def baseAll: Seq[Q] = Seq(
    Q("st01_stream_hourly", streamHourly, Some(streamHourlyOracle)),
    Q("st02_stream_sessions", streamSessions, Some(streamSessionsOracle)),
    Q("st03_stream_dedup", streamDedup, Some(streamDedupOracle)),
    Q("st04_stream_join", streamJoin, Some(streamJoinOracle)),
    Q("st05_stream_ingest", streamIngest, Some(streamIngestOracle)),
    Q("st06_stream_upsert", streamUpsert, Some(streamUpsertOracle)),
    Q("st07_stream_iceberg_cdc", streamIcebergCdc, Some(streamIcebergCdcOracle)),
    Q("st08_stream_compaction", streamCompaction, Some(streamCompactionOracle)),
    Q("st09_stream_curation", streamCuration, Some(streamCurationOracle)),
    Q("st10_session_window", sessionWindow, Some(sessionWindowOracle)),
    Q("st11_stream_enrich", streamEnrich, Some(streamEnrichOracle)),
    Q("st12_transform_with_state", transformWithStateQ, Some(transformWithStateOracle)),
    Q("st13_map_state", mapStateQ, Some(mapStateOracle)),
    Q("st14_stream_table_source", streamTableSource, Some(streamTableSourceOracle)),
    Q("st15_stream_table_sink", streamTableSink, Some(streamTableSinkOracle)),
    Q("st16_stream_table_to_table", streamTableToTable, Some(streamTableToTableOracle)),
    Q("st17_stream_iceberg_source", streamIcebergSource, Some(streamTableSinkOracle)),
    Q("st18_stream_cdc_apply", streamCdcApply, Some(streamCdcApplyOracle)),
    Q("st19_stream_rate_limited_backfill", streamRateLimitedBackfill,
      Some(streamRateLimitedBackfillOracle)),
    Q("st20_stream_partitioned_source", streamPartitionedSource,
      Some(streamPartitionedSourceOracle)),
    Q("st21_stream_mor_source", streamMorSource, Some(streamMorSourceOracle)),
    // same oracle as dd23/dd24: micro-batched serving must be invisible
    // to the logical result
    Q("st22_stream_dedup_probe", streamDedupProbe,
      Some(graft.ops.Dedup.servedBandIndexOracle))
  )

  /** Per-user running event count as a [[org.apache.spark.sql.streaming.StatefulProcessor]]
    * with explicit [[org.apache.spark.sql.streaming.ValueState]] — the
    * arbitrary-stateful-processing API that replaces
    * `mapGroupsWithState` (st02 uses the legacy API; this is its modern
    * twin). Emits the updated count on every batch; the report keeps each
    * user's LAST emission (max — counts only grow), which must equal the
    * batch GROUP BY regardless of how the file source splits batches. */
  private class RunningCount
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Long, (Long, Long)] {
    @transient private var cnt: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Long],
                                 timers: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
      val n = (if (cnt.exists()) cnt.get() else 0L) + rows.size
      cnt.update(n)
      Iterator.single((key, n))
    }
  }

  /** transformWithState requires the RocksDB state store; pin it for this
    * run and restore the session's provider after. */
  private def transformWithStateQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val key  = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val updates = eventsStream(s, d)
        .select(col("user_id")).as[Long]
        .groupByKey(identity)
        .transformWithState(new RunningCount,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update(),
          org.apache.spark.sql.Encoders.product[(Long, Long)])
        .toDF("user_id", "n_seen")
      runToTable(s, updates, "st12_sink", "update")
        .groupBy("user_id")
        .agg(max("n_seen").as("n_events"))
        .orderBy("user_id")
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  private val transformWithStateOracle =
    "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id ORDER BY user_id"

  /** Per-user per-event-type running counts held in a
    * [[org.apache.spark.sql.streaming.MapState]] (one sub-keyed map per
    * grouping key — the state layout for "counts per category per user"
    * that a ValueState would have to serialize wholesale on every
    * update). Emits the updated (type → n) rows each batch; the report
    * keeps each cell's max, which equals the batch GROUP BY under any
    * file-source batch split because counts only grow. */
  private class PerTypeCounts
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, String), (Long, String, Long)] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
                                 timers: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, String, Long)] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { case (_, t) =>
        val n = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, n + 1)
        touched += t
      }
      touched.iterator.map(t => (key, t, counts.getValue(t)))
    }
  }

  private def mapStateQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val key  = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val updates = eventsStream(s, d)
        .select(col("user_id"), col("event_type")).as[(Long, String)]
        .groupByKey(_._1)
        .transformWithState(new PerTypeCounts,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update(),
          org.apache.spark.sql.Encoders.product[(Long, String, Long)])
        .toDF("user_id", "event_type", "n_seen")
      runToTable(s, updates, "st13_sink", "update")
        .groupBy("user_id", "event_type")
        .agg(max("n_seen").as("n_events"))
        .orderBy("user_id", "event_type")
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  private val mapStateOracle =
    """SELECT user_id, event_type, COUNT(*) AS n_events
       FROM events GROUP BY user_id, event_type
       ORDER BY user_id, event_type"""
}
