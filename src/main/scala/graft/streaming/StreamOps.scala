package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  ListState, MapState, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState,
  TTLConfig, TimeMode, TimerValues, ValueState}
import java.sql.Timestamp

/** T11 — Structured Streaming over `events`-shaped data (SURVEY §2 T11).
  *
  * Each operator is a pure DataFrame→DataFrame transform so the same code
  * runs over `spark.readStream` in production and `MemoryStream` in tests
  * (streaming outputs are micro-batch-dependent, hence no DuckDB oracle —
  * verified in StreamOpsSpec with deterministic AvailableNow-style drains).
  *
  * Scale notes: event-time windowed aggregation shuffles on (window, key)
  * and keeps per-window state in the StateStore; watermarks bound that
  * state (without one, 100 TB of stream history accumulates in state).
  * `flatMapGroupsWithState` state is per-user and evicted by event-time
  * timeout — the session operator's memory is O(active users), not O(events).
  */
object StreamOps {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  case class SessionState(start: Timestamp, last: Timestamp, n: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** File-source ingest: same schema-first discipline as the batch loaders.
    * `maxFilesPerTrigger` bounds each micro-batch (the standard throttle
    * for backfills/replays — without it an AvailableNow catch-up over a
    * deep archive becomes one giant batch sized by the backlog, not the
    * cluster). */
  def ingest(s: SparkSession, dir: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val r = s.readStream.schema(sch)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** Per-minute tumbling event counts (event time). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("event_type"), col("cnt"))

  /** 5-minute windows sliding every minute. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes", "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("event_type"), col("cnt"))

  /** Hourly OHLC candles per event_type — the streaming twin of
    * q_win_ohlc. open/close are min_by/max_by over the
    * (second-truncated ts, event_id) struct — the SAME tie key the batch
    * q_win_ohlc orders by (WindowOps.ohlcSql ranks on `tss, event_id`),
    * so the twin claim holds even for sub-second timestamps where raw-ts
    * and truncated-ts ordering pick different open/close rows. The struct
    * key is still unique (event_id breaks ties) → deterministic picks,
    * which Spark merges ACROSS micro-batches as ordered partial state:
    * the parity replay is what proves a candle whose open arrived in
    * batch 2 and close in batch 7 still matches the one-shot batch plan
    * row-for-row. */
  def ohlcCandles(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"),
          struct(date_trunc("second", col("ts")), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"),
          struct(date_trunc("second", col("ts")), col("event_id"))).as("close"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("hr"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"))

  /** Session windows with a 30-minute gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("cnt"))

  /** Streaming HDR-percentile state: per-hour log2-bucket value counts —
    * the constant-size-per-window sketch q_agg_hdr_percentile reads
    * percentiles from, maintained incrementally on the stream (bucketing
    * is a stateless projection, so the only state is the windowed count
    * map: O(windows × ~64 buckets) regardless of throughput). Percentile
    * extraction is a cumulative scan over the final bucket rows. */
  def hdrBucketCounts(events: DataFrame): DataFrame =
    events
      .filter(col("value") > 0)
      .withColumn("bucket", floor(log2(col("value"))))
      .groupBy(window(col("ts"), "1 hour"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("bucket"), col("cnt"))

  /** Streaming hourly Apdex per event_type — the incremental twin of
    * q_report_apdex: satisfied/tolerating bucket sums are plain windowed
    * aggregates (map-side-combinable partial state, O(windows × types)
    * regardless of throughput) and the ppm readout is pure integer
    * arithmetic, so the stream and the one-shot batch plan agree
    * bit-for-bit — proven by the replay parity. */
  def apdexWindows(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") <= 100, 1L).otherwise(0L)).as("n_sat"),
        sum(when(col("value") > 100 && col("value") <= 400, 1L).otherwise(0L))
          .as("n_tol"))
      .select(col("window.start").as("hr"), col("event_type"),
        col("n"), col("n_sat"), col("n_tol"),
        ((col("n_sat") * 1000000L + col("n_tol") * 500000L) / col("n"))
          .cast("long").as("apdex_ppm"))

  /** Streaming daily distinct actives (DAU) — CHAINED stateful operators:
    * a streaming dropDuplicates on (user_id, day) in front of the
    * windowed count, the standard exact-DAU topology (state = one row
    * per user-day, the same |users|×|days| bound as the batch
    * q_report_dau_wau_mau reduction; the sketch route past that is HLL).
    * The dedup carries a 45-day watermark on `day` (the event-time
    * column, part of the dedup key) so a long-running deployment evicts
    * user-day state once the day falls 45 days behind the stream —
    * WITHOUT the watermark the dedup state grows one row per user-day
    * forever. 45 days comfortably exceeds any replay corpus span, so no
    * row is ever late during the parity replay and the watermarked plan
    * is row-identical to the unwatermarked one there; in production the
    * delay is the retention/out-of-orderness budget (events for a day
    * more than 45 days stale are dropped by the dedup, the standard
    * exact-DAU contract). The replay proves the dedup state merges
    * correctly across micro-batches — a user seen in batches 2 and 7
    * counts once. */
  def dauCounts(events: DataFrame): DataFrame =
    events
      .withColumn("day", date_trunc("day", col("ts")))
      .withWatermark("day", "45 days")
      .dropDuplicates("user_id", "day")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))

  /** Streaming mergeable-sketch parity: approx-distinct users per type.
    * The HLL registers merge by max, so the sketch is associative and
    * order-independent — a stream folding the corpus in 8 micro-batches
    * must land on EXACTLY the batch estimate (this is the property that
    * makes sketches the 100 TB distinct-count route; the parity check
    * proves Spark's partial-agg merge preserves it across batches). */
  def hllUsers(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))

  /** Streaming exact-decimal stats per type — the Det discipline under
    * micro-batch partial aggregation: the DECIMAL(30,6) sum is exact in
    * any merge order, so stream and batch agree bit-for-bit (a raw
    * double sum would drift with the batch split). */
  def decimalStats(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))

  /** Windowed counts that drop events later than 10 minutes (append mode). */
  def lateDropCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("event_type"), col("cnt"))

  /** Streaming dedup by event_id, state bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases within 30 minutes after a
    * click by the same user. Watermarks on both sides bound the join state
    * (without them the runtime must keep every past row — the 100 TB
    * failure mode); the interval condition lets the engine evict state
    * once the watermark passes `click.ts + 30 min`. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("ts", "10 minutes").alias("c")
      .join(
        purchases.withWatermark("ts", "10 minutes").alias("p"),
        expr("""c.user_id = p.user_id AND
                p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTES"""))
      .select(
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        col("c.user_id").as("user_id"))

  /** Stream-stream LEFT OUTER interval join: every click, with its
    * purchase if one arrived within the window, else null-extended. The
    * outer side makes watermarks MANDATORY, not just state hygiene: a
    * click can only be emitted as unmatched once the watermark proves no
    * matching purchase can still arrive, so null rows appear exactly when
    * the right-side watermark passes `click.ts + 30 min` — bounded state
    * AND bounded result latency at any scale. */
  def clickToPurchaseOuter(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("ts", "10 minutes").alias("c")
      .join(
        purchases.withWatermark("ts", "10 minutes").alias("p"),
        expr("""c.user_id = p.user_id AND
                p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTES"""),
        "left_outer")
      .select(
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        col("c.user_id").as("user_id"))

  /** CHAINED stateful operators in one streaming query (Spark 4 lifts the
    * old one-stateful-op limit): the stream-stream interval join feeds a
    * tumbling event-time aggregation downstream — conversion counts per
    * minute, end to end in a single query. Both operators keep watermark-
    * bounded state; the engine tracks a per-operator watermark so the
    * aggregation only finalizes windows the JOIN can no longer add rows
    * to. This is the shape that replaces join-to-kafka-to-second-job
    * pipelines at scale. Requires the join's event-time column to flow
    * through (c.ts survives the select). */
  def clickToPurchaseRate(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("ts", "10 minutes").alias("c")
      .join(
        purchases.withWatermark("ts", "10 minutes").alias("p"),
        expr("""c.user_id = p.user_id AND
                p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTES"""))
      .select(col("c.ts").as("ts"), col("c.user_id").as("user_id"))
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n_conversions"))
      .select(col("window.start").as("w_start"), col("n_conversions"))

  /** Micro-batch sink via foreachBatch: append each batch as parquet.
    * The (batchId, data) contract is where exactly-once sinks hook in. */
  def sinkForeachBatch(df: DataFrame, path: String) =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.write.mode("append").parquet(path)
    }

  /** Custom stateful sessionization: 30-min inactivity gap, event-time
    * timeout. Emits one row per closed session. */
  def statefulSessionize(s: SparkSession, events: Dataset[Event]): Dataset[SessionOut] = {
    import s.implicits._
    val gapMs = 30L * 60 * 1000

    def fn(userId: Long, rows: Iterator[Event], state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        Iterator.single(SessionOut(userId, st.start, st.last, st.n))
      } else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var out = List.empty[SessionOut]
        var cur = state.getOption
        for (e <- sorted) {
          cur match {
            case Some(st) if e.ts.getTime - st.last.getTime > gapMs =>
              out ::= SessionOut(userId, st.start, st.last, st.n)
              cur = Some(SessionState(e.ts, e.ts, 1))
            case Some(st) =>
              cur = Some(SessionState(st.start, e.ts, st.n + 1))
            case None =>
              cur = Some(SessionState(e.ts, e.ts, 1))
          }
        }
        cur.foreach { st =>
          state.update(st)
          state.setTimeoutTimestamp(st.last.getTime + gapMs)
        }
        out.reverseIterator
      }
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Stream-static enrichment join: each micro-batch joins against the
    * (re-read per batch) static dimension — broadcast, since the dim side
    * is the small one; the classic at-ingest enrichment shape. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  case class UserCount(user_id: Long, n_events: Long)

  /** Spark 4 `transformWithState` stateful processor: running per-user
    * event count in a typed `ValueState[Long]`. The modern replacement for
    * the `*GroupsWithState` family — state variables are declared against a
    * handle (RocksDB-backed; value/list/map state, TTL, timers) instead of
    * a single opaque state object, and the store can be evolved/rescaled
    * independently of the operator. Requires
    * `spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider`.
    */
  class RunningCountProcessor extends StatefulProcessor[Long, Event, UserCount] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[UserCount] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator.single(UserCount(key, n))
    }
  }

  /** Running per-user counts via [[RunningCountProcessor]]; Update-mode
    * emission (one row per user per micro-batch that saw that user). */
  def statefulRunningCount(s: SparkSession, events: Dataset[Event]): Dataset[UserCount] = {
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Update())
  }

  case class TtlCounts(user_id: Long, n_ttl: Long, n_forever: Long)

  /** State TTL (Spark 4): the same running count kept twice — once under a
    * processing-time TTL and once without. TTL'd state variables silently
    * disappear after the configured duration (the store filters expired
    * values at read), which is the zero-code retention mechanism for
    * "recent activity" state: no timers to manage, no manual cleanup, and
    * state size stays bounded by the active-key window instead of growing
    * with every key ever seen — the difference between a bounded and an
    * unbounded state store at 100 TB. TTL requires
    * `TimeMode.ProcessingTime`; the untouched twin proves expiry is
    * per-variable, not per-key. */
  class TtlCountProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, Event, TtlCounts] {
    @transient private var recent: ValueState[Long] = _
    @transient private var forever: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getValueState[Long]("recent", Encoders.scalaLong, TTLConfig(ttl))
      forever = getHandle.getValueState[Long]("forever", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[TtlCounts] = {
      val batch = rows.size
      val r = (if (recent.exists()) recent.get() else 0L) + batch
      val f = (if (forever.exists()) forever.get() else 0L) + batch
      recent.update(r)
      forever.update(f)
      Iterator.single(TtlCounts(key, r, f))
    }
  }

  /** Running counts with a TTL'd twin via [[TtlCountProcessor]]. */
  def statefulTtlCount(s: SparkSession, events: Dataset[Event],
                       ttl: java.time.Duration): Dataset[TtlCounts] = {
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TtlCountProcessor(ttl), TimeMode.ProcessingTime(),
        OutputMode.Update())
  }

  case class CountSeed(user_id: Long, n: Long)

  /** Batch-bootstrap for streaming state: the running-count processor
    * seeded from a BATCH aggregate via `StatefulProcessorWithInitialState`
    * — the operational pattern for standing up a new streaming job against
    * 100 TB of history: backfill per-key state with one batch groupBy
    * (`handleInitialState`, called once per key before any stream batch),
    * then the stream increments from there instead of replaying the
    * archive through the stream path. */
  class SeededCountProcessor
      extends StatefulProcessorWithInitialState[Long, Event, UserCount, CountSeed] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInitialState(key: Long, seed: CountSeed,
                                    timerValues: TimerValues): Unit =
      count.update(seed.n)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[UserCount] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator.single(UserCount(key, n))
    }
  }

  /** Running counts continuing FROM the batch-computed seed. */
  def statefulRunningCountSeeded(s: SparkSession, events: Dataset[Event],
                                 seed: Dataset[CountSeed]): Dataset[UserCount] = {
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SeededCountProcessor, TimeMode.None(), OutputMode.Update(),
        seed.groupByKey(_.user_id))
  }

  /** Incremental maintenance of a keyed aggregate serving table: the
    * streaming aggregation runs in UPDATE mode (state carries each key's
    * running total), so every micro-batch emits only the keys that
    * CHANGED — and foreachBatch upserts exactly those keys into a parquet
    * table (anti-join out the stale rows, union the new ones, stage and
    * swap). History is never recomputed: batch N's work is O(changed
    * keys), not O(all events so far) — the pattern table formats
    * industrialize as MERGE sinks, here on raw parquet with a staged
    * atomic-ish directory swap standing in for the format's transaction.
    * The upserted table stays aggregate-sized (days × types) however much
    * data streams through. */
  def maintainDailyCounts(events: DataFrame, table: String) =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, table, Seq("day", "event_type"))
      }

  /** The MERGE-sink core shared by every incrementally maintained serving
    * table: upsert `batch` into the parquet `table` by `keys` — anti-join
    * out the stale rows, union the new ones, stage fully, then swap via
    * rename-aside. Crash recovery: if a previous batch died between "move
    * current aside" and "move stage in", the table dir is missing but the
    * _old copy is intact — restored before merging, so history is never
    * silently dropped; the loss window is a single rename (between the
    * two moves the table is briefly absent but both copies exist on
    * disk), instead of a delete-first window where a crash after the
    * delete loses the only copy. Staging materializes BEFORE the old
    * table is touched — overwriting a path mid-read would corrupt. */
  def upsertBatch(batch: DataFrame, table: String, keys: Seq[String]): Unit =
    // same read-modify-write race class as keyedMerge: two writers
    // interleaving anti-join + swap lose rows silently. The loops drive
    // one writer per table by construction; the lock makes that a
    // CONTRACT (serialize or ConcurrentWriteException), not an
    // assumption. Readers stay lock-free (Search.readParquetRetry
    // rides out the swap window).
    graft.operators.TableLock.withLock(table, "upsertBatch") {
    val sp = batch.sparkSession
    val dir = java.nio.file.Paths.get(table)
    val oldDir = java.nio.file.Paths.get(table + "_old")
    if (!java.nio.file.Files.exists(dir) && java.nio.file.Files.exists(oldDir))
      java.nio.file.Files.move(oldDir, dir)
    val merged =
      if (java.nio.file.Files.exists(dir)) {
        val existing = sp.read.parquet(table)
        existing.join(batch.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(batch)
      } else batch
    val stage = table + "_stage"
    merged.write.mode("overwrite").parquet(stage)
    def rmTree(p: java.nio.file.Path): Unit = if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmTree(oldDir)
    if (java.nio.file.Files.exists(dir))
      java.nio.file.Files.move(dir, oldDir)
    java.nio.file.Files.move(java.nio.file.Paths.get(stage), dir)
    rmTree(oldDir)
    ()
    }


  /** The LIVE GENRE LOOP, composed end-to-end: `tail -f`-style file-source
    * ingest → incrementally maintained serving table → interactive search
    * over that table while the stream runs. Each piece exists on its own
    * ([[ingest]], [[maintainDailyCounts]], [[graft.Search]]); this is the
    * one-call composition a log-analytics user actually deploys: point it
    * at a growing directory, then query `daily_counts` (registered by
    * `Search.registerServing`) at any time for answers that include every
    * micro-batch processed so far. The serving table stays aggregate-sized
    * (days × types) and each batch's work is O(changed keys) — the
    * recipe survives 100 TB of history because history is never replayed.
    * Proven live in LiveLoopSpec (searches answered mid-stream, between
    * ingest waves) and row-for-row against a batch recompute in
    * StreamParity's `serving_table` check. */
  def liveServingLoop(s: SparkSession, ingestDir: String, servingTable: String,
                      maxFilesPerTrigger: Option[Int] = None) =
    maintainDailyCounts(ingest(s, ingestDir, maxFilesPerTrigger), servingTable)

  // ---- streaming CDC → lake MERGE ---------------------------------------

  /** Schema of a CDC change row: `op` ∈ {D, U, I} + the row image. */
  val cdcSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType)))

  /** Streaming CDC → lake MERGE loop: a file-source stream of {D, U, I}
    * change rows, each micro-batch applied to a bucket-partitioned
    * parquet table by [[graft.operators.ScanOps.keyedMerge]] inside
    * foreachBatch — the composition that replaces the
    * kafka-to-nightly-merge-job pipeline: the lake table is never more
    * than one micro-batch behind the change stream, and each batch's
    * cost is touched-buckets only (the keyedMerge contract).
    *
    * Delivery semantics: foreachBatch is at-least-once on failure, and
    * keyedMerge is IDEMPOTENT per batch (every batch key is upserted —
    * its old row anti-joined out before the image unions in), so a
    * replayed batch converges to the same table instead of duplicating
    * inserts. Row-for-row equality with a one-shot batch merge of the
    * full CDC set is proven in StreamParity's `cdc_merge` check. */
  def cdcMergeLoop(s: SparkSession, cdcDir: String, tableDir: String,
                   tableSchema: org.apache.spark.sql.types.StructType,
                   maxFilesPerTrigger: Option[Int] = None) = {
    val rd = s.readStream.schema(cdcSchema)
    maxFilesPerTrigger.fold(rd)(n => rd.option("maxFilesPerTrigger", n))
      .parquet(cdcDir)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.ScanOps.keyedMerge(
          batch.sparkSession, tableDir, tableSchema, batch)
      }
  }

  // ---- stream-stream AS-OF join ---------------------------------------

  /** Tagged union row for the streaming as-of join: `side` is 'L' (trade /
    * probe row, identified by `id`) or 'R' (quote / reference row carrying
    * `value`). */
  case class AsofIn(key: Long, side: String, ts: Timestamp, id: Long, value: Double)
  case class AsofOut(key: Long, left_id: Long, left_ts: Timestamp,
                     right_ts: Option[Timestamp], right_value: Option[Double])

  /** Streaming as-of join as a Spark 4 `transformWithState` processor —
    * the operator Structured Streaming lacks natively (its stream-stream
    * joins are interval equi-joins; "latest right at-or-before each left"
    * needs order-aware per-key state). Semantics match the batch
    * [[graft.plans.AsOf]] operator: for every left row, the single
    * latest right row with the same key and `rt <= lt`, ties on time by
    * the larger right id; left-outer (unmatched lefts null-extend).
    *
    * Correctness under out-of-order arrival is watermark-driven: a left
    * row can only be FINALIZED once the watermark proves no earlier-or-
    * equal right row can still arrive, so lefts buffer in state and drain
    * when `lt <= watermark` (each batch, plus an event-time timer for
    * keys that stop receiving input). Rights buffer too, compacted by the
    * dominance rule that bounds state at 100 TB: any right older than the
    * watermark is beaten by the LATEST right older than the watermark for
    * every still-possible left (`lt > watermark ≥ rt`), so exactly one
    * below-watermark right survives — state per key = pending lefts +
    * not-yet-dominated rights, both watermark-bounded, NOT stream history.
    */
  class AsofJoinProcessor extends StatefulProcessor[Long, AsofIn, AsofOut] {
    @transient private var lefts: ListState[(Long, Long)] = _            // (ts, id)
    @transient private var rights: ListState[(Long, Long, Double)] = _   // (ts, id, value)
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lefts = getHandle.getListState[(Long, Long)]("lefts",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
      rights = getHandle.getListState[(Long, Long, Double)]("rights",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
    }

    // State timestamps are MICROS since epoch (Catalyst's native unit —
    // `Timestamp.getTime` would truncate to millis and silently mis-match
    // sub-millisecond data; the corpus parity gate caught exactly that).
    // Timer/watermark APIs speak millis, so comparisons scale the
    // watermark UP to micros (conservative: truncation drains no left
    // early) and timers register the CEILING millisecond (progress: when
    // the timer fires, wm_ms*1000 >= lt is guaranteed).
    private def micros(t: Timestamp): Long =
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    private def fromMicros(us: Long): Timestamp =
      org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(us)

    /** Drain every buffered left with ts <= watermark against the buffered
      * rights; compact the rights; re-arm the timer for the rest. */
    private def drain(key: Long, wmMicros: Long): Iterator[AsofOut] = {
      val ls = lefts.get().toArray.sortBy(l => (l._1, l._2))
      val rs = rights.get().toArray.sortBy(r => (r._1, r._2))
      val (ready, pending) = ls.partition(_._1 <= wmMicros)
      val out = ready.iterator.map { case (lt, lid) =>
        val cand = rs.filter(_._1 <= lt)
        if (cand.isEmpty) AsofOut(key, lid, fromMicros(lt), None, None)
        else {
          val (rt, _, rv) = cand.maxBy(r => (r._1, r._2))
          AsofOut(key, lid, fromMicros(lt), Some(fromMicros(rt)), Some(rv))
        }
      }.toArray
      if (pending.isEmpty) lefts.clear() else lefts.put(pending)
      // dominance compaction: keep rights above the watermark + the single
      // latest right at-or-below it
      val (below, above) = rs.partition(_._1 <= wmMicros)
      val keep = (if (below.isEmpty) above else below.maxBy(r => (r._1, r._2)) +: above)
        .sortBy(r => (r._1, r._2))
      if (keep.isEmpty) rights.clear() else rights.put(keep)
      if (armed.exists()) { getHandle.deleteTimer(armed.get()); armed.clear() }
      if (pending.nonEmpty) {
        val t = (pending.map(_._1).min + 999L) / 1000L // ceil micros → ms
        getHandle.registerTimer(t)
        armed.update(t)
      }
      out.iterator
    }

    override def handleInputRows(key: Long, rows: Iterator[AsofIn],
                                 timerValues: TimerValues): Iterator[AsofOut] = {
      rows.foreach { r =>
        if (r.side == "L") lefts.appendValue((micros(r.ts), r.id))
        else rights.appendValue((micros(r.ts), r.id, r.value))
      }
      drain(key, timerValues.getCurrentWatermarkInMs() * 1000L)
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[AsofOut] = {
      armed.clear()
      drain(key, timerValues.getCurrentWatermarkInMs() * 1000L)
    }
  }

  /** Stream-stream as-of join of `lefts` (trades: key, ts, id) with
    * `rights` (quotes: key, ts, id, value): tagged union → one keyed
    * stateful processor. Both inputs need the SAME watermark column (the
    * union's event time). */
  def streamingAsofJoin(s: SparkSession, tagged: Dataset[AsofIn]): Dataset[AsofOut] = {
    import s.implicits._
    tagged
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.key)
      .transformWithState(new AsofJoinProcessor, TimeMode.EventTime(), OutputMode.Append())
  }

  case class UserDigest(user_id: Long, kind: String, n_types: Long, recent: Seq[Double])

  /** Spark 4 stateful processor exercising the FULL typed-state surface:
    * - `ListState` — bounded buffer of the user's most recent values
    *   (appendValue per row; trimmed by rewriting when it exceeds 3 —
    *   list state is append-oriented, there is no pop);
    * - `MapState` — per-event-type running counts (point get/update; at
    *   scale this beats a single Value[Map] blob because RocksDB updates
    *   touch one map entry, not a reserialized whole map);
    * - event-time timers — each batch (re)arms an idle timer at
    *   max(event ts)+gap, deleting the previously-armed one (tracked in a
    *   `ValueState`; re-registering without deleting leaks timers that all
    *   fire). When the watermark passes the armed time,
    *   `handleExpiredTimer` emits a final "expired" digest and clears the
    *   user's state — memory stays O(active users), the property that
    *   matters at 100 TB of stream history.
    */
  class UserDigestProcessor(gapMs: Long) extends StatefulProcessor[Long, Event, UserDigest] {
    @transient private var recent: ListState[Double] = _
    @transient private var typeCounts: MapState[String, Long] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[Double]("recent", Encoders.scalaDouble, TTLConfig.NONE)
      typeCounts = getHandle.getMapState[String, Long](
        "typeCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[UserDigest] = {
      var maxTs = Long.MinValue
      rows.foreach { e =>
        recent.appendValue(e.value)
        val c = if (typeCounts.containsKey(e.event_type)) typeCounts.getValue(e.event_type) else 0L
        typeCounts.updateValue(e.event_type, c + 1L)
        maxTs = math.max(maxTs, e.ts.getTime)
      }
      val buf = recent.get().toArray
      if (buf.length > 3) recent.put(buf.takeRight(3))
      if (armed.exists()) getHandle.deleteTimer(armed.get())
      getHandle.registerTimer(maxTs + gapMs)
      armed.update(maxTs + gapMs)
      Iterator.single(UserDigest(key, "update", typeCounts.keys().size.toLong,
        recent.get().toSeq))
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[UserDigest] = {
      val out = UserDigest(key, "expired", typeCounts.keys().size.toLong,
        recent.get().toSeq)
      recent.clear(); typeCounts.clear(); armed.clear()
      Iterator.single(out)
    }
  }

  /** Per-user digests with idle finalization via [[UserDigestProcessor]];
    * event-time timers require a watermark on the input. */
  def statefulUserDigest(s: SparkSession, events: Dataset[Event],
                         gapMs: Long = 60000L): Dataset[UserDigest] = {
    import s.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new UserDigestProcessor(gapMs), TimeMode.EventTime(), OutputMode.Update())
  }

  // ---- streaming MinHash near-dup dedup --------------------------------

  /** A document arriving on the training-data firehose. */
  case class DocIn(doc_id: Long, ts: Timestamp, text: String)
  case class BandRow(bkey: String, doc_id: Long, ts: Timestamp)
  case class BandVerdict(doc_id: Long, owner: Long)

  /** The same MinHash banding the batch dedup ladder uses
    * (TextOps q_dedup_lsh_bands: k=8 signature from md5 substrings,
    * 4 bands × 2 hashes), as a streaming projection: each doc explodes to
    * 4 (band-bucket, doc) rows. Deterministic md5 hashing keeps the
    * stream and batch paths bit-identical. */
  def minhashBands(docs: Dataset[DocIn]): DataFrame =
    docs.selectExpr("doc_id", "ts",
        "transform(sequence(0, 7), i -> array_min(transform(" +
          "transform(array_distinct(split(text, ' ')), t -> md5(t)), " +
          "h -> substring(h, 3 * i + 1, 8)))) AS mh")
      .selectExpr("doc_id", "ts", "explode(sequence(0, 3)) AS b", "mh")
      .selectExpr(
        "concat(CAST(b AS STRING), ':', element_at(mh, 2 * b + 1), " +
          "element_at(mh, 2 * b + 2)) AS bkey",
        "doc_id", "ts")

  /** Per-band-bucket ownership: the first document (in (ts, doc_id)
    * order) to hit a bucket claims it forever; every later arrival in the
    * same bucket is reported against that owner. State per key is ONE
    * long — the streaming dedup index is O(buckets), not O(documents²),
    * and the bucket key is the shuffle key, exactly the batch banding's
    * scale story carried to ingest time. */
  class BucketOwnerProcessor extends StatefulProcessor[String, BandRow, BandVerdict] {
    @transient private var owner: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BandRow],
                                 timerValues: TimerValues): Iterator[BandVerdict] = {
      // (ts, doc_id) order within the batch = the global arrival order the
      // batch twin's min(struct(ts, doc_id)) argmin states declaratively
      // (corpus fixtures use whole-second ts, so millis precision is
      // lossless here; sub-ms streams should carry micros — see NOTES r7)
      val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
      var cur = if (owner.exists()) Some(owner.get()) else None
      val out = sorted.map { r =>
        cur match {
          case None => cur = Some(r.doc_id); BandVerdict(r.doc_id, r.doc_id)
          case Some(o) => BandVerdict(r.doc_id, o)
        }
      }
      cur.foreach(owner.update)
      out.iterator
    }
  }

  /** Streaming near-dup dedup ON INGEST: MinHash-band the stream, claim
    * buckets in a `transformWithState` keyed on the band bucket, then
    * combine the 4 per-band verdicts per document with a downstream
    * UPDATE-mode aggregation (Spark 4 chained stateful): a document is a
    * duplicate iff any of its buckets was already owned, `dup_of` = the
    * smallest such owner. Batch-parity twin: [[batchMinhashDedup]]. */
  def streamingMinhashDedup(s: SparkSession, docs: Dataset[DocIn]): DataFrame = {
    import s.implicits._
    minhashBands(docs).as[BandRow]
      .groupByKey(_.bkey)
      .transformWithState(new BucketOwnerProcessor, TimeMode.None(), OutputMode.Update())
      .groupBy("doc_id")
      .agg(min(when(col("owner") =!= col("doc_id"), col("owner"))).as("dup_of"))
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
  }

  /** Ingest-time QUALITY scoring — the linear scorer
    * (TextOps.qualityScoreSelectExprs: literal-map weight vector, exact
    * decimal fold, floor-quantized score + keep/drop label) as a
    * STATELESS streaming projection: a doc's verdict is final the moment
    * it arrives, carries no state at any stream length, and composes in
    * front of any downstream loop (dedup registry, serving table) as the
    * first filter a training-data firehose applies. Streaming twin of
    * q_text_quality_score; batch parity in StreamParity (the same
    * projection over the replayed corpus), expression equivalence with
    * the broadcast-join scorer proven in OperatorSpec. */
  def streamingQualityScore(docs: Dataset[DocIn]): DataFrame =
    docs.selectExpr("doc_id" +: "ts" +:
      graft.operators.TextOps.qualityScoreSelectExprs("text"): _*)

  /** File-source ingest for the DOCUMENT firehose (doc_id, ts, text) —
    * the documents-shaped twin of [[ingest]]. */
  def ingestDocs(s: SparkSession, dir: String,
                 maxFilesPerTrigger: Option[Int] = None): Dataset[DocIn] = {
    import org.apache.spark.sql.types._
    import s.implicits._
    val sch = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val r = s.readStream.schema(sch)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir).as[DocIn]
  }

  /** The LLM-PIPELINE live loop: document firehose → ingest-time MinHash
    * near-dup dedup ([[streamingMinhashDedup]]) → an incrementally
    * upserted DEDUP REGISTRY serving table (doc_id, is_dup, dup_of).
    * A doc's verdict is final at its own arrival batch (bucket owners are
    * first-arrival and never change), so the registry upsert is
    * append-stable and each batch's work is O(batch docs). The clean
    * corpus is then a registry anti-join away
    * (`Search.registerCleanCorpus`), searchable while the stream runs —
    * the events-loop recipe ([[liveServingLoop]]) carried to the
    * training-data pipeline. Requires the RocksDB state store provider
    * (transformWithState). Proven live in LiveDedupLoopSpec: mid-stream
    * clean-corpus searches equal the batch dedup recompute over exactly
    * the docs ingested so far. */
  def cleanCorpusLoop(s: SparkSession, ingestDir: String, registryTable: String,
                      maxFilesPerTrigger: Option[Int] = None) =
    streamingMinhashDedup(s, ingestDocs(s, ingestDir, maxFilesPerTrigger))
      .writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, registryTable, Seq("doc_id"))
      }

  // ---- log-template NOVELTY alerting (live-ops marquee) ----------------

  case class TemplateEvent(template: String, ts: Timestamp, event_id: Long)
  case class NoveltyAlert(template: String, first_ts: Timestamp,
                          first_event_id: Long)

  /** Drain-style template id for the events firehose: message =
    * `event_type + " " + props`, numeric runs of ≥3 digits normalized to
    * `<n>`. The split is the miner's low-cardinality-token rule: long
    * digit runs are ids/sizes/timestamps (variable slots), short runs
    * are status/error codes that BELONG to the template — the same
    * normalization family as the batch miner q_report_log_templates
    * (which ALSO folds dotted IPs; events props carry none). One shared
    * Column feeds the batch twin and the stream side, so the parity
    * check compares two engines over ONE template definition. */
  val templateExpr: org.apache.spark.sql.Column =
    regexp_replace(concat(col("event_type"), lit(" "),
      coalesce(col("props"), lit(""))), "\\d{3,}", "<n>")

  /** events (with `props`) → typed template stream rows. */
  def templateEvents(s: SparkSession, events: DataFrame): Dataset[TemplateEvent] = {
    import s.implicits._
    events.select(templateExpr.as("template"), col("ts"), col("event_id"))
      .as[TemplateEvent]
  }

  /** Seen-template set as keyed state: the grouping key IS the set
    * member, so membership = "this key has state", and the whole set is
    * sharded across the cluster instead of broadcast — O(distinct
    * templates) state total, never O(events). The state value is the
    * running occurrence count (free observability), and updating it
    * every batch refreshes the optional TTL: with a TTL configured, a
    * template must go COMPLETELY silent for the TTL window before its
    * reappearance re-alerts — "seen recently", the operationally right
    * set for a pager (a template last seen 30 days ago IS news), and
    * what keeps state bounded by the active-template window on an
    * unbounded log firehose. */
  class TemplateNoveltyProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, TemplateEvent, NoveltyAlert] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[TemplateEvent],
                                 timerValues: TimerValues): Iterator[NoveltyAlert] = {
      val novel = !seen.exists()
      val prior = if (novel) 0L else seen.get()
      var first: TemplateEvent = null
      var n = 0L
      rows.foreach { e =>
        n += 1
        if (first == null || e.ts.getTime < first.ts.getTime ||
            (e.ts.getTime == first.ts.getTime && e.event_id < first.event_id))
          first = e
      }
      seen.update(prior + n)
      if (novel) Iterator.single(NoveltyAlert(key, first.ts, first.event_id))
      else Iterator.empty
    }
  }

  /** Template-novelty alerts over a typed template stream: one Append-
    * mode alert row the first time each template id is seen (and, with
    * `ttl` set, again after a full TTL of silence). First-ARRIVAL
    * semantics with the in-batch tie broken by min(ts, event_id) — under
    * event-ordered arrival this equals the batch statement
    * [[batchTemplateFirsts]] row-for-row (the parity contract; late data
    * re-ordering across batches would need the watermark variant, same
    * caveat as the minhash dedup owner). TTL requires processing-time
    * semantics; the TTL-free instance runs TimeMode.None for
    * deterministic drains. */
  def noveltyAlerts(s: SparkSession, templated: Dataset[TemplateEvent],
                    ttl: Option[java.time.Duration] = None): Dataset[NoveltyAlert] = {
    import s.implicits._
    templated.groupByKey(_.template)
      .transformWithState(
        new TemplateNoveltyProcessor(ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** The batch statement of the SAME rule: each template's first
    * occurrence by (ts, event_id) — one map-side-combinable struct-min
    * aggregate, the plan you'd run over 100 TB of archived logs to
    * bootstrap the seen-set before attaching the stream. */
  def batchTemplateFirsts(events: DataFrame): DataFrame =
    events
      .select(templateExpr.as("template"),
        struct(col("ts").as("ts"), col("event_id").as("event_id")).as("occ"))
      .groupBy("template")
      .agg(min(col("occ")).as("f"))
      .select(col("template"), col("f.ts").as("first_ts"),
        col("f.event_id").as("first_event_id"))

  /** The batch statement of the SAME dedup rule: bucket owner =
    * min(struct(ts, doc_id)) per band bucket; a doc is a dup iff any of
    * its buckets' owner isn't itself. Used by StreamParity to prove the
    * ingest-time path emits row-for-row what the batch path computes. */
  def batchMinhashDedup(docs: Dataset[DocIn]): DataFrame = {
    val bands = minhashBands(docs)
    val owners = bands.groupBy("bkey")
      .agg(min(struct(col("ts"), col("doc_id"))).as("o"))
      .select(col("bkey"), col("o.doc_id").as("owner"))
    bands.join(owners, "bkey")
      .groupBy("doc_id")
      .agg(min(when(col("owner") =!= col("doc_id"), col("owner"))).as("dup_of"))
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
  }
}
