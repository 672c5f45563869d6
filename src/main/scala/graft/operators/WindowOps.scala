package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T5 — window functions + sessionization (SURVEY §2 T5).
  *
  * Window order keys always use second-truncated event time plus the unique
  * `event_id` tiebreaker so both engines rank identically (SURVEY §A-3.3);
  * windowed float sums go through exact decimals (order-independent) before
  * being emitted as doubles.
  *
  * Scale notes: a window over `partitionBy(user_id)` shuffles once on the
  * partition key and sorts within partitions — the same plan a 1000-executor
  * cluster runs; skewed users are the one hazard (AQE skew handling or
  * salting if a single user exceeds an executor's sort buffer).
  */
object WindowOps {

  private def eventsTs(s: SparkSession, sf: String): DataFrame =
    Tables.events(s, sf).withColumn("ts_s", date_trunc("second", col("ts")))

  private def decSum(c: Column): Column = c.cast(DecimalType(30, 6))

  private val byUserTime = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
  private val byUserValue = Window.partitionBy("user_id").orderBy(col("value"), col("event_id"))

  /** Union-of-intervals coverage SQL shared across engines (`epoch` =
    * `unix_timestamp` / `epoch`). Each event opens a value-scaled session
    * interval; overlapping intervals merge via gaps-and-islands (running
    * max of prior ends per user — a new island starts when s > that max;
    * within an island the union is one contiguous segment, so coverage =
    * max(e) − min(s)). Both windows are PARTITION BY user_id — parallel
    * across users at 100 TB — and all arithmetic is BIGINT epoch seconds
    * (one shared-double floor for the duration), so the ledger is
    * bit-identical across engines. DuckDB windowed/grouped SUMs return
    * HUGEINT → cast back to BIGINT everywhere. */
  private def intervalsCoverageSql(epoch: String): String =
    s"""WITH iv AS (SELECT user_id, event_id,
       |        CAST($epoch(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS BIGINT) AS s,
       |        least(greatest(CAST(floor(coalesce(value, CAST(0.0 AS DOUBLE)) * 60.0)
       |            AS BIGINT), CAST(0 AS BIGINT)), 3600) + 60 AS dur
       |      FROM events),
       |p AS (SELECT user_id, event_id, s, s + dur AS e,
       |        max(s + dur) OVER (PARTITION BY user_id ORDER BY s, s + dur, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       |      FROM iv),
       |f AS (SELECT user_id, event_id, s, e,
       |        CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS new_isl
       |      FROM p),
       |g AS (SELECT user_id, s, e,
       |        CAST(sum(new_isl) OVER (PARTITION BY user_id ORDER BY s, e, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS isl
       |      FROM f),
       |i AS (SELECT user_id, isl, CAST(count(*) AS BIGINT) AS cnt,
       |        CAST(min(s) AS BIGINT) AS s0, CAST(max(e) AS BIGINT) AS e1
       |      FROM g GROUP BY user_id, isl)
       |SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_intervals,
       |  CAST(count(*) AS BIGINT) AS n_islands,
       |  CAST(sum(e1 - s0) AS BIGINT) AS covered_s
       |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Hourly OHLC resample per event_type — the candle/downsample readout
    * every metric store serves (open/close = deterministic first/last by
    * (second-truncated ts, event_id); high/low = min/max). One shared
    * text in both engines: the first/last picks are rank-1 filters over
    * (type, hour)-partitioned windows — per-partition top-1, fully
    * parallel, no global sort; values pass through untouched (shared
    * doubles), so the whole row hashes exactly. */
  private val ohlcSql: String =
    """WITH e AS (SELECT event_type,
      |        CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
      |        CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss,
      |        event_id, value
      |      FROM events WHERE value IS NOT NULL),
      |r AS (SELECT event_type, hr, value,
      |        row_number() OVER (PARTITION BY event_type, hr
      |          ORDER BY tss, event_id) AS ra,
      |        row_number() OVER (PARTITION BY event_type, hr
      |          ORDER BY tss DESC, event_id DESC) AS rd
      |      FROM e)
      |SELECT event_type, hr,
      |  max(CASE WHEN ra = 1 THEN value END) AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(CASE WHEN rd = 1 THEN value END) AS close,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM r GROUP BY event_type, hr
      |ORDER BY event_type, hr""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hourly OHLC candles per event_type.
    "q_win_ohlc" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(ohlcSql)
    }),

    // Total busy time per user after merging overlapping session
    // intervals — the classic union-of-intervals readout (how long was
    // each user actually active, counting overlaps once) that billing /
    // utilization reports need and a plain sum of durations overstates.
    "q_intervals_coverage" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(intervalsCoverageSql(epoch = "unix_timestamp"))
    }),

    "q_win_rank" -> ((s, sf) => {
      val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
      eventsTs(s, sf)
        .select(
          col("user_id"), col("event_id"), col("value"),
          row_number().over(w).cast(LongType).as("rn"),
          rank().over(w).cast(LongType).as("rnk"),
          dense_rank().over(w).cast(LongType).as("drnk"))
        .orderBy("user_id", "rn")
    }),

    "q_win_lag_lead" -> ((s, sf) =>
      eventsTs(s, sf)
        .select(
          col("user_id"), col("event_id"),
          (unix_timestamp(col("ts_s")) - unix_timestamp(lag(col("ts_s"), 1).over(byUserTime)))
            .as("gap_s"),
          lead(col("event_type"), 1).over(byUserTime).as("next_type"))
        .orderBy("user_id", "event_id")),

    "q_win_running" -> ((s, sf) =>
      eventsTs(s, sf)
        .select(
          col("user_id"), col("event_id"),
          sum(decSum(col("value")))
            .over(byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType).as("running_value"))
        .orderBy("user_id", "event_id")),

    "q_win_sliding_frame" -> ((s, sf) => {
      val frame = byUserTime.rowsBetween(-9, Window.currentRow)
      eventsTs(s, sf)
        .select(
          col("user_id"), col("event_id"),
          (sum(decSum(col("value"))).over(frame).cast(DoubleType) /
            count(lit(1)).over(frame)).as("mov_avg_10"))
        .orderBy("user_id", "event_id")
    }),

    "q_win_range_frame" -> ((s, sf) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-2419200L, 0L) // 28 days in seconds
      Tables.orders(s, sf)
        .select(
          col("o_orderkey"), col("o_custkey"),
          sum(col("o_totalprice").cast(DecimalType(30, 6))).over(w)
            .cast(DoubleType).as("rev_4w"))
        .orderBy("o_orderkey")
    }),

    // Native INTERVAL range frame over the timestamp ordering column —
    // the time-windowed rolling count without the unix_timestamp detour
    // q_win_range_frame uses (both surfaces matter: numeric range frames
    // and calendar-interval frames take different code paths in both
    // engines). Partitioned per user: fully distributed; the frame is
    // evaluated by a running two-pointer over each partition's sort, so
    // cost is O(rows), never O(rows × frame).
    "q_win_interval_range" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(intervalRangeSql)
    }),

    "q_win_ntile_first_last" -> ((s, sf) => {
      val full = byUserValue.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      eventsTs(s, sf)
        .select(
          col("user_id"), col("event_id"),
          ntile(4).over(byUserValue).cast(LongType).as("quartile"),
          first_value(col("value")).over(full).as("min_v"),
          last_value(col("value")).over(full).as("max_v"),
          nth_value(col("value"), 2).over(full).as("second_v"))
        .orderBy("user_id", "event_id")
    }),

    // Native session_window in batch mode, oracle-checked against the
    // MANUAL gap-session construction in DuckDB — proving the built-in
    // operator implements exactly the 30-min-gap definition.
    "q_session_window_native" -> ((s, sf) =>
      eventsTs(s, sf)
        .groupBy(session_window(col("ts_s"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("n_events"))
        .orderBy("user_id", "s_start")),

    // Dynamic gap duration: error events time out after 10 minutes, the
    // rest after 30 — the session boundary is a per-event expression, so
    // the merged session end is max(tsᵢ + gapᵢ), not last + constant.
    // Oracle mirrors with a running-max-of-ends rule (an event extends the
    // session iff ts <= max end so far; closed interval per the
    // session_window boundary semantics pinned in OperatorSpec).
    "q_session_window_dynamic" -> ((s, sf) =>
      eventsTs(s, sf)
        .groupBy(
          session_window(col("ts_s"),
            when(col("event_type") === "error", lit("10 minutes"))
              .otherwise(lit("30 minutes"))),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("n_events"))
        .orderBy("user_id", "s_start")),

    "q_sessionize" -> ((s, sf) => {
      val gap = unix_timestamp(col("ts_s")) - unix_timestamp(lag(col("ts_s"), 1).over(byUserTime))
      eventsTs(s, sf)
        .withColumn("new_sess",
          when(gap.isNull || gap > 1800, lit(1L)).otherwise(lit(0L)))
        .withColumn("session_id",
          sum(col("new_sess")).over(byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts_s")).as("session_start"),
          max(col("ts_s")).as("session_end"))
        .orderBy("user_id", "session_id")
    }),

    // Running DISTINCT count over a window: Spark has no count(DISTINCT)
    // window form, so the distributed workaround is size(collect_set() OVER
    // running-frame) — set semantics make the SIZE order-independent even
    // though collect order isn't. The oracle uses DuckDB's native
    // count(DISTINCT) OVER, proving the rewrite's equivalence rather than
    // mirroring it.
    "q_win_distinct_running" -> ((s, sf) =>
      eventsTs(s, sf)
        .withColumn("n_types_seen",
          size(collect_set(col("event_type")).over(
            byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .cast(LongType))
        .select("user_id", "event_id", "n_types_seen")
        .orderBy("user_id", "event_id")),

    // Time-series resample + gap-fill: regularize each user's event stream
    // onto an hourly spine (sequence() + explode between the user's first
    // and last active hour), left-join the observed per-hour aggregates,
    // and forward-fill gaps with last_value(... IGNORE NULLS). The spine is
    // generated per key, so its size is bounded by Σ per-key spans — no
    // global cross join ever materializes; at cluster scale the spine
    // explode, join and window all co-partition on user_id (one shuffle
    // chain). Hourly means are decimal-exact then rounded, so both engines
    // agree bit-for-bit. Scoped to the user_id % 50 == 0 slice to keep the
    // oracle compare bounded — the plan is slice-size-independent.
    "q_resample_gapfill" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events_gapfill")
      s.sql(
        """WITH e AS (SELECT user_id, date_trunc('HOUR', ts) AS h, value
          |           FROM events_gapfill WHERE user_id % 50 = 0),
          |obs AS (SELECT user_id, h, count(*) AS n_events,
          |          round(CAST(sum(CAST(value AS DECIMAL(30,12))) AS DOUBLE) / count(*), 6) AS v
          |        FROM e GROUP BY user_id, h),
          |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY user_id),
          |spine AS (SELECT user_id, explode(sequence(h0, h1, interval 1 hour)) AS h FROM span),
          |j AS (SELECT s.user_id, s.h, coalesce(o.n_events, CAST(0 AS BIGINT)) AS n_events, o.v
          |      FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h)
          |SELECT user_id, h, n_events,
          |  last_value(v, true) OVER (PARTITION BY user_id ORDER BY h
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill,
          |  (n_events = CAST(0 AS BIGINT)) AS is_gap
          |FROM j ORDER BY user_id, h""".stripMargin)
    }),

    // SCD2 dimension history: compress each user's event_type stream into
    // validity intervals (valid_from, valid_to, is_current) — the
    // slowly-changing-dimension build a warehouse load runs over change
    // logs. Change rows = rows whose type differs from the previous row
    // (lag); interval end = next change's start (lead). Both windows
    // partition on user_id with the same (ts_s, event_id) order, so the
    // second window reuses the first's exchange AND sort — one shuffle
    // total (verified: single Exchange in the plan).
    "q_scd2_intervals" -> ((s, sf) => {
      val changed = eventsTs(s, sf)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts_s"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(byUserTime))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      changed.select(
          col("user_id"),
          row_number().over(byUserTime).cast(LongType).as("version"),
          col("event_type"),
          col("ts_s").as("valid_from"),
          lead(col("ts_s"), 1).over(byUserTime).as("valid_to"),
          lead(col("ts_s"), 1).over(byUserTime).isNull.as("is_current"))
        .orderBy("user_id", "version")
    }),

    // Run-length compression of the per-user event stream (log
    // compaction): consecutive rows with the same event_type collapse to
    // one row carrying the run length and start. Change flag (lag) →
    // running sum = run id → groupBy(user_id, run_id). The groupBy needs
    // NO new shuffle: HashPartitioning(user_id) from the window satisfies
    // the (user_id, run_id) clustered distribution because its keys are a
    // subset of the grouping keys.
    "q_compress_runs" -> ((s, sf) =>
      eventsTs(s, sf)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts_s"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(byUserTime).isNull ||
               lag(col("event_type"), 1).over(byUserTime) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("run_id",
          sum(col("chg")).over(byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("run_id"), col("event_type"))
        .agg(count(lit(1)).as("run_len"),
          min(col("ts_s")).as("run_start"),
          min(col("event_id")).as("first_event_id"))
        .orderBy("user_id", "run_id")),

    // IGNORE NULLS window semantics: carry-forward (last_value) and
    // previous-non-null (lag) over a sparsely-observed column — the
    // sensor-reading/sparse-attribute pattern where plain lag/last_value
    // would return the adjacent NULL instead of the last observation.
    // Null positions are derived deterministically (event_id % 3) so both
    // engines see the same sparsity.
    "q_win_ignore_nulls" -> ((s, sf) =>
      eventsTs(s, sf)
        .withColumn("obs", when(col("event_id") % 3 === 0, lit(null).cast(DoubleType))
          .otherwise(col("value")))
        .select(
          col("user_id"), col("event_id"), col("obs"),
          last(col("obs"), ignoreNulls = true)
            .over(byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("carried"),
          lag(col("obs"), 1, null, ignoreNulls = true).over(byUserTime)
            .as("prev_obs"))
        .orderBy("user_id", "event_id")),

    // Batch-mode tumbling window(): the SAME `window(ts, '15 minutes')`
    // primitive Structured Streaming aggregates on, run over the batch
    // corpus — one groupBy on the derived window struct, with start/end
    // emitted. Proves batch/stream unification: this plan and the
    // streaming tumbling count share the grouping expression; only the
    // source differs. Oracle mirrors the epoch-floor bucketing rule.
    "q_win_tumbling_batch" -> ((s, sf) =>
      Tables.events(s, sf)
        .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("window.start").as("w_start"),
          col("window.end").as("w_end"),
          col("event_type"), col("n_events"))
        .orderBy("w_start", "event_type")),

    // Threshold alerting with interval merge (gaps-and-islands): flag
    // 5-minute windows whose error count exceeds the threshold, then
    // merge ADJACENT hot windows into one alert interval — the
    // "condition persisted from t0 to t1" output a monitor pages on, not
    // one row per window. Islands come from the classic bucket−row_number
    // group key; everything after the tiny windowed aggregate runs on the
    // aggregated series (distinct 5-min buckets), so the unpartitioned
    // windows are bounded exactly like q_events_rate.
    "q_alert_intervals" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events_alert")
      s.sql(
        """WITH w AS (
          |  SELECT CAST(floor(unix_timestamp(ts) / 300) AS BIGINT) AS b,
          |    count(*) AS n_err
          |  FROM events_alert WHERE event_type = 'error'
          |  GROUP BY 1),
          |hot AS (SELECT b, n_err FROM w WHERE n_err >= 3),
          |isl AS (SELECT b, n_err,
          |          b - row_number() OVER (ORDER BY b) AS grp
          |        FROM hot)
          |SELECT CAST(to_timestamp(min(b) * 300) AS TIMESTAMP) AS alert_start,
          |  CAST(to_timestamp((max(b) + 1) * 300) AS TIMESTAMP) AS alert_end,
          |  CAST(count(*) AS BIGINT) AS n_windows,
          |  CAST(sum(n_err) AS BIGINT) AS total_errors
          |FROM isl GROUP BY grp
          |ORDER BY alert_start""".stripMargin)
    }),

    // Event-rate series with first differences: per-minute global counts,
    // then delta vs the previous minute (lag over the aggregated series).
    // The unpartitioned window is safe BECAUSE it runs over the aggregate,
    // not the events: cardinality = distinct minutes (a year of minutes is
    // ~526k rows — one task's worth), while the heavy groupBy below it is
    // fully parallel. Never window an unaggregated stream without a
    // partition key.
    "q_events_rate" -> ((s, sf) => {
      val w = Window.orderBy("minute")
      Tables.events(s, sf)
        .groupBy(date_trunc("minute", col("ts")).as("minute"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("minute"), col("n_events"),
          (col("n_events") - coalesce(lag(col("n_events"), 1).over(w), lit(0L))).as("delta"))
        .orderBy("minute")
    }),

    // Windowed exponentially-weighted moving average (decay 0.9 over the
    // last 20 rows) per user — the standard log-metric smoother for burst /
    // drift detection. Exact EWMA is a sequential recurrence (y_t depends
    // on y_{t-1}), which doesn't distribute; the bounded-window form is the
    // scalable equivalent (the weight tail beyond 20 rows is 0.9^20 ≈ 0.12
    // of one row's weight) and is what metric pipelines actually ship.
    // All 20 lag terms share ONE window spec → a single Window operator,
    // one shuffle on user_id. Determinism: the decay weights are Scala
    // double literals rendered at full precision (no engine libm pow
    // drift), and the term order is fixed in the generated expression, so
    // both engines evaluate the identical IEEE expression tree.
    "q_win_ewma" -> ((s, sf) => {
      val terms = (0 until ewmaK).map { k =>
        val v = if (k == 0) col("value") else lag(col("value"), k).over(byUserTime)
        val wt = lit(ewmaW(k))
        (coalesce(v * wt, lit(0.0)), when(v.isNotNull, wt).otherwise(lit(0.0)))
      }
      val num = terms.map(_._1).reduce(_ + _)
      val den = terms.map(_._2).reduce(_ + _)
      eventsTs(s, sf)
        .select(col("user_id"), col("event_id"), col("value"),
          round(num / den, 6).as("ewma"))
        .orderBy("user_id", "event_id")
    }),

    // First-order Markov transition matrix over the per-user event stream
    // (lead + pair counts + row-normalized probabilities) — the classic
    // "what follows what" user-behavior / log-sequence model. One window
    // shuffle on user_id for the lead, one tiny (from, to) aggregate, and
    // the normalizer is a window over the 25-row result — nothing touches
    // the corpus twice.
    "q_events_markov" -> ((s, sf) => {
      eventsTs(s, sf).createOrReplaceTempView("ev")
      s.sql(
        """WITH st AS (SELECT user_id, event_type,
          |              lead(event_type) OVER (PARTITION BY user_id
          |                ORDER BY ts_s, event_id) AS next_type
          |            FROM ev)
          |SELECT event_type AS from_type, next_type AS to_type,
          |  count(*) AS n,
          |  round(count(*) / sum(count(*)) OVER (PARTITION BY event_type), 6) AS p
          |FROM st WHERE next_type IS NOT NULL
          |GROUP BY event_type, next_type
          |ORDER BY from_type, to_type""".stripMargin)
    }),

    // Longest consecutive-day activity streak per user — gaps-and-islands
    // on the day grain keyed by (day_number − row_number), the constant-
    // per-run identity. Two small aggregates after the distinct; the
    // per-user sort is bounded by days, not events.
    "q_win_streaks" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(
        """WITH d AS (SELECT DISTINCT user_id,
          |             CAST(date_trunc('day', ts) AS DATE) AS day
          |           FROM events),
          |g AS (SELECT user_id, day,
          |        datediff(day, DATE '2024-01-01')
          |          - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
          |      FROM d),
          |s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp)
          |SELECT user_id, max(len) AS max_streak, count(*) AS n_streaks
          |FROM s GROUP BY user_id
          |ORDER BY user_id""".stripMargin)
    }),

    // Clickstream PATHING: top 3-step event sequences across all users
    // (the "what journeys happen most" report; the 3-gram big sibling of
    // q_events_markov's 1-step matrix). Two leads share the markov window;
    // the path space is |types|³ = 125, so the aggregate is tiny and the
    // top-15 is a TakeOrdered, not a full sort.
    "q_events_pathing" -> ((s, sf) => {
      eventsTs(s, sf).createOrReplaceTempView("ev")
      s.sql(
        """WITH s AS (SELECT user_id, event_type AS e1,
          |             lead(event_type, 1) OVER w AS e2,
          |             lead(event_type, 2) OVER w AS e3
          |           FROM ev
          |           WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id))
          |SELECT concat_ws(' > ', e1, e2, e3) AS path, count(*) AS n
          |FROM s WHERE e3 IS NOT NULL
          |GROUP BY 1
          |ORDER BY n DESC, path
          |LIMIT 15""".stripMargin)
    }),

    // Exact sliding MEDIAN over the trailing 11 rows — the robust
    // (outlier-immune) twin of the sliding mean in q_win_sliding_frame.
    // Exact small-window medians via a sorted frame collect are the
    // per-key scalable form (the frame is O(11)); global/large-window
    // medians go through approx_percentile instead. The median is an
    // actual input element (lower median for even frames in BOTH
    // engines), so no float arithmetic or rounding is involved at all.
    "q_win_median_sliding" -> ((s, sf) => {
      eventsTs(s, sf).createOrReplaceTempView("ev")
      s.sql(
        """WITH a AS (SELECT user_id, event_id, value,
          |             sort_array(collect_list(value) OVER (PARTITION BY user_id
          |               ORDER BY ts_s, event_id
          |               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) AS arr
          |           FROM ev)
          |SELECT user_id, event_id, value,
          |  element_at(arr, CAST((size(arr) + 1) div 2 AS INT)) AS med
          |FROM a ORDER BY user_id, event_id""".stripMargin)
    }),

    // Rolling 24h Pearson correlation between the click and purchase
    // hourly rates — the co-movement monitor. The hourly series is
    // DENSIFIED onto a full calendar-hour spine (zero-activity hours
    // become x=0,y=0 rows) so the ROWS 23 PRECEDING frame really spans
    // 24 calendar hours on gappy data — without the spine the frame
    // silently stretched over inactive gaps. Every window statistic
    // (n, Σx, Σy, Σxy, Σx², Σy²) is an INTEGER window sum over hourly
    // counts, so the correlation doubles are engine-identical; the SQL
    // differs between engines ONLY in the spine generator (Spark
    // explode(sequence(...)), DuckDB unnest(generate_series(...))) —
    // everything else is the same text, and the gate proves equivalence.
    "q_win_rolling_corr" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(rollingCorrSql)
    }),

    // Max drawdown per user over the running value total — the
    // running-extreme window pair (cumulative sum, then cumulative max of
    // that, then the max gap). Sums stay DECIMAL through both windows so
    // the running prefix is exact and engine-identical; order is
    // (second-truncated ts, event_id) per the file's tie-order contract.
    // One window partition per user — the per-key sequential scan shape
    // that scales horizontally at any user count.
    "q_win_drawdown" -> ((s, sf) => {
      eventsTs(s, sf).createOrReplaceTempView("ev")
      s.sql(
        """WITH c AS (SELECT user_id, ts_s, event_id,
          |             SUM(CAST(value AS DECIMAL(30,6))) OVER (
          |               PARTITION BY user_id ORDER BY ts_s, event_id
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          |           FROM ev),
          |r AS (SELECT user_id, cum,
          |        MAX(cum) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
          |      FROM c)
          |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          |  round(CAST(max(peak - cum) AS DOUBLE), 6) AS max_drawdown
          |FROM r GROUP BY user_id
          |ORDER BY user_id""".stripMargin)
    })
  )

  /** Decay weights 0.9^k as full-precision literals — shared by the Spark
    * expression tree and the oracle SQL so both engines see bit-identical
    * constants instead of calling their own `pow`. */
  private val ewmaK = 20
  private val ewmaW: IndexedSeq[Double] =
    (0 until ewmaK).map(k => math.pow(0.9, k))
  private def ewmaLit(d: Double): String = {
    val s = java.math.BigDecimal.valueOf(d).toPlainString
    if (s.contains('.')) s else s + ".0"
  }

  private val oracleTs = "CAST(date_trunc('second', ts) AS TIMESTAMP)"

  /** Rolling-correlation statement — identical text in both engines. */
  /** Rolling-correlation statement, parameterized ONLY on the hour-spine
    * generator (the one construct with no shared spelling across
    * engines). Zero-activity hours join as x=0,y=0 so the 24-row frame
    * is 24 calendar hours even on gappy series. */
  private def rollingCorrSqlWith(spine: String): String =
    s"""WITH h AS (SELECT date_trunc('hour', ts) AS hr,
       |        sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
       |        sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
       |      FROM events GROUP BY date_trunc('hour', ts)),
       |b AS (SELECT min(hr) AS mn, max(hr) AS mx FROM h),
       |spine AS ($spine),
       |hd AS (SELECT s.hr, coalesce(h.x, 0) AS x, coalesce(h.y, 0) AS y
       |       FROM spine s LEFT JOIN h ON s.hr = h.hr),
       |w AS (SELECT hr, x, y,
       |        count(*) OVER win AS n,
       |        sum(x) OVER win AS sx, sum(y) OVER win AS sy,
       |        sum(x * y) OVER win AS sxy,
       |        sum(x * x) OVER win AS sxx, sum(y * y) OVER win AS syy
       |      FROM hd
       |      WINDOW win AS (ORDER BY hr ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
       |SELECT CAST(hr AS TIMESTAMP) AS hr, CAST(n AS BIGINT) AS n_hours,
       |  round((n * sxy - sx * sy) /
       |        nullif(sqrt((n * sxx - sx * sx) * CAST(n * syy - sy * sy AS DOUBLE)), 0.0),
       |        6) AS corr_24h
       |FROM w WHERE n = 24 ORDER BY hr""".stripMargin

  private[graft] val rollingCorrSql: String = rollingCorrSqlWith(
    "SELECT explode(sequence(mn, mx, interval 1 hour)) AS hr FROM b")

  private[graft] val rollingCorrOracleSql: String = rollingCorrSqlWith(
    "SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr FROM b")

  /** INTERVAL range-frame SQL, identical in both engines. */
  private val intervalRangeSql: String =
    """SELECT user_id, event_id,
      |  count(*) OVER (PARTITION BY user_id ORDER BY ts
      |                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
      |                           AND CURRENT ROW) AS cnt_1h
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_intervals_coverage" -> intervalsCoverageSql(epoch = "epoch"),
    "q_win_ohlc" -> ohlcSql,
    "q_win_interval_range" -> intervalRangeSql,
    "q_win_rank" ->
      """SELECT user_id, event_id, value,
        |  row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        |ORDER BY user_id, rn""".stripMargin,

    "q_win_lag_lead" ->
      s"""SELECT user_id, event_id,
         |  CAST(epoch($oracleTs) - epoch(lag($oracleTs, 1) OVER w) AS BIGINT) AS gap_s,
         |  lead(event_type, 1) OVER w AS next_type
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY $oracleTs, event_id)
         |ORDER BY user_id, event_id""".stripMargin,

    "q_win_running" ->
      s"""SELECT user_id, event_id,
         |  CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER
         |    (PARTITION BY user_id ORDER BY $oracleTs, event_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
         |FROM events
         |ORDER BY user_id, event_id""".stripMargin,

    "q_win_sliding_frame" ->
      s"""SELECT user_id, event_id,
         |  CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE)
         |    / COUNT(*) OVER w AS mov_avg_10
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY $oracleTs, event_id
         |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, event_id""".stripMargin,

    "q_win_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER
        |    (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |     RANGE BETWEEN 2419200 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_4w
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q_win_ntile_first_last" ->
      """SELECT user_id, event_id,
        |  ntile(4) OVER wv AS quartile,
        |  first_value(value) OVER wf AS min_v,
        |  last_value(value) OVER wf AS max_v,
        |  nth_value(value, 2) OVER wf AS second_v
        |FROM events
        |WINDOW wv AS (PARTITION BY user_id ORDER BY value, event_id),
        |       wf AS (PARTITION BY user_id ORDER BY value, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,

    // NOTE the > 1800 boundary: Spark's session_window interval is CLOSED
    // at the end — an event at exactly last+gap still extends the session
    // (verified empirically on Spark 4.1.2: two events 1800 s apart with a
    // 30-minute gap produce ONE session; regression-tested in
    // OperatorSpec "session_window merges an exactly-gap-length interval").
    // So the manual-gap oracle starts a new session only for gap > 1800,
    // same as q_sessionize. An sf0.1 event pair sits exactly on this
    // boundary, so the gate itself exercises it.
    "q_session_window_native" ->
      s"""WITH g AS (
         |  SELECT user_id, event_id, $oracleTs AS ts_s,
         |    CASE WHEN lag($oracleTs, 1) OVER w IS NULL
         |           OR epoch($oracleTs) - epoch(lag($oracleTs, 1) OVER w) > 1800
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY $oracleTs, event_id)
         |), sess AS (
         |  SELECT user_id, ts_s,
         |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM g)
         |SELECT user_id, min(ts_s) AS s_start,
         |  max(ts_s) + INTERVAL 30 MINUTES AS s_end,
         |  count(*) AS n_events
         |FROM sess
         |GROUP BY user_id, session_id
         |ORDER BY user_id, s_start""".stripMargin,

    "q_session_window_dynamic" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, $oracleTs AS ts_s,
         |    CASE WHEN event_type = 'error' THEN 600 ELSE 1800 END AS g
         |  FROM events),
         |w AS (SELECT *, max(epoch(ts_s) + g) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM e),
         |s AS (SELECT *, CASE WHEN prev_end IS NULL OR epoch(ts_s) > prev_end
         |        THEN 1 ELSE 0 END AS new_sess FROM w),
         |sid AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM s)
         |SELECT user_id, min(ts_s) AS s_start,
         |  max(ts_s + INTERVAL (g) SECOND) AS s_end,
         |  count(*) AS n_events
         |FROM sid GROUP BY user_id, session_id
         |ORDER BY user_id, s_start""".stripMargin,

    "q_sessionize" ->
      s"""WITH g AS (
         |  SELECT user_id, event_id, $oracleTs AS ts_s,
         |    CASE WHEN lag($oracleTs, 1) OVER w IS NULL
         |           OR epoch($oracleTs) - epoch(lag($oracleTs, 1) OVER w) > 1800
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY $oracleTs, event_id)
         |), sess AS (
         |  SELECT user_id, event_id, ts_s,
         |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM g)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  min(ts_s) AS session_start, max(ts_s) AS session_end
         |FROM sess
         |GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    "q_win_distinct_running" ->
      s"""SELECT user_id, event_id,
         |  count(DISTINCT event_type) OVER (PARTITION BY user_id
         |    ORDER BY $oracleTs, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_types_seen
         |FROM events
         |ORDER BY user_id, event_id""".stripMargin,

    "q_resample_gapfill" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h, value
        |           FROM events WHERE user_id % 50 = 0),
        |obs AS (SELECT user_id, h, count(*) AS n_events,
        |          round(CAST(sum(CAST(value AS DECIMAL(30,12))) AS DOUBLE) / count(*), 6) AS v
        |        FROM e GROUP BY user_id, h),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY user_id),
        |spine AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM span),
        |j AS (SELECT s.user_id, s.h, coalesce(o.n_events, 0) AS n_events, o.v
        |      FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h)
        |SELECT user_id, CAST(h AS TIMESTAMP) AS h, n_events,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill,
        |  (n_events = 0) AS is_gap
        |FROM j ORDER BY user_id, h""".stripMargin,

    "q_scd2_intervals" ->
      s"""WITH c AS (
         |  SELECT user_id, event_id, event_type, $oracleTs AS ts_s,
         |    lag(event_type, 1) OVER (PARTITION BY user_id
         |      ORDER BY $oracleTs, event_id) AS prev_type
         |  FROM events),
         |ch AS (SELECT * FROM c WHERE prev_type IS NULL OR prev_type <> event_type)
         |SELECT user_id,
         |  row_number() OVER w AS version,
         |  event_type,
         |  ts_s AS valid_from,
         |  lead(ts_s, 1) OVER w AS valid_to,
         |  (lead(ts_s, 1) OVER w IS NULL) AS is_current
         |FROM ch
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
         |ORDER BY user_id, version""".stripMargin,

    "q_compress_runs" ->
      s"""WITH f AS (
         |  SELECT user_id, event_id, event_type, $oracleTs AS ts_s,
         |    CASE WHEN lag(event_type, 1) OVER w IS NULL
         |           OR lag(event_type, 1) OVER w <> event_type
         |         THEN 1 ELSE 0 END AS chg
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY $oracleTs, event_id)),
         |r AS (
         |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
         |  FROM f)
         |SELECT user_id, run_id, event_type, count(*) AS run_len,
         |  min(ts_s) AS run_start, min(event_id) AS first_event_id
         |FROM r
         |GROUP BY user_id, run_id, event_type
         |ORDER BY user_id, run_id""".stripMargin,

    "q_win_ignore_nulls" ->
      s"""WITH o AS (
         |  SELECT user_id, event_id, $oracleTs AS ts_s,
         |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS obs
         |  FROM events)
         |SELECT user_id, event_id, obs,
         |  last_value(obs IGNORE NULLS) OVER (PARTITION BY user_id
         |    ORDER BY ts_s, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried,
         |  lag(obs IGNORE NULLS) OVER (PARTITION BY user_id
         |    ORDER BY ts_s, event_id) AS prev_obs
         |FROM o ORDER BY user_id, event_id""".stripMargin,

    "q_win_tumbling_batch" ->
      """WITH b AS (
        |  SELECT CAST(to_timestamp(floor(epoch(ts) / 900) * 900) AS TIMESTAMP) AS w_start,
        |    event_type
        |  FROM events)
        |SELECT w_start, w_start + INTERVAL 15 MINUTE AS w_end,
        |  event_type, count(*) AS n_events
        |FROM b GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,

    "q_alert_intervals" ->
      """WITH w AS (
        |  SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS b,
        |    count(*) AS n_err
        |  FROM events WHERE event_type = 'error'
        |  GROUP BY 1),
        |hot AS (SELECT b, n_err FROM w WHERE n_err >= 3),
        |isl AS (SELECT b, n_err,
        |          b - row_number() OVER (ORDER BY b) AS grp
        |        FROM hot)
        |SELECT CAST(to_timestamp(min(b) * 300) AS TIMESTAMP) AS alert_start,
        |  CAST(to_timestamp((max(b) + 1) * 300) AS TIMESTAMP) AS alert_end,
        |  count(*) AS n_windows,
        |  CAST(sum(n_err) AS BIGINT) AS total_errors
        |FROM isl GROUP BY grp
        |ORDER BY alert_start""".stripMargin,

    "q_events_rate" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT minute, n_events,
        |  n_events - coalesce(lag(n_events, 1) OVER (ORDER BY minute), 0) AS delta
        |FROM m ORDER BY minute""".stripMargin,

    "q_win_ewma" -> {
      val num = (0 until ewmaK).map { k =>
        val v = if (k == 0) "value" else s"lag(value, $k) OVER w"
        s"coalesce($v * ${ewmaLit(ewmaW(k))}, 0.0)"
      }.mkString(" + ")
      val den = (0 until ewmaK).map { k =>
        val v = if (k == 0) "value" else s"lag(value, $k) OVER w"
        s"CASE WHEN $v IS NOT NULL THEN ${ewmaLit(ewmaW(k))} ELSE 0.0 END"
      }.mkString(" + ")
      s"""SELECT user_id, event_id, value,
         |  round(($num) / ($den), 6) AS ewma
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY $oracleTs, event_id)
         |ORDER BY user_id, event_id""".stripMargin
    },

    "q_events_markov" ->
      s"""WITH st AS (SELECT user_id, event_type,
         |              lead(event_type) OVER (PARTITION BY user_id
         |                ORDER BY $oracleTs, event_id) AS next_type
         |            FROM events)
         |SELECT event_type AS from_type, next_type AS to_type,
         |  count(*) AS n,
         |  round(count(*) / sum(count(*)) OVER (PARTITION BY event_type), 6) AS p
         |FROM st WHERE next_type IS NOT NULL
         |GROUP BY event_type, next_type
         |ORDER BY from_type, to_type""".stripMargin,

    "q_win_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |             CAST(date_trunc('day', ts) AS DATE) AS day
        |           FROM events),
        |g AS (SELECT user_id, day,
        |        datediff('day', DATE '2024-01-01', day)
        |          - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM d),
        |s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp)
        |SELECT user_id, max(len) AS max_streak, count(*) AS n_streaks
        |FROM s GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_events_pathing" ->
      s"""WITH s AS (SELECT user_id, event_type AS e1,
         |             lead(event_type, 1) OVER w AS e2,
         |             lead(event_type, 2) OVER w AS e3
         |           FROM events
         |           WINDOW w AS (PARTITION BY user_id ORDER BY $oracleTs, event_id))
         |SELECT concat_ws(' > ', e1, e2, e3) AS path, count(*) AS n
         |FROM s WHERE e3 IS NOT NULL
         |GROUP BY 1
         |ORDER BY n DESC, path
         |LIMIT 15""".stripMargin,

    "q_win_median_sliding" ->
      s"""WITH a AS (SELECT user_id, event_id, value,
         |             list_sort(list(value) OVER (PARTITION BY user_id
         |               ORDER BY $oracleTs, event_id
         |               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) AS arr
         |           FROM events)
         |SELECT user_id, event_id, value,
         |  arr[(len(arr) + 1) // 2] AS med
         |FROM a ORDER BY user_id, event_id""".stripMargin,

    "q_win_rolling_corr" -> rollingCorrOracleSql,

    "q_win_drawdown" ->
      s"""WITH c AS (SELECT user_id, $oracleTs AS ts_s, event_id,
         |             SUM(CAST(value AS DECIMAL(30,6))) OVER (
         |               PARTITION BY user_id ORDER BY $oracleTs, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |           FROM events),
         |r AS (SELECT user_id, cum,
         |        MAX(cum) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
         |      FROM c)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  round(CAST(max(peak - cum) AS DOUBLE), 6) AS max_drawdown
         |FROM r GROUP BY user_id
         |ORDER BY user_id""".stripMargin
  )
}
