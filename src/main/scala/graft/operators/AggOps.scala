package graft.operators

import graft.{Det, OracleDet, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Ckpt.LoopCheckpoint

/** T4 — aggregation (SURVEY §2 T4).
  *
  * Every aggregate compiles to Spark's partial+final hash aggregate
  * (map-side combine before the shuffle), which is the shape that scales:
  * at 100 TB the shuffle carries one row per (partition × group), not per
  * input row. Float sums use [[Det]]'s decimal-exact trick so results are
  * bit-stable under any parallelism (SURVEY §A-3.2).
  */
object AggOps {
  import Det._

  private def registerEvents(s: SparkSession, sf: String): Unit =
    Tables.events(s, sf).createOrReplaceTempView("events")

  // SQL shared verbatim between Spark and the DuckDB oracle (common dialect;
  // generated ints cast to BIGINT on both sides for schema parity).
  private val groupingSetsSql =
    s"""SELECT event_type, user_id,
       |  CAST(grouping(event_type) AS BIGINT) AS g_type,
       |  CAST(grouping(user_id) AS BIGINT) AS g_user,
       |  count(*) AS cnt, ${OracleDet.dsum("value")} AS sum_value
       |FROM events
       |GROUP BY GROUPING SETS ((event_type), (user_id), ())
       |ORDER BY g_type, g_user, event_type NULLS FIRST, user_id NULLS FIRST""".stripMargin

  private val rollupSql =
    s"""SELECT r_name, n_name,
       |  CAST(grouping(r_name) AS BIGINT) AS g_r,
       |  CAST(grouping(n_name) AS BIGINT) AS g_n,
       |  count(*) AS cnt, ${OracleDet.dsum("o_totalprice")} AS revenue
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  private val cubeSql =
    s"""SELECT o_orderpriority, o_orderstatus,
       |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_p,
       |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_s,
       |  count(*) AS cnt, ${OracleDet.dsum("o_totalprice")} AS revenue
       |FROM orders
       |GROUP BY CUBE (o_orderpriority, o_orderstatus)
       |ORDER BY g_p, g_s, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_global" -> ((s, sf) =>
      Tables.lineitem(s, sf).agg(
        count(lit(1)).as("cnt"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        davg(col("l_extendedprice")).as("avg_price"))),

    "q_agg_hash_group" -> ((s, sf) =>
      Tables.events(s, sf)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("value")).as("sum_value"),
          davg(col("value")).as("avg_value"))
        .orderBy("event_type")),

    "q_agg_pricing_summary" -> ((s, sf) =>
      Tables.lineitem(s, sf)
        .filter(expr("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(30, 6))), 2).cast(DoubleType).as("sum_disc_price"),
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
            .cast(DecimalType(30, 6))), 2).cast(DoubleType).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_agg_distinct" -> ((s, sf) =>
      Tables.events(s, sf)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"))
        .orderBy("event_type")),

    // HLL sketch — the 100 TB design point for distinct counts. Approximate,
    // so no SQL oracle; the driver records a rows-only check and the exact/
    // approx relative-error bound is asserted in AggOpsSpec.
    "q_agg_approx_distinct" -> ((s, sf) =>
      Tables.events(s, sf)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type")),

    // Spark 4 approx_top_k sketch (heavy hitters at 100 TB without a full
    // groupBy+sort). Rows-only by design like the other sketches: the
    // sketch's internal ordering is engine-private. Exactness on this
    // low-cardinality column is asserted separately in OperatorSpec.
    "q_agg_approx_topk" -> ((s, sf) =>
      Tables.events(s, sf)
        .agg(expr("approx_top_k(event_type, 3)").as("top3"))),

    "q_agg_grouping_sets" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(groupingSetsSql)
    }),

    "q_agg_rollup" -> ((s, sf) => {
      Tables.orders(s, sf).createOrReplaceTempView("orders")
      Tables.customer(s, sf).createOrReplaceTempView("customer")
      Tables.nation(s, sf).createOrReplaceTempView("nation")
      Tables.region(s, sf).createOrReplaceTempView("region")
      s.sql(rollupSql)
    }),

    "q_agg_cube" -> ((s, sf) => {
      Tables.orders(s, sf).createOrReplaceTempView("orders")
      s.sql(cubeSql)
    }),

    "q_agg_filter_having" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """SELECT event_type, count(*) AS cnt FROM events
          |GROUP BY event_type
          |HAVING count(*) > (SELECT count(*) FROM events) / 6
          |ORDER BY event_type""".stripMargin)
    }),

    "q_agg_collect" -> ((s, sf) =>
      Tables.events(s, sf)
        .filter(col("user_id") < 50)
        .groupBy("user_id")
        .agg(concat_ws(",", sort_array(collect_list(col("event_type")))).as("types"))
        .orderBy("user_id")),

    // Variance/stddev/corr from exact decimal moments: both engines compute
    // the identical closed-form IEEE expression over exact sums → bit-equal.
    "q_agg_stats" -> ((s, sf) =>
      Tables.events(s, sf)
        .groupBy("event_type")
        .agg(
          count(col("value")).as("n"),
          sum(col("value").cast(DecimalType(30, 6))).cast(DoubleType).as("s1"),
          sum((col("value") * col("value")).cast(DecimalType(30, 8))).cast(DoubleType).as("s2"),
          sum(col("user_id")).as("su"),
          sum(col("user_id") * col("user_id")).as("suu"),
          sum((col("value") * col("user_id")).cast(DecimalType(30, 6))).cast(DoubleType).as("svu"))
        .select(
          col("event_type"), col("n"),
          round((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1), 6).as("var_value"),
          round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 6).as("std_value"),
          round(
            (col("n") * col("svu") - col("s1") * col("su")) /
              (sqrt(col("n") * col("s2") - col("s1") * col("s1")) *
                sqrt((col("n") * col("suu") - col("su") * col("su")).cast(DoubleType))), 6)
            .as("corr_value_user"))
        .orderBy("event_type")),

    // Exact lower-median via rank selection — no interpolation, so no
    // cross-engine float drift (quantile_cont interpolates differently).
    "q_agg_median" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """SELECT event_type, value AS median_lo FROM (
          |  SELECT event_type, value,
          |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
          |    count(*) OVER (PARTITION BY event_type) AS n
          |  FROM events) t
          |WHERE rn = (n + 1) DIV 2
          |ORDER BY event_type""".stripMargin)
    }),

    // t-digest-style quantile sketch — deterministic for fixed input but
    // implementation-defined, so rows-only (no oracle); exact-percentile
    // parity is covered by q_agg_median's rank selection.
    "q_agg_approx_percentile" -> ((s, sf) =>
      Tables.events(s, sf)
        .groupBy("event_type")
        .agg(
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90"))
        .orderBy("event_type")),

    "q_agg_bool_bit" -> ((s, sf) =>
      Tables.events(s, sf)
        .groupBy("event_type")
        .agg(
          bool_and(col("value") > 0.0).as("all_pos"),
          bool_or(col("value") > 500.0).as("any_big"),
          bit_and(col("user_id")).as("k_and"),
          bit_or(col("user_id")).as("k_or"),
          bit_xor(col("user_id")).as("k_xor"))
        .orderBy("event_type")),

    "q_agg_minmax_by" -> ((s, sf) =>
      Tables.events(s, sf)
        .groupBy("user_id")
        .agg(
          max_by(col("event_type"), col("event_id")).as("last_type"),
          min_by(col("event_type"), col("event_id")).as("first_type"),
          max(col("value")).as("max_value"))
        .orderBy("user_id")),

    // ANSI FILTER-clause aggregates: per-aggregate predicates in ONE pass
    // over the data (the alternative — one subquery per predicate — scans
    // the fact N times). Common SQL dialect, shared verbatim with the
    // oracle; sums are decimal-exact per SURVEY §A-3.2.
    "q_agg_filter_clause" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """SELECT event_type,
          |  count(*) AS n_all,
          |  count(*) FILTER (WHERE value > 100) AS n_big,
          |  CAST(sum(CAST(value AS DECIMAL(30,6))) FILTER (WHERE value > 100) AS DOUBLE) AS sum_big,
          |  count(*) FILTER (WHERE user_id % 2 = 0) AS n_even_user,
          |  CAST(count(*) FILTER (WHERE value > 100) AS DOUBLE) / count(*) AS frac_big
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    }),

    // Deterministic MODE: most frequent event_type per user, ties to the
    // lexicographically smallest type. Two chained hash aggregates — the
    // argmax is min(struct(-cnt, type)), map-side-combinable, no window
    // sort. (Built-in mode() leaves ties undefined, which can never pass a
    // cross-engine hash gate; this formulation pins them.)
    "q_agg_mode" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
          |           FROM events GROUP BY user_id, event_type)
          |SELECT user_id,
          |  min(named_struct('nc', -cnt, 'et', event_type)).et AS mode_type,
          |  -min(named_struct('nc', -cnt, 'et', event_type)).nc AS mode_cnt
          |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin)
    }),

    // Mergeable distinct-count sketches (Spark 4 DataSketches HLL): one
    // sketch per event_type, then the per-type sketches UNION into the
    // global estimate — the pre-aggregate/merge-later contract that makes
    // distinct counting feasible at 100 TB (per-partition sketches merge
    // associatively; no shuffle of raw user ids). Approximate → rows-only
    // at the gate; exactness bound asserted vs countDistinct in
    // OperatorSpec.
    "q_agg_hll_sketch" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """WITH sk AS (SELECT event_type, hll_sketch_agg(user_id) AS sketch,
          |              count(DISTINCT user_id) AS exact_users
          |            FROM events GROUP BY event_type)
          |SELECT event_type, hll_sketch_estimate(sketch) AS est_users, exact_users
          |FROM sk
          |UNION ALL
          |SELECT 'ALL' AS event_type,
          |  hll_sketch_estimate(hll_union_agg(sketch)) AS est_users,
          |  (SELECT count(DISTINCT user_id) FROM events) AS exact_users
          |FROM sk
          |ORDER BY event_type""".stripMargin)
    }),

    // Ordered funnel (view → click → purchase): each stage's timestamp is
    // the user's first qualifying event STRICTLY AFTER the previous stage —
    // three per-user min-aggregates chained by join, every one
    // map-side-combinable and co-partitioned on user_id (one shuffle key
    // end-to-end). Comparisons and outputs are second-truncated per the
    // cross-engine timestamp rule (SURVEY §A-3.1): truncation commutes with
    // min and with the strict > on both engines.
    "q_funnel_stages" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """WITH e AS (SELECT user_id, event_type, date_trunc('SECOND', ts) AS ts_s
          |           FROM events),
          |v AS (SELECT user_id, min(ts_s) AS t_view FROM e
          |      WHERE event_type = 'view' GROUP BY user_id),
          |c AS (SELECT e.user_id, min(e.ts_s) AS t_click FROM e JOIN v USING (user_id)
          |      WHERE e.event_type = 'click' AND e.ts_s > v.t_view GROUP BY e.user_id),
          |p AS (SELECT e.user_id, min(e.ts_s) AS t_purchase FROM e JOIN c USING (user_id)
          |      WHERE e.event_type = 'purchase' AND e.ts_s > c.t_click GROUP BY e.user_id)
          |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
          |  CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
          |            WHEN c.user_id IS NOT NULL THEN 2
          |            ELSE 1 END AS BIGINT) AS reached
          |FROM v LEFT JOIN c ON v.user_id = c.user_id
          |       LEFT JOIN p ON v.user_id = p.user_id
          |ORDER BY v.user_id""".stripMargin)
    }),

    // Weekly cohort retention matrix: cohort = week of first activity,
    // offset = whole weeks since cohort, cell = active users. Both stages
    // are hash aggregates on (user) then (cohort, offset); the week
    // truncation commutes across the engines' ns/µs precision difference
    // (week boundaries are whole seconds).
    "q_retention_cohort" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """WITH f AS (SELECT user_id, min(date_trunc('WEEK', ts)) AS cohort
          |           FROM events GROUP BY user_id),
          |a AS (SELECT DISTINCT user_id, date_trunc('WEEK', ts) AS w FROM events)
          |SELECT CAST(f.cohort AS DATE) AS cohort_week,
          |  CAST(datediff(a.w, f.cohort) div 7 AS BIGINT) AS week_offset,
          |  count(*) AS n_users
          |FROM a JOIN f ON a.user_id = f.user_id
          |GROUP BY f.cohort, datediff(a.w, f.cohort) div 7
          |ORDER BY cohort_week, week_offset""".stripMargin)
    }),

    // Count-min sketch: the mergeable frequency sketch (point-lookup
    // "how often did key X occur" without storing keys) — per-type
    // sketches over user_id with a FIXED seed, so the binary is
    // deterministic and the rows-only gate is stable. Estimates for three
    // probe users are decoded from the sketch bytes via
    // CountMinSketch.readFrom inside a scalar UDF (Spark SQL exposes the
    // build side `count_min_sketch(...)` but no SQL-side reader). Same
    // pre-aggregate/merge contract as the HLL sketch: per-partition
    // sketches merge associatively, raw ids never shuffle. Approximate →
    // rows-only; ≥-exact and ε-bound asserted in OperatorSpec.
    "q_agg_cms_sketch" -> ((s, sf) => {
      registerEvents(s, sf)
      val est = udf { (bytes: Array[Byte], key: Long) =>
        org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(bytes)).estimateCount(key)
      }
      val sk = s.sql(
        """SELECT event_type, count_min_sketch(user_id, 0.001d, 0.99d, 42) AS sketch
          |FROM events GROUP BY event_type""".stripMargin)
      sk.select(
          col("event_type"),
          length(col("sketch")).cast(LongType).as("sketch_bytes"),
          est(col("sketch"), lit(1L)).as("est_u1"),
          est(col("sketch"), lit(2L)).as("est_u2"),
          est(col("sketch"), lit(3L)).as("est_u3"))
        .orderBy("event_type")
    }),

    // Exact distinct counting via BITMAPS (Spark 3.5 bitmap_* family):
    // user ids map to (bucket, bit position), per-bucket bitmaps OR
    // together (map-side combinable fixed-size byte arrays), and the
    // distinct count is the popcount sum — exact like count(DISTINCT) but
    // without ever shuffling raw ids, memory bounded by id-range/32k per
    // group. This is the exact-path complement to the HLL sketch; being
    // exact, it hash-checks against DuckDB's plain count(DISTINCT).
    "q_agg_bitmap_distinct" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """WITH b AS (
          |  SELECT event_type, bitmap_bucket_number(user_id) AS bucket,
          |    bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          |  FROM events GROUP BY event_type, bitmap_bucket_number(user_id))
          |SELECT event_type,
          |  CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_users
          |FROM b GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    }),

    // SEASONAL anomaly detection: hourly event-count buckets scored
    // against a (day-of-week, hour-of-day) baseline — the "is this
    // Tuesday 3pm weird FOR a Tuesday 3pm" readout that a flat z-score
    // (q_anomaly_zscore) cannot give on traffic with daily/weekly shape.
    // Baseline moments are exact integer/decimal sums per seasonal cell
    // (168 cells — broadcast back over the hourly buckets, big side
    // never reshuffles); day-of-week is the portable epoch-day % 7 (both
    // engines' native dow functions disagree on numbering); z is
    // floor-quantized and the top-20 rank orders by the quantized |z|
    // with a timestamp tiebreak, so the LIMIT boundary is deterministic.
    "q_anomaly_seasonal" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(seasonalAnomalySql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    // CUSUM change-point detection over the per-type daily-mean series —
    // the drift alarm a data-quality monitor runs on slow level shifts a
    // z-score misses (many small same-sign deviations). The recursive
    // S_t = max(0, S_{t-1} + d_t − k) is rewritten as the closed form
    // S_t = R_t − min(0, min_{j≤t} R_j) over the running sum R of (d−k),
    // so it is TWO running windows (sum + min) partitioned by event_type
    // — parallel across types, series-bounded rows. Every step is 64-bit
    // integer micro-units (ONE double division per day under 2⁵³, then
    // floor-quantized), so both engines produce bit-identical ledgers
    // with no float accumulation anywhere.
    "q_anomaly_cusum" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(cusumSql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    // Single change point per type (binary-segmentation step 1): the
    // level-shift LOCATOR that complements q_anomaly_cusum's level-shift
    // ALARM — cusum says "the mean drifted", this says "it broke at hour
    // H, from mean_left to mean_right". See changepointSql for the exact
    // integer-division objective and its overflow headroom.
    "q_anomaly_changepoint" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(changepointSql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    // Peak-concurrency sweep line: each event opens a value-scaled session
    // interval (clamped to its UTC day), +1/−1 boundary points, running sum
    // = live sessions, per-day peak + first time it is reached. The window
    // is PARTITION BY day — embarrassingly parallel across days at 100 TB
    // (the clamp is what buys that; an unpartitioned global running sum
    // would serialize the whole corpus through one task). Tie rule −1
    // before +1 at the same second (ends don't overlap the next start);
    // the peak and its first time are order-independent within tie groups
    // because only group-complete prefix sums can reach the maximum.
    "q_report_concurrency" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(concurrencySql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    "q_agg_winsorized" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(winsorizedSql(idiv = "DIV"))
    }),

    "q_report_churn" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(churnSql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    "q_agg_geo_harmonic" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(geoHarmonicSql)
    }),

    "q_report_dau_wau_mau" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(dauWauMauSql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    "q_report_apdex" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(apdexSql(idiv = "DIV"))
    }),

    "q_report_rfm" -> ((s, sf) => {
      Tables.orders(s, sf).createOrReplaceTempView("orders")
      s.sql(rfmSql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    "q_agg_corr_matrix" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(corrMatrixSql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    "q_events_acf" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(acfSql(epoch = "unix_timestamp", idiv = "DIV",
        series = "explode(sequence(mn, mx))",
        lagSeries = "explode(sequence(1, 24))"))
    }),

    "q_report_forecast_error" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(forecastErrorSql(epoch = "unix_timestamp", idiv = "DIV",
        series = "explode(sequence(mn, mx))"))
    }),

    "q_retention_ltv" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(ltvSql((a, b) => s"datediff($a, $b) div 7"))
    }),

    "q_win_twap" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(twapSql(us = "unix_micros"))
    }),

    "q_quality_psi" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(psiSql(epoch = "unix_timestamp", idiv = "DIV",
        series = "explode(sequence(1, 9))"))
    }),

    "q_events_audience_overlap" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(audienceOverlapSql(idiv = "DIV"))
    }),

    "q_events_ccf" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(ccfSql(epoch = "unix_timestamp", idiv = "DIV",
        series = "explode(sequence(mn, mx))",
        lagSeries = "explode(sequence(-12, 12))"))
    }),

    "q_agg_bootstrap_ci" -> ((s, sf) => {
      // Materialize the ≤ types×64-row replicate-means relation ONCE:
      // the rank readout references it three times and Catalyst inlining
      // would re-run the rows×64 expansion per reference (see
      // bootstrapMeansSql scaladoc). The input is also repartitioned to
      // the session parallelism BEFORE the explode: the corpus arrives as
      // one parquet file per table, so without it the 64× expansion +
      // md5 hashing runs in a single scan task (measured 75 s at sf1 —
      // single-threaded); shuffling the skinny pre-expansion rows is
      // ~16 MB and buys full-width parallelism on the expensive stage.
      // On a 1000-executor corpus the scan is already many-partitioned
      // and the repartition is a no-op-sized safety net.
      Tables.events(s, sf).select("event_id", "event_type", "value")
        .where(org.apache.spark.sql.functions.col("value").isNotNull)
        .repartition(s.sparkContext.defaultParallelism)
        .createOrReplaceTempView("boot_events")
      s.sql(bootstrapMeansSql(
          hex32 = x => s"CAST(conv(substring(md5($x), 1, 8), 16, 10) AS BIGINT)",
          cast = "STRING",
          expandFrom = "FROM boot_events e " +
            "LATERAL VIEW explode(sequence(1, 64)) r AS rep"))
        .loopCheckpoint(eager = false)
        .createOrReplaceTempView("boot_mm")
      s.sql(bootstrapSelectSql("boot_mm", idiv = "DIV"))
    }),

    "q_report_error_ci" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(wilsonSql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    // Statistical anomaly detection: per-type z-score of `value`, flagging
    // |z| ≥ 2.5 — the per-severity outlier sweep a log monitor runs.
    // Moments come from exact decimal sums (order-independent, map-side
    // combinable — see Det), then ONE broadcast join sends the tiny
    // per-type (mean, std) table back across the events: the big side
    // never shuffles, which is the shape that survives 100 TB. The double
    // arithmetic (value−mean)/std is written identically in the oracle so
    // the bits agree.
    "q_anomaly_zscore" -> ((s, sf) => {
      val e = Tables.events(s, sf)
      val m = e.groupBy("event_type")
        .agg(
          count(col("value")).as("n"),
          sum(col("value").cast(DecimalType(30, 6))).cast(DoubleType).as("s1"),
          sum((col("value") * col("value")).cast(DecimalType(30, 8))).cast(DoubleType).as("s2"))
        .select(col("event_type"),
          (col("s1") / col("n")).as("mean_v"),
          // nullif: a single-row group has no sample variance — under ANSI
          // the bare (n-1) divisor is a job-killing DIVIDE_BY_ZERO (found
          // by the one-row corpus sweep); a NULL std_v drops the row at
          // the |z| filter, which is the only defensible answer for n=1
          sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
            nullif((col("n") - 1).cast(DoubleType), lit(0.0))).as("std_v"))
      e.join(broadcast(m), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          round((col("value") - col("mean_v")) / col("std_v"), 6).as("z"))
        .filter(abs(col("z")) >= 2.5)
        .orderBy("event_id")
    }),

    // Weighted aggregate: quantity-weighted average price per return flag.
    // Numerator and denominator are separate exact decimal sums emitted as
    // doubles, divided once — never decimal÷decimal, whose result
    // scale/rounding rules differ across engines.
    "q_agg_weighted" -> ((s, sf) =>
      Tables.lineitem(s, sf)
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_quantity").cast(DecimalType(30, 6))).cast(DoubleType).as("w_total"),
          round(
            sum((col("l_extendedprice") * col("l_quantity")).cast(DecimalType(30, 4))).cast(DoubleType) /
              sum(col("l_quantity").cast(DecimalType(30, 6))).cast(DoubleType), 6).as("wavg_price"))
        .orderBy("l_returnflag")),

    // Exponentially-decayed aggregates — the feature-store recency
    // weighting (half-life 7 days): weight = exp(−ln2·age/7d) relative
    // to the corpus max-ts anchor (in-query, so the result is
    // corpus-deterministic, not wall-clock-dependent). Per-row weights
    // are decimal-quantized before summing (exp's last ulp could differ
    // across libms; DECIMAL(30,8) absorbs it and makes the sum
    // order-independent), and the weighted-value term quantizes the
    // DOUBLE product — never decimal×decimal, whose result-scale
    // rounding differs across engines (the first cut failed the gate on
    // exactly that). Map-side combinable like any sum — one scan,
    // one shuffle on user_id at any scale; the anchor is a broadcast
    // scalar.
    "q_agg_decay" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(decaySql(us = "unix_micros"))
    }),

    // Last-touch attribution — the events-analytics marquee report:
    // each purchase is credited to the LATEST prior click's channel
    // (channel derived deterministically from the click id), unmatched
    // purchases to 'direct'. The Spark side is the scale-correct as-of
    // shape: per-purchase latest-click via max(struct) — a map-side
    // combinable aggregate, not a window rank (joined candidate rows
    // never all meet in one sort); the NULL-guarded struct makes the
    // left join's no-click groups aggregate to NULL → 'direct'. The
    // oracle keeps the window-rank formulation, so the gate proves the
    // equivalence. Revenue sums are exact decimals.
    "q_events_attribution" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(
        """WITH p AS (SELECT event_id AS pid, user_id, ts AS pts, value
          |           FROM events WHERE event_type = 'purchase'),
          |c AS (SELECT user_id, ts AS cts, event_id AS cid
          |      FROM events WHERE event_type = 'click'),
          |m AS (SELECT pid, p.value,
          |        max(CASE WHEN c.cts IS NULL THEN NULL
          |                 ELSE named_struct('cts', c.cts, 'cid', c.cid) END) AS mx
          |      FROM p LEFT JOIN c
          |        ON p.user_id = c.user_id AND c.cts <= p.pts
          |      GROUP BY pid, p.value),
          |a AS (SELECT pid, value,
          |        CASE WHEN mx IS NULL THEN 'direct'
          |             ELSE concat('ch', CAST(mx.cid % 3 AS STRING)) END AS channel
          |      FROM m)
          |SELECT channel, count(*) AS n_purchases,
          |  round(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue
          |FROM a GROUP BY channel
          |ORDER BY channel""".stripMargin)
    }),

    // Exact distribution-shape statistics (skewness / excess kurtosis)
    // from one combinable raw-moment pass — see [[momentsSql]].
    "q_agg_moments" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(momentsSql)
    }),

    // HDR-histogram-style percentile estimation — the latency-monitoring
    // shape: values land in log2 buckets (one CASE-free floor(log2) per
    // row, map-side combinable counts; bucket count is ~60 for the full
    // double range, so the reduced state is CONSTANT-size no matter how
    // many rows — the property that lets a 100 TB scan serve percentiles
    // from one tiny merge). Estimates read the cumulative bucket table
    // at p50/p95/p99 and answer with the bucket's geometric midpoint —
    // bounded relative error 2^±0.5 by construction. The window over
    // buckets orders ~17 rows here; never data-sized.
    "q_agg_hdr_percentile" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(hdrSql)
    }),

    // SLO burn rate — the SRE error-budget report (target 99%): per-hour
    // error share over a 1-hour tumbling window, burn = err_rate /
    // (1 − SLO), fast-burn alert at the standard 14.4× threshold. One
    // scan, one hash aggregate on the truncated hour; rates divided once
    // from exact counts.
    "q_report_slo_burn" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(sloBurnSql)
    }),

    // Pre-aggregate RE-aggregation: weekly stats computed FROM a daily
    // pre-aggregate table, not from raw events — the materialized-rollup
    // pattern every 100 TB metrics pipeline runs on (store day grain once,
    // serve coarser grains by merging partials). count/sum/min/max are
    // re-aggregatable (sum of sums, min of mins); the ORACLE computes the
    // weekly stats directly from raw events, so the correctness gate
    // itself proves the two-level merge is lossless. Decimal sums keep the
    // merge order-independent; avg is emitted as merged-sum / merged-count
    // (avg-of-avgs would be wrong — that's WHY the daily table stores the
    // sum, not the mean).
    "q_agg_reaggregate" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(
        """WITH daily AS (
          |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
          |    count(*) AS n, sum(CAST(value AS DECIMAL(30,6))) AS sv,
          |    min(value) AS mn, max(value) AS mx
          |  FROM events GROUP BY 1, 2)
          |SELECT CAST(date_trunc('week', day) AS DATE) AS week, event_type,
          |  CAST(sum(n) AS BIGINT) AS n_events,
          |  CAST(sum(sv) AS DOUBLE) AS sum_value,
          |  min(mn) AS min_value, max(mx) AS max_value,
          |  round(CAST(sum(sv) AS DOUBLE) / sum(n), 6) AS avg_value
          |FROM daily GROUP BY 1, 2
          |ORDER BY week, event_type""".stripMargin)
    }),

    // EQUI-DEPTH histogram (quantile bins): deciles of `value` per event
    // type via ntile over a unique order — the complement of the
    // equi-WIDTH q_report_value_histogram. Partitioned by event_type, so
    // each type's sort runs in parallel; a single GLOBAL ntile would
    // serialize 100 TB through one task — at that scale the exact form
    // runs per partition key (as here), and global quantiles come from
    // approx_percentile (q_agg_approx_percentile is that twin). ntile's
    // leftover distribution (first buckets get the extra rows) is
    // identical in both engines given the unique (value, event_id) order.
    // Concentration report: share of total value held by the top decile of
    // events per type (the Pareto/"how skewed is this metric" number). The
    // decile comes from the same partitioned ntile as q_agg_hist_equidepth;
    // the share divides two exact decimal sums once.
    "q_agg_topn_share" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """WITH t AS (SELECT event_type, value,
          |             ntile(10) OVER (PARTITION BY event_type
          |               ORDER BY value DESC, event_id) AS d
          |           FROM events)
          |SELECT event_type, count(*) AS n_events,
          |  CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
          |  round(CAST(sum(CASE WHEN d = 1 THEN CAST(value AS DECIMAL(30,6))
          |                      ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
          |        / CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 6) AS top_decile_share
          |FROM t GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    }),

    // Latency-style percentile BANDS per type (p50/p90/p99 in one pass) —
    // the SLO report every log analyzer ships. All three quantiles come
    // from ONE ranking window via conditional aggregation at the exact
    // lower-quantile ranks (ceil(q·n)) — no interpolation, no second scan,
    // engine-identical by construction. The 100 TB twin is
    // approx_percentile (q_agg_approx_percentile); this is the exact form
    // you run per bounded partition.
    "q_agg_percentile_bands" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """WITH r AS (SELECT event_type, value,
          |             row_number() OVER (PARTITION BY event_type
          |               ORDER BY value, event_id) AS rn,
          |             count(*) OVER (PARTITION BY event_type) AS n
          |           FROM events)
          |SELECT event_type, max(n) AS n_events,
          |  max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN value END) AS p50,
          |  max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN value END) AS p90,
          |  max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS p99
          |FROM r GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    }),

    // Seasonality chi-square: per type, the goodness-of-fit statistic of
    // hourly activity against a flat 24-hour profile — "is this event
    // type time-of-day dependent" as one number (dof = 23; >> 35 ⇒ yes at
    // any usual significance). Each (obs − exp)²/exp term is decimal-
    // quantized before the sum, so the 24-term reduction is order-
    // independent; two tiny aggregates over one corpus pass.
    "q_agg_chi2_hourly" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """WITH h AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
          |             count(*) AS obs
          |           FROM events GROUP BY event_type, 2),
          |t AS (SELECT event_type, CAST(sum(obs) AS DOUBLE) / 24 AS exp_n
          |      FROM h GROUP BY event_type)
          |SELECT h.event_type, CAST(sum(obs) AS BIGINT) AS n_events,
          |  round(CAST(sum(CAST((obs - exp_n) * (obs - exp_n) / exp_n
          |                      AS DECIMAL(30,8))) AS DOUBLE)
          |        + (24 - count(*)) * min(exp_n), 4) AS chi2,
          |  23 AS dof
          |FROM h JOIN t ON h.event_type = t.event_type
          |GROUP BY h.event_type
          |ORDER BY h.event_type""".stripMargin)
    }),

    // Growth accounting: daily active users, new users, and CUMULATIVE
    // unique users per day. The cumulative distinct is the first-touch
    // trick — min(first_day) per user, then a running sum of new-user
    // counts — which scales as two small aggregates instead of a running
    // distinct set (the naive form would re-deduplicate the whole history
    // per day; see q_win_distinct_running for the windowed variant).
    "q_report_growth" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """WITH fd AS (SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS first_day
          |            FROM events GROUP BY user_id),
          |dau AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
          |          count(DISTINCT user_id) AS dau
          |        FROM events GROUP BY 1),
          |nu AS (SELECT first_day AS day, count(*) AS new_users FROM fd GROUP BY 1)
          |SELECT d.day, d.dau,
          |  CAST(coalesce(nu.new_users, 0) AS BIGINT) AS new_users,
          |  CAST(sum(coalesce(nu.new_users, 0)) OVER (ORDER BY d.day) AS BIGINT) AS cum_users
          |FROM dau d LEFT JOIN nu ON d.day = nu.day
          |ORDER BY d.day""".stripMargin)
    }),

    // Activity heatmap backing table: ISO-weekday × hour counts — the
    // matrix behind every log dashboard's "when does traffic happen"
    // panel. ISO day numbering (Monday=1) is the cross-engine-stable
    // choice (Spark's default dayofweek() is Sunday=1, DuckDB's is
    // Sunday=0 — isodow agrees everywhere). Plain two-key hash aggregate.
    "q_report_heatmap" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """SELECT CAST(extract(DAYOFWEEK_ISO FROM ts) AS BIGINT) AS dow,
          |  CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
          |FROM events GROUP BY 1, 2
          |ORDER BY dow, hr""".stripMargin)
    }),

    // Per-user behavioral ENTROPY: Shannon H over the user's event-type
    // distribution, plus the ln(5)-normalized form — the "how varied is
    // this user/host" score a log pipeline uses for bot/monoculture
    // detection. Each −p·ln p term is decimal-quantized before the sum
    // (order independence); two tiny aggregates over one corpus pass.
    "q_agg_entropy" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """WITH c AS (SELECT user_id, event_type, count(*) AS c
          |           FROM events GROUP BY user_id, event_type),
          |t AS (SELECT user_id, CAST(sum(c) AS DOUBLE) AS n FROM c GROUP BY user_id),
          |e AS (SELECT c.user_id, t.n,
          |        CAST(sum(CAST(-(c / n) * ln(c / n) AS DECIMAL(30,10))) AS DOUBLE) AS h
          |      FROM c JOIN t ON c.user_id = t.user_id
          |      GROUP BY c.user_id, t.n)
          |SELECT user_id, CAST(n AS BIGINT) AS n_events,
          |  round(h, 6) AS entropy,
          |  round(h / ln(5.0), 6) AS entropy_norm
          |FROM e ORDER BY user_id""".stripMargin)
    }),

    // Gini coefficient per type from the sorted-rank identity
    // G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n — the canonical inequality measure
    // next to q_agg_topn_share's top-decile share. One ranking window and
    // one aggregate; the rank-weighted sum is decimal-quantized so the
    // partial aggregation is order-independent.
    "q_agg_gini" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(
        """WITH r AS (SELECT event_type, value,
          |             row_number() OVER (PARTITION BY event_type
          |               ORDER BY value, event_id) AS i
          |           FROM events),
          |m AS (SELECT event_type, count(*) AS n,
          |        CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sx,
          |        CAST(sum(CAST(i * value AS DECIMAL(38,6))) AS DOUBLE) AS six
          |      FROM r GROUP BY event_type)
          |SELECT event_type, n AS n_events,
          |  round(2 * six / (n * sx) - (n + 1) / CAST(n AS DOUBLE), 6) AS gini
          |FROM m ORDER BY event_type""".stripMargin)
    }),

    // A/B experiment readout with a DETERMINISTIC variant assignment (md5
    // of user_id, the engine-portable bucketing used by q_pipeline_split):
    // per-variant user counts, purchase conversion, lift, and the pooled
    // two-proportion z statistic — all derived from integer counts, so the
    // whole readout is bit-stable. Shape: one distinct-users pass, one
    // per-user conversion aggregate, then a 2-row pivot into the 1-row
    // report; nothing quadratic, nothing order-dependent.
    "q_events_ab_lift" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(abLiftSql("STRING"))
    }),

    // Welch's t on the purchase-value metric across the A/B split — see
    // [[ttestSql]] (decimal moment sums; one filtered-scan aggregate).
    "q_agg_ttest" -> ((s, sf) => {
      registerEvents(s, sf)
      s.sql(ttestSql("STRING"))
    }),

    // Robust (median/MAD) anomaly flags — the outlier-immune twin of
    // q_anomaly_zscore: on this right-skewed value distribution the mean/
    // stddev gate drags toward the tail it's hunting, while median ±
    // 1.4826·MAD doesn't move. Both medians are exact lower-medians, but
    // computed by DISTRIBUTED bucketed rank selection ([[medSelCtes]]) —
    // no per-type full sort anywhere in the plan, so there is no "one
    // task sorts a hot type's 20% of the corpus" straggler at 100 TB.
    // The oracle keeps the window-sort spelling of the same rank, proving
    // the selection equivalent on every run.
    "q_anomaly_mad" -> ((s, sf) => {
      registerEvents(s, sf)
      // Each 5-row median table is collected and re-parallelized (the
      // PCA-style driver handoff): under CTE inlining the deviation
      // relation would otherwise recompute once per reference, and a
      // driver-sized literal is cheaper than any checkpoint. The final
      // pass is then ONE scan of events with two broadcast joins — no
      // hints needed: the literals are LocalRelations whose exact size
      // the planner already knows (CatalogStatsSpec asserts the
      // hint-free plan still picks BroadcastHashJoin).
      def lit(df: org.apache.spark.sql.DataFrame) =
        s.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
      lit(s.sql(
        s"""WITH ev AS (SELECT event_type, value AS v FROM events),
           |${medSelCtes("m1", "ev")}
           |SELECT event_type, med FROM m1m""".stripMargin))
        .createOrReplaceTempView("mad_med")
      lit(s.sql(
        s"""WITH adv AS (SELECT e.event_type,
           |               abs(e.value - m.med) AS v
           |             FROM events e JOIN mad_med m ON e.event_type = m.event_type),
           |${medSelCtes("m2", "adv")}
           |SELECT event_type, med FROM m2m""".stripMargin))
        .createOrReplaceTempView("mad_mad")
      s.sql(
        """SELECT e.event_type, e.event_id, e.value,
          |  round((e.value - m.med) / nullif(1.4826 * d.med, 0.0), 4) AS robust_z
          |FROM events e JOIN mad_med m ON e.event_type = m.event_type
          |JOIN mad_mad d ON e.event_type = d.event_type
          |WHERE abs((e.value - m.med) / nullif(1.4826 * d.med, 0.0)) > 3.5
          |ORDER BY e.event_type, e.event_id""".stripMargin)
    }),

    "q_agg_hist_equidepth" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(
        """WITH t AS (SELECT event_type, value,
          |             ntile(10) OVER (PARTITION BY event_type
          |               ORDER BY value, event_id) AS decile
          |           FROM events)
          |SELECT event_type, decile, count(*) AS n,
          |  round(min(value), 6) AS lo, round(max(value), 6) AS hi
          |FROM t GROUP BY event_type, decile
          |ORDER BY event_type, decile""".stripMargin)
    }),

    // Theil–Sen robust trend: median of pairwise slopes over the per-day
    // decimal-exact means. The pair stage is CALENDAR-bounded (days², not
    // rows² — ~30 days → ≤435 pairs per type at any corpus size), so the
    // estimator scales: one map-combined daily aggregate shuffle, then a
    // trivially small pair join. Lower median selected by multiset rank
    // with a total (slope, da, db) order so both engines pick the same
    // pair even among equal slopes.
    "q_agg_theilsen" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(theilSenSql(dd = (a, b) => s"datediff($b, $a)", idiv = "DIV"))
    }),

    // Two-sample Kolmogorov–Smirnov D between the click and purchase
    // value distributions — the distribution-shape companion to the
    // Welch t (q_agg_ttest tests means; KS sees shape). ECDFs are
    // running integer counts over the pooled sort (default RANGE frame
    // → ties enter together, the correct ECDF step), so D is a max of
    // exact integer ratios — bit-identical across engines. One sort
    // shuffle over the filtered rows.
    "q_agg_ks_test" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(ksTestSql)
    }),

    // Exact median inter-arrival gap per event type — the arrival-rate
    // health metric (rate says throughput; the gap median says burstiness
    // resilience). Gaps are exact integer seconds from the lag window;
    // the median reuses medSelCtes' distributed bucketed selection (no
    // per-type full sort), while the oracle states the plain window-rank
    // median — the same equivalence contract q_agg_median proves.
    "q_events_interarrival" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      // r15 opt: same multi-referenced-CTE fix as q_events_conversion_lag
      // — the per-type lag window fed cnt + medSelCtes' three passes and
      // was recomputed 4× under CTE inlining; materialize the gap rows
      // once. Oracle unchanged (one-statement naive median).
      s.sql(
        s"""WITH e AS (SELECT event_type, event_id,
           |        CAST(unix_timestamp(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS BIGINT) AS tsec
           |      FROM events),
           |g AS (SELECT event_type,
           |        CAST(tsec - lag(tsec) OVER (PARTITION BY event_type
           |          ORDER BY tsec, event_id) AS DOUBLE) AS v
           |      FROM e)
           |SELECT event_type, v FROM g WHERE v IS NOT NULL""".stripMargin)
        .loopCheckpoint().createOrReplaceTempView("ia_gg")
      s.sql(
        s"""WITH cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps
           |        FROM ia_gg GROUP BY event_type),
           |${medSelCtes("ia", "ia_gg")}
           |SELECT c.event_type AS event_type, c.n_gaps,
           |  iam.med AS median_gap_s
           |FROM cnt c JOIN iam ON c.event_type = iam.event_type
           |ORDER BY event_type""".stripMargin)
    }),

    // Hierarchical ROLLUP over an ancestor closure built with a
    // RECURSIVE CTE (Spark 4 WITH RECURSIVE): users form an implicit
    // binary tree (parent = floor(key/2), keys shifted +1 so the root is
    // 1), the recursion emits each user's full ancestor chain, and one
    // join+aggregate rolls event counts and exact decimal value sums up
    // to every subtree root — reported for the top four levels. This is
    // the org-chart/category-tree rollup every hierarchy dashboard runs;
    // closure size is n·log n rows (each user has a UNIQUE parent chain,
    // so UNION ALL recursion is explosion-free — contrast
    // q_graph_reachability's bounded-depth graph walk). The leaf
    // aggregate runs FIRST, so the recursion iterates over users-sized
    // state, not events-sized. Identical SQL text in both engines.
    "q_hier_rollup" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(hierRollupSql)
    }),

    // Hodges–Lehmann robust location estimate: the median of Walsh
    // averages (pairwise means), completing the robust toolkit next to
    // Theil–Sen (robust slope) and MAD (robust spread). Like Theil–Sen,
    // the pair stage is bounded by the CALENDAR, not rows: exact per-day
    // decimal means first (one scan, materialized once — it feeds both
    // sides of the pair join and the scalar counts), then days² ≈ 435
    // Walsh averages. The lower median over them is WINDOW-FREE rank
    // selection: min v whose ≤-count reaches k — one more calendar-
    // bounded theta join (the Theil–Sen discipline), so the plan has no
    // global-window stage at any scale (a constant partition key would
    // not do it: Catalyst folds literal partition specs back to empty).
    // Every per-day mean is one identical double division from exact
    // decimal sums, so the averages — and the order statistic picked
    // from them — are engine-identical.
    "q_agg_hodges_lehmann" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(
        """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
          |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s,
          |  CAST(count(*) AS BIGINT) AS n
          |FROM events GROUP BY 1""".stripMargin)
        .loopCheckpoint(eager = false).createOrReplaceTempView("hl_d")
      s.sql(
        """WITH m AS (SELECT day, s / n AS dm FROM hl_d),
          |gg AS (SELECT (a.dm + b.dm) / 2 AS v
          |       FROM m a JOIN m b ON a.day <= b.day),
          |kk AS (SELECT (count(*) + 1) DIV 2 AS k,
          |         CAST(count(*) AS BIGINT) AS np FROM gg),
          |r AS (SELECT d.v, count(*) AS le
          |      FROM (SELECT DISTINCT v FROM gg) d JOIN gg b ON b.v <= d.v
          |      GROUP BY d.v)
          |SELECT (SELECT CAST(count(*) AS BIGINT) FROM hl_d) AS n_days,
          |  (SELECT np FROM kk) AS n_pairs,
          |  (SELECT min(r.v) FROM r JOIN kk ON r.le >= kk.k) AS hl_estimate
          |FROM (SELECT 1) one""".stripMargin)
    }),

    // Conversion LAG: for every purchase, seconds since the user's most
    // recent prior click (running max over the per-user ordered stream —
    // no join, aggregates skip the non-click NULLs), then the EXACT
    // median lag per week via the same distributed bucketed selection as
    // q_events_interarrival (medSelCtes keys on a column named
    // event_type; the week string rides in it and is renamed on output).
    // The funnel-latency trend a product team actually watches; the
    // DuckDB oracle states the same lower median naively and the gate
    // proves the distributed selection exact.
    "q_events_conversion_lag" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      // r15 opt (guide §2.4 — share one exchange/pass instead of four):
      // `gg` (the filtered scan + per-user running-max window) feeds cnt
      // plus medSelCtes' three selection passes, and Spark inlines
      // multi-referenced CTEs, so the single-statement form re-ran the
      // window chain 4× (8 Window nodes / 38 Exchanges in the before
      // plan). Materialize the per-week lag rows ONCE (the
      // q_agg_hodges_lehmann discipline) and run the bucketed selection
      // over the checkpointed relation; the oracle keeps the
      // one-statement spelling, so the gate proves the split identical.
      s.sql(
        s"""WITH e AS (SELECT user_id, event_id, event_type,
           |        CAST(unix_timestamp(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS BIGINT) AS tsec,
           |        CAST(date_trunc('week', ts) AS DATE) AS wk
           |      FROM events WHERE event_type IN ('click', 'purchase')),
           |w AS (SELECT wk, event_type, tsec,
           |        max(CASE WHEN event_type = 'click' THEN tsec END) OVER (
           |          PARTITION BY user_id ORDER BY tsec, event_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
           |      FROM e)
           |SELECT CAST(wk AS STRING) AS event_type,
           |  CAST(tsec - last_click AS DOUBLE) AS v
           |FROM w WHERE event_type = 'purchase' AND last_click IS NOT NULL""".stripMargin)
        .loopCheckpoint().createOrReplaceTempView("clag_gg")
      s.sql(
        s"""WITH cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_conv
           |        FROM clag_gg GROUP BY event_type),
           |${medSelCtes("cl", "clag_gg")}
           |SELECT c.event_type AS week, c.n_conv, clm.med AS median_lag_s
           |FROM cnt c JOIN clm ON c.event_type = clm.event_type
           |ORDER BY week""".stripMargin)
    }),

    // Mann–Whitney U (rank-sum) between the click and purchase value
    // distributions — the nonparametric mean-shift test completing the
    // A/B toolkit (t = means, KS = shape, U = stochastic dominance).
    // Average ranks come from RANK() (min rank of the tie group) plus
    // (tie_size − 1)/2; every rank is a multiple of 0.5, exactly
    // representable, so the rank SUM is order-independent and
    // engine-identical; the tie-corrected σ uses the exact integer
    // Σ(t³−t). One pooled sort + tiny broadcast aggregates.
    "q_agg_mannwhitney" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(mannWhitneySql)
    }),

    // Pareto concentration: the smallest top-user set covering 80% of
    // per-type value mass (the 80/20 report). Cumulative and total sums
    // stay DECIMAL and the 80% test is `5*cum >= 4*tot` — integer-scaled
    // decimal comparison, no float rounding anywhere before the output.
    "q_report_pareto" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(paretoSql)
    }),

    // Benford first-significant-digit audit — the forensic data-quality
    // screen for fabricated/degenerate numeric columns. The digit comes
    // from the value's string form (first [1-9] match): shortest-roundtrip
    // double formatting starts with the same significant digits in both
    // engines, unlike floor(log10) bucketing whose libm ULP differences
    // would flip power-of-ten boundary values. One scan, 9-row output.
    "q_agg_benford" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(benfordSql)
    }),

    // Exact 5%-TRIMMED mean per type — the robust-mean rung between the
    // plain mean and the median: drop exactly k = floor(n/20) rows from
    // each tail, average the rest. Runs on the COMPRESSED value domain
    // (group by (type, value) first — the corpus quantizes values to
    // cents, so the ordered cumulative pass is over distinct values, not
    // rows: the same bounded-domain trick as q_events_interarrival, and
    // the reason this scales where a per-row global sort would not).
    // Boundary values straddling the cut are trimmed PARTIALLY by row
    // count, so the result is exactly "sort, drop k, average" — all in
    // integer/decimal arithmetic until one final division. Identical SQL
    // text in both engines.
    "q_agg_trimmed" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(trimmedMeanSql)
    }),

    // Week-over-week share movers: per-type weekly volume share, its lag,
    // and a per-week rank by absolute share change — the "what changed
    // this week" report. Shares are exact-integer-count ratios, so the
    // doubles (and the rank order built on them) are engine-identical.
    "q_report_top_movers" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(topMoversSql)
    }),

    // Hourly error-burst detector: counts per hour vs the global
    // mean + 3σ line (exact integer sums make mean/σ bit-identical across
    // engines). The series aggregate is one shuffle on the hour key; the
    // stats row broadcasts. The rate-anomaly sibling of q_anomaly_zscore
    // (which scores row VALUES, not arrival rates).
    "q_report_error_bursts" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(errorBurstsSql)
    }),

    // Kendall tau-b between the hourly click and purchase series — the
    // rank-correlation rung below Spearman (robust to any monotone
    // transform, exact tie handling). Concordant / discordant / tie
    // counts are exact BIGINTs from a theta self-join of the DENSE hourly
    // series — calendar-bounded (hours², not corpus²), the same bound as
    // q_events_ccf; one sqrt+division at the end, floor-quantized.
    "q_agg_kendall" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(kendallSql(epoch = "unix_timestamp", idiv = "DIV",
        series = "explode(sequence(mn, mx))"))
    }),

    // Spearman rho over the same hourly pair — Pearson over average
    // ranks. Ranks are kept in doubled-integer space (2·avgrank =
    // 2·cum_below + ties + 1, exact BIGINT via a cumulative window over
    // the ≤|distinct values| grouped domain), so every sum in the
    // correlation is integer-exact; one final division, floor-quantized.
    "q_agg_spearman" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(spearmanSql(epoch = "unix_timestamp", idiv = "DIV",
        series = "explode(sequence(mn, mx))"))
    }),

    // Per-type OLS trend of daily event volume: slope, intercept and R²
    // from the closed-form normal equations. Day offsets are per-type
    // rebased so all five sums are small exact BIGINTs; slope/intercept/
    // R² are single divisions of exact integers (R²'s square is carried
    // as DECIMAL(19,0)² = DECIMAL(38,0) to survive any corpus size).
    // One map-side-combinable daily aggregate — the trend test every
    // volume dashboard runs.
    "q_agg_ols_trend" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(olsTrendSql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    // Market-basket association rules over order baskets — support /
    // confidence / lift for co-purchased part pairs, the classic retail
    // itemset miner. Pair generation is a per-order self-join, bounded by
    // basket size (≤7 lineitems per order), so candidate volume is linear
    // in orders, never corpus² — the a-priori L2 shape. Support and both
    // confidences are exact ppm integer divisions; lift keeps its exact
    // integer numerator/denominator and pays ONE quantized double
    // division; the top-20 ordering runs on the quantized lift with
    // (item_a, item_b) tie-breaks, so it is engine-deterministic.
    "q_report_market_basket" -> ((s, sf) => {
      Tables.lineitem(s, sf).createOrReplaceTempView("lineitem")
      s.sql(marketBasketBaseSql).loopCheckpoint()
        .createOrReplaceTempView("mb_b")
      s.sql(marketBasketSql(bRef = "mb_b", idiv = "DIV"))
    }),

    // Circular mean of event time-of-day per type — the directional
    // statistic that gets "mean clock time" right where a linear mean
    // wraps wrong at midnight. Per-row sin/cos of the day angle are
    // quantized to DECIMAL(30,12) pre-sum (order independence); the
    // resultant length R and the atan2-unwrapped mean second pay one
    // quantized readout each.
    "q_agg_circular_mean" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(circularMeanSql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    // Index of dispersion (Fano factor) of hourly arrivals per type — the
    // burstiness readout (Poisson ⇒ 1; >1 ⇒ clumped traffic). The dense
    // hourly series (zeros included — a sparse mean would hide bursts) is
    // calendar-bounded; variance/mean derives from exact integer sums
    // with one quantized division.
    "q_agg_dispersion" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(dispersionSql(epoch = "unix_timestamp", idiv = "DIV",
        series = "explode(sequence(mn, mx))"))
    }),

    // Mutual information (nats) between event type and hour-of-day — the
    // info-theory dependence readout between a categorical and the time
    // axis (the "is traffic mix time-dependent" question). Joint and
    // marginal counts are exact BIGINTs from one hash aggregate over the
    // (type, hour) cells (≤ |types|·24 reduced rows); each cell's
    // p·ln(p_xy·N/(p_x·p_y)) term keeps the ln argument as a ratio of
    // exact integer products and is quantized to DECIMAL(30,9) before the
    // cells-bounded sum. H(X), H(Y) ride along, giving the normalized
    // uncertainty coefficient from the same pass.
    "q_agg_mutual_info" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(mutualInfoSql)
    }),

    // Mann–Kendall trend test over the daily event-volume series — the
    // standard monotone-trend significance test (the hypothesis-test
    // companion of q_agg_theilsen's slope). S = Σ sign differences over
    // a theta join of day pairs (calendar-bounded, like q_agg_kendall);
    // Var(S) carries the tie correction and is emitted ×18 as an exact
    // BIGINT; z applies the ±1 continuity correction with one quantized
    // division.
    "q_agg_mann_kendall" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(mannKendallSql(epoch = "unix_timestamp", idiv = "DIV"))
    }),

    // Kaplan–Meier survival over user lifetimes (days from first to last
    // event; users still active on the corpus' last day are censored —
    // the estimator's whole point vs the naive empirical CDF). Users
    // reduce to a ≤|days| (lifetime, n, deaths) relation before any
    // window; at-risk counts are an exact suffix sum; the product is
    // exp(Σ quantized ln factors) — the geo-mean ln discipline — with
    // the all-die tail emitted as exact 0.
    "q_report_kaplan_meier" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(kaplanMeierSql(epoch = "unix_timestamp", idiv = "DIV"))
    })
  )

  /** Shared Theil–Sen statement; `dd(a, b)` renders day-difference and
    * `idiv` the integer-division keyword (the two engine spelling gaps). */
  private[graft] def theilSenSql(dd: (String, String) => String,
                                 idiv: String): String =
    s"""WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       |             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
       |               / count(*) AS mv
       |           FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)),
       |p AS (SELECT a.event_type AS event_type, a.day AS da, b.day AS db,
       |        (b.mv - a.mv) / ${dd("a.day", "b.day")} AS slope
       |      FROM d a JOIN d b
       |        ON a.event_type = b.event_type AND a.day < b.day),
       |m AS (SELECT event_type, slope,
       |        row_number() OVER (PARTITION BY event_type
       |                           ORDER BY slope, da, db) AS rn,
       |        count(*) OVER (PARTITION BY event_type) AS n
       |      FROM p)
       |SELECT event_type, round(slope, 8) AS theil_sen_slope
       |FROM m WHERE rn = (n + 1) $idiv 2
       |ORDER BY event_type""".stripMargin

  /** KS statement — identical text runs in both engines. */
  private[graft] val ksTestSql: String =
    """WITH p AS (SELECT value, event_type
      |           FROM events WHERE event_type IN ('click', 'purchase')),
      |n AS (SELECT CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS na,
      |        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS nb
      |      FROM p),
      |c AS (SELECT value,
      |        sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |          OVER (ORDER BY value) AS ca,
      |        sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |          OVER (ORDER BY value) AS cb
      |      FROM p),
      |d AS (SELECT max(abs(CAST(ca AS DOUBLE) / n.na - CAST(cb AS DOUBLE) / n.nb)) AS ks_d
      |      FROM c CROSS JOIN n)
      |SELECT CAST(n.na AS BIGINT) AS n_click, CAST(n.nb AS BIGINT) AS n_purchase,
      |  round(d.ks_d, 6) AS ks_d,
      |  round(d.ks_d * sqrt(n.na * n.nb / (n.na + n.nb)), 6) AS ks_stat
      |FROM d CROSS JOIN n""".stripMargin

  /** Mann–Whitney statement — identical text runs in both engines. */
  private[graft] val mannWhitneySql: String =
    """WITH p AS (SELECT value, event_type
      |           FROM events WHERE event_type IN ('click', 'purchase')),
      |r AS (SELECT value, event_type,
      |        rank() OVER (ORDER BY value)
      |          + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS ar
      |      FROM p),
      |n AS (SELECT
      |        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS na,
      |        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS nb
      |      FROM p),
      |ra AS (SELECT sum(CASE WHEN event_type = 'click' THEN ar ELSE 0.0 END) AS rsum
      |       FROM r),
      |tc AS (SELECT CAST(sum(c * c * c - c) AS DOUBLE) AS tsum
      |       FROM (SELECT count(*) AS c FROM p GROUP BY value) t)
      |SELECT CAST(n.na AS BIGINT) AS n_click, CAST(n.nb AS BIGINT) AS n_purchase,
      |  ra.rsum - n.na * (n.na + 1) / 2 AS u_stat,
      |  round((ra.rsum - n.na * (n.na + 1) / 2 - n.na * n.nb / 2) /
      |        nullif(sqrt(n.na * n.nb / 12 *
      |          ((n.na + n.nb + 1) - tc.tsum / ((n.na + n.nb) * (n.na + n.nb - 1)))),
      |          0.0), 6) AS z
      |FROM n CROSS JOIN ra CROSS JOIN tc""".stripMargin

  /** Pareto statement — identical text runs in both engines. */
  private[graft] val paretoSql: String =
    """WITH u AS (SELECT event_type, user_id,
      |             SUM(CAST(value AS DECIMAL(30,6))) AS sv
      |           FROM events GROUP BY event_type, user_id),
      |r AS (SELECT event_type, sv,
      |        row_number() OVER (PARTITION BY event_type
      |                           ORDER BY sv DESC, user_id) AS rn,
      |        SUM(sv) OVER (PARTITION BY event_type ORDER BY sv DESC, user_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |        SUM(sv) OVER (PARTITION BY event_type) AS tot,
      |        count(*) OVER (PARTITION BY event_type) AS nu
      |      FROM u)
      |SELECT event_type, CAST(max(nu) AS BIGINT) AS n_users,
      |  CAST(min(rn) AS BIGINT) AS n_top80,
      |  round(CAST(min(rn) AS DOUBLE) / max(nu), 6) AS top80_user_share
      |FROM r WHERE 5 * cum >= 4 * tot
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Hierarchy-rollup statement — identical text runs in both engines. */
  private[graft] val hierRollupSql: String =
    """WITH RECURSIVE
      |u AS (SELECT user_id + 1 AS un, CAST(count(*) AS BIGINT) AS n_ev,
      |        CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS sv
      |      FROM events GROUP BY user_id + 1),
      |anc(un, a) AS (
      |  SELECT un, un FROM u
      |  UNION ALL
      |  SELECT un, CAST(floor(a / 2.0) AS BIGINT) FROM anc WHERE a > 1
      |)
      |SELECT a.a AS node, CAST(count(*) AS BIGINT) AS n_desc_users,
      |  CAST(sum(u.n_ev) AS BIGINT) AS n_events,
      |  CAST(sum(u.sv) AS DOUBLE) AS sum_value
      |FROM anc a JOIN u ON a.un = u.un
      |WHERE a.a <= 15
      |GROUP BY a.a ORDER BY node""".stripMargin

  /** Trimmed-mean statement — identical text runs in both engines.
    * kc = rows of this value kept after trimming k rows from each tail:
    * lo_cut claims rows from the bottom until k are gone, hi_cut from the
    * top; both are clamped per-value so boundary ties trim partially. */
  private[graft] val trimmedMeanSql: String =
    """WITH vc AS (SELECT event_type, value, count(*) AS c
      |            FROM events WHERE value IS NOT NULL
      |            GROUP BY event_type, value),
      |cum AS (SELECT event_type, value, c,
      |          SUM(c) OVER (PARTITION BY event_type ORDER BY value
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |          SUM(c) OVER (PARTITION BY event_type) AS n
      |        FROM vc),
      |t AS (SELECT event_type, value, c, cum, n,
      |        CAST(floor(n * 5 / 100.0) AS BIGINT) AS k FROM cum),
      |lo AS (SELECT *, least(c, greatest(CAST(0 AS BIGINT), k - (cum - c))) AS lo_cut
      |       FROM t),
      |kept AS (SELECT event_type, value, n, k,
      |           c - lo_cut - least(c - lo_cut,
      |             greatest(CAST(0 AS BIGINT), k - (n - cum))) AS kc
      |         FROM lo)
      |SELECT event_type, CAST(max(n) AS BIGINT) AS n_rows,
      |  CAST(max(k) AS BIGINT) AS k_each_side,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6)) * kc) AS DOUBLE)
      |    / (max(n) - 2 * max(k)) AS trimmed_mean
      |FROM kept GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Benford statement — identical text runs in both engines. */
  private[graft] val benfordSql: String =
    """WITH d AS (SELECT TRY_CAST(regexp_extract(CAST(value AS STRING),
      |                        '([1-9])', 1) AS INT) AS fd
      |           FROM events WHERE value > 0),
      |c AS (SELECT fd, count(*) AS n FROM d WHERE fd IS NOT NULL GROUP BY fd),
      |t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c)
      |SELECT fd, n,
      |  round(CAST(n AS DOUBLE) / tot, 6) AS share,
      |  round(log10(1.0 + 1.0 / fd), 6) AS benford_expected,
      |  round(CAST(n AS DOUBLE) / tot - log10(1.0 + 1.0 / fd), 6) AS delta
      |FROM c CROSS JOIN t ORDER BY fd""".stripMargin

  /** Top-movers statement — identical text runs in both engines. */
  private[graft] val topMoversSql: String =
    """WITH w AS (SELECT event_type,
      |             CAST(date_trunc('week', ts) AS DATE) AS wk, count(*) AS n
      |           FROM events GROUP BY event_type, CAST(date_trunc('week', ts) AS DATE)),
      |t AS (SELECT wk, sum(n) AS tot FROM w GROUP BY wk),
      |s AS (SELECT w.event_type, w.wk, CAST(w.n AS DOUBLE) / t.tot AS share
      |      FROM w JOIN t ON w.wk = t.wk),
      |l AS (SELECT event_type, wk, share,
      |        lag(share) OVER (PARTITION BY event_type ORDER BY wk) AS prev
      |      FROM s)
      |SELECT event_type, wk, round(share, 6) AS share,
      |  round(prev, 6) AS prev_share, round(share - prev, 6) AS delta,
      |  rank() OVER (PARTITION BY wk ORDER BY abs(share - prev) DESC,
      |               event_type) AS mover_rank
      |FROM l WHERE prev IS NOT NULL
      |ORDER BY wk, mover_rank, event_type""".stripMargin

  /** Error-burst statement — identical text runs in both engines. */
  private[graft] val errorBurstsSql: String =
    """WITH h AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS n
      |           FROM events WHERE event_type = 'error' GROUP BY date_trunc('hour', ts)),
      |s AS (SELECT count(*) AS nh,
      |        CAST(sum(n) AS DOUBLE) / count(*) AS mean_n,
      |        sqrt((CAST(sum(n * n) AS DOUBLE)
      |               - CAST(sum(n) AS DOUBLE) * sum(n) / count(*))
      |             / nullif(CAST(count(*) - 1 AS DOUBLE), 0.0)) AS std_n
      |      FROM h)
      |SELECT CAST(h.hr AS TIMESTAMP) AS hr, h.n AS n_errors,
      |  round((h.n - s.mean_n) / nullif(s.std_n, 0.0), 4) AS z,
      |  CAST(CASE WHEN h.n > s.mean_n + 3 * s.std_n THEN 1 ELSE 0 END AS BIGINT) AS burst
      |FROM h CROSS JOIN s
      |ORDER BY hr""".stripMargin

  /** Exact lower-median (rank (n+1) DIV 2 in multiset order) of column `v`
    * per event_type WITHOUT a per-type full sort — distributed rank
    * selection in two passes over `src`:
    *   1. per-type min/max/count (one map-side-combinable aggregate);
    *   2. per-(type, bucket) counts over 1024 value-range buckets — the
    *      shuffle carries ≤1025 rows per type; a cumulative sum over that
    *      TINY bucket table locates the bucket holding the target rank
    *      and how many rows sit strictly below it;
    *   3. rank within the selected bucket's residents only (~n/1024 rows).
    * The bucket map is monotonic in v, so the (k − below)-th smallest
    * value inside the bucket IS the global k-th multiset value — exactly
    * the value the window-sort form selects (its event_id tie-break only
    * chooses among equal values), which is why the oracle can keep the
    * window spelling and the hash gate proves the rewrite each run.
    * Worst case (every value equal → one bucket) degrades to the sort it
    * replaces; any spread at all bounds the sorted set by n/1024.
    * `p` prefixes the CTE names so two selections compose in one query;
    * the result relation is `<p>m(event_type, med)`. */
  /** Shared text of the seasonal-anomaly statement; `epoch` = the
    * engine's timestamp→seconds function, `idiv` = integer division. */
  private def seasonalAnomalySql(epoch: String, idiv: String): String = {
    val z = "floor((cnt - mu) / sig * 1e6 + 0.5) / 1e6"
    s"""WITH hb AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr_ts,
       |        CAST(count(*) AS BIGINT) AS cnt
       |      FROM events GROUP BY 1),
       |k AS (SELECT hr_ts, cnt,
       |        (CAST($epoch(CAST(date_trunc('day', hr_ts) AS TIMESTAMP)) AS BIGINT)
       |           $idiv 86400) % 7 AS dow,
       |        CAST(hour(hr_ts) AS BIGINT) AS hh
       |      FROM hb),
       |b AS (SELECT dow, hh, CAST(count(*) AS BIGINT) AS n,
       |        SUM(CAST(cnt AS DECIMAL(38,0))) AS s,
       |        SUM(CAST(cnt * cnt AS DECIMAL(38,0))) AS s2
       |      FROM k GROUP BY dow, hh),
       |zt AS (SELECT k.hr_ts, k.cnt,
       |        CAST(b.s AS DOUBLE) / b.n AS mu,
       |        sqrt(greatest((CAST(b.s2 AS DOUBLE)
       |            - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE) / b.n)
       |          / nullif(b.n - 1, 0), CAST(0 AS DOUBLE))) AS sig
       |      FROM k JOIN b ON k.dow = b.dow AND k.hh = b.hh)
       |SELECT hr_ts, cnt, $z AS z
       |FROM zt WHERE sig IS NOT NULL AND sig > 0
       |ORDER BY abs($z) DESC, hr_ts
       |LIMIT 20""".stripMargin
  }

  /** CUSUM ledger SQL shared across engines (`epoch`/`idiv` = the two
    * engine spelling gaps). Daily mean → micro-unit BIGINT (exact double
    * path: decimal sum unscaled < 2⁵³, one division, floor-quantize);
    * reference μ = integer mean of the daily means; slack k = 2.0 units,
    * alarm threshold h = 5.0 units, both in micro. DuckDB windowed SUM
    * returns HUGEINT — every window/aggregate output is cast back to
    * BIGINT before use (the recurring cross-engine dtype rule). */
  private def cusumSql(epoch: String, idiv: String): String =
    s"""WITH d AS (SELECT event_type,
       |        CAST($epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 86400 AS day_num,
       |        SUM(CAST(value AS DECIMAL(18,2))) AS sv,
       |        CAST(count(value) AS BIGINT) AS n
       |      FROM events WHERE value IS NOT NULL
       |      GROUP BY 1, 2),
       |dm AS (SELECT event_type, day_num,
       |        CAST(floor(CAST(sv AS DOUBLE) / n * 1e6 + 0.5) AS BIGINT) AS mean_micro
       |      FROM d),
       |mu AS (SELECT event_type,
       |        CAST(CAST(SUM(mean_micro) AS BIGINT)
       |          $idiv CAST(count(*) AS BIGINT) AS BIGINT) AS mu_micro
       |      FROM dm GROUP BY event_type),
       |r AS (SELECT dm.event_type, dm.day_num, dm.mean_micro,
       |        CAST(SUM(dm.mean_micro - mu.mu_micro - 2000000) OVER (
       |          PARTITION BY dm.event_type ORDER BY dm.day_num
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rsum
       |      FROM dm JOIN mu ON dm.event_type = mu.event_type),
       |c AS (SELECT event_type, day_num, mean_micro, rsum,
       |        least(CAST(min(rsum) OVER (PARTITION BY event_type ORDER BY day_num
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT),
       |          CAST(0 AS BIGINT)) AS low
       |      FROM r)
       |SELECT event_type, day_num, mean_micro,
       |  rsum - low AS cusum_micro,
       |  CAST(CASE WHEN rsum - low > 5000000 THEN 1 ELSE 0 END AS BIGINT) AS alarm
       |FROM c ORDER BY event_type, day_num""".stripMargin

  /** Single change-point detection (binary-segmentation step 1) over the
    * per-type hourly-count series: choose the split k that maximizes the
    * SSE reduction of a mean-shift model. The classic decomposition
    * drops the constant T²/n, so the argmax objective is
    * L²/k + R²/(n−k) over prefix sums L (R = T − L) — TWO running
    * windows partitioned by event_type (parallel across types, rows
    * bounded by series length, never by corpus size). The objective is
    * evaluated in exact integer micro-units via integer division
    * (L²·10⁶ DIV k), so both engines rank bit-identical scores; the
    * argmax tiebreak is the earliest k. Headroom: L ≤ per-type event
    * count, so L²·10⁶ stays under 2⁶³ through ~3M events/type — and the
    * guard is EXPLICIT: past that, non-ANSI Spark would silently wrap
    * while DuckDB raises, turning overflow into a confusing one-sided
    * gate divergence (round-11 advice). The CASE below nulls score_q
    * for the WHOLE type (condition on t, not l, so it's all-or-none
    * per partition and the `score_q DESC, k` tiebreak stays
    * deterministic and identical in both engines — both default to
    * NULLS LAST under DESC), making overflow surface as an honest
    * hash-stable null instead of divergence. The 100 TB deployment
    * swaps the BIGINT products for DECIMAL(38,0), changing nothing
    * structural. */
  private def changepointSql(epoch: String, idiv: String): String =
    s"""WITH h AS (SELECT event_type,
       |        CAST($epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 3600 AS hr,
       |        CAST(count(*) AS BIGINT) AS c
       |      FROM events GROUP BY 1, 2),
       |o AS (SELECT event_type, hr, c,
       |        CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT) AS k,
       |        CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
       |        CAST(sum(c) OVER (PARTITION BY event_type ORDER BY hr
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS l,
       |        CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS t
       |      FROM h),
       |g AS (SELECT event_type, hr, k, n, l, t - l AS r,
       |        CASE WHEN t <= 3000000 THEN
       |          (l * l * 1000000) $idiv k
       |            + ((t - l) * (t - l) * 1000000) $idiv (n - k)
       |        END AS score_q
       |      FROM o WHERE k < n),
       |best AS (SELECT *,
       |        row_number() OVER (PARTITION BY event_type
       |          ORDER BY score_q DESC, k) AS rnk
       |      FROM g)
       |SELECT event_type,
       |  CAST(n AS BIGINT) AS n_hours,
       |  CAST(k AS BIGINT) AS split_k,
       |  CAST(hr AS BIGINT) AS split_hr,
       |  CAST(score_q AS BIGINT) AS score_q,
       |  CAST((l * 1000000) $idiv k AS BIGINT) AS mean_left_micro,
       |  CAST((r * 1000000) $idiv (n - k) AS BIGINT) AS mean_right_micro
       |FROM best WHERE rnk = 1 ORDER BY event_type""".stripMargin

  /** Winsorized mean per event_type — the robust-stats sibling of
    * q_agg_trimmed that CLAMPS tail values at the exact p10/p90 order
    * statistics instead of dropping them. Percentile selection is exact
    * rank selection (row_number per type, k = ceil(q·n)); the clamped
    * sum stays in DECIMAL(18,2) (exact, order-independent) with ONE
    * double division, floor-quantized. Windows and aggregates all
    * partition by event_type — parallel across types at 100 TB. */
  private def winsorizedSql(idiv: String): String =
    s"""WITH v AS (SELECT event_type, event_id, CAST(value AS DECIMAL(18,2)) AS x
       |           FROM events WHERE value IS NOT NULL),
       |r AS (SELECT event_type, x,
       |        row_number() OVER (PARTITION BY event_type ORDER BY x, event_id) AS rn,
       |        count(*) OVER (PARTITION BY event_type) AS n
       |      FROM v),
       |b AS (SELECT event_type,
       |        max(CASE WHEN rn = (n + 9) $idiv 10 THEN x END) AS lo,
       |        max(CASE WHEN rn = (9 * n + 9) $idiv 10 THEN x END) AS hi,
       |        CAST(max(n) AS BIGINT) AS n
       |      FROM r GROUP BY event_type),
       |w AS (SELECT v.event_type, least(greatest(v.x, b.lo), b.hi) AS cx
       |      FROM v JOIN b ON v.event_type = b.event_type),
       |m AS (SELECT event_type, SUM(cx) AS scx FROM w GROUP BY event_type)
       |SELECT b.event_type, b.n,
       |  CAST(b.lo AS DOUBLE) AS p10, CAST(b.hi AS DOUBLE) AS p90,
       |  floor(CAST(m.scx AS DOUBLE) / b.n * 1e6 + 0.5) / 1e6 AS winsor_mean
       |FROM b JOIN m ON b.event_type = m.event_type ORDER BY 1""".stripMargin

  /** Daily error-rate with a Wilson 95% score interval — the SRE report
    * rung above a raw ratio: the interval stays honest at small n where
    * the normal approximation lies. One map-side-combinable day rollup;
    * z is spelled as an exact double literal (e0 suffix — a bare decimal
    * literal would parse as DECIMAL in Spark and change the arithmetic),
    * and the identical expression text gives identical IEEE doubles in
    * both engines before the final floor-quantize. */
  private def wilsonSql(epoch: String, idiv: String): String = {
    val z = "1.959963984540054e0"
    s"""WITH d AS (SELECT
       |        CAST($epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 86400 AS day_num,
       |        CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |          AS BIGINT) AS n_err
       |      FROM events GROUP BY 1),
       |w AS (SELECT day_num, n, n_err, CAST(n_err AS DOUBLE) / n AS p
       |      FROM d)
       |SELECT day_num, n, n_err,
       |  floor(p * 1e6 + 0.5) / 1e6 AS rate,
       |  floor((p + $z * $z / (2 * n)
       |      - $z * sqrt((p * (1 - p) + $z * $z / (4 * n)) / n))
       |    / (1 + $z * $z / n) * 1e6 + 0.5) / 1e6 AS wilson_lo,
       |  floor((p + $z * $z / (2 * n)
       |      + $z * sqrt((p * (1 - p) + $z * $z / (4 * n)) / n))
       |    / (1 + $z * $z / n) * 1e6 + 0.5) / 1e6 AS wilson_hi
       |FROM w ORDER BY day_num""".stripMargin
  }

  /** Geometric + harmonic means per event_type — the mean-family rungs a
    * metrics layer needs for ratio/rate data where the arithmetic mean
    * lies. Identical text in both engines: per-row ln(x) and 1/x are
    * shared doubles quantized to exact decimals BEFORE the sum (the Det
    * order-independence discipline), one double division each, floor-
    * quantized readouts. One map-side-combinable pass. */
  private val geoHarmonicSql: String =
    """WITH v AS (SELECT event_type, value AS x FROM events
      |           WHERE value IS NOT NULL AND value > 0),
      |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(CAST(ln(x) AS DECIMAL(30,6))) AS DOUBLE) AS sln,
      |        CAST(sum(CAST(CAST(1 AS DOUBLE) / x AS DECIMAL(30,9))) AS DOUBLE) AS sinv
      |      FROM v GROUP BY event_type)
      |SELECT event_type, n,
      |  floor(exp(floor(sln / n * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6 AS geo_mean,
      |  floor(n / sinv * 1e6 + 0.5) / 1e6 AS harm_mean
      |FROM a ORDER BY event_type""".stripMargin

  /** Rolling distinct actives — DAU / WAU(7-day) / MAU(28-day) per day.
    * Scale shape: ONE corpus-sized reduction to the distinct (user, day)
    * relation, then an integer ≤28-day range join against the tiny day
    * dimension (broadcast side) and three filtered distinct counts. At
    * 100 TB the user-day relation is |users|×|days| at worst — the exact
    * path; for wider windows the sketch route is q_agg_hll_sketch's
    * mergeable HLL. Day numbers are epoch DIV 86400 integers (the
    * wilsonSql discipline) so the window arithmetic is engine-exact. */
  private def dauWauMauSql(epoch: String, idiv: String): String =
    s"""WITH ud AS (SELECT DISTINCT
       |        CAST($epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 86400 AS day_num, user_id
       |      FROM events),
       |days AS (SELECT DISTINCT day_num FROM ud)
       |SELECT d.day_num,
       |  CAST(count(DISTINCT CASE WHEN u.day_num = d.day_num
       |    THEN u.user_id END) AS BIGINT) AS dau,
       |  CAST(count(DISTINCT CASE WHEN u.day_num >= d.day_num - 6
       |    THEN u.user_id END) AS BIGINT) AS wau,
       |  CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
       |FROM days d JOIN ud u ON u.day_num BETWEEN d.day_num - 27 AND d.day_num
       |GROUP BY d.day_num ORDER BY d.day_num""".stripMargin

  /** Apdex score per event_type (value as latency; satisfied ≤ 100,
    * tolerating ≤ 400 = 4T). Pure integer arithmetic end to end —
    * apdex = (sat + tol/2)/n spelled in ppm with integer division, so
    * there is no float anywhere to disagree on. One map-side-combinable
    * hash aggregate; the canonical SRE satisfaction readout. */
  private def apdexSql(idiv: String): String =
    s"""WITH a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END)
       |          AS BIGINT) AS n_sat,
       |        CAST(sum(CASE WHEN value > 100 AND value <= 400 THEN 1 ELSE 0 END)
       |          AS BIGINT) AS n_tol
       |      FROM events WHERE value IS NOT NULL GROUP BY event_type)
       |SELECT event_type, n, n_sat, n_tol,
       |  CAST((n_sat * 1000000 + n_tol * 500000) $idiv n AS BIGINT) AS apdex_ppm
       |FROM a ORDER BY event_type""".stripMargin

  /** RFM segmentation over orders: recency (days since last order vs the
    * corpus max), frequency, monetary (exact decimal sum → ONE double),
    * each cut into exact ntile(4) quartiles with a custkey tiebreak.
    *
    * NO global window anywhere: a global ntile would serialize the
    * customer relation through one task (and fire WindowExec's
    * single-partition warning). Instead each metric's global rank is
    * COMPOSED the distributed way — row_number partitioned by a
    * monotone value band (parallel across bands) + band offsets from a
    * bounded band×band theta join (tens of rows) — and the ntile bucket
    * comes from the rank via the closed form over (n DIV 4, n % 4).
    * Bands are monotone in the order key and ties can't straddle a band
    * (equal values share a band), so composed rank ≡ global rank. All
    * arithmetic on non-negative integers (DESC orders flip the offset
    * comparison instead of negating keys — Spark DIV truncates while
    * DuckDB // floors, so negative operands are banned). */
  private def rfmSql(epoch: String, idiv: String): String = {
    // Rank composition for one metric over the `r` relation.
    def rankCtes(tag: String, band: String, ord: String, cmp: String): String =
      s"""k_$tag AS (SELECT custkey, $band AS bd,
         |        CAST(row_number() OVER (PARTITION BY $band ORDER BY $ord)
         |          AS BIGINT) AS rn
         |      FROM r),
         |c_$tag AS (SELECT bd, CAST(count(*) AS BIGINT) AS cnt
         |      FROM k_$tag GROUP BY bd),
         |o_$tag AS (SELECT c.bd, CAST(coalesce(sum(c2.cnt), 0) AS BIGINT) AS off
         |      FROM c_$tag c LEFT JOIN c_$tag c2 ON c2.bd $cmp c.bd
         |      GROUP BY c.bd),
         |r_$tag AS (SELECT k.custkey, o.off + k.rn AS rk
         |      FROM k_$tag k JOIN o_$tag o ON k.bd = o.bd)""".stripMargin
    // Exact ntile(4) from a 1-based rank: first `rem` buckets get base+1.
    def nt(rk: String): String =
      s"""CASE WHEN $rk <= (base + 1) * rem
         |    THEN ($rk - 1) $idiv (base + 1) + 1
         |    ELSE rem + ($rk - (base + 1) * rem - 1) $idiv base + 1 END""".stripMargin
    s"""WITH m AS (SELECT o_custkey AS custkey,
       |        CAST(count(*) AS BIGINT) AS freq,
       |        max(o_orderdate) AS last_dt,
       |        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS money
       |      FROM orders GROUP BY 1),
       |r AS (SELECT custkey, freq, money,
       |        (CAST($epoch(mx) AS BIGINT) - CAST($epoch(last_dt) AS BIGINT))
       |          $idiv 86400 AS rec_days
       |      FROM m CROSS JOIN (SELECT max(last_dt) AS mx FROM m) g),
       |${rankCtes("rec", s"rec_days $idiv 64", "rec_days, custkey", "<")},
       |${rankCtes("frq", s"freq $idiv 2", "freq DESC, custkey", ">")},
       |${rankCtes("mny", "CAST(floor(money / 500e0) AS BIGINT)",
                   "money DESC, custkey", ">")},
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(count(*) AS BIGINT) $idiv 4 AS base,
       |        CAST(count(*) AS BIGINT) % 4 AS rem FROM r),
       |q AS (SELECT r.custkey, r.rec_days, r.freq, r.money,
       |        CAST(${nt("rr.rk")} AS BIGINT) AS r_q,
       |        CAST(${nt("rf.rk")} AS BIGINT) AS f_q,
       |        CAST(${nt("rm.rk")} AS BIGINT) AS m_q
       |      FROM r
       |      JOIN r_rec rr ON r.custkey = rr.custkey
       |      JOIN r_frq rf ON r.custkey = rf.custkey
       |      JOIN r_mny rm ON r.custkey = rm.custkey
       |      CROSS JOIN tot)
       |SELECT custkey, rec_days, freq, money, r_q, f_q, m_q,
       |  r_q * 100 + f_q * 10 + m_q AS rfm_code
       |FROM q ORDER BY custkey""".stripMargin
  }

  /** Pairwise Pearson correlation matrix of DENSE hourly count series
    * across event_types (zeros filled via the hour × type grid — without
    * densification the correlation silently conditions on "both active").
    * All five sufficient statistics are integer sums over BIGINT counts —
    * exact and map-side-combinable — and the only float math is the final
    * guarded division, floor-quantized. The hour grid is time-range ×
    * |types| (bounded), never corpus-sized; BIGINT headroom holds past
    * sf1 (n·Σxy ≤ ~1e15 there; the DECIMAL(38) spelling is the next rung
    * if a deployment ever runs century-long ranges). */
  private def corrMatrixSql(epoch: String, idiv: String): String =
    s"""WITH h AS (SELECT
       |        CAST($epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 3600 AS hr, event_type, CAST(count(*) AS BIGINT) AS c
       |      FROM events GROUP BY 1, 2),
       |hours AS (SELECT DISTINCT hr FROM h),
       |types AS (SELECT DISTINCT event_type FROM h),
       |g AS (SELECT hours.hr AS hr, types.event_type AS event_type,
       |        CAST(coalesce(h.c, 0) AS BIGINT) AS c
       |      FROM hours CROSS JOIN types
       |      LEFT JOIN h ON h.hr = hours.hr AND h.event_type = types.event_type),
       |p AS (SELECT a.event_type AS t1, b.event_type AS t2,
       |        CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(a.c) AS BIGINT) AS sx, CAST(sum(b.c) AS BIGINT) AS sy,
       |        CAST(sum(a.c * a.c) AS BIGINT) AS sxx,
       |        CAST(sum(b.c * b.c) AS BIGINT) AS syy,
       |        CAST(sum(a.c * b.c) AS BIGINT) AS sxy
       |      FROM g a JOIN g b ON a.hr = b.hr AND a.event_type < b.event_type
       |      GROUP BY 1, 2)
       |SELECT t1, t2, n,
       |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
       |       THEN CAST(NULL AS DOUBLE)
       |       ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
       |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       |            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1e6 + 0.5) / 1e6
       |  END AS corr
       |FROM p ORDER BY t1, t2""".stripMargin

  /** Autocorrelation function of the hourly TOTAL event-count series,
    * lags 1..24 — the "is traffic periodic, at what period" readout that
    * sits under the seasonal-anomaly baseline. The series is densified
    * over the full min..max hour range (a generated integer series — gaps
    * as zeros, not dropped rows). ACF_k is computed from integer
    * sufficient statistics only (Σx, Σx², Σ head/tail, Σ lag products),
    * assembled with the n²-scaled identity
    *   num = n²·P_k − n·S·(S_head+S_tail) + (n−k)·S²,  den = n²·Q − n·S²
    * so the ONLY float op is the final division (floor-quantized).
    * BIGINT headroom holds through sf1 (~5e16 worst term). */
  private def acfSql(epoch: String, idiv: String, series: String,
                     lagSeries: String): String =
    s"""WITH h AS (SELECT
       |        CAST($epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 3600 AS hr, CAST(count(*) AS BIGINT) AS c
       |      FROM events GROUP BY 1),
       |bnd AS (SELECT min(hr) AS mn, max(hr) AS mx FROM h),
       |s AS (SELECT $series AS i FROM bnd),
       |x AS (SELECT s.i, CAST(coalesce(h.c, 0) AS BIGINT) AS c
       |      FROM s LEFT JOIN h ON h.hr = s.i),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sm,
       |        CAST(sum(c * c) AS BIGINT) AS q FROM x),
       |l AS (SELECT CAST(lg0 AS BIGINT) AS lg
       |      FROM (SELECT $lagSeries AS lg0) l0),
       |j AS (SELECT l.lg, CAST(count(*) AS BIGINT) AS n_pairs,
       |        CAST(sum(a.c * b.c) AS BIGINT) AS pk,
       |        CAST(sum(a.c) AS BIGINT) AS sh, CAST(sum(b.c) AS BIGINT) AS st
       |      FROM l CROSS JOIN x a JOIN x b ON b.i = a.i + l.lg
       |      GROUP BY l.lg)
       |SELECT j.lg AS lag_hr, j.n_pairs,
       |  CASE WHEN n * n * q - n * sm * sm = 0 THEN CAST(NULL AS DOUBLE)
       |       ELSE floor(CAST(n * n * pk - n * sm * (sh + st)
       |                       + (n - j.lg) * sm * sm AS DOUBLE)
       |         / CAST(n * n * q - n * sm * sm AS DOUBLE) * 1e6 + 0.5) / 1e6
       |  END AS acf
       |FROM j CROSS JOIN t ORDER BY lag_hr""".stripMargin

  /** Seasonal-naive forecast error per event_type: predict each hour by
    * the same hour yesterday (period 24) and score MAE plus MASE (the
    * ratio to the lag-1 naive error — the scale-free accuracy readout
    * used to sanity-check any real forecaster). Series densified over the
    * full hour range per type (gaps = zeros); the error sums are pure
    * BIGINT aggregates over self-joins on the hour index — only the final
    * divisions are floats, floor-quantized. The per-type series join is
    * keyed (event_type, hour): co-partitioned, never corpus-quadratic. */
  private def forecastErrorSql(epoch: String, idiv: String,
                               series: String): String =
    s"""WITH h AS (SELECT
       |        CAST($epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 3600 AS hr, event_type, CAST(count(*) AS BIGINT) AS c
       |      FROM events GROUP BY 1, 2),
       |bnd AS (SELECT min(hr) AS mn, max(hr) AS mx FROM h),
       |s AS (SELECT $series AS i FROM bnd),
       |types AS (SELECT DISTINCT event_type FROM h),
       |x AS (SELECT s.i, t.event_type, CAST(coalesce(h.c, 0) AS BIGINT) AS c
       |      FROM s CROSS JOIN types t
       |      LEFT JOIN h ON h.hr = s.i AND h.event_type = t.event_type),
       |e AS (SELECT a.event_type, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(abs(a.c - p.c)) AS BIGINT) AS sae_seasonal,
       |        CAST(sum(abs(a.c - q.c)) AS BIGINT) AS sae_naive
       |      FROM x a
       |      JOIN x p ON p.event_type = a.event_type AND p.i = a.i - 24
       |      JOIN x q ON q.event_type = a.event_type AND q.i = a.i - 1
       |      GROUP BY a.event_type)
       |SELECT event_type, n,
       |  floor(CAST(sae_seasonal AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS mae_seasonal,
       |  floor(CAST(sae_naive AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS mae_naive,
       |  CASE WHEN sae_naive = 0 THEN CAST(NULL AS DOUBLE)
       |       ELSE floor(CAST(sae_seasonal AS DOUBLE) / sae_naive * 1e6 + 0.5) / 1e6
       |  END AS mase
       |FROM e ORDER BY event_type""".stripMargin

  /** Cohort LTV curve: cumulative per-user revenue by (signup-week
    * cohort × week offset) — the revenue twin of q_retention_cohort.
    * Weekly revenue is an exact DECIMAL(30,6) sum; the cumulative sum is
    * a window PARTITIONED by cohort (parallel across cohorts), and the
    * per-user division is the single double op, floor-quantized.
    * `wdiff(ts, cohort)` = whole weeks between, per engine. */
  private def ltvSql(wdiff: (String, String) => String): String =
    s"""WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
       |      FROM events GROUP BY user_id),
       |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
       |      FROM f GROUP BY cohort),
       |r AS (SELECT f.cohort,
       |        CAST(${wdiff("date_trunc('week', e.ts)", "f.cohort")} AS BIGINT)
       |          AS week_offset,
       |        sum(CAST(coalesce(e.value, 0) AS DECIMAL(30,6))) AS rev
       |      FROM events e JOIN f ON e.user_id = f.user_id
       |      GROUP BY 1, 2),
       |c AS (SELECT cohort, week_offset, rev,
       |        sum(rev) OVER (PARTITION BY cohort ORDER BY week_offset) AS cum
       |      FROM r)
       |SELECT CAST(c.cohort AS DATE) AS cohort_week, c.week_offset, cs.n_users,
       |  CAST(c.rev AS DOUBLE) AS week_revenue,
       |  floor(CAST(c.cum AS DOUBLE) / cs.n_users * 1e6 + 0.5) / 1e6
       |    AS ltv_per_user
       |FROM c JOIN cs ON c.cohort = cs.cohort
       |ORDER BY cohort_week, week_offset""".stripMargin

  /** Time-weighted average value (TWAP) per event_type over the irregular
    * event stream: step interpolation — each observation holds until the
    * next, weight = microsecond gap from a PARTITIONED lead() window.
    * Per-row value·dt is one IEEE double multiply quantized to an exact
    * DECIMAL(38,6) BEFORE the order-independent sum; gap totals are
    * BIGINT; one final double division, floor-quantized. The metric that
    * replaces the plain mean whenever sampling is bursty. */
  private def twapSql(us: String): String =
    s"""WITH o AS (SELECT event_type, value,
       |        CAST($us(ts) AS BIGINT) AS t0,
       |        lead(CAST($us(ts) AS BIGINT))
       |          OVER (PARTITION BY event_type ORDER BY ts, event_id) AS t1
       |      FROM events WHERE value IS NOT NULL),
       |d AS (SELECT event_type, value, t1 - t0 AS dt
       |      FROM o WHERE t1 IS NOT NULL),
       |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(CAST(value * dt AS DECIMAL(38,6))) AS DOUBLE) AS swv,
       |        CAST(sum(dt) AS BIGINT) AS sdt
       |      FROM d GROUP BY event_type)
       |SELECT event_type, n, sdt AS span_us,
       |  floor(swv / sdt * 1e6 + 0.5) / 1e6 AS twap
       |FROM a ORDER BY event_type""".stripMargin

  /** Poisson-bootstrap confidence interval for the mean value per
    * event_type — the DISTRIBUTED bootstrap: instead of B global
    * resamples (impossible without coordinated sampling), every row
    * draws an independent Poisson(1) replicate weight, which converges
    * to the classic bootstrap for large n. Weights are DETERMINISTIC:
    * the first 8 md5 hex digits of (event_id, replicate) compared
    * against fixed cumulative-Poisson thresholds pre-scaled to 2³² —
    * pure integer compares, reproducible in both engines at any
    * parallelism. Replicate means come from exact decimal sums; the
    * p5/p95 replicate quantiles use window-free rank selection (a
    * B×B theta join over the 64-row replicate relation — the
    * Theil–Sen / hodges discipline, no global window). Expansion is
    * rows × B, linear and map-side-combinable.
    *
    * Plan discipline (round 11): the replicate-means relation `mm` is
    * referenced THREE times downstream (both sides of the rank theta
    * join + the per-type count), and Catalyst inlines multi-referenced
    * CTEs — the single-query spelling re-ran the rows×64 md5 expansion
    * three times, each through a codegen-breaking BNLJ CROSS JOIN
    * (measured 69.7 s at sf1). The Spark side therefore materializes
    * `mm` ONCE via localCheckpoint (≤ types×64 rows — tiny) with the
    * expansion spelled as a LATERAL VIEW explode (stays inside
    * whole-stage codegen, no BNLJ), then rank-selects over the
    * checkpoint. Values are bit-identical to the one-shot text (the
    * decimal sums are order-independent), so the DuckDB oracle keeps
    * the single-query spelling and the gate proves the equivalence. */
  private def bootstrapMeansSql(hex32: String => String, cast: String,
                                expandFrom: String): String =
    s"""WITH w AS (SELECT event_type, value, rep,
       |        CASE WHEN h < 1580030168 THEN 0
       |             WHEN h < 3160060337 THEN 1
       |             WHEN h < 3950075421 THEN 2
       |             WHEN h < 4213413783 THEN 3
       |             WHEN h < 4279248373 THEN 4
       |             WHEN h < 4292415291 THEN 5
       |             ELSE 6 END AS wt
       |      FROM (SELECT e.event_type, e.value, rep,
       |              ${hex32(s"concat(CAST(e.event_id AS $cast), '_', " +
                        s"CAST(rep AS $cast))")} AS h
       |            $expandFrom) t),
       |m AS (SELECT event_type, rep, CAST(sum(wt) AS BIGINT) AS nw,
       |        CAST(sum(CAST(value * wt AS DECIMAL(30,6))) AS DOUBLE) AS sv
       |      FROM w GROUP BY event_type, rep)
       |SELECT event_type, rep, floor(sv / nw * 1e6 + 0.5) / 1e6 AS mean_v
       |FROM m WHERE nw > 0""".stripMargin

  /** Rank-selection readout over a materialized replicate-means relation
    * (p5/p95 via the window-free theta-join rank pick). */
  private def bootstrapSelectSql(mmRel: String, idiv: String): String =
    s"""WITH rk AS (SELECT a.event_type, a.rep, a.mean_v, CAST(count(*) AS BIGINT) AS r
       |      FROM $mmRel a JOIN $mmRel c ON a.event_type = c.event_type
       |        AND (c.mean_v < a.mean_v
       |             OR (c.mean_v = a.mean_v AND c.rep <= a.rep))
       |      GROUP BY a.event_type, a.rep, a.mean_v),
       |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nb
       |      FROM $mmRel GROUP BY event_type)
       |SELECT rk.event_type, nn.nb,
       |  max(CASE WHEN r = (nb * 5 + 99) $idiv 100 THEN mean_v END) AS ci_lo,
       |  max(CASE WHEN r = (nb * 95 + 99) $idiv 100 THEN mean_v END) AS ci_hi
       |FROM rk JOIN nn ON rk.event_type = nn.event_type
       |GROUP BY rk.event_type, nn.nb
       |ORDER BY rk.event_type""".stripMargin

  /** One-shot single-text spelling (oracle side): means inlined as a CTE. */
  private def bootstrapSql(hex32: String => String, cast: String,
                           series: String, idiv: String): String =
    s"""WITH mm AS (
       |${bootstrapMeansSql(hex32, cast,
          s"FROM events e CROSS JOIN (SELECT $series AS rep) b WHERE e.value IS NOT NULL")}
       |)
       |${bootstrapSelectSql("mm", idiv).replaceFirst("WITH ", ", ")}""".stripMargin

  /** Population Stability Index per event_type — THE production drift
    * gate for score/metric distributions: reference = first half of the
    * corpus time range, current = second half, bins = reference-decile
    * edges (rank-selected with a PARTITIONED row_number — parallel per
    * type), PSI = Σ (p−q)·ln(p/q) with Laplace smoothing (+1 per bin)
    * so empty bins stay finite. Bin assignment is an exact count of
    * edges below the value (broadcast 9-edge relation — no float
    * binning); per-bin terms are quantized to DECIMAL(18,9) before the
    * order-independent sum. PSI > 0.2 is the conventional "investigate"
    * line reported as the drifted flag. */
  private def psiSql(epoch: String, idiv: String, series: String): String =
    s"""WITH v AS (SELECT event_type, value, event_id,
       |        CAST($epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 86400 AS day_num
       |      FROM events WHERE value IS NOT NULL),
       |bd AS (SELECT (min(day_num) + max(day_num) + 1) $idiv 2 AS mid FROM v),
       |rf AS (SELECT v.event_type, v.value, v.event_id
       |      FROM v CROSS JOIN bd WHERE v.day_num < bd.mid),
       |cu AS (SELECT v.event_type, v.value, v.event_id
       |      FROM v CROSS JOIN bd WHERE v.day_num >= bd.mid),
       |rn AS (SELECT event_type, value,
       |        CAST(row_number() OVER (PARTITION BY event_type
       |          ORDER BY value, event_id) AS BIGINT) AS rk
       |      FROM rf),
       |nt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM rf
       |      GROUP BY event_type),
       |ks AS (SELECT $series AS k),
       |ed AS (SELECT rn.event_type, rn.value AS edge
       |      FROM rn JOIN nt ON rn.event_type = nt.event_type
       |      JOIN ks ON rn.rk = (ks.k * nt.n + 9) $idiv 10),
       |br AS (SELECT r.event_type, CAST(count(ed.edge) AS BIGINT) AS bin
       |      FROM rf r LEFT JOIN ed
       |        ON ed.event_type = r.event_type AND r.value > ed.edge
       |      GROUP BY r.event_type, r.value, r.event_id),
       |bc AS (SELECT c.event_type, CAST(count(ed.edge) AS BIGINT) AS bin
       |      FROM cu c LEFT JOIN ed
       |        ON ed.event_type = c.event_type AND c.value > ed.edge
       |      GROUP BY c.event_type, c.value, c.event_id),
       |pr AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cp
       |      FROM br GROUP BY event_type, bin),
       |qc AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cq
       |      FROM bc GROUP BY event_type, bin),
       |bins AS (SELECT nt.event_type, CAST(b.k AS BIGINT) AS bin
       |      FROM nt CROSS JOIN (SELECT $series AS k) b
       |      UNION ALL SELECT event_type, CAST(0 AS BIGINT) FROM nt),
       |tot AS (SELECT p.event_type,
       |        CAST(sum(coalesce(pr.cp, 0)) AS BIGINT) AS np,
       |        CAST(sum(coalesce(qc.cq, 0)) AS BIGINT) AS nq
       |      FROM bins p
       |      LEFT JOIN pr ON pr.event_type = p.event_type AND pr.bin = p.bin
       |      LEFT JOIN qc ON qc.event_type = p.event_type AND qc.bin = p.bin
       |      GROUP BY p.event_type),
       |terms AS (SELECT b.event_type,
       |        CAST((CAST(coalesce(pr.cp, 0) + 1 AS DOUBLE) / (tot.np + 10)
       |            - CAST(coalesce(qc.cq, 0) + 1 AS DOUBLE) / (tot.nq + 10))
       |          * ln((CAST(coalesce(pr.cp, 0) + 1 AS DOUBLE) * (tot.nq + 10))
       |             / (CAST(coalesce(qc.cq, 0) + 1 AS DOUBLE) * (tot.np + 10)))
       |          AS DECIMAL(18,9)) AS term
       |      FROM bins b
       |      JOIN tot ON tot.event_type = b.event_type
       |      LEFT JOIN pr ON pr.event_type = b.event_type AND pr.bin = b.bin
       |      LEFT JOIN qc ON qc.event_type = b.event_type AND qc.bin = b.bin)
       |SELECT event_type,
       |  floor(CAST(sum(term) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS psi,
       |  CASE WHEN CAST(sum(term) AS DOUBLE) > 0.2 THEN 1 ELSE 0 END AS drifted
       |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Cross-correlation function between the 'click' and 'purchase'
    * hourly count series at lags −12..+12 — "do purchases follow clicks,
    * with what delay": the lead/lag discovery readout over the same
    * densified integer series as q_events_acf, Pearson per lag from
    * BIGINT sufficient statistics with one guarded division. */
  private def ccfSql(epoch: String, idiv: String, series: String,
                     lagSeries: String): String =
    s"""WITH h AS (SELECT
       |        CAST($epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 3600 AS hr, event_type, CAST(count(*) AS BIGINT) AS c
       |      FROM events WHERE event_type IN ('click', 'purchase')
       |      GROUP BY 1, 2),
       |bnd AS (SELECT min(hr) AS mn, max(hr) AS mx FROM h),
       |s AS (SELECT $series AS i FROM bnd),
       |xa AS (SELECT s.i, CAST(coalesce(h.c, 0) AS BIGINT) AS c FROM s
       |      LEFT JOIN h ON h.hr = s.i AND h.event_type = 'click'),
       |xb AS (SELECT s.i, CAST(coalesce(h.c, 0) AS BIGINT) AS c FROM s
       |      LEFT JOIN h ON h.hr = s.i AND h.event_type = 'purchase'),
       |l AS (SELECT CAST(lg0 AS BIGINT) AS lg
       |      FROM (SELECT $lagSeries AS lg0) l0),
       |j AS (SELECT l.lg, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(a.c) AS BIGINT) AS sx, CAST(sum(b.c) AS BIGINT) AS sy,
       |        CAST(sum(a.c * a.c) AS BIGINT) AS sxx,
       |        CAST(sum(b.c * b.c) AS BIGINT) AS syy,
       |        CAST(sum(a.c * b.c) AS BIGINT) AS sxy
       |      FROM l CROSS JOIN xa a JOIN xb b ON b.i = a.i + l.lg
       |      GROUP BY l.lg)
       |SELECT lg AS lag_hr, n,
       |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
       |       THEN CAST(NULL AS DOUBLE)
       |       ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
       |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       |            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1e6 + 0.5) / 1e6
       |  END AS ccf
       |FROM j ORDER BY lag_hr""".stripMargin

  /** Kendall tau-b, shared statement. The pair scan is a theta self-join
    * of the dense hourly series on i < j — CALENDAR-bounded (a year is
    * ~8.8k hours → ≤39M pairs regardless of corpus size), so the
    * quadratic term never touches row counts. All counts exact BIGINT;
    * tau-b = (C−D)/√((n0−Tx)(n0−Ty)) is the one quantized double. */
  private def kendallSql(epoch: String, idiv: String, series: String): String =
    s"""WITH h AS (SELECT
       |        CAST($epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 3600 AS hr, event_type, CAST(count(*) AS BIGINT) AS c
       |      FROM events WHERE event_type IN ('click', 'purchase')
       |      GROUP BY 1, 2),
       |bnd AS (SELECT min(hr) AS mn, max(hr) AS mx FROM h),
       |s AS (SELECT $series AS i FROM bnd),
       |t AS (SELECT s.i,
       |        CAST(coalesce(a.c, 0) AS BIGINT) AS x,
       |        CAST(coalesce(b.c, 0) AS BIGINT) AS y
       |      FROM s LEFT JOIN h a ON a.hr = s.i AND a.event_type = 'click'
       |             LEFT JOIN h b ON b.hr = s.i AND b.event_type = 'purchase'),
       |p AS (SELECT
       |        CAST(sum(CASE WHEN (u.x - v.x) * (u.y - v.y) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
       |        CAST(sum(CASE WHEN (u.x - v.x) * (u.y - v.y) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
       |        CAST(sum(CASE WHEN u.x = v.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
       |        CAST(sum(CASE WHEN u.y = v.y THEN 1 ELSE 0 END) AS BIGINT) AS ty,
       |        CAST(count(*) AS BIGINT) AS n0
       |      FROM t u JOIN t v ON u.i < v.i)
       |SELECT n0 AS n_pairs, conc, disc, tx AS ties_x, ty AS ties_y,
       |  CASE WHEN n0 = tx OR n0 = ty THEN CAST(NULL AS DOUBLE)
       |       ELSE floor(CAST(conc - disc AS DOUBLE)
       |              / (sqrt(CAST(n0 - tx AS DOUBLE)) * sqrt(CAST(n0 - ty AS DOUBLE)))
       |              * 1e6 + 0.5) / 1e6 END AS tau_b
       |FROM p""".stripMargin

  /** Spearman rho, shared statement. Average ranks are exact doubled
    * integers (2·rank = 2·cum_below + ties + 1) built from the GROUPED
    * value domain (≤|distinct hourly counts| rows — the q_agg_trimmed
    * compressed-domain trick), then Pearson runs over integer ranks with
    * every sum a BIGINT. The cumulative-below counts are a theta join of
    * the tiny value domain against itself (the hodges rank-selection
    * discipline — no global window anywhere). */
  private def spearmanSql(epoch: String, idiv: String, series: String): String =
    s"""WITH h AS (SELECT
       |        CAST($epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 3600 AS hr, event_type, CAST(count(*) AS BIGINT) AS c
       |      FROM events WHERE event_type IN ('click', 'purchase')
       |      GROUP BY 1, 2),
       |bnd AS (SELECT min(hr) AS mn, max(hr) AS mx FROM h),
       |s AS (SELECT $series AS i FROM bnd),
       |t AS (SELECT s.i,
       |        CAST(coalesce(a.c, 0) AS BIGINT) AS x,
       |        CAST(coalesce(b.c, 0) AS BIGINT) AS y
       |      FROM s LEFT JOIN h a ON a.hr = s.i AND a.event_type = 'click'
       |             LEFT JOIN h b ON b.hr = s.i AND b.event_type = 'purchase'),
       |gx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY x),
       |rx AS (SELECT a.v, CAST(2 * coalesce(sum(b.c), 0) + a.c + 1 AS BIGINT) AS r2
       |       FROM gx a LEFT JOIN gx b ON b.v < a.v GROUP BY a.v, a.c),
       |gy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY y),
       |ry AS (SELECT a.v, CAST(2 * coalesce(sum(b.c), 0) + a.c + 1 AS BIGINT) AS r2
       |       FROM gy a LEFT JOIN gy b ON b.v < a.v GROUP BY a.v, a.c),
       |r AS (SELECT rx.r2 AS a, ry.r2 AS b
       |      FROM t JOIN rx ON rx.v = t.x JOIN ry ON ry.v = t.y),
       |q AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(a) AS BIGINT) AS sx, CAST(sum(b) AS BIGINT) AS sy,
       |        CAST(sum(a * a) AS BIGINT) AS sxx, CAST(sum(b * b) AS BIGINT) AS syy,
       |        CAST(sum(a * b) AS BIGINT) AS sxy
       |      FROM r)
       |SELECT n AS n_hours,
       |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
       |       THEN CAST(NULL AS DOUBLE)
       |       ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
       |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       |            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1e6 + 0.5) / 1e6
       |  END AS rho
       |FROM q""".stripMargin

  /** Per-type OLS daily-volume trend, shared statement. x is the day
    * offset from each type's first day (keeps every sum small); slope =
    * num/den and intercept = (Σy·den − num·Σx)/(n·den) are single
    * divisions of exact BIGINTs; R² = num²/(den·Syy) carries both
    * squares as DECIMAL(19,0)² → DECIMAL(38,0) (exact at any corpus
    * size). NULL when a type has one day (den=0) or constant volume. */
  private def olsTrendSql(epoch: String, idiv: String): String =
    s"""WITH d AS (SELECT event_type,
       |        CAST($epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 86400 AS day_num,
       |        CAST(count(*) AS BIGINT) AS c
       |      FROM events GROUP BY 1, 2),
       |m AS (SELECT event_type, min(day_num) AS d0 FROM d GROUP BY event_type),
       |t AS (SELECT d.event_type, d.day_num - m.d0 AS x, d.c AS y
       |      FROM d JOIN m ON d.event_type = m.event_type),
       |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |        CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy,
       |        CAST(sum(y * y) AS BIGINT) AS syy
       |      FROM t GROUP BY event_type),
       |f AS (SELECT event_type, n,
       |        n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
       |        n * syy - sy * sy AS deny, sy, sx
       |      FROM a)
       |SELECT event_type, n AS n_days,
       |  CASE WHEN den = 0 THEN CAST(NULL AS DOUBLE)
       |       ELSE floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6 + 0.5) / 1e6
       |  END AS slope_per_day,
       |  CASE WHEN den = 0 THEN CAST(NULL AS DOUBLE)
       |       ELSE floor(CAST(sy * den - num * sx AS DOUBLE)
       |              / CAST(n * den AS DOUBLE) * 1e6 + 0.5) / 1e6
       |  END AS intercept,
       |  CASE WHEN den = 0 OR deny = 0 THEN CAST(NULL AS DOUBLE)
       |       ELSE floor(CAST(CAST(num AS DECIMAL(19,0)) * CAST(num AS DECIMAL(19,0)) AS DOUBLE)
       |              / CAST(CAST(den AS DECIMAL(19,0)) * CAST(deny AS DECIMAL(19,0)) AS DOUBLE)
       |              * 1e6 + 0.5) / 1e6
       |  END AS r2
       |FROM f ORDER BY event_type""".stripMargin

  /** Market-basket rules. n_both ≥ 3 is the fixed min-support prune
    * (deterministic, applied identically in both engines before any
    * ranking). `bRef` = the distinct (oid, item) basket relation — the
    * Spark side materializes it once (it feeds the totals, the item
    * supports and both sides of the pair join; inlined it would be four
    * distinct-scans), the oracle names it in a CTE DuckDB materializes
    * itself. */
  private[operators] val marketBasketBaseSql: String =
    "SELECT DISTINCT l_orderkey AS oid, l_partkey AS item FROM lineitem"

  private def marketBasketSql(bRef: String, idiv: String): String =
    s"""WITH nt AS (SELECT CAST(count(DISTINCT oid) AS BIGINT) AS n FROM $bRef),
       |isup AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM $bRef GROUP BY item),
       |pairs AS (SELECT a.item AS x, c.item AS y, CAST(count(*) AS BIGINT) AS cxy
       |          FROM $bRef a JOIN $bRef c ON a.oid = c.oid AND a.item < c.item
       |          GROUP BY a.item, c.item
       |          HAVING count(*) >= 3),
       |f AS (SELECT x, y, cxy, ix.c AS cx, iy.c AS cy, nt.n
       |      FROM pairs JOIN isup ix ON ix.item = x
       |      JOIN isup iy ON iy.item = y CROSS JOIN nt),
       |r AS (SELECT x AS item_a, y AS item_b, cxy AS n_both, cx AS n_a, cy AS n_b,
       |        CAST(cxy * 1000000 $idiv n AS BIGINT) AS support_ppm,
       |        CAST(cxy * 1000000 $idiv cx AS BIGINT) AS conf_a_b_ppm,
       |        CAST(cxy * 1000000 $idiv cy AS BIGINT) AS conf_b_a_ppm,
       |        floor(CAST(cxy AS DOUBLE) * n / (CAST(cx AS DOUBLE) * cy)
       |          * 1e6 + 0.5) / 1e6 AS lift
       |      FROM f)
       |SELECT * FROM r
       |ORDER BY lift DESC, item_a, item_b LIMIT 20""".stripMargin

  /** Circular mean, shared statement. Second-of-day comes from the
    * truncated-second epoch mod 86400 (exact integers); the only floats
    * are the per-row sin/cos (quantized pre-sum) and the atan2 readout.
    * atan2 ∈ (−π, π] is unwrapped to [0, 86400) with a CASE, no fmod. */
  private def circularMeanSql(epoch: String, idiv: String): String =
    s"""WITH e AS (SELECT event_type,
       |        CAST($epoch(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS BIGINT) % 86400 AS sec
       |      FROM events),
       |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(CAST(sin(sec * 2 * pi() / 86400e0) AS DECIMAL(30,12))) AS DOUBLE) AS ss,
       |        CAST(sum(CAST(cos(sec * 2 * pi() / 86400e0) AS DECIMAL(30,12))) AS DOUBLE) AS sc
       |      FROM e GROUP BY event_type),
       |m AS (SELECT event_type, n, ss, sc,
       |        atan2(ss, sc) / (2 * pi()) * 86400 + 86400 AS raw
       |      FROM a)
       |SELECT event_type, n,
       |  floor(CASE WHEN raw >= 86400 THEN raw - 86400 ELSE raw END * 1e2 + 0.5) / 1e2
       |    AS mean_second,
       |  floor(sqrt(ss * ss + sc * sc) / n * 1e6 + 0.5) / 1e6 AS resultant_r
       |FROM m ORDER BY event_type""".stripMargin

  /** Index of dispersion, shared statement — dense hourly counts per
    * type (zeros restored via the calendar series), Fano = var/mean from
    * exact integer sums: ((nΣx² − (Σx)²) idiv n) / Σx spelled as one
    * double division of exact BIGINTs. */
  private def dispersionSql(epoch: String, idiv: String, series: String): String =
    s"""WITH h AS (SELECT
       |        CAST($epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 3600 AS hr, event_type, CAST(count(*) AS BIGINT) AS c
       |      FROM events GROUP BY 1, 2),
       |bnd AS (SELECT min(hr) AS mn, max(hr) AS mx FROM h),
       |s AS (SELECT $series AS i FROM bnd),
       |ty AS (SELECT DISTINCT event_type FROM h),
       |t AS (SELECT ty.event_type, s.i, CAST(coalesce(h.c, 0) AS BIGINT) AS x
       |      FROM ty CROSS JOIN s
       |      LEFT JOIN h ON h.hr = s.i AND h.event_type = ty.event_type),
       |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
       |      FROM t GROUP BY event_type)
       |SELECT event_type, n AS n_hours, sx AS n_events,
       |  CASE WHEN sx = 0 THEN CAST(NULL AS DOUBLE)
       |       ELSE floor(CAST(n * sxx - sx * sx AS DOUBLE)
       |              / CAST(n AS DOUBLE) / CAST(sx AS DOUBLE) * 1e6 + 0.5) / 1e6
       |  END AS fano
       |FROM a ORDER BY event_type""".stripMargin

  /** Mutual information + marginal entropies, shared statement. The only
    * corpus-sized work is the (type, hour) hash aggregate; every term
    * after that lives on the ≤|types|·24 cell relation. Term doubles are
    * quantized to DECIMAL(30,9) pre-sum (order independence), the ln
    * arguments are ratios of exact BIGINT products, readouts floor-
    * quantized once. */
  private val mutualInfoSql: String =
    """WITH j AS (SELECT event_type AS x, CAST(hour(ts) AS BIGINT) AS y,
      |        CAST(count(*) AS BIGINT) AS nxy
      |      FROM events GROUP BY 1, 2),
      |mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM j GROUP BY x),
      |my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM j GROUP BY y),
      |nn AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM j),
      |mi AS (SELECT CAST(sum(CAST(
      |         CAST(j.nxy AS DOUBLE) / nn.n
      |           * ln(CAST(j.nxy AS DOUBLE) * nn.n
      |                / (CAST(mx.nx AS DOUBLE) * my.ny))
      |         AS DECIMAL(30,9))) AS DOUBLE) AS mi
      |       FROM j JOIN mx ON mx.x = j.x JOIN my ON my.y = j.y
      |       CROSS JOIN nn),
      |hx AS (SELECT CAST(sum(CAST(
      |         -(CAST(nx AS DOUBLE) / nn.n) * ln(CAST(nx AS DOUBLE) / nn.n)
      |         AS DECIMAL(30,9))) AS DOUBLE) AS h
      |       FROM mx CROSS JOIN nn),
      |hy AS (SELECT CAST(sum(CAST(
      |         -(CAST(ny AS DOUBLE) / nn.n) * ln(CAST(ny AS DOUBLE) / nn.n)
      |         AS DECIMAL(30,9))) AS DOUBLE) AS h
      |       FROM my CROSS JOIN nn)
      |SELECT nn.n, floor(mi.mi * 1e6 + 0.5) / 1e6 AS mi_nats,
      |  floor(hx.h * 1e6 + 0.5) / 1e6 AS h_x,
      |  floor(hy.h * 1e6 + 0.5) / 1e6 AS h_y,
      |  CASE WHEN hx.h * hy.h = 0 THEN CAST(NULL AS DOUBLE)
      |       ELSE floor(mi.mi / sqrt(hx.h * hy.h) * 1e6 + 0.5) / 1e6 END AS nmi
      |FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN nn""".stripMargin

  /** Mann–Kendall, shared statement. S from a theta join of the daily
    * series against itself (days², calendar-bounded); the tie-corrected
    * variance is the exact integer n(n−1)(2n+5) − Σ t(t−1)(2t+5) kept
    * ×18 (var18) so the only float is the final continuity-corrected z. */
  private def mannKendallSql(epoch: String, idiv: String): String =
    s"""WITH d AS (SELECT
       |        CAST($epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 86400 AS day_num,
       |        CAST(count(*) AS BIGINT) AS c
       |      FROM events GROUP BY 1),
       |p AS (SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1
       |                           WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s
       |      FROM d a JOIN d b ON b.day_num > a.day_num),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
       |t AS (SELECT CAST(coalesce(sum(tc * (tc - 1) * (2 * tc + 5)), 0) AS BIGINT) AS tie
       |      FROM (SELECT CAST(count(*) AS BIGINT) AS tc FROM d GROUP BY c) g
       |      WHERE tc > 1),
       |v AS (SELECT n.n, n.n * (n.n - 1) * (2 * n.n + 5) - t.tie AS var18
       |      FROM n CROSS JOIN t)
       |SELECT v.n AS n_days, p.s AS s_stat, v.var18,
       |  CASE WHEN v.var18 = 0 THEN CAST(NULL AS DOUBLE)
       |       WHEN p.s > 0 THEN floor(CAST(p.s - 1 AS DOUBLE)
       |         / sqrt(CAST(v.var18 AS DOUBLE) / 18e0) * 1e6 + 0.5) / 1e6
       |       WHEN p.s < 0 THEN floor(CAST(p.s + 1 AS DOUBLE)
       |         / sqrt(CAST(v.var18 AS DOUBLE) / 18e0) * 1e6 + 0.5) / 1e6
       |       ELSE CAST(0 AS DOUBLE) END AS z
       |FROM p CROSS JOIN v""".stripMargin

  /** Kaplan–Meier, shared statement. Lifetimes collapse to a ≤|days|
    * grouped relation BEFORE any window (the 100 TB shape: users never
    * meet in one sort); at-risk = exact suffix sum; survival =
    * exp(cumulative Σ of per-factor ln(1−d/n) quantized to DECIMAL(30,9)
    * pre-sum — the geoHarmonicSql discipline), floor-quantized. A death
    * time where the whole risk set dies has no finite ln: it and any
    * later rows read exact 0 via the zt guard (zt is a scalar cross
    * join, not an empty-frame window). */
  private def kaplanMeierSql(epoch: String, idiv: String): String =
    s"""WITH ud AS (SELECT user_id,
       |        CAST($epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS BIGINT)
       |          $idiv 86400 AS day_num
       |      FROM events),
       |u AS (SELECT user_id, max(day_num) - min(day_num) AS lt,
       |        max(day_num) AS lastd
       |      FROM ud GROUP BY user_id),
       |mx AS (SELECT max(day_num) AS m FROM ud),
       |g AS (SELECT lt, CAST(count(*) AS BIGINT) AS n_all,
       |        CAST(sum(CASE WHEN lastd < m THEN 1 ELSE 0 END) AS BIGINT) AS d
       |      FROM u CROSS JOIN mx GROUP BY lt),
       |r AS (SELECT a.lt, a.d, CAST(sum(b.n_all) AS BIGINT) AS nr
       |      FROM g a JOIN g b ON b.lt >= a.lt GROUP BY a.lt, a.d),
       |e AS (SELECT lt, d, nr,
       |        CASE WHEN nr > d
       |             THEN CAST(ln(CAST(nr - d AS DOUBLE) / nr) AS DECIMAL(30,9))
       |        END AS lnf
       |      FROM r WHERE d > 0),
       |zz AS (SELECT min(CASE WHEN nr = d THEN lt END) AS zt FROM e),
       |k AS (SELECT a.lt, a.d, a.nr, CAST(sum(b.lnf) AS DOUBLE) AS cum
       |      FROM e a JOIN e b ON b.lt <= a.lt GROUP BY a.lt, a.d, a.nr)
       |SELECT lt AS lifetime_days, nr AS n_at_risk, d AS n_churned,
       |  CASE WHEN zz.zt IS NOT NULL AND lt >= zz.zt THEN CAST(0 AS DOUBLE)
       |       ELSE floor(exp(cum) * 1e6 + 0.5) / 1e6 END AS survival
       |FROM k CROSS JOIN zz ORDER BY lt""".stripMargin

  /** Audience-overlap matrix: exact Jaccard + containment of the DISTINCT
    * user sets between every event_type pair. The corpus-sized step is
    * the one distinct (type, user) reduction; the pair stage is a
    * per-user wedge self-join (≤ |types|² rows per user — bounded
    * fan-out, the co-occurrence discipline), then integer ppm readouts.
    * The grid LEFT join keeps zero-overlap pairs visible. */
  private def audienceOverlapSql(idiv: String): String =
    s"""WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
       |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nu
       |      FROM tu GROUP BY event_type),
       |p AS (SELECT a.event_type AS t1, b.event_type AS t2,
       |        CAST(count(*) AS BIGINT) AS n_both
       |      FROM tu a JOIN tu b
       |        ON a.user_id = b.user_id AND a.event_type < b.event_type
       |      GROUP BY a.event_type, b.event_type),
       |g AS (SELECT n1.event_type AS t1, n2.event_type AS t2,
       |        n1.nu AS nu1, n2.nu AS nu2
       |      FROM n n1 JOIN n n2 ON n1.event_type < n2.event_type)
       |SELECT g.t1, g.t2, g.nu1, g.nu2,
       |  CAST(coalesce(p.n_both, 0) AS BIGINT) AS n_both,
       |  CAST(coalesce(p.n_both, 0) * 1000000
       |    $idiv (g.nu1 + g.nu2 - coalesce(p.n_both, 0)) AS BIGINT) AS jaccard_ppm,
       |  CAST(coalesce(p.n_both, 0) * 1000000
       |    $idiv least(g.nu1, g.nu2) AS BIGINT) AS containment_ppm
       |FROM g LEFT JOIN p ON g.t1 = p.t1 AND g.t2 = p.t2
       |ORDER BY g.t1, g.t2""".stripMargin

  /** Weekly churn SQL shared across engines. Churn(w) = share of week-w
    * actives absent in the NEXT observed week (lead over the
    * weeks-bounded calendar, so a corpus gap doesn't turn into a
    * 100%-churn artifact). Weeks are pure integer epoch-day÷7 — no
    * engine week-numbering functions, which disagree on ISO/locale. The
    * heavy relation is the distinct (week, user) set — one hash-dedup
    * shuffle; the probe is a key-partitioned LEFT self-join on
    * (next-week, user). Exact integer ppm output. */
  private def churnSql(epoch: String, idiv: String): String =
    s"""WITH am AS (SELECT DISTINCT
       |              CAST($epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS BIGINT)
       |                $idiv 604800 AS week_num,
       |              user_id
       |            FROM events),
       |mm AS (SELECT DISTINCT week_num FROM am),
       |nx AS (SELECT week_num, lead(week_num) OVER (ORDER BY week_num) AS nwk
       |       FROM mm),
       |j AS (SELECT a.week_num, a.user_id,
       |        CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END AS churned
       |      FROM am a JOIN nx ON a.week_num = nx.week_num
       |      LEFT JOIN am b ON b.week_num = nx.nwk AND b.user_id = a.user_id
       |      WHERE nx.nwk IS NOT NULL)
       |SELECT week_num, CAST(count(*) AS BIGINT) AS n_active,
       |  CAST(sum(churned) AS BIGINT) AS n_churned,
       |  CAST(CAST(sum(churned) AS BIGINT) * 1000000
       |    $idiv count(*) AS BIGINT) AS churn_ppm
       |FROM j GROUP BY week_num ORDER BY week_num""".stripMargin

  /** Peak-concurrency SQL shared across engines. Interval duration =
    * 60 + min(max(floor(value·60), 0), 3600) seconds (value is a shared
    * double, so floor is bit-identical); end clamped to the start's UTC
    * day so the running sum partitions by day. Day/hour math is pure
    * integer epoch arithmetic — no engine date functions past
    * date_trunc. */
  private def concurrencySql(epoch: String, idiv: String): String =
    s"""WITH iv AS (SELECT
       |        CAST($epoch(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS BIGINT) AS s,
       |        least(greatest(CAST(floor(coalesce(value, CAST(0.0 AS DOUBLE)) * 60.0)
       |            AS BIGINT), CAST(0 AS BIGINT)), 3600) + 60 AS dur
       |      FROM events),
       |cl AS (SELECT s, (s $idiv 86400) AS day_num,
       |         least(s + dur, (s $idiv 86400) * 86400 + 86400) AS e
       |       FROM iv),
       |pts AS (SELECT day_num, s AS t, 1 AS delta FROM cl
       |        UNION ALL
       |        SELECT day_num, e AS t, -1 AS delta FROM cl),
       |run AS (SELECT t, day_num,
       |        CAST(sum(delta) OVER (PARTITION BY day_num
       |          ORDER BY t, delta
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
       |      FROM pts),
       |pk AS (SELECT day_num, CAST(max(conc) AS BIGINT) AS peak
       |       FROM run GROUP BY day_num)
       |SELECT r.day_num, p.peak AS peak_conc, CAST(min(r.t) AS BIGINT) AS at_tsec
       |FROM run r JOIN pk p ON r.day_num = p.day_num AND r.conc = p.peak
       |GROUP BY r.day_num, p.peak
       |ORDER BY 1""".stripMargin

  private[graft] def medSelCtes(p: String, src: String): String = {
    def bk(v: String, lo: String, hi: String): String =
      s"coalesce(least(CAST(floor(($v - $lo) / nullif($hi - $lo, CAST(0.0 AS DOUBLE)) * 1024) AS INT), 1023), 0)"
    s"""${p}s AS (SELECT event_type, min(v) AS lo, max(v) AS hi,
       |            (count(*) + 1) DIV 2 AS k
       |          FROM $src GROUP BY event_type),
       |${p}bc AS (SELECT /*+ BROADCAST(s) */ x.event_type,
       |             ${bk("x.v", "s.lo", "s.hi")} AS bk, count(*) AS c
       |           FROM $src x JOIN ${p}s s ON x.event_type = s.event_type
       |           GROUP BY x.event_type, ${bk("x.v", "s.lo", "s.hi")}),
       |${p}sel AS (SELECT c.event_type, c.bk, c.cum - c.c AS below, s.k
       |           FROM (SELECT event_type, bk, c,
       |                   sum(c) OVER (PARTITION BY event_type ORDER BY bk) AS cum
       |                 FROM ${p}bc) c
       |           JOIN ${p}s s ON c.event_type = s.event_type
       |           WHERE c.cum >= s.k AND c.cum - c.c < s.k),
       |${p}m AS (SELECT event_type, v AS med FROM (
       |    SELECT /*+ BROADCAST(s), BROADCAST(t) */ x.event_type, x.v,
       |      row_number() OVER (PARTITION BY x.event_type ORDER BY x.v)
       |        + t.below AS rnk, t.k AS k
       |    FROM $src x
       |    JOIN ${p}s s ON x.event_type = s.event_type
       |    JOIN ${p}sel t ON x.event_type = t.event_type
       |     AND ${bk("x.v", "s.lo", "s.hi")} = t.bk) z
       |  WHERE rnk = k)""".stripMargin
  }

  import OracleDet.{dsum => osum, davg => oavg}

  /** Shared A/B readout SQL; `cast` is the engine's string-type name. */
  /** Welch's two-sample t on a continuous metric (purchase values across
    * the md5 A/B split) — the significance companion to [[abLiftSql]]'s
    * conversion-rate z. Everything derives from per-variant decimal
    * moment sums (n, Σx, Σx²) — one map-side-combinable aggregate over
    * the filtered scan, then scalar arithmetic on a 2-row table — so the
    * statistic is order-independent and bit-identical across engines.
    * The (n−1) and sqrt denominators are nullif-guarded: a 1-row or
    * single-variant slice yields NULL, never an ANSI DIVIDE_BY_ZERO.
    * The sum-of-squares terms are greatest(…, 0)-clamped: double
    * cancellation on a near-constant variant can leave them fractionally
    * negative, which would be NaN-from-sqrt on Spark but an out-of-range
    * ERROR on DuckDB — an asymmetric cross-engine failure. */
  private def ttestSql(cast: String): String =
    s"""WITH v AS (SELECT value,
       |             CASE WHEN (instr('0123456789abcdef',
       |                    substring(md5(CAST(event_id AS $cast)), 1, 1)) - 1) % 2 = 0
       |                  THEN 'A' ELSE 'B' END AS variant
       |           FROM events WHERE event_type = 'purchase'),
       |m AS (SELECT variant, count(*) AS n,
       |        CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS sx,
       |        CAST(SUM(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE) AS sxx
       |      FROM v GROUP BY variant),
       |w AS (SELECT
       |        max(CASE WHEN variant = 'A' THEN n END) AS n_a,
       |        max(CASE WHEN variant = 'B' THEN n END) AS n_b,
       |        max(CASE WHEN variant = 'A' THEN sx END) AS sx_a,
       |        max(CASE WHEN variant = 'B' THEN sx END) AS sx_b,
       |        max(CASE WHEN variant = 'A' THEN sxx END) AS sxx_a,
       |        max(CASE WHEN variant = 'B' THEN sxx END) AS sxx_b
       |      FROM m),
       |vv AS (SELECT n_a, n_b, sx_a, sx_b,
       |         greatest(sxx_a - sx_a * sx_a / n_a, 0.0) AS ss_a,
       |         greatest(sxx_b - sx_b * sx_b / n_b, 0.0) AS ss_b
       |       FROM w)
       |SELECT n_a, n_b,
       |  round(sx_a / n_a, 6) AS mean_a,
       |  round(sx_b / n_b, 6) AS mean_b,
       |  round(ss_a / nullif(n_a - 1, 0), 6) AS var_a,
       |  round(ss_b / nullif(n_b - 1, 0), 6) AS var_b,
       |  round((sx_a / n_a - sx_b / n_b) /
       |    nullif(sqrt(ss_a / nullif(n_a - 1, 0) / n_a
       |              + ss_b / nullif(n_b - 1, 0) / n_b), 0.0), 4) AS t_welch
       |FROM vv""".stripMargin

  private def abLiftSql(cast: String): String =
    s"""WITH conv AS (SELECT user_id,
       |                CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
       |                     THEN 1 ELSE 0 END AS converted
       |              FROM events GROUP BY user_id),
       |v AS (SELECT user_id, converted,
       |        CASE WHEN (instr('0123456789abcdef',
       |               substring(md5(CAST(user_id AS $cast)), 1, 1)) - 1) % 2 = 0
       |             THEN 'A' ELSE 'B' END AS variant
       |      FROM conv),
       |st AS (SELECT variant, count(*) AS n, CAST(sum(converted) AS BIGINT) AS c
       |       FROM v GROUP BY variant),
       |w AS (SELECT
       |        max(CASE WHEN variant = 'A' THEN n END) AS n_a,
       |        max(CASE WHEN variant = 'B' THEN n END) AS n_b,
       |        max(CASE WHEN variant = 'A' THEN c END) AS c_a,
       |        max(CASE WHEN variant = 'B' THEN c END) AS c_b
       |      FROM st)
       |SELECT n_a, n_b, c_a, c_b,
       |  round(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
       |  round(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
       |  round(CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a, 6) AS lift,
       |  round((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a) /
       |    nullif(sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
       |         * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
       |         * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 0.0), 4) AS z
       |FROM w""".stripMargin

  /** Decayed-aggregate SQL shared across engines (`us`: micros-since-
    * epoch function — Spark `unix_micros`, DuckDB `epoch_us`).
    * λ = ln 2 / 7 as a fixed literal so both engines use the identical
    * constant. Output rounding happens IN DECIMAL SPACE (round the exact
    * decimal sum, then one cast to double) — round(CAST(sum AS DOUBLE))
    * diverged by 1 ulp at sf1 magnitudes (the sf1-gate find; same class
    * as the round-8 audio lesson). */
  private def decaySql(us: String): String =
    s"""WITH anchor AS (SELECT max(ts) AS a FROM events),
       |w AS (SELECT user_id,
       |        CAST(exp(-0.0990210257942779 *
       |          (($us(a) - $us(ts)) / 86400000000.0)) AS DECIMAL(30,8)) AS wt,
       |        CAST(exp(-0.0990210257942779 *
       |          (($us(a) - $us(ts)) / 86400000000.0)) * value AS DECIMAL(30,8)) AS wv
       |      FROM events CROSS JOIN anchor)
       |SELECT user_id, count(*) AS n_events,
       |  CAST(round(sum(wt), 6) AS DOUBLE) AS decayed_n,
       |  CAST(round(sum(wv), 4) AS DOUBLE) AS decayed_value
       |FROM w GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  /** Exact higher-moment statistics per group — skewness and excess
    * kurtosis from RAW moment sums (Σx..Σx⁴ as exact decimals, so the
    * whole thing is one map-side-combinable aggregate pass and
    * bit-identical in any partial order; the double powers of up-to-490
    * values stay far inside DECIMAL(38,6)). Variance is clamped ≥ 0
    * against cancellation and the normalizers nullif-guarded so a
    * constant group yields NULL, never NaN-vs-error asymmetry (the
    * Welch-t lesson, applied on day one here). */
  private val momentsSql: String =
    """WITH m AS (SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2,
      |    CAST(sum(CAST(value * value * value AS DECIMAL(38,6))) AS DOUBLE) AS s3,
      |    CAST(sum(CAST(value * value * value * value AS DECIMAL(38,6))) AS DOUBLE) AS s4
      |  FROM events GROUP BY event_type),
      |d AS (SELECT event_type, n, s1 / n AS mu,
      |        greatest((s2 - s1 * s1 / n) / n, 0.0) AS v, s2, s3, s4
      |      FROM m)
      |SELECT event_type, n,
      |  round(mu, 6) AS mean,
      |  round(sqrt(v), 6) AS stddev_pop,
      |  round((s3 - 3 * mu * s2 + 2 * n * mu * mu * mu)
      |        / nullif(n * power(v, 1.5), 0.0), 6) AS skewness,
      |  round((s4 - 4 * mu * s3 + 6 * mu * mu * s2 - 3 * n * power(mu, 4))
      |        / nullif(n * v * v, 0.0) - 3, 6) AS kurtosis_excess
      |FROM d ORDER BY event_type""".stripMargin

  /** HDR log-bucket percentile SQL, identical in both engines (log2 /
    * power / ceil / the bucket-ordered window all shared). */
  private val hdrSql: String =
    """WITH b AS (SELECT CAST(floor(log2(value)) AS INT) AS bkt
      |           FROM events WHERE value > 0),
      |h AS (SELECT bkt, count(*) AS c FROM b GROUP BY bkt),
      |tot AS (SELECT count(*) AS n FROM b),
      |cum AS (SELECT bkt, sum(c) OVER (ORDER BY bkt) AS cum FROM h),
      |p AS (SELECT * FROM (VALUES (0.50), (0.95), (0.99)) AS t(pct)),
      |pick AS (SELECT p.pct AS pct, min(cum.bkt) AS bkt
      |         FROM p CROSS JOIN tot JOIN cum ON cum.cum >= ceil(p.pct * tot.n)
      |         GROUP BY p.pct)
      |SELECT CAST(pct AS DOUBLE) AS pct, bkt,
      |  round(power(2, bkt + 0.5), 4) AS est
      |FROM pick ORDER BY pct""".stripMargin

  /** SLO burn-rate SQL, identical in both engines. */
  private val sloBurnSql: String =
    """WITH h AS (SELECT date_trunc('hour', ts) AS hour,
      |             count(*) AS n,
      |             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errs
      |           FROM events GROUP BY date_trunc('hour', ts))
      |SELECT hour, n, errs,
      |  round(CAST(errs AS DOUBLE) / n, 6) AS err_rate,
      |  round(CAST(errs AS DOUBLE) / n / 0.01, 4) AS burn_rate,
      |  CASE WHEN CAST(errs AS DOUBLE) / n / 0.01 > 14.4 THEN 1 ELSE 0 END AS fast_burn
      |FROM h ORDER BY hour""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_agg_decay" -> decaySql(us = "epoch_us"),

    "q_agg_hdr_percentile" -> hdrSql,

    "q_agg_moments" -> momentsSql,

    "q_report_slo_burn" -> sloBurnSql,

    "q_events_attribution" ->
      """WITH p AS (SELECT event_id AS pid, user_id, ts AS pts, value
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS cts, event_id AS cid
        |      FROM events WHERE event_type = 'click'),
        |j AS (SELECT pid, p.value, c.cid,
        |        row_number() OVER (PARTITION BY pid
        |                           ORDER BY c.cts DESC, c.cid DESC) AS rn
        |      FROM p LEFT JOIN c
        |        ON p.user_id = c.user_id AND c.cts <= p.pts),
        |a AS (SELECT pid, value,
        |        CASE WHEN cid IS NULL THEN 'direct'
        |             ELSE concat('ch', CAST(cid % 3 AS VARCHAR)) END AS channel
        |      FROM j WHERE rn = 1)
        |SELECT channel, count(*) AS n_purchases,
        |  round(CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE), 2) AS revenue
        |FROM a GROUP BY channel
        |ORDER BY channel""".stripMargin,

    "q_agg_global" ->
      s"""SELECT count(*) AS cnt, ${osum("l_quantity")} AS sum_qty,
         |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         |  ${oavg("l_extendedprice")} AS avg_price
         |FROM lineitem""".stripMargin,

    "q_agg_hash_group" ->
      s"""SELECT event_type, count(*) AS cnt, ${osum("value")} AS sum_value,
         |  ${oavg("value")} AS avg_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${osum("l_quantity")} AS sum_qty,
         |  ${osum("l_extendedprice")} AS sum_base_price,
         |  CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_disc_price,
         |  CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_charge,
         |  ${oavg("l_quantity")} AS avg_qty,
         |  ${oavg("l_extendedprice")} AS avg_price,
         |  ${oavg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_grouping_sets" -> groupingSetsSql,

    "q_agg_rollup" -> rollupSql,

    "q_agg_cube" -> cubeSql,

    "q_agg_filter_having" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |GROUP BY event_type
        |HAVING count(*) > (SELECT count(*) FROM events) / 6
        |ORDER BY event_type""".stripMargin,

    "q_agg_collect" ->
      """SELECT user_id, string_agg(event_type, ',' ORDER BY event_type) AS types
        |FROM events WHERE user_id < 50
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_agg_stats" ->
      """WITH m AS (
        |  SELECT event_type, count(value) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) AS s2,
        |    SUM(user_id) AS su,
        |    SUM(user_id * user_id) AS suu,
        |    CAST(SUM(CAST(value * user_id AS DECIMAL(30,6))) AS DOUBLE) AS svu
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  round((s2 - s1 * s1 / n) / (n - 1), 6) AS var_value,
        |  round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 6) AS std_value,
        |  round((n * svu - s1 * su) /
        |        (sqrt(n * s2 - s1 * s1) * sqrt(CAST(n * suu - su * su AS DOUBLE))), 6) AS corr_value_user
        |FROM m ORDER BY event_type""".stripMargin,

    "q_agg_median" ->
      """SELECT event_type, value AS median_lo FROM (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events) t
        |WHERE rn = (n + 1) // 2
        |ORDER BY event_type""".stripMargin,

    "q_agg_bool_bit" ->
      """SELECT event_type,
        |  bool_and(value > 0.0) AS all_pos,
        |  bool_or(value > 500.0) AS any_big,
        |  bit_and(user_id) AS k_and,
        |  bit_or(user_id) AS k_or,
        |  bit_xor(user_id) AS k_xor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_minmax_by" ->
      """SELECT user_id, arg_max(event_type, event_id) AS last_type,
        |  arg_min(event_type, event_id) AS first_type, max(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_agg_filter_clause" ->
      """SELECT event_type,
        |  count(*) AS n_all,
        |  count(*) FILTER (WHERE value > 100) AS n_big,
        |  CAST(sum(CAST(value AS DECIMAL(30,6))) FILTER (WHERE value > 100) AS DOUBLE) AS sum_big,
        |  count(*) FILTER (WHERE user_id % 2 = 0) AS n_even_user,
        |  CAST(count(*) FILTER (WHERE value > 100) AS DOUBLE) / count(*) AS frac_big
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_mode" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
        |           FROM events GROUP BY user_id, event_type)
        |SELECT user_id, event_type AS mode_type, cnt AS mode_cnt FROM (
        |  SELECT user_id, event_type, cnt,
        |    row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn
        |  FROM c) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_funnel_stages" ->
      """WITH e AS (SELECT user_id, event_type,
        |             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s
        |           FROM events),
        |v AS (SELECT user_id, min(ts_s) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts_s) AS t_click FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts_s > v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts_s) AS t_purchase FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts_s > c.t_click GROUP BY e.user_id)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
        |  CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
        |            WHEN c.user_id IS NOT NULL THEN 2
        |            ELSE 1 END AS BIGINT) AS reached
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,

    "q_retention_cohort" ->
      """WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
        |SELECT CAST(f.cohort AS DATE) AS cohort_week,
        |  CAST(date_diff('day', f.cohort, a.w) // 7 AS BIGINT) AS week_offset,
        |  count(*) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY f.cohort, date_diff('day', f.cohort, a.w) // 7
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q_agg_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_anomaly_zscore" ->
      """WITH m0 AS (
        |  SELECT event_type, count(value) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type),
        |m AS (SELECT event_type, s1 / n AS mean_v,
        |        sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std_v
        |      FROM m0)
        |SELECT event_id, e.event_type AS event_type, value,
        |  round((value - mean_v) / std_v, 6) AS z
        |FROM events e JOIN m ON e.event_type = m.event_type
        |WHERE abs(round((value - mean_v) / std_v, 6)) >= 2.5
        |ORDER BY event_id""".stripMargin,

    "q_agg_weighted" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS w_total,
        |  round(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(30,4))) AS DOUBLE) /
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE), 6) AS wavg_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // Deliberately SINGLE-level (straight from raw events): passing the
    // gate proves the Spark side's daily→weekly partial merge is lossless.
    "q_agg_reaggregate" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
        |  min(value) AS min_value, max(value) AS max_value,
        |  round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / count(*), 6) AS avg_value
        |FROM events GROUP BY 1, 2
        |ORDER BY week, event_type""".stripMargin,

    "q_events_ab_lift" -> abLiftSql("VARCHAR"),

    "q_agg_ttest" -> ttestSql("VARCHAR"),

    "q_agg_percentile_bands" ->
      """WITH r AS (SELECT event_type, value,
        |             row_number() OVER (PARTITION BY event_type
        |               ORDER BY value, event_id) AS rn,
        |             count(*) OVER (PARTITION BY event_type) AS n
        |           FROM events)
        |SELECT event_type, max(n) AS n_events,
        |  max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN value END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN value END) AS p90,
        |  max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS p99
        |FROM r GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_anomaly_seasonal" -> seasonalAnomalySql(epoch = "epoch", idiv = "//"),

    "q_anomaly_cusum" -> cusumSql(epoch = "epoch", idiv = "//"),
    "q_anomaly_changepoint" -> changepointSql(epoch = "epoch", idiv = "//"),

    "q_report_concurrency" -> concurrencySql(epoch = "epoch", idiv = "//"),

    "q_agg_winsorized" -> winsorizedSql(idiv = "//"),

    "q_report_churn" -> churnSql(epoch = "epoch", idiv = "//"),

    "q_agg_geo_harmonic" -> geoHarmonicSql,

    "q_report_dau_wau_mau" -> dauWauMauSql(epoch = "epoch", idiv = "//"),

    "q_report_apdex" -> apdexSql(idiv = "//"),

    "q_report_rfm" -> rfmSql(epoch = "epoch", idiv = "//"),

    "q_agg_corr_matrix" -> corrMatrixSql(epoch = "epoch", idiv = "//"),

    "q_events_acf" -> acfSql(epoch = "epoch", idiv = "//",
      series = "unnest(generate_series(mn, mx))",
      lagSeries = "unnest(generate_series(1, 24))"),

    "q_report_forecast_error" -> forecastErrorSql(epoch = "epoch", idiv = "//",
      series = "unnest(generate_series(mn, mx))"),

    "q_retention_ltv" -> ltvSql((a, b) => s"date_diff('day', $b, $a) // 7"),

    "q_win_twap" -> twapSql(us = "epoch_us"),

    "q_quality_psi" -> psiSql(epoch = "epoch", idiv = "//",
      series = "unnest(generate_series(1, 9))"),

    "q_events_audience_overlap" -> audienceOverlapSql(idiv = "//"),

    "q_events_ccf" -> ccfSql(epoch = "epoch", idiv = "//",
      series = "unnest(generate_series(mn, mx))",
      lagSeries = "unnest(generate_series(-12, 12))"),

    "q_agg_bootstrap_ci" -> bootstrapSql(
      hex32 = x => s"CAST(concat('0x', substring(md5($x), 1, 8)) AS BIGINT)",
      cast = "VARCHAR",
      series = "unnest(generate_series(1, 64))",
      idiv = "//"),

    "q_report_error_ci" -> wilsonSql(epoch = "epoch", idiv = "//"),

    "q_agg_chi2_hourly" ->
      """WITH h AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
        |             count(*) AS obs
        |           FROM events GROUP BY event_type, 2),
        |t AS (SELECT event_type, CAST(sum(obs) AS DOUBLE) / 24 AS exp_n
        |      FROM h GROUP BY event_type)
        |SELECT h.event_type, CAST(sum(obs) AS BIGINT) AS n_events,
        |  round(CAST(sum(CAST((obs - exp_n) * (obs - exp_n) / exp_n
        |                      AS DECIMAL(30,8))) AS DOUBLE)
        |        + (24 - count(*)) * min(exp_n), 4) AS chi2,
        |  23 AS dof
        |FROM h JOIN t ON h.event_type = t.event_type
        |GROUP BY h.event_type
        |ORDER BY h.event_type""".stripMargin,

    "q_report_growth" ->
      """WITH fd AS (SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS first_day
        |            FROM events GROUP BY user_id),
        |dau AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |          count(DISTINCT user_id) AS dau
        |        FROM events GROUP BY 1),
        |nu AS (SELECT first_day AS day, count(*) AS new_users FROM fd GROUP BY 1)
        |SELECT d.day, d.dau,
        |  CAST(coalesce(nu.new_users, 0) AS BIGINT) AS new_users,
        |  CAST(sum(coalesce(nu.new_users, 0)) OVER (ORDER BY d.day) AS BIGINT) AS cum_users
        |FROM dau d LEFT JOIN nu ON d.day = nu.day
        |ORDER BY d.day""".stripMargin,

    "q_report_heatmap" ->
      """SELECT CAST(isodow(ts) AS BIGINT) AS dow,
        |  CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
        |FROM events GROUP BY 1, 2
        |ORDER BY dow, hr""".stripMargin,

    "q_agg_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS c
        |           FROM events GROUP BY user_id, event_type),
        |t AS (SELECT user_id, CAST(sum(c) AS DOUBLE) AS n FROM c GROUP BY user_id),
        |e AS (SELECT c.user_id, t.n,
        |        CAST(sum(CAST(-(c / n) * ln(c / n) AS DECIMAL(30,10))) AS DOUBLE) AS h
        |      FROM c JOIN t ON c.user_id = t.user_id
        |      GROUP BY c.user_id, t.n)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |  round(h, 6) AS entropy,
        |  round(h / ln(5.0), 6) AS entropy_norm
        |FROM e ORDER BY user_id""".stripMargin,

    "q_agg_gini" ->
      """WITH r AS (SELECT event_type, value,
        |             row_number() OVER (PARTITION BY event_type
        |               ORDER BY value, event_id) AS i
        |           FROM events),
        |m AS (SELECT event_type, count(*) AS n,
        |        CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sx,
        |        CAST(sum(CAST(i * value AS DECIMAL(38,6))) AS DOUBLE) AS six
        |      FROM r GROUP BY event_type)
        |SELECT event_type, n AS n_events,
        |  round(2 * six / (n * sx) - (n + 1) / CAST(n AS DOUBLE), 6) AS gini
        |FROM m ORDER BY event_type""".stripMargin,

    "q_agg_topn_share" ->
      """WITH t AS (SELECT event_type, value,
        |             ntile(10) OVER (PARTITION BY event_type
        |               ORDER BY value DESC, event_id) AS d
        |           FROM events)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
        |  round(CAST(sum(CASE WHEN d = 1 THEN CAST(value AS DECIMAL(30,6))
        |                      ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
        |        / CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 6) AS top_decile_share
        |FROM t GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_anomaly_mad" ->
      """WITH med AS (SELECT event_type, value AS med FROM (
        |    SELECT event_type, value,
        |      row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM events) t WHERE rn = (n + 1) // 2),
        |ad AS (SELECT e.event_type, e.event_id, e.value, m.med,
        |         abs(e.value - m.med) AS adev
        |       FROM events e JOIN med m ON e.event_type = m.event_type),
        |madt AS (SELECT event_type, adev AS mad FROM (
        |    SELECT event_type, adev, event_id,
        |      row_number() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn,
        |      count(*) OVER (PARTITION BY event_type) AS n
        |    FROM ad) t WHERE rn = (n + 1) // 2)
        |SELECT a.event_type, a.event_id, a.value,
        |  round((a.value - a.med) / nullif(1.4826 * d.mad, 0.0), 4) AS robust_z
        |FROM ad a JOIN madt d ON a.event_type = d.event_type
        |WHERE abs((a.value - a.med) / nullif(1.4826 * d.mad, 0.0)) > 3.5
        |ORDER BY a.event_type, a.event_id""".stripMargin,

    "q_agg_hist_equidepth" ->
      """WITH t AS (SELECT event_type, value,
        |             ntile(10) OVER (PARTITION BY event_type
        |               ORDER BY value, event_id) AS decile
        |           FROM events)
        |SELECT event_type, decile, count(*) AS n,
        |  round(min(value), 6) AS lo, round(max(value), 6) AS hi
        |FROM t GROUP BY event_type, decile
        |ORDER BY event_type, decile""".stripMargin,

    "q_agg_theilsen" ->
      theilSenSql(dd = (a, b) => s"date_diff('day', $a, $b)", idiv = "//"),

    "q_report_error_bursts" -> errorBurstsSql,

    "q_agg_benford" -> benfordSql,
    "q_agg_trimmed" -> trimmedMeanSql,
    "q_hier_rollup" -> hierRollupSql,

    "q_report_top_movers" -> topMoversSql,

    "q_agg_ks_test" -> ksTestSql,

    "q_agg_mannwhitney" -> mannWhitneySql,

    "q_events_interarrival" ->
      """WITH e AS (SELECT event_type, event_id,
        |        CAST(epoch(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS BIGINT) AS tsec
        |      FROM events),
        |g AS (SELECT event_type,
        |        CAST(tsec - lag(tsec) OVER (PARTITION BY event_type
        |          ORDER BY tsec, event_id) AS DOUBLE) AS v
        |      FROM e),
        |gg AS (SELECT event_type, v FROM g WHERE v IS NOT NULL),
        |m AS (SELECT event_type, v,
        |        row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n
        |      FROM gg)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS median_gap_s
        |FROM m GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_report_pareto" -> paretoSql,

    "q_agg_hodges_lehmann" ->
      """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |        CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s,
        |        CAST(count(*) AS BIGINT) AS n
        |      FROM events GROUP BY 1),
        |m AS (SELECT day, s / n AS dm FROM d),
        |w AS (SELECT (a.dm + b.dm) / 2 AS wa
        |      FROM m a JOIN m b ON a.day <= b.day),
        |r AS (SELECT wa, row_number() OVER (ORDER BY wa) AS rn,
        |        count(*) OVER () AS np
        |      FROM w)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
        |  CAST(max(np) AS BIGINT) AS n_pairs,
        |  max(CASE WHEN rn = CAST(floor((np + 1) / 2.0) AS BIGINT)
        |      THEN wa END) AS hl_estimate
        |FROM r""".stripMargin,

    "q_events_conversion_lag" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |        CAST(epoch(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS BIGINT) AS tsec,
        |        CAST(date_trunc('week', ts) AS DATE) AS wk
        |      FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT wk, event_type, tsec,
        |        max(CASE WHEN event_type = 'click' THEN tsec END) OVER (
        |          PARTITION BY user_id ORDER BY tsec, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
        |      FROM e),
        |gg AS (SELECT CAST(wk AS STRING) AS wks,
        |         CAST(tsec - last_click AS DOUBLE) AS v
        |       FROM w WHERE event_type = 'purchase' AND last_click IS NOT NULL),
        |m AS (SELECT wks, v,
        |        row_number() OVER (PARTITION BY wks ORDER BY v) AS rn,
        |        count(*) OVER (PARTITION BY wks) AS n
        |      FROM gg)
        |SELECT wks AS week, CAST(max(n) AS BIGINT) AS n_conv,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS median_lag_s
        |FROM m GROUP BY wks ORDER BY week""".stripMargin,

    "q_agg_kendall" -> kendallSql(epoch = "epoch", idiv = "//",
      series = "unnest(generate_series(mn, mx))"),

    "q_agg_spearman" -> spearmanSql(epoch = "epoch", idiv = "//",
      series = "unnest(generate_series(mn, mx))"),

    "q_agg_ols_trend" -> olsTrendSql(epoch = "epoch", idiv = "//"),

    "q_report_market_basket" ->
      s"""WITH mbb AS MATERIALIZED ($marketBasketBaseSql),
         |${marketBasketSql(bRef = "mbb", idiv = "//").stripPrefix("WITH ")}""".stripMargin,

    "q_agg_mutual_info" -> mutualInfoSql,

    "q_agg_mann_kendall" -> mannKendallSql(epoch = "epoch", idiv = "//"),

    "q_agg_circular_mean" -> circularMeanSql(epoch = "epoch", idiv = "//"),

    "q_agg_dispersion" -> dispersionSql(epoch = "epoch", idiv = "//",
      series = "unnest(generate_series(mn, mx))"),

    "q_report_kaplan_meier" -> kaplanMeierSql(epoch = "epoch", idiv = "//")
  )
}
