package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T2 — projection, filters, predicates, search (SURVEY §2 T2).
  *
  * All predicates here are Catalyst-native and push down to the parquet
  * scan (`PushedFilters`); substring/regex search stays in whole-stage
  * codegen. At 100 TB the time-range filter additionally prunes row groups
  * via parquet min/max stats — the log analyzer's dominant access path.
  */
object FilterOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_filter_eq" -> ((s, sf) =>
      Tables.events(s, sf)
        .filter(col("event_type") === "error")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")),

    // Range filter on the scan's own timestamp column with FOLDABLE bounds
    // (ANSI timestamp literals, session TZ = UTC), so it pushes into the
    // parquet scan as row-group min/max skipping — the dominant access
    // path for a log store at 100 TB. With a TIMESTAMP(NANOS) corpus
    // (where Tables.events layers a conversion over a raw-long scan) the
    // same bounds would be applied via Tables.eventsRaw in epoch-ns form;
    // the micros corpus needs no such detour.
    "q_filter_range_time" -> ((s, sf) =>
      Tables.events(s, sf)
        .filter(expr(
          "ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'"))
        .select(
          col("event_id"), col("event_type"),
          date_trunc("second", col("ts")).as("ts_s"))
        .orderBy("event_id")),

    "q_filter_compound" -> ((s, sf) =>
      Tables.events(s, sf)
        .filter(
          (col("event_type").isin("click", "view") || col("value").between(100.0, 200.0))
            && !(col("event_type") === "error" && col("value") < 50.0)
            && col("user_id") % 7 =!= 0
            && col("props").isNotNull)
        .select("event_id", "event_type", "user_id", "value")
        .orderBy("event_id")),

    "q_search_keyword" -> ((s, sf) =>
      Tables.documents(s, sf)
        .filter(col("text").contains("spark"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    "q_search_regex" -> ((s, sf) =>
      Tables.documents(s, sf)
        .filter(col("text").rlike("(join|merge) (window|stream)"))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Value histogram via explicit bucketing (floor((v-lo)/width)): the
    // engine-agnostic width_bucket — exact integer bucket ids, no
    // interpolation, one hash aggregate.
    "q_report_value_histogram" -> ((s, sf) =>
      Tables.events(s, sf)
        .groupBy(floor(col("value") / 50.0).cast("bigint").as("bucket"))
        .agg(
          count(lit(1)).as("cnt"),
          min(col("value")).as("lo"),
          max(col("value")).as("hi"))
        .orderBy("bucket")),

    // Log-analytics time histogram: daily event counts with error rate.
    "q_report_time_histogram" -> ((s, sf) =>
      Tables.events(s, sf)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          count(when(col("event_type") === "error", 1)).as("n_errors"),
          round(count(when(col("event_type") === "error", 1)).cast("double") / count(lit(1)), 6)
            .as("error_rate"))
        .orderBy("day")),

    "q_project_derived" -> ((s, sf) =>
      Tables.lineitem(s, sf)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // one IEEE multiply chain — bit-deterministic, no rounding needed
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"),
          when(col("l_quantity") > 40, "bulk")
            .when(col("l_quantity") > 20, "mid")
            .otherwise("small").as("qty_bucket"))
        // (l_orderkey, l_linenumber) is not unique: order by the full
        // emitted list so ties are identical rows (hash-order-proof)
        .orderBy("l_orderkey", "l_linenumber", "net", "qty_bucket"))
  )

  val oracle: Map[String, String] = Map(
    "q_filter_eq" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'error' ORDER BY event_id""".stripMargin,

    "q_filter_range_time" ->
      """SELECT event_id, event_type, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |ORDER BY event_id""".stripMargin,

    "q_filter_compound" ->
      """SELECT event_id, event_type, user_id, value FROM events
        |WHERE (event_type IN ('click','view') OR value BETWEEN 100.0 AND 200.0)
        |  AND NOT (event_type = 'error' AND value < 50.0)
        |  AND user_id % 7 <> 0
        |  AND props IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q_search_keyword" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE text LIKE '%spark%' ORDER BY doc_id""".stripMargin,

    "q_search_regex" ->
      """SELECT doc_id, lang FROM documents
        |WHERE regexp_matches(text, '(join|merge) (window|stream)')
        |ORDER BY doc_id""".stripMargin,

    "q_report_value_histogram" ->
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
        |  count(*) AS cnt, min(value) AS lo, max(value) AS hi
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_report_time_histogram" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  count(*) AS n_events,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
        |  round(CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS DOUBLE) / count(*), 6) AS error_rate
        |FROM events
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "q_project_derived" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS net,
        |  CASE WHEN l_quantity > 40 THEN 'bulk'
        |       WHEN l_quantity > 20 THEN 'mid'
        |       ELSE 'small' END AS qty_bucket
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, net, qty_bucket""".stripMargin
  )
}
