package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declarative data-quality gate (the Deequ-style check every
  * production pipeline runs before data is allowed downstream), built the
  * Spark-first way: ALL rule metrics compute in ONE aggregate pass over
  * the table — one scan, one partial+final hash aggregate, however many
  * rules — and the per-rule report rows are exploded from that single
  * metrics row. Adding a rule adds an aggregate expression, never a scan.
  *
  * Rules are (name, metric, op, threshold) with metrics as exact
  * count-ratios, so verdicts compare bit-identical doubles in both
  * engines and the whole report is hash-oracle-checked. The fixture rule
  * set intentionally contains a failing row (`accepted_event_type`
  * excludes two real event types): a gate whose demo only ever passes
  * proves nothing about its ability to fail.
  */
object QualityOps {

  /** (rule, metric SQL over events, op, threshold) — the declarative rule
    * table; metricsSql/reportSql compile it into the one-pass plan. */
  private val rules: Seq[(String, String, String, Double)] = Seq(
    ("rows_nonempty", "CAST(count(*) AS DOUBLE)", ">=", 1.0),
    ("completeness_value",
      "CAST(count(value) AS DOUBLE) / count(*)", ">=", 0.99),
    ("uniqueness_event_id",
      "CAST(count(DISTINCT event_id) AS DOUBLE) / count(*)", ">=", 1.0),
    ("validity_value_nonneg",
      "CAST(sum(CASE WHEN value >= 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)",
      ">=", 0.5),
    ("accepted_event_type",
      "CAST(sum(CASE WHEN event_type IN ('click', 'view', 'purchase') THEN 1 ELSE 0 END) AS DOUBLE) / count(*)",
      ">=", 0.99),
    ("user_coverage",
      "CAST(count(DISTINCT user_id) AS DOUBLE)", ">=", 10.0))

  private def metricExprs: String =
    rules.map { case (n, m, _, _) => s"$m AS m_$n" }.mkString(",\n  ")

  private def verdict(metric: String, op: String, thr: String): String =
    s"CAST(CASE WHEN ($op = '>=' AND $metric >= $thr) OR ($op = '=' AND $metric = $thr) THEN 1 ELSE 0 END AS BIGINT)"

  /** Spark form: one aggregate row, report exploded from an inline array
    * of rule structs — a single pass regardless of rule count. */
  private val sparkSql: String = {
    val ruleStructs = rules.map { case (n, _, op, thr) =>
      s"named_struct('rule', '$n', 'metric', m_$n, 'op', '$op', 'threshold', CAST($thr AS DOUBLE))"
    }.mkString(",\n    ")
    s"""WITH m AS (SELECT
       |  $metricExprs
       |FROM events)
       |SELECT r.rule, round(r.metric, 6) AS metric, r.op, r.threshold,
       |  ${verdict("r.metric", "r.op", "r.threshold")} AS pass
       |FROM m
       |LATERAL VIEW explode(array(
       |    $ruleStructs)) t AS r
       |ORDER BY rule""".stripMargin
  }

  /** Oracle form: same metrics CTE (DuckDB materializes it once), report
    * as a VALUES-driven join instead of Spark's explode-of-structs. */
  private val duckSql: String = {
    val values = rules.map { case (n, _, op, thr) =>
      s"('$n', '$op', CAST($thr AS DOUBLE))"
    }.mkString(",\n    ")
    val metricCase = rules.map { case (n, _, _, _) =>
      s"WHEN r.rule = '$n' THEN m.m_$n"
    }.mkString("\n    ")
    s"""WITH m AS (SELECT
       |  $metricExprs
       |FROM events),
       |r AS (SELECT * FROM (VALUES
       |    $values) AS t(rule, op, threshold)),
       |j AS (SELECT r.rule, r.op, r.threshold,
       |        CASE $metricCase END AS metric
       |      FROM r CROSS JOIN m)
       |SELECT rule, round(metric, 6) AS metric, op, threshold,
       |  ${verdict("metric", "op", "threshold")} AS pass
       |FROM j ORDER BY rule""".stripMargin
  }

  /** Cross-table referential-integrity expectations — the FK-validation
    * suite the single-table gate can't express: each relationship is a
    * LEFT JOIN to the parent's UNIQUE key (no fanout) counting unmatched
    * children. At 100 TB each check is the standard hash/broadcast
    * anti-join shape on the key, map-side combinable counts; four checks
    * = four bounded joins, unioned into one report. Identical SQL in
    * both engines. */
  private val referentialSql: String = {
    def check(rel: String, child: String, ck: String,
              parent: String, pk: String): String =
      s"""SELECT '$rel' AS rel, count(*) AS n_child,
         |  CAST(sum(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
         |  CAST(CASE WHEN sum(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) = 0
         |       THEN 1 ELSE 0 END AS BIGINT) AS pass
         |FROM $child c LEFT JOIN $parent p ON c.$ck = p.$pk""".stripMargin
    Seq(
      check("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      check("lineitem.l_partkey -> part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      check("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      check("orders.o_custkey -> customer", "orders", "o_custkey",
        "customer", "c_custkey")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY rel")
  }

  /** Tabular data-drift report — the ingest-batch comparison every
    * pipeline dashboard runs before accepting a new drop (the relational
    * sibling of q_vec_centroid_drift's geometric one). Cohorts stand in
    * for old/new batches via event_id parity; per event_type the report
    * carries volume shares, share delta, and decimal-exact mean shift.
    * One scan, two tiny aggregates, broadcastable cohort totals —
    * identical SQL in both engines. */
  private val driftSql: String =
    """WITH c AS (SELECT event_type, CAST(event_id % 2 AS INT) AS coh, value
      |           FROM events),
      |t AS (SELECT coh, count(*) AS nt FROM c GROUP BY coh),
      |m AS (SELECT event_type, coh, count(*) AS n,
      |        CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / count(*) AS mean_v
      |      FROM c GROUP BY event_type, coh)
      |SELECT o.event_type AS event_type, o.n AS n_old, nw.n AS n_new,
      |  round(CAST(o.n AS DOUBLE) / ot.nt, 6) AS share_old,
      |  round(CAST(nw.n AS DOUBLE) / nt.nt, 6) AS share_new,
      |  round(CAST(nw.n AS DOUBLE) / nt.nt - CAST(o.n AS DOUBLE) / ot.nt, 6) AS share_delta,
      |  round(o.mean_v, 6) AS mean_old, round(nw.mean_v, 6) AS mean_new,
      |  round(nw.mean_v - o.mean_v, 6) AS mean_shift
      |FROM m o JOIN m nw ON o.event_type = nw.event_type
      |  AND o.coh = 0 AND nw.coh = 1
      |JOIN t ot ON ot.coh = 0
      |JOIN t nt ON nt.coh = 1
      |ORDER BY event_type""".stripMargin

  /** Per-column profiling report over `events` — the first thing any
    * ingest pipeline runs on an unknown drop: row count, null count/rate,
    * distinct cardinality and top-value share per column. Every column is
    * projected to an ENGINE-PORTABLE string domain first (integers/strings
    * verbatim, ts as epoch seconds, value as round-half-up cents — a raw
    * double→string cast formats differently per engine and would poison
    * the hash gate). The unpivot is dialect-parameterized: Spark uses a
    * single-scan stack() generator, the oracle a UNION ALL — both produce
    * the same (name, v) relation, and everything downstream is two hash
    * aggregates over it (distinct counts shuffle on (name, v): the 100 TB
    * shape, no per-column full scans). */
  private def profileSql(unpivot: String, idiv: String): String =
    s"""WITH u AS ($unpivot),
       |base AS (SELECT name, CAST(count(*) AS BIGINT) AS n,
       |           CAST(count(v) AS BIGINT) AS n_nonnull
       |         FROM u GROUP BY name),
       |g AS (SELECT name, v, CAST(count(*) AS BIGINT) AS c
       |      FROM u WHERE v IS NOT NULL GROUP BY name, v),
       |s AS (SELECT name, CAST(count(*) AS BIGINT) AS n_distinct,
       |        CAST(max(c) AS BIGINT) AS top_c
       |      FROM g GROUP BY name)
       |SELECT b.name AS column_name, b.n, b.n - b.n_nonnull AS n_null,
       |  CAST((b.n - b.n_nonnull) * 1000000 $idiv b.n AS BIGINT) AS null_ppm,
       |  s.n_distinct,
       |  CASE WHEN b.n_nonnull = 0 THEN CAST(NULL AS BIGINT)
       |       ELSE CAST(s.top_c * 1000000 $idiv b.n_nonnull AS BIGINT) END AS top1_ppm
       |FROM base b LEFT JOIN s ON s.name = b.name
       |ORDER BY column_name""".stripMargin

  private def profCols(epoch: String): Seq[(String, String)] = Seq(
    "event_id" -> "CAST(event_id AS STRING)",
    "user_id" -> "CAST(user_id AS STRING)",
    "event_type" -> "event_type",
    "props" -> "props",
    "ts_sec" ->
      s"CAST(CAST($epoch(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS BIGINT) AS STRING)",
    "value_cents" -> "CAST(CAST(floor(value * 100e0 + 0.5) AS BIGINT) AS STRING)")

  private val profileSparkUnpivot: String =
    "SELECT stack(6, " + profCols("unix_timestamp")
      .map { case (n, e) => s"'$n', $e" }.mkString(", ") +
      ") AS (name, v) FROM events"

  private val profileDuckUnpivot: String = profCols("epoch")
    .map { case (n, e) =>
      s"SELECT '$n' AS name, ${e.replace("AS STRING", "AS VARCHAR")} AS v FROM events" }
    .mkString("\n       UNION ALL\n       ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_report" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(sparkSql)
    }),

    "q_quality_profile" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(profileSql(profileSparkUnpivot, "DIV"))
    }),

    "q_quality_drift" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(driftSql)
    }),

    "q_quality_referential" -> ((s, sf) => {
      Tables.lineitem(s, sf).createOrReplaceTempView("lineitem")
      Tables.orders(s, sf).createOrReplaceTempView("orders")
      Tables.part(s, sf).createOrReplaceTempView("part")
      Tables.supplier(s, sf).createOrReplaceTempView("supplier")
      Tables.customer(s, sf).createOrReplaceTempView("customer")
      s.sql(referentialSql)
    }))

  /** The zero-extra-pass twin of the gate: `observe()` piggybacks quality
    * counters onto ANY query's existing execution — the metrics ride the
    * rows the query was already processing (an AggregatingAccumulator on
    * the observed node, merged task-side), so a pipeline gets row counts /
    * null counts / domain violations for free on every run instead of
    * paying a second scan for a separate audit query. Batch reads the
    * result off [[org.apache.spark.sql.Observation]]; in streaming the
    * same call surfaces per-batch via QueryProgress.observedMetrics. */
  def observeQuality(df: DataFrame, obs: org.apache.spark.sql.Observation): DataFrame = {
    import org.apache.spark.sql.functions._
    df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_negative_value"),
      approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))
  }

  val oracle: Map[String, String] = Map(
    "q_quality_report" -> duckSql,
    "q_quality_referential" -> referentialSql,
    "q_quality_drift" -> driftSql,
    "q_quality_profile" -> profileSql(profileDuckUnpivot, "//"))
}
