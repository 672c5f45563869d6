package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-drift canary — one constant-time query whose columns deliberately
  * sit on the surfaces where SQL engines (and engine VERSIONS) are known to
  * disagree. It reads no tables, so a red canary row in a driver capture can
  * only mean "the compare layer or its engine moved", never "the corpus
  * changed" — turning an otherwise undiagnosable hash mismatch (like round 7's
  * q_mm_audio_energy, value-exact locally yet red at the driver) into a
  * self-identifying signal.
  *
  * Drift matrix — what each column pins, and what a future red means:
  *
  * | column          | pinned value           | drift surface it guards |
  * |-----------------|------------------------|-------------------------|
  * | neg_floordiv    | -3                     | integer division on negatives: Spark `DIV` and DuckDB 1.0 `//` both truncate toward zero; an engine that switches to flooring division returns -4 |
  * | big_sum         | 9223372036854775807    | BIGINT sum at the int64 boundary: DuckDB sums BIGINT through HUGEINT then narrows, Spark sums native long under ANSI overflow checks; a drift in the narrowing/overflow path moves or errors this |
  * | dbl_third       | 0.3333333333333333     | shortest-roundtrip double formatting (16 significant digits); a hasher that formats with %f / fewer digits changes the hashed text, not the value |
  * | dbl_point3      | 0.30000000000000004    | the classic 17-digit shortest-roundtrip case (0.1 + 0.2); same formatting guard at max precision |
  * | round_half_pos  | 3                      | round-half on doubles: both engines currently round 2.5 away from zero; a banker's-rounding (half-even) engine returns 2 |
  * | round_half_neg  | -3                     | same on the negative side (half-even would give -2) |
  * | list_sum        | 2                      | list/array aggregation (DuckDB `list_aggregate(...,'sum')` vs Spark higher-order `aggregate`) over a mixed-sign list |
  * | empty_list_sum  | -1                     | empty-list aggregation: both engines yield NULL (coalesced to -1); an engine that defines an empty sum as 0 returns 0 |
  *
  * A spec ([[graft.CanarySpec]]) asserts the Spark side equals these literal
  * pins, so any driver-capture red is attributable to the oracle engine (or
  * the driver's value hasher) by construction. Diagnose with
  * `tools/check.py` on the canary alone: the differing COLUMN names the
  * moved surface.
  *
  * Scale note: constant folding collapses the whole query at plan time —
  * zero scans, zero shuffles, sub-millisecond at any SF.
  */
object CanaryOps {

  private[graft] val canarySparkSql: String =
    """SELECT 1 AS canary_id,
      |  CAST(-7 DIV 2 AS BIGINT) AS neg_floordiv,
      |  (SELECT sum(v) FROM VALUES (CAST(4000000000000000000 AS BIGINT)),
      |     (CAST(4000000000000000000 AS BIGINT)),
      |     (CAST(1223372036854775807 AS BIGINT)) AS t(v)) AS big_sum,
      |  CAST(1 AS DOUBLE) / 3 AS dbl_third,
      |  CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS dbl_point3,
      |  CAST(round(CAST(2.5 AS DOUBLE)) AS BIGINT) AS round_half_pos,
      |  CAST(round(CAST(-2.5 AS DOUBLE)) AS BIGINT) AS round_half_neg,
      |  aggregate(array(CAST(5 AS BIGINT), CAST(-3 AS BIGINT), CAST(0 AS BIGINT)),
      |    CAST(0 AS BIGINT), (a, x) -> a + x) AS list_sum,
      |  coalesce(aggregate(CAST(array() AS ARRAY<BIGINT>),
      |    CAST(NULL AS BIGINT), (a, x) -> a + x), CAST(-1 AS BIGINT)) AS empty_list_sum""".stripMargin

  private[graft] val canaryOracleSql: String =
    """SELECT 1 AS canary_id,
      |  CAST((-7) // 2 AS BIGINT) AS neg_floordiv,
      |  (SELECT CAST(sum(v) AS BIGINT) FROM (VALUES (CAST(4000000000000000000 AS BIGINT)),
      |     (CAST(4000000000000000000 AS BIGINT)),
      |     (CAST(1223372036854775807 AS BIGINT))) t(v)) AS big_sum,
      |  CAST(1 AS DOUBLE) / 3 AS dbl_third,
      |  CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS dbl_point3,
      |  CAST(round(CAST(2.5 AS DOUBLE)) AS BIGINT) AS round_half_pos,
      |  CAST(round(CAST(-2.5 AS DOUBLE)) AS BIGINT) AS round_half_neg,
      |  CAST(list_aggregate([5, -3, 0], 'sum') AS BIGINT) AS list_sum,
      |  coalesce(CAST(list_aggregate(CAST([] AS BIGINT[]), 'sum') AS BIGINT),
      |    CAST(-1 AS BIGINT)) AS empty_list_sum""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_canary_engine_drift" -> ((s, _) => s.sql(canarySparkSql))
  )

  val oracle: Map[String, String] = Map(
    "q_canary_engine_drift" -> canaryOracleSql
  )
}
