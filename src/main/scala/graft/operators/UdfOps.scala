package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

/** T12 — UDF / UDAF surface (SURVEY §2 T12).
  *
  * Exactly one scalar UDF and one typed Aggregator are exposed to prove the
  * extension surface; everything else in the engine stays on codegen'd
  * built-ins (UDFs are codegen-opaque — at 100 TB they break whole-stage
  * pipelines, so the rule is: built-ins first, `Expression` second, UDF
  * last).
  *
  * The Aggregator accumulates *exact decimal* moments (n, Σx, Σx²) — the
  * merge is associative and order-independent, so partial aggregation across
  * any number of partitions is deterministic — and finishes with the same
  * closed-form IEEE expression the oracle uses.
  */
object UdfOps {

  /** Buffer for the variance aggregator: exact decimal moments. */
  case class Moments(n: Long, s1: JBigDecimal, s2: JBigDecimal)

  /** Sample-variance Aggregator over exact decimal sums (scale 6 / 8,
    * HALF_UP — mirroring `CAST(x AS DECIMAL(30,6))` semantics). */
  object VarianceAgg extends Aggregator[Double, Moments, Double] {
    private def d6(x: Double) = new JBigDecimal(x, MathContext.UNLIMITED).setScale(6, RoundingMode.HALF_UP)
    private def d8(x: Double) = new JBigDecimal(x, MathContext.UNLIMITED).setScale(8, RoundingMode.HALF_UP)

    def zero: Moments = Moments(0L, JBigDecimal.ZERO, JBigDecimal.ZERO)
    def reduce(b: Moments, x: Double): Moments =
      Moments(b.n + 1, b.s1.add(d6(x)), b.s2.add(d8(x * x)))
    def merge(a: Moments, b: Moments): Moments =
      Moments(a.n + b.n, a.s1.add(b.s1), a.s2.add(b.s2))
    def finish(m: Moments): Double = {
      val n = m.n.toDouble
      val s1 = m.s1.doubleValue
      val s2 = m.s2.doubleValue
      (s2 - s1 * s1 / n) / (n - 1)
    }
    def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udf_scalar" -> ((s, sf) => {
      val sev = udf((d: Double) => if (d < 50.0) "low" else if (d < 200.0) "mid" else "high")
      Tables.events(s, sf)
        .select(col("event_id"), col("value"), sev(col("value")).as("sev"))
        .orderBy("event_id")
    }),

    "q_udaf_typed" -> ((s, sf) => {
      val varUdaf = udaf(VarianceAgg)
      Tables.events(s, sf)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(varUdaf(col("value")), 6).as("var_value"))
        .orderBy("event_type")
    }),

    // SQL-DEFINED scalar functions (Spark 4 `CREATE FUNCTION … RETURN
    // expr`): unlike the JVM-closure q_udf_scalar above, the body is a SQL
    // expression Catalyst INLINES into the caller's plan — it folds,
    // pushes down, and stays inside whole-stage codegen, so this is the
    // UDF form that scales (the closure UDF is the opaque last resort).
    // Same severity semantics as q_udf_scalar plus a net-of-tax amount fn;
    // the oracle writes the bodies inline, which is exactly what the plan
    // compiles to.
    "q_udf_sql" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_sev(v DOUBLE)
              |RETURNS STRING
              |RETURN CASE WHEN v < 50.0 THEN 'low'
              |            WHEN v < 200.0 THEN 'mid'
              |            ELSE 'high' END""".stripMargin)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_net(v DOUBLE, pct DOUBLE)
              |RETURNS DOUBLE
              |RETURN round(v * (1.0 - pct / 100.0), 6)""".stripMargin)
      s.sql(
        """SELECT event_id, graft_sev(value) AS sev,
          |  graft_net(value, 17.5) AS net
          |FROM events ORDER BY event_id""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_udf_scalar" ->
      """SELECT event_id, value,
        |  CASE WHEN value < 50.0 THEN 'low'
        |       WHEN value < 200.0 THEN 'mid'
        |       ELSE 'high' END AS sev
        |FROM events ORDER BY event_id""".stripMargin,

    "q_udaf_typed" ->
      """WITH m AS (
        |  SELECT event_type, count(value) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n, round((s2 - s1 * s1 / n) / (n - 1), 6) AS var_value
        |FROM m ORDER BY event_type""".stripMargin,

    "q_udf_sql" ->
      """SELECT event_id,
        |  CASE WHEN value < 50.0 THEN 'low'
        |       WHEN value < 200.0 THEN 'mid'
        |       ELSE 'high' END AS sev,
        |  round(value * (1.0 - 17.5 / 100.0), 6) AS net
        |FROM events ORDER BY event_id""".stripMargin
  )
}
