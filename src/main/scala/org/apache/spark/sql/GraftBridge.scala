package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` factory methods, following the
  * standard Spark-library pattern of placing one object inside the sql
  * package namespace (cf. SNIPPETS.md [1] — public pattern reference).
  * Everything else in this engine lives under `graft.*`.
  */
object GraftBridge {

  /** Wrap a (resolved) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(cs, plan)
  }

  /** Install an extra planner strategy on a live session (idempotent). */
  def addStrategy(spark: SparkSession, s: execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s)) {
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
    }
  }
}
