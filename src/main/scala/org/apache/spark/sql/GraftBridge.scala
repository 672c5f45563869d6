package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

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

  /** Install an extra optimizer rule on a live session (idempotent). */
  def addOptimization(spark: SparkSession, r: Rule[LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(r)) {
      cs.experimental.extraOptimizations = cs.experimental.extraOptimizations :+ r
    }
  }

  /** Install an extra planner strategy on a live session (idempotent). */
  def addStrategy(spark: SparkSession, s: execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s)) {
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
    }
  }

  /** A sibling session on the same SparkContext with its own
    * SparkSessionExtensions, loaded exactly the way a cluster loads them:
    * the `spark.sql.extensions` conf names the extensions class and the
    * session constructor instantiates+applies it. Needed because
    * builder.getOrCreate ignores extensions once a session exists, and
    * analyzer/parser extension points cannot be added post-hoc. */
  def newSessionWithExtensions(spark: SparkSession, extClass: String): SparkSession = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val conf = cs.sparkContext.conf
    // The conf lives on the SHARED SparkContext: restore it after the
    // constructor reads it, so sessions created later on the same context
    // don't silently inherit these extensions.
    val prev = conf.getOption("spark.sql.extensions")
    conf.set("spark.sql.extensions", extClass)
    try new classic.SparkSession(cs.sparkContext, new java.util.HashMap[String, String]())
    finally prev match {
      case Some(v) => conf.set("spark.sql.extensions", v)
      case None    => conf.remove("spark.sql.extensions")
    }
  }
}
