package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The human front door: a one-shot CLI over the same Catalyst plans the
  * operator registry serves — the log-analyzer genre's `<tool> search
  * <pattern>` / `<tool> report <name>` surface.
  *
  * Usage (runMain graft.Main or the packaged jar):
  *
  *   graft.Main <sfDir> search <pattern> [--from <ts>] [--to <ts>]
  *              [--type events|documents] [--limit N]
  *   graft.Main <sfDir> report top-talkers|error-bursts|slo [--limit N]
  *   graft.Main <sfDir> sql "<SELECT ...>"
  *
  * `search` delegates to [[Search.keywordSearch]] (ts bounds push down to
  * parquet row-group stats; contains() runs in whole-stage codegen).
  * `report` runs a canned operational readout over the corpus views:
  *
  *   - top-talkers:  noisiest users by event volume + exact decimal sum
  *   - error-bursts: the minutes with the most error events (burst triage)
  *   - slo:          per-type traffic, error ppm and integer-ppm Apdex
  *                   (satisfied ≤ 100, tolerating ≤ 400 — the same
  *                   thresholds as q_report_apdex / StreamOps.apdexWindows)
  *
  * Every report is a plain filter/groupBy plan — partition-prunable and
  * map-side combinable at 100 TB; the CLI only caps and prints. */
object Main {

  /** Build the result for parsed args — separated from main so MainSpec
    * can drive the CLI end-to-end without forking a JVM or stopping the
    * shared session. */
  def run(spark: SparkSession, sfDir: String, args: Seq[String]): DataFrame = {
    Search.registerViews(spark, sfDir)
    val opts = args.drop(args.indexWhere(_.startsWith("--")) match {
      case -1 => args.length; case i => i
    }).sliding(2, 2).collect {
      case Seq(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val limit = opts.getOrElse("limit", "20").toInt
    args.toList match {
      case "search" :: pattern :: _ =>
        Search.keywordSearch(spark, sfDir, pattern,
          table = opts.getOrElse("type", "events"),
          from = opts.get("from"), to = opts.get("to"), limit = limit)
      case "report" :: name :: _ => report(spark, name, limit)
      case "sql" :: q :: _ => spark.sql(q)
      case other => sys.error(
        s"""unknown command: ${other.mkString(" ")}
           |usage: <sfDir> search <pattern> [--from ts] [--to ts] [--type events|documents] [--limit N]
           |       <sfDir> report top-talkers|error-bursts|slo [--limit N]
           |       <sfDir> sql "<SELECT ...>"""".stripMargin)
    }
  }

  private def report(s: SparkSession, name: String, limit: Int): DataFrame = {
    val events = s.table("events")
    name match {
      case "top-talkers" =>
        events.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_types"),
            sum(col("value").cast(DecimalType(30, 6))).cast(DoubleType)
              .as("sum_value"))
          .orderBy(col("n_events").desc, col("user_id"))
          .limit(limit)
      case "error-bursts" =>
        events.filter(col("event_type") === "error")
          .groupBy(date_trunc("minute", col("ts")).as("minute"))
          .agg(count(lit(1)).as("n_errors"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("n_errors").desc, col("minute"))
          .limit(limit)
      case "slo" =>
        events.filter(col("value").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"),
            sum(when(col("value") <= 100, 1L).otherwise(0L)).as("n_sat"),
            sum(when(col("value") > 100 && col("value") <= 400, 1L)
              .otherwise(0L)).as("n_tol"))
          .select(col("event_type"), col("n"),
            ((col("n_err") * 1000000L) / col("n")).cast("long").as("err_ppm"),
            ((col("n_sat") * 1000000L + col("n_tol") * 500000L) / col("n"))
              .cast("long").as("apdex_ppm"))
          .orderBy("event_type")
      case other => sys.error(
        s"unknown report '$other' (have: top-talkers, error-bursts, slo)")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(sys.error(
      "usage: Main <sfDir> search|report|sql ..."))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, args.drop(1).toSeq).show(100, truncate = false)
    spark.stop()
  }
}
