package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The genre front door (graft.Search): three searches through the same
  * entry points the CLI main uses, plus plan checks that keyword mode
  * stays a pushed-down scan (the property that makes it viable at
  * 100 TB: time bounds reach parquet stats, no shuffle before LIMIT). */
class SearchSpec extends AnyFunSuite with SparkSessionTest {

  test("SQL mode answers over registered corpus views") {
    Search.registerViews(spark, sf0001)
    val df = spark.sql(
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.nonEmpty && m.values.forall(_ > 0))
    // views cover the whole corpus database
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings", "events").foreach { t =>
      assert(spark.catalog.tableExists(t), s"view $t missing")
    }
  }

  test("keyword search over events honors the time range") {
    val rows = Search.keywordSearch(spark, sf0001, "click",
      from = Some("2024-01-02T00:00:00"), to = Some("2024-01-05T00:00:00"),
      limit = 50).collect()
    assert(rows.nonEmpty)
    val lo = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    rows.foreach { r =>
      val ts = r.getAs[java.sql.Timestamp]("ts")
      assert(!ts.before(lo) && ts.before(hi), s"out of range: $ts")
      assert(r.getAs[String]("event_type").toLowerCase.contains("click") ||
        Option(r.getAs[String]("props")).exists(_.toLowerCase.contains("click")))
    }
    // oracle: same predicate spelled directly
    val want = Tables.events(spark, sf0001)
      .filter(col("ts") >= lit("2024-01-02T00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-05T00:00:00").cast("timestamp"))
      .filter(lower(col("event_type")).contains("click") ||
        lower(col("props")).contains("click"))
      .count()
    assert(rows.length == math.min(want, 50L))
  }

  test("keyword search over documents returns snippets") {
    val rows = Search.keywordSearch(spark, sf0001, "the",
      table = "documents", limit = 10).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(r.getAs[String]("snippet").length <= 120)
    }
  }

  test("keyword plan pushes the time bound into the parquet scan") {
    val df = Search.keywordSearch(spark, sf0001, "click",
      from = Some("2024-01-02T00:00:00"), limit = 5)
    val plan = df.queryExecution.executedPlan.toString
    // ts lower bound must reach the scan (PushedFilters), and the whole
    // thing is scan → filter → local/global limit — no exchange before
    // the TakeOrdered
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").matches("(?s).*PushedFilters:.*GreaterThanOrEqual\\(ts.*"),
      s"ts bound not pushed:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k plan:\n$plan")
  }
}
