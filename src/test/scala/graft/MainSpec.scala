package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI front door (graft.Main.run) smoke: each subcommand parses, plans,
  * and returns rows over the sf0.001 corpus; bad input fails loudly. */
class MainSpec extends AnyFunSuite with SparkSessionTest {

  test("search returns capped keyword hits") {
    val df = Main.run(spark, sf0001, Seq("search", "error", "--limit", "5"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 5)
  }

  test("search over documents with a time bound is rejected") {
    intercept[RuntimeException] {
      Main.run(spark, sf0001,
        Seq("search", "the", "--type", "documents", "--from", "2024-01-01"))
    }
  }

  test("report top-talkers ranks users by volume") {
    val rows = Main.run(spark, sf0001, Seq("report", "top-talkers")).collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getAs[Long]("n_events"))
    assert(counts.sameElements(counts.sortBy(-_)), "not volume-ranked")
  }

  test("report error-bursts returns busiest minutes") {
    val rows = Main.run(spark, sf0001,
      Seq("report", "error-bursts", "--limit", "3")).collect()
    assert(rows.nonEmpty && rows.length <= 3)
  }

  test("report slo emits ppm columns in range") {
    val rows = Main.run(spark, sf0001, Seq("report", "slo")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val apdex = r.getAs[Long]("apdex_ppm")
      assert(apdex >= 0L && apdex <= 1000000L)
    }
  }

  test("sql subcommand runs raw SQL over the registered views") {
    val rows = Main.run(spark, sf0001,
      Seq("sql", "SELECT count(*) AS n FROM events")).collect()
    assert(rows.head.getAs[Long]("n") > 0)
  }

  test("unknown commands and reports fail with usage") {
    intercept[RuntimeException] { Main.run(spark, sf0001, Seq("frobnicate")) }
    intercept[RuntimeException] {
      Main.run(spark, sf0001, Seq("report", "nope"))
    }
  }
}
