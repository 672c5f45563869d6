package graft

import graft.operators.TpchOps
import org.scalatest.funsuite.AnyFunSuite

/** Decorrelation proof for the TPC-H sweep (TpchOps): each classic
  * subquery shape must plan as joins + aggregates — NO per-row subquery
  * re-execution, no cartesian fallback. Catalyst either decorrelates a
  * correlated subquery or fails analysis, so the load-bearing assertions
  * are on the PHYSICAL plan: zero CartesianProduct / nested-loop nodes,
  * and the EXISTS / NOT EXISTS / IN shapes visible as semi / anti hash
  * or merge joins. Uncorrelated scalar subqueries (Q15's max, Q22's
  * count/sum) legitimately remain one-shot Subquery nodes — those are
  * allowed; what's banned is anything executed once per outer row. */
class TpchSpec extends AnyFunSuite with SparkSessionTest {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect() // force AQE finalization so the final plan is inspected
    df.queryExecution.executedPlan.toString
  }

  private def assertDecorrelated(p: String): Unit = {
    assert(!p.contains("CartesianProduct"), s"cartesian product in plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$p")
  }

  test("q2: correlated scalar MIN decorrelates to aggregate + equi-join") {
    val p = plan("q_tpch_q2")
    assertDecorrelated(p)
    // the correlated min becomes a grouped aggregate joined back on the
    // correlation key — at least one grouped HashAggregate must survive
    assert(p.contains("HashAggregate"), p)
  }

  test("q13: filtered left outer join keeps zero-order customers") {
    val p = plan("q_tpch_q13")
    assertDecorrelated(p)
    assert(p.contains("LeftOuter"), p)
  }

  test("q15: scalar max over the revenue view is a one-shot subquery") {
    val p = plan("q_tpch_q15")
    assertDecorrelated(p)
    assert(p.contains("Subquery") || p.contains("subquery"), p)
  }

  test("q17: correlated per-group AVG decorrelates to aggregate + join") {
    val p = plan("q_tpch_q17")
    assertDecorrelated(p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q20: nested IN + correlated HAVING plan is semi-join shaped") {
    val p = plan("q_tpch_q20")
    assertDecorrelated(p)
    assert(p.contains("LeftSemi"), p)
  }

  test("q21: EXISTS / NOT EXISTS become semi + anti joins") {
    val p = plan("q_tpch_q21")
    assertDecorrelated(p)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q22: NOT EXISTS is an anti join; scalar aggs are one-shot") {
    val p = plan("q_tpch_q22")
    assertDecorrelated(p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q4: EXISTS with outer-referencing interval comparison is a semi join") {
    val p = plan("q_tpch_q4")
    assertDecorrelated(p)
    assert(p.contains("LeftSemi"), p)
  }

  test("q5: 6-way nation-cycle join stays hash/merge, no cartesian") {
    val p = plan("q_tpch_q5")
    assertDecorrelated(p)
  }

  test("q6: all three range filters reach the lineitem scan") {
    val df = SparkEntry.queries("q_tpch_q6")(spark, sf0001)
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    // shipdate, discount, and quantity predicates must all be pushed
    assert(scan.contains("PushedFilters"), scan)
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(scan.contains(c), s"$c not pushed to scan:\n$scan")
    }
  }

  test("q7/q8: double nation alias + conditional share plan without BNLJ") {
    assertDecorrelated(plan("q_tpch_q7"))
    assertDecorrelated(plan("q_tpch_q8"))
  }

  test("q11: value relation is materialized once, not re-scanned per scalar") {
    val df = SparkEntry.queries("q_tpch_q11")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // rows + count scalar + sum scalar must all read the checkpointed
    // relation — the one-shot text's 3x-inlined CTE scanned lineitem 3x
    assert(!p.contains("Scan parquet"), s"parquet scan leaked into q11:\n$p")
    assert("LocalTableScan|Scan ExistingRDD".r.findFirstIn(p).isDefined, p)
  }

  test("q16: NOT IN plans as a null-aware anti join") {
    val p = plan("q_tpch_q16")
    assertDecorrelated(p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q18: IN over grouped HAVING plans as a semi join") {
    val p = plan("q_tpch_q18")
    assertDecorrelated(p)
    assert(p.contains("LeftSemi"), p)
  }

  test("row sanity at sf0.001: every tpch query returns rows") {
    TpchOps.sqls.keys.foreach { name =>
      val n = SparkEntry.queries(name)(spark, sf0001).count()
      assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
