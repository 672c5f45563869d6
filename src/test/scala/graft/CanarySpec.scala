package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CanaryOps

/** Pins the Spark side of the oracle-drift canary to its literal expected
  * values. With these green, any driver-capture red on
  * q_canary_engine_drift is attributable to the ORACLE engine (or the
  * driver's value hasher) moving — the column that differs names the
  * drifted surface (see the drift matrix in [[CanaryOps]]'s scaladoc). */
class CanarySpec extends AnyFunSuite with SparkSessionTest {

  test("canary columns equal their pinned values") {
    val row = CanaryOps.queries("q_canary_engine_drift")(spark, sf0001)
      .collect() match {
      case Array(r) => r
      case rs => fail(s"expected exactly one canary row, got ${rs.length}")
    }
    assert(row.getAs[Int]("canary_id") == 1)
    assert(row.getAs[Long]("neg_floordiv") == -3L,
      "integer division drifted from truncation toward zero")
    assert(row.getAs[Long]("big_sum") == Long.MaxValue,
      "BIGINT sum at the int64 boundary drifted")
    assert(row.getAs[Double]("dbl_third") == 1.0 / 3.0)
    assert(row.getAs[Double]("dbl_point3") == 0.1 + 0.2)
    // the formatted shortest-roundtrip text is what the driver hashes
    assert((1.0 / 3.0).toString == "0.3333333333333333")
    assert((0.1 + 0.2).toString == "0.30000000000000004")
    assert(row.getAs[Long]("round_half_pos") == 3L,
      "round-half on doubles drifted from away-from-zero")
    assert(row.getAs[Long]("round_half_neg") == -3L)
    assert(row.getAs[Long]("list_sum") == 2L)
    assert(row.getAs[Long]("empty_list_sum") == -1L,
      "empty-list aggregation no longer yields NULL")
  }

  test("canary plan reads no files and shuffles no data") {
    val plan = CanaryOps.queries("q_canary_engine_drift")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"), s"canary read a file:\n$plan")
    // the 3-row VALUES sum legitimately collapses through one
    // SinglePartition exchange; anything keyed would be a real shuffle
    assert(!plan.contains("hashpartitioning"), s"canary shuffled:\n$plan")
  }
}
