package graft

import org.scalatest.funsuite.AnyFunSuite

/** Correctness insurance for the bench-only shared-scan cache
  * (Tables.load with `graft.cache.tables=1`): the InMemoryRelation swap
  * must be RESULT-invisible — same rows, same order, for a
  * representative query per table-access pattern (plain scan, the
  * schema-pinned events time-range path, documentsPar repartition,
  * multi-table join). If this ever fails, the bench is timing a
  * different relation than Verify grades.
  */
class TablesCacheSpec extends AnyFunSuite with SparkSessionTest {

  private val probes = Seq(
    "q_agg_pricing_summary", // lineitem scan + aggregate
    "q_filter_range_time",   // events ts-range pushdown path
    "q_text_token_count",    // documentsPar repartitioned scan
    "q_join_multiway")       // several cached tables in one plan

  test("cached table scans return byte-identical results") {
    val uncached = probes.map(q =>
      q -> SparkEntry.queries(q)(spark, sf0001).collect().toSeq).toMap
    sys.props("graft.cache.tables") = "1"
    try {
      val cached = probes.map(q =>
        q -> SparkEntry.queries(q)(spark, sf0001).collect().toSeq).toMap
      for (q <- probes) assert(cached(q) == uncached(q), s"$q diverged under cache")
      // and the cache actually engaged: the plan reads from memory
      val plan = SparkEntry.queries(probes.head)(spark, sf0001)
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("InMemoryRelation"), plan.take(500))
    } finally {
      sys.props.remove("graft.cache.tables")
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
