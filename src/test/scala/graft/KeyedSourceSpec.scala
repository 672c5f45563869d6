package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned join through the V2 connector partitioning contract
  * (SURVEY §4.3 scale path): both sides report KeyGroupedPartitioning on
  * `k`, so the join must plan WITHOUT shuffling either side when
  * `spark.sql.sources.v2.bucketing.enabled` is on — the open-API
  * equivalent of the bucketed-table zero-shuffle join (BucketingSpec). */
class KeyedSourceSpec extends AnyFunSuite with SparkSessionTest
    with AdaptiveSparkPlanHelper {

  private def keyed(tag: String, rowsPerKey: Int): DataFrame =
    spark.read.format("graft.sources.KeyedEventsDataSource")
      .option("nkeys", 8).option("rowsPerKey", rowsPerKey).option("tag", tag)
      .load()

  private def shuffles(df: DataFrame): Int = {
    df.collect() // finalize AQE
    collect(df.queryExecution.executedPlan) { case s: ShuffleExchangeExec => s }.length
  }

  test("v2 source round-trips its generated layout") {
    val df = keyed("a", 4)
    assert(df.count() == 32)                       // 8 keys x 4 rows
    assert(df.select("k").distinct().count() == 8)
    assert(df.rdd.getNumPartitions == 8)           // one partition per key
  }

  test("storage-partitioned join plans with zero shuffles and exact results") {
    val a = keyed("a", 4)
    val b = keyed("b", 3)
    val joined = a.join(b, "k").groupBy(a("k")).count().orderBy("k")
    withConf("spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val rows = joined.collect()
      assert(rows.length == 8 && rows.forall(_.getLong(1) == 12L)) // 4x3 per key
      // neither side shuffles for the join; the groupBy on k also rides
      // the reported partitioning, so the whole plan is exchange-free
      // except the final global sort
      val j = a.join(b, "k").select(a("k"), b("v"))
      assert(shuffles(j) == 0, "join must be shuffle-free under SPJ")
    }
  }

  test("same join shuffles both sides when SPJ is disabled (contrast)") {
    val a = keyed("a", 4)
    val b = keyed("b", 3)
    withConf("spark.sql.sources.v2.bucketing.enabled" -> "false",
             // keep the broadcast path out of the way so the contrast is
             // shuffle-vs-no-shuffle, not broadcast-vs-SPJ
             "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = a.join(b, "k").select(a("k"), b("v"))
      assert(shuffles(j) == 2, "without SPJ the same join shuffles both sides")
      assert(j.count() == 96) // 8 keys x 4 x 3 — results identical either way
    }
  }

  test("reported V2 statistics let Catalyst auto-broadcast the small side") {
    // big parquet fact table joined to the tiny V2 table, NO hint: the
    // broadcast can only come from the scan's estimateStatistics()
    val fact = Tables.lineitem(spark, sf0001)
      .select((col("l_orderkey") % 8).as("k"), col("l_extendedprice"))
    val dim = keyed("a", 2)
    val j = fact.join(dim, "k")
    j.collect()
    val bcasts = collect(j.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bcasts.nonEmpty, "V2 stats should drive an automatic broadcast")
  }

  private def withConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
