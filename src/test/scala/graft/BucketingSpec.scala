package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located join (SURVEY §4.2 "partitioning & shuffle").
  *
  * At 100 TB the fact⋈fact join's two shuffles dominate; pre-bucketing both
  * tables on the join key at write time makes the join shuffle-FREE at read
  * time — the per-bucket layout IS the hash partitioning. This spec proves
  * the property on the actual plan: the same join that shuffles both sides
  * as plain parquet has zero ShuffleExchange over the scans once both
  * sides are bucketed `CLUSTERED BY (o_custkey/c_custkey) INTO 8 BUCKETS`.
  */
class BucketingSpec extends AnyFunSuite with SparkSessionTest
    with AdaptiveSparkPlanHelper {

  private def shufflesUnderJoin(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force AQE final plan
    collect(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }.size
  }

  test("bucketed saveAsTable makes the equi-join shuffle-free") {
    // (warehouse dir is a static conf — managed tables land in the default
    // ./spark-warehouse and are dropped in the finally block)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val orders = Tables.orders(spark, sf0001)
      val customer = Tables.customer(spark, sf0001)

      // plain parquet baseline: both sides must shuffle for the join
      val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(shufflesUnderJoin(plain) >= 2)

      orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b")
      customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b")

      val ob = spark.table("orders_b")
      val cb = spark.table("customer_b")
      val joined = ob.join(cb, ob("o_custkey") === cb("c_custkey"))
      // join itself: no shuffle above either scan — bucket layout is reused
      joined.collect()
      val joinShuffles = collect(joined.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }.size
      assert(joinShuffles === 0, "bucketed join must not shuffle")

      // result parity with the plain join
      val a = plain.orderBy("c_mktsegment").collect().toSeq
      val b = joined.groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment").collect().toSeq
      assert(a === b)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q_join_bucketed's graded join runs shuffle-free over the bucket layout") {
    try {
      val joined = graft.operators.JoinOps.bucketedJoin(spark, sf0001)
      assert(shufflesUnderJoin(joined) === 0,
        "bucketed graded join must reuse the bucket hash partitioning")
      // and the graded aggregate on top matches the plain-parquet join
      val graded = SparkEntry.queries("q_join_bucketed")(spark, sf0001).collect().toSeq
      val orders = Tables.orders(spark, sf0001)
      val customer = Tables.customer(spark, sf0001)
      val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
            .cast(org.apache.spark.sql.types.DoubleType).as("total"))
        .orderBy("c_mktsegment").collect().toSeq
      assert(graded === plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders__root_testdata_sf0_001")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_customer__root_testdata_sf0_001")
    }
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    // one hot key holding most rows — the "anonymous user" shape
    val fact = spark.range(0, 20000)
      .select((when(col("id") % 100 === 0, col("id") % 50).otherwise(lit(7L))).as("k"),
        col("id").as("v"))
    val dim = spark.range(0, 50).select(col("id").as("k"), (col("id") * 10).as("w"))
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // no keyed aggregation downstream: reusing the join's hash
      // partitioning would forbid the skew split
      val joined = fact.join(dim, Seq("k")).select(col("v") + col("w"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew split in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hive-style partitioned sink gives partition pruning on read") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val events = Tables.events(spark, sf0001)
    graft.sources.Sinks.writePartitioned(events, dir, Seq("event_type"))

    val back = spark.read.parquet(dir).filter(col("event_type") === "error")
    back.collect()
    val scans = collect(back.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // the event_type predicate must land in partitionFilters (directory
    // pruning — non-matching partitions are never listed or read), not in
    // dataFilters (per-row evaluation after reading everything)
    assert(scans.head.partitionFilters.exists(_.references.exists(_.name == "event_type")))
    val prunedRows = back.count()
    val expected = events.filter(col("event_type") === "error").count()
    assert(prunedRows === expected && prunedRows > 0)
  }
}
