package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime filtering at scale: the two optimizer mechanisms that cut the
  * large side of a selective join BEFORE the shuffle/scan cost is paid.
  *
  * - Runtime bloom filter (SPARK-32268): for a shuffled join with a
  *   selective creation side, Catalyst injects a bloom-filter aggregate on
  *   the small side and a `might_contain` filter on the large side, so most
  *   non-matching rows die at the scan instead of crossing the shuffle. At
  *   100 TB this is the difference between shuffling the full fact table
  *   and shuffling the ~matching slice.
  *
  * - Dynamic partition pruning (SPARK-11150): a literal predicate on the
  *   dim side of a join over a PARTITIONED fact turns into a runtime
  *   subquery filter on the fact's partition column — whole directories are
  *   never listed, let alone read. DPP is why "partition the fact on the
  *   join/filter key" is a 100 TB table-layout rule, not a style choice.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkSessionTest
    with AdaptiveSparkPlanHelper {

  private def withConfs[A](confs: Seq[(String, String)])(f: => A): A = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter is injected on the large side of a selective join") {
    withConfs(Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffled join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the test corpus is tiny; drop the size gates so the rewrite fires
      // exactly as it would on a TB-scale application side
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")) {
      val lineitem = Tables.lineitem(spark, sf0001)
      val part = Tables.part(spark, sf0001).filter(col("p_size") === 1)
      val joined = lineitem.join(part, lineitem("l_partkey") === part("p_partkey"))
        .select(col("l_orderkey"), col("p_name"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom-filter runtime filter in:\n$plan")
      // parity: the filter is semantically transparent
      val expected = Tables.lineitem(spark, sf0001).join(
        Tables.part(spark, sf0001).filter(col("p_size") === 1),
        col("l_partkey") === col("p_partkey")).count()
      assert(joined.count() === expected && expected > 0)
    }
  }

  test("dynamic partition pruning turns a dim filter into a partition filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val events = Tables.events(spark, sf0001)
    events.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    withConfs(Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true")) {
      import spark.implicits._
      // the dim must be a file-backed relation: a LocalRelation's filter is
      // constant-folded away, and the PartitionPruning rule only fires when
      // the dim side retains a selective predicate
      val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
      Seq(("error", "bad"), ("click", "ok"), ("view", "ok"))
        .toDF("event_type", "flag").write.mode("overwrite").parquet(dimDir)
      val dim = spark.read.parquet(dimDir)
        .filter(col("flag") === "bad") // only 'error' survives
      val fact = spark.read.parquet(dir)
      val joined = fact.join(dim, Seq("event_type")).select("event_id", "flag")
      joined.collect()
      val scans = collect(joined.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s
      }
      val factScan = scans.find(_.output.exists(_.name == "event_id")).get
      // the partition filter on the fact scan must be DYNAMIC (subquery
      // result of the dim filter), not a literal the user never wrote
      assert(factScan.partitionFilters.exists(
        _.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression]).isDefined),
        s"expected DynamicPruningExpression in ${factScan.partitionFilters}")
      val expected = events.filter(col("event_type") === "error").count()
      assert(joined.count() === expected && expected > 0)
    }
  }

  test("AQE coalesces small shuffle partitions below the configured count") {
    // 32 shuffle partitions configured, but a tiny aggregate's shuffle
    // carries a few KB — AQE folds the reducers down so task-launch
    // overhead doesn't dominate. The same mechanism right-sizes reducer
    // counts at 100 TB where static tuning is impossible; asserting it
    // here pins that graft sessions leave AQE coalescing enabled.
    val agg = Tables.events(spark, sf0001)
      .groupBy("event_type").count()
    val rows = agg.collect()
    assert(rows.length == 5)
    val finalShuffleReaders = collect(agg.queryExecution.executedPlan) {
      case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec => r
    }
    assert(finalShuffleReaders.nonEmpty, "AQE shuffle read missing")
    assert(finalShuffleReaders.head.partitionSpecs.length <
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      "tiny shuffle should coalesce below the configured partition count")
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // One hot key dominates the left side; with broadcast off the join is
    // an SMJ whose hot partition dwarfs the median. AQE's skew handling
    // splits that partition into subpartitions at runtime — the automatic
    // twin of Skew.saltedJoin's manual salting, and the mechanism that
    // keeps one 100 GB key from serializing a 1000-executor join.
    // Thresholds are lowered so the corpus-sized fixture trips the same
    // code path a TB-scale skew would.
    withConfs(Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // keep coalescing from merging everything back into one partition
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")) {
      import spark.implicits._
      val left = spark.range(0, 60000)
        .select((when($"id" % 20 === 0, $"id" % 3 + 1).otherwise(0L)).as("k"),
          concat(lit("payload_payload_payload_"), $"id").as("pad"))
      val right = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
      val joined = left.join(right, "k")
      // materialize THIS plan (count() would execute a different one and
      // leave joined's AdaptiveSparkPlan unevaluated)
      assert(joined.collect().length == 60000)
      val smjs = collect(joined.queryExecution.executedPlan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smjs.nonEmpty, joined.queryExecution.executedPlan.toString.take(400))
      assert(smjs.exists(_.isSkewJoin),
        "expected AQE to mark the hot partition skew=true:\n" +
          joined.queryExecution.executedPlan.toString.take(600))
    }
  }
}
