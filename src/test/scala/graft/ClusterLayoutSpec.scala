package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Proves q_maintain_cluster's claim with scan metrics: a sort-ordered
  * layout (range partition + sortWithinPartitions on the filter key,
  * small row groups) lets parquet min/max stats skip row groups, so the
  * scan OUTPUTS ~only the matching slice; the same data written in
  * arrival order outputs ~everything (every row group spans the full
  * value range, no group can be skipped, and the engine filters
  * post-scan). The ratio is the measurable value of the maintenance
  * step — at 100 TB it is the difference between reading a terabyte and
  * reading a row group. */
class ClusterLayoutSpec extends AnyFunSuite with SparkSessionTest {
  private val sf001dir = "/root/testdata/sf0.01"

  test("sorted layout skips row groups on the clustered key") {
    val base = java.nio.file.Files.createTempDirectory("graft_clu_spec").toString
    val ev = Tables.events(spark, sf001dir)
      .select(col("event_id"), col("value"), to_date(col("ts")).as("day"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType),
      StructField("day", DateType)))
    ev.repartitionByRange(4, col("value")).sortWithinPartitions("value")
      .write.option("parquet.block.size", 8 * 1024).parquet(s"$base/clu")
    ev.repartition(4)
      .write.option("parquet.block.size", 8 * 1024).parquet(s"$base/unc")

    def scanOut(dir: String): (Long, Long) = {
      val df = spark.read.schema(schema).parquet(dir)
        .filter(col("value") >= 50.0 && col("value") < 51.0)
        .select("event_id")
      val rows = df.collect().length.toLong
      val plan = df.queryExecution.executedPlan
      // the range predicate must be pushed for stats skipping to exist
      val scan = plan.collectLeaves().collectFirst {
        case f: FileSourceScanExec => f
      }.getOrElse(fail(s"no FileSourceScanExec in:\n$plan"))
      assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(value"),
        s"value bound not pushed: ${scan.metadata("PushedFilters")}")
      (rows, scan.metrics("numOutputRows").value)
    }

    val (rowsClu, outClu) = scanOut(s"$base/clu")
    val (rowsUnc, outUnc) = scanOut(s"$base/unc")
    assert(rowsClu == rowsUnc && rowsClu > 0, s"result mismatch $rowsClu/$rowsUnc")
    // unclustered reads essentially the whole table; clustered reads the
    // few row groups whose min/max overlap [50, 51)
    assert(outUnc > 5000, s"fixture too small to discriminate: unc=$outUnc")
    assert(outClu * 5 < outUnc,
      s"no row-group skipping: clustered scan=$outClu vs unclustered=$outUnc")

    // cleanup
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }
}
