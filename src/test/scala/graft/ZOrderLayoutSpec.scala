package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Proves q_maintain_cluster_z's either-column claim with scan metrics:
  * a bit-interleaved (Z-order) sort key keeps every row run narrow in
  * BOTH quantized dimensions, so parquet min/max stats skip row groups
  * for a selective predicate on EITHER column. The control is the
  * single-key layout from q_maintain_cluster: it skips on its own key
  * but reads ~everything for the other column. At 100 TB this is the
  * difference between one clustered column serving one dashboard and
  * one layout serving both. */
class ZOrderLayoutSpec extends AnyFunSuite with SparkSessionTest {
  private val sfDir = "/root/testdata/sf0.1"

  test("z-order layout skips row groups on either column; single-key only on its own") {
    val base = java.nio.file.Files.createTempDirectory("graft_z_spec").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"),
        to_date(col("ts")).as("day"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType), StructField("day", DateType)))

    // same quantization as the operator (bounds from one stats pass)
    val Array(st) = ev.agg(min("value"), max("value"),
      min("user_id"), max("user_id")).collect()
    val (vlo, vhi) = (st.getDouble(0), st.getDouble(1))
    val (ulo, uhi) = (st.getLong(2).toDouble, st.getLong(3).toDouble)
    def bucket8(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      least(lit(255), greatest(lit(0),
        floor((c.cast(DoubleType) - lit(lo)) / lit(hi - lo) * 256))).cast(IntegerType)
    val bx = bucket8(col("value"), vlo, vhi)
    val by = bucket8(col("user_id"), ulo, uhi)
    val z = (0 until 8).map { i =>
      shiftleft(shiftright(bx, i).bitwiseAND(lit(1)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(by, i).bitwiseAND(lit(1)), 2 * i))
    }.reduce(_ bitwiseOR _)

    ev.withColumn("__z", z).repartitionByRange(4, col("__z"))
      .sortWithinPartitions("__z").drop("__z")
      .write.option("parquet.block.size", 8 * 1024).parquet(s"$base/z")
    ev.repartitionByRange(4, col("value")).sortWithinPartitions("value")
      .write.option("parquet.block.size", 8 * 1024).parquet(s"$base/v")

    def scanOut(dir: String, pred: org.apache.spark.sql.Column,
                pushed: String): (Long, Long) = {
      val df: DataFrame = spark.read.schema(schema).parquet(dir)
        .filter(pred).select("event_id")
      val rows = df.collect().length.toLong
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec"))
      assert(scan.metadata("PushedFilters").contains(pushed),
        s"$pushed not pushed: ${scan.metadata("PushedFilters")}")
      (rows, scan.metrics("numOutputRows").value)
    }
    val userPred = col("user_id") >= 100 && col("user_id") < 120
    val valuePred = col("value") >= 50.0 && col("value") < 51.0

    val (rowsZu, outZu) = scanOut(s"$base/z", userPred, "GreaterThanOrEqual(user_id")
    val (rowsVu, outVu) = scanOut(s"$base/v", userPred, "GreaterThanOrEqual(user_id")
    val (rowsZv, outZv) = scanOut(s"$base/z", valuePred, "GreaterThanOrEqual(value")
    val (rowsVv, outVv) = scanOut(s"$base/v", valuePred, "GreaterThanOrEqual(value")

    // layouts must agree on the answers
    assert(rowsZu == rowsVu && rowsZu > 0)
    assert(rowsZv == rowsVv && rowsZv > 0)
    // the value-sorted control reads ~everything for the user predicate —
    // the fixture is big enough to discriminate
    assert(outVu > 20000, s"fixture too small: value-sorted user scan=$outVu")
    // z-layout skips on BOTH dimensions (5x guards, same as the
    // single-key spec); the single-key control skips on its own key
    assert(outZu * 5 < outVu,
      s"no user-side skipping in z-layout: z=$outZu vs value-sorted=$outVu")
    assert(outZv * 5 < outVu,
      s"no value-side skipping in z-layout: z=$outZv vs full-ish=$outVu")
    assert(outVv * 5 < outVu,
      s"control broken: value-sorted should skip on value: $outVv vs $outVu")

    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }
}
