package graft

import graft.operators.ScanOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** keyedMerge (ScanOps): a CDC batch {D, U, I} over a bucket-partitioned
  * table must (a) land exactly the logical merge — old rows of D and U
  * keys gone, U/I images present, everything else untouched — and (b)
  * rewrite ONLY the bucket partitions the batch touches, proven from file
  * listings (untouched buckets keep their original files with identical
  * size and mtime). Also: a touched bucket whose every row is deleted is
  * physically dropped, and an empty batch is a no-op. */
class MaintainMergeSpec extends AnyFunSuite with SparkSessionTest {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("value", DoubleType), StructField("bucket", IntegerType)))

  private def listing(dir: String): Map[String, (Long, Long)] = {
    val root = Paths.get(dir)
    val walk = Files.walk(root)
    try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => (root.relativize(p).toString,
        (Files.size(p), Files.getLastModifiedTime(p).toMillis)))
      .toMap
    finally walk.close()
  }

  private def writeFixture(dir: String): Unit =
    Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("value"),
        pmod(col("event_id"), lit(16)).cast("int").as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  private def cdcOf(rows: Seq[(String, Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("op", "event_id", "user_id", "value")
      .withColumn("bucket", pmod(col("event_id"), lit(16)).cast("int"))
  }

  test("merge applies D/U/I and rewrites only the touched buckets") {
    val dir = Files.createTempDirectory("graft_merge_spec").toString
    writeFixture(dir)
    val before = listing(dir)
    val pre = spark.read.schema(schema).parquet(dir)
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

    // two existing keys in bucket 3, one new key in bucket 7
    val delKey = pre.keys.filter(_ % 16 == 3).min
    val updKey = pre.keys.filter(_ % 16 == 3).max
    assert(delKey != updKey, "fixture bucket 3 needs two distinct keys")
    val insKey = pre.keys.max + 16 + (7 - (pre.keys.max + 16) % 16 + 16) % 16
    assert(insKey % 16 == 7 && !pre.contains(insKey))

    ScanOps.keyedMerge(spark, dir, schema, cdcOf(Seq(
      ("D", delKey, 0L, 0.0),
      ("U", updKey, 424242L, 1.5),
      ("I", insKey, 434343L, 2.5))))

    val after = listing(dir)
    val touched = Set("bucket=3", "bucket=7")
    val beforeUntouched = before.filterNot { case (p, _) =>
      touched.exists(p.startsWith) }
    val afterUntouched = after.filterNot { case (p, _) =>
      touched.exists(p.startsWith) }
    assert(beforeUntouched == afterUntouched,
      "untouched bucket files changed")
    touched.foreach { b =>
      assert(before.keys.filter(_.startsWith(b)).toSet !=
        after.keys.filter(_.startsWith(b)).toSet,
        s"$b was not rewritten")
    }

    // row parity vs the logical merge of the pre-image
    val post = spark.read.schema(schema).parquet(dir)
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = (pre - delKey - updKey) + (updKey -> 424242L) + (insKey -> 434343L)
    assert(post == want)
  }

  test("a touched bucket whose every row is deleted is dropped") {
    val dir = Files.createTempDirectory("graft_merge_spec_full").toString
    writeFixture(dir)
    val keys = spark.read.schema(schema).parquet(dir)
      .filter(col("bucket") === 5).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(keys.nonEmpty, "fixture has no bucket-5 rows")
    ScanOps.keyedMerge(spark, dir, schema,
      cdcOf(keys.map(k => ("D", k, 0L, 0.0))))
    assert(!Files.exists(Paths.get(dir, "bucket=5")),
      "emptied bucket directory survived the merge")
  }

  test("a batch with two ops for one key is rejected, table untouched") {
    // anti-join-then-union can't express D+I for one key in one batch (the
    // union would resurrect the deleted row); keyedMerge must fail loudly
    // instead of corrupting the table (round-12 ADVICE item).
    val dir = Files.createTempDirectory("graft_merge_spec_dup").toString
    writeFixture(dir)
    val before = listing(dir)
    val k = spark.read.schema(schema).parquet(dir)
      .select("event_id").head().getLong(0)
    val e = intercept[IllegalArgumentException] {
      ScanOps.keyedMerge(spark, dir, schema, cdcOf(Seq(
        ("D", k, 0L, 0.0), ("I", k, 999L, 9.9))))
    }
    assert(e.getMessage.contains("one op per key"))
    assert(listing(dir) == before, "rejected batch still mutated the table")
  }

  test("empty batch is a no-op") {
    val dir = Files.createTempDirectory("graft_merge_spec_noop").toString
    writeFixture(dir)
    val before = listing(dir)
    ScanOps.keyedMerge(spark, dir, schema,
      cdcOf(Nil))
    assert(listing(dir) == before)
  }
}
