package graft

import graft.operators.ScanOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** keyedDelete (ScanOps): GDPR-style erasure over a bucket-partitioned
  * table must (a) remove exactly the requested subjects' rows, (b)
  * rewrite ONLY the bucket partitions the keys hash into — proven from
  * file listings: untouched buckets keep their original files with
  * identical size and mtime — and (c) physically drop a bucket whose
  * every row belonged to deleted subjects. */
class MaintainDeleteSpec extends AnyFunSuite with SparkSessionTest {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("value", DoubleType), StructField("bucket", IntegerType)))

  /** (relative path → (size, mtime)) for every data file under dir. */
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
        pmod(col("user_id"), lit(16)).cast("int").as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

  test("delete erases the subjects, rewrites only their buckets") {
    val dir = Files.createTempDirectory("graft_del_spec").toString
    writeFixture(dir)
    val before = listing(dir)
    val pre = spark.read.schema(schema).parquet(dir)
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val keys = Seq(13L)
    ScanOps.keyedDelete(spark, dir, schema, keys)

    val after = listing(dir)
    val touched = Set("bucket=13")
    // untouched buckets: identical file set, sizes, and mtimes
    val beforeUntouched = before.filterNot { case (p, _) =>
      touched.exists(p.startsWith) }
    val afterUntouched = after.filterNot { case (p, _) =>
      touched.exists(p.startsWith) }
    assert(beforeUntouched == afterUntouched,
      "untouched bucket files changed")
    // touched bucket: rewritten (different part file names)
    assert(before.keys.filter(_.startsWith("bucket=13")).toSet !=
      after.keys.filter(_.startsWith("bucket=13")).toSet,
      "touched bucket was not rewritten")

    // row parity vs the anti-join pre-image
    val post = spark.read.schema(schema).parquet(dir)
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(post == pre.filterNot { case (_, u) => keys.contains(u) })
    assert(!post.exists { case (_, u) => keys.contains(u) })
  }

  test("a fully-erased bucket is physically dropped") {
    val dir = Files.createTempDirectory("graft_del_spec_full").toString
    writeFixture(dir)
    // delete EVERY subject that hashes to bucket 5
    val keys = spark.read.schema(schema).parquet(dir)
      .filter(col("bucket") === 5).select("user_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(keys.nonEmpty, "fixture has no bucket-5 users")
    ScanOps.keyedDelete(spark, dir, schema, keys)
    assert(!Files.exists(Paths.get(dir, "bucket=5")),
      "emptied bucket directory survived the delete")
    val left = spark.read.schema(schema).parquet(dir)
      .filter(col("user_id").isin(keys: _*)).count()
    assert(left == 0)
  }

  test("empty key list is a no-op") {
    val dir = Files.createTempDirectory("graft_del_spec_noop").toString
    writeFixture(dir)
    val before = listing(dir)
    ScanOps.keyedDelete(spark, dir, schema, Nil)
    assert(listing(dir) == before)
  }
}
