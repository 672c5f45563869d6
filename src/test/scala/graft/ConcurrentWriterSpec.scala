package graft

import graft.operators.{ScanOps, TableLock}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Lake-ops concurrency contract (round-12 verdict gap #1): two writers
  * racing one bucket-partitioned table must either SERIALIZE (both
  * batches land — the TableLock path) or fail with a DETECTED conflict
  * (ConcurrentWriteException, table untouched by the loser) — never
  * silently lose an update. The pre-lock implementation interleaved two
  * read-modify-write cycles: whichever merge read the base first had its
  * rows overwritten by the other's rewrite of the same bucket. */
class ConcurrentWriterSpec extends AnyFunSuite with SparkSessionTest {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("value", DoubleType), StructField("bucket", IntegerType)))

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

  test("two concurrent merges into the SAME bucket serialize; both land") {
    val dir = Files.createTempDirectory("graft_ccw_serial").toString
    writeFixture(dir)
    val keys = spark.read.schema(schema).parquet(dir)
      .filter(col("bucket") === 3).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(keys.size >= 2, "fixture bucket 3 needs two keys")
    // both writers update bucket 3 — the exact interleave the lock exists
    // to forbid: un-serialized, the second rewrite clobbers the first's row
    val (kA, kB) = (keys.head, keys.last)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fA = Future(ScanOps.keyedMerge(spark, dir, schema,
      cdcOf(Seq(("U", kA, 111111L, 1.0)))))
    val fB = Future(ScanOps.keyedMerge(spark, dir, schema,
      cdcOf(Seq(("U", kB, 222222L, 2.0)))))
    Await.result(fA, 120.seconds); Await.result(fB, 120.seconds)
    val post = spark.read.schema(schema).parquet(dir)
      .filter(col("event_id").isin(kA, kB))
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(post == Map(kA -> 111111L, kB -> 222222L),
      s"a concurrent merge lost an update: $post")
    assert(!Files.exists(TableLock.lockPath(dir)), "lock leaked")
  }

  test("a held lock makes a second writer fail LOUDLY, table untouched") {
    val dir = Files.createTempDirectory("graft_ccw_conflict").toString
    writeFixture(dir)
    val k = spark.read.schema(schema).parquet(dir)
      .select("event_id").head().getLong(0)
    val pre = spark.read.schema(schema).parquet(dir).count()
    sys.props("graft.lock.timeout.ms") = "300"
    try {
      TableLock.withLock(dir, "spec-holder") {
        val e = intercept[TableLock.ConcurrentWriteException] {
          ScanOps.keyedMerge(spark, dir, schema,
            cdcOf(Seq(("U", k, 999L, 9.9))))
        }
        assert(e.getMessage.contains("spec-holder"))
      }
    } finally sys.props.remove("graft.lock.timeout.ms")
    assert(spark.read.schema(schema).parquet(dir).count() == pre)
    assert(spark.read.schema(schema).parquet(dir)
      .filter(col("user_id") === 999L).count() == 0,
      "losing writer still mutated the table")
  }

  test("concurrent serving-table upserts serialize (rename-swap writer)") {
    // upsertBatch swaps the WHOLE table dir, which is why its lock lives
    // as a SIBLING of the dir — an in-dir lock would be carried away by
    // the swap and silently unlock the table mid-commit
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val tbl = Files.createTempDirectory("graft_ccw_upsert")
      .resolve("serving").toString
    graft.streaming.StreamOps.upsertBatch(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), tbl, Seq("k"))
    val fA = Future(graft.streaming.StreamOps.upsertBatch(
      Seq((1L, 11L)).toDF("k", "v"), tbl, Seq("k")))
    val fB = Future(graft.streaming.StreamOps.upsertBatch(
      Seq((3L, 30L)).toDF("k", "v"), tbl, Seq("k")))
    Await.result(fA, 120.seconds); Await.result(fB, 120.seconds)
    val post = spark.read.parquet(tbl).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(post == Map(1L -> 11L, 2L -> 20L, 3L -> 30L),
      s"a concurrent upsert lost an update: $post")
    assert(!Files.exists(TableLock.lockPath(tbl)), "lock leaked")
  }

  test("the lock releases on writer failure (no wedged table)") {
    val dir = Files.createTempDirectory("graft_ccw_release").toString
    writeFixture(dir)
    val k = spark.read.schema(schema).parquet(dir)
      .select("event_id").head().getLong(0)
    // a rejected batch (two ops for one key) throws INSIDE the lock —
    // the lock must release so the next writer proceeds immediately
    intercept[IllegalArgumentException] {
      ScanOps.keyedMerge(spark, dir, schema,
        cdcOf(Seq(("D", k, 0L, 0.0), ("I", k, 1L, 1.0))))
    }
    assert(!Files.exists(TableLock.lockPath(dir)),
      "lock survived a failed merge")
    ScanOps.keyedMerge(spark, dir, schema, cdcOf(Seq(("U", k, 777L, 7.7))))
    assert(spark.read.schema(schema).parquet(dir)
      .filter(col("event_id") === k).select("user_id")
      .head().getLong(0) == 777L)
  }
}
