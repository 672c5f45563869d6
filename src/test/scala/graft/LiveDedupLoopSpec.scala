package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The LLM-pipeline live loop driven END TO END: document files land in
  * an ingest directory, ONE continuously running streaming query dedups
  * them at ingest time (MinHash banding + bucket-owner state) and
  * maintains the dedup-registry serving table, and the CLEAN corpus —
  * ingested docs minus flagged dups — is searched through the
  * graft.Search front door BETWEEN ingest waves, while the stream runs.
  * Each wave's clean set must equal the batch dedup recompute over
  * exactly the docs ingested so far (ingest-time dedup ≡ batch dedup,
  * the registry contract). */
class LiveDedupLoopSpec extends AnyFunSuite with SparkSessionTest {

  test("streaming dedup registry serves a clean corpus equal to the batch recompute") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_livededup").toString
    val (ingestDir, registryDir) = (s"$base/in", s"$base/registry")
    // arrival time = doc_id seconds (the corpus has no ts column); waves
    // ordered by doc_id so arrival respects event order — the streaming
    // owner rule's documented contract
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "timestamp_seconds(doc_id) AS ts", "text")
    val wave1 = docs.filter(col("doc_id") < 250)
    val wave2 = docs.filter(col("doc_id") >= 250)
    assert(wave1.count() > 0 && wave2.count() > 0)

    def cleanIds(): Seq[Long] = {
      Search.registerCleanCorpus(spark, ingestDir, registryDir)
      spark.sql("SELECT doc_id FROM clean_docs").as[Long].collect().sorted.toSeq
    }
    def batchCleanIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      StreamOps.batchMinhashDedup(df.as[StreamOps.DocIn])
        .filter(!col("is_dup")).select("doc_id")
        .as[Long].collect().sorted.toSeq

    wave1.coalesce(1).write.mode("overwrite").parquet(ingestDir)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = StreamOps.cleanCorpusLoop(spark, ingestDir, registryDir).start()
    try {
      q.processAllAvailable()
      assert(q.isActive, "stream must still be running at first search")
      assert(cleanIds() == batchCleanIds(wave1),
        "wave-1 clean corpus != batch dedup recompute of wave-1 docs")

      wave2.coalesce(1).write.mode("append").parquet(ingestDir)
      q.processAllAvailable()
      assert(q.isActive, "stream must still be running at second search")
      assert(cleanIds() == batchCleanIds(docs),
        "wave-2 clean corpus != batch dedup recompute of all docs")
      // the registry actually flagged something (fixture has dups)
      val nDup = spark.read.parquet(registryDir).filter(col("is_dup")).count()
      assert(nDup > 0, "fixture has near-dups; registry flagged none")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }
}
