package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The genre's live loop driven END TO END: files land in an ingest
  * directory (`tail -f` stand-in), ONE continuously running streaming
  * query maintains the consolidated serving table, and searches through
  * the graft.Search front door are answered from that table BETWEEN
  * ingest waves — while the stream is still running. Each wave's answers
  * must equal a batch recompute over exactly the files ingested so far
  * (incremental maintenance ≡ recompute, the serving-table contract). */
class LiveLoopSpec extends AnyFunSuite with SparkSessionTest {

  test("ingest waves update the serving table; search answers live between waves") {
    val base = java.nio.file.Files.createTempDirectory("graft_live").toString
    val (ingestDir, servingDir) = (s"$base/in", s"$base/serve")
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val cut = lit("2024-01-08").cast("date")
    val wave1 = ev.filter(to_date(col("ts")) < cut)
    val wave2 = ev.filter(to_date(col("ts")) >= cut)
    assert(wave1.count() > 0 && wave2.count() > 0, "fixture needs two waves")

    def servedCounts(): Map[(String, String), Long] = {
      // the search half: register the live table, answer through SQL mode
      Search.registerServing(spark, servingDir)
      spark.sql(
        """SELECT CAST(day AS STRING) AS day, event_type, cnt
          |FROM daily_counts""".stripMargin)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    }
    def batchCounts(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
      df.groupBy(to_date(col("ts")).cast("string").as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    wave1.write.mode("overwrite").parquet(ingestDir)
    val q = StreamOps.liveServingLoop(spark, ingestDir, servingDir).start()
    try {
      q.processAllAvailable()
      assert(q.isActive, "stream must still be running at first search")
      assert(servedCounts() == batchCounts(wave1),
        "wave-1 serving table != batch recompute of wave-1 files")

      // second wave lands while the SAME query keeps running
      wave2.write.mode("append").parquet(ingestDir)
      q.processAllAvailable()
      assert(q.isActive, "stream must still be running at second search")
      assert(servedCounts() == batchCounts(ev),
        "wave-2 serving table != batch recompute of all files")
    } finally q.stop()

    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(base))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }
}
