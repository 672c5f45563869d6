package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reliable-checkpoint option for iterative loops (round-12 verdict item
  * 5): `spark.graft.checkpointDir` flips every loopCheckpoint from
  * localCheckpoint (fast; blocks die with an executor) to a reliable
  * `checkpoint()` into the configured dir. The spec drives a full
  * iterative graded query (star-contraction dedup clustering — several
  * loopCheckpoint rounds) both ways and requires identical results plus
  * checkpoint files actually landing. */
class CkptSpec extends AnyFunSuite with SparkSessionTest {

  test("q_dedup_clusters is identical under localCheckpoint and reliable " +
    "checkpoint, and the reliable dir really receives state") {
    def run(): Seq[String] =
      SparkEntry.queries("q_dedup_clusters")(spark, sf0001)
        .collect().map(_.toString).sorted.toSeq

    val local = run()
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    spark.conf.set(Ckpt.ConfKey, dir.toString)
    try {
      val reliable = run()
      assert(reliable === local, "results diverged across checkpoint modes")
      // the loop's per-round state was actually written reliably
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.walk(dir).iterator().asScala
        .count(java.nio.file.Files.isRegularFile(_))
      assert(files > 0, s"no checkpoint files landed under $dir")
    } finally {
      spark.conf.unset(Ckpt.ConfKey)
    }
  }

  test("loopCheckpoint without the conf stays a localCheckpoint (no files)") {
    import Ckpt.LoopCheckpoint
    assert(spark.conf.getOption(Ckpt.ConfKey).isEmpty)
    val df = spark.range(10).toDF("v").loopCheckpoint()
    assert(df.count() === 10)
    assert(df.rdd.partitions.nonEmpty) // materialized, lineage truncated
  }

  test("lazy loopCheckpoint (eager=false) goes reliable under the conf, " +
    "and a mid-session dir change is re-installed, not silently ignored") {
    import Ckpt.LoopCheckpoint
    import scala.jdk.CollectionConverters._
    def fileCount(d: java.nio.file.Path): Long =
      java.nio.file.Files.walk(d).iterator().asScala
        .count(java.nio.file.Files.isRegularFile(_))
    val dirA = java.nio.file.Files.createTempDirectory("graft_ckpt_a")
    val dirB = java.nio.file.Files.createTempDirectory("graft_ckpt_b")
    spark.conf.set(Ckpt.ConfKey, dirA.toString)
    try {
      val lazyDf = spark.range(20).toDF("v").loopCheckpoint(eager = false)
      assert(lazyDf.count() === 20) // first action materializes the checkpoint
      assert(fileCount(dirA) > 0, s"lazy reliable checkpoint wrote nothing under $dirA")
      // round-13 advice: a changed conf must take effect, not first-wins
      spark.conf.set(Ckpt.ConfKey, dirB.toString)
      assert(spark.range(5).toDF("v").loopCheckpoint().count() === 5)
      assert(fileCount(dirB) > 0, s"changed $dirB was ignored (first-wins bug)")
    } finally {
      spark.conf.unset(Ckpt.ConfKey)
    }
  }
}
