package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 syslog source: end-to-end read, per-file partitioning,
  * column pruning, corrupt-line flagging (SURVEY §2 T1). */
class SyslogSourceSpec extends AnyFunSuite with SparkSessionTest {

  private val fmt = "graft.sources.SyslogDataSource"

  private def writeLogs(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_syslog")
    val f1 = Seq(
      "Mar 12 14:02:11 web01 sshd[4721]: Accepted password for root from 10.0.0.5",
      "this line is not syslog at all",
      "Mar 12 14:02:13 web01 cron[901]: job started")
    val f2 = Seq(
      "Mar 12 14:05:00 db01 postgres[222]: checkpoint complete")
    java.nio.file.Files.write(dir.resolve("a.log"),
      String.join("\n", f1: _*).getBytes)
    java.nio.file.Files.write(dir.resolve("b.log"),
      String.join("\n", f2: _*).getBytes)
    dir.toString
  }

  test("reads a directory of log files with typed columns") {
    val df = spark.read.format(fmt).load(writeLogs())
    assert(df.schema.fieldNames.toSeq ==
      Seq("ts_raw", "host", "proc", "pid", "msg"))
    val rows = df.orderBy("ts_raw").collect()
    assert(rows.length == 4)
    val parsed = df.filter(col("host").isNotNull)
    assert(parsed.count() == 3)
    assert(parsed.filter(col("proc") === "sshd").head().getInt(3) == 4721)
    // a directory fans out one partition per file
    assert(df.rdd.getNumPartitions == 2)
    // corrupt line: null fields, raw line preserved in msg
    val bad = df.filter(col("host").isNull).head()
    assert(bad.getString(4) == "this line is not syslog at all")
  }

  test("column pruning reaches the reader") {
    val df = spark.read.format(fmt).load(writeLogs()).select("host")
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    // the pruned scan itself outputs only `host` — pid regex capture and
    // msg materialization never happen in the reader
    assert(scans.nonEmpty && scans.head.output.map(_.name) == Seq("host"))
  }

  test("equality filters push into the reader; others remain with Spark") {
    val df = spark.read.format(fmt).load(writeLogs())
      .filter(col("proc") === "sshd" && col("pid") > 0)
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getString(1) == "web01")
    // proc='sshd' was accepted by pushFilters → rows drop inside the
    // reader; pid > 0 is not a string equality → Spark keeps a Filter node
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), plan) // residual pid predicate
    val nPushed = spark.read.format(fmt).load(writeLogs())
      .filter(col("proc") === "nonexistent").count()
    assert(nPushed == 0)
  }

  private val sinkFmt = "graft.sources.SyslogSinkDataSource"

  test("sink round-trips parsed rows through the two-phase commit") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_syslog_sink").toString
    val rows = Seq(
      ("Mar 12 14:02:11", "web01", "sshd", 4721, "Accepted password for root"),
      ("Mar 12 14:02:13", "web01", "cron", 901, "job started"),
      ("Mar 12 14:05:00", "db01", "postgres", 222, "checkpoint complete"))
      .toDF("ts_raw", "host", "proc", "pid", "msg")
    rows.repartition(2).write.format(sinkFmt).mode("append").save(out)
    // staging fully cleaned, only published part files remain
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (files.hasNext) names += files.next().getFileName.toString
    assert(names.forall(_.endsWith(".log")), names.mkString(","))
    assert(!names.contains("_staging"))
    // read back through the SOURCE: byte-level line format reparses
    val back = spark.read.format(fmt).load(out)
    assert(back.count() == 3)
    val got = back.select("ts_raw", "host", "proc", "pid", "msg")
      .collect().map(_.toSeq).toSet
    assert(got == rows.collect().map(_.toSeq).toSet)
  }

  test("sink overwrite truncates atomically at commit") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_syslog_ow").toString
    def df(n: Int) = (1 to n).map(i =>
        ("Mar 12 14:02:11", "h", "p", i, s"m$i"))
      .toDF("ts_raw", "host", "proc", "pid", "msg")
    df(5).write.format(sinkFmt).mode("append").save(out)
    df(2).write.format(sinkFmt).mode("overwrite").save(out)
    assert(spark.read.format(fmt).load(out).count() == 2)
  }

  test("sink serializes unparsed rows as their raw line (null fields)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_syslog_null").toString
    val rows = Seq(
      (Option.empty[String], Option.empty[String], Option.empty[String],
        Option.empty[Int], "totally raw line"))
      .toDF("ts_raw", "host", "proc", "pid", "msg")
    rows.write.format(sinkFmt).mode("append").save(out)
    val back = spark.read.format(fmt).load(out).head()
    assert(back.isNullAt(1) && back.getString(4) == "totally raw line")
  }

  test("sink escapes embedded newlines instead of splitting records") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_syslog_nl").toString
    val rows = Seq(("Mar 12 14:02:11", "h", "p", 1, "line one\nline two"))
      .toDF("ts_raw", "host", "proc", "pid", "msg")
    rows.write.format(sinkFmt).mode("append").save(out)
    val back = spark.read.format(fmt).load(out).collect()
    assert(back.length == 1)                       // ONE record, not two
    assert(back(0).getString(4) == "line one\\nline two") // escaped form
  }
}
