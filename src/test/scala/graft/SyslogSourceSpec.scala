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
      Seq("ts_raw", "host", "proc", "pid", "msg",
        "pri", "severity", "facility", "version", "msgid", "sd", "fmt"))
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

  test("reads a logrotate layout: plain + numbered + gzip rotations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_syslog_rot")
    def put(name: String, lines: Seq[String], gz: Boolean): Unit = {
      val bytes = (lines.mkString("\n") + "\n").getBytes("UTF-8")
      val out = java.nio.file.Files.newOutputStream(dir.resolve(name))
      val w = if (gz) new java.util.zip.GZIPOutputStream(out) else out
      try w.write(bytes) finally w.close()
    }
    put("app.log", Seq(
      "Mar 14 09:00:01 web01 nginx[10]: current"), gz = false)
    put("app.log.1", Seq(
      "Mar 13 09:00:01 web01 nginx[10]: yesterday",
      "\twith a continuation"), gz = false)
    put("app.log.2.gz", Seq(
      "Mar 12 09:00:01 web01 nginx[10]: two days ago"), gz = true)
    // a nested directory must not break the listing
    java.nio.file.Files.createDirectory(dir.resolve("archive"))
    val df = spark.read.format(fmt).load(dir.toString)
    assert(df.rdd.getNumPartitions == 3)       // one per rotation file
    val msgs = df.orderBy("ts_raw").collect().map(_.getString(4)).toSeq
    assert(msgs == Seq("two days ago", "yesterday\n\twith a continuation",
      "current"))
    // pushed filters and pruning still work through the gzip path
    assert(spark.read.format(fmt).load(dir.toString)
      .filter(col("proc") === "nginx").count() == 3)
  }

  test("a corrupt .gz rotation member dead-letters one flagged row and " +
    "the scan survives (file-member boundary)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_syslog_corrupt")
    def put(name: String, lines: Seq[String], gz: Boolean): Unit = {
      val bytes = (lines.mkString("\n") + "\n").getBytes("UTF-8")
      val out = java.nio.file.Files.newOutputStream(dir.resolve(name))
      val w = if (gz) new java.util.zip.GZIPOutputStream(out) else out
      try w.write(bytes) finally w.close()
    }
    put("app.log", Seq("Mar 14 09:00:01 web01 nginx[10]: current"), gz = false)
    put("app.log.1.gz", Seq("Mar 13 09:00:01 web01 nginx[10]: yesterday"), gz = true)
    // header-only truncation: GZIP constructor parses, first read EOFs —
    // zero recoverable lines on every JDK
    val whole = {
      val bo = new java.io.ByteArrayOutputStream
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write("Mar 12 09:00:01 web01 nginx[10]: lost\n".getBytes("UTF-8"))
      gz.close(); bo.toByteArray
    }
    java.nio.file.Files.write(dir.resolve("app.log.2.gz"),
      java.util.Arrays.copyOf(whole, 12))
    // mid-body truncation of a BIGGER member: some garbage may decompress
    // before the EOF — whatever parses flows, the flagged row still lands
    val big = {
      val bo = new java.io.ByteArrayOutputStream
      val gz = new java.util.zip.GZIPOutputStream(bo)
      (1 to 200).foreach(i =>
        gz.write(s"Mar 11 09:00:$i web01 nginx[10]: bulk line $i\n".getBytes("UTF-8")))
      gz.close(); bo.toByteArray
    }
    java.nio.file.Files.write(dir.resolve("app.log.3.gz"),
      java.util.Arrays.copyOf(big, big.length / 2))
    val df = spark.read.format(fmt).load(dir.toString)
    val rows = df.collect()
    // healthy members all parsed
    assert(rows.count(r => r.getString(11) == "rfc3164") >= 2)
    assert(rows.exists(r => r.getString(4) == "current"))
    assert(rows.exists(r => r.getString(4) == "yesterday"))
    // exactly one flagged row PER corrupt member, msg = the member path
    val corrupt = rows.filter(_.getString(11) == "corrupt")
    assert(corrupt.length == 2, corrupt.mkString("; "))
    assert(corrupt.exists(_.getString(4).endsWith("app.log.2.gz")))
    assert(corrupt.exists(_.getString(4).endsWith("app.log.3.gz")))
    corrupt.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1), "null fields"))
    // pushed equality filters also apply to the flagged row (droppable)
    assert(spark.read.format(fmt).load(dir.toString)
      .filter(col("fmt") === "corrupt").count() == 2)
  }

  // ---- format plurality: RFC 5424 / journald / continuations ----------

  private def writeOne(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_syslog_fmt")
    java.nio.file.Files.write(dir.resolve("mixed.log"),
      String.join("\n", lines: _*).getBytes)
    dir.toString
  }

  test("parses RFC 5424: PRI split, version, nil fields, structured data") {
    val df = spark.read.format(fmt).load(writeOne(Seq(
      "<34>1 2026-01-05T03:22:07.000Z web01 sshd 4321 ID47 " +
        "[exampleSDID@32473 iut=\"3\" eventSource=\"app\"] Failed password for root",
      "<165>1 2026-01-05T03:23:11.000Z db01 app - ID11 - Application started",
      "<13>1 2026-01-05T03:24:00.000Z - - - - -")))
    val rows = df.orderBy("ts_raw").collect()
    assert(rows.length == 3)
    val r0 = rows(0)
    assert(r0.getString(1) == "web01" && r0.getString(2) == "sshd")
    assert(r0.getInt(3) == 4321)
    assert(r0.getString(4) == "Failed password for root")
    assert(r0.getInt(5) == 34 && r0.getInt(6) == 2 && r0.getInt(7) == 4) // pri/sev/fac
    assert(r0.getInt(8) == 1 && r0.getString(9) == "ID47")               // version/msgid
    assert(r0.getString(10).startsWith("[exampleSDID@32473"))
    assert(r0.getString(11) == "rfc5424")
    val r1 = rows(1)
    assert(r1.isNullAt(3) && r1.isNullAt(10))  // nil procid, nil SD
    assert(r1.getString(4) == "Application started")
    val r2 = rows(2)                            // all-nil header, no msg
    assert(r2.isNullAt(1) && r2.isNullAt(2) && r2.getString(4) == "")
  }

  test("parses a journald export block into one record") {
    val df = spark.read.format(fmt).load(writeOne(Seq(
      "__REALTIME_TIMESTAMP=1704424921000000",
      "_HOSTNAME=web01",
      "SYSLOG_IDENTIFIER=sshd",
      "_PID=4321",
      "PRIORITY=3",
      "SYSLOG_FACILITY=4",
      "MESSAGE=Failed password for root from 10.0.0.5",
      "",
      "Mar 12 14:05:00 db01 postgres[222]: checkpoint complete")))
    val rows = df.orderBy("fmt").collect()
    assert(rows.length == 2)
    val j = rows.find(_.getString(11) == "journald").get
    assert(j.getString(0) == "1704424921000000")
    assert(j.getString(1) == "web01" && j.getString(2) == "sshd")
    assert(j.getInt(3) == 4321)
    assert(j.getString(4) == "Failed password for root from 10.0.0.5")
    assert(j.getInt(5) == 35 && j.getInt(6) == 3 && j.getInt(7) == 4)
    assert(rows.exists(_.getString(11) == "rfc3164"))
  }

  test("joins whitespace-led continuation lines onto the preceding record") {
    val df = spark.read.format(fmt).load(writeOne(Seq(
      "Mar 12 14:02:11 app01 java[777]: request failed",
      "\tjava.lang.RuntimeException: boom",
      "\tat com.example.Main.run(Main.java:42)",
      "Mar 12 14:02:12 app01 java[777]: recovered")))
    val rows = df.orderBy("ts_raw").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(4) ==
      "request failed\n\tjava.lang.RuntimeException: boom\n\tat com.example.Main.run(Main.java:42)")
    assert(rows(1).getString(4) == "recovered")
  }

  test("RFC 3164 with a PRI prefix splits severity and facility") {
    val df = spark.read.format(fmt).load(writeOne(Seq(
      "<13>Jan  6 11:09:42 app02 nginx[2201]: GET /healthz 200")))
    val r = df.head()
    assert(r.getString(11) == "rfc3164")
    assert(r.getInt(5) == 13 && r.getInt(6) == 5 && r.getInt(7) == 1)
    assert(r.getString(1) == "app02" && r.getInt(3) == 2201)
  }

  test("property: arbitrary corrupt input never throws and never loses a line") {
    import org.scalacheck.Gen
    val junk = Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr.map(_.take(60)),
      Gen.const("<999>not really"),
      Gen.const("NOT_A_FIELD=but looks like one lowercase? no: must be upper"),
      Gen.const("<34>1 bad"),
      Gen.const("]" * 3), Gen.const("[" * 3)))
    val lines = junk.sample.getOrElse(Nil)
      .map(_.replace("\n", " ").replace("\r", " "))
    val dir = writeOne(lines)
    val out = spark.read.format(fmt).load(dir).collect()
    // every record's msg content traces back to input; no exceptions; and
    // every non-blank, non-continuation, non-journald-field line survives
    // as its own record or as part of one
    val nBlank = lines.count(_.isEmpty)
    assert(out.length <= lines.length - nBlank)
    val joined = out.flatMap(r => Option(if (r.isNullAt(4)) null else r.getString(4))).mkString("\n")
    lines.filter(l => l.nonEmpty && !l.matches("^[A-Z_][A-Z0-9_]*=.*$"))
      .foreach(l => assert(joined.contains(l.stripLineEnd), s"lost line: $l"))
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
