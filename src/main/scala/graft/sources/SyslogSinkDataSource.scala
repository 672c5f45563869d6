package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path: the sink twin of [[SyslogDataSource]] —
  * parsed rows (ts_raw, host, proc, pid, msg) serialize back to RFC-3164
  * lines, `spark.write.format("graft.sources.SyslogSinkDataSource")`.
  *
  * The point is the TWO-PHASE COMMIT contract every V2 batch writer
  * lives by, the thing that makes distributed writes exactly-once under
  * task retries and speculation:
  *  1. each task's [[DataWriter]] writes to a UNIQUE staged file
  *     (`_staging/<uuid>-p<partition>-t<task>`) — two attempts of the
  *     same partition never collide;
  *  2. the task's `commit()` returns a [[WriterCommitMessage]] naming its
  *     staged file; Spark's commit coordinator guarantees at most one
  *     attempt per partition gets to commit;
  *  3. only driver-side `BatchWrite.commit(messages)` publishes — it
  *     atomically renames exactly the staged files named in the winning
  *     messages and clears the staging dir. `abort()` deletes strays, so
  *     a failed job leaves NO partial output visible.
  * Overwrite mode arrives via [[SupportsTruncate]]: the truncate is
  * deferred to the same commit (publish = truncate+rename), so readers
  * never observe an empty-then-refilling directory. Local java.nio file
  * ops stand in for the HDFS/object-store FileSystem a cluster uses —
  * the protocol is identical.
  */
class SyslogSinkDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyslogDataSource.coreSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyslogSinkTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

class SyslogSinkTable(path: String) extends Table with SupportsWrite {
  override def name(): String = s"syslog-sink($path)"
  override def schema(): StructType = SyslogDataSource.coreSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SyslogWriteBuilder(path)
}

class SyslogWriteBuilder(path: String) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new SyslogBatchWrite(path, doTruncate)
  }
}

/** Driver-side commit arbiter (phase 2). */
class SyslogBatchWrite(path: String, truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    SyslogWriterFactory(path, UUID.randomUUID().toString)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncate) {
      Files.list(dir).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".log")).foreach(Files.delete)
    }
    messages.foreach {
      case SyslogCommit(staged, partitionId) =>
        // ATOMIC_MOVE is the publish step: either the whole file appears
        // under its final name or nothing does
        Files.move(Paths.get(staged), dir.resolve(f"part-$partitionId%05d.log"),
          StandardCopyOption.ATOMIC_MOVE)
      case m => throw new IllegalStateException(s"unexpected commit message $m")
    }
    cleanStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case SyslogCommit(staged, _) => Files.deleteIfExists(Paths.get(staged))
      case _ =>
    }
    cleanStaging()
  }

  private def cleanStaging(): Unit = {
    val staging = Paths.get(path, "_staging")
    if (Files.exists(staging)) {
      Files.list(staging).iterator().asScala.foreach(Files.deleteIfExists)
      Files.deleteIfExists(staging)
    }
  }
}

case class SyslogCommit(stagedPath: String, partitionId: Int) extends WriterCommitMessage

case class SyslogWriterFactory(path: String, jobId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SyslogDataWriter(path, jobId, partitionId, taskId)
}

/** Task-side writer (phase 1): stages to a per-attempt unique file. */
class SyslogDataWriter(path: String, jobId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val staged: Path = {
    val staging = Paths.get(path, "_staging")
    Files.createDirectories(staging)
    staging.resolve(s"$jobId-p$partitionId-t$taskId")
  }
  private val out = Files.newBufferedWriter(staged)

  override def write(row: InternalRow): Unit = {
    // null-tolerant: a row that never parsed (null fields, raw line kept
    // in msg — SyslogDataSource's flag-and-continue contract) round-trips
    // as its raw msg
    val line =
      if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2) || row.isNullAt(3))
        row.getUTF8String(4).toString
      else
        s"${row.getUTF8String(0)} ${row.getUTF8String(1)} " +
          s"${row.getUTF8String(2)}[${row.getInt(3)}]: ${row.getUTF8String(4)}"
    // a line-oriented format cannot represent embedded newlines: escape
    // them (RFC-3164 practice) rather than silently splitting one record
    // into two corrupt ones
    out.write(line.replace("\r", "\\r").replace("\n", "\\n"))
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    SyslogCommit(staged.toString, partitionId)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(staged)
  }

  override def close(): Unit = out.close()
}
