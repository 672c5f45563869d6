package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: RFC-3164-style syslog lines as a first-class Spark
  * source — `spark.read.format("graft.sources.SyslogDataSource")
  * .load(path)` yields typed columns (ts_raw, host, proc, pid, msg).
  *
  * The design is the standard V2 ladder: [[TableProvider]] →
  * [[SyslogTable]] (BATCH_READ) → [[SyslogScanBuilder]] (column pruning
  * via SupportsPushDownRequiredColumns — a pruned read materializes only
  * the requested fields, so `select(host)` never regex-captures the
  * message) → one [[InputPartition]] PER FILE (the parallelism unit: a
  * directory of log files fans out across executors; a single huge file
  * would instead be range-split like Spark's text source). Unparseable
  * lines yield null fields with the raw line preserved in `msg` —
  * flag-and-continue, same discipline as q_ingest_json_corrupt.
  */
class SyslogDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyslogDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyslogTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object SyslogDataSource {
  val schema: StructType = StructType(Seq(
    StructField("ts_raw", StringType),
    StructField("host", StringType),
    StructField("proc", StringType),
    StructField("pid", IntegerType),
    StructField("msg", StringType)))

  private[sources] val pattern =
    "^(\\w{3} +\\d+ \\d+:\\d+:\\d+) (\\S+) ([A-Za-z0-9_.-]+)\\[(\\d+)\\]: (.*)$".r

  /** Parse one line into the FULL 5-field form; callers prune after. */
  private[sources] def parse(line: String): Array[Any] = line match {
    case pattern(ts, host, proc, pid, msg) =>
      Array(UTF8String.fromString(ts), UTF8String.fromString(host),
        UTF8String.fromString(proc), pid.toInt, UTF8String.fromString(msg))
    case _ =>
      Array(null, null, null, null, UTF8String.fromString(line))
  }
}

class SyslogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"syslog($path)"
  override def schema(): StructType = SyslogDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyslogScanBuilder(path)
}

class SyslogScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter}

  private var required: StructType = SyslogDataSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Accept string-equality filters on the parsed columns: rows are
  // dropped inside the reader, before they ever cross the source
  // boundary. Everything else stays with Spark (returned as remaining).
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, remaining) = filters.partition {
      case EqualTo(attr, _: String) =>
        SyslogDataSource.schema.fieldNames.contains(attr)
      case _ => false
    }
    pushed = accepted
    remaining
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SyslogScan(path, required,
      pushed.collect { case EqualTo(a, v: String) => (a, v) })
}

case class SyslogFilePartition(file: String) extends InputPartition

class SyslogScan(path: String, required: StructType,
                 eqFilters: Seq[(String, String)] = Nil) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    val files =
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).iterator().asScala.map(_.toString).toSeq.sorted
      else Seq(path)
    files.map(f => SyslogFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyslogReaderFactory(required, eqFilters)
}

class SyslogReaderFactory(required: StructType,
                          eqFilters: Seq[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[SyslogFilePartition].file
    // map required columns to indices in the full parsed array
    val idx = required.fields.map(f =>
      SyslogDataSource.schema.fieldIndex(f.name))
    val filterIdx = eqFilters.map { case (a, v) =>
      (SyslogDataSource.schema.fieldIndex(a), UTF8String.fromString(v))
    }
    new PartitionReader[InternalRow] {
      private val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(file)).iterator()
      private var row: InternalRow = _
      override def next(): Boolean = {
        while (lines.hasNext) {
          val full = SyslogDataSource.parse(lines.next())
          if (filterIdx.forall { case (i, v) => v == full(i) }) {
            row = InternalRow.fromSeq(idx.toSeq.map(full(_)))
            return true
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
