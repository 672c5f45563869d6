package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import java.util.OptionalLong

import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 demonstrating STORAGE-PARTITIONED JOIN (SPJ): the scan
  * reports `KeyGroupedPartitioning(identity(k), n)` and every
  * `InputPartition` exposes its key via `HasPartitionKey`, so a join of
  * two such tables on `k` plans with NO shuffle on either side — Spark
  * trusts the source's physical layout the way it trusts bucketed tables,
  * but through the open connector API (this is how Iceberg/Delta co-
  * partitioned joins avoid shuffling 100 TB fact tables; requires
  * `spark.sql.sources.v2.bucketing.enabled=true`).
  *
  * The table itself is a deterministic generator (options: `nkeys`,
  * `rowsPerKey`, `tag`) — the layout contract, not the payload, is the
  * point. One partition per key; a real source would hold one partition
  * per key-bucket of files. Proven in KeyedSourceSpec: SPJ on → zero
  * `ShuffleExchange` under the join and hash-identical results to the
  * SPJ-off plan.
  */
class KeyedEventsDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedEventsDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    def opt(k: String, d: Int): Int =
      Option(properties.get(k)).map(_.toInt).getOrElse(d)
    new KeyedEventsTable(
      opt("nkeys", 8),
      opt("rowsPerKey", 4),
      Option(properties.get("tag")).getOrElse("a"))
  }

  override def supportsExternalMetadata(): Boolean = false
}

object KeyedEventsDataSource {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType),
    StructField("v", LongType),
    StructField("tag", StringType)))
}

class KeyedEventsTable(nkeys: Int, rowsPerKey: Int, tag: String)
    extends Table with SupportsRead {
  override def name(): String = s"keyed($tag,$nkeys,$rowsPerKey)"
  override def schema(): StructType = KeyedEventsDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new KeyedEventsScan(nkeys, rowsPerKey, tag)
}

class KeyedEventsScan(nkeys: Int, rowsPerKey: Int, tag: String)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsReportStatistics {
  override def readSchema(): StructType = KeyedEventsDataSource.schema
  override def toBatch: Batch = this

  // Exact statistics (the generator knows its cardinality): without
  // these a V2 relation defaults to "unknown = huge" and Catalyst will
  // NEVER auto-broadcast it — reporting size/rows is what lets the
  // planner pick a broadcast join for a small V2 table the same way
  // parquet stats do (KeyedSourceSpec proves it, no hint involved).
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = nkeys.toLong * rowsPerKey
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(rows * (8L + 8L + tag.length + 16L))
    override def numRows(): OptionalLong = OptionalLong.of(rows)
  }

  // The SPJ contract: clustering expression + partition count. Join keys
  // covering `k` + matching partition values on the other side ⇒ Spark
  // plans the join shuffle-free.
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("k")), nkeys)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until nkeys).map(k => KeyedPartition(k.toLong, rowsPerKey, tag): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[KeyedPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.rowsPerKey }
        override def get(): InternalRow =
          InternalRow(p.k, p.k * 1000L + i.toLong, UTF8String.fromString(p.tag))
        override def close(): Unit = ()
      }
    }
}

/** One partition per key; `partitionKey` is what lets Spark line the two
  * sides' partitions up without shuffling. */
case class KeyedPartition(k: Long, rowsPerKey: Int, tag: String)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(k)
}
