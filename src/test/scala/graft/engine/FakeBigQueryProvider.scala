package graft.engine

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Recorded-response fake of the spark-bigquery-connector's DataSource
  * V2 contract (r12 verdict task 9): a real TableProvider with batch
  * read AND truncate-write paths, driven through the IDENTICAL
  * `spark.read.format(...).options(...)` / `df.write.format(...)` calls
  * BigQueryResolver issues — so the resolver's option contracts move
  * real bytes through Spark's scan/write machinery instead of only
  * being asserted as maps. Injected by class name via the resolver's
  * `connectorFormat` seam; the real "bigquery" short name stays
  * unregistered so the typed connector-absent failure specs keep their
  * meaning.
  *
  * Contract mirrored (public connector docs): a read needs `table` OR
  * `query` (+ `viewsEnabled=true` and a `materializationDataset` for
  * query reads — enforced here exactly so a contract regression fails
  * loudly); a write needs `table` and a `writeMethod` of
  * direct/indirect, indirect requiring `temporaryGcsBucket`. Schema is
  * the fixed (id BIGINT, name STRING) of the recorded dataset.
  */
object FakeBigQueryStore {
  val Schema: StructType =
    new StructType().add("id", LongType).add("name", StringType)

  /** table id → recorded rows. */
  val tables = new util.concurrent.ConcurrentHashMap[String, Seq[(Long, String)]]()

  /** query text → recorded result rows. */
  val queries = new util.concurrent.ConcurrentHashMap[String, Seq[(Long, String)]]()

  /** Every option map a read/write arrived with (spec assertions). */
  val readOptions = new util.concurrent.CopyOnWriteArrayList[Map[String, String]]()
  val writeOptions = new util.concurrent.CopyOnWriteArrayList[Map[String, String]]()

  def reset(): Unit = {
    tables.clear(); queries.clear(); readOptions.clear(); writeOptions.clear()
  }

  /** Option keys arrive through CaseInsensitiveStringMap (lower-cased);
    * normalize before matching the contract.
    */
  private[engine] def lookup(rawOpts: Map[String, String]): Seq[(Long, String)] = {
    val opts = rawOpts.map { case (k, v) => k.toLowerCase -> v }
    opts.get("query") match {
      case Some(q) =>
        require(opts.get("viewsenabled").contains("true"),
          "connector contract: query reads need viewsEnabled=true")
        require(opts.contains("materializationdataset"),
          "connector contract: query reads need a materializationDataset")
        Option(queries.get(q)).getOrElse(
          throw new IllegalArgumentException(s"no recorded result for query: $q"))
      case None =>
        val t = opts.getOrElse("table",
          throw new IllegalArgumentException("connector contract: need table or query"))
        Option(tables.get(t)).getOrElse(
          throw new IllegalArgumentException(s"not found: $t"))
    }
  }
}

class FakeBigQueryProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeBigQueryStore.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FakeBigQueryTable(properties.asScala.toMap)
}

final class FakeBigQueryTable(props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"fakebq:${props.getOrElse("table", props.getOrElse("query", "?"))}"
  override def schema(): StructType = FakeBigQueryStore.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val opts = options.asScala.toMap
    FakeBigQueryStore.readOptions.add(opts)
    val rows = FakeBigQueryStore.lookup(opts)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FakeBigQueryStore.Schema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            Array(FakeBqPartition(rows))
          override def createReaderFactory(): PartitionReaderFactory =
            new FakeBqReaderFactory
        }
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // CaseInsensitiveStringMap lower-cases keys.
    val opts = info.options().asScala.toMap.map { case (k, v) => k.toLowerCase -> v }
    FakeBigQueryStore.writeOptions.add(opts)
    val target = opts.getOrElse("table",
      throw new IllegalArgumentException("connector contract: writes need table"))
    val method = opts.getOrElse("writemethod",
      throw new IllegalArgumentException("connector contract: writes need writeMethod"))
    require(method == "direct" || (method == "indirect" && opts.contains("temporarygcsbucket")),
      s"connector contract: writeMethod=$method needs temporaryGcsBucket when indirect")
    require(info.schema().fieldNames.sameElements(FakeBigQueryStore.Schema.fieldNames),
      s"recorded fake only stores (id, name) rows, got ${info.schema().simpleString}")
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
            new FakeBqWriterFactory
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val rows = messages.flatMap { case FakeBqCommit(rs) => rs }.toSeq
              .sortBy(r => (r._1, r._2))
            FakeBigQueryStore.tables.put(target, rows)
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
  }
}

final case class FakeBqPartition(rows: Seq[(Long, String)]) extends InputPartition

final class FakeBqReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val it = partition.asInstanceOf[FakeBqPartition].rows.iterator
    new PartitionReader[InternalRow] {
      private var cur: (Long, String) = _
      override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
      override def get(): InternalRow =
        InternalRow(cur._1, UTF8String.fromString(cur._2))
      override def close(): Unit = ()
    }
  }
}

final case class FakeBqCommit(rows: Seq[(Long, String)]) extends WriterCommitMessage

final class FakeBqWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      override def write(r: InternalRow): Unit =
        buf += ((r.getLong(0), r.getUTF8String(1).toString))
      override def commit(): WriterCommitMessage = FakeBqCommit(buf.toSeq)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
