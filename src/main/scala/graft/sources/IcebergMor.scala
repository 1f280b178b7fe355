package graft.sources

import graft.icelite.{IceTable, IcebergFormat}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsRowLevelOperations, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.Locale

/** SQL row-level DELETE over a table in the STANDARD Iceberg v2 format
  * (Avro manifests + metadata JSON — the layout the reference's external
  * tools read: `/root/reference/query_iceberg_minio.ipynb:1119-1180` runs
  * SQL DML against exactly such tables), merge-on-read: the `SupportsDelta`
  * operation writes spec-shaped POSITION DELETE files (content 1,
  * `file_path`/`pos` rows) and [[IcebergFormat.resumeWriter]] commits them
  * as one delta snapshot — every existing data file is carried by pointer,
  * byte-untouched. Readers on BOTH surfaces agree: this table's V2 batch
  * scan applies the deletes from per-file bitmaps, and the library/DuckDB
  * reader (`IcebergFormat.scan`, ic21/ic51) applies them through the
  * spec's sequence-numbered anti-join.
  *
  * Scope mirrors the resumed-commit surface: flat primitive schemas,
  * unpartitioned, DELETE only (UPDATE/MERGE on iceberg-format tables keep
  * the library Writer session, which owns rewrites). 100 TB shape: the
  * delete writes O(matched rows), the commit is O(manifests) metadata, and
  * the scan's delete application stays a broadcast anti-join / per-file
  * bitmap — never a table rewrite. */
object IcebergMorV2Table {
  /** True when `location` holds standard Iceberg v2 metadata (the
    * `vNNNNN.metadata.json` layout) rather than IceLite's `vN.json`. */
  def isIcebergDir(spark: SparkSession, location: String): Boolean = {
    val meta = new Path(location, "metadata")
    val fs   = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(meta) && {
      val g = fs.globStatus(new Path(meta, "v*.metadata.json"))
      g != null && g.nonEmpty
    }
  }
}

final class IcebergMorV2Table(spark: SparkSession, location: String)
    extends Table with SupportsRead with SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  private val metaPath = IcebergFormat.currentMetadataPath(spark, location)
  private[sources] val tablePlan = IcebergFormat.plan(spark, metaPath)

  override def name(): String = s"iceberg.$location"
  // read-time nullable coercion, same reasoning as IceLiteV2Table
  override def schema(): StructType =
    StructType(tablePlan.schema.fields.map(_.copy(nullable = true)))
  override def partitioning(): Array[Transform] = Array.empty
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(IceLiteMetaColumn("_file", StringType), IceLiteMetaColumn("_pos", LongType))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IcebergMorScanBuilder(schema(), tablePlan)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = {
        require(info.command() == RowLevelOperation.Command.DELETE,
          s"iceberg-format tables support merge-on-read SQL DELETE; " +
            s"${info.command()} needs the library IcebergFormat.Writer session")
        new IcebergMorDeltaOperation(location, schema(), tablePlan, info)
      }
    }
}

/** Batch V2 scan over the planned data files: one input partition per
  * file, read by the packaging-layer parquet reader with the snapshot's
  * position deletes applied as per-file bitmaps (the same
  * [[PositionDeleteFile]] machinery the IceLite MoR scan uses). Column
  * pruning reaches the reader's per-file projection. */
final class IcebergMorScanBuilder(
    tableSchema: StructType,
    p: IcebergFormat.TablePlan)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    require(p.deletes.forall(_.content == 1),
      "iceberg-format SQL surface supports position deletes only " +
        "(equality deletes read through IcebergFormat.scan)")
    // position deletes name files by path, so (unlike equality deletes)
    // sequence-number filtering is redundant under never-reused paths —
    // a bitmap simply has no bits for files the delete never named
    private val deleteFiles: Seq[PositionDeleteFile] =
      p.deletes.map(d => PositionDeleteFile(d.path.toString, None, None))

    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      p.files.map(f => IceLitePartition(Array(f.path.toString), null): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new IceLiteReaderFactory(
        new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration),
        required, Array.empty, tableSchema, None, deleteFiles)
    override def description(): String = s"IcebergMorScan(${p.files.length} files)"
  }
}

final class IcebergMorDeltaOperation(
    location: String,
    tableSchema: StructType,
    p: IcebergFormat.TablePlan,
    info: RowLevelOperationInfo)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = info.command()

  override def description(): String =
    s"iceberg merge-on-read ${command().toString.toLowerCase(Locale.ROOT)}"

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IcebergMorScanBuilder(tableSchema, p)

  override def newWriteBuilder(writeInfo: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
          private val conf =
            new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration)
          private val deleteRel =
            s"data/deletes-${java.util.UUID.randomUUID().toString.take(8)}"

          override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
            new IcebergMorDeltaWriterFactory(conf, location, deleteRel)

          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val files = messages.toSeq
              .flatMap(_.asInstanceOf[IcebergMorDeltaMessage].deleteFile)
              .filter(_.rows > 0L)
            if (files.isEmpty) return // nothing matched: no snapshot
            val s  = SparkSession.active
            val fs = new Path(location).getFileSystem(s.sparkContext.hadoopConfiguration)
            val infos = files.map { m =>
              val abs = new Path(location, m.relPath)
              IcebergFormat.DataFileInfo(abs.toString, m.rows,
                fs.getFileStatus(abs).getLen, content = 1)
            }
            IcebergFormat.resumeWriter(s, location).commit(infos)
          }

          override def abort(messages: Array[WriterCommitMessage]): Unit = {
            val fs = new Path(location).getFileSystem(conf.value)
            fs.delete(new Path(location, deleteRel), true)
            ()
          }
        }
      }
    }
}

final case class IcebergMorDeltaMessage(deleteFile: Option[IceLiteWriteMessage])
    extends WriterCommitMessage

/** Top-level (serializable) factory — an inner anonymous class would drag
  * the whole operation, table plan included, into the task closure. */
final class IcebergMorDeltaWriterFactory(
    conf: SerializableHadoopConf,
    location: String,
    deleteRel: String)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new IcebergMorDeltaWriter(conf, location, deleteRel, partitionId, taskId)
}

/** Executor-side DELETE-only delta writer: streams `(_file, _pos)` row
  * ids into one position-delete parquet per task (spec content-1 shape:
  * `file_path` string + `pos` long, the exact columns
  * [[IcebergFormat.scanFiles]] and DuckDB anti-join on). */
final class IcebergMorDeltaWriter(
    conf: SerializableHadoopConf,
    location: String,
    deleteRel: String,
    partitionId: Int,
    taskId: Long)
    extends DeltaWriter[InternalRow] {

  private var delWriter: IceLiteDataWriter = _
  private val delRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (delWriter == null)
      delWriter = new IceLiteDataWriter(conf, location, deleteRel,
        IceTable.PositionDeleteSchema, partitionId, taskId)
    delRow.update(0, id.getUTF8String(0).clone())
    delRow.update(1, id.getLong(1))
    delWriter.write(delRow)
  }

  override def insert(row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "iceberg-format delta writes are DELETE-only")
  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "iceberg-format delta writes are DELETE-only")
  override def reinsert(metadata: InternalRow, row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = IcebergMorDeltaMessage(
    Option(delWriter).map(_.commit().asInstanceOf[IceLiteWriteMessage]))

  override def abort(): Unit = if (delWriter != null) delWriter.abort()
  override def close(): Unit = ()
}
