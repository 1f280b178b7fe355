package graft.sources

import graft.icelite.{IceTable, IcebergFormat}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsRowLevelOperations, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.Locale
import scala.jdk.CollectionConverters._

/** SQL row-level DML over a table in the STANDARD Iceberg v2 format
  * (Avro manifests + metadata JSON — the layout the reference's external
  * tools read: `/root/reference/query_iceberg_minio.ipynb:1119-1180` runs
  * SQL DML against exactly such tables), merge-on-read: the `SupportsDelta`
  * operation writes spec-shaped POSITION DELETE files (content 1,
  * `file_path`/`pos` rows) plus ordinary v2-layout data files for
  * UPDATE/MERGE inserts, and [[IcebergFormat.resumeWriter]] commits them
  * as one delta snapshot — every existing data file is carried by pointer,
  * byte-untouched. Readers on BOTH surfaces agree: this table's V2 batch
  * scan applies the deletes from per-file bitmaps, and the library/DuckDB
  * reader (`IcebergFormat.scan`, ic21/ic51) applies them through the
  * spec's sequence-numbered anti-join.
  *
  * Scope mirrors the resumed-commit surface: flat primitive schemas,
  * including identity/bucket/temporal-partitioned and additively
  * schema-evolved tables (the resumed session restores the full schema +
  * spec histories; delta files commit under the current spec with null
  * partition values — readable everywhere, conservatively unpruned).
  * 100 TB shape: the delta writes O(matched rows), the commit is
  * O(manifests) metadata, the scan prunes files by manifest bounds and
  * partition values before reading, and delete application stays a
  * range-pruned per-file bitmap — never a table rewrite. */
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
      override def build(): RowLevelOperation =
        new IcebergMorDeltaOperation(location, schema(), tablePlan, info)
    }
}

/** Batch V2 scan over the planned data files with MANIFEST-LEVEL file
  * skipping: pushed comparison filters prune `p.files` through
  * [[IcebergFormat.fileCanMatch]] (column bounds + partition values)
  * before any partition is planned, so a selective predicate over a
  * 100 TB table reads only the files whose recorded [min, max] can
  * match — the same planning step the library scan ([[IcebergFormat
  * .planFiles]]) and the reference's pushed reads assume
  * (`blog-zero-cost-data-lakehouse-part-2.md:277-281`). All filters are
  * returned as residuals (bounds can never prove a row-level predicate;
  * Spark re-checks survivors, same contract as parquet row-group stats).
  * Surviving oversized files split into row-group-aligned ranged
  * partitions (manifest `sizeBytes` gates the footer read), and position
  * deletes ride with their manifest `file_path` bounds so the reader
  * opens a delete file only for data files inside its range. */
final class IcebergMorScanBuilder(
    tableSchema: StructType,
    p: IcebergFormat.TablePlan)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Accept single-column comparisons on table columns for FILE-granular
    * pruning; everything is returned as residual (manifest ranges skip
    * what can't match, Spark re-checks what might). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => IcebergMorScan.pruningRange(f).exists {
      case (c, _, _) => p.schema.fieldNames.contains(c)
    })
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new IcebergMorScan(required, tableSchema, p, pushed)
}

object IcebergMorScan {
  /** The [column, lower, upper] range a pushable filter implies, or None
    * when the filter can't prune at file granularity. */
  private[graft] def pruningRange(f: Filter): Option[(String, Option[String], Option[String])] =
    f match {
      case EqualTo(c, v) if isLit(v)            => Some((c, Some(v.toString), Some(v.toString)))
      case GreaterThan(c, v) if isLit(v)        => Some((c, Some(v.toString), None))
      case GreaterThanOrEqual(c, v) if isLit(v) => Some((c, Some(v.toString), None))
      case LessThan(c, v) if isLit(v)           => Some((c, None, Some(v.toString)))
      case LessThanOrEqual(c, v) if isLit(v)    => Some((c, None, Some(v.toString)))
      case _                                    => None
    }

  private def isLit(v: Any): Boolean = v match {
    case null => false
    case _: String | _: java.lang.Integer | _: java.lang.Long | _: java.lang.Double |
        _: java.lang.Float | _: java.lang.Short | _: java.lang.Byte | _: java.lang.Boolean => true
    case _ => false
  }

  /** Default ranged-split target (bytes): matches Spark's own
    * `files.maxPartitionBytes` default so one oversized file fans out to
    * ~128 MB tasks instead of serializing on a single reader. */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  /** Partition(s) for one planned file: whole-file normally; files at
    * least 2× the split target (by manifest `sizeBytes` — no IO unless a
    * file is actually oversized) are split into row-group-aligned byte
    * ranges from the FOOTER's block offsets/row counts, so each range's
    * `startRow`/`rows` exactly match the row groups parquet's midpoint
    * filter selects for [start, end) and `_pos` stays file-global
    * (position-delete application is split-invariant). Cost note: each
    * split re-opens the delete files covering the file (bitmaps are
    * per-task); acceptable because covering deletes are range-pruned and
    * a delete's blast radius is small next to an oversized data file. */
  private[graft] def partitionsFor(
      f: IcebergFormat.PlannedFile, conf: Configuration, target: Long,
      key: InternalRow = null): Seq[InputPartition] = {
    val path = f.path.toString
    def whole = Seq(IceLitePartition(Array(path), key): InputPartition)
    if (target <= 0 || f.sizeBytes < 2 * target) return whole
    val fr = ParquetFileReader.open(HadoopInputFile.fromPath(f.path, conf))
    val blocks = try fr.getFooter.getBlocks.asScala.toVector finally fr.close()
    if (blocks.size < 2) return whole
    // greedy row-group chunks of ~target compressed bytes
    val chunks = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer(blocks.head))
    var acc = blocks.head.getCompressedSize
    blocks.tail.foreach { b =>
      if (acc + b.getCompressedSize > target) {
        chunks += scala.collection.mutable.ArrayBuffer(b); acc = b.getCompressedSize
      } else { chunks.last += b; acc += b.getCompressedSize }
    }
    if (chunks.size < 2) return whole
    var startRow = 0L
    chunks.zipWithIndex.map { case (c, i) =>
      // [start, end) bounds chosen so each block's midpoint falls in
      // exactly one chunk: a block's midpoint sits in
      // [startingPos, nextBlock.startingPos), and chunk boundaries ARE
      // block starting positions (0 / MaxValue at the file edges)
      val start = if (i == 0) 0L else c.head.getStartingPos
      val end   = if (i == chunks.size - 1) Long.MaxValue else chunks(i + 1).head.getStartingPos
      val rows  = c.map(_.getRowCount).sum
      val part  = IceLitePartition(Array(path), key,
        ranges = Seq(IceLiteFileRange(start, end, startRow, rows))): InputPartition
      startRow += rows
      part
    }.toSeq
  }
}

final class IcebergMorScan(
    required: StructType,
    tableSchema: StructType,
    p: IcebergFormat.TablePlan,
    pushed: Array[Filter])
    extends Scan with Batch {

  require(p.deletes.forall(_.content == 1),
    "iceberg-format SQL surface supports position deletes only " +
      "(equality deletes read through IcebergFormat.scan)")

  // position deletes name files by path, so (unlike equality deletes)
  // sequence-number filtering is redundant under never-reused paths — a
  // bitmap simply has no bits for files the delete never named. The
  // manifest's file_path [min, max] rides along so the reader opens a
  // delete file only for data files inside its range.
  private val deleteFiles: Seq[PositionDeleteFile] =
    p.deletes.map(d =>
      PositionDeleteFile(d.path.toString, d.pathBounds.map(_._1), d.pathBounds.map(_._2)))

  // manifest-level file skipping: a file survives only if EVERY pushed
  // filter's implied range can match its recorded bounds / partition
  // values (conjunction semantics; a file with no evidence is kept)
  private val ranges = pushed.flatMap(IcebergMorScan.pruningRange)
  private[graft] val survivors: Seq[IcebergFormat.PlannedFile] =
    p.files.filter(f => ranges.forall { case (c, lo, hi) =>
      IcebergFormat.fileCanMatch(p, f, c, lo, hi)
    })

  // identity-partition columns any surviving file records a value for:
  // the reader rebuilds these from the per-file partition key when a data
  // file physically omits the column (spec "Column Projection" — the
  // layout identity-partitioned writers commonly produce). Files that DO
  // hold the column decode it normally; the key is inert then.
  private val partCols: Array[String] =
    survivors.flatMap(_.partition.keys).distinct.sorted
      .flatMap { id =>
        val i = p.fieldIds.indexOf(id)
        if (i >= 0) Some(p.schema.fieldNames(i)) else None
      }.toArray

  /** Catalyst-typed partition key for `f`, ordered like `partCols`
    * (strings → UTF8String; avro numerics are Catalyst-compatible). */
  private def keyFor(f: IcebergFormat.PlannedFile): InternalRow =
    if (partCols.isEmpty) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      partCols.map { c =>
        val fieldId = p.fieldIds(p.schema.fieldNames.indexOf(c))
        f.partition.get(fieldId).map {
          case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
          case v         => v
        }.orNull: Any
      })

  private lazy val partitions: Array[InputPartition] = {
    val spark  = SparkSession.active
    val target = spark.conf.get("graft.split.size",
      IcebergMorScan.DefaultSplitBytes.toString).toLong
    val conf = spark.sparkContext.hadoopConfiguration
    survivors.flatMap(f => IcebergMorScan.partitionsFor(f, conf, target, keyFor(f))).toArray
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = partitions
  override def createReaderFactory(): PartitionReaderFactory =
    new IceLiteReaderFactory(
      new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration),
      required, partCols, tableSchema, None, deleteFiles)
  override def description(): String = {
    val push = if (pushed.isEmpty) "" else s", pushed=[${pushed.mkString(", ")}]"
    val split = partitions.length - survivors.length
    val sp    = if (split > 0) s", splits=${partitions.length}" else ""
    s"IcebergMorScan(files=${survivors.length}/${p.files.length}$push$sp)"
  }
}

/** Row-level WriteDelta over a standard-format v2 table: DELETE matched
  * rows → position-delete files; UPDATE/MERGE additionally stage
  * v2-layout data parquet (field-id'd columns, inline min/max stats) for
  * the insert/reinsert arm, exactly the file shape [[IcebergV2Write]]
  * commits. One resumed commit publishes both (content-0 + content-1
  * manifests in a single delta snapshot). */
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
      override def build(): DeltaWrite = {
        // insert-bearing commands (UPDATE/MERGE) hand rows in table
        // schema order — the staged data files must line up field-by-field
        // with the committed Iceberg schema (ids are positional)
        require(
          command() == RowLevelOperation.Command.DELETE ||
            StructType(writeInfo.schema().fields.map(_.copy(nullable = true))).catalogString ==
            tableSchema.catalogString,
          s"delta write schema ${writeInfo.schema().catalogString} != table schema ${tableSchema.catalogString}")
        new DeltaWrite {
          override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
            private val conf =
              new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration)
            private val tag       = java.util.UUID.randomUUID().toString.take(8)
            private val deleteRel = s"data/deletes-$tag"
            private val dataRel   = s"data/delta-$tag"

            override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
              new IcebergMorDeltaWriterFactory(conf, location, deleteRel, dataRel, tableSchema)

            override def commit(messages: Array[WriterCommitMessage]): Unit = {
              val msgs = messages.toSeq.map(_.asInstanceOf[IcebergMorDeltaMessage])
              val s    = SparkSession.active
              val fs   = new Path(location).getFileSystem(s.sparkContext.hadoopConfiguration)
              // content-1 position deletes, each with the spec-reserved
              // file_path field's [min, max] from the writer's inline
              // stats — what lets every reader range-prune this delete
              val delInfos = msgs.flatMap(_.deleteFile).filter(_.rows > 0L).map { m =>
                val abs = new Path(location, m.relPath)
                val pathBounds = m.stats.get("file_path").toSeq.flatMap { r =>
                  for {
                    lo <- r.min; hi <- r.max
                    loB <- IcebergFormat.encodeBound(StringType, lo)
                    hiB <- IcebergFormat.encodeBound(StringType, hi)
                  } yield IcebergFormat.PosDeletePathFieldId -> (loB, hiB)
                }.toMap
                IcebergFormat.DataFileInfo(abs.toString, m.rows,
                  fs.getFileStatus(abs).getLen, bounds = pathBounds, content = 1)
              }
              // content-0 insert files: bounds arrive keyed by schema
              // position+1 — remap to the table's REAL field ids (sparse
              // after evolution) so pruning keys match the metadata
              val dataInfos = msgs.flatMap(_.dataFiles).filter(_.rows > 0L).map { m =>
                val bounds = m.bounds.flatMap { case (id, lohi) =>
                  val idx = id - 1
                  if (idx >= 0 && idx < p.fieldIds.length) Some(p.fieldIds(idx) -> lohi)
                  else None
                }
                IcebergFormat.DataFileInfo(m.absPath, m.rows, m.sizeBytes, bounds = bounds)
              }
              if (delInfos.isEmpty && dataInfos.isEmpty) return // nothing matched: no snapshot
              IcebergFormat.resumeWriter(s, location).commit(dataInfos ++ delInfos)
            }

            override def abort(messages: Array[WriterCommitMessage]): Unit = {
              val fs = new Path(location).getFileSystem(conf.value)
              fs.delete(new Path(location, deleteRel), true)
              fs.delete(new Path(location, dataRel), true)
              ()
            }
          }
        }
      }
    }
}

final case class IcebergMorDeltaMessage(
    deleteFile: Option[IceLiteWriteMessage],
    dataFiles: Seq[IcebergWriteMessage])
    extends WriterCommitMessage

/** Top-level (serializable) factory — an inner anonymous class would drag
  * the whole operation, table plan included, into the task closure. */
final class IcebergMorDeltaWriterFactory(
    conf: SerializableHadoopConf,
    location: String,
    deleteRel: String,
    dataRel: String,
    schema: StructType)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new IcebergMorDeltaWriter(conf, location, deleteRel, dataRel, schema, partitionId, taskId)
}

/** Executor-side delta writer: streams `(_file, _pos)` row ids into one
  * position-delete parquet per task (spec content-1 shape: `file_path`
  * string + `pos` long, the exact columns [[IcebergFormat.scanFiles]] and
  * DuckDB anti-join on), and UPDATE/MERGE insert rows into one v2-layout
  * data parquet per task via the field-id-preserving
  * [[IcebergNestedDataWriter]] (inline min/max stats → manifest bounds). */
final class IcebergMorDeltaWriter(
    conf: SerializableHadoopConf,
    location: String,
    deleteRel: String,
    dataRel: String,
    schema: StructType,
    partitionId: Int,
    taskId: Long)
    extends DeltaWriter[InternalRow] {

  private var delWriter: IceLiteDataWriter = _
  private var insWriter: IcebergNestedDataWriter = _
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

  override def insert(row: InternalRow): Unit = {
    if (insWriter == null)
      insWriter = new IcebergNestedDataWriter(conf, location, dataRel, schema,
        partitionId, taskId)
    insWriter.write(row)
  }

  /** Never called: representUpdateAsDeleteAndInsert splits updates. */
  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "iceberg-format delta updates are represented as delete+insert")
  override def reinsert(metadata: InternalRow, row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = IcebergMorDeltaMessage(
    Option(delWriter).map(_.commit().asInstanceOf[IceLiteWriteMessage]),
    Option(insWriter).map(_.commit().asInstanceOf[IcebergWriteMessage]).toSeq)

  override def abort(): Unit = {
    if (delWriter != null) delWriter.abort()
    if (insWriter != null) insWriter.abort()
  }
  override def close(): Unit = ()
}
