package graft.sources

import graft.icelite.{FsCatalog, IceTable, Snapshot}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.{MessageType, PrimitiveType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.sources.DataSourceRegister

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.util.{Map => JMap}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** DataSource V2 packaging of the IceLite table format (SURVEY.md §4's
  * "idiomatic packaging" — `/root/reference` exposes its tables to DuckDB
  * through `iceberg_scan(...)`; this is the Spark-native equivalent:
  * `spark.read.format("icelite").option("location", dir)` or
  * `.option("warehouse", wh).option("table", "ns.name")`).
  *
  * What the V2 integration buys over the library-call scan
  * (`Engine.table` / `IceTable.scan`):
  *
  *  - `SupportsPushDownFilters`: range/equality predicates from a plain SQL
  *    `WHERE` clause reach [[IceTable.planFilesBounds]], so manifest min/max
  *    FILE SKIPPING fires for arbitrary Spark SQL — previously only
  *    `scanRange` callers got it. The scan node's `description()` reports
  *    `files=<survivors>/<total>` so pruning is visible in
  *    `.explain("formatted")` and assertable by PlanAuditSpec.
  *  - `SupportsPushDownRequiredColumns`: the pruned schema is converted to
  *    a parquet projection (`parquet.read.schema`), so unprojected columns
  *    are never decoded — `ReadSchema` semantics at the file level.
  *  - `SupportsReportPartitioning` + `HasPartitionKey`: hive-layout
  *    partitioned tables report `KeyGroupedPartitioning(identity(p), n)`,
  *    one input partition per partition value. Under
  *    `spark.sql.sources.v2.bucketing.enabled` two IceLite tables
  *    partitioned on the join key plan a STORAGE-PARTITIONED JOIN — zero
  *    Exchange on either side, co-location coming from OUR table metadata
  *    rather than Spark's catalog (the an58 strategy without `bucketBy`).
  *
  * At 100 TB: planning cost is O(manifests touched) metadata reads (the
  * manifest-summary skip applies before any manifest is opened), and the
  * per-file readers run fully executor-side. Snapshot selection
  * (`option("snapshot", id)` / `option("asOfTimestamp", ms)`) gives SQL
  * users the same time travel the library scan has.
  */
final class IceLiteSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "icelite"

  private def resolveLocation(options: CaseInsensitiveStringMap): String = {
    val loc = Option(options.get("location")).orElse(Option(options.get("path")))
    loc.getOrElse {
      val wh = Option(options.get("warehouse")).getOrElse(
        throw new IllegalArgumentException(
          "icelite: pass option(\"location\", <table dir>) or " +
            "option(\"warehouse\", <dir>) + option(\"table\", \"ns.name\")"))
      val fq = Option(options.get("table")).getOrElse(
        throw new IllegalArgumentException("icelite: option(\"table\", \"ns.name\") required with warehouse"))
      val (ns, name) = fq.split('.') match {
        case Array(a, b) => (a, b)
        case _ => throw new IllegalArgumentException(s"icelite: table must be ns.name, got '$fq'")
      }
      new FsCatalog(SparkSession.active, wh).loadTable(ns, name).location.toString
    }
  }

  private def loadIce(options: CaseInsensitiveStringMap): IceTable =
    IceTable.load(SparkSession.active, resolveLocation(options))

  private def isIceberg(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("iceberg", false)

  /** The df schema rides into getTable for writes — required for the
    * iceberg nested-write path, where the table may not exist yet. */
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (isIceberg(options)) {
      // an EXISTING table infers from its committed metadata (the
      // streaming-read path); an absent one has no schema to infer — the
      // write path hands the DataFrame schema to getTable directly
      val loc  = resolveLocation(options)
      val hint = new org.apache.hadoop.fs.Path(loc, "metadata/version-hint.text")
      val fs   = hint.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
      if (!fs.exists(hint))
        throw new UnsupportedOperationException(
          s"no Iceberg table at $loc to infer a schema from; writes pass the " +
            "DataFrame schema, batch reads go through Engine.scanIcebergMetadata")
      graft.icelite.IcebergFormat.scan(SparkSession.active,
        graft.icelite.IcebergFormat.currentMetadataPath(SparkSession.active, loc)).schema
    } else loadIce(options).metadata.schema

  override def inferPartitioning(options: CaseInsensitiveStringMap): Array[Transform] =
    if (isIceberg(options)) Array.empty
    else loadIce(options).metadata.partitionCols.map(Expressions.identity(_)).toArray

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    if (isIceberg(opts))
      return new IcebergV2Table(resolveLocation(opts), schema)
    val ice  = loadIce(opts)
    val snap = resolveSnapshot(ice, opts)
    new IceLiteV2Table(ice, snap, None, Option(opts.get("delete-mode")))
  }

  private def resolveSnapshot(ice: IceTable, opts: CaseInsensitiveStringMap): Option[Snapshot] = {
    val md = ice.metadata
    Option(opts.get("snapshot")).map(_.toLong).map { id =>
      md.snapshot(id).getOrElse(throw new NoSuchElementException(s"snapshot $id of ${md.name}"))
    }.orElse {
      Option(opts.get("asoftimestamp")).map(_.toLong).map { ts =>
        md.snapshots.filter(_.timestamp_ms <= ts)
          .sortBy(s => (s.timestamp_ms, s.snapshot_id)).lastOption
          .getOrElse(throw new NoSuchElementException(s"no snapshot of ${md.name} at or before $ts"))
      }
    }.orElse(md.currentSnapshot)
  }
}

object IceLiteSource {
  /** Count of data files actually opened by V2 readers — observability for
    * specs asserting that runtime/static pruning really avoided IO
    * (meaningful in local mode, where executors share the JVM). */
  private[graft] val filesOpened = new java.util.concurrent.atomic.LongAdder()
  /** Position-delete files actually OPENED by readers (post range-pruning)
    * — the counter specs use to prove a delete file is never read for a
    * data file outside its manifest `file_path` range. Test-only observability. */
  private[graft] val deleteFilesOpened = new java.util.concurrent.atomic.LongAdder()
  /** Parquet footers opened DURING PLANNING (driver-side, serial — the
    * 100 TB anti-pattern). Stays 0 for files whose manifests carry
    * `split_offsets`; only externally-written oversized files pay it. */
  private[graft] val planningFootersOpened = new java.util.concurrent.atomic.LongAdder()
}

/** V2 Table over one resolved IceLite snapshot (None = empty, pre-commit).
  * `onCommit` is the catalog-publication hook: a REST-catalog-bound table
  * must advance the catalog's metadata pointer after each write's FS
  * commit (pointer publication is what makes the commit visible to other
  * catalog users); path-addressed tables need no hook. */
final class IceLiteV2Table(
    ice: IceTable,
    snap: Option[Snapshot],
    onCommit: Option[IceTable => Unit] = None,
    deleteMode: Option[String] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  private val md = ice.metadata

  /** Row-lineage metadata columns (Iceberg's `_file`/`_pos`): the
    * manifest-relative data file path and the 0-based row position within
    * it — queryable like any column (`SELECT _file, _pos FROM t`) and the
    * ROW ID the merge-on-read delta operation below keys its position
    * deletes by. Non-nullable by construction (every physical row has
    * both), which `RewriteRowLevelCommand.resolveRowIdAttrs` requires of
    * row-id attributes. Hidden when the user schema declares a column of
    * the same name (Spark's standard conflict rule). */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(IceLiteMetaColumn("_file", StringType), IceLiteMetaColumn("_pos", LongType))

  /** METADATA-ONLY DELETE (Spark's OptimizeMetadataOnlyDeleteFromTable
    * rewrites the copy-on-write plan back to this when the condition is
    * fully file-provable): accepted only when EVERY current file is
    * all-match or no-match under [[IceTable.metadataDeletePlan]]'s sound
    * tri-state rules — then the delete is one snapshot commit dropping
    * the all-match files, zero data IO (Iceberg's partition-aligned
    * DELETE). Any mixed file → refuse → Spark runs the row-level
    * rewrite instead. */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    ice.metadataDeletePlan(filters.toIndexedSeq).isDefined

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val removed = ice.metadataDeletePlan(filters.toIndexedSeq).getOrElse(
      throw new IllegalStateException(
        "deleteWhere invoked on a condition canDeleteWhere rejected"))
    if (removed.nonEmpty) {
      val t = ice.commitReplaceScanned(removed, Nil, "delete")
      onCommit.foreach(_(t))
    }
  }

  override def name(): String = s"icelite.${md.namespace}.${md.name}"
  // file-source read semantics: every column is nullable at read time —
  // an evolved column is physically ABSENT from pre-evolution files, so
  // nulls can always surface regardless of the declared required flag
  // (Spark's own parquet relation applies the same asNullable coercion;
  // without it, codegen NPEs on the first evolved read)
  override def schema(): StructType =
    StructType(md.schema.fields.map(_.copy(nullable = true)))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)
  override def partitioning(): Array[Transform] =
    md.partitionCols.map(Expressions.identity(_)).toArray

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IceLiteScanBuilder(ice, snap,
      maxSnaps = Option(options.get("maxsnapshotspertrigger")).map(_.toInt))

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new IceLiteWriteBuilder(ice, info, onCommit)

  /** SQL `DELETE FROM` / `UPDATE` / `MERGE INTO`. Two execution modes,
    * chosen per-operation (Iceberg's `write.delete.mode` concept):
    *  - `copy-on-write` (default): group-based rewrite of affected FILES
    *    (see [[IceLiteRowLevelOperation]]) — read-optimized, write cost
    *    proportional to affected data.
    *  - `merge-on-read`: a [[SupportsDelta]] operation that writes only
    *    POSITION DELETE files keyed by the `_file`/`_pos` metadata
    *    columns (see [[IceLiteDeltaOperation]]) — write cost proportional
    *    to affected ROWS, readers apply the deletes until compaction.
    * Mode resolves from the table load option `delete-mode`, else the
    * session conf `graft.delete.mode`, else copy-on-write. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    val mode = deleteMode
      .orElse(Option(SparkSession.active.conf.get("graft.delete.mode", null)))
      .getOrElse("copy-on-write")
    mode match {
      case "merge-on-read" => new IceLiteDeltaBuilder(ice, snap, info, onCommit)
      case "copy-on-write" => new IceLiteRowLevelBuilder(ice, snap, info, onCommit)
      case other => throw new IllegalArgumentException(
        s"unknown delete mode '$other' (expected copy-on-write | merge-on-read)")
    }
  }
}

/** One `_file`-style metadata column (named param avoids the anonymous-
  * impl name-shadowing trap with interface accessors). */
final case class IceLiteMetaColumn(colName: String, dt: DataType)
    extends org.apache.spark.sql.connector.catalog.MetadataColumn {
  override def name(): String = colName
  override def dataType(): DataType = dt
  override def isNullable: Boolean = false
}

final class IceLiteScanBuilder(
    ice: IceTable,
    snap: Option[Snapshot],
    onBuild: Scan => Unit = _ => (),
    maxSnaps: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private val md = ice.metadata
  private var required: StructType = md.schema
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false
  private var limit: Option[Int] = None

  /** Partial limit pushdown: readers stop emitting after `n` rows per
    * partition (returning false keeps Spark's final Limit in the plan,
    * which is required — file-parallel partitions each honor n). */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); false }

  /** Metadata-only COUNT(*): answered from the manifests' record counts
    * with ZERO data-file IO (Iceberg answers the same query from its
    * manifest record_count field; ic48 gates the library-call twin).
    * Accepted only for ungrouped CountStar with no residual filters and a
    * complete row-count record — anything else falls back to a real scan. */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    canPushCount(aggregation)

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    countPushed = canPushCount(aggregation)
    countPushed
  }

  private def canPushCount(aggregation: Aggregation): Boolean =
    pushed.isEmpty &&
      aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions.head.isInstanceOf[CountStar] &&
      snap.exists(sn => ice.statsRowCount(sn).isDefined)

  /** Accept single-column comparison filters for FILE-granular pruning;
    * everything is returned as residual because manifest ranges can never
    * prove a row-level predicate (same contract as parquet row-group
    * stats: skip what can't match, re-check what might). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(usableForPruning)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  private def usableForPruning(f: Filter): Boolean = f match {
    case EqualTo(_, v)            => isLit(v)
    case GreaterThan(_, v)        => isLit(v)
    case GreaterThanOrEqual(_, v) => isLit(v)
    case LessThan(_, v)           => isLit(v)
    case LessThanOrEqual(_, v)    => isLit(v)
    // a prefix is a range on string bounds: [prefix, successor(prefix)] —
    // sound on TRUNCATED manifest bounds too (truncation only widens the
    // recorded range, so the overlap test stays conservative)
    case StringStartsWith(_, p)   => p != null && p.nonEmpty
    case _                        => false
  }

  private def isLit(v: Any): Boolean = v match {
    case null => false
    case _: String | _: java.lang.Integer | _: java.lang.Long | _: java.lang.Double |
        _: java.lang.Float | _: java.lang.Short | _: java.lang.Byte | _: java.lang.Boolean => true
    case _ => false
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    if (countPushed) {
      val cs = new IceLiteCountScan(ice, snap.get)
      onBuild(cs)
      return cs
    }
    // fold pushed filters into per-column [lower, upper] bounds (first
    // bound per column wins; later ones stay row-level residuals — sound
    // because pruning only ever widens what survives)
    val bounds = mutable.LinkedHashMap.empty[String, (Option[String], Option[String])]
    def add(c: String, lo: Option[String], hi: Option[String]): Unit =
      if (!bounds.contains(c)) bounds(c) = (lo, hi)
    pushed.foreach {
      case EqualTo(c, v)            => add(c, Some(v.toString), Some(v.toString))
      case GreaterThan(c, v)        => add(c, Some(v.toString), None)
      case GreaterThanOrEqual(c, v) => add(c, Some(v.toString), None)
      case LessThan(c, v)           => add(c, None, Some(v.toString))
      case LessThanOrEqual(c, v)    => add(c, None, Some(v.toString))
      // successor(p) is an EXCLUSIVE upper bound; the scan treats hi
      // inclusively, which keeps at most one extra boundary file — sound
      case StringStartsWith(c, p)   => add(c, Some(p), IcebergMorScan.prefixSuccessor(p))
      case _                        =>
    }
    val s = new IceLiteScan(ice, snap, required, bounds.toMap, pushed, limit, maxSnaps)
    onBuild(s)
    s
  }
}

/** Pushed-down ungrouped COUNT(*): one partition, one row, straight from
  * the manifests' record counts — the scan never touches a data file. */
final class IceLiteCountScan(ice: IceTable, snap: Snapshot) extends Scan with Batch {
  private val rows = ice.statsRowCount(snap).getOrElse(
    throw new IllegalStateException("count pushdown accepted without full row counts"))

  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def description(): String =
    s"icelite metadata-only count rows=$rows (no data files read)"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(IceLiteCountPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean = if (done) false else { done = true; true }
          override def get(): InternalRow =
            new GenericInternalRow(Array[Any](p.asInstanceOf[IceLiteCountPartition].rows))
          override def close(): Unit = ()
        }
    }
}

final case class IceLiteCountPartition(rows: Long) extends InputPartition

/** One scan = one snapshot's pruned file list. Also the Batch (stateless). */
final class IceLiteScan(
    ice: IceTable,
    snap: Option[Snapshot],
    required: StructType,
    bounds: Map[String, (Option[String], Option[String])],
    pushed: Array[Filter],
    limit: Option[Int] = None,
    maxSnaps: Option[Int] = None)
    extends Scan with Batch with SupportsReportPartitioning with SupportsRuntimeFiltering
    with SupportsReportStatistics {

  private val md       = ice.metadata
  private val partCols = md.partitionCols

  private def numericPart(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType | FloatType => true
    case _                                               => false
  }

  /** Partition-column bounds are applied on the k=v path values (exact,
    * directory-granular) — they never appear in file stats because hive
    * layout strips them from the data files. */
  private def partValueHit(col: String, raw: String): Boolean =
    bounds.get(col) match {
      case None => true
      case Some((lo, hi)) =>
        val dt = md.schema.fields.find(_.name == col).map(_.dataType).getOrElse(StringType)
        val v  = IceLiteScan.unescapePath(raw)
        if (v == IceLiteScan.HiveNullPart) false // bounded col: null can't match a comparison
        else {
          val cmp: (String, String) => Int =
            if (numericPart(dt)) (a, b) => BigDecimal(a).compare(BigDecimal(b))
            else (a, b) => a.compareTo(b)
          lo.forall(l => cmp(v, l) >= 0) && hi.forall(h => cmp(v, h) <= 0)
        }
    }

  /** Relative file path -> partition values in partCols order (raw path
    * encoding), or Nil for unpartitioned tables. */
  private def partValuesOf(rel: String): Seq[String] = {
    if (partCols.isEmpty) return Nil
    val kv = rel.split('/').iterator.filter(_.contains('=')).map { seg =>
      val i = seg.indexOf('=')
      seg.substring(0, i) -> seg.substring(i + 1)
    }.toMap
    partCols.map(c => kv.getOrElse(c,
      throw new IllegalStateException(s"partition column $c missing from path $rel")))
  }

  // planned once: stats-pruned (data cols) then path-pruned (partition cols)
  private lazy val totalFiles: Int = snap.map(ice.filesOf(_).size).getOrElse(0)
  private lazy val staticSurvivors: Seq[String] = snap match {
    case None => Nil
    case Some(sn) =>
      val dataBounds = bounds.filterNot { case (c, _) => partCols.contains(c) }
      ice.planFilesBounds(sn, dataBounds)
        .filter(rel => partCols.isEmpty ||
          partCols.zip(partValuesOf(rel)).forall { case (c, v) => partValueHit(c, v) })
  }

  // ------------------------------------------------ runtime (join) pruning

  /** Join-driven dynamic partition pruning (SupportsRuntimeFiltering): at
    * execution time Spark hands back In/EqualTo filters on the partition
    * columns derived from the OTHER join side's actual keys, and the scan
    * drops whole partition directories before any reader opens — Spark's
    * DPP re-expressed over OUR table metadata. Unrecognized runtime
    * filters prune nothing (conservative). */
  @volatile private var runtimeKept: Map[String, Set[String]] = Map.empty

  override def filterAttributes(): Array[NamedReference] =
    partCols.map(c => Expressions.column(c)).toArray

  override def filter(filters: Array[Filter]): Unit = {
    val kept = filters.flatMap {
      case In(c, vs) if partCols.contains(c) =>
        Some(c -> vs.filter(_ != null).map(_.toString).toSet)
      case EqualTo(c, v) if partCols.contains(c) && v != null =>
        Some(c -> Set(v.toString))
      case _ => None
    }.toMap
    if (kept.nonEmpty) runtimeKept = kept
  }

  private def runtimeHit(rel: String): Boolean =
    runtimeKept.isEmpty || partCols.zip(partValuesOf(rel)).forall { case (c, raw) =>
      runtimeKept.get(c).forall(_.contains(IceLiteScan.unescapePath(raw)))
    }

  // planning-state memoization: description()/estimateStatistics()/
  // outputPartitioning()/planInputPartitions() each consult the survivor
  // set, and Spark calls them several times per query — without caching
  // that's O(files) path work repeated per call. The static portion never
  // changes; re-filter only when a NEW runtime filter map arrives
  // (runtimeKept is written at most once, before planInputPartitions).
  @volatile private var survivorsCache: (AnyRef, Seq[String]) = null
  private def survivors: Seq[String] = {
    val rk = runtimeKept
    val c  = survivorsCache
    if (c != null && (c._1 eq rk)) c._2
    else {
      val s = if (rk.isEmpty) staticSurvivors else staticSurvivors.filter(runtimeHit)
      survivorsCache = (rk, s)
      s
    }
  }

  @volatile private var partitionsCache: (AnyRef, Array[InputPartition]) = null
  private def partitions: Array[InputPartition] = {
    val rk = runtimeKept
    val c  = partitionsCache
    if (c != null && (c._1 eq rk)) c._2
    else {
      val p = buildPartitions(survivors)
      partitionsCache = (rk, p)
      p
    }
  }

  // manifest entry lookup for ranged-split gating (sizes + split offsets
  // recorded at write time — zero planning IO)
  private lazy val entryByFile =
    snap.toSeq.flatMap(ice.entriesOf).map(e => e.file -> e).toMap

  private def buildPartitions(surv: Seq[String]): Array[InputPartition] = {
    val loc = ice.location.toString
    if (partCols.isEmpty) {
      // oversized files whose manifests recorded size + split offsets fan
      // out into row-group-aligned ranged partitions (reader resolves row
      // numbering from its own footer open — `_pos` stays file-global, so
      // position deletes apply split-invariantly). Restricted to the
      // unpartitioned path: HasPartitionKey requires distinct keys across
      // partitions, which splitting a keyed partition would violate.
      val target = SparkSession.active.conf.get("graft.split.size",
        IcebergMorScan.DefaultSplitBytes.toString).toLong
      surv.flatMap { rel =>
        val abs = s"$loc/$rel"
        val split = for {
          e    <- entryByFile.get(rel)
          sz   <- e.sizeBytes if target > 0 && sz >= 2 * target
          offs <- e.splitOffsets
          ps   <- IcebergMorScan.rangedFromOffsets(abs, sz, offs, target, null, 0L)
        } yield ps
        split.getOrElse(Seq(IceLitePartition(Array(abs), null): InputPartition))
      }.toArray
    } else {
      val partTypes = partCols.map(c => md.schema.fields.find(_.name == c).get.dataType)
      surv.groupBy(partValuesOf).toSeq.sortBy(_._1.mkString("/"))
        .map { case (vals, files) =>
          val key = new GenericInternalRow(
            vals.zip(partTypes).map { case (v, dt) => IceLiteScan.partToCatalyst(v, dt) }.toArray)
          IceLitePartition(files.map(f => s"$loc/$f").toArray, key): InputPartition
        }.toArray
    }
  }

  /** The table-relative paths this scan reads — for a row-level (ReplaceData)
    * operation these ARE the replaced groups: the write's commit swaps
    * exactly this set for the staged rewrite. Evaluated at COMMIT time so
    * any runtime group filtering that narrowed the scan narrows the
    * replacement identically. */
  private[sources] def replacedFiles: Set[String] = survivors.toSet

  override def readSchema(): StructType = required

  override def description(): String = {
    val b = bounds.map { case (c, (lo, hi)) =>
      s"$c in [${lo.getOrElse("-inf")}, ${hi.getOrElse("+inf")}]"
    }.mkString(", ")
    s"icelite ${md.namespace}.${md.name} files=${survivors.size}/$totalFiles" +
      (if (b.nonEmpty) s" prunedBy=[$b]" else "")
  }

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = partitions

  /** Report key-grouped layout only when every partition column survives
    * column pruning (the keys must resolve against the scan output). */
  override def outputPartitioning(): Partitioning =
    if (partCols.nonEmpty && partCols.forall(required.fieldNames.contains))
      new KeyGroupedPartitioning(
        partCols.map(c => Expressions.identity(c)).toArray, partitions.length)
    else new UnknownPartitioning(partitions.length)

  /** Manifest row counts → planner statistics: with real numRows and a
    * schema-width sizeInBytes estimate, Spark's own join planning can pick
    * a broadcast join for a small IceLite table WITHOUT a broadcast()
    * hint — the CBO input a 100 TB star join needs. (A V2 relation with
    * no statistics defaults to conf.defaultSizeInBytes = huge = SMJ.) */
  override def estimateStatistics(): Statistics = {
    val rowsOpt = snap.flatMap(sn => ice.statsRowCountForFiles(sn, survivors.toSet))
    val width = required.fields.map(_.dataType match {
      case StringType => 24L
      case LongType | DoubleType | TimestampType | TimestampNTZType => 8L
      case IntegerType | DateType | FloatType => 4L
      case BooleanType => 1L
      case _ => 16L
    }).sum.max(8L)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        rowsOpt.map(r => java.util.OptionalLong.of(math.max(r, 1L) * width))
          .getOrElse(java.util.OptionalLong.empty())
      override def numRows(): java.util.OptionalLong =
        rowsOpt.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty())
    }
  }

  /** Live position-delete files of the scanned snapshot, each with its
    * data-file path range: readers open a delete file only for data files
    * inside that range (manifest-stat pruning, reader-side). */
  private lazy val deleteFiles: Seq[PositionDeleteFile] =
    snap.toSeq.flatMap(ice.deleteEntriesOf).map { e =>
      val fp = e.stats.flatMap(_.get("file_path"))
      PositionDeleteFile(new org.apache.hadoop.fs.Path(ice.location, e.file).toString,
        fp.flatMap(_.min), fp.flatMap(_.max))
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new IceLiteReaderFactory(
      new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration),
      required, partCols.toArray, md.scanSchema, limit, deleteFiles)

  /** `spark.readStream.format("icelite")`: tail the snapshot log as a
    * Structured Streaming source — each micro-batch is exactly the files
    * appended in an (offset, offset] snapshot window (Iceberg's streaming
    * read). Offsets are snapshot ids, so recovery replays a committed
    * window bit-identically. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new IceLiteMicroBatchStream(ice, required,
      new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration),
      maxSnaps)
}

final case class IceLiteOffset(snapshotId: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = snapshotId.toString
}

/** Snapshot-log tailing micro-batch stream: latestOffset re-reads the
  * table metadata (O(1) version walk), planInputPartitions is the
  * manifest DELTA of the window — planning cost O(new commits), never
  * O(table). Commits are tracked by Spark's checkpoint; `commit` is a
  * no-op because snapshots are immutable.
  *
  * Admission control: `option("maxSnapshotsPerTrigger", k)` caps each
  * micro-batch at k snapshot windows — the backfill knob that keeps a
  * catch-up read from planning one giant batch over months of commits.
  * `Trigger.AvailableNow` is supported natively: the target snapshot is
  * pinned at query start, batches advance (rate-limited) to exactly
  * that pin and the query stops — later concurrent commits are left for
  * the next run, as the contract requires. */
final class IceLiteMicroBatchStream(
    ice: IceTable,
    required: StructType,
    conf: SerializableHadoopConf,
    maxSnaps: Option[Int] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private val tableSchema = ice.metadata.scanSchema
  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = IceLiteOffset(0L)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(ice.metadata.current_snapshot_id)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[IceLiteOffset].snapshotId
    val head = availableNowTarget.getOrElse(ice.metadata.current_snapshot_id)
    val end  = maxSnaps.map(k => math.min(head, from + k)).getOrElse(head)
    IceLiteOffset(math.max(end, from))
  }

  override def latestOffset(): Offset =
    IceLiteOffset(ice.metadata.current_snapshot_id)

  override def deserializeOffset(json: String): Offset =
    IceLiteOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[IceLiteOffset].snapshotId
    val to   = end.asInstanceOf[IceLiteOffset].snapshotId
    val loc  = ice.location.toString
    val partCols = ice.metadata.partitionCols
    // The INITIAL batch of a merge-on-read table applies the pinned
    // snapshot's position deletes reader-side (per-file range-pruned
    // bitmaps — same machinery as the batch scan) instead of failing:
    // batch 0 is a snapshot read, so delete application is well-defined.
    // Mid-stream windows crossing a delta snapshot still fail the
    // non-append guard — row-level changes mid-stream are CDC, served by
    // the changelog reader, not a files-appended source.
    val (delta, deletes) =
      ice.metadata.snapshot(to).filter(_ => from == 0L && to > 0L) match {
        case Some(toSnap) if ice.hasDeletes(toSnap) =>
          val dels = ice.deleteEntriesOf(toSnap).map { e =>
            val fp = e.stats.flatMap(_.get("file_path"))
            PositionDeleteFile(new org.apache.hadoop.fs.Path(ice.location, e.file).toString,
              fp.flatMap(_.min), fp.flatMap(_.max))
          }
          (ice.filesOf(toSnap), dels)
        case _ => (ice.incrementalFiles(from, to), Nil)
      }
    if (partCols.isEmpty)
      delta.map(rel => IceLitePartition(Array(s"$loc/$rel"), null, deletes): InputPartition).toArray
    else {
      // hive-layout tables stream too: each delta file's partition values
      // come off its path (the same parsing the batch scan uses), so the
      // reader restores the partition columns the data files omit
      val partTypes = partCols.map(c => tableSchema.fields.find(_.name == c).get.dataType)
      def valsOf(rel: String): Seq[String] = {
        val kv = rel.split('/').iterator.filter(_.contains('=')).map { seg =>
          val i = seg.indexOf('=')
          seg.substring(0, i) -> seg.substring(i + 1)
        }.toMap
        partCols.map(c => kv.getOrElse(c,
          throw new IllegalStateException(s"partition column $c missing from path $rel")))
      }
      delta.groupBy(valsOf).toSeq.sortBy(_._1.mkString("/"))
        .map { case (vals, files) =>
          val key = new GenericInternalRow(
            vals.zip(partTypes).map { case (v, dt) => IceLiteScan.partToCatalyst(v, dt) }.toArray)
          IceLitePartition(files.map(f => s"$loc/$f").toArray, key, deletes): InputPartition
        }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new IceLiteReaderFactory(conf, required,
      ice.metadata.partitionCols.toArray, tableSchema)

  override def commit(end: Offset): Unit = () // snapshots are immutable
  override def stop(): Unit = ()
}

object IceLiteScan {
  val HiveNullPart = "__HIVE_DEFAULT_PARTITION__"

  /** Minimal hive path unescape (%XX sequences; malformed %-runs pass
    * through literally, matching Spark's lenient behavior). */
  def unescapePath(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i  = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  /** Hive path partition value -> Catalyst value for the 8-primitive surface. */
  def partToCatalyst(raw: String, dt: DataType): Any = {
    val v = unescapePath(raw)
    if (v == HiveNullPart) null
    else dt match {
      case StringType    => UTF8String.fromString(v)
      case IntegerType   => v.toInt
      case LongType      => v.toLong
      case DoubleType    => v.toDouble
      case FloatType     => v.toFloat
      case BooleanType   => v.toBoolean
      case DateType      => java.time.LocalDate.parse(v).toEpochDay.toInt
      case TimestampType =>
        // session-timezone, microsecond-precision semantics (Spark's own
        // partition-value parsing) — java.sql.Timestamp.valueOf would use
        // the JVM default zone at millis, shifting keys on non-UTC JVMs
        org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToTimestamp(
          UTF8String.fromString(v),
          org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
          .getOrElse(throw new IllegalArgumentException(
            s"unparseable timestamp partition value '$v'"))
      case TimestampNTZType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .stringToTimestampWithoutTimeZone(UTF8String.fromString(v))
          .getOrElse(throw new IllegalArgumentException(
            s"unparseable timestamp_ntz partition value '$v'"))
      case other => throw new UnsupportedOperationException(s"partition type $other")
    }
  }
}

/** All files of one partition value (or one file, unpartitioned). The key
  * makes storage-partitioned joins possible (HasPartitionKey contract:
  * distinct keys across partitions, rows grouped by key). `deletes`
  * carries partition-scoped position-delete files for plans whose reader
  * factory can't know them up front (the streaming initial batch of a
  * merge-on-read table); batch scans pass them factory-wide instead. */
final case class IceLitePartition(
    files: Array[String],
    key: InternalRow,
    deletes: Seq[PositionDeleteFile] = Nil,
    ranges: Seq[IceLiteFileRange] = Nil, // aligned with `files` when non-empty
    seqs: Seq[Long] = Nil, // per-file data sequence numbers (equality-delete ordering)
    firstRowIds: Seq[Option[Long]] = Nil) // v3 row lineage: per-file implicit-id base
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** A row-group-aligned byte slice of one parquet file: the reader opens
  * only row groups whose midpoint falls in [start, end) and numbers rows
  * from `startRow`, so `_pos` (and therefore position-delete application)
  * stays file-global across splits. Lets one oversized file fan out to
  * many tasks instead of serializing on a single reader. */
final case class IceLiteFileRange(start: Long, end: Long, startRow: Long, rows: Long)

/** Hadoop Configuration isn't Serializable; standard writable-based wrapper. */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = { out.defaultWriteObject(); value.write(out) }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
  }
}

/** Executor-side reader: parquet-mr example API (GroupReadSupport) with a
  * per-file projection schema — only required columns are decoded. Flat
  * 8-primitive surface only, guaranteed by IceTable.create's validation.
  * Deliberately row-at-a-time: this is the PACKAGING layer; the headline
  * scan path for bulk analytics remains Spark's vectorized parquet reader
  * via the library scan. Correct-by-construction beats re-implementing the
  * vectorized reader against internal APIs. */
final class IceLiteReaderFactory(
    conf: SerializableHadoopConf,
    required: StructType,
    partCols: Array[String],
    tableSchema: StructType,
    limit: Option[Int] = None,
    deletes: Seq[PositionDeleteFile] = Nil,
    eqDeletes: Seq[EqualityDeleteFile] = Nil)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[IceLitePartition]
    new IceLitePartitionReader(conf.value, p, required, partCols, tableSchema, limit,
      deletes ++ p.deletes, // set-union semantics: factory-wide + partition-scoped
      eqDeletes)
  }
}

/** One live merge-on-read position-delete file with the data-file path
  * range it can touch (from its manifest stats): a reader opens it only
  * for data files inside the range, so delete-application IO tracks the
  * deletes' blast radius, never the table. */
final case class PositionDeleteFile(
    path: String,
    minFp: Option[String],
    maxFp: Option[String],
    // v3 deletion vector: (blob offset, blob size, referenced data file).
    // Set => `path` is a Puffin file and the vector applies to exactly
    // the referenced file (no range semantics).
    dv: Option[(Long, Long, String)] = None)

/** One live merge-on-read EQUALITY-delete file (spec content 2): its rows
  * are delete KEYS over `keyCols`, applied to data files whose data
  * sequence number is STRICTLY older than `seq` (the spec's ordering —
  * a row re-inserted after the delete survives). Column names are
  * resolved from `equality_ids` at planning, so the executor never needs
  * the field-id table. */
final case class EqualityDeleteFile(
    path: String,
    seq: Long,
    keyCols: Seq[String])

final class IceLitePartitionReader(
    conf: Configuration,
    partition: IceLitePartition,
    required: StructType,
    partCols: Array[String],
    tableSchema: StructType,
    limit: Option[Int] = None,
    deletes: Seq[PositionDeleteFile] = Nil,
    eqDeletes: Seq[EqualityDeleteFile] = Nil)
    extends PartitionReader[InternalRow] {

  private val partIdx: Map[String, Int] = partCols.zipWithIndex.toMap
  private var emitted = 0L

  // Field-id resolution (rename/drop-evolved tables): the scan passes an
  // id-stamped tableSchema (TableMetadata.scanSchema / PlanHeader
  // readById), and file columns bind by parquet field id instead of name.
  // A dropped-and-readded column's name maps to a FRESH id absent from
  // old files, so their retired values can never resurrect through a
  // name match.
  private val fieldIdOf: Map[String, Int] = tableSchema.fields
    .filter(_.metadata.contains("parquet.field.id"))
    .map(f => f.name -> f.metadata.getLong("parquet.field.id").toInt).toMap
  private val byId: Boolean = fieldIdOf.nonEmpty

  /** The FILE's column type for table column `name`: by field id on an
    * evolved table (loud failure if the file carries no ids at all — a
    * silent name fallback could resurrect dropped data), by name
    * otherwise. None = the file predates the column (reads as null). */
  private def fileFieldOf(msg: MessageType, name: String)
      : Option[org.apache.parquet.schema.Type] = {
    import scala.jdk.CollectionConverters._
    fieldIdOf.get(name) match {
      case Some(id) if byId =>
        val hit = msg.getFields.asScala.find(t => t.getId != null && t.getId.intValue == id)
        // a file with NO ids at all cannot be bound soundly on an evolved
        // table — its columns may carry pre-rename names (so containsField
        // is exactly the check that CANNOT see the problem). Same loud
        // contract as the Spark-read paths (fieldId.read.ignoreMissing
        // defaults false).
        if (hit.isEmpty && !msg.getFields.asScala.exists(_.getId != null))
          throw new IllegalStateException(
            s"table requires field-id resolution (rename/drop evolution) but a data " +
              s"file carries no parquet field ids; refusing to bind '$name'")
        hit
      case _ =>
        if (msg.containsField(name)) Some(msg.getType(msg.getFieldIndex(name)))
        else None
    }
  }

  // metadata-column ordinals in the required schema (`_file`/`_pos` are
  // metadata only when the user schema doesn't declare them — Spark hides
  // the metadata column on conflict, so a physical column of that name
  // must decode normally)
  private def isMetaName(n: String): Boolean =
    (n == "_file" || n == "_pos" || n == "_row_id" ||
      n == "_last_updated_sequence_number") && !tableSchema.fieldNames.contains(n)
  private def ordsOf(n: String): Array[Int] =
    required.fields.indices.filter(i =>
      required.fields(i).name == n && isMetaName(n)).toArray
  private val fileOrds: Array[Int] = ordsOf("_file")
  private val posOrds: Array[Int]  = ordsOf("_pos")
  // v3 row lineage (filled per-row unless the file physically carries
  // the column — a rewrite materialized it — in which case it decodes
  // like any data column and the per-file fill list below goes empty)
  private val rowIdOrds: Array[Int]   = ordsOf("_row_id")
  private val lastSeqOrds: Array[Int] = ordsOf("_last_updated_sequence_number")
  private val hasMeta =
    fileOrds.nonEmpty || posOrds.nonEmpty || rowIdOrds.nonEmpty || lastSeqOrds.nonEmpty

  private var fileIdx: Int = 0
  private var reader: ParquetReader[Group] = _
  private var rowFns: Array[Group => Any] = _ // one per required field; null fn = filled post-hoc (_pos)
  private var constRow: InternalRow = _ // when no data columns are projected
  private var constRemaining: Long = 0L
  // synthetic-position mode: no data column decodes, but positions matter
  // (metadata columns requested and/or deletes to apply)
  private var synthActive = false
  private var synthTotal: Long = 0L
  private var synthBase: Array[Any] = _
  private var curPos: Long = 0L
  private var curRange: IceLiteFileRange = _ // active byte-range split, or null
  private var curRelUtf8: UTF8String = _
  private var curFirstRowId: java.lang.Long = _ // null = lineage unassigned for this file
  private var curFileSeqBox: java.lang.Long = _ // null = no sequence known (non-MoR path)
  private var rowIdFill: Array[Int] = Array.empty   // rowIdOrds unless physically present
  private var lastSeqFill: Array[Int] = Array.empty // lastSeqOrds unless physically present
  private var delSet: java.util.BitSet = _ // null = no deletes touch this file
  // per-group row predicates of the equality deletes applicable to the
  // current file (strictly-newer deletes only); null = none apply
  private var eqChecks: Array[Group => Boolean] = _
  private var current: InternalRow = _

  // equality-delete key sets, loaded at most once per task and shared
  // across the partition's data files (the per-task "delete index")
  private val eqKeyCache = scala.collection.mutable.Map.empty[String, Set[List[Any]]]

  /** Key rows of equality-delete file `d` as Catalyst-typed tuples (types
    * from the TABLE schema, decoded with the same converters as data rows
    * so membership compares exactly; null keys match null values, the
    * spec's null-safe equality). */
  private def loadEqKeys(d: EqualityDeleteFile): Set[List[Any]] =
    eqKeyCache.getOrElseUpdate(d.path, {
      IceLiteSource.deleteFilesOpened.increment()
      val dPath  = new Path(d.path)
      val inFile = HadoopInputFile.fromPath(dPath, conf)
      val fr     = ParquetFileReader.open(inFile)
      val msg    = try fr.getFooter.getFileMetaData.getSchema finally fr.close()
      val proj = new MessageType("spark_schema",
        d.keyCols.map(c => fileFieldOf(msg, c).getOrElse(throw new NoSuchElementException(
          s"equality-delete file ${d.path} lacks key column $c"))): _*)
      val c2 = new Configuration(conf)
      c2.set(ReadSupport.PARQUET_READ_SCHEMA, proj.toString)
      val fns = d.keyCols.zipWithIndex.map { case (kc, i) =>
        val dt = tableSchema.fields.find(_.name == kc).getOrElse(
          throw new NoSuchElementException(s"equality-delete key column $kc not in table schema")
        ).dataType
        IceLiteConverters.fieldReader(proj.getType(i).asPrimitiveType(), dt, i)
      }
      val rdr = ParquetReader.builder(new GroupReadSupport(), dPath).withConf(c2).build()
      val out = scala.collection.mutable.HashSet.empty[List[Any]]
      try {
        var g = rdr.read()
        while (g != null) { out += fns.map(_(g)).toList; g = rdr.read() }
      } finally rdr.close()
      out.toSet
    })

  /** Partition-column constant for required field `name` (parsed from the
    * partition key row — already Catalyst-typed), or null if absent. */
  private def partConst(name: String): Any =
    partIdx.get(name) match {
      case Some(i) if partition.key != null =>
        val dt = tableSchema.fields.find(_.name == partCols(i)).get.dataType
        partition.key.get(i, dt)
      case _ => null
    }

  // v3 `initial-default` literals riding the scan schema's field metadata
  // (set by IcebergMorV2Table.schema()), Catalyst-typed for InternalRow
  private lazy val initDefaults: Map[String, Any] = tableSchema.fields.flatMap { f =>
    if (!f.metadata.contains("graft.initial-default")) None
    else {
      val v = graft.icelite.IcebergFormat.decodeDefault(f.dataType,
        org.json4s.jackson.JsonMethods.parse(f.metadata.getString("graft.initial-default")))
      Some(f.name -> (v match {
        case s: String        => org.apache.spark.unsafe.types.UTF8String.fromString(s)
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
        case other            => other
      }))
    }
  }.toMap

  /** Constant for a required field this FILE does not physically hold:
    * its partition value, else its v3 `initial-default` (pre-evolution
    * files read the default INSTEAD of null; files that carry the column
    * keep explicit nulls — presence decides, which is why this fallback
    * only runs when the file lacks the field). */
  private def fillConst(name: String): Any = {
    val p = partConst(name)
    if (p != null) p else initDefaults.getOrElse(name, null)
  }

  /** Manifest-relative path of an absolute data-file path (anchored at the
    * `data/snap-` segment every committed file lives under) — the `_file`
    * value, and the key position-delete files match on. */
  private def relOf(full: String): String = {
    val i = full.indexOf("/data/snap-")
    if (i >= 0) full.substring(i + 1) else full
  }

  /** Deleted positions of data file `rel` as a bitmap, or null when no
    * delete file's path range covers it. Bounded work: only covering
    * delete files are opened (range-pruned), and the bitmap holds only
    * this file's deleted positions — the per-task "delete index" shape
    * Iceberg MoR readers use. */
  private def loadDeletes(rel: String): java.util.BitSet = {
    def strip(s: String) = s.replaceFirst("^[a-z][a-z0-9+.-]*:/+", "/")
    val relN = strip(rel)
    // v3 deletion vectors match their referenced file EXACTLY (fields
    // 143-145); parquet delete files match by their recorded path range.
    // When multiple vectors name the file, older ones are subsets of the
    // newest (the v3 superset contract), so OR-ing all of them equals
    // applying the newest.
    val covering = deletes.filter { d =>
      d.dv match {
        case Some((_, _, ref)) => strip(ref) == relN
        case None =>
          d.minFp.forall(_.compareTo(rel) <= 0) && d.maxFp.forall(rel.compareTo(_) <= 0)
      }
    }
    if (covering.isEmpty) return null
    val bs = new java.util.BitSet()
    covering.foreach { d =>
      d.dv match {
        case Some((off, sz, _)) =>
          IceLiteSource.deleteFilesOpened.increment()
          val it = graft.icelite.DeletionVectors.readBitmap(d.path, off, sz).getLongIterator
          while (it.hasNext) {
            val p = it.next()
            require(p >= 0 && p <= Int.MaxValue.toLong,
              s"deletion-vector position $p out of bitmap range")
            bs.set(p.toInt)
          }
        case None =>
          IceLiteSource.deleteFilesOpened.increment()
          val rdr = ParquetReader.builder(new GroupReadSupport(), new Path(d.path))
            .withConf(conf).build()
          try {
            var g = rdr.read()
            while (g != null) {
              if (g.getString("file_path", 0) == rel) {
                val p = g.getLong("pos", 0)
                require(p >= 0 && p <= Int.MaxValue.toLong, s"delete position $p out of bitmap range")
                bs.set(p.toInt)
              }
              g = rdr.read()
            }
          } finally rdr.close()
      }
    }
    if (bs.isEmpty) null else bs
  }

  /** Is the current decoded row removed by an applicable equality delete? */
  private def eqDeleted(g: Group): Boolean = {
    if (eqChecks == null) return false
    var i = 0
    while (i < eqChecks.length) { if (eqChecks(i)(g)) return true; i += 1 }
    false
  }

  private def openNextFile(): Boolean = {
    if (fileIdx >= partition.files.length) return false
    val full  = partition.files(fileIdx)
    val path  = new Path(full)
    val range = if (partition.ranges.nonEmpty) partition.ranges(fileIdx) else null
    // data sequence number gates equality-delete application: only deletes
    // STRICTLY newer than the file apply (a restated row survives). Files
    // planned without seqs (non-MoR paths) never see equality deletes.
    val fileSeq = if (partition.seqs.nonEmpty) partition.seqs(fileIdx) else Long.MaxValue
    val eqApplicable = eqDeletes.filter(_.seq > fileSeq)
    curRange = range
    curFirstRowId = partition.firstRowIds.lift(fileIdx).flatten
      .map(Long.box).orNull
    curFileSeqBox =
      if (partition.seqs.nonEmpty) Long.box(partition.seqs(fileIdx)) else null
    fileIdx += 1
    IceLiteSource.filesOpened.increment()

    val rel = relOf(full)
    curRelUtf8 = UTF8String.fromString(rel)
    delSet = loadDeletes(rel)

    val inFile  = HadoopInputFile.fromPath(path, conf)
    val fr      = ParquetFileReader.open(inFile)
    val fileMsg = try {
      if (range != null && range.startRow < 0) {
        // planner-deferred range (manifest split_offsets, zero planning
        // IO): resolve startRow/rows from the footer THIS open already
        // paid for — blocks whose midpoint falls in [start, end) are
        // exactly what parquet's range filter will read
        var startRow = 0L
        var rows     = 0L
        fr.getFooter.getBlocks.forEach { b =>
          val mid = b.getStartingPos + b.getCompressedSize / 2
          if (mid < range.start) startRow += b.getRowCount
          else if (mid < range.end) rows += b.getRowCount
        }
        curRange = IceLiteFileRange(range.start, range.end, startRow, rows)
      }
      fr.getFooter.getFileMetaData.getSchema
    } finally fr.close()
    curPos = if (curRange != null) curRange.startRow else 0L

    // physical presence wins: a partition-listed column decodes from the
    // file when the file actually holds it (e.g. a delta insert file on a
    // partitioned iceberg-format table, committed with null partition
    // metadata); partConst fills it only for files that omit the column
    // (hive layout / spec Column Projection). Binding is by name, or by
    // parquet field id on a rename/drop-evolved table (fileFieldOf).
    val dataBinds: Array[(org.apache.spark.sql.types.StructField, org.apache.parquet.schema.Type)] =
      required.fields.flatMap(f => fileFieldOf(fileMsg, f.name).map(t => (f, t)))
    // v3 lineage fill lists for THIS file: physical presence wins (a
    // rewrite materialized the column into the data); otherwise the
    // implicit value fills per-row below
    rowIdFill =
      if (fileFieldOf(fileMsg, "_row_id").isDefined) Array.empty else rowIdOrds
    lastSeqFill =
      if (fileFieldOf(fileMsg, "_last_updated_sequence_number").isDefined) Array.empty
      else lastSeqOrds

    // equality-delete key columns the file physically holds beyond the
    // required projection — decoded alongside (never emitted) so delete
    // keys compare against real row values
    val eqExtraBinds: Array[(String, org.apache.parquet.schema.Type)] =
      eqApplicable.flatMap(_.keyCols).distinct
        .filter(c => !dataBinds.exists(_._1.name == c))
        .flatMap(c => fileFieldOf(fileMsg, c).map(t => (c, t))).toArray

    eqChecks = null
    if (dataBinds.isEmpty && eqExtraBinds.isEmpty) {
      // no column decodes at all: any applicable equality delete keys on
      // per-file CONSTANTS (partition value / evolved-in null) — one
      // membership test decides the whole file
      val allDeleted = eqApplicable.exists { d =>
        loadEqKeys(d).contains(d.keyCols.map(fillConst).toList)
      }
      if (allDeleted) { reader = null; constRow = null; synthActive = false; return true }
    }

    if (dataBinds.isEmpty && eqExtraBinds.isEmpty) {
      // nothing to decode from the row groups: row count from the range
      // (or the footer for a whole file); plain constants when positions
      // are irrelevant, position iteration when metadata columns are
      // requested or deletes must be applied
      val n = if (curRange != null) curRange.rows else {
        val fr2 = ParquetFileReader.open(inFile)
        try fr2.getRecordCount finally fr2.close()
      }
      reader = null
      if (!hasMeta && delSet == null) {
        constRow = new GenericInternalRow(required.fields.map(f => fillConst(f.name)): Array[Any])
        constRemaining = n
        synthActive = false
      } else {
        constRow = null
        synthActive = true
        synthTotal = curPos + n
        synthBase = required.fields.map(f => fillConst(f.name): Any)
      }
      true
    } else {
      // projection in FILE terms (an evolved table's file may carry a
      // pre-rename name for a required column); posOf keys stay TABLE
      // names, positions index the projection
      val projFields = dataBinds.map { case (f, t) => (f.name, t) } ++ eqExtraBinds
      val projNames = projFields.map(_._1)
      val projection = new MessageType("spark_schema", projFields.map(_._2): _*)
      val c = new Configuration(conf)
      c.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
      val b = ParquetReader.builder(new GroupReadSupport(), path).withConf(c)
      reader = (if (range != null) b.withFileRange(range.start, range.end) else b).build()
      val posOf = projNames.zipWithIndex.toMap
      if (eqApplicable.nonEmpty) {
        eqChecks = eqApplicable.map { d =>
          val keys = loadEqKeys(d)
          val fns: Seq[Group => Any] = d.keyCols.map { kc =>
            posOf.get(kc) match {
              case Some(i) =>
                val dt = tableSchema.fields.find(_.name == kc).get.dataType
                IceLiteConverters.fieldReader(projection.getType(i).asPrimitiveType(), dt, i)
              case None =>
                val const = fillConst(kc)
                (_: Group) => const
            }
          }
          (g: Group) => keys.contains(fns.map(_(g)).toList)
        }.toArray
      }
      val relU  = curRelUtf8
      rowFns = required.fields.map { f =>
        posOf.get(f.name) match {
          case Some(i) =>
            val fn = IceLiteConverters.fieldReader(
              projection.getType(i).asPrimitiveType(), f.dataType, i)
            (g: Group) => fn(g)
          case None if f.name == "_file" && isMetaName("_file") =>
            (_: Group) => relU
          case None if f.name == "_pos" && isMetaName("_pos") =>
            null // filled per-row from the position counter
          case None if f.name == "_row_id" && isMetaName("_row_id") =>
            null // filled per-row: curFirstRowId + pos (null when unassigned)
          case None if f.name == "_last_updated_sequence_number" &&
              isMetaName("_last_updated_sequence_number") =>
            null // filled per-row from the file's data sequence number
          case None =>
            val const = fillConst(f.name) // partition/default, or evolved-in null
            (_: Group) => const
        }
      }
      constRow = null
      synthActive = false
      true
    }
  }

  override def next(): Boolean = {
    if (limit.exists(emitted >= _)) return false // pushed partial limit
    while (true) {
      if (constRow != null) {
        if (constRemaining > 0) {
          constRemaining -= 1; current = constRow; emitted += 1; return true
        }
        constRow = null
      } else if (synthActive) {
        while (curPos < synthTotal) {
          val p = curPos; curPos += 1
          if (delSet == null || p > Int.MaxValue.toLong || !delSet.get(p.toInt)) {
            val vals = synthBase.clone()
            fileOrds.foreach(i => vals(i) = curRelUtf8)
            posOrds.foreach(i => vals(i) = p)
            rowIdFill.foreach(i => vals(i) =
              if (curFirstRowId == null) null else curFirstRowId.longValue() + p)
            lastSeqFill.foreach(i => vals(i) = curFileSeqBox)
            current = new GenericInternalRow(vals); emitted += 1; return true
          }
        }
        synthActive = false
      } else if (reader != null) {
        var g = reader.read()
        var emittedOne = false
        while (g != null && !emittedOne) {
          val p = curPos; curPos += 1
          if ((delSet == null || p > Int.MaxValue.toLong || !delSet.get(p.toInt)) &&
              !eqDeleted(g)) {
            val vals: Array[Any] = rowFns.map(fn => if (fn == null) null else fn(g))
            posOrds.foreach(i => vals(i) = p)
            rowIdFill.foreach(i => vals(i) =
              if (curFirstRowId == null) null else curFirstRowId.longValue() + p)
            lastSeqFill.foreach(i => vals(i) = curFileSeqBox)
            current = new GenericInternalRow(vals)
            emitted += 1
            emittedOne = true
          } else g = reader.read()
        }
        if (emittedOne) return true
        reader.close(); reader = null
        // ranged split invariant: the row groups parquet's midpoint filter
        // selected must hold EXACTLY the rows the planner counted from the
        // footer — otherwise `_pos` drifts file-globally and position
        // deletes would hit the wrong rows. Fail loudly, never silently.
        if (curRange != null)
          require(curPos - curRange.startRow == curRange.rows,
            s"ranged split consumed ${curPos - curRange.startRow} rows, " +
              s"planner counted ${curRange.rows} (range $curRange)")
      }
      if (!openNextFile()) return false
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}

object IceLiteConverters {

  private val JulianEpochDay = 2440588L

  /** Group-field reader for primitive `pt` at projection position `pos`,
    * producing the Catalyst value for `sparkType`. Null-safe (repetition
    * count 0 = null). Handles the physical encodings Spark/pyarrow emit
    * for the flat surface: BINARY-UTF8, INT32 (+DATE), INT64 (+TIMESTAMP
    * millis/micros), INT96 timestamps, FLOAT, DOUBLE, BOOLEAN. */
  def fieldReader(pt: PrimitiveType, sparkType: DataType, pos: Int): Group => Any = {
    val read: Group => Any = pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
        sparkType match {
          case StringType => g => UTF8String.fromBytes(g.getBinary(pos, 0).getBytes)
          case _          => g => g.getBinary(pos, 0).getBytes
        }
      case PrimitiveTypeName.INT32 =>
        sparkType match {
          case LongType => g => g.getInteger(pos, 0).toLong
          case _        => g => g.getInteger(pos, 0) // Int: IntegerType + DateType(days)
        }
      case PrimitiveTypeName.INT64 =>
        val scale = pt.getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation
              if t.getUnit == LogicalTypeAnnotationUnit.MILLIS => 1000L
          case _ => 1L
        }
        if (scale == 1L) g => g.getLong(pos, 0) else g => g.getLong(pos, 0) * scale
      case PrimitiveTypeName.INT96 => // legacy spark timestamps: (nanos LE, julian day LE)
        g => {
          val b  = g.getInt96(pos, 0).getBytes
          val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val nanos = bb.getLong
          val jday  = bb.getInt
          (jday - JulianEpochDay) * 86400000000L + nanos / 1000L
        }
      case PrimitiveTypeName.FLOAT =>
        sparkType match {
          case DoubleType => g => g.getFloat(pos, 0).toDouble
          case _          => g => g.getFloat(pos, 0)
        }
      case PrimitiveTypeName.DOUBLE  => g => g.getDouble(pos, 0)
      case PrimitiveTypeName.BOOLEAN => g => g.getBoolean(pos, 0)
    }
    g => if (g.getFieldRepetitionCount(pos) == 0) null else read(g)
  }

  // tiny indirection: LogicalTypeAnnotation.TimeUnit nested-enum import alias
  private object LogicalTypeAnnotationUnit {
    val MILLIS = org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MILLIS
  }
}
