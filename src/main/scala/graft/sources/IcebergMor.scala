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
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Or, StringStartsWith}
import org.apache.spark.sql.types.{BooleanType, DateType, IntegerType, LongType, StringType, StructType}
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
  * spec histories; delta files carry no partition values, so on a
  * partitioned table they commit under an auxiliary UNPARTITIONED spec
  * entry — [[IcebergFormat.Writer.commitDelta]] — which conforming
  * external engines treat as global/unpruned rather than mispruning a
  * null tuple against the partitioned spec).
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
  // stage-1: ONE metadata-JSON read — schema + identity axes; the full
  // manifest walk is deferred until a scan (which prunes whole manifests
  // by the pushed filters) or a DML op (which needs every file) forces it
  private val header = IcebergFormat.planHeader(spark, metaPath)
  private[sources] lazy val tablePlan = IcebergFormat.plan(spark, metaPath)

  override def name(): String = s"iceberg.$location"
  // read-time nullable coercion, same reasoning as IceLiteV2Table; a
  // rename/drop-evolved table (graft.read-by-id) carries its field ids so
  // the reader binds file columns by id rather than name
  override def schema(): StructType = {
    val base =
      if (header.readById)
        IcebergFormat.withParquetFieldIds(header.schema, header.fieldIds, header.nestedIds)
      else header.schema
    // v3 default values ride StructField metadata so the partition reader
    // can substitute `initial-default` when a file physically lacks the
    // column (presence decides null-vs-default)
    val withDefaults =
      if (header.defaults.isEmpty) base.fields
      else base.fields.zipWithIndex.map { case (f, i) =>
        header.defaults.get(header.fieldIds(i)) match {
          case Some(json) => f.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder().withMetadata(f.metadata)
              .putString("graft.initial-default", json).build())
          case None => f
        }
      }
    StructType(withDefaults.map(_.copy(nullable = true)))
  }
  override def partitioning(): Array[Transform] = Array.empty
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(IceLiteMetaColumn("_file", StringType), IceLiteMetaColumn("_pos", LongType),
      // v3 row lineage: implicit (first_row_id + pos / file seq) unless a
      // rewrite materialized the columns physically — physical wins
      IceLiteMetaColumn("_row_id", LongType),
      IceLiteMetaColumn("_last_updated_sequence_number", LongType))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IcebergMorScanBuilder(schema(), header,
      keep => IcebergFormat.plan(spark, metaPath, keepManifest = keep))

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
    header: IcebergFormat.PlanHeader,
    loadPlan: (IcebergFormat.ManifestHandle => Boolean) => IcebergFormat.TablePlan)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  /** Pre-planned compatibility entry (the row-level-operation scan, which
    * needs every file anyway): no manifest-list pruning, same behavior as
    * handing the full plan directly. */
  def this(tableSchema: StructType, p: IcebergFormat.TablePlan) =
    this(tableSchema, IcebergFormat.PlanHeader(p.schema, p.fieldIds, Map.empty), _ => p)

  // filter translation needs only schema + field ids — no files
  private val predPlan =
    IcebergFormat.TablePlan(header.schema, header.fieldIds, Nil, Nil)

  // the unpruned plan, materialized at most once (count pushdown checks
  // and unfiltered scans share it)
  private lazy val fullPlan = loadPlan(_ => true)

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false
  private var limit: Option[Int] = None

  /** Partial limit pushdown: readers stop emitting after `n`
    * delete-applied rows per partition; returning false keeps Spark's own
    * global LIMIT above (same contract as the IceLite scan). */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); false }

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Accept filters translatable to FILE-granular pruning predicates
    * (comparisons, IN-lists, string prefixes, AND/OR compositions);
    * everything is returned as residual (manifest ranges skip what can't
    * match, Spark re-checks what might). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => IcebergMorScan.filePredicate(predPlan, f).isDefined)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** Metadata-only COUNT(*): the sum of the manifests' required
    * `record_count`s — zero data IO at ANY table size. Sound only when no
    * row-level delete is live (physical counts would over-count) and
    * every file records a positive count; filtered counts never push
    * (bounds can't prove row predicates). Same interlocks as the IceLite
    * scan's ic52 path. */
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    countPushed = pushed.isEmpty &&
      aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions.head
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar] && {
        val p = fullPlan
        p.deletes.isEmpty && p.files.forall(_.rowCount > 0)
      }
    countPushed
  }

  /** Materialize the plan NOW, with manifest-LIST pruning: a data manifest
    * is read only if every pushed filter's summary predicate says its
    * partition summaries (field 507) can match — planning IO on a
    * selective query is O(surviving manifests). */
  override def build(): Scan = {
    if (countPushed) return new IcebergMorCountScan(fullPlan.files.map(_.rowCount).sum)
    val keeps = pushed.flatMap(IcebergMorScan.manifestPredicate(header, _))
    new IcebergMorScan(required, tableSchema,
      if (keeps.isEmpty) fullPlan else loadPlan(mh => keeps.forall(_(mh))), pushed, limit)
  }
}

/** Metadata-only COUNT(*) over a standard-format table: one row from the
  * manifests' record_count sums, no data file opened (mirrors
  * [[IceLiteCountScan]]; the builder's interlocks guarantee no live
  * deletes and full counts). */
final class IcebergMorCountScan(rows: Long) extends Scan with Batch {
  override def readSchema(): StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("count(*)", LongType, nullable = false)))
  override def description(): String =
    s"iceberg metadata-only count rows=$rows (no data files read)"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(IceLiteCountPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
        new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean = if (done) false else { done = true; true }
          override def get(): InternalRow =
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](p.asInstanceOf[IceLiteCountPartition].rows))
          override def close(): Unit = ()
        }
    }
}

object IcebergMorScan {
  /** Stringify a pushed literal for the format layer's pruning compares.
    * Instants (java.sql.Timestamp / java.time.Instant) normalize to UTC
    * ISO — NEVER toString, which renders in session time and could skew a
    * partition boundary; everything else's toString is already canonical
    * (java.sql.Date is ISO, numerics are plain). */
  private[graft] def litStr(v: Any): String = v match {
    case ts: java.sql.Timestamp =>
      java.time.LocalDateTime.ofInstant(ts.toInstant, java.time.ZoneOffset.UTC).toString
    case i: java.time.Instant =>
      java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC).toString
    case other => other.toString
  }

  /** The [column, lower, upper] range a pushable comparison implies, or
    * None when the filter isn't a single-column comparison. */
  private[graft] def pruningRange(f: Filter): Option[(String, Option[String], Option[String])] =
    f match {
      case EqualTo(c, v) if isLit(v)            => Some((c, Some(litStr(v)), Some(litStr(v))))
      case GreaterThan(c, v) if isLit(v)        => Some((c, Some(litStr(v)), None))
      case GreaterThanOrEqual(c, v) if isLit(v) => Some((c, Some(litStr(v)), None))
      case LessThan(c, v) if isLit(v)           => Some((c, None, Some(litStr(v))))
      case LessThanOrEqual(c, v) if isLit(v)    => Some((c, None, Some(litStr(v))))
      case _                                    => None
    }

  /** Translate a pushed filter to a per-file pruning predicate over the
    * plan's manifest evidence, or None when the filter can't prune at
    * file granularity (it then stays residual-only). Beyond single
    * comparisons: IN-lists (union of point ranges — a file survives if
    * ANY value can match), string prefixes (a prefix is a range on string
    * bounds: [prefix, successor(prefix)]), and AND/OR composition. All
    * translations are conservative — a file is only dropped when the
    * evidence PROVES no row can match. */
  private[graft] def filePredicate(
      p: IcebergFormat.TablePlan, f: Filter): Option[IcebergFormat.PlannedFile => Boolean] = {
    def known(c: String) = p.schema.fieldNames.contains(c)
    f match {
      case In(c, vs) if known(c) =>
        // ALL elements must be pushable literals: a non-pushable member
        // (NaN/Infinity — excluded from parquet/Iceberg bounds) could match
        // rows in a file whose bounds reject every pushable member, so
        // pruning on the literal subset would drop live rows.
        if (!vs.forall(isLit)) None
        else {
          val lits = vs.map(litStr)
          if (lits.isEmpty) None
          else Some(pf => lits.exists(v => IcebergFormat.fileCanMatch(p, pf, c, Some(v), Some(v))))
        }
      case StringStartsWith(c, prefix) if known(c) && prefix != null && prefix.nonEmpty =>
        val hi = prefixSuccessor(prefix)
        Some(pf => IcebergFormat.fileCanMatch(p, pf, c, Some(prefix), hi))
      case IsNull(c) if known(c) =>
        // droppable only when the manifest RECORDS zero nulls for the file
        val fid = p.fieldIds(p.schema.fieldNames.indexOf(c))
        Some(pf => pf.nullCounts.get(fid).forall(_ > 0))
      case IsNotNull(c) if known(c) =>
        // droppable only when every recorded row is null
        val fid = p.fieldIds(p.schema.fieldNames.indexOf(c))
        Some(pf => !pf.nullCounts.get(fid).exists(n => pf.rowCount > 0 && n >= pf.rowCount))
      case And(l, r) =>
        (filePredicate(p, l), filePredicate(p, r)) match {
          case (Some(a), Some(b)) => Some(pf => a(pf) && b(pf))
          case (Some(a), None)    => Some(a)
          case (None, Some(b))    => Some(b)
          case _                  => None
        }
      case Or(l, r) => // both sides must prune, else the disjunction can't
        for { a <- filePredicate(p, l); b <- filePredicate(p, r) }
          yield (pf: IcebergFormat.PlannedFile) => a(pf) || b(pf)
      case other =>
        pruningRange(other).filter { case (c, _, _) => known(c) }.map {
          case (c, lo, hi) => (pf: IcebergFormat.PlannedFile) =>
            IcebergFormat.fileCanMatch(p, pf, c, lo, hi)
        }
    }
  }

  private val TruncateTr = raw"truncate\[(\d+)\]".r
  private val BucketTr   = raw"bucket\[(\d+)\]".r

  /** Translate a pushed filter to a MANIFEST-granular keep predicate over
    * the manifest list's partition summaries (spec field 507), or None
    * when it can't prune at that granularity. A manifest is dropped only
    * when a summary for a partition axis of the filter column PROVES no
    * file inside can match: identity axes test value-bound overlap,
    * order-preserving transforms (year/month/day/hour, truncate[W]) test
    * overlap in transformed space, bucket axes test point lookups against
    * the bucket-id bounds, IS NULL tests `contains_null`. Manifests
    * without summaries, unresolvable axes, and undecodable bounds always
    * survive — the file-level predicates re-check everything read. */
  private[graft] def manifestPredicate(
      h: IcebergFormat.PlanHeader, f: Filter): Option[IcebergFormat.ManifestHandle => Boolean] = {
    def known(c: String) = h.schema.fieldNames.contains(c)
    def dtOf(c: String) = h.schema.fields(h.schema.fieldNames.indexOf(c)).dataType
    // the (transform, summary) axes covering column c under mh's spec
    def axesOf(mh: IcebergFormat.ManifestHandle, c: String): Seq[(String, IcebergFormat.FieldSummary)] =
      (for {
        ss <- mh.summaries.toSeq
        ax <- h.axes.get(mh.specId).toSeq
        (`c`, pos, tr) <- ax
        s <- ss.lift(pos).toSeq
      } yield (tr, s))
    def cmpIdentity(c: String)(a: Any, b: String): Int = dtOf(c) match {
      case org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType =>
        java.lang.Double.compare(
          java.lang.Double.parseDouble(a.toString), java.lang.Double.parseDouble(b))
      case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        BigDecimal(a.toString).compare(BigDecimal(b))
      case org.apache.spark.sql.types.DateType =>
        // decoded bounds are epoch-day ints, literals ISO strings;
        // unparseable reads as EQUAL (manifest kept)
        (IcebergFormat.epochDay(a.toString), IcebergFormat.epochDay(b)) match {
          case (Some(x), Some(y)) => java.lang.Long.compare(x, y)
          case _                  => 0
        }
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType =>
        // decoded bounds are epoch-micros longs, literals UTC ISO strings
        (IcebergFormat.epochMicros(a.toString), IcebergFormat.epochMicros(b)) match {
          case (Some(x), Some(y)) => java.lang.Long.compare(x, y)
          case _                  => 0
        }
      case _ => a.toString.compareTo(b)
    }
    // transformed-space compare (ints from temporal/bucket, source-typed
    // truncate); incomparable pairs read as overlap (keep)
    def cmpT(a: Any, b: Any): Option[Int] = (a, b) match {
      case (x: String, y: String) => Some(x.compareTo(y))
      case (x: Number, y: Number) => Some(java.lang.Long.compare(x.longValue, y.longValue))
      case _                      => None
    }
    /** Can the axis's summary overlap the SOURCE-value range [lo, hi]? */
    def axisOverlap(c: String, tr: String, s: IcebergFormat.FieldSummary,
        lo: Option[String], hi: Option[String]): Boolean = {
      val dt = dtOf(c)
      tr match {
        case "identity" =>
          (s.lower.flatMap(IcebergFormat.decodeBound(dt, _)),
            s.upper.flatMap(IcebergFormat.decodeBound(dt, _))) match {
            case (Some(mn), Some(mx)) =>
              lo.forall(l => cmpIdentity(c)(mx, l) >= 0) &&
                hi.forall(u => cmpIdentity(c)(mn, u) <= 0)
            case _ => true
          }
        case "year" | "month" | "day" | "hour" | TruncateTr(_) =>
          // order-preserving: overlap holds in transformed space
          val boundDt = tr match {
            case TruncateTr(_) => dt
            case _             => org.apache.spark.sql.types.IntegerType
          }
          (s.lower.flatMap(IcebergFormat.decodeBound(boundDt, _)),
            s.upper.flatMap(IcebergFormat.decodeBound(boundDt, _))) match {
            case (Some(mn), Some(mx)) =>
              lo.flatMap(IcebergFormat.applyTransform(tr, dt, _))
                .flatMap(t => cmpT(mx, t)).forall(_ >= 0) &&
              hi.flatMap(IcebergFormat.applyTransform(tr, dt, _))
                .flatMap(t => cmpT(mn, t)).forall(_ <= 0)
            case _ => true
          }
        case BucketTr(nS) if lo.nonEmpty && lo == hi =>
          // bucket prunes POINT lookups: the literal's bucket id must sit
          // inside the summary's bucket-id bounds
          (IcebergFormat.bucketOf(dt, lo.get, nS.toInt),
            s.lower.flatMap(IcebergFormat.decodeBound(
              org.apache.spark.sql.types.IntegerType, _)),
            s.upper.flatMap(IcebergFormat.decodeBound(
              org.apache.spark.sql.types.IntegerType, _))) match {
            case (Some(bk), Some(mn: Int), Some(mx: Int)) => bk >= mn && bk <= mx
            case _ => true
          }
        case _ => true // unknown/unusable transform -> keep
      }
    }
    // a manifest survives only if EVERY axis of the column says "possible"
    def rangeKeep(c: String, lo: Option[String], hi: Option[String]) =
      (mh: IcebergFormat.ManifestHandle) =>
        axesOf(mh, c).forall { case (tr, s) => axisOverlap(c, tr, s, lo, hi) }
    f match {
      case In(c, vs) if known(c) =>
        // same all-or-nothing rule as filePredicate: a non-pushable member
        // (NaN/Infinity) may live in a manifest whose summaries reject every
        // pushable member — pruning on the subset would be unsound.
        if (!vs.forall(isLit)) None
        else {
          val lits = vs.map(litStr)
          if (lits.isEmpty) None
          else Some(mh => lits.exists(v => rangeKeep(c, Some(v), Some(v))(mh)))
        }
      case StringStartsWith(c, prefix) if known(c) && prefix != null && prefix.nonEmpty =>
        Some(rangeKeep(c, Some(prefix), prefixSuccessor(prefix)))
      case IsNull(c) if known(c) =>
        // droppable when any summary PROVES no file has a null value
        // (transforms of null are null, so every axis witnesses nulls)
        Some(mh => axesOf(mh, c).forall(_._2.containsNull))
      case And(l, r) =>
        (manifestPredicate(h, l), manifestPredicate(h, r)) match {
          case (Some(a), Some(b)) => Some(mh => a(mh) && b(mh))
          case (Some(a), None)    => Some(a)
          case (None, Some(b))    => Some(b)
          case _                  => None
        }
      case Or(l, r) =>
        for { a <- manifestPredicate(h, l); b <- manifestPredicate(h, r) }
          yield (mh: IcebergFormat.ManifestHandle) => a(mh) || b(mh)
      case other =>
        pruningRange(other).filter { case (c, _, _) => known(c) }.map {
          case (c, lo, hi) => rangeKeep(c, lo, hi)
        }
    }
  }

  /** Smallest string no `prefix`-prefixed string can reach: increment the
    * last non-U+FFFF char, dropping the tail (None for all-U+FFFF — no
    * finite upper bound exists). Inclusive use stays conservative. */
  private[graft] def prefixSuccessor(prefix: String): Option[String] = {
    val trimmed = prefix.reverse.dropWhile(_ == '\uffff').reverse
    if (trimmed.isEmpty) None
    else Some(trimmed.init + (trimmed.last + 1).toChar)
  }

  private def isLit(v: Any): Boolean = v match {
    case null => false
    // non-finite float literals don't push: writers exclude NaN from
    // min/max stats, so bounds can't prune them soundly
    case d: java.lang.Double => !d.isNaN && !d.isInfinite
    case fl: java.lang.Float => !fl.isNaN && !fl.isInfinite
    case _: String | _: java.lang.Integer | _: java.lang.Long |
        _: java.lang.Short | _: java.lang.Byte | _: java.lang.Boolean => true
    // DATE literals push (toString is ISO yyyy-MM-dd; DateType has no
    // timezone, so epoch-day comparison is exact). TIMESTAMP literals
    // push through litStr's INSTANT normalization to UTC ISO — never
    // toString, which renders in session time and could skew a partition
    // boundary. LocalDateTime covers TimestampNTZ (wall time, no zone).
    case _: java.sql.Date | _: java.time.LocalDate => true
    case _: java.sql.Timestamp | _: java.time.Instant | _: java.time.LocalDateTime => true
    case _ => false
  }

  /** Default ranged-split target (bytes): matches Spark's own
    * `files.maxPartitionBytes` default so one oversized file fans out to
    * ~128 MB tasks instead of serializing on a single reader. */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  /** Ranged partitions for one file from RECORDED split offsets (the
    * zero-planning-IO path, shared by the standard-format and IceLite V2
    * scans): per-block byte weight = distance to the next offset (file
    * tail for the last), greedy ~target chunks over those weights.
    * `startRow`/`rows` stay -1 sentinels the READER resolves from the
    * footer it opens anyway. None when the offsets don't justify >= 2
    * chunks. */
  private[graft] def rangedFromOffsets(
      path: String, sizeBytes: Long, offs: Seq[Long],
      target: Long, key: InternalRow, seq: Long,
      firstRowId: Option[Long] = None): Option[Seq[InputPartition]] = {
    if (offs.size < 2) return None
    val sizes = offs.indices.map(i =>
      (if (i == offs.size - 1) sizeBytes else offs(i + 1)) - offs(i))
    val chunkStarts = scala.collection.mutable.ArrayBuffer(0) // indices into offs
    var accB = sizes.head
    (1 until offs.size).foreach { i =>
      if (accB + sizes(i) > target) { chunkStarts += i; accB = sizes(i) }
      else accB += sizes(i)
    }
    if (chunkStarts.size < 2) return None
    Some(chunkStarts.toSeq.zipWithIndex.map { case (ci, i) =>
      val start = if (i == 0) 0L else offs(ci)
      val end   = if (i == chunkStarts.size - 1) Long.MaxValue
                  else offs(chunkStarts(i + 1))
      IceLitePartition(Array(path), key,
        ranges = Seq(IceLiteFileRange(start, end, -1L, -1L)),
        seqs = Seq(seq), firstRowIds = Seq(firstRowId)): InputPartition
    })
  }

  /** Partition(s) for one planned file: whole-file normally; files at
    * least 2× the split target (by manifest `sizeBytes`) split into
    * row-group-aligned byte ranges. The ZERO-IO path uses the manifest's
    * `split_offsets` (recorded at write time, the spec's field 132) to
    * chunk by row-group starts, leaving `startRow`/`rows` as -1 sentinels
    * the READER resolves from the footer it opens anyway — planning never
    * touches the file. Only externally-written files without recorded
    * offsets fall back to one driver-side footer read (counter-gated),
    * whose exact block row counts fill the range eagerly. Either way each
    * range's rows exactly match the row groups parquet's midpoint filter
    * selects for [start, end) and `_pos` stays file-global
    * (position-delete application is split-invariant). Cost note: each
    * split re-opens the delete files covering the file (bitmaps are
    * per-task); acceptable because covering deletes are range-pruned and
    * a delete's blast radius is small next to an oversized data file. */
  private[graft] def partitionsFor(
      f: IcebergFormat.PlannedFile, conf: Configuration, target: Long,
      key: InternalRow = null): Seq[InputPartition] = {
    val path = f.path.toString
    def whole = Seq(IceLitePartition(Array(path), key, seqs = Seq(f.seq),
      firstRowIds = Seq(f.firstRowId)): InputPartition)
    if (target <= 0 || f.sizeBytes < 2 * target) return whole
    if (f.splitOffsets.size >= 2)
      return rangedFromOffsets(path, f.sizeBytes, f.splitOffsets, target, key, f.seq,
        f.firstRowId).getOrElse(whole)
    IceLiteSource.planningFootersOpened.increment()
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
        ranges = Seq(IceLiteFileRange(start, end, startRow, rows)),
        seqs = Seq(f.seq), firstRowIds = Seq(f.firstRowId)): InputPartition
      startRow += rows
      part
    }.toSeq
  }
}

final class IcebergMorScan(
    required: StructType,
    tableSchema: StructType,
    p: IcebergFormat.TablePlan,
    pushed: Array[Filter],
    limit: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  // position deletes name files by path, so (unlike equality deletes)
  // sequence-number filtering is redundant under never-reused paths — a
  // bitmap simply has no bits for files the delete never named. The
  // manifest's file_path [min, max] rides along so the reader opens a
  // delete file only for data files inside its range.
  private val deleteFiles: Seq[PositionDeleteFile] =
    p.deletes.filter(_.content == 1).map { d =>
      d.dvRef match {
        // v3 deletion vector: exact-file application via the blob range
        case Some(ref) => PositionDeleteFile(d.path.toString, None, None,
          Some((d.dvOffset, d.dvSize, ref)))
        case None =>
          PositionDeleteFile(d.path.toString, d.pathBounds.map(_._1), d.pathBounds.map(_._2))
      }
    }

  // equality deletes (content 2 — the shape CDC writers like Flink emit)
  // apply reader-side per data file, gated by the spec's strictly-older
  // sequence rule; `equality_ids` resolve to column names HERE, where the
  // field-id table lives, so executors stay id-free
  private val eqDeleteFiles: Seq[EqualityDeleteFile] = {
    val idToName = p.fieldIds.zip(p.schema.fieldNames).toMap
    p.deletes.filter(_.content == 2).map { d =>
      require(d.equalityIds.nonEmpty, "equality delete file without equality_ids")
      EqualityDeleteFile(d.path.toString, d.seq,
        d.equalityIds.map(id => idToName.getOrElse(id,
          throw new NoSuchElementException(s"equality_id $id not in schema"))))
    }
  }

  // manifest-level file skipping: a file survives only if EVERY pushed
  // filter's pruning predicate can match its recorded bounds / partition
  // values (conjunction semantics; a file with no evidence is kept)
  private val filePreds = pushed.flatMap(IcebergMorScan.filePredicate(p, _))
  private[graft] val survivors: Seq[IcebergFormat.PlannedFile] =
    p.files.filter(f => filePreds.forall(_(f)))

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

  // ------------------------------------------------ runtime (join) pruning
  // (SupportsRuntimeFiltering): at execution Spark hands back In/EqualTo
  // filters on identity-partition columns derived from the OTHER join
  // side's actual keys — DPP over standard-format manifest metadata.
  // Values normalize like pushed literals (dates → epoch days,
  // timestamps → micros) to match the stored partition encodings.
  @volatile private var runtimeKept: Map[String, Set[String]] = Map.empty

  override def filterAttributes(): Array[NamedReference] =
    partCols.map(c => Expressions.column(c))

  override def filter(filters: Array[Filter]): Unit = {
    def norm(c: String, v: Any): String = {
      val s  = IcebergMorScan.litStr(v)
      val dt = p.schema.fields(p.schema.fieldNames.indexOf(c)).dataType
      dt match {
        case org.apache.spark.sql.types.DateType =>
          IcebergFormat.epochDay(s).map(_.toString).getOrElse(s)
        case org.apache.spark.sql.types.TimestampType |
            org.apache.spark.sql.types.TimestampNTZType =>
          IcebergFormat.epochMicros(s).map(_.toString).getOrElse(s)
        case _ => s
      }
    }
    val kept = filters.flatMap {
      case In(c, vs) if partCols.contains(c) =>
        Some(c -> vs.filter(_ != null).map(norm(c, _)).toSet)
      case EqualTo(c, v) if partCols.contains(c) && v != null =>
        Some(c -> Set(norm(c, v)))
      case _ => None
    }.toMap
    if (kept.nonEmpty) runtimeKept = kept
  }

  private def runtimeHit(f: IcebergFormat.PlannedFile): Boolean =
    runtimeKept.forall { case (c, keep) =>
      val fid = p.fieldIds(p.schema.fieldNames.indexOf(c))
      // a file without a recorded value for the column stays (conservative)
      f.partition.get(fid).forall(v => keep.contains(v.toString))
    }

  @volatile private var partitionsComputed: Option[Int] = None
  // memoized per runtime-filter map: Spark consults partitions several
  // times, and filter() arrives (at most once) before planInputPartitions
  @volatile private var partitionsCache: (AnyRef, Array[InputPartition]) = null
  private def partitions: Array[InputPartition] = {
    val rk = runtimeKept
    val c  = partitionsCache
    if (c != null && (c._1 eq rk)) return c._2
    val spark  = SparkSession.active
    val target = spark.conf.get("graft.split.size",
      IcebergMorScan.DefaultSplitBytes.toString).toLong
    val conf = spark.sparkContext.hadoopConfiguration
    val surv = if (rk.isEmpty) survivors else survivors.filter(runtimeHit)
    val ps = surv.flatMap(f =>
      IcebergMorScan.partitionsFor(f, conf, target, keyFor(f))).toArray
    partitionsComputed = Some(ps.length)
    partitionsCache = (rk, ps)
    ps
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = partitions

  /** Manifest-derived estimates for the optimizer: rows = sum of the
    * surviving files' required `record_count` (an over-count while
    * row-level deletes are live — conservative for broadcast decisions),
    * size = rows × a required-column width guess, matching the IceLite
    * scan's formula. Without this every standard-format table planned as
    * "unknown, huge" and a 25-row dimension never broadcast. IO-free:
    * everything comes from the already-planned manifest evidence. */
  override def estimateStatistics(): Statistics = {
    val rows  = survivors.map(_.rowCount).sum
    val known = survivors.isEmpty || survivors.forall(_.rowCount > 0)
    val width = required.fields.map(_.dataType match {
      case StringType => 24L
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.DoubleType |
          org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType => 8L
      case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.DateType |
          org.apache.spark.sql.types.FloatType => 4L
      case org.apache.spark.sql.types.BooleanType => 1L
      case _ => 16L
    }).sum.max(8L)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        if (known) java.util.OptionalLong.of(math.max(rows, 1L) * width)
        else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        if (known) java.util.OptionalLong.of(rows) else java.util.OptionalLong.empty()
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new IceLiteReaderFactory(
      new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration),
      required, partCols, tableSchema, limit, deleteFiles, eqDeleteFiles)
  // IO-free by contract: EXPLAIN must never force `partitions` (ranged
  // splits may open parquet footers); split counts print only if planning
  // already ran
  override def description(): String = {
    val push = if (pushed.isEmpty) "" else s", pushed=[${pushed.mkString(", ")}]"
    val sp = partitionsComputed match {
      case Some(n) if n > survivors.length => s", splits=$n"
      case _                               => ""
    }
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
        // identity default-spec columns the rolling writer can stamp —
        // empty for transform specs, which keep the unpartitioned fallback
        val partCols = IcebergFormat.defaultSpecIdentityCols(
          SparkSession.active, IcebergFormat.currentMetadataPath(SparkSession.active, location))
        new IcebergMorDeltaWrite(location, tableSchema, p, command(), partCols)
      }
    }
}

/** The standard-format WriteDelta write. On an identity-partitioned
  * default spec the insert rows are requested CLUSTERED + SORTED on the
  * partition columns (same contract as the icelite delta write, ic75), so
  * the rolling writer stages one file per touched value per task, each
  * stamped with its REAL partition tuple and committed under the
  * PARTITIONED spec — external engines prune post-DML insert files by
  * partition value instead of treating them as global. Deletes stay on
  * the auxiliary unpartitioned spec (position deletes are global). */
final class IcebergMorDeltaWrite(
    location: String,
    tableSchema: StructType,
    p: IcebergFormat.TablePlan,
    command: RowLevelOperation.Command,
    partCols: Seq[(String, String)]) // (spec field name, source column)
    extends DeltaWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{NullOrdering, SortDirection, SortOrder}

  /** DELETE rows carry no data columns (row-id projection only) — a
    * distribution over partition columns would not resolve there. */
  private def wantsClustering =
    partCols.nonEmpty && command != RowLevelOperation.Command.DELETE

  override def requiredDistribution(): Distribution =
    if (!wantsClustering) Distributions.unspecified()
    else Distributions.clustered(partCols.map(c => Expressions.identity(c._2)).toArray)

  override def requiredOrdering(): Array[SortOrder] =
    if (!wantsClustering) Array.empty
    else partCols.map(c => Expressions.sort(
      Expressions.identity(c._2), SortDirection.ASCENDING, NullOrdering.NULLS_FIRST)).toArray

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    private val conf =
      new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration)
    private val tag       = java.util.UUID.randomUUID().toString.take(8)
    private val deleteRel = s"data/deletes-$tag"
    private val dataRel   = s"data/delta-$tag"

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
      new IcebergMorDeltaWriterFactory(conf, location, deleteRel, dataRel, tableSchema,
        p.fieldIds, // insert files stamp the table's REAL field ids
        if (wantsClustering) partCols else Nil,
        p.nestedIds) // tracked nested ids (stable across nested evolution)

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
        def remap[A](byPos: Map[Int, A]): Map[Int, A] = byPos.flatMap { case (id, v) =>
          val idx = id - 1
          if (idx >= 0 && idx < p.fieldIds.length) Some(p.fieldIds(idx) -> v)
          else None
        }
        IcebergFormat.DataFileInfo(m.absPath, m.rows, m.sizeBytes,
          bounds = remap(m.bounds), splitOffsets = m.splitOffsets,
          nullCounts = remap(m.nullCounts), partitionValues = m.partitionValues)
      }
      if (delInfos.isEmpty && dataInfos.isEmpty) return // nothing matched: no snapshot
      val w = IcebergFormat.resumeWriter(s, location)
      if (wantsClustering)
        // partition-stamped inserts under the DEFAULT spec (prunable by
        // every engine); deletes under the auxiliary unpartitioned spec
        w.commitRowDelta(dataInfos, delInfos)
      else
        // no stampable spec → everything routes unpartitioned (global)
        w.commitDelta(dataInfos ++ delInfos)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(location).getFileSystem(conf.value)
      fs.delete(new Path(location, deleteRel), true)
      fs.delete(new Path(location, dataRel), true)
      ()
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
    schema: StructType,
    fieldIds: Seq[Int] = Nil,
    partCols: Seq[(String, String)] = Nil, // (spec field name, source column)
    nestedIds: Map[String, Int] = Map.empty)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new IcebergMorDeltaWriter(conf, location, deleteRel, dataRel, schema, partitionId, taskId,
      fieldIds, partCols, nestedIds)
}

/** Executor-side delta writer: streams `(_file, _pos)` row ids into one
  * position-delete parquet per task (spec content-1 shape: `file_path`
  * string + `pos` long, the exact columns [[IcebergFormat.scanFiles]] and
  * DuckDB anti-join on), and UPDATE/MERGE insert rows into v2-layout data
  * parquets via the field-id-preserving [[IcebergNestedDataWriter]]
  * (inline min/max stats → manifest bounds). On an identity-partitioned
  * default spec (`partCols` non-empty; rows arrive CLUSTERED + SORTED on
  * them per RequiresDistributionAndOrdering) the insert path ROLLS one
  * file per partition value per task and stamps the REAL partition tuple
  * on its commit message — the files then commit under the partitioned
  * spec and every conforming engine prunes them. */
final class IcebergMorDeltaWriter(
    conf: SerializableHadoopConf,
    location: String,
    deleteRel: String,
    dataRel: String,
    schema: StructType,
    partitionId: Int,
    taskId: Long,
    fieldIds: Seq[Int] = Nil,
    partCols: Seq[(String, String)] = Nil, // (spec field name, source column)
    nestedIds: Map[String, Int] = Map.empty)
    extends DeltaWriter[InternalRow] {

  private var delWriter: IceLiteDataWriter = _
  private var insWriter: IcebergNestedDataWriter = _
  private val delRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

  private val partIdx: IndexedSeq[Int] = partCols.map(f => schema.fieldIndex(f._2)).toIndexedSeq
  private var curKey: IndexedSeq[Any] = null // boxed identity values (null = SQL NULL)
  private var rollSeq = 0
  private val rolled = scala.collection.mutable.ListBuffer.empty[IcebergWriteMessage]

  /** Boxed identity partition value in the manifest's avro type. */
  private def partValue(i: Int, row: InternalRow): Any = {
    val idx = partIdx(i)
    if (row.isNullAt(idx)) null
    else schema.fields(idx).dataType match {
      case StringType              => row.getUTF8String(idx).toString
      case IntegerType | DateType  => Int.box(row.getInt(idx))
      case LongType                => Long.box(row.getLong(idx))
      case BooleanType             => Boolean.box(row.getBoolean(idx))
      case other => throw new UnsupportedOperationException(
        s"identity partition type $other for ${schema.fields(idx).name}")
    }
  }

  private def rollInsert(): Unit = if (insWriter != null) {
    val m = insWriter.commit().asInstanceOf[IcebergWriteMessage]
    // tuples key by the SPEC FIELD name — buildEntry/summarize look them
    // up there; a field named differently from its source column would
    // otherwise publish a null tuple and external engines would prune
    // away the restated rows
    rolled += m.copy(partitionValues =
      partCols.map(_._1).zip(curKey).filter(_._2 != null).toMap)
    insWriter = null
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (delWriter == null)
      delWriter = new IceLiteDataWriter(conf, location, deleteRel,
        IceTable.PositionDeleteSchema, partitionId, taskId)
    delRow.update(0, id.getUTF8String(0).clone())
    delRow.update(1, id.getLong(1))
    delWriter.write(delRow)
  }

  override def insert(row: InternalRow): Unit = {
    if (partCols.nonEmpty) {
      val key = partIdx.indices.map(i => partValue(i, row))
      if (insWriter == null || key != curKey) {
        rollInsert()
        curKey = key
        insWriter = new IcebergNestedDataWriter(conf, location, dataRel, schema,
          partitionId, taskId, fieldIds, nameSuffix = f"-p$rollSeq%04d",
          nestedIds = nestedIds)
        rollSeq += 1
      }
    } else if (insWriter == null)
      insWriter = new IcebergNestedDataWriter(conf, location, dataRel, schema,
        partitionId, taskId, fieldIds, nestedIds = nestedIds)
    insWriter.write(row)
  }

  /** Never called: representUpdateAsDeleteAndInsert splits updates. */
  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "iceberg-format delta updates are represented as delete+insert")
  override def reinsert(metadata: InternalRow, row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = {
    val inserts =
      if (partCols.nonEmpty) { rollInsert(); rolled.toSeq }
      else Option(insWriter).map(_.commit().asInstanceOf[IcebergWriteMessage]).toSeq
    IcebergMorDeltaMessage(
      Option(delWriter).map(_.commit().asInstanceOf[IceLiteWriteMessage]), inserts)
  }

  override def abort(): Unit = {
    if (delWriter != null) delWriter.abort()
    if (insWriter != null) insWriter.abort()
    // already-rolled per-partition files are committed to disk but not yet
    // to the table — a retried task would otherwise leave them as orphans
    // next to live data (the job-level abort never runs when the retry
    // succeeds); same pattern as IceLitePartitionedWriter.abort
    val fs = new Path(location).getFileSystem(conf.value)
    rolled.foreach(m => fs.delete(new Path(m.absPath), false))
    rolled.clear()
  }
  override def close(): Unit = ()
}
