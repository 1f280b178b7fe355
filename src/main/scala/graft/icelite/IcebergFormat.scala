package graft.icelite

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Read/write support for the STANDARD Apache Iceberg table format (v2),
  * from the public spec at iceberg.apache.org/spec — this is the
  * compatibility bridge the reference's query path uses for real tables
  * (`iceberg_scan('{metadata}')`, `query_iceberg_minio.ipynb:274-277`;
  * PyIceberg `table.scan()`, `query_iceberg.ipynb:210`), implemented
  * natively because no iceberg-spark-runtime jar ships in this image
  * (SURVEY.md §7.1).
  *
  * Reader: `vN.metadata.json` → current snapshot → manifest-list Avro →
  * manifest Avro entries (skipping deleted entries and delete manifests)
  * → parquet file list + schema → one planned Spark scan. Planning cost is
  * O(manifests) on the driver, exactly like Iceberg's own planner; the
  * data read is a normal pushdown-capable parquet scan.
  *
  * Writer: enough of the spec to commit genuine flat-schema tables —
  * per-commit manifest Avro (with spec field-ids in the Avro schema),
  * per-snapshot manifest list, and the metadata JSON with schemas /
  * partition-specs / snapshot log. Used by the ic21 gate to produce a
  * fixture that an independent Iceberg reader could consume.
  */
object IcebergFormat {

  // ------------------------------------------------------------------ schema

  /** Iceberg schema JSON (struct of flat primitives) → Spark StructType. */
  private[graft] def toSparkType(icebergType: String): DataType = icebergType match {
    case "boolean"        => BooleanType
    case "int"            => IntegerType
    case "long"           => LongType
    case "float"          => FloatType
    case "double"         => DoubleType
    case "string"         => StringType
    case "date"           => DateType
    case "timestamp"      => TimestampNTZType
    case "timestamptz"    => TimestampType
    case "binary"         => BinaryType
    case "uuid"           => StringType
    case t if t.startsWith("decimal(") =>
      val Array(p, sc) = t.stripPrefix("decimal(").stripSuffix(")").split(',').map(_.trim.toInt)
      DecimalType(p, sc)
    case t if t.startsWith("fixed[") => BinaryType
    case other =>
      throw new UnsupportedOperationException(s"unknown Iceberg primitive type: $other")
  }

  /** Full Iceberg type JSON → Spark type: primitives are JSON strings,
    * struct/list/map are objects (spec "Schemas and Data Types" JSON
    * serialization). Recursive, so arbitrarily nested compositions —
    * struct-of-list-of-struct etc. — round-trip. Manifest value bounds
    * remain top-level-primitive only (the spec keeps bounds per leaf field;
    * our planner consumes only top-level ids), so nested columns simply
    * never participate in file skipping — conservative, never wrong. */
  private[graft] def jsonToSparkType(j: JValue): DataType = {
    implicit val fmts: Formats = DefaultFormats
    j match {
      case JString(s) => toSparkType(s)
      case o: JObject =>
        (o \ "type") match {
          case JString("struct") =>
            StructType((o \ "fields").extract[List[JObject]].map { f =>
              StructField(
                (f \ "name").extract[String],
                jsonToSparkType(f \ "type"),
                nullable = !(f \ "required").extractOpt[Boolean].getOrElse(false))
            })
          case JString("list") =>
            ArrayType(
              jsonToSparkType(o \ "element"),
              containsNull = !(o \ "element-required").extractOpt[Boolean].getOrElse(false))
          case JString("map") =>
            MapType(
              jsonToSparkType(o \ "key"),
              jsonToSparkType(o \ "value"),
              valueContainsNull = !(o \ "value-required").extractOpt[Boolean].getOrElse(false))
          case other =>
            throw new UnsupportedOperationException(s"unknown Iceberg composite type: $other")
        }
      case other =>
        throw new UnsupportedOperationException(s"unparseable Iceberg type JSON: $other")
    }
  }

  /** Path → field id for every NON-top-level position of `schema`, under
    * the legacy positional rule (nested ids continue after the max top
    * id, pre-order; list element id before its element's nested ids; map
    * key id then value id before either side's). Paths use the column
    * names joined with '.', with `element`/`key`/`value` as the pseudo
    * segments for list/map positions — e.g. `info.status`,
    * `prio_parts.element`, `attrs.key`.
    *
    * This map is the SOURCE OF TRUTH for nested ids on evolved tables:
    * deriving ids positionally at every emission (the pre-r17 behavior)
    * silently RENUMBERS nested fields whenever the schema changes shape —
    * exactly the id instability the spec's rename/drop-by-id contract
    * forbids. Fresh tables derive this map once; every evolution carries
    * it forward, only extending with fresh ids past the historical max. */
  private[graft] def deriveNestedIds(schema: StructType, topIds: Seq[Int]): Map[String, Int] = {
    var last = (topIds ++ Seq(0)).max
    def next() = { last += 1; last }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def walk(prefix: String, dt: DataType): Unit = dt match {
      case st: StructType =>
        st.fields.foreach { f =>
          out(prefix + f.name) = next()
          walk(s"$prefix${f.name}.", f.dataType)
        }
      case at: ArrayType =>
        out(prefix + "element") = next()
        walk(prefix + "element.", at.elementType)
      case mt: MapType =>
        out(prefix + "key") = next()
        out(prefix + "value") = next()
        walk(prefix + "key.", mt.keyType)
        walk(prefix + "value.", mt.valueType)
      case _ => ()
    }
    schema.fields.foreach(f => walk(s"${f.name}.", f.dataType))
    out.toMap
  }

  /** The inverse extraction: path → id from a committed Iceberg schema
    * JSON (ids are explicit there) — what resumeWriter restores so later
    * evolutions never renumber a field another snapshot's files stamp. */
  private[graft] def parseNestedIds(schemaObj: JValue): Map[String, Int] = {
    implicit val fmts: Formats = DefaultFormats
    val out = scala.collection.mutable.Map.empty[String, Int]
    def walkType(prefix: String, t: JValue): Unit = t match {
      case o: JObject =>
        (o \ "type") match {
          case JString("struct") =>
            (o \ "fields").extract[List[JObject]].foreach { f =>
              val name = (f \ "name").extract[String]
              if (prefix.nonEmpty) out(prefix + name) = (f \ "id").extract[Int]
              walkType(s"$prefix$name.", f \ "type")
            }
          case JString("list") =>
            out(prefix + "element") = (o \ "element-id").extract[Int]
            walkType(prefix + "element.", o \ "element")
          case JString("map") =>
            out(prefix + "key") = (o \ "key-id").extract[Int]
            out(prefix + "value") = (o \ "value-id").extract[Int]
            walkType(prefix + "key.", o \ "key")
            walkType(prefix + "value.", o \ "value")
          case _ => ()
        }
      case _ => ()
    }
    walkType("", schemaObj)
    out.toMap
  }

  /** Top-level `initial-default` literals of a committed schema JSON:
    * field id -> raw JSON value (absent fields omitted). */
  private[graft] def parseDefaultsJson(schemaObj: JValue): Map[Int, JValue] = {
    implicit val fmts: Formats = DefaultFormats
    (schemaObj \ "fields") match {
      case JArray(fs) => fs.flatMap { f =>
        (f \ "initial-default") match {
          case JNothing => None
          case v        => Some((f \ "id").extract[Int] -> v)
        }
      }.toMap
      case _ => Map.empty
    }
  }

  private def fromSparkType(dt: DataType): String = dt match {
    case BooleanType        => "boolean"
    case IntegerType        => "int"
    case LongType           => "long"
    case FloatType          => "float"
    case DoubleType         => "double"
    case StringType         => "string"
    case DateType           => "date"
    case TimestampNTZType   => "timestamp"
    case TimestampType      => "timestamptz"
    case BinaryType         => "binary"
    case d: DecimalType     => s"decimal(${d.precision}, ${d.scale})"
    case other =>
      throw new UnsupportedOperationException(s"cannot write Iceberg primitive for: $other")
  }

  /** Spark type → Iceberg type JSON (inverse of [[jsonToSparkType]]):
    * primitives serialize as quoted strings, struct/list/map as spec
    * objects. Nested field/element/key/value ids resolve through the
    * tracked path map (see [[deriveNestedIds]]) so they stay STABLE
    * across schema evolution — a missing path is a bug in the caller's
    * map maintenance and fails loudly rather than inventing an id. */
  private def typeJson(dt: DataType, prefix: String, idOf: String => Int): String = dt match {
    case st: StructType =>
      val fs = st.fields.map { f =>
        s"""{"id":${idOf(prefix + f.name)},"name":"${f.name}","required":${!f.nullable},"type":${typeJson(f.dataType, s"$prefix${f.name}.", idOf)}}"""
      }
      s"""{"type":"struct","fields":[${fs.mkString(",")}]}"""
    case at: ArrayType =>
      s"""{"type":"list","element-id":${idOf(prefix + "element")},"element":${typeJson(at.elementType, prefix + "element.", idOf)},"element-required":${!at.containsNull}}"""
    case mt: MapType =>
      s"""{"type":"map","key-id":${idOf(prefix + "key")},"key":${typeJson(mt.keyType, prefix + "key.", idOf)},"value-id":${idOf(prefix + "value")},"value":${typeJson(mt.valueType, prefix + "value.", idOf)},"value-required":${!mt.valueContainsNull}}"""
    case p => "\"" + fromSparkType(p) + "\""
  }

  /** (Spark schema, per-field Iceberg ids in schema order) — ids come from
    * the spec's "id" attribute, NOT position: an evolved table's ids are
    * sparse, and bounds maps key by id. */
  private def schemaFields(schemaObj: JValue): (StructType, Seq[Int]) = {
    implicit val fmts: Formats = DefaultFormats
    val parsed = (schemaObj \ "fields").extract[List[JObject]].zipWithIndex.map {
      case (f, i) =>
        val name     = (f \ "name").extract[String]
        val required = (f \ "required").extractOpt[Boolean].getOrElse(false)
        val id       = (f \ "id").extractOpt[Int].getOrElse(i + 1)
        val tpe = jsonToSparkType(f \ "type")
        (StructField(name, tpe, nullable = !required), id)
    }
    (StructType(parsed.map(_._1)), parsed.map(_._2))
  }

  // ------------------------------------------------------------------ reader

  /** A planned data file: resolved path + per-field-id [lower, upper]
    * bounds from its manifest entry (Iceberg single-value serialization,
    * absent when the writer recorded none) + its data sequence number
    * (deletes apply only to files at least as old — spec "Scan Planning"). */
  final case class PlannedFile(
      path: Path, bounds: Map[Int, (Array[Byte], Array[Byte])], seq: Long = 0L,
      partition: Map[Int, Any] = Map.empty, // identity values by SOURCE field id
      buckets: Map[Int, (Int, Int)] = Map.empty, // source id -> (bucket value, modulus)
      transforms: Map[Int, (String, Any)] = Map.empty, // source id -> (transform, value)
      sizeBytes: Long = 0L, // manifest file_size_in_bytes (0 when absent)
      rowCount: Long = 0L, // manifest record_count (0 when absent)
      splitOffsets: Seq[Long] = Nil, // manifest split_offsets (row-group starts; may be absent)
      nullCounts: Map[Int, Long] = Map.empty, // manifest null_value_counts by field id
      sortOrderId: Option[Int] = None, // manifest sort_order_id (field 140; None = unsorted)
      firstRowId: Option[Long] = None) // v3 row lineage (field 142; None = unassigned)

  /** A planned row-level delete file (v2): position deletes (content 1,
    * `file_path`/`pos` columns) or equality deletes (content 2, rows of the
    * `equalityIds` columns). `pathBounds` is the manifest's [min, max] of
    * the position-delete `file_path` column (spec field 2147483546) — it
    * bounds which data files the delete can touch, so a reader opens the
    * delete file only for data files inside the range. */
  final case class PlannedDelete(path: Path, seq: Long, content: Int, equalityIds: Seq[Int],
      pathBounds: Option[(String, String)] = None,
      rows: Long = 0L, // manifest record_count: the visible delete debt
      // v3 deletion vector (fields 143-145): when set, `path` is a Puffin
      // file and the delete is a roaring bitmap at [dvOffset, dvOffset +
      // dvSize) applying to exactly `dvRef.get`
      dvRef: Option[String] = None, dvOffset: Long = 0L, dvSize: Long = 0L)

  private[graft] final case class TablePlan(
      schema: StructType, fieldIds: Seq[Int], files: Seq[PlannedFile],
      deletes: Seq[PlannedDelete],
      // table property `graft.read-by-id`: set by a rename/drop column
      // evolution, after which file columns resolve by parquet field id
      // (by-name would miss every pre-rename file's column)
      readById: Boolean = false,
      nestedIds: Map[String, Int] = Map.empty, // path -> id (nested levels)
      // v3 default values: field id -> decoded initial-default, and the
      // schema-era map (file seq -> defaulted fields ABSENT in that era)
      // deciding which files read the default instead of null
      fieldDefaults: Map[Int, Any] = Map.empty,
      absentBySeq: Map[Long, Set[Int]] = Map.empty)

  /** One partition field's summary from a manifest-LIST entry (spec field
    * 507 `partitions`, ordered like the manifest's spec fields): whether
    * any file in the manifest has a null partition value, and the
    * single-value-serialized [lower, upper] of the non-null values. The
    * evidence that lets a planner skip a whole manifest — thousands of
    * file entries — without reading it. */
  private[graft] final case class FieldSummary(
      containsNull: Boolean, lower: Option[Array[Byte]], upper: Option[Array[Byte]])

  /** A manifest as the manifest LIST describes it — everything known
    * BEFORE the manifest avro is read. `keepManifest` predicates decide
    * from this alone. */
  private[graft] final case class ManifestHandle(
      path: String, seq: Long, specId: Int, content: Int,
      summaries: Option[Seq[FieldSummary]])

  /** Planning metadata that costs ONE metadata-JSON read: the schema, its
    * field ids, and per-spec partition axes — (source column name,
    * position among the spec's fields i.e. the `summaries` index, and the
    * transform) for every partition field whose source column resolves.
    * What a scan needs to translate pushed filters into manifest-level
    * keep predicates before ANY manifest is read. */
  private[graft] final case class PlanHeader(
      schema: StructType, fieldIds: Seq[Int],
      axes: Map[Int, Seq[(String, Int, String)]],
      readById: Boolean = false,
      nestedIds: Map[String, Int] = Map.empty, // path -> id (nested levels)
      defaults: Map[Int, String] = Map.empty) // field id -> initial-default JSON

  /** Manifest avro files read by [[plan]] — the planning-cost observable
    * manifest-list pruning is gated on (MorSpec). */
  private[graft] val manifestReadsAtPlanning = new java.util.concurrent.atomic.LongAdder()

  /** Spec-reserved field ids of the position-delete schema (Iceberg spec
    * "Position Delete Files"): 2147483546 = file_path, 2147483545 = pos. */
  private[graft] val PosDeletePathFieldId = 2147483546
  private[graft] val PosDeletePosFieldId  = 2147483545

  // --------------------------------------- spec 32-bit hash (Appendix B)

  /** Murmur3_x86_32 with seed 0 — the spec's required hash for bucket
    * transforms, implemented from the public algorithm. Pinned in
    * IceLiteSpec against the spec's own test vectors (int/long 34 →
    * 2017239379, string "iceberg" → 1210000089), so bucket ids computed
    * here agree with every conforming Iceberg writer. */
  private[graft] def murmur3(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      var k1 = (data(i * 4) & 0xff) | ((data(i * 4 + 1) & 0xff) << 8) |
        ((data(i * 4 + 2) & 0xff) << 16) | ((data(i * 4 + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    val rem  = data.length & 3
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= (h1 >>> 16); h1 *= 0x85ebca6b
    h1 ^= (h1 >>> 13); h1 *= 0xc2b2ae35
    h1 ^= (h1 >>> 16)
    h1
  }

  /** Spec hash of a value for bucketing: int/long as 8-byte little-endian
    * (ints hash as longs so the transform survives type promotion),
    * strings as UTF-8 bytes. */
  private[graft] def specHashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>= 8; i += 1 }
    murmur3(b)
  }

  private[graft] def specHashString(s: String): Int = murmur3(s.getBytes("UTF-8"))

  /** bucket[n] of a stringified literal for `dt`; None when the type has
    * no spec bucket serialization here (no pruning then). */
  private[graft] def bucketOf(dt: DataType, v: String, n: Int): Option[Int] = {
    val h = dt match {
      case IntegerType | LongType => Some(specHashLong(v.toLong))
      // spec: date/timestamp buckets hash the epoch-day int / epoch-micros
      // long; accept either the number or an ISO literal (what SQL pushes)
      case DateType                         => epochDay(v).map(specHashLong)
      case TimestampType | TimestampNTZType => epochMicros(v).map(specHashLong)
      case StringType             => Some(specHashString(v))
      case _                      => None
    }
    h.map(x => (x & Integer.MAX_VALUE) % n)
  }

  // ----------------------------- temporal + truncate transforms (spec)

  /** Flexible literal parse for temporal transforms: accepts
    * "yyyy-MM-dd[ HH:mm:ss[.fraction]]" (the forms planFiles literals and
    * fixture SQL use); no timezone math — transforms are defined on the
    * stored local value. */
  private def parseTemporal(v: String): Option[java.time.LocalDateTime] = {
    val t = v.trim.replace(' ', 'T')
    try Some(java.time.LocalDateTime.parse(t))
    catch {
      case _: java.time.format.DateTimeParseException =>
        try Some(java.time.LocalDate.parse(v.trim).atStartOfDay())
        catch { case _: java.time.format.DateTimeParseException => None }
    }
  }

  /** Epoch-day of a DATE literal in either surface form: the epoch-day
    * number itself ("9204") or an ISO date / datetime string. None when
    * unparseable — callers keep the file conservatively. */
  private[graft] def epochDay(v: String): Option[Long] = {
    val t = v.trim
    if (t.matches("-?\\d+")) Some(t.toLong)
    else parseTemporal(t).map(_.toLocalDate.toEpochDay)
  }

  /** Epoch-micros of a TIMESTAMP literal in either surface form: the
    * micros number itself or an ISO datetime (interpreted as UTC wall
    * time — the scan layer normalizes instants to UTC ISO before pushing,
    * so this is timezone-exact). None when unparseable. */
  private[graft] def epochMicros(v: String): Option[Long] = {
    val t = v.trim
    if (t.matches("-?\\d+")) Some(t.toLong)
    else parseTemporal(t).map(ldt =>
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
  }

  private val TruncatePat = raw"truncate\[(\d+)\]".r

  /** Apply an ORDER-PRESERVING partition transform (year/month/day/hour —
    * epoch-relative ints per the spec — or truncate[W]) to a stringified
    * literal of type `dt`. None when the literal/type has no defined
    * transform here → the caller must keep the file conservatively.
    * Monotonicity is what makes these range-prunable, unlike bucket. */
  private[graft] def applyTransform(transform: String, dt: DataType, v: String): Option[Any] = {
    def temporal(f: java.time.LocalDateTime => Int): Option[Any] = dt match {
      // DATE also accepts its epoch-day numeric form (what fileCanMatch's
      // date normalization and stored partition values carry)
      case DateType =>
        epochDay(v).map(d => f(java.time.LocalDate.ofEpochDay(d).atStartOfDay()))
      case TimestampType | TimestampNTZType => parseTemporal(v).map(f(_))
      case _                                => None
    }
    transform match {
      case "year"  => temporal(_.getYear - 1970)
      case "month" => temporal(t => (t.getYear - 1970) * 12 + t.getMonthValue - 1)
      case "day"   => temporal(_.toLocalDate.toEpochDay.toInt)
      case "hour"  => temporal(t => (t.toLocalDate.toEpochDay * 24 + t.getHour).toInt)
      case TruncatePat(wS) =>
        val w = wS.toLong
        dt match {
          // spec: v - (((v % W) + W) % W) — floors toward -inf for negatives
          case IntegerType => Some(Int.box((v.toLong - (((v.toLong % w) + w) % w)).toInt))
          case LongType    => Some(Long.box(v.toLong - (((v.toLong % w) + w) % w)))
          case StringType  => Some(v.take(w.toInt))
          case _           => None
        }
      case _ => None
    }
  }

  /** Temporal/truncate fields of partition spec `specId`, as
    * (partition field name, source field id, transform). Spec evolution
    * means manifests written under different specs coexist in one table,
    * so every lookup here is by the spec id recorded in the manifest
    * list — files are pruned by the spec that WROTE them, never the
    * current default. */
  private def transformSpecFields(md: JValue, specId: Int): Seq[(String, Int, String)] = {
    implicit val fmts: Formats = DefaultFormats
    (md \ "partition-specs") match {
      case JArray(specs) =>
        specs.find(sp => (sp \ "spec-id").extractOpt[Int].contains(specId)).toSeq.flatMap { sp =>
          (sp \ "fields").extract[List[JObject]].flatMap { f =>
            (f \ "transform").extractOpt[String] match {
              case Some(t @ ("year" | "month" | "day" | "hour")) =>
                Some(((f \ "name").extract[String], (f \ "source-id").extract[Int], t))
              case Some(t @ TruncatePat(_)) =>
                Some(((f \ "name").extract[String], (f \ "source-id").extract[Int], t))
              case _ => None
            }
          }
        }
      case _ => Nil
    }
  }

  /** Bucket-transform fields of partition spec `specId`, as
    * (partition field name, source field id, modulus). */
  private def bucketSpecFields(md: JValue, specId: Int): Seq[(String, Int, Int)] = {
    implicit val fmts: Formats = DefaultFormats
    val Bucket = raw"bucket\[(\d+)\]".r
    (md \ "partition-specs") match {
      case JArray(specs) =>
        specs.find(sp => (sp \ "spec-id").extractOpt[Int].contains(specId)).toSeq.flatMap { sp =>
          (sp \ "fields").extract[List[JObject]].flatMap { f =>
            (f \ "transform").extractOpt[String] match {
              case Some(Bucket(n)) =>
                Some(((f \ "name").extract[String], (f \ "source-id").extract[Int], n.toInt))
              case _ => None
            }
          }
        }
      case _ => Nil
    }
  }

  /** Identity-transform fields of partition spec `specId`, as
    * (partition field name, source field id). Other transforms are
    * handled separately (bucket) or conservatively ignored (truncate,
    * day, ...): derived values drive neither column reconstruction nor
    * range pruning — those files stay un-pruned. */
  private def identitySpecFields(md: JValue, specId: Int): Seq[(String, Int)] = {
    implicit val fmts: Formats = DefaultFormats
    (md \ "partition-specs") match {
      case JArray(specs) =>
        specs.find(sp => (sp \ "spec-id").extractOpt[Int].contains(specId)).toSeq.flatMap { sp =>
          (sp \ "fields").extract[List[JObject]].collect {
            case f if (f \ "transform").extractOpt[String].contains("identity") =>
              ((f \ "name").extract[String], (f \ "source-id").extract[Int])
          }
        }
      case _ => Nil
    }
  }

  /** Stage-1 planning: ONE metadata-JSON read, no manifest (or even
    * manifest-list) IO. Gives a scan the schema plus the identity
    * partition axes each spec's manifest summaries are ordered by, so
    * pushed filters can become [[ManifestHandle]] keep predicates before
    * [[plan]] touches any manifest. */
  private[graft] def planHeader(spark: SparkSession, metadataPath: String): PlanHeader = {
    implicit val fmts: Formats = DefaultFormats
    val mPath = new Path(metadataPath)
    val fs    = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md    = JsonMethods.parse(readText(fs, mPath))
    val schemaObj = (md \ "schemas") match {
      case JArray(ss) =>
        val cur = (md \ "current-schema-id").extractOpt[Int].getOrElse(0)
        ss.find(s => (s \ "schema-id").extractOpt[Int].contains(cur))
          .orElse(ss.headOption)
          .getOrElse(throw new IllegalArgumentException("no schema in metadata"))
      case _ => md \ "schema"
    }
    val (sparkSchema, fieldIds) = schemaFields(schemaObj)
    val axes: Map[Int, Seq[(String, Int, String)]] = (md \ "partition-specs") match {
      case JArray(specsJ) =>
        specsJ.map { sp =>
          val sid = (sp \ "spec-id").extractOpt[Int].getOrElse(0)
          val fields = (sp \ "fields").extract[List[JObject]]
          sid -> fields.zipWithIndex.flatMap { case (f, i) =>
            val tr  = (f \ "transform").extractOpt[String].getOrElse("")
            val idx = fieldIds.indexOf((f \ "source-id").extract[Int])
            if (idx >= 0 && tr.nonEmpty && tr != "void")
              Some((sparkSchema.fieldNames(idx), i, tr))
            else None
          }
        }.toMap
      case _ => Map.empty
    }
    PlanHeader(sparkSchema, fieldIds, axes,
      (md \ "properties" \ "graft.read-by-id").extractOpt[String].contains("true"),
      parseNestedIds(schemaObj),
      parseDefaultsJson(schemaObj).map { case (id, v) =>
        id -> JsonMethods.compact(JsonMethods.render(v))
      })
  }

  /** `delete_files`-style metadata table for a STANDARD-format table:
    * one row per LIVE delete file — position (content 1) AND equality
    * (content 2) — with its record count (the visible merge-on-read debt),
    * equality key ids, and the position deletes' data-file path bounds.
    * Planning-sized: rows come from manifests, zero data IO. The
    * maintenance loop reads this to see debt, `rewrite_data_files` clears
    * it, and this goes back to empty. */
  def deletesTable(spark: SparkSession, metadataPath: String): DataFrame = {
    import spark.implicits._
    val p = plan(spark, metadataPath)
    p.deletes.sortBy(d => (d.path.toString, d.dvRef.getOrElse(""))).map { d =>
      (d.path.toString,
        if (d.dvRef.isDefined) "deletion-vector"
        else if (d.content == 1) "position" else "equality",
        d.rows,
        d.equalityIds.mkString(","),
        // a DV applies to exactly its referenced file — that IS its range
        d.dvRef.orElse(d.pathBounds.map(_._1)).orNull,
        d.dvRef.orElse(d.pathBounds.map(_._2)).orNull)
    }.toDF("delete_file", "content", "n_records", "equality_ids",
      "min_data_file", "max_data_file")
  }

  /** `partitions` metadata table for a NATIVE table: per-partition file
    * and record counts from the CURRENT snapshot's manifest entries —
    * identity values, bucket ids and transform values all render into
    * the partition label. Planning-sized: manifests only, zero data
    * files opened, at any table size. */
  def partitionsTable(spark: SparkSession, metadataPath: String): DataFrame = {
    import spark.implicits._
    val p = plan(spark, metadataPath)
    val idToName = p.fieldIds.zip(p.schema.fieldNames).toMap
    def nameOf(id: Int) = idToName.getOrElse(id, s"#$id")
    p.files.groupBy { f =>
      val segs =
        f.partition.toSeq.sortBy(_._1).map { case (id, v) => s"${nameOf(id)}=$v" } ++
        f.buckets.toSeq.sortBy(_._1).map { case (id, (b, m)) => s"bucket[$m](${nameOf(id)})=$b" } ++
        f.transforms.toSeq.sortBy(_._1).map { case (id, (t, v)) => s"$t(${nameOf(id)})=$v" }
      if (segs.isEmpty) "<unpartitioned>" else segs.mkString("/")
    }.toSeq
      .map { case (part, fs) => (part, fs.size.toLong, fs.map(_.rowCount).sum) }
      .toDF("partition", "n_files", "record_count")
      .orderBy("partition")
  }

  /** One `partition-statistics` list entry (spec Partition Statistics):
    * a per-partition stats parquet registered for a snapshot. */
  final case class PartitionStatsEntry(snapshotId: Long, path: String, fileSizeInBytes: Long)

  /** Parsed `partition-statistics` entries of the metadata file. */
  def partitionStatisticsEntries(
      spark: SparkSession, metadataPath: String): Seq[PartitionStatsEntry] = {
    implicit val fmts: Formats = DefaultFormats
    val mPath = new Path(metadataPath)
    val fs    = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md    = JsonMethods.parse(readText(fs, mPath))
    (md \ "partition-statistics").extractOpt[List[JObject]].getOrElse(Nil).map { e =>
      PartitionStatsEntry(
        (e \ "snapshot-id").extract[Long],
        (e \ "statistics-path").extract[String],
        (e \ "file-size-in-bytes").extract[Long])
    }
  }

  /** `snapshots` metadata table for a NATIVE table: one row per snapshot
    * from the metadata JSON — id, parent, sequence number, commit
    * timestamp, summary operation, schema id, manifest list, currency.
    * ONE metadata read, zero manifests touched — planning-sized at any
    * table size. */
  def snapshotsTable(spark: SparkSession, metadataPath: String): DataFrame = {
    import spark.implicits._
    implicit val fmts: Formats = DefaultFormats
    val mPath = new Path(metadataPath)
    val fsys  = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md    = JsonMethods.parse(readText(fsys, mPath))
    val cur   = (md \ "current-snapshot-id").extractOpt[Long].getOrElse(-1L)
    val rows = ((md \ "snapshots") match {
      case JArray(ss) => ss
      case _          => Nil
    }).map { s =>
      val id = (s \ "snapshot-id").extract[Long]
      (id,
        (s \ "parent-snapshot-id").extractOpt[Long],
        (s \ "sequence-number").extractOpt[Long].getOrElse(0L),
        (s \ "timestamp-ms").extractOpt[Long].getOrElse(0L),
        (s \ "summary" \ "operation").extractOpt[String].getOrElse("append"),
        (s \ "schema-id").extractOpt[Int].getOrElse(0),
        (s \ "manifest-list").extractOpt[String].getOrElse(""),
        id == cur)
    }
    rows.toDF("snapshot_id", "parent_id", "sequence_number", "committed_at_ms",
      "operation", "schema_id", "manifest_list", "is_current")
  }

  /** `history` metadata table for a NATIVE table: the snapshot log in
    * commit order. The native writer's log is linear (no rollback ref
    * surgery), so every logged snapshot is a current-state ancestor. */
  def historyTable(spark: SparkSession, metadataPath: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    snapshotsTable(spark, metadataPath)
      .select(col("committed_at_ms").as("made_current_at_ms"),
        col("snapshot_id"), col("parent_id"),
        lit(true).as("is_current_ancestor"))
  }

  /** `files` metadata table for a NATIVE table: one row per DATA file of
    * the current snapshot, from its manifests (record counts and sizes
    * ride the manifest entries — no data file is opened). Planning-sized:
    * O(live files) driver rows, the same granularity Iceberg's own
    * `files` table serves. */
  def filesTable(spark: SparkSession, metadataPath: String): DataFrame = {
    import spark.implicits._
    val p = plan(spark, metadataPath)
    p.files.sortBy(_.path.toString)
      .map(f => (f.path.toString, f.rowCount, f.sizeBytes, f.seq, f.sortOrderId.getOrElse(0)))
      .toDF("file_path", "record_count", "file_size_in_bytes", "data_sequence_number",
        "sort_order_id")
  }

  /** `manifests` metadata table for a NATIVE table: the CURRENT
    * snapshot's manifest-list entries (path, length, spec, content,
    * sequence number, provenance, file counts) — what rewrite_manifests
    * planning reads. One metadata read + one manifest-LIST avro read. */
  def manifestsTable(spark: SparkSession, metadataPath: String): DataFrame = {
    import spark.implicits._
    implicit val fmts: Formats = DefaultFormats
    val mPath = new Path(metadataPath)
    val fsys  = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md    = JsonMethods.parse(readText(fsys, mPath))
    val cur   = (md \ "current-snapshot-id").extractOpt[Long].getOrElse(-1L)
    val listPath = ((md \ "snapshots") match {
      case JArray(ss) => ss
      case _          => Nil
    }).find(s => (s \ "snapshot-id").extract[Long] == cur)
      .flatMap(s => (s \ "manifest-list").extractOpt[String])
    val rows = listPath.toSeq.flatMap(lp => readAvro(fsys, new Path(lp))).map { r =>
      (r.get("manifest_path").toString,
        r.get("manifest_length").asInstanceOf[Long],
        r.get("partition_spec_id").asInstanceOf[Int],
        r.get("content").asInstanceOf[Int],
        r.get("sequence_number").asInstanceOf[Long],
        r.get("added_snapshot_id").asInstanceOf[Long],
        r.get("added_files_count").asInstanceOf[Int],
        r.get("existing_files_count").asInstanceOf[Int])
    }
    rows.toDF("path", "length", "partition_spec_id", "content",
      "sequence_number", "added_snapshot_id", "added_files_count",
      "existing_files_count")
  }

  /** The SQL-visible schema of the `position_deletes` metadata table —
    * the one position-delete row shape the codebase defines
    * ([[IceTable.PositionDeleteSchema]]); both format twins and the
    * catalog's distributed serving read through it. Delete-file
    * provenance rides the parquet source's `_metadata.file_path` column
    * rather than a materialized constant. */
  def positionDeletesSchema: StructType = IceTable.PositionDeleteSchema

  /** Live content-1 (position) delete files of the current snapshot —
    * the file set behind Iceberg's `position_deletes` metadata table.
    * Planning-sized (manifest read). */
  def positionDeleteFilePaths(spark: SparkSession, metadataPath: String): Seq[String] =
    plan(spark, metadataPath).deletes
      .filter(d => d.content == 1 && d.dvRef.isEmpty) // DVs are Puffin, not parquet
      .map(_.path.toString).sorted

  /** Distributed (file_path, pos) frame over a set of position-delete
    * parquet files — the ONE read both twins' `position_deletes` tables
    * and the catalog serving share, so the surfaces cannot drift. */
  private[graft] def positionDeletesFrame(
      spark: SparkSession, paths: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (paths.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], positionDeletesSchema)
    spark.read.schema(positionDeletesSchema).parquet(paths: _*)
      .select(col("file_path"), col("pos"))
  }

  /** Iceberg's `position_deletes` metadata table: the deleted POSITIONS
    * themselves — one row per (file_path, pos) entry across the current
    * snapshot's live position-delete files. [[deletesTable]]
    * (`delete_files`) lists the FILES; this lists their rows — the two
    * distinct surfaces Iceberg defines. O(delete rows) IO and fully
    * DISTRIBUTED (a plain parquet scan of the content-1 files — rows are
    * data-proportional, so no LocalScan/driver materialization here). */
  def positionDeletesTable(spark: SparkSession, metadataPath: String): DataFrame =
    positionDeletesFrame(spark, positionDeleteFilePaths(spark, metadataPath))

  /** (spec field name, source column name) pairs of the DEFAULT partition
    * spec when EVERY field is an identity transform over a type the delta
    * writer can stamp — otherwise Nil. Row-level DML uses this to route
    * insert files through the partitioned rolling writer with REAL
    * partition tuples (external engines then prune delta files like any
    * other); transform specs (bucket/temporal/truncate) fall back to the
    * auxiliary unpartitioned spec, which is conservative and correct.
    * BOTH names matter: values are read from rows by the SOURCE column,
    * but manifests key partition tuples by the SPEC FIELD name — a spec
    * field named differently from its source column (legal per spec)
    * would otherwise commit null partition tuples and external engines
    * would prune away the restated rows. */
  private[graft] def defaultSpecIdentityCols(
      spark: SparkSession, metadataPath: String): Seq[(String, String)] = {
    implicit val fmts: Formats = DefaultFormats
    val mPath = new Path(metadataPath)
    val fs    = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md    = JsonMethods.parse(readText(fs, mPath))
    val schemaObj = (md \ "schemas") match {
      case JArray(ss) =>
        val cur = (md \ "current-schema-id").extractOpt[Int].getOrElse(0)
        ss.find(s => (s \ "schema-id").extractOpt[Int].contains(cur))
          .orElse(ss.headOption).getOrElse(return Nil)
      case _ => md \ "schema"
    }
    val (sparkSchema, fieldIds) = schemaFields(schemaObj)
    val defaultSpecId = (md \ "default-spec-id").extractOpt[Int].getOrElse(0)
    val fields = (md \ "partition-specs") match {
      case JArray(specsJ) =>
        specsJ.find(sp => (sp \ "spec-id").extractOpt[Int].getOrElse(0) == defaultSpecId)
          .map(sp => (sp \ "fields").extract[List[JObject]]).getOrElse(Nil)
      case _ => Nil
    }
    if (fields.isEmpty) return Nil
    val cols = fields.map { f =>
      if ((f \ "transform").extractOpt[String].getOrElse("") != "identity") return Nil
      val idx = fieldIds.indexOf((f \ "source-id").extract[Int])
      if (idx < 0) return Nil
      val dt = sparkSchema.fields(idx).dataType
      val stampable = dt match {
        case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.IntegerType |
            org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.BooleanType |
            org.apache.spark.sql.types.DateType => true
        case _ => false
      }
      if (!stampable) return Nil
      val fieldName = (f \ "name").extractOpt[String].getOrElse(sparkSchema.fieldNames(idx))
      (fieldName, sparkSchema.fieldNames(idx))
    }
    cols
  }

  private[graft] def plan(spark: SparkSession, metadataPath: String,
      snapshotId: Option[Long] = None,
      keepManifest: ManifestHandle => Boolean = _ => true): TablePlan = {
    implicit val fmts: Formats = DefaultFormats
    val mPath = new Path(metadataPath)
    val fs    = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md    = JsonMethods.parse(readText(fs, mPath))

    val formatVersion = (md \ "format-version").extract[Int]
    require(formatVersion == 1 || formatVersion == 2, s"unsupported format-version $formatVersion")
    val location = (md \ "location").extract[String]

    // v2 keeps a schemas list + current-schema-id; v1 may have only "schema"
    val schemaObj = (md \ "schemas") match {
      case JArray(ss) =>
        val cur = (md \ "current-schema-id").extractOpt[Int].getOrElse(0)
        ss.find(s => (s \ "schema-id").extractOpt[Int].contains(cur))
          .orElse(ss.headOption)
          .getOrElse(throw new IllegalArgumentException("no schema in metadata"))
      case _ => md \ "schema"
    }
    val (sparkSchema, fieldIds) = schemaFields(schemaObj)
    val nestedIds = parseNestedIds(schemaObj)
    val readById =
      (md \ "properties" \ "graft.read-by-id").extractOpt[String].contains("true")

    // v3 default values: decode each defaulted field's initial-default,
    // and compute which SCHEMA ERAS lack the field — a file reads the
    // default iff the schema its commit wrote under didn't have the
    // column yet (presence in later files decides null-vs-default)
    val defaultsJ = parseDefaultsJson(schemaObj)
    val fieldDefaults: Map[Int, Any] = defaultsJ.map { case (id, j) =>
      id -> decodeDefault(sparkSchema.fields(fieldIds.indexOf(id)).dataType, j)
    }
    val absentBySeq: Map[Long, Set[Int]] =
      if (fieldDefaults.isEmpty) Map.empty
      else {
        val schemaTopIds: Map[Int, Set[Int]] = (md \ "schemas") match {
          case JArray(ss) => ss.map(s => (
            (s \ "schema-id").extractOpt[Int].getOrElse(0),
            (s \ "fields").extract[List[JObject]].map(f => (f \ "id").extract[Int]).toSet)).toMap
          case _ => Map.empty
        }
        (md \ "snapshots").extract[List[JObject]].map { s =>
          val seqN    = (s \ "sequence-number").extractOpt[Long].getOrElse(0L)
          val schId   = (s \ "schema-id").extractOpt[Int].getOrElse(0)
          val present = schemaTopIds.getOrElse(schId, Set.empty[Int])
          seqN -> fieldDefaults.keySet.filterNot(present)
        }.filter(_._2.nonEmpty).toMap
      }

    val defaultSpecId = (md \ "default-spec-id").extractOpt[Int].getOrElse(0)
    // per-spec field lookups, memoized — an evolved table's manifests name
    // several specs, and each manifest prunes by its own
    val specCache = scala.collection.mutable.Map.empty[Int, (Seq[(String, Int)], Seq[(String, Int, Int)], Seq[(String, Int, String)])]
    def specFieldsOf(specId: Int) = specCache.getOrElseUpdate(specId,
      (identitySpecFields(md, specId), bucketSpecFields(md, specId), transformSpecFields(md, specId)))

    // time travel: an explicit snapshot id overrides the current pointer
    val currentId = snapshotId.getOrElse(
      (md \ "current-snapshot-id").extractOpt[Long].getOrElse(-1L))
    if (currentId < 0)
      return TablePlan(sparkSchema, fieldIds, Nil, Nil, readById, nestedIds,
        fieldDefaults, absentBySeq)
    val snapshot = (md \ "snapshots").extract[List[JObject]]
      .find(s => (s \ "snapshot-id").extract[Long] == currentId)
      .getOrElse(throw new NoSuchElementException(s"snapshot $currentId not in metadata"))

    // v2: snapshot → manifest-list avro (data AND delete manifests, each
    // carrying its sequence number AND its partition summaries — spec
    // field 507); v1 fallback: inline "manifests"
    val handles: Seq[ManifestHandle] = (snapshot \ "manifest-list") match {
      case JString(listPath) =>
        readAvro(fs, resolve(location, listPath)).map { rec =>
          val seq = Option(rec.get("sequence_number")).map(_.asInstanceOf[Long]).getOrElse(0L)
          val sid = Option(rec.get("partition_spec_id")).map(_.asInstanceOf[Int]).getOrElse(defaultSpecId)
          val content = Option(rec.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
          ManifestHandle(rec.get("manifest_path").toString, seq, sid, content,
            parseSummaries(rec))
        }
      case _ => (snapshot \ "manifests").extract[List[String]]
        .map(ManifestHandle(_, 0L, defaultSpecId, 0, None))
    }

    // manifest-LIST pruning: a data manifest whose partition summaries
    // prove no file inside can match is never even read — at 100 TB the
    // planning cost of a selective query is O(surviving manifests), not
    // O(all manifests). Delete manifests are always read (extra delete
    // evidence is dead weight, never wrong).
    val planned = handles.flatMap { h =>
      if (h.content == 0 && !keepManifest(h)) Nil
      else {
      manifestReadsAtPlanning.increment()
      val (mp, listSeq, manifestSpecId) = (h.path, h.seq, h.specId)
      val (identityFields, bucketFields, transformFields) = specFieldsOf(manifestSpecId)
      readAvro(fs, resolve(location, mp)).flatMap { entry =>
        val status = entry.get("status").asInstanceOf[Int] // 0 existing, 1 added, 2 deleted
        if (status == 2) None
        else {
          val df     = entry.get("data_file").asInstanceOf[GenericRecord]
          val format = df.get("file_format").toString
          // PUFFIN entries are v3 deletion vectors (fields 143-145 below)
          require(format.equalsIgnoreCase("PARQUET") || format.equalsIgnoreCase("PUFFIN"),
            s"unsupported file format $format")
          // entry seq may be null for ADDED entries — inherit the manifest's
          val seq = Option(entry.get("sequence_number")).map(_.asInstanceOf[Long]).getOrElse(listSeq)
          val path = resolve(location, df.get("file_path").toString)
          val fSize = Option(df.get("file_size_in_bytes")).map(_.asInstanceOf[Long]).getOrElse(0L)
          val fRows = Option(df.get("record_count")).map(_.asInstanceOf[Long]).getOrElse(0L)
          // v2 data_file.content: 0 data, 1 position deletes, 2 equality deletes
          Option(df.get("content")).map(_.asInstanceOf[Int]).getOrElse(0) match {
            case 0 =>
              val lo = boundsMap(df.getSchema.getField("lower_bounds") != null, df, "lower_bounds")
              val hi = boundsMap(df.getSchema.getField("upper_bounds") != null, df, "upper_bounds")
              val merged = (lo.keySet ++ hi.keySet).flatMap { k =>
                for (l <- lo.get(k); h <- hi.get(k)) yield k -> (l, h)
              }.toMap
              // identity partition values from the entry's partition record
              // (matched by partition field name, keyed by source field id)
              val pvals: Map[Int, Any] = df.get("partition") match {
                case r: GenericRecord =>
                  identityFields.flatMap { case (pname, sid) =>
                    Option(r.getSchema.getField(pname))
                      .flatMap(_ => Option(r.get(pname)))
                      .map {
                        case u: org.apache.avro.util.Utf8 => sid -> u.toString
                        case v                            => sid -> v
                      }
                  }.toMap
                case _ => Map.empty
              }
              // bucket values by source id, with the transform's modulus
              val bvals: Map[Int, (Int, Int)] = df.get("partition") match {
                case r: GenericRecord =>
                  bucketFields.flatMap { case (pname, sid, n) =>
                    Option(r.getSchema.getField(pname))
                      .flatMap(_ => Option(r.get(pname)))
                      .collect { case v: java.lang.Integer => sid -> ((v.intValue, n)) }
                  }.toMap
                case _ => Map.empty
              }
              // temporal/truncate values by source id, with the transform name
              val tvals: Map[Int, (String, Any)] = df.get("partition") match {
                case r: GenericRecord =>
                  transformFields.flatMap { case (pname, sid, tr) =>
                    Option(r.getSchema.getField(pname))
                      .flatMap(_ => Option(r.get(pname)))
                      .map {
                        case u: org.apache.avro.util.Utf8 => sid -> ((tr, u.toString: Any))
                        case v                            => sid -> ((tr, v))
                      }
                  }.toMap
                case _ => Map.empty
              }
              val so: Seq[Long] = df.getSchema.getField("split_offsets") match {
                case null => Nil
                case _ => df.get("split_offsets") match {
                  case l: java.util.List[_] => l.toArray.toSeq.map(_.asInstanceOf[Long])
                  case _                    => Nil
                }
              }
              // null_value_counts (spec field 110): both map encodings,
              // same shapes as bounds
              val nc: Map[Int, Long] = df.getSchema.getField("null_value_counts") match {
                case null => Map.empty
                case _ => df.get("null_value_counts") match {
                  case l: java.util.List[_] =>
                    l.toArray.collect { case r: GenericRecord =>
                      r.get("key").asInstanceOf[Int] -> r.get("value").asInstanceOf[Long]
                    }.toMap
                  case m: java.util.Map[_, _] =>
                    import scala.jdk.CollectionConverters._
                    m.asScala.map { case (k, v) =>
                      k.toString.toInt -> v.asInstanceOf[Long] }.toMap
                  case _ => Map.empty
                }
              }
              // spec field 140 (absent on pre-sort-order manifests = null)
              val soId: Option[Int] = df.getSchema.getField("sort_order_id") match {
                case null => None
                case _    => Option(df.get("sort_order_id")).map(_.asInstanceOf[Int])
              }
              // spec field 142 (v3 row lineage; absent = unassigned)
              val frId: Option[Long] = df.getSchema.getField("first_row_id") match {
                case null => None
                case _    => Option(df.get("first_row_id")).map(_.asInstanceOf[Long])
              }
              Some(Left(PlannedFile(
                path, merged, seq, pvals, bvals, tvals, fSize, fRows, so, nc, soId, frId)))
            case c @ (1 | 2) =>
              val eqIds = df.getSchema.getField("equality_ids") match {
                case null => Seq.empty[Int]
                case _ => df.get("equality_ids") match {
                  case l: java.util.List[_] => l.toArray.toSeq.map(_.asInstanceOf[Int])
                  case _                    => Seq.empty[Int]
                }
              }
              // position-delete file_path [min, max] — bounds the delete's
              // data-file blast radius for the reader's range pruning
              val pb = if (c != 1) None else {
                val lo = boundsMap(df.getSchema.getField("lower_bounds") != null, df, "lower_bounds")
                val hi = boundsMap(df.getSchema.getField("upper_bounds") != null, df, "upper_bounds")
                for {
                  l <- lo.get(PosDeletePathFieldId)
                  h <- hi.get(PosDeletePathFieldId)
                } yield (new String(l, "UTF-8"), new String(h, "UTF-8"))
              }
              // v3 deletion-vector fields (143-145) — absent on pre-DV
              // manifests, so read null-safely like the other extensions
              val dvRef = df.getSchema.getField("referenced_data_file") match {
                case null => None
                case _    => Option(df.get("referenced_data_file")).map(_.toString)
              }
              val dvOff = df.getSchema.getField("content_offset") match {
                case null => 0L
                case _ => Option(df.get("content_offset")).map(_.asInstanceOf[Long]).getOrElse(0L)
              }
              val dvSz = df.getSchema.getField("content_size_in_bytes") match {
                case null => 0L
                case _ => Option(df.get("content_size_in_bytes")).map(_.asInstanceOf[Long]).getOrElse(0L)
              }
              Some(Right(PlannedDelete(path, seq, c, eqIds, pb, fRows, dvRef, dvOff, dvSz)))
            case other =>
              throw new UnsupportedOperationException(s"unknown data_file content $other")
          }
        }
      }
      }
    }
    TablePlan(sparkSchema, fieldIds,
      planned.collect { case Left(f) => f }, planned.collect { case Right(d) => d },
      readById, nestedIds, fieldDefaults, absentBySeq)
  }

  /** Parse a manifest-list entry's `partitions` summaries (spec field 507)
    * into [[FieldSummary]]s, None when absent/empty — shared by [[plan]]
    * and [[resumeWriter]] so restored tables keep their pruning evidence. */
  private def parseSummaries(rec: GenericRecord): Option[Seq[FieldSummary]] =
    if (rec.getSchema.getField("partitions") == null) None
    else rec.get("partitions") match {
      case l: java.util.List[_] if !l.isEmpty =>
        Some(l.toArray.toIndexedSeq.map { case r: GenericRecord =>
          def bytes(n: String): Option[Array[Byte]] =
            if (r.getSchema.getField(n) == null) None
            else Option(r.get(n)).map {
              case bb: java.nio.ByteBuffer =>
                val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
              case ab: Array[Byte] => ab
              case other => other.toString.getBytes("UTF-8")
            }
          FieldSummary(
            Option(r.get("contains_null")).exists(_.asInstanceOf[Boolean]),
            bytes("lower_bound"), bytes("upper_bound"))
        })
      case _ => None
    }

  /** Parse a bounds field in either spec encoding: the array-of-records
    * map (non-string keys) or a plain Avro string-keyed map. */
  private def boundsMap(present: Boolean, df: GenericRecord, field: String): Map[Int, Array[Byte]] = {
    if (!present) return Map.empty
    def bytes(v: Any): Array[Byte] = v match {
      case bb: java.nio.ByteBuffer =>
        val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
      case a: Array[Byte] => a
      case other          => other.toString.getBytes("UTF-8")
    }
    df.get(field) match {
      case null => Map.empty
      case l: java.util.List[_] =>
        l.toArray.collect { case r: GenericRecord =>
          r.get("key").asInstanceOf[Int] -> bytes(r.get("value"))
        }.toMap
      case m: java.util.Map[_, _] =>
        import scala.jdk.CollectionConverters._
        m.asScala.map { case (k, v) => k.toString.toInt -> bytes(v) }.toMap
      case _ => Map.empty
    }
  }

  private def emptyFrame(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Scan a standard Iceberg table pinned to the given metadata file (the
    * reference's `iceberg_scan('{metadata}')` contract), with v2 row-level
    * deletes applied. */
  def scan(spark: SparkSession, metadataPath: String): DataFrame = {
    val p = plan(spark, metadataPath)
    scanFiles(spark, p, p.files)
  }

  /** Snapshot ids of the metadata file in APPEND ORDER (the order the
    * `snapshots` array records them — real Iceberg ids are random longs,
    * so order must come from the log, never from id magnitude). The
    * streaming source's offset space. */
  def snapshotLog(spark: SparkSession, metadataPath: String): Seq[Long] = {
    implicit val fmts: Formats = DefaultFormats
    val mPath = new Path(metadataPath)
    val fs    = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md    = JsonMethods.parse(readText(fs, mPath))
    (md \ "snapshots") match {
      case JArray(ss) => ss.map(s => (s \ "snapshot-id").extract[Long])
      case _          => Nil
    }
  }

  /** One blob's metadata as the TABLE metadata records it (spec
    * `statistics[].blob-metadata`): type + addressed field ids +
    * snapshot/sequence provenance + free properties (`ndv` for theta
    * sketches). Offsets live in the Puffin footer, not here. */
  final case class StatsBlobMeta(blobType: String, snapshotId: Long,
      sequenceNumber: Long, fields: Seq[Int], properties: Map[String, String])

  /** One `statistics` list entry: a Puffin statistics file registered for
    * a snapshot (spec Table Statistics: at most one per snapshot;
    * re-analysis replaces, expiration drops the entry with its
    * snapshot). */
  final case class StatsEntry(snapshotId: Long, path: String, fileSizeInBytes: Long,
      footerSizeInBytes: Long, blobs: Seq[StatsBlobMeta])

  /** Parsed `statistics` entries of the metadata file (empty when the
    * table was never analyzed). */
  def statisticsEntries(spark: SparkSession, metadataPath: String): Seq[StatsEntry] = {
    implicit val fmts: Formats = DefaultFormats
    val mPath = new Path(metadataPath)
    val fs    = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md    = JsonMethods.parse(readText(fs, mPath))
    (md \ "statistics").extractOpt[List[JObject]].getOrElse(Nil).map { e =>
      StatsEntry(
        (e \ "snapshot-id").extract[Long],
        (e \ "statistics-path").extract[String],
        (e \ "file-size-in-bytes").extract[Long],
        (e \ "file-footer-size-in-bytes").extract[Long],
        (e \ "blob-metadata").extractOpt[List[JObject]].getOrElse(Nil).map { b =>
          StatsBlobMeta(
            (b \ "type").extract[String],
            (b \ "snapshot-id").extract[Long],
            (b \ "sequence-number").extract[Long],
            (b \ "fields").extract[List[Int]],
            (b \ "properties").extractOpt[Map[String, String]].getOrElse(Map.empty))
        })
    }
  }

  /** Free-form table properties of the metadata file (spec `properties`
    * map) — how derived artifacts (materialized views, clustering
    * declarations) record their provenance on the table itself. */
  def tableProperties(spark: SparkSession, metadataPath: String): Map[String, String] = {
    implicit val fmts: Formats = DefaultFormats
    val mPath = new Path(metadataPath)
    val fs    = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md    = JsonMethods.parse(readText(fs, mPath))
    (md \ "properties").extractOpt[Map[String, String]].getOrElse(Map.empty)
  }

  /** The metadata file's `current-snapshot-id` pointer (None before the
    * first commit). */
  def currentSnapshotId(spark: SparkSession, metadataPath: String): Option[Long] = {
    implicit val fmts: Formats = DefaultFormats
    val mPath = new Path(metadataPath)
    val fs    = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md    = JsonMethods.parse(readText(fs, mPath))
    (md \ "current-snapshot-id").extractOpt[Long].filter(_ >= 0)
  }

  /** Absolute paths of data files ADDED between two snapshots of the log
    * (`fromId` None = table genesis) — the Iceberg streaming-read window.
    * Computed as the file-set difference of the two snapshots' plans, so
    * it is exact under appends; a window that introduces row-level
    * DELETE files is rejected loudly (a CDC consumer must not silently
    * miss retractions). */
  def incrementalFiles(
      spark: SparkSession,
      metadataPath: String,
      fromId: Option[Long],
      toId: Long): Seq[String] = {
    val to      = plan(spark, metadataPath, Some(toId))
    val from    = fromId.map(id => plan(spark, metadataPath, Some(id)))
    val fromDel = from.map(_.deletes.map(_.path.toString).toSet).getOrElse(Set.empty)
    val newDel  = to.deletes.map(_.path.toString).toSet -- fromDel
    require(newDel.isEmpty,
      s"incremental window crosses row-level deletes: ${newDel.take(3).mkString(",")}")
    val fromFiles = from.map(_.files.map(_.path.toString).toSet).getOrElse(Set.empty)
    to.files.map(_.path.toString).filterNot(fromFiles)
  }

  /** Current metadata file of an Iceberg table directory, resolved through
    * `version-hint.text` (the writer's commit protocol). */
  def currentMetadataPath(spark: SparkSession, location: String): String = {
    val hint = new Path(location, "metadata/version-hint.text")
    val fs   = hint.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the hint is advisory: tolerate a missing/garbled one (a reader
    // racing the flip, or an externally-written table without a hint) by
    // falling back to the metadata-dir listing, then walk forward past
    // any newer committed versions — the same recovery Iceberg's
    // HadoopTableOperations performs
    val VPat = raw"v(\d+)\.metadata\.json".r
    def latestListed(): Int = fs.listStatus(new Path(location, "metadata")).toSeq
      .map(_.getPath.getName)
      .collect { case VPat(n) => n.toInt }
      .maxOption.getOrElse(
        throw new IllegalStateException(s"no metadata versions at $location"))
    var v = (try readText(fs, hint).trim.toInt
    catch {
      case _: NumberFormatException | _: java.io.IOException => latestListed()
    })
    // a numerically-valid hint can still point past every real version
    // (copied table, external tooling): validate it resolves, else list
    if (!fs.exists(new Path(location, f"metadata/v$v%05d.metadata.json")))
      v = latestListed()
    while (fs.exists(new Path(location, f"metadata/v${v + 1}%05d.metadata.json"))) v += 1
    new Path(location, f"metadata/v$v%05d.metadata.json").toString
  }

  /** Time travel: scan the table as of snapshot `snapshotId` from the
    * metadata's snapshot list — the other half of the `iceberg_scan`
    * contract (`FOR VERSION AS OF`). Row-level deletes are applied with
    * the sequence numbers THAT snapshot's manifest list carries, so a
    * pre-delete snapshot reads the undeleted rows. */
  def scanAt(spark: SparkSession, metadataPath: String, snapshotId: Long): DataFrame = {
    val p = plan(spark, metadataPath, Some(snapshotId))
    scanFiles(spark, p, p.files)
  }

  /** Read `files` with the plan's delete files applied (spec "Scan
    * Planning" / "Row-level deletes"):
    *
    *   - position deletes (content 1) remove `(file_path, pos)` rows from
    *     data files whose data sequence number <= the delete's;
    *   - equality deletes (content 2) remove rows matching any delete row
    *     on the `equality_ids` columns (null-safe, per spec) from data
    *     files STRICTLY older than the delete.
    *
    * Both are anti-joins keyed by `_metadata` columns — delete files are
    * per-partition-sized in a real table, so at scale these broadcast and
    * the data side streams map-side; no extra shuffle of the fact scan. */
  private def scanFiles(spark: SparkSession, p: TablePlan, files: Seq[PlannedFile],
      lineage: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val outNames =
      if (lineage) p.schema.fieldNames.toSeq ++ Seq("_row_id", "_last_updated_sequence_number")
      else p.schema.fieldNames.toSeq
    val lineageFields = Seq(
      StructField("_row_id", LongType, nullable = true),
      StructField("_last_updated_sequence_number", LongType, nullable = true))
    if (files.isEmpty)
      return emptyFrame(spark,
        if (lineage) StructType(p.schema.fields ++ lineageFields) else p.schema)
    // a rename/drop-evolved table resolves file columns by parquet field
    // id: the read schema carries the ids, and the relation is built under
    // the [[idReadSession]] twin so the id-matching flag is live at
    // execution WITHOUT mutating the caller's session conf. A data file
    // without stamped ids fails LOUDLY here — by-name fallback could
    // resurrect a dropped-and-readded column's old values.
    val readSchema0 =
      if (p.readById) withParquetFieldIds(p.schema, p.fieldIds, p.nestedIds) else p.schema
    // lineage columns read as PHYSICAL columns where a rewrite
    // materialized them (Spark null-fills the files that lack them)
    val readSchema =
      if (lineage) StructType(readSchema0.fields ++ lineageFields) else readSchema0
    val readSpark = if (p.readById) idReadSession(spark) else spark
    // The manifests already planned these exact files; Spark's relation
    // builder still stats them, and above the parallel-discovery
    // threshold (32) it does so with a DISTRIBUTED listing job — ~1 s of
    // scheduler churn per scan for metadata the driver can fetch in
    // milliseconds (measured: 256-file scan 1.67 s -> 0.27 s). Listing is
    // eager at relation creation, so a scoped raise of the threshold
    // keeps driver-side listing for manifest-planned file lists without
    // leaking into other reads. Bounded: past `graft.scan.driverListingBound`
    // files (default 4096) sequential driver stats would themselves be
    // the bottleneck and the distributed job is the right tool again.
    val driverListBound = spark.conf.get("graft.scan.driverListingBound", "4096").toInt
    val threshKey = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val base = if (files.size <= driverListBound) {
      val saved = readSpark.conf.getOption(threshKey)
      readSpark.conf.set(threshKey, (files.size + 1).toString)
      try readSpark.read.schema(readSchema).parquet(files.map(_.path.toString): _*)
      finally saved match {
        case Some(v) => readSpark.conf.set(threshKey, v)
        case None    => readSpark.conf.unset(threshKey)
      }
    } else readSpark.read.schema(readSchema).parquet(files.map(_.path.toString): _*)

    // Identity partition columns recorded in the manifests' partition
    // records (spec "Column Projection"): an identity source column may be
    // OMITTED from data files, its per-file constant living only in
    // partition metadata. Reconstruct via a broadcast (path -> value) join;
    // files that do carry the column win through coalesce — for identity
    // both sides hold the same constant by definition.
    val idToField = p.fieldIds.zip(p.schema.fields).toMap
    val overlayIds = p.fieldIds.filter { id =>
      files.exists(_.partition.contains(id)) && (idToField(id).dataType match {
        case IntegerType | LongType | FloatType | DoubleType | BooleanType | StringType => true
        case _ => false
      })
    }
    if (p.deletes.isEmpty && overlayIds.isEmpty && p.fieldDefaults.isEmpty && !lineage)
      return base

    // URI-scheme normalization so manifest paths (`file:/x`, `/x`) and
    // Spark's `_metadata.file_path` (`file:///x`) compare equal. Local and
    // bucket-style paths only — an authority component would need the
    // full-URI form on both sides.
    def normStr(s: String): String  = s.replaceFirst("^[a-z][a-z0-9+.-]*:/+", "/")
    def normCol(c: Column): Column = regexp_replace(c, "^[a-z][a-z0-9+.-]*:/+", "/")

    var data = base
      .withColumn("__path", normCol(col("_metadata.file_path")))
      .withColumn("__pos", col("_metadata.row_index"))

    if (overlayIds.nonEmpty) {
      val pSchema = StructType(StructField("__path", StringType) +:
        overlayIds.map(id => StructField(s"__pv_$id", StringType)))
      val pRows = files.map(f => org.apache.spark.sql.Row.fromSeq(
        normStr(f.path.toString) +: overlayIds.map(id => f.partition.get(id).map(_.toString).orNull)))
      val pdf = spark.createDataFrame(
        spark.sparkContext.parallelize(pRows, 1), pSchema)
      data = data.join(broadcast(pdf), Seq("__path"), "left")
      overlayIds.foreach { id =>
        val fld = idToField(id)
        data = data.withColumn(fld.name,
          coalesce(col(fld.name), col(s"__pv_$id").cast(fld.dataType)))
      }
    }

    // v3 default values: a file whose schema era predates a defaulted
    // column reads `initial-default` for it; files that physically carry
    // the column keep their values INCLUDING explicit nulls (presence
    // decides, not coalesce). Same broadcast path->flag overlay as the
    // partition reconstruction above.
    val defNeeds: Seq[(Int, Set[String])] = p.fieldDefaults.keys.toSeq.sorted.map { id =>
      id -> files.filter(f => p.absentBySeq.getOrElse(f.seq, Set.empty[Int]).contains(id))
        .map(f => normStr(f.path.toString)).toSet
    }.filter(_._2.nonEmpty)
    if (defNeeds.nonEmpty) {
      val dSchema = StructType(StructField("__path", StringType) +:
        defNeeds.map { case (id, _) => StructField(s"__df_$id", BooleanType) })
      val dRows = files.map { f =>
        val n = normStr(f.path.toString)
        org.apache.spark.sql.Row.fromSeq(
          n +: defNeeds.map { case (_, set) => Boolean.box(set(n)) })
      }
      val ddf = spark.createDataFrame(spark.sparkContext.parallelize(dRows, 1), dSchema)
      data = data.join(broadcast(ddf), Seq("__path"), "left")
      defNeeds.foreach { case (id, _) =>
        val fld = idToField(id)
        data = data.withColumn(fld.name,
          when(col(s"__df_$id"), lit(p.fieldDefaults(id)).cast(fld.dataType))
            .otherwise(col(fld.name)))
      }
    }

    // v3 row lineage: implicit values derive per file (first_row_id +
    // position; last-updated = the file's data sequence number) unless a
    // rewrite materialized them physically — physical wins via coalesce
    if (lineage) {
      val ldf = spark.createDataFrame(files.map(f =>
        (normStr(f.path.toString), f.firstRowId.getOrElse(-1L),
          f.firstRowId.isDefined, f.seq)))
        .toDF("__path", "__frbase", "__frset", "__fseq")
      data = data.join(broadcast(ldf), Seq("__path"), "left")
        .withColumn("_row_id", coalesce(col("_row_id"),
          when(col("__frset"), col("__frbase") + col("__pos"))))
        .withColumn("_last_updated_sequence_number",
          coalesce(col("_last_updated_sequence_number"), col("__fseq")))
    }

    if (p.deletes.isEmpty)
      return data.select(outNames.map(col).toIndexedSeq: _*)

    val seqRows = files.map(f => (normStr(f.path.toString), f.seq))
    val seqDf   = spark.createDataFrame(seqRows).toDF("__path", "__dataseq")
    data = data.join(broadcast(seqDf), "__path")

    // v3 deletion vectors: ONE effective DV per data file (the max-seq
    // vector supersedes — its writer merged every prior delete for the
    // file, the v3 contract). Blob fetch + bitmap expansion run on
    // EXECUTORS (one task per vector, ranged read of exactly the blob),
    // so driver work is O(#vectors) metadata only. Older parquet
    // position deletes the vector absorbed may still apply below — the
    // anti-join is idempotent, so that costs IO, never correctness.
    val dvDeletes = p.deletes.filter(d => d.content == 1 && d.dvRef.isDefined)
    if (dvDeletes.nonEmpty) {
      val dvByFile = dvDeletes.groupBy(d => normStr(d.dvRef.get))
        .map { case (f, ds) => f -> ds.maxBy(_.seq) }
      val metas = dvByFile.toSeq.map { case (f, d) =>
        (f, d.seq, d.path.toString, d.dvOffset, d.dvSize)
      }
      val dvRows = spark.sparkContext
        .parallelize(metas, math.max(1, math.min(metas.size, 64)))
        .flatMap { case (f, dseq, blobPath, off, sz) =>
          val bm = DeletionVectors.readBitmap(blobPath, off, sz)
          val it = bm.getLongIterator
          // NOTE: Iterator inherits a legacy `seq: this.type` member, so
          // the captured sequence number must not be named `seq` here
          new Iterator[(String, Long, Long)] {
            override def hasNext: Boolean = it.hasNext
            override def next(): (String, Long, Long) = (f, it.next(), dseq)
          }
        }
      val dvDf = spark.createDataFrame(dvRows).toDF("__dp", "__dpos", "__delseq")
      data = data.join(broadcast(dvDf),
        col("__path") === col("__dp") && col("__pos") === col("__dpos") &&
          col("__dataseq") <= col("__delseq"),
        "left_anti")
    }

    val posDeletes = p.deletes.filter(d => d.content == 1 && d.dvRef.isEmpty)
    if (posDeletes.nonEmpty) {
      val dels = posDeletes.groupBy(_.seq).map { case (seq, group) =>
        spark.read.parquet(group.map(_.path.toString): _*)
          .select(normCol(col("file_path")).as("__dp"), col("pos").as("__dpos"),
            lit(seq).as("__delseq"))
      }.reduce(_ unionAll _)
      data = data.join(broadcast(dels),
        col("__path") === col("__dp") && col("__pos") === col("__dpos") &&
          col("__dataseq") <= col("__delseq"),
        "left_anti")
    }

    val idToName = p.fieldIds.zip(p.schema.fieldNames).toMap
    p.deletes.filter(_.content == 2).groupBy(d => (d.seq, d.equalityIds)).foreach {
      case ((seq, eqIds), group) =>
        require(eqIds.nonEmpty, "equality delete file without equality_ids")
        val keyNames = eqIds.map(id => idToName.getOrElse(id,
          throw new NoSuchElementException(s"equality_id $id not in schema")))
        // on a rename-evolved table the delete file may carry pre-rename
        // names: bind its key columns by their equality ids
        val delBase =
          if (p.readById) {
            val keySchema = StructType(keyNames.map(n =>
              p.schema.fields(p.schema.fieldNames.indexOf(n)).copy(nullable = true)))
            idReadSession(spark).read.schema(withParquetFieldIds(keySchema, eqIds))
              .parquet(group.map(_.path.toString): _*)
          } else spark.read.parquet(group.map(_.path.toString): _*)
        val delKeys = delBase
          .select(keyNames.map(n => col(n).as(s"__eq_$n")): _*).distinct()
        val keyMatch = keyNames.map(n => col(n) <=> col(s"__eq_$n")).reduce(_ && _)
        data = data.join(broadcast(delKeys), keyMatch && col("__dataseq") < lit(seq), "left_anti")
    }

    data.select(outNames.map(col).toIndexedSeq: _*)
  }

  /** Scan with the v3 ROW-LINEAGE metadata columns appended: `_row_id`
    * (file `first_row_id` + position, or the physically-materialized
    * column a rewrite wrote) and `_last_updated_sequence_number`. Null
    * for files committed before lineage tracking — the spec's
    * unassigned state. */
  def scanWithLineage(spark: SparkSession, metadataPath: String): DataFrame = {
    val p = plan(spark, metadataPath)
    scanFiles(spark, p, p.files, lineage = true)
  }

  /** Files of the current snapshot whose recorded [lower, upper] bounds for
    * `colName` can intersect [lower, upper] — manifest-level pruning, the
    * planning step that lets a 100 TB Iceberg scan skip files before Spark
    * ever lists one. Files without bounds are conservatively kept. */
  def planFiles(spark: SparkSession, metadataPath: String, colName: String,
      lower: Option[String], upper: Option[String]): Seq[String] = {
    val p = plan(spark, metadataPath)
    p.files.filter(fileCanMatch(p, _, colName, lower, upper)).map(_.path.toString)
  }

  /** Can `f` hold rows with `colName` in [lower, upper]? The single
    * per-file pruning predicate behind both [[planFiles]] (library scans)
    * and the standard-format V2 scan's `SupportsPushDownFilters`
    * (IcebergMorScanBuilder): identity partition values prune exactly,
    * order-preserving transforms prune ranges, bucket transforms prune
    * point lookups, column bounds prune conservatively, and a file with
    * no evidence is always kept. */
  private[graft] def fileCanMatch(p: TablePlan, f: PlannedFile, colName: String,
      lower: Option[String], upper: Option[String]): Boolean = {
    val idx = p.schema.fieldNames.indexOf(colName)
    require(idx >= 0, s"no column $colName")
    val fieldId = p.fieldIds(idx) // the spec's id attribute, not position
    val dt      = p.schema.fields(idx).dataType
    def cmp(a: String, b: String): Int = dt match {
      // parseDouble handles NaN/Infinity literals (BigDecimal would throw
      // at planning); non-finite literals are additionally excluded from
      // pushdown at the filter-translation layer
      case FloatType | DoubleType =>
        java.lang.Double.compare(java.lang.Double.parseDouble(a), java.lang.Double.parseDouble(b))
      case IntegerType | LongType => BigDecimal(a).compare(BigDecimal(b))
      // dates/timestamps compare in epoch-day/micros space: stored
      // partition values / decoded bounds are the numeric encodings,
      // pushed literals are (UTC-normalized) ISO strings; an unparseable
      // side reads as EQUAL (file kept)
      case DateType =>
        (epochDay(a), epochDay(b)) match {
          case (Some(x), Some(y)) => java.lang.Long.compare(x, y)
          case _                  => 0
        }
      case TimestampType | TimestampNTZType =>
        (epochMicros(a), epochMicros(b)) match {
          case (Some(x), Some(y)) => java.lang.Long.compare(x, y)
          case _                  => 0
        }
      case _                      => a.compareTo(b)
    }
    // identity partition value first: for a partitioned table it prunes
    // exactly (the file holds ONLY rows with that value), even when the
    // writer recorded no column bounds
    f.partition.get(fieldId) match {
        case Some(v) =>
          val s = v.toString
          lower.forall(l => cmp(s, l) >= 0) && upper.forall(u => cmp(s, u) <= 0)
        case None => f.transforms.get(fieldId) match {
          // temporal/truncate partitions prune RANGES: the transforms are
          // order-preserving, so the file's value must sit inside
          // [transform(lower), transform(upper)]. An untransformable
          // literal keeps the file conservatively.
          case Some((tr, pval)) =>
            def num(a: Any): Long = a match {
              case i: java.lang.Integer => i.longValue
              case l: java.lang.Long    => l.longValue
              case other => throw new IllegalStateException(s"non-numeric transform value $other")
            }
            def within(bound: Option[String], isLower: Boolean): Boolean = bound match {
              case None => true
              case Some(b) => applyTransform(tr, dt, b) match {
                case None => true
                case Some(t) =>
                  val c = (pval, t) match {
                    case (p: String, tt: String) => p.compareTo(tt)
                    case (p, tt)                 => java.lang.Long.compare(num(p), num(tt))
                  }
                  if (isLower) c >= 0 else c <= 0
              }
            }
            within(lower, isLower = true) && within(upper, isLower = false)
          case None => f.buckets.get(fieldId) match {
          // bucket partitions prune POINT lookups: the literal's spec
          // bucket must equal the file's recorded bucket id
          case Some((bval, n)) if lower.nonEmpty && lower == upper =>
            bucketOf(dt, lower.get, n).forall(_ == bval)
          case _ => f.bounds.get(fieldId) match {
            case Some((lo, hi)) =>
              (decodeBound(dt, lo), decodeBound(dt, hi)) match {
                case (Some(mn), Some(mx)) =>
                  lower.forall(l => cmp(mx.toString, l) >= 0) &&
                    upper.forall(u => cmp(mn.toString, u) <= 0)
                case _ => true
              }
            case None => true // no bounds recorded -> cannot skip
          }
        }
      }
    }
  }

  /** Range-pruned scan over a standard Iceberg table: reads only files
    * whose bounds can contain `colName` in [lower, upper]; the caller
    * still applies the row-level predicate. */
  /** (manifest path, content 0=data 1=deletes) entries of the current
    * snapshot's manifest list — lets gates assert planning-cost effects
    * (e.g. rewrite_manifests collapsing O(commits) manifests to O(specs)). */
  private[graft] def manifestListPaths(
      spark: SparkSession, metadataPath: String): Seq[(String, Int)] = {
    implicit val fmts: Formats = DefaultFormats
    val mPath = new Path(metadataPath)
    val fs    = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md    = JsonMethods.parse(readText(fs, mPath))
    val location  = (md \ "location").extract[String]
    val currentId = (md \ "current-snapshot-id").extractOpt[Long].getOrElse(-1L)
    if (currentId < 0) return Nil
    val snapshot = (md \ "snapshots").extract[List[JObject]]
      .find(s => (s \ "snapshot-id").extract[Long] == currentId)
      .getOrElse(return Nil)
    (snapshot \ "manifest-list") match {
      case JString(listPath) =>
        readAvro(fs, resolve(location, listPath)).map { rec =>
          (rec.get("manifest_path").toString,
            Option(rec.get("content")).map(_.asInstanceOf[Int]).getOrElse(0))
        }
      case _ => (snapshot \ "manifests").extract[List[String]].map((_, 0))
    }
  }

  def scanRange(spark: SparkSession, metadataPath: String, colName: String,
      lower: Option[String], upper: Option[String]): DataFrame = {
    val p    = plan(spark, metadataPath)
    val keep = planFiles(spark, metadataPath, colName, lower, upper).toSet
    scanFiles(spark, p, p.files.filter(f => keep(f.path.toString)))
  }

  /** IN-list-pruned scan in ONE plan: keeps files that can match ANY of
    * `values` as a point lookup (identity partitions / bucket ids / bounds
    * via [[fileCanMatch]]) instead of unioning per-value [[scanRange]]s —
    * the served-index probe shape where a batch's key set selects a file
    * subset. Returns (dataframe, filesKept, filesTotal) so callers can
    * counter-gate the pruning. */
  def scanPoints(spark: SparkSession, metadataPath: String, colName: String,
      values: Seq[String]): (DataFrame, Int, Int) = {
    val p   = plan(spark, metadataPath)
    val idx = p.schema.fieldNames.indexOf(colName)
    require(idx >= 0, s"no column $colName")
    val fieldId = p.fieldIds(idx)
    val dt      = p.schema.fields(idx).dataType
    // O(1) membership fast path for integer columns when a file pins the
    // column to a single value (identity partition value, or min == max
    // bounds — the one-file-per-cell index layout): the generic fallback
    // is O(|files| × |values|) fileCanMatch calls, which turned planning
    // itself into the bottleneck on a 25k-file index probed with ~2k
    // cells (49M bound decodes, measured ~8 s of a 12 s probe).
    val vset: Option[Set[Long]] =
      if (dt == LongType || dt == IntegerType)
        scala.util.Try(values.map(_.toLong).toSet).toOption
      else None
    def pinned(f: PlannedFile): Option[Long] =
      f.partition.get(fieldId) match {
        case Some(v: java.lang.Number) => Some(v.longValue)
        case _ => f.bounds.get(fieldId).flatMap { case (lo, hi) =>
          (decodeBound(dt, lo), decodeBound(dt, hi)) match {
            case (Some(mn: java.lang.Number), Some(mx: java.lang.Number))
                if mn.longValue == mx.longValue => Some(mn.longValue)
            case _ => None
          }
        }
      }
    val keep = p.files.filter { f =>
      vset.flatMap(s => pinned(f).map(s.contains)).getOrElse(
        values.exists(v => fileCanMatch(p, f, colName, Some(v), Some(v))))
    }
    (scanFiles(spark, p, keep), keep.size, p.files.size)
  }

  // ----------------------------------- single-value serialization (spec D)

  /** Encode a stringified column value in Iceberg's single-value binary
    * form (little-endian fixed width for numerics, UTF-8 for strings).
    * Types outside the supported set record no bound (None). */
  /** Iceberg string-bound truncation (spec: `truncate(16)` on string
    * lower/upper bounds). Without it, every manifest entry of a long-text
    * column carries two full document-sized strings — metadata bloat that
    * defeats manifest pruning at exactly the scale it targets. Lower bound
    * = 16-code-point prefix (a prefix is ≤ the value in any consistent
    * order). Upper bound = the prefix with its last incrementable code
    * point bumped — strictly greater than the value. Only code points
    * below the surrogate block (U+D7FF) are bumped, so the result compares
    * identically in UTF-16 (the pruner's String.compareTo) and code-point
    * (the spec's UTF-8 byte) order; when no position can bump (wildly
    * unlikely outside adversarial input) the upper bound is dropped
    * entirely, which every pruner treats as unbounded — conservative. */
  private[graft] val boundTruncWidth = 16

  private[graft] def truncateLowerBound(s: String, w: Int = boundTruncWidth): String =
    if (s.codePointCount(0, s.length) <= w) s
    else s.substring(0, s.offsetByCodePoints(0, w))

  private[graft] def truncateUpperBound(s: String, w: Int = boundTruncWidth): Option[String] =
    if (s.codePointCount(0, s.length) <= w) Some(s)
    else {
      val prefix = s.substring(0, s.offsetByCodePoints(0, w))
      var i = prefix.length
      var out: Option[String] = None
      while (i > 0 && out.isEmpty) {
        val cp    = prefix.codePointBefore(i)
        val start = i - Character.charCount(cp)
        if (cp < 0xD7FF) out = Some(prefix.substring(0, start) + (cp + 1).toChar)
        i = start
      }
      out
    }

  private[graft] def encodeBound(dt: DataType, v: String): Option[Array[Byte]] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int)(f: ByteBuffer => Unit): Array[Byte] = {
      val bb = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN); f(bb); bb.array()
    }
    dt match {
      case IntegerType => Some(le(4)(_.putInt(v.toInt)))
      case LongType    => Some(le(8)(_.putLong(v.toLong)))
      case FloatType   => Some(le(4)(_.putFloat(v.toFloat)))
      case DoubleType  => Some(le(8)(_.putDouble(v.toDouble)))
      case StringType  => Some(v.getBytes("UTF-8"))
      case BooleanType => Some(Array[Byte](if (v.toBoolean) 1 else 0))
      case _           => None
    }
  }

  /** Decode a single-value-serialized bound back to a comparable value. */
  private[graft] def decodeBound(dt: DataType, b: Array[Byte]): Option[Any] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    dt match {
      case IntegerType if b.length == 4 => Some(bb.getInt)
      case LongType if b.length == 8    => Some(bb.getLong)
      // 4-byte bounds under a widened schema: files written before an
      // int->long / float->double type promotion keep their original
      // serialization (the spec never rewrites bounds); widen on decode
      // so promoted columns keep pruning instead of degrading to keep-all
      case LongType if b.length == 4    => Some(bb.getInt.toLong)
      case FloatType if b.length == 4   => Some(bb.getFloat)
      case DoubleType if b.length == 8  => Some(bb.getDouble)
      case DoubleType if b.length == 4  => Some(bb.getFloat.toDouble)
      case StringType                   => Some(new String(b, "UTF-8"))
      case BooleanType if b.length == 1 => Some(b(0) != 0)
      case DateType if b.length == 4    => Some(bb.getInt) // epoch days
      case TimestampType | TimestampNTZType if b.length == 8 =>
        Some(bb.getLong) // epoch micros
      case _                            => None
    }
  }

  /** Spec paths are fully qualified; tolerate relative ones by anchoring at
    * the table location. */
  private def resolve(location: String, p: String): Path =
    if (p.startsWith("/") || p.contains("://")) new Path(p)
    else new Path(new Path(location), p)

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Test-only visibility for avro manifest reads (orphan audits). */
  private[graft] def readAvroForTest(fs: FileSystem, p: Path): Seq[GenericRecord] =
    readAvro(fs, p)

  private def readAvro(fs: FileSystem, p: Path): Seq[GenericRecord] = {
    val in  = new FsInput(p, fs.getConf)
    val rdr = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[GenericRecord]
      while (rdr.hasNext) buf += rdr.next()
      buf.toIndexedSeq
    } finally rdr.close()
  }

  // ------------------------------------------------------------------ writer

  /** One committed file (a parquet file already on disk), optionally with
    * per-field-id [lower, upper] bounds for manifest-level pruning.
    * `content` 0 = data, 1 = position deletes (`file_path`/`pos` rows),
    * 2 = equality deletes (rows of the `equalityIds` columns). */
  final case class DataFileInfo(
      path: String,
      recordCount: Long,
      sizeBytes: Long,
      bounds: Map[Int, (Array[Byte], Array[Byte])] = Map.empty,
      content: Int = 0,
      equalityIds: Seq[Int] = Nil,
      partitionValues: Map[String, Any] = Map.empty, // by partition field name
      splitOffsets: Seq[Long] = Nil, // spec field 132: row-group start offsets, ascending
      nullCounts: Map[Int, Long] = Map.empty, // spec field 110: null counts by field id
      sortOrderId: Option[Int] = None, // spec field 140: order the file was written under
      // v3 deletion vector (spec fields 143-145): the data file this DV
      // applies to, and the blob's [offset, size) inside the Puffin file
      // at `path`. Set => content must be 1 and the entry is a DV.
      dvRef: Option[(String, Long, Long)] = None,
      // v3 row lineage: the file's implicit-id base (spec field 142).
      // None = "assign at commit"; a rewrite that MATERIALIZED the
      // lineage columns into the data sets lineageMaterialized instead
      // (ids travel in the rows, no fresh span consumed).
      firstRowId: Option[Long] = None,
      lineageMaterialized: Boolean = false)

  /** Avro schema of a v2 manifest entry for an unpartitioned table, with
    * the spec's field-ids attached so spec-compliant readers can project
    * by id (manifest_entry / data_file required fields per the spec's
    * "Manifests" table). lower/upper bounds use the spec's map encoding —
    * an array of key/value records (Avro maps can't key by int) holding
    * field-id → single-value-serialized binary. */
  private def manifestEntrySchemaFor(partitionFields: Seq[(String, String, Int)]): Schema = {
    val pf = partitionFields.map { case (name, avroType, fieldId) =>
      s"""{"name":"$name","type":["null","$avroType"],"default":null,"field-id":$fieldId}"""
    }.mkString(",")
    new Schema.Parser().parse(manifestEntryTemplate.replace("__PARTITION_FIELDS__", pf))
  }

  private val manifestEntryTemplate: String =
    """{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","field-id":134},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[__PARTITION_FIELDS__]}},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104},
        {"name":"lower_bounds","field-id":125,"default":null,"type":["null",
          {"type":"array","logicalType":"map","items":{"type":"record","name":"k126_v127","fields":[
            {"name":"key","type":"int","field-id":126},
            {"name":"value","type":"bytes","field-id":127}]}}]},
        {"name":"upper_bounds","field-id":128,"default":null,"type":["null",
          {"type":"array","logicalType":"map","items":{"type":"record","name":"k129_v130","fields":[
            {"name":"key","type":"int","field-id":129},
            {"name":"value","type":"bytes","field-id":130}]}}]},
        {"name":"null_value_counts","field-id":110,"default":null,"type":["null",
          {"type":"array","logicalType":"map","items":{"type":"record","name":"k121_v122","fields":[
            {"name":"key","type":"int","field-id":121},
            {"name":"value","type":"long","field-id":122}]}}]},
        {"name":"split_offsets","field-id":132,"default":null,"type":["null",
          {"type":"array","items":"long","element-id":133}]},
        {"name":"equality_ids","field-id":135,"default":null,"type":["null",
          {"type":"array","items":"int","element-id":136}]},
        {"name":"sort_order_id","field-id":140,"default":null,"type":["null","int"]},
        {"name":"referenced_data_file","field-id":143,"default":null,"type":["null","string"]},
        {"name":"content_offset","field-id":144,"default":null,"type":["null","long"]},
        {"name":"content_size_in_bytes","field-id":145,"default":null,"type":["null","long"]},
        {"name":"first_row_id","field-id":142,"default":null,"type":["null","long"]}
      ]}}]}""".replaceAll("\n\\s*", "")

  /** Avro schema of a manifest-list entry (spec "Manifest Lists" table). */
  private val manifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_files_count","type":"int","field-id":504},
      {"name":"existing_files_count","type":"int","field-id":505},
      {"name":"deleted_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514},
      {"name":"partitions","field-id":507,"default":null,"type":["null",
        {"type":"array","element-id":508,"items":{"type":"record","name":"field_summary","fields":[
          {"name":"contains_null","type":"boolean","field-id":509},
          {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
          {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
          {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
        ]}}]}
    ]}""".replaceAll("\n\\s*", ""))

  /** Iceberg schema JSON for a flat Spark schema. Top-level ids default to
    * the positional 1..n layout this writer historically produced; a
    * restored externally-written table passes its REAL (possibly sparse —
    * dropped-column history) ids and they re-emit verbatim. Nested ids
    * continue after the max top-level id. */
  private def icebergSchemaJson(
      schema: StructType, schemaId: Int = 0, topIds: Seq[Int] = Nil,
      nestedIds: Map[String, Int] = Map.empty,
      defaults: Map[Int, String] = Map.empty): String = {
    val ids = if (topIds.nonEmpty) topIds else 1 to schema.fields.length
    require(ids.length == schema.fields.length,
      s"field id count ${ids.length} != column count ${schema.fields.length}")
    // nested ids come from the tracked map (stable across evolution); a
    // caller without one gets the legacy positional derivation — which is
    // IDENTICAL for the fresh-table case the default serves
    val nested = if (nestedIds.nonEmpty) nestedIds else deriveNestedIds(schema, ids)
    val idOf = (p: String) => nested.getOrElse(p,
      throw new IllegalStateException(s"no tracked field id for nested path $p"))
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      // v3 default values: pre-evolution files read `initial-default`
      // instead of null; `write-default` documents the insert-side value
      val dflt = defaults.get(ids(i))
        .map(j => s""","initial-default":$j,"write-default":$j""").getOrElse("")
      s"""{"id":${ids(i)},"name":"${f.name}","required":${!f.nullable},"type":${typeJson(f.dataType, s"${f.name}.", idOf)}$dflt}"""
    }
    s"""{"type":"struct","schema-id":$schemaId,"fields":[${fields.mkString(",")}]}"""
  }

  /** Iceberg JSON single-value literal for a default (spec Appendix D
    * JSON serialization): numbers plain, strings quoted, date as its ISO
    * string. Primitives only — what ADD COLUMN ... DEFAULT supports. */
  private[icelite] def defaultJson(dt: DataType, v: Any): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    (dt, v) match {
      case (BooleanType, b: Boolean)            => b.toString
      case (IntegerType, n: Int)                => n.toString
      case (LongType, n: Long)                  => n.toString
      case (LongType, n: Int)                   => n.toString
      case (FloatType, n: Float)                => n.toString
      case (DoubleType, n: Double)              => n.toString
      case (StringType, s: String)              => "\"" + esc(s) + "\""
      case (DateType, d: java.sql.Date)         => "\"" + d.toLocalDate.toString + "\""
      case (DateType, d: java.time.LocalDate)   => "\"" + d.toString + "\""
      case (t, x) => throw new IllegalArgumentException(
        s"unsupported DEFAULT ${Option(x).map(_.getClass.getSimpleName).getOrElse("null")} " +
          s"for ${t.catalogString} (primitive defaults only)")
    }
  }

  /** Decode a field's `initial-default` JSON back to the Scala value a
    * `lit()` can carry. */
  private[graft] def decodeDefault(dt: DataType, j: JValue): Any = (dt, j) match {
    case (BooleanType, JBool(b))   => b
    case (IntegerType, JInt(n))    => n.toInt
    case (LongType, JInt(n))       => n.toLong
    case (FloatType, JDouble(n))   => n.toFloat
    case (FloatType, JInt(n))      => n.toFloat
    case (DoubleType, JDouble(n))  => n.toDouble
    case (DoubleType, JInt(n))     => n.toDouble
    case (StringType, JString(s))  => s
    case (DateType, JString(s))    => java.sql.Date.valueOf(s)
    case (t, other) => throw new IllegalArgumentException(
      s"cannot decode default $other as ${t.catalogString}")
  }

  /** A writer session for committing genuine Iceberg v2 metadata over
    * already-written parquet data files. Each `commit` appends a snapshot
    * (carrying prior manifests by pointer, as the spec intends) and writes
    * `v<N>.metadata.json` + `version-hint.text`. Single-writer, fixed
    * timestamps for reproducible fixtures. */
  /** Write `df` as ONE parquet file at `loc/data/<name>.parquet` (staged
    * through a temp dir under `stagingDir`, then renamed) and return its
    * manifest entry. The single-partition write preserves the caller's
    * sort order, which makes file positions deterministic — the property
    * position deletes address. */
  /** `schema` with `parquet.field.id` metadata on every top-level field —
    * the key Spark's parquet paths honor on BOTH sides: the writer stamps
    * the ids into the file schema (`spark.sql.parquet.fieldId.write
    * .enabled`, default on), and a reader with
    * `spark.sql.parquet.fieldId.read.enabled` resolves file columns by id
    * instead of name. Id resolution is what makes RENAME/DROP COLUMN
    * readable across old files (spec "Column Projection": names are
    * display only, identity is the field id). */
  private[graft] def withParquetFieldIds(
      schema: StructType, ids: Seq[Int],
      nestedIds: Map[String, Int] = Map.empty): StructType = {
    require(ids.length == schema.fields.length,
      s"field id count ${ids.length} != column count ${schema.fields.length}")
    // nested STRUCT fields carry their tracked ids too (Spark's parquet
    // reader and writer both honor `parquet.field.id` metadata at any
    // struct depth — that's what makes a nested rename bind old files'
    // subfields by id). List/map positions can't carry StructField
    // metadata; their ids live only in the schema JSON and manifests.
    def deep(dt: DataType, prefix: String): DataType = dt match {
      case st: StructType =>
        StructType(st.fields.map { f =>
          val path = prefix + f.name
          val withId = nestedIds.get(path) match {
            case Some(id) => f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata).putLong("parquet.field.id", id.toLong).build())
            case None => f
          }
          withId.copy(dataType = deep(f.dataType, s"$path."))
        })
      case at: ArrayType => at.copy(elementType = deep(at.elementType, prefix + "element."))
      case mt: MapType => mt.copy(
        keyType = deep(mt.keyType, prefix + "key."),
        valueType = deep(mt.valueType, prefix + "value."))
      case p => p
    }
    StructType(schema.fields.zip(ids).map { case (f, id) =>
      f.copy(
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata).putLong("parquet.field.id", id.toLong).build(),
        dataType = if (nestedIds.isEmpty) f.dataType else deep(f.dataType, s"${f.name}."))
    })
  }

  /** Companion session for read-by-id scans, cached one per parent session.
    *
    * `spark.sql.parquet.fieldId.read.enabled` must be live when the scan
    * EXECUTES (ParquetFileFormat re-reads it from the session conf at
    * reader-build time, clobbering per-read options), and the DataFrames
    * these paths return are lazy — so a save/restore around construction
    * can't scope it, and setting it on the caller's session leaks: it
    * silently changes column-binding semantics for any other id-carrying
    * schema read in the same session. Instead, build the scan relation
    * under a `newSession()` twin with the flag on: a file relation captures
    * its creating session (`HadoopFsRelation.sparkSession` is what
    * FileSourceScanExec hands to `buildReaderWithPartitionValues`), so the
    * flag applies to exactly these scans — composing them into plans driven
    * by the parent session works, and the parent's conf is never touched.
    * The parent's live conf is mirrored at creation so plan shape
    * (shuffle partitions, AQE, parquet reader knobs) is identical. */
  private val idReadSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()
  private[graft] def idReadSession(parent: SparkSession): SparkSession =
    idReadSessions.computeIfAbsent(parent, p => {
      val ns = p.newSession()
      p.conf.getAll.foreach { case (k, v) =>
        try ns.conf.set(k, v) catch { case _: Throwable => () } // static confs refuse
      }
      ns.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      ns
    })

  /** `df` with its top-level columns re-aliased to carry `parquet.field.id`
    * metadata, so the parquet files this write produces are id-stamped.
    * Purely additive: name-based readers are unaffected. */
  private[graft] def stampFieldIds(
      df: DataFrame, ids: Seq[Int], nestedIds: Map[String, Int] = Map.empty): DataFrame = {
    // nested struct ids ride the CAST's target type metadata (Spark's
    // parquet writer reads parquet.field.id off nested StructFields);
    // default = the same positional assignment the schema JSON gets
    val nested  = if (nestedIds.nonEmpty) nestedIds else deriveNestedIds(df.schema, ids)
    val stamped = withParquetFieldIds(df.schema, ids, nested)
    df.select(stamped.fields.map { f =>
      val c = org.apache.spark.sql.functions.col(f.name)
      // cast is a no-op for flat columns (identical type) and a metadata-
      // carrying rebuild for nested ones — the writer sees the stamped type
      val typed = if (f.dataType == df.schema(f.name).dataType) c else c.cast(f.dataType)
      typed.as(f.name, f.metadata)
    }.toIndexedSeq: _*)
  }

  /** Batched twin of [[writeSingleFile]] for lifecycle fixtures that
    * commit one file per group value: ONE staged Spark job writes every
    * group's parquet file (hash-partitioned on the group expression so a
    * group lands wholly in one task; dynamic-partition write emits one
    * file per group per task), each file is renamed to
    * `loc/data/<nameOf(group)>.parquet`, and manifest entries come from
    * the same footer read [[writeSingleFile]] uses. A loop of N
    * writeSingleFile calls costs N full job round-trips (~40-80 ms each
    * of scheduler/plan fixed cost at any data size — ic89's 24-commit
    * evolution lifecycle spent more time BETWEEN jobs than in them);
    * this pays one. Group values must stringify safely as partition
    * directory names (ints/short tokens — fixture keys, not user data).
    * Commit granularity is untouched: callers still commit the returned
    * files one (or few) at a time, so snapshot history is identical. */
  def writeGroupedFiles(spark: SparkSession, stagingDir: String, loc: String,
      df: DataFrame, groupExpr: org.apache.spark.sql.Column,
      nameOf: String => String, fieldIds: Seq[Int] = Nil): Map[String, DataFileInfo] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs   = new Path(loc).getFileSystem(conf)
    val stampIds = if (fieldIds.nonEmpty) fieldIds else 1 to df.schema.fields.length
    val stage = s"$stagingDir/stage_grouped"
    stampFieldIds(df, stampIds)
      .withColumn("__grp", groupExpr.cast("string"))
      .repartition(spark.sparkContext.defaultParallelism,
        org.apache.spark.sql.functions.col("__grp"))
      .write.partitionBy("__grp").mode("overwrite").parquet(stage)
    val dirs = fs.listStatus(new Path(stage)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__grp="))
    fs.mkdirs(new Path(s"$loc/data"))
    val out = dirs.map { st =>
      val g     = st.getPath.getName.stripPrefix("__grp=")
      val parts = fs.listStatus(st.getPath).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      require(parts.length == 1,
        s"group $g split across ${parts.length} files — hash repartition broken")
      val dest = new Path(s"$loc/data/${nameOf(g)}.parquet")
      require(fs.rename(parts.head, dest), s"stage rename failed for group $g")
      g -> fileInfoFromFooter(spark, dest, df.schema, fieldIds = fieldIds)
    }.toMap
    fs.delete(new Path(stage), true)
    out
  }

  def writeSingleFile(spark: SparkSession, stagingDir: String, loc: String, name: String,
      df: DataFrame, content: Int = 0, equalityIds: Seq[Int] = Nil,
      fieldIds: Seq[Int] = Nil, nestedIds: Map[String, Int] = Map.empty): DataFileInfo = {
    val fs  = new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = s"$stagingDir/stage_$name"
    // stamp parquet field ids (positional when the caller didn't pass a
    // sparse layout; the spec-reserved pair for position-delete files) —
    // costs nothing, and makes every file this path writes resolvable by
    // id after a rename/drop evolution
    val stampIds =
      if (fieldIds.nonEmpty) fieldIds
      else if (content == 1 && df.schema.fieldNames.sameElements(Array("file_path", "pos")))
        Seq(PosDeletePathFieldId, PosDeletePosFieldId)
      else if (content == 2 && equalityIds.length == df.schema.fields.length)
        equalityIds // an equality-delete file's columns ARE the key fields
      else 1 to df.schema.fields.length
    stampFieldIds(df, stampIds, nestedIds).coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val dest = new Path(s"$loc/data/$name.parquet")
    fs.mkdirs(dest.getParent)
    require(fs.rename(part, dest), s"stage rename failed for $name")
    fs.delete(new Path(tmp), true)
    fileInfoFromFooter(spark, dest, df.schema, content, equalityIds, fieldIds)
  }

  /** Manifest entry for an already-written parquet file: ONE footer read
    * yields split_offsets (spec field 132), the exact row count, and
    * per-column null counts (spec field 110 — parquet chunk statistics
    * record numNulls exactly): no second pass over the data for stats,
    * ever. Null-count keys default to the positional 1..n id layout;
    * sparse-id callers pass real ids. */
  private[graft] def fileInfoFromFooter(spark: SparkSession, dest: Path, schema: StructType,
      content: Int = 0, equalityIds: Seq[Int] = Nil,
      fieldIds: Seq[Int] = Nil): DataFileInfo = {
    val fs  = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = if (fieldIds.nonEmpty) fieldIds else 1 to schema.fields.length
    require(ids.length == schema.fields.length, "field id count != column count")
    val (offsets, rows, nullCounts) = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val fr = ParquetFileReader.open(HadoopInputFile.fromPath(dest,
        spark.sparkContext.hadoopConfiguration))
      try {
        val blocks = fr.getFooter.getBlocks.asScala.toSeq
        val offs   = blocks.map(_.getStartingPos)
        val nRows  = blocks.map(_.getRowCount).sum
        // only FLAT (primitive) columns: a leaf chunk's numNulls equals
        // the column's null count exactly then; nested columns record no
        // stat (absent = conservative for the IS [NOT] NULL pruner)
        val flat = schema.fields.zipWithIndex.collect {
          case (f, i) if !f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] &&
            !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
            !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] =>
            f.name -> i
        }.toMap
        val acc  = new Array[Long](schema.fields.length)
        val seen = new Array[Boolean](schema.fields.length)
        java.util.Arrays.fill(seen, true)
        blocks.foreach(_.getColumns.asScala.foreach { c =>
          val path = c.getPath.toArray
          if (path.length == 1) flat.get(path(0)).foreach { i =>
            val st = c.getStatistics
            if (st == null || !st.isNumNullsSet) seen(i) = false
            else acc(i) += st.getNumNulls
          }
        })
        val ncs = (if (content == 0) flat.values.toSeq else Nil)
          .filter(seen(_)).map(i => ids(i) -> acc(i)).toMap
        (offs, nRows, ncs)
      } finally fr.close()
    }
    DataFileInfo(dest.toString, rows, fs.getFileStatus(dest).getLen,
      content = content, equalityIds = equalityIds, splitOffsets = offsets,
      nullCounts = nullCounts)
  }

  /** Avro primitive for an identity partition value in the manifest's
    * partition record. */
  private def avroPrimitive(dt: DataType): String = dt match {
    case IntegerType => "int"
    case LongType    => "long"
    case FloatType   => "float"
    case DoubleType  => "double"
    case BooleanType => "boolean"
    case StringType  => "string"
    case other =>
      throw new UnsupportedOperationException(s"identity partition on $other not supported")
  }

  final class Writer(
      spark: SparkSession,
      val location: String,
      schema: StructType,
      partitionBy: Seq[String] = Nil, // identity-transform partition columns
      tableUuid: String = "11111111-2222-3333-4444-555555555555",
      // in-place REPLACE support: number new metadata JSONs above the old
      // table's versions and tag manifest/list names so nothing the old
      // snapshot references is overwritten before the hint flips — the
      // superseded files are deleted only AFTER the new hint is live
      startVersion: Int = 0,
      fileTag: String = "",
      // REAL top-level field ids (possibly SPARSE — a dropped-column
      // history leaves gaps); empty = the positional 1..n layout this
      // writer produces for fresh tables
      topLevelFieldIds: Seq[Int] = Nil) {

    private val tagSuffix = if (fileTag.isEmpty) "" else s"-$fileTag"

    private val fs = new Path(location).getFileSystem(spark.sparkContext.hadoopConfiguration)
    private val metadataDir = new Path(location, "metadata")
    private val ts0 = 1704067200000L // fixed epoch (2024-01-01) — deterministic fixtures

    // partition fields from `partitionBy` entries: a bare column name is
    // an identity transform; "bucket(N, col)" is the spec bucket[N]
    // transform (partition field named col_bucket, int-typed bucket id);
    // "years(col)"/"months(col)"/"days(col)"/"hours(col)" are the spec
    // temporal transforms (int, epoch-relative); "truncate(W, col)" is
    // truncate[W] (source-typed width-floor). Spec partition field-ids
    // start at 1000.
    private case class SpecField(
        name: String, sourceId: Int, fieldId: Int, transform: String, avroType: String)
    private val BucketPat   = raw"bucket\((\d+)\s*,\s*(\w+)\)".r
    private val TemporalPat = raw"(years|months|days|hours)\((\w+)\)".r
    private val TruncPat    = raw"truncate\((\d+)\s*,\s*(\w+)\)".r
    private def parseSpec(pb: Seq[String], against: StructType, againstIds: Seq[Int],
        baseFieldId: Int): Seq[SpecField] =
      pb.zipWithIndex.map { case (c, i) =>
        def colIdx(colName: String): Int = {
          val idx = against.fieldNames.indexOf(colName)
          require(idx >= 0, s"partition column $colName not in schema")
          idx
        }
        // source-id = the column's REAL field id (sparse after drops)
        def src(colName: String): Int = againstIds(colIdx(colName))
        c match {
          case BucketPat(n, colName) =>
            SpecField(s"${colName}_bucket", src(colName), baseFieldId + i, s"bucket[$n]", "int")
          case TemporalPat(unit, colName) =>
            val tr = unit.stripSuffix("s") // spec transform names are singular
            SpecField(s"${colName}_$tr", src(colName), baseFieldId + i, tr, "int")
          case TruncPat(w, colName) =>
            val srcType = against.fields(colIdx(colName)).dataType
            require(Seq(IntegerType, LongType, StringType).contains(srcType),
              s"truncate[$w] unsupported on $srcType")
            SpecField(s"${colName}_trunc", src(colName), baseFieldId + i, s"truncate[$w]",
              avroPrimitive(srcType))
          case colName =>
            SpecField(colName, src(colName), baseFieldId + i, "identity",
              avroPrimitive(against.fields(colIdx(colName)).dataType))
        }
      }
    // per-schema top-level field ids, index = schema-id (positional 1..n
    // for writer-born tables; verbatim — possibly sparse — for restored
    // externally-written ones). MUST initialize before `specs`: parseSpec
    // resolves source ids through it.
    private var allFieldIds: List[Seq[Int]] = List(
      if (topLevelFieldIds.nonEmpty) topLevelFieldIds else 1 to schema.fields.length)
    private def currentFieldIds: Seq[Int] = allFieldIds.last
    // per-schema NESTED field ids (path -> id, index = schema-id): the
    // source of truth keeping nested ids STABLE across evolution — the
    // positional re-derivation this replaces renumbered every nested
    // field whenever the schema changed shape (see deriveNestedIds).
    private var allNestedIds: List[Map[String, Int]] =
      List(deriveNestedIds(schema, allFieldIds.head))
    private def currentNestedIds: Map[String, Int] = allNestedIds.last
    // highest field id EVER allocated, at any nesting level — dropped ids
    // retire forever (allocating from the live max would re-issue them
    // and resurrect dropped values through read-by-id)
    private def maxFieldIdEver: Int =
      (allFieldIds.flatten ++ allNestedIds.flatMap(_.values) ++ Seq(0)).max
    // all partition specs ever active, index = spec-id; commits use the
    // DEFAULT spec (tracked separately — commitDelta may append an
    // auxiliary unpartitioned spec past it without changing the default)
    private var specs: List[Seq[SpecField]] =
      List(parseSpec(partitionBy, schema, allFieldIds.head, 1000))
    private var defaultSpec: Int = specs.size - 1
    private def defaultSpecId: Int = defaultSpec
    private def currentSpecFields: Seq[SpecField] = specs(defaultSpec)

    /** Whether the default spec partitions — a rewrite that stages files
      * without partition tuples must refuse a partitioned table. */
    def defaultSpecIsPartitioned: Boolean = currentSpecFields.nonEmpty
    private def specJson(sf: Seq[SpecField]): String = sf.map(f =>
      s"""{"name":"${f.name}","transform":"${f.transform}","source-id":${f.sourceId},"field-id":${f.fieldId}}""")
      .mkString(",")
    private def entrySchemaOf(specId: Int): Schema = manifestEntrySchemaFor(
      specs(specId).map(f => (f.name, f.avroType, f.fieldId)))

    /** Partition-spec evolution, the spec way: the metadata keeps EVERY
      * historical spec in `partition-specs` and bumps `default-spec-id`;
      * already-committed manifests keep their original spec id in the
      * manifest list (their files stay laid out — and pruned — by the old
      * spec), and only new commits use the new one. Partition field ids
      * stay unique across specs (fresh ids continue past every prior
      * spec's). Sources resolve against the CURRENT schema, so a column
      * added by evolveSchema can become a partition source. */
    def evolveSpec(newPartitionBy: Seq[String]): Unit = {
      // fresh ids continue past the MAX existing field id (not a count —
      // restored externally-written specs may be sparse)
      val nextBase = (specs.flatten.map(_.fieldId) :+ 999).max + 1
      specs = specs :+ parseSpec(newPartitionBy, currentSchema, currentFieldIds, nextBase)
      defaultSpec = specs.size - 1
    }

    private var version = startVersion
    // snapshot ids (= sequence numbers) are MONOTONE FOREVER, never
    // recycled: `committed.size + 1` would re-issue the ids of expired
    // snapshots, re-using their manifest/list names (a rename-as-CAS
    // conflict with the tombstoned files) and rewinding sequence numbers
    // the spec requires to only grow
    private var lastSnapId = 0L
    // historical schemas, index = schema-id; commits use the last (current)
    private var allSchemas = List(schema)
    private def currentSchema: StructType = allSchemas.last
    // flips on rename/drop evolution; published as the `graft.read-by-id`
    // table property so readers resolve file columns by parquet field id
    private var readById: Boolean = false
    private var committed = List.empty[(Long, String)] // (snapshotId, manifestListPath)
    // summary.operation per snapshot id; absent = "append". Row-delta
    // commits publish delete/overwrite, rewrites publish replace — the
    // spec's summary contract, which changelog consumers key off.
    private var snapOps = Map.empty[Long, String]
    // schema-id each snapshot committed under; absent = 0. A snapshot
    // after an evolveSchema/rename/drop must not claim the original
    // schema id.
    private var snapSchemaIds = Map.empty[Long, Int]
    private case class ManifestRec(path: String, len: Long, addedBy: Long, seq: Long,
        content: Int, nFiles: Int, nRows: Long, specId: Int, existing: Boolean = false,
        summaries: Option[Seq[FieldSummary]] = None)
    private var manifests = List.empty[ManifestRec]
    // registered sort orders (spec §Sort Orders): order-id -> identity
    // sort fields as (source-id, direction, null-order). Order 0
    // (unsorted) is implicit; declared orders publish in every metadata
    // JSON and the current default is what sorted rewrites' files claim.
    private var sortOrders = List.empty[(Int, Seq[(Int, String, String)])]
    private var defaultSortOrderId = 0

    /** Register (or find) the identity sort order over `cols` asc/
      * nulls-first and make it the table default — what a sorted
      * rewrite_data_files declares so external readers can DISCOVER the
      * clustering instead of every metadata JSON claiming "unsorted".
      * Returns the order id to stamp into the rewritten files'
      * `sort_order_id` (DataFileInfo). */
    def declareSortOrder(cols: Seq[String]): Int = {
      require(cols.nonEmpty, "need at least one sort column")
      val idx = currentSchema.fieldNames
      val fields = cols.map { c =>
        val i = idx.indexOf(c)
        require(i >= 0, s"no column $c to sort by")
        (currentFieldIds(i), "asc", "nulls-first")
      }
      val id = sortOrders.find(_._2 == fields).map(_._1).getOrElse {
        val next = sortOrders.map(_._1).foldLeft(0)(math.max) + 1
        sortOrders = sortOrders :+ (next -> fields)
        next
      }
      defaultSortOrderId = id
      id
    }

    /** Restore declared sort orders (resumeWriter path) so the next
      * writeMetadata re-emits them instead of silently dropping the
      * table's clustering record. */
    private[icelite] def setSortOrders(
        orders: List[(Int, Seq[(Int, String, String)])], defaultId: Int): Unit = {
      sortOrders = orders
      defaultSortOrderId = defaultId
    }

    /** Re-point the default at order 0 (unsorted) — an export whose
      * source default is not spec-expressible keeps its declared orders
      * discoverable without claiming one as the table default. */
    private[icelite] def clearDefaultSortOrder(): Unit = defaultSortOrderId = 0

    // free-form table properties (spec `properties` map) — e.g.
    // `graft.clustering` records a z-order layout the spec's sort orders
    // can't express (claiming identity would assert an order the files
    // don't have; a property is honest AND discoverable)
    private var extraProps = Map.empty[String, String]
    def setProperty(k: String, v: String): Unit = extraProps += (k -> v)

    // registered table-statistics files (spec `statistics`): Puffin NDV
    // sketches per analyzed snapshot (TableStats.analyze). At most one
    // entry per snapshot; emission drops entries whose snapshot has
    // expired (the spec's GC contract for statistics).
    private var statsRecs = List.empty[StatsEntry]

    /** Register (or replace) the statistics file for a snapshot and
      * publish a new metadata version — one metadata CAS. */
    def recordStatistics(e: StatsEntry): Unit = {
      require(committed.exists(_._1 == e.snapshotId),
        s"statistics target snapshot ${e.snapshotId} is not in the log")
      statsRecs = statsRecs.filterNot(_.snapshotId == e.snapshotId) :+ e
      writeMetadata()
    }

    private[icelite] def setStatistics(rs: List[StatsEntry]): Unit = statsRecs = rs

    // v3 ROW LINEAGE allocator: the next unassigned implicit row id
    // (spec `next-row-id`); per-snapshot bases for the metadata record
    private var nextRowId: Long = 0L
    private var snapFirstRow = Map.empty[Long, Long]
    private[icelite] def setRowLineage(next: Long, bases: Map[Long, Long]): Unit = {
      nextRowId = next; snapFirstRow = bases
    }

    // registered PARTITION-statistics files (spec `partition-statistics`):
    // one per computed snapshot, replace-on-recompute, dropped with an
    // expired snapshot — same lifecycle as `statistics` above.
    private var partStatsRecs = List.empty[PartitionStatsEntry]

    def recordPartitionStatistics(e: PartitionStatsEntry): Unit = {
      require(committed.exists(_._1 == e.snapshotId),
        s"partition-statistics target snapshot ${e.snapshotId} is not in the log")
      partStatsRecs = partStatsRecs.filterNot(_.snapshotId == e.snapshotId) :+ e
      writeMetadata()
    }

    private[icelite] def setPartitionStatistics(rs: List[PartitionStatsEntry]): Unit =
      partStatsRecs = rs

    // v3 DEFAULT VALUES: field id -> Iceberg JSON single-value literal,
    // emitted as `initial-default` + `write-default` on the field in
    // every schema version that carries it. `initial-default` is what
    // pre-evolution files read for the column INSTEAD of null — the
    // metadata-only backfill the v3 spec added; an explicit null written
    // after the evolution stays null (presence in the file decides).
    private var fieldDefaults = Map.empty[Int, String]

    /** Declare the initial/write default of (existing, top-level) column
      * `colName`. Callers evolve the schema first (ADD COLUMN), then
      * attach the default before publishing. */
    def setInitialDefault(colName: String, value: Any): Unit = {
      val idx = currentSchema.fieldNames.indexOf(colName)
      require(idx >= 0, s"no column $colName to default")
      fieldDefaults += (currentFieldIds(idx) ->
        defaultJson(currentSchema.fields(idx).dataType, value))
    }

    private[icelite] def setDefaults(ds: Map[Int, String]): Unit = fieldDefaults = ds
    private[icelite] def defaultsNow: Map[Int, String] = fieldDefaults

    // -------- partition summaries (manifest-list field 507): fold a
    // manifest's per-file partition values into per-spec-field
    // (contains_null, lower, upper) so planners skip whole manifests
    private def partCmp(avroType: String, a: Any, b: Any): Int = avroType match {
      case "int" | "long" =>
        java.lang.Long.compare(a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)
      case "float" | "double" =>
        java.lang.Double.compare(a.asInstanceOf[Number].doubleValue, b.asInstanceOf[Number].doubleValue)
      case "boolean" =>
        java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
      case _ => a.toString.compareTo(b.toString)
    }

    /** Single-value serialization of a partition value (spec Appendix D —
      * same encoding as column bounds). None for unencodable types: the
      * summary then records no bound and the manifest is never pruned. */
    private def encodePartValue(avroType: String, v: Any): Option[Array[Byte]] = {
      import java.nio.{ByteBuffer, ByteOrder}
      def le(n: Int)(f: ByteBuffer => Unit): Array[Byte] = {
        val bb = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN); f(bb); bb.array()
      }
      avroType match {
        case "int"     => Some(le(4)(_.putInt(v.asInstanceOf[Number].intValue)))
        case "long"    => Some(le(8)(_.putLong(v.asInstanceOf[Number].longValue)))
        case "float"   => Some(le(4)(_.putFloat(v.asInstanceOf[Number].floatValue)))
        case "double"  => Some(le(8)(_.putDouble(v.asInstanceOf[Number].doubleValue)))
        case "string"  => Some(v.toString.getBytes("UTF-8"))
        case "boolean" => Some(Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0))
        case _         => None
      }
    }

    /** Summaries for one manifest from each file's partition-value lookup
      * (None result = null partition value). None overall when the spec is
      * unpartitioned — field 507 is then omitted. */
    private def summarize(
        specFields: Seq[SpecField], values: Seq[String => Option[Any]]): Option[Seq[FieldSummary]] =
      if (specFields.isEmpty) None
      else Some(specFields.map { sf =>
        val vs = values.map(_(sf.name))
        val present = vs.flatten
        val containsNull = present.size < vs.size
        if (present.isEmpty) FieldSummary(containsNull, None, None)
        else FieldSummary(containsNull,
          encodePartValue(sf.avroType, present.minBy(identity)(Ordering.fromLessThan(
            (a: Any, b: Any) => partCmp(sf.avroType, a, b) < 0))),
          encodePartValue(sf.avroType, present.maxBy(identity)(Ordering.fromLessThan(
            (a: Any, b: Any) => partCmp(sf.avroType, a, b) < 0))))
      })

    // files successfully created by the current commit attempt — the
    // rollback set a losing optimistic commit deletes (exclusively
    // created via no-clobber, so every tracked file is this attempt's own)
    private var attemptCreated: List[Path] = Nil

    /** Run one optimistic commit attempt: on a lost race
      * (ConcurrentModificationException from any no-clobber write), delete
      * every file this attempt created, restore the writer's in-memory
      * snapshot state, and rethrow — the caller resumes from the winner's
      * metadata and retries (see [[IcebergFormat.appendWithRetry]]). */
    private def withCommitRollback[T](body: => T): T = {
      val (m0, c0, v0, s0) = (manifests, committed, version, lastSnapId)
      attemptCreated = Nil
      try body catch {
        case e: java.util.ConcurrentModificationException =>
          attemptCreated.foreach(p =>
            try fs.delete(p, false) catch { case _: Throwable => () })
          manifests = m0; committed = c0; version = v0; lastSnapId = s0
          throw e
      }
    }

    private def writeAvroFile(p: Path, schema: Schema, records: Seq[GenericRecord],
        meta: Map[String, String], noClobber: Boolean = false): Long = {
      // temp (uuid-named: concurrent writers may target the same final
      // name) + rename so a failed write can't leave a truncated avro
      // file at its final name; the writer (and its FS stream) always
      // closes
      val tmp = new Path(p.getParent,
        p.getName + "." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      try {
        meta.foreach { case (k, v) => w.setMeta(k, v) }
        w.create(schema, fs.create(tmp, true))
        records.foreach(w.append)
      } finally w.close()
      if (noClobber) {
        // claim-as-CAS: snapshot-scoped names (manifests, manifest
        // lists) are claimed exactly once; a second writer racing the
        // same snapshot id loses HERE, before any published metadata
        // can point at overwritten files
        if (!claimExactlyOnce(tmp, p)) {
          fs.delete(tmp, false)
          throw new java.util.ConcurrentModificationException(
            s"concurrent commit to $location: ${p.getName} already exists; " +
              "resume the writer from current metadata and retry")
        }
        // only exclusively-claimed files may enter the rollback set: a
        // path that pre-existed is someone else's committed artifact
        attemptCreated = p :: attemptCreated
      } else {
        if (fs.exists(p)) fs.delete(p, false)
        require(fs.rename(tmp, p), s"avro commit rename failed: $tmp -> $p")
      }
      fs.getFileStatus(p).getLen
    }

    /** Atomically promote `tmp` to `dst` iff `dst` does not exist.
      * Local paths get a TRUE cross-process CAS: hard-link creation is
      * O_EXCL-atomic on POSIX (EEXIST when another process got there
      * first) — plain rename(2) would silently REPLACE the winner's
      * file. Non-local filesystems fall back to exists+rename under a
      * per-path JVM lock (exact within one driver; multi-driver safety
      * there needs a conditional-put store, see IceTable's
      * conditionalPutSchemes). */
    private def claimExactlyOnce(tmp: Path, dst: Path): Boolean = {
      val scheme = Option(dst.toUri.getScheme).getOrElse("file")
      if (scheme == "file") {
        import java.nio.file.{Files, Paths, FileAlreadyExistsException}
        try {
          Files.createLink(Paths.get(dst.toUri.getPath), Paths.get(tmp.toUri.getPath))
          fs.delete(tmp, false)
          true
        } catch {
          case _: FileAlreadyExistsException => false
          case _: java.nio.file.FileSystemException if fs.exists(dst) => false
        }
      } else IceTable.commitLock(dst.toString).synchronized {
        !fs.exists(dst) && fs.rename(tmp, dst)
      }
    }

    /** Additive schema evolution for subsequent commits, the spec way:
      * the metadata JSON keeps EVERY historical schema in `schemas` and
      * bumps `current-schema-id`; appended columns take fresh (higher)
      * field ids, existing columns keep theirs, and readers project old
      * data files through the current schema, null-filling the columns
      * those files predate. Existing columns may also WIDEN int→long /
      * float→double in place — the spec's primitive type promotions —
      * keeping their field ids; readers widen old files' chunks (and
      * their 4-byte bounds, see decodeBound) natively. Renames/drops/
      * narrowing retypes would need id-mapped projection and are
      * refused. */
    def evolveSchema(newSchema: StructType): Unit = {
      val cur = currentSchema
      require(newSchema.fields.take(cur.fields.length).zip(cur.fields).forall {
        case (n, o) => n.name == o.name && (n.dataType == o.dataType ||
          ((o.dataType, n.dataType) match {
            case (IntegerType, LongType) | (FloatType, DoubleType) => true
            case _                                                 => false
          }))
      } && newSchema.fields.length >= cur.fields.length,
        "only append-at-end or widening (int->long, float->double) schema evolution is supported")
      // appended columns take fresh ids past the MAX EVER allocated at
      // any nesting level (sparse histories keep their gaps; new top ids
      // never collide with a live nested id — the positional scheme this
      // replaces could hand an appended column a nested field's id)
      val maxId = maxFieldIdEver
      val fresh = (1 to (newSchema.fields.length - cur.fields.length)).map(_ + maxId)
      allFieldIds = allFieldIds :+ (currentFieldIds ++ fresh)
      // existing nested ids carry UNCHANGED; appended columns' nested
      // trees (if any) take fresh ids past the new max
      val appended = StructType(newSchema.fields.drop(cur.fields.length))
      val newNested = deriveNestedIds(appended, Seq(maxId + fresh.length))
      allNestedIds = allNestedIds :+ (currentNestedIds ++ newNested)
      allSchemas = allSchemas :+ newSchema
    }

    /** RENAME COLUMN, the spec way: the field keeps its id (and with it
      * every per-file stat, bound, and partition-source reference), only
      * the display name changes in a new schema-history entry. Data files
      * are untouched; the table flips to read-by-id so readers bind old
      * files' columns through the parquet field ids this library always
      * stamps (by-name would null out every pre-rename file). */
    def renameColumn(oldName: String, newName: String): Unit = {
      val cur = currentSchema
      val idx = cur.fieldNames.indexOf(oldName)
      require(idx >= 0, s"no column $oldName to rename")
      require(!cur.fieldNames.contains(newName), s"column $newName already exists")
      requireFieldIdStamps("rename column")
      allFieldIds = allFieldIds :+ currentFieldIds
      // nested paths move with the renamed column; their ids don't change
      allNestedIds = allNestedIds :+ currentNestedIds.map {
        case (p, id) if p.startsWith(s"$oldName.") =>
          s"$newName.${p.stripPrefix(s"$oldName.")}" -> id
        case other => other
      }
      allSchemas = allSchemas :+
        StructType(cur.fields.updated(idx, cur.fields(idx).copy(name = newName)))
      readById = true
    }

    /** DROP COLUMN: the field leaves the current schema (its id is
      * RETIRED, never reissued — evolveSchema allocates past the history's
      * max), data files keep the physical column untouched. A later
      * re-add of the same NAME gets a fresh id, so old files' values do
      * not resurrect — that guarantee is exactly why the table flips to
      * read-by-id here. Partition source columns can't be dropped (the
      * spec keeps their ids live in every manifest's partition tuples). */
    def dropColumn(name: String): Unit = {
      val cur = currentSchema
      val idx = cur.fieldNames.indexOf(name)
      require(idx >= 0, s"no column $name to drop")
      val id = currentFieldIds(idx)
      require(!specs.flatten.exists(_.sourceId == id),
        s"cannot drop partition source column $name")
      // a LIVE equality-delete file keying on this column would make every
      // subsequent scan throw (equality_ids resolve through the current
      // schema) — and retired ids are never reissued, so the table would
      // be bricked by a metadata-only op. Refuse instead; compact the
      // delete debt away first (rewrite_data_files), then drop.
      if (committed.nonEmpty) {
        val liveEqIds = plan(spark, currentMetadataPath).deletes
          .filter(_.content == 2).flatMap(_.equalityIds).toSet
        require(!liveEqIds.contains(id),
          s"cannot drop column $name: live equality-delete files key on it " +
            "(materialize the deletes with rewrite_data_files first)")
      }
      requireFieldIdStamps("drop column")
      allFieldIds = allFieldIds :+ currentFieldIds.patch(idx, Nil, 1)
      // the subtree's nested ids retire with the column (historical maps
      // keep them, so maxFieldIdEver never re-issues one)
      allNestedIds = allNestedIds :+
        currentNestedIds.filterNot(_._1.startsWith(s"$name."))
      allSchemas = allSchemas :+ StructType(cur.fields.patch(idx, Nil, 1))
      readById = true
    }

    // -------------------------------------------- nested (struct) evolution
    // The spec evolves fields BY ID at any depth; these are the one-level-
    // down twins of add/rename/dropColumn. `path` navigates top-level
    // column -> struct subfield(s), e.g. Seq("info","status"); navigation
    // through list/map positions is refused (the spec evolves those
    // element types, but parquet field-id binding for them is not
    // expressible through Spark's reader — an honest refusal beats a
    // silently name-bound read).

    /** The struct at `path` (which must name struct columns all the way
      * down) and a rebuilder producing the full schema with that struct
      * replaced. */
    private def structAt(path: Seq[String]): (StructType, StructType => StructType) = {
      def descend(st: StructType, p: Seq[String]): (StructType, StructType => StructType) =
        p match {
          case Seq() => (st, identity)
          case head +: rest =>
            val idx = st.fieldNames.indexOf(head)
            require(idx >= 0, s"no column $head in ${st.fieldNames.mkString(",")}")
            st.fields(idx).dataType match {
              case inner: StructType =>
                val (target, rebuildInner) = descend(inner, rest)
                (target, replaced => StructType(st.fields.updated(idx,
                  st.fields(idx).copy(dataType = rebuildInner(replaced)))))
              case other => throw new IllegalArgumentException(
                s"$head is ${other.catalogString}, not a struct — nested evolution " +
                  "navigates struct fields only")
            }
        }
      descend(currentSchema, path)
    }

    /** ADD a nullable field at the END of the struct at `path` — fresh id
      * past everything ever allocated, metadata-only, old files read the
      * field as NULL (Spark null-fills absent nested fields exactly like
      * absent top-level ones). */
    def addNestedColumn(path: Seq[String], field: StructField): Unit = {
      require(path.nonEmpty, "addNestedColumn needs the parent struct path")
      require(field.nullable, s"evolved nested field ${field.name} must be nullable")
      val (parent, rebuild) = structAt(path)
      require(!parent.fieldNames.contains(field.name),
        s"field ${field.name} already exists at ${path.mkString(".")}")
      val prefix  = path.mkString("", ".", ".")
      val newPath = prefix + field.name
      val baseId  = maxFieldIdEver
      // the new field's own id, then its subtree's (if it is itself nested)
      val subtree = deriveNestedIds(StructType(Seq(field)), Seq(baseId + 1))
        .map { case (p, id) => (prefix + p, id) }
      allFieldIds = allFieldIds :+ currentFieldIds
      allNestedIds = allNestedIds :+
        (currentNestedIds + (newPath -> (baseId + 1)) ++ subtree)
      allSchemas = allSchemas :+
        rebuild(StructType(parent.fields :+ field.copy(nullable = true)))
    }

    /** RENAME the struct field at `path`: id (and whole subtree's ids)
      * unchanged, display name only; flips read-by-id so old files bind
      * the field through its parquet id one level down. */
    def renameNestedColumn(path: Seq[String], newName: String): Unit = {
      require(path.length >= 2, "renameNestedColumn needs column.field path")
      val (parent, rebuild) = structAt(path.init)
      val idx = parent.fieldNames.indexOf(path.last)
      require(idx >= 0, s"no field ${path.last} at ${path.init.mkString(".")}")
      require(!parent.fieldNames.contains(newName),
        s"field $newName already exists at ${path.init.mkString(".")}")
      requireFieldIdStamps("rename nested column", nested = true)
      val oldPrefix = path.mkString(".")
      val newPrefix = (path.init :+ newName).mkString(".")
      allFieldIds = allFieldIds :+ currentFieldIds
      allNestedIds = allNestedIds :+ currentNestedIds.map {
        case (p, id) if p == oldPrefix => newPrefix -> id
        case (p, id) if p.startsWith(oldPrefix + ".") =>
          (newPrefix + p.stripPrefix(oldPrefix)) -> id
        case other => other
      }
      allSchemas = allSchemas :+ rebuild(StructType(
        parent.fields.updated(idx, parent.fields(idx).copy(name = newName))))
      readById = true
    }

    /** DROP the struct field at `path`: its id retires forever (a re-add
      * of the same name gets a fresh id — old files' values never
      * resurrect, the no-resurrection gate one level down). */
    def dropNestedColumn(path: Seq[String]): Unit = {
      require(path.length >= 2, "dropNestedColumn needs column.field path")
      val (parent, rebuild) = structAt(path.init)
      val idx = parent.fieldNames.indexOf(path.last)
      require(idx >= 0, s"no field ${path.last} at ${path.init.mkString(".")}")
      require(parent.fields.length > 1,
        s"cannot drop the last field of struct ${path.init.mkString(".")}")
      requireFieldIdStamps("drop nested column", nested = true)
      val dead = path.mkString(".")
      allFieldIds = allFieldIds :+ currentFieldIds
      allNestedIds = allNestedIds :+ currentNestedIds
        .filterNot { case (p, _) => p == dead || p.startsWith(dead + ".") }
      allSchemas = allSchemas :+ rebuild(StructType(parent.fields.patch(idx, Nil, 1)))
      readById = true
    }

    /** Guard for the read-by-id flip: a rename/drop makes every later scan
      * bind file columns by parquet field id, so data files with NO id
      * stamps (foreign parquet adopted by an export, or a pre-stamping
      * build) would brick on the very next read. This writer's own paths
      * always stamp, so probing a bounded sample of live files (≤16,
      * evenly spaced — a few KB of footer each) catches the adopted-file
      * case without an O(files) metadata-op cost. */
    private def requireFieldIdStamps(op: String, nested: Boolean = false): Unit = {
      if (committed.isEmpty) return
      import scala.jdk.CollectionConverters._
      // any read-by-id flip on a schema WITH struct columns makes readers
      // attach nested id metadata too — so the probe must go deep even
      // for a top-level rename when structs are present
      val needDeep = nested ||
        currentSchema.fields.exists(_.dataType.isInstanceOf[StructType])
      val conf  = spark.sparkContext.hadoopConfiguration
      val files = plan(spark, currentMetadataPath).files
      val probe =
        if (files.size <= 16) files
        else (0 until 16).map(i => files(i * files.size / 16))
      probe.foreach { f =>
        val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.path, conf))
        val msg = try fr.getFooter.getFileMetaData.getSchema finally fr.close()
        // a NESTED rename/drop binds struct subfields by id, so the probe
        // must descend into group types too (list/map repetition groups
        // are structural, not fields — they legitimately carry no id)
        def unstampedIn(t: org.apache.parquet.schema.Type, path: String): Seq[String] =
          t match {
            case g: org.apache.parquet.schema.GroupType
                if needDeep && t.getLogicalTypeAnnotation == null && path.nonEmpty =>
              g.getFields.asScala.toSeq.flatMap(c => check(c, path))
            case _ => Nil
          }
        def check(t: org.apache.parquet.schema.Type, parent: String): Seq[String] = {
          val path = if (parent.isEmpty) t.getName else s"$parent.${t.getName}"
          (if (t.getId == null) Seq(path) else Nil) ++ unstampedIn(t, path)
        }
        val unstamped = msg.getFields.asScala.toSeq.flatMap(c => check(c, ""))
        require(unstamped.isEmpty,
          s"cannot $op: data file ${f.path} lacks parquet field ids on " +
            s"[${unstamped.mkString(", ")}] — read-by-id would make every scan " +
            "of this file fail; rewrite data files first")
      }
    }

    /** Publish a pending schema change as a new metadata version WITHOUT
      * a data commit (ALTER TABLE is metadata-only): same CAS-claimed
      * vN.metadata.json protocol as a commit, current snapshot pointer
      * unchanged. Requires at least one committed snapshot. */
    def publishSchemaChange(): Unit = {
      require(committed.nonEmpty, "publishSchemaChange needs a committed snapshot")
      writeMetadata()
    }

    /** Mark the table read-by-id up front (exports of rename/drop-evolved
      * standard tables, whose adopted files must bind by field id). */
    private[icelite] def setReadById(): Unit = readById = true

    /** The current (possibly evolved-but-unpublished) schema — what an
      * ALTER TABLE driver composes further changes against. */
    def schemaNow: StructType = currentSchema

    /** Current top-level field ids (sparse after drops) — what a staged
      * file write must stamp to stay id-consistent with the schema. */
    def fieldIdsNow: Seq[Int] = currentFieldIds

    /** Current nested (path -> id) assignment — the tracked map staged
      * writes stamp after a NESTED evolution (positional re-derivation
      * diverges as soon as a nested field was dropped or reordered). */
    def nestedIdsNow: Map[String, Int] = currentNestedIds

    /** Commit `files` as snapshot N+1 (append semantics). Files with
      * `content` > 0 go into a separate DELETE manifest, listed with
      * content 1 in the manifest list, exactly as the spec splits them. */
    def commit(files: Seq[DataFileInfo]): Unit = commitWith(files, defaultSpec)

    /** Operation label for a delta commit's summary: all-deletes =
      * "delete", anything staging new rows = "overwrite". */
    private def deltaOp(files: Seq[DataFileInfo]): String =
      if (files.nonEmpty && files.forall(_.content > 0)) "delete" else "overwrite"

    /** Commit DELTA files (row-level DML output) that carry NO partition
      * values. On a partitioned table these must NOT land under the
      * partitioned spec — the spec requires a file's partition tuple to
      * reflect its rows, and conforming engines prune by it (null !=
      * literal → silently skipped files). Instead they commit under an
      * auxiliary UNPARTITIONED spec entry (appended to `partition-specs`
      * once, default-spec-id untouched), which every conforming reader
      * treats as global/unpruned — conservative and correct. Unpartitioned
      * tables take the ordinary path. */
    def commitDelta(files: Seq[DataFileInfo]): Unit = {
      if (currentSpecFields.isEmpty) return commitWith(files, defaultSpec, deltaOp(files))
      val existing = specs.indexWhere(_.isEmpty)
      val sid = if (existing >= 0) existing else { specs = specs :+ Seq.empty; specs.size - 1 }
      commitWith(files, sid, deltaOp(files))
    }

    private def commitWith(files: Seq[DataFileInfo], specId: Int,
        op: String = "append"): Unit =
      commitGroups(Seq(files -> specId), op)

    /** Row-delta commit in ONE snapshot with PER-GROUP partition specs:
      * insert files that carry real partition tuples land under the
      * DEFAULT (partitioned) spec — external engines prune them like any
      * other data file — while position/equality deletes (global by
      * nature) land under the auxiliary unpartitioned spec. The old
      * all-unpartitioned routing ([[commitDelta]]) remains the fallback
      * for transform specs the delta writer can't stamp. */
    def commitRowDelta(inserts: Seq[DataFileInfo], deletes: Seq[DataFileInfo]): Unit = {
      val op = deltaOp(inserts ++ deletes)
      if (currentSpecFields.isEmpty) return commitWith(inserts ++ deletes, defaultSpec, op)
      val delSpec = {
        val existing = specs.indexWhere(_.isEmpty)
        if (existing >= 0) existing else { specs = specs :+ Seq.empty; specs.size - 1 }
      }
      commitGroups(Seq(inserts -> defaultSpec, deletes -> delSpec), op)
    }

    private def commitGroups(groups0: Seq[(Seq[DataFileInfo], Int)],
        op: String = "append"): Unit = {
      // v3 ROW LINEAGE: newly-added data files take contiguous implicit
      // row ids — file `first_row_id` (manifest field 142) + position.
      // Files that MATERIALIZED their lineage columns (rewrites) carry
      // ids in the data itself and consume no id space.
      var rowCursor = nextRowId
      val groups = groups0.map { case (fs, sid) =>
        (fs.map { f =>
          if (f.content == 0 && !f.lineageMaterialized && f.firstRowId.isEmpty) {
            val g = f.copy(firstRowId = Some(rowCursor)); rowCursor += f.recordCount; g
          } else f
        }, sid)
      }
      val files = groups.flatMap(_._1)
      // stats keys MUST be real field ids of the current schema: a sparse-id
      // table (dropped-column history) whose stats arrive keyed positionally
      // (1..n from a writeSingleFile call that omitted fieldIds) would
      // publish counts under retired/nonexistent ids, and null-aware file
      // pruning (IsNull/IsNotNull) would misprune on them. Fail the commit
      // rather than publish spec-noncompliant metadata.
      // DELETE files (content != 0) are exempt: position deletes key their
      // stats by the spec's RESERVED ids (2147483546 file_path /
      // 2147483545 pos), which are never in the table schema.
      val idSet = currentFieldIds.toSet
      files.filter(_.content == 0).foreach { f =>
        val bad = (f.nullCounts.keySet ++ f.bounds.keySet).filterNot(idSet)
        require(bad.isEmpty,
          s"stats keyed by non-schema field ids ${bad.toSeq.sorted.mkString(",")} " +
            s"(schema ids: ${currentFieldIds.mkString(",")}) — pass fieldIds to the stage writer")
      }
      val snapId = lastSnapId + 1L
      val seq    = snapId // one sequence number per commit
      if (op != "append") snapOps += snapId -> op
      if (allSchemas.size > 1) snapSchemaIds += snapId -> (allSchemas.size - 1)
      // the snapshot's first-row-id (spec v3) + advance the allocator
      snapFirstRow += snapId -> nextRowId
      nextRowId = rowCursor
      fs.mkdirs(metadataDir)
      withCommitRollback {
        val seenManifestNames = scala.collection.mutable.Set.empty[String]
        groups.filter(_._1.nonEmpty).foreach { case (groupFiles, specId) =>
          writeGroupManifests(groupFiles, specId, snapId, seq, seenManifestNames)
        }

        // 2+3. the snapshot's manifest list + metadata JSON
        publishSnapshot(snapId, seq)
      }
    }

    /** One ADDED manifest per content kind for `files` under `specId` —
      * the manifest-writing half of a commit (data and delete files may
      * not share a manifest, nor may two specs). */
    private def writeGroupManifests(files: Seq[DataFileInfo], specId: Int,
        snapId: Long, seq: Long,
        seenNames: scala.collection.mutable.Set[String]): Unit = {
      val specFields = specs(specId)

      // 1. the commit's manifest(s): one ADDED entry per file; data and
      // delete files may not share a manifest
      val commitEntrySchema = entrySchemaOf(specId) // fixed for this commit
      def buildEntry(f: DataFileInfo): GenericRecord = {
        val dataFile = new GenericData.Record(commitEntrySchema.getField("data_file").schema())
        dataFile.put("content", f.content)
        dataFile.put("file_path", f.path)
        dataFile.put("file_format", if (f.dvRef.isDefined) "PUFFIN" else "PARQUET")
        // v3 deletion vector provenance (spec fields 143-145)
        f.dvRef.foreach { case (ref, off, sz) =>
          dataFile.put("referenced_data_file", ref)
          dataFile.put("content_offset", Long.box(off))
          dataFile.put("content_size_in_bytes", Long.box(sz))
        }
        val partRec = new GenericData.Record(dataFile.getSchema.getField("partition").schema())
        specFields.foreach { sf =>
          f.partitionValues.get(sf.name).foreach(v => partRec.put(sf.name, v))
        }
        dataFile.put("partition", partRec)
        dataFile.put("record_count", f.recordCount)
        dataFile.put("file_size_in_bytes", f.sizeBytes)
        if (f.bounds.nonEmpty) {
          def boundList(field: String, pick: ((Array[Byte], Array[Byte])) => Array[Byte]) = {
            val arraySchema = dataFile.getSchema.getField(field).schema().getTypes.get(1)
            val items       = arraySchema.getElementType
            val l = new java.util.ArrayList[GenericRecord]()
            f.bounds.toSeq.sortBy(_._1).foreach { case (id, lohi) =>
              val r = new GenericData.Record(items)
              r.put("key", id)
              r.put("value", java.nio.ByteBuffer.wrap(pick(lohi)))
              l.add(r)
            }
            new GenericData.Array(arraySchema, l)
          }
          dataFile.put("lower_bounds", boundList("lower_bounds", _._1))
          dataFile.put("upper_bounds", boundList("upper_bounds", _._2))
        }
        if (f.nullCounts.nonEmpty) {
          // spec field 110: what IS NULL / IS NOT NULL predicates prune on
          val arraySchema =
            dataFile.getSchema.getField("null_value_counts").schema().getTypes.get(1)
          val items = arraySchema.getElementType
          val l = new java.util.ArrayList[GenericRecord]()
          f.nullCounts.toSeq.sortBy(_._1).foreach { case (id, n) =>
            val r = new GenericData.Record(items)
            r.put("key", id); r.put("value", n); l.add(r)
          }
          dataFile.put("null_value_counts", new GenericData.Array(arraySchema, l))
        }
        if (f.splitOffsets.nonEmpty) {
          // spec field 132: recorded at write time so planners can range-
          // split oversized files with ZERO footer IO
          val arraySchema = dataFile.getSchema.getField("split_offsets").schema().getTypes.get(1)
          val l = new java.util.ArrayList[java.lang.Long]()
          f.splitOffsets.foreach(o => l.add(o))
          dataFile.put("split_offsets", new GenericData.Array[java.lang.Long](arraySchema, l))
        }
        if (f.equalityIds.nonEmpty) {
          val arraySchema = dataFile.getSchema.getField("equality_ids").schema().getTypes.get(1)
          val l = new java.util.ArrayList[Integer]()
          f.equalityIds.foreach(id => l.add(id))
          dataFile.put("equality_ids", new GenericData.Array[Integer](arraySchema, l))
        }
        // spec field 140: claim the registered sort order the file was
        // actually written under; absent = unsorted (the honest default)
        f.sortOrderId.foreach(id => dataFile.put("sort_order_id", Int.box(id)))
        // spec field 142 (v3 row lineage): the file's implicit-id base
        f.firstRowId.foreach(v => dataFile.put("first_row_id", Long.box(v)))
        val entry = new GenericData.Record(commitEntrySchema)
        entry.put("status", 1) // ADDED
        entry.put("snapshot_id", snapId)
        entry.put("sequence_number", seq)
        entry.put("file_sequence_number", seq)
        entry.put("data_file", dataFile)
        entry
      }
      val byKind = files.groupBy(f => if (f.content == 0) 0 else 1).toSeq.sortBy(_._1)
      byKind.foreach { case (kind, group) =>
        val base   = if (kind == 0) "" else "-deletes"
        // same-kind manifests from ANOTHER spec group in this commit get a
        // spec-id suffix — names must stay unique within the snapshot
        val suffix =
          if (seenNames.add(f"m-$snapId%05d$base$tagSuffix.avro")) base
          else s"$base-s$specId"
        val manifestPath = new Path(metadataDir, f"m-$snapId%05d$suffix$tagSuffix.avro")
        val manifestLen = writeAvroFile(manifestPath, commitEntrySchema,
          group.map(buildEntry), Map(
            "schema" -> icebergSchemaJson(currentSchema, allSchemas.size - 1, currentFieldIds),
            "partition-spec" -> s"[${specJson(specFields)}]",
            "partition-spec-id" -> specId.toString,
            "format-version" -> "2",
            "content" -> (if (kind == 0) "data" else "deletes")), noClobber = true)
        manifests = manifests :+ ManifestRec(manifestPath.toString, manifestLen, snapId, seq,
          kind, group.size, group.map(_.recordCount).sum, specId,
          summaries = summarize(specFields, group.map(f => f.partitionValues.get _)))
      }
    }

    /** Data-file compaction (Iceberg `rewrite_data_files`, bin-pack with
      * delete materialization): the caller stages the compacted file(s) —
      * written from a scan of the CURRENT state, so every pending
      * merge-on-read delete is applied in the rewrite — and this commit
      * replaces ALL existing manifests (data and delete) with one fresh
      * ADDED manifest for them. Earlier snapshots still reference the
      * original manifests through their own manifest lists, so time travel
      * to any pre-rewrite snapshot, deletes included, is untouched. The
      * antidote to small-file sprawl AND to the per-read delete-join tax:
      * after the rewrite, scans are pure data-file reads again. */
    def rewriteDataFiles(files: Seq[DataFileInfo]): Unit = {
      manifests = List.empty // replaced wholesale; old snapshots keep theirs
      commitWith(files, defaultSpec, "replace")
    }

    /** Manifest compaction (Iceberg `rewrite_manifests`): merge every
      * data manifest into one manifest PER SPEC of status-EXISTING
      * entries (the spec forbids mixing specs in a manifest), keeping
      * each entry's original data sequence number so merge-on-read
      * delete ordering is untouched, and commit the result as a new
      * `replace` snapshot. No data file moves. This is the antidote to
      * commit-per-microbatch metadata sprawl: planning reads O(specs)
      * manifests afterward instead of O(commits) — at 100 TB with
      * streaming ingest the manifest list would otherwise grow without
      * bound. Delete manifests are carried as-is. */
    def rewriteManifests(): Unit = withCommitRollback {
      val snapId = lastSnapId + 1L
      val seq    = snapId
      val (dataM, delM) = manifests.partition(_.content == 0)
      val merged = dataM.groupBy(_.specId).toSeq.sortBy(_._1).map { case (sid, group) =>
        val schema = manifestEntrySchemaFor(
          specs(sid).map(f => (f.name, f.avroType, f.fieldId)))
        val entries = group.flatMap { m =>
          readAvro(fs, new Path(m.path)).map { e =>
            // rebind BY NAME into the current entry schema: carried
            // records may predate later optional data_file fields
            // (sort_order_id 140, first_row_id 142, DV 143-145), and
            // Avro's datum writer resolves fields POSITIONALLY against
            // the writing schema — a shorter source record would
            // misalign or crash. Absent fields stay null (their spec
            // defaults).
            val out = new GenericData.Record(schema)
            schema.getFields.forEach { f =>
              if (f.name == "data_file") {
                val dfT = schema.getField("data_file").schema()
                val src = e.get("data_file").asInstanceOf[GenericRecord]
                val d   = new GenericData.Record(dfT)
                dfT.getFields.forEach { g =>
                  if (src.getSchema.getField(g.name) != null) d.put(g.name, src.get(g.name))
                }
                out.put("data_file", d)
              } else if (e.getSchema.getField(f.name) != null) {
                out.put(f.name, e.get(f.name))
              }
            }
            out.put("status", 0) // EXISTING — carried, not added, by this snapshot
            out
          }
        }
        // merged summaries recomputed from the carried entries' partition
        // records (the union of the source manifests' summaries)
        val entryValues: Seq[String => Option[Any]] = entries.map { e =>
          e.get("data_file").asInstanceOf[GenericRecord].get("partition") match {
            case pr: GenericRecord =>
              (n: String) =>
                Option(pr.getSchema.getField(n)).flatMap(_ => Option(pr.get(n))).map {
                  case u: org.apache.avro.util.Utf8 => u.toString
                  case v                            => v
                }
            case _ => (_: String) => None
          }
        }
        val path = new Path(metadataDir, f"m-$snapId%05d-rw$sid$tagSuffix.avro")
        val len = writeAvroFile(path, schema, entries, Map(
          "schema" -> icebergSchemaJson(currentSchema, allSchemas.size - 1, currentFieldIds),
          "partition-spec" -> s"[${specJson(specs(sid))}]",
          "partition-spec-id" -> sid.toString,
          "format-version" -> "2",
          "content" -> "data"), noClobber = true)
        // list seq = the group's MIN so a null-seq entry can never be
        // treated as newer than it was (entries carry explicit seqs anyway)
        ManifestRec(path.toString, len, snapId, group.map(_.seq).min, 0,
          group.map(_.nFiles).sum, group.map(_.nRows).sum, sid, existing = true,
          summaries = summarize(specs(sid), entryValues))
      }
      manifests = merged.toList ++ delM
      snapOps += snapId -> "replace"
      if (allSchemas.size > 1) snapSchemaIds += snapId -> (allSchemas.size - 1)
      publishSnapshot(snapId, seq)
    }

    /** Snapshot expiration (Iceberg `expire_snapshots`): drop all but the
      * last `keepLast` snapshots from the metadata, delete their manifest
      * lists, and delete any manifest file no kept snapshot references —
      * the complement of rewrite_manifests: rewrite makes old per-commit
      * manifests unreachable, expiration reclaims them. Data files are
      * never touched here: in this append-only writer every data file is
      * carried forward into the kept snapshots (unreachable-DATA sweeping
      * is the vacuum operation's job, ic27). Bounds the metadata history
      * a long-lived streaming table accumulates. */
    def expireSnapshots(keepLast: Int): Unit = {
      require(keepLast >= 1, "must keep at least the current snapshot")
      val (expired, kept) = committed.splitAt((committed.size - keepLast).max(0))
      if (expired.isEmpty) return
      val keptManifests: Set[String] = kept.flatMap { case (_, lp) =>
        readAvro(fs, new Path(lp)).map(_.get("manifest_path").toString)
      }.toSet
      // publish the trimmed metadata FIRST (CAS, rollback-protected): a
      // lost commit race or a crash mid-expire must never have deleted
      // files a still-current snapshot references
      withCommitRollback {
        committed = kept
        writeMetadata()
      }
      // reclamation is BEST-EFFORT per entry: the expiration committed
      // above, so a missing/corrupt expired list (externally vacuumed)
      // must not fail the operation or strand the remaining deletions —
      // a skipped file is an orphan for the vacuum op, not an error
      expired.foreach { case (_, lp) =>
        try {
          val p = new Path(lp)
          readAvro(fs, p).map(_.get("manifest_path").toString)
            .filterNot(keptManifests)
            .foreach(mp => fs.delete(new Path(mp), false))
          fs.delete(p, false)
        } catch { case _: Exception => () }
      }
    }

    private def publishSnapshot(snapId: Long, seq: Long): Unit = {
      // the snapshot's manifest list: this commit's manifest(s) + carried ones
      val listRecords = manifests.map { m =>
        val added = m.addedBy == snapId && !m.existing
        val r = new GenericData.Record(manifestFileSchema)
        r.put("manifest_path", m.path)
        r.put("manifest_length", m.len)
        r.put("partition_spec_id", m.specId)
        r.put("content", m.content)
        r.put("sequence_number", m.seq)
        r.put("min_sequence_number", m.seq)
        r.put("added_snapshot_id", m.addedBy)
        r.put("added_files_count", if (added) m.nFiles else 0)
        r.put("existing_files_count", if (m.existing) m.nFiles else 0)
        r.put("deleted_files_count", 0)
        r.put("added_rows_count", if (added) m.nRows else 0L)
        r.put("existing_rows_count", if (m.existing) m.nRows else 0L)
        r.put("deleted_rows_count", 0L)
        m.summaries.foreach { ss =>
          // spec field 507: what manifest-LIST pruning reads
          val arraySchema =
            manifestFileSchema.getField("partitions").schema().getTypes.get(1)
          val items = arraySchema.getElementType
          val l = new java.util.ArrayList[GenericRecord]()
          ss.foreach { s =>
            val fr = new GenericData.Record(items)
            fr.put("contains_null", s.containsNull)
            s.lower.foreach(b => fr.put("lower_bound", java.nio.ByteBuffer.wrap(b)))
            s.upper.foreach(b => fr.put("upper_bound", java.nio.ByteBuffer.wrap(b)))
            l.add(fr)
          }
          r.put("partitions", new GenericData.Array(arraySchema, l))
        }
        r
      }
      val listPath = new Path(metadataDir, f"snap-$snapId%d-manifest-list$tagSuffix.avro")
      // parent = the actual previous head (ids are monotone but can GAP
      // past expired history, so snapId - 1 is not necessarily it)
      val parent = committed.lastOption.map(_._1.toString).getOrElse("null")
      writeAvroFile(listPath, manifestFileSchema, listRecords, Map(
        "format-version" -> "2",
        "snapshot-id" -> snapId.toString,
        "sequence-number" -> seq.toString,
        "parent-snapshot-id" -> parent),
        noClobber = true)
      committed = committed :+ ((snapId, listPath.toString))
      lastSnapId = snapId
      writeMetadata()
    }

    /** The metadata JSON: full snapshot log, current pointer. Derives
      * everything from `committed`, so both commits and expiration
      * publish through the same path. */
    private def writeMetadata(): Unit = {
      val snapId = committed.last._1
      val seq    = snapId
      version += 1
      val snapshotsJson = committed.zipWithIndex.map { case ((id, lp), i) =>
        val parent = if (i == 0) "" else s""""parent-snapshot-id":${committed(i - 1)._1},"""
        val op     = snapOps.getOrElse(id, "append")
        val schId  = snapSchemaIds.getOrElse(id, 0)
        val firstRow = snapFirstRow.get(id)
          .map(v => s""""first-row-id":$v,""").getOrElse("")
        s"""{"snapshot-id":$id,$parent"timestamp-ms":${ts0 + id},"sequence-number":$id,
           $firstRow"summary":{"operation":"$op"},"manifest-list":"$lp","schema-id":$schId}"""
          .replaceAll("\n\\s*", "")
      }.mkString(",")
      val metadataJson =
        s"""{"format-version":2,"table-uuid":"$tableUuid","location":"$location",
           "last-sequence-number":$seq,"last-updated-ms":${ts0 + snapId},
           "last-column-id":$maxFieldIdEver,
           "next-row-id":$nextRowId,
           "current-schema-id":${allSchemas.size - 1},
           "schemas":[${allSchemas.zipWithIndex.map { case (sc, i) => icebergSchemaJson(sc, i, allFieldIds(i), allNestedIds(i), fieldDefaults) }.mkString(",")}],
           "default-spec-id":$defaultSpecId,
           "partition-specs":[${specs.zipWithIndex.map { case (sf, i) => s"""{"spec-id":$i,"fields":[${specJson(sf)}]}""" }.mkString(",")}],
           "last-partition-id":${specs.flatten.map(_.fieldId).maxOption.getOrElse(999)},
           "statistics":[${statsRecs.filter(r => committed.exists(_._1 == r.snapshotId))
             .map { r =>
               val bm = r.blobs.map(b =>
                 s"""{"type":"${b.blobType}","snapshot-id":${b.snapshotId},"sequence-number":${b.sequenceNumber},"fields":[${b.fields.mkString(",")}],"properties":{${b.properties.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":"$v"""" }.mkString(",")}}}""").mkString(",")
               s"""{"snapshot-id":${r.snapshotId},"statistics-path":"${r.path}","file-size-in-bytes":${r.fileSizeInBytes},"file-footer-size-in-bytes":${r.footerSizeInBytes},"blob-metadata":[$bm]}"""
             }.mkString(",")}],
           "partition-statistics":[${partStatsRecs
             .filter(r => committed.exists(_._1 == r.snapshotId))
             .map(r => s"""{"snapshot-id":${r.snapshotId},"statistics-path":"${r.path}","file-size-in-bytes":${r.fileSizeInBytes}}""")
             .mkString(",")}],
           "default-sort-order-id":$defaultSortOrderId,"sort-orders":[${
             (s"""{"order-id":0,"fields":[]}""" :: sortOrders.map { case (oid, fs) =>
               s"""{"order-id":$oid,"fields":[${fs.map { case (sid, dir, no) =>
                 s"""{"transform":"identity","source-id":$sid,"direction":"$dir","null-order":"$no"}"""
               }.mkString(",")}]}"""
             }).mkString(",")}],
           "properties":{${
             ((if (readById) List(""""graft.read-by-id":"true"""") else Nil) ++
               extraProps.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":"$v"""" })
               .mkString(",")}},
           "current-snapshot-id":$snapId,
           "snapshots":[$snapshotsJson],
           "snapshot-log":[],"metadata-log":[]}""".replaceAll("\n\\s*", "")
      val mdPath = new Path(metadataDir, f"v$version%05d.metadata.json")
      // version-file CAS (same protocol as IceTable.commitCasAt): whoever
      // claims v{N}.metadata.json owns snapshot N; a loser rolls back via
      // withCommitRollback and retries from the winner's state
      val tmp = new Path(metadataDir,
        mdPath.getName + "." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(metadataJson.getBytes("UTF-8")) finally out.close()
      if (!claimExactlyOnce(tmp, mdPath)) {
        fs.delete(tmp, false)
        throw new java.util.ConcurrentModificationException(
          s"concurrent commit to $location: ${mdPath.getName} already exists; " +
            "resume the writer from current metadata and retry")
      }
      attemptCreated = mdPath :: attemptCreated
      // the hint is advisory (readers walk forward from it) and only
      // winners reach this line — but it must flip ATOMICALLY (tmp +
      // rename-replace): a plain overwriting create truncates first, and
      // a concurrent reader would see an empty hint
      val hintTmp = new Path(metadataDir,
        "version-hint." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      val hint = fs.create(hintTmp, true)
      try hint.write(version.toString.getBytes("UTF-8")) finally hint.close()
      val hintPath = new Path(metadataDir, "version-hint.text")
      if (!fs.rename(hintTmp, hintPath)) {
        // some FS contracts refuse rename-onto-existing: replace under the
        // hint's own lock so no reader ever observes a missing hint window
        IceTable.commitLock(hintPath.toString).synchronized {
          fs.delete(hintPath, false)
          require(fs.rename(hintTmp, hintPath), s"hint flip failed at $hintPath")
        }
      }
    }

    def currentMetadataPath: String =
      new Path(metadataDir, f"v$version%05d.metadata.json").toString

    /** Rehydrate a session over an EXISTING table (see
      * [[IcebergFormat.resumeWriter]]): the snapshot log, the current
      * snapshot's manifest pointers, the FULL schema history, and every
      * historical partition spec (as (name, source-id, field-id,
      * transform) tuples — avro types are re-derived from the current
      * schema), exactly as a fresh commit would have left them in memory.
      * The next writeMetadata re-emits schemas/specs from this state, so
      * callers must have validated id layouts first. */
    private[icelite] def restore(
        committed0: List[(Long, String)],
        manifests0: List[(String, Long, Long, Long, Int, Int, Long, Int, Boolean,
          Option[Seq[FieldSummary]])],
        schemas0: List[StructType],
        specs0: List[Seq[(String, Int, Int, String)]],
        defaultSpec0: Int,
        fieldIds0: List[Seq[Int]],
        readById: Boolean = false,
        snapOps0: Map[Long, String] = Map.empty,
        snapSchemaIds0: Map[Long, Int] = Map.empty,
        nestedIds0: List[Map[String, Int]] = Nil): Unit = {
      this.readById = readById
      this.snapOps = snapOps0
      this.snapSchemaIds = snapSchemaIds0
      // nested ids restore from the committed JSONs (explicit there);
      // a caller without them re-derives positionally — correct exactly
      // when no nested evolution ever happened, which is the only state
      // a pre-tracking JSON can be in
      allNestedIds =
        if (nestedIds0.nonEmpty) nestedIds0
        else schemas0.zip(fieldIds0).map { case (sc, ids) => deriveNestedIds(sc, ids) }
      committed = committed0
      // resume the monotone id allocator past every snapshot the restored
      // log has seen (expired history may have gone, so this is a floor —
      // but the log keeps ids strictly growing, making max = latest)
      lastSnapId = committed0.map(_._1).foldLeft(0L)(math.max)
      manifests = manifests0.map {
        case (p, len, addedBy, seq, content, nFiles, nRows, specId, ex, sums) =>
          ManifestRec(p, len, addedBy, seq, content, nFiles, nRows, specId, existing = ex,
            summaries = sums)
      }
      allSchemas  = schemas0 // before specs: identity avro types resolve here
      allFieldIds = fieldIds0
      val BucketTr = raw"bucket\[(\d+)\]".r
      val TruncTr  = raw"truncate\[(\d+)\]".r
      // partition source ids index through the REAL (possibly sparse)
      // field-id table, never by position
      def typeOf(sid: Int): DataType = {
        val idx = currentFieldIds.indexOf(sid)
        require(idx >= 0, s"partition source id $sid not in the current schema")
        currentSchema.fields(idx).dataType
      }
      specs = specs0.map(_.map { case (name, sid, fid, tr) =>
        val avroT = tr match {
          case "identity" => avroPrimitive(typeOf(sid))
          case "year" | "month" | "day" | "hour" => "int"
          case BucketTr(_) => "int"
          case TruncTr(_) => avroPrimitive(typeOf(sid))
          case other =>
            throw new UnsupportedOperationException(s"cannot resume partition transform $other")
        }
        SpecField(name, sid, fid, tr, avroT)
      })
      defaultSpec = defaultSpec0
    }
  }

  /** Reopen an existing Iceberg v2 table directory as a live [[Writer]]
    * session — the missing half of the writer's "single session owns the
    * lineage" design, and what lets SQL row-level operations commit DELTA
    * snapshots onto tables loaded from disk (ic76–ic79). State is rebuilt
    * from public metadata only: version from `version-hint.text`, the
    * snapshot log from the metadata JSON's `snapshots` array, the carried
    * manifest pointers from the current snapshot's manifest list avro
    * (every field the list schema records), and the FULL schema + spec
    * histories — evolved and partitioned tables resume too. Top-level
    * field ids re-emit VERBATIM, so sparse layouts (a dropped+re-added
    * column history) resume and take SQL DML; only duplicate/non-positive
    * ids are refused. The current schema must be the LATEST of the
    * history (the writer always commits with the last). Format v2 only. */
  def resumeWriter(spark: SparkSession, location: String): Writer = {
    resumeWriterImpl(spark, location)
  }

  /** Optimistic-concurrency append: commit `files` to the table at
    * `location`, resuming from the CURRENT metadata and retrying on a
    * lost commit race — the Iceberg commit protocol for parallel jobs
    * appending to one table. The data files are already staged and
    * immutable, so a retry re-publishes metadata only (O(manifest), no
    * data IO); the losing attempt's partial metadata files were rolled
    * back by the writer before the ConcurrentModificationException
    * surfaced. Returns the winning writer (for follow-up reads). */
  def appendWithRetry(spark: SparkSession, location: String,
      files: Seq[DataFileInfo], maxAttempts: Int = 10): Writer = {
    var attempt = 0
    while (true) {
      val w = resumeWriterImpl(spark, location)
      try { w.commit(files); return w }
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def resumeWriterImpl(spark: SparkSession, location: String): Writer = {
    implicit val fmts: Formats = DefaultFormats
    val metaPath = currentMetadataPath(spark, location)
    val mPath    = new Path(metaPath)
    val fs       = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val md       = JsonMethods.parse(readText(fs, mPath))
    require((md \ "format-version").extract[Int] == 2,
      "resumeWriter supports format-version 2 only")
    // schema history, ordered by schema-id; ids contiguous-from-0, current = last
    val schemasJ = (md \ "schemas") match {
      case JArray(ss) => ss.sortBy(s => (s \ "schema-id").extractOpt[Int].getOrElse(0))
      case _          => List(md \ "schema")
    }
    require(schemasJ.zipWithIndex.forall { case (s, i) =>
      (s \ "schema-id").extractOpt[Int].getOrElse(0) == i },
      "resumeWriter requires contiguous schema ids from 0")
    require((md \ "current-schema-id").extractOpt[Int].getOrElse(0) == schemasJ.size - 1,
      "resumeWriter requires the current schema to be the latest")
    // top-level field ids re-emit VERBATIM — sparse layouts (a
    // dropped-column history leaves gaps) resume fine; only duplicate or
    // non-positive ids are refused
    val parsedSchemas = schemasJ.map(schemaFields)
    parsedSchemas.foreach { case (st, ids) =>
      require(ids.length == st.fields.length &&
        ids.distinct.length == ids.length && ids.forall(_ > 0),
        s"resumeWriter requires distinct positive field ids, got $ids")
    }
    val allSchemas  = parsedSchemas.map(_._1)
    val allFieldIds = parsedSchemas.map(_._2)
    // nested ids restore from the JSON verbatim — the committed record is
    // the truth a nested rename/drop must never renumber
    val allNestedIds = schemasJ.map(parseNestedIds)
    // spec history, same shape rules
    val specsJ = (md \ "partition-specs").extract[List[JObject]]
      .sortBy(sp => (sp \ "spec-id").extractOpt[Int].getOrElse(0))
    require(specsJ.zipWithIndex.forall { case (sp, i) =>
      (sp \ "spec-id").extractOpt[Int].getOrElse(0) == i },
      "resumeWriter requires contiguous spec ids from 0")
    // the default spec may point anywhere in the history (commitDelta
    // appends an auxiliary unpartitioned spec PAST the default)
    val defaultSpecId0 = (md \ "default-spec-id").extractOpt[Int].getOrElse(0)
    require(defaultSpecId0 >= 0 && defaultSpecId0 < math.max(1, specsJ.size),
      s"default-spec-id $defaultSpecId0 out of range")
    val specTuples: List[Seq[(String, Int, Int, String)]] =
      if (specsJ.isEmpty) List(Seq.empty)
      else specsJ.map { sp =>
        (sp \ "fields").extract[List[JObject]].map { f =>
          ((f \ "name").extract[String], (f \ "source-id").extract[Int],
            (f \ "field-id").extract[Int], (f \ "transform").extract[String])
        }: Seq[(String, Int, Int, String)]
      }
    val uuid = (md \ "table-uuid").extract[String]
    // version of the RESOLVED metadata file (currentMetadataPath walks
    // forward past a stale hint), not the raw hint value
    val version = {
      val VPat = raw"v(\d+)\.metadata\.json".r
      mPath.getName match {
        case VPat(n) => n.toInt
        case other   => throw new IllegalStateException(s"unversioned metadata file $other")
      }
    }
    // one walk over the snapshots array feeds all three restored maps —
    // resumeWriter runs per DML commit, so the extraction cost matters
    // on long snapshot logs
    val snapsJ = (md \ "snapshots").extract[List[JObject]]
    val committed = snapsJ.map { s =>
      ((s \ "snapshot-id").extract[Long], (s \ "manifest-list").extract[String])
    }
    // summary operations and schema ids survive the resume
    // (absent/legacy = append / schema 0)
    val snapOps0 = snapsJ.flatMap { s =>
      (s \ "summary" \ "operation").extractOpt[String].filter(_ != "append")
        .map((s \ "snapshot-id").extract[Long] -> _)
    }.toMap
    val snapSchemaIds0 = snapsJ.flatMap { s =>
      (s \ "schema-id").extractOpt[Int].filter(_ != 0)
        .map((s \ "snapshot-id").extract[Long] -> _)
    }.toMap
    val curList = committed.lastOption.map(_._2).getOrElse(
      throw new IllegalStateException(s"no snapshots to resume at $location"))
    val manifests = readAvro(fs, new Path(curList)).map { r =>
      val added    = r.get("added_files_count").asInstanceOf[Int]
      val existing = r.get("existing_files_count").asInstanceOf[Int]
      (r.get("manifest_path").toString,
        r.get("manifest_length").asInstanceOf[Long],
        r.get("added_snapshot_id").asInstanceOf[Long],
        r.get("sequence_number").asInstanceOf[Long],
        r.get("content").asInstanceOf[Int],
        added + existing,
        r.get("added_rows_count").asInstanceOf[Long] +
          r.get("existing_rows_count").asInstanceOf[Long],
        r.get("partition_spec_id").asInstanceOf[Int],
        existing > 0,
        parseSummaries(r)) // carried pruning evidence survives the resume
    }.toList
    val w = new Writer(spark, location, allSchemas.head, Nil, uuid, startVersion = version)
    w.restore(committed, manifests, allSchemas, specTuples, defaultSpecId0, allFieldIds,
      readById = (md \ "properties" \ "graft.read-by-id").extractOpt[String].contains("true"),
      snapOps0 = snapOps0, snapSchemaIds0 = snapSchemaIds0, nestedIds0 = allNestedIds)
    // declared sort orders survive the resume (identity fields are all
    // this writer emits); order 0 is implicit and skipped
    val orders = (md \ "sort-orders").extractOpt[List[JObject]].getOrElse(Nil).flatMap { o =>
      val oid = (o \ "order-id").extract[Int]
      if (oid == 0) None
      else Some(oid -> ((o \ "fields").extract[List[JObject]].map { f =>
        ((f \ "source-id").extract[Int],
          (f \ "direction").extractOpt[String].getOrElse("asc"),
          (f \ "null-order").extractOpt[String].getOrElse("nulls-first"))
      }: Seq[(Int, String, String)]))
    }
    if (orders.nonEmpty)
      w.setSortOrders(orders, (md \ "default-sort-order-id").extractOpt[Int].getOrElse(0))
    // free-form properties survive too (read-by-id is restored above)
    (md \ "properties").extractOpt[Map[String, String]].getOrElse(Map.empty)
      .filter(_._1 != "graft.read-by-id")
      .foreach { case (k, v) => w.setProperty(k, v) }
    // registered statistics files survive the resume (dropped only when
    // their snapshot expires)
    w.setStatistics(statisticsEntries(spark, metaPath).toList)
    // column defaults (v3 initial-default) re-emit verbatim
    w.setDefaults(parseDefaultsJson(schemasJ.last).map { case (id, v) =>
      id -> JsonMethods.compact(JsonMethods.render(v))
    })
    w.setPartitionStatistics(partitionStatisticsEntries(spark, metaPath).toList)
    // v3 row-lineage allocator + per-snapshot bases re-emit verbatim
    // (pre-lineage tables restore 0/empty: their files carry no field
    // 142 and read null lineage, the spec's unassigned state)
    w.setRowLineage(
      (md \ "next-row-id").extractOpt[Long].getOrElse(0L),
      (md \ "snapshots") match {
        case JArray(ss) => ss.flatMap(s =>
          (s \ "first-row-id").extractOpt[Long].map(v =>
            (s \ "snapshot-id").extract[Long] -> v)).toMap
        case _ => Map.empty[Long, Long]
      })
    w
  }
}
