package graft.icelite

import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** IceLite table metadata: the snapshot-versioned table descriptor our
  * engine commits as `metadata/vN.json` (the role PyIceberg's metadata JSON
  * plays in the reference — see SURVEY.md §1.1/§7.2 step 2; we implement the
  * format natively because no Iceberg runtime jar ships in this image).
  *
  * - `fields` carry 1-based field ids + required flags
  *   (`bot_iceberg_loader.py:206,232-239` semantics) for schema evolution.
  * - `schemaJson` is the Spark StructType serialization — the engine-native
  *   schema used to re-plan scans with exact types.
  * - each snapshot lists the parquet files valid at that version; appends
  *   add files, replaces reset them. Time travel = re-plan from an older
  *   snapshot's file list.
  */
final case class FieldInfo(id: Int, name: String, `type`: String, required: Boolean)

/** A named ref into the snapshot log (the Nessie/Iceberg refs concept the
  * reference's catalog exposes — `bot_iceberg_loader.py:245-281` configures a
  * Nessie REST catalog precisely for its Git-like branching). `branch` refs
  * move on commit; `tag` refs are immutable pins. "main" is implicit: it is
  * the table's `current_snapshot_id`. */
final case class RefInfo(snapshot_id: Long, ref_type: String) // "branch" | "tag"

/** Per-file, per-column value range (stringified; parsed per schema type).
  * The planner skips files whose range can't satisfy a predicate. */
final case class ColRange(min: Option[String], max: Option[String])

final case class Snapshot(
    snapshot_id: Long,
    timestamp_ms: Long,
    operation: String, // "append" | "replace" | "compact"
    files: List[String], // relative to table location
    file_stats: Option[Map[String, Map[String, ColRange]]] = None, // file -> col -> range
    parent_snapshot_id: Option[Long] = None, // commit DAG edge; None/0 = table root
    commit_token: Option[String] = None // idempotency key (streaming batch id)
)

final case class TableMetadata(
    format_version: Int,
    table_uuid: String,
    name: String,
    namespace: String,
    location: String,
    schemaJson: String,
    fields: List[FieldInfo],
    current_snapshot_id: Long,
    snapshots: List[Snapshot],
    partition_columns: Option[List[String]] = None, // hive-style layout when set
    refs: Option[Map[String, RefInfo]] = None, // named branches/tags beyond main
    retired_tokens: Option[List[String]] = None // idempotency keys of expired snapshots
) {
  def partitionCols: List[String] = partition_columns.getOrElse(Nil)

  def refMap: Map[String, RefInfo] = refs.getOrElse(Map.empty)

  /** Every idempotency token the table has ever absorbed — live snapshots'
    * plus those preserved across snapshot expiration. */
  def knownTokens: Set[String] =
    snapshots.flatMap(_.commit_token).toSet ++ retired_tokens.getOrElse(Nil)

  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]

  def currentSnapshot: Option[Snapshot] = snapshots.find(_.snapshot_id == current_snapshot_id)

  def snapshot(id: Long): Option[Snapshot] = snapshots.find(_.snapshot_id == id)

  def toJson: String = {
    implicit val fmts: Formats = TableMetadata.formats
    Serialization.writePretty(this)
  }
}

object TableMetadata {
  private[icelite] implicit val formats: Formats = DefaultFormats

  def fromJson(s: String): TableMetadata =
    JsonMethods.parse(s).extract[TableMetadata]

  def fieldsOf(schema: StructType): List[FieldInfo] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      FieldInfo(i + 1, f.name, f.dataType.catalogString, required = !f.nullable)
    }.toList

  def create(
      name: String,
      namespace: String,
      location: String,
      schema: StructType,
      partitionColumns: Seq[String] = Nil): TableMetadata =
    TableMetadata(
      format_version = 1,
      table_uuid = java.util.UUID.randomUUID().toString,
      name = name,
      namespace = namespace,
      location = location,
      schemaJson = schema.json,
      fields = fieldsOf(schema),
      current_snapshot_id = 0L,
      snapshots = Nil,
      partition_columns = if (partitionColumns.isEmpty) None else Some(partitionColumns.toList)
    )
}
