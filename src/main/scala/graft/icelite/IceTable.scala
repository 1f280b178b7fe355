package graft.icelite

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** A snapshot-versioned parquet table (the IceLite format):
  *
  * {{{
  * <location>/
  *   data/snap-<id>-<uuid>/part-*.parquet   // files of one commit
  *   metadata/v<N>.json                      // TableMetadata versions
  *   metadata/version-hint.text              // latest N (fast lookup)
  * }}}
  *
  * Commit protocol (SURVEY.md §7.5): executors write parquet data files
  * first; the driver then writes `v<N>.json` to a temp name and atomically
  * `FileSystem.rename`s it into place, finally updating the version hint.
  * Readers resolve the hint (or highest vN) and plan from the snapshot's
  * file list — so a reader never observes a half-committed version.
  * Single-writer per table, like the reference's drop-and-recreate loader.
  *
  * Scans hand Spark the snapshot's file list with the frozen schema —
  * filters/projections push into the parquet reader exactly as for a plain
  * `spark.read.parquet`, and partition-parallelism follows file/row-group
  * splits, so a 1000-executor cluster scans an IceLite table at full width.
  */
final class IceTable private (val spark: SparkSession, val location: Path) {

  private def fs: FileSystem = location.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metadataDir = new Path(location, "metadata")
  private def hintFile    = new Path(metadataDir, "version-hint.text")

  // ------------------------------------------------------------- metadata io

  private def readFile(p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n   = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeFileAtomic(p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + "." + java.util.UUID.randomUUID() + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) throw new IllegalStateException(s"commit rename failed: $tmp -> $p")
  }

  def currentVersion: Int =
    if (fs.exists(hintFile)) readFile(hintFile).trim.toInt
    else {
      val versions = listVersions()
      if (versions.isEmpty) 0 else versions.max
    }

  private def listVersions(): Seq[Int] =
    if (!fs.exists(metadataDir)) Seq.empty
    else
      fs.listStatus(metadataDir).toIndexedSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".json") => n.stripPrefix("v").stripSuffix(".json") }
        .flatMap(s => scala.util.Try(s.toInt).toOption)

  def metadata: TableMetadata = metadataAt(currentVersion)

  def metadataAt(version: Int): TableMetadata =
    TableMetadata.fromJson(readFile(new Path(metadataDir, s"v$version.json")))

  def metadataLocation: String = new Path(metadataDir, s"v$currentVersion.json").toString

  private def commit(md: TableMetadata): Int = {
    val next = currentVersion + 1
    writeFileAtomic(new Path(metadataDir, s"v$next.json"), md.toJson)
    writeFileAtomic(hintFile, next.toString)
    next
  }

  // ------------------------------------------------------------------ writes

  /** Append `df` as a new snapshot (reference `table.append`). */
  def append(df: DataFrame): IceTable = appendInternal(df, replace = false)

  /** Replace table contents with `df` (drop-and-recreate semantics). */
  def replace(df: DataFrame): IceTable = appendInternal(df, replace = true)

  private def appendInternal(df: DataFrame, replace: Boolean): IceTable = {
    val md     = metadata
    val snapId = md.snapshots.map(_.snapshot_id).foldLeft(0L)(math.max) + 1
    val dataRel = s"data/snap-$snapId-${java.util.UUID.randomUUID().toString.take(8)}"
    val dataDir = new Path(location, dataRel)
    df.write.parquet(dataDir.toString)
    val files = fs
      .listStatus(dataDir).toIndexedSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => s"$dataRel/${st.getPath.getName}")
      .sorted
    val base  = if (replace) Nil else md.currentSnapshot.map(_.files).getOrElse(Nil)
    val snap = Snapshot(
      snapshot_id = snapId,
      timestamp_ms = System.currentTimeMillis(),
      operation = if (replace) "replace" else "append",
      files = base ++ files
    )
    commit(md.copy(current_snapshot_id = snapId, snapshots = md.snapshots :+ snap))
    this
  }

  // ------------------------------------------------------------------- reads

  /** Lazy DataFrame over the current snapshot. */
  def scan(): DataFrame = scanSnapshot(metadata.current_snapshot_id)

  /** Time travel: lazy DataFrame over snapshot `id`'s file list. */
  def scanSnapshot(id: Long): DataFrame = {
    val md = metadata
    val snap = md
      .snapshot(id)
      .getOrElse(throw new NoSuchElementException(s"snapshot $id of table ${md.name}"))
    val paths = snap.files.map(f => new Path(location, f).toString)
    if (paths.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], md.schema)
    else spark.read.schema(md.schema).parquet(paths: _*)
  }

  def snapshots(): Seq[Snapshot] = metadata.snapshots

  /** Delete all table data + metadata (reference drop_table). */
  def drop(): Unit = fs.delete(location, true)
}

object IceTable {

  /** Create a new table directory with a v1 metadata (no data yet). */
  def create(
      spark: SparkSession,
      location: String,
      name: String,
      namespace: String,
      schema: org.apache.spark.sql.types.StructType): IceTable = {
    val t  = new IceTable(spark, new Path(location))
    val fs = t.location.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(t.location)) throw new IllegalStateException(s"table location exists: $location")
    fs.mkdirs(new Path(t.location, "metadata"))
    t.writeFileAtomic(
      new Path(new Path(t.location, "metadata"), "v1.json"),
      TableMetadata.create(name, namespace, location, schema).toJson)
    t.writeFileAtomic(new Path(new Path(t.location, "metadata"), "version-hint.text"), "1")
    t
  }

  /** Load an existing table from its location. */
  def load(spark: SparkSession, location: String): IceTable =
    new IceTable(spark, new Path(location))

  /** Load straight from a metadata file path (reference `iceberg_scan`
    * entry, SURVEY.md §2.1 S11). */
  def fromMetadataFile(spark: SparkSession, metadataPath: String): IceTable = {
    val p = new Path(metadataPath)
    new IceTable(spark, p.getParent.getParent)
  }
}
