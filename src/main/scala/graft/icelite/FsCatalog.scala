package graft.icelite

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.nio.charset.StandardCharsets

/** Filesystem-backed catalog: `namespace -> table -> metadata_location`
  * (the role Nessie/SQLite catalogs play in the reference —
  * `bot_iceberg_loader.py:245-281`, `query_iceberg_minio.ipynb:108-118` —
  * behind a pluggable trait as the reference keeps it).
  *
  * Layout: `<warehouse>/<namespace>/<table>_<uuid8>/` table dirs; the
  * registry is re-derivable from the filesystem (namespace dirs + each
  * table's `metadata/version-hint.text`), so there is no second source of
  * truth to corrupt — catalog lookups just resolve the latest vN.json.
  */
trait IceCatalog {
  def createNamespace(ns: String): Unit
  def listNamespaces(): Seq[String]
  def listTables(ns: String): Seq[String]
  def tableExists(ns: String, table: String): Boolean
  def createOrReplaceTable(ns: String, table: String, df: DataFrame,
      partitionColumns: Seq[String] = Nil): IceTable
  def loadTable(ns: String, table: String): IceTable
  def metadataLocation(ns: String, table: String): String
  def dropTable(ns: String, table: String): Boolean
}

final class FsCatalog(spark: SparkSession, val warehouse: String) extends IceCatalog {

  private val root = new Path(warehouse)
  private def fs: FileSystem = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nsPath(ns: String) = new Path(root, ns)

  /** Idempotent namespace create (`bot_iceberg_loader.py:419-427`). */
  override def createNamespace(ns: String): Unit = { fs.mkdirs(nsPath(ns)); () }

  override def listNamespaces(): Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toIndexedSeq.filter(_.isDirectory).map(_.getPath.getName).sorted

  /** Table dirs are `<name>_<uuid8>`; strip the suffix for listing. */
  override def listTables(ns: String): Seq[String] =
    if (!fs.exists(nsPath(ns))) Seq.empty
    else
      fs.listStatus(nsPath(ns)).toIndexedSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .flatMap(stripUuid)
        .sorted

  private def stripUuid(dirName: String): Option[String] = {
    val i = dirName.lastIndexOf('_')
    if (i > 0) Some(dirName.substring(0, i)) else None
  }

  private def tableDir(ns: String, table: String): Option[Path] =
    if (!fs.exists(nsPath(ns))) None
    else
      fs.listStatus(nsPath(ns)).toIndexedSeq
        .filter(_.isDirectory)
        .map(_.getPath)
        .find(p => stripUuid(p.getName).contains(table))

  override def tableExists(ns: String, table: String): Boolean = tableDir(ns, table).isDefined

  /** Drop-if-exists then create at a fresh UUID-suffixed location, then
    * append (`bot_iceberg_loader.py:284-316` semantics). */
  override def createOrReplaceTable(ns: String, table: String, df: DataFrame,
      partitionColumns: Seq[String] = Nil): IceTable = {
    createNamespace(ns)
    dropTable(ns, table)
    val loc = new Path(nsPath(ns), s"${table}_${java.util.UUID.randomUUID().toString.take(8)}")
    val t   = IceTable.create(spark, loc.toString, table, ns, df.schema, partitionColumns)
    t.append(df)
  }

  override def loadTable(ns: String, table: String): IceTable =
    tableDir(ns, table) match {
      case Some(p) => IceTable.load(spark, p.toString)
      case None    => throw new NoSuchElementException(s"table $ns.$table not found in $warehouse")
    }

  /** Reference S9: resolve `(ns, table) -> metadata_location`. */
  override def metadataLocation(ns: String, table: String): String =
    loadTable(ns, table).metadataLocation

  override def dropTable(ns: String, table: String): Boolean =
    tableDir(ns, table) match {
      case Some(p) => fs.delete(p, true)
      case None    => false
    }

  /** Reference S15 warehouse cleanup: list then recursively delete
    * everything under the warehouse prefix. Returns the deleted paths
    * (preview semantics of `clean_r2_warehouse.py:78-107`).
    *
    * Destructive runs are double-gated like the reference's interactive
    * confirm-twice protocol (`clean_r2_warehouse.py:52-58,89-101`: first a
    * yes/no, then the user must retype the bucket name): a non-dry-run
    * call must pass `confirm = Some(<warehouse leaf name>)` — the caller
    * proving it knows WHICH warehouse it is destroying. A missing or
    * mismatched token throws and deletes nothing; `dryRun = true` never
    * needs a token. */
  def cleanupWarehouse(dryRun: Boolean = false, confirm: Option[String] = None): Seq[String] = {
    if (!dryRun) {
      val expected = root.getName
      if (!confirm.contains(expected))
        throw new IllegalArgumentException(
          s"refusing destructive cleanup of '$warehouse': pass confirm = Some(\"$expected\") " +
            s"(got ${confirm.fold("no token")(t => s"'$t'")}); preview with dryRun = true")
    }
    if (!fs.exists(root)) return Seq.empty
    val all = {
      val it  = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) buf += it.next().getPath.toString
      buf.toSeq.sorted
    }
    if (!dryRun) fs.delete(root, true)
    all
  }
}
