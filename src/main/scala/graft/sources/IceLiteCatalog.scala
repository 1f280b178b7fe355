package graft.sources

import graft.icelite.{FsCatalog, IceTable}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** Spark catalog plugin over the IceLite warehouse — the last mile of the
  * SQL surface: register once with
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.icelite", "graft.sources.IceLiteCatalog")
  * spark.conf.set("spark.sql.catalog.icelite.warehouse", "/warehouse")
  * }}}
  *
  * and every table in the warehouse is addressable from PLAIN SQL:
  * `SELECT ... FROM icelite.ns.t`, `INSERT INTO icelite.ns.t SELECT ...`,
  * `CREATE TABLE icelite.ns.t (...)`, `DROP TABLE`, `SHOW TABLES IN
  * icelite.ns`, `SHOW NAMESPACES IN icelite` — all resolving through the
  * same [[IceLiteV2Table]] the format("icelite") path uses, so file
  * skipping, storage-partitioned joins, metadata-only counts, DPP, the
  * CAS write path and planner statistics apply unchanged to SQL-by-name
  * access. (The reference reaches its tables by name through DuckDB
  * `ATTACH`; this is the Spark-native equivalent.) */
final class IceLiteCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var fsCatalog: FsCatalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name: set spark.sql.catalog.$name.warehouse"))
    fsCatalog = new FsCatalog(SparkSession.active, wh)
  }

  override def name(): String = catalogName

  private def ns1(namespace: Array[String]): String = {
    require(namespace.length == 1,
      s"icelite namespaces are single-level, got ${namespace.mkString(".")}")
    namespace.head
  }

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] =
    fsCatalog.listTables(ns1(namespace))
      .map(t => Identifier.of(namespace, t)).toArray

  override def loadTable(ident: Identifier): Table = {
    val ice =
      try fsCatalog.loadTable(ns1(ident.namespace()), ident.name())
      catch {
        case _: NoSuchElementException =>
          throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
            Seq(catalogName) ++ ident.namespace() :+ ident.name())
      }
    new IceLiteV2Table(ice, ice.metadata.currentSnapshot)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    val ns = ns1(ident.namespace())
    if (fsCatalog.tableExists(ns, ident.name()))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Seq(catalogName, ns, ident.name()))
    val partCols = partitions.map { t =>
      require(t.name() == "identity",
        s"icelite supports identity partitioning only, got ${t.describe()}")
      t.references()(0).fieldNames().mkString(".")
    }
    fsCatalog.createNamespace(ns)
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(fsCatalog.warehouse, ns),
      s"${ident.name()}_${java.util.UUID.randomUUID().toString.take(8)}")
    val ice = IceTable.create(SparkSession.active, loc.toString,
      ident.name(), ns, schema, partCols.toIndexedSeq)
    new IceLiteV2Table(ice, ice.metadata.currentSnapshot)
  }

  /** ALTER TABLE ADD COLUMN(S): metadata-only additive evolution through
    * [[IceTable.addColumns]] (fresh field ids, CAS commit, old files read
    * as NULL). Every other change kind is rejected loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          s"icelite ADD COLUMN supports top-level columns, got ${a.fieldNames().mkString(".")}")
        org.apache.spark.sql.types.StructField(
          a.fieldNames().head, a.dataType(), nullable = true)
      case other =>
        throw new UnsupportedOperationException(
          s"icelite ALTER TABLE supports ADD COLUMN only, got $other")
    }
    val ice = fsCatalog.loadTable(ns1(ident.namespace()), ident.name())
    ice.addColumns(adds)
    val reloaded = fsCatalog.loadTable(ns1(ident.namespace()), ident.name())
    new IceLiteV2Table(reloaded, reloaded.metadata.currentSnapshot)
  }

  override def dropTable(ident: Identifier): Boolean =
    fsCatalog.dropTable(ns1(ident.namespace()), ident.name())

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("icelite RENAME TABLE not supported")

  override def tableExists(ident: Identifier): Boolean =
    fsCatalog.tableExists(ns1(ident.namespace()), ident.name())

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    fsCatalog.listNamespaces().map(n => Array(n)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      if (!namespaceExists(namespace))
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
          Seq(catalogName) ++ namespace)
      Array.empty // single-level: no nested namespaces
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && fsCatalog.listNamespaces().contains(namespace.head)

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        Seq(catalogName) ++ namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(
      namespace: Array[String], metadata: JMap[String, String]): Unit =
    fsCatalog.createNamespace(ns1(namespace))

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("icelite namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "icelite DROP NAMESPACE: use FsCatalog.cleanupWarehouse (double-confirmed)")
}
