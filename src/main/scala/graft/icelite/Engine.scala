package graft.icelite

import graft.queries.Ref
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The query surface of the engine (SURVEY.md §3.2/§3.3 Spark-native shape):
  * lazy snapshot-planned table scans, temp-view registration, parameterized
  * SQL with `{table}` substitution, DESCRIBE/listing introspection and
  * CSV/Parquet exporters — everything the reference does through the
  * PyIceberg→Arrow→DuckDB bridge, as one Catalyst-planned path.
  *
  * Unlike the reference bridge (which materializes the whole table into RAM
  * before any filter — `table.scan().to_arrow()`), `table()` returns a lazy
  * DataFrame: filters/projections push into the parquet scan, so only the
  * needed bytes are read — the property that matters at 100 TB.
  */
final class Engine(val spark: SparkSession, val catalog: FsCatalog) {

  /** `engine.table("ns.users")` -> lazy DataFrame over the current snapshot. */
  def table(ident: String): DataFrame = {
    val (ns, name) = split(ident)
    catalog.loadTable(ns, name).scan()
  }

  /** Time travel by snapshot id. */
  def tableAt(ident: String, snapshotId: Long): DataFrame = {
    val (ns, name) = split(ident)
    catalog.loadTable(ns, name).scanSnapshot(snapshotId)
  }

  /** Scan straight from a metadata JSON path (reference `iceberg_scan`) —
    * pinned to that metadata version, like DuckDB's iceberg_scan. */
  def scanMetadata(metadataPath: String): DataFrame =
    IceTable.scanMetadataFile(spark, metadataPath)

  /** Scan a STANDARD Apache Iceberg table from its `vN.metadata.json` —
    * the reference's `iceberg_scan('{metadata}')` against real Iceberg
    * tables (`query_iceberg_minio.ipynb:274-277`), resolved through the
    * spec's metadata → manifest-list Avro → manifest Avro chain. */
  def scanIcebergMetadata(metadataPath: String): DataFrame =
    IcebergFormat.scan(spark, metadataPath)

  /** Register `ident` as a temp view (the `conn.register` of the bridge). */
  def registerView(ident: String, viewName: String): Unit =
    table(ident).createOrReplaceTempView(viewName)

  /** Parameterized SQL with `{table}` placeholder substitution
    * (`query_iceberg_minio.ipynb:1119-1180` semantics). The temp view is
    * deterministic per table identity, so repeated parameterized queries
    * reuse one catalog entry instead of growing it without bound. */
  def sql(ident: String, query: String): DataFrame = {
    val viewName = "tbl_" + ident.replaceAll("[^A-Za-z0-9_]", "_")
    registerView(ident, viewName)
    // spark.sql analyzes eagerly, inlining the view into the returned plan,
    // so the view can be dropped immediately without invalidating the result
    try spark.sql(query.replace("{table}", viewName))
    finally spark.catalog.dropTempView(viewName)
  }

  /** Namespace-wide SQL: every table of `ns` registered as a view under
    * its bare table name, then the query runs against them — the
    * multi-table surface of the reference notebooks (`users JOIN
    * netflix_titles`, `blog-zero-cost-data-lakehouse-part-3.md:337-343`,
    * where each table is a registered DuckDB view). Views drop after the
    * plan is analyzed, as in [[sql]]. */
  def sqlCatalog(ns: String, query: String): DataFrame = {
    val names = catalog.listTables(ns)
    names.foreach(t => registerView(s"$ns.$t", t))
    try spark.sql(query)
    finally names.foreach(t => spark.catalog.dropTempView(t))
  }

  /** DESCRIBE: (column_name, column_type) with DuckDB-style type names
    * (reference M1/M2). */
  def describe(ident: String): DataFrame = {
    import spark.implicits._
    table(ident).schema.fields
      .map(f => (f.name, Ref.duckTypeName(f.dataType)))
      .toSeq
      .toDF("column_name", "column_type")
  }

  /** Catalog listing as a DataFrame (reference M3 / S8). */
  def listing(): DataFrame = {
    import spark.implicits._
    catalog
      .listNamespaces()
      .flatMap(ns => catalog.listTables(ns).map(t => (ns, t, catalog.metadataLocation(ns, t))))
      .toDF("table_namespace", "table_name", "metadata_location")
  }

  /** COPY (query) TO csv (reference S13): single header CSV file. */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** COPY (query) TO parquet (reference S14). */
  def exportParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  private def split(ident: String): (String, String) = ident.split('.') match {
    case Array(ns, t) => (ns, t)
    case Array(t)     => ("default", t)
    case other        => (other.dropRight(1).mkString("."), other.last)
  }
}
