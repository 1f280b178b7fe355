package graft.icelite

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV -> IceLite ingestion pipeline (the `csv_to_iceberg_pipeline` of the
  * reference, `bot_iceberg_loader.py:371-463`, SURVEY.md §3.1):
  * resolve sources (remote / glob / local) -> Spark CSV parse with schema
  * inference (header, multiLine for quoted newlines) -> normalize onto the
  * 8-type system -> create-or-replace table + snapshot commit.
  *
  * Distribution shape: the driver resolves names and commits metadata;
  * executors parse CSV partitions and write parquet — the 100 TB-scalable
  * version of the reference's single-process loop. (`multiLine` CSVs are
  * not input-splittable; per-file parallelism still applies, and the option
  * can be disabled for newline-free sources.)
  */
final case class IngestConfig(
    source: String,                    // local path, URL, or glob dir
    globPattern: Option[String] = None,
    namespace: String = "default",
    explicitTableName: Option[String] = None, // honored only for single-file loads
    mergeGlob: Boolean = false,        // reference S16 flag — implemented properly here
    pluralizeNames: Boolean = false,   // reference ICE_PLURALIZE_TABLE default

    multiLine: Boolean = true
)

final case class IngestResult(namespace: String, table: String, rows: Long, location: String)

final class IngestJob(spark: SparkSession, catalog: FsCatalog, tmpDir: String) {

  /** First line of a file — the CSV header, for near-zero-cost drift
    * detection. (A quoted, embedded-newline header would read partially;
    * such files just take the safe per-file merge path.) */
  private def headerLine(path: String): String = {
    val p  = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val br = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
      Option(br.readLine()).getOrElse("")
    } finally in.close()
  }

  private def readCsv(paths: Seq[String], multiLine: Boolean): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("multiLine", multiLine.toString)
      .csv(paths: _*)
    TypeNormalizer.normalize(df)
  }

  def run(conf: IngestConfig): Seq[IngestResult] = {
    val files = SourceResolver.filesToProcess(conf.source, conf.globPattern, tmpDir)
    if (files.isEmpty) return Seq.empty
    catalog.createNamespace(conf.namespace)

    if (conf.mergeGlob && files.size > 1) {
      // merged load: all files -> one table. Spark's multi-path CSV read
      // matches columns by POSITION, which silently misaligns files whose
      // headers drifted — so the column sets are checked first: identical
      // headers take the fast single-inference read; drifted headers fall
      // back to per-file reads merged with unionByName(null-fill), the
      // schema-evolution semantics a lakehouse loader owes its caller.
      val name = conf.explicitTableName.getOrElse(
        NameResolver.tableNameFor(files.head._2, conf.pluralizeNames))
      // drift detection reads only each file's HEADER LINE (not a full
      // per-file inference pass): identical headers take the single
      // multi-path inference read; drifted headers fall back to per-file
      // reads merged by name
      val df =
        if (files.map(f => headerLine(f._1)).distinct.size == 1)
          readCsv(files.map(_._1), conf.multiLine)
        else files.map(f => readCsv(Seq(f._1), conf.multiLine))
          .reduce(_.unionByName(_, allowMissingColumns = true))
      val t = catalog.createOrReplaceTable(conf.namespace, name, df)
      Seq(IngestResult(conf.namespace, name, t.scan().count(), t.location.toString))
    } else {
      // one table per file; explicit name only honored for single-file loads
      files.map { case (path, fileName) =>
        val name =
          if (files.size == 1 && conf.explicitTableName.isDefined) conf.explicitTableName.get
          else NameResolver.tableNameFor(fileName, conf.pluralizeNames)
        val df = readCsv(Seq(path), conf.multiLine)
        val t  = catalog.createOrReplaceTable(conf.namespace, name, df)
        IngestResult(conf.namespace, name, t.scan().count(), t.location.toString)
      }
    }
  }
}
