package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are single parquet files under `sfDir`. The `events` table is
  * written with nanosecond-precision timestamps, which Spark's parquet reader
  * rejects by default ([PARQUET_TYPE_ILLEGAL]); we read them as raw nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds as
  * TIMESTAMP_NTZ — bit-identical to what DuckDB produces for the same file,
  * which keeps the differential oracle exact.
  *
  * Scale note: each loader returns a *lazy* DataFrame over the parquet scan;
  * Catalyst pushes filters/projections into the scan (verified via
  * `.explain`: PushedFilters / ReadSchema), so downstream operators decide
  * how much is actually read. Nothing here materializes data on the driver.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events with `ts` as TIMESTAMP_NTZ (µs, matching DuckDB's read).
    * The driver testdata stores nanosecond INT64 timestamps (read as raw
    * longs); re-exported copies may already carry a timestamp type. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ => df
    }
  }

  /** Fan a scan out to all cores before CPU-heavy per-row work (shingling,
    * vector kernels). The testdata files are one parquet row group each, so
    * a scan is one task no matter how `maxPartitionBytes` is set; spreading
    * costs one tiny shuffle of the raw rows and buys full parallelism on
    * the expensive compute stage. At production scale inputs arrive in many
    * splits and the same call just rebalances the compute stage's input —
    * it never gates the IO path. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
