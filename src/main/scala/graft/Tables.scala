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
