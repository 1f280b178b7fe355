package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (usually) an ANSI-SQL
  * oracle that DuckDB runs over the same parquet tables. The driver hash-
  * compares the two result sets (columns sorted by name), so every computed
  * column is aliased identically on both sides and every query ends in a
  * deterministic total ORDER BY. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
