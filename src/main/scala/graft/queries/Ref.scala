package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity operators — the query shapes exercised by
  * senthilsweb/apache-iceberg (SURVEY.md §2.11 Q1–Q12), re-expressed over the
  * driver's testdata tables. Every query is declarative DataFrame DSL: scans
  * stay lazy, filters/projections push into the parquet reader, aggregates
  * run partial+final, and the topk shapes fuse to TakeOrderedAndProject.
  *
  * Determinism: `(l_orderkey, l_linenumber)` is NOT unique in the testdata,
  * so lineitem row-level queries order by a compound key that is.
  */
object Ref {

  /** Compound deterministic sort key for lineitem row-level output. */
  private val liKey = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
  private val liKeySql = liKey.mkString(", ")

  /** Spark type -> DuckDB DESCRIBE type name (SURVEY.md §2.7 M1/M2). */
  private[graft] def duckTypeName(dt: DataType): String = dt match {
    case LongType         => "BIGINT"
    case IntegerType      => "INTEGER"
    case ShortType        => "SMALLINT"
    case DoubleType       => "DOUBLE"
    case FloatType        => "FLOAT"
    case StringType       => "VARCHAR"
    case BooleanType      => "BOOLEAN"
    case DateType         => "DATE"
    case TimestampNTZType => "TIMESTAMP"
    case TimestampType    => "TIMESTAMP WITH TIME ZONE"
    case ArrayType(e, _)  => duckTypeName(e) + "[]"
    case d: DecimalType   => s"DECIMAL(${d.precision},${d.scale})"
    case _                => dt.sql
  }

  /** ref02: schema introspection (reference DESCRIBE, query_iceberg.ipynb:524-528). */
  private def schemaOf(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.schema.fields
      .map(f => (f.name, duckTypeName(f.dataType)))
      .toSeq
      .toDF("column_name", "column_type")
      .orderBy("column_name")
  }

  /** ref05: the 10-way UNION ALL of filtered counts
    * (preference-analysis shape, query_iceberg.ipynb:910-933).
    *
    * Single-pass implementation: the 10 branches partition the rows by
    * (event_type, value bucket), so one grouped scan + a left join against
    * the branch universe (to emit 0-count branches, matching UNION ALL
    * semantics) replaces 10 scans. At 100 TB that is the only sane plan. */
  private def unionAll(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val universe = (for {
      t   <- Seq("click", "error", "purchase", "signup", "view")
      lbl <- Seq("hi", "lo")
    } yield s"$t:$lbl").toDF("branch")
    val counted = Tables.events(spark, d)
      .select(concat(col("event_type"), lit(":"),
        when(col("value") >= 100.0, "hi").otherwise("lo")).as("branch"))
      .groupBy("branch")
      .agg(count(lit(1)).as("c"))
    // broadcast the build (right) side — hinting the preserved side of a
    // left outer join is unsupported and falls back with a warning
    universe
      .join(broadcast(counted), Seq("branch"), "left")
      .na.fill(0L, Seq("c"))
      .orderBy(desc("c"), asc("branch"))
  }

  private val unionAllOracle: String = {
    val branches = for {
      t          <- Seq("click", "error", "purchase", "signup", "view")
      (lbl, cnd) <- Seq(("hi", "value >= 100.0"), ("lo", "value < 100.0"))
    } yield s"SELECT '$t:$lbl' AS branch, COUNT(*) AS c FROM events WHERE event_type = '$t' AND $cnd"
    branches.mkString("", " UNION ALL ", " ORDER BY c DESC, branch")
  }

  def all: Seq[Q] = Seq(
    Q("ref01_count",
      (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("cnt")),
      Some("SELECT COUNT(*) AS cnt FROM lineitem")),

    Q("ref02_schema",
      (s, d) => schemaOf(s, Tables.lineitem(s, d)),
      Some("SELECT column_name, column_type FROM (DESCRIBE SELECT * FROM lineitem) ORDER BY column_name")),

    Q("ref03_projection",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(liKey.map(col): _*)
          .orderBy(liKey.map(col): _*)
          .limit(10),
      Some(s"SELECT $liKeySql FROM lineitem ORDER BY $liKeySql LIMIT 10")),

    Q("ref04_group_topk",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("c"))
          .orderBy(desc("c"), asc("l_returnflag"))
          .limit(10),
      Some("SELECT l_returnflag, COUNT(*) AS c FROM lineitem GROUP BY l_returnflag ORDER BY c DESC, l_returnflag LIMIT 10")),

    Q("ref05_union_all", unionAll, Some(unionAllOracle)),

    Q("ref06_filter_conj",
      (s, d) =>
        Tables.events(s, d)
          .filter(col("event_type") === "purchase" && col("value") > 100.0)
          .select("event_id", "user_id", "value")
          .orderBy("event_id")
          .limit(20),
      Some("SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase' AND value > 100.0 ORDER BY event_id LIMIT 20")),

    Q("ref07_histogram",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("c"))
          .orderBy("o_orderpriority"),
      Some("SELECT o_orderpriority, COUNT(*) AS c FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    Q("ref08_filter_project",
      (s, d) =>
        Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
          .orderBy("c_custkey"),
      Some("SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey")),

    Q("ref09_join",
      (s, d) =>
        Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "c_name", "o_totalprice")
          .orderBy("o_orderkey")
          .limit(10),
      Some("SELECT o_orderkey, c_name, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey LIMIT 10")),

    Q("ref10_pushdown",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R" &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp_ntz"))
          .select(liKey.map(col): _*)
          .orderBy(liKey.map(col): _*),
      Some(s"SELECT $liKeySql FROM lineitem WHERE l_returnflag = 'R' AND l_shipdate < TIMESTAMP '1996-01-01' ORDER BY $liKeySql"))
  )
}
