package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 analytics wave: inequality and rank-correlation statistics —
  * the distribution-shape diagnostics (who holds the spend, do two daily
  * series co-move) still missing after six waves. Exactness discipline as
  * [[AnalyticsR6b]]/[[AnalyticsR6c]]: money to cents BIGINT, every
  * reported rational a half-up integer division with DECIMAL(38,0) /
  * HUGEINT intermediates, no floating point anywhere near the hash.
  */
object AnalyticsR7 {

  private def cents(c: Column): Column =
    (c.cast("decimal(12,2)") * 100).cast("bigint")

  private def halfUpDiv(num: String, den: String, scale: Long): String =
    s"""CASE WHEN ($num) >= 0
       |  THEN (2 * ($num) * $scale + ($den)) DIV (2 * ($den))
       |  ELSE -((2 * (-($num)) * $scale + ($den)) DIV (2 * ($den)))
       |END""".stripMargin

  private def duckHalfUpDiv(num: String, den: String, scale: Long): String =
    s"""CASE WHEN ($num) >= 0
       |  THEN (2 * ($num) * $scale + ($den)) // (2 * ($den))
       |  ELSE -((2 * (-($num)) * $scale + ($den)) // (2 * ($den)))
       |END""".stripMargin

  def all: Seq[Q] = Seq(

    // ---- Gini coefficient of per-customer spend, exact integer: sort
    //      the CUSTOMER-grain totals (dimension-bounded, like every other
    //      presentation window), then G = (2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx)
    //      over cents with DECIMAL(38,0) intermediates, reported half-up
    //      in basis points per market segment. The corpus-proportional
    //      work is ONE keyed aggregate over orders; the window runs on
    //      the |customers-per-segment| aggregate — at 100 TB that grain
    //      still fits the an63 two-pass prefix-sum treatment if the
    //      dimension ever outgrows a partition. Ties order by customer id
    //      (deterministic; Gini is invariant to equal-value permutations).
    Q("an77_gini",
      (s, d) => {
        val spend = Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"), col("c_custkey"))
          .agg(sum(cents(col("o_totalprice"))).as("spend_c"))
        val bySeg = Window.partitionBy("c_mktsegment").orderBy("spend_c", "c_custkey")
        spend
          .withColumn("i", row_number().over(bySeg).cast("long"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"),
            sum(col("spend_c").cast("decimal(38,0)")).as("sx"),
            sum((col("i") * col("spend_c")).cast("decimal(38,0)")).as("six"))
          .select(col("c_mktsegment"), col("n_cust"),
            col("sx").cast("bigint").as("total_cents"),
            expr(halfUpDiv("2 * six - (n_cust + 1) * sx", "n_cust * sx", 10000L))
              .cast("bigint").as("gini_bp"))
          .orderBy("c_mktsegment")
      },
      Some(s"""WITH sp AS (
          SELECT c_mktsegment, c_custkey,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS spend_c
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        r AS (
          SELECT c_mktsegment, spend_c,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY spend_c, c_custkey) AS i
          FROM sp),
        g AS (
          SELECT c_mktsegment, COUNT(*) AS n_cust,
                 SUM(CAST(spend_c AS HUGEINT)) AS sx,
                 SUM(CAST(i AS HUGEINT) * CAST(spend_c AS HUGEINT)) AS six
          FROM r GROUP BY 1)
        SELECT c_mktsegment, n_cust,
               CAST(sx AS BIGINT) AS total_cents,
               CAST(${duckHalfUpDiv("2 * six - (n_cust + 1) * sx", "n_cust * sx", 10000L)} AS BIGINT) AS gini_bp
        FROM g ORDER BY c_mktsegment""")),

    // ---- Spearman rank correlation between two DAILY series — revenue
    //      cents vs event count — at lags 0 and 1. Ranks are integers
    //      (row_number over a deterministic (value, day) order), so
    //      ρ = 1 − 6·Σd²/(n·(n²−1)) is an exact rational reported
    //      half-up in bp. The series live at calendar grain (≤ a few
    //      thousand rows at any corpus size); the corpus-proportional
    //      work is the two daily aggregates, one shuffle each. This is
    //      the co-movement diagnostic Pearson can't give exactly (its
    //      √variance leaves integer arithmetic).
    Q("an78_spearman_lag",
      (s, d) => {
        val rev = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
        val ev = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_ev"))
        val joined = rev.join(ev, Seq("day")) // days present in BOTH series
        def lagged(lag: Int): DataFrame = {
          val base = joined
            .withColumn("ev_lag",
              org.apache.spark.sql.functions.lag("n_ev", lag, null)
                .over(Window.orderBy("day")))
            .filter(col("ev_lag").isNotNull)
          val rRank = Window.orderBy("rev_c", "day")
          val eRank = Window.orderBy("ev_lag", "day")
          base
            .withColumn("ri", row_number().over(rRank).cast("long"))
            .withColumn("ei", row_number().over(eRank).cast("long"))
            .groupBy()
            .agg(count(lit(1)).as("n"),
              sum(((col("ri") - col("ei")) * (col("ri") - col("ei")))
                .cast("decimal(38,0)")).as("sd2"))
            .select(lit(lag).cast("long").as("lag_days"), col("n"),
              expr(halfUpDiv("10000 * n * (n * n - 1) - 60000 * sd2",
                "n * (n * n - 1)", 1L)).cast("bigint").as("spearman_bp"))
        }
        lagged(0).unionByName(lagged(1)).orderBy("lag_days")
      },
      Some {
        def one(lag: Int) =
          s"""SELECT CAST($lag AS BIGINT) AS lag_days, n,
               CAST(${duckHalfUpDiv(s"10000 * n * (n * n - 1) - 60000 * sd2", "n * (n * n - 1)", 1L)} AS BIGINT) AS spearman_bp
             FROM (
               SELECT COUNT(*) AS n,
                      SUM(CAST((ri - ei) * (ri - ei) AS HUGEINT)) AS sd2
               FROM (
                 SELECT row_number() OVER (ORDER BY rev_c, day) AS ri,
                        row_number() OVER (ORDER BY ev_lag, day) AS ei
                 FROM (
                   SELECT day, rev_c,
                          lag(n_ev, $lag) OVER (ORDER BY day) AS ev_lag
                   FROM j) WHERE ev_lag IS NOT NULL))"""
        s"""WITH rev AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev_c
            FROM orders GROUP BY 1),
          ev AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_ev FROM events GROUP BY 1),
          j AS (SELECT rev.day, rev_c, n_ev FROM rev JOIN ev USING (day))
          SELECT * FROM (${one(0)} UNION ALL ${one(1)}) ORDER BY lag_days"""
      })
  )
}
