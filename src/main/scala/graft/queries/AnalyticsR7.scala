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
      }),

    // ---- winsorized mean (clip at the p05/p95 ORDER STATISTICS, then
    //      average): the robust-location estimate an74's median/MAD pair
    //      doesn't give. Exact: ranks come from a deterministic
    //      (value, orderkey, linenumber) total order, the clip points are
    //      the ceil(n/20) / ceil(19n/20) order statistics, and the
    //      clipped mean is a half-up integer division of cents. Work:
    //      one per-flag rank window over lineitem (the fact-grain window
    //      an63's two-pass prefix-sum treatment covers at 100 TB,
    //      documented there) + a 3-row broadcast of clip points.
    Q("an79_winsorized",
      (s, d) => {
        // SCALE-GATED like an39/an74: the exact path ranks each group with
        // a total per-group sort window to pick bit-exact 5%/95% clip
        // bounds (the DuckDB-oracle discipline, deterministic tie-break);
        // above `graft.an79.exactRankRowBound` rows the bounds come from a
        // GK sketch instead and the SORT WINDOW DISAPPEARS ENTIRELY — one
        // grouped sketch pass + one clipped-mean pass, no per-group total
        // ordering anywhere, which is the only winsorization shape that
        // survives 100 TB. Identical output schema either way.
        val li = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            cents(col("l_extendedprice")).as("vc"))
        val bound = s.conf.get("graft.an79.exactRankRowBound", "1000000").toLong
        val exact = Tables.lineitem(s, d).count() <= bound
        val clips =
          if (exact) {
            val byV = Window.partitionBy("l_returnflag")
              .orderBy("vc", "l_orderkey", "l_linenumber")
            val byF = Window.partitionBy("l_returnflag")
            li.withColumn("rn", row_number().over(byV).cast("long"))
              .withColumn("n", count(lit(1)).over(byF))
              .withColumn("r05", expr("(n + 19) DIV 20"))
              .withColumn("r95", expr("(19 * n + 19) DIV 20"))
              .groupBy("l_returnflag")
              .agg(max(when(col("rn") === col("r05"), col("vc"))).as("p05_c"),
                max(when(col("rn") === col("r95"), col("vc"))).as("p95_c"))
          } else
            li.groupBy("l_returnflag")
              .agg(expr("approx_percentile(vc, 0.05D, 10000)").as("p05_c"),
                expr("approx_percentile(vc, 0.95D, 10000)").as("p95_c"))
        li.join(broadcast(clips), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("p05_c"), col("p95_c"),
            greatest(col("p05_c"), least(col("p95_c"), col("vc"))).as("wc"))
          .groupBy("l_returnflag", "p05_c", "p95_c")
          .agg(count(lit(1)).as("n"),
            sum(col("wc").cast("decimal(38,0)")).as("sw"))
          .select(col("l_returnflag"), col("n"), col("p05_c"), col("p95_c"),
            expr(halfUpDiv("sw", "n", 1L)).cast("bigint").as("winsor_mean_c"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH v AS (
          SELECT l_returnflag, l_orderkey, l_linenumber,
                 CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
          FROM lineitem),
        r AS (
          SELECT l_returnflag, vc,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY vc, l_orderkey, l_linenumber) AS rn,
                 COUNT(*) OVER (PARTITION BY l_returnflag) AS n
          FROM v),
        cl AS (
          SELECT l_returnflag,
                 MAX(CASE WHEN rn = (n + 19) // 20 THEN vc END) AS p05_c,
                 MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN vc END) AS p95_c
          FROM r GROUP BY 1),
        w AS (
          SELECT r.l_returnflag, cl.p05_c, cl.p95_c,
                 GREATEST(cl.p05_c, LEAST(cl.p95_c, r.vc)) AS wc
          FROM r JOIN cl USING (l_returnflag)),
        g AS (
          SELECT l_returnflag, p05_c, p95_c, COUNT(*) AS n,
                 SUM(CAST(wc AS HUGEINT)) AS sw
          FROM w GROUP BY 1, 2, 3)
        SELECT l_returnflag, n, p05_c, p95_c,
               CAST(${duckHalfUpDiv("sw", "n", 1L)} AS BIGINT) AS winsor_mean_c
        FROM g ORDER BY l_returnflag""")),

    // ---- two-sample Kolmogorov–Smirnov distance between per-customer
    //      spend distributions of two market segments, EXACT: at each
    //      distinct spend value, D-candidate = |cumA·m − cumB·n| (pure
    //      integers), and D_bp = max·10000/(n·m) half-up — no ECDF
    //      floating point anywhere. The distribution lives at customer
    //      grain (dimension-bounded windows); corpus-proportional work is
    //      the one orders aggregate. The standard drift test between two
    //      cohorts' distributions, exact enough to hash.
    Q("an80_ks_test",
      (s, d) => {
        val spend = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .groupBy(col("c_mktsegment"), col("c_custkey"))
          .agg(sum(cents(col("o_totalprice"))).as("vc"))
        val perValue = spend.groupBy("vc")
          .agg(sum(when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)).as("da"),
            sum(when(col("c_mktsegment") === "MACHINERY", 1L).otherwise(0L)).as("db"))
        val byV = Window.orderBy("vc")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val totals = perValue.agg(sum("da").as("n_a"), sum("db").as("n_b"))
        perValue
          .withColumn("ca", sum("da").over(byV))
          .withColumn("cb", sum("db").over(byV))
          .crossJoin(broadcast(totals))
          .select(col("n_a"), col("n_b"),
            abs(col("ca") * col("n_b") - col("cb") * col("n_a")).as("dnum"))
          .groupBy("n_a", "n_b")
          .agg(max("dnum").as("dmax"))
          .select(col("n_a"), col("n_b"),
            expr(halfUpDiv("dmax", "n_a * n_b", 10000L)).cast("bigint").as("ks_bp"))
      },
      Some(s"""WITH sp AS (
          SELECT c_mktsegment, c_custkey,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS vc
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
          GROUP BY 1, 2),
        pv AS (
          SELECT vc,
                 SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS da,
                 SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS db
          FROM sp GROUP BY vc),
        cum AS (
          SELECT vc,
                 SUM(da) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS ca,
                 SUM(db) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS cb
          FROM pv),
        t AS (SELECT SUM(da) AS n_a, SUM(db) AS n_b FROM pv),
        m AS (
          SELECT t.n_a, t.n_b, MAX(ABS(ca * t.n_b - cb * t.n_a)) AS dmax
          FROM cum, t GROUP BY 1, 2)
        SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               CAST(${duckHalfUpDiv("dmax", "n_a * n_b", 10000L)} AS BIGINT) AS ks_bp
        FROM m""")),

    // ---- TIME-BOUNDED funnel (an26 counts unbounded step completion;
    //      real product funnels expire): view → click → purchase, each
    //      step within 1 HOUR of the previous, evaluated on the earliest
    //      eligible event per user (deterministic strict-funnel
    //      semantics). Three chained windows over ONE user partition =
    //      one shuffle on user_id; timestamps compare exactly in both
    //      engines (micro precision, INTERVAL arithmetic).
    Q("an81_windowed_funnel",
      (s, d) => {
        val byU = Window.partitionBy("user_id")
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
        val staged = ev
          .withColumn("tv", min(when(col("event_type") === "view", col("ts"))).over(byU))
          .withColumn("tc", min(when(col("event_type") === "click" &&
            col("ts") >= col("tv"), col("ts"))).over(byU))
          .withColumn("tp", min(when(col("event_type") === "purchase" &&
            col("ts") >= col("tc"), col("ts"))).over(byU))
          .select("user_id", "tv", "tc", "tp").distinct()
        staged.agg(
          sum(when(col("tv").isNotNull, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("tc").isNotNull &&
            col("tc") <= col("tv") + expr("INTERVAL 1 HOUR"), 1L).otherwise(0L)).as("n_click_1h"),
          sum(when(col("tc").isNotNull &&
            col("tc") <= col("tv") + expr("INTERVAL 1 HOUR") &&
            col("tp").isNotNull &&
            col("tp") <= col("tc") + expr("INTERVAL 1 HOUR"), 1L).otherwise(0L))
            .as("n_purchase_1h"))
      },
      Some("""WITH v AS (
          SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS tv
          FROM events GROUP BY 1),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS tc
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.tv GROUP BY 1),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS tp
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.tc GROUP BY 1),
        st AS (
          SELECT v.user_id, v.tv, c.tc, p.tp
          FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
        SELECT
          CAST(SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
          CAST(SUM(CASE WHEN tc IS NOT NULL AND tc <= tv + INTERVAL 1 HOUR
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_click_1h,
          CAST(SUM(CASE WHEN tc IS NOT NULL AND tc <= tv + INTERVAL 1 HOUR
                         AND tp IS NOT NULL AND tp <= tc + INTERVAL 1 HOUR
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_1h
        FROM st"""))
    ,
    // ---- CUSUM changepoint on the daily revenue series, EXACT: the
    //      mean-centered cumulative sum S_k = Σ_{i≤k}(n·xᵢ − Σx) stays in
    //      integers (scaling by n instead of dividing by it), the
    //      changepoint is the argmax of |S_k| (ties → earliest day), and
    //      the score normalizes by n·Σx in half-up bp. The classic
    //      "where did the level shift" detector, hashable bit-for-bit.
    //      One orders aggregate + calendar-grain windows.
    Q("an82_cusum_changepoint",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(cents(col("o_totalprice"))).as("x"))
        val totals = daily.agg(count(lit(1)).as("n"), sum("x").as("tx"))
        val cum = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.crossJoin(broadcast(totals))
          .withColumn("sk", sum(col("n") * col("x") - col("tx")).over(cum))
          .select(col("day").as("cp_day"), col("n").as("n_days"),
            expr(halfUpDiv("abs(sk)", "n * tx", 10000L)).cast("bigint").as("cusum_bp"))
          .orderBy(desc("cusum_bp"), asc("cp_day"))
          .limit(1)
      },
      Some(s"""WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS x
          FROM orders GROUP BY 1),
        t AS (SELECT COUNT(*) AS n, SUM(x) AS tx FROM daily),
        c AS (
          SELECT day, t.n, t.tx,
                 SUM(t.n * x - t.tx) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS sk
          FROM daily, t)
        SELECT day AS cp_day, CAST(n AS BIGINT) AS n_days,
               CAST(${duckHalfUpDiv("ABS(sk)", "n * tx", 10000L)} AS BIGINT) AS cusum_bp
        FROM c ORDER BY cusum_bp DESC, cp_day LIMIT 1"""))
    ,
    // ---- weekday seasonality profile: each ISO weekday's share of total
    //      revenue vs the uniform 1/7 expectation, exact bp. The simplest
    //      seasonality diagnostic (an08's monthly rollup says WHEN, this
    //      says WHICH weekday structurally over/under-indexes). One
    //      orders aggregate, 7-row arithmetic after.
    Q("an83_weekday_profile",
      (s, d) => {
        val byDay = Tables.orders(s, d)
          .groupBy(dayofweek(col("o_orderdate")).cast("long").as("dow"))
          .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("rev_c"))
        val totals = byDay.agg(sum("rev_c").as("t_rev"))
        byDay.crossJoin(broadcast(totals))
          .select(col("dow"), col("n_orders"), col("rev_c"),
            expr("rev_c * 10000 DIV t_rev").as("share_bp"),
            expr("rev_c * 10000 DIV t_rev - 10000 DIV 7").as("dev_bp"))
          .orderBy("dow")
      },
      Some("""WITH b AS (
          SELECT dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
                 COUNT(*) AS n_orders,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev_c
          FROM orders GROUP BY 1),
        t AS (SELECT SUM(rev_c) AS t_rev FROM b)
        SELECT CAST(dow AS BIGINT) AS dow, CAST(n_orders AS BIGINT) AS n_orders,
               CAST(rev_c AS BIGINT) AS rev_c,
               CAST(rev_c * 10000 // t_rev AS BIGINT) AS share_bp,
               CAST(rev_c * 10000 // t_rev - 10000 // 7 AS BIGINT) AS dev_bp
        FROM b, t ORDER BY dow"""))
    ,
    // ---- trailing-median anomaly days: each day's revenue vs the DISCRETE
    //      lower median of its trailing 30-day window (exact integers — a
    //      sorted 30-element window list indexed at (n+1) div 2, identical
    //      in both engines; no approx percentile anywhere), reporting the
    //      top-5 deviation days in half-up-free integer bp. Full windows
    //      only (rn ≥ 30). Calendar grain: the windows run over ≤ a few
    //      thousand day rows at ANY corpus size; corpus-proportional work
    //      is the one orders aggregate.
    Q("an84_anomaly_days",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(cents(col("o_totalprice"))).as("x"))
        val trail = Window.orderBy("day").rowsBetween(-29, 0)
        daily
          .withColumn("rn", row_number().over(Window.orderBy("day")).cast("long"))
          .withColumn("meds", sort_array(collect_list("x").over(trail)))
          .filter(col("rn") >= 30)
          .withColumn("med", expr("element_at(meds, CAST((size(meds) + 1) DIV 2 AS INT))"))
          .select(col("day"), col("x").as("rev_c"), col("med").as("med_c"),
            expr("abs(x - med) * 10000 DIV med").as("dev_bp"))
          .orderBy(desc("dev_bp"), asc("day"))
          .limit(5)
      },
      Some("""WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS x
          FROM orders GROUP BY 1),
        w AS (
          SELECT day, x,
                 row_number() OVER (ORDER BY day) AS rn,
                 list_sort(list(x) OVER (ORDER BY day
                   ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)) AS meds
          FROM daily),
        m AS (
          SELECT day, x, meds[(len(meds) + 1) // 2] AS med
          FROM w WHERE rn >= 30)
        SELECT day, CAST(x AS BIGINT) AS rev_c, CAST(med AS BIGINT) AS med_c,
               CAST(ABS(x - med) * 10000 // med AS BIGINT) AS dev_bp
        FROM m ORDER BY dev_bp DESC, day LIMIT 5"""))
  )
}
