package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 close-out analytics: contingency / A-B audit, weighted median,
  * cohort-LTV triangle, Pareto frontier, and a true RANGE-frame rolling
  * window — the remaining classic warehouse shapes not yet in the
  * registry (SURVEY.md §2.3–2.7 surface growth).
  *
  * Exactness discipline matches [[Analytics]]/[[AnalyticsR6]]: money is
  * DECIMAL(12,2)→cents BIGINT, ratios are integer basis points via `div`,
  * the one rational statistic (chi-square) is computed as exact integer
  * floor(num*1e6/den) with DECIMAL(38,0) intermediates on both engines,
  * and every output ends in a total ORDER BY.
  */
object AnalyticsR6b {

  /** money DOUBLE → exact cents BIGINT (the an30 idiom, both engines). */
  private def cents(c: Column): Column =
    (c.cast("decimal(12,2)") * 100).cast("bigint")

  def all: Seq[Q] = Seq(

    // ---- contingency / A-B audit: users split into two deterministic
    //      cohorts (user_id % 2); per (cohort, event_type) cell emit the
    //      observed count, the independence-expected count (scaled e4) and
    //      the lift vs expectation in basis points, plus the cell's
    //      chi-square contribution scaled e6 — all exact integer arithmetic
    //      (floor((o*N - r*c)^2 * 1e6 / (r*c*N)) with DECIMAL(38,0)
    //      intermediates so nothing overflows at any SF). One shuffle on
    //      (cohort, type); the row/col totals are window sums over a
    //      10-cell aggregate — driver-free and constant-size at 100 TB.
    Q("an65_contingency",
      (s, d) => {
        val cells = Tables.events(s, d)
          .select((col("user_id") % 2).cast("int").as("cohort"), col("event_type"))
          .groupBy("cohort", "event_type").agg(count(lit(1)).as("o"))
        cells
          .withColumn("r", sum("o").over(Window.partitionBy("cohort")))
          .withColumn("c", sum("o").over(Window.partitionBy("event_type")))
          .withColumn("n", sum("o").over(Window.partitionBy()))
          .select(
            col("cohort"), col("event_type"), col("o"),
            expr("r * c * 10000 div n").as("expected_e4"),
            expr("o * n * 10000 div (r * c)").as("lift_bp"),
            expr("""CAST((CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
                    * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
                    * 1000000 div (CAST(r AS DECIMAL(38,0)) * c * n) AS BIGINT)""")
              .as("chi2_e6"))
          .orderBy("cohort", "event_type")
      },
      Some("""WITH cells AS (
          SELECT CAST(user_id % 2 AS INTEGER) AS cohort, event_type, COUNT(*) AS o
          FROM events GROUP BY 1, 2),
        t AS (
          SELECT cohort, event_type, o,
                 SUM(o) OVER (PARTITION BY cohort) AS r,
                 SUM(o) OVER (PARTITION BY event_type) AS c,
                 SUM(o) OVER () AS n
          FROM cells)
        SELECT cohort, event_type, o,
               CAST(r * c * 10000 // n AS BIGINT) AS expected_e4,
               CAST(o * n * 10000 // (r * c) AS BIGINT) AS lift_bp,
               CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
                    * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
                    * 1000000 // (CAST(r AS HUGEINT) * c * n) AS BIGINT) AS chi2_e6
        FROM t ORDER BY cohort, event_type""")),

    // ---- weighted median: per return flag, the quantity-weighted median
    //      unit price (smallest price whose cumulative weight reaches half
    //      the total — the exact lower weighted median, no interpolation,
    //      so the answer is a value that exists in the data). One shuffle
    //      on flag + a flag-keyed ordered window; at 100 TB the running
    //      sum is per-flag sequential, which is the price of an EXACT
    //      median — the approximate path is an15's percentile_approx.
    Q("an66_weighted_median",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_returnflag").as("flag"),
            cents(col("l_extendedprice") / col("l_quantity")).as("price_c"),
            col("l_quantity").cast("bigint").as("w"))
          .groupBy("flag", "price_c").agg(sum("w").as("w"))
        val perFlag = Window.partitionBy("flag").orderBy("price_c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        li
          .withColumn("cum", sum("w").over(perFlag))
          .withColumn("total", sum("w").over(Window.partitionBy("flag")))
          .filter(col("cum") * 2 >= col("total"))
          .groupBy("flag")
          .agg(min("price_c").as("median_price_c"), max("total").as("total_qty"))
          .orderBy("flag")
      },
      Some("""WITH li AS (
          SELECT l_returnflag AS flag,
                 CAST(CAST(l_extendedprice / l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_c,
                 SUM(CAST(l_quantity AS BIGINT)) AS w
          FROM lineitem GROUP BY 1, 2),
        c AS (
          SELECT flag, price_c, w,
                 SUM(w) OVER (PARTITION BY flag ORDER BY price_c
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 SUM(w) OVER (PARTITION BY flag) AS total
          FROM li)
        SELECT flag, MIN(price_c) AS median_price_c, CAST(MAX(total) AS BIGINT) AS total_qty
        FROM c WHERE cum * 2 >= total GROUP BY flag ORDER BY flag""")),

    // ---- cohort-LTV triangle: customers cohorted by first-order month;
    //      per (cohort_month, month_offset) the active-customer count,
    //      the revenue in cents, and the cohort's cumulative revenue —
    //      the lifetime-value triangle every retention deck plots (an27
    //      is the boolean-retention cousin; this carries money). First
    //      orders are one groupBy(custkey); the cohort join broadcasts at
    //      test SF and shuffles on custkey at 100 TB — the same key the
    //      revenue agg uses, so AQE reuses the exchange. Months are exact
    //      year*12+month integers; no date arithmetic ambiguity.
    Q("an67_cohort_ltv",
      (s, d) => {
        val ym = (c: Column) => (year(c) * 12 + month(c)).cast("bigint")
        val o = Tables.orders(s, d)
          .select(col("o_custkey"), ym(col("o_orderdate")).as("ym"),
            cents(col("o_totalprice")).as("rev_c"))
        val first = o.groupBy("o_custkey").agg(min("ym").as("cohort_ym"))
        val perCohort = Window.partitionBy("cohort_ym").orderBy("month_offset")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.join(first, "o_custkey")
          .groupBy(col("cohort_ym"), (col("ym") - col("cohort_ym")).as("month_offset"))
          .agg(countDistinct("o_custkey").as("n_active"), sum("rev_c").as("rev_c"))
          .withColumn("cum_rev_c", sum("rev_c").over(perCohort))
          .select("cohort_ym", "month_offset", "n_active", "rev_c", "cum_rev_c")
          .orderBy("cohort_ym", "month_offset")
      },
      Some("""WITH o AS (
          SELECT o_custkey,
                 CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS rev_c
          FROM orders),
        f AS (SELECT o_custkey, MIN(ym) AS cohort_ym FROM o GROUP BY 1),
        g AS (
          SELECT f.cohort_ym, o.ym - f.cohort_ym AS month_offset,
                 COUNT(DISTINCT o.o_custkey) AS n_active,
                 CAST(SUM(o.rev_c) AS BIGINT) AS rev_c
          FROM o JOIN f USING (o_custkey) GROUP BY 1, 2)
        SELECT cohort_ym, month_offset, n_active, rev_c,
               CAST(SUM(rev_c) OVER (PARTITION BY cohort_ym ORDER BY month_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_c
        FROM g ORDER BY cohort_ym, month_offset""")),

    // ---- Pareto frontier (skyline): parts not dominated on (cheaper,
    //      smaller). Implemented with two windows over one global sort
    //      instead of the textbook O(n²) self-join: a row is dominated iff
    //      some row strictly earlier in (price, size) order has a smaller
    //      size, or some strictly-cheaper row has size ≤ its own (the
    //      second window is a RANGE frame on price so equal-price peers
    //      are excluded). The oracle states the same set declaratively via
    //      NOT EXISTS — two very different plans, one answer. Scale note:
    //      the global sort is the one non-keyed stage; at 100 TB the
    //      standard refinement is per-partition local frontiers (each a
    //      few rows) merged on one node — same two-window code applied
    //      twice. Frontier size here is tiny by construction.
    Q("an68_pareto",
      (s, d) => {
        val p = Tables.part(s, d)
          .select(col("p_partkey"), cents(col("p_retailprice")).as("price_c"),
            col("p_size").cast("bigint").as("size"))
        val wAll = Window.orderBy("price_c", "size", "p_partkey")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wPrice = Window.orderBy("price_c")
          .rangeBetween(Window.unboundedPreceding, -1)
        p
          .withColumn("min_size_before", min("size").over(wAll))
          .withColumn("min_size_cheaper", min("size").over(wPrice))
          .filter(
            (col("min_size_before").isNull || col("min_size_before") >= col("size")) &&
              (col("min_size_cheaper").isNull || col("min_size_cheaper") > col("size")))
          .select("p_partkey", "price_c", "size")
          .orderBy("price_c", "p_partkey")
      },
      Some("""WITH p AS (
          SELECT p_partkey,
                 CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_c,
                 CAST(p_size AS BIGINT) AS size
          FROM part)
        SELECT p_partkey, price_c, size
        FROM p p1
        WHERE NOT EXISTS (
          SELECT 1 FROM p p2
          WHERE p2.price_c <= p1.price_c AND p2.size <= p1.size
            AND (p2.price_c < p1.price_c OR p2.size < p1.size))
        ORDER BY price_c, p_partkey""")),

    // ---- rolling 90-day spend: per customer and order day, order count
    //      and spend over the trailing 90 days — a true RANGE frame over
    //      day integers (an23's moving average is the ROWS-frame cousin;
    //      RANGE is the one that answers "last 90 days" when order
    //      cadence is irregular). Day-level pre-aggregation first, so the
    //      frame walks at most 90 peers per customer regardless of order
    //      volume. One shuffle on custkey; window state is bounded by the
    //      frame, so no skew risk at any scale.
    Q("an69_rolling_90d",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey"),
            datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date")).cast("bigint").as("day"),
            cents(col("o_totalprice")).as("rev_c"))
          .groupBy("o_custkey", "day")
          .agg(count(lit(1)).as("n_day"), sum("rev_c").as("rev_day_c"))
        val w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-90, 0)
        o
          .withColumn("n_orders_90d", sum("n_day").over(w))
          .withColumn("spend_90d_c", sum("rev_day_c").over(w))
          .select("o_custkey", "day", "n_orders_90d", "spend_90d_c")
          .orderBy("o_custkey", "day")
      },
      Some("""WITH o AS (
          SELECT o_custkey,
                 CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
                 COUNT(*) AS n_day,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev_day_c
          FROM orders GROUP BY 1, 2)
        SELECT o_custkey, day,
               CAST(SUM(n_day) OVER w AS BIGINT) AS n_orders_90d,
               CAST(SUM(rev_day_c) OVER w AS BIGINT) AS spend_90d_c
        FROM o
        WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                     RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, day""")),

    // ---- recursive CTE reachability: min-hop distance between event
    //      types on the observed transition graph (an57's Markov matrix
    //      gives 1-step probabilities; this answers "can a viewer reach a
    //      purchase, and in how few steps"). Spark 4's WITH RECURSIVE
    //      executes the fixpoint natively — the edge list is built with
    //      a lead() window (one user-keyed shuffle over the event log),
    //      and the recursion then iterates over a ≤|types|² aggregate, so
    //      depth-capped BFS costs nothing at any corpus scale. The same
    //      statement runs verbatim on both engines.
    Q("an70_reachability",
      (s, d) => {
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("next_type", lead("event_type", 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")))
          .filter(col("next_type").isNotNull)
          .select(col("event_type").as("src"), col("next_type").as("dst"))
          .distinct()
          .createOrReplaceTempView("ev_edges_v")
        s.sql("""WITH RECURSIVE paths(src, dst, hops) AS (
            SELECT src, dst, 1 FROM ev_edges_v
            UNION ALL
            SELECT p.src, e.dst, p.hops + 1
            FROM paths p JOIN ev_edges_v e ON p.dst = e.src
            WHERE p.hops < 4)
          SELECT src, dst, CAST(MIN(hops) AS BIGINT) AS min_hops
          FROM paths GROUP BY src, dst ORDER BY src, dst""")
      },
      Some("""WITH RECURSIVE
          seq AS (
            SELECT event_type AS src,
                   lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
            FROM events),
          edges AS (SELECT DISTINCT src, dst FROM seq WHERE dst IS NOT NULL),
          paths(src, dst, hops) AS (
            SELECT src, dst, 1 FROM edges
            UNION ALL
            SELECT p.src, e.dst, p.hops + 1
            FROM paths p JOIN edges e ON p.dst = e.src
            WHERE p.hops < 4)
        SELECT src, dst, CAST(MIN(hops) AS BIGINT) AS min_hops
        FROM paths GROUP BY src, dst ORDER BY src, dst""")),

    // ---- VARIANT semi-structured path: parse the JSON props column into
    //      Spark 4's native VARIANT type and extract typed fields lazily
    //      with variant_get — the schema-flexible twin of an59's
    //      from_json(declared struct). VARIANT is the right call when the
    //      payload schema drifts per row: parse once into a binary-encoded
    //      tree, extract only the paths each query touches (columnar
    //      shredding at 100 TB means untouched paths are never even
    //      decoded). Aggregation identical to an59's oracle shape, so the
    //      two paths are mutually differential as well as DuckDB-gated.
    Q("an71_variant_json",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"), parse_json(col("props")).as("v"))
          .select(col("event_type"),
            expr("CAST(variant_get(v, '$.k') AS BIGINT)").as("k"))
          .filter(col("k").isNotNull)
          .groupBy(col("event_type"), expr("k div 10").as("k_bucket"))
          .agg(count(lit(1)).as("n"), sum("k").as("k_sum"))
          .orderBy("event_type", "k_bucket")
      },
      Some("""WITH x AS (
          SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
        SELECT event_type, k // 10 AS k_bucket,
               COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS k_sum
        FROM x WHERE k IS NOT NULL
        GROUP BY 1, 2 ORDER BY event_type, k_bucket"""))
  )
}
