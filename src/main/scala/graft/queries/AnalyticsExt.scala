package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 analytics surface growth: UNPIVOT, ordered string aggregation,
  * ANALYZE-style column statistics, and market-basket co-occurrence — all
  * shapes a warehouse user expects once the relational core exists
  * (SURVEY.md §2.3–2.7 "free in Spark" surface, made concrete and gated).
  *
  * Exactness discipline matches [[Analytics]]: money/string aggregates are
  * order-independent (exact DECIMAL sums, sorted collect), every output ends
  * in a total ORDER BY, and every computed column is aliased identically in
  * the oracle.
  */
object AnalyticsExt {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")

  def all: Seq[Q] = Seq(

    // ---- UNPIVOT: wide aggregate -> long (metric, value) rows. Spark has
    //      no UNPIVOT keyword; `stack` inside a projection is the idiomatic
    //      equivalent and stays inside whole-stage codegen. The wide agg is
    //      computed ONCE (one scan, one shuffle on l_returnflag); the
    //      unpivot is a zero-shuffle projection over 3 group rows — the
    //      same plan shape at 100 TB, where the melt cost is O(groups),
    //      never O(rows).
    Q("an37_unpivot",
      (s, d) => {
        val wide = Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
            count(lit(1)).cast("double").as("n_items"))
        wide.select(col("l_returnflag"), expr(
          """stack(3, 'n_items', n_items, 'sum_price', sum_price, 'sum_qty', sum_qty)
             AS (metric, val)"""))
          .orderBy("l_returnflag", "metric")
      },
      Some("""WITH wide AS (
          SELECT l_returnflag,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
                 CAST(COUNT(*) AS DOUBLE) AS n_items
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, metric, val FROM (
          SELECT l_returnflag, 'n_items' AS metric, n_items AS val FROM wide
          UNION ALL
          SELECT l_returnflag, 'sum_price', sum_price FROM wide
          UNION ALL
          SELECT l_returnflag, 'sum_qty', sum_qty FROM wide)
        ORDER BY l_returnflag, metric""")),

    // ---- ordered string aggregation (LISTAGG / string_agg): per nation,
    //      the alphabetized distinct market segments of its customers plus
    //      exact distinct count. collect_set is order-nondeterministic by
    //      itself; sort_array makes the aggregate order-independent, which
    //      is the only way a string_agg survives distributed partial
    //      aggregation. Cardinality story at scale: the set is bounded by
    //      the segment vocabulary (5), so the per-group state is O(1).
    Q("an38_string_agg",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            countDistinct("c_mktsegment").as("n_segments"),
            array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
            count(lit(1)).as("n_custs"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
               CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
               string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
               COUNT(*) AS n_custs
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ---- ANALYZE-style column statistics: per-column row count, null
    //      count, NDV, min and max (as strings) for four lineitem
    //      columns — the stats a cost-based optimizer or a data-quality
    //      monitor collects. NDV is SCALE-GATED on a conf-keyed row bound
    //      (footer-stats count, milliseconds at any scale): exact
    //      countDistinct under it, approx_count_distinct (HLL sketch, one
    //      pass, fixed state) above. The two paths have deliberately
    //      different shapes — per-column single-distinct branches for
    //      exact (no Expand, 1-column ReadSchema each), one wide scan for
    //      approx — and PlanAuditSpec asserts both.
    Q("an39_column_stats",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("l_shipday", col("l_shipdate").cast("date"))
        val bound = s.conf.get("graft.an39.exactNdvRowBound", "1000000").toLong
        val exact = Tables.lineitem(s, d).count() <= bound
        val cols  = Seq("l_orderkey", "l_returnflag", "l_shipday", "l_linenumber")
        if (exact) {
          // EXACT path, one branch per column (r17): a single wide agg
          // with 4 countDistinct plans an Expand — a 4-5x row blow-up
          // through the partial aggregate that also defeats per-column
          // pruning (every branch pays the full-width scan). Four
          // independent single-distinct aggregates read ONLY their own
          // column (ReadSchema is 1 column per branch), plan no Expand,
          // dedup map-side, and union 4 one-row frames — the oracle's own
          // shape. Measured 4.3 s CPU -> sub-second at sf0.1; the same
          // restructure is what a 100 TB exact pass would want (narrow
          // scans, no multiplied shuffle). n_rows rides along in every
          // branch (count(1) is free in a scan-agg) instead of a 5th scan.
          val rows = cols.map { c =>
            li.agg(
              count(lit(1)).as("n_rows"),
              countDistinct(col(c)).as("ndv"),
              sum(col(c).isNull.cast("long")).as("n_nulls"),
              min(col(c)).cast("string").as("min_s"),
              max(col(c)).cast("string").as("max_s"))
              .select(lit(c).as("column_name"), col("n_rows"), col("ndv"),
                col("n_nulls"), col("min_s"), col("max_s"))
          }
          rows.reduce(_.union(_)).orderBy("column_name")
        } else {
          // approx path (100 TB shape): ONE scan computes all 17
          // aggregates — HLL sketches are plain aggregates, no Expand —
          // then a constant-size melt.
          def stats(c: String): Seq[Column] = Seq(
            approx_count_distinct(col(c)).as(s"ndv_$c"),
            sum(col(c).isNull.cast("long")).as(s"nulls_$c"),
            min(col(c)).cast("string").as(s"min_$c"),
            max(col(c)).cast("string").as(s"max_$c"))
          val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(stats)
          val wide = li.agg(aggs.head, aggs.tail: _*)
          // melt via explode(array(struct...)): identical field aliases per
          // struct (stack would carry the source column names and mismatch)
          val rows = cols.map(c => struct(
            lit(c).as("column_name"), col("n_rows").as("n_rows"),
            col(s"ndv_$c").as("ndv"), col(s"nulls_$c").as("n_nulls"),
            col(s"min_$c").as("min_s"), col(s"max_$c").as("max_s")))
          wide.select(explode(array(rows: _*)).as("r")).select("r.*")
            .orderBy("column_name")
        }
      },
      Some("""WITH li AS (SELECT *, CAST(l_shipdate AS DATE) AS l_shipday FROM lineitem)
        SELECT * FROM (
          SELECT 'l_orderkey' AS column_name, COUNT(*) AS n_rows,
                 CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv,
                 CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS n_nulls,
                 CAST(MIN(l_orderkey) AS VARCHAR) AS min_s,
                 CAST(MAX(l_orderkey) AS VARCHAR) AS max_s FROM li
          UNION ALL
          SELECT 'l_returnflag', COUNT(*), CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
                 CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
                 CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR) FROM li
          UNION ALL
          SELECT 'l_shipday', COUNT(*), CAST(COUNT(DISTINCT l_shipday) AS BIGINT),
                 CAST(COUNT(*) - COUNT(l_shipday) AS BIGINT),
                 CAST(MIN(l_shipday) AS VARCHAR), CAST(MAX(l_shipday) AS VARCHAR) FROM li
          UNION ALL
          SELECT 'l_linenumber', COUNT(*), CAST(COUNT(DISTINCT l_linenumber) AS BIGINT),
                 CAST(COUNT(*) - COUNT(l_linenumber) AS BIGINT),
                 CAST(MIN(l_linenumber) AS VARCHAR), CAST(MAX(l_linenumber) AS VARCHAR) FROM li)
        ORDER BY column_name""")),

    // ---- market-basket co-occurrence: top part-brand pairs bought in the
    //      same order. The classic self-join shape: distinct (order, brand)
    //      pairs first (bounding fan-out to brands²/2 per order, ~300 max,
    //      regardless of order size), then an equi-self-join on l_orderkey
    //      — a key-partitioned shuffle join whose skew is capped by the
    //      per-order brand bound, so it survives 100 TB without salting.
    //      The brand lookup broadcasts part (a dimension).
    Q("an40_copurchase",
      (s, d) => {
        val ob = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
          .distinct()
        val a = ob.select(col("ok"), col("b").as("b1"))
        val b = ob.select(col("ok"), col("b").as("b2"))
        a.join(b, Seq("ok")).filter(col("b1") < col("b2"))
          .groupBy("b1", "b2")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(desc("n_orders"), asc("b1"), asc("b2"))
          .limit(15)
      },
      Some("""WITH ob AS (
          SELECT DISTINCT l_orderkey AS ok, p_brand AS b
          FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT a.b AS b1, b.b AS b2, COUNT(*) AS n_orders
        FROM ob a JOIN ob b ON a.ok = b.ok AND a.b < b.b
        GROUP BY 1, 2
        ORDER BY n_orders DESC, b1, b2 LIMIT 15""")),

    // ---- NOTE: there is deliberately no an41 — a drafted windowed-distinct
    //      variant was superseded by an43_running_distinct before it ever
    //      registered; the id is retired to keep later ids stable.

    // ---- discrete percentiles: percentile_disc picks an ACTUAL value
    //      (the smallest with cume_dist >= p — same rule in both engines,
    //      probed before gating), so the result is exact with no
    //      interpolation-order caveat at all. Complements an15's
    //      percentile_cont. One shuffle on the group key; per-group state
    //      for exact percentiles is the sorted run — at 100 TB this swaps
    //      to approx_percentile, same plan shape.
    // SCALE-GATED like an39/an74: above `graft.exactPercentileRowBound`
    // rows the discrete percentiles come from the GK sketch
    // (approx_percentile also returns an ACTUAL element of the group, so
    // disc semantics carry; per-group memory is bounded by the accuracy
    // knob instead of the group's full value set). Exact under the bound
    // keeps the DuckDB oracle bit-exact at sf0.01.
    Q("an42_percentile_disc",
      (s, d) => {
        val bound = s.conf.get("graft.exactPercentileRowBound", "1000000").toLong
        val exact = Tables.orders(s, d).count() <= bound
        def disc(q: String): Column =
          if (exact) expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY o_totalprice)")
          else expr(s"approx_percentile(o_totalprice, ${q}D, 10000)")
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(
            disc("0.25").as("p25_disc"),
            disc("0.5").as("p50_disc"),
            disc("0.9").as("p90_disc"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
          quantile_disc(o_totalprice, 0.25) AS p25_disc,
          quantile_disc(o_totalprice, 0.5) AS p50_disc,
          quantile_disc(o_totalprice, 0.9) AS p90_disc,
          COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- running distinct count: cumulative distinct customers per
    //      priority over order days. Spark has no COUNT(DISTINCT) OVER;
    //      the scalable composition is first-occurrence flags (one window
    //      over (priority, customer)) + a day-level running sum — state
    //      per group is O(1), vs the naive set-accumulating frame that is
    //      O(distinct) per ROW. The oracle runs DuckDB's NATIVE windowed
    //      COUNT(DISTINCT), so the gate proves the composition equals the
    //      real semantics, day-for-day.
    Q("an43_running_distinct",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.orders(s, d).select(
          col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("day"),
          col("o_custkey"))
        val firstSeen = Window.partitionBy("prio", "o_custkey").orderBy("day")
        val daily = base
          .withColumn("is_first",
            when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
          .groupBy("prio", "day")
          .agg(count(lit(1)).as("n_orders"), sum("is_first").as("new_custs"))
        val cum = Window.partitionBy("prio").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .select(col("prio"), col("day"), col("n_orders"),
            sum("new_custs").over(cum).as("cum_custs"))
          .filter(col("day").between("1995-01-01", "1995-03-31"))
          .orderBy("prio", "day")
      },
      Some("""WITH base AS (
          SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day, o_custkey
          FROM orders),
        d AS (SELECT prio, day, COUNT(*) AS n_orders FROM base GROUP BY 1, 2),
        rd AS (
          SELECT DISTINCT prio, day,
                 COUNT(DISTINCT o_custkey) OVER (PARTITION BY prio ORDER BY day
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_custs
          FROM base)
        SELECT d.prio, d.day, d.n_orders, CAST(rd.cum_custs AS BIGINT) AS cum_custs
        FROM d JOIN rd ON d.prio = rd.prio AND d.day = rd.day
        WHERE d.day BETWEEN '1995-01-01' AND '1995-03-31'
        ORDER BY d.prio, d.day""")),

    // ---- robust statistics: median, MAD (median absolute deviation) and
    //      a 3×MAD outlier count per priority — the outlier detector that
    //      survives skewed money distributions where mean/stddev do not.
    //      MAD is inherently two-pass (median, then median of deviations);
    //      both pass results broadcast back as dimension-sized frames, so
    //      the fact table is scanned, never re-shuffled wide. At 100 TB
    //      both exact percentiles swap to approx_percentile, same shape.
    Q("an44_robust_stats",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_orderpriority").as("prio"), col("o_totalprice").as("x"))
        // SCALE-GATED like an74: both median passes use the GK sketch
        // above `graft.exactPercentileRowBound` rows
        val bound = s.conf.get("graft.exactPercentileRowBound", "1000000").toLong
        val exact = Tables.orders(s, d).count() <= bound
        def med50(c: String): Column =
          if (exact) expr(s"percentile($c, 0.5D)")
          else expr(s"approx_percentile($c, 0.5D, 10000)").cast("double")
        val med = o.groupBy("prio").agg(med50("x").as("med"))
        val dev = o.join(broadcast(med), Seq("prio"))
          .withColumn("adev", abs(col("x") - col("med")))
        val mad = dev.groupBy("prio")
          .agg(min("med").as("med"), med50("adev").as("mad"))
        dev.select("prio", "adev")
          .join(broadcast(mad), Seq("prio"))
          .groupBy("prio")
          .agg(
            round(min("med"), 4).as("median_price"),
            round(min("mad"), 4).as("mad"),
            sum(when(col("adev") > lit(3) * col("mad"), 1L).otherwise(0L)).as("n_outliers"),
            count(lit(1)).as("n"))
          .orderBy("prio")
      },
      Some("""WITH o AS (SELECT o_orderpriority AS prio, o_totalprice AS x FROM orders),
        med AS (SELECT prio, quantile_cont(x, 0.5) AS med FROM o GROUP BY prio),
        dev AS (SELECT o.prio, ABS(x - med) AS adev FROM o JOIN med USING (prio)),
        mad AS (
          SELECT d.prio, MIN(m.med) AS med, quantile_cont(d.adev, 0.5) AS mad
          FROM dev d JOIN med m ON d.prio = m.prio GROUP BY d.prio)
        SELECT d.prio,
               ROUND(MIN(m.med), 4) AS median_price,
               ROUND(MIN(m.mad), 4) AS mad,
               CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               COUNT(*) AS n
        FROM dev d JOIN mad m ON d.prio = m.prio
        GROUP BY d.prio ORDER BY d.prio""")),

    // ---- correlated LATERAL subquery with LIMIT (top-2 orders per
    //      customer). The SQL-text surface for per-group top-k: Catalyst
    //      decorrelates the lateral into a ranked join rather than
    //      re-scanning orders per customer row, so the plan is one
    //      shuffle on the correlation key — the same shape an04's window
    //      top-n compiles to, now reachable from the SQL frontend. Both
    //      engines run genuine LATERAL; ties pin on o_orderkey.
    Q("an45_lateral",
      (s, d) => s.sql(s"""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM parquet.`$d/customer.parquet` c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM parquet.`$d/orders.parquet`
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) o
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey"""),
      Some("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""")),

    // ---- heavy hitters: parts whose lineitem frequency exceeds 1.5× the
    //      mean per-part frequency. The threshold is pure integer
    //      arithmetic (2·cnt·n_parts > 3·n_rows) so there is no float
    //      boundary to disagree on. One shuffle (the groupBy); the two
    //      scalar totals broadcast back. At 100 TB this is the exact
    //      counterpart of a Misra-Gries / count-min pass — same single
    //      scan, and the exact groupBy swaps to the sketch only when the
    //      key cardinality itself is the bottleneck.
    Q("an46_heavy_hitters",
      (s, d) => {
        val cnts = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("partkey"))
          .agg(count(lit(1)).as("cnt"))
        val tot = cnts.agg(
          sum("cnt").as("n_rows"), count(lit(1)).as("n_parts"))
        cnts.crossJoin(broadcast(tot))
          .filter(lit(2) * col("cnt") * col("n_parts") > lit(3) * col("n_rows"))
          .select(col("partkey"), col("cnt"))
          .orderBy(desc("cnt"), asc("partkey"))
      },
      Some("""WITH c AS (SELECT l_partkey AS partkey, COUNT(*) AS cnt
                FROM lineitem GROUP BY 1),
        t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_parts FROM c)
        SELECT partkey, cnt FROM c, t
        WHERE 2 * cnt * n_parts > 3 * n_rows
        ORDER BY cnt DESC, partkey""")),

    // ---- equal-width histogram: 20 bins over [min, max] of
    //      l_extendedprice. min/max are order-independent scalars, the bin
    //      expression is the same IEEE double formula on both engines, and
    //      the bin id is the only computed key — one scan + one tiny
    //      shuffle on 20 keys with map-side partial counts. This is the
    //      profiling pass a curation pipeline runs before choosing quality
    //      cut thresholds; the shape is scan-bound at any scale.
    Q("an47_bin_histogram",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_extendedprice").as("x"))
        val mm = li.agg(min("x").as("mn"), max("x").as("mx"))
        li.crossJoin(broadcast(mm))
          .withColumn("bin", expr(
            "least(cast(floor((x - mn) * 20.0 / (mx - mn)) as bigint), 19)"))
          .groupBy("bin")
          .agg(
            count(lit(1)).as("n_rows"),
            round(min("mn") + col("bin") * (min("mx") - min("mn")) / lit(20.0), 2)
              .as("bin_lo"))
          .orderBy("bin")
      },
      Some("""WITH li AS (SELECT l_extendedprice AS x FROM lineitem),
        mm AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM li),
        b AS (SELECT LEAST(CAST(FLOOR((x - mn) * 20.0 / (mx - mn)) AS BIGINT), 19) AS bin,
                     mn, mx
              FROM li, mm)
        SELECT bin, COUNT(*) AS n_rows,
               ROUND(MIN(mn) + bin * (MIN(mx) - MIN(mn)) / 20.0, 2) AS bin_lo
        FROM b GROUP BY bin ORDER BY bin""")),

    // ---- weighted PageRank, three unrolled iterations, over the brand
    //      co-purchase graph (an40's edges, symmetrized; weight = number
    //      of co-occurring orders). The rank update is the canonical
    //      keyed-aggregation iterate: each round is ONE shuffle on the
    //      destination key, and the per-edge contribution is quantized to
    //      DECIMAL *before* the sum so the aggregate is association-order
    //      independent (the repo's group-sum exactness rule) — both
    //      engines sum the identical decimals exactly. At 100 TB the node
    //      frame stays keyed by node id and each iteration is the same
    //      single shuffle; the heavy part — building edges from the fact
    //      table — is the one distinct + one self-join an40 already gates.
    Q("an48_pagerank",
      (s, d) => {
        val ob = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
          .distinct()
        val pairs = ob.select(col("ok"), col("b").as("b1"))
          .join(ob.select(col("ok"), col("b").as("b2")), Seq("ok"))
          .filter(col("b1") < col("b2"))
          .groupBy("b1", "b2").agg(count(lit(1)).as("w"))
        val edges = pairs.select(col("b1").as("src"), col("b2").as("dst"), col("w"))
          .union(pairs.select(col("b2").as("src"), col("b1").as("dst"), col("w")))
          .persist()
        val deg = edges.groupBy("src").agg(sum("w").as("wd"))
        val e   = edges.join(broadcast(deg), Seq("src"))
        var ranks = deg.select(col("src").as("node"), lit(1.0).as("r"))
        for (_ <- 1 to 3) {
          ranks = e.join(broadcast(ranks), col("src") === col("node"))
            .select(col("dst"),
              expr("cast(round(r * w / wd, 10) as decimal(24,10))").as("contrib"))
            .groupBy(col("dst").as("node"))
            .agg(round(lit(0.15) + lit(0.85) * sum("contrib").cast("double"), 10).as("r"))
        }
        ranks
          .join(broadcast(deg), col("node") === col("src"))
          .select(col("node").as("brand"), round(col("r"), 6).as("rank"), col("wd").as("wdeg"))
          .orderBy(desc("rank"), asc("brand"))
      },
      Some("""WITH ob AS (
          SELECT DISTINCT l_orderkey AS ok, p_brand AS b
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        pairs AS (
          SELECT a.b AS b1, b.b AS b2, COUNT(*) AS w
          FROM ob a JOIN ob b ON a.ok = b.ok AND a.b < b.b GROUP BY 1, 2),
        edges AS (
          SELECT b1 AS src, b2 AS dst, w FROM pairs
          UNION ALL
          SELECT b2, b1, w FROM pairs),
        deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wd FROM edges GROUP BY src),
        e AS (SELECT edges.src, dst, w, wd FROM edges JOIN deg USING (src)),
        r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS r FROM deg),
        r1 AS (
          SELECT dst AS node,
                 ROUND(0.15 + 0.85 * CAST(SUM(CAST(ROUND(r * w / wd, 10) AS DECIMAL(24,10))) AS DOUBLE), 10) AS r
          FROM e JOIN r0 ON e.src = r0.node GROUP BY dst),
        r2 AS (
          SELECT dst AS node,
                 ROUND(0.15 + 0.85 * CAST(SUM(CAST(ROUND(r * w / wd, 10) AS DECIMAL(24,10))) AS DOUBLE), 10) AS r
          FROM e JOIN r1 ON e.src = r1.node GROUP BY dst),
        r3 AS (
          SELECT dst AS node,
                 ROUND(0.15 + 0.85 * CAST(SUM(CAST(ROUND(r * w / wd, 10) AS DECIMAL(24,10))) AS DOUBLE), 10) AS r
          FROM e JOIN r2 ON e.src = r2.node GROUP BY dst)
        SELECT node AS brand, ROUND(r, 6) AS rank, wd AS wdeg
        FROM r3 JOIN deg ON node = deg.src
        ORDER BY rank DESC, brand"""))
,
    // ---- decile analysis: customers ranked into spend deciles with
    //      per-decile totals — the stratification report behind tiered
    //      sampling and curriculum weighting. ntile's remainder rule
    //      (first buckets get the extra row) is identical in both engines
    //      once the order is total (spend DESC, custkey pins ties). Spend
    //      sums are exact DECIMAL; the window is one shuffle over the
    //      customer aggregate (dimension-sized, not fact-sized) — at
    //      100 TB the fact scan feeds a keyed agg and only customer rows
    //      enter the sort.
    Q("an49_decile_spend",
      (s, d) => {
        val spend = Tables.orders(s, d)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(sum(dec(col("o_totalprice"))).as("spend"))
        val bySpend = Window.orderBy(desc("spend"), asc("custkey"))
        spend.withColumn("decile", ntile(10).over(bySpend).cast("long"))
          .groupBy("decile")
          .agg(
            count(lit(1)).as("n_customers"),
            sum("spend").cast("double").as("total_spend"),
            max("spend").cast("double").as("top_spend"),
            min("spend").cast("double").as("floor_spend"))
          .orderBy("decile")
      },
      Some("""WITH spend AS (
          SELECT o_custkey AS custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
          FROM orders GROUP BY 1),
        ranked AS (
          SELECT custkey, spend,
                 CAST(ntile(10) OVER (ORDER BY spend DESC, custkey) AS BIGINT) AS decile
          FROM spend)
        SELECT decile, COUNT(*) AS n_customers,
               CAST(SUM(spend) AS DOUBLE) AS total_spend,
               CAST(MAX(spend) AS DOUBLE) AS top_spend,
               CAST(MIN(spend) AS DOUBLE) AS floor_spend
        FROM ranked GROUP BY decile ORDER BY decile""")),

    // ---- year-over-year growth: monthly revenue with a 12-step LAG over
    //      the (year, month) sequence. Revenue is an exact DECIMAL sum per
    //      month (order-independent); the growth ratio divides two such
    //      exact doubles, so both engines compute the identical value. The
    //      month frame is calendar-sized — the window sort is free at any
    //      data scale; only the one grouped aggregate touches the facts.
    Q("an50_yoy_growth",
      (s, d) => {
        val monthly = Tables.orders(s, d)
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"))
          .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
        val byMonth = Window.orderBy("yr", "mo")
        monthly
          .withColumn("prev", lag("revenue", 12).over(byMonth))
          .withColumn("yoy_pct",
            round((col("revenue") - col("prev")) * lit(100.0) / col("prev"), 4))
          .select(col("yr"), col("mo"), round(col("revenue"), 2).as("revenue"), col("yoy_pct"))
          .orderBy("yr", "mo")
      },
      Some("""WITH monthly AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(month(o_orderdate) AS BIGINT) AS mo,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1, 2),
        lagged AS (
          SELECT yr, mo, revenue, lag(revenue, 12) OVER (ORDER BY yr, mo) AS prev
          FROM monthly)
        SELECT yr, mo, ROUND(revenue, 2) AS revenue,
               ROUND((revenue - prev) * 100.0 / prev, 4) AS yoy_pct
        FROM lagged ORDER BY yr, mo"""))
,
    // ---- distribution-position window functions: rank, dense_rank,
    //      percent_rank, cume_dist over per-segment customer spend, in ONE
    //      Window operator (all four share the partition + order, so
    //      Catalyst fuses them — the an31 navigation-fusion property for
    //      the ranking family). The order is total (spend DESC, custkey),
    //      so rank == row_number and the two ratio functions divide exact
    //      integers — no float ambiguity. One shuffle on the segment key
    //      over the customer-grain aggregate.
    Q("an51_rank_surface",
      (s, d) => {
        val spend = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("segment"), col("c_custkey").as("custkey"))
          .agg(sum(dec(col("o_totalprice"))).as("spend"))
        val w = Window.partitionBy("segment").orderBy(desc("spend"), asc("custkey"))
        spend
          .withColumn("rnk", rank().over(w).cast("long"))
          .withColumn("drnk", dense_rank().over(w).cast("long"))
          .withColumn("pct_rank", round(percent_rank().over(w), 6))
          .withColumn("cume", round(cume_dist().over(w), 6))
          .filter(col("rnk") <= 5)
          .select(col("segment"), col("rnk"), col("custkey"),
            col("spend").cast("double").as("spend"), col("drnk"),
            col("pct_rank"), col("cume"))
          .orderBy("segment", "rnk")
      },
      Some("""WITH spend AS (
          SELECT c_mktsegment AS segment, c_custkey AS custkey,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        r AS (
          SELECT segment, custkey, spend,
                 CAST(rank() OVER w AS BIGINT) AS rnk,
                 CAST(dense_rank() OVER w AS BIGINT) AS drnk,
                 ROUND(percent_rank() OVER w, 6) AS pct_rank,
                 ROUND(cume_dist() OVER w, 6) AS cume
          FROM spend
          WINDOW w AS (PARTITION BY segment ORDER BY spend DESC, custkey))
        SELECT segment, rnk, custkey, CAST(spend AS DOUBLE) AS spend,
               drnk, pct_rank, cume
        FROM r WHERE rnk <= 5 ORDER BY segment, rnk""")),

    // ---- triangle counting over the brand co-purchase graph: the classic
    //      distributed graph statistic (clustering/community density). The
    //      name-ordered edge orientation (b1 < b2) means each triangle is
    //      enumerated exactly once as a < b < c — two equi-joins on edge
    //      endpoints, NO cartesian and no post-dedup. Per-brand counts
    //      come from exploding each triangle to its three corners (3 rows
    //      per triangle, never materializing neighbor sets). At 100 TB the
    //      same oriented-join runs with degree-based orientation to bound
    //      skew; the plan shape (two keyed joins + one agg) is unchanged.
    Q("an52_triangle_count",
      (s, d) => {
        val ob = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
          .distinct()
        val edges = ob.select(col("ok"), col("b").as("b1"))
          .join(ob.select(col("ok"), col("b").as("b2")), Seq("ok"))
          .filter(col("b1") < col("b2"))
          .select("b1", "b2").distinct().persist()
        val tri = edges.as("e1")
          .join(edges.as("e2"), col("e1.b2") === col("e2.b1"))
          .join(edges.as("e3"),
            col("e1.b1") === col("e3.b1") && col("e2.b2") === col("e3.b2"))
          .select(col("e1.b1").as("a"), col("e1.b2").as("b"), col("e2.b2").as("c"))
        tri.select(explode(array(col("a"), col("b"), col("c"))).as("brand"))
          .groupBy("brand").agg(count(lit(1)).as("n_triangles"))
          .orderBy("brand")
      },
      Some("""WITH ob AS (
          SELECT DISTINCT l_orderkey AS ok, p_brand AS b
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        edges AS (
          SELECT DISTINCT a.b AS b1, b.b AS b2
          FROM ob a JOIN ob b ON a.ok = b.ok AND a.b < b.b),
        tri AS (
          SELECT e1.b1 AS a, e1.b2 AS b, e2.b2 AS c
          FROM edges e1
          JOIN edges e2 ON e1.b2 = e2.b1
          JOIN edges e3 ON e1.b1 = e3.b1 AND e2.b2 = e3.b2),
        corners AS (
          SELECT a AS brand FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        SELECT brand, COUNT(*) AS n_triangles
        FROM corners GROUP BY brand ORDER BY brand"""))
  )
}
