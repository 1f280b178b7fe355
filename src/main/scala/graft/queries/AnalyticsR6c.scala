package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 fifth-wave analytics: exact-integer regression aggregates,
  * time-series gap-fill/resampling, and robust (MAD) outlier detection —
  * the classic statistics/time-series shapes still missing from the
  * registry after the fourth wave.
  *
  * Exactness discipline matches [[AnalyticsR6b]]: money is
  * DECIMAL(12,2)→cents BIGINT, every rational statistic is a half-up
  * integer division (`(2·|num|·scale + den) div (2·den)`, sign split so
  * truncate-vs-floor can never differ between engines) with DECIMAL(38,0)
  * (Spark) / HUGEINT (DuckDB) intermediates, and the only doubles that
  * survive to output are exact binary fractions (medians of integers are
  * `.0`/`.5`, their second-level medians `.25` — all exactly
  * representable, so the differential hash is stable).
  */
object AnalyticsR6c {

  /** money DOUBLE → exact cents BIGINT (the an30 idiom, both engines). */
  private def cents(c: Column): Column =
    (c.cast("decimal(12,2)") * 100).cast("bigint")

  /** Spark-side half-up integer division `round(num*scale/den)` for den>0,
    * any-sign num, DECIMAL(38,0) intermediates. `div` on decimals computes
    * the exact truncated quotient (result fits BIGINT here). */
  private def halfUpDiv(num: String, den: String, scale: Long): String =
    s"""CASE WHEN ($num) >= 0
       |  THEN (2 * ($num) * $scale + ($den)) DIV (2 * ($den))
       |  ELSE -((2 * (-($num)) * $scale + ($den)) DIV (2 * ($den)))
       |END""".stripMargin

  /** DuckDB twin of [[halfUpDiv]] (`//` truncates toward zero, same as
    * Spark's DIV — the sign split makes that irrelevant anyway). */
  private def duckHalfUpDiv(num: String, den: String, scale: Long): String =
    s"""CASE WHEN ($num) >= 0
       |  THEN (2 * ($num) * $scale + ($den)) // (2 * ($den))
       |  ELSE -((2 * (-($num)) * $scale + ($den)) // (2 * ($den)))
       |END""".stripMargin

  def all: Seq[Q] = Seq(

    // ---- ordinary least squares as a GROUPED AGGREGATE, exact. Per
    //      returnflag, regress line revenue (cents) on quantity (whole
    //      units in TPC-H) from the five classic sufficient statistics
    //      (n, Σx, Σy, Σxy, Σx²) — ONE map-side-combinable pass over
    //      lineitem, then O(groups) driver-free arithmetic. slope/intercept
    //      are half-up integer divisions with DECIMAL(38,0)/HUGEINT
    //      intermediates (n·Σxy reaches ~1e19 at sf1, num·Σx ~1e26 — far
    //      past int64, well inside 38 digits), so both engines agree
    //      bit-for-bit regardless of association order. At 100 TB this is
    //      the same single shuffle on the group key as any sum — the
    //      textbook "regression at scale is just five sums" design.
    Q("an72_regression",
      (s, d) => {
        val big = (c: Column) => c.cast("decimal(38,0)")
        Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            col("l_quantity").cast("bigint").as("xq"),
            cents(col("l_extendedprice")).as("yq"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(big(col("xq"))).as("sx"), sum(big(col("yq"))).as("sy"),
            sum(big(col("xq")) * big(col("yq"))).as("sxy"),
            sum(big(col("xq")) * big(col("xq"))).as("sxx"))
          .withColumn("num_s", expr("n * sxy - sx * sy"))
          .withColumn("den", expr("n * sxx - sx * sx"))
          // intercept from the already-reduced slope: (sy·1e4 − slope_bp·sx)/n
          // caps the intermediate at ~n² digits. The naive closed form
          // (sy·den − num_s·sx)/(n·den) grows ~n⁵ and approaches the
          // DECIMAL(38,0)/HUGEINT ceiling near sf100, where Spark
          // (non-ANSI) silently nulls on overflow while DuckDB raises.
          .withColumn("slope_bp",
            expr(halfUpDiv("num_s", "den", 10000L)).cast("bigint"))
          .select(col("l_returnflag"), col("n"), col("slope_bp"),
            expr(halfUpDiv("sy * 10000 - slope_bp * sx", "n", 1L))
              .cast("bigint").as("intercept_e4"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH g AS (
          SELECT l_returnflag, COUNT(*) AS n,
                 SUM(CAST(l_quantity AS HUGEINT)) AS sx,
                 SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS HUGEINT)) AS sy,
                 SUM(CAST(l_quantity AS HUGEINT) * CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS HUGEINT)) AS sxy,
                 SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS sxx
          FROM lineitem GROUP BY 1),
        st AS (SELECT *, n * sxy - sx * sy AS num_s, n * sxx - sx * sx AS den FROM g),
        sl AS (SELECT *, CAST(${duckHalfUpDiv("num_s", "den", 10000L)} AS HUGEINT) AS slope_bp FROM st)
        SELECT l_returnflag, n,
               CAST(slope_bp AS BIGINT) AS slope_bp,
               CAST(${duckHalfUpDiv("sy * 10000 - slope_bp * sx", "n", 1L)} AS BIGINT) AS intercept_e4
        FROM sl ORDER BY l_returnflag""")),

    // ---- time-series GAP-FILL / resample: the 20 lowest users' event
    //      stream resampled to a dense per-(user, day) grid over the
    //      corpus's global date span — missing days appear with
    //      n_events=0 and the last observed daily spend carried forward
    //      (classic forward-fill). The calendar is built from a 1-row
    //      global min/max aggregate exploded to ~span days and BROADCAST
    //      against the user list (BroadcastNestedLoopJoin over a
    //      days-sized build side — never a shuffled cartesian); the fill
    //      is one per-user window (last ignoreNulls) over grid rows,
    //      which at 100 TB is users × span — the resampled OUTPUT size,
    //      not the corpus. One shuffle on (user, day), one on user.
    Q("an73_gap_fill",
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("user_id") < 20)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            cents(col("value")).as("vc"))
        val daily = ev.groupBy("user_id", "day")
          .agg(count(lit(1)).as("n_events"), sum("vc").as("day_cents"))
        val days = Tables.events(s, d)
          .agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1"))
          .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        val grid = ev.select("user_id").distinct().crossJoin(broadcast(days))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily, Seq("user_id", "day"), "left")
          .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
          .withColumn("ff_cents",
            coalesce(last(col("day_cents"), ignoreNulls = true).over(w), lit(0L))
              .cast("bigint"))
          .select("user_id", "day", "n_events", "ff_cents")
          .orderBy("user_id", "day")
      },
      Some("""WITH ev AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
          FROM events WHERE user_id < 20),
        daily AS (SELECT user_id, day, COUNT(*) AS n_events, SUM(vc) AS day_cents
                  FROM ev GROUP BY 1, 2),
        b AS (SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events),
        days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        grid AS (SELECT u.user_id, dy.day FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN days dy),
        j AS (SELECT g.user_id, g.day, COALESCE(dl.n_events, 0) AS n_events, dl.day_cents
              FROM grid g LEFT JOIN daily dl USING (user_id, day))
        SELECT user_id, day, n_events,
               CAST(COALESCE(LAST_VALUE(day_cents IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS ff_cents
        FROM j ORDER BY user_id, day""")),

    // ---- robust outlier detection via MEDIAN ABSOLUTE DEVIATION: per
    //      returnflag, the exact median of price-cents, the MAD around it,
    //      and how many lines sit beyond median ± 1.5·MAD (k=1.5 rather
    //      than the gaussian 3 because the synthetic prices are near-
    //      uniform — 3·MAD covers the whole support and the audit would
    //      count nothing; unlike mean/stddev the MAD fence doesn't move
    //      when the outliers themselves grow). Medians of BIGINT cents are
    //      their deviations exact quarters — binary fractions both engines
    //      represent identically, so comparing doubles here is safe (the
    //      registry's one sanctioned double comparison). Shape: two
    //      grouped exact-percentile passes + a broadcast join of the
    //      3-row stats frame — the standard two-scan robust-stats plan.
    //      SCALE-GATED like an39: above `graft.an74.exactMedianRowBound`
    //      rows (default 1M — sf1 and beyond) both medians switch to
    //      `approx_percentile` (GK sketch, bounded memory per group, no
    //      exact percentile buffer holding a group's full value set);
    //      under it the exact path keeps the DuckDB oracle bit-exact at
    //      sf0.01. The audit columns are identical either way.
    Q("an74_mad_outliers",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_returnflag"), cents(col("l_extendedprice")).as("yq"))
        val bound = s.conf.get("graft.an74.exactMedianRowBound", "1000000").toLong
        val exact = Tables.lineitem(s, d).count() <= bound
        def med50(c: String): Column =
          if (exact) expr(s"percentile($c, 0.5D)")
          else expr(s"approx_percentile($c, 0.5D, 10000)").cast("double")
        val med = li.groupBy("l_returnflag")
          .agg(med50("yq").as("med"), count(lit(1)).as("n"))
        val dev = li.join(broadcast(med), "l_returnflag")
          .withColumn("dev", abs(col("yq") - col("med")))
        val mad = dev.groupBy("l_returnflag")
          .agg(med50("dev").as("mad"))
        dev.join(broadcast(mad), "l_returnflag")
          .groupBy(col("l_returnflag"), col("n"), col("med"), col("mad"))
          .agg(sum(when(col("dev") > col("mad") * 1.5, 1L).otherwise(0L)).as("n_outliers"))
          .select(col("l_returnflag"), col("n"), col("med"), col("mad"),
            col("n_outliers"),
            expr("n_outliers * 10000 div n").as("outlier_bp"))
          .orderBy("l_returnflag")
      },
      Some("""WITH li AS (
          SELECT l_returnflag,
                 CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS yq
          FROM lineitem),
        med AS (SELECT l_returnflag, median(yq) AS med, COUNT(*) AS n
                FROM li GROUP BY 1),
        dev AS (SELECT li.l_returnflag, m.n, m.med, ABS(li.yq - m.med) AS dev
                FROM li JOIN med m USING (l_returnflag)),
        mad AS (SELECT l_returnflag, median(dev) AS mad FROM dev GROUP BY 1)
        SELECT d.l_returnflag, d.n, d.med, ma.mad,
               CAST(SUM(CASE WHEN d.dev > ma.mad * 1.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(SUM(CASE WHEN d.dev > ma.mad * 1.5 THEN 1 ELSE 0 END) * 10000
                    // d.n AS BIGINT) AS outlier_bp
        FROM dev d JOIN mad ma USING (l_returnflag)
        GROUP BY 1, 2, 3, 4 ORDER BY d.l_returnflag""")),

    // ---- Z-ORDER layout audit: the multi-dimensional-clustering argument
    //      for file skipping, measured. Rows carry two independent 10-bit
    //      keys (partkey, orderkey mod 1024); bucketing the bit-interleaved
    //      z-value into 32 "files" bounds BOTH per-bucket key ranges
    //      (~256 × ~128 tiles), while bucketing linearly on one key leaves
    //      the other unbounded (32 × ~1024 stripes) — so a min/max skip
    //      index (ic08's per-file stats) can prune on EITHER predicate
    //      column under z-order, but only on the sort column under linear.
    //      The emitted per-bucket min/max/area is exactly the skip-index
    //      content. The interleave is a codegen'd shift/or CHAIN (an
    //      `aggregate(sequence(...))` fold runs its lambda interpreted
    //      per row — 3× the cost, measured on ic47); at 100 TB the
    //      z-value is the write-path repartitionByRange key and this
    //      audit is the post-write layout check.
    Q("an75_zorder_skipping",
      (s, d) => {
        val zchain = (0 until 10).map { i =>
          shiftleft(shiftright(col("xk"), i).bitwiseAND(lit(1L)), 2 * i)
            .bitwiseOR(shiftleft(shiftright(col("yk"), i).bitwiseAND(lit(1L)), 2 * i + 1))
        }.reduce(_ bitwiseOR _)
        val z = Tables.lineitem(s, d)
          .select((col("l_partkey") % 1024).cast("long").as("xk"),
            (col("l_orderkey") % 1024).cast("long").as("yk"))
          .withColumn("zval", zchain)
        val zb = z.withColumn("scheme", lit("zorder"))
          .withColumn("bucket", expr("shiftright(zval, 15)"))
        val lb = z.withColumn("scheme", lit("linear"))
          .withColumn("bucket", expr("shiftright(xk, 5)"))
        zb.unionByName(lb)
          .groupBy("scheme", "bucket")
          .agg(count(lit(1)).as("n_rows"),
            min("xk").as("x_min"), max("xk").as("x_max"),
            min("yk").as("y_min"), max("yk").as("y_max"))
          .withColumn("area", expr("(x_max - x_min + 1) * (y_max - y_min + 1)"))
          .orderBy("scheme", "bucket")
      },
      Some("""WITH b AS (
          SELECT l_partkey % 1024 AS xk, l_orderkey % 1024 AS yk FROM lineitem),
        z AS (
          SELECT xk, yk,
                 CAST(list_sum(list_transform(range(0, 10),
                   i -> (((xk >> i) & 1) << (2 * i)) + (((yk >> i) & 1) << (2 * i + 1))))
                   AS BIGINT) AS zval
          FROM b),
        u AS (
          SELECT 'zorder' AS scheme, zval >> 15 AS bucket, xk, yk FROM z
          UNION ALL
          SELECT 'linear' AS scheme, xk >> 5 AS bucket, xk, yk FROM z),
        g AS (
          SELECT scheme, bucket, COUNT(*) AS n_rows,
                 MIN(xk) AS x_min, MAX(xk) AS x_max,
                 MIN(yk) AS y_min, MAX(yk) AS y_max
          FROM u GROUP BY 1, 2)
        SELECT scheme, bucket, n_rows, x_min, x_max, y_min, y_max,
               (x_max - x_min + 1) * (y_max - y_min + 1) AS area
        FROM g ORDER BY scheme, bucket"""))
  ) ++ Seq(countMinQ)

  // ---- COUNT-MIN SKETCH, built and then audited against exact counts.
  //      The sketch is a 4×64 integer grid (row j buckets word-hash h by
  //      (a_j·h + b_j) mod P mod 64; cells sum collisions) — fixed 256
  //      cells of state no matter how many distinct words exist, which is
  //      why it's the streaming/mergeable answer to heavy-hitter counting
  //      at 100 TB: cell counts are plain sums, so partial sketches merge
  //      by addition (map-side combine does it for free). The audit joins
  //      the exact top-20 words against their 4 cells and reports the
  //      estimate (min over rows — NEVER below truth, one-sided error) and
  //      the overestimate each suffered. All integer arithmetic, shared
  //      with the oracle via the [[graft.Hashing]] parameter set.
  private lazy val countMinQ: Q = {
    val P = graft.Hashing.P
    val W = 64L
    val params = graft.Hashing.minhashParams.take(4)
    Q("an76_count_min",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val words = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("wd"))
          .select(col("wd"), graft.functions.hashfns.rollHash(col("wd"), P).as("h"))
        val rows = params.map { case (j, a, b) =>
          words.select(lit(j).as("j"), expr(s"(($a * h + $b) % $P) % $W").as("bucket"))
        }.reduce(_ unionByName _)
        val sketch = rows.groupBy("j", "bucket").agg(count(lit(1)).as("cell"))
        val exact = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("wd"))
          .groupBy("wd").agg(count(lit(1)).as("exact_c"))
          .withColumn("rank",
            row_number().over(Window.orderBy(desc("exact_c"), asc("wd"))).cast("long"))
          .filter(col("rank") <= 20)
          .withColumn("h", graft.functions.hashfns.rollHash(col("wd"), P))
        val probes = params.map { case (j, a, b) =>
          exact.select(col("rank"), col("wd"), col("exact_c"),
            lit(j).as("j"), expr(s"(($a * h + $b) % $P) % $W").as("bucket"))
        }.reduce(_ unionByName _)
        probes.join(sketch, Seq("j", "bucket"))
          .groupBy("rank", "wd", "exact_c")
          .agg(min("cell").as("est_c"))
          .select(col("rank"), col("wd"), col("exact_c"), col("est_c"),
            (col("est_c") - col("exact_c")).as("over_c"))
          .orderBy("rank")
      },
      Some {
        val h  = graft.Hashing.duckRollHash("wd", P, "c0")
        val pv = params.map { case (j, a, b) => s"($j, $a, $b)" }.mkString(", ")
        s"""WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS wd FROM documents),
          wh AS (SELECT wd, $h AS h FROM words),
          whd AS (SELECT DISTINCT wd, h FROM wh),
          params(j, pa, pb) AS (VALUES $pv),
          cells AS (
            SELECT j, ((pa * h + pb) % $P) % $W AS bucket, COUNT(*) AS cell
            FROM wh CROSS JOIN params GROUP BY 1, 2),
          exact AS (
            SELECT wd, COUNT(*) AS exact_c FROM words GROUP BY 1),
          top AS (
            SELECT wd, exact_c,
                   CAST(row_number() OVER (ORDER BY exact_c DESC, wd) AS BIGINT) AS rank
            FROM exact QUALIFY rank <= 20),
          probes AS (
            SELECT t.rank, t.wd, t.exact_c, p.j,
                   ((p.pa * w.h + p.pb) % $P) % $W AS bucket
            FROM top t JOIN whd w ON t.wd = w.wd CROSS JOIN params p),
          est AS (
            SELECT pr.rank, pr.wd, pr.exact_c, MIN(c.cell) AS est_c
            FROM probes pr JOIN cells c ON pr.j = c.j AND pr.bucket = c.bucket
            GROUP BY 1, 2, 3)
          SELECT rank, wd, exact_c, est_c, est_c - exact_c AS over_c
          FROM est ORDER BY rank"""
      })
  }
}
