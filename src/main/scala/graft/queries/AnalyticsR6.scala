package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 analytics surface growth: gaps-and-islands streaks, per-group
  * mode, sweep-line concurrency, Benford first-digit audit, and a Markov
  * transition matrix — event-log shapes every warehouse user writes once
  * their core relational ops exist (SURVEY.md §2.3–2.7 surface).
  *
  * Exactness discipline matches [[Analytics]]: ratios are integer basis
  * points (`x * 10000 div total`), never float division, so Spark and the
  * DuckDB oracle agree bit-for-bit; every output ends in a total ORDER BY
  * with every computed column aliased identically on both sides.
  */
object AnalyticsR6 {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")

  def all: Seq[Q] = Seq(

    // ---- gaps & islands: per user, maximal runs of consecutive active
    //      days via the classic day − row_number() grouping key. Two
    //      shuffles (distinct days, then the per-user window) — both keyed
    //      on user_id, so at 100 TB this is one repartition by user
    //      reused across stages; per-user day counts are calendar-bounded,
    //      so no window partition can skew.
    Q("an53_islands",
      (s, d) => {
        val perUser = Window.partitionBy("user_id").orderBy("day")
        val days = Tables.events(s, d)
          .select(col("user_id"), datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("day"))
          .distinct()
        days
          .withColumn("grp", col("day") - row_number().over(perUser))
          .groupBy("user_id", "grp")
          .agg(min("day").as("start_day"), count(lit(1)).as("streak_len"))
          .select(
            col("user_id"),
            date_add(lit("2024-01-01").cast("date"), col("start_day")).as("streak_start"),
            col("streak_len"))
          .orderBy("user_id", "streak_start")
      },
      Some("""WITH days AS (
          SELECT DISTINCT user_id, datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
          FROM events),
        grp AS (
          SELECT user_id, day,
                 day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
          FROM days)
        SELECT user_id,
               DATE '2024-01-01' + CAST(MIN(day) AS INTEGER) AS streak_start,
               COUNT(*) AS streak_len
        FROM grp GROUP BY user_id, grp
        ORDER BY user_id, streak_start""")),

    // ---- per-group mode: each user's most frequent event type with a
    //      deterministic (count DESC, type ASC) tie-break, plus its share
    //      in integer basis points. One shuffle on (user, type), then a
    //      user-keyed window over ≤5 rows per user — the top-1-per-group
    //      plan Spark fuses to WindowGroupLimit, O(1) state per user at
    //      any scale.
    Q("an54_mode",
      (s, d) => {
        val perUser = Window.partitionBy("user_id").orderBy(desc("cnt"), asc("event_type"))
        Tables.events(s, d)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
          .withColumn("total", sum("cnt").over(Window.partitionBy("user_id")))
          .withColumn("rn", row_number().over(perUser))
          .filter(col("rn") === 1)
          .select(
            col("user_id"),
            col("event_type").as("mode_type"),
            col("cnt"),
            expr("cnt * 10000 div total").as("share_bp"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (
          SELECT user_id, event_type, COUNT(*) AS cnt,
                 CAST(SUM(COUNT(*)) OVER (PARTITION BY user_id) AS BIGINT) AS total,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY COUNT(*) DESC, event_type) AS rn
          FROM events GROUP BY user_id, event_type)
        SELECT user_id, event_type AS mode_type, cnt,
               cnt * 10000 // total AS share_bp
        FROM c WHERE rn = 1 ORDER BY user_id""")),

    // ---- sweep-line concurrency: each event holds a 60-second interval;
    //      peak simultaneous intervals per event type. Boundaries are
    //      pre-aggregated per (type, instant) so the running sum sees net
    //      deltas — tie-order inside an instant cannot change any prefix
    //      value, which keeps the MAX deterministic. One shuffle + one
    //      type-keyed ordered window. Scale note: the running sum is
    //      sequential per type; with a high-cardinality partition key this
    //      is the mm05 pattern (per-partition partial sums, then a
    //      broadcast prefix offset) — here type cardinality is 5, and the
    //      per-type boundary stream is what a single executor core absorbs.
    Q("an55_concurrency",
      (s, d) => {
        val ev = Tables.events(s, d)
        val starts = ev.select(col("event_type"), col("ts").as("t"), lit(1L).as("delta"))
        val ends = ev.select(col("event_type"),
          (col("ts") + expr("INTERVAL 60 SECONDS")).as("t"), lit(-1L).as("delta"))
        val perType = Window.partitionBy("event_type").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        starts.unionAll(ends)
          .groupBy("event_type", "t").agg(sum("delta").as("net"))
          .withColumn("running", sum("net").over(perType))
          .groupBy("event_type")
          .agg(max("running").as("peak_concurrent"))
          .join(ev.groupBy("event_type").agg(count(lit(1)).as("n_events")), Seq("event_type"))
          .select("event_type", "n_events", "peak_concurrent")
          .orderBy("event_type")
      },
      Some("""WITH b AS (
          SELECT event_type, ts AS t, 1 AS delta FROM events
          UNION ALL
          SELECT event_type, ts + INTERVAL 60 SECOND, -1 FROM events),
        net AS (
          SELECT event_type, t, CAST(SUM(delta) AS BIGINT) AS net
          FROM b GROUP BY event_type, t),
        run AS (
          SELECT event_type,
                 CAST(SUM(net) OVER (PARTITION BY event_type ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
          FROM net)
        SELECT r.event_type, n.n_events, r.peak_concurrent
        FROM (SELECT event_type, MAX(running) AS peak_concurrent
              FROM run GROUP BY event_type) r
        JOIN (SELECT event_type, COUNT(*) AS n_events
              FROM events GROUP BY event_type) n USING (event_type)
        ORDER BY event_type""")),

    // ---- Benford first-digit audit: distribution of the leading digit of
    //      the lineitem extended price vs the Benford expectation, both in
    //      integer basis points (the expectation is a 9-entry compile-time
    //      constant — no runtime log10, no float boundary). Pure one-pass
    //      grouped scan, 9 output rows at any scale.
    Q("an56_benford",
      (s, d) => {
        // floor(log10(1 + 1/d) * 10000) for d = 1..9, precomputed
        val benford = Map(1 -> 3010L, 2 -> 1760L, 3 -> 1249L, 4 -> 969L,
          5 -> 791L, 6 -> 669L, 7 -> 579L, 8 -> 511L, 9 -> 457L)
        val expected = benford.foldLeft(lit(0L)) { case (acc, (dig, bp)) =>
          when(col("digit") === dig.toString, lit(bp)).otherwise(acc)
        }
        Tables.lineitem(s, d)
          // explicit floor: DuckDB's double→BIGINT cast rounds, Spark's truncates
          .select(substring(floor(col("l_extendedprice")).cast("bigint").cast("string"), 1, 1).as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("cnt"))
          .withColumn("total", sum("cnt").over())
          .select(
            col("digit"),
            col("cnt"),
            expr("cnt * 10000 div total").as("share_bp"),
            expected.as("benford_bp"))
          .withColumn("dev_bp", col("share_bp") - col("benford_bp"))
          .orderBy("digit")
      },
      Some("""WITH c AS (
          SELECT substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit,
                 COUNT(*) AS cnt
          FROM lineitem GROUP BY 1),
        t AS (SELECT *, CAST(SUM(cnt) OVER () AS BIGINT) AS total FROM c),
        e AS (SELECT *, cnt * 10000 // total AS share_bp,
                 CAST(CASE digit WHEN '1' THEN 3010 WHEN '2' THEN 1760 WHEN '3' THEN 1249
                            WHEN '4' THEN 969 WHEN '5' THEN 791 WHEN '6' THEN 669
                            WHEN '7' THEN 579 WHEN '8' THEN 511 WHEN '9' THEN 457
                            ELSE 0 END AS BIGINT) AS benford_bp
              FROM t)
        SELECT digit, cnt, share_bp, benford_bp,
               share_bp - benford_bp AS dev_bp
        FROM e ORDER BY digit""")),

    // ---- Markov transition matrix: P(next event type | current) from
    //      per-user event sequences. LEAD over (user, time) — one shuffle
    //      on user_id, sequential only within a user's own history — then
    //      a 25-key aggregate. Probabilities are integer basis points over
    //      the per-source-state row total (window over ≤5 rows). The same
    //      plan at 100 TB: the user-keyed window is the natural partition.
    Q("an57_markov",
      (s, d) => {
        val seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("next_type", lead("event_type", 1).over(seq))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("from_total", sum("cnt").over(Window.partitionBy("from_type")))
          .withColumn("prob_bp", expr("cnt * 10000 div from_total"))
          .drop("from_total")
          .orderBy("from_type", "to_type")
      },
      Some("""WITH seq AS (
          SELECT event_type,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
          FROM events),
        c AS (
          SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS cnt
          FROM seq WHERE next_type IS NOT NULL
          GROUP BY 1, 2)
        SELECT from_type, to_type, cnt,
               cnt * 10000 // CAST(SUM(cnt) OVER (PARTITION BY from_type) AS BIGINT) AS prob_bp
        FROM c ORDER BY from_type, to_type""")),

    // ---- bucketed co-located join: both fact tables are written
    //      bucketBy(8, join-key) + sortBy, so the subsequent join needs NO
    //      shuffle exchange on either side — Spark's output partitioning
    //      already satisfies the join's distribution requirement
    //      (PlanAuditSpec asserts zero Exchange with broadcast disabled).
    //      This is the 100 TB co-location strategy: pay one bucketed write
    //      at ingest, then every keyed join/agg on that key is
    //      exchange-free forever after. At sf0.01 the dim side would
    //      broadcast anyway; the bucketed layout is what survives when
    //      both sides are TB-scale and broadcast stops being an option.
    Q("an58_bucketed_join",
      (s, d) => {
        s.sql("DROP TABLE IF EXISTS b_lineitem")
        s.sql("DROP TABLE IF EXISTS b_orders")
        Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", "target/scratch/bucketed/b_lineitem")
          .saveAsTable("b_lineitem")
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", "target/scratch/bucketed/b_orders")
          .saveAsTable("b_orders")
        s.table("b_lineitem")
          .join(s.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1""")),

    // ---- semi-structured JSON column: the events table carries a JSON
    //      properties string; extract the typed field with from_json (a
    //      declared schema, the Spark-native typed path — codegen'd, no
    //      UDF) and aggregate over derived buckets. At 100 TB the rule is
    //      the same as here: parse ONCE per row into a typed struct at
    //      scan time, never re-extract per expression — and persist the
    //      parsed column at ingest if more than one query reads it.
    Q("an59_json_surface",
      (s, d) => {
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))
        Tables.events(s, d)
          .select(col("event_type"),
            from_json(col("props"), schema).getField("k").as("k"))
          .filter(col("k").isNotNull)
          .groupBy(col("event_type"), expr("k div 10").as("k_bucket"))
          .agg(count(lit(1)).as("n"), min("k").as("k_min"), max("k").as("k_max"))
          .orderBy("event_type", "k_bucket")
      },
      Some("""WITH x AS (
          SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
        SELECT event_type, k // 10 AS k_bucket,
               COUNT(*) AS n, MIN(k) AS k_min, MAX(k) AS k_max
        FROM x WHERE k IS NOT NULL
        GROUP BY 1, 2 ORDER BY event_type, k_bucket""")),

    // ---- mergeable-sketch roll-up: per-priority HLL register sets (an33's
    //      integer-exact pipeline) estimate each group's distinct
    //      customers, then the GLOBAL estimate comes from merging the
    //      group registers with MAX — never re-reading the data. This is
    //      THE scale property that makes sketches worth their error bar:
    //      at 100 TB, per-partition sketches roll up to any grain as a
    //      256-value MAX, and the merged estimate is bit-identical to the
    //      single-pass global sketch (MAX is associative). Registers are
    //      exact BIGINTs; the one float division per output row is the
    //      an33-proven estimate step.
    Q("an60_hll_merge",
      (s, d) => {
        val regs = Tables.orders(s, d)
          .selectExpr("o_orderpriority AS g", "CAST(o_custkey AS BIGINT) AS x")
          .selectExpr("g", "((shiftright(x, 16) ^ x) * 73244475) % 4294967296 AS h")
          .selectExpr("g", "((shiftright(h, 16) ^ h) * 73244475) % 4294967296 AS h")
          .selectExpr("g", "shiftright(h, 16) ^ h AS h")
          .selectExpr("g", "h div 16777216 AS bucket", "h % 16777216 AS w")
          .selectExpr("g", "bucket",
            "CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END AS rho")
          .groupBy("g", "bucket").agg(max("rho").as("rho"))
          .persist()
        // FLOOR of the 1e4-scaled estimate: both engines compute the same
        // IEEE constant and one correctly-rounded division, so the floor
        // is bit-deterministic — ROUND(,4) is not (Spark HALF_UP string
        // rendering vs DuckDB scaled nearbyint diverge at half-ulp). The
        // D suffixes matter: a bare 0.7213 parses as DECIMAL(5,4) in
        // Spark and the decimal-division constant differs from DuckDB's
        // double at the 1e-10 level — enough to flip a floor.
        val est = expr(
          "CAST(FLOOR((0.7213D / (1.0D + 1.079D / 256.0D)) * 256.0D * 256.0D * 33554432.0D * 10000.0D / scaled) AS BIGINT)")
        def estimate(r: DataFrame, grainCol: Column): DataFrame = {
          val grains = r.select(grainCol.as("grain")).distinct()
          grains.join(broadcast(s.range(256).toDF("bucket")))
            .join(r.select(grainCol.as("grain"), col("bucket"), col("rho")),
              Seq("grain", "bucket"), "left")
            .na.fill(0, Seq("rho"))
            .groupBy("grain")
            .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 25 - rho)")).as("scaled"))
            .select(col("grain"), est.as("est_x10000"))
        }
        val perG   = estimate(regs, col("g"))
        val merged = estimate(
          regs.groupBy("bucket").agg(max("rho").as("rho")), lit("ALL"))
        val exactG = Tables.orders(s, d)
          .groupBy(col("o_orderpriority").as("grain"))
          .agg(countDistinct("o_custkey").as("n_exact"))
        val exactA = Tables.orders(s, d)
          .agg(countDistinct("o_custkey").as("n_exact")).withColumn("grain", lit("ALL"))
        perG.unionByName(merged)
          .join(exactG.unionByName(exactA), Seq("grain"))
          .select("grain", "est_x10000", "n_exact")
          .orderBy("grain")
      },
      Some("""WITH x AS (
          SELECT o_orderpriority AS g, CAST(o_custkey AS BIGINT) AS x FROM orders),
        h1 AS (SELECT g, (xor(x >> 16, x) * 73244475) % 4294967296 AS h FROM x),
        h2 AS (SELECT g, (xor(h >> 16, h) * 73244475) % 4294967296 AS h FROM h1),
        hf AS (SELECT g, xor(h >> 16, h) AS h FROM h2),
        b AS (SELECT g, h // 16777216 AS bucket, h % 16777216 AS w FROM hf),
        r AS (
          SELECT g, bucket,
                 MAX(CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END) AS rho
          FROM b GROUP BY g, bucket),
        rall AS (SELECT 'ALL' AS g, bucket, MAX(rho) AS rho FROM r GROUP BY bucket),
        ru AS (SELECT * FROM r UNION ALL SELECT * FROM rall),
        grid AS (
          SELECT gg.g, t.range AS bucket
          FROM (SELECT DISTINCT g FROM ru) gg CROSS JOIN range(256) t),
        filled AS (
          SELECT grid.g, COALESCE(ru.rho, 0) AS rho
          FROM grid LEFT JOIN ru ON grid.g = ru.g AND grid.bucket = ru.bucket),
        z AS (
          SELECT g AS grain, SUM(CAST(1 AS BIGINT) << (25 - rho)) AS scaled
          FROM filled GROUP BY g),
        e AS (
          SELECT o_orderpriority AS grain, COUNT(DISTINCT o_custkey) AS n_exact
          FROM orders GROUP BY 1
          UNION ALL
          SELECT 'ALL', COUNT(DISTINCT o_custkey) FROM orders)
        SELECT z.grain,
               CAST(FLOOR((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 * 33554432.0
                     * 10000.0 / scaled) AS BIGINT) AS est_x10000,
               n_exact
        FROM z JOIN e ON z.grain = e.grain
        ORDER BY z.grain""")),

    // ---- first-touch attribution: each purchase is credited to the FIRST
    //      event type of its user session (30-min gap, an12's islands).
    //      One user-keyed window pass derives session ids, a second takes
    //      first_value per session — both partition on user, so the whole
    //      funnel computes in a single shuffle's worth of co-partitioned
    //      windows; the credit rollup is a 25-key aggregate. The
    //      product-analytics query every event pipeline ends up running.
    Q("an61_attribution",
      (s, d) => {
        val seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val bySess = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
        val ev = Tables.events(s, d)
          .withColumn("us", expr("unix_micros(cast(ts as timestamp_ltz))"))
          .withColumn("prev_us", lag("us", 1).over(seq))
          .withColumn("nw", when(col("prev_us").isNull ||
            col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
          .withColumn("sid", sum("nw").over(seq.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("first_touch", first("event_type").over(bySess))
        ev.filter(col("event_type") === "purchase")
          .groupBy(col("first_touch"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
          .orderBy("first_touch")
      },
      Some("""WITH x AS (
          SELECT user_id, ts, event_id, event_type, value,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
          FROM events),
        y AS (
          SELECT *, CASE WHEN prev_us IS NULL
                          OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS nw
          FROM x),
        z AS (
          SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM y),
        f AS (
          SELECT *, first_value(event_type) OVER (PARTITION BY user_id, sid
                                                  ORDER BY ts, event_id) AS first_touch
          FROM z)
        SELECT first_touch, COUNT(*) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM f WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY first_touch""")),

    // ---- time-to-convert: per viewer, seconds from first view to first
    //      purchase, rolled up per customer market segment with discrete
    //      p50/p90 and an integer-bp conversion rate. Two user-keyed
    //      min-aggregates (one shuffle each, co-partitioned), a broadcast
    //      dim join, and a 5-key percentile aggregate. Times stay exact
    //      integer microseconds until the final div to whole seconds —
    //      no float anywhere. The funnel-latency metric a growth team
    //      tracks weekly at any event volume.
    Q("an62_time_to_convert",
      (s, d) => {
        val us = expr("unix_micros(cast(ts as timestamp_ltz))")
        val ev = Tables.events(s, d)
        val firstView = ev.filter(col("event_type") === "view")
          .select(col("user_id"), us.as("us"))
          .groupBy("user_id").agg(min("us").as("t_view"))
        val firstBuy = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), us.as("us"))
          .groupBy("user_id").agg(min("us").as("t_buy"))
        val dim = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        firstView
          .join(firstBuy, Seq("user_id"), "left")
          .withColumn("tts_s", when(col("t_buy") >= col("t_view"),
            expr("(t_buy - t_view) div 1000000")).otherwise(lit(null)))
          .join(broadcast(dim), col("user_id") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_viewers"),
            count(col("tts_s")).as("n_converted"),
            expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY tts_s) AS BIGINT)").as("p50_s"),
            expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY tts_s) AS BIGINT)").as("p90_s"))
          .withColumn("conv_bp", expr("n_converted * 10000 div n_viewers"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH v AS (
          SELECT user_id, MIN(epoch_us(ts)) AS t_view
          FROM events WHERE event_type = 'view' GROUP BY user_id),
        b AS (
          SELECT user_id, MIN(epoch_us(ts)) AS t_buy
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        j AS (
          SELECT v.user_id, CASE WHEN b.t_buy >= v.t_view
                 THEN (b.t_buy - v.t_view) // 1000000 ELSE NULL END AS tts_s
          FROM v LEFT JOIN b ON v.user_id = b.user_id),
        seg AS (
          SELECT c_mktsegment, tts_s
          FROM j JOIN customer ON user_id = c_custkey)
        SELECT c_mktsegment,
               COUNT(*) AS n_viewers,
               COUNT(tts_s) AS n_converted,
               quantile_disc(tts_s, 0.5) AS p50_s,
               quantile_disc(tts_s, 0.9) AS p90_s,
               COUNT(tts_s) * 10000 // COUNT(*) AS conv_bp
        FROM seg GROUP BY 1 ORDER BY c_mktsegment""")),

    // ---- equi-DEPTH histogram: ntile(10) boundaries over the price
    //      column — the other histogram a cost-based optimizer keeps
    //      (an47 is equi-width). NOT a global ntile window (that plans a
    //      single-partition sort of the whole fact table — measured 8.6 s
    //      at 10x, the one data-proportional sequential stage in the
    //      registry): instead the scalable exact shape — range-repartition
    //      on the sort key, sort within partitions, collect the 32
    //      per-partition COUNTS (driver state is one long per partition),
    //      broadcast the prefix offsets, and assign each row its global
    //      row number map-side. The ntile bucket is then pure arithmetic
    //      (first N mod 10 buckets get the extra row, the ANSI rule), so
    //      the result is bit-identical to the window version at any
    //      parallelism. 8.6 s -> sub-second at 10x with every core busy.
    Q("an63_equidepth_hist",
      (s, d) => {
        import s.implicits._
        val base = Tables.lineitem(s, d)
          .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
          .repartitionByRange(32, col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
          .sortWithinPartitions("l_extendedprice", "l_orderkey", "l_linenumber")
          .as[(Double, Long, Int)]
          .persist()
        val counts = base
          .mapPartitions(it => Iterator.single(
            (org.apache.spark.TaskContext.getPartitionId(), it.size.toLong)))
          .collect().sortBy(_._1)
        val n = counts.map(_._2).sum
        val offsets = counts.map(_._1).zip(
          counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
        val bcOff = s.sparkContext.broadcast(offsets)
        base
          .mapPartitions { it =>
            var rn = bcOff.value(org.apache.spark.TaskContext.getPartitionId())
            it.map { case (price, _, _) => rn += 1; (price, rn) }
          }
          .toDF("l_extendedprice", "rn")
          // ANSI ntile: q = n div 10, r = n mod 10; the first r buckets
          // hold q+1 rows (covers the q=0 small-input case too)
          .withColumn("bucket", expr(
            s"CASE WHEN rn <= ${n % 10} * (${n / 10} + 1) " +
              s"THEN (rn - 1) div (${n / 10} + 1) + 1 " +
              s"ELSE ${n % 10} + (rn - ${n % 10} * (${n / 10} + 1) - 1) div ${n / 10} + 1 END"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
            min("l_extendedprice").as("lo"),
            max("l_extendedprice").as("hi"))
          .orderBy("bucket")
      },
      Some("""WITH b AS (
          SELECT l_extendedprice,
                 CAST(ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS bucket
          FROM lineitem)
        SELECT bucket, COUNT(*) AS n_rows,
               MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
        FROM b GROUP BY bucket ORDER BY bucket""")),

    // ---- percent-of-parent hierarchy: each nation's share of its
    //      region's order count and each region's share of the total, in
    //      one pass — the drill-down share layout every OLAP report
    //      renders. One grouped aggregate at nation grain, then two
    //      constant-size windows (region total, grand total) over the
    //      25-row result; shares are integer basis points. At 100 TB the
    //      windows still run over the aggregate, never the fact table.
    Q("an64_share_of_parent",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        val grain = o
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_orders"))
        grain
          .withColumn("region_total", sum("n_orders").over(Window.partitionBy("r_name")))
          .withColumn("grand_total", sum("n_orders").over(Window.partitionBy()))
          .select(col("r_name"), col("n_name"), col("n_orders"),
            expr("n_orders * 10000 div region_total").as("share_of_region_bp"),
            expr("region_total * 10000 div grand_total").as("region_share_bp"))
          .orderBy("r_name", "n_name")
      },
      Some("""WITH g AS (
          SELECT r_name, n_name, COUNT(*) AS n_orders
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2),
        w AS (
          SELECT *, CAST(SUM(n_orders) OVER (PARTITION BY r_name) AS BIGINT) AS region_total,
                 CAST(SUM(n_orders) OVER () AS BIGINT) AS grand_total
          FROM g)
        SELECT r_name, n_name, n_orders,
               n_orders * 10000 // region_total AS share_of_region_bp,
               region_total * 10000 // grand_total AS region_share_bp
        FROM w ORDER BY r_name, n_name"""))
  )
}
