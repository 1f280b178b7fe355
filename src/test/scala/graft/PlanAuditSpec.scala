package graft

import org.apache.spark.sql.functions._

/** Physical-plan regression guards: the 100 TB design claims in PERF.md,
  * enforced as assertions on `executedPlan` so a future edit can't silently
  * regress a pushdown, broadcast, or decorrelation. Complements the
  * value-level oracle gate, which cannot see HOW a result was computed. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("ref10 pushes its row filter into the parquet scan") {
    // AQE's top-level toString truncates before the leaf scan and hides the
    // subtree from collect(), so read the formatted explain, which always
    // prints each scan's PushedFilters in full.
    val df = SparkEntry.queries("ref10_pushdown")(spark, sfDir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = raw"PushedFilters: \[([^\]]*)\]".r
      .findAllMatchIn(p).map(_.group(1).trim).toList
    assert(pushed.nonEmpty, "no scan with PushedFilters in plan:\n" + p.take(800))
    assert(pushed.exists(_.nonEmpty), s"no filter reached any scan: $pushed")
  }

  test("an58 bucketed tables join with ZERO shuffle exchange (broadcast off)") {
    // run the query once so the bucketed tables exist, then force the
    // non-broadcast path: co-located bucketing must satisfy the join's
    // distribution requirement with no Exchange on either side
    SparkEntry.queries("an58_bucketed_join")(spark, sfDir).collect()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "bucketed join should be exchange-free:\n" + p.take(1200))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "expected a shuffle-family join operator (satisfied by bucketing):\n" + p.take(600))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("an03 6-way join broadcasts every dimension (no SortMergeJoin)") {
    val p = plan("an03_local_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"),
      "dimension join fell back to sort-merge: " + p.take(600))
  }

  test("ic49 DSv2 scan prunes files from a plain WHERE (files=1/2 in explain)") {
    // spark.read.format("icelite") + .filter — no scanRange call anywhere;
    // SupportsPushDownFilters must hand the bound to planFilesBounds and
    // the BatchScan description must show the pruned file count
    val df = SparkEntry.queries("ic49_dsv2_pushdown")(spark, sfDir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("files=1/2"), "DSv2 scan did not prune:\n" + p.take(800))
    assert(p.contains("BatchScan"), p.take(400))
    assert(df.count() > 0)
  }

  test("ic50 storage-partitioned join/agg runs with zero hash-partition Exchange") {
    // both IceLite tables are hive-partitioned on the join key; the V2
    // scans report KeyGroupedPartitioning so the join AND the grouped
    // aggregate satisfy their distribution from table metadata alone
    val df = SparkEntry.queries("ic50_spj_join")(spark, sfDir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!p.contains("Exchange hashpartitioning"),
      "SPJ still shuffled:\n" + p.take(1200))
    assert(p.contains("SortMergeJoin"), p.take(600))
  }

  test("ic52 DSv2 COUNT(*) answers from manifest metadata with zero file reads") {
    // the query's internal requires assert the plan says metadata-only
    // count AND the files-opened counter stays at zero across execution
    val df = SparkEntry.queries("ic52_dsv2_count")(spark, sfDir)
    assert(df.collect().map(_.getLong(0)).head > 0L)
  }

  test("ic53 DSv2 runtime filtering prunes partition files the dim side excludes") {
    // internal require: files opened at execution < total files of the
    // fact table — Spark's DPP flowing through SupportsRuntimeFiltering
    val df = SparkEntry.queries("ic53_dsv2_runtime_prune")(spark, sfDir)
    assert(df.collect().length == 1)
  }

  test("SQL DELETE is a bounded copy-on-write: the pruned file is never even read") {
    // SupportsRowLevelOperations, group-based: the DELETE condition is
    // pushed into the row-level scan (GroupBasedRowLevelOperationScanPlanning),
    // manifest min/max pruning keeps the high-range file out of the scan,
    // and the commit carries it by IDENTICAL physical path. The
    // filesOpened counter proves the plan claim at the IO level: the
    // whole DELETE opens exactly the files it rewrites.
    val wh = scratch("rl_audit") // scratch() wipes — resolve once
    spark.conf.set("spark.sql.catalog.rl_audit", "graft.sources.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.rl_audit.warehouse", wh)
    try {
      spark.range(1000).selectExpr("id AS k", "concat('v', id) AS v")
        .coalesce(1).createOrReplaceTempView("rl_src")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS rl_audit.ns")
      spark.sql("CREATE TABLE rl_audit.ns.t AS SELECT * FROM rl_src WHERE k < 500")
      spark.sql("INSERT INTO rl_audit.ns.t SELECT * FROM rl_src WHERE k >= 500")
      val cat = new graft.icelite.FsCatalog(spark, wh)
      def files() = { val t = cat.loadTable("ns", "t")
                      t.filesOf(t.metadata.currentSnapshot.get).toSet }
      val all0 = files()
      assert(all0.size == 2, s"expected 2 files, got $all0")
      val highFiles = {
        val t  = cat.loadTable("ns", "t")
        val st = t.statsOf(t.metadata.currentSnapshot.get)
        all0.filter(f => st.get(f).flatMap(_.get("k")).exists(_.min.exists(_.toLong >= 500L)))
      }
      assert(highFiles.size == 1, s"stats did not separate the two files: $highFiles")
      graft.sources.IceLiteSource.filesOpened.reset()
      spark.sql("DELETE FROM rl_audit.ns.t WHERE k < 100")
      val opened = graft.sources.IceLiteSource.filesOpened.sum()
      assert(opened == 1L, s"row-level scan opened $opened files; expected only the affected one")
      val after = files()
      assert(highFiles.subsetOf(after), "pruned file did not carry by physical path")
      assert(spark.sql("SELECT COUNT(*) FROM rl_audit.ns.t").head().getLong(0) == 900L)
    } finally {
      spark.conf.unset("spark.sql.catalog.rl_audit")
      spark.conf.unset("spark.sql.catalog.rl_audit.warehouse")
    }
  }

  test("an39 NDV is scale-gated: neither path plans a multi-distinct Expand") {
    // under the bound (oracle scale): exact countDistinct, restructured
    // in round 17 as one single-distinct aggregate per column — no
    // Expand (a wide 4-way multi-distinct would blow rows 4-5x through
    // the partial aggregate), and each branch's scan reads ONLY its own
    // column. Above it (sf1sim and beyond): approx_count_distinct — HLL
    // sketch, one wide scan, no Expand either. The conf key stands in
    // for data volume so both shapes are assertable at test scale.
    def planOf(): String = {
      val df = SparkEntry.queries("an39_column_stats")(spark, sfDir)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    }
    val exactPlan = planOf()
    assert(!exactPlan.contains("Expand"),
      "exact per-column branches must not plan an Expand:\n" + exactPlan.take(900))
    assert(exactPlan.contains("count(distinct"), exactPlan.take(600))
    // per-branch column pruning: the l_linenumber branch's scan must not
    // drag the full lineitem width through the aggregate
    assert(exactPlan.contains("ReadSchema: struct<l_linenumber"),
      "exact branch scans should read only their own column:\n" + exactPlan.take(1200))
    spark.conf.set("graft.an39.exactNdvRowBound", "1")
    try {
      val approxPlan = planOf()
      assert(!approxPlan.contains("Expand"),
        "scale-gated NDV still plans a distinct Expand:\n" + approxPlan.take(900))
      assert(approxPlan.contains("approx_count_distinct"), approxPlan.take(600))
    } finally spark.conf.unset("graft.an39.exactNdvRowBound")
  }

  test("an74 medians are scale-gated: above the row bound both passes use the GK sketch") {
    def planOf(): String = {
      val df = SparkEntry.queries("an74_mad_outliers")(spark, sfDir)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    }
    val exactPlan = planOf()
    assert(exactPlan.contains("percentile") && !exactPlan.contains("approx_percentile"),
      "under the bound the medians should be exact percentiles:\n" + exactPlan.take(600))
    spark.conf.set("graft.an74.exactMedianRowBound", "1")
    try {
      val approxPlan = planOf()
      assert(approxPlan.contains("approx_percentile"),
        "scale-gated medians still plan exact percentile:\n" + approxPlan.take(900))
    } finally spark.conf.unset("graft.an74.exactMedianRowBound")
  }

  test("an79 clip bounds are scale-gated: above the row bound the per-group sort window disappears") {
    def planOf(): String = {
      val df = SparkEntry.queries("an79_winsorized")(spark, sfDir)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    }
    val exactPlan = planOf()
    assert(exactPlan.contains("row_number"),
      "under the bound the clip bounds should come from the exact rank window:\n" +
        exactPlan.take(600))
    spark.conf.set("graft.an79.exactRankRowBound", "1")
    try {
      val approxPlan = planOf()
      assert(!approxPlan.contains("row_number") && !approxPlan.contains("Window"),
        "scale-gated winsorization still plans a per-group sort window:\n" + approxPlan.take(900))
      assert(approxPlan.contains("approx_percentile"), approxPlan.take(600))
    } finally spark.conf.unset("graft.an79.exactRankRowBound")
  }

  test("an15/an42/an44 percentiles share the scale gate: above the bound all plans use the GK sketch") {
    def planOf(q: String): String = {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    }
    val qs = Seq("an15_percentiles", "an42_percentile_disc", "an44_robust_stats")
    for (q <- qs) {
      val exactPlan = planOf(q)
      assert(exactPlan.contains("percentile") && !exactPlan.contains("approx_percentile"),
        s"$q under the bound should plan exact percentiles:\n" + exactPlan.take(400))
    }
    spark.conf.set("graft.exactPercentileRowBound", "1")
    try {
      for (q <- qs) {
        val approxPlan = planOf(q)
        assert(approxPlan.contains("approx_percentile"),
          s"$q above the bound still plans exact percentile:\n" + approxPlan.take(600))
      }
    } finally spark.conf.unset("graft.exactPercentileRowBound")
  }

  test("V2 scan reports manifest row counts into planner statistics") {
    import graft.icelite.FsCatalog
    val cat = new FsCatalog(spark, scratch("v2stats"))
    val t   = cat.createOrReplaceTable("ns", "nation_stats", Tables.nation(spark, sfDir))
    val dim = spark.read.format("icelite")
      .option("location", t.location.toString).load()
    val st = dim.queryExecution.optimizedPlan.stats
    // numRows flows from the manifests' record counts; size is rows×width,
    // which is what lets Spark auto-broadcast a small IceLite dim table
    assert(st.rowCount.exists(_.toLong == 25L), s"stats: $st")
    assert(st.sizeInBytes.toLong < (1L << 20), s"stats: $st")
    // and the join indeed broadcasts the V2 side without a hint
    val j = Tables.customer(spark, sfDir)
      .join(dim, col("c_nationkey") === col("n_nationkey"))
    val p = j.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("V2 limit pushdown: readers stop early, result still exact") {
    import graft.icelite.FsCatalog
    val cat = new FsCatalog(spark, scratch("v2limit"))
    val t   = cat.createOrReplaceTable("ns", "orders_lim", Tables.orders(spark, sfDir))
    val dim = spark.read.format("icelite")
      .option("location", t.location.toString).load()
    assert(dim.limit(3).collect().length == 3)
  }

  test("an31 fuses five navigation functions into ONE Window operator") {
    val p = plan("an31_window_nav")
    val windows = "\\bWindow \\[".r.findAllIn(p).length
    assert(windows == 1, s"expected 1 Window operator, found $windows")
  }

  test("an45 LATERAL decorrelates to WindowGroupLimit, not a per-row rescan") {
    val p = plan("an45_lateral")
    assert(p.contains("WindowGroupLimit"), p.take(600))
    assert(!p.contains("CartesianProduct"), "lateral planned as cartesian")
  }

  test("an37 melt stays zero-shuffle after the grouped aggregate") {
    // one exchange for the groupBy + one for the presentation sort; the
    // unpivot projection itself must not add any
    val p = plan("an37_unpivot")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"unpivot added shuffles: $exchanges exchanges\n" + p.take(600))
  }

  test("an68 skyline plans as windows over one sort — NO join operator") {
    // the textbook skyline is an O(n^2) NOT-EXISTS self-join (what the
    // oracle states); the implementation must stay the two-window O(n log n)
    val p = plan("an68_pareto")
    assert(!p.contains("Join"), "pareto frontier fell back to a self-join:\n" + p.take(600))
    assert(p.contains("Window"), p.take(400))
  }

  test("an70 recursive CTE executes as a native UnionLoop fixpoint") {
    val p = plan("an70_reachability")
    assert(p.contains("UnionLoop"), "recursion not planned as UnionLoopExec:\n" + p.take(600))
  }

  test("no non-lifecycle query plans a CartesianProduct, and all of them plan") {
    // quadratic baselines (sm02/dd04/dd05) are broadcast loops, not
    // cartesian plans; everything else must be keyed. Checks the LOGIC of
    // every registry entry cheaply: plan only, nothing executes. Scope is
    // the non-streaming, non-lifecycle registry (st*/ic* drive scratch
    // warehouses and checkpoints, which don't exist at plan time here) —
    // and within that scope a query that THROWS during planning is a
    // failure, not a silent pass (round-5 ADVICE: a swallowed planning
    // exception used to slip through this audit).
    val cartesian = scala.collection.mutable.ListBuffer.empty[String]
    val broken    = scala.collection.mutable.ListBuffer.empty[(String, String)]
    SparkEntry.registry
      .filter(q => !q.name.startsWith("st") && !q.name.startsWith("ic"))
      .foreach { q =>
        try {
          val p = q.run(spark, sfDir).queryExecution.executedPlan.toString
          if (p.contains("CartesianProduct")) cartesian += q.name
        } catch { case e: Throwable => broken += (q.name -> e.toString.take(200)) }
      }
    assert(broken.isEmpty, s"queries failed to plan: $broken")
    assert(cartesian.isEmpty, s"cartesian plans: $cartesian")
  }
}
