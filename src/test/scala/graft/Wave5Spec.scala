package graft

import org.apache.spark.sql.functions._

/** Fifth-wave operator semantics, beyond the oracle hash-compare: the
  * regression/MAD statistics re-derived in exact BigInt/sorted-median form
  * on collected data, the gap-fill grid/fill laws, edit-distance verify
  * against an independent DP, and the incremental-dedup batch contract. */
class Wave5Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("an72 slope/intercept equal the exact BigInt least-squares on collected data") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("bigint"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("bigint"))
      .collect()
      .map(r => (r.getString(0), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    def halfUp(num: BigInt, den: BigInt, scale: Long): BigInt =
      if (num >= 0) (2 * num * scale + den) / (2 * den)
      else -((2 * -num * scale + den) / (2 * den))
    val expect = rows.groupBy(_._1).map { case (flag, g) =>
      val n   = BigInt(g.length)
      val sx  = g.map(_._2).sum
      val sy  = g.map(_._3).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val slopeBp = halfUp(num, den, 10000L)
      // intercept from the REDUCED slope — (sy·1e4 − slope_bp·sx)/n — the
      // overflow-capped formula the query ships (round-7 ADVICE: the
      // naive closed form grows ~n⁵ toward the 38-digit ceiling)
      flag -> (slopeBp.toLong,
        halfUp(sy * 10000L - slopeBp * sx, n, 1L).toLong)
    }
    val got = q("an72_regression").collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (flag, v) => assert(got(flag) == v, s"flag $flag") }
  }

  test("an73 grid is dense (users x span days) and fill is last-observation-carried-forward") {
    val out = q("an73_gap_fill").collect()
    val users = out.map(_.getLong(0)).distinct
    val days  = out.map(_.getDate(1)).distinct
    assert(out.length == users.length * days.length, "dense user x day grid")
    // per user: ff_cents on an empty day equals the previous day's ff_cents
    out.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val ord = g.sortBy(_.getDate(1).toString)
      ord.sliding(2).foreach {
        case Array(prev, cur) if cur.getLong(2) == 0L =>
          assert(cur.getLong(3) == prev.getLong(3), "LOCF on gap day")
        case _ => ()
      }
    }
  }

  test("an74 median/MAD/outlier counts match a sorted-array rederivation") {
    val by = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("bigint"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def med(xs: Array[Long]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2).toDouble else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    }
    val got = q("an74_mad_outliers").collect()
    got.foreach { r =>
      val xs = by(r.getString(0))
      val m  = med(xs)
      val devs = xs.map(x => math.abs(x - m)).sorted
      val ma = if (devs.length % 2 == 1) devs(devs.length / 2)
               else (devs(devs.length / 2 - 1) + devs(devs.length / 2)) / 2.0
      val out = devs.count(_ > ma * 1.5).toLong
      assert(r.getLong(1) == xs.length && r.getDouble(2) == m &&
        r.getDouble(3) == ma && r.getLong(4) == out, s"flag ${r.getString(0)}")
      assert(out > 0, "k=1.5 fence must be discriminative on this data")
    }
  }

  test("dd20 levenshtein matches an independent DP and respects the 20% gate") {
    val out = q("dd20_edit_distance").collect()
    assert(out.nonEmpty, "banding must surface fuzzy pairs")
    val text = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def dp(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val t = prev(j)
          prev(j) = math.min(math.min(prev(j), prev(j - 1)) + 1,
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = t
        }
      }
      prev(b.length)
    }
    out.foreach { r =>
      val (a, b, lev, bp) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(a < b)
      val want = dp(text(a), text(b)).toLong
      assert(lev == want, s"pair ($a,$b)")
      val maxlen = math.max(text(a).length, text(b).length).toLong
      assert(lev * 5 <= maxlen && bp >= 8000L && bp <= 10000L)
    }
  }

  test("dd21 reports every batch doc exactly once with a consistent status") {
    val out = q("dd21_incremental_dedup").collect()
    val batch = Tables.documents(spark, sfDir)
      .filter(col("source") === "src19").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(out.map(_.getLong(0)).sorted.sameElements(batch), "batch coverage")
    out.foreach { r =>
      val dup = r.getString(3) == "dup"
      assert(dup == (r.getLong(1) > 0), "status iff verified hits")
      assert(dup == (r.getLong(2) >= 0), "rep_doc sentinel iff unique")
    }
    assert(out.exists(_.getString(3) == "dup") && out.exists(_.getString(3) == "unique"),
      "testdata must exercise both branches")
  }

  test("an75 z-order buckets bound BOTH key spans; linear buckets leave one unbounded") {
    val out = q("an75_zorder_skipping").collect()
    val (zo, lin) = out.partition(_.getString(0) == "zorder")
    assert(zo.nonEmpty && lin.nonEmpty)
    zo.foreach { r =>
      assert(r.getLong(4) - r.getLong(3) + 1 <= 256, "z-order x span tile-bounded")
      assert(r.getLong(6) - r.getLong(5) + 1 <= 128, "z-order y span tile-bounded")
    }
    assert(lin.exists(r => r.getLong(6) - r.getLong(5) + 1 > 512),
      "linear layout must leave the second key unbounded somewhere")
  }

  test("sm22 keeps at most the quota per cell and only when the cell is that full") {
    val out = q("sm22_cell_sample").collect()
    val byCell = out.groupBy(_.getLong(0))
    byCell.foreach { case (_, g) =>
      val members = g.head.getLong(3)
      assert(g.length == math.min(8L, members), "kept = min(quota, population)")
      assert(g.map(_.getLong(1)).sorted.sameElements(1L to g.length.toLong), "gapless ranks")
    }
    assert(byCell.values.exists(_.head.getLong(3) > 8L), "data must exercise the quota cut")
  }

  test("tx28 novelty is bounded and the first shingled doc is fully novel") {
    val out = q("tx28_ngram_novelty").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "novel <= total")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000)
    }
    val first = out.minBy(_.getLong(0))
    assert(first.getLong(3) == 10000L, "lowest doc_id owns all its shingles' first occurrences")
  }

  test("ic47 z-order layout must open fewer files than linear for the 2nd-dim probe") {
    // the query itself `require`s z < linear at plan time; surviving the
    // run IS the gate — assert the result also reconciles with raw data
    val out = q("ic47_zorder_write").collect()
    val want = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % 1024 <= 127).count()
    assert(out.map(_.getLong(1)).sum == want, "pruned scan lost or duplicated rows")
  }

  test("sm23 truncated-prefix recall is a valid recall@5 and near zero on random vectors") {
    val out = q("sm23_mrl_recall").collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 5)
      assert(r.getDouble(2) == r.getLong(1) / 5.0)
    }
    val mean = out.map(_.getLong(1)).sum / 50.0
    assert(mean < 0.5, "i.i.d. random embeddings cannot have high prefix recall")
  }

  test("ic48 metadata row counts grow monotonically and end at the source size") {
    val out = q("ic48_stats_count").collect().sortBy(_.getLong(0))
    assert(out.length == 3)
    // third commit is empty at sf0.001 (orderkeys stop at 1499) — growth
    // is non-decreasing, and the empty-commit snapshot still counts right
    assert(out.map(_.getLong(1)).sliding(2).forall { case Array(a, b) => a <= b })
    assert(out.last.getLong(1) == Tables.orders(spark, sfDir).count())
  }

  test("an76 count-min estimates are one-sided: never below the exact count") {
    val out = q("an76_count_min").collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), s"CMS underestimated '${r.getString(1)}'")
      assert(r.getLong(4) == r.getLong(3) - r.getLong(2))
    }
  }

  test("pp20 ablation cells partition the corpus exactly") {
    val out = q("pp20_filter_ablation").collect()
    assert(out.length <= 16)
    assert(out.map(_.getLong(4)).sum == Tables.documents(spark, sfDir).count())
  }

  test("sm24 separation is ~1.0 on random embeddings and accounts every vector") {
    val out = q("sm24_label_separation").collect()
    assert(out.map(_.getLong(1)).sum == Tables.embeddings(spark, sfDir).count())
    out.foreach { r =>
      val bp = r.getLong(4)
      assert(bp > 9000 && bp < 11000,
        s"random labels cannot be separated (label ${r.getInt(0)} got $bp bp)")
    }
  }

  test("tx27 scores are bounded basis points and rank the target language up") {
    val lang = Tables.documents(spark, sfDir).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = q("tx27_importance_weights").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    out.foreach { case (_, bp) => assert(bp >= 0L && bp <= 10000L) }
    val (en, rest) = out.partition { case (id, _) => lang(id) == "en" }
    val enMean   = en.map(_._2).sum.toDouble / en.length
    val restMean = rest.map(_._2).sum.toDouble / rest.length
    assert(enMean > restMean, s"en mean $enMean must beat non-en mean $restMean")
  }
}
