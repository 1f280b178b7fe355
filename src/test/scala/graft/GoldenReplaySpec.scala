package graft

import graft.icelite.{Engine, FsCatalog, IngestConfig, IngestJob}
import org.apache.spark.sql.functions._

/** Reference-golden replay (SURVEY.md §5 item 3): the reference commits
  * concrete outputs for its users table — COUNT(*) = 49,990
  * (`query_iceberg.ipynb` cell 14), the top-10 state histogram (cell 17),
  * the 10 preference counts (cell 18), a 489-row 7-column WA CSV export
  * (`output/wa_users.csv`) and an 8,682-row 18-column sports-fans parquet
  * export (`output/sports_fans.parquet`). The original CSV is unreachable
  * offline, so this spec REGENERATES a users-shaped fixture whose
  * marginals equal those goldens exactly (deterministic modular
  * bijections, no RNG), ingests it through the real CSV path
  * (`IngestJob`), and replays each reference query shape through `Engine`
  * asserting the reference's own numbers.
  *
  * Construction notes (FIXTURES.md §A): 49,990 = 2·5·4999, so any odd
  * multiplier not divisible by 5 or 4999 is a unit mod N — `(userid*p) mod
  * N < K` is then true for EXACTLY K of the N contiguous userids, which
  * pins every preference count; states are dealt from an exact-count block
  * list through a second bijection so the histogram is pinned without
  * correlating state with the userid ranges the projection tests read.
  */
class GoldenReplaySpec extends SparkSpec {

  private val N = 49990

  // cell 17: top-10 states (all Canadian codes), exact counts
  private val top10 = Seq(
    "NT" -> 1998L, "NB" -> 1960L, "BC" -> 1958L, "QC" -> 1929L, "NL" -> 1919L,
    "YT" -> 1919L, "MB" -> 1916L, "PE" -> 1906L, "NS" -> 1896L, "AB" -> 1894L)

  // output/wa_users.csv: 489 rows
  private val waCount = 489

  // cell 18: preference true-counts; (csv column, display name, count, multiplier)
  private val prefs = Seq(
    ("likesports", "Sports", 8682, 3L), ("liketheatre", "Theatre", 12534, 7L),
    ("likeconcerts", "Concerts", 12512, 9L), ("likejazz", "Jazz", 12441, 11L),
    ("likeclassical", "Classical", 12523, 13L), ("likeopera", "Opera", 12429, 17L),
    ("likerock", "Rock", 12380, 19L), ("likevegas", "Vegas", 12414, 21L),
    ("likebroadway", "Broadway", 12389, 23L), ("likemusicals", "Musicals", 12607, 27L))

  /** Everything below the top-10 + WA: US codes + DC + ON/SK, each well
    * under the #10 count (1894) so the top-10 ordering is unambiguous. */
  private val filler = Seq(
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI", "ID",
    "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI", "MN", "MS",
    "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC", "ND", "OH", "OK",
    "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WV", "WI",
    "WY", "DC", "ON", "SK")

  /** Exact-count state deck: top-10 blocks + WA block + near-even filler. */
  private def stateDeck: Array[String] = {
    val pinned    = top10.map { case (c, n) => (c, n.toInt) } :+ ("WA" -> waCount)
    val remaining = N - pinned.map(_._2).sum
    val base      = remaining / filler.size
    val extra     = remaining % filler.size // first `extra` fillers get +1
    val blocks = pinned ++ filler.zipWithIndex.map { case (c, i) =>
      c -> (base + (if (i < extra) 1 else 0))
    }
    val deck = new Array[String](N)
    var pos  = 0
    blocks.foreach { case (code, cnt) =>
      var i = 0
      while (i < cnt) { deck(pos) = code; pos += 1; i += 1 }
    }
    assert(pos == N, s"state deck covers $pos of $N rows")
    deck
  }

  /** Generate the CSV, ingest via the real pipeline, return the engine. */
  private lazy val env: (Engine, String) = {
    val csvDir = java.nio.file.Paths.get(scratch("golden_csv"))
    java.nio.file.Files.createDirectories(csvDir)
    val f    = csvDir.resolve("users.csv")
    val deck = stateDeck
    val w    = java.nio.file.Files.newBufferedWriter(f)
    try {
      w.write("userid,username,firstname,lastname,city,state,email,phone," +
        prefs.map(_._1).mkString(","))
      w.newLine()
      var u = 1
      while (u <= N) {
        val state = deck(((u.toLong * 7 + 3) % N).toInt)
        val row = new StringBuilder()
          .append(u).append(',')
          .append(f"U$u%07d").append(',')          // 8-char alnum username
          .append("Fn").append(u % 977).append(',')
          .append("Ln").append(u % 883).append(',')
          .append("City").append(u % 641).append(',')
          .append(state).append(',')
          .append("u").append(u).append("@example.com").append(',')
          // formatted like the reference's real data — the golden artifact
          // pins phone as STRING, so the fixture must not infer numeric
          .append("555-").append(f"${u % 10000000}%07d")
        prefs.foreach { case (_, _, k, p) =>
          row.append(',').append((u.toLong * p % N) < k)
        }
        w.write(row.toString); w.newLine()
        u += 1
      }
    } finally w.close()
    val cat = new FsCatalog(spark, scratch("golden_wh"))
    val job = new IngestJob(spark, cat, scratch("golden_tmp"))
    val res = job.run(IngestConfig(
      source = f.toString, namespace = "ticketdb", explicitTableName = Some("users")))
    assert(res.map(_.table) == Seq("users") && res.head.rows == N)
    (new Engine(spark, cat), "ticketdb.users")
  }

  test("cell 14 replay: COUNT(*) = 49,990 over a contiguous 1-based key") {
    val (eng, t) = env
    val r = eng.sql(t,
      "SELECT COUNT(*) AS n, CAST(MIN(userid) AS BIGINT) AS lo, CAST(MAX(userid) AS BIGINT) AS hi FROM {table}")
      .collect().head
    assert(r.getLong(0) == N && r.getLong(1) == 1L && r.getLong(2) == N.toLong)
  }

  test("cell 15 replay: DESCRIBE shows the 18-column users shape, boolean preferences") {
    val (eng, t) = env
    val desc = eng.describe(t).collect().map(r => (r.getString(0), r.getString(1)))
    assert(desc.length == 18)
    assert(desc.map(_._1).take(8).toSeq ==
      Seq("userid", "username", "firstname", "lastname", "city", "state", "email", "phone"))
    val types = desc.toMap
    assert(types("username") == "VARCHAR")
    prefs.foreach { case (c, _, _, _) => assert(types(c) == "BOOLEAN", c) }
  }

  test("cell 17 replay: top-10 state histogram matches the committed counts") {
    val (eng, t) = env
    val got = eng.sql(t,
      "SELECT state, COUNT(*) AS n FROM {table} GROUP BY state ORDER BY n DESC, state LIMIT 10")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == top10, s"histogram drifted: $got")
  }

  test("cell 18 replay: all ten preference counts match the committed counts") {
    val (eng, t) = env
    val unionSql = prefs.map { case (c, disp, _, _) =>
      s"SELECT '$disp' AS preference, COUNT(*) AS n FROM {table} WHERE $c"
    }.mkString(" UNION ALL ")
    val got = eng.sql(t, unionSql).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    prefs.foreach { case (_, disp, k, _) =>
      assert(got(disp) == k.toLong, s"$disp: got ${got(disp)}, golden $k")
    }
  }

  test("wa_users.csv replay: WA filter + 7-column projection exports 489 rows") {
    val (eng, t) = env
    val out = scratch("golden_wa")
    eng.exportCsv(eng.sql(t,
      "SELECT userid, username, firstname, lastname, city, state, email " +
        "FROM {table} WHERE state = 'WA'"), out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == waCount.toLong)
    assert(back.columns.length == 7)
    assert(back.select("state").distinct().collect().map(_.getString(0)).toSeq == Seq("WA"))
  }

  test("sports_fans.parquet replay: boolean filter exports 8,682 rows x 18 columns") {
    val (eng, t) = env
    val out = scratch("golden_sports")
    eng.exportParquet(eng.table(t).filter(col("likesports")), out)
    val back = spark.read.parquet(out)
    assert(back.count() == 8682L)
    assert(back.columns.length == 18)
  }

  test("sports_fans.parquet golden: our export's PHYSICAL schema matches the committed artifact") {
    import org.apache.spark.sql.types._
    // read the reference's own committed export (read-only), not our
    // replayed counts: 18 columns, int64 key, 7 strings, 10 booleans
    val golden = spark.read.parquet("/root/reference/output/sports_fans.parquet")
    assert(golden.count() == 8682L)
    val (eng, t) = env
    val out = scratch("golden_sports_schema")
    eng.exportParquet(eng.table(t).filter(col("likesports")), out)
    val ours = spark.read.parquet(out).schema
    assert(ours.fieldNames.toSeq == golden.schema.fieldNames.toSeq,
      s"column names/order diverge from the golden artifact: " +
        s"${ours.fieldNames.mkString(",")} vs ${golden.schema.fieldNames.mkString(",")}")
    // types after §1.2 normalization, integer width folded: the reference
    // ingests CSV through pyarrow (ints default to int64) while Spark's
    // CSV inference picks the narrowest width — both land in the same
    // normalized integral family, everything else must match exactly
    def norm(dt: DataType): DataType = dt match {
      case IntegerType | LongType => LongType
      case other                  => graft.icelite.TypeNormalizer.normalizeType(other)
    }
    ours.fields.zip(golden.schema.fields).foreach { case (a, b) =>
      assert(norm(a.dataType) == norm(b.dataType),
        s"${a.name}: ${a.dataType.simpleString} vs golden ${b.dataType.simpleString}")
    }
  }

  test("join shape replay (Q10): users enriched with their state histogram row") {
    val (eng, t) = env
    val users = eng.table(t)
    val dim   = users.groupBy("state").agg(count(lit(1)).as("state_users"))
    val joined = users.join(broadcast(dim), Seq("state"))
    assert(joined.count() == N.toLong) // FK-style join preserves cardinality
    val wa = joined.filter(col("state") === "WA").select("state_users")
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(wa == Seq(waCount.toLong))
  }
}
