package graft.ops

import graft.{Hashing, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation pipeline — the composite shape a real
  * training-data run executes, expressed as ONE declarative Spark plan so
  * Catalyst sees the whole thing:
  *
  *   exact dedup (canonical copy per text)
  *     -> quality gate (tx02's score >= 0.5)
  *     -> language ID (tx01's marker-list argmax)
  *     -> deterministic split assignment (tx07's content-hash buckets)
  *     -> per (lang, split) corpus stats (docs, tokens, mean quality)
  *
  * Scale shape: one shuffle for the text-key dedup and one for the final
  * grouped stats — everything else (quality score, language argmax, split
  * hash) is per-row map-side expression work between them. At 100 TB this
  * is exactly the plan you want: no operator materializes an intermediate
  * corpus, and the quality gate prunes before any downstream work.
  *
  * Each stage reuses the formula of its standalone operator (tx01/tx02/
  * tx07/dd01), and the oracle replays the same CTE chain, so the composite
  * is oracle-checked end to end, not just stage by stage.
  */
object Pipeline {

  private val qualityMin = 0.5

  private def curation(s: SparkSession, d: String): DataFrame = {
    // stage 1: exact dedup — one canonical doc_id per distinct text
    val canon = Tables.spread(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .groupBy("text")
      .agg(min("doc_id").as("doc_id"))
    // stage 2: quality gate (tx02's score formula, verbatim)
    val scored = canon
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("ws"))
      .select(
        col("doc_id"), col("text"), col("ws"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(filter(col("ws"), w => array_contains(typedLit(Text.stopwords), w)))
          .cast("long").as("stop_cnt"))
      .select(
        col("doc_id"), col("text"), col("ws"), col("n_tokens"),
        Text.qualityScore(col("n_tokens"), col("stop_cnt")).as("quality_score"))
      .filter(col("quality_score") >= qualityMin)
    // stage 3: language ID (tx01's map-side marker argmax — no shuffle)
    val (langCol, _) = Text.langPred(col("ws"))
    // stage 4: deterministic split (tx07's content-hash buckets)
    val bucket = graft.functions.hashfns.rollHash(col("text")) % 100
    scored
      .select(
        col("doc_id"), col("n_tokens"), col("quality_score"),
        langCol.as("lang_pred"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
      // stage 5: corpus stats per (lang, split)
      .groupBy("lang_pred", "split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        round(avg(col("quality_score")), 4).as("avg_quality"))
      .orderBy("lang_pred", "split")
  }

  private val curationOracle: String = {
    val stops = Text.stopwords.map(w => s"'$w'").mkString(", ")
    val langValues = Text.langMarkers
      .map { case (l, ws) => s"('$l', [${ws.map(w => s"'$w'").mkString(", ")}])" }
      .mkString(", ")
    val h = Hashing.duckRollHash("text", Hashing.P, "c0")
    s"""WITH canon AS (SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
      w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM canon),
      q AS (
        SELECT doc_id, text, ws,
               CAST(len(ws) AS BIGINT) AS n_tokens,
               ROUND(LEAST(CAST(len(ws) AS DOUBLE) / 50.0, 1.0) * 0.5
                     + (CAST(len(list_filter(ws, t -> t IN ($stops))) AS DOUBLE)
                        / len(ws)) * 0.5, 4) AS quality_score
        FROM w),
      g AS (SELECT * FROM q WHERE quality_score >= $qualityMin),
      langs(lang, wlist) AS (VALUES $langValues),
      scores AS (
        SELECT g.*, lang,
               len(list_filter(ws, x -> list_contains(wlist, x))) AS score
        FROM g CROSS JOIN langs),
      rl AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        FROM scores),
      assigned AS (
        SELECT doc_id, n_tokens, quality_score, lang AS lang_pred,
               CASE WHEN ($h) % 100 < 80 THEN 'train'
                    WHEN ($h) % 100 < 90 THEN 'val' ELSE 'test' END AS split
        FROM rl WHERE rn = 1)
      SELECT lang_pred, split, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             ROUND(AVG(quality_score), 4) AS avg_quality
      FROM assigned GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  // -------------------------------------------- sequence packing (pp02)

  /** Concat-and-chunk sequence packing — the standard LLM pretraining
    * batching step: documents are concatenated in a deterministic order and
    * cut into fixed token-budget chunks; a document can span chunks. Output
    * is per-chunk occupancy (docs touching the chunk, tokens it holds).
    *
    * Shape: one window prefix-sum per shard + a per-row chunk-range explode
    * + one grouped count. Packing is sharded (here by `lang`) because a
    * global prefix sum would serialize; at 100 TB you shard by
    * (lang, hash-bucket) so every window partition is bounded and the
    * prefix sums run fully parallel — chunk ids then just gain a shard
    * prefix. The explode emits `ceil(n_tokens / B)` rows per doc, i.e.
    * ~corpus_tokens / B total — linear, never quadratic. */
  private val packBudget = 512L

  private def packing(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val byLang = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum_end", sum("n_tokens").over(byLang))
      .withColumn("cum_start", col("cum_end") - col("n_tokens"))
      .withColumn("chunk_id",
        explode(sequence(
          expr(s"cum_start div $packBudget"),
          expr(s"(cum_end - 1) div $packBudget"))))
      .withColumn("tok_in_chunk",
        least(col("cum_end"), (col("chunk_id") + 1) * packBudget) -
          greatest(col("cum_start"), col("chunk_id") * packBudget))
      .groupBy("lang", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok_in_chunk").as("n_tokens"))
      .orderBy("lang", "chunk_id")
  }

  private val packingOracle: String =
    s"""WITH t AS (
        SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT lang, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_end
        FROM t),
      sp AS (SELECT lang, n_tokens, cum_end, cum_end - n_tokens AS cum_start FROM c),
      ex AS (
        SELECT lang, cum_start, cum_end,
               unnest(range(cum_start // $packBudget, (cum_end - 1) // $packBudget + 1)) AS chunk_id
        FROM sp)
      SELECT lang, CAST(chunk_id AS BIGINT) AS chunk_id, COUNT(*) AS n_docs,
             CAST(SUM(LEAST(cum_end, (chunk_id + 1) * $packBudget)
                      - GREATEST(cum_start, chunk_id * $packBudget)) AS BIGINT) AS n_tokens
      FROM ex GROUP BY 1, 2 ORDER BY 1, 2"""

  // ------------------------------------- domain mixing / re-balancing

  /** Deterministic corpus re-balancing toward a uniform language mix (the
    * domain-weighting step of training-data assembly): each language gets
    * keep-probability p = min(1, target/actual), realized as an integer
    * hash threshold so membership is a pure function of content — the same
    * reproducibility rule as tx07's splits (no RNG, no sampling seed
    * drift across reruns/retries).
    *
    * Shape: one tiny grouped count (langs), broadcast back onto the corpus
    * for a map-side filtered count. At 100 TB the stats side is
    * vocabulary-small, the corpus side is one scan — and the same
    * threshold column drives the actual filtered write in a real run. */
  private def mix(s: SparkSession, d: String): DataFrame = {
    val docs  = Tables.documents(s, d).select(col("lang"), col("text"))
    val stats = docs.groupBy("lang").agg(count(lit(1)).as("n_in"))
    val tot   = stats.agg(sum("n_in").as("total"), count(lit(1)).as("n_langs"))
    val withThr = stats.crossJoin(broadcast(tot))
      .withColumn("thr",
        floor(least(lit(1.0),
          col("total").cast("double") / col("n_langs") / col("n_in")) * 10000).cast("long"))
      .select("lang", "n_in", "thr")
    val kept = docs
      .join(broadcast(withThr.select("lang", "thr")), "lang")
      .filter(graft.functions.hashfns.rollHash(col("text")) % 10000 < col("thr"))
      .groupBy("lang").agg(count(lit(1)).as("n_out"))
    withThr
      .join(broadcast(kept), Seq("lang"), "left") // langs-sized: always broadcastable
      .na.fill(0L, Seq("n_out"))
      .orderBy("lang")
  }

  private val mixOracle: String = {
    val h = Hashing.duckRollHash("text", Hashing.P, "c0")
    s"""WITH st AS (SELECT lang, COUNT(*) AS n_in FROM documents GROUP BY lang),
      t AS (SELECT CAST(SUM(n_in) AS BIGINT) AS total, COUNT(*) AS n_langs FROM st),
      p AS (
        SELECT lang, n_in,
               CAST(FLOOR(LEAST(1.0, (CAST(total AS DOUBLE) / n_langs) / n_in) * 10000) AS BIGINT) AS thr
        FROM st CROSS JOIN t),
      k AS (
        SELECT d.lang, COUNT(*) AS n_out
        FROM documents d JOIN p ON d.lang = p.lang
        WHERE ($h) % 10000 < thr GROUP BY d.lang)
      SELECT p.lang, n_in, thr, COALESCE(n_out, 0) AS n_out
      FROM p LEFT JOIN k ON p.lang = k.lang ORDER BY p.lang"""
  }

  // ------------------------------------------ data-mix audit report

  /** The mix REPORT next to pp03's mix enforcement: the (source × lang)
    * token-count matrix with each cell's share of the total token budget —
    * the first table anyone asks for before (and after) a curation run.
    * One scan + one shuffle on the tiny (source, lang) key; the total is a
    * window over the grouped frame (O(groups) rows), never a second scan.
    * Shares divide two exact longs, so both engines compute the identical
    * double before the final round. */
  private def mixAudit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grouped = Tables.documents(s, d)
      .select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
    grouped
      .withColumn("pct_tokens",
        round(col("n_tokens") / sum("n_tokens").over(Window.partitionBy()), 4))
      .orderBy("source", "lang")
  }

  private val mixAuditOracle: String =
    """WITH g AS (
        SELECT source, lang, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source, lang)
      SELECT source, lang, n_docs, n_tokens,
             ROUND(n_tokens / CAST(SUM(n_tokens) OVER () AS DOUBLE), 4) AS pct_tokens
      FROM g ORDER BY source, lang"""

  // ------------------------------------- curation provenance ledger

  /** Per-document disposition ledger — the audit artifact a curation run
    * must ship with the dataset: WHY each input document survived or was
    * dropped, with one deterministic precedence chain (benchmark holdout >
    * exact duplicate > benchmark contamination ≥3 shingles > below-median
    * quality > kept). Composes dd01's survivor rule, pp05's contamination
    * probe, and pp09's per-language median cut in ONE plan: the exact-dup
    * shuffle keys on the content (hash at 100 TB), the contamination probe
    * broadcasts the benchmark shingle set, the quality cut reuses the
    * shared scoring formula — three shuffles total, each on a natural key. */
  private def provenance(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text"))
    val isBench = pmod(col("doc_id"), lit(50L)) === 3
    val canon = docs.groupBy("text").agg(min("doc_id").as("canon_id"))
    val sh = Tables.spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        explode(graft.functions.hashfns.wordShingles(col("text"), 3)).as("sg"))
    val bench = sh.filter(isBench).select("sg").distinct()
    val contaminated = sh.filter(!isBench)
      .join(broadcast(bench), Seq("sg"))
      .groupBy("doc_id").agg(countDistinct("sg").as("nhit"))
      .filter(col("nhit") >= 3)
      .select(col("doc_id"), lit(true).as("contam"))
    val stops = typedLit(Text.stopwords)
    val scored = docs
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("lang"),
        Text.qualityScore(
          size(col("ws")).cast("long"),
          size(filter(col("ws"), w => array_contains(stops, w))).cast("long")).as("q"))
    val ranked = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("q"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
    val med = ranked
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("lang"), col("q").as("med"))
    docs
      .join(canon, Seq("text"))
      .join(contaminated, Seq("doc_id"), "left")
      .join(scored.select("doc_id", "q"), Seq("doc_id"))
      .join(broadcast(med), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        when(isBench, "benchmark")
          .when(col("doc_id") =!= col("canon_id"), "dropped_exact")
          .when(col("contam"), "dropped_contaminated")
          .when(col("q") < col("med"), "dropped_quality")
          .otherwise("kept").as("disposition"))
      .orderBy("doc_id")
  }

  private val provenanceOracle: String = {
    val stopsIn = Text.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws, text FROM documents),
      canon AS (SELECT text, MIN(doc_id) AS canon_id FROM documents GROUP BY text),
      sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS shs
        FROM w WHERE len(ws) >= 3),
      e AS (SELECT doc_id, unnest(shs) AS sg FROM sh),
      bench AS (SELECT DISTINCT sg FROM e WHERE doc_id % 50 = 3),
      contam AS (
        SELECT doc_id FROM e JOIN bench USING (sg)
        WHERE doc_id % 50 <> 3
        GROUP BY doc_id HAVING COUNT(DISTINCT sg) >= 3),
      scored AS (
        SELECT doc_id, lang,
               ROUND(LEAST(CAST(len(ws) AS DOUBLE) / 50.0, 1.0) * 0.5
                     + (CAST(len(list_filter(ws, t -> t IN ($stopsIn))) AS DOUBLE) / len(ws)) * 0.5,
                 4) AS q
        FROM w),
      ranked AS (
        SELECT doc_id, lang, q,
               row_number() OVER (PARTITION BY lang ORDER BY q, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM scored),
      med AS (SELECT lang, q AS med FROM ranked WHERE rn = (n + 1) // 2)
      SELECT d.doc_id, d.lang,
             CASE
               WHEN d.doc_id % 50 = 3 THEN 'benchmark'
               WHEN d.doc_id <> c.canon_id THEN 'dropped_exact'
               WHEN ct.doc_id IS NOT NULL THEN 'dropped_contaminated'
               WHEN s.q < m.med THEN 'dropped_quality'
               ELSE 'kept'
             END AS disposition
      FROM documents d
      JOIN canon c ON d.text = c.text
      LEFT JOIN contam ct ON d.doc_id = ct.doc_id
      JOIN scored s ON d.doc_id = s.doc_id
      JOIN med m ON d.lang = m.lang
      ORDER BY d.doc_id"""
  }

  // --------------------------------- stratified exact-quota subsampling

  /** Exact quotas per stratum: the k lowest content-hashes per language —
    * a deterministic "random" sample with exactly k docs per group (pp03
    * hits proportions only in expectation; evals and holdout sets need
    * exact counts). One shuffle on the stratum key + a per-group top-k;
    * at 100 TB Spark fuses the rank+filter into a windowed top-k that
    * never materializes full partitions sorted. */
  private val quotaK = 50

  private def stratified(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy("lang")
      .orderBy(col("h"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        graft.functions.hashfns.rollHash(col("text")).as("h"))
      .withColumn("rk", row_number().over(byLang).cast("long"))
      .filter(col("rk") <= quotaK)
      .select("lang", "rk", "doc_id")
      .orderBy("lang", "rk")
  }

  private val stratifiedOracle: String = {
    val h = Hashing.duckRollHash("text", Hashing.P, "c0")
    s"""SELECT lang,
         row_number() OVER (PARTITION BY lang ORDER BY ($h), doc_id) AS rk,
         doc_id
       FROM documents
       QUALIFY rk <= $quotaK
       ORDER BY lang, rk"""
  }

  /** Benchmark-contamination detection — the decontamination pass every
    * LLM training run owes its eval suite (n-gram overlap against held-out
    * benchmarks, per GPT-3/PaLM methodology, here word-3-grams to fit the
    * testdata's short docs). A deterministic 2% slice of the corpus
    * (doc_id % 50 == 3) plays the benchmark set.
    *
    * Scale shape: the benchmark side is eval-suite-sized (thousands of
    * docs, not corpus-sized) → its distinct shingles BROADCAST; the train
    * corpus streams through one map-side shingle explode + broadcast hash
    * join, then one shuffle on doc_id for the per-doc hit counts. No
    * corpus-sized join key, no skew surface — at 100 TB this is a single
    * pass over the text. */
  private def contamination(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.spread(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        explode(graft.functions.hashfns.wordShingles(col("text"), 3)).as("sg"))
    val isBench = pmod(col("doc_id"), lit(50L)) === 3
    val bench = sh.filter(isBench)
      .select(col("sg"), col("doc_id").as("bench_id")).distinct()
    sh.filter(!isBench)
      .join(broadcast(bench), Seq("sg"))
      .groupBy("doc_id")
      .agg(
        countDistinct("sg").as("n_hit_shingles"),
        countDistinct("bench_id").as("n_bench_docs"))
      .orderBy("doc_id")
  }

  private val contaminationOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS shs
        FROM w WHERE len(ws) >= 3),
      e AS (SELECT doc_id, unnest(shs) AS sg FROM sh),
      bench AS (SELECT DISTINCT sg, doc_id AS bench_id FROM e WHERE doc_id % 50 = 3),
      train AS (SELECT doc_id, sg FROM e WHERE doc_id % 50 <> 3)
      SELECT doc_id,
             CAST(COUNT(DISTINCT sg) AS BIGINT) AS n_hit_shingles,
             CAST(COUNT(DISTINCT bench_id) AS BIGINT) AS n_bench_docs
      FROM train JOIN bench USING (sg)
      GROUP BY doc_id ORDER BY doc_id"""

  // ------------------------------------- deterministic epoch shuffle

  /** Global training-epoch shuffle + shard assignment, with zero RNG: each
    * document's shard and within-shard position are pure functions of an
    * epoch salt and the content (salted rolling hash). Changing the salt
    * re-shuffles the corpus for the next epoch; re-running the same epoch
    * reproduces byte-identical shards — the reproducibility property a
    * training pipeline needs for resumable/auditable data orders.
    *
    * Scale shape: the hash is map-side; the only shuffle is the partition
    * by shard, and the per-shard `row_number` sort IS the physical write
    * order of the shard file (`repartition(shard).sortWithinPartitions`) —
    * so the plan you verify here is the plan that writes 100 TB of epochs,
    * with shard count chosen so each sorted partition fits an executor. */
  private val epochSalt = "e1|"
  private val nShards   = 8L

  private def epochShuffle(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byShard = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.hashfns.rollHash(concat(lit(epochSalt), col("text"))).as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards)))
      .withColumn("pos", row_number().over(byShard).cast("long"))
      .select("shard", "pos", "doc_id")
      .orderBy("shard", "pos")
  }

  private val epochShuffleOracle: String = {
    val h = Hashing.duckRollHash(s"'$epochSalt' || text", Hashing.P, "c0")
    s"""WITH t AS (SELECT doc_id, ($h) AS h FROM documents)
      SELECT h % $nShards AS shard,
             CAST(row_number() OVER (PARTITION BY h % $nShards ORDER BY h, doc_id) AS BIGINT) AS pos,
             doc_id
      FROM t ORDER BY shard, pos"""
  }

  // ------------------------------ near-dup canonicalization pipeline

  /** The production near-dedup pass end to end: MinHash+LSH pair mining
    * (dd03's band-bucket candidates, exact-Jaccard verified) → connected
    * components over the >= 0.5 pairs (dd06's min-label fixpoint) → drop
    * every non-canonical cluster member → per-language stats of the
    * surviving corpus. This is what pp01's exact-dedup stage becomes when
    * the corpus has near-duplicates, not just byte-identical copies — and
    * the whole chain is oracle-replicated (the recursive-CTE components
    * give the same canonical = min(doc_id) per cluster).
    *
    * Scale shape: pair mining is the dd03 plan (map-side signatures +
    * bucket joins), CC is O(diameter) keyed shuffles, the removal is one
    * broadcast anti-join (removed set ~ duplicate count, far smaller than
    * the corpus), stats one grouped agg. No stage is quadratic. */
  private def neardupCuration(s: SparkSession, d: String): DataFrame = {
    val removed = Dedup.ccLabels(s, d)
      .filter(col("doc_id") =!= col("cluster")) // cluster label = min id = canonical
      .select("doc_id")
    Tables.documents(s, d)
      .join(broadcast(removed), Seq("doc_id"), "left_anti")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("lang")
  }

  private val neardupCurationOracle =
    s"""WITH RECURSIVE ${Dedup.minhashPairsCte},
      ed AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= 0.5),
      ee AS (SELECT doc_a AS s, doc_b AS t FROM ed
             UNION ALL SELECT doc_b, doc_a FROM ed),
      reach AS (
        SELECT s AS id, t AS r FROM ee
        UNION
        SELECT reach.id, ee.t FROM reach JOIN ee ON ee.s = reach.r),
      comp AS (SELECT id AS doc_id, LEAST(id, MIN(r)) AS cluster FROM reach GROUP BY id),
      removed AS (SELECT doc_id FROM comp WHERE doc_id <> cluster),
      kept AS (
        SELECT d.lang, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        FROM documents d LEFT JOIN removed r ON d.doc_id = r.doc_id
        WHERE r.doc_id IS NULL)
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      FROM kept GROUP BY lang ORDER BY lang"""

  // ------------------------------ temperature-scaled mixture sampling

  /** Temperature-scaled language mixing at τ = 0.5 (the standard
    * multilingual-LLM recipe: sample language i with probability
    * ∝ p_i^τ, which upsamples rare languages relative to the natural
    * distribution). Unlike pp03 (which equalizes the mix and reports
    * counts), this emits the actual sampled rows — the frame a training
    * job would read.
    *
    * All threshold arithmetic is exact integers: w_i = floor(sqrt(n_i))
    * (correctly-rounded IEEE sqrt on n < 2^52, identical in both
    * engines), a token budget of total/2, and a per-language keep
    * threshold thr_i = min(10000, 10000·target·w_i / (Σw·n_i)) in
    * 64-bit integer division. A doc survives iff
    * rollHash(text) % 10000 < thr_lang — reproducible row-for-row
    * across engines, re-runs, and cluster sizes.
    *
    * Scale shape: one tiny grouped count (languages ~ 10s of rows), the
    * threshold table broadcast, then a map-only filter over the corpus —
    * at 100 TB the sample is a single pass with no wide shuffle; the
    * presentation sort is the only order-by. */
  private def temperatureMix(s: SparkSession, d: String): DataFrame = {
    val docs  = Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text"))
    val stats = docs.groupBy("lang").agg(count(lit(1)).as("n_in"))
      .withColumn("w", floor(sqrt(col("n_in").cast("double"))).cast("long"))
    val tot = stats.agg(
      sum("n_in").cast("long").as("total"),
      sum("w").cast("long").as("sumw"))
    val thr = stats.crossJoin(broadcast(tot))
      .withColumn("target", expr("total div 2")) // integer division on longs
      .withColumn("thr",
        expr("least(CAST(10000 AS BIGINT), (10000 * target * w) div (sumw * n_in))"))
      .select("lang", "thr")
    docs
      .join(broadcast(thr), "lang")
      .filter(graft.functions.hashfns.rollHash(col("text")) % 10000 < col("thr"))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  private val temperatureMixOracle: String = {
    val h = Hashing.duckRollHash("d.text", Hashing.P, "c0")
    s"""WITH st AS (
        SELECT lang, COUNT(*) AS n_in,
               CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
        FROM documents GROUP BY lang),
      t AS (SELECT CAST(SUM(n_in) AS BIGINT) AS total, CAST(SUM(w) AS BIGINT) AS sumw FROM st),
      p AS (
        SELECT lang,
               LEAST(10000, (10000 * (total // 2) * w) // (sumw * n_in)) AS thr
        FROM st CROSS JOIN t)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN p ON d.lang = p.lang
      WHERE ($h) % 10000 < p.thr
      ORDER BY d.doc_id"""
  }

  // ------------------------------ per-language quality-median cut

  /** Quality filtering the way curation pipelines actually apply it:
    * keep each language's docs at or above that language's own median
    * quality score (an absolute threshold would gut whichever language
    * the scorer is hardest on). Reuses tx02's exact quality formula
    * ([[Text.qualityScore]]) so the two gates can't drift.
    *
    * The median is the row_number-selected lower median over a TOTAL
    * order (score, then doc_id) — deterministic under ties and
    * identical in both engines, unlike interpolating percentile_cont.
    * Scale shape: one shuffle on lang for the window pass (the same
    * partitioning serves row_number and count), a languages-sized
    * broadcast of the medians, then a map-side filter. */
  private def qualityCut(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stops = typedLit(Text.stopwords)
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("lang"),
        Text.qualityScore(
          size(col("ws")).cast("long"),
          size(filter(col("ws"), w => array_contains(stops, w))).cast("long")).as("q"))
    val ranked = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("q"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
    val med = ranked
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("lang"), col("q").as("med"))
    ranked
      .join(broadcast(med), "lang")
      .filter(col("q") >= col("med"))
      .select("doc_id", "lang", "q")
      .orderBy("doc_id")
  }

  private val qualityCutOracle: String = {
    val stopsIn = Text.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH s AS (
        SELECT doc_id, lang,
               ROUND(LEAST(CAST(len(ws) AS DOUBLE) / 50.0, 1.0) * 0.5
                     + (CAST(len(list_filter(ws, t -> t IN ($stopsIn))) AS DOUBLE) / len(ws)) * 0.5,
                 4) AS q
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY q, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM s),
      m AS (SELECT lang, q AS med FROM r WHERE rn = (n + 1) // 2)
      SELECT r.doc_id, r.lang, r.q
      FROM r JOIN m ON r.lang = m.lang
      WHERE r.q >= m.med ORDER BY r.doc_id"""
  }

  // ------------------------------------- length-bucketed curriculum

  /** Short-to-long curriculum schedule: the corpus trains in length
    * buckets (shortest documents first), deterministically shuffled inside
    * each bucket by a salted content hash. The GLOBAL training position is
    * two-level arithmetic at BOTH levels — the within-bucket rank is
    * computed over hash-range sub-buckets (the hash is uniform, so the
    * (bucket, sub) windows stay balanced however large one length bucket
    * grows) plus prefix-summed sub-bucket counts, and bucket offsets are a
    * broadcast prefix over the 8-row bucket histogram — never a global
    * sort or a window whose partition grows with the corpus. Gate output:
    * the first 128 schedule positions. */
  private val currSalt = "cur|"

  private def curriculum(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.spread(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        least(lit(7L), expr("size(split(text, ' ')) div 40")).as("bucket"),
        graft.functions.hashfns.rollHash(concat(lit(currSalt), col("text"))).as("h"))
      .withColumn("sub", expr("h div 8388608")) // monotone hash range, ~120 sub-buckets
    val wIn = Window.partitionBy("bucket", "sub").orderBy("h", "doc_id")
    val wSub = Window.partitionBy("bucket").orderBy("sub")
      .rowsBetween(Window.unboundedPreceding, -1)
    val subOffs = docs.groupBy("bucket", "sub").agg(count(lit(1)).as("ns"))
      .withColumn("sub_off", coalesce(sum("ns").over(wSub), lit(0L)))
      .select("bucket", "sub", "sub_off")
    val ranked = docs
      .withColumn("r_in", row_number().over(wIn).cast("long"))
      .join(broadcast(subOffs), Seq("bucket", "sub"))
      .withColumn("rank_b", col("sub_off") + col("r_in"))
    val wOff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offs = docs.groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum("n").over(wOff), lit(0L)))
      .select("bucket", "off")
    ranked.join(broadcast(offs), Seq("bucket"))
      .withColumn("pos", col("off") + col("rank_b") - 1)
      .filter(col("pos") < 128)
      .select("pos", "bucket", "rank_b", "doc_id")
      .orderBy("pos")
  }

  private val curriculumOracle: String = {
    val h = Hashing.duckRollHash(s"'$currSalt' || text", Hashing.P, "c0")
    s"""WITH t AS (
        SELECT doc_id, LEAST(7, len(string_split(text, ' ')) // 40) AS bucket,
               ($h) AS h
        FROM documents),
      r AS (
        SELECT doc_id, bucket,
               CAST(row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id)
                 AS BIGINT) AS rank_b
        FROM t),
      o AS (
        SELECT bucket,
               CAST(COALESCE(SUM(n) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        FROM (SELECT bucket, COUNT(*) AS n FROM t GROUP BY bucket))
      SELECT off + rank_b - 1 AS pos, bucket, rank_b, doc_id
      FROM r JOIN o USING (bucket)
      WHERE off + rank_b - 1 < 128 ORDER BY pos"""
  }

  // ------------------------------------------------ data-quality gate

  /** Expectation-suite validation (the Great-Expectations / Deequ shape):
    * a battery of declarative constraints — uniqueness, referential
    * integrity, domain bounds, null rate — each reduced to ONE row
    * (check, n_checked, n_violations, pass). Every check is a single
    * scan + keyed aggregate or broadcast/shuffle anti-join; the union of
    * one-row frames costs nothing. This is the admission gate a 100 TB
    * ingest runs before data reaches training: all checks are
    * distributed, none collect row-level data to the driver. */
  private def dqGate(s: SparkSession, d: String): DataFrame = {
    val li  = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cst = Tables.customer(s, d)
    val nat = Tables.nation(s, d)

    def check(name: String, checked: org.apache.spark.sql.Column,
              violations: org.apache.spark.sql.Column, df: DataFrame): DataFrame =
      df.agg(checked.cast("long").as("n_checked"),
             violations.cast("long").as("n_violations"))
        .select(lit(name).as("check"), col("n_checked"), col("n_violations"),
          (col("n_violations") === 0).as("pass"))

    val orderKeyUnique = check("orders.o_orderkey unique",
      count(lit(1)), count(lit(1)) - countDistinct(col("o_orderkey")), ord)
    val priceRange = check("orders.o_totalprice > 0",
      count(lit(1)), sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)), ord)
    val qtyDomain = check("lineitem.l_quantity in [1,50]",
      count(lit(1)),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)), li)
    val custNotNull = check("customer.c_name not null",
      count(lit(1)), sum(when(col("c_name").isNull, 1L).otherwise(0L)), cst)
    // referential integrity via anti-join: violations never leave executors
    val liFk = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(li.agg(count(lit(1)).as("n_checked")))
      .select(lit("lineitem.l_orderkey fk orders").as("check"),
        col("n_checked"), col("n_violations"), (col("n_violations") === 0).as("pass"))
    val custFk = cst.select(col("c_nationkey"))
      .join(broadcast(nat.select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(cst.agg(count(lit(1)).as("n_checked")))
      .select(lit("customer.c_nationkey fk nation").as("check"),
        col("n_checked"), col("n_violations"), (col("n_violations") === 0).as("pass"))

    orderKeyUnique.union(priceRange).union(qtyDomain).union(custNotNull)
      .union(liFk).union(custFk)
      .orderBy("check")
  }

  private val dqGateOracle =
    """SELECT * FROM (
        SELECT 'orders.o_orderkey unique' AS "check",
               COUNT(*) AS n_checked,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
               COUNT(*) = COUNT(DISTINCT o_orderkey) AS pass
        FROM orders
        UNION ALL
        SELECT 'orders.o_totalprice > 0', COUNT(*),
               CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'lineitem.l_quantity in [1,50]', COUNT(*),
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) = 0
        FROM lineitem
        UNION ALL
        SELECT 'customer.c_name not null', COUNT(*),
               CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) = 0
        FROM customer
        UNION ALL
        SELECT 'lineitem.l_orderkey fk orders',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
                 ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL),
               (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
                 ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) = 0
        UNION ALL
        SELECT 'customer.c_nationkey fk nation',
               (SELECT COUNT(*) FROM customer),
               (SELECT COUNT(*) FROM customer c LEFT JOIN nation n
                 ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL),
               (SELECT COUNT(*) FROM customer c LEFT JOIN nation n
                 ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL) = 0)
       ORDER BY "check""""

  // ------------------------------------------- duplicate-aware weights

  /** Repetition-discounted sampling weights: a doc in a k-member
    * truncation-duplicate group (dd14's prefix key) trains with weight
    * 1/k so duplicated content isn't over-sampled. Weights are integer
    * basis points (10000 div k — zero float). Two shuffles, both on
    * bounded keys: the prefix group, then the per-source rollup; exactly
    * the shape the full pipeline runs before writing sampling manifests. */
  private def dedupWeights(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grp = Window.partitionBy(substring(col("text"), 1, 64))
    Tables.documents(s, d)
      .withColumn("gsize", count(lit(1)).over(grp))
      .withColumn("w_bp", expr("10000 div gsize"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w_bp")).as("weight_bp"),
        sum(when(col("gsize") > 1, 1L).otherwise(0L)).as("n_duped"))
      .orderBy("source")
  }

  private val dedupWeightsOracle =
    """WITH g AS (
        SELECT source,
               CAST(COUNT(*) OVER (PARTITION BY substr(text, 1, 64)) AS BIGINT) AS gsize
        FROM documents)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(10000 // gsize) AS BIGINT) AS weight_bp,
             CAST(SUM(CASE WHEN gsize > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_duped
      FROM g GROUP BY source ORDER BY source"""

  // ------------------------------------------------- per-domain token cap

  /** Per-source token budget: rank each source's docs by length (longest
    * first, doc_id tie-break), admit while the running token total stays
    * within a 2,000-token cap — the domain-balancing step that stops one
    * crawl from dominating the mixture. One source-keyed window (running
    * sum), then a constant-size per-source rollup; at 100 TB the window
    * partitions by source, which is the natural skew-safe key once
    * oversized sources are salted into epoch slices (pp06's shape). */
  private def domainCap(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySrc = Window.partitionBy("source").orderBy(desc("n_tok"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum_tok", sum("n_tok").over(bySrc))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("tok_total"),
        sum(when(col("cum_tok") <= 2000L, 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("cum_tok") <= 2000L, col("n_tok")).otherwise(0L)).as("tok_selected"))
      .orderBy("source")
  }

  private val domainCapOracle =
    """WITH t AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT source, n_tok,
               CAST(SUM(n_tok) OVER (PARTITION BY source
                    ORDER BY n_tok DESC, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
        FROM t)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS tok_total,
             CAST(SUM(CASE WHEN cum_tok <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
             CAST(SUM(CASE WHEN cum_tok <= 2000 THEN n_tok ELSE 0 END) AS BIGINT) AS tok_selected
      FROM c GROUP BY source ORDER BY source"""

  // ---------------------------------------------- shard-balance audit

  /** Shard skew audit over pp06's salted-hash epoch sharding: per-shard
    * row AND token counts, each shard's deviation from the ideal equal
    * split in basis points, and the spread between heaviest and lightest
    * shard — the pre-flight check a training job runs before launching N
    * loaders (one slow shard gates the whole epoch). Pure arithmetic on
    * exact integers after one 8-key aggregate; the window runs over 8
    * rows. Two epochs' salts are audited side by side so drift between
    * re-shuffles is visible. */
  private def shardBalance(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def forSalt(salt: String, epoch: Int): DataFrame =
      Tables.documents(s, d)
        .select(
          lit(epoch.toLong).as("epoch"),
          pmod(graft.functions.hashfns.rollHash(concat(lit(salt), col("text"))), lit(nShards)).as("shard"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    val both = forSalt(epochSalt, 1).unionByName(forSalt("e2|", 2))
    val byEpoch = Window.partitionBy("epoch")
    both
      .withColumn("tot_docs", sum("n_docs").over(byEpoch))
      // delta stays a raw signed integer; the bp division runs on ABS only
      // (negative integer division truncates toward zero in Spark but can
      // floor elsewhere — keep every div non-negative)
      .withColumn("delta_docs", expr(s"n_docs * $nShards - tot_docs"))
      .withColumn("abs_dev_bp", expr("abs(delta_docs) * 10000 div tot_docs"))
      .withColumn("spread_bp",
        expr(s"(max(n_docs) OVER (PARTITION BY epoch) - min(n_docs) OVER (PARTITION BY epoch)) * 10000 div tot_docs"))
      .select("epoch", "shard", "n_docs", "n_tokens", "delta_docs", "abs_dev_bp", "spread_bp")
      .orderBy("epoch", "shard")
  }

  private val shardBalanceOracle: String = {
    def cte(salt: String, epoch: Int, name: String) = {
      val h = Hashing.duckRollHash(s"'$salt' || text", Hashing.P, s"c$epoch")
      s"""$name AS (
        SELECT CAST($epoch AS BIGINT) AS epoch, ($h) % $nShards AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 2)"""
    }
    s"""WITH ${cte(epochSalt, 1, "e1")}, ${cte("e2|", 2, "e2")},
      u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2),
      w AS (
        SELECT *, CAST(SUM(n_docs) OVER (PARTITION BY epoch) AS BIGINT) AS tot_docs,
               CAST(MAX(n_docs) OVER (PARTITION BY epoch) AS BIGINT) AS mx,
               CAST(MIN(n_docs) OVER (PARTITION BY epoch) AS BIGINT) AS mn
        FROM u)
      SELECT epoch, shard, n_docs, n_tokens,
             n_docs * $nShards - tot_docs AS delta_docs,
             abs(n_docs * $nShards - tot_docs) * 10000 // tot_docs AS abs_dev_bp,
             (mx - mn) * 10000 // tot_docs AS spread_bp
      FROM w ORDER BY epoch, shard"""
  }

  // ---------------------------------------------------- dataset card

  /** Dataset-card metrics: the one-row-per-fact corpus datasheet a
    * released training set ships with (docs/sources/langs, token and
    * char volume, vocabulary size, length distribution, duplication).
    * Each metric is a single exact-integer aggregate; the unions are
    * planning-level (nine 1-row aggregates), so the whole card costs a
    * handful of independent scans that AQE runs in parallel — and at
    * 100 TB each metric is exactly the aggregate you would run anyway. */
  private def datasetCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tok = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    def m(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("metric"), col("value").cast("long").as("value"))
    m("01_n_docs", docs.agg(count(lit(1)).as("value")))
      .unionByName(m("02_n_sources", docs.agg(countDistinct("source").as("value"))))
      .unionByName(m("03_n_langs", docs.agg(countDistinct("lang").as("value"))))
      .unionByName(m("04_n_tokens", tok.agg(count(lit(1)).as("value"))))
      .unionByName(m("05_n_chars", docs.agg(sum(length(col("text"))).as("value"))))
      .unionByName(m("06_vocab_size", tok.agg(countDistinct("w").as("value"))))
      .unionByName(m("07_max_doc_tokens", docs
        .select(size(split(col("text"), " ")).as("t")).agg(max("t").as("value"))))
      .unionByName(m("08_median_doc_tokens", docs
        .select(size(split(col("text"), " ")).cast("long").as("t"))
        .agg(expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY t) AS BIGINT)").as("value"))))
      .unionByName(m("09_prefix_dup_groups", docs
        .groupBy(substring(col("text"), 1, 64)).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).agg(count(lit(1)).as("value"))))
      .orderBy("metric")
  }

  private val datasetCardOracle =
    """SELECT metric, value FROM (
        SELECT '01_n_docs' AS metric, COUNT(*) AS value FROM documents
        UNION ALL SELECT '02_n_sources', COUNT(DISTINCT source) FROM documents
        UNION ALL SELECT '03_n_langs', COUNT(DISTINCT lang) FROM documents
        UNION ALL SELECT '04_n_tokens', COUNT(*) FROM
          (SELECT unnest(string_split(text, ' ')) AS w FROM documents) WHERE w <> ''
        UNION ALL SELECT '05_n_chars', CAST(SUM(len(text)) AS BIGINT) FROM documents
        UNION ALL SELECT '06_vocab_size', COUNT(DISTINCT w) FROM
          (SELECT unnest(string_split(text, ' ')) AS w FROM documents) WHERE w <> ''
        UNION ALL SELECT '07_max_doc_tokens',
          CAST(MAX(len(string_split(text, ' '))) AS BIGINT) FROM documents
        UNION ALL SELECT '08_median_doc_tokens',
          CAST(quantile_disc(len(string_split(text, ' ')), 0.5) AS BIGINT) FROM documents
        UNION ALL SELECT '09_prefix_dup_groups', COUNT(*) FROM
          (SELECT substr(text, 1, 64) AS p, COUNT(*) AS c FROM documents
           GROUP BY p HAVING COUNT(*) > 1))
      ORDER BY metric"""

  // ------------------------------------- selection under a token budget

  /** Data selection under a fixed token budget: rank every document by an
    * integer quality key (type-token ratio in basis points, tie-broken by
    * doc_id), then take the greedy prefix whose cumulative token count
    * fits the budget — here 25% of the corpus's tokens, so the gate is
    * scale-free. The report is the per-language composition of the
    * selected set, which is what a mixing engineer actually reviews
    * before training. All-integer arithmetic end-to-end.
    *
    * Scale: one pass computes per-doc (tokens, ttr) map-side; the ranked
    * prefix sum is the an63 two-pass pattern, NOT a global window —
    * range-repartition on the rank key, sort within partitions, collect
    * one token-subtotal per partition, broadcast the prefix offsets, and
    * accumulate map-side. Driver state is 32 longs; every core sorts its
    * own range, at any corpus size. */
  private def tokenBudget(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sorted = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("lang"),
        size(col("ws")).cast("long").as("n_tok"),
        expr("size(array_distinct(ws)) * 10000 div size(ws)").as("ttr_bp"))
      .repartitionByRange(32, col("ttr_bp").desc, col("doc_id").asc)
      .sortWithinPartitions(col("ttr_bp").desc, col("doc_id").asc)
      .as[(Long, String, Long, Long)]
      .persist()
    val subtotals = sorted
      .mapPartitions(it => Iterator.single(
        (org.apache.spark.TaskContext.getPartitionId(), it.map(_._3).sum)))
      .collect().sortBy(_._1)
    val total   = subtotals.map(_._2).sum
    val budget  = total / 4
    val offsets = subtotals.map(_._1).zip(
      subtotals.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
    val bcOff = s.sparkContext.broadcast(offsets)
    sorted
      .mapPartitions { it =>
        var cum = bcOff.value(org.apache.spark.TaskContext.getPartitionId())
        it.map { case (id, lang, nTok, _) => cum += nTok; (id, lang, nTok, cum) }
      }
      .toDF("doc_id", "lang", "n_tok", "cum")
      .filter(col("cum") <= lit(budget))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sel"), sum("n_tok").as("tok_sel"))
      .select(col("lang"), col("n_sel"), col("tok_sel"),
        expr(s"tok_sel * 10000 div ${budget}L").as("budget_share_bp"))
      .orderBy("lang")
  }

  private val tokenBudgetOracle: String =
    """WITH s AS (
        SELECT doc_id, lang,
               CAST(len(ws) AS BIGINT) AS n_tok,
               CAST(len(list_distinct(ws)) AS BIGINT) * 10000
                 // CAST(len(ws) AS BIGINT) AS ttr_bp
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)),
      b AS (SELECT CAST(SUM(n_tok) // 4 AS BIGINT) AS budget FROM s),
      r AS (
        SELECT *, CAST(SUM(n_tok) OVER (ORDER BY ttr_bp DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM s)
      SELECT lang, COUNT(*) AS n_sel,
             CAST(SUM(n_tok) AS BIGINT) AS tok_sel,
             CAST(SUM(n_tok) * 10000 // MAX(budget) AS BIGINT) AS budget_share_bp
      FROM r CROSS JOIN b
      WHERE cum <= budget
      GROUP BY lang ORDER BY lang"""

  // ------------------------------------- per-domain epoch/repeat factors

  /** Epoch-factor planning for a fixed uniform mixture: each source should
    * contribute an equal token share of the training mix; a source with
    * fewer tokens than its target repeats (multiple epochs), capped at 4
    * epochs — the data-constrained scaling recipe (repeating beyond ~4
    * epochs stops helping). Emits, per source: available tokens, target,
    * the repeat factor in centi-epochs (exact integer `div`), the
    * effective token contribution under the cap, and whether the cap bit.
    * One token-count aggregation; everything after is sources-sized
    * arithmetic on a broadcast — free at any corpus scale. */
  private def epochFactors(s: SparkSession, d: String): DataFrame = {
    val avail = Tables.documents(s, d)
      .select(col("source"), expr("size(split(text, ' '))").cast("long").as("n_tok"))
      .groupBy("source").agg(sum("n_tok").as("avail_tok"))
    val tot = avail.agg(sum("avail_tok").as("total"), count(lit(1)).as("n_sources"))
    avail.crossJoin(broadcast(tot))
      .withColumn("target_tok", expr("total div n_sources"))
      .withColumn("epochs_e2", least(lit(400L), expr("target_tok * 100 div avail_tok")))
      .withColumn("effective_tok", expr("avail_tok * epochs_e2 div 100"))
      .withColumn("capped", col("epochs_e2") === 400L)
      .select("source", "avail_tok", "target_tok", "epochs_e2", "effective_tok", "capped")
      .orderBy("source")
  }

  private val epochFactorsOracle =
    """WITH a AS (
        SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tok
        FROM documents GROUP BY source),
      t AS (SELECT CAST(SUM(avail_tok) AS BIGINT) AS total,
                   COUNT(*) AS n_sources FROM a),
      p AS (
        SELECT source, avail_tok,
               total // n_sources AS target_tok,
               LEAST(400, (total // n_sources) * 100 // avail_tok) AS epochs_e2
        FROM a CROSS JOIN t)
      SELECT source, avail_tok,
             CAST(target_tok AS BIGINT) AS target_tok,
             CAST(epochs_e2 AS BIGINT) AS epochs_e2,
             CAST(avail_tok * epochs_e2 // 100 AS BIGINT) AS effective_tok,
             epochs_e2 = 400 AS capped
      FROM p ORDER BY source"""

  /** pp21: WATER-FILLING token allocation — split a global budget (25%
    * of corpus tokens, scale-free) across sources so no source dominates:
    * every source gets min(its tokens, L) where the level L satisfies
    * Σ min(tₛ, L) = budget. The classic uniform-capped mixture allocator
    * (the continuous analogue of pp15's hard caps), solved EXACTLY with
    * integers: sort sources by size, prefix sums give the largest k with
    * everyone-below-k fully taken, L = (budget − prefix)/(n−k) floor, and
    * the division remainder goes one token each to the first sources in
    * name order — bit-deterministic in both engines. Corpus-proportional
    * work is ONE (source) aggregate; the solve runs on ≤|sources| rows. */
  private def waterfill(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSrc = Tables.spread(Tables.documents(s, d).select(col("source"), col("text")))
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy("source").agg(sum("t").as("t_s"))
    val byAsc = Window.orderBy("t_s", "source")
    val staged = perSrc
      .withColumn("rk", row_number().over(byAsc).cast("long"))
      .withColumn("pfx", sum("t_s").over(byAsc.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(perSrc.agg(
        count(lit(1)).as("n_src"),
        expr("sum(t_s) DIV 4").as("budget"))))
    // k = the largest rank whose source (and everything smaller) is taken
    // IN FULL: with level = t_s(k), the total still fits the budget
    val kv = staged
      .filter(col("pfx") + (col("n_src") - col("rk")) * col("t_s") <= col("budget"))
      .agg(coalesce(max("rk"), lit(0L)).as("k"), coalesce(max("pfx"), lit(0L)).as("pfx_k"))
    staged.crossJoin(broadcast(kv))
      .withColumn("lvl", expr("(budget - pfx_k) DIV (n_src - k)"))
      .withColumn("rem", expr("(budget - pfx_k) % (n_src - k)"))
      .withColumn("alloc", expr(
        """CASE WHEN rk <= k THEN t_s
           ELSE least(t_s, lvl + CASE WHEN rk <= k + rem THEN 1 ELSE 0 END)
           END"""))
      .select(col("source"), col("t_s"), col("alloc"))
      .orderBy("source")
  }

  private val waterfillOracle =
    """WITH w AS (
        SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS t FROM documents),
      ps AS (SELECT source, CAST(SUM(t) AS BIGINT) AS t_s FROM w GROUP BY 1),
      st AS (
        SELECT source, t_s,
               row_number() OVER (ORDER BY t_s, source) AS rk,
               SUM(t_s) OVER (ORDER BY t_s, source ROWS UNBOUNDED PRECEDING) AS pfx
        FROM ps),
      g AS (SELECT COUNT(*) AS n_src, SUM(t_s) // 4 AS budget FROM ps),
      kv AS (
        SELECT COALESCE(MAX(rk), 0) AS k, COALESCE(MAX(pfx), 0) AS pfx_k
        FROM st, g WHERE pfx + (n_src - rk) * t_s <= budget),
      f AS (
        SELECT st.source, st.t_s, st.rk, g.budget, g.n_src, kv.k, kv.pfx_k,
               (g.budget - kv.pfx_k) // (g.n_src - kv.k) AS lvl,
               (g.budget - kv.pfx_k) % (g.n_src - kv.k) AS rem
        FROM st, g, kv)
      SELECT source, t_s,
             CAST(CASE WHEN rk <= k THEN t_s
               ELSE LEAST(t_s, lvl + CASE WHEN rk <= k + rem THEN 1 ELSE 0 END)
               END AS BIGINT) AS alloc
      FROM f ORDER BY source"""

  def all: Seq[Q] = Seq(
    Q("pp01_curation", curation, Some(curationOracle)),
    Q("pp02_pack", packing, Some(packingOracle)),
    Q("pp03_mix", mix, Some(mixOracle)),
    Q("pp04_stratified", stratified, Some(stratifiedOracle)),
    Q("pp05_contamination", contamination, Some(contaminationOracle)),
    Q("pp06_epoch_shuffle", epochShuffle, Some(epochShuffleOracle)),
    Q("pp07_neardup_curation", neardupCuration, Some(neardupCurationOracle)),
    Q("pp08_temperature_mix", temperatureMix, Some(temperatureMixOracle)),
    Q("pp09_quality_cut", qualityCut, Some(qualityCutOracle)),
    Q("pp10_curriculum", curriculum, Some(curriculumOracle)),
    Q("pp11_mix_audit", mixAudit, Some(mixAuditOracle)),
    Q("pp12_provenance", provenance, Some(provenanceOracle)),
    Q("pp13_dq_gate", dqGate, Some(dqGateOracle)),
    Q("pp14_dedup_weights", dedupWeights, Some(dedupWeightsOracle)),
    Q("pp15_domain_cap", domainCap, Some(domainCapOracle)),
    Q("pp16_shard_balance", shardBalance, Some(shardBalanceOracle)),
    Q("pp17_dataset_card", datasetCard, Some(datasetCardOracle)),
    Q("pp18_token_budget", tokenBudget, Some(tokenBudgetOracle)),
    Q("pp19_epoch_factors", epochFactors, Some(epochFactorsOracle)),
    Q("pp20_filter_ablation", filterAblation, Some(filterAblationOracle)),
    Q("pp21_waterfill", waterfill, Some(waterfillOracle))
  )

  /** Curation-filter ABLATION matrix: every document is scored against the
    * four standard gates (length ≥ 100 chars, target language, exact-
    * duplicate-free, ≥ 20 tokens) and the corpus is broken down by the
    * full 2⁴ combination grid — docs and tokens per cell plus corpus
    * share. This is the table a curation review actually reads: it shows
    * each filter's marginal bite and their overlaps (e.g. how much of the
    * short-doc mass is ALSO duplicated), which a per-filter funnel hides.
    * One text-keyed window for uniqueness (the dd01 shuffle), then one
    * 16-cell aggregate — map-combinable, constant output at any scale. */
  private def filterAblation(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy("text")))
      .select(
        (col("n_chars") >= 100).as("g_len"),
        (col("lang") === "en").as("g_lang"),
        (col("n_copies") === 1).as("g_uniq"),
        (size(split(col("text"), " ")) >= 20).as("g_tok"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    docs.groupBy("g_len", "g_lang", "g_uniq", "g_tok")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .withColumn("share_bp",
        expr("n_docs * 10000 div sum(n_docs) over ()"))
      .orderBy("g_len", "g_lang", "g_uniq", "g_tok")
  }

  private val filterAblationOracle =
    """WITH docs AS (
        SELECT n_chars >= 100 AS g_len,
               lang = 'en' AS g_lang,
               COUNT(*) OVER (PARTITION BY text) = 1 AS g_uniq,
               len(string_split(text, ' ')) >= 20 AS g_tok,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      g AS (
        SELECT g_len, g_lang, g_uniq, g_tok,
               COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens
        FROM docs GROUP BY 1, 2, 3, 4)
      SELECT g_len, g_lang, g_uniq, g_tok, n_docs,
             CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(n_docs * 10000 // (SUM(n_docs) OVER ()) AS BIGINT) AS share_bp
      FROM g ORDER BY g_len, g_lang, g_uniq, g_tok"""
}
