package graft.ops

import graft.{Hashing, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * language ID (token-list heuristic), quality scoring, token counting and
  * document fingerprinting (rolling hash + min-gram winnowing).
  *
  * All scoring is exact integer / exact-decimal arithmetic shared verbatim
  * with the DuckDB oracle, so results hash-match bit-for-bit. Everything is
  * per-row `functions._` expression work — embarrassingly parallel, no
  * shuffle except the final presentation sort; at 100 TB these run as a
  * single map stage over the document scan.
  */
object Text {

  /** Fixed per-language marker-token lists (disjoint subsets of the testdata
    * vocabulary; the heuristic is the operator under test, not linguistics). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("join", "hash", "row", "batch", "scan", "customer"),
    "en" -> Seq("the", "a", "fast", "query", "sort", "big"),
    "es" -> Seq("column", "filter", "small", "slow", "merge", "order"),
    "fr" -> Seq("vector", "line", "table", "data", "agg", "value"),
    "zh" -> Seq("key", "stream", "window", "spark", "group", "part")
  )

  val stopwords: Seq[String] = Seq("the", "a")

  private def sqlList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  private def words(df: DataFrame): DataFrame =
    graft.Tables.spread(df.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("ws"))

  // ---------------------------------------------------------------- lang id

  /** (lang_pred, score) as pure per-row column expressions. The marker
    * lists are program constants, so the argmax over 5 languages is five
    * codegen'd array filters + a greatest/when chain — no crossJoin, no
    * window shuffle; at 100 TB language ID is a map-only stage. The when
    * chain evaluates in ascending lang order, so ties break to the
    * lexicographically smallest language, exactly the oracle's
    * (score DESC, lang ASC) row_number pick. */
  private[ops] def langPred(ws: Column): (Column, Column) = {
    val scores = langMarkers.map { case (l, ms) =>
      (l, size(filter(ws, w => array_contains(typedLit(ms), w))).cast("long"))
    }
    val mx = greatest(scores.map(_._2): _*)
    val pred = scores.tail.foldLeft(when(scores.head._2 === mx, scores.head._1)) {
      case (acc, (l, sc)) => acc.when(sc === mx, l)
    }
    (pred, mx)
  }

  private def langId(s: SparkSession, d: String): DataFrame = {
    val (pred, score) = langPred(col("ws"))
    words(Tables.documents(s, d))
      .select(col("doc_id"), pred.as("lang_pred"), score.as("score"))
      .orderBy("doc_id")
  }

  private val langIdOracle: String = {
    val values = langMarkers
      .map { case (l, ws) => s"('$l', [${sqlList(ws)}])" }
      .mkString(", ")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      langs(lang, wlist) AS (VALUES $values),
      scores AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(ws, x -> list_contains(wlist, x))) AS BIGINT) AS score
        FROM w CROSS JOIN langs),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn FROM scores)
      SELECT doc_id, lang AS lang_pred, score FROM r WHERE rn = 1 ORDER BY doc_id"""
  }

  // ------------------------------------------------------ lang confusion

  /** Classifier-eval confusion matrix: the declared `lang` column against
    * tx01's predicted language, with each cell's share of its declared
    * row. The prediction is tx01's map-only expression, so the whole
    * matrix is one scan + one shuffle on (lang, lang_pred) — 25 keys; the
    * per-lang total comes from a window over the lang-sized cell frame,
    * not a second pass over the corpus. The standard drift monitor for
    * any heuristic labeler at any scale. */
  private def langConfusion(s: SparkSession, d: String): DataFrame = {
    val (pred, _) = langPred(col("ws"))
    val cells = graft.Tables
      .spread(Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text")))
      .select(col("lang"), split(col("text"), " ").as("ws"))
      .select(col("lang"), pred.as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n_docs"))
    val byLang = Window.partitionBy("lang")
    cells
      .withColumn("share",
        round(col("n_docs").cast("double") / sum("n_docs").over(byLang), 4))
      .orderBy("lang", "lang_pred")
  }

  private lazy val langConfusionOracle: String = {
    val values = langMarkers
      .map { case (l, ws) => s"('$l', [${sqlList(ws)}])" }
      .mkString(", ")
    s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
      langs(plang, wlist) AS (VALUES $values),
      scores AS (
        SELECT doc_id, lang, plang,
               CAST(len(list_filter(ws, x -> list_contains(wlist, x))) AS BIGINT) AS score
        FROM w CROSS JOIN langs),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn FROM scores),
      cells AS (
        SELECT lang, plang AS lang_pred, COUNT(*) AS n_docs
        FROM r WHERE rn = 1 GROUP BY 1, 2)
      SELECT lang, lang_pred, n_docs,
             ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY lang), 4) AS share
      FROM cells ORDER BY lang, lang_pred"""
  }

  // ---------------------------------------------------------------- quality

  private def quality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stops = typedLit(stopwords)
    words(Tables.documents(s, d))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("len_chars"),
        size(col("ws")).cast("long").as("n_words"),
        size(filter(col("ws"), w => array_contains(stops, w))).cast("long").as("stop_cnt"))
      .select(
        col("doc_id"), col("len_chars"), col("n_words"),
        round((col("len_chars") - (col("n_words") - 1)).cast("double") / col("n_words"), 4).as("avg_word_len"),
        round(col("stop_cnt").cast("double") / col("n_words"), 4).as("stop_ratio"),
        qualityScore(col("n_words"), col("stop_cnt")).as("quality_score"))
      .orderBy("doc_id")
  }

  /** The quality-score formula, shared with the pp01 curation pipeline so
    * a tuning change cannot silently diverge the two (and their oracles). */
  private[graft] def qualityScore(nWords: Column, stopCnt: Column): Column =
    round(
      least(nWords.cast("double") / 50.0, lit(1.0)) * 0.5 +
        (stopCnt.cast("double") / nWords) * 0.5, 4)

  private val qualityOracle: String =
    s"""WITH w AS (
        SELECT doc_id, length(text) AS lc, string_split(text, ' ') AS ws FROM documents),
      x AS (
        SELECT doc_id, CAST(lc AS BIGINT) AS len_chars, CAST(len(ws) AS BIGINT) AS n_words,
               CAST(len(list_filter(ws, t -> t IN (${sqlList(stopwords)}))) AS BIGINT) AS stop_cnt
        FROM w)
      SELECT doc_id, len_chars, n_words,
        ROUND(CAST(len_chars - (n_words - 1) AS DOUBLE) / n_words, 4) AS avg_word_len,
        ROUND(CAST(stop_cnt AS DOUBLE) / n_words, 4) AS stop_ratio,
        ROUND(LEAST(CAST(n_words AS DOUBLE) / 50.0, 1.0) * 0.5
              + (CAST(stop_cnt AS DOUBLE) / n_words) * 0.5, 4) AS quality_score
      FROM x ORDER BY doc_id"""

  // ----------------------------------------------------------- token counts

  private def tokenCount(s: SparkSession, d: String): DataFrame =
    words(Tables.documents(s, d))
      .select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens_ws"),
        expr("aggregate(ws, CAST(0 AS BIGINT), (acc, w) -> acc + (length(w) + 3) div 4)").as("n_tokens_sub"),
        round(length(col("text")).cast("double") / size(col("ws")), 4).as("chars_per_token"))
      .orderBy("doc_id")

  private val tokenCountOracle: String =
    """WITH w AS (SELECT doc_id, length(text) AS lc, string_split(text, ' ') AS ws FROM documents)
      SELECT doc_id,
        CAST(len(ws) AS BIGINT) AS n_tokens_ws,
        CAST(list_sum(list_transform(ws, t -> (len(t) + 3) // 4)) AS BIGINT) AS n_tokens_sub,
        ROUND(CAST(lc AS DOUBLE) / len(ws), 4) AS chars_per_token
      FROM w ORDER BY doc_id"""

  // ----------------------------------------------------------- fingerprints

  private def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        graft.functions.hashfns.rollHash(col("text")).as("full_hash"),
        graft.functions.hashfns.minGramHash(col("text"), 5).as("min_gram_hash"))
      .orderBy("doc_id")

  private val fingerprintOracle: String = {
    val full  = Hashing.duckRollHash("text", Hashing.P, "c0")
    val gram5 = Hashing.duckRollHash("substr(text, g, 5)", Hashing.P, "c1")
    s"""SELECT doc_id,
        $full AS full_hash,
        CASE WHEN length(text) >= 5
             THEN CAST(list_aggregate(list_transform(range(1, length(text) - 3), g -> $gram5), 'min') AS BIGINT)
             ELSE NULL END AS min_gram_hash
      FROM documents ORDER BY doc_id"""
  }

  // -------------------------------------------------------- bloom digest

  /** 256-bit Bloom digest (8 x 32-bit words — shifts stay under DuckDB's
    * checked 63-bit limit) of each language's document set, 4 hash probes
    * per doc over the rolling content hash, built with bit_or — an
    * order-independent sketch aggregation, so partial/final merge order
    * can't change the digest and the oracle matches exactly. The same
    * shape holds for any OR/max-mergeable sketch at 100 TB: per-row probe
    * computation is map-side, the aggregate shuffles 32 bytes per group. */
  private val bloomProbes: Seq[(Long, Long)] =
    Seq((769L, 12289L), (3079L, 49157L), (1543L, 24593L), (6151L, 98317L))

  private def bloom(s: SparkSession, d: String): DataFrame = {
    val withPos = Tables.documents(s, d)
      .select(col("lang"), graft.functions.hashfns.rollHash(col("text")).as("h"))
      .select(col("lang") +: bloomProbes.zipWithIndex.map { case ((a, b), i) =>
        ((col("h") * a + b) % 256).as(s"p$i")
      }: _*)
    def word(j: Int): Column =
      bloomProbes.indices.map { i =>
        when(expr(s"p$i div 32") === j,
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p$i % 32 AS INT))")).otherwise(0L)
      }.reduce(_ bitwiseOR _)
    withPos
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), (0 until 8).map(j => bit_or(word(j)).as(s"w$j")): _*)
      .orderBy("lang")
  }

  private val bloomOracle: String = {
    val h = Hashing.duckRollHash("text", Hashing.P, "c0")
    val posDefs = bloomProbes.zipWithIndex
      .map { case ((a, b), i) => s"(h * $a + $b) % 256 AS p$i" }
      .mkString(", ")
    def word(j: Int): String =
      bloomProbes.indices.map { i =>
        s"(CASE WHEN p$i // 32 = $j THEN (CAST(1 AS BIGINT) << CAST(p$i % 32 AS INT)) ELSE CAST(0 AS BIGINT) END)"
      }.mkString(" | ")
    val wordCols = (0 until 8).map(j => s"CAST(bit_or(${word(j)}) AS BIGINT) AS w$j").mkString(", ")
    s"""WITH hs AS (SELECT lang, $h AS h FROM documents),
      p AS (SELECT lang, $posDefs FROM hs)
      SELECT lang, COUNT(*) AS n_docs, $wordCols
      FROM p GROUP BY lang ORDER BY lang"""
  }

  // ------------------------------------------------------ bigram LM score

  /** Perplexity-style quality signal: train bigram/unigram counts on the
    * corpus itself, then score each document by its mean add-one-smoothed
    * bigram log-probability. Corpus statistics are one grouped count (the
    * classic count-then-broadcast-join LM shape); scoring is a join on the
    * bigram key + one aggregate — all shuffles on natural keys. Log/exp
    * arithmetic is identical in both engines; scores round to 4 decimals. */
  private def bigramLm(s: SparkSession, d: String): DataFrame = {
    // single-word docs have no bigrams: the oracle's range(1, len(ws)) is
    // empty for them, but Spark's sequence(1, 0) DESCENDS to [1, 0] and
    // element_at(ws, 0) throws — gate them out before the transform
    // feeds both the bigram path and the full-corpus unigram counts —
    // persist so the split+spread runs once (harness clears caches per query)
    val allDocs = words(Tables.documents(s, d)).persist()
    val docs = allDocs.filter(size(col("ws")) >= 2)
    val bigrams = docs
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))")))
      .select(col("doc_id"), col("col.w1").as("w1"), col("col.w2").as("w2"))
    val biCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c_bi"))
    // unigram stats come from the FULL corpus (single-word docs included),
    // matching the oracle's uni CTE, which counts over all documents
    val uniCounts = allDocs
      .select(explode(col("ws")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c_uni"))
    val vocabSize = 31L // fixed testdata vocabulary (stable across scales)
    // both stats frames are vocabulary-sized, so they fuse into ONE tiny
    // (w1, w2, c_bi, c_uni) broadcast table — the token stream pays a
    // single broadcast-hash probe instead of two joins (measured ~15%
    // faster at sf0.1, where stage latency dominates this query)
    bigrams
      .join(broadcast(biCounts.join(uniCounts, Seq("w1"))), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log((col("c_bi") + 1).cast("double") / (col("c_uni") + vocabSize))), 4)
          .as("avg_logp"))
      .orderBy("doc_id")
  }

  private val bigramLmOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
               unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
        FROM w),
      bi AS (SELECT w1, w2, COUNT(*) AS c_bi FROM bg GROUP BY w1, w2),
      uni AS (
        SELECT u.w1, COUNT(*) AS c_uni
        FROM (SELECT unnest(ws) AS w1 FROM w) u GROUP BY u.w1)
      SELECT doc_id, COUNT(*) AS n_bigrams,
        ROUND(AVG(ln(CAST(c_bi + 1 AS DOUBLE) / (c_uni + 31))), 4) AS avg_logp
      FROM bg JOIN bi USING (w1, w2) JOIN uni USING (w1)
      GROUP BY doc_id ORDER BY doc_id"""

  // ------------------------------------- LM perplexity filter (curation)

  /** Perplexity-style fluency filter — the standard LM-based curation cut
    * (keep the half of the corpus the n-gram model finds most fluent). The
    * per-doc score is tx06's bigram avg log-probability; the cut is the
    * corpus median, computed exactly. Docs at or above the median avg_logp
    * (i.e. at or below median perplexity) are kept.
    *
    * Scale shape: scoring is the tx06 plan (broadcast LM probe — the model
    * is vocabulary-sized); the median is one scalar over the doc-level
    * frame. At 100 TB the exact percentile would swap to approx_percentile
    * with identical plan shape. Cross-engine exactness: scores are rounded
    * to 4dp BEFORE the median, and an interpolated median lies strictly
    * between two consecutive order statistics, so no doc's membership can
    * flip on a last-ulp difference between the engines' interpolation. */
  private def perplexityCut(s: SparkSession, d: String): DataFrame = {
    val allDocs = words(Tables.documents(s, d)).persist()
    val docs    = allDocs.filter(size(col("ws")) >= 2)
    val bigrams = docs
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))")))
      .select(col("doc_id"), col("col.w1").as("w1"), col("col.w2").as("w2"))
    val biCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c_bi"))
    val uniCounts = allDocs
      .select(explode(col("ws")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c_uni"))
    // persisted: the doc-level score frame feeds both the median scalar
    // and the filtered output — without it the whole LM chain runs twice
    val scored = bigrams
      .join(broadcast(biCounts.join(uniCounts, Seq("w1"))), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(round(avg(log((col("c_bi") + 1).cast("double") / (col("c_uni") + 31L))), 4)
        .as("avg_logp"))
      .persist()
    val cut = scored.agg(expr("percentile(avg_logp, 0.5D)").as("med"))
    scored.crossJoin(broadcast(cut))
      .filter(col("avg_logp") >= col("med"))
      .select(col("doc_id"), col("avg_logp"))
      .orderBy("doc_id")
  }

  private val perplexityCutOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
               unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
        FROM w),
      bi AS (SELECT w1, w2, COUNT(*) AS c_bi FROM bg GROUP BY w1, w2),
      uni AS (
        SELECT u.w1, COUNT(*) AS c_uni
        FROM (SELECT unnest(ws) AS w1 FROM w) u GROUP BY u.w1),
      scored AS (
        SELECT doc_id,
               ROUND(AVG(ln(CAST(c_bi + 1 AS DOUBLE) / (c_uni + 31))), 4) AS avg_logp
        FROM bg JOIN bi USING (w1, w2) JOIN uni USING (w1)
        GROUP BY doc_id),
      cut AS (SELECT median(avg_logp) AS med FROM scored)
      SELECT doc_id, avg_logp FROM scored, cut
      WHERE avg_logp >= med ORDER BY doc_id"""

  // ------------------------------------- boilerplate / template detection

  /** Template detection by shared opening (C4-style boilerplate hunting at
    * document granularity, next to tx11's line-level pass): documents that
    * begin with the same 5 tokens are one template group. One shuffle on
    * the prefix key; group state is (count, min) — O(1) — so the shape is
    * identical at 100 TB, where the prefix would be hashed first to keep
    * the key narrow. Output: multi-document groups with their
    * representative (lowest doc_id), the dedup survivor. */
  private def boilerplate(s: SparkSession, d: String): DataFrame =
    words(Tables.documents(s, d))
      .select(col("doc_id"), array_join(slice(col("ws"), 1, 5), " ").as("prefix"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("rep_doc"))
      .filter(col("n_docs") > 1)
      .orderBy("prefix")

  private val boilerplateOracle: String =
    """WITH p AS (
        SELECT doc_id, array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS prefix
        FROM documents)
      SELECT prefix, COUNT(*) AS n_docs, MIN(doc_id) AS rep_doc
      FROM p GROUP BY prefix HAVING COUNT(*) > 1 ORDER BY prefix"""

  // ----------------------------------------------- character entropy

  /** Character-level Shannon entropy per document — the Gopher-style
    * low-entropy filter signal (catches base64 blobs, repeated-char
    * padding, and template noise that length/stopword ratios miss).
    * One shuffle on the (doc, char) key — alphabet-bounded fan-in — then
    * a per-doc sum of ~|alphabet| terms; entropy and the char count are
    * map-stage work at 100 TB. Output rounds to 4dp (the repo's standard
    * group-sum association guard, as tx06). */
  private def charEntropy(s: SparkSession, d: String): DataFrame = {
    val chars = Tables.spread(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), length(col("text")).cast("double").as("len"),
        explode(split(col("text"), "")).as("ch"))
    chars
      .groupBy("doc_id", "len", "ch")
      .agg(count(lit(1)).cast("double").as("cnt"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_distinct_chars"),
        round(sum(-(col("cnt") / col("len")) * log(2.0, col("cnt") / col("len"))), 4)
          .as("entropy_bits"))
      .orderBy("doc_id")
  }

  private val charEntropyOracle: String =
    """WITH c AS (
        SELECT doc_id, CAST(length(text) AS DOUBLE) AS len,
               unnest(string_split(text, '')) AS ch
        FROM documents),
      f AS (
        SELECT doc_id, len, ch, CAST(COUNT(*) AS DOUBLE) AS cnt
        FROM c GROUP BY doc_id, len, ch)
      SELECT doc_id, COUNT(*) AS n_distinct_chars,
             ROUND(SUM(-(cnt / len) * log2(cnt / len)), 4) AS entropy_bits
      FROM f GROUP BY doc_id ORDER BY doc_id"""

  // ------------------------------------------------------------- tf-idf

  /** Classic tf-idf document weighting: term frequency per (doc, word),
    * document frequency per word, score = Σ tf · ln((N+1)/(df+1)). Two
    * grouped counts on natural keys + a broadcast join of the (tiny
    * relative to the corpus) document-frequency table — at 100 TB the df
    * table is vocabulary-sized, so the join stays broadcast and the whole
    * plan is two shuffles. The corpus size N is a driver-side scalar
    * (metadata-grade, like a snapshot row count). */
  private def tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = words(Tables.documents(s, d)).persist() // terms + the N count
    val terms = docs
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy("w").agg(count(lit(1)).as("df"))
    val nDocs = docs.count()
    terms
      .join(broadcast(dfreq), Seq("w"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_terms"),
        round(sum(col("tf").cast("double") *
          log(lit((nDocs + 1).toDouble) / (col("df") + 1))), 4).as("tfidf"))
      .orderBy("doc_id")
  }

  private val tfidfOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      t AS (SELECT doc_id, unnest(ws) AS w FROM w),
      tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t GROUP BY 1, 2),
      df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
      SELECT doc_id, COUNT(*) AS n_terms,
        ROUND(SUM(CAST(tf AS DOUBLE)
                  * ln(CAST((SELECT n FROM n) + 1 AS DOUBLE) / (df + 1))), 4) AS tfidf
      FROM tf JOIN df USING (w)
      GROUP BY doc_id ORDER BY doc_id"""

  // ------------------------------------------------------ keyword extract

  /** Per-document top-3 keywords by TF-IDF — tx08's term statistics kept
    * at (doc, term) grain and ranked instead of summed. The per-term
    * score is a scalar product of two counts (no sum-order hazard), ties
    * pin on the term string, and the rank is a WindowGroupLimit on the
    * doc key — per-group state is 3 rows, so the window never
    * materializes a document's full vocabulary at any scale. */
  private def keywordExtract(s: SparkSession, d: String): DataFrame = {
    val docs = words(Tables.documents(s, d))
    val terms = docs
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy("w").agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(s, d).count()
    val byDoc = Window.partitionBy("doc_id").orderBy(desc("score"), asc("w"))
    terms
      .join(broadcast(dfreq), Seq("w"))
      .withColumn("score",
        col("tf").cast("double") * log(lit((nDocs + 1).toDouble) / (col("df") + 1)))
      .withColumn("rk", row_number().over(byDoc).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("w").as("term"), round(col("score"), 4).as("score"))
      .orderBy("doc_id", "rk")
  }

  private val keywordExtractOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      t AS (SELECT doc_id, unnest(ws) AS w FROM w),
      tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t GROUP BY 1, 2),
      df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      sc AS (
        SELECT doc_id, w,
               CAST(tf AS DOUBLE) * ln(CAST((SELECT n FROM n) + 1 AS DOUBLE) / (df + 1)) AS score
        FROM tf JOIN df USING (w)),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rk FROM sc)
      SELECT doc_id, rk, w AS term, ROUND(score, 4) AS score
      FROM r WHERE rk <= 3 ORDER BY doc_id, rk"""

  // --------------------------------------------- deterministic data split

  /** Reproducible train/val/test assignment by content hash — the
    * training-pipeline split that survives reshuffling, re-partitioning
    * and re-runs because it depends only on the row's content (80/10/10
    * on rollHash mod 100). Pure map-side; the output is the assignment. */
  private def detSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = graft.functions.hashfns.rollHash(col("text")) % 100
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split")
  }

  private val detSplitOracle: String = {
    val h = Hashing.duckRollHash("text", Hashing.P, "c0")
    s"""WITH b AS (SELECT doc_id, ($h) % 100 AS bucket FROM documents)
      SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
             COUNT(*) AS n_docs
      FROM b GROUP BY 1 ORDER BY 1"""
  }

  // ------------------------------------------------ repetition detection

  /** Gopher-style repetition filter signal: the fraction of a document's
    * word 3-grams that are repeats of an earlier 3-gram
    * (1 - distinct/total). Entirely map-side per-row array work — the
    * n-gram list never leaves the row, so at 100 TB this costs one scan
    * and shuffles only the final per-doc scalars for the output sort. */
  private def repetition(s: SparkSession, d: String): DataFrame =
    words(Tables.documents(s, d))
      .filter(size(col("ws")) >= 3)
      .select(
        col("doc_id"),
        expr("transform(sequence(1, size(ws) - 2), " +
          "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))")
          .as("grams"))
      .select(
        col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(array_distinct(col("grams"))).cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 4))
      .orderBy("doc_id")

  private val repetitionOracle =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (
        SELECT doc_id,
               list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]) AS grams
        FROM w WHERE len(ws) >= 3)
      SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
             CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
             ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 4) AS rep_ratio
      FROM g ORDER BY doc_id"""

  // --------------------------------------------------- PII-style redaction

  /** Redaction plumbing (the PII-scrub step of corpus cleaning): pattern
    * counts + global regexp replacement, all per-row codegen'd string work.
    * The testdata corpus has no natural emails/ids, so deterministic ones
    * are synthesized from doc_id first — the gate checks the regex
    * engine-pair (Java vs RE2) agrees on patterns restricted to their
    * common semantics (literal classes, +, {n,}; no backrefs). */
  private def redaction(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com id "), col("doc_id") * 7919).as("payload"))
      .select(
        col("doc_id"),
        size(expr("regexp_extract_all(payload, 'user[0-9]+@example\\\\.com', 0)"))
          .cast("long").as("n_emails"),
        size(expr("regexp_extract_all(payload, '\\\\b[0-9]{4,}\\\\b', 0)"))
          .cast("long").as("n_ids"),
        length(regexp_replace(regexp_replace(col("payload"),
          "user[0-9]+@example\\.com", "<EMAIL>"),
          "\\b[0-9]{4,}\\b", "<ID>"))
          .cast("long").as("redacted_len"))
      .orderBy("doc_id")

  private val redactionOracle =
    """WITH p AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com id ' || (doc_id * 7919) AS payload
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(payload, 'user[0-9]+@example\.com')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(payload, '\b[0-9]{4,}\b')) AS BIGINT) AS n_ids,
             CAST(length(regexp_replace(regexp_replace(payload,
               'user[0-9]+@example\.com', '<EMAIL>', 'g'),
               '\b[0-9]{4,}\b', '<ID>', 'g')) AS BIGINT) AS redacted_len
      FROM p ORDER BY doc_id"""

  // ---------------------------------------------- segment-level dedup

  /** Paragraph/segment-level dedup (the "remove boilerplate lines repeated
    * across the corpus" pass of corpus cleaning; the testdata corpus has no
    * newlines, so the segment unit is a deterministic 10-word chunk).
    * Per doc: chunk words into consecutive 10-word segments, hash each with
    * the shared rolling hash, count segment occurrences corpus-wide, and
    * report how much of the doc is corpus-duplicated material.
    *
    * Scale shape: segment hashing is map-side codegen ([[graft.functions.hashfns.rollHash]]);
    * the corpus-wide counts are ONE shuffle on a 8-byte long key with
    * map-side partial aggregation, and the count join back to segments is
    * an equi-join AQE can skew-split. No strings cross the wire after the
    * hash — at 100 TB the shuffle carries (long, long) pairs only. */
  private def segmentDedup(s: SparkSession, d: String): DataFrame = {
    val segs = words(Tables.documents(s, d))
      .filter(size(col("ws")) >= 10)
      .select(col("doc_id"),
        expr("transform(sequence(0, size(ws) div 10 - 1), " +
          "i -> concat_ws(' ', slice(ws, i*10+1, 10)))").as("segs"))
      .select(col("doc_id"), explode(col("segs")).as("seg"))
      .select(col("doc_id"), graft.functions.hashfns.rollHash(col("seg"), Hashing.P).as("h"))
    val counts = segs.groupBy("h").agg(count(lit(1)).as("cnt"))
    segs.join(counts, "h")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_seg"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_ratio", round(col("n_dup").cast("double") / col("n_seg"), 4))
      .orderBy("doc_id")
  }

  private val segmentDedupOracle: String = {
    val segHash = Hashing.duckRollHash("seg", Hashing.P)
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      s AS (
        SELECT doc_id,
               list_transform(range(0, len(ws) // 10),
                 i -> array_to_string(ws[i*10+1 : i*10+10], ' ')) AS segs
        FROM w WHERE len(ws) >= 10),
      e AS (SELECT doc_id, unnest(segs) AS seg FROM s),
      h AS (SELECT doc_id, $segHash AS h FROM e),
      c AS (SELECT h, count(*) AS cnt FROM h GROUP BY h)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seg,
             CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             ROUND(CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_ratio
      FROM h JOIN c USING (h) GROUP BY doc_id ORDER BY doc_id"""
  }

  // ------------------------------------------------- vocabulary coverage

  /** Zipf coverage curve: how much of the token stream the top-100 words
    * cover — the vocabulary-sizing metric a tokenizer-training pipeline
    * computes before fixing a vocab. One grouped count (the only shuffle),
    * then top-k; the cumulative sum runs over the 100 surviving rows only,
    * so the unpartitioned window is constant-size at any corpus scale.
    * Counts stay exact BIGINTs; the single coverage division happens once
    * per output row on exact integer inputs, identical IEEE in both
    * engines. */
  private def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = words(Tables.documents(s, d))
      .select(explode(col("ws")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    val top   = counts.orderBy(desc("cnt"), asc("word")).limit(100)
    val w     = Window.orderBy(desc("cnt"), asc("word"))
      .rowsBetween(Window.unboundedPreceding, 0)
    top
      .withColumn("rank", row_number().over(Window.orderBy(desc("cnt"), asc("word"))))
      .withColumn("cum_cnt", sum("cnt").over(w))
      .crossJoin(total)
      .select(col("rank").cast("long").as("rank"), col("word"), col("cnt"),
        col("cum_cnt"), round(col("cum_cnt") / col("total"), 6).as("coverage"))
      .orderBy("rank")
  }

  private val vocabCoverageOracle =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      c AS (SELECT word, COUNT(*) AS cnt FROM w WHERE word <> '' GROUP BY word),
      t AS (SELECT SUM(cnt) AS total FROM c),
      top AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word LIMIT 100),
      r AS (
        SELECT word, cnt,
               row_number() OVER (ORDER BY cnt DESC, word) AS rank,
               CAST(SUM(cnt) OVER (ORDER BY cnt DESC, word
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_cnt
        FROM top)
      SELECT CAST(rank AS BIGINT) AS rank, word, cnt, cum_cnt,
             ROUND(CAST(cum_cnt AS DOUBLE) / total, 6) AS coverage
      FROM r CROSS JOIN t ORDER BY rank"""

  // ------------------------------------------------- lexical diversity

  /** Type-token ratio per document, in integer basis points — the
    * vocabulary-richness gate a curation pipeline runs next to tx02's
    * surface-quality score (low TTR ⇒ template/spam text). Pure per-row
    * map over codegen'd array ops (split → array_distinct → size): no
    * shuffle at all, embarrassingly parallel at any corpus scale. */
  private def lexicalDiversity(s: SparkSession, d: String): DataFrame =
    words(Tables.documents(s, d))
      .select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(array_distinct(col("ws"))).cast("long").as("n_types"))
      .withColumn("ttr_bp", expr("n_types * 10000 div n_tokens"))
      .orderBy("doc_id")

  private val lexicalDiversityOracle =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(ws)) AS BIGINT) AS n_types,
             CAST(len(list_distinct(ws)) AS BIGINT) * 10000
               // CAST(len(ws) AS BIGINT) AS ttr_bp
      FROM w ORDER BY doc_id"""

  // ------------------------------------------------- char-trigram profile

  /** Top-10 character trigrams per language — the feature table a
    * statistical language identifier trains on (tx01 uses word markers;
    * this is the sub-word evidence). The trigram explode is map-side
    * codegen (`transform(sequence(...))`); one (lang, tri) shuffle, then
    * a per-lang WindowGroupLimit over a 5-partition key space. At 100 TB
    * the aggregate keyspace is |langs|×|trigram vocab| — bounded, so the
    * combine is map-side and the shuffle tiny. */
  private def trigramProfile(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perLang = Window.partitionBy("lang").orderBy(desc("cnt"), asc("tri"))
    Tables.spread(Tables.documents(s, d).select(col("lang"), col("text")))
      .select(col("lang"), explode(
        expr("transform(sequence(1, greatest(length(text) - 2, 0)), i -> substring(text, i, 3))")).as("tri"))
      .groupBy("lang", "tri").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(perLang).cast("long"))
      .filter(col("rank") <= 10)
      .select("lang", "rank", "tri", "cnt")
      .orderBy("lang", "rank")
  }

  private val trigramProfileOracle =
    """WITH g AS (
        SELECT lang, unnest(list_transform(range(1, greatest(length(text) - 2, 0) + 1),
                                           i -> substr(text, CAST(i AS INTEGER), 3))) AS tri
        FROM documents),
      c AS (SELECT lang, tri, COUNT(*) AS cnt FROM g GROUP BY lang, tri),
      r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tri) AS rank FROM c)
      SELECT lang, CAST(rank AS BIGINT) AS rank, tri, cnt
      FROM r WHERE rank <= 10 ORDER BY lang, rank"""

  // ------------------------------------------------- token burstiness

  /** Collection-frequency vs document-frequency dispersion for the top-30
    * tokens: bursty tokens (cf ≫ df) concentrate in few documents —
    * boilerplate and spam markers — while function words spread evenly.
    * One token explode + one grouped agg computing both counts in a
    * single pass (count + approx-free exact distinct via the doc-grain
    * pre-distinct), then a constant-size top-k. */
  private def burstiness(s: SparkSession, d: String): DataFrame = {
    val tok = words(Tables.documents(s, d))
      .select(col("doc_id"), explode(col("ws")).as("word"))
      .filter(col("word") =!= "")
    tok.groupBy("word")
      .agg(count(lit(1)).as("cf"), countDistinct("doc_id").as("df"))
      .withColumn("burst_bp", expr("cf * 10000 div df"))
      .orderBy(desc("cf"), asc("word")).limit(30)
      .orderBy(desc("cf"), asc("word"))
  }

  private val burstinessOracle =
    """WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      c AS (
        SELECT word, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
        FROM t WHERE word <> '' GROUP BY word)
      SELECT word, cf, df, cf * 10000 // df AS burst_bp
      FROM c ORDER BY cf DESC, word LIMIT 30"""

  // ------------------------------------------------ token-length profile

  /** Per-language token-length distribution: discrete p25/p50/p90 of
    * character lengths over the token stream plus the long-token tail
    * share in basis points — the shape a subword-tokenizer budget planner
    * reads per language (long-tailed token lengths ⇒ more splits per
    * word). Lengths are exact integers and percentiles discrete (the an42
    * no-interpolation discipline), so there is no float boundary. One
    * explode + one |langs|-key aggregate. */
  private def tokenLengthProfile(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables.documents(s, d).select(col("lang"), col("text")))
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("lang"), length(col("w")).cast("long").as("wlen"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_tokens"),
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY wlen) AS BIGINT)").as("p25_len"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY wlen) AS BIGINT)").as("p50_len"),
        expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY wlen) AS BIGINT)").as("p90_len"),
        sum(when(col("wlen") > 6L, 1L).otherwise(0L)).as("n_long"))
      .withColumn("long_bp", expr("n_long * 10000 div n_tokens"))
      .orderBy("lang")

  private val tokenLengthProfileOracle =
    """WITH w AS (
        SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      wl AS (
        SELECT lang, CAST(len(w) AS BIGINT) AS wlen FROM w WHERE w <> '')
      SELECT lang, COUNT(*) AS n_tokens,
             quantile_disc(wlen, 0.25) AS p25_len,
             quantile_disc(wlen, 0.5) AS p50_len,
             quantile_disc(wlen, 0.9) AS p90_len,
             CAST(SUM(CASE WHEN wlen > 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
             CAST(SUM(CASE WHEN wlen > 6 THEN 1 ELSE 0 END) AS BIGINT) * 10000
               // COUNT(*) AS long_bp
      FROM wl GROUP BY lang ORDER BY lang"""

  // ------------------------------------------------ code-switch detection

  /** Code-switching audit: docs whose marker evidence splits across TWO
    * languages (second-place score ≥ 20% of total marker hits) — mixed-
    * language documents break monolingual tokenizers and training mixes,
    * so a curation pipeline counts them per (primary, secondary) pair
    * before routing. Per-doc scores are tx01's map-only codegen'd array
    * filters; ranking explodes a constant 5 rows/doc, so the whole audit
    * is one doc-keyed window over bounded fanout + a ≤25-key rollup.
    * Shares are integer basis points. */
  private def codeSwitch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = Window.partitionBy("doc_id").orderBy(desc("score"), asc("lang"))
    val scored = words(Tables.documents(s, d))
      .select(col("doc_id") +: langMarkers.map { case (l, ms) =>
        size(filter(col("ws"), w => array_contains(typedLit(ms), w))).cast("long").as(s"s_$l")
      }: _*)
      .select(col("doc_id"), explode(expr(
        "map(" + langMarkers.map { case (l, _) => s"'$l', s_$l" }.mkString(", ") + ")"))
        .as(Seq("lang", "score")))
      .withColumn("rn", row_number().over(perDoc))
      .withColumn("total", sum("score").over(Window.partitionBy("doc_id")))
    val top = scored.filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("top_lang"), col("total"))
    val second = scored.filter(col("rn") === 2)
      .select(col("doc_id"), col("lang").as("second_lang"), col("score").as("s2"))
    top.join(second, Seq("doc_id"))
      .filter(col("total") > 0)
      .withColumn("mixed", when(expr("s2 * 10000 div total") >= 2000L, 1L).otherwise(0L))
      .groupBy("top_lang", "second_lang")
      .agg(count(lit(1)).as("n_docs"), sum("mixed").as("n_mixed"))
      .orderBy("top_lang", "second_lang")
  }

  private val codeSwitchOracle: String = {
    val values = langMarkers
      .map { case (l, ws) => s"('$l', [${sqlList(ws)}])" }
      .mkString(", ")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      langs(lang, wlist) AS (VALUES $values),
      scores AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(ws, x -> list_contains(wlist, x))) AS BIGINT) AS score
        FROM w CROSS JOIN langs),
      rk AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn,
               CAST(SUM(score) OVER (PARTITION BY doc_id) AS BIGINT) AS total
        FROM scores),
      t AS (SELECT doc_id, lang AS top_lang, total FROM rk WHERE rn = 1),
      s2 AS (SELECT doc_id, lang AS second_lang, score AS s2 FROM rk WHERE rn = 2)
      SELECT top_lang, second_lang, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN s2 * 10000 // total >= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed
      FROM t JOIN s2 USING (doc_id)
      WHERE total > 0
      GROUP BY 1, 2 ORDER BY top_lang, second_lang"""
  }

  // ---------------------------------------------------- hapax legomena

  /** Vocabulary-novelty audit: per source, the share of token occurrences
    * that are corpus-wide hapax legomena (words appearing exactly once) —
    * high hapax rates flag noisy/OCR-damaged sources, near-zero rates
    * flag templated ones. One explode feeding two aggregates: the global
    * word-frequency table (bounded by vocabulary) and the per-source
    * rollup joined against it. Integer basis points throughout. */
  private def hapaxRate(s: SparkSession, d: String): DataFrame = {
    val tok = graft.Tables.spread(Tables.documents(s, d).select(col("source"), col("text")))
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .persist()
    val freq = tok.groupBy("w").agg(count(lit(1)).as("cf"))
    tok.join(freq, Seq("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cf") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_bp", expr("n_hapax * 10000 div n_tokens"))
      .orderBy("source")
  }

  private val hapaxRateOracle =
    """WITH t AS (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      tf AS (SELECT source, w FROM t WHERE w <> ''),
      freq AS (SELECT w, COUNT(*) AS cf FROM tf GROUP BY w)
      SELECT source, COUNT(*) AS n_tokens,
             CAST(SUM(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             CAST(SUM(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS BIGINT) * 10000
               // COUNT(*) AS hapax_bp
      FROM tf JOIN freq USING (w)
      GROUP BY source ORDER BY source"""

  // ------------------------------------------------- collocation mining

  /** Top-20 bigram collocations by PMI-style lift: how much more often two
    * words appear adjacent than independence predicts,
    * `lift = P(a,b) / (P(a)·P(b)) = c_bi·N² / (M·c_a·c_b)`, emitted as an
    * exact integer scaled e4 (DECIMAL(38,0) intermediates on both engines,
    * floor division — no float anywhere, so Spark and DuckDB agree
    * bit-for-bit at any SF). Support floor c_bi ≥ 5 kills noise pairs, the
    * standard collocation-extraction recipe (Manning & Schütze ch. 5).
    *
    * Scale: the token stream reduces to vocabulary-sized count tables
    * (unigrams, bigram pairs) via map-side combine; the corpus totals are
    * 1-row broadcasts; the final top-20 ranks a |V|²-bounded aggregate,
    * so the only data-proportional work is the two count shuffles. */
  private def collocations(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val allDocs = words(Tables.documents(s, d)).persist()
    val toks = allDocs.select(explode(col("ws")).as("w"))
    val uni  = toks.groupBy("w").agg(count(lit(1)).as("c_uni"))
    val bigrams = allDocs.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c_bi"))
      .filter(col("c_bi") >= 5)
    val nTok = toks.agg(count(lit(1)).as("n_tok"))
    val mBi  = bigrams.agg(count(lit(1)).as("m_bi"))
    val ranked = bi
      .join(broadcast(uni.select(col("w").as("w1"), col("c_uni").as("c_a"))), Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("c_uni").as("c_b"))), Seq("w2"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(mBi))
      .withColumn("lift_e4",
        expr("""CAST(CAST(c_bi AS DECIMAL(38,0)) * n_tok * n_tok * 10000
                div (CAST(m_bi AS DECIMAL(38,0)) * c_a * c_b) AS BIGINT)"""))
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("lift_e4"), asc("w1"), asc("w2"))).cast("long"))
      .filter(col("rank") <= 20)
      .select("rank", "w1", "w2", "c_bi", "lift_e4")
      .orderBy("rank")
    ranked
  }

  private val collocationsOracle =
    """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
      bg AS (
        SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
               unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
        FROM w WHERE len(ws) >= 2),
      uni AS (SELECT u.w AS w, COUNT(*) AS c_uni
              FROM (SELECT unnest(ws) AS w FROM w) u GROUP BY 1),
      tot AS (SELECT (SELECT COUNT(*) FROM (SELECT unnest(ws) FROM w)) AS n_tok,
                     (SELECT COUNT(*) FROM bg) AS m_bi),
      bi AS (SELECT w1, w2, COUNT(*) AS c_bi FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      scored AS (
        SELECT w1, w2, c_bi,
               CAST(CAST(c_bi AS HUGEINT) * n_tok * n_tok * 10000
                    // (CAST(m_bi AS HUGEINT) * a.c_uni * b.c_uni) AS BIGINT) AS lift_e4
        FROM bi
        JOIN uni a ON a.w = bi.w1
        JOIN uni b ON b.w = bi.w2
        CROSS JOIN tot),
      r AS (SELECT *, row_number() OVER (ORDER BY lift_e4 DESC, w1, w2) AS rank
            FROM scored)
      SELECT CAST(rank AS BIGINT) AS rank, w1, w2, c_bi, lift_e4
      FROM r WHERE rank <= 20 ORDER BY rank"""

  // ------------------------------- importance weights (DSIR-style resample)

  /** Data-selection importance weights, the hashed-n-gram importance-
    * resampling idea (Xie et al., DSIR) reduced to its exact-integer core:
    * with English as the target distribution and the whole corpus as the
    * source, every word gets an importance ratio tgt_count/src_count in
    * half-up basis points, and every document scores the mean ratio of its
    * tokens — documents whose vocabulary looks target-like float up, and
    * a deterministic resampler (pp06's salted-hash pattern) would keep
    * docs proportionally to this score. All integer: ratio_bp and the
    * per-doc mean are half-up divisions, so both engines agree exactly.
    * Shape at 100 TB: one map-side explode, two word-keyed grouped counts
    * (map-combinable), one join of doc-words against the ratio table
    * (broadcast while vocab fits, shuffle-on-word beyond), one doc-keyed
    * sum — all linear, no driver state. */
  private def importanceWeights(s: SparkSession, d: String): DataFrame = {
    val w = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("wd"))
    val src = w.groupBy("wd").agg(count(lit(1)).as("sc"))
    val tgt = w.filter(col("lang") === "en").groupBy("wd").agg(count(lit(1)).as("tc"))
    val ratio = src.join(tgt, Seq("wd"), "left")
      .select(col("wd"),
        expr("(2 * coalesce(tc, 0) * 10000 + sc) DIV (2 * sc)").as("ratio_bp"))
    w.join(ratio, "wd")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("ratio_bp").as("score"))
      .select(col("doc_id"), col("n_tokens"),
        expr("(2 * score + n_tokens) DIV (2 * n_tokens)").as("score_per_tok_bp"))
      .orderBy("doc_id")
  }

  private val importanceWeightsOracle =
    """WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS wd FROM documents),
      src AS (SELECT wd, COUNT(*) AS sc FROM w GROUP BY 1),
      tgt AS (SELECT wd, COUNT(*) AS tc FROM w WHERE lang = 'en' GROUP BY 1),
      ratio AS (
        SELECT s.wd, (2 * COALESCE(t.tc, 0) * 10000 + s.sc) // (2 * s.sc) AS ratio_bp
        FROM src s LEFT JOIN tgt t USING (wd)),
      pd AS (
        SELECT w.doc_id, COUNT(*) AS n_tokens, SUM(r.ratio_bp) AS score
        FROM w JOIN ratio r USING (wd) GROUP BY 1)
      SELECT doc_id, n_tokens,
             CAST((2 * score + n_tokens) // (2 * n_tokens) AS BIGINT) AS score_per_tok_bp
      FROM pd ORDER BY doc_id"""

  // ---------------------------------------- n-gram novelty (corpus growth)

  /** Per-document n-gram NOVELTY: the share of a doc's distinct word-3-gram
    * shingles whose global first occurrence (min doc_id over all docs
    * containing the shingle) is the doc itself. This is the marginal-
    * information curve a streaming corpus build watches — novelty collapses
    * exactly where dedup should fire, without computing any pairs. Shape:
    * one map-side shingle explode, one shingle-keyed min aggregation
    * (map-combinable), one join back, one doc-keyed count — all linear in
    * corpus shingles; the shingle-frequency skew risk is the same as
    * dd02's and handled the same way (AQE skew join). */
  private def ngramNovelty(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.spread(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), graft.functions.hashfns.wordShingles(col("text"), 3).as("shs"))
      .filter(size(col("shs")) >= 1)
      .select(col("doc_id"), explode(col("shs")).as("sg"))
    val first = sh.groupBy("sg").agg(min("doc_id").as("first_doc"))
    sh.join(first, "sg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("n_novel * 10000 div n_shingles").as("novelty_bp"))
      .orderBy("doc_id")
  }

  private val ngramNoveltyOracle =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS shs
        FROM w WHERE len(ws) >= 3),
      e AS (SELECT doc_id, unnest(shs) AS sg FROM sh),
      f AS (SELECT sg, MIN(doc_id) AS first_doc FROM e GROUP BY 1),
      pd AS (
        SELECT e.doc_id, COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        FROM e JOIN f USING (sg) GROUP BY 1)
      SELECT doc_id, n_shingles, n_novel,
             n_novel * 10000 // n_shingles AS novelty_bp
      FROM pd ORDER BY doc_id"""

  def all: Seq[Q] = Seq(
    Q("tx01_lang_id", langId, Some(langIdOracle)),
    Q("tx02_quality", quality, Some(qualityOracle)),
    Q("tx03_token_count", tokenCount, Some(tokenCountOracle)),
    Q("tx04_fingerprint", fingerprint, Some(fingerprintOracle)),
    Q("tx05_bloom_digest", bloom, Some(bloomOracle)),
    Q("tx06_bigram_lm", bigramLm, Some(bigramLmOracle)),
    Q("tx07_det_split", detSplit, Some(detSplitOracle)),
    Q("tx08_tfidf", tfidf, Some(tfidfOracle)),
    Q("tx16_keyword_extract", keywordExtract, Some(keywordExtractOracle)),
    Q("tx17_lang_confusion", langConfusion, Some(langConfusionOracle)),
    Q("tx09_repetition", repetition, Some(repetitionOracle)),
    Q("tx10_redaction", redaction, Some(redactionOracle)),
    Q("tx11_segment_dedup", segmentDedup, Some(segmentDedupOracle)),
    Q("tx12_vocab_coverage", vocabCoverage, Some(vocabCoverageOracle)),
    Q("tx13_perplexity_cut", perplexityCut, Some(perplexityCutOracle)),
    Q("tx14_boilerplate", boilerplate, Some(boilerplateOracle)),
    Q("tx15_char_entropy", charEntropy, Some(charEntropyOracle)),
    Q("tx18_lexical_diversity", lexicalDiversity, Some(lexicalDiversityOracle)),
    Q("tx19_trigram_profile", trigramProfile, Some(trigramProfileOracle)),
    Q("tx20_burstiness", burstiness, Some(burstinessOracle)),
    Q("tx21_token_length_profile", tokenLengthProfile, Some(tokenLengthProfileOracle)),
    Q("tx22_code_switch", codeSwitch, Some(codeSwitchOracle)),
    Q("tx23_hapax_rate", hapaxRate, Some(hapaxRateOracle)),
    Q("tx24_collocations", collocations, Some(collocationsOracle)),
    Q("tx25_bpe_pairs", bpePairs, Some(bpePairsOracle)),
    Q("tx29_bpe_apply", bpeApply, Some(bpeApplyOracle)),
    Q("tx30_zipf_slope", zipfSlope, Some(zipfSlopeOracle)),
    Q("tx31_lang_diversity", langDiversity, Some(langDiversityOracle)),
    Q("tx26_lang_profile_overlap", langProfileOverlap, Some(langProfileOverlapOracle)),
    Q("tx27_importance_weights", importanceWeights, Some(importanceWeightsOracle)),
    Q("tx28_ngram_novelty", ngramNovelty, Some(ngramNoveltyOracle))
  )

  /** Pairwise Jaccard overlap between the languages' top-50 character-
    * trigram sets (tx19's feature table turned into a confusability
    * matrix): two languages whose profiles overlap heavily are the pairs
    * a statistical lang-id will confuse — this ranks WHICH confusions
    * tx17's matrix should be watched for. Everything after the one
    * (lang, tri) count shuffle operates on a ≤250-row aggregate; the
    * pair join is 5×5-bounded, exact integer basis points. */
  private def langProfileOverlap(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perLang = Window.partitionBy("lang").orderBy(desc("cnt"), asc("tri"))
    val top = Tables.spread(Tables.documents(s, d).select(col("lang"), col("text")))
      .select(col("lang"), explode(
        expr("transform(sequence(1, greatest(length(text) - 2, 0)), i -> substring(text, i, 3))")).as("tri"))
      .groupBy("lang", "tri").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(perLang))
      .filter(col("rn") <= 50)
      .select("lang", "tri")
      .persist()
    val sizes = top.groupBy("lang").agg(count(lit(1)).as("sz"))
    top.as("a")
      .join(top.as("b"), col("a.tri") === col("b.tri") && col("a.lang") < col("b.lang"))
      .groupBy(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("lang").as("lang_a"), col("sz").as("sz_a"))), Seq("lang_a"))
      .join(broadcast(sizes.select(col("lang").as("lang_b"), col("sz").as("sz_b"))), Seq("lang_b"))
      .select(col("lang_a"), col("lang_b"), col("n_shared"),
        expr("n_shared * 10000 div (sz_a + sz_b - n_shared)").as("jac_bp"))
      .orderBy("lang_a", "lang_b")
  }

  private val langProfileOverlapOracle =
    """WITH tri AS (
        SELECT lang,
               unnest(list_transform(range(1, greatest(len(text) - 2, 0) + 1),
                                     i -> substr(text, CAST(i AS INT), 3))) AS tri
        FROM documents),
      c AS (SELECT lang, tri, COUNT(*) AS cnt FROM tri GROUP BY 1, 2),
      top AS (
        SELECT lang, tri FROM (
          SELECT lang, tri,
                 row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tri) AS rn
          FROM c) WHERE rn <= 50),
      sz AS (SELECT lang, COUNT(*) AS sz FROM top GROUP BY lang),
      p AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS n_shared
        FROM top a JOIN top b ON a.tri = b.tri AND a.lang < b.lang
        GROUP BY 1, 2)
      SELECT lang_a, lang_b, n_shared,
             CAST(n_shared * 10000 // (sa.sz + sb.sz - n_shared) AS BIGINT) AS jac_bp
      FROM p
      JOIN sz sa ON sa.lang = p.lang_a
      JOIN sz sb ON sb.lang = p.lang_b
      ORDER BY lang_a, lang_b"""

  /** One BPE training step: the corpus-wide frequency of every adjacent
    * character pair inside words, top-10 by count — exactly the statistic
    * byte-pair-encoding greedily merges on (Sennrich et al.; tx03's
    * `(len+3) div 4` sub-word estimate assumes such a tokenizer exists,
    * this is how it gets built). The pair fan-out is per-row codegen
    * (`transform(sequence(...))`), the count shuffles a character-bigram
    * keyspace — alphabet²-bounded, so map-side combine does nearly all
    * the work at any corpus size. */
  private def bpePairs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCnt = Window.orderBy(desc("cnt"), asc("pair"))
    words(Tables.documents(s, d))
      .select(explode(col("ws")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(byCnt).cast("long"))
      .filter(col("rank") <= 10)
      .select("rank", "pair", "cnt")
      .orderBy("rank")
  }

  /** tx31: per-source language diversity as the GINI-SIMPSON index —
    * 1 − Σ shareᵢ², the probability two random docs differ in language.
    * Shannon entropy needs logs (floats); Gini-Simpson is the standard
    * diversity index that stays EXACT: with per-(source, lang) counts n
    * and source total N, the index in bp is
    * (N² − Σn²)·10000 / N² half-up. Tells which sources are monolingual
    * silos vs mixed — the mixture-design input next to pp03/pp08. One
    * (source, lang) aggregate; everything after is ≤ sources×langs rows. */
  private def langDiversity(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.spread(Tables.documents(s, d).select(col("source"), col("lang")))
      .groupBy("source", "lang").agg(count(lit(1)).as("n"))
    counts.groupBy("source")
      .agg(count(lit(1)).as("n_langs"),
        sum("n").as("n_docs"),
        sum(col("n") * col("n")).as("sq"))
      .select(col("source"), col("n_langs"), col("n_docs"),
        expr("""(2 * (n_docs * n_docs - sq) * 10000 + (n_docs * n_docs))
                DIV (2 * (n_docs * n_docs))""").cast("bigint").as("diversity_bp"))
      .orderBy("source")
  }

  private val langDiversityOracle =
    """WITH c AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
      g AS (
        SELECT source, COUNT(*) AS n_langs, SUM(n) AS n_docs, SUM(n * n) AS sq
        FROM c GROUP BY 1)
      SELECT source, CAST(n_langs AS BIGINT) AS n_langs,
             CAST(n_docs AS BIGINT) AS n_docs,
             CAST((2 * (n_docs * n_docs - sq) * 10000 + (n_docs * n_docs))
                  // (2 * (n_docs * n_docs)) AS BIGINT) AS diversity_bp
      FROM g ORDER BY source"""

  /** tx30: Zipf-law slope of the token frequency distribution, EXACTLY.
    * Logs normally force floating point; instead both rank and frequency
    * drop to integer floor(log2) via binary-representation length
    * (`length(bin(x)) - 1` in Spark, `length(format('{:b}', x)) - 1` in
    * DuckDB — bit-exact in both), and the slope of ilog2(freq) over
    * ilog2(rank) comes from the an72 five-sums regression in half-up
    * basis points. A Zipfian corpus reads ≈ −10000 bp (slope −1); a
    * uniform synthetic one reads near 0 — the standard naturalness check
    * on a training corpus. One (token) count shuffle; the regression runs
    * on the top-1024 rows. */
  private def zipfSlope(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byFreq = Window.orderBy(desc("cnt"), asc("w"))
    val ranked = words(Tables.documents(s, d))
      .select(explode(col("ws")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(byFreq).cast("long"))
      .filter(col("rank") <= 1024)
      .select(
        (length(bin(col("rank"))) - 1).cast("long").as("xq"),
        (length(bin(col("cnt"))) - 1).cast("long").as("yq"))
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    ranked.groupBy()
      .agg(count(lit(1)).as("n"),
        sum(big(col("xq"))).as("sx"), sum(big(col("yq"))).as("sy"),
        sum(big(col("xq")) * big(col("yq"))).as("sxy"),
        sum(big(col("xq")) * big(col("xq"))).as("sxx"))
      .select(col("n"),
        expr("""CASE WHEN (n * sxy - sx * sy) >= 0
          THEN (2 * (n * sxy - sx * sy) * 10000 + (n * sxx - sx * sx)) DIV (2 * (n * sxx - sx * sx))
          ELSE -((2 * (-(n * sxy - sx * sy)) * 10000 + (n * sxx - sx * sx)) DIV (2 * (n * sxx - sx * sx)))
          END""").cast("bigint").as("zipf_slope_bp"))
  }

  private val zipfSlopeOracle =
    """WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      c AS (SELECT w, COUNT(*) AS cnt FROM w WHERE len(w) >= 1 GROUP BY w),
      r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank FROM c),
      q AS (
        SELECT CAST(length(format('{:b}', rank)) - 1 AS HUGEINT) AS xq,
               CAST(length(format('{:b}', cnt)) - 1 AS HUGEINT) AS yq
        FROM r WHERE rank <= 1024),
      g AS (
        SELECT COUNT(*) AS n, SUM(xq) AS sx, SUM(yq) AS sy,
               SUM(xq * yq) AS sxy, SUM(xq * xq) AS sxx
        FROM q)
      SELECT n,
             CAST(CASE WHEN (n * sxy - sx * sy) >= 0
               THEN (2 * (n * sxy - sx * sy) * 10000 + (n * sxx - sx * sx)) // (2 * (n * sxx - sx * sx))
               ELSE -((2 * (-(n * sxy - sx * sy)) * 10000 + (n * sxx - sx * sx)) // (2 * (n * sxx - sx * sx)))
               END AS BIGINT) AS zipf_slope_bp
      FROM g"""

  /** tx29: APPLIED byte-pair encoding — tx25's pair statistic iterated 5
    * greedy merge rounds (highest count, ties to the lexically smaller
    * pair) and the corpus RE-TOKENIZED with the learned merges, reporting
    * the merge sequence and the real post-merge token total each round
    * (the counts pp18/pp02's budgets actually want, instead of whitespace
    * splits).
    *
    * Representation trick that makes the greedy merge SQL-expressible in
    * both engines: every token is wrapped in its own delimiters —
    * "hello" → `|h||e||l||l||o|` — so a LITERAL non-overlapping
    * `replace(s, "|A||B|", "|AB|")` is exactly the left-to-right greedy
    * BPE merge: a match consumes both tokens' delimiters whole, partial-
    * token suffix matches are impossible (the char before a token head is
    * always `|`), and repeated runs (`aaaa` under merge `a a`) pair up
    * left-to-right like real BPE. Spark `replace` and DuckDB `replace`
    * share the scan-original non-overlap contract, so the twins agree
    * bit-for-bit. The initial char split uses `([\s\S])` so newline
    * bytes are wrapped identically under Java regex and RE2.
    *
    * Scale: each round is one alphabet²-bounded pair count (map-side
    * combine does nearly all work) + one codegen'd per-row replace; the
    * driver holds ONE (pair, count) row per round — BPE training is
    * inherently sequential in the merge rank, the corpus passes are not. */
  private val bpeRounds = 5

  private def bpeApply(s: SparkSession, d: String): DataFrame = {
    val w0 = words(Tables.documents(s, d))
      .select(explode(col("ws")).as("w"))
      .filter(length(col("w")) >= 1)
      .select(regexp_replace(col("w"), "([\\s\\S])", "|$1|").as("t"))
    val tokCol  = expr("split(substring(t, 2, length(t) - 2), '\\\\|\\\\|')")
    val pairCol = expr(
      "transform(sequence(1, size(tk) - 1), " +
        "i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")
    def tokenTotal(df: DataFrame): Long =
      df.select(sum(size(tokCol)).as("n")).head().getLong(0)
    // each round's state is persisted so the pair count and token total
    // read materialized data instead of replaying the replace chain from
    // the raw corpus (O(k) passes per action otherwise)
    var cur = w0.persist()
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, Long)](
      (0L, "(chars)", tokenTotal(cur)))
    for (k <- 1 to bpeRounds) {
      val top = cur
        .select(tokCol.as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(explode(pairCol).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("pair"))
        .head()
      val pair          = top.getString(0)
      val Array(a, b)   = pair.split(' ')
      val prev = cur
      cur = cur.withColumn("t",
        org.apache.spark.sql.functions.replace(
          col("t"), lit(s"|$a||$b|"), lit(s"|$a$b|"))).persist()
      out += ((k.toLong, pair, tokenTotal(cur)))
      prev.unpersist(blocking = false)
    }
    cur.unpersist(blocking = false)
    import s.implicits._
    out.toSeq.toDF("rank", "pair", "tokens").orderBy("rank")
  }

  private val bpeApplyOracle = {
    // identical algorithm, unrolled: t0 = char-delimited words, then per
    // round K: pair counts pK -> 1-row argmax mK -> merged tK
    val rounds = (1 to bpeRounds).map { k =>
      s"""tk$k AS (SELECT string_split(substr(t, 2, len(t) - 2), '||') AS tk FROM t${k - 1}),
      p$k AS (
        SELECT unnest(list_transform(range(1, len(tk)),
                                     i -> tk[i] || ' ' || tk[i + 1])) AS pair
        FROM tk$k WHERE len(tk) >= 2),
      m$k AS (
        SELECT pair FROM (SELECT pair, COUNT(*) AS cnt FROM p$k GROUP BY 1)
        ORDER BY cnt DESC, pair LIMIT 1),
      t$k AS (
        SELECT replace(x.t,
                 '|' || split_part(m.pair, ' ', 1) || '||' || split_part(m.pair, ' ', 2) || '|',
                 '|' || replace(m.pair, ' ', '') || '|') AS t
        FROM t${k - 1} x, m$k m),
      s$k AS (
        SELECT CAST($k AS BIGINT) AS rank, (SELECT pair FROM m$k) AS pair,
               CAST(SUM(len(string_split(substr(t, 2, len(t) - 2), '||'))) AS BIGINT) AS tokens
        FROM t$k)"""
    }.mkString(",\n      ")
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      t0 AS (
        SELECT regexp_replace(w, '([\\s\\S])', '|\\1|', 'g') AS t
        FROM w WHERE len(w) >= 1),
      s0 AS (
        SELECT CAST(0 AS BIGINT) AS rank, '(chars)' AS pair,
               CAST(SUM(len(string_split(substr(t, 2, len(t) - 2), '||'))) AS BIGINT) AS tokens
        FROM t0),
      $rounds
      SELECT rank, pair, tokens FROM (
        ${(0 to bpeRounds).map(k => s"SELECT * FROM s$k").mkString(" UNION ALL ")}
      ) ORDER BY rank"""
  }

  private val bpePairsOracle =
    """WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      p AS (
        SELECT unnest(list_transform(range(1, len(w)), i -> substr(w, CAST(i AS INT), 2))) AS pair
        FROM w WHERE len(w) >= 2),
      c AS (SELECT pair, COUNT(*) AS cnt FROM p GROUP BY pair),
      r AS (SELECT pair, cnt,
                   row_number() OVER (ORDER BY cnt DESC, pair) AS rank
            FROM c)
      SELECT CAST(rank AS BIGINT) AS rank, pair, cnt
      FROM r WHERE rank <= 10 ORDER BY rank"""
}
