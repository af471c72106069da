package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication surface over the `documents` table —
  * the LLM-training-pipeline operators (builder brief; VERDICT.md round-1
  * item 4/6): tokenization, quality scoring, language-ID heuristic,
  * fingerprinting, exact dedup, and exact n-gram-shingle Jaccard
  * near-dup verification (the verify stage that MinHash-LSH candidates
  * feed at scale; see graft.llm.MinHashDedup for the candidate stage).
  *
  * All functions here are Spark built-ins (codegen'd); no UDFs.
  * Determinism notes as in [[Relational]]: integer-derived doubles and
  * IEEE division are bit-identical across engines.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  import Exact.dec

  /** words of a document, split on single spaces (the corpus separator) */
  private val words: Column = split(col("text"), " ")

  // --- token counting ---------------------------------------------------
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        size(words).cast("long").as("n_tokens"),
        size(array_distinct(words)).cast("long").as("n_unique_tokens"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  val tokenCountSql: String =
    """SELECT doc_id,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
      | n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- corpus stats by language ------------------------------------------
  def statsByLang(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(dec(col("n_chars"))).cast("double") / count(lit(1))).as("avg_chars"),
        sum(size(words).cast("long")).as("total_tokens"))
      .orderBy(col("lang"))

  val statsByLangSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      | CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_chars,
      | CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // --- quality scoring -----------------------------------------------------
  /** Cheap quality signals: token diversity, vowel ratio, mean token
    * length — the length/punct/stopword-ratio family (all built-ins).
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        size(words).cast("long").as("n_tokens"),
        (size(array_distinct(words)).cast("double") / size(words))
          .as("token_diversity"),
        (length(regexp_replace(col("text"), "[^aeiou]", "")).cast("double")
          / col("n_chars")).as("vowel_ratio"),
        ((col("n_chars") - size(words) + lit(1)).cast("double") / size(words))
          .as("mean_token_len"))
      .orderBy(col("doc_id"))

  val qualityScoreSql: String =
    """SELECT doc_id,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      | CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |   / len(string_split(text, ' ')) AS token_diversity,
      | CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS DOUBLE)
      |   / n_chars AS vowel_ratio,
      | CAST(n_chars - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |   / len(string_split(text, ' ')) AS mean_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- quality-filter cascade ------------------------------------------------
  /** Cumulative survival counts through a Gopher/C4-style quality
    * filter cascade — the governance report a cleaning pipeline emits
    * so mixture designers can see WHERE documents die: each stage's
    * predicate is integer/string arithmetic on the row (no fp
    * thresholds that could flip between engines), stages are
    * cumulative (a doc must pass all earlier ones), and the whole
    * funnel is ONE scan folding to four counters — at 100 TB the
    * report costs a single pass regardless of stage count.
    */
  def qualityFunnel(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(words)
    val s1 = col("n_chars") >= 200L
    val s2 = nTok >= 30
    // mean token length in [3, 12]: integer cross-multiplied, no division
    val meanOk = (col("n_chars") - nTok + 1) >= nTok * 3 &&
      (col("n_chars") - nTok + 1) <= nTok * 12
    val flags = docs(s, dir).select(
      when(s1, 1L).otherwise(0L).as("f1"),
      when(s1 && s2, 1L).otherwise(0L).as("f2"),
      when(s1 && s2 && meanOk, 1L).otherwise(0L).as("f3"))
    flags.agg(count(lit(1)).as("n0"), sum(col("f1")).as("n1"),
        sum(col("f2")).as("n2"), sum(col("f3")).as("n3"))
      .select(expr(
        "stack(4, '0_all', n0, '1_min_chars', n1, " +
          "'2_min_tokens', n2, '3_token_len_band', n3) AS (stage, n_docs)"))
      .orderBy(col("stage"))
  }

  val qualityFunnelSql: String =
    """WITH f AS (
      |  SELECT
      |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS f1,
      |    CASE WHEN n_chars >= 200
      |          AND len(string_split(text, ' ')) >= 30 THEN 1 ELSE 0 END AS f2,
      |    CASE WHEN n_chars >= 200
      |          AND len(string_split(text, ' ')) >= 30
      |          AND n_chars - len(string_split(text, ' ')) + 1
      |              >= len(string_split(text, ' ')) * 3
      |          AND n_chars - len(string_split(text, ' ')) + 1
      |              <= len(string_split(text, ' ')) * 12
      |         THEN 1 ELSE 0 END AS f3
      |  FROM documents),
      |t AS (SELECT COUNT(*) AS n0, CAST(SUM(f1) AS BIGINT) AS n1,
      |             CAST(SUM(f2) AS BIGINT) AS n2, CAST(SUM(f3) AS BIGINT) AS n3
      |      FROM f)
      |SELECT stage, n_docs FROM (
      |  SELECT '0_all' AS stage, n0 AS n_docs FROM t
      |  UNION ALL SELECT '1_min_chars', n1 FROM t
      |  UNION ALL SELECT '2_min_tokens', n2 FROM t
      |  UNION ALL SELECT '3_token_len_band', n3 FROM t)
      |ORDER BY stage""".stripMargin

  // --- character entropy ----------------------------------------------------
  /** Per-document Shannon CHARACTER entropy — the classic cheap gibberish
    * / boilerplate detector (uniform noise scores high, repeated
    * boilerplate scores low) that complements the token-level signals in
    * [[qualityScore]] and the model-based [[perplexity]].
    *
    * Hash-exact across engines by the integer-micronat discipline:
    * H·n·1e6 = n·lnµ(n) − Σ_c k_c·lnµ(k_c) where lnµ(x) =
    * round(ln(x)·1e6) per term (counts stay far inside the
    * exhaustively-verified [1, 2e7] ln-parity domain), so
    * `entropy_micronats` is an exact BIGINT and the reported
    * `entropy_nats` is ONE IEEE division of bit-identical inputs.
    *
    * Shape at scale: explode → (doc, char)-keyed partial counts
    * (map-side combine bounds each partition's contribution by
    * |alphabet|·docs), then a doc-keyed aggregation — two narrow
    * exchanges, the text itself never crosses a shuffle.
    */
  def charEntropy(s: SparkSession, dir: String): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= "")
      .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("k"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n"),
        sum(col("k") * lnMicro(col("k"))).as("s"))
      .select(col("doc_id"), col("n").as("n_chars_text"),
        (col("n") * lnMicro(col("n")) - col("s")).as("entropy_micronats"),
        ((col("n") * lnMicro(col("n")) - col("s")).cast("double")
          / (col("n").cast("double") * lit(1e6))).as("entropy_nats"))
      .orderBy(col("doc_id"))
  }

  val charEntropySql: String =
    """WITH ch AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
      |cnt AS (
      |  SELECT doc_id, c, COUNT(*) AS k FROM ch WHERE c <> '' GROUP BY doc_id, c),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n,
      |    CAST(SUM(k * CAST(round(ln(CAST(k AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) AS s
      |  FROM cnt GROUP BY doc_id)
      |SELECT doc_id, n AS n_chars_text,
      |  n * CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) - s AS entropy_micronats,
      |  CAST(n * CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) - s AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * 1e6) AS entropy_nats
      |FROM agg ORDER BY doc_id""".stripMargin

  // --- language-ID heuristic ----------------------------------------------
  /** Marker-word language guess (n-gram-heuristic stand-in), reported as a
    * (labeled lang × guessed lang) confusion matrix.
    */
  def langGuessConfusion(s: SparkSession, dir: String): DataFrame = {
    val guess = when(col("text").contains("the"), "en")
      .when(col("text").contains("la"), "es")
      .otherwise("other")
    docs(s, dir)
      .groupBy(col("lang"), guess.as("lang_guess"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_guess"))
  }

  val langGuessConfusionSql: String =
    """SELECT lang,
      | CASE WHEN contains(text, 'the') THEN 'en'
      |      WHEN contains(text, 'la') THEN 'es'
      |      ELSE 'other' END AS lang_guess,
      | COUNT(*) AS n
      |FROM documents GROUP BY 1, 2 ORDER BY lang, lang_guess""".stripMargin

  // --- BPE-ish regex tokenization ------------------------------------------
  /** GPT-2-style pre-tokenizer token count: contractions, letter runs,
    * digit runs, punctuation runs (RE2-compatible — no lookahead — so
    * Spark's Java regex and DuckDB's RE2 agree).
    */
  private val bpeish = "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  def tokenCountBpe(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(bpeish), lit(0)))
          .cast("long").as("n_bpeish_tokens"),
        size(array_distinct(regexp_extract_all(col("text"), lit(bpeish), lit(0))))
          .cast("long").as("n_unique_bpeish"))
      .orderBy(col("doc_id"))

  val tokenCountBpeSql: String =
    """SELECT doc_id,
      | CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS BIGINT) AS n_bpeish_tokens,
      | CAST(len(list_distinct(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+'))) AS BIGINT) AS n_unique_bpeish
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- tokenizer fertility ----------------------------------------------------
  /** Tokenizer FERTILITY by language — BPE-ish tokens per whitespace
    * word (Rust et al., "How Good is Your Tokenizer?", ACL 2021): the
    * standard multilingual-tokenizer health metric (fertility ≫ 1 for
    * a language means its text costs disproportionate sequence length,
    * the read behind per-language compute budgeting). Uses the same
    * GPT-2-style pre-tokenizer regex as [[tokenCountBpe]] so the two
    * reports agree on what a token is.
    *
    * Exactness: both token counts are exact BIGINT sums; fertility is
    * one IEEE division. One map-side-combined fold to the |langs| grid.
    */
  def tokenizerFertility(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), size(words).cast("long").as("w"),
        size(regexp_extract_all(col("text"), lit(bpeish), lit(0)))
          .cast("long").as("t"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("total_words"),
        sum(col("t")).as("total_bpeish"))
      .select(col("lang"), col("n_docs"), col("total_words"),
        col("total_bpeish"),
        (col("total_bpeish").cast("double") / col("total_words").cast("double"))
          .as("fertility"))
      .orderBy(col("lang"))

  val tokenizerFertilitySql: String =
    """WITH g AS (
      |  SELECT lang, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
      |    CAST(SUM(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+'))) AS BIGINT) AS total_bpeish
      |  FROM documents GROUP BY lang)
      |SELECT lang, n_docs, total_words, total_bpeish,
      |  CAST(total_bpeish AS DOUBLE) / CAST(total_words AS DOUBLE) AS fertility
      |FROM g ORDER BY lang""".stripMargin

  // --- distinct-n diversity ----------------------------------------------------
  /** Distinct-n-gram diversity per source for n = 1..4 (the distinct-1/
    * distinct-2 metric of Li et al., NAACL 2016, extended two orders) —
    * the corpus-diversity read a data-mixing run checks per source: a
    * source whose distinct-4 ratio collapses is template spam even when
    * its unigram diversity looks healthy. Complements
    * [[repetitionStats]] (within-doc) and `text_ngram_novelty`
    * (cross-doc): this is the per-source aggregate diversity.
    *
    * Shape: ONE scan of documents; words posexplode once and the four
    * gram orders come from THREE lead() windows (per-doc partitions —
    * the high-cardinality legitimate class) hashed with multi-arg
    * xxhash64 — every operator stays inside whole-stage codegen. The
    * first HOF spelling (transform + slice + array_join per gram) ran
    * INTERPRETED and cost 9.7 task-CPU-s at sf0.1 — the registry's
    * slowest query — vs well under 1 s for this one; the lesson is the
    * same class as the Gopher posexplode note: per-row array surgery
    * belongs in codegen'd leads, not lambda forests. Gram identity is
    * the 64-bit hash of the word TUPLE (no join-string ambiguity, no
    * string shuffle): a distinct-count collision needs two of ~1e6
    * grams to share 64 bits (~3e-8 corpus-wide — the dedupNgramJaccard
    * precedent), while the oracle counts the exact strings. Ratios are
    * one IEEE division of exact BIGINTs.
    */
  def ngramDiversity(s: SparkSession, dir: String): DataFrame = {
    val wnd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = docs(s, dir)
      .select(col("source"), col("doc_id"), posexplode(words).as(Seq("pos", "w")))
      .withColumn("w1", lead(col("w"), 1).over(wnd))
      .withColumn("w2", lead(col("w"), 2).over(wnd))
      .withColumn("w3", lead(col("w"), 3).over(wnd))
    val entries = Seq(
      struct(lit(1L).as("n"), xxhash64(col("w")).as("h")),
      struct(lit(2L).as("n"), when(col("w1").isNotNull,
        xxhash64(col("w"), col("w1"))).as("h")),
      struct(lit(3L).as("n"), when(col("w2").isNotNull,
        xxhash64(col("w"), col("w1"), col("w2"))).as("h")),
      struct(lit(4L).as("n"), when(col("w3").isNotNull,
        xxhash64(col("w"), col("w1"), col("w2"), col("w3"))).as("h")))
    toks
      .select(col("source"), explode(array(entries: _*)).as("g"))
      .select(col("source"), col("g.n").as("n"), col("g.h").as("h"))
      .filter(col("h").isNotNull)
      .groupBy(col("source"), col("n"), col("h"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"), col("n"))
      .agg(sum(col("cnt")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"))
      .select(col("source"), col("n"), col("total_ngrams"),
        col("distinct_ngrams"),
        (col("distinct_ngrams").cast("double")
          / col("total_ngrams").cast("double")).as("diversity"))
      .orderBy(col("source"), col("n"))
  }

  val ngramDiversitySql: String =
    """WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
      |g AS (
      |  SELECT source, nn.n AS n, array_to_string(ws[i:i+nn.n-1], ' ') AS gram
      |  FROM w, (VALUES (1), (2), (3), (4)) nn(n),
      |    UNNEST(range(1, len(ws) - nn.n + 2)) t(i)),
      |c AS (SELECT source, n, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3),
      |r AS (
      |  SELECT source, CAST(n AS BIGINT) AS n,
      |    CAST(SUM(cnt) AS BIGINT) AS total_ngrams,
      |    COUNT(*) AS distinct_ngrams
      |  FROM c GROUP BY 1, 2)
      |SELECT source, n, total_ngrams, distinct_ngrams,
      |  CAST(distinct_ngrams AS DOUBLE) / CAST(total_ngrams AS DOUBLE)
      |    AS diversity
      |FROM r ORDER BY source, n""".stripMargin

  // --- repetition signals ---------------------------------------------------
  /** Gopher/C4-style repetition quality signals: the most-frequent-word
    * fraction and the duplicate-word fraction per document. Shaped as
    * explode -> partial-aggregated (doc, word) counts -> per-doc
    * aggregate — the formulation whose shuffle carries one row per
    * DISTINCT (doc, word) (map-side combine collapses repeats), which
    * is how per-doc term statistics stay linear at corpus scale. All
    * output doubles are ratios of small exact integers, so both engines
    * compute identical bits.
    */
  def repetitionStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(words).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        (max(col("c")).cast("double") / sum(col("c"))).as("top_word_frac"),
        (lit(1.0) - count(lit(1)).cast("double") / sum(col("c"))).as("dup_word_frac"))
      .orderBy(col("doc_id"))

  val repetitionStatsSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2)
      |SELECT doc_id,
      | CAST(SUM(c) AS BIGINT) AS n_words,
      | CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
      | CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_word_frac,
      | 1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c) AS dup_word_frac
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- Count-Min sketch word frequencies ------------------------------------
  /** Per-language word-frequency estimates from a COUNT-MIN SKETCH
    * aggregate ([[graft.functions.CmsSketchAgg]], a custom
    * TypedImperativeAggregate): executors sketch their partitions
    * independently and the shuffle carries one fixed 16 KiB counter
    * matrix per language instead of per-word rows — the sketch shape
    * for frequency queries over corpora too large to count exactly.
    * Probes a fixed word list against each language's sketch.
    * No SQL oracle (DuckDB has no CMS); SketchSpec bounds the estimates
    * against exact counts (CMS never underestimates; overestimate is
    * eps*N-bounded) and checks partitioning-independence of the merge.
    */
  private val cmsProbes = Seq("the", "data", "spark", "query", "value")

  def sketchWordFreq(s: SparkSession, dir: String): DataFrame = {
    val probes = cmsProbes
    docs(s, dir)
      .select(col("lang"), explode(words).as("w"))
      .groupBy(col("lang"))
      .agg(graft.functions.CmsSketchAgg(xxhash64(col("w"))).as("sketch"))
      .select(col("lang"), col("sketch"), explode(typedLit(probes)).as("word"))
      .select(col("lang"), col("word"),
        graft.functions.CmsEstimate(col("sketch"), xxhash64(col("word")))
          .as("est_count"))
      .orderBy(col("lang"), col("word"))
  }

  /** [[sketchWordFreq]]'s STRUCTURAL ORACLE (registered as
    * `sketch_word_freq`): Count-Min NEVER undercounts — est ≥ exact is
    * a deterministic guarantee of the data structure (Cormode &
    * Muthukrishnan 2005, min over rows of sums that each include the
    * true count), not a probabilistic envelope — so the exact per-
    * (lang, probe) counts (DuckDB-computable) paired with that
    * contract as a boolean make the frame driver-checkable through the
    * REAL sketch build + merge + probe path. A broken merge or hash
    * that drops counts flips the boolean and hash-fails the gate. The
    * eps·N overcount BOUND (probabilistic) stays SketchSpec-pinned via
    * [[sketchWordFreq]], which remains the production probe. (Same
    * graduation as `decontaminate_bloom` / `join_size_estimate`.)
    */
  def sketchWordFreqAudit(s: SparkSession, dir: String): DataFrame = {
    val exact = docs(s, dir)
      .select(col("lang"), explode(words).as("word"))
      .filter(col("word").isin(cmsProbes: _*))
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("exact_count"))
    sketchWordFreq(s, dir)
      .join(exact, Seq("lang", "word"), "left")
      .select(col("lang"), col("word"),
        coalesce(col("exact_count"), lit(0L)).as("exact_count"),
        (col("est_count") >= coalesce(col("exact_count"), lit(0L)))
          .as("cms_never_under"))
      .orderBy(col("lang"), col("word"))
  }

  val sketchWordFreqAuditSql: String =
    """WITH langs AS (SELECT DISTINCT lang FROM documents),
      |p AS (SELECT unnest(['the','data','spark','query','value']) AS word),
      |w AS (SELECT lang, unnest(string_split(text, ' ')) AS word
      |      FROM documents),
      |c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS exact_count
      |      FROM w GROUP BY lang, word)
      |SELECT l.lang AS lang, p.word AS word,
      |  COALESCE(c.exact_count, CAST(0 AS BIGINT)) AS exact_count,
      |  TRUE AS cms_never_under
      |FROM langs l CROSS JOIN p
      |LEFT JOIN c ON c.lang = l.lang AND c.word = p.word
      |ORDER BY l.lang, p.word""".stripMargin

  // --- PII-style scrubbing --------------------------------------------------
  /** Training-data scrub pass: redact email addresses and URLs, count
    * the redactions, and fingerprint the cleaned text. Patterns are
    * RE2-compatible (no lookaround), so Spark's Java regex and DuckDB's
    * RE2 agree byte-for-byte — which is what makes the scrub
    * oracle-checkable. One narrow codegen'd map per doc.
    */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlRe = "https?://[^ ]+"

  def scrubPii(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(urlRe), lit(0)))
          .cast("long").as("n_urls"),
        md5(regexp_replace(regexp_replace(col("text"), urlRe, "<URL>"),
          emailRe, "<EMAIL>")).as("scrubbed_md5"))
      .orderBy(col("doc_id"))

  val scrubPiiSql: String =
    """SELECT doc_id,
      | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      | CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS BIGINT) AS n_urls,
      | md5(regexp_replace(regexp_replace(text, 'https?://[^ ]+', '<URL>', 'g'),
      |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')) AS scrubbed_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- fingerprinting -------------------------------------------------------
  /** Document fingerprints: full-text hash + prefix hash (cheap
    * locality-insensitive fingerprint family).
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        md5(col("text")).as("fp_full"),
        md5(substring(lower(col("text")), 1, 64)).as("fp_prefix64"))
      .orderBy(col("doc_id"))

  val fingerprintSql: String =
    """SELECT doc_id, md5(text) AS fp_full,
      | md5(substr(lower(text), 1, 64)) AS fp_prefix64
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Winnowing-style rolling fingerprint: the minimum digest over all
    * 8-char windows of the text (Schleimer et al. 2003's min-selection,
    * with md5-over-window standing in for the rolling hash so Spark and
    * DuckDB produce identical hex digests). One narrow map per doc,
    * codegen'd end to end via [[graft.functions.WinnowMinMd5]] (the
    * `transform`-lambda spelling is interpreted and allocated three
    * objects per window — the most expensive projection in the suite).
    */
  def winnowFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        graft.functions.WinnowMinMd5(col("text")).as("winnow_fp"))
      .orderBy(col("doc_id"))

  val winnowFingerprintSql: String =
    """SELECT doc_id,
      | list_min(list_transform(range(1, greatest(length(text)-7, 1) + 1),
      |   i -> md5(substr(text, i, 8)))) AS winnow_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- per-language top terms by document frequency ---------------------------
  /** Top-5 terms per language by document frequency (number of documents
    * containing the term at least once) — the df side of tf-idf, which
    * is also the corpus-health report (a term in >90% of documents is a
    * boilerplate signal). Ranking is by exact integer df with a
    * lexicographic tiebreak, so it is engine-deterministic — no fp
    * scores. Shape at scale: explode distinct-terms-per-doc (narrow,
    * generator), one (lang, term) hash aggregation with map-side partial
    * counts, then a window over the per-language term lists — the window
    * shuffles only (lang, term, df) triples, never document text.
    */
  def topTermsByDf(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("df").desc, col("term"))
    docs(s, dir)
      .select(col("lang"), explode(array_distinct(words)).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("df"))
      .select(col("lang"), col("term"), col("df"),
        row_number().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 5)
      .orderBy(col("lang"), col("rnk"))
  }

  val topTermsByDfSql: String =
    """WITH w AS (SELECT lang, unnest(list_distinct(string_split(text,' '))) AS term
      |           FROM documents),
      | d AS (SELECT lang, term, COUNT(*) AS df FROM w
      |       WHERE len(term) > 0 GROUP BY lang, term),
      | r AS (SELECT lang, term, df,
      |        CAST(row_number() OVER (PARTITION BY lang ORDER BY df DESC, term) AS BIGINT) AS rnk
      |       FROM d)
      |SELECT lang, term, df, rnk FROM r WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin

  // --- inverted index (bounded posting heads) ---------------------------------
  /** term -> (document frequency, first 50 posting doc_ids) — the
    * inverted-index build, with the posting list CAPPED at a
    * deterministic head so no single output row is unbounded (a stop
    * word at 100 TB has a posting list of billions; the full list
    * belongs in a partitioned sink keyed by (term, doc_id bucket), not
    * in one aggregation buffer — this query is the bounded reporting /
    * lookup-table variant). The cap is slice-after-sort, so it is the
    * smallest 50 doc_ids — deterministic in both engines. Shape: explode
    * distinct terms, one hash aggregation by term; the collect_set
    * buffer is bounded by per-term distinct docs (capped corpora) and
    * the emitted row by the slice.
    */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(array_distinct(words)).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        slice(sort_array(collect_set(col("doc_id"))), 1, 50).as("head"))
      .select(col("term"), col("df"),
        concat_ws(",", col("head").cast("array<string>")).as("posting_head"))
      .orderBy(col("term"))

  val invertedIndexSql: String =
    """WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS term
      |           FROM documents)
      |SELECT term, COUNT(*) AS df,
      | array_to_string(list_sort(list(doc_id))[1:50], ',') AS posting_head
      |FROM w WHERE len(term) > 0 GROUP BY term ORDER BY term""".stripMargin

  // --- exact dedup -----------------------------------------------------------
  /** Exact dedup by content hash: one row per distinct text with the
    * surviving (minimum) doc_id and the number of copies. At scale this is
    * a single hash-partitioned shuffle on the 128-bit digest — never on
    * the full text.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  val dedupExactSql: String =
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id,
      | COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  // --- exact paragraph-level dedup --------------------------------------------
  /** Normalized paragraph blocks of every document — the shared unit for
    * the paragraph-dedup family. Paragraph = newline-split segment,
    * re-chunked into non-overlapping `w`-word blocks (real pipelines cap
    * unbroken paragraphs the same way, so a single 100 KB line can't
    * hide sub-document duplication; this corpus ships single-line docs).
    * Normalization = lower + trim + drop empty tokens. Blocks under
    * `minWords` words (short tails) are dropped — a one-word "paragraph"
    * matching somewhere is noise, not duplication (same spirit as the
    * FastSS len>=2 filter). All codegen'd higher-order functions
    * (split/transform/sequence/slice) — no explode of per-word rows, one
    * block row per `w` words.
    */
  private def paragraphBlocks(s: SparkSession, dir: String, w: Int,
                              minWords: Int): DataFrame = {
    val ws = filter(split(trim(lower(col("para0"))), " "), x => x =!= lit(""))
    docs(s, dir)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), "\n")).as("para0"))
      .select(col("doc_id"), col("source"), ws.as("ws"))
      .where(size(col("ws")) > 0)
      .select(col("doc_id"), col("source"), explode(transform(
        sequence(lit(0), ((size(col("ws")) - 1) / lit(w)).cast("int")),
        i => array_join(slice(col("ws"), i * lit(w) + 1, lit(w)), " "))).as("para"))
      .where(size(split(col("para"), " ")) >= minWords)
  }

  /** Paragraph-granularity exact dedup — the Dolma/RefinedWeb middle
    * step between whole-document hashing ([[dedupExact]]) and
    * suffix-array substring dedup ([[exactSubstringDedup]]), and the one
    * real curation stacks run FIRST because it is ~10x cheaper than
    * substring dedup: hash every normalized paragraph block, mark the
    * ones whose text recurs anywhere in the corpus, and report each
    * document's duplicated-paragraph share (micro-units).
    *
    * Scale shape: blocks shuffle ONCE keyed by block text for the
    * corpus-wide occurrence count (map-side partial agg; at 100 TB key
    * by xxhash64(block) so the exchange carries 8 bytes/block — same
    * plan, and the 2^-64 collision odds only ever over-mark a block as
    * duplicated), then the counts join back block-keyed and re-aggregate
    * by doc_id. No all-pairs stage anywhere; both exchanges are
    * hash-keyed and skew-free (block texts are near-unique).
    */
  def dedupExactParagraph(s: SparkSession, dir: String, w: Int = 8,
                          minWords: Int = 2): DataFrame = {
    val blocks = paragraphBlocks(s, dir, w, minWords)
    val counts = blocks.groupBy(col("para")).agg(count(lit(1)).as("n_occ"))
    blocks.join(counts, "para")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_paras"))
      .select(col("doc_id"), col("n_paras"), col("n_dup_paras"),
        round(lit(1e6) * col("n_dup_paras") / col("n_paras")).cast("long")
          .as("dup_share_micro"))
      .orderBy(col("doc_id"))
  }

  def dedupExactParagraphSql(w: Int = 8, minWords: Int = 2): String =
    s"""WITH seg AS (
       |  SELECT doc_id, unnest(string_split(text, chr(10))) AS para0 FROM documents),
       |wt AS (
       |  SELECT doc_id,
       |    list_filter(string_split(trim(lower(para0)), ' '), x -> x <> '') AS ws
       |  FROM seg),
       |blocks AS (
       |  SELECT doc_id, array_to_string(ws[(i*$w+1):(i*$w+$w)], ' ') AS para
       |  FROM wt, UNNEST(range(0, CAST(floor((len(ws)-1)/$w.0) AS BIGINT) + 1)) t(i)
       |  WHERE len(ws) > 0),
       |bf AS (SELECT doc_id, para FROM blocks
       |       WHERE len(string_split(para, ' ')) >= $minWords),
       |cnt AS (SELECT para, COUNT(*) AS n_occ FROM bf GROUP BY para)
       |SELECT doc_id, COUNT(*) AS n_paras,
       |  CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
       |  CAST(ROUND(1e6 * SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) / COUNT(*))
       |    AS BIGINT) AS dup_share_micro
       |FROM bf JOIN cnt USING (para)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Per-source paragraph-dedup SAVINGS scorecard — the report that
    * justifies running [[dedupExactParagraph]] at all: if the corpus
    * keeps exactly ONE copy of every duplicated paragraph block (the
    * kept copy living in the LOWEST doc_id that holds it), how many
    * blocks and tokens does each source shed? Real curation runs read
    * this before committing to the 10x-costlier substring pass.
    *
    * Keeper rule is engine-portable by construction: keeper doc =
    * min(doc_id) per block text (no intra-doc ordering needed — extra
    * copies INSIDE the keeper doc are dropped too, since only one
    * occurrence survives). All counts are exact BIGINTs; the share is
    * one IEEE division.
    *
    * Shape: the shared block builder, one (block, doc, source)-keyed
    * collapse, a block-keyed keeper aggregate joined back block-keyed,
    * then the |sources| rollup — every exchange is hash-keyed on block
    * text (at 100 TB: xxhash64(block), same plan).
    */
  def dedupParagraphSavings(s: SparkSession, dir: String, w: Int = 8,
                            minWords: Int = 2): DataFrame = {
    val perDoc = paragraphBlocks(s, dir, w, minWords)
      .groupBy(col("para"), col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_occ"),
        max(size(split(col("para"), " "))).cast("long").as("wlen"))
    val keeper = perDoc.groupBy(col("para"))
      .agg(min(col("doc_id")).as("keep_doc"))
    perDoc.join(keeper, "para")
      .select(col("source"), col("n_occ"), col("wlen"),
        (col("n_occ") - when(col("doc_id") === col("keep_doc"), 1L)
          .otherwise(0L)).as("dropped"))
      .groupBy(col("source"))
      .agg(sum(col("n_occ")).as("n_blocks"),
        sum(col("n_occ") * col("wlen")).as("n_tokens"),
        sum(col("dropped")).as("n_dropped_blocks"),
        sum(col("dropped") * col("wlen")).as("n_dropped_tokens"))
      .select(col("source"), col("n_blocks"), col("n_tokens"),
        col("n_dropped_blocks"), col("n_dropped_tokens"),
        (col("n_dropped_tokens").cast("double")
          / col("n_tokens").cast("double")).as("savings_share"))
      .orderBy(col("source"))
  }

  def dedupParagraphSavingsSql(w: Int = 8, minWords: Int = 2): String =
    s"""WITH seg AS (
       |  SELECT doc_id, source, unnest(string_split(text, chr(10))) AS para0
       |  FROM documents),
       |wt AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split(trim(lower(para0)), ' '), x -> x <> '') AS ws
       |  FROM seg),
       |blocks AS (
       |  SELECT doc_id, source,
       |    array_to_string(ws[(i*$w+1):(i*$w+$w)], ' ') AS para
       |  FROM wt, UNNEST(range(0, CAST(floor((len(ws)-1)/$w.0) AS BIGINT) + 1)) t(i)
       |  WHERE len(ws) > 0),
       |bf AS (SELECT doc_id, source, para FROM blocks
       |       WHERE len(string_split(para, ' ')) >= $minWords),
       |pd AS (
       |  SELECT para, doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_occ,
       |    CAST(MAX(len(string_split(para, ' '))) AS BIGINT) AS wlen
       |  FROM bf GROUP BY 1, 2, 3),
       |kp AS (SELECT para, MIN(doc_id) AS keep_doc FROM pd GROUP BY para),
       |d AS (
       |  SELECT source, n_occ, wlen,
       |    n_occ - CASE WHEN doc_id = keep_doc THEN 1 ELSE 0 END AS dropped
       |  FROM pd JOIN kp USING (para)),
       |r AS (
       |  SELECT source, CAST(SUM(n_occ) AS BIGINT) AS n_blocks,
       |    CAST(SUM(n_occ * wlen) AS BIGINT) AS n_tokens,
       |    CAST(SUM(dropped) AS BIGINT) AS n_dropped_blocks,
       |    CAST(SUM(dropped * wlen) AS BIGINT) AS n_dropped_tokens
       |  FROM d GROUP BY source)
       |SELECT source, n_blocks, n_tokens, n_dropped_blocks, n_dropped_tokens,
       |  CAST(n_dropped_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
       |    AS savings_share
       |FROM r ORDER BY source""".stripMargin

  /** Top duplicated paragraph blocks corpus-wide, with distinct-doc and
    * total occurrence counts — the triage view a curation run reads to
    * spot boilerplate (nav bars, license headers) before choosing drop
    * rules. Distributed top-k via `orderBy().limit(k)`
    * (TakeOrderedAndProject) — never a global rank window; ties broken
    * by block text for a total deterministic order.
    */
  def dedupParagraphTop(s: SparkSession, dir: String, w: Int = 8,
                        minWords: Int = 2, k: Int = 20): DataFrame =
    paragraphBlocks(s, dir, w, minWords)
      .groupBy(col("para"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .where(col("n_occ") > 1)
      .orderBy(col("n_occ").desc, col("para"))
      .limit(k)

  def dedupParagraphTopSql(w: Int = 8, minWords: Int = 2, k: Int = 20): String =
    s"""WITH seg AS (
       |  SELECT doc_id, unnest(string_split(text, chr(10))) AS para0 FROM documents),
       |wt AS (
       |  SELECT doc_id,
       |    list_filter(string_split(trim(lower(para0)), ' '), x -> x <> '') AS ws
       |  FROM seg),
       |blocks AS (
       |  SELECT doc_id, array_to_string(ws[(i*$w+1):(i*$w+$w)], ' ') AS para
       |  FROM wt, UNNEST(range(0, CAST(floor((len(ws)-1)/$w.0) AS BIGINT) + 1)) t(i)
       |  WHERE len(ws) > 0)
       |SELECT para, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  COUNT(*) AS n_occ
       |FROM blocks WHERE len(string_split(para, ' ')) >= $minWords
       |GROUP BY para HAVING COUNT(*) > 1
       |ORDER BY n_occ DESC, para LIMIT $k""".stripMargin

  // --- exact n-gram-shingle Jaccard near-dup ---------------------------------
  /** Near-duplicate pairs by exact Jaccard over 3-gram shingles, language-
    * bucketed. This is the *verify* stage: candidate pairs come from a
    * same-language self-join (a partitioned shuffle join on the bucket
    * key), never an unbucketed cross join.
    *
    * Exact all-pairs verify is inherently quadratic in the bucket size,
    * so this oracle-checkable variant is RESTRICTED to the bounded
    * `doc_id < 500` bucket (the full corpus at the oracle scale
    * factors, a fixed 500-doc golden bucket beyond) — bounded-exact is
    * what keeps both engines linear-ish while still hash-checking the
    * verify math end to end. The UNBOUNDED scale path is LSH-candidates
    * -> exact verify ([[graft.llm.MinHashDedup.nearDupPairs]], the
    * `dedup_minhash_lsh` query): at 100 TB the bucket key is the
    * MinHash band hash, never `lang`/all-pairs — the shape of this plan
    * (bucket join -> exact verify) is the same.
    *
    * Execution shape:
    *   - shingle sets are hashed to distinct 64-bit longs BEFORE the
    *     join, so the pairwise intersection compares integers, not
    *     strings, and the shuffle carries 8 bytes per shingle (same
    *     Jaccard values: a 64-bit collision within one doc pair is
    *     ~2^-50 at these set sizes);
    *   - Jaccard = i / (|A| + |B| - i) from the intersection size alone
    *     — no materialized union array;
    *   - each language is block-split (8x8 triangle join) so
    *     parallelism is langs x 36 keys instead of one task per
    *     language — with few-and-large buckets, the block trick is what
    *     keeps every core busy at scale.
    */
  /** @param maxDocId exact-verify BOUND: only docs with `doc_id <
    *   maxDocId` are pairwise-compared. The default keeps the oracle's
    *   golden bucket; the bound is in the signature (not buried in the
    *   body) because exact all-pairs Jaccard is a VERIFY stage — on an
    *   arbitrary corpus, generate candidates with MinHashDedup's LSH and
    *   verify only those pairs, never all pairs.
    */
  def dedupNgramJaccard(s: SparkSession, dir: String,
                        maxDocId: Long = 500): DataFrame = {
    val nBlocks = 8
    val d = docs(s, dir)
      .filter(col("doc_id") < maxDocId)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
      // drop shingle-less docs (< 3 words) BEFORE pairing: two empty
      // shingle sets would make jaccard 0/0 = NaN, which Spark's
      // `>= 0.2` ACCEPTS (NaN sorts above all doubles) while the
      // oracle's NULL is rejected — the same guard shingleSets applies
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), col("lang"),
        graft.llm.MinHashDedup.hashedShingles(col("ws")).as("sh"))
      .withColumn("blk", pmod(xxhash64(col("doc_id")), lit(nBlocks)).cast("int"))
    // a-side: doc in block i joins every key (i, j>=i); b-side: (i<=j, j)
    val aKeys = explode(sequence(col("blk"), lit(nBlocks - 1))).as("blk_b")
    val bKeys = explode(sequence(lit(0), col("blk"))).as("blk_a")
    val a = d.select(col("lang"), col("blk").as("blk_a"), aKeys,
      col("doc_id").as("a_id"), col("sh").as("a_sh"), size(col("sh")).as("a_n"))
    val b = d.select(col("lang"), bKeys, col("blk").as("blk_b"),
      col("doc_id").as("b_id"), col("sh").as("b_sh"), size(col("sh")).as("b_n"))
    // sorted-merge intersection count: codegen'd, zero allocation per pair
    val inter = graft.functions.SortedLongIntersectSize(col("a_sh"), col("b_sh"))
      .cast("double")
    a.join(b, Seq("lang", "blk_a", "blk_b"))
      // same block: order by id; cross block: docs are distinct by
      // construction and each unordered pair meets exactly once
      .filter((col("blk_a") =!= col("blk_b")) || (col("a_id") < col("b_id")))
      .select(
        least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        (inter / (col("a_n") + col("b_n") - inter)).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy(col("a_id"), col("b_id"))
  }

  val dedupNgramJaccardSql: String =
    """WITH sh AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |      i -> string_split(text,' ')[i] || '_' || string_split(text,' ')[i+1]
      |           || '_' || string_split(text,' ')[i+2])) AS s
      |  FROM documents
      |  -- Spark drops shingle-less docs (< 3 words) before pairing; the
      |  -- oracle must too, or a pair of such docs rides on DuckDB's
      |  -- 0/0-division semantics instead of an explicit rule
      |  WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 3),
      |p AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
      |SELECT a_id, b_id, jaccard FROM p WHERE jaccard >= 0.2
      |ORDER BY a_id, b_id""".stripMargin

  // --- prefix-filtered exact Jaccard similarity join ---------------------------
  /** EXACT Jaccard similarity join via prefix filtering (AllPairs /
    * PPJoin; Bayardo et al., WWW 2007; Xiao et al., WWW 2008) — the
    * scale spelling of exact all-pairs that needs NO blocking key and
    * NO approximation: provably the same pair set as the quadratic
    * join, with candidates generated by an equi-join instead.
    *
    * Method: order every doc's shingles by GLOBAL rarity (document
    * frequency asc, shingle hash asc — a total order). Two sets with
    * `J >= t` must share a shingle within their first
    * `n - ceil(t*n) + 1` rarity-ordered shingles (if they only met in
    * the suffixes, the intersection would be at most
    * `min(ceil(t*|A|), ceil(t*|B|)) - 1 < ceil(t*max(|A|,|B|)) <=
    * |A inter B|` — contradiction). So candidates = the equi-join of
    * the PREFIX postings only, driven by the rarest shingles, where
    * posting lists are shortest.
    *
    * Execution shape at 100 TB:
    *   - the shingle-df table is vocab-sized and stays hash-partitioned
    *     on the shingle (it is NOT broadcast: a shingle vocabulary
    *     grows with the corpus) — the rarity join reuses the df
    *     shuffle's partitioning;
    *   - the candidate equi-join carries only (shingle, doc_id) pairs
    *     for ~(1-t) of each doc's shingles, and pair count is driven by
    *     PREFIX posting-list sizes — frequency-skewed shingles are
    *     exactly the ones prefix filtering excludes first;
    *   - the verify stage re-joins the two shingle arrays BY ID
    *     (each doc's set crosses the wire once per candidate side) and
    *     compares with the codegen'd sorted-merge intersect — same
    *     verify kernel as [[dedupNgramJaccard]] / the LSH path.
    *
    * The threshold rides as a RATIONAL (`tNum/tDen`): `ceil(0.2 * n)`
    * in binary FP can land on the wrong side for exact multiples
    * (0.2 is not representable), and an over-large ceil SHORTENS the
    * prefix — silently losing candidate pairs. Integer ceil-div cannot.
    *
    * Output (and oracle) = cross-language near-dup pairs at `J >= t`
    * over the bounded golden bucket — deliberately all-pairs in the
    * ORACLE (quadratic SQL is fine on 500 docs) so the driver
    * hash-checks that prefix filtering loses nothing; DedupSpec
    * additionally pins prefix-join == naive-cross-join equality in
    * Spark itself.
    */
  def dedupPrefixJaccard(s: SparkSession, dir: String,
                         tNum: Int = 1, tDen: Int = 5,
                         maxDocId: Long = 500): DataFrame = {
    val t = tNum.toDouble / tDen
    val d = docs(s, dir)
      .filter(col("doc_id") < maxDocId)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3) // shingle-less docs: see dedupNgramJaccard
      .select(col("doc_id"),
        graft.llm.MinHashDedup.hashedShingles(col("ws")).as("sh"))
    val tok = d.select(col("doc_id"), explode(col("sh")).as("g"))
    val dfTab = tok.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // per-doc shingles re-ordered rarest-first: (df, g) struct sort is a
    // deterministic total order (g is unique within a doc's set)
    val ordered = tok.join(dfTab, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("tk"))
      .select(col("doc_id"), expr("transform(tk, x -> x.g)").as("tk"))
    // prefix length n - ceilDiv(n*tNum, tDen) + 1, all-integer. NOTE the
    // SQL `div` operator: Column./ on two integrals is TRUE division
    // (double) and truncating the whole expression under-computes the
    // prefix (n=10, t=1/5: 8 instead of the safe minimum 9) — silently
    // losing the completeness guarantee this operator exists for.
    val pref = ordered
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("pref_len",
        expr(s"cast(n - (n * $tNum + ${tDen - 1}) div $tDen + 1 as int)"))
      .select(col("doc_id"),
        explode(slice(col("tk"), lit(1), col("pref_len"))).as("g"))
    val cand = pref.select(col("g"), col("doc_id").as("a_id"))
      .join(pref.select(col("g"), col("doc_id").as("b_id")), Seq("g"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id") // a pair may share several prefix shingles
    val dn = d.select(col("doc_id"), col("sh"), size(col("sh")).as("nsh"))
    val inter = graft.functions.SortedLongIntersectSize(col("a_sh"), col("b_sh"))
      .cast("double")
    cand
      .join(dn.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
        col("nsh").as("a_n")), Seq("a_id"))
      .join(dn.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
        col("nsh").as("b_n")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (inter / (col("a_n") + col("b_n") - inter)).as("jaccard"))
      .filter(col("jaccard") >= t)
      .orderBy(col("a_id"), col("b_id"))
  }

  val dedupPrefixJaccardSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |      i -> string_split(text,' ')[i] || '_' || string_split(text,' ')[i+1]
      |           || '_' || string_split(text,' ')[i+2])) AS s
      |  FROM documents
      |  WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 3),
      |p AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT a_id, b_id, jaccard FROM p WHERE jaccard >= 0.2
      |ORDER BY a_id, b_id""".stripMargin

  // --- containment (overlap-coefficient) dedup ---------------------------------
  /** Shingle OVERLAP-COEFFICIENT pairs: C(a,b) = |A∩B| / min(|A|,|B|)
    * ≥ τ (Szymkiewicz–Simpson) — the one-sided containment measure
    * that catches what Jaccard structurally CANNOT: a short document
    * quoted whole inside a long one has C = 1 but Jaccard ≈
    * |A|/|B| → 0, so every Jaccard-thresholded dedup pass
    * (`dedup_ngram_jaccard`, the LSH tier) keeps both copies. Corpus
    * curation treats these as containment duplicates (quotes,
    * boilerplate expansions, near-subset re-posts — the RefinedWeb /
    * CCNet sub-document dedup motivation).
    *
    * Candidate generation is PREFIX-FILTERED on the containment bound:
    * a qualifying pair shares ≥ ⌈τ·n_min⌉ shingles of the smaller set,
    * so by pigeonhole at least one of the smaller doc's
    * n − ⌈τ·n⌉ + 1 RAREST shingles (df-ascending, the
    * [[dedupPrefixJaccard]] ordering) is shared — each doc exposes
    * that prefix, joined against the other side's FULL shingle list
    * (containment can hide anywhere in the larger doc, so the big
    * side cannot be prefix-pruned; its join side is the inverted
    * full-token list, df-bounded by the same rarity skew that makes
    * prefix filtering work). Verification is the exact codegen'd
    * sorted-intersect; the division is one IEEE op on exact integers.
    *
    * Same bounded-corpus contract as [[dedupPrefixJaccard]]
    * (`maxDocId` caps the quadratic verify fan-in for the registered
    * test variant; at scale the candidate volume is bounded by posting
    * rarity, not corpus size).
    */
  def dedupContainment(s: SparkSession, dir: String,
                       tNum: Int = 1, tDen: Int = 2,
                       maxDocId: Long = 500): DataFrame = {
    val t = tNum.toDouble / tDen
    val d = docs(s, dir)
      .filter(col("doc_id") < maxDocId)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"),
        graft.llm.MinHashDedup.hashedShingles(col("ws")).as("sh"))
    val tok = d.select(col("doc_id"), explode(col("sh")).as("g"))
    val dfTab = tok.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val ordered = tok.join(dfTab, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("tk"))
      .select(col("doc_id"), expr("transform(tk, x -> x.g)").as("tk"))
    // exact ceil-div prefix, the dedupPrefixJaccard boundary discipline
    val pref = ordered
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("pref_len",
        expr(s"cast(n - (n * $tNum + ${tDen - 1}) div $tDen + 1 as int)"))
      .select(col("doc_id"),
        explode(slice(col("tk"), lit(1), col("pref_len"))).as("g"))
    val cand = pref.select(col("g"), col("doc_id").as("p_id"))
      .join(tok.select(col("g"), col("doc_id").as("q_id")), Seq("g"))
      .filter(col("p_id") =!= col("q_id"))
      .select(least(col("p_id"), col("q_id")).as("a_id"),
        greatest(col("p_id"), col("q_id")).as("b_id"))
      .dropDuplicates("a_id", "b_id")
    val dn = d.select(col("doc_id"), col("sh"), size(col("sh")).as("nsh"))
    val inter = graft.functions.SortedLongIntersectSize(col("a_sh"), col("b_sh"))
      .cast("double")
    cand
      .join(dn.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
        col("nsh").as("a_n")), Seq("a_id"))
      .join(dn.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
        col("nsh").as("b_n")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (inter / least(col("a_n"), col("b_n")).cast("double")).as("overlap"))
      .filter(col("overlap") >= t)
      .orderBy(col("a_id"), col("b_id"))
  }

  val dedupContainmentSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |      i -> string_split(text,' ')[i] || '_' || string_split(text,' ')[i+1]
      |           || '_' || string_split(text,' ')[i+2])) AS s
      |  FROM documents
      |  WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 3),
      |p AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / CAST(LEAST(len(a.s), len(b.s)) AS DOUBLE) AS overlap
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT a_id, b_id, overlap FROM p WHERE overlap >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  // --- end-to-end curation pipeline --------------------------------------------
  /** The corpus-curation funnel in one query: quality gate (minimum
    * length + token diversity, the [[qualityScore]] signals as
    * predicates) -> exact dedup (keep the minimum doc_id per content
    * hash, the [[dedupExact]] rule) -> per-language yield report
    * (docs in, docs passing quality, docs surviving dedup, surviving
    * tokens). This is the end-to-end shape an LLM data pipeline runs
    * nightly; every stage here composes the already-verified operators
    * instead of re-implementing them.
    *
    * Shape at scale: the quality gate is a narrow filtered scan (reads
    * each doc once, filter pushed to the scan); dedup is ONE shuffle on
    * the 128-bit digest (never on text); the three per-language reports
    * are counts of at most |langs| rows, combined with broadcast joins.
    * The funnel never materializes surviving text — the report carries
    * ids and counts only; the curated corpus itself would be written by
    * re-filtering the scan against the surviving-id set (a semi-join),
    * keeping the heavy text column out of every exchange.
    */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    val scored = docs(s, dir).select(
      col("doc_id"), col("lang"), col("text"),
      size(words).cast("long").as("n_tok"),
      (size(array_distinct(words)).cast("double") / size(words))
        .as("diversity"))
    val raw = scored.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val quality = scored.filter(col("n_tok") >= 20 && col("diversity") >= 0.4)
    val qCnt = quality.groupBy(col("lang")).agg(count(lit(1)).as("n_quality"))
    val kept = quality
      .groupBy(md5(col("text")).as("h"))
      .agg(min_by(col("lang"), col("doc_id")).as("lang"),
        min_by(col("n_tok"), col("doc_id")).as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("kept_tokens"))
    raw.join(broadcast(qCnt), Seq("lang"), "left")
      .join(broadcast(kept), Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy(col("lang"))
  }

  val curationPipelineSql: String =
    """WITH scored AS (
      |  SELECT doc_id, lang, text,
      |    len(string_split(text,' ')) AS n_tok,
      |    CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
      |      / len(string_split(text,' ')) AS diversity
      |  FROM documents),
      |raw AS (SELECT lang, COUNT(*) AS n_docs FROM scored GROUP BY lang),
      |q AS (SELECT * FROM scored WHERE n_tok >= 20 AND diversity >= 0.4),
      |qc AS (SELECT lang, COUNT(*) AS n_quality FROM q GROUP BY lang),
      |k AS (SELECT md5(text) AS h, arg_min(lang, doc_id) AS lang,
      |        arg_min(n_tok, doc_id) AS n_tok
      |      FROM q GROUP BY md5(text)),
      |kc AS (SELECT lang, COUNT(*) AS n_kept,
      |         CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
      |       FROM k GROUP BY lang)
      |SELECT raw.lang, raw.n_docs,
      | COALESCE(qc.n_quality, 0) AS n_quality,
      | COALESCE(kc.n_kept, 0) AS n_kept,
      | COALESCE(kc.kept_tokens, 0) AS kept_tokens
      |FROM raw LEFT JOIN qc USING (lang) LEFT JOIN kc USING (lang)
      |ORDER BY lang""".stripMargin

  // --- BM25 keyword extraction --------------------------------------------------
  /** Top-3 BM25 terms per document — relevance-weighted keyword
    * extraction (the tf side of tf-idf that [[topTermsByDf]] reports the
    * df side of). Uses the RATIONAL Robertson idf `(N - df + 0.5) /
    * (df + 0.5)` rather than its log: every input (tf, df, dl, N) is an
    * exact integer, so the whole score is a fixed tree of IEEE-double
    * ops both engines evaluate bit-identically — fp `ln` is
    * libm-dependent and would make the oracle hash flaky at rounding
    * boundaries (same discipline as [[Sampling.skewHistogram]]'s
    * digit-count log). The log is monotone in the rational idf, so
    * per-document ranking is unchanged.
    *
    * Shape at scale: explode -> one (doc, term) hash aggregation with
    * map-side combine (shuffle carries distinct pairs, not occurrences),
    * df by a second aggregation over distinct (doc, term), corpus stats
    * (N, avgdl) as a one-row broadcast, then a per-doc top-k window over
    * (doc, term, score) triples — document text never enters an
    * exchange.
    */
  def bm25TopTerms(s: SparkSession, dir: String): DataFrame = {
    // k1=1.2, b=0.75; every fp constant is written as the same literal
    // the oracle SQL carries (2.2, 1.2, 0.25, 0.75) so both engines
    // start from identical doubles
    val tf = docs(s, dir)
      .select(col("doc_id"), explode(words).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_corpus"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val idf = (col("n_corpus") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val score = idf * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    // dl is one row PER DOCUMENT — corpus-sized, so no broadcast hint:
    // the join is doc_id-keyed and co-partitions with tf's aggregation
    // exchange at any scale (Catalyst still auto-broadcasts it under
    // the threshold at test SFs); only the 1-row stats is pinned
    tf.join(dl, "doc_id")
      .join(df, "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        score.as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val bm25TopTermsSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t
      |       WHERE len(term) > 0 GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |st AS (SELECT COUNT(*) AS n_corpus,
      |         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      |sc AS (
      |  -- every fp literal cast to DOUBLE: DuckDB parses bare 0.5/2.2 as
      |  -- DECIMAL and computes the idf numerator exactly, which lands a
      |  -- different double after the division than Spark's all-double tree
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    ((st.n_corpus - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE))
      |      * (tf.tf * 2.2::DOUBLE)
      |      / (tf.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl.dl / st.avgdl)) AS score
      |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term), st),
      |r AS (SELECT *, CAST(row_number() OVER (
      |        PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rnk
      |      FROM sc)
      |SELECT doc_id, rnk, term, tf, df, score
      |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // --- regex extraction ------------------------------------------------------
  /** Per-document regex feature counts: matches of two word-shape
    * patterns (`\bs[a-z]+\b` s-words, anything containing "ow").
    * Patterns are restricted to the syntax Java regex and RE2 share, so
    * both engines count identically; counting (not extracting the
    * match list) keeps the output schema flat. One narrow codegen'd
    * projection — no shuffle at all until the final presentation sort.
    */
  def regexExtract(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\bs[a-z]+\\b"), lit(0)))
          .cast("long").as("n_s_words"),
        size(regexp_extract_all(col("text"), lit("[a-z]*ow[a-z]*"), lit(0)))
          .cast("long").as("n_ow_words"))
      .orderBy(col("doc_id"))

  val regexExtractSql: String =
    """SELECT doc_id,
      | CAST(len(regexp_extract_all(text, '\bs[a-z]+\b')) AS BIGINT) AS n_s_words,
      | CAST(len(regexp_extract_all(text, '[a-z]*ow[a-z]*')) AS BIGINT) AS n_ow_words
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- positional token explode ----------------------------------------------
  /** Token frequencies at the first three positions of each document —
    * the posexplode (ordinal-preserving explode) surface. The explode
    * is narrow; the only shuffle is the tiny (pos, word) aggregate.
    * Filtering `pos < 3` BEFORE the aggregate keeps the exploded
    * volume bounded by 3·|docs| regardless of document length.
    */
  def firstPositions(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .filter(col("pos") < 3)
      .groupBy(col("pos").cast("long").as("pos"), col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("pos"), col("word"))

  val firstPositionsSql: String =
    """WITH t AS (SELECT string_split(text, ' ') AS words FROM documents),
      |p AS (SELECT unnest(words) AS word,
      |             generate_subscripts(words, 1) - 1 AS pos FROM t)
      |SELECT CAST(pos AS BIGINT) AS pos, word, COUNT(*) AS n FROM p
      |WHERE pos < 3 GROUP BY pos, word ORDER BY pos, word""".stripMargin

  // --- incremental corpus dedup ----------------------------------------------
  /** Incremental ingest screen: incoming documents (`doc_id >= 400`,
    * standing in for today's crawl batch) are dropped when their
    * prefix fingerprint — md5 of the first 8 tokens, the cheap screen
    * crawl pipelines use before full-content hashing — already exists
    * in the base corpus (`doc_id < 400`).
    *
    * Scale shape: the base side reduces to its DISTINCT digest set
    * before the anti join, which is exactly the state a production
    * pipeline persists between runs. Small digest set → broadcast anti
    * join (incoming never shuffles, the plan here); huge digest set →
    * the same anti join shuffled, co-partitioned on digest; approximate
    * variant with constant memory → `decontaminate_bloom`.
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    def fp: Column =
      md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
    val base = docs(s, dir).filter(col("doc_id") < 400)
      .select(fp.as("fp")).distinct()
    val inc = docs(s, dir).filter(col("doc_id") >= 400)
      .select(col("doc_id"), fp.as("fp"))
    inc.join(broadcast(base), Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  val dedupIncrementalSql: String =
    """WITH base AS (SELECT DISTINCT
      |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp
      |  FROM documents WHERE doc_id < 400),
      |inc AS (SELECT doc_id,
      |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp
      |  FROM documents WHERE doc_id >= 400)
      |SELECT doc_id, fp FROM inc
      |WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.fp = inc.fp)
      |ORDER BY doc_id""".stripMargin

  // --- corpus bigram counts --------------------------------------------------
  /** Top-20 corpus bigrams — the n-gram statistics pass of an LM data
    * pipeline. Bigrams are formed INSIDE the array with an indexed
    * lambda (`transform` pairing each word with its successor), so the
    * only exploded row is the bigram itself — no positional self-join,
    * no shuffle until the count aggregate. Ties rank lexicographically
    * for a deterministic top-20.
    */
  def bigrams(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      // Tokenize once per document — inlining `split` into the lambda
      // re-tokenizes the whole text per element (O(words²) per doc).
      .select(split(col("text"), " ").as("w"))
      .select(explode(expr(
        """transform(slice(w, 1, size(w) - 1),
          |  (x, i) -> concat(x, ' ', w[i + 1]))""".stripMargin))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  val bigramsSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |p AS (SELECT doc_id, unnest(w) AS word,
      |             generate_subscripts(w, 1) AS pos FROM t),
      |b AS (SELECT a.word || ' ' || c.word AS bigram
      |      FROM p a JOIN p c ON a.doc_id = c.doc_id AND c.pos = a.pos + 1)
      |SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram
      |ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  // --- bigram conditional entropy rate -----------------------------------
  /** Per-language bigram ENTROPY RATE H(W₂|W₁) = H(W₁,W₂) − H(W₁) —
    * the information-theoretic compressibility read of a corpus
    * (Shannon 1951's printed-English estimate, word-level): how many
    * nats the NEXT word carries once the current word is known. The
    * dataset-curation signal beside [[charEntropy]] (character
    * diversity) and `docs_*` lexical diversity: a low rate flags
    * templated/boilerplate-heavy sources an LLM data pipeline
    * down-weights; the H(joint) and H(context) legs are reported
    * beside the rate.
    *
    * Hash-exact by the micronat discipline: both entropies are
    * n·lnµ(n) − Σ k·lnµ(k) over exact BIGINT counts (lnµ = round(ln·1e6),
    * identical IEEE ln both engines), so the conditional difference
    * collapses to the integer Σk·lnµ(k) gap between context and
    * bigram folds; the only division is the final nats scaling.
    *
    * Scale: bigrams form INSIDE the token array (the [[bigrams]]
    * indexed-transform spelling — no positional self-join of the
    * corpus); two map-side-combined folds to (lang, gram) then one
    * |langs|-row join. Nothing corpus-sized shuffles twice.
    */
  def bigramEntropyRate(s: SparkSession, dir: String): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val pairs = docs(s, dir)
      .select(col("lang"), split(col("text"), " ").as("w"))
      .select(col("lang"), explode(expr(
        """transform(slice(w, 1, size(w) - 1),
          |  (x, i) -> struct(x AS w1, concat(x, ' ', w[i + 1]) AS bg))"""
          .stripMargin)).as("p"))
      .select(col("lang"), col("p.w1").as("w1"), col("p.bg").as("bg"))
    val joint = pairs.groupBy(col("lang"), col("bg"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("lang"))
      .agg(sum(col("k")).as("n"),
        sum(col("k") * lnMicro(col("k"))).as("sb"))
    val ctx = pairs.groupBy(col("lang"), col("w1"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("lang"))
      .agg(sum(col("k") * lnMicro(col("k"))).as("sc"))
    joint.join(ctx, "lang")
      .select(col("lang"), col("n").as("n_bigrams"),
        (col("n") * lnMicro(col("n")) - col("sb")).as("h_joint_micronats"),
        (col("n") * lnMicro(col("n")) - col("sc")).as("h_context_micronats"),
        ((col("sc") - col("sb")).cast("double")
          / (col("n").cast("double") * lit(1e6))).as("cond_entropy_nats"))
      .orderBy(col("lang"))
  }

  val bigramEntropyRateSql: String =
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
      |           FROM documents),
      |p AS (SELECT doc_id, lang, unnest(w) AS word,
      |             generate_subscripts(w, 1) AS pos FROM t),
      |bg AS (SELECT a.lang AS lang, a.word AS w1,
      |              a.word || ' ' || c.word AS bg
      |       FROM p a JOIN p c ON a.doc_id = c.doc_id AND c.pos = a.pos + 1),
      |kb AS (SELECT lang, bg, COUNT(*) AS k FROM bg GROUP BY lang, bg),
      |hb AS (SELECT lang, CAST(SUM(k) AS BIGINT) AS n,
      |    CAST(SUM(k * CAST(round(ln(CAST(k AS DOUBLE)) * 1e6) AS BIGINT))
      |         AS BIGINT) AS sb
      |  FROM kb GROUP BY lang),
      |kc AS (SELECT lang, w1, COUNT(*) AS k FROM bg GROUP BY lang, w1),
      |hc AS (SELECT lang,
      |    CAST(SUM(k * CAST(round(ln(CAST(k AS DOUBLE)) * 1e6) AS BIGINT))
      |         AS BIGINT) AS sc
      |  FROM kc GROUP BY lang)
      |SELECT hb.lang, n AS n_bigrams,
      |  n * CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) - sb
      |    AS h_joint_micronats,
      |  n * CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) - sc
      |    AS h_context_micronats,
      |  CAST(sc - sb AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)
      |    AS cond_entropy_nats
      |FROM hb JOIN hc ON hb.lang = hc.lang
      |ORDER BY hb.lang""".stripMargin

  // --- trigram conditional LM statistics ----------------------------------
  /** Top trigram continuations with conditional probability
    * P(w3 | w1 w2) = n(w1w2w3) / n(w1w2·) — the n-gram LM statistics
    * pass (extends [[bigrams]] to conditional form). Counts are
    * integers; the per-context total rides in a window over the
    * aggregated trigram table (never the corpus); probability is one
    * IEEE division of exact integers. Top-50 by count with full
    * lexicographic tie-break for a deterministic report.
    */
  def trigramLm(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      // Tokenize once per document (see [[bigrams]] — the inlined
      // spelling is O(words²) per doc).
      .select(split(col("text"), " ").as("w"))
      .select(explode(expr(
        """transform(slice(w, 1, greatest(size(w) - 2, 0)),
          |  (x, i) -> struct(concat(x, ' ', w[i + 1]) AS context,
          |            w[i + 2] AS next_word))"""
          .stripMargin)).as("t"))
      .select(col("t.context").as("context"), col("t.next_word").as("next_word"))
      .groupBy(col("context"), col("next_word"))
      .agg(count(lit(1)).as("n"))
      .select(col("context"), col("next_word"), col("n"),
        (col("n").cast("double") /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("context"))).cast("double")).as("p"))
      .orderBy(col("n").desc, col("context"), col("next_word"))
      .limit(50)

  val trigramLmSql: String =
    """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT w[i] || ' ' || w[i + 1] AS context, w[i + 2] AS next_word
      |      FROM t, unnest(range(1, len(w) - 1)) AS u(i)
      |      WHERE len(w) >= 3),
      |m AS (SELECT context, next_word, COUNT(*) AS n FROM g GROUP BY 1, 2)
      |SELECT context, next_word, n,
      |  CAST(n AS DOUBLE)
      |    / CAST(CAST(SUM(n) OVER (PARTITION BY context) AS BIGINT) AS DOUBLE)
      |    AS p
      |FROM m ORDER BY n DESC, context, next_word LIMIT 50""".stripMargin

  // --- corpus source concentration ----------------------------------------
  /** Token-share concentration across sources, by decile — the
    * data-governance report ("is the mix dominated by a handful of
    * sources?"). Sources rank into ntile(10) deciles by token count
    * (source name tie-break) over the SOURCE-level aggregate — the
    * corpus shuffles once for the per-source sums. |sources| GROWS
    * with a real corpus (domains, not an enum), so the decile comes
    * from the range-partitioned two-pass rank
    * ([[graft.Graft.rankedByRange]]) + the exact integer ntile formula
    * ([[graft.Graft.ntileFromRank]]), never `ntile OVER (ORDER BY …)`'s
    * one-partition funnel. Counts are exact longs; share is one
    * integer-over-integer IEEE division.
    */
  def sourceConcentration(s: SparkSession, dir: String): DataFrame = {
    val perSource = docs(s, dir)
      .select(col("source"), size(words).cast("long").as("n_tok"))
      .groupBy(col("source")).agg(sum(col("n_tok")).as("tokens"))
    val ranked = graft.Graft.rankedByRange(perSource,
      col("tokens").desc, col("source"))
    // totals read the rank pass's CHECKPOINT, not the corpus — the
    // r10 review caught the first spelling paying a full re-scan +
    // re-tokenization per 1-row broadcast (two of them); this is now
    // strictly cheaper than the r9 window spelling (one corpus pass)
    val total = ranked.agg(sum(col("tokens")).as("corpus_tokens"),
      count(lit(1)).as("graft_n"))
    ranked
      .crossJoin(broadcast(total))
      .select(col("source"), col("tokens"), col("corpus_tokens"),
        graft.Graft.ntileFromRank(10).cast("long").as("decile"))
      .groupBy(col("decile"), col("corpus_tokens"))
      .agg(count(lit(1)).as("n_sources"), sum(col("tokens")).as("tokens"))
      .select(col("decile"), col("n_sources"), col("tokens"),
        (col("tokens").cast("double") / col("corpus_tokens").cast("double"))
          .as("token_share"))
      .orderBy(col("decile"))
  }

  val sourceConcentrationSql: String =
    """WITH s AS (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |           AS tokens
      |  FROM documents GROUP BY source),
      |d AS (SELECT source, tokens,
      |        CAST(NTILE(10) OVER (ORDER BY tokens DESC, source) AS BIGINT)
      |          AS decile
      |      FROM s),
      |t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS corpus_tokens FROM s)
      |SELECT decile, COUNT(*) AS n_sources,
      |  CAST(SUM(tokens) AS BIGINT) AS tokens,
      |  CAST(CAST(SUM(tokens) AS BIGINT) AS DOUBLE)
      |    / CAST(corpus_tokens AS DOUBLE) AS token_share
      |FROM d, t GROUP BY decile, corpus_tokens ORDER BY decile""".stripMargin

  // --- cross-document repeated passages -----------------------------------
  /** Exact 5-gram passages appearing in 2+ DISTINCT documents — the
    * substring-level duplication signal (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better": exact repeated spans
    * survive document-level near-dup dedup and still cause memorization).
    * Grams are de-duplicated within each document first, so a doc
    * repeating its own boilerplate doesn't inflate the cross-doc count.
    *
    * Scale shape: one aggregation shuffle keyed by the gram. This
    * report keeps gram TEXT as the key (the top-50 output needs it);
    * the 100 TB spelling shuffles a 64-bit gram hash instead and joins
    * text back for the survivors only — and composes with winnowing
    * ([[winnowFingerprint]]) to sample grams instead of enumerating
    * all of them.
    */
  def repeatedPassages(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      // Tokenize once per document (see [[bigrams]] — the inlined
      // spelling is O(words²) per doc).
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(slice(w, 1, greatest(size(w) - 4, 0)),
          |  (x, i) -> concat_ws(' ', slice(w, i + 1, 5)))"""
          .stripMargin))).as("passage"))
      .groupBy(col("passage"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("passage"))
      .limit(50)

  val repeatedPassagesSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(list_distinct(list_transform(range(1, len(w) - 3),
      |          i -> array_to_string(list_slice(w, i, i + 4), ' '))))
      |          AS passage
      |      FROM t)
      |SELECT passage, COUNT(DISTINCT doc_id) AS n_docs,
      |       MIN(doc_id) AS first_doc
      |FROM g GROUP BY passage HAVING COUNT(DISTINCT doc_id) >= 2
      |ORDER BY n_docs DESC, passage LIMIT 50""".stripMargin

  // --- exact substring dedup (maximal duplicated spans) ----------------------
  /** EXACT substring-level dedup census at token granularity k = 8
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better" — ExactSubstr): per document, the MAXIMAL spans
    * whose every token lies inside some k-token substring occurring
    * ≥ 2 times in the corpus (same doc or cross-doc), plus the
    * duplicated-token share — the removal-decision output the paper's
    * suffix-array pass produces. Semantics are exact, not sketched: a
    * k-token window occurring twice IS a verbatim duplicated substring
    * of length k, any duplicate of length ≥ k contains only such
    * windows, and merging the overlapping/adjacent [p, p+k−1]
    * intervals yields precisely the maximal duplicated-coverage runs.
    * ([[repeatedPassages]] reports the shared passages themselves;
    * this reports what a dedup pass would CUT, per document.)
    *
    * Scale shape — the suffix-array spelling respelled for Spark: the
    * paper builds one suffix array over the concatenated corpus, which
    * distributed naively is a global sort of all suffixes (and its
    * merge step is sequential). Here every stage is hash-keyed or
    * doc-local: gram extraction is a narrow per-doc map (sequence +
    * slice + array_join, all codegen'd); duplicate detection is ONE
    * aggregation shuffle keyed by the gram (bounded keys — k tokens);
    * the membership join back is gram-keyed and co-partitioned with
    * it; interval merge is a per-DOC window (high cardinality,
    * parallel at any SF — the legitimate partitioned-window class);
    * the rollup is doc-keyed; the report is a distributed
    * TakeOrdered(20). Nothing funnels: no suffix block ever meets a
    * single reducer, no global order is ever built. The 100 TB
    * spelling shuffles a 128-bit gram hash instead of gram text
    * (collision-negligible, smaller exchange); text keys are kept here
    * for oracle comparability, like [[repeatedPassages]].
    */
  def exactSubstringDedup(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val toks = docs(s, dir).select(col("doc_id"), words.as("w"))
    val grams = toks
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, size(w) - $k + 1),
           |  i -> array_join(slice(w, i, $k), ' '))""".stripMargin))
        .as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("gram"))
    val dup = grams.groupBy(col("gram")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("gram"))
    val starts = grams.join(dup, Seq("gram")).select(col("doc_id"), col("pos"))
    // fixed-length intervals [p, p+k−1] merge iff the next start is
    // ≤ k after the previous (overlap OR adjacency ⇒ one covered run)
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val lagPos = lag(col("pos"), 1).over(wDoc)
    val spans = starts
      .withColumn("new_isl",
        when(lagPos.isNull || col("pos") - lagPos > k, 1L).otherwise(0L))
      .withColumn("isl", sum(col("new_isl")).over(
        wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k.toLong) - 1).as("span_end"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"),
        max(col("span_end") - col("span_start") + 1).as("max_span_tokens"),
        sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
    perDoc
      .join(toks.select(col("doc_id"), size(col("w")).cast("long")
        .as("n_tokens")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_dup_spans"),
        col("max_span_tokens"), col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("dup_share"))
      .orderBy(col("dup_share").desc, col("doc_id"))
      .limit(20)
  }

  val exactSubstringDedupSql: String = {
    val k = 8
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
      |        array_to_string(list_slice(w, u.i, u.i + $k - 1), ' ') AS gram
      |      FROM t, unnest(range(1, len(w) - $k + 2)) AS u(i)
      |      WHERE len(w) >= $k),
      |d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
      |st AS (SELECT doc_id, pos,
      |         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |       FROM g JOIN d USING (gram)),
      |si AS (SELECT doc_id, pos,
      |         SUM(CASE WHEN prev IS NULL OR pos - prev > $k
      |             THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY doc_id ORDER BY pos
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS isl
      |       FROM st),
      |sp AS (SELECT doc_id, isl, MIN(pos) AS span_start,
      |         MAX(pos) + $k - 1 AS span_end
      |       FROM si GROUP BY doc_id, isl),
      |p AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
      |        CAST(MAX(span_end - span_start + 1) AS BIGINT)
      |          AS max_span_tokens,
      |        CAST(SUM(span_end - span_start + 1) AS BIGINT) AS dup_tokens
      |      FROM sp GROUP BY doc_id),
      |n AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
      |        AS n_tokens
      |      FROM documents)
      |SELECT doc_id, n_tokens, n_dup_spans, max_span_tokens, dup_tokens,
      |  CAST(dup_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_share
      |FROM p JOIN n USING (doc_id)
      |ORDER BY dup_share DESC, doc_id LIMIT 20""".stripMargin
  }

  // --- per-document n-gram novelty ------------------------------------------
  /** Per-document novelty: the fraction of a document's DISTINCT
    * 5-gram shingles that appear in no other document. This is the
    * doc-level summary of [[repeatedPassages]] (which reports the
    * passages themselves): low novelty marks boilerplate-heavy docs a
    * curation pass would down-weight, the per-doc complement of the
    * Lee et al. 2021 substring-dedup signal.
    *
    * Shape: explode per-doc distinct grams once, one gram-keyed
    * aggregation for document frequency, one gram-keyed join back,
    * one doc-keyed aggregation. Grams are already distinct per doc, so
    * df is a plain count. The 100 TB spelling shuffles a 64-bit gram
    * hash instead of gram text (collisions only merge counts) — text
    * keys are kept here for oracle comparability, like
    * [[repeatedPassages]].
    */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val grams = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(slice(w, 1, greatest(size(w) - 4, 0)),
          |  (x, i) -> concat_ws(' ', slice(w, i + 1, 5)))"""
          .stripMargin))).as("g"))
    val df = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    grams.join(df, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        (lit(1.0) - col("n_shared").cast("double")
          / col("n_shingles").cast("double")).as("novelty"))
      .orderBy(col("doc_id"))
  }

  val ngramNoveltySql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(list_distinct(list_transform(range(1, len(w) - 3),
      |          i -> array_to_string(list_slice(w, i, i + 4), ' ')))) AS g
      |      FROM t),
      |df AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM g GROUP BY g)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |  CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_shared,
      |  1.0 - CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS novelty
      |FROM g JOIN df USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- Zipf slope ------------------------------------------------------------
  /** Least-squares slope of ln(frequency) on ln(rank) over the top 100
    * corpus terms — the Zipf exponent check (natural language sits
    * near −1; synthetic or templated corpora drift off it), a standard
    * corpus-QA scalar. Ranks come from the deterministic
    * (freq desc, term) order; both logs ride as micronat integers (the
    * lnµ rounding that removes libm last-ulp variance) so the OLS
    * moments are exact BIGINTs and the slope is one IEEE expression.
    * The top-K is a TakeOrderedAndProject over the term aggregate —
    * bounded at any corpus size, like [[vocabCoverage]].
    */
  def zipfSlope(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    def lnMicro(c: Column): Column =
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val top = docs(s, dir)
      .select(explode(words).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("term")).limit(k)
    val ranked = top
      .withColumn("i",
        row_number().over(Window.orderBy(col("f").desc, col("term")))
          .cast("long"))
      .select(lnMicro(col("i")).as("x"), lnMicro(col("f")).as("y"))
    ranked
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("n_terms"),
        ((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")))
          .as("zipf_slope"))
  }

  val zipfSlopeSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |freq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS f FROM tok
      |         WHERE len(term) > 0 GROUP BY term),
      |top AS (
      |  SELECT f, CAST(row_number() OVER (ORDER BY f DESC, term) AS BIGINT)
      |           AS i
      |  FROM freq ORDER BY f DESC, term LIMIT 100),
      |pts AS (
      |  SELECT CAST(round(ln(CAST(i AS DOUBLE)) * 1e6) AS BIGINT) AS x,
      |         CAST(round(ln(CAST(f AS DOUBLE)) * 1e6) AS BIGINT) AS y
      |  FROM top),
      |mo AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM pts)
      |SELECT n AS n_terms,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS zipf_slope
      |FROM mo""".stripMargin

  // --- compression-ratio quality signal -----------------------------------
  /** DEFLATE compression ratio per document — the compressibility
    * quality filter (Gopher/RefinedWeb family): boilerplate compresses
    * far below typical prose, noise barely compresses, and both tails
    * get dropped at curation time. One codegen'd narrow map
    * ([[graft.functions.DeflateSize]]); the ratio divides two exact
    * integers. Rows-only checked (no DEFLATE in the SQL oracle);
    * CompressionSpec pins fixtures and the repetitive≪prose≪random
    * ordering.
    */
  def compressionRatio(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("n_chars"),
        graft.functions.DeflateSize(col("text")).as("deflate_bytes"))
      .select(col("doc_id"), col("n_chars"), col("deflate_bytes"),
        (col("deflate_bytes").cast("double") / col("n_chars"))
          .as("compression_ratio"))
      .orderBy(col("doc_id"))

  /** Structural-oracle audit of the DEFLATE stage (the CDC-chunk
    * pattern): the per-doc deflate sizes stay engine-specific (DuckDB
    * exposes no deflate — [[compressionRatio]] keeps the per-doc
    * surface), but the stage's INVARIANTS are checkable and the totals
    * they conserve are recomputable, so the registered query is
    * hash-checked. Per source:
    *   - `n_docs` / `total_chars` — DuckDB recomputes from raw text;
    *   - `len_conservation_violations` — docs where the fixture's
    *     n_chars disagrees with length(text) (the ratio's denominator
    *     contract);
    *   - `deflate_bound_violations` — docs where the deflate size
    *     leaves (0, len + 5·⌈len/65535⌉ + 16]: the stored-block worst
    *     case of raw DEFLATE (5-byte header per 64 KiB stored block)
    *     plus slack — a compressor "compressing" past the incompress-
    *     ibility bound is broken, as is a zero/negative size;
    *   - `subadditivity_violations` — docs where deflate(text‖text) >
    *     2·deflate(text) + 16: self-concatenation must never compress
    *     WORSE than twice the original (LZ77's ≥32 KiB window makes
    *     the second copy nearly free for typical docs — the
    *     "repetition compresses" property the quality filter rides).
    * The oracle pins the three counters to literal 0.
    *
    * Scale: one narrow codegen'd map over documents (two deflate
    * calls per doc), one source-keyed fold.
    */
  def compressionAudit(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"), col("n_chars"),
        length(col("text")).cast("long").as("len"),
        graft.functions.DeflateSize(col("text")).as("d1"),
        graft.functions.DeflateSize(concat(col("text"), col("text")))
          .as("d2"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(when(col("n_chars") =!= col("len"), 1L).otherwise(0L))
          .as("len_conservation_violations"),
        sum(when(col("d1") <= 0L
          || col("d1") > col("len")
            + lit(5L) * expr("(len + 65534L) div 65535L") + lit(16L), 1L)
          .otherwise(0L)).as("deflate_bound_violations"),
        sum(when(col("d2") > lit(2L) * col("d1") + lit(16L), 1L)
          .otherwise(0L)).as("subadditivity_violations"))
      .orderBy(col("source"))

  val compressionAuditSql: String =
    """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(0 AS BIGINT) AS len_conservation_violations,
      |  CAST(0 AS BIGINT) AS deflate_bound_violations,
      |  CAST(0 AS BIGINT) AS subadditivity_violations
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // --- feature hashing (hashing-trick vectorizer) ------------------------
  /** Bag-of-words → fixed 64-dimension sparse count vector via the
    * hashing trick (Weinberger et al., "Feature Hashing for Large Scale
    * Multitask Learning", 2009): each token hashes to a bucket, the
    * vector is the per-bucket count — no vocabulary build, no global
    * state, which is the point at corpus scale (a vocabulary is a
    * corpus-wide distinct + broadcast; a hash is a narrow map).
    * Emitted sparse as (doc_id, bucket, n) rows, count-bounded by
    * min(64, n_tokens) per document.
    *
    * The bucket function is md5-prefix mod 64 — deliberately engine-
    * portable (Spark and DuckDB md5 agree byte-for-byte; xxhash64
    * implementations would not), so the oracle checks real values.
    */
  def hashFeatures(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(words).as("word"))
      .select(col("doc_id"),
        (conv(substring(md5(col("word")), 1, 2), 16, 10).cast("long") % 64)
          .as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("doc_id"), col("bucket"))

  val hashFeaturesSql: String =
    """WITH w AS (SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
      |           FROM documents)
      |SELECT doc_id,
      | CAST(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
      |        + strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 64
      |   AS BIGINT) AS bucket,
      | COUNT(*) AS n
      |FROM w GROUP BY doc_id, bucket ORDER BY doc_id, bucket""".stripMargin

  // --- DSIR importance weighting ----------------------------------------
  /** Data Selection via Importance Resampling weights (Xie et al.,
    * NeurIPS 2023, arXiv:2302.03169): score every document by the
    * log-likelihood ratio between a TARGET-domain hashed-bigram
    * unigram model and the raw-corpus model,
    * `w(d) = sum_b n_db * (ln p_b - ln q_b)` with Laplace-smoothed
    * bucket probabilities `p_b = (t_b+1)/(T+m)`, `q_b = (c_b+1)/(C+m)`.
    * High-weight docs look like the target domain (here: lang = 'en',
    * the corpus's majority language, standing in for "high-quality
    * reference corpus"); resampling by these weights is the published
    * method for steering a 100 TB crawl toward a target distribution.
    *
    * Determinism: the four ln arguments are all integers (counts + 1,
    * totals + m), so the whole weight rides as exact-integer MICRONATS
    * — same discipline (and same exhaustively-swept [1, 2e7] ln
    * domain) as [[tfidfTerms]] / [[perplexity]]. The bucket function is
    * the engine-portable md5-prefix of [[hashFeatures]]: 3 hex chars =
    * exactly 4096 buckets, no modulo.
    *
    * Shape at scale (the DSIR selling point): the MODEL is fixed-size
    * — m = 4096 buckets regardless of corpus size — so both bucket
    * tables broadcast by construction (unlike a vocabulary, which
    * grows with the corpus). The corpus crosses the wire once as
    * (doc_id, bucket) pairs; scoring is one broadcast join + one
    * per-doc sum. Docs under 2 words have no bigrams and drop out
    * (mirrored by the oracle).
    */
  def importanceDsir(s: SparkSession, dir: String,
                     targetLang: String = "en"): DataFrame = {
    val m = 4096
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val bg = docs(s, dir)
      // Tokenize once per document (see [[bigrams]] — the inlined
      // spelling is O(words²) per doc).
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(slice(w, 1, size(w) - 1),
          |  (x, i) -> concat(x, ' ', w[i + 1]))""".stripMargin)).as("bigram"))
      .select(col("doc_id"), col("lang"),
        conv(substring(md5(col("bigram")), 1, 3), 16, 10).cast("long")
          .as("bucket"))
    val perDoc = bg.groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("n_db"))
    val model = bg.groupBy(col("bucket")).agg(
      count(lit(1)).as("c_b"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("t_b"))
    val totals = model.agg(sum(col("c_b")).as("c_tot"),
      sum(col("t_b")).as("t_tot"))
    perDoc.join(broadcast(model), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_db") * (lnMicro(col("t_b") + 1) - lnMicro(col("c_b") + 1)))
          .as("ratio_part"),
        sum(col("n_db")).as("n_bigrams"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_bigrams"),
        (col("ratio_part") + col("n_bigrams")
          * (lnMicro(col("c_tot") + m) - lnMicro(col("t_tot") + m)))
          .as("weight_micronats"))
      .orderBy(col("doc_id"))
  }

  val importanceDsirSql: String =
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
      |           FROM documents),
      |b AS (SELECT doc_id, lang,
      |        unnest(list_transform(range(1, len(w)),
      |          i -> w[i] || ' ' || w[i+1])) AS bigram FROM t),
      |h AS (SELECT doc_id, lang,
      |  CAST((strpos('0123456789abcdef', substr(md5(bigram), 1, 1)) - 1) * 256
      |     + (strpos('0123456789abcdef', substr(md5(bigram), 2, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(md5(bigram), 3, 1)) - 1)
      |    AS BIGINT) AS bucket FROM b),
      |pd AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS n_db
      |       FROM h GROUP BY doc_id, bucket),
      |mdl AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c_b,
      |          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |            AS t_b
      |        FROM h GROUP BY bucket),
      |tot AS (SELECT CAST(SUM(c_b) AS BIGINT) AS c_tot,
      |               CAST(SUM(t_b) AS BIGINT) AS t_tot FROM mdl),
      |sc AS (SELECT doc_id,
      |         SUM(n_db * (CAST(round(ln(CAST(t_b + 1 AS DOUBLE)) * 1e6) AS BIGINT)
      |                   - CAST(round(ln(CAST(c_b + 1 AS DOUBLE)) * 1e6) AS BIGINT)))
      |           AS ratio_part,
      |         SUM(n_db) AS n_bigrams
      |       FROM pd JOIN mdl USING (bucket) GROUP BY doc_id)
      |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |  CAST(ratio_part + n_bigrams *
      |    (CAST(round(ln(CAST(c_tot + 4096 AS DOUBLE)) * 1e6) AS BIGINT)
      |   - CAST(round(ln(CAST(t_tot + 4096 AS DOUBLE)) * 1e6) AS BIGINT))
      |    AS BIGINT) AS weight_micronats
      |FROM sc CROSS JOIN tot ORDER BY doc_id""".stripMargin

  // --- canonical normalization ------------------------------------------
  /** Canonical text form for byte-level dedup: Unicode NFC + Unicode
    * lowercase + ASCII-whitespace collapse, one codegen'd pass per doc
    * ([[graft.functions.NormalizeText]] — Spark has no NFC built-in, and
    * the 3-pass regexp_replace+lower spelling allocates two intermediate
    * strings per document). `changed` marks docs whose bytes moved, the
    * usual audit column when re-canonicalizing a 100 TB corpus in place.
    * Narrow map, no shuffle; the final sort is presentation-only.
    *
    * NFC/lowercase are identities on this ASCII corpus, so the DuckDB
    * oracle (nfc_normalize + lower + same explicit whitespace class)
    * checks the full plumbing; the unicode legs (composed/decomposed
    * parity, final-sigma, NBSP non-collapse) are pinned by
    * FunctionsSpec fixtures.
    */
  def normalizeText(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        graft.functions.NormalizeText(col("text")).as("norm_text"),
        (graft.functions.NormalizeText(col("text")) =!= col("text"))
          .as("changed"))
      .orderBy(col("doc_id"))

  val normalizeTextSql: String =
    """SELECT doc_id,
      | TRIM(regexp_replace(lower(nfc_normalize(text)),
      |                     '[ \t\n\r\f]+', ' ', 'g'), ' ') AS norm_text,
      | TRIM(regexp_replace(lower(nfc_normalize(text)),
      |                     '[ \t\n\r\f]+', ' ', 'g'), ' ') <> text AS changed
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- sliding-window chunking ------------------------------------------
  /** RAG-style sliding-window chunking: fixed 50-token chunks on a
    * 40-token stride (10-token overlap so no retrieval-relevant span is
    * cut at a boundary). Distinct from [[Sampling.packChunks]] (which
    * packs WHOLE documents into token budgets): this splits WITHIN
    * documents. sequence+posexplode+slice are all codegen'd built-ins;
    * the op is a narrow one-to-many map — no shuffle, no state, and at
    * 100 TB it parallelizes embarrassingly (each doc expands ~n/40-fold
    * independently of every other).
    */
  def chunkSliding(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), words.as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 1, lit(40))).as("start"))
      // a window that starts inside the previous window's 10-token
      // overlap region would be FULLY contained in it (start >= n - 10
      // means the previous window already reached the end) — emitting
      // it duplicates its tokens twice over with zero new coverage
      .filter(col("start") === 0 || col("start") < size(col("w")) - 10)
      .select(
        col("doc_id"), (col("start") / 40).cast("long").as("chunk_id"),
        col("start").cast("long").as("start_token"),
        least(lit(50), size(col("w")) - col("start")).cast("long")
          .as("n_tokens"),
        array_join(slice(col("w"), col("start") + 1, lit(50)), " ")
          .as("chunk"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val chunkSlidingSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |s AS (SELECT doc_id, w, unnest(range(0, len(w), 40)) AS start
      |      FROM t),
      |c AS (SELECT doc_id, start,
      |             ${PortableSql.intDiv("start", "40")} AS chunk_id,
      |             CAST(LEAST(50, len(w) - start) AS BIGINT) AS n_tokens,
      |             array_to_string(list_slice(w, start + 1,
      |                                        LEAST(start + 50, len(w))), ' ')
      |               AS chunk
      |      FROM s
      |      WHERE start = 0 OR start < len(w) - 10)
      |SELECT doc_id, chunk_id, CAST(start AS BIGINT) AS start_token,
      |       n_tokens, chunk
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // --- BPE merge-pair induction ------------------------------------------
  /** One induction step of byte-pair-encoding tokenizer training: count
    * adjacent symbol pairs (here: character pairs, i.e. the first merge
    * round) across the corpus, weighted by word frequency — the pair
    * with the highest count is the next merge rule (Sennrich et al.,
    * "Neural Machine Translation of Rare Words with Subword Units",
    * ACL 2016). Top-20 reported with full tie-break.
    *
    * The scale property that makes BPE trainable on a 100 TB corpus is
    * exactly this shape: the corpus collapses to a (word, count)
    * VOCABULARY table first (one shuffle on the word), and every merge
    * iteration then runs over the vocabulary — millions of rows — not
    * the corpus. Pair extraction is a narrow per-word map (2-char
    * substrings via transform over positions); the final pair
    * aggregation is vocabulary-sized.
    */
  def bpeMergeStep(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(words).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"), col("n"))
      .groupBy(col("pair")).agg(sum(col("n")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(20)

  val bpeMergeStepSql: String =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |f AS (SELECT word, COUNT(*) AS n FROM w
      |      WHERE length(word) >= 2 GROUP BY word),
      |p AS (SELECT substring(word, i, 2) AS pair, n
      |      FROM f, unnest(range(1, length(word))) AS u(i))
      |SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences
      |FROM p GROUP BY pair
      |ORDER BY n_occurrences DESC, pair LIMIT 20""".stripMargin

  /** Multi-round BPE induction — the trainable loop [[bpeMergeStep]] is
    * one step of: each round counts adjacent SYMBOL pairs over the
    * vocabulary (weighted by word count), takes the most frequent pair
    * as the next merge rule, APPLIES it to every vocabulary word
    * (greedy left-to-right, non-overlapping — the Sennrich 2016
    * convention), and recounts. Output: one row per round,
    * `(round, a, b, n_occurrences)`, the merge table in induction
    * order — which IS the trained tokenizer.
    *
    * Scale shape, preserved per iteration: the corpus collapses to the
    * (word, count) vocabulary ONCE; every round's pair count, argmax,
    * and merge application are vocabulary-sized (millions of rows at
    * 100 TB, never the corpus). The per-round driver sync is ONE row —
    * the winning rule — which is irreducible: rule k+1's counts depend
    * on rule k having been applied (this is the same
    * iterate-with-metadata-sync posture as k-means training). Each
    * round's vocab is re-materialized ([[graft.Graft.materialize]]) so
    * the plan doesn't grow by a fold per round. The merge fold runs as
    * a codegen'd higher-order `aggregate`: symbols accumulate
    * left-to-right, the rule fires whenever the accumulator's tail is
    * `a` and the next symbol is `b` — on "aaa" with rule (a,a) that
    * yields [aa, a], the non-overlapping greedy BPE convention.
    *
    * No SQL oracle: the loop is adaptive (round k's query depends on
    * round k-1's answer), so AnalyticsOpsSpec pins it against an
    * independent driver-side reference induction instead.
    */
  def bpeTrain(s: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val (rules, _) = bpeCore(s, dir, rounds)
    import s.implicits._
    rules.toDF("round", "a", "b", "n_occurrences")
      .select(col("round").cast("long").as("round"), col("a"), col("b"),
        col("n_occurrences"))
  }

  /** The shared induction loop behind [[bpeTrain]] and [[bpeEncode]]:
    * returns the merge rules AND the post-merge (syms, n) vocabulary —
    * the trainer has already applied every rule it learned, so encoding
    * reuses its final state instead of replaying the merges (halves the
    * cost of `text_bpe_encode`, which previously ran train THEN re-fold).
    */
  private def bpeCore(s: SparkSession, dir: String, rounds: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var vocab = graft.Graft.materialize(
      docs(s, dir)
        .select(explode(words).as("word"))
        .filter(length(col("word")) >= 2)
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .select(expr("split(word, '')").as("syms"), col("n")))
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = vocab
        .select(explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS a,
            |              element_at(syms, i + 1) AS b))""".stripMargin))
          .as("p"), col("n"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += ((r, a, b, cnt))
        val merged = aggregate(
          col("syms"),
          array().cast("array<string>"),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(element_at(acc, -1), x))))
            .otherwise(concat(acc, array(x))))
        vocab = graft.Graft.materialize(
          vocab.select(merged.as("syms"), col("n")))
        r += 1
      }
    }
    (rules.toSeq, vocab)
  }

  /** BPE ENCODE — apply the merges [[bpeTrain]] induced back onto the
    * corpus and emit the resulting token histogram (token,
    * n_occurrences). This closes the train→apply loop: the tokenizer a
    * data pipeline trains is only useful if the same engine can encode
    * with it.
    *
    * Scale shape mirrors training: the corpus collapses ONCE to the
    * (word, count) vocabulary, every merge rule is then a narrow
    * per-word fold over vocabulary rows (the same left-to-right
    * `aggregate` lambda the trainer used to apply its winning pair, so
    * encode semantics are trainer-identical by construction), and the
    * final histogram is a vocabulary-sized aggregation. Document text
    * never re-enters an exchange after the first collapse; rules are
    * rule-count-sized on the driver.
    *
    * No SQL oracle (the rules come from the adaptive training loop);
    * AnalyticsOpsSpec pins (a) exact character conservation — summing
    * len(token)·count over the histogram reproduces the corpus's
    * letter mass — (b) that no learned pair survives adjacent in the
    * encoded vocabulary, and (c) per-word round-trip: concatenating a
    * word's tokens reproduces the word.
    */
  def bpeEncode(s: SparkSession, dir: String, rounds: Int = 3): DataFrame =
    encodedVocab(s, dir, rounds)
      .select(explode(col("syms")).as("token"), col("n"))
      .groupBy(col("token")).agg(sum(col("n")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))

  /** The encoded (word, syms, n) vocabulary behind [[bpeEncode]] —
    * exposed package-private so the spec can check round-trip and
    * residual-pair properties at word grain. The ≥2-char words come
    * straight from the trainer's final state (merges already applied;
    * the word is recovered as the concatenation of its symbols, exact
    * by the round-trip invariant the spec pins); 1-char words — which
    * no merge can touch — are appended as single-symbol rows, so the
    * union covers every word of the corpus exactly once.
    */
  private[graft] def encodedVocab(s: SparkSession, dir: String,
                                  rounds: Int): DataFrame =
    encodedVocabWithRules(s, dir, rounds)._2

  private[graft] def encodedVocabWithRules(s: SparkSession, dir: String,
      rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    val (rules, trained) = bpeCore(s, dir, rounds)
    val shorts = docs(s, dir)
      .select(explode(words).as("word"))
      .filter(length(col("word")) === 1)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(col("word"), array(col("word")).as("syms"), col("n"))
    (rules, trained
      .select(concat_ws("", col("syms")).as("word"), col("syms"), col("n"))
      .unionAll(shorts))
  }

  /** Registry spelling of `text_bpe_encode` since r17 (VERDICT r16
    * item 2, the structural-audit pattern): the token stream depends on
    * the adaptively-trained merge rules (no SQL dual), but the encode
    * CONTRACT is checkable and its conserved inputs are recomputable
    * from raw text:
    *
    *   - '''round-trip''' — decoding every encoded vocabulary word
    *     (concatenating its symbols) must reproduce the corpus
    *     vocabulary EXACTLY: `vocab_words_not_in_corpus`,
    *     `corpus_words_not_in_vocab` (a full-outer word join against an
    *     independently recomputed (word, count) table) and
    *     `count_mismatches` all pinned 0 — any symbol corruption breaks
    *     the join or the multiplicity;
    *   - '''merges applied exhaustively''' —
    *     `residual_pair_violations` pinned 0: no learned (a, b) rule
    *     survives adjacent anywhere in the encoded vocabulary (the
    *     greedy fold must have consumed every occurrence it is defined
    *     to consume; checked with the rules as literals over adjacent
    *     symbol pairs);
    *   - exact columns DuckDB recomputes from `documents`:
    *     `n_distinct_words`, `n_word_occurrences`, and
    *     `total_char_mass` — the last computed Spark-side from the
    *     TOKEN HISTOGRAM (Σ len(token)·count over [[bpeEncode]]'s
    *     output), so the hash equality IS the character-conservation
    *     law tying the emitted token stream to the raw corpus.
    *
    * The token histogram itself stays the AnalyticsOpsSpec-pinned
    * [[bpeEncode]] API (independent merge-round induction, per-word
    * round-trip, residual-pair absence at word grain).
    */
  def bpeEncodeAudit(s: SparkSession, dir: String,
                     rounds: Int = 3): DataFrame = {
    val (rules, vocab0) = encodedVocabWithRules(s, dir, rounds)
    val vocab = graft.Graft.materialize(vocab0)
    // independent raw (word, count) table — same fold the trainer used,
    // but joined at WORD grain against the trainer's final state
    val raw = docs(s, dir)
      .select(explode(words).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("n_raw"))
    // U+0001 as the pair separator: the corpus separator is ' ', so no
    // token contains it, making the adjacency key collision-free
    val ruleKeys = rules.map { case (_, a, b, _) => a + "\u0001" + b }
    // sequence(1, 0) DESCENDS in Spark, so a single-symbol word (every
    // 1-char word; any fully-merged word) needs the explicit empty case
    val adjacent = expr(
      """CASE WHEN size(syms) < 2 THEN array()
        |ELSE transform(sequence(1, size(syms) - 1),
        |  i -> concat(element_at(syms, i), char(1), element_at(syms, i + 1)))
        |END""".stripMargin)
    val joined = vocab
      .withColumn("residual",
        if (ruleKeys.isEmpty) lit(false)
        else arrays_overlap(adjacent, typedLit(ruleKeys)))
      .join(raw, Seq("word"), "full_outer")
    val vocabAgg = joined.agg(
      coalesce(sum(when(col("n_raw").isNull, 1L).otherwise(0L)), lit(0L))
        .as("vocab_words_not_in_corpus"),
      coalesce(sum(when(col("n").isNull, 1L).otherwise(0L)), lit(0L))
        .as("corpus_words_not_in_vocab"),
      coalesce(sum(when(col("n").isNotNull && col("n_raw").isNotNull &&
        col("n") =!= col("n_raw"), 1L).otherwise(0L)), lit(0L))
        .as("count_mismatches"),
      coalesce(sum(when(col("residual"), 1L).otherwise(0L)), lit(0L))
        .as("residual_pair_violations"),
      count(col("n_raw")).as("n_distinct_words"),
      coalesce(sum(col("n_raw")), lit(0L)).as("n_word_occurrences"))
    // char conservation measured on the EMITTED token histogram
    val hist = vocab
      .select(explode(col("syms")).as("token"), col("n"))
      .agg(coalesce(sum(length(col("token")).cast("long") * col("n")), lit(0L))
        .as("total_char_mass"))
    vocabAgg.crossJoin(broadcast(hist))
      .select(col("n_distinct_words"), col("n_word_occurrences"),
        col("total_char_mass"), col("vocab_words_not_in_corpus"),
        col("corpus_words_not_in_vocab"), col("count_mismatches"),
        col("residual_pair_violations"))
  }

  /** DuckDB twin of [[bpeEncodeAudit]] — the corpus vocabulary size,
    * word mass and character mass recomputed from raw text, the four
    * violation counters as contract constants.
    */
  val bpeEncodeAuditSql: String =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |f AS (SELECT word, COUNT(*) AS n FROM w
      |      WHERE length(word) >= 1 GROUP BY word)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
      |  CAST(SUM(n) AS BIGINT) AS n_word_occurrences,
      |  CAST(SUM(length(word) * n) AS BIGINT) AS total_char_mass,
      |  CAST(0 AS BIGINT) AS vocab_words_not_in_corpus,
      |  CAST(0 AS BIGINT) AS corpus_words_not_in_vocab,
      |  CAST(0 AS BIGINT) AS count_mismatches,
      |  CAST(0 AS BIGINT) AS residual_pair_violations
      |FROM f""".stripMargin

  // --- TF-IDF top terms ----------------------------------------------------
  /** Per-document top-3 terms by TF-IDF — the other classic term-weight
    * (complements [[bm25TopTerms]], which deliberately avoided
    * logarithms). The idf factor rides as integer MICRONATS,
    * `round(ln(N)*1e6) - round(ln(df)*1e6)`, multiplied by the integer
    * tf — so the score is an exact BIGINT and hash parity needs no
    * floating-point discipline at all (ln parity over the integer
    * domain [1, 2e7] is exhaustively verified; see [[perplexity]]).
    *
    * Shape: one (doc, term) aggregation, a term-keyed df aggregation
    * over it, a 1-row broadcast for N, and a per-doc top-k window over
    * (doc, term, score) triples — document text never enters an
    * exchange (same scale posture as BM25).
    */
  def tfidfTerms(s: SparkSession, dir: String): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val tf = docs(s, dir)
      .select(col("doc_id"), explode(words).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_micronats").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") * (lnMicro(col("n_docs")) - lnMicro(col("df"))))
          .as("score_micronats"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
        col("score_micronats"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val tfidfTermsSql: String =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM t WHERE len(term) > 0 GROUP BY doc_id, term),
      |d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      |sc AS (SELECT doc_id, term, tf, df,
      |         tf * (CAST(round(ln(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT)
      |             - CAST(round(ln(CAST(df AS DOUBLE)) * 1e6) AS BIGINT))
      |           AS score_micronats
      |       FROM tf JOIN d USING (term) CROSS JOIN n),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
      |        ORDER BY score_micronats DESC, term) AS BIGINT) AS rnk
      |      FROM sc)
      |SELECT doc_id, rnk, term, tf, df, score_micronats
      |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // --- per-document perplexity under the corpus trigram LM ----------------
  /** Perplexity-style quality scoring — the canonical LLM-corpus filter
    * (CCNet-style: score each document by how predictable it is under a
    * language model; prune the tails). The LM is the corpus's own
    * trigram model, so every document trigram is in-vocabulary and the
    * per-token surprise is -ln P(w3|w1w2) = ln c2 - ln c3 over exact
    * integer counts.
    *
    * Hash-exact across engines by construction: each log rides as
    * MICRONATS — `round(ln(count)*1e6)` cast to BIGINT — and the
    * per-document total is an exact integer sum (order-free), with one
    * final IEEE division for the per-token average. Java `Math.log` and
    * DuckDB `ln` were verified to agree after micronat rounding over
    * the ENTIRE integer domain n in [1, 2e7] (exhaustive sweep, zero
    * mismatches; PerplexitySpec re-pins a sample), and Spark's HALF_UP
    * double round cannot disagree with C `round` on positive values
    * because a shortest-repr double and its binary value can never
    * straddle an x.5 boundary (x.5 is itself representable). Counts stay
    * far below 2e7 at any tested SF; the spec asserts the bound.
    *
    * Scale: the corpus is exploded ONCE into per-document gram counts
    * (doc_id, context, next_word, k) — one gram-keyed aggregation with
    * map-side combine — and `localCheckpoint`ed so the model derives
    * from the same materialization the probe side reads (without it,
    * Catalyst re-runs the split/transform/explode subtree for every
    * consumer; same durability trade as pagerank's adjacency — a lost
    * executor recomputes, `checkpoint(reliable)` is the cluster
    * spelling). The model (c3) and its context totals (c2) are
    * aggregates over DISTINCT doc-grams, so their join is model-sized,
    * not corpus-sized; the probe then shuffles gram-count rows exactly
    * once. Per-doc surprise rides as k·(lnµc2 − lnµc3), an exact
    * integer identical to summing per occurrence. At 100 TB the same
    * plan holds with the grams hashed to 64-bit ints (xxhash64) so the
    * exchange carries fixed-width keys, and a frequency-pruned model
    * (top-V per context, CMS backstop for the tail) broadcast instead
    * of shuffled.
    */
  def perplexity(s: SparkSession, dir: String): DataFrame = {
    // Grams ride every exchange as two fixed-width 64-bit hashes
    // (gram_h keys the trigram, ctx_h its two-word context) instead of
    // the strings themselves — the output exposes only per-document
    // integer sums, never gram keys, so grouping by hash is
    // observation-equivalent unless xxhash64 collides (~1e-7 at a
    // billion distinct grams; a collision would merge two counts and
    // fail the hash-exact oracle gate loudly rather than silently).
    val docGrams = graft.Graft.materialize(docs(s, dir)
      // Tokenize ONCE per document in a lower projection: inlining
      // `split` into the transform lambda re-tokenizes the whole text
      // for every element (`w[i+1]` is a full split) — O(words²) per
      // doc. CollapseProject keeps the alias separate because it is
      // non-cheap and multiply-referenced.
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """transform(slice(w, 1, greatest(size(w) - 2, 0)),
          |  (x, i) -> struct(xxhash64(concat(x, ' ', w[i + 1])) AS ctx_h,
          |            xxhash64(concat(x, ' ', w[i + 1]), w[i + 2])
          |              AS gram_h))""".stripMargin)).as("t"))
      .groupBy(col("t.gram_h").as("gram_h"), col("t.ctx_h").as("ctx_h"),
        col("doc_id"))
      .agg(count(lit(1)).as("k"))
      // Pin the materialized partitioning to the gram key: the model
      // aggregation (groupBy gram_h) and the probe join both reuse it
      // exchange-free — the checkpoint preserves the physical
      // partitioning in the LogicalRDD it leaves behind.
      .repartition(col("gram_h")))
    val model = docGrams.groupBy(col("gram_h"), col("ctx_h"))
      .agg(sum(col("k")).as("c3"))
    val ctx = model.groupBy(col("ctx_h")).agg(sum(col("c3")).as("c2"))
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val scored = model.join(ctx, Seq("ctx_h"))
      .select(col("gram_h"),
        (lnMicro(col("c2")) - lnMicro(col("c3"))).as("surprise"))
    docGrams
      .join(scored, Seq("gram_h"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_grams"),
        sum(col("k") * col("surprise")).as("surprise_micronats"))
      .select(col("doc_id"), col("n_grams"), col("surprise_micronats"),
        (col("surprise_micronats").cast("double") / col("n_grams").cast("double"))
          .as("avg_surprise_micronats"))
      .orderBy(col("doc_id"))
  }

  val perplexitySql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, w[i] || ' ' || w[i + 1] AS context,
      |             w[i + 2] AS next_word
      |      FROM t, unnest(range(1, len(w) - 1)) AS u(i)
      |      WHERE len(w) >= 3),
      |m AS (SELECT context, next_word, CAST(COUNT(*) AS BIGINT) AS c3
      |      FROM g GROUP BY 1, 2),
      |c AS (SELECT context, CAST(SUM(c3) AS BIGINT) AS c2 FROM m GROUP BY 1),
      |s AS (SELECT g.doc_id,
      |        CAST(round(ln(CAST(c.c2 AS DOUBLE)) * 1e6) AS BIGINT)
      |      - CAST(round(ln(CAST(m.c3 AS DOUBLE)) * 1e6) AS BIGINT) AS surprise
      |      FROM g
      |      JOIN m ON g.context = m.context AND g.next_word = m.next_word
      |      JOIN c ON g.context = c.context)
      |SELECT doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(surprise) AS BIGINT) AS surprise_micronats,
      |  CAST(CAST(SUM(surprise) AS BIGINT) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS avg_surprise_micronats
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- CCNet perplexity buckets -----------------------------------------------
  /** CCNet's language-model quality split (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", LREC 2020): per language, rank documents by LM surprise
    * ([[perplexity]]'s trigram model) and cut the ranking into equal
    * HEAD / MIDDLE / TAIL terciles — head (lowest perplexity) is what
    * CCNet keeps for training, tail is what it drops. Output: per
    * (lang, bucket) the doc count, gram mass, and the bucket's
    * surprise range.
    *
    * Determinism: the rank key `avg_surprise_micronats` is one IEEE
    * division of exact BIGINTs (bit-identical both engines, the
    * perplexity oracle proves it), ties break on doc_id, and the
    * tercile id is exact integer arithmetic `(3·(ig−1)) div n_lang`.
    *
    * Scale shape — GROUPED [[graft.Graft.rankedByRange]], the
    * [[Relational.quantilesExact]] pattern: a per-LANG rank window
    * would funnel the corpus through |langs| ≈ 3 reducers; instead ONE
    * global range-partitioned rank over (lang, surprise, doc_id)
    * yields contiguous per-lang blocks, the |langs|-row block offsets
    * broadcast back (driver-side sort in UTF-8 byte order = Spark's
    * range-partition order), and the group-local rank is a subtraction.
    * The rollup is a ~3·3-row aggregate.
    */
  def ccnetBuckets(s: SparkSession, dir: String): DataFrame = {
    val ppl = perplexity(s, dir)
      .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
      .select(col("lang"), col("doc_id"), col("n_grams"),
        col("avg_surprise_micronats").as("avg_s"))
    val ranked = graft.Graft.materialize(graft.Graft.rankedByRange(ppl,
      col("lang"), col("avg_s"), col("doc_id")))
    val counts = ranked.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)(graft.Graft.utf8Order)
    val offsets = counts.scanLeft(("", 0L)) { case ((_, acc), (l, n)) =>
      (l, acc + n)
    }.init.zip(counts).map { case ((_, off), (l, n)) => (l, off, n) }
    val offDf = s.createDataFrame(offsets.toSeq)
      .toDF("lang", "off", "n_lang")
    ranked.join(broadcast(offDf), Seq("lang"))
      .withColumn("ig", col("i") - col("off"))
      .withColumn("bucket_id", expr("(3 * (ig - 1)) div n_lang"))
      .groupBy(col("lang"), col("bucket_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_grams")).as("n_grams"),
        min(col("avg_s")).as("avg_surprise_lo"),
        max(col("avg_s")).as("avg_surprise_hi"))
      .select(col("lang"), col("bucket_id"),
        element_at(typedLit(Seq("head", "middle", "tail")),
          col("bucket_id").cast("int") + 1).as("bucket"),
        col("n_docs"), col("n_grams"),
        col("avg_surprise_lo"), col("avg_surprise_hi"))
      .orderBy(col("lang"), col("bucket_id"))
  }

  val ccnetBucketsSql: String = {
    val bid = PortableSql.intDiv("3 * (ig - 1)", "n_lang")
    s"""WITH ppl AS (${perplexitySql.replace("\n", "\n|  ")}),
      |dl AS (
      |  SELECT p.doc_id, d.lang, p.n_grams,
      |    p.avg_surprise_micronats AS avg_s
      |  FROM ppl p JOIN documents d USING (doc_id)),
      |r AS (
      |  SELECT lang, n_grams, avg_s,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY avg_s, doc_id) AS BIGINT) AS ig,
      |    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
      |  FROM dl),
      |b AS (SELECT lang, $bid AS bucket_id, n_grams, avg_s FROM r)
      |SELECT lang, bucket_id,
      |  CASE bucket_id WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
      |       ELSE 'tail' END AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_grams) AS BIGINT) AS n_grams,
      |  MIN(avg_s) AS avg_surprise_lo, MAX(avg_s) AS avg_surprise_hi
      |FROM b GROUP BY lang, bucket_id
      |ORDER BY lang, bucket_id""".stripMargin
  }

  // --- tokenizer vocabulary coverage ----------------------------------------
  /** Coverage of a top-K frequency vocabulary per language — the
    * fertility/OOV audit run before fixing a tokenizer vocabulary for
    * training (the coverage table in SentencePiece's model reports;
    * Kudo & Richardson, EMNLP 2018). The vocabulary is the corpus's
    * own top 500 tokens by (frequency desc, token asc) — the
    * deterministic tie order both engines honor — and each language
    * reports total tokens, vocabulary-covered tokens, and the
    * coverage ratio (one IEEE division of exact counts).
    *
    * Scale shape: the vocabulary is a bounded top-K — one hash
    * aggregation by term then TakeOrderedAndProject (no global sort,
    * no single-partition window) — and is BROADCAST back onto the
    * token stream, so the corpus never joins another corpus-sized
    * side; the tokens themselves never shuffle (map-side partial
    * counts in the vocab pass, map-side broadcast probe + partial
    * counts in the coverage pass — two scans, zero corpus-sized
    * exchanges). At 100 TB the same plan holds: the vocab stays K
    * rows no matter the corpus size.
    */
  def vocabCoverage(s: SparkSession, dir: String, k: Int = 500): DataFrame = {
    val tok = docs(s, dir)
      .select(col("lang"), explode(words).as("term"))
      .filter(length(col("term")) > 0)
    val vocab = tok.groupBy(col("term"))
      .agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("term"))
      .limit(k)
      .select(col("term"), lit(1).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("term"), "left_outer")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNotNull, 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("lang"), col("n_tokens"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_tokens").cast("double"))
          .as("coverage"))
      .orderBy(col("lang"))
  }

  val vocabCoverageSql: String =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
      |tk AS (SELECT lang, term FROM tok WHERE len(term) > 0),
      |freq AS (SELECT term, COUNT(*) AS f FROM tk GROUP BY term),
      |vocab AS (
      |  SELECT term FROM (
      |    SELECT term, row_number() OVER (ORDER BY f DESC, term) AS rnk
      |    FROM freq) WHERE rnk <= 500)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_covered,
      |  CAST(SUM(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS coverage
      |FROM tk LEFT JOIN vocab v USING (term)
      |GROUP BY lang ORDER BY lang""".stripMargin

  // --- per-document keyword extraction ---------------------------------------
  /** Top-3 TF-IDF keywords per document — the per-DOC leg of the
    * corpus-level [[tfidfTerms]]: the extracted keywords a search
    * index, dedup explainer, or topic labeler attaches to every
    * document. Score = tf · (lnµ(N) − lnµ(df)) with tf, N, df exact
    * BIGINTs and the idf an integer micronat — so the score is an
    * exact BIGINT and the per-doc rank can't flip on float noise; ties
    * break on the term string. The reported tfidf scales by one IEEE
    * division.
    *
    * Shape: one tokenize pass → (doc, term) tf aggregate; df is a
    * term-keyed aggregate of that SAME intermediate joined back
    * term-keyed (no second corpus scan); the top-3 cut is a rank
    * window bounded per doc.
    */
  def docKeywords(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val tf = graft.Graft.materialize(
      docs(s, dir).select(col("doc_id"), explode(words).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs(s, dir).agg(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (lnMicro(col("n_docs")) - lnMicro(col("df"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("score"),
        (col("score").cast("double") / 1e6).as("tfidf"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val docKeywordsSql: String =
    """WITH tk AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM tk WHERE len(term) > 0 GROUP BY doc_id, term),
      |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      |      FROM documents),
      |sc AS (
      |  SELECT doc_id, tf.term,
      |    tf * (CAST(round(ln(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT)
      |        - CAST(round(ln(CAST(df AS DOUBLE)) * 1e6) AS BIGINT)) AS score
      |  FROM tf JOIN df ON tf.term = df.term, n),
      |r AS (
      |  SELECT doc_id, term, score,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, term) AS BIGINT) AS rnk
      |  FROM sc)
      |SELECT doc_id, rnk, term, score, CAST(score AS DOUBLE) / 1e6 AS tfidf
      |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // --- Jensen–Shannon divergence between language vocabularies --------------
  /** Jensen–Shannon divergence between the English and German term
    * distributions (Lin, IEEE IT 1991) — the symmetric, finite
    * vocabulary-distance a mixture curator tracks when deciding
    * whether two corpus slices are interchangeable (0 = identical,
    * ln 2 ≈ 0.693 = disjoint).
    *
    * EXACT micronat discipline end-to-end: with term counts c₁,c₂ and
    * totals n₁,n₂, the ratio p/m equals the INTEGER ratio
    * 2·c₁·n₂ / (c₁·n₂ + c₂·n₁), so each KL term rides as the exact
    * BIGINT product c₁·(lnµ(2c₁n₂) − lnµ(c₁n₂+c₂n₁)); both KL sums
    * are exact BIGINTs and the one IEEE step is the final two
    * divisions and a halved add. Absent terms contribute exactly 0 to
    * their side, as the limit prescribes.
    *
    * Scale shape: one tokenize pass over the two slices into a
    * map-side-combined per-term conditional aggregate (the PSI
    * two-sided-count shape on a term key); the 1-row totals broadcast
    * back. Nothing but the term dictionary is ever exchanged.
    */
  def jsdLangs(s: SparkSession, dir: String,
               langA: String = "en", langB: String = "de"): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val terms = docs(s, dir).filter(col("lang").isin(langA, langB))
      .select(col("lang"), explode(words).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"))
      .agg(sum(when(col("lang") === langA, 1L).otherwise(0L)).as("c1"),
        sum(when(col("lang") === langB, 1L).otherwise(0L)).as("c2"))
    val tot = terms.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
      count(lit(1)).as("n_terms"))
    val mix = col("c1") * col("n2") + col("c2") * col("n1")
    terms.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"), col("n_terms"),
        when(col("c1") > 0,
          col("c1") * (lnMicro(lit(2L) * col("c1") * col("n2")) - lnMicro(mix)))
          .otherwise(0L).as("ta"),
        when(col("c2") > 0,
          col("c2") * (lnMicro(lit(2L) * col("c2") * col("n1")) - lnMicro(mix)))
          .otherwise(0L).as("tb"))
      .groupBy(col("n1"), col("n2"), col("n_terms"))
      .agg(sum(col("ta")).as("sa"), sum(col("tb")).as("sb"))
      .select(col("n1"), col("n2"), col("n_terms"),
        ((col("sa").cast("double") / (col("n1").cast("double") * 1e6)
          + col("sb").cast("double") / (col("n2").cast("double") * 1e6))
          / 2.0).as("jsd_nats"))
  }

  val jsdLangsSql: String =
    """WITH tk AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS term
      |  FROM documents WHERE lang IN ('en', 'de')),
      |c AS (
      |  SELECT term,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM tk WHERE len(term) > 0 GROUP BY term),
      |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |             CAST(SUM(c2) AS BIGINT) AS n2,
      |             CAST(COUNT(*) AS BIGINT) AS n_terms
      |      FROM c),
      |k AS (
      |  SELECT n1, n2, n_terms,
      |    CASE WHEN c1 > 0 THEN c1 *
      |      (CAST(round(ln(CAST(2 * c1 * n2 AS DOUBLE)) * 1e6) AS BIGINT)
      |       - CAST(round(ln(CAST(c1 * n2 + c2 * n1 AS DOUBLE)) * 1e6) AS BIGINT))
      |      ELSE 0 END AS ta,
      |    CASE WHEN c2 > 0 THEN c2 *
      |      (CAST(round(ln(CAST(2 * c2 * n1 AS DOUBLE)) * 1e6) AS BIGINT)
      |       - CAST(round(ln(CAST(c1 * n2 + c2 * n1 AS DOUBLE)) * 1e6) AS BIGINT))
      |      ELSE 0 END AS tb
      |  FROM c, t),
      |agg AS (
      |  SELECT n1, n2, n_terms, CAST(SUM(ta) AS BIGINT) AS sa,
      |         CAST(SUM(tb) AS BIGINT) AS sb
      |  FROM k GROUP BY n1, n2, n_terms)
      |SELECT n1, n2, n_terms,
      |  (CAST(sa AS DOUBLE) / (CAST(n1 AS DOUBLE) * 1e6)
      |   + CAST(sb AS DOUBLE) / (CAST(n2 AS DOUBLE) * 1e6)) / 2.0 AS jsd_nats
      |FROM agg""".stripMargin

  // --- token-length histogram per source ----------------------------------------
  /** Per-source document-length histogram in power-of-two token
    * buckets — the sequence-length distribution every training-data
    * pipeline plots before packing/truncation decisions (a source
    * whose mass sits past the model context length wastes tokens to
    * truncation; one collapsed into tiny buckets wastes padding).
    * Complements [[Sampling]]'s pack_chunks (which consumes these
    * lengths) and `text_token_count` (per-doc raw counts).
    *
    * Determinism: bucket = floor(log2(n_tokens)) is deterministic
    * across engines — IEEE log2 is exact at powers of two and no
    * other integer sits within an ulp of an integer log2 — and all
    * counts/extrema/sums are exact BIGINTs; the share is one IEEE
    * division.
    *
    * Scale: one scan, one map-side-combined fold into the
    * |sources|·~log2(maxlen) grid (≲ 300 cells at any corpus size).
    */
  def lengthHistogram(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("source"), size(words).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0L)
      .select(col("source"), col("n_tok"),
        floor(log2(col("n_tok"))).cast("long").as("bucket"))
    val grid = base.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), min(col("n_tok")).as("min_tokens"),
        max(col("n_tok")).as("max_tokens"), sum(col("n_tok")).as("sum_tokens"))
    val tot = grid.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("src_docs"))
    grid.join(tot, "source")
      .select(col("source"), col("bucket"),
        expr("shiftleft(cast(1 as bigint), cast(bucket as int))")
          .as("bucket_lo"),
        col("n_docs"), col("min_tokens"), col("max_tokens"),
        col("sum_tokens"),
        (col("n_docs").cast("double") / col("src_docs").cast("double"))
          .as("share"))
      .orderBy(col("source"), col("bucket"))
  }

  val lengthHistogramSql: String =
    """WITH d AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |b AS (
      |  SELECT source, n_tok,
      |    CAST(floor(log2(CAST(n_tok AS DOUBLE))) AS BIGINT) AS bucket
      |  FROM d WHERE n_tok > 0),
      |g AS (
      |  SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    MIN(n_tok) AS min_tokens, MAX(n_tok) AS max_tokens,
      |    CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
      |  FROM b GROUP BY source, bucket),
      |t AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS src_docs
      |      FROM g GROUP BY source)
      |SELECT g.source, bucket,
      |  CAST(1 AS BIGINT) << CAST(bucket AS INT) AS bucket_lo,
      |  n_docs, min_tokens, max_tokens, sum_tokens,
      |  CAST(n_docs AS DOUBLE) / CAST(src_docs AS DOUBLE) AS share
      |FROM g JOIN t ON g.source = t.source
      |ORDER BY g.source, bucket""".stripMargin

  // --- pairwise source JSD matrix ---------------------------------------------
  /** Pairwise Jensen–Shannon divergence between ALL source token
    * distributions, restricted to the top-K corpus vocabulary — the
    * source-similarity matrix a data-mixing run reads before weighting:
    * two crawl sources with near-zero JSD are distributional
    * near-duplicates (over-weighting both double-counts one voice),
    * and a source far from every peer is an outlier worth auditing.
    * Extends [[jsdLangs]] (one fixed language pair) to the full
    * |sources|² grid; the top-K restriction is what keeps the pair
    * stage bounded — K·pairs rows regardless of corpus size — and is
    * standard practice (tail tokens contribute negligible JSD mass).
    *
    * Determinism: the [[jsdLangs]] integer identity per term —
    * c_a·(lnμ(2·c_a·n_b) − lnμ(c_a·n_b + c_b·n_a)) with every lnμ an
    * integer micronat of an exact BIGINT product — so per-pair sums
    * are exact BIGINTs and the JSD is a fixed IEEE chain (exact while
    * c·n < 2⁶³, the jsdLangs bound). Zero-count sides contribute 0 by
    * the same guard; the DENSE vocab×source grid (coalesced zeros)
    * keeps the mix term correct where only one source uses a word.
    * Top-K selection orders by (count DESC, term) — fully tie-broken.
    *
    * Scale: one token fold into (term, source) counts; top-K cut is a
    * distributed TakeOrderedAndProject on the corpus vocabulary; all
    * later stages are K·|sources|²-bounded with broadcast grids.
    */
  // --- cross-lingual vocabulary overlap ------------------------------------
  /** Top-K vocabulary Jaccard for every language pair — the
    * cross-lingual sharing read a tokenizer team makes before sizing a
    * multilingual vocab (high overlap ⇒ shared subwords amortize;
    * disjoint scripts ⇒ per-lang budget): per language the top-`topK`
    * terms by frequency (count desc, then term — fully deterministic),
    * then |A∩B| / |A∪B| per unordered pair.
    *
    * Exactness: term counts are integers, the top-K cut is a
    * lang-PARTITIONED rank (never a global window), set sizes are
    * exact COUNTs, Jaccard is one IEEE division of exact integers.
    *
    * Scale: one map-side-combined (lang, term) fold; the rank's
    * exchange carries (lang, term, count) — vocabulary-sized, not
    * corpus-sized; the pair join runs on |langs|·topK rows
    * (metadata at any corpus size).
    */
  def vocabOverlap(s: SparkSession, dir: String, topK: Int = 200): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("term"))
    // materialized: three consumers (both join sides + sizes) would
    // otherwise each re-run the corpus fold — at 100 TB that is the
    // difference between one scan and three; the checkpointed frame is
    // |langs|·topK rows
    val top = graft.Graft.materialize(docs(s, dir)
      .select(col("lang"), explode(words).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("lang"), col("term")))
    val a = top.select(col("lang").as("lang_a"), col("term"))
    val b = top.select(col("lang").as("lang_b"), col("term"))
    val sizes = top.groupBy(col("lang")).agg(count(lit(1)).as("k"))
    val inter = a.join(b, Seq("term"))
      .filter(col("lang_a") < col("lang_b"))
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).as("n_shared"))
    val grid = sizes.select(col("lang").as("lang_a"), col("k").as("k_a"))
      .join(sizes.select(col("lang").as("lang_b"), col("k").as("k_b")),
        col("lang_a") < col("lang_b"))
    grid.join(inter, Seq("lang_a", "lang_b"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .select(col("lang_a"), col("lang_b"), col("k_a"), col("k_b"),
        col("n_shared"),
        (col("n_shared").cast("double")
          / (col("k_a") + col("k_b") - col("n_shared")).cast("double"))
          .as("jaccard"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  def vocabOverlapSql(topK: Int = 200): String =
    s"""WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
      |cnt AS (SELECT lang, term, COUNT(*) AS n FROM tok
      |        WHERE len(term) > 0 GROUP BY lang, term),
      |top AS (
      |  SELECT lang, term FROM (
      |    SELECT lang, term,
      |      row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rnk
      |    FROM cnt) r
      |  WHERE rnk <= $topK),
      |sz AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS k FROM top GROUP BY lang),
      |inter AS (
      |  SELECT a.lang AS lang_a, b.lang AS lang_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_shared
      |  FROM top a JOIN top b ON a.term = b.term AND a.lang < b.lang
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT sa.lang AS lang_a, sb.lang AS lang_b,
      |         sa.k AS k_a, sb.k AS k_b
      |  FROM sz sa JOIN sz sb ON sa.lang < sb.lang)
      |SELECT lang_a, lang_b, k_a, k_b,
      |  CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
      |  CAST(COALESCE(n_shared, 0) AS DOUBLE)
      |    / CAST(k_a + k_b - COALESCE(n_shared, 0) AS DOUBLE) AS jaccard
      |FROM grid LEFT JOIN inter USING (lang_a, lang_b)
      |ORDER BY lang_a, lang_b""".stripMargin

  // --- pairwise length-distribution KS ---------------------------------------
  /** Exact two-sample Kolmogorov–Smirnov distance between every pair
    * of languages' token-length distributions — the corpus-composition
    * drift matrix (which language subcorpora have structurally
    * different document shapes, the upstream read behind per-lang
    * packing/chunking choices). For each unordered pair, D =
    * max |F̂_a − F̂_b| over the merged length grid, computed on the
    * exact integer lattice |cumA·n_b − cumB·n_a| (the [[graft.queries.Drift.ks]]
    * discipline, per pair), so the matrix hash-matches despite being
    * a supremum over empirical CDFs.
    *
    * Scale: the corpus folds once to (lang, n_tok) counts
    * (vocabulary-of-lengths-sized); the pair expansion and cumsum
    * windows run PARTITIONED by pair over that bounded grid —
    * |langs|²·|distinct lengths| rows, never corpus-sized.
    */
  def lengthKsPairs(s: SparkSession, dir: String): DataFrame = {
    // materialized: four consumers (two join sides, totals, the
    // distinct length grid) — one corpus scan instead of four; the
    // checkpointed frame is (lang, distinct length)-sized
    val lens = graft.Graft.materialize(docs(s, dir)
      .select(col("lang"), size(words).cast("long").as("n_tok"))
      .groupBy(col("lang"), col("n_tok")).agg(count(lit(1)).as("c")))
    val tot = lens.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    val a = lens.select(col("lang").as("lang_a"), col("n_tok"), col("c").as("ca"))
    val b = lens.select(col("lang").as("lang_b"), col("n_tok"), col("c").as("cb"))
    // merged per-pair length grid: full outer on n_tok within each pair
    val pairGrid = tot.select(col("lang").as("lang_a"), col("n").as("na"))
      .join(tot.select(col("lang").as("lang_b"), col("n").as("nb")),
        col("lang_a") < col("lang_b"))
    val merged = pairGrid
      .crossJoin(lens.select(col("n_tok")).distinct())
      .join(a, Seq("lang_a", "n_tok"), "left")
      .join(b, Seq("lang_b", "n_tok"), "left")
      .select(col("lang_a"), col("lang_b"), col("na"), col("nb"), col("n_tok"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .filter(col("ca") > 0L || col("cb") > 0L)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang_a"), col("lang_b")).orderBy(col("n_tok"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    merged
      .select(col("lang_a"), col("lang_b"), col("na"), col("nb"),
        sum(col("ca")).over(wCum).as("cumA"),
        sum(col("cb")).over(wCum).as("cumB"))
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(abs(col("cumA") * col("nb") - col("cumB") * col("na")))
          .as("d_scaled"))
      .select(col("lang_a"), col("lang_b"), col("n_a"), col("n_b"),
        col("d_scaled"),
        (col("d_scaled").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("ks"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  val lengthKsPairsSql: String =
    """WITH lens AS (
      |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY lang, n_tok),
      |tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM lens GROUP BY lang),
      |grid AS (
      |  SELECT ta.lang AS lang_a, tb.lang AS lang_b, ta.n AS na, tb.n AS nb
      |  FROM tot ta JOIN tot tb ON ta.lang < tb.lang),
      |lg AS (SELECT DISTINCT n_tok FROM lens),
      |merged AS (
      |  SELECT g.lang_a, g.lang_b, g.na, g.nb, lg.n_tok,
      |    COALESCE(a.c, 0) AS ca, COALESCE(b.c, 0) AS cb
      |  FROM grid g CROSS JOIN lg
      |  LEFT JOIN lens a ON a.lang = g.lang_a AND a.n_tok = lg.n_tok
      |  LEFT JOIN lens b ON b.lang = g.lang_b AND b.n_tok = lg.n_tok
      |  WHERE COALESCE(a.c, 0) > 0 OR COALESCE(b.c, 0) > 0),
      |cum AS (
      |  SELECT lang_a, lang_b, na, nb,
      |    CAST(SUM(ca) OVER (PARTITION BY lang_a, lang_b ORDER BY n_tok
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumA,
      |    CAST(SUM(cb) OVER (PARTITION BY lang_a, lang_b ORDER BY n_tok
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumB
      |  FROM merged)
      |SELECT lang_a, lang_b, MAX(na) AS n_a, MAX(nb) AS n_b,
      |  CAST(MAX(ABS(cumA * nb - cumB * na)) AS BIGINT) AS d_scaled,
      |  CAST(MAX(ABS(cumA * nb - cumB * na)) AS DOUBLE)
      |    / (CAST(MAX(na) AS DOUBLE) * CAST(MAX(nb) AS DOUBLE)) AS ks
      |FROM cum GROUP BY lang_a, lang_b
      |ORDER BY lang_a, lang_b""".stripMargin

  def sourceJsd(s: SparkSession, dir: String, topK: Int = 500): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val tok = docs(s, dir)
      .select(col("source"), explode(words).as("term"))
      .filter(length(col("term")) > 0)
    val perSrc = tok.groupBy(col("term"), col("source"))
      .agg(count(lit(1)).as("c"))
    val vocab = perSrc.groupBy(col("term"))
      .agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(topK)
      .select(col("term"))
    val sources = perSrc.select(col("source")).distinct()
    val dense = broadcast(vocab).crossJoin(broadcast(sources))
      .join(perSrc, Seq("term", "source"), "left")
      .select(col("term"), col("source"), coalesce(col("c"), lit(0L)).as("c"))
    val tots = dense.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val a = dense.select(col("term"), col("source").as("source_a"),
      col("c").as("ca"))
    val b = dense.select(col("term"), col("source").as("source_b"),
      col("c").as("cb"))
    val na = col("n_a"); val nb = col("n_b")
    val mix = col("ca") * nb + col("cb") * na
    a.join(b, "term").filter(col("source_a") < col("source_b"))
      .join(broadcast(tots.select(col("source").as("source_a"),
        col("n").as("n_a"))), "source_a")
      .join(broadcast(tots.select(col("source").as("source_b"),
        col("n").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), na, nb,
        when(col("ca") > 0,
          col("ca") * (lnMicro(lit(2L) * col("ca") * nb) - lnMicro(mix)))
          .otherwise(0L).as("ta"),
        when(col("cb") > 0,
          col("cb") * (lnMicro(lit(2L) * col("cb") * na) - lnMicro(mix)))
          .otherwise(0L).as("tb"))
      .groupBy(col("source_a"), col("source_b"), na, nb)
      .agg(sum(col("ta")).as("sa"), sum(col("tb")).as("sb"))
      .select(col("source_a"), col("source_b"), na, nb,
        ((col("sa").cast("double") / (na.cast("double") * lit(1e6))
          + col("sb").cast("double") / (nb.cast("double") * lit(1e6)))
          / lit(2.0)).as("jsd_nats"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** DuckDB twin of [[sourceJsd]], derived from the SAME topK. */
  def sourceJsdSql(topK: Int = 500): String = {
    def lnu(v: String): String =
      s"CAST(round(ln(CAST($v AS DOUBLE)) * 1e6) AS BIGINT)"
    s"""WITH tk AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |ps AS (
      |  SELECT term, source, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tk WHERE len(term) > 0 GROUP BY term, source),
      |vocab AS (
      |  SELECT term FROM (
      |    SELECT term, CAST(SUM(c) AS BIGINT) AS cnt FROM ps GROUP BY term)
      |  ORDER BY cnt DESC, term LIMIT $topK),
      |srcs AS (SELECT DISTINCT source FROM ps),
      |dense AS (
      |  SELECT v.term, s.source, COALESCE(ps.c, 0) AS c
      |  FROM vocab v CROSS JOIN srcs s
      |  LEFT JOIN ps ON ps.term = v.term AND ps.source = s.source),
      |tots AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
      |         FROM dense GROUP BY source),
      |p AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    ta.n AS n_a, tb.n AS n_b, a.c AS ca, b.c AS cb
      |  FROM dense a JOIN dense b ON a.term = b.term
      |    AND a.source < b.source
      |  JOIN tots ta ON ta.source = a.source
      |  JOIN tots tb ON tb.source = b.source),
      |k AS (
      |  SELECT source_a, source_b, n_a, n_b,
      |    CASE WHEN ca > 0 THEN ca *
      |      (${lnu("2 * ca * n_b")} - ${lnu("ca * n_b + cb * n_a")})
      |      ELSE 0 END AS ta,
      |    CASE WHEN cb > 0 THEN cb *
      |      (${lnu("2 * cb * n_a")} - ${lnu("ca * n_b + cb * n_a")})
      |      ELSE 0 END AS tb
      |  FROM p),
      |agg AS (
      |  SELECT source_a, source_b, n_a, n_b,
      |    CAST(SUM(ta) AS BIGINT) AS sa, CAST(SUM(tb) AS BIGINT) AS sb
      |  FROM k GROUP BY source_a, source_b, n_a, n_b)
      |SELECT source_a, source_b, n_a, n_b,
      |  (CAST(sa AS DOUBLE) / (CAST(n_a AS DOUBLE) * 1e6)
      |   + CAST(sb AS DOUBLE) / (CAST(n_b AS DOUBLE) * 1e6)) / 2.0
      |    AS jsd_nats
      |FROM agg ORDER BY source_a, source_b""".stripMargin
  }

  // --- Simpson lexical diversity per source -----------------------------------
  /** Simpson concentration of the token distribution per source:
    * λ = Σ_w n_w(n_w−1) / (N(N−1)) — the probability two tokens drawn
    * without replacement are the SAME word (Simpson, Nature 1948).
    * High λ = repetitive/templated source text; the diversity
    * complement of [[charEntropy]]'s character read and [[zipfSlope]]'s
    * rank-frequency read, and a standard corpus-mix quality gate (a
    * crawl source whose λ spikes is boilerplate-heavy). Reported with
    * token and vocabulary counts so the ratio has its scale visible.
    *
    * Determinism: N, V and Σ n_w(n_w−1) are exact — the pair sum
    * accumulates in DECIMAL(18,0) on both engines since n_w² outruns
    * BIGINT once a source's top token passes ~3e9 occurrences (the
    * [[TimeSeries.autocorrelation]] decimal-moments rule) — and λ is
    * one IEEE division of exact values.
    *
    * Shape: explode → ONE (source, word) hash aggregation with
    * map-side partials (the [[topTerms]] exchange), then a
    * source-keyed rollup of counts — the histogram-of-histogram
    * shape; no windows, no driver collects.
    */
  def simpsonDiversity(s: SparkSession, dir: String): DataFrame = {
    val counts = docs(s, dir)
      .select(col("source"), explode(words).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("nw"))
    val nwd = col("nw").cast("decimal(18,0)")
    counts
      .groupBy(col("source"))
      .agg(sum(col("nw")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(nwd * (nwd - lit(1))).as("s2"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        (col("s2").cast("double")
          / (col("n_tokens").cast("double")
            * (col("n_tokens").cast("double") - lit(1.0))))
          .as("simpson"))
      .orderBy(col("source"))
  }

  val simpsonDiversitySql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |cw AS (
      |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS nw
      |  FROM tok GROUP BY source, w),
      |agg AS (
      |  SELECT source, CAST(SUM(nw) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS vocab,
      |    SUM(CAST(nw AS DECIMAL(18,0)) * (CAST(nw AS DECIMAL(18,0)) - 1))
      |      AS s2
      |  FROM cw GROUP BY source)
      |SELECT source, n_tokens, vocab,
      |  CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
      |    / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0))
      |    AS simpson
      |FROM agg ORDER BY source""".stripMargin

  // --- duplicate-cluster size census ------------------------------------------
  /** Histogram of exact-duplicate cluster sizes: how many md5(text)
    * clusters have exactly k members — [[dedupExact]]'s census view,
    * the one-table read of how duplication is DISTRIBUTED (a long tail
    * of 2-copies vs a few mega-piles demand different dedup budgets;
    * the mega-pile case is what the LSH bucket cap and its audit
    * exist for). cluster_size = 1 rows count the unique documents, so
    * the histogram also totals to the corpus without a second scan.
    * Two hash aggregations (digest → cluster size → histogram), both
    * with map-side partials; output is |distinct sizes| rows.
    */
  def dedupClusterSizes(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))

  val dedupClusterSizesSql: String =
    """WITH cl AS (
      |  SELECT md5(text) AS text_hash, CAST(COUNT(*) AS BIGINT)
      |    AS cluster_size
      |  FROM documents GROUP BY md5(text))
      |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
      |FROM cl GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  // --- hapax legomena share ---------------------------------------------------
  /** Hapax legomena share per language: the fraction of each
    * language's VOCABULARY that occurs exactly once in its corpus —
    * classically ~half the vocabulary of natural text (the Zipf-tail
    * census; Baayen, "Word Frequency Distributions", 2001), and the
    * working estimate of how fast the vocabulary is still growing
    * (Good–Turing's n₁ mass). A language whose hapax share collapses
    * is template/boilerplate text; one whose share is inflated is
    * OCR noise or tokenizer breakage — both are corpus-mix gates a
    * pretraining pipeline checks beside [[zipfSlope]] and
    * [[simpsonDiversity]]. Exact integers + one IEEE division.
    *
    * Shape: explode → ONE (lang, word) count aggregation with
    * map-side partials, then a lang-keyed rollup counting vocab and
    * the n_w = 1 stratum — no windows, no collects.
    */
  def hapaxShare(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), explode(words).as("w"))
      .groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("nw"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("nw") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(col("nw")).as("n_tokens"))
      .select(col("lang"), col("n_tokens"), col("vocab"), col("hapax"),
        (col("hapax").cast("double") / col("vocab").cast("double"))
          .as("hapax_share"))
      .orderBy(col("lang"))

  val hapaxShareSql: String =
    """WITH tok AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |cw AS (
      |  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS nw
      |  FROM tok GROUP BY lang, w),
      |agg AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS vocab,
      |    CAST(SUM(CASE WHEN nw = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      |    CAST(SUM(nw) AS BIGINT) AS n_tokens
      |  FROM cw GROUP BY lang)
      |SELECT lang, n_tokens, vocab, hapax,
      |  CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE) AS hapax_share
      |FROM agg ORDER BY lang""".stripMargin

  // --- Gopher n-gram repetition filters ---------------------------------------
  /** Gopher-rule n-gram REPETITION fractions per document (Rae et al.,
    * "Scaling Language Models: ... Gopher", 2021, Table A1): the
    * fraction of n-gram-occurrence characters attributable to
    * DUPLICATED n-grams, for n = 2 and n = 3 — the word-level
    * repetition family that [[repetitionStats]]' unigram signals
    * (top-word / dup-word fraction) can't see: a document cycling a
    * 10-word boilerplate sentence has near-zero dup-WORD excess but a
    * dup-2gram fraction near 1. Gopher drops docs with top-2gram
    * fraction > 0.20 or dup-3gram attribution > 0.18; this report
    * emits the raw fractions so the threshold stays policy. (The
    * synthetic corpus has no newlines, so the line-level Gopher rules
    * have no domain here; the n-gram rules are the meaningful
    * subset.)
    *
    * Char attribution follows the published convention: each
    * occurrence of a duplicated n-gram contributes its character
    * length; overlapping occurrences count every time. All counts are
    * exact integers and each fraction is one IEEE division.
    *
    * Shape: per-doc n-gram extraction is a NARROW array transform
    * (sequence/slice/array_join — no shuffle); the only exchanges are
    * the (doc, gram)-keyed partial-count aggregations and the final
    * doc-keyed join of the two gram sizes. Nothing past the first
    * aggregation exceeds one row per distinct (doc, gram).
    */
  def gopherRepetition(s: SparkSession, dir: String): DataFrame = {
    def gramStats(n: Int, pfx: String): DataFrame =
      docs(s, dir)
        .select(col("doc_id"), explode(expr(
          // sequence(1, 0) DESCENDS in Spark, so short docs need the guard
          s"""CASE WHEN size(split(text, ' ')) >= $n THEN
             |  transform(sequence(1, size(split(text, ' ')) - ${n - 1}),
             |    i -> array_join(slice(split(text, ' '), i, $n), ' '))
             |ELSE array() END""".stripMargin)).as("gram"))
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as(s"${pfx}_grams"),
          sum(col("c") * length(col("gram"))).as("tot_chars"),
          sum(when(col("c") >= 2, col("c") * length(col("gram")))
            .otherwise(0L)).as("dup_chars"))
        .select(col("doc_id"), col(s"${pfx}_grams"),
          when(col("tot_chars") > 0,
            col("dup_chars").cast("double") / col("tot_chars").cast("double"))
            .otherwise(lit(null).cast("double")).as(s"dup_${pfx}_frac"))
    gramStats(2, "n2").join(gramStats(3, "n3"), Seq("doc_id"))
      .orderBy(col("doc_id"))
  }

  val gopherRepetitionSql: String = {
    def leg(n: Int): String =
      s"""SELECT doc_id, CAST(SUM(c) AS BIGINT) AS grams,
         |    CASE WHEN SUM(c * chars) > 0 THEN
         |      CAST(SUM(CASE WHEN c >= 2 THEN c * chars ELSE 0 END) AS DOUBLE)
         |        / CAST(SUM(c * chars) AS DOUBLE)
         |    ELSE NULL END AS frac
         |  FROM (
         |    SELECT doc_id, gram, length(gram) AS chars,
         |           CAST(COUNT(*) AS BIGINT) AS c
         |    FROM (
         |      SELECT doc_id, unnest(list_transform(
         |        range(1, greatest(len(string_split(text, ' ')) - ${n - 2}, 1)),
         |        i -> array_to_string(
         |               list_slice(string_split(text, ' '), i, i + ${n - 1}), ' ')))
         |        AS gram
         |      FROM documents)
         |    GROUP BY doc_id, gram)
         |  GROUP BY doc_id""".stripMargin
    s"""WITH g2 AS (${leg(2)}),
      |g3 AS (${leg(3)})
      |SELECT g2.doc_id, g2.grams AS n2_grams, g2.frac AS dup_n2_frac,
      |       g3.grams AS n3_grams, g3.frac AS dup_n3_frac
      |FROM g2 JOIN g3 ON g2.doc_id = g3.doc_id
      |ORDER BY g2.doc_id""".stripMargin
  }

  // --- Good–Turing frequency smoothing ----------------------------------------
  /** Good–Turing adjusted counts from the corpus WORD-TRIGRAM
    * frequency-of-frequencies (Good, Biometrika 1953; the smoothing
    * read behind Katz back-off and the Gale & Sampson 1995 "simple
    * Good-Turing" estimator): for each observed count r ≤ 10, the
    * number of trigram types N_r seen exactly r times and the
    * adjusted count r* = (r+1)·N_{r+1}/N_r — the discounted frequency
    * an n-gram language model ([[trigramLm]] is this repo's) should
    * charge instead of the raw r (and, at r = 1, the leave-one-out
    * estimate of unseen-type mass N_1/N). Trigrams, not unigrams,
    * because smoothing matters exactly where the count tail is thin —
    * the n-gram type space is where r = 1..10 lives (the synthetic
    * corpus's closed word vocabulary has no low-count unigrams at
    * all, which is also true of any web-scale corpus's stopword
    * head).
    *
    * Exact integers everywhere; r* is one IEEE division of exact
    * BIGINTs; a missing N_{r+1} bucket yields NULL (left join), never
    * 0/0.
    *
    * Shape: trigram extraction is a narrow per-doc array transform;
    * corpus → (trigram, count) (one hash aggregation) → FoF
    * (type-space-sized aggregation) → a ≤10-row self-join on r+1. The
    * corpus crosses exactly one exchange.
    */
  def goodTuring(s: SparkSession, dir: String, maxR: Int = 10): DataFrame = {
    val fof = graft.Graft.materialize(
      docs(s, dir).select(explode(expr(
        """CASE WHEN size(split(text, ' ')) >= 3 THEN
          |  transform(sequence(1, size(split(text, ' ')) - 2),
          |    i -> array_join(slice(split(text, ' '), i, 3), ' '))
          |ELSE array() END""".stripMargin)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("r"))
        .groupBy(col("r")).agg(count(lit(1)).as("n_types")))
    fof.filter(col("r") <= maxR)
      .join(fof.select((col("r") - 1L).as("r"), col("n_types").as("n_types_next")),
        Seq("r"), "left_outer")
      .select(col("r"), col("n_types"), col("n_types_next"),
        ((col("r") + 1L) * col("n_types_next")).cast("double")
          .divide(col("n_types").cast("double")).as("r_star"))
      .orderBy(col("r"))
  }

  /** SQL twin; the `maxR` cutoff derives from the same parameter as the
    * Scala spelling so a non-default call cannot silently hash-diverge. */
  def goodTuringSql(maxR: Int = 10): String =
    s"""WITH t AS (
      |  SELECT string_split(text, ' ') AS ws FROM documents),
      |g AS (
      |  SELECT unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
      |    i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS w
      |  FROM t WHERE len(ws) >= 3),
      |v AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS r
      |  FROM g GROUP BY w),
      |fof AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_types
      |        FROM v GROUP BY r)
      |SELECT a.r, a.n_types, b.n_types AS n_types_next,
      |  CAST((a.r + 1) * b.n_types AS DOUBLE) / CAST(a.n_types AS DOUBLE)
      |    AS r_star
      |FROM fof a LEFT JOIN fof b ON b.r = a.r + 1
      |WHERE a.r <= $maxR ORDER BY a.r""".stripMargin

  // --- Yule's K ---------------------------------------------------------------
  /** Yule's characteristic K per language (Yule, "The Statistical
    * Study of Literary Vocabulary", 1944): K = 10⁴·(Σ_w c_w² − N)/N²
    * — the classic repeat-rate measure of vocabulary concentration
    * that, unlike raw TTR, is approximately length-invariant (it
    * estimates the second moment of the underlying word distribution).
    * High K = formulaic/repetitive text; the corpus-level companion to
    * the per-doc [[simpsonDiversity]] (Simpson's D is the same second
    * moment normalized as a probability).
    *
    * Σc² accumulates in pairwise DECIMAL(19,0) products (a 100 TB
    * corpus can push a stopword's count past the int64-square bound —
    * the hugeint-path rule); N² is a double product of an exact cast.
    * K is a fixed IEEE chain on bit-identical inputs.
    *
    * Shape: one (lang, word) hash aggregation with map-side combine,
    * then a lang-sized rollup. Vocabulary-bounded after the first
    * exchange.
    */
  // --- Pielou evenness -----------------------------------------------------------
  /** PIELOU'S EVENNESS J = H / ln V per language (Pielou, J. Theor.
    * Biol. 1966): Shannon entropy of the token distribution normalized
    * by its maximum — the [0,1] "how uniformly is the vocabulary used"
    * read that separates a natural text from keyword-stuffed or
    * template spam independent of vocabulary SIZE (which [[yuleK]] and
    * Simpson capture). J near 1 = uniform usage; low J = a few tokens
    * dominate.
    *
    * Exact spelling: H = (N·lnµN − Σ c·lnµc) / (N·10⁶) — the entropy
    * identity on integer micronat logs; Σ c·lnµc accumulates in
    * DECIMAL (SF-growing, the theil `wg` rule) and converts through
    * the VARCHAR round-trip (BENCHNOTES round 13). J is one further
    * IEEE division, NULL-guarded for a single-token vocabulary
    * (ln V = 0).
    *
    * Shape: identical to [[yuleK]] — (lang, token) counts collapse
    * map-side; everything after the second exchange is lang-grid-sized.
    */
  def pielouEvenness(s: SparkSession, dir: String): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val d18 = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(18, 0))
    docs(s, dir).select(col("lang"), explode(words).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(d18(col("c")) * d18(lnMicro(col("c")))).as("clnc"))
      .select(col("lang"), col("n_tokens"), col("vocab"),
        ((col("n_tokens").cast("double")
          * lnMicro(col("n_tokens")).cast("double")
          - col("clnc").cast("double"))
          / (col("n_tokens").cast("double") * lit(1e6)))
          .as("entropy_nats"))
      .withColumn("pielou_j",
        when(col("vocab") > 1L,
          col("entropy_nats")
            / (lnMicro(col("vocab")).cast("double") / lit(1e6))))
      .orderBy(col("lang"))
  }

  val pielouEvennessSql: String =
    """WITH tok AS (
      |  SELECT lang, w
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  WHERE len(w) > 0),
      |c AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
      |      FROM tok GROUP BY lang, w),
      |g AS (
      |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS vocab,
      |    SUM(CAST(c AS DECIMAL(18,0))
      |        * CAST(CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)
      |               AS DECIMAL(18,0))) AS clnc
      |  FROM c GROUP BY lang),
      |e AS (
      |  SELECT lang, n_tokens, vocab,
      |    (CAST(n_tokens AS DOUBLE)
      |       * CAST(CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
      |              AS DOUBLE)
      |     - CAST(CAST(clnc AS VARCHAR) AS DOUBLE))
      |    / (CAST(n_tokens AS DOUBLE) * 1e6) AS entropy_nats
      |  FROM g)
      |SELECT lang, n_tokens, vocab, entropy_nats,
      |  CASE WHEN vocab > 1 THEN entropy_nats
      |    / (CAST(CAST(round(ln(CAST(vocab AS DOUBLE)) * 1e6) AS BIGINT)
      |            AS DOUBLE) / 1e6) END AS pielou_j
      |FROM e ORDER BY lang""".stripMargin

  def yuleK(s: SparkSession, dir: String): DataFrame = {
    val d19 = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(19, 0))
    docs(s, dir).select(col("lang"), explode(words).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(d19(col("c")) * d19(col("c"))).as("s2"))
      .select(col("lang"), col("n_tokens"), col("vocab"),
        (lit(1e4) * (col("s2").cast("double") - col("n_tokens").cast("double"))
          / (col("n_tokens").cast("double") * col("n_tokens").cast("double")))
          .as("yule_k"))
      .orderBy(col("lang"))
  }

  val yuleKSql: String =
    """WITH c AS (
      |  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  WHERE len(w) > 0 GROUP BY lang, w),
      |g AS (
      |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS vocab,
      |    SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS s2
      |  FROM c GROUP BY lang)
      |SELECT lang, n_tokens, vocab,
      |  1e4 * (CAST(CAST(s2 AS VARCHAR) AS DOUBLE) - CAST(n_tokens AS DOUBLE))
      |    / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS yule_k
      |FROM g ORDER BY lang""".stripMargin

  // --- moving-average type-token ratio ----------------------------------------
  /** MATTR — Moving-Average Type-Token Ratio per document (Covington
    * & McFall, J. Quantitative Linguistics 2010): the mean TTR over
    * every 25-token sliding window, the standard length-independent
    * lexical-diversity measure (raw TTR decays with document length,
    * so [[tokenCount]]'s n_unique/n ratio can't compare a tweet to a
    * book; MATTR can). Spelled exactly: Σᵢ distinct(window i) is an
    * exact integer sum, and MATTR = that sum / (25 · n_windows) is one
    * IEEE division. Documents shorter than the window report NULL.
    *
    * Shape: the whole computation is a NARROW per-document array fold
    * (sequence → slice → array_distinct → aggregate) — zero shuffles
    * beyond the scan; each document's work is O(n·25). The windowed
    * distinct never leaves the row, so at 100 TB this is
    * embarrassingly parallel map work.
    */
  def mattr(s: SparkSession, dir: String, w: Int = 25): DataFrame =
    docs(s, dir)
      // bind the tokenization ONCE in a prior select: the window sum
      // references the array three times, and relying on Catalyst CSE
      // to collapse three `split(text, ' ')` calls is fragile — a
      // materialized column makes the single-split plan structural
      .select(col("doc_id"), words.as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        expr(
          s"""CASE WHEN size(ws) >= $w THEN
             |  aggregate(
             |    transform(sequence(1, size(ws) - ${w - 1}),
             |      i -> size(array_distinct(slice(ws, i, $w)))),
             |    0L, (acc, x) -> acc + x)
             |END""".stripMargin).as("sum_distinct"))
      .select(col("doc_id"), col("n_tokens"), col("sum_distinct"),
        (col("sum_distinct").cast("double")
          / (lit(w.toDouble) * (col("n_tokens") - lit((w - 1).toLong)).cast("double")))
          .as("mattr"))
      .orderBy(col("doc_id"))

  // --- word burstiness ---------------------------------------------------------
  /** Word BURSTINESS for the 30 highest-document-frequency words
    * (Church & Gale, "Poisson Mixtures", Nat. Lang. Eng. 1995): the
    * probability a word recurs in a document given it appeared at all
    * — P(c ≥ 2 | c ≥ 1) = df₂/df — against the Poisson prediction
    * from its rate (content words are bursty, function words are not;
    * a high-burstiness high-df token in a crawl is the classic
    * boilerplate fingerprint, which is why curation pipelines read
    * this before building stopword or template filters). Reported per
    * word: df, df₂, total occurrences, burstiness, and the mean
    * within-document count among containing docs.
    *
    * Exact integers + two IEEE divisions; the top-30 cut is
    * `orderBy().limit()` (TakeOrderedAndProject — distributed, never a
    * global rank window), ties broken on the word string.
    *
    * Shape: (doc, word) partial counts collapse map-side; everything
    * after the first exchange is one row per distinct (doc, word),
    * then one per word.
    */
  def wordBurstiness(s: SparkSession, dir: String, k: Int = 30): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(words).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("df"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("df2"),
        sum(col("c")).as("occurrences"))
      .select(col("w").as("word"), col("df"), col("df2"), col("occurrences"),
        (col("df2").cast("double") / col("df").cast("double"))
          .as("burstiness"),
        (col("occurrences").cast("double") / col("df").cast("double"))
          .as("mean_count_in_doc"))
      .orderBy(col("df").desc, col("word"))
      .limit(k)

  /** SQL twin; `k` derives from the same parameter as the Scala limit. */
  def wordBurstinessSql(k: Int = 30): String =
    s"""WITH c AS (
      |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  WHERE len(w) > 0 GROUP BY doc_id, w),
      |g AS (
      |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS df,
      |    CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2,
      |    CAST(SUM(c) AS BIGINT) AS occurrences
      |  FROM c GROUP BY w)
      |SELECT word, df, df2, occurrences,
      |  CAST(df2 AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness,
      |  CAST(occurrences AS DOUBLE) / CAST(df AS DOUBLE) AS mean_count_in_doc
      |FROM g ORDER BY df DESC, word LIMIT $k""".stripMargin

  // --- language-ID precision / recall / F1 -------------------------------------
  /** Per-class PRECISION / RECALL / F1 of the [[langGuessConfusion]]
    * heuristic against the labeled `lang` column — the standard
    * classifier-evaluation triple (van Rijsbergen, Information
    * Retrieval 1979) the confusion matrix feeds: langGuessConfusion
    * emits the raw cells; this reduces them to the per-class report a
    * model card actually quotes. Truth labels are mapped onto the
    * classifier's own 3-class codomain (en / es / other) so precision
    * is well-defined for every class.
    *
    * Exact integer tp/fp/fn; precision/recall/F1 are guarded IEEE
    * divisions (an unpredicted class yields NULL precision, not NaN —
    * the repo's NULL-not-NaN rule).
    *
    * Shape: one corpus aggregation to the ≤9-cell confusion grid, then
    * class-sized arithmetic.
    */
  def langIdPrf(s: SparkSession, dir: String): DataFrame = {
    val guess = when(col("text").contains("the"), "en")
      .when(col("text").contains("la"), "es")
      .otherwise("other")
    val truth = when(col("lang").isin("en", "es"), col("lang"))
      .otherwise("other")
    // one corpus scan: the ≤9-cell grid is checkpointed before the
    // three per-class aggregates re-read it
    val cells = graft.Graft.materialize(docs(s, dir)
      .groupBy(truth.as("truth"), guess.as("guess"))
      .agg(count(lit(1)).as("n")))
    val classes = Seq("en", "es", "other")
    val perClass = classes.map { c =>
      cells.agg(
        coalesce(sum(when(col("truth") === c && col("guess") === c,
          col("n"))), lit(0L)).as("tp"),
        coalesce(sum(when(col("truth") =!= c && col("guess") === c,
          col("n"))), lit(0L)).as("fp"),
        coalesce(sum(when(col("truth") === c && col("guess") =!= c,
          col("n"))), lit(0L)).as("fn"))
        .select(lit(c).as("class"), col("tp"), col("fp"), col("fn"))
    }.reduce(_ unionByName _)
    perClass
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double")))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double")))
      .withColumn("f1",
        when((col("tp") * 2L + col("fp") + col("fn")) > 0,
          (col("tp") * 2L).cast("double")
            / (col("tp") * 2L + col("fp") + col("fn")).cast("double")))
      .orderBy(col("class"))
  }

  // --- Heaps' law ----------------------------------------------------------------
  /** HEAPS' LAW fit V(n) ≈ K·n^β over the corpus vocabulary-growth
    * curve (Heaps, Information Retrieval 1978; Herdan 1960): running
    * token count vs running distinct-type count in doc_id order, log-log
    * least squares on a BOUNDED checkpoint grid. β predicts vocabulary
    * (and hence tokenizer/embedding-table) growth when the corpus
    * scales 100× — the capacity-planning read an LLM-data pipeline
    * wants before fixing a vocab size.
    *
    * Scale spelling: the two running sums ride
    * [[graft.Graft.cumSumByRange]] (range-partitioned two-pass exact
    * prefix sums — partition-PARALLEL, never a `SUM OVER (ORDER BY)`
    * one-task funnel), and the regression consumes only ≤ `points`
    * equally-spaced checkpoints (two parameters need no 10⁸-point fit),
    * so moment sums stay exact BIGINT at any SF — micronat logs
    * (round(ln·1e6), exact on <2^53 integer inputs) make Σxy a
    * ~2.6e14-per-row integer, safe for 10⁴ checkpoint rows where the
    * full-grid spelling would overflow int64 at ~35k docs.
    *
    * New-type attribution is order-free: a type's first document is
    * `min(doc_id)` over its postings — one hash aggregation, no scan
    * order dependence.
    */
  def heapsLaw(s: SparkSession, dir: String, points: Int = 24): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(words).as("w"))
      .filter(length(col("w")) > 0)
    val perDoc = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    val newTypes = tok.groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
      .groupBy(col("fd")).agg(count(lit(1)).as("n_new"))
    val joined = perDoc
      .join(newTypes, perDoc("doc_id") === newTypes("fd"), "left")
      .select(perDoc("doc_id"), col("n_tok"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    // one checkpoint serves BOTH consumers (the 1-row n_docs aggregate
    // and the checkpoint filter) — never a second window/upstream pass
    val cum = graft.Graft.materialize(
      graft.Graft.cumSumByRange(joined, Seq(col("doc_id")),
        Seq((col("n_tok"), "cum_tok"), (col("n_new"), "cum_typ"),
          (lit(1L), "rn"))))
    val nDocs = cum.agg(max(col("rn")).as("n_docs"))
    def lnMicro(c: Column): Column =
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val pts = cum.crossJoin(broadcast(nDocs))
      .withColumn("step",
        expr(s"(n_docs + ${points - 1}) div ${points.toLong}"))
      .filter(pmod(col("rn"), col("step")) === 0)
      .select(lnMicro(col("cum_tok")).as("x"), lnMicro(col("cum_typ")).as("y"),
        col("cum_tok"), col("cum_typ"))
    pts
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        max(col("cum_tok")).as("tokens_at_last"),
        max(col("cum_typ")).as("types_at_last"))
      .select(col("n").as("n_points"), col("tokens_at_last"),
        col("types_at_last"),
        ((col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")))
          .as("heaps_beta"),
        col("sx"), col("sy"))
      // exp's last ulp differs between JVM and DuckDB libm (r13) —
      // land K on the MICRO grid so the wobble cannot flip the hash
      .withColumn("heaps_k",
        round(exp((col("sy").cast("double")
          - col("heaps_beta") * col("sx").cast("double"))
          / (col("n_points").cast("double") * lit(1e6))) * lit(1e6))
          .cast("long").cast("double") / lit(1e6))
      .select(col("n_points"), col("tokens_at_last"), col("types_at_last"),
        col("heaps_beta"), col("heaps_k"))
  }

  /** DuckDB twin of [[heapsLaw]], derived from the same points budget
    * so the checkpoint grids cannot drift.
    */
  def heapsLawSql(points: Int = 24): String =
    s"""WITH tok AS (
      |  SELECT doc_id, w
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  WHERE len(w) > 0),
      |pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
      |       FROM tok GROUP BY doc_id),
      |nt AS (
      |  SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_new
      |  FROM (SELECT w, MIN(doc_id) AS fd FROM tok GROUP BY w)
      |  GROUP BY fd),
      |j AS (
      |  SELECT pd.doc_id, n_tok, COALESCE(n_new, CAST(0 AS BIGINT)) AS n_new
      |  FROM pd LEFT JOIN nt ON pd.doc_id = nt.fd),
      |c AS (
      |  SELECT
      |    CAST(SUM(n_tok) OVER w AS BIGINT) AS cum_tok,
      |    CAST(SUM(n_new) OVER w AS BIGINT) AS cum_typ,
      |    CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n_docs
      |  FROM j
      |  WINDOW w AS (ORDER BY doc_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |pts AS (
      |  SELECT CAST(round(ln(CAST(cum_tok AS DOUBLE)) * 1e6) AS BIGINT) AS x,
      |    CAST(round(ln(CAST(cum_typ AS DOUBLE)) * 1e6) AS BIGINT) AS y,
      |    cum_tok, cum_typ
      |  FROM c
      |  WHERE rn % CAST((n_docs + ${points - 1}
      |                   - ((n_docs + ${points - 1}) % $points))
      |                  / $points AS BIGINT) = 0),
      |mo AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    MAX(cum_tok) AS tokens_at_last, MAX(cum_typ) AS types_at_last
      |  FROM pts),
      |fit AS (
      |  SELECT n AS n_points, tokens_at_last, types_at_last,
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS heaps_beta,
      |    sx, sy
      |  FROM mo)
      |SELECT n_points, tokens_at_last, types_at_last, heaps_beta,
      |  CAST(CAST(round(
      |    exp((CAST(sy AS DOUBLE) - heaps_beta * CAST(sx AS DOUBLE))
      |        / (CAST(n_points AS DOUBLE) * 1e6)) * 1e6) AS BIGINT)
      |    AS DOUBLE) / 1e6 AS heaps_k
      |FROM fit""".stripMargin

  // --- Cohen's kappa -------------------------------------------------------------
  /** COHEN'S KAPPA chance-corrected agreement between the
    * [[langIdPrf]] heuristic's guess and the labeled truth on the same
    * 3-class codomain (Cohen, Educ. Psychol. Meas. 1960): κ = (p_o −
    * p_e)/(1 − p_e) with p_e from the marginal products — the honest
    * version of "accuracy" when class priors are skewed, which is what
    * a curation pipeline should quote for its language router.
    *
    * Exact integers, decimal-guarded: p_o's numerator is a BIGINT cell
    * sum; the marginal-product term Σ rowₘ·colₘ is n²-scaled, so
    * operands cast to DECIMAL(19,0) (products take DuckDB's hugeint
    * path and Spark's decimal(38,0) — no int64 wrap at any corpus
    * size); κ reduces to ONE double division of two exactly-computed
    * decimal differences.
    *
    * Shape: one corpus aggregation to the ≤9-cell grid; marginals and
    * products are class-sized arithmetic.
    */
  def cohensKappa(s: SparkSession, dir: String): DataFrame = {
    val guess = when(col("text").contains("the"), "en")
      .when(col("text").contains("la"), "es")
      .otherwise("other")
    val truth = when(col("lang").isin("en", "es"), col("lang"))
      .otherwise("other")
    // one corpus scan: the ≤9-cell grid is checkpointed before its
    // three consumers (marginals x2 + agreement) re-read it
    val cells = graft.Graft.materialize(docs(s, dir)
      .groupBy(truth.as("truth"), guess.as("guess"))
      .agg(count(lit(1)).as("n")))
    val rows = cells.groupBy(col("truth").as("cls"))
      .agg(sum(col("n")).as("row_n"))
    val cols = cells.groupBy(col("guess").as("cls"))
      .agg(sum(col("n")).as("col_n"))
    val margins = rows.join(cols, Seq("cls"), "full_outer")
      .select((coalesce(col("row_n"), lit(0L)).cast("decimal(19,0)")
        * coalesce(col("col_n"), lit(0L)).cast("decimal(19,0)")).as("rc"))
      .agg(sum(col("rc")).as("s_rc"))
    val agree = cells.agg(sum(col("n")).as("n_docs"),
      coalesce(sum(when(col("truth") === col("guess"), col("n"))), lit(0L))
        .as("n_agree"))
    agree.crossJoin(broadcast(margins))
      .withColumn("n2",
        col("n_docs").cast("decimal(19,0)") * col("n_docs").cast("decimal(19,0)"))
      .withColumn("p_o",
        col("n_agree").cast("double") / col("n_docs").cast("double"))
      .withColumn("p_e", col("s_rc").cast("double") / col("n2").cast("double"))
      .select(col("n_docs"), col("n_agree"), col("p_o"), col("p_e"),
        when(col("n2") =!= col("s_rc"),
          (col("n_docs").cast("decimal(19,0)")
            * col("n_agree").cast("decimal(19,0)")
            - col("s_rc")).cast("double")
            / (col("n2") - col("s_rc")).cast("double")).as("kappa"))
  }

  val cohensKappaSql: String =
    """WITH lab AS (
      |  SELECT CASE WHEN lang IN ('en', 'es') THEN lang
      |              ELSE 'other' END AS truth,
      |         CASE WHEN contains(text, 'the') THEN 'en'
      |              WHEN contains(text, 'la') THEN 'es'
      |              ELSE 'other' END AS guess
      |  FROM documents),
      |cells AS (
      |  SELECT truth, guess, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM lab GROUP BY truth, guess),
      |r AS (SELECT truth AS cls, CAST(SUM(n) AS BIGINT) AS row_n
      |      FROM cells GROUP BY truth),
      |co AS (SELECT guess AS cls, CAST(SUM(n) AS BIGINT) AS col_n
      |       FROM cells GROUP BY guess),
      |m AS (
      |  SELECT SUM(CAST(COALESCE(row_n, 0) AS DECIMAL(19,0))
      |             * CAST(COALESCE(col_n, 0) AS DECIMAL(19,0))) AS s_rc
      |  FROM r FULL OUTER JOIN co USING (cls)),
      |a AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
      |    CAST(COALESCE(SUM(CASE WHEN truth = guess THEN n END), 0)
      |         AS BIGINT) AS n_agree
      |  FROM cells),
      |k AS (
      |  SELECT n_docs, n_agree, s_rc,
      |    CAST(n_docs AS DECIMAL(19,0)) * CAST(n_docs AS DECIMAL(19,0)) AS n2
      |  FROM a, m)
      |SELECT n_docs, n_agree,
      |  CAST(n_agree AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p_o,
      |  CAST(CAST(s_rc AS VARCHAR) AS DOUBLE) / CAST(CAST(n2 AS VARCHAR) AS DOUBLE) AS p_e,
      |  CASE WHEN n2 <> s_rc THEN
      |    CAST(CAST(CAST(n_docs AS DECIMAL(19,0))
      |              * CAST(n_agree AS DECIMAL(19,0)) - s_rc AS VARCHAR)
      |         AS DOUBLE)
      |    / CAST(CAST(n2 - s_rc AS VARCHAR) AS DOUBLE) END AS kappa
      |FROM k""".stripMargin

  val langIdPrfSql: String =
    """WITH lab AS (
      |  SELECT CASE WHEN lang IN ('en', 'es') THEN lang
      |              ELSE 'other' END AS truth,
      |         CASE WHEN contains(text, 'the') THEN 'en'
      |              WHEN contains(text, 'la') THEN 'es'
      |              ELSE 'other' END AS guess
      |  FROM documents),
      |cls AS (SELECT unnest(['en', 'es', 'other']) AS class),
      |m AS (
      |  SELECT class,
      |    CAST(COALESCE(SUM(CASE WHEN truth = class AND guess = class
      |                           THEN 1 END), 0) AS BIGINT) AS tp,
      |    CAST(COALESCE(SUM(CASE WHEN truth <> class AND guess = class
      |                           THEN 1 END), 0) AS BIGINT) AS fp,
      |    CAST(COALESCE(SUM(CASE WHEN truth = class AND guess <> class
      |                           THEN 1 END), 0) AS BIGINT) AS fn
      |  FROM cls CROSS JOIN lab GROUP BY class)
      |SELECT class, tp, fp, fn,
      |  CASE WHEN tp + fp > 0
      |       THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
      |    AS precision,
      |  CASE WHEN tp + fn > 0
      |       THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END
      |    AS recall,
      |  CASE WHEN tp * 2 + fp + fn > 0
      |       THEN CAST(tp * 2 AS DOUBLE) / CAST(tp * 2 + fp + fn AS DOUBLE) END
      |    AS f1
      |FROM m ORDER BY class""".stripMargin

  /** DuckDB twin of [[mattr]], derived from the SAME window width so
    * the two spellings cannot drift.
    */
  def mattrSql(w: Int = 25): String =
    s"""WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |s AS (
      |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
      |    CASE WHEN len(ws) >= $w THEN
      |      CAST(list_sum(list_transform(range(1, len(ws) - ${w - 2}),
      |        i -> len(list_distinct(list_slice(ws, i, i + ${w - 1})))))
      |        AS BIGINT)
      |    END AS sum_distinct
      |  FROM t)
      |SELECT doc_id, n_tokens, sum_distinct,
      |  CAST(sum_distinct AS DOUBLE)
      |    / ($w.0 * CAST(n_tokens - ${w - 1} AS DOUBLE)) AS mattr
      |FROM s ORDER BY doc_id""".stripMargin

  // --- bigram PMI collocations -----------------------------------------------
  /** Top adjacent-bigram collocations by pointwise mutual information
    * (Church & Hanks, CL 1990) with a minimum pair count — the
    * phrase/multiword-expression extraction pass a tokenizer-training
    * or phrase-mining pipeline runs over a corpus: PMI(a,b) =
    * ln( P(ab) / (P(a)·P(b)) ) with P(ab) = c_ab/B over bigram
    * positions and P(w) = c_w/N over tokens, i.e.
    * ln( c_ab·N² / (B·c_a·c_b) ). The min-count floor is the standard
    * guard against PMI's rare-pair bias.
    *
    * Determinism: all five counts are exact BIGINTs, and the PMI
    * rides the integer MICRONAT grid term-by-term — pmi_micro =
    * lnμ(c_ab) + 2·lnμ(N) − lnμ(B) − lnμ(c_a) − lnμ(c_b) is an exact
    * BIGINT (each lnμ is ln of an exact integer rounded to 1e-6), so
    * the top-k ORDER is on exact integers (word tie-break) and the
    * reported double is one scale-down.
    *
    * Scale shape: posexplode once, bigrams from ONE lead() window over
    * per-doc partitions (the high-cardinality legitimate class — the
    * [[ngramDiversity]] codegen lesson), then word-keyed map-side-
    * combined counts; the two unigram attachments are word-keyed
    * hash joins (vocab-sized sides, never broadcast-assumed), and the
    * k-row report is a distributed TakeOrderedAndProject — no global
    * rank window.
    */
  def bigramPmi(s: SparkSession, dir: String,
                minCount: Int = 5, k: Int = 30): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val wnd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = graft.Graft.materialize(
      docs(s, dir)
        .select(col("doc_id"), posexplode(words).as(Seq("pos", "w")))
        .withColumn("w2", lead(col("w"), 1).over(wnd)))
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val totals = toks.agg(count(lit(1)).as("n_tok"),
      count(col("w2")).as("n_bi"))
    val bi = toks.filter(col("w2").isNotNull)
      .groupBy(col("w").as("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= lit(minCount.toLong))
    bi
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        (lnMicro(col("c_ab")) + lit(2L) * lnMicro(col("n_tok"))
          - lnMicro(col("n_bi")) - lnMicro(col("c_a")) - lnMicro(col("c_b")))
          .as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        col("pmi_micro"),
        (col("pmi_micro").cast("double") / lit(1e6)).as("pmi"))
  }

  /** Flesch readability profile per source — reading ease and
    * Flesch–Kincaid grade (Flesch 1948; Kincaid et al. 1975) over a
    * DETERMINISTIC proxy decomposition: sentences are maximal
    * [.!?]+ punctuation runs and syllables are maximal vowel-group
    * runs [aeiouy]+ — the standard no-dictionary approximation, and a
    * pure regex both engines' (Java / RE2) character-class semantics
    * agree on exactly. The corpus-curation read: a source whose grade
    * collapses (or explodes) relative to its language peers is
    * boilerplate or OCR noise.
    *
    * Determinism: all three counts are exact BIGINTs summed per
    * source; words-per-sentence / syllables-per-word are one IEEE
    * division each, and both scores are a fixed IEEE chain on those
    * named intermediates (computed once, referenced — never respelled
    * twice). Sources with zero sentences or zero words yield NULL
    * scores by NULL propagation in both engines.
    *
    * Scale: ONE scan, three codegen'd regex/size counts per row,
    * map-side-combined fold into the |sources|-row grid.
    */
  def readability(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("source"),
        size(words).cast("long").as("w"),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
          .cast("long").as("sn"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("sy"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("sn")).as("n_sentences"), sum(col("sy")).as("n_syllables"))
    base
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        when(col("n_sentences") > 0L,
          col("n_words").cast("double") / col("n_sentences").cast("double"))
          .as("words_per_sentence"),
        when(col("n_words") > 0L,
          col("n_syllables").cast("double") / col("n_words").cast("double"))
          .as("syllables_per_word"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        col("words_per_sentence"), col("syllables_per_word"),
        (lit(206.835) - lit(1.015) * col("words_per_sentence")
          - lit(84.6) * col("syllables_per_word")).as("flesch_ease"),
        (lit(0.39) * col("words_per_sentence")
          + lit(11.8) * col("syllables_per_word") - lit(15.59))
          .as("fk_grade"))
      .orderBy(col("source"))
  }

  val readabilitySql: String =
    """WITH d AS (
      |  SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
      |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS sn,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
      |      AS sy
      |  FROM documents),
      |g AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(w) AS BIGINT) AS n_words,
      |    CAST(SUM(sn) AS BIGINT) AS n_sentences,
      |    CAST(SUM(sy) AS BIGINT) AS n_syllables
      |  FROM d GROUP BY source),
      |r AS (
      |  SELECT source, n_docs, n_words, n_sentences, n_syllables,
      |    CASE WHEN n_sentences > 0 THEN
      |      CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
      |    END AS words_per_sentence,
      |    CASE WHEN n_words > 0 THEN
      |      CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)
      |    END AS syllables_per_word
      |  FROM g)
      |SELECT source, n_docs, n_words, n_sentences, n_syllables,
      |  words_per_sentence, syllables_per_word,
      |  206.835 - 1.015 * words_per_sentence
      |    - 84.6 * syllables_per_word AS flesch_ease,
      |  0.39 * words_per_sentence + 11.8 * syllables_per_word
      |    - 15.59 AS fk_grade
      |FROM r ORDER BY source""".stripMargin

  /** DuckDB twin of [[bigramPmi]], derived from the SAME minCount/k. */
  def bigramPmiSql(minCount: Int = 5, k: Int = 30): String = {
    def lnu(v: String): String =
      s"CAST(round(ln(CAST($v AS DOUBLE)) * 1e6) AS BIGINT)"
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |p AS (SELECT doc_id, unnest(ws) AS w,
      |             generate_subscripts(ws, 1) AS pos FROM t),
      |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w FROM p GROUP BY w),
      |bp AS (
      |  SELECT a.w AS w1, c.w AS w2
      |  FROM p a JOIN p c ON a.doc_id = c.doc_id AND c.pos = a.pos + 1),
      |tot AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_tok,
      |         (SELECT CAST(COUNT(*) AS BIGINT) FROM bp) AS n_bi),
      |bi AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
      |  FROM bp GROUP BY w1, w2
      |  HAVING COUNT(*) >= $minCount),
      |j AS (
      |  SELECT bi.w1, bi.w2, bi.c_ab, a.c_w AS c_a, b.c_w AS c_b,
      |    ${lnu("bi.c_ab")} + 2 * ${lnu("n_tok")} - ${lnu("n_bi")}
      |      - ${lnu("a.c_w")} - ${lnu("b.c_w")} AS pmi_micro
      |  FROM bi JOIN uni a ON bi.w1 = a.w
      |         JOIN uni b ON bi.w2 = b.w, tot)
      |SELECT w1, w2, c_ab, c_a, c_b, pmi_micro,
      |  CAST(pmi_micro AS DOUBLE) / 1e6 AS pmi
      |FROM j ORDER BY pmi_micro DESC, w1, w2 LIMIT $k""".stripMargin
  }
}
