package graft.queries

import graft.{Graft, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / skew-diagnosis operators — the
  * dataset-management legs of a training-data pipeline (builder brief:
  * "operations a large-scale training-data pipeline would need").
  *
  * All assignment here is HASH-deterministic, never `rand()`: at 100 TB
  * a split must be (a) reproducible run-to-run so train/val/test never
  * bleed across reruns or backfills, (b) stable under repartitioning
  * (rand() is seeded per partition — adding one input file reshuffles
  * everybody's split), and (c) a pure narrow map, so sampling a petabyte
  * costs one scan with the filter pushed to it, no shuffle and no
  * driver-side coordination. The salt prefix ("split:", "sample:")
  * namespaces the hash so the same key can be split AND sampled without
  * the two decisions correlating.
  */
object Sampling {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** first hex nibble of md5(salt || key) — 16 uniform deterministic
    * buckets, identical characters in Spark and DuckDB (lowercase hex)
    */
  private def nibble(salt: String, key: org.apache.spark.sql.Column) =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 1)

  /** membership predicate of the held-out set (the same 2/16 nibble
    * bucket [[stratifiedSample]] emits) — shared so "the eval set" is
    * ONE definition across sampling and decontamination
    */
  def isHeldOut(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    nibble("sample:", key).isin("0", "1")

  /** The train (12/16) / val (2/16) / test (2/16) assignment as a pure
    * function of the key — ONE definition shared by [[hashSplit]] and
    * [[Governance.splitLeakageAudit]], so "which split is this doc in"
    * can never drift between the split report and the leakage audit.
    */
  def splitAssign(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(nibble("split:", key) < lit("c"), "train")
      .when(nibble("split:", key) < lit("e"), "val")
      .otherwise("test")

  // --- deterministic train/val/test split ------------------------------------
  /** Assign every document to train (12/16), val (2/16), or test (2/16)
    * by hash nibble, and report per-(split, lang) document and token
    * counts — the sanity report a pipeline runs right after splitting.
    * The assignment itself is a narrow map over the scan; only the
    * COUNTING aggregation shuffles (by (split, lang) — 15 groups).
    */
  def hashSplit(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        splitAssign(col("doc_id")).as("split"),
        col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
      .orderBy(col("split"), col("lang"))

  val hashSplitSql: String =
    """SELECT CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)),1,1) < 'c' THEN 'train'
      |            WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)),1,1) < 'e' THEN 'val'
      |            ELSE 'test' END AS split,
      | lang, COUNT(*) AS n_docs,
      | CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS total_tokens
      |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  // --- deterministic stratified sample ----------------------------------------
  /** A ~12.5% (2/16 hash nibbles) sample of every language stratum.
    * Because membership is a pure function of doc_id, the "sample" is a
    * VIEW, not a materialization: any downstream query composes with it
    * and the filter reaches the scan. Contrast with `ORDER BY rand()
    * LIMIT n` (a total sort, undone on every rerun) or `TABLESAMPLE`
    * (block-level, not reproducible across layouts).
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(isHeldOut(col("doc_id")))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  val stratifiedSampleSql: String =
    """SELECT doc_id, lang FROM documents
      |WHERE substr(md5('sample:' || CAST(doc_id AS VARCHAR)),1,1) IN ('0','1')
      |ORDER BY doc_id""".stripMargin

  // --- weighted sampling without replacement --------------------------------
  /** Per-language weighted sample WITHOUT replacement (top-k per
    * stratum), weights = document length: the Efraimidis–Spirakis
    * exponential-race scheme — each doc draws an exponential arrival
    * with rate = its weight, and the k smallest arrivals win. Longer
    * docs get proportionally smaller keys, so the sample tilts toward
    * them exactly as length-weighted sampling should.
    *
    * Fully deterministic AND oracle-checkable — no rand(), no fp trust:
    *   - the uniform draw is `h = first 24 bits of md5("wrs:"||doc_id)
    *     + 1` — an integer in [1, 2^24], identical in both engines;
    *   - −ln(u) = ln(2^24) − ln(h) rides as integer MICRONATS,
    *     `round(ln(x)*1e6)` per term — the same discipline (and the
    *     same exhaustively-verified [1, 2e7] ⊃ [1, 2^24] ln-parity
    *     domain) as [[TextQueries.perplexity]];
    *   - the arrival key is ONE IEEE division of that exact BIGINT by
    *     the exact weight — bit-identical given identical inputs —
    *     with doc_id as total tiebreak.
    *
    * Shape at scale: the key is a narrow map on the scan; per-stratum
    * top-k is the standard rank-window (partial top-k per partition
    * under AQE, k-bounded output). The corpus is scanned once, never
    * self-joined.
    */
  def weightedSample(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val lnMicro = (c: org.apache.spark.sql.Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val h = (conv(substring(md5(concat(lit("wrs:"), col("doc_id").cast("string"))), 1, 6),
      16, 10).cast("long") + lit(1L)).as("h")
    val keyed = docs(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), h)
      .withColumn("arrival",
        (lnMicro(lit(16777216.0)) - lnMicro(col("h"))).cast("double")
          / col("n_chars").cast("double"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("arrival"), col("doc_id"))
    keyed
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rk"))
  }

  val weightedSampleSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, lang, n_chars,
      |    ${PortableSql.hexValue("m", 6)} + 1 AS h
      |  FROM (SELECT doc_id, lang, n_chars,
      |        md5('wrs:' || CAST(doc_id AS VARCHAR)) AS m FROM documents)),
      |a AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(CAST(round(ln(16777216.0) * 1e6) AS BIGINT)
      |         - CAST(round(ln(CAST(h AS DOUBLE)) * 1e6) AS BIGINT) AS DOUBLE)
      |      / CAST(n_chars AS DOUBLE) AS arrival
      |  FROM d),
      |r AS (
      |  SELECT lang, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY arrival, doc_id) AS rk
      |  FROM a)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, n_chars
      |FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin

  // --- uniform per-stratum reservoir ----------------------------------------
  /** Uniform k-per-stratum sample — the fixed-BUDGET complement of
    * [[stratifiedSample]] (fixed RATE) and [[weightedSample]] (weighted
    * budget): every language contributes exactly min(k, |stratum|)
    * documents, each equally likely under the md5 draw. Deterministic
    * and oracle-checkable: the "random" order is the md5 hex string of
    * a salted doc id — lexicographic comparison of lowercase hex is
    * engine-identical, so no hex→int conversion is even needed — with
    * doc_id as total tiebreak.
    *
    * Scale: `row_number <= k` is Spark's WindowGroupLimit — each map
    * task pre-prunes to k rows per stratum BEFORE the exchange (the
    * [[graft.queries.EmbeddingQueries.semDedupCandidates]] head
    * discipline), so the shuffle carries k·|strata| rows, not the
    * corpus.
    */
  def reservoirPerKey(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val draw = md5(concat(lit("rsv:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang")).orderBy(col("draw"), col("doc_id"))
    docs(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), draw.as("draw"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rk"))
  }

  val reservoirPerKeySql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, n_chars,
      |    md5('rsv:' || CAST(doc_id AS VARCHAR)) AS draw
      |  FROM documents),
      |r AS (
      |  SELECT lang, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY draw, doc_id) AS rk
      |  FROM d)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, n_chars
      |FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin

  // --- mixture rebalancing ------------------------------------------------------
  /** Downsample every language stratum to (approximately) the size of
    * the smallest one — the mixture-rebalancing step that stops one
    * dominant source/language from swamping a training mix. Acceptance
    * is deterministic: doc bucket = first 16 bits of md5("mix:"||id),
    * and a doc survives iff `bucket * n_lang < n_min * 65536` — pure
    * integer arithmetic, so both engines make the identical keep/drop
    * decision on every document (no fp rate, no rand()). Emits the
    * per-language before/after report.
    *
    * Shape at scale: the per-language counts are a tiny aggregate that
    * BROADCASTS back onto a second scan — the corpus itself is never
    * shuffled to be sampled (two cheap pruned scans beat one full-data
    * exchange at 100 TB). The global min rides along as a one-row
    * broadcast cross join.
    */
  def mixtureDownsample(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"),
      conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 4),
        16, 10).cast("long").as("bucket"))
    val c = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val mn = c.agg(min(col("n_docs")).as("n_min"))
    val sampled = d
      .join(broadcast(c), "lang")
      .crossJoin(broadcast(mn))
      .filter(col("bucket") * col("n_docs") < col("n_min") * 65536)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
    c.join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  val mixtureDownsampleSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, lang,
      |    ${PortableSql.hexValue("m", 4)} AS bucket
      |  FROM (SELECT doc_id, lang,
      |        md5('mix:' || CAST(doc_id AS VARCHAR)) AS m FROM documents)),
      |c AS (SELECT lang, COUNT(*) AS n FROM d GROUP BY lang),
      |m AS (SELECT MIN(n) AS mn FROM c),
      |a AS (SELECT d.lang FROM d JOIN c USING (lang), m
      |      WHERE d.bucket * c.n < m.mn * 65536),
      |s AS (SELECT lang, COUNT(*) AS n_sampled FROM a GROUP BY lang)
      |SELECT c.lang, c.n AS n_docs, COALESCE(s.n_sampled, 0) AS n_sampled
      |FROM c LEFT JOIN s USING (lang) ORDER BY c.lang""".stripMargin

  // --- temperature-scaled mixture allocation ----------------------------------
  /** Temperature-scaled token-budget allocation across sources — the
    * mixture-design step that decides how many tokens each source
    * contributes to a training run: raw token counts are flattened by
    * T=2 temperature (weight = √tokens, the standard low-resource
    * up-weighting), and a fixed budget of 1M tokens is split
    * proportionally. Each source reports its raw tokens, weight,
    * allocation, and the over/under-sample ratio vs proportional.
    *
    * Exactness discipline: √ is correctly-rounded IEEE (unlike general
    * pow), the weight converts to integer micro-units per source
    * BEFORE any cross-source arithmetic, and the proportional split is
    * [[PortableSql.intDiv]]-style integer floor division — no
    * accumulation-order fp anywhere, so both engines agree bit-for-bit
    * ([[graft.queries.Relational.statsCorrelation]]'s lesson applied
    * at design time).
    *
    * Scale: one scan to token-count (narrow map + group), source-count-
    * sized everything after; the global weight total is a one-row
    * broadcast.
    */
  def mixtureTemperatureAlloc(s: SparkSession, dir: String): DataFrame = {
    val budget = 1000000L
    val perSrc = docs(s, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("n_tokens"))
      .select(col("source"), col("n_tokens"),
        floor(sqrt(col("n_tokens").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("w_micro"))
    val tot = perSrc.agg(sum(col("w_micro")).as("w_total"),
      sum(col("n_tokens")).as("tok_total"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"), col("w_micro"),
        expr(s"(w_micro * ${budget}L) div w_total").as("alloc_tokens"),
        // over/under-sampling vs proportional share (IEEE of identical ints)
        ((col("w_micro").cast("double") / col("w_total").cast("double")) /
          (col("n_tokens").cast("double") / col("tok_total").cast("double")))
          .as("sample_ratio"))
      .orderBy(col("source"))
  }

  val mixtureTemperatureAllocSql: String = {
    val alloc = PortableSql.intDiv("w_micro * 1000000", "w_total")
    s"""WITH t AS (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |    AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, n_tokens,
      |    CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
      |      AS w_micro
      |  FROM t),
      |g AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS w_total,
      |             CAST(SUM(n_tokens) AS BIGINT) AS tok_total FROM w)
      |SELECT source, n_tokens, w_micro,
      | $alloc AS alloc_tokens,
      | (CAST(w_micro AS DOUBLE) / CAST(w_total AS DOUBLE))
      |   / (CAST(n_tokens AS DOUBLE) / CAST(tok_total AS DOUBLE)) AS sample_ratio
      |FROM w, g
      |ORDER BY source""".stripMargin
  }

  // --- Neyman allocation -------------------------------------------------------
  /** Neyman-optimal stratified sample allocation (Neyman, JRSS 1934):
    * given a fixed audit budget of n = 1000 documents, how many to
    * draw per language stratum to MINIMIZE the variance of the
    * estimated mean document length — n_h ∝ N_h·σ_h, the design step
    * that precedes every [[stratifiedSample]]-style quality audit of
    * a training corpus (proportional allocation wastes budget on
    * large-but-homogeneous strata; Neyman shifts it to where the
    * variance lives).
    *
    * Exactness: per-stratum length moments are exact integers
    * (BIGINT Σlen, DECIMAL Σlen² VARCHAR-routed), σ_h is one IEEE
    * chain off them, the weight N_h·σ_h lands on the integer MICRO
    * grid (round of identical doubles — positive-half rule agrees in
    * both engines), and the final allocation is pure integer
    * arithmetic: (budget·w_micro) div Σw_micro — so the row
    * hash-matches despite the fp σ. Integer headroom: w_micro ≤
    * N_h·σ_h·1e6 must stay under 2^63 (N_h·σ_h < 9.2e12 — petabyte
    * corpora with ~1e4 length sigma hold to N_h ~ 1e9 docs per
    * stratum; past that drop the micro scale a decade).
    *
    * Scale: one map-side-combined fold to the |langs|-row stratum
    * grid; the budget share is grid-side algebra — the corpus is
    * touched exactly once, nothing corpus-sized shuffles.
    */
  def neymanAllocation(s: SparkSession, dir: String,
                       budget: Long = 1000L): DataFrame = {
    val d18 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,0)")
    val strata = docs(s, dir)
      .select(col("lang"), length(col("text")).cast("long").as("len"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_pop"),
        sum(col("len")).as("s1"),
        sum(d18(col("len")) * d18(col("len"))).as("s2"))
      .select(col("lang"), col("n_pop"),
        // greatest(·, 0) BEFORE the sqrt (r16 ADVICE): a near-constant
        // stratum's E[X²]−E[X]² can cancel to a tiny NEGATIVE double,
        // and sqrt of that is NaN — which Spark's round().cast(long)
        // silently maps to 0 while DuckDB's CAST(... AS BIGINT) errors.
        // Clamped identically on both sides, a degenerate stratum gets
        // sigma = 0 and alloc_n = 0 (the Neyman answer for a stratum
        // with no variance; budget shifts to where the variance lives).
        // All-constant-strata corner: w_total = 0 makes alloc_n NULL in
        // Spark via `div` — documented, not reachable on a text corpus
        // with any length variation.
        sqrt(greatest(
          col("s2").cast("string").cast("double")
            / col("n_pop").cast("double")
          - (col("s1").cast("double") / col("n_pop").cast("double"))
            * (col("s1").cast("double") / col("n_pop").cast("double")),
          lit(0d)))
          .as("sigma_len"))
      .select(col("lang"), col("n_pop"), col("sigma_len"),
        round(col("n_pop").cast("double") * col("sigma_len") * lit(1e6))
          .cast("long").as("w_micro"))
    val tot = strata.agg(sum(col("w_micro")).as("w_total"))
    strata.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_pop"), col("sigma_len"),
        (col("w_micro").cast("double") / col("w_total").cast("double"))
          .as("alloc_share"),
        expr(s"(w_micro * ${budget}L) div w_total").as("alloc_n"))
      .orderBy(col("lang"))
  }

  val neymanAllocationSql: String = {
    val alloc = PortableSql.intDiv("w_micro * 1000", "w_total")
    s"""WITH m AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_pop,
      |    CAST(SUM(len(text)) AS BIGINT) AS s1,
      |    SUM(CAST(len(text) AS DECIMAL(18,0))
      |        * CAST(len(text) AS DECIMAL(18,0))) AS s2
      |  FROM documents GROUP BY lang),
      |sg AS (
      |  SELECT lang, n_pop,
      |    sqrt(greatest(CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / CAST(n_pop AS DOUBLE)
      |      - (CAST(s1 AS DOUBLE) / CAST(n_pop AS DOUBLE))
      |        * (CAST(s1 AS DOUBLE) / CAST(n_pop AS DOUBLE)),
      |      CAST(0 AS DOUBLE))) AS sigma_len
      |  FROM m),
      |w AS (
      |  SELECT lang, n_pop, sigma_len,
      |    CAST(ROUND(CAST(n_pop AS DOUBLE) * sigma_len * 1000000.0, 0)
      |      AS BIGINT) AS w_micro
      |  FROM sg),
      |g AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS w_total FROM w)
      |SELECT lang, n_pop, sigma_len,
      |  CAST(w_micro AS DOUBLE) / CAST(w_total AS DOUBLE) AS alloc_share,
      |  $alloc AS alloc_n
      |FROM w, g ORDER BY lang""".stripMargin
  }

  // --- sequence packing --------------------------------------------------------
  /** Pack documents into fixed token-budget training chunks: documents
    * are laid out in deterministic (lang, doc_id) order, token counts
    * are cumulatively summed, and a document joins chunk k when its
    * preceding cumulative total falls in [k*B, (k+1)*B) — the streaming
    * concat-and-chunk layout LLM training uses (documents are atomic
    * here; the tokenizer-side splitter handles intra-doc overflow).
    * Emits per-chunk packing stats — the report that tells you whether
    * chunks are filling close to budget or fragmenting.
    *
    * Shape at scale: ONE hash exchange by lang + in-partition sort for
    * the running sum (`rowsBetween(unboundedPreceding, current)` is the
    * O(1)-per-row streaming frame, not a re-scan), then a partial-agg
    * groupBy. Integer `div` keeps chunk ids exact — no fp division on
    * cumulative totals that could misround past 2^53 at corpus scale.
    */
  def packChunks(s: SparkSession, dir: String, budget: Int = 512): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .groupBy(col("lang"),
        expr(s"(cum - n_tok) div $budget").as("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("chunk_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("chunk_id"))
  }

  val packChunksSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, lang, len(string_split(text,' ')) AS n_tok,
      |    SUM(len(string_split(text,' '))) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM documents)
      |SELECT lang, ${PortableSql.intDiv("cum - n_tok", "512")} AS chunk_id,
      | COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS chunk_tokens,
      | MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM t GROUP BY lang, chunk_id ORDER BY lang, chunk_id""".stripMargin

  // --- benchmark decontamination ----------------------------------------------
  /** n-gram-overlap decontamination: for every TRAINING document, the
    * number and fraction of its 3-gram shingles that also occur anywhere
    * in the HELD-OUT set ([[isHeldOut]]) — the standard check that
    * benchmark/eval text has not leaked into training data (run before
    * training; docs above a contamination threshold get dropped).
    *
    * Shape at scale: the eval side collapses to a DISTINCT set of 64-bit
    * shingle hashes — eval sets are tiny relative to the corpus, so this
    * set is broadcast and the contamination check is a broadcast
    * semi-join against the training scan: the 100 TB training side is
    * never shuffled. Shingles are hashed by the codegen'd
    * [[graft.llm.MinHashDedup.hashedShingles]] (8 bytes each, same
    * collision argument as `dedup_ngram_jaccard`: counts equal the
    * string-shingle oracle's at ~2^-50 collision odds).
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), isHeldOut(col("doc_id")).as("ev"),
        graft.llm.MinHashDedup.hashedShingles(col("ws")).as("sh"))
    val evalShingles = d.filter(col("ev"))
      .select(explode(col("sh")).as("g")).distinct()
    d.filter(!col("ev"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("g"))
      .join(broadcast(evalShingles), "g")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_contaminated"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_shingles"))
          .as("contamination"))
      .orderBy(col("doc_id"))
  }

  val decontaminateSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    substr(md5('sample:' || CAST(doc_id AS VARCHAR)),1,1) IN ('0','1') AS ev,
      |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |      i -> string_split(text,' ')[i] || '_' || string_split(text,' ')[i+1]
      |           || '_' || string_split(text,' ')[i+2])) AS s
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |e AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE ev),
      |t AS (SELECT doc_id, len(s) AS n_shingles, unnest(s) AS g FROM sh WHERE NOT ev)
      |SELECT t.doc_id, CAST(MAX(t.n_shingles) AS BIGINT) AS n_shingles,
      | COUNT(*) AS n_contaminated,
      | CAST(COUNT(*) AS DOUBLE) / MAX(t.n_shingles) AS contamination
      |FROM t JOIN e USING (g)
      |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin

  // --- benchmark decontamination, bloom-filter scale path -----------------------
  /** [[decontaminate]]'s 100 TB spelling: the held-out set's shingles
    * collapse into ONE 128 KiB bloom filter
    * ([[graft.functions.BloomFilterAgg]], OR-merged map-side), and the
    * training scan probes it with a codegen'd
    * [[graft.functions.BloomMightContain]] — so the decontamination
    * pass costs one narrow scan of the corpus plus a 128 KiB broadcast,
    * no join at all. Contrast the exact variant's broadcast DISTINCT
    * set: that is exact but its size tracks the eval set; the bloom is
    * FIXED-size with a bounded false-positive rate (~1e-5 here), which
    * is the right trade at corpus scale where `n_flagged` feeds a
    * drop-threshold anyway. No false negatives: every truly
    * contaminated shingle is flagged (DedupSpec asserts this against
    * the exact variant, plus the fpp bound).
    */
  def decontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), isHeldOut(col("doc_id")).as("ev"),
        graft.llm.MinHashDedup.hashedShingles(col("ws")).as("sh"))
    val bloom = d.filter(col("ev"))
      .select(explode(col("sh")).as("g"))
      .agg(graft.functions.BloomFilterAgg(col("g")).as("bf"))
    // probe side: one BloomCountContained call per document — the
    // earlier explode + per-shingle filter + groupBy spelling shuffled
    // ~200 rows per doc just to count matches; this keeps the probe a
    // narrow map and the presentation sort is the query's only
    // remaining exchange (rep2 5.5 s → 1.2 s at sf0.1)
    d.filter(!col("ev"))
      .crossJoin(broadcast(bloom))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        graft.functions.BloomCountContained(col("bf"), col("sh"))
          .as("n_flagged"))
      .filter(col("n_flagged") > 0)
      .select(col("doc_id"), col("n_shingles"), col("n_flagged"),
        (col("n_flagged").cast("double") / col("n_shingles"))
          .as("contamination_ub"))
      .orderBy(col("doc_id"))
  }

  /** The bloom leg's STRUCTURAL ORACLE (registered as
    * `decontaminate_bloom`): for every exactly-contaminated training
    * document, probe each of its exactly-contaminated shingles against
    * the real [[graft.functions.BloomFilterAgg]] filter and count the
    * misses — which the bloom no-false-negative contract guarantees is
    * ZERO for every row, on any data. That constant-zero column plus
    * the exact columns beside it make the whole frame DuckDB-checkable
    * (the oracle computes the exact legs and pins the zeros), so a
    * broken bloom build, merge, or probe hash-fails the driver gate
    * instead of hiding behind a rows-only entry. The false-POSITIVE
    * side (data-dependent, not oracle-able) stays pinned by
    * SamplingSpec's fpp bound on [[decontaminateBloom]], which remains
    * the production screen (this audit runs the same build + probe
    * machinery: one BloomFilterAgg aggregation, one 128 KiB broadcast,
    * one codegen'd [[graft.functions.BloomCountContained]] probe per
    * contaminated doc).
    *
    * Scale shape: identical to [[decontaminate]] (broadcast semi-join
    * keyed by the shingle, training side never shuffles) plus the
    * fixed-size bloom broadcast.
    */
  def decontaminateBloomAudit(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), isHeldOut(col("doc_id")).as("ev"),
        graft.llm.MinHashDedup.hashedShingles(col("ws")).as("sh"))
    val bloom = d.filter(col("ev"))
      .select(explode(col("sh")).as("g"))
      .agg(graft.functions.BloomFilterAgg(col("g")).as("bf"))
    val evalShingles = d.filter(col("ev"))
      .select(explode(col("sh")).as("g")).distinct()
    // probe the bloom ONCE PER DOC over the collected contaminated-
    // shingle array: the naive per-shingle spelling crossJoined the
    // 128 KiB filter bytes below the explode, and the join output
    // memcpy'd those bytes into every shingle row (~2.6 GB of copying
    // at sf0.1, 4.5 task-CPU-s for a metadata-sized check); here the
    // bytes ride one row per contaminated doc and the per-shingle loop
    // runs inside one codegen'd BloomCountContained call
    d.filter(!col("ev"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("g"))
      .join(broadcast(evalShingles), "g")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_contaminated"),
        sort_array(collect_list(col("g"))).as("csh"))
      .crossJoin(broadcast(bloom))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated") -
          graft.functions.BloomCountContained(col("bf"), col("csh")))
          .as("n_bloom_missed"))
      .orderBy(col("doc_id"))
  }

  /** [[decontaminateSql]] re-projected for the audit: the exact columns
    * are computed by DuckDB; the bloom-miss column is the contract
    * constant the Spark side must reproduce from the real filter.
    */
  val decontaminateBloomAuditSql: String =
    s"""SELECT doc_id, n_shingles, n_contaminated,
      |  CAST(0 AS BIGINT) AS n_bloom_missed
      |FROM (${decontaminateSql.replace("\n", "\n|  ")}) ex
      |ORDER BY doc_id""".stripMargin

  // --- key-skew diagnosis ------------------------------------------------------
  /** Rows-per-key histogram of events.user_id, bucketed by the DIGIT
    * COUNT of the per-key row count (an exact, engine-portable stand-in
    * for floor(log10) — fp log at integer boundaries is libm-dependent).
    * This is the query you run BEFORE choosing a join strategy: a key
    * whose magnitude bucket is 3+ above the median is the one you salt
    * ([[graft.plans.SkewJoin]]) or isolate. Shuffle cost is one
    * hash-partition by user_id (with map-side partial counts), then a
    * few-row re-agg — safe at any scale.
    */
  def skewHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .groupBy(length(col("cnt").cast("string")).as("magnitude"))
      .agg(count(lit(1)).as("n_users"),
        min(col("cnt")).as("min_events"),
        max(col("cnt")).as("max_events"),
        sum(col("cnt")).as("total_events"))
      .orderBy(col("magnitude"))

  val skewHistogramSql: String =
    """WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
      |SELECT CAST(len(CAST(cnt AS VARCHAR)) AS INT) AS magnitude,
      | COUNT(*) AS n_users, MIN(cnt) AS min_events, MAX(cnt) AS max_events,
      | CAST(SUM(cnt) AS BIGINT) AS total_events
      |FROM c GROUP BY 1 ORDER BY magnitude""".stripMargin

  // --- Poisson bootstrap -------------------------------------------------------
  /** Poisson(1) per-row weight thresholds on the 2^24 hash grid:
    * floor(CDF_k · 2^24) for k = 0..8; a row's replicate weight is the
    * number of thresholds at or below its hash draw. Hardcoded
    * integers so both engines compare the SAME constants — no exp()
    * evaluation exists anywhere in the query.
    */
  private val PoissonCdf24: Seq[Long] = Seq(6171992L, 12343985L, 15429982L,
    16458647L, 16715813L, 16767247L, 16775819L, 16777044L, 16777197L)

  /** Online Poisson bootstrap of total order revenue (Chamandy et al.,
    * "Estimating uncertainty for massive data streams", Google 2012):
    * each of B=3 replicates re-weights every order by an independent
    * Poisson(1) draw — the single-scan, shuffle-free scheme that
    * replaces multinomial resampling at scale (resample counts never
    * materialize; the weight is a per-row pure function of
    * md5(replicate, key)). Reports each replicate's drawn-row count and
    * cents total plus its exact relative error against the true total.
    *
    * Determinism: the draw is the [[weightedSample]] md5 discipline
    * (first 6 hex chars → integer in [0, 2^24)); the Poisson inverse
    * CDF is a CASE chain over hardcoded integer thresholds; weights
    * and totals are exact BIGINTs; rel_err is one IEEE division.
    */
  def poissonBootstrap(s: SparkSession, dir: String, b: Int = 3): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(18,6)") * lit(100))
      .cast("long")
    val rows = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), cents.as("cents"))
    val tot = rows.agg(sum(col("cents")).as("true_cents"))
    val drawn = rows
      .select(col("o_orderkey"), col("cents"),
        explode(array((1 to b).map(i => lit(i.toLong)): _*)).as("replicate"))
      .withColumn("h", conv(substring(md5(concat(lit("boot"),
        col("replicate").cast("string"), lit(":"),
        col("o_orderkey").cast("string"))), 1, 6), 16, 10).cast("long"))
      .withColumn("w", PoissonCdf24.foldLeft(lit(0L)) {
        (acc, t) => acc + when(col("h") >= t, 1L).otherwise(0L)
      })
    drawn.groupBy(col("replicate"))
      .agg(sum(col("w")).as("n_drawn"),
        sum(col("w") * col("cents")).as("boot_cents"))
      .crossJoin(broadcast(tot))
      .select(col("replicate"), col("n_drawn"), col("boot_cents"),
        ((col("boot_cents") - col("true_cents")).cast("double")
          / col("true_cents").cast("double")).as("rel_err"))
      .orderBy(col("replicate"))
  }

  val poissonBootstrapSql: String = {
    val h = PortableSql.hexValue("m", 6)
    val w = PoissonCdf24.map(t => s"(CASE WHEN h >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH r AS (
      |  SELECT o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |t AS (SELECT CAST(SUM(cents) AS BIGINT) AS true_cents FROM r),
      |d AS (
      |  SELECT o_orderkey, cents, replicate,
      |    md5('boot' || CAST(replicate AS VARCHAR) || ':'
      |        || CAST(o_orderkey AS VARCHAR)) AS m
      |  FROM (SELECT o_orderkey, cents, CAST(unnest([1, 2, 3]) AS BIGINT)
      |          AS replicate FROM r) x),
      |hh AS (SELECT replicate, cents, $h AS h FROM d),
      |wt AS (SELECT replicate, cents, CAST($w AS BIGINT) AS w FROM hh),
      |g AS (
      |  SELECT replicate, CAST(SUM(w) AS BIGINT) AS n_drawn,
      |    CAST(SUM(w * cents) AS BIGINT) AS boot_cents
      |  FROM wt GROUP BY replicate)
      |SELECT replicate, n_drawn, boot_cents,
      |  CAST(boot_cents - true_cents AS DOUBLE) / CAST(true_cents AS DOUBLE)
      |    AS rel_err
      |FROM g, t ORDER BY replicate""".stripMargin
  }

  // --- systematic (every k-th) sampling ---------------------------------------
  /** Exact 1-in-100 SYSTEMATIC sample of orders: rank the population
    * by (o_totalprice, o_orderkey) and keep every 100th rank starting
    * at 1 (Madow & Madow, Ann. Math. Stat. 1944) — ordering by the
    * value column makes it implicitly value-stratified, the classical
    * cheap variance reduction over [[hashSplit]]'s pure-random draw
    * (which can cluster; a systematic pass cannot, by construction).
    * Deterministic: the rank key is tie-free, so the sample is a pure
    * function of the data.
    *
    * Scale shape: the global rank is [[Graft.rankedByRange]] — the
    * two-pass range-partitioned spelling with ZERO rank-side
    * single-partition stages — and the modulus filter is a map-side
    * scan of the ranked checkpoint. The oracle spells the same rank
    * as a global row_number window (fine at oracle scale; the Spark
    * side never plans one).
    */
  def systematicSample(s: SparkSession, dir: String): DataFrame = {
    val pop = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Graft.rankedByRange(pop, col("o_totalprice"), col("o_orderkey"))
      .filter(col("i") % 100 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("i"))
      .orderBy(col("i"))
  }

  val systematicSampleSql: String =
    """WITH r AS (
      |  SELECT o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
      |         AS BIGINT) AS i
      |  FROM orders)
      |SELECT o_orderkey, o_totalprice, i
      |FROM r WHERE i % 100 = 1 ORDER BY i""".stripMargin
}
