package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/filter evaluation metrics over the documents corpus —
  * the scorecard every quality-filtering pipeline reads before and
  * after tuning a heuristic (does the score actually separate the
  * target class? is it calibrated? how front-loaded is the ranking?).
  * The evaluated "model" is the deterministic length score
  * (`n_chars`) against the `lang = 'en'` label: the naive baseline
  * every learned quality classifier must beat, and — because both
  * score and label live in the fixtures — exactly reproducible by the
  * DuckDB oracle.
  *
  * Determinism disciplines (shared with [[Drift]]'s rank family):
  * ties ride the DOUBLED-midrank identity so every rank sum is an
  * exact BIGINT; ranked-order cumulations ride
  * [[graft.Graft.cumSumByRange]] (range-partitioned prefix sums,
  * never a single-partition ORDER BY window); per-rank precisions
  * land on the integer micro grid via `div`; every reported double is
  * one IEEE division of exact BIGINTs.
  */
object Evaluation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** 1 if the doc is the positive class (en), else 0 — total on NULL. */
  private val isPos: Column =
    when(col("lang") === "en", 1L).otherwise(0L)

  // --- ROC AUC (Mann–Whitney identity) -----------------------------------
  /** Area under the ROC curve of "longer docs are en" — the
    * threshold-free separation read (AUC = P(score⁺ > score⁻) +
    * ½P(=), exactly U/(n⁺·n⁻) by Mann–Whitney 1947), plus the Gini
    * coefficient 2·AUC−1 the ads-world quotes.
    *
    * Exactness: per-VALUE pos/neg counts collapse the corpus first;
    * doubled midranks (2·avgrank = 2c + n_v + 1 over the pooled
    * cumulative count c) keep U2 = 2U an exact BIGINT; AUC and Gini
    * are each ONE IEEE division of exact integers ((U2 − n⁺n⁻)/n⁺n⁻
    * for Gini — no float chaining through AUC).
    *
    * Scale: one map-side-combined fold to the score-value grid, then
    * [[graft.Graft.cumSumByRange]]'s range-partitioned prefix sums —
    * the same 100×-safe shape as `drift_mann_whitney`; exact while
    * n⁺·n⁻ < 2⁶².
    */
  def rocAuc(s: SparkSession, dir: String): DataFrame = {
    val perValue = docs(s, dir)
      .groupBy(col("n_chars"))
      .agg(sum(isPos).as("cp"),
        sum(lit(1L) - isPos).as("cn"))
    val ranked = graft.Graft.cumSumByRange(perValue, Seq(col("n_chars")),
        Seq((col("cp") + col("cn")) -> "cum_incl"))
      .select(col("cp"), col("cn"),
        (col("cp") * (lit(2L) * (col("cum_incl") - col("cp") - col("cn"))
          + col("cp") + col("cn") + lit(1L))).as("r2p"))
    ranked
      .agg(sum(col("cp")).as("n_pos"), sum(col("cn")).as("n_neg"),
        sum(col("r2p")).as("r2"))
      .select(col("n_pos"), col("n_neg"),
        (col("r2") - col("n_pos") * (col("n_pos") + 1L)).as("u2_pos"))
      .select(col("n_pos"), col("n_neg"), col("u2_pos"),
        (col("u2_pos").cast("double")
          / (lit(2.0) * col("n_pos").cast("double")
            * col("n_neg").cast("double"))).as("auc"),
        ((col("u2_pos") - col("n_pos") * col("n_neg")).cast("double")
          / (col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("gini"))
  }

  val rocAucSql: String =
    """WITH base AS (
      |  SELECT n_chars,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
      |  FROM documents),
      |pv AS (
      |  SELECT n_chars,
      |    CAST(SUM(p) AS BIGINT) AS cp,
      |    CAST(SUM(1 - p) AS BIGINT) AS cn
      |  FROM base GROUP BY n_chars),
      |rk AS (
      |  SELECT cp, cn,
      |    cp * (2 * COALESCE(SUM(cp + cn) OVER (ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + cp + cn + 1) AS r2p
      |  FROM pv),
      |agg AS (
      |  SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
      |         CAST(SUM(cn) AS BIGINT) AS n_neg,
      |         CAST(SUM(r2p) AS BIGINT) AS r2
      |  FROM rk)
      |SELECT n_pos, n_neg,
      |  CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2_pos,
      |  CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
      |    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc,
      |  CAST(r2 - n_pos * (n_pos + 1) - n_pos * n_neg AS DOUBLE)
      |    / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS gini
      |FROM agg""".stripMargin

  // --- average precision (PR-curve area) ---------------------------------
  /** Average precision of the length ranking — the PR-curve summary
    * retrieval and dedup evals quote when positives are rare (AUC is
    * blind to the negative-heavy tail; AP is not). Contract: the
    * ranking is made TIE-FREE by (n_chars DESC, doc_id ASC), so
    * AP = (1/n⁺)·Σ_{k ranked positive} precision@k is a single exact
    * rational; also reports precision@50 (both fixtures hold ≥ 50
    * docs).
    *
    * Exactness: each precision@k lands on the integer micro grid via
    * `div` (identical truncation in both engines), so the AP
    * numerator is an exact BIGINT sum and AP is one IEEE division.
    *
    * Scale: the global tie-free rank and running positive count ride
    * [[graft.Graft.cumSumByRange]] — range-partitioned, never a
    * single-partition row_number; everything after is a 1-row
    * aggregate.
    */
  def averagePrecision(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("doc_id"), col("n_chars"), isPos.as("p"))
    val ranked = graft.Graft.cumSumByRange(base,
      Seq(col("n_chars").desc, col("doc_id")),
      Seq(col("p") -> "cum_pos", lit(1L) -> "rnk"))
    ranked.agg(
      sum(col("p")).as("n_pos"),
      count(lit(1)).as("n_docs"),
      sum(when(col("p") === 1L,
        expr("(cum_pos * 1000000L) div rnk"))).as("sum_prec_micro"),
      max(when(col("rnk") === 50L, col("cum_pos"))).as("pos_at_50"))
      .select(col("n_pos"), col("n_docs"),
        (col("sum_prec_micro").cast("double")
          / (col("n_pos").cast("double") * lit(1e6))).as("avg_precision"),
        (col("pos_at_50").cast("double") / lit(50.0)).as("precision_at_50"))
  }

  val averagePrecisionSql: String = {
    val pk = PortableSql.intDiv("cum_pos * 1000000", "rnk")
    s"""WITH base AS (
      |  SELECT doc_id, n_chars,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
      |  FROM documents),
      |r AS (
      |  SELECT p,
      |    CAST(SUM(p) OVER w AS BIGINT) AS cum_pos,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk
      |  FROM base
      |  WINDOW w AS (ORDER BY n_chars DESC, doc_id)),
      |agg AS (
      |  SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
      |         CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(SUM(CASE WHEN p = 1 THEN $pk END) AS BIGINT)
      |           AS sum_prec_micro,
      |         CAST(MAX(CASE WHEN rnk = 50 THEN cum_pos END) AS BIGINT)
      |           AS pos_at_50
      |  FROM r)
      |SELECT n_pos, n_docs,
      |  CAST(sum_prec_micro AS DOUBLE)
      |    / (CAST(n_pos AS DOUBLE) * 1e6) AS avg_precision,
      |  CAST(pos_at_50 AS DOUBLE) / 50.0 AS precision_at_50
      |FROM agg""".stripMargin
  }

  // --- calibration / reliability table + ECE ------------------------------
  /** 10-bin reliability table of the length score read as a
    * probability (pred = n_chars / max_chars on the integer micro
    * grid), with the expected-calibration-error summary — the read
    * that says whether a filter score's VALUE means anything or only
    * its ORDER does (AUC can be 0.9 while calibration is garbage).
    *
    * Exactness: pred_micro = n_chars·10⁶ div max is pure integer; the
    * per-bin |obs − pred| gap clears denominators to the exact BIGINT
    * |n⁺_b·10⁶ − Σpred_micro_b|, so ECE = Σ_b gap / (N·10⁶) needs NO
    * ordered accumulation at all — one division at the end, and the
    * per-bin means/rates are one division each.
    *
    * Scale: a 1-row max broadcast into a narrow map, one
    * map-side-combined fold to the 10-bin grid, and a 1-row grid
    * aggregate broadcast back. Nothing after the fold scales with
    * corpus size.
    */
  def calibration(s: SparkSession, dir: String): DataFrame = {
    val mx = docs(s, dir).agg(max(col("n_chars")).as("maxc"))
    val bins = docs(s, dir)
      .crossJoin(broadcast(mx))
      .select(isPos.as("p"),
        expr("(n_chars * 1000000L) div maxc").as("pred_micro"))
      .select(col("p"),
        least(lit(9L), expr("pred_micro div 100000L")).as("bin"),
        col("pred_micro"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_b"), sum(col("pred_micro")).as("sum_pred_micro"),
        sum(col("p")).as("n_pos"))
      .withColumn("gap_micro",
        abs(col("n_pos") * lit(1000000L) - col("sum_pred_micro")))
    val tot = bins.agg(sum(col("gap_micro")).as("sum_gap"),
      sum(col("n_b")).as("n_total"))
    bins.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_b"), col("n_pos"),
        (col("sum_pred_micro").cast("double")
          / (col("n_b").cast("double") * lit(1e6))).as("mean_pred"),
        (col("n_pos").cast("double") / col("n_b").cast("double"))
          .as("obs_rate"),
        (col("gap_micro").cast("double")
          / (col("n_b").cast("double") * lit(1e6))).as("bin_gap"),
        (col("sum_gap").cast("double")
          / (col("n_total").cast("double") * lit(1e6))).as("ece"))
      .orderBy(col("bin"))
  }

  // --- precision/recall threshold sweep ------------------------------------
  /** Precision / recall / F1 of the length classifier at 11 evenly
    * spaced thresholds t_i = i·max/10 — the OPERATING-POINT view that
    * [[rocAuc]]'s threshold-free summary hides (a filter ships with
    * ONE threshold; this is the table you pick it from). Predict
    * positive iff n_chars ≥ t_i.
    *
    * Exactness: thresholds are integers via `div`, the per-threshold
    * confusion cells are exact BIGINT counts, and precision / recall /
    * F1 = 2TP/(2TP+FP+FN) are ONE IEEE division each (never chained
    * through each other). Degenerate cells yield NULL, not NaN.
    *
    * Scale: an 11-row threshold grid broadcasts into the corpus scan
    * (11× inflation in a narrow codegen'd map), one map-side-combined
    * fold back to the grid. Nothing after the fold scales with SF.
    */
  def prThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    val mx = docs(s, dir).agg(max(col("n_chars")).as("maxc"))
    val grid = docs(s, dir)
      .crossJoin(broadcast(mx))
      .select(col("n_chars"), isPos.as("p"), col("maxc"),
        explode(sequence(lit(0L), lit(10L))).as("i"))
      .select(col("i"), col("p"),
        (col("n_chars") >= expr("(maxc * i) div 10")).as("pred"))
      .groupBy(col("i"))
      .agg(sum(when(col("pred") && col("p") === 1L, 1L).otherwise(0L))
        .as("tp"),
        sum(when(col("pred") && col("p") === 0L, 1L).otherwise(0L))
          .as("fp"),
        sum(when(!col("pred") && col("p") === 1L, 1L).otherwise(0L))
          .as("fn"))
    grid.select(col("i").as("threshold_decile"), col("tp"), col("fp"),
      col("fn"),
      when(col("tp") + col("fp") > 0L, col("tp").cast("double")
        / (col("tp") + col("fp")).cast("double")).as("precision"),
      when(col("tp") + col("fn") > 0L, col("tp").cast("double")
        / (col("tp") + col("fn")).cast("double")).as("recall"),
      when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
        (lit(2L) * col("tp")).cast("double")
          / (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
        .as("f1"))
      .orderBy(col("threshold_decile"))
  }

  val prThresholdSweepSql: String = {
    val thr = PortableSql.intDiv("maxc * i", "10")
    s"""WITH mx AS (SELECT MAX(n_chars) AS maxc FROM documents),
      |base AS (
      |  SELECT n_chars,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
      |  FROM documents),
      |g AS (SELECT unnest(range(0, 11)) AS i),
      |cells AS (
      |  SELECT g.i,
      |    CAST(SUM(CASE WHEN n_chars >= $thr AND p = 1
      |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(SUM(CASE WHEN n_chars >= $thr AND p = 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(SUM(CASE WHEN n_chars < $thr AND p = 1
      |      THEN 1 ELSE 0 END) AS BIGINT) AS fn
      |  FROM base, mx, g GROUP BY g.i)
      |SELECT i AS threshold_decile, tp, fp, fn,
      |  CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE)
      |    / CAST(tp + fp AS DOUBLE) END AS precision,
      |  CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE)
      |    / CAST(tp + fn AS DOUBLE) END AS recall,
      |  CASE WHEN 2 * tp + fp + fn > 0 THEN CAST(2 * tp AS DOUBLE)
      |    / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
      |FROM cells ORDER BY threshold_decile""".stripMargin
  }

  // --- BM25 self-retrieval MRR --------------------------------------------
  /** Known-item self-retrieval scorecard: each query document's top
    * TF-IDF keyword is issued as a one-term query against the whole
    * corpus under BM25, and the metric is where the document ranks in
    * its OWN keyword's result list — MRR plus hit@1/hit@10. This is
    * the classic index-quality smoke test (a corpus whose documents
    * can't be found by their own most-distinctive term has a broken
    * tokenizer, a flooded vocabulary, or near-duplicate contamination
    * — heavy duplication shows up directly as sunk self-ranks), run
    * here over the first `nQueries` doc_ids.
    *
    * Determinism: keyword selection rides [[TextQueries.docKeywords]]'
    * exact-BIGINT micronat tf-idf (term-asc tie-break); BM25 is
    * [[TextQueries.bm25TopTerms]]' fixed IEEE tree on exact integers
    * (rational Robertson idf, shared fp literals), bit-identical
    * across engines, so the rank — 1 + count of strictly-better
    * (score desc, doc_id asc) candidates — is an exact BIGINT
    * computed by COUNTING, never by a global sort; reciprocal ranks
    * land on the integer micro grid via `div`.
    *
    * Scale: ONE tokenize→(doc, term) aggregate is the only
    * corpus-sized work (materialized — keyword selection, posting
    * lookup, and dl all reuse it); the query keyword set is
    * nQueries-bounded and broadcasts into a term-keyed semi-join that
    * touches only those terms' posting lists; ranks are per-query
    * counts over those lists (no window at all), and the report is a
    * 1-row reduce.
    */
  def selfRetrievalMrr(s: SparkSession, dir: String,
                       nQueries: Int = 100): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val tf = graft.Graft.materialize(
      docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_corpus"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // top-1 tf-idf keyword per query doc (docKeywords' exact contract)
    val wKey = Window.partitionBy(col("doc_id"))
      .orderBy(col("kscore").desc, col("term"))
    // nQueries-bounded and read by three consumers — materialized so
    // the keyword ranking runs once; columns are RENAMED (q_id/q_term)
    // because keyw, qs, and cand all derive from the same tf and
    // shared names would trip Spark's ambiguous-self-join check
    val keyw = graft.Graft.materialize(
      tf.filter(col("doc_id") < nQueries.toLong)
        .join(df, "term")
        .crossJoin(broadcast(stats.select(col("n_corpus"))))
        .withColumn("kscore",
          col("tf") * (lnMicro(col("n_corpus")) - lnMicro(col("df"))))
        .withColumn("rnk", row_number().over(wKey))
        .filter(col("rnk") === 1)
        .select(col("doc_id").as("q_id"), col("term").as("q_term")))
    // BM25 over the keyword terms' posting lists only
    val score = ((col("n_corpus") - col("df") + lit(0.5))
      / (col("df") + lit(0.5))) * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    val cand = tf
      .join(broadcast(
        keyw.select(col("q_term").as("term")).distinct()), "term")
      .join(dl, "doc_id").join(df, "term")
      .crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"), score.as("score"))
    val qs = cand.join(broadcast(keyw),
        col("term") === col("q_term") && col("doc_id") === col("q_id"))
      .select(col("q_id"), col("q_term"), col("score").as("q_score"))
    // rank by counting strictly-better candidates (score desc, id asc)
    val ranks = cand.join(broadcast(qs), col("term") === col("q_term"))
      .groupBy(col("q_id"))
      .agg((sum(when(col("score") > col("q_score"), 1L)
        .when(col("score") === col("q_score")
          && col("doc_id") < col("q_id"), 1L)
        .otherwise(0L)) + lit(1L)).as("self_rank"),
        count(lit(1)).as("n_candidates"))
    ranks
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("self_rank") === 1L, 1L).otherwise(0L)).as("hits_at_1"),
        sum(when(col("self_rank") <= 10L, 1L).otherwise(0L)).as("hits_at_10"),
        sum(expr("1000000L div self_rank")).as("rr_micro"),
        sum(col("n_candidates")).as("n_postings"))
      .select(col("n_queries"), col("hits_at_1"), col("hits_at_10"),
        col("n_postings"),
        (col("rr_micro").cast("double")
          / (col("n_queries").cast("double") * lit(1e6))).as("mrr"))
  }

  def selfRetrievalMrrSql(nQueries: Int = 100): String = {
    val rr = PortableSql.intDiv("1000000", "self_rank")
    s"""WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM t WHERE len(term) > 0 GROUP BY doc_id, term),
      |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
      |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus,
      |         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      |keyw AS (
      |  SELECT doc_id AS q_id, term FROM (
      |    SELECT tf.doc_id, tf.term,
      |      row_number() OVER (PARTITION BY tf.doc_id ORDER BY
      |        tf * (CAST(round(ln(CAST(n_corpus AS DOUBLE)) * 1e6) AS BIGINT)
      |            - CAST(round(ln(CAST(df AS DOUBLE)) * 1e6) AS BIGINT)) DESC,
      |        tf.term) AS rnk
      |    FROM tf JOIN df ON tf.term = df.term, st
      |    WHERE tf.doc_id < $nQueries)
      |  WHERE rnk = 1),
      |cand AS (
      |  SELECT tf.term, tf.doc_id,
      |    ((st.n_corpus - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE))
      |      * (tf.tf * 2.2::DOUBLE)
      |      / (tf.tf + 1.2::DOUBLE * (0.25::DOUBLE
      |         + 0.75::DOUBLE * dl.dl / st.avgdl)) AS score
      |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term), st
      |  WHERE tf.term IN (SELECT term FROM keyw)),
      |qs AS (
      |  SELECT k.q_id, k.term, c.score AS q_score
      |  FROM keyw k JOIN cand c ON c.term = k.term AND c.doc_id = k.q_id),
      |ranks AS (
      |  SELECT qs.q_id,
      |    CAST(SUM(CASE WHEN c.score > qs.q_score THEN 1
      |      WHEN c.score = qs.q_score AND c.doc_id < qs.q_id THEN 1
      |      ELSE 0 END) + 1 AS BIGINT) AS self_rank,
      |    CAST(COUNT(*) AS BIGINT) AS n_candidates
      |  FROM cand c JOIN qs ON c.term = qs.term
      |  GROUP BY qs.q_id)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  CAST(SUM(CASE WHEN self_rank = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS hits_at_1,
      |  CAST(SUM(CASE WHEN self_rank <= 10 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS hits_at_10,
      |  CAST(SUM(n_candidates) AS BIGINT) AS n_postings,
      |  CAST(CAST(SUM($rr) AS BIGINT) AS DOUBLE)
      |    / (CAST(COUNT(*) AS DOUBLE) * 1e6) AS mrr
      |FROM ranks""".stripMargin
  }

  val calibrationSql: String = {
    val pm = PortableSql.intDiv("n_chars * 1000000", "maxc")
    val bn = PortableSql.intDiv("pred_micro", "100000")
    s"""WITH mx AS (SELECT MAX(n_chars) AS maxc FROM documents),
      |base AS (
      |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p,
      |    $pm AS pred_micro
      |  FROM documents, mx),
      |bins AS (
      |  SELECT LEAST(9, $bn) AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n_b,
      |    CAST(SUM(pred_micro) AS BIGINT) AS sum_pred_micro,
      |    CAST(SUM(p) AS BIGINT) AS n_pos
      |  FROM base GROUP BY 1),
      |g AS (
      |  SELECT bin, n_b, n_pos, sum_pred_micro,
      |    abs(n_pos * 1000000 - sum_pred_micro) AS gap_micro
      |  FROM bins),
      |tot AS (SELECT CAST(SUM(gap_micro) AS BIGINT) AS sum_gap,
      |               CAST(SUM(n_b) AS BIGINT) AS n_total FROM g)
      |SELECT bin, n_b, n_pos,
      |  CAST(sum_pred_micro AS DOUBLE)
      |    / (CAST(n_b AS DOUBLE) * 1e6) AS mean_pred,
      |  CAST(n_pos AS DOUBLE) / CAST(n_b AS DOUBLE) AS obs_rate,
      |  CAST(gap_micro AS DOUBLE)
      |    / (CAST(n_b AS DOUBLE) * 1e6) AS bin_gap,
      |  CAST(sum_gap AS DOUBLE)
      |    / (CAST(n_total AS DOUBLE) * 1e6) AS ece
      |FROM g, tot
      |ORDER BY bin""".stripMargin
  }

  // --- quality-heuristic rank agreement (Spearman) -------------------------
  /** Spearman rank correlation between two document quality
    * heuristics — character length vs word count — the "do my
    * heuristics rank the corpus the same way" read a curation
    * pipeline does before dropping the more expensive score (ρ ≈ 1 ⇒
    * the cheap one carries the same ordering information; ρ far
    * below 1 ⇒ they disagree and both earn their keep). Spearman
    * (not Pearson) because filters consume the ORDER, not the value.
    *
    * Exactness: tie-aware DOUBLED midranks per score value (2R =
    * 2·cum_before + count + 1 — the [[rocAuc]] identity) keep every
    * rank an exact BIGINT; rank moments ride DECIMAL(18,0) products
    * (the dispersion-index rule); ρ = (n·S_ab − S_a·S_b) /
    * √((n·S_aa − S_a²)(n·S_bb − S_b²)) is one fixed IEEE chain, NULL
    * when either score is constant.
    *
    * Scale: two per-VALUE folds + [[graft.Graft.cumSumByRange]]
    * prefix sums (range-partitioned, never a global row_number),
    * two value-keyed hash joins back to the corpus, one 1-row
    * reduce.
    */
  def scoreAgreement(s: SparkSession, dir: String): DataFrame = {
    val base = graft.Graft.materialize(
      docs(s, dir).select(col("doc_id"), col("n_chars").as("a"),
        size(split(col("text"), " ")).cast("long").as("b")))
    def rankMap(c: String): DataFrame = {
      val g = base.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      graft.Graft.cumSumByRange(g, Seq(col(c)), Seq(col("cnt") -> "cum"))
        .select(col(c),
          (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
            .as(s"r2$c"))
    }
    def dec(c: Column): Column = c.cast("decimal(18,0)")
    val m = base.join(rankMap("a"), "a").join(rankMap("b"), "b")
      .agg(count(lit(1)).as("n"),
        sum(col("r2a")).as("sa"), sum(col("r2b")).as("sb"),
        sum(dec(col("r2a")) * dec(col("r2b"))).as("sab"),
        sum(dec(col("r2a")) * dec(col("r2a"))).as("saa"),
        sum(dec(col("r2b")) * dec(col("r2b"))).as("sbb"))
    def d(c: String): Column = col(c).cast("double")
    val varA = d("n") * d("saa") - d("sa") * d("sa")
    val varB = d("n") * d("sbb") - d("sb") * d("sb")
    m.select(col("n").as("n_docs"),
      when(varA > 0.0 && varB > 0.0,
        (d("n") * d("sab") - d("sa") * d("sb")) / sqrt(varA * varB))
        .otherwise(lit(null).cast("double")).as("spearman_rho"))
  }

  val scoreAgreementSql: String =
    """WITH base AS (
      |  SELECT doc_id, n_chars AS a,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS b
      |  FROM documents),
      |ga AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS cnt FROM base GROUP BY a),
      |ra AS (SELECT a,
      |  CAST(2 * (SUM(cnt) OVER (ORDER BY a) - cnt) + cnt + 1 AS BIGINT)
      |    AS r2a FROM ga),
      |gb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM base GROUP BY b),
      |rb AS (SELECT b,
      |  CAST(2 * (SUM(cnt) OVER (ORDER BY b) - cnt) + cnt + 1 AS BIGINT)
      |    AS r2b FROM gb),
      |j AS (SELECT r2a, r2b FROM base JOIN ra USING (a) JOIN rb USING (b)),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(r2a) AS BIGINT) AS sa, CAST(SUM(r2b) AS BIGINT) AS sb,
      |    CAST(CAST(SUM(CAST(r2a AS DECIMAL(18,0)) * CAST(r2b AS DECIMAL(18,0)))
      |      AS VARCHAR) AS DOUBLE) AS sab,
      |    CAST(CAST(SUM(CAST(r2a AS DECIMAL(18,0)) * CAST(r2a AS DECIMAL(18,0)))
      |      AS VARCHAR) AS DOUBLE) AS saa,
      |    CAST(CAST(SUM(CAST(r2b AS DECIMAL(18,0)) * CAST(r2b AS DECIMAL(18,0)))
      |      AS VARCHAR) AS DOUBLE) AS sbb
      |  FROM j)
      |SELECT n AS n_docs,
      |  CASE WHEN CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0.0
      |        AND CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0.0
      |  THEN (CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
      |    / sqrt((CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
      |         * (CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
      |  END AS spearman_rho
      |FROM m""".stripMargin

  // --- Brier score + Murphy decomposition ---------------------------------
  /** Brier score of the length score read as a probability (pred =
    * n_chars·10⁶ div max — [[calibration]]'s grid) against the en
    * label, with the Murphy (1973) 10-bin decomposition: reliability
    * (calibration gap², the ECE's squared cousin), resolution (how far
    * bin outcome rates stray from the base rate — the part you WANT),
    * uncertainty (base-rate entropy ȳ(1−ȳ), the floor no model
    * changes), and the residual Brier − (UNC + REL − RES), which for
    * binned forecasts reads as within-bin forecast variance minus
    * twice the within-bin forecast–outcome covariance.
    *
    * Exactness: Brier's Σ(p_micro − y·10⁶)² rides DECIMAL(18,0)
    * products (the dispersion-index rule, VARCHAR-routed to double);
    * UNC is one chain of exact BIGINTs; REL/RES collapse each bin to
    * micro-grid RATES via `div` (mean-pred, obs, base), square on the
    * micro grid (diff² div 10⁶ — exact truncating arithmetic, ≤10⁻⁶
    * absolute truncation per rate), and sum order-free as BIGINTs —
    * each reported double is ONE IEEE division. The residual is a
    * fixed chain of those four doubles.
    *
    * Scale: a 1-row max broadcast into a narrow map, one fold to the
    * 10-bin grid, one 1-row reduce — the [[calibration]] shape.
    */
  def brierScore(s: SparkSession, dir: String): DataFrame = {
    val mx = docs(s, dir).agg(max(col("n_chars")).as("maxc"))
    val base = docs(s, dir)
      .crossJoin(broadcast(mx))
      .select(isPos.as("y"),
        expr("(n_chars * 1000000L) div maxc").as("pm"))
    val bins = base
      .select(col("y"), col("pm"),
        least(lit(9L), expr("pm div 100000L")).as("bin"),
        (col("pm") - col("y") * lit(1000000L)).as("diff"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_b"), sum(col("y")).as("y_b"),
        sum(col("pm")).as("s_b"),
        sum(col("diff").cast("decimal(18,0)")
          * col("diff").cast("decimal(18,0)")).as("sq_b"))
    val tot = bins.agg(sum(col("n_b")).as("n"), sum(col("y_b")).as("y"),
      sum(col("sq_b")).as("sq"))
    bins.crossJoin(broadcast(tot))
      .select(col("n"), col("y"), col("sq"), col("n_b"),
        expr("s_b div n_b").as("pm_b"),
        expr("(y_b * 1000000L) div n_b").as("ob_b"),
        expr("(y * 1000000L) div n").as("ybar"))
      .select(col("n"), col("y"), col("sq"), col("n_b"),
        (col("n_b") * expr("((pm_b - ob_b) * (pm_b - ob_b)) div 1000000L"))
          .as("rel_t"),
        (col("n_b") * expr("((ob_b - ybar) * (ob_b - ybar)) div 1000000L"))
          .as("res_t"))
      .groupBy(col("n"), col("y"), col("sq"))
      .agg(sum(col("rel_t")).as("rel_num"), sum(col("res_t")).as("res_num"))
      .select(col("n").as("n_docs"), col("y").as("n_pos"),
        (col("sq").cast("double")
          / (col("n").cast("double") * lit(1e12))).as("brier"),
        ((col("y") * (col("n") - col("y"))).cast("double")
          / (col("n").cast("double") * col("n").cast("double")))
          .as("uncertainty"),
        (col("rel_num").cast("double") / (col("n").cast("double") * lit(1e6)))
          .as("reliability"),
        (col("res_num").cast("double") / (col("n").cast("double") * lit(1e6)))
          .as("resolution"))
      .withColumn("decomp_residual",
        col("brier") - (col("uncertainty") + col("reliability")
          - col("resolution")))
  }

  val brierScoreSql: String = {
    val pm = PortableSql.intDiv("n_chars * 1000000", "maxc")
    val pmB = PortableSql.intDiv("s_b", "n_b")
    val obB = PortableSql.intDiv("y_b * 1000000", "n_b")
    val ybar = PortableSql.intDiv("y * 1000000", "n")
    val relT = PortableSql.intDiv("(pm_b - ob_b) * (pm_b - ob_b)", "1000000")
    val resT = PortableSql.intDiv("(ob_b - ybar) * (ob_b - ybar)", "1000000")
    val bin = PortableSql.intDiv("pm", "100000")
    s"""WITH mx AS (SELECT MAX(n_chars) AS maxc FROM documents),
      |base AS (
      |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
      |    $pm AS pm
      |  FROM documents, mx),
      |bins AS (
      |  SELECT LEAST(9, $bin) AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n_b,
      |    CAST(SUM(y) AS BIGINT) AS y_b,
      |    CAST(SUM(pm) AS BIGINT) AS s_b,
      |    SUM(CAST(pm - y * 1000000 AS DECIMAL(18,0))
      |      * CAST(pm - y * 1000000 AS DECIMAL(18,0))) AS sq_b
      |  FROM base GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(n_b) AS BIGINT) AS n, CAST(SUM(y_b) AS BIGINT) AS y,
      |    CAST(CAST(SUM(sq_b) AS VARCHAR) AS DOUBLE) AS sq
      |  FROM bins),
      |rates AS (
      |  SELECT n, y, sq, n_b,
      |    $pmB AS pm_b, $obB AS ob_b, $ybar AS ybar
      |  FROM bins, tot),
      |terms AS (
      |  SELECT n, y, sq,
      |    n_b * ($relT) AS rel_t,
      |    n_b * ($resT) AS res_t
      |  FROM rates),
      |agg AS (
      |  SELECT n, y, sq,
      |    CAST(SUM(rel_t) AS BIGINT) AS rel_num,
      |    CAST(SUM(res_t) AS BIGINT) AS res_num
      |  FROM terms GROUP BY n, y, sq),
      |fin AS (
      |  SELECT n AS n_docs, y AS n_pos,
      |    sq / (CAST(n AS DOUBLE) * 1e12) AS brier,
      |    CAST(y * (n - y) AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS uncertainty,
      |    CAST(rel_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS reliability,
      |    CAST(res_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS resolution
      |  FROM agg)
      |SELECT n_docs, n_pos, brier, uncertainty, reliability, resolution,
      |  brier - (uncertainty + reliability - resolution) AS decomp_residual
      |FROM fin""".stripMargin
  }

  // --- NDCG@k (graded relevance) ------------------------------------------
  /** NDCG@k of the length ranking with GRADED relevance — the ranking
    * scorecard [[averagePrecision]] and [[selfRetrievalMrr]] still
    * lack: AP/MRR see binary labels, NDCG credits partial relevance
    * (rel 2 = en, rel 1 = es, 0 otherwise — the "primary language,
    * acceptable language, rest" grading a curation pipeline actually
    * uses) and discounts by rank (Järvelin & Kekäläinen, TOIS 2002).
    * DCG@k = Σ_{r≤k} (2^rel − 1)/log₂(r+1); NDCG = DCG/IDCG where
    * IDCG is the DCG of the ideal (relevance-sorted) ordering.
    *
    * Exactness: the ranking is tie-free (n_chars DESC, doc_id ASC);
    * each discount rides the integer micro grid as
    * round(10⁶/(ln(r+1)/ln 2)) — a DATA-INDEPENDENT grid (r ≤ k), so
    * cross-engine equality of the rounded values was verified once
    * for r ≤ 200 and holds at every SF; gains are exact integers
    * {0,1,3}; DCG/IDCG numerators are exact BIGINT micro sums and
    * NDCG is ONE IEEE division. The ideal ordering needs no sort:
    * with n₂ docs at rel 2 and n₁ at rel 1, position r's ideal gain
    * is 3 when r ≤ n₂, 1 when r ≤ n₂+n₁, else 0.
    *
    * Scale: the global tie-free rank rides
    * [[graft.Graft.cumSumByRange]] (range-partitioned, never a
    * single-partition row_number); DCG folds only the top-k rows;
    * IDCG is a k-row grid exploded off the 1-row corpus counts.
    */
  def ndcg(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val rel = when(col("lang") === "en", 2L)
      .when(col("lang") === "es", 1L).otherwise(0L)
    def discMicro(r: Column): Column =
      round(lit(1e6) / (log(r.cast("double") + lit(1.0)) / log(lit(2.0))))
        .cast("long")
    val gain = when(col("rel") === 2L, 3L)
      .when(col("rel") === 1L, 1L).otherwise(0L)
    val base = docs(s, dir)
      .select(col("doc_id"), col("n_chars"), rel.as("rel"))
    val ranked = graft.Graft.cumSumByRange(base,
      Seq(col("n_chars").desc, col("doc_id")), Seq(lit(1L) -> "rnk"))
    val dcg = ranked.filter(col("rnk") <= k.toLong)
      .agg(sum(gain * discMicro(col("rnk"))).as("dcg_micro"))
    val ideal = base
      .agg(sum(when(col("rel") === 2L, 1L).otherwise(0L)).as("n2"),
        sum(when(col("rel") === 1L, 1L).otherwise(0L)).as("n1"))
      .select(col("n2"), col("n1"),
        explode(sequence(lit(1L), lit(k.toLong))).as("kk"))
      .agg(max(col("n2")).as("n_rel2"), max(col("n1")).as("n_rel1"),
        sum(when(col("kk") <= col("n2"), 3L)
          .when(col("kk") <= col("n2") + col("n1"), 1L).otherwise(0L)
          * discMicro(col("kk"))).as("idcg_micro"))
    dcg.crossJoin(broadcast(ideal))
      .select(lit(k.toLong).as("k"), col("n_rel2"), col("n_rel1"),
        (col("dcg_micro").cast("double") / lit(1e6)).as("dcg_at_k"),
        (col("idcg_micro").cast("double") / lit(1e6)).as("idcg_at_k"),
        (col("dcg_micro").cast("double")
          / col("idcg_micro").cast("double")).as("ndcg_at_k"))
  }

  def ndcgSql(k: Int = 20): String =
    s"""WITH base AS (
      |  SELECT doc_id, n_chars,
      |    CASE WHEN lang = 'en' THEN 2 WHEN lang = 'es' THEN 1 ELSE 0 END
      |      AS rel
      |  FROM documents),
      |r AS (
      |  SELECT rel,
      |    CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
      |      AS rnk
      |  FROM base),
      |dcg AS (
      |  SELECT CAST(SUM(
      |    (CASE rel WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END)
      |    * CAST(round(1e6 / (ln(CAST(rnk + 1 AS DOUBLE)) / ln(2.0)))
      |        AS BIGINT)) AS BIGINT) AS dcg_micro
      |  FROM r WHERE rnk <= $k),
      |c AS (
      |  SELECT CAST(SUM(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n2,
      |    CAST(SUM(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      |  FROM base),
      |g AS (SELECT CAST(i + 1 AS BIGINT) AS kk FROM range($k) t(i)),
      |ideal AS (
      |  SELECT MAX(n2) AS n_rel2, MAX(n1) AS n_rel1,
      |    CAST(SUM(
      |      (CASE WHEN kk <= n2 THEN 3 WHEN kk <= n2 + n1 THEN 1 ELSE 0 END)
      |      * CAST(round(1e6 / (ln(CAST(kk + 1 AS DOUBLE)) / ln(2.0)))
      |          AS BIGINT)) AS BIGINT) AS idcg_micro
      |  FROM g, c)
      |SELECT CAST($k AS BIGINT) AS k, n_rel2, n_rel1,
      |  CAST(dcg_micro AS DOUBLE) / 1e6 AS dcg_at_k,
      |  CAST(idcg_micro AS DOUBLE) / 1e6 AS idcg_at_k,
      |  CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE) AS ndcg_at_k
      |FROM dcg, ideal""".stripMargin
}
