package graft.queries

import graft.{Graft, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-lifetime survival analysis over `orders`: the
  * Kaplan–Meier product-limit estimator (Kaplan & Meier, JASA 1958) —
  * the standard churn/retention curve a subscription or engagement
  * dashboard publishes, and the right-censoring-aware dual of the
  * retention-cohort report in [[EventQueries]].
  *
  * Definitions: a customer's lifetime is the day span from their first
  * to their last order. A customer whose last order is more than 90
  * days before the dataset's final order date has CHURNED (event
  * observed); later last-orders are right-censored (still active at
  * the observation horizon). At each observed churn duration t_i with
  * d_i events and n_i customers still at risk (lifetime ≥ t_i), the
  * survival estimate multiplies by (n_i − d_i)/n_i.
  *
  * Determinism discipline ([[Drift]]): the product rides as a SUM of
  * integer micronat logs — ln S(t) = Σ (ln(n_i−d_i) − ln(n_i)) with
  * each ln rounded to an exact BIGINT micronat — because neither
  * engine has a portable cumulative product and exp/ln chains on
  * unrounded doubles are a libm hazard. n_i, d_i, and the cumulative
  * micronat sum are exact BIGINTs; the one IEEE op is the final
  * scale-down division by 1e6.
  *
  * Scale shape: orders aggregates to ONE row per customer (map-side
  * partials into a custkey exchange — the 100 TB side is touched
  * exactly once), customers aggregate to one row per distinct
  * lifetime-duration, and the at-risk/cumulative windows run over the
  * duration grid (≤ a few thousand rows at any corpus size — durations
  * are bounded by the dataset's calendar span in days). The global
  * max-date is a 1-row broadcast. The single-partition window over the
  * duration grid is the same intentional choice as [[TimeSeries]]'s
  * day-series windows.
  */
object Survival {

  private def lnMicro(c: Column): Column =
    round(log(c.cast("double")) * lit(1e6)).cast("long")

  /** KM curve rows at each observed churn duration: (t_days, n_risk,
    * n_events, ln_surv_micro BIGINT, ln_survival DOUBLE). The terminal
    * grid row where the risk set is exhausted entirely by events
    * (S drops to exactly 0, ln undefined) is excluded — it can only be
    * the maximum duration, so no interior cumulative term is affected.
    */
  def kaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val life = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .groupBy(col("o_custkey"))
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
    val horizon = life.agg(max(col("last_d")).as("max_d"))
    val durations = life.crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long").as("dur"),
        when(datediff(col("max_d"), col("last_d")) > 90, 1L).otherwise(0L)
          .as("churned"))
      .groupBy(col("dur"))
      .agg(count(lit(1)).as("n_at"), sum(col("churned")).as("d_i"))
    // at-risk count: reverse-cumulative over the duration grid
    val wRisk = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Graft.materialize(durations)
      .withColumn("n_risk", sum(col("n_at")).over(wRisk))
      .filter(col("d_i") > 0 && col("n_risk") > col("d_i"))
      .withColumn("ln_surv_micro",
        sum(lnMicro(col("n_risk") - col("d_i")) - lnMicro(col("n_risk")))
          .over(wCum))
      .select(col("dur").as("t_days"), col("n_risk"),
        col("d_i").as("n_events"), col("ln_surv_micro"),
        (col("ln_surv_micro").cast("double") / lit(1e6)).as("ln_survival"))
      .orderBy(col("t_days"))
  }

  val kaplanMeierSql: String =
    """WITH life AS (
      |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d,
      |         MAX(CAST(o_orderdate AS DATE)) AS last_d
      |  FROM orders GROUP BY o_custkey),
      |h AS (SELECT MAX(last_d) AS max_d FROM life),
      |durs AS (
      |  SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT) AS dur,
      |    CASE WHEN date_diff('day', last_d, max_d) > 90
      |         THEN 1 ELSE 0 END AS churned
      |  FROM life, h),
      |grid AS (
      |  SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_at,
      |         CAST(SUM(churned) AS BIGINT) AS d_i
      |  FROM durs GROUP BY dur),
      |risk AS (
      |  SELECT dur, d_i,
      |    CAST(SUM(n_at) OVER (ORDER BY dur DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS n_risk
      |  FROM grid),
      |ev AS (SELECT * FROM risk WHERE d_i > 0 AND n_risk > d_i),
      |km AS (
      |  SELECT dur, n_risk, d_i,
      |    CAST(SUM(CAST(round(ln(CAST(n_risk - d_i AS DOUBLE)) * 1e6) AS BIGINT)
      |           - CAST(round(ln(CAST(n_risk AS DOUBLE)) * 1e6) AS BIGINT))
      |      OVER (ORDER BY dur
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS ln_surv_micro
      |  FROM ev)
      |SELECT dur AS t_days, n_risk, d_i AS n_events, ln_surv_micro,
      |  CAST(ln_surv_micro AS DOUBLE) / 1e6 AS ln_survival
      |FROM km ORDER BY t_days""".stripMargin

  // --- actuarial life table ------------------------------------------------------
  /** Actuarial (life-table) estimator over 30-day duration bands —
    * the third classical estimator beside [[kaplanMeier]] (exact
    * event times) and [[nelsonAalen]] (cumulative hazard): group
    * lifetimes into fixed intervals, adjust the at-risk count for
    * within-interval censoring by the standard half-credit n′ₖ =
    * nₖ − cₖ/2 (Cutler & Ederer, J. Chronic Dis. 1958), and
    * multiply conditional survivals q̂ₖ = dₖ/n′ₖ. The spelling a
    * reporting layer actually publishes when exact-time granularity
    * is noise (monthly retention tables).
    *
    * Exactness: the ½ in n′ₖ clears by DOUBLING — ln(1−qₖ) =
    * ln(2nₖ−cₖ−2dₖ) − ln(2nₖ−cₖ) on exact BIGINTs — so the product
    * rides the [[kaplanMeier]] integer-micronat cumulation
    * unchanged; q̂ₖ is ONE IEEE division of exact integers.
    * Censoring-only bands contribute an exactly-zero micronat term
    * (ln x − ln x) and are kept; a terminal band whose doubled
    * effective risk set is exhausted (2nₖ−cₖ−2dₖ ≤ 0, ln S → −∞) is
    * excluded like KM's terminal row.
    *
    * Scale: the same one-row-per-customer fold as KM, collapsed to
    * the ≤(calendar-span/30)-row band grid; suffix/cumulative
    * windows ride that bounded grid (allowlisted).
    */
  def lifeTable(s: SparkSession, dir: String, bandDays: Int = 30): DataFrame = {
    val life = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .groupBy(col("o_custkey"))
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
    val horizon = life.agg(max(col("last_d")).as("max_d"))
    val grid = life.crossJoin(broadcast(horizon))
      .select(expr(s"datediff(last_d, first_d) div $bandDays").as("band"),
        when(datediff(col("max_d"), col("last_d")) > 90, 1L).otherwise(0L)
          .as("churned"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_end"), sum(col("churned")).as("d_k"))
      .withColumn("c_k", col("n_end") - col("d_k"))
    val wRisk = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Graft.materialize(grid)
      .withColumn("n_enter", sum(col("n_end")).over(wRisk))
      .withColumn("eff2", lit(2L) * col("n_enter") - col("c_k"))
      .filter(col("eff2") - lit(2L) * col("d_k") > 0L)
      .withColumn("ln_surv_micro",
        sum(lnMicro(col("eff2") - lit(2L) * col("d_k")) - lnMicro(col("eff2")))
          .over(wCum))
      .select((col("band") * bandDays.toLong).as("band_start_day"),
        col("n_enter"), col("d_k").as("n_events"),
        col("c_k").as("n_censored"),
        ((lit(2L) * col("d_k")).cast("double") / col("eff2").cast("double"))
          .as("q_hazard"),
        col("ln_surv_micro"),
        (col("ln_surv_micro").cast("double") / lit(1e6)).as("ln_survival"))
      .orderBy(col("band_start_day"))
  }

  def lifeTableSql(bandDays: Int = 30): String = {
    def lnu(v: String): String =
      s"CAST(round(ln(CAST($v AS DOUBLE)) * 1e6) AS BIGINT)"
    val band = PortableSql.intDiv("date_diff('day', first_d, last_d)",
      bandDays.toString)
    s"""WITH life AS (
      |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d,
      |         MAX(CAST(o_orderdate AS DATE)) AS last_d
      |  FROM orders GROUP BY o_custkey),
      |h AS (SELECT MAX(last_d) AS max_d FROM life),
      |ends AS (
      |  SELECT $band AS band,
      |    CASE WHEN date_diff('day', last_d, max_d) > 90
      |         THEN 1 ELSE 0 END AS churned
      |  FROM life, h),
      |grid AS (
      |  SELECT band, CAST(COUNT(*) AS BIGINT) AS n_end,
      |    CAST(SUM(churned) AS BIGINT) AS d_k
      |  FROM ends GROUP BY band),
      |risk AS (
      |  SELECT band, d_k, n_end - d_k AS c_k,
      |    CAST(SUM(n_end) OVER (ORDER BY band DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS n_enter
      |  FROM grid),
      |eff AS (
      |  SELECT band, n_enter, d_k, c_k, 2 * n_enter - c_k AS eff2
      |  FROM risk WHERE 2 * n_enter - c_k - 2 * d_k > 0),
      |lt AS (
      |  SELECT band, n_enter, d_k, c_k, eff2,
      |    CAST(SUM(${lnu("eff2 - 2 * d_k")} - ${lnu("eff2")})
      |      OVER (ORDER BY band
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS ln_surv_micro
      |  FROM eff)
      |SELECT CAST(band * $bandDays AS BIGINT) AS band_start_day,
      |  n_enter, d_k AS n_events, c_k AS n_censored,
      |  CAST(2 * d_k AS DOUBLE) / CAST(eff2 AS DOUBLE) AS q_hazard,
      |  ln_surv_micro,
      |  CAST(ln_surv_micro AS DOUBLE) / 1e6 AS ln_survival
      |FROM lt ORDER BY band_start_day""".stripMargin
  }

  // --- Nelson–Aalen cumulative hazard ------------------------------------------
  /** Nelson–Aalen cumulative-hazard estimator over the SAME
    * churn-duration grid as [[kaplanMeier]] (Nelson, Technometrics
    * 1972; Aalen, Ann. Stat. 1978): H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ — the
    * additive counterpart of KM's product (−ln S ≈ H; the pair is the
    * standard cross-check, and NA is what a Cox-model baseline hazard
    * actually consumes). Unlike KM's ln spelling, NA has no
    * log-domain hole at the terminal all-events row, so that row is
    * KEPT here (documented divergence from [[kaplanMeier]]'s exclusion
    * rule).
    *
    * Determinism: each per-step hazard dᵢ/nᵢ is ONE exact-rounded IEEE
    * division, immediately rounded onto the integer NANO grid
    * (round(·1e9) — the micronat discipline at higher resolution,
    * since step hazards sit at 1e-5..1e-2); the cumulative sum is then
    * EXACT BIGINT addition (order-free — never a cumulated double),
    * and the reported double is one final scale-down. Same
    * duration-grid windows as KM (calendar-bounded, the allowlisted
    * class).
    */
  def nelsonAalen(s: SparkSession, dir: String): DataFrame = {
    val life = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .groupBy(col("o_custkey"))
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
    val horizon = life.agg(max(col("last_d")).as("max_d"))
    val durations = life.crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long").as("dur"),
        when(datediff(col("max_d"), col("last_d")) > 90, 1L).otherwise(0L)
          .as("churned"))
      .groupBy(col("dur"))
      .agg(count(lit(1)).as("n_at"), sum(col("churned")).as("d_i"))
    val wRisk = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Graft.materialize(durations)
      .withColumn("n_risk", sum(col("n_at")).over(wRisk))
      .filter(col("d_i") > 0)
      .withColumn("hz_nano",
        round(col("d_i").cast("double") / col("n_risk").cast("double")
          * lit(1e9)).cast("long"))
      .withColumn("cum_hz_nano", sum(col("hz_nano")).over(wCum))
      .select(col("dur").as("t_days"), col("n_risk"),
        col("d_i").as("n_events"), col("hz_nano"), col("cum_hz_nano"),
        (col("cum_hz_nano").cast("double") / lit(1e9)).as("cum_hazard"))
      .orderBy(col("t_days"))
  }

  val nelsonAalenSql: String =
    """WITH life AS (
      |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d,
      |         MAX(CAST(o_orderdate AS DATE)) AS last_d
      |  FROM orders GROUP BY o_custkey),
      |h AS (SELECT MAX(last_d) AS max_d FROM life),
      |durs AS (
      |  SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT) AS dur,
      |    CASE WHEN date_diff('day', last_d, max_d) > 90
      |         THEN 1 ELSE 0 END AS churned
      |  FROM life, h),
      |grid AS (
      |  SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_at,
      |         CAST(SUM(churned) AS BIGINT) AS d_i
      |  FROM durs GROUP BY dur),
      |risk AS (
      |  SELECT dur, d_i,
      |    CAST(SUM(n_at) OVER (ORDER BY dur DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS n_risk
      |  FROM grid),
      |ev AS (
      |  SELECT dur, n_risk, d_i,
      |    CAST(round(CAST(d_i AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1e9)
      |         AS BIGINT) AS hz_nano
      |  FROM risk WHERE d_i > 0),
      |na AS (
      |  SELECT dur, n_risk, d_i, hz_nano,
      |    CAST(SUM(hz_nano) OVER (ORDER BY dur
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_hz_nano
      |  FROM ev)
      |SELECT dur AS t_days, n_risk, d_i AS n_events, hz_nano, cum_hz_nano,
      |  CAST(cum_hz_nano AS DOUBLE) / 1e9 AS cum_hazard
      |FROM na ORDER BY t_days""".stripMargin

  // --- shared Mantel per-event-time grid (log-rank + hazard ratio) --------------
  /** One row per churn duration with events: (dur, d_t, d_t_a, n_t,
    * n_t_a, e_nano, v_nano) — the hypergeometric O/E/V machinery of
    * the Mantel family, factored so [[logRank]] and [[hazardRatio]]
    * share one contract (the transitionPairGrid discipline). Group A
    * is the BUILDING market segment; e/v ride the integer NANO grid
    * per the [[nelsonAalen]] rounding rule so cross-row sums stay
    * exact BIGINT additions.
    *
    * Scale: orders → one row per customer (map-side combined), one
    * broadcast segment join, the distinct-duration grid, and the
    * allowlisted suffix-risk window over that bounded grid.
    */
  private def mantelGrid(s: SparkSession, dir: String): DataFrame = {
    val life = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .groupBy(col("o_custkey"))
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
    val grp = Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("in_a"))
    val horizon = life.agg(max(col("last_d")).as("max_d"))
    val durations = life
      .join(grp, col("o_custkey") === col("c_custkey"))
      .crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long").as("dur"),
        when(datediff(col("max_d"), col("last_d")) > 90, 1L).otherwise(0L)
          .as("churned"),
        col("in_a"))
      .groupBy(col("dur"))
      .agg(count(lit(1)).as("n_at"), sum(col("churned")).as("d_t"),
        sum(col("in_a")).as("n_at_a"),
        sum(col("churned") * col("in_a")).as("d_t_a"))
    val wRisk = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = Graft.materialize(durations)
      .withColumn("n_t", sum(col("n_at")).over(wRisk))
      .withColumn("n_t_a", sum(col("n_at_a")).over(wRisk))
      .filter(col("d_t") > 0)
    val d = col("d_t").cast("double")
    val n = col("n_t").cast("double")
    val na = col("n_t_a").cast("double")
    ev.withColumn("e_nano",
        round(d * na / n * lit(1e9)).cast("long"))
      .withColumn("v_nano",
        when(col("n_t") > 1L,
          round(d * (na / n) * (lit(1.0) - na / n)
            * ((n - d) / (n - lit(1.0))) * lit(1e9)).cast("long"))
          .otherwise(0L))
  }

  /** SQL twin of [[mantelGrid]]: CTEs through `ev` with the same
    * columns — prepend and build on `ev`. */
  private val mantelGridSql: String =
    """WITH life AS (
      |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d,
      |         MAX(CAST(o_orderdate AS DATE)) AS last_d
      |  FROM orders GROUP BY o_custkey),
      |grp AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS in_a
      |  FROM customer),
      |h AS (SELECT MAX(last_d) AS max_d FROM life),
      |durs AS (
      |  SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT) AS dur,
      |    CASE WHEN date_diff('day', last_d, max_d) > 90
      |         THEN 1 ELSE 0 END AS churned,
      |    in_a
      |  FROM life JOIN grp ON o_custkey = c_custkey, h),
      |grid AS (
      |  SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_at,
      |         CAST(SUM(churned) AS BIGINT) AS d_t,
      |         CAST(SUM(in_a) AS BIGINT) AS n_at_a,
      |         CAST(SUM(churned * in_a) AS BIGINT) AS d_t_a
      |  FROM durs GROUP BY dur),
      |risk AS (
      |  SELECT dur, d_t, d_t_a,
      |    CAST(SUM(n_at) OVER w AS BIGINT) AS n_t,
      |    CAST(SUM(n_at_a) OVER w AS BIGINT) AS n_t_a
      |  FROM grid
      |  WINDOW w AS (ORDER BY dur DESC
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |ev AS (
      |  SELECT dur, d_t, d_t_a,
      |    CAST(round(CAST(d_t AS DOUBLE) * CAST(n_t_a AS DOUBLE)
      |               / CAST(n_t AS DOUBLE) * 1e9) AS BIGINT) AS e_nano,
      |    CASE WHEN n_t > 1 THEN
      |      CAST(round(CAST(d_t AS DOUBLE)
      |                 * (CAST(n_t_a AS DOUBLE) / CAST(n_t AS DOUBLE))
      |                 * (1.0 - CAST(n_t_a AS DOUBLE) / CAST(n_t AS DOUBLE))
      |                 * ((CAST(n_t AS DOUBLE) - CAST(d_t AS DOUBLE))
      |                    / (CAST(n_t AS DOUBLE) - 1.0)) * 1e9) AS BIGINT)
      |      ELSE 0 END AS v_nano
      |  FROM risk WHERE d_t > 0)""".stripMargin

  // --- log-rank test -------------------------------------------------------------
  /** LOG-RANK (Mantel–Cox) test comparing churn survival between the
    * BUILDING market segment and everyone else (Mantel, Cancer
    * Chemother. Rep. 1966; Peto & Peto 1972), on the SAME duration /
    * churn / censoring definitions as [[kaplanMeier]] and
    * [[nelsonAalen]] — the standard "are these two retention curves
    * actually different" read an A/B or segment dashboard quotes,
    * completing the survival triple (curve, hazard, comparison).
    *
    * At each duration t with d_t total events: E_A = d_t·n_At/n_t and
    * hypergeometric variance V_t = d_t·(n_At/n_t)·(1−n_At/n_t)·
    * (n_t−d_t)/(n_t−1); Z = (O_A − ΣE_A)/√ΣV_t, χ² = Z².
    *
    * Determinism: per-step E and V are fixed-order IEEE expressions on
    * exact BIGINTs, rounded onto the integer NANO grid (the
    * [[nelsonAalen]] discipline) so the cross-row sums are exact
    * BIGINT additions — never an order-dependent float accumulation
    * over the ~10³-row duration grid. Z is three IEEE ops on exact
    * integers, NULL-guarded for a zero-variance grid.
    *
    * Scale shape: orders → one row per customer (map-side combined),
    * one broadcast customer-dim join for the segment flag, then the
    * distinct-duration grid; the risk windows ride that bounded grid
    * (allowlisted class), and the final reduce is 1-row.
    */
  def logRank(s: SparkSession, dir: String): DataFrame =
    mantelGrid(s, dir)
      .agg(count(lit(1)).as("n_event_times"),
        sum(col("d_t_a")).as("observed_a"),
        sum(col("e_nano")).as("expected_a_nano"),
        sum(col("v_nano")).as("var_nano"))
      .select(col("n_event_times"), col("observed_a"),
        col("expected_a_nano"),
        (col("expected_a_nano").cast("double") / lit(1e9)).as("expected_a"),
        when(col("var_nano") > 0L,
          (col("observed_a").cast("double")
            - col("expected_a_nano").cast("double") / lit(1e9))
            / sqrt(col("var_nano").cast("double") / lit(1e9)))
          .as("logrank_z"))
      .withColumn("chi2", col("logrank_z") * col("logrank_z"))

  val logRankSql: String =
    s"""$mantelGridSql,
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_event_times,
      |    CAST(SUM(d_t_a) AS BIGINT) AS observed_a,
      |    CAST(SUM(e_nano) AS BIGINT) AS expected_a_nano,
      |    CAST(SUM(v_nano) AS BIGINT) AS var_nano
      |  FROM ev),
      |z AS (
      |  SELECT n_event_times, observed_a, expected_a_nano,
      |    CAST(expected_a_nano AS DOUBLE) / 1e9 AS expected_a,
      |    CASE WHEN var_nano > 0 THEN
      |      (CAST(observed_a AS DOUBLE)
      |       - CAST(expected_a_nano AS DOUBLE) / 1e9)
      |      / sqrt(CAST(var_nano AS DOUBLE) / 1e9) END AS logrank_z
      |  FROM agg)
      |SELECT n_event_times, observed_a, expected_a_nano, expected_a,
      |  logrank_z, logrank_z * logrank_z AS chi2
      |FROM z""".stripMargin

  // --- Mantel–Haenszel hazard ratio ----------------------------------------------
  /** Mantel–Haenszel (Pike) hazard-ratio estimate from the SAME
    * per-event-time grid as [[logRank]]: HR ≈ (O_A/E_A)/(O_B/E_B) —
    * the MAGNITUDE read the log-rank z deliberately isn't (z says
    * WHETHER the BUILDING segment churns differently; HR says HOW
    * MANY TIMES the hazard is, the number a retention dashboard
    * quotes), with the standard log-scale 95% CI, se(ln HR) ≈
    * √(1/E_A + 1/E_B) (Pike 1972 convention).
    *
    * Determinism: O and the nano-grid E sums are exact BIGINTs off
    * [[mantelGrid]]; HR = (O_A·E_B)/(E_A·O_B) is transcendental-free;
    * ln HR takes ONE ln on a bit-identical double, rounded to the
    * nano grid (the lnMicro bet), and the CI bounds are fixed chains
    * of that and the se. NULL when any of O_A, O_B, E_A, E_B is
    * degenerate (a zero cell makes the MH estimator undefined).
    */
  def hazardRatio(s: SparkSession, dir: String): DataFrame = {
    val agg = mantelGrid(s, dir)
      .agg(sum(col("d_t")).as("events_total"),
        sum(col("d_t_a")).as("observed_a"),
        sum(col("e_nano")).as("expected_a_nano"))
    def d(c: Column): Column = c.cast("double")
    val oa = d(col("observed_a"))
    val ob = d(col("events_total") - col("observed_a"))
    val ea = d(col("expected_a_nano")) / lit(1e9)
    val eb = d(col("events_total") * lit(1000000000L)
      - col("expected_a_nano")) / lit(1e9)
    val ok = (col("observed_a") > 0L) &&
      (col("events_total") > col("observed_a")) &&
      (col("expected_a_nano") > 0L) &&
      (col("events_total") * lit(1000000000L) > col("expected_a_nano"))
    val hr = (oa * eb) / (ea * ob)
    agg.select(col("events_total"), col("observed_a"),
        ea.as("expected_a"), eb.as("expected_b"),
        when(ok, hr).as("hazard_ratio"),
        when(ok, round(log(hr) * lit(1e9)).cast("long")).as("ln_hr_nano"),
        when(ok, sqrt(lit(1.0) / ea + lit(1.0) / eb)).as("ln_hr_se"))
      .select(col("events_total"), col("observed_a"), col("expected_a"),
        col("expected_b"), col("hazard_ratio"),
        (col("ln_hr_nano").cast("double") / lit(1e9)).as("ln_hr"),
        col("ln_hr_se"),
        (col("ln_hr_nano").cast("double") / lit(1e9)
          - lit(1.959963985) * col("ln_hr_se")).as("ln_hr_lo95"),
        (col("ln_hr_nano").cast("double") / lit(1e9)
          + lit(1.959963985) * col("ln_hr_se")).as("ln_hr_hi95"))
  }

  val hazardRatioSql: String =
    s"""$mantelGridSql,
      |agg AS (
      |  SELECT CAST(SUM(d_t) AS BIGINT) AS events_total,
      |    CAST(SUM(d_t_a) AS BIGINT) AS observed_a,
      |    CAST(SUM(e_nano) AS BIGINT) AS expected_a_nano
      |  FROM ev),
      |k AS (
      |  SELECT events_total, observed_a,
      |    CAST(expected_a_nano AS DOUBLE) / 1e9 AS expected_a,
      |    CAST(events_total * 1000000000 - expected_a_nano AS DOUBLE) / 1e9
      |      AS expected_b,
      |    (observed_a > 0 AND events_total > observed_a
      |     AND expected_a_nano > 0
      |     AND events_total * 1000000000 > expected_a_nano) AS ok,
      |    (CAST(observed_a AS DOUBLE)
      |       * (CAST(events_total * 1000000000 - expected_a_nano AS DOUBLE)
      |          / 1e9))
      |    / ((CAST(expected_a_nano AS DOUBLE) / 1e9)
      |       * CAST(events_total - observed_a AS DOUBLE)) AS hr
      |  FROM agg),
      |p AS (
      |  SELECT events_total, observed_a, expected_a, expected_b,
      |    CASE WHEN ok THEN hr END AS hazard_ratio,
      |    CASE WHEN ok THEN CAST(round(ln(hr) * 1e9) AS BIGINT) END
      |      AS ln_hr_nano,
      |    CASE WHEN ok THEN sqrt(1.0 / expected_a + 1.0 / expected_b) END
      |      AS ln_hr_se
      |  FROM k)
      |SELECT events_total, observed_a, expected_a, expected_b, hazard_ratio,
      |  CAST(ln_hr_nano AS DOUBLE) / 1e9 AS ln_hr, ln_hr_se,
      |  CAST(ln_hr_nano AS DOUBLE) / 1e9 - 1.959963985 * ln_hr_se
      |    AS ln_hr_lo95,
      |  CAST(ln_hr_nano AS DOUBLE) / 1e9 + 1.959963985 * ln_hr_se
      |    AS ln_hr_hi95
      |FROM p""".stripMargin

  // --- Aalen–Johansen cumulative incidence (competing risks) --------------------
  /** Aalen–Johansen cumulative-incidence functions under COMPETING
    * RISKS (Aalen & Johansen, Scand. J. Stat. 1978): the same churn
    * grid as [[kaplanMeier]], but churn events are split by cause —
    * an ESTABLISHED customer (≥ 10 lifetime orders) exiting vs a
    * CASUAL one — and 1 − S(t) is decomposed into per-cause shares:
    * CIF_k(t) = Σ_{tᵢ≤t} S(tᵢ₋)·d_{k,i}/nᵢ, with S the ALL-CAUSE KM.
    * Naively treating the competing cause as censoring (1 − KM per
    * cause) over-counts; AJ is the correct decomposition and the
    * standard churn-mix read.
    *
    * Determinism: ln S rides the KM integer-micronat cumulation;
    * S(tᵢ₋) = exp of the PREVIOUS row's micronat sum (an exact BIGINT
    * subtraction of the own step — no lag needed), guarded onto the
    * integer NANO grid per the r13 exp-ulp rule (JVM and DuckDB libm
    * exp differ in the last ulp; ln does not); each CIF increment is
    * then the all-integer (s_prev_nano·d_k) div nᵢ, so the cumulative
    * CIFs are exact BIGINT sums. The terminal all-events row keeps its
    * increments (S(tᵢ₋) is still defined there) with the ln-step
    * guard zeroing only its own never-used log term.
    *
    * Scale shape: identical to [[nelsonAalen]] — one custkey-keyed
    * fold of orders, a 1-row horizon broadcast, then duration-grid
    * windows (calendar-bounded, the allowlisted class).
    */
  def aalenJohansen(s: SparkSession, dir: String,
                    establishedOrders: Int = 10): DataFrame = {
    val life = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .groupBy(col("o_custkey"))
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"),
        count(lit(1)).as("n_ord"))
    val horizon = life.agg(max(col("last_d")).as("max_d"))
    val durations = life.crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long").as("dur"),
        when(datediff(col("max_d"), col("last_d")) > 90, 1L).otherwise(0L)
          .as("churned"),
        (col("n_ord") >= establishedOrders).cast("long").as("est"))
      .groupBy(col("dur"))
      .agg(count(lit(1)).as("n_at"),
        sum(col("churned") * col("est")).as("d1"),
        sum(col("churned") * (lit(1L) - col("est"))).as("d2"))
    val wRisk = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dI = col("d1") + col("d2")
    Graft.materialize(durations)
      .withColumn("n_risk", sum(col("n_at")).over(wRisk))
      .filter((col("d1") + col("d2")) > 0)
      .withColumn("step",
        when(col("n_risk") > dI,
          lnMicro(col("n_risk") - dI) - lnMicro(col("n_risk")))
          .otherwise(0L))
      .withColumn("ln_s_micro", sum(col("step")).over(wCum))
      .withColumn("ln_s_prev_micro", col("ln_s_micro") - col("step"))
      .withColumn("s_prev_nano",
        round(exp(col("ln_s_prev_micro").cast("double") / lit(1e6)) * lit(1e9))
          .cast("long"))
      .withColumn("inc1_nano", expr("(s_prev_nano * d1) div n_risk"))
      .withColumn("inc2_nano", expr("(s_prev_nano * d2) div n_risk"))
      .withColumn("cif1_nano", sum(col("inc1_nano")).over(wCum))
      .withColumn("cif2_nano", sum(col("inc2_nano")).over(wCum))
      .select(col("dur").as("t_days"), col("n_risk"),
        col("d1").as("d_established"), col("d2").as("d_casual"),
        col("cif1_nano"), col("cif2_nano"),
        (col("cif1_nano").cast("double") / lit(1e9)).as("cif_established"),
        (col("cif2_nano").cast("double") / lit(1e9)).as("cif_casual"))
      .orderBy(col("t_days"))
  }

  /** DuckDB twin of [[aalenJohansen]], derived from the SAME
    * establishedOrders threshold. */
  def aalenJohansenSql(establishedOrders: Int = 10): String = {
    def lnu(v: String): String =
      s"CAST(round(ln(CAST($v AS DOUBLE)) * 1e6) AS BIGINT)"
    val inc1 = PortableSql.intDiv("s_prev_nano * d1", "n_risk")
    val inc2 = PortableSql.intDiv("s_prev_nano * d2", "n_risk")
    s"""WITH life AS (
      |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d,
      |         MAX(CAST(o_orderdate AS DATE)) AS last_d,
      |         CAST(COUNT(*) AS BIGINT) AS n_ord
      |  FROM orders GROUP BY o_custkey),
      |h AS (SELECT MAX(last_d) AS max_d FROM life),
      |durs AS (
      |  SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT) AS dur,
      |    CASE WHEN date_diff('day', last_d, max_d) > 90
      |         THEN 1 ELSE 0 END AS churned,
      |    CASE WHEN n_ord >= $establishedOrders THEN 1 ELSE 0 END AS est
      |  FROM life, h),
      |grid AS (
      |  SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_at,
      |    CAST(SUM(churned * est) AS BIGINT) AS d1,
      |    CAST(SUM(churned * (1 - est)) AS BIGINT) AS d2
      |  FROM durs GROUP BY dur),
      |risk AS (
      |  SELECT dur, d1, d2,
      |    CAST(SUM(n_at) OVER (ORDER BY dur DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS n_risk
      |  FROM grid),
      |ev AS (
      |  SELECT dur, n_risk, d1, d2,
      |    CASE WHEN n_risk > d1 + d2
      |         THEN ${lnu("n_risk - (d1 + d2)")} - ${lnu("n_risk")}
      |         ELSE 0 END AS step
      |  FROM risk WHERE d1 + d2 > 0),
      |km AS (
      |  SELECT dur, n_risk, d1, d2, step,
      |    CAST(SUM(step) OVER (ORDER BY dur
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS ln_s_micro
      |  FROM ev),
      |sp AS (
      |  SELECT dur, n_risk, d1, d2,
      |    CAST(round(exp(CAST(ln_s_micro - step AS DOUBLE) / 1e6) * 1e9)
      |         AS BIGINT) AS s_prev_nano
      |  FROM km),
      |inc AS (
      |  SELECT dur, n_risk, d1, d2,
      |    $inc1 AS inc1_nano, $inc2 AS inc2_nano
      |  FROM sp),
      |cif AS (
      |  SELECT dur, n_risk, d1, d2,
      |    CAST(SUM(inc1_nano) OVER w AS BIGINT) AS cif1_nano,
      |    CAST(SUM(inc2_nano) OVER w AS BIGINT) AS cif2_nano
      |  FROM inc
      |  WINDOW w AS (ORDER BY dur
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT dur AS t_days, n_risk, d1 AS d_established, d2 AS d_casual,
      |  cif1_nano, cif2_nano,
      |  CAST(cif1_nano AS DOUBLE) / 1e9 AS cif_established,
      |  CAST(cif2_nano AS DOUBLE) / 1e9 AS cif_casual
      |FROM cif ORDER BY t_days""".stripMargin
  }

  // --- restricted mean survival time --------------------------------------------
  /** Restricted mean survival time RMST(τ) = ∫₀^τ S(t)dt at fixed
    * horizons (1/2/5 years) — the model-free "expected retained
    * lifetime within τ" summary (Royston & Parmar, BMC Med Res
    * Methodol 2013) that survival dashboards report next to the KM
    * curve, robust where the median is undefined under heavy
    * censoring. The integral of the KM step function is a SUM over
    * inter-event intervals: Σ_k S(t_{k-1})·(min(t_k,τ) − min(t_{k-1},τ))
    * plus the tail S(t_m)·(τ − t_m) when τ outlives the grid.
    *
    * Determinism: S rides the [[kaplanMeier]] integer-micronat
    * cumulation with every exp output guarded onto the integer NANO
    * grid (the [[aalenJohansen]] exp-ulp rule; s_prev_nano at row k is
    * bit-identical to s_nano at row k−1 because the micronat sum is
    * exact BIGINT), interval lengths are exact day integers, so every
    * per-τ sum is an exact BIGINT in nano·days; the reported doubles
    * are one final scale-down each. The terminal risk-set-exhaustion
    * row (S = 0, excluded by KM's ln spelling) is KEPT here with
    * s_nano = 0 — RMST needs S to actually reach zero. The tail factor
    * uses min(s_nano) — valid because S is non-increasing, so the
    * minimum IS the post-grid survival.
    *
    * Scale: the same one-pass custkey fold + duration-grid windows as
    * [[kaplanMeier]] (calendar-bounded, allowlisted); the τ grid is a
    * |taus|-row broadcast and the result is |taus| rows.
    */
  def rmst(s: SparkSession, dir: String,
           taus: Seq[Long] = Seq(365L, 730L, 1825L)): DataFrame = {
    val life = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .groupBy(col("o_custkey"))
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
    val horizon = life.agg(max(col("last_d")).as("max_d"))
    val durations = life.crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long").as("dur"),
        when(datediff(col("max_d"), col("last_d")) > 90, 1L).otherwise(0L)
          .as("churned"))
      .groupBy(col("dur"))
      .agg(count(lit(1)).as("n_at"), sum(col("churned")).as("d_i"))
    val wRisk = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.orderBy(col("dur"))
    val sNano = (lnCol: Column) =>
      round(exp(lnCol.cast("double") / lit(1e6)) * lit(1e9)).cast("long")
    val km = Graft.materialize(durations)
      .withColumn("n_risk", sum(col("n_at")).over(wRisk))
      .filter(col("d_i") > 0)
      .withColumn("step",
        when(col("n_risk") > col("d_i"),
          lnMicro(col("n_risk") - col("d_i")) - lnMicro(col("n_risk")))
          .otherwise(0L))
      .withColumn("ln_s_micro", sum(col("step")).over(wCum))
      .withColumn("s_prev_nano", sNano(col("ln_s_micro") - col("step")))
      .withColumn("s_nano",
        when(col("n_risk") > col("d_i"), sNano(col("ln_s_micro")))
          .otherwise(lit(0L)))
      .withColumn("prev_dur", lag(col("dur"), 1, 0L).over(wLag))
    val tauDf = s.createDataFrame(taus.map(Tuple1(_))).toDF("tau_days")
    km.crossJoin(broadcast(tauDf))
      .groupBy(col("tau_days"))
      .agg(
        sum(col("s_prev_nano")
          * (least(col("dur"), col("tau_days"))
            - least(col("prev_dur"), col("tau_days")))).as("body_nano"),
        min(col("s_nano")).as("s_tail_nano"),
        max(col("dur")).as("max_dur"))
      .select(col("tau_days"),
        (col("body_nano") + col("s_tail_nano")
          * greatest(lit(0L), col("tau_days")
            - least(col("max_dur"), col("tau_days")))).as("rmst_nano"))
      .select(col("tau_days"), col("rmst_nano"),
        (col("rmst_nano").cast("double") / lit(1e9)).as("rmst_days"),
        (col("rmst_nano").cast("double")
          / (lit(1e9) * col("tau_days").cast("double"))).as("rmst_share"))
      .orderBy(col("tau_days"))
  }

  /** DuckDB twin of [[rmst]], derived from the SAME τ grid. */
  def rmstSql(taus: Seq[Long] = Seq(365L, 730L, 1825L)): String = {
    def lnu(v: String): String =
      s"CAST(round(ln(CAST($v AS DOUBLE)) * 1e6) AS BIGINT)"
    val tauValues = taus.map(t => s"(CAST($t AS BIGINT))").mkString(", ")
    s"""WITH life AS (
      |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d,
      |         MAX(CAST(o_orderdate AS DATE)) AS last_d
      |  FROM orders GROUP BY o_custkey),
      |h AS (SELECT MAX(last_d) AS max_d FROM life),
      |durs AS (
      |  SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT) AS dur,
      |    CASE WHEN date_diff('day', last_d, max_d) > 90
      |         THEN 1 ELSE 0 END AS churned
      |  FROM life, h),
      |grid AS (
      |  SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_at,
      |         CAST(SUM(churned) AS BIGINT) AS d_i
      |  FROM durs GROUP BY dur),
      |risk AS (
      |  SELECT dur, d_i,
      |    CAST(SUM(n_at) OVER (ORDER BY dur DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS n_risk
      |  FROM grid),
      |ev AS (
      |  SELECT dur, n_risk, d_i,
      |    CASE WHEN n_risk > d_i
      |         THEN ${lnu("n_risk - d_i")} - ${lnu("n_risk")}
      |         ELSE 0 END AS step
      |  FROM risk WHERE d_i > 0),
      |km AS (
      |  SELECT dur, n_risk, d_i, step,
      |    CAST(SUM(step) OVER w AS BIGINT) AS ln_s_micro,
      |    CAST(COALESCE(lag(dur) OVER (ORDER BY dur), 0) AS BIGINT)
      |      AS prev_dur
      |  FROM ev
      |  WINDOW w AS (ORDER BY dur
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |sv AS (
      |  SELECT dur, prev_dur,
      |    CAST(round(exp(CAST(ln_s_micro - step AS DOUBLE) / 1e6) * 1e9)
      |      AS BIGINT) AS s_prev_nano,
      |    CASE WHEN n_risk > d_i
      |      THEN CAST(round(exp(CAST(ln_s_micro AS DOUBLE) / 1e6) * 1e9)
      |        AS BIGINT)
      |      ELSE 0 END AS s_nano
      |  FROM km),
      |r AS (
      |  SELECT tau.tau_days,
      |    CAST(SUM(s_prev_nano * (least(dur, tau.tau_days)
      |                            - least(prev_dur, tau.tau_days)))
      |      AS BIGINT) AS body_nano,
      |    MIN(s_nano) AS s_tail_nano, MAX(dur) AS max_dur
      |  FROM sv, (VALUES $tauValues) tau(tau_days)
      |  GROUP BY tau.tau_days),
      |f AS (
      |  SELECT tau_days,
      |    body_nano + s_tail_nano
      |      * greatest(0, tau_days - least(max_dur, tau_days)) AS rmst_nano
      |  FROM r)
      |SELECT tau_days, rmst_nano,
      |  CAST(rmst_nano AS DOUBLE) / 1e9 AS rmst_days,
      |  CAST(rmst_nano AS DOUBLE) / (1e9 * CAST(tau_days AS DOUBLE))
      |    AS rmst_share
      |FROM f ORDER BY tau_days""".stripMargin
  }
}
