package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-drift detection — the monitors a production pipeline
  * runs between a reference window and a current window before trusting
  * a model or a feature: Population Stability Index (the banking/ML
  * industry's binned KL-symmetrization) and the exact two-sample
  * Kolmogorov–Smirnov statistic. Both compare the FIRST HALF of the
  * event log's time range against the second half (temporal drift, the
  * case that actually bites), with the split point derived
  * deterministically from exact epoch-microsecond integers.
  *
  * Determinism discipline: every p and q is a ratio of exact BIGINT
  * counts; logs ride as integer micronats (`round(ln(n)·1e6)` over
  * integer counts — the [[TextQueries.charEntropy]] domain) and the
  * few remaining IEEE ops act on bit-identical inputs in a fixed
  * order, so both reports hash-match DuckDB.
  */
object Drift {

  private def lnMicro(c: Column): Column =
    round(log(c.cast("double")) * lit(1e6)).cast("long")

  /** events tagged with their temporal half: side 'a' = first half of
    * the [min_ts, max_ts] range, 'b' = second. The 1-row min/max
    * aggregate broadcasts into a narrow map — two passes over the
    * scan, no shuffle of the events themselves.
    */
  private def sided(s: SparkSession, dir: String): DataFrame = {
    // Tables.events, not Tables.load: the driver has shipped events.ts
    // as TIMESTAMP(NANOS-as-long), NTZ, and LTZ across generations, and
    // unix_micros only accepts the canonical LTZ shape the adapter emits
    val ev = Tables.events(s, dir)
      .select(unix_micros(col("ts")).as("us"), col("value"))
    val bounds = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
    // midpoint via TRUNCATING integer division: `/` on BIGINTs is
    // float division in some engines and integer division in others
    // (the PortableSql class of hazard) — `div`/intDiv is unambiguous
    ev.crossJoin(broadcast(bounds))
      .select(
        when(col("us") < expr("(mn + mx) div 2"), "a")
          .otherwise("b").as("side"),
        col("value"))
  }

  // --- Population Stability Index --------------------------------------------
  /** PSI over 10 fixed-width value bins: per bin, the two halves'
    * counts and the bin's PSI contribution
    * `(p̂_a − p̂_b) · ln(p̂_a/p̂_b)` with Laplace-smoothed shares
    * `p̂ = (c+1)/(n+10)` so an empty bin contributes finitely. The
    * conventional read: PSI < 0.1 stable, 0.1–0.25 shifting, > 0.25
    * drifted. Fixed-width bins (not quantile bins) keep the binning a
    * narrow map — one map-side-combined groupBy on a 10-value key is
    * the whole cost at any scale.
    *
    * The ln of the share RATIO expands to
    * lnµ(c_a')+lnµ(n_b') − lnµ(c_b') − lnµ(n_a') over integer counts;
    * the share difference is the exact integer `c_a'·n_b' − c_b'·n_a'`
    * over the exact product of totals — so the contribution is three
    * IEEE ops on bit-identical operands.
    */
  def psi(s: SparkSession, dir: String, bins: Int = 10,
          width: Double = 50.0): DataFrame = {
    val binned = sided(s, dir)
      .select(col("side"),
        least(greatest(floor(col("value") / width), lit(0.0)),
          lit(bins - 1.0)).cast("int").as("bin"))
      .groupBy(col("bin"))
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"))
    val totals = binned.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    binned.crossJoin(broadcast(totals))
      .select(col("bin"), col("ca").as("n_a"), col("cb").as("n_b"),
        (col("ca") + 1L).as("cas"), (col("cb") + 1L).as("cbs"),
        (col("na") + bins.toLong).as("nas"), (col("nb") + bins.toLong).as("nbs"))
      .select(col("bin"), col("n_a"), col("n_b"),
        (((col("cas") * col("nbs") - col("cbs") * col("nas")).cast("double")
          / (col("nas").cast("double") * col("nbs").cast("double"))) *
          ((lnMicro(col("cas")) + lnMicro(col("nbs"))
            - lnMicro(col("cbs")) - lnMicro(col("nas"))).cast("double")
            / lit(1e6))).as("psi_contrib"))
      .orderBy(col("bin"))
  }

  val psiSql: String =
    """WITH ev AS (SELECT epoch_us(ts) AS us, value FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      |sided AS (
      |  SELECT CASE WHEN us < CAST(((mn + mx) - ((mn + mx) % 2)) / 2 AS BIGINT)
      |              THEN 'a' ELSE 'b' END AS side,
      |    CAST(least(greatest(floor(value / 50.0), 0), 9) AS INTEGER) AS bin
      |  FROM ev, b),
      |cnt AS (
      |  SELECT bin,
      |    CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM sided GROUP BY bin),
      |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      |      FROM cnt),
      |sm AS (
      |  SELECT bin, ca AS n_a, cb AS n_b,
      |    ca + 1 AS cas, cb + 1 AS cbs, na + 10 AS nas, nb + 10 AS nbs
      |  FROM cnt, t)
      |SELECT bin, n_a, n_b,
      | (CAST(cas * nbs - cbs * nas AS DOUBLE)
      |    / (CAST(nas AS DOUBLE) * CAST(nbs AS DOUBLE)))
      |  * (CAST(CAST(round(ln(CAST(cas AS DOUBLE)) * 1e6) AS BIGINT)
      |        + CAST(round(ln(CAST(nbs AS DOUBLE)) * 1e6) AS BIGINT)
      |        - CAST(round(ln(CAST(cbs AS DOUBLE)) * 1e6) AS BIGINT)
      |        - CAST(round(ln(CAST(nas AS DOUBLE)) * 1e6) AS BIGINT) AS DOUBLE)
      |     / 1e6) AS psi_contrib
      |FROM sm ORDER BY bin""".stripMargin

  // --- exact two-sample Kolmogorov–Smirnov ------------------------------------
  /** The exact KS statistic `D = max_v |F_a(v) − F_b(v)|` between the
    * two temporal halves, computed entirely in BIGINT: the pooled
    * per-value cumulative counts give
    * `D·n_a·n_b = max |cumA·n_b − cumB·n_a|` — integer-exact (no
    * division inside the max), with the final ratio one IEEE division.
    * Also reports the value where the supremum is attained (lowest
    * such value on ties).
    *
    * Scale note: the cumulative counts run over the per-VALUE
    * aggregate, not the raw events, and the running CDF is the
    * range-partitioned two-pass [[graft.Graft.cumSumByRange]] — no
    * single-partition `sum OVER (ORDER BY value)` spine anywhere, so
    * the spelling survives even a truly continuous metric whose
    * distinct-value grid grows with the data (the r9-era window
    * spelling leaned on a ≤ 49k two-decimal domain bound). The scaled
    * integer stays exact to ~3·10⁹ rows per side (n_a·n_b < 2⁶³).
    */
  def ks(s: SparkSession, dir: String): DataFrame = {
    val perValue = sided(s, dir)
      .groupBy(col("value"))
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"))
    val totals = perValue.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    graft.Graft.cumSumByRange(perValue, Seq(col("value")),
        Seq(col("ca") -> "cumA", col("cb") -> "cumB"))
      .select(col("value"), col("cumA"), col("cumB"))
      .crossJoin(broadcast(totals))
      .select(col("value"),
        abs(col("cumA") * col("nb") - col("cumB") * col("na")).as("d_scaled"),
        col("na").as("n_a"), col("nb").as("n_b"))
      .orderBy(col("d_scaled").desc, col("value"))
      .limit(1)
      .select(col("n_a"), col("n_b"), col("value").as("at_value"),
        col("d_scaled").as("ks_scaled"),
        (col("d_scaled").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("ks"))
  }

  val ksSql: String =
    """WITH ev AS (SELECT epoch_us(ts) AS us, value FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      |sided AS (
      |  SELECT CASE WHEN us < CAST(((mn + mx) - ((mn + mx) % 2)) / 2 AS BIGINT)
      |              THEN 'a' ELSE 'b' END AS side, value
      |  FROM ev, b),
      |pv AS (
      |  SELECT value,
      |    CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM sided GROUP BY value),
      |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      |      FROM pv),
      |cum AS (
      |  SELECT value,
      |    SUM(ca) OVER (ORDER BY value
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumA,
      |    SUM(cb) OVER (ORDER BY value
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumB
      |  FROM pv)
      |SELECT na AS n_a, nb AS n_b, value AS at_value,
      | CAST(abs(cumA * nb - cumB * na) AS BIGINT) AS ks_scaled,
      | CAST(abs(cumA * nb - cumB * na) AS DOUBLE)
      |   / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks
      |FROM cum, t
      |ORDER BY ks_scaled DESC, value LIMIT 1""".stripMargin

  // --- Cramér–von Mises two-sample --------------------------------------------
  /** Cramér–von Mises two-sample statistic between the temporal
    * halves (Anderson, Ann. Math. Stat. 1962) — the INTEGRATED
    * companion to [[ks]]'s supremum: T = (n·m/N²)·Σ_pooled
    * (F̂_a − F̂_b)², which accumulates distributional drift across the
    * WHOLE range where KS sees only the single worst point (a shift
    * spread thinly over many values moves T long before it moves KS).
    * Ties are handled by the ECDF-integral definition itself — every
    * pooled observation contributes its value's squared ECDF gap.
    * The asymptotic null mean 1/6 + 1/(6N) is reported beside T so
    * the excess reads directly.
    *
    * Exactness: the numerator Σ_v cnt_v·D_v² (D_v = cumA·m − cumB·n,
    * the integer-scaled ECDF gap) is EXACT — every factor is cast to
    * DECIMAL BEFORE any multiply (cnt → DECIMAL(10,0), D →
    * DECIMAL(14,0) twice: 10+14+14 = 38 binds in both engines), so
    * no BIGINT product exists anywhere in the term (the first
    * spelling computed cnt·D in BIGINT first — a silent non-ANSI
    * wrap past ~9.2e18, r16 advice item) and no per-term grid
    * truncation accumulates across the N summands; T = num/(N²·n·m)
    * is one IEEE chain off the decimal→double cast (VARCHAR-routed
    * in the oracle). Headroom, LOUDLY enforced: |D| ≤ n·m must fit
    * DECIMAL(14,0) (per-half counts to ~10⁷) — a wider D nulls its
    * term on the Spark side, which the n_terms==n_terms_ok
    * assert_true turns into an error instead of a silently smaller
    * sum (DuckDB's own cast errors natively); beyond that envelope
    * the gap pre-scales by `div N` at a documented resolution cost.
    *
    * Scale: identical to [[ks]] — per-VALUE fold, range-partitioned
    * prefix sums via [[graft.Graft.cumSumByRange]], 1-row reduce.
    */
  def cvm(s: SparkSession, dir: String): DataFrame = {
    val perValue = sided(s, dir)
      .groupBy(col("value"))
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"))
    val totals = perValue.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    graft.Graft.cumSumByRange(perValue, Seq(col("value")),
        Seq(col("ca") -> "cumA", col("cb") -> "cumB"))
      .select(col("ca"), col("cb"), col("cumA"), col("cumB"))
      .crossJoin(broadcast(totals))
      .select(col("na"), col("nb"),
        (col("cumA") * col("nb") - col("cumB") * col("na")).as("d"),
        (col("ca") + col("cb")).as("cnt"))
      .select(col("na"), col("nb"),
        (col("cnt").cast("decimal(10,0)")
          * col("d").cast("decimal(14,0)")
          * col("d").cast("decimal(14,0)")).as("term"))
      .groupBy(col("na"), col("nb"))
      .agg(sum(col("term")).as("num"),
        count(lit(1)).as("n_terms"), count(col("term")).as("n_terms_ok"))
      // overflow loudness: a D wider than DECIMAL(14,0) casts to null,
      // and sum() would silently DROP that term — assert instead
      .where(assert_true(col("n_terms") === col("n_terms_ok"),
        lit("cvm: |D| exceeded DECIMAL(14,0) — pre-scale the gap by div N")).isNull)
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        (col("num").cast("double")
          / ((col("na") + col("nb")).cast("double")
            * (col("na") + col("nb")).cast("double")
            * (col("na") * col("nb")).cast("double")))
          .as("cvm_t"),
        (lit(1.0) / lit(6.0)
          + lit(1.0) / (lit(6.0) * (col("na") + col("nb")).cast("double")))
          .as("cvm_t_null_mean"))
  }

  val cvmSql: String = {
    s"""WITH ev AS (SELECT epoch_us(ts) AS us, value FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      |sided AS (
      |  SELECT CASE WHEN us < CAST(((mn + mx) - ((mn + mx) % 2)) / 2 AS BIGINT)
      |              THEN 'a' ELSE 'b' END AS side, value
      |  FROM ev, b),
      |pv AS (
      |  SELECT value,
      |    CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM sided GROUP BY value),
      |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      |      FROM pv),
      |cum AS (
      |  SELECT ca, cb,
      |    CAST(SUM(ca) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumA,
      |    CAST(SUM(cb) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumB
      |  FROM pv),
      |agg AS (
      |  SELECT na, nb,
      |    CAST(CAST(SUM(CAST(ca + cb AS DECIMAL(10,0))
      |      * CAST(cumA * nb - cumB * na AS DECIMAL(14,0))
      |      * CAST(cumA * nb - cumB * na AS DECIMAL(14,0))) AS VARCHAR)
      |      AS DOUBLE) AS num
      |  FROM cum, t GROUP BY na, nb)
      |SELECT na AS n_a, nb AS n_b,
      |  num / (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
      |         * CAST(na * nb AS DOUBLE)) AS cvm_t,
      |  1.0 / 6.0 + 1.0 / (6.0 * CAST(na + nb AS DOUBLE))
      |    AS cvm_t_null_mean
      |FROM agg""".stripMargin
  }

  // --- Ansari–Bradley scale test ----------------------------------------------
  /** Ansari–Bradley two-sample SCALE test between the temporal halves
    * (Ansari & Bradley, Ann. Math. Stat. 1960) — the rank-based
    * dispersion complement to this family's location tests ([[ks]]
    * sees any difference, [[mannWhitney]] sees shift; AB specifically
    * sees "did the SPREAD change"): rank the pooled sample, score
    * each rank i as min(i, N+1−i) — small at both extremes, large in
    * the middle — and sum the scores of the 'a' half. A compressed
    * (low-variance) half concentrates in the middle and scores HIGH.
    * Ties take midrank-averaged scores, computed EXACTLY per distinct
    * value from the closed-form prefix sum g(t) = Σ_{i≤t} min(i,N+1−i)
    * (two integer triangle formulas around the midpoint — every g is
    * an exact BIGINT; headroom N²/4 < 2^63 to N ~ 6e9 observations).
    * The per-value term c_a·(scoresum/cnt) is one shared IEEE chain
    * landed on the integer MICRO grid before the cross-value sum, so
    * the statistic is order-free and hash-exact; the ≤5e-7 per-value
    * grid landing is measurement resolution, not an accumulating bias
    * (the statistic is reported in micro units). Null mean/variance
    * are the standard no-tie-correction closed forms (Hollander &
    * Wolfe §5.2), parity-branched on N, with the z-score beside them.
    *
    * Scale: the [[ks]] shape — per-VALUE fold, range-partitioned
    * prefix sums ([[graft.Graft.cumSumByRange]]), 1-row reduce.
    */
  def ansariBradley(s: SparkSession, dir: String): DataFrame = {
    val perValue = sided(s, dir)
      .groupBy(col("value"))
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"))
    val totals = perValue.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    // g(t) = sum_{i=1}^{t} min(i, N+1-i), exact integers: ascending
    // triangle to the midpoint m1 = (N+1) div 2, descending after
    def g(t: String): String =
      s"""(case when $t <= m1 then ($t * ($t + 1)) div 2
         | else (m1 * (m1 + 1)) div 2
         |   + (((bigN - m1) * (bigN - m1 + 1)) - ((bigN - $t) * (bigN - $t + 1))) div 2
         | end)""".stripMargin
    val terms = graft.Graft.cumSumByRange(perValue, Seq(col("value")),
        Seq(col("ca") -> "cumA", col("cb") -> "cumB"))
      .crossJoin(broadcast(totals))
      .select(col("ca"), (col("ca") + col("cb")).as("cnt"),
        (col("cumA") + col("cumB")).as("hi"),
        (col("na") + col("nb")).as("bigN"), col("na"), col("nb"))
      .withColumn("m1", expr("(bigN + 1) div 2"))
      .withColumn("lo", col("hi") - col("cnt"))
      .withColumn("scoresum", expr(s"${g("hi")} - ${g("lo")}"))
      .select(col("na"), col("nb"),
        round(col("ca").cast("double")
          * (col("scoresum").cast("double") / col("cnt").cast("double"))
          * lit(1e6)).cast("long").as("term_micro"))
    terms.groupBy(col("na"), col("nb"))
      .agg(sum(col("term_micro")).as("a_micro"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        (col("a_micro").cast("double") / lit(1e6)).as("ab_stat"),
        when((col("na") + col("nb")) % 2L === 0L,
          col("na").cast("double") * ((col("na") + col("nb")).cast("double") + lit(2.0)) / lit(4.0))
          .otherwise(col("na").cast("double")
            * ((col("na") + col("nb")).cast("double") + lit(1.0))
            * ((col("na") + col("nb")).cast("double") + lit(1.0))
            / (lit(4.0) * (col("na") + col("nb")).cast("double")))
          .as("ab_null_mean"),
        when((col("na") + col("nb")) % 2L === 0L,
          col("na").cast("double") * col("nb").cast("double")
            * ((col("na") + col("nb")).cast("double") + lit(2.0))
            * ((col("na") + col("nb")).cast("double") - lit(2.0))
            / (lit(48.0) * ((col("na") + col("nb")).cast("double") - lit(1.0))))
          .otherwise(col("na").cast("double") * col("nb").cast("double")
            * ((col("na") + col("nb")).cast("double") + lit(1.0))
            * (lit(3.0) + (col("na") + col("nb")).cast("double")
              * (col("na") + col("nb")).cast("double"))
            / (lit(48.0) * (col("na") + col("nb")).cast("double")
              * (col("na") + col("nb")).cast("double")))
          .as("ab_null_var"))
      .withColumn("ab_z",
        (col("ab_stat") - col("ab_null_mean")) / sqrt(col("ab_null_var")))
  }

  val ansariBradleySql: String = {
    def g(t: String): String =
      s"""(CASE WHEN $t <= m1 THEN ${PortableSql.intDiv(s"($t * ($t + 1))", "2")}
         | ELSE ${PortableSql.intDiv("(m1 * (m1 + 1))", "2")}
         |   + ${PortableSql.intDiv(
               s"(((bigN - m1) * (bigN - m1 + 1)) - ((bigN - $t) * (bigN - $t + 1)))", "2")}
         | END)""".stripMargin
    s"""WITH ev AS (SELECT epoch_us(ts) AS us, value FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      |sided AS (
      |  SELECT CASE WHEN us < CAST(((mn + mx) - ((mn + mx) % 2)) / 2 AS BIGINT)
      |              THEN 'a' ELSE 'b' END AS side, value
      |  FROM ev, b),
      |pv AS (
      |  SELECT value,
      |    CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM sided GROUP BY value),
      |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      |      FROM pv),
      |cum AS (
      |  SELECT ca, ca + cb AS cnt,
      |    CAST(SUM(ca + cb) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hi,
      |    na + nb AS bigN, na, nb
      |  FROM pv, t),
      |rng AS (
      |  SELECT ca, cnt, hi, hi - cnt AS lo, bigN, na, nb,
      |    ${PortableSql.intDiv("(bigN + 1)", "2")} AS m1
      |  FROM cum),
      |terms AS (
      |  SELECT na, nb,
      |    CAST(ROUND(CAST(ca AS DOUBLE)
      |      * (CAST(${g("hi")} - ${g("lo")} AS DOUBLE) / CAST(cnt AS DOUBLE))
      |      * 1000000.0, 0) AS BIGINT) AS term_micro
      |  FROM rng),
      |agg AS (
      |  SELECT na, nb, CAST(SUM(term_micro) AS BIGINT) AS a_micro
      |  FROM terms GROUP BY na, nb)
      |SELECT na AS n_a, nb AS n_b,
      |  CAST(a_micro AS DOUBLE) / 1000000.0 AS ab_stat,
      |  CASE WHEN (na + nb) % 2 = 0 THEN
      |    CAST(na AS DOUBLE) * (CAST(na + nb AS DOUBLE) + 2.0) / 4.0
      |  ELSE
      |    CAST(na AS DOUBLE) * (CAST(na + nb AS DOUBLE) + 1.0)
      |      * (CAST(na + nb AS DOUBLE) + 1.0)
      |      / (4.0 * CAST(na + nb AS DOUBLE))
      |  END AS ab_null_mean,
      |  CASE WHEN (na + nb) % 2 = 0 THEN
      |    CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |      * (CAST(na + nb AS DOUBLE) + 2.0) * (CAST(na + nb AS DOUBLE) - 2.0)
      |      / (48.0 * (CAST(na + nb AS DOUBLE) - 1.0))
      |  ELSE
      |    CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |      * (CAST(na + nb AS DOUBLE) + 1.0)
      |      * (3.0 + CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE))
      |      / (48.0 * CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE))
      |  END AS ab_null_var,
      |  (CAST(a_micro AS DOUBLE) / 1000000.0
      |    - CASE WHEN (na + nb) % 2 = 0 THEN
      |        CAST(na AS DOUBLE) * (CAST(na + nb AS DOUBLE) + 2.0) / 4.0
      |      ELSE
      |        CAST(na AS DOUBLE) * (CAST(na + nb AS DOUBLE) + 1.0)
      |          * (CAST(na + nb AS DOUBLE) + 1.0)
      |          / (4.0 * CAST(na + nb AS DOUBLE))
      |      END)
      |  / sqrt(CASE WHEN (na + nb) % 2 = 0 THEN
      |      CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |        * (CAST(na + nb AS DOUBLE) + 2.0) * (CAST(na + nb AS DOUBLE) - 2.0)
      |        / (48.0 * (CAST(na + nb AS DOUBLE) - 1.0))
      |    ELSE
      |      CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
      |        * (CAST(na + nb AS DOUBLE) + 1.0)
      |        * (3.0 + CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE))
      |        / (48.0 * CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE))
      |    END) AS ab_z
      |FROM agg""".stripMargin
  }

  // --- Mann–Whitney U / AUC ---------------------------------------------------
  /** Rank-based two-sample location test between the temporal halves —
    * the nonparametric complement to [[ks]] (Mann & Whitney, Ann. Math.
    * Stat. 1947): U counts a-vs-b rank wins, and U/(n_a·n_b) is exactly
    * the AUC of "side a has larger values". Tie handling is the
    * textbook average rank, kept integer by DOUBLING: a run of n_v tied
    * values starting after pooled cumulative count c has average rank
    * c + (n_v+1)/2, so 2·avgrank = 2c + n_v + 1 is exact BIGINT, and
    * U2 = 2·U = Σ_a 2·avgrank − 2·n_a(n_a+1)/2 stays exact. The only
    * IEEE op is the final AUC division.
    *
    * Scale shape: identical to [[ks]] — the pooled cumulative count
    * runs over the per-VALUE aggregate via the range-partitioned
    * [[graft.Graft.cumSumByRange]] (the exclusive prefix is the
    * inclusive one minus the current row), never a single-partition
    * rank window; exact to n_a·n_b < 2⁶² rows.
    */
  def mannWhitney(s: SparkSession, dir: String): DataFrame = {
    val perValue = sided(s, dir)
      .groupBy(col("value"))
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"))
    val ranked = graft.Graft.cumSumByRange(perValue, Seq(col("value")),
        Seq((col("ca") + col("cb")) -> "cum_incl"))
      .select(col("ca"), col("cb"),
        (col("ca") * (lit(2L) * (col("cum_incl") - col("ca") - col("cb"))
          + col("ca") + col("cb") + lit(1L))).as("r2a"))
    ranked
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(col("r2a")).as("r2"))
      .select(col("n_a"), col("n_b"),
        (col("r2") - col("n_a") * (col("n_a") + 1L)).as("u2_a"))
      .select(col("n_a"), col("n_b"), col("u2_a"),
        (col("u2_a").cast("double")
          / (lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double")))
          .as("auc_a"))
  }

  val mannWhitneySql: String =
    """WITH ev AS (SELECT epoch_us(ts) AS us, value FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      |sided AS (
      |  SELECT CASE WHEN us < CAST(((mn + mx) - ((mn + mx) % 2)) / 2 AS BIGINT)
      |              THEN 'a' ELSE 'b' END AS side, value
      |  FROM ev, b),
      |pv AS (
      |  SELECT value,
      |    CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM sided GROUP BY value),
      |rk AS (
      |  SELECT ca, cb,
      |    ca * (2 * COALESCE(SUM(ca + cb) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + ca + cb + 1) AS r2a
      |  FROM pv),
      |agg AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
      |         CAST(SUM(r2a) AS BIGINT) AS r2
      |  FROM rk)
      |SELECT n_a, n_b,
      |  CAST(r2 - n_a * (n_a + 1) AS BIGINT) AS u2_a,
      |  CAST(r2 - n_a * (n_a + 1) AS DOUBLE)
      |    / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS auc_a
      |FROM agg""".stripMargin

  // --- Welch's t-test ---------------------------------------------------------
  /** Welch's unequal-variance t-test on event value between the two
    * temporal halves (Welch, Biometrika 1947) — the PARAMETRIC leg of
    * the drift family, complementing the distribution-free KS and
    * Mann–Whitney twins: detects a mean shift with the most power when
    * the values are roughly normal, and reports the
    * Welch–Satterthwaite effective degrees of freedom.
    *
    * Moments ride as exact BIGINT cent sums (the [[EventQueries]]
    * anomalyZscore discipline: value has a 2-decimal true expansion,
    * so round(value·100) is the exact integer both engines compute);
    * the t statistic and df are a fixed chain of IEEE ops on those
    * bit-identical integers. One aggregate over the sided scan —
    * 6 numbers per side — is the whole cost at any scale.
    */
  def welchTTest(s: SparkSession, dir: String): DataFrame = {
    val c = round(col("value") * 100).cast("long")
    val sidedC = sided(s, dir).select(col("side"), c.as("c"))
    // Σc² in DECIMAL(38,0): c ≤ ~5.6e4 cents is SF-invariant but the
    // row count is not — the BIGINT square sum wraps near SF ~6000
    // (the TimeSeries.autocorrelation decimal-moments rule)
    val m = sidedC.groupBy(col("side"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(col("c").cast("decimal(18,0)") * col("c").cast("decimal(18,0)"))
          .as("scc"))
    // pivot the two sides into one row via conditional aggregation
    val row = m.agg(
      sum(when(col("side") === "a", col("n"))).as("n_a"),
      sum(when(col("side") === "a", col("sc"))).as("sc_a"),
      sum(when(col("side") === "a", col("scc"))).as("scc_a"),
      sum(when(col("side") === "b", col("n"))).as("n_b"),
      sum(when(col("side") === "b", col("sc"))).as("sc_b"),
      sum(when(col("side") === "b", col("scc"))).as("scc_b"))
    def dbl(name: String): Column = col(name).cast("double")
    // sample variance in cents² then dollars²: (n·Σc² − (Σc)²)/(n(n−1))/1e4
    def va(n: String, sc: String, scc: String): Column =
      (dbl(n) * dbl(scc) - dbl(sc) * dbl(sc)) /
        (dbl(n) * (dbl(n) - 1.0) * 10000.0)
    val sa = va("n_a", "sc_a", "scc_a")
    val sb = va("n_b", "sc_b", "scc_b")
    val sea = sa / dbl("n_a")
    val seb = sb / dbl("n_b")
    row.select(col("n_a"), col("n_b"),
      (dbl("sc_a") / (dbl("n_a") * 100.0)).as("mean_a"),
      (dbl("sc_b") / (dbl("n_b") * 100.0)).as("mean_b"),
      ((dbl("sc_a") / (dbl("n_a") * 100.0)
        - dbl("sc_b") / (dbl("n_b") * 100.0))
        / sqrt(sea + seb)).as("t_stat"),
      (((sea + seb) * (sea + seb)) /
        (sea * sea / (dbl("n_a") - 1.0) + seb * seb / (dbl("n_b") - 1.0)))
        .as("df"))
  }

  val welchTTestSql: String = {
    val mid = PortableSql.intDiv("mn + mx", "2")
    s"""WITH ev AS (SELECT epoch_us(ts) AS us,
      |              CAST(round(value * 100) AS BIGINT) AS c
      |            FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      |sided AS (
      |  SELECT CASE WHEN us < $mid THEN 'a' ELSE 'b' END AS side, c
      |  FROM ev, b),
      |m AS (
      |  SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(c) AS BIGINT) AS sc,
      |    SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0))) AS scc
      |  FROM sided GROUP BY side),
      |r AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN side = 'a' THEN n END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN side = 'a' THEN sc END) AS BIGINT) AS sc_a,
      |    SUM(CASE WHEN side = 'a' THEN scc END) AS scc_a,
      |    CAST(SUM(CASE WHEN side = 'b' THEN n END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN side = 'b' THEN sc END) AS BIGINT) AS sc_b,
      |    SUM(CASE WHEN side = 'b' THEN scc END) AS scc_b
      |  FROM m),
      |v AS (
      |  SELECT n_a, n_b,
      |    CAST(sc_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 100.0) AS mean_a,
      |    CAST(sc_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 100.0) AS mean_b,
      |    (CAST(n_a AS DOUBLE) * CAST(CAST(scc_a AS VARCHAR) AS DOUBLE)
      |       - CAST(sc_a AS DOUBLE) * CAST(sc_a AS DOUBLE))
      |      / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0) * 10000.0)
      |      / CAST(n_a AS DOUBLE) AS sea,
      |    (CAST(n_b AS DOUBLE) * CAST(CAST(scc_b AS VARCHAR) AS DOUBLE)
      |       - CAST(sc_b AS DOUBLE) * CAST(sc_b AS DOUBLE))
      |      / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0) * 10000.0)
      |      / CAST(n_b AS DOUBLE) AS seb
      |  FROM r)
      |SELECT n_a, n_b, mean_a, mean_b,
      |  (mean_a - mean_b) / sqrt(sea + seb) AS t_stat,
      |  ((sea + seb) * (sea + seb))
      |    / (sea * sea / (CAST(n_a AS DOUBLE) - 1.0)
      |       + seb * seb / (CAST(n_b AS DOUBLE) - 1.0)) AS df
      |FROM v""".stripMargin
  }

  // --- Wilcoxon signed-rank (paired) ---------------------------------------------
  /** Wilcoxon signed-rank test (Wilcoxon, Biometrics Bull. 1945) on
    * PAIRED per-customer spend: each customer's 1998 total minus their
    * 1997 total (cents), zero diffs dropped per the standard procedure —
    * the nonparametric paired complement of [[mannWhitney]] (independent
    * samples) and [[Relational.mcnemarYears]] (paired binary): "did the
    * SAME customers spend more", robust to the heavy order-value tail.
    *
    * Exactness: diffs are exact BIGINT cents; |diff| midranks come from
    * the tie-group identity 2·midrank = 2·cumBelow + t + 1 on the
    * DOUBLED-rank integer grid ([[mannWhitney]]'s spelling), so
    * W2⁺ = 2·W⁺ is an exact BIGINT; the normal approximation uses
    * 48·Var = 2n(n+1)(2n+1) − Σ(t³−t) assembled in DECIMAL (t³ passes
    * int64 once a tie group nears 2e6) and z is a fixed IEEE chain on
    * VARCHAR-routed casts. Zero variance (all diffs tied at one
    * magnitude... degenerate) yields NULL.
    *
    * Scale shape: one custkey-keyed fold of orders, then the per-
    * magnitude tie grid; the exact global midranks ride
    * [[graft.Graft.cumSumByRange]] (range-partitioned prefix sums — no
    * single-partition rank window at any size).
    */
  def wilcoxonSignedRank(s: SparkSession, dir: String): DataFrame = {
    val yr = year(to_date(col("o_orderdate")))
    val cents = expr("cast(cast(o_totalprice as decimal(18,6)) * 100 as bigint)")
    val d19 = (c: Column) => c.cast("decimal(19,0)")
    val diffs = Tables.load(s, dir, "orders")
      .filter(yr === 1997 || yr === 1998)
      .select(col("o_custkey"), yr.as("yr"), cents.as("c"))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("yr") === 1998, col("c")).otherwise(-col("c")))
        .as("diff"))
      .filter(col("diff") =!= 0L)
      .select(abs(col("diff")).as("v"),
        (col("diff") > 0L).cast("long").as("pos"))
    val perValue = diffs.groupBy(col("v"))
      .agg(count(lit(1)).as("t"), sum(col("pos")).as("tp"))
    val ranked = graft.Graft.cumSumByRange(perValue, Seq(col("v")),
        Seq(col("t") -> "cum_incl"))
      .select(col("t"), col("tp"),
        (col("tp") * (lit(2L) * (col("cum_incl") - col("t")) + col("t")
          + lit(1L))).as("w2p"),
        (d19(col("t") * col("t") - lit(1L)) * d19(col("t"))).as("tcorr"))
    val agg = ranked.agg(sum(col("t")).as("n"), sum(col("tp")).as("n_pos"),
      sum(col("w2p")).as("w2"), sum(col("tcorr")).as("corr"))
    val var48 = (d19(col("n") * (col("n") + lit(1L)) * lit(2L))
      * d19(lit(2L) * col("n") + lit(1L)) - col("corr"))
    agg
      .select(col("n").as("n_pairs"), col("n_pos"), col("w2").as("w2_plus"),
        expr("(n * (n + 1)) div 2").as("mean2"),
        var48.cast("double").as("var48"))
      .select(col("n_pairs"), col("n_pos"), col("w2_plus"),
        when(col("var48") > 0.0,
          ((col("w2_plus").cast("double") - col("mean2").cast("double"))
            / (lit(2.0) * sqrt(col("var48") / lit(48.0)))))
          .otherwise(lit(null).cast("double")).as("z"))
  }

  val wilcoxonSignedRankSql: String = {
    val mean2 = PortableSql.intDiv("n * (n + 1)", "2")
    s"""WITH c AS (
      |  SELECT o_custkey,
      |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS c
      |  FROM orders
      |  WHERE year(CAST(o_orderdate AS DATE)) IN (1997, 1998)),
      |d AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CASE WHEN yr = 1998 THEN c ELSE -c END) AS BIGINT) AS diff
      |  FROM c GROUP BY o_custkey),
      |nz AS (SELECT abs(diff) AS v,
      |         CASE WHEN diff > 0 THEN 1 ELSE 0 END AS pos
      |       FROM d WHERE diff <> 0),
      |pv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t,
      |         CAST(SUM(pos) AS BIGINT) AS tp
      |       FROM nz GROUP BY v),
      |rk AS (
      |  SELECT t, tp,
      |    tp * (2 * COALESCE(SUM(t) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + t + 1) AS w2p,
      |    CAST(t * t - 1 AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0)) AS tcorr
      |  FROM pv),
      |agg AS (
      |  SELECT CAST(SUM(t) AS BIGINT) AS n, CAST(SUM(tp) AS BIGINT) AS n_pos,
      |    CAST(SUM(w2p) AS BIGINT) AS w2, SUM(tcorr) AS corr
      |  FROM rk),
      |v AS (
      |  SELECT n, n_pos, w2, $mean2 AS mean2,
      |    CAST(CAST(CAST(n * (n + 1) * 2 AS DECIMAL(19,0))
      |              * CAST(2 * n + 1 AS DECIMAL(19,0)) - corr AS VARCHAR)
      |         AS DOUBLE) AS var48
      |  FROM agg)
      |SELECT n AS n_pairs, n_pos, w2 AS w2_plus,
      |  CASE WHEN var48 > 0 THEN
      |    (CAST(w2 AS DOUBLE) - CAST(mean2 AS DOUBLE))
      |      / (2.0 * sqrt(var48 / 48.0))
      |  ELSE NULL END AS z
      |FROM v""".stripMargin
  }

  // --- Friedman test ------------------------------------------------------------
  /** Friedman test (JASA 1937) on paired per-customer yearly spend —
    * each customer active in ALL of 1996/1997/1998 is a BLOCK ranked
    * within itself across the k = 3 years: the k-group extension of
    * [[wilcoxonSignedRank]] (as Kruskal–Wallis extends Mann–Whitney),
    * answering "do the SAME customers rank the years consistently"
    * with every customer's scale normalized away.
    *
    * Determinism — and a window-free plan: with k FIXED at 3 the
    * within-block midranks are pure comparisons on the customer's
    * pivoted (x₉₆, x₉₇, x₉₈) row — 2·midrank_j = 2 + 2·#{l: x_l < x_j}
    * + #{l≠j: x_l = x_j} is an exact BIGINT — and the per-block tie
    * cubes Σ(t³−t) collapse to a 3-case map of the equality count
    * (0 ties → 0, one pair → 6, triple → 24). Column sums R2_j pivot
    * onto ONE row by conditional aggregation (the fixed-order pivot
    * discipline), so χ²_F = 12/(nk(k+1))·ΣR_j² − 3n(k+1) and its tie
    * adjustment χ²/C, C = 1 − Σ(t³−t)/(nk(k²−1)), are fixed IEEE
    * chains on exact integers — no ordered-accumulation window
    * anywhere. No complete blocks (or all-tied C ≤ 0) yields NULL.
    *
    * Scale: ONE custkey-keyed fold of orders into the per-customer
    * pivot, one grand aggregate. Nothing after the fold scales.
    */
  def friedman(s: SparkSession, dir: String): DataFrame = {
    val yr = year(to_date(col("o_orderdate")))
    val cents = expr("cast(cast(o_totalprice as decimal(18,6)) * 100 as bigint)")
    def ysum(y: Int): Column =
      sum(when(col("yr") === y, col("c")).otherwise(0L)).as(s"x$y")
    val piv = Tables.load(s, dir, "orders")
      .filter(yr.isin(1996, 1997, 1998))
      .select(col("o_custkey"), yr.as("yr"), cents.as("c"))
      .groupBy(col("o_custkey"))
      .agg(ysum(1996), ysum(1997), ysum(1998),
        countDistinct(col("yr")).as("n_years"))
      .filter(col("n_years") === 3L)
    def lt(a: String, b: String): Column =
      (col(b) < col(a)).cast("long")
    def eq(a: String, b: String): Column =
      (col(a) === col(b)).cast("long")
    def r2(j: String, l1: String, l2: String): Column =
      lit(2L) + lit(2L) * (lt(j, l1) + lt(j, l2)) + eq(j, l1) + eq(j, l2)
    val eqCnt = eq("x1996", "x1997") + eq("x1996", "x1998") +
      eq("x1997", "x1998")
    val ranked = piv.select(
      r2("x1996", "x1997", "x1998").as("r96"),
      r2("x1997", "x1996", "x1998").as("r97"),
      r2("x1998", "x1996", "x1997").as("r98"),
      when(eqCnt === 3L, 24L).when(eqCnt === 1L, 6L).otherwise(0L)
        .as("tcube"))
    val agg = ranked.agg(count(lit(1)).as("n"),
      sum(col("r96")).as("r2_1996"), sum(col("r97")).as("r2_1997"),
      sum(col("r98")).as("r2_1998"), sum(col("tcube")).as("tie_sum"))
    val nd = col("n").cast("double")
    val sq = (c: String) => col(c).cast("double") * col(c).cast("double")
    agg.select(col("n").as("n_blocks"), col("r2_1996"), col("r2_1997"),
        col("r2_1998"),
        when(col("n") > 0L,
          lit(12.0) / (nd * lit(12.0))
            * ((sq("r2_1996") + sq("r2_1997") + sq("r2_1998")) / lit(4.0))
            - lit(12.0) * nd).as("chi2_f"),
        when(col("n") > 0L,
          lit(1.0) - col("tie_sum").cast("double") / (lit(24.0) * nd))
          .as("c_factor"))
      .select(col("n_blocks"), col("r2_1996"), col("r2_1997"),
        col("r2_1998"), col("chi2_f"),
        when(col("c_factor") > 0.0, col("chi2_f") / col("c_factor"))
          .otherwise(lit(null).cast("double")).as("chi2_f_tie_adj"))
  }

  /** Page's L trend test for ORDERED alternatives across the three
    * repeated-measure years (Page, JASA 1963) — the directional
    * companion to [[friedman]]: Friedman asks "do the years differ at
    * all?", Page asks "do per-customer spends increase MONOTONICALLY
    * 1996 < 1997 < 1998?", which is the alternative a growth analysis
    * actually posits, and is strictly more powerful for it. L =
    * Σ_j j·R_j over the per-block (customer) within-year ranks;
    * z = (L − n·k(k+1)²/4) / √(n(k³−k)²/(144(k−1))) — for k = 3,
    * mean 12n and variance 2n.
    *
    * Exactness: reuses [[friedman]]'s DOUBLED-midrank comparison
    * spelling (each block's rank from two integer comparisons, ties
    * as midranks), so L2 = Σ j·R2_j is an exact BIGINT and L = L2/2;
    * z is one fixed IEEE chain, NULL on an empty block set. The
    * no-tie variance is the standard Page spelling; tied blocks are
    * counted beside it (`n_tied_blocks`) so the reader can see how
    * much midranking the statistic absorbed.
    *
    * Scale: the same one custkey-keyed fold as [[friedman]] → 1-row
    * reduce.
    */
  def pageTrend(s: SparkSession, dir: String): DataFrame = {
    val yr = year(to_date(col("o_orderdate")))
    val cents = expr("cast(cast(o_totalprice as decimal(18,6)) * 100 as bigint)")
    def ysum(y: Int): Column =
      sum(when(col("yr") === y, col("c")).otherwise(0L)).as(s"x$y")
    val piv = Tables.load(s, dir, "orders")
      .filter(yr.isin(1996, 1997, 1998))
      .select(col("o_custkey"), yr.as("yr"), cents.as("c"))
      .groupBy(col("o_custkey"))
      .agg(ysum(1996), ysum(1997), ysum(1998),
        countDistinct(col("yr")).as("n_years"))
      .filter(col("n_years") === 3L)
    def lt(a: String, b: String): Column =
      (col(b) < col(a)).cast("long")
    def eq(a: String, b: String): Column =
      (col(a) === col(b)).cast("long")
    def r2(j: String, l1: String, l2: String): Column =
      lit(2L) + lit(2L) * (lt(j, l1) + lt(j, l2)) + eq(j, l1) + eq(j, l2)
    val anyTie = (eq("x1996", "x1997") + eq("x1996", "x1998")
      + eq("x1997", "x1998") > 0L).cast("long")
    val agg = piv.select(
        (r2("x1996", "x1997", "x1998")
          + lit(2L) * r2("x1997", "x1996", "x1998")
          + lit(3L) * r2("x1998", "x1996", "x1997")).as("l2_block"),
        anyTie.as("tied"))
      .agg(count(lit(1)).as("n"), sum(col("l2_block")).as("l2"),
        sum(col("tied")).as("n_tied_blocks"))
    val nd = col("n").cast("double")
    agg.select(col("n").as("n_blocks"), col("n_tied_blocks"),
      (col("l2").cast("double") / lit(2.0)).as("page_l"),
      when(col("n") > 0L,
        (col("l2").cast("double") / lit(2.0) - lit(12.0) * nd)
          / sqrt(lit(2.0) * nd))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  val pageTrendSql: String =
    """WITH c AS (
      |  SELECT o_custkey,
      |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS c
      |  FROM orders
      |  WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997, 1998)),
      |piv AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CASE WHEN yr = 1996 THEN c ELSE 0 END) AS BIGINT) AS x96,
      |    CAST(SUM(CASE WHEN yr = 1997 THEN c ELSE 0 END) AS BIGINT) AS x97,
      |    CAST(SUM(CASE WHEN yr = 1998 THEN c ELSE 0 END) AS BIGINT) AS x98
      |  FROM c GROUP BY o_custkey
      |  HAVING COUNT(DISTINCT yr) = 3),
      |r AS (
      |  SELECT
      |    (2 + 2 * ((CASE WHEN x97 < x96 THEN 1 ELSE 0 END)
      |             + (CASE WHEN x98 < x96 THEN 1 ELSE 0 END))
      |       + (CASE WHEN x96 = x97 THEN 1 ELSE 0 END)
      |       + (CASE WHEN x96 = x98 THEN 1 ELSE 0 END))
      |    + 2 * (2 + 2 * ((CASE WHEN x96 < x97 THEN 1 ELSE 0 END)
      |             + (CASE WHEN x98 < x97 THEN 1 ELSE 0 END))
      |       + (CASE WHEN x97 = x96 THEN 1 ELSE 0 END)
      |       + (CASE WHEN x97 = x98 THEN 1 ELSE 0 END))
      |    + 3 * (2 + 2 * ((CASE WHEN x96 < x98 THEN 1 ELSE 0 END)
      |             + (CASE WHEN x97 < x98 THEN 1 ELSE 0 END))
      |       + (CASE WHEN x98 = x96 THEN 1 ELSE 0 END)
      |       + (CASE WHEN x98 = x97 THEN 1 ELSE 0 END)) AS l2_block,
      |    CASE WHEN x96 = x97 OR x96 = x98 OR x97 = x98
      |      THEN 1 ELSE 0 END AS tied
      |  FROM piv),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(l2_block) AS BIGINT) AS l2,
      |    CAST(SUM(tied) AS BIGINT) AS n_tied_blocks
      |  FROM r)
      |SELECT n AS n_blocks, n_tied_blocks,
      |  CAST(l2 AS DOUBLE) / 2.0 AS page_l,
      |  CASE WHEN n > 0 THEN
      |    (CAST(l2 AS DOUBLE) / 2.0 - 12.0 * CAST(n AS DOUBLE))
      |      / sqrt(2.0 * CAST(n AS DOUBLE)) END AS z
      |FROM agg""".stripMargin

  val friedmanSql: String =
    """WITH c AS (
      |  SELECT o_custkey,
      |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS c
      |  FROM orders
      |  WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997, 1998)),
      |piv AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CASE WHEN yr = 1996 THEN c ELSE 0 END) AS BIGINT) AS x96,
      |    CAST(SUM(CASE WHEN yr = 1997 THEN c ELSE 0 END) AS BIGINT) AS x97,
      |    CAST(SUM(CASE WHEN yr = 1998 THEN c ELSE 0 END) AS BIGINT) AS x98,
      |    COUNT(DISTINCT yr) AS n_years
      |  FROM c GROUP BY o_custkey),
      |rk AS (
      |  SELECT
      |    2 + 2 * (CASE WHEN x97 < x96 THEN 1 ELSE 0 END
      |             + CASE WHEN x98 < x96 THEN 1 ELSE 0 END)
      |      + CASE WHEN x96 = x97 THEN 1 ELSE 0 END
      |      + CASE WHEN x96 = x98 THEN 1 ELSE 0 END AS r96,
      |    2 + 2 * (CASE WHEN x96 < x97 THEN 1 ELSE 0 END
      |             + CASE WHEN x98 < x97 THEN 1 ELSE 0 END)
      |      + CASE WHEN x97 = x96 THEN 1 ELSE 0 END
      |      + CASE WHEN x97 = x98 THEN 1 ELSE 0 END AS r97,
      |    2 + 2 * (CASE WHEN x96 < x98 THEN 1 ELSE 0 END
      |             + CASE WHEN x97 < x98 THEN 1 ELSE 0 END)
      |      + CASE WHEN x98 = x96 THEN 1 ELSE 0 END
      |      + CASE WHEN x98 = x97 THEN 1 ELSE 0 END AS r98,
      |    CASE (CASE WHEN x96 = x97 THEN 1 ELSE 0 END
      |          + CASE WHEN x96 = x98 THEN 1 ELSE 0 END
      |          + CASE WHEN x97 = x98 THEN 1 ELSE 0 END)
      |      WHEN 3 THEN 24 WHEN 1 THEN 6 ELSE 0 END AS tcube
      |  FROM piv WHERE n_years = 3),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(r96) AS BIGINT) AS r2_1996,
      |    CAST(SUM(r97) AS BIGINT) AS r2_1997,
      |    CAST(SUM(r98) AS BIGINT) AS r2_1998,
      |    CAST(SUM(tcube) AS BIGINT) AS tie_sum
      |  FROM rk),
      |f AS (
      |  SELECT n AS n_blocks, r2_1996, r2_1997, r2_1998,
      |    CASE WHEN n > 0 THEN
      |      12.0 / (CAST(n AS DOUBLE) * 12.0)
      |        * ((CAST(r2_1996 AS DOUBLE) * CAST(r2_1996 AS DOUBLE)
      |            + CAST(r2_1997 AS DOUBLE) * CAST(r2_1997 AS DOUBLE)
      |            + CAST(r2_1998 AS DOUBLE) * CAST(r2_1998 AS DOUBLE)) / 4.0)
      |        - 12.0 * CAST(n AS DOUBLE) END AS chi2_f,
      |    CASE WHEN n > 0 THEN
      |      1.0 - CAST(tie_sum AS DOUBLE) / (24.0 * CAST(n AS DOUBLE))
      |    END AS c_factor
      |  FROM agg)
      |SELECT n_blocks, r2_1996, r2_1997, r2_1998, chi2_f,
      |  CASE WHEN c_factor > 0 THEN chi2_f / c_factor
      |       ELSE NULL END AS chi2_f_tie_adj
      |FROM f""".stripMargin

  // --- A/B experimentation readouts ---------------------------------------------
  /** Two-proportion conversion z-test between the two parity arms
    * (user_id % 2 — the deterministic stand-in for a randomized
    * assignment column): conversion = "user purchased within the last
    * `windowDays` days of the stream" (default 3 — wide enough windows
    * converge to all-users-convert on these fixtures and degenerate
    * the test), the recency-bounded outcome a growth experiment reads. Reports per-arm rates, absolute lift,
    * and the pooled z (the standard two-proportion test; z² is the
    * 2×2 χ² with this pooling). The SQL twin derives from the SAME
    * windowDays parameter.
    *
    * Exactness: the conversion flag, per-arm user counts, and
    * converted counts are exact BIGINTs from one per-user fold; the z
    * is a fixed IEEE chain on those integers, NULL when the pooled
    * variance is degenerate. The window cut is integer microsecond
    * arithmetic off the 1-row max-timestamp broadcast.
    *
    * Scale: one events scan → per-user fold (user-keyed, map-side
    * combined) → 2-row arm grid → 1-row pivot. Nothing after the fold
    * scales with SF.
    */
  def abConversion(s: SparkSession, dir: String,
                   windowDays: Int = 3): DataFrame = {
    val ev = graft.Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val mx = ev.agg(max(col("us")).as("mx"))
    val perUser = ev.crossJoin(broadcast(mx))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase"
        && col("us") >= col("mx") - lit(windowDays * 86400000000L), 1L)
        .otherwise(0L)).as("conv"))
      .select((col("user_id") % 2).as("arm"), col("conv"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val row = arms.agg(
      sum(when(col("arm") === 0L, col("n"))).as("n_a"),
      sum(when(col("arm") === 0L, col("c"))).as("c_a"),
      sum(when(col("arm") === 1L, col("n"))).as("n_b"),
      sum(when(col("arm") === 1L, col("c"))).as("c_b"))
    def d(n: String): Column = col(n).cast("double")
    val pa = d("c_a") / d("n_a")
    val pb = d("c_b") / d("n_b")
    val pp = (d("c_a") + d("c_b")) / (d("n_a") + d("n_b"))
    row.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      pa.as("rate_a"), pb.as("rate_b"), (pb - pa).as("lift"),
      when(col("c_a") + col("c_b") > 0L
        && col("c_a") + col("c_b") < col("n_a") + col("n_b"),
        (pb - pa) / sqrt(pp * (lit(1.0) - pp)
          * (lit(1.0) / d("n_a") + lit(1.0) / d("n_b")))).as("z"))
  }

  def abConversionSql(windowDays: Int = 3): String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |mx AS (SELECT MAX(us) AS mx FROM ev),
      |pu AS (
      |  SELECT user_id % 2 AS arm,
      |    CAST(MAX(CASE WHEN event_type = 'purchase'
      |      AND us >= mx - ${windowDays} * 86400000000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS conv
      |  FROM ev, mx GROUP BY user_id),
      |arms AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
      |                CAST(SUM(conv) AS BIGINT) AS c
      |         FROM pu GROUP BY arm),
      |r AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 0 THEN c END) AS BIGINT) AS c_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN arm = 1 THEN c END) AS BIGINT) AS c_b
      |  FROM arms)
      |SELECT n_a, c_a, n_b, c_b,
      |  CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
      |  CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
      |  CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      |    - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS lift,
      |  CASE WHEN c_a + c_b > 0 AND c_a + c_b < n_a + n_b THEN
      |    (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      |     - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
      |    / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      |      * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
      |  END AS z
      |FROM r""".stripMargin

  /** Permutation test for the conversion lift between the parity arms
    * — the distribution-free p-value that [[abConversion]]'s normal
    * z approximates (exact inference logic, no CLT assumption; Fisher
    * 1935 via the Monte-Carlo spelling of Dwass 1957). Labels are
    * re-assigned B times by the repo's deterministic cross-engine
    * PRNG ([[Sampling.poissonBootstrap]]'s seeded-md5 hex fold), and
    * p = (1 + #{b : T_b ≥ T_obs}) / (B + 1) — the add-one estimator
    * that can never return 0.
    *
    * Exactness: the statistic comparison |c₁n₀ − c₀n₁| cross-
    * multiplied by the OTHER side's n₁n₀ keeps every comparison an
    * exact DECIMAL product (no rate division inside the indicator);
    * the only IEEE ops are the reported observed lift and the final
    * p division.
    *
    * Scale: the B-fold explode inflates the per-USER grid (already
    * thousands of times smaller than events), folds map-side to the
    * (replicate, arm) grid, and compares against a 1-row broadcast.
    */
  def abPermutationTest(s: SparkSession, dir: String,
                        nPerms: Int = 200, windowDays: Int = 3): DataFrame = {
    val ev = graft.Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val mx = ev.agg(max(col("us")).as("mx"))
    val perUser = graft.Graft.materialize(ev.crossJoin(broadcast(mx))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase"
        && col("us") >= col("mx") - lit(windowDays * 86400000000L), 1L)
        .otherwise(0L)).as("conv")))
    def tStat(armCol: Column): Seq[Column] = Seq(
      sum(when(armCol === 0L, 1L).otherwise(0L)).as("n0"),
      sum(when(armCol === 0L, col("conv")).otherwise(0L)).as("c0"),
      sum(when(armCol === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(armCol === 1L, col("conv")).otherwise(0L)).as("c1"))
    val obs = perUser.agg(tStat(col("user_id") % 2).head,
      tStat(col("user_id") % 2).tail: _*)
      .select(col("n0").as("n0_o"), col("c0").as("c0_o"),
        col("n1").as("n1_o"), col("c1").as("c1_o"))
    val permed = perUser
      .select(col("user_id"), col("conv"),
        explode(array((1 to nPerms).map(i => lit(i.toLong)): _*)).as("b"))
      .withColumn("h", conv(substring(md5(concat(lit("perm"),
        col("b").cast("string"), lit(":"),
        col("user_id").cast("string"))), 1, 6), 16, 10).cast("long"))
      .groupBy(col("b"))
      .agg(tStat(col("h") % 2).head, tStat(col("h") % 2).tail: _*)
    def dd(c: Column): Column = c.cast("decimal(19,0)")
    val ge = permed.crossJoin(broadcast(obs))
      .select((abs(dd(col("c1")) * dd(col("n0")) - dd(col("c0")) * dd(col("n1")))
        * (dd(col("n1_o")) * dd(col("n0_o"))) >=
        abs(dd(col("c1_o")) * dd(col("n0_o")) - dd(col("c0_o")) * dd(col("n1_o")))
          * (dd(col("n1")) * dd(col("n0")))).as("ge"))
      .agg(count(lit(1)).as("n_perms"),
        sum(when(col("ge"), 1L).otherwise(0L)).as("n_ge"))
    ge.crossJoin(broadcast(obs))
      .select(col("n_perms"), col("n_ge"),
        (col("c1_o").cast("double") / col("n1_o").cast("double")
          - col("c0_o").cast("double") / col("n0_o").cast("double"))
          .as("observed_lift"),
        ((col("n_ge") + 1L).cast("double")
          / (col("n_perms") + 1L).cast("double")).as("p_value"))
  }

  def abPermutationTestSql(nPerms: Int = 200, windowDays: Int = 3): String = {
    val h = PortableSql.hexValue("m", 6)
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |mx AS (SELECT MAX(us) AS mx FROM ev),
      |pu AS (
      |  SELECT user_id,
      |    CAST(MAX(CASE WHEN event_type = 'purchase'
      |      AND us >= mx - ${windowDays} * 86400000000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS conv
      |  FROM ev, mx GROUP BY user_id),
      |obs AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0_o,
      |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0_o,
      |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_o,
      |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1_o
      |  FROM pu),
      |d AS (
      |  SELECT b, conv,
      |    md5('perm' || CAST(b AS VARCHAR) || ':'
      |        || CAST(user_id AS VARCHAR)) AS m
      |  FROM pu, (SELECT CAST(unnest(range(1, ${nPerms + 1})) AS BIGINT)
      |              AS b) reps),
      |hh AS (SELECT b, conv, ($h) % 2 AS arm FROM d),
      |perm AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
      |  FROM hh GROUP BY b),
      |ind AS (
      |  SELECT CASE WHEN
      |    abs(CAST(c1 AS DECIMAL(19,0)) * CAST(n0 AS DECIMAL(19,0))
      |      - CAST(c0 AS DECIMAL(19,0)) * CAST(n1 AS DECIMAL(19,0)))
      |    * (CAST(n1_o AS DECIMAL(19,0)) * CAST(n0_o AS DECIMAL(19,0))) >=
      |    abs(CAST(c1_o AS DECIMAL(19,0)) * CAST(n0_o AS DECIMAL(19,0))
      |      - CAST(c0_o AS DECIMAL(19,0)) * CAST(n1_o AS DECIMAL(19,0)))
      |    * (CAST(n1 AS DECIMAL(19,0)) * CAST(n0 AS DECIMAL(19,0)))
      |    THEN 1 ELSE 0 END AS ge
      |  FROM perm, obs),
      |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_perms,
      |               CAST(SUM(ge) AS BIGINT) AS n_ge FROM ind)
      |SELECT n_perms, n_ge,
      |  CAST(c1_o AS DOUBLE) / CAST(n1_o AS DOUBLE)
      |    - CAST(c0_o AS DOUBLE) / CAST(n0_o AS DOUBLE) AS observed_lift,
      |  CAST(n_ge + 1 AS DOUBLE) / CAST(n_perms + 1 AS DOUBLE) AS p_value
      |FROM agg, obs""".stripMargin
  }

  /** CUPED variance-reduced treatment-effect estimate on per-user
    * revenue (Deng, Xu, Kohavi & Walker, WSDM 2013 — the controlled-
    * experiment workhorse): outcome y = user's SECOND-half value,
    * covariate x = the SAME user's FIRST-half value, θ = cov(x,y)/
    * var(x) pooled across arms, adjusted effect = (ȳ_b − ȳ_a) −
    * θ(x̄_b − x̄_a). Reports the raw diff beside the adjusted one and
    * the theoretical variance reduction ρ²(x,y) — the whole point of
    * CUPED is the tighter CI at the same sample size.
    *
    * Exactness: per-user x/y are exact BIGINT cent sums; all second
    * moments ride DECIMAL products (VARCHAR-routed in the oracle —
    * Σxy clears 2^53 at sf0.1); θ, both diffs, and ρ² are one fixed
    * IEEE chain on those bit-identical doubles, NULL on degenerate
    * var(x)/var(y).
    *
    * Scale: one events scan → per-user conditional fold → 1-row
    * moment reduce. The per-user grid is the only exchange.
    */
  def abCuped(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(s, dir)
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("c"),
        unix_micros(col("ts")).as("us"))
    val bounds = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
    val perUser = ev.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(sum(when(col("us") < expr("(mn + mx) div 2"), col("c"))
        .otherwise(0L)).as("x"),
        sum(when(col("us") >= expr("(mn + mx) div 2"), col("c"))
          .otherwise(0L)).as("y"))
      .select((col("user_id") % 2).as("arm"), col("x"), col("y"))
    def dd(c: Column): Column = c.cast("decimal(18,0)")
    val m = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(dd(col("x")) * dd(col("y"))).as("sxy"),
      sum(dd(col("x")) * dd(col("x"))).as("sxx"),
      sum(dd(col("y")) * dd(col("y"))).as("syy"),
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0L, col("x")).otherwise(0L)).as("sx_a"),
      sum(when(col("arm") === 0L, col("y")).otherwise(0L)).as("sy_a"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1L, col("x")).otherwise(0L)).as("sx_b"),
      sum(when(col("arm") === 1L, col("y")).otherwise(0L)).as("sy_b"))
    def d(n: String): Column = col(n).cast("double")
    val covN = d("n") * d("sxy") - d("sx") * d("sy")
    val varXN = d("n") * d("sxx") - d("sx") * d("sx")
    val varYN = d("n") * d("syy") - d("sy") * d("sy")
    val theta = covN / varXN
    val diffRaw = d("sy_b") / d("n_b") - d("sy_a") / d("n_a")
    val diffX = d("sx_b") / d("n_b") - d("sx_a") / d("n_a")
    m.select(col("n_a"), col("n_b"),
      (diffRaw / lit(100.0)).as("diff_raw_dollars"),
      when(varXN > 0.0, theta).as("theta"),
      when(varXN > 0.0, (diffRaw - theta * diffX) / lit(100.0))
        .as("diff_cuped_dollars"),
      when(varXN > 0.0 && varYN > 0.0,
        covN * covN / (varXN * varYN)).as("var_reduction"))
  }

  val abCupedSql: String = {
    val mid = PortableSql.intDiv("mn + mx", "2")
    def ds(e: String) =
      s"CAST(CAST(SUM(CAST($e AS DECIMAL(18,0)) * CAST($e AS DECIMAL(18,0)))" +
        " AS VARCHAR) AS DOUBLE)"
    s"""WITH ev AS (SELECT user_id,
      |              CAST(round(value * 100) AS BIGINT) AS c,
      |              epoch_us(ts) AS us FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      |pu AS (
      |  SELECT user_id % 2 AS arm,
      |    CAST(SUM(CASE WHEN us < $mid THEN c ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN us >= $mid THEN c ELSE 0 END) AS BIGINT) AS y
      |  FROM ev, b GROUP BY user_id),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(CAST(SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
      |         AS VARCHAR) AS DOUBLE) AS sxy,
      |    ${ds("x")} AS sxx,
      |    ${ds("y")} AS syy,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
      |    CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
      |    CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b
      |  FROM pu),
      |k AS (
      |  SELECT n_a, n_b,
      |    CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
      |      AS cov_n,
      |    CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
      |      AS varx_n,
      |    CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
      |      AS vary_n,
      |    CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      |      - CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS diff_raw,
      |    CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      |      - CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS diff_x
      |  FROM m)
      |SELECT n_a, n_b,
      |  diff_raw / 100.0 AS diff_raw_dollars,
      |  CASE WHEN varx_n > 0 THEN cov_n / varx_n END AS theta,
      |  CASE WHEN varx_n > 0 THEN
      |    (diff_raw - (cov_n / varx_n) * diff_x) / 100.0
      |  END AS diff_cuped_dollars,
      |  CASE WHEN varx_n > 0 AND vary_n > 0 THEN
      |    cov_n * cov_n / (varx_n * vary_n) END AS var_reduction
      |FROM k""".stripMargin
  }

  /** Required sample size per arm across a relative-MDE grid, from the
    * OBSERVED control conversion — the experiment-design calculator
    * that closes the A/B family's loop (design → [[abConversion]]
    * inference → [[abCuped]] adjustment → [[abPermutationTest]]
    * exactness): n = (z_{α/2} + z_β)²·(p₀(1−p₀) + p₁(1−p₁)) /
    * (p₁ − p₀)² at two-sided α = 5%, power 80%, for relative lifts
    * 1%..10%. The z constants are SHARED fp literals (1.959963985,
    * 0.8416212336) so both engines start from identical doubles; p₀
    * is one division of the exact control cells and each grid row a
    * fixed IEEE chain, NULL when p₁ ≥ 1 OR p₁ ≤ p₀ (a zero-conversion
    * control makes (p₁−p₀)² = 0 and the ratio 0/0 — Spark's non-ANSI
    * NaN→long cast would yield 0 while DuckDB's CAST(ceil(NaN)) errors,
    * so the degenerate case is NULL by contract, like the rest of the
    * family). `ceil` of identical doubles is identical, so `n_per_arm`
    * is an exact BIGINT.
    *
    * Scale: one per-user fold (the [[abConversion]] shape) to a 1-row
    * control cell, broadcast into a 10-row grid.
    */
  def abPowerMde(s: SparkSession, dir: String,
                 windowDays: Int = 3): DataFrame = {
    val ev = graft.Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val mx = ev.agg(max(col("us")).as("mx"))
    val ctl = ev.crossJoin(broadcast(mx))
      .filter(col("user_id") % 2 === 0L)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase"
        && col("us") >= col("mx") - lit(windowDays * 86400000000L), 1L)
        .otherwise(0L)).as("conv"))
      .agg(count(lit(1)).as("n0"), sum(col("conv")).as("c0"))
    val zsum = lit(1.959963985) + lit(0.8416212336)
    val p0 = col("c0").cast("double") / col("n0").cast("double")
    val p1 = p0 * (lit(1.0) + col("mde_pct").cast("double") / lit(100.0))
    ctl.select(col("n0"), col("c0"),
        explode(sequence(lit(1L), lit(10L))).as("mde_pct"))
      .select(col("mde_pct"), col("n0").as("n_control"),
        p0.as("p_baseline"), p1.as("p_target"),
        when(p1 < 1.0 && p1 > p0,
          ceil((zsum * zsum)
            * (p0 * (lit(1.0) - p0) + p1 * (lit(1.0) - p1))
            / ((p1 - p0) * (p1 - p0))).cast("long")).as("n_per_arm"))
      .orderBy(col("mde_pct"))
  }

  def abPowerMdeSql(windowDays: Int = 3): String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |mx AS (SELECT MAX(us) AS mx FROM ev),
      |pu AS (
      |  SELECT user_id,
      |    CAST(MAX(CASE WHEN event_type = 'purchase'
      |      AND us >= mx - ${windowDays} * 86400000000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS conv
      |  FROM ev, mx WHERE user_id % 2 = 0 GROUP BY user_id),
      |ctl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0,
      |               CAST(SUM(conv) AS BIGINT) AS c0 FROM pu),
      |g AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS mde_pct),
      |k AS (
      |  SELECT mde_pct, n0, c0,
      |    CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
      |    (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
      |      * (1.0 + CAST(mde_pct AS DOUBLE) / 100.0) AS p1
      |  FROM ctl, g)
      |SELECT mde_pct, n0 AS n_control, p0 AS p_baseline, p1 AS p_target,
      |  CASE WHEN p1 < 1.0 AND p1 > p0 THEN CAST(ceil(
      |    ((1.959963985::DOUBLE + 0.8416212336::DOUBLE)
      |     * (1.959963985::DOUBLE + 0.8416212336::DOUBLE))
      |    * (p0 * (1.0 - p0) + p1 * (1.0 - p1))
      |    / ((p1 - p0) * (p1 - p0))) AS BIGINT) END AS n_per_arm
      |FROM k ORDER BY mde_pct""".stripMargin

  /** Delta-method z-test for a RATIO metric between the parity arms —
    * revenue per event, the ΣY/ΣX readout (Deng, Knoblich & Lu, KDD
    * 2018: ratio metrics violate the i.i.d. assumption a naive
    * per-event t-test needs, because the denominator is itself
    * random; the delta method on per-USER (y, x) pairs is the
    * standard correction): per arm, R = ΣY/ΣX and
    * Var(R) ≈ (σ_y² + R²σ_x² − 2R·σ_xy) / (n·x̄²); the lift z uses
    * the pooled-independent variance.
    *
    * Exactness: per-user y (cents) and x (events) are exact BIGINTs;
    * all second moments ride DECIMAL(18,0) products (the
    * dispersion-index rule, VARCHAR-routed in the oracle); R, the
    * variance chain and z are fixed IEEE chains on those, NULL on a
    * degenerate variance.
    *
    * Scale: one events scan → per-user fold (user-keyed, map-side
    * combined) → 2-row arm moment grid → 1-row pivot.
    */
  def abDeltaRatio(s: SparkSession, dir: String): DataFrame = {
    val per = graft.Tables.events(s, dir)
      .select((col("user_id") % 2).as("arm"), col("user_id"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("arm"), col("user_id"))
      .agg(sum(col("c")).as("y"), count(lit(1)).as("x"))
    def dec(c: Column): Column = c.cast("decimal(18,0)")
    val arms = per.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("x")).as("sx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("x"))).as("sxy"))
    def side(p: String, a: Int): Seq[Column] = Seq(
      sum(when(col("arm") === a.toLong, col("n"))).as(s"n_$p"),
      sum(when(col("arm") === a.toLong, col("sy"))).as(s"sy_$p"),
      sum(when(col("arm") === a.toLong, col("sx"))).as(s"sx_$p"),
      sum(when(col("arm") === a.toLong, col("syy").cast("double")))
        .as(s"syy_$p"),
      sum(when(col("arm") === a.toLong, col("sxx").cast("double")))
        .as(s"sxx_$p"),
      sum(when(col("arm") === a.toLong, col("sxy").cast("double")))
        .as(s"sxy_$p"))
    val cols = side("a", 0) ++ side("b", 1)
    val row = arms.agg(cols.head, cols.tail: _*)
    def d(n: String): Column = col(n).cast("double")
    def ratio(p: String): Column = d(s"sy_$p") / d(s"sx_$p")
    // Var(R) per arm: (Syy − 2R·Sxy + R²·Sxx as CENTERED moments)/(n·x̄²)
    // with centered m2 = Σab − ΣaΣb/n (one fixed chain each)
    def varR(p: String): Column = {
      val n = d(s"n_$p")
      val r = ratio(p)
      val cyy = col(s"syy_$p") - d(s"sy_$p") * d(s"sy_$p") / n
      val cxx = col(s"sxx_$p") - d(s"sx_$p") * d(s"sx_$p") / n
      val cxy = col(s"sxy_$p") - d(s"sy_$p") * d(s"sx_$p") / n
      val xbar = d(s"sx_$p") / n
      (cyy - lit(2.0) * r * cxy + r * r * cxx) / (n - lit(1.0)) /
        (n * xbar * xbar)
    }
    row.select(
      col("n_a"), col("n_b"),
      (ratio("a") / lit(100.0)).as("ratio_a_dollars"),
      (ratio("b") / lit(100.0)).as("ratio_b_dollars"),
      ((ratio("b") - ratio("a")) / lit(100.0)).as("lift_dollars"),
      when((col("n_a") > 1L) && (col("n_b") > 1L)
        && (varR("a") + varR("b") > 0.0),
        (ratio("b") - ratio("a")) / sqrt(varR("a") + varR("b"))).as("z"))
  }

  val abDeltaRatioSql: String = {
    def varR(p: String): String = {
      val n = s"CAST(n_$p AS DOUBLE)"
      val r = s"(CAST(sy_$p AS DOUBLE) / CAST(sx_$p AS DOUBLE))"
      val cyy = s"(syy_$p - CAST(sy_$p AS DOUBLE) * CAST(sy_$p AS DOUBLE) / $n)"
      val cxx = s"(sxx_$p - CAST(sx_$p AS DOUBLE) * CAST(sx_$p AS DOUBLE) / $n)"
      val cxy = s"(sxy_$p - CAST(sy_$p AS DOUBLE) * CAST(sx_$p AS DOUBLE) / $n)"
      val xbar = s"(CAST(sx_$p AS DOUBLE) / $n)"
      s"(($cyy - 2.0 * $r * $cxy + $r * $r * $cxx) / ($n - 1.0) / " +
        s"($n * $xbar * $xbar))"
    }
    val ra = "(CAST(sy_a AS DOUBLE) / CAST(sx_a AS DOUBLE))"
    val rb = "(CAST(sy_b AS DOUBLE) / CAST(sx_b AS DOUBLE))"
    s"""WITH per AS (
      |  SELECT user_id % 2 AS arm, user_id,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |arms AS (
      |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(CAST(SUM(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
      |      AS VARCHAR) AS DOUBLE) AS syy,
      |    CAST(CAST(SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
      |      AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(y AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
      |      AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM per GROUP BY arm),
      |p AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
      |    SUM(CASE WHEN arm = 0 THEN sy END) AS sy_a,
      |    SUM(CASE WHEN arm = 0 THEN sx END) AS sx_a,
      |    SUM(CASE WHEN arm = 0 THEN syy END) AS syy_a,
      |    SUM(CASE WHEN arm = 0 THEN sxx END) AS sxx_a,
      |    SUM(CASE WHEN arm = 0 THEN sxy END) AS sxy_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
      |    SUM(CASE WHEN arm = 1 THEN sy END) AS sy_b,
      |    SUM(CASE WHEN arm = 1 THEN sx END) AS sx_b,
      |    SUM(CASE WHEN arm = 1 THEN syy END) AS syy_b,
      |    SUM(CASE WHEN arm = 1 THEN sxx END) AS sxx_b,
      |    SUM(CASE WHEN arm = 1 THEN sxy END) AS sxy_b
      |  FROM arms)
      |SELECT n_a, n_b,
      |  $ra / 100.0 AS ratio_a_dollars,
      |  $rb / 100.0 AS ratio_b_dollars,
      |  ($rb - $ra) / 100.0 AS lift_dollars,
      |  CASE WHEN n_a > 1 AND n_b > 1
      |        AND ${varR("a")} + ${varR("b")} > 0.0 THEN
      |    ($rb - $ra) / sqrt(${varR("a")} + ${varR("b")})
      |  END AS z
      |FROM p""".stripMargin
  }

  /** Sample-ratio-mismatch check on the parity assignment — the
    * sanity gate a real experimentation platform runs BEFORE any
    * lift readout (Fabijan et al., KDD 2019: a randomizer bug that
    * skews arm sizes invalidates every downstream test, and SRM is
    * its one-number detector): χ² goodness-of-fit of the observed
    * arm sizes against the designed 50/50 split, with the standard
    * p < 0.001 alarm threshold. Closes the A/B family's loop at the
    * front: [[abSrmCheck]] gate → [[abPowerMde]] design →
    * [[abConversion]] inference → [[abCuped]] adjustment →
    * [[abPermutationTest]] exactness.
    *
    * Exactness: arm user counts are exact BIGINTs from one per-user
    * fold; χ²₁ = (n_a−n_b)²/(n_a+n_b) rides the integer micro grid
    * via `div`; z = √χ² signed by the imbalance; p = erfc(|z|/√2) on
    * the [[MultipleTesting.erfcPos]] nano grid (one rounding point —
    * the lnMicro bet); the alarm is an integer comparison on the
    * nano grid.
    *
    * Scale: one events scan → per-user fold → 2-row arm grid →
    * 1-row reduce.
    */
  def abSrmCheck(s: SparkSession, dir: String): DataFrame = {
    val users = graft.Tables.events(s, dir)
      .select(col("user_id")).distinct()
      .select((col("user_id") % 2).as("arm"))
    val row = users.groupBy(col("arm")).agg(count(lit(1)).as("n"))
      .agg(sum(when(col("arm") === 0L, col("n"))).as("n_a"),
        sum(when(col("arm") === 1L, col("n"))).as("n_b"))
    def d(n: String): Column = col(n).cast("double")
    row.select(col("n_a"), col("n_b"),
        (d("n_a") / (d("n_a") + d("n_b"))).as("share_a"),
        (expr("(((n_a - n_b) * (n_a - n_b)) * 1000000L) div (n_a + n_b)")
          .cast("double") / lit(1e6)).as("chi2_srm"),
        when(col("n_a") + col("n_b") > 0L,
          signum((col("n_a") - col("n_b")).cast("double"))
            * sqrt(expr("(((n_a - n_b) * (n_a - n_b)) * 1000000L) div (n_a + n_b)")
              .cast("double") / lit(1e6))).as("z"))
      .select(col("n_a"), col("n_b"), col("share_a"), col("chi2_srm"),
        col("z"),
        round(MultipleTesting.erfcPos(abs(col("z")) / sqrt(lit(2.0)))
          * lit(1e9)).cast("long").as("p_nano"))
      .select(col("n_a"), col("n_b"), col("share_a"), col("chi2_srm"),
        col("z"), (col("p_nano").cast("double") / lit(1e9)).as("p_value"),
        (col("p_nano") < lit(1000000L)).as("srm_alarm"))
  }

  val abSrmCheckSql: String = {
    val chi = PortableSql.intDiv("((n_a - n_b) * (n_a - n_b)) * 1000000",
      "n_a + n_b")
    val e = MultipleTesting.erfcPosSql("abs(z) / sqrt(2.0)")
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
      |arms AS (
      |  SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_b
      |  FROM u),
      |k AS (
      |  SELECT n_a, n_b,
      |    CAST(n_a AS DOUBLE) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
      |      AS share_a,
      |    CAST($chi AS DOUBLE) / 1e6 AS chi2_srm,
      |    CASE WHEN n_a + n_b > 0 THEN
      |      sign(CAST(n_a - n_b AS DOUBLE))
      |      * sqrt(CAST($chi AS DOUBLE) / 1e6) END AS z
      |  FROM arms),
      |p AS (
      |  SELECT n_a, n_b, share_a, chi2_srm, z,
      |    CAST(round(($e) * 1e9) AS BIGINT) AS p_nano
      |  FROM k)
      |SELECT n_a, n_b, share_a, chi2_srm, z,
      |  CAST(p_nano AS DOUBLE) / 1e9 AS p_value,
      |  p_nano < 1000000 AS srm_alarm
      |FROM p""".stripMargin
  }

  /** Cohen's d / Hedges' g effect size for the temporal-halves value
    * shift — the magnitude read [[welchTTest]]'s t deliberately isn't
    * (t grows with √n; d does not, so only d is comparable across
    * datasets and powers the [[abPowerMde]]-style planning for
    * continuous metrics). Pooled-SD convention (Cohen 1988), with
    * Hedges' small-sample correction g = d·(1 − 3/(4(n_a+n_b) − 9)).
    *
    * Exactness: the same exact BIGINT cent / DECIMAL square moments
    * as [[welchTTest]]; d and g are one fixed IEEE chain, NULL on
    * degenerate pooled variance.
    */
  def effectSize(s: SparkSession, dir: String): DataFrame = {
    val c = round(col("value") * 100).cast("long")
    val sidedC = sided(s, dir).select(col("side"), c.as("c"))
    val m = sidedC.groupBy(col("side"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(col("c").cast("decimal(18,0)") * col("c").cast("decimal(18,0)"))
          .as("scc"))
    val row = m.agg(
      sum(when(col("side") === "a", col("n"))).as("n_a"),
      sum(when(col("side") === "a", col("sc"))).as("sc_a"),
      sum(when(col("side") === "a", col("scc"))).as("scc_a"),
      sum(when(col("side") === "b", col("n"))).as("n_b"),
      sum(when(col("side") === "b", col("sc"))).as("sc_b"),
      sum(when(col("side") === "b", col("scc"))).as("scc_b"))
    def d(n: String): Column = col(n).cast("double")
    // (n−1)·s² in cents² = Σc² − (Σc)²/n, kept as one double chain
    def ssq(n: String, sc: String, scc: String): Column =
      d(scc) - d(sc) * d(sc) / d(n)
    val sp2 = (ssq("n_a", "sc_a", "scc_a") + ssq("n_b", "sc_b", "scc_b")) /
      (d("n_a") + d("n_b") - lit(2.0))
    val diff = d("sc_b") / d("n_b") - d("sc_a") / d("n_a")
    val cd = diff / sqrt(sp2)
    row.select(col("n_a"), col("n_b"),
      (d("sc_a") / (d("n_a") * lit(100.0))).as("mean_a"),
      (d("sc_b") / (d("n_b") * lit(100.0))).as("mean_b"),
      when(sp2 > 0.0, cd).as("cohens_d"),
      when(sp2 > 0.0, cd * (lit(1.0) - lit(3.0)
        / (lit(4.0) * (d("n_a") + d("n_b")) - lit(9.0)))).as("hedges_g"))
  }

  val effectSizeSql: String = {
    val mid = PortableSql.intDiv("mn + mx", "2")
    s"""WITH ev AS (SELECT epoch_us(ts) AS us,
      |              CAST(round(value * 100) AS BIGINT) AS c
      |            FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      |sided AS (
      |  SELECT CASE WHEN us < $mid THEN 'a' ELSE 'b' END AS side, c
      |  FROM ev, b),
      |m AS (
      |  SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(c) AS BIGINT) AS sc,
      |    CAST(CAST(SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0)))
      |         AS VARCHAR) AS DOUBLE) AS scc
      |  FROM sided GROUP BY side),
      |r AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN side = 'a' THEN n END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN side = 'a' THEN sc END) AS BIGINT) AS sc_a,
      |    SUM(CASE WHEN side = 'a' THEN scc END) AS scc_a,
      |    CAST(SUM(CASE WHEN side = 'b' THEN n END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN side = 'b' THEN sc END) AS BIGINT) AS sc_b,
      |    SUM(CASE WHEN side = 'b' THEN scc END) AS scc_b
      |  FROM m),
      |k AS (
      |  SELECT n_a, n_b,
      |    CAST(sc_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 100.0) AS mean_a,
      |    CAST(sc_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 100.0) AS mean_b,
      |    ((scc_a - CAST(sc_a AS DOUBLE) * CAST(sc_a AS DOUBLE)
      |        / CAST(n_a AS DOUBLE))
      |     + (scc_b - CAST(sc_b AS DOUBLE) * CAST(sc_b AS DOUBLE)
      |        / CAST(n_b AS DOUBLE)))
      |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0) AS sp2,
      |    CAST(sc_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      |      - CAST(sc_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS diff
      |  FROM r)
      |SELECT n_a, n_b, mean_a, mean_b,
      |  CASE WHEN sp2 > 0 THEN diff / sqrt(sp2) END AS cohens_d,
      |  CASE WHEN sp2 > 0 THEN (diff / sqrt(sp2))
      |    * (1.0 - 3.0 / (4.0 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
      |                    - 9.0)) END AS hedges_g
      |FROM k""".stripMargin
  }

  // --- Q-Q decile table --------------------------------------------------------
  /** Decile-by-decile quantile comparison (the Q-Q plot, tabulated)
    * between the temporal halves — WHERE the distribution moved, which
    * the single-number [[ks]] / [[mannWhitney]] / [[welchTTest]]
    * summaries can't say (a tail-only shift and a uniform shift can
    * share a KS statistic; their Q-Q rows look nothing alike).
    *
    * Contract: nearest-rank quantiles on the cent grid — q_d = the
    * smallest value whose inclusive cumulative count reaches
    * ⌈d·n/10⌉ = (d·n + 9) div 10 — so every reported quantile is an
    * exact data value (no interpolation to disagree on) and the b/a
    * ratio is the one IEEE division.
    *
    * Scale: per-side per-VALUE counts collapse the stream first; the
    * running CDF rides [[graft.Graft.cumSumByRange]]; each of the 9
    * thresholds then matches EXACTLY ONE value row via the
    * (cum − cnt, cum] interval condition — a 9-row broadcast against
    * the value grid, never a rank window or a per-decile re-scan.
    */
  def qqDeciles(s: SparkSession, dir: String): DataFrame = {
    val c = round(col("value") * 100).cast("long")
    val perValue = sided(s, dir).select(col("side"), c.as("c"))
      .groupBy(col("c"))
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"))
    val cum = graft.Graft.materialize(
      graft.Graft.cumSumByRange(perValue, Seq(col("c")),
        Seq(col("ca") -> "cum_a", col("cb") -> "cum_b")))
    val tot = cum.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val dec = tot
      .select(col("na"), col("nb"),
        explode(sequence(lit(1L), lit(9L))).as("d"))
      .select(col("d"),
        expr("(d * na + 9) div 10").as("thr_a"),
        expr("(d * nb + 9) div 10").as("thr_b"))
    val qa = cum.join(broadcast(dec),
        col("cum_a") >= col("thr_a")
          && col("cum_a") - col("ca") < col("thr_a"))
      .select(col("d"), col("c").as("qa_cents"))
    // db rename: qa.d and qb.d would carry the SAME attribute id (both
    // descend from dec), tripping Spark's ambiguous-self-join check
    val qb = cum.join(broadcast(dec),
        col("cum_b") >= col("thr_b")
          && col("cum_b") - col("cb") < col("thr_b"))
      .select(col("d").as("db"), col("c").as("qb_cents"))
    qa.join(qb, col("d") === col("db"))
      .select(col("d").as("decile"), col("qa_cents"), col("qb_cents"),
        (col("qb_cents") - col("qa_cents")).as("diff_cents"),
        when(col("qa_cents") =!= 0L, col("qb_cents").cast("double")
          / col("qa_cents").cast("double")).as("ratio_b_over_a"))
      .orderBy(col("decile"))
  }

  val qqDecilesSql: String = {
    val mid = PortableSql.intDiv("mn + mx", "2")
    val thrA = PortableSql.intDiv("d * na + 9", "10")
    val thrB = PortableSql.intDiv("d * nb + 9", "10")
    s"""WITH ev AS (SELECT epoch_us(ts) AS us,
      |              CAST(round(value * 100) AS BIGINT) AS c
      |            FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      |sided AS (
      |  SELECT CASE WHEN us < $mid THEN 'a' ELSE 'b' END AS side, c
      |  FROM ev, b),
      |pv AS (
      |  SELECT c,
      |    CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM sided GROUP BY c),
      |cum AS (
      |  SELECT c, ca, cb,
      |    CAST(SUM(ca) OVER w AS BIGINT) AS cum_a,
      |    CAST(SUM(cb) OVER w AS BIGINT) AS cum_b
      |  FROM pv WINDOW w AS (ORDER BY c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
      |               CAST(SUM(cb) AS BIGINT) AS nb FROM pv),
      |dec AS (SELECT unnest(range(1, 10)) AS d, na, nb FROM tot),
      |qa AS (
      |  SELECT d, c AS qa_cents FROM cum, dec
      |  WHERE cum_a >= $thrA AND cum_a - ca < $thrA),
      |qb AS (
      |  SELECT d, c AS qb_cents FROM cum, dec
      |  WHERE cum_b >= $thrB AND cum_b - cb < $thrB)
      |SELECT qa.d AS decile, qa_cents, qb_cents,
      |  qb_cents - qa_cents AS diff_cents,
      |  CASE WHEN qa_cents <> 0 THEN CAST(qb_cents AS DOUBLE)
      |    / CAST(qa_cents AS DOUBLE) END AS ratio_b_over_a
      |FROM qa JOIN qb ON qa.d = qb.d
      |ORDER BY decile""".stripMargin
  }
}
