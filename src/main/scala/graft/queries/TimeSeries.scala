package graft.queries

import graft.{Graft, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classical time-series decomposition and changepoint detection over
  * the daily order-revenue series — the monitoring pair a revenue or
  * token-throughput dashboard runs: trend/seasonal/residual splitting
  * (the moving-average step of STL; Cleveland et al., J. Official
  * Stat. 1990) and CUSUM mean-shift scoring (Page, Biometrika 1954).
  *
  * Scale shape: both operators aggregate the fact table down to ONE
  * row per day FIRST (map-side partial sums into a date-keyed
  * exchange — the 100 TB side is touched exactly once), then run
  * window arithmetic on the day-cardinality series. The
  * single-partition window over the aggregated series is intentional:
  * a multi-year daily series is a few thousand rows, far below the
  * per-partition threshold where a range-partitioned window would pay
  * off; the fact-table scan never enters a global window.
  *
  * Determinism discipline ([[Exact]]): daily revenue is summed in
  * DECIMAL(18,6) cents-exact units and carried as BIGINT micro-dollars
  * (1e-6 $); the 7-day moving average and per-weekday means use
  * truncating integer division / exact integer sums, and the only IEEE
  * ops are final divisions and subtractions of bit-identical exact
  * integers — the [[Drift]] discipline, so both reports hash-match.
  */
object TimeSeries {

  /** Exact cents per order: o_totalprice has a 2-decimal true
    * expansion, so DECIMAL(18,6)·100 is an exact integer both engines
    * agree on (the [[Exact.dec]] contract).
    */
  private def cents(c: Column): Column =
    (c.cast(DecimalType(18, 6)) * lit(100)).cast("long")

  /** One row per day: (d DATE, rev_cents BIGINT). */
  private def dailyRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        cents(col("o_totalprice")).as("c"))
      .groupBy(col("d"))
      .agg(sum(col("c")).as("rev_cents"))

  // --- prominence peaks --------------------------------------------------------
  /** Top-5 PEAK days of daily revenue by local prominence: a day is a
    * peak iff it strictly dominates every neighbor within ±3 days
    * (full-window edges only — the [[seasonalDecompose]] ROWS-frame
    * edge rule), and its prominence is the margin over the taller
    * flank. The ops read behind "which spikes are real events":
    * [[cusumChangepoint]] finds sustained LEVEL shifts; this finds
    * isolated spikes a level-shift detector deliberately ignores.
    *
    * Exact integers end-to-end: cents, window MAX and COUNT (both
    * order-free — no ordered-accumulation hazard), one subtraction.
    * Strict domination also breaks plateaus: a flat-top spike reports
    * zero peaks rather than two half-peaks, on both engines.
    *
    * Scale: the global ±3-day windows run over the CALENDAR DAY GRID
    * (the allowlisted bounded class — PlanAuditSpec names this site);
    * the fact table itself only crosses the one grouping exchange.
    */
  def peaks(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val wl = Window.orderBy(col("d")).rowsBetween(-3, -1)
    val wr = Window.orderBy(col("d")).rowsBetween(1, 3)
    dailyRevenue(s, dir)
      .select(col("d"), col("rev_cents"),
        max(col("rev_cents")).over(wl).as("lmax"),
        max(col("rev_cents")).over(wr).as("rmax"),
        count(lit(1)).over(wl).as("nl"),
        count(lit(1)).over(wr).as("nr"))
      .filter(col("nl") === 3 && col("nr") === 3 &&
        col("rev_cents") > col("lmax") && col("rev_cents") > col("rmax"))
      .select(col("d"), col("rev_cents"),
        (col("rev_cents") - greatest(col("lmax"), col("rmax")))
          .as("prominence_cents"))
      .orderBy(col("prominence_cents").desc, col("d"))
      .limit(k)
  }

  val peaksSql: String =
    """WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT d, rev_cents,
      |    MAX(rev_cents) OVER wl AS lmax, MAX(rev_cents) OVER wr AS rmax,
      |    COUNT(*) OVER wl AS nl, COUNT(*) OVER wr AS nr
      |  FROM rev
      |  WINDOW wl AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
      |         wr AS (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING))
      |SELECT d, rev_cents,
      |  CAST(rev_cents - greatest(lmax, rmax) AS BIGINT) AS prominence_cents
      |FROM w
      |WHERE nl = 3 AND nr = 3 AND rev_cents > lmax AND rev_cents > rmax
      |ORDER BY prominence_cents DESC, d LIMIT 5""".stripMargin

  // --- trend / seasonal / residual decomposition ----------------------------
  /** Additive decomposition of daily revenue:
    *   - trend: centered 7-row moving average (defined only where the
    *     full 7-row window exists — a ROWS frame, so edge semantics are
    *     identical in every engine), in micro-dollars via truncating
    *     integer division by 7;
    *   - seasonal: per-weekday mean of the detrended series (weekday =
    *     epoch-day mod 7, 0 = Thursday — spelled arithmetically because
    *     engines disagree on dayofweek()'s origin), one IEEE division
    *     of exact integer sums;
    *   - residual: detrended minus seasonal.
    * The weekday means are a 7-row broadcast back onto the series.
    */
  def seasonalDecompose(s: SparkSession, dir: String): DataFrame = {
    val series = dailyRevenue(s, dir)
      .withColumn("dow",
        (datediff(col("d"), to_date(lit("1970-01-01"))) % 7).cast("long"))
    val w7 = Window.orderBy(col("d")).rowsBetween(-3, 3)
    // materialized day-sized: the seasonal aggregate and the final
    // projection both read it, and without the cut each branch would
    // re-run the full fact-table scan (the "touched exactly once"
    // contract in the object doc)
    val trended = Graft.materialize(series
      .withColumn("s7", sum(col("rev_cents")).over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .withColumn("trend_micro",
        when(col("c7") === 7, expr("(s7 * 10000) div 7")))
      .withColumn("detr_micro",
        col("rev_cents") * lit(10000L) - col("trend_micro"))
      .drop("s7", "c7"))
    val seasonal = trended.filter(col("detr_micro").isNotNull)
      .groupBy(col("dow"))
      .agg((sum(col("detr_micro")).cast("double") /
        count(col("detr_micro")).cast("double")).as("seasonal_micro"))
    trended.join(broadcast(seasonal), Seq("dow"))
      .select(col("d"), col("rev_cents"), col("dow"), col("trend_micro"),
        col("seasonal_micro"),
        (col("detr_micro").cast("double") - col("seasonal_micro"))
          .as("residual_micro"))
      .orderBy(col("d"))
  }

  val seasonalDecomposeSql: String = {
    val trend = PortableSql.intDiv("s7 * 10000", "7")
    s"""WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT d, rev_cents,
      |    CAST(date_diff('day', DATE '1970-01-01', d) % 7 AS BIGINT) AS dow,
      |    SUM(rev_cents) OVER win AS s7, COUNT(*) OVER win AS c7
      |  FROM rev
      |  WINDOW win AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |t AS (
      |  SELECT d, rev_cents, dow,
      |    CASE WHEN c7 = 7 THEN $trend END AS trend_micro
      |  FROM w),
      |det AS (
      |  SELECT d, rev_cents, dow, trend_micro,
      |    rev_cents * 10000 - trend_micro AS detr_micro
      |  FROM t),
      |seas AS (
      |  SELECT dow,
      |    CAST(CAST(SUM(detr_micro) AS BIGINT) AS DOUBLE)
      |      / CAST(COUNT(detr_micro) AS DOUBLE)
      |      AS seasonal_micro
      |  FROM det WHERE detr_micro IS NOT NULL GROUP BY dow)
      |SELECT d, rev_cents, det.dow, trend_micro, seasonal_micro,
      |  CAST(detr_micro AS DOUBLE) - seasonal_micro AS residual_micro
      |FROM det JOIN seas ON det.dow = seas.dow
      |ORDER BY d""".stripMargin
  }

  // --- seasonal strength ------------------------------------------------------
  /** Strength of seasonality of daily revenue — Hyndman's
    * decomposition statistic F_S = max(0, 1 − Var(R)/Var(S+R)) over
    * [[seasonalDecompose]]'s output (Wang, Smith & Hyndman, J.
    * Comput. Graph. Stat. 2006): 1 means the detrended series is pure
    * weekly pattern, 0 means the seasonal component explains nothing.
    * The one-number read a forecaster takes before committing to a
    * seasonal model (the ACF pair [[autocorrelation]]/[[ljungBox]]
    * answer "is there structure"; this answers "how much of it is the
    * season").
    *
    * Determinism — every moment is exact or grid-ordered:
    * Var(S+R) = Var(detrended) comes from EXACT moments (detrended is
    * an exact BIGINT micro-value, its square sum in pairwise
    * DECIMAL(19,0) products — the r11 rule: (18,0)·(18,0) stays on
    * DuckDB's overflow-checked int64 path, and detr² ≈ 1e26 needs the
    * hugeint path). Var(R) NEVER touches the derived residual
    * doubles: since R = detr − mean_dow, the group means kill the
    * cross terms and Σ R² = Σ detr² − Σ_dow S_dow²/C_dow exactly (the
    * ANOVA within-group identity, with ΣR = 0 identically) — so the
    * only double accumulation is the 7-term Σ S²/C, cumulated via a
    * window over the dow-ordered 7-row grid (the
    * [[Relational.anovaPriority]] ordered-accumulation pattern; a
    * first spelling cumulated resid² over the ~2400-row DAY grid and
    * lost the last 2 ulps to DuckDB's segment-tree window combine —
    * grids must stay single-digit rows for that trick). The F ratio
    * is a fixed IEEE chain; `greatest` clamps the negative-noise
    * case, and a constant detrended series (Var(detrended) = 0, so
    * the ratio is 0/0) yields NULL — not NaN — per the repo's
    * NULL-not-NaN discipline (Spark 0/0 = NaN but DuckDB = NULL, so
    * an unguarded ratio hash-diverges; same guard class as
    * [[runsTest]]'s constant-series NULL).
    *
    * Shape: the decomposition's one fact-table aggregation, a 7-row
    * dow aggregate, and two 1-row reductions.
    */
  def seasonalStrength(s: SparkSession, dir: String): DataFrame = {
    val dc = Graft.materialize(
      seasonalDecompose(s, dir)
        .filter(col("trend_micro").isNotNull)
        .select(col("dow"),
          (col("rev_cents") * lit(10000L) - col("trend_micro")).as("detr")))
    val wc = Window.orderBy(col("dow"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("dow"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ssb = dc.groupBy(col("dow"))
      .agg(sum(col("detr")).as("sdw"), count(lit(1)).as("cdw"))
      .select(
        sum(col("sdw").cast("double") * col("sdw").cast("double")
          / col("cdw").cast("double")).over(wc).as("ssb"),
        row_number().over(Window.orderBy(col("dow"))).as("rn"),
        count(lit(1)).over(wAll).as("ng"))
      .filter(col("rn") === col("ng"))
      .select(col("ssb"))
    val dw = col("detr").cast(org.apache.spark.sql.types.DecimalType(19, 0))
    val dmo = dc.agg(count(lit(1)).as("n"), sum(col("detr")).as("sd"),
      sum(dw * dw).as("sd2"))
    val nd = col("n").cast("double")
    val varR = (col("sd2").cast("double") - col("ssb")) / nd
    val varD = (col("sd2").cast("double")
      - col("sd").cast("double") * col("sd").cast("double") / nd) / nd
    dmo.crossJoin(broadcast(ssb))
      .select(col("n").as("n_days"), varD.as("var_detrended"),
        varR.as("var_residual"),
        when(varD === lit(0.0), lit(null).cast("double"))
          .otherwise(greatest(lit(0.0), lit(1.0) - varR / varD))
          .as("seasonal_strength"))
  }

  val seasonalStrengthSql: String =
    s"""WITH dc0 AS (${seasonalDecomposeSql.replace("\n", "\n|  ")}),
      |base AS (
      |  SELECT dow, rev_cents * 10000 - trend_micro AS detr
      |  FROM dc0 WHERE trend_micro IS NOT NULL),
      |grid AS (
      |  SELECT dow, CAST(SUM(detr) AS BIGINT) AS sdw,
      |    CAST(COUNT(*) AS BIGINT) AS cdw
      |  FROM base GROUP BY dow),
      |cum AS (
      |  SELECT
      |    SUM(CAST(sdw AS DOUBLE) * CAST(sdw AS DOUBLE)
      |        / CAST(cdw AS DOUBLE))
      |      OVER (ORDER BY dow ROWS BETWEEN UNBOUNDED PRECEDING
      |            AND CURRENT ROW) AS ssb,
      |    row_number() OVER (ORDER BY dow) AS rn,
      |    COUNT(*) OVER () AS ng
      |  FROM grid),
      |lastrow AS (SELECT ssb FROM cum WHERE rn = ng),
      |dmo AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(detr) AS BIGINT) AS sd,
      |    SUM(CAST(detr AS DECIMAL(19,0)) * CAST(detr AS DECIMAL(19,0)))
      |      AS sd2
      |  FROM base)
      |SELECT n AS n_days,
      |  (CAST(CAST(sd2 AS VARCHAR) AS DOUBLE)
      |     - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
      |    / CAST(n AS DOUBLE) AS var_detrended,
      |  (CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) - ssb) / CAST(n AS DOUBLE) AS var_residual,
      |  CASE WHEN (CAST(CAST(sd2 AS VARCHAR) AS DOUBLE)
      |          - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
      |            / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) = 0.0
      |    THEN NULL
      |    ELSE greatest(0.0, 1.0
      |      - ((CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) - ssb) / CAST(n AS DOUBLE))
      |        / ((CAST(CAST(sd2 AS VARCHAR) AS DOUBLE)
      |            - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
      |              / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))) END
      |    AS seasonal_strength
      |FROM dmo, lastrow""".stripMargin

  // --- CUSUM changepoint candidates -----------------------------------------
  /** Top-5 mean-shift changepoint candidates on daily revenue by the
    * CUSUM statistic. The textbook S_t = Σ_{i≤t}(x_i − x̄) needs the
    * non-integer mean; multiplying through by n keeps every
    * intermediate an exact BIGINT:
    *   D_t = n·prefix_t − t·total  (= n² · S_t / n, same argmax).
    * |D_t| peaks at the most likely single changepoint (Page 1954 /
    * the binary-segmentation first split). Ranked by |D_t| desc with
    * date as the deterministic tiebreak.
    *
    * Bounds: total cents grow linearly with SF (~2.3e13·SF), so
    * n·prefix passes Long.MaxValue near SF 40 and a BIGINT D would
    * wrap silently with ANSI off. D is therefore formed in exact
    * DECIMAL arithmetic on BOTH engines (operands cast to
    * DECIMAL(6,0)/DECIMAL(30,0) so products stay inside each engine's
    * 38-digit multiply limit — exact past SF 1e20) and the |D| RANKING
    * compares those exact decimals; only the REPORTED d_stat is the
    * correctly-rounded double of the exact value. No DECIMAL(38,·)
    * output column: r7 showed SUM→DECIMAL(38) narrows through HUGEINT
    * differently across DuckDB versions, so the oracle contract keeps
    * decimals internal.
    */
  def cusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    // day-sized cut: the totals aggregate and the prefix scoring both
    // read the series; without it each branch re-scans orders
    val series = Graft.materialize(dailyRevenue(s, dir))
    val wOrd = Window.orderBy(col("d"))
    val tot = series.agg(sum(col("rev_cents")).as("total"),
      count(lit(1)).as("n_days"))
    val scored = series
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("prefix", sum(col("rev_cents")).over(wOrd))
      .crossJoin(broadcast(tot))
      .select(col("d"), col("n_days"),
        (col("n_days").cast("decimal(6,0)") * col("prefix").cast("decimal(30,0)")
          - col("t").cast("decimal(6,0)") * col("total").cast("decimal(30,0)"))
          .as("d_exact"))
    scored
      .withColumn("rnk", row_number().over(
        Window.orderBy(abs(col("d_exact")).desc, col("d"))).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("rnk"), col("d"),
        col("d_exact").cast("double").as("d_stat"), col("n_days"))
      .orderBy(col("rnk"))
  }

  val cusumChangepointSql: String =
    """WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total,
      |               CAST(COUNT(*) AS BIGINT) AS n_days FROM rev),
      |p AS (
      |  SELECT d,
      |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
      |    CAST(SUM(rev_cents) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS prefix
      |  FROM rev),
      |sc AS (
      |  SELECT d, n_days,
      |    CAST(n_days AS DECIMAL(6,0)) * CAST(prefix AS DECIMAL(30,0))
      |      - CAST(t AS DECIMAL(6,0)) * CAST(total AS DECIMAL(30,0)) AS d_exact
      |  FROM p, tot),
      |r AS (
      |  SELECT CAST(row_number() OVER (ORDER BY abs(d_exact) DESC, d)
      |              AS BIGINT) AS rnk,
      |         d, CAST(d_exact AS DOUBLE) AS d_stat, n_days
      |  FROM sc)
      |SELECT rnk, d, d_stat, n_days FROM r WHERE rnk <= 5 ORDER BY rnk""".stripMargin

  // --- lag-k autocorrelation ------------------------------------------------
  /** Pearson autocorrelation of daily revenue at lags 1 and 7 (the
    * day-over-day and week-over-week persistence a forecaster checks
    * before picking a seasonal model — the ACF read of Box & Jenkins
    * 1970). Row-lag pairing via `lead` over the date-ordered series;
    * linear moments (n, Σx, Σy) are exact BIGINTs in whole dollars,
    * and the SECOND moments (Σxy, Σx², Σy²) accumulate in
    * DECIMAL(38,0) on BOTH engines — daily dollars grow linearly with
    * SF (~9.4e7·SF), so dollars² · series-length passes Long.MaxValue
    * near SF 0.7 and BIGINT sums would wrap silently; DECIMAL(38,0)
    * stays exact past SF 1e8. The correlation itself is a fixed
    * sequence of IEEE ops on those exact values (the decimal→double
    * cast is correctly rounded in both engines, exercised above 2^53
    * at sf0.1 by the oracle gate) — the [[Drift]] discipline.
    *
    * Shape: one fact-table aggregation to the day-sized series
    * (materialized once), both lags derived from the SAME window pass,
    * two tiny aggregates unioned. The single-partition window is over
    * day cardinality, never the fact table.
    */
  def autocorrelation(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.orderBy(col("d"))
    val series = Graft.materialize(
      dailyRevenue(s, dir)
        .withColumn("x", expr("rev_cents div 100"))
        .withColumn("y1", lead(col("x"), 1).over(wOrd))
        .withColumn("y7", lead(col("x"), 7).over(wOrd)))
    // second moments in DECIMAL(38,0): dollar² · days wraps BIGINT
    // near SF 0.7 (silently, with ANSI off) — decimal stays exact
    val xd = col("x").cast("decimal(18,0)")
    def leg(lagN: Int, y: Column): DataFrame = {
      val yd = y.cast("decimal(18,0)")
      series.filter(y.isNotNull)
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(y).as("sy"), sum(xd * yd).as("sxy"),
          sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"))
        .select(lit(lagN.toLong).as("lag"), col("n"),
          ((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / sqrt((col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              * (col("n").cast("double") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))))
            .as("acf"))
    }
    leg(1, col("y1")).unionByName(leg(7, col("y7"))).orderBy(col("lag"))
  }

  // --- Theil–Sen robust trend slope -----------------------------------------
  /** Theil–Sen estimator of the daily-revenue trend: the MEDIAN of the
    * pairwise slopes (x_j − x_i)/(t_j − t_i) over all day pairs i<j
    * (Theil 1950 / Sen, JASA 1968) — the robust alternative to the OLS
    * slope in `agg_regr_slope`, immune to up to ~29 % outlier days.
    *
    * Determinism: every slope is ONE IEEE division of two exact
    * BIGINTs (whole dollars over day gaps), so the multiset of slopes
    * is bit-identical in both engines; the median is the exact lower
    * positional order statistic at ceil(m/2) of that multiset — the
    * [[EventQueries]] interArrival discipline, no interpolation.
    *
    * The order statistic is found WITHOUT a single-partition Window:
    * approximate quantiles bracket the median into a narrow value
    * band (any bracketing works — the bounds only localize, never
    * decide), an exact count of slopes strictly below the band turns
    * the global rank into a band-local k, and a distributed
    * TakeOrderedAndProject(k) + max reads the k-th smallest of the
    * band. The band is ~1% of the multiset (widened in a bounded
    * retry loop if the sketch ever misses), so the driver only ever
    * sees k band doubles. PlanAuditSpec pins the plan to zero Window
    * nodes.
    *
    * Scale shape: the pairing is over the DAY-AGGREGATED series (the
    * fact table collapses to one row per day first), so the quadratic
    * is bounded by calendar-span², not data volume — ~7 M pairs for a
    * decade of days regardless of corpus size, spread by the broadcast
    * nested-loop over the 32 partitions of the left leg. Same bounded-
    * by-the-aggregate contract as the SemDeDup cell cap.
    */
  def theilSen(s: SparkSession, dir: String): DataFrame = {
    val series = Graft.materialize(
      dailyRevenue(s, dir).select(
        datediff(col("d"), to_date(lit("1970-01-01"))).cast("long").as("t"),
        expr("rev_cents div 100").as("x")))
    val a = series.select(col("t").as("ta"), col("x").as("xa"))
    val b = series.select(col("t").as("tb"), col("x").as("xb"))
    // materialized: the pair count and the rank window both read the
    // slope multiset, and without the cut the nested-loop pairing
    // executes twice (caught by a plan dump: two BroadcastNestedLoop
    // nodes over the same series)
    val slopes = Graft.materialize(
      a.join(broadcast(b), col("ta") < col("tb"))
        .select(((col("xb") - col("xa")).cast("double")
          / (col("tb") - col("ta")).cast("double")).as("slope")))
    val m = slopes.count()
    require(m > 0, "theilSen needs a non-empty slope multiset")
    val target = (m + 1) / 2
    // banded exact order statistic (see scaladoc): bracket, localize,
    // TakeOrderedAndProject. The widen loop is a correctness net for
    // a pathological sketch miss; it terminates at the full [0,1]
    // band, where containment is unconditional.
    var qlo = 0.495
    var qhi = 0.505
    var out: Option[DataFrame] = None
    while (out.isEmpty) {
      val bounds =
        slopes.stat.approxQuantile("slope", Array(qlo, qhi), 1e-4)
      val lo = bounds(0)
      val hi = bounds(1)
      val below = slopes.filter(col("slope") < lo).count()
      val band = slopes.filter(col("slope") >= lo && col("slope") <= hi)
      val bandN = band.count()
      if (target > below && target <= below + bandN) {
        val k = (target - below).toInt
        out = Some(band.orderBy(col("slope")).limit(k)
          .agg(max(col("slope")).as("slope_dollars_per_day"))
          .select(lit(m).as("n_pairs"), col("slope_dollars_per_day")))
      } else {
        qlo = math.max(0.0, qlo - 0.1)
        qhi = math.min(1.0, qhi + 0.1)
      }
    }
    out.get
  }

  val theilSenSql: String = {
    val dollars = PortableSql.intDiv("rev_cents", "100")
    val mid = PortableSql.intDiv("m + 1", "2")
    s"""WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |x AS (SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS t,
      |             $dollars AS x
      |      FROM rev),
      |sl AS (
      |  SELECT CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
      |  FROM x a JOIN x b ON a.t < b.t),
      |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM sl),
      |r AS (SELECT slope,
      |        CAST(row_number() OVER (ORDER BY slope) AS BIGINT) AS rnk
      |      FROM sl)
      |SELECT m AS n_pairs, slope AS slope_dollars_per_day
      |FROM r, mm WHERE rnk = $mid""".stripMargin
  }

  // --- Mann–Kendall trend test ----------------------------------------------
  /** Mann–Kendall trend significance on daily revenue (Mann 1945 /
    * Kendall 1975) — the SIGNIFICANCE companion to [[theilSen]]'s
    * magnitude: S = Σ_{i<j} sign(x_j − x_i) over day pairs, the
    * tie-corrected variance, and the continuity-corrected Z score.
    * A monitoring rule reads |Z| > 1.96 as a significant monotone
    * trend without assuming any distribution.
    *
    * Exactness: S is an exact BIGINT from integer sign comparisons;
    * the variance numerator n(n−1)(2n+5) − Σ t_p(t_p−1)(2t_p+5) is an
    * exact BIGINT (the /18 and the sqrt are the final IEEE steps).
    * Pairing reuses the [[theilSen]] bounded nested-loop over the
    * day-aggregated series (calendar-span², never data volume).
    */
  def mannKendall(s: SparkSession, dir: String): DataFrame = {
    val series = Graft.materialize(
      dailyRevenue(s, dir).select(
        datediff(col("d"), to_date(lit("1970-01-01"))).cast("long").as("t"),
        expr("rev_cents div 100").as("x")))
    val sStat = series.select(col("t").as("ta"), col("x").as("xa"))
      .join(broadcast(series.select(col("t").as("tb"), col("x").as("xb"))),
        col("ta") < col("tb"))
      .agg(sum(signum(col("xb") - col("xa")).cast("long")).as("s_stat"))
    val ties = series.groupBy(col("x")).agg(count(lit(1)).as("tp"))
      .agg(coalesce(sum(col("tp") * (col("tp") - 1L)
        * (lit(2L) * col("tp") + 5L)), lit(0L)).as("tie_term"))
    val n = series.agg(count(lit(1)).as("n_days"))
    sStat.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .select(col("n_days"), col("s_stat"),
        (col("n_days") * (col("n_days") - 1L)
          * (lit(2L) * col("n_days") + 5L) - col("tie_term")).as("var_num"))
      .select(col("n_days"), col("s_stat"), col("var_num"),
        // all-tied series ⇒ var_num = 0 ⇒ 0/0 = NaN; emit NULL for
        // the degenerate case (engines disagree on NaN semantics)
        when(col("var_num") > 0,
          when(col("s_stat") > 0, col("s_stat") - 1L)
            .when(col("s_stat") < 0, col("s_stat") + 1L)
            .otherwise(0L).cast("double")
            / sqrt(col("var_num").cast("double") / 18.0))
          .otherwise(lit(null).cast("double")).as("z"))
  }

  val mannKendallSql: String = {
    val dollars = PortableSql.intDiv("rev_cents", "100")
    s"""WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |x AS (SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS t,
      |             $dollars AS x
      |      FROM rev),
      |s AS (
      |  SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
      |                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
      |           AS s_stat
      |  FROM x a JOIN x b ON a.t < b.t),
      |tie AS (
      |  SELECT CAST(COALESCE(SUM(tp * (tp - 1) * (2 * tp + 5)), 0) AS BIGINT)
      |           AS tie_term
      |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tp FROM x GROUP BY x.x) g),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM x),
      |v AS (
      |  SELECT n_days, s_stat,
      |    n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var_num
      |  FROM s, nn, tie)
      |SELECT n_days, s_stat, var_num,
      |  CASE WHEN var_num > 0 THEN
      |    CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
      |              WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END AS DOUBLE)
      |      / sqrt(CAST(var_num AS DOUBLE) / 18.0)
      |  ELSE NULL END AS z
      |FROM v""".stripMargin
  }

  // --- Hodges–Lehmann pseudo-median of daily change ----------------------------
  /** Hodges–Lehmann pseudo-median of the day-over-day revenue change
    * (Hodges & Lehmann, Ann. Math. Stat. 1963): the median of all
    * Walsh averages (Δᵢ+Δⱼ)/2, i ≤ j — the location estimator the
    * Wilcoxon signed-rank test inverts, with 0.955 asymptotic
    * efficiency vs the mean under normality and a 29% breakdown
    * point. The robust "typical daily drift" companion to
    * [[theilSen]] (median pairwise SLOPE vs time) and the magnitude
    * beside [[mannKendall]]'s significance: a few promotion-spike
    * days move the mean change, not this.
    *
    * Exactness: deltas are exact BIGINT cents off the day grid (one
    * lag window — the allowlisted calendar-grid class); Walsh SUMS
    * Δᵢ+Δⱼ stay exact BIGINTs; the median is `percentile`(0.5) ==
    * DuckDB `quantile_cont` — identical sort + linear interpolation
    * on identical integers (the `agg_median_price` precedent) — and
    * the ÷2 (Walsh) ÷100 (dollars) is one fixed chain.
    *
    * Scale: the pairing is the [[theilSen]] bounded nested-loop over
    * the day-aggregated series — |days|² pairs at ANY corpus size —
    * and the median is a grand aggregate over that bounded multiset.
    */
  def hodgesLehmann(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("t"))
    // the lag window is global (allowlisted: day-grid cardinality), so
    // its output lands in ONE partition — re-spread the bounded grid
    // BEFORE the checkpoint or the |days|²/2 Walsh pairing below and
    // its percentile partials inherit the single partition (measured
    // r17: 9 tasks total, one task holding the whole 15.8 s pair+
    // median CPU; respread → every core takes a slice). The partition
    // count rides spark.sql.shuffle.partitions (pinned so AQE cannot
    // re-coalesce the tiny grid back into one task), staying
    // scale-adaptive via conf rather than a local constant.
    val nParts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val deltas = Graft.materialize(
      dailyRevenue(s, dir)
        .select(datediff(col("d"), to_date(lit("1970-01-01")))
          .cast("long").as("t"), col("rev_cents"))
        .select(col("t"),
          (col("rev_cents") - lag(col("rev_cents"), 1).over(w)).as("dx"))
        .filter(col("dx").isNotNull)
        .repartition(nParts, col("t")))
    val m = deltas.count()
    // ta <= tb over distinct day keys ⇒ the pair count is exactly
    // m(m+1)/2 — no need to count the nested-loop output
    val np = m * (m + 1) / 2
    if (np == 0)
      return s.range(1).select(lit(0L).as("n_deltas"),
        lit(0L).as("n_pairs"),
        lit(null).cast("double").as("hl_pseudomedian_dollars"))
    val a = deltas.select(col("t").as("ta"), col("dx").as("xa"))
    val b = deltas.select(col("t").as("tb"), col("dx").as("xb"))
    // materialized: the sketch, the localizing counts and the two rank
    // reads all consume the Walsh multiset — without the cut each
    // pass would re-run the nested-loop pairing
    val pairs = Graft.materialize(
      a.join(broadcast(b), col("ta") <= col("tb"))
        .select((col("xa") + col("xb")).as("wsum")))
    // percentile(0.5) interpolates the two middle order statistics:
    // 0.5·v(kLo) + 0.5·v(kHi) with kLo = (np+1) div 2, kHi = np div 2
    // + 1 (equal when np is odd) — every term exact in double (Walsh
    // sums ≪ 2^53), so this spelling is bit-identical to the
    // percentile aggregate it replaces. The ranks are read with the
    // theilSen banded order-statistic (sketch-bracket → exact counts →
    // bounded TakeOrdered) instead of `percentile`'s object hash agg,
    // whose per-partition boxed maps and one-task merge measured
    // 16.8 s + 7.4 s on the 2.9 M-pair multiset (r17 stage probe).
    val kLo = (np + 1) / 2
    val kHi = np / 2 + 1
    var qlo = 0.495
    var qhi = 0.505
    var out: Option[DataFrame] = None
    while (out.isEmpty) {
      val bounds = pairs.stat.approxQuantile("wsum", Array(qlo, qhi), 1e-4)
      val lo = bounds(0)
      val hi = bounds(1)
      // one scan localizes both counts (below-band and in-band)
      val loc = pairs.agg(
        sum(when(col("wsum") < lo, 1L).otherwise(0L)).as("below"),
        sum(when(col("wsum") >= lo && col("wsum") <= hi, 1L).otherwise(0L))
          .as("band_n")).collect().head
      val below = loc.getLong(0)
      val band = pairs.filter(col("wsum") >= lo && col("wsum") <= hi)
      val bandN = loc.getLong(1)
      if (kLo > below && kHi <= below + bandN) {
        val vLo = band.orderBy(col("wsum")).limit((kLo - below).toInt)
          .agg(max(col("wsum")).as("v_lo"))
        val vHi = band.orderBy(col("wsum")).limit((kHi - below).toInt)
          .agg(max(col("wsum")).as("v_hi"))
        out = Some(vLo.crossJoin(broadcast(vHi))
          .select(lit(m).as("n_deltas"), lit(np).as("n_pairs"),
            ((lit(0.5) * col("v_lo").cast("double")
              + lit(0.5) * col("v_hi").cast("double")) / lit(200.0))
              .as("hl_pseudomedian_dollars")))
      } else {
        qlo = math.max(0.0, qlo - 0.1)
        qhi = math.min(1.0, qhi + 0.1)
      }
    }
    out.get
  }

  val hodgesLehmannSql: String =
    """WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |x AS (SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS t,
      |             rev_cents
      |      FROM rev),
      |d AS (SELECT t, rev_cents - lag(rev_cents) OVER (ORDER BY t) AS dx
      |      FROM x),
      |dd AS (SELECT t, CAST(dx AS BIGINT) AS dx FROM d WHERE dx IS NOT NULL),
      |wl AS (SELECT a.dx + b.dx AS wsum
      |       FROM dd a JOIN dd b ON a.t <= b.t)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dd) AS n_deltas,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  quantile_cont(wsum, 0.5) / 200.0 AS hl_pseudomedian_dollars
      |FROM wl""".stripMargin

  // --- Wald–Wolfowitz runs test ----------------------------------------------
  /** Runs test for randomness of daily revenue around its median
    * (Wald & Wolfowitz, Ann. Math. Stat. 1940): days are signed
    * above/below the median (median-equal days dropped, the standard
    * convention), runs of equal sign are counted, and the count is
    * compared to its null mean 1 + 2·n₊·n₋/n — too few runs means
    * trending/clustering, too many means oscillation. The third
    * nonparametric leg beside [[theilSen]] (magnitude) and
    * [[mannKendall]] (monotone significance): it detects NON-monotone
    * structure the other two can't.
    *
    * Exactness: the median is the exact lower positional order
    * statistic (BIGINT dollars), signs and the run count are exact
    * integers (a run starts where lag(sign) differs — one window
    * pass), and mean/variance/z are a fixed IEEE chain on exact
    * counts. All windows ride the day grid.
    */
  def runsTest(s: SparkSession, dir: String): DataFrame = {
    val series = Graft.materialize(
      dailyRevenue(s, dir).select(col("d"),
        expr("rev_cents div 100").as("x")))
    val m = series.count()
    val med = series
      .withColumn("i", row_number().over(
        Window.orderBy(col("x"), col("d"))).cast("long"))
      .filter(col("i") === (m + 1) / 2)
      .select(col("x").as("med"))
    val signed = series.crossJoin(broadcast(med))
      .filter(col("x") =!= col("med"))
      .select(col("d"), when(col("x") > col("med"), 1L).otherwise(-1L).as("sgn"))
    val wOrd = Window.orderBy(col("d"))
    signed
      .withColumn("brk",
        when(lag(col("sgn"), 1).over(wOrd).isNull
          || lag(col("sgn"), 1).over(wOrd) =!= col("sgn"), 1L).otherwise(0L))
      .agg(sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("sgn") === -1L, 1L).otherwise(0L)).as("n_neg"),
        sum(col("brk")).as("n_runs"))
      .select(col("n_pos"), col("n_neg"), col("n_runs"),
        // degenerate series (one sign absent, or n_pos = n_neg = 1)
        // zero the variance ⇒ 0/0 = NaN; emit NULL instead — the
        // integer guard 2·n₊·n₋ > n is exact in both engines
        when(col("n_pos") > 0 && col("n_neg") > 0
          && lit(2L) * col("n_pos") * col("n_neg")
             > col("n_pos") + col("n_neg"),
          (col("n_runs").cast("double")
            - (lit(1.0) + lit(2.0) * col("n_pos").cast("double")
              * col("n_neg").cast("double")
              / (col("n_pos") + col("n_neg")).cast("double")))
            / sqrt((lit(2.0) * col("n_pos").cast("double")
              * col("n_neg").cast("double")
              * (lit(2.0) * col("n_pos").cast("double")
                * col("n_neg").cast("double")
                - (col("n_pos") + col("n_neg")).cast("double")))
              / ((col("n_pos") + col("n_neg")).cast("double")
                * (col("n_pos") + col("n_neg")).cast("double")
                * ((col("n_pos") + col("n_neg")).cast("double") - 1.0))))
          .otherwise(lit(null).cast("double"))
          .as("z"))
  }

  val runsTestSql: String = {
    val dollars = PortableSql.intDiv("rev_cents", "100")
    val mid = PortableSql.intDiv("m + 1", "2")
    s"""WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |x AS (SELECT d, $dollars AS x FROM rev),
      |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM x),
      |md AS (
      |  SELECT x AS med FROM
      |    (SELECT x, CAST(row_number() OVER (ORDER BY x, d) AS BIGINT) AS i
      |     FROM x) r, mm
      |  WHERE i = $mid),
      |sg AS (
      |  SELECT d, CASE WHEN x > med THEN 1 ELSE -1 END AS sgn
      |  FROM x, md WHERE x <> med),
      |br AS (
      |  SELECT sgn,
      |    CASE WHEN LAG(sgn) OVER (ORDER BY d) IS NULL
      |           OR LAG(sgn) OVER (ORDER BY d) <> sgn
      |         THEN 1 ELSE 0 END AS brk
      |  FROM sg),
      |agg AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |    CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
      |    CAST(SUM(brk) AS BIGINT) AS n_runs
      |  FROM br)
      |SELECT n_pos, n_neg, n_runs,
      |  CASE WHEN n_pos > 0 AND n_neg > 0
      |         AND 2 * n_pos * n_neg > n_pos + n_neg THEN
      |    (CAST(n_runs AS DOUBLE)
      |      - (1.0 + 2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
      |          / CAST(n_pos + n_neg AS DOUBLE)))
      |    / sqrt((2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
      |        * (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
      |           - CAST(n_pos + n_neg AS DOUBLE)))
      |       / (CAST(n_pos + n_neg AS DOUBLE) * CAST(n_pos + n_neg AS DOUBLE)
      |          * (CAST(n_pos + n_neg AS DOUBLE) - 1.0)))
      |  ELSE NULL END AS z
      |FROM agg""".stripMargin
  }

  // --- Spearman rank correlation over the day grid ----------------------------
  /** Spearman rank correlation between daily revenue and daily order
    * count — "do busier days make proportionally more money" measured
    * robustly (Spearman 1904): Pearson over DOUBLED average ranks (the
    * [[Drift.mannWhitney]] tie trick keeps tied ranks integer-exact),
    * computed on the day grid where rank³-scale moments stay far
    * inside BIGINT (the fact-table version would overflow — that
    * restriction is exactly why this runs on the aggregate).
    */
  def spearmanDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = Graft.materialize(Tables.load(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        cents(col("o_totalprice")).as("c"))
      .groupBy(col("d"))
      .agg(sum(col("c")).as("rev"), count(lit(1)).as("cnt")))
    // doubled average rank of v within the grid: 2·rank_avg =
    // 2·(count of smaller) + (count of equal) + 1 — exact integers via
    // two window counts
    def drank(v: Column, out: String): Column = {
      val wLess = Window.orderBy(v).rangeBetween(Window.unboundedPreceding, -1)
      val wAll = Window.orderBy(v).rangeBetween(Window.unboundedPreceding,
        Window.currentRow)
      (lit(2L) * coalesce(count(lit(1)).over(wLess), lit(0L))
        + (count(lit(1)).over(wAll) - count(lit(1)).over(wLess)) + 1L).as(out)
    }
    val ranked = daily
      .withColumn("ra", drank(col("rev"), "ra"))
      .withColumn("rb", drank(col("cnt"), "rb"))
    ranked.agg(count(lit(1)).as("n"), sum(col("ra")).as("sa"),
      sum(col("rb")).as("sb"), sum(col("ra") * col("rb")).as("sab"),
      sum(col("ra") * col("ra")).as("saa"),
      sum(col("rb") * col("rb")).as("sbb"))
      .select(col("n").as("n_days"),
        ((col("n").cast("double") * col("sab").cast("double")
          - col("sa").cast("double") * col("sb").cast("double"))
          / sqrt((col("n").cast("double") * col("saa").cast("double")
            - col("sa").cast("double") * col("sa").cast("double"))
            * (col("n").cast("double") * col("sbb").cast("double")
              - col("sb").cast("double") * col("sb").cast("double"))))
          .as("rho"))
  }

  val spearmanDailySql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1),
      |rk AS (
      |  SELECT
      |    2 * (CAST(COUNT(*) OVER (ORDER BY rev RANGE BETWEEN UNBOUNDED
      |           PRECEDING AND CURRENT ROW) AS BIGINT)
      |         - CAST(COUNT(*) OVER (ORDER BY rev RANGE BETWEEN CURRENT ROW
      |           AND CURRENT ROW) AS BIGINT))
      |      + CAST(COUNT(*) OVER (ORDER BY rev RANGE BETWEEN CURRENT ROW
      |          AND CURRENT ROW) AS BIGINT) + 1 AS ra,
      |    2 * (CAST(COUNT(*) OVER (ORDER BY cnt RANGE BETWEEN UNBOUNDED
      |           PRECEDING AND CURRENT ROW) AS BIGINT)
      |         - CAST(COUNT(*) OVER (ORDER BY cnt RANGE BETWEEN CURRENT ROW
      |           AND CURRENT ROW) AS BIGINT))
      |      + CAST(COUNT(*) OVER (ORDER BY cnt RANGE BETWEEN CURRENT ROW
      |          AND CURRENT ROW) AS BIGINT) + 1 AS rb
      |  FROM daily),
      |mo AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(ra) AS BIGINT) AS sa,
      |    CAST(SUM(rb) AS BIGINT) AS sb, CAST(SUM(ra * rb) AS BIGINT) AS sab,
      |    CAST(SUM(ra * ra) AS BIGINT) AS saa,
      |    CAST(SUM(rb * rb) AS BIGINT) AS sbb
      |  FROM rk)
      |SELECT n AS n_days,
      |  (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
      |     - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
      |  / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
      |       - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
      |     * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
      |       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS rho
      |FROM mo""".stripMargin

  val autocorrelationSql: String = {
    val dollars = PortableSql.intDiv("rev_cents", "100")
    s"""WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |x AS (SELECT d, $dollars AS x FROM rev),
      |l AS (SELECT x,
      |        lead(x, 1) OVER (ORDER BY d) AS y1,
      |        lead(x, 7) OVER (ORDER BY d) AS y7
      |      FROM x),
      |d18 AS (SELECT x, y1, y7,
      |          CAST(x AS DECIMAL(18,0)) AS xd,
      |          CAST(y1 AS DECIMAL(18,0)) AS y1d,
      |          CAST(y7 AS DECIMAL(18,0)) AS y7d
      |        FROM l),
      |legs AS (
      |  SELECT CAST(1 AS BIGINT) AS lag, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y1) AS BIGINT) AS sy,
      |    SUM(xd * y1d) AS sxy,
      |    SUM(xd * xd) AS sxx,
      |    SUM(y1d * y1d) AS syy
      |  FROM d18 WHERE y1 IS NOT NULL
      |  UNION ALL
      |  SELECT 7, CAST(COUNT(*) AS BIGINT), CAST(SUM(x) AS BIGINT),
      |    CAST(SUM(y7) AS BIGINT), SUM(xd * y7d),
      |    SUM(xd * xd),
      |    SUM(y7d * y7d)
      |  FROM d18 WHERE y7 IS NOT NULL)
      |SELECT lag, n,
      |  (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |  / sqrt((CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |     * (CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
      |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS acf
      |FROM legs ORDER BY lag""".stripMargin
  }

  // --- Ljung–Box portmanteau whiteness test ---------------------------------
  /** Ljung–Box Q over the daily-revenue series at lags 1..10 (Ljung &
    * Box, Biometrika 1978): per lag the STANDARD sample
    * autocorrelation r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²
    * (full-series mean and denominator — the estimator the test is
    * defined over, unlike [[autocorrelation]]'s per-leg Pearson), and
    * the running portmanteau Q_h = n(n+2)·Σ_{k≤h} r_k²/(n−k) — the
    * one-number "is anything left after my model" read, cumulated so
    * each row IS the test at horizon h.
    *
    * Determinism: all moments are exact — n, Σx, per-lag pair sums as
    * BIGINTs and the second moments (Σx², Σx_t·x_{t+k}) in
    * DECIMAL(18,0) ([[autocorrelation]]'s decimal-moments rule, since
    * daily dollars² · series length outruns BIGINT near SF 0.7) — and
    * r_k expands around those sums:
    * r_k = (c_k − x̄(a_k+b_k) + m_k·x̄²)/D, a FIXED IEEE sequence
    * spelled identically in the oracle. The cumulative Q adds the
    * per-lag terms in lag order on both engines (running-frame window
    * over the 10-row lag grid), so even the double summation order is
    * pinned.
    *
    * Shape: one fact-table aggregation to the day series
    * (materialized — the global moments and every lag leg read the
    * SAME checkpoint), ONE window pass producing all ten leads, a
    * posexplode to (lag, x, y) pairs, one lag-keyed aggregation, and
    * window arithmetic on the 10-row grid. The single-partition
    * windows touch only day-cardinality (bounded) and 10-row inputs.
    */
  def ljungBox(s: SparkSession, dir: String, maxLag: Int = 10): DataFrame = {
    val wOrd = Window.orderBy(col("d"))
    val withLeads = (1 to maxLag).foldLeft(
      dailyRevenue(s, dir).withColumn("x", expr("rev_cents div 100"))) {
      case (df, k) => df.withColumn(s"y$k", lead(col("x"), k).over(wOrd))
    }
    val series = Graft.materialize(withLeads)
    val xd = col("x").cast("decimal(18,0)")
    val g = series.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(xd * xd).as("sxx"))
    val pairs = series
      .select(col("x"),
        posexplode(array((1 to maxLag).map(k => col(s"y$k")): _*))
          .as(Seq("p", "y")))
      .filter(col("y").isNotNull)
      .select((col("p") + 1).cast("long").as("lag"), col("x"), col("y"))
    val perLag = pairs
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("m"), sum(col("x")).as("a"),
        sum(col("y")).as("b"),
        sum(xd * col("y").cast("decimal(18,0)")).as("c"))
      .crossJoin(broadcast(g))
    val nd = col("n").cast("double")
    val xb = col("sx").cast("double") / nd
    // outer parens matter: a line break before the `-` would otherwise
    // end the statement and silently discard the mean-correction term
    val den = (col("sxx").cast("double")
      - col("sx").cast("double") * col("sx").cast("double") / nd)
    val acf = (col("c").cast("double")
      - xb * (col("a").cast("double") + col("b").cast("double"))
      + col("m").cast("double") * xb * xb) / den
    val wCum = Window.orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perLag
      .select(col("lag"), col("m").as("n_pairs"), col("n"), acf.as("acf"))
      .withColumn("cum",
        sum(col("acf") * col("acf")
          / (col("n").cast("double") - col("lag").cast("double"))).over(wCum))
      .select(col("lag"), col("n_pairs"), col("acf"),
        (col("n").cast("double") * (col("n").cast("double") + lit(2.0))
          * col("cum")).as("q_lb"))
      .orderBy(col("lag"))
  }

  val ljungBoxSql: String = {
    val dollars = PortableSql.intDiv("rev_cents", "100")
    val lagRows = (1 to 10).map(k => s"($k)").mkString(", ")
    s"""WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |x AS (SELECT d, $dollars AS x FROM rev),
      |g AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |    SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx
      |  FROM x),
      |ks AS (SELECT CAST(lag AS BIGINT) AS lag FROM (VALUES $lagRows) t(lag)),
      |xr AS (SELECT x, row_number() OVER (ORDER BY d) AS rn FROM x),
      |pairs AS (
      |  SELECT k.lag, a.x AS x, b.x AS y
      |  FROM xr a JOIN ks k ON true JOIN xr b ON b.rn = a.rn + k.lag),
      |p AS (
      |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS m,
      |    CAST(SUM(x) AS BIGINT) AS a, CAST(SUM(y) AS BIGINT) AS b,
      |    SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS c
      |  FROM pairs GROUP BY lag),
      |r AS (
      |  SELECT lag, m AS n_pairs, n,
      |    (CAST(CAST(c AS VARCHAR) AS DOUBLE)
      |       - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |         * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
      |       + CAST(m AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |         * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      |    / (CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |      AS acf
      |  FROM p CROSS JOIN g),
      |q AS (
      |  SELECT lag, n_pairs, acf,
      |    SUM(acf * acf / (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE)))
      |      OVER (ORDER BY lag ROWS BETWEEN UNBOUNDED PRECEDING
      |            AND CURRENT ROW) AS cum,
      |    n
      |  FROM r)
      |SELECT lag, n_pairs, acf,
      |  CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * cum AS q_lb
      |FROM q ORDER BY lag""".stripMargin
  }

  // --- partial autocorrelation (Durbin–Levinson) -------------------------------
  /** PACF of daily revenue at lags 1..3 via the Durbin–Levinson
    * recursion (Durbin, Biometrika 1960; Box & Jenkins 1970 ch. 3) on
    * the STANDARD sample ACF — the AR-order read a forecaster takes
    * after [[ljungBox]] says structure exists: pacf(k) is the lag-k
    * correlation with lags 1..k−1 regressed out, so an AR(p) series
    * cuts off after lag p where the raw ACF only decays.
    *
    * Estimator: the same full-series-mean r_k as [[ljungBox]] (the one
    * the recursion is defined over), expanded around exact moments —
    * n, Σx, per-lag pair sums as BIGINTs, second moments in
    * DECIMAL(18,0) — then
    *   φ₁₁ = r₁;  φ₂₂ = (r₂ − r₁²)/(1 − r₁²);  φ₂₁ = r₁ − φ₂₂r₁;
    *   φ₃₃ = (r₃ − φ₂₁r₂ − φ₂₂r₁)/(1 − φ₂₁r₁ − φ₂₂r₂)
    * — a FIXED sequence of IEEE ops on bit-identical doubles, spelled
    * in the same order in the oracle (and re-derived from first
    * principles in StatsReplaySpec). Degenerate denominators (constant
    * series, |r₁| = 1) yield NULL, never NaN. Lag depth is FIXED at 3:
    * the recursion's closed form is written out per lag, so a
    * parameterized depth would be exactly the silent-divergence class
    * the r13 advice banned.
    *
    * Shape: [[ljungBox]]'s — one fact-table fold to the day grid,
    * one materialized lead pass, a lag-keyed aggregation, then the
    * 3-row lag grid pivots onto ONE row via conditional single-term
    * sums (the fixed-order pivot discipline) where the recursion runs.
    */
  def pacf(s: SparkSession, dir: String): DataFrame = {
    val maxLag = 3
    val wOrd = Window.orderBy(col("d"))
    val withLeads = (1 to maxLag).foldLeft(
      dailyRevenue(s, dir).withColumn("x", expr("rev_cents div 100"))) {
      case (df, k) => df.withColumn(s"y$k", lead(col("x"), k).over(wOrd))
    }
    val series = Graft.materialize(withLeads)
    val xd = col("x").cast("decimal(18,0)")
    val g = series.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(xd * xd).as("sxx"))
    val pairs = series
      .select(col("x"),
        posexplode(array((1 to maxLag).map(k => col(s"y$k")): _*))
          .as(Seq("p", "y")))
      .filter(col("y").isNotNull)
      .select((col("p") + 1).cast("long").as("lag"), col("x"), col("y"))
    val nd = col("n").cast("double")
    val xb = col("sx").cast("double") / nd
    val den = (col("sxx").cast("double")
      - col("sx").cast("double") * col("sx").cast("double") / nd)
    val acf = (col("c").cast("double")
      - xb * (col("a").cast("double") + col("b").cast("double"))
      + col("m").cast("double") * xb * xb) / den
    val perLag = pairs
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("m"), sum(col("x")).as("a"),
        sum(col("y")).as("b"),
        sum(xd * col("y").cast("decimal(18,0)")).as("c"))
      .crossJoin(broadcast(g))
      .select(col("lag"), col("n"), when(den =!= 0.0, acf).as("r"))
    val piv = perLag.groupBy(col("n").as("n_days"))
      .agg(sum(when(col("lag") === 1, col("r"))).as("r1"),
        sum(when(col("lag") === 2, col("r"))).as("r2"),
        sum(when(col("lag") === 3, col("r"))).as("r3"))
    val r1 = col("r1"); val r2 = col("r2"); val r3 = col("r3")
    val den2 = lit(1.0) - r1 * r1
    val p2 = when(den2 =!= 0.0, (r2 - r1 * r1) / den2)
    val p21 = r1 - p2 * r1
    val den3 = (lit(1.0) - p21 * r1 - p2 * r2)
    val p3 = when(den3 =!= 0.0, (r3 - p21 * r2 - p2 * r1) / den3)
    piv.select(col("n_days"), r1.as("acf1"), r2.as("acf2"), r3.as("acf3"),
      p2.as("pacf2"), p3.as("pacf3"))
  }

  val pacfSql: String = {
    val dollars = PortableSql.intDiv("rev_cents", "100")
    // the r CTE, dl chain, and final projection spell every double op
    // in the Scala Column order (left-assoc, same parenthesization) —
    // see the [[pacf]] scaladoc
    s"""WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |x AS (SELECT d, $dollars AS x FROM rev),
      |g AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |    SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx
      |  FROM x),
      |ks AS (SELECT CAST(lag AS BIGINT) AS lag FROM (VALUES (1), (2), (3)) t(lag)),
      |xr AS (SELECT x, row_number() OVER (ORDER BY d) AS rn FROM x),
      |pairs AS (
      |  SELECT k.lag, a.x AS x, b.x AS y
      |  FROM xr a JOIN ks k ON true JOIN xr b ON b.rn = a.rn + k.lag),
      |p AS (
      |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS m,
      |    CAST(SUM(x) AS BIGINT) AS a, CAST(SUM(y) AS BIGINT) AS b,
      |    SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS c
      |  FROM pairs GROUP BY lag),
      |r AS (
      |  SELECT lag, n,
      |    CASE WHEN (CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
      |                 / CAST(n AS DOUBLE)) <> 0 THEN
      |      (CAST(CAST(c AS VARCHAR) AS DOUBLE)
      |         - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |           * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
      |         + CAST(m AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |           * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
      |      / (CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |    ELSE NULL END AS r
      |  FROM p CROSS JOIN g),
      |piv AS (
      |  SELECT n AS n_days,
      |    SUM(CASE WHEN lag = 1 THEN r END) AS r1,
      |    SUM(CASE WHEN lag = 2 THEN r END) AS r2,
      |    SUM(CASE WHEN lag = 3 THEN r END) AS r3
      |  FROM r GROUP BY n),
      |dl AS (
      |  SELECT n_days, r1, r2, r3,
      |    CASE WHEN 1.0 - r1 * r1 <> 0
      |         THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END AS p2
      |  FROM piv),
      |dl2 AS (SELECT n_days, r1, r2, r3, p2, r1 - p2 * r1 AS p21 FROM dl)
      |SELECT n_days, r1 AS acf1, r2 AS acf2, r3 AS acf3, p2 AS pacf2,
      |  CASE WHEN (1.0 - p21 * r1 - p2 * r2) <> 0
      |       THEN (r3 - p21 * r2 - p2 * r1) / (1.0 - p21 * r1 - p2 * r2)
      |  END AS pacf3
      |FROM dl2""".stripMargin
  }

  // --- cross-correlation between two daily series -------------------------------
  /** Sample cross-correlation function (CCF) between the daily ORDER
    * COUNT and daily REVENUE series at lags −3..+3 (Box & Jenkins 1970
    * ch. 11 — the lead/lag read behind "does volume move before
    * money"): ccf(k) = Σ_t (x_t − x̄)(y_{t+k} − ȳ) / √(Σ(x−x̄)²·Σ(y−ȳ)²),
    * full-series means and denominators, overlap-only numerator — so
    * lag 0 is the plain Pearson of the aligned series and the sign of
    * the peak lag says which series leads.
    *
    * Exactness: the [[ljungBox]] discipline — n, Σx, Σy and per-lag
    * pair sums exact BIGINTs, second moments (Σx², Σy², Σx·y_{t+k}) in
    * DECIMAL(18,0), numerator expanded around those sums
    * (c − ȳa − x̄b + m·x̄ȳ) in a fixed IEEE order the oracle spells
    * identically; VARCHAR-routed decimal→double casts. A constant
    * series (either denominator 0) yields NULL, never NaN.
    *
    * Shape: one fact fold to the day grid; ONE materialized lead pass
    * produces x/y leads 1..3; pairs explode to (lag, px, py) rows
    * (negative lags pair the LED x against the current y — same
    * multiset as lagging y); one lag-keyed aggregation; the global
    * moments broadcast from the same checkpoint. Windows touch only
    * day cardinality.
    */
  def crossCorrelation(s: SparkSession, dir: String): DataFrame = {
    val maxLag = 3
    val wOrd = Window.orderBy(col("d"))
    val base = Tables.load(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("d"), cents(col("o_totalprice")).as("c"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("x"), expr("sum(c) div 100").as("y"))
    val withLeads = (1 to maxLag).foldLeft(base) { case (df, k) =>
      df.withColumn(s"x$k", lead(col("x"), k).over(wOrd))
        .withColumn(s"y$k", lead(col("y"), k).over(wOrd))
    }
    val series = Graft.materialize(withLeads)
    val d18 = (c: Column) => c.cast("decimal(18,0)")
    val g = series.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(d18(col("x")) * d18(col("x"))).as("sxx"),
      sum(d18(col("y")) * d18(col("y"))).as("syy"))
    val entries =
      Seq(struct(lit(0L).as("lag"), col("x").as("px"), col("y").as("py"))) ++
      (1 to maxLag).map(k =>
        struct(lit(k.toLong).as("lag"), col("x").as("px"), col(s"y$k").as("py"))) ++
      (1 to maxLag).map(k =>
        struct(lit(-k.toLong).as("lag"), col(s"x$k").as("px"), col("y").as("py")))
    val pairs = series
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.lag").as("lag"), col("e.px").as("px"), col("e.py").as("py"))
      .filter(col("px").isNotNull && col("py").isNotNull)
    val perLag = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("m"), sum(col("px")).as("a"), sum(col("py")).as("b"),
        sum(d18(col("px")) * d18(col("py"))).as("c"))
      .crossJoin(broadcast(g))
    val nd = col("n").cast("double")
    val xb = col("sx").cast("double") / nd
    val yb = col("sy").cast("double") / nd
    val denx = (col("sxx").cast("double")
      - col("sx").cast("double") * col("sx").cast("double") / nd)
    val deny = (col("syy").cast("double")
      - col("sy").cast("double") * col("sy").cast("double") / nd)
    val num = (col("c").cast("double")
      - yb * col("a").cast("double")
      - xb * col("b").cast("double")
      + col("m").cast("double") * xb * yb)
    perLag.select(col("lag"), col("m").as("n_pairs"),
        when(denx * deny > 0.0, num / sqrt(denx * deny))
          .otherwise(lit(null).cast("double")).as("ccf"))
      .orderBy(col("lag"))
  }

  // --- Granger causality (lag 1) ----------------------------------------------
  /** Lag-1 Granger causality test of "does yesterday's ORDER COUNT
    * help predict today's REVENUE beyond yesterday's revenue?"
    * (Granger, Econometrica 1969): restricted OLS y_t ~ y_{t-1} vs
    * unrestricted y_t ~ y_{t-1} + x_{t-1}, F = (SSR_r − SSR_u)·(m−3)
    * / SSR_u with 1 numerator df — the causal-screening read a
    * forecasting pipeline runs before admitting a covariate into the
    * model ([[crossCorrelation]] measures association at lags; this
    * asks whether the lagged covariate adds PREDICTIVE power).
    *
    * Exactness ([[Drift]] discipline): both series are exact integers
    * (day counts; cents-summed revenue div 100), every raw moment is
    * an exact DECIMAL(18,0)-product sum VARCHAR-routed to double, the
    * centered moments and the closed-form 2-regressor normal-equation
    * solve (b = M⁻¹ S via the 2×2 determinant) are one shared IEEE
    * chain — both engines compute each centered moment ONCE and reuse
    * it, so F hash-matches bit-for-bit.
    *
    * Scale: the fact table folds to the day grid first; the lag
    * window and 1-row moment reduce run on day-cardinality rows
    * (the [[TimeSeries]] bounded-grid posture).
    */
  def grangerLag1(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.orderBy(col("d"))
    val base = Tables.load(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        cents(col("o_totalprice")).as("c"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("x"), expr("sum(c) div 100").as("y"))
    val pairs = base
      .withColumn("yl", lag(col("y"), 1).over(wOrd))
      .withColumn("xl", lag(col("x"), 1).over(wOrd))
      .filter(col("yl").isNotNull && col("xl").isNotNull)
    val d18 = (c: Column) => c.cast("decimal(18,0)")
    val dbl = (c: Column) => c.cast("string").cast("double")
    val g = pairs.agg(count(lit(1)).as("m"),
      sum(col("y")).as("sy"), sum(col("yl")).as("syl"),
      sum(col("xl")).as("sxl"),
      sum(d18(col("y")) * d18(col("y"))).as("syy"),
      sum(d18(col("y")) * d18(col("yl"))).as("syyl"),
      sum(d18(col("y")) * d18(col("xl"))).as("syxl"),
      sum(d18(col("yl")) * d18(col("yl"))).as("sylyl"),
      sum(d18(col("yl")) * d18(col("xl"))).as("sylxl"),
      sum(d18(col("xl")) * d18(col("xl"))).as("sxlxl"))
    val md = col("m").cast("double")
    val cm = g.select(col("m"),
      (dbl(col("syy")) - col("sy").cast("double") * col("sy").cast("double") / md).as("cyy"),
      (dbl(col("sylyl")) - col("syl").cast("double") * col("syl").cast("double") / md).as("c11"),
      (dbl(col("sxlxl")) - col("sxl").cast("double") * col("sxl").cast("double") / md).as("c22"),
      (dbl(col("sylxl")) - col("syl").cast("double") * col("sxl").cast("double") / md).as("c12"),
      (dbl(col("syyl")) - col("syl").cast("double") * col("sy").cast("double") / md).as("c1y"),
      (dbl(col("syxl")) - col("sxl").cast("double") * col("sy").cast("double") / md).as("c2y"))
    val det = col("c11") * col("c22") - col("c12") * col("c12")
    val sol = cm.select(col("m"), col("cyy"), col("c11"), col("c1y"),
      ((col("c1y") * col("c22") - col("c2y") * col("c12")) / det).as("b1"),
      ((col("c2y") * col("c11") - col("c1y") * col("c12")) / det).as("b2"),
      det.as("det"), col("c2y"))
    sol.select(col("m").as("n_pairs"),
      col("b1").as("beta_ylag"), col("b2").as("gamma_xlag"),
      when(col("det") > 0.0 && col("c11") > 0.0
          && col("cyy") - (col("b1") * col("c1y") + col("b2") * col("c2y")) > 0.0,
        ((col("cyy") - col("c1y") * col("c1y") / col("c11"))
          - (col("cyy") - (col("b1") * col("c1y") + col("b2") * col("c2y"))))
          * (col("m").cast("double") - lit(3.0))
          / (col("cyy") - (col("b1") * col("c1y") + col("b2") * col("c2y"))))
        .otherwise(lit(null).cast("double")).as("f_stat"))
  }

  val grangerLag1Sql: String = {
    val dollars = PortableSql.intDiv("rev_cents", "100")
    s"""WITH day AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS x,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |xy AS (SELECT d, x, $dollars AS y FROM day),
      |lagged AS (
      |  SELECT y,
      |    LAG(y, 1) OVER (ORDER BY d) AS yl,
      |    LAG(x, 1) OVER (ORDER BY d) AS xl
      |  FROM xy),
      |pairs AS (SELECT y, yl, xl FROM lagged
      |          WHERE yl IS NOT NULL AND xl IS NOT NULL),
      |g AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
      |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(yl) AS BIGINT) AS syl,
      |    CAST(SUM(xl) AS BIGINT) AS sxl,
      |    SUM(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS syy,
      |    SUM(CAST(y AS DECIMAL(18,0)) * CAST(yl AS DECIMAL(18,0))) AS syyl,
      |    SUM(CAST(y AS DECIMAL(18,0)) * CAST(xl AS DECIMAL(18,0))) AS syxl,
      |    SUM(CAST(yl AS DECIMAL(18,0)) * CAST(yl AS DECIMAL(18,0))) AS sylyl,
      |    SUM(CAST(yl AS DECIMAL(18,0)) * CAST(xl AS DECIMAL(18,0))) AS sylxl,
      |    SUM(CAST(xl AS DECIMAL(18,0)) * CAST(xl AS DECIMAL(18,0))) AS sxlxl
      |  FROM pairs),
      |cm AS (
      |  SELECT m,
      |    CAST(CAST(syy AS VARCHAR) AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(m AS DOUBLE) AS cyy,
      |    CAST(CAST(sylyl AS VARCHAR) AS DOUBLE)
      |      - CAST(syl AS DOUBLE) * CAST(syl AS DOUBLE) / CAST(m AS DOUBLE) AS c11,
      |    CAST(CAST(sxlxl AS VARCHAR) AS DOUBLE)
      |      - CAST(sxl AS DOUBLE) * CAST(sxl AS DOUBLE) / CAST(m AS DOUBLE) AS c22,
      |    CAST(CAST(sylxl AS VARCHAR) AS DOUBLE)
      |      - CAST(syl AS DOUBLE) * CAST(sxl AS DOUBLE) / CAST(m AS DOUBLE) AS c12,
      |    CAST(CAST(syyl AS VARCHAR) AS DOUBLE)
      |      - CAST(syl AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(m AS DOUBLE) AS c1y,
      |    CAST(CAST(syxl AS VARCHAR) AS DOUBLE)
      |      - CAST(sxl AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(m AS DOUBLE) AS c2y
      |  FROM g),
      |sol AS (
      |  SELECT m, cyy, c11, c1y, c2y,
      |    (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
      |    (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2,
      |    c11 * c22 - c12 * c12 AS det
      |  FROM cm)
      |SELECT m AS n_pairs, b1 AS beta_ylag, b2 AS gamma_xlag,
      |  CASE WHEN det > 0 AND c11 > 0
      |        AND cyy - (b1 * c1y + b2 * c2y) > 0 THEN
      |    ((cyy - c1y * c1y / c11) - (cyy - (b1 * c1y + b2 * c2y)))
      |      * (CAST(m AS DOUBLE) - 3.0) / (cyy - (b1 * c1y + b2 * c2y))
      |  ELSE NULL END AS f_stat
      |FROM sol""".stripMargin
  }

  val crossCorrelationSql: String = {
    val dollars = PortableSql.intDiv("rev_cents", "100")
    s"""WITH day AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS x,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |xy AS (SELECT d, x, $dollars AS y FROM day),
      |g AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx,
      |    SUM(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS syy
      |  FROM xy),
      |ks AS (SELECT CAST(lag AS BIGINT) AS lag
      |       FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) t(lag)),
      |xr AS (SELECT x, y, row_number() OVER (ORDER BY d) AS rn FROM xy),
      |pairs AS (
      |  SELECT k.lag, a.x AS px, b.y AS py
      |  FROM xr a JOIN ks k ON true JOIN xr b ON b.rn = a.rn + k.lag),
      |p AS (
      |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS m,
      |    CAST(SUM(px) AS BIGINT) AS a, CAST(SUM(py) AS BIGINT) AS b,
      |    SUM(CAST(px AS DECIMAL(18,0)) * CAST(py AS DECIMAL(18,0))) AS c
      |  FROM pairs GROUP BY lag)
      |SELECT lag, m AS n_pairs,
      |  CASE WHEN (CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |           * (CAST(CAST(syy AS VARCHAR) AS DOUBLE)
      |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
      |           > 0 THEN
      |    (CAST(CAST(c AS VARCHAR) AS DOUBLE)
      |       - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(a AS DOUBLE)
      |       - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(b AS DOUBLE)
      |       + CAST(m AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |         * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
      |    / sqrt((CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |           * (CAST(CAST(syy AS VARCHAR) AS DOUBLE)
      |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
      |  ELSE NULL END AS ccf
      |FROM p CROSS JOIN g ORDER BY lag""".stripMargin
  }

  // --- Kendall tau-b between two daily series ---------------------------------
  /** Exact Kendall rank correlation (tau-b, the tie-corrected form;
    * Kendall, Biometrika 1938 / 1945) between the daily ORDER COUNT and
    * the daily REVENUE series — the robust association read between two
    * operational metrics ([[spearmanDaily]] is the rank-linear
    * companion; tau answers "how often do the two metrics move the same
    * way", with an interpretable probability scale). tau_b =
    * (C − D) / √((n₀−t_x)(n₀−t_y)) over all day pairs, where t_x / t_y
    * are same-value pair counts of each series.
    *
    * Exactness: C, D, tie counts, and n₀ are exact BIGINTs from integer
    * comparisons (counts and cents); (n₀−t_x)(n₀−t_y) ≤ n₀² ≈ 8.4e12
    * for a 7-year calendar — exactly representable in a double — so the
    * √ and the one division are single-rounded IEEE on bit-identical
    * inputs. A constant series (either factor 0) yields NULL, not NaN.
    *
    * Shape: the fact table folds to the day grid first (one map-side
    * combined aggregation); pairing is [[theilSen]]'s bounded
    * broadcast nested-loop over the CALENDAR grid (span², never data
    * volume) — the fact table itself never joins.
    */
  def kendallTau(s: SparkSession, dir: String): DataFrame = {
    val series = Graft.materialize(
      Tables.load(s, dir, "orders")
        .select(to_date(col("o_orderdate")).as("d"),
          cents(col("o_totalprice")).as("c"))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("x"), sum(col("c")).as("y")))
    val pairs = series.select(col("d").as("da"), col("x").as("xa"),
        col("y").as("ya"))
      .join(broadcast(series.select(col("d").as("db"), col("x").as("xb"),
        col("y").as("yb"))), col("da") < col("db"))
    val sign = (p: Column, q: Column) => signum(p - q).cast("long")
    val agg = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(sign(col("xb"), col("xa")) * sign(col("yb"), col("ya")) === 1L,
        1L).otherwise(0L)).as("concordant"),
      sum(when(sign(col("xb"), col("xa")) * sign(col("yb"), col("ya")) === -1L,
        1L).otherwise(0L)).as("discordant"),
      sum(when(col("xb") === col("xa"), 1L).otherwise(0L)).as("ties_x"),
      sum(when(col("yb") === col("ya"), 1L).otherwise(0L)).as("ties_y"))
    agg.select(col("n_pairs"), col("concordant"), col("discordant"),
      col("ties_x"), col("ties_y"),
      when((col("n_pairs") > col("ties_x")) && (col("n_pairs") > col("ties_y")),
        (col("concordant") - col("discordant")).cast("double")
          / sqrt(((col("n_pairs") - col("ties_x"))
            * (col("n_pairs") - col("ties_y"))).cast("double")))
        .otherwise(lit(null).cast("double")).as("tau_b"))
  }

  val kendallTauSql: String =
    """WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS x,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |p AS (
      |  SELECT
      |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    CAST(SUM(CASE WHEN sign(b.x - a.x) * sign(b.y - a.y) = 1
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
      |    CAST(SUM(CASE WHEN sign(b.x - a.x) * sign(b.y - a.y) = -1
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
      |    CAST(SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
      |    CAST(SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT) AS ties_y
      |  FROM rev a JOIN rev b ON a.d < b.d)
      |SELECT n_pairs, concordant, discordant, ties_x, ties_y,
      |  CASE WHEN n_pairs > ties_x AND n_pairs > ties_y THEN
      |    CAST(concordant - discordant AS DOUBLE)
      |      / sqrt(CAST((n_pairs - ties_x) * (n_pairs - ties_y) AS DOUBLE))
      |  ELSE NULL END AS tau_b
      |FROM p""".stripMargin

  // --- turning points ---------------------------------------------------------
  /** Turning-point census of daily revenue, per calendar year: counts
    * of strict local maxima and minima among each year's INTERIOR days
    * (both neighbors present and inside the year), and the
    * turning-point share t/(n−2) — under the i.i.d. null the expected
    * share is 2/3 (Kendall & Stuart, The Advanced Theory of
    * Statistics, vol. 3: E[t] = 2(n−2)/3), so a materially lower share
    * reads as trend/seasonality persistence and a higher one as
    * oscillation. Complements [[runsTest]] (which signs against the
    * global median) with a purely LOCAL randomness read.
    *
    * Exactness: strict integer comparisons on exact cents; the share
    * is one IEEE division of exact integers. Plateaus produce no
    * turning point on either engine (strict `<`/`>`).
    *
    * Shape: fact table → day grid (one aggregation); lag/lead windows
    * are PARTITIONED by year (never global), then a per-year rollup of
    * the bounded grid. Nothing past the first exchange scales with SF.
    */
  def turningPoints(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("yr")).orderBy(col("d"))
    dailyRevenue(s, dir)
      .withColumn("yr", year(col("d")).cast("long"))
      .select(col("yr"), col("d"), col("rev_cents"),
        lag(col("rev_cents"), 1).over(w).as("prev"),
        lead(col("rev_cents"), 1).over(w).as("next"))
      .groupBy(col("yr"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(when(col("prev").isNotNull && col("next").isNotNull
          && col("rev_cents") > col("prev") && col("rev_cents") > col("next"),
          1L).otherwise(0L)).as("n_peaks"),
        sum(when(col("prev").isNotNull && col("next").isNotNull
          && col("rev_cents") < col("prev") && col("rev_cents") < col("next"),
          1L).otherwise(0L)).as("n_valleys"))
      .select(col("yr"), col("n_days"), col("n_peaks"), col("n_valleys"),
        (col("n_peaks") + col("n_valleys")).as("n_turning"),
        when(col("n_days") > 2,
          (col("n_peaks") + col("n_valleys")).cast("double")
            / (col("n_days") - 2L).cast("double"))
          .otherwise(lit(null).cast("double")).as("turning_share"))
      .orderBy(col("yr"))
  }

  val turningPointsSql: String =
    """WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |lagged AS (
      |  SELECT CAST(year(d) AS BIGINT) AS yr, d, rev_cents,
      |    lag(rev_cents) OVER w AS prev, lead(rev_cents) OVER w AS next
      |  FROM rev
      |  WINDOW w AS (PARTITION BY year(d) ORDER BY d)),
      |g AS (
      |  SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(CASE WHEN prev IS NOT NULL AND next IS NOT NULL
      |                   AND rev_cents > prev AND rev_cents > next
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks,
      |    CAST(SUM(CASE WHEN prev IS NOT NULL AND next IS NOT NULL
      |                   AND rev_cents < prev AND rev_cents < next
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_valleys
      |  FROM lagged GROUP BY yr)
      |SELECT yr, n_days, n_peaks, n_valleys,
      |  n_peaks + n_valleys AS n_turning,
      |  CASE WHEN n_days > 2 THEN
      |    CAST(n_peaks + n_valleys AS DOUBLE) / CAST(n_days - 2 AS DOUBLE)
      |  ELSE NULL END AS turning_share
      |FROM g ORDER BY yr""".stripMargin

  // --- Lo–MacKinlay variance ratio --------------------------------------------
  /** Variance-ratio test of daily revenue INCREMENTS, per calendar year
    * (Lo & MacKinlay, Rev. Financial Studies 1988): VR(q) =
    * Var(q-day overlapping sums) / (q · Var(1-day increments)). A
    * random walk gives VR ≈ 1; mean reversion pushes it below 1,
    * positive drift persistence above. q = 5 (the trading-week
    * convention).
    *
    * Exactness: increments r_t = rev_t − rev_{t−1} are exact BIGINT
    * cents; the overlapping q-sums are window sums of INTEGERS
    * (order-free — no segment-tree double hazard, unlike the ordered
    * double-cumulation this repo bans past single-digit grids); both
    * second moments accumulate in pairwise DECIMAL(19,0) products
    * (cents² can pass int64 at large SF — the hugeint-path rule), and
    * each variance is the (Σx² − (Σx)²/n)/n chain on exact integers.
    * Var₁ = 0 yields NULL, not NaN.
    *
    * Shape: fact table → day grid; lag + rolling-sum windows
    * PARTITIONED by year; per-year rollup. Calendar-bounded after the
    * first exchange.
    */
  def varianceRatio(s: SparkSession, dir: String, q: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("yr")).orderBy(col("d"))
    val wq = w.rowsBetween(-(q - 1), 0)
    val d19 = (c: Column) => c.cast(DecimalType(19, 0))
    val incr = dailyRevenue(s, dir)
      .withColumn("yr", year(col("d")).cast("long"))
      .withColumn("r", col("rev_cents") - lag(col("rev_cents"), 1).over(w))
      .filter(col("r").isNotNull)
    val sums = incr
      .withColumn("sq", sum(col("r")).over(wq))
      .withColumn("cq", count(lit(1)).over(wq))
    sums.groupBy(col("yr"))
      .agg(
        count(lit(1)).as("n1"),
        sum(col("r")).as("s1"),
        sum(d19(col("r")) * d19(col("r"))).as("ss1"),
        sum(when(col("cq") === q, 1L)).as("nq"),
        sum(when(col("cq") === q, col("sq"))).as("sq1"),
        sum(when(col("cq") === q, d19(col("sq")) * d19(col("sq")))).as("ssq"))
      .select(col("yr"), col("n1"), col("nq"),
        ((col("ss1").cast("double")
          - (col("s1").cast("double") * col("s1").cast("double")
            / col("n1").cast("double"))) / col("n1").cast("double"))
          .as("var_1"),
        ((col("ssq").cast("double")
          - (col("sq1").cast("double") * col("sq1").cast("double")
            / col("nq").cast("double"))) / col("nq").cast("double"))
          .as("var_q"))
      .select(col("yr"), col("n1"), col("nq"), col("var_1"), col("var_q"),
        when(col("var_1") > 0,
          col("var_q") / (lit(q.toDouble) * col("var_1")))
          .otherwise(lit(null).cast("double")).as("vr"))
      .orderBy(col("yr"))
  }

  /** DuckDB twin of [[varianceRatio]], derived from the SAME q so the
    * two spellings cannot drift (the window width, the full-window
    * test, and the q scale factor all depend on it).
    */
  def varianceRatioSql(q: Int = 5): String =
    s"""WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |incr AS (
      |  SELECT CAST(year(d) AS BIGINT) AS yr, d,
      |    rev_cents - lag(rev_cents) OVER
      |      (PARTITION BY year(d) ORDER BY d) AS r
      |  FROM rev),
      |nn AS (SELECT yr, d, r FROM incr WHERE r IS NOT NULL),
      |sums AS (
      |  SELECT yr, r,
      |    SUM(r) OVER w AS sq, COUNT(*) OVER w AS cq
      |  FROM nn
      |  WINDOW w AS (PARTITION BY yr ORDER BY d
      |               ROWS BETWEEN ${q - 1} PRECEDING AND CURRENT ROW)),
      |g AS (
      |  SELECT yr, CAST(COUNT(*) AS BIGINT) AS n1,
      |    CAST(SUM(r) AS BIGINT) AS s1,
      |    SUM(CAST(r AS DECIMAL(19,0)) * CAST(r AS DECIMAL(19,0))) AS ss1,
      |    CAST(SUM(CASE WHEN cq = $q THEN 1 END) AS BIGINT) AS nq,
      |    CAST(SUM(CASE WHEN cq = $q THEN sq END) AS BIGINT) AS sq1,
      |    SUM(CASE WHEN cq = $q
      |        THEN CAST(sq AS DECIMAL(19,0)) * CAST(sq AS DECIMAL(19,0))
      |        END) AS ssq
      |  FROM sums GROUP BY yr),
      |v AS (
      |  SELECT yr, n1, nq,
      |    (CAST(CAST(ss1 AS VARCHAR) AS DOUBLE)
      |       - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
      |          / CAST(n1 AS DOUBLE))) / CAST(n1 AS DOUBLE) AS var_1,
      |    (CAST(CAST(ssq AS VARCHAR) AS DOUBLE)
      |       - (CAST(sq1 AS DOUBLE) * CAST(sq1 AS DOUBLE)
      |          / CAST(nq AS DOUBLE))) / CAST(nq AS DOUBLE) AS var_q
      |  FROM g)
      |SELECT yr, n1, nq, var_1, var_q,
      |  CASE WHEN var_1 > 0 THEN var_q / ($q.0 * var_1) ELSE NULL END AS vr
      |FROM v ORDER BY yr""".stripMargin

  // --- Hurst exponent (rescaled range) ------------------------------------------
  /** HURST EXPONENT of daily revenue by rescaled-range (R/S) analysis
    * (Hurst, Trans. ASCE 1951; Mandelbrot & Wallis 1969): slice the
    * day grid into complete blocks of n ∈ {16, 32, 64, 128} days,
    * compute each block's range-of-cumulative-deviations over its
    * standard deviation, and fit ln E[R/S] against ln n. H ≈ 0.5 is a
    * random walk, H > 0.5 long-range persistence — the read behind
    * "does demand memory exist beyond the seasonal period", a
    * complement of [[varianceRatio]] (which tests ONE aggregation
    * horizon q; R/S sweeps four octaves).
    *
    * Exactness: within a block of FIXED size n, deviations from the
    * block mean scale to exact integers (n·yᵢ − S_b, the Levene-style
    * clear-the-denominator move), so each block's R numerator
    * max(cum) − min(cum) is exact BIGINT; the variance numerator
    * n·Σy² − S² squares in DECIMAL(19,0) (hugeint path — daily cents
    * square past int64 by sf≈1). Per block, R/S is ONE division of
    * exact-derived doubles, logged onto the micronat grid; per-n means
    * are exact-integer sums over the ≤(2400/16)-block grid. The final
    * 4-point log-log slope uses FIXED-ORDER arithmetic on the pivoted
    * single row (conditional 1-term sums, ln-spaced abscissae are
    * literals) — never a float aggregation whose order could differ
    * across engines; ln 2 is the shared literal 0.6931471805599453.
    *
    * Shape: fact table → day grid (one aggregation, calendar-bounded);
    * the grid fans out ×4 block sizes; running sums ride windows
    * PARTITIONED BY (n, block); block rollup and the 4-row pivot are
    * grid-sized. The one global window (day rank) rides the bounded
    * day grid (allowlisted class).
    */
  def hurstRs(s: SparkSession, dir: String): DataFrame = {
    val ns = Seq(16L, 32L, 64L, 128L)
    val grid = dailyRevenue(s, dir)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("d"))).cast("long"))
      .select(col("rn"), col("rev_cents").as("y"))
    val fan = grid
      .select(col("rn"), col("y"), explode(typedLit(ns)).as("n"))
      .withColumn("blk", expr("(rn - 1) div n"))
    val wBlk = Window.partitionBy(col("n"), col("blk"))
    val wRun = wBlk.orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val y19 = col("y").cast("decimal(19,0)")
    val perRow = fan
      .withColumn("cnt", count(lit(1)).over(wBlk))
      .filter(col("cnt") === col("n")) // complete blocks only
      .withColumn("s_b", sum(col("y")).over(wBlk))
      // n·Σy² spelled as Σ(y·(n·y)): every decimal product stays
      // pairwise-(19,0) — a (19)×(38) multiply would exceed DuckDB's
      // 38-digit result-width rule (the r11 probe finding)
      .withColumn("ssn_b",
        sum(y19 * (col("n") * col("y")).cast("decimal(19,0)")).over(wBlk))
      .withColumn("k", row_number().over(wBlk.orderBy(col("rn"))).cast("long"))
      .withColumn("cum_y", sum(col("y")).over(wRun))
      // scaled cumulative deviation: n·Σ_{i≤k} yᵢ − k·S_b (exact long)
      .withColumn("cum_dev", col("n") * col("cum_y") - col("k") * col("s_b"))
    val perBlock = perRow.groupBy(col("n"), col("blk"))
      .agg(max(col("cum_dev")).as("maxc"), min(col("cum_dev")).as("minc"),
        first(col("s_b")).as("s_b"), first(col("ssn_b")).as("ssn_b"))
      // V_b = n·Σy² − S² (both scaled by n²; the ratio cancels it)
      .withColumn("v_b",
        (col("ssn_b")
          - col("s_b").cast("decimal(19,0)") * col("s_b").cast("decimal(19,0)"))
          .cast("double"))
      .filter(col("v_b") > 0.0) // zero-variance block has no R/S
      .withColumn("lnrs_micro",
        round(log((col("maxc") - col("minc")).cast("double")
          / sqrt(col("v_b"))) * lit(1e6)).cast("long"))
    val perN = perBlock.groupBy(col("n"))
      .agg(count(lit(1)).as("b"), sum(col("lnrs_micro")).as("sm"))
    // 4-row pivot onto one row: every "sum" is 1-term ⇒ fixed order
    def m(n: Long): Column =
      (sum(when(col("n") === n, col("sm"))).cast("double")
        / sum(when(col("n") === n, col("b"))).cast("double")) / lit(1e6)
    def b(n: Long): Column = sum(when(col("n") === n, col("b"))).as(s"blocks_$n")
    val ln2 = 0.6931471805599453
    perN.agg(b(16L), b(32L), b(64L), b(128L),
        m(16L).as("m16"), m(32L).as("m32"), m(64L).as("m64"),
        m(128L).as("m128"))
      .select(col("blocks_16"), col("blocks_32"), col("blocks_64"),
        col("blocks_128"), col("m16").as("mean_lnrs_16"),
        col("m128").as("mean_lnrs_128"),
        // ln n are ln16 + j·ln2: closed-form least squares over 4 pts
        ((lit(1.5) * (col("m128") - col("m16"))
          + lit(0.5) * (col("m64") - col("m32"))) / lit(5.0 * ln2))
          .as("hurst_h"))
  }

  val hurstRsSql: String =
    """WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |grid AS (
      |  SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn, y
      |  FROM rev),
      |fan AS (
      |  SELECT rn, y, CAST(n AS BIGINT) AS n,
      |    CAST((rn - 1 - ((rn - 1) % CAST(n AS BIGINT)))
      |         / CAST(n AS BIGINT) AS BIGINT) AS blk
      |  FROM grid, (SELECT unnest([16, 32, 64, 128]) AS n)),
      |rows_w AS (
      |  SELECT n, blk, rn, y,
      |    CAST(COUNT(*) OVER wb AS BIGINT) AS cnt,
      |    CAST(SUM(y) OVER wb AS BIGINT) AS s_b,
      |    SUM(CAST(y AS DECIMAL(19,0)) * CAST(n * y AS DECIMAL(19,0)))
      |      OVER wb AS ssn_b,
      |    CAST(row_number() OVER (PARTITION BY n, blk ORDER BY rn) AS BIGINT)
      |      AS k,
      |    CAST(SUM(y) OVER (PARTITION BY n, blk ORDER BY rn
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_y
      |  FROM fan
      |  WINDOW wb AS (PARTITION BY n, blk)),
      |devs AS (
      |  SELECT n, blk, s_b, ssn_b, n * cum_y - k * s_b AS cum_dev
      |  FROM rows_w WHERE cnt = n),
      |blocks AS (
      |  SELECT n, blk,
      |    MAX(cum_dev) AS maxc, MIN(cum_dev) AS minc,
      |    CAST(CAST(ANY_VALUE(ssn_b)
      |              - CAST(ANY_VALUE(s_b) AS DECIMAL(19,0))
      |                * CAST(ANY_VALUE(s_b) AS DECIMAL(19,0)) AS VARCHAR)
      |         AS DOUBLE) AS v_b
      |  FROM devs GROUP BY n, blk),
      |lnrs AS (
      |  SELECT n,
      |    CAST(round(ln(CAST(maxc - minc AS DOUBLE) / sqrt(v_b)) * 1e6)
      |         AS BIGINT) AS lnrs_micro
      |  FROM blocks WHERE v_b > 0),
      |pern AS (
      |  SELECT n, CAST(COUNT(*) AS BIGINT) AS b,
      |    CAST(SUM(lnrs_micro) AS BIGINT) AS sm
      |  FROM lnrs GROUP BY n),
      |piv AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN n = 16 THEN b END) AS BIGINT) AS blocks_16,
      |    CAST(SUM(CASE WHEN n = 32 THEN b END) AS BIGINT) AS blocks_32,
      |    CAST(SUM(CASE WHEN n = 64 THEN b END) AS BIGINT) AS blocks_64,
      |    CAST(SUM(CASE WHEN n = 128 THEN b END) AS BIGINT) AS blocks_128,
      |    CAST(SUM(CASE WHEN n = 16 THEN sm END) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN n = 16 THEN b END) AS DOUBLE) / 1e6 AS m16,
      |    CAST(SUM(CASE WHEN n = 32 THEN sm END) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN n = 32 THEN b END) AS DOUBLE) / 1e6 AS m32,
      |    CAST(SUM(CASE WHEN n = 64 THEN sm END) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN n = 64 THEN b END) AS DOUBLE) / 1e6 AS m64,
      |    CAST(SUM(CASE WHEN n = 128 THEN sm END) AS DOUBLE)
      |      / CAST(SUM(CASE WHEN n = 128 THEN b END) AS DOUBLE) / 1e6 AS m128
      |  FROM pern)
      |SELECT blocks_16, blocks_32, blocks_64, blocks_128,
      |  m16 AS mean_lnrs_16, m128 AS mean_lnrs_128,
      |  (1.5 * (m128 - m16) + 0.5 * (m64 - m32))
      |    / (5.0 * 0.6931471805599453) AS hurst_h
      |FROM piv""".stripMargin

  // --- Dickey–Fuller unit-root test --------------------------------------------
  /** Dickey–Fuller unit-root test with constant (JASA 1979) on daily
    * revenue: the t-statistic of ρ in Δy_t = α + ρ·y_{t−1} + ε — the
    * "is this series mean-reverting or a random walk" read that decides
    * whether [[cusumChangepoint]]-style level logic or differenced
    * models apply. (Non-augmented: the daily grid's AR(1) term carries
    * the test; [[pacf]] is the lag-depth diagnostic.)
    *
    * Determinism: the five regression moments (Σx, Σy, Σxy, Σx², Σy²
    * over x = y_{t−1} cents, y = Δ cents) are exact BIGINT/DECIMAL
    * sums — squares and cross products ride DECIMAL(19,0)² since
    * daily cents² passes int64 — and ρ̂, SSR, and the t all follow by
    * ONE fixed IEEE chain on VARCHAR-routed casts. Degenerate Sxx or
    * SSR ≤ 0 yields NULL.
    *
    * Scale: one fold of orders into the calendar day grid, one lag
    * window over that grid (the allowlisted bounded class), one
    * 1-row moment aggregate.
    */
  def dickeyFuller(s: SparkSession, dir: String): DataFrame = {
    val d19 = (c: Column) => c.cast("decimal(19,0)")
    val w = Window.orderBy(col("d"))
    val pairs = dailyRevenue(s, dir)
      .withColumn("xlag", lag(col("rev_cents"), 1).over(w))
      .filter(col("xlag").isNotNull)
      .select(col("xlag").as("x"), (col("rev_cents") - col("xlag")).as("y"))
    val mom = pairs.agg(count(lit(1)).as("m"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(d19(col("x")) * d19(col("y"))).as("sxy"),
      sum(d19(col("x")) * d19(col("x"))).as("sxx"),
      sum(d19(col("y")) * d19(col("y"))).as("syy"))
    val md = col("m").cast("double")
    // centering terms spelled with the operator at line END — a leading
    // minus on the next line parses as a separate unary statement and
    // silently drops the term (the dunn/ljungBox class; this site was
    // the third kill, caught by the replay before the oracle even ran)
    val cxy = col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double") / md
    val cxx = col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / md
    val cyy = col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double") / md
    mom
      .select(col("m").as("n_obs"), cxy.as("cxy"), cxx.as("cxx"),
        cyy.as("cyy"))
      .select(col("n_obs"),
        when(col("cxx") > 0.0, col("cxy") / col("cxx")).as("rho_hat"),
        col("cxx"), col("cyy"), col("cxy"))
      .select(col("n_obs"), col("rho_hat"),
        (col("cyy") - col("rho_hat") * col("cxy")).as("ssr"), col("cxx"))
      .select(col("n_obs"), col("rho_hat"),
        when(col("ssr") > 0.0 && col("cxx") > 0.0,
          col("rho_hat") / sqrt(
            col("ssr") / (col("n_obs").cast("double") - lit(2.0))
              / col("cxx")))
          .otherwise(lit(null).cast("double")).as("t_df"))
  }

  val dickeyFullerSql: String =
    """WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |p AS (
      |  SELECT lag(rev_cents) OVER (ORDER BY d) AS x,
      |         rev_cents - lag(rev_cents) OVER (ORDER BY d) AS y
      |  FROM rev),
      |pp AS (SELECT x, y FROM p WHERE x IS NOT NULL),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
      |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
      |    SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy
      |  FROM pp),
      |c AS (
      |  SELECT m AS n_obs,
      |    CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(m AS DOUBLE)
      |      AS cxy,
      |    CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(m AS DOUBLE)
      |      AS cxx,
      |    CAST(CAST(syy AS VARCHAR) AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(m AS DOUBLE)
      |      AS cyy
      |  FROM m),
      |r AS (
      |  SELECT n_obs,
      |    CASE WHEN cxx > 0 THEN cxy / cxx END AS rho_hat, cxx, cyy, cxy
      |  FROM c),
      |f AS (
      |  SELECT n_obs, rho_hat, cyy - rho_hat * cxy AS ssr, cxx
      |  FROM r)
      |SELECT n_obs, rho_hat,
      |  CASE WHEN ssr > 0 AND cxx > 0 THEN
      |    rho_hat / sqrt(ssr / (CAST(n_obs AS DOUBLE) - 2.0) / cxx)
      |  ELSE NULL END AS t_df
      |FROM f""".stripMargin

  // --- Pettitt changepoint -----------------------------------------------------
  /** Pettitt changepoint test (Appl. Stat. 1979) on daily revenue —
    * the RANK-based single-changepoint locator: U_t = 2·Σ_{i≤t}r_i −
    * t(n+1) (a running Mann–Whitney of "before t" vs "after t"), the
    * day maximizing |U_t| is the most likely break, with the standard
    * approximate significance p ≈ 2·exp(−6K²/(n³+n²)). Complements
    * [[cusumChangepoint]]: CUSUM tracks MEAN shifts in original units
    * (outlier-sensitive), Pettitt is distribution-free.
    *
    * Determinism: doubled midranks over the day grid come from the
    * rank/count window identity m2 = 2·rank + t − 1 (exact BIGINTs;
    * the grid windows are the allowlisted calendar-bounded class), so
    * every U2_t = Σm2 − t·(n+1) is an exact BIGINT; the argmax day is
    * a distributed top-1 with |U|-then-date tie-break, and the p
    * approximation's exp output is guarded onto the integer NANO grid
    * (the exp-ulp rule) before the final capped doubling.
    *
    * Scale: one fold of orders into the day grid; three grid windows
    * + a TakeOrdered(1). Nothing data-sized after the fold.
    */
  def pettitt(s: SparkSession, dir: String): DataFrame = {
    val grid = Graft.materialize(dailyRevenue(s, dir))
    val tot = grid.agg(count(lit(1)).as("n"))
    val wVal = Window.orderBy(col("rev_cents"))
    val wTie = Window.partitionBy(col("rev_cents"))
    val wDate = Window.orderBy(col("d"))
    val wCum = wDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = grid
      .withColumn("m2",
        lit(2L) * rank().over(wVal).cast("long")
          + count(lit(1)).over(wTie) - lit(1L))
      .withColumn("i", row_number().over(wDate).cast("long"))
      .withColumn("s2", sum(col("m2")).over(wCum))
      .crossJoin(broadcast(tot))
      .select(col("d"), col("n"),
        (col("s2") - col("i") * (col("n") + lit(1L))).as("u2"))
      .orderBy(abs(col("u2")).desc, col("d"))
      .limit(1)
    val nd = col("n").cast("double")
    val kd = col("u_abs_max").cast("double")
    u.select(col("n"), col("d").as("change_day"),
        abs(col("u2")).as("u_abs_max"))
      .select(col("n").as("n_days"), col("change_day"), col("u_abs_max"),
        least(lit(1.0), lit(2.0)
          * (round(exp(lit(-6.0) * kd * kd / (nd * nd * nd + nd * nd))
            * lit(1e9)).cast("long").cast("double") / lit(1e9)))
          .as("p_approx"))
  }

  val pettittSql: String =
    """WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rev),
      |rk AS (
      |  SELECT d,
      |    2 * CAST(rank() OVER (ORDER BY rev_cents) AS BIGINT)
      |      + CAST(COUNT(*) OVER (PARTITION BY rev_cents) AS BIGINT) - 1
      |      AS m2
      |  FROM rev),
      |cu AS (
      |  SELECT d,
      |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
      |    CAST(SUM(m2) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s2
      |  FROM rk),
      |u AS (
      |  SELECT d, n, s2 - i * (n + 1) AS u2
      |  FROM cu, t
      |  ORDER BY abs(s2 - i * (n + 1)) DESC, d LIMIT 1)
      |SELECT n AS n_days, d AS change_day,
      |  CAST(abs(u2) AS BIGINT) AS u_abs_max,
      |  least(1.0, 2.0 *
      |    (CAST(CAST(round(exp(-6.0 * CAST(abs(u2) AS DOUBLE)
      |                          * CAST(abs(u2) AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |         + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) * 1e9) AS BIGINT)
      |      AS DOUBLE) / 1e9)) AS p_approx
      |FROM u""".stripMargin

  // --- sample entropy --------------------------------------------------------
  /** Sample entropy of the daily order-count series at embedding m = 2
    * (Richman & Moorman, Am J Physiol 2000) — the template-match
    * regularity read that complements [[permutationEntropy]] (ordinal
    * patterns ignore magnitudes; SampEn measures them): SampEn =
    * −ln(A/B) where B counts day pairs whose length-2 templates match
    * within Chebyshev tolerance r and A the same at length 3,
    * self-matches excluded. Tolerance is the standard 0.2·σ, ROUNDED
    * to an integer count — the series is integer-valued, so every
    * template comparison is then pure BIGINT arithmetic.
    *
    * Determinism: σ comes from exact BIGINT/DECIMAL moments via a
    * fixed IEEE chain (VARCHAR-routed decimal cast in the oracle) and
    * the single round() guards r onto the integer grid (the exp-ulp
    * rule's class: a .5 boundary is measure-zero); A and B are exact
    * BIGINT counts and SampEn = (lnμ(B) − lnμ(A))/1e6 rides the
    * micronat grid. A = 0 or B = 0 yields NULL.
    *
    * Scale: the pairing is the [[kendallTau]] calendar-grid BNLJ —
    * the day grid collapses FIRST (one map-side-combined fold of
    * orders), so the O(grid²) pair count is calendar-bounded
    * (~3M pairs at ANY corpus size), never data-sized.
    */
  def sampleEntropy(s: SparkSession, dir: String): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val w = Window.orderBy(col("d"))
    val series = Graft.materialize(
      Tables.load(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("x"))
        .withColumn("x1", lead(col("x"), 1).over(w))
        .withColumn("x2", lead(col("x"), 2).over(w)))
    val mom = series.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x").cast("decimal(18,0)") * col("x").cast("decimal(18,0)"))
        .as("sxx"))
    val rTol = mom.select(col("n"),
      round(lit(0.2) * sqrt(
        (col("n").cast("double") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
          / (col("n").cast("double") * col("n").cast("double"))))
        .cast("long").as("r_tol"))
    val a = series.select(col("d").as("da"), col("x").as("xa"),
      col("x1").as("xa1"), col("x2").as("xa2"))
    val b = series.select(col("d").as("db"), col("x").as("xb"),
      col("x1").as("xb1"), col("x2").as("xb2"))
    val near = (p: String, q: String) =>
      abs(col(p) - col(q)) <= col("r_tol")
    val agg = a.join(broadcast(b), col("da") < col("db"))
      .crossJoin(broadcast(rTol))
      .agg(max(col("n")).as("n_days"), max(col("r_tol")).as("r_tol"),
        sum(when(col("xa1").isNotNull && col("xb1").isNotNull
          && near("xa", "xb") && near("xa1", "xb1"), 1L).otherwise(0L))
          .as("b_pairs"),
        sum(when(col("xa2").isNotNull && col("xb2").isNotNull
          && near("xa", "xb") && near("xa1", "xb1") && near("xa2", "xb2"),
          1L).otherwise(0L)).as("a_pairs"))
    agg.select(col("n_days"), col("r_tol"), col("b_pairs"), col("a_pairs"),
      when(col("a_pairs") > 0L && col("b_pairs") > 0L,
        (lnMicro(col("b_pairs")) - lnMicro(col("a_pairs"))).cast("double")
          / lit(1e6))
        .otherwise(lit(null).cast("double")).as("sampen"))
  }

  val sampleEntropySql: String = {
    def lnu(v: String): String =
      s"CAST(round(ln(CAST($v AS DOUBLE)) * 1e6) AS BIGINT)"
    s"""WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |g AS (
      |  SELECT d, x, lead(x, 1) OVER (ORDER BY d) AS x1,
      |         lead(x, 2) OVER (ORDER BY d) AS x2
      |  FROM days),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |    SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx
      |  FROM g),
      |r AS (
      |  SELECT n, CAST(round(0.2 * sqrt(
      |      (CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS BIGINT) AS r_tol
      |  FROM m),
      |p AS (
      |  SELECT r.n AS n_days, r.r_tol,
      |    CAST(SUM(CASE WHEN a.x1 IS NOT NULL AND b.x1 IS NOT NULL
      |      AND abs(a.x - b.x) <= r.r_tol AND abs(a.x1 - b.x1) <= r.r_tol
      |      THEN 1 ELSE 0 END) AS BIGINT) AS b_pairs,
      |    CAST(SUM(CASE WHEN a.x2 IS NOT NULL AND b.x2 IS NOT NULL
      |      AND abs(a.x - b.x) <= r.r_tol AND abs(a.x1 - b.x1) <= r.r_tol
      |      AND abs(a.x2 - b.x2) <= r.r_tol
      |      THEN 1 ELSE 0 END) AS BIGINT) AS a_pairs
      |  FROM g a JOIN g b ON a.d < b.d, r
      |  GROUP BY r.n, r.r_tol)
      |SELECT n_days, r_tol, b_pairs, a_pairs,
      |  CASE WHEN a_pairs > 0 AND b_pairs > 0 THEN
      |    CAST(${lnu("b_pairs")} - ${lnu("a_pairs")} AS DOUBLE) / 1e6
      |  END AS sampen
      |FROM p""".stripMargin
  }

  // --- permutation entropy -------------------------------------------------------
  /** Permutation entropy of the daily order-count series at embedding
    * order 3 (Bandt & Pompe, PRL 2002) — the ordinal-pattern complexity
    * read: a perfectly regular series concentrates all (x_t, x_{t+1},
    * x_{t+2}) windows on one of the 6 rank patterns (PE → 0), white
    * noise spreads them uniformly (normalized PE → 1). Complements
    * [[turningPoints]] (one specific order-2 pattern family) and
    * [[EventQueries]]' Markov entropy (symbol-level, not ordinal).
    *
    * Tie rule: ranks break ties by POSITION (stable order — the
    * standard discretization for integer-valued series), spelled as
    * pure comparisons: rank_i = #{j : x_j < x_i, or x_j = x_i with
    * j < i}, so the pattern word r0·100+r1·10+r2 is an exact integer
    * both engines compute identically — no sort, no ambiguity.
    *
    * Determinism: pattern counts are exact BIGINTs; the entropy uses
    * the identity H = ln n − (Σ c·ln c)/n with each ln rounded to
    * integer MICRONATS (the [[Survival]] discipline), so the numerator
    * n·lnμ(n) − Σ c·lnμ(c) is an exact BIGINT and PE (and its /ln 6
    * normalization, with ln 6 on the same micronat grid) are one IEEE
    * division of exact integers each.
    *
    * Scale: one map-side-combined fold of orders into the calendar day
    * grid; the two lead windows ride that grid (the allowlisted
    * bounded class), patterns collapse to a ≤6-row grid, output is
    * one row.
    */
  def permutationEntropy(s: SparkSession, dir: String): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val days = Tables.load(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy(col("d"))
    val a = col("x"); val b = col("b"); val c = col("c")
    val tri = Graft.materialize(days)
      .withColumn("b", lead(col("x"), 1).over(w))
      .withColumn("c", lead(col("x"), 2).over(w))
      .filter(col("c").isNotNull)
    val r0 = (b < a).cast("long") + (c < a).cast("long")
    val r1 = (a <= b).cast("long") + (c < b).cast("long")
    val r2 = (a <= c).cast("long") + (b <= c).cast("long")
    val pats = tri
      .select((r0 * lit(100L) + r1 * lit(10L) + r2).as("pid"))
      .groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
    def pc(id: Long, name: String): Column =
      coalesce(sum(when(col("pid") === lit(id), col("cnt"))), lit(0L))
        .as(name)
    val agg = pats.agg(
      sum(col("cnt")).as("n_windows"),
      count(lit(1)).as("n_patterns"),
      pc(12L, "c_012"), pc(21L, "c_021"), pc(102L, "c_102"),
      pc(120L, "c_120"), pc(201L, "c_201"), pc(210L, "c_210"),
      sum(col("cnt") * lnMicro(col("cnt"))).as("clnc"))
    val nW = col("n_windows")
    agg
      .withColumn("h_numer", nW * lnMicro(nW) - col("clnc"))
      .select(col("n_windows"), col("n_patterns"),
        col("c_012"), col("c_021"), col("c_102"),
        col("c_120"), col("c_201"), col("c_210"),
        (col("h_numer").cast("double")
          / (nW.cast("double") * lit(1e6))).as("pe"),
        (col("h_numer").cast("double")
          / (nW * lnMicro(lit(6.0))).cast("double")).as("pe_norm"))
  }

  val permutationEntropySql: String =
    """WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |tri AS (
      |  SELECT x AS a,
      |    lead(x, 1) OVER (ORDER BY d) AS b,
      |    lead(x, 2) OVER (ORDER BY d) AS c
      |  FROM days),
      |pid AS (
      |  SELECT (CASE WHEN b < a THEN 1 ELSE 0 END
      |          + CASE WHEN c < a THEN 1 ELSE 0 END) * 100
      |       + (CASE WHEN a <= b THEN 1 ELSE 0 END
      |          + CASE WHEN c < b THEN 1 ELSE 0 END) * 10
      |       + (CASE WHEN a <= c THEN 1 ELSE 0 END
      |          + CASE WHEN b <= c THEN 1 ELSE 0 END) AS pid
      |  FROM tri WHERE c IS NOT NULL),
      |pats AS (SELECT pid, CAST(COUNT(*) AS BIGINT) AS cnt
      |         FROM pid GROUP BY pid),
      |agg AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_windows,
      |    CAST(COUNT(*) AS BIGINT) AS n_patterns,
      |    CAST(COALESCE(SUM(CASE WHEN pid = 12 THEN cnt END), 0) AS BIGINT)
      |      AS c_012,
      |    CAST(COALESCE(SUM(CASE WHEN pid = 21 THEN cnt END), 0) AS BIGINT)
      |      AS c_021,
      |    CAST(COALESCE(SUM(CASE WHEN pid = 102 THEN cnt END), 0) AS BIGINT)
      |      AS c_102,
      |    CAST(COALESCE(SUM(CASE WHEN pid = 120 THEN cnt END), 0) AS BIGINT)
      |      AS c_120,
      |    CAST(COALESCE(SUM(CASE WHEN pid = 201 THEN cnt END), 0) AS BIGINT)
      |      AS c_201,
      |    CAST(COALESCE(SUM(CASE WHEN pid = 210 THEN cnt END), 0) AS BIGINT)
      |      AS c_210,
      |    CAST(SUM(cnt * CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT))
      |      AS BIGINT) AS clnc
      |  FROM pats),
      |h AS (
      |  SELECT *, n_windows
      |    * CAST(round(ln(CAST(n_windows AS DOUBLE)) * 1e6) AS BIGINT)
      |    - clnc AS h_numer
      |  FROM agg)
      |SELECT n_windows, n_patterns, c_012, c_021, c_102, c_120, c_201, c_210,
      |  CAST(h_numer AS DOUBLE) / (CAST(n_windows AS DOUBLE) * 1e6) AS pe,
      |  CAST(h_numer AS DOUBLE)
      |    / CAST(n_windows * CAST(round(ln(CAST(6.0 AS DOUBLE)) * 1e6)
      |                            AS BIGINT) AS DOUBLE) AS pe_norm
      |FROM h""".stripMargin

  // --- exponentially weighted moving average -----------------------------------
  /** EWMA of daily revenue with α = 1/5 — the recursive smoother
    * behind every monitoring baseline (Roberts, Technometrics 1959:
    * the EWMA control chart) and the one read [[cusumChangepoint]] /
    * `events_anomaly_zscore` don't cover: a LEVEL estimate that
    * forgets old data geometrically instead of equally weighting a
    * fixed window ([[seasonalDecompose]]'s MA). Reports the last 60
    * grid days with the smoothed level and the residual the chart
    * alarms on.
    *
    * Determinism: the recursion runs on the integer MICROCENT grid —
    * s_0 = y_0·10⁶, s_t = (y_t·10⁶ + 4·s_{t−1}) div 5 — truncating
    * integer division both engines share, so all ~2.4k steps are
    * bit-identical; the oracle replays the IDENTICAL integer
    * recursion as a recursive CTE over the same day grid. Headroom:
    * 5·s < 2⁶³ until daily revenue ≈ 1.8e16 cents (~SF 8e4).
    * Residual y − (s div 10⁶) stays exact BIGINT; the reported level
    * is one IEEE division per row.
    *
    * Scale: ONE map-side-combined fold of orders into the calendar
    * day grid is the only data-sized work; the recursion itself is
    * inherently sequential, so it runs driver-side over the COLLECTED
    * grid (calendar-bounded — ~2.4k rows at ANY corpus size — the
    * [[EventQueries.markovStationary]] metadata-bounded-collect
    * precedent; a distributed window could not express the recursion
    * and a 2.4k-step chain has no parallelism to exploit).
    */
  def ewma(s: SparkSession, dir: String, lastN: Int = 60): DataFrame = {
    val series = dailyRevenue(s, dir)
      .orderBy(col("d"))
      .collect().map(r => (r.getDate(0), r.getLong(1)))
    val sm = new Array[Long](series.length)
    for (i <- series.indices)
      sm(i) = if (i == 0) series(0)._2 * 1000000L
      else (series(i)._2 * 1000000L + 4L * sm(i - 1)) / 5L
    import s.implicits._
    val from = series.length - math.min(lastN, series.length)
    series.indices.drop(from)
      .map { i =>
        val (d, y) = series(i)
        (d, y, sm(i), sm(i) / 1e6 / 100.0, y - sm(i) / 1000000L)
      }
      .toDF("d", "rev_cents", "ewma_microcents", "ewma_dollars",
        "resid_cents")
  }

  // --- Holt–Winters additive seasonal smoother -------------------------------------
  /** Holt–Winters additive triple-exponential smoother on daily
    * revenue with weekly (m = 7) seasonality — the top of the
    * smoother ladder ([[ewma]] level-only → [[holtLinear]]
    * level+trend → this level+trend+seasonal; Winters, Mgmt. Sci.
    * 1960): the day-of-week cycle that inflates both simpler models'
    * residuals becomes explicit state. α = 1/5, β = 1/10, γ = 1/5 as
    * the exact integer fractions of the family. Textbook two-week
    * init: l = mean(week₁), b = (mean(week₂) − mean(week₁))/7,
    * sⱼ = yⱼ − mean(week₁).
    *
    * Exactness: the three-state recursion runs on the integer
    * MICRO-CENT grid with truncating division — lᵢ = (ymᵢ − sᵢ₋₇ +
    * 4(lᵢ₋₁+bᵢ₋₁)) / 5 etc. — so every state is an exact BIGINT and
    * the DuckDB twin is the IDENTICAL recursion as a recursive CTE
    * carrying the rotating 7-slot seasonal vector (truncation toward
    * zero matches Scala `/` and the intDiv spelling on both signs).
    *
    * Scale: the recursion is inherently sequential, so it runs
    * driver-side over the COLLECTED day grid (~2.4k rows at ANY
    * corpus size — the [[ewma]]/[[holtLinear]]/markov_stationary
    * metadata-bounded collect precedent); the corpus-sized fold into
    * that grid is the distributed part.
    */
  def holtWinters(s: SparkSession, dir: String, lastN: Int = 30): DataFrame = {
    val series = dailyRevenue(s, dir)
      .orderBy(col("d"))
      .collect().map(r => (r.getDate(0), r.getLong(1)))
    val n = series.length
    require(n >= 15, "holtWinters needs two full weeks + 1 grid days")
    val ym = series.map(_._2 * 1000000L)
    val a1 = ym.take(7).sum / 7L
    val a2 = ym.slice(7, 14).sum / 7L
    val l = new Array[Long](n); val b = new Array[Long](n)
    val se = new Array[Long](n); val f = new Array[Long](n)
    for (i <- 0 until 7) { l(i) = a1; b(i) = (a2 - a1) / 7L; se(i) = ym(i) - a1 }
    for (i <- 7 until n) {
      val sPrev = se(i - 7)
      f(i) = l(i - 1) + b(i - 1) + sPrev
      l(i) = ((ym(i) - sPrev) + 4L * (l(i - 1) + b(i - 1))) / 5L
      b(i) = ((l(i) - l(i - 1)) + 9L * b(i - 1)) / 10L
      se(i) = ((ym(i) - l(i)) + 4L * sPrev) / 5L
    }
    import s.implicits._
    val from = math.max(7, n - math.min(lastN, n))
    series.indices.drop(from)
      .map { i =>
        val (d, y) = series(i)
        (d, y, l(i), b(i), se(i), f(i), ym(i) - f(i),
          l(i) / 1e6 / 100.0, se(i) / 1e6 / 100.0)
      }
      .toDF("d", "rev_cents", "level_micro", "trend_micro",
        "seasonal_micro", "fitted_micro", "resid_micro",
        "level_dollars", "seasonal_dollars")
  }

  /** DuckDB twin of [[holtWinters]] — the identical three-state
    * integer recursion as a recursive CTE whose state carries the
    * rotating 7-slot seasonal vector, derived from the SAME lastN. */
  def holtWintersSql(lastN: Int = 30): String = {
    val lNew = PortableSql.intDiv(
      "(g.y * 1000000 - it.s0) + 4 * (it.l + it.b)", "5")
    val bNew = PortableSql.intDiv(s"(($lNew) - it.l) + 9 * it.b", "10")
    val sNew = PortableSql.intDiv(s"(g.y * 1000000 - ($lNew)) + 4 * it.s0", "5")
    s"""WITH RECURSIVE
      |rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |g AS (SELECT d, y,
      |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      |      FROM rev),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM g),
      |w1 AS (SELECT ${PortableSql.intDiv("SUM(y * 1000000)", "7")} AS a1
      |       FROM g WHERE i <= 7),
      |w2 AS (SELECT ${PortableSql.intDiv("SUM(y * 1000000)", "7")} AS a2
      |       FROM g WHERE i BETWEEN 8 AND 14),
      |init AS (
      |  SELECT
      |    (SELECT d FROM g WHERE i = 7) AS d,
      |    (SELECT y FROM g WHERE i = 7) AS y,
      |    a1 AS l, ${PortableSql.intDiv("a2 - a1", "7")} AS b,
      |    MAX(CASE WHEN i = 1 THEN y * 1000000 - a1 END) AS s0,
      |    MAX(CASE WHEN i = 2 THEN y * 1000000 - a1 END) AS s1,
      |    MAX(CASE WHEN i = 3 THEN y * 1000000 - a1 END) AS s2,
      |    MAX(CASE WHEN i = 4 THEN y * 1000000 - a1 END) AS s3,
      |    MAX(CASE WHEN i = 5 THEN y * 1000000 - a1 END) AS s4,
      |    MAX(CASE WHEN i = 6 THEN y * 1000000 - a1 END) AS s5,
      |    MAX(CASE WHEN i = 7 THEN y * 1000000 - a1 END) AS s6
      |  FROM g, w1, w2 WHERE i <= 7 GROUP BY a1, a2),
      |it(i, d, y, l, b, f, s0, s1, s2, s3, s4, s5, s6) AS (
      |  SELECT CAST(7 AS BIGINT), d, y, l, b, CAST(NULL AS BIGINT),
      |    s0, s1, s2, s3, s4, s5, s6
      |  FROM init
      |  UNION ALL
      |  SELECT g.i, g.d, g.y,
      |    $lNew,
      |    $bNew,
      |    it.l + it.b + it.s0,
      |    it.s1, it.s2, it.s3, it.s4, it.s5, it.s6,
      |    $sNew
      |  FROM it JOIN g ON g.i = it.i + 1)
      |SELECT d, y AS rev_cents, l AS level_micro, b AS trend_micro,
      |  s6 AS seasonal_micro, f AS fitted_micro,
      |  y * 1000000 - f AS resid_micro,
      |  CAST(l AS DOUBLE) / 1e6 / 100.0 AS level_dollars,
      |  CAST(s6 AS DOUBLE) / 1e6 / 100.0 AS seasonal_dollars
      |FROM it, nn WHERE i >= 8 AND i > n_days - $lastN ORDER BY d""".stripMargin
  }

  // --- seasonal Mann–Kendall ------------------------------------------------------
  /** Seasonal Mann–Kendall trend test on daily revenue (Hirsch & Slack,
    * Water Resour. Res. 1984, independent-seasons form): the S
    * statistic and its variance are computed WITHIN each weekday
    * series and summed, so the strong day-of-week cycle — which
    * plain `ts_mann_kendall` reads as noise (and partly as spurious
    * concordance) — contributes nothing, and only the cross-week
    * monotone drift is tested. The standard pre-test before fitting
    * [[theilSen]]'s slope to seasonal data.
    *
    * Exactness: per-season pair signs, tie terms and variance
    * numerators are the exact BIGINT spellings of `ts_mann_kendall`,
    * summed over the 7 seasons; z is the same sign-corrected one-sqrt
    * chain, NULL when every season is constant.
    *
    * Scale: the pairing is the kendallTau calendar-grid BNLJ — the
    * fact table collapses into the day grid FIRST, and within-season
    * pairs are (|days|/7)²·7 ≈ |days|²/7 at ANY corpus size.
    */
  def seasonalMannKendall(s: SparkSession, dir: String): DataFrame = {
    val series = Graft.materialize(
      dailyRevenue(s, dir).select(
        datediff(col("d"), to_date(lit("1970-01-01"))).cast("long").as("t"),
        expr("rev_cents div 100").as("x"))
        .withColumn("dow", col("t") % 7))
    val sStat = series.select(col("dow"), col("t").as("ta"), col("x").as("xa"))
      .join(broadcast(series.select(col("dow"), col("t").as("tb"),
        col("x").as("xb"))), Seq("dow"))
      .filter(col("ta") < col("tb"))
      .agg(sum(signum(col("xb") - col("xa")).cast("long")).as("s_total"))
    val perSeason = series.groupBy(col("dow"))
      .agg(count(lit(1)).as("ng"))
    val ties = series.groupBy(col("dow"), col("x"))
      .agg(count(lit(1)).as("tp"))
      .groupBy(col("dow"))
      .agg(sum(col("tp") * (col("tp") - 1L) * (lit(2L) * col("tp") + 5L))
        .as("tie_g"))
    val varNum = perSeason.join(ties, "dow")
      .agg(count(lit(1)).as("n_seasons"), sum(col("ng")).as("n_days"),
        sum(col("ng") * (col("ng") - 1L) * (lit(2L) * col("ng") + 5L)
          - col("tie_g")).as("var_num"))
    sStat.crossJoin(broadcast(varNum))
      .select(col("n_seasons"), col("n_days"), col("s_total"), col("var_num"),
        when(col("var_num") > 0,
          when(col("s_total") > 0, col("s_total") - 1L)
            .when(col("s_total") < 0, col("s_total") + 1L)
            .otherwise(0L).cast("double")
            / sqrt(col("var_num").cast("double") / 18.0))
          .otherwise(lit(null).cast("double")).as("z"))
  }

  val seasonalMannKendallSql: String = {
    val dollars = PortableSql.intDiv("rev_cents", "100")
    s"""WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |x AS (SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS t,
      |             CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) % 7
      |               AS dow,
      |             $dollars AS x
      |      FROM rev),
      |s AS (
      |  SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
      |                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
      |           AS s_total
      |  FROM x a JOIN x b ON a.dow = b.dow AND a.t < b.t),
      |ng AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS ng FROM x GROUP BY dow),
      |tie AS (
      |  SELECT dow,
      |    CAST(SUM(tp * (tp - 1) * (2 * tp + 5)) AS BIGINT) AS tie_g
      |  FROM (SELECT dow, CAST(COUNT(*) AS BIGINT) AS tp
      |        FROM x GROUP BY dow, x.x) g
      |  GROUP BY dow),
      |v AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_seasons,
      |    CAST(SUM(ng) AS BIGINT) AS n_days,
      |    CAST(SUM(ng * (ng - 1) * (2 * ng + 5) - tie_g) AS BIGINT)
      |      AS var_num
      |  FROM ng JOIN tie USING (dow))
      |SELECT n_seasons, n_days, s_total, var_num,
      |  CASE WHEN var_num > 0 THEN
      |    CAST(CASE WHEN s_total > 0 THEN s_total - 1
      |              WHEN s_total < 0 THEN s_total + 1 ELSE 0 END AS DOUBLE)
      |    / sqrt(CAST(var_num AS DOUBLE) / 18.0)
      |  END AS z
      |FROM s, v""".stripMargin
  }

  // --- seasonal-adjusted anomaly days ----------------------------------------------
  /** Top-10 anomaly days AFTER removing trend and weekday seasonality —
    * the read [[cusumChangepoint]] (level shifts) and `ts_peaks` (raw
    * spikes) both miss: a Tuesday that is huge FOR A TUESDAY, on an
    * otherwise normal week. Decomposition is [[seasonalDecompose]]'s
    * (±3-day MA trend, weekday-mean seasonal, full windows only);
    * anomaly score is |residual| over the residuals' MAD — the robust
    * denominator that one fat outlier can't inflate (so the outlier
    * can't hide itself).
    *
    * Exactness: this query's seasonal is the TRUNCATING integer mean
    * `Σdetr div n_dow` (signed-safe: both engines truncate toward
    * zero), so residuals are exact BIGINTs; the doubled-MAD
    * m2 = lo + hi order statistics of |resid| avoids the midpoint
    * division, and the reported ratio is ONE IEEE division of exact
    * integers (2·|resid| / m2). Top-10 orders on (|resid|, d) — both
    * exact.
    *
    * Scale: one fold of orders into the materialized day grid; every
    * window (MA trend, median rank) rides that calendar-bounded grid
    * (allowlisted); the top-10 is a distributed TakeOrdered cut.
    */
  def stlAnomaly(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val series = dailyRevenue(s, dir)
      .withColumn("dow",
        (datediff(col("d"), to_date(lit("1970-01-01"))) % 7).cast("long"))
    val w7 = Window.orderBy(col("d")).rowsBetween(-3, 3)
    val det = Graft.materialize(series
      .withColumn("s7", sum(col("rev_cents")).over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .filter(col("c7") === 7)
      .select(col("d"), col("rev_cents"), col("dow"),
        (col("rev_cents") * lit(10000L) - expr("(s7 * 10000) div 7"))
          .as("detr_micro")))
    val seasonal = det.groupBy(col("dow"))
      .agg(sum(col("detr_micro")).as("sd"), count(lit(1)).as("cd"))
      .select(col("dow"), expr("sd div cd").as("seasonal_micro"))
    val resid = Graft.materialize(
      det.join(broadcast(seasonal), "dow")
        .select(col("d"), col("rev_cents"),
          (col("detr_micro") - col("seasonal_micro")).as("resid_micro"))
        .withColumn("abs_resid", abs(col("resid_micro"))))
    val wOrd = Window.orderBy(col("abs_resid"), col("d"))
    val nRow = resid.agg(count(lit(1)).as("n"))
    val m2 = resid.withColumn("rnk", row_number().over(wOrd).cast("long"))
      .crossJoin(broadcast(nRow))
      .select((col("abs_resid")
        * (when(col("rnk") === expr("(n + 1) div 2"), 1L).otherwise(0L)
          + when(col("rnk") === expr("(n + 2) div 2"), 1L).otherwise(0L)))
        .as("part"))
      .agg(sum(col("part")).as("mad2"))
    resid.crossJoin(broadcast(m2))
      .orderBy(col("abs_resid").desc, col("d"))
      .limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("abs_resid").desc, col("d"))).cast("long"))
      .select(col("rnk"), col("d"), col("rev_cents"), col("resid_micro"),
        (col("resid_micro").cast("double") / lit(1e6)).as("resid_dollars"),
        col("mad2"),
        when(col("mad2") > 0L, (col("abs_resid") * 2L).cast("double")
          / col("mad2").cast("double")).as("robust_ratio"))
      .orderBy(col("rnk"))
  }

  def stlAnomalySql(k: Int = 10): String = {
    val trend = PortableSql.intDiv("s7 * 10000", "7")
    // sd div cd with a possibly NEGATIVE sd: (a - a%b)/b truncates
    // toward zero in DuckDB exactly like Spark's div (both %'s take
    // the dividend's sign)
    val seas = PortableSql.intDiv("sd", "cd")
    val lo = PortableSql.intDiv("n + 1", "2")
    val hi = PortableSql.intDiv("n + 2", "2")
    s"""WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT d, rev_cents,
      |    CAST(date_diff('day', DATE '1970-01-01', d) % 7 AS BIGINT) AS dow,
      |    CAST(SUM(rev_cents) OVER win AS BIGINT) AS s7,
      |    COUNT(*) OVER win AS c7
      |  FROM rev
      |  WINDOW win AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |det AS (
      |  SELECT d, rev_cents, dow,
      |    rev_cents * 10000 - $trend AS detr_micro
      |  FROM w WHERE c7 = 7),
      |seas AS (
      |  SELECT dow, $seas AS seasonal_micro
      |  FROM (SELECT dow, CAST(SUM(detr_micro) AS BIGINT) AS sd,
      |          CAST(COUNT(*) AS BIGINT) AS cd
      |        FROM det GROUP BY dow)),
      |res AS (
      |  SELECT d, rev_cents,
      |    detr_micro - seasonal_micro AS resid_micro,
      |    abs(detr_micro - seasonal_micro) AS abs_resid
      |  FROM det JOIN seas USING (dow)),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM res),
      |rk AS (
      |  SELECT abs_resid,
      |    CAST(row_number() OVER (ORDER BY abs_resid, d) AS BIGINT) AS rnk
      |  FROM res),
      |m AS (
      |  SELECT CAST(SUM(abs_resid
      |    * ((CASE WHEN rnk = $lo THEN 1 ELSE 0 END)
      |       + (CASE WHEN rnk = $hi THEN 1 ELSE 0 END))) AS BIGINT) AS mad2
      |  FROM rk, n),
      |top AS (
      |  SELECT d, rev_cents, resid_micro, abs_resid,
      |    CAST(row_number() OVER (ORDER BY abs_resid DESC, d) AS BIGINT)
      |      AS rnk
      |  FROM res)
      |SELECT rnk, d, rev_cents, resid_micro,
      |  CAST(resid_micro AS DOUBLE) / 1e6 AS resid_dollars, mad2,
      |  CASE WHEN mad2 > 0 THEN CAST(abs_resid * 2 AS DOUBLE)
      |    / CAST(mad2 AS DOUBLE) END AS robust_ratio
      |FROM top, m WHERE rnk <= $k ORDER BY rnk""".stripMargin
  }

  // --- index of dispersion --------------------------------------------------------
  /** Index of dispersion (variance-to-mean ratio) of DAILY ORDER
    * COUNTS — the one-number Poisson-ness test (Fisher's dispersion
    * test: under a homogeneous Poisson arrival process D ≈ 1 and
    * (n−1)·D is χ²_{n−1}; D ≫ 1 = clumped arrivals, D ≪ 1 =
    * regularized). The capacity-planning prior check: Poisson-sizing a
    * queue from an over-dispersed arrival series under-provisions the
    * bursts, and this is the read that says whether `events_burstiness`
    * style clumping also lives in the ORDER stream.
    *
    * Exactness: χ² = (n_d·Σx² − S²)/S from exact BIGINT/DECIMAL
    * moments (Σx² rides DECIMAL(18,0) products per the
    * [[autocorrelation]] decimal-moments rule; the oracle routes its
    * decimal→double through the VARCHAR round-trip), so D and χ² are
    * a fixed IEEE chain on bit-identical inputs. NULL on a degenerate
    * series (S = 0, or a single-day grid where the n−1 denominator
    * would put Inf/NaN in `dispersion`).
    *
    * Scale: one map-side-combined fold of orders into the calendar
    * day grid, one 1-row reduce — nothing else.
    */
  def dispersionIndex(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.load(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
    val m = g.agg(count(lit(1)).as("n_days"), sum(col("x")).as("n_orders"),
      sum(col("x").cast("decimal(18,0)") * col("x").cast("decimal(18,0)"))
        .as("sxx"))
    m.select(col("n_days"), col("n_orders"),
      (col("n_orders").cast("double") / col("n_days").cast("double"))
        .as("mean_per_day"),
      when(col("n_orders") > 0L,
        (col("n_days").cast("double") * col("sxx").cast("double")
          - col("n_orders").cast("double") * col("n_orders").cast("double"))
          / col("n_orders").cast("double")).as("chi2"))
      .withColumn("dispersion",
        when(col("n_days") > 1L,
          col("chi2") / (col("n_days") - 1L).cast("double")))
  }

  val dispersionIndexSql: String =
    """WITH g AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(x) AS BIGINT) AS n_orders,
      |    CAST(CAST(SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
      |         AS VARCHAR) AS DOUBLE) AS sxx
      |  FROM g),
      |r AS (
      |  SELECT n_days, n_orders,
      |    CAST(n_orders AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_per_day,
      |    CASE WHEN n_orders > 0 THEN
      |      (CAST(n_days AS DOUBLE) * sxx
      |       - CAST(n_orders AS DOUBLE) * CAST(n_orders AS DOUBLE))
      |      / CAST(n_orders AS DOUBLE) END AS chi2
      |  FROM m)
      |SELECT n_days, n_orders, mean_per_day, chi2,
      |  CASE WHEN n_days > 1 THEN
      |    chi2 / CAST(n_days - 1 AS DOUBLE) END AS dispersion
      |FROM r""".stripMargin

  // --- one-step forecast backtest --------------------------------------------------
  /** One-step-ahead forecast backtest over the last `evalDays` grid
    * days: MAE and RMSE of the naive carry-forward (f_t = y_{t−1}),
    * [[ewma]] (f_t = s_{t−1}) and [[holtLinear]] (f_t = l_{t−1} +
    * b_{t−1}) forecasters — the model-selection read that justifies
    * shipping the trend-aware smoother (if Holt doesn't beat naive
    * out-of-sample, it's curve-fitting). Standard rolling-origin
    * backtest, one-step horizon.
    *
    * Determinism: both recursions are the bit-identical integer
    * recursions of their parent queries; per-day errors truncate to
    * exact BIGINT CENTS (|y − f div 10⁶|), so the MAE/RMSE sums are
    * exact integers and each reported double is a fixed one/two-op
    * IEEE chain. The oracle replays the recursions as recursive CTEs
    * and the naive leg as one lag.
    *
    * Scale: the [[ewma]] posture — one fold of orders into the
    * calendar day grid, sequential recursion driver-side over the
    * collected calendar-bounded series.
    */
  def forecastBacktest(s: SparkSession, dir: String,
                       evalDays: Int = 365): DataFrame = {
    val series = dailyRevenue(s, dir)
      .orderBy(col("d"))
      .collect().map(r => (r.getDate(0), r.getLong(1)))
    require(series.length >= 3, "forecastBacktest needs three grid days")
    val n = series.length
    val sm = new Array[Long](n)
    val l = new Array[Long](n)
    val b = new Array[Long](n)
    for (i <- series.indices) {
      if (i == 0) {
        sm(0) = series(0)._2 * 1000000L
        l(0) = series(0)._2 * 1000000L
        b(0) = (series(1)._2 - series(0)._2) * 1000000L
      } else {
        sm(i) = (series(i)._2 * 1000000L + 4L * sm(i - 1)) / 5L
        val f = l(i - 1) + b(i - 1)
        l(i) = (series(i)._2 * 1000000L + 4L * f) / 5L
        b(i) = ((l(i) - l(i - 1)) + 9L * b(i - 1)) / 10L
      }
    }
    val from = math.max(1, n - evalDays)
    // se in BigInt: daily-cent errors reach ~1e10 at sf0.1, so the
    // squared-error sum passes 2^63 (a Long wrapped silently here —
    // caught by rmse < mae and a NaN at the sf0.1 gate); the oracle
    // mirrors with DECIMAL(19,0) products and the VARCHAR round-trip
    def fold(f: Int => Long): (Long, Long, BigInt) = {
      var cnt = 0L; var ae = 0L; var se = BigInt(0)
      for (i <- from until n) {
        val e = math.abs(series(i)._2 - f(i) / 1000000L)
        cnt += 1; ae += e; se += BigInt(e) * BigInt(e)
      }
      (cnt, ae, se)
    }
    val rows = Seq(
      ("ewma", fold(i => sm(i - 1))),
      ("holt", fold(i => l(i - 1) + b(i - 1))),
      ("naive", fold(i => series(i - 1)._2 * 1000000L)))
    import s.implicits._
    rows.map { case (mdl, (cnt, ae, se)) =>
      (mdl, cnt, ae.toDouble / (cnt * 100.0),
        math.sqrt(se.toDouble / cnt) / 100.0)
    }.toDF("model", "n_days_eval", "mae_dollars", "rmse_dollars")
      .orderBy(col("model"))
  }

  /** DuckDB twin of [[forecastBacktest]] — the parent recursions as
    * recursive CTEs plus a lag for the naive leg, derived from the
    * SAME evalDays. */
  def forecastBacktestSql(evalDays: Int = 365): String = {
    val sStep = PortableSql.intDiv("g.y * 1000000 + 4 * e.s", "5")
    val lStep = PortableSql.intDiv("g.y * 1000000 + 4 * (h.l + h.b)", "5")
    val bStep = PortableSql.intDiv(
      s"(${PortableSql.intDiv("g.y * 1000000 + 4 * (h.l + h.b)", "5")}" +
        " - h.l) + 9 * h.b", "10")
    val fD = (f: String) => PortableSql.intDiv(f, "1000000")
    s"""WITH RECURSIVE
      |rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |g AS (SELECT d, y,
      |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      |      FROM rev),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM g),
      |e(i, y, s) AS (
      |  SELECT i, y, y * 1000000 FROM g WHERE i = 1
      |  UNION ALL
      |  SELECT g.i, g.y, $sStep
      |  FROM e JOIN g ON g.i = e.i + 1),
      |h(i, y, l, b) AS (
      |  SELECT g1.i, g1.y, g1.y * 1000000, (g2.y - g1.y) * 1000000
      |  FROM g g1 JOIN g g2 ON g1.i = 1 AND g2.i = 2
      |  UNION ALL
      |  SELECT g.i, g.y, $lStep, $bStep
      |  FROM h JOIN g ON g.i = h.i + 1),
      |errs AS (
      |  SELECT 'ewma' AS model, g.y,
      |    abs(g.y - ${fD("ep.s")}) AS err
      |  FROM g JOIN e ep ON ep.i = g.i - 1, n
      |  WHERE g.i > GREATEST(1, n.n_days - $evalDays)
      |  UNION ALL
      |  SELECT 'holt', g.y, abs(g.y - ${fD("hp.l + hp.b")})
      |  FROM g JOIN h hp ON hp.i = g.i - 1, n
      |  WHERE g.i > GREATEST(1, n.n_days - $evalDays)
      |  UNION ALL
      |  SELECT 'naive', g.y, abs(g.y - gp.y)
      |  FROM g JOIN g gp ON gp.i = g.i - 1, n
      |  WHERE g.i > GREATEST(1, n.n_days - $evalDays))
      |SELECT model, CAST(COUNT(*) AS BIGINT) AS n_days_eval,
      |  CAST(CAST(SUM(err) AS BIGINT) AS DOUBLE)
      |    / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS mae_dollars,
      |  sqrt(CAST(CAST(SUM(CAST(err AS DECIMAL(19,0))
      |      * CAST(err AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE)) / 100.0 AS rmse_dollars
      |FROM errs GROUP BY model ORDER BY model""".stripMargin
  }

  // --- trailing rolling median / IQR ---------------------------------------------
  /** Trailing 7-day rolling median and quartiles of daily revenue —
    * the robust local baseline monitoring uses where [[ewma]] is the
    * smooth one (a single spiked day drags a mean-based baseline but
    * not the median; dev/IQR is the robust z the alarm thresholds).
    * Full windows only (the [[seasonalDecompose]] edge rule: the
    * first 6 grid days have no 7-day history).
    *
    * Determinism: with EXACTLY 7 values the order statistics need no
    * interpolation contract at all — median = 3rd, quartiles = 1st
    * and 5th of the sorted window (positions (n+1)/4, (n+1)/2,
    * 3(n+1)/4 are integral at n = 7) — so med/q1/q3/IQR/deviation are
    * all exact BIGINT cents; dev/IQR is the one IEEE division. Both
    * engines collect the frame in d-order and sort it, so the lists
    * are identical.
    *
    * Scale: one fold of orders into the materialized calendar day
    * grid; the 7-row trailing window rides that bounded grid
    * (allowlisted class).
    */
  def rollingMedian(s: SparkSession, dir: String): DataFrame = {
    val series = Graft.materialize(dailyRevenue(s, dir))
    val w = Window.orderBy(col("d")).rowsBetween(-6, 0)
    series
      .withColumn("win", collect_list(col("rev_cents")).over(w))
      .filter(size(col("win")) === 7)
      .withColumn("srt", array_sort(col("win")))
      .select(col("d"), col("rev_cents"),
        element_at(col("srt"), 4).as("med7_cents"),
        element_at(col("srt"), 2).as("q1_cents"),
        element_at(col("srt"), 6).as("q3_cents"))
      .withColumn("iqr_cents", col("q3_cents") - col("q1_cents"))
      .withColumn("dev_cents", col("rev_cents") - col("med7_cents"))
      .withColumn("dev_over_iqr",
        when(col("iqr_cents") > 0L,
          col("dev_cents").cast("double") / col("iqr_cents").cast("double")))
      .orderBy(col("d"))
  }

  val rollingMedianSql: String =
    """WITH rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |win AS (
      |  SELECT d, y, list_sort(list(y) OVER (ORDER BY d
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS srt
      |  FROM rev),
      |full_ AS (
      |  SELECT d, y AS rev_cents, srt[4] AS med7_cents,
      |    srt[2] AS q1_cents, srt[6] AS q3_cents
      |  FROM win WHERE len(srt) = 7)
      |SELECT d, rev_cents, med7_cents, q1_cents, q3_cents,
      |  q3_cents - q1_cents AS iqr_cents,
      |  rev_cents - med7_cents AS dev_cents,
      |  CASE WHEN q3_cents - q1_cents > 0 THEN
      |    CAST(rev_cents - med7_cents AS DOUBLE)
      |      / CAST(q3_cents - q1_cents AS DOUBLE) END AS dev_over_iqr
      |FROM full_ ORDER BY d""".stripMargin

  // --- Holt linear-trend smoothing ----------------------------------------------
  /** Holt's linear (double-exponential) smoothing of daily revenue
    * with α = 1/5, β = 1/10 — the trend-aware successor to [[ewma]]
    * (Holt 1957/2004): a level that forgets geometrically PLUS a
    * smoothed slope, which is what a capacity planner actually wants
    * from a growing series (EWMA systematically lags a trending
    * level; Holt's one-step-ahead forecast l + b does not). Reports
    * the last 30 grid days with level, trend, the one-step-ahead
    * fitted value f_t = l_{t−1} + b_{t−1}, and its residual — the
    * in-sample forecast error the chart alarms on.
    *
    * Determinism: both recursions stay on the integer MICROCENT grid
    *   l_t = (y_t·10⁶ + 4·(l_{t−1} + b_{t−1})) div 5
    *   b_t = ((l_t − l_{t−1}) + 9·b_{t−1}) div 10
    * seeded l₁ = y₁·10⁶, b₁ = (y₂ − y₁)·10⁶ — `div` truncates toward
    * zero for the (possibly negative) trend in BOTH engines (Scala
    * Long division == DuckDB's (a − a%b)/b spelling), so all ~2.4k
    * steps are bit-identical and the oracle replays the IDENTICAL
    * two-state integer recursion as a recursive CTE. Every reported
    * double is one IEEE division.
    *
    * Scale: identical posture to [[ewma]] — one fold of orders into
    * the calendar day grid, then an inherently sequential recursion
    * over the COLLECTED calendar-bounded grid (driver-side, the
    * markov_stationary precedent).
    */
  def holtLinear(s: SparkSession, dir: String, lastN: Int = 30): DataFrame = {
    val series = dailyRevenue(s, dir)
      .orderBy(col("d"))
      .collect().map(r => (r.getDate(0), r.getLong(1)))
    require(series.length >= 2, "holtLinear needs at least two grid days")
    val l = new Array[Long](series.length)
    val b = new Array[Long](series.length)
    val f = new Array[Long](series.length)
    for (i <- series.indices) {
      if (i == 0) {
        l(0) = series(0)._2 * 1000000L
        b(0) = (series(1)._2 - series(0)._2) * 1000000L
        f(0) = l(0)
      } else {
        f(i) = l(i - 1) + b(i - 1)
        l(i) = (series(i)._2 * 1000000L + 4L * f(i)) / 5L
        b(i) = ((l(i) - l(i - 1)) + 9L * b(i - 1)) / 10L
      }
    }
    import s.implicits._
    val from = series.length - math.min(lastN, series.length)
    series.indices.drop(from)
      .map { i =>
        val (d, y) = series(i)
        (d, y, l(i), b(i), f(i), y * 1000000L - f(i),
          l(i) / 1e6 / 100.0, b(i) / 1e6 / 100.0)
      }
      .toDF("d", "rev_cents", "level_micro", "trend_micro", "fitted_micro",
        "resid_micro", "level_dollars", "trend_dollars")
  }

  /** DuckDB twin of [[holtLinear]] — the identical two-state integer
    * recursion as a recursive CTE, derived from the SAME lastN. */
  def holtLinearSql(lastN: Int = 30): String = {
    val lStep = PortableSql.intDiv("g.y * 1000000 + 4 * (it.l + it.b)", "5")
    s"""WITH RECURSIVE
      |rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |g AS (SELECT d, y,
      |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      |      FROM rev),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM g),
      |it(i, d, y, l, b, f) AS (
      |  SELECT g1.i, g1.d, g1.y, g1.y * 1000000,
      |    (g2.y - g1.y) * 1000000, g1.y * 1000000
      |  FROM g g1 JOIN g g2 ON g1.i = 1 AND g2.i = 2
      |  UNION ALL
      |  SELECT g.i, g.d, g.y,
      |    $lStep,
      |    ${PortableSql.intDiv(
             s"(${PortableSql.intDiv("g.y * 1000000 + 4 * (it.l + it.b)", "5")}" +
               " - it.l) + 9 * it.b", "10")},
      |    it.l + it.b
      |  FROM it JOIN g ON g.i = it.i + 1)
      |SELECT d, y AS rev_cents, l AS level_micro, b AS trend_micro,
      |  f AS fitted_micro, y * 1000000 - f AS resid_micro,
      |  CAST(l AS DOUBLE) / 1e6 / 100.0 AS level_dollars,
      |  CAST(b AS DOUBLE) / 1e6 / 100.0 AS trend_dollars
      |FROM it, n WHERE i > n_days - $lastN ORDER BY d""".stripMargin
  }

  /** DuckDB twin of [[ewma]] — the same integer recursion as a
    * recursive CTE over the same day grid, derived from the SAME
    * lastN parameter. */
  def ewmaSql(lastN: Int = 60): String = {
    val step = PortableSql.intDiv("g.y * 1000000 + 4 * it.s", "5")
    val lvl = PortableSql.intDiv("s", "1000000")
    s"""WITH RECURSIVE
      |rev AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
      |         AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |g AS (SELECT d, y,
      |        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      |      FROM rev),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM g),
      |it(i, d, y, s) AS (
      |  SELECT i, d, y, y * 1000000 FROM g WHERE i = 1
      |  UNION ALL
      |  SELECT g.i, g.d, g.y, $step
      |  FROM it JOIN g ON g.i = it.i + 1)
      |SELECT d, y AS rev_cents, s AS ewma_microcents,
      |  CAST(s AS DOUBLE) / 1e6 / 100.0 AS ewma_dollars,
      |  y - $lvl AS resid_cents
      |FROM it, n WHERE i > n_days - $lastN ORDER BY d""".stripMargin
  }
}
