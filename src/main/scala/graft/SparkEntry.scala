package graft

import java.nio.file.Files
import java.time.LocalDateTime

import graft.ingest.{DolarIngest, RawZone}
import graft.llm.{Multimodal, MinHashDedup, SimHashDedup}
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a pure DataFrame transform over the
  * test tables in `sfDir` (no actions except the self-contained dolar
  * e2e demo, which materializes its own fixture micro-table first).
  * Entries with a matching [[oracleSql]] are hash-checked against DuckDB
  * on the same parquet; the rest are rows-only checked and covered by
  * ScalaTest specs instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** Deterministic raw-zone fixture shared by the dolar e2e pair AND
    * their DuckDB oracle: the same two payloads (the byte payload from
    * /root/reference/tests/tests.py:83 plus a bad-rows file), staged
    * byte-identically under a FIXED path on every run so the oracle can
    * `read_text` the very files the Spark pipeline ingested. r17
    * graduation: the per-run tmp dir was the only reason the e2e pair
    * was rows-only (adjudicated class 4 through r16).
    */
  private[graft] val E2eFixtureDir: String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_fixtures", "dolar_e2e", "raw").toString

  private val E2eGoodEpoch = 1704164645L
  private val E2eBadRowsEpoch = 1704164646L

  private[graft] def stageE2eFixture(): String = {
    val _ = RawZone.write(E2eFixtureDir, E2eGoodEpoch,
      """[["1757509256000","3920.12"],["1757509266000","3921.55"]]""")
    // one corrupt row (bad valor), one wrong arity — dropped + counted
    val _ = RawZone.write(E2eFixtureDir, E2eBadRowsEpoch,
      """[["1757509276000","abc"],["1757509286000","3922.77"],["x"]]""")
    // a stale glob-matching file from an older fixture version would
    // silently widen both engines' inputs — drop anything not staged here
    val keep = Set(RawZone.key(E2eGoodEpoch), RawZone.key(E2eBadRowsEpoch))
    val dir = java.nio.file.Paths.get(E2eFixtureDir)
    val listing = Files.list(dir)
    try listing.forEach { p =>
      val n = p.getFileName.toString
      if (RawZone.matchesKey(n) && !keep(n)) { val _ = Files.deleteIfExists(p) }
    } finally listing.close()
    E2eFixtureDir
  }

  /** Self-contained reference-parity demo: staged fixture payloads
    * -> raw zone -> batch ingest (H1-H3 semantics) -> interval query,
    * formatted at the serving edge (F2). Hash-checked since r17 against
    * DuckDB replaying the SAME staged files ([[dolarE2eSql]]).
    */
  private def dolarE2e(s: SparkSession, dir: String): DataFrame = {
    val raw = stageE2eFixture()
    val tmp = Files.createTempDirectory("graft_dolar_e2e")
    val dest = tmp.resolve("dolar").toString
    val _ = DolarIngest.batchToPath(s, raw, dest)
    IntervalQuery.formatted(IntervalQuery.over(s.read.parquet(dest),
      LocalDateTime.parse("2025-09-10T00:00:00"),
      LocalDateTime.parse("2025-09-11T00:00:00")))
  }

  /** STREAMING spelling of [[dolarE2e]] — the reference's one real
    * pipeline (raw zone → event-driven parse/load → interval query)
    * exercised through Structured Streaming in the driver harness, not
    * only in StreamingSpec: file discovery with the `dolar-*.json` glob
    * (A4/A5), `Trigger.AvailableNow` drain (G1), checkpointed
    * exactly-once foreachBatch (G3), per-microbatch atomicity (G5),
    * corrupt-row drop + bad-file fail semantics (H1/H2) — then the same
    * inclusive interval query as the batch twin. Hash-checked since r17
    * ([[dolarE2eSql]] over the staged fixture); StreamingSpec pins the
    * stream/batch output equality and checkpoint-replay exactly-once.
    */
  private def dolarE2eStream(s: SparkSession, dir: String): DataFrame = {
    val raw = stageE2eFixture()
    val tmp = Files.createTempDirectory("graft_dolar_e2e_stream")
    val dest = tmp.resolve("dolar").toString
    DolarIngest.stream(s, raw, dest, tmp.resolve("chk").toString)
      .awaitTermination()
    IntervalQuery.formatted(IntervalQuery.over(s.read.parquet(dest),
      LocalDateTime.parse("2025-09-10T00:00:00"),
      LocalDateTime.parse("2025-09-11T00:00:00")))
  }

  /** G2 in its CONTINUOUS spelling: the same raw-zone stream driven by
    * `Trigger.ProcessingTime` instead of the batch-parity AvailableNow
    * drain — the reference's on-file-arrival mode
    * (/root/reference/lambda/zappa_settings.json:49-57) where the query
    * stays up and each new object lands in a later microbatch. The
    * two-batch choreography is deterministic: file 1 is fully drained
    * (`processAllAvailable`) BEFORE file 2 is written, so the files
    * cannot share a microbatch; StreamingSpec pins exactly two
    * non-empty microbatches and the same output as the batch twin.
    * Rows-only (class 4: the per-run tmp zone exists to exercise the
    * live trigger, and the result duplicates the oracle-checked
    * [[dolarE2eStream]] rows).
    */
  private def dolarE2eStreamPt(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_dolar_e2e_pt")
    val raw = tmp.resolve("raw").toString
    val dest = tmp.resolve("dolar").toString
    val _ = RawZone.write(raw, E2eGoodEpoch,
      """[["1757509256000","3920.12"],["1757509266000","3921.55"]]""")
    val q = DolarIngest.stream(s, raw, dest, tmp.resolve("chk").toString,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try {
      q.processAllAvailable() // microbatch 1: file 1 alone
      val _ = RawZone.write(raw, E2eBadRowsEpoch,
        """[["1757509276000","abc"],["1757509286000","3922.77"],["x"]]""")
      q.processAllAvailable() // microbatch 2: file 2, on a later tick
    } finally q.stop()
    IntervalQuery.formatted(IntervalQuery.over(s.read.parquet(dest),
      LocalDateTime.parse("2025-09-10T00:00:00"),
      LocalDateTime.parse("2025-09-11T00:00:00")))
  }

  /** DuckDB twin of the dolar e2e pair: replay the SAME staged raw-zone
    * files ([[stageE2eFixture]] wrote them before the Spark result was
    * dumped; Verify emits this SQL afterwards, so the files exist and
    * are byte-stable when the oracle runs) through DuckDB's JSON
    * functions — glob filter (A5), array-of-arrays parse (A6), per-row
    * arity/convert predicate (B4/H2), second truncation (F1), decimal
    * cast (F3), inclusive interval (B2), sort (C1), format (F2).
    */
  private val dolarE2eSql: String =
    s"""WITH files AS (
       |  SELECT content FROM read_text('$E2eFixtureDir/dolar-*.json')
       |), pairs AS (
       |  SELECT unnest(from_json(content, '["JSON"]')) AS pair FROM files
       |), rows_ AS (
       |  SELECT date_trunc('second',
       |           epoch_ms(TRY_CAST(json_extract_string(pair, '$$[0]') AS BIGINT))) AS ts,
       |         TRY_CAST(json_extract_string(pair, '$$[1]') AS DECIMAL(12,4)) AS v,
       |         json_array_length(pair) AS arity
       |  FROM pairs
       |)
       |SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS fechahora,
       |       CAST(v AS DOUBLE) AS valor
       |FROM rows_
       |WHERE arity = 2 AND ts IS NOT NULL AND v IS NOT NULL
       |  AND ts >= TIMESTAMP '2025-09-10 00:00:00'
       |  AND ts <= TIMESTAMP '2025-09-11 00:00:00'
       |ORDER BY fechahora""".stripMargin

  /** Wire fixture for the oracle-checked reference-parity query: two good
    * pairs, a bad valor, a wrong-arity row, an over-arity row, and one
    * pair outside the queried interval (ts values from
    * /root/reference/tests/tests.py:83's payload epoch family).
    */
  private val ParityWire =
    """[["1757509256000","3920.12"],["1757509266000","3921.55"],""" +
      """["1757509276000","abc"],["3922.77"],["x","y","z"],""" +
      """["1788888888000","4000.00"]]"""

  /** Reference-parity chain (A6/B4/H2 parse -> F1 truncate -> F3 cast ->
    * B2 inclusive interval -> C1 sort -> F2 format), hash-checked
    * against DuckDB running the SAME wire literal through its JSON
    * functions — closes the round-2 gap where the flagship parity path
    * had only a rows-only check (`dolar_e2e_interval` materializes a tmp
    * fixture DuckDB can't see; this variant keeps the payload in the
    * query text so both engines parse identical bytes).
    */
  private def dolarParity(s: SparkSession, dir: String): DataFrame = {
    val raw = s.range(1).select(
      lit("wire-literal").as("file"),
      lit(ParityWire).as("value"))
    val rows = DolarIngest.parse(raw)
      .filter(col("valid"))
      .select(col("fechahora"), col("valor"))
    IntervalQuery.formatted(IntervalQuery.over(rows,
      LocalDateTime.parse("2025-09-10T00:00:00"),
      LocalDateTime.parse("2025-09-11T00:00:00")))
  }

  private val dolarParitySql: String =
    s"""WITH pairs AS (
       |  SELECT unnest(from_json('$ParityWire', '["JSON"]')) AS pair
       |), rows_ AS (
       |  SELECT date_trunc('second',
       |           epoch_ms(TRY_CAST(json_extract_string(pair, '$$[0]') AS BIGINT))) AS ts,
       |         TRY_CAST(json_extract_string(pair, '$$[1]') AS DECIMAL(12,4)) AS v,
       |         json_array_length(pair) AS arity
       |  FROM pairs
       |)
       |SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS fechahora,
       |       CAST(v AS DOUBLE) AS valor
       |FROM rows_
       |WHERE arity = 2 AND ts IS NOT NULL AND v IS NOT NULL
       |  AND ts >= TIMESTAMP '2025-09-10 00:00:00'
       |  AND ts <= TIMESTAMP '2025-09-11 00:00:00'
       |ORDER BY fechahora""".stripMargin

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference parity
    "dolar_e2e_interval" -> (dolarE2e _),
    "dolar_e2e_stream" -> (dolarE2eStream _),
    "dolar_e2e_stream_pt" -> (dolarE2eStreamPt _),
    "dolar_parity" -> (dolarParity _),
    "interval_events" -> (EventQueries.intervalEvents _),
    // relational: aggregation
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "agg_orders_by_priority" -> (Relational.aggOrdersByPriority _),
    "agg_cube" -> (Relational.aggCube _),
    "agg_rollup" -> (Relational.aggRollup _),
    "agg_count_distinct" -> (Relational.aggCountDistinct _),
    "agg_approx_distinct" -> (Relational.aggApproxDistinctAudit _),
    "agg_minmax_by_brand" -> (Relational.aggMinMaxByBrand _),
    "agg_mode_by_brand" -> (Relational.modeByBrand _),
    "agg_geomean_by_brand" -> (Relational.geomeanByBrand _),
    "agg_skew_kurtosis" -> (Relational.skewKurtosisByBrand _),
    "stats_quantiles_exact" -> (Relational.quantilesExact _),
    "seq_gap_islands" -> ((s, d) => Relational.eventIdIslands(s, d)),
    "agg_grouping_sets" -> (Relational.aggGroupingSets _),
    "agg_median_price" -> (Relational.aggMedianPrice _),
    "agg_nations_by_region" -> (Relational.aggNationsByRegion _),
    "pivot_status_counts" -> (Relational.pivotStatusCounts _),
    // relational: joins
    "q3_top_revenue" -> (Relational.q3TopRevenue _),
    "q5_local_supplier" -> (Relational.q5LocalSupplier _),
    "q7_volume_shipping" -> (Relational.q7VolumeShipping _),
    "q8_market_share" -> (Relational.q8MarketShare _),
    "q10_returned_items" -> (Relational.q10ReturnedItems _),
    "q14_promo_revenue" -> (Relational.q14PromoRevenue _),
    "q18_large_orders" -> (Relational.q18LargeOrders _),
    // TPC-H completion: the other 14 classic shapes (TpchShapes)
    "q2_min_cost_supplier" -> (TpchShapes.q2MinCostSupplier _),
    "q4_order_priority" -> (TpchShapes.q4OrderPriority _),
    "q6_forecast_revenue" -> (TpchShapes.q6ForecastRevenue _),
    "q9_product_profit" -> (TpchShapes.q9ProductProfit _),
    "q11_important_stock" -> (TpchShapes.q11ImportantStock _),
    "q12_ship_priority" -> (TpchShapes.q12ShipPriority _),
    "q13_cust_order_dist" -> (TpchShapes.q13CustOrderDist _),
    "q15_top_supplier" -> (TpchShapes.q15TopSupplier _),
    "q16_part_supplier_cnt" -> (TpchShapes.q16PartSupplierCnt _),
    "q17_small_qty_revenue" -> (TpchShapes.q17SmallQtyRevenue _),
    "q19_disjunctive_revenue" -> (TpchShapes.q19DisjunctiveRevenue _),
    "q20_excess_suppliers" -> (TpchShapes.q20ExcessSuppliers _),
    "q21_waiting_supplier" -> (TpchShapes.q21WaitingSupplier _),
    "q22_sales_opportunity" -> (TpchShapes.q22SalesOpportunity _),
    "join_broadcast_dim" -> (Relational.joinBroadcastDim _),
    "join_left_outer" -> (Relational.joinLeftOuter _),
    "join_semi" -> (Relational.joinSemi _),
    "join_anti" -> (Relational.joinAnti _),
    "bucketed_join" -> (graft.plans.Bucketing.bucketedJoinDemo _),
    "join_skew_salted" -> (graft.plans.SkewJoin.skewJoinDemo _),
    "zorder_layout" -> (graft.plans.ZOrder.zorderLayout _),
    // relational: windows / set ops / sort-limit / scan
    "window_rank_orders" -> (Relational.windowRankOrders _),
    "setop_union" -> (Relational.setopUnion _),
    "setop_intersect" -> (Relational.setopIntersect _),
    "setop_except" -> (Relational.setopExcept _),
    "topk_orders" -> (Relational.topkOrders _),
    "scan_filter_project" -> (Relational.scanFilterProject _),
    "subquery_exists" -> (Relational.subqueryExists _),
    "subquery_not_exists" -> (Relational.subqueryNotExists _),
    "subquery_scalar_avg" -> (Relational.subqueryScalarAvg _),
    "subquery_in" -> (Relational.subqueryIn _),
    "subquery_not_in" -> (Relational.subqueryNotIn _),
    "join_full_outer" -> (Relational.joinFullOuter _),
    "join_fuzzy_name" -> (Relational.joinFuzzyName _),
    "dedup_typo_pairs" -> (Relational.typoPairs _),
    "window_distribution" -> (Relational.windowDistribution _),
    "agg_monthly_revenue" -> (Relational.aggMonthlyRevenue _),
    "profile_columns" -> (Relational.profileColumns _),
    "integrity_checksum" -> (Relational.integrityChecksum _),
    "order_cycle_time" -> (Relational.orderCycleTime _),
    "ivm_refresh" -> (Relational.ivmRefresh _),
    "stats_histogram" -> (Relational.statsHistogram _),
    "attribution_last_touch" -> (EventQueries.attributionLastTouch _),
    "sketch_quantile_rollup" -> (EventQueries.quantileRollup _),
    "funnel_stages" -> (EventQueries.funnelStages _),
    "snapshot_diff" -> (Relational.snapshotDiff _),
    "join_explosion_check" -> (EventQueries.joinExplosionCheck _),
    "stats_correlation" -> (Relational.statsCorrelation _),
    "embed_quant_error" -> (EmbeddingQueries.quantErrorReport _),
    "mixture_temperature_alloc" -> (Sampling.mixtureTemperatureAlloc _),
    "sample_reservoir_per_key" -> ((s, d) => Sampling.reservoirPerKey(s, d)),
    "compaction_plan" -> ((s, d) => graft.plans.Compaction.compactionPlan(s, d)),
    "agg_string_concat" -> (Relational.aggStringConcat _),
    "string_funcs" -> (Relational.stringFuncs _),
    // time series / streaming duals
    "window_tumbling_hourly" -> (EventQueries.tumblingHourly _),
    "window_moving_avg" -> (EventQueries.movingAvg _),
    "window_range_hour" -> (EventQueries.rangeLastHour _),
    "window_lag_delta" -> (EventQueries.lagDelta _),
    "sessionize_events" -> (EventQueries.sessionize _),
    "asof_purchase" -> (EventQueries.asofPurchase _),
    "asof_next_purchase" -> (EventQueries.asofNextPurchase _),
    "asof_nearest" -> (EventQueries.asofNearest _),
    "range_join_nearby" -> ((s, d) => EventQueries.rangeJoinNearby(s, d)),
    "range_join_overlap" -> (EventQueries.rangeJoinOverlap _),
    "events_gapfill_daily" -> (EventQueries.gapfillDaily _),
    "events_funnel" -> (EventQueries.funnel _),
    "events_dau_wau" -> (EventQueries.dauWau _),
    "events_value_quantiles" -> (EventQueries.valueQuantiles _),
    "events_json_props" -> (EventQueries.jsonProps _),
    "scd2_history" -> (EventQueries.scd2History _),
    "events_retention_cohorts" -> (EventQueries.retentionCohorts _),
    "events_anomaly_zscore" -> (EventQueries.anomalyZscore _),
    "cdc_latest_state" -> (EventQueries.cdcLatestState _),
    "window_session_native" -> (EventQueries.sessionWindowNative _),
    "events_value_quantiles_approx" ->
      ((s, d) => EventQueries.valueQuantilesApproxAudit(s, d)),
    "events_quantile_rank_audit" -> (EventQueries.quantileRankAudit _),
    "events_markov_stationary" -> ((s, d) => EventQueries.markovStationary(s, d)),
    "events_markov_attribution" -> ((s, d) => EventQueries.markovAttribution(s, d)),
    "attribution_position" -> ((s, d) => EventQueries.attributionPosition(s, d)),
    "events_growth_accounting" -> (EventQueries.growthAccounting _),
    "events_markov_transitions" -> (EventQueries.markovTransitions _),
    "events_markov_entropy" -> (EventQueries.markovEntropyRate _),
    "events_time_weighted_avg" -> (EventQueries.timeWeightedAvg _),
    "events_activity_streaks" -> (EventQueries.activityStreaks _),
    "typed_group_stats" -> (EventQueries.typedGroupStats _),
    "text_hash_features" -> (TextQueries.hashFeatures _),
    "text_importance_dsir" -> ((s, d) => TextQueries.importanceDsir(s, d)),
    "text_compression_ratio" -> (TextQueries.compressionAudit _),
    "text_repeated_passages" -> (TextQueries.repeatedPassages _),
    "agg_regr_slope" -> (Relational.aggRegrSlope _),
    "agg_yoy_growth" -> (Relational.aggYoyGrowth _),
    "customer_rfm" -> (Relational.customerRfm _),
    "customer_rfm_approx" -> (Relational.customerRfmApproxAudit _),
    "merge_upsert" -> (EventQueries.mergeUpsert _),
    // graph analytics
    "graph_pagerank" -> (GraphQueries.pagerank _),
    "graph_ppr_walks" -> ((s, d) => GraphQueries.pprWalks(s, d)),
    "graph_copurchase" -> (GraphQueries.copurchasePairs _),
    "graph_triangles" -> ((s, d) => GraphQueries.triangleCount(s, d)),
    // the beyond-broadcast spelling: same joins, hash-partitioned —
    // same oracle, so the driver proves count equality between modes
    "graph_triangles_partitioned" ->
      ((s, d) => GraphQueries.triangleCount(s, d, broadcastAdj = false)),
    "graph_khop_reach" -> ((s, d) => GraphQueries.khopReach(s, d)),
    "graph_closeness_sampled" -> ((s, d) => GraphQueries.closenessSampled(s, d)),
    "graph_sssp" -> ((s, d) => GraphQueries.ssspBounded(s, d)),
    "graph_assortativity" -> (GraphQueries.assortativity _),
    "graph_avg_neighbor_degree" -> (GraphQueries.avgNeighborDegree _),
    "ts_hurst_rs" -> (TimeSeries.hurstRs _),
    "graph_label_propagation" -> ((s, d) => GraphQueries.labelPropagation(s, d)),
    "stats_gini_spend" -> (Relational.giniSpend _),
    "stats_theil_nation" -> (Relational.theilNation _),
    "stats_atkinson_mld" -> (Relational.atkinsonMld _),
    "docs_pielou_evenness" -> (TextQueries.pielouEvenness _),
    "docs_readability" -> (TextQueries.readability _),
    "docs_source_jsd" -> ((s, d) => TextQueries.sourceJsd(s, d)),
    "docs_length_histogram" -> (TextQueries.lengthHistogram _),
    "events_hill_tail_index" -> ((s, d) => EventQueries.hillTailIndex(s, d)),
    "events_interarrival" -> (EventQueries.interArrival _),
    "events_hourly_profile" -> (EventQueries.hourlyProfile _),
    "events_poisson_rate" -> (EventQueries.poissonRateTest _),
    "stats_benford" -> (Governance.benford _),
    "stats_jarque_bera" -> (Relational.jarqueBera _),
    "stats_chi2_independence" -> (Relational.chi2Cells _),
    "stats_cramers_v" -> (Relational.cramersV _),
    "stats_g_test" -> (Relational.gTest _),
    "stats_trimmed_mean" -> ((s, d) => Relational.trimmedMean(s, d)),
    "stats_sign_test" -> (Relational.signTest _),
    "stats_bowker_symmetry" -> (Relational.bowkerSymmetry _),
    "stats_bh_adjust" -> (MultipleTesting.bhAdjust _),
    "graph_reciprocity" -> (Relational.reciprocity _),
    "text_ngram_novelty" -> (TextQueries.ngramNovelty _),
    "text_zipf_slope" -> ((s, d) => TextQueries.zipfSlope(s, d)),
    // time series
    "ts_seasonal_decompose" -> (TimeSeries.seasonalDecompose _),
    "ts_changepoint_cusum" -> (TimeSeries.cusumChangepoint _),
    "ts_peaks" -> ((s, d) => TimeSeries.peaks(s, d)),
    "ts_autocorrelation" -> (TimeSeries.autocorrelation _),
    "ts_ljung_box" -> ((s, d) => TimeSeries.ljungBox(s, d)),
    "ts_pacf" -> (TimeSeries.pacf _),
    "ts_cross_correlation" -> (TimeSeries.crossCorrelation _),
    "ts_granger_lag1" -> (TimeSeries.grangerLag1 _),
    "ts_permutation_entropy" -> (TimeSeries.permutationEntropy _),
    "ts_sample_entropy" -> (TimeSeries.sampleEntropy _),
    "ts_dickey_fuller" -> (TimeSeries.dickeyFuller _),
    "ts_pettitt" -> (TimeSeries.pettitt _),
    "ts_ewma" -> ((s, d) => TimeSeries.ewma(s, d)),
    "ts_holt_linear" -> ((s, d) => TimeSeries.holtLinear(s, d)),
    "ts_rolling_median" -> (TimeSeries.rollingMedian _),
    "ts_forecast_backtest" -> ((s, d) => TimeSeries.forecastBacktest(s, d)),
    "ts_stl_anomaly" -> ((s, d) => TimeSeries.stlAnomaly(s, d)),
    "stats_dispersion_index" -> (TimeSeries.dispersionIndex _),
    "drift_qq_deciles" -> (Drift.qqDeciles _),
    "ab_conversion_ztest" -> ((s, d) => Drift.abConversion(s, d)),
    "ab_cuped_revenue" -> (Drift.abCuped _),
    "ab_permutation_test" -> ((s, d) => Drift.abPermutationTest(s, d)),
    "ab_power_mde" -> ((s, d) => Drift.abPowerMde(s, d)),
    "ab_srm_check" -> (Drift.abSrmCheck _),
    "ab_delta_ratio_ci" -> (Drift.abDeltaRatio _),
    "eval_brier_score" -> (Evaluation.brierScore _),
    "eval_score_agreement" -> (Evaluation.scoreAgreement _),
    "stats_hodges_lehmann" -> (TimeSeries.hodgesLehmann _),
    "stats_page_trend" -> (Drift.pageTrend _),
    "events_wilson_ci" -> (EventQueries.wilsonCi _),
    "drift_cvm" -> (Drift.cvm _),
    "stats_ansari_bradley" -> (Drift.ansariBradley _),
    "ts_holt_winters" -> ((s, d) => TimeSeries.holtWinters(s, d)),
    "events_rfm_migration" -> (EventQueries.rfmMigration _),
    "drift_effect_size" -> (Drift.effectSize _),
    "pii_reid_risk" -> ((s, d) => Governance.reidRisk(s, d)),
    "eval_pr_threshold_sweep" -> (Evaluation.prThresholdSweep _),
    "ts_seasonal_strength" -> (TimeSeries.seasonalStrength _),
    "stats_power_law_alpha" -> (EventQueries.powerLawAlpha _),
    "ts_theil_sen" -> (TimeSeries.theilSen _),
    "survival_km" -> (Survival.kaplanMeier _),
    "survival_nelson_aalen" -> (Survival.nelsonAalen _),
    "survival_aalen_johansen" -> ((s, d) => Survival.aalenJohansen(s, d)),
    "survival_logrank" -> (Survival.logRank _),
    "survival_rmst" -> ((s, d) => Survival.rmst(s, d)),
    "survival_life_table" -> ((s, d) => Survival.lifeTable(s, d)),
    "survival_hazard_ratio" -> (Survival.hazardRatio _),
    "stats_ks_uniform_weekday" -> (Relational.ksUniformWeekday _),
    "stats_decile_lift" -> (Relational.decileLift _),
    "events_max_concurrency" -> (EventQueries.maxConcurrency _),
    "cohort_ltv" -> (Relational.cohortLtv _),
    "basket_rules" -> ((s, d) => GraphQueries.basketRules(s, d)),
    "events_session_paths" -> (EventQueries.sessionPaths _),
    "drift_welch_ttest" -> (Drift.welchTTest _),
    "events_reach_curve" -> (EventQueries.reachCurve _),
    "stats_histogram_eqdepth" -> (Relational.statsHistogramEqdepth _),
    "embed_outliers" -> ((s, d) => EmbeddingQueries.outliersByLabel(s, d)),
    "stats_anova_priority" -> (Relational.anovaPriority _),
    "stats_levene" -> (Relational.levenePriority _),
    "stats_mcnemar" -> (Relational.mcnemarYears _),
    "stats_wilcoxon_signed" -> (Drift.wilcoxonSignedRank _),
    "stats_friedman" -> (Drift.friedman _),
    "stats_cochran_armitage" -> (Relational.cochranArmitage _),
    "stats_kruskal_wallis" -> (Relational.kruskalWallis _),
    "stats_dunn_pairs" -> (Relational.dunnPairs _),
    "stats_tukey_hsd" -> (Relational.tukeyHsd _),
    "stats_bartlett" -> (Relational.bartlett _),
    "stats_mood_median" -> (Relational.moodMedian _),
    "eval_roc_auc" -> (Evaluation.rocAuc _),
    "eval_average_precision" -> (Evaluation.averagePrecision _),
    "eval_calibration" -> (Evaluation.calibration _),
    "eval_self_retrieval_mrr" -> ((s, d) => Evaluation.selfRetrievalMrr(s, d)),
    "eval_ndcg" -> ((s, d) => Evaluation.ndcg(s, d)),
    "text_jsd_langs" -> ((s, d) => TextQueries.jsdLangs(s, d)),
    "docs_simpson_diversity" -> (TextQueries.simpsonDiversity _),
    "docs_hapax_share" -> (TextQueries.hapaxShare _),
    "docs_yule_k" -> (TextQueries.yuleK _),
    "docs_mattr" -> ((s, d) => TextQueries.mattr(s, d)),
    "text_gopher_repetition" -> (TextQueries.gopherRepetition _),
    "text_good_turing" -> ((s, d) => TextQueries.goodTuring(s, d)),
    "text_word_burstiness" -> ((s, d) => TextQueries.wordBurstiness(s, d)),
    "text_langid_prf" -> (TextQueries.langIdPrf _),
    "stats_cohens_kappa" -> (TextQueries.cohensKappa _),
    "docs_heaps_law" -> ((s, d) => TextQueries.heapsLaw(s, d)),
    "events_burstiness" -> (EventQueries.burstiness _),
    "ts_mann_kendall" -> (TimeSeries.mannKendall _),
    "ts_seasonal_mann_kendall" -> (TimeSeries.seasonalMannKendall _),
    "events_unattributed" -> (EventQueries.unattributedPurchases _),
    "graph_kcore" -> ((s, d) => GraphQueries.kcorePeel(s, d)),
    "stats_hhi_nation" -> (Relational.hhiNation _),
    "events_user_entropy" -> (EventQueries.userEntropy _),
    "stats_mutual_info" -> (EventQueries.mutualInfo _),
    "sample_poisson_bootstrap" -> ((s, d) => Sampling.poissonBootstrap(s, d)),
    "text_doc_keywords" -> ((s, d) => TextQueries.docKeywords(s, d)),
    "ts_runs_test" -> (TimeSeries.runsTest _),
    "ts_spearman" -> (TimeSeries.spearmanDaily _),
    "ts_kendall_tau" -> (TimeSeries.kendallTau _),
    "ts_turning_points" -> (TimeSeries.turningPoints _),
    "ts_variance_ratio" -> ((s, d) => TimeSeries.varianceRatio(s, d)),
    "graph_clustering_coeff" -> (GraphQueries.clusteringCoeff _),
    "graph_link_jaccard" -> ((s, d) => GraphQueries.linkJaccard(s, d)),
    // beyond-broadcast twin: adjacency consumed via shuffled hash
    // joins — same oracle, so the driver proves mode equality
    "graph_link_jaccard_partitioned" ->
      ((s, d) => GraphQueries.linkJaccard(s, d, 20, broadcastAdj = false)),
    "graph_resource_alloc" -> ((s, d) => GraphQueries.resourceAlloc(s, d)),
    "graph_resource_alloc_partitioned" ->
      ((s, d) => GraphQueries.resourceAlloc(s, d, 20, broadcastAdj = false)),
    "graph_adamic_adar" -> ((s, d) => GraphQueries.adamicAdar(s, d)),
    "graph_adamic_adar_partitioned" ->
      ((s, d) => GraphQueries.adamicAdar(s, d, 20, broadcastAdj = false)),
    "graph_common_neighbors" -> ((s, d) => GraphQueries.commonNeighbors(s, d)),
    "graph_pref_attachment" -> ((s, d) => GraphQueries.prefAttachment(s, d)),
    "graph_katz_walks" -> ((s, d) => GraphQueries.katzWalks(s, d)),
    "graph_degree_histogram" -> (GraphQueries.degreeHistogram _),
    "graph_rich_club" -> (GraphQueries.richClub _),
    "graph_local_bridges" -> ((s, d) => GraphQueries.localBridges(s, d)),
    "graph_hits_walks" -> ((s, d) => GraphQueries.hitsWalks(s, d)),
    "dedup_containment" -> ((s, d) => TextQueries.dedupContainment(s, d)),
    "drift_mann_whitney" -> (Drift.mannWhitney _),
    "events_funnel_within" -> ((s, d) => EventQueries.funnelWithin(s, d)),
    "unpivot_metrics" -> (Relational.unpivotMetrics _),
    "stats_weighted_median" -> (Relational.weightedMedian _),
    "governance_delete_impact" -> (Governance.deleteImpact _),
    "text_vocab_coverage" -> ((s, d) => TextQueries.vocabCoverage(s, d)),
    // dataset governance
    "dq_expectations" -> (Governance.dqExpectations _),
    "pii_k_anonymity" -> ((s, d) => Governance.kAnonymity(s, d)),
    "pii_l_diversity" -> ((s, d) => Governance.lDiversity(s, d)),
    "pii_t_closeness" -> ((s, d) => Governance.tCloseness(s, d)),
    "split_leakage_audit" -> (Governance.splitLeakageAudit _),
    "pareto_frontier" -> (Governance.paretoFrontier _),
    "winsorize_stats" -> (Governance.winsorizeStats _),
    "split_balance_chisq" -> (Governance.splitBalanceChisq _),
    "embed_hard_negatives" -> ((s, d) => EmbeddingQueries.hardNegatives(s, d)),
    "join_size_estimate" -> (EventQueries.joinSizeEstimateAudit _),
    "drift_psi" -> ((s, d) => Drift.psi(s, d)),
    "drift_ks" -> (Drift.ks _),
    "graph_modularity" -> (GraphQueries.modularity _),
    "attribution_time_decay" -> (EventQueries.attributionTimeDecay _),
    "dq_functional_deps" -> (Governance.functionalDeps _),
    "pii_dp_release" -> (Governance.dpRelease _),
    "corpus_datacard" -> (Governance.datacard _),
    // text analysis
    "text_token_count" -> (TextQueries.tokenCount _),
    "text_token_bpeish" -> (TextQueries.tokenCountBpe _),
    "text_tokenizer_fertility" -> (TextQueries.tokenizerFertility _),
    "text_ngram_diversity" -> (TextQueries.ngramDiversity _),
    "text_winnow_fp" -> (TextQueries.winnowFingerprint _),
    "text_stats_by_lang" -> (TextQueries.statsByLang _),
    "text_quality_score" -> (TextQueries.qualityScore _),
    "text_quality_funnel" -> (TextQueries.qualityFunnel _),
    "text_char_entropy" -> (TextQueries.charEntropy _),
    "text_bigram_entropy_rate" -> (TextQueries.bigramEntropyRate _),
    "text_vocab_overlap" -> ((s, d) => TextQueries.vocabOverlap(s, d)),
    "docs_length_ks_pairs" -> (TextQueries.lengthKsPairs _),
    "text_lang_guess" -> (TextQueries.langGuessConfusion _),
    "text_fingerprint" -> (TextQueries.fingerprint _),
    "text_scrub_pii" -> (TextQueries.scrubPii _),
    "text_repetition" -> (TextQueries.repetitionStats _),
    "text_top_terms" -> (TextQueries.topTermsByDf _),
    "text_regex_extract" -> (TextQueries.regexExtract _),
    "text_first_positions" -> (TextQueries.firstPositions _),
    "dedup_incremental" -> (TextQueries.dedupIncremental _),
    "text_bigrams" -> (TextQueries.bigrams _),
    "text_bigram_pmi" -> ((s, d) => TextQueries.bigramPmi(s, d)),
    "text_trigram_lm" -> (TextQueries.trigramLm _),
    "docs_source_concentration" -> (TextQueries.sourceConcentration _),
    "text_normalize" -> (TextQueries.normalizeText _),
    "docs_chunk_sliding" -> (TextQueries.chunkSliding _),
    "text_bm25_terms" -> (TextQueries.bm25TopTerms _),
    "index_inverted" -> (TextQueries.invertedIndex _),
    "sketch_word_freq" -> (TextQueries.sketchWordFreqAudit _),
    "curation_pipeline" -> (TextQueries.curationPipeline _),
    "text_bpe_merge" -> (TextQueries.bpeMergeStep _),
    "text_bpe_train" -> ((s, d) => TextQueries.bpeTrain(s, d)),
    "text_bpe_encode" -> ((s, d) => TextQueries.bpeEncodeAudit(s, d)),
    "text_perplexity" -> (TextQueries.perplexity _),
    "text_ccnet_buckets" -> (TextQueries.ccnetBuckets _),
    "text_tfidf_terms" -> (TextQueries.tfidfTerms _),
    "events_value_mad" -> (EventQueries.valueMad _),
    "events_value_mad_approx" ->
      ((s, d) => EventQueries.valueMadApproxAudit(s, d)),
    "sketch_hll_rollup" -> (EventQueries.hllRollupAudit _),
    "sketch_hll_intersect" -> (EventQueries.hllIntersectAudit _),
    "sketch_topk_rollup" -> ((s, d) => EventQueries.topkRollupAudit(s, d)),
    // dataset management: deterministic splits / samples / skew diagnosis
    "sample_hash_split" -> (Sampling.hashSplit _),
    "sample_stratified" -> (Sampling.stratifiedSample _),
    "sample_systematic" -> (Sampling.systematicSample _),
    "sample_weighted" -> ((s, d) => Sampling.weightedSample(s, d)),
    "sample_neyman_allocation" -> ((s, d) => Sampling.neymanAllocation(s, d)),
    "events_skew_histogram" -> (Sampling.skewHistogram _),
    "decontaminate_ngram" -> (Sampling.decontaminate _),
    "decontaminate_bloom" -> (Sampling.decontaminateBloomAudit _),
    "pack_chunks" -> ((s, d) => Sampling.packChunks(s, d)),
    "mixture_downsample" -> (Sampling.mixtureDownsample _),
    // dedup
    "dedup_exact" -> (TextQueries.dedupExact _),
    "dedup_exact_paragraph" -> ((s, d) => TextQueries.dedupExactParagraph(s, d)),
    "dedup_paragraph_top" -> ((s, d) => TextQueries.dedupParagraphTop(s, d)),
    "dedup_paragraph_savings" -> ((s, d) => TextQueries.dedupParagraphSavings(s, d)),
    "dedup_exact_substring" -> ((s, d) => TextQueries.exactSubstringDedup(s, d)),
    "dedup_cluster_sizes" -> (TextQueries.dedupClusterSizes _),
    "dedup_ngram_jaccard" -> ((s, d) => TextQueries.dedupNgramJaccard(s, d)),
    "dedup_prefix_jaccard" -> ((s, d) => TextQueries.dedupPrefixJaccard(s, d)),
    "dedup_components" -> (graft.llm.DedupClusters.dedupComponents _),
    "dedup_keep_best" -> (graft.llm.DedupClusters.dedupKeepBest _),
    "dedup_minhash_lsh" -> ((s, d) => MinHashDedup.nearDupPairsAudit(s, d)),
    "dedup_lsh_bucket_audit" ->
      ((s, d) => MinHashDedup.bucketConservationAudit(s, d)),
    "dedup_minhash_signatures" -> (MinHashDedup.signatureAudit _),
    "dedup_simhash" -> ((s, d) => SimHashDedup.nearDupPairsAudit(s, d)),
    // similarity search
    "ann_topk_cosine" -> (EmbeddingQueries.annTopK _),
    "embed_intrinsic_dim" -> ((s, d) => EmbeddingQueries.intrinsicDim(s, d)),
    "ann_topk_cosine_i8" -> ((s, d) => EmbeddingQueries.annTopKI8(s, d)),
    "ann_ivf_topk" -> ((s, d) => EmbeddingQueries.annIvfAudit(s, d)),
    "ann_pq_topk" -> ((s, d) => EmbeddingQueries.annPqAudit(s, d)),
    "ann_ivfpq_topk" -> ((s, d) => EmbeddingQueries.annIvfPqAudit(s, d)),
    "embed_neardup_lsh" -> ((s, d) => EmbeddingQueries.nearDupLshAudit(s, d)),
    "embed_knn_graph" -> ((s, d) => EmbeddingQueries.knnGraph(s, d)),
    "embed_mmr_topk" -> ((s, d) => EmbeddingQueries.mmrTopK(s, d)),
    "embed_semdedup" -> ((s, d) => EmbeddingQueries.semDedupAudit(s, d)),
    "embed_centroid_by_label" -> (EmbeddingQueries.centroidByLabel _),
    "embed_silhouette" -> (EmbeddingQueries.silhouette _),
    "embed_norm_quantiles" -> (EmbeddingQueries.normQuantilesByLabel _),
    "embed_dim_ablation" -> (EmbeddingQueries.dimAblation _),
    "embed_threshold_sweep" -> (EmbeddingQueries.thresholdSweep _),
    "embed_pca_project" -> ((s, d) => EmbeddingQueries.pcaProjectAudit(s, d)),
    "embed_pca_explained" -> ((s, d) => EmbeddingQueries.pcaExplainedAudit(s, d)),
    // multimodal
    "multimodal_meta" -> (Multimodal.mediaMeta _),
    "multimodal_dedup" -> (Multimodal.mediaDedup _),
    "multimodal_cdc_chunks" -> ((s, d) => Multimodal.cdcChunkAudit(s, d)),
    "multimodal_cdc_pairs" -> ((s, d) => Multimodal.cdcPairsAudit(s, d)),
    "multimodal_decode_stub" -> (Multimodal.decodeFrames _),
    "multimodal_frame_sample" -> ((s, d) => Multimodal.sampleFrames(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * ==Why each rows-only entry has no oracle (permanent adjudications)==
    *
    * Every `queries` key absent here is rows-only BY DESIGN, for one of
    * five reasons, and each is pinned by a named spec instead:
    *
    *  1. '''Sketch registers are engine-specific''' — DataSketches HLL /
    *     ApproxTopK / CMS / count-sketch / t-digest state has no DuckDB
    *     equivalent, so value-level SQL parity is undefined; each is
    *     bounded against its EXACT in-engine dual instead — though as
    *     of r15 the whole class has graduated:
    *     (`agg_approx_distinct`, `customer_rfm_approx`,
    *     `sketch_hll_rollup`, `sketch_hll_intersect` and
    *     `sketch_topk_rollup` all carry structural-oracle audit
    *     registry entries — recomputable exact counts hash-checked
    *     beside error-envelope / KLL-rank / merge-consistency /
    *     top-k-coverage violation counters pinned to 0 — while the
    *     numeric estimates stay the spec-bounded `aggApproxDistinct`
    *     / `customerRfmApprox` / `hllRollup` / `hllIntersect` /
    *     `topkRollup` APIs.)
    *     (`events_value_quantiles_approx`/`events_value_mad_approx`
    *     graduated OUT in r15: their registry entries are now
    *     rank-guarantee audits — the (q±ε)·n window of every sketch
    *     estimate checked against exact ≤/< counts, violation
    *     counters pinned to 0 by the oracle beside recomputable group
    *     sizes/extremes; the per-value estimates stay the
    *     AnalyticsOpsSpec-bounded `valueQuantilesApprox` /
    *     `valueMadApprox` API. `join_size_estimate`
    *     and `sketch_word_freq` graduated in r12: their registry
    *     entries are structural-oracle audits — exact values beside
    *     each sketch's deterministic contract (AMS envelope boolean,
    *     CMS never-undercounts boolean) — so the contracts are
    *     driver-checked; the numeric estimates stay SketchSpec-pinned
    *     via `joinSizeEstimate` / `sketchWordFreq`.)
    *  2. '''Fixed-seed hash families DuckDB cannot replay''' — xxhash64
    *     MinHash permutations / SimHash planes / LSH band hashes aren't
    *     reproducible in portable SQL, but every reported PAIR passes an
    *     exact verify stage, and as of r16 the two PAIR-EMITTING legs
    *     graduated to recall-contract audits (the ANN-audit pattern):
    *     `dedup_minhash_lsh`'s registry entry pins "every exact-Jaccard
    *     ≥ 0.8 pair (DuckDB-recomputed via the oracle-checked
    *     `dedup_ngram_jaccard` SQL) is reported" and "every reported
    *     pair passed exact verify" as zero counters beside the exact
    *     pair count/id checksum, and `embed_neardup_lsh`'s pins the
    *     same contract against brute-force cosine ≥ 0.95 over the
    *     bounded vec_id < 500 universe — the pair LISTS stay the
    *     DedupSpec-pinned `nearDupPairs`/`nearDupLsh` APIs (recall vs
    *     exact, precision, hot-bucket cap, bucket-join plan).
    *     r17 closed the class: `dedup_simhash` graduated to the same
    *     recall contract (every exact-Jaccard ≥ 0.8 pair reported by
    *     the 4-table rotation probe, Hamming-verify leg pinned —
    *     [[graft.llm.SimHashDedup.nearDupPairsAudit]]), and
    *     `embed_semdedup` to a three-way geometric contract
    *     (precision vs the DuckDB-recomputed global shadow set,
    *     witness re-verify, uncapped in-cell min-keep completeness —
    *     [[graft.queries.EmbeddingQueries.semDedupAudit]]); the
    *     fingerprint / per-vector verdict lists stay the
    *     DedupSpec/EmbeddingSpec-pinned APIs.
    *     (Earlier graduations from this class: `dedup_minhash_signatures`
    *     in r15 — the structural signature audit with shingle-total /
    *     dup-text conservation and order-invariance counters;
    *     `dedup_lsh_bucket_audit` in r15 — the per-band conservation
    *     audit with drops pinned to 0, the top-k census staying the
    *     spec-pinned API; `decontaminate_bloom` in r12 — exact columns
    *     + the contract-constant zero-miss column, the fpp bound in
    *     SamplingSpec.)
    *  3. '''Iterative FP state (k-means / eigen / greedy)''' — the
    *     class FULLY GRADUATED in r16, two different ways.
    *     `embed_mmr_topk` got a FULL value oracle: its greedy chain is
    *     sequential but k and poolN are query constants, so the DuckDB
    *     twin UNROLLS the k argmax steps into single-row CTEs over the
    *     same bit-exact cosines — the whole (rank, id, relevance,
    *     score) chain hash-matches. The other five are structural
    *     audits (the CDC pattern): `ann_ivf_topk`/`ann_pq_topk`/
    *     `ann_ivfpq_topk` pin per-query size/recall-floor/rank-order
    *     violations to 0 beside the DuckDB-recomputed exact-leg
    *     (count, k-th cosine, id checksum), `embed_pca_explained` pins
    *     orthonormality/eigen-order/explained-bounds plus the
    *     from-the-data variance recompute of every eigenvalue, and
    *     `embed_pca_project` pins Bessel contraction + score centering
    *     per label beside nano-grid-exact Σ‖x‖². The ranked neighbor
    *     lists, eigenvalues and projections stay the
    *     EmbeddingSpec-pinned `annIvfTopK`/`annPqTopK`/`annIvfPqTopK`/
    *     `pcaExplained`/`pcaProject` APIs (recall ≥ 0.75 at BOTH gate
    *     SFs, orthonormality, variance-vs-eigenvalue agreement).
    *  4. '''Engine introspection / local fixtures''' — `compaction_plan`
    *     reads Spark's physical file listing (no DuckDB analogue;
    *     CompactionSpec bins are exact). The dolar e2e pair GRADUATED
    *     in r17: `dolar_e2e_interval`/`dolar_e2e_stream` now stage
    *     their raw-zone fixture at a deterministic path
    *     ([[stageE2eFixture]]) and are hash-checked against DuckDB
    *     `read_text`-ing the SAME files ([[dolarE2eSql]]) — the
    *     reference's one real pipeline is oracle-checked end to end.
    *     Still class 4: `dolar_e2e_stream_pt`, the
    *     Trigger.ProcessingTime spelling — its per-run tmp zone exists
    *     to exercise the LIVE trigger choreography (two real
    *     microbatches), and its rows duplicate the oracle-checked
    *     stream twin; StreamingSpec pins the two-batch drain.
    *  5. '''Algorithm-internal artifacts''' — `text_bpe_train` emits
    *     the merge table of an iterative trainer (AnalyticsOpsSpec:
    *     independent merge-round induction; the scorable step
    *     `text_bpe_merge` IS oracle-checked, and `text_bpe_encode`
    *     graduated in r17 to a round-trip/conservation contract —
    *     corpus vocabulary and character mass recomputed by DuckDB
    *     beside full-outer-join round-trip and residual-merge-pair
    *     violation counters pinned to 0
    *     ([[graft.queries.TextQueries.bpeEncodeAudit]]); the token
    *     histogram stays the AnalyticsOpsSpec-pinned `bpeEncode` API);
    *     `multimodal_decode_stub`/`multimodal_frame_sample` run the
    *     codec seam over opaque binary (MultimodalSpec planted
    *     fixtures; the CDC chunk family graduated to structural
    *     oracles — `multimodal_cdc_chunks` pins conservation/tiling/
    *     bounds, `multimodal_cdc_pairs` pins planted-twin completeness,
    *     while [[graft.llm.Multimodal.cdcChunkStats]] /
    *     [[graft.llm.Multimodal.cdcSharedPairs]] stay the numeric API,
    *     MultimodalSpec-pinned; `text_compression_ratio` graduated the
    *     same way in r15 — its registry entry is the per-source deflate
    *     audit: char totals recomputed by DuckDB beside length-
    *     conservation / stored-block-bound / self-concat-subadditivity
    *     violation counters pinned to 0, while
    *     [[graft.queries.TextQueries.compressionRatio]] stays the
    *     per-doc API, CompressionSpec-pinned).
    */
  def oracleSql: Map[String, String] = Map(
    "dolar_parity" -> dolarParitySql,
    "dolar_e2e_interval" -> dolarE2eSql,
    "dolar_e2e_stream" -> dolarE2eSql,
    "interval_events" -> EventQueries.intervalEventsSql,
    "q1_pricing_summary" -> Relational.q1PricingSummarySql,
    "agg_orders_by_priority" -> Relational.aggOrdersByPrioritySql,
    "agg_cube" -> Relational.aggCubeSql,
    "agg_rollup" -> Relational.aggRollupSql,
    "agg_count_distinct" -> Relational.aggCountDistinctSql,
    "agg_minmax_by_brand" -> Relational.aggMinMaxByBrandSql,
    "agg_mode_by_brand" -> Relational.modeByBrandSql,
    "agg_geomean_by_brand" -> Relational.geomeanByBrandSql,
    "agg_skew_kurtosis" -> Relational.skewKurtosisByBrandSql,
    "stats_quantiles_exact" -> Relational.quantilesExactSql,
    "seq_gap_islands" -> Relational.eventIdIslandsSql,
    "agg_grouping_sets" -> Relational.aggGroupingSetsSql,
    "agg_median_price" -> Relational.aggMedianPriceSql,
    "agg_nations_by_region" -> Relational.aggNationsByRegionSql,
    "pivot_status_counts" -> Relational.pivotStatusCountsSql,
    "q3_top_revenue" -> Relational.q3TopRevenueSql,
    "q5_local_supplier" -> Relational.q5LocalSupplierSql,
    "q7_volume_shipping" -> Relational.q7VolumeShippingSql,
    "q8_market_share" -> Relational.q8MarketShareSql,
    "q10_returned_items" -> Relational.q10ReturnedItemsSql,
    "q14_promo_revenue" -> Relational.q14PromoRevenueSql,
    "q18_large_orders" -> Relational.q18LargeOrdersSql,
    "q2_min_cost_supplier" -> TpchShapes.q2MinCostSupplierSql,
    "q4_order_priority" -> TpchShapes.q4OrderPrioritySql,
    "q6_forecast_revenue" -> TpchShapes.q6ForecastRevenueSql,
    "q9_product_profit" -> TpchShapes.q9ProductProfitSql,
    "q11_important_stock" -> TpchShapes.q11ImportantStockSql,
    "q12_ship_priority" -> TpchShapes.q12ShipPrioritySql,
    "q13_cust_order_dist" -> TpchShapes.q13CustOrderDistSql,
    "q15_top_supplier" -> TpchShapes.q15TopSupplierSql,
    "q16_part_supplier_cnt" -> TpchShapes.q16PartSupplierCntSql,
    "q17_small_qty_revenue" -> TpchShapes.q17SmallQtyRevenueSql,
    "q19_disjunctive_revenue" -> TpchShapes.q19DisjunctiveRevenueSql,
    "q20_excess_suppliers" -> TpchShapes.q20ExcessSuppliersSql,
    "q21_waiting_supplier" -> TpchShapes.q21WaitingSupplierSql,
    "q22_sales_opportunity" -> TpchShapes.q22SalesOpportunitySql,
    "join_broadcast_dim" -> Relational.joinBroadcastDimSql,
    "join_left_outer" -> Relational.joinLeftOuterSql,
    "join_semi" -> Relational.joinSemiSql,
    "join_anti" -> Relational.joinAntiSql,
    "bucketed_join" -> graft.plans.Bucketing.bucketedJoinDemoSql,
    "join_skew_salted" -> graft.plans.SkewJoin.skewJoinDemoSql,
    "zorder_layout" -> graft.plans.ZOrder.zorderLayoutSql,
    "window_rank_orders" -> Relational.windowRankOrdersSql,
    "setop_union" -> Relational.setopUnionSql,
    "setop_intersect" -> Relational.setopIntersectSql,
    "setop_except" -> Relational.setopExceptSql,
    "topk_orders" -> Relational.topkOrdersSql,
    "scan_filter_project" -> Relational.scanFilterProjectSql,
    "subquery_exists" -> Relational.subqueryExistsSql,
    "subquery_not_exists" -> Relational.subqueryNotExistsSql,
    "subquery_scalar_avg" -> Relational.subqueryScalarAvgSql,
    "subquery_in" -> Relational.subqueryInSql,
    "subquery_not_in" -> Relational.subqueryNotInSql,
    "join_full_outer" -> Relational.joinFullOuterSql,
    "join_fuzzy_name" -> Relational.joinFuzzyNameSql,
    "dedup_typo_pairs" -> Relational.typoPairsSql,
    "window_distribution" -> Relational.windowDistributionSql,
    "agg_monthly_revenue" -> Relational.aggMonthlyRevenueSql,
    "profile_columns" -> Relational.profileColumnsSql,
    "integrity_checksum" -> Relational.integrityChecksumSql,
    "order_cycle_time" -> Relational.orderCycleTimeSql,
    "ivm_refresh" -> Relational.ivmRefreshSql,
    "stats_histogram" -> Relational.statsHistogramSql,
    "attribution_last_touch" -> EventQueries.attributionLastTouchSql,
    "sketch_quantile_rollup" -> EventQueries.quantileRollupSql,
    "sketch_word_freq" -> TextQueries.sketchWordFreqAuditSql,
    "funnel_stages" -> EventQueries.funnelStagesSql,
    "snapshot_diff" -> Relational.snapshotDiffSql,
    "join_explosion_check" -> EventQueries.joinExplosionCheckSql,
    "join_size_estimate" -> EventQueries.joinSizeEstimateAuditSql,
    "stats_correlation" -> Relational.statsCorrelationSql,
    "embed_quant_error" -> EmbeddingQueries.quantErrorReportSql,
    "mixture_temperature_alloc" -> Sampling.mixtureTemperatureAllocSql,
    "sample_reservoir_per_key" -> Sampling.reservoirPerKeySql,
    "agg_string_concat" -> Relational.aggStringConcatSql,
    "string_funcs" -> Relational.stringFuncsSql,
    "window_tumbling_hourly" -> EventQueries.tumblingHourlySql,
    "window_moving_avg" -> EventQueries.movingAvgSql,
    "window_lag_delta" -> EventQueries.lagDeltaSql,
    "sessionize_events" -> EventQueries.sessionizeSql,
    "asof_purchase" -> EventQueries.asofPurchaseSql,
    "asof_next_purchase" -> EventQueries.asofNextPurchaseSql,
    "asof_nearest" -> EventQueries.asofNearestSql,
    "range_join_nearby" -> EventQueries.rangeJoinNearbySql,
    "range_join_overlap" -> EventQueries.rangeJoinOverlapSql,
    "events_gapfill_daily" -> EventQueries.gapfillDailySql,
    "cdc_latest_state" -> EventQueries.cdcLatestStateSql,
    "text_token_count" -> TextQueries.tokenCountSql,
    "text_token_bpeish" -> TextQueries.tokenCountBpeSql,
    "text_tokenizer_fertility" -> TextQueries.tokenizerFertilitySql,
    "text_ngram_diversity" -> TextQueries.ngramDiversitySql,
    "text_winnow_fp" -> TextQueries.winnowFingerprintSql,
    "text_stats_by_lang" -> TextQueries.statsByLangSql,
    "text_quality_score" -> TextQueries.qualityScoreSql,
    "text_quality_funnel" -> TextQueries.qualityFunnelSql,
    "text_char_entropy" -> TextQueries.charEntropySql,
    "text_bigram_entropy_rate" -> TextQueries.bigramEntropyRateSql,
    "text_vocab_overlap" -> TextQueries.vocabOverlapSql(),
    "docs_length_ks_pairs" -> TextQueries.lengthKsPairsSql,
    "text_lang_guess" -> TextQueries.langGuessConfusionSql,
    "text_fingerprint" -> TextQueries.fingerprintSql,
    "text_scrub_pii" -> TextQueries.scrubPiiSql,
    "text_repetition" -> TextQueries.repetitionStatsSql,
    "text_top_terms" -> TextQueries.topTermsByDfSql,
    "text_regex_extract" -> TextQueries.regexExtractSql,
    "text_first_positions" -> TextQueries.firstPositionsSql,
    "dedup_incremental" -> TextQueries.dedupIncrementalSql,
    "text_bigrams" -> TextQueries.bigramsSql,
    "text_bigram_pmi" -> TextQueries.bigramPmiSql(),
    "text_trigram_lm" -> TextQueries.trigramLmSql,
    "docs_source_concentration" -> TextQueries.sourceConcentrationSql,
    "window_range_hour" -> EventQueries.rangeLastHourSql,
    "text_bm25_terms" -> TextQueries.bm25TopTermsSql,
    "index_inverted" -> TextQueries.invertedIndexSql,
    "curation_pipeline" -> TextQueries.curationPipelineSql,
    "sample_hash_split" -> Sampling.hashSplitSql,
    "sample_stratified" -> Sampling.stratifiedSampleSql,
    "sample_systematic" -> Sampling.systematicSampleSql,
    "sample_weighted" -> Sampling.weightedSampleSql,
    "sample_neyman_allocation" -> Sampling.neymanAllocationSql,
    "events_skew_histogram" -> Sampling.skewHistogramSql,
    "events_funnel" -> EventQueries.funnelSql,
    "events_dau_wau" -> EventQueries.dauWauSql,
    "events_value_quantiles" -> EventQueries.valueQuantilesSql,
    "events_json_props" -> EventQueries.jsonPropsSql,
    "scd2_history" -> EventQueries.scd2HistorySql,
    "events_retention_cohorts" -> EventQueries.retentionCohortsSql,
    "events_anomaly_zscore" -> EventQueries.anomalyZscoreSql,
    "window_session_native" -> EventQueries.sessionWindowNativeSql,
    "events_markov_stationary" -> EventQueries.markovStationarySql(),
    "events_markov_attribution" -> EventQueries.markovAttributionSql(),
    "attribution_position" -> EventQueries.attributionPositionSql(),
    "events_growth_accounting" -> EventQueries.growthAccountingSql,
    "events_markov_transitions" -> EventQueries.markovTransitionsSql,
    "events_markov_entropy" -> EventQueries.markovEntropyRateSql,
    "events_quantile_rank_audit" -> EventQueries.quantileRankAuditSql,
    "events_time_weighted_avg" -> EventQueries.timeWeightedAvgSql,
    "events_activity_streaks" -> EventQueries.activityStreaksSql,
    "typed_group_stats" -> EventQueries.typedGroupStatsSql,
    "text_hash_features" -> TextQueries.hashFeaturesSql,
    "text_importance_dsir" -> TextQueries.importanceDsirSql,
    "agg_regr_slope" -> Relational.aggRegrSlopeSql,
    "text_repeated_passages" -> TextQueries.repeatedPassagesSql,
    "agg_yoy_growth" -> Relational.aggYoyGrowthSql,
    "customer_rfm" -> Relational.customerRfmSql,
    "graph_pagerank" -> GraphQueries.pagerankSql,
    "graph_ppr_walks" -> GraphQueries.pprWalksSql,
    "graph_copurchase" -> GraphQueries.copurchasePairsSql,
    "graph_triangles" -> GraphQueries.triangleCountSql,
    "graph_triangles_partitioned" -> GraphQueries.triangleCountSql,
    "graph_khop_reach" -> GraphQueries.khopReachSql,
    "graph_closeness_sampled" -> GraphQueries.closenessSampledSql,
    "graph_sssp" -> GraphQueries.ssspBoundedSql,
    "graph_assortativity" -> GraphQueries.assortativitySql,
    "graph_avg_neighbor_degree" -> GraphQueries.avgNeighborDegreeSql,
    "ts_hurst_rs" -> TimeSeries.hurstRsSql,
    "graph_label_propagation" -> GraphQueries.labelPropagationSql,
    "stats_gini_spend" -> Relational.giniSpendSql,
    "stats_theil_nation" -> Relational.theilNationSql,
    "stats_atkinson_mld" -> Relational.atkinsonMldSql,
    "docs_pielou_evenness" -> TextQueries.pielouEvennessSql,
    "docs_readability" -> TextQueries.readabilitySql,
    "docs_source_jsd" -> TextQueries.sourceJsdSql(),
    "docs_length_histogram" -> TextQueries.lengthHistogramSql,
    "events_hill_tail_index" -> EventQueries.hillTailIndexSql(),
    "events_interarrival" -> EventQueries.interArrivalSql,
    "events_hourly_profile" -> EventQueries.hourlyProfileSql,
    "events_poisson_rate" -> EventQueries.poissonRateTestSql,
    "stats_benford" -> Governance.benfordSql,
    "stats_jarque_bera" -> Relational.jarqueBeraSql,
    "stats_chi2_independence" -> Relational.chi2CellsSql,
    "stats_cramers_v" -> Relational.cramersVSql,
    "stats_g_test" -> Relational.gTestSql,
    "stats_trimmed_mean" -> Relational.trimmedMeanSql(),
    "stats_sign_test" -> Relational.signTestSql,
    "stats_bowker_symmetry" -> Relational.bowkerSymmetrySql,
    "stats_bh_adjust" -> MultipleTesting.bhAdjustSql,
    "graph_reciprocity" -> Relational.reciprocitySql,
    "text_ngram_novelty" -> TextQueries.ngramNoveltySql,
    "text_zipf_slope" -> TextQueries.zipfSlopeSql,
    "ts_seasonal_decompose" -> TimeSeries.seasonalDecomposeSql,
    "ts_changepoint_cusum" -> TimeSeries.cusumChangepointSql,
    "ts_peaks" -> TimeSeries.peaksSql,
    "ts_autocorrelation" -> TimeSeries.autocorrelationSql,
    "ts_ljung_box" -> TimeSeries.ljungBoxSql,
    "ts_pacf" -> TimeSeries.pacfSql,
    "ts_cross_correlation" -> TimeSeries.crossCorrelationSql,
    "ts_granger_lag1" -> TimeSeries.grangerLag1Sql,
    "ts_permutation_entropy" -> TimeSeries.permutationEntropySql,
    "ts_sample_entropy" -> TimeSeries.sampleEntropySql,
    "ts_dickey_fuller" -> TimeSeries.dickeyFullerSql,
    "ts_pettitt" -> TimeSeries.pettittSql,
    "ts_ewma" -> TimeSeries.ewmaSql(),
    "ts_holt_linear" -> TimeSeries.holtLinearSql(),
    "ts_rolling_median" -> TimeSeries.rollingMedianSql,
    "ts_forecast_backtest" -> TimeSeries.forecastBacktestSql(),
    "ts_stl_anomaly" -> TimeSeries.stlAnomalySql(),
    "stats_dispersion_index" -> TimeSeries.dispersionIndexSql,
    "drift_qq_deciles" -> Drift.qqDecilesSql,
    "ab_conversion_ztest" -> Drift.abConversionSql(),
    "ab_cuped_revenue" -> Drift.abCupedSql,
    "ab_permutation_test" -> Drift.abPermutationTestSql(),
    "ab_power_mde" -> Drift.abPowerMdeSql(),
    "ab_srm_check" -> Drift.abSrmCheckSql,
    "ab_delta_ratio_ci" -> Drift.abDeltaRatioSql,
    "eval_brier_score" -> Evaluation.brierScoreSql,
    "eval_score_agreement" -> Evaluation.scoreAgreementSql,
    "stats_hodges_lehmann" -> TimeSeries.hodgesLehmannSql,
    "stats_page_trend" -> Drift.pageTrendSql,
    "events_wilson_ci" -> EventQueries.wilsonCiSql,
    "drift_cvm" -> Drift.cvmSql,
    "stats_ansari_bradley" -> Drift.ansariBradleySql,
    "ts_holt_winters" -> TimeSeries.holtWintersSql(),
    "events_rfm_migration" -> EventQueries.rfmMigrationSql,
    "agg_approx_distinct" -> Relational.aggApproxDistinctAuditSql,
    "customer_rfm_approx" -> Relational.customerRfmApproxAuditSql,
    "sketch_hll_rollup" -> EventQueries.hllRollupAuditSql,
    "sketch_hll_intersect" -> EventQueries.hllIntersectAuditSql,
    "sketch_topk_rollup" -> EventQueries.topkRollupAuditSql,
    "drift_effect_size" -> Drift.effectSizeSql,
    "pii_reid_risk" -> Governance.reidRiskSql(),
    "eval_pr_threshold_sweep" -> Evaluation.prThresholdSweepSql,
    "ts_seasonal_strength" -> TimeSeries.seasonalStrengthSql,
    "stats_power_law_alpha" -> EventQueries.powerLawAlphaSql,
    "ts_theil_sen" -> TimeSeries.theilSenSql,
    "survival_km" -> Survival.kaplanMeierSql,
    "survival_nelson_aalen" -> Survival.nelsonAalenSql,
    "survival_aalen_johansen" -> Survival.aalenJohansenSql(),
    "survival_logrank" -> Survival.logRankSql,
    "survival_rmst" -> Survival.rmstSql(),
    "survival_life_table" -> Survival.lifeTableSql(),
    "survival_hazard_ratio" -> Survival.hazardRatioSql,
    "stats_ks_uniform_weekday" -> Relational.ksUniformWeekdaySql,
    "stats_decile_lift" -> Relational.decileLiftSql,
    "events_max_concurrency" -> EventQueries.maxConcurrencySql,
    "cohort_ltv" -> Relational.cohortLtvSql,
    "basket_rules" -> GraphQueries.basketRulesSql,
    "events_session_paths" -> EventQueries.sessionPathsSql,
    "drift_welch_ttest" -> Drift.welchTTestSql,
    "events_reach_curve" -> EventQueries.reachCurveSql,
    "stats_histogram_eqdepth" -> Relational.statsHistogramEqdepthSql,
    "embed_outliers" -> EmbeddingQueries.outliersByLabelSql,
    "stats_anova_priority" -> Relational.anovaPrioritySql,
    "stats_levene" -> Relational.levenePrioritySql,
    "stats_mcnemar" -> Relational.mcnemarYearsSql,
    "stats_wilcoxon_signed" -> Drift.wilcoxonSignedRankSql,
    "stats_friedman" -> Drift.friedmanSql,
    "stats_cochran_armitage" -> Relational.cochranArmitageSql,
    "stats_kruskal_wallis" -> Relational.kruskalWallisSql,
    "stats_dunn_pairs" -> Relational.dunnPairsSql,
    "stats_tukey_hsd" -> Relational.tukeyHsdSql,
    "stats_bartlett" -> Relational.bartlettSql,
    "stats_mood_median" -> Relational.moodMedianSql,
    "eval_roc_auc" -> Evaluation.rocAucSql,
    "eval_average_precision" -> Evaluation.averagePrecisionSql,
    "eval_calibration" -> Evaluation.calibrationSql,
    "eval_self_retrieval_mrr" -> Evaluation.selfRetrievalMrrSql(),
    "eval_ndcg" -> Evaluation.ndcgSql(),
    "text_jsd_langs" -> TextQueries.jsdLangsSql,
    "docs_simpson_diversity" -> TextQueries.simpsonDiversitySql,
    "docs_hapax_share" -> TextQueries.hapaxShareSql,
    "docs_yule_k" -> TextQueries.yuleKSql,
    "docs_mattr" -> TextQueries.mattrSql(),
    "text_gopher_repetition" -> TextQueries.gopherRepetitionSql,
    "text_good_turing" -> TextQueries.goodTuringSql(),
    "text_word_burstiness" -> TextQueries.wordBurstinessSql(),
    "text_langid_prf" -> TextQueries.langIdPrfSql,
    "stats_cohens_kappa" -> TextQueries.cohensKappaSql,
    "docs_heaps_law" -> TextQueries.heapsLawSql(),
    "events_burstiness" -> EventQueries.burstinessSql,
    "ts_mann_kendall" -> TimeSeries.mannKendallSql,
    "ts_seasonal_mann_kendall" -> TimeSeries.seasonalMannKendallSql,
    "events_unattributed" -> EventQueries.unattributedPurchasesSql,
    "graph_kcore" -> GraphQueries.kcorePeelSql,
    "stats_hhi_nation" -> Relational.hhiNationSql,
    "events_user_entropy" -> EventQueries.userEntropySql,
    "stats_mutual_info" -> EventQueries.mutualInfoSql,
    "sample_poisson_bootstrap" -> Sampling.poissonBootstrapSql,
    "text_doc_keywords" -> TextQueries.docKeywordsSql,
    "ts_runs_test" -> TimeSeries.runsTestSql,
    "ts_spearman" -> TimeSeries.spearmanDailySql,
    "ts_kendall_tau" -> TimeSeries.kendallTauSql,
    "ts_turning_points" -> TimeSeries.turningPointsSql,
    "ts_variance_ratio" -> TimeSeries.varianceRatioSql(),
    "graph_clustering_coeff" -> GraphQueries.clusteringCoeffSql,
    "graph_link_jaccard" -> GraphQueries.linkJaccardSql,
    "graph_link_jaccard_partitioned" -> GraphQueries.linkJaccardSql,
    "graph_resource_alloc" -> GraphQueries.resourceAllocSql,
    "graph_resource_alloc_partitioned" -> GraphQueries.resourceAllocSql,
    "graph_adamic_adar" -> GraphQueries.adamicAdarSql,
    "graph_adamic_adar_partitioned" -> GraphQueries.adamicAdarSql,
    "graph_common_neighbors" -> GraphQueries.commonNeighborsSql,
    "graph_pref_attachment" -> GraphQueries.prefAttachmentSql,
    "graph_katz_walks" -> GraphQueries.katzWalksSql,
    "graph_degree_histogram" -> GraphQueries.degreeHistogramSql,
    "graph_rich_club" -> GraphQueries.richClubSql,
    "graph_local_bridges" -> GraphQueries.localBridgesSql,
    "graph_hits_walks" -> GraphQueries.hitsWalksSql,
    "dedup_containment" -> TextQueries.dedupContainmentSql,
    "drift_mann_whitney" -> Drift.mannWhitneySql,
    "events_funnel_within" -> EventQueries.funnelWithinSql,
    "unpivot_metrics" -> Relational.unpivotMetricsSql,
    "stats_weighted_median" -> Relational.weightedMedianSql,
    "governance_delete_impact" -> Governance.deleteImpactSql,
    "text_vocab_coverage" -> TextQueries.vocabCoverageSql,
    "embed_knn_graph" -> EmbeddingQueries.knnGraphSql,
    "dq_expectations" -> Governance.dqExpectationsSql,
    "pii_k_anonymity" -> Governance.kAnonymitySql,
    "pii_l_diversity" -> Governance.lDiversitySql(),
    "pii_t_closeness" -> Governance.tClosenessSql(),
    "split_leakage_audit" -> Governance.splitLeakageAuditSql,
    "pareto_frontier" -> Governance.paretoFrontierSql,
    "winsorize_stats" -> Governance.winsorizeStatsSql,
    "split_balance_chisq" -> Governance.splitBalanceChisqSql,
    "embed_hard_negatives" -> EmbeddingQueries.hardNegativesSql,
    "drift_psi" -> Drift.psiSql,
    "drift_ks" -> Drift.ksSql,
    "graph_modularity" -> GraphQueries.modularitySql,
    "attribution_time_decay" -> EventQueries.attributionTimeDecaySql,
    "dq_functional_deps" -> Governance.functionalDepsSql,
    "pii_dp_release" -> Governance.dpReleaseSql,
    "corpus_datacard" -> Governance.datacardSql,
    "merge_upsert" -> EventQueries.mergeUpsertSql,
    "text_bpe_merge" -> TextQueries.bpeMergeStepSql,
    "text_perplexity" -> TextQueries.perplexitySql,
    "text_ccnet_buckets" -> TextQueries.ccnetBucketsSql,
    "text_tfidf_terms" -> TextQueries.tfidfTermsSql,
    "events_value_mad" -> EventQueries.valueMadSql,
    "embed_threshold_sweep" -> EmbeddingQueries.thresholdSweepSql,
    "text_normalize" -> TextQueries.normalizeTextSql,
    "docs_chunk_sliding" -> TextQueries.chunkSlidingSql,
    "decontaminate_ngram" -> Sampling.decontaminateSql,
    "decontaminate_bloom" -> Sampling.decontaminateBloomAuditSql,
    "pack_chunks" -> Sampling.packChunksSql,
    "mixture_downsample" -> Sampling.mixtureDownsampleSql,
    "dedup_exact" -> TextQueries.dedupExactSql,
    "dedup_exact_paragraph" -> TextQueries.dedupExactParagraphSql(),
    "dedup_paragraph_top" -> TextQueries.dedupParagraphTopSql(),
    "dedup_paragraph_savings" -> TextQueries.dedupParagraphSavingsSql(),
    "dedup_exact_substring" -> TextQueries.exactSubstringDedupSql,
    "dedup_cluster_sizes" -> TextQueries.dedupClusterSizesSql,
    "dedup_ngram_jaccard" -> TextQueries.dedupNgramJaccardSql,
    "text_bpe_encode" -> TextQueries.bpeEncodeAuditSql,
    "dedup_prefix_jaccard" -> TextQueries.dedupPrefixJaccardSql,
    "dedup_components" -> graft.llm.DedupClusters.dedupComponentsSql,
    "dedup_keep_best" -> graft.llm.DedupClusters.dedupKeepBestSql,
    "ann_topk_cosine" -> EmbeddingQueries.annTopKSql,
    "embed_intrinsic_dim" -> EmbeddingQueries.intrinsicDimSql(),
    "ann_topk_cosine_i8" -> EmbeddingQueries.annTopKI8Sql,
    "ann_ivf_topk" -> EmbeddingQueries.annAuditSql,
    "dedup_minhash_lsh" -> graft.llm.MinHashDedup.nearDupPairsAuditSql,
    "dedup_simhash" -> graft.llm.SimHashDedup.nearDupPairsAuditSql,
    "embed_neardup_lsh" -> EmbeddingQueries.nearDupLshAuditSql,
    "embed_semdedup" -> EmbeddingQueries.semDedupAuditSql,
    "ann_pq_topk" -> EmbeddingQueries.annAuditSql,
    "ann_ivfpq_topk" -> EmbeddingQueries.annAuditSql,
    "embed_mmr_topk" -> EmbeddingQueries.mmrTopKSql,
    "embed_pca_project" -> EmbeddingQueries.pcaProjectAuditSql,
    "embed_pca_explained" -> EmbeddingQueries.pcaExplainedAuditSql(),
    "embed_centroid_by_label" -> EmbeddingQueries.centroidByLabelSql,
    "embed_silhouette" -> EmbeddingQueries.silhouetteSql,
    "embed_norm_quantiles" -> EmbeddingQueries.normQuantilesByLabelSql,
    "embed_dim_ablation" -> EmbeddingQueries.dimAblationSql,
    "multimodal_meta" -> Multimodal.mediaMetaSql,
    "multimodal_dedup" -> Multimodal.mediaDedupSql,
    "multimodal_cdc_chunks" -> Multimodal.cdcChunkAuditSql,
    "dedup_minhash_signatures" -> MinHashDedup.signatureAuditSql,
    "dedup_lsh_bucket_audit" -> MinHashDedup.bucketConservationAuditSql,
    "events_value_quantiles_approx" -> EventQueries.valueQuantilesApproxAuditSql,
    "events_value_mad_approx" -> EventQueries.valueMadApproxAuditSql,
    "text_compression_ratio" -> TextQueries.compressionAuditSql,
    "multimodal_cdc_pairs" -> Multimodal.cdcPairsAuditSql(),
  )
}
