package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The fourteen TPC-H query shapes not yet in [[Relational]] (Q2, Q4,
  * Q6, Q9, Q11, Q12, Q13, Q15, Q16, Q17, Q19, Q20, Q21, Q22), adapted
  * to the driver schema: the testdata carries no partsupp table and no
  * comment/shipmode/phone/commitdate/receiptdate columns, so each query
  * keeps its ORIGINAL optimizer-relevant structure (the correlated min,
  * the EXISTS/NOT-EXISTS pair, the scalar-subquery HAVING, the
  * disjunctive pushdown…) with the missing column swapped for an
  * available surrogate, noted per query. With these, every one of the
  * 22 classic shapes has a runnable, DuckDB-oracle-checked counterpart
  * ([[Relational]] has Q1/Q3/Q5/Q7/Q8/Q10/Q14/Q18).
  *
  * Same determinism discipline as [[Relational]] (exact decimal sums,
  * IEEE division of identical inputs, total order with unique
  * tiebreak), same scale posture (dimension broadcasts, pushed-down
  * fact filters, partial aggregation; see TpchShapesSpec plan audits).
  */
object TpchShapes {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  import Exact.dsum

  private val ONE = lit(1.0)
  private def ts(d: String) = lit(java.sql.Timestamp.valueOf(d + " 00:00:00"))

  // --- Q2: minimum-cost supplier (correlated min) ---------------------------
  /** TPC-H Q2 shape. No partsupp, so unit cost is the observed
    * min(l_extendedprice/l_quantity) per (part, supplier) from
    * lineitem. The load-bearing structure survives: a per-part
    * correlated MIN subquery selecting the row(s) achieving it, then
    * dimension joins with a region filter. The min-cost aggregate is
    * computed once and joined back on (partkey, cost) — exact equality
    * is safe because both engines derive the double from identical
    * IEEE operations.
    *
    * Scale: the (part,supplier) cost table is lineitem-group-sized;
    * the min-per-part side is part-sized and AQE picks a broadcast for
    * the back-join; supplier/nation/region broadcast.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val cost = t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_size") === 15)
        .select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val best = cost.groupBy(col("p_partkey").as("bp"))
      .agg(min(col("unit_cost")).as("best_cost"))
    cost.join(best,
        col("p_partkey") === col("bp") && col("unit_cost") === col("best_cost"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("unit_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2MinCostSupplierSql: String =
    """WITH cost AS (
      |  SELECT p_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_size = 15
      |  GROUP BY p_partkey, l_suppkey),
      |best AS (SELECT p_partkey AS bp, MIN(unit_cost) AS best_cost
      |         FROM cost GROUP BY p_partkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
      |FROM cost
      |JOIN best ON p_partkey = bp AND unit_cost = best_cost
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  // --- Q4: order priority checking (EXISTS semi-join) -----------------------
  /** TPC-H Q4 shape. commitdate/receiptdate don't exist; "late" becomes
    * a lineitem shipped 60+ days after the order date. The structure —
    * a quarter-filtered order scan semi-joined to an EXISTS over its
    * own lines, counted per priority — is unchanged; at 100 TB the
    * semi-join shuffles only (orderkey, shipdate)-narrow rows.
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-07-01") &&
        col("o_orderdate") < ts("1996-10-01"))
    val late = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(late,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4OrderPrioritySql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- Q6: forecasting revenue change (pure pushdown scan) ------------------
  /** TPC-H Q6 verbatim (every column exists): one scan, three pushable
    * range predicates, one exact decimal sum. The benchmark's purest
    * test that filters reach the parquet reader — TpchShapesSpec
    * asserts all three appear in PushedFilters.
    */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))

  val q6ForecastRevenueSql: String =
    """SELECT
      | CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24.0""".stripMargin

  // --- Q9: product-type profit by nation and year ---------------------------
  /** TPC-H Q9 shape. ps_supplycost doesn't exist; cost is proxied as
    * half the part's retail price per unit. The five-way star join —
    * fact joined to filtered part, supplier, nation, orders — and the
    * (nation, year) rollup are structurally Q9. Dimensions broadcast;
    * the only fact shuffle is the final group-by.
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val amount = col("l_extendedprice") * (ONE - col("l_discount")) -
      lit(0.5) * col("p_retailprice") * col("l_quantity")
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_type") === "STANDARD")
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dsum(amount).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProductProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |   - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_type = 'STANDARD'
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin

  // --- Q11: important stock identification (scalar-subquery HAVING) ---------
  /** TPC-H Q11 shape. partsupp value becomes the part's shipped value
    * (Σ extendedprice·(1−discount)) restricted to suppliers of one
    * nation; the HAVING compares each part's value against a FRACTION
    * OF THE GLOBAL TOTAL — the scalar subquery rides as a one-row
    * broadcast cross join, never a second fact scan per group.
    */
  def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val vol = dsum(col("l_extendedprice") * (ONE - col("l_discount")))
    val natSupp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val vals = t(s, dir, "lineitem")
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(vol.as("part_value"))
    val total = vals.agg(dsum(col("part_value")).as("total_value"))
    vals.crossJoin(broadcast(total))
      .filter(col("part_value") > col("total_value") * lit(0.001))
      .select(col("l_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val q11ImportantStockSql: String =
    """WITH vals AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
      |      AS part_value
      |  FROM lineitem
      |  WHERE l_suppkey IN (
      |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |    WHERE n_name = 'NATION_7')
      |  GROUP BY l_partkey)
      |SELECT l_partkey, part_value
      |FROM vals, (SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,6))) AS DOUBLE)
      |            AS total_value FROM vals) t
      |WHERE part_value > total_value * 0.001
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  // --- Q12: shipping-mode / priority matrix (conditional pivot) -------------
  /** TPC-H Q12 shape. l_shipmode doesn't exist; lines group by
    * l_linestatus instead, and "late" is shipped 30+ days after the
    * order date within one year. The CASE-sum pivot of high- vs
    * low-priority orders per group is the original's exact structure.
    */
  def q12ShipPriority(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val q12ShipPrioritySql: String =
    """SELECT l_linestatus,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // --- Q13: customer order-count distribution (double aggregation) ----------
  /** TPC-H Q13 shape. The o_comment NOT-LIKE filter becomes an
    * order-priority exclusion; the structure — LEFT join so zero-order
    * customers count, then a distribution over the per-customer counts
    * (two chained aggregations) — is unchanged.
    */
  def q13CustOrderDist(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_orderkey"), col("o_custkey"))
    t(s, dir, "customer").select(col("c_custkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustOrderDistSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --- Q15: top supplier (aggregate == scalar max) --------------------------
  /** TPC-H Q15 verbatim shape: quarterly revenue per supplier, keep the
    * one(s) equal to the global max. Exact-decimal revenue makes the
    * max-equality engine-identical. The revenue view is computed once;
    * the max is a one-row broadcast.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (ONE - col("l_discount")))
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev, (SELECT MAX(total_revenue) AS max_revenue FROM rev) m
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = max_revenue
      |ORDER BY s_suppkey""".stripMargin

  // --- Q16: parts/supplier relationship count (anti-join + count-distinct) --
  /** TPC-H Q16 shape. The partsupp pairs become DISTINCT observed
    * (part, supplier) pairs from lineitem; the "complaints" comment
    * anti-join becomes an exclusion of negative-balance suppliers. The
    * skeleton — exclude a supplier set, count distinct suppliers per
    * (brand, type, size), order by count — is Q16's.
    */
  def q16PartSupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey").as("bad_key"))
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(bad), col("l_suppkey") === col("bad_key"), "left_anti")
      .join(t(s, dir, "part").filter(col("p_brand") =!= "Brand#45"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      .limit(50)
  }

  val q16PartSupplierCntSql: String =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#45'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50""".stripMargin

  // --- Q17: small-quantity-order revenue (correlated avg) -------------------
  /** TPC-H Q17 shape. p_container doesn't exist; the part filter is
    * brand + type. The load-bearing structure — each line compared to
    * 20% of ITS part's average quantity (a correlated scalar per part,
    * computed once and broadcast back) — is unchanged. The avg is
    * exact-decimal-sum / count, so the 0.2· threshold is
    * engine-identical.
    */
  def q17SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#23" && col("p_type") === "MEDIUM")
      .select(col("p_partkey"))
    val li = t(s, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val avgQ = li.groupBy(col("p_partkey").as("ap"))
      .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    li.join(broadcast(avgQ), col("p_partkey") === col("ap"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val q17SmallQtyRevenueSql: String =
    """WITH li AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'),
      |avgq AS (
      |  SELECT l_partkey AS ap,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM li GROUP BY l_partkey)
      |SELECT
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly,
      | COUNT(*) AS n_lines
      |FROM li JOIN avgq ON l_partkey = ap
      |WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  // --- Q19: discounted revenue (disjunctive pushdown) -----------------------
  /** TPC-H Q19 shape: three (brand, size-range, quantity-range)
    * disjuncts that must still join on the part key — the classic test
    * that an OR of conjunctions neither blocks the equi-join nor the
    * scan-level pushdown of the common bounds.
    */
  def q19DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val j = t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val c1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 5) && col("l_quantity").between(1.0, 11.0)
    val c2 = col("p_brand") === "Brand#23" &&
      col("p_size").between(1, 10) && col("l_quantity").between(10.0, 20.0)
    val c3 = col("p_brand") === "Brand#34" &&
      col("p_size").between(1, 15) && col("l_quantity").between(20.0, 30.0)
    j.filter(c1 || c2 || c3)
      .agg(dsum(col("l_extendedprice") * (ONE - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19DisjunctiveRevenueSql: String =
    """SELECT
      | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
      |   AS revenue,
      | COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1.0 AND 11.0)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10.0 AND 20.0)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin

  // --- Q20: potential part promotion (nested semi-joins) --------------------
  /** TPC-H Q20 shape. The partsupp availability check becomes: a
    * supplier qualifies if, for some PROMO-type part, their 1996
    * shipped quantity exceeds a threshold. Two nested semi-joins
    * (supplier ← qualifying (part,supplier) aggregate ← part filter)
    * with a nation filter on the outside — Q20's skeleton.
    */
  def q20ExcessSuppliers(s: SparkSession, dir: String): DataFrame = {
    val promo = t(s, dir, "part").filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val heavy = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01"))
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_quantity")).as("qty"))
      .filter(col("qty") > lit(50.0))
      .select(col("l_suppkey"))
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_4"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val q20ExcessSuppliersSql: String =
    """SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_3', 'NATION_4')
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      |    GROUP BY l_suppkey
      |    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 50.0)
      |ORDER BY s_name""".stripMargin

  // --- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ---------
  /** TPC-H Q21 shape. Late = shipped 90+ days after the order date (no
    * receipt/commit dates). A supplier is "at fault" for a finished
    * multi-supplier order when they are its ONLY late supplier — the
    * original's EXISTS (another supplier) + NOT EXISTS (another late
    * supplier) pair, evaluated here as one per-order aggregate
    * (distinct suppliers, distinct late suppliers, the single late
    * suppkey) instead of two correlated rescans of the fact — the
    * 100 TB-friendly spelling of the same predicate.
    */
  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    val lines = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .as("is_late"))
    val perOrder = lines.groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("is_late"), col("l_suppkey"))).as("n_late"),
        min(when(col("is_late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
    perOrder
      .join(t(s, dir, "supplier"), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21WaitingSupplierSql: String =
    """WITH lines AS (
      |  SELECT l_orderkey, l_suppkey,
      |    l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'),
      |per_order AS (
      |  SELECT l_orderkey,
      |    COUNT(DISTINCT l_suppkey) AS n_supp,
      |    COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late,
      |    MIN(CASE WHEN is_late THEN l_suppkey END) AS late_supp
      |  FROM lines GROUP BY l_orderkey)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM per_order JOIN supplier ON late_supp = s_suppkey
      |WHERE n_supp > 1 AND n_late = 1
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  // --- Q22: global sales opportunity (anti-join + scalar subquery) ----------
  /** TPC-H Q22 shape. The phone country code becomes the nation key
    * (grouping dimension), the positive-balance average is the scalar
    * subquery, and customers with no recent orders anti-join away. All
    * three structural elements of Q22 survive; the balance average is
    * exact decimal / count so the cut is engine-identical.
    */
  def q22SalesOpportunity(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .filter(col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6))
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1999-01-01"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  val q22SalesOpportunitySql: String =
    """WITH c AS (SELECT * FROM customer WHERE c_nationkey IN (0,1,2,3,4,5,6)),
      |a AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
      |        AS avg_bal
      |      FROM c WHERE c_acctbal > 0.0)
      |SELECT c_nationkey, COUNT(*) AS numcust,
      | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
      |FROM c, a
      |WHERE c_acctbal > avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
}
