package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-governance reports — the audits a pipeline runs BEFORE a
  * corpus is blessed for training: declarative data-quality
  * expectations (the Deequ/Great-Expectations pattern: Schelter et
  * al., "Automating Large-Scale Data Quality Verification", VLDB
  * 2018), k-anonymity risk over quasi-identifiers (Sweeney, IJUFKS
  * 2002), near-duplicate leakage across train/val/test split
  * boundaries, a Pareto-frontier (skyline) selector (Börzsönyi et
  * al., "The Skyline Operator", ICDE 2001), and rank-based winsorized
  * robust statistics.
  *
  * The shared discipline: every report is a HANDFUL of rows derived
  * from full scans whose per-row work is a narrow codegen'd map, and
  * every aggregation is either map-side-combining (conditional SUMs)
  * or lands on a bounded key domain — so each report costs one pass
  * over the table at any scale, never a self-join and never a
  * driver-side loop.
  */
object Governance {

  // --- declarative data-quality expectations ---------------------------------
  /** Constraint-suite verification report: each row is one declarative
    * expectation (uniqueness, domain, range, completeness, referential
    * integrity, derived-column consistency) with the number of rows
    * checked, the number violating, and the verdict. This is the
    * nightly gate a 100 TB ingest runs before promoting a snapshot —
    * the engine-side counterpart of the reference's per-row
    * arity/cast/validity checks (`subirDB.py:34-49`, which drops and
    * counts malformed rows): there the contract is enforced row-by-row
    * at load time, here it is VERIFIED corpus-wide after the fact.
    *
    * Execution shape: per table, ALL expectations — including the two
    * referential ones — ride ONE scan as conditional `sum(when(...))`
    * partials (map-side combined, a 1-row aggregate each); the
    * uniqueness checks are `count - count_distinct` on the same pass,
    * and each FK check is a LEFT join against the parent's projected
    * key column (broadcast when dimension-sized) feeding one more
    * conditional sum — never a second pass over the child. Nothing here
    * materializes a violation LIST (at 100 TB the list is itself big
    * data — the report counts, and the violating rows are re-derived
    * by composing the same predicate with the scan when a human digs
    * in).
    */
  def dqExpectations(s: SparkSession, dir: String): DataFrame = {
    val bool = (c: Column) => sum(when(c, 1L).otherwise(0L))
    def report(rows: DataFrame, pairs: (String, Column)*): DataFrame = {
      // one agg row -> one report row per rule, via a single stack()
      val agg = rows.agg(count(lit(1)).as("n"),
        pairs.map { case (r, c) => c.as(r) }: _*)
      val stacked = pairs.map { case (r, _) => s"'$r', `$r`" }
        .mkString(s"stack(${pairs.size}, ", ", ", ")")
      agg.select(col("n"), expr(s"$stacked as (rule, n_bad)"))
    }

    // referential integrity rides the SAME scan as the other rules: the
    // child gains a `fk ok` flag from a LEFT join against the parent's
    // projected KEY column (broadcast when dimension-sized, shuffled
    // otherwise — either way the child is scanned once, and the FK rule
    // becomes one more conditional sum instead of its own anti-join +
    // recount pass; the plan audit pins the scan count)
    val custKeys = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("fk_cust")).distinct()
    val orders = Tables.load(s, dir, "orders")
      .join(custKeys, col("o_custkey") === col("fk_cust"), "left")
    val orderKeys = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("fk_ord")).distinct()
    val li = Tables.load(s, dir, "lineitem")
      .join(orderKeys, col("l_orderkey") === col("fk_ord"), "left")
    val docs = Tables.load(s, dir, "documents")
    val oRep = report(orders,
      "orders_orderkey_unique" ->
        (count(lit(1)) - countDistinct(col("o_orderkey"))),
      "orders_status_domain" ->
        bool(!col("o_orderstatus").isin("O", "F", "P")),
      "orders_price_positive" ->
        bool(col("o_totalprice").isNull || col("o_totalprice") <= 0.0),
      "orders_date_complete" -> bool(col("o_orderdate").isNull),
      "orders_custkey_fk" -> bool(col("fk_cust").isNull))
    val lRep = report(li,
      // NOTE deliberately NO lineitem uniqueness rule: the synthetic
      // generator draws (orderkey, linenumber) with replacement, so the
      // table has no primary key — an expectation suite must encode the
      // contracts the data actually carries, and a discovered non-key
      // (1401 colliding pairs at sf0.001) is a finding, not a rule
      "lineitem_shipdate_complete" -> bool(col("l_shipdate").isNull),
      "lineitem_quantity_range" ->
        bool(col("l_quantity").isNull ||
          col("l_quantity") < 1.0 || col("l_quantity") > 50.0),
      "lineitem_discount_range" ->
        bool(col("l_discount").isNull ||
          col("l_discount") < 0.0 || col("l_discount") > 0.1),
      "lineitem_orderkey_fk" -> bool(col("fk_ord").isNull))
    val dRep = report(docs,
      "documents_docid_unique" ->
        (count(lit(1)) - countDistinct(col("doc_id"))),
      "documents_lang_domain" ->
        bool(!col("lang").isin("en", "es", "fr", "de", "zh")),
      "documents_nchars_consistent" ->
        bool(col("n_chars") =!= length(col("text"))))
    oRep.unionByName(lRep).unionByName(dRep)
      .select(col("rule"), col("n").as("n_rows"), col("n_bad"),
        (col("n_bad") === 0L).as("pass"))
      .orderBy(col("rule"))
  }

  val dqExpectationsSql: String =
    """WITH o AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS u,
      |    SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS dom,
      |    SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS pos,
      |    SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS dt
      |  FROM orders),
      |l AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS ship,
      |    SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
      |             THEN 1 ELSE 0 END) AS qty,
      |    SUM(CASE WHEN l_discount IS NULL OR l_discount < 0 OR l_discount > 0.1
      |             THEN 1 ELSE 0 END) AS disc
      |  FROM lineitem),
      |d AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) - COUNT(DISTINCT doc_id) AS u,
      |    SUM(CASE WHEN lang NOT IN ('en','es','fr','de','zh') THEN 1 ELSE 0 END) AS dom,
      |    SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS nc
      |  FROM documents),
      |fk1 AS (SELECT (SELECT COUNT(*) FROM orders) AS n, COUNT(*) AS bad
      |        FROM orders WHERE NOT EXISTS
      |          (SELECT 1 FROM customer WHERE c_custkey = o_custkey)),
      |fk2 AS (SELECT (SELECT COUNT(*) FROM lineitem) AS n, COUNT(*) AS bad
      |        FROM lineitem WHERE NOT EXISTS
      |          (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)),
      |r AS (
      |  SELECT 'orders_orderkey_unique' AS rule, n, CAST(u AS BIGINT) AS n_bad FROM o
      |  UNION ALL SELECT 'orders_status_domain', n, CAST(dom AS BIGINT) FROM o
      |  UNION ALL SELECT 'orders_price_positive', n, CAST(pos AS BIGINT) FROM o
      |  UNION ALL SELECT 'orders_date_complete', n, CAST(dt AS BIGINT) FROM o
      |  UNION ALL SELECT 'lineitem_shipdate_complete', n, CAST(ship AS BIGINT) FROM l
      |  UNION ALL SELECT 'lineitem_quantity_range', n, CAST(qty AS BIGINT) FROM l
      |  UNION ALL SELECT 'lineitem_discount_range', n, CAST(disc AS BIGINT) FROM l
      |  UNION ALL SELECT 'documents_docid_unique', n, CAST(u AS BIGINT) FROM d
      |  UNION ALL SELECT 'documents_lang_domain', n, CAST(dom AS BIGINT) FROM d
      |  UNION ALL SELECT 'documents_nchars_consistent', n, CAST(nc AS BIGINT) FROM d
      |  UNION ALL SELECT 'orders_custkey_fk', n, CAST(bad AS BIGINT) FROM fk1
      |  UNION ALL SELECT 'lineitem_orderkey_fk', n, CAST(bad AS BIGINT) FROM fk2)
      |SELECT rule, n AS n_rows, n_bad, n_bad = 0 AS pass FROM r
      |ORDER BY rule""".stripMargin

  // --- k-anonymity over quasi-identifiers ------------------------------------
  /** Per-equivalence-class k-anonymity report over the classic quasi-
    * identifier pair (nation, market segment) on the customer table:
    * each QI combination's population, whether it meets k = 5, and the
    * re-identification risk (1/|class| — the probability a linkage
    * attack pins a specific individual given the QIs). A release is
    * k-anonymous iff EVERY class meets k; the classes this report
    * flags are the ones to generalize or suppress before export.
    *
    * Shape: one groupBy on a bounded QI domain (|nations| × |segments|
    * classes) — one map-side-combined shuffle regardless of table
    * size. Risk is one IEEE division of exact integers (deterministic
    * cross-engine, the repo-wide discipline).
    */
  def kAnonymity(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.load(s, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        (col("class_size") >= k).as("meets_k"),
        (lit(1.0) / col("class_size").cast("double")).as("reident_risk"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  val kAnonymitySql: String =
    """SELECT c_nationkey, c_mktsegment,
      | COUNT(*) AS class_size,
      | COUNT(*) >= 5 AS meets_k,
      | 1.0 / COUNT(*) AS reident_risk
      |FROM customer GROUP BY c_nationkey, c_mktsegment
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // --- dataset-level re-identification risk --------------------------------------
  /** Dataset-level re-identification risk summary over [[kAnonymity]]'s
    * (nation, segment) equivalence classes — the three standard attack
    * models (El Emam & Dankar, JAMIA 2008): PROSECUTOR max risk
    * (1/min class size — the attacker knows their target is in the
    * data and targets the smallest class), the average per-RECORD
    * risk (= n_classes/N exactly, since Σ_records 1/size(class) =
    * n_classes), and the MARKETER expected re-identification count
    * (= n_classes under the random-match model). Plus the share of
    * records in classes below k = 5 — the population the release
    * would actually generalize or suppress.
    *
    * Exactness: every numerator/denominator is an exact BIGINT class
    * count; each reported rate is ONE IEEE division (the avg-risk
    * identity avoids summing per-class reciprocals entirely).
    *
    * Scale: one map-side-combined fold to the bounded QI grid, one
    * 1-row reduce.
    */
  def reidRisk(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.load(s, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"))
      .agg(sum(col("class_size")).as("n_records"),
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("min_class_size"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("records_below_k"))
      .select(col("n_records"), col("n_classes"), col("min_class_size"),
        col("records_below_k"),
        (lit(1.0) / col("min_class_size").cast("double"))
          .as("prosecutor_max_risk"),
        (col("n_classes").cast("double") / col("n_records").cast("double"))
          .as("avg_record_risk"),
        (col("records_below_k").cast("double")
          / col("n_records").cast("double")).as("share_below_k"))

  def reidRiskSql(k: Int = 5): String =
    s"""WITH cls AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS class_size
      |  FROM customer GROUP BY c_nationkey, c_mktsegment),
      |a AS (
      |  SELECT CAST(SUM(class_size) AS BIGINT) AS n_records,
      |    CAST(COUNT(*) AS BIGINT) AS n_classes,
      |    CAST(MIN(class_size) AS BIGINT) AS min_class_size,
      |    CAST(SUM(CASE WHEN class_size < $k THEN class_size ELSE 0 END)
      |         AS BIGINT) AS records_below_k
      |  FROM cls)
      |SELECT n_records, n_classes, min_class_size, records_below_k,
      |  1.0 / CAST(min_class_size AS DOUBLE) AS prosecutor_max_risk,
      |  CAST(n_classes AS DOUBLE) / CAST(n_records AS DOUBLE)
      |    AS avg_record_risk,
      |  CAST(records_below_k AS DOUBLE) / CAST(n_records AS DOUBLE)
      |    AS share_below_k
      |FROM a""".stripMargin

  // --- l-diversity over the k-anonymity classes --------------------------------
  /** l-DIVERSITY report over [[kAnonymity]]'s equivalence classes
    * (Machanavajjhala et al., "l-Diversity: Privacy Beyond
    * k-Anonymity", ICDE 2006): k-anonymity alone fails the
    * HOMOGENEITY attack — a class of 50 people all sharing the same
    * sensitive value leaks it despite k = 50. Per (nation, segment)
    * class, with the sensitive attribute = the account-balance band
    * (negative / low / mid / high — the generalization a release
    * would actually export): the DISTINCT-l count, distinct-l ≥ 3,
    * and the stricter ENTROPY l-diversity (class entropy ≥ ln 3 ⇔
    * entropy-3-diverse; ibid. §3.2 — robust to one dominant value
    * where distinct-l is not).
    *
    * Hash-exact: band cuts are exact decimal comparisons; class
    * entropy is the integer-micronat identity
    * ([[graft.queries.TextQueries.charEntropy]]) over exact band
    * counts, and `meets_entropy_l` compares the BIGINT
    * `n·lnµ(n) − Σ c·lnµ(c)` against `n · lnµ(3)` — an ALL-INTEGER
    * inequality, no float threshold anywhere.
    *
    * Shape: one groupBy on (QI, band) — bounded domain, map-side
    * combined — then a class-sized rollup. Nothing scales past
    * |classes|·4 rows after the first aggregation.
    */
  def lDiversity(s: SparkSession, dir: String, l: Int = 3): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val band = when(col("c_acctbal") < 0, "negative")
      .when(col("c_acctbal") < 3000, "low")
      .when(col("c_acctbal") < 7000, "mid")
      .otherwise("high")
    val cells = Tables.load(s, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"), band.as("band"))
      .agg(count(lit(1)).as("c"))
    // lnµ(l) as an exact literal so the entropy test is integer-only
    val lnL = Math.round(Math.log(l.toDouble) * 1e6)
    cells.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("c")).as("class_size"),
        count(lit(1)).as("n_sensitive_values"),
        sum(col("c") * lnMicro(col("c"))).as("sc"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        col("n_sensitive_values"),
        (col("n_sensitive_values") >= l).as("meets_distinct_l"),
        ((col("class_size") * lnMicro(col("class_size")) - col("sc"))
          .cast("double")
          / (col("class_size").cast("double") * lit(1e6)))
          .as("entropy_nats"),
        (col("class_size") * lnMicro(col("class_size")) - col("sc")
          >= col("class_size") * lit(lnL)).as("meets_entropy_l"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** DuckDB twin of [[lDiversity]], derived from the SAME `l` so the
    * two spellings cannot drift (a call with l != 3 against the default
    * SQL would silently hash-diverge — the threshold and the lnµ(l)
    * literal both depend on l).
    */
  def lDiversitySql(l: Int = 3): String = {
    def lnu(v: String): String =
      s"CAST(round(ln(CAST($v AS DOUBLE)) * 1e6) AS BIGINT)"
    val lnL = Math.round(Math.log(l.toDouble) * 1e6)
    s"""WITH cells AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CASE WHEN c_acctbal < 0 THEN 'negative'
      |         WHEN c_acctbal < 3000 THEN 'low'
      |         WHEN c_acctbal < 7000 THEN 'mid'
      |         ELSE 'high' END AS band,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM customer GROUP BY 1, 2, 3),
      |cls AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(SUM(c) AS BIGINT) AS class_size,
      |    CAST(COUNT(*) AS BIGINT) AS n_sensitive_values,
      |    CAST(SUM(c * ${lnu("c")}) AS BIGINT) AS sc
      |  FROM cells GROUP BY 1, 2)
      |SELECT c_nationkey, c_mktsegment, class_size, n_sensitive_values,
      |  n_sensitive_values >= $l AS meets_distinct_l,
      |  CAST(class_size * ${lnu("class_size")} - sc AS DOUBLE)
      |    / (CAST(class_size AS DOUBLE) * 1e6) AS entropy_nats,
      |  class_size * ${lnu("class_size")} - sc >= class_size * $lnL
      |    AS meets_entropy_l
      |FROM cls ORDER BY c_nationkey, c_mktsegment""".stripMargin
  }

  // --- t-closeness over the k-anonymity classes ---------------------------------
  /** t-CLOSENESS report over [[kAnonymity]]'s equivalence classes (Li,
    * Li & Venkatasubramanian, ICDE 2007) — the third rung of the
    * anonymity ladder: [[lDiversity]] still leaks when a class's
    * sensitive distribution is SKEWED relative to the whole table
    * (the skewness attack), so t-closeness bounds the Earth Mover's
    * Distance between each class's distribution of the ordered
    * sensitive attribute (the 4 account-balance bands) and the global
    * one. For an ordered attribute with unit ground distance,
    * EMD = (1/(m−1))·Σ_{i<m} |CDF_class(i) − CDF_global(i)| (ibid.
    * §4.2).
    *
    * Exactness: the band CDF counts are NESTED THRESHOLD counts
    * (C₁ = #(bal<0), C₂ = #(bal<3000), C₃ = #(bal<7000)) — cumulative
    * by construction, so no window and no band-grid fill-in is needed
    * anywhere. The CDF gap clears denominators:
    * Dᵢ = N·Cᵢ − n·Gᵢ is an exact BIGINT (exact past SF ~2e4, where
    * N·n approaches int64), Σ|Dᵢ| is a fixed 3-term integer add, and
    * EMD = Σ|Dᵢ| / (3·n·N) is ONE IEEE division of exact-integer
    * doubles. `meets_t` compares that double against the same t
    * literal in both engines — deterministic because both sides
    * derive bit-identical EMDs from the same integers.
    *
    * Shape: one map-side-combined groupBy over the bounded QI domain
    * plus a 1-row global aggregate broadcast back — nothing after the
    * first exchange exceeds |classes| rows.
    */
  def tCloseness(s: SparkSession, dir: String, tPct: Int = 20): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    def cums(pfx: String) = Seq(
      sum(when(col("c_acctbal") < 0, 1L).otherwise(0L)).as(s"${pfx}1"),
      sum(when(col("c_acctbal") < 3000, 1L).otherwise(0L)).as(s"${pfx}2"),
      sum(when(col("c_acctbal") < 7000, 1L).otherwise(0L)).as(s"${pfx}3"))
    val gs = cums("g"); val cs = cums("c")
    val g = cust.agg(count(lit(1)).as("n_total"), gs: _*)
    val classes = cust.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"), cs: _*)
    val joined = classes.crossJoin(broadcast(g))
    def d(i: Int): Column =
      col("n_total") * col(s"c$i") - col("class_size") * col(s"g$i")
    val sumAbs = abs(d(1)) + abs(d(2)) + abs(d(3))
    joined.select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        (sumAbs.cast("double")
          / (lit(3.0) * col("class_size").cast("double")
            * col("n_total").cast("double"))).as("emd"))
      .withColumn("meets_t", col("emd") <= lit(tPct.toDouble / 100.0))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** DuckDB twin of [[tCloseness]], derived from the SAME tPct so the
    * threshold literal cannot drift from the Scala default. */
  def tClosenessSql(tPct: Int = 20): String = {
    val t = tPct.toDouble / 100.0
    s"""WITH g AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
      |    CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
      |    CAST(SUM(CASE WHEN c_acctbal < 3000 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
      |    CAST(SUM(CASE WHEN c_acctbal < 7000 THEN 1 ELSE 0 END) AS BIGINT) AS g3
      |  FROM customer),
      |cls AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(COUNT(*) AS BIGINT) AS class_size,
      |    CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN c_acctbal < 3000 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
      |    CAST(SUM(CASE WHEN c_acctbal < 7000 THEN 1 ELSE 0 END) AS BIGINT) AS c3
      |  FROM customer GROUP BY 1, 2),
      |e AS (
      |  SELECT c_nationkey, c_mktsegment, class_size,
      |    CAST(abs(n_total * c1 - class_size * g1)
      |       + abs(n_total * c2 - class_size * g2)
      |       + abs(n_total * c3 - class_size * g3) AS DOUBLE)
      |    / (3.0 * CAST(class_size AS DOUBLE) * CAST(n_total AS DOUBLE)) AS emd
      |  FROM cls CROSS JOIN g)
      |SELECT c_nationkey, c_mktsegment, class_size, emd, emd <= $t AS meets_t
      |FROM e ORDER BY c_nationkey, c_mktsegment""".stripMargin
  }

  // --- near-duplicate leakage across split boundaries -------------------------
  /** Train/val/test LEAKAGE AUDIT: near-duplicate document pairs (the
    * exact prefix-filtered Jaccard join of
    * [[TextQueries.dedupPrefixJaccard]], J >= 0.2) whose two sides
    * were assigned to DIFFERENT splits by [[Sampling.hashSplit]]'s
    * deterministic hash rule. Each such pair is an eval-set
    * contamination: the model trains on one copy and is scored on the
    * other (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL 2022 measures exactly this inflation). The
    * fix this report drives: dedup BEFORE splitting, or assign splits
    * by CLUSTER id rather than doc id.
    *
    * Shape: the pair set is the already-verified similarity join (its
    * prefix filter bounds candidates); split labels are a PURE
    * FUNCTION of doc_id — a narrow map on the pair set, NO join back
    * to the corpus — so the audit costs the similarity join plus
    * nothing.
    */
  def splitLeakageAudit(s: SparkSession, dir: String): DataFrame = {
    val pairs = TextQueries.dedupPrefixJaccard(s, dir)
    pairs
      .withColumn("split_a", Sampling.splitAssign(col("a_id")))
      .withColumn("split_b", Sampling.splitAssign(col("b_id")))
      .filter(col("split_a") =!= col("split_b"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val splitLeakageAuditSql: String =
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
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      |sp AS (
      |  SELECT a_id, b_id, jaccard,
      |    CASE WHEN substr(md5('split:' || CAST(a_id AS VARCHAR)),1,1) < 'c' THEN 'train'
      |         WHEN substr(md5('split:' || CAST(a_id AS VARCHAR)),1,1) < 'e' THEN 'val'
      |         ELSE 'test' END AS split_a,
      |    CASE WHEN substr(md5('split:' || CAST(b_id AS VARCHAR)),1,1) < 'c' THEN 'train'
      |         WHEN substr(md5('split:' || CAST(b_id AS VARCHAR)),1,1) < 'e' THEN 'val'
      |         ELSE 'test' END AS split_b
      |  FROM p WHERE jaccard >= 0.2)
      |SELECT a_id, b_id, jaccard, split_a, split_b FROM sp
      |WHERE split_a <> split_b ORDER BY a_id, b_id""".stripMargin

  // --- functional-dependency audit --------------------------------------------
  /** Functional-dependency discovery/verification over candidate
    * column pairs: does A → B hold (every A value maps to exactly one
    * B)? The profiling step that finds real keys and denormalization
    * opportunities — and catches drift when an FD a downstream job
    * RELIES on silently breaks (the schema contract the
    * [[dqExpectations]] suite can then pin). Reported per candidate:
    * distinct LHS values, LHS values with >1 RHS (violating), extra
    * (A,B) combinations beyond one-per-LHS, and the verdict.
    *
    * Shape: per FD, ONE distinct-pair aggregation then a groupBy on
    * the (already distinct-pair-sized) result — the shuffle carries
    * (A,B) id pairs only, map-side combined. Each candidate is
    * independent; the report unions three 1-row legs.
    */
  def functionalDeps(s: SparkSession, dir: String): DataFrame = {
    def fd(name: String, t: DataFrame, a: String, b: String): DataFrame =
      t.select(col(a).as("a"), col(b).as("b")).distinct()
        .groupBy(col("a")).agg(count(lit(1)).as("nb"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("nb") > 1L, 1L).otherwise(0L)).as("n_violating_lhs"),
          sum(col("nb") - 1L).as("n_extra_pairs"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_violating_lhs"),
          col("n_extra_pairs"), (col("n_extra_pairs") === 0L).as("holds"))
    val orders = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
    val cust = Tables.load(s, dir, "customer")
    fd("o_orderkey->o_custkey", orders, "o_orderkey", "o_custkey")
      .unionByName(fd("l_orderkey->l_suppkey", li, "l_orderkey", "l_suppkey"))
      .unionByName(fd("c_nationkey->c_mktsegment", cust,
        "c_nationkey", "c_mktsegment"))
      .orderBy(col("fd"))
  }

  val functionalDepsSql: String = {
    def leg(name: String, tbl: String, a: String, b: String): String =
      s"""SELECT '$name' AS fd,
         | CAST(COUNT(*) AS BIGINT) AS n_lhs,
         | CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_violating_lhs,
         | CAST(SUM(nb - 1) AS BIGINT) AS n_extra_pairs,
         | SUM(nb - 1) = 0 AS holds
         |FROM (SELECT $a, COUNT(*) AS nb
         |      FROM (SELECT DISTINCT $a, $b FROM $tbl) GROUP BY $a)""".stripMargin
    Seq(leg("o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
      leg("l_orderkey->l_suppkey", "lineitem", "l_orderkey", "l_suppkey"),
      leg("c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  // --- differentially-private count release ------------------------------------
  /** ε-DP released per-language document counts via the Laplace
    * mechanism (sensitivity 1 for a count, b = 1/ε): the release a
    * governance pipeline publishes when exact small-group counts would
    * themselves leak. The Laplace draw is the difference of two
    * exponentials, `(ln u₁ − ln u₂)/ε`, and the uniforms are SEEDED
    * md5 draws (the [[Sampling.weightedSample]] integer-hash
    * discipline: u = first-24-bits-of-md5 + 1 over 2²⁴, with the
    * ln 2²⁴ normalizations cancelling in the difference) — so the
    * noise is REPRODUCIBLE and the release oracle-checkable. A
    * production release would swap the seeded hash for a real CSPRNG;
    * everything else — mechanism, scale, post-processing — is
    * unchanged, and the determinism here is itself standard practice
    * for auditable pipelines (seeded noise, logged seed).
    *
    * Shape: one bounded-key groupBy; noise is arithmetic on the group
    * KEY, so the release costs the count query plus nothing.
    */
  def dpRelease(s: SparkSession, dir: String): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val draw = (salt: String) =>
      conv(substring(md5(concat(lit(salt), col("lang"))), 1, 6), 16, 10)
        .cast("long") + lit(1L)
    Tables.load(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("true_count"))
      .select(col("lang"), col("true_count"),
        (lnMicro(draw("dp1:")) - lnMicro(draw("dp2:"))).as("noise_micro"))
      .select(col("lang"), col("true_count"), col("noise_micro"),
        (col("true_count").cast("double")
          + col("noise_micro").cast("double") / lit(1e6)).as("dp_count"))
      .orderBy(col("lang"))
  }

  val dpReleaseSql: String =
    s"""WITH g AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS true_count,
      |    substr(md5('dp1:' || lang), 1, 6) AS m1,
      |    substr(md5('dp2:' || lang), 1, 6) AS m2
      |  FROM documents GROUP BY lang),
      |n AS (
      |  SELECT lang, true_count,
      |    CAST(round(ln(CAST(${PortableSql.hexValue("m1", 6)} + 1 AS DOUBLE))
      |         * 1e6) AS BIGINT)
      |    - CAST(round(ln(CAST(${PortableSql.hexValue("m2", 6)} + 1 AS DOUBLE))
      |         * 1e6) AS BIGINT) AS noise_micro
      |  FROM g)
      |SELECT lang, true_count, noise_micro,
      | CAST(true_count AS DOUBLE) + CAST(noise_micro AS DOUBLE) / 1e6
      |   AS dp_count
      |FROM n ORDER BY lang""".stripMargin

  // --- corpus datacard ---------------------------------------------------------
  /** The per-language dataset card a corpus release ships with
    * (Gebru et al., "Datasheets for Datasets", CACM 2021): volume
    * (docs, characters, whitespace tokens), provenance breadth
    * (distinct sources), length envelope, and the exact-duplicate
    * rate — each a composition of already-verified measurement
    * disciplines into the one table a consumer reads first.
    *
    * Shape: ONE scan; the per-language aggregate carries counts,
    * min/max, and two count-distincts (source, text digest) — all
    * map-side combined; the digest stands in for the text so nothing
    * document-sized crosses the shuffle. dup_rate is one IEEE division
    * of exact counts.
    */
  def datacard(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("lang"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        md5(col("text")).as("digest"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tok")).as("total_tokens"),
        countDistinct(col("source")).as("n_sources"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        (count(lit(1)) - countDistinct(col("digest"))).as("n_exact_dups"))
      .withColumn("dup_rate",
        col("n_exact_dups").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("lang"))

  val datacardSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      | CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      | CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      | CAST(MIN(n_chars) AS BIGINT) AS min_chars,
      | CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      | CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
      | CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*)
      |   AS dup_rate
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // --- split balance (chi-square independence) --------------------------------
  /** Label-balance audit of the hash split: the χ² independence table
    * between split assignment and class label over the embeddings
    * corpus — per (split, label) cell, the observed count, the
    * expected count under independence (row·col/total), and the cell's
    * χ² contribution. A split that accidentally concentrated a label
    * in val/test shows up as a fat contribution cell; the global χ²
    * is the sum of the (3·|labels|) contribution column — left to the
    * reader/driver because a cross-engine float SUM is the
    * [[Exact]] hazard, while per-cell arithmetic (a handful of IEEE
    * ops on exact integers) is bit-identical.
    *
    * Shape: ONE map-side-combined groupBy on the (split, label) cell
    * domain (bounded: 3·|labels| rows), then windows over that tiny
    * aggregate for the marginals. The corpus is scanned once; the
    * split label is a pure function of vec_id (no join).
    */
  def splitBalanceChisq(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.load(s, dir, "embeddings")
      .select(Sampling.splitAssign(col("vec_id")).as("split"), col("label"))
      .groupBy(col("split"), col("label"))
      .agg(count(lit(1)).as("n_obs"))
    val exp = (sum(col("n_obs")).over(Window.partitionBy(col("split"))) *
      sum(col("n_obs")).over(Window.partitionBy(col("label"))))
      .cast("double") /
      sum(col("n_obs")).over(Window.partitionBy()).cast("double")
    cells
      .withColumn("expected", exp)
      .withColumn("chisq_contrib",
        (col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) / col("expected"))
      .orderBy(col("split"), col("label"))
  }

  val splitBalanceChisqSql: String =
    """WITH cells AS (
      |  SELECT CASE WHEN substr(md5('split:' || CAST(vec_id AS VARCHAR)),1,1) < 'c' THEN 'train'
      |              WHEN substr(md5('split:' || CAST(vec_id AS VARCHAR)),1,1) < 'e' THEN 'val'
      |              ELSE 'test' END AS split,
      |    label, COUNT(*) AS n_obs
      |  FROM embeddings GROUP BY 1, 2),
      |m AS (
      |  SELECT split, label, n_obs,
      |    CAST(SUM(n_obs) OVER (PARTITION BY split)
      |         * SUM(n_obs) OVER (PARTITION BY label) AS DOUBLE)
      |      / CAST(SUM(n_obs) OVER () AS DOUBLE) AS expected
      |  FROM cells)
      |SELECT split, label, n_obs, expected,
      | (CAST(n_obs AS DOUBLE) - expected) * (CAST(n_obs AS DOUBLE) - expected)
      |   / expected AS chisq_contrib
      |FROM m ORDER BY split, label""".stripMargin

  // --- Pareto frontier (skyline) ----------------------------------------------
  /** The skyline of the part catalog under (minimize retail price,
    * maximize size): parts no other part beats on both axes — the
    * "best value at every capacity" frontier (Börzsönyi et al., ICDE
    * 2001). Same operator selects documents under (maximize quality,
    * minimize toxicity) in a curation pipeline.
    *
    * The naive spelling is the O(n²) dominance self-join (the ORACLE
    * deliberately uses it — NOT EXISTS over 2000 rows — so the scale
    * spelling is verified against the definitional one). The engine
    * spelling exploits the 2-D structure: the frontier is a function
    * of the (size → cheapest price) map, whose key domain is BOUNDED
    * (p_size has ≤ 50 values):
    *   1. one map-side-combined groupBy computes min(price) per size;
    *   2. a window over that TINY aggregate (≤ |size domain| rows —
    *      the one acceptable global window: its input is already
    *      aggregate-sized) keeps size s iff its best price undercuts
    *      every strictly-larger size's best price (strict: an
    *      equal-price larger part dominates);
    *   3. a broadcast join back recovers every part matching a
    *      surviving (size, best price) — exact-tie parts are all on
    *      the frontier (neither dominates the other).
    * Total cost at 100 TB: one scan + one bounded-key shuffle + a
    * broadcast — no self-join on the fact table.
    */
  def paretoFrontier(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part")
    val bySize = part.groupBy(col("p_size"))
      .agg(min(col("p_retailprice")).as("best_price"))
    val biggerBest = min(col("best_price"))
      .over(Window.orderBy(col("p_size").desc)
        .rowsBetween(Window.unboundedPreceding, -1))
    // renamed columns: frontierSizes derives from `part`, and joining
    // back on same-named columns trips the ambiguous-self-join check
    val frontierSizes = bySize
      .withColumn("bigger_best", biggerBest)
      .filter(col("bigger_best").isNull ||
        col("best_price") < col("bigger_best"))
      .select(col("p_size").as("f_size"), col("best_price"))
    part.join(broadcast(frontierSizes),
        col("p_size") === col("f_size") &&
          col("p_retailprice") === col("best_price"))
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .orderBy(col("p_size"), col("p_partkey"))
  }

  val paretoFrontierSql: String =
    """SELECT a.p_partkey, a.p_size, a.p_retailprice
      |FROM part a WHERE NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
      |ORDER BY p_size, p_partkey""".stripMargin

  // --- rank-based winsorized robust statistics --------------------------------
  /** Winsorized per-event-type statistics: clamp `value` to its
    * [p1, p99] band and report the clamp bounds and winsorized sum —
    * the robust alternative to trimming when heavy-tailed metrics
    * (latencies, transaction values) must keep their row count. The
    * percentile is RANK-BASED (the value at row_number ceil(n/100) in
    * ascending order), not interpolated: interpolation arithmetic is
    * where engines' float behavior diverges, whereas "the j-th
    * smallest value" is a pure multiset fact both engines agree on
    * exactly. Sums ride as integer micro-units (round(value·1e6) —
    * the repo-wide fixed-point discipline), so the digest is
    * BIGINT-exact.
    *
    * Shape: one rank window per event_type partition (single
    * exchange), then a map-side-combined aggregate on the same key —
    * two passes over the partition, no self-join. At 100 TB the rank
    * window is the honest cost (a per-key sort); when only the BOUNDS
    * are needed at petabyte scale the approx twin is
    * `events_value_quantiles_approx` — this operator is the exact leg
    * of that pair.
    */
  def winsorizeStats(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"))
    val byType = Window.partitionBy(col("event_type"))
    val ranked = ev.select(col("event_type"), col("value"),
      row_number().over(byType.orderBy(col("value"), col("event_id")))
        .as("rn"),
      count(lit(1)).over(byType).as("n"))
    // ceil(n/100) all-integer (the `div` discipline — Column./ would
    // go through double); hi rank mirrors it from the top
    val withBounds = ranked
      .withColumn("lo_rank", expr("(n + 99) div 100"))
      .withColumn("hi_rank", expr("n - ((n + 99) div 100) + 1"))
    withBounds.groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_events"),
        max(when(col("rn") === col("lo_rank"), col("value"))).as("lo"),
        max(when(col("rn") === col("hi_rank"), col("value"))).as("hi"))
      .join(withBounds.select(col("event_type"), col("value")),
        Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        max(col("n_events")).as("n_events"),
        max(round(col("lo") * 1e6).cast("long")).as("lo_micro"),
        max(round(col("hi") * 1e6).cast("long")).as("hi_micro"),
        sum(round(least(greatest(col("value"), col("lo")), col("hi"))
          * 1e6).cast("long")).as("wsum_micro"))
      .orderBy(col("event_type"))
  }

  val winsorizeStatsSql: String =
    """WITH ranked AS (
      |  SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |                       ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |bounds AS (
      |  SELECT event_type,
      |    MAX(n) AS n_events,
      |    MAX(CASE WHEN rn = CAST(floor((n + 99) / 100) AS BIGINT)
      |             THEN value END) AS lo,
      |    MAX(CASE WHEN rn = n - CAST(floor((n + 99) / 100) AS BIGINT) + 1
      |             THEN value END) AS hi
      |  FROM ranked GROUP BY event_type)
      |SELECT r.event_type,
      | MAX(b.n_events) AS n_events,
      | CAST(MAX(round(b.lo * 1e6)) AS BIGINT) AS lo_micro,
      | CAST(MAX(round(b.hi * 1e6)) AS BIGINT) AS hi_micro,
      | CAST(SUM(round(least(greatest(r.value, b.lo), b.hi) * 1e6)) AS BIGINT)
      |   AS wsum_micro
      |FROM ranked r JOIN bounds b ON r.event_type = b.event_type
      |GROUP BY r.event_type ORDER BY r.event_type""".stripMargin

  // --- right-to-erasure impact report ---------------------------------------
  /** Blast-radius report for a GDPR/CCPA deletion request: given the
    * subject list (here: every 97th customer — the deterministic stand-in
    * for an uploaded request file), count the rows each table would lose,
    * how many distinct subjects each count covers, and the fraction of
    * the table affected. This is the report a data-protection officer
    * signs off on BEFORE the cascade runs, and the row counts a
    * lakehouse delete job must reconcile against afterwards.
    *
    * Scale shape: the subject list is dimension-sized and BROADCAST;
    * each fact table is measured with one scan — `orders` via a
    * broadcast semi-join on its own key, `lineitem` via a broadcast
    * semi-join against the (already-filtered) order keys of affected
    * orders. Totals ride the same scans as grouped conditional
    * aggregates, so the report costs exactly one pass per table and no
    * fact-to-fact shuffle. Erasure at 100 TB then partitions by the
    * same keys this report semi-joined on.
    */
  def deleteImpact(s: SparkSession, dir: String): DataFrame = {
    val subjects = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("subj"))
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), (col("c_custkey") % 97 === 0).as("hit"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_affected"),
        countDistinct(when(col("hit"), col("c_custkey"))).as("n_subjects"))
      .select(lit("customer").as("table_name"), col("n_affected"),
        col("n_subjects"), col("n_total"))
    val ordersT = Tables.load(s, dir, "orders")
    val ord = ordersT
      .join(broadcast(subjects), ordersT("o_custkey") === col("subj"),
        "left_outer")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("subj").isNotNull, 1L).otherwise(0L)).as("n_affected"),
        countDistinct(col("subj")).as("n_subjects"))
      .select(lit("orders").as("table_name"), col("n_affected"),
        col("n_subjects"), col("n_total"))
    val affOrders = ordersT
      .join(broadcast(subjects), ordersT("o_custkey") === col("subj"))
      .select(col("o_orderkey").as("aok"), col("subj").as("osubj"))
    val liT = Tables.load(s, dir, "lineitem")
    val li = liT
      .join(broadcast(affOrders), liT("l_orderkey") === col("aok"),
        "left_outer")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("aok").isNotNull, 1L).otherwise(0L)).as("n_affected"),
        countDistinct(col("osubj")).as("n_subjects"))
      .select(lit("lineitem").as("table_name"), col("n_affected"),
        col("n_subjects"), col("n_total"))
    cust.unionByName(ord).unionByName(li)
      .select(col("table_name"), col("n_affected"), col("n_subjects"),
        col("n_total"),
        (col("n_affected").cast("double") / col("n_total").cast("double"))
          .as("affected_frac"))
      .orderBy(col("table_name"))
  }

  val deleteImpactSql: String =
    """WITH subj AS (
      |  SELECT c_custkey AS s FROM customer WHERE c_custkey % 97 = 0),
      |aff_orders AS (
      |  SELECT o_orderkey, o_custkey FROM orders
      |  WHERE o_custkey IN (SELECT s FROM subj)),
      |legs AS (
      |  SELECT 'customer' AS table_name,
      |    CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_affected,
      |    CAST(COUNT(DISTINCT CASE WHEN c_custkey % 97 = 0 THEN c_custkey END)
      |      AS BIGINT) AS n_subjects,
      |    CAST(COUNT(*) AS BIGINT) AS n_total
      |  FROM customer
      |  UNION ALL
      |  SELECT 'orders',
      |    CAST(SUM(CASE WHEN s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(COUNT(DISTINCT s) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM orders LEFT JOIN subj ON o_custkey = s
      |  UNION ALL
      |  SELECT 'lineitem',
      |    CAST(SUM(CASE WHEN ao.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT),
      |    CAST(COUNT(DISTINCT ao.o_custkey) AS BIGINT),
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM lineitem LEFT JOIN aff_orders ao ON l_orderkey = ao.o_orderkey)
      |SELECT table_name, n_affected, n_subjects, n_total,
      |  CAST(n_affected AS DOUBLE) / CAST(n_total AS DOUBLE) AS affected_frac
      |FROM legs ORDER BY table_name""".stripMargin

  // --- Benford first-digit audit --------------------------------------------
  /** First-significant-digit distribution of order totals against
    * Benford's law (Benford 1938; the standard forensic-accounting /
    * synthetic-data smell test — fabricated amounts miss the log-law).
    * The digit is extracted from the BIGINT cents value via string
    * head — decimal formatting of an integer is locale-free and
    * engine-identical, unlike floor(log10(x)) whose libm can land a
    * hair under an exact power of ten. Expected shares
    * log10(1+1/d) ride as micronat-rounded integers (the [[Drift]]
    * lnµ discipline: both engines' ln agree after 1e-6 rounding), so
    * the report is one IEEE division per row over exact integers.
    *
    * Shape: one scan, one 9-key aggregation, broadcast total — the
    * whole audit is map-side at any scale.
    */
  def benford(s: SparkSession, dir: String): DataFrame = {
    def lnMicro(c: Column): Column =
      round(log(c.cast("double")) * lit(1e6)).cast("long")
    val digits = Tables.load(s, dir, "orders")
      .select(substring((col("o_totalprice").cast("decimal(18,6)") * 100)
        .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum(col("n_obs")).as("n_total"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"), col("n_total"),
        (col("n_obs").cast("double") / col("n_total").cast("double"))
          .as("obs_share"),
        ((lnMicro(col("digit") + 1) - lnMicro(col("digit"))).cast("double")
          / lnMicro(lit(10L)).cast("double")).as("benford_share"))
      .withColumn("abs_dev", abs(col("obs_share") - col("benford_share")))
      .orderBy(col("digit"))
  }

  val benfordSql: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100
      |                          AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
      |           AS digit
      |  FROM orders),
      |cnt AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
      |        FROM d GROUP BY digit),
      |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM cnt),
      |b AS (
      |  SELECT digit, n_obs, n_total,
      |    CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) AS obs_share,
      |    CAST(CAST(round(ln(CAST(digit + 1 AS DOUBLE)) * 1e6) AS BIGINT)
      |       - CAST(round(ln(CAST(digit AS DOUBLE)) * 1e6) AS BIGINT)
      |         AS DOUBLE)
      |      / CAST(CAST(round(ln(10.0) * 1e6) AS BIGINT) AS DOUBLE)
      |      AS benford_share
      |  FROM cnt, t)
      |SELECT digit, n_obs, n_total, obs_share, benford_share,
      |       abs(obs_share - benford_share) AS abs_dev
      |FROM b ORDER BY digit""".stripMargin
}
