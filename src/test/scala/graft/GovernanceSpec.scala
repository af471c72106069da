package graft

import graft.queries.{Governance, GraphQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Governance reports: every operator here is pinned against an
  * INDEPENDENT driver-side recompute (plain Scala over collected
  * rows — no Spark expressions shared with the implementation), plus
  * falsifiable planted-violation fixtures for the expectation suite.
  */
class GovernanceSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splitOf(id: Long): String = {
    val c = md5hex(s"split:$id").charAt(0)
    if (c < 'c') "train" else if (c < 'e') "val" else "test"
  }

  test("dqExpectations: the clean corpus passes every rule") {
    val rows = Governance.dqExpectations(spark, sf).collect()
    assert(rows.length == 12, s"12 rules expected, got ${rows.length}")
    val failing = rows.filterNot(_.getAs[Boolean]("pass"))
    assert(failing.isEmpty,
      s"clean test data must satisfy all expectations: ${failing.mkString(",")}")
    assert(rows.forall(_.getAs[Long]("n_rows") > 0L))
  }

  test("dqExpectations: planted violations are counted, not just flagged") {
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    import spark.implicits._
    // corrupt copies: orders gains a duplicated key with a bad status and
    // a negative price referencing a customer that does not exist;
    // lineitem gains an orphan row with an out-of-range discount;
    // documents gains a doc whose n_chars disagrees with its text
    val orders = Tables.load(spark, sf, "orders")
    val badOrder = orders.limit(1)
      .withColumn("o_orderstatus", lit("X"))
      .withColumn("o_totalprice", lit(-1.0))
      .withColumn("o_custkey", lit(999999999L))
    orders.unionByName(badOrder).write.parquet(s"$dir/orders.parquet")
    val li = Tables.load(spark, sf, "lineitem")
    val badLi = li.limit(1)
      .withColumn("l_orderkey", lit(888888888L))
      .withColumn("l_discount", lit(0.5))
    li.unionByName(badLi).write.parquet(s"$dir/lineitem.parquet")
    val docs = Tables.load(spark, sf, "documents")
    val badDoc = docs.limit(1)
      .withColumn("doc_id", lit(777777L))
      .withColumn("n_chars", lit(-5L))
    docs.unionByName(badDoc).write.parquet(s"$dir/documents.parquet")
    Tables.load(spark, sf, "customer").write.parquet(s"$dir/customer.parquet")

    val got = Governance.dqExpectations(spark, dir).collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_bad")).toMap
    assert(got("orders_orderkey_unique") == 1L, s"dup key: $got")
    assert(got("orders_status_domain") == 1L)
    assert(got("orders_price_positive") == 1L)
    assert(got("orders_custkey_fk") == 1L)
    assert(got("lineitem_orderkey_fk") == 1L)
    assert(got("lineitem_discount_range") == 1L)
    assert(got("documents_nchars_consistent") == 1L)
    // untouched rules still pass
    assert(got("orders_date_complete") == 0L)
    assert(got("documents_lang_domain") == 0L)
  }

  test("kAnonymity: classes partition the table; risk and verdict exact") {
    val total = Tables.load(spark, sf, "customer").count()
    val rows = Governance.kAnonymity(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("class_size")).sum == total,
      "equivalence classes must partition the table")
    rows.foreach { r =>
      val n = r.getAs[Long]("class_size")
      assert(r.getAs[Boolean]("meets_k") == (n >= 5))
      assert(math.abs(r.getAs[Double]("reident_risk") - 1.0 / n) == 0.0)
    }
    // sf0.001 has 150 customers over ~125 QI classes: singletons MUST
    // exist, so the report is non-vacuous at test scale
    assert(rows.exists(!_.getAs[Boolean]("meets_k")),
      "expected at least one below-k class in the 150-customer table")
  }

  test("lDiversity: band-count replay; entropy test all-integer-consistent") {
    val rows = Governance.lDiversity(spark, sf).collect()
    val total = Tables.load(spark, sf, "customer").count()
    assert(rows.map(_.getAs[Long]("class_size")).sum == total)
    // driver-side replay of the band histogram per class
    val raw = Tables.load(spark, sf, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => ((r.getAs[Number](0).longValue, r.getString(1)),
        r.getAs[Number](2).doubleValue))
    def band(x: Double): String =
      if (x < 0) "negative" else if (x < 3000) "low"
      else if (x < 7000) "mid" else "high"
    def lnMu(v: Long): Long = Math.round(Math.log(v.toDouble) * 1e6)
    val byClass = raw.groupBy(_._1)
    rows.foreach { r =>
      val key = (r.getAs[Number](0).longValue, r.getString(1))
      val bands = byClass(key).map(x => band(x._2))
        .groupBy(identity).map(_._2.size.toLong)
      val n = bands.sum
      val sc = bands.map(c => c * lnMu(c)).sum
      assert(r.getAs[Long]("class_size") == n)
      assert(r.getAs[Long]("n_sensitive_values") == bands.size.toLong)
      assert(r.getAs[Boolean]("meets_distinct_l") == (bands.size >= 3))
      val hScaled = n * lnMu(n) - sc
      assert(r.getAs[Double]("entropy_nats") ==
        hScaled.toDouble / (n.toDouble * 1e6))
      assert(r.getAs[Boolean]("meets_entropy_l") ==
        (hScaled >= n * lnMu(3)))
      // the ICDE 2006 relation: entropy-l implies distinct-l (entropy
      // of a distribution over m values is at most ln m)
      if (r.getAs[Boolean]("meets_entropy_l"))
        assert(r.getAs[Boolean]("meets_distinct_l"),
          s"$key entropy-diverse but not distinct-diverse")
    }
    // non-vacuous at test scale: both verdicts must occur
    assert(rows.exists(_.getAs[Boolean]("meets_distinct_l")) &&
      rows.exists(!_.getAs[Boolean]("meets_distinct_l")))
  }

  test("tCloseness: ordered-EMD replay; class partition and verdict exact") {
    import org.apache.spark.sql.functions._
    val rows = Tables.load(spark, sf, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal").cast("double"))
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getDouble(2)))
    def cdf(bals: Seq[Double]): Seq[Long] =
      Seq(bals.count(_ < 0).toLong, bals.count(_ < 3000).toLong,
        bals.count(_ < 7000).toLong)
    val all = rows.map(_._2).toSeq
    val n = all.length.toLong
    val g = cdf(all)
    val expected = rows.groupBy(_._1).map { case (k, vs) =>
      val bals = vs.map(_._2).toSeq
      val c = cdf(bals); val m = bals.length.toLong
      val sumAbs = (0 until 3).map(i => math.abs(n * c(i) - m * g(i))).sum
      k -> ((m, sumAbs.toDouble / (3.0 * m * n)))
    }
    val got = Governance.tCloseness(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.keySet == expected.keySet)
    assert(got.values.map(_._1).sum == n, "classes must partition the table")
    for ((k, (m, emd)) <- expected) {
      val (gm, gemd, meets) = got(k)
      assert(gm == m, s"$k size $gm != $m")
      assert(math.abs(gemd - emd) < 1e-15, s"$k emd $gemd != replay $emd")
      assert(meets == (gemd <= 0.2))
      assert(gemd >= 0.0 && gemd <= 1.0)
    }
  }

  test("splitLeakageAudit: equals the near-dup pairs whose sides split apart " +
    "(independent md5 recompute)") {
    val sf01 = "/root/testdata/sf0.01"
    val pairs = TextQueries.dedupPrefixJaccard(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.filter { case (a, b) => splitOf(a) != splitOf(b) }.toSet
    val got = Governance.splitLeakageAudit(spark, sf01).collect()
    got.foreach { r =>
      assert(r.getAs[String]("split_a") != r.getAs[String]("split_b"))
      assert(r.getAs[String]("split_a") == splitOf(r.getLong(0)))
      assert(r.getAs[String]("split_b") == splitOf(r.getLong(1)))
    }
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    assert(got.nonEmpty, "sf0.01 plants near-dup pairs; some must cross splits")
    // split labels are a pure function of the pair ids: the audit adds
    // ZERO table scans over the similarity join it composes
    val scans = (p: String) => "Scan parquet".r.findAllIn(p).size
    assert(scans(planOf(Governance.splitLeakageAudit(spark, sf01))) ==
      scans(planOf(TextQueries.dedupPrefixJaccard(spark, sf01))))
  }

  test("functionalDeps: verdicts and violation counts match a recompute") {
    val rows = Governance.functionalDeps(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_lhs"),
        r.getAs[Long]("n_violating_lhs"), r.getAs[Long]("n_extra_pairs"),
        r.getAs[Boolean]("holds")))).toMap
    assert(rows.size == 3)
    def recompute(t: String, a: String, b: String): (Long, Long, Long) = {
      val pairs = Tables.load(spark, sf, t).select(col(a), col(b)).collect()
        .map(r => (r.get(0), r.get(1))).toSet
      val byA = pairs.groupBy(_._1).view.mapValues(_.size.toLong)
      (byA.size.toLong, byA.count(_._2 > 1).toLong,
        byA.values.map(_ - 1).sum)
    }
    Seq(("o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
      ("l_orderkey->l_suppkey", "lineitem", "l_orderkey", "l_suppkey"),
      ("c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"))
      .foreach { case (name, t, a, b) =>
        val (nl, nv, ne) = recompute(t, a, b)
        val (gl, gv, ge, holds) = rows(name)
        assert((gl, gv, ge) == ((nl, nv, ne)), s"$name: got ($gl,$gv,$ge)")
        assert(holds == (ne == 0L))
      }
    // the audit must demonstrate both verdicts on this schema
    assert(rows("o_orderkey->o_custkey")._4, "orderkey->custkey is a real FD")
    assert(!rows("c_nationkey->c_mktsegment")._4,
      "nation does not determine segment")
  }

  test("dpRelease: seeded Laplace noise reproducible; release consistent") {
    def md5hexS(s0: String): String = md5hex(s0)
    def lnMicro(x: Long): Long =
      new java.math.BigDecimal(math.log(x.toDouble) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val rows = Governance.dpRelease(spark, sf).collect()
    val trueCounts = Tables.load(spark, sf, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == trueCounts.keySet)
    rows.foreach { r =>
      val lang = r.getString(0)
      val h1 = java.lang.Long.parseLong(md5hexS(s"dp1:$lang").take(6), 16) + 1
      val h2 = java.lang.Long.parseLong(md5hexS(s"dp2:$lang").take(6), 16) + 1
      val noise = lnMicro(h1) - lnMicro(h2)
      assert(r.getAs[Long]("true_count") == trueCounts(lang))
      assert(r.getAs[Long]("noise_micro") == noise, s"$lang noise")
      assert(r.getAs[Double]("dp_count") ==
        trueCounts(lang).toDouble + noise.toDouble / 1e6)
      // Laplace(b=1) noise: |draw| beyond 20 has probability ~2e-9 —
      // a sign/scale bug (e.g. missing the ln-difference) reads huge
      assert(math.abs(noise) < 20L * 1000000L, s"$lang noise scale")
    }
  }

  test("datacard: every column matches a driver-side recompute") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("source"), col("n_chars"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val got = Governance.datacard(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == docs.map(_._1).distinct.sorted.toSeq)
    got.foreach { r =>
      val g = docs.filter(_._1 == r.getString(0))
      assert(r.getAs[Long]("n_docs") == g.length.toLong)
      assert(r.getAs[Long]("total_chars") == g.map(_._3).sum)
      assert(r.getAs[Long]("total_tokens") ==
        g.map(_._4.split(" ", -1).length.toLong).sum)
      assert(r.getAs[Long]("n_sources") == g.map(_._2).distinct.length.toLong)
      assert(r.getAs[Long]("min_chars") == g.map(_._3).min)
      assert(r.getAs[Long]("max_chars") == g.map(_._3).max)
      val dups = g.length - g.map(_._4).distinct.length
      assert(r.getAs[Long]("n_exact_dups") == dups.toLong)
      assert(r.getAs[Double]("dup_rate") == dups.toDouble / g.length)
    }
  }

  test("splitBalanceChisq: marginals consistent, contributions exact") {
    val rows = Governance.splitBalanceChisq(spark, sf).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getAs[Long]("n_obs"), r.getAs[Double]("expected"),
          r.getAs[Double]("chisq_contrib")))).toMap
    val total = Tables.load(spark, sf, "embeddings").count()
    assert(rows.values.map(_._1).sum == total, "cells partition the corpus")
    // expected counts from independently-recomputed marginals
    val rowTot = rows.groupBy(_._1._1).view.mapValues(_.values.map(_._1).sum).toMap
    val colTot = rows.groupBy(_._1._2).view.mapValues(_.values.map(_._1).sum).toMap
    rows.foreach { case ((sp, lab), (obs, exp, contrib)) =>
      val e = (rowTot(sp) * colTot(lab)).toDouble / total.toDouble
      assert(exp == e, s"cell ($sp,$lab) expected $exp vs $e")
      val c = (obs.toDouble - e) * (obs.toDouble - e) / e
      assert(contrib == c, s"cell ($sp,$lab) contrib $contrib vs $c")
    }
    // expected-count marginals reproduce the observed marginals (the
    // independence-model invariant)
    val expBySplit = rows.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2._2).sum).toMap
    expBySplit.foreach { case (sp, s) =>
      assert(math.abs(s - rowTot(sp)) < 1e-6) }
  }

  test("paretoFrontier: matches the O(n²) dominance definition and broadcasts") {
    val parts = Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expected = parts.filter { case (_, sz, pr) =>
      !parts.exists { case (_, sz2, pr2) =>
        pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz) }
    }.map(_._1).toSet
    val df = Governance.paretoFrontier(spark, sf)
    assert(df.collect().map(_.getLong(0)).toSet == expected)
    assert(expected.nonEmpty)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"frontier join-back must broadcast the bounded size-domain side:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"the engine spelling must not be the quadratic one:\n$plan")
  }

  test("winsorizeStats: matches a driver-side exact recompute") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def micro(x: Double): Long =
      new java.math.BigDecimal(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val v = rows.map(_._2).sorted
      val n = v.length
      val loR = (n + 99) / 100
      val lo = v(loR - 1)
      val hi = v(n - loR)
      t -> ((n.toLong, micro(lo), micro(hi),
        v.map(x => micro(math.min(math.max(x, lo), hi))).sum))
    }
    val got = Governance.winsorizeStats(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, lo, hi, sum) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("lo_micro") == lo, s"lo for ${r.getString(0)}")
      assert(r.getAs[Long]("hi_micro") == hi, s"hi for ${r.getString(0)}")
      assert(r.getAs[Long]("wsum_micro") == sum, s"wsum for ${r.getString(0)}")
    }
  }

  test("khopReach: matches a driver-side BFS over the same trade graph") {
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val adj = new scala.collection.mutable.HashMap[String, Set[String]]()
      .withDefaultValue(Set.empty)
    Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .foreach { r =>
        o.get(r.getLong(0)).foreach { ck =>
          val (c, su) = (s"c$ck", s"s${r.getLong(1)}")
          adj(c) = adj(c) + su
          adj(su) = adj(su) + c
        }
      }
    val roots = Tables.load(spark, sf, "customer")
      .filter(col("c_custkey") <= 10).collect().map(_.getLong(0))
    val expected = roots.toSeq.flatMap { root =>
      var visited = Set(s"c$root")
      var frontier = visited
      (1 to 3).flatMap { h =>
        frontier = frontier.flatMap(adj) -- visited
        visited ++= frontier
        if (frontier.nonEmpty) Some((root, h, frontier.size.toLong)) else None
      }
    }.toSet
    val got = GraphQueries.khopReach(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected, s"BFS mismatch:\ngot $got\nexp $expected")
    assert(got.nonEmpty)
  }
}
