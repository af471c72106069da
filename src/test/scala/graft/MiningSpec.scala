package graft

import graft.queries.{EventQueries, GraphQueries, Relational}
import org.apache.spark.sql.functions._

/** Exact replays for the mining batch (cohort LTV, association rules,
  * session path trigrams). Value parity vs DuckDB is the driver's
  * oracle check; these pin definitions against independent driver-side
  * recomputes so an agreed-but-wrong spelling can't hide.
  */
class MiningSpec extends SparkSpec {

  test("cohortLtv: telescoping identity and age-0 census") {
    val out = Relational.cohortLtv(spark, sf).collect()
    assert(out.nonEmpty)
    // age 0 of each cohort: n_active == cohort_size (everyone's first
    // order is in the cohort month by construction)
    val age0 = out.filter(_.getLong(1) == 0L)
    assert(age0.nonEmpty)
    age0.foreach(r => assert(r.getLong(2) == r.getLong(4),
      s"cohort ${r.getLong(0)} age-0 active ${r.getLong(2)} != size ${r.getLong(4)}"))
    // cum LTV is non-decreasing within a cohort and telescopes exactly
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(3)
        assert(r.getDouble(5) == cum.toDouble / r.getLong(4).toDouble)
      }
    }
    // total revenue conservation across the triangle
    val totCents = Tables.load(spark, sf, "orders")
      .agg(sum((col("o_totalprice").cast("decimal(18,6)") * lit(100))
        .cast("long"))).head().getLong(0)
    assert(out.map(_.getLong(3)).sum == totCents)
  }

  test("basketRules: exact support/confidence/lift replay of the top-20") {
    val out = GraphQueries.basketRules(spark, sf).collect()
    assert(out.length <= 20 && out.nonEmpty)
    val items = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = items.map(_._1).distinct.length.toLong
    val nPart = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCnt = items.groupBy(_._1).values.flatMap { basket =>
      val pks = basket.map(_._2).sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length)
        yield (pks(i), pks(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rules = pairCnt.toSeq.filter(_._2 >= 3).flatMap { case ((x, y), n) =>
      Seq((x, y, n), (y, x, n))
    }.map { case (a, b, n) =>
      (a, b, n, n.toDouble / nOrders.toDouble, n.toDouble / nPart(a).toDouble,
        n.toDouble * nOrders.toDouble / (nPart(a).toDouble * nPart(b).toDouble))
    }.sortBy { case (a, b, _, _, conf, _) => (-conf, a, b) }.take(20)
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == rules)
    // every emitted rule clears the min-support prune
    assert(out.forall(_.getLong(2) >= 3))
  }

  test("reachCurve: telescopes to the exact distinct-user total") {
    val out = EventQueries.reachCurve(spark, sf).collect()
    assert(out.nonEmpty)
    val nUsers = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    // new-user counts sum to the population; cum telescopes exactly
    assert(out.map(_.getLong(1)).sum == nUsers)
    var cum = 0L
    out.foreach { r => cum += r.getLong(1); assert(r.getLong(2) == cum) }
    assert(out.last.getLong(2) == nUsers)
  }

  test("histogramEqdepth: equal-count buckets with ordered exact bounds") {
    val out = Relational.statsHistogramEqdepth(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L))
    val sizes = out.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    // buckets tile the value axis in order: hi(k) <= lo(k+1)
    out.sliding(2).foreach {
      case Array(p, q) => assert(p.getLong(4) <= q.getLong(3))
      case _ =>
    }
    // conservation: counts and sums match the table totals
    val tot = Tables.load(spark, sf, "orders")
      .agg(count(lit(1)), sum((col("o_totalprice").cast("decimal(18,6)")
        * lit(100)).cast("long"))).head()
    assert(sizes.sum == tot.getLong(0))
    assert(out.map(_.getLong(5)).sum == tot.getLong(1))
    out.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("embedOutliers: brute-force milli-grid centroid-distance replay") {
    val out = graft.queries.EmbeddingQueries.outliersByLabel(spark, sf).collect()
    assert(out.nonEmpty)
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val byLabel = vecs.groupBy(_._2)
    val expected = byLabel.toSeq.sortBy(_._1).flatMap { case (lab, g) =>
      val n = g.length.toLong
      val qs = g.map { case (id, _, v) =>
        (id, v.map(x => math.round(x * 1000)))
      }
      val d = qs.head._2.length
      val sums = Array.tabulate(d)(i => qs.map(_._2(i)).sum)
      qs.map { case (id, q) =>
        val score = (0 until d).map { i =>
          val dev = n * q(i) - sums(i); dev * dev
        }.sum
        (lab, id, score)
      }.sortBy { case (_, id, sc) => (-sc, id) }.take(10).zipWithIndex
        .map { case ((l, id, sc), i) => (l, i + 1L, id, sc) }
    }
    val got = out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("anovaPriority: exact moment replay; F matches the definition") {
    val out = Relational.anovaPriority(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val rows = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"),
        expr("cast(cast(o_totalprice as decimal(18,6)) * 100 as bigint) div 100"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val groups = rows.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2))
    assert(r.getLong(0) == groups.length.toLong)
    assert(r.getLong(1) == rows.length.toLong)
    // ordered accumulation replay (left-to-right over sorted modes)
    var cum = 0.0
    groups.foreach { g =>
      cum += g.sum.toDouble * g.sum.toDouble / g.length.toDouble
    }
    val s0 = rows.map(_._2).sum
    val ss = rows.map(x => x._2 * x._2).sum
    val ssb = cum - s0.toDouble * s0.toDouble / rows.length.toDouble
    val ssw = ss.toDouble - cum
    assert(r.getDouble(2) == ssb && r.getDouble(3) == ssw)
    val k = groups.length.toDouble; val n = rows.length.toDouble
    assert(r.getDouble(4) == (ssb / (k - 1.0)) / (ssw / (n - k)))
    // sums of squares are non-negative and partition total SS
    assert(ssb >= 0 && ssw >= 0)
  }

  test("jsdLangs: exact micronat replay; value in [0, ln 2]") {
    val out = graft.queries.TextQueries.jsdLangs(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val toks = Tables.load(spark, sf, "documents")
      .filter(col("lang").isin("en", "de"))
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .collect().map(x => (x.getString(0), x.getString(1)))
    val c1 = toks.filter(_._1 == "en").groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val c2 = toks.filter(_._1 == "de").groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n1 = c1.values.sum; val n2 = c2.values.sum
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getLong(2) == (c1.keySet ++ c2.keySet).size.toLong)
    def lnMu(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    var sa = 0L; var sb = 0L
    (c1.keySet ++ c2.keySet).foreach { t =>
      val a = c1.getOrElse(t, 0L); val b = c2.getOrElse(t, 0L)
      val mix = a * n2 + b * n1
      if (a > 0) sa += a * (lnMu(2 * a * n2) - lnMu(mix))
      if (b > 0) sb += b * (lnMu(2 * b * n1) - lnMu(mix))
    }
    val jsd = (sa.toDouble / (n1.toDouble * 1e6)
      + sb.toDouble / (n2.toDouble * 1e6)) / 2.0
    assert(r.getDouble(3) == jsd)
    assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-6)
  }

  test("burstiness: exact day-count moment replay per event type") {
    val out = EventQueries.burstiness(spark, sf).collect()
    assert(out.nonEmpty)
    val counts = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    out.foreach { r =>
      val tpe = r.getString(0)
      val days = counts.collect { case ((t, _), c) if t == tpe => c }.toSeq
      val d = days.length.toDouble
      assert(r.getLong(1) == days.length.toLong)
      val sc = days.sum.toDouble; val scc = days.map(c => c * c).sum.toDouble
      assert(r.getDouble(2) == sc / d)
      assert(r.getDouble(3) ==
        ((d * scc - sc * sc) / (d * (d - 1.0))) / (sc / d))
    }
  }

  test("mannKendall: exact S, tie-corrected variance, and Z replay") {
    val out = graft.queries.TimeSeries.mannKendall(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val series = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100))
          .cast("long").as("c"))
      .groupBy("d").agg(sum(col("c")).as("rc"))
      .collect()
      .map(x => (x.getDate(0).toLocalDate.toEpochDay, x.getLong(1) / 100))
      .sortBy(_._1)
    val n = series.length.toLong
    assert(r.getLong(0) == n)
    var sStat = 0L
    for (i <- series.indices; j <- (i + 1) until series.length)
      sStat += java.lang.Long.signum(series(j)._2 - series(i)._2).toLong
    assert(r.getLong(1) == sStat)
    val tieTerm = series.groupBy(_._2).values.map(_.length.toLong)
      .map(tp => tp * (tp - 1) * (2 * tp + 5)).sum
    val varNum = n * (n - 1) * (2 * n + 5) - tieTerm
    assert(r.getLong(2) == varNum)
    val corr = if (sStat > 0) sStat - 1 else if (sStat < 0) sStat + 1 else 0L
    assert(r.getDouble(3) == corr.toDouble / math.sqrt(varNum.toDouble / 18.0))
  }

  test("unattributedPurchases: brute-force negation-pattern replay") {
    val out = EventQueries.unattributedPurchases(spark, sf).collect()
    assert(out.nonEmpty)
    val evs = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), to_date(col("ts")).as("d"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3),
        x.getDate(4).toString))
    val perDay = scala.collection.mutable.Map[String, (Long, Long)]()
    evs.groupBy(_._1).values.foreach { g =>
      // click-before-purchase tiebreak at equal ts, then event_id
      val sorted = g.sortBy(e => (e._2, if (e._4 == "click") 0 else 1, e._3))
      var lastClick = Option.empty[Long]
      sorted.foreach { e =>
        if (e._4 == "click") lastClick = Some(e._2)
        else {
          val un = lastClick.forall(c => e._2 - c > 24L * 3600 * 1000000)
          val (np, nu) = perDay.getOrElse(e._5, (0L, 0L))
          perDay(e._5) = (np + 1, nu + (if (un) 1L else 0L))
        }
      }
    }
    val got = out.map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2))).toSeq
    val expected = perDay.toSeq.sortBy(_._1).map { case (d, (np, nu)) => (d, np, nu) }
    assert(got == expected)
    out.foreach(x =>
      assert(x.getDouble(3) == x.getLong(2).toDouble / x.getLong(1).toDouble))
  }

  test("kcorePeel: brute-force 3-round peel replay; census shrinks monotonically") {
    val out = GraphQueries.kcorePeel(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // independent peel on the collected edge set
    val cs = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(spark, sf, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    var edges = (cs ++ cs.map(e => (e._2, e._1))).toSet
    val census = (1 to 3).map { _ =>
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
      (edges.map(_._1).size.toLong, edges.size.toLong)
    }
    val got = out.map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == census)
    // peeling never grows the graph
    assert(got.sliding(2).forall {
      case Seq(p, q) => q._1 <= p._1 && q._2 <= p._2; case _ => true })
  }

  test("hhiNation: exact share-square recompute; HHI in (0, 1]") {
    val out = Relational.hhiNation(spark, sf).collect()
    assert(out.nonEmpty)
    val rev = Tables.load(spark, sf, "lineitem")
      .select(col("l_suppkey"),
        expr("cast(cast(l_extendedprice as decimal(18,6)) * 100 as bigint) div 100")
          .as("x"))
      .groupBy("l_suppkey").agg(sum(col("x")).as("rev"))
      .join(Tables.load(spark, sf, "supplier")
        .join(Tables.load(spark, sf, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("n_name"), col("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out.foreach { r =>
      val g = rev.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getLong(1) == g.length.toLong)
      val tot = g.sum
      assert(r.getLong(2) == tot)
      val hhi = g.map(x => x * x).sum.toDouble / (tot.toDouble * tot.toDouble)
      assert(r.getDouble(3) == hhi)
      assert(hhi > 0.0 && hhi <= 1.0)
      // HHI is bounded below by 1/n (perfect equality)
      assert(hhi >= 1.0 / g.length - 1e-12)
    }
  }

  test("userEntropy: exact micronat quartile replay") {
    val out = EventQueries.userEntropy(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val ks = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("k"))
      .collect().map(x => (x.getLong(0), x.getLong(2)))
    def lnMu(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val ents = ks.groupBy(_._1).toSeq.map { case (uid, g) =>
      val n = g.map(_._2).sum
      val s = g.map(x => x._2 * lnMu(x._2)).sum
      (uid, (n * lnMu(n) - s).toDouble / (n.toDouble * 1e6))
    }.sortBy { case (uid, h) => (h, uid) }
    val m = ents.length
    assert(r.getLong(0) == m.toLong)
    assert(r.getDouble(1) == ents((m + 3) / 4 - 1)._2)
    assert(r.getDouble(2) == ents((m + 1) / 2 - 1)._2)
    assert(r.getDouble(3) == ents((3 * m + 3) / 4 - 1)._2)
    // entropies are non-negative (micronat rounding can't push below 0
    // by more than the rounding quantum)
    ents.foreach { case (_, h) => assert(h >= -1e-9) }
  }

  test("mutualInfo: exact micronat replay; information inequalities hold") {
    val out = EventQueries.mutualInfo(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val cells = Tables.events(spark, sf)
      .select(col("event_type"),
        (datediff(to_date(col("ts")), to_date(lit("1970-01-01"))) % 7)
          .cast("long").as("y"))
      .groupBy(col("event_type"), col("y")).agg(count(lit(1)).as("c"))
      .collect().map(x => ((x.getString(0), x.getLong(1)), x.getLong(2)))
    def lnMu(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val cx = cells.groupBy(_._1._1).map { case (k, g) => k -> g.map(_._2).sum }
    val cy = cells.groupBy(_._1._2).map { case (k, g) => k -> g.map(_._2).sum }
    val n = cells.map(_._2).sum
    val miSum = cells.map { case ((x, y), c) =>
      c * (lnMu(c) + lnMu(n) - lnMu(cx(x)) - lnMu(cy(y)))
    }.sum
    val hxT = n * lnMu(n) - cx.values.map(v => v * lnMu(v)).sum
    val hyT = n * lnMu(n) - cy.values.map(v => v * lnMu(v)).sum
    assert(r.getLong(0) == n && r.getLong(1) == cx.size.toLong &&
      r.getLong(2) == cy.size.toLong)
    assert(r.getLong(3) == miSum, "mi_micronats diverges from replay")
    assert(r.getDouble(4) == miSum.toDouble / (n.toDouble * 1e6))
    assert(r.getDouble(5) == hxT.toDouble / (n.toDouble * 1e6))
    assert(r.getDouble(6) == hyT.toDouble / (n.toDouble * 1e6))
    assert(r.getDouble(7) == miSum.toDouble / math.min(hxT, hyT).toDouble)
    // information inequalities (up to micronat rounding dust):
    // 0 <= MI <= min(H(X), H(Y)); entropies bounded by ln |support|
    assert(miSum >= -(cells.length.toLong), "MI materially negative")
    assert(miSum <= math.min(hxT, hyT) + cells.length,
      "MI exceeds the min-entropy bound")
    assert(r.getDouble(5) <= math.log(cx.size.toDouble) + 1e-6)
    assert(r.getDouble(6) <= math.log(cy.size.toDouble) + 1e-6)
  }

  test("markovEntropyRate: conditional-entropy replay; chain rule holds") {
    val out = EventQueries.markovEntropyRate(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(x => (x.getLong(0),
        (x.getTimestamp(1).getTime, x.getTimestamp(1).getNanos),
        x.getLong(2), x.getString(3)))
    val pairs = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._2._1, e._2._2, e._3)).map(_._4)
      s.zip(s.drop(1))
    }
    def lnMu(v: Long): Long = Math.round(Math.log(v.toDouble) * 1e6)
    val grid = pairs.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val marg = grid.groupBy(_._1._1).map { case (k, g) => k -> g.values.sum }
    val n = grid.values.sum
    val spair = grid.values.map(c => c * lnMu(c)).sum
    val smarg = marg.values.map(c => c * lnMu(c)).sum
    assert(r.getLong(0) == n && r.getLong(1) == marg.size.toLong &&
      r.getLong(2) == grid.size.toLong)
    assert(r.getDouble(3) == (smarg - spair).toDouble / (n.toDouble * 1e6))
    assert(r.getDouble(4) ==
      (n * lnMu(n) - smarg).toDouble / (n.toDouble * 1e6))
    // information facts (to micronat dust): 0 <= H(next|cur) <= ln|types|,
    // and predictability in [~0, 1]
    assert(r.getDouble(3) >= -1e-6 &&
      r.getDouble(3) <= math.log(marg.size.toDouble) + 1e-6)
    assert(r.getDouble(5) >= -1e-6 && r.getDouble(5) <= 1.0 + 1e-9)
  }

  test("theilNation: micronat replay; decomposition identity within rounding dust") {
    val out = graft.queries.Relational.theilNation(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    // driver-side replay from raw orders/customer/nation
    val spendRows = Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,6)") * lit(100))
        .cast("long")).as("x"))
      .join(Tables.load(spark, sf, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sf, "nation")
        .select(col("n_nationkey"), col("n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("x")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    def lnMu(v: Long): Long = Math.round(Math.log(v.toDouble) * 1e6)
    val byNation = spendRows.groupBy(_._1)
    val n = spendRows.length.toLong
    val st = spendRows.map(_._2).sum
    val expected = byNation.toSeq.map { case (nation, xs) =>
      val ng = xs.length.toLong; val sg = xs.map(_._2).sum
      val wg = xs.map(x => BigInt(x._2) * lnMu(x._2)).sum
      val within = (wg.toDouble - sg.toDouble * (lnMu(sg) - lnMu(ng)).toDouble) /
        (sg.toDouble * 1e6)
      val between = sg.toDouble *
        (lnMu(sg) - lnMu(ng) - lnMu(st) + lnMu(n)).toDouble / (st.toDouble * 1e6)
      (nation, ng, sg, sg.toDouble / st.toDouble, within, between)
    }.sortBy(_._1)
    assert(out.toSeq == expected, "per-nation decomposition diverges from replay")
    // identities (exact math, allow micronat rounding dust):
    // total Theil == Σ between + Σ share·within, everything ≥ ~0
    val wAll = spendRows.map(x => BigInt(x._2) * lnMu(x._2)).sum
    val tTotal = (wAll.toDouble - st.toDouble * (lnMu(st) - lnMu(n)).toDouble) /
      (st.toDouble * 1e6)
    val recomposed = expected.map(_._6).sum +
      expected.map(e => e._4 * e._5).sum
    assert(math.abs(tTotal - recomposed) < 1e-4,
      s"decomposition identity broke: $tTotal vs $recomposed")
    assert(expected.forall(e => e._5 >= -1e-6), "negative within-Theil")
    assert(tTotal >= 0.0 && tTotal < math.log(n.toDouble),
      "total Theil outside [0, ln n)")
  }

  test("poissonBootstrap: exact draw replay; weights follow Poisson(1)") {
    val out = graft.queries.Sampling.poissonBootstrap(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100))
          .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val thresholds = Seq(6171992L, 12343985L, 15429982L, 16458647L,
      16715813L, 16767247L, 16775819L, 16777044L, 16777197L)
    def weight(rep: Long, key: Long): Long = {
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(s"boot$rep:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(m.substring(0, 6), 16)
      thresholds.count(h >= _).toLong
    }
    val trueCents = orders.map(_._2).sum
    out.foreach { r =>
      val rep = r.getLong(0)
      val ws = orders.map { case (k, c) => (weight(rep, k), c) }
      assert(r.getLong(1) == ws.map(_._1).sum)
      val boot = ws.map { case (w, c) => w * c }.sum
      assert(r.getLong(2) == boot)
      assert(r.getDouble(3) ==
        (boot - trueCents).toDouble / trueCents.toDouble)
      // Poisson(1) sanity: mean weight within a loose CLT band of 1
      val meanW = ws.map(_._1).sum.toDouble / ws.length
      assert(math.abs(meanW - 1.0) < 0.2, s"replicate $rep mean $meanW")
    }
  }

  test("docKeywords: exact tf-idf micronat replay of the per-doc top-3") {
    val out = graft.queries.TextQueries.docKeywords(spark, sf).collect()
    assert(out.nonEmpty)
    val toks = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nDocs = Tables.load(spark, sf, "documents")
      .select(countDistinct(col("doc_id"))).head().getLong(0)
    def lnMu(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    val tf = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = tf.keys.map(_._1).toSeq.distinct.sorted.flatMap { d =>
      tf.collect { case ((dd, t), f) if dd == d =>
        (t, f * (lnMu(nDocs) - lnMu(df(t))))
      }.toSeq.sortBy { case (t, sc) => (-sc, t) }.take(3).zipWithIndex
        .map { case ((t, sc), i) => (d, i + 1L, t, sc) }
    }
    val got = out.map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("runsTest: exact run-count replay around the positional median") {
    val out = graft.queries.TimeSeries.runsTest(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val series = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100))
          .cast("long").as("c"))
      .groupBy("d").agg(sum(col("c")).as("rc"))
      .collect()
      .map(x => (x.getDate(0).toLocalDate, x.getLong(1) / 100))
    val m = series.length
    val med = series.sortBy(x => (x._2, x._1.toEpochDay)).apply((m + 1) / 2 - 1)._2
    val signs = series.sortBy(_._1.toEpochDay)
      .filter(_._2 != med).map(x => if (x._2 > med) 1 else -1)
    val nPos = signs.count(_ == 1).toLong
    val nNeg = signs.count(_ == -1).toLong
    val nRuns = (1 +
      signs.sliding(2).count { case Array(a, b) => a != b; case _ => false }).toLong
    assert(r.getLong(0) == nPos && r.getLong(1) == nNeg && r.getLong(2) == nRuns)
    val n = (nPos + nNeg).toDouble
    val mean = 1.0 + 2.0 * nPos.toDouble * nNeg.toDouble / n
    val variance = (2.0 * nPos.toDouble * nNeg.toDouble
      * (2.0 * nPos.toDouble * nNeg.toDouble - n)) / (n * n * (n - 1.0))
    assert(math.abs(r.getDouble(3) - (nRuns.toDouble - mean) / math.sqrt(variance)) < 1e-12)
  }

  test("spearmanDaily: exact doubled-rank Pearson replay; |rho| <= 1") {
    val out = graft.queries.TimeSeries.spearmanDaily(spark, sf).collect()
    assert(out.length == 1)
    val daily = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100))
          .cast("long").as("c"))
      .groupBy("d").agg(sum(col("c")).as("rev"), count(lit(1)).as("cnt"))
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    def dranks(vs: Seq[Long]): Seq[Long] =
      vs.map(v => 2L * vs.count(_ < v) + vs.count(_ == v) + 1)
    val ra = dranks(daily.map(_._1).toSeq)
    val rb = dranks(daily.map(_._2).toSeq)
    val n = daily.length.toDouble
    val (sa, sb) = (ra.sum.toDouble, rb.sum.toDouble)
    val sab = ra.zip(rb).map { case (a, b) => a * b }.sum.toDouble
    val saa = ra.map(a => a * a).sum.toDouble
    val sbb = rb.map(b => b * b).sum.toDouble
    val rho = (n * sab - sa * sb) /
      math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    assert(out.head.getLong(0) == daily.length.toLong)
    assert(math.abs(out.head.getDouble(1) - rho) < 1e-12)
    assert(math.abs(rho) <= 1.0 + 1e-12)
  }

  test("clusteringCoeff: wedge count replay; transitivity consistent with triangles") {
    val out = graft.queries.GraphQueries.clusteringCoeff(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val items = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { g =>
      val pks = g.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length)
        yield (pks(i), pks(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    assert(r.getLong(1) == wedges)
    assert(r.getDouble(2) ==
      3.0 * r.getLong(0).toDouble / wedges.toDouble)
    // transitivity is a proper fraction of closed wedges
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("linkJaccard: brute-force neighborhood replay of the top-20") {
    val out = graft.queries.GraphQueries.linkJaccard(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    val items = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { g =>
      val pks = g.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length)
        yield (pks(i), pks(j))
    }.toSet
    val nbrs = edges.toSeq.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val scored = edges.toSeq.map { case (u, v) =>
      val common = (nbrs(u) & nbrs(v)).size.toLong
      val jac = common.toDouble / (nbrs(u).size + nbrs(v).size - common).toDouble
      (u, v, common, jac)
    }.sortBy { case (u, v, _, j) => (-j, u, v) }.take(20)
    val got = out.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == scored)
    got.foreach { case (_, _, _, j) => assert(j >= 0.0 && j <= 1.0) }
  }

  test("sessionPaths: brute-force trigram recount of the top-10") {
    val out = EventQueries.sessionPaths(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 10)
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val counts = scala.collection.mutable.Map[String, Long]()
    evs.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(e => (e._2, e._3))
      // split into sessions on >30 min gaps, then count trigrams
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          if (b._2 - a._2 > 30L * 60 * 1000000)
            sessions += scala.collection.mutable.ArrayBuffer(b)
          else sessions.last += b
        case _ =>
      }
      sessions.foreach { sess =>
        sess.map(_._4).sliding(3).foreach { tri =>
          if (tri.length == 3) {
            val p = tri.mkString(">")
            counts(p) = counts.getOrElse(p, 0L) + 1
          }
        }
      }
    }
    val top10 = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val got = out.map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == top10)
  }
}
