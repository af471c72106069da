package graft

import graft.queries.{Drift, EventQueries, Governance, GraphQueries, Relational, TextQueries, TimeSeries}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-8 continuation batch (time-series
  * decomposition, CUSUM, weighted median, unpivot, bounded SSSP,
  * delete-impact, vocab coverage). Value parity is oracle-checked by
  * the driver; these pin the properties a hash match alone wouldn't
  * explain — and the SSSP test is a full brute-force exact replay.
  */
class TimeSeriesSpec extends SparkSpec {

  /** Decode tradeEdges' long node ids (2k = "c<k>", 2k+1 = "s<k>") back
    * to the public strings so the driver-side replays keep their
    * original string-keyed logic and tie-break semantics.
    */
  private def decodeNode(n: Long): String =
    if (n % 2 == 0) s"c${n / 2}" else s"s${(n - 1) / 2}"

  test("seasonalDecompose: trend exists exactly where the 7-row window is full") {
    val out = TimeSeries.seasonalDecompose(spark, sf).collect()
    assert(out.length >= 14, "need a real daily series")
    // ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING: exactly the first 3 and
    // last 3 rows of the ordered series lack a full window
    assert(out.count(r => r.isNullAt(r.fieldIndex("trend_micro"))) == 6)
    val head3 = out.take(3) ++ out.takeRight(3)
    assert(head3.forall(r => r.isNullAt(r.fieldIndex("trend_micro"))))
    // identity: residual = value*1e4 - trend - seasonal, exactly as doubles
    out.filter(r => !r.isNullAt(r.fieldIndex("trend_micro"))).foreach { r =>
      val v = r.getLong(r.fieldIndex("rev_cents")) * 10000L
      val t = r.getLong(r.fieldIndex("trend_micro"))
      val se = r.getDouble(r.fieldIndex("seasonal_micro"))
      val res = r.getDouble(r.fieldIndex("residual_micro"))
      assert(res == (v - t).toDouble - se)
    }
    // dow is epoch-day mod 7
    out.foreach { r =>
      val d = r.getDate(r.fieldIndex("d")).toLocalDate
      assert(r.getLong(r.fieldIndex("dow")) == d.toEpochDay % 7)
    }
  }

  test("seasonalDecompose: per-weekday residual mean is ~0 (the seasonal fit)") {
    val out = TimeSeries.seasonalDecompose(spark, sf)
      .filter(col("residual_micro").isNotNull)
      .groupBy(col("dow"))
      .agg(avg(col("residual_micro")).as("m"), count(lit(1)).as("n"))
      .collect()
    assert(out.nonEmpty)
    // mean(detr - mean(detr)) == 0 up to double-summation noise, which is
    // far below one micro-dollar on realistic counts
    out.foreach(r => assert(math.abs(r.getDouble(1)) < 1.0,
      s"dow ${r.getLong(0)} residual mean ${r.getDouble(1)}"))
  }

  test("cusumChangepoint: 5 ranked rows, |D| non-increasing, exact recompute") {
    val out = TimeSeries.cusumChangepoint(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 5L))
    val mags = out.map(r => math.abs(r.getDouble(2)))
    assert(mags.toSeq == mags.sortBy(-(_: Double)).toSeq)
    // independent exact recompute of D for the rank-1 date
    val daily = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100))
          .cast("long").as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("rc"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val total = daily.map(_._2).sum
    val n = daily.length.toLong
    val top = out.head
    val topD = top.getDate(1).toLocalDate
    val t = daily.indexWhere(_._1 == topD) + 1
    val prefix = daily.take(t).map(_._2).sum
    // d_stat is the correctly-rounded double of the exact decimal D
    assert(top.getDouble(2) ==
      (BigInt(n) * BigInt(prefix) - BigInt(t) * BigInt(total)).toDouble)
    // and rank-1 is the global argmax of |D| over the whole series
    val allD = daily.indices.map { i =>
      (BigInt(n) * BigInt(daily.take(i + 1).map(_._2).sum)
        - BigInt(i + 1) * BigInt(total)).abs
    }
    assert(math.abs(top.getDouble(2)) == allD.max.toDouble)
  }

  test("weightedMedian: cumulative-weight definition holds exactly") {
    val out = Relational.weightedMedian(spark, sf).collect()
    assert(out.nonEmpty)
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag").as("f"),
        (col("l_extendedprice").cast("decimal(18,6)") * lit(100))
          .cast("long").as("cents"),
        col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.foreach { r =>
      val (flag, med, tot) = (r.getString(0), r.getLong(1), r.getLong(2))
      val grp = li.filter(_._1 == flag)
      assert(tot == grp.map(_._3).sum)
      val below = grp.filter(_._2 < med).map(_._3).sum
      val upto = grp.filter(_._2 <= med).map(_._3).sum
      assert(2 * upto >= tot, "median reaches half the weight")
      assert(2 * below < tot, "nothing below the median reaches half")
    }
  }

  test("unpivotMetrics: 3 metrics per nation, values match direct counts") {
    val out = Relational.unpivotMetrics(spark, sf).collect()
    val byNation = out.groupBy(_.getString(0))
    byNation.foreach { case (_, rows) =>
      assert(rows.map(_.getString(1)).sorted.toSeq ==
        Seq("acctbal_cents", "n_customers", "n_suppliers"))
    }
    // spot-exact: n_customers for one nation
    val nation = Tables.load(spark, sf, "nation")
    val cust = Tables.load(spark, sf, "customer")
    val expected = cust.join(nation,
        cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.filter(_.getString(1) == "n_customers").foreach { r =>
      assert(r.getLong(2) == expected.getOrElse(r.getString(0), 0L))
    }
  }

  test("ssspBounded: exact replay by brute-force 3-hop path enumeration") {
    // independent shortest-distance computation: enumerate ALL paths of
    // <= 3 edges from the seeds (tractable at sf0.001) and take mins —
    // the oracle's semantics, recomputed in-process
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val pairs = orders.join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"),
        col("o_orderkey").as("ok")).distinct()
      .groupBy(col("c"), col("sk")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val adj = scala.collection.mutable.Map
      .empty[String, List[(String, Long)]].withDefaultValue(Nil)
    pairs.foreach { case (c, sk, n) =>
      val w = 1000000L / n
      adj(s"c$c") ::= (s"s$sk", w)
      adj(s"s$sk") ::= (s"c$c", w)
    }
    val roots = pairs.map(_._1).filter(_ <= 5).distinct.sorted
    val expected = roots.map { root =>
      val best = scala.collection.mutable.Map(s"c$root" -> 0L)
      var frontier = Map(s"c$root" -> 0L)
      for (_ <- 1 to 3) {
        val next = scala.collection.mutable.Map.empty[String, Long]
        frontier.foreach { case (u, du) =>
          adj(u).foreach { case (v, w) =>
            val cand = du + w
            if (cand < next.getOrElse(v, Long.MaxValue)) next(v) = cand
          }
        }
        next.foreach { case (v, d) =>
          if (d < best.getOrElse(v, Long.MaxValue)) best(v) = d
        }
        frontier = next.toMap
      }
      val reached = best.toSeq.filter(_._2 > 0)
      (root, reached.size.toLong, reached.map(_._2).sum,
        reached.map(_._2).max)
    }
    val got = GraphQueries.ssspBounded(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
  }

  test("deleteImpact: per-table counts match direct recomputation") {
    val out = Governance.deleteImpact(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet == Set("customer", "orders", "lineitem"))
    val cust = Tables.load(spark, sf, "customer")
    val subj = cust.filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    assert(out("customer")._1 == subj.size.toLong)
    assert(out("customer")._2 == subj.size.toLong)
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
    val affOrd = orders.filter(r => subj.contains(r.getLong(1)))
    assert(out("orders")._1 == affOrd.length.toLong)
    assert(out("orders")._2 == affOrd.map(_.getLong(1)).distinct.length.toLong)
    val affOk = affOrd.map(_.getLong(0)).toSet
    val nLi = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey").isInCollection(affOk)).count()
    assert(out("lineitem")._1 == nLi)
    out.values.foreach { case (na, _, nt, frac) =>
      assert(frac == na.toDouble / nt.toDouble && frac >= 0.0 && frac <= 1.0)
    }
  }

  test("autocorrelation: lag-1 matches an exact driver-side Pearson recompute") {
    val daily = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100))
          .cast("long").as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("rc"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1) / 100))
      .sortBy(_._1.toEpochDay).map(_._2)
    def pearson(lag: Int): Double = {
      val xs = daily.dropRight(lag)
      val ys = daily.drop(lag)
      val n = xs.length.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(a => a * a).sum
      (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    }
    val got = TimeSeries.autocorrelation(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == pearson(1))
    assert(got(7L) == pearson(7))
    // a revenue series is noisy but autocorrelation is still a correlation
    got.values.foreach(v => assert(v >= -1.0 && v <= 1.0))
  }

  test("mannWhitney: exact brute-force average-rank recompute, AUC in [0,1]") {
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val (mn, mx) = (ev.map(_._1).min, ev.map(_._1).max)
    val mid = (mn + mx) / 2
    val a = ev.filter(_._1 < mid).map(_._2)
    val b = ev.filter(_._1 >= mid).map(_._2)
    // doubled average ranks over the pooled multiset
    val pooled = (a ++ b).sorted
    val rank2 = pooled.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      v -> xs.map { case (_, i) => 2L * (i + 1) }.sum / xs.length
    }
    val r2a = a.map(rank2).sum
    val u2a = r2a - a.length.toLong * (a.length.toLong + 1)
    val row = Drift.mannWhitney(spark, sf).collect().head
    assert(row.getLong(0) == a.length.toLong)
    assert(row.getLong(1) == b.length.toLong)
    assert(row.getLong(2) == u2a)
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
  }

  test("funnelWithin: stage counts are monotone and match brute force") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val h = 7L * 86400000000L
    val byUser = ev.groupBy(_._1)
    var (n1, n2, n3) = (0L, 0L, 0L)
    byUser.foreach { case (_, rows) =>
      val t1 = rows.filter(_._2 == "signup").map(_._3).sorted.headOption
      t1.foreach { s1 =>
        n1 += 1
        val t2 = rows.filter(r => r._2 == "click" && r._3 >= s1 &&
          r._3 <= s1 + h).map(_._3).sorted.headOption
        t2.foreach { c2 =>
          n2 += 1
          val t3 = rows.filter(r => r._2 == "purchase" && r._3 >= c2 &&
            r._3 <= c2 + h).map(_._3).sorted.headOption
          t3.foreach(_ => n3 += 1)
        }
      }
    }
    val row = EventQueries.funnelWithin(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((n1, n2, n3)))
    assert(row.getLong(0) >= row.getLong(1) && row.getLong(1) >= row.getLong(2))
  }

  test("benford: digit shares sum to 1, expected shares match the log law") {
    val out = Governance.benford(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 9L),
      "all nine leading digits must occur in a realistic amount column")
    val nTotal = out.head.getLong(2)
    assert(out.map(_.getLong(1)).sum == nTotal)
    assert(nTotal == Tables.load(spark, sf, "orders").count())
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    out.foreach { r =>
      val d = r.getLong(0).toDouble
      val expected = (math.round(math.log(d + 1) * 1e6)
        - math.round(math.log(d) * 1e6)).toDouble /
        math.round(math.log(10.0) * 1e6).toDouble
      assert(r.getDouble(4) == expected)
    }
    // Benford's own sanity: expected shares are decreasing in the digit
    val b = out.map(_.getDouble(4))
    assert(b.zip(b.tail).forall { case (x, y) => x > y })
  }

  test("ngramNovelty: exact brute-force shingle replay") {
    val docsRaw = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val shingles = docsRaw.map { case (id, text) =>
      val w = text.split(" ", -1)
      id -> w.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val dfCount = shingles.flatMap(_._2).groupBy(identity).map {
      case (g, xs) => g -> xs.length
    }
    val expected = shingles.map { case (id, gs) =>
      val shared = gs.count(g => dfCount(g) >= 2)
      (id, gs.size.toLong, shared.toLong)
    }.sortBy(_._1)
    val got = TextQueries.ngramNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
  }

  test("assortativity: exact moment recompute over the edge list") {
    val edges = GraphQueries.tradeEdges(spark, sf)
      .collect().map(r => (decodeNode(r.getLong(0)), decodeNode(r.getLong(1))))
    val deg = edges.groupBy(_._1).map { case (n, xs) => n -> xs.length.toLong }
    val pairs = edges.map { case (u, v) => (deg(u), deg(v)) }
    val m = pairs.length.toLong
    val sx = pairs.map(_._1).sum
    val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val expected = (m.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      math.sqrt((m.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        (m.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    val row = GraphQueries.assortativity(spark, sf).collect().head
    assert(row.getLong(0) == m)
    assert(row.getDouble(1) == expected)
    // symmetrized edge list ⇒ the two marginals are identical
    assert(sx == sy && sxx == syy)
  }

  test("labelPropagation: exact replay of 3 synchronous min-tie mode rounds") {
    val edges = GraphQueries.tradeEdges(spark, sf)
      .collect().map(r => (decodeNode(r.getLong(0)), decodeNode(r.getLong(1))))
    val adj = edges.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2) }
    var lab: Map[String, String] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = adj.keys.map { v =>
        // v's new label: mode of IN-neighbors' labels; symmetric graph
        // means in-neighbors(v) = {u : (u,v) in E} = adj edges into v
        val incoming = edges.filter(_._2 == v).map(e => lab(e._1))
        val counts = incoming.groupBy(identity).map { case (l, xs) =>
          (l, xs.length)
        }
        val best = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        v -> best
      }.toMap
    }
    val expected = lab.values.groupBy(identity)
      .map { case (l, xs) => (l, xs.size.toLong) }
      .toSeq.sortBy { case (l, n) => (-n, l) }.take(20)
    val got = GraphQueries.labelPropagation(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == expected)
  }

  test("giniSpend: exact rank-formula recompute; value in [0,1)") {
    val spend = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100))
          .cast("long").as("c"))
      .groupBy(col("o_custkey")).agg(sum(col("c")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, x) => (x, k) }
    val n = spend.length.toLong
    val sx = spend.map(_._2).sum
    val six = spend.zipWithIndex.map { case ((_, x), i) => (i + 1) * x }.sum
    val expected = (2.0 * six.toDouble - (n + 1).toDouble * sx.toDouble) /
      (n.toDouble * sx.toDouble)
    val row = Relational.giniSpend(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == sx)
    assert(row.getDouble(2) == expected)
    assert(expected >= 0.0 && expected < 1.0)
  }

  test("interArrival: exact order-statistic recompute per event type") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val ts = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }.sorted
      val n = gaps.length.toLong
      val p50 = gaps(((n + 1) / 2).toInt - 1)
      val p90 = gaps(((9 * n + 9) / 10).toInt - 1)
      t -> (n, p50, p90, gaps.sum.toDouble / n.toDouble)
    }
    val got = EventQueries.interArrival(spark, sf).collect()
    got.foreach { r =>
      val (n, p50, p90, mean) = expected(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == p50, s"${r.getString(0)} p50")
      assert(r.getLong(3) == p90, s"${r.getString(0)} p90")
      assert(r.getDouble(4) == mean)
    }
    assert(got.length == expected.size)
  }

  test("zipfSlope: exact micronat OLS recompute; slope is negative") {
    val freqs = Tables.load(spark, sf, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
      .toSeq.sortBy { case (t, f) => (-f, t) }.take(100)
    val pts = freqs.zipWithIndex.map { case ((_, f), i) =>
      (math.round(math.log((i + 1).toDouble) * 1e6),
        math.round(math.log(f.toDouble) * 1e6))
    }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val expected = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val row = TextQueries.zipfSlope(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == expected)
    assert(expected < 0.0, "frequency must fall with rank")
  }

  test("vocabCoverage: full-corpus vocab covers everything; tiny vocab doesn't") {
    val full = TextQueries.vocabCoverage(spark, sf, k = 1000000).collect()
    full.foreach { r =>
      assert(r.getLong(1) == r.getLong(2))
      assert(r.getDouble(3) == 1.0)
    }
    val tiny = TextQueries.vocabCoverage(spark, sf, k = 5).collect()
    assert(tiny.exists(r => r.getLong(2) < r.getLong(1)),
      "a 5-term vocab must leave OOV tokens somewhere")
    tiny.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  /** Tiny orders fixture with per-day revenue `dollarsOf(day)` — one
    * order per (day, slot). Days start 2024-01-01.
    */
  private def plantOrders(nDays: Int, perDay: Int)
                         (dollarsOf: (Int, Int) => Double): String = {
    import spark.implicits._
    val rows = for (d <- 0 until nDays; j <- 0 until perDay) yield {
      val date = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong).atStartOfDay())
      ((d * perDay + j).toLong, 1L, "O", dollarsOf(d, j), date, "1-URGENT")
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_ts_big").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    tmp
  }

  test("peaks: planted spikes recovered with exact prominence; plateaus and edges excluded") {
    // 30 flat days at $100/day with: a spike at day 10 (+50), a taller
    // spike at day 20 (+80), a two-day PLATEAU at days 14-15 (+30 each
    // — must report NOTHING: strict domination), and a spike at day 1
    // (inside the 3-day edge — excluded by the full-window rule)
    val bump = Map(10 -> 50.0, 20 -> 80.0, 14 -> 30.0, 15 -> 30.0, 1 -> 60.0)
    val tmp = plantOrders(30, 1)((d, _) => 100.0 + bump.getOrElse(d, 0.0))
    val got = TimeSeries.peaks(spark, tmp).collect()
      .map(r => (r.getDate(0).toLocalDate.getDayOfMonth - 1,
        r.getLong(1), r.getLong(2)))
    // flanks of both real spikes are flat $100 ⇒ prominence = bump
    assert(got.toSeq == Seq((20, 18000L, 8000L), (10, 15000L, 5000L)),
      s"got ${got.toSeq}")
  }

  test("autocorrelation survives daily totals past the BIGINT-squared wrap point") {
    // 40 days x 5 orders x ~2e8 dollars: daily x ~ 1e9, so sum(x*x) ~
    // 3.9e19 > Long.MaxValue — the pre-decimal BIGINT moments wrapped
    // silently here (ADVICE r8 high). Exact BigInt replay must match.
    val tmp = plantOrders(40, 5)((d, j) => 2.0e8 + d * 1000.0 + j * 7.0)
    val got = TimeSeries.autocorrelation(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val daily = (0 until 40).map(d =>
      (0 until 5).map(j => BigInt((2.0e8 + d * 1000.0 + j * 7.0).toLong)).sum)
    // mirrors the query's IEEE chain exactly: each exact sum is cast
    // to double (BigInt.toDouble == Decimal.toDouble: correctly
    // rounded), then the same multiply/subtract/divide sequence
    def pearson(lag: Int): Double = {
      val xs = daily.dropRight(lag); val ys = daily.drop(lag)
      val n = xs.length.toDouble
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
      assert(sxx > BigInt(Long.MaxValue), "fixture must exceed the wrap point")
      (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt((n * sxx.toDouble - sx.toDouble * sx.toDouble) *
          (n * syy.toDouble - sy.toDouble * sy.toDouble))
    }
    assert(got(1L) == pearson(1), s"lag-1: ${got(1L)} != ${pearson(1)}")
    assert(got(7L) == pearson(7), s"lag-7: ${got(7L)} != ${pearson(7)}")
    // the SUMS are exact; the final IEEE chain on a near-collinear
    // huge-magnitude series cancels catastrophically, so |acf| may
    // round a hair past 1 — identically in both engines (the equality
    // asserts above are the teeth). Pre-fix BIGINT wrap produced
    // garbage far outside this band.
    for (lag <- Seq(1, 7)) {
      val v = got(lag.toLong)
      assert(v >= -1.0 - 1e-6 && v <= 1.0 + 1e-6,
        s"lag-$lag acf out of range: $v")
    }
    // the linear trend in the fixture makes both lags strongly positive
    assert(got(1L) > 0.9 && got(7L) > 0.9, s"trend lost: $got")
  }

  test("cusumChangepoint exact past the BIGINT wrap: BigInt replay of the top-1") {
    // 250 days x 5 orders x ~7e11 dollars (decimal(18,6) caps an order
    // at <1e12): total ~ 1e17 cents, so n*total ~ 2.6e19 > Long.Max —
    // the BIGINT n*prefix - t*total wrapped silently here (ADVICE r8
    // medium). Mean shift at day 125.
    val tmp = plantOrders(250, 5) { (d, j) =>
      (if (d < 125) 7.0e11 else 9.5e11) + j * 11.0
    }
    val out = TimeSeries.cusumChangepoint(spark, tmp).collect()
    val dailyCents = (0 until 250).map { d =>
      (0 until 5).map(j => BigInt((((if (d < 125) 7.0e11 else 9.5e11) + j * 11.0)
        * 100).toLong)).sum
    }
    val total = dailyCents.sum
    val n = BigInt(250)
    assert(n * total > BigInt(Long.MaxValue),
      "fixture must exceed the wrap point")
    val allD = dailyCents.indices.map(i =>
      (n * dailyCents.take(i + 1).sum - BigInt(i + 1) * total).abs)
    val top = out.head
    assert(math.abs(top.getDouble(2)) == allD.max.toDouble,
      s"top-1 D mismatch: got ${top.getDouble(2)}, want ±${allD.max}")
    // the planted shift peaks exactly at the boundary day (index 124)
    assert(top.getDate(1).toLocalDate ==
      java.time.LocalDate.of(2024, 1, 1).plusDays(allD.indexOf(allD.max).toLong))
  }

  test("mannKendall and runsTest emit NULL z on a degenerate constant series") {
    val tmp = plantOrders(10, 1)((_, _) => 100.0)
    val mk = TimeSeries.mannKendall(spark, tmp).collect().head
    assert(mk.getLong(2) == 0L, "all-tied series must have var_num = 0")
    assert(mk.isNullAt(3), s"constant series z must be NULL, got ${mk.get(3)}")
    val rt = TimeSeries.runsTest(spark, tmp).collect().head
    assert(rt.isNullAt(3), s"constant series runs z must be NULL, got ${rt.get(3)}")
    // seasonalStrength's 0/0 guard: constant revenue ⇒ detrended ≡ 0 ⇒
    // Var(detrended) = 0 exactly, and the ratio must be NULL, not NaN
    val ss = TimeSeries.seasonalStrength(spark, tmp).collect().head
    assert(ss.getDouble(1) == 0.0, "constant series var_detrended must be 0")
    assert(ss.isNullAt(3),
      s"constant series strength must be NULL, got ${ss.get(3)}")
  }

  test("seasonalStrength: matches a central-sum replay of the decompose output") {
    val out = TimeSeries.seasonalStrength(spark, sf).collect().head
    val dc = TimeSeries.seasonalDecompose(spark, sf).collect()
      .filter(r => !r.isNullAt(r.fieldIndex("trend_micro")))
      .map(r => (r.getLong(r.fieldIndex("dow")),
        r.getLong(r.fieldIndex("rev_cents")) * 10000L
          - r.getLong(r.fieldIndex("trend_micro"))))
    val n = dc.length
    assert(out.getLong(0) == n, "n_days diverges")
    val meanD = dc.map(_._2.toDouble).sum / n
    val varD = dc.map { case (_, x) => (x - meanD) * (x - meanD) }.sum / n
    // residual = detr - dow mean; replay it centrally
    val dowMean = dc.groupBy(_._1).map { case (k, xs) =>
      k -> xs.map(_._2.toDouble).sum / xs.length
    }
    val varR = dc.map { case (k, x) =>
      val r = x - dowMean(k); r * r
    }.sum / n
    assert(math.abs(out.getDouble(1) - varD) < 1e-6 * varD,
      s"var_detrended ${out.getDouble(1)} != replay $varD")
    assert(math.abs(out.getDouble(2) - varR) < 1e-6 * varR,
      s"var_residual ${out.getDouble(2)} != replay $varR")
    val f = math.max(0.0, 1.0 - varR / varD)
    assert(math.abs(out.getDouble(3) - f) < 1e-6, "strength diverges")
    assert(out.getDouble(3) >= 0.0 && out.getDouble(3) <= 1.0)
  }

  test("ljungBox: full driver-side replay of the standard ACF and running Q") {
    val out = TimeSeries.ljungBox(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L), "one row per lag 1..10")
    // independent replay: collect the day series (bounded) and compute
    // the textbook estimator directly over the raw sequence
    val xs = graft.Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        ((col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long"))
          .as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("rc"))
      .orderBy(col("d"))
      .collect().map(r => r.getLong(1) / 100L)  // dollars, truncating
    val n = xs.length
    val xb = xs.sum.toDouble / n
    val den = xs.map(x => (x - xb) * (x - xb)).sum
    var cum = 0.0
    for (r <- out) {
      val k = r.getLong(0).toInt
      val m = r.getLong(1)
      assert(m == n - k, s"lag $k pair count: $m != ${n - k}")
      val num = (0 until n - k).map(t => (xs(t) - xb) * (xs(t + k) - xb)).sum
      val acf = num / den
      assert(math.abs(r.getDouble(2) - acf) < 1e-9,
        s"lag $k acf ${r.getDouble(2)} != replay $acf")
      cum += acf * acf / (n - k)
      val q = n.toDouble * (n + 2.0) * cum
      assert(math.abs(r.getDouble(3) - q) < math.max(1e-6, 1e-9 * math.abs(q)),
        s"lag $k Q ${r.getDouble(3)} != replay $q")
    }
    // the portmanteau is a running sum of squares: non-decreasing
    val qs = out.map(_.getDouble(3))
    assert(qs.zip(qs.tail).forall { case (a, b) => b >= a },
      "Q must be non-decreasing in the horizon")
  }
}
