package graft

import org.apache.spark.sql.functions._
import graft.queries.{Drift, EventQueries, GraphQueries, Relational, Survival, TextQueries, TimeSeries}

/** Independent driver-side replays for the round-13 statistics batch —
  * the mandatory closed-form-stats discipline (the ljungBox
  * newline-parens bug was caught ONLY by its replay spec, never by the
  * oracle compare, because both engines faithfully computed the same
  * wrong formula): every new double-valued estimator is recomputed here
  * from first principles over the collected (bounded) base series and
  * compared against the distributed spelling.
  */
class StatsReplaySpec extends SparkSpec {

  /** Decode tradeEdges' long node ids (2k = "c<k>", 2k+1 = "s<k>") back
    * to the public strings so the driver-side replays keep their
    * original string-keyed logic and tie-break semantics.
    */
  private def decodeNode(n: Long): String =
    if (n % 2 == 0) s"c${n / 2}" else s"s${(n - 1) / 2}"

  private lazy val daySeries: Array[(Long, Long)] =
    Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("x"), sum(col("c")).as("y"))
      .orderBy(col("d"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))

  test("kendallTau: brute-force pair replay (tau-b with ties)") {
    val xs = daySeries
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L; var np = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length) {
      np += 1
      val sx = java.lang.Long.signum(xs(j)._1 - xs(i)._1)
      val sy = java.lang.Long.signum(xs(j)._2 - xs(i)._2)
      if (sx * sy == 1) c += 1
      else if (sx * sy == -1) d += 1
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
    }
    val row = TimeSeries.kendallTau(spark, sf).collect().head
    assert(row.getLong(0) == np && row.getLong(1) == c && row.getLong(2) == d
      && row.getLong(3) == tx && row.getLong(4) == ty,
      s"pair counts ${row.toSeq} != replay ($np, $c, $d, $tx, $ty)")
    val tau = (c - d).toDouble / math.sqrt(((np - tx) * (np - ty)).toDouble)
    assert(math.abs(row.getDouble(5) - tau) < 1e-12,
      s"tau_b ${row.getDouble(5)} != replay $tau")
    assert(row.getDouble(5) >= -1.0 && row.getDouble(5) <= 1.0)
  }

  test("turningPoints: per-year local-extrema replay") {
    val byYear = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("y"))
      .orderBy(col("d"))
      .collect().map(r => (r.getDate(0).toLocalDate.getYear, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = TimeSeries.turningPoints(spark, sf).collect()
      .map(r => r.getLong(0).toInt ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))).toMap
    assert(out.keySet == byYear.keySet)
    for ((yr, ys) <- byYear) {
      val peaks = (1 until ys.length - 1)
        .count(i => ys(i) > ys(i - 1) && ys(i) > ys(i + 1))
      val valleys = (1 until ys.length - 1)
        .count(i => ys(i) < ys(i - 1) && ys(i) < ys(i + 1))
      val (n, p, v, share) = out(yr)
      assert(n == ys.length && p == peaks && v == valleys,
        s"$yr: ($n,$p,$v) != replay (${ys.length},$peaks,$valleys)")
      assert(math.abs(share - (peaks + valleys).toDouble / (ys.length - 2))
        < 1e-12)
    }
  }

  test("varianceRatio: per-year overlapping-sum replay (q=5)") {
    val byYear = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("y"))
      .orderBy(col("d"))
      .collect().map(r => (r.getDate(0).toLocalDate.getYear, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = TimeSeries.varianceRatio(spark, sf).collect()
      .map(r => r.getLong(0).toInt ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    def popVar(zs: Seq[Long]): Double = {
      val n = zs.length
      val s = zs.map(BigInt(_)).sum
      val s2 = zs.map(z => BigInt(z) * BigInt(z)).sum
      (s2.toDouble - s.toDouble * s.toDouble / n) / n
    }
    for ((yr, ys) <- byYear if ys.length > 5) {
      val r = ys.sliding(2).map(p => p(1) - p(0)).toSeq
      val qs = r.sliding(5).map(_.sum).toSeq
      val (n1, nq, v1, vq) = out(yr)
      assert(n1 == r.length && nq == qs.length,
        s"$yr counts ($n1,$nq) != (${r.length},${qs.length})")
      assert(math.abs(v1 - popVar(r)) < 1e-6 * math.max(1.0, popVar(r)),
        s"$yr var_1 $v1 != ${popVar(r)}")
      assert(math.abs(vq - popVar(qs)) < 1e-6 * math.max(1.0, popVar(qs)),
        s"$yr var_q $vq != ${popVar(qs)}")
    }
  }

  test("jarqueBera: BigDecimal moment replay per priority") {
    val base = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = Relational.jarqueBera(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet == base.keySet)
    for ((pri, cs) <- base) {
      val n = cs.length.toDouble
      val mean = cs.map(BigInt(_)).sum.toDouble / n
      def m(p: Int): Double =
        cs.map(c => math.pow(c - mean, p)).sum / n
      val skew = m(3) / math.pow(m(2), 1.5)
      val kurt = m(4) / (m(2) * m(2)) - 3.0
      val jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
      val (no, so, ko, jo) = out(pri)
      assert(no == cs.length)
      assert(math.abs(so - skew) < 1e-7, s"$pri skew $so != $skew")
      assert(math.abs(ko - kurt) < 1e-7, s"$pri kurt $ko != $kurt")
      assert(math.abs(jo - jb) < 1e-5 * math.max(1.0, math.abs(jb)),
        s"$pri jb $jo != $jb")
    }
  }

  test("chi2Cells + cramersV: contingency replay") {
    val rows = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), year(col("o_orderdate")).as("yr"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val obs = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowT = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colT = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTot = rows.length.toDouble
    var chi2micro = 0L
    for (r <- Relational.chi2Cells(spark, sf).collect()) {
      val key = (r.getString(0), r.getLong(1).toInt)
      val e = rowT(key._1) * colT(key._2) / nTot
      assert(r.getLong(2) == obs(key), s"$key obs")
      assert(math.abs(r.getDouble(5) - e) < 1e-9, s"$key expected")
      val term = (obs(key) - e) * (obs(key) - e) / e
      assert(math.abs(r.getDouble(6) - (obs(key) - e) / math.sqrt(e)) < 1e-9)
      assert(r.getLong(7) == math.round(term * 1e6), s"$key chi2_micro")
      chi2micro += r.getLong(7)
    }
    val v = Relational.cramersV(spark, sf).collect().head
    assert(v.getLong(0) == rows.length) // n_rows
    assert(math.abs(v.getDouble(3) - chi2micro / 1e6) < 1e-9)
    val minDim = math.min(rowT.size, colT.size) - 1
    val expectV = math.sqrt(chi2micro / 1e6 / (nTot * minDim))
    assert(math.abs(v.getDouble(4) - expectV) < 1e-12,
      s"cramers_v ${v.getDouble(4)} != $expectV")
    assert(v.getDouble(4) >= 0.0 && v.getDouble(4) <= 1.0)
  }

  test("gTest: plain-double likelihood-ratio replay on the same table") {
    val rows = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), year(col("o_orderdate")).as("yr"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val obs = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowT = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colT = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toDouble
    // independent algorithm: G = 2·Σ obs·ln(obs/expected) in doubles
    var g2 = 0.0
    for (((p, y), o) <- obs) {
      val e = rowT(p) * colT(y) / n
      g2 += 2.0 * o * math.log(o / e)
    }
    val out = Relational.gTest(spark, sf).collect().head
    assert(out.getLong(0) == rows.length)
    assert(out.getLong(1) == (rowT.size - 1L) * (colT.size - 1L), "df")
    // per-cell micronat rounding bounds: |err| ≤ obs·1e-6 per log, two
    // logs per cell → total ≤ 2e-6·N·2 on the doubled sum
    assert(math.abs(out.getDouble(2) - g2) < 4e-6 * n + 1e-9,
      s"g2 ${out.getDouble(2)} != replay $g2")
    assert(out.getDouble(2) >= 0.0 || math.abs(out.getDouble(2)) < 4e-6 * n)
  }

  test("ewma: plain-double recursion replay with truncation bound") {
    val series = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("y"))
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0), r.getLong(1)))
    // independent algorithm: the textbook double recursion
    val sm = new Array[Double](series.length)
    for (i <- series.indices)
      sm(i) = if (i == 0) series(0)._2.toDouble
      else 0.2 * series(i)._2 + 0.8 * sm(i - 1)
    val out = TimeSeries.ewma(spark, sf).collect()
    assert(out.length == math.min(60, series.length))
    val byD = series.map(_._1.toString).zipWithIndex.toMap
    for (r <- out) {
      val i = byD(r.getDate(0).toString)
      // per-step truncation ≤ 1 microcent, geometric carry ⇒ ≤ 5 micro
      val gotCents = r.getLong(2) / 1e6
      assert(math.abs(gotCents - sm(i) / 1.0) < 1e-4 + 1e-9 * sm(i),
        s"day ${r.getDate(0)}: ewma $gotCents != replay ${sm(i)}")
      assert(r.getLong(4) == r.getLong(1) - r.getLong(2) / 1000000L)
      assert(math.abs(r.getDouble(3) - r.getLong(2) / 1e6 / 100.0) < 1e-12)
    }
    // smoother must stay inside the series envelope
    val (mn, mx) = (series.map(_._2).min, series.map(_._2).max)
    assert(out.forall(r => r.getLong(2) >= (mn - 1) * 1000000L
      && r.getLong(2) <= (mx + 1) * 1000000L))
  }

  test("signTest + bowkerSymmetry: textbook replays") {
    // sign test from per-customer year spends
    val per = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), year(to_date(col("o_orderdate"))).as("yr"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues { rows =>
        (rows.filter(_._2 == 1997).map(_._3).sum,
          rows.filter(_._2 == 1998).map(_._3).sum)
      }.toMap
    val np = per.values.count { case (a, b) => b > a }
    val nm = per.values.count { case (a, b) => b < a }
    val nt = per.values.count { case (a, b) => a == b }
    val r1 = Relational.signTest(spark, sf).collect().head
    assert(r1.getLong(0) == np && r1.getLong(1) == nm && r1.getLong(2) == nt)
    if (np + nm > 0) {
      val z = math.signum((np - nm).toDouble) *
        (math.abs((np - nm).toDouble) - 1.0) / math.sqrt((np + nm).toDouble)
      assert(math.abs(r1.getDouble(3) - z) < 1e-12)
    }
    // Bowker from the collected transition grid
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000
        + r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3)))
    val grid = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, rows) <- evs.groupBy(_._1)) {
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4)
      for (Array(a, b) <- seq.sliding(2).map(_.toArray) if a != b)
        grid((a, b)) = grid.getOrElse((a, b), 0L) + 1
    }
    var chi2micro = 0L
    var df = 0L
    val types = grid.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    for (i <- types; j <- types if i < j) {
      val nij = grid.getOrElse((i, j), 0L)
      val nji = grid.getOrElse((j, i), 0L)
      if (nij + nji > 0) {
        df += 1
        chi2micro += (nij - nji) * (nij - nji) * 1000000L / (nij + nji)
      }
    }
    val r2 = Relational.bowkerSymmetry(spark, sf).collect().head
    assert(r2.getLong(0) == df, s"df ${r2.getLong(0)} != $df")
    assert(math.abs(r2.getDouble(1) - chi2micro / 1e6) < 1e-9,
      s"chi2 ${r2.getDouble(1)} != ${chi2micro / 1e6}")
    // reciprocity from the same grid (ordered pairs, volume-weighted)
    var totFlow = 0L
    var recFlow = 0L
    var nPairs = 0L
    for (i <- types; j <- types if i != j) {
      val nij = grid.getOrElse((i, j), 0L)
      val nji = grid.getOrElse((j, i), 0L)
      if (nij > 0 || nji > 0) {
        nPairs += 1; totFlow += nij; recFlow += math.min(nij, nji)
      }
    }
    val r3 = Relational.reciprocity(spark, sf).collect().head
    assert(r3.getLong(0) == nPairs && r3.getLong(1) == totFlow
      && r3.getLong(2) == recFlow, s"${r3.toSeq} vs ($nPairs,$totFlow,$recFlow)")
    assert(math.abs(r3.getDouble(3) - recFlow.toDouble / totFlow) < 1e-15)
    assert(r3.getDouble(3) >= 0.0 && r3.getDouble(3) <= 1.0)
  }

  test("abPowerMde + effectSize + reidRisk: textbook replays") {
    // power grid replay from the query's own control cells
    val pw = Drift.abPowerMde(spark, sf).collect()
    assert(pw.length == 10)
    for (r <- pw) {
      val p0 = r.getDouble(2)
      val p1 = p0 * (1.0 + r.getLong(0) / 100.0)
      assert(math.abs(r.getDouble(3) - p1) < 1e-12)
      if (p1 < 1.0) {
        val zs = 1.959963985 + 0.8416212336
        val n = math.ceil(zs * zs * (p0 * (1 - p0) + p1 * (1 - p1))
          / ((p1 - p0) * (p1 - p0)))
        assert(r.getLong(4) == n.toLong,
          s"mde ${r.getLong(0)}: n ${r.getLong(4)} != $n")
      } else assert(r.isNullAt(4))
    }
    // larger MDE must never need more samples
    val ns = pw.filter(!_.isNullAt(4)).map(_.getLong(4))
    assert(ns.zip(ns.tail).forall { case (a, c) => a >= c })
    // Cohen's d replay
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    val a = ev.filter(_._1 < mid).map(_._2.toDouble)
    val b = ev.filter(_._1 >= mid).map(_._2.toDouble)
    def mean(v: Array[Double]) = v.sum / v.length
    def ss(v: Array[Double]) = { val m = mean(v); v.map(x => (x - m) * (x - m)).sum }
    val sp2 = (ss(a) + ss(b)) / (a.length + b.length - 2)
    val d0 = (mean(b) - mean(a)) / math.sqrt(sp2)
    val es = Drift.effectSize(spark, sf).collect().head
    assert(es.getLong(0) == a.length && es.getLong(1) == b.length)
    assert(math.abs(es.getDouble(4) - d0) < 1e-9, s"d ${es.getDouble(4)} != $d0")
    val g0 = d0 * (1.0 - 3.0 / (4.0 * (a.length + b.length) - 9.0))
    assert(math.abs(es.getDouble(5) - g0) < 1e-9)
    // re-identification risk replay
    val sizes = Tables.load(spark, sf, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment")).count()
      .collect().map(_.getLong(2))
    val rr = graft.queries.Governance.reidRisk(spark, sf).collect().head
    assert(rr.getLong(0) == sizes.sum && rr.getLong(1) == sizes.length)
    assert(rr.getLong(2) == sizes.min)
    assert(rr.getLong(3) == sizes.filter(_ < 5).sum)
    assert(math.abs(rr.getDouble(4) - 1.0 / sizes.min) < 1e-15)
    assert(math.abs(rr.getDouble(5) - sizes.length.toDouble / sizes.sum) < 1e-15)
  }

  test("seasonalMannKendall: brute-force within-season pair replay") {
    val xs = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("y"))
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1) / 100L))
    var sTot = 0L
    var varNum = 0L
    for (g <- 0L until 7L) {
      val season = xs.filter(_._1 % 7 == g).sortBy(_._1).map(_._2)
      for (i <- season.indices; j <- (i + 1) until season.length)
        sTot += java.lang.Long.signum(season(j) - season(i))
      val ng = season.length.toLong
      val tieG = season.groupBy(identity).values
        .map(v => v.length.toLong)
        .map(tp => tp * (tp - 1) * (2 * tp + 5)).sum
      varNum += ng * (ng - 1) * (2 * ng + 5) - tieG
    }
    val r = TimeSeries.seasonalMannKendall(spark, sf).collect().head
    assert(r.getLong(0) == 7 && r.getLong(1) == xs.length)
    assert(r.getLong(2) == sTot, s"s_total ${r.getLong(2)} != $sTot")
    assert(r.getLong(3) == varNum)
    if (varNum > 0) {
      val corr = if (sTot > 0) sTot - 1 else if (sTot < 0) sTot + 1 else 0L
      val z = corr.toDouble / math.sqrt(varNum / 18.0)
      assert(math.abs(r.getDouble(4) - z) < 1e-12)
    } else assert(r.isNullAt(4))
  }

  test("stlAnomaly: driver-side decompose + MAD replay") {
    val series = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("y"))
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0), r.getLong(1)))
    val n = series.length
    def dow(d: java.sql.Date): Long = ((d.toLocalDate.toEpochDay % 7) + 7) % 7
    val det = (3 until n - 3).map { i =>
      val s7 = (i - 3 to i + 3).map(series(_)._2).sum
      (series(i)._1, series(i)._2,
        series(i)._2 * 10000L - (s7 * 10000L) / 7L)
    }
    val seas = det.groupBy(r => dow(r._1)).view.mapValues { rows =>
      val sd = rows.map(_._3).sum
      sd / rows.length // toward-zero truncation, both signs
    }.toMap
    val res = det.map { case (d, y, dm) => (d, y, dm - seas(dow(d))) }
    val absSorted = res.map(r => math.abs(r._3)).sorted
    val m = absSorted.length
    val mad2 = absSorted((m + 1) / 2 - 1) + absSorted((m + 2) / 2 - 1)
    val top = res.sortBy(r => (-math.abs(r._3), r._1.toString)).take(10)
    val out = TimeSeries.stlAnomaly(spark, sf).collect()
    assert(out.length == math.min(10, res.length))
    for ((r, i) <- out.zipWithIndex) {
      assert(r.getLong(0) == i + 1)
      assert(r.getDate(1).toString == top(i)._1.toString,
        s"rank ${i + 1}: ${r.getDate(1)} != ${top(i)._1}")
      assert(r.getLong(2) == top(i)._2 && r.getLong(3) == top(i)._3)
      assert(r.getLong(5) == mad2, s"mad2 ${r.getLong(5)} != $mad2")
      if (mad2 > 0)
        assert(math.abs(r.getDouble(6)
          - 2.0 * math.abs(top(i)._3) / mad2) < 1e-12)
    }
  }

  test("abConversion + abCuped: textbook replays from collected events") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("c"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val mx = ev.map(_._4).max
    val mn = ev.map(_._4).min
    val cut = mx - 3L * 86400000000L
    // conversion replay
    val conv = ev.groupBy(_._1).view.mapValues(rows =>
      rows.exists(r => r._2 == "purchase" && r._4 >= cut)).toMap
    val (na, ca) = (conv.count(_._1 % 2 == 0),
      conv.count(kv => kv._1 % 2 == 0 && kv._2))
    val (nb, cb) = (conv.count(_._1 % 2 == 1),
      conv.count(kv => kv._1 % 2 == 1 && kv._2))
    val r1 = Drift.abConversion(spark, sf).collect().head
    assert(r1.getLong(0) == na && r1.getLong(1) == ca
      && r1.getLong(2) == nb && r1.getLong(3) == cb, s"cells ${r1.toSeq}")
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    assert(math.abs(r1.getDouble(6) - (pb - pa)) < 1e-12)
    // at tiny SFs every user can convert inside the window — the pooled
    // variance degenerates and the contract says NULL, not NaN
    if (ca + cb == 0 || ca + cb == na + nb) assert(r1.isNullAt(7))
    else {
      val pp = (ca + cb).toDouble / (na + nb)
      val z = (pb - pa) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
      assert(math.abs(r1.getDouble(7) - z) < 1e-9,
        s"z ${r1.getDouble(7)} != $z")
    }
    // CUPED replay
    val mid = (mn + mx) / 2
    val pu = ev.groupBy(_._1).view.mapValues { rows =>
      (rows.filter(_._4 < mid).map(_._3).sum,
        rows.filter(_._4 >= mid).map(_._3).sum)
    }.toMap
    val xs = pu.values.map(_._1.toDouble).toArray
    val ys = pu.values.map(_._2.toDouble).toArray
    val n = xs.length
    val (mxm, mym) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mxm) * (y - mym) }.sum
    val vx = xs.map(x => (x - mxm) * (x - mxm)).sum
    val vy = ys.map(y => (y - mym) * (y - mym)).sum
    val theta = cov / vx
    def armMeans(arm: Long): (Double, Double) = {
      val vs = pu.filter(_._1 % 2 == arm).values
      (vs.map(_._1).sum.toDouble / vs.size, vs.map(_._2).sum.toDouble / vs.size)
    }
    val ((xa, ya), (xb, yb)) = (armMeans(0), armMeans(1))
    val r2 = Drift.abCuped(spark, sf).collect().head
    assert(r2.getLong(0) == pu.count(_._1 % 2 == 0))
    assert(math.abs(r2.getDouble(2) - (yb - ya) / 100.0)
      < 1e-9 * math.max(1.0, math.abs(yb - ya)))
    assert(math.abs(r2.getDouble(3) - theta) < 1e-6,
      s"theta ${r2.getDouble(3)} != $theta")
    val cuped = ((yb - ya) - theta * (xb - xa)) / 100.0
    assert(math.abs(r2.getDouble(4) - cuped) < 1e-6 * math.max(1.0, math.abs(cuped)),
      s"cuped ${r2.getDouble(4)} != $cuped")
    assert(math.abs(r2.getDouble(5) - cov * cov / (vx * vy)) < 1e-9)
    assert(r2.getDouble(5) >= 0.0 && r2.getDouble(5) <= 1.0 + 1e-12)
  }

  test("dispersionIndex: plain-double variance-over-mean replay") {
    val xs = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate"))).agg(count(lit(1)).as("x"))
      .collect().map(_.getLong(1))
    val n = xs.length
    val mean = xs.sum.toDouble / n
    val chi2 = xs.map(x => (x - mean) * (x - mean)).sum / mean
    val row = TimeSeries.dispersionIndex(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == xs.sum)
    assert(math.abs(row.getDouble(2) - mean) < 1e-9)
    assert(math.abs(row.getDouble(3) - chi2) < 1e-6 * math.max(1.0, chi2),
      s"chi2 ${row.getDouble(3)} != replay $chi2")
    assert(math.abs(row.getDouble(4) - chi2 / (n - 1)) < 1e-6 * math.max(1.0, chi2))
  }

  test("qqDeciles: driver-side nearest-rank quantile replay") {
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    val a = ev.filter(_._1 < mid).map(_._2).sorted
    val b = ev.filter(_._1 >= mid).map(_._2).sorted
    def q(v: Array[Long], d: Int): Long = v(((d.toLong * v.length + 9) / 10).toInt - 1)
    val out = Drift.qqDeciles(spark, sf).collect()
    assert(out.length == 9)
    for (r <- out) {
      val d = r.getLong(0).toInt
      assert(r.getLong(1) == q(a, d), s"decile $d side a")
      assert(r.getLong(2) == q(b, d), s"decile $d side b")
      assert(r.getLong(3) == q(b, d) - q(a, d))
    }
  }

  test("forecastBacktest: plain-double backtest replay + ordering sanity") {
    val ys = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("y"))
      .orderBy(col("d")).collect().map(_.getLong(1))
    val n = ys.length
    val sm = new Array[Double](n); val l = new Array[Double](n)
    val b = new Array[Double](n)
    for (i <- ys.indices) {
      if (i == 0) { sm(0) = ys(0); l(0) = ys(0); b(0) = (ys(1) - ys(0)).toDouble }
      else {
        sm(i) = 0.2 * ys(i) + 0.8 * sm(i - 1)
        val f = l(i - 1) + b(i - 1)
        l(i) = 0.2 * ys(i) + 0.8 * f
        b(i) = 0.1 * (l(i) - l(i - 1)) + 0.9 * b(i - 1)
      }
    }
    val from = math.max(1, n - 365)
    def mae(f: Int => Double): Double =
      (from until n).map(i => math.abs(ys(i) - f(i))).sum /
        ((n - from) * 100.0)
    val out = TimeSeries.forecastBacktest(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set("ewma", "holt", "naive"))
    val reps = Map(
      "ewma" -> mae(i => sm(i - 1)), "holt" -> mae(i => l(i - 1) + b(i - 1)),
      "naive" -> mae(i => ys(i - 1).toDouble))
    for ((m, (cnt, gmae, grmse)) <- out) {
      assert(cnt == n - from)
      // integer truncation of forecasts shifts each |err| ≤ 1 cent
      assert(math.abs(gmae - reps(m)) < 0.011 + 1e-9 * reps(m),
        s"$m mae $gmae != replay ${reps(m)}")
      assert(grmse >= gmae - 1e-9, s"$m rmse $grmse < mae $gmae")
    }
  }

  test("closenessSampled: driver-side BFS harmonic replay") {
    // independent algorithm: plain BFS over the collected trade edges
    val ordersK = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val adj = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[String]]
    Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .foreach { r =>
        for (c <- ordersK.get(r.getLong(0))) {
          val (a, b) = (s"c$c", s"s${r.getLong(1)}")
          adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
          adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
        }
      }
    val nTotal = Tables.load(spark, sf, "customer").count() +
      Tables.load(spark, sf, "supplier").count()
    val out = GraphQueries.closenessSampled(spark, sf).collect()
    for (r <- out) {
      val root = s"c${r.getLong(0)}"
      var frontier = Set(root)
      var visited = Set(root)
      var harm = 0L
      var reached = 0L
      for (h <- 1 to 3) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(visited)
        visited ++= frontier
        harm += frontier.size * (1000000L / h)
        reached += frontier.size
      }
      assert(r.getLong(1) == reached, s"root $root n_reached")
      assert(r.getLong(2) == nTotal)
      assert(r.getLong(3) == harm, s"root $root harmonic_micro")
      assert(math.abs(r.getDouble(4)
        - harm.toDouble / ((nTotal - 1) * 1e6)) < 1e-12)
    }
    assert(out.nonEmpty)
  }

  test("trimmedMean: driver-side sorted-trim replay") {
    val cents = Tables.load(spark, sf, "orders")
      .select((col("o_totalprice").cast("decimal(18,6)") * lit(100))
        .cast("long").as("c"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (c, k) => (c, k) }.map(_._1)
    val n = cents.length
    val k = n * 10 / 100
    val kept = cents.slice(k, n - k)
    val row = Relational.trimmedMean(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == k)
    assert(row.getLong(2) == kept.length)
    val tm = kept.sum.toDouble / (kept.length * 100.0)
    val m = cents.sum.toDouble / (n * 100.0)
    assert(math.abs(row.getDouble(3) - tm) < 1e-9, s"trimmed ${row.getDouble(3)} != $tm")
    assert(math.abs(row.getDouble(4) - m) < 1e-9)
    // the trimmed mean must lie inside the kept envelope
    assert(row.getDouble(3) >= kept.head / 100.0 - 1e-9
      && row.getDouble(3) <= kept.last / 100.0 + 1e-9)
  }

  test("rollingMedian: driver-side sorted-window replay") {
    val series = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("y"))
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    val expected = series.indices.drop(6).map { i =>
      val win = (i - 6 to i).map(series(_)._2).sorted
      series(i)._1 -> ((win(3), win(1), win(5)))
    }.toMap
    val out = TimeSeries.rollingMedian(spark, sf).collect()
    assert(out.length == series.length - 6)
    for (r <- out) {
      val (med, q1, q3) = expected(r.getDate(0).toString)
      assert(r.getLong(2) == med && r.getLong(3) == q1 && r.getLong(4) == q3,
        s"day ${r.getDate(0)}: (${r.getLong(2)},${r.getLong(3)},${r.getLong(4)})"
          + s" != ($med,$q1,$q3)")
      assert(r.getLong(5) == q3 - q1)
      assert(r.getLong(6) == r.getLong(1) - med)
    }
  }

  test("holtLinear: plain-double two-state recursion replay") {
    val series = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("y"))
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0), r.getLong(1)))
    // independent algorithm: textbook double Holt with alpha=.2 beta=.1
    val l = new Array[Double](series.length)
    val b = new Array[Double](series.length)
    val f = new Array[Double](series.length)
    for (i <- series.indices) {
      if (i == 0) {
        l(0) = series(0)._2.toDouble
        b(0) = (series(1)._2 - series(0)._2).toDouble
        f(0) = l(0)
      } else {
        f(i) = l(i - 1) + b(i - 1)
        l(i) = 0.2 * series(i)._2 + 0.8 * f(i)
        b(i) = 0.1 * (l(i) - l(i - 1)) + 0.9 * b(i - 1)
      }
    }
    val out = TimeSeries.holtLinear(spark, sf).collect()
    assert(out.length == math.min(30, series.length))
    val byD = series.map(_._1.toString).zipWithIndex.toMap
    for (r <- out) {
      val i = byD(r.getDate(0).toString)
      // truncation carries ≤ tens of microcents through both states
      assert(math.abs(r.getLong(2) / 1e6 - l(i)) < 1e-3 + 1e-9 * math.abs(l(i)),
        s"day ${r.getDate(0)}: level ${r.getLong(2) / 1e6} != replay ${l(i)}")
      assert(math.abs(r.getLong(3) / 1e6 - b(i)) < 1e-3 + 1e-9 * math.abs(b(i)),
        s"day ${r.getDate(0)}: trend ${r.getLong(3) / 1e6} != replay ${b(i)}")
      assert(r.getLong(5) == r.getLong(1) * 1000000L - r.getLong(4))
      assert(math.abs(r.getDouble(6) - r.getLong(2) / 1e6 / 100.0) < 1e-12)
    }
  }

  private lazy val docTokens: Array[(Long, String, Array[String])] =
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))

  test("yuleK: repeat-rate replay per lang") {
    val byLang = docTokens.groupBy(_._2).view
      .mapValues(_.flatMap(_._3).filter(_.nonEmpty)).toMap
    val out = TextQueries.yuleK(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == byLang.keySet)
    for ((lang, toks) <- byLang) {
      val counts = toks.groupBy(identity).view.mapValues(_.length.toLong)
      val nTok = toks.length.toDouble
      val s2 = counts.values.map(c => BigInt(c) * BigInt(c)).sum
      val k = 1e4 * (s2.toDouble - nTok) / (nTok * nTok)
      val (n, v, ko) = out(lang)
      assert(n == toks.length && v == counts.size)
      assert(math.abs(ko - k) < 1e-9 * math.max(1.0, math.abs(k)),
        s"$lang yule_k $ko != $k")
    }
  }

  test("goodTuring: trigram frequency-of-frequencies replay") {
    val grams = docTokens.flatMap { case (_, _, ws) =>
      if (ws.length >= 3) (0 to ws.length - 3).map(i =>
        s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
      else Seq.empty
    }
    val fof = grams.groupBy(identity).view.mapValues(_.length.toLong).values
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = TextQueries.goodTuring(spark, sf).collect()
    assert(out.nonEmpty, "trigram tail must be non-empty")
    for (r <- out) {
      val rr = r.getLong(0)
      assert(rr <= 10)
      assert(r.getLong(1) == fof(rr), s"N_$rr")
      fof.get(rr + 1) match {
        case Some(next) =>
          assert(r.getLong(2) == next)
          val rStar = (rr + 1) * next.toDouble / fof(rr)
          assert(math.abs(r.getDouble(3) - rStar) < 1e-12)
        case None =>
          assert(r.isNullAt(2) && r.isNullAt(3), s"r=$rr must be NULL-tailed")
      }
    }
  }

  test("mattr: sliding-window TTR replay") {
    val out = TextQueries.mattr(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    for ((id, _, ws) <- docTokens) {
      val r = out(id)
      assert(r.getLong(1) == ws.length)
      if (ws.length >= 25) {
        val sumD = (0 to ws.length - 25)
          .map(i => ws.slice(i, i + 25).distinct.length.toLong).sum
        assert(r.getLong(2) == sumD, s"$id sum_distinct")
        val m = sumD.toDouble / (25.0 * (ws.length - 24))
        assert(math.abs(r.getDouble(3) - m) < 1e-12, s"$id mattr")
        assert(m > 0.0 && m <= 1.0)
      } else assert(r.isNullAt(2) && r.isNullAt(3))
    }
  }

  test("gopherRepetition: duplicated n-gram char-attribution replay") {
    val out = TextQueries.gopherRepetition(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    def frac(ws: Array[String], n: Int): (Long, Option[Double]) = {
      if (ws.length < n) return (0L, None)
      val grams = (0 to ws.length - n).map(i =>
        ws.slice(i, i + n).mkString(" "))
      val counts = grams.groupBy(identity).view.mapValues(_.length).toMap
      val tot = counts.map { case (g, c) => c.toLong * g.length }.sum
      val dup = counts.collect { case (g, c) if c >= 2 => c.toLong * g.length }
        .sum
      (grams.length.toLong,
        if (tot > 0) Some(dup.toDouble / tot) else None)
    }
    for ((id, _, ws) <- docTokens) {
      val r = out(id)
      val (g2, f2) = frac(ws, 2)
      val (g3, f3) = frac(ws, 3)
      assert(r.getLong(1) == g2 && r.getLong(3) == g3, s"$id gram counts")
      (f2, f3) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(r.getDouble(2) - a) < 1e-12, s"$id dup2")
          assert(math.abs(r.getDouble(4) - b) < 1e-12, s"$id dup3")
        case _ => ()
      }
    }
  }

  test("richClub: suffix-sum replay from the collected edge list") {
    val edges = GraphQueries.copurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val out = GraphQueries.richClub(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet == deg.values.toSet,
      "one row per distinct degree")
    for (r <- out) {
      val k = r.getLong(0)
      val nGt = deg.values.count(_ > k).toLong
      val eGt = edges.count { case (u, v) =>
        math.min(deg(u), deg(v)) > k
      }.toLong
      assert(r.getLong(1) == nGt && r.getLong(2) == eGt,
        s"k=$k: (${r.getLong(1)},${r.getLong(2)}) != ($nGt,$eGt)")
      if (nGt >= 2) {
        val phi = 2.0 * eGt / (nGt.toDouble * (nGt - 1))
        assert(math.abs(r.getDouble(3) - phi) < 1e-12, s"k=$k phi")
        assert(phi >= 0.0 && phi <= 1.0)
      } else assert(r.isNullAt(3))
    }
    // no cartesian anywhere in the plan
    val p = planOf(GraphQueries.richClub(spark, sf))
    assert(!p.contains("CartesianProduct"), s"rich club plans a cartesian:\n$p")
  }

  test("quantileRankAudit: every envelope row TRUE, exact-percentile sanity") {
    val out = EventQueries.quantileRankAudit(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(3)),
      s"envelope violated: ${out.filterNot(_.getBoolean(3)).mkString(", ")}")
    // sanity: the p50 estimate sits between exact p25 and p75 per type
    val approx = EventQueries.valueQuantilesApprox(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exact = EventQueries.valueQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(3)))).toMap
    for ((t, p50) <- approx; (lo, hi) = exact(t))
      assert(p50 >= lo && p50 <= hi, s"$t p50 $p50 outside [$lo, $hi]")
  }

  test("ksUniformWeekday: exact integer D-numerator replay") {
    val dows = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d")).collect()
      .map(_.getDate(0).toLocalDate.toEpochDay % 7)
    val grid = dows.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val n = dows.length.toLong
    var cum = 0L
    val dNum = grid.zipWithIndex.map { case ((_, nk), i) =>
      cum += nk; math.abs(cum * 7L - (i + 1L) * n)
    }.max
    val r = Relational.ksUniformWeekday(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == dNum,
      s"(n, d_num) (${r.getLong(0)}, ${r.getLong(1)}) != replay ($n, $dNum)")
    val d = dNum.toDouble / (7.0 * n.toDouble)
    assert(math.abs(r.getDouble(2) - d) < 1e-15)
    assert(math.abs(r.getDouble(3) - math.sqrt(n.toDouble) * d) < 1e-12)
    assert(d >= 0.0 && d <= 1.0)
  }

  test("nelsonAalen: cumulative-hazard replay; -ln(KM survival) ~ H(t)") {
    val life = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues { rs =>
        val ds = rs.map(_._2); (ds.min, ds.max)
      }.toMap
    val maxD = life.values.map(_._2).max
    val durs = life.values.toSeq.map { case (f, l) =>
      (l.toEpochDay - f.toEpochDay,
        if (maxD.toEpochDay - l.toEpochDay > 90) 1L else 0L)
    }
    val grid = durs.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toSeq.sortBy(_._1)
    val totalAt = grid.map(_._2._1).sum
    var seen = 0L
    var cumNano = 0L
    val expect = grid.flatMap { case (dur, (nAt, dI)) =>
      val nRisk = totalAt - seen; seen += nAt
      if (dI > 0) {
        val hz = java.math.BigDecimal.valueOf(dI.toDouble / nRisk * 1e9)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        cumNano += hz
        Some((dur, nRisk, dI, hz, cumNano))
      } else None
    }
    val out = Survival.nelsonAalen(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == expect, s"NA grid mismatch (first diff: ${
      out.toSeq.zipAll(expect, null, null).find(p => p._1 != p._2)})")
    // cross-check vs KM: on the shared grid, -ln S(t) >= H(t) with
    // equality in the small-hazard limit (ln(1-x) <= -x exactly)
    val km = Survival.kaplanMeier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // (no general upper bound: -ln(1-x)/x grows unboundedly as the
    // at-risk set shrinks toward the tail, so only the direction is a
    // theorem)
    for ((dur, _, _, _, cn) <- expect if km.contains(dur)) {
      val h = cn / 1e9
      val negLnS = -km(dur)
      assert(negLnS >= h - 1e-6, s"dur=$dur -lnS=$negLnS < H=$h")
    }
  }

  test("geomeanByBrand: micronat geomean replay; AM-GM inequality") {
    val parts = Tables.load(spark, sf, "part")
      .select(col("p_brand"),
        (col("p_retailprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = graft.queries.Relational.geomeanByBrand(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == parts.keySet)
    for ((b, cs) <- parts) {
      val n = cs.length.toLong
      val mean = cs.map(BigInt(_)).sum.toDouble / (n * 100.0)
      val sln = cs.map(c => math.round(math.log(c.toDouble) * 1e6)).sum
      val gmCents = math.round(math.exp(sln.toDouble / (n * 1e6)))
      val gm = gmCents.toDouble / 100.0
      val r = out(b)
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - mean) < 1e-12 * mean, s"$b mean")
      assert(r.getLong(3) == gmCents, s"$b gm_cents")
      assert(math.abs(r.getDouble(4) - gm) < 1e-12 * gm, s"$b gm")
      assert(math.abs(r.getDouble(5) - gm / mean) < 1e-12)
      // AM-GM (micronat + cent rounding perturb ~1e-5 relative at most)
      assert(r.getDouble(5) <= 1.0 + 1e-4 && r.getDouble(5) > 0.0)
    }
  }

  test("pielouEvenness: micronat entropy replay; 0 < J <= 1") {
    val byLang = docTokens.groupBy(_._2).view
      .mapValues(_.flatMap(_._3).filter(_.nonEmpty)).toMap
    val out = graft.queries.TextQueries.pielouEvenness(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == byLang.keySet)
    for ((lang, toks) <- byLang) {
      val counts = toks.groupBy(identity).view.mapValues(_.length.toLong)
      val n = toks.length.toLong
      val v = counts.size.toLong
      def lnu(x: Long) = math.round(math.log(x.toDouble) * 1e6)
      val clnc = counts.values.map(c => BigInt(c) * BigInt(lnu(c))).sum
      val h = (n.toDouble * lnu(n).toDouble - clnc.toDouble) / (n * 1e6)
      val r = out(lang)
      assert(r.getLong(1) == n && r.getLong(2) == v)
      assert(math.abs(r.getDouble(3) - h) < 1e-12, s"$lang H")
      if (v > 1) {
        val j = h / (lnu(v).toDouble / 1e6)
        assert(math.abs(r.getDouble(4) - j) < 1e-12, s"$lang J")
        assert(j > 0.0 && j <= 1.0 + 1e-9)
      } else assert(r.isNullAt(4))
    }
  }

  test("hillTailIndex: top-k order-statistics replay") {
    val cents = Tables.load(spark, sf, "events")
      .select(col("value")).collect()
      .map(r => math.round(r.getDouble(0) * 100))
      .filter(_ > 0).sorted(Ordering[Long].reverse)
    val top = cents.take(201)
    def lnu(x: Long) = math.round(math.log(x.toDouble) * 1e6)
    val n = top.length.toLong
    val xk1 = top.min
    val sln = top.map(c => BigInt(lnu(c))).sum
    val h = (sln - BigInt(n) * BigInt(lnu(xk1))).toDouble / ((n - 1) * 1e6)
    val r = graft.queries.EventQueries.hillTailIndex(spark, sf)
      .collect().head
    assert(r.getLong(0) == n - 1 && r.getLong(1) == xk1,
      s"(k, xk1) ${r.toSeq} != replay (${n - 1}, $xk1)")
    assert(math.abs(r.getDouble(2) - h) < 1e-12, s"H ${r.getDouble(2)} != $h")
    if (h > 0) {
      assert(math.abs(r.getDouble(3) - 1.0 / h) < 1e-9)
      assert(r.getDouble(3) > 0.0)
    } else assert(r.isNullAt(3))
  }

  test("logRank: hypergeometric O/E/V replay over the duration grid") {
    val seg = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "BUILDING")).toMap
    val life = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues { rs =>
        val ds = rs.map(_._2); (ds.min, ds.max)
      }.toMap
    val maxD = life.values.map(_._2).max
    val rows = life.toSeq.map { case (ck, (f, l)) =>
      (l.toEpochDay - f.toEpochDay,
        maxD.toEpochDay - l.toEpochDay > 90, seg(ck))
    }
    val grid = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var obs = 0L; var eNano = 0L; var vNano = 0L; var times = 0L
    var seen = 0L; var seenA = 0L
    val totN = rows.length.toLong; val totA = rows.count(_._3).toLong
    for ((_, rs) <- grid) {
      val nT = totN - seen; val nTa = totA - seenA
      seen += rs.length; seenA += rs.count(_._3)
      val dT = rs.count(_._2).toLong
      if (dT > 0) {
        times += 1
        obs += rs.count(r => r._2 && r._3)
        def r9(x: Double) = java.math.BigDecimal.valueOf(x)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        val d = dT.toDouble; val n = nT.toDouble; val na = nTa.toDouble
        eNano += r9(d * na / n * 1e9)
        if (nT > 1)
          vNano += r9(d * (na / n) * (1.0 - na / n)
            * ((n - d) / (n - 1.0)) * 1e9)
      }
    }
    val r = Survival.logRank(spark, sf).collect().head
    assert(r.getLong(0) == times && r.getLong(1) == obs
      && r.getLong(2) == eNano,
      s"(times, O, E_nano) ${r.toSeq} != replay ($times, $obs, $eNano)")
    val z = (obs.toDouble - eNano.toDouble / 1e9) /
      math.sqrt(vNano.toDouble / 1e9)
    assert(math.abs(r.getDouble(4) - z) < 1e-9, s"z ${r.getDouble(4)} != $z")
    assert(math.abs(r.getDouble(5) - z * z) < 1e-9)
  }

  test("wordBurstiness: per-word df/df2 replay of the top-30 cut") {
    val perDocWord = docTokens.flatMap { case (id, _, ws) =>
      ws.filter(_.nonEmpty).groupBy(identity).view
        .mapValues(_.length.toLong).toSeq.map { case (w, c) => (id, w, c) }
    }
    val byWord = perDocWord.groupBy(_._2).view.mapValues { rs =>
      (rs.length.toLong, rs.count(_._3 >= 2).toLong, rs.map(_._3).sum)
    }.toSeq
    val top = byWord.sortBy { case (w, (df, _, _)) => (-df, w) }.take(30)
    val out = TextQueries.wordBurstiness(spark, sf).collect()
    assert(out.length == top.length)
    for ((r, (w, (df, df2, occ))) <- out.zip(top)) {
      assert(r.getString(0) == w && r.getLong(1) == df
        && r.getLong(2) == df2 && r.getLong(3) == occ,
        s"${r.toSeq} != replay ($w, $df, $df2, $occ)")
      assert(math.abs(r.getDouble(4) - df2.toDouble / df) < 1e-15)
      assert(math.abs(r.getDouble(5) - occ.toDouble / df) < 1e-12)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 1.0)
    }
  }

  test("langIdPrf: confusion-matrix precision/recall/F1 replay") {
    val labeled = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .map { r =>
        val truth = if (Set("en", "es")(r.getString(0))) r.getString(0)
          else "other"
        val t = r.getString(1)
        val guess = if (t.contains("the")) "en"
          else if (t.contains("la")) "es" else "other"
        (truth, guess)
      }
    val out = TextQueries.langIdPrf(spark, sf).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("en", "es", "other"))
    for (r <- out) {
      val c = r.getString(0)
      val tp = labeled.count(p => p._1 == c && p._2 == c).toLong
      val fp = labeled.count(p => p._1 != c && p._2 == c).toLong
      val fn = labeled.count(p => p._1 == c && p._2 != c).toLong
      assert(r.getLong(1) == tp && r.getLong(2) == fp && r.getLong(3) == fn,
        s"$c cells ${r.toSeq} != replay ($tp, $fp, $fn)")
      def check(i: Int, num: Long, den: Long): Unit =
        if (den > 0) assert(math.abs(r.getDouble(i) - num.toDouble / den)
          < 1e-15, s"$c col $i")
        else assert(r.isNullAt(i), s"$c col $i must be NULL, not NaN")
      check(4, tp, tp + fp)
      check(5, tp, tp + fn)
      check(6, 2 * tp, 2 * tp + fp + fn)
    }
  }

  test("cohensKappa: marginal-product replay; kappa <= p_o bound") {
    val labeled = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .map { r =>
        val truth = if (Set("en", "es")(r.getString(0))) r.getString(0)
          else "other"
        val t = r.getString(1)
        val guess = if (t.contains("the")) "en"
          else if (t.contains("la")) "es" else "other"
        (truth, guess)
      }
    val n = labeled.length.toLong
    val agree = labeled.count(p => p._1 == p._2).toLong
    val sRc = Seq("en", "es", "other").map { c =>
      BigInt(labeled.count(_._1 == c)) * BigInt(labeled.count(_._2 == c))
    }.sum
    val r = graft.queries.TextQueries.cohensKappa(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == agree)
    val pO = agree.toDouble / n
    val pE = sRc.toDouble / (BigInt(n) * BigInt(n)).toDouble
    assert(math.abs(r.getDouble(2) - pO) < 1e-15)
    assert(math.abs(r.getDouble(3) - pE) < 1e-12)
    val kappa = (pO - pE) / (1 - pE)
    assert(math.abs(r.getDouble(4) - kappa) < 1e-9,
      s"kappa ${r.getDouble(4)} != replay $kappa")
    assert(r.getDouble(4) <= 1.0 && r.getDouble(4) >= -1.0)
  }

  test("heapsLaw: checkpoint-grid regression replay") {
    val byDoc = docTokens.map { case (id, _, ws) =>
      (id, ws.count(_.nonEmpty).toLong)
    }.filter(_._2 > 0).sortBy(_._1)
    val firstDoc = docTokens
      .flatMap { case (id, _, ws) => ws.filter(_.nonEmpty).map(w => (w, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).values.toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var cumTok = 0L; var cumTyp = 0L
    val curve = byDoc.map { case (id, nt) =>
      cumTok += nt; cumTyp += firstDoc.getOrElse(id, 0L); (cumTok, cumTyp)
    }
    val nDocs = byDoc.length.toLong
    val step = (nDocs + 23) / 24
    val sel = curve.zipWithIndex.collect {
      case ((ct, cy), i) if (i + 1) % step == 0 => (ct, cy)
    }
    val pts = sel.map { case (ct, cy) =>
      (math.round(math.log(ct.toDouble) * 1e6),
        math.round(math.log(cy.toDouble) * 1e6))
    }
    val nP = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (nP.toDouble * sxy - sx.toDouble * sy) /
      (nP.toDouble * sxx - sx.toDouble * sx)
    val k = math.round(math.exp((sy.toDouble - beta * sx.toDouble)
      / (nP.toDouble * 1e6)) * 1e6).toDouble / 1e6
    val r = graft.queries.TextQueries.heapsLaw(spark, sf).collect().head
    assert(r.getLong(0) == nP && r.getLong(1) == sel.last._1
      && r.getLong(2) == sel.last._2,
      s"grid ${r.toSeq} != replay ($nP, ${sel.last})")
    assert(math.abs(r.getDouble(3) - beta) < 1e-9, s"beta ${r.getDouble(3)} != $beta")
    assert(math.abs(r.getDouble(4) - k) < 1e-6 * math.max(1.0, k))
    // Heaps exponent is sublinear; the sf0.001 fixture's tiny fixed
    // vocabulary saturates before the first checkpoint, so 0 (flat
    // curve) is legitimate there
    assert(beta >= 0.0 && beta < 1.0, s"beta $beta outside [0,1)")
  }

  test("atkinsonMld: micronat geomean replay; 0 <= A1 < 1, A1 vs MLD identity") {
    val xs = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).values.toSeq
    val n = xs.length.toLong
    val st = xs.map(BigInt(_)).sum
    val sl = xs.map(x => math.round(math.log(x.toDouble) * 1e6)).sum
    val mld = math.log(st.toDouble / n) - sl.toDouble / (n * 1e6)
    val a1 = math.round((1.0 - math.exp(sl.toDouble / (n * 1e6)
      - math.log(st.toDouble / n))) * 1e9).toDouble / 1e9
    val r = graft.queries.Relational.atkinsonMld(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == st.toLong
      && r.getLong(2) == sl,
      s"(n, st, sl) ${r.toSeq} != replay ($n, $st, $sl)")
    assert(math.abs(r.getDouble(3) - mld) < 1e-12)
    assert(math.abs(r.getDouble(4) - a1) < 1e-12)
    // AM-GM: mean >= geomean on a non-degenerate spend vector
    assert(mld > 0.0 && a1 > 0.0 && a1 < 1.0)
    // a1 sits on the NANO grid (exp cross-engine guard) — the identity
    // holds to half a grid step
    assert(math.abs((1.0 - a1) - math.exp(-mld)) < 1e-9)
  }

  test("avgNeighborDegree: per-class k_nn replay from the edge list") {
    val edges = GraphQueries.tradeEdges(spark, sf)
      .collect().map(r => (decodeNode(r.getLong(0)), decodeNode(r.getLong(1))))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nbrSum = edges.groupBy(_._1).view
      .mapValues(_.map(e => BigInt(deg(e._2))).sum).toMap
    // .toSeq before the map: deg.keys is a SET, and mapping a set
    // through nbrSum would deduplicate EQUAL neighbor-degree sums
    val byK = deg.keys.toSeq.groupBy(deg).view.mapValues { vs =>
      (vs.size.toLong, vs.map(nbrSum).sum)
    }.toMap
    val out = GraphQueries.avgNeighborDegree(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet == byK.keySet)
    for (r <- out) {
      val k = r.getLong(0)
      val (nk, sNbr) = byK(k)
      assert(r.getLong(1) == nk, s"k=$k n_nodes")
      assert(math.abs(r.getDouble(2) - sNbr.toDouble) < 1e-6, s"k=$k sum")
      val knn = sNbr.toDouble / (k * nk).toDouble
      assert(math.abs(r.getDouble(3) - knn) < 1e-9 * math.max(1.0, knn),
        s"k=$k knn ${r.getDouble(3)} != $knn")
      // a neighbor's degree is at least 1 and at most the max degree
      assert(knn >= 1.0 && knn <= deg.values.max.toDouble)
    }
  }

  test("hurstRs: per-block R/S replay from the day series") {
    val ys = daySeries.map(_._2) // daily revenue cents in date order
    val perN = Seq(16, 32, 64, 128).map { n =>
      val lnrs = ys.grouped(n).filter(_.length == n).toSeq.flatMap { blk =>
        val s = blk.map(BigInt(_)).sum
        val ssn = blk.map(y => BigInt(y) * (BigInt(n) * y)).sum
        val vb = (ssn - s * s).toDouble
        if (vb > 0) {
          var cum = BigInt(0)
          val devs = blk.map { y => cum += y; BigInt(n) * cum }
            .zipWithIndex.map { case (c, i) => c - BigInt(i + 1) * s }
          val r = (devs.max - devs.min).toDouble
          Some(math.round(math.log(r / math.sqrt(vb)) * 1e6))
        } else None
      }
      n.toLong -> ((lnrs.length.toLong, lnrs.sum))
    }.toMap
    val r = TimeSeries.hurstRs(spark, sf).collect().head
    val bs = Seq(16L, 32L, 64L, 128L).map(n => perN(n)._1)
    assert(Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == bs,
      s"block counts ${r.toSeq} != $bs")
    def m(n: Long): Double = perN(n)._2.toDouble / perN(n)._1 / 1e6
    assert(math.abs(r.getDouble(4) - m(16L)) < 1e-12)
    assert(math.abs(r.getDouble(5) - m(128L)) < 1e-12)
    val h = (1.5 * (m(128L) - m(16L)) + 0.5 * (m(64L) - m(32L))) /
      (5.0 * 0.6931471805599453)
    assert(math.abs(r.getDouble(6) - h) < 1e-12, s"H ${r.getDouble(6)} != $h")
    assert(h > 0.0 && h < 1.0, s"H $h outside (0,1)")
  }

  test("aalenJohansen: exact-formula CIF replay + 1-S decomposition identity") {
    val life = Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("f"),
        max(to_date(col("o_orderdate"))).as("l"), count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate,
        r.getLong(3)))
    val maxD = life.map(_._2).max
    import java.time.temporal.ChronoUnit.DAYS
    val subjects = life.map { case (f, l, n) =>
      val dur = DAYS.between(f, l)
      val churned = DAYS.between(l, maxD) > 90
      (dur, if (!churned) 0 else if (n >= 10) 1 else 2)
    }
    val grid = subjects.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, ss) =>
      (d, ss.length.toLong, ss.count(_._2 == 1).toLong, ss.count(_._2 == 2).toLong)
    }
    var atRisk = subjects.length.toLong
    var surv = 1.0; var cif1 = 0.0; var cif2 = 0.0
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Double, Double)]
    for ((d, nAt, d1, d2) <- grid) {
      if (d1 + d2 > 0) {
        cif1 += surv * d1 / atRisk
        cif2 += surv * d2 / atRisk
        surv *= (atRisk - d1 - d2).toDouble / atRisk
        expected(d) = (atRisk, cif1, cif2)
      }
      atRisk -= nAt
    }
    val got = Survival.aalenJohansen(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(6), r.getDouble(7)))).toMap
    assert(got.keySet == expected.keySet)
    for ((d, (nr, c1, c2)) <- expected) {
      val (gnr, g1, g2) = got(d)
      assert(gnr == nr, s"t=$d n_risk $gnr != replay $nr")
      // nano grid + per-step integer truncation bound the drift at
      // ~1e-9 per event row
      assert(math.abs(g1 - c1) < 1e-5, s"t=$d cif1 $g1 != replay $c1")
      assert(math.abs(g2 - c2) < 1e-5, s"t=$d cif2 $g2 != replay $c2")
      assert(g1 >= 0.0 && g2 >= 0.0 && g1 + g2 <= 1.0 + 1e-9)
    }
    // decomposition identity at the horizon: CIF1 + CIF2 = 1 - S
    val lastD = expected.keys.max
    val (_, l1, l2) = got(lastD)
    assert(math.abs((l1 + l2) - (1.0 - surv)) < 1e-5,
      s"CIF sum ${l1 + l2} != 1 - S ${1.0 - surv}")
  }

  test("pettitt: brute-force U_t replay with true midranks") {
    val ys = daySeries.map(_._2)
    val n = ys.length
    val sorted = ys.sorted
    val midrank = sorted.zipWithIndex.groupBy(_._1).map { case (v, ps) =>
      v -> ps.map(_._2 + 1).map(_.toDouble).sum / ps.length
    }
    val ranks = ys.map(midrank)
    var s = 0.0; var best = 0.0; var bestT = -1
    for (t <- 0 until n) {
      s += ranks(t)
      val u = 2 * s - (t + 1).toDouble * (n + 1)
      if (math.abs(u) > best) { best = math.abs(u); bestT = t }
    }
    val row = TimeSeries.pettitt(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(2) == math.round(best),
      s"u_abs_max ${row.getLong(2)} != replay $best")
    // the argmax day is the bestT-th day in date order (ties earliest)
    val days = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"))
      .distinct().orderBy(col("d")).collect().map(_.getDate(0))
    assert(row.getDate(1) == days(bestT),
      s"change_day ${row.getDate(1)} != replay ${days(bestT)}")
    val p = math.min(1.0,
      2.0 * math.exp(-6.0 * best * best / (math.pow(n, 3) + n.toDouble * n)))
    assert(math.abs(row.getDouble(3) - p) < 1e-6,
      s"p_approx ${row.getDouble(3)} != replay $p")
  }

  test("dickeyFuller: OLS replay of the delta-on-lag regression") {
    val ys = daySeries.map(_._2.toDouble)
    val x = ys.dropRight(1); val dy = ys.indices.drop(1)
      .map(i => ys(i) - ys(i - 1))
    val m = x.length
    val mx = x.sum / m; val my = dy.sum / m
    val cxy = x.indices.map(i => (x(i) - mx) * (dy(i) - my)).sum
    val cxx = x.map(v => (v - mx) * (v - mx)).sum
    val cyy = dy.map(v => (v - my) * (v - my)).sum
    val rho = cxy / cxx
    val ssr = cyy - rho * cxy
    val t = rho / math.sqrt(ssr / (m - 2) / cxx)
    val row = TimeSeries.dickeyFuller(spark, sf).collect().head
    assert(row.getLong(0) == m, s"n_obs ${row.getLong(0)} != replay $m")
    assert(math.abs(row.getDouble(1) - rho) < 1e-9 * math.max(1.0, rho.abs),
      s"rho_hat ${row.getDouble(1)} != replay $rho")
    assert(math.abs(row.getDouble(2) - t) < 1e-7 * math.max(1.0, t.abs),
      s"t_df ${row.getDouble(2)} != replay $t")
    // a stationary-around-trend revenue series must reject the unit
    // root hard: rho in (-2, 0) and t strongly negative
    assert(row.getDouble(1) < 0.0 && row.getDouble(1) > -2.0)
    assert(row.getDouble(2) < 0.0)
  }

  test("friedman: true-midrank replay over complete customer blocks") {
    val rows = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        year(to_date(col("o_orderdate"))).as("yr"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .filter(col("yr").isin(1996, 1997, 1998))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val blocks = rows.groupBy(_._1).values
      .map { vs =>
        val byYr = vs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
        byYr
      }
      .filter(_.keySet == Set(1996, 1997, 1998)).toSeq
    val n = blocks.length
    // true midranks per block via sort
    var rsum = Map(1996 -> 0.0, 1997 -> 0.0, 1998 -> 0.0)
    var tieSum = 0L
    for (b <- blocks) {
      val vals = Seq(1996, 1997, 1998).map(b)
      for (y <- Seq(1996, 1997, 1998)) {
        val less = vals.count(_ < b(y)); val eqs = vals.count(_ == b(y))
        rsum = rsum.updated(y, rsum(y) + (less + (eqs + 1) / 2.0))
      }
      val grp = vals.groupBy(identity).values.map(_.size)
      tieSum += grp.map(t => t.toLong * t * t - t).sum
    }
    val sumR2 = Seq(1996, 1997, 1998).map(y => rsum(y) * rsum(y)).sum
    val chi2 = 12.0 / (n * 3 * 4) * sumR2 - 3.0 * n * 4
    val cF = 1.0 - tieSum.toDouble / (n * 3 * 8)
    val row = Drift.friedman(spark, sf).collect().head
    assert(row.getLong(0) == n, s"n_blocks ${row.getLong(0)} != replay $n")
    for ((y, ix) <- Seq(1996, 1997, 1998).zipWithIndex)
      assert(row.getLong(1 + ix) == math.round(2 * rsum(y)),
        s"R2_$y ${row.getLong(1 + ix)} != replay ${2 * rsum(y)}")
    assert(math.abs(row.getDouble(4) - chi2) < 1e-8 * math.max(1.0, chi2),
      s"chi2_f ${row.getDouble(4)} != replay $chi2")
    if (cF > 0)
      assert(math.abs(row.getDouble(5) - chi2 / cF)
        < 1e-8 * math.max(1.0, (chi2 / cF).abs),
        s"chi2_f_tie_adj ${row.getDouble(5)} != replay ${chi2 / cF}")
    assert(row.getDouble(4) >= -1e-9 && row.getDouble(4) <= 2.0 * n + 1e-9,
      "chi2_f outside [0, n(k-1)]")
  }

  test("moodMedian: textbook 2xk chi2 replay from the raw split") {
    val rows = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority").as("m"),
        expr("cast(cast(o_totalprice as decimal(18,6)) * 100 as bigint)")
          .as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val xs = rows.map(_._2).sorted
    val n = xs.length
    val med =
      if (n % 2 == 1) xs(n / 2).toDouble
      else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    val byG = rows.groupBy(_._1).map { case (m, vs) =>
      m -> ((vs.length.toLong, vs.count(_._2.toDouble > med).toLong))
    }
    val ma = byG.values.map(_._2).sum
    var chi2 = 0.0
    for ((_, (ng, ag)) <- byG) {
      val ea = ng.toDouble * ma / n; val el = ng.toDouble * (n - ma) / n
      chi2 += (ag - ea) * (ag - ea) / ea +
        ((ng - ag) - el) * ((ng - ag) - el) / el
    }
    val row = Relational.moodMedian(spark, sf).collect().head
    assert(row.getLong(0) == byG.size && row.getLong(1) == n
      && row.getLong(2) == ma,
      s"(k,n,ma) mismatch ${row.toSeq} vs (${byG.size}, $n, $ma)")
    assert(math.abs(row.getDouble(3) - chi2) < 1e-9 * math.max(1.0, chi2),
      s"chi2_mood ${row.getDouble(3)} != replay $chi2")
    assert(row.getDouble(3) >= 0.0)
  }

  test("bartlett: textbook chi2 replay from raw per-group variances") {
    val rows = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority").as("m"),
        expr("cast(cast(o_totalprice as decimal(18,6)) * 100 as bigint) div 100")
          .as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    val byG = rows.groupBy(_._1).map { case (m, vs) => m -> vs.map(_._2) }
    val n = rows.length; val k = byG.size
    val vars = byG.map { case (_, vs) =>
      val mean = vs.sum / vs.length
      (vs.length, vs.map(v => (v - mean) * (v - mean)).sum / (vs.length - 1))
    }
    val sp2 = vars.map { case (ng, s2) => (ng - 1) * s2 }.sum / (n - k)
    val tNum = (n - k) * math.log(sp2) -
      vars.map { case (ng, s2) => (ng - 1) * math.log(s2) }.sum
    val cF = 1.0 + (vars.map(v => 1.0 / (v._1 - 1)).sum - 1.0 / (n - k)) /
      (3.0 * (k - 1))
    val want = tNum / cF
    val row = Relational.bartlett(spark, sf).collect().head
    assert(row.getLong(0) == k && row.getLong(1) == n)
    assert(math.abs(row.getDouble(2) - sp2) < 1e-6 * sp2,
      s"msw ${row.getDouble(2)} != replay $sp2")
    assert(math.abs(row.getDouble(3) - cF) < 1e-9)
    // micronat rounding of the k+1 logs bounds drift at ~(n/1e6) in the
    // weighted numerator; compare at that scale
    assert(math.abs(row.getDouble(4) - want) < 1e-4 * math.max(1.0, n / 100.0),
      s"bartlett_chi2 ${row.getDouble(4)} != replay $want")
  }

  test("sampleEntropy: brute-force template-match replay") {
    val xs = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("d"))
      .collect().map(_.getLong(1))
    val n = xs.length
    val mean = xs.map(_.toDouble).sum / n
    val variance = xs.map(v => (v - mean) * (v - mean)).sum / n
    val r = math.round(0.2 * math.sqrt(variance))
    var bCnt = 0L; var aCnt = 0L
    for (i <- 0 until n; j <- (i + 1) until n) {
      if (i + 1 < n && j + 1 < n &&
          math.abs(xs(i) - xs(j)) <= r && math.abs(xs(i + 1) - xs(j + 1)) <= r) {
        bCnt += 1
        if (i + 2 < n && j + 2 < n && math.abs(xs(i + 2) - xs(j + 2)) <= r)
          aCnt += 1
      }
    }
    val row = TimeSeries.sampleEntropy(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == r,
      s"(n, r) (${row.getLong(0)}, ${row.getLong(1)}) != replay ($n, $r)")
    assert(row.getLong(2) == bCnt && row.getLong(3) == aCnt,
      s"(B, A) (${row.getLong(2)}, ${row.getLong(3)}) != replay ($bCnt, $aCnt)")
    if (aCnt > 0 && bCnt > 0) {
      val want = -math.log(aCnt.toDouble / bCnt)
      assert(math.abs(row.getDouble(4) - want) < 1e-5,
        s"sampen ${row.getDouble(4)} != replay $want")
      assert(row.getDouble(4) >= 0.0)
    } else assert(row.isNullAt(4))
  }

  test("tukeyHsd: pairwise q replay from raw per-group moments") {
    val rows = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority").as("m"),
        expr("cast(cast(o_totalprice as decimal(18,6)) * 100 as bigint) div 100")
          .as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byG = rows.groupBy(_._1).map { case (m, vs) =>
      m -> vs.map(_._2.toDouble)
    }
    val n = rows.length; val k = byG.size
    val ssWithin = byG.values.map { vs =>
      val mean = vs.sum / vs.length
      vs.map(v => (v - mean) * (v - mean)).sum
    }.sum
    val msw = ssWithin / (n - k)
    val got = Relational.tukeyHsd(spark, sf).collect()
    assert(got.length == k * (k - 1) / 2)
    for (r <- got) {
      val va = byG(r.getString(0)); val vb = byG(r.getString(1))
      val ma = va.sum / va.length; val mb = vb.sum / vb.length
      assert(r.getLong(2) == va.length && r.getLong(3) == vb.length)
      assert(math.abs(r.getDouble(4) - ma) < 1e-6 * math.max(1.0, ma.abs))
      assert(math.abs(r.getDouble(5) - mb) < 1e-6 * math.max(1.0, mb.abs))
      val q = math.abs(ma - mb) /
        math.sqrt(msw / 2.0 * (1.0 / va.length + 1.0 / vb.length))
      assert(math.abs(r.getDouble(7) - q) < 1e-6 * math.max(1.0, q),
        s"q ${r.getDouble(7)} != replay $q for ${r.getString(0)}/${r.getString(1)}")
      assert(r.getDouble(7) >= 0.0)
    }
  }

  test("permutationEntropy: stable-sort ordinal-pattern replay") {
    val xs = Tables.load(spark, sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("d"))
      .collect().map(_.getLong(1))
    // pattern word from an actual stable sort of (value, position)
    val counts = scala.collection.mutable.Map.empty[Int, Long]
      .withDefaultValue(0L)
    for (t <- 0 until xs.length - 2) {
      val tri = Array(xs(t), xs(t + 1), xs(t + 2))
      val order = tri.zipWithIndex.sortBy { case (v, i) => (v, i) }.map(_._2)
      val rank = new Array[Int](3)
      for (r <- 0 until 3) rank(order(r)) = r
      val pid = rank(0) * 100 + rank(1) * 10 + rank(2)
      counts(pid) += 1
    }
    val n = counts.values.sum
    val pe = math.log(n.toDouble) -
      counts.values.map(c => c * math.log(c.toDouble)).sum / n
    val row = TimeSeries.permutationEntropy(spark, sf).collect().head
    assert(row.getLong(0) == n, s"n_windows ${row.getLong(0)} != replay $n")
    assert(row.getLong(1) == counts.size)
    for ((pid, ix) <- Seq(12, 21, 102, 120, 201, 210).zipWithIndex)
      assert(row.getLong(2 + ix) == counts(pid),
        s"pattern $pid: ${row.getLong(2 + ix)} != replay ${counts(pid)}")
    assert(math.abs(row.getDouble(8) - pe) < 1e-4,
      s"pe ${row.getDouble(8)} != replay $pe")
    assert(math.abs(row.getDouble(9) - pe / math.log(6.0)) < 1e-4)
    assert(row.getDouble(9) >= 0.0 && row.getDouble(9) <= 1.0 + 1e-9)
  }

  test("rmst: plain-double KM step-integral replay at all three horizons") {
    val life = Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("f"),
        max(to_date(col("o_orderdate"))).as("l"))
      .collect().map(r => (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    val maxD = life.map(_._2).max
    import java.time.temporal.ChronoUnit.DAYS
    val subjects = life.map { case (f, l) =>
      (DAYS.between(f, l), DAYS.between(l, maxD) > 90)
    }
    val grid = subjects.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, ss) =>
      (d, ss.length.toLong, ss.count(_._2).toLong)
    }
    def rmstAt(tau: Long): Double = {
      var atRisk = subjects.length.toLong
      var surv = 1.0; var prev = 0L; var area = 0.0
      var tail = 1.0; var lastDur = 0L
      for ((d, nAt, dI) <- grid) {
        if (dI > 0) {
          area += surv * (math.min(d, tau) - math.min(prev, tau))
          surv *= (atRisk - dI).toDouble / atRisk
          prev = d; tail = surv; lastDur = d
        }
        atRisk -= nAt
      }
      area + tail * math.max(0L, tau - math.min(lastDur, tau))
    }
    val got = Survival.rmst(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(365L, 730L, 1825L))
    for (tau <- Seq(365L, 730L, 1825L)) {
      val want = rmstAt(tau)
      val (nano, days, share) = got(tau)
      // micronat + nano rounding drift is <= ~1e-6 relative per event
      // row; the integral damps it further
      assert(math.abs(days - want) < 1e-4 * tau,
        s"rmst($tau) $days != replay $want")
      assert(math.abs(days - nano / 1e9) < 1e-12)
      assert(math.abs(share - days / tau) < 1e-9)
      assert(days > 0.0 && days <= tau.toDouble,
        s"rmst($tau)=$days outside (0, tau]")
    }
    // monotone in tau, with increments at most the added horizon span
    val d1 = got(365L)._2; val d2 = got(730L)._2; val d5 = got(1825L)._2
    assert(d1 <= d2 && d2 <= d5 && d2 - d1 <= 365.0 && d5 - d2 <= 1095.0)
  }

  test("cochranArmitage: trend z replay from raw orders") {
    val rows = Tables.load(spark, sf, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("s"),
        (col("o_orderstatus") === "F").cast("long").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length.toDouble
    val r = rows.map(_._2).sum.toDouble
    val pbar = r / n
    val groups = rows.groupBy(_._1).view
      .mapValues(g => (g.length.toDouble, g.map(_._2).sum.toDouble)).toMap
    val t = groups.map { case (s, (ni, ri)) => s * (ri - ni * pbar) }.sum
    val sbar = groups.map { case (s, (ni, _)) => s * ni }.sum / n
    val varT = pbar * (1 - pbar) *
      groups.map { case (s, (ni, _)) => ni * (s - sbar) * (s - sbar) }.sum
    val z = t / math.sqrt(varT)
    val row = Relational.cochranArmitage(spark, sf).collect().head
    assert(row.getLong(0) == rows.length && row.getLong(1) == r.toLong)
    assert(math.abs(row.getDouble(2) - z) < 1e-9,
      s"trend_z ${row.getDouble(2)} != replay $z")
  }

  test("wilcoxonSignedRank: midrank W+ and z replay from raw orders") {
    val diffs = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), year(to_date(col("o_orderdate"))).as("yr"),
        expr("cast(cast(o_totalprice as decimal(18,6)) * 100 as bigint)")
          .as("c"))
      .filter(col("yr") === 1997 || col("yr") === 1998)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).values
      .map(vs => vs.map(v => if (v._2 == 1998) v._3 else -v._3).sum)
      .filter(_ != 0L).toSeq
    val n = diffs.length
    // midranks of |diff| with ties averaged
    val sorted = diffs.map(math.abs).sorted.zipWithIndex
      .map { case (v, i) => (v, i + 1) }
    val midrank = sorted.groupBy(_._1).view
      .mapValues(g => g.map(_._2.toDouble).sum / g.length).toMap
    val wPlus = diffs.filter(_ > 0L).map(d => midrank(math.abs(d))).sum
    val ties = diffs.map(math.abs).groupBy(identity).values.map(_.length.toLong)
    val variance = (n.toDouble * (n + 1) * (2 * n + 1)
      - ties.map(t => (t * t * t - t).toDouble).sum / 2.0) / 24.0
    val z = (wPlus - n.toDouble * (n + 1) / 4.0) / math.sqrt(variance)
    val row = Drift.wilcoxonSignedRank(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == diffs.count(_ > 0L))
    assert(math.abs(row.getLong(2) - 2.0 * wPlus) < 1e-6,
      s"w2_plus ${row.getLong(2)} != 2*W+ ${2 * wPlus}")
    assert(math.abs(row.getDouble(3) - z) < 1e-9,
      s"z ${row.getDouble(3)} != replay $z")
  }

  test("markovStationary: fixed point is invariant under the true chain") {
    val grid = EventQueries.markovTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rsum = grid.groupBy(_._1).view.mapValues(_.map(_._3).sum.toDouble).toMap
    val got = EventQueries.markovStationary(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val total = got.values.sum
    // truncating integer recursion loses at most |states| micro per step
    assert(math.abs(total - 1.0) < 1e-3, s"mass $total drifted from 1")
    // invariance: v P ~ v under the exact float transition matrix
    val next = scala.collection.mutable.Map.empty[String, Double]
    for ((f, t, n) <- grid; vf <- got.get(f))
      next(t) = next.getOrElse(t, 0.0) + vf * (n / rsum(f))
    for ((st, v) <- got)
      assert(math.abs(next.getOrElse(st, 0.0) - v) < 1e-3,
        s"$st: vP=${next.get(st)} != v=$v — not stationary")
  }

  test("markovAttribution: removal monotonicity, share mass, brute-force base") {
    val rows = EventQueries.markovAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    val p0 = rows.head.getDouble(1)
    assert(p0 > 0.0 && p0 <= 1.0, s"p_base $p0 outside (0,1]")
    var shareSum = 0.0
    for (r <- rows) {
      assert(r.getDouble(1) == p0, "p_base must be constant across channels")
      val pc = r.getDouble(2)
      // clamping a state's absorption value to 0 can only reduce P(conv)
      assert(pc >= 0.0 && pc <= p0 + 1e-9,
        s"${r.getString(0)}: p_removed $pc above base $p0")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
      shareSum += r.getDouble(4)
    }
    assert(math.abs(shareSum - 1.0) < 1e-9,
      s"attribution shares sum to $shareSum, not 1")
    // brute-force base conversion probability: a long float value
    // iteration over the same truncated-journey chain must agree with
    // the integer micro recursion to micro resolution
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2)),
        r.getString(3)))
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    for ((_, g) <- evs.groupBy(_._1)) {
      val ordered = g.sortBy(_._2).map(_._3)
      val cut = ordered.indexOf("purchase") match {
        case -1 => ordered
        case i  => ordered.take(i + 1)
      }
      val path = "START" +: cut
      for (i <- 0 until path.length - 1)
        trans((path(i), path(i + 1))) += 1
      if (!cut.contains("purchase")) trans((cut.last, "END")) += 1
    }
    val rsum = trans.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum.toDouble).toMap
    var a = Map("purchase" -> 1.0).withDefaultValue(0.0)
    for (_ <- 1 to 200) {
      val na = rsum.keys.map { st =>
        st -> trans.toSeq.filter(_._1._1 == st)
          .map { case ((_, to), n) =>
            (n / rsum(st)) * (if (to == "purchase") 1.0 else a(to))
          }.sum
      }.toMap
      a = na.withDefaultValue(0.0) ++ Map("purchase" -> 1.0)
    }
    assert(math.abs(p0 - a("START")) < 1e-3,
      s"p_base $p0 != float value-iteration replay ${a("START")}")
  }

  test("growthAccounting + attributionPosition: decomposition identities") {
    val ga = EventQueries.growthAccounting(spark, sf).collect()
    assert(ga.nonEmpty)
    for (r <- ga) {
      // every weekly active is exactly one of new/retained/resurrected
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"week ${r.getLong(0)}: actives != new + retained + resurrected")
      if (!r.isNullAt(5)) assert(r.getLong(5) >= 0L, "negative churn")
    }
    assert(ga.head.isNullAt(5), "first week must have NULL churn")
    assert(ga.head.getLong(1) == ga.head.getLong(2),
      "first week actives must all be new")
    val ap = EventQueries.attributionPosition(spark, sf).collect()
    val shareSum = ap.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"credit shares sum $shareSum")
    // journeys carry at most 1e6 micro each (mid-split remainder only
    // ever drops credit) — totals can't exceed converting journeys * 1e6
    val nConv = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    val credTot = ap.map(_.getLong(2)).sum
    assert(credTot <= nConv * 1000000L,
      s"total credit $credTot exceeds $nConv journeys worth")
  }

  test("poissonRateTest: conditional-binomial z replay from raw events") {
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val d0 = evs.map(_._2).min; val d1 = evs.map(_._2).max
    import java.time.temporal.ChronoUnit.DAYS
    val span = DAYS.between(d0, d1) + 1
    val half = span / 2
    val byType = evs.groupBy(_._1).view.mapValues { vs =>
      val n1 = vs.count(v => DAYS.between(d0, v._2) < half).toLong
      (n1, vs.length - n1)
    }.toMap
    val got = EventQueries.poissonRateTest(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(7)))).toMap
    assert(got.keySet == byType.keySet)
    for ((t, (n1, n2)) <- byType) {
      val (g1, g2, t1, t2, z) = got(t)
      assert((g1, g2) == ((n1, n2)), s"$t counts ($g1,$g2) != ($n1,$n2)")
      assert(t1 == half && t2 == span - half)
      val p0 = half.toDouble / span
      val n = (n1 + n2).toDouble
      val zz = (n1 - n * p0) / math.sqrt(n * p0 * (1 - p0))
      assert(math.abs(z - zz) < 1e-12, s"$t z $z != replay $zz")
    }
  }

  test("mcnemarYears: paired 2x2 cells and chi2 replay from raw orders") {
    val per = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), year(to_date(col("o_orderdate"))).as("yr"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = per.size.toLong
    val both = per.values.count(s => s(1997) && s(1998)).toLong
    val b = per.values.count(s => s(1997) && !s(1998)).toLong
    val c = per.values.count(s => !s(1997) && s(1998)).toLong
    val row = Relational.mcnemarYears(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((n, both, b, c, n - both - b - c)),
      s"cells ${row.toSeq} != replay ($n,$both,$b,$c)")
    if (b + c > 0) {
      val chi2 = (b - c).toDouble * (b - c) / (b + c)
      assert(math.abs(row.getDouble(5) - chi2) < 1e-12)
      val cc = (math.abs((b - c).toDouble) - 1.0) *
        (math.abs((b - c).toDouble) - 1.0) / (b + c)
      assert(math.abs(row.getDouble(6) - cc) < 1e-12)
    }
  }

  test("levenePriority: mean-centered Levene W replay from raw orders") {
    val rows = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"),
        expr("cast(cast(o_totalprice as decimal(18,6)) * 100 as bigint) div 100")
          .as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    val zs = groups.toSeq.flatMap { case (_, xs) =>
      val m = xs.sum / xs.length
      xs.map(v => math.abs(v - m))
    }
    val zg = groups.toSeq.map { case (_, xs) =>
      val m = xs.sum / xs.length
      xs.map(v => math.abs(v - m))
    }
    val n = zs.length; val k = zg.length
    val zbar = zs.sum / n
    val ssb = zg.map(g => g.length * math.pow(g.sum / g.length - zbar, 2)).sum
    val ssw = zg.map(g => { val m = g.sum / g.length
      g.map(z => (z - m) * (z - m)).sum }).sum
    val w = (ssb / (k - 1)) / (ssw / (n - k))
    val row = Relational.levenePriority(spark, sf).collect().head
    assert(row.getLong(0) == k && row.getLong(1) == n)
    assert(math.abs(row.getDouble(2) - ssb) / ssb < 1e-9,
      s"ss_between ${row.getDouble(2)} != replay $ssb")
    assert(math.abs(row.getDouble(3) - ssw) / ssw < 1e-9,
      s"ss_within ${row.getDouble(3)} != replay $ssw")
    assert(math.abs(row.getDouble(4) - w) / w < 1e-9,
      s"w_stat ${row.getDouble(4)} != replay $w")
    assert(w > 0.0)
  }

  test("crossCorrelation: lead/lag CCF replay from the raw day series") {
    val xy = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d")).agg(count(lit(1)).as("x"), sum(col("c")).as("cs"))
      .orderBy(col("d"))
      .collect().map(r => (r.getLong(1).toDouble, (r.getLong(2) / 100).toDouble))
    val n = xy.length
    val xb = xy.map(_._1).sum / n
    val yb = xy.map(_._2).sum / n
    val denx = xy.map(p => (p._1 - xb) * (p._1 - xb)).sum
    val deny = xy.map(p => (p._2 - yb) * (p._2 - yb)).sum
    def ccf(k: Int): Double = {
      val num =
        if (k >= 0) (0 until n - k).map(t => (xy(t)._1 - xb) * (xy(t + k)._2 - yb)).sum
        else (0 until n + k).map(t => (xy(t - k)._1 - xb) * (xy(t)._2 - yb)).sum
      num / math.sqrt(denx * deny)
    }
    val rows = TimeSeries.crossCorrelation(spark, sf).collect()
      .map(r => r.getLong(0).toInt -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.keySet == (-3 to 3).toSet)
    for (k <- -3 to 3) {
      val (m, got) = rows(k)
      assert(m == n - math.abs(k), s"lag $k pairs $m != ${n - math.abs(k)}")
      assert(math.abs(got - ccf(k)) < 1e-9, s"ccf($k) $got != replay ${ccf(k)}")
      assert(got >= -1.0 && got <= 1.0)
    }
  }

  test("pacf: Durbin–Levinson replay from the raw day series") {
    val xs = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("cents"))
      .orderBy(col("d"))
      .collect().map(r => r.getLong(1) / 100) // rev_cents div 100 (positive)
    val n = xs.length
    val mean = xs.map(_.toDouble).sum / n
    def gamma(k: Int): Double =
      (0 until n - k).map(t => (xs(t) - mean) * (xs(t + k) - mean)).sum
    val g0 = gamma(0)
    assert(g0 > 0.0, "degenerate fixture: constant day series")
    val r = (1 to 3).map(k => gamma(k) / g0)
    val p2 = (r(1) - r(0) * r(0)) / (1 - r(0) * r(0))
    val p21 = r(0) - p2 * r(0)
    val p3 = (r(2) - p21 * r(1) - p2 * r(0)) / (1 - p21 * r(0) - p2 * r(1))
    val row = TimeSeries.pacf(spark, sf).collect().head
    assert(row.getLong(0) == n, s"n_days ${row.getLong(0)} != replay $n")
    for ((got, want, name) <- Seq(
        (row.getDouble(1), r(0), "acf1"), (row.getDouble(2), r(1), "acf2"),
        (row.getDouble(3), r(2), "acf3"), (row.getDouble(4), p2, "pacf2"),
        (row.getDouble(5), p3, "pacf3"))) {
      assert(math.abs(got - want) < 1e-9, s"$name $got != replay $want")
      assert(got >= -1.0 && got <= 1.0, s"$name $got outside [-1,1]")
    }
  }

  /** Pooled textbook midranks of the (priority, cents) order values —
    * shared by the Kruskal–Wallis and Dunn replays. */
  private lazy val kwReplayBase: (Map[String, (Long, Double)], Double, Long) = {
    val vals = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority").as("m"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sorted = vals.map(_._2).sorted
    // value -> average 1-based rank of its tie run
    val midrank = sorted.zipWithIndex.groupBy(_._1).map { case (v, ps) =>
      v -> ps.map(_._2 + 1).map(_.toDouble).sum / ps.length
    }
    val byGroup = vals.groupBy(_._1).map { case (m, vs) =>
      m -> ((vs.length.toLong, vs.map(v => midrank(v._2)).sum))
    }
    val tcorr = sorted.groupBy(identity).values
      .map(g => g.length.toDouble)
      .map(t => t * t * t - t).sum
    (byGroup, tcorr, vals.length.toLong)
  }

  test("kruskalWallis: textbook midrank replay with tie correction") {
    val (byGroup, tcorr, n) = kwReplayBase
    val nd = n.toDouble
    val h = 12.0 / (nd * (nd + 1.0)) *
      byGroup.values.map { case (ng, rsum) => rsum * rsum / ng }.sum -
      3.0 * (nd + 1.0)
    val hAdj = h / (1.0 - tcorr / (nd * nd * nd - nd))
    val row = Relational.kruskalWallis(spark, sf).collect().head
    assert(row.getLong(0) == byGroup.size && row.getLong(1) == n,
      s"(k, n) (${row.getLong(0)}, ${row.getLong(1)}) != " +
        s"replay (${byGroup.size}, $n)")
    assert(math.abs(row.getDouble(2) - h) < 1e-7 * math.max(1.0, h.abs),
      s"h_stat ${row.getDouble(2)} != replay $h")
    assert(math.abs(row.getDouble(3) - hAdj) < 1e-7 * math.max(1.0, hAdj.abs),
      s"h_tie_adj ${row.getDouble(3)} != replay $hAdj")
    assert(row.getDouble(2) >= 0.0 && row.getDouble(3) >= row.getDouble(2),
      "H must be >= 0 and the tie adjustment can only inflate it")
  }

  test("dunnPairs: pairwise z replay from the same midranks") {
    val (byGroup, tcorr, n) = kwReplayBase
    val nd = n.toDouble
    val vpool = nd * (nd + 1.0) / 12.0 - tcorr / (12.0 * (nd - 1.0))
    val rows = Relational.dunnPairs(spark, sf).collect()
    val modes = byGroup.keys.toSeq.sorted
    assert(rows.length == modes.size * (modes.size - 1) / 2,
      s"expected all ${modes.size * (modes.size - 1) / 2} pairs, " +
        s"got ${rows.length}")
    for (r <- rows) {
      val (na, ra) = byGroup(r.getString(0))
      val (nb, rb) = byGroup(r.getString(1))
      assert(r.getString(0) < r.getString(1), "pairs must be mode_a < mode_b")
      assert(r.getLong(2) == na && r.getLong(3) == nb)
      val ma = ra / na; val mb = rb / nb
      assert(math.abs(r.getDouble(4) - ma) < 1e-9, s"mean_rank_a @$r")
      assert(math.abs(r.getDouble(5) - mb) < 1e-9, s"mean_rank_b @$r")
      val z = (ma - mb) / math.sqrt(vpool * (1.0 / na + 1.0 / nb))
      assert(math.abs(r.getDouble(6) - z) < 1e-7 * math.max(1.0, z.abs),
        s"z_dunn ${r.getDouble(6)} != replay $z")
    }
  }

  test("holtWinters: plain-double triple-smoother replay") {
    // independent algorithm: the same textbook recursion in DOUBLES
    // (no micro grid, no truncating division) — the integer spelling
    // must track it within the accumulated truncation envelope
    val ys = daySeries.map(_._2.toDouble) // cents, date-ordered
    val n = ys.length
    val a1 = ys.take(7).sum / 7.0
    val a2 = ys.slice(7, 14).sum / 7.0
    val l = new Array[Double](n); val b = new Array[Double](n)
    val se = new Array[Double](n); val f = new Array[Double](n)
    for (i <- 0 until 7) { l(i) = a1; b(i) = (a2 - a1) / 7.0; se(i) = ys(i) - a1 }
    for (i <- 7 until n) {
      val sp = se(i - 7)
      f(i) = l(i - 1) + b(i - 1) + sp
      l(i) = ((ys(i) - sp) + 4.0 * (l(i - 1) + b(i - 1))) / 5.0
      b(i) = ((l(i) - l(i - 1)) + 9.0 * b(i - 1)) / 10.0
      se(i) = ((ys(i) - l(i)) + 4.0 * sp) / 5.0
    }
    val out = TimeSeries.holtWinters(spark, sf).collect()
    assert(out.length == math.min(30, n - 7))
    // each micro-grid step truncates < 1 micro-cent and the recursion
    // contracts (alpha < 1), so the drift vs doubles stays far under
    // a cent; compare in dollars at 1e-3
    for ((r, idx) <- out.zipWithIndex) {
      val i = n - out.length + idx
      assert(r.getLong(1) == daySeries(i)._2, "rev_cents misaligned")
      assert(math.abs(r.getDouble(7) - l(i) / 100.0) < 1e-3,
        s"level at ${r.getDate(0)}: ${r.getDouble(7)} vs ${l(i) / 100.0}")
      assert(math.abs(r.getDouble(8) - se(i) / 100.0) < 1e-3,
        s"seasonal at ${r.getDate(0)}")
      // identities on the integer spelling itself
      assert(r.getLong(6) == r.getLong(1) * 1000000L - r.getLong(5),
        "resid_micro != y*1e6 - fitted_micro")
    }
  }

  test("rfmMigration: exact driver-side transition replay") {
    val ev = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) as us", "user_id",
        "cast(round(value * 100) as long) as c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    def quintiles(rows: Array[(Long, Long)]): Map[Long, Long] = {
      val sorted = rows.sortBy { case (u, v) => (v, u) }
      val nh = sorted.length
      sorted.zipWithIndex.map { case ((u, _), i) =>
        u -> (1L + 5L * i / nh)
      }.toMap
    }
    val qa = quintiles(ev.filter(_._1 < mid).groupBy(_._2)
      .map { case (u, g) => (u, g.map(_._3).sum) }.toArray)
    val qb = quintiles(ev.filter(_._1 >= mid).groupBy(_._2)
      .map { case (u, g) => (u, g.map(_._3).sum) }.toArray)
    val expected = (qa.keySet ++ qb.keySet).toSeq
      .map(u => (qa.getOrElse(u, 0L), qb.getOrElse(u, 0L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = EventQueries.rfmMigration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"migration cells differ: got ${got.size} cells")
    assert(got.values.sum == (qa.keySet ++ qb.keySet).size.toLong)
  }

  test("cvm: plain-double ECDF-integral replay") {
    // independent algorithm: collect the sided values, build both
    // ECDFs in doubles, sum squared gaps over every pooled observation
    val ev = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) as us", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    val a = ev.filter(_._1 < mid).map(_._2).sorted
    val b = ev.filter(_._1 >= mid).map(_._2).sorted
    val n = a.length.toLong; val m = b.length.toLong
    def ecdf(xs: Array[Double], v: Double): Double = {
      var lo = 0; var hi = xs.length // count <= v
      while (lo < hi) {
        val md = (lo + hi) >>> 1
        if (xs(md) <= v) lo = md + 1 else hi = md
      }
      lo.toDouble / xs.length
    }
    val t = (a ++ b).map { v =>
      val g = ecdf(a, v) - ecdf(b, v); g * g
    }.sum * n * m / ((n + m).toDouble * (n + m))
    val row = Drift.cvm(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == m)
    // the query's numerator is exact (decimal products); the only gap
    // vs this double replay is summation rounding
    assert(math.abs(row.getDouble(2) - t) < 1e-9 * math.max(1.0, t),
      s"cvm_t ${row.getDouble(2)} != replay $t")
    assert(math.abs(row.getDouble(3) - (1.0 / 6 + 1.0 / (6 * (n + m)))) < 1e-12)
    assert(row.getDouble(2) >= 0.0)
  }

  test("pageTrend: textbook average-rank L replay") {
    // independent algorithm: collect complete blocks, average ranks in
    // doubles (not the doubled-comparison identity), direct L sum
    val piv = Tables.load(spark, sf, "orders")
      .selectExpr("o_custkey",
        "cast(year(cast(o_orderdate as date)) as int) as yr",
        "cast(cast(o_totalprice as decimal(18,6)) * 100 as bigint) as c")
      .filter(col("yr").isin(1996, 1997, 1998))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("yr") === 1996, col("c")).otherwise(0L)).as("x96"),
        sum(when(col("yr") === 1997, col("c")).otherwise(0L)).as("x97"),
        sum(when(col("yr") === 1998, col("c")).otherwise(0L)).as("x98"),
        countDistinct(col("yr")).as("ny"))
      .filter(col("ny") === 3L)
      .collect().map(r => Array(r.getLong(1), r.getLong(2), r.getLong(3)))
    def avgRanks(xs: Array[Long]): Array[Double] =
      xs.map(x => 1.0 + xs.count(_ < x)
        + (xs.count(_ == x) - 1) / 2.0)
    var l = 0.0; var tied = 0L
    for (block <- piv) {
      val r = avgRanks(block)
      l += 1 * r(0) + 2 * r(1) + 3 * r(2)
      if (block.distinct.length < 3) tied += 1
    }
    val n = piv.length
    val z = (l - 12.0 * n) / math.sqrt(2.0 * n)
    val row = graft.queries.Drift.pageTrend(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == tied)
    assert(math.abs(row.getDouble(2) - l) < 1e-9,
      s"page_l ${row.getDouble(2)} != replay $l")
    assert(math.abs(row.getDouble(3) - z) < 1e-9, "z")
    // cross-validation: Page's z and Friedman's chi2 read the same
    // blocks — a monotone trend strong in one must register in both
    // directions consistently (|z|^2 <= chi2_f is NOT an identity, so
    // only pin the shared block count)
    val f = Drift.friedman(spark, sf).collect().head
    assert(f.getLong(0) == n.toLong, "friedman/page block sets differ")
  }

  test("wilsonCi: textbook interval replay per event type") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = ev.map(_._2).distinct.length.toLong
    val z = 1.959963985
    val rows = graft.queries.EventQueries.wilsonCi(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val k = ev.count(_._1 == r.getString(0)).toLong
      assert(r.getLong(1) == k && r.getLong(2) == n)
      val p = k.toDouble / n
      val center = (p + z * z / n / 2.0) / (1.0 + z * z / n)
      val half = z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n)) /
        (1.0 + z * z / n)
      assert(math.abs(r.getDouble(3) - p) < 1e-12)
      assert(math.abs(r.getDouble(4) - (center - half)) < 1e-9, "wilson_lo")
      assert(math.abs(r.getDouble(5) - (center + half)) < 1e-9, "wilson_hi")
      // interval properties the Wald interval lacks
      assert(r.getDouble(4) > 0.0 - 1e-12 && r.getDouble(5) < 1.0 + 1e-12)
      assert(r.getDouble(4) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(5))
    }
  }

  test("hodgesLehmann: brute-force Walsh-average replay") {
    // independent algorithm: collect the day series, difference it,
    // enumerate all i <= j Walsh sums, interpolated median in doubles
    val xs = daySeries.map(_._2) // daily revenue cents (date-ordered)
    val deltas = xs.sliding(2).map(p => p(1) - p(0)).toArray
    val walsh = (for {
      i <- deltas.indices; j <- i until deltas.length
    } yield (deltas(i) + deltas(j)).toDouble).sorted.toArray
    val m = walsh.length
    val pos = (m - 1) * 0.5
    val lo = walsh(pos.toInt); val hi = walsh(math.ceil(pos).toInt)
    val med = lo + (pos - pos.toInt) * (hi - lo)
    val hl = med / 200.0
    val row = TimeSeries.hodgesLehmann(spark, sf).collect().head
    assert(row.getLong(0) == deltas.length.toLong, "n_deltas")
    assert(row.getLong(1) == m.toLong, "n_pairs")
    assert(math.abs(row.getDouble(2) - hl) < 1e-9,
      s"hl ${row.getDouble(2)} != replay $hl")
  }

  test("abDeltaRatio: textbook delta-method replay on per-user pairs") {
    val per = Tables.events(spark, sf)
      .selectExpr("user_id % 2 as arm", "user_id",
        "cast(round(value * 100) as long) as c")
      .groupBy("arm", "user_id")
      .agg(sum(col("c")).as("y"), count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(2).toDouble,
        r.getLong(3).toDouble))
    def stats(a: Long): (Long, Double, Double) = {
      val g = per.filter(_._1 == a)
      val n = g.length
      val (ys, xs) = (g.map(_._2), g.map(_._3))
      val r = ys.sum / xs.sum
      val my = ys.sum / n; val mx = xs.sum / n
      val cyy = ys.map(v => (v - my) * (v - my)).sum / (n - 1)
      val cxx = xs.map(v => (v - mx) * (v - mx)).sum / (n - 1)
      val cxy = ys.zip(xs).map { case (a1, b1) =>
        (a1 - my) * (b1 - mx) }.sum / (n - 1)
      val varR = (cyy - 2 * r * cxy + r * r * cxx) / (n * mx * mx)
      (n.toLong, r, varR)
    }
    val (na, ra, va) = stats(0); val (nb, rb, vb) = stats(1)
    val z = (rb - ra) / math.sqrt(va + vb)
    val row = Drift.abDeltaRatio(spark, sf).collect().head
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    assert(math.abs(row.getDouble(2) - ra / 100.0) < 1e-9, "ratio_a")
    assert(math.abs(row.getDouble(3) - rb / 100.0) < 1e-9, "ratio_b")
    assert(math.abs(row.getDouble(4) - (rb - ra) / 100.0) < 1e-9)
    assert(math.abs(row.getDouble(5) - z) < 1e-6,
      s"z ${row.getDouble(5)} != replay $z")
  }

  test("abSrmCheck: direct count replay + alarm threshold semantics") {
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    val nA = users.count(_ % 2 == 0).toLong
    val nB = users.length - nA
    def erfc(x: Double): Double = {
      val t = 1.0 / (1.0 + 0.5 * x)
      t * math.exp(-x * x - 1.26551223 + t * (1.00002368
        + t * (0.37409196 + t * (0.09678418 + t * (-0.18628806
        + t * (0.27886807 + t * (-1.13520398 + t * (1.48851587
        + t * (-0.82215223 + t * 0.17087277)))))))))
    }
    val chi2 = ((nA - nB) * (nA - nB) * 1000000L / (nA + nB)) / 1e6
    val z = math.signum((nA - nB).toDouble) * math.sqrt(chi2)
    val p = erfc(math.abs(z) / math.sqrt(2.0))
    val row = graft.queries.Drift.abSrmCheck(spark, sf).collect().head
    assert(row.getLong(0) == nA && row.getLong(1) == nB)
    assert(math.abs(row.getDouble(2) - nA.toDouble / (nA + nB)) < 1e-12)
    assert(math.abs(row.getDouble(3) - chi2) < 1e-9, "chi2_srm")
    assert(math.abs(row.getDouble(4) - z) < 1e-9, "z")
    assert(math.abs(row.getDouble(5) - p) < 1e-6, "p_value")
    assert(row.getBoolean(6) == (row.getDouble(5) < 0.001), "srm_alarm")
    // a parity split of sequential ids cannot trip the alarm
    assert(!row.getBoolean(6), "parity assignment flagged as SRM")
  }

  test("bhAdjust: textbook step-up replay over the collected battery") {
    // independent algorithm: collect each member test's z through its
    // OWN registered query, compute two-sided p with plain doubles
    // (java erfc chain, no nano grid), run the textbook BH step-up
    // loop (sort ascending, p*m/i, running min from the tail), and
    // compare names, order, rejections, and values to the query
    def erfc(x: Double): Double = {
      val t = 1.0 / (1.0 + 0.5 * x)
      t * math.exp(-x * x - 1.26551223 + t * (1.00002368
        + t * (0.37409196 + t * (0.09678418 + t * (-0.18628806
        + t * (0.27886807 + t * (-1.13520398 + t * (1.48851587
        + t * (-0.82215223 + t * 0.17087277)))))))))
    }
    def z(df: org.apache.spark.sql.DataFrame, c: String): Option[Double] = {
      val r = df.select(col(c)).collect().head
      if (r.isNullAt(0)) None else Some(math.abs(r.getDouble(0)))
    }
    val members: Seq[(String, Option[Double])] = Seq(
      "ab_conversion" -> z(Drift.abConversion(spark, sf), "z"),
      "cochran_armitage" -> z(Relational.cochranArmitage(spark, sf),
        "trend_z"),
      "mann_kendall" -> z(TimeSeries.mannKendall(spark, sf), "z"),
      "mcnemar" -> z(Relational.mcnemarYears(spark, sf), "chi2_cc")
        .map(math.sqrt),
      "runs_test" -> z(TimeSeries.runsTest(spark, sf), "z"),
      "sign_test" -> z(Relational.signTest(spark, sf), "z_cc"),
      "wilcoxon_signed" -> z(Drift.wilcoxonSignedRank(spark, sf), "z")
    ) ++ EventQueries.poissonRateTest(spark, sf)
      .select(col("event_type"), col("z")).collect()
      .map(r => (s"poisson_rate_${r.getString(0)}",
        if (r.isNullAt(1)) None else Some(math.abs(r.getDouble(1)))))
    val tested = members.collect { case (n, Some(az)) => (n, az) }
    val m = tested.length
    val ps = tested
      .map { case (n, az) => (n, az, erfc(az / math.sqrt(2.0))) }
      .sortBy { case (n, _, p) => (p, n) }
    // textbook step-up: adjusted p(i) = min_{j>=i} p(j)*m/j, capped
    val adj = new Array[Double](m)
    var run = Double.MaxValue
    for (i <- (m - 1) to 0 by -1) {
      run = math.min(run, ps(i)._3 * m / (i + 1.0))
      adj(i) = math.min(1.0, run)
    }
    val rows = graft.queries.MultipleTesting.bhAdjust(spark, sf).collect()
    assert(rows.length == m, s"${rows.length} rows != $m tested hypotheses")
    for ((r, i) <- rows.zipWithIndex) {
      assert(r.getString(0) == ps(i)._1,
        s"row $i test ${r.getString(0)} != replay order ${ps(i)._1}")
      assert(math.abs(r.getDouble(1) - ps(i)._2) < 1e-12, "abs_z")
      // the query's p rides the nano grid: within 5e-10 of plain p
      assert(math.abs(r.getDouble(2) - ps(i)._3) < 1e-9,
        s"${ps(i)._1} p ${r.getDouble(2)} != replay ${ps(i)._3}")
      // adjusted p: nano-grid + truncating div sit at most m ulps of
      // the grid below the double replay
      assert(math.abs(r.getDouble(3) - adj(i)) < 1e-7,
        s"${ps(i)._1} adj ${r.getDouble(3)} != replay ${adj(i)}")
      assert(r.getBoolean(4) == (adj(i) <= 0.05 + 1e-9),
        s"${ps(i)._1} rejection flag")
      assert(r.getLong(5) == m.toLong)
    }
    // monotone non-decreasing adjusted p down the ranking — the BH
    // step-up invariant
    for (i <- 1 until m)
      assert(rows(i).getDouble(3) >= rows(i - 1).getDouble(3) - 1e-12)
  }

  test("grangerLag1: plain-double OLS F replay on adjacent day pairs") {
    val days = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100)).cast("long")
          .as("c"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("x"), expr("sum(c) div 100").as("y"))
      .orderBy(col("d"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val trip = days.sliding(2).map { w =>
      (w(1)._2, w(0)._2, w(0)._1) // (y_t, y_{t-1}, x_{t-1})
    }.toArray
    val m = trip.length.toDouble
    def mean(f: ((Double, Double, Double)) => Double) = trip.map(f).sum / m
    val (my, myl, mxl) = (mean(_._1), mean(_._2), mean(_._3))
    def cmom(f: ((Double, Double, Double)) => Double,
             g: ((Double, Double, Double)) => Double,
             mf: Double, mg: Double) =
      trip.map(t => (f(t) - mf) * (g(t) - mg)).sum
    val cyy = cmom(_._1, _._1, my, my); val c11 = cmom(_._2, _._2, myl, myl)
    val c22 = cmom(_._3, _._3, mxl, mxl); val c12 = cmom(_._2, _._3, myl, mxl)
    val c1y = cmom(_._2, _._1, myl, my); val c2y = cmom(_._3, _._1, mxl, my)
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c2y * c11 - c1y * c12) / det
    val ssrU = cyy - (b1 * c1y + b2 * c2y)
    val ssrR = cyy - c1y * c1y / c11
    val f = (ssrR - ssrU) * (m - 3.0) / ssrU
    val row = TimeSeries.grangerLag1(spark, sf).collect().head
    assert(row.getLong(0) == trip.length)
    // the query's centered moments come from exact decimal sums; the
    // replay accumulates plain doubles — agreement is relative-1e-9
    assert(math.abs(row.getDouble(1) - b1) < 1e-9 * (math.abs(b1) + 1.0),
      s"beta ${row.getDouble(1)} != replay $b1")
    assert(math.abs(row.getDouble(2) - b2) < 1e-9 * (math.abs(b2) + 1.0),
      s"gamma ${row.getDouble(2)} != replay $b2")
    assert(math.abs(row.getDouble(3) - f) < 1e-6 * (math.abs(f) + 1.0),
      s"F ${row.getDouble(3)} != replay $f")
    // unrestricted SSR can only shrink vs restricted => F >= 0
    assert(row.getDouble(3) >= 0.0)
  }

  test("ansariBradley: textbook midrank-score replay over the pooled halves") {
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val mn = ev.map(_._1).min; val mx = ev.map(_._1).max
    val mid = Math.floorDiv(mn + mx, 2L)
    val pooled = ev.map { case (us, v) => (v, us < mid) }.sortBy(_._1)
    val bigN = pooled.length
    def score(i: Int): Double = math.min(i, bigN + 1 - i).toDouble
    // midrank-averaged score per tied value, applied to every 'a' member
    var a = 0.0; var i = 0
    while (i < bigN) {
      var j = i
      while (j < bigN && pooled(j)._1 == pooled(i)._1) j += 1
      val sbar = (i + 1 to j).map(score).sum / (j - i)
      a += sbar * (i until j).count(pooled(_)._2)
      i = j
    }
    val na = pooled.count(_._2).toLong; val nb = bigN - na
    val row = Drift.ansariBradley(spark, sf).collect().head
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    // per-value micro-grid landing: within 5e-7 * #distinct-values
    assert(math.abs(row.getDouble(2) - a) < 1e-3 + 1e-9 * a,
      s"AB ${row.getDouble(2)} != replay $a")
    val nD = bigN.toDouble; val naD = na.toDouble; val nbD = nb.toDouble
    val (em, vr) =
      if (bigN % 2 == 0)
        (naD * (nD + 2.0) / 4.0,
          naD * nbD * (nD + 2.0) * (nD - 2.0) / (48.0 * (nD - 1.0)))
      else
        (naD * (nD + 1.0) * (nD + 1.0) / (4.0 * nD),
          naD * nbD * (nD + 1.0) * (3.0 + nD * nD) / (48.0 * nD * nD))
    assert(math.abs(row.getDouble(3) - em) < 1e-9 * em, "null mean")
    assert(math.abs(row.getDouble(4) - vr) < 1e-9 * vr, "null var")
    assert(math.abs(row.getDouble(5)
      - (row.getDouble(2) - em) / math.sqrt(vr)) < 1e-9, "z chain")
  }

  test("vocabOverlap: exact set-arithmetic replay of the top-K cut") {
    val toks = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val top = toks.groupBy(_._1).view.mapValues { ws =>
      ws.groupBy(_._2).view.mapValues(_.length).toSeq
        .sortBy { case (t, n) => (-n, t) }.take(200).map(_._1).toSet
    }.toMap
    val rows = TextQueries.vocabOverlap(spark, sf).collect()
    val langs = top.keys.toSeq.sorted
    val expectPairs = for {
      i <- langs.indices; j <- (i + 1) until langs.length
    } yield (langs(i), langs(j))
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq
      == expectPairs, "pair grid")
    for (r <- rows) {
      val (a, b) = (top(r.getString(0)), top(r.getString(1)))
      assert(r.getLong(2) == a.size && r.getLong(3) == b.size)
      assert(r.getLong(4) == (a & b).size,
        s"${r.getString(0)}/${r.getString(1)} shared")
      val jac = (a & b).size.toDouble / (a | b).size
      assert(math.abs(r.getDouble(5) - jac) < 1e-12)
    }
  }

  test("lengthKsPairs: brute-force two-sample KS replay per language pair") {
    val lens = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = TextQueries.lengthKsPairs(spark, sf).collect()
    for (r <- rows) {
      val (xa, xb) = (lens(r.getString(0)), lens(r.getString(1)))
      val (na, nb) = (xa.length.toLong, xb.length.toLong)
      assert(r.getLong(2) == na && r.getLong(3) == nb)
      val grid = (xa ++ xb).distinct.sorted
      val d = grid.map { v =>
        math.abs(xa.count(_ <= v) * nb - xb.count(_ <= v) * na)
      }.max
      assert(r.getLong(4) == d,
        s"${r.getString(0)}/${r.getString(1)} D ${r.getLong(4)} != replay $d")
      assert(math.abs(r.getDouble(5) - d.toDouble / (na.toDouble * nb.toDouble)) < 1e-15)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("bigramEntropyRate: plain-double conditional-entropy replay per lang") {
    val docsRows = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docsRows.groupBy(_._1)
    val out = TextQueries.bigramEntropyRate(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(4)))).toMap
    for ((lang, docs) <- byLang) {
      val bgs = docs.flatMap { case (_, text) =>
        val w = text.split(" ", -1)
        (0 until w.length - 1).map(i => (w(i), w(i) + " " + w(i + 1)))
      }
      if (bgs.nonEmpty) {
        val n = bgs.length.toDouble
        def h(counts: Iterable[Int]): Double =
          math.log(n) - counts.map(k => k * math.log(k)).sum / n
        val hj = h(bgs.groupBy(_._2).map(_._2.length))
        val hc = h(bgs.groupBy(_._1).map(_._2.length))
        val (nOut, condOut) = out(lang)
        assert(nOut == bgs.length, s"$lang bigram count")
        // micronat grid: each ln lands on 1e-6 nats
        assert(math.abs(condOut - (hj - hc)) < 5e-6,
          s"$lang cond entropy $condOut != replay ${hj - hc}")
        // conditioning can only reduce entropy; both legs nonneg
        assert(condOut >= -5e-6 && condOut <= hj + 5e-6)
      }
    }
  }
}
