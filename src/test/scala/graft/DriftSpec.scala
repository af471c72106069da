package graft

import graft.queries.Drift
import org.apache.spark.sql.functions._

/** Drift monitors: both statistics are pinned against full driver-side
  * recomputes from the raw events (independent Scala arithmetic — the
  * same integer-count/micronat definitions, none of the Spark
  * expressions).
  */
class DriftSpec extends SparkSpec {

  private def lnMicro(x: Long): Long =
    new java.math.BigDecimal(math.log(x.toDouble) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** (side, value) per event under the same midpoint rule */
  private def sides(): Array[(String, Double)] = {
    val rows = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val mn = rows.map(_._1).min
    val mx = rows.map(_._1).max
    val mid = (mn + mx) / 2
    rows.map { case (us, v) => (if (us < mid) "a" else "b", v) }
  }

  test("PSI: per-bin contributions match an exact recompute; corpus is stable") {
    val sided = sides()
    val na = sided.count(_._1 == "a").toLong
    val nb = sided.length - na
    def bin(v: Double): Int = math.min(math.max(math.floor(v / 50.0), 0), 9).toInt
    val got = Drift.psi(spark, sf).collect()
    assert(got.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum ==
      sided.length.toLong)
    var total = 0.0
    got.foreach { r =>
      val b = r.getInt(0)
      val ca = sided.count(p => p._1 == "a" && bin(p._2) == b).toLong
      val cb = sided.count(p => p._1 == "b" && bin(p._2) == b).toLong
      assert(r.getAs[Long]("n_a") == ca && r.getAs[Long]("n_b") == cb)
      val (cas, cbs, nas, nbs) = (ca + 1, cb + 1, na + 10, nb + 10)
      val expected = ((cas * nbs - cbs * nas).toDouble /
        (nas.toDouble * nbs.toDouble)) *
        ((lnMicro(cas) + lnMicro(nbs) - lnMicro(cbs) - lnMicro(nas)).toDouble / 1e6)
      assert(r.getAs[Double]("psi_contrib") == expected, s"bin $b")
      total += expected
    }
    // the two halves come from one stationary generator: PSI must read
    // "stable" — a planted-drift positive control lives in the KS test
    assert(total < 0.1, s"stationary halves must read stable, PSI=$total")
  }

  test("KS: statistic, location, and scale match an exact integer recompute") {
    val sided = sides()
    val na = sided.count(_._1 == "a").toLong
    val nb = sided.length - na
    val byValue = sided.groupBy(_._2).view
      .mapValues(g => (g.count(_._1 == "a").toLong, g.count(_._1 == "b").toLong))
      .toSeq.sortBy(_._1)
    var (cumA, cumB) = (0L, 0L)
    var best = (0L, Double.MaxValue) // (d_scaled, value); lowest value on ties
    byValue.foreach { case (v, (ca, cb)) =>
      cumA += ca; cumB += cb
      val d = math.abs(cumA * nb - cumB * na)
      if (d > best._1) best = (d, v)
    }
    val r = Drift.ks(spark, sf).collect().head
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(r.getAs[Long]("ks_scaled") == best._1)
    assert(r.getAs[Double]("at_value") == best._2)
    assert(r.getAs[Double]("ks") ==
      best._1.toDouble / (na.toDouble * nb.toDouble))
  }

  test("KS detects a planted shift (positive control on synthetic frames)") {
    // the operator pins the engine spelling; this pins the MATH: a
    // shifted sample must produce a large D on the same integer formula
    val a = (1 to 1000).map(_.toDouble)
    val b = (1 to 1000).map(_.toDouble + 500.0)
    // cumulate PER DISTINCT VALUE (as the operator does): element-wise
    // cumulation would briefly split tied values across the two sides
    // and overstate D by up to 1/n
    val byValue = (a.map(("a", _)) ++ b.map(("b", _)))
      .groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (v, g) => (v, g.count(_._1 == "a"), g.count(_._1 == "b")) }
    var (cumA, cumB, dMax) = (0L, 0L, 0L)
    byValue.foreach { case (_, ca, cb) =>
      cumA += ca; cumB += cb
      dMax = math.max(dMax, math.abs(cumA * 1000L - cumB * 1000L))
    }
    assert(dMax.toDouble / (1000.0 * 1000.0) == 0.5)
  }

  test("Welch t-test: statistic and df match an exact cent-moment recompute") {
    val out = graft.queries.Drift.welchTTest(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    // independent recompute from the raw events
    val rows = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("ts")).as("us"),
        org.apache.spark.sql.functions.col("value"))
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    val (mn, mx) = (rows.map(_._1).min, rows.map(_._1).max)
    val mid = (mn + mx) / 2
    def cents(v: Double): Long = math.round(v * 100)
    val a = rows.filter(_._1 < mid).map(x => cents(x._2))
    val b = rows.filter(_._1 >= mid).map(x => cents(x._2))
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    def mom(xs: Array[Long]): (Double, Double) = {
      val n = xs.length.toDouble
      val sc = xs.sum.toDouble
      val scc = xs.map(x => x * x).sum.toDouble
      val mean = sc / (n * 100.0)
      val va = (n * scc - sc * sc) / (n * (n - 1.0) * 10000.0)
      (mean, va / n)
    }
    val (ma, sea) = mom(a); val (mb, seb) = mom(b)
    assert(r.getDouble(2) == ma && r.getDouble(3) == mb)
    assert(r.getDouble(4) == (ma - mb) / math.sqrt(sea + seb))
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (a.length - 1.0) + seb * seb / (b.length - 1.0))
    assert(r.getDouble(5) == df)
    // df is bounded by the classic Welch range
    assert(df >= math.min(a.length, b.length) - 1.0 &&
      df <= a.length + b.length - 2.0)
  }
}
