package graft

import graft.queries.{EventQueries, Relational, Survival, TimeSeries}
import org.apache.spark.sql.functions._

/** Exact replays for the survival/lift/robust-trend/concurrency batch.
  * Value parity vs DuckDB is oracle-checked by the driver; these pin
  * each operator's DEFINITION against an independent brute-force
  * recompute on driver-collected data, so a hash match can never hide
  * an agreed-upon-but-wrong spelling.
  */
class SurvivalSpec extends SparkSpec {

  test("kaplanMeier: risk sets, event counts, and ln-curve replay") {
    val out = Survival.kaplanMeier(spark, sf).collect()
    assert(out.nonEmpty)
    // independent lifetime table
    val life = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .groupBy("o_custkey")
      .agg(min(col("d")).as("f"), max(col("d")).as("l"))
      .collect()
      .map(r => (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    val maxD = life.map(_._2).max
    import java.time.temporal.ChronoUnit.DAYS
    val durs = life.map { case (f, l) =>
      (f.until(l, DAYS), if (l.until(maxD, DAYS) > 90) 1L else 0L)
    }
    def lnMicro(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    var cum = 0L
    val expected = durs.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (t, g) =>
        val d = g.map(_._2).sum
        val nRisk = durs.count(_._1 >= t).toLong
        if (d > 0 && nRisk > d) {
          cum += lnMicro(nRisk - d) - lnMicro(nRisk)
          Some((t, nRisk, d, cum))
        } else None
    }
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // survival is non-increasing and starts below 0 in log space
    val lnS = out.map(_.getLong(3))
    assert(lnS.zip(lnS.tail).forall { case (a, b) => b <= a })
    assert(lnS.head < 0)
  }

  test("hazardRatio: O/E replay from the log-rank grid + CI identities") {
    // the O/E machinery is already replayed against logRank's outputs;
    // here rebuild HR from logRank's OWN published numbers plus the
    // total-events recount, and pin the CI construction
    val lr = Survival.logRank(spark, sf).collect().head
    val oa = lr.getLong(1)
    val ea = lr.getLong(2) / 1e9
    // total churn events: independent recount from raw orders
    val life = Tables.load(spark, sf, "orders")
      .selectExpr("o_custkey", "cast(o_orderdate as date) as d")
      .groupBy("o_custkey")
      .agg(min(col("d")).as("f"), max(col("d")).as("l"))
    val maxD = life.agg(max(col("l"))).collect().head.getDate(0)
    val et = life.filter(datediff(lit(maxD), col("l")) > 90).count()
    val ob = et - oa
    val eb = et - ea
    val hr = (oa * eb) / (ea * ob)
    val r = Survival.hazardRatio(spark, sf).collect().head
    assert(r.getLong(0) == et, s"events_total ${r.getLong(0)} != recount $et")
    assert(r.getLong(1) == oa)
    assert(math.abs(r.getDouble(2) - ea) < 1e-12)
    assert(math.abs(r.getDouble(3) - eb) < 1e-9)
    assert(math.abs(r.getDouble(4) - hr) < 1e-9,
      s"hazard_ratio ${r.getDouble(4)} != replay $hr")
    assert(math.abs(r.getDouble(5) - math.log(hr)) < 1e-8, "ln_hr")
    val se = math.sqrt(1.0 / ea + 1.0 / eb)
    assert(math.abs(r.getDouble(6) - se) < 1e-12, "ln_hr_se")
    assert(math.abs(r.getDouble(7) - (r.getDouble(5) - 1.959963985 * se)) < 1e-12)
    assert(math.abs(r.getDouble(8) - (r.getDouble(5) + 1.959963985 * se)) < 1e-12)
    // sign consistency with the log-rank direction: z and ln HR agree
    assert(math.signum(r.getDouble(5)) == math.signum(lr.getDouble(4))
      || r.getDouble(5) == 0.0, "HR direction disagrees with log-rank z")
  }

  test("lifeTable: textbook actuarial replay (half-credit censoring)") {
    val out = Survival.lifeTable(spark, sf).collect()
    assert(out.nonEmpty)
    val life = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .groupBy("o_custkey")
      .agg(min(col("d")).as("f"), max(col("d")).as("l"))
      .collect()
      .map(r => (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    val maxD = life.map(_._2).max
    import java.time.temporal.ChronoUnit.DAYS
    val ends = life.map { case (f, l) =>
      (f.until(l, DAYS) / 30, if (l.until(maxD, DAYS) > 90) 1L else 0L)
    }
    def lnMicro(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    var cum = 0L
    val expected = ends.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (band, g) =>
        val d = g.map(_._2).sum
        val c = g.length - d
        val nEnter = ends.count(_._1 >= band).toLong
        val eff2 = 2 * nEnter - c
        if (eff2 - 2 * d > 0) {
          cum += lnMicro(eff2 - 2 * d) - lnMicro(eff2)
          Some((band * 30, nEnter, d, c, 2.0 * d / eff2, cum))
        } else None
    }
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._6))
      == expected.map(t => (t._1, t._2, t._3, t._4, t._6)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 1e-12, s"q_hazard at band ${g._1}") }
    // censoring-only bands contribute exactly zero to ln S
    val lnS = out.map(_.getLong(5))
    assert(lnS.zip(lnS.tail).forall { case (a, b) => b <= a })
    // the half-credit adjustment makes q_hazard >= the naive d/n rate
    got.foreach { case (_, nEnter, d, _, q, _) =>
      assert(q >= d.toDouble / nEnter - 1e-12) }
  }

  test("theilSen: exact pairwise-slope lower-median replay") {
    val row = TimeSeries.theilSen(spark, sf).collect()
    assert(row.length == 1)
    val series = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(18,6)") * lit(100))
          .cast("long").as("c"))
      .groupBy("d").agg(sum(col("c")).as("rc"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1) / 100))
      .sortBy(_._1)
    val slopes = (for {
      i <- series.indices; j <- (i + 1) until series.length
    } yield (series(j)._2 - series(i)._2).toDouble /
        (series(j)._1 - series(i)._1).toDouble).sorted
    val m = slopes.length
    assert(row(0).getLong(0) == m.toLong)
    assert(row(0).getDouble(1) == slopes((m + 1) / 2 - 1))
  }

  test("decileLift: buckets partition customers; shares telescope to 1") {
    val out = Relational.decileLift(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L))
    val nCust = Tables.load(spark, sf, "orders")
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(out.map(_.getLong(1)).sum == nCust)
    // equal-count cut: sizes differ by at most 1
    val sizes = out.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    // top decile dominates (spend-desc ordering), shares decrease
    val shares = out.map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
    assert(math.abs(out.last.getDouble(4) - 1.0) < 1e-12)
    // share replay from exact cents
    val totCents = out.map(_.getLong(2)).sum
    out.foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / totCents.toDouble)
    }
  }

  test("maxConcurrency: brute-force sweep replay of the top-5 moments") {
    val out = EventQueries.maxConcurrency(spark, sf).collect()
    assert(out.length == 5)
    // independent sessionization + global sweep
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = evs.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._2, e._3))
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = sorted.head._2; var last = sorted.head._2
      sorted.tail.foreach { e =>
        if (e._2 - last > 30L * 60 * 1000000) { buf += ((start, last)); start = e._2 }
        last = e._2
      }
      buf += ((start, last)); buf
    }.toSeq
    val deltas = (sessions.map(s => (s._1, 1L)) ++
      sessions.map(s => (s._2 + 1, -1L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var run = 0L
    val curve = deltas.map { case (us, d) => run += d; (us, run) }
    val top5 = curve.sortBy { case (us, c) => (-c, us) }.take(5)
    val got = out.map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == top5)
    // sanity: concurrency returns to zero after the final boundary
    assert(run == 0L)
  }
}
