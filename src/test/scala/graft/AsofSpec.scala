package graft

import java.sql.Timestamp

import graft.queries.EventQueries

/** As-of join edge cases the generated events data never carries —
  * planted directly so the at-or-before contract is tested, not assumed:
  * a purchase at the click's EXACT timestamp must be visible (ASOF is
  * inclusive), regardless of event_id ordering.
  */
class AsofSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("same-timestamp purchase is visible to the click (inclusive as-of)") {
    val events = Seq(
      // user 1: purchase shares the click's instant, with LARGER event_id
      (1L, 3L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (1L, 10L, ts("2024-01-01 10:00:00"), "purchase", 5.0),
      // user 2: purchase strictly before the click (the ordinary case)
      (2L, 1L, ts("2024-01-01 09:00:00"), "purchase", 7.0),
      (2L, 2L, ts("2024-01-01 10:00:00"), "click", 0.0),
      // user 3: click with NO purchase at-or-before -> null
      (3L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (3L, 2L, ts("2024-01-01 11:00:00"), "purchase", 9.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = EventQueries.asofOver(events).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == Seq(
      (1L, 3L, Some(5.0)),  // inclusive: same-instant purchase counts
      (2L, 2L, Some(7.0)),
      (3L, 1L, None)))      // future purchase must NOT leak backwards
  }

  test("nearest as-of: direction choice, tie to earlier, same-instant wins at 0") {
    val events = Seq(
      // user 1: prev at -2h, next at +1h -> next wins
      (1L, 1L, ts("2024-01-01 08:00:00"), "purchase", 3.0),
      (1L, 2L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (1L, 3L, ts("2024-01-01 11:00:00"), "purchase", 4.0),
      // user 2: equidistant (±1h) -> tie resolves to the EARLIER purchase
      (2L, 1L, ts("2024-01-01 09:00:00"), "purchase", 5.0),
      (2L, 2L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (2L, 3L, ts("2024-01-01 11:00:00"), "purchase", 6.0),
      // user 3: same-instant purchase (larger event_id) -> dt 0, wins
      (3L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (3L, 9L, ts("2024-01-01 10:00:00"), "purchase", 7.0),
      (3L, 2L, ts("2024-01-01 10:30:00"), "purchase", 8.0),
      // user 4: no purchases at all -> NULLs survive (never NaN)
      (4L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      // user 5: only a FUTURE purchase -> forward side used
      (5L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (5L, 2L, ts("2024-01-01 12:00:00"), "purchase", 9.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = EventQueries.asofNearestOver(events).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got == Seq(
      (1L, 2L, Some(4.0), Some(3600L * 1000000)),
      (2L, 2L, Some(5.0), Some(3600L * 1000000)),
      (3L, 1L, Some(7.0), Some(0L)),
      (4L, 1L, None, None),
      (5L, 1L, Some(9.0), Some(2L * 3600 * 1000000))))
  }

  test("overlap join: brute-force interval replay; non-empty; overlaps >= 0") {
    // full replay at the smoke SF: the banded spelling must equal the
    // naive all-pairs inequality join, rolled up identically
    import org.apache.spark.sql.functions._
    val got = EventQueries.rangeJoinOverlap(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    val iv = graft.Tables.events(spark, sf)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .agg(min(unix_micros(col("ts"))).as("t0"),
        max(unix_micros(col("ts"))).as("t1"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getString(2),
        r.getLong(3), r.getLong(4)))
    val pairs = for {
      (ua, da, ta, a0, a1) <- iv
      (ub, _, tb, b0, b1) <- iv
      if ua == ub && ta < tb && a0 <= b1 && b0 <= a1
    } yield ((da, ta, tb),
      math.min(a1, b1) - math.max(a0, b0))
    val expected = pairs.groupBy(_._1).map { case ((d, ta, tb), vs) =>
      (d, ta, tb, vs.length.toLong, vs.map(_._2).sum)
    }.toSeq.sortBy { case (d, ta, tb, _, _) => (d, ta, tb) }
    assert(got == expected, s"overlap join diverges from brute force " +
      s"(${got.length} vs ${expected.length} groups)")
    assert(got.nonEmpty, "co-engagement matrix must not be empty")
    assert(pairs.forall(_._2 >= 0), "closed-interval overlap is >= 0")
  }

  test("funnel requires strict stage order — out-of-order events don't count") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, 1L, ts("2024-01-01 09:00:00"), "view", 0.0),
      (1L, 2L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (1L, 3L, ts("2024-01-01 11:00:00"), "purchase", 5.0),
      // user 2: click BEFORE the first view — stage 2 never reached
      (2L, 1L, ts("2024-01-01 08:00:00"), "click", 0.0),
      (2L, 2L, ts("2024-01-01 09:00:00"), "view", 0.0),
      (2L, 3L, ts("2024-01-01 10:00:00"), "purchase", 5.0),
      // user 3: purchase at the SAME instant as the click — strict '>' rejects
      (3L, 1L, ts("2024-01-01 09:00:00"), "view", 0.0),
      (3L, 2L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (3L, 3L, ts("2024-01-01 10:00:00"), "purchase", 5.0),
      // user 4: view only
      (4L, 1L, ts("2024-01-01 09:00:00"), "view", 0.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = EventQueries.funnelOver(events).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map(
      "stage1_view" -> 4L,      // all four users viewed
      "stage2_click" -> 2L,     // users 1 and 3 clicked after viewing
      "stage3_purchase" -> 1L)) // only user 1 purchased after the click
  }

  test("dau/wau: trailing-7-day actives dominate dailies; calendar clipped") {
    val df = EventQueries.dauWau(spark, sf)
    // the 7-day window-day fan-out must clip to observed days via a
    // BROADCAST semi join (|days| is tiny), never a shuffled one
    val plan = planOf(df)
    assert(plan.contains("LeftSemi"), s"plan:\n$plan")
    assert(plan.contains("Broadcast"), s"plan:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every user active on day d is active in every window ending d..d+6,
    // so WAU >= DAU pointwise
    assert(rows.forall(r => r.getAs[Long]("n_wau") >= r.getAs[Long]("n_dau")),
      "found a day with WAU < DAU")
  }

  test("scd2 intervals tile: each valid_to meets the next valid_from, one open row per user") {
    val rows = EventQueries.scd2History(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("valid_from"),
        Option(r.getAs[Timestamp]("valid_to"))))
      .groupBy(_._1)
    rows.foreach { case (user, versions) =>
      // exactly one current (open-ended) version per user, and it's the last
      assert(versions.count(_._3.isEmpty) == 1, s"user $user open rows != 1")
      assert(versions.last._3.isEmpty, s"user $user: open row is not last")
      // no gaps, no overlaps: each closed interval ends where the next begins
      versions.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from2, _)) =>
          assert(to == from2, s"user $user: interval gap/overlap $to vs $from2")
        case _ => ()
      }
    }
  }
}
