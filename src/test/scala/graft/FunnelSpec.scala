package graft

import org.apache.spark.sql.functions._

import graft.operators.{Funnel, Retention}

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "sec", "event_type")
      .select(col("user_id"), col("sec").cast("timestamp").as("ts"),
        col("event_type"))

  private val steps = Seq("view", "click", "purchase")

  test("funnel: ordered matching, out-of-order events don't count, " +
    "users without step 1 are absent") {
    val events = ev(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 1L, "view"), (2L, 2L, "purchase"), (2L, 3L, "click"),
      (3L, 1L, "click"), (3L, 2L, "view"), (3L, 3L, "click"),
      (4L, 5L, "view"),
      (5L, 1L, "click"))
    val got = Funnel.funnel(events, "user_id", "event_type", "ts", steps)
      .as[(Long, Int)].collect().toMap
    // u2: purchase@2 precedes the click match@3 -> depth 2
    // u3: click@1 is BEFORE the view -> only click@3 counts -> depth 2
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 2, 4L -> 1))
  }

  test("event duplication (at-least-once delivery) leaves funnel " +
    "depths exactly unchanged — min-aggregation is idempotent") {
    val events = ev(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 1L, "view"), (2L, 3L, "click"))
    val once = Funnel.funnel(events, "user_id", "event_type", "ts",
      steps).as[(Long, Int)].collect().toMap
    val tripled = Funnel.funnel(events.union(events).union(events),
      "user_id", "event_type", "ts", steps)
      .as[(Long, Int)].collect().toMap
    assert(once == tripled && once == Map(1L -> 3, 2L -> 2))
  }

  test("funnel: same-timestamp step is NOT strictly after") {
    val events = ev((6L, 1L, "view"), (6L, 1L, "click"))
    val got = Funnel.funnel(events, "user_id", "event_type", "ts", steps)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(6L -> 1))
  }

  test("funnel: conversion window cuts late steps") {
    val events = ev(
      (7L, 0L, "view"), (7L, 5L, "click"), (7L, 20L, "purchase"))
    val open = Funnel.funnel(events, "user_id", "event_type", "ts", steps)
      .as[(Long, Int)].collect().toMap
    assert(open == Map(7L -> 3))
    val windowed = Funnel.funnel(events, "user_id", "event_type", "ts",
      steps, withinSeconds = Some(10L))
      .as[(Long, Int)].collect().toMap
    assert(windowed == Map(7L -> 2))
  }

  test("funnelCounts: monotone conversion curve, zero-filled steps") {
    val events = ev(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 1L, "view"), (2L, 3L, "click"),
      (3L, 2L, "view"),
      (4L, 5L, "view"))
    val per = Funnel.funnel(events, "user_id", "event_type", "ts", steps)
    val got = Funnel.funnelCounts(per, 3)
      .as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 4L), (2, 2L), (3, 1L)))
  }

  test("retention: weekly cohorts, exact distinct users per period") {
    def ts(d: String) = java.sql.Timestamp.valueOf(d + " 12:00:00")
    val events = Seq(
      (1L, ts("2026-01-05")), (1L, ts("2026-01-13")),
      (2L, ts("2026-01-07")), (2L, ts("2026-01-20")),
      (3L, ts("2026-01-13"))).toDF("user_id", "ts")
    val got = Retention.weekly(events, "user_id", "ts")
      .as[(java.sql.Date, Int, Long)].collect().toSeq
    val w1 = java.sql.Date.valueOf("2026-01-05")
    val w2 = java.sql.Date.valueOf("2026-01-12")
    // u1: d0=01-05 (cohort w1), 01-13 is day 8 -> period 1
    // u2: d0=01-07 (cohort w1), 01-20 is day 13 -> period 1
    // u3: d0=01-13 (cohort w2), period 0
    assert(got == Seq((w1, 0, 2L), (w1, 1, 2L), (w2, 0, 1L)))
  }

  test("retention HLL twin: same cells, estimates track exact counts, " +
    "layout-independent") {
    val ev = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "events")
    val exact = Retention.weekly(ev, "user_id", "ts")
      .as[(java.sql.Date, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val est = Retention.weeklyHll(ev, "user_id", "ts", p = 6)
      .select(col("cohort"), col("period"), col("est_millis"))
      .as[(java.sql.Date, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(est.keySet == exact.keySet)
    // 3-sigma at p=6: 1.04/sqrt(64) ~ 13%; allow 40% + 2 absolute slack
    est.foreach { case (cell, millis) =>
      val e = millis / 1000.0
      val x = exact(cell).toDouble
      assert(math.abs(e - x) <= 0.4 * x + 2.0,
        s"cell $cell est $e exact $x")
    }
    val est2 = Retention.weeklyHll(ev.repartition(13), "user_id", "ts",
      p = 6)
      .select(col("cohort"), col("period"), col("est_millis"))
      .as[(java.sql.Date, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(est2 == est)
  }

  test("funnelLatency: matched timestamps and exact micros gaps; " +
    "depth column equals funnel's") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(4)), (1L, "purchase", ts(9)),
      (2L, "view", ts(2)), (2L, "click", ts(3)),
      (3L, "view", ts(5))).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnelLatency(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .select("user_id", "depth", "latency_us")
      .as[(Long, Int, Long)].collect().toSeq
    assert(got == Seq((1L, 3, 8L * 60 * 1000000),
      (2L, 2, 1L * 60 * 1000000), (3L, 1, 0L)))
    val depths = Funnel.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("user_id").select("depth").as[Int].collect().toSeq
    assert(depths == got.map(_._2))
  }
}
