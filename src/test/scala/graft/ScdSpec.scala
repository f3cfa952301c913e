package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("scd2 collapses runs, closes intervals, flags the current row") {
    val log = Seq(
      (1L, ts(10), 1L, "A"),
      (1L, ts(20), 2L, "A"),  // same state → same run
      (1L, ts(30), 3L, "B"),
      (1L, ts(40), 4L, "A"),  // A returns → NEW run, not merged
      (2L, ts(15), 5L, "X")
    ).toDF("k", "t", "id", "st")
    val got = Scd.scd2(log, col("k"), col("t"), col("id"), col("st"))
      .orderBy("key", "effective_from")
      .select("key", "state", "effective_from", "effective_to",
        "is_current", "n_events")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
      .collect().toSeq
    assert(got == Seq(
      (1L, "A", ts(10), Some(ts(30)), false, 2L),
      (1L, "B", ts(30), Some(ts(40)), false, 1L),
      (1L, "A", ts(40), None, true, 1L),
      (2L, "X", ts(15), None, true, 1L)))
  }

  test("scd2: NULL is a legal state and exactly one current row per key") {
    val log = Seq(
      (1L, ts(1), 1L, Option.empty[String]),
      (1L, ts(2), 2L, Option.empty[String]), // null == null → one run
      (1L, ts(3), 3L, Some("v"))
    ).toDF("k", "t", "id", "st")
    val got = Scd.scd2(log, col("k"), col("t"), col("id"), col("st"))
    assert(got.count() == 2)
    assert(got.filter(col("is_current")).count() == 1)
    assert(got.filter(col("state").isNull)
      .select("n_events").as[Long].head() == 2L)
  }

  test("scd2 intervals tile: each run's end is the next run's start") {
    val ev = graft.core.Tables.table(spark, "/root/testdata/sf0.001",
      "events")
    val iv = Scd.scd2(ev, col("user_id"), col("ts"), col("event_id"),
      col("event_type"))
    // adjacency: self-join run i's effective_to onto run i+1's start
    val broken = iv.alias("a").join(iv.alias("b"),
        col("a.key") === col("b.key") &&
          col("a.effective_to") === col("b.effective_from"), "left_anti")
      .filter(col("a.effective_to").isNotNull)
    assert(broken.count() == 0)
    // exactly one open interval per key; event mass is conserved
    val keys = iv.select("key").distinct().count()
    assert(iv.filter(col("is_current")).count() == keys)
    assert(iv.agg(sum("n_events")).as[Long].head() == ev.count())
  }
}
