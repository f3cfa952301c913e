package graft

import org.apache.spark.sql.functions._

import graft.operators.Resample

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("grid materializes gap ticks, exact sums, forward fill carries " +
    "the last observation; leading gaps stay NULL") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:15:00"), 2.5),
      (1L, ts("2024-01-01 10:45:00"), 1.5), // same bucket -> sum 4.0
      (1L, ts("2024-01-01 13:10:00"), 7.0), // 11:00 + 12:00 are gaps
      (2L, ts("2024-01-01 00:30:00"), 3.0)).toDF("user_id", "ts", "value")
    val got = Resample.grid(ev, "ts", "value", Seq("user_id"),
      "1 hour", 3600L)
      .orderBy("user_id", "bucket")
      .as[(Long, java.sql.Timestamp, Long, Option[Double],
        Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L, Some(4.0), Some(4.0)),
      (1L, ts("2024-01-01 11:00:00"), 0L, None, Some(4.0)),
      (1L, ts("2024-01-01 12:00:00"), 0L, None, Some(4.0)),
      (1L, ts("2024-01-01 13:00:00"), 1L, Some(7.0), Some(7.0)),
      (2L, ts("2024-01-01 00:00:00"), 1L, Some(3.0), Some(3.0))))
  }

  test("grid is layout-independent") {
    val ev = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "events")
    val a = Resample.grid(ev, "ts", "value", Seq("user_id"),
      "1 hour", 3600L).orderBy("user_id", "bucket").collect().toSeq
    val b = Resample.grid(ev.repartition(13), "ts", "value",
      Seq("user_id"), "1 hour", 3600L)
      .orderBy("user_id", "bucket").collect().toSeq
    assert(a == b && a.nonEmpty)
    // grid is complete: per user, tick count == span hours + 1
    val spans = Resample.grid(ev, "ts", "value", Seq("user_id"),
      "1 hour", 3600L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("ticks"),
        ((unix_timestamp(max("bucket")) - unix_timestamp(min("bucket")))
          / 3600 + 1).as("expected"))
      .filter(col("ticks") =!= col("expected"))
    assert(spans.count() == 0)
  }
}
