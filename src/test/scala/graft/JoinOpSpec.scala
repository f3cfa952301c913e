package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.ops.JoinOp

class JoinOpSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) =
    Timestamp.valueOf(f"2026-01-01 00:$m%02d:$s%02d")

  test("stream-stream inner join pairs same-key rows within the time " +
    "bound across micro-batches, and only those") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, Timestamp, Long)]
    val rIn = MemoryStream[(String, Timestamp, Long)]
    val l = lIn.toDF().toDF("k", "ts", "lv").withWatermark("ts", "0 seconds")
    val r = rIn.toDF().toDF("k", "ts", "rv").withWatermark("ts", "0 seconds")
    val out = JoinOp(Map("key_col" -> "k", "time_bound" -> "2 minutes"),
      Seq(l, r)).head
    val q = out.writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").start()
    try {
      // right rows arrive in an EARLIER micro-batch than their partner —
      // the join must buffer them in state, not rely on co-arrival
      rIn.addData(("a", ts(1), 10L), ("a", ts(9), 11L), ("b", ts(2), 12L))
      q.processAllAvailable()
      lIn.addData(("a", ts(2), 1L), ("a", ts(5), 2L), ("c", ts(2), 3L))
      q.processAllAvailable()
      val got = spark.table("ssj_inner")
        .select("k", "lv", "r_rv").as[(String, Long, Long)]
        .collect().toSet
      // a@2 ↔ a@1 (within 2 min); a@5 matches neither (1 is 4 min back,
      // 9 is 4 min ahead); b/c keys never pair
      assert(got == Set(("a", 1L, 10L)))
    } finally q.stop()
  }

  test("left_outer emits unmatched left rows with NULL right columns " +
    "once the watermark passes their bound") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, Timestamp, Long)]
    val rIn = MemoryStream[(String, Timestamp, Long)]
    val l = lIn.toDF().toDF("k", "ts", "lv").withWatermark("ts", "0 seconds")
    val r = rIn.toDF().toDF("k", "ts", "rv").withWatermark("ts", "0 seconds")
    val out = JoinOp(Map("key_col" -> "k", "time_bound" -> "1 minutes",
      "join_type" -> "left_outer"), Seq(l, r)).head
    val q = out.writeStream.format("memory").queryName("ssj_louter")
      .outputMode("append").start()
    try {
      lIn.addData(("a", ts(1), 1L), ("b", ts(1), 2L))
      rIn.addData(("a", ts(1, 30), 20L))
      q.processAllAvailable()
      // push both watermarks far past minute 2 so b@1's bound closes
      lIn.addData(("z", ts(30), 99L))
      rIn.addData(("z", ts(30), 99L))
      q.processAllAvailable()
      val got = spark.table("ssj_louter")
        .filter(col("k") =!= "z")
        .select("k", "lv", "r_rv").as[(String, Long, Option[Long])]
        .collect().toSet
      assert(got == Set(("a", 1L, Some(20L)), ("b", 2L, None)))
    } finally q.stop()
  }

  test("batch mode: the same factory is an ordinary interval join " +
    "(parity with the hand-built form); key_col required; bad join_type " +
    "refused") {
    val l = Seq(("a", ts(1), 1L), ("a", ts(8), 2L), ("b", ts(1), 3L))
      .toDF("k", "ts", "lv")
    val r = Seq(("a", ts(2), 10L), ("a", ts(20), 11L), ("c", ts(1), 12L))
      .toDF("k", "ts", "rv")
    val got = JoinOp(Map("key_col" -> "k", "time_bound" -> "3 minutes"),
      Seq(l, r)).head.select("k", "lv", "r_rv")
      .as[(String, Long, Long)].collect().toSet
    val want = l.join(r.select(col("k").as("k2"), col("ts").as("ts2"),
        col("rv")),
      col("k") === col("k2") &&
        col("ts2") >= col("ts") - expr("interval 3 minutes") &&
        col("ts2") <= col("ts") + expr("interval 3 minutes"))
      .select("k", "lv", "rv").as[(String, Long, Long)].collect().toSet
    assert(got == want && got == Set(("a", 1L, 10L)))
    intercept[IllegalArgumentException] {
      JoinOp(Map("time_bound" -> "3 minutes"), Seq(l, r))
    }
    intercept[IllegalArgumentException] {
      JoinOp(Map("key_col" -> "k", "join_type" -> "full"), Seq(l, r))
    }
  }
}
