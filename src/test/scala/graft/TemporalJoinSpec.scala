package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.streaming.ops.TemporalJoinOp

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) =
    Timestamp.valueOf(f"2026-01-01 00:$m%02d:$s%02d")

  private val conf = Map[String, Any]("key_col" -> "k",
    "timestamp_col" -> "ts", "id_col" -> "id", "value_col" -> "v",
    "tie_col" -> "tie", "lateness" -> "5 minutes")

  test("streaming as-of equals the batch AsOfJoin under the watermark " +
    "bound, across out-of-order micro-batch delivery") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, Timestamp, Long)]
    val rIn = MemoryStream[(String, Timestamp, String, Long)]
    val l = lIn.toDF().toDF("k", "ts", "id").withWatermark("ts", "0 seconds")
    val r = rIn.toDF().toDF("k", "ts", "v", "tie")
      .withWatermark("ts", "0 seconds")
    val out = TemporalJoinOp(conf, Seq(l, r)).head
    val q = out.writeStream.format("memory").queryName("tj_out")
      .outputMode("append").start()
    try {
      // batch 1: right updates INCLUDING a same-ts tie pair, lefts out
      // of order — nothing finalizes yet (watermark still at epoch)
      rIn.addData(("a", ts(2), "r2", 2L), ("a", ts(2), "r2b", 5L),
        ("b", ts(1), "rb", 1L))
      lIn.addData(("a", ts(3), 30L), ("a", ts(1), 10L))
      q.processAllAvailable()
      // batch 2: watermark moves to minute 3 → a@1 finalizes; the rest
      // finalize when later batches (and the idle-key timer) push the
      // watermark past them
      rIn.addData(("a", ts(8), "r8", 8L))
      lIn.addData(("a", ts(9), 90L), ("b", ts(9), 91L))
      q.processAllAvailable()
      lIn.addData(("z", ts(30), 999L)) // close minute 9
      rIn.addData(("z", ts(30), "zz", 0L))
      q.processAllAvailable()
      val got = spark.table("tj_out").filter(col("k") =!= "z")
        .select("id", "r_value").as[(Long, Option[String])]
        .collect().toMap
      // a@1: no right ≤ 1 → NULL; a@3: newest ≤3 is r2 vs r2b@2 — tie on
      // ts, larger tie (5) wins → r2b; a@9: r8; b@9: rb
      assert(got == Map(10L -> None, 30L -> Some("r2b"),
        90L -> Some("r8"), 91L -> Some("rb")))
      // parity: the batch twin on the same data agrees row-for-row
      val lb = Seq(("a", ts(3), 30L), ("a", ts(1), 10L),
        ("a", ts(9), 90L), ("b", ts(9), 91L)).toDF("k", "ts", "id")
      val rb = Seq(("a", ts(2), "r2", 2L), ("b", ts(1), "rb", 1L),
        ("a", ts(2), "r2b", 5L), ("a", ts(8), "r8", 8L))
        .toDF("k", "ts", "v", "tie")
        .select(col("k"), col("ts").as("rts"), col("v"), col("tie"))
      val batch = AsOfJoin.asOf(lb, rb, col("ts"), col("rts"),
        col("k"), col("k"), Seq("v"), col("tie"))
        .select("id", "v").as[(Long, Option[String])].collect().toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("batch mode: TemporalJoinOp equals AsOfJoin on the events table " +
    "(full parity, no watermark)") {
    val ev = graft.core.Tables.table(spark, "/root/testdata/sf0.001",
      "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), col("ts"),
        col("event_id").as("id"))
    val r = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), col("ts"),
        col("value").cast("string").as("v"),
        col("event_id").as("tie"))
    val got = TemporalJoinOp(conf, Seq(l, r)).head
      .select("id", "r_value").as[(Long, Option[String])]
      .collect().toMap
    val want = AsOfJoin.asOf(
      l, r.select(col("k"), col("ts").as("rts"), col("v"), col("tie")),
      col("ts"), col("rts"), col("k"), col("k"), Seq("v"), col("tie"))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(got == want && got.nonEmpty)
    assert(got.values.exists(_.isDefined))
  }

  test("state is horizon-bounded: an idle key's reference carry expires " +
    "after lateness, so a much-later left restarts with no match") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, Timestamp, Long)]
    val rIn = MemoryStream[(String, Timestamp, String, Long)]
    val l = lIn.toDF().toDF("k", "ts", "id").withWatermark("ts", "0 seconds")
    val r = rIn.toDF().toDF("k", "ts", "v", "tie")
      .withWatermark("ts", "0 seconds")
    val out = TemporalJoinOp(conf, Seq(l, r)).head
    val q = out.writeStream.format("memory").queryName("tj_evict")
      .outputMode("append").start()
    try {
      rIn.addData(("a", ts(1), "early", 1L))
      q.processAllAvailable()
      // push the watermark far past minute 1 + 5min lateness on BOTH
      // sides (the op's timeout evicts key a, including its carry)
      lIn.addData(("z", ts(40), 1L))
      rIn.addData(("z", ts(40), "zz", 0L))
      q.processAllAvailable()
      lIn.addData(("z", ts(50), 2L), ("a", ts(45), 7L))
      rIn.addData(("z", ts(50), "zz", 0L))
      q.processAllAvailable()
      lIn.addData(("z", ts(59), 3L)) // close minute 45
      rIn.addData(("z", ts(59), "zz", 0L))
      q.processAllAvailable()
      val a = spark.table("tj_evict").filter(col("k") === "a")
        .select("id", "r_value").as[(Long, Option[String])]
        .collect().toMap
      // batch semantics would carry "early" forward; the streaming op's
      // documented horizon dropped it with the evicted key
      assert(a == Map(7L -> None), a.toString)
    } finally q.stop()
  }
}
