package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asOf attaches most recent right row at or before left ts, " +
    "per key; ties break to max tiebreak; no-match keeps nulls") {
    val quotes = Seq( // (key, ts, qid, px)
      ("A", 10L, 1L, 1.0),
      ("A", 20L, 2L, 2.0),
      ("A", 20L, 3L, 3.0), // tie at ts=20 → qid 3 wins
      ("B", 50L, 4L, 4.0))
      .toDF("sym", "qts", "qid", "px")
    val trades = Seq(
      ("A", 5L, 100L),  // before any quote → nulls
      ("A", 20L, 101L), // equal ts → inclusive, picks qid 3
      ("A", 25L, 102L), // after → qid 3
      ("B", 60L, 103L)) // → qid 4
      .toDF("sym", "tts", "tid")
    val got = AsOfJoin.asOf(
      trades, quotes,
      leftTs = col("tts"), rightTs = col("qts"),
      leftKey = col("sym"), rightKey = col("sym"),
      rightValueCols = Seq("qid", "px"),
      rightTiebreak = col("qid"))
      .orderBy("tid")
      .select("tid", "qid")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (100L, None), (101L, Some(3L)), (102L, Some(3L)), (103L, Some(4L))))
  }
}
