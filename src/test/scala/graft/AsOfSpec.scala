package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("banded range join == naive key-join + band filter, including " +
    "window-boundary partners (property over random timestamps)") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, s"u${rnd.nextInt(5)}", rnd.nextInt(2000).toLong))
    val df = rows.toDF("id", "u", "sec")
    val a = df.select(col("id").as("id_a"), col("u"),
      col("sec").cast("timestamp").as("ts_a"))
    val b = df.select(col("id").as("id_b"), col("u"),
      col("sec").cast("timestamp").as("ts_b"))
    val banded = RangeJoin.timeBand(a, b, Seq("u"), "ts_a", "ts_b", 60L)
      .select("id_a", "id_b")
    val naive = a.join(b, Seq("u"))
      .filter(col("ts_b").cast("double") >= col("ts_a").cast("double") &&
        col("ts_b").cast("double") <= col("ts_a").cast("double") + 60)
      .select("id_a", "id_b")
    assert(banded.exceptAll(naive).count() == 0 &&
      naive.exceptAll(banded).count() == 0)
    // pairs are emitted exactly once (no cross-bucket duplicates)
    assert(banded.count() == banded.distinct().count())
  }

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

  test("asOf refuses a NULL or non-integral rightTiebreak — a silent " +
    "NULL/truncating cast would make ties resolve by partition layout") {
    val quotes = Seq(("A", 10L, Option.empty[Long], 1.0),
      ("A", 10L, Option(2L), 2.0)).toDF("sym", "qts", "qid", "px")
    val trades = Seq(("A", 20L, 100L)).toDF("sym", "tts", "tid")
    def run(tie: org.apache.spark.sql.Column) = AsOfJoin.asOf(
      trades, quotes, col("tts"), col("qts"), col("sym"), col("sym"),
      Seq("px"), rightTiebreak = tie).collect()
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ all(t.getCause)
    val e1 = intercept[Exception](run(col("qid"))) // NULL tiebreak row
    assert(all(e1).exists(_.contains("rightTiebreak")), e1.getMessage)
    // integral doubles pass; a fractional one truncates to a tie
    val quotes2 = Seq(("A", 10L, 1.5)).toDF("sym", "qts", "px")
    val e3 = intercept[Exception](AsOfJoin.asOf(
      trades, quotes2, col("tts"), col("qts"), col("sym"), col("sym"),
      Seq("px"), rightTiebreak = col("px")).collect())
    assert(all(e3).exists(_.contains("rightTiebreak")), e3.getMessage)
  }
}
