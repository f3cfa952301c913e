package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{Text, WinnowPrints}

/** Pins the native winnowing kernel to the HOF formulation it replaced:
  * same positional-gram hashes, same window minima, same first-occurrence
  * dedup — bit-identical outputs on adversarial inputs (duplicate grams,
  * docs shorter than k / than w windows, null tokens, null docs). */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** The round-2 O(n·w) HOF winnow, kept verbatim as the executable
    * reference semantics. */
  private def hofWinnow(ts: Column, k: Int, w: Int): Column = {
    val grams = transform(Text.shinglesFromTokens(ts, k), s => xxhash64(s))
    val selected = when(size(grams) === 0, array().cast("array<bigint>"))
      .otherwise(when(size(grams) < w, array(array_min(grams)))
        .otherwise(transform(sequence(lit(1), size(grams) - (w - 1)),
          i => array_min(slice(grams, i, lit(w))))))
    array_distinct(selected)
  }

  test("kernel output is bit-identical to the HOF formulation") {
    // tiny vocab forces duplicate grams and duplicate window minima;
    // lengths sweep the empty / <k / <w+k-1 / long regimes
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 200L).map { id =>
      val len = (id % 50).toInt
      (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))))
    }
    val df = docs.toDF("id", "ts").repartition(8)
    for ((k, w) <- Seq((3, 4), (1, 1), (2, 7), (5, 2))) {
      val got = df.select(col("id"),
        WinnowPrints(col("ts"), k, w).as("p"),
        hofWinnow(col("ts"), k, w).as("q"))
      val mismatches = got.filter(not(col("p") === col("q"))).count()
      assert(mismatches == 0, s"k=$k w=$w")
    }
  }

  test("null tokens join like array_join; null doc stays null") {
    val df = Seq(
      (1L, Seq[String]("a", null, "b", "c", null, "a", "b")),
      (2L, null.asInstanceOf[Seq[String]]))
      .toDF("id", "ts")
    val got = df.select(col("id"),
      WinnowPrints(col("ts"), 2, 3).as("p"),
      hofWinnow(col("ts"), 2, 3).as("q"))
      .as[(Long, Option[Seq[Long]], Option[Seq[Long]])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == got(1L)._2 && got(1L)._1.nonEmpty)
    assert(got(2L)._1.isEmpty && got(2L)._2.isEmpty)
  }
}
