package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqItems

/** Pins the Misra-Gries guarantees: heavy hitters above the n/(m+1)
  * threshold always survive, estimates never exceed true counts and
  * undershoot by at most n/(m+1), behavior holds across partition
  * layouts (merge path). */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: item 1 appears 300/1000 times, item 2 100/1000,
  // the rest spread thin across 60 cold items
  private val stream: Seq[Long] =
    Seq.fill(300)(1L) ++ Seq.fill(100)(2L) ++
      (0 until 600).map(i => 100L + (i % 60))

  private def sketchOf(items: Seq[Long], m: Int, parts: Int)
      : Map[Long, Long] =
    items.toDF("item").repartition(parts)
      .agg(FreqItems.sketch(m)(col("item")).as("s"))
      .select(explode(col("s")).as("x"))
      .select(col("x._1"), col("x._2")).as[(Long, Long)]
      .collect().toMap

  test("heavy hitters above n/(m+1) survive with bounded count error, " +
    "across partition layouts") {
    val n = stream.size // 1000
    for (parts <- Seq(1, 4, 16)) {
      val got = sketchOf(stream, m = 15, parts) // threshold 1000/16=62.5
      assert(got.contains(1L), s"parts=$parts")
      assert(got.contains(2L), s"parts=$parts")
      assert(got(1L) <= 300 && got(1L) >= 300 - n / 16, s"parts=$parts")
      assert(got(2L) <= 100 && got(2L) >= 100 - n / 16, s"parts=$parts")
      assert(got.size <= 15)
    }
  }

  test("estimates never exceed true counts (all-distinct input)") {
    val got = sketchOf((1L to 100L).toSeq, m = 8, parts = 4)
    assert(got.size <= 8)
    got.foreach { case (_, c) => assert(c <= 1L) }
  }
}
