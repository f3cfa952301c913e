package graft

import org.apache.spark.sql.functions._

import graft.functions.BoundedCollect

/** Pins the bounded bucket aggregator: exact-cap groups survive, cap+1
  * overflows to NULL with the buffer discarded, behavior is stable under
  * partial aggregation (map-side combine across partitions). */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("groups at the cap survive; groups over the cap finish as null " +
    "under multi-partition partial aggregation") {
    // group g0: exactly 5 members (cap), g1: 6 members (cap+1), g2: 1
    val rows =
      (0 until 5).map(i => ("g0", i.toLong)) ++
      (0 until 6).map(i => ("g1", i.toLong)) ++
      Seq(("g2", 0L))
    val df = rows.toDF("g", "id").repartition(4) // force merge() paths
    val agg = BoundedCollect.pairs(5)
    val got = df.groupBy("g")
      .agg(agg(col("id"), lit(0L)).as("ms"))
      .select(col("g"), (size(col("ms")) === 0).as("dropped"),
        size(col("ms")))
      .as[(String, Boolean, Int)].collect()
      .map { case (g, d, s) => g -> ((d, s)) }.toMap
    assert(got("g0") == ((false, 5)))
    assert(got("g1") == ((true, 0))) // overflowed -> empty
    assert(got("g2") == ((false, 1)))
  }

  test("payload slot carries values through collection") {
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L)).toDF("g", "id", "p")
    val agg = BoundedCollect.pairs(10)
    val ms = df.groupBy("g").agg(agg(col("id"), col("p")).as("ms"))
      .select(explode(col("ms")).as("x"))
      .select(col("x._1"), col("x._2")).as[(Long, Long)].collect().toSet
    assert(ms == Set((1L, 10L), (2L, 20L)))
  }
}
