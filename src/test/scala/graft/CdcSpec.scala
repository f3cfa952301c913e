package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: updates win, new keys insert, untouched keys survive") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L))
      .toDF("k", "v", "ver")
    val changes = Seq((2L, "B", 20L), (4L, "d", 5L))
      .toDF("k", "v", "ver")
    val got = Cdc.upsert(snap, changes, Seq(col("k")), Seq(col("ver")))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "B", 20L), (3L, "c", 10L),
      (4L, "d", 5L)))
  }

  test("upsert: exact version tie resolves to the change, stale " +
    "changes lose") {
    val snap = Seq((1L, "old", 10L), (2L, "keep", 10L))
      .toDF("k", "v", "ver")
    val changes = Seq((1L, "tied", 10L), (2L, "stale", 5L))
      .toDF("k", "v", "ver")
    val got = Cdc.upsert(snap, changes, Seq(col("k")), Seq(col("ver")))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "tied", 10L), (2L, "keep", 10L)))
  }

  test("upsert: winning tombstones delete; losing tombstones don't") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "ver")
    val changes = Seq((1L, "x", 20L, true), (2L, "y", 5L, true))
      .toDF("k", "v", "ver", "deleted")
    val got = Cdc.upsert(snap, changes, Seq(col("k")), Seq(col("ver")),
        tombstoneCol = Some("deleted"))
      .orderBy("k").select("k", "v", "ver")
      .as[(Long, String, Long)].collect().toSeq
    // key 1: tombstone wins → gone; key 2: stale tombstone loses →
    // snapshot row survives (null deleted coalesces to false)
    assert(got == Seq((2L, "b", 10L)))
  }
}
