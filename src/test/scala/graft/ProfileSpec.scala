package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, exact distincts, numeric ranges; " +
    "non-numeric strings yield NULL range") {
    val df = Seq(
      (Some(1L), Some("a"), Some("2.5")),
      (Some(2L), None, Some("x")),
      (Some(2L), Some("b"), None),
      (None, Some("a"), Some("-1e2"))).toDF("k", "s", "t")
    val got = Profile.profile(df, Seq("k", "s", "t"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      ("k", 4L, 1L, 2L, Some(1.0), Some(2.0)),
      // 's' holds no numeric strings -> NULL range
      ("s", 4L, 1L, 2L, None, None),
      // 't' mixes numeric and not: range over the parseable ones
      ("t", 4L, 1L, 3L, Some(-100.0), Some(2.5))))
  }

  test("delta flags a column going null and an enum exploding") {
    import spark.implicits._
    val a = Seq((1L, Some("x"), "t1"), (2L, Some("y"), "t1"))
      .toDF("id", "v", "e")
    val b = Seq((3L, Option.empty[String], "t1"),
      (4L, Option.empty[String], "t2"),
      (5L, Some("z"), "t3")).toDF("id", "v", "e")
    val got = Profile.delta(a, b, Seq("v", "e"))
      .select("col_name", "null_rate_delta", "distinct_delta")
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // v: 0/2 null → 2/3 null; e: 1 distinct → 3 distinct
    assert(math.abs(got("v")._1 - 2.0 / 3.0) < 1e-12)
    assert(got("e")._2 == 2L)
  }

  test("profile is layout-independent") {
    val ev = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "events")
    val cols = Seq("event_id", "user_id", "event_type", "value")
    val a = Profile.profile(ev, cols).collect().toSeq
    val b = Profile.profile(ev.repartition(13), cols).collect().toSeq
    assert(a == b && a.size == 4)
  }

  test("delta surfaces an added/dropped column as a NULL-sided row " +
    "(schema rot is the operator's job, not an AnalysisException)") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "old_col")
    val b = Seq((2L, "y")).toDF("id", "new_col")
    val got = Profile.delta(a, b, Seq("id", "old_col", "new_col"))
      .select("col_name", "n_a", "n_b")
      .as[(String, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("old_col") == ((Some(1L), None)), got.toString) // dropped
    assert(got("new_col") == ((None, Some(1L))), got.toString) // added
    assert(got("id") == ((Some(1L), Some(1L))))
  }
}
