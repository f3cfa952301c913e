package graft

import org.apache.spark.sql.functions._

import graft.core.Pipe._
import graft.operators.{DataOps, MathOps}

/** Pins the reference's count-window semantics: README.rst:75-90 —
  * roll(window=3, stride=3) + mean(reduce=True) over [1..7] → 2.0, 5.0
  * (trailing partial window dropped). */
class RollSpec extends SparkSpec {
  import spark.implicits._

  private def ints(xs: Int*) =
    xs.zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) }
      .toDF("i", "value")

  test("README flagship: roll(3,3) + mean over [1..7] emits 2.0, 5.0") {
    val got = ints(1, 2, 3, 4, 5, 6, 7) >>
      DataOps.roll(3, 3, Seq(col("i"))) >>
      MathOps.mean(col("value"))
    val means = got.orderBy("window_id").select("mean")
      .as[Double].collect().toSeq
    assert(means == Seq(2.0, 5.0))
  }

  test("tumbling roll emits nothing until a full window exists") {
    val got = ints(1, 2) >>
      DataOps.roll(3, 3, Seq(col("i")))
    assert(got.count() == 0)
  }

  test("sliding roll(3,1) over [1..5] emits 3 overlapping windows") {
    val got = ints(1, 2, 3, 4, 5) >>
      DataOps.roll(3, 1, Seq(col("i"))) >>
      MathOps.mean(col("value"))
    val means = got.orderBy("window_id").select("mean")
      .as[Double].collect().toSeq
    assert(means == Seq(2.0, 3.0, 4.0))
  }

  test("stride > window skips rows between windows") {
    // w=2 s=3 over [1..8]: windows {1,2},{4,5},{7,8}
    val got = ints(1, 2, 3, 4, 5, 6, 7, 8) >>
      DataOps.roll(2, 3, Seq(col("i"))) >>
      MathOps.mean(col("value"))
    val means = got.orderBy("window_id").select("mean")
      .as[Double].collect().toSeq
    assert(means == Seq(1.5, 4.5, 7.5))
  }

  test("keyed roll windows independently per key") {
    val df = Seq(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0),
      ("b", 1, 10.0), ("b", 2, 20.0))
      .toDF("k", "i", "value")
    val got = df >> DataOps.roll(2, 2, Seq(col("i")), Seq(col("k"))) >>
      MathOps.mean(col("value"), Seq(col("k")))
    val rows = got.orderBy("k", "window_id")
      .select("k", "mean").as[(String, Double)].collect().toSeq
    assert(rows == Seq(("a", 1.5), ("b", 15.0)))
  }

  test("batch(n) = roll(n,n)") {
    val got = ints(1, 2, 3, 4, 5, 6) >>
      DataOps.batch(2, Seq(col("i")))
    assert(got.select(DataOps.WindowCol).distinct().count() == 3)
  }

  test("rollDense == roll for a dense 0-based order column, and plans " +
    "without a window operator") {
    val df = ints(1, 2, 3, 4, 5, 6, 7, 8).repartition(3)
    for ((w, s) <- Seq((3, 3), (3, 1), (2, 3), (1, 4))) {
      val generic = (df >> DataOps.roll(w, s, Seq(col("i"))))
        .select("i", DataOps.WindowCol)
      val dense = (df >> DataOps.rollDense(w, s, col("i")))
        .select("i", DataOps.WindowCol)
      assert(generic.exceptAll(dense).count() == 0 &&
        dense.exceptAll(generic).count() == 0, s"w=$w s=$s")
    }
    val plan = (df >> DataOps.rollDense(3, 3, col("i")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected WindowExec in:\n$plan")
  }

  test("sampleEveryDense keeps rows whose dense index is a multiple of n") {
    import graft.operators.Ops
    val got = ints(1, 2, 3, 4, 5, 6, 7) >> Ops.sampleEveryDense(3, col("i"))
    assert(got.select("i").as[Long].collect().toSet == Set(0L, 3L, 6L))
  }

  test("split segments at boundary markers") {
    val df = Seq((0L, "x"), (1L, "boundary"), (2L, "x"), (3L, "boundary"),
      (4L, "x")).toDF("i", "t")
    val got = df >> DataOps.split(col("t") === "boundary", Seq(col("i")))
    val segs = got.orderBy("i").select(DataOps.WindowCol)
      .as[Long].collect().toSeq
    assert(segs == Seq(0L, 1L, 1L, 2L, 2L))
  }

  test("timeSplit starts a new segment after a gap") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 2),
      (java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 3))
      .toDF("ts", "v")
    val got = df >> DataOps.timeSplit(col("ts"), 60)
    val segs = got.orderBy("v").select(DataOps.WindowCol)
      .as[Long].collect().toSeq
    assert(segs == Seq(1L, 1L, 2L))
  }
}
