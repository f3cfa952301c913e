package graft

import org.apache.spark.sql.functions._

import graft.core.Pipe.DataFrameOps
import graft.operators.MathOps

/** Pins the streaming-fold EWMA engine: per-event emission, key-boundary
  * handling inside a shared partition, and O(1)-state equivalence to the
  * closed-form fold. */
class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private val alpha = 0.5

  private def expected(xs: Seq[Double]): Seq[Double] =
    xs.tail.scanLeft(xs.head)((e, x) => alpha * x + (1 - alpha) * e)

  test("ewmaScan emits every step in order, per key") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 3L, 5.0),
      ("b", 1L, 10.0), ("b", 2L, 20.0))
      .toDF("k", "t", "v")
    val got = (df >> MathOps.ewmaScan(col("v"), Seq(col("t")), alpha,
        Seq(col("k"))))
      .orderBy("k", "t").select("k", "ewma")
      .as[(String, Double)].collect().toSeq
    assert(got == expected(Seq(1.0, 3.0, 5.0)).map(("a", _)) ++
      expected(Seq(10.0, 20.0)).map(("b", _)))
  }

  test("ewmaByKey emits exactly one final row per key, many keys " +
    "sharing one partition") {
    val df = Seq.tabulate(100)(i => (i % 10, i / 10, (i % 7).toDouble))
      .toDF("k", "t", "v").repartition(2) // force multiple keys per task
    val got = (df >> MathOps.ewmaByKey(col("v"), col("t"), alpha,
        Seq(col("k"))))
      .select("k", "ewma").as[(Int, Double)].collect().toMap
    assert(got.size == 10)
    val series = (0 until 10).map(k =>
      k -> (0 until 10).map(t => ((t * 10 + k) % 7).toDouble))
    series.foreach { case (k, xs) =>
      assert(math.abs(got(k) - expected(xs).last) < 1e-12, s"key $k")
    }
  }

  test("ewmaByKey accepts expression-valued arguments (pruning skipped, " +
    "not broken)") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 3.0)).toDF("k", "t", "v")
    val got = (df >> MathOps.ewmaByKey(col("v") * 2, col("t"), alpha,
        Seq(col("k"))))
      .select("k", "ewma").as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", expected(Seq(2.0, 6.0)).last)))
  }

  test("single-row keys and empty partitions are handled") {
    val df = Seq(("x", 1L, 42.0)).toDF("k", "t", "v").repartition(8)
    val got = (df >> MathOps.ewmaByKey(col("v"), col("t"), alpha,
      Seq(col("k")))).select("ewma").as[Double].collect().toSeq
    assert(got == Seq(42.0))
  }
}
