package graft

import org.apache.spark.sql.functions._

import graft.operators.Distogram

class DistogramSpec extends SparkSpec {
  import spark.implicits._

  test("sketch bounds bins, preserves count, estimates quantiles") {
    val n = 10000
    val ds = spark.range(n).map(i => (i % 100).toDouble)
    val sk = ds.select(
      udaf(Distogram.sketch(32), Encoders.scalaDouble)
        .apply(col("value")).as("s"))
      .select(col("s.*")).as[Distogram.Sketch].collect().head
    assert(sk.bins.length <= 32)
    assert(sk.count == n)
    // uniform 0..99 → median ≈ 49.5 within sketch tolerance
    assert(math.abs(sk.quantile(0.5) - 49.5) < 5.0)
    assert(sk.quantile(0.0) <= 5.0)
    assert(sk.quantile(1.0) >= 95.0)
  }

  test("sketch merge across partitions is count-preserving") {
    val ds = spark.range(5000).repartition(8)
      .map(i => (i % 7).toDouble)
    val sk = ds.select(
      udaf(Distogram.sketch(16), Encoders.scalaDouble)
        .apply(col("value")).as("s"))
      .select(col("s.*")).as[Distogram.Sketch].collect().head
    assert(sk.count == 5000)
    assert(sk.bins.length <= 16)
  }

  test("orderedFold equals the Aggregator's sequential reduce " +
    "step-for-step on the same ordered input") {
    import org.apache.spark.sql.functions._
    val values: Seq[Double] =
      (1 to 120).map(i => (i * 37 % 101) + (i % 7) * 0.25)
    val agg = Distogram.sketch(16)
    val ref = values.foldLeft(agg.zero)(agg.reduce).bins
    val got = Seq(Tuple1(values)).toDF("vals")
      .select(posexplode(Distogram.orderedFold(col("vals"), 16)))
      .select(col("col.v"), col("col.c")).as[(Double, Long)]
      .collect().toVector
    assert(got == ref, s"got=$got ref=$ref")
    assert(got.map(_._2).sum == 120L)
    intercept[IllegalArgumentException] {
      Distogram.orderedFold(col("vals"), 1)
    }
  }

  test("merge-under-shuffle property: count exact and quantiles stable " +
    "across partition layouts (1, 4, 16, 64)") {
    val n = 20000
    val base = spark.range(n).map(i => ((i * 37) % 1000).toDouble)
    val exactMedian = 499.0 // values 0..999 near-uniform
    val sketches = Seq(1, 4, 16, 64).map { p =>
      base.repartition(p).select(
        udaf(Distogram.sketch(32), Encoders.scalaDouble)
          .apply(col("value")).as("s"))
        .select(col("s.*")).as[Distogram.Sketch].collect().head
    }
    sketches.foreach { sk =>
      assert(sk.count == n) // merges never lose mass, any layout
      assert(math.abs(sk.quantile(0.5) - exactMedian) < 25.0)
      assert(sk.bins.length <= 32)
    }
  }

  private def Encoders = org.apache.spark.sql.Encoders
}
