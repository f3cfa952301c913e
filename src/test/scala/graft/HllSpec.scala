package graft

import org.apache.spark.sql.functions._

import graft.functions.Hll

/** Pins the relational HyperLogLog: bucket/rho decomposition agrees with
  * a Scala-side recomputation from the same xxhash64 values, the
  * estimate is layout-independent (register max is distributive),
  * duplicate-insensitive, within the AofA'07 error bound on the raw
  * branch, and the linear-counting branch engages for tiny
  * cardinalities. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def estMillis(ids: Seq[Long], p: Int, parts: Int = 4): Long =
    Hll.distinctCount(ids.toDF("id").repartition(parts), col("id"), p)
      .select("est_millis").as[Long].head()

  test("bucket/rho matches a driver-side recomputation of the same hash") {
    val p = 9
    val df = (0L until 200L).toDF("id")
    val (b, r) = Hll.bucketAndRho(col("id"), p)
    val got = df.select(xxhash64(col("id")).as("h"), b.as("b"), r.as("r"))
      .as[(Long, Int, Int)].collect()
    assert(got.length == 200)
    got.foreach { case (h, bucket, rho) =>
      val u = h // treat bits as unsigned
      val expB = (u >>> (64 - p)).toInt
      val rem = u & ((1L << (64 - p)) - 1)
      val expR =
        if (rem == 0) 64 - p + 1
        else 64 - p + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      assert(bucket == expB && rho == expR, s"h=$h")
    }
  }

  test("estimate is layout-independent and duplicate-insensitive") {
    val ids = (0L until 5000L) ++ (0L until 5000L) // every id twice
    val base = estMillis(ids, p = 9, parts = 1)
    assert(estMillis(ids, p = 9, parts = 16) == base)
    assert(estMillis(0L until 5000L, p = 9, parts = 7) == base)
  }

  test("raw-branch estimate is within 3 sigma of the true cardinality") {
    val n = 20000L
    val est = estMillis(0L until n, p = 9) / 1000.0
    val sigma = 1.04 / math.sqrt(1 << 9) * n // ~920
    assert(math.abs(est - n) < 3 * sigma, s"est=$est")
  }

  test("mergeRegisters(a, b) estimates the distinct UNION: merging a " +
    "corpus with itself is a no-op; overlapping corpora don't double") {
    val p = 9
    val a = Hll.registers((0L until 3000L).toDF("id"), col("id"), p)
    val b = Hll.registers((1500L until 4500L).toDF("id"), col("id"), p)
    def est(regs: org.apache.spark.sql.DataFrame): Long =
      Hll.estimate(regs, p).select("est_millis").as[Long].head()
    val selfMerge = est(Hll.mergeRegisters(a, a))
    assert(selfMerge == est(a))
    val unionEst = est(Hll.mergeRegisters(a, b)) / 1000.0
    val direct = est(Hll.registers((0L until 4500L).toDF("id"),
      col("id"), p)) / 1000.0
    assert(unionEst == direct) // identical registers, identical estimate
  }

  test("linear-counting branch: tiny cardinalities are near-exact") {
    for (n <- Seq(5L, 50L)) {
      val est = estMillis(0L until n, p = 9) / 1000.0
      assert(math.abs(est - n) <= math.max(1.0, 0.05 * n), s"n=$n est=$est")
    }
  }
}
